"""Canonical schemas: the transcript lake row and the CDC change envelope.

The reference infers BigQuery schemas from Go structs
(/root/reference/schema/ndt7_result.go:34-46) and forces every field
nullable (RemoveRequired, schema/ndt7_result.go:44). We instead pin
explicit StructTypes — deterministic, no inference — and carry the
"Standard Columns" lineage convention (/root/reference/schema/schema.go:15-24:
ParseInfo{Version, Time, ArchiveURL, Filename, ...}) as engine-owned
lineage columns on the lake table plus a separate lineage table.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- user-facing transcript row (BASELINE.json input_hint) -----------------
# Column comments ride in StructField metadata and survive schema evolution
# — the analog of the reference propagating field Descriptions into the
# warehouse schema (/root/reference/schema/schema.go:101-124).
COLUMN_COMMENTS = {
    "conv_id": "conversation id (merge key 1/2; bucket-partition column)",
    "turn_idx": "0-based turn index within the conversation (merge key 2/2)",
    "role": "speaker of the turn: system | user | assistant | tool",
    "text": "turn payload text (per-turn equality is the replay invariant)",
    "tool": "tool name when role='tool' or the turn carries a tool call",
    "ts": "event commit time — last-writer-wins ordering, with op_seq tiebreak",
}


def _f(name: str, dtype: T.DataType, nullable: bool) -> T.StructField:
    meta = {"comment": COLUMN_COMMENTS[name]} if name in COLUMN_COMMENTS else {}
    return T.StructField(name, dtype, nullable, metadata=meta)


TRANSCRIPT_FIELDS = [
    _f("conv_id", T.StringType(), False),
    _f("turn_idx", T.IntegerType(), False),
    _f("role", T.StringType(), True),
    _f("text", T.StringType(), True),
    _f("tool", T.StringType(), True),
    _f("ts", T.TimestampType(), True),
]
TRANSCRIPT_SCHEMA = T.StructType(TRANSCRIPT_FIELDS)

KEY_COLS = ["conv_id", "turn_idx"]
PAYLOAD_COLS = ["role", "text", "tool"]

# --- CDC change envelope (FIXTURES.md F2) -----------------------------------
# op: I/U/D; ts = commit time (LWW); op_seq = global sequence (LWW tiebreak,
# the analog of the reference's synthetic dedup UUIDs,
# /root/reference/parser/parser.go:150-176).
CHANGE_FIELDS = [
    T.StructField("op", T.StringType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("op_seq", T.LongType(), False),
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("source_file", T.StringType(), True),
]
CHANGE_SCHEMA = T.StructType(CHANGE_FIELDS)

# system columns the lake table adds on top of the user schema
SYSTEM_COLS = ["op_seq", "deleted", "batch_id", "source_file", "ingest_ts"]

# --- type-widening lattice for schema evolution ------------------------------
# Mirrors the reference's era-gated field additions
# (/root/reference/parser/ndt5_result.go:72-78) and the update-schema flow
# (/root/reference/cmd/update-schema/update.go:112-161): columns may be ADDED
# (nullable) or WIDENED along this lattice; anything else is a hard error.
_WIDEN: dict[str, set[str]] = {
    "integer": {"long", "double"},
    "long": {"double"},
    "float": {"double"},
    "date": {"timestamp"},
}


def can_widen(frm: T.DataType, to: T.DataType) -> bool:
    if frm == to:
        return True
    return to.typeName() in _WIDEN.get(frm.typeName(), set())


def evolve_schema(current: T.StructType, incoming: T.StructType) -> T.StructType:
    """Merge ``incoming`` into ``current``: add new nullable columns, widen
    types along the lattice. Raises on incompatible change (narrowing or
    type conflict) — fail loud, like the reference's failfast commit path
    (/root/reference/task/task.go:163-173)."""
    by_name = {f.name: f for f in current.fields}
    out = list(current.fields)
    for f in incoming.fields:
        cur = by_name.get(f.name)
        if cur is None:
            out.append(T.StructField(f.name, f.dataType, True))
        elif cur.dataType == f.dataType:
            continue
        elif can_widen(cur.dataType, f.dataType):
            # widen in place, carrying the column comment (metadata) forward
            out[[x.name for x in out].index(f.name)] = T.StructField(
                f.name, f.dataType, True, metadata=cur.metadata
            )
        elif can_widen(f.dataType, cur.dataType):
            continue  # incoming is narrower; current already covers it
        else:
            raise ValueError(
                f"incompatible schema change for column {f.name!r}: "
                f"{cur.dataType.simpleString()} -> {f.dataType.simpleString()}"
            )
    return T.StructType(out)


def describe_schema(schema: T.StructType) -> list[dict]:
    """(name, type, nullable, comment) rows — the DESCRIBE TABLE surface
    (reference: field descriptions propagated to the warehouse schema,
    /root/reference/schema/schema.go:101-124)."""
    return [
        {
            "name": f.name,
            "type": f.dataType.simpleString(),
            "nullable": f.nullable,
            "comment": (f.metadata or {}).get("comment"),
        }
        for f in schema.fields
    ]


def schema_to_json(schema: T.StructType) -> str:
    return schema.json()


def schema_from_json(s: str) -> T.StructType:
    return T.StructType.fromJson(__import__("json").loads(s))
