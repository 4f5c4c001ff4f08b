"""Debezium-style change-event envelope → the engine's CHANGE schema.

CDC feeds rarely arrive pre-flattened: the de-facto wire shape (Debezium,
Maxwell, DynamoDB streams) is a JSON envelope per event with the operation
code, a source position, and before/after row images. This module is the
ingestion adapter: parse the envelope ONCE with an explicit schema (never
schema inference — a second pass over 100 TB and stringly timestamps) and
map it onto the engine's flat change-event columns, all in Catalyst
expressions (from_json + struct field access, zero Python in the row path).

Reference analog: the per-datatype JSON decode at the head of every parser
(/root/reference/parser/ndt7_result.go:64-131 unmarshals the wire struct,
then projects the row), and the parse-eligibility predicate gating it
(/root/reference/parser/parser.go:89-112 dispatch).

Envelope contract (Debezium-style, documented rather than byte-exact):

    {"op": "c"|"u"|"d"|"r", "ts": "<ISO-µs>", "lsn": <long>,
     "after":  {conv_id, turn_idx, role, text, tool},   (c/u/r)
     "before": {conv_id, turn_idx, ...}}                 (d)

op mapping: c (create) and r (snapshot read) → I, u → U, d → D. The log
position ``lsn`` becomes ``op_seq`` (the LWW tie-breaker), ``ts`` the event
time. Malformed envelopes parse to NULL op/keys and are counted failed by
the standard validation budget — quarantine, not crash (the PERMISSIVE
analog of the reference's jsonnet repair fallback,
/root/reference/parser/pt.go:233-249).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from etl_spark.schema import KEY_COLS

_ROW_FIELDS = [
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
]


def envelope_schema(row_fields: list[T.StructField] | None = None) -> T.StructType:
    """Wire schema for a given row shape. The row struct is NOT fixed: an
    evolved table (added/renamed payload columns) exports and re-imports its
    own shape losslessly — the wire follows the table schema, the way the
    reference regenerates its warehouse schema from the row struct rather
    than pinning one (/root/reference/schema/schema.go:101-124)."""
    rf = _ROW_FIELDS if row_fields is None else row_fields
    return T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("ts", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("before", T.StructType(rf)),
            T.StructField("after", T.StructType(rf)),
        ]
    )


ENVELOPE_SCHEMA = envelope_schema()

# changelog meta columns that never ride the wire row struct ("op" is the
# emit_meta replay op code — the ENVELOPE carries it as c/u/d; leaking it
# into the row struct would bloat every wire and break consumers deriving
# row_fields from the destination table's user schema)
_CHANGELOG_META = {"ts", "op_seq", "op", "_change_type"}

_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def _mapped_op(raw: Column) -> Column:
    out = F.lit(None).cast("string")
    for wire, op in _OP_MAP.items():
        out = F.when(raw == wire, F.lit(op)).otherwise(out)
    return out


def to_debezium(changelog: DataFrame, pre_col: str | None = "_pre") -> DataFrame:
    """CDC-out: encode a changelog read (``LakeTable.changes_between(...,
    emit_meta=True)``) as Debezium-style envelope JSON strings — the exact
    wire shape ``from_debezium`` decodes, so lake-to-lake (or lake-to-bus)
    pipelines round-trip: ``from_debezium(to_debezium(changelog))`` yields a
    replayable change feed that converges a replica to the source snapshot
    with identical LWW metadata (ts, op_seq).

    This is the outbound half of the reference's pipeline contract — its
    JSONL row sink exists so DOWNSTREAM systems can consume the parsed
    stream (/root/reference/storage/rowwriter.go:96-107); a CDC engine's
    downstream speaks change envelopes, not row dumps.

    Input columns: KEY_COLS + payload + ts + op_seq + ``_change_type``
    (insert / update_postimage / delete), plus optional ``_pre`` (from
    ``emit_pre=True``) for faithful update/delete before-images. Output:
    one ``value`` STRING column. Mapping: insert → ``c``, update_postimage
    → ``u``, delete → ``d``; ``op_seq`` → ``lsn``; deletes carry
    ``before`` only (Debezium contract), upserts carry ``after`` (and
    ``before`` when a pre-image is available). All Catalyst expressions
    (struct build + to_json); null fields are dropped from the JSON, which
    ``from_debezium``'s explicit-schema parse reads back as NULL."""
    ct = F.col("_change_type")
    wire_op = (
        F.when(ct == "insert", F.lit("c"))
        .when(ct == "update_postimage", F.lit("u"))
        .when(ct == "delete", F.lit("d"))
    )
    # The wire row struct is DERIVED from the changelog's own schema (key
    # cols + whatever payload columns this table's current era carries), so
    # an evolved table replicates its evolved columns instead of silently
    # dropping them into a fixed wire shape.
    skip = set(_CHANGELOG_META)
    if pre_col is not None:
        skip.add(pre_col)
    row_fields = [f for f in changelog.schema.fields if f.name not in skip]
    missing_keys = [k for k in KEY_COLS if k not in {f.name for f in row_fields}]
    if missing_keys:
        raise ValueError(
            f"to_debezium: changelog is missing key columns {missing_keys}; "
            f"got {[f.name for f in row_fields]}"
        )
    row_cols = [f.name for f in row_fields]
    after = F.struct(*[F.col(c).alias(c) for c in row_cols])
    has_pre = pre_col is not None and pre_col in changelog.columns
    if has_pre:
        pre_fields = {
            f.name for f in changelog.schema[pre_col].dataType.fields  # type: ignore[union-attr]
        }
        # pre-image struct carries payload values; keys come from the row.
        # A payload column absent from the pre struct (added this era) is a
        # typed NULL, never a silent drop.
        pre = F.struct(
            *[
                (
                    F.col(f.name)
                    if f.name in KEY_COLS
                    else (
                        F.col(f"{pre_col}.{f.name}")
                        if f.name in pre_fields
                        else F.lit(None).cast(f.dataType)
                    )
                ).alias(f.name)
                for f in row_fields
            ]
        )
    else:
        # minimal before-image: the key (what LWW replay needs for a delete)
        pre = F.struct(
            *[
                (
                    F.col(f.name)
                    if f.name in KEY_COLS
                    else F.lit(None).cast(f.dataType)
                ).alias(f.name)
                for f in row_fields
            ]
        )
    # deletes always carry `before`; updates carry it when a pre-image is
    # available; creates never do (Debezium contract)
    before = F.when(ct == "delete", pre)
    if has_pre:
        before = before.when(ct == "update_postimage", pre)
    env = F.struct(
        wire_op.alias("op"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").alias("ts"),
        F.col("op_seq").alias("lsn"),
        before.alias("before"),
        F.when(ct != "delete", after).alias("after"),
    )
    return changelog.select(F.to_json(env).alias("value"))


_CORRUPT = "__corrupt_record"


def _strict_parse(col: Column, rf: list[T.StructField]) -> tuple[Column, Column]:
    """(envelope struct, strictly-parsed?) — PERMISSIVE from_json returns a
    non-null struct even for garbage, so strict-failure detection rides the
    corrupt-record column the parser fills on malformed input."""
    sch = T.StructType(
        list(envelope_schema(rf).fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    e = F.from_json(col, sch, {"columnNameOfCorruptRecord": _CORRUPT})
    return e, col.isNotNull() & e[_CORRUPT].isNull()


def repair_envelope_json(col: Column) -> Column:
    """Bounded, deterministic repair of the two malformation classes a
    misbehaving producer most commonly emits — trailing commas before a
    closing brace/bracket, and unquoted object keys — as a pure Catalyst
    regexp chain (the reference's jsonnet repair fallback,
    /root/reference/parser/pt.go:233-249, as an engine expression).

    Best-effort by construction: it is only ever applied to strings the
    STRICT parse already rejected, so a valid row is never touched. BOTH
    rules are position-anchored on purpose — the unquoted-key rule to the
    envelope HEAD (``^{key:``), the trailing-comma rule to the envelope
    TAIL (``,}…}$``) — because an unanchored rule rewrites matching
    patterns INSIDE quoted string values (a text payload containing
    ``{k: 65}`` or ``a ,} b``) and either kills the row it was trying to
    save or, worse, saves it with silently mutated payload text.
    Truncation and structural damage are intentionally out of scope (not
    mechanically repairable)."""
    # trailing comma before the closing brace run at end-of-envelope only
    c = F.regexp_replace(col, r",\s*(\}[\s}\]]*)$", "$1")
    c = F.regexp_replace(c, r"^\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*:", '{"$1":')
    return c


def from_debezium(
    df: DataFrame,
    json_col: str = "value",
    row_fields: list[T.StructField] | None = None,
    repair: bool = False,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Decode a DataFrame of envelope JSON strings into the engine's flat
    change-event columns (op, ts, op_seq, <key cols>, <payload cols>).
    ``row_fields`` pins the wire row shape (defaults to the canonical
    transcript row); pass the evolved table's user fields to round-trip an
    evolved changelog losslessly. ``repair=True`` retries strings the
    strict parse rejects through ``repair_envelope_json`` first (rows the
    repair cannot save still decode NULL). Unknown op codes / unparseable
    JSON yield NULL op / NULL keys — rejected (and counted) by
    apply_batch's validation, never applied."""
    rf = _ROW_FIELDS if row_fields is None else row_fields
    raw = F.col(json_col)
    if repair:
        # strict first; retry the repaired string; a row neither parse
        # accepts decodes as an ALL-NULL envelope — never the partial
        # fields PERMISSIVE mode salvages before the syntax error, which
        # would leak half-parsed rows past the dead classification
        strict, ok = _strict_parse(raw, rf)
        rep, rok = _strict_parse(repair_envelope_json(raw), rf)
        e = F.when(ok, strict).when(rok, rep)
    else:
        e = F.from_json(raw, envelope_schema(rf))
    img = F.when(e["op"] == "d", e["before"]).otherwise(e["after"])
    out = [
        _mapped_op(e["op"]).alias("op"),
        F.to_timestamp(e["ts"]).alias("ts"),
        e["lsn"].alias("op_seq"),
    ]
    for f in rf:
        if f.name in KEY_COLS:
            out.append(img[f.name].alias(f.name))
        else:
            # deletes carry key-only semantics downstream: payload NULL
            out.append(
                F.when(e["op"] == "d", F.lit(None).cast(f.dataType))
                .otherwise(img[f.name])
                .alias(f.name)
            )
    # passthrough columns (e.g. source_file lineage, a decode-status tag)
    out.extend(F.col(c) for c in keep_cols)
    return df.select(*out)


def decode_status(
    col: Column, row_fields: list[T.StructField] | None = None
) -> Column:
    """Classify a wire string: 'ok' (strict parse), 'repaired' (parses
    only after ``repair_envelope_json``), 'dead' (unrecoverable). The
    observability counterpart of ``from_debezium(repair=True)`` — lets a
    pipeline count repaired rows and quarantine only the truly dead."""
    rf = _ROW_FIELDS if row_fields is None else row_fields
    _s, ok = _strict_parse(col, rf)
    _r, rok = _strict_parse(repair_envelope_json(col), rf)
    return (
        F.when(ok, F.lit("ok"))
        .when(rok, F.lit("repaired"))
        .otherwise(F.lit("dead"))
    )
