"""MERGE INTO — bucket-pruned copy-on-write upsert with ts-based LWW.

Semantics (the Iceberg-SQL statement this module implements natively):

    MERGE INTO target t USING batch s
    ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
    WHEN MATCHED AND (s.ts, s.op_seq) >= (t.ts, t.op_seq) AND s.op = 'D'
         THEN "DELETE"   -- realized as a tombstone, not a physical delete
    WHEN MATCHED AND (s.ts, s.op_seq) >= (t.ts, t.op_seq)
         THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *   -- D inserts a tombstone

The batch MUST be pre-deduped to one row per key (Iceberg MERGE likewise
rejects multi-match sources); see etl_spark.cdc.dedup. Tombstones guarantee
that under replay a delete beats an earlier-ts insert but loses to a
later-ts re-insert (LWW over the full event history).

Reference semantics carried over: the dedup/join key contract of the
synthetic UUIDs (/root/reference/parser/parser.go:150-176), downstream
key-based dedup (/root/reference/schema/README.md:6-10), atomic commit at
Close (/root/reference/storage/rowwriter.go:83-171).

Scale design:
  * Only buckets containing batch keys are read and rewritten
    (copy-on-write with partition pruning); at 10^10 events with
    n_buckets=4096, write amplification per micro-batch is bounded by
    touched-bucket data, not table size.
  * The join shuffles both sides on the key; AQE skew-join splits hot
    conversations. The batch side was already skew-collapsed by the
    salted/partial-agg dedup (one row per key survives).
  * All logic is DataFrame expressions — whole-stage codegen, zero Python
    in the row path.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_spark.schema import KEY_COLS, evolve_schema
from etl_spark.lake.table import LakeTable

ENGINE_VERSION = "etl_spark-0.1.0"


@dataclass
class MergeStats:
    batch_id: str
    events_in: int = 0
    dup_dropped: int = 0
    inserted: int = 0
    updated: int = 0
    deleted: int = 0
    stale_skipped: int = 0
    carried: int = 0
    failed: int = 0
    wall_sec: float = 0.0
    touched_buckets: list[int] = field(default_factory=list)
    bucket_rows: dict[str, int] = field(default_factory=dict)
    skipped_idempotent: bool = False

    def applied(self) -> int:
        return self.inserted + self.updated + self.deleted + self.stale_skipped


def _align_to(df: DataFrame, colnames: list[str], schema) -> DataFrame:
    have = set(df.columns)
    return df.select(
        *[
            (F.col(n).cast(schema[n].dataType) if n in have
             else F.lit(None).cast(schema[n].dataType)).alias(n)
            for n in colnames
        ]
    )


def merge_into(
    spark: SparkSession,
    table: LakeTable,
    batch: DataFrame,
    batch_id: str,
    events_in: int | None = None,
    source_files: list[str] | None = None,
    failed: int = 0,
    segments: list[str] | None = None,
) -> MergeStats:
    """Apply one deduped CDC batch to ``table``. Returns MergeStats; the
    commit (data files + commit record + metrics) is one atomic manifest
    swap. Idempotent: an already-committed batch_id is a no-op."""
    t0 = time.time()
    stats = MergeStats(batch_id=batch_id)
    if table.is_committed(batch_id):
        stats.skipped_idempotent = True
        return stats

    # ---- schema evolution (additive columns / widenings in the batch) ----
    cur_user = table.user_schema()
    batch_payload_fields = [
        f for f in batch.schema.fields if f.name not in ("op", "op_seq", "source_file")
    ]
    from pyspark.sql import types as T

    evolved = evolve_schema(cur_user, T.StructType(batch_payload_fields))
    user_cols = [f.name for f in evolved.fields]
    payload_cols = [c for c in user_cols if c not in KEY_COLS and c != "ts"]
    storage_schema = table.storage_schema(evolved)
    storage_cols = [f.name for f in storage_schema.fields]
    new_sid = table.next_schema_id(evolved)

    # ---- bucket pruning: which buckets does this batch touch? ----
    batch = batch.withColumn("__bucket", table.bucket_expr())
    touched = sorted(
        r[0] for r in batch.select("__bucket").distinct().collect()
    )  # ≤ n_buckets ints — driver-safe
    stats.touched_buckets = touched

    target = table.read_storage(spark, touched)
    target = _align_to(target, storage_cols, storage_schema)

    s = batch.alias("s")
    t = target.alias("t")
    cond = (F.col(f"s.{KEY_COLS[0]}") == F.col(f"t.{KEY_COLS[0]}")) & (
        F.col(f"s.{KEY_COLS[1]}") == F.col(f"t.{KEY_COLS[1]}")
    )
    j = s.join(t, cond, "full_outer")

    s_present = F.col("s.op_seq").isNotNull()
    t_present = F.col("t.op_seq").isNotNull()
    s_wins = s_present & (
        ~t_present
        | (F.struct(F.col("s.ts"), F.col("s.op_seq"))
           >= F.struct(F.col("t.ts"), F.col("t.op_seq")))
    )
    is_del = F.col("s.op") == F.lit("D")

    disposition = (
        F.when(~s_present, F.lit("carried"))
        .when(~t_present & is_del, F.lit("deleted"))       # tombstone insert
        .when(~t_present, F.lit("inserted"))
        .when(~s_wins, F.lit("stale_skipped"))
        .when(is_del, F.lit("deleted"))
        .otherwise(F.lit("updated"))
    )

    out_cols = [
        F.coalesce(F.col(f"s.{KEY_COLS[0]}"), F.col(f"t.{KEY_COLS[0]}")).alias(KEY_COLS[0]),
        F.coalesce(F.col(f"s.{KEY_COLS[1]}"), F.col(f"t.{KEY_COLS[1]}")).alias(KEY_COLS[1]),
    ]
    for c in payload_cols:
        src = (
            F.when(is_del, F.lit(None).cast(evolved[c].dataType))
            .otherwise(F.col(f"s.{c}") if c in batch.columns
                       else F.lit(None).cast(evolved[c].dataType))
        )
        out_cols.append(
            F.when(s_wins, src).otherwise(F.col(f"t.{c}")).cast(evolved[c].dataType).alias(c)
        )
    out_cols += [
        F.when(s_wins, F.col("s.ts")).otherwise(F.col("t.ts")).alias("ts"),
        F.when(s_wins, F.col("s.op_seq")).otherwise(F.col("t.op_seq")).alias("op_seq"),
        F.when(s_wins, is_del).otherwise(F.col("t.deleted")).alias("deleted"),
        F.when(s_wins, F.lit(batch_id)).otherwise(F.col("t.batch_id")).alias("batch_id"),
        F.when(s_wins, F.col("s.source_file") if "source_file" in batch.columns
               else F.lit(None).cast("string"))
        .otherwise(F.col("t.source_file")).alias("source_file"),
        F.when(s_wins, F.current_timestamp()).otherwise(F.col("t.ingest_ts")).alias("ingest_ts"),
        disposition.alias("__disp"),
    ]
    merged = j.select(*out_cols)
    merged = merged.persist()
    try:
        # one aggregation pass yields metrics + per-bucket lineage
        agg = (
            merged.groupBy("__disp", table.bucket_expr().alias("__bucket"))
            .count()
            .collect()
        )
        disp_counts: dict[str, int] = {}
        bucket_rows: dict[str, int] = {}
        for r in agg:
            disp_counts[r["__disp"]] = disp_counts.get(r["__disp"], 0) + r["count"]
            bucket_rows[str(r["__bucket"])] = (
                bucket_rows.get(str(r["__bucket"]), 0) + r["count"]
            )
        stats.inserted = disp_counts.get("inserted", 0)
        stats.updated = disp_counts.get("updated", 0)
        stats.deleted = disp_counts.get("deleted", 0)
        stats.stale_skipped = disp_counts.get("stale_skipped", 0)
        stats.carried = disp_counts.get("carried", 0)
        stats.bucket_rows = bucket_rows
        stats.failed = failed
        stats.events_in = events_in if events_in is not None else stats.applied() + failed
        stats.dup_dropped = max(0, stats.events_in - stats.failed - stats.applied())

        files = table.write_bucket_files(
            merged.drop("__disp"), version_tag=f"merge-v{batch_id[:12]}", schema_id=new_sid
        )
    finally:
        merged.unpersist()

    stats.wall_sec = time.time() - t0
    record: dict[str, Any] = {
        "events_in": stats.events_in,
        "dup_dropped": stats.dup_dropped,
        "inserted": stats.inserted,
        "updated": stats.updated,
        "deleted": stats.deleted,
        "stale_skipped": stats.stale_skipped,
        "carried": stats.carried,
        "failed": stats.failed,
        "wall_sec": stats.wall_sec,
        "bucket_rows": stats.bucket_rows,
        "source_files": source_files or [],
        "engine_version": ENGINE_VERSION,
    }
    table.commit_version(
        files, touched, batch_id, record, new_user_schema=evolved, segments=segments
    )
    return stats
