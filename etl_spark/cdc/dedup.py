"""In-batch last-writer-wins dedup — collapse a CDC micro-batch to one
event per (conv_id, turn_idx), keeping the max-(ts, op_seq) event.

This is the engine-side realization of the reference's "fields used by
gardener's dedup" contract (/root/reference/parser/parser.go:157-176 —
synthetic UUIDs exist solely so downstream can dedup on them; planned
incoming → deduplicated base_tables flow, /root/reference/schema/README.md:6-10).
It is also MANDATORY before MERGE: like Iceberg, the merge rejects a source
with multiple rows per key.

Three implementations, same semantics:

* ``lww_dedup`` (DEFAULT) — hash-aggregate ``max_by(struct(*), (ts, op_seq))``.
  Spark's hash aggregate does map-side PARTIAL aggregation, so a hot
  conversation's duplicates collapse locally on each input partition before
  the shuffle — the skew never reaches the exchange. This is strictly better
  than a window at scale: one shuffle of pre-collapsed rows, no sort.
* ``lww_dedup_salted`` — explicit two-phase salted variant (phase 1: max per
  (key, salt); phase 2: max of maxes). Kept for the pathological case where
  partial aggregation is defeated (e.g. agg buffer eviction under extreme
  cardinality); also the documented skew-handling evidence for the
  north-rule's "salted repartitioning for hot-key skew".
* ``lww_dedup_window`` — row_number() over (key ORDER BY ts DESC, op_seq
  DESC); the naive formulation, kept as a test oracle (sorts + shuffles the
  full batch — do not use in the hot path).

Tie-breaking: equal (ts, op_seq) means duplicate delivery of the same event
(payloads identical), so any winner is correct; max_by picks one
deterministically per aggregation tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from etl_spark.schema import KEY_COLS


def _value_cols(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c not in KEY_COLS]


def lww_dedup(batch: DataFrame) -> DataFrame:
    vals = _value_cols(batch)
    return (
        batch.groupBy(*KEY_COLS)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in vals]),
                F.struct(F.col("ts"), F.col("op_seq")),
            ).alias("__w")
        )
        .select(*KEY_COLS, *[F.col(f"__w.{c}").alias(c) for c in vals])
    )


def lww_dedup_salted(batch: DataFrame, salt_buckets: int = 32) -> DataFrame:
    """Two-phase: (key, salt) partial max → key max. The salt spreads one hot
    key over ``salt_buckets`` reducers in phase 1."""
    vals = _value_cols(batch)
    packed = F.struct(*[F.col(c) for c in vals])
    order = F.struct(F.col("ts"), F.col("op_seq"))
    phase1 = (
        batch.withColumn("__salt", F.pmod(F.col("op_seq"), F.lit(salt_buckets)))
        .groupBy(*KEY_COLS, "__salt")
        .agg(F.max_by(packed, order).alias("__w"))
    )
    return (
        phase1.groupBy(*KEY_COLS)
        .agg(
            F.max_by(
                F.col("__w"), F.struct(F.col("__w.ts"), F.col("__w.op_seq"))
            ).alias("__w")
        )
        .select(*KEY_COLS, *[F.col(f"__w.{c}").alias(c) for c in vals])
    )


# partition-index → magic int whose murmur3 hash lands EXACTLY in that
# partition, per partition count (computed once per process, via Spark's own
# hash so the mapping can never drift from HashPartitioning semantics)
_SLOT_MAGIC: dict[int, list[int]] = {}


def _slot_magic(spark, p: int) -> list[int]:
    """For each partition index i in [0, p): an int v_i with
    pmod(murmur3(v_i), p) == i. ``repartition(p, slot)`` over these values
    is then an IDENTITY mapping — every reduce task receives exactly
    ceil(buckets/p) bucket values. Without this, hashing a LOW-cardinality
    bucket column Poisson-collides (64 values into 32 partitions leaves
    some tasks with 4-5 buckets and others empty — measured 0.87 core
    utilization on the append exchange; even slots remove the collision
    variance entirely). One tiny driver job per (process, p), cached."""
    if p not in _SLOT_MAGIC:
        rows = (
            spark.range(0, max(4096, 200 * p))
            .select(
                F.col("id").cast("int").alias("v"),
                F.pmod(F.hash(F.col("id").cast("int")), F.lit(p)).alias("slot"),
            )
            .groupBy("slot")
            .agg(F.min("v").alias("v"))
            .collect()
        )
        magic = [None] * p
        for r in rows:
            magic[r["slot"]] = r["v"]
        if any(m is None for m in magic):  # astronomically unlikely
            raise RuntimeError(f"slot search incomplete for p={p}")
        _SLOT_MAGIC[p] = magic
    return _SLOT_MAGIC[p]


def lww_dedup_clustered(batch: DataFrame, bucket_col: str = "__bucket") -> DataFrame:
    """LWW dedup that shuffles ONCE on the table bucket instead of twice
    (key-hash exchange for the aggregate + bucket exchange for the write).

    Because key → bucket is functional (bucket = pmod(hash(conv_id), n)),
    every duplicate of a key lands in the same bucket partition. Sorting the
    partition by (key, ts DESC, op_seq DESC) makes the FIRST row of each key
    run the last-writer winner; a lag() comparison over the same window
    keeps exactly those rows. All JVM-side (exchange + sort + filter inside
    whole-stage codegen, no Python), and the output is both clustered by
    bucket AND sorted by key — the bucket write needs no second exchange,
    and the per-bucket parquet files carry sorted key runs (tighter min/max
    stats for the MOR read-time merge and snapshot scans).

    Used on the append/MOR hot path where the deduped batch flows straight
    to the bucket-partitioned write. The COW full-merge path keeps the
    map-side-combining ``lww_dedup``: its join re-exchanges on the key
    anyway, so the saved exchange does not exist there.

    Skew: the exchange key is the bucket (≥64 hash-spread conversations per
    value), not the conversation — a hot conversation costs one partition a
    longer SORT, not a hot reducer for a hash aggregate. Same batch-size
    scaling as the salted variant, without the second aggregation pass.
    """
    spark = batch.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    magic = _slot_magic(spark, p)
    # balanced exchange: slot = magic[bucket % p] hashes to EXACTLY
    # partition (bucket % p), so reduce-task loads differ only by bucket
    # content, never by hash collisions. slot is functional in the bucket
    # (hence in the key), so windowing over the slot keeps every key's
    # duplicates together, and each task still holds whole buckets —
    # the bucket-partitioned write stays exchange-free.
    slot = F.element_at(
        F.array(*[F.lit(m) for m in magic]),
        (F.pmod(F.col(bucket_col), F.lit(p)) + 1).cast("int"),
    )
    clustered = batch.withColumn("__slot", slot).repartition(p, F.col("__slot"))
    w = W.partitionBy("__slot").orderBy(
        *[F.col(c) for c in KEY_COLS], F.col("ts").desc(), F.col("op_seq").desc()
    )
    prev = F.struct(*[F.lag(c).over(w).alias(c) for c in KEY_COLS])
    cur = F.struct(*[F.col(c) for c in KEY_COLS])
    # eqNullSafe: the first row of a partition sees a struct of NULL lags —
    # plain != would evaluate to NULL and the filter would drop it
    return (
        clustered.withColumn("__first", ~prev.eqNullSafe(cur))
        .filter(F.col("__first"))
        .drop("__first", "__slot")
    )


def lww_dedup_window(batch: DataFrame) -> DataFrame:
    w = W.partitionBy(*KEY_COLS).orderBy(F.col("ts").desc(), F.col("op_seq").desc())
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
