"""Deterministic CDC change-feed generator (FIXTURES.md F2).

Everything is a pure column expression of the event id and an integer seed —
no wall-clock, no Python RNG in the row path — so the same (seed, knobs)
always produce byte-identical feeds, at any parallelism, on any cluster.
Spark-native: built on ``spark.range`` (parallelized long range), all
columns derived via JVM-side expressions; scales linearly with cores.

Knobs (cf. FIXTURES.md F2): #conversations, max turns/conv, update/delete
ratios, duplicate-delivery ratio (same op_seq re-emitted in a later batch —
dedup test), out-of-order fraction (ts earlier than already-shipped events —
LWW test), Zipf-ish hot-conversation skew, schema-evolution batch K
(tool_version/tool_latency_ms appear from batch K on — the north-star's
"new tool metadata fields").
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, fixed epoch base

EVOLVED_COLS = ["tool_version", "tool_latency_ms"]


def _h(seed: int, tag: int) -> F.Column:
    """Independent 64-bit hash stream per (seed, tag)."""
    return F.xxhash64(F.col("id"), F.lit(seed), F.lit(tag))


def _u01(seed: int, tag: int) -> F.Column:
    return F.pmod(_h(seed, tag), F.lit(1_000_000)).cast("double") / 1_000_000.0


def change_feed_df(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 1000,
    max_turns: int = 32,
    seed: int = 42,
    skew: float = 2.0,
    delete_ratio: float = 0.05,
    dup_ratio: float = 0.05,
    ooo_ratio: float = 0.10,
    n_batches: int = 8,
    evolve_from_batch: int | None = None,
    text_len: int = 240,
    patch_ratio: float = 0.0,
) -> DataFrame:
    """Return the change feed as a DataFrame with a ``batch`` column.

    ``skew`` > 1 concentrates events on low conv ids (hot conversations):
    conv = floor(n_convs * u^skew). op_seq is the global sequence (= id for
    originals); duplicates re-emit the SAME op_seq in a later batch.

    ``patch_ratio`` carves op='P' sparse partial-updates out of the update
    share (each patch sets exactly one of text/tool, hash-chosen; NULL =
    unchanged — cdc/patch.py semantics). Replaying a patch feed needs
    ``allow_patches=True``; note the whole-row LWW oracle
    (cdc/oracle.expected_final_state) does NOT model patches — use the
    per-column reduction of tests/test_patch.py as the oracle instead.
    """
    per_batch = max(1, (n_events + n_batches - 1) // n_batches)
    df = spark.range(n_events)

    conv_idx = F.floor(F.lit(float(n_convs)) * F.pow(_u01(seed, 1), F.lit(skew))).cast("int")
    conv_id = F.format_string("conv-%08d", conv_idx)
    turn_idx = F.pmod(_h(seed, 2), F.lit(max_turns)).cast("int")
    u_op = _u01(seed, 3)
    op = (
        F.when(u_op < F.lit(delete_ratio), F.lit("D"))
        .when(u_op < F.lit(delete_ratio + 0.3), F.lit("I"))
        .when(u_op < F.lit(delete_ratio + 0.3 + patch_ratio), F.lit("P"))
        .otherwise(F.lit("U"))
    )
    # ts: monotone base + out-of-order back-jumps for a fraction of events
    jitter = F.when(
        _u01(seed, 4) < F.lit(ooo_ratio),
        -(F.pmod(_h(seed, 5), F.lit(3_600_000_000))),  # up to 1h late
    ).otherwise(F.lit(0))
    ts = F.timestamp_micros(
        F.lit(BASE_TS_US) + F.col("id") * F.lit(1_000_000) + jitter
    )
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        (F.pmod(_h(seed, 6), F.lit(4)) + 1).cast("int"),
    )
    tool = F.when(
        role == "tool", F.format_string("tool-%02d", F.pmod(_h(seed, 7), F.lit(16)).cast("int"))
    ).otherwise(F.lit(None).cast("string"))
    text = F.concat(
        F.format_string("c%08d-t%02d-s%012d-", conv_idx, turn_idx, F.col("id")),
        F.repeat(F.lit("x"), F.pmod(_h(seed, 8), F.lit(text_len)).cast("int")),
    )
    batch = F.least(F.floor(F.col("id") / F.lit(per_batch)), F.lit(n_batches - 1)).cast("int")

    null_s = F.lit(None).cast("string")
    patch_text = F.when(
        F.pmod(_h(seed, 13), F.lit(2)) == 0, F.concat(F.lit("patch:"), text)
    ).otherwise(null_s)
    patch_tool = F.when(
        F.pmod(_h(seed, 13), F.lit(2)) == 1,
        F.format_string("ptool-%02d", F.pmod(_h(seed, 14), F.lit(16)).cast("int")),
    ).otherwise(null_s)
    base = df.select(
        op.alias("op"),
        ts.alias("ts"),
        F.col("id").alias("op_seq"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(op.isin("D", "P"), null_s).otherwise(role).alias("role"),
        F.when(op == "D", null_s)
        .when(op == "P", patch_text)
        .otherwise(text)
        .alias("text"),
        F.when(op == "D", null_s)
        .when(op == "P", patch_tool)
        .otherwise(tool)
        .alias("tool"),
        batch.alias("batch"),
        _u01(seed, 9).alias("__dup_u"),
    )
    # duplicate deliveries: re-emit a sample of events, same op_seq, batch+1
    dups = base.filter(F.col("__dup_u") < F.lit(dup_ratio)).withColumn(
        "batch", F.least(F.col("batch") + 1, F.lit(n_batches - 1)).cast("int")
    )
    feed = base.unionByName(dups).drop("__dup_u")
    feed = feed.withColumn("source_file", F.format_string("seg-%05d", F.col("batch")))

    if evolve_from_batch is not None:
        # post-K events carry the new metadata columns (pre-K batches get the
        # columns DROPPED at write time in write_feed — they never existed)
        # gated on FULL ops: a patch row with tool set must stay a
        # one-column event ("each patch sets exactly one of text/tool"),
        # never silently grow evolved columns too
        feed = feed.withColumn(
            "tool_version",
            F.when(
                (F.col("batch") >= evolve_from_batch)
                & F.col("tool").isNotNull()
                & (F.col("op") != "P"),
                F.format_string("v%d.%d", F.pmod(_hash_col("op_seq", seed, 10), F.lit(3)),
                                F.pmod(_hash_col("op_seq", seed, 11), F.lit(10))),
            ).otherwise(F.lit(None).cast("string")),
        ).withColumn(
            "tool_latency_ms",
            F.when(
                (F.col("batch") >= evolve_from_batch)
                & F.col("tool").isNotNull()
                & (F.col("op") != "P"),
                F.pmod(_hash_col("op_seq", seed, 12), F.lit(5000)),
            ).otherwise(F.lit(None).cast("long")),
        )
    return feed


def _hash_col(col: str, seed: int, tag: int) -> F.Column:
    return F.xxhash64(F.col(col), F.lit(seed), F.lit(tag))



def _stamp_arrival_order(dirs: list[str]) -> list[str]:
    """Give each segment's files a strictly later mtime than its
    predecessor's. Spark's file source sequences micro-batch triggers by
    modification time; a single write job gives EVERY segment's files the
    same mtime, so trigger order becomes arbitrary — and a segment consumed
    out of order by more than the watermark delay gets its rows dropped as
    late (observed as a rare flake in the windowed-rollup tests). A real
    binlog segment arrives strictly after its predecessor; stamping
    ascending mtimes makes the simulated feed honor that contract."""
    base = time.time() - len(dirs)
    for k, d in enumerate(dirs):
        for root, _subdirs, files in os.walk(d):
            for fn in files:
                os.utime(os.path.join(root, fn), (base + k, base + k))
    return dirs


def write_feed(
    feed: DataFrame,
    feed_dir: str,
    evolve_from_batch: int | None = None,
    n_batches: int | None = None,
    files_per_segment: int = 8,
    fmt: str = "parquet",
    codec: str | None = None,
) -> list[str]:
    """Materialize the feed as one directory per batch
    (``feed/batch=00042/``), simulating binlog segment arrival. Pre-evolution
    batches are written WITHOUT the evolved columns (they didn't exist yet).
    Returns the ordered list of batch directories.

    ``fmt``: "parquet" (default) or "jsonl" — gzip-compressed JSON-lines
    segments, the wire shape of the reference's archive feeds (tar.gz of
    row files, /root/reference/storage/storage.go). ``codec`` overrides the
    compression codec: for parquet "snappy"/"zstd"/"gzip" (zstd exercises
    the pure-Java zstd-jni path — the S4 substrate), for jsonl "gzip"
    (default) or "none".

    Each segment is split into ``files_per_segment`` parquet files so a
    consumer's scan stage parallelizes even for a single segment (a one-file
    segment is one row group = ONE Spark task — it serializes every
    downstream map stage regardless of core count).

    Fast path (no schema evolution): ONE job with ``partitionBy('batch')``
    — a single shuffle instead of n_batches full-feed passes. The evolution
    path keeps the per-batch loop because pre-K segments drop columns."""
    feed = feed.persist()
    try:
        if n_batches is None:
            n_batches = feed.agg(F.max("batch")).collect()[0][0] + 1
        if fmt == "jsonl":
            dirs = []
            for k in range(n_batches):
                part = feed.filter(F.col("batch") == k).drop("batch")
                if evolve_from_batch is not None and k < evolve_from_batch:
                    part = part.drop(*EVOLVED_COLS)
                d = os.path.join(feed_dir, f"batch={k:05d}")
                (
                    part.repartition(files_per_segment)
                    .write.mode("overwrite")
                    .option("compression", codec or "gzip")
                    # default JSON timestamp format truncates to millis —
                    # µs precision is load-bearing for LWW ordering
                    .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
                    .json(d)
                )
                dirs.append(d)
            return _stamp_arrival_order(dirs)
        if evolve_from_batch is None:
            # range-partition on (batch, mod) with the partition count
            # pinned to the combo count: round-1's hash repartition into
            # the default shuffle-partition count collided combos and
            # silently landed well below files_per_segment files per
            # segment — capping the very scan parallelism the parameter
            # promises
            (
                feed.repartitionByRange(
                    n_batches * files_per_segment,
                    F.col("batch"),
                    F.pmod(F.col("op_seq"), F.lit(files_per_segment)),
                )
                .write.partitionBy("batch")
                .mode("overwrite")
                .option("compression", codec or "snappy")
                .parquet(feed_dir)
            )
            dirs = []
            for k in range(n_batches):
                src = os.path.join(feed_dir, f"batch={k}")
                dst = os.path.join(feed_dir, f"batch={k:05d}")
                if os.path.isdir(src) and src != dst:
                    os.rename(src, dst)
                dirs.append(dst)
            # drop root-level writer droppings (_SUCCESS, .crc) so the feed
            # dir contains ONLY segment directories
            for name in os.listdir(feed_dir):
                p = os.path.join(feed_dir, name)
                if os.path.isfile(p):
                    os.remove(p)
            return _stamp_arrival_order(dirs)
        dirs = []
        for k in range(n_batches):
            part = feed.filter(F.col("batch") == k).drop("batch")
            if evolve_from_batch is not None and k < evolve_from_batch:
                part = part.drop(*EVOLVED_COLS)
            d = os.path.join(feed_dir, f"batch={k:05d}")
            part.repartition(
                max(1, part.sparkSession.sparkContext.defaultParallelism // 4)
            ).write.mode("overwrite").option(
                "compression", codec or "snappy"
            ).parquet(d)
            dirs.append(d)
        return _stamp_arrival_order(dirs)
    finally:
        feed.unpersist()
