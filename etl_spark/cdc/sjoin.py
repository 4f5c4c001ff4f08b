"""Stream-stream joins and cross-trigger dedup (Structured Streaming).

The reference pairs two feeds INSIDE its streaming pipeline: every NDT
session joins its meta file against the snaplog stream before rows are
emitted (/root/reference/parser/ndt.go:295-301,571-582 — ProcessMetaFile
buffers one side, the snaplog scan probes it). The batch analog is the
registry's ``meta_snaplog_join``; this module is the STREAMING-native
analog: two unbounded sources, both watermarked, joined with an
event-time bound so Spark's state store can expire buffered rows.

Why the time bound is load-bearing at 10^10 events: an unbounded
stream-stream inner join must keep EVERY past row of both sides in state
forever. With ``withWatermark`` on both sides plus a join condition that
bounds event time (meta.reg_ts <= ev.ts < meta.reg_ts + horizon), Spark
derives a state-eviction watermark per side — state is then
O(events inside the horizon), not O(stream history). Same discipline as
the reference's per-session buffer: it holds ONE session's meta in
memory, never the archive.

``stream_dedup_within_watermark`` is the streaming twin of the engine's
delivery dedup: the feed generator redelivers events (dup_ratio); batch
mode drops them in the LWW pre-reduce, an unbounded stream drops them
with ``dropDuplicatesWithinWatermark`` — exact-key dedup whose state also
expires with the watermark (duplicate deliveries land within seconds of
each other in any real bus; the horizon bounds state, LWW in the sink
merge remains the correctness backstop for anything later).

Both drain with ``trigger(availableNow=True)`` in tests and run unbounded
in production; both resume from ``checkpointLocation``. The parquet sink
is exactly-once via the sink commit log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_spark.cdc.stream import detect_feed_schema


def build_meta_feed(spark: SparkSession, feed_dir: str, meta_dir: str) -> None:
    """Derive the deterministic conversation-registration feed: one row per
    conv_id with its first-seen event time (the analog of the reference's
    .meta sidecar file per session). Written as parquet so it can be read
    back as an unbounded file-source stream."""
    (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{feed_dir}/*")
        .groupBy("conv_id")
        .agg(F.min("ts").alias("reg_ts"))
        .withColumn("registrar", F.concat(F.lit("reg-"), F.crc32("conv_id") % 8))
        .coalesce(4)
        .write.mode("overwrite")
        .parquet(meta_dir)
    )


def stream_stream_meta_join(
    spark: SparkSession,
    feed_dir: str,
    meta_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    horizon: str = "1 hour",
    ev_watermark: str = "2 hours",
    meta_watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> None:
    """Watermarked inner stream-stream join: turn events ⋈ registration
    meta on conv_id, keeping only events inside ``horizon`` of the
    conversation's registration. Emits (conv_id, turn_idx, op_seq, ts,
    registrar) rows append-only to ``out_dir``.

    State bound: both sides carry a watermark and the join condition
    bounds ``ts`` to [reg_ts, reg_ts + horizon) — Spark evicts meta rows
    once the event watermark passes reg_ts + horizon and event rows once
    the meta watermark passes their ts (visible as
    ``watermark`` predicates in the StateStoreSave nodes)."""
    schema = detect_feed_schema(spark, feed_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    ev = (
        reader.parquet(f"{feed_dir}/*")
        .select("conv_id", "turn_idx", "op_seq", "ts")
        .withWatermark("ts", ev_watermark)
    )
    meta_schema = spark.read.parquet(meta_dir).schema
    meta = (
        spark.readStream.schema(meta_schema)
        .parquet(meta_dir)
        .withColumnRenamed("conv_id", "m_conv_id")
        .withWatermark("reg_ts", meta_watermark)
    )
    joined = ev.join(
        meta,
        (F.col("conv_id") == F.col("m_conv_id"))
        & (F.col("ts") >= F.col("reg_ts"))
        & (F.col("ts") < F.col("reg_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select("conv_id", "turn_idx", "op_seq", "ts", "registrar")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def batch_meta_join(
    spark: SparkSession, feed_dir: str, meta_dir: str, horizon: str = "1 hour"
) -> DataFrame:
    """Batch oracle: the same join as a static plan."""
    ev = (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{feed_dir}/*")
        .select("conv_id", "turn_idx", "op_seq", "ts")
    )
    meta = spark.read.parquet(meta_dir).withColumnRenamed("conv_id", "m_conv_id")
    return ev.join(
        meta,
        (F.col("conv_id") == F.col("m_conv_id"))
        & (F.col("ts") >= F.col("reg_ts"))
        & (F.col("ts") < F.col("reg_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select("conv_id", "turn_idx", "op_seq", "ts", "registrar")


def stream_dedup_within_watermark(
    spark: SparkSession,
    feed_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> None:
    """Cross-trigger exact-delivery dedup: one output row per distinct
    (conv_id, turn_idx, op_seq) — redeliveries are dropped even when they
    arrive in a LATER trigger than the original (in-batch dedup can't do
    that), as long as they land within ``watermark`` of the first copy.
    State is the key set inside the watermark horizon, evicted as event
    time advances."""
    schema = detect_feed_schema(spark, feed_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    src = (
        reader.parquet(f"{feed_dir}/*")
        .select("conv_id", "turn_idx", "op_seq", "op", "ts")
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx", "op_seq"])
    )
    q = (
        src.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
