"""Stateful Structured Streaming operators over the change feed.

The apply loop itself (stream.py) is stateless per micro-batch — LWW merge
carries correctness — but the reference keeps PER-SESSION state across its
input scan (NDT session grouping + meta pairing,
/root/reference/parser/ndt.go:210-309, and the pollution lookahead buffer,
/root/reference/parser/pt.go:630-669). The streaming-native analog of that
pattern is state that SURVIVES micro-batch boundaries, which Spark provides
through two sanctioned shapes, both exercised here:

  * ``conv_running_stats`` — ``applyInPandasWithState``: an Arrow-batched
    per-key state machine (running per-conversation counters that
    accumulate across triggers). The escape hatch for state logic SQL
    can't express; still vectorized — one pandas call per key-group per
    trigger, never per row.
  * ``windowed_op_rollup`` — watermark + windowed aggregation: the
    declarative path for event-time rollups with bounded state. The
    watermark is what EXPIRES state (SURVEY §2.9); LWW handles
    correctness of late rows in the merge path, so the watermark here is
    purely a state-size/lateness-bound control.

Both run with ``trigger(availableNow=True)`` in tests (drain a static feed
deterministically) and unbounded triggers in production; both resume from
``checkpointLocation`` — kill the query, restart with the same checkpoint,
no state loss, no double-emission (file sink is exactly-once via the sink
log).

Scale notes: state lives in the executor state store partitioned by the
grouping key — no driver participation; the feed scan is the same
file-source as stream.py (checkpointed offsets). Hot conversations are one
key-group each (a group's trigger slice fits one Arrow batch comfortably:
a conversation has ≤ max_turns rows per trigger, not 10^6).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_spark.cdc.stream import detect_feed_schema

# output of conv_running_stats: one row per conversation per trigger that
# touched it; emit_seq makes "latest emission per conv" selectable.
CONV_STATS_SCHEMA = (
    "conv_id string, events_seen bigint, max_turn int, "
    "last_ts timestamp, emit_seq int"
)
_STATE_SCHEMA = "events_seen bigint, max_turn int, last_ts_us bigint, emit_seq int"


def _conv_stats_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """Per-conversation running counters. State is a flat tuple (µs ints,
    not timestamps — state columns round-trip as plain Python values);
    each trigger folds its Arrow batches in vectorized pandas ops."""
    events, max_turn, last_us, seq = (
        state.get if state.exists else (0, -1, 0, 0)
    )
    for pdf in pdfs:
        events += int(len(pdf))
        if len(pdf):
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            ts_us = pdf["ts"].astype("int64") // 1000 if pdf["ts"].dtype.kind == "M" else pdf["ts"].astype("int64")
            last_us = max(last_us, int(ts_us.max()))
    seq += 1
    state.update((events, max_turn, last_us, seq))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "events_seen": [events],
            "max_turn": [max_turn],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
            "emit_seq": [seq],
        }
    )


def conv_running_stats(
    spark: SparkSession,
    feed_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain ``feed_dir`` through a stateful per-conversation accumulator;
    append one running-stats row per touched conversation per trigger to
    ``out_dir`` (parquet). The LATEST row per conv (max emit_seq) equals
    the batch-mode aggregate over the whole feed — asserted in tests."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = detect_feed_schema(spark, feed_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    src = reader.parquet(f"{feed_dir}/*").select("conv_id", "turn_idx", "ts")
    out = src.groupBy("conv_id").applyInPandasWithState(
        _conv_stats_fn,
        outputStructType=CONV_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_op_rollup(
    spark: SparkSession,
    feed_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "1 minute",
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
):
    """Watermarked event-time windowed rollup (ops per minute per op kind),
    append mode: a window row is emitted exactly once, when the watermark
    passes its end — the bounded-state declarative shape for feed-health
    metrics at 10^10 events (state is |open windows| × |op kinds|, not
    |events|). Returns the final event-time watermark (ISO string) so
    callers/tests know which windows must have flushed."""
    schema = detect_feed_schema(spark, feed_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    src = reader.parquet(f"{feed_dir}/*").select("op", "ts")
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "op")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "op",
            "n",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    lp = q.lastProgress or {}
    return (lp.get("eventTime") or {}).get("watermark")


def batch_conv_stats(spark: SparkSession, feed_dir: str) -> DataFrame:
    """Batch-mode oracle for conv_running_stats' final state."""
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{feed_dir}/*")
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("events_seen"),
            F.max("turn_idx").alias("max_turn"),
            F.max("ts").alias("last_ts"),
        )
    )


def streaming_session_rollup(
    spark: SparkSession,
    feed_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
):
    """Watermarked SESSION windows per conversation (session_window: a
    session extends while events arrive within ``gap`` of its end),
    append mode — each closed session emits exactly once, when the
    watermark passes its end. This is the streaming-native form of the
    reference's per-session grouping (NDT session pairing,
    /root/reference/parser/ndt.go:210-309): state per OPEN session only,
    merged across triggers by the state store, expired by the watermark
    — never |events| state. Returns the final event-time watermark so
    callers know which sessions must have flushed (sessions still open
    at end-of-feed stay in state, by design)."""
    schema = detect_feed_schema(spark, feed_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    src = reader.parquet(f"{feed_dir}/*").select("conv_id", "ts")
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "conv_id",
            "n",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    lp = q.lastProgress or {}
    return (lp.get("eventTime") or {}).get("watermark")


def batch_session_rollup(spark: SparkSession, feed_dir: str, gap: str = "30 minutes") -> DataFrame:
    """Batch-mode oracle: identical session_window aggregation over the
    whole static feed."""
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{feed_dir}/*")
        .groupBy(F.session_window("ts", gap).alias("w"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "conv_id",
            "n",
        )
    )
