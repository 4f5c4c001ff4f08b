"""Stateful streaming: cross-trigger applyInPandasWithState accumulation,
checkpoint resume without state loss, and watermarked append-mode windows.
(Reference analog: per-session state held across the input scan,
/root/reference/parser/ndt.go:210-309.)"""

import os
import shutil

from pyspark.sql import functions as F

from etl_spark.cdc.gen import change_feed_df, write_feed
from etl_spark.cdc.stateful import (
    batch_conv_stats,
    conv_running_stats,
    windowed_op_rollup,
)


def _gen_feed(spark, path, n_batches=3, n_events=6000, seed=11, **kw):
    write_feed(
        change_feed_df(
            spark, n_events=n_events, n_convs=120, max_turns=16,
            seed=seed, n_batches=n_batches, **kw,
        ),
        path, n_batches=n_batches, files_per_segment=4,
    )


def _final_stats(spark, out_dir):
    """Latest emission per conversation."""
    out = spark.read.parquet(out_dir)
    last = out.groupBy("conv_id").agg(F.max("emit_seq").alias("emit_seq"))
    return out.join(last, ["conv_id", "emit_seq"])


def test_running_stats_accumulate_across_triggers(spark, tmpdir_path):
    feed = os.path.join(tmpdir_path, "feed")
    _gen_feed(spark, feed)
    out_dir = os.path.join(tmpdir_path, "out")
    conv_running_stats(
        spark, feed, os.path.join(tmpdir_path, "ckpt"), out_dir,
        max_files_per_trigger=4,  # 3 segments x 4 files -> >= 3 triggers
    )
    got = {
        r["conv_id"]: (r["events_seen"], r["max_turn"], r["last_ts"])
        for r in _final_stats(spark, out_dir).collect()
    }
    want = {
        r["conv_id"]: (r["events_seen"], r["max_turn"], r["last_ts"])
        for r in batch_conv_stats(spark, feed).collect()
    }
    assert got == want
    # state really crossed triggers: some conversation was emitted more
    # than once (touched by more than one trigger)
    multi = spark.read.parquet(out_dir).filter("emit_seq > 1").count()
    assert multi > 0


def test_running_stats_resume_from_checkpoint(spark, tmpdir_path):
    """Drain 2 segments, then a third arrives; restart with the SAME
    checkpoint — counters continue from state (not reset), and already-
    emitted triggers are not re-emitted."""
    full = os.path.join(tmpdir_path, "full")
    _gen_feed(spark, full, n_batches=3)
    feed = os.path.join(tmpdir_path, "feed")
    os.makedirs(feed)
    segs = sorted(os.listdir(full))
    for s in segs[:2]:
        shutil.copytree(os.path.join(full, s), os.path.join(feed, s))
    ckpt = os.path.join(tmpdir_path, "ckpt")
    out_dir = os.path.join(tmpdir_path, "out")
    conv_running_stats(spark, feed, ckpt, out_dir)
    n_first = spark.read.parquet(out_dir).count()
    # third segment arrives; same checkpoint
    shutil.copytree(os.path.join(full, segs[2]), os.path.join(feed, segs[2]))
    conv_running_stats(spark, feed, ckpt, out_dir)
    got = {
        r["conv_id"]: (r["events_seen"], r["max_turn"], r["last_ts"])
        for r in _final_stats(spark, out_dir).collect()
    }
    want = {
        r["conv_id"]: (r["events_seen"], r["max_turn"], r["last_ts"])
        for r in batch_conv_stats(spark, full).collect()
    }
    assert got == want  # resumed state, not recount-from-zero
    n_second = spark.read.parquet(out_dir).count()
    assert n_second > n_first  # new emissions appended, old ones kept


def test_windowed_rollup_append_matches_batch(spark, tmpdir_path):
    # clean monotone feed (no dup re-delivery, no ts back-jumps): every
    # flushed window is final, so streaming == batch exactly
    feed = os.path.join(tmpdir_path, "feed")
    _gen_feed(spark, feed, dup_ratio=0.0, ooo_ratio=0.0)
    out_dir = os.path.join(tmpdir_path, "out")
    wm = windowed_op_rollup(
        spark, feed, os.path.join(tmpdir_path, "ckpt"), out_dir,
        window="10 minutes", watermark="5 minutes", max_files_per_trigger=4,
    )
    emitted = spark.read.parquet(out_dir)
    batch = (
        spark.read.option("mergeSchema", "true").parquet(f"{feed}/*")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "op")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "op",
            F.col("n").alias("n_batch"),
        )
    )
    # every emitted window is final => must match the batch value exactly
    j = emitted.join(batch, ["win_start", "win_end", "op"], "left")
    assert j.filter("n_batch IS NULL OR n != n_batch").count() == 0
    # and the flush boundary is the watermark: windows ending at or before
    # it were emitted, windows starting after it were not
    assert wm is not None
    n_due = batch.filter(F.col("win_end") <= F.lit(wm).cast("timestamp")).count()
    n_emitted = emitted.count()
    assert n_emitted >= n_due
    assert emitted.filter(F.col("win_start") > F.lit(wm).cast("timestamp")).count() == 0


def test_windowed_rollup_drops_late_rows(spark, tmpdir_path):
    """With duplicate re-deliveries (original ts, next segment) and ts
    back-jumps, rows arriving after the watermark passed their window are
    DROPPED from append-mode output — never double-counted, never emitted
    twice. Streaming counts are therefore <= batch counts per window (the
    bounded-state tradeoff; the MERGE path handles late rows via LWW
    instead, which is why the apply loop doesn't window)."""
    feed = os.path.join(tmpdir_path, "feed")
    _gen_feed(spark, feed)  # default 5% dups / 10% out-of-order
    out_dir = os.path.join(tmpdir_path, "out")
    windowed_op_rollup(
        spark, feed, os.path.join(tmpdir_path, "ckpt"), out_dir,
        window="10 minutes", watermark="5 minutes", max_files_per_trigger=4,
    )
    emitted = spark.read.parquet(out_dir)
    batch = (
        spark.read.option("mergeSchema", "true").parquet(f"{feed}/*")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "op")
        .agg(F.count(F.lit(1)).alias("n_batch"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "op",
            "n_batch",
        )
    )
    j = emitted.join(batch, ["win_start", "win_end", "op"], "left")
    # no window emitted twice, none exceeds its true total
    assert emitted.groupBy("win_start", "win_end", "op").count().filter("count > 1").count() == 0
    assert j.filter("n > n_batch").count() == 0


def test_session_rollup_append_matches_batch(spark, tmpdir_path):
    """session_window in a STREAM: sessions merge across triggers in the
    state store and emit once the watermark passes their end — emitted
    sessions must equal the batch session_window aggregation exactly."""
    from etl_spark.cdc.stateful import batch_session_rollup, streaming_session_rollup

    feed = os.path.join(tmpdir_path, "feed")
    _gen_feed(spark, feed, dup_ratio=0.0, ooo_ratio=0.0)
    out_dir = os.path.join(tmpdir_path, "out")
    wm = streaming_session_rollup(
        spark, feed, os.path.join(tmpdir_path, "ckpt"), out_dir,
        gap="10 minutes", watermark="5 minutes", max_files_per_trigger=4,
    )
    emitted = spark.read.parquet(out_dir)
    assert emitted.count() > 0
    batch = batch_session_rollup(spark, feed, gap="10 minutes").withColumnRenamed(
        "n", "n_batch"
    )
    # every emitted session is closed and final => exact batch equality
    j = emitted.join(batch, ["session_start", "session_end", "conv_id"], "left")
    assert j.filter("n_batch IS NULL OR n != n_batch").count() == 0
    # flush boundary: no emitted session extends past the final watermark
    assert wm is not None
    assert emitted.filter(
        F.col("session_end") > F.lit(wm).cast("timestamp")
    ).count() == 0
    # sessions genuinely coalesce events: some session holds more than one
    assert emitted.filter("n > 1").count() > 0
