"""Stream-stream watermarked join + cross-trigger dedup (cdc/sjoin.py).

Each streaming result is compared against the equivalent STATIC plan over
the full feed — the availableNow drain must converge to the batch answer.
"""

import os

from pyspark.sql import functions as F

from etl_spark.cdc import change_feed_df, write_feed
from etl_spark.cdc.sjoin import (
    batch_meta_join,
    build_meta_feed,
    stream_dedup_within_watermark,
    stream_stream_meta_join,
)


def _mk_feed(spark, tmpdir_path, **kw):
    feed = os.path.join(tmpdir_path, "feed")
    write_feed(
        change_feed_df(
            spark,
            n_events=kw.pop("n_events", 8000),
            n_convs=kw.pop("n_convs", 150),
            max_turns=10,
            seed=kw.pop("seed", 7),
            n_batches=kw.pop("n_batches", 4),
            **kw,
        ),
        feed,
    )
    return feed


def _key_set(df, cols):
    return {tuple(r) for r in df.select(*cols).collect()}


def test_stream_stream_join_matches_batch(spark, tmpdir_path):
    feed = _mk_feed(spark, tmpdir_path)
    meta = os.path.join(tmpdir_path, "meta")
    out = os.path.join(tmpdir_path, "out")
    ck = os.path.join(tmpdir_path, "ck")
    build_meta_feed(spark, feed, meta)

    stream_stream_meta_join(
        spark, feed, meta, ck, out, horizon="1 hour", max_files_per_trigger=4
    )
    got = spark.read.parquet(out)
    want = batch_meta_join(spark, feed, meta, horizon="1 hour")

    cols = ["conv_id", "turn_idx", "op_seq", "registrar"]
    assert got.count() == want.count()
    assert _key_set(got, cols) == _key_set(want, cols)
    # the horizon actually bites: some events fall outside it
    all_ev = spark.read.option("mergeSchema", "true").parquet(f"{feed}/*")
    assert got.count() < all_ev.count()
    # every joined row really is inside [reg_ts, reg_ts + 1h)
    bad = (
        got.join(
            spark.read.parquet(meta).withColumnRenamed("conv_id", "c2"),
            got.conv_id == F.col("c2"),
        )
        .filter(
            (F.col("ts") < F.col("reg_ts"))
            | (F.col("ts") >= F.col("reg_ts") + F.expr("INTERVAL 1 hour"))
        )
        .count()
    )
    assert bad == 0


def test_stream_stream_join_resumes_from_checkpoint(spark, tmpdir_path):
    """Kill-and-restart: drain half the feed, then add the rest and re-run
    with the SAME checkpoint — no double-emission, converges to batch."""
    feed = _mk_feed(spark, tmpdir_path, n_batches=2, seed=11)
    meta = os.path.join(tmpdir_path, "meta")
    out = os.path.join(tmpdir_path, "out")
    ck = os.path.join(tmpdir_path, "ck")
    build_meta_feed(spark, feed, meta)

    stream_stream_meta_join(spark, feed, meta, ck, out, max_files_per_trigger=2)
    n_first = spark.read.parquet(out).count()

    # second drain with the same checkpoint: nothing new → nothing emitted
    stream_stream_meta_join(spark, feed, meta, ck, out, max_files_per_trigger=2)
    got = spark.read.parquet(out)
    assert got.count() == n_first
    want = batch_meta_join(spark, feed, meta)
    assert got.count() == want.count()
    cols = ["conv_id", "turn_idx", "op_seq", "registrar"]
    assert _key_set(got, cols) == _key_set(want, cols)


def test_stream_dedup_within_watermark(spark, tmpdir_path):
    feed = _mk_feed(spark, tmpdir_path, dup_ratio=0.25, seed=23)
    out = os.path.join(tmpdir_path, "out")
    ck = os.path.join(tmpdir_path, "ck")

    stream_dedup_within_watermark(spark, feed, ck, out, max_files_per_trigger=3)
    got = spark.read.parquet(out)
    all_ev = spark.read.option("mergeSchema", "true").parquet(f"{feed}/*")

    # exactly one row per distinct delivery key, duplicates existed
    n_distinct = all_ev.select("conv_id", "turn_idx", "op_seq").distinct().count()
    assert all_ev.count() > n_distinct  # generator really redelivered
    assert got.count() == n_distinct
    assert (
        got.groupBy("conv_id", "turn_idx", "op_seq").count().filter("count > 1").count()
        == 0
    )
