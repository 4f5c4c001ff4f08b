"""Bloom seen-set: filter math, distributed build, and the append-only
MERGE fast path it unlocks (SURVEY.md §7/M4; north-star "Bloom-filter-
backed seen-set")."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.apply import replay_feed
from etl_spark.cdc.bloom import (
    BloomFilter,
    any_possibly_seen,
    build_bloom,
    hash_frame,
)
from etl_spark.cdc.gen import change_feed_df, write_feed
from etl_spark.cdc.oracle import expected_final_state
from etl_spark.lake.table import LakeTable
from etl_spark.schema import KEY_COLS, TRANSCRIPT_SCHEMA


def _keys(prefix: str, n: int) -> pd.Series:
    return pd.Series([f"{prefix}-{i}\x1f{i % 7}" for i in range(n)])


class TestBloomFilter:
    def test_no_false_negatives(self):
        b = BloomFilter(1 << 16, 4)
        keys = _keys("conv", 2000)
        b.add(keys)
        assert b.might_contain(keys).all()

    def test_low_false_positive_rate(self):
        b = BloomFilter(1 << 20, 4)
        b.add(_keys("conv", 5000))
        fp = b.might_contain(_keys("other", 5000)).mean()
        assert fp < 0.01

    def test_roundtrip_and_union(self):
        a = BloomFilter(1 << 12, 3)
        a.add(_keys("a", 100))
        b = BloomFilter(1 << 12, 3)
        b.add(_keys("b", 100))
        u = a.union(b)
        assert u.might_contain(_keys("a", 100)).all()
        assert u.might_contain(_keys("b", 100)).all()
        rt = BloomFilter.from_bytes(u.to_bytes(), 1 << 12, 3)
        assert (rt.bits == u.bits).all()

    def test_empty(self):
        b = BloomFilter(1 << 10, 2)
        assert b.might_contain(_keys("x", 50)).sum() == 0
        assert len(b.might_contain(pd.Series([], dtype=str))) == 0


class TestDistributedBuild:
    def test_build_matches_local(self, spark):
        df = spark.range(1000).select(
            F.concat(F.lit("conv-"), (F.col("id") % 100).cast("string")).alias("conv_id"),
            (F.col("id") % 40).cast("int").alias("turn_idx"),
        )
        bloom = build_bloom(df, KEY_COLS, 1 << 16, 4)
        # local reference: same JVM hash pair, bitset built in one process
        hp = hash_frame(df, KEY_COLS).toPandas()
        local = BloomFilter(1 << 16, 4)
        local.add_hashes(hp["h1"].to_numpy(), hp["h2"].to_numpy())
        assert (bloom.bits == local.bits).all()

    def test_any_possibly_seen(self, spark):
        df = spark.range(500).select(
            F.concat(F.lit("c-"), F.col("id").cast("string")).alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
        )
        bloom = build_bloom(df, KEY_COLS, 1 << 20, 4)
        assert any_possibly_seen(df, bloom, KEY_COLS)
        new = spark.range(500).select(
            F.concat(F.lit("zzz-"), F.col("id").cast("string")).alias("conv_id"),
            F.lit(9).cast("int").alias("turn_idx"),
        )
        assert not any_possibly_seen(new, bloom, KEY_COLS)


class TestMergeFastPath:
    def test_first_batch_appends_then_merges(self, spark, tmp_path):
        feed = change_feed_df(
            spark, n_events=6000, n_convs=200, max_turns=8, seed=3, n_batches=2
        )
        fd = str(tmp_path / "feed")
        write_feed(feed, fd, n_batches=2)
        table = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=8)
        stats = replay_feed(spark, table, fd)
        # batch 1: empty table → append fast path; batch 2: overlapping keys
        # → full merge
        assert stats[0].fast_path_append
        assert not stats[1].fast_path_append
        # final state still equals the independent oracle
        exp = expected_final_state(fd)
        got = (
            table.read(spark)
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert len(exp) == len(got)
        assert (exp["text"].values == got["text"].values).all()

    def test_disjoint_keyspace_takes_fast_path(self, spark, tmp_path):
        feed = change_feed_df(
            spark, n_events=4000, n_convs=150, max_turns=8, seed=5, n_batches=1
        )
        fd1 = str(tmp_path / "feed1")
        write_feed(feed, fd1, n_batches=1)
        table = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=8)
        replay_feed(spark, table, fd1)

        # same generator, keys moved to a disjoint keyspace, NEW segment name
        nf = (
            change_feed_df(
                spark, n_events=2000, n_convs=80, max_turns=8, seed=8, n_batches=1
            )
            .withColumn("conv_id", F.concat(F.lit("NEW-"), F.col("conv_id")))
            .filter(F.col("op") != "D")
            .withColumn("batch", F.lit(0))
        )
        fd2 = str(tmp_path / "feed2")
        write_feed(nf, fd2, n_batches=1)
        os.rename(os.path.join(fd2, "batch=00000"), os.path.join(fd2, "seg-new-00000"))
        s2 = replay_feed(spark, table, fd2)
        assert len(s2) == 1 and s2[0].fast_path_append

        # replaying the SAME keys again (new segment) must NOT fast-path
        nf2 = nf.withColumn("op_seq", F.col("op_seq") + 1_000_000)
        fd3 = str(tmp_path / "feed3")
        write_feed(nf2, fd3, n_batches=1)
        os.rename(os.path.join(fd3, "batch=00000"), os.path.join(fd3, "seg-new-00001"))
        s3 = replay_feed(spark, table, fd3)
        assert len(s3) == 1 and not s3[0].fast_path_append

    def test_segment_identity_is_name_plus_content(self, spark, tmp_path):
        """Segment idempotence keys on (name, content fingerprint), not name
        alone. Replaying the SAME directory skips; a DIFFERENT directory
        that reuses a committed segment name is refused — a physical
        rewrite has fresh part filenames, so content identity can't be
        proven, and silently skipping would drop data on a genuine name
        collision (segments are immutable by contract, like the
        reference's archives — a real binlog never reuses a segment
        number)."""
        import pytest

        from etl_spark.cdc.apply import SegmentReuseError

        feed = change_feed_df(
            spark, n_events=1000, n_convs=50, max_turns=8, seed=4, n_batches=1
        )
        fd1 = str(tmp_path / "f1")
        write_feed(feed, fd1, n_batches=1)
        table = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=8)
        replay_feed(spark, table, fd1)
        v = table.manifest().version
        # same directory → provably same content → skip
        s = replay_feed(spark, table, fd1)
        assert len(s) == 1 and s[0].skipped_idempotent
        # same NAME, physically rewritten elsewhere → refuse, don't drop
        fd2 = str(tmp_path / "f2")
        write_feed(feed, fd2, n_batches=1)  # same segment name batch=00000
        with pytest.raises(SegmentReuseError):
            replay_feed(spark, table, fd2)
        assert table.manifest().version == v
