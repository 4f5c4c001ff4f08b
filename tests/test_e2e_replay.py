"""Golden end-to-end: seeded change feed → engine replay → final table state
equals the independent DuckDB oracle (per-turn text equality under stable
(conv_id, turn_idx) ordering — BASELINE.json input_hint invariant).

Mirrors the reference's whole-archive e2e with counted outputs
(/root/reference/worker/worker_test.go:109-157) and count-reconciliation
validation (/root/reference/legacy/README.md:67-96)."""

import os

import pandas as pd
from pyspark.sql import functions as F

from etl_spark.cdc.apply import replay_feed
from etl_spark.cdc.gen import change_feed_df, write_feed
from etl_spark.cdc.oracle import expected_final_state, table_as_pandas
from etl_spark.lake.table import LakeTable
from etl_spark.schema import TRANSCRIPT_SCHEMA

GEN = dict(
    n_events=5000, n_convs=120, max_turns=10, seed=7,
    skew=2.0, delete_ratio=0.08, dup_ratio=0.06, ooo_ratio=0.15, n_batches=6,
)


def _assert_state_equal(got: pd.DataFrame, want: pd.DataFrame):
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    for col in want.columns:
        g, w = got[col], want[col]
        if col == "ts":
            g = pd.to_datetime(g).dt.tz_localize(None)
            w = pd.to_datetime(w).dt.tz_localize(None)
        mism = (g.fillna("§") != w.fillna("§")) if g.dtype == object else (g != w)
        mism = mism & ~(g.isna() & w.isna())
        assert not mism.any(), f"column {col}: {int(mism.sum())} mismatches\n" \
            f"{pd.concat([got[mism], want[mism]], axis=1).head()}"


def test_replay_matches_oracle(spark, tmpdir_path):
    feed_dir = os.path.join(tmpdir_path, "feed")
    feed = change_feed_df(spark, **GEN)
    write_feed(feed, feed_dir)

    t = LakeTable.create(os.path.join(tmpdir_path, "lake"), TRANSCRIPT_SCHEMA, n_buckets=8)
    stats = replay_feed(spark, t, feed_dir)
    assert len(stats) == GEN["n_batches"]
    # metrics invariant holds on every batch
    for s in stats:
        assert (s.failed + s.dup_dropped + s.inserted + s.updated + s.deleted
                + s.stale_skipped) == s.events_in, s

    got = table_as_pandas(t.read(spark))
    want = expected_final_state(feed_dir)
    _assert_state_equal(got, want)


def test_replay_is_deterministic_and_resumable(spark, tmpdir_path):
    """Replaying the same feed into the same table twice (simulating a resume
    from the start) no-ops every batch and leaves the state identical."""
    feed_dir = os.path.join(tmpdir_path, "feed")
    write_feed(change_feed_df(spark, **GEN), feed_dir)
    t = LakeTable.create(os.path.join(tmpdir_path, "lake"), TRANSCRIPT_SCHEMA, n_buckets=8)
    replay_feed(spark, t, feed_dir)
    v = t.manifest().version
    stats2 = replay_feed(spark, t, feed_dir)
    assert all(s.skipped_idempotent for s in stats2)
    assert t.manifest().version == v
    got = table_as_pandas(t.read(spark))
    want = expected_final_state(feed_dir)
    _assert_state_equal(got, want)


def test_partial_replay_then_resume(spark, tmpdir_path):
    """FIXTURES §F5 kill/resume, batch flavor: apply first 3 segments, then
    resume over the WHOLE feed — already-applied segments no-op, final state
    matches the oracle, commit_log has exactly one row per segment."""
    feed_dir = os.path.join(tmpdir_path, "feed")
    write_feed(change_feed_df(spark, **GEN), feed_dir)
    t = LakeTable.create(os.path.join(tmpdir_path, "lake"), TRANSCRIPT_SCHEMA, n_buckets=8)

    # apply only the first half manually
    import shutil
    half = os.path.join(tmpdir_path, "half")
    os.makedirs(half)
    names = sorted(os.listdir(feed_dir))
    for n in names[:3]:
        shutil.copytree(os.path.join(feed_dir, n), os.path.join(half, n))
    replay_feed(spark, t, half)
    n_before = len(t.commit_log())
    assert n_before == 3

    stats = replay_feed(spark, t, feed_dir)
    assert sum(1 for s in stats if s.skipped_idempotent) == 3
    assert len(t.commit_log()) == GEN["n_batches"]
    _assert_state_equal(table_as_pandas(t.read(spark)), expected_final_state(feed_dir))
