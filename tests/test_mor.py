"""Merge-on-read mode: delta appends, read-time LWW resolution, delta
compaction — per-batch cost proportional to batch size (the streaming-CDC
strategy; Iceberg's MOR analog). Final state must be IDENTICAL to cow mode
and to the independent oracle."""

import datetime as dt

import pandas as pd

from etl_spark.cdc.apply import apply_batch, replay_feed
from etl_spark.cdc.gen import change_feed_df, write_feed
from etl_spark.cdc.oracle import expected_final_state
from etl_spark.lake.table import LakeTable
from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def test_mor_lww_semantics(spark, tmpdir_path):
    """Upsert + stale event + delete tombstone all resolve correctly at
    read time without any join having run."""
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "v1", None, "f1"),
        ("I", _ts("2024-01-01T00:00:01"), 2, "c2", 0, "user", "other", None, "f1"),
    ]), "b1", mode="mor")
    apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:00:05"), 3, "c1", 0, "user", "v2", None, "f2"),
        ("U", _ts("2024-01-01T00:00:03"), 4, "c2", 0, "user", "stale-skipped", None, "f2"),
        ("U", _ts("2024-01-01T00:00:09"), 5, "c2", 0, "user", "final", None, "f2"),
    ]), "b2", mode="mor")
    # a late stale update must lose to the existing ts=5 row
    apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:00:02"), 6, "c1", 0, "user", "late-stale", None, "f3"),
    ]), "b3", mode="mor")
    # delete c2 with the highest ts
    apply_batch(spark, t, _mk(spark, [
        ("D", _ts("2024-01-01T00:01:00"), 7, "c2", 0, None, None, None, "f4"),
    ]), "b4", mode="mor")
    assert t.manifest().needs_reduce
    rows = {r["conv_id"]: r["text"] for r in t.read(spark).collect()}
    assert rows == {"c1": "v2"}


def test_mor_final_state_equals_cow_and_oracle(spark, tmpdir_path):
    feed = change_feed_df(
        spark, n_events=8000, n_convs=150, max_turns=8, seed=11,
        dup_ratio=0.08, ooo_ratio=0.15, n_batches=3,
    )
    fd = tmpdir_path + "/feed"
    write_feed(feed, fd, n_batches=3)

    t_cow = LakeTable.create(tmpdir_path + "/cow", TRANSCRIPT_SCHEMA, n_buckets=8)
    replay_feed(spark, t_cow, fd, mode="cow")
    t_mor = LakeTable.create(tmpdir_path + "/mor", TRANSCRIPT_SCHEMA, n_buckets=8)
    stats = replay_feed(spark, t_mor, fd, mode="mor")

    # batch 1 is a Bloom-proven pure insert (no reduction debt); later
    # overlapping batches appended deltas
    assert stats[0].fast_path_append
    assert t_mor.manifest().needs_reduce

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a = t_cow.read(spark).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = t_mor.read(spark).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[cols], b[cols])

    exp = expected_final_state(fd)
    assert len(exp) == len(b)
    assert (exp["text"].values == b["text"].values).all()

    # metrics invariant holds per batch in mor mode too
    for s in stats:
        assert s.events_in == s.failed + s.late_dropped + s.dup_dropped + s.applied()


def test_resolve_deltas_collapses_and_clears(spark, tmpdir_path):
    feed = change_feed_df(
        spark, n_events=4000, n_convs=100, max_turns=8, seed=12, n_batches=2
    )
    fd = tmpdir_path + "/feed"
    write_feed(feed, fd, n_batches=2)
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    replay_feed(spark, t, fd, mode="mor")
    assert t.manifest().needs_reduce
    before = t.read(spark).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    raw_before = t.read_storage(spark, reduced=False).count()
    n = t.resolve_deltas(spark)
    assert n > 0
    assert not t.manifest().needs_reduce
    raw_after = t.read_storage(spark, reduced=False).count()
    assert raw_after < raw_before  # superseded deltas physically gone
    after = t.read(spark).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_cow_after_mor_uses_reduced_target(spark, tmpdir_path):
    """Mode mixing: a cow merge on a delta-bearing table must join against
    the REDUCED target (raw deltas would multi-match the join)."""
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=2)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "v1", None, "f1")]),
        "b1", mode="mor")
    apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:00:02"), 2, "c1", 0, "user", "v2", None, "f2")]),
        "b2", mode="mor")
    s = apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:00:03"), 3, "c1", 0, "user", "v3", None, "f3")]),
        "b3", mode="cow")
    assert s.updated == 1
    rows = t.read(spark).collect()
    assert len(rows) == 1 and rows[0]["text"] == "v3"
