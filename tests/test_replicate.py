"""Changelog-driven replica sync (CDC-out).

A replica follows a source table via bootstrap (snapshot copy preserving
LWW metadata) then changelog-incremental batches; sync state lives in the
replica's own commit ledger (crash-atomic with the data)."""

import datetime as dt

import pytest

from etl_spark.cdc import apply_batch
from etl_spark.lake.replicate import (
    ReplicaHorizonError,
    sync_replica,
    synced_version,
)
from etl_spark.lake.table import LakeTable
from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA


def _ev(op, ts_s, seq, conv, turn, text):
    return (op, dt.datetime(2024, 1, 1, 0, 0, ts_s), seq, conv, turn,
            "user", text, None, "f")


def _apply(spark, t, rows, bid):
    return apply_batch(spark, t, spark.createDataFrame(rows, CHANGE_SCHEMA), bid)


def _state(spark, t):
    return {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["op_seq"])
        for r in t.read(spark, include_system=True)
        .select("conv_id", "turn_idx", "text", "op_seq").collect()
    }


@pytest.fixture()
def pair(tmpdir_path):
    src = LakeTable.create(tmpdir_path + "/src", TRANSCRIPT_SCHEMA, n_buckets=4)
    dst = LakeTable.create(tmpdir_path + "/dst", TRANSCRIPT_SCHEMA, n_buckets=8)
    return src, dst


def test_bootstrap_then_incremental_converges(spark, pair):
    src, dst = pair
    _apply(spark, src, [_ev("I", 1, 1, "c1", 0, "a"),
                        _ev("I", 1, 2, "c1", 1, "b"),
                        _ev("I", 1, 3, "c2", 0, "c")], "b0")
    s = sync_replica(spark, src, dst)
    assert not s.skipped_idempotent
    # bootstrap preserves values AND the winning op_seq per key
    assert _state(spark, dst) == _state(spark, src)
    assert synced_version(dst, src) == src.current_version()

    # updates, a delete of a bootstrapped key, and a brand-new conv
    _apply(spark, src, [_ev("U", 2, 4, "c1", 0, "a2"),
                        _ev("D", 2, 5, "c1", 1, None),
                        _ev("I", 2, 6, "c9", 0, "new")], "b1")
    sync_replica(spark, src, dst)
    assert _state(spark, dst) == _state(spark, src)
    assert ("c1", 1) not in _state(spark, dst)  # delete propagated


def test_sync_is_idempotent(spark, pair):
    src, dst = pair
    _apply(spark, src, [_ev("I", 1, 1, "c1", 0, "a")], "b0")
    sync_replica(spark, src, dst)
    v = dst.current_version()
    s = sync_replica(spark, src, dst)
    assert s.skipped_idempotent and dst.current_version() == v


def test_stale_source_events_lose_at_replica(spark, pair):
    """A replayed diff can't regress the replica: LWW metadata rides the
    feed, so re-applying an older window after a newer one is a no-op on
    values (exercised here via two out-of-order syncs from two sources is
    impossible — instead verify a second sync after new src commits only
    moves forward)."""
    src, dst = pair
    _apply(spark, src, [_ev("I", 1, 1, "c1", 0, "v1")], "b0")
    sync_replica(spark, src, dst)
    _apply(spark, src, [_ev("U", 5, 9, "c1", 0, "v2")], "b1")
    _apply(spark, src, [_ev("U", 3, 4, "c1", 0, "stale")], "b2")  # loses at src
    sync_replica(spark, src, dst)
    assert _state(spark, dst)[("c1", 0)] == ("v2", 9)


def test_horizon_error_when_tombstone_expired(spark, pair):
    src, dst = pair
    _apply(spark, src, [_ev("I", 1, 1, "c1", 0, "a"),
                        _ev("I", 1, 2, "c2", 0, "b")], "b0")
    sync_replica(spark, src, dst)
    _apply(spark, src, [_ev("D", 2, 3, "c1", 0, None)], "b1")
    # source expires the tombstone BEFORE the replica saw the delete
    n = src.expire_tombstones(spark, "2024-06-01T00:00:00")
    assert n >= 1
    with pytest.raises(ReplicaHorizonError):
        sync_replica(spark, src, dst)
    # replica untouched by the failed sync
    assert ("c1", 0) in _state(spark, dst)


def test_schema_evolution_rides_the_sync(spark, pair):
    from pyspark.sql import types as T

    src, dst = pair
    _apply(spark, src, [_ev("I", 1, 1, "c1", 0, "a")], "b0")
    sync_replica(spark, src, dst)
    wide = T.StructType(list(CHANGE_SCHEMA.fields)
                        + [T.StructField("lang", T.StringType(), True)])
    batch = spark.createDataFrame(
        [_ev("I", 2, 2, "c3", 0, "hola") + ("es",)], wide)
    apply_batch(spark, src, batch, "b1")
    sync_replica(spark, src, dst)
    assert "lang" in [f.name for f in dst.user_schema().fields]
    row = {r["conv_id"]: r["lang"] for r in dst.read(spark).collect()}
    assert row == {"c1": None, "c3": "es"}


def test_sync_to_pinned_version_then_head(spark, pair):
    src, dst = pair
    _apply(spark, src, [_ev("I", 1, 1, "c1", 0, "v1")], "b0")
    v1 = src.current_version()
    _apply(spark, src, [_ev("U", 2, 2, "c1", 0, "v2"),
                        _ev("I", 2, 3, "c2", 0, "n")], "b1")
    sync_replica(spark, src, dst, to_version=v1)
    assert _state(spark, dst) == {("c1", 0): ("v1", 1)}
    sync_replica(spark, src, dst)  # catch up to head incrementally
    assert _state(spark, dst) == _state(spark, src)
    s = sync_replica(spark, src, dst, to_version=v1)  # backward = no-op
    assert s.skipped_idempotent


def test_streaming_replica_follows_each_trigger(spark, tmpdir_path):
    """run_stream(replica_path=...) keeps a replica in changelog sync
    inside the same foreachBatch; after the drain the replica equals the
    source, and it advanced incrementally (one sync ledger entry per
    trigger that changed the table)."""
    import os

    from etl_spark.cdc import change_feed_df, write_feed
    from etl_spark.cdc.stream import run_stream

    feed_dir = os.path.join(tmpdir_path, "feed")
    write_feed(
        change_feed_df(spark, n_events=3000, n_convs=60, max_turns=8,
                       seed=21, delete_ratio=0.06, dup_ratio=0.05,
                       ooo_ratio=0.12, n_batches=5),
        feed_dir,
    )
    t = LakeTable.create(os.path.join(tmpdir_path, "lake"),
                         TRANSCRIPT_SCHEMA, n_buckets=8)
    rp = os.path.join(tmpdir_path, "replica")
    run_stream(spark, t, feed_dir, os.path.join(tmpdir_path, "ckpt"),
               max_files_per_trigger=8, available_now=True,
               mode="mor", replica_path=rp)
    replica = LakeTable(rp)
    assert _state(spark, replica) == _state(spark, t)
    syncs = [b for b in replica.commit_log() if b.startswith("repl:")]
    assert len(syncs) >= 2  # followed trigger-by-trigger, not one shot


def test_cow_replica_of_mor_source(spark, pair):
    src, dst = pair
    _apply(spark, src, [_ev("I", 1, i, f"c{i}", 0, f"t{i}") for i in range(1, 9)],
           "b0")
    sync_replica(spark, src, dst, mode="cow")
    _apply(spark, src, [_ev("U", 2, 20, "c3", 0, "upd"),
                        _ev("D", 2, 21, "c5", 0, None)], "b1")
    sync_replica(spark, src, dst, mode="cow")
    assert _state(spark, dst) == _state(spark, src)
