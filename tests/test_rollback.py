"""Rollback (lake/table.py) and catalog-level consistent snapshots
(lake/catalog.py)."""

import os

import pytest

from etl_spark.cdc import change_feed_df, write_feed, replay_feed
from etl_spark.lake import LakeCatalog, LakeTable, TableNotFoundError
from etl_spark.schema import TRANSCRIPT_SCHEMA


def _feed(spark, tmpdir_path, n_batches=3, seed=5):
    feed = os.path.join(tmpdir_path, "feed")
    write_feed(
        change_feed_df(
            spark, n_events=6000, n_convs=100, max_turns=8,
            seed=seed, n_batches=n_batches,
        ),
        feed,
    )
    return feed


def _state(spark, t, version=None):
    rows = t.read(spark, version=version).select(
        "conv_id", "turn_idx", "text"
    ).collect()
    return {tuple(r) for r in rows}


def test_rollback_reverts_content_and_ledger(spark, tmpdir_path):
    feed = _feed(spark, tmpdir_path)
    t = LakeTable.create(os.path.join(tmpdir_path, "lake"), TRANSCRIPT_SCHEMA, 8)
    replay_feed(spark, t, feed)
    v_full = t.current_version()
    full_state = _state(spark, t)
    versions = t.versions()
    v_mid = versions[-2]  # snapshot after the second-to-last batch
    mid_state = _state(spark, t, version=v_mid)
    assert mid_state != full_state

    m = t.rollback(v_mid)
    # linear history: rollback is a NEW version on top
    assert m.version == v_full + 1
    assert t.current_version() == v_full + 1
    assert _state(spark, t) == mid_state
    # time travel to the undone version still works
    assert _state(spark, t, version=v_full) == full_state

    # the idempotence ledger reverted with the content: re-replaying the
    # feed re-applies exactly the undone batches and converges back
    stats = replay_feed(spark, t, feed)
    reapplied = [s for s in stats if not s.skipped_idempotent]
    assert len(reapplied) >= 1
    assert _state(spark, t) == full_state


def test_rollback_is_undoable_and_validates(spark, tmpdir_path):
    feed = _feed(spark, tmpdir_path, n_batches=2, seed=9)
    t = LakeTable.create(os.path.join(tmpdir_path, "lake"), TRANSCRIPT_SCHEMA, 8)
    replay_feed(spark, t, feed)
    v_full = t.current_version()
    full_state = _state(spark, t)
    v_first = t.versions()[-2]

    t.rollback(v_first)
    t.rollback(v_full)  # undo the undo
    assert _state(spark, t) == full_state

    with pytest.raises(ValueError):
        t.rollback(99999)
    # no-op rollback returns the current manifest unchanged
    cur = t.current_version()
    assert t.rollback(cur).version == cur


def test_catalog_snapshot_pins_cross_table_state(spark, tmpdir_path):
    cat = LakeCatalog(os.path.join(tmpdir_path, "cat"))
    feed_a = _feed(spark, tmpdir_path, n_batches=2, seed=1)
    ta = cat.create_table("raw.a", TRANSCRIPT_SCHEMA, n_buckets=4)
    tb = cat.create_table("raw.b", TRANSCRIPT_SCHEMA, n_buckets=4)
    replay_feed(spark, ta, feed_a)
    replay_feed(spark, tb, feed_a)

    snap = cat.snapshot("raw")
    state_a = _state(spark, ta)

    # advance table a past the snapshot (fresh segment NAME — segment
    # names are immutable by contract, a binlog never reuses a number)
    feed_b = os.path.join(tmpdir_path, "feed2")
    write_feed(
        change_feed_df(spark, n_events=3000, n_convs=100, max_turns=8,
                       seed=77, n_batches=1),
        feed_b,
    )
    os.rename(
        os.path.join(feed_b, "batch=00000"), os.path.join(feed_b, "batch=00100")
    )
    replay_feed(spark, ta, feed_b)
    assert _state(spark, ta) != state_a

    # the pinned snapshot still reads the old joint state
    got = {tuple(r) for r in cat.read_at(spark, "raw.a", snap)
           .select("conv_id", "turn_idx", "text").collect()}
    assert got == state_a
    with pytest.raises(TableNotFoundError):
        cat.read_at(spark, "raw.nope", snap)


def test_expire_after_rollback_keeps_referenced_files(spark, tmpdir_path):
    """A rollback manifest references files first written by an OLD
    version; expiring the old versions must keep those files live (they
    are referenced by a retained snapshot)."""
    feed = _feed(spark, tmpdir_path, n_batches=3, seed=13)
    t = LakeTable.create(os.path.join(tmpdir_path, "lake"), TRANSCRIPT_SCHEMA, 8)
    replay_feed(spark, t, feed)
    v_first = t.versions()[0]
    first_state = _state(spark, t, version=v_first)

    t.rollback(v_first)
    t.expire_snapshots(keep_last=1)  # only the rollback copy survives
    assert _state(spark, t) == first_state
    # the undone versions are gone from history
    assert t.versions() == [t.current_version()]
