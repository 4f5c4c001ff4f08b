"""Lake table + MERGE unit semantics: upsert, LWW, tombstones, stale events,
idempotent re-apply, bucket pruning, atomic snapshots."""

import datetime as dt

from pyspark.sql import functions as F

from etl_spark.cdc.apply import apply_batch
from etl_spark.lake.table import LakeTable
from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _table(tmpdir_path, n_buckets=4):
    return LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=n_buckets)


def test_insert_then_update_then_read(spark, tmpdir_path):
    t = _table(tmpdir_path)
    b1 = _mk(spark, [("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "hello", None, "f1")])
    s1 = apply_batch(spark, t, b1, "b1")
    assert s1.inserted == 1 and s1.events_in == 1
    b2 = _mk(spark, [("U", _ts("2024-01-01T00:00:02"), 2, "c1", 0, "user", "hello v2", None, "f2")])
    s2 = apply_batch(spark, t, b2, "b2")
    assert s2.updated == 1
    rows = t.read(spark).collect()
    assert len(rows) == 1 and rows[0]["text"] == "hello v2"


def test_stale_cross_batch_event_skipped(spark, tmpdir_path):
    t = _table(tmpdir_path)
    apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:10:00"), 5, "c1", 0, "user", "newer", None, "f1")]), "b1")
    s = apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:05:00"), 9, "c1", 0, "user", "older-late", None, "f2")]), "b2")
    assert s.stale_skipped == 1 and s.updated == 0
    assert t.read(spark).collect()[0]["text"] == "newer"


def test_delete_tombstone_blocks_stale_insert_but_not_reinsert(spark, tmpdir_path):
    """SURVEY §7 'genuinely hard' case: tombstone must win over an
    earlier-ts insert arriving later, but lose to a later-ts re-insert."""
    t = _table(tmpdir_path)
    apply_batch(spark, t, _mk(spark, [
        ("D", _ts("2024-01-01T01:00:00"), 10, "c1", 0, None, None, None, "f1")]), "b1")
    assert t.read(spark).count() == 0
    # stale insert (ts before the delete) must NOT resurrect
    s = apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:30:00"), 11, "c1", 0, "user", "zombie", None, "f2")]), "b2")
    assert s.stale_skipped == 1
    assert t.read(spark).count() == 0
    # genuine re-insert (later ts) must win
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T02:00:00"), 12, "c1", 0, "user", "reborn", None, "f3")]), "b3")
    rows = t.read(spark).collect()
    assert len(rows) == 1 and rows[0]["text"] == "reborn"


def test_idempotent_reapply_is_noop(spark, tmpdir_path):
    """FIXTURES §F5 duplicate-batch: same batch_id applied twice — second is
    a no-op, final state and commit log unchanged."""
    t = _table(tmpdir_path)
    b = _mk(spark, [("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "once", None, "f1")])
    apply_batch(spark, t, b, "dup-batch")
    v1 = t.manifest().version
    s2 = apply_batch(spark, t, b, "dup-batch")
    assert s2.skipped_idempotent
    assert t.manifest().version == v1
    assert t.read(spark).count() == 1
    assert list(t.commit_log().keys()).count("dup-batch") == 1


def test_merge_only_rewrites_touched_buckets(spark, tmpdir_path):
    t = _table(tmpdir_path, n_buckets=8)
    rows1 = [("I", _ts("2024-01-01T00:00:01"), i, f"c{i}", 0, "user", f"t{i}", None, "f1")
             for i in range(40)]
    apply_batch(spark, t, _mk(spark, rows1), "b1")
    m1 = t.manifest()
    # second batch touches exactly one conversation → one bucket
    s = apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:01:00"), 100, "c3", 0, "user", "t3v2", None, "f2")]), "b2")
    assert len(s.touched_buckets) == 1
    m2 = t.manifest()
    for b, files in m1.files.items():
        if int(b) not in s.touched_buckets:
            assert m2.files[b] == files, f"untouched bucket {b} was rewritten"
    assert t.read(spark).count() == 40


def test_metrics_invariant(spark, tmpdir_path):
    """events_in == failed + dup_dropped + inserted + updated + deleted +
    stale_skipped — the engine's RowStats invariant
    (cf. /root/reference/etl/etl.go:20-35)."""
    t = _table(tmpdir_path)
    rows = [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "a", None, "f"),
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "a", None, "f"),  # dup
        ("U", _ts("2024-01-01T00:00:02"), 2, "c1", 0, "user", "b", None, "f"),  # same key
        ("I", _ts("2024-01-01T00:00:03"), 3, "c2", 1, "user", "c", None, "f"),
        ("D", _ts("2024-01-01T00:00:04"), 4, "c3", 2, None, None, None, "f"),
        ("X", _ts("2024-01-01T00:00:05"), 5, "c4", 3, "user", "bad-op", None, "f"),  # failed
    ]
    s = apply_batch(spark, t, _mk(spark, rows), "b1", fail_threshold=0.5)
    assert s.events_in == 6
    assert s.failed == 1
    assert (s.failed + s.dup_dropped + s.inserted + s.updated + s.deleted
            + s.stale_skipped) == s.events_in
    m = t.metrics_df(spark).filter(F.col("batch_id") == "b1").collect()[0]
    assert m["events_in"] == 6 and m["failed"] == 1


def test_lineage_rows_per_bucket(spark, tmpdir_path):
    t = _table(tmpdir_path, n_buckets=4)
    rows = [("I", _ts("2024-01-01T00:00:01"), i, f"c{i}", 0, "user", "x", None, "seg-1")
            for i in range(20)]
    apply_batch(spark, t, _mk(spark, rows), "b1", source_files=["seg-1"])
    lin = t.lineage_df(spark)
    got = lin.agg(F.sum("rows_written")).collect()[0][0]
    assert got == 20
    assert lin.filter(F.col("batch_id") == "b1").count() >= 1


def test_failfast_over_error_budget(spark, tmpdir_path):
    t = _table(tmpdir_path)
    rows = [("X", _ts("2024-01-01T00:00:01"), i, f"c{i}", 0, "user", "bad", None, "f")
            for i in range(5)]
    import pytest
    from etl_spark.cdc.apply import BatchFailedError
    with pytest.raises(BatchFailedError):
        apply_batch(spark, t, _mk(spark, rows), "b1")
    assert t.read(spark).count() == 0
    assert "b1" not in t.commit_log()


def test_expire_tombstones(spark, tmpdir_path):
    t = _table(tmpdir_path)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "keep", None, "f"),
        ("D", _ts("2024-01-01T00:00:02"), 2, "c2", 0, None, None, None, "f"),
    ]), "b1")
    assert t.read_storage(spark).count() == 2
    n = t.expire_tombstones(spark, "2024-06-01T00:00:00")
    assert n == 1
    assert t.read_storage(spark).count() == 1
    assert t.read(spark).count() == 1


def test_concurrent_commit_conflict_detected(spark, tmpdir_path):
    """Optimistic concurrency: a second writer committing the same snapshot
    version must fail with CommitConflictError instead of clobbering the
    first writer's snapshot (streaming driver racing a maintenance job)."""
    import dataclasses

    import pytest

    from etl_spark.lake.table import CommitConflictError

    t = _table(tmpdir_path)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "one", None, "f1"),
    ]), "b1")
    # simulate the race: a stale writer tries to re-commit the version that
    # the first writer just created
    stale = dataclasses.replace(t.manifest())
    with pytest.raises(CommitConflictError):
        t._write_manifest(stale)
    # the winning snapshot is untouched
    assert t.read(spark).count() == 1
    assert t.versions()[-1] == stale.version


def test_stale_base_commit_conflict(spark, tmpdir_path):
    """Read-compute-commit OCC: a writer whose computation was based on an
    older snapshot must get CommitConflictError, not silently clobber the
    buckets another writer committed in between."""
    import pytest

    from etl_spark.lake.table import CommitConflictError

    t = _table(tmpdir_path)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "one", None, "f1"),
    ]), "b1")
    base = t.manifest().version  # this writer's computation reads v1
    apply_batch(spark, t, _mk(spark, [  # another writer advances to v2
        ("I", _ts("2024-01-01T00:00:02"), 2, "c2", 0, "user", "two", None, "f2"),
    ]), "b2")
    with pytest.raises(CommitConflictError, match="advanced"):
        t.commit_version({}, [], None, None, expected_version=base)
    assert t.read(spark).count() == 2


def test_crashed_commit_orphan_recovery(spark, tmpdir_path):
    """A manifest created without the pointer swap (writer crashed mid-
    commit) is invisible to versions()/time-travel and is removed by
    expire_snapshots, unwedging future commits."""
    import json
    import os

    from etl_spark.lake.table import MANIFEST_DIR

    t = _table(tmpdir_path)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "one", None, "f1"),
    ]), "b1")
    cur = t.manifest().version
    # simulate the crash: orphan manifest for cur+1, pointer NOT swapped
    orphan = dict(t.manifest().__dict__, version=cur + 1, parent=cur)
    with open(os.path.join(t.path, MANIFEST_DIR, f"v{cur + 1:08d}.json"), "w") as f:
        f.write(json.dumps(orphan))
    assert t.versions()[-1] == cur  # orphan not listed
    t.expire_snapshots(keep_last=10)  # removes the orphan
    # the next commit takes cur+1 cleanly
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:02"), 2, "c2", 0, "user", "two", None, "f2"),
    ]), "b2")
    assert t.manifest().version == cur + 1
    assert t.read(spark).count() == 2
