"""Changelog read (LakeTable.changes_between): snapshot-diff CDC surface.

Covers: insert / update_postimage / delete classification, stale updates
emitting nothing, same-version diff being empty, and tombstone →
re-insert across versions classifying as update_postimage.
"""

import datetime as dt

from etl_spark.cdc.apply import apply_batch
from etl_spark.lake.table import LakeTable
from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def test_changes_between_classification(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "one", None, "f1"),
        ("I", _ts("2024-01-01T00:00:02"), 2, "c2", 0, "user", "two", None, "f1"),
        ("I", _ts("2024-01-01T00:00:03"), 3, "c3", 0, "user", "three", None, "f1"),
    ]), "b1")
    v1 = t.versions()[-1]

    apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:01:00"), 10, "c1", 0, "user", "one v2", None, "f2"),
        ("D", _ts("2024-01-01T00:01:01"), 11, "c2", 0, None, None, None, "f2"),
        ("I", _ts("2024-01-01T00:01:02"), 12, "c4", 0, "tool", "four", "t-1", "f2"),
        # stale update for c3 (older ts than its current row) -> no change
        ("U", _ts("2024-01-01T00:00:00"), 0, "c3", 0, "user", "stale", None, "f2"),
    ]), "b2")

    ch = {
        (r["conv_id"], r["turn_idx"]): r
        for r in t.changes_between(spark, v_from=v1).collect()
    }
    assert set(ch) == {("c1", 0), ("c2", 0), ("c4", 0)}
    assert ch[("c1", 0)]["_change_type"] == "update_postimage"
    assert ch[("c1", 0)]["text"] == "one v2"
    assert ch[("c2", 0)]["_change_type"] == "delete"
    assert ch[("c2", 0)]["text"] is None and ch[("c2", 0)]["ts"] is None
    assert ch[("c4", 0)]["_change_type"] == "insert"
    assert ch[("c4", 0)]["tool"] == "t-1"

    # same-version diff is empty
    v2 = t.versions()[-1]
    assert t.changes_between(spark, v_from=v2, v_to=v2).count() == 0


def test_changes_between_tombstone_then_reinsert(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "one", None, "f1"),
    ]), "b1")
    v1 = t.versions()[-1]
    apply_batch(spark, t, _mk(spark, [
        ("D", _ts("2024-01-01T00:01:00"), 2, "c1", 0, None, None, None, "f2"),
    ]), "b2")
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:02:00"), 3, "c1", 0, "user", "one again", None, "f3"),
    ]), "b3")
    rows = t.changes_between(spark, v_from=v1).collect()
    assert len(rows) == 1
    assert rows[0]["_change_type"] == "update_postimage"
    assert rows[0]["text"] == "one again"
    # and diffing from the tombstoned snapshot classifies as insert
    v2 = sorted(t.versions())[-2]
    rows2 = t.changes_between(spark, v_from=v2).collect()
    assert len(rows2) == 1 and rows2[0]["_change_type"] == "insert"


def test_changes_between_prunes_untouched_buckets(spark, tmpdir_path):
    """Manifest-level pruning: buckets whose file lists are identical in
    both versions are not scanned at all (files are immutable)."""
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=8)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), i + 1, f"c{i}", 0, "user", f"t{i}", None, "f1")
        for i in range(40)
    ]), "b1")
    v1 = t.versions()[-1]
    # touch exactly one conversation -> exactly one bucket
    apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:01:00"), 100, "c7", 0, "user", "t7 v2", None, "f2"),
    ]), "b2")
    df = t.changes_between(spark, v_from=v1)
    rows = df.collect()
    assert [(r["conv_id"], r["_change_type"], r["text"]) for r in rows] == [
        ("c7", "update_postimage", "t7 v2")
    ]
    scanned = df.inputFiles()
    assert scanned, "expected at least the touched bucket to be scanned"
    buckets_scanned = {p.split("__bucket=")[1].split("/")[0] for p in scanned}
    assert len(buckets_scanned) == 1, buckets_scanned


def test_changelog_skips_key_neutral_maintenance(spark, tmpdir_path):
    """Compaction/z-order/rebucket snapshots are key-neutral: an interval
    holding only maintenance diffs to NOTHING, and an interval mixing
    appends with maintenance equals the same interval without it."""
    import datetime as dt

    from etl_spark.cdc.apply import apply_batch
    from etl_spark.lake.table import LakeTable
    from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA

    def ts(s):
        return dt.datetime.fromisoformat(s)

    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, spark.createDataFrame([
        ("I", ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "a", None, "f"),
        ("I", ts("2024-01-01T00:00:02"), 2, "c2", 0, "user", "b", None, "f"),
    ], CHANGE_SCHEMA), "b1", mode="mor")
    v1 = t.current_version()
    assert t.compact_small_files(spark, 0) > 0  # force a rewrite
    v2 = t.current_version()
    assert t.manifest(v2).key_neutral
    # maintenance-only interval: nothing to report
    assert t.changes_between(spark, v1, v2).count() == 0
    # mixed interval: append then compact == just the append
    apply_batch(spark, t, spark.createDataFrame([
        ("U", ts("2024-01-01T00:01:00"), 3, "c1", 0, "user", "a2", None, "f"),
    ], CHANGE_SCHEMA), "b2", mode="mor")
    t.compact_small_files(spark, 0)
    v3 = t.current_version()
    rows = t.changes_between(spark, v1, v3).collect()
    assert len(rows) == 1 and rows[0]["_change_type"] == "update_postimage"
    assert rows[0]["text"] == "a2"
    # pre-image rides through the shrunk interval too
    pr = t.changes_between(spark, v1, v3, emit_pre=True).collect()[0]
    assert pr["_pre"]["text"] == "a"
