"""Bucket-count evolution: rebucket() rewrites the table into a new
bucket(n, conv_id) layout without changing its logical content —
subsequent merges use the new layout, time travel keeps the old one,
and tombstones survive the rewrite (a stale insert after rebucketing
must not resurrect a deleted row).
"""

import datetime as dt

from etl_spark.cdc.apply import apply_batch
from etl_spark.lake.table import LakeTable
from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _snapshot(t, spark, version=None):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.read(spark, version=version).collect()
    )


def test_rebucket_preserves_state_and_history(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, f"c{i}", 0, "user", f"t{i}", None, "f1")
        for i in range(20)
    ] + [
        ("D", _ts("2024-01-01T00:00:02"), 100, "c3", 0, None, None, None, "f1"),
    ]), "b1")
    before = _snapshot(t, spark)
    v_before = t.versions()[-1]

    assert t.rebucket(spark, 16) > 0
    assert t.n_buckets == 16
    assert _snapshot(t, spark) == before
    # time travel to the pre-rebucket snapshot still reads the old layout
    assert _snapshot(t, spark, version=v_before) == before
    # no-op when the count already matches
    assert t.rebucket(spark, 16) == 0

    # merges keep working against the new layout
    apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:01:00"), 200, "c5", 0, "user", "t5 v2", None, "f2"),
        # stale insert for the deleted c3 — tombstone must have survived
        ("I", _ts("2024-01-01T00:00:01"), 2, "c3", 0, "user", "zombie", None, "f2"),
    ]), "b2")
    after = dict(((c, x), txt) for c, x, txt in _snapshot(t, spark))
    assert after[("c5", 0)] == "t5 v2"
    assert ("c3", 0) not in after

    # shrink works too (old bucket ids beyond the new range are cleared)
    assert t.rebucket(spark, 2) > 0
    assert _snapshot(t, spark) == sorted(
        (c, x, txt) for (c, x), txt in after.items()
    )
    m = t.manifest()
    assert all(int(b) < 2 for b, fl in m.files.items() if fl)


def test_maybe_rebucket_policy(spark, tmpdir_path):
    """Widens only past the per-bucket row budget, by the growth factor,
    without changing the readable state; below budget it is a no-op."""
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=2)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), i, f"c{i}", 0, "user", f"v{i}", None, "f")
        for i in range(40)
    ]), "b1")
    assert t.maybe_rebucket(spark, max_rows_per_bucket=1000) == 0
    before = {(r["conv_id"], r["text"]) for r in t.read(spark).collect()}
    new_n = t.maybe_rebucket(spark, max_rows_per_bucket=5, factor=2)
    # 40 rows / 5-per-bucket budget -> needs >= 8 buckets: 2->4->8
    assert new_n == 8 and t.manifest().n_buckets == 8
    assert {(r["conv_id"], r["text"]) for r in t.read(spark).collect()} == before
    assert t.maybe_rebucket(spark, max_rows_per_bucket=5, factor=2) == 0
