"""Per-data-file value-bloom sidecars: equality lookups on NON-key columns
skip files whose bloom excludes the probe (Iceberg puffin-metrics analog).

Correctness contract: pruning may keep extra files (bloom false positives,
pre-declaration files without sidecars) but may never lose a result row —
including under merge-on-read, where a key's LWW winner can sit in a file
the bloom excludes (its OLD row holds the value): there the planner falls
back to bucket granularity.
"""

import datetime as dt

import pytest

from etl_spark.cdc.apply import apply_batch
from etl_spark.lake.table import LakeTable
from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _seed_rows(n, text_of):
    return [
        ("I", _ts("2024-01-01T00:00:01"), i + 1, f"c{i}", 0, "user",
         text_of(i), None, "f1")
        for i in range(n)
    ]


def test_set_skip_blooms_validation(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    with pytest.raises(ValueError, match="not in schema"):
        t.set_skip_blooms(["nope"])
    with pytest.raises(ValueError, match="stats-pruned"):
        t.set_skip_blooms(["conv_id"])
    m = t.set_skip_blooms(["text", "tool"])
    assert m.skip_blooms == ["text", "tool"]
    # property survives ordinary commits
    apply_batch(spark, t, _mk(spark, _seed_rows(4, lambda i: f"t{i}")), "b1")
    assert t.manifest().skip_blooms == ["text", "tool"]


def test_cow_lookup_prunes_files_and_loses_nothing(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=8)
    t.set_skip_blooms(["text"])
    # two COW batches → every bucket holds sidecar-bearing files
    apply_batch(spark, t, _mk(spark, _seed_rows(64, lambda i: f"alpha-{i}")), "b1")
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T01:00:00"), 1000, "needle-conv", 0, "user",
         "the-needle", None, "f2")]), "b2")
    assert not t.manifest().needs_reduce
    plan = t.plan_value_lookup("text", "the-needle")
    assert plan["files_pruned"] > 0, "bloom should skip files without the value"
    assert len(plan["files"]) < plan["files_total"]
    rows = t.read_where_equal(spark, "text", "the-needle").collect()
    assert [(r["conv_id"], r["text"]) for r in rows] == [("needle-conv", "the-needle")]
    # absent value → every sidecar-bearing file pruned, empty result
    plan2 = t.plan_value_lookup("text", "no-such-value")
    assert plan2["files"] == [] or all("vb" not in fe for fe in plan2["files"])
    assert t.read_where_equal(spark, "text", "no-such-value").count() == 0


def test_pre_declaration_files_are_kept_not_lost(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "old-conv", 0, "user",
         "pre-bloom-value", None, "f1")]), "b1")  # written BEFORE declaration
    t.set_skip_blooms(["text"])
    apply_batch(spark, t, _mk(spark, _seed_rows(16, lambda i: f"post-{i}")), "b2")
    rows = t.read_where_equal(spark, "text", "pre-bloom-value").collect()
    assert len(rows) == 1 and rows[0]["conv_id"] == "old-conv"


def test_mor_bucket_granularity_holds_lww(spark, tmpdir_path):
    """Key k's OLD delta row has the probe value; its NEWEST row does not.
    File-level pruning would scan only the old file and wrongly emit k —
    bucket-level scan + reduce must exclude it. And a key whose NEWEST row
    has the value must be found even when its bucket holds excluded files."""
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=2)
    t.set_skip_blooms(["text"])
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "k-moved", 0, "user", "magic", None, "f1"),
        ("I", _ts("2024-01-01T00:00:01"), 2, "k-keeps", 0, "user", "other", None, "f1"),
    ]), "b1", mode="mor")
    apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:10:00"), 3, "k-moved", 0, "user", "changed", None, "f2"),
        ("U", _ts("2024-01-01T00:10:00"), 4, "k-keeps", 0, "user", "magic", None, "f2"),
    ]), "b2", mode="mor")
    assert t.manifest().needs_reduce
    got = {r["conv_id"] for r in t.read_where_equal(spark, "text", "magic").collect()}
    assert got == {"k-keeps"}
    # after resolving deltas the same lookup prunes per FILE and still agrees
    t.resolve_deltas(spark)
    assert not t.manifest().needs_reduce
    got2 = {r["conv_id"] for r in t.read_where_equal(spark, "text", "magic").collect()}
    assert got2 == {"k-keeps"}


def test_rename_resolves_historic_sidecar_names(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=2)
    t.set_skip_blooms(["tool"])
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "x", "hammer", "f1"),
        ("I", _ts("2024-01-01T00:00:01"), 2, "c2", 0, "user", "y", "wrench", "f1"),
    ]), "b1")
    t.rename_column(spark, "tool", "tool_name")
    # old files' sidecars are keyed by the historic name; the lookup under
    # the CURRENT name must still prune and still find the row
    plan = t.plan_value_lookup("tool_name", "hammer")
    assert plan["files_total"] > 0
    rows = t.read_where_equal(spark, "tool_name", "hammer").collect()
    assert len(rows) == 1 and rows[0]["conv_id"] == "c1"


def test_compaction_rewrites_backfill_sidecars(spark, tmpdir_path):
    """Files written before the declaration gain sidecars when maintenance
    rewrites them — the documented backfill path."""
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=2)
    apply_batch(spark, t, _mk(spark, _seed_rows(8, lambda i: f"v{i}")), "b1")
    t.set_skip_blooms(["text"])
    assert all(
        "vb" not in fe for fl in t.manifest().files.values() for fe in fl
    )
    t.compact_small_files(spark, max_files_per_bucket=0)
    m = t.manifest()
    assert all("vb" in fe for fl in m.files.values() for fe in fl if fl)
    plan = t.plan_value_lookup("text", "v3")
    assert plan["files_pruned"] > 0
    rows = t.read_where_equal(spark, "text", "v3").collect()
    assert len(rows) == 1 and rows[0]["conv_id"] == "c3"


def test_expire_snapshots_gc_keeps_live_sidecars(spark, tmpdir_path):
    import os

    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=2)
    t.set_skip_blooms(["text"])
    apply_batch(spark, t, _mk(spark, _seed_rows(8, lambda i: f"v{i}")), "b1")
    apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-02T00:00:00"), 100 + i, f"c{i}", 0, "user",
         f"w{i}", None, "f2") for i in range(8)]), "b2")
    t.compact_small_files(spark, max_files_per_bucket=0)  # old files now dead
    t.expire_snapshots(keep_last=1)
    m = t.manifest()
    for fl in m.files.values():
        for fe in fl:
            assert os.path.exists(os.path.join(t.path, fe["path"]))
            if fe.get("vb"):
                assert os.path.exists(os.path.join(t.path, fe["vb"]["path"]))
    rows = t.read_where_equal(spark, "text", "w5").collect()
    assert len(rows) == 1 and rows[0]["conv_id"] == "c5"


def test_read_where_in_batch_lookup(spark, tmpdir_path):
    """IN-list lookup: union of per-value candidates in ONE scan, equal to
    the unpruned filter, including a value only present pre-declaration
    and a value absent entirely."""
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:01"), 1, "early", 0, "user",
         "pre-decl", None, "f0")]), "b0")
    t.set_skip_blooms(["text"])
    apply_batch(spark, t, _mk(spark, _seed_rows(32, lambda i: f"val-{i}")), "b1")
    want = {"val-3", "val-17", "pre-decl"}
    got = {r["text"] for r in t.read_where_in(
        spark, "text", ["val-3", "val-17", "pre-decl", "no-such"]).collect()}
    assert got == want
    plan = t.plan_value_lookup("text", ["val-3", "val-17", "no-such"])
    assert 0 < len(plan["files"]) < plan["files_total"]
