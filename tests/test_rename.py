"""Column rename without rewrite (lake/table.py:rename_column): old-era
files keep their names; the era-aligned scan resolves through the
manifest's cumulative rename map."""

import datetime as dt

import pytest
from pyspark.sql import types as T

from etl_spark.cdc.apply import apply_batch
from etl_spark.lake.table import LakeTable
from etl_spark.schema import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows, schema=CHANGE_SCHEMA):
    return spark.createDataFrame(rows, schema)


def _insert(cid, turn, seq, text):
    return ("I", _ts("2024-01-01T00:00:01"), seq, cid, turn, "user", text, None, "f")


def test_rename_preserves_old_data_and_merges_new(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [
        _insert("c1", 0, 1, "old-era"), _insert("c2", 0, 2, "other")]), "b1")
    v_before = t.current_version()

    t.rename_column(spark, "text", "body")
    # metadata-only commit: no data file changed
    assert t.current_version() == v_before + 1
    assert {fe["path"] for fl in t.manifest(v_before).files.values() for fe in fl} \
        == {fe["path"] for fl in t.manifest().files.values() for fe in fl}

    # old data reads under the NEW name
    got = {r["conv_id"]: r["body"] for r in t.read(spark).collect()}
    assert got == {"c1": "old-era", "c2": "other"}
    assert "text" not in t.read(spark).columns

    # new batches write the new name; both eras merge
    renamed_schema = T.StructType(
        [
            T.StructField(f.name if f.name != "text" else "body",
                          f.dataType, f.nullable)
            for f in CHANGE_SCHEMA.fields
        ]
    )
    apply_batch(spark, t, _mk(spark, [
        ("U", _ts("2024-01-01T00:00:05"), 3, "c1", 0, "user", "new-era", None, "f"),
        ("I", _ts("2024-01-01T00:00:05"), 4, "c3", 0, "user", "fresh", None, "f"),
    ], renamed_schema), "b2")
    got = {r["conv_id"]: r["body"] for r in t.read(spark).collect()}
    assert got == {"c1": "new-era", "c2": "other", "c3": "fresh"}

    # time travel to the pre-rename snapshot shows the OLD name
    old = t.read(spark, version=v_before)
    assert "text" in old.columns and "body" not in old.columns

    # pruned point lookup crosses eras correctly
    assert t.point_read(spark, "c1").collect()[0]["body"] == "new-era"


def test_rename_chain_resolves_oldest_era(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=2)
    apply_batch(spark, t, _mk(spark, [_insert("c1", 0, 1, "v0-data")]), "b1")
    t.rename_column(spark, "text", "body")
    t.rename_column(spark, "body", "content")
    got = t.read(spark).collect()[0]
    assert got["content"] == "v0-data"
    # map is cumulative: both historic names point at the current one
    assert t.manifest().renames == {"text": "content", "body": "content"}


def test_rename_validation(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=2)
    with pytest.raises(ValueError, match="engine-protected"):
        t.rename_column(spark, "conv_id", "cid")
    with pytest.raises(ValueError, match="engine-protected"):
        t.rename_column(spark, "ts", "event_ts")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column(spark, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column(spark, "text", "role")
    with pytest.raises(ValueError, match="collides"):
        t.rename_column(spark, "text", "op_seq")
    # constraints referencing the old name block the rename
    t.add_constraint(spark, "text-len", "length(text) < 100", policy="warn")
    with pytest.raises(ValueError, match="references 'text'"):
        t.rename_column(spark, "text", "body")
    t.drop_constraint("text-len")
    t.rename_column(spark, "text", "body")
    assert "body" in [f.name for f in t.user_schema().fields]


def test_rename_cli(spark, tmpdir_path, capsys):
    from etl_spark.__main__ import main

    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=2)
    rc = main(["rename", "--table", t.path, "--old", "tool", "--new", "tool_name"])
    assert rc == 0
    assert "tool_name" in capsys.readouterr().out
    assert "tool_name" in [f.name for f in t.user_schema().fields]


def test_drop_column_is_logical_and_time_travel_safe(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=2)
    apply_batch(spark, t, _mk(spark, [_insert("c1", 0, 1, "keep-me")]), "b1")
    v0 = t.current_version()
    t.drop_column("tool")
    cols = t.read(spark).columns
    assert "tool" not in cols and "text" in cols
    # no data file was touched
    assert {fe["path"] for fl in t.manifest(v0).files.values() for fe in fl} \
        == {fe["path"] for fl in t.manifest().files.values() for fe in fl}
    # time travel still shows the dropped column
    assert "tool" in t.read(spark, version=v0).columns
    # merges keep working against the narrowed schema
    narrowed = T.StructType([f for f in CHANGE_SCHEMA.fields if f.name != "tool"])
    apply_batch(spark, t, _mk(spark, [
        ("I", _ts("2024-01-01T00:00:05"), 2, "c2", 0, "user", "fresh", "f"),
    ], narrowed), "b2")
    got = {r["conv_id"]: r["text"] for r in t.read(spark).collect()}
    assert got == {"c1": "keep-me", "c2": "fresh"}


def test_drop_column_validation_and_rename_interplay(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=2)
    with pytest.raises(ValueError, match="engine-protected"):
        t.drop_column("conv_id")
    with pytest.raises(ValueError, match="no column"):
        t.drop_column("nope")
    t.add_constraint(spark, "has-text", "text IS NOT NULL", policy="warn")
    with pytest.raises(ValueError, match="references"):
        t.drop_column("text")
    t.drop_constraint("has-text")
    # rename then drop: the alias chain must die with the column, so a
    # future SAME-NAME column cannot resurrect old-era data
    apply_batch(spark, t, _mk(spark, [_insert("c1", 0, 1, "zombie?")]), "b1")
    t.rename_column(spark, "text", "body")
    t.drop_column("body")
    assert t.manifest().renames in (None, {})
    t.add_column("body", "string", comment="fresh start")
    got = t.read(spark).collect()[0]
    assert got["body"] is None  # old-era 'text' data must NOT reappear


def test_add_column_ddl(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=2)
    apply_batch(spark, t, _mk(spark, [_insert("c1", 0, 1, "x")]), "b1")
    t.add_column("score", "double", comment="quality score")
    row = t.read(spark).collect()[0]
    assert row["score"] is None
    desc = {d["name"]: d for d in t.describe()}
    assert desc["score"]["type"] == "double"
    assert desc["score"]["comment"] == "quality score"
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("score", "double")
    with pytest.raises(ValueError, match="unsupported DDL type"):
        t.add_column("vec", "array<float>")


def test_add_drop_column_cli(spark, tmpdir_path, capsys):
    from etl_spark.__main__ import main

    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=2)
    assert main(["add-column", "--table", t.path, "--name", "lang",
                 "--type", "string"]) == 0
    assert main(["drop-column", "--table", t.path, "--name", "lang"]) == 0
    assert "lang" not in [f.name for f in t.user_schema().fields]


def test_rename_refuses_historic_and_mapped_names(spark, tmpdir_path):
    """Name-reuse resurrection guards: a rename target (or re-added
    column) must never collide with a name some historic era still
    physically stores, or with a rename-map source — old-era reads would
    serve the wrong lineage's bytes under the new name."""
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [_insert("c1", 0, 1, "v1")]), "b1")
    t.rename_column(spark, "text", "body")
    # swap pattern: rename another column INTO the historic name 'text'
    with pytest.raises(ValueError, match="historic"):
        t.rename_column(spark, "tool", "text")
    # re-adding the renamed-away source name forks the lineage
    with pytest.raises(ValueError, match="rename map"):
        t.add_column("text", "string")


def test_batch_with_renamed_away_field_fails_loud(spark, tmpdir_path):
    """An old producer still emitting the pre-rename field name must be
    refused, not silently forked into a new column."""
    from etl_spark.lake.merge import BatchFailedError

    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, _mk(spark, [_insert("c1", 0, 1, "v1")]), "b1")
    t.rename_column(spark, "text", "body")
    stale_producer = _mk(spark, [_insert("c1", 1, 2, "v2")])  # still 'text'
    with pytest.raises(BatchFailedError, match="renamed-away"):
        apply_batch(spark, t, stale_producer, "b2")
