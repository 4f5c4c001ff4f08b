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
