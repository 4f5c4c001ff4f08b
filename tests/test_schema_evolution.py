"""Schema evolution (FIXTURES §F4): mid-stream column adds + int→long widen.

Mirrors the reference's era-gated field additions (ClientMetadata gating,
/root/reference/parser/ndt5_result.go:72-78) and the update-schema workflow
(/root/reference/cmd/update-schema/update.go:112-161)."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F, types as T

from etl_spark.cdc.apply import apply_batch, replay_feed
from etl_spark.cdc.gen import change_feed_df, write_feed
from etl_spark.cdc.oracle import expected_final_state, table_as_pandas
from etl_spark.lake.table import LakeTable
from etl_spark.schema import TRANSCRIPT_SCHEMA, evolve_schema
from tests.test_e2e_replay import _assert_state_equal


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_evolve_schema_lattice():
    base = T.StructType([T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())])
    inc = T.StructType([T.StructField("a", T.LongType()), T.StructField("c", T.DoubleType())])
    out = evolve_schema(base, inc)
    assert out["a"].dataType == T.LongType()          # widened
    assert out["c"].dataType == T.DoubleType()        # added, nullable
    assert out["c"].nullable
    with pytest.raises(ValueError):
        evolve_schema(
            T.StructType([T.StructField("a", T.StringType())]),
            T.StructType([T.StructField("a", T.IntegerType())]),
        )


def test_new_columns_appear_with_nulls_for_old_rows(spark, tmpdir_path):
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    old_schema = (
        "op string, ts timestamp, op_seq long, conv_id string, turn_idx int, "
        "role string, text string, tool string, source_file string"
    )
    apply_batch(spark, t, spark.createDataFrame(
        [("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "tool", "pre", "grep", "f1")],
        old_schema), "b1")
    new_schema = old_schema + ", tool_version string, tool_latency_ms long"
    apply_batch(spark, t, spark.createDataFrame(
        [("I", _ts("2024-01-01T00:00:02"), 2, "c2", 0, "tool", "post", "grep", "f2", "v1.2", 35)],
        new_schema), "b2")
    rows = {r["conv_id"]: r for r in t.read(spark).collect()}
    assert set(t.read(spark).columns) >= {"tool_version", "tool_latency_ms"}
    assert rows["c1"]["tool_version"] is None and rows["c1"]["tool_latency_ms"] is None
    assert rows["c2"]["tool_version"] == "v1.2" and rows["c2"]["tool_latency_ms"] == 35
    # old rows are readable without rewriting old files (two schema eras)
    assert len(t.manifest().schemas) == 2


def test_int_to_long_widening_across_eras(spark, tmpdir_path):
    t = LakeTable.create(
        tmpdir_path + "/t",
        T.StructType(list(TRANSCRIPT_SCHEMA.fields)
                     + [T.StructField("tool_latency_ms", T.IntegerType(), True)]),
        n_buckets=4,
    )
    base = (
        "op string, ts timestamp, op_seq long, conv_id string, turn_idx int, "
        "role string, text string, tool string, source_file string"
    )
    apply_batch(spark, t, spark.createDataFrame(
        [("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "tool", "a", "g", "f", 12)],
        base + ", tool_latency_ms int"), "b1")
    apply_batch(spark, t, spark.createDataFrame(
        [("I", _ts("2024-01-01T00:00:02"), 2, "c2", 0, "tool", "b", "g", "f", 9_999_999_999)],
        base + ", tool_latency_ms long"), "b2")
    got = {r["conv_id"]: r["tool_latency_ms"] for r in t.read(spark).collect()}
    assert got == {"c1": 12, "c2": 9_999_999_999}
    assert dict(t.user_schema().fields[-1].__dict__)["dataType"] == T.LongType()


def test_e2e_replay_with_mid_stream_evolution_matches_oracle(spark, tmpdir_path):
    feed_dir = os.path.join(tmpdir_path, "feed")
    feed = change_feed_df(
        spark, n_events=4000, n_convs=80, max_turns=8, seed=11,
        delete_ratio=0.05, dup_ratio=0.05, ooo_ratio=0.1, n_batches=6,
        evolve_from_batch=3,
    )
    write_feed(feed, feed_dir, evolve_from_batch=3)
    # pre-K segments physically lack the evolved columns
    pre = spark.read.parquet(os.path.join(feed_dir, "batch=00000"))
    assert "tool_version" not in pre.columns
    t = LakeTable.create(os.path.join(tmpdir_path, "lake"), TRANSCRIPT_SCHEMA, n_buckets=8)
    replay_feed(spark, t, feed_dir)
    got = table_as_pandas(t.read(spark))
    want = expected_final_state(feed_dir, extra_cols=["tool_version", "tool_latency_ms"])
    _assert_state_equal(got, want)


def test_key_type_widening_keeps_merge_and_bloom_sound(spark, tmpdir_path):
    """turn_idx widened int→long mid-stream: (a) later narrower-typed
    batches must write files whose physical key type matches the widened
    era (regression: keys passed through uncast), and (b) the Bloom
    seen-set must keep recognizing keys across the type change (hashes are
    type-canonical) — a false negative here would fast-path-append a
    duplicate of an existing key."""
    from etl_spark.schema import CHANGE_SCHEMA

    wide = T.StructType([
        T.StructField(f.name, T.LongType() if f.name == "turn_idx" else f.dataType,
                      f.nullable)
        for f in CHANGE_SCHEMA.fields
    ])
    t = LakeTable.create(tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4)
    apply_batch(spark, t, spark.createDataFrame(
        [("I", _ts("2024-01-01T00:00:01"), 1, "c1", 0, "user", "v1", None, "f")],
        CHANGE_SCHEMA), "b1")
    # widened-key batch updates the SAME key — must be seen as an update
    s2 = apply_batch(spark, t, spark.createDataFrame(
        [("U", _ts("2024-01-01T00:00:02"), 2, "c1", 0, "user", "v2", None, "f")],
        wide), "b2")
    assert s2.updated == 1 and not s2.fast_path_append
    assert t.user_schema()["turn_idx"].dataType == T.LongType()
    # narrower-typed batch AFTER the widening: new key fast-paths, existing
    # key must still hit the seen-set (no duplicate row)
    s3 = apply_batch(spark, t, spark.createDataFrame(
        [("U", _ts("2024-01-01T00:00:03"), 3, "c1", 0, "user", "v3", None, "f"),
         ("I", _ts("2024-01-01T00:00:03"), 4, "c2", 7, "user", "new", None, "f")],
        CHANGE_SCHEMA), "b3")
    assert not s3.fast_path_append  # c1/0 exists: bloom must say "seen"
    rows = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.read(spark).collect()}
    assert rows == {("c1", 0): "v3", ("c2", 7): "new"}
    assert t.read(spark).count() == 2  # no duplicate keys
