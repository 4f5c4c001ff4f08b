"""CDC-out wire encoding (cdc/envelope.to_debezium): the outbound half of
the envelope contract. A changelog read encodes to Debezium-style JSON
wires, ships over any bus, and ``from_debezium`` + ``apply_batch`` on the
other side converge a replica to the source snapshot with identical LWW
metadata — lake-to-lake CDC through the public wire format, not through
engine internals (the reference's JSONL sink exists for exactly this
downstream-consumption role, /root/reference/storage/rowwriter.go:96-107)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.envelope import from_debezium, to_debezium
from etl_spark.cdc.gen import change_feed_df, write_feed
from etl_spark.cdc.apply import replay_feed
from etl_spark.lake.table import LakeTable
from etl_spark.schema import TRANSCRIPT_SCHEMA


def _state(spark, t):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"], r["ts"], r["op_seq"])
        for r in t.read(spark, include_system=True)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts", "op_seq")
        .collect()
    }


def test_wire_shape(spark, tmp_path):
    src = LakeTable.create(str(tmp_path / "src"), TRANSCRIPT_SCHEMA, n_buckets=4)
    feed = str(tmp_path / "feed")
    write_feed(
        change_feed_df(spark, n_events=4000, n_convs=60, max_turns=8,
                       seed=11, delete_ratio=0.15, n_batches=2),
        feed,
    )
    stats = replay_feed(spark, src, feed, mode="cow")
    assert len(stats) == 2
    mid = 1
    wires = to_debezium(
        src.changes_between(spark, mid, emit_meta=True, emit_pre=True)
    ).collect()
    ops = {"c": 0, "u": 0, "d": 0}
    for r in wires:
        env = json.loads(r["value"])
        ops[env["op"]] += 1
        assert isinstance(env["lsn"], int)
        if env["op"] == "d":
            assert "after" not in env and env["before"]["conv_id"]
        elif env["op"] == "u":
            # update carries both images when emit_pre was on
            assert env["after"]["conv_id"] == env["before"]["conv_id"]
        else:
            assert "before" not in env
    assert ops["c"] > 0 and ops["u"] > 0 and ops["d"] > 0


def test_roundtrip_converges_replica(spark, tmp_path):
    src = LakeTable.create(str(tmp_path / "src"), TRANSCRIPT_SCHEMA, n_buckets=8)
    feed = str(tmp_path / "feed")
    write_feed(
        change_feed_df(spark, n_events=12000, n_convs=150, max_turns=10,
                       seed=23, delete_ratio=0.10, ooo_ratio=0.15, n_batches=3),
        feed,
    )
    replay_feed(spark, src, feed, mode="mor")
    head = src.manifest().version

    # bootstrap wires (empty -> mid) then incremental wires (mid -> head),
    # both through the public Debezium wire format
    mid = max(1, head // 2)

    rep = LakeTable.create(str(tmp_path / "rep"), TRANSCRIPT_SCHEMA, n_buckets=4)
    for i, (lo, hi) in enumerate([(0, mid), (mid, head)]):
        wires = to_debezium(
            src.changes_between(spark, lo, hi, emit_meta=True, emit_pre=True)
        )
        decoded = from_debezium(wires)
        if decoded.isEmpty():
            continue
        apply_batch(spark, rep, decoded, f"wire-sync-{i}", mode="mor")

    assert _state(spark, rep) == {
        k: v for k, v in _state(spark, src).items()
    }


def test_evolved_schema_rides_the_wire(spark, tmp_path):
    """An evolved table's added payload columns must ride the wire: the row
    struct is derived from the changelog's own schema, not a fixed shape, so
    lake-to-lake replication of an evolved table is lossless (the silent
    column-drop class the round-3 review flagged)."""
    src = LakeTable.create(str(tmp_path / "src"), TRANSCRIPT_SCHEMA, n_buckets=4)
    feed = change_feed_df(spark, n_events=3000, n_convs=50, max_turns=8,
                          seed=41, delete_ratio=0.10, n_batches=2)
    live = F.col("op") != "D"
    feed = feed.withColumn(
        "lang", F.when(live, F.concat(F.lit("l"), (F.col("op_seq") % 3).cast("string")))
    ).withColumn(
        "score", F.when(live, (F.col("op_seq") % 100).cast("double"))
    )
    fdir = str(tmp_path / "feed")
    write_feed(feed, fdir, n_batches=2)
    replay_feed(spark, src, fdir, mode="mor")
    user = src.user_schema()
    assert {"lang", "score"} <= {f.name for f in user.fields}

    wires = to_debezium(
        src.changes_between(spark, 0, emit_meta=True, emit_pre=True)
    )
    sample = [json.loads(r["value"]) for r in wires.limit(200).collect()]
    assert any("lang" in (e.get("after") or {}) for e in sample)

    row_fields = [f for f in user.fields if f.name != "ts"]
    decoded = from_debezium(wires, row_fields=row_fields)
    rep = LakeTable.create(str(tmp_path / "rep"), TRANSCRIPT_SCHEMA, n_buckets=2)
    apply_batch(spark, rep, decoded, "wire-evolved", mode="mor")

    def _full(t):
        return {
            (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"],
                                            r["lang"], r["score"])
            for r in t.read(spark)
            .select("conv_id", "turn_idx", "role", "text", "tool", "lang", "score")
            .collect()
        }

    assert _full(rep) == _full(src)
    assert any(v[3] is not None for v in _full(rep).values())


def test_wire_refuses_changelog_without_keys(spark, tmp_path):
    import pytest

    src = LakeTable.create(str(tmp_path / "s2"), TRANSCRIPT_SCHEMA, n_buckets=2)
    fdir = str(tmp_path / "f2")
    write_feed(change_feed_df(spark, n_events=500, n_convs=10, max_turns=4,
                              seed=7, n_batches=1), fdir)
    replay_feed(spark, src, fdir, mode="mor")
    cl = src.changes_between(spark, 0, emit_meta=True).drop("conv_id")
    with pytest.raises(ValueError, match="missing key columns"):
        to_debezium(cl)
