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
