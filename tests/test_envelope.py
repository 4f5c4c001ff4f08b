"""Debezium-style envelope ingestion (cdc/envelope.py): op mapping,
before/after image selection, and the malformed-wire quarantine path
(bad JSON → NULL op/keys → counted failed by the validation budget,
never applied — the PERMISSIVE analog of the reference's JSON repair
fallback, /root/reference/parser/pt.go:233-249)."""

from __future__ import annotations

import pytest

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.envelope import from_debezium
from etl_spark.lake.table import LakeTable
from etl_spark.schema import TRANSCRIPT_SCHEMA

WIRES = [
    '{"op":"c","ts":"2024-01-01 00:00:01.000000","lsn":1,'
    '"after":{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi"}}',
    '{"op":"u","ts":"2024-01-01 00:00:02.000000","lsn":2,'
    '"after":{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi!","tool":"grep"}}',
    '{"op":"r","ts":"2024-01-01 00:00:01.000000","lsn":3,'
    '"after":{"conv_id":"c2","turn_idx":1,"role":"assistant","text":"snapshot"}}',
    '{"op":"d","ts":"2024-01-01 00:00:03.000000","lsn":4,'
    '"before":{"conv_id":"c2","turn_idx":1}}',
]
BAD = ['{"op":"c","ts":', "not json at all", '{"op":"x","lsn":9}']


def test_decode_and_op_mapping(spark):
    df = spark.createDataFrame([(w,) for w in WIRES], "value string")
    rows = {r["op_seq"]: r for r in from_debezium(df).collect()}
    assert rows[1]["op"] == "I" and rows[1]["text"] == "hi"
    assert rows[2]["op"] == "U" and rows[2]["tool"] == "grep"
    assert rows[3]["op"] == "I"  # snapshot read -> insert image
    assert rows[4]["op"] == "D" and rows[4]["conv_id"] == "c2"
    assert rows[4]["text"] is None


def test_malformed_wire_is_quarantined_not_applied(spark, tmp_path):
    df = spark.createDataFrame(
        [(w,) for w in WIRES + BAD], "value string"
    )
    table = LakeTable.create(
        str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4
    )
    stats = apply_batch(
        spark, table, from_debezium(df), "env-1", fail_threshold=0.5
    )
    assert stats.failed == len(BAD)
    assert stats.events_in == len(WIRES) + len(BAD)
    got = {
        (r["conv_id"], r["turn_idx"]): r for r in table.read(spark).collect()
    }
    assert got[("c1", 0)]["text"] == "hi!"  # lsn tie-break applied the update
    assert ("c2", 1) not in got  # deleted
