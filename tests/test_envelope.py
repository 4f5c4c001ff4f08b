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


# --- bounded repair (repair_envelope_json / from_debezium(repair=True)) -----

def test_repair_classes(spark):
    from pyspark.sql import functions as F

    from etl_spark.cdc.envelope import decode_status, from_debezium

    wires = [
        # repairable: unquoted head key
        ('{op:"c","ts":"2024-01-01 00:00:01","lsn":1,"after":{"conv_id":"a","turn_idx":0,"role":"user","text":"hi"}}',),
        # repairable: trailing comma
        ('{"op":"u","ts":"2024-01-01 00:00:02","lsn":2,"after":{"conv_id":"a","turn_idx":1,"role":"user","text":"x|{k: 9}"},}',),
        # dead: truncated
        ('{"op":"c","ts":"2024-01-01 00:00:03","lsn":3,"after":{"conv_id"',),
        # clean
        ('{"op":"d","ts":"2024-01-01 00:00:04","lsn":4,"before":{"conv_id":"a","turn_idx":0}}',),
    ]
    df = spark.createDataFrame(wires, "value string")
    st = [r["s"] for r in df.select(decode_status(F.col("value")).alias("s")).collect()]
    assert st == ["repaired", "repaired", "dead", "ok"]
    dec = from_debezium(df, repair=True).collect()
    by_seq = {r["op_seq"]: r for r in dec}
    assert by_seq[1]["op"] == "I" and by_seq[1]["text"] == "hi"
    # repair must NOT mangle key-like patterns inside string values
    assert by_seq[2]["text"] == "x|{k: 9}"
    assert by_seq[4]["op"] == "D"
    dead = [r for r in dec if r["op"] is None]
    assert len(dead) == 1


def test_repair_composes_with_quarantine_and_requeue(spark, tmp_path):
    """Dispositions invariant with repair on: repaired rows apply, truly
    dead rows count failed and land in quarantine; a requeue of the dead
    rows re-quarantines them (still unparseable) instead of dropping."""
    import os

    from pyspark.sql import functions as F

    from etl_spark.cdc.apply import apply_batch, requeue_quarantine
    from etl_spark.cdc.envelope import from_debezium
    from etl_spark.lake.table import LakeTable
    from etl_spark.schema import TRANSCRIPT_SCHEMA

    wires = [
        ('{op:"c","ts":"2024-01-01 00:00:01","lsn":1,"after":{"conv_id":"a","turn_idx":0,"role":"user","text":"fixed"}}',),
        ('{"op":"c","ts":"2024-01-01 00:00:02","lsn":2,"after":{"conv_id":"b","turn_idx":0,"role":"user","text":"clean"}}',),
        ('{"op":"c","ts":"2024-01-01 00:00:03","lsn":3,"after":{"conv',),
    ]
    df = spark.createDataFrame(wires, "value string")
    table = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=2)
    qdir = str(tmp_path / "quarantine")
    batch = from_debezium(df, repair=True)
    s = apply_batch(spark, table, batch, "wire-1", quarantine_dir=qdir,
                    fail_threshold=0.5)
    assert s.events_in == 3 and s.failed == 1
    assert s.events_in == s.failed + s.late_dropped + s.dup_dropped + s.applied()
    got = {r["conv_id"]: r["text"] for r in table.read(spark).collect()}
    assert got == {"a": "fixed", "b": "clean"}
    # the dead row is in quarantine with a reason
    q = spark.read.parquet(os.path.join(qdir, "wire-1"))
    assert q.count() == 1 and q.first()["reason"] is not None
    # requeue: still-dead rows re-quarantine under the requeue batch id
    s2 = requeue_quarantine(spark, table, qdir, batch_ids=["wire-1"],
                            fail_threshold=1.0)
    assert s2.failed == 1 and s2.applied() == 0
    assert table.read(spark).count() == 2


def test_repair_never_mutates_quoted_payload(spark):
    """Both repair rules are position-anchored: a repairable envelope whose
    TEXT contains comma-brace / key-like patterns must come back with the
    payload byte-identical (the round-4 review's silent-mutation case)."""
    from pyspark.sql import functions as F

    from etl_spark.cdc.envelope import decode_status, from_debezium

    nasty = "a ,} b {k: 65} c, ]"
    wires = [
        # unquoted head key + nasty payload
        ('{op:"c","ts":"2024-01-01 00:00:01","lsn":1,"after":{"conv_id":"a","turn_idx":0,"role":"user","text":"' + nasty + '"}}',),
        # trailing comma at envelope end + nasty payload
        ('{"op":"c","ts":"2024-01-01 00:00:02","lsn":2,"after":{"conv_id":"b","turn_idx":0,"role":"user","text":"' + nasty + '"},}',),
    ]
    df = spark.createDataFrame(wires, "value string")
    st = [r["s"] for r in df.select(decode_status(F.col("value")).alias("s")).collect()]
    assert st == ["repaired", "repaired"]
    dec = {r["op_seq"]: r["text"] for r in from_debezium(df, repair=True).collect()}
    assert dec == {1: nasty, 2: nasty}
