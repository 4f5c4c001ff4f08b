"""Dead-letter quarantine for invalid rows: <dir>/<batch_id>/ parquet with
per-row reasons — written only when a batch HAS failures, including the
failfast-abort path (the evidence for exactly the batch that refused to
commit). Reference analog: per-test error counters + logs
(/root/reference/task/task.go:139-173, /root/reference/etl/etl.go:116-117);
a standalone engine keeps the rows, not just the count."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from etl_spark.cdc.apply import BatchFailedError, apply_batch
from etl_spark.lake.table import LakeTable
from etl_spark.schema import TRANSCRIPT_SCHEMA

SCHEMA = (
    "op string, ts timestamp, op_seq long, conv_id string, turn_idx int, "
    "role string, text string, tool string"
)
TS = dt.datetime(2024, 1, 1)


def _reasons(spark, qdir, batch_id):
    df = spark.read.parquet(os.path.join(qdir, batch_id))
    return {(r["op_seq"], r["reason"]) for r in df.collect()}, df


def test_quarantine_reasons_and_clean_batch_writes_nothing(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4)
    qdir = str(tmp_path / "q")
    rows = [
        ("U", TS, 1, "c", 0, "user", "good", None),
        ("Z", TS, 2, "c", 1, "user", "bad op", None),          # bad_op
        ("U", TS, 3, None, 1, "user", "no key", None),         # null_key
        ("U", None, 4, "c", 2, "user", "no ts", None),         # null_ts
        ("U", TS, 5, "c", 3, "user", "x" * (10 * 1024 * 1024), None),  # oversize
        ("U", TS, 6, "c", 4, "user", "also good", None),
    ]
    s = apply_batch(
        spark, table, spark.createDataFrame(rows, SCHEMA), "b1",
        fail_threshold=0.9, quarantine_dir=qdir,
    )
    got, df = _reasons(spark, qdir, "b1")
    assert ("2", "bad_op") in got
    assert ("3", "null_key") in got
    assert ("4", "null_ts") in got
    assert ("5", "oversize_text") in got
    assert len(got) == 4 and s.failed == 4
    assert df.schema["conv_id"].dataType.typeName() == "string"
    assert {r["batch_id"] for r in df.collect()} == {"b1"}
    # clean batch: no quarantine dir entry at all
    s2 = apply_batch(
        spark, table,
        spark.createDataFrame([("U", TS, 7, "c", 5, "user", "ok", None)], SCHEMA),
        "b2", quarantine_dir=qdir,
    )
    assert s2.failed == 0
    assert not os.path.exists(os.path.join(qdir, "b2"))


def test_failfast_abort_still_quarantines(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4)
    qdir = str(tmp_path / "q")
    rows = [
        ("Z", TS, 1, "c", 0, "user", "bad", None),
        ("Z", TS, 2, "c", 1, "user", "bad", None),
        ("U", TS, 3, "c", 2, "user", "good", None),
    ]
    v0 = table.current_version()
    with pytest.raises(BatchFailedError):
        apply_batch(
            spark, table, spark.createDataFrame(rows, SCHEMA), "bfail",
            quarantine_dir=qdir,
        )
    assert table.current_version() == v0  # nothing committed
    got, _ = _reasons(spark, qdir, "bfail")
    assert got == {("1", "bad_op"), ("2", "bad_op")}


def test_patch_op_quarantined_when_not_allowed(spark, tmp_path):
    table = LakeTable.create(str(tmp_path / "lake"), TRANSCRIPT_SCHEMA, n_buckets=4)
    qdir = str(tmp_path / "q")
    rows = [
        ("P", TS, 1, "c", 0, None, "patch", None),
        ("U", TS, 2, "c", 1, "user", "good", None),
    ]
    s = apply_batch(
        spark, table, spark.createDataFrame(rows, SCHEMA), "b1",
        fail_threshold=0.9, quarantine_dir=qdir,
    )
    assert s.failed == 1
    got, _ = _reasons(spark, qdir, "b1")
    assert got == {("1", "bad_op")}
    # same batch WITH patches allowed: clean, nothing quarantined
    s2 = apply_batch(
        spark, table, spark.createDataFrame(rows, SCHEMA), "b2",
        allow_patches=True, quarantine_dir=qdir,
    )
    assert s2.failed == 0
    assert not os.path.exists(os.path.join(qdir, "b2"))
