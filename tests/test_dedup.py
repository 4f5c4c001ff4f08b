"""In-batch LWW dedup: all three implementations agree; ties resolved by
op_seq; duplicate deliveries collapse. Mirrors the reference's unit style of
golden expectations on tiny inputs (/root/reference/parser/ndt7_result_test.go:66-79)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.dedup import lww_dedup, lww_dedup_salted, lww_dedup_window
from etl_spark.schema import CHANGE_SCHEMA


def _ts(s):
    return dt.datetime.fromisoformat(s)


ROWS = [
    # key (a,0): update at t2 wins over insert at t1; duplicate delivery of seq 1
    ("I", _ts("2024-01-01T00:00:01"), 1, "a", 0, "user", "v1", None, "f0"),
    ("I", _ts("2024-01-01T00:00:01"), 1, "a", 0, "user", "v1", None, "f0"),
    ("U", _ts("2024-01-01T00:00:02"), 2, "a", 0, "user", "v2", None, "f0"),
    # key (a,1): equal ts -> higher op_seq wins
    ("I", _ts("2024-01-01T00:00:05"), 3, "a", 1, "user", "x1", None, "f0"),
    ("U", _ts("2024-01-01T00:00:05"), 4, "a", 1, "user", "x2", None, "f0"),
    # key (b,0): late event (earlier ts, later seq) must NOT win over newer ts
    ("U", _ts("2024-01-01T00:01:00"), 5, "b", 0, "user", "new", None, "f0"),
    ("U", _ts("2024-01-01T00:00:30"), 6, "b", 0, "user", "old-late", None, "f0"),
    # key (b,1): delete wins (latest)
    ("I", _ts("2024-01-01T00:00:10"), 7, "b", 1, "user", "gone", None, "f0"),
    ("D", _ts("2024-01-01T00:00:11"), 8, "b", 1, None, None, None, "f0"),
]

EXPECTED = {
    ("a", 0): ("U", 2, "v2"),
    ("a", 1): ("U", 4, "x2"),
    ("b", 0): ("U", 5, "new"),
    ("b", 1): ("D", 8, None),
}


@pytest.mark.parametrize("impl", [lww_dedup, lww_dedup_salted, lww_dedup_window])
def test_lww_dedup_semantics(spark, impl):
    df = spark.createDataFrame(ROWS, CHANGE_SCHEMA)
    got = impl(df).collect()
    assert len(got) == 4
    for r in got:
        op, seq, text = EXPECTED[(r["conv_id"], r["turn_idx"])]
        assert r["op"] == op and r["op_seq"] == seq and r["text"] == text


def test_dedup_output_is_one_row_per_key(spark):
    df = spark.createDataFrame(ROWS, CHANGE_SCHEMA)
    out = lww_dedup(df)
    assert out.groupBy("conv_id", "turn_idx").count().filter(F.col("count") > 1).count() == 0


def test_dedup_plan_is_partial_aggregate(spark):
    """The default dedup must do MAP-SIDE PARTIAL aggregation before the
    exchange (duplicates/hot keys collapse locally, the skew never reaches
    the shuffle) and must NOT be a window (which shuffles every raw row)."""
    df = spark.createDataFrame(ROWS, CHANGE_SCHEMA)
    out = lww_dedup(df)
    jvm = spark.sparkContext._jvm
    plan = jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    assert "partial_max_by" in plan, plan
    assert "Window" not in plan
    # partial agg must appear upstream of the Exchange in the plan tree
    agg_pos = plan.index("partial_max_by")
    ex_pos = plan.index("Exchange")
    assert plan.index("Scan") < agg_pos
