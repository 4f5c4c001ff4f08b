"""Catalog-bucketed co-located joins (lake/bucketed.py): the join of two
tables bucketed+sorted on the same key plans with ZERO Exchange."""

import os
import re

from pyspark.sql import functions as F

from etl_spark.lake.bucketed import read_bucketed, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmpdir_path):
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(os.path.join(sf, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
    write_bucketed(
        orders, "b_orders", os.path.join(tmpdir_path, "o"), ["o_orderkey"], 8
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        os.path.join(tmpdir_path, "l"),
        ["o_orderkey"],
        8,
    )
    try:
        a = read_bucketed(spark, "b_orders")
        b = read_bucketed(spark, "b_lineitem")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "o_orderkey").groupBy("o_orderpriority").count()
            joined.collect()
            # AQE prints "== Final Plan ==" then "== Initial Plan ==";
            # assert on the final one only
            plan = _plan(joined).split("== Initial Plan ==")[0]
            assert "Bucketed: true" in plan, plan
            smj = plan.count("SortMergeJoin")
            assert smj == 1, plan
            # the join itself is exchange-free: the only exchange in the
            # whole plan is the one for the groupBy ABOVE the join
            join_part = plan.split("SortMergeJoin")[1]
            assert "Exchange" not in join_part, plan
            # and exchange-free means ONE exchange total (the agg), not 3
            assert plan.count("Exchange hashpartitioning") <= 1, plan

            # correctness vs the plain (shuffling) formulation
            want = (
                orders.join(li, orders.o_orderkey == li.l_orderkey)
                .groupBy("o_orderpriority")
                .count()
            )
            got = {(r[0], r[1]) for r in joined.collect()}
            assert got == {(r[0], r[1]) for r in want.collect()}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_write_one_file_per_bucket(spark, tmpdir_path):
    sf = "/root/testdata/sf0.001"
    cust = spark.read.parquet(os.path.join(sf, "customer.parquet"))
    path = os.path.join(tmpdir_path, "c")
    write_bucketed(cust, "b_cust", path, ["c_custkey"], 4)
    try:
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        # one file per bucket: bucket ids 0..3 each exactly once
        buckets = sorted(
            int(re.search(r"_(\d{5})(?:\.|_)", f).group(1)) for f in files
        )
        assert buckets == [0, 1, 2, 3], files
        assert read_bucketed(spark, "b_cust").count() == cust.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_cust")
