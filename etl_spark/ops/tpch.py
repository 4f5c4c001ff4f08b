"""Star-schema analytics over the TPC-H-ish testdata tables.

These exercise the general-engine paths the CDC core shares: hash
aggregation with map-side partials, broadcast hash joins for dims, AQE for
the fact-side shuffles. Money math is exact DECIMAL(18,2) end-to-end with a
single final cast to DOUBLE so Spark and DuckDB agree bit-for-bit
(floating sums would differ in the last ulp by summation order).

Plan notes (checked via .explain("formatted")):
  * only TRUE dimension tables (region: 5 rows, nation: 25 rows — fixed
    cardinality at any scale factor) carry an explicit broadcast hint;
    orders/customer GROW with the fact table, so their join strategy is
    left to AQE, which broadcasts at test scale (right there) and shuffles
    at 100× (right there) — a hard-coded fact-side broadcast OOMs a real
    cluster;
  * revenue per order aggregates BEFORE joining orders (pre-aggregation
    shrinks the join input from |lineitem| to |orders|).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


# revenue term: exact decimal l_extendedprice * (1 - l_discount)
def _rev() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))


REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"


# --- Q1-style pricing summary ------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_rev()).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum({REV_SQL}) AS DOUBLE) AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --- top-k orders by revenue (join + top-k with unique tie-break) ------------

def top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    rev = li.groupBy("l_orderkey").agg(F.sum(_rev()).alias("__rev"))
    out = (
        rev.join(orders, rev.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .orderBy(F.col("__rev").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.col("__rev").cast("double").alias("revenue"),
            "o_orderpriority",
            "c_mktsegment",
        )
    )
    return out


TOP_ORDERS_SQL = f"""
    SELECT o_orderkey, CAST(rev AS DOUBLE) AS revenue, o_orderpriority, c_mktsegment
    FROM (
        SELECT l_orderkey, sum({REV_SQL}) AS rev
        FROM lineitem GROUP BY l_orderkey
    ) r
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY rev DESC, o_orderkey LIMIT 10
"""


# --- region revenue rollup (4-way star join) ---------------------------------

def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


REGION_REVENUE_SQL = f"""
    SELECT r_name,
           CAST(sum({REV_SQL}) AS DOUBLE) AS revenue,
           count(DISTINCT o_orderkey) AS n_orders
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
"""
