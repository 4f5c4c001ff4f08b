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


# --- Q4-style order-priority count (EXISTS → left-semi join) ------------------
# TPC-H Q4 checks l_commitdate < l_receiptdate; the testdata carries only
# l_shipdate, so the analog predicate is "some line shipped > 90 days after
# the order date". Shape is what matters: a date-windowed fact filter plus a
# correlated EXISTS that Catalyst plans as LeftSemi with the extra join
# predicate pushed into the join condition — no pre-aggregation, no distinct.

def order_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


ORDER_PRIORITY_SQL = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
"""


# --- Q14-style promo revenue share --------------------------------------------
# part GROWS with SF (no broadcast hint — AQE decides); both conditional and
# total sums are exact DECIMAL with ONE final double division (decimal
# division precision rules differ between engines; double division of two
# identical decimals-cast-to-double is bit-stable on both).

def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    ).cast("double")
    total = F.sum(_rev()).cast("double")
    return j.agg(
        F.round(F.lit(100.0) * promo / total, 4).alias("promo_pct"),
        F.count("*").alias("n_lines"),
    )


PROMO_REVENUE_SQL = f"""
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {REV_SQL}
                                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum({REV_SQL}) AS DOUBLE), 4) AS promo_pct,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# --- Q18-style large-volume orders (GROUP BY ... HAVING gate, then join) ------
# The HAVING aggregate runs FIRST (shrinks |lineitem| to the few qualifying
# orderkeys) and only then joins orders/customer — the qualifying set is tiny
# at any SF, so AQE broadcasts it against the dimension side of each join.

LARGE_ORDER_QTY = 300


def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("__q"))
        .filter(F.col("__q") > LARGE_ORDER_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("__q").cast("double").alias("total_qty"),
        )
    )


LARGE_VOLUME_SQL = f"""
    SELECT c_custkey, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(q AS DOUBLE) AS total_qty
    FROM (
        SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {LARGE_ORDER_QTY}
    )
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
"""


# --- Q6-style filtered revenue (pure pushdown scan-agg) ------------------------
# The canonical predicate-pushdown probe: every filter reaches the parquet
# row-group stats (ts range + numeric ranges), the projection is 3 columns,
# and the whole plan is one map-side-partial aggregate — zero shuffle
# beyond the final single-row combine. At 100 TB this runs at scan speed.

def filtered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sel = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double")
    return sel.agg(rev.alias("revenue"), F.count("*").alias("n_lines"))


FILTERED_REVENUE_SQL = """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


# --- Q10-style returned-item customer ranking ---------------------------------
# Join order: the returnflag+date filters cut lineitem/orders FIRST, revenue
# pre-aggregates per customer before the dimension joins; nation is the only
# hinted broadcast (fixed 25 rows at any SF). Top-k is revenue DESC with a
# unique c_custkey tie-break (deterministic across engines).

def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_rev()).alias("__rev"))
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .orderBy(F.col("__rev").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("__rev").cast("double").alias("revenue"),
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
    )


RETURNED_ITEM_SQL = f"""
    SELECT c_custkey, c_name, CAST(rev AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM (
        SELECT o_custkey, sum({REV_SQL}) AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        GROUP BY o_custkey
    )
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    ORDER BY rev DESC, c_custkey LIMIT 20
"""


# --- shipping-priority top-k (TPC-H Q3 analog) --------------------------------
# Classic selective star join: segment-filtered customers (broadcast dim)
# semi-restrict orders before the cutoff; lineitems shipped after it
# pre-aggregate map-side per order. Catalyst pushes both date filters to
# the parquet scans; only the order-key aggregation shuffles. Reference
# analog: downstream BigQuery priority dashboards over parsed uploads
# (SURVEY §2.5 — joins happen post-load in the reference).

SHIP_CUTOFF = "1998-01-01"


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    c = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = orders.filter(F.col("o_orderdate") < F.lit(SHIP_CUTOFF).cast("timestamp"))
    l = li.filter(F.col("l_shipdate") > F.lit(SHIP_CUTOFF).cast("timestamp"))
    rev = l.groupBy("l_orderkey").agg(F.sum(_rev()).alias("__rev"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(rev, F.col("o_orderkey") == rev.l_orderkey)
        .orderBy(F.col("__rev").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.col("__rev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


SHIPPING_PRIORITY_SQL = f"""
    SELECT o_orderkey, CAST(rev AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM (
        SELECT l_orderkey, sum({REV_SQL}) AS rev
        FROM lineitem WHERE l_shipdate > TIMESTAMP '{SHIP_CUTOFF}'
        GROUP BY l_orderkey
    ) r
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE o_orderdate < TIMESTAMP '{SHIP_CUTOFF}'
      AND c_mktsegment = 'BUILDING'
    ORDER BY rev DESC, o_orderkey LIMIT 10
"""


# --- dormant rich customers (TPC-H Q22 analog) --------------------------------
# Anti-join + scalar aggregate subquery: "rich" customers (account balance
# above the positive-balance mean) with no RECENT order (the testdata
# gives every customer at least one lifetime order, so the anti-join is
# against the date-filtered orders — same plan shape, non-vacuous result),
# rolled up per nation. Plan shape at 100 TB: the global (sum, count) pair
# is a 2-long scalar broadcast (never a collect of rows); the anti-join is
# a LEFT ANTI hash join on the orders key — AQE broadcasts the filtered
# customer side when small, shuffles both sides when not; the date filter
# is pushed to the orders parquet scan. The mean comparison is done as
# acctbal * n > sum  in DECIMAL so Spark and DuckDB agree exactly (a
# double `avg()` differs in the last ulp by summation order). Reference
# analog: the annotation service's "rows with no matching snaplog"
# inverse join (SURVEY §2.6 J1's complement).

DORMANT_CUTOFF = "2001-01-01"


def customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(DORMANT_CUTOFF).cast("timestamp")
    )
    nation = _t(spark, sf_dir, "nation")
    stats = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(_dec("c_acctbal")).alias("__sum"),
            F.count("*").alias("__n"),
        )
    )
    rich = (
        cust.join(F.broadcast(stats))
        .filter(_dec("c_acctbal") * F.col("__n") > F.col("__sum"))
    )
    no_ord = rich.join(
        orders.select("o_custkey"),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return (
        no_ord.join(F.broadcast(nation), no_ord.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


CUSTOMERS_NO_ORDERS_SQL = f"""
    SELECT n_name, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE CAST(c_acctbal AS DECIMAL(18,2))
            * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
          > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2)))
             FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '{DORMANT_CUTOFF} 00:00:00')
    GROUP BY n_name
"""


# --- small-quantity revenue (TPC-H Q17 analog) --------------------------------
# Correlated aggregate subquery, decorrelated Spark-first: the per-part
# mean quantity becomes ONE pre-aggregation over lineitem (map-side
# partials, |part| output rows), then an equi-join back — never a per-row
# subquery execution. The 0.2*avg comparison is  qty * 5 * n < sum  in
# DECIMAL for exact cross-engine agreement. At 100 TB both the stats
# pre-agg and the re-join shuffle on l_partkey, so AQE coalesces them
# into one exchange reuse.

def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    stats = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("__sum_qty"),
        F.count("*").alias("__n"),
    )
    sel = part.filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    return (
        li.join(F.broadcast(sel), li.l_partkey == F.col("p_partkey"))
        .join(stats, "l_partkey")
        .filter(_dec("l_quantity") * F.lit(5) * F.col("__n") < F.col("__sum_qty"))
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("total_rev"),
            F.count("*").alias("n_items"),
        )
    )


SMALL_QTY_REVENUE_SQL = """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND CAST(l_quantity AS DECIMAL(18,2)) * 5
            * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
          < (SELECT sum(CAST(l_quantity AS DECIMAL(18,2)))
             FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
"""


# --- top supplier by quarterly revenue (TPC-H Q15 analog) ---------------------
# Argmax over an aggregate: quarterly revenue per supplier, keep the
# supplier(s) hitting the global max. The max is a single DECIMAL scalar
# broadcast back against the (already |supplier|-sized) revenue relation —
# equality on DECIMAL is exact, so ties resolve identically in both
# engines. Q15's CREATE VIEW becomes a plain CTE/DataFrame reuse.

TOP_SUPPLIER_START = "1997-01-01"
TOP_SUPPLIER_END = "1997-04-01"


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(TOP_SUPPLIER_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(TOP_SUPPLIER_END).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("__rev"))
    )
    mx = rev.agg(F.max("__rev").alias("__mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("__rev") == F.col("__mx"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("__rev").cast("double").alias("total_revenue"),
        )
    )


TOP_SUPPLIER_SQL = f"""
    WITH revenue AS (
        SELECT l_suppkey, sum({REV_SQL}) AS rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{TOP_SUPPLIER_START} 00:00:00'
          AND l_shipdate <  TIMESTAMP '{TOP_SUPPLIER_END} 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE rev = (SELECT max(rev) FROM revenue)
"""


# --- supplier diversity per part class (TPC-H Q16 analog) ---------------------
# COUNT(DISTINCT) with a NOT-IN exclusion list: distinct suppliers per
# (brand, size) over non-promo parts, excluding "complaint" suppliers
# (negative balance — the testdata's analog of Q16's comment scan). The
# exclusion is a LEFT ANTI join (NULL-safe, unlike a naive NOT IN at
# scale); the distinct-count shuffles once on the group key with
# partial_count(distinct) map-side.

def parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    sel = part.filter(
        (F.col("p_brand") != "Brand#5") & (F.col("p_type") != "PROMO")
    ).select("p_partkey", "p_brand", "p_size")
    return (
        li.join(F.broadcast(sel), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


PARTS_SUPPLIER_COUNT_SQL = """
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
"""


# --- national market share (TPC-H Q8 analog) ----------------------------------
# Six-table star join where the nation dimension plays TWO roles (customer
# nation restricts the market to one region; supplier nation drives the
# numerator). Share-of-revenue per order year. Both sums are exact
# DECIMAL; the share divides the two as DOUBLE — identical operands give
# a bit-identical quotient in both engines. At 100 TB: region/nation are
# hinted broadcasts (fixed cardinality), customer/orders joins left to
# AQE, and the whole thing is one fact-table scan.

MKT_REGION = "ASIA"
# NATION_12 is in ASIA (regionkey 2) and has suppliers at every testdata
# SF including sf0.001 — keeps the numerator non-vacuous at smoke scale
MKT_NATION = "NATION_12"


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cnat = nation.select(
        F.col("n_nationkey").alias("__cn_key"), F.col("n_regionkey").alias("__cn_reg")
    )
    snat = nation.select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("__sn_name")
    )
    reg = region.filter(F.col("r_name") == MKT_REGION)
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cnat), cust.c_nationkey == F.col("__cn_key"))
        .join(F.broadcast(reg), F.col("__cn_reg") == reg.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(snat), supp.s_nationkey == F.col("__sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("__sn_name") == MKT_NATION, _rev()).otherwise(zero))
            .cast("double")
            .alias("nation_rev"),
            F.sum(_rev()).cast("double").alias("total_rev"),
        )
        .select(
            "o_year",
            "nation_rev",
            "total_rev",
            (F.col("nation_rev") / F.col("total_rev")).alias("mkt_share"),
        )
    )


MARKET_SHARE_SQL = f"""
    WITH scoped AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               {REV_SQL} AS rev, sn.n_name AS sn_name
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = '{MKT_REGION}'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN sn_name = '{MKT_NATION}' THEN rev
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_rev,
           CAST(sum(rev) AS DOUBLE) AS total_rev,
           CAST(sum(CASE WHEN sn_name = '{MKT_NATION}' THEN rev
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(rev) AS DOUBLE) AS mkt_share
    FROM scoped
    GROUP BY o_year
"""


# --- market-basket part co-occurrence ------------------------------------------
# Self-join on the order key: parts bought together, top pairs by count.
# The explosion is bounded by ORDER SIZE (C(n,2) with n = lines per
# order, single digits in any order system), never by |lineitem| — the
# self-join is an equi-join on l_orderkey whose per-key fan-out is a
# constant, so it scales linearly. p_a < p_b halves the pairs and fixes
# the orientation; count ties break by (p_a, p_b) for a deterministic
# top-k.

TOP_PAIRS = 25


def part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p_a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p_b"))
    return (
        a.join(b, "ok")
        .filter(F.col("p_a") < F.col("p_b"))
        .groupBy("p_a", "p_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "p_a", "p_b")
        .limit(TOP_PAIRS)
    )


PART_PAIRS_SQL = f"""
    SELECT a.l_partkey AS p_a, b.l_partkey AS p_b, count(*) AS n_orders
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, p_a, p_b LIMIT {TOP_PAIRS}
"""
