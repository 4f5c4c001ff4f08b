"""Star-schema analytics, part 2 — the remaining TPC-H query shapes.

Completes the analog family started in `tpch.py` (Q1/Q3/Q4/Q6/Q8/Q10/Q14/
Q15/Q16/Q17/Q18/Q22) with the ten shapes it was missing: Q2 (correlated
min, decorrelated), Q5 (same-nation star join), Q7 (nation-pair volume),
Q9 (profit by nation/year), Q11 (global-scalar HAVING), Q12 (two-way
conditional counts), Q13 (outer-join histogram), Q19 (disjunctive
pushdown), Q20 (nested semi-join chain), Q21 (exists/not-exists
double-correlation as semi+anti joins).

The testdata has no `partsupp` table, so Q2/Q11/Q20 derive the
part-supplier relation from lineitem (which suppliers actually shipped
which parts, at what price) — the plan shapes (decorrelated min subquery,
scalar-threshold HAVING, nested semi joins) are identical.

Money math follows tpch.py: exact DECIMAL end-to-end, ONE final cast to
DOUBLE so Spark and DuckDB agree bit-for-bit. Counts stay BIGINT on both
sides. Every top-k carries a unique tie-break.

Reference analog: these are the post-load BigQuery shapes over parsed
uploads (SURVEY §2.5/§2.6 — the reference delegates all joins/rollups to
the warehouse; a standalone engine must run them itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_spark.ops.tpch import _dec, _rev, _t, REV_SQL


# --- Q5 analog: local-supplier volume ------------------------------------------
# Star join with an EXTRA non-key equality: customer and supplier must sit
# in the SAME nation (c_nationkey = s_nationkey), nation restricted to one
# region. The same-nation predicate is applied as a post-join filter on
# two already-joined dimension keys — Catalyst collapses it into the join
# output with zero extra exchange. region/nation are fixed-cardinality
# broadcasts; customer/orders strategy is left to AQE. Grouped by
# (nation, order year) so the result is a small matrix at any SF.

Q5_REGION = "ASIA"


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    reg = region.filter(F.col("r_name") == Q5_REGION)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(reg), nation.n_regionkey == reg.r_regionkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


LOCAL_SUPPLIER_VOLUME_SQL = f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(sum({REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = '{Q5_REGION}' AND c_nationkey = s_nationkey
    GROUP BY 1, 2
"""


# --- Q7 analog: volume shipping between two nations ------------------------------
# The nation dimension joins TWICE (supplier side and customer side) with a
# cross-pair predicate restricting to the two named nations in either
# direction. Both nation copies are fixed-25-row broadcasts; the pair
# filter evaluates on broadcast output, so the fact table is scanned once
# and never re-shuffled for the dimension logic.

Q7_NATION_A = "NATION_2"
Q7_NATION_B = "NATION_12"


def nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    snat = nation.select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
    )
    cnat = nation.select(
        F.col("n_nationkey").alias("__cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B)
    ) | ((F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(snat), F.col("s_nationkey") == F.col("__sn_key"))
        .join(F.broadcast(cnat), F.col("c_nationkey") == F.col("__cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


NATION_VOLUME_SHIPPING_SQL = f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
           CAST(sum({REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = '{Q7_NATION_A}' AND cn.n_name = '{Q7_NATION_B}')
       OR (sn.n_name = '{Q7_NATION_B}' AND cn.n_name = '{Q7_NATION_A}')
    GROUP BY 1, 2, 3
"""


# --- Q9 analog: product-type profit by nation and year ---------------------------
# Profit per (supplier nation, order year) over parts whose name matches a
# pattern. The testdata has no ps_supplycost, so unit cost is proxied as
# 10% of p_retailprice — the term stays exact DECIMAL:
#   amount = extprice*(1-disc) - 0.10*retailprice*quantity.
# The p_name LIKE filter is pushed to the part scan; part joins the fact
# on l_partkey (AQE decides: broadcast at small SF, shuffle at 100x —
# part GROWS with SF so it carries no hint).

Q9_PATTERN = "gear"


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains(Q9_PATTERN))
    cost = F.lit("0.10").cast("decimal(18,2)") * _dec("p_retailprice") * _dec(
        "l_quantity"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(_rev() - cost).cast("double").alias("sum_profit"))
    )


PRODUCT_TYPE_PROFIT_SQL = f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(sum({REV_SQL}
                    - CAST(0.10 AS DECIMAL(18,2))
                      * CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%{Q9_PATTERN}%'
    GROUP BY 1, 2
"""


# --- Q12 analog: late-shipment priority counts -----------------------------------
# Two-way conditional counts per category: lines bucketed by ship delay
# (LATE = shipped > 60 days after the order date), counting high-priority
# vs low-priority orders per bucket — Q12's CASE-sum pair over l_shipmode,
# with the delay bucket standing in for the missing shipmode column. One
# fact scan, one equi-join, one 2-row hash agg; the CASE sums are
# map-side partial counts (BIGINT on both engines).

Q12_LATE_DAYS = 60


def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.when(delay > Q12_LATE_DAYS, F.lit("LATE"))
            .otherwise(F.lit("ONTIME"))
            .alias("delay_bucket"),
            high.alias("__high"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.count(F.when(F.col("__high"), 1)).alias("high_line_count"),
            F.count(F.when(~F.col("__high"), 1)).alias("low_line_count"),
        )
    )


LATE_SHIPMENT_PRIORITY_SQL = f"""
    SELECT CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE)) > {Q12_LATE_DAYS}
                THEN 'LATE' ELSE 'ONTIME' END AS delay_bucket,
           count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
"""


# --- Q13 analog: customer order-count distribution --------------------------------
# LEFT OUTER join + double aggregation: orders are filtered INSIDE the
# join (priority <> '5-LOW' standing in for Q13's NOT LIKE comment scan),
# so customers whose every order is filtered out land in the c_count=0
# bin — a plain inner join would silently drop them (the classic Q13
# trap). First agg: per-customer count (shuffles on c_custkey); second:
# the histogram (tiny — at most |distinct counts| rows).


def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


CUSTOMER_ORDER_HISTOGRAM_SQL = """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


# --- Q19 analog: disjunctive predicate revenue ------------------------------------
# Three OR'd (brand, size-range, quantity-range) branches over part ⋈
# lineitem. The point of the shape: Catalyst extracts the common
# join key (equi-join on l_partkey stays a hash join — no nested loop)
# and pushes the per-branch part predicates as ONE disjunctive filter
# into the part scan; the quantity ranges filter the fact scan. Result
# is a single scalar (revenue + matching line count).

Q19_BRANCHES = (
    ("Brand#1", 1, 15, 1, 20),
    ("Brand#2", 10, 30, 10, 30),
    ("Brand#3", 20, 50, 20, 50),
)


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    branch = None
    for brand, s_lo, s_hi, q_lo, q_hi in Q19_BRANCHES:
        term = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        branch = term if branch is None else (branch | term)
    return joined.filter(branch).agg(
        F.sum(_rev()).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


_Q19_PRED = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
    f" AND l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in Q19_BRANCHES
)

DISJUNCTIVE_REVENUE_SQL = f"""
    SELECT CAST(sum({REV_SQL}) AS DOUBLE) AS revenue, count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE {_Q19_PRED}
"""


# --- Q21 analog: suppliers who kept orders waiting ---------------------------------
# The exists/not-exists double correlation, planned as one LEFT SEMI then
# one LEFT ANTI join (never per-row subqueries): count, per supplier, the
# LATE lines (shipped > 90 days after the order date) in multi-supplier
# orders where NO OTHER supplier in the same order was also late — i.e.
# this supplier alone held the order up. Both correlated joins are
# equi-joins on l_orderkey with the supplier-inequality as a residual
# join predicate; the fan-out is bounded by lines-per-order (single
# digits), so the plan scales linearly in |lineitem|. Top-k by
# (numwait DESC, s_name) — s_name is unique, so the k rows are stable.

Q21_LATE_DAYS = 90
Q21_TOP = 10


def waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf_dir, "supplier")
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            > Q21_LATE_DAYS
        ).alias("__late"),
    )
    late = lines.filter(F.col("__late")).select("l_orderkey", "l_suppkey").distinct()
    others = lines.select(
        F.col("l_orderkey").alias("__ok"),
        F.col("l_suppkey").alias("__sk"),
        F.col("__late").alias("__olate"),
    )
    # EXISTS: some other supplier has a line in the same order.
    with_other = late.join(
        others,
        (late.l_orderkey == F.col("__ok")) & (late.l_suppkey != F.col("__sk")),
        "left_semi",
    )
    # NOT EXISTS: no other supplier in the order was also late.
    sole_late = with_other.join(
        others.filter(F.col("__olate")),
        (with_other.l_orderkey == F.col("__ok"))
        & (with_other.l_suppkey != F.col("__sk")),
        "left_anti",
    )
    return (
        sole_late.join(supp, sole_late.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(Q21_TOP)
    )


WAITING_SUPPLIER_SQL = f"""
    WITH lines AS (
        SELECT l_orderkey, l_suppkey,
               datediff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) > {Q21_LATE_DAYS} AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE late)
    SELECT s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM lines l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lines l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT {Q21_TOP}
"""


# --- Q2 analog: minimum-cost supplier per part --------------------------------------
# The correlated MIN subquery, decorrelated Spark-first: the part-supplier
# "offer" relation derives from lineitem (min extended price a supplier
# ever shipped the part at — exact DECIMAL, so cross-engine min/equality
# are exact). The per-part global min is ONE pre-aggregation re-joined on
# p_partkey (never a per-row subquery); ties on the min price resolve to
# the smallest s_suppkey via a second min. Suppliers restricted to one
# region (nation/region broadcast); parts to one size band.

Q2_REGION = "EUROPE"
Q2_SIZE_MIN = 40


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") >= Q2_SIZE_MIN)
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    eu_supp = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    offers = (
        li.join(part, li.l_partkey == part.p_partkey, "left_semi")
        .join(eu_supp.select("s_suppkey"), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_dec("l_extendedprice")).alias("offer_price"))
    )
    best = offers.groupBy("l_partkey").agg(F.min("offer_price").alias("min_price"))
    winner = (
        offers.join(best, "l_partkey")
        .filter(F.col("offer_price") == F.col("min_price"))
        .groupBy("l_partkey", "min_price")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
    )
    return (
        winner.join(eu_supp, F.col("best_suppkey") == eu_supp.s_suppkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("min_price").cast("double").alias("min_price"),
            "s_name",
            F.col("n_name").alias("nation"),
        )
        .orderBy("p_partkey")
    )


MIN_COST_SUPPLIER_SQL = f"""
    WITH eu_supp AS (
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = '{Q2_REGION}'
    ),
    offers AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(l_extendedprice AS DECIMAL(18,2))) AS offer_price
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= {Q2_SIZE_MIN})
          AND l_suppkey IN (SELECT s_suppkey FROM eu_supp)
        GROUP BY 1, 2
    ),
    winner AS (
        SELECT l_partkey, offer_price AS min_price,
               min(l_suppkey) AS best_suppkey
        FROM offers o
        WHERE offer_price = (SELECT min(offer_price) FROM offers i
                             WHERE i.l_partkey = o.l_partkey)
        GROUP BY 1, 2
    )
    SELECT l_partkey AS p_partkey, CAST(min_price AS DOUBLE) AS min_price,
           s_name, n_name AS nation
    FROM winner JOIN eu_supp ON best_suppkey = s_suppkey
    ORDER BY p_partkey
"""


# --- Q11 analog: important parts by supplied value -----------------------------------
# Scalar-subquery HAVING: per-part shipped value from one region's
# suppliers, keeping parts whose value exceeds a multiple of the MEAN
# part value (Q11 scales its fraction by 1/SF for exactly this reason —
# a fixed fraction of total goes vacuous as |part| grows; value > k*mean
# is scale-free). The global (sum, count) is a 1-row aggregate broadcast
# into the comparison (never a collect); the compare is
# value * n_parts > k * total in DECIMAL — exact on both engines, no
# double division.

Q11_REGION = "ASIA"
Q11_MEAN_MULTIPLE = 2  # keep parts with value > 2x the mean part value


def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q11_REGION)
    asia_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    per_part = (
        li.join(asia_supp, li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("__value"))
    )
    total = per_part.agg(
        F.sum("__value").alias("__total"), F.count("*").alias("__n_parts")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("__value") * F.col("__n_parts")
            > F.col("__total") * Q11_MEAN_MULTIPLE
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("__value").cast("double").alias("supplied_value"),
        )
        .orderBy(F.col("supplied_value").desc(), "p_partkey")
    )


IMPORTANT_PARTS_SQL = f"""
    WITH per_part AS (
        SELECT l_partkey, sum({REV_SQL}) AS value
        FROM lineitem
        WHERE l_suppkey IN (
            SELECT s_suppkey FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = '{Q11_REGION}')
        GROUP BY 1
    )
    SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS supplied_value
    FROM per_part
    WHERE value * (SELECT count(*) FROM per_part)
          > (SELECT sum(value) FROM per_part) * {Q11_MEAN_MULTIPLE}
    ORDER BY supplied_value DESC, p_partkey
"""


# --- Q20 analog: suppliers with excess share of a part --------------------------------
# Nested IN-subqueries planned as a semi-join chain: suppliers (in one
# region) who shipped MORE THAN AN EIGHTH of the total shipped quantity
# of some pattern-named part (the testdata spreads parts near-uniformly
# over ~100 suppliers, so Q20's literal >1/2 never fires; 1/8 keeps the
# identical plan shape non-vacuous at every SF). Per-(part, supplier)
# quantity aggregates once over the filtered fact; the per-part total
# reuses the same exchange (same grouping key prefix); the share test is
# integer-exact (8*sup_qty > tot_qty in DECIMAL). Output: the distinct
# qualifying suppliers — a final left-semi into supplier.

Q20_REGION = "ASIA"
Q20_PATTERN = "red"
Q20_SHARE_DENOM = 8  # qualify when sup_qty > tot_qty/8


def excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith(Q20_PATTERN))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q20_REGION)
    scoped = li.join(part, li.l_partkey == part.p_partkey, "left_semi")
    per_ps = scoped.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("sup_qty")
    )
    per_p = per_ps.groupBy("l_partkey").agg(F.sum("sup_qty").alias("tot_qty"))
    dominant = (
        per_ps.join(per_p, "l_partkey")
        .filter(F.col("sup_qty") * Q20_SHARE_DENOM > F.col("tot_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


EXCESS_SHARE_SUPPLIERS_SQL = f"""
    WITH per_ps AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS sup_qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '{Q20_PATTERN}%')
        GROUP BY 1, 2
    )
    SELECT s_suppkey, s_name, n_name AS nation
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = '{Q20_REGION}'
      AND s_suppkey IN (
        SELECT l_suppkey FROM per_ps a
        WHERE sup_qty * {Q20_SHARE_DENOM} > (SELECT sum(sup_qty) FROM per_ps b
                             WHERE b.l_partkey = a.l_partkey))
    ORDER BY s_suppkey
"""
