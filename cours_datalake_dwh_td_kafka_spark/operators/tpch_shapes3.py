"""Third batch of TPC-H-shaped analytics (tpch_shapes.py, tpch_shapes2.py
hold the first two): the six shapes the inventory still lacked — Q2
(min-cost-supplier correlated minimum), Q9 (product-type profit
rollup), Q12 (ship-delay bucket conditional counts), Q16
(distinct-supplier counts with NOT-IN anti-join), Q20 (nested
semi-join supplier promotion) and Q21 (multi-EXISTS blocking-supplier
screen) — adapted to this lake's schema (no partsupp / l_shipmode /
l_commitdate / l_receiptdate; course analog: the multi-table join
exercises of work/Intro_pySpark.ipynb these plans grow out of).

Shared scale discipline (same as the sibling modules):
- scan-side filters below every join; dims broadcast;
- correlated subqueries become aggregate-then-equi-join-back — never a
  per-row scalar subquery, never a global window;
- EXISTS / NOT-IN become leftsemi / leftanti equi-joins;
- money math: exact decimal(28,6) sums, one rounding, then double cast,
  identical algebra in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.relational import dec_sum
from cours_datalake_dwh_td_kafka_spark.registry import register

# ---------------------------------------------------------------------------
# Q2 shape: min-cost supplier per part (correlated MIN -> join-back)
# ---------------------------------------------------------------------------
_Q2_REGION = "EUROPE"
_Q2_TYPE = "LARGE"
_Q2_SIZE = 15

_MIN_COST_SQL = f"""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(FLOOR(l_extendedprice / l_quantity * 100 + 0.5) / 100)
               AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eligible AS (
      SELECT o.l_partkey, o.l_suppkey, o.unit_cost
      FROM offers o
      JOIN supplier s ON o.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = '{_Q2_REGION}'
    ),
    best AS (
      SELECT l_partkey, MIN(unit_cost) AS min_cost
      FROM eligible GROUP BY l_partkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
           e.unit_cost AS min_unit_cost
    FROM eligible e
    JOIN best b ON e.l_partkey = b.l_partkey
              AND e.unit_cost = b.min_cost
    JOIN part p ON e.l_partkey = p.p_partkey
    JOIN supplier s ON e.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = '{_Q2_TYPE}' AND p.p_size >= {_Q2_SIZE}
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
"""


@register("min_cost_supplier", _MIN_COST_SQL)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp: an 'offer' is the min observed unit
    price per supplier-part pair in the fact table): for each in-bracket
    part, the European supplier(s) offering it cheapest. The correlated
    minimum is the classic aggregate-then-JOIN-BACK — per-part min is a
    partial-aggregable groupBy, and the equality join back onto the
    offers recovers the argmin rows without any per-row subquery or
    window. Dims (supplier/nation/region/part) all broadcast; the only
    fact-sized shuffle is the offers aggregation itself."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    # half-up 2dp via FLOOR(x*100 + 0.5)/100 — the same IEEE op
    # sequence on both engines (Spark's ROUND(double) detours through
    # BigDecimal's shortest-decimal representation, DuckDB's doesn't;
    # a quotient can land in the gap between the two)
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.floor(
                F.col("l_extendedprice") / F.col("l_quantity") * 100
                + 0.5
            )
            / 100
        ).alias("unit_cost")
    )
    euro_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name") == _Q2_REGION)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = offers.join(
        F.broadcast(euro_supp),
        offers.l_suppkey == euro_supp.s_suppkey,
    )
    best = eligible.groupBy("l_partkey").agg(
        F.min("unit_cost").alias("min_cost")
    )
    bracket = p.where(
        (F.col("p_type") == _Q2_TYPE) & (F.col("p_size") >= _Q2_SIZE)
    ).select("p_partkey", "p_type")
    return (
        eligible.join(
            # per-part minima are dimension-sized (one row per part) —
            # broadcast the join-back instead of sort-merging offers
            F.broadcast(best.withColumnRenamed("l_partkey", "b_partkey")),
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(F.broadcast(bracket), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("unit_cost").alias("min_unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q9 shape: product-type profit by nation and year
# ---------------------------------------------------------------------------
_Q9_NAME_PART = "bolt"
_Q9_COST_FACTOR = 0.6

_PROFIT_SQL = f"""
    SELECT n.n_name, CAST(YEAR(l.l_shipdate) AS INT) AS o_year,
           ROUND(CAST(SUM(CAST(
               l.l_extendedprice * (1 - l.l_discount)
               - {_Q9_COST_FACTOR} * p.p_retailprice * l.l_quantity
             AS DECIMAL(28,6))) AS DOUBLE), 2) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%{_Q9_NAME_PART}%'
    GROUP BY n.n_name, YEAR(l.l_shipdate)
    ORDER BY n.n_name, o_year DESC
"""


@register("product_type_profit", _PROFIT_SQL)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no ps_supplycost: unit cost modeled as a fixed
    fraction of p_retailprice): profit on one product family by
    supplier nation and ship year. Star shape — the fact table joins
    three BROADCAST dims (part pre-filtered by the LIKE before the
    join, so the build side is the surviving bracket only), then one
    partial-aggregable rollup. The LIKE filter itself cannot push to
    parquet as a range, but it prunes the BUILD side, and the join then
    prunes fact rows before the aggregation exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like(f"%{_Q9_NAME_PART}%")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(_Q9_COST_FACTOR) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            "n_name", F.year("l_shipdate").cast("int").alias("o_year")
        )
        .agg(dec_sum(profit).alias("profit"))
        .orderBy("n_name", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q12 shape: ship-delay buckets x order-priority conditional counts
# ---------------------------------------------------------------------------
_DELAY_SQL = """
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
                THEN '0-30'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 90
                THEN '31-90'
                ELSE '90+' END AS delay_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1 ORDER BY delay_bucket
"""


@register("shipping_delay_buckets", _DELAY_SQL)
def q_shipping_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no l_shipmode/l_commitdate: the mode column
    becomes an order-to-ship delay bucket): line counts per delay
    bucket split into high/low order priority — the canonical
    conditional-aggregation-after-join. One fact-fact equi-join on the
    order key (both sides bucket-ready; AQE handles the shuffle), then
    a 3-group rollup whose CASE counts partial-aggregate map-side."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff("l_shipdate", "o_orderdate")
    bucket = (
        F.when(delay <= 30, "0-30")
        .when(delay <= 90, "31-90")
        .otherwise("90+")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


# ---------------------------------------------------------------------------
# Q16 shape: distinct-supplier counts per part bracket, NOT-IN anti-join
# ---------------------------------------------------------------------------
_Q16_BRAND = "Brand#1"

_PART_SUPP_SQL = f"""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> '{_Q16_BRAND}'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register("part_supplier_counts", _PART_SUPP_SQL)
def q_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supply relationships observed from the fact
    table; the complaints NOT-IN becomes a negative-balance supplier
    exclusion): how many distinct suppliers serve each surviving
    (brand, type, size) bracket. The NOT IN is a broadcast LEFT ANTI
    equi-join — never a per-row membership probe — and the part bracket
    broadcasts pre-filtered. COUNT(DISTINCT) partial-aggregates via
    Spark's two-phase distinct expansion on the (brand,type,size) key."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != _Q16_BRAND)
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(
            F.broadcast(bad_supp),
            li.l_suppkey == bad_supp.s_suppkey,
            "leftanti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 shape: nested semi-joins — suppliers who moved real volume of a
# part family in a year
# ---------------------------------------------------------------------------
_Q20_NAME_PART = "red"
_Q20_YEAR = "1997"
_Q20_MIN_QTY = 50.0

_PROMO_SUPP_SQL = f"""
    WITH family AS (
      SELECT p_partkey FROM part WHERE p_name LIKE '{_Q20_NAME_PART}%'
    ),
    volume AS (
      SELECT l_suppkey,
             ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)))
                   AS DOUBLE), 2) AS family_qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM family)
        AND l_shipdate >= TIMESTAMP '{_Q20_YEAR}-01-01'
        AND l_shipdate <  TIMESTAMP '{int(_Q20_YEAR) + 1}-01-01'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > {_Q20_MIN_QTY}
    )
    SELECT s.s_name, n.n_name, v.family_qty
    FROM volume v
    JOIN supplier s ON v.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY s.s_name
"""


@register("promotion_candidate_suppliers", _PROMO_SUPP_SQL)
def q_promotion_candidate_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape (no partsupp availqty: the excess-stock predicate
    becomes a minimum shipped volume): suppliers who moved more than a
    threshold quantity of one part family in one year. The IN-subquery
    chain is two broadcast joins deep: part family -> LEFT SEMI into
    the (scan-pruned) year of lineitem -> per-supplier exact-decimal
    volume -> HAVING -> broadcast supplier/nation decoration. No
    subquery re-execution anywhere; the date range prunes at the
    parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    family = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like(f"{_Q20_NAME_PART}%")
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    qty_dec = F.sum(F.col("l_quantity").cast("decimal(28,6)"))
    volume = (
        li.where(
            (F.col("l_shipdate") >= f"{_Q20_YEAR}-01-01")
            & (F.col("l_shipdate") < f"{int(_Q20_YEAR) + 1}-01-01")
        )
        .join(
            F.broadcast(family),
            F.col("l_partkey") == F.col("p_partkey"),
            "leftsemi",
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(qty_dec.cast("double"), 2).alias("family_qty"),
            qty_dec.alias("_qty_exact"),
        )
        .where(F.col("_qty_exact") > _Q20_MIN_QTY)
    )
    return (
        volume.join(F.broadcast(s), volume.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name", "family_qty")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q21 shape: multi-EXISTS — the sole supplier who held up a multi-
# supplier order
# ---------------------------------------------------------------------------
_Q21_MIN_DELAY_DAYS = 60
_Q21_TOP = 20

_BLOCKING_SQL = f"""
    WITH marks AS (
      SELECT l_orderkey,
             MAX(l_shipdate) AS omax,
             COUNT(DISTINCT l_suppkey) AS n_supp
      FROM lineitem GROUP BY l_orderkey
    ),
    finals AS (
      SELECT l.l_orderkey, l.l_suppkey, m.omax, m.n_supp
      FROM lineitem l
      JOIN marks m ON l.l_orderkey = m.l_orderkey
                  AND l.l_shipdate = m.omax
      GROUP BY l.l_orderkey, l.l_suppkey, m.omax, m.n_supp
    ),
    blocking AS (
      SELECT f.l_orderkey, f.l_suppkey
      FROM finals f
      JOIN orders o ON f.l_orderkey = o.o_orderkey
      WHERE f.n_supp > 1
        AND o.o_orderstatus = 'F'
        AND date_diff('day', o.o_orderdate, f.omax)
              > {_Q21_MIN_DELAY_DAYS}
      QUALIFY COUNT(*) OVER (PARTITION BY f.l_orderkey) = 1
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM blocking b JOIN supplier s ON b.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT {_Q21_TOP}
"""


@register("blocking_suppliers", _BLOCKING_SQL)
def q_blocking_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (ship delay vs o_orderdate stands in for the
    missing receipt/commit dates): suppliers who were the SOLE supplier
    still shipping at a late multi-supplier order's final ship date —
    EXISTS (another supplier on the order) + NOT EXISTS (another
    supplier equally late) both collapse into per-order aggregates
    (supplier count, max ship date, count of suppliers at the max)
    joined back on the order key. Plan: two fact-key aggregations and
    two equi-joins, supplier/orders dims broadcast where small; no
    correlated re-scan of lineitem per order (the textbook Q21 trap)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    s = load_table(spark, sf_dir, "supplier")
    marks = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("omax"),
        F.count_distinct("l_suppkey").alias("n_supp"),
    )
    finals = (
        li.join(
            marks.withColumnRenamed("l_orderkey", "m_orderkey"),
            (F.col("l_orderkey") == F.col("m_orderkey"))
            & (F.col("l_shipdate") == F.col("omax")),
        )
        .groupBy("l_orderkey", "l_suppkey", "omax", "n_supp")
        .agg(F.lit(1).alias("_one"))
    )
    # suppliers at the max per order — the NOT-EXISTS collapses into
    # "exactly one supplier achieved omax"
    at_max = finals.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_at_max")
    ).withColumnRenamed("l_orderkey", "a_orderkey")
    blocking = (
        finals.where(F.col("n_supp") > 1)
        .join(at_max, F.col("l_orderkey") == F.col("a_orderkey"))
        .where(F.col("n_at_max") == 1)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .where(
            (F.col("o_orderstatus") == "F")
            & (
                F.datediff("omax", "o_orderdate")
                > _Q21_MIN_DELAY_DAYS
            )
        )
        .select("l_orderkey", "l_suppkey")
    )
    return (
        blocking.join(F.broadcast(s), blocking.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(_Q21_TOP)
    )
