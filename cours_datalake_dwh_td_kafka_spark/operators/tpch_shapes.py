"""TPC-H-shaped analytics beyond the reference's own notebooks: the
multi-way join/agg plans a user of the reference's batch layer (its
pandas-merge and two-table joins, work/Intro_pySpark.ipynb:1158,
work/analysis_sectors_by_location.ipynb:79) grows into at warehouse
scale. Q1/Q3/Q5 shapes already live in aggregates.py/joins.py; this
module adds the Q4 (EXISTS semi-join), Q7 (nation-pair volume), Q10
(returned-item revenue top-k) and Q14 (conditional revenue share)
shapes, each oracle-paired.

Scale notes (shared by all four):
- every date/flag filter is applied on the scan side of its join, so it
  pushes into the parquet reader (PushedFilters) and prunes before any
  exchange;
- nation/region are fixed-cardinality -> force-broadcast; customer /
  supplier / part scale with the lake -> left to AQE (broadcast while
  they fit, shuffled hash beyond);
- money math follows the repo-wide decimal discipline: exact
  decimal(28,6) sums, ONE rounding at the end, then a double cast —
  identical algebra in the DuckDB oracle so value-hashes match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.relational import dec_sum
from cours_datalake_dwh_td_kafka_spark.registry import register

_Q4_LO, _Q4_HI = "1997-01-01", "1997-04-01"

_LATE_SHIP_SQL = f"""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{_Q4_LO}'
      AND o.o_orderdate <  TIMESTAMP '{_Q4_HI}'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
"""


@register("priority_late_shipments", _LATE_SHIP_SQL)
def q_priority_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority with at least one line shipped
    more than 90 days after the order date (the lake has no
    l_commitdate, so "late" is defined against the order date). The
    EXISTS subquery is a LEFT SEMI join on the order key with the
    inequality as a residual predicate — one shuffle on the key,
    lineitem contributes no payload columns, and duplicate late lines
    per order collapse in the semi-join (no distinct needed)."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _Q4_LO) & (F.col("o_orderdate") < _Q4_HI)
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


_Q7_NATION_A, _Q7_NATION_B = "NATION_1", "NATION_2"

_VOLUME_SHIPPING_SQL = f"""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(CAST(SUM(volume) AS DOUBLE), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               year(l.l_shipdate) AS l_year,
               CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(28,6)) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = '{_Q7_NATION_A}' AND n2.n_name = '{_Q7_NATION_B}')
           OR (n1.n_name = '{_Q7_NATION_B}' AND n2.n_name = '{_Q7_NATION_A}')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@register("volume_shipping", _VOLUME_SHIPPING_SQL)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year. The two-nation disjunction cannot be pushed below the joins
    as-is, so each nation dim is PRE-FILTERED to the two names before
    broadcasting — suppliers/customers outside the pair are dropped at
    their (broadcast) nation join, long before the fact-fact shuffle;
    only the cross-pair residual (A->A / B->B trades) survives to the
    final disjunction filter."""
    pair = [_Q7_NATION_A, _Q7_NATION_B]
    n1 = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(pair))
        .select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(pair))
        .select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dec_sum(vol).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q10_LO, _Q10_HI = "1997-01-01", "1997-04-01"

_RETURNED_REVENUE_SQL = f"""
    SELECT c.c_custkey, c.c_name,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '{_Q10_LO}'
      AND o.o_orderdate <  TIMESTAMP '{_Q10_HI}'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@register("returned_item_revenue", _RETURNED_REVENUE_SQL)
def q_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most revenue in
    one quarter. Both filters (quarter on orders, returnflag on
    lineitem) push into their scans; the top-20 over the rounded
    revenue is TakeOrderedAndProject — no global sort materializes."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _Q10_LO) & (F.col("o_orderdate") < _Q10_HI)
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dec_sum(rev).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q14_LO, _Q14_HI = "1997-09-01", "1997-10-01"

_PROMO_SHARE_SQL = f"""
    SELECT ROUND(
             100.0
             * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                             THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                  AS DECIMAL(28,6))
                             ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(28,6))) AS DOUBLE),
           6) AS promo_share_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '{_Q14_LO}'
      AND l.l_shipdate <  TIMESTAMP '{_Q14_HI}'
"""


@register("promo_revenue_share", _PROMO_SHARE_SQL)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percent of one month's revenue from PROMO-class
    parts. Both revenue sums accumulate exactly in decimal(28,6)
    (order-insensitive), are cast to double, and divide ONCE — IEEE
    double division is engine-deterministic, so the oracle matches to
    the last bit. The month filter prunes lineitem before the part
    join (AQE-planned: part scales with the lake)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _Q14_LO) & (F.col("l_shipdate") < _Q14_HI)
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    zero_dec = F.lit(0).cast("decimal(28,6)")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev_dec).otherwise(zero_dec)
    )
    total = F.sum(rev_dec)
    return li.join(p, F.col("l_partkey") == F.col("p_partkey")).agg(
        F.round(
            F.lit(100.0) * promo.cast("double") / total.cast("double"), 6
        ).alias("promo_share_pct")
    )
