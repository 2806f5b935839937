"""Join surface: SURVEY.md §2.3 (J1-J7) plus the join types the reference
lacked (anti; right/full come free via how=...).

Scale notes:
- Dimension tables (region/nation/supplier) are broadcast — `F.broadcast`
  pins the hint so a 1000-executor cluster never shuffles the fact side
  for these joins.
- The reference's collect()+isin idiom (work/Projet/preparation_noaa.ipynb:133)
  is replaced by broadcast left-semi joins: same semantics, no driver
  round-trip, no 100-TB scan serialized through the driver.
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key; AQE handles
  skew. At known-heavy scale, pre-bucketing both tables on the key would
  remove the shuffle entirely (see io.write_parquet partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.relational import dec_sum
from cours_datalake_dwh_td_kafka_spark.registry import register


# --------------------------------------------------------------------------
# J1/J2: equi inner join through two broadcast dims + fact aggregation
# (reference: work/Intro_pySpark.ipynb:1158; preparation_noaa.ipynb:397-404)
# --------------------------------------------------------------------------
@register(
    "join_revenue_per_nation",
    """
    SELECT n.n_name,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS total_revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q_join_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum(F.col("o_totalprice")).alias("total_revenue"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# J2: left outer join keeping unmatched rows
# --------------------------------------------------------------------------
@register(
    "join_left_outer",
    """
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           ROUND(CAST(SUM(CAST(COALESCE(o.o_totalprice, 0.0) AS DECIMAL(28,6))) AS DOUBLE), 2) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dec_sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias(
                "total_spent"
            ),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# J6/P10: broadcast left-semi join — the idiomatic replacement for the
# reference's driver-side collect()+isin
# (reference: work/Projet/preparation_noaa.ipynb:133,353)
# --------------------------------------------------------------------------
@register(
    "semi_join",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48
    )
    ORDER BY o_orderkey
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = li.where(F.col("l_quantity") >= 48).select("l_orderkey")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# anti join (not in reference; SURVEY §2.3 notes it comes free)
# --------------------------------------------------------------------------
@register(
    "anti_join",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    ORDER BY c_custkey
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# J4: cross join, small sides only (reference: work/Projet/preparation_noaa.ipynb:528
# — with the explicit "must stay small" caveat; large-scale KNN lives in knn.py)
# --------------------------------------------------------------------------
@register(
    "cross_join_small",
    """
    SELECT n.n_name, r.r_name,
           CAST(n.n_regionkey = r.r_regionkey AS BOOLEAN) AS is_home_region
    FROM nation n
    CROSS JOIN region r
    ORDER BY n.n_name, r.r_name
    """,
)
def q_cross_join_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.crossJoin(F.broadcast(r))
        .select(
            "n_name",
            "r_name",
            (F.col("n_regionkey") == F.col("r_regionkey")).alias("is_home_region"),
        )
        .orderBy("n_name", "r_name")
    )


# --------------------------------------------------------------------------
# J1 self-join (reference: work/Intro_pySpark.ipynb:1158 villes self-join on id)
# --------------------------------------------------------------------------
@register(
    "self_join_pairs",
    """
    SELECT a.c_nationkey, COUNT(*) AS n_pairs
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    GROUP BY a.c_nationkey
    ORDER BY a.c_nationkey
    """,
)
def q_self_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    a = c.alias("a")
    b = c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .groupBy(F.col("a.c_nationkey").alias("c_nationkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# J7: the pandas-merge notebook join, engine-side (activity ⋈ address
# analog: supplier ⋈ nation enrich + counts per nation/region)
# (reference: work/analysis_sectors_by_location.ipynb:79)
# --------------------------------------------------------------------------
@register(
    "join_enrich_counts",
    """
    SELECT r.r_name, n.n_name, COUNT(s.s_suppkey) AS n_suppliers
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name, n.n_name
    """,
)
def q_join_enrich_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
        .orderBy("r_name", "n_name")
    )


# --------------------------------------------------------------------------
# TPC-H-shaped multi-way analytics joins: the fact-fact-dim plans a user
# of the reference's batch layer grows into. Both are oracle-paired.
# --------------------------------------------------------------------------
_Q3_CUTOFF = "1998-07-01"

_SHIP_PRIORITY_SQL = f"""
    SELECT l.l_orderkey,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '{_Q3_CUTOFF}'
      AND l.l_shipdate > TIMESTAMP '{_Q3_CUTOFF}'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
"""


@register("shipping_priority", _SHIP_PRIORITY_SQL)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 not-yet-shipped high-revenue orders in one
    segment. Plan: both date/segment filters push into their scans
    BEFORE the joins; the orders->lineitem fact-fact join shuffles on
    the order key — exactly the key bucketing co-locates at ingest
    (:func:`~..io.write_bucketed`). The top-10 is TakeOrderedAndProject
    on the rounded revenue, not a global sort."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < _Q3_CUTOFF
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > _Q3_CUTOFF
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # customer scales WITH the lake (unlike nation/region), so no forced
    # broadcast hint — AQE broadcasts it while it fits and falls back to
    # a shuffled join when it doesn't; a F.broadcast() here would OOM the
    # build side at full scale
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dec_sum(rev).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


_Q5_YEAR = 1997

_LOCAL_VOLUME_SQL = f"""
    SELECT n.n_name,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '{_Q5_YEAR}-01-01'
      AND o.o_orderdate < TIMESTAMP '{_Q5_YEAR + 1}-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
"""


@register("local_supplier_volume", _LOCAL_VOLUME_SQL)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where the customer bought from
    a LOCAL supplier (c_nationkey == s_nationkey), one region, one year.
    Six-table join: nation/region (fixed cardinality) force-broadcast;
    customer and supplier joins are AQE-planned — broadcast while they
    fit, shuffled hash/sort-merge beyond that; the fact-fact join
    shuffles on the order key. The local-supplier condition rides the
    supplier join, so non-local pairs never reach the aggregate."""
    year_lo, year_hi = f"{_Q5_YEAR}-01-01", f"{_Q5_YEAR + 1}-01-01"
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= year_lo) & (F.col("o_orderdate") < year_hi)
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # forced broadcast ONLY on the fixed-cardinality dims (nation,
    # region); customer/supplier scale with the lake, so AQE picks their
    # strategy — broadcast while small, shuffle when not
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dec_sum(rev).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )
