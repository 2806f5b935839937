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
