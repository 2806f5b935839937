"""Projections, filters, set ops, sorts, sampling, scalar-function layer.

Covers SURVEY.md §2.2 (P1-P14), §2.6 (O1-O4), §2.7 (U1-U3) and the scalar
function surface §2.8 (F1-F16). Each query has a DuckDB oracle; columns are
aliased identically on both sides.

Scale notes: all of these are narrow map-side transformations (no shuffle)
except the set ops and ORDER BY, which Catalyst plans as exchanges only at
the final output step. Filters and projections are expressed declaratively
so they reach the parquet scan as PushedFilters/ReadSchema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.registry import register


def dec_avg(col: Column, count: Column, scale: int = 6) -> Column:
    """Exact decimal sum -> double division -> round: deterministic across
    engines regardless of partial-aggregation order."""
    return F.round(F.sum(col.cast("decimal(28,6)")).cast("double") / count, scale)


def dec_sum(col: Column, scale: int = 2) -> Column:
    """Order-insensitive exact sum of fixed-point-ish doubles."""
    return F.round(F.sum(col.cast("decimal(28,6)")).cast("double"), scale)


# --------------------------------------------------------------------------
# P1/P6/P8/P11: projection + conjunctive range predicate
# (reference: work/Projet/preparation_noaa.ipynb:127-130 bbox filter)
# --------------------------------------------------------------------------
@register(
    "filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           ROUND(l_extendedprice * (1 - l_discount), 2) AS net_price
    FROM lineitem
    WHERE l_quantity > 30
      AND l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate < TIMESTAMP '1995-01-01'
      AND l_returnflag <> 'A'
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_quantity") > 30)
            & (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_returnflag") != "A")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "net_price"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# P7: SQL-string predicate (reference: work/Intro_pySpark.ipynb:907)
# --------------------------------------------------------------------------
@register(
    "where_sql_string",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal >= 0
    ORDER BY c_custkey
    """,
)
def q_where_sql_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.where("c_mktsegment = 'BUILDING' AND c_acctbal >= 0")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# P9: disjunctive predicate (reference: work/anomaly_detector.py:39-41)
# --------------------------------------------------------------------------
@register(
    "boolean_disjunction",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F' OR o_totalprice > 300000
    ORDER BY o_orderkey
    """,
)
def q_boolean_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 300000))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# P12: null handling — nullif/coalesce/na.drop surface
# (reference: work/TD_pySpark.ipynb:118-120, analysis_sectors_by_location.ipynb:82)
# --------------------------------------------------------------------------
@register(
    "null_handling",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(NULLIF(l_discount, 0.0)) AS n_discounted,
           ROUND(CAST(SUM(CAST(COALESCE(NULLIF(l_discount, 0.0), 0.0)
                    AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS avg_discount
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(d_null).alias("n_discounted"),
            dec_avg(F.coalesce(d_null, F.lit(0.0)), F.count(F.lit(1))).alias(
                "avg_discount"
            ),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# P14: seeded row sampling (reference: work/Intro_pySpark.ipynb:813).
# Spark's Bernoulli sampler draws an engine-specific random stream, so
# the MEMBERSHIP can't be value-oracled — but its CONTRACT can (round-8
# verdict #7, the approx_quantiles pattern): the query emits a
# guarantees row whose booleans are measured on the actual sample, and
# the oracle states the population count plus the always-true contract.
# --------------------------------------------------------------------------
SAMPLE_FRACTION = 0.1

_SAMPLING_SQL = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pop,
           TRUE AS subset_ok,
           TRUE AS fraction_within_4sigma,
           TRUE AS no_duplicates,
           TRUE AS seed_deterministic
    FROM customer
"""


@register("sampling", _SAMPLING_SQL)
def q_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14 as a value-hashed guarantees row. The sample itself is drawn
    (same call as the reference's df.sample(0.1, seed)), and the row
    attests, measured on the real draw:

    - ``subset_ok``: sample ANTI-JOIN population is empty;
    - ``fraction_within_4sigma``: |n_sampled - f*N| <= 4*sqrt(N*f*(1-f))
      — the binomial concentration bound a Bernoulli sampler must obey
      (4 sigma: false-alarm probability < 1e-4, deterministic in
      practice for a fixed seed);
    - ``no_duplicates``: Bernoulli sampling is without replacement;
    - ``seed_deterministic``: re-drawing with the same seed yields the
      SAME multiset (exceptAll empty both ways) — the property that
      makes seeded sampling reproducible at all.

    The deterministic value-checkable twin of the membership itself is
    ``hash_sample`` below."""
    import math

    c = load_table(spark, sf_dir, "customer")
    keys = c.select("c_custkey")
    s1 = keys.sample(fraction=SAMPLE_FRACTION, seed=42)
    s2 = keys.sample(fraction=SAMPLE_FRACTION, seed=42)
    from cours_datalake_dwh_td_kafka_spark.operators.attest import (
        multiset_eq,
        parallel_vals,
    )

    # five independent read-only actions (sample is seed-deterministic);
    # determinism is one signed-tag action instead of two exceptAlls
    n_pop, n_s, anti_cnt, n_distinct, deterministic = parallel_vals(
        lambda: keys.count(),
        lambda: s1.count(),
        lambda: s1.join(keys, "c_custkey", "left_anti").count(),
        lambda: s1.distinct().count(),
        lambda: multiset_eq(s1, s2),
    )
    bound = 4.0 * math.sqrt(n_pop * SAMPLE_FRACTION * (1 - SAMPLE_FRACTION))
    return spark.createDataFrame(
        [
            (
                int(n_pop),
                anti_cnt == 0,
                abs(n_s - SAMPLE_FRACTION * n_pop) <= bound,
                n_distinct == n_s,
                bool(deterministic),
            )
        ],
        "n_pop BIGINT, subset_ok BOOLEAN, fraction_within_4sigma BOOLEAN, "
        "no_duplicates BOOLEAN, seed_deterministic BOOLEAN",
    )


# --------------------------------------------------------------------------
# deterministic hash sample: the value-checkable twin of `sampling`.
# --------------------------------------------------------------------------
HASH_SAMPLE_PCT = 10


def _hash_sample_sql() -> str:
    from cours_datalake_dwh_td_kafka_spark.operators.dedup import HASH32_SQL

    h = HASH32_SQL.format(c="CAST(c_custkey AS VARCHAR)")
    return f"""
    SELECT c_custkey, c_name
    FROM customer
    WHERE ({h}) % 100 < {HASH_SAMPLE_PCT}
    ORDER BY c_custkey
    """


@register("hash_sample", _hash_sample_sql())
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% sample selected by a content hash of the key instead of an
    RNG: md5-derived hash32(key) % 100 < pct. Unlike the seeded
    Bernoulli sampler (engine-specific stream of draws -> rows-only
    driver check), the hash sample is a pure per-row predicate —
    reproducible across engines, runs, partitionings, AND dataset
    versions (a key keeps its in/out fate as the corpus grows — exactly
    what held-out eval splits need). Pushed to the scan like any
    filter; no shuffle."""
    from cours_datalake_dwh_td_kafka_spark.operators.dedup import (
        _HASH32_SPARK,
    )

    c = load_table(spark, sf_dir, "customer")
    h = _HASH32_SPARK(F.col("c_custkey").cast("string"))
    return (
        c.where(h % 100 < HASH_SAMPLE_PCT)
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# O1/O4: multi-column sort + top-k. Catalyst plans limit+sort as
# TakeOrderedAndProject — no global sort materialization.
# --------------------------------------------------------------------------
@register(
    "orderby_limit_topk",
    """
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 10
    """,
)
def q_orderby_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# U1/U2: unionByName + exceptAll (reference: work/Intro_pySpark.ipynb:841,1187)
# --------------------------------------------------------------------------
@register(
    "union_except",
    """
    SELECT * FROM (
      SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 13
      UNION ALL
      SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey >= 7
    )
    EXCEPT ALL
    SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey = 9
    ORDER BY c_custkey
    """,
)
def q_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    lo = c.where(F.col("c_nationkey") < 13)
    hi = c.where(F.col("c_nationkey") >= 7)
    nine = c.where(F.col("c_nationkey") == 9)
    return lo.unionByName(hi).exceptAll(nine).orderBy("c_custkey")


# --------------------------------------------------------------------------
# U-family completion: intersectAll (absent from the reference; engine
# surface). Customers ordered in BOTH halves of the date range.
# --------------------------------------------------------------------------
@register(
    "intersect_customers",
    """
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    ORDER BY o_custkey
    """,
)
def q_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cut = "1998-01-01"
    early = o.where(F.col("o_orderdate") < cut).select("o_custkey")
    late = o.where(F.col("o_orderdate") >= cut).select("o_custkey")
    return early.intersectAll(late).orderBy("o_custkey")


# --------------------------------------------------------------------------
# A7: distinct rows (reference: work/Projet/preparation_noaa.ipynb:520-522)
# --------------------------------------------------------------------------
@register(
    "distinct_rows",
    """
    SELECT DISTINCT c_nationkey, c_mktsegment
    FROM customer
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_nationkey", "c_mktsegment")
        .distinct()
        .orderBy("c_nationkey", "c_mktsegment")
    )


# --------------------------------------------------------------------------
# F4/F8/F9/F10/F16: scalar string/date/math layer, all JVM-side expressions
# (reference: work/batch_profiling_enriched.py:20, preparation_noaa.ipynb:118)
# --------------------------------------------------------------------------
@register(
    "scalar_functions",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           upper(o_orderpriority) AS priority_uc,
           concat(trim(o_orderstatus), '-', CAST(o_custkey AS VARCHAR)) AS status_key,
           substr(o_orderpriority, 1, 1) AS prio_code,
           abs(o_totalprice - 150000.0) AS price_dev,
           ROUND(o_totalprice * 9 / 5 + 32, 2) AS price_f
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.upper("o_orderpriority").alias("priority_uc"),
            F.concat(
                F.trim(F.col("o_orderstatus")),
                F.lit("-"),
                F.col("o_custkey").cast("string"),
            ).alias("status_key"),
            F.substring("o_orderpriority", 1, 1).alias("prio_code"),
            F.abs(F.col("o_totalprice") - 150000.0).alias("price_dev"),
            F.round(F.col("o_totalprice") * 9 / 5 + 32, 2).alias("price_f"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# S20/§3.3: SQL-string entry over temp views
# (reference: work/Projet_Spark_Analyse_Climatique.ipynb:199-200)
# --------------------------------------------------------------------------
_SQL_ENTRY = """
SELECT n.n_name, COUNT(*) AS n_customers,
       ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE), 2) AS total_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register("sql_entry", _SQL_ENTRY)
def q_sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_ENTRY)


# --------------------------------------------------------------------------
# F13: haversine distance as a native expression — the reference wrapped
# this exact formula in a Python UDF (work/Projet/preparation_noaa.ipynb:489-506);
# native trig keeps it inside WholeStageCodegen.
# --------------------------------------------------------------------------

def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.pow(F.sin(dlon / 2), 2)
    return 2 * 6371.0 * F.asin(F.sqrt(a))


HAVERSINE_SQL = (
    "2 * 6371.0 * asin(sqrt("
    "pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) "
    "+ cos(radians({lat1})) * cos(radians({lat2})) "
    "* pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
)

_HAVERSINE_ORACLE = f"""
    SELECT c_custkey,
           ROUND({HAVERSINE_SQL.format(
               lat1="c_custkey % 90 - 45",
               lon1="c_custkey % 180 - 90",
               lat2="c_nationkey * 3.0 - 37.5",
               lon2="c_nationkey * 7.0 - 87.5",
           )}, 4) AS dist_km
    FROM customer
    ORDER BY c_custkey
"""


@register("haversine_distance", _HAVERSINE_ORACLE)
def q_haversine_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    lat1 = F.col("c_custkey") % 90 - 45
    lon1 = F.col("c_custkey") % 180 - 90
    lat2 = F.col("c_nationkey") * 3.0 - 37.5
    lon2 = F.col("c_nationkey") * 7.0 - 87.5
    return c.select(
        "c_custkey",
        F.round(haversine_km(lat1, lon1, lat2, lon2), 4).alias("dist_km"),
    ).orderBy("c_custkey")


# --------------------------------------------------------------------------
# F1: when/otherwise 3-level banding (reference: work/spark_processor.py:31-38,
# thresholds 10/20 wind and 25/35 heat)
# --------------------------------------------------------------------------

def band3(col: Column, t1: float, t2: float) -> Column:
    """Reference alert banding: < t1 -> level_0, <= t2 -> level_1, else level_2."""
    return (
        F.when(col < t1, F.lit("level_0"))
        .when(col <= t2, F.lit("level_1"))
        .otherwise(F.lit("level_2"))
    )


@register(
    "alert_banding",
    """
    SELECT
      CASE WHEN value < 10 THEN 'level_0'
           WHEN value <= 20 THEN 'level_1'
           ELSE 'level_2' END AS wind_alert_level,
      CASE WHEN value * 0.1 < 25 THEN 'level_0'
           WHEN value * 0.1 <= 35 THEN 'level_1'
           ELSE 'level_2' END AS heat_alert_level,
      COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_alert_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            band3(F.col("value"), 10, 20).alias("wind_alert_level"),
            band3(F.col("value") * 0.1, 25, 35).alias("heat_alert_level"),
        )
        .groupBy("wind_alert_level", "heat_alert_level")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("wind_alert_level", "heat_alert_level")
    )


# --------------------------------------------------------------------------
# F2/F3: JSON parse of the props payload (reference: work/spark_processor.py:26-28
# from_json over Kafka values)
# --------------------------------------------------------------------------
@register(
    "json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.from_json(F.col("props"), "k BIGINT").getField("k").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# F11: explode of parallel arrays (reference: work/batch_records.py:15
# explode(arrays_zip(time, temperature))) — here over the embedding arrays.
# --------------------------------------------------------------------------
@register(
    "explode_array",
    """
    SELECT vec_id,
           ROUND(SUM(e), 6) AS vec_sum,
           COUNT(*) AS dim
    FROM (SELECT vec_id, UNNEST(embedding) AS e FROM embeddings)
    GROUP BY vec_id
    ORDER BY vec_id
    """,
)
def q_explode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", F.explode("embedding").alias("e"))
        .groupBy("vec_id")
        .agg(
            F.round(F.sum("e"), 6).alias("vec_sum"),
            F.count(F.lit(1)).alias("dim"),
        )
        .orderBy("vec_id")
    )
