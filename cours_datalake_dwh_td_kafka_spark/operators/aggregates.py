"""Aggregation surface: SURVEY.md §2.4 (A1-A17).

All aggregates are expressed as declarative groupBy/agg so Spark plans
partial (map-side) + final hash aggregation — at 100 TB the partial agg is
what keeps the shuffle small. Float sums/averages go through exact decimal
accumulation (see relational.dec_avg) for oracle determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.relational import dec_avg, dec_sum
from cours_datalake_dwh_td_kafka_spark.registry import register


# --------------------------------------------------------------------------
# A3/A4/A5: the headline multi-aggregate — TPC-H Q1-shaped pricing summary
# (reference analog: monthly profiling work/batch_profiling_enriched.py:22-27)
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_base_price,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum(F.col("l_quantity")).alias("sum_qty"),
            dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            dec_sum(disc_price).alias("sum_disc_price"),
            dec_sum(charge).alias("sum_charge"),
            dec_avg(F.col("l_quantity"), n).alias("avg_qty"),
            dec_avg(F.col("l_extendedprice"), n).alias("avg_price"),
            dec_avg(F.col("l_discount"), n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# A1: global aggregate, dict-form agg (reference: work/Intro_pySpark.ipynb:561)
# --------------------------------------------------------------------------
@register(
    "global_agg",
    """
    SELECT ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS avg_quantity,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
)
def q_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        dec_avg(F.col("l_quantity"), F.count(F.lit(1))).alias("avg_quantity"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# A2: group-by single key, min/max of a timestamp
# (reference: work/TD_pySpark.ipynb:156-163)
# --------------------------------------------------------------------------
@register(
    "group_minmax",
    """
    SELECT o_orderstatus,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q_group_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# A3: composite grouping key (reference: work/TD_pySpark.ipynb:206-212)
# --------------------------------------------------------------------------
@register(
    "composite_key_agg",
    """
    SELECT user_id, event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS avg_value
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
)
def q_composite_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_avg(F.col("value"), F.count(F.lit(1))).alias("avg_value"),
        )
        .orderBy("user_id", "event_type")
    )


# --------------------------------------------------------------------------
# A5/A17: conditional count + alert probability
# (reference: work/spark_windowed_aggregation.py:39-40; KAFKA exos §11)
# --------------------------------------------------------------------------
@register(
    "conditional_agg",
    """
    SELECT event_type,
           COUNT(CASE WHEN value > 100 THEN 1 END) AS n_high,
           COUNT(CASE WHEN value <= 100 THEN 1 END) AS n_low,
           ROUND(CAST(SUM(CASE WHEN value > 150 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS alert_probability
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.when(F.col("value") > 100, 1)).alias("n_high"),
            F.count(F.when(F.col("value") <= 100, 1)).alias("n_low"),
            F.round(
                F.sum(F.when(F.col("value") > 150, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("alert_probability"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# A6: exact distinct count (reference: work/TD_pySpark.ipynb:98). The scale
# path for 100 TB is approx_count_distinct (HLL) — engine exposes both; the
# approximate one is engine-specific so it gets a separate rows-only query.
# --------------------------------------------------------------------------
@register(
    "distinct_count",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


#: HLL++ relative standard deviation; the bound below allows 3 sigma
_HLL_RSD = 0.02


@register(
    "approx_distinct_count",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users_exact,
           TRUE AS within_3rsd
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_approx_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-based distinct (reference analog: approxQuantile speed/accuracy
    trade, work/Intro_pySpark.ipynb:594-643). The sketch estimate is
    engine-specific, so the DRIVER-CHECKED columns are the exact distinct
    count plus ``within_3rsd`` = |approx - exact| <= 3*rsd*exact; the
    oracle asserts within_3rsd = TRUE, so an HLL estimate outside its
    3-sigma envelope fails the value hash. (Measured error on the lake:
    0.4% at sf0.1 against the 6% bound; HLL is deterministic for fixed
    data, so this is a stable check, not a flaky one.)"""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users_exact"),
            F.approx_count_distinct("user_id", rsd=_HLL_RSD).alias("_a"),
        )
        .select(
            "event_type",
            "n_users_exact",
            (
                F.abs(F.col("_a") - F.col("n_users_exact"))
                <= 3 * _HLL_RSD * F.col("n_users_exact")
            ).alias("within_3rsd"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# A8/A15: exact interpolated percentiles — Spark `percentile` and DuckDB
# `quantile_cont` share the interpolation formula
# (reference: work/Intro_pySpark.ipynb:594 approxQuantile; KAFKA exos §12 median/q25/q75)
# --------------------------------------------------------------------------
@register(
    "quantiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 6) AS q25,
           ROUND(quantile_cont(l_quantity, 0.50), 6) AS median,
           ROUND(quantile_cont(l_quantity, 0.75), 6) AS q75
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.25)), 6).alias("q25"),
            F.round(F.percentile("l_quantity", F.lit(0.50)), 6).alias("median"),
            F.round(F.percentile("l_quantity", F.lit(0.75)), 6).alias("q75"),
        )
        .orderBy("l_returnflag")
    )


#: GK sketch accuracy parameter -> rank error eps = 1/_GK_ACCURACY
_GK_ACCURACY = 100
_APPROX_PS = (0.25, 0.5, 0.75)

_APPROX_Q_SQL = " UNION ALL ".join(
    f"""
    SELECT l_returnflag, CAST({p} AS DOUBLE) AS p,
           ROUND(quantile_cont(l_quantity, {p}), 6) AS exact_q,
           TRUE AS within_eps
    FROM lineitem GROUP BY l_returnflag
    """
    for p in _APPROX_PS
) + " ORDER BY l_returnflag, p"


@register("approx_quantiles", _APPROX_Q_SQL)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path (Greenwald-Khanna sketch, distributed mergeable) —
    reference used approxQuantile with tunable eps
    (work/Intro_pySpark.ipynb:594,609,643). The sketch value itself is
    engine-specific, so the DRIVER-CHECKED columns are the exact
    interpolated percentile plus ``within_eps``: the GK guarantee is that
    the approx value's RANK is within eps*n of p*n (eps = 1/accuracy), so
    its VALUE must lie between the exact percentiles at p -/+ 2*eps (the
    doubled margin absorbs interpolation at the bracket points). The
    oracle asserts the same columns with within_eps = TRUE — an
    out-of-bound sketch flips the boolean and fails the value hash.

    Output is SCALAR-shaped — one row per (group, p), no array cells
    (the driver canonicalizer hashes cell values)."""
    eps = 1.0 / _GK_ACCURACY
    ps = list(_APPROX_PS)
    lo = [max(0.0, p - 2 * eps) for p in ps]
    hi = [min(1.0, p + 2 * eps) for p in ps]
    arr = lambda xs: F.array(*[F.lit(x) for x in xs])  # noqa: E731
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", arr(ps), _GK_ACCURACY).alias("qa"),
        F.percentile("l_quantity", arr(ps)).alias("qe"),
        F.percentile("l_quantity", arr(lo)).alias("qlo"),
        F.percentile("l_quantity", arr(hi)).alias("qhi"),
    )
    return (
        agg.select(
            "l_returnflag",
            F.posexplode(arr(ps)).alias("i", "p"),
            "qa",
            "qe",
            "qlo",
            "qhi",
        )
        .select(
            "l_returnflag",
            "p",
            F.round(F.col("qe")[F.col("i")], 6).alias("exact_q"),
            (
                (F.col("qa")[F.col("i")] >= F.col("qlo")[F.col("i")])
                & (F.col("qa")[F.col("i")] <= F.col("qhi")[F.col("i")])
            ).alias("within_eps"),
        )
        .orderBy("l_returnflag", "p")
    )


# --------------------------------------------------------------------------
# A9/A10: correlation & covariance (reference: work/Intro_pySpark.ipynb:751,783)
# --------------------------------------------------------------------------
@register(
    "corr_cov",
    """
    SELECT ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_cov,
           ROUND(stddev_samp(l_quantity), 6) AS qty_stddev
    FROM lineitem
    """,
)
def q_corr_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_cov"
        ),
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
    )


# --------------------------------------------------------------------------
# A11/A12: describe/summary as a typed aggregate (reference:
# work/Intro_pySpark.ipynb:959,1101 — df.describe returns strings; the
# engine's typed profile keeps doubles so it is oracle-checkable)
# --------------------------------------------------------------------------
@register(
    "describe_profile",
    """
    SELECT COUNT(c_acctbal) AS count,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / COUNT(c_acctbal), 6) AS mean,
           ROUND(stddev_samp(c_acctbal), 6) AS stddev,
           MIN(c_acctbal) AS min,
           ROUND(quantile_cont(c_acctbal, 0.25), 6) AS q25,
           ROUND(quantile_cont(c_acctbal, 0.50), 6) AS median,
           ROUND(quantile_cont(c_acctbal, 0.75), 6) AS q75,
           MAX(c_acctbal) AS max
    FROM customer
    """,
)
def q_describe_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.agg(
        F.count("c_acctbal").alias("count"),
        dec_avg(F.col("c_acctbal"), F.count("c_acctbal")).alias("mean"),
        F.round(F.stddev_samp("c_acctbal"), 6).alias("stddev"),
        F.min("c_acctbal").alias("min"),
        F.round(F.percentile("c_acctbal", F.lit(0.25)), 6).alias("q25"),
        F.round(F.percentile("c_acctbal", F.lit(0.50)), 6).alias("median"),
        F.round(F.percentile("c_acctbal", F.lit(0.75)), 6).alias("q75"),
        F.max("c_acctbal").alias("max"),
    )


# --------------------------------------------------------------------------
# A13: top-k frequency (reference: work/analysis_sectors_by_location.ipynb:100-105
# value_counts().head(10); KAFKA exos §8 most-frequent per country)
# --------------------------------------------------------------------------
@register(
    "top_k_frequency",
    """
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    GROUP BY p_brand
    ORDER BY n_parts DESC, p_brand
    LIMIT 10
    """,
)
def q_top_k_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy(F.desc("n_parts"), F.asc("p_brand"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# A14: yearly average (reference: work/Projet_Spark_Analyse_Climatique.ipynb:167)
# --------------------------------------------------------------------------
@register(
    "yearly_avg",
    """
    SELECT year(o_orderdate) AS order_year,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY year(o_orderdate)
    ORDER BY order_year
    """,
)
def q_yearly_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            dec_avg(F.col("o_totalprice"), F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("order_year")
    )


# --------------------------------------------------------------------------
# A16: completeness / validity audit (KAFKA exos §12: month coverage,
# missing values, realistic ranges)
# --------------------------------------------------------------------------
@register(
    "validity_audit",
    """
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT(value) AS n_missing_value,
           COUNT(CASE WHEN value < 0 OR value > 400 THEN 1 END) AS n_out_of_range,
           COUNT(DISTINCT CAST(ts AS DATE)) AS n_days_covered,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) = 30 AS BOOLEAN) AS full_coverage
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_validity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    n_days = F.countDistinct(F.col("ts").cast("date"))
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count("value")).alias("n_missing_value"),
            F.count(F.when((F.col("value") < 0) | (F.col("value") > 400), 1)).alias(
                "n_out_of_range"
            ),
            n_days.alias("n_days_covered"),
            (n_days == 30).alias("full_coverage"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# grouping-sets surface (not in reference; SURVEY §2.4 notes built-in
# cube/rollup) — rollup over nation/segment with grouping id
# --------------------------------------------------------------------------
@register(
    "rollup_agg",
    """
    SELECT c_nationkey, c_mktsegment,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE), 2) AS total_balance
    FROM customer
    GROUP BY ROLLUP (c_nationkey, c_mktsegment)
    ORDER BY c_nationkey NULLS FIRST, c_mktsegment NULLS FIRST
    """,
)
def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.rollup("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum(F.col("c_acctbal")).alias("total_balance"),
        )
        .orderBy(
            F.col("c_nationkey").asc_nulls_first(),
            F.col("c_mktsegment").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# histogram: fixed-width value binning (the profiling primitive behind
# every dashboard distribution plot; reference analog: the describe/
# summary profiling surface, work/Intro_pySpark.ipynb:959,244)
# --------------------------------------------------------------------------
_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 200.0, 20

_HIST_BUCKET_SQL = (
    f"CASE WHEN value < {_HIST_LO} THEN 0 "
    f"WHEN value >= {_HIST_HI} THEN {_HIST_BINS + 1} "
    f"ELSE CAST(floor((value - {_HIST_LO}) * {_HIST_BINS} "
    f"/ ({_HIST_HI} - {_HIST_LO})) AS BIGINT) + 1 END"
)

_HIST_SQL = f"""
    SELECT CAST({_HIST_BUCKET_SQL} AS BIGINT) AS bin,
           COUNT(*) AS n,
           ROUND(MIN(value), 6) AS lo_val,
           ROUND(MAX(value), 6) AS hi_val
    FROM events
    WHERE value IS NOT NULL
    GROUP BY bin
    ORDER BY bin
"""


@register("value_histogram", _HIST_SQL)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of events.value — one hash aggregate on the
    bin id (bins+2 groups: 0 = below range, bins+1 = above), no sort
    until the final tiny ORDER BY. The map-side combine reduces each
    partition to at most bins+2 rows, so shuffle volume is
    O(partitions x bins) regardless of row count — the right shape for
    a 100 TB profile pass."""
    # NULL values are filtered explicitly: a NULL would otherwise form
    # its own NULL-bin group, and Spark's orderBy puts NULLS FIRST while
    # DuckDB's puts them LAST — the query's contract must not depend on
    # the current dataset happening to be non-null
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    # explicit bucket arithmetic (identical expression on both engines —
    # DuckDB has no width_bucket, and matching the FORMULA beats
    # matching a builtin's private edge-case behavior)
    bucket = (
        F.when(F.col("value") < _HIST_LO, F.lit(0))
        .when(F.col("value") >= _HIST_HI, F.lit(_HIST_BINS + 1))
        .otherwise(
            F.floor(
                (F.col("value") - _HIST_LO) * _HIST_BINS / (_HIST_HI - _HIST_LO)
            ).cast("long")
            + 1
        )
    )
    return (
        e.groupBy(bucket.cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo_val"),
            F.round(F.max("value"), 6).alias("hi_val"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# beyond-ref: per-key linear trend via native regression aggregates
# --------------------------------------------------------------------------
_TREND_EPOCH = "1995-01-01"

_TREND_SQL = f"""
    SELECT user_id,
           CAST(regr_count(value, d) AS BIGINT) AS n_points,
           ROUND(regr_slope(value, d), 6) AS slope,
           ROUND(regr_intercept(value, d), 6) AS intercept,
           ROUND(regr_r2(value, d), 6) AS r2
    FROM (
      SELECT user_id, value,
             date_diff('day', DATE '{_TREND_EPOCH}', CAST(ts AS DATE)) AS d
      FROM events
    )
    GROUP BY user_id
    ORDER BY user_id
"""


def value_trend(e: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key OLS trend of ``value`` over time (day index) using the
    native SQL regression aggregates — slope/intercept/R² in ONE keyed
    aggregation pass, no MLlib, no UDF, no per-key collect. The x axis
    is an integer day offset from a fixed epoch, identical in both
    engines (timestamp->epoch-seconds casts differ in fractional
    handling; a date diff does not). Keys whose events all fall on one
    day have zero x-variance -> NULL slope on both engines. The
    single-pass co-moment accumulation is double-typed; outputs are
    rounded to 6 dp, far above the ~1e-13 relative noise partial-agg
    order can introduce at these magnitudes."""
    d = F.datediff(F.col("ts").cast("date"), F.lit(_TREND_EPOCH).cast("date"))
    return (
        e.select(key, F.col("value"), d.cast("double").alias("d"))
        .groupBy(key)
        .agg(
            F.regr_count("value", "d").cast("bigint").alias("n_points"),
            F.round(F.regr_slope("value", "d"), 6).alias("slope"),
            F.round(F.regr_intercept("value", "d"), 6).alias("intercept"),
            F.round(F.regr_r2("value", "d"), 6).alias("r2"),
        )
        .orderBy(key)
    )


@register("user_value_trend", _TREND_SQL)
def q_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_trend(load_table(spark, sf_dir, "events"))
