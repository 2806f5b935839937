"""Lambda batch layer: monthly profiling, batch anomaly join, records.

Mirrors the reference's batch jobs re-keyed onto the driver's events table:

- monthly profile: work/batch_profiling_enriched.py:20-27 (mean/std per
  month) enriched with the spec's median/q25/q75/min/max and alert
  probability (KAFKA exos (1).pdf §Exercice 11-12).
- batch anomaly join: work/anomaly_detector.py:35-49 — observation joined
  against the profile on the FULL spec key (type+month, analog of
  {country, city, month}; the reference joined on month only, a bug the
  spec calls out).
- records: work/batch_records.py:24-28 — per-entity extreme values with
  their timestamps (deterministic tie-break: earliest ts wins).

Scale notes: the profile is tiny (groups = types x months) so the anomaly
join broadcasts it — the 100-TB stream side never shuffles. Records use
one window over the entity partition rather than a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.relational import dec_avg
from cours_datalake_dwh_td_kafka_spark.registry import register

_PROFILE_SQL = """
    SELECT event_type,
           month(ts) AS month,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS value_mean,
           ROUND(stddev_samp(value), 6) AS value_std,
           MIN(value) AS value_min,
           MAX(value) AS value_max,
           ROUND(quantile_cont(value, 0.25), 6) AS q25,
           ROUND(quantile_cont(value, 0.50), 6) AS median,
           ROUND(quantile_cont(value, 0.75), 6) AS q75,
           ROUND(CAST(SUM(CASE WHEN value > 150 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS alert_probability,
           COUNT(*) AS n_obs
    FROM events
    GROUP BY event_type, month(ts)
    ORDER BY event_type, month
"""


def monthly_profile(events: DataFrame) -> DataFrame:
    n = F.count(F.lit(1))
    return (
        events.groupBy("event_type", F.month("ts").alias("month"))
        .agg(
            dec_avg(F.col("value"), n).alias("value_mean"),
            F.round(F.stddev_samp("value"), 6).alias("value_std"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
            F.round(F.percentile("value", F.lit(0.25)), 6).alias("q25"),
            F.round(F.percentile("value", F.lit(0.50)), 6).alias("median"),
            F.round(F.percentile("value", F.lit(0.75)), 6).alias("q75"),
            F.round(
                F.sum(F.when(F.col("value") > 150, 1).otherwise(0)).cast("double")
                / n,
                6,
            ).alias("alert_probability"),
            n.alias("n_obs"),
        )
        .orderBy("event_type", "month")
    )


@register("monthly_profile", _PROFILE_SQL)
def q_monthly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return monthly_profile(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Batch anomaly join (T9 emission contract: entity, event_time, variable,
# observed_value, expected_value, anomaly flags —
# reference: work/anomaly_detector.py:42-49)
# --------------------------------------------------------------------------
_ANOMALY_SQL = """
    WITH profile AS (
      SELECT event_type, month(ts) AS month,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS value_mean,
             ROUND(stddev_samp(value), 6) AS value_std
      FROM events
      GROUP BY event_type, month(ts)
    )
    SELECT e.event_id, e.user_id, e.event_type,
           e.ts AS event_time,
           'value' AS variable,
           e.value AS observed_value,
           p.value_mean AS expected_value,
           CASE WHEN e.value > p.value_mean + 2 * p.value_std THEN 'high'
                ELSE 'low' END AS anomaly_type
    FROM events e
    JOIN profile p
      ON e.event_type = p.event_type AND month(e.ts) = p.month
    WHERE ABS(e.value - p.value_mean) > 2 * p.value_std
    ORDER BY e.event_id
"""


def detect_anomalies(events: DataFrame, profile: DataFrame) -> DataFrame:
    """Observation stream ⋈ broadcast profile on the full (type, month) key.
    Same plan shape works for the streaming variant (stream-static join,
    streaming/pipelines.py) — the profile side is small by construction."""
    e = events.withColumn("month", F.month("ts"))
    p = profile.select("event_type", "month", "value_mean", "value_std")
    joined = e.join(F.broadcast(p), ["event_type", "month"])
    return (
        joined.where(
            F.abs(F.col("value") - F.col("value_mean")) > 2 * F.col("value_std")
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("ts").alias("event_time"),
            F.lit("value").alias("variable"),
            F.col("value").alias("observed_value"),
            F.col("value_mean").alias("expected_value"),
            F.when(
                F.col("value") > F.col("value_mean") + 2 * F.col("value_std"), "high"
            )
            .otherwise("low")
            .alias("anomaly_type"),
        )
        .orderBy("event_id")
    )


@register("anomaly_batch", _ANOMALY_SQL)
def q_anomaly_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch anomaly detection: aggregate the per-(type, month) profile
    (map-side combine reduces each partition to ~60 rows before any
    exchange), broadcast it, and join it back against the event scan —
    the scan itself never shuffles.

    A window-aggregate single-pass form (``avg(...).over(partitionBy
    (type, month))``) measured ~2.5x faster at sf0.1 but was REJECTED:
    it hash-partitions the ENTIRE event table into only
    #(type x month) ~= 60 window tasks, so at 100 TB each task holds
    terabytes — a straggler/OOM shape. The groupBy+broadcast-join form
    keeps per-task work proportional to input partitioning at any
    scale."""
    events = load_table(spark, sf_dir, "events")
    prof = monthly_profile(events).select(
        "event_type", "month", "value_mean", "value_std"
    )
    return detect_anomalies(events, prof)


# --------------------------------------------------------------------------
# Records (argmax/argmin with timestamps, deterministic ties)
# (reference: work/batch_records.py:24-28 groupBy(lat,lon).agg(max,min))
# --------------------------------------------------------------------------
_RECORDS_SQL = """
    WITH ranked AS (
      SELECT user_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, ts, event_id) AS rn_max,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value ASC, ts, event_id) AS rn_min
      FROM events
    )
    SELECT user_id,
           MAX(CASE WHEN rn_max = 1 THEN value END) AS record_high,
           MAX(CASE WHEN rn_max = 1 THEN ts END) AS record_high_ts,
           MAX(CASE WHEN rn_min = 1 THEN value END) AS record_low,
           MAX(CASE WHEN rn_min = 1 THEN ts END) AS record_low_ts
    FROM ranked
    WHERE rn_max = 1 OR rn_min = 1
    GROUP BY user_id
    ORDER BY user_id
"""


@register("records", _RECORDS_SQL)
def q_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w_max = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.asc("ts"), F.asc("event_id")
    )
    w_min = Window.partitionBy("user_id").orderBy(
        F.asc("value"), F.asc("ts"), F.asc("event_id")
    )
    ranked = e.select(
        "user_id",
        "ts",
        "value",
        F.row_number().over(w_max).alias("rn_max"),
        F.row_number().over(w_min).alias("rn_min"),
    ).where((F.col("rn_max") == 1) | (F.col("rn_min") == 1))
    return (
        ranked.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rn_max") == 1, F.col("value"))).alias("record_high"),
            F.max(F.when(F.col("rn_max") == 1, F.col("ts"))).alias("record_high_ts"),
            F.max(F.when(F.col("rn_min") == 1, F.col("value"))).alias("record_low"),
            F.max(F.when(F.col("rn_min") == 1, F.col("ts"))).alias("record_low_ts"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# beyond-ref: multi-table data-quality audit (extends A16 validity_audit
# to the cross-table checks a DWH load gate runs before publishing)
# --------------------------------------------------------------------------
_DQ_SQL = """
    WITH checks AS (
      SELECT 'lineitem_discount_out_of_range' AS check_name,
             COUNT(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END)
               AS n_violations
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_nonpositive_quantity',
             COUNT(CASE WHEN l_quantity <= 0 THEN 1 END)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_orphan_orderkey', COUNT(*)
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'orders_duplicate_orderkey',
             COUNT(*) - COUNT(DISTINCT o_orderkey)
      FROM orders
      UNION ALL
      SELECT 'orders_null_custkey',
             COUNT(CASE WHEN o_custkey IS NULL THEN 1 END)
      FROM orders
      UNION ALL
      SELECT 'orders_orphan_custkey', COUNT(*)
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'orders_nonpositive_total',
             COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END)
      FROM orders
      UNION ALL
      SELECT 'lineitem_shipped_before_order', COUNT(*)
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate < o.o_orderdate
    )
    SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
           (n_violations = 0) AS passed
    FROM checks
    ORDER BY check_name
"""


def dq_audit(
    li: DataFrame, o: DataFrame, c: DataFrame
) -> DataFrame:
    """DWH load-gate quality suite: domain checks (ranges, positivity),
    uniqueness, null keys, referential integrity (orphan foreign keys
    as LEFT ANTI joins — never a collect), and one cross-table temporal
    invariant (no line shipped before its order). One row per check
    with its violation count and verdict — the dbt-test / expectation
    report shape.

    Scale shape: every domain check is a single scan-side conditional
    aggregate (the checks against one table could share one scan; kept
    separate so each check stays independently readable and Catalyst
    still prunes to the 1-2 columns it needs). The two referential
    checks project to their key columns BEFORE the anti-join, so only
    8-byte keys ride the shuffle; the temporal check reuses the
    orders->lineitem equi-join shape every other fact query shuffles
    on (bucketing co-locates it at ingest)."""

    def check(name: str, df: DataFrame, cnt) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            cnt.cast("bigint").alias("n_violations"),
        )

    bad = F.count  # conditional count: non-matching rows -> NULL -> uncounted
    checks = [
        check(
            "lineitem_discount_out_of_range",
            li,
            bad(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)),
        ),
        check(
            "lineitem_nonpositive_quantity",
            li,
            bad(F.when(F.col("l_quantity") <= 0, 1)),
        ),
        check(
            "lineitem_orphan_orderkey",
            li.select("l_orderkey").join(
                o.select("o_orderkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
                "left_anti",
            ),
            F.count(F.lit(1)),
        ),
        check(
            "orders_duplicate_orderkey",
            o,
            F.count(F.lit(1)) - F.countDistinct("o_orderkey"),
        ),
        check(
            "orders_null_custkey",
            o,
            bad(F.when(F.col("o_custkey").isNull(), 1)),
        ),
        check(
            "orders_orphan_custkey",
            o.select("o_custkey").join(
                c.select("c_custkey"),
                F.col("o_custkey") == F.col("c_custkey"),
                "left_anti",
            ),
            F.count(F.lit(1)),
        ),
        check(
            "orders_nonpositive_total",
            o,
            bad(F.when(F.col("o_totalprice") <= 0, 1)),
        ),
        check(
            "lineitem_shipped_before_order",
            li.select("l_orderkey", "l_shipdate").join(
                o.select("o_orderkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            ).where(F.col("l_shipdate") < F.col("o_orderdate")),
            F.count(F.lit(1)),
        ),
    ]
    out = checks[0]
    for ck in checks[1:]:
        out = out.unionByName(ck)
    return out.withColumn("passed", F.col("n_violations") == 0).orderBy(
        "check_name"
    )


@register("dq_audit", _DQ_SQL)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dq_audit(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


# --------------------------------------------------------------------------
# beyond-ref: robust (median/MAD) anomaly profile — the outlier detector
# that survives the outliers it hunts
# --------------------------------------------------------------------------
_ROBUST_Z = 3.5  # Iglewicz–Hoaglin modified-z cutoff
_MAD_SCALE = 0.6745  # Phi^-1(0.75): makes MAD comparable to sigma

_ROBUST_SQL = f"""
    WITH med AS (
      SELECT user_id, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY user_id
    ),
    mad AS (
      SELECT e.user_id, med.med,
             quantile_cont(abs(e.value - med.med), 0.5) AS mad
      FROM events e JOIN med ON e.user_id = med.user_id
      GROUP BY e.user_id, med.med
    )
    SELECT e.user_id,
           COUNT(*) AS n_events,
           ROUND(mad.med, 6) AS med_value,
           ROUND(mad.mad, 6) AS mad_value,
           CAST(SUM(CASE WHEN mad.mad > 0
                          AND abs({_MAD_SCALE} * (e.value - mad.med)
                                  / nullif(mad.mad, 0)) > {_ROBUST_Z}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN mad ON e.user_id = mad.user_id
    GROUP BY e.user_id, mad.med, mad.mad
    ORDER BY e.user_id
"""


def robust_anomaly(e: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key robust outlier profile: median, MAD, and the count of
    events whose modified z-score 0.6745*(x - med)/MAD exceeds 3.5
    (Iglewicz–Hoaglin). Unlike the mean/std detector (anomaly_batch
    above), a handful of extreme values cannot drag the baseline —
    median and MAD have a 50% breakdown point — which is what you want
    when the contamination being hunted is also in the statistic.

    Scale shape: three aggregations on the SAME key (median, MAD over
    rejoined deviations, outlier count) — the median/MAD tables are one
    row per key, so the two join-backs broadcast under AQE; exchange
    reuse keeps it one fact shuffle family. Exact interpolated
    percentiles (F.percentile <-> quantile_cont, the parity the
    quantiles query pins); a zero MAD (>= half the key's values
    identical) flags nothing rather than dividing by zero."""
    med = e.groupBy(key).agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    with_med = e.select(key, "value").join(med, key)
    mad = with_med.groupBy(key, "med").agg(
        F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias(
            "mad"
        )
    )
    # mad == 0 (>= half the key's values identical) must never divide:
    # the (mad > 0) conjunct is not a short-circuit guarantee under ANSI
    # mode, so the divisor itself is null-safe on both engines
    z = (
        F.lit(_MAD_SCALE)
        * (F.col("value") - F.col("med"))
        / F.nullif(F.col("mad"), F.lit(0.0))
    )
    return (
        e.select(key, "value")
        .join(mad, key)
        .groupBy(key, "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    (F.col("mad") > 0) & (F.abs(z) > _ROBUST_Z), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            key,
            "n_events",
            F.round("med", 6).alias("med_value"),
            F.round("mad", 6).alias("mad_value"),
            "n_outliers",
        )
        .orderBy(key)
    )


@register("robust_anomaly", _ROBUST_SQL)
def q_robust_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return robust_anomaly(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# winsorized per-key mean: the robust location estimate for heavy tails
# ---------------------------------------------------------------------------
_WINSOR_LO = 0.05
_WINSOR_HI = 0.95

_WINSOR_SQL = f"""
    WITH cuts AS (
      SELECT user_id,
             quantile_cont(value, {_WINSOR_LO}) AS lo,
             quantile_cont(value, {_WINSOR_HI}) AS hi
      FROM events GROUP BY user_id
    )
    SELECT e.user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN e.value < cuts.lo OR e.value > cuts.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           ROUND(CAST(SUM(CAST(ROUND(
                   LEAST(GREATEST(e.value, cuts.lo), cuts.hi), 6)
                 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
             AS winsorized_mean
    FROM events e JOIN cuts USING (user_id)
    GROUP BY e.user_id
    ORDER BY e.user_id
"""


def winsorized_mean(
    e: DataFrame,
    key: str = "user_id",
    lo: float = _WINSOR_LO,
    hi: float = _WINSOR_HI,
) -> DataFrame:
    """Per-key mean with values clipped to the key's own [p5, p95]
    band — the standard heavy-tail-resistant location estimate sitting
    between the raw mean (anomaly_batch) and the median (robust_anomaly)
    in breakdown point vs efficiency.

    Scale shape: one percentile aggregate per key (exact interpolated —
    the `quantiles` parity anchor), re-joined one-row-per-key (AQE
    broadcasts it), then one clipped-sum aggregate. Clipped values
    round to 6 dp and sum as DECIMAL(28,6), so partial-agg order can't
    move the mean."""
    cuts = e.groupBy(key).agg(
        F.percentile("value", F.lit(lo)).alias("lo"),
        F.percentile("value", F.lit(hi)).alias("hi"),
    )
    clipped = F.round(
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")), 6
    )
    out_of_band = (F.col("value") < F.col("lo")) | (
        F.col("value") > F.col("hi")
    )
    return (
        e.select(key, "value")
        .join(cuts, key)
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(out_of_band.cast("int")).cast("bigint").alias(
                "n_clipped"
            ),
            F.round(
                F.sum(clipped.cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("winsorized_mean"),
        )
        .orderBy(key)
    )


@register("winsorized_mean", _WINSOR_SQL)
def q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winsorized_mean(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# beyond-ref: label-balance chi-square screen over the embedding corpus
# ---------------------------------------------------------------------------
#: chi-square critical value at alpha=0.01 for 9 degrees of freedom
#: (10 labels) — public table constant; the query recomputes df-aware
#: acceptance only through the emitted statistic, so a different label
#: count simply reports its own chi2 against this fixed screen
CHI2_CRIT_DF9_P01 = 21.666

_LABEL_CHI2_SQL = f"""
    WITH counts AS (
      SELECT label, COUNT(*) AS c FROM embeddings GROUP BY label
    ),
    tot AS (
      SELECT COUNT(*) AS k, SUM(c) AS n, SUM(c * c) AS ssq FROM counts
    )
    SELECT CAST(k AS BIGINT) AS n_labels,
           CAST(n AS BIGINT) AS n_vectors,
           ROUND(k * CAST(ssq AS DOUBLE) / n - n, 6) AS chi2,
           (k * CAST(ssq AS DOUBLE) / n - n) <= {CHI2_CRIT_DF9_P01}
             AS balanced_ok
    FROM tot
"""


def label_balance_chi2(e: DataFrame) -> DataFrame:
    """Goodness-of-fit of the label distribution against uniform — the
    class-balance gate a training-data pipeline runs before stratified
    splits (a skewed label column silently biases every downstream
    eval). Pearson's chi2 vs the uniform expectation E = n/k algebraic
    form: chi2 = k * Σc² / n - n, which keeps the whole statistic a
    function of INTEGER aggregates (Σc² is exact), so the only float
    ops are one divide and one subtract — engine-identical, no
    accumulation-order hazard.

    Scale shape: one keyed count (map-side partial), one k-row
    all-reduce. The screen constant is the public chi-square table
    value; the emitted boolean is the alpha=0.01 verdict."""
    counts = e.groupBy("label").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("ssq"),
    )
    chi2 = (
        F.col("k") * F.col("ssq").cast("double") / F.col("n") - F.col("n")
    )
    return tot.select(
        F.col("k").cast("bigint").alias("n_labels"),
        F.col("n").cast("bigint").alias("n_vectors"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 <= CHI2_CRIT_DF9_P01).alias("balanced_ok"),
    )


@register("label_balance_chi2", _LABEL_CHI2_SQL)
def q_label_balance_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return label_balance_chi2(load_table(spark, sf_dir, "embeddings"))
