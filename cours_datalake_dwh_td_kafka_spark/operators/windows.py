"""Window-function surface: SURVEY.md §2.5 (W1-W6) + per-group mode (A13b).

Scale notes: every query here shares one Window clustering per partition
key, so Catalyst emits a single hash-partition exchange per query; frames
are row-bounded (no unbounded following), so state per key is O(frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.registry import register


# --------------------------------------------------------------------------
# W1/W2: lag + UDF-free change detection (reference: work/TD_pySpark.ipynb:233-246
# used a Python UDF; here it's a column expression inside codegen)
# --------------------------------------------------------------------------
@register(
    "window_lag_delta",
    """
    SELECT event_id, user_id,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS value_delta,
           CASE WHEN LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS type_changed
    FROM events
    ORDER BY event_id
    """,
)
def q_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_type = F.lag("event_type").over(w)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("value_delta"),
        F.when(
            prev_type.isNull() | (prev_type != F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("type_changed"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# W3: running sum (reference: work/TD_pySpark.ipynb:313-322 trip numbering)
# --------------------------------------------------------------------------
@register(
    "running_sum",
    """
    SELECT event_id, user_id,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6) AS running_value
    FROM events
    ORDER BY event_id
    """,
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double"), 6
        ).alias("running_value"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# W4: row_number — first row per group (reference: work/TD_pySpark.ipynb:356-362)
# --------------------------------------------------------------------------
@register(
    "row_number_first",
    """
    SELECT user_id, event_id, ts, event_type
    FROM (
      SELECT user_id, event_id, ts, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def q_row_number_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# W5: rank with ties kept (reference: work/Projet/preparation_noaa.ipynb:546-551
# rank()==1 keeps tied nearest stations)
# --------------------------------------------------------------------------
@register(
    "rank_top3",
    """
    SELECT user_id, event_id, value, rnk
    FROM (
      SELECT user_id, event_id, value,
             RANK() OVER (PARTITION BY user_id ORDER BY value DESC) AS rnk
      FROM events
    )
    WHERE rnk <= 3
    ORDER BY user_id, rnk, event_id
    """,
)
def q_rank_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"))
    return (
        e.withColumn("rnk", F.rank().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("user_id", "event_id", "value", "rnk")
        .orderBy("user_id", "rnk", "event_id")
    )


# --------------------------------------------------------------------------
# W6: explicit row frame (reference: work/TD_pySpark.ipynb:282-286
# rowsBetween(-2, 0) rolling max)
# --------------------------------------------------------------------------
@register(
    "rolling_frame_max",
    """
    SELECT event_id, user_id,
           MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling_max3
    FROM events
    ORDER BY event_id
    """,
)
def q_rolling_frame_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.max("value").over(w).alias("rolling_max3"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# A13b: per-group mode via window argmax (KAFKA exos §8 "most frequent
# weather code per country" — here most frequent event_type per user,
# deterministic tiebreak on event_type asc)
# --------------------------------------------------------------------------
@register(
    "mode_per_group",
    """
    SELECT user_id, event_type AS top_event_type, n_events
    FROM (
      SELECT user_id, event_type, COUNT(*) AS n_events,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events
      GROUP BY user_id, event_type
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_event_type"), "n_events")
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# beyond-ref: rolling MEDIAN frame — the robust twin of rolling_frame_max
# --------------------------------------------------------------------------
@register(
    "rolling_median",
    """
    SELECT event_id, user_id,
           ROUND(quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           ), 6) AS rolling_median
    FROM events
    ORDER BY user_id, event_id
    LIMIT 500
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-row rolling median per user — the outlier-resistant smoother a
    robust dashboard uses where rolling mean would chase spikes (pairs
    with robust_anomaly's global median/MAD in profiling.py). Exact
    interpolated percentile as a FRAMED window aggregate: per-frame
    sort cost is bounded by the 4-row frame, the partition by the
    user's events — nothing global. Same F.percentile <-> quantile_cont
    parity the quantiles query pins, here per frame."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            F.round(
                F.percentile("value", F.lit(0.5)).over(w), 6
            ).alias("rolling_median"),
            "ts",
        )
        .orderBy("user_id", "event_id")
        .limit(500)
        .drop("ts")
    )


# ---------------------------------------------------------------------------
# equi-depth histogram via NTILE — the quantile-bucket profile
# ---------------------------------------------------------------------------
N_DEPTH_BUCKETS = 10

_EQUI_DEPTH_SQL = f"""
    WITH b AS (
      SELECT event_type, value,
             NTILE({N_DEPTH_BUCKETS}) OVER (
               PARTITION BY event_type ORDER BY value, event_id
             ) AS bucket
      FROM events
    )
    SELECT event_type, bucket,
           COUNT(*) AS n_rows,
           ROUND(MIN(value), 6) AS lo,
           ROUND(MAX(value), 6) AS hi
    FROM b
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
"""


def equi_depth_histogram(
    e: DataFrame, key: str = "event_type", n_buckets: int = N_DEPTH_BUCKETS
) -> DataFrame:
    """Per-key equi-DEPTH histogram: each key's values split into
    ``n_buckets`` equal-count buckets with each bucket's row count and
    [lo, hi] span — the complement of the fixed-width
    ``value_histogram`` (equal-width bins, skewed counts) for
    heavy-tailed columns where width-binning puts 99% of rows in bin 0.

    Determinism: the rank order includes event_id, so ties at a bucket
    boundary land identically on both engines (bucket COUNTS are always
    engine-identical; the tie-break pins lo/hi too).

    Scale shape: NOT ``F.ntile`` — a per-event_type NTILE window sorts
    rows-that-scale through keys-that-don't (the low-cardinality keyed
    window class the plans gate polices; this was its first catch).
    Instead the per-key rank comes from the two-phase
    :func:`~cours_datalake_dwh_td_kafka_spark.operators.scale.dense_ids`
    kernel (range buckets on (key, value, event_id) — one key's ranking
    spreads across all its buckets) and the bucket is the SQL-standard
    NTILE assignment computed ARITHMETICALLY from (rank, n): with
    q = n // k and r = n % k, the first r buckets carry q+1 rows. The
    DuckDB oracle stays plain NTILE, so parity pins the formula."""
    from cours_datalake_dwh_td_kafka_spark.operators.scale import dense_ids

    ranked = dense_ids(
        e.select(key, "value", "event_id"),
        ("value", "event_id"),
        partition_cols=(key,),
    ).withColumnRenamed("sk", "rn")
    n_per_key = e.groupBy(key).agg(F.count(F.lit(1)).alias("_n"))
    q = F.floor(F.col("_n") / n_buckets)
    r = F.col("_n") % n_buckets
    big = r * (q + 1)  # rows living in the first r (q+1)-sized buckets
    bucket = (
        F.when(
            F.col("rn") <= big, F.floor((F.col("rn") - 1) / (q + 1)) + 1
        )
        .otherwise(r + F.floor((F.col("rn") - big - 1) / q) + 1)
        .cast("int")
    )
    return (
        ranked.join(F.broadcast(n_per_key), key)
        .withColumn("bucket", bucket)
        .groupBy(key, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
        .orderBy(key, "bucket")
    )


@register("equi_depth_histogram", _EQUI_DEPTH_SQL)
def q_equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return equi_depth_histogram(load_table(spark, sf_dir, "events"))
