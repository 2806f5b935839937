"""Data-warehouse modeling operators — the course IS a DWH course
(reference: the star-schema modeling in work/Td_Dwh notebooks and the
mutable-entity upsert the merge sink covers,
streaming/pipelines.py:merge_stream_to_lake). This module adds the
classic slowly-changing-dimension type-2 build: derive validity
intervals from an event history, the batch backbone behind every
point-in-time join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.registry import register

_SCD2_SQL = """
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w IS NULL
                    OR LAG(event_type) OVER w != event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS run_id
      FROM ordered
    ),
    grp AS (
      SELECT user_id, run_id, event_type,
             MIN(ts) AS valid_from, COUNT(*) AS n_events
      FROM runs GROUP BY user_id, run_id, event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from) AS valid_to,
           n_events,
           (LEAD(valid_from) OVER (PARTITION BY user_id
                                   ORDER BY valid_from) IS NULL)
             AS is_current
    FROM grp
    ORDER BY user_id, valid_from
"""


def scd2_dimension(
    ev: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Type-2 slowly-changing dimension from an event log: collapse each
    key's consecutive run of an attribute value into one row with
    [valid_from, valid_to) validity, valid_to NULL (is_current) on the
    open run — the point-in-time join side of a Kimball star schema.

    Run detection is the standard gaps-and-islands window chain: a
    change flag vs LAG, a running SUM as run id, then MIN/COUNT per run
    and LEAD for the closing timestamp. Scale shape: everything
    partitions by the dimension key — the window sort, the run
    aggregate, and the LEAD all reuse the one hash partitioning on
    ``key`` (AQE reuses the exchange); no global sort until the final
    presentation ORDER BY. Ordering ties break on ``tiebreak`` so the
    intervals are deterministic under retry."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    prev = F.lag(attr).over(w)
    chg = F.when(prev.isNull() | (prev != F.col(attr)), 1).otherwise(0)
    runs = ev.withColumn("_chg", chg).withColumn(
        "_run_id", F.sum("_chg").over(w)
    )
    grp = runs.groupBy(key, "_run_id", attr).agg(
        F.min(ts).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(key).orderBy("valid_from")
    nxt = F.lead("valid_from").over(w2)
    return (
        grp.withColumn("valid_to", nxt)
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key, attr, "valid_from", "valid_to", "n_events", "is_current")
        .orderBy(key, "valid_from")
    )


@register("scd2_dimension", _SCD2_SQL)
def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_dimension(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quintiles)
# ---------------------------------------------------------------------------
_RFM_SQL = """
    WITH per_cust AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                        AS DOUBLE), 2) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    anchor AS (SELECT MAX(o_orderdate) AS corpus_last FROM orders),
    feat AS (
      SELECT o_custkey,
             date_diff('day', last_order, corpus_last) AS recency_days,
             n_orders, monetary
      FROM per_cust CROSS JOIN anchor
    ),
    scored AS (
      SELECT *,
             NTILE(5) OVER (ORDER BY recency_days DESC, o_custkey)
               AS r_score,
             NTILE(5) OVER (ORDER BY n_orders, o_custkey) AS f_score,
             NTILE(5) OVER (ORDER BY monetary, o_custkey) AS m_score
      FROM feat
    )
    SELECT o_custkey,
           CAST(recency_days AS BIGINT) AS recency_days,
           CAST(n_orders AS BIGINT) AS n_orders,
           monetary,
           r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment
    FROM scored
    ORDER BY o_custkey
"""


def rfm_segments(o: DataFrame) -> DataFrame:
    """Classic RFM segmentation: per customer, days since last order
    (recency, anchored at the corpus's newest order so the result is
    reproducible), order count (frequency), and exact-decimal lifetime
    spend (monetary), each quintile-scored 1-5 with 5 best; the
    concatenated score string is the marketing segment key ('555' =
    champions, '155' = at-risk big spender).

    Scale shape: one aggregate on the customer key collapses the fact
    table to one row per customer BEFORE the scoring windows; the
    global NTILE windows then rank customers, not orders (same
    customers << facts argument as surrogate_keys — at extreme customer
    counts switch the quintiles to percentile thresholds, which
    partial-aggregate). Tie-breaks on the customer key keep bucket
    edges engine-identical."""
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast(
                "double"
            ),
            2,
        ).alias("monetary"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("corpus_last"))
    feat = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff("corpus_last", "last_order").alias("recency_days"),
        "n_orders",
        "monetary",
    )
    w_r = Window.orderBy(F.desc("recency_days"), "o_custkey")
    w_f = Window.orderBy("n_orders", "o_custkey")
    w_m = Window.orderBy("monetary", "o_custkey")
    scored = feat.select(
        "o_custkey",
        F.col("recency_days").cast("bigint").alias("recency_days"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
        "monetary",
        F.ntile(5).over(w_r).alias("r_score"),
        F.ntile(5).over(w_f).alias("f_score"),
        F.ntile(5).over(w_m).alias("m_score"),
    )
    return scored.select(
        "*",
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ).alias("segment"),
    ).orderBy("o_custkey")


@register("rfm_segments", _RFM_SQL)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rfm_segments(load_table(spark, sf_dir, "orders"))
