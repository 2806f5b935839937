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
