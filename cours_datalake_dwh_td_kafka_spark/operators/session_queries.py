"""Registry entry for the flagship sessionization query (SURVEY.md §2.5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.sessionization import (
    SESSIONIZE_EVENTS_ORACLE,
    sessionize_events,
)
from cours_datalake_dwh_td_kafka_spark.registry import register


@register("sessionization", SESSIONIZE_EVENTS_ORACLE)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize_events(load_table(spark, sf_dir, "events"))
