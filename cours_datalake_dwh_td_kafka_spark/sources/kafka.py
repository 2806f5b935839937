"""Kafka source/sink wrappers — SURVEY.md §2.1 S10-S13.

The engine's streaming pipelines are source-agnostic DataFrame->DataFrame
functions (streaming/pipelines.py); this module provides the production
wiring. Requires the spark-sql-kafka connector jars on the cluster
classpath (not present in the test container — tests use file/memory
sources instead; these wrappers are exercised there only up to plan
construction).

Reference topology (work/spark_processor.py:19-23,41-47;
work/batch_records.py:31-36): subscribe -> transform -> publish with a
checkpoint per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def encode_kafka_value(df: DataFrame) -> DataFrame:
    """The WIRE CONTRACT, publish side: every row JSON-serialized into a
    single ``value`` string column (reference: work/spark_processor.py:41).
    Shared by the stream/batch sinks below and directly testable without
    a broker — the topic itself only moves these bytes."""
    return df.select(F.to_json(F.struct("*")).alias("value"))


def decode_kafka_value(df: DataFrame, schema: StructType | str) -> DataFrame:
    """The WIRE CONTRACT, subscribe side: cast the Kafka ``value`` bytes to
    string and explode the JSON payload into typed columns
    (reference: work/spark_processor.py:26-28). ``schema`` is explicit —
    never inferred — so a malformed message becomes NULL columns, not a
    stream-crashing schema drift."""
    return (
        df.select(F.col("value").cast("string").alias("_json"))
        .select(F.from_json("_json", schema).alias("data"))
        .select("data.*")
    )


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S10: streaming source. ``maxOffsetsPerTrigger`` bounds micro-batch
    size — at production rates leaving it unset lets one slow batch snowball
    (reference left it unset at 1 msg/10 s where it cannot matter)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader.load()


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    output_mode: str = "append",
):
    """S11: streaming sink; rows JSON-serialized into the value column
    (reference: work/spark_processor.py:41-47). Returns the configured
    writer (call .start())."""
    return (
        encode_kafka_value(df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )


def write_kafka_batch(
    df: DataFrame, bootstrap_servers: str, topic: str
) -> None:
    """S12: one-shot batch publish (reference: work/batch_records.py:31-36)."""
    (
        encode_kafka_value(df)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )
