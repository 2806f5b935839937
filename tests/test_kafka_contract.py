"""Kafka wire-contract tests — no broker in the container, so these pin
the part a broker never touches: the ``to_json(struct(*))`` publish
encoding and the ``CAST(value AS STRING) -> from_json(schema)`` subscribe
decoding (reference: work/spark_processor.py:26-47). The topic only moves
the value bytes between those two, so encode -> decode on a batch frame IS
the round trip minus transport; plus a STREAMING round trip through the
same functions with a memory sink, mimicking subscribe->transform->publish.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from cours_datalake_dwh_td_kafka_spark.sources.kafka import (
    decode_kafka_value,
    encode_kafka_value,
)

WEATHER_SCHEMA = StructType(
    [
        StructField("city", StringType()),
        StructField("country", StringType()),
        StructField("temperature", DoubleType()),
        StructField("windspeed", DoubleType()),
        StructField("timestamp", DoubleType()),
    ]
)

ROWS = [
    ("Paris", "FR", 21.5, 9.0, 1.7e9),
    ("Lille", "FR", 35.5, 21.0, 1.7e9 + 60),
    ("Oslo", "NO", -3.25, 10.0, 1.7e9 + 120),
    # unicode + embedded quote: the JSON layer must escape, not mangle
    ('Saint-Étienne "centre"', "FR", 25.0, 10.5, 1.7e9 + 180),
]


def test_encode_decode_round_trip_preserves_rows(spark):
    src = spark.createDataFrame(ROWS, WEATHER_SCHEMA)
    # simulate the broker hop: the value column arrives as BINARY
    wire = encode_kafka_value(src).select(F.col("value").cast("binary"))
    back = decode_kafka_value(wire, WEATHER_SCHEMA)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_decode_malformed_message_yields_nulls_not_crash(spark):
    wire = spark.createDataFrame(
        [("{not json",), ('{"city": "Lyon", "temperature": "NaNope"}',)],
        "value STRING",
    )
    got = decode_kafka_value(wire, WEATHER_SCHEMA).collect()
    assert len(got) == 2
    assert got[0].city is None  # unparseable -> all-null row
    assert got[1].city == "Lyon"  # partial parse keeps good fields
    assert got[1].temperature is None


def test_streaming_subscribe_transform_publish_round_trip(spark, tmp_path):
    """The reference topology end-to-end minus the broker: encoded JSON
    values land as files (the topic stand-in), a streaming query decodes
    with the explicit schema, applies the alert banding, re-encodes, and a
    second decode of the published values recovers the typed rows."""
    topic_dir = tmp_path / "topic_in"
    src = spark.createDataFrame(ROWS, WEATHER_SCHEMA)
    encode_kafka_value(src).write.mode("overwrite").text(str(topic_dir))

    raw = spark.readStream.schema("value STRING").text(str(topic_dir))
    parsed = decode_kafka_value(raw, WEATHER_SCHEMA)
    processed = parsed.withColumn(
        "wind_alert_level",
        F.when(F.col("windspeed") < 10, "level_0")
        .when(F.col("windspeed") <= 20, "level_1")
        .otherwise("level_2"),
    )
    published = encode_kafka_value(processed)

    q = (
        published.writeStream.format("memory")
        .queryName("kafka_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # StructType.add mutates in place — build a fresh schema instead of
    # appending to the module-level one
    out_schema = StructType(
        list(WEATHER_SCHEMA.fields) + [StructField("wind_alert_level", StringType())]
    )
    final = decode_kafka_value(spark.table("kafka_out"), out_schema).collect()
    assert len(final) == len(ROWS)
    levels = {r.city: r.wind_alert_level for r in final}
    assert levels["Paris"] == "level_0"
    assert levels["Lille"] == "level_2"
    assert levels["Oslo"] == "level_1"
