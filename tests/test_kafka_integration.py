"""Broker-backed integration test for the Kafka wrappers (S10-S12, T5).

The sandbox has no broker and no spark-sql-kafka connector jars, so this
module SKIPS unless ``KAFKA_BOOTSTRAP`` is set. To run it for real:

    # 1. a reachable broker, e.g.:  docker run -p 9092:9092 apache/kafka
    # 2. the connector on the session classpath:
    #    export PYSPARK_SUBMIT_ARGS="--packages \
    #      org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 \
    #      pyspark-shell"
    # 3. KAFKA_BOOTSTRAP=localhost:9092 python -m pytest \
    #      tests/test_kafka_integration.py -q

It drives the full reference topology (work/spark_processor.py:19-47):
batch-publish typed rows -> streaming subscribe -> decode -> transform ->
streaming publish to a second topic -> batch-read the output topic and
check the transformed payloads round-tripped exactly. This is the only
seam `tests/test_kafka_contract.py` (broker-less wire-contract twin)
cannot cover: real offset tracking, startingOffsets semantics, and the
connector's value-bytes round trip.
"""

from __future__ import annotations

import os
import time
import uuid

import pytest

from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="set KAFKA_BOOTSTRAP=<host:port> (plus the spark-sql-kafka "
    "connector on the classpath) to run broker integration tests",
)

SCHEMA = "record_id LONG, city STRING, temperature DOUBLE"


@pytest.fixture()
def topics():
    run = uuid.uuid4().hex[:8]
    return f"sgraft_in_{run}", f"sgraft_out_{run}"


def test_subscribe_transform_publish_roundtrip(spark, tmp_path, topics):
    from cours_datalake_dwh_td_kafka_spark.sources.kafka import (
        decode_kafka_value,
        read_kafka_stream,
        write_kafka_batch,
        write_kafka_stream,
    )

    topic_in, topic_out = topics
    rows = [
        (1, "paris", 21.5),
        (2, "lyon", 35.0),
        (3, "lille", 2.25),
    ]
    src = spark.createDataFrame(rows, SCHEMA)

    # S12: batch publish the input topic
    write_kafka_batch(src, BOOTSTRAP, topic_in)

    # S10 + T5: subscribe from earliest; decode; transform (the
    # reference's alert banding); S11: publish to the output topic
    stream = read_kafka_stream(
        spark, BOOTSTRAP, topic_in, starting_offsets="earliest"
    )
    decoded = decode_kafka_value(stream, SCHEMA)
    transformed = decoded.withColumn(
        "alert", (F.col("temperature") > F.lit(30.0)).cast("string")
    )
    q = write_kafka_stream(
        transformed,
        BOOTSTRAP,
        topic_out,
        checkpoint=str(tmp_path / "ckpt"),
    ).start()
    try:
        deadline = time.time() + 60
        out = None
        while time.time() < deadline:
            q.processAllAvailable()
            out = (
                spark.read.format("kafka")
                .option("kafka.bootstrap.servers", BOOTSTRAP)
                .option("subscribe", topic_out)
                .option("startingOffsets", "earliest")
                .load()
            )
            if out.count() >= len(rows):
                break
            time.sleep(1)
    finally:
        q.stop()

    got = {
        (r.record_id, r.city, r.temperature, r.alert)
        for r in decode_kafka_value(
            out, SCHEMA + ", alert STRING"
        ).collect()
    }
    want = {
        (1, "paris", 21.5, "false"),
        (2, "lyon", 35.0, "true"),
        (3, "lille", 2.25, "false"),
    }
    assert got == want


def test_starting_offsets_latest_skips_backlog(spark, tmp_path, topics):
    """T5: startingOffsets='latest' must not re-read pre-existing rows."""
    from cours_datalake_dwh_td_kafka_spark.sources.kafka import (
        decode_kafka_value,
        read_kafka_stream,
        write_kafka_batch,
    )

    topic_in, _ = topics
    backlog = spark.createDataFrame([(99, "old", 0.0)], SCHEMA)
    write_kafka_batch(backlog, BOOTSTRAP, topic_in)

    stream = read_kafka_stream(
        spark, BOOTSTRAP, topic_in, starting_offsets="latest"
    )
    decoded = decode_kafka_value(stream, SCHEMA)
    q = (
        decoded.writeStream.format("memory")
        .queryName(f"mem_{topic_in}")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        fresh = spark.createDataFrame([(100, "new", 1.0)], SCHEMA)
        write_kafka_batch(fresh, BOOTSTRAP, topic_in)
        q.processAllAvailable()
        got = {
            r.record_id
            for r in spark.sql(f"SELECT * FROM mem_{topic_in}").collect()
        }
    finally:
        q.stop()
    assert 100 in got and 99 not in got
