"""Structured Streaming tests without a Kafka broker: file sources feeding
the same pipeline functions production runs over Kafka, memory sinks for
assertions, checkpoint-restart replay, and watermark/late-data behavior
(SURVEY.md §5 item 3)."""

from __future__ import annotations

import datetime
import json
import shutil
import time
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
    WEATHER_SCHEMA,
    anomaly_stream,
    enrich_alerts,
    parse_kafka_json,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

RAW_SCHEMA = StructType(
    [
        StructField("city", StringType()),
        StructField("country", StringType()),
        StructField("temperature", DoubleType()),
        StructField("windspeed", DoubleType()),
        StructField("timestamp", DoubleType()),
    ]
)

BASE_TS = 1_700_000_000.0  # 2023-11-14 22:13:20 UTC


_batch_seq = 0


def _write_batch(dirpath, rows, name):
    """Write one micro-batch file with a strictly increasing mtime: the
    file source orders by modification time, and same-second writes tie —
    which would let a later batch (e.g. a watermark-flush row) process
    FIRST and silently change the scenario."""
    global _batch_seq
    import os

    _batch_seq += 1
    path = f"{dirpath}/{name}.json"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(path, (1_000_000 + _batch_seq * 60, 1_000_000 + _batch_seq * 60))


def _rows(n0, count, city="Paris", country="France", temp=20.0, wind=5.0, step=60):
    return [
        {
            "city": city,
            "country": country,
            "temperature": temp,
            "windspeed": wind,
            "timestamp": BASE_TS + (n0 + i) * step,
        }
        for i in range(count)
    ]


def _run_to_memory(df, name, mode="update"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    return str(d)


def _read_stream(spark, stream_dir):
    return (
        spark.readStream.schema(RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(stream_dir)
    )


def test_transform_enrich_alert_banding(spark, stream_dir):
    """T1: parse -> enrich matches the reference banding thresholds
    exactly at the boundaries (10/20 wind, 25/35 heat —
    work/spark_processor.py:31-38)."""
    rows = (
        _rows(0, 1, temp=24.9, wind=9.9)
        + _rows(1, 1, temp=25.0, wind=10.0)
        + _rows(2, 1, temp=35.0, wind=20.0)
        + _rows(3, 1, temp=35.1, wind=20.1)
    )
    _write_batch(stream_dir, rows, "b0")
    enriched = enrich_alerts(_read_stream(spark, stream_dir))
    name = f"t1_{uuid.uuid4().hex[:8]}"
    _run_to_memory(enriched, name, mode="append")
    got = {
        round(r.windspeed, 1): (r.wind_alert_level, r.heat_alert_level)
        for r in spark.table(name).collect()
    }
    assert got[9.9] == ("level_0", "level_0")
    assert got[10.0] == ("level_1", "level_1")
    assert got[20.0] == ("level_1", "level_1")
    assert got[20.1] == ("level_2", "level_2")


def test_sliding_window_agg_streaming_matches_batch(spark, stream_dir):
    """T2: the same pipeline function produces identical results in
    streaming (file source, two micro-batches) and batch execution."""
    rows = _rows(0, 30, temp=20.0) + _rows(30, 30, temp=30.0)
    _write_batch(stream_dir, rows[:40], "b0")
    _write_batch(stream_dir, rows[40:], "b1")

    stream_out = sliding_window_agg(
        enrich_alerts(_read_stream(spark, stream_dir))
    )
    name = f"t2_{uuid.uuid4().hex[:8]}"
    _run_to_memory(stream_out, name, mode="update")
    got = {
        (r.window_start, r.window_end): (r.avg_value, r.n_obs, r.n_alerts)
        for r in spark.table(name).collect()
    }

    batch_df = spark.createDataFrame(
        [tuple(r.values()) for r in rows], RAW_SCHEMA
    )
    expect = {
        (r.window_start, r.window_end): (r.avg_value, r.n_obs, r.n_alerts)
        for r in sliding_window_agg(
            enrich_alerts(batch_df), watermark=None
        ).collect()
    }
    assert got == expect
    # 5-min windows sliding by 1 min: every event in 5 windows
    assert sum(v[1] for v in got.values()) == len(rows) * 5


def test_watermark_drops_late_rows(spark, stream_dir, tmp_path):
    """T3: with a 10-minute watermark, a row arriving behind the committed
    watermark is dropped from the aggregate state; the reference's
    no-watermark complete mode would have kept it (documented deviation,
    SURVEY.md §2.9 T3).

    Spark's drop guarantee is relative to the CHECKPOINTED watermark:
    within a single run, a late row for an already-finalized window may
    still be admitted (best-effort semantics). So this test commits the
    watermark via a checkpointed run, then restarts with the late row.
    """
    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")

    def run():
        agg = tumbling_window_agg(
            enrich_alerts(_read_stream(spark, stream_dir))
        )
        q = (
            agg.writeStream.format("json")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    _write_batch(stream_dir, _rows(0, 20), "b0")  # watermark -> BASE+9min
    run()
    late = [
        {
            "city": "Paris",
            "country": "France",
            "temperature": 99.0,
            "windspeed": 0.0,
            "timestamp": BASE_TS - 3600,  # one hour before the stream began
        }
    ]
    _write_batch(stream_dir, late, "b1")
    q = run()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1, "late row must be dropped by the committed watermark"
    rows = spark.read.json(outdir).collect()
    assert rows, "on-time rows must aggregate"
    assert all(r.avg_value != 99.0 for r in rows)


def test_checkpoint_restart_no_duplicates(spark, stream_dir, tmp_path):
    """T4: stop after batch 1, restart with the same checkpoint, feed
    batch 2 — the restarted query must not reprocess batch 1 (file sink is
    append-only, so duplicates would show up as extra rows)."""
    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")
    _write_batch(stream_dir, _rows(0, 10), "b0")

    def start():
        enriched = enrich_alerts(_read_stream(spark, stream_dir)).select(
            "city", "country", "event_time", "temperature", "wind_alert_level"
        )
        return (
            enriched.writeStream.format("json")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    q.awaitTermination(120)
    n1 = spark.read.json(outdir).count()
    assert n1 == 10

    _write_batch(stream_dir, _rows(10, 7), "b1")
    q = start()
    q.awaitTermination(120)
    n2 = spark.read.json(outdir).count()
    assert n2 == 17, f"expected 17 rows after restart, got {n2}"


def test_stream_static_anomaly_join(spark, stream_dir):
    """T6/T9: live stream ⋈ broadcast static profile on the full
    (city, country, month) key; only deviating rows emitted with the T9
    contract fields."""
    normal = _rows(0, 5, temp=20.0)
    hot = _rows(5, 1, temp=45.0)
    cold = _rows(6, 1, temp=-10.0)
    _write_batch(stream_dir, normal + hot + cold, "b0")

    month = time.gmtime(BASE_TS).tm_mon
    profile = spark.createDataFrame(
        [("Paris", "France", month, 20.0, 2.0)],
        "city STRING, country STRING, month INT, value_mean DOUBLE, value_std DOUBLE",
    )
    out = anomaly_stream(enrich_alerts(_read_stream(spark, stream_dir)), profile)
    name = f"t6_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name, mode="append")
    got = spark.table(name).collect()
    assert len(got) == 2
    types = {r.observed_value: r.anomaly_type for r in got}
    assert types[45.0] == "high" and types[-10.0] == "low"
    assert all(
        r.variable == "temperature" and r.is_anomaly and r.expected_value == 20.0
        for r in got
    )


def test_session_window_stream(spark, stream_dir):
    """T10: session windows close after the gap; two bursts 3 hours apart
    with a 5-minute gap -> two sessions. Session windows only support
    append output in streaming, so sessions emit once the watermark passes
    their end — a far-future flush row (other city) advances it."""
    burst1 = _rows(0, 3, step=60)
    burst2 = _rows(0, 3, step=60)
    for r in burst2:
        r["timestamp"] += 3 * 3600
    _write_batch(stream_dir, burst1 + burst2, "b0")
    flush = _rows(0, 1, city="Nice")
    flush[0]["timestamp"] = BASE_TS + 86400  # watermark past both sessions
    _write_batch(stream_dir, flush, "b1")
    out = session_window_agg(
        enrich_alerts(_read_stream(spark, stream_dir)), gap="5 minutes"
    )
    name = f"t10_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name, mode="append")
    rows = [r for r in spark.table(name).collect() if r.city == "Paris"]
    assert len(rows) == 2
    assert all(r.n_obs == 3 for r in rows)
    # session end = last event + gap
    for r in rows:
        assert (r.session_end - r.session_start).total_seconds() == 2 * 60 + 300


def test_parse_kafka_json_shape(spark):
    """T1 parsing path against Kafka-shaped binary value rows."""
    raw = spark.createDataFrame(
        [(json.dumps({"city": "Lyon", "country": "France", "temperature": 21.5,
                      "windspeed": 11.0, "timestamp": BASE_TS}).encode(),)],
        "value BINARY",
    )
    parsed = parse_kafka_json(raw, WEATHER_SCHEMA)
    row = parsed.collect()[0]
    assert (row.city, row.country, row.windspeed) == ("Lyon", "France", 11.0)


def test_stateful_sessionization_matches_session_window(spark, stream_dir):
    """applyInPandasWithState sessionizer == native session_window on the
    same data: two bursts 3h apart per user close into two sessions once
    the watermark (driven by a far-future flush row) passes their
    timeouts; contract session_end = last event + gap."""
    from cours_datalake_dwh_td_kafka_spark.streaming.stateful import (
        sessionize_stateful,
    )

    burst1 = _rows(0, 3, step=60)
    burst2 = _rows(0, 3, step=60)
    for r in burst2:
        r["timestamp"] += 3 * 3600
    _write_batch(stream_dir, burst1 + burst2, "b0")
    flush = _rows(0, 1, city="Nice")
    flush[0]["timestamp"] = BASE_TS + 86400
    _write_batch(stream_dir, flush, "b1")

    enriched = enrich_alerts(_read_stream(spark, stream_dir)).select(
        F.xxhash64("city").alias("user_id"),  # stable per-city key
        "event_time",
        F.col("temperature").alias("value"),
    )
    out = sessionize_stateful(enriched, gap_seconds=300, watermark="10 minutes")
    name = f"tstate_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name, mode="append")
    got = spark.table(name)

    paris = [r for r in got.collect() if r.n_obs == 3]
    assert len(paris) == 2, f"expected 2 closed Paris sessions, got {got.collect()}"
    for r in paris:
        assert (r.session_end - r.session_start).total_seconds() == 2 * 60 + 300
        assert r.sum_value == pytest.approx(60.0)  # 3 x 20.0

    # cross-check against the native session_window operator on the same
    # batch data (both contracts: end = last + gap)
    batch = spark.createDataFrame(
        [tuple(r.values()) for r in burst1 + burst2], RAW_SCHEMA
    )
    bsrc = enrich_alerts(batch).select(
        F.xxhash64("city").alias("user_id"),
        "event_time",
        F.col("temperature").alias("value"),
    )
    native = (
        bsrc.groupBy(F.session_window("event_time", "5 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_obs"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_obs",
            "sum_value",
        )
    )
    want = {tuple(r) for r in native.collect()}
    have = {tuple(r) for r in got.collect() if r.n_obs == 3}
    assert have == want


def test_complete_mode_compat(spark, stream_dir):
    """Reference-compat path: outputMode('complete') with NO watermark
    (work/spark_windowed_aggregation.py:44) — every window ever seen is
    re-emitted each trigger and late rows always merge. Kept as a compat
    option; the engine default is watermarked update/append."""
    _write_batch(stream_dir, _rows(0, 10), "b0")
    late = _rows(0, 1, temp=50.0)
    late[0]["timestamp"] = BASE_TS - 7200  # 2h before the stream
    _write_batch(stream_dir, late, "b1")

    out = tumbling_window_agg(
        enrich_alerts(_read_stream(spark, stream_dir)), watermark=None
    )
    name = f"tc_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name, mode="complete")
    rows = spark.table(name).collect()
    # unbounded state: the late window exists alongside the on-time ones
    assert any(r.avg_value == 50.0 for r in rows)
    assert sum(r.n_obs for r in rows) == 11


def test_stream_dedup_drops_replays(spark, stream_dir):
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import stream_dedup

    b0 = _rows(0, 5)
    _write_batch(stream_dir, b0, "b0")
    _write_batch(stream_dir, b0[:3], "b1")  # replay of 3 records
    _write_batch(stream_dir, _rows(5, 2), "b2")

    out = stream_dedup(enrich_alerts(_read_stream(spark, stream_dir)))
    name = f"sd_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name, mode="append")
    rows = spark.table(name).collect()
    assert len(rows) == 7  # 5 + 2, replays dropped
    assert len({r.event_time for r in rows}) == 7


def test_stream_dedup_keyed_variant(spark, stream_dir):
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import stream_dedup

    # same (city, event_time) arriving twice with different temperature:
    # content fingerprints differ, the keyed dedup still drops the second
    b0 = _rows(0, 3)
    dup = _rows(0, 1, temp=99.0)
    _write_batch(stream_dir, b0, "b0")
    _write_batch(stream_dir, dup, "b1")

    out = stream_dedup(
        enrich_alerts(_read_stream(spark, stream_dir)),
        key_cols=("city", "country", "event_time"),
    )
    name = f"sk_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name, mode="append")
    rows = spark.table(name).collect()
    assert len(rows) == 3
    assert all(r.temperature == 20.0 for r in rows)


def test_write_stream_to_lake_partitioned_layout(spark, stream_dir, tmp_path):
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        write_stream_to_lake,
    )

    _write_batch(stream_dir, _rows(0, 3), "b0")
    _write_batch(stream_dir, _rows(0, 2, city="Lyon"), "b1")

    out_dir = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    q = (
        write_stream_to_lake(
            enrich_alerts(_read_stream(spark, stream_dir)), out_dir, ckpt
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    import glob as g

    parts = sorted(
        p.split(out_dir + "/")[1]
        for p in g.glob(f"{out_dir}/country=*/city=*")
    )
    assert parts == ["country=France/city=Lyon", "country=France/city=Paris"]
    back = spark.read.json(out_dir)
    assert back.count() == 5
    # partition columns round-trip through the directory layout
    assert {r.city for r in back.select("city").distinct().collect()} == {
        "Paris",
        "Lyon",
    }


def test_stateful_session_extends_start_for_late_in_watermark_event(
    spark, stream_dir
):
    """A late-but-in-watermark event that PREDATES the open session's
    start must pull session_start backwards (F.session_window semantics),
    not silently begin the session at the first-seen event."""
    from cours_datalake_dwh_td_kafka_spark.streaming.stateful import (
        sessionize_stateful,
    )

    # batch 0: three on-time events t0, t0+60, t0+120 open a session
    _write_batch(stream_dir, _rows(0, 3, step=60), "b0")
    # batch 1: a LATE event at t0-60 — above the watermark (t0+120-10min),
    # within gap (300s) of the session's last event (t0+120)
    late = _rows(0, 1)
    late[0]["timestamp"] = BASE_TS - 60
    _write_batch(stream_dir, late, "b1")
    # batch 2: far-future flush drives the watermark past the timeout
    flush = _rows(0, 1, city="Nice")
    flush[0]["timestamp"] = BASE_TS + 86400
    _write_batch(stream_dir, flush, "b2")

    enriched = enrich_alerts(_read_stream(spark, stream_dir)).select(
        F.xxhash64("city").alias("user_id"),
        "event_time",
        F.col("temperature").alias("value"),
    )
    out = sessionize_stateful(enriched, gap_seconds=300, watermark="10 minutes")
    name = f"tlate_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name, mode="append")
    sessions = [r for r in spark.table(name).collect() if r.n_obs == 4]
    assert len(sessions) == 1, spark.table(name).collect()
    s = sessions[0]
    assert s.session_start.timestamp() == BASE_TS - 60  # extended backwards
    assert s.session_end.timestamp() == BASE_TS + 120 + 300
    assert s.sum_value == pytest.approx(80.0)  # 4 x 20.0


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream inner interval join (click -> purchase within 10
    min, same user): in-window pairs join, out-of-window and
    wrong-direction pairs don't, and batch execution of the same
    function yields the identical result set."""
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        stream_stream_join,
    )

    ldir, rdir = tmp_path / "clicks", tmp_path / "purchases"
    ldir.mkdir(), rdir.mkdir()
    clicks = [
        {"user_id": 1, "click_id": 10, "ts": BASE_TS},
        {"user_id": 3, "click_id": 30, "ts": BASE_TS + 600},
    ]
    purchases = [
        # joins: 5 min after user 1's click
        {"user_id": 1, "purchase_id": 100, "ts": BASE_TS + 300, "value": 9.5},
        # no join: 15 min after the click (> max_delay)
        {"user_id": 1, "purchase_id": 101, "ts": BASE_TS + 900, "value": 1.0},
        # no join: no click from user 2
        {"user_id": 2, "purchase_id": 102, "ts": BASE_TS + 60, "value": 2.0},
        # no join: purchase BEFORE user 3's click
        {"user_id": 3, "purchase_id": 103, "ts": BASE_TS + 540, "value": 3.0},
    ]
    _write_batch(str(ldir), clicks, "c0")
    _write_batch(str(rdir), purchases, "p0")

    c_schema = "user_id LONG, click_id LONG, ts DOUBLE"
    p_schema = "user_id LONG, purchase_id LONG, ts DOUBLE, value DOUBLE"

    def prep(df, tcol):
        return df.withColumn(tcol, F.timestamp_seconds("ts")).drop("ts")

    def run(cdf, pdf):
        return stream_stream_join(
            prep(cdf, "click_ts"),
            prep(pdf, "purchase_ts"),
            on=("user_id",),
            left_time="click_ts",
            right_time="purchase_ts",
            max_delay="10 minutes",
        )

    sc = spark.readStream.schema(c_schema).json(str(ldir))
    sp = spark.readStream.schema(p_schema).json(str(rdir))
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    _run_to_memory(run(sc, sp), name, mode="append")
    got = {
        (r.click_id, r.purchase_id) for r in spark.table(name).collect()
    }
    assert got == {(10, 100)}

    bc = spark.read.schema(c_schema).json(str(ldir))
    bp = spark.read.schema(p_schema).json(str(rdir))
    batch = {(r.click_id, r.purchase_id) for r in run(bc, bp).collect()}
    assert batch == got


def test_merge_stream_to_lake_upserts(spark, tmp_path):
    """foreachBatch merge sink: replayed/updated keys overwrite in place
    (no duplicates), untouched partitions survive, new keys append."""
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        merge_stream_to_lake,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    schema = "station LONG, region STRING, reading DOUBLE, seq LONG"

    def run():
        s = spark.readStream.schema(schema).json(str(indir))
        q = merge_stream_to_lake(
            s, lake, ckpt, keys=("station",), partition_col="region",
            order_col="seq",
        ).start()
        q.awaitTermination(120)

    _write_batch(
        str(indir),
        [
            {"station": 1, "region": "eu", "reading": 10.0, "seq": 1},
            {"station": 2, "region": "us", "reading": 20.0, "seq": 1},
        ],
        "b0",
    )
    run()
    # second batch: update station 1 TWICE (the higher seq must win —
    # in-batch correction), add station 3; us partition untouched
    _write_batch(
        str(indir),
        [
            {"station": 1, "region": "eu", "reading": 10.5, "seq": 2},
            {"station": 1, "region": "eu", "reading": 11.0, "seq": 3},
            {"station": 3, "region": "eu", "reading": 30.0, "seq": 1},
        ],
        "b1",
    )
    run()
    got = {
        r.station: (r.region, r.reading)
        for r in spark.read.parquet(lake).collect()
    }
    assert got == {1: ("eu", 11.0), 2: ("us", 20.0), 3: ("eu", 30.0)}


def test_merge_lake_restart_with_added_column(spark, tmp_path):
    """Checkpoint-upgrade compatibility (SURVEY §7 hard-point #1): the
    merge sink restarted from its existing checkpoint with an ADDED
    projected column must keep pre-upgrade rows (NULL in the new
    column), upsert across the schema boundary, and write the new
    column for post-upgrade rows."""
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        merge_stream_to_lake,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    def run(schema, project=None):
        s = spark.readStream.schema(schema).json(str(indir))
        if project:
            s = s.select(*project)
        q = merge_stream_to_lake(
            s, lake, ckpt, keys=("station",), partition_col="region",
            order_col="seq",
        ).start()
        q.awaitTermination(120)

    v1 = "station LONG, region STRING, reading DOUBLE, seq LONG"
    _write_batch(
        str(indir),
        [
            {"station": 1, "region": "eu", "reading": 10.0, "seq": 1},
            {"station": 2, "region": "us", "reading": 20.0, "seq": 1},
        ],
        "b0",
    )
    run(v1)

    # upgrade: the stream now projects an extra `quality` column; same
    # checkpoint. Station 1 is corrected post-upgrade, station 2 is
    # untouched pre-upgrade data, station 3 is new.
    v2 = v1 + ", quality STRING"
    _write_batch(
        str(indir),
        [
            {"station": 1, "region": "eu", "reading": 10.5, "seq": 2,
             "quality": "good"},
            {"station": 3, "region": "eu", "reading": 30.0, "seq": 1,
             "quality": "poor"},
        ],
        "b1",
    )
    run(v2)
    got = {
        r.station: (r.reading, r.quality)
        for r in spark.read.option("mergeSchema", "true")
        .parquet(lake)
        .collect()
    }
    assert got == {
        1: (10.5, "good"),
        2: (20.0, None),  # pre-upgrade row survives with NULL quality
        3: (30.0, "poor"),
    }


def test_windowed_agg_restart_with_added_column(spark, stream_dir, tmp_path):
    """The sliding-window agg restarted from its checkpoint with an
    added DOWNSTREAM projection (derived after the stateful agg, so the
    state-store schema is untouched) keeps processing; rows emitted
    before the upgrade lack the column, rows after carry it."""
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        sliding_window_agg,
    )

    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")

    def run(with_ratio: bool):
        agg = sliding_window_agg(
            enrich_alerts(_read_stream(spark, stream_dir))
        )
        if with_ratio:
            agg = agg.withColumn(
                "alert_ratio",
                F.round(F.col("n_alerts") / F.col("n_obs"), 6),
            )
        q = (
            agg.writeStream.format("json")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1 + a watermark-advancing flush so windows finalize pre-upgrade
    _write_batch(stream_dir, _rows(0, 5, step=60), "b0")
    flush1 = _rows(0, 1, city="Nice")
    flush1[0]["timestamp"] = BASE_TS + 3600
    _write_batch(stream_dir, flush1, "b0f")
    run(with_ratio=False)
    n1 = spark.read.json(outdir).count()
    assert n1 > 0

    # upgrade: restart same checkpoint with the derived column; new data
    later = _rows(0, 5, step=60)
    for r in later:
        r["timestamp"] += 7200
    _write_batch(stream_dir, later, "b1")
    flush2 = _rows(0, 1, city="Nice")
    flush2[0]["timestamp"] = BASE_TS + 86400
    _write_batch(stream_dir, flush2, "b1f")
    run(with_ratio=True)

    rows = spark.read.json(outdir).collect()
    assert len(rows) > n1, "restarted query must emit the new windows"
    with_col = [r for r in rows if "alert_ratio" in r.asDict()
                and r["alert_ratio"] is not None]
    without_col = [r for r in rows if r.asDict().get("alert_ratio") is None]
    assert with_col, "post-upgrade rows must carry the derived column"
    assert without_col, "pre-upgrade rows must survive without it"


def test_transform_with_state_matches_apply_in_pandas(spark, stream_dir):
    """The Spark 4 transformWithState sessionizer closes the same
    sessions as the applyInPandasWithState one on identical input
    (requires the RocksDB state store provider)."""
    from cours_datalake_dwh_td_kafka_spark.streaming.stateful import (
        sessionize_transform_with_state,
    )

    burst1 = _rows(0, 3, step=60)
    burst2 = _rows(0, 3, step=60)
    for r in burst2:
        r["timestamp"] += 3 * 3600
    _write_batch(stream_dir, burst1 + burst2, "b0")
    flush = _rows(0, 1, city="Nice")
    flush[0]["timestamp"] = BASE_TS + 86400
    _write_batch(stream_dir, flush, "b1")

    enriched = enrich_alerts(_read_stream(spark, stream_dir)).select(
        F.xxhash64("city").alias("user_id"),
        "event_time",
        F.col("temperature").alias("value"),
    )
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", rocks
        )
        out = sessionize_transform_with_state(
            enriched, gap_seconds=300, watermark="10 minutes"
        )
        name = f"tws_{uuid.uuid4().hex[:8]}"
        try:
            _run_to_memory(out, name, mode="append")
        except Exception as e:  # pragma: no cover - environment-specific
            # ROOT CAUSE (diagnosed round 5): Spark's
            # StreamingPythonRunner boots a separate driver-side worker
            # for transformWithStateInPandas whose handshake imports
            # google.protobuf — absent in this sandbox (no pip), so the
            # worker exits -2 before any user code runs; a MINIMAL
            # upstream example crashes identically
            # (ImportError: cannot import name 'descriptor' from
            # 'google.protobuf'). On any machine with `pip install
            # protobuf` this test runs as written — skip like the Kafka
            # broker tests.
            pytest.skip(f"transformWithState worker unavailable: {e}")
        got = [r for r in spark.table(name).collect() if r.n_obs == 3]
        assert len(got) == 2, spark.table(name).collect()
        for r in got:
            assert (
                r.session_end - r.session_start
            ).total_seconds() == 2 * 60 + 300
            assert r.sum_value == pytest.approx(60.0)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_stream_ewma_matches_batch_fold(spark, stream_dir):
    """The watermark-ordered streaming EWMA, after a flush row pushes the
    watermark past every real event, must equal the batch array-fold
    (operators/timeseries.ewma) bit-for-bit — including when a late (but
    in-watermark) second batch delivers events that PREDATE already-
    buffered ones (the ordering hazard the pending buffer exists for)."""
    from cours_datalake_dwh_td_kafka_spark.operators.timeseries import ewma
    from cours_datalake_dwh_td_kafka_spark.streaming.stateful import (
        ewma_stateful,
    )

    temps1 = [20.0, 24.0, 18.0, 30.0]
    temps2 = [22.0, 26.0]  # arrive later but sit BETWEEN batch-1 events
    b1 = []
    for i, t in enumerate(temps1):
        r = _rows(0, 1, temp=t)[0]
        r["timestamp"] = BASE_TS + i * 120  # 0s,120s,240s,360s
        b1.append(r)
    b2 = []
    for i, t in enumerate(temps2):
        r = _rows(0, 1, temp=t)[0]
        r["timestamp"] = BASE_TS + 60 + i * 120  # 60s,180s: interleave
        b2.append(r)
    _write_batch(stream_dir, b1, "b0")
    _write_batch(stream_dir, b2, "b1")
    flush = _rows(0, 1, city="Nice")
    flush[0]["timestamp"] = BASE_TS + 86400
    _write_batch(stream_dir, flush, "b2")

    enriched = enrich_alerts(_read_stream(spark, stream_dir)).select(
        F.xxhash64("city").alias("user_id"),
        "event_time",
        F.col("temperature").alias("value"),
    )
    out = ewma_stateful(enriched, watermark="10 minutes")
    name = f"tewma_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name, mode="update")
    got = spark.table(name).collect()

    paris_key = None
    batch = spark.createDataFrame(
        [tuple(r.values()) for r in b1 + b2], RAW_SCHEMA
    )
    bsrc = enrich_alerts(batch).select(
        F.xxhash64("city").alias("user_id"),
        F.col("event_time").alias("ts"),
        F.monotonically_increasing_id().alias("event_id"),
        F.col("temperature").alias("value"),
    )
    want = {r.user_id: (r.n_events, r.ewma_value) for r in ewma(bsrc).collect()}
    (paris_key,) = {u for u in want if want[u][0] == 6}

    # update mode: the row with the largest n_folded is the final state
    final = max(
        (r for r in got if r.user_id == paris_key), key=lambda r: r.n_folded
    )
    assert final.n_folded == 6
    # batch twin rounds to 6dp at output; the stream emits the raw fold
    assert round(final.ewma_value, 6) == want[paris_key][1]


def test_curate_stream_gates_and_dedups(spark, stream_dir):
    """Speed-layer curation: a low-quality doc is rejected at the gate, a
    re-published doc (same content, new doc_id) is dropped by the
    content fingerprint, and the surviving quality scores equal the
    batch pipeline's on identical text."""
    import json as _json
    import os

    from pyspark.sql.types import LongType, StructType as _St, StructField as _Sf
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        curate_stream,
    )

    good_a = (
        "the quick brown fox jumps over a lazy dog and then it runs to "
        "the river in the morning light while birds of every kind sing "
        + " ".join(f"word{i}" for i in range(80))
    )
    good_b = (
        "a completely different story about ships and the open sea told "
        "in many distinct words " + " ".join(f"term{i}" for i in range(90))
    )
    low_q = "a a a a"  # 4 repeated stopword tokens -> far below the gate
    good_c = (
        "yet another long and varied document about mountains it is "
        + " ".join(f"peak{i}" for i in range(85))
    )

    def doc_rows(rows):
        return [
            {
                "doc_id": i,
                "timestamp": BASE_TS + i * 60,
                "text": t,
                "source": "web",
            }
            for i, t in rows
        ]

    global _batch_seq
    b0 = doc_rows([(1, good_a), (2, low_q), (3, good_b)])
    b1 = doc_rows([(4, good_a), (5, good_c)])  # 4 = re-publish of 1
    _write_batch(stream_dir, b0, "d0")
    _write_batch(stream_dir, b1, "d1")

    schema = _St(
        [
            _Sf("doc_id", LongType()),
            _Sf("timestamp", DoubleType()),
            _Sf("text", StringType()),
            _Sf("source", StringType()),
        ]
    )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(stream_dir)
        .withColumn("event_time", F.timestamp_seconds(F.col("timestamp")))
    )
    out = curate_stream(src)
    name = f"tcur_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name, mode="append")
    got = {r.doc_id: r for r in spark.table(name).collect()}

    assert set(got) == {1, 3, 5}, f"kept {sorted(got)}"
    assert all(r.quality_score >= 0.5 for r in got.values())

    # batch twin scores the identical text identically
    from cours_datalake_dwh_td_kafka_spark.operators.text_analysis import (
        quality_scores,
    )

    batch = spark.createDataFrame(
        [(i, t, len(t)) for i, t in [(1, good_a), (3, good_b), (5, good_c)]],
        "doc_id long, text string, n_chars long",
    )
    want = {
        r.doc_id: r.quality_score for r in quality_scores(batch).collect()
    }
    for i, r in got.items():
        assert r.quality_score == pytest.approx(want[i], abs=1e-6), i


def test_trending_topk_stream_matches_batch(spark, stream_dir, tmp_path):
    """Trending top-k: the foreachBatch-ranked final snapshot of the
    streaming count aggregate equals rank_topk_snapshot over the batch
    twin of the same tumbling-window counts — including the tie-break
    (two cities on equal counts rank alphabetically)."""
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        rank_topk_snapshot,
        trending_topk,
    )

    b1 = (
        _rows(0, 4, city="Paris")
        + _rows(0, 3, city="Lyon")
        + _rows(0, 3, city="Nice")  # ties Lyon: alphabetical break
        + _rows(0, 1, city="Brest")
    )
    b2 = _rows(10, 2, city="Brest")  # second window, different leader
    _write_batch(stream_dir, b1, "b0")
    _write_batch(stream_dir, b2, "b1")

    enriched = enrich_alerts(_read_stream(spark, stream_dir))
    counts = trending_topk(enriched, window="5 minutes")
    out_dir = str(tmp_path / "topk")

    def sink(batch_df, batch_id):
        # each micro-batch ranks the aggregate snapshot it was handed;
        # overwrite = the dashboard shows the latest board
        rank_topk_snapshot(batch_df, k=3).write.mode("overwrite").parquet(
            out_dir
        )

    q = (
        counts.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.city, r.n_events, r.rank)
        for r in spark.read.parquet(out_dir).collect()
    }

    batch = spark.createDataFrame(
        [tuple(r.values()) for r in b1 + b2], RAW_SCHEMA
    )
    bcounts = trending_topk(
        enrich_alerts(batch), window="5 minutes", watermark=None
    )
    want = {
        (r.window_start, r.city, r.n_events, r.rank)
        for r in rank_topk_snapshot(bcounts, k=3).collect()
    }
    assert got == want
    # per-window board depth respects k and the tie-break is stable
    per_window = {}
    for w_start, city, n, rank in sorted(got):
        per_window.setdefault(w_start, []).append((rank, city, n))
    assert all(len(v) <= 3 for v in per_window.values())


def test_stream_cusum_matches_batch_fold(spark, stream_dir):
    """Streaming CUSUM vs a fixed target mean reproduces the batch
    operator's one-sided maxima exactly (target_mu parity mode) —
    including when a late-but-in-watermark batch delivers events that
    PREDATE buffered ones."""
    from cours_datalake_dwh_td_kafka_spark.operators.timeseries import (
        cusum_changepoint,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.stateful import (
        cusum_stateful,
    )

    # mu with a sub-micro fraction + a >6dp reading pin the DOUBLE
    # rounding order: the batch twin rounds value to 6 dp FIRST, then
    # rounds (v6 - mu); folding the two into one round of (v - mu)
    # lands one micro-unit off on 18.00000065 (−3.999999 vs −4.000000).
    mu = 22.00000025
    temps1 = [20.0, 24.0, 18.00000065, 30.0]
    temps2 = [22.5, 26.0]  # interleave between batch-1 events
    b1 = []
    for i, t in enumerate(temps1):
        r = _rows(0, 1, temp=t)[0]
        r["timestamp"] = BASE_TS + i * 120
        b1.append(r)
    b2 = []
    for i, t in enumerate(temps2):
        r = _rows(0, 1, temp=t)[0]
        r["timestamp"] = BASE_TS + 60 + i * 120
        b2.append(r)
    _write_batch(stream_dir, b1, "b0")
    _write_batch(stream_dir, b2, "b1")
    flush = _rows(0, 1, city="Nice")
    flush[0]["timestamp"] = BASE_TS + 86400
    _write_batch(stream_dir, flush, "b2")

    enriched = enrich_alerts(_read_stream(spark, stream_dir)).select(
        F.xxhash64("city").alias("user_id"),
        "event_time",
        F.col("temperature").alias("value"),
    )
    out = cusum_stateful(enriched, mu=mu, watermark="10 minutes")
    name = f"tcusum_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name, mode="update")
    got = spark.table(name).collect()

    batch = spark.createDataFrame(
        [tuple(r.values()) for r in b1 + b2], RAW_SCHEMA
    )
    bsrc = enrich_alerts(batch).select(
        F.xxhash64("city").alias("user_id"),
        F.col("event_time").alias("ts"),
        F.monotonically_increasing_id().alias("event_id"),
        F.col("temperature").alias("value"),
    )
    want = {
        r.user_id: (r.n_events, r.max_pos_cusum, r.max_neg_cusum)
        for r in cusum_changepoint(bsrc, target_mu=mu).collect()
    }
    (paris_key,) = {u for u in want if want[u][0] == 6}
    final = max(
        (r for r in got if r.user_id == paris_key), key=lambda r: r.n_folded
    )
    assert final.n_folded == 6
    assert final.max_pos_cusum == want[paris_key][1]
    assert final.max_neg_cusum == want[paris_key][2]


def test_lambda_architecture_end_to_end(spark, stream_dir, tmp_path):
    """The reference's full Lambda topology, assembled from the engine's
    own pieces: a BATCH layer (historical events committed to the
    versioned lake), a SPEED layer (file-stream -> enrich -> partitioned
    streaming lake sink), and a SERVING view that unions the two and
    must equal a pure-batch recompute over ALL events — the Lambda
    correctness contract."""
    from cours_datalake_dwh_td_kafka_spark.lake import lake_commit, lake_read
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        write_stream_to_lake,
    )

    hist_rows = _rows(0, 12, temp=21.0) + _rows(0, 6, city="Lyon", temp=27.0)
    live_rows = _rows(100, 8, temp=31.0) + _rows(
        100, 4, city="Lyon", temp=19.0
    )

    # batch layer: history enriched once, committed to the lake
    batch_src = spark.createDataFrame(
        [tuple(r.values()) for r in hist_rows], RAW_SCHEMA
    )
    batch_path = str(tmp_path / "batch_lake")
    lake_commit(enrich_alerts(batch_src), batch_path)

    # speed layer: live stream through the SAME enrichment into a
    # partitioned streaming sink
    _write_batch(stream_dir, live_rows, "live0")
    speed_path = str(tmp_path / "speed")
    q = (
        write_stream_to_lake(
            enrich_alerts(_read_stream(spark, stream_dir)),
            speed_path,
            str(tmp_path / "ckpt"),
            fmt="parquet",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # serving: batch snapshot UNION speed partition, one aggregate
    def per_city(df):
        return {
            (r.city, r.n, round(r.avg_t, 6), r.n_alerts)
            for r in df.groupBy("city")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.avg("temperature").alias("avg_t"),
                F.sum(
                    (F.col("wind_alert_level") != "level_0").cast("int")
                ).alias("n_alerts"),
            )
            .collect()
        }

    cols = ["city", "temperature", "wind_alert_level"]
    serving = lake_read(spark, batch_path).select(*cols).unionByName(
        spark.read.parquet(speed_path).select(*cols)
    )

    # ground truth: one batch pass over EVERYTHING
    truth_src = spark.createDataFrame(
        [tuple(r.values()) for r in hist_rows + live_rows], RAW_SCHEMA
    )
    truth = enrich_alerts(truth_src).select(*cols)

    assert per_city(serving) == per_city(truth)


def test_trending_topk_restart_from_checkpoint(spark, stream_dir, tmp_path):
    """The r5 trending board under the reference's restart discipline
    (T4): kill the query after the first window's batches commit, land
    MORE data (late rows for the same window plus a new window),
    restart from the SAME checkpoint — the resumed aggregate must fold
    old state + new rows exactly once, so the final board is identical
    to a batch recompute over everything (KAFKA exos §5's complete-mode
    windowed count, with durability added)."""
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        rank_topk_snapshot,
        trending_topk,
    )

    out_dir = str(tmp_path / "board")
    ckpt = str(tmp_path / "ckpt")

    def sink(batch_df, batch_id):
        rank_topk_snapshot(batch_df, k=3).write.mode("overwrite").parquet(
            out_dir
        )

    def run_once():
        enriched = enrich_alerts(_read_stream(spark, stream_dir))
        counts = trending_topk(enriched, window="5 minutes")
        q = (
            counts.writeStream.outputMode("complete")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = _rows(0, 3, city="Paris") + _rows(0, 2, city="Lyon")
    _write_batch(stream_dir, b1, "b0")
    run_once()  # first life: window-1 partial counts committed

    first_board = {
        (r.window_start, r.city, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert first_board, "first life produced no board"

    # second life input: LATE rows for window 1 + a fresh window
    b2 = _rows(0, 2, city="Lyon") + _rows(0, 1, city="Nice")
    b3 = _rows(10, 2, city="Brest")
    _write_batch(stream_dir, b2, "b1")
    _write_batch(stream_dir, b3, "b2")
    run_once()  # restart from checkpoint — must NOT re-count b0

    got = {
        (r.window_start, r.city, r.n_events, r.rank)
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = spark.createDataFrame(
        [tuple(r.values()) for r in b1 + b2 + b3], RAW_SCHEMA
    )
    bcounts = trending_topk(
        enrich_alerts(batch), window="5 minutes", watermark=None
    )
    want = {
        (r.window_start, r.city, r.n_events, r.rank)
        for r in rank_topk_snapshot(bcounts, k=3).collect()
    }
    assert got == want
    # the restart MOVED the board (Lyon 2 -> 4 overtakes Paris 3): state
    # was resumed, not reset, and b0 was not double-counted
    lyon = {t for t in got if t[1] == "Lyon"}
    assert any(n == 4 for (_, _, n, _) in lyon), got


def test_stream_gaps_match_batch_lag(spark, stream_dir):
    """The watermark-ordered streaming gap extractor, after a flush row
    pushes the watermark past every real event, must emit EXACTLY the
    batch LAG-window gaps (the inter_event_time_distribution input) —
    including when a late-but-in-watermark second batch delivers events
    that interleave BETWEEN already-buffered ones (each such event
    changes its successor's predecessor, the hazard the pending buffer
    exists for)."""
    from pyspark.sql import Window

    from cours_datalake_dwh_td_kafka_spark.streaming.stateful import (
        gap_stateful,
    )

    b1 = []
    for i in range(4):
        r = _rows(0, 1)[0]
        r["timestamp"] = BASE_TS + i * 120  # 0s,120s,240s,360s
        b1.append(r)
    b2 = []
    for i in range(2):
        r = _rows(0, 1)[0]
        r["timestamp"] = BASE_TS + 60 + i * 120  # 60s,180s: interleave
        b2.append(r)
    _write_batch(stream_dir, b1, "b0")
    _write_batch(stream_dir, b2, "b1")
    flush = _rows(0, 1, city="Nice")
    flush[0]["timestamp"] = BASE_TS + 86400
    _write_batch(stream_dir, flush, "b2")

    enriched = enrich_alerts(_read_stream(spark, stream_dir)).select(
        F.xxhash64("city").alias("user_id"), "event_time"
    )
    out = gap_stateful(enriched, watermark="10 minutes")
    name = f"tgap_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name, mode="append")
    got = sorted(
        (r.user_id, r.gap_s) for r in spark.table(name).collect()
    )

    batch = spark.createDataFrame(
        [tuple(r.values()) for r in b1 + b2], RAW_SCHEMA
    )
    bsrc = enrich_alerts(batch).select(
        F.xxhash64("city").alias("user_id"),
        F.col("event_time").alias("ts"),
        F.monotonically_increasing_id().alias("event_id"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = sorted(
        (r.user_id, r.gap_s)
        for r in bsrc.select(
            "user_id",
            F.lag("ts").over(w).alias("prev_ts"),
            "ts",
        )
        .where(F.col("prev_ts").isNotNull())  # first event has no gap
        .select(
            "user_id",
            F.greatest(
                F.floor(
                    (F.unix_micros("ts") - F.unix_micros("prev_ts")) / 1e6
                ).cast("bigint"),
                F.lit(1),
            ).alias("gap_s"),
        )
        .collect()
    )
    # interleaved batch-2 events split four 120s gaps into 60s halves;
    # the last original gap (240s->360s) stays 120s
    assert {g for _, g in want} == {60, 120}
    assert got == want and len(got) == 5


@pytest.mark.slow
def test_stream_image_dedup_drops_perceptual_copies(spark, tmp_path):
    """A re-encoded, brightness-shifted copy has different BYTES (the
    fingerprint dedup would keep it) but the identical pHash — the
    perceptual stream dedup keeps the first and drops the copy while
    distinct images pass through."""
    import numpy as np

    from cours_datalake_dwh_td_kafka_spark.operators.multimodal import (
        encode_bmp24,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        stream_image_dedup,
    )

    def img(seed: int, shift: int = 0) -> bytes:
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 200, size=(8, 7, 3)).astype(np.int64)
        return encode_bmp24(np.minimum(px + shift, 255).astype(np.uint8))

    indir = tmp_path / "imgs"
    indir.mkdir()
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def write_batch(name, rows):
        # the file stream source lists FILES, not nested write dirs:
        # write to a scratch dir, then move the single part file in
        scratch = tmp_path / f"scratch_{name}"
        spark.createDataFrame(
            rows, "img_id BIGINT, payload BINARY, event_time TIMESTAMP"
        ).coalesce(1).write.parquet(str(scratch))
        part = next(scratch.glob("part-*.parquet"))
        part.rename(indir / f"{name}.parquet")

    write_batch("b0", [(1, img(7), t0)])
    # copy of image 7 with +3 brightness (bytes differ, phash equal),
    # a genuinely distinct image, and a POISONED record (truncated BMP)
    # that must be dropped without killing the stream
    write_batch(
        "b1",
        [
            (2, img(7, shift=3), t0 + datetime.timedelta(minutes=1)),
            (3, img(8), t0 + datetime.timedelta(minutes=1)),
            (4, img(9)[:20], t0 + datetime.timedelta(minutes=1)),
        ],
    )
    src = (
        spark.readStream.schema(
            "img_id BIGINT, payload BINARY, event_time TIMESTAMP"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(indir))
    )
    out = stream_image_dedup(src)
    name = f"sid_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = sorted(r.img_id for r in spark.table(name).collect())
    assert kept == [1, 3]  # the perceptual copy (img 2) dropped


@pytest.mark.slow
def test_stream_audio_dedup_drops_gain_remasters(spark, tmp_path):
    """A gain-x2 re-master has different BYTES (the fingerprint dedup
    would keep it) but the identical energy-envelope hash — the
    perceptual stream dedup keeps the first and drops the copy while
    distinct clips pass through, and a truncated WAV is dropped without
    killing the stream."""
    import numpy as np

    from cours_datalake_dwh_td_kafka_spark.operators.multimodal import (
        encode_wav_pcm16,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        stream_audio_dedup,
    )

    def clip(seed: int, gain: int = 1) -> bytes:
        rng = np.random.RandomState(seed)
        amps = np.repeat(rng.randint(50, 800, size=8), 64)
        carrier = np.where((np.arange(512) // 4) % 2 == 0, 1, -1)
        return encode_wav_pcm16(
            (amps * carrier * gain).astype("<i2"), 8000
        )

    indir = tmp_path / "clips"
    indir.mkdir()
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def write_batch(name, rows):
        scratch = tmp_path / f"scratch_{name}"
        spark.createDataFrame(
            rows, "clip_id BIGINT, payload BINARY, event_time TIMESTAMP"
        ).coalesce(1).write.parquet(str(scratch))
        part = next(scratch.glob("part-*.parquet"))
        part.rename(indir / f"{name}.parquet")

    write_batch("b0", [(1, clip(5), t0)])
    write_batch(
        "b1",
        [
            (2, clip(5, gain=2), t0 + datetime.timedelta(minutes=1)),
            (3, clip(6), t0 + datetime.timedelta(minutes=1)),
            (4, clip(7)[:30], t0 + datetime.timedelta(minutes=1)),
        ],
    )
    src = (
        spark.readStream.schema(
            "clip_id BIGINT, payload BINARY, event_time TIMESTAMP"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(indir))
    )
    out = stream_audio_dedup(src)
    name = f"sad_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = sorted(r.clip_id for r in spark.table(name).collect())
    assert kept == [1, 3]  # the gain re-master (clip 2) dropped


@pytest.mark.slow
def test_stream_contamination_alerts(spark, tmp_path):
    """An arriving doc sharing an 8-gram with the static benchmark set
    raises exactly ONE alert (many shared shingles collapse on doc_id);
    clean docs raise none."""
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        stream_contamination_alerts,
    )

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    bench = spark.createDataFrame(
        [(1000, bench_text)], "doc_id BIGINT, text STRING"
    )
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    indir = tmp_path / "docs"
    indir.mkdir()

    def write_batch(name, rows):
        scratch = tmp_path / f"scratch_{name}"
        spark.createDataFrame(
            rows, "doc_id BIGINT, text STRING, event_time TIMESTAMP"
        ).coalesce(1).write.parquet(str(scratch))
        next(scratch.glob("part-*.parquet")).rename(
            indir / f"{name}.parquet"
        )

    # doc 1 quotes 9 consecutive benchmark tokens (two shared 8-grams);
    # doc 2 shares words but never 8 consecutive ones
    write_batch(
        "b0",
        [
            (
                1,
                "intro alpha beta gamma delta epsilon zeta eta theta iota end",
                t0,
            ),
            (2, "alpha beta gamma delta unrelated zeta eta theta iota", t0),
        ],
    )
    src = (
        spark.readStream.schema(
            "doc_id BIGINT, text STRING, event_time TIMESTAMP"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(indir))
    )
    out = stream_contamination_alerts(src, bench)
    name = f"sca_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(name).collect()
    assert [(r.doc_id, r.contaminated) for r in rows] == [(1, True)]


def test_stream_holt_matches_batch_fold(spark, stream_dir):
    """The watermark-ordered streaming Holt fold, after a flush row
    pushes the watermark past every real event, must equal the batch
    struct-fold (operators/timeseries.holt_forecast) bit-for-bit —
    including interleaved late-but-in-watermark arrivals."""
    from cours_datalake_dwh_td_kafka_spark.operators.timeseries import (
        holt_forecast,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.stateful import (
        holt_stateful,
    )

    temps1 = [20.0, 24.0, 18.0, 30.0]
    temps2 = [22.0, 26.0]  # arrive later but sit BETWEEN batch-1 events
    b1 = []
    for i, t in enumerate(temps1):
        r = _rows(0, 1, temp=t)[0]
        r["timestamp"] = BASE_TS + i * 120
        b1.append(r)
    b2 = []
    for i, t in enumerate(temps2):
        r = _rows(0, 1, temp=t)[0]
        r["timestamp"] = BASE_TS + 60 + i * 120
        b2.append(r)
    _write_batch(stream_dir, b1, "b0")
    _write_batch(stream_dir, b2, "b1")
    flush = _rows(0, 1, city="Nice")
    flush[0]["timestamp"] = BASE_TS + 86400
    _write_batch(stream_dir, flush, "b2")

    enriched = enrich_alerts(_read_stream(spark, stream_dir)).select(
        F.xxhash64("city").alias("user_id"),
        "event_time",
        F.col("temperature").alias("value"),
    )
    out = holt_stateful(enriched, watermark="10 minutes")
    name = f"tholt_{uuid.uuid4().hex[:8]}"
    _run_to_memory(out, name, mode="update")
    got = spark.table(name).collect()

    batch = spark.createDataFrame(
        [tuple(r.values()) for r in b1 + b2], RAW_SCHEMA
    )
    bsrc = enrich_alerts(batch).select(
        F.xxhash64("city").alias("user_id"),
        F.col("event_time").alias("ts"),
        F.monotonically_increasing_id().alias("event_id"),
        F.col("temperature").alias("value"),
    )
    want = {
        r.user_id: (r.n_events, r.level, r.trend, r.forecast_1)
        for r in holt_forecast(bsrc).collect()
    }
    (paris_key,) = {u for u in want if want[u][0] == 6}
    final = max(
        (r for r in got if r.user_id == paris_key), key=lambda r: r.n_folded
    )
    assert final.n_folded == 6
    # batch twin rounds to 6dp at output; the stream emits the raw fold
    assert round(final.level, 6) == want[paris_key][1]
    assert round(final.trend, 6) == want[paris_key][2]
    assert round(final.forecast_1, 6) == want[paris_key][3]


def test_stream_cell_occupancy_matches_batch_counts(spark, tmp_path):
    """The streaming quantizer-occupancy monitor must report exactly the
    batch per-cell histogram for the same rows (the assignment kernel is
    shared verbatim, the windowed count is the only streaming part), and
    a vector burst that belongs to one cell must land in that cell."""
    import numpy as np

    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.operators.clustering import (
        kmeans_lloyd,
        with_cell_assign,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        stream_cell_occupancy,
    )

    from tests.conftest import SF_SMOKE

    e = load_table(spark, str(SF_SMOKE), "embeddings")
    cent = (
        kmeans_lloyd(e, rounds=1)
        .select("cell", "pos", "c")
        .localCheckpoint(eager=True)
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    vecs = e.select("vec_id", "embedding").withColumn(
        "event_time", F.lit(t0).cast("timestamp")
    )
    indir = tmp_path / "vecs"
    indir.mkdir()
    scratch = tmp_path / "scratch"
    vecs.coalesce(1).write.parquet(str(scratch))
    next(scratch.glob("part-*.parquet")).rename(indir / "b0.parquet")

    src = spark.readStream.schema(
        "vec_id BIGINT, embedding ARRAY<FLOAT>, event_time TIMESTAMP"
    ).parquet(str(indir))
    out = stream_cell_occupancy(src, cent, window="10 minutes")
    name = f"occ_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.cell): r.n
        for r in spark.table(name).collect()
    }
    want = {
        r.cell: r.n
        for r in with_cell_assign(vecs, cent)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and sum(got.values()) == e.count()


def test_stream_near_dup_alerts_match_batch_gate(spark, tmp_path):
    """The streaming near-dup alert set must equal the batch
    incremental near-dup gate's flagged-doc set on the same rows, emit
    exactly one alert per flagged doc, and pass clean docs silently."""
    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.operators.dedup import (
        INCREMENT_SPLIT,
        incremental_near_dups,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        stream_near_dup_alerts,
    )
    from tests.conftest import SF_ORACLE

    d = load_table(spark, SF_ORACLE, "documents")
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = lo + int((hi - lo) * INCREMENT_SPLIT)
    corpus = d.where(F.col("doc_id") < cut)
    inc = d.where(F.col("doc_id") >= cut)

    want = {
        r.inc_doc
        for r in incremental_near_dups(corpus, inc).collect()
    }
    assert want, "testdata should contain cross-boundary near-dups"

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    indir = tmp_path / "docs"
    indir.mkdir()
    scratch = tmp_path / "scratch"
    inc.select("doc_id", "text").withColumn(
        "event_time", F.lit(t0).cast("timestamp")
    ).coalesce(1).write.parquet(str(scratch))
    next(scratch.glob("part-*.parquet")).rename(indir / "b0.parquet")

    src = spark.readStream.schema(
        "doc_id BIGINT, text STRING, event_time TIMESTAMP"
    ).parquet(str(indir))
    out = stream_near_dup_alerts(src, corpus)
    name = f"snd_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table(name).collect()
    got = {r.doc_id for r in rows}
    assert got == want
    assert len(rows) == len(got)  # one alert per flagged doc


@pytest.mark.slow
def test_stream_near_dup_alerts_restart_keeps_dedup_state(spark, tmp_path):
    """Kill-and-resume for the near-dup alert stream: after a restart
    from the checkpoint, a REPLAYED flagged doc fires no second alert
    (the watermark-dedup state survived), while a newly flagged doc in
    the same post-restart batch alerts exactly once."""
    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.operators.dedup import (
        INCREMENT_SPLIT,
        incremental_near_dups,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        stream_near_dup_alerts,
    )
    from tests.conftest import SF_ORACLE

    d = load_table(spark, SF_ORACLE, "documents")
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = lo + int((hi - lo) * INCREMENT_SPLIT)
    corpus = d.where(F.col("doc_id") < cut)
    inc = d.where(F.col("doc_id") >= cut)
    flagged = sorted(
        {r.inc_doc for r in incremental_near_dups(corpus, inc).collect()}
    )
    assert len(flagged) >= 2, "need two flagged docs for the replay test"
    first, second = flagged[0], flagged[1]
    texts = {
        r.doc_id: r.text
        for r in inc.where(F.col("doc_id").isin([first, second])).collect()
    }

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    indir = tmp_path / "docs"
    indir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")

    def write_batch(name, rows):
        scratch = tmp_path / f"scratch_{name}"
        spark.createDataFrame(
            rows, "doc_id BIGINT, text STRING, event_time TIMESTAMP"
        ).coalesce(1).write.parquet(str(scratch))
        next(scratch.glob("part-*.parquet")).rename(indir / f"{name}.parquet")

    def start():
        src = spark.readStream.schema(
            "doc_id BIGINT, text STRING, event_time TIMESTAMP"
        ).parquet(str(indir))
        return (
            stream_near_dup_alerts(src, corpus)
            .writeStream.format("json")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    write_batch("b0", [(first, texts[first], t0)])
    q = start()
    q.awaitTermination(120)
    out1 = spark.read.json(outdir)
    assert out1.count() == 1 and out1.first().doc_id == first

    # restart: replay the SAME doc (same id+text, inside the watermark)
    # plus a new flagged doc
    write_batch(
        "b1",
        [
            (first, texts[first], t0 + datetime.timedelta(minutes=1)),
            (second, texts[second], t0 + datetime.timedelta(minutes=1)),
        ],
    )
    q = start()
    q.awaitTermination(120)
    rows = spark.read.json(outdir).collect()
    ids = sorted(r.doc_id for r in rows)
    assert ids == sorted([first, second]), f"got {ids}"


def test_commit_stream_to_lake_exactly_once_commits(
    spark, tmp_path, monkeypatch
):
    """Round-10 streaming lake ingestion: each micro-batch lands as ONE
    atomic versioned commit (time travel + CDC see streamed rows), and
    a batch replayed after a kill between the lake commit and the
    checkpoint ack is detected via the manifest's recorded batch id and
    skipped — no duplicate version, no duplicate rows."""
    import cours_datalake_dwh_td_kafka_spark.lake as lakemod
    from cours_datalake_dwh_td_kafka_spark.lake import (
        current_version,
        lake_diff,
        lake_maintenance_plan,
        lake_read,
        last_stream_batch_id,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        commit_stream_to_lake,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    schema = "station LONG, reading DOUBLE"

    def run():
        s = spark.readStream.schema(schema).json(str(indir))
        q = commit_stream_to_lake(s, lake, ckpt).start()
        q.awaitTermination(120)

    # arm a genuine kill INSIDE the window: the lake commit lands, then
    # the sink dies before Spark can ack the batch to the checkpoint
    # (the sink rides lake_commit_occ since round 14)
    orig_commit = lakemod.lake_commit_occ
    state = {"crash": True}

    def crashing(df, path, **kw):
        v = orig_commit(df, path, **kw)
        if state["crash"]:
            state["crash"] = False
            raise RuntimeError("simulated kill after commit, before ack")
        return v

    monkeypatch.setattr(lakemod, "lake_commit_occ", crashing)
    _write_batch(
        str(indir),
        [{"station": 1, "reading": 10.0}, {"station": 2, "reading": 20.0}],
        "b0",
    )
    with pytest.raises(Exception, match="simulated kill"):
        run()
    # the commit survived the kill; the checkpoint never acked batch 0
    assert current_version(lake) == 1
    assert last_stream_batch_id(lake) == 0

    # resume: Spark replays batch 0 with the SAME id — the guard skips
    run()
    assert current_version(lake) == 1, "replayed batch committed twice"
    assert lake_read(spark, lake).count() == 2

    _write_batch(str(indir), [{"station": 3, "reading": 30.0}], "b1")
    run()
    assert current_version(lake) == 2
    assert last_stream_batch_id(lake) == 1
    assert lake_read(spark, lake).count() == 3

    # REBUILT checkpoint (round-10 review): batch ids restart from 0
    # under a fresh query id — the guard must scope to the query id and
    # COMMIT the new stream's batches instead of silently skipping ids
    # 0..mark against the dead stream's high-water mark
    import shutil

    shutil.rmtree(ckpt)
    _write_batch(str(indir), [{"station": 4, "reading": 40.0}], "b2")
    run()  # fresh query: reprocesses ALL input as its batch 0
    assert current_version(lake) == 3, "rebuilt checkpoint was skipped"
    assert lake_read(spark, lake).count() == 3 + 4  # reprocess semantics
    # streamed rows are first-class lake citizens: time travel and CDC
    assert lake_read(spark, lake, 1).count() == 2
    diff = lake_diff(spark, lake, 1, 2).collect()
    assert [(r.station, r._change) for r in diff] == [(3, "insert")]
    # and the advisor sees the per-batch small files piling up
    assert lake_maintenance_plan(lake)["n_files"] >= 2


def test_stream_near_dup_alerts_with_persisted_artifacts(spark, tmp_path):
    """Round-10: the stream started from the PERSISTED gate artifacts
    (band table + shingle table, as corpus_refresh maintains them) must
    emit exactly the same alert set as the recompute-from-text form —
    the 100 TB stream start never touches the corpus text."""
    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.operators.dedup import (
        INCREMENT_SPLIT,
        _doc_shingles,
        incremental_near_dups,
        minhash_band_rows,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        stream_near_dup_alerts,
    )
    from tests.conftest import SF_ORACLE

    d = load_table(spark, SF_ORACLE, "documents")
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = lo + int((hi - lo) * INCREMENT_SPLIT)
    corpus = d.where(F.col("doc_id") < cut)
    inc = d.where(F.col("doc_id") >= cut)
    want = {r.inc_doc for r in incremental_near_dups(corpus, inc).collect()}
    assert want

    # "persist" the artifacts as parquet tables, then stream from THEM
    bands_path = str(tmp_path / "bands")
    sh_path = str(tmp_path / "shingles")
    minhash_band_rows(corpus).write.parquet(bands_path)
    _doc_shingles(corpus).write.parquet(sh_path)

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    indir = tmp_path / "docs"
    indir.mkdir()
    scratch = tmp_path / "scratch"
    inc.select("doc_id", "text").withColumn(
        "event_time", F.lit(t0).cast("timestamp")
    ).coalesce(1).write.parquet(str(scratch))
    next(scratch.glob("part-*.parquet")).rename(indir / "b0.parquet")

    src = spark.readStream.schema(
        "doc_id BIGINT, text STRING, event_time TIMESTAMP"
    ).parquet(str(indir))
    out = stream_near_dup_alerts(
        src,
        corpus.limit(0),  # the text side is never consulted
        corpus_bands=spark.read.parquet(bands_path),
        corpus_shingles=spark.read.parquet(sh_path),
    )
    name = f"sndp_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table(name).collect()
    assert {r.doc_id for r in rows} == want
    assert len(rows) == len(want)


def test_checkpoint_query_id_missing_metadata_names_protocol(tmp_path):
    """ADVICE r11: the exactly-once replay guard must fail with the
    protocol named when the checkpoint's metadata file is absent —
    not a bare FileNotFoundError."""
    import pytest

    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        checkpoint_query_id,
    )

    with pytest.raises(RuntimeError, match="exactly-once replay guard"):
        checkpoint_query_id(str(tmp_path / "never-materialized"))


def test_stream_cdc_consumer_exactly_once_across_restarts(spark, tmp_path):
    """The foreachBatch CDC poller consumes each lake version exactly
    once ACROSS stream restarts and checkpoint rebuilds — the marks
    live in the consumer table's manifests, not the checkpoint."""
    import shutil

    from pyspark.sql import functions as F

    from cours_datalake_dwh_td_kafka_spark.lake import (
        lake_commit,
        lake_read,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        consume_lake_changes_stream,
    )

    src = str(tmp_path / "s")
    out = str(tmp_path / "o")
    ckpt = str(tmp_path / "ck")
    lake_commit(spark.range(0, 5).select(F.col("id").alias("k")), src)
    lake_commit(spark.range(5, 9).select(F.col("id").alias("k")), src)

    q = consume_lake_changes_stream(spark, src, out, ckpt).start()
    q.awaitTermination(120)
    assert lake_read(spark, out).count() == 9

    # more commits land; restart with a REBUILT checkpoint — version
    # marks, not the checkpoint, carry the exactly-once state
    lake_commit(spark.range(9, 12).select(F.col("id").alias("k")), src)
    shutil.rmtree(ckpt)
    q2 = consume_lake_changes_stream(
        spark, src, out, str(tmp_path / "ck2")
    ).start()
    q2.awaitTermination(120)
    got = lake_read(spark, out)
    assert got.count() == 12
    assert got.select("k").distinct().count() == 12


@pytest.mark.slow
def test_ingest_daemon_end_to_end(spark, tmp_path):
    """Capstone integration (r10+r11): STREAMED ingestion into the
    versioned lake, with every derived artifact — exact-dedup
    fingerprints, MinHash bands, the BM25 text index — maintained by
    the CDC consumer from version history alone. Two ingest waves
    through one checkpoint; after each, the daemon catches up; at the
    end every artifact equals a from-scratch recompute and the served
    BM25 answer equals the direct operator. Exactly-once throughout."""
    import json
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.lake import (
        lake_consume_changes,
        lake_read,
    )
    from cours_datalake_dwh_td_kafka_spark.operators import text_index as ti
    from cours_datalake_dwh_td_kafka_spark.operators.dedup import (
        fingerprint_rows,
        minhash_band_rows,
    )
    from cours_datalake_dwh_td_kafka_spark.operators.text_analysis import (
        bm25_search,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        commit_stream_to_lake,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "source", "lang", "n_chars", "text"
    )
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = int(lo) + (int(hi) - int(lo)) // 2
    schema = docs.schema

    src_dir = str(tmp_path / "incoming")
    os.makedirs(src_dir)
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    fps = str(tmp_path / "fps")
    bands = str(tmp_path / "bands")
    tidx = str(tmp_path / "tidx")
    log = str(tmp_path / "log")

    def drop_wave(name, frame):
        rows = [r.asDict() for r in frame.collect()]
        with open(os.path.join(src_dir, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def ingest():
        stream = (
            spark.readStream.schema(StructType(schema.fields))
            .json(src_dir)
        )
        q = commit_stream_to_lake(stream, lake, ckpt).start()
        q.awaitTermination(180)

    built = []

    def daemon_apply(ch):
        from cours_datalake_dwh_td_kafka_spark.lake import lake_commit

        ins = ch.where(F.col("_change") == "insert").drop(
            "_change", "_version"
        )
        if ins.take(1):
            ins = ins.localCheckpoint(eager=False)
            lake_commit(fingerprint_rows(ins), fps, mode="append")
            lake_commit(minhash_band_rows(ins), bands, mode="append")
            if not built:
                ti.build_text_index(spark, ins, tidx)
                built.append(True)
            else:
                ti.append_text_index(spark, ins, tidx)
        return ch.select("doc_id", "_change", "_version")

    # wave 1: first half streams in, daemon catches up
    drop_wave("a.json", docs.where(F.col("doc_id") < cut))
    ingest()
    v1_consumed = lake_consume_changes(
        spark, lake, log, apply_fn=daemon_apply
    )
    assert v1_consumed  # at least one streamed commit consumed

    # wave 2: the rest arrives; SAME checkpoint resumes; daemon resumes
    drop_wave("b.json", docs.where(F.col("doc_id") >= cut))
    ingest()
    v2_consumed = lake_consume_changes(
        spark, lake, log, apply_fn=daemon_apply
    )
    assert v2_consumed and min(v2_consumed) > max(v1_consumed)
    assert lake_consume_changes(spark, lake, log, apply_fn=daemon_apply) == []

    # the lake holds exactly the corpus
    live = lake_read(spark, lake)
    n = docs.count()
    assert live.count() == n
    assert live.select("doc_id").distinct().count() == n

    # every maintained artifact equals a from-scratch recompute
    def eq(a, b):
        return a.count() == b.count() and a.exceptAll(b).count() == 0

    assert eq(lake_read(spark, fps), fingerprint_rows(docs))
    assert eq(lake_read(spark, bands), minhash_band_rows(docs))
    assert eq(ti.bm25_query_index(spark, tidx), bm25_search(docs))


def test_stream_kmv_matches_batch_sketch(spark, tmp_path):
    """Streaming KMV distinct-count == batch sketch bit-for-bit: two
    file-stream batches of (key, custkey) rows fold into a k-hash state
    per key; after the stream drains, each key's estimate equals the
    batch kmv_sketch + _kmv_estimate over that key's full value set —
    mergeability makes arrival order and batch boundaries invisible."""
    import json as _json
    import os
    import uuid as _uuid

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StructField as _Sf,
        StructType as _St,
    )

    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.operators.dedup import (
        _HASH32_SPARK,
    )
    from cours_datalake_dwh_td_kafka_spark.operators.sketches import (
        KMV_K,
        _kmv_estimate,
        kmv_sketch,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.stateful import (
        kmv_stateful,
    )

    o = load_table(spark, "/root/testdata/sf0.01", "orders").select(
        (F.year("o_orderdate") % 2).cast("long").alias("key"),
        "o_custkey",
        "o_orderkey",
    )
    rows = o.collect()
    src = str(tmp_path / "in")
    os.makedirs(src)
    half = len(rows) // 2
    for name, chunk in (("a", rows[:half]), ("b", rows[half:])):
        with open(os.path.join(src, f"{name}.json"), "w") as f:
            for r in chunk:
                f.write(_json.dumps(r.asDict()) + "\n")

    schema = _St(
        [
            _Sf("key", LongType()),
            _Sf("o_custkey", LongType()),
            _Sf("o_orderkey", LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .select(
            "key",
            _HASH32_SPARK(F.col("o_custkey").cast("string")).alias("h"),
        )
    )
    out = kmv_stateful(stream)
    name = f"tkmv_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.table(name).collect()
    for key in (0, 1):
        final = max(
            (r for r in got if r.key == key), key=lambda r: r.n_seen
        )
        batch = [
            r.h
            for r in kmv_sketch(
                o.where(F.col("key") == key), "o_custkey"
            ).collect()
        ]
        assert final.n_sample == len(batch)
        assert final.distinct_est == _kmv_estimate(batch, KMV_K)


def test_streamed_mv_maintenance_via_cdc_daemon(spark, tmp_path):
    """The MV delta derivation rides the streaming CDC daemon: streamed
    ingest commits versions into the source lake, the foreachBatch
    poller folds each version's deltas into the MV, and the served view
    equals a from-scratch recompute — including after a restart with a
    FRESH checkpoint (exactly-once lives in the lake marks, not the
    checkpoint)."""
    import json as _json
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType as _St

    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.lake import lake_read
    from cours_datalake_dwh_td_kafka_spark.operators.lake_queries import (
        mv_delta_rows,
        mv_serve,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        commit_stream_to_lake,
        consume_lake_changes_stream,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "source", "lang", "n_chars", "text"
    )
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = int(lo) + (int(hi) - int(lo)) // 2
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    lake = str(tmp_path / "lake")
    mv = str(tmp_path / "mv")

    def drop(name, frame):
        with open(os.path.join(src_dir, name), "w") as f:
            for r in frame.collect():
                f.write(_json.dumps(r.asDict()) + "\n")

    def ingest(ck):
        stream = spark.readStream.schema(_St(docs.schema.fields)).json(
            src_dir
        )
        q = commit_stream_to_lake(stream, lake, str(tmp_path / ck)).start()
        q.awaitTermination(180)

    def daemon(ck):
        q = consume_lake_changes_stream(
            spark, lake, mv, str(tmp_path / ck), apply_fn=mv_delta_rows
        ).start()
        q.awaitTermination(180)

    drop("a.json", docs.where(F.col("doc_id") < cut))
    ingest("ick1")
    daemon("dck1")
    drop("b.json", docs.where(F.col("doc_id") >= cut))
    ingest("ick1")
    daemon("dck2")  # FRESH daemon checkpoint: marks carry the state

    served = mv_serve(spark, mv)
    direct = (
        lake_read(spark, lake)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )
    assert served.count() == direct.count()
    assert served.exceptAll(direct).count() == 0
    # a third drain with nothing new adds no MV versions
    from cours_datalake_dwh_td_kafka_spark.lake import current_version

    v_before = current_version(mv)
    daemon("dck3")
    assert current_version(mv) == v_before


def test_stream_mg_guarantee_and_deficit_bound(spark, tmp_path):
    """Streaming Misra-Gries: after the stream drains, (a) every batch
    heavy hitter (> n/MG_K global) appears among the final candidates
    regardless of micro-batch splits, (b) every emitted counter respects
    the Berinde deficit bound cnt_lo <= exact <= cnt_lo + err_bound,
    and (c) per-shard state never exceeds k counters."""
    import json as _json
    import os
    import uuid as _uuid

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType as _StrT,
        StructField as _Sf,
        StructType as _St,
    )

    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.operators.sketches import MG_K
    from cours_datalake_dwh_td_kafka_spark.streaming.stateful import (
        heavy_hitters_stateful,
    )

    n_shards = 2
    d = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        F.col("lang").alias("v")
    )
    rows = d.collect()
    n = len(rows)
    exact = {
        r.v: r.c
        for r in d.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    heavy = {v for v, c in exact.items() if c > n / MG_K}
    assert heavy, "testdata lang column must have a > n/4 majority class"

    src = str(tmp_path / "mg_in")
    os.makedirs(src)
    third = max(1, n // 3)
    for i, lo in enumerate(range(0, n, third)):
        with open(os.path.join(src, f"part{i}.json"), "w") as f:
            for r in rows[lo : lo + third]:
                f.write(_json.dumps({"v": r.v}) + "\n")

    schema = _St([_Sf("v", _StrT())])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .select(
            F.pmod(F.xxhash64("v"), F.lit(n_shards)).alias("shard"), "v"
        )
    )
    out = heavy_hitters_stateful(stream)
    name = f"tmg_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.table(name).collect()
    assert got, "stream emitted nothing"
    final_rows = []
    for shard in {r.shard for r in got}:
        shard_rows = [r for r in got if r.shard == shard]
        horizon = max(r.n_seen for r in shard_rows)
        live = [r for r in shard_rows if r.n_seen == horizon]
        assert len(live) <= MG_K, f"shard {shard} holds > k counters"
        final_rows.extend(live)

    survivors = {r.v for r in final_rows}
    assert heavy <= survivors, f"lost heavy hitter(s): {heavy - survivors}"
    for r in final_rows:
        true = exact.get(r.v, 0)
        assert r.cnt_lo <= true <= r.cnt_lo + r.err_bound, (
            r.v,
            r.cnt_lo,
            r.err_bound,
            true,
        )


@pytest.mark.slow
def test_stream_drift_monitor_matches_batch_psi(spark, tmp_path):
    """Streaming PSI == batch PSI after the stream drains: the monitor's
    per-trigger verdict over three file-stream batches of the odd-parity
    docs converges to corpus_drift_psi(even, odd)'s feature_psi
    bit-for-bit, and intermediate verdicts exist for every trigger."""
    import json as _json
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType as _StrT,
        StructField as _Sf,
        StructType as _St,
    )

    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.operators.drift import (
        corpus_drift_psi,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        drift_monitor_stream,
    )

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    ref = d.where(F.col("doc_id") % 2 == 0)
    cur = d.where(F.col("doc_id") % 2 == 1)
    want = {
        r.feature: r.feature_psi
        for r in corpus_drift_psi(ref, cur)
        .select("feature", "feature_psi")
        .distinct()
        .collect()
    }

    rows = cur.select("doc_id", "lang", "n_chars").collect()
    src = str(tmp_path / "drift_in")
    os.makedirs(src)

    def write_file(name, chunk):
        with open(os.path.join(src, name), "w") as f:
            for r in chunk:
                f.write(
                    _json.dumps(
                        {
                            "doc_id": r.doc_id,
                            "lang": r.lang,
                            "n_chars": r.n_chars,
                        }
                    )
                    + "\n"
                )

    # phase 1: first ~2/3 in three files; the rest arrives AFTER a
    # daemon restart (the restart-correctness leg below)
    head, tail = rows[: 2 * len(rows) // 3], rows[2 * len(rows) // 3 :]
    want_phase1 = {
        r.feature: r.feature_psi
        for r in corpus_drift_psi(
            ref, cur.where(F.col("doc_id").isin([x.doc_id for x in head]))
        )
        .select("feature", "feature_psi")
        .distinct()
        .collect()
    }
    third = max(1, len(head) // 3)
    for i, lo in enumerate(range(0, len(head), third)):
        write_file(f"p{i}.json", head[lo : lo + third])

    schema = _St(
        [
            _Sf("doc_id", LongType()),
            _Sf("lang", _StrT()),
            _Sf("n_chars", LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    verdicts: list[tuple[int, dict]] = []
    q = drift_monitor_stream(
        stream,
        ref,
        lambda bid, psi: verdicts.append((bid, psi)),
        str(tmp_path / "ckpt"),
    )
    # availableNow isn't set on the monitor (it's a long-lived daemon);
    # drain by waiting for all three files then stopping
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if len(verdicts) >= 3 and all(
            len(p) == 2 for _, p in verdicts[-1:]
        ):
            prog = q.lastProgress
            if prog and prog["numInputRows"] == 0:
                break
        time.sleep(1)
    q.stop()
    q.awaitTermination(30)

    assert len(verdicts) >= 3, f"only {len(verdicts)} triggers fired"
    final = verdicts[-1][1]
    assert final == want_phase1, (final, want_phase1)
    # drift grows monotonically visible: the first partial batch's PSI
    # differs from the final (the monitor is live, not batch-replayed)
    assert verdicts[0][1] != final

    # RESTART from the SAME checkpoint with the last third arriving
    # after the restart: complete-mode re-emission rebuilds the
    # in-process histogram wholesale, so the restarted daemon's verdict
    # covers the WHOLE stream — update mode would count only post-
    # restart bins and report a PSI built from a third of the corpus
    write_file("p_late.json", tail)
    restarted: list[tuple[int, dict]] = []
    q2 = drift_monitor_stream(
        stream,
        ref,
        lambda bid, psi: restarted.append((bid, psi)),
        str(tmp_path / "ckpt"),
    )
    deadline = time.time() + 120
    while time.time() < deadline and not restarted:
        time.sleep(1)
    q2.stop()
    q2.awaitTermination(30)
    assert restarted, "restarted monitor never fired"
    assert restarted[-1][1] == want, (restarted[-1][1], want)


@pytest.mark.slow
def test_sessions_maintenance_daemon_end_to_end(spark, tmp_path):
    """The flagship sessions table maintained by the streaming CDC
    daemon: cold-start bootstrap from v1, a late insert wave, and an
    event-lake ERASURE (merge-on-read delete) each fold exactly once —
    after every drain the table equals a from-scratch recompute, a
    second drain consumes nothing, and marks (not the checkpoint)
    carry the exactly-once state."""
    from datetime import datetime

    from cours_datalake_dwh_td_kafka_spark.lake import (
        lake_commit,
        lake_delete_keys,
        lake_read,
    )
    from cours_datalake_dwh_td_kafka_spark.operators.session_queries import (
        maintain_sessions_from_cdc,
        sessions_maintenance_stream,
    )
    from cours_datalake_dwh_td_kafka_spark.operators.sessionization import (
        sessionize_events,
    )

    def ev(eid, uid, minute, etype="click", value=1.0):
        return (eid, uid, datetime(2024, 3, 1, 10, minute), etype, value)

    schema = (
        "event_id bigint, user_id bigint, ts timestamp, "
        "event_type string, value double"
    )
    ev_path = str(tmp_path / "events")
    sess_path = str(tmp_path / "sessions")

    lake_commit(
        spark.createDataFrame(
            [ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 0), ev(4, 2, 20)], schema
        ),
        ev_path,
    )

    def drain(ck):
        q = sessions_maintenance_stream(
            spark, ev_path, sess_path, str(tmp_path / ck)
        ).start()
        q.awaitTermination(120)

    def assert_consistent():
        final = lake_read(spark, sess_path)
        want = sessionize_events(lake_read(spark, ev_path))
        assert final.exceptAll(want).count() == 0
        assert want.exceptAll(final).count() == 0

    drain("ck1")  # cold start: bootstraps the table from v1
    assert_consistent()

    # late wave: an error mid-run splits user 1's session
    lake_commit(
        spark.createDataFrame([ev(5, 1, 5, "error")], schema),
        ev_path,
        mode="append",
    )
    drain("ck2")  # FRESH checkpoint: marks carry exactly-once, not it
    assert_consistent()
    assert lake_read(spark, sess_path).where("user_id = 1").count() == 2

    # erasure on the EVENT lake: user 2's events disappear -> their
    # sessions must too (delete-direction changes touch users)
    lake_delete_keys(
        spark,
        ev_path,
        "user_id",
        keys=spark.createDataFrame([(2,)], "user_id bigint"),
    )
    drain("ck3")
    assert_consistent()
    assert lake_read(spark, sess_path).where("user_id = 2").count() == 0

    # nothing new: the daemon consumes zero versions
    assert maintain_sessions_from_cdc(spark, ev_path, sess_path) == []


@pytest.mark.slow
def test_stream_drift_monitor_ks_matches_batch(spark, tmp_path):
    """Streaming binned KS == batch corpus_drift_ks after the stream
    drains, bit-for-bit on (ks_stat, critical_value, drift_alert); a
    per-trigger verdict fires for every micro-batch."""
    import json as _json
    import os
    import time

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StructField as _Sf,
        StructType as _St,
    )

    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.operators.drift import (
        corpus_drift_ks,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        drift_monitor_stream_ks,
    )

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    ref = d.where(F.col("doc_id") % 2 == 0)
    cur = d.where(F.col("doc_id") % 2 == 1)
    wrow = corpus_drift_ks(ref, cur).select(
        "ks_stat", "critical_value", "drift_alert"
    ).first()

    rows = cur.select("doc_id", "n_chars").collect()
    src = str(tmp_path / "ks_in")
    os.makedirs(src)
    third = max(1, len(rows) // 3)
    for i, lo in enumerate(range(0, len(rows), third)):
        with open(os.path.join(src, f"p{i}.json"), "w") as f:
            for r in rows[lo : lo + third]:
                f.write(
                    _json.dumps({"doc_id": r.doc_id, "n_chars": r.n_chars})
                    + "\n"
                )

    schema = _St([_Sf("doc_id", LongType()), _Sf("n_chars", LongType())])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    verdicts: list[tuple[int, float, float, bool]] = []
    q = drift_monitor_stream_ks(
        stream,
        ref,
        lambda bid, ks, crit, alert: verdicts.append(
            (bid, ks, crit, alert)
        ),
        str(tmp_path / "ks_ckpt"),
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if len(verdicts) >= 3:
            prog = q.lastProgress
            if prog and prog["numInputRows"] == 0:
                break
        time.sleep(1)
    q.stop()
    q.awaitTermination(30)

    assert len(verdicts) >= 3, verdicts
    _, ks, crit, alert = verdicts[-1]
    assert ks == wrow.ks_stat, (ks, wrow.ks_stat)
    assert crit == wrow.critical_value, (crit, wrow.critical_value)
    assert alert == wrow.drift_alert
    # the partial-corpus verdicts are well-formed too
    assert all(0.0 <= v[1] <= 1.0 for v in verdicts)


@pytest.mark.slow
def test_stream_drift_monitor_ks_adaptive_matches_batch(spark, tmp_path):
    """Streaming equi-depth KS == batch corpus_drift_ks_adaptive after
    the stream drains, bit-for-bit on (ks_stat, critical_value,
    drift_alert) — shared reference-decile bin edges, shared rounding."""
    import json as _json
    import os
    import time

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StructField as _Sf,
        StructType as _St,
    )

    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.operators.drift import (
        corpus_drift_ks_adaptive,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        drift_monitor_stream_ks_adaptive,
    )

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    ref = d.where(F.col("doc_id") % 2 == 0)
    cur = d.where(F.col("doc_id") % 2 == 1)
    wrow = corpus_drift_ks_adaptive(ref, cur).select(
        "ks_stat", "critical_value", "drift_alert"
    ).first()

    rows = cur.select("doc_id", "n_chars").collect()
    src = str(tmp_path / "ksa_in")
    os.makedirs(src)
    third = max(1, len(rows) // 3)
    for i, lo in enumerate(range(0, len(rows), third)):
        with open(os.path.join(src, f"p{i}.json"), "w") as f:
            for r in rows[lo : lo + third]:
                f.write(
                    _json.dumps({"doc_id": r.doc_id, "n_chars": r.n_chars})
                    + "\n"
                )

    schema = _St([_Sf("doc_id", LongType()), _Sf("n_chars", LongType())])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    verdicts: list[tuple[int, float, float, bool]] = []
    q = drift_monitor_stream_ks_adaptive(
        stream,
        ref,
        lambda bid, ks, crit, alert: verdicts.append(
            (bid, ks, crit, alert)
        ),
        str(tmp_path / "ksa_ckpt"),
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if len(verdicts) >= 3:
            prog = q.lastProgress
            if prog and prog["numInputRows"] == 0:
                break
        time.sleep(1)
    q.stop()
    q.awaitTermination(30)

    assert len(verdicts) >= 3, verdicts
    _, ks, crit, alert = verdicts[-1]
    assert ks == wrow.ks_stat, (ks, wrow.ks_stat)
    assert crit == wrow.critical_value
    assert alert == wrow.drift_alert


def test_commit_stream_to_lake_stats_on_append_prunes_batches(
    spark, tmp_path
):
    """Round 14 stats-on-append through the streaming sink: each
    micro-batch's files carry their [min, max], so a pruned read over
    a narrow range opens only the matching batch's file — the ingest
    stream stops eroding pruned reads between reclusters."""
    from cours_datalake_dwh_td_kafka_spark.lake import (
        lake_read_pruned,
        pruned_files,
    )
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        commit_stream_to_lake,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    # three disjoint station-id waves, one file per batch
    for i, lo in enumerate((0, 1000, 2000)):
        _write_batch(
            str(indir),
            [{"station": lo + j, "reading": 1.0} for j in range(50)],
            f"b{i}",
        )
    s = (
        spark.readStream.schema("station LONG, reading DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    q = commit_stream_to_lake(s, lake, ckpt, stats_cols=("station",)).start()
    q.awaitTermination(120)
    keep, total = pruned_files(lake, "station", 1000, 1049)
    assert total >= 3 and len(keep) < total  # other batches skipped
    got = lake_read_pruned(spark, lake, "station", 1000, 1049)
    assert got.count() == 50
