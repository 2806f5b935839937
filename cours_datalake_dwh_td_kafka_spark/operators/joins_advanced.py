"""Join types beyond the reference's surface — SURVEY.md §2.3 notes the
reference has "no right/full outer, anti, theta/range, as-of, interval
joins"; these are first-class engine operators here (the reference course
would need them the moment its Lambda layers disagree on key coverage).

Scale notes:
- full/right outer: shuffle-on-key sort-merge joins; AQE skew handling
  applies. Null-extension happens post-merge, no extra pass.
- as-of join: implemented as union + last(ignorenulls) over a
  (key, time)-ordered window — ONE shuffle on the key, no range
  explosion, no per-row subquery. This is the scale path: a naive
  theta-join (e.ts >= o.date) explodes to |events| x |orders per key|
  before picking the max; the union-window form streams each key's
  timeline once. (Same trick Flink/QuestDB/kdb use for ASOF.)
- range join: literal band table broadcast to a nested-loop join — right
  for O(10) bands. For band counts that don't broadcast, pre-bucket both
  sides on floor(value/width) and equi-join buckets, checking the true
  range post-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.relational import dec_sum
from cours_datalake_dwh_td_kafka_spark.registry import register

# --------------------------------------------------------------------------
# full outer join: per-customer order stats ⟗ per-user event stats.
# Left-only rows (customers with orders but no events), matched rows, and
# the join machinery for right-only rows (every event user is also a
# customer key in this lake, so that region is empty — the OUTER semantics
# are still exercised by the left side).
# --------------------------------------------------------------------------
_FULL_OUTER_SQL = """
    WITH o AS (
      SELECT o_custkey AS k, COUNT(*) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue
      FROM orders WHERE o_custkey < 300 GROUP BY o_custkey
    ),
    e AS (
      SELECT user_id AS k, COUNT(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT COALESCE(o.k, e.k) AS k, n_orders, revenue, n_events
    FROM o FULL OUTER JOIN e ON o.k = e.k
    ORDER BY k
"""


@register("join_full_outer", _FULL_OUTER_SQL)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") < 300)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum(F.col("o_totalprice")).alias("revenue"),
        )
    )
    e = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        o.join(e, "k", "full_outer")
        .select("k", "n_orders", "revenue", "n_events")
        .orderBy("k")
    )


# --------------------------------------------------------------------------
# as-of join: for each event, the most recent order (by o_orderdate) of
# the same customer at or before the event time.
#
# Spark plan: tag + union both sides, sort each key's timeline once, and
# carry the latest order forward with last(..., ignorenulls=True) over an
# unbounded-preceding row frame; keep only event rows. Single shuffle on
# the key — the 100 TB-safe formulation (see module docstring).
#
# Determinism: the order side is first collapsed to one row per
# (custkey, date) (max orderkey) so "the" most recent order is
# well-defined in both engines; at equal timestamps order rows sort
# before event rows so a same-instant order is visible (>= semantics,
# matching DuckDB ASOF's e.ts >= o.date).
# --------------------------------------------------------------------------
_ASOF_SQL = """
    WITH o1 AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           o.o_orderkey AS last_orderkey, o.o_orderdate AS last_orderdate
    FROM events e
    ASOF LEFT JOIN o1 o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    ORDER BY e.event_id
"""


@register("asof_join", _ASOF_SQL)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        "ts",
        "event_type",
        F.lit(1).alias("is_event"),
    )
    od = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("t"),
            "o_orderkey",
            "o_orderdate",
            F.lit(0).alias("is_event"),
        )
    )
    u = ev.unionByName(od, allowMissingColumns=True)
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("o_orderdate", ignorenulls=True).over(w).alias("last_orderdate"),
    )
    return (
        carried.where(F.col("is_event") == 1)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            "ts",
            "event_type",
            "last_orderkey",
            "last_orderdate",
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# range (interval) join: orders banded by literal price intervals.
# Broadcast nested-loop on BETWEEN — correct for O(10) bands; the
# pre-bucketing rewrite (module docstring) takes over when the band table
# itself is large.
# --------------------------------------------------------------------------
_BANDS = [
    ("B0_under_50k", 0.0, 50_000.0),
    ("B1_50k_100k", 50_000.0, 100_000.0),
    ("B2_100k_200k", 100_000.0, 200_000.0),
    ("B3_200k_400k", 200_000.0, 400_000.0),
    ("B4_over_400k", 400_000.0, 1e12),
]

_BANDS_SQL = " UNION ALL ".join(
    f"SELECT '{n}' AS band, {lo} AS lo, {hi} AS hi" for n, lo, hi in _BANDS
)

_RANGE_SQL = f"""
    WITH bands AS ({_BANDS_SQL})
    SELECT b.band,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue
    FROM orders o
    JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    ORDER BY b.band
"""


#: bucket width for the equi-join rewrite
_BUCKET_W = 50_000.0


def range_join_nlj(o: DataFrame, bands: DataFrame) -> DataFrame:
    """The literal join form: broadcast nested-loop on BETWEEN. Correct
    for O(10) bands but the NLJ condition is interpreted per (row, band)
    pair — no codegen. Kept as the reference join shape; parity with the
    bucketed rewrite is pinned in tests/test_scale.py."""
    return o.join(
        F.broadcast(bands),
        (F.col("o_totalprice") >= F.col("lo"))
        & (F.col("o_totalprice") < F.col("hi")),
    )


def range_join_bucketed(o: DataFrame, bands: DataFrame) -> DataFrame:
    """Scale path for interval joins: explode each band to the fixed-width
    buckets it covers, equi-join on the bucket id (broadcast hash,
    whole-stage codegen), then re-check the exact range. One codegen'd
    hash probe per row instead of an interpreted scan of every band.

    Open-ended / huge bands are clamped to ``max(lo)`` across the band
    table, and the PROBE side is clamped identically
    (``least(price, clamp)``) — every value above the last band start
    lands in the clamped band's final bucket and the exact BETWEEN
    re-check decides membership. This keeps the exploded build side at
    O(total_band_span / bucket_w) rows regardless of sentinel bounds
    like 1e12, and (unlike a build-side-only clamp, round-2 bug) drops
    no rows: bucketization is the same monotone function of the value on
    both sides, so for price in [lo, hi): bucket(lo) <= bucket(price)
    <= bucket(min(hi, clamp)) always holds when clamp >= every lo.
    Deriving the clamp costs one O(n_bands) driver-side aggregate on a
    table that is broadcast-small by precondition."""
    max_lo = bands.agg(F.max("lo")).first()[0]
    # empty band table: any clamp works (the join below yields no rows);
    # float(None) would crash where the NLJ twin returns empty
    hi_clamp = float(max_lo) if max_lo is not None else 0.0
    bucket = lambda c: (F.least(c, F.lit(hi_clamp)) / _BUCKET_W).cast("long")  # noqa: E731
    bands_b = bands.select(
        "band",
        "lo",
        "hi",
        F.explode(F.sequence(bucket(F.col("lo")), bucket(F.col("hi")))).alias(
            "bk"
        ),
    )
    ob = o.withColumn("bk", bucket(F.col("o_totalprice")))
    return ob.join(F.broadcast(bands_b), "bk").where(
        (F.col("o_totalprice") >= F.col("lo"))
        & (F.col("o_totalprice") < F.col("hi"))
    )


@register("range_join", _RANGE_SQL)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bands = o.sparkSession.createDataFrame(
        _BANDS, "band STRING, lo DOUBLE, hi DOUBLE"
    )
    return (
        range_join_bucketed(o, bands)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy("band")
    )


# --------------------------------------------------------------------------
# interval join (batch twin of the stream-stream join): click -> purchase
# attribution within a bounded delay, per user
# --------------------------------------------------------------------------
ATTRIB_DELAY_MIN = 10

_INTERVAL_JOIN_SQL = f"""
    SELECT c.user_id,
           c.event_id AS click_id,
           c.ts AS click_ts,
           p.event_id AS purchase_id,
           p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL {ATTRIB_DELAY_MIN} MINUTE
    ORDER BY click_id, purchase_id
"""


@register("interval_join_events", _INTERVAL_JOIN_SQL)
def q_interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch execution of the SAME :func:`~..streaming.pipelines
    .stream_stream_join` plan the speed layer runs (source-agnostic by
    construction; watermarks are no-ops on batch frames): every click
    paired with the same user's purchases in the next 10 minutes.

    Scale shape: equi-join on user_id with the time band as a post-join
    predicate — per-key fan-out is bounded by purchases-per-user within
    the delay window, not by history. Skewed power users are AQE
    skew-join territory; the streaming form bounds STATE by
    watermark + delay instead."""
    from cours_datalake_dwh_td_kafka_spark.streaming.pipelines import (
        stream_stream_join,
    )

    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return stream_stream_join(
        clicks,
        purchases,
        on=("user_id",),
        left_time="click_ts",
        right_time="purchase_ts",
        max_delay=f"{ATTRIB_DELAY_MIN} minutes",
    ).orderBy("click_id", "purchase_id")
