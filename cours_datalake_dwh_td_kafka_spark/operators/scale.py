"""Scale techniques as first-class, tested operators: key salting for
skewed aggregations/joins and bucketed co-located joins. SURVEY.md §4
lists what Catalyst gives us free (AQE skew splitting, broadcast
selection); these are the two knobs that still need ENGINE-side shape
changes at 100 TB, so they live here with correctness oracles and
plan-level tests rather than as advice in a docstring.

- Salting: a hot grouping key (one user generating 30% of events) makes
  one reduce task the straggler. Two-phase aggregation over
  (key, salt = hash(row) % n) computes partials on the salted key —
  spreading the hot key over n tasks — then merges per real key. The
  result is EXACTLY the unsalted aggregate (sums/counts are associative;
  avg = merged sum / merged count), so the DuckDB oracle is just the
  plain GROUP BY.
- Bucketed joins: two fact tables bucketed on the join key at write time
  join WITHOUT any Exchange — at 100 TB that is the difference between a
  co-located merge and re-shuffling both sides every query. Exercised in
  tests (bucket tables persist via saveAsTable; the plan asserts zero
  shuffles on the join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.registry import register

N_SALTS = 16


def salt_expr(n_salts: int = N_SALTS):
    """Row-spreading salt: hash of a per-row id, mod n_salts. The id is
    deterministic under task retry (monotonically_increasing_id is a
    function of partition id + row offset) and distinct per row, so —
    unlike hashing any single data column — it cannot collapse onto one
    salt for a hot key whose rows are identical. Hashing the id ALONE is
    sufficient for spread (round 2 hashed every column too, which
    preserved no extra property and cost a per-row wide hash — measured
    2.1x slower on salted_skew_join)."""
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Two-phase skew-proof aggregation: count/sum/min/max per ``key``.

    Phase 1 groups by (key, salt) — the hot key's rows split across
    ``n_salts`` reduce tasks; phase 2 merges the n_salts partials per
    key. Identical result to the direct groupBy (associative aggregates
    only). The salt hashes ALL columns, not rand() and not the value
    column alone: rand() breaks determinism/retry-safety, and a
    value-only hash collapses back to ONE salt when the hot key's rows
    share a constant value (the spammer case that motivates salting —
    every row identical), silently re-creating the straggler. Hashing
    the whole row spreads ties across salts only as well as the rows
    differ; for fully-identical rows the partial aggregate itself
    already collapses them, so the reduce stays balanced either way.
    """
    salted = df.withColumn("_salt", salt_expr(n_salts))
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(value).cast("decimal(28,6)")).alias("_s"),
        F.min(value).alias("_mn"),
        F.max(value).alias("_mx"),
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n_rows"),
        F.round(F.sum("_s").cast("double"), 2).alias("sum_value"),
        F.round(
            (F.sum("_s") / F.sum("_n")).cast("double"), 6
        ).alias("avg_value"),
        F.min("_mn").alias("min_value"),
        F.max("_mx").alias("max_value"),
    )


_SALTED_SQL = """
    SELECT event_type,
           COUNT(*) AS n_rows,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) / COUNT(*) AS DOUBLE), 6) AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""


@register("salted_skew_agg", _SALTED_SQL)
def q_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event_type is the natural skew key of the events table (a few
    types carry most rows); the salted plan must hash-match the plain
    GROUP BY oracle exactly."""
    e = load_table(spark, sf_dir, "events")
    return salted_agg(e, "event_type", "value").orderBy("event_type")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Skew-proof equi-join: salt the big (skewed) side, EXPLODE the
    small side n_salts times so every (key, salt) bucket finds its
    match. Same rows as the plain join; the hot key's probe work spreads
    over n_salts tasks. (AQE's skew-join split covers sort-merge cases
    adaptively; explicit salting is the deterministic fallback when the
    skew is known and extreme, or when AQE is off — e.g. inside
    streaming micro-batches, where AQE does not run.)"""
    b = big.withColumn("_salt", salt_expr(n_salts))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [key, "_salt"]).drop("_salt")


_SALTED_JOIN_SQL = """
    SELECT e.event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(e.value * m.weight AS DECIMAL(28,6))) AS DOUBLE), 2) AS weighted_sum
    FROM events e
    JOIN (
      SELECT 'click' AS event_type, 1.0 AS weight UNION ALL
      SELECT 'view', 0.5 UNION ALL
      SELECT 'purchase', 10.0 UNION ALL
      SELECT 'scroll', 0.1
    ) m ON e.event_type = m.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
"""


@register("salted_skew_join", _SALTED_JOIN_SQL)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    m = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0), ("scroll", 0.1)],
        "event_type STRING, weight DOUBLE",
    )
    # hint=no broadcast: force the shuffled path the salting protects
    joined = salted_join(e, m.hint("shuffle_hash"), "event_type")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(
                    (F.col("value") * F.col("weight")).cast("decimal(28,6)")
                ).cast("double"),
                2,
            ).alias("weighted_sum"),
        )
        .orderBy("event_type")
    )


# Single source of truth for the bucketed-write lake lever lives in io.py;
# re-exported here because salting + bucketing are presented together as
# the two engine-side scale knobs (tests/test_scale.py exercises the
# exchange-free join plan through this name).
from cours_datalake_dwh_td_kafka_spark.io import write_bucketed  # noqa: E402,F401


# --------------------------------------------------------------------------
# beyond-ref: distributed dense surrogate keys (DWH dimension loads)
# --------------------------------------------------------------------------
_SK_SQL = """
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT) AS sk,
           c_custkey, c_name
    FROM customer
    ORDER BY sk
"""

_SK_BUCKETS = 16


def _adaptive_buckets(df: DataFrame, floor: int = _SK_BUCKETS) -> int:
    """Bucket count for the two-phase prefix kernels, derived from the
    INPUT's partitioning rather than pinned: a fixed constant caps the
    within-bucket sort/rank parallelism at that constant regardless of
    data size (the round-7 audit's last data-independent ceiling). Using
    the source partition count means a 100 TB scan (hundreds of
    thousands of input splits) fans the in-bucket work across the whole
    cluster, while the offset window — n_buckets rows — stays
    driver-scale even at 10^5 buckets. Floor of ``_SK_BUCKETS`` keeps
    tiny local inputs from degenerating to 1 bucket (which would be the
    exact single-reducer shape these kernels exist to kill).
    Determinism is unaffected: offsets are computed from the pinned
    (localCheckpoint-ed) assignment whatever the count is."""
    return max(floor, df.rdd.getNumPartitions())


def dense_ids(
    df: DataFrame,
    order_col: str | tuple[str, ...],
    n_buckets: int | None = None,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gap-free 1..N ids in ``order_col`` order WITHOUT the classic
    single-reducer global window. ROW_NUMBER() OVER (ORDER BY k) — the
    textbook surrogate-key assignment — funnels all N rows through one
    task; at 100 TB that task never finishes. This is the two-phase
    shape instead (the DataFrame form of zipWithIndex):

    1. range-repartition on (partition_cols, key) -> ordered,
       contiguous buckets;
    2. per-(bucket, partition) row counts -> running offsets (a window
       over <= n_buckets + n_groups rows, driver-scale, broadcast back);
    3. ROW_NUMBER within each (bucket, partition) slice (parallel) +
       the slice's offset.

    ``partition_cols`` restart the numbering per key group (the keyed
    ``ROW_NUMBER() OVER (PARTITION BY ... ORDER BY ...)``) — for
    LOW-cardinality keys this is the scale-correct form: one key
    group's numbering spreads over many contiguous buckets instead of
    serializing through one reducer per key (see
    :func:`prefix_sums`). ``order_col`` may be a tuple for composite
    sort keys. The ids are DETERMINISTIC even though repartitionByRange
    samples its bounds nondeterministically: buckets are contiguous in
    (partition, key) order, so offset + within-bucket rank == the
    group-global rank wherever the bounds happen to fall (the full
    order key must be unique within each group — ties could straddle a
    bound). ``n_buckets=None`` (the default) scales the bucket count
    with the input via :func:`_adaptive_buckets`. Oracle: the plain
    ROW_NUMBER."""
    import pyspark.sql.window as W

    if n_buckets is None:
        n_buckets = _adaptive_buckets(df)
    ocols = [order_col] if isinstance(order_col, str) else list(order_col)
    pcols = list(partition_cols)
    bucketed = (
        df.repartitionByRange(n_buckets, *pcols, *ocols)
        .withColumn("_bucket", F.spark_partition_id())
        # feeds BOTH the offset aggregate and the rank/probe side: pin
        # ONE materialization so RangePartitioner's nondeterministic
        # bound sampling cannot place boundary rows in different
        # buckets between the two subtrees (which would silently skew
        # every downstream offset)
        .localCheckpoint(eager=False)
    )
    off_w = (
        W.Window.partitionBy(*pcols).orderBy("_bucket")
        if pcols
        else W.Window.orderBy("_bucket")
    ).rowsBetween(W.Window.unboundedPreceding, -1)
    offsets = (
        bucketed.groupBy("_bucket", *pcols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_offset", F.sum("_n").over(off_w))
        .select(
            "_bucket",
            *pcols,
            F.coalesce("_offset", F.lit(0)).alias("_offset"),
        )
    )
    rn = F.row_number().over(
        W.Window.partitionBy("_bucket", *pcols).orderBy(*ocols)
    )
    return (
        bucketed.withColumn("_rn", rn)
        .join(F.broadcast(offsets), ["_bucket", *pcols])
        .withColumn("sk", (F.col("_offset") + F.col("_rn")).cast("bigint"))
        .drop("_bucket", "_rn", "_offset")
    )


def prefix_sums(
    df: DataFrame,
    order_col: str | tuple[str, ...],
    sums: dict[str, str],
    n_buckets: int | None = None,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Inclusive running sums of integer columns in ``order_col`` order
    WITHOUT the single-reducer global window — the running-sum twin of
    :func:`dense_ids` (same two-phase zipWithIndex shape):

    1. range-repartition on (partition_cols, key) -> ordered,
       contiguous buckets;
    2. per-(bucket, partition) totals -> exclusive running offsets (a
       window over <= n_buckets + n_partitions rows, driver-scale,
       broadcast back);
    3. running sum WITHIN each (bucket, partition) slice (parallel) +
       the slice's offset.

    ``partition_cols`` restart the accumulation per key group (the SQL
    ``PARTITION BY``) — the LOW-CARDINALITY-key case (e.g. ~10 corpus
    sources) where the plain keyed window would serialize terabytes
    through n_keys reducer tasks: because the range shuffle keys on
    (partition_cols, order_col), one key group spans MANY contiguous
    buckets and its accumulation parallelizes across all of them, while
    the offset table stays tiny (a bucket adds one row per key group it
    touches, so <= n_buckets + n_groups - 1 rows total). partition_cols
    must BE low-cardinality: with a high-cardinality key (user_id) the
    offset table is data-scale and gets broadcast — and a plain keyed
    window already parallelizes fine there, so the kernel buys nothing.
    The plan gate's `_bucket` bounding rule only blesses extra group
    keys it finds in plans.inspect.LOW_CARDINALITY_COLS.

    ``sums`` maps output column name -> source column; sources must be
    integer-typed so bucket-boundary placement can't perturb a float
    accumulation order (``order_col`` — a single name or a composite
    tuple, all ascending — must be unique within each key group: ties
    could straddle a range bound). ``n_buckets=None`` scales with the
    input (see :func:`_adaptive_buckets`). Oracle: the plain
    ``SUM() OVER ([PARTITION BY ...] ORDER BY ... ROWS UNBOUNDED
    PRECEDING)``."""
    import pyspark.sql.window as W

    if n_buckets is None:
        n_buckets = _adaptive_buckets(df)
    pcols = list(partition_cols)
    ocols = [order_col] if isinstance(order_col, str) else list(order_col)
    bucketed = (
        df.repartitionByRange(n_buckets, *pcols, *ocols)
        .withColumn("_bucket", F.spark_partition_id())
        # same shared-subtree pin as dense_ids: both consumers (offset
        # aggregate, probe join) must read ONE partition assignment —
        # re-running the range shuffle could sample different bounds
        .localCheckpoint(eager=False)
    )
    # exclusive running offset over BUCKETS, restarted per key group:
    # buckets are contiguous in (partition_cols, order_col) order, so
    # within a key group the bucket id orders its slices globally
    off_w = (
        W.Window.partitionBy(*pcols).orderBy("_bucket")
        if pcols
        else W.Window.orderBy("_bucket")
    ).rowsBetween(W.Window.unboundedPreceding, -1)
    offsets = (
        bucketed.groupBy("_bucket", *pcols)
        .agg(*[F.sum(src).alias(f"_tot_{out}") for out, src in sums.items()])
        .select(
            "_bucket",
            *pcols,
            *[
                F.coalesce(
                    F.sum(f"_tot_{out}").over(off_w), F.lit(0)
                ).alias(f"_off_{out}")
                for out in sums
            ],
        )
    )
    run_w = (
        W.Window.partitionBy("_bucket", *pcols)
        .orderBy(*ocols)
        .rowsBetween(W.Window.unboundedPreceding, W.Window.currentRow)
    )
    out = bucketed.join(F.broadcast(offsets), ["_bucket", *pcols])
    for name, src in sums.items():
        out = out.withColumn(
            name, F.sum(src).over(run_w) + F.col(f"_off_{name}")
        )
    return out.drop("_bucket", *[f"_off_{n}" for n in sums])


@register("surrogate_keys", _SK_SQL)
def q_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return dense_ids(c, "c_custkey").select(
        "sk", "c_custkey", "c_name"
    ).orderBy("sk")


# --------------------------------------------------------------------------
# key-skew diagnostic: the statistic you inspect BEFORE reaching for the
# salted variants above
# --------------------------------------------------------------------------
_SKEW_SQL = """
    WITH per_key AS (
      SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(n) AS BIGINT) AS max_rows,
           ROUND(quantile_cont(n, 0.5), 6) AS p50_rows,
           ROUND(quantile_cont(n, 0.99), 6) AS p99_rows,
           ROUND(CAST(MAX(n) AS DOUBLE) / quantile_cont(n, 0.5), 6)
             AS skew_ratio
    FROM per_key
"""


def key_skew_profile(d: DataFrame, key: str) -> DataFrame:
    """One-row skew profile of a prospective join/aggregation key:
    distinct-key count, the hottest key's row count, median and p99
    rows per key, and max/median as the skew ratio — the number that
    decides between a plain hash join (ratio ~ 1-10), AQE skew-join
    splitting (10-100), and explicit salting (beyond, or when a single
    key exceeds one executor's memory).

    Scale shape: one keyed count (map-side partial) then a single
    all-reduce over the per-key counts — the profile costs one shuffle
    of (key, count) pairs, which is exactly what any re-keying decision
    already pays. Exact interpolated percentiles, the same
    F.percentile <-> quantile_cont parity the quantiles query pins."""
    per_key = d.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    p50 = F.percentile("n", F.lit(0.5))
    return per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("n").cast("bigint").alias("max_rows"),
        F.round(p50, 6).alias("p50_rows"),
        F.round(F.percentile("n", F.lit(0.99)), 6).alias("p99_rows"),
        F.round(F.max("n").cast("double") / p50, 6).alias("skew_ratio"),
    )


@register("key_skew_profile", _SKEW_SQL)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    return key_skew_profile(li, "l_orderkey")


def prefix_min(
    df: DataFrame,
    order_col: str,
    mins: dict[str, str],
    n_buckets: int | None = None,
) -> DataFrame:
    """EXCLUSIVE running minimums in ``order_col`` order without the
    single-reducer global window — the running-min sibling of
    :func:`prefix_sums` (same two-phase shape: range buckets, per-bucket
    totals, a window over the n_buckets offset rows only, then parallel
    in-bucket windows). Exclusive (strictly-preceding rows) because the
    canonical consumer is dominance testing (skyline), where a row must
    not see itself; the first row's prefix is NULL.

    ``order_col`` must be unique (ties could straddle a range bound).
    ``n_buckets=None`` scales with the input (:func:`_adaptive_buckets`).
    Oracle: ``MIN() OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING
    AND 1 PRECEDING)``."""
    import pyspark.sql.window as W

    if n_buckets is None:
        n_buckets = _adaptive_buckets(df)
    bucketed = (
        df.repartitionByRange(n_buckets, order_col)
        .withColumn("_bucket", F.spark_partition_id())
        # shared-subtree pin (see prefix_sums): offset aggregate and
        # probe join must read ONE partition assignment
        .localCheckpoint(eager=False)
    )
    off_w = W.Window.orderBy("_bucket").rowsBetween(
        W.Window.unboundedPreceding, -1
    )
    offsets = (
        bucketed.groupBy("_bucket")
        .agg(*[F.min(src).alias(f"_tot_{out}") for out, src in mins.items()])
        .select(
            "_bucket",
            *[
                F.min(f"_tot_{out}").over(off_w).alias(f"_off_{out}")
                for out in mins
            ],
        )
    )
    run_w = (
        W.Window.partitionBy("_bucket")
        .orderBy(order_col)
        .rowsBetween(W.Window.unboundedPreceding, -1)
    )
    out = bucketed.join(F.broadcast(offsets), "_bucket")
    for name, src in mins.items():
        # least() skips nulls: first row of first bucket -> NULL prefix
        out = out.withColumn(
            name, F.least(F.min(src).over(run_w), F.col(f"_off_{name}"))
        )
    return out.drop("_bucket", *[f"_off_{n}" for n in mins])


# --------------------------------------------------------------------------
# skyline (Pareto frontier) via the two-phase exclusive running min
# --------------------------------------------------------------------------
_PARETO_SQL = """
    WITH per_part AS (
      SELECT l_partkey,
             MIN(l_extendedprice) AS px,
             MIN(date_diff('day', o.o_orderdate, l.l_shipdate)) AS dy
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY l_partkey
    ),
    per_price AS (
      SELECT px AS price, MIN(dy) AS delay_days FROM per_part GROUP BY px
    ),
    ranked AS (
      SELECT price, delay_days,
             MIN(delay_days) OVER (ORDER BY price
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS prev_min
      FROM per_price
    )
    SELECT ROUND(price, 6) AS price,
           CAST(delay_days AS BIGINT) AS delay_days
    FROM ranked
    WHERE prev_min IS NULL OR delay_days < prev_min
    ORDER BY price
"""


def pareto_frontier(li: DataFrame, o: DataFrame) -> DataFrame:
    """Skyline query: the Pareto frontier of (cheapest observed price,
    fastest observed ship delay) over parts — every point no other
    point beats on BOTH axes, the classic multi-criteria shortlist
    (cheap-and-fast suppliers, small-and-accurate models, ...). An
    operator class plain GROUP BY can't express: dominance couples rows
    across the whole set.

    Scale shape: the naive skyline is a quadratic dominance self-join;
    the 2-D case collapses to sort + exclusive running min (a point
    survives iff no cheaper point ships as fast), and the running min
    uses the two-phase :func:`prefix_min` — range buckets, an offset
    window over n_buckets rows only — so NO data-scale single-partition
    window exists (the repo's global-window discipline). Inputs
    collapse to one row per distinct price before the frontier pass.
    MIN-picked doubles and integer day counts compare exactly across
    engines (no accumulation)."""
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    per_part = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_partkey")
        .agg(
            F.min("l_extendedprice").alias("px"),
            F.min(delay).alias("dy"),
        )
    )
    per_price = (
        per_part.groupBy(F.col("px").alias("price"))
        .agg(F.min("dy").alias("delay_days"))
    )
    ranked = prefix_min(per_price, "price", {"prev_min": "delay_days"})
    return (
        ranked.where(
            F.col("prev_min").isNull()
            | (F.col("delay_days") < F.col("prev_min"))
        )
        .select(
            F.round("price", 6).alias("price"),
            F.col("delay_days").cast("bigint").alias("delay_days"),
        )
        .orderBy("price")
    )


@register("pareto_frontier", _PARETO_SQL)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pareto_frontier(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
    )
