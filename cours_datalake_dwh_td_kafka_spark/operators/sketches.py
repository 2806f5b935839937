"""Streaming-friendly sketch operators: a count-min sketch (CMS) for
heavy-hitter frequency estimation, expressed as pure keyed aggregations
(the sketch IS a d x w count table — O(d*w) state regardless of input
size, mergeable across partitions/batches by summing buckets).

Correctness contract follows the approx_quantiles pattern: the query
verifies the sketch's error bound IN-QUERY against the exact counts and
emits the verdict, so the DuckDB oracle (which cannot evaluate
xxhash64) pins the exact counts and the bound check — a hash-green row
attests both the heavy-hitter set and that every estimate respects
exact <= est <= exact + (BOUND_FACTOR/w) * N (CMS never
underestimates; overshoot is collision mass, expected N/w per hash,
min over d hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.registry import register

CMS_WIDTH = 512
CMS_DEPTH = 4
CMS_TOP_N = 20
#: overshoot tolerance in units of N/w — expected collision mass is 1
#: N/w per hash row; taking the min over CMS_DEPTH independent rows,
#: P(all four exceed 8x the mean) < (1/8)^4 by Markov.
CMS_BOUND_FACTOR = 8

_CMS_SQL = f"""
    SELECT user_id,
           COUNT(*) AS exact_cnt,
           TRUE AS est_within_bound
    FROM events
    GROUP BY user_id
    ORDER BY exact_cnt DESC, user_id
    LIMIT {CMS_TOP_N}
"""


def cms_sketch(
    df: DataFrame, key: str, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> DataFrame:
    """Build the (seed, bucket, cnt) count-min table for ``df[key]``.

    Each row fans out to ``depth`` (seed, bucket) cells; map-side
    partial aggregation collapses the fan-out to at most depth*width
    rows per task before the single exchange, so the shuffle carries
    O(d*w) rows per partition no matter how many input rows — the
    constant-state property that makes CMS the right heavy-hitter
    structure at 100 TB (an exact groupBy key count shuffles one row
    per DISTINCT key, unbounded)."""
    seeds = F.array(*[F.lit(i) for i in range(depth)])
    return (
        df.select(F.col(key), F.explode(seeds).alias("seed"))
        .groupBy(
            "seed",
            F.pmod(F.xxhash64(key, "seed"), F.lit(width)).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Point-estimate each key in ``keys`` from a CMS table: min over
    the key's ``depth`` cells. The sketch side is at most d*w rows —
    always broadcast."""
    seeds = F.array(*[F.lit(i) for i in range(depth)])
    cells = keys.select(F.col(key), F.explode(seeds).alias("seed")).select(
        key,
        "seed",
        F.pmod(F.xxhash64(key, "seed"), F.lit(width)).alias("bucket"),
    )
    return (
        cells.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy(key)
        .agg(F.min("cnt").alias("cms_est"))
    )


def heavy_hitters_cms(
    ev: DataFrame,
    key: str = "user_id",
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    top_n: int = CMS_TOP_N,
) -> DataFrame:
    """Top-``top_n`` keys by exact count, each annotated with whether
    the CMS estimate respects the sketch's error bound. One pass builds
    the sketch, one keyed aggregate ranks exact counts (at true 100 TB
    scale the exact side would itself come FROM the sketch or a salted
    agg; here it doubles as the in-query oracle for the bound)."""
    sketch = cms_sketch(ev, key, width, depth)
    exact = (
        ev.groupBy(key)
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), key)
        .limit(top_n)
    )
    n_total = ev.agg(F.count(F.lit(1)).alias("n_total"))
    est = cms_estimate(exact, sketch, key, width, depth)
    bound = F.col("exact_cnt") + F.ceil(
        F.lit(CMS_BOUND_FACTOR) * F.col("n_total") / F.lit(width)
    )
    return (
        exact.join(F.broadcast(est), key)
        .crossJoin(F.broadcast(n_total))
        .select(
            key,
            "exact_cnt",
            (
                (F.col("cms_est") >= F.col("exact_cnt"))
                & (F.col("cms_est") <= bound)
            ).alias("est_within_bound"),
        )
        .orderBy(F.desc("exact_cnt"), key)
    )


@register("heavy_hitters_cms", _CMS_SQL)
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heavy_hitters_cms(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count with an in-query relative-error bound
# ---------------------------------------------------------------------------
HLL_RSD = 0.05

_HLL_SQL = """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_distinct,
           TRUE AS within_bound
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""


def distinct_hll_bound(
    e: DataFrame, key: str = "event_type", col: str = "user_id",
    rsd: float = HLL_RSD,
) -> DataFrame:
    """Per-group approximate distinct count (Spark's HLL++,
    ``approx_count_distinct``) checked in-query against the exact
    count: the driver-hashed columns are the exact distinct plus
    ``within_bound`` — |approx - exact| <= 6*rsd*exact (6 sigma of the
    advertised relative standard deviation; HLL++'s bias correction
    keeps observed error well inside). Same contract pattern as
    ``approx_quantiles``/``heavy_hitters_cms``: the sketch VALUE is
    engine-specific, the GUARANTEE is the oracle-checkable fact.

    Scale shape: the exact side is here only because the check needs
    ground truth — in production the sketch runs alone: one pass, O(1)
    state per group, mergeable across partitions (it's the partial-agg
    that makes count-distinct cheap at 100 TB)."""
    agg = e.groupBy(key).agg(
        F.approx_count_distinct(col, rsd).alias("approx"),
        F.count_distinct(F.col(col)).alias("exact_distinct"),
    )
    err = F.abs(F.col("approx") - F.col("exact_distinct"))
    return agg.select(
        key,
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        (err <= F.lit(6.0 * rsd) * F.col("exact_distinct")).alias(
            "within_bound"
        ),
    ).orderBy(key)


@register("distinct_hll_bound", _HLL_SQL)
def q_distinct_hll_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_hll_bound(load_table(spark, sf_dir, "events"))
