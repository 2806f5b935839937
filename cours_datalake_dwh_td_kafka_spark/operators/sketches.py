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


# ---------------------------------------------------------------------------
# KMV / AKMV set-operation sketches (round 11, beyond-ref): k-minimum-
# values distinct-count sketches with union AND intersection estimates
# (Bar-Yossef et al. 2002; Beyer et al. 2007 "On Synopses for Distinct-
# Value Estimation Under Multiset Operations" — the theta-sketch
# family's public ancestor). At 100 TB, "how many customers overlap
# between these two periods" is answered from two k-row synopses
# instead of a corpus-wide distinct join; KMV sketches are mergeable
# (union = k smallest of the combined samples), so each partition /
# day / source ships k longs and the fold is associative.
#
# Everything here is DETERMINISTIC (the md5-derived HASH32 both engines
# share), so the oracle recomputes the SAME estimates and the driver
# value-hashes the estimates themselves, not just bound booleans.
# ---------------------------------------------------------------------------
KMV_K = 256
KMV_YEAR_A = 1996
KMV_YEAR_B = 1997
#: 2^32 — HASH32 is uniform on [0, 2^32); normalizing by this maps the
#: k-th minimum to the (k-1)/D order statistic the estimator inverts.
_KMV_SCALE = 4294967296
#: relative-error acceptance: RSE of the (k-1)/U_k estimator is
#: ~1/sqrt(k-2) (~6.3% at k=256); 5x that is a >5-sigma acceptance band.
KMV_BOUND = 5.0 / (KMV_K ** 0.5)


def kmv_sketch(df: DataFrame, key_col: str, k: int = KMV_K) -> DataFrame:
    """The k smallest DISTINCT HASH32 values of ``key_col`` — a k-row
    synopsis of the column's distinct-value set. orderBy+limit plans
    TakeOrderedAndProject (per-partition heaps of k, one k-row reduce),
    so building the sketch never sorts or shuffles the full key set."""
    from cours_datalake_dwh_td_kafka_spark.operators.dedup import (
        _HASH32_SPARK,
    )

    return (
        df.select(
            _HASH32_SPARK(F.col(key_col).cast("string")).alias("h")
        )
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def _kmv_estimate(hashes: list[int], k: int) -> float:
    """(k-1)/U_k when the sketch is full; exact sample size otherwise
    (a sketch smaller than k IS the whole distinct set)."""
    if len(hashes) < k:
        return float(len(hashes))
    return (k - 1) * _KMV_SCALE / hashes[-1]


def kmv_set_ops(
    spark: SparkSession,
    orders: DataFrame,
    k: int = KMV_K,
    year_a: int = KMV_YEAR_A,
    year_b: int = KMV_YEAR_B,
) -> DataFrame:
    """Distinct-customer cardinalities of two order-year cohorts plus
    their UNION and INTERSECTION, estimated from two k-row KMV
    sketches and attested against the exact counts in the same row.

    Union: the k smallest of the combined samples is exactly the KMV
    sketch of A union B (mergeability). Intersection (AKMV, Beyer et
    al. 2007 §4): within the union sketch K, every v <= theta_K is a
    uniform sample of A union B, so the fraction of K present in BOTH
    per-set samples estimates the Jaccard ratio, and
    est_inter = |K cap A cap B| / |K| * est_union.

    Scale shape: each sketch is one distinct + TakeOrdered(k) over its
    cohort — k longs leave each partition, k longs reach the driver
    (bounded collect, the centroid-collect discipline); the estimates
    are O(k) python-int arithmetic. The exact counts are computed ONLY
    for the attestation columns; a deployment reads the three
    estimates from the synopses alone."""
    sa = [r.h for r in kmv_sketch(orders.where(
        F.year("o_orderdate") == year_a), "o_custkey", k).collect()]
    sb = [r.h for r in kmv_sketch(orders.where(
        F.year("o_orderdate") == year_b), "o_custkey", k).collect()]
    union_samples = sorted(set(sa) | set(sb))[:k]
    in_both = set(sa) & set(sb)
    rho = sum(1 for h in union_samples if h in in_both)
    est_a = _kmv_estimate(sa, k)
    est_b = _kmv_estimate(sb, k)
    est_union = _kmv_estimate(union_samples, k)
    est_inter = rho * est_union / len(union_samples) if union_samples else 0.0

    exact = orders.where(
        F.year("o_orderdate").isin(year_a, year_b)
    ).agg(
        F.countDistinct(
            F.when(F.year("o_orderdate") == year_a, F.col("o_custkey"))
        ).alias("exact_a"),
        F.countDistinct(
            F.when(F.year("o_orderdate") == year_b, F.col("o_custkey"))
        ).alias("exact_b"),
        F.countDistinct("o_custkey").alias("exact_union"),
    ).first()
    exact_a, exact_b, exact_union = (
        int(exact.exact_a), int(exact.exact_b), int(exact.exact_union)
    )
    exact_inter = exact_a + exact_b - exact_union

    def ok(est: float, true: int, scale: int) -> bool:
        return abs(est - true) <= KMV_BOUND * max(scale, 1)

    return spark.createDataFrame(
        [
            (
                exact_a,
                exact_b,
                exact_union,
                exact_inter,
                round(est_a, 6),
                round(est_b, 6),
                round(est_union, 6),
                round(est_inter, 6),
                ok(est_a, exact_a, exact_a),
                ok(est_b, exact_b, exact_b),
                ok(est_union, exact_union, exact_union),
                # intersection error is bounded relative to the UNION
                # (the estimator scales rho by est_union)
                ok(est_inter, exact_inter, exact_union),
            )
        ],
        "exact_a BIGINT, exact_b BIGINT, exact_union BIGINT, "
        "exact_inter BIGINT, est_a DOUBLE, est_b DOUBLE, "
        "est_union DOUBLE, est_inter DOUBLE, a_ok BOOLEAN, "
        "b_ok BOOLEAN, union_ok BOOLEAN, inter_ok BOOLEAN",
    )


_KMV_HASH = "CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS UBIGINT)::BIGINT"

_KMV_SQL = f"""
    WITH sa AS (
      SELECT DISTINCT {_KMV_HASH} AS h
      FROM orders WHERE year(o_orderdate) = {KMV_YEAR_A}
      ORDER BY h LIMIT {KMV_K}
    ),
    sb AS (
      SELECT DISTINCT {_KMV_HASH} AS h
      FROM orders WHERE year(o_orderdate) = {KMV_YEAR_B}
      ORDER BY h LIMIT {KMV_K}
    ),
    su AS (
      SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
      ORDER BY h LIMIT {KMV_K}
    ),
    est AS (
      SELECT
        CASE WHEN (SELECT COUNT(*) FROM sa) < {KMV_K}
             THEN CAST((SELECT COUNT(*) FROM sa) AS DOUBLE)
             ELSE ({KMV_K} - 1) * {_KMV_SCALE}.0 / (SELECT MAX(h) FROM sa)
        END AS est_a,
        CASE WHEN (SELECT COUNT(*) FROM sb) < {KMV_K}
             THEN CAST((SELECT COUNT(*) FROM sb) AS DOUBLE)
             ELSE ({KMV_K} - 1) * {_KMV_SCALE}.0 / (SELECT MAX(h) FROM sb)
        END AS est_b,
        CASE WHEN (SELECT COUNT(*) FROM su) < {KMV_K}
             THEN CAST((SELECT COUNT(*) FROM su) AS DOUBLE)
             ELSE ({KMV_K} - 1) * {_KMV_SCALE}.0 / (SELECT MAX(h) FROM su)
        END AS est_union,
        (SELECT COUNT(*) FROM su WHERE h IN (SELECT h FROM sa)
                                   AND h IN (SELECT h FROM sb))
          AS rho,
        (SELECT COUNT(*) FROM su) AS n_su
    ),
    ex AS (
      SELECT
        COUNT(DISTINCT CASE WHEN year(o_orderdate) = {KMV_YEAR_A}
                            THEN o_custkey END) AS exact_a,
        COUNT(DISTINCT CASE WHEN year(o_orderdate) = {KMV_YEAR_B}
                            THEN o_custkey END) AS exact_b,
        COUNT(DISTINCT o_custkey) AS exact_union
      FROM orders
      WHERE year(o_orderdate) IN ({KMV_YEAR_A}, {KMV_YEAR_B})
    )
    SELECT
      CAST(exact_a AS BIGINT) AS exact_a,
      CAST(exact_b AS BIGINT) AS exact_b,
      CAST(exact_union AS BIGINT) AS exact_union,
      CAST(exact_a + exact_b - exact_union AS BIGINT) AS exact_inter,
      ROUND(est_a, 6) AS est_a,
      ROUND(est_b, 6) AS est_b,
      ROUND(est_union, 6) AS est_union,
      ROUND(CASE WHEN n_su > 0 THEN rho * est_union / n_su
                 ELSE 0.0 END, 6) AS est_inter,
      ABS(est_a - exact_a) <= {KMV_BOUND} * GREATEST(exact_a, 1) AS a_ok,
      ABS(est_b - exact_b) <= {KMV_BOUND} * GREATEST(exact_b, 1) AS b_ok,
      ABS(est_union - exact_union)
        <= {KMV_BOUND} * GREATEST(exact_union, 1) AS union_ok,
      ABS(CASE WHEN n_su > 0 THEN rho * est_union / n_su ELSE 0.0 END
          - (exact_a + exact_b - exact_union))
        <= {KMV_BOUND} * GREATEST(exact_union, 1) AS inter_ok
    FROM est CROSS JOIN ex
"""


@register("kmv_set_ops", _KMV_SQL)
def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmv_set_ops(spark, load_table(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Misra-Gries two-pass EXACT heavy hitters (round 11, beyond-ref):
# the deterministic complement of the CMS row. Pass 1 runs the
# Misra-Gries summary per partition (k counters, one sequential sweep)
# — the classic completeness guarantee composes across partitions:
# any item with global frequency > n/k MUST survive in at least one
# partition's summary (within a partition it can be decremented at
# most n_p/k times, and summing over partitions the total decrement
# budget is n/k). Pass 2 exactly recounts ONLY the candidate set
# (a broadcast semi-join), so the output is exact counts — at 100 TB
# the second pass reads the column once more but shuffles only
# candidate rows, never a full groupBy of the key space.
# ---------------------------------------------------------------------------
MG_K = 4  # counters per partition -> completeness threshold n/4


def mg_candidates(df: DataFrame, key: str, k: int = MG_K) -> DataFrame:
    """Per-partition WEIGHTED Misra-Gries summaries (Berinde et al.
    2010's heavy-hitter summary under weighted updates), unioned: every
    global > n/k heavy hitter is guaranteed present. Counters persist
    across a partition's Arrow batches; within a batch the keys are
    pre-aggregated with vectorized value_counts, so the Python loop
    runs once per DISTINCT key per batch, never per row — each
    eviction destroys (k+1) x m total weight, so the summed decrement
    budget stays <= n/(k+1) < n/k and the classic completeness bound
    survives the batching."""
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[key].value_counts()
            for v, w in vc.items():
                v = v.item() if hasattr(v, "item") else v
                w = int(w)
                if v in counters:
                    counters[v] += w
                elif len(counters) < k:
                    counters[v] = w
                else:
                    m = min(w, min(counters.values()))
                    for c in list(counters):
                        counters[c] -= m
                        if counters[c] <= 0:
                            del counters[c]
                    if w - m > 0:
                        counters[v] = w - m
        if counters:
            yield pd.DataFrame({key: list(counters.keys())})

    return df.select(key).mapInPandas(
        summarize, df.select(key).schema
    ).distinct()


def heavy_hitters_mg(
    df: DataFrame, key: str, k: int = MG_K
) -> DataFrame:
    """EXACT set of items with global frequency > n/k, by the
    MG-candidates + exact-recount protocol. The output is what the
    theorem actually promises (every > n/k item survives the summary),
    so the row is non-vacuous exactly when the column is skewed —
    registered over documents.lang, whose majority class clears n/4
    while four counters force real evictions among the rest. The
    completeness boolean re-audits the guarantee against a full exact
    count of the attestation corpus: a wrongly evicted heavy hitter
    would flip it and fail the hash."""
    from pyspark.sql import functions as F

    cand = mg_candidates(df, key, k).localCheckpoint(eager=False)
    n = df.count()
    thresh = n / k
    counted = (
        df.join(F.broadcast(cand), key, "left_semi")
        .groupBy(key)
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .where(F.col("exact_cnt") > thresh)
        .localCheckpoint(eager=False)
    )
    true_heavy = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .where(F.col("c") > thresh)
    )
    missing = true_heavy.join(counted, key, "left_anti").count()
    complete = missing == 0
    return counted.select(
        key,
        "exact_cnt",
        F.lit(bool(complete)).alias("above_threshold_complete_ok"),
    ).orderBy(F.desc("exact_cnt"), F.asc(key))


_MG_SQL = f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS exact_cnt,
           TRUE AS above_threshold_complete_ok
    FROM documents
    GROUP BY lang
    HAVING COUNT(*) > (SELECT COUNT(*) FROM documents) / {MG_K}.0
    ORDER BY exact_cnt DESC, lang
"""


@register("heavy_hitters_mg", _MG_SQL)
def q_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heavy_hitters_mg(
        load_table(spark, sf_dir, "documents"), "lang"
    )
