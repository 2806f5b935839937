"""Matryoshka-embedding truncation evaluation: retrieval recall as a
function of PREFIX DIMENSION.

Matryoshka Representation Learning (Kusupati et al. 2022) trains
embeddings whose prefixes are themselves usable embeddings, so a
serving stack can store/scan the first d' << d dimensions and rerank
with the full vector only for finalists. Whether a given embedding
column actually HAS that property is an empirical question a data
pipeline must answer before committing to the cheaper index — this row
is that measurement: for each candidate prefix width, run the same
brute-force cosine top-k the exact ANN row runs, and report per-query
recall against the full-width truth.

This is the DIMENSION axis of the quantization trade-off space, the
complement of the BIT-DEPTH axis (`ann_binary_hamming`: 1 bit/dim) and
the CODEBOOK axis (`ann_ivfpq_*`: PQ codes). A 16-of-64 prefix scan
reads 4x less than full-width floats; the row tells you what recall
that buys on THIS corpus.

Scale shape: each prefix width is one broadcast-queries corpus scan +
the salted two-stage top-k (never a single-reducer window); widths are
a small literal list so the union is a bounded fan-out of identical
plans, and the recall join is (n_queries x k) rows semi-joined to
(n_queries x k) rows — driver-free, broadcast both sides. The oracle
recomputes everything from DuckDB list slices, so the Spark-side
``slice()`` arithmetic is value-verified, not trusted.

Two cohorts (round 12, verdict #8): the RAW cohort measures the
synthetic testdata as-is (recall@16 ~0.08 — these embeddings are NOT
matryoshka-trained, the honest negative the row exists to report), and
the WEIGHTED cohort applies a deterministic importance decay
w_i = 0.5^((i-1)/8) — a stand-in for what matryoshka TRAINING does to
the information profile (front-loads it) — demonstrating the positive
case on the same machinery: once the signal mass lives in the early
dims, the 16-dim prefix scan recovers most of the full-width top-k.
Both engines spell the identical 64 weight doubles (repr-generated
literals), so the weighted cosines round-6 match exactly like the raw
ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    global_topk,
)
from cours_datalake_dwh_td_kafka_spark.registry import register

#: prefix widths to evaluate; the largest is the full testdata width and
#: therefore the truth set (recall 1.0 by construction — kept in the
#: output as the self-check row)
MATRYOSHKA_DIMS = (64, 32, 16)

#: per-dimension importance decay of the WEIGHTED cohort; identical
#: decimal literals feed both engines
MATRYOSHKA_WEIGHTS = tuple(
    0.5 ** (i / 8.0) for i in range(max(MATRYOSHKA_DIMS))
)


def _weighted(emb: Column) -> Column:
    """Apply the matryoshka importance decay: emb[i] * w_i, identical
    literal doubles on both engines."""
    w = F.array(*[F.lit(x) for x in MATRYOSHKA_WEIGHTS])
    return F.zip_with(emb, w, lambda x, wi: x * wi)


def _prefix_folds(products: Column, dims: tuple[int, ...]) -> dict[int, Column]:
    """Sequential left-fold prefix sums of ``products`` at each width in
    ``dims``, via continuation folds: the fold over elements d_prev+1..d
    is seeded with the fold value at d_prev, so every prefix sum performs
    the EXACT operation sequence of an independent left fold over
    ``slice(products, 1, d)`` — bit-identical doubles, one logical pass
    (guide §1: same result, fewer scans). FP addition is non-associative,
    which is why segment sums must continue the running total rather than
    be added post hoc."""
    out: dict[int, Column] = {}
    prev: Column = F.lit(0.0)
    start = 1
    for d in sorted(dims):
        seg = F.slice(products, start, d - start + 1)
        cur = F.aggregate(seg, prev, lambda acc, v: acc + v)
        out[d] = cur
        prev = cur
        start = d + 1
    return out


def _norm_cols(emb: Column, dims: tuple[int, ...], prefix: str) -> list[Column]:
    """Per-row prefix norms sqrt(sum of squares of first d dims) — the
    exact `vec_norm(slice(emb, 1, d))` doubles, computed once per VECTOR
    instead of once per pair (dedup.cosine_sim's own guidance)."""
    sq = F.transform(emb, lambda v: v * v)
    folds = _prefix_folds(sq, dims)
    return [F.sqrt(folds[d]).alias(f"{prefix}{d}") for d in dims]


def _ranked_all(
    e: DataFrame,
    dims: tuple[int, ...],
    top_k: int,
    n_queries: int,
) -> DataFrame:
    """ONE broadcast-queries corpus pass scoring BOTH cohorts at ALL
    prefix widths (guide §1.2 step 1: 8 cross-join scans -> 1).

    Per pair, the 64-element product array is folded once per cohort
    with prefix checkpoints (`_prefix_folds`); norms are precomputed per
    vector. Each cosine is `round(dot_d / (q_norm_d * n_norm_d), 6)` —
    the same arithmetic `cosine_sim` over sliced arrays performs, so
    every ranked row is bit-identical to the previous per-dim scans.
    Output: (cohort, query_id, trunc_dim, neighbor_id, cosine, rn)."""
    raw = F.col("embedding").cast("array<double>")
    wtd = _weighted(raw)
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        raw.alias("n_raw"),
        wtd.alias("n_wtd"),
        *_norm_cols(raw, dims, "nr"),
        *_norm_cols(wtd, dims, "nw"),
    )
    queries = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        raw.alias("q_raw"),
        wtd.alias("q_wtd"),
        *_norm_cols(raw, dims, "qr"),
        *_norm_cols(wtd, dims, "qw"),
    )
    pairs = corpus.crossJoin(F.broadcast(queries)).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    fam = []
    for cohort, q, n, qn, nn in (
        ("raw", "q_raw", "n_raw", "qr", "nr"),
        ("weighted", "q_wtd", "n_wtd", "qw", "nw"),
    ):
        dots = _prefix_folds(
            F.zip_with(F.col(q), F.col(n), lambda x, y: x * y), dims
        )
        for d in dims:
            fam.append(
                F.struct(
                    F.lit(cohort).alias("cohort"),
                    F.lit(d).cast("long").alias("trunc_dim"),
                    F.round(
                        dots[d] / (F.col(f"{qn}{d}") * F.col(f"{nn}{d}")), 6
                    ).alias("cosine"),
                )
            )
    scored = (
        pairs.select(
            "query_id", "neighbor_id", F.explode(F.array(*fam)).alias("f")
        )
        .select(
            "query_id",
            F.col("f.cohort").alias("cohort"),
            F.col("f.trunc_dim").alias("trunc_dim"),
            "neighbor_id",
            F.col("f.cosine").alias("cosine"),
        )
    )
    return global_topk(scored, top_k, by=("query_id", "cohort", "trunc_dim"))


def matryoshka_recall(
    e: DataFrame,
    dims: tuple[int, ...] = MATRYOSHKA_DIMS,
    top_k: int = TOP_K,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """Both cohorts' per-query recall@k of each prefix width against
    that cohort's full-width top-k. Output: (cohort, query_id,
    trunc_dim, hits, recall) ordered by (cohort, trunc_dim desc,
    query_id)."""
    full_dim = max(dims)
    # ~ n_queries * |dims| * 2 * k rows; the lazy checkpoint pins the
    # single expensive corpus pass so truth and candidates share it.
    ranked = _ranked_all(e, dims, top_k, n_queries).localCheckpoint(
        eager=False
    )
    cands = ranked.select("cohort", "query_id", "neighbor_id", "trunc_dim")
    truth = ranked.where(F.col("trunc_dim") == full_dim).select(
        "cohort", "query_id", "neighbor_id"
    )
    hits = (
        cands.join(
            F.broadcast(truth),
            ["cohort", "query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("cohort", "query_id", "trunc_dim")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    # a prefix whose top-k misses the truth ENTIRELY would drop out of
    # the hits aggregate: rebuild the (query, dim) grid from the
    # candidate side so recall 0.0 rows survive
    grid = cands.select("cohort", "query_id", "trunc_dim").distinct()
    return (
        grid.join(hits, ["cohort", "query_id", "trunc_dim"], "left")
        .select(
            "cohort",
            "query_id",
            "trunc_dim",
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
            F.round(
                F.coalesce("hits", F.lit(0)) / F.lit(float(top_k)), 6
            ).alias("recall"),
        )
        .orderBy("cohort", F.desc("trunc_dim"), F.asc("query_id"))
    )


def _emb_sql(weighted: bool, alias: str) -> str:
    """The cohort's embedding expression over table alias ``alias`` —
    weighted spells the same repr-doubles the Spark literals use."""
    base = f"({alias}.embedding::DOUBLE[])"
    if not weighted:
        return base
    terms = ", ".join(
        f"{base}[{i + 1}] * {w!r}" for i, w in enumerate(MATRYOSHKA_WEIGHTS)
    )
    return f"LIST_VALUE({terms})"


def _dim_cte(d: int, weighted: bool) -> str:
    cohort = "weighted" if weighted else "raw"
    return f"""
      SELECT '{cohort}' AS cohort, query_id, neighbor_id, {d} AS trunc_dim
      FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY ROUND(list_cosine_similarity(
                            ({_emb_sql(weighted, "q")})[1:{d}],
                            ({_emb_sql(weighted, "e")})[1:{d}]), 6) DESC,
                          e.vec_id
               ) AS rn
        FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rn <= {TOP_K}
    """


_MATRYOSHKA_SQL = f"""
    WITH cands AS (
      {" UNION ALL ".join(
          _dim_cte(d, w)
          for w in (False, True)
          for d in MATRYOSHKA_DIMS
      )}
    ),
    truth AS (
      SELECT cohort, query_id, neighbor_id FROM cands
      WHERE trunc_dim = {max(MATRYOSHKA_DIMS)}
    ),
    hits AS (
      SELECT c.cohort, c.query_id, c.trunc_dim,
             CAST(COUNT(t.neighbor_id) AS BIGINT) AS hits
      FROM cands c
      LEFT JOIN truth t ON t.cohort = c.cohort
                       AND t.query_id = c.query_id
                       AND t.neighbor_id = c.neighbor_id
      GROUP BY c.cohort, c.query_id, c.trunc_dim
    )
    SELECT cohort, query_id, CAST(trunc_dim AS BIGINT) AS trunc_dim, hits,
           ROUND(CAST(hits AS DOUBLE) / {TOP_K}.0, 6) AS recall
    FROM hits
    ORDER BY cohort, trunc_dim DESC, query_id
"""


@register("ann_matryoshka_recall", _MATRYOSHKA_SQL)
def q_ann_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return matryoshka_recall(load_table(spark, sf_dir, "embeddings"))
