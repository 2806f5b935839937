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
from cours_datalake_dwh_td_kafka_spark.operators.dedup import cosine_sim
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


def _topk_at_dim(
    e: DataFrame,
    dim: int,
    top_k: int,
    n_queries: int,
    weighted: bool = False,
) -> DataFrame:
    """Brute-force rounded-cosine top-k over the first ``dim`` dims —
    the `ann_topk_lambda` plan with sliced (optionally decay-weighted)
    vectors."""
    emb = F.col("embedding").cast("array<double>")
    if weighted:
        emb = _weighted(emb)
    emb = F.slice(emb, 1, dim)
    corpus = e.select(F.col("vec_id").alias("neighbor_id"), emb.alias("n_emb"))
    queries = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), emb.alias("q_emb")
    )
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine", F.round(cosine_sim(F.col("q_emb"), F.col("n_emb")), 6)
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    return global_topk(scored, top_k)


def _cohort_recall(
    e: DataFrame,
    dims: tuple[int, ...],
    top_k: int,
    n_queries: int,
    weighted: bool,
) -> DataFrame:
    """Per-query recall@k of each prefix width against the full-width
    top-k within ONE cohort."""
    full_dim = max(dims)
    truth = (
        _topk_at_dim(e, full_dim, top_k, n_queries, weighted)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    per_dim = []
    for d in dims:
        cand = _topk_at_dim(e, d, top_k, n_queries, weighted).select(
            "query_id", "neighbor_id", F.lit(d).cast("long").alias("trunc_dim")
        )
        per_dim.append(cand)
    cands = per_dim[0]
    for p in per_dim[1:]:
        cands = cands.unionByName(p)
    hits = (
        cands.join(F.broadcast(truth), ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id", "trunc_dim")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    # a prefix whose top-k misses the truth ENTIRELY would drop out of
    # the hits aggregate: rebuild the (query, dim) grid from the
    # candidate side so recall 0.0 rows survive
    grid = cands.select("query_id", "trunc_dim").distinct()
    return (
        grid.join(hits, ["query_id", "trunc_dim"], "left")
        .select(
            F.lit("weighted" if weighted else "raw").alias("cohort"),
            "query_id",
            "trunc_dim",
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
            F.round(
                F.coalesce("hits", F.lit(0)) / F.lit(float(top_k)), 6
            ).alias("recall"),
        )
    )


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
    raw = _cohort_recall(e, dims, top_k, n_queries, weighted=False)
    wtd = _cohort_recall(e, dims, top_k, n_queries, weighted=True)
    return raw.unionByName(wtd).orderBy(
        "cohort", F.desc("trunc_dim"), F.asc("query_id")
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
