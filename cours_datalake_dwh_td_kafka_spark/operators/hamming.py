"""Binary sign-quantized embeddings with Hamming-distance search.

The ANN family so far trades recall for FLOPs (IVF probes fewer cells,
PQ approximates the dot product). Binary quantization trades PRECISION
for memory bandwidth instead: each float32 dimension collapses to its
sign bit, so a 64-dim embedding becomes 8 BYTES (32x smaller than the
float rows), Hamming distance between two signatures is a handful of
XOR+popcount instructions, and — unlike PQ codes — the signature needs
no trained codebook, so it survives distribution drift and can be
computed at ingest with zero fitted state. This is the standard first
filter of a billion-vector retrieval stack (sign-random-projection LSH
with the identity projection; Charikar's SimHash applied to dense
vectors rather than term sets, cf. the text-side
:func:`~cours_datalake_dwh_td_kafka_spark.operators.dedup.simhash`).

Pipeline shape (mirrors `ann_topk_bruteforce`'s contract):

1. ENCODE — one projection packs each vector's sign bits into
   ``ceil(dim/32)`` BIGINT words, 32 bits per word so no engine ever
   shifts into the sign bit (DuckDB raises on signed-shift overflow;
   Spark silently wraps — keeping bit 63 empty sidesteps both). Pure
   JVM higher-order functions, whole-stage-codegen'd, no UDF.
2. FILTER — brute-force Hamming scan: corpus x broadcast(queries),
   ``bit_count(xor)`` over the word arrays, two-stage salted top-R per
   query (R = RERANK_R) so no reducer ever sorts more than
   TOPK_FANIN * R rows (the :func:`global_topk` argument, restated for
   ascending distance).
3. RERANK — the R survivors per query (bounded: n_queries x R rows,
   driver-free) join back to the float rows via broadcast and are
   re-scored with the exact rounded cosine; final rank is over <= R
   rows per query (WindowGroupLimit caps it).

At 100 TB the encode is a map over the ingest scan, the filter reads
8-byte signatures instead of 256-byte float rows (a ~32x scan-bandwidth
cut before any pruning), and the rerank touches only n_queries x R
float rows. The oracle recomputes the Hamming distance DIRECTLY from
sign comparisons (never from the packed words), so a packing bug —
wrong bit order, sign-bit overflow, off-by-one at the word seam —
surfaces as a value-hash mismatch, not a silently-shared error.

Reference context: the reference has no vector search at all; this
extends the repo's beyond-reference ANN family (SURVEY.md section 2's
LLM-pipeline additions) with the memory-bound end of the
speed/recall/size trade-off.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    TOPK_FANIN,
)
from cours_datalake_dwh_td_kafka_spark.operators.dedup import cosine_sim
from cours_datalake_dwh_td_kafka_spark.registry import register

#: sign bits packed per BIGINT word — 32, not 64, so the top half of
#: every word stays zero and neither engine's shift semantics are in play
WORD_BITS = 32

#: Hamming-filter survivors per query handed to the exact rerank
RERANK_R = 4 * TOP_K


def sign_words(dim: int, emb_col: str = "embedding") -> Column:
    """``array<bigint>`` of ``ceil(dim/WORD_BITS)`` words; bit ``j - lo``
    of word ``w`` is set iff ``emb[j] > 0`` for ``j`` in word ``w``'s
    range. Strictly-positive test (a 0.0 coordinate is a 0 bit) so the
    oracle's ``> 0`` comparison is the same predicate."""
    if dim < 1:
        raise ValueError(f"embedding dim must be >= 1, got {dim}")
    words = []
    for lo in range(0, dim, WORD_BITS):
        hi = min(lo + WORD_BITS - 1, dim - 1)
        words.append(
            F.expr(
                f"aggregate(sequence({lo}, {hi}), 0L, (acc, j) -> "
                f"acc + IF(element_at({emb_col}, CAST(j + 1 AS INT)) > 0.0D, "
                f"shiftleft(1L, CAST(j - {lo} AS INT)), 0L))"
            )
        )
    return F.array(*words)


#: Hamming distance between two packed-word arrays: XOR word-wise,
#: popcount, sum. All JVM-side higher-order functions.
_HAMMING = (
    "aggregate(zip_with(q_words, c_words, (a, b) -> bit_count(a ^ b)), "
    "0, (acc, x) -> acc + x)"
)


def embedding_dim(e: DataFrame) -> int:
    """Dimension of the embedding column — ONE bounded driver scalar
    (the same O(1) collect the IVF quantizer sample uses)."""
    row = e.select(F.size("embedding").alias("d")).first()
    if row is None:
        raise ValueError("embeddings table is empty; cannot infer dim")
    return int(row["d"])


def hamming_topk(
    e: DataFrame,
    top_k: int,
    n_queries: int = N_QUERIES,
    fanin: int = TOPK_FANIN,
) -> DataFrame:
    """The FILTER stage alone: per-query top-``top_k`` by
    (hamming asc, neighbor_id asc) over the sign signatures, via the
    salted two-stage reduce. Output: (query_id, neighbor_id, hamming,
    rn) — ``rn`` is the Hamming rank (the retrieval-eval row scores
    exactly this ranking against the exact-cosine truth)."""
    dim = embedding_dim(e)
    words = sign_words(dim)
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"), words.alias("c_words")
    )
    q_sig = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), words.alias("q_words")
    )
    scored = (
        corpus.crossJoin(F.broadcast(q_sig))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.expr(_HAMMING).alias("hamming"))
    )
    # two-stage top-R, ascending distance: the salted local pass bounds
    # every reducer at ~upstream_partitions/fanin * R rows; the final
    # per-query window ranks <= fanin * R survivors (and is rank-then-
    # filter, so WindowGroupLimit caps it)
    w_local = Window.partitionBy("query_id", "_salt").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn(
            "_salt", F.pmod(F.xxhash64("neighbor_id"), F.lit(fanin))
        )
        .withColumn("_rn", F.row_number().over(w_local))
        .where(F.col("_rn") <= top_k)
        .drop("_rn", "_salt")
        .withColumn("rn", F.row_number().over(w_final).cast("long"))
        .where(F.col("rn") <= top_k)
    )


def binary_hamming_topk(
    e: DataFrame,
    top_k: int = TOP_K,
    n_queries: int = N_QUERIES,
    rerank_r: int = RERANK_R,
    fanin: int = TOPK_FANIN,
) -> DataFrame:
    """Sign-quantize, Hamming-filter to ``rerank_r`` candidates per
    query, exact-cosine rerank to ``top_k``.

    Output: (query_id, neighbor_id, hamming, cosine, rn) ordered by
    (query_id, rn) — rn ranks the RERANKED order (cosine desc,
    neighbor_id asc); hamming is carried through so the filter's work
    is visible in the attested values.
    """
    if rerank_r < top_k:
        raise ValueError(
            f"rerank_r ({rerank_r}) must be >= top_k ({top_k}): the "
            "rerank can only return candidates the filter kept"
        )
    cand = hamming_topk(e, rerank_r, n_queries, fanin).drop("rn")
    # rerank: candidates are bounded (n_queries x rerank_r rows) —
    # broadcast them against the float scan, never the reverse
    n_emb = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("n_emb"),
    )
    q_emb = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_emb"),
    )
    reranked = (
        n_emb.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(q_emb), "query_id")
        # rank on the ROUNDED cosine (ann_topk_cosine's tiebreak
        # discipline) so sub-1e-6 float noise cannot reorder engines
        .withColumn(
            "cosine", F.round(cosine_sim(F.col("q_emb"), F.col("n_emb")), 6)
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        reranked.withColumn("rn", F.row_number().over(w_rank).cast("long"))
        .where(F.col("rn") <= top_k)
        .select("query_id", "neighbor_id", "hamming", "cosine", "rn")
        .orderBy("query_id", "rn")
    )


# The oracle recomputes hamming from raw sign comparisons (list_filter
# over dimensions), NOT from packed words: the packing is implementation
# detail under test, so the two engines must agree through independent
# encodings. dim is pinned to the testdata's 64 — the driver runs this
# at sf0.01 where every embedding is 64-dim (TESTDATA.md).
_BINARY_HAMMING_SQL = f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding FROM embeddings
      WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             CAST(len(list_filter(range(1, 65),
                  j -> (q.embedding[j] > 0) <> (e.embedding[j] > 0)))
                  AS INTEGER) AS hamming
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ),
    cand AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY hamming, neighbor_id) AS crn
      FROM scored
    ),
    rer AS (
      SELECT c.query_id, c.neighbor_id, c.hamming,
             ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[]), 6)
               AS cosine
      FROM cand c
      JOIN embeddings e ON e.vec_id = c.neighbor_id
      JOIN q ON q.query_id = c.query_id
      WHERE c.crn <= {RERANK_R}
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM rer
    )
    SELECT query_id, neighbor_id, hamming, cosine, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {TOP_K}
    ORDER BY query_id, rn
"""


@register("ann_binary_hamming", _BINARY_HAMMING_SQL)
def q_ann_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    return binary_hamming_topk(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Retrieval-quality evaluation: score the Hamming FILTER's raw ranking
# against the exact-cosine truth with the standard IR metrics. This is
# the measurement a retrieval stack needs before trusting a cheap first
# stage: recall@k says how much the rerank CAN recover, MRR/nDCG say how
# good the filter order is if you serve it unreranked.
# ---------------------------------------------------------------------------

#: ideal DCG@k for binary relevance: sum of round(1/log2(i+1), 6) for
#: i = 1..TOP_K, decimal-summed — spelled as a literal so Spark and the
#: oracle share the exact constant
IDCG_AT_K = 2.94846


def retrieval_eval(
    e: DataFrame,
    top_k: int = TOP_K,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """Per-query recall@k, MRR and binary-relevance nDCG@k of the
    Hamming-rank top-k against the exact rounded-cosine top-k.

    Determinism discipline: each matched rank's DCG term is rounded to
    6 then DECIMAL-summed (float-order-proof), MRR is one exact
    division rounded 6, recall is hits/k. Truth and system are both
    reproducible in the DuckDB oracle, so the metrics are value-hashed
    — not self-asserted."""
    system = hamming_topk(e, top_k, n_queries).select(
        "query_id", "neighbor_id", "rn"
    )
    truth = _exact_topk_ids(e, top_k, n_queries)
    matched = system.join(
        F.broadcast(truth), ["query_id", "neighbor_id"], "left"
    ).withColumn(
        "_rel", F.when(F.col("_t").isNotNull(), F.lit(1)).otherwise(F.lit(0))
    )
    dcg_term = F.when(
        F.col("_rel") == 1,
        F.round(F.lit(1.0) / F.log2(F.col("rn") + F.lit(1.0)), 6),
    ).otherwise(F.lit(0.0))
    return (
        matched.groupBy("query_id")
        .agg(
            F.sum("_rel").cast("long").alias("hits"),
            F.round(
                F.sum("_rel") / F.lit(float(top_k)), 6
            ).alias("recall"),
            F.round(
                F.coalesce(
                    F.lit(1.0)
                    / F.min(F.when(F.col("_rel") == 1, F.col("rn"))),
                    F.lit(0.0),
                ),
                6,
            ).alias("mrr"),
            F.round(
                F.sum(dcg_term.cast("decimal(18,6)")).cast("double")
                / F.lit(IDCG_AT_K),
                6,
            ).alias("ndcg"),
        )
        .orderBy("query_id")
    )


def _exact_topk_ids(e: DataFrame, top_k: int, n_queries: int) -> DataFrame:
    """(query_id, neighbor_id, _t=1) rows of the exact rounded-cosine
    top-k — the truth set, via the same two-stage reduce."""
    emb = F.col("embedding").cast("array<double>")
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
    from cours_datalake_dwh_td_kafka_spark.operators.similarity import (
        global_topk,
    )

    return global_topk(scored, top_k).select(
        "query_id", "neighbor_id", F.lit(1).alias("_t")
    )


_RETRIEVAL_EVAL_SQL = f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding FROM embeddings
      WHERE vec_id < {N_QUERIES}
    ),
    sys AS (
      SELECT query_id, neighbor_id, rn FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY len(list_filter(range(1, 65),
                           j -> (q.embedding[j] > 0) <> (e.embedding[j] > 0))),
                          e.vec_id
               ) AS rn
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
      ) WHERE rn <= {TOP_K}
    ),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY ROUND(list_cosine_similarity(
                            q.embedding::DOUBLE[],
                            e.embedding::DOUBLE[]), 6) DESC,
                          e.vec_id
               ) AS rn
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
      ) WHERE rn <= {TOP_K}
    ),
    matched AS (
      SELECT s.query_id, s.rn,
             CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS rel
      FROM sys s
      LEFT JOIN truth t ON t.query_id = s.query_id
                       AND t.neighbor_id = s.neighbor_id
    )
    SELECT query_id,
           CAST(SUM(rel) AS BIGINT) AS hits,
           ROUND(SUM(rel) / {TOP_K}.0, 6) AS recall,
           ROUND(COALESCE(1.0 / MIN(CASE WHEN rel = 1 THEN rn END), 0.0), 6)
             AS mrr,
           ROUND(CAST(SUM(CAST(CASE WHEN rel = 1
                      THEN ROUND(1.0 / log2(rn + 1.0), 6) ELSE 0.0 END
                      AS DECIMAL(18,6))) AS DOUBLE) / {IDCG_AT_K}, 6)
             AS ndcg
    FROM matched
    GROUP BY query_id
    ORDER BY query_id
"""


@register("retrieval_eval", _RETRIEVAL_EVAL_SQL)
def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retrieval_eval(load_table(spark, sf_dir, "embeddings"))
