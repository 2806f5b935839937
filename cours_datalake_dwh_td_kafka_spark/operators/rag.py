"""Retrieval/training-set preparation over the document corpus
(BASELINE.json north star; no course analog — the reference stops at
whole-document processing): overlapping-window chunking (the step before
embedding for retrieval-augmented generation) and deterministic weighted
sampling (the data-mixing step when sources must be drawn proportionally
to a weight, reproducibly, with no RNG).

Both are pure built-in column algebra — array lambdas and hash math,
zero Python UDFs — so they ride WholeStageCodegen and scale linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.dedup import (
    HASH32_SQL,
    _HASH32_SPARK,
    NORM_SQL,
    norm_text,
)
from cours_datalake_dwh_td_kafka_spark.registry import register

# ---------------------------------------------------------------------------
# Overlapping-window chunking for retrieval.
# ---------------------------------------------------------------------------
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48

_DOC_CHUNKS_SQL = f"""
    WITH toks AS (
        SELECT doc_id, string_split({NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    ),
    starts AS (
        SELECT doc_id, t,
               unnest(generate_series(
                   1, greatest(len(t) - {CHUNK_TOKENS} + 1, 1),
                   {CHUNK_STRIDE})) AS start
        FROM toks
    )
    SELECT doc_id,
           CAST((start - 1) / {CHUNK_STRIDE} AS INT) AS chunk_id,
           CAST(len(t[start : start + {CHUNK_TOKENS} - 1]) AS INT)
             AS n_chunk_tokens,
           array_to_string(t[start : start + {CHUNK_TOKENS} - 1], ' ')
             AS chunk_text
    FROM starts
    ORDER BY doc_id, chunk_id
"""


def doc_chunks(
    d: DataFrame, chunk: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Split each document into overlapping word windows (chunk tokens,
    advancing by stride) — the canonical RAG pre-embedding step. The
    final window is shorter when the text doesn't divide evenly; a doc
    shorter than one chunk yields exactly one (short) chunk.

    Scale shape: tokenization + window starts + slices are all array
    lambdas on the already-loaded text column — per-row work linear in
    doc length, no shuffle at all until the output ORDER BY (which
    exists only for the deterministic oracle compare; a production
    chunker would write partitioned by doc hash, unordered). The
    explode multiplies rows by ~len/stride, but each output row
    carries only its own slice, not the parent array: project chunk
    columns BEFORE any downstream join so the token arrays never cross
    an exchange. chunk_id derives arithmetically from the window start
    ((start-1)/stride), not from a positional explode, so both engines
    compute it without an ordinal-carrying unnest."""
    toks = F.split(norm_text(F.col("text")), " ")
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("t") - chunk + 1, F.lit(1)),
        F.lit(stride),
    )
    piece = F.slice(F.col("t"), F.col("start"), chunk)
    return (
        d.select("doc_id", toks.alias("t"))
        .select("doc_id", "t", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            F.floor((F.col("start") - 1) / stride).cast("int").alias(
                "chunk_id"
            ),
            F.size(piece).alias("n_chunk_tokens"),
            F.array_join(piece, " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_id")
    )


@register("doc_chunks", _DOC_CHUNKS_SQL)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_chunks(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (Efraimidis–Spirakis A-ES keys).
# ---------------------------------------------------------------------------
WEIGHTED_SAMPLE_K = 100

_WEIGHTED_SAMPLE_SQL = f"""
    SELECT doc_id, n_chars,
           ROUND(ln(u) / n_chars, 9) AS sample_key
    FROM (
        SELECT doc_id, n_chars,
               ({HASH32_SQL.format(c="CAST(doc_id AS VARCHAR)")} + 1)
                 / 4294967296.0 AS u
        FROM documents
        WHERE n_chars > 0
    )
    ORDER BY sample_key DESC, doc_id
    LIMIT {WEIGHTED_SAMPLE_K}
"""


def weighted_sample(
    d: DataFrame,
    weight_col: str = "n_chars",
    k: int = WEIGHTED_SAMPLE_K,
) -> DataFrame:
    """Weighted sample WITHOUT replacement of k docs, weight-proportional
    (longer docs more likely), via Efraimidis–Spirakis A-ES: each row
    gets key = u^(1/w) for u ~ Uniform(0,1]; the k largest keys are an
    exact weighted sample. We rank by the monotone-equivalent ln(u)/w
    (avoids pow underflow at large weights) and derive u from the
    row's CONTENT hash, not an RNG — so membership is reproducible
    across engines, runs, partitionings and corpus versions, the same
    property the repo's hash_sample provides for the unweighted case
    (a row keeps its key as the corpus grows; only the top-k cutoff
    moves).

    Scale shape: the key is a per-row projection pushed onto the scan;
    top-k plans as TakeOrderedAndProject (per-partition heaps, one
    k-row reduce) — no global sort, no shuffle of the corpus."""
    u = (_HASH32_SPARK(F.col("doc_id").cast("string")) + 1) / F.lit(
        4294967296.0
    )
    key = F.round(F.log(u) / F.col(weight_col), 9)
    return (
        # zero-weight rows are excluded, not divided (ANSI-safe, and a
        # zero-weight item has zero selection probability anyway)
        d.where(F.col(weight_col) > 0)
        .select("doc_id", weight_col, key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), "doc_id")
        .limit(k)
    )


@register("weighted_sample", _WEIGHTED_SAMPLE_SQL)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_sample(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal rank fusion of lexical (BM25) and
# semantic (embedding cosine) rankings — the standard RAG first stage
# ---------------------------------------------------------------------------
RRF_K = 60          # the canonical RRF smoothing constant
RRF_QUERY_VEC = 0   # vec_id of the query embedding
RRF_TOP_N = 20


def _rrf_sql() -> str:
    """Oracle assembled from the BM25 oracle's own CTE chain (same
    constants, same rounding) plus a cosine ranking and the two-term
    RRF sum — the fusion arithmetic is the identical expression on both
    engines, so the doubles match bit-for-bit."""
    from cours_datalake_dwh_td_kafka_spark.operators.text_analysis import (
        _BM25_CTES,
        BM25_TOP_N,
    )

    return f"""
    WITH {_BM25_CTES},
    lex AS (SELECT doc_id, rn FROM ranked WHERE rn <= {BM25_TOP_N}),
    qv AS (
      SELECT embedding::DOUBLE[] AS q FROM embeddings
      WHERE vec_id = {RRF_QUERY_VEC}
    ),
    sem_scored AS (
      SELECT e.vec_id AS doc_id,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q), 6)
               AS cosine
      FROM embeddings e, qv WHERE e.vec_id <> {RRF_QUERY_VEC}
    ),
    sem AS (
      SELECT doc_id, rn FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS rn
        FROM sem_scored
      ) WHERE rn <= {RRF_TOP_N}
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
             ROUND(COALESCE(1.0 / ({RRF_K} + l.rn), 0)
                   + COALESCE(1.0 / ({RRF_K} + s.rn), 0), 6) AS rrf,
             l.rn IS NOT NULL AS in_lexical,
             s.rn IS NOT NULL AS in_semantic
      FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
    ),
    top AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rn
      FROM fused
    )
    SELECT doc_id, rrf, in_lexical, in_semantic, CAST(rn AS BIGINT) AS rn
    FROM top WHERE rn <= {RRF_TOP_N}
    ORDER BY rn
    """


def hybrid_search_rrf(
    d: DataFrame,
    e: DataFrame,
    k: int = RRF_K,
    top_n: int = RRF_TOP_N,
) -> DataFrame:
    """Reciprocal rank fusion (Cormack et al.) of the two first-stage
    retrievers every RAG stack runs side by side: BM25 over the text
    (lexical recall — exact keywords) and cosine over the embedding
    column (semantic recall — paraphrases BM25 misses). Each candidate's
    fused score is sum(1 / (k + rank_i)) over the lists that retrieved
    it — rank-based, so the two scorers' incomparable score scales never
    need calibrating, which is exactly why RRF is the default fusion.
    Coverage: docs whose vec_id exists in the embeddings table can be
    retrieved semantically (the vector index rarely spans the whole
    corpus); lexical retrieval spans everything.

    Scale shape: the BM25 side is the existing limit-first plan (posting
    lists only off the scan, TakeOrderedAndProject top-n); the semantic
    side is one broadcast-query scan with JVM array-lambda cosines and
    the same limit-first top-n; fusion joins two top-n lists (constant
    rows) and the final rank window runs over <= 2*top_n rows."""
    from pyspark.sql import Window

    from cours_datalake_dwh_td_kafka_spark.operators.dedup import (
        vec_dot,
        vec_norm,
    )
    from cours_datalake_dwh_td_kafka_spark.operators.text_analysis import (
        bm25_search,
    )

    lex = bm25_search(d).select("doc_id", F.col("rn").alias("rn_lex"))
    emb = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    qv = (
        emb.where(F.col("vec_id") == RRF_QUERY_VEC)
        .select(F.col("emb").alias("q_emb"))
        .withColumn("q_nrm", vec_norm(F.col("q_emb")))
    )
    cs = vec_dot(F.col("q_emb"), F.col("emb")) / (
        F.col("q_nrm") * vec_norm(F.col("emb"))
    )
    sem_scored = (
        emb.where(F.col("vec_id") != RRF_QUERY_VEC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"), F.round(cs, 6).alias("cosine")
        )
    )
    sem_top = sem_scored.orderBy(F.desc("cosine"), F.asc("doc_id")).limit(
        top_n
    )
    w_sem = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    sem = sem_top.select(
        "doc_id", F.row_number().over(w_sem).alias("rn_sem")
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(1.0 / (k + F.col("rn_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (k + F.col("rn_sem")), F.lit(0.0)),
            6,
        ).alias("rrf"),
        F.col("rn_lex").isNotNull().alias("in_lexical"),
        F.col("rn_sem").isNotNull().alias("in_semantic"),
    )
    top = fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(top_n)
    w = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "rrf",
        "in_lexical",
        "in_semantic",
        F.row_number().over(w).cast("long").alias("rn"),
    ).orderBy("rn")


@register("hybrid_search_rrf", _rrf_sql())
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hybrid_search_rrf(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
    )
