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
