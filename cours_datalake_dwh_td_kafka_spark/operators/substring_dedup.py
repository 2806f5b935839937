"""Cross-document duplicated-SPAN detection (ExactSubstr-style, after
Lee et al., "Deduplicating Training Data Makes Language Models Better",
ACL 2022): find runs of >= MIN_SPAN consecutive tokens shared verbatim
between two documents — the duplication mode document-level dedup
(minhash/simhash, dedup.py) misses when only a paragraph is copied.

The suffix-array construction of the paper is a single-machine
algorithm; the Spark-native equivalent used here is k-gram anchoring +
diagonal run-merging, all equi-joins and bounded windows:

1. every token position emits its k-gram (array lambdas, no UDF);
2. positions sharing a k-gram across two docs are anchor matches —
   an equi-join on the 8-byte gram hash (never the gram string);
3. consecutive anchors on the same (doc_a, doc_b, pos_a - pos_b)
   DIAGONAL form a duplicated span (classic gaps-and-islands:
   pos_a - row_number() is constant within a run); a run of m anchors
   is a span of m + k - 1 tokens.

A span shorter than MIN_SPAN is noise (k-gram chance collisions); a
gram present in more than MAX_DF documents is boilerplate whose
candidate fan-out would go quadratic — dropped before the join, same
skew cap as dedup_ngram_jaccard (dedup.py). Dropping a hot gram can
split a span that contains it; at MAX_DF=10 this trims only
boilerplate-bearing spans, and the paper's remedy (count suppressed
grams separately) applies if that ever matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.dedup import (
    NORM_SQL,
    norm_text,
)
from cours_datalake_dwh_td_kafka_spark.registry import register

SPAN_GRAM = 8
SPAN_MAX_DF = 10
MIN_SPAN_TOKENS = 16

_SPAN_RUNS_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split({NORM_SQL.format(c='text')}, ' ') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(generate_series(
               1, greatest(len(t) - {SPAN_GRAM} + 1, 1), 1)) AS pos,
             unnest(list_transform(
               generate_series(1, greatest(len(t) - {SPAN_GRAM} + 1, 1), 1),
               i -> array_to_string(t[i:i+{SPAN_GRAM - 1}], ' '))) AS gram
      FROM toks
    ),
    keep AS (
      SELECT gram FROM grams GROUP BY gram
      HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {SPAN_MAX_DF}
    ),
    m AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pos_a, a.pos - b.pos AS diag
      FROM grams a JOIN keep USING (gram) JOIN grams b USING (gram)
      WHERE a.doc_id < b.doc_id
    ),
    runs AS (
      SELECT doc_a, doc_b, diag, pos_a,
             pos_a - row_number() OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS island
      FROM m
    ),
    spans AS (
      SELECT doc_a, doc_b, COUNT(*) + {SPAN_GRAM} - 1 AS span_tokens
      FROM runs GROUP BY doc_a, doc_b, diag, island
    )
    SELECT doc_a, doc_b,
           COUNT(*) AS n_spans,
           CAST(MAX(span_tokens) AS BIGINT) AS max_span_tokens,
           CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens
    FROM spans
    WHERE span_tokens >= {MIN_SPAN_TOKENS}
    GROUP BY doc_a, doc_b
    ORDER BY doc_a, doc_b
"""


def span_runs(
    d: DataFrame,
    k: int = SPAN_GRAM,
    max_df: int = SPAN_MAX_DF,
    min_span: int = MIN_SPAN_TOKENS,
) -> DataFrame:
    """Per ordered doc pair: number of shared verbatim spans of at least
    ``min_span`` tokens, the longest one, and the total duplicated
    token mass.

    Scale shape: gram rows are linear in corpus tokens and leave the
    map side as (doc_id, pos, xxhash64) — 20 bytes, no strings cross
    any exchange (the DuckDB oracle joins the strings themselves; only
    counts/positions reach the output, so hash-vs-string join keys
    cannot diverge short of an xxhash64 collision). The MAX_DF cap
    bounds the anchor join's fan-out at df^2/2 pairs per gram; the
    islands window partitions on (doc_a, doc_b, diagonal), whose size
    is bounded by the shorter doc's length — never corpus-scale. At
    100 TB the same plan holds: one gram shuffle, one capped join, one
    bounded window; the df cap is the knob that keeps boilerplate from
    going quadratic."""
    toks = F.split(norm_text(F.col("text")), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("t") - k + 1, F.lit(1))
    )
    gram_arr = F.transform(
        starts, lambda i: F.array_join(F.slice(F.col("t"), i, k), " ")
    )
    grams = (
        d.select("doc_id", toks.alias("t"))
        .select("doc_id", F.posexplode(gram_arr).alias("p0", "gram"))
        .select(
            "doc_id",
            (F.col("p0") + 1).alias("pos"),
            F.xxhash64("gram").alias("gh"),
        )
        # the gram table feeds the df-cap aggregate AND both join sides;
        # materialize it once (20 bytes/row) instead of tokenizing the
        # corpus three times — the same scan-vs-materialize trade the
        # suffix-array construction makes, at a far smaller footprint
        .localCheckpoint(eager=False)
    )
    keep = (
        grams.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("df"))
        .where(F.col("df").between(2, max_df))
        .select("gh")
    )
    a = grams.join(keep, "gh").select(
        "gh", F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a")
    )
    b = grams.select(
        "gh", F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b")
    )
    m = (
        a.join(b, "gh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "pos_a",
            (F.col("pos_a") - F.col("pos_b")).alias("diag"),
        )
        .distinct()
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    runs = m.select(
        "doc_a",
        "doc_b",
        "diag",
        (F.col("pos_a") - F.row_number().over(w)).alias("island"),
    )
    spans = runs.groupBy("doc_a", "doc_b", "diag", "island").agg(
        (F.count(F.lit(1)) + k - 1).alias("span_tokens")
    )
    return (
        spans.where(F.col("span_tokens") >= min_span)
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.max("span_tokens").cast("bigint").alias("max_span_tokens"),
            F.sum("span_tokens").cast("bigint").alias("dup_tokens"),
        )
        .orderBy("doc_a", "doc_b")
    )


@register("dedup_span_runs", _SPAN_RUNS_SQL)
def q_dedup_span_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return span_runs(load_table(spark, sf_dir, "documents"))
