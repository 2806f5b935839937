"""Build/serve split for text retrieval (round-11 verdict #2) — the
posting lists are the ARTIFACT, exactly as vectors are for ANN.

``bm25_search`` and ``phrase_search`` recompute the inverted /
positional index per query; correct, but at 100 TB the tokenize +
explode pass dominates every query. This module persists the index as
two versioned-lake tables under one root:

- ``postings``:  (term, doc_id, tf, positions array<int>) — one row per
  (term, doc) pair; positions ride along as a compact array so ONE
  artifact serves both the bag-of-words scorer (tf = size) and the
  adjacency operator (explode positions for the phrase chain).
  Clustered by ``term`` after the build (lake_cluster_by), so a query
  term's postings resolve to O(matching files) via manifest min/max
  pruning — the read-side shape of a Lucene term dictionary, expressed
  at the manifest layer.
- ``doclens``:   (doc_id, dl) — the per-document length sidecar; corpus
  stats (n_docs, avg_dl) are ONE aggregate over it, never a text scan.

Maintenance is the band-table protocol (``corpus_refresh``): build once
with the initial commit, O(increment) appends per MERGE (appended files
carry no cluster stats and are conservatively scanned until the advisor
re-clusters — the same carry-forward rule every lake index follows).

Serving (`bm25_query_index`, `phrase_query_index`) recomputes NOTHING
from text: tf/df/dl all come from the artifact, and the scoring
expression is shared with the in-query operators, so served == direct
bit-for-bit (the ``bm25_served`` row attests both parities).

Reference scope note: the reference has no retrieval surface; this is
beyond-reference infrastructure following public Lucene/Iceberg shapes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.lake import (
    lake_cluster_by,
    lake_commit,
    lake_read,
    lake_read_pruned,
)
from cours_datalake_dwh_td_kafka_spark.operators.dedup import (
    INCREMENT_SPLIT,
    norm_text,
)
from cours_datalake_dwh_td_kafka_spark.operators.text_analysis import (
    _BM25_CTES,
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    BM25_TOP_N,
    PHRASE_QUERY,
    bm25_search,
    phrase_search,
)
from cours_datalake_dwh_td_kafka_spark.registry import register


def postings_rows(d: DataFrame) -> DataFrame:
    """(term, doc_id, tf, positions) rows straight from raw documents —
    THE persistable retrieval artifact. Positions are 1-based (the
    phrase_search convention); tf is materialized (not recomputed as
    size(positions) at query time) so the BM25 read never touches the
    array column at all — column pruning drops it at the parquet scan."""
    toks = F.split(norm_text(F.col("text")), " ")
    return (
        d.select("doc_id", F.posexplode(toks).alias("p0", "term"))
        .groupBy("term", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.sort_array(F.collect_list(F.col("p0") + 1)).alias(
                "positions"
            ),
        )
    )


def doclen_rows(d: DataFrame) -> DataFrame:
    """(doc_id, dl) — token count per document, the BM25 length sidecar."""
    return d.select(
        "doc_id", F.size(F.split(norm_text(F.col("text")), " ")).alias("dl")
    )


def _postings_path(path: str) -> str:
    return os.path.join(path, "postings")


def _doclens_path(path: str) -> str:
    return os.path.join(path, "doclens")


def build_text_index(
    spark: SparkSession, d: DataFrame, path: str, n_files: int = 8
) -> None:
    """Tokenize ``d`` ONCE and commit the postings + doclens tables,
    then cluster the postings by term so a query term's read opens
    O(matching files). The one-time build is the only full-corpus text
    pass the retrieval surface ever makes."""
    lake_commit(postings_rows(d), _postings_path(path))
    lake_commit(doclen_rows(d), _doclens_path(path))
    lake_cluster_by(spark, _postings_path(path), "term", n_files=n_files)


def append_text_index(spark: SparkSession, d: DataFrame, path: str) -> None:
    """O(increment) maintenance per MERGE: append the new docs' posting
    and length rows. Appended files carry no cluster stats — pruned
    term reads conservatively scan them until a re-cluster (the
    advisor's reindex rung), which is correctness-free debt: over-scan
    only, never a miss."""
    lake_commit(postings_rows(d), _postings_path(path), mode="append")
    lake_commit(doclen_rows(d), _doclens_path(path), mode="append")


def _term_postings(
    spark: SparkSession, path: str, terms: tuple[str, ...]
) -> DataFrame:
    """Union of per-term PRUNED posting reads — each term opens only the
    files whose recorded [min, max] term range covers it (plus
    stats-less appended files). len(terms) bounded manifest reads; the
    corpus outside the probed terms is never opened on a clustered
    index. Duplicate query terms read once (isin semantics — a
    repeated term must not double its tf rows)."""
    out = None
    for t in dict.fromkeys(terms):
        one = lake_read_pruned(spark, _postings_path(path), "term", t, t)
        out = one if out is None else out.unionByName(one)
    return out


def bm25_query_index(
    spark: SparkSession,
    path: str,
    terms: tuple[str, ...] = BM25_TERMS,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_n: int = BM25_TOP_N,
) -> DataFrame:
    """Okapi BM25 served FROM the persisted index — same schema, same
    round-6 decimal-summed scores, same tie rule as
    :func:`text_analysis.bm25_search`, with zero text reads: tf/df come
    from the pruned posting lists, dl from the doclens sidecar, corpus
    stats from one aggregate over it. The scoring expression is kept
    textually in step with bm25_search so the two can never drift
    (bm25_served attests equality every attestation round)."""
    lens = lake_read(spark, _doclens_path(path)).localCheckpoint(
        eager=False
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.col("dl").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_dl"),
    )
    tf = (
        _term_postings(spark, path, terms)
        .select("term", "doc_id", "tf")
        .localCheckpoint(eager=False)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    term_score = (
        idf
        * F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avg_dl")))
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(term_score.cast("decimal(28,6)")).cast("double"), 6
            ).alias("bm25")
        )
    )
    top = scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(top_n)
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "bm25",
        F.row_number().over(w).cast("long").alias("rn"),
    ).orderBy("rn")


def phrase_query_index(
    spark: SparkSession, path: str, phrase: str = PHRASE_QUERY
) -> DataFrame:
    """Exact phrase matching served FROM the persisted positional
    postings — same adjacency chain and output schema as
    :func:`text_analysis.phrase_search`, with each join leg a pruned
    one-term posting read (positions exploded from the stored array)
    instead of a corpus tokenize."""
    terms = phrase.split(" ")
    posted = _term_postings(spark, path, tuple(set(terms)))

    def leg(term: str) -> DataFrame:
        return (
            posted.where(F.col("term") == term)
            .select("doc_id", F.explode("positions").alias("pos"))
        )

    cur = leg(terms[0])
    for i, term in enumerate(terms[1:], start=1):
        nxt = leg(term).select(
            F.col("doc_id").alias("d2"), F.col("pos").alias("p2")
        )
        cur = cur.join(
            nxt,
            (F.col("doc_id") == F.col("d2"))
            & (F.col("p2") == F.col("pos") + i),
        ).select("doc_id", "pos")
    return (
        cur.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("pos").cast("bigint").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


def text_index_protocol(
    spark: SparkSession, d: DataFrame, workdir: str
) -> DataFrame:
    """The attested build/serve lifecycle: build the index on the prior
    slice (the 80% INCREMENT_SPLIT convention), APPEND the increment's
    postings per the maintenance protocol, then prove the served paths
    equal the in-query operators over the full corpus — BM25 top-n
    multiset-equal (count + one-sided exceptAll) and the phrase result
    multiset-equal. Returns the SERVED BM25 rows with the parity
    booleans riding along, so the driver's value hash pins the served
    scores themselves, not just the booleans."""
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = int(lo) + int((int(hi) - int(lo)) * INCREMENT_SPLIT)
    idx = os.path.join(workdir, "text_index")
    build_text_index(spark, d.where(F.col("doc_id") < cut), idx)
    append_text_index(spark, d.where(F.col("doc_id") >= cut), idx)

    served = bm25_query_index(spark, idx).localCheckpoint(eager=False)
    direct = bm25_search(d).localCheckpoint(eager=False)
    bm25_eq = (
        served.count() == direct.count()
        and served.exceptAll(direct).count() == 0
    )
    served_ph = phrase_query_index(spark, idx).localCheckpoint(eager=False)
    direct_ph = phrase_search(d).localCheckpoint(eager=False)
    phrase_eq = (
        served_ph.count() == direct_ph.count()
        and served_ph.exceptAll(direct_ph).count() == 0
    )
    return served.select(
        "doc_id",
        "bm25",
        "rn",
        F.lit(bool(bm25_eq)).alias("served_eq_direct"),
        F.lit(bool(phrase_eq)).alias("phrase_eq_direct"),
    ).orderBy("rn")


_BM25_SERVED_SQL = f"""
    WITH {_BM25_CTES}
    SELECT doc_id, bm25, CAST(rn AS BIGINT) AS rn,
           TRUE AS served_eq_direct, TRUE AS phrase_eq_direct
    FROM ranked WHERE rn <= {BM25_TOP_N}
    ORDER BY rn
"""


@register("bm25_served", _BM25_SERVED_SQL)
def q_bm25_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="graft_text_index_")
    try:
        return text_index_protocol(spark, d, tmp)
    finally:
        # the returned frame's lineage is cut (localCheckpoint) before
        # the parity collects, and the served rows are re-selected off
        # that checkpoint — safe to drop the scratch index
        shutil.rmtree(tmp, ignore_errors=True)
