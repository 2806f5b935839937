"""Chunked-gram parity: the streamed, sub-blocked similarity kernels must
produce byte-identical results when a label spans many Arrow batches and
many gram chunks (VERDICT r2 item 5 — the round-2 kernels buffered whole
partitions and computed O(n^2) grams; these tests pin the reworked
kernels to the unchunked answer)."""

from __future__ import annotations

import pytest

from cours_datalake_dwh_td_kafka_spark.operators import gram
from cours_datalake_dwh_td_kafka_spark.operators.dedup import (
    embedding_cosine_pairs_blocked,
)
from cours_datalake_dwh_td_kafka_spark.operators.similarity import (
    q_cluster_similarity_stats,
)
from cours_datalake_dwh_td_kafka_spark.io import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def small_batches(spark):
    """Force every label to span several Arrow batches AND several gram
    chunks: 16-row Arrow batches, 7-row chunks."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    old_chunk = gram.GRAM_CHUNK
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    gram.GRAM_CHUNK = 7
    yield
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    gram.GRAM_CHUNK = old_chunk


def test_cluster_similarity_stats_chunk_invariant(spark, small_batches):
    chunked = _rows(q_cluster_similarity_stats(spark, SF))
    gram.GRAM_CHUNK = 1 << 30
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    whole = _rows(q_cluster_similarity_stats(spark, SF))
    assert chunked == whole
    assert len(chunked) > 0


def test_embedding_cosine_pairs_chunk_invariant(spark, small_batches):
    e = load_table(spark, SF, "embeddings")
    # threshold -1: every within-label pair is emitted, so the test also
    # covers pair extraction across chunk boundaries (the default 0.45
    # threshold yields zero pairs at sf0.001)
    chunked = _rows(embedding_cosine_pairs_blocked(e, threshold=-1.0))
    gram.GRAM_CHUNK = 1 << 30
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    whole = _rows(embedding_cosine_pairs_blocked(e, threshold=-1.0))
    assert chunked == whole
    assert len(chunked) > 0


def test_semantic_dedup_chunk_invariant(spark, small_batches):
    """The cell-keyed semantic-dedup pair stage (round-4 rework) rides
    the same chunked-gram kernel: a hot cell's live memory is bounded by
    the chunk, so forcing tiny Arrow batches and 7-row chunks must not
    change a single keep decision."""
    from cours_datalake_dwh_td_kafka_spark.operators.dedup import semantic_dedup

    e = load_table(spark, SF, "embeddings")
    # bits=2 -> 4 fat cells (stress the hot-cell path); threshold 0 so
    # roughly half of all within-cell pairs trip the drop rule
    chunked = _rows(semantic_dedup(e, bits=2, threshold=0.0))
    gram.GRAM_CHUNK = 1 << 30
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    whole = _rows(semantic_dedup(e, bits=2, threshold=0.0))
    assert chunked == whole
    assert len(chunked) > 0
    assert any(not keep for _, _, keep in chunked)


def test_label_larger_than_one_batch_exercised(spark, small_batches):
    """Guard the fixture premise: at least one label holds more rows than
    the Arrow batch size, so the streamed buffers really merge
    cross-batch rows (and more rows than one gram chunk)."""
    from pyspark.sql import functions as F

    e = load_table(spark, SF, "embeddings")
    biggest = (
        e.groupBy("label").count().agg(F.max("count")).first()[0]
    )
    assert biggest > 16 > 7


def test_iter_sim_chunks_covers_each_pair_once():
    import numpy as np

    rng = np.random.default_rng(7)
    x = rng.normal(size=(23, 5))
    seen = set()
    for s, sims, mask in gram.iter_sim_chunks(x, chunk=4):
        ka, ib = np.nonzero(mask)
        for k, j in zip(ka, ib):
            pair = (s + int(k), int(j))
            assert pair[0] < pair[1]
            assert pair not in seen
            seen.add(pair)
    assert len(seen) == 23 * 22 // 2
