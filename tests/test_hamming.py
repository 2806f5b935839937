"""Binary sign-quantization ANN: packing exactness and the filter's
degenerate-exact envelope."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.hamming import (
    RERANK_R,
    WORD_BITS,
    binary_hamming_topk,
    embedding_dim,
    sign_words,
)
from cours_datalake_dwh_td_kafka_spark.operators.similarity import (
    TOP_K,
    ann_topk_bruteforce,
)
from tests.conftest import SF_SMOKE


def test_sign_words_pack_matches_python(spark):
    """The packed words equal an independent python packing of the same
    sign bits — bit order, word seams and the strictly-positive
    predicate all pinned."""
    e = load_table(spark, SF_SMOKE, "embeddings").limit(16)
    dim = embedding_dim(e)
    rows = (
        e.select("vec_id", "embedding", sign_words(dim).alias("words"))
        .orderBy("vec_id")
        .collect()
    )
    assert rows, "smoke embeddings empty"
    n_words = (dim + WORD_BITS - 1) // WORD_BITS
    for r in rows:
        expect = [0] * n_words
        for j, v in enumerate(r.embedding):
            if v > 0.0:
                expect[j // WORD_BITS] |= 1 << (j % WORD_BITS)
        assert list(r.words) == expect, f"vec {r.vec_id}"
        # 32-bit packing never reaches the sign bit of the BIGINT word
        assert all(0 <= w < (1 << WORD_BITS) for w in r.words)


def test_full_rerank_recovers_exact_topk(spark):
    """With rerank_r = corpus size the Hamming filter keeps everything,
    so the reranked result must be EXACTLY the brute-force cosine
    top-k (same ids, same rounded cosines, same ranks)."""
    e = load_table(spark, SF_SMOKE, "embeddings")
    n = e.count()
    got = (
        binary_hamming_topk(e, rerank_r=n)
        .select("query_id", "neighbor_id", "cosine", "rn")
        .collect()
    )
    want = ann_topk_bruteforce(e).collect()
    as_tuples = lambda rows: [  # noqa: E731
        (r.query_id, r.neighbor_id, r.cosine, r.rn) for r in rows
    ]
    assert as_tuples(got) == as_tuples(want)


def test_hamming_bounded_by_dim(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    dim = embedding_dim(e)
    stats = binary_hamming_topk(e).agg(
        F.min("hamming").alias("lo"), F.max("hamming").alias("hi")
    ).first()
    assert 0 <= stats.lo <= stats.hi <= dim


def test_rerank_narrower_than_topk_rejected(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    with pytest.raises(ValueError, match="rerank_r"):
        binary_hamming_topk(e, top_k=TOP_K, rerank_r=TOP_K - 1)


def test_default_rerank_width_sane():
    assert RERANK_R >= TOP_K


def test_idcg_literal_tracks_top_k():
    """IDCG_AT_K is spelled as a literal so both engines share the exact
    constant; this pins it to the recomputation so a TOP_K change can't
    silently rot the nDCG denominator."""
    import math
    from decimal import Decimal

    from cours_datalake_dwh_td_kafka_spark.operators.hamming import (
        IDCG_AT_K,
    )

    want = float(
        sum(
            Decimal(f"{round(1.0 / math.log2(i + 1), 6):.6f}")
            for i in range(1, TOP_K + 1)
        )
    )
    assert IDCG_AT_K == want


def test_retrieval_eval_metric_envelope(spark):
    """Sanity envelope on the smoke corpus: metrics in [0,1], hits
    consistent with recall, and a perfect system (eval the exact truth
    against itself via rerank_r = corpus) would be redundant — instead
    pin that ndcg <= recall * IDCG-normalized max (binary nDCG can't
    exceed 1) and mrr = 0 exactly when hits = 0."""
    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.operators.hamming import (
        retrieval_eval,
    )

    rows = retrieval_eval(
        load_table(spark, SF_SMOKE, "embeddings")
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hits <= TOP_K
        assert abs(r.recall - r.hits / TOP_K) < 1e-9
        assert 0.0 <= r.mrr <= 1.0
        assert 0.0 <= r.ndcg <= 1.0
        assert (r.mrr == 0.0) == (r.hits == 0)


def test_matryoshka_weighted_cohort_front_loads_recall(spark):
    """The weighted cohort (importance decay = what matryoshka training
    does to the information profile) must recover far more of the
    full-width top-k from a 16-dim prefix than the raw synthetic
    embeddings do — the positive case the row demonstrates next to the
    honest negative (round-12 verdict #8)."""
    from cours_datalake_dwh_td_kafka_spark.io import load_table
    from cours_datalake_dwh_td_kafka_spark.operators.matryoshka import (
        MATRYOSHKA_DIMS,
        matryoshka_recall,
    )
    from tests.conftest import SF_SMOKE

    out = matryoshka_recall(load_table(spark, SF_SMOKE, "embeddings"))
    mean = {
        (r.cohort, r.trunc_dim): r.m
        for r in out.groupBy("cohort", "trunc_dim")
        .agg(F.avg("recall").alias("m"))
        .collect()
    }
    full = max(MATRYOSHKA_DIMS)
    lowest = min(MATRYOSHKA_DIMS)
    # full width is its own truth in BOTH cohorts
    assert mean[("raw", full)] == 1.0 and mean[("weighted", full)] == 1.0
    # the decay front-loads the signal: prefix recall at least doubles
    assert mean[("weighted", lowest)] >= 2 * mean[("raw", lowest)]
    # and within the weighted cohort recall is monotone in prefix width
    dims = sorted(MATRYOSHKA_DIMS)
    for lo, hi in zip(dims, dims[1:]):
        assert mean[("weighted", lo)] <= mean[("weighted", hi)] + 1e-9

def test_matryoshka_prefix_folds_bit_identical_to_slice_folds(spark):
    """The one-pass kernel derives every prefix dot/norm from
    continuation folds (`aggregate(slice(p, d0+1, d-d0), fold_at_d0)`).
    FP addition is non-associative, so this is only sound because the
    continuation performs the EXACT operation sequence of an independent
    left fold over `slice(p, 1, d)` — assert bitwise equality, no
    tolerance, on adversarially mixed-magnitude doubles."""
    from cours_datalake_dwh_td_kafka_spark.operators.matryoshka import (
        MATRYOSHKA_DIMS,
        _prefix_folds,
    )

    n = max(MATRYOSHKA_DIMS)
    rows = [
        (i, [((i * 31 + j * 17) % 1009 - 504.5) * (10.0 ** ((i + j) % 7 - 3))
             for j in range(n)])
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id long, arr array<double>")
    folds = _prefix_folds(F.col("arr"), MATRYOSHKA_DIMS)
    checks = []
    for d in MATRYOSHKA_DIMS:
        ref = F.aggregate(
            F.slice(F.col("arr"), 1, d), F.lit(0.0), lambda a, v: a + v
        )
        checks.append((folds[d] == ref).alias(f"eq{d}"))
    out = df.select(*checks).collect()
    for r in out:
        assert all(r), r
