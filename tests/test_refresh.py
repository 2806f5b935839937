"""corpus_refresh lifecycle: the composite protocol's booleans hold on
the real corpus, and — on a planted corpus — each gate demonstrably
BITES (a cross-run duplicate is dropped, a benchmark leaker is dropped,
a genuinely new doc lands)."""

from __future__ import annotations

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.refresh import (
    corpus_refresh,
)


def test_refresh_row_on_corpus(spark, tmp_path):
    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    row = corpus_refresh(spark, d, e, str(tmp_path)).collect()[0]
    assert row.no_dup_ok and row.no_near_dup_ok and row.no_leak_ok
    assert row.merge_atomic_ok and row.index_serves_union
    assert row.bands_table_ok
    assert row.n_inserted <= row.n_new_unique <= row.n_batch
    assert row.n_total_after == row.n_corpus_kept + row.n_inserted
    assert row.n_shards >= 1


def test_refresh_gates_bite(spark, tmp_path):
    """Planted corpus, ids 0..19 (cut = 15, batch = 15..19):
    - doc 16 repeats doc 3's text -> incremental dedup drops it;
    - doc 17 repeats benchmark doc 0's text -> decontamination drops it
      (doc 0 is the bench slice: 0 % 50 == 0);
    - docs 15, 18, 19 are genuinely new -> inserted.
    """
    base = [
        (
            i,
            "web" if i % 2 == 0 else "books",
            "en",
            80,
            " ".join(f"tok{i}w{j}" for j in range(12)),
        )
        for i in range(20)
    ]
    rows = []
    for doc_id, source, lang, n_chars, text in base:
        if doc_id == 16:
            text = base[3][4]  # cross-run duplicate
        if doc_id == 17:
            # benchmark 8-gram leak (doc 0 is bench: 0 % 50 == 0) but
            # NOT an exact duplicate — dedup must let it through so the
            # decontamination gate is the one that drops it
            text = base[0][4] + " fresh tail tokens"
        rows.append((doc_id, source, lang, n_chars, text))
    d = spark.createDataFrame(
        rows, "doc_id BIGINT, source STRING, lang STRING, "
        "n_chars BIGINT, text STRING"
    )
    e = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0]) for i in range(12)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    row = corpus_refresh(spark, d, e, str(tmp_path)).collect()[0]
    assert row.n_batch == 5            # ids 15..19
    assert row.n_new_unique == 4       # 16 deduped away
    assert row.n_inserted == 3         # 17 decontaminated away
    assert row.n_total_after == row.n_corpus_kept + 3
    assert row.no_dup_ok and row.no_near_dup_ok and row.no_leak_ok
    assert row.merge_atomic_ok and row.index_serves_union
    assert row.bands_table_ok
