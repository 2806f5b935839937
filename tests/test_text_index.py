"""Build/serve split for text retrieval (r11): the persisted posting
lists must serve BM25 and phrase queries equal to the in-query
operators, prune term reads by file after clustering, and take
O(increment) appends."""

from __future__ import annotations

from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators import text_index as ti
from cours_datalake_dwh_td_kafka_spark.operators.text_analysis import (
    bm25_search,
    phrase_search,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def _multiset_eq(a, b) -> bool:
    return a.count() == b.count() and a.exceptAll(b).count() == 0


def test_served_bm25_and_phrase_equal_direct(spark, tmp_path):
    d = _docs(spark)
    idx = str(tmp_path / "ti")
    ti.build_text_index(spark, d, idx)
    assert _multiset_eq(ti.bm25_query_index(spark, idx), bm25_search(d))
    assert _multiset_eq(
        ti.phrase_query_index(spark, idx), phrase_search(d)
    )
    # a term with no postings serves an empty result, not an error
    assert (
        ti.bm25_query_index(spark, idx, terms=("zzznotaterm",)).count()
        == 0
    )


def test_append_maintains_served_union(spark, tmp_path):
    """The O(increment) append must make the served set equal the
    direct operators over the UNION — including phrase matches whose
    occurrences live in the appended slice."""
    d = _docs(spark)
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = int(lo) + (int(hi) - int(lo)) // 2
    idx = str(tmp_path / "ti")
    ti.build_text_index(spark, d.where(F.col("doc_id") < cut), idx)
    ti.append_text_index(spark, d.where(F.col("doc_id") >= cut), idx)
    assert _multiset_eq(ti.bm25_query_index(spark, idx), bm25_search(d))
    assert _multiset_eq(
        ti.phrase_query_index(spark, idx), phrase_search(d)
    )


def test_clustered_postings_prune_term_reads(spark, tmp_path):
    """After the build's lake_cluster_by(term), a single term's pruned
    read must open strictly fewer files than the table holds — the
    manifest IS the term dictionary."""
    from cours_datalake_dwh_td_kafka_spark.lake import pruned_files

    d = _docs(spark)
    idx = str(tmp_path / "ti")
    ti.build_text_index(spark, d, idx, n_files=8)
    path = ti._postings_path(idx)
    kept, total = pruned_files(path, "term", "scan", "scan")
    assert total == 8
    assert 1 <= len(kept) < total, (len(kept), total)


def test_recluster_after_append_restores_pruning(spark, tmp_path):
    """Appended postings carry no cluster stats (conservatively
    scanned); re-running lake_cluster_by on the postings table is the
    reindex rung — pruning returns to O(matching files) and served
    results are unchanged."""
    from pyspark.sql import functions as F

    from cours_datalake_dwh_td_kafka_spark.lake import (
        lake_cluster_by,
        pruned_files,
    )

    d = _docs(spark)
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = int(lo) + (int(hi) - int(lo)) // 2
    idx = str(tmp_path / "ti")
    ti.build_text_index(spark, d.where(F.col("doc_id") < cut), idx, n_files=4)
    ti.append_text_index(spark, d.where(F.col("doc_id") >= cut), idx)
    path = ti._postings_path(idx)
    kept_before, total_before = pruned_files(path, "term", "scan", "scan")
    before = ti.bm25_query_index(spark, idx).localCheckpoint()
    lake_cluster_by(spark, path, "term", n_files=4)
    kept_after, total_after = pruned_files(path, "term", "scan", "scan")
    # the appended (stats-less) files were conservatively kept before;
    # after the re-cluster the whole table prunes again
    assert total_after == 4 and 1 <= len(kept_after) < total_after
    assert len(kept_after) / total_after < len(kept_before) / total_before
    after = ti.bm25_query_index(spark, idx)
    assert _multiset_eq(after, before)


def test_cdc_drives_text_index_maintenance(spark, tmp_path):
    """The CDC consumer can maintain the TEXT index exactly as it
    maintains the vector index: build from v1's insert rows, append
    from v2's, with served BM25 equal to the direct operator over the
    live corpus."""
    from pyspark.sql import functions as F

    from cours_datalake_dwh_td_kafka_spark.lake import (
        lake_commit,
        lake_consume_changes,
    )

    d = _docs(spark)
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = int(lo) + (int(hi) - int(lo)) // 2
    lake = str(tmp_path / "docs")
    idx = str(tmp_path / "ti")
    log = str(tmp_path / "log")
    lake_commit(d.where(F.col("doc_id") < cut), lake)
    lake_commit(
        d.where(F.col("doc_id") >= cut), lake, mode="append"
    )

    built = []

    def apply(ch):
        ins = ch.where(F.col("_change") == "insert").drop(
            "_change", "_version"
        )
        if ins.take(1):
            if not built:
                ti.build_text_index(spark, ins, idx)
                built.append(True)
            else:
                ti.append_text_index(spark, ins, idx)
        return ch.select("doc_id", "_change", "_version")

    assert lake_consume_changes(spark, lake, log, apply_fn=apply) == [1, 2]
    assert _multiset_eq(ti.bm25_query_index(spark, idx), bm25_search(d))

def test_maxscore_equals_exhaustive_and_prunes(spark, tmp_path):
    """MaxScore (Turtle & Flood) over the persisted index: same top-k
    as the exhaustive served scorer, with the common terms proven
    NON-essential — candidate generation aggregates only the rare
    term's postings, not the stopword-shaped lists."""
    d = _docs(spark)
    idx = str(tmp_path / "ti")
    ti.build_text_index(spark, d, idx)
    pruned, meas = ti.bm25_maxscore_query(spark, idx)
    exhaustive = ti.bm25_query_index(
        spark, idx, terms=ti.MAXSCORE_TERMS, top_n=ti.MAXSCORE_TOP_N
    )
    assert _multiset_eq(pruned, exhaustive)
    # with one rare high-idf term and two near-stopwords, both common
    # terms fall below theta: exactly one essential term, and the
    # candidate posting volume collapses to the rare term's docs
    assert meas["n_query_terms"] == 3
    assert meas["n_essential_terms"] == 1
    assert (
        meas["candidate_posting_rows"]
        < meas["exhaustive_posting_rows"] / 4
    ), meas


def test_maxscore_exact_when_pruning_cannot_fire(spark, tmp_path):
    """Degenerate thetas must degrade to the exhaustive answer, never a
    wrong one: (a) top_n larger than the seed term's df leaves theta at
    -inf (all terms essential); (b) an all-common query whose bounds
    exceed any threshold prunes nothing."""
    d = _docs(spark)
    idx = str(tmp_path / "ti")
    ti.build_text_index(spark, d, idx)
    # (a) seed smaller than k
    big_k = int(
        d.count()
    )  # > df('dup'), so the seed set cannot fill the heap
    pruned, meas = ti.bm25_maxscore_query(spark, idx, top_n=big_k)
    exhaustive = ti.bm25_query_index(
        spark, idx, terms=ti.MAXSCORE_TERMS, top_n=big_k
    )
    assert _multiset_eq(pruned, exhaustive)
    assert meas["n_essential_terms"] == meas["n_query_terms"]
    # (b) all-common query: every UB comparable, theta low
    terms = ("scan", "line", "merge")
    pruned2, meas2 = ti.bm25_maxscore_query(spark, idx, terms=terms)
    exhaustive2 = ti.bm25_query_index(
        spark, idx, terms=terms, top_n=ti.MAXSCORE_TOP_N
    )
    assert _multiset_eq(pruned2, exhaustive2)


def test_maxscore_term_stats_fold_across_appends(spark, tmp_path):
    """The (df, max_tf, min_dl) sidecar folds associatively across
    append slices: a split build+append serves the same stats — and
    the same pruned top-k — as a single-shot build."""
    d = _docs(spark)
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = int(lo) + (int(hi) - int(lo)) // 2
    one = str(tmp_path / "one")
    two = str(tmp_path / "two")
    ti.build_text_index(spark, d, one)
    ti.build_text_index(spark, d.where(F.col("doc_id") < cut), two)
    ti.append_text_index(spark, d.where(F.col("doc_id") >= cut), two)
    s1 = ti._term_stats(spark, one, ti.MAXSCORE_TERMS)
    s2 = ti._term_stats(spark, two, ti.MAXSCORE_TERMS)
    assert _multiset_eq(s1, s2)
    p1, _ = ti.bm25_maxscore_query(spark, one)
    p2, _ = ti.bm25_maxscore_query(spark, two)
    assert _multiset_eq(p1, p2)


def test_maxscore_missing_term_rejected_loudly(spark, tmp_path):
    import pytest

    d = _docs(spark)
    idx = str(tmp_path / "ti")
    ti.build_text_index(spark, d, idx)
    with pytest.raises(ValueError, match="term_stats"):
        ti.bm25_maxscore_query(spark, idx, terms=("dup", "zzznope"))


def test_phrase_reads_prune_files_and_columns(spark, tmp_path):
    """Round-12 verdict #6 pin: the phrase chain's posting reads stay
    O(matching files) — the phrase terms together open at most one
    clustered file each — and column pruning reaches the parquet scan:
    the positions arrays are read, the tf column is NOT (non-query
    width never leaves the footer)."""
    import re

    from cours_datalake_dwh_td_kafka_spark.lake import pruned_files
    from cours_datalake_dwh_td_kafka_spark.operators.text_analysis import (
        PHRASE_QUERY,
    )

    d = _docs(spark)
    idx = str(tmp_path / "ti")
    ti.build_text_index(spark, d, idx, n_files=8)

    opened: set[str] = set()
    total = 0
    terms = list(dict.fromkeys(PHRASE_QUERY.split(" ")))
    for t in terms:
        fs, total = pruned_files(ti._postings_path(idx), "term", t, t)
        opened.update(fs)
    assert total == 8
    assert len(opened) <= len(terms), (sorted(opened), total)

    ph = ti.phrase_query_index(spark, idx)
    plan = ph._jdf.queryExecution().executedPlan().toString()
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas, "no parquet scan in the served phrase plan"
    assert any("positions" in s for s in schemas)
    assert all("tf:" not in s for s in schemas), schemas

    # served result still equals the direct operator on this layout
    assert _multiset_eq(ph, phrase_search(d))


def test_served_row_scan_evidence_columns(spark, tmp_path):
    """The bm25_served protocol row's new attested columns: the term
    reads pruned files (boolean) and the phrase chain's posting-row
    count equals a from-raw-text recompute."""
    from cours_datalake_dwh_td_kafka_spark.operators.dedup import norm_text
    from cours_datalake_dwh_td_kafka_spark.operators.text_analysis import (
        PHRASE_QUERY,
    )

    d = _docs(spark)
    out = ti.text_index_protocol(spark, d, str(tmp_path)).collect()
    assert out and all(r.served_files_pruned for r in out)
    terms = list(dict.fromkeys(PHRASE_QUERY.split(" ")))
    want = (
        d.select(
            "doc_id",
            F.explode(F.split(norm_text(F.col("text")), " ")).alias("s"),
        )
        .where(F.col("s").isin(terms))
        .select("doc_id", "s")
        .distinct()
        .count()
    )
    assert all(r.phrase_posting_rows == want for r in out), (
        out[0].phrase_posting_rows,
        want,
    )


def test_erase_from_text_index_matches_rebuild(spark, tmp_path):
    """Right-to-be-forgotten maintenance (r13): after erasing a doc
    wave — including a doc that is the SOLE holder of a term, so that
    term vanishes entirely — postings, doclens, the aggregated
    (df, max_tf, min_dl) sidecar, and the served BM25 all equal a
    from-scratch build over the remaining corpus."""
    from cours_datalake_dwh_td_kafka_spark.lake import lake_read

    rows = [
        (1, "join scan merge join", "en", "s0", 20),
        (2, "join scan unicorn", "en", "s0", 17),     # sole 'unicorn' doc
        (3, "merge scan scan join", "en", "s0", 20),
        (4, "join merge merge", "en", "s0", 15),
        (5, "scan join merge scan", "en", "s0", 20),
    ]
    d = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    )
    erased = d.where(F.col("doc_id").isin([2, 4]))
    remaining = d.where(~F.col("doc_id").isin([2, 4]))

    idx = str(tmp_path / "idx")
    ti.build_text_index(spark, d, idx, n_files=2)
    n_terms = ti.erase_from_text_index(
        spark, erased.select("doc_id", "text"), idx
    )
    assert n_terms == 4  # join scan unicorn merge

    rebuilt = str(tmp_path / "rebuilt")
    ti.build_text_index(spark, remaining, rebuilt, n_files=2)

    for sub in (ti._postings_path, ti._doclens_path):
        got = lake_read(spark, sub(idx))
        want = lake_read(spark, sub(rebuilt))
        assert _multiset_eq(got, want), sub(idx)

    def agg_stats(path):
        return (
            lake_read(spark, ti._tstats_path(path))
            .groupBy("term")
            .agg(
                F.sum("df").cast("long").alias("df"),
                F.max("max_tf").alias("max_tf"),
                F.min("dl" if False else "min_dl").alias("min_dl"),
            )
        )

    assert _multiset_eq(agg_stats(idx), agg_stats(rebuilt))
    # the vanished term left no sidecar row behind
    assert (
        lake_read(spark, ti._tstats_path(idx))
        .where("term = 'unicorn'")
        .count()
        == 0
    )
    assert _multiset_eq(
        ti.bm25_query_index(spark, idx), bm25_search(remaining)
    )
    pruned, _ = ti.bm25_maxscore_query(
        spark, idx, terms=("join", "scan", "merge"), top_n=3
    )
    assert _multiset_eq(
        pruned,
        ti.bm25_query_index(
            spark, idx, terms=("join", "scan", "merge"), top_n=3
        ),
    )


def test_erase_entire_affected_term_set(spark, tmp_path):
    """Erasing every doc (wave == corpus) leaves empty-serving artifacts
    without crashing the sidecar recompute (the isEmpty guard)."""
    from cours_datalake_dwh_td_kafka_spark.lake import lake_read

    d = spark.createDataFrame(
        [(1, "alpha beta", "en", "s0", 10), (2, "beta gamma", "en", "s0", 10)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    )
    idx = str(tmp_path / "idx")
    ti.build_text_index(spark, d, idx, n_files=2)
    ti.erase_from_text_index(spark, d.select("doc_id", "text"), idx)
    assert lake_read(spark, ti._postings_path(idx)).count() == 0
    assert lake_read(spark, ti._doclens_path(idx)).count() == 0
    assert lake_read(spark, ti._tstats_path(idx)).count() == 0
