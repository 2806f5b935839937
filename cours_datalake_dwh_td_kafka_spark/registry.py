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
    # ---- round-13 attestation window (driver caps at ~50 rows/round) ---
    # -- new in r13, never attested --------------------------------------
    "lake_occ_multiwriter",   # r13: optimistic multi-writer concurrency
    "quantile_sketch",        # r13: mergeable KLL-style quantile sketch
    "erasure_e2e",            # r13: right-to-be-forgotten across artifacts
    "corpus_drift_ks_adaptive",  # r13: equi-depth KS + sketch fidelity
    "quantile_sketch_by_group",  # r13: per-cohort sketch percentiles
    # -- code changed in r13: must re-attest on current code -------------
    "corpus_drift_ks",        # r13: NULL n_chars -> sentinel bin
    "bm25_served",            # r13: guarded served_files_pruned boolean
    "session_incremental",    # r13: lake_read_keys semi-join/guard path
    "lake_lifecycle",         # r13: lake.py shared-module changes (mark
    "lake_restore",           #      retry, pruned-keys guard, OCC ops,
    "cdc_index_maintenance",  #      _apply_deletes column-order fix)
    "lake_incremental_mv",
    "lake_merge_on_read",     # r13: _apply_deletes is its core read path
    # -- spare window capacity (VERDICT r12 #1): the 37 r6-vintage
    #    stamps — six rounds of shared-module refactors sit between
    #    their code and their last driver check; all fit beside the
    #    r13 head in one 50-row window --------------------------------
    "distinct_rows",
    "doc_fingerprint",
    "intersect_customers",
    "join_enrich_counts",
    "join_full_outer",
    "knn_join",
    "knn_join_grid",
    "label_balance_chi2",
    "language_id",
    "min_cost_supplier",
    "mode_per_group",
    "monthly_profile",
    "multimodal_jpeg_stats",
    "null_handling",
    "orderby_limit_topk",
    "pandas_sessionization",
    "part_supplier_counts",
    "pca_top_components",
    "point_in_time_join",
    "product_type_profit",
    "promotion_candidate_suppliers",
    "quality_filter_funnel",
    "rank_top3",
    "records",
    "rfm_segments",
    "rolling_frame_max",
    "row_number_first",
    "running_sum",
    "self_join_pairs",
    "session_window_agg",
    "shipping_delay_buckets",
    "sliding_window_agg",
    "source_kl_divergence",
    "token_count",
    "tumbling_window_agg",
    "union_except",
    "window_lag_delta",
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
