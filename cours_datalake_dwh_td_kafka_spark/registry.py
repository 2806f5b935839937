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

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

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


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


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
        dedup,
        joins,
        joins_advanced,
        knn,
        multimodal,
        profiling,
        relational,
        scale,
        session_queries,
        similarity,
        text_analysis,
        window_time,
        windows,
    )

    _LOADED = True
