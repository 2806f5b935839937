"""Physical-plan inspection: the facts that decide whether a plan
survives a 100x scale-up, extracted programmatically so tests can pin
them (SURVEY.md §4 — Catalyst does the optimizing; our job is to verify
the declarative plan actually triggers pushdown / broadcast / codegen
and stays free of accidental cartesian products).

Used by tests/test_plans.py to lock plan shapes against regressions —
an operator edit that silently turns a broadcast join into a shuffle
join, or drops a parquet filter pushdown, fails CI here long before a
cluster bill would notice it.
"""

from __future__ import annotations

import re
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, executed: bool = False) -> str:
    """Physical plan as text. ``executed=True`` runs the query first so
    the ADAPTIVE (final) plan is returned — that's where AQE's runtime
    decisions (coalesced partitions, reused exchanges, codegen spans,
    dynamically-switched broadcast joins) become visible."""
    if executed:
        # collect() (not count()) — count() builds a DIFFERENT query
        # execution; only executing THIS plan flips AQE to its final form
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text — scans with PushedFilters/ReadSchema."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanFacts:
    """Scale-relevant facts about one query plan."""

    n_shuffles: int = 0
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_nested_loop_joins: int = 0
    n_cartesian: int = 0
    python_evals: int = 0  # row-at-a-time Python UDF operators (slow path)
    arrow_evals: int = 0  # pandas-UDF / mapInPandas operators
    codegen_spans: int = 0
    n_reused_exchanges: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)


def plan_facts(df: DataFrame, executed: bool = False) -> PlanFacts:
    plan = physical_plan(df, executed=executed)
    fmt = formatted_plan(df)
    facts = PlanFacts(
        n_shuffles=len(re.findall(r"Exchange (?:hash|range)partitioning", plan)),
        n_broadcast_joins=plan.count("BroadcastHashJoin"),
        n_sortmerge_joins=plan.count("SortMergeJoin"),
        n_nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        n_cartesian=plan.count("CartesianProduct"),
        python_evals=plan.count("BatchEvalPython"),
        arrow_evals=plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        codegen_spans=len(set(re.findall(r"\*\((\d+)\)", plan))),
        n_reused_exchanges=plan.count("ReusedExchange"),
        pushed_filters=[
            m.strip()
            for m in re.findall(r"PushedFilters: \[([^\]]*)\]", fmt)
            if m.strip()
        ],
        read_schemas=re.findall(r"ReadSchema: (\S+)", fmt),
    )
    return facts


@contextmanager
def count_local_checkpoints():
    """Count ``DataFrame.localCheckpoint`` calls made while a query is
    BUILT — the round-count plan fact for iterative operators
    (pagerank / dedup_clusters / BPE), which the final physical plan
    cannot show: by design each round's checkpoint truncates lineage,
    so only the last round survives into the plan text. Pinning the
    call count in tests means an edit cannot silently double the
    per-query iteration cost the same way it cannot silently add a
    CartesianProduct.

    Yields a mutable ``{"n": int}`` counter; restores the original
    method on exit. Patches the CONCRETE DataFrame class (PySpark >= 4
    splits the public ``pyspark.sql.DataFrame`` ABC from
    ``pyspark.sql.classic.dataframe.DataFrame``, and instances resolve
    methods on the latter)."""
    try:  # PySpark >= 4
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:  # pragma: no cover - PySpark 3.x
        _DF = DataFrame
    counter = {"n": 0}
    orig = _DF.localCheckpoint

    def patched(self, *args, **kwargs):
        # pass-through signature: PySpark 4 adds storageLevel and may
        # add more — the counter must never reject a valid call
        counter["n"] += 1
        return orig(self, *args, **kwargs)

    _DF.localCheckpoint = patched
    try:
        yield counter
    finally:
        _DF.localCheckpoint = orig


def assert_no_cartesian(df: DataFrame) -> None:
    f = plan_facts(df)
    assert f.n_cartesian == 0, f"unexpected CartesianProduct:\n{physical_plan(df)}"


def assert_no_python_row_udf(df: DataFrame) -> None:
    """The engine policy (SURVEY.md §4): no row-at-a-time Python UDFs in
    any hot path — pandas/Arrow evals only where built-ins can't express
    the op."""
    f = plan_facts(df)
    assert f.python_evals == 0, f"row-wise Python UDF in plan:\n{physical_plan(df)}"
