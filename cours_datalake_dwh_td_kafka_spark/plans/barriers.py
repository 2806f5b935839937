"""Optimizer barriers: surgical opt-outs from Catalyst rewrites that are
usually right but occasionally pathological.

The one case this engine hits: a filter over columns computed WITH A
HIGHER-ORDER FUNCTION (``F.filter``/``F.transform``/``F.aggregate``).
``PushDownPredicate`` + ``CollapseProject`` inline the projected
expressions into the predicate, so an expression tree that references
``n_tokens``/``n_stop``/``n_distinct`` re-expands ``split(norm(text))``
once per reference — and because HOFs are CodegenFallback, the whole
inlined predicate evaluates interpreted, with no common-subexpression
elimination. Measured on the curation quality gate at sf0.1: ~2.4 s
inlined vs ~0.6 s with the projection kept as its own stage (each
feature evaluated once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GUARD = "__project_once_guard"


def project_once(df: DataFrame) -> DataFrame:
    """Pin ``df``'s current projection as its own evaluation stage.

    Mechanism: append a nondeterministic guard column and keep it ALIVE
    through a tautological filter (``guard % 1 == 0``) before dropping
    it. ``PushDownPredicate`` refuses to substitute a nondeterministic
    projected expression into a predicate, so any downstream filter
    stays ABOVE the projection and references the projected COLUMNS
    instead of inlining their defining expressions.

    The round-2 version added-and-immediately-dropped the guard; with
    nothing referencing it, ``ColumnPruning`` deleted the guard, the
    projects collapsed, and the barrier was a verified no-op (ADVICE
    r2). The tautology filter is what the optimizer cannot remove — it
    cannot fold an expression over a nondeterministic column — at the
    runtime cost of one long-modulo per row, noise next to one saved
    HOF evaluation. Plan shape is pinned by
    ``tests/test_plans.py::test_project_once_blocks_hof_inlining``.

    Use after a projection whose columns are expensive to compute (HOFs,
    regexes over large strings) and are consumed more than once
    downstream. NOT needed when downstream consumes the columns only in
    aggregates/joins — only filter pushdown re-inlines.
    """
    return (
        df.withColumn(_GUARD, F.monotonically_increasing_id())
        .where(F.pmod(F.col(_GUARD), F.lit(1)) == 0)
        .drop(_GUARD)
    )
