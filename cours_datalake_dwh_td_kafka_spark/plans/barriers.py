"""Optimizer barriers: surgical opt-outs from Catalyst rewrites that are
usually right but occasionally pathological.

The one case this engine hits: a filter over columns computed WITH A
HIGHER-ORDER FUNCTION (``F.filter``/``F.transform``/``F.aggregate``).
``PushDownPredicate`` + ``CollapseProject`` inline the projected
expressions into the predicate, so an expression tree that references
``n_tokens``/``n_stop``/``n_distinct`` re-expands ``split(norm(text))``
once per reference — and because HOFs are CodegenFallback, the whole
inlined predicate evaluates interpreted, with no common-subexpression
elimination. Measured on the curation quality gate at sf0.1: 2.9 s
inlined vs 0.5 s with the projection kept as its own stage (each feature
evaluated once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def project_once(df: DataFrame) -> DataFrame:
    """Pin ``df``'s current projection as its own evaluation stage.

    Appends (and immediately drops) a nondeterministic column:
    ``CollapseProject``/``PushDownPredicate`` refuse to move expressions
    across a nondeterministic projection, so downstream filters reference
    the projected COLUMNS instead of inlining their defining expressions.
    Zero runtime cost (the guard column is pruned), purely a plan-shape
    hint. Use after a projection whose columns are expensive to compute
    (HOFs, regexes over large strings) and are consumed more than once
    downstream.
    """
    return df.withColumn(
        "__project_once_guard", F.monotonically_increasing_id()
    ).drop("__project_once_guard")
