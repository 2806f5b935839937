"""The shared one-action signed-tag comparator (round 14): semantics
must match the exceptAll formulations it replaced."""

from __future__ import annotations

from cours_datalake_dwh_td_kafka_spark.operators.attest import multiset_eq


def test_multiset_eq_basic_and_duplicates(spark):
    a = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")], "k int, v string")
    b = spark.createDataFrame([(2, "y"), (1, "x"), (1, "x")], "k int, v string")
    assert multiset_eq(a, b)
    # multiplicity matters: dropping one duplicate breaks equality
    c = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    assert not multiset_eq(a, c)
    assert not multiset_eq(c, a)


def test_multiset_eq_null_and_nan_match_exceptall(spark):
    a = spark.createDataFrame(
        [(None, float("nan")), (1, 2.0)], "k int, v double"
    )
    b = spark.createDataFrame(
        [(1, 2.0), (None, float("nan"))], "k int, v double"
    )
    # exceptAll treats NULL == NULL and NaN == NaN; so must the tag form
    assert a.exceptAll(b).count() == 0
    assert multiset_eq(a, b)
    assert not multiset_eq(a, b.where("k IS NOT NULL"))


def test_multiset_eq_column_order_insensitive(spark):
    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([("x", 1)], "v string, k int")
    assert multiset_eq(a, b)


def test_multiset_eq_survives_tag_named_columns(spark):
    """r14 review: a data column named _t (or _s) must be COMPARED, not
    silently replaced by the tag."""
    a = spark.createDataFrame([(1, 10), (2, 20)], "_t int, _s int")
    b = spark.createDataFrame([(1, 10), (2, 20)], "_t int, _s int")
    assert multiset_eq(a, b)
    c = spark.createDataFrame([(1, 10), (2, 99)], "_t int, _s int")
    assert not multiset_eq(a, c)
