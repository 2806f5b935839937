"""SQL-function registration tests: every session function equals its
DataFrame-expression twin and stays JVM-side (no Python worker node in
the plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.functions.sql_functions import (
    SQL_FUNCTIONS,
    register_all,
)
from cours_datalake_dwh_td_kafka_spark.operators.dedup import cosine_sim, norm_text
from cours_datalake_dwh_td_kafka_spark.operators.relational import (
    band3,
    haversine_km,
)
from cours_datalake_dwh_td_kafka_spark.plans.inspect import plan_facts


@pytest.fixture(autouse=True)
def _register(spark):
    register_all(spark)


def test_haversine_sql_equals_expression(spark):
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 45.7640, 4.8357), (0.0, 0.0, 0.0, 180.0)],
        "lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE",
    )
    got = df.selectExpr("haversine_km(lat1, lon1, lat2, lon2) AS d").collect()
    want = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()
    for g, w in zip(got, want):
        assert g.d == pytest.approx(w.d, abs=1e-9)
    # Paris-Lyon ~391.5 km sanity anchor
    assert got[0].d == pytest.approx(391.5, abs=1.0)


def test_band3_sql_equals_expression(spark):
    df = spark.createDataFrame(
        [(9.9,), (10.0,), (20.0,), (20.1,)], "v DOUBLE"
    )
    got = [r.lvl for r in df.selectExpr("band3(v, 10D, 20D) AS lvl").collect()]
    want = [r.lvl for r in df.select(band3(F.col("v"), 10, 20).alias("lvl")).collect()]
    assert got == want == ["level_0", "level_1", "level_1", "level_2"]


def test_norm_text_sql_equals_expression(spark):
    df = spark.createDataFrame([("  Foo\t\tBar  BAZ \n",)], "s STRING")
    got = df.selectExpr("norm_text(s) AS t").collect()[0].t
    want = df.select(norm_text(F.col("s")).alias("t")).collect()[0].t
    assert got == want == "foo bar baz"


def test_cosine_sim_sql_equals_expression(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0, 2.0], [0.5, 1.0, 2.0])],
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
    )
    got = df.selectExpr("cosine_sim(a, b) AS c").collect()[0].c
    want = df.select(cosine_sim(F.col("a"), F.col("b")).alias("c")).collect()[0].c
    assert got == pytest.approx(want, abs=1e-12)


def test_sql_functions_stay_jvm_side(spark):
    """SQL UDFs are expression macros: no BatchEvalPython (Python worker)
    operator may appear in their plans."""
    df = spark.range(100).selectExpr(
        "haversine_km(CAST(id AS DOUBLE), 0D, 0D, 0D) AS d",
        "band3(CAST(id AS DOUBLE), 10D, 20D) AS lvl",
    )
    assert plan_facts(df).python_evals == 0


def test_all_registrations_idempotent(spark):
    register_all(spark)  # second call must not raise (OR REPLACE)
    assert len(SQL_FUNCTIONS) == 4
