"""The core correctness gate, run locally: every registered query with an
oracle is executed on Spark AND DuckDB at sf=0.01 and compared
order-insensitively — the same check the driver performs per round."""

from __future__ import annotations

import pytest

from cours_datalake_dwh_td_kafka_spark import registry
from tests.conftest import SF_ORACLE, assert_matches_oracle, register_duck_views


def _oracle_cases():
    oracles = registry.oracle_sql()
    return sorted(oracles.keys())


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_oracle(spark, duck, name):
    register_duck_views(duck, SF_ORACLE)
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    spark_df = q(spark, SF_ORACLE)
    duck_df = duck.execute(sql).df()
    assert_matches_oracle(spark_df, duck_df, name)


def test_all_queries_run_and_nonempty(spark):
    """Queries without oracles still must run and return a stable
    schema. r15 (suite wall time, VERDICT r14 #2): restricted to the
    NO-oracle queries — every oracled query is already executed AND
    value-compared by the parametrized parity test above, so re-running
    all of them here was one 4-minute test of pure duplication."""
    oracled = set(registry.oracle_sql())
    for name, q in registry.queries().items():
        if name in oracled:
            continue
        df = q(spark, SF_ORACLE)
        assert df.columns, name
        assert df.count() >= 0, name
