"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual registry lives in
``cours_datalake_dwh_td_kafka_spark/registry.py``; operator modules
register themselves there (SURVEY.md §2 inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cours_datalake_dwh_td_kafka_spark import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (trip sessionization, SURVEY.md §2.5/W1-W4) on the
    sf0.001 events table; driver checks rows>0 + stable schema."""
    qs = _registry.queries()
    return qs["sessionization"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    return _registry.oracle_sql()
