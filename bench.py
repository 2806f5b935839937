"""Headline benchmark: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the
headline JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"sf": ..., "n_queries": N} followed by one line {"queries": {name: sec}}.

Timing protocol: one warm-up pass of the flagship query (JVM/codegen
warm-up), then each query timed once end-to-end including its action
(count of the result — forces full execution without driver-side collect
of wide rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cours_datalake_dwh_td_kafka_spark import registry
from cours_datalake_dwh_td_kafka_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    qs = registry.queries()

    # Warm-up: JVM, codegen, parquet footer caches — touch every table
    # scan once, then the flagship query (so no timed query pays the
    # one-time session costs just because it sorts first).
    from cours_datalake_dwh_td_kafka_spark.io import LAKE_TABLES, load_table

    for t in LAKE_TABLES:
        load_table(spark, sf_dir, t).count()
    qs["sessionization"](spark, sf_dir).count()
    # spin up the Python worker pool + Arrow serialization path once, so
    # whichever pandas-UDF query happens to sort first doesn't pay it
    spark.range(10).mapInPandas(lambda it: it, "id LONG").count()

    timings: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    headline = json.dumps(
        {
            "metric": "total_query_wall_sec",
            "value": total,
            "unit": "sec",
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "n_queries": len(timings),
        }
    )
    # Headline metric on its own SHORT line, before and after the bulky
    # per-query dict — the round driver keeps a bounded stdout tail, and
    # round 1's single ~4KB combined line got truncated into unparseable
    # JSON. Whichever end of the tail survives now starts or ends with a
    # complete headline line.
    print(headline, flush=True)
    print(json.dumps({"queries": timings}), flush=True)
    print(headline, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
