"""Dump .explain("formatted") for named queries to stdout or files.

Usage:
    python tools/explain_query.py q1 q2 ...            # print to stdout
    python tools/explain_query.py --out DIR q1 q2 ...  # write DIR/<q>.txt

Uses $SPARK_GRAFT_SF_DIR (default sf0.1) like bench.py. Plans are taken
WITHOUT executing the query (AdaptiveSparkPlan isFinalPlan=false), which
is what the plan-shape checks in tests/test_plans.py also read.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cours_datalake_dwh_td_kafka_spark import registry
from cours_datalake_dwh_td_kafka_spark.plans.inspect import formatted_plan
from cours_datalake_dwh_td_kafka_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    out_dir = None
    if args and args[0] == "--out":
        out_dir = args[1]
        args = args[2:]
        os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="explain")
    qs = registry.queries()
    unknown = [a for a in args if a not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    for name in args:
        df = qs[name](spark, sf_dir)
        plan = formatted_plan(df)
        if out_dir:
            path = os.path.join(out_dir, f"{name}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path}")
        else:
            print(f"===== {name} =====")
            print(plan)
    spark.stop()


if __name__ == "__main__":
    main()
