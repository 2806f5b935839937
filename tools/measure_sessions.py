"""A/B evidence for the round-12 sessions-maintenance changes: on a
lake built from $SPARK_GRAFT_SF_DIR's events (default sf0.1; point at
the 10x lake for the scale row), measure

  (a) a SMALL late wave's maintenance wall time with the pruned
      touched-user read (lake_read_keys: stats hull + bloom probes)
      vs the round-11 shape (full lake_read + semi-join) — the
      files-opened counts ride along;
  (b) a V-version CDC backlog folded into ONE swap
      (maintain_sessions_from_cdc) vs the round-11 per-version loop.

Prints one JSON line. Results are quoted in README's maintenance
section.

    python tools/measure_sessions.py            # sf0.1
    SPARK_GRAFT_SF_DIR=/tmp/sf1x python tools/measure_sessions.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

import cours_datalake_dwh_td_kafka_spark.lake as lake_mod
from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.lake import (
    lake_bloom_index,
    lake_cluster_by,
    lake_commit,
    lake_read,
)
from cours_datalake_dwh_td_kafka_spark.operators import session_queries as sq
from cours_datalake_dwh_td_kafka_spark.operators.sessionization import (
    sessionize_events,
)
from cours_datalake_dwh_td_kafka_spark.session import get_spark

WAVE_USERS = 8  # the "small late wave" cohort size
# cluster layout of the scratch event lake; at 10x/100x scale the
# honest comparison keeps per-file row counts ~constant (a real lake
# grows its FILE COUNT with data), so the scale runs pass
# SPARK_GRAFT_SESS_FILES=320/3200 rather than fattening 32 files
N_FILES = int(os.environ.get("SPARK_GRAFT_SESS_FILES", "32"))
BACKLOG = 5  # versions behind for the fold A/B


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="measure_sessions",
        extra_conf={"spark.cleaner.periodicGC.interval": "30min"},
    )
    e = load_table(spark, sf_dir, "events")
    users = [r.user_id for r in
             e.select("user_id").distinct().limit(WAVE_USERS).collect()]
    late = F.col("user_id").isin(users) & (F.col("event_id") % 7 == 0)

    def fresh_lake(tag: str) -> tuple[str, str, int]:
        tmp = tempfile.mkdtemp(prefix=f"graft_sess_ab_{tag}_")
        ev, sess = os.path.join(tmp, "ev"), os.path.join(tmp, "sess")
        v1 = lake_commit(e.where(~late).repartition(N_FILES), ev)
        lake_cluster_by(spark, ev, "user_id", n_files=N_FILES)
        lake_bloom_index(spark, ev, "user_id")
        lake_commit(sessionize_events(lake_read(spark, ev)), sess)
        lake_commit(e.where(late), ev, mode="append")
        return ev, sess, v1

    out: dict = {"sf_dir": sf_dir, "n_events": e.count(),
                 "wave_users": WAVE_USERS, "cluster_files": N_FILES}

    # ---- (a) pruned vs full-scan touched-user read -------------------
    spy: list[tuple[int, int]] = []
    real_pruner = lake_mod.pruned_files_keys

    def spy_pruner(path, col, values, version=None):
        files, total = real_pruner(path, col, values, version)
        spy.append((len(files), total))
        return files, total

    lake_mod.pruned_files_keys = spy_pruner
    try:
        ev, sess, v1 = fresh_lake("pruned")
        t0 = time.perf_counter()
        n = sq.maintain_sessions_incremental(spark, ev, sess, v1)
        out["pruned_wave_sec"] = round(time.perf_counter() - t0, 3)
        out["pruned_touched_users"] = n
        out["pruned_files_opened"], out["files_total"] = spy[-1]
        shutil.rmtree(os.path.dirname(ev), ignore_errors=True)
    finally:
        lake_mod.pruned_files_keys = real_pruner

    # round-11 shape: force the fallback (full read + semi-join)
    cap = sq.TOUCHED_KEYS_PRUNE_CAP
    sq.TOUCHED_KEYS_PRUNE_CAP = 0
    try:
        ev, sess, v1 = fresh_lake("full")
        t0 = time.perf_counter()
        sq.maintain_sessions_incremental(spark, ev, sess, v1)
        out["fullscan_wave_sec"] = round(time.perf_counter() - t0, 3)
        shutil.rmtree(os.path.dirname(ev), ignore_errors=True)
    finally:
        sq.TOUCHED_KEYS_PRUNE_CAP = cap

    # ---- (b) folded backlog vs per-version loop ----------------------
    def backlog_lake(tag: str) -> tuple[str, str]:
        tmp = tempfile.mkdtemp(prefix=f"graft_sess_fold_{tag}_")
        ev, sess = os.path.join(tmp, "ev"), os.path.join(tmp, "sess")
        lake_commit(e.where(~late).repartition(N_FILES), ev)
        lake_cluster_by(spark, ev, "user_id", n_files=N_FILES)
        lake_bloom_index(spark, ev, "user_id")
        sq.maintain_sessions_from_cdc(spark, ev, sess)  # bootstrap + mark
        for i in range(BACKLOG):
            lake_commit(
                e.where(late & (F.col("event_id") % BACKLOG == i)),
                ev,
                mode="append",
            )
        return ev, sess

    ev, sess = backlog_lake("fold")
    t0 = time.perf_counter()
    folded = sq.maintain_sessions_from_cdc(spark, ev, sess)
    out["fold_backlog_sec"] = round(time.perf_counter() - t0, 3)
    out["fold_versions"] = len(folded)
    shutil.rmtree(os.path.dirname(ev), ignore_errors=True)

    # round-11 shape: one maintenance swap per backlog version
    ev, sess = backlog_lake("loop")
    from cours_datalake_dwh_td_kafka_spark.lake import (
        current_version,
        last_stream_batch_id,
    )

    sid = f"sessions:{os.path.abspath(ev)}"
    t0 = time.perf_counter()
    start = max(last_stream_batch_id(sess, sid), 0)
    for v in range(start + 1, current_version(ev) + 1):
        sq.maintain_sessions_incremental(
            spark, ev, sess, since_version=v - 1,
            stream_id=sid, mark_version=v,
        )
    out["per_version_backlog_sec"] = round(time.perf_counter() - t0, 3)
    shutil.rmtree(os.path.dirname(ev), ignore_errors=True)

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
