"""Scan-shape and backlog-folding guarantees of the incrementally
maintained sessions table (VERDICT r11 #1-#3):

- a small late wave against a user-clustered + bloom-indexed event lake
  OPENS O(touched users' files), not every file (files-opened spy);
- a backfill-sized wave never collects its key set to the driver — the
  fallback is a distributed semi-join with no forced broadcast;
- a multi-version CDC backlog folds into ONE delete+append swap, and a
  kill mid-fold replays exactly once;
- data-less source versions advance the exactly-once mark with a
  row-preserving mark-only commit, so later polls start past them.
"""

from __future__ import annotations

from datetime import datetime

import pytest

import cours_datalake_dwh_td_kafka_spark.lake as lake_mod
from cours_datalake_dwh_td_kafka_spark.lake import (
    _read_manifest,
    current_version,
    lake_bloom_index,
    lake_cluster_by,
    lake_commit,
    lake_consume_changes,
    lake_mark_stream,
    lake_read,
    lake_read_keys,
    last_stream_batch_id,
    pruned_files_keys,
)
from cours_datalake_dwh_td_kafka_spark.operators import (
    session_queries as sq,
)
from cours_datalake_dwh_td_kafka_spark.operators.sessionization import (
    sessionize_events,
)

EV_SCHEMA = (
    "event_id bigint, user_id bigint, ts timestamp, "
    "event_type string, value double"
)


def _ev(eid, uid, minute, etype="click", value=1.0):
    return (eid, uid, datetime(2024, 3, 1, 10, minute), etype, value)


def _bulk_events(spark, n_users=64, per_user=4):
    rows = []
    eid = 0
    for u in range(1, n_users + 1):
        for i in range(per_user):
            eid += 1
            rows.append(_ev(eid, u, i * 3))
    return spark.createDataFrame(rows, EV_SCHEMA), eid


@pytest.fixture()
def spy_pruner(monkeypatch):
    """Record every (kept, total) file count pruned_files_keys returns
    inside lake_read_keys (module-global call, so patching the lake
    module intercepts the maintenance path)."""
    calls: list[tuple[int, int]] = []
    real = lake_mod.pruned_files_keys

    def spy(path, col, values, version=None):
        files, total = real(path, col, values, version)
        calls.append((len(files), total))
        return files, total

    monkeypatch.setattr(lake_mod, "pruned_files_keys", spy)
    return calls


def test_pruned_files_keys_hull_and_bloom(spark, tmp_path):
    """The key-set pruner composes range stats AND blooms: a key set
    whose hull spans the table still skips the in-hull files the blooms
    prove key-free, and the pruned read equals the full-scan IN."""
    path = str(tmp_path / "t")
    df = spark.range(0, 2000).selectExpr(
        "id AS k", "id * 2 AS payload"
    )
    lake_commit(df, path)
    lake_cluster_by(spark, path, "k", n_files=8)  # disjoint ranges
    lake_bloom_index(spark, path, "k")

    # hull 10..1990 spans every file; blooms must do the skipping
    keys = [10, 1990]
    files, total = pruned_files_keys(path, "k", keys)
    assert total == 8
    # the two keys live in exactly the first and last range files; a
    # bloom false positive can only ADD a file, never reach all 8
    assert len(files) < total
    got = sorted(
        tuple(r) for r in lake_read_keys(spark, path, "k", keys).collect()
    )
    assert got == [(10, 20), (1990, 3980)]

    # a tight hull prunes by range alone even for unindexed columns;
    # NULL keys never match (SQL IN semantics)
    assert (
        lake_read_keys(spark, path, "k", [5, None, 7]).count() == 2
    )
    assert lake_read_keys(spark, path, "k", [None]).count() == 0

    # conservatism: a file appended AFTER cluster+bloom has no stats
    # and no bitmap — it must be kept (and its rows found)
    lake_commit(
        spark.createDataFrame([(99999, -1)], "k bigint, payload bigint"),
        path,
        mode="append",
    )
    got = lake_read_keys(spark, path, "k", [99999]).collect()
    assert [tuple(r) for r in got] == [(99999, -1)]


def test_small_wave_opens_touched_files_only(spark, tmp_path, spy_pruner):
    """A one-user late wave against a 64-user clustered+bloomed event
    lake reads O(that user's files): the spy pins kept << total, and
    the maintained table equals the from-scratch recompute."""
    ev_path = str(tmp_path / "events")
    sess_path = str(tmp_path / "sessions")
    events, last_eid = _bulk_events(spark)
    v1 = lake_commit(events, ev_path)
    lake_cluster_by(spark, ev_path, "user_id", n_files=8)
    lake_bloom_index(spark, ev_path, "user_id")
    lake_commit(sessionize_events(lake_read(spark, ev_path)), sess_path)

    # late error mid-run for ONE user: splits their session
    lake_commit(
        spark.createDataFrame([_ev(last_eid + 1, 17, 4, "error")], EV_SCHEMA),
        ev_path,
        mode="append",
    )
    n = sq.maintain_sessions_incremental(
        spark, ev_path, sess_path, since_version=v1
    )
    assert n == 1
    assert spy_pruner, "maintenance did not route through the key pruner"
    kept, total = spy_pruner[-1]
    # 8 clustered files + the stats-less late-wave files (conservatively
    # kept): a 1-user wave opens those plus the user's ~1 range file —
    # never the other 7 clustered files
    n_late = total - 8
    assert n_late >= 1
    assert kept <= n_late + 2, f"small wave opened {kept}/{total} files"
    final = lake_read(spark, sess_path)
    want = sessionize_events(lake_read(spark, ev_path))
    assert final.exceptAll(want).count() == 0
    assert want.exceptAll(final).count() == 0
    assert final.where("user_id = 17").count() == 2


def test_backfill_wave_skips_driver_collect(
    spark, tmp_path, spy_pruner, monkeypatch
):
    """Above the cap the touched set is NEVER collected: the pruner is
    not called, the read is a distributed semi-join, and the result
    still equals the recompute."""
    monkeypatch.setattr(sq, "TOUCHED_KEYS_PRUNE_CAP", 0)
    ev_path = str(tmp_path / "events")
    sess_path = str(tmp_path / "sessions")
    events, last_eid = _bulk_events(spark, n_users=8)
    v1 = lake_commit(events, ev_path)
    lake_commit(sessionize_events(lake_read(spark, ev_path)), sess_path)
    lake_commit(
        spark.createDataFrame(
            [_ev(last_eid + i, u, 4, "error") for i, u in enumerate((2, 5))],
            EV_SCHEMA,
        ),
        ev_path,
        mode="append",
    )
    n = sq.maintain_sessions_incremental(
        spark, ev_path, sess_path, since_version=v1
    )
    assert n == 2
    assert spy_pruner == [], "backfill wave must not collect keys"
    final = lake_read(spark, sess_path)
    want = sessionize_events(lake_read(spark, ev_path))
    assert final.exceptAll(want).count() == 0
    assert want.exceptAll(final).count() == 0


def test_cdc_backlog_folds_into_one_swap(spark, tmp_path):
    """A 5-version backlog folds in ONE maintenance pass: one touched
    set, one delete+append on the sessions table, the mark recording
    the highest folded version — then a replay consumes nothing."""
    ev_path = str(tmp_path / "events")
    sess_path = str(tmp_path / "sessions")
    lake_commit(
        spark.createDataFrame([_ev(1, 1, 0), _ev(2, 2, 0)], EV_SCHEMA),
        ev_path,
    )
    assert sq.maintain_sessions_from_cdc(spark, ev_path, sess_path) == [1]
    v_sess0 = current_version(sess_path)

    # 5 waves land before the daemon polls again
    for i in range(5):
        lake_commit(
            spark.createDataFrame(
                [_ev(10 + i, 1 + (i % 2), 5 + i, "error")], EV_SCHEMA
            ),
            ev_path,
            mode="append",
        )
    folded = sq.maintain_sessions_from_cdc(spark, ev_path, sess_path)
    assert folded == [2, 3, 4, 5, 6]
    # ONE swap: exactly two new sessions-table versions (delete, append)
    assert current_version(sess_path) == v_sess0 + 2
    final = lake_read(spark, sess_path)
    want = sessionize_events(lake_read(spark, ev_path))
    assert final.exceptAll(want).count() == 0
    assert want.exceptAll(final).count() == 0
    # replay: nothing left
    assert sq.maintain_sessions_from_cdc(spark, ev_path, sess_path) == []


def test_fold_kill_mid_swap_replays_exactly_once(spark, tmp_path):
    """Kill between the fold's delete and its marked append: the state
    is 'touched rows deleted, mark not advanced'. The next poll re-runs
    the WHOLE fold — deletes anti-join already-gone rows, the marked
    append lands once — and the table equals the recompute."""
    from cours_datalake_dwh_td_kafka_spark.lake import lake_delete_keys

    ev_path = str(tmp_path / "events")
    sess_path = str(tmp_path / "sessions")
    lake_commit(
        spark.createDataFrame(
            [_ev(1, 1, 0), _ev(2, 1, 10), _ev(3, 2, 0)], EV_SCHEMA
        ),
        ev_path,
    )
    assert sq.maintain_sessions_from_cdc(spark, ev_path, sess_path) == [1]
    for i in range(3):
        lake_commit(
            spark.createDataFrame([_ev(10 + i, 1, 4 + i, "error")], EV_SCHEMA),
            ev_path,
            mode="append",
        )
    # simulate the crash state: the fold's delete landed, append didn't
    lake_delete_keys(
        spark,
        sess_path,
        "user_id",
        keys=spark.createDataFrame([(1,)], "user_id bigint"),
    )
    assert last_stream_batch_id(
        sess_path, f"sessions:{ev_path}"
    ) < current_version(ev_path)

    folded = sq.maintain_sessions_from_cdc(spark, ev_path, sess_path)
    assert folded == [2, 3, 4]
    final = lake_read(spark, sess_path)
    want = sessionize_events(lake_read(spark, ev_path))
    assert final.exceptAll(want).count() == 0
    assert want.exceptAll(final).count() == 0
    assert sq.maintain_sessions_from_cdc(spark, ev_path, sess_path) == []


def test_markonly_commit_advances_over_dataless_versions(spark, tmp_path):
    """Row-preserving source versions (compact/cluster/bloom) produce
    no changes; the drain lands a MARK-ONLY commit so the NEXT poll's
    walk starts past them instead of re-reading their manifests every
    tick (VERDICT r11 #3)."""
    ev_path = str(tmp_path / "events")
    sess_path = str(tmp_path / "sessions")
    lake_commit(
        spark.createDataFrame([_ev(1, 1, 0), _ev(2, 2, 0)], EV_SCHEMA),
        ev_path,
    )
    assert sq.maintain_sessions_from_cdc(spark, ev_path, sess_path) == [1]
    rows_before = sorted(map(tuple, lake_read(spark, sess_path).collect()))

    # maintenance-only tail on the source: no data changes
    lake_cluster_by(spark, ev_path, "user_id", n_files=2)
    lake_bloom_index(spark, ev_path, "user_id")
    v_ev = current_version(ev_path)

    folded = sq.maintain_sessions_from_cdc(spark, ev_path, sess_path)
    assert folded == [2, 3]
    v_sess = current_version(sess_path)
    m = _read_manifest(sess_path, v_sess)
    assert m["op"] == "mark"
    assert m["stream_batch_id"] == v_ev
    # mark commit preserved rows AND the file list (zero data writes)
    assert m["files"] == _read_manifest(sess_path, v_sess - 1)["files"]
    assert (
        sorted(map(tuple, lake_read(spark, sess_path).collect()))
        == rows_before
    )
    # second drain: mark already at cur — zero versions walked, zero
    # commits, idempotent forever
    assert sq.maintain_sessions_from_cdc(spark, ev_path, sess_path) == []
    assert current_version(sess_path) == v_sess


def test_lake_mark_stream_is_guarded(spark, tmp_path):
    path = str(tmp_path / "t")
    assert lake_mark_stream(path, "s", 5) is None  # no table yet
    lake_commit(spark.range(3).toDF("id"), path)
    v = lake_mark_stream(path, "s", 5)
    assert v == 2 and last_stream_batch_id(path, "s") == 5
    # not regressing: an equal-or-lower mark is a no-op
    assert lake_mark_stream(path, "s", 5) is None
    assert lake_mark_stream(path, "s", 4) is None
    assert current_version(path) == 2
    # scoped: a different stream identity sees no mark
    assert last_stream_batch_id(path, "other") == -1
    # CDC skips the mark commit (row-preserving op)
    from cours_datalake_dwh_td_kafka_spark.lake import lake_changes_since

    assert lake_changes_since(spark, path, 1).count() == 0


def test_lake_consume_changes_fold_mode(spark, tmp_path):
    """fold=True drains an N-version backlog in ONE commit marked with
    the highest folded version, equal row-wise to per-version mode."""
    src = str(tmp_path / "src")
    out_fold = str(tmp_path / "out_fold")
    out_step = str(tmp_path / "out_step")
    for i in range(3):
        lake_commit(
            spark.createDataFrame([(i, f"r{i}")], "id bigint, s string"),
            src,
            mode="append",
        )
    assert lake_consume_changes(spark, src, out_fold, fold=True) == [1, 2, 3]
    assert current_version(out_fold) == 1  # ONE commit for the backlog
    assert lake_consume_changes(spark, src, out_step) == [1, 2, 3]
    assert current_version(out_step) == 3
    a = sorted(map(tuple, lake_read(spark, out_fold).collect()))
    b = sorted(map(tuple, lake_read(spark, out_step).collect()))
    assert a == b and len(a) == 3
    # replay: both modes consume nothing
    assert lake_consume_changes(spark, src, out_fold, fold=True) == []
    # resumes from the fold's mark: only the NEW version
    lake_commit(
        spark.createDataFrame([(9, "r9")], "id bigint, s string"),
        src,
        mode="append",
    )
    assert lake_consume_changes(spark, src, out_fold, fold=True) == [4]
    assert current_version(out_fold) == 2


@pytest.mark.parametrize(
    "cluster,bloom",
    [(False, False), (True, False), (False, True), (True, True)],
)
def test_lake_read_keys_equals_full_scan_in(spark, tmp_path, cluster, bloom):
    """Soundness sweep: under every index combination — no layout,
    range stats only, bloom only, both — lake_read_keys(col, keys)
    must equal lake_read().where(col IN keys), including absent keys,
    negative keys, duplicate keys, post-index appends, and
    merge-on-read deletes."""
    from pyspark.sql import functions as F

    from cours_datalake_dwh_td_kafka_spark.lake import lake_delete_keys

    path = str(tmp_path / f"t_{cluster}_{bloom}")
    df = spark.range(-500, 1500).selectExpr("id AS k", "id * 3 AS v")
    lake_commit(df.repartition(6), path)
    if cluster:
        lake_cluster_by(spark, path, "k", n_files=6)
    if bloom:
        lake_bloom_index(spark, path, "k")
    # stats-less append after the index builds
    lake_commit(
        spark.createDataFrame([(7777, 1)], "k bigint, v bigint"),
        path,
        mode="append",
    )
    # merge-on-read delete of a key the probes will ask for
    lake_delete_keys(
        spark, path, "k", keys=spark.createDataFrame([(10,)], "k bigint")
    )
    key_sets = [
        [10, 20, 30],            # 10 is deleted -> must not match
        [-499, 1499, 7777],      # extremes + the appended key
        [99999, -99999],         # all absent
        [5, 5, 5],               # duplicates
        [0],
    ]
    for keys in key_sets:
        got = sorted(
            tuple(r)
            for r in lake_read_keys(spark, path, "k", keys).collect()
        )
        want = sorted(
            tuple(r)
            for r in lake_read(spark, path)
            .where(F.col("k").isin(keys))
            .collect()
        )
        assert got == want, (cluster, bloom, keys, got[:5], want[:5])


def test_pruned_files_keys_unindexed_short_circuits(spark, tmp_path):
    """VERDICT r12 #5: on a layout with NEITHER stats NOR bloom for the
    column, pruned_files_keys returns every file WITHOUT running the
    hull/bloom probe machinery — the cost on an un-indexed table is one
    manifest read, never |files| x |keys| driver-side work."""
    path = str(tmp_path / "unindexed")
    lake_commit(spark.range(0, 1000).selectExpr("id AS k").repartition(5), path)

    def boom(*a, **kw):  # the guard must return before hull pruning
        raise AssertionError("pruned_files must not run on an un-indexed layout")

    orig = lake_mod.pruned_files
    lake_mod.pruned_files = boom
    try:
        files, total = pruned_files_keys(path, "k", list(range(2000)))
    finally:
        lake_mod.pruned_files = orig
    assert total == 5 and len(files) == 5
    # an indexed layout still prunes (the guard is column-scoped)
    lake_cluster_by(spark, path, "k", n_files=5)
    files, total = pruned_files_keys(path, "k", [3])
    assert len(files) < total


def test_lake_read_keys_semi_join_above_inset_cap(spark, tmp_path):
    """Above KEYS_INSET_MAX the row filter is a broadcast left-semi
    join (one broadcast block, plan stays one literal wide); at or
    below it stays an IN literal. Both shapes equal the full-scan IN,
    duplicates included."""
    from pyspark.sql import functions as F

    from cours_datalake_dwh_td_kafka_spark.lake import KEYS_INSET_MAX

    path = str(tmp_path / "big")
    lake_commit(
        spark.range(0, 5000).selectExpr("id AS k", "id * 2 AS v"), path
    )
    lake_cluster_by(spark, path, "k", n_files=4)

    big = [x * 2 for x in range(KEYS_INSET_MAX + 200)]  # evens only
    got = lake_read_keys(spark, path, "k", big)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert (
        sorted(r.k for r in got.collect())
        == sorted(
            r.k
            for r in lake_read(spark, path).where(F.col("k").isin(big)).collect()
        )
    )

    small = [1, 2, 3, 2, 1]  # dups dedup into the literal
    got_small = lake_read_keys(spark, path, "k", small)
    plan_small = got_small._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in plan_small
    assert sorted(r.k for r in got_small.collect()) == [1, 2, 3]


def test_lake_read_keys_loose_types_consistent_across_cap(spark, tmp_path):
    """Float keys against a bigint column behave the SAME on both sides
    of KEYS_INSET_MAX (r13 review): the semi-join build side infers its
    type from the values and the join inserts the same coercion casts
    isin would — behavior must not flip on key-count."""
    from pyspark.sql import functions as F

    from cours_datalake_dwh_td_kafka_spark.lake import KEYS_INSET_MAX

    path = str(tmp_path / "loose")
    lake_commit(spark.range(0, 3000).selectExpr("id AS k"), path)

    small = [float(x) for x in (1, 2, 3)]
    big = [float(x) for x in range(KEYS_INSET_MAX + 100)]
    got_small = sorted(
        r.k for r in lake_read_keys(spark, path, "k", small).collect()
    )
    assert got_small == [1, 2, 3]
    got_big = sorted(
        r.k for r in lake_read_keys(spark, path, "k", big).collect()
    )
    want_big = sorted(
        r.k
        for r in lake_read(spark, path).where(F.col("k").isin(big)).collect()
    )
    assert got_big == want_big and len(got_big) == KEYS_INSET_MAX + 100


def test_lake_read_keys_mixed_type_list_above_cap(spark, tmp_path):
    """ADVICE r13: a MIXED int+float key list (which the isin literal
    accepts below the cap) must not crash createDataFrame's type
    inference above it — the numeric mix normalizes to float and the
    semi-join result equals the full-scan IN."""
    from pyspark.sql import functions as F

    from cours_datalake_dwh_td_kafka_spark.lake import KEYS_INSET_MAX

    path = str(tmp_path / "mixed")
    lake_commit(spark.range(0, 4000).selectExpr("id AS k"), path)
    mixed = [
        float(x) if x % 2 else x for x in range(KEYS_INSET_MAX + 100)
    ]
    got = lake_read_keys(spark, path, "k", mixed)
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k
        for r in lake_read(spark, path)
        .where(F.col("k").isin(mixed))
        .collect()
    )
