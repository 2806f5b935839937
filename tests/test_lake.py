"""Versioned-lake semantics: snapshot isolation, time travel, CoW
deletes, optimistic-concurrency commit point, and vacuum GC."""

from __future__ import annotations

import os

import pytest

from cours_datalake_dwh_td_kafka_spark.lake import (
    current_version,
    lake_commit,
    lake_delete_where,
    lake_history,
    lake_read,
    lake_vacuum,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["id", "val"])


def test_commit_read_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    v1 = lake_commit(_df(spark, [(1, "a"), (2, "b")]), path)
    v2 = lake_commit(_df(spark, [(3, "c")]), path)  # append
    assert (v1, v2) == (1, 2)
    assert current_version(path) == 2

    latest = {tuple(r) for r in lake_read(spark, path).collect()}
    assert latest == {(1, "a"), (2, "b"), (3, "c")}
    # time travel: v1 still readable, unchanged by the append
    old = {tuple(r) for r in lake_read(spark, path, version=1).collect()}
    assert old == {(1, "a"), (2, "b")}


def test_overwrite_keeps_old_versions_readable(spark, tmp_path):
    path = str(tmp_path / "t")
    lake_commit(_df(spark, [(1, "a")]), path)
    lake_commit(_df(spark, [(9, "z")]), path, mode="overwrite")
    assert {tuple(r) for r in lake_read(spark, path).collect()} == {(9, "z")}
    assert {tuple(r) for r in lake_read(spark, path, 1).collect()} == {
        (1, "a")
    }


def test_delete_where_is_copy_on_write(spark, tmp_path):
    path = str(tmp_path / "t")
    lake_commit(_df(spark, [(i, "x") for i in range(10)]), path)
    v = lake_delete_where(spark, path, "id % 2 = 0")
    assert v == 2
    kept = sorted(r.id for r in lake_read(spark, path).collect())
    assert kept == [1, 3, 5, 7, 9]
    # the pre-delete snapshot still has every row
    assert len(lake_read(spark, path, 1).collect()) == 10
    assert [h["op"] for h in lake_history(path)] == ["append", "delete"]


def test_concurrent_commit_point_is_exclusive(spark, tmp_path):
    """Two writers committing the same next version: exactly one wins."""
    from cours_datalake_dwh_td_kafka_spark.lake import (
        _commit_manifest,
        _write_data_files,
    )

    path = str(tmp_path / "t")
    lake_commit(_df(spark, [(1, "a")]), path)
    f1 = _write_data_files(_df(spark, [(2, "b")]), path)
    f2 = _write_data_files(_df(spark, [(3, "c")]), path)
    _commit_manifest(path, 2, f1, "append")
    with pytest.raises(FileExistsError):
        _commit_manifest(path, 2, f2, "append")
    # loser retries on top of the winner - standard optimistic protocol
    _commit_manifest(path, 3, f2, "append")
    assert current_version(path) == 3


def test_vacuum_deletes_only_unreferenced_files(spark, tmp_path):
    path = str(tmp_path / "t")
    lake_commit(_df(spark, [(1, "a")]), path)            # v1
    lake_commit(_df(spark, [(9, "z")]), path, "overwrite")  # v2: v1 orphaned
    lake_commit(_df(spark, [(10, "y")]), path)           # v3 = v2 files + new
    deleted = lake_vacuum(path, keep_versions=2)
    # v1's files are referenced by no kept manifest -> gone
    assert deleted, "expected v1 data files to be deleted"
    for rel in deleted:
        assert not os.path.exists(os.path.join(path, rel))
    # latest and v2 still read fine (v2's files are shared with v3)
    assert {tuple(r) for r in lake_read(spark, path).collect()} == {
        (9, "z"),
        (10, "y"),
    }
    assert {tuple(r) for r in lake_read(spark, path, 2).collect()} == {
        (9, "z")
    }
    with pytest.raises(FileNotFoundError):
        lake_read(spark, path, 1)


def test_lake_diff_reports_inserts_and_deletes(spark, tmp_path):
    path = str(tmp_path / "t")
    lake_commit(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), path)
    lake_delete_where(spark, path, "id = 2")          # v2: drop row 2
    lake_commit(_df(spark, [(4, "d")]), path)         # v3: add row 4

    from cours_datalake_dwh_td_kafka_spark.lake import lake_diff

    d = {
        (r.id, r.val, r._change)
        for r in lake_diff(spark, path, from_version=1).collect()
    }
    assert d == {(4, "d", "insert"), (2, "b", "delete")}
    # adjacent-version diff isolates one commit's effect
    d12 = {
        (r.id, r._change)
        for r in lake_diff(spark, path, 1, 2).collect()
    }
    assert d12 == {(2, "delete")}
