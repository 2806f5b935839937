"""Manifest-based versioned lake: snapshot isolation, time travel, and
copy-on-write deletes over plain parquet — the transactional layer the
reference's hand-built HDFS layout (work/weather_to_hdfs.py:20,
work/batch_profiling_enriched.py:31) lacks, in the style of the public
Iceberg/Delta designs (a table = an immutable set of data files named by
an atomically-swapped manifest).

Layout:
    <table>/data/<commit-id>/part-*.parquet   immutable data files
    <table>/_manifests/v{N}.json              snapshot N's file list

Invariants:
- data files are NEVER mutated or deleted by a commit — a commit only
  ADDS files and writes one new manifest, so every prior version stays
  readable (time travel) and readers never see a partial write (they
  resolve a manifest first, then read exactly its files);
- the manifest write is the commit point: os.open(O_CREAT | O_EXCL)
  makes two racing writers of the same version fail-fast instead of
  silently clobbering (optimistic concurrency, single-writer-wins);
- deletes/updates are copy-on-write: affected rows are rewritten into
  new files and the manifest swaps the file set — at scale, pair with
  partition/bucket pruning so only touched files rewrite (the
  merge-upsert sink in streaming/pipelines.py is the incremental twin).

Local-FS paths only (os/json manifest handling); the data files
themselves go through Spark writers, so pointing the manifest layer at
a DFS needs only the manifest IO swapped to the Hadoop FileSystem API
(the same boundary io.compact_parquet already crosses).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def current_version(path: str) -> int:
    """Highest committed version, or 0 if the table does not exist."""
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        return 0
    versions = [
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions, default=0)


def _read_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(path), f"v{version}.json")) as f:
        return json.load(f)


def _write_data_files(df: DataFrame, path: str) -> list[str]:
    commit_id = uuid.uuid4().hex[:12]
    out = os.path.join(path, "data", commit_id)
    df.write.parquet(out)
    return sorted(
        os.path.join("data", commit_id, f)
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )


def _commit_manifest(path: str, version: int, files: list[str], op: str) -> int:
    mdir = _manifest_dir(path)
    os.makedirs(mdir, exist_ok=True)
    manifest = {"version": version, "op": op, "files": files}
    target = os.path.join(mdir, f"v{version}.json")
    # O_EXCL is the whole concurrency story: the first writer of v{N}
    # wins, the loser gets FileExistsError and must retry on top of N
    fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    return version


def lake_commit(df: DataFrame, path: str, mode: str = "append") -> int:
    """Commit ``df`` as a new snapshot. ``append`` keeps the previous
    version's files and adds the new ones; ``overwrite`` starts the file
    list fresh (old files remain on disk for time travel). Returns the
    committed version number."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown commit mode: {mode}")
    prev = current_version(path)
    files = _write_data_files(df, path)
    if mode == "append" and prev > 0:
        files = _read_manifest(path, prev)["files"] + files
    return _commit_manifest(path, prev + 1, files, mode)


def lake_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read snapshot ``version`` (default: latest). The file list comes
    from one manifest, so the read is consistent regardless of
    concurrent commits — and reading an old version is the SAME code
    path, just an older manifest."""
    v = current_version(path) if version is None else version
    if v < 1:
        raise ValueError(f"no committed version at {path}")
    m = _read_manifest(path, v)
    if not m["files"]:
        raise ValueError(f"version {v} of {path} is empty")
    return spark.read.parquet(*(os.path.join(path, f) for f in m["files"]))


def lake_delete_where(spark: SparkSession, path: str, predicate: str) -> int:
    """Copy-on-write delete: rewrite the CURRENT snapshot minus the rows
    matching ``predicate`` (a SQL boolean expression) and commit the
    rewritten file set as a new version. Prior versions still contain
    the rows — retention/GC is a separate explicit step
    (:func:`lake_vacuum`), exactly so that time travel works."""
    cur = lake_read(spark, path)
    kept = cur.where(f"NOT ({predicate})")
    files = _write_data_files(kept, path)
    return _commit_manifest(path, current_version(path) + 1, files, "delete")


def lake_history(path: str) -> list[dict]:
    """All snapshots oldest-first: version, operation, file count."""
    return [
        {
            "version": v,
            "op": (m := _read_manifest(path, v))["op"],
            "n_files": len(m["files"]),
        }
        for v in range(1, current_version(path) + 1)
    ]


def lake_vacuum(path: str, keep_versions: int = 1) -> list[str]:
    """Drop manifests older than the newest ``keep_versions`` and delete
    data files no surviving manifest references. Returns the deleted
    file paths. This is the ONLY operation that removes data — and it
    runs file-set arithmetic on manifests, never a directory scan race:
    a file is deleted iff no kept manifest lists it."""
    latest = current_version(path)
    if latest == 0:
        return []
    keep = set(range(max(1, latest - keep_versions + 1), latest + 1))
    kept_files = set()
    for v in keep:
        kept_files.update(_read_manifest(path, v)["files"])
    doomed_manifests = [v for v in range(1, latest + 1) if v not in keep]
    doomed_files: set[str] = set()
    for v in doomed_manifests:
        doomed_files.update(_read_manifest(path, v)["files"])
    doomed_files -= kept_files
    deleted = []
    for rel in sorted(doomed_files):
        full = os.path.join(path, rel)
        if os.path.exists(full):
            os.remove(full)
            deleted.append(rel)
    for v in doomed_manifests:
        os.remove(os.path.join(_manifest_dir(path), f"v{v}.json"))
    return deleted


def lake_diff(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
) -> "DataFrame":
    """Row-level change feed between two snapshots: every row of the
    newer snapshot not present in the older one is an ``insert``, every
    older row missing from the newer is a ``delete`` (an update appears
    as delete + insert — plain parquet rows carry no identity beyond
    their values). This is the CDC readout the manifest layout makes
    cheap to answer AFTER the fact, without having subscribed to a
    change stream while the commits happened.

    Shape: two exceptAll set-differences over the manifests' file sets
    — each a hash anti-join keyed on the full row. At scale, diff
    pruned slices (partition/bucket columns) rather than whole
    snapshots; the file-set arithmetic in the manifests tells you which
    files CAN differ (files shared by both versions can be skipped
    entirely — an optimization worth adding when file counts grow)."""
    from pyspark.sql import functions as F

    new = lake_read(spark, path, to_version)
    old = lake_read(spark, path, from_version)
    inserts = new.exceptAll(old).withColumn("_change", F.lit("insert"))
    deletes = old.exceptAll(new).withColumn("_change", F.lit("delete"))
    return inserts.unionByName(deletes)
