"""Lake IO: table loading, temp-view registration, partitioned writers.

Covers SURVEY.md section 2.1 S1-S9/S18-S20: CSV/JSON/Parquet scans (raw,
header, inferSchema, explicit schema, glob/path-list), sinks with
``partitionBy`` replacing the reference's hand-built
``/{country}/{city}/...`` path formatting
(reference: work/weather_to_hdfs.py:20, work/batch_profiling_enriched.py:30-32),
and the pandas bridges (reference: work/Projet/preparation_noaa.ipynb:124,
work/TD_pySpark.ipynb:486).
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyarrow.parquet as _pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Tables the driver materializes per scale factor (TESTDATA.md).
LAKE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=256)
def _nanos_timestamp_cols_cached(path: str, mtime_ns: int) -> tuple[str, ...]:
    # directory-style parquet (anything Spark itself wrote): probe one
    # part file — all parts of a table share the footer schema. A
    # partitionBy layout nests part files under key=value dirs, so
    # descend (bounded) until one is found.
    for _ in range(8):  # partition-depth bound
        if not os.path.isdir(path):
            break
        entries = sorted(
            e for e in os.listdir(path) if not e.startswith(("_", "."))
        )
        parts = [e for e in entries if e.endswith(".parquet")]
        if parts:
            path = os.path.join(path, parts[0])
            break
        subdirs = [
            e for e in entries if os.path.isdir(os.path.join(path, e))
        ]
        if not subdirs:
            return ()  # empty dataset: nothing to probe
        path = os.path.join(path, subdirs[0])
    else:
        return ()
    # the PARQUET schema, not the Arrow one: Arrow reports legacy INT96
    # timestamps (Spark's own historical default) as timestamp[ns] too,
    # but Spark reads INT96 natively — only true INT64 TIMESTAMP(NANOS)
    # needs the nanosAsLong escape hatch
    schema = _pq.ParquetFile(path).schema
    return tuple(
        c.name
        for c in (schema.column(i) for i in range(len(schema)))
        if c.physical_type == "INT64"
        and c.logical_type is not None
        and c.logical_type.type == "TIMESTAMP"
        and "nanoseconds" in str(c.logical_type)
    )


def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — one footer read, cached
    on (path, mtime) so a table REWRITTEN at the same path mid-session
    (e.g. with a different timestamp resolution) re-reads its footer
    instead of applying a stale nanos-column list.

    Spark's vectorized reader rejects nanosecond timestamps outright
    (PARQUET_TYPE_ILLEGAL); the lake's ``events.ts`` is nanos. We read such
    columns as raw int64 nanos (``spark.sql.legacy.parquet.nanosAsLong``)
    and truncate to microseconds with integer division — the same
    truncation DuckDB applies, so oracle comparisons agree to the micro.
    """
    try:
        mtime_ns = os.stat(path).st_mtime_ns
    except OSError:
        mtime_ns = 0  # directory-style parquet or remote path: no stat
    return _nanos_timestamp_cols_cached(path, mtime_ns)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one lake table. Parquet keeps predicate pushdown,
    column pruning and partition pruning on the table scan (verify with
    ``df.explain``: PushedFilters / ReadSchema).

    Note: loading a table with nanosecond timestamp columns flips
    ``spark.sql.legacy.parquet.nanosAsLong`` for the whole session — a
    global conf mutation. It only changes how OTHER scans read
    TIMESTAMP(NANOS) parquet (a type Spark would otherwise refuse to scan
    at all), so coexisting micro/milli reads are unaffected."""
    path = f"{sf_dir}/{name}.parquet"
    ns_cols = _nanos_timestamp_cols(path)
    if not ns_cols:
        df = spark.read.parquet(path)
    else:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in ns_cols:
            # int64 nanos -> micros via integer `div` (truncation, not a
            # double round-trip: 1.7e18 exceeds double's 53-bit
            # exact-integer range)
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
    # Parquet written without isAdjustedToUTC reads back as TIMESTAMP_NTZ.
    # Normalize to session-TZ TIMESTAMP (sessions pin UTC) so the public
    # schema is stable whether the lake stores nanos, micros-UTC, or
    # micros-naive — downstream window/lag/oracle comparisons see one type.
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def parquet_row_count(path: str) -> int:
    """Exact row count from parquet footer metadata — no Spark job, no
    data scan, O(files). The cheap way for an operator to size a
    data-dependent parameter (e.g. semantic-dedup cell bits) at
    plan-BUILD time without running an eager count() job."""
    if os.path.isdir(path):
        total = 0
        for root, _, files in os.walk(path):
            total += sum(
                _pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                for f in files
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
        return total
    return _pq.ParquetFile(path).metadata.num_rows


def load_lake(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every lake table and register each as a temp view so the SQL
    surface stays in lockstep with the DataFrame surface
    (reference: work/Projet_Spark_Analyse_Climatique.ipynb:199-200)."""
    out: dict[str, DataFrame] = {}
    for name in LAKE_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


# --------------------------------------------------------------------------
# Readers (S1-S6). Thin, typed wrappers: the policy (explicit schemas on
# large scans, no inference passes over big files) lives here.
# --------------------------------------------------------------------------

def read_csv(
    spark: SparkSession,
    paths: str | list[str],
    schema: StructType | None = None,
    header: bool = True,
    infer_schema: bool = False,
    sep: str = ",",
) -> DataFrame:
    """CSV scan: raw (header=False, all-string), header, inferSchema, or
    explicit-schema multi-path (reference: work/Intro_pySpark.ipynb:71,117,163;
    work/Projet/preparation_noaa.ipynb:344-350). Engine policy: pass
    ``schema`` for anything large — inference is a second full scan."""
    reader = spark.read.options(header=header, sep=sep)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    return reader.csv(paths)


def read_json(
    spark: SparkSession, paths: str | list[str], schema: StructType | None = None
) -> DataFrame:
    """JSON-lines scan incl. partition-dir globs
    (reference: work/batch_profiling_enriched.py:8, work/anomaly_detector.py:11)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(paths)


def read_parquet(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parquet scan (reference: work/Intro_pySpark.ipynb:384)."""
    if isinstance(paths, str):
        return spark.read.parquet(paths)
    return spark.read.parquet(*paths)


# --------------------------------------------------------------------------
# Writers (S7-S9). partitionBy replaces hand-built partition paths: at
# 100 TB the partition layout is what makes partition pruning work, and a
# driver-side loop formatting paths (reference: work/batch_profiling_enriched.py:30-32)
# serializes the write. Hive-style partitioning parallelizes it and lets
# readers prune.
# --------------------------------------------------------------------------

def write_csv(
    df: DataFrame, path: str, header: bool = True, single_file: bool = False
) -> None:
    """CSV sink; ``single_file`` keeps the reference's ``coalesce(1)`` export
    convenience (reference: work/TD_pySpark.ipynb:633) — small exports only."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", header).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Raw-layer columnar persistence (reference: work/Projet/preparation_noaa.ipynb:359)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned JSON sink replacing string-formatted
    ``/{country}/{city}/{year}`` paths (reference: work/batch_profiling_enriched.py:30-32)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    n_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed (hash-clustered) table write: rows are hash-partitioned
    into ``n_buckets`` files per partition ON WRITE, and the bucketing
    metadata is recorded in the catalog — so a later join or aggregate
    keyed on ``bucket_cols`` reads co-located data and SKIPS ITS SHUFFLE
    entirely (the Exchange disappears from the plan; pinned in
    tests/test_io.py). ``sort_cols`` additionally sorts within each
    bucket file, letting sort-merge joins skip their sort.

    This is the 100 TB lever for fact-fact joins the broadcast path
    can't serve (both sides huge): pay the shuffle ONCE at ingest, then
    every downstream join/agg on the same key is exchange-free. Size
    ``n_buckets`` so one bucket of the biggest table fits an executor
    core's working set (~128-512 MB of parquet per bucket).

    ``path`` makes it an external table (tests use tmp dirs); bucketing
    requires ``saveAsTable`` — a bare ``.parquet(path)`` write silently
    drops the bucket metadata.

    This is the ONE definition of the bucketed-write lever (round 4
    unified the former operators.scale twin into it — two sources of
    truth for the same lake contract drift).
    """
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    if isinstance(sort_cols, str):
        sort_cols = [sort_cols]
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def compact_parquet(
    spark: SparkSession, path: str, target_mb: int = 128
) -> int:
    """Small-file compaction for a parquet directory: rewrite to
    ``ceil(total_bytes / target_mb)`` files and swap into place. Returns
    the new file count.

    Streaming sinks commit one file per partition per micro-batch, so a
    lake ingesting all day accumulates thousands of KB-sized files —
    and at read time each costs a task + a footer fetch (the classic
    small-files tax). Compaction runs as a periodic batch job on
    partitions the stream has moved past. Sizes and the directory swap
    both go through the Hadoop FileSystem API, so the same code runs on
    local paths and hdfs:// alike; on object stores (rename is a copy,
    not atomic) front the swap with a manifest commit or run it under a
    table format's transaction instead."""
    import math

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()

    def hpath(p: str):
        return jvm.org.apache.hadoop.fs.Path(p)

    fs = hpath(path).getFileSystem(hconf)
    if fs.exists(hpath(f"{path}/_spark_metadata")):
        raise ValueError(
            f"{path} is a structured-streaming file-sink output: its "
            "_spark_metadata log pins the exact file set, so rewriting "
            "files underneath it corrupts reads and the running "
            "stream's commit protocol. Compact individual partition "
            "directories the stream has finished writing, or move the "
            "data out of the sink's root first."
        )
    df = spark.read.parquet(path)
    total = sum(fs.getFileStatus(hpath(f)).getLen() for f in df.inputFiles())
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    tmp = f"{path}.compact.tmp"
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    old = f"{path}.compact.old"
    if not fs.rename(hpath(path), hpath(old)):
        raise OSError(f"compact_parquet: rename {path} -> {old} failed")
    if not fs.rename(hpath(tmp), hpath(path)):
        # roll back so the lake path is never left missing
        fs.rename(hpath(old), hpath(path))
        raise OSError(f"compact_parquet: rename {tmp} -> {path} failed")
    fs.delete(hpath(old), True)
    return len(spark.read.parquet(path).inputFiles())


def zorder_key(cols: list, bits: int = 16):
    """Z-order (Morton) key: interleave the low ``bits`` bits of each
    integer column into one long. Sorting by this key clusters rows
    that are close in EVERY dimension into the same parquet row groups,
    so min/max row-group stats stay tight for ALL interleaved columns
    at once — a linear sort gets tight stats only for its leading
    column. Built from shift/mask/sum terms (disjoint bit positions, so
    ``+`` is bitwise OR) — pure codegen arithmetic, no UDF.

    Columns must be non-negative integers; pre-map other types to an
    integer rank (e.g. ``F.unix_timestamp``, dictionary codes) first.
    """
    n = len(cols)
    if n * bits > 63:
        # position 63 is the long's sign bit and Java shifts wrap at 64
        # — past this the key silently scrambles the sort order
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} key bits; a signed "
            f"long holds 63. Lower bits (e.g. bits={63 // n}) or drop a "
            "column."
        )
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(c) if isinstance(c, str) else c, i)
            bit = bit.cast("long").bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * n + j))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Write parquet clustered by the Z-order of ``zorder_cols``: each
    column is min/max-normalized to the full ``bits`` range (without
    this, a narrow column's high interleave bits are constant zeros and
    the wide column silently dominates the sort — i.e. no Z at all),
    then a range repartition + in-partition sort on the Morton key
    clusters row groups so min/max stats stay tight on EVERY clustered
    column and point/range scans on any of them prune most of the lake
    (tests pin the stats-tightness win vs a linear sort).

    The normalization bounds cost one tiny min/max aggregate over the
    input — at 100 TB that's a column-pruned scan the write was going
    to do anyway, and the bounds can be cached per partition batch.

    ``bits`` is clamped so the interleaved key fits a signed long
    (n_cols * bits <= 63); precision beyond that adds nothing once the
    values are min/max-normalized anyway."""
    bits = min(bits, 63 // len(zorder_cols))
    hi = (1 << bits) - 1
    bounds = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in zorder_cols],
        *[F.max(c).alias(f"hi_{c}") for c in zorder_cols],
    ).first()
    if any(bounds[f"lo_{c}"] is None for c in zorder_cols):
        # empty input (or an all-NULL cluster column): there is nothing
        # to cluster — write the frame as-is instead of crashing on
        # None arithmetic below
        df.write.mode("overwrite").parquet(path)
        return
    scaled = []
    for c in zorder_cols:
        lo, span = bounds[f"lo_{c}"], bounds[f"hi_{c}"] - bounds[f"lo_{c}"]
        span = span if span else 1
        scaled.append(
            ((F.col(c) - F.lit(lo)) * hi / F.lit(span)).cast("long")
        )
    out = df.withColumn("__z", zorder_key(scaled, bits=bits))
    out = (
        out.repartitionByRange(n_files, "__z")
        if n_files
        else out.repartitionByRange("__z")
    )
    out.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)


# --------------------------------------------------------------------------
# ORC (built into Spark, no external package): the other columnar lake
# format a reference user migrating an existing Hive warehouse brings —
# same pushdown/pruning contract as parquet, verified in tests.
# --------------------------------------------------------------------------

def read_orc(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """ORC scan — predicate pushdown and column pruning reach the reader
    exactly like the parquet path (pinned by test_orc_roundtrip)."""
    if isinstance(paths, str):
        return spark.read.orc(paths)
    return spark.read.orc(*paths)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink with the same hive-style partition layout as
    :func:`write_parquet`."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


# --------------------------------------------------------------------------
# Raw-file ingestion (built into Spark): text lines and whole binary
# files — the front door for corpus text dumps and multimodal payloads
# BEFORE they have a schema. binaryFile is how image/audio/video bytes
# enter the engine at scale: one row per file, content as a binary
# column, partitioned by Spark's file bin-packing — no driver reads.
# --------------------------------------------------------------------------

def read_text(
    spark: SparkSession,
    paths: str | list[str],
    whole: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """Text scan: one row per line (default) or per file
    (``whole=True``), column ``value STRING``. ``line_sep`` overrides
    the newline splitter for record-separated dumps (e.g. NUL- or
    form-feed-delimited corpora)."""
    reader = spark.read
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    # wholetext goes through the typed text() kwarg, not option():
    # option() stringifies Python True to "True", which the text source
    # does not parse as a boolean
    return reader.text(
        paths if isinstance(paths, str) else list(paths), wholetext=whole
    )


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Whole-file binary scan via Spark's ``binaryFile`` source: one
    row per file with (path, modificationTime, length, content BINARY)
    — the ingestion edge for multimodal payloads (operators/
    multimodal.py decodes the ``content`` column). ``glob`` filters by
    pathGlobFilter (e.g. ``*.wav``) INSIDE the listing, so non-matching
    files are never opened. Spark bin-packs small files into read
    tasks; at 100 TB cap per-task memory with
    ``spark.sql.files.maxPartitionBytes`` since each row holds a whole
    file's bytes."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
