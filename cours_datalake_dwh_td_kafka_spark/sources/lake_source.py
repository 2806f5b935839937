"""Spark 4 Python DataSource exposing the versioned lake (lake.py) as a
first-class reader: ``spark.read.format("graftlake").option("path", p)``
— with ``option("version", n)`` time travel — instead of resolving the
manifest by hand and passing a file list to the parquet reader.

Why a custom source and not just ``lake_read``: the DataSource API is
the idiomatic Spark-4 seam for exactly this kind of table format
(DataSourceReader.partitions() IS the manifest: one InputPartition per
committed data file, so Spark schedules one task per file and the
snapshot the reader resolves at plan time stays consistent no matter
how many commits land mid-scan — the same isolation argument as
lake_read, now enforced by the engine's own planning contract).

Scale notes: partitions() returns file-level splits (the lake writes
bounded-size files, so no further splitting is needed at this layer);
read() streams pyarrow RECORD BATCHES, the Arrow fast path — rows never
materialize in Python. Filters are accepted but not pushed (pushFilters
default): Spark applies them post-scan; the lake's z-order/bucket
levers (io.py) remain the pruning mechanism.
"""

from __future__ import annotations

from dataclasses import dataclass

try:  # pragma: no cover - exercised via the registered source
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    _HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - PySpark < 4
    _HAS_DATASOURCE_API = False

    class DataSource:  # type: ignore[no-redef]
        def __init__(self, options):
            self.options = options

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value


@dataclass
class _LakeFilePartition(InputPartition):
    """One committed data file = one scan task."""

    file_path: str


class LakeDataSourceReader(DataSourceReader):
    def __init__(self, files: list[str]):
        self._files = files

    def partitions(self):
        return [_LakeFilePartition(f) for f in self._files]

    def read(self, partition):
        # executor-side: stream Arrow record batches straight off the
        # parquet file — the zero-copy path the API is designed around
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file_path)
        yield from table.to_batches()


class LakeDataSource(DataSource):
    """``format("graftlake")``. Options:

    - ``path`` (required): lake table root;
    - ``version`` (optional): snapshot to read (default: latest).
    """

    @classmethod
    def name(cls) -> str:
        return "graftlake"

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        files = self._resolve_files()
        return from_arrow_schema(pq.read_schema(files[0]))

    def _resolve_files(self) -> list[str]:
        import os

        from cours_datalake_dwh_td_kafka_spark.lake import (
            _read_manifest,
            current_version,
        )

        path = self.options.get("path")
        if not path:
            raise ValueError("graftlake requires option('path', ...)")
        v = int(self.options.get("version", 0)) or current_version(path)
        if v < 1:
            raise ValueError(f"no committed version at {path}")
        m = _read_manifest(path, v)
        if not m["files"]:
            raise ValueError(f"version {v} of {path} is empty")
        return [os.path.join(path, f) for f in m["files"]]

    def reader(self, schema) -> LakeDataSourceReader:
        return LakeDataSourceReader(self._resolve_files())


def register_lake_source(spark) -> bool:
    """Register ``graftlake`` on this session; returns False on
    PySpark < 4 (no Python DataSource API) instead of raising."""
    if not _HAS_DATASOURCE_API:
        return False
    spark.dataSource.register(LakeDataSource)
    return True
