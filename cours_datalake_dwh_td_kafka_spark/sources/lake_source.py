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
materialize in Python. With ``option("pushdown", "true")``, =/> filters
push into pyarrow row-group pruning (opt-in — see
LakeDataSourceReader.pushFilters for the shared-DataFrame caveat);
otherwise Spark applies them post-scan and the lake's z-order/bucket
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
    def __init__(
        self,
        files: list[str],
        pushdown: bool = False,
        arrow_schema=None,
    ):
        self._files = files
        self._pushdown = pushdown
        self._pushed: list[tuple[str, str, object]] = []
        # declared snapshot schema (schema evolution): files committed
        # before a column existed are padded with NULLs at read time
        self._arrow_schema = arrow_schema

    def pushFilters(self, filters):
        """With option('pushdown', 'true'): consume EqualTo/GreaterThan
        on top-level columns — they translate 1:1 to pyarrow read
        filters, which prune parquet ROW GROUPS by footer min/max
        before any page decodes (the mechanism Spark's native scan
        uses, reached through the Python DataSource seam; pyarrow
        applies them exactly row-level, so consumed filters need no
        Spark re-evaluation).

        OFF by default, deliberately: the planning worker caches ONE
        reader per loaded DataFrame and re-plans it only when a query
        has pushable filters, so a filter consumed by query 1 would
        silently keep pruning a later filterless query on the SAME
        DataFrame object (verified empirically; neither pushFilters nor
        partitions is re-invoked for the later query). Enable it for
        the load-filter-once ETL pattern; leave it off for a shared
        DataFrame handle."""
        try:  # Filter classes exist only on PySpark >= 4.1
            from pyspark.sql.datasource import EqualTo, GreaterThan
        except ImportError:  # pragma: no cover
            yield from filters
            return
        if not self._pushdown:
            yield from filters
            return
        self._pushed = []
        for f in filters:
            op = (
                "=="
                if isinstance(f, EqualTo)
                else ">"
                if isinstance(f, GreaterThan)
                else None
            )
            if op is not None and len(f.attribute) == 1:
                self._pushed.append((f.attribute[0], op, f.value))
            else:
                yield f

    def partitions(self):
        return [_LakeFilePartition(f) for f in self._files]

    def read(self, partition):
        # executor-side: stream Arrow record batches straight off the
        # parquet file — the zero-copy path the API is designed around
        import pyarrow as pa
        import pyarrow.parquet as pq

        if self._pushed:
            # footer schema read ONLY on the pushdown path (the plain
            # scan must not pay a per-file metadata pass)
            file_cols = set(pq.read_schema(partition.file_path).names)
            if any(c not in file_cols for c, _, _ in self._pushed):
                # a CONSUMED filter referencing a column this
                # (pre-evolution) file lacks: every row reads NULL
                # there, so =/> is false for the whole file — emit
                # nothing (Spark will not re-apply consumed filters, so
                # dropping the filter instead would silently return
                # unfiltered rows)
                return
        table = pq.read_table(
            partition.file_path,
            filters=self._pushed or None,
        )
        if self._arrow_schema is not None:
            arrays = [
                table.column(f.name).cast(f.type)
                if f.name in table.column_names
                else pa.nulls(len(table), f.type)
                for f in self._arrow_schema
            ]
            table = pa.Table.from_arrays(arrays, schema=self._arrow_schema)
        yield from table.to_batches()


class LakeDataSource(DataSource):
    """``format("graftlake")``. Options:

    - ``path`` (required): lake table root;
    - ``version`` (optional): snapshot to read (default: latest);
    - ``pushdown`` (optional, default false): consume =/> filters into
      pyarrow row-group pruning — see
      :meth:`LakeDataSourceReader.pushFilters` for why this is opt-in.
    """

    @classmethod
    def name(cls) -> str:
        return "graftlake"

    def schema(self):
        # the manifest's DECLARED schema when present (schema evolution:
        # the snapshot's contract, not whatever one file happens to
        # carry); first-file arrow schema for pre-evolution manifests
        m = self._resolve_manifest()
        if "schema" in m:
            from pyspark.sql.types import StructType

            return StructType.fromJson(m["schema"])
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(pq.read_schema(self._resolve_files()[0]))

    def _resolve_manifest(self) -> dict:
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
        return m

    def _resolve_files(self) -> list[str]:
        import os

        path = self.options.get("path")
        return [
            os.path.join(path, f) for f in self._resolve_manifest()["files"]
        ]

    def reader(self, schema) -> LakeDataSourceReader:
        pushdown = self.options.get("pushdown", "false").lower() == "true"
        arrow_schema = None
        if "schema" in self._resolve_manifest():
            from pyspark.sql.pandas.types import to_arrow_schema

            arrow_schema = to_arrow_schema(schema)
        return LakeDataSourceReader(
            self._resolve_files(), pushdown, arrow_schema
        )


def register_lake_source(spark) -> bool:
    """Register ``graftlake`` on this session; returns False on
    PySpark < 4 (no Python DataSource API) instead of raising."""
    if not _HAS_DATASOURCE_API:
        return False
    try:
        # runtime-settable in Spark 4.1; reader init asserts it when a
        # pushFilters override is present
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:  # pragma: no cover - conf locked down
        pass
    spark.dataSource.register(LakeDataSource)
    return True
