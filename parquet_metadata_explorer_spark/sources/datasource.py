"""``spark.read.format("metadata")`` via the Spark 4.x Python Data Source API.

Direct analog of the reference's DataSource V1 ``RelationProvider``
registration under short name "metadata" (``DefaultSource.scala:12-23`` +
META-INF service file). Partition planning mirrors
``MetadataFileFormat.scala:50-58``: files are listed once at plan time and
chunked into ≤ ``maxparts`` input partitions; each partition parses its
files' footers/pages executor-side.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..listing import list_files
from ..options import LEVEL_FILE, SOURCE_FILE, parse_options, validate_source_level
from ..schemas import SCHEMAS_BY_LEVEL
from .api import _infer_source


class _FilesPartition(InputPartition):
    def __init__(self, files):
        self.files = files


class MetadataReader(DataSourceReader):
    def __init__(self, opts, files, source):
        self.opts = opts
        self.files = files
        self.source = source

    def partitions(self):
        n = max(1, min(len(self.files), self.opts.maxparts))
        chunks = [self.files[i::n] for i in range(n)]
        return [_FilesPartition(c) for c in chunks if c] or [_FilesPartition([])]

    def read(self, partition):
        from . import rows as R

        opts, source = self.opts, self.source
        for f in partition.files:
            if source == SOURCE_FILE:
                yield from R.file_rows(f)
            elif opts.level == LEVEL_FILE:
                yield from R.parquet_file_rows(f)
            elif opts.level == "rowgroup":
                yield from R.rowgroup_rows(f)
            elif opts.level == "column":
                yield from R.column_rows(f)
            else:
                yield from R.page_rows(f, opts.buffersize, opts.pagecontent)


class MetadataDataSource(DataSource):
    """Plan-time state (file listing, source inference) is computed once
    and shared between ``schema()`` and ``reader()`` — the listing of a
    10^5-file root should not run twice per load."""

    @classmethod
    def name(cls):
        return "metadata"

    def _plan(self):
        if not hasattr(self, "_planned"):
            opts = parse_options(dict(self.options))
            # The DataSource plan usually runs in a Python worker process
            # with no SparkSession; list_files then falls back to a driver
            # thread pool for wide roots so this path behaves like
            # read_metadata() (reference DefaultSource.scala:157-163 has a
            # single listing behavior for its one entry point).
            try:
                from pyspark.sql import SparkSession

                session = SparkSession.getActiveSession()
            except Exception:
                session = None
            files = list_files(opts.path, spark=session)
            source = opts.source or _infer_source(files)
            validate_source_level(source, opts.level)
            self._planned = (opts, files, source)
        return self._planned

    def schema(self):
        opts, _files, source = self._plan()
        return SCHEMAS_BY_LEVEL[(source, opts.level)]

    def reader(self, schema):
        return MetadataReader(*self._plan())
