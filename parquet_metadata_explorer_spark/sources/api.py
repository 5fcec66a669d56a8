"""Functional entry point: ``read_metadata(spark, path, ...)``.

The portable core (works on any Spark with an RDD API); the
``format("metadata")`` registration in ``datasource.py`` is a thin shell
over the same emitters.

Execution model (reference ``MetadataFileFormat.scala:50-58``): list files
on the driver (distributed listing kicks in for very wide roots), then
``parallelize(files, min(n_files, maxparts))`` and flatMap the level's row
emitter on executors. No shuffle anywhere in the source; downstream
relational work is ordinary Catalyst.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..listing import list_files
from ..options import (
    LEVEL_FILE,
    SOURCE_FILE,
    SOURCE_PARQUET,
    MetadataOptions,
    parse_options,
    validate_source_level,
)
from ..parquet.footer import is_parquet_file
from ..schemas import SCHEMAS_BY_LEVEL
from . import rows as R


def _infer_source(files) -> str:
    """Sniff the first listed file's magic (reference DefaultSource.scala:69-81)."""
    if not files:
        return SOURCE_FILE
    return SOURCE_PARQUET if is_parquet_file(files[0].path) else SOURCE_FILE


def build_metadata_df(spark: SparkSession, opts: MetadataOptions) -> DataFrame:
    files = list_files(opts.path, spark=spark)
    source = opts.source or _infer_source(files)
    validate_source_level(source, opts.level)
    schema = SCHEMAS_BY_LEVEL[(source, opts.level)]

    if not files:
        return spark.createDataFrame([], schema)

    num_slices = max(1, min(len(files), opts.maxparts))
    rdd = spark.sparkContext.parallelize(files, num_slices)

    if source == SOURCE_FILE:
        out = rdd.flatMap(R.file_rows)
    elif opts.level == LEVEL_FILE:
        out = rdd.flatMap(R.parquet_file_rows)
    elif opts.level == "rowgroup":
        out = rdd.flatMap(R.rowgroup_rows)
    elif opts.level == "column":
        out = rdd.flatMap(R.column_rows)
    else:  # page
        bufsize, content = opts.buffersize, opts.pagecontent
        out = rdd.flatMap(lambda f: R.page_rows(f, bufsize, content))

    return spark.createDataFrame(out, schema)


def read_metadata(
    spark: SparkSession,
    path: str,
    source: Optional[str] = None,
    level: str = LEVEL_FILE,
    maxparts: Optional[int] = None,
    buffersize: Optional[int] = None,
    pagecontent: Optional[bool] = None,
) -> DataFrame:
    """Load file / parquet metadata as a DataFrame.

    Mirrors ``spark.read.format("metadata")`` options
    (reference README.md:17-38): ``source`` in {file, parquet} (inferred
    from magic bytes when omitted), ``level`` in
    {file, rowgroup, column, page}, ``maxparts`` caps scan parallelism,
    ``buffersize`` sizes the page-scan read buffer, ``pagecontent``
    materializes raw page bytes.
    """
    params: dict = {"path": path, "level": level}
    if source is not None:
        params["source"] = source
    if maxparts is not None:
        params["maxparts"] = str(maxparts)
    if buffersize is not None:
        params["buffersize"] = str(buffersize)
    if pagecontent is not None:
        params["pagecontent"] = str(pagecontent)
    return build_metadata_df(spark, parse_options(params))
