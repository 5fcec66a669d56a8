"""format("metadata") registration tests (Python Data Source API)."""

import pytest

import parquet_metadata_explorer_spark as pqx
from parquet_metadata_explorer_spark import schemas


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    pqx.register(spark)


def test_format_file_level(spark, sf_dir):
    df = spark.read.format("metadata").load(sf_dir)
    assert df.schema == schemas.PARQUET_FILE_LEVEL  # parquet inferred from magic
    assert df.count() == 10  # one row per table file


def test_format_column_level(spark, sf_dir):
    df = (
        spark.read.format("metadata")
        .option("level", "column")
        .load(f"{sf_dir}/nation.parquet")
    )
    rows = df.collect()
    import pyarrow.parquet as pq

    expected = set(pq.ParquetFile(f"{sf_dir}/nation.parquet").schema_arrow.names)
    assert {r.path for r in rows} == expected


def test_format_explicit_file_source(spark, sf_dir):
    df = (
        spark.read.format("metadata")
        .option("source", "file")
        .load(f"{sf_dir}/nation.parquet")
    )
    assert df.schema == schemas.FILE_LEVEL
    assert df.count() == 1


def test_format_respects_maxparts(spark, sf_dir):
    df = (
        spark.read.format("metadata")
        .option("maxparts", "2")
        .option("level", "rowgroup")
        .load(sf_dir)
    )
    assert df.rdd.getNumPartitions() <= 2
