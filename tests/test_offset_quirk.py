"""S12 regression (reference ParquetUtils.scala:165-175): writers set the
thrift column-chunk file_offset past the dictionary page; the engine must
prefer dictionary_page_offset → data_page_offset → thrift value.

The arrow-written testdata exhibits the quirk naturally: thrift
file_offset != dictionary_page_offset for dictionary-encoded chunks."""

import pyspark.sql.functions as F

import parquet_metadata_explorer_spark as pqx
from parquet_metadata_explorer_spark.parquet.footer import read_footer


def test_testdata_exhibits_the_quirk():
    meta, _ = read_footer("/root/testdata/sf0.001/lineitem.parquet")
    col0 = meta.row_groups[0].columns[0]
    assert col0.dictionary_page_offset is not None
    # raw thrift offset disagrees with the true chunk start
    assert col0.file_offset != col0.dictionary_page_offset
    # corrected offset is the dictionary page
    assert col0.start_offset == col0.dictionary_page_offset


def test_all_levels_read_quirky_file(spark):
    path = "/root/testdata/sf0.001/lineitem.parquet"
    assert pqx.read_metadata(spark, path, source="parquet", level="file").count() == 1
    assert pqx.read_metadata(spark, path, level="rowgroup").count() >= 1
    cols = pqx.read_metadata(spark, path, level="column").collect()
    for c in cols:
        if c.dictionary_page_offset is not None:
            assert c.file_offset == c.dictionary_page_offset
        else:
            assert c.file_offset == c.data_page_offset
    # page walk starts at the corrected offset and satisfies the size
    # invariant (would raise/yield garbage from the raw thrift offset)
    pages = pqx.read_metadata(spark, path, level="page")
    assert pages.filter(F.col("page_type") == "DICTIONARY_PAGE").count() >= 1


def test_rowgroup_offset_is_first_column_start(spark):
    path = "/root/testdata/sf0.001/orders.parquet"
    rg = pqx.read_metadata(spark, path, level="rowgroup").collect()[0]
    cols = pqx.read_metadata(spark, path, level="column").collect()
    first = min(
        (c for c in cols if c.row_group_id == rg.row_group_id),
        key=lambda c: c.column_id,
    )
    assert rg.file_offset == first.file_offset
