"""Fixed per-level output schemas.

Parity target: reference ``MetadataLevel.scala:15-105`` (five static
StructTypes; schemas are fixed, never inferred). Column names, order and
types mirror the reference exactly, with one recorded deviation:
``page_content`` is ``BinaryType`` here instead of ``ArrayType(ByteType)``
(``MetadataLevel.scala:102``) — ``bytes`` is the idiomatic PySpark binary
representation and avoids a per-byte boxing blowup at scale.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# statistics struct shared by column and page levels
# (reference MetadataLevel.scala:58-68, 91-100)
STATISTICS_TYPE = StructType(
    [
        StructField("null_count", LongType()),
        StructField("distinct_count", LongType()),
        StructField("min", BinaryType()),
        StructField("max", BinaryType()),
        StructField("min_value", BinaryType()),
        StructField("max_value", BinaryType()),
    ]
)

# FileLevel (MetadataLevel.scala:15-23)
FILE_LEVEL = StructType(
    [
        StructField("filepath", StringType()),
        StructField("filename", StringType()),
        StructField("size", LongType()),
        StructField("mtime", LongType()),
        StructField("partition", MapType(StringType(), StringType())),
    ]
)

# ParquetFileLevel = FileLevel + parquet footer summary
# (MetadataLevel.scala:25-34; prefix-compatible column order preserved)
PARQUET_FILE_LEVEL = StructType(
    FILE_LEVEL.fields
    + [
        StructField("metadata_size", LongType()),
        StructField("schema", StringType()),
        StructField("num_rows", LongType()),
        StructField("num_row_groups", IntegerType()),
        StructField("created_by", StringType()),
        StructField("key_value_metadata", MapType(StringType(), StringType(), True)),
    ]
)

# ParquetRowGroupLevel (MetadataLevel.scala:36-46)
PARQUET_ROWGROUP_LEVEL = StructType(
    [
        StructField("row_group_id", IntegerType()),
        StructField("file_offset", LongType()),
        StructField("total_compressed_size", LongType()),
        StructField("total_uncompressed_size", LongType()),
        StructField("num_rows", LongType()),
        StructField("num_columns", IntegerType()),
        StructField("filepath", StringType()),
        # extension (parquet-format RowGroup id 4): declared sort order
        StructField(
            "sorting_columns",
            ArrayType(
                StructType(
                    [
                        StructField("column_idx", IntegerType()),
                        StructField("descending", BooleanType()),
                        StructField("nulls_first", BooleanType()),
                    ]
                )
            ),
        ),
    ]
)

# ParquetColumnLevel (MetadataLevel.scala:48-77). The reference's columns
# are an exact prefix; the fields after ``filepath`` are a recorded
# extension (parquet-format ColumnMetaData ids 14-16: bloom-filter
# location and SizeStatistics) the reference predates — always NULL for
# files whose writer didn't emit them.
PARQUET_COLUMN_LEVEL = StructType(
    [
        StructField("row_group_id", IntegerType()),
        StructField("column_id", IntegerType()),
        StructField("file_offset", LongType()),
        StructField("total_compressed_size", LongType()),
        StructField("total_uncompressed_size", LongType()),
        StructField("path", StringType()),
        StructField("type", StringType()),
        StructField("encodings", ArrayType(StringType())),
        StructField("compression", StringType()),
        StructField("num_values", LongType()),
        StructField("statistics", STATISTICS_TYPE),
        StructField("data_page_offset", LongType()),
        StructField("dictionary_page_offset", LongType()),
        StructField("index_page_offset", LongType()),
        StructField("offset_index_offset", LongType()),
        StructField("offset_index_length", IntegerType()),
        StructField("column_index_offset", LongType()),
        StructField("column_index_length", IntegerType()),
        StructField("filepath", StringType()),
        StructField("bloom_filter_offset", LongType()),
        StructField("bloom_filter_length", IntegerType()),
        StructField("unencoded_byte_array_data_bytes", LongType()),
        StructField("repetition_level_histogram", ArrayType(LongType())),
        StructField("definition_level_histogram", ArrayType(LongType())),
        # extension (ColumnMetaData id 13): per-page-type encoding counts —
        # the "is this chunk fully dict-encoded?" signal
        StructField(
            "encoding_stats",
            ArrayType(
                StructType(
                    [
                        StructField("page_type", StringType()),
                        StructField("encoding", StringType()),
                        StructField("count", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)

# ParquetPageLevel (MetadataLevel.scala:79-105)
PARQUET_PAGE_LEVEL = StructType(
    [
        StructField("row_group_id", IntegerType()),
        StructField("column_id", IntegerType()),
        StructField("page_id", IntegerType()),
        StructField("page_type", StringType()),
        StructField("page_header_offset", LongType()),
        StructField("page_header_size", IntegerType()),
        StructField("page_compressed_size", IntegerType()),
        StructField("page_uncompressed_size", IntegerType()),
        StructField("crc", IntegerType()),
        StructField("num_values", IntegerType()),
        StructField("encoding", StringType()),
        StructField("definition_level_encoding", StringType()),
        StructField("repetition_level_encoding", StringType()),
        StructField("statistics", STATISTICS_TYPE),
        StructField("page_content", BinaryType()),
        StructField("filepath", StringType()),
    ]
)

SCHEMAS_BY_LEVEL = {
    ("file", "file"): FILE_LEVEL,
    ("parquet", "file"): PARQUET_FILE_LEVEL,
    ("parquet", "rowgroup"): PARQUET_ROWGROUP_LEVEL,
    ("parquet", "column"): PARQUET_COLUMN_LEVEL,
    ("parquet", "page"): PARQUET_PAGE_LEVEL,
}
