"""Thrift compact-protocol reader unit tests, cross-checked against pyarrow."""

import glob

import pyarrow.parquet as pq
import pytest

from parquet_metadata_explorer_spark.parquet.footer import (
    leaf_columns,
    read_footer,
    schema_to_string,
)
from parquet_metadata_explorer_spark.parquet.thrift import (
    BytesReadable,
    CompactReader,
    ThriftError,
)

ALL_TABLES = sorted(glob.glob("/root/testdata/sf0.001/*.parquet"))


def test_varint_zigzag_roundtrip():
    # zigzag(0)=0, zigzag(-1)=1, zigzag(1)=2, ...
    r = CompactReader(BytesReadable(bytes([0x00, 0x01, 0x02, 0xAC, 0x02])))
    assert r.read_zigzag() == 0
    assert r.read_zigzag() == -1
    assert r.read_zigzag() == 1
    assert r.read_zigzag() == 150  # 0xAC 0x02 varint = 300 → zigzag 150


def test_eof_raises():
    r = CompactReader(BytesReadable(b"\x80"))  # continuation bit, no next byte
    with pytest.raises(ThriftError):
        r.read_varint()


@pytest.mark.parametrize("path", ALL_TABLES, ids=lambda p: p.split("/")[-1])
def test_footer_matches_pyarrow(path):
    meta, meta_len = read_footer(path)
    pf = pq.ParquetFile(path)
    pmd = pf.metadata
    assert meta.num_rows == pmd.num_rows
    assert len(meta.row_groups) == pmd.num_row_groups
    assert meta.created_by == pmd.created_by
    assert meta_len > 0
    for i, rg in enumerate(meta.row_groups):
        prg = pmd.row_group(i)
        assert rg.num_rows == prg.num_rows
        assert len(rg.columns) == prg.num_columns
        assert rg.total_byte_size == prg.total_byte_size
        for j, col in enumerate(rg.columns):
            pc = prg.column(j)
            assert col.total_compressed_size == pc.total_compressed_size
            assert col.total_uncompressed_size == pc.total_uncompressed_size
            assert ".".join(col.path_in_schema) == pc.path_in_schema
            assert col.data_page_offset == pc.data_page_offset
            assert col.dictionary_page_offset == pc.dictionary_page_offset
            assert col.num_values == pc.num_values
            if pc.statistics is not None and col.statistics is not None:
                if pc.statistics.has_null_count:
                    assert col.statistics.null_count == pc.statistics.null_count


@pytest.mark.parametrize("path", ALL_TABLES[:3], ids=lambda p: p.split("/")[-1])
def test_schema_string_format(path):
    meta, _ = read_footer(path)
    s = schema_to_string(meta)
    assert s.startswith("message ")
    assert s.endswith("}")
    # every leaf column appears in the printed schema
    for leaf in leaf_columns(meta):
        assert leaf.name in s


def test_leaf_columns_match_chunk_count():
    path = ALL_TABLES[0]
    meta, _ = read_footer(path)
    assert len(leaf_columns(meta)) == len(meta.row_groups[0].columns)


def test_head_magic_error_parity(tmp_path):
    """Reference ParquetUtils.scala:50-57: head-4 magic validated first,
    message renders the bytes Java Arrays.toString-style (signed)."""
    bad = tmp_path / "bad.parquet"
    bad.write_bytes(b"\xffARX" + b"\x00" * 20)
    with pytest.raises(ValueError, match=r"is invalid Parquet file, magic: \[-1, 65, 82, 88\]"):
        read_footer(str(bad))


def test_footer_eof_error_parity(tmp_path):
    """Reference ParquetUtils.scala:64-67: footer length > file size."""
    import struct as _struct

    bad = tmp_path / "eof.parquet"
    # valid head+tail magic, but the footer length claims 1000 bytes
    bad.write_bytes(b"PAR1" + b"\x00" * 4 + _struct.pack("<i", 1000) + b"PAR1")
    with pytest.raises(ValueError, match=r"EOF when reading Parquet metadata for .*file 16, metadata 1000"):
        read_footer(str(bad))


def _zz(v):
    """zigzag varint encode"""
    n = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def test_bloom_and_size_statistics_fields():
    """Wire-level decode of ColumnMetaData ids 14-16 (bloom filter
    location + SizeStatistics), crafted as compact-protocol bytes."""
    from parquet_metadata_explorer_spark.parquet.thrift import (
        BytesReadable,
        CompactReader,
        parse_column_chunk,
    )

    md = (
        bytes([0x15]) + _zz(1)          # 1: type INT32
        + bytes([0x46]) + _zz(100)      # 5: num_values
        + bytes([0x96]) + _zz(4096)     # 14: bloom_filter_offset
        + bytes([0x16]) + _zz(512)      # 15: bloom_filter_length
        + bytes([0x1C])                 # 16: SizeStatistics struct
        + bytes([0x16]) + _zz(7777)     #   1: unencoded_byte_array_data_bytes
        + bytes([0x19, 0x26]) + _zz(0) + _zz(100)   # 2: rep-level histogram [0, 100]
        + bytes([0x19, 0x26]) + _zz(5) + _zz(95)    # 3: def-level histogram [5, 95]
        + bytes([0x00])                 # stop SizeStatistics
        + bytes([0x00])                 # stop ColumnMetaData
    )
    chunk = bytes([0x26]) + _zz(1234) + bytes([0x1C]) + md + bytes([0x00])
    f = CompactReader(BytesReadable(chunk)).read_struct_generic()
    col = parse_column_chunk(f)
    assert col.file_offset == 1234
    assert col.num_values == 100
    assert col.bloom_filter_offset == 4096
    assert col.bloom_filter_length == 512
    assert col.unencoded_byte_array_data_bytes == 7777
    assert col.repetition_level_histogram == [0, 100]
    assert col.definition_level_histogram == [5, 95]


def test_column_level_extension_fields_null_on_plain_files(spark):
    """Files written without blooms/size-stats surface NULL extension
    fields end-to-end through the public column level."""
    import parquet_metadata_explorer_spark as pqx

    df = pqx.read_metadata(spark, ALL_TABLES[0], source="parquet", level="column")
    r = df.select(
        "bloom_filter_offset", "bloom_filter_length",
        "unencoded_byte_array_data_bytes",
        "repetition_level_histogram", "definition_level_histogram",
    ).first()
    assert all(v is None for v in r)
