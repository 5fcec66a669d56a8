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
