"""Page-index (ColumnIndex/OffsetIndex) decode, cross-checked against the
independent page-header scan: every OffsetIndex location must equal the
scanned page_header_offset, and its size must equal header+data."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import parquet_metadata_explorer_spark as pqx


@pytest.fixture(scope="module")
def indexed_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("pidx")
    t = pa.table(
        {
            "v": pa.array(list(range(5000)), type=pa.int64()),
            "s": pa.array([f"s{i % 97}" for i in range(5000)]),
            "n": pa.array([None if i % 7 == 0 else i for i in range(5000)], type=pa.int64()),
        }
    )
    f = str(d / "indexed.parquet")
    pq.write_table(t, f, row_group_size=1000, data_page_size=4096, write_page_index=True)
    return f


def test_offset_index_matches_page_scan(spark, indexed_file):
    idx = pqx.read_page_index(spark, indexed_file).collect()
    assert idx, "writer should have emitted page indexes"
    pages = (
        pqx.read_metadata(spark, indexed_file, level="page")
        .filter("page_type = 'DATA_PAGE'")
        .collect()
    )
    scan = {
        (p.row_group_id, p.column_id, p.page_header_offset): p.page_header_size
        + p.page_compressed_size
        for p in pages
    }
    assert len(idx) == len(pages)  # one index entry per data page
    for r in idx:
        key = (r.row_group_id, r.column_id, r.offset)
        assert key in scan, f"index location {key} not found by page scan"
        assert r.compressed_page_size == scan[key]


def test_column_index_statistics(spark, indexed_file):
    import struct

    rows = [
        r
        for r in pqx.read_page_index(spark, indexed_file).collect()
        if r.column_id == 0
    ]
    assert rows
    for r in rows:
        assert r.null_page is False
        lo = struct.unpack("<q", bytes(r.min_value))[0]
        hi = struct.unpack("<q", bytes(r.max_value))[0]
        # pages of a sorted int64 column: min == first_row_index value
        assert lo == r.first_row_index + 1000 * r.row_group_id
        assert lo <= hi
    # the nullable column records per-page null counts
    nul = [
        r
        for r in pqx.read_page_index(spark, indexed_file).collect()
        if r.column_id == 2
    ]
    assert sum(r.null_count for r in nul) == sum(1 for i in range(5000) if i % 7 == 0)


def test_page_index_absent_is_empty(spark):
    out = pqx.read_page_index(spark, "/root/testdata/sf0.001/nation.parquet")
    assert out.count() == 0
