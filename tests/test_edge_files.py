"""Edge-case files through every level: zero rows, many row groups,
uncompressed pages."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import parquet_metadata_explorer_spark as pqx


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge")
    # zero-row file with a real schema
    empty = pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.string())})
    pq.write_table(empty, str(d / "empty.parquet"))
    # many small row groups
    t = pa.table({"v": pa.array(range(1000), type=pa.int64())})
    pq.write_table(t, str(d / "many_rg.parquet"), row_group_size=100)
    # uncompressed
    pq.write_table(t, str(d / "uncomp.parquet"), compression="NONE")
    return str(d)


def test_zero_row_file_all_levels(spark, edge_dir):
    # pyarrow writes an empty table as ONE row group with 0 rows and
    # empty (but present) pages per column — the scan must mirror that
    f = f"{edge_dir}/empty.parquet"
    meta = pqx.read_metadata(spark, f, source="parquet", level="file").collect()[0]
    assert meta.num_rows == 0 and meta.num_row_groups == 1
    rgs = pqx.read_metadata(spark, f, level="rowgroup").collect()
    assert len(rgs) == 1 and rgs[0].num_rows == 0
    cols = pqx.read_metadata(spark, f, level="column").collect()
    assert len(cols) == 2 and all(c.num_values == 0 for c in cols)
    assert pqx.read_metadata(spark, f, level="page").count() == 2


def test_many_row_groups(spark, edge_dir):
    f = f"{edge_dir}/many_rg.parquet"
    rgs = pqx.read_metadata(spark, f, level="rowgroup").collect()
    assert len(rgs) == 10
    assert sum(r.num_rows for r in rgs) == 1000
    assert sorted(r.row_group_id for r in rgs) == list(range(10))
    pages = pqx.read_metadata(spark, f, level="page").collect()
    # every row group contributes at least one page for the single column
    assert len({p.row_group_id for p in pages}) == 10


def test_uncompressed_page_content(spark, edge_dir):
    f = f"{edge_dir}/uncomp.parquet"
    rows = (
        pqx.read_metadata(spark, f, level="page", pagecontent=True)
        .filter("page_type = 'DATA_PAGE'")
        .collect()
    )
    assert rows
    for r in rows:
        assert len(r.page_content) == r.page_compressed_size
        assert r.page_compressed_size == r.page_uncompressed_size  # NONE codec


def test_truncation_fuzz_footer_and_pages(tmp_path):
    """Byte-level truncation fuzz: a valid file cut at ANY length must
    make the footer parser and the page walk fail with a clean
    ValueError (ThriftError is one) or EOFError — never hang, never
    return silently-wrong metadata — or, for cuts that only remove page
    data the walk hasn't reached, fail on the read. Samples every
    truncation point on a small file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_metadata_explorer_spark.parquet.footer import read_footer
    from parquet_metadata_explorer_spark.parquet.pages import iter_pages

    f = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"a": list(range(200)), "b": [f"v{i}" for i in range(200)]}),
        f,
        compression="snappy",
        row_group_size=50,
    )
    data = open(f, "rb").read()
    full = len(data)
    ok_full = read_footer(f, full)
    assert ok_full[0].num_rows == 200

    cut_path = str(tmp_path / "cut.parquet")
    for cut in range(0, full, max(1, full // 160)):
        with open(cut_path, "wb") as fh:
            fh.write(data[:cut])
        try:
            meta, _ = read_footer(cut_path, cut)
            # footer decoded (cut inside page data only): the page walk
            # must then fail cleanly when it hits the missing bytes
            list(iter_pages(cut_path, size=cut, page_content=True, meta=meta))
        except (ValueError, EOFError, OSError):
            continue
        # reaching here means the truncated file parsed fully — only
        # possible if the cut removed nothing the reader touches, which
        # cannot happen for cut < full
        raise AssertionError(f"truncation at {cut}/{full} parsed cleanly")
