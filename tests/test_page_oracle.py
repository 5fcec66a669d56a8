"""Cross-implementation check of the page-level scan: the engine's
pure-Python Thrift walk (parquet/thrift.py + parquet/pages.py) vs the
DuckDB-SQL Thrift parser (tools/duckdb_page_oracle.py). The two share no
code — the SQL side decodes the compact protocol from hex bytes inside a
recursive CTE — so agreement here is genuine double-entry bookkeeping
for the reference's hardest scan (MetadataFileFormat.scala:232-320)."""

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_metadata_explorer_spark.parquet.footer import read_footer
from parquet_metadata_explorer_spark.parquet.pages import iter_pages
from tools.duckdb_page_oracle import (
    encoding_report_oracle_sql,
    page_oracle_sql,
)

COLS = [
    "filename", "row_group_id", "column_id", "page_id", "page_type",
    "page_header_offset", "page_header_size", "page_compressed_size",
    "num_values", "encoding",
]
KEY = ["filename", "row_group_id", "column_id", "page_id"]


def _python_pages(directory: str) -> pd.DataFrame:
    rows = []
    for name in sorted(os.listdir(directory)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(directory, name)
        for t in iter_pages(path, size=os.path.getsize(path)):
            (rg, col, pid, ptype, hoff, hsz, csz, _usz, _crc, nv, enc,
             *_rest) = t
            rows.append((name, rg, col, pid, ptype, hoff, hsz, csz, nv, enc))
    return pd.DataFrame(rows, columns=COLS)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[COLS].sort_values(KEY).reset_index(drop=True)
    for c in COLS:
        if c not in ("page_type", "encoding", "filename"):
            df[c] = df[c].astype("Int64")
    return df


def _assert_sql_matches_python(directory: str):
    got = _normalize(
        duckdb.connect().execute(
            page_oracle_sql(f"{directory}/*.parquet")
        ).fetchdf()
    )
    exp = _normalize(_python_pages(directory))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp)


def test_sql_walk_matches_python_walk_testdata():
    _assert_sql_matches_python("/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    """Writer matrix: v1/v2 pages, dict/no-dict, delta + byte-stream-split
    encodings, gzip/zstd/uncompressed, nulls, repeated (list) columns, and
    a legacy 1.0 writer with page-header statistics."""
    import numpy as np

    d = str(tmp_path_factory.mktemp("edge"))
    rng = np.random.default_rng(0)
    n = 5000
    t = pa.table({
        "i": pa.array(rng.integers(0, 10**12, n)),
        "f": pa.array(rng.random(n), type=pa.float32()),
        "s": pa.array([f"str-{i % 97}" for i in range(n)]),
        "b": pa.array([None if i % 7 == 0 else bool(i % 3) for i in range(n)]),
        "lst": pa.array([[float(j) for j in range(i % 5)] for i in range(n)]),
    })
    pq.write_table(t, f"{d}/v2.parquet", data_page_version="2.0",
                   data_page_size=2048, row_group_size=2000)
    pq.write_table(t, f"{d}/v1_nodict.parquet", use_dictionary=False,
                   data_page_size=2048)
    pq.write_table(t, f"{d}/gzip.parquet", compression="gzip",
                   data_page_size=4096)
    pq.write_table(t, f"{d}/zstd_bss.parquet", compression="zstd",
                   use_byte_stream_split=["f"], use_dictionary=False)
    pq.write_table(t, f"{d}/delta.parquet", use_dictionary=False,
                   column_encoding={"i": "DELTA_BINARY_PACKED",
                                    "s": "DELTA_BYTE_ARRAY"})
    pq.write_table(t, f"{d}/uncomp.parquet", compression="none")
    pq.write_table(t, f"{d}/legacy.parquet", version="1.0",
                   write_statistics=True, data_page_size=2048)
    # dictionary overflow: tiny dict page limit forces PLAIN fallback pages
    pq.write_table(
        pa.table({"s": pa.array([f"u-{i}" for i in range(20000)])}),
        f"{d}/overflow.parquet", dictionary_pagesize_limit=1024,
        data_page_size=2048,
    )
    return d


def test_sql_walk_matches_python_walk_edge_files(edge_dir):
    _assert_sql_matches_python(edge_dir)


def test_sql_encoding_report_matches_encoding_stats(edge_dir):
    """The SQL report classifies from decoded pages; re-derive the same
    classification from footer encoding_stats (what the engine uses) and
    require exact agreement — including a real dict_overflow file."""
    got = duckdb.connect().execute(
        encoding_report_oracle_sql(f"{edge_dir}/*.parquet")
    ).fetchdf().sort_values("path").reset_index(drop=True)

    cls: dict[str, list] = {}
    for name in sorted(os.listdir(edge_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(edge_dir, name)
        meta, _ = read_footer(path, os.path.getsize(path))
        for rg in meta.row_groups:
            for colmeta in rg.columns:
                p = ".".join(x for x in colmeta.path_in_schema if x)
                es = colmeta.encoding_stats
                if es is None:
                    status = "unknown"
                else:
                    from parquet_metadata_explorer_spark.parquet.thrift import (
                        ENCODINGS,
                        PAGE_TYPES,
                    )

                    named = [(PAGE_TYPES.get(pt), ENCODINGS.get(e), c)
                             for pt, e, c in es]
                    has_dict = any(pt == "DICTIONARY_PAGE" for pt, _, _ in named)
                    data_dict = all(
                        e in ("RLE_DICTIONARY", "PLAIN_DICTIONARY")
                        for pt, e, _ in named
                        if pt in ("DATA_PAGE", "DATA_PAGE_V2")
                    )
                    status = ("dict" if has_dict and data_dict
                              else "dict_overflow" if has_dict else "plain")
                cls.setdefault(p, []).append(status)

    exp = pd.DataFrame(
        [
            (p, len(v), v.count("dict"), v.count("dict_overflow"),
             v.count("plain"), v.count("unknown"))
            for p, v in sorted(cls.items())
        ],
        columns=["path", "n_chunks", "n_dict", "n_overflow", "n_plain",
                 "n_unknown"],
    )
    for c in exp.columns[1:]:
        exp[c] = exp[c].astype("int64")
        got[c] = got[c].astype("int64")
    assert (got["n_overflow"].sum()) > 0  # the overflow file really overflowed
    pd.testing.assert_frame_equal(got, exp)
