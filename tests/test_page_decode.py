"""PLAIN decoder + dictionary-page decode operator.

The dictionary page of a column is PLAIN-encoded by construction, so its
decoded values must equal the column's distinct values — checked here
against pyarrow reading the same data."""

import struct

import pytest

from parquet_metadata_explorer_spark.parquet.decode import (
    decode_plain,
    decompress_page,
)

SF = "/root/testdata/sf0.001"


def test_decode_plain_fixed_width():
    data = struct.pack("<3i", 1, -2, 3)
    assert decode_plain(data, "INT32") == [1, -2, 3]
    data = struct.pack("<2q", 2**40, -5)
    assert decode_plain(data, "INT64") == [2**40, -5]
    data = struct.pack("<2d", 1.5, -0.25)
    assert decode_plain(data, "DOUBLE") == [1.5, -0.25]
    assert decode_plain(struct.pack("<2f", 1.0, 2.0), "FLOAT") == [1.0, 2.0]


def test_decode_plain_boolean_bitpacked():
    # 10 values: 1,0,1,1,0,0,0,1 | 1,0 -> bytes 0b10001101, 0b00000001
    data = bytes([0b10001101, 0b00000001])
    vals = decode_plain(data, "BOOLEAN", count=10)
    assert vals == [True, False, True, True, False, False, False, True, True, False]


def test_decode_plain_binary_and_flba():
    data = struct.pack("<I", 2) + b"ab" + struct.pack("<I", 0) + struct.pack("<I", 3) + b"xyz"
    assert decode_plain(data, "BINARY") == [b"ab", b"", b"xyz"]
    assert decode_plain(b"aabbcc", "FIXED_LEN_BYTE_ARRAY", type_length=2) == [
        b"aa", b"bb", b"cc"
    ]
    with pytest.raises(ValueError, match="type_length"):
        decode_plain(b"aa", "FIXED_LEN_BYTE_ARRAY")


def test_decompress_passthrough_and_snappy():
    assert decompress_page(b"abc", "UNCOMPRESSED") == b"abc"
    assert decompress_page(b"abc", None) == b"abc"
    import pyarrow as pa

    raw = b"hello world" * 10
    comp = pa.Codec("snappy").compress(raw).to_pybytes()
    assert decompress_page(comp, "SNAPPY", len(raw)) == raw


def test_dictionary_values_match_distinct(spark):
    import pyarrow.parquet as pq

    from parquet_metadata_explorer_spark.operators.page_decode import (
        dictionary_values,
    )

    df = dictionary_values(spark, f"{SF}/documents.parquet", columns=["lang", "source"])
    got = sorted((r.col_path, r.value) for r in df.select("col_path", "value").distinct().collect())
    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "source"])
    exp = sorted(
        [("lang", v) for v in set(t.column("lang").to_pylist())]
        + [("source", v) for v in set(t.column("source").to_pylist())]
    )
    assert got == exp


def test_dictionary_values_numeric(spark):
    import pyarrow.parquet as pq

    from parquet_metadata_explorer_spark.operators.page_decode import (
        dictionary_values,
    )

    df = dictionary_values(spark, f"{SF}/lineitem.parquet", columns=["l_quantity"])
    got = sorted(float(r.value) for r in df.collect())
    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_quantity"])
    assert got == sorted(set(t.column("l_quantity").to_pylist()))


def test_plain_data_page_values_required_column(spark, tmp_path):
    """A required no-dictionary column's DATA pages are pure PLAIN: the
    decoded values must reproduce the column exactly, in order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_metadata_explorer_spark.operators.page_decode import (
        plain_data_values,
    )

    vals = list(range(100))
    t = pa.table({"v": pa.array(vals, type=pa.int64())}).cast(
        pa.schema([pa.field("v", pa.int64(), nullable=False)])
    )
    f = str(tmp_path / "plain.parquet")
    pq.write_table(t, f, use_dictionary=False, compression="snappy")

    got = sorted(int(r.value) for r in plain_data_values(spark, f, columns=["v"]).collect())
    assert got == vals


def test_column_values_full_reconstruction(spark):
    """Every row of several flat columns rebuilt purely from page bytes
    must equal the data as pyarrow reads it — dictionary + RLE hybrid +
    def levels end to end."""
    import pyarrow.parquet as pq

    from parquet_metadata_explorer_spark.operators.page_decode import column_values

    f = f"{SF}/documents.parquet"
    out = column_values(spark, f, columns=["lang", "doc_id", "n_chars"]).collect()
    t = pq.read_table(f, columns=["lang", "doc_id", "n_chars"])
    by_col = {}
    for r in sorted(out, key=lambda r: (r.row_group_id, r.pos)):
        by_col.setdefault(r.col_path, []).append(r.value)
    assert by_col["lang"] == t.column("lang").to_pylist()
    assert [int(v) for v in by_col["doc_id"]] == t.column("doc_id").to_pylist()
    assert [int(v) for v in by_col["n_chars"]] == t.column("n_chars").to_pylist()


def test_column_values_nulls_and_multi_row_groups(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_metadata_explorer_spark.operators.page_decode import column_values

    vals = [None if i % 3 == 0 else i for i in range(1000)]
    t = pa.table({"n": pa.array(vals, type=pa.int64())})
    f = str(tmp_path / "n.parquet")
    pq.write_table(t, f, row_group_size=250)
    out = sorted(
        column_values(spark, f, columns=["n"]).collect(),
        key=lambda r: (r.row_group_id, r.pos),
    )
    got = [None if r.value is None else int(r.value) for r in out]
    assert got == vals


def _reconstruct_matches(spark, tbl, path, cols):
    from parquet_metadata_explorer_spark.operators.page_decode import column_values

    rows = column_values(spark, path).collect()
    by_col = {}
    for r in rows:
        by_col.setdefault(r.col_path, []).append((r.row_group_id, r.pos, r.value))
    for col in cols:
        want = [
            None if v is None else str(v) for v in tbl[col].to_pylist()
        ]
        got = [v for _, _, v in sorted(by_col.get(col, []))]
        assert got == want, f"{col}: {len(got)} vs {len(want)} rows"


def _delta_table():
    import pyarrow as pa
    import random

    rng = random.Random(11)
    n = 2000
    return pa.table(
        {
            "i32": pa.array(
                [rng.randrange(-(10**6), 10**6) for _ in range(n)], pa.int32()
            ),
            "i64": pa.array(
                [
                    rng.randrange(-(10**12), 10**12)
                    if rng.random() > 0.1
                    else None
                    for _ in range(n)
                ],
                pa.int64(),
            ),
            "s": pa.array(
                [
                    f"prefix_{i % 40}_{rng.randrange(999)}"
                    if rng.random() > 0.15
                    else None
                    for i in range(n)
                ],
                pa.string(),
            ),
        }
    )


def test_v2_pages_with_delta_encodings(spark, tmp_path):
    """DATA_PAGE_V2 layout: uncompressed bare-RLE level blocks before the
    compressed value region, DELTA_BINARY_PACKED ints and front-coded
    DELTA_BYTE_ARRAY strings, zstd codec."""
    import pyarrow.parquet as pq

    t = _delta_table()
    f = str(tmp_path / "v2delta.parquet")
    pq.write_table(
        t, f, data_page_version="2.0", use_dictionary=False,
        compression="zstd",
        column_encoding={
            "i32": "DELTA_BINARY_PACKED",
            "i64": "DELTA_BINARY_PACKED",
            "s": "DELTA_BYTE_ARRAY",
        },
    )
    _reconstruct_matches(spark, t, f, ["i32", "i64", "s"])


def test_v1_pages_with_delta_encodings(spark, tmp_path):
    import pyarrow.parquet as pq

    t = _delta_table()
    f = str(tmp_path / "v1delta.parquet")
    pq.write_table(
        t, f, data_page_version="1.0", use_dictionary=False,
        compression="snappy",
        column_encoding={
            "i32": "DELTA_BINARY_PACKED",
            "i64": "DELTA_BINARY_PACKED",
            "s": "DELTA_LENGTH_BYTE_ARRAY",
        },
    )
    _reconstruct_matches(spark, t, f, ["i32", "i64", "s"])


def test_v2_pages_dictionary_multi_row_group(spark, tmp_path):
    import pyarrow.parquet as pq

    t = _delta_table()
    f = str(tmp_path / "v2dict.parquet")
    pq.write_table(
        t, f, data_page_version="2.0", compression="snappy",
        row_group_size=500,
    )
    _reconstruct_matches(spark, t, f, ["i32", "i64", "s"])


def test_delta_binary_packed_unit():
    """Round-trip the raw decoder against pyarrow's writer output for
    hostile inputs: single value, exact miniblock multiples, negatives."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import io

    from parquet_metadata_explorer_spark.parquet.decode import (
        decode_data_page_v1,
    )
    from parquet_metadata_explorer_spark.parquet.pages import iter_pages

    for vals in (
        [42],
        list(range(128)),          # exactly one block of zero deltas
        [0, -(10**9), 10**9, -1, 1] * 100,
        list(range(0, 129 * 7, 7)),  # crosses a block boundary
    ):
        buf = io.BytesIO()
        pq.write_table(
            pa.table({"v": pa.array(vals, pa.int64())}), buf,
            use_dictionary=False, compression="none",
            column_encoding={"v": "DELTA_BINARY_PACKED"},
        )
        data = buf.getvalue()
        import tempfile, os

        with tempfile.NamedTemporaryFile(suffix=".parquet", delete=False) as fh:
            fh.write(data)
            fpath = fh.name
        try:
            pages = [
                p for p in iter_pages(fpath, size=len(data), page_content=True)
                if p[3] == "DATA_PAGE"
            ]
            assert pages
            got = []
            for p in pages:
                # pyarrow columns are nullable → v1 pages carry a def-level
                # block before the DELTA run; decode_data_page_v1 skips it
                got.extend(
                    decode_data_page_v1(
                        bytes(p[14]), p[9], None, True, "INT64",
                        encoding=p[10],
                    )
                )
            assert got == vals
        finally:
            os.unlink(fpath)


def test_byte_stream_split_floats(spark, tmp_path):
    """BYTE_STREAM_SPLIT byte-plane de-interleaving for float/double
    columns, both page versions."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import random

    rng = random.Random(5)
    t = pa.table(
        {
            "f": pa.array([rng.random() for _ in range(1500)], pa.float32()),
            "d": pa.array(
                [rng.random() * 1e6 if rng.random() > 0.2 else None for _ in range(1500)],
                pa.float64(),
            ),
        }
    )
    for ver in ("1.0", "2.0"):
        f = str(tmp_path / f"bss_{ver}.parquet")
        pq.write_table(
            t, f, data_page_version=ver, use_dictionary=False,
            compression="zstd",
            column_encoding={"f": "BYTE_STREAM_SPLIT", "d": "BYTE_STREAM_SPLIT"},
        )
        _reconstruct_matches(spark, t, f, ["f", "d"])

def test_delta_length_byte_array_edge_cases(spark, tmp_path):
    """DELTA_LENGTH_BYTE_ARRAY hostile inputs: empty strings (zero-length
    runs), all-empty column, multibyte UTF-8, a single-row table, and
    null interleaving — both page versions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cases = {
        "empties": (["", "a", "", "bb", ""] * 200, pa.string()),
        "all_empty": ([""] * 777, pa.string()),
        "unicode": (["héllo", "日本語テキスト", "", "𝔘𝔫𝔦", "é"] * 123, pa.string()),
        "single": (["only-value"], pa.string()),
        "nulls": (
            [None if i % 3 == 0 else f"v{i}" * (i % 5) for i in range(997)],
            pa.string(),
        ),
    }
    for ver in ("1.0", "2.0"):
        enc = "DELTA_LENGTH_BYTE_ARRAY" if ver == "1.0" else "DELTA_BYTE_ARRAY"
        for name, (vals, typ) in cases.items():
            t = pa.table({"s": pa.array(vals, typ)})
            f = str(tmp_path / f"dlba_{ver}_{name}.parquet")
            pq.write_table(
                t, f, data_page_version=ver, use_dictionary=False,
                compression="none", column_encoding={"s": enc},
            )
            _reconstruct_matches(spark, t, f, ["s"])


def test_dictionary_fallback_mid_chunk(spark, tmp_path):
    """Dictionary overflow mid-chunk: pyarrow writes RLE_DICTIONARY pages
    until dictionary_pagesize_limit, then falls back to PLAIN for the
    rest of the SAME column chunk — the per-page encoding dispatch must
    decode both regimes with one shared chunk dictionary."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = [f"val-{i:06d}-{'x' * 20}" for i in range(4000)]
    t = pa.table({"s": pa.array(vals), "n": pa.array(range(4000), pa.int64())})
    for ver in ("1.0", "2.0"):
        f = str(tmp_path / f"fallback_{ver}.parquet")
        pq.write_table(
            t, f, data_page_version=ver, use_dictionary=True,
            dictionary_pagesize_limit=2048, data_page_size=8192,
            compression="snappy", row_group_size=4000,
        )
        encs = pq.ParquetFile(f).metadata.row_group(0).column(0).encodings
        assert "PLAIN" in encs and "RLE_DICTIONARY" in encs, encs
        _reconstruct_matches(spark, t, f, ["s", "n"])
