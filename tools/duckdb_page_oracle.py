"""DuckDB-SQL second implementation of the page-level scan.

Generates a single SELECT (recursive CTE) that walks every page header in
every column chunk by Thrift-compact-decoding the raw file bytes (hex via
read_blob), seeded only by parquet_metadata()'s chunk boundaries. This is
the independent oracle for ``meta_page`` / ``meta_encoding_report`` —
DuckDB has no page-level metadata function, so the oracle parses the
binary itself, sharing zero code with the engine's Thrift layer
(``parquet/thrift.py``). Reference scan being checked:
``MetadataFileFormat.scala:232-320``.

Run as a script to cross-check the SQL walk against the engine's
pure-Python ``iter_pages`` over any directory of parquet files.

Thrift compact protocol facts used (parquet PageHeader only ever contains
bool/i32/i64/binary/struct fields — no lists/maps/doubles in practice, but
i8/double/binary skipping is implemented anyway):
  - field header byte: (id_delta << 4) | wire_type; delta==0 => long form,
    field id follows as a zigzag varint
  - wire types: 1 BOOL_TRUE, 2 BOOL_FALSE (value inside the nibble),
    3 I8 (one raw byte), 4 I16, 5 I32, 6 I64 (zigzag varints), 7 DOUBLE
    (8 raw bytes), 8 BINARY (unsigned varint length + bytes), 12 STRUCT
    (nested fields then 0x00 stop)
  - struct end: 0x00 stop byte
"""

from __future__ import annotations


def _byte(p: str) -> str:
    """SQL: unsigned byte at 0-based file offset ``p`` (h = whole-file hex)."""
    return f"try_cast(('0x' || substr(h, ({p})*2+1, 2)) AS INTEGER)"


def _varint(p: str) -> tuple[str, str]:
    """(n_expr, v_expr): byte length and value of the unsigned LEB128
    varint at 0-based offset ``p``. Value exact for <=5 bytes (35 bits,
    every captured field is an i32); longer varints report NULL value but
    a correct length, so they can still be skipped."""
    bs = [f"({_byte(f'({p})+{i}')})" for i in range(10)]
    n_expr = (
        "(CASE "
        + " ".join(f"WHEN {bs[i]} < 128 THEN {i + 1}" for i in range(10))
        + " ELSE NULL END)"
    )
    parts = []
    for k in range(1, 6):
        term = " + ".join(f"(({bs[i]} & 127)::BIGINT << {7 * i})" for i in range(k))
        parts.append(f"WHEN {k} THEN {term}")
    v_expr = "(CASE " + n_expr + " " + " ".join(parts) + " ELSE NULL END)"
    return n_expr, v_expr


PAGE_TYPE_CASE = (
    "CASE o_pt WHEN 0 THEN 'DATA_PAGE' WHEN 1 THEN 'INDEX_PAGE' "
    "WHEN 2 THEN 'DICTIONARY_PAGE' WHEN 3 THEN 'DATA_PAGE_V2' "
    "ELSE 'UNKNOWN(' || o_pt || ')' END"
)

ENCODING_CASE = (
    "CASE o_enc WHEN 0 THEN 'PLAIN' WHEN 2 THEN 'PLAIN_DICTIONARY' "
    "WHEN 3 THEN 'RLE' WHEN 4 THEN 'BIT_PACKED' "
    "WHEN 5 THEN 'DELTA_BINARY_PACKED' WHEN 6 THEN 'DELTA_LENGTH_BYTE_ARRAY' "
    "WHEN 7 THEN 'DELTA_BYTE_ARRAY' WHEN 8 THEN 'RLE_DICTIONARY' "
    "WHEN 9 THEN 'BYTE_STREAM_SPLIT' ELSE 'UNKNOWN(' || o_enc || ')' END"
)


def page_walk_cte(glob: str) -> str:
    """WITH-clause body (recursive) defining ``pages``: one row per page
    with (file_name, rg_id, col_id, page_id, pt, enc as raw enum ints,
    header_start, header_size, comp, nv)."""
    fid_n, fid_v = _varint("pos+1")
    val_n, val_v = _varint("vstart")
    b0 = _byte("pos")
    return f"""
hexes AS (
  SELECT filename AS file_name, hex(content) AS h
  FROM read_blob('{glob}')
),
seeds AS (
  SELECT file_name, row_group_id::BIGINT AS rg_id, column_id::BIGINT AS col_id,
         coalesce(dictionary_page_offset, data_page_offset)::BIGINT AS chunk_start,
         total_compressed_size::BIGINT AS total
  FROM parquet_metadata('{glob}')
),
walk(file_name, rg_id, col_id, chunk_start, total, consumed, page_id,
     header_start, pos, stack, kind, pt, comp, nv, enc, emitted,
     o_page_id, o_header_start, o_header_size, o_comp, o_pt, o_nv, o_enc) AS (
  SELECT file_name, rg_id, col_id, chunk_start, total,
         0::BIGINT, 0::BIGINT, chunk_start, chunk_start,
         [0::BIGINT], NULL::BIGINT, NULL::BIGINT, NULL::BIGINT,
         NULL::BIGINT, NULL::BIGINT, false,
         NULL::BIGINT, NULL::BIGINT, NULL::BIGINT, NULL::BIGINT,
         NULL::BIGINT, NULL::BIGINT, NULL::BIGINT
  FROM seeds WHERE total > 0
  UNION ALL
  SELECT file_name, rg_id, col_id, chunk_start, total,
         CASE WHEN closing THEN consumed + hsz + comp ELSE consumed END,
         CASE WHEN closing THEN page_id + 1 ELSE page_id END,
         CASE WHEN closing THEN chunk_start + consumed + hsz + comp
              ELSE header_start END,
         CASE WHEN closing THEN chunk_start + consumed + hsz + comp
              WHEN b = 0 THEN pos + 1
              ELSE nxt END,
         CASE WHEN closing THEN [0::BIGINT]
              WHEN b = 0 THEN list_slice(stack, 1, len(stack) - 1)
              WHEN ftype = 12 THEN list_append(upd, 0::BIGINT)
              ELSE upd END,
         CASE WHEN closing THEN NULL
              WHEN ftype = 12 AND len(stack) = 1 THEN fid
              ELSE kind END,
         CASE WHEN closing THEN NULL
              WHEN is_i AND len(stack) = 1 AND fid = 1 THEN zz ELSE pt END,
         CASE WHEN closing THEN NULL
              WHEN is_i AND len(stack) = 1 AND fid = 3 THEN zz ELSE comp END,
         CASE WHEN closing THEN NULL
              WHEN is_i AND len(stack) = 2 AND fid = 1 AND kind IN (5, 7, 8)
                THEN zz ELSE nv END,
         CASE WHEN closing THEN NULL
              WHEN is_i AND len(stack) = 2 AND fid = 2 AND kind IN (5, 7) THEN zz
              WHEN is_i AND len(stack) = 2 AND fid = 4 AND kind = 8 THEN zz
              ELSE enc END,
         closing,
         CASE WHEN closing THEN page_id ELSE NULL END,
         CASE WHEN closing THEN header_start ELSE NULL END,
         CASE WHEN closing THEN hsz ELSE NULL END,
         CASE WHEN closing THEN comp ELSE NULL END,
         CASE WHEN closing THEN pt ELSE NULL END,
         CASE WHEN closing THEN nv ELSE NULL END,
         CASE WHEN closing THEN enc ELSE NULL END
  FROM (
    SELECT *,
      (b = 0 AND len(stack) = 1) AS closing,
      (pos - header_start + 1) AS hsz,
      {val_n} AS vn, {val_v} AS vv,
      (ftype IN (4, 5, 6)) AS is_i,
      CASE WHEN ftype IN (4, 5, 6) THEN xor(vv >> 1, -(vv & 1))
           ELSE NULL END AS zz,
      CASE
        WHEN ftype IN (1, 2) THEN vstart
        WHEN ftype = 3 THEN vstart + 1
        WHEN ftype IN (4, 5, 6) THEN vstart + vn
        WHEN ftype = 7 THEN vstart + 8
        WHEN ftype = 8 THEN vstart + vn + vv
        WHEN ftype = 12 THEN vstart
        ELSE NULL END AS nxt
    FROM (
      SELECT *,
        CASE WHEN delta = 0 THEN xor(({fid_v}) >> 1, -(({fid_v}) & 1))
             ELSE stack[len(stack)] + delta END AS fid,
        CASE WHEN delta = 0 THEN pos + 1 + ({fid_n}) ELSE pos + 1 END AS vstart,
        list_append(
          list_slice(stack, 1, len(stack) - 1),
          CASE WHEN delta = 0 THEN xor(({fid_v}) >> 1, -(({fid_v}) & 1))
               ELSE stack[len(stack)] + delta END
        ) AS upd
      FROM (
        SELECT w.*, hx.h, {b0} AS b, ({b0}) >> 4 AS delta, ({b0}) & 15 AS ftype
        FROM walk w JOIN hexes hx USING (file_name)
        WHERE w.consumed < w.total
      )
    )
  )
),
pages AS (
  SELECT file_name, rg_id, col_id, o_page_id AS page_id,
         o_pt, o_enc, o_header_start AS header_start,
         o_header_size AS header_size, o_comp AS comp, o_nv AS nv
  FROM walk WHERE emitted
)"""


def page_oracle_sql(glob: str) -> str:
    return f"""
WITH RECURSIVE {page_walk_cte(glob)}
SELECT regexp_extract(file_name, '[^/]+$') AS filename,
       rg_id AS row_group_id, col_id AS column_id, page_id,
       {PAGE_TYPE_CASE} AS page_type,
       header_start AS page_header_offset,
       header_size AS page_header_size,
       comp AS page_compressed_size,
       nv AS num_values,
       CASE WHEN o_enc IS NULL THEN NULL ELSE {ENCODING_CASE} END AS encoding
FROM pages
ORDER BY filename, row_group_id, column_id, page_id
"""


def encoding_report_oracle_sql(glob: str) -> str:
    """DuckDB twin of ``reports.dict_encoding_report`` (minus the
    example-file list): classifies every column chunk from the ACTUAL
    pages the SQL walk decodes — dictionary page present + all data pages
    dictionary-encoded => 'dict'; dict page but a PLAIN fallback data page
    => 'dict_overflow'; no dict page => 'plain'. The engine classifies
    from the footer's encoding_stats (field id 13); a truthful writer
    makes the two identical, which is exactly what the oracle verifies.
    ``n_unknown`` (writer emitted no encoding_stats) is 0 for any corpus
    this oracle is pointed at — asserted by the pytest cross-check."""
    return f"""
WITH RECURSIVE {page_walk_cte(glob)},
chunk_cls AS (
  SELECT file_name, rg_id, col_id,
         bool_or(o_pt = 2) AS has_dict,
         coalesce(
           bool_and(CASE WHEN o_pt IN (0, 3) THEN o_enc IN (2, 8) END),
           true) AS data_dict
  FROM pages
  GROUP BY 1, 2, 3
),
cls AS (
  SELECT replace(m.path_in_schema, ', ', '.') AS path,
         CASE WHEN c.has_dict AND c.data_dict THEN 'dict'
              WHEN c.has_dict THEN 'dict_overflow'
              ELSE 'plain' END AS status
  FROM parquet_metadata('{glob}') m
  JOIN chunk_cls c
    ON m.file_name = c.file_name
   AND m.row_group_id = c.rg_id AND m.column_id = c.col_id
)
SELECT path,
       count(*)::BIGINT AS n_chunks,
       sum((status = 'dict')::INT)::BIGINT AS n_dict,
       sum((status = 'dict_overflow')::INT)::BIGINT AS n_overflow,
       sum((status = 'plain')::INT)::BIGINT AS n_plain,
       0::BIGINT AS n_unknown
FROM cls
GROUP BY path
ORDER BY path
"""


if __name__ == "__main__":
    import glob as globmod
    import sys

    import duckdb

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    got = con.execute(page_oracle_sql(f"{sf}/*.parquet")).fetchdf()

    # expected: the engine's own pure-Python page walk
    sys.path.insert(0, "/root/repo")
    from parquet_metadata_explorer_spark.parquet.pages import iter_pages

    import os

    rows = []
    for path in sorted(globmod.glob(f"{sf}/*.parquet")):
        size = os.path.getsize(path)
        for t in iter_pages(path, size=size):
            (rg, col, pid, ptype, hoff, hsz, csz, usz, crc, nv, enc, de, re_,
             stats, content) = t
            rows.append((os.path.basename(path), rg, col, pid, ptype, hoff,
                         hsz, csz, nv, enc))
    import pandas as pd

    exp = pd.DataFrame(rows, columns=[
        "filename", "row_group_id", "column_id", "page_id", "page_type",
        "page_header_offset", "page_header_size", "page_compressed_size",
        "num_values", "encoding"]).sort_values(
        ["filename", "row_group_id", "column_id", "page_id"]
    ).reset_index(drop=True)
    got = got.sort_values(
        ["filename", "row_group_id", "column_id", "page_id"]
    ).reset_index(drop=True)
    for c in ("row_group_id", "column_id", "page_id", "page_header_offset",
              "page_header_size", "page_compressed_size", "num_values"):
        exp[c] = exp[c].astype("Int64")
        got[c] = got[c].astype("Int64")
    print("sql rows:", len(got), " python rows:", len(exp))
    if got.equals(exp):
        print("MATCH")
    else:
        diff = got.compare(exp) if len(got) == len(exp) else None
        print("MISMATCH")
        print(got.head(20).to_string())
        print(exp.head(20).to_string())
        if diff is not None:
            print(diff.head(40).to_string())


def integrity_oracle_sql(glob: str) -> str:
    """DuckDB twin of ``reports.page_integrity_report`` (filename + count
    columns): per-file page counts from the independent SQL page walk.
    DuckDB has no CRC-32 function and the corpora this oracle points at
    are pyarrow-written WITHOUT page checksums, so ``n_with_crc`` /
    ``n_crc_mismatch`` are pinned to 0 here — the engine must agree,
    which verifies it does NOT hallucinate checksums on checksum-less
    files; the positive paths (clean checksummed file, detected
    corruption) are covered by the fixture tests in
    tests/test_reports.py."""
    return f"""
WITH RECURSIVE {page_walk_cte(glob)}
SELECT regexp_extract(file_name, '[^/]+$') AS filename,
       count(*)::BIGINT AS n_pages,
       0::BIGINT AS n_with_crc,
       0::BIGINT AS n_crc_mismatch
FROM pages
GROUP BY 1
ORDER BY 1
"""
