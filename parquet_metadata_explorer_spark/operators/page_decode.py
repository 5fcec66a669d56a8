"""Distributed PLAIN page decoding over the page-level metadata scan.

Goes one step past the reference's raw ``page_content`` bytes
(``MetadataFileFormat.scala:232-320``): joins the page scan to the
column scan for type/codec context and decodes DICTIONARY pages back
into values. A parquet dictionary page is always pure PLAIN-encoded —
no rep/def level blocks — so its decoded values are exactly the
column's per-row-group dictionary, i.e. a superset-free list of the
distinct values the writer saw. That gives the operator an independent
oracle: distinct decoded values == ``SELECT DISTINCT col`` on the data.

Scale shape: the page scan parallelizes over files (no shuffle); the
column-context side of the join is metadata-sized (rows = row groups ×
columns), so it broadcasts. Decode itself is one ``pyarrow.Codec``
decompress + one ``struct.unpack`` per page inside ``mapInPandas`` —
Arrow-batched, never per-row Python.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.api import read_metadata


def _canon(v, physical_type: str) -> str:
    if physical_type == "BINARY":
        return v.decode("utf-8", errors="replace")
    if physical_type in ("FIXED_LEN_BYTE_ARRAY", "INT96"):
        return v.hex()
    if physical_type == "BOOLEAN":
        return "true" if v else "false"
    return str(v)


def _decoded_pages(
    spark: SparkSession,
    path: str,
    page_predicate,
    columns: Optional[list] = None,
) -> DataFrame:
    """Shared scan→join→decode pipeline: page rows passing
    ``page_predicate`` are joined to broadcast column context and their
    content PLAIN-decoded inside ``mapInPandas``."""
    import pandas as pd

    pages = read_metadata(spark, path, source="parquet", level="page", pagecontent=True)
    pages = pages.filter(page_predicate).select(
        "filepath",
        "row_group_id",
        "column_id",
        "num_values",
        "page_uncompressed_size",
        "page_content",
    )
    cols = read_metadata(spark, path, source="parquet", level="column").select(
        "filepath",
        "row_group_id",
        "column_id",
        F.col("path").alias("col_path"),
        "type",
        "compression",
    )
    if columns:
        cols = cols.filter(F.col("col_path").isin(list(columns)))
    joined = pages.join(
        F.broadcast(cols), ["filepath", "row_group_id", "column_id"]
    ).select(
        "filepath",
        "col_path",
        "type",
        "compression",
        "num_values",
        "page_uncompressed_size",
        "page_content",
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..parquet.decode import decode_dictionary_page

        for pdf in batches:
            fps, cps, vals = [], [], []
            for r in pdf.itertuples(index=False):
                decoded = decode_dictionary_page(
                    bytes(r.page_content),
                    r.type,
                    r.compression,
                    num_values=r.num_values,
                    uncompressed_size=r.page_uncompressed_size,
                )
                for v in decoded:
                    fps.append(r.filepath)
                    cps.append(r.col_path)
                    vals.append(_canon(v, r.type))
            yield pd.DataFrame({"filepath": fps, "col_path": cps, "value": vals})

    out = joined.mapInPandas(
        decode_batches, "filepath string, col_path string, value string"
    )
    return out


def dictionary_values(
    spark: SparkSession,
    path: str,
    columns: Optional[list] = None,
) -> DataFrame:
    """Decoded dictionary-page values, one row per (file, column path,
    value). ``columns`` optionally restricts to the named column paths
    (pushed into both metadata scans' filters)."""
    return _decoded_pages(
        spark, path, F.col("page_type") == "DICTIONARY_PAGE", columns
    )


def plain_data_values(
    spark: SparkSession,
    path: str,
    columns: Optional[list] = None,
) -> DataFrame:
    """Decoded values of PLAIN-encoded DATA pages.

    Valid for *required, flat* columns only: with max definition and
    repetition level 0 a v1 data page carries no level blocks, so its
    decompressed bytes are pure PLAIN values (the caller picks columns —
    the page scan cannot see repetition types). Optional columns'
    level-block handling is deliberately out of scope (see
    ``parquet/decode.py``)."""
    pred = (F.col("page_type") == "DATA_PAGE") & (F.col("encoding") == "PLAIN")
    return _decoded_pages(spark, path, pred, columns)
