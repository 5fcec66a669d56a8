"""Per-level row emitters — the executor-side flatMap core.

Each emitter takes a ``FileInfo`` seed and yields plain tuples matching the
corresponding StructType in ``schemas.py``. These run inside Spark tasks
(one task per slice of files); everything above them — filter, project,
join, agg — is ordinary Catalyst-optimized Spark SQL.

Parity targets: FILE rows ``MetadataFileFormat.scala:110-131``; parquet
file rows ``:163-179``; rowgroup ``:180-193`` (+ ``ParquetUtils.scala:130-157``);
column ``:194-231`` (+ ``ParquetUtils.scala:159-245``); page ``:232-320``.
"""

from __future__ import annotations

from typing import Iterator

from ..listing import FileInfo
from ..parquet.footer import read_footer, schema_to_string
from ..parquet.pages import iter_pages
from ..parquet.thrift import (
    COMPRESSION_CODECS,
    ENCODINGS,
    PAGE_TYPES,
    PHYSICAL_TYPES,
)


def file_rows(f: FileInfo) -> Iterator[tuple]:
    yield (f.path, f.name, f.size, f.mtime, f.partition_map())


def parquet_file_rows(f: FileInfo) -> Iterator[tuple]:
    meta, meta_len = read_footer(f.path, f.size)
    kv = dict(meta.key_value_metadata) if meta.key_value_metadata is not None else None
    yield (
        f.path,
        f.name,
        f.size,
        f.mtime,
        f.partition_map(),
        meta_len,
        schema_to_string(meta),
        meta.num_rows,
        len(meta.row_groups),
        meta.created_by,
        kv,
    )


def rowgroup_rows(f: FileInfo) -> Iterator[tuple]:
    meta, _ = read_footer(f.path, f.size)
    for rg_id, rg in enumerate(meta.row_groups):
        yield (
            rg_id,
            rg.start_offset,
            rg.compressed_size,
            rg.total_byte_size,
            rg.num_rows,
            len(rg.columns),
            f.path,
            rg.sorting_columns,
        )


def column_rows(f: FileInfo) -> Iterator[tuple]:
    meta, _ = read_footer(f.path, f.size)
    for rg_id, rg in enumerate(meta.row_groups):
        for col_id, col in enumerate(rg.columns):
            stats = col.statistics.as_row() if col.statistics else None
            # sizes/counts default to 0 when ColumnMetaData is absent
            # (reference ParquetUtils.scala:193-207 getOrElse(0)); offsets
            # and path stay NULL like the reference's Option fields
            yield (
                rg_id,
                col_id,
                col.start_offset,
                col.total_compressed_size or 0,
                col.total_uncompressed_size or 0,
                ".".join(p for p in col.path_in_schema if p is not None),
                PHYSICAL_TYPES[col.type] if col.type is not None else None,
                [ENCODINGS.get(e, str(e)) for e in col.encodings],
                COMPRESSION_CODECS.get(col.codec) if col.codec is not None else None,
                col.num_values or 0,
                stats,
                col.data_page_offset,
                col.dictionary_page_offset,
                col.index_page_offset,
                col.offset_index_offset,
                col.offset_index_length,
                col.column_index_offset,
                col.column_index_length,
                f.path,
                col.bloom_filter_offset,
                col.bloom_filter_length,
                col.unencoded_byte_array_data_bytes,
                col.repetition_level_histogram,
                col.definition_level_histogram,
                [
                    (PAGE_TYPES.get(pt, str(pt)), ENCODINGS.get(e, str(e)), n)
                    for pt, e, n in col.encoding_stats
                ]
                if col.encoding_stats is not None
                else None,
            )


def page_rows(
    f: FileInfo, buffer_size: int, page_content: bool, metrics=None
) -> Iterator[tuple]:
    for page in iter_pages(
        f.path,
        size=f.size,
        buffer_size=buffer_size,
        page_content=page_content,
        on_close=metrics.add if metrics is not None else None,
    ):
        yield page + (f.path,)
