"""Parquet page-index (ColumnIndex / OffsetIndex) readers.

The reference surfaces only the four index *locations* from the footer
(``ParquetUtils.scala`` column fields); this goes one step further and
decodes the structures themselves — the page-skipping metadata a scan
planner prunes with. Struct ids follow the public parquet-format IDL:

  OffsetIndex  { 1: list<PageLocation> page_locations }
  PageLocation { 1: i64 offset, 2: i32 compressed_page_size
                 (INCLUDING header), 3: i64 first_row_index }
  ColumnIndex  { 1: list<bool> null_pages, 2: list<binary> min_values,
                 3: list<binary> max_values, 4: i32 boundary_order,
                 5: list<i64> null_counts }

Invariant used as the internal oracle in tests: OffsetIndex page
locations must agree with the independent page-header scan —
``offset == page_header_offset`` and ``compressed_page_size ==
header_size + page_compressed_size`` for every data page.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from .io import resolve_filesystem
from .thrift import BytesReadable, CompactReader


@dataclass
class PageLocation:
    offset: int
    compressed_page_size: int  # includes the page header
    first_row_index: int


@dataclass
class OffsetIndex:
    page_locations: list = field(default_factory=list)


@dataclass
class ColumnIndex:
    null_pages: list = field(default_factory=list)
    min_values: list = field(default_factory=list)
    max_values: list = field(default_factory=list)
    boundary_order: Optional[int] = None
    null_counts: Optional[list] = None


def parse_offset_index(blob: bytes) -> OffsetIndex:
    f = CompactReader(BytesReadable(blob)).read_struct_generic()
    return OffsetIndex(
        page_locations=[
            PageLocation(
                offset=loc.get(1, 0),
                compressed_page_size=loc.get(2, 0),
                first_row_index=loc.get(3, 0),
            )
            for loc in (f.get(1) or [])
        ]
    )


def parse_column_index(blob: bytes) -> ColumnIndex:
    f = CompactReader(BytesReadable(blob)).read_struct_generic()
    return ColumnIndex(
        null_pages=f.get(1) or [],
        min_values=f.get(2) or [],
        max_values=f.get(3) or [],
        boundary_order=f.get(4),
        null_counts=f.get(5),
    )


def read_page_index(path: str, column_chunk) -> tuple:
    """Fetch + decode one chunk's (ColumnIndex, OffsetIndex); either is
    ``None`` when the writer emitted no index for it. Two positioned
    reads of exactly the lengths the footer records."""
    ci = oi = None
    fs, p = resolve_filesystem(path)
    with fs.open_input_file(p) as fobj:
        if (
            column_chunk.column_index_offset is not None
            and column_chunk.column_index_length
        ):
            fobj.seek(column_chunk.column_index_offset)
            ci = parse_column_index(fobj.read(column_chunk.column_index_length))
        if (
            column_chunk.offset_index_offset is not None
            and column_chunk.offset_index_length
        ):
            fobj.seek(column_chunk.offset_index_offset)
            oi = parse_offset_index(fobj.read(column_chunk.offset_index_length))
    return ci, oi
