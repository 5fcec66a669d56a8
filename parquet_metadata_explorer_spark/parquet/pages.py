"""Page-level scan: stateful streaming walk of every page header.

Parity target: reference ``MetadataFileFormat.scala:232-320`` — for each
column chunk (in row-group, column order), seek to the chunk start, then
repeatedly Thrift-decode a ``PageHeader``, emit one record per page, and
advance by ``header_size + compressed_page_size`` until the accumulated
size reaches the chunk's ``total_compressed_size`` (that equality is the
loop invariant, ``:243-245``).

Implemented as a Python generator so Spark's task runner consumes it
lazily — a ``LIMIT`` above the scan stops page reads naturally, and memory
stays O(1 page header) (+ the page bytes only when ``page_content=True``).
"""

from __future__ import annotations

from typing import Iterator, Optional

from .footer import read_footer
from .io import DEFAULT_BUFFER_SIZE, ForwardSeekableStream, resolve_filesystem
from .thrift import ENCODINGS, FileMetaData, read_page_header


def iter_pages(
    path: str,
    size: Optional[int] = None,
    buffer_size: int = DEFAULT_BUFFER_SIZE,
    page_content: bool = False,
    meta: Optional[FileMetaData] = None,
    yield_header: bool = False,
    on_close=None,
) -> Iterator[tuple]:
    """Yield one tuple per page, matching schemas.PARQUET_PAGE_LEVEL order
    (minus filepath, appended by the caller). With ``yield_header`` the
    decoded ``PageHeader`` is appended as one extra trailing element —
    the v2 decode path needs its level byte lengths and is_compressed
    flag, which the fixed page schema deliberately doesn't carry.
    ``on_close(remote_reads, remote_seeks)`` fires as the stream closes —
    the metrics hook (see ``metrics.ScanMetrics``)."""
    if meta is None:
        meta, _ = read_footer(path, size)
    fs, p = resolve_filesystem(path)
    raw = fs.open_input_file(p)
    stream = ForwardSeekableStream(raw, buffer_size)
    try:
        for rg_id, rg in enumerate(meta.row_groups):
            for col_id, col in enumerate(rg.columns):
                chunk_start = col.start_offset
                total = col.total_compressed_size or 0
                consumed = 0
                page_id = 0
                while consumed < total:
                    header_offset = chunk_start + consumed
                    stream.seek(header_offset)
                    ph = read_page_header(stream)
                    content = None
                    if page_content:
                        content = stream.read_fully(ph.compressed_page_size)
                    stats = ph.statistics.as_row() if ph.statistics else None
                    extra = (ph,) if yield_header else ()
                    yield (
                        rg_id,
                        col_id,
                        page_id,
                        ph.page_type_name,
                        header_offset,
                        ph.header_size,
                        ph.compressed_page_size,
                        ph.uncompressed_page_size,
                        ph.crc,
                        ph.num_values,
                        ENCODINGS.get(ph.encoding) if ph.encoding is not None else None,
                        ENCODINGS.get(ph.definition_level_encoding)
                        if ph.definition_level_encoding is not None
                        else None,
                        ENCODINGS.get(ph.repetition_level_encoding)
                        if ph.repetition_level_encoding is not None
                        else None,
                        stats,
                        content,
                        *extra,
                    )
                    consumed += ph.header_size + ph.compressed_page_size
                    page_id += 1
    finally:
        stream.close()
        if on_close is not None:
            on_close(stream.remote_reads, stream.remote_seeks)
