"""PLAIN-encoding value decoders for page content.

The page level already surfaces raw ``page_content`` bytes (reference
``MetadataFileFormat.scala:232-320`` exposes the same bytes as an array);
these helpers take the next step the reference never did: decompress a
page and decode PLAIN-encoded values back into Python values.

Scope (documented, not padded): DICTIONARY pages are always pure PLAIN
values — no level runs — so they decode for every physical type. DATA
pages decode when the column is required (flat, no def/rep level blocks);
optional-column v1 data pages carry RLE level blocks whose width depends
on the schema's max levels, which is out of scope here.

Decompression delegates to ``pyarrow.Codec`` (snappy/gzip/zstd/lz4/brotli
— the same C++ codecs Spark's parquet reader uses), so nothing here is a
Python-side hot path: one codec call + one struct.unpack per page.
"""

from __future__ import annotations

import struct
from typing import Optional

# parquet physical type names as emitted by the column/page levels
_FIXED = {
    "INT32": ("<i", 4),
    "INT64": ("<q", 8),
    "FLOAT": ("<f", 4),
    "DOUBLE": ("<d", 8),
}


def decompress_page(
    content: bytes, codec: Optional[str], uncompressed_size: Optional[int] = None
) -> bytes:
    """Inflate one page's raw bytes. ``codec`` is the column-level
    ``compression`` string (``SNAPPY``/``GZIP``/``ZSTD``/``LZ4``/
    ``BROTLI``/``UNCOMPRESSED``)."""
    if not codec or codec == "UNCOMPRESSED":
        return content
    import pyarrow as pa

    return (
        pa.Codec(codec.lower())
        .decompress(content, decompressed_size=uncompressed_size)
        .to_pybytes()
    )


def decode_plain(
    data: bytes,
    physical_type: str,
    count: Optional[int] = None,
    type_length: Optional[int] = None,
) -> list:
    """Decode PLAIN-encoded values.

    BOOLEAN is LSB-first bit-packed (``count`` required to trim padding
    bits); BINARY is u32-LE length-prefixed; FIXED_LEN_BYTE_ARRAY and
    INT96 are fixed-width chunks returned as bytes.
    """
    if physical_type in _FIXED:
        fmt, w = _FIXED[physical_type]
        n = len(data) // w
        if count is not None:
            n = min(n, count)
        return list(struct.unpack(f"<{n}{fmt[1]}", data[: n * w]))
    if physical_type == "BOOLEAN":
        out = []
        total = count if count is not None else len(data) * 8
        for i in range(total):
            out.append(bool((data[i >> 3] >> (i & 7)) & 1))
        return out
    if physical_type == "BINARY":
        out = []
        pos = 0
        while pos + 4 <= len(data) and (count is None or len(out) < count):
            (n,) = struct.unpack_from("<I", data, pos)
            pos += 4
            out.append(data[pos : pos + n])
            pos += n
        return out
    if physical_type == "INT96":
        return [data[i : i + 12] for i in range(0, len(data) - 11, 12)]
    if physical_type == "FIXED_LEN_BYTE_ARRAY":
        if not type_length:
            raise ValueError("type_length required for FIXED_LEN_BYTE_ARRAY")
        w = type_length
        return [data[i : i + w] for i in range(0, len(data) - w + 1, w)]
    raise ValueError(f"Unsupported physical type: {physical_type}")


def decode_dictionary_page(
    content: bytes,
    physical_type: str,
    codec: Optional[str],
    num_values: Optional[int] = None,
    uncompressed_size: Optional[int] = None,
    type_length: Optional[int] = None,
) -> list:
    """Decompress + PLAIN-decode one DICTIONARY page."""
    raw = decompress_page(content, codec, uncompressed_size)
    return decode_plain(raw, physical_type, count=num_values, type_length=type_length)
