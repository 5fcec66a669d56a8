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


def decode_rle_hybrid(data: bytes, bit_width: int, count: int, pos: int = 0) -> tuple:
    """Decode ``count`` values from a parquet RLE/bit-packed hybrid run
    stream starting at ``pos``; returns (values, next_pos).

    Format (public parquet-format Encodings.md): varint header h —
    even h: RLE run of h>>1 copies of a ceil(bit_width/8)-byte LE value;
    odd h: h>>1 groups of 8 bit-packed values, LSB first.
    """
    out: list = []
    byte_w = (bit_width + 7) // 8
    while len(out) < count and pos < len(data):
        # varint header
        h = 0
        shift = 0
        while True:
            b = data[pos]
            pos += 1
            h |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        if h & 1:  # bit-packed: (h >> 1) groups of 8 values
            n_vals = (h >> 1) * 8
            n_bytes = n_vals * bit_width // 8
            chunk = data[pos : pos + n_bytes]
            pos += n_bytes
            acc = int.from_bytes(chunk, "little")
            mask = (1 << bit_width) - 1
            for i in range(n_vals):
                if len(out) >= count:
                    break
                out.append((acc >> (i * bit_width)) & mask)
        else:  # RLE run
            v = int.from_bytes(data[pos : pos + byte_w], "little") if byte_w else 0
            pos += byte_w
            out.extend([v] * min(h >> 1, count - len(out)))
    return out, pos


def decode_data_page_v1(
    data: bytes,
    num_values: int,
    dictionary: Optional[list],
    optional: bool,
    physical_type: str,
    type_length: Optional[int] = None,
) -> list:
    """Decode one decompressed v1 DATA page of a FLAT column into Python
    values (``None`` for nulls).

    Flat optional columns carry one def-level block (4-byte LE length +
    RLE hybrid at bit width 1: 1 = present, 0 = null); required columns
    have none. With ``dictionary`` the remainder is RLE_DICTIONARY
    indices (1-byte bit width prefix); without, PLAIN values. Nested
    columns (max rep/def > 1) are out of scope, as documented.
    """
    pos = 0
    if optional:
        lvl_len = struct.unpack_from("<I", data, 0)[0]
        levels, _ = decode_rle_hybrid(data[4 : 4 + lvl_len], 1, num_values)
        pos = 4 + lvl_len
    else:
        levels = [1] * num_values
    n_present = sum(levels)
    if dictionary is not None:
        bit_width = data[pos]
        idx, _ = decode_rle_hybrid(data, bit_width, n_present, pos + 1)
        present = [dictionary[i] for i in idx]
    else:
        present = decode_plain(
            data[pos:], physical_type, count=n_present, type_length=type_length
        )
    it = iter(present)
    return [next(it) if lv == 1 else None for lv in levels]
