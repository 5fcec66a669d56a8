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


def decode_stat_value(raw: Optional[bytes], physical_type: str):
    """Decode one PLAIN-encoded statistics value (footer/page-index
    min/max bytes) to a comparable Python value. BYTE_ARRAY stats carry
    no length prefix (the value IS the bytes); returned as UTF-8 text
    when decodable so lexicographic comparison matches the writer's
    UNSIGNED/string sort order on ASCII data."""
    if raw is None:
        return None
    if physical_type in _FIXED:
        fmt, w = _FIXED[physical_type]
        return struct.unpack(fmt, raw[:w])[0]
    if physical_type == "BOOLEAN":
        return bool(raw[0])
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw


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
    encoding: Optional[str] = None,
) -> list:
    """Decode one decompressed v1 DATA page of a FLAT column into Python
    values (``None`` for nulls). ``encoding`` defaults to the classic
    inference (dictionary present → RLE_DICTIONARY, else PLAIN); pass it
    explicitly for DELTA-encoded pages.

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
    if encoding is None:
        encoding = "RLE_DICTIONARY" if dictionary is not None else "PLAIN"
    present = _decode_values(
        data, pos, encoding, n_present, dictionary,
        physical_type, type_length=type_length,
    )
    it = iter(present)
    return [next(it) if lv == 1 else None for lv in levels]


# ---------------------------------------------------------------------------
# DELTA encodings (parquet-format Encodings.md: DELTA_BINARY_PACKED,
# DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY)
# ---------------------------------------------------------------------------


def _read_uleb(data: bytes, pos: int) -> tuple:
    v = shift = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _read_zigzag(data: bytes, pos: int) -> tuple:
    u, pos = _read_uleb(data, pos)
    return (u >> 1) ^ -(u & 1), pos


def decode_delta_binary_packed(data: bytes, pos: int = 0) -> tuple:
    """Decode one DELTA_BINARY_PACKED run → (values, next_pos).

    Layout: <block_size> <miniblocks_per_block> <total_count>
    <first_value zigzag>, then per block: <min_delta zigzag>, one
    bit-width byte per miniblock, then each *used* miniblock's
    ``values_per_mini × width`` bits packed LSB-first (trailing unused
    miniblocks of the last block are omitted, but their width bytes are
    present)."""
    block_size, pos = _read_uleb(data, pos)
    minis_per_block, pos = _read_uleb(data, pos)
    total, pos = _read_uleb(data, pos)
    if total == 0:
        return [], pos
    first, pos = _read_zigzag(data, pos)
    out = [first]
    values_per_mini = block_size // minis_per_block
    remaining = total - 1
    prev = first
    while remaining > 0:
        min_delta, pos = _read_zigzag(data, pos)
        widths = data[pos : pos + minis_per_block]
        pos += minis_per_block
        used = -(-remaining // values_per_mini)  # ceil
        for m in range(min(used, minis_per_block)):
            w = widths[m]
            n_bytes = values_per_mini * w // 8
            acc = int.from_bytes(data[pos : pos + n_bytes], "little")
            pos += n_bytes
            mask = (1 << w) - 1
            take = min(values_per_mini, remaining)
            for i in range(take):
                delta = (acc >> (i * w)) & mask if w else 0
                prev = prev + min_delta + delta
                out.append(prev)
            remaining -= take
            if remaining == 0:
                break
    return out, pos


def decode_delta_length_byte_array(data: bytes, pos: int = 0) -> tuple:
    """DELTA_LENGTH_BYTE_ARRAY → (list of bytes values, next_pos): a
    DELTA_BINARY_PACKED run of lengths, then the concatenated bytes."""
    lengths, pos = decode_delta_binary_packed(data, pos)
    out = []
    for n in lengths:
        out.append(data[pos : pos + n])
        pos += n
    return out, pos


def decode_delta_byte_array(data: bytes, pos: int = 0) -> tuple:
    """DELTA_BYTE_ARRAY (front-coded) → (list of bytes values, next_pos):
    prefix lengths (DELTA_BINARY_PACKED) + suffixes
    (DELTA_LENGTH_BYTE_ARRAY); value_i = value_{i-1}[:prefix_i] + suffix_i."""
    prefixes, pos = decode_delta_binary_packed(data, pos)
    suffixes, pos = decode_delta_length_byte_array(data, pos)
    out = []
    prev = b""
    for pfx, sfx in zip(prefixes, suffixes):
        prev = prev[:pfx] + sfx
        out.append(prev)
    return out, pos


def _decode_values(
    data: bytes,
    pos: int,
    encoding: str,
    n_present: int,
    dictionary,
    physical_type: str,
    type_length=None,
) -> list:
    """Decode ``n_present`` non-null values starting at ``pos`` under any
    supported data-page encoding (shared by the v1 and v2 paths)."""
    if encoding in ("RLE_DICTIONARY", "PLAIN_DICTIONARY"):
        if dictionary is None:
            raise ValueError("dictionary-encoded page before dictionary page")
        bit_width = data[pos]
        idx, _ = decode_rle_hybrid(data, bit_width, n_present, pos + 1)
        return [dictionary[i] for i in idx]
    if encoding == "PLAIN":
        return decode_plain(
            data[pos:], physical_type, count=n_present, type_length=type_length
        )
    if encoding == "DELTA_BINARY_PACKED":
        vals, _ = decode_delta_binary_packed(data, pos)
        return vals[:n_present]
    if encoding == "DELTA_LENGTH_BYTE_ARRAY":
        vals, _ = decode_delta_length_byte_array(data, pos)
        return vals[:n_present]
    if encoding == "DELTA_BYTE_ARRAY":
        vals, _ = decode_delta_byte_array(data, pos)
        return vals[:n_present]
    if encoding == "BYTE_STREAM_SPLIT":
        return decode_byte_stream_split(
            data[pos:], n_present, physical_type, type_length=type_length
        )
    raise ValueError(f"unsupported data-page encoding: {encoding}")


def decode_data_page_v2(
    content: bytes,
    num_values: int,
    def_levels_byte_length: int,
    rep_levels_byte_length: int,
    is_compressed: bool,
    encoding: str,
    dictionary,
    optional: bool,
    physical_type: str,
    codec=None,
    uncompressed_size=None,
    type_length=None,
) -> list:
    """Decode one v2 DATA page of a flat column into Python values.

    v2 layout differs from v1 in exactly the ways that matter here: the
    rep/def level blocks sit *before* the compressed region, uncompressed,
    as bare RLE runs (no 4-byte length prefix — the byte lengths come
    from the page header), and ``is_compressed`` can mark the value bytes
    as stored raw even when the column chunk has a codec."""
    lvl_end = rep_levels_byte_length + def_levels_byte_length
    if optional and def_levels_byte_length:
        levels, _ = decode_rle_hybrid(
            content[rep_levels_byte_length:lvl_end], 1, num_values
        )
    else:
        levels = [1] * num_values
    values_bytes = content[lvl_end:]
    if is_compressed:
        inflated = None if uncompressed_size is None else uncompressed_size - lvl_end
        values_bytes = decompress_page(values_bytes, codec, inflated)
    n_present = sum(levels)
    present = _decode_values(
        values_bytes, 0, encoding, n_present, dictionary,
        physical_type, type_length=type_length,
    )
    it = iter(present)
    return [next(it) if lv == 1 else None for lv in levels]


_BSS_WIDTHS = {"FLOAT": 4, "INT32": 4, "DOUBLE": 8, "INT64": 8}


def decode_byte_stream_split(
    data: bytes,
    count: int,
    physical_type: str,
    type_length: Optional[int] = None,
) -> list:
    """BYTE_STREAM_SPLIT: the page stores byte-plane streams (all first
    bytes, then all second bytes, …) to help compressors; de-interleave
    with one numpy transpose and decode as PLAIN."""
    import numpy as np

    w = _BSS_WIDTHS.get(physical_type) or type_length
    if not w:
        raise ValueError(f"BYTE_STREAM_SPLIT unsupported for {physical_type}")
    planes = np.frombuffer(data[: count * w], dtype=np.uint8)
    recombined = planes.reshape(w, count).T.tobytes()
    return decode_plain(
        recombined, physical_type, count=count, type_length=type_length
    )
