"""Split-block bloom filter reader (parquet-format Bloom spec).

The reference exposes only the bloom filter's *offset/length* footer
fields; this module reads the filter itself, enabling the file-skipping
primitive blooms exist for: "which of these 10^6 files can possibly
contain key K?" answered from ~1 MiB per column chunk with zero data
pages read.

Format (parquet-format BloomFilter.md): at ``bloom_filter_offset`` a
compact-Thrift ``BloomFilterHeader`` { 1: numBytes, 2: algorithm(BLOCK),
3: hash(XXHASH), 4: compression(UNCOMPRESSED) } followed by the raw
bitset of ``numBytes`` bytes — a sequence of 32-byte *blocks*, each 8
little-endian 32-bit words. A value's XXH64 hash picks the block with
its high 32 bits and sets one bit in each of the 8 words via the salt
constants. No false negatives; FPP set at write time.

The xxhash64 here is a pure-Python transcription of the public XXH64
spec (github.com/Cyan4973/xxHash doc) — no third-party dependency; its
correctness is pinned by the no-false-negative tests (a wrong hash fails
a present-key probe with probability ~1 per key).
"""

from __future__ import annotations

import struct
from typing import Optional

from .io import resolve_filesystem
from .thrift import BytesReadable, CompactReader

_SALT = (
    0x47B6137B,
    0x44974D91,
    0x8824AD5B,
    0xA2B7289D,
    0x705495C7,
    0x2DF1424B,
    0x9EFC4947,
    0x5C6BFB31,
)

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` — the hash parquet blooms mandate."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            lanes = struct.unpack_from("<4Q", data, i)
            v1 = (_rotl((v1 + lanes[0] * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + lanes[1] * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + lanes[2] * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + lanes[3] * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M64, 31) * _P1) & _M64)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        k = (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = ((_rotl(h ^ ((k * _P1) & _M64), 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def encode_bloom_value(value, physical_type: str) -> bytes:
    """Plain-encode a Python value the way the writer hashed it (no
    length prefixes; little-endian fixed widths)."""
    if physical_type == "INT32":
        return struct.pack("<i", value)
    if physical_type == "INT64":
        return struct.pack("<q", value)
    if physical_type == "FLOAT":
        return struct.pack("<f", value)
    if physical_type == "DOUBLE":
        return struct.pack("<d", value)
    if isinstance(value, bytes):
        return value
    return str(value).encode("utf-8")


class BloomFilter:
    """In-memory split-block bloom bitset."""

    def __init__(self, bitset: bytes):
        if len(bitset) % 32:
            raise ValueError(f"bitset not block-aligned: {len(bitset)} bytes")
        self._words = struct.unpack(f"<{len(bitset) // 4}I", bitset)
        self.num_blocks = len(bitset) // 32

    def might_contain_hash(self, h: int) -> bool:
        block = ((h >> 32) * self.num_blocks) >> 32
        lo = h & 0xFFFFFFFF
        base = block * 8
        for i in range(8):
            bit = 1 << (((lo * _SALT[i]) & 0xFFFFFFFF) >> 27)
            if not self._words[base + i] & bit:
                return False
        return True

    def might_contain(self, value, physical_type: str) -> bool:
        return self.might_contain_hash(
            xxhash64(encode_bloom_value(value, physical_type))
        )


def read_bloom_filter(path: str, column_chunk) -> Optional[BloomFilter]:
    """Load one column chunk's bloom filter, or None if absent."""
    off = column_chunk.bloom_filter_offset
    if off is None:
        return None
    fs, p = resolve_filesystem(path)
    with fs.open_input_file(p) as f:
        f.seek(off)
        # header ≤ ~32 bytes; over-read, parse, then position the bitset
        # read from the parsed header length (generic reader tracks pos)
        length = column_chunk.bloom_filter_length
        blob = f.read(length if length is not None else 64)
        reader = CompactReader(BytesReadable(blob))
        header = reader.read_struct_generic()
        num_bytes = header.get(1)
        if num_bytes is None or 2 not in header or 3 not in header:
            raise ValueError(f"invalid bloom filter header at {off} in {path}")
        hdr_len = reader.consumed
        if length is not None:
            bitset = blob[hdr_len : hdr_len + num_bytes]
        else:
            f.seek(off + hdr_len)
            bitset = f.read(num_bytes)
        if len(bitset) != num_bytes:
            raise ValueError(
                f"bloom bitset truncated: wanted {num_bytes}, got {len(bitset)}"
            )
        return BloomFilter(bitset)
