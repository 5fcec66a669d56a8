"""Minimal Thrift *compact protocol* reader for Parquet metadata structs.

Pure-Python, stream-oriented. This is the data-plane piece pyarrow cannot
provide (reference parity: raw PLAIN-encoded statistics bytes, page-index
offsets/lengths, and per-page ``PageHeader`` decoding — see reference
``ParquetUtils.scala:41-331`` and ``MetadataFileFormat.scala:232-320``).
Struct/field ids follow the public parquet-format IDL
(github.com/apache/parquet-format ``src/main/thrift/parquet.thrift``).

Design notes for scale: the reader consumes from any object exposing
``read(n) -> bytes`` and never buffers more than one field value, so page
scans stay O(header) memory per page regardless of file size; header size
is recovered from the byte-consumption counter (the reference derives it
from stream-position deltas, ``MetadataFileFormat.scala:253-255``).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Optional

# compact-protocol wire types
CT_STOP = 0
CT_BOOL_TRUE = 1
CT_BOOL_FALSE = 2
CT_BYTE = 3
CT_I16 = 4
CT_I32 = 5
CT_I64 = 6
CT_DOUBLE = 7
CT_BINARY = 8
CT_LIST = 9
CT_SET = 10
CT_MAP = 11
CT_STRUCT = 12


class ThriftError(ValueError):
    pass


class CompactReader:
    """Positioned compact-protocol reader over a ``read(n)`` source."""

    __slots__ = ("_read", "consumed")

    def __init__(self, readable):
        self._read = readable.read
        self.consumed = 0

    # -- primitives ---------------------------------------------------
    def _take(self, n: int) -> bytes:
        b = self._read(n)
        if len(b) != n:
            raise ThriftError(f"unexpected EOF: wanted {n} bytes, got {len(b)}")
        self.consumed += n
        return b

    def read_byte(self) -> int:
        return self._take(1)[0]

    def read_varint(self) -> int:
        result = 0
        shift = 0
        while True:
            b = self.read_byte()
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                return result
            shift += 7
            if shift > 70:
                raise ThriftError("varint too long")

    def read_zigzag(self) -> int:
        n = self.read_varint()
        return (n >> 1) ^ -(n & 1)

    def read_binary(self) -> bytes:
        n = self.read_varint()
        return self._take(n) if n else b""

    def read_double(self) -> float:
        return struct.unpack("<d", self._take(8))[0]

    # -- composite ----------------------------------------------------
    def read_field_header(self, last_fid: int) -> tuple[int, int]:
        """Returns (wire_type, field_id); wire_type CT_STOP ends the struct."""
        b = self.read_byte()
        if b == CT_STOP:
            return CT_STOP, 0
        delta = (b & 0xF0) >> 4
        wtype = b & 0x0F
        fid = last_fid + delta if delta else self.read_zigzag()
        return wtype, fid

    def read_list_header(self) -> tuple[int, int]:
        b = self.read_byte()
        size = (b & 0xF0) >> 4
        etype = b & 0x0F
        if size == 15:
            size = self.read_varint()
        return etype, size

    def read_value(self, wtype: int, bool_value: Optional[bool] = None):
        """Generic value read used by skip and by list elements."""
        if wtype in (CT_BOOL_TRUE, CT_BOOL_FALSE):
            # inside a struct the value is encoded in the type nibble;
            # inside a list each bool is one byte
            if bool_value is not None:
                return bool_value
            return self.read_byte() == CT_BOOL_TRUE
        if wtype == CT_BYTE:
            return self._take(1)[0]
        if wtype in (CT_I16, CT_I32, CT_I64):
            return self.read_zigzag()
        if wtype == CT_DOUBLE:
            return self.read_double()
        if wtype == CT_BINARY:
            return self.read_binary()
        if wtype in (CT_LIST, CT_SET):
            etype, size = self.read_list_header()
            return [self.read_value(etype) for _ in range(size)]
        if wtype == CT_MAP:
            size = self.read_varint()
            if size == 0:
                return {}
            kv = self.read_byte()
            ktype, vtype = (kv & 0xF0) >> 4, kv & 0x0F
            return {self.read_value(ktype): self.read_value(vtype) for _ in range(size)}
        if wtype == CT_STRUCT:
            return self.read_struct_generic()
        raise ThriftError(f"unknown wire type {wtype}")

    def read_struct_generic(self) -> dict:
        """Read a struct into {field_id: value} without a schema."""
        out = {}
        fid = 0
        while True:
            wtype, fid_ = self.read_field_header(fid)
            if wtype == CT_STOP:
                return out
            fid = fid_
            if wtype == CT_BOOL_TRUE:
                out[fid] = True
            elif wtype == CT_BOOL_FALSE:
                out[fid] = False
            else:
                out[fid] = self.read_value(wtype)

    def skip(self, wtype: int) -> None:
        if wtype not in (CT_BOOL_TRUE, CT_BOOL_FALSE):
            self.read_value(wtype)


class BytesReadable:
    """read(n) over an in-memory buffer (footer parsing path)."""

    __slots__ = ("_mv", "_pos")

    def __init__(self, data: bytes):
        self._mv = memoryview(data)
        self._pos = 0

    def read(self, n: int) -> bytes:
        b = self._mv[self._pos : self._pos + n]
        self._pos += len(b)
        return bytes(b)


# ---------------------------------------------------------------------------
# parquet-format enum tables (public parquet.thrift)
# ---------------------------------------------------------------------------

PHYSICAL_TYPES = [
    "BOOLEAN",
    "INT32",
    "INT64",
    "INT96",
    "FLOAT",
    "DOUBLE",
    "BINARY",
    "FIXED_LEN_BYTE_ARRAY",
]

ENCODINGS = {
    0: "PLAIN",
    1: "GROUP_VAR_INT",
    2: "PLAIN_DICTIONARY",
    3: "RLE",
    4: "BIT_PACKED",
    5: "DELTA_BINARY_PACKED",
    6: "DELTA_LENGTH_BYTE_ARRAY",
    7: "DELTA_BYTE_ARRAY",
    8: "RLE_DICTIONARY",
    9: "BYTE_STREAM_SPLIT",
}

COMPRESSION_CODECS = {
    0: "UNCOMPRESSED",
    1: "SNAPPY",
    2: "GZIP",
    3: "LZO",
    4: "BROTLI",
    5: "LZ4",
    6: "ZSTD",
    7: "LZ4_RAW",
}

PAGE_TYPES = {
    0: "DATA_PAGE",
    1: "INDEX_PAGE",
    2: "DICTIONARY_PAGE",
    3: "DATA_PAGE_V2",
}

REPETITION_TYPES = ["required", "optional", "repeated"]

CONVERTED_TYPES = {
    0: "UTF8",
    1: "MAP",
    2: "MAP_KEY_VALUE",
    3: "LIST",
    4: "ENUM",
    5: "DECIMAL",
    6: "DATE",
    7: "TIME_MILLIS",
    8: "TIME_MICROS",
    9: "TIMESTAMP_MILLIS",
    10: "TIMESTAMP_MICROS",
    11: "UINT_8",
    12: "UINT_16",
    13: "UINT_32",
    14: "UINT_64",
    15: "INT_8",
    16: "INT_16",
    17: "INT_32",
    18: "INT_64",
    19: "JSON",
    20: "BSON",
    21: "INTERVAL",
}


# ---------------------------------------------------------------------------
# typed struct models (only the fields the five levels need)
# ---------------------------------------------------------------------------


@dataclass
class Statistics:
    """parquet.thrift Statistics: raw (PLAIN-encoded) bytes preserved.

    Reference emits these verbatim (``ParquetUtils.scala:307-331``) and
    distinguishes deprecated ``min``/``max`` from ``min_value``/``max_value``.
    """

    max: Optional[bytes] = None
    min: Optional[bytes] = None
    null_count: Optional[int] = None
    distinct_count: Optional[int] = None
    max_value: Optional[bytes] = None
    min_value: Optional[bytes] = None

    @classmethod
    def from_fields(cls, f: dict) -> "Statistics":
        return cls(
            max=f.get(1),
            min=f.get(2),
            null_count=f.get(3),
            distinct_count=f.get(4),
            max_value=f.get(5),
            min_value=f.get(6),
        )

    def as_row(self) -> tuple:
        # column order matches schemas.STATISTICS_TYPE
        return (
            self.null_count,
            self.distinct_count,
            self.min,
            self.max,
            self.min_value,
            self.max_value,
        )


@dataclass
class SchemaElement:
    name: str = ""
    type: Optional[int] = None
    type_length: Optional[int] = None
    repetition_type: Optional[int] = None
    num_children: int = 0
    converted_type: Optional[int] = None
    scale: Optional[int] = None
    precision: Optional[int] = None
    field_id: Optional[int] = None


@dataclass
class ColumnChunk:
    file_offset: int = 0
    # ColumnMetaData fields, flattened
    type: Optional[int] = None
    encodings: list = field(default_factory=list)
    path_in_schema: list = field(default_factory=list)
    codec: Optional[int] = None
    num_values: Optional[int] = None
    total_uncompressed_size: Optional[int] = None
    total_compressed_size: Optional[int] = None
    data_page_offset: Optional[int] = None
    index_page_offset: Optional[int] = None
    dictionary_page_offset: Optional[int] = None
    statistics: Optional[Statistics] = None
    offset_index_offset: Optional[int] = None
    offset_index_length: Optional[int] = None
    column_index_offset: Optional[int] = None
    column_index_length: Optional[int] = None
    # parquet-format ColumnMetaData ids 14-16 (post-reference extension)
    bloom_filter_offset: Optional[int] = None
    bloom_filter_length: Optional[int] = None
    unencoded_byte_array_data_bytes: Optional[int] = None
    repetition_level_histogram: Optional[list] = None
    definition_level_histogram: Optional[list] = None
    # ColumnMetaData id 13: list[(page_type_id, encoding_id, count)]
    encoding_stats: Optional[list] = None

    @property
    def start_offset(self) -> int:
        """Actual first byte of the chunk in the file.

        Semantic quirk replicated from the reference
        (``ParquetUtils.scala:165-175``): some writers set the thrift
        ``file_offset`` past the dictionary page, so prefer
        dictionary_page_offset, then data_page_offset, then file_offset.
        """
        if self.dictionary_page_offset is not None:
            return self.dictionary_page_offset
        if self.data_page_offset is not None:
            return self.data_page_offset
        return self.file_offset


@dataclass
class RowGroup:
    columns: list = field(default_factory=list)
    total_byte_size: int = 0
    num_rows: int = 0
    file_offset: Optional[int] = None
    # RowGroup id 4: list[(column_idx, descending, nulls_first)]
    sorting_columns: Optional[list] = None

    @property
    def start_offset(self) -> int:
        # reference ParquetUtils.scala:138-144: first column's corrected
        # offset, else 0
        if self.columns:
            return self.columns[0].start_offset
        return 0

    @property
    def compressed_size(self) -> int:
        # reference sums column chunk compressed sizes (ParquetUtils.scala:147)
        return sum(c.total_compressed_size or 0 for c in self.columns)


@dataclass
class FileMetaData:
    version: int = 0
    schema: list = field(default_factory=list)
    num_rows: int = 0
    row_groups: list = field(default_factory=list)
    key_value_metadata: Optional[list] = None  # list[(key, value|None)]
    created_by: Optional[str] = None


@dataclass
class PageHeader:
    type: int = 0
    uncompressed_page_size: int = 0
    compressed_page_size: int = 0
    crc: Optional[int] = None
    header_size: int = 0
    # from whichever of data/dict/data-v2 sub-header is present
    num_values: Optional[int] = None
    encoding: Optional[int] = None
    definition_level_encoding: Optional[int] = None
    repetition_level_encoding: Optional[int] = None
    statistics: Optional[Statistics] = None
    # DataPageHeaderV2 extras (level blocks live outside the compressed
    # region, so decoding needs their exact byte lengths)
    num_nulls: Optional[int] = None
    def_levels_byte_length: Optional[int] = None
    rep_levels_byte_length: Optional[int] = None
    is_compressed: bool = True

    @property
    def page_type_name(self) -> str:
        return PAGE_TYPES.get(self.type, f"UNKNOWN({self.type})")


# ---------------------------------------------------------------------------
# struct decoders
# ---------------------------------------------------------------------------


def _decode_str(b) -> Optional[str]:
    if b is None:
        return None
    return b.decode("utf-8", errors="replace") if isinstance(b, bytes) else str(b)


def parse_schema_element(f: dict) -> SchemaElement:
    return SchemaElement(
        type=f.get(1),
        type_length=f.get(2),
        repetition_type=f.get(3),
        name=_decode_str(f.get(4)) or "",
        num_children=f.get(5) or 0,
        converted_type=f.get(6),
        scale=f.get(7),
        precision=f.get(8),
        field_id=f.get(9),
    )


def parse_column_chunk(f: dict) -> ColumnChunk:
    md = f.get(3) or {}
    stats = Statistics.from_fields(md[12]) if 12 in md else None
    # SizeStatistics (id 16): 1=unencoded_byte_array_data_bytes,
    # 2=repetition_level_histogram, 3=definition_level_histogram
    size_stats = md.get(16) or {}
    return ColumnChunk(
        file_offset=f.get(2) or 0,
        offset_index_offset=f.get(4),
        offset_index_length=f.get(5),
        column_index_offset=f.get(6),
        column_index_length=f.get(7),
        type=md.get(1),
        encodings=md.get(2) or [],
        path_in_schema=[_decode_str(p) for p in (md.get(3) or [])],
        codec=md.get(4),
        num_values=md.get(5),
        total_uncompressed_size=md.get(6),
        total_compressed_size=md.get(7),
        data_page_offset=md.get(9),
        index_page_offset=md.get(10),
        dictionary_page_offset=md.get(11),
        statistics=stats,
        bloom_filter_offset=md.get(14),
        bloom_filter_length=md.get(15),
        unencoded_byte_array_data_bytes=size_stats.get(1),
        repetition_level_histogram=size_stats.get(2),
        definition_level_histogram=size_stats.get(3),
        # PageEncodingStats: 1=page_type, 2=encoding, 3=count
        encoding_stats=[
            (s.get(1), s.get(2), s.get(3)) for s in md[13]
        ]
        if 13 in md
        else None,
    )


def parse_row_group(f: dict) -> RowGroup:
    return RowGroup(
        columns=[parse_column_chunk(c) for c in (f.get(1) or [])],
        total_byte_size=f.get(2) or 0,
        num_rows=f.get(3) or 0,
        file_offset=f.get(5),
        # SortingColumn: 1=column_idx, 2=descending, 3=nulls_first
        sorting_columns=[
            (s.get(1), bool(s.get(2)), bool(s.get(3))) for s in f[4]
        ]
        if 4 in f
        else None,
    )


def parse_file_metadata(data: bytes) -> FileMetaData:
    """Decode a parquet footer blob (the bytes before the tail-8)."""
    reader = CompactReader(BytesReadable(data))
    f = reader.read_struct_generic()
    kv = None
    if 5 in f:
        kv = []
        for item in f[5]:
            # KeyValue: 1=key, 2=value (value optional -> SQL NULL,
            # reference ParquetUtils.scala:107-120)
            kv.append((_decode_str(item.get(1)) or "", _decode_str(item.get(2))))
    return FileMetaData(
        version=f.get(1) or 0,
        schema=[parse_schema_element(s) for s in (f.get(2) or [])],
        num_rows=f.get(3) or 0,
        row_groups=[parse_row_group(rg) for rg in (f.get(4) or [])],
        key_value_metadata=kv,
        created_by=_decode_str(f.get(6)),
    )


def read_page_header(readable) -> PageHeader:
    """Decode one PageHeader from a stream; ``header_size`` is the exact
    number of bytes consumed (reference derives this from stream position,
    ``MetadataFileFormat.scala:253-255``)."""
    reader = CompactReader(readable)
    f = reader.read_struct_generic()
    ph = PageHeader(
        type=f.get(1) or 0,
        uncompressed_page_size=f.get(2) or 0,
        compressed_page_size=f.get(3) or 0,
        crc=f.get(4),
        header_size=reader.consumed,
    )
    if 5 in f:  # DataPageHeader
        d = f[5]
        ph.num_values = d.get(1)
        ph.encoding = d.get(2)
        ph.definition_level_encoding = d.get(3)
        ph.repetition_level_encoding = d.get(4)
        if 5 in d:
            ph.statistics = Statistics.from_fields(d[5])
    elif 7 in f:  # DictionaryPageHeader
        d = f[7]
        ph.num_values = d.get(1)
        ph.encoding = d.get(2)
    elif 8 in f:  # DataPageHeaderV2
        d = f[8]
        ph.num_values = d.get(1)
        ph.encoding = d.get(4)
        # v2 def/rep levels are always RLE (reference
        # ParquetUtils.scala:285-293)
        ph.definition_level_encoding = 3
        ph.repetition_level_encoding = 3
        ph.num_nulls = d.get(2)
        ph.def_levels_byte_length = d.get(5) or 0
        ph.rep_levels_byte_length = d.get(6) or 0
        # compact-protocol booleans arrive as True/False; field default true
        ph.is_compressed = d.get(7, True) is not False
        if 8 in d:
            ph.statistics = Statistics.from_fields(d[8])
    return ph
