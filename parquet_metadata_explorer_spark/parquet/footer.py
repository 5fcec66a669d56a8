"""Parquet footer fetch + decode + schema-string reconstruction.

Parity target: reference ``ParquetUtils.scala:22-127`` (magic sniff, tail-8
decode, Thrift footer parse) and ``SchemaUtil.java:13-39`` (message-type
string). Footer fetch costs exactly 2 reads when the file size is already
known from the listing (tail-8 + footer blob) — the reference reuses the
listed size the same way (``ParquetUtils.scala:44-49``) so at 10^5-10^6
files no extra HEAD/getFileStatus requests are issued.
"""

from __future__ import annotations

import struct
from typing import Optional

from .io import resolve_filesystem
from .thrift import (
    CONVERTED_TYPES,
    PHYSICAL_TYPES,
    REPETITION_TYPES,
    FileMetaData,
    SchemaElement,
    parse_file_metadata,
)

MAGIC = b"PAR1"


def is_parquet_file(path: str) -> bool:
    """Sniff the 4-byte magic (reference DefaultSource.scala:69-81)."""
    fs, p = resolve_filesystem(path)
    try:
        with fs.open_input_file(p) as f:
            return f.read(4) == MAGIC
    except OSError:
        return False


def _java_bytes_str(b: bytes) -> str:
    """Render bytes the way Java ``Arrays.toString(byte[])`` does:
    signed values, ``[80, 65, 82, 49]``."""
    return "[" + ", ".join(str(x - 256 if x > 127 else x) for x in b) + "]"


def read_footer(path: str, size: Optional[int] = None) -> tuple[FileMetaData, int]:
    """Returns (FileMetaData, metadata_size).

    ``metadata_size`` is the Thrift footer length from the little-endian
    int in the tail-8 (reference ``ParquetUtils.scala:61-65``; invariant
    FIXTURES.md #2). Pass ``size`` from the listing to skip a stat call.

    Error parity with ``ParquetUtils.scala:50-67``: the head-4 magic is
    validated first ("<path> is invalid Parquet file, magic: [..]",
    Java signed-byte rendering), then the footer length against the file
    size ("EOF when reading Parquet metadata ..."). Like the reference
    this costs one extra 4-byte head read per file (3 reads total); the
    tail-magic guard is an additional check the reference leaves to the
    Thrift parser.
    """
    fs, p = resolve_filesystem(path)
    with fs.open_input_file(p) as f:
        if size is None:
            size = f.size()
        if size < 12:
            raise ValueError(f"File {path} is too small to be a parquet file: {size} bytes")
        head = f.read(4)
        if head != MAGIC:
            raise ValueError(
                f"{path} is invalid Parquet file, magic: {_java_bytes_str(head)}"
            )
        f.seek(size - 8)
        tail = f.read(8)
        if tail[4:] != MAGIC:
            raise ValueError(f"File {path} is not a parquet file: invalid magic in tail")
        meta_len = struct.unpack("<i", tail[:4])[0]
        if meta_len <= 0 or size < meta_len + 8:
            raise ValueError(
                f"EOF when reading Parquet metadata for {path}, "
                f"file {size}, metadata {meta_len}"
            )
        f.seek(size - 8 - meta_len)
        blob = f.read(meta_len)
    return parse_file_metadata(blob), meta_len


# ---------------------------------------------------------------------------
# message-type printer (parquet-mr MessageType.toString equivalent)
# ---------------------------------------------------------------------------


def _leaf_str(el: SchemaElement) -> str:
    t = PHYSICAL_TYPES[el.type] if el.type is not None else "UNKNOWN"
    # parquet-mr prints lower-case primitive names; binary stays "binary"
    name_map = {
        "BOOLEAN": "boolean",
        "INT32": "int32",
        "INT64": "int64",
        "INT96": "int96",
        "FLOAT": "float",
        "DOUBLE": "double",
        "BINARY": "binary",
        "FIXED_LEN_BYTE_ARRAY": f"fixed_len_byte_array({el.type_length})",
    }
    return name_map[t]


def _annotation(el: SchemaElement) -> str:
    if el.converted_type is None:
        return ""
    ct = CONVERTED_TYPES.get(el.converted_type, "")
    if ct == "DECIMAL":
        return f" (DECIMAL({el.precision},{el.scale}))"
    return f" ({ct})" if ct else ""


def _render(elements: list, idx: int, indent: int, out: list) -> int:
    """Render element at ``idx`` (and its subtree); return next index."""
    el = elements[idx]
    pad = "  " * indent
    rep = REPETITION_TYPES[el.repetition_type] if el.repetition_type is not None else "optional"
    idx += 1
    if el.num_children:
        out.append(f"{pad}{rep} group {el.name}{_annotation(el)} {{")
        for _ in range(el.num_children):
            idx = _render(elements, idx, indent + 1, out)
        out.append(f"{pad}}}")
    else:
        fid = f" = {el.field_id}" if el.field_id is not None else ""
        out.append(f"{pad}{rep} {_leaf_str(el)} {el.name}{_annotation(el)}{fid};")
    return idx


def schema_to_string(meta: FileMetaData) -> str:
    """Reconstruct the ``message <root> { ... }`` printable schema from the
    flat SchemaElement list (reference SchemaUtil.java; test contract is the
    ``message spark_schema`` prefix, DefaultSourceSuite.scala:131-133)."""
    if not meta.schema:
        return "message root {\n}"
    root = meta.schema[0]
    out = [f"message {root.name} {{"]
    idx = 1
    for _ in range(root.num_children):
        idx = _render(meta.schema, idx, 1, out)
    out.append("}")
    return "\n".join(out)


def leaf_columns(meta: FileMetaData) -> list:
    """Flat list of leaf SchemaElements in column order."""
    leaves = []

    def walk(idx: int) -> int:
        el = meta.schema[idx]
        idx += 1
        if el.num_children:
            for _ in range(el.num_children):
                idx = walk(idx)
        else:
            leaves.append(el)
        return idx

    i = 1
    root = meta.schema[0]
    for _ in range(root.num_children):
        i = walk(i)
    return leaves
