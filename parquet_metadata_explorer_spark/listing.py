"""File listing + Hive-style partition discovery.

Parity target: reference ``DefaultSource.scala:157-163`` (InMemoryFileIndex)
and ``MetadataFileFormat.scala:64-95`` (FileInfo seeds + partition map).

Scale note (SURVEY §7 risk 4): the reference lists on the driver, which is
fine to ~10^5 files. ``list_files`` therefore supports a *distributed* mode:
when the root has many first-level subdirectories, the per-directory listing
runs as a Spark job (one task per directory) and only the resulting
FileInfo seeds come back to the driver. Either way the scan itself
parallelizes over files with ``numSlices = min(n_files, maxparts)``.

Deviation recorded (SURVEY §7 risk 5): partition values are kept as the
URL-decoded path strings verbatim (e.g. ``ts=2020-02-02 01:02:03``) instead
of round-tripping through typed parsing + Java ``Timestamp.toString``
(which would yield ``2020-02-02 01:02:03.0``). Lossless and deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional
from urllib.parse import unquote

from .parquet.io import resolve_filesystem

HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


@dataclass(frozen=True)
class FileInfo:
    """Per-file unit of parallelism (reference MetadataFileFormat.scala:23-28)."""

    path: str
    name: str
    size: int
    mtime: int  # epoch millis
    partition: tuple  # tuple of (key, value) pairs; empty when unpartitioned

    def partition_map(self) -> dict:
        # empty map for unpartitioned data, matching the reference where an
        # empty partition schema produces an empty map (MetadataFileFormat.scala:86-95)
        return dict(self.partition)


def _is_hidden(name: str) -> bool:
    # InMemoryFileIndex default path filter: skip _ and . prefixed entries
    return name.startswith("_") or name.startswith(".")


def parse_partition_values(root: str, file_path: str) -> tuple:
    """Extract Hive ``k=v`` path segments between root and the file."""
    rel = file_path[len(root) :].lstrip("/")
    parts = rel.split("/")[:-1]  # drop the filename
    out = []
    for seg in parts:
        if "=" in seg:
            k, _, v = seg.partition("=")
            v = unquote(v)
            out.append((unquote(k), None if v == HIVE_DEFAULT_PARTITION else v))
    return tuple(out)


def _mtime_millis(info) -> int:
    mt = info.mtime
    if mt is None:
        return 0
    return int(mt.timestamp() * 1000)


def list_files(
    path: str,
    spark=None,
    distributed_threshold: int = 64,
) -> list[FileInfo]:
    """List all data files under ``path`` (or the single file itself),
    discovering Hive partition columns from directory names.

    When ``spark`` is given and the root has ≥ ``distributed_threshold``
    first-level subdirectories, per-directory listing fans out as a Spark
    job so the driver never serially walks millions of files.
    """
    fs, p = resolve_filesystem(path)
    p = p.rstrip("/") or "/"
    info = fs.get_file_info(p)
    import pyarrow.fs as pafs

    if info.type == pafs.FileType.NotFound:
        raise FileNotFoundError(f"Path does not exist: {path}")

    if info.type == pafs.FileType.File:
        # single-file load (reference DefaultSourceSuite.scala:323-334)
        return [FileInfo(p, info.base_name, info.size, _mtime_millis(info), ())]

    root = p
    any_partition = False

    def finfo(i) -> FileInfo:
        pv = parse_partition_values(root, i.path)
        return FileInfo(i.path, i.base_name, i.size, _mtime_millis(i), pv)

    if spark is not None:
        sel = pafs.FileSelector(root, recursive=False)
        top = [i for i in fs.get_file_info(sel) if not _is_hidden(i.base_name)]
        dirs = [i.path for i in top if i.type == pafs.FileType.Directory]
        if len(dirs) >= distributed_threshold:
            files = [
                finfo(i)
                for i in top
                if i.type == pafs.FileType.File and not _is_hidden(i.base_name)
            ]
            sc = spark.sparkContext
            uri_prefix = path.split("://")[0] + "://" if "://" in path else ""

            def list_dir(d: str) -> list:
                dfs, dp = resolve_filesystem(uri_prefix + d if uri_prefix else d)
                out = []
                stack = [dp]
                while stack:
                    cur = stack.pop()
                    for i in dfs.get_file_info(pafs.FileSelector(cur, recursive=False)):
                        if _is_hidden(i.base_name):
                            continue
                        if i.type == pafs.FileType.Directory:
                            stack.append(i.path)
                        elif i.type == pafs.FileType.File:
                            out.append((i.path, i.base_name, i.size, _mtime_millis(i)))
                return out

            listed = (
                sc.parallelize(dirs, min(len(dirs), 256))
                .flatMap(list_dir)
                .collect()
            )
            files += [
                FileInfo(pp, nn, ss, mm, parse_partition_values(root, pp))
                for (pp, nn, ss, mm) in listed
            ]
            files.sort(key=lambda f: f.path)
            return files

    sel = pafs.FileSelector(root, recursive=True)
    files = []
    for i in fs.get_file_info(sel):
        if i.type != pafs.FileType.File or _is_hidden(i.base_name):
            continue
        # skip files inside hidden directories
        rel = i.path[len(root) :].lstrip("/")
        if any(_is_hidden(seg) for seg in rel.split("/")[:-1]):
            continue
        files.append(finfo(i))
    files.sort(key=lambda f: f.path)
    return files
