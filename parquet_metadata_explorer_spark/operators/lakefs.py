"""Filesystem shim for the index/corpus MAINTENANCE plane.

The data plane was object-store-ready from the start: segment reads and
writes go through Spark (Hadoop connectors) or the pyarrow fs-options
passthrough in ``parquet/io.py``. The maintenance plane — commit files,
CURRENT pointers, GENERATION tokens, sidecars, vacuums, publish swaps —
was plain ``os``/``shutil``/``glob`` against local paths, which is the
one place the 100 TB story silently assumed a POSIX lake. This module
is the small surface those operations now route through, backed by
``pyarrow.fs`` so the SAME code runs against a local directory, an
``s3://`` bucket, or any filesystem pyarrow resolves from a URI.

Semantics contract (the S3 note, stated once and relied on everywhere):

- **Atomic publish.** On a rename-capable filesystem (local, HDFS)
  ``write_bytes``/``write_table`` stage to a dot-prefixed temp name and
  publish with a file move — the classic POSIX pattern. On an object
  store there is no rename, but a single-object PUT is atomic (readers
  see the old object or the new one, never a partial write), so the
  shim writes directly to the final key. Both paths give commit files
  and CURRENT pointers all-or-nothing visibility.
- **No directory renames off POSIX.** ``move`` raises
  ``UnsupportedOperation`` on a rename-incapable filesystem instead of
  degrading to a non-atomic copy+delete. Callers that need an atomic
  directory publish use the pointer-generation layout
  (``segments.resolve_index_root``): build a complete sibling
  generation dir, flip the one-object CURRENT pointer, then vacuum —
  delete-after-commit, never rename.
- **Deletes are not transactions.** ``rmtree`` on an object store is
  per-key deletion; a crash mid-vacuum leaves debris, never a broken
  index, because everything vacuumed was already unreferenced by the
  commit log / CURRENT pointer at the time of deletion.

Capability detection is by filesystem type: ``LocalFileSystem`` and
``HadoopFileSystem`` report ``rename_capable``; ``S3FileSystem``,
``GcsFileSystem`` and unknown handlers do not (conservative default —
a flat-namespace store pretending to rename would break the swap's
crash contract, which is worse than refusing).

Reference parity note: the reference engine's remote-store concern is
its read path (``RemoteInputStream.scala`` — buffered forward-only
reads over high-RTT stores, ported in ``parquet/io.py``); it has no
at-rest index lifecycle, so this module's write-side semantics are
new surface, designed from the object-store constraints themselves
(atomic PUT, no rename) rather than from any reference code.
"""

from __future__ import annotations

import io
import posixpath


class UnsupportedOperation(RuntimeError):
    """A maintenance op requested a primitive this filesystem cannot
    provide atomically (directory rename on an object store)."""


_RENAME_CAPABLE_TYPES = ("LocalFileSystem", "HadoopFileSystem")


class Lake:
    """One (filesystem, base-independent path) handle for maintenance
    ops. All paths passed to methods are FULL paths in the
    filesystem's own namespace (what ``for_path`` returned)."""

    def __init__(self, fs, rename_capable: bool | None = None):
        self.fs = fs
        if rename_capable is None:
            rename_capable = type(fs).__name__ in _RENAME_CAPABLE_TYPES
        self.rename_capable = bool(rename_capable)

    # -- resolution -------------------------------------------------
    @staticmethod
    def for_path(path: str) -> tuple["Lake", str]:
        """Resolve a user path to (Lake, fs-native path). Plain paths
        and ``file://`` URIs map to the local filesystem; any other
        scheme resolves through ``pyarrow.fs.FileSystem.from_uri``
        (s3://, gs://, hdfs://, ...)."""
        from pyarrow import fs as pafs

        override = _TEST_FS_FACTORY
        if override is not None:
            lake, p = override(path)
            if lake is not None:
                return lake, p
        if "://" in path:
            fs, p = pafs.FileSystem.from_uri(path)
            return Lake(fs), p
        return Lake(pafs.LocalFileSystem()), path

    # -- predicates / listing ----------------------------------------
    def _info(self, path: str):
        return self.fs.get_file_info(path)

    def exists(self, path: str) -> bool:
        from pyarrow import fs as pafs

        return self._info(path).type != pafs.FileType.NotFound

    def isdir(self, path: str) -> bool:
        from pyarrow import fs as pafs

        return self._info(path).type == pafs.FileType.Directory

    def listdir(self, path: str) -> list[str]:
        """Base names of the direct children of ``path`` (empty when
        the dir is missing — matching the vacuum/recovery callers'
        'nothing there yet' reading)."""
        from pyarrow import fs as pafs

        if not self.isdir(path):
            return []
        sel = pafs.FileSelector(path, recursive=False, allow_not_found=True)
        return sorted(
            posixpath.basename(i.path.rstrip("/"))
            for i in self.fs.get_file_info(sel)
        )

    # -- mutation -----------------------------------------------------
    def mkdirs(self, path: str) -> None:
        self.fs.create_dir(path, recursive=True)

    def rmtree(self, path: str) -> None:
        """Recursive delete, silent ONLY on a missing path (the
        shutil.rmtree ignore_errors idiom, narrowed: on an object
        store a transient network failure must NOT be mistaken for
        'already gone' — e.g. a vacuum that silently skips a retired
        generation, or a forget_pending marker that silently
        survives). Other errors propagate."""
        try:
            self.fs.delete_dir(path)
        except FileNotFoundError:
            pass
        except OSError:
            if self._missing(path):
                return
            raise

    def rmfile(self, path: str) -> None:
        """Delete one object, silent ONLY on a missing path — same
        narrowed contract as ``rmtree``."""
        try:
            self.fs.delete_file(path)
        except FileNotFoundError:
            pass
        except OSError:
            if self._missing(path):
                return
            raise

    def _missing(self, path: str) -> bool:
        """True iff the store positively reports the path absent —
        used to distinguish not-found (ignorable) from a transient
        failure (must propagate) when a delete raises a bare OSError
        (some pyarrow filesystems do not subclass FileNotFoundError)."""
        from pyarrow import fs as pafs

        try:
            return (
                self.fs.get_file_info(path).type == pafs.FileType.NotFound
            )
        except OSError:
            return False

    def move(self, src: str, dst: str) -> None:
        """Atomic rename. Refuses loudly on a filesystem without one —
        a copy+delete fallback would silently break the crash contract
        every swap caller documents."""
        if not self.rename_capable:
            raise UnsupportedOperation(
                f"rename {src!r} -> {dst!r}: this filesystem "
                f"({type(self.fs).__name__}) has no atomic rename. "
                "Use the pointer-generation layout (CURRENT flip + "
                "delete-after-commit vacuum) for publishes on object "
                "stores — see operators/segments.py."
            )
        self.fs.move(src, dst)

    def copy_tree(self, src: str, dst: str) -> None:
        """Recursive copy (stream-based — works on any filesystem;
        used for carrying immutable sidecars into a build dir).
        Destination dirs are created explicitly: ``pyarrow.fs``'s
        copy_files does not, and object stores have no dirs to make —
        create_dir is a no-op there."""
        from pyarrow import fs as pafs

        self.mkdirs(dst)
        sel = pafs.FileSelector(src, recursive=True, allow_not_found=True)
        infos = sorted(self.fs.get_file_info(sel), key=lambda i: i.path)
        for info in infos:
            rel = info.path[len(src) :].lstrip("/")
            if info.type == pafs.FileType.Directory:
                self.mkdirs(f"{dst}/{rel}")
            elif info.type == pafs.FileType.File:
                with self.fs.open_input_file(info.path) as fin:
                    with self.fs.open_output_stream(f"{dst}/{rel}") as fout:
                        fout.write(fin.read())

    # -- atomic small-file publish -------------------------------------
    def write_bytes(self, path: str, data: bytes) -> None:
        """All-or-nothing small-file publish: temp+move where rename
        exists, direct single-object write (atomic PUT) where it
        doesn't."""
        if self.rename_capable:
            tmp = posixpath.join(
                posixpath.dirname(path),
                f".{posixpath.basename(path)}.tmp",
            )
            with self.fs.open_output_stream(tmp) as f:
                f.write(data)
            self.fs.move(tmp, path)
        else:
            with self.fs.open_output_stream(path) as f:
                f.write(data)

    def read_bytes(self, path: str) -> bytes:
        with self.fs.open_input_file(path) as f:
            return f.read()

    def write_text(self, path: str, text: str) -> None:
        self.write_bytes(path, text.encode("utf-8"))

    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode("utf-8")

    def write_table(self, table, path: str) -> None:
        """One-row parquet sidecar/commit publish, same atomicity as
        write_bytes (serialize in memory — these tables are bytes- to
        KB-sized by construction)."""
        import pyarrow.parquet as pq

        buf = io.BytesIO()
        pq.write_table(table, buf)
        self.write_bytes(path, buf.getvalue())

    def read_table(self, path: str):
        import pyarrow.parquet as pq

        return pq.read_table(self.read_bytes_file(path))

    def parquet_num_rows(self, path: str) -> int:
        """Row count from one parquet file's FOOTER — a driver-side
        metadata read (no Spark job, no data pages touched); the same
        number a Spark metadata-only count() folds from the footers."""
        import pyarrow.parquet as pq

        with self.fs.open_input_file(path) as f:
            return pq.ParquetFile(f).metadata.num_rows

    def read_bytes_file(self, path: str):
        return io.BytesIO(self.read_bytes(path))


# test seam: tests install a factory returning a rename-incapable Lake
# to prove the pointer-generation lifecycle never needs a rename
_TEST_FS_FACTORY = None


def for_path(path: str) -> tuple[Lake, str]:
    return Lake.for_path(path)


def local_lake() -> Lake:
    from pyarrow import fs as pafs

    return Lake(pafs.LocalFileSystem())


__all__ = [
    "Lake",
    "UnsupportedOperation",
    "for_path",
    "local_lake",
]
