"""Filesystem access + buffered forward-only stream.

Parity target: reference ``RemoteInputStream.scala:16-168`` — a big-buffer
wrapper whose point is minimizing remote (S3/ABFS/DBFS) round-trips during
sequential page scans: in-buffer skips instead of remote seeks, forward-only
seek, and read/seek metrics. At 100 TB scale footer+page scans are pure
metadata I/O; the buffer (default 128 MiB ≈ one row group) keeps the number
of remote requests per column chunk at ~1.

Filesystem resolution goes through ``pyarrow.fs`` so the same code path
serves local tests and object stores on a real cluster.
"""

from __future__ import annotations

from typing import Optional

import pyarrow.fs as pafs

DEFAULT_BUFFER_SIZE = 128 * 1024 * 1024


def resolve_filesystem(path: str) -> tuple[pafs.FileSystem, str]:
    """Resolve a path/URI to (filesystem, fs-local path)."""
    if "://" in path:
        fs, p = pafs.FileSystem.from_uri(path)
        return fs, p
    return pafs.LocalFileSystem(), path


class ForwardSeekableStream:
    """Buffered, forward-seek-only reader over an opened input stream.

    Semantics mirror the reference (``RemoteInputStream.scala``): ``seek``
    within the current buffer is a pointer bump; past it, one underlying
    seek + buffer invalidation; backward seeks are rejected. ``remote_reads``
    / ``remote_seeks`` counters expose I/O behavior for tests and tuning
    (reference ``:130-136``).
    """

    def __init__(self, raw, buffer_size: int = DEFAULT_BUFFER_SIZE):
        if buffer_size < 1:
            raise ValueError(f"Invalid buffer size: {buffer_size}")
        self._raw = raw
        self._buffer_size = buffer_size
        self._buf = b""
        self._buf_pos = 0  # read cursor within _buf
        self._buf_start = 0  # file offset of _buf[0]
        self._raw_pos = 0  # file offset of the raw stream cursor
        self._closed = False
        self.remote_reads = 0
        self.remote_seeks = 0

    # -- internals ----------------------------------------------------
    def _assert_open(self):
        if self._closed:
            raise ValueError("Stream is closed")

    def _fill(self) -> bool:
        """Refill the buffer from the raw stream; False at EOF."""
        chunk = self._raw.read(self._buffer_size)
        self.remote_reads += 1
        if not chunk:
            return False
        self._buf_start = self._raw_pos
        self._raw_pos += len(chunk)
        self._buf = chunk
        self._buf_pos = 0
        return True

    # -- public API ---------------------------------------------------
    def tell(self) -> int:
        return self._buf_start + self._buf_pos

    def read(self, n: int = -1) -> bytes:
        self._assert_open()
        if n < 0:
            raise ValueError("unbounded read not supported")
        out = bytearray()
        while n > 0:
            avail = len(self._buf) - self._buf_pos
            if avail == 0:
                if not self._fill():
                    break
                continue
            take = min(avail, n)
            out += self._buf[self._buf_pos : self._buf_pos + take]
            self._buf_pos += take
            n -= take
        return bytes(out)

    def read_fully(self, n: int) -> bytes:
        b = self.read(n)
        if len(b) != n:
            raise EOFError(f"unexpected EOF: wanted {n} bytes, got {len(b)}")
        return b

    def seek(self, pos: int) -> None:
        self._assert_open()
        cur = self.tell()
        if pos < cur:
            raise ValueError(f"Backward seek not supported: {pos} < {cur}")
        in_buffer_end = self._buf_start + len(self._buf)
        if pos <= in_buffer_end:
            # in-buffer skip: no remote I/O (reference :89-95)
            self._buf_pos = pos - self._buf_start
            return
        # past the buffer: one remote seek, drop the buffer (reference :96-99)
        self._raw.seek(pos)
        self.remote_seeks += 1
        self._raw_pos = pos
        self._buf = b""
        self._buf_pos = 0
        self._buf_start = pos

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            try:
                self._raw.close()
            except Exception:
                pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
