"""Session-scoped registry for DataFrames the operators persist.

Several operators (minhash/simhash/ngram dedup, IVF build) persist an
intermediate that is referenced by more than one downstream branch —
Catalyst performs no common-subexpression elimination across self-join
branches, so without the persist the expensive kernel would evaluate
twice. Because the operators return lazy DataFrames, they cannot
unpersist before returning; instead every persist is tracked here and a
long-lived session releases them with ``unpersist_all()`` (exported as
``parquet_metadata_explorer_spark.unpersist_all``) once results are
consumed. The registry holds strong references on purpose: the JVM-side
cache outlives the Python DataFrame wrapper, so a weak reference would
lose the only unpersist handle while executor memory stays pinned.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_TRACKED: list = []
_OWNERS: list = []  # aligned with _TRACKED: owning scope token, None = session
_LOCAL = threading.local()  # per-thread stack of active persist_scope tokens


def _scope_stack() -> list:
    stack = getattr(_LOCAL, "stack", None)
    if stack is None:
        stack = _LOCAL.stack = []
    return stack


def track_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` + registration for later ``unpersist_all()``.
    Inside a ``persist_scope`` the entry is OWNED by that scope (the
    innermost one on this thread) and released at scope exit; otherwise
    it is session-level and lives until ``unpersist_all()``."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    stack = _scope_stack()
    _TRACKED.append(df)
    _OWNERS.append(stack[-1] if stack else None)
    return df


@contextmanager
def persist_scope(blocking: bool = False):
    """Release ONLY the persists this scope recorded — the
    long-running-stream discipline: a ``foreachBatch`` handler that
    calls persisting operators (dedup kernels, the CM sketch, prepare
    stages) would otherwise pin one arrivals-sized cache entry per
    micro-batch until someone calls ``unpersist_all()``, which a
    24/7 ingest job never does.

    Ownership, not list position: each entry is tagged with the scope
    token active on ITS thread when it was tracked, so a concurrent
    job's persists (session-level, or another thread's scope) are never
    released by the wrong scope — the r10 ADVICE misuse class fails
    safe instead of silently unpersisting someone else's cache. The
    scope stack is thread-local; nested scopes own only their own
    entries."""
    token = object()
    stack = _scope_stack()
    stack.append(token)
    try:
        yield
    finally:
        stack.remove(token)
        for i in range(len(_TRACKED) - 1, -1, -1):
            if _OWNERS[i] is token:
                df = _TRACKED.pop(i)
                _OWNERS.pop(i)
                try:
                    df.unpersist(blocking)
                except Exception:
                    pass  # session already stopped


def unpersist_all(blocking: bool = False) -> int:
    """Unpersist every operator-cached DataFrame; returns how many were
    released."""
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        _OWNERS.pop()
        try:
            df.unpersist(blocking)
            released += 1
        except Exception:
            pass  # session already stopped
    return released
