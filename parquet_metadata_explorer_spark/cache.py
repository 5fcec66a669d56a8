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

from pyspark.sql import DataFrame

_TRACKED: list = []


def track_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` + registration for later ``unpersist_all()``."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    _TRACKED.append(df)
    return df


from contextlib import contextmanager


@contextmanager
def persist_scope(blocking: bool = False):
    """Release ONLY the persists tracked inside the ``with`` block —
    the long-running-stream discipline: a ``foreachBatch`` handler that
    calls persisting operators (dedup kernels, the CM sketch, prepare
    stages) would otherwise pin one arrivals-sized cache entry per
    micro-batch until someone calls ``unpersist_all()``, which a
    24/7 ingest job never does. Scoped release keeps the session-level
    registry semantics for everyone else (entries tracked BEFORE the
    scope are untouched).

    Not safe under concurrent persisting jobs in one session (the
    registry is a plain list); streams already serialize their batches,
    which is the intended user."""
    mark = len(_TRACKED)
    try:
        yield
    finally:
        while len(_TRACKED) > mark:
            df = _TRACKED.pop()
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
        try:
            df.unpersist(blocking)
            released += 1
        except Exception:
            pass  # session already stopped
    return released
