"""persist_scope ownership: a scope releases ONLY what it recorded."""

from parquet_metadata_explorer_spark.cache import (
    _TRACKED,
    persist_scope,
    track_persist,
    unpersist_all,
)


def test_persist_scope_releases_only_its_own(spark):
    """r10 ADVICE: a concurrent job's persist landing in the registry
    during a scope must NOT be unpersisted by that scope. Ownership is
    the scope token active at track time, not list position."""
    unpersist_all()
    session_df = track_persist(spark.range(3))  # session-level, pre-scope
    with persist_scope():
        scoped = track_persist(spark.range(4))
        # a "concurrent" session-level persist arriving mid-scope: tag
        # it by tracking from a thread with no active scope
        import threading

        box = {}

        def outsider():
            box["df"] = track_persist(spark.range(5))

        t = threading.Thread(target=outsider)
        t.start()
        t.join()
        assert scoped.storageLevel.useMemory
        assert box["df"].storageLevel.useMemory
    # scope released its own entry...
    assert not scoped.storageLevel.useMemory
    # ...but NOT the outsider's, and not the pre-scope session entry
    assert box["df"].storageLevel.useMemory
    assert session_df.storageLevel.useMemory
    assert len(_TRACKED) == 2
    assert unpersist_all() == 2


def test_persist_scope_nested_ownership(spark):
    unpersist_all()
    with persist_scope():
        outer = track_persist(spark.range(2))
        with persist_scope():
            inner = track_persist(spark.range(3))
        assert not inner.storageLevel.useMemory
        assert outer.storageLevel.useMemory
    assert not outer.storageLevel.useMemory
    assert len(_TRACKED) == 0
