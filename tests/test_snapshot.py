"""Snapshot-isolation probes: a pinned batch list keeps serving
exactly the pinned index state while increments and deletes land —
and pins invalidate LOUDLY across compaction (batch ids fold away, so
a partial pin would serve a state that never existed)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_bm25_snapshot_probe_is_isolated(spark, tmp_path):
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_compact,
        bm25_index_delete,
        bm25_index_increment,
        bm25_index_snapshot,
        bm25_more_like_this_from_index,
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "bm25")
    qs = [(1, "fast hash join"), (2, "window merge sort")]

    write_bm25_index(b1, path)
    pin = bm25_index_snapshot(path)
    before = _rows(bm25_probe_topk(spark, path, qs, k=10))
    mlt_before = _rows(bm25_more_like_this_from_index(spark, path, k=5,
                                                      m_terms=4))
    # a pin taken now reads identically to the live probe
    assert _rows(bm25_probe_topk(spark, path, qs, k=10, snapshot=pin)) == before

    # increments AND deletes land; the pinned read never moves
    bm25_index_increment(b2, path, batch_id="adds-1")
    doomed = b1.filter(F.col("doc_id") % 6 == 0).select("doc_id")
    bm25_index_delete(spark, path, doomed, batch_id="del-1")
    live = _rows(bm25_probe_topk(spark, path, qs, k=10))
    assert live != before
    assert _rows(bm25_probe_topk(spark, path, qs, k=10, snapshot=pin)) == before
    assert _rows(
        bm25_more_like_this_from_index(spark, path, k=5, m_terms=4,
                                       snapshot=pin)
    ) == mlt_before
    # a fresh pin captures the live state, and stays stable afterwards
    pin2 = bm25_index_snapshot(path)
    assert _rows(bm25_probe_topk(spark, path, qs, k=10, snapshot=pin2)) == live

    # compaction folds batch ids away: the old pin fails LOUDLY
    bm25_index_compact(spark, path)
    with pytest.raises(ValueError, match="snapshot"):
        bm25_probe_topk(spark, path, qs, k=10, snapshot=pin2)
    # ...and a re-pin serves the same live rows
    pin3 = bm25_index_snapshot(path)
    assert _rows(bm25_probe_topk(spark, path, qs, k=10, snapshot=pin3)) == live


def test_ivfpq_snapshot_probe_is_isolated(spark, tmp_path):
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_index_compact,
        ivfpq_index_delete,
        ivfpq_index_increment,
        ivfpq_index_snapshot,
        ivfpq_probe_topk,
        write_ivfpq_index,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    b1 = e.filter(F.col("vec_id") % 2 == 0)
    b2 = e.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ann")
    write_ivfpq_index(b1, path, k_cells=8, m=8, n_centroids=16, iters=2,
                      coarse_iters=2)
    queries = e.filter(F.col("vec_id").isin([0, 2, 4]))
    pin = ivfpq_index_snapshot(path)
    before = _rows(ivfpq_probe_topk(spark, path, queries, k=10, n_probe=3))

    ivfpq_index_increment(b2, path, batch_id="adds-1")
    doomed = b1.filter(F.col("vec_id") % 8 == 0).select("vec_id")
    ivfpq_index_delete(spark, path, doomed, batch_id="del-1")
    live = _rows(ivfpq_probe_topk(spark, path, queries, k=10, n_probe=3))
    assert live != before
    assert (
        _rows(
            ivfpq_probe_topk(
                spark, path, queries, k=10, n_probe=3, snapshot=pin
            )
        )
        == before
    )

    ivfpq_index_compact(spark, path)
    with pytest.raises(ValueError, match="snapshot"):
        ivfpq_probe_topk(spark, path, queries, k=10, n_probe=3, snapshot=pin)
    pin2 = ivfpq_index_snapshot(path)
    assert (
        _rows(
            ivfpq_probe_topk(
                spark, path, queries, k=10, n_probe=3, snapshot=pin2
            )
        )
        == live
    )
