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


def test_hybrid_probe_is_pinnable_end_to_end(spark, tmp_path):
    """The fused serving path accepts both pins: a hybrid probe with
    snapshots taken before new arrivals serves the pre-arrival fusion
    bit-for-bit."""
    from parquet_metadata_explorer_spark.operators.similarity import (
        hybrid_rrf_probe,
        ivfpq_index_increment,
        ivfpq_index_snapshot,
        write_ivfpq_index,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_increment,
        bm25_index_snapshot,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    half = F.col("doc_id") % 2 == 0
    bp, ip = str(tmp_path / "bm25"), str(tmp_path / "ann")
    write_bm25_index(docs.filter(half), bp)
    write_ivfpq_index(
        e.filter(F.col("vec_id") % 2 == 0), ip,
        k_cells=8, m=8, n_centroids=16, iters=2, coarse_iters=2,
    )
    queries = (
        docs.filter(F.col("doc_id").isin([0, 2]))
        .join(e.withColumnRenamed("vec_id", "doc_id"), "doc_id")
        .select("doc_id", "text", "embedding")
    )
    pins = dict(
        bm25_snapshot=bm25_index_snapshot(bp),
        ivfpq_snapshot=ivfpq_index_snapshot(ip),
    )
    before = _rows(hybrid_rrf_probe(spark, bp, ip, queries, k=6, k_each=12))

    bm25_index_increment(docs.filter(~half), bp, batch_id="adds-1")
    ivfpq_index_increment(
        e.filter(F.col("vec_id") % 2 == 1), ip, batch_id="adds-1"
    )
    live = _rows(hybrid_rrf_probe(spark, bp, ip, queries, k=6, k_each=12))
    pinned = _rows(
        hybrid_rrf_probe(spark, bp, ip, queries, k=6, k_each=12, **pins)
    )
    assert pinned == before
    assert live != before


def test_legacy_pin_against_rebuilt_index_raises(spark, tmp_path):
    """Review hardening: a pin WITHOUT a generation token (legacy
    layout) against a token-bearing index means the index was rebuilt
    since the pin — it must raise, not silently serve the new corpus."""
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_snapshot,
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "bm25")
    write_bm25_index(docs, path)
    legacy_pin = {"generation": None,
                  "batches": bm25_index_snapshot(path)["batches"]}
    with pytest.raises(ValueError, match="generation"):
        bm25_probe_topk(
            spark, path, [(1, "fast hash join")], k=5, snapshot=legacy_pin
        )


def test_pin_shape_guards(spark, tmp_path):
    """r12 advice regression: a malformed dict pin (no 'batches') gets
    a descriptive ValueError, a bare batch list is rejected outright
    (the old silent escape hatch could alias a compacted state), and
    the generation guard is skippable only by the explicit
    {'unchecked': True} opt-in."""
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_compact,
        bm25_index_increment,
        bm25_index_snapshot,
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "bm25")
    write_bm25_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    qs = [(1, "fast hash join")]
    pin = bm25_index_snapshot(path)

    with pytest.raises(ValueError, match="no 'batches' key"):
        bm25_probe_topk(spark, path, qs, k=5,
                        snapshot={"generation": pin["generation"]})
    with pytest.raises(ValueError, match="unchecked"):
        bm25_probe_topk(spark, path, qs, k=5, snapshot=list(pin["batches"]))

    # the explicit opt-in skips ONLY the generation check — missing
    # batches still fail loudly after a compaction folds them away
    live = _rows(bm25_probe_topk(spark, path, qs, k=5))
    assert _rows(
        bm25_probe_topk(
            spark, path, qs, k=5,
            snapshot={"batches": pin["batches"], "unchecked": True},
        )
    ) == live
    bm25_index_increment(docs.filter(F.col("doc_id") % 2 == 1), path,
                         batch_id="adds-1")
    bm25_index_compact(spark, path)
    with pytest.raises(ValueError, match="missing from the"):
        bm25_probe_topk(
            spark, path, qs, k=5,
            snapshot={"batches": ["adds-1"], "unchecked": True},
        )
