"""Concurrent-writer stress for the segment commit protocol (r12,
r11 verdict #5): the docstring contract — concurrent increments with
DISTINCT batch ids are safe (disjoint partitions, separate commit
files, no shared mutable file) — exercised by actually racing two
driver threads against ONE index. Spark supports concurrent job
submission on a session; dynamic partition overwrite stages each job
privately, so neither writer can clobber the other's data or commit
row. Deletes are raced only against increments of DISJOINT doc sets
(the documented quiesce caveat covers same-doc races)."""

import threading

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _race(*fns):
    """Run callables in parallel threads; re-raise the first failure."""
    errs = []

    def wrap(fn):
        try:
            fn()
        except BaseException as e:  # noqa: BLE001 — surfaced below
            errs.append(e)

    threads = [threading.Thread(target=wrap, args=(fn,)) for fn in fns]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]


def test_bm25_concurrent_increments_and_delete(spark, tmp_path):
    from parquet_metadata_explorer_spark.operators.fsck import (
        bm25_index_verify,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_delete,
        bm25_index_increment,
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = docs.filter(F.col("doc_id") % 4 == 0)
    add1 = docs.filter(F.col("doc_id") % 4 == 1)
    add2 = docs.filter(F.col("doc_id") % 4 == 2)
    # delete targets live ONLY in the base segment — disjoint from
    # both concurrent increments (the documented safe overlap)
    doomed = base.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    path = str(tmp_path / "bm25")
    qs = [(1, "fast hash join"), (2, "window merge sort")]

    # phase 1: increment ∥ increment
    write_bm25_index(base, path)
    _race(
        lambda: bm25_index_increment(add1, path, batch_id="adds-1"),
        lambda: bm25_index_increment(add2, path, batch_id="adds-2"),
    )
    from parquet_metadata_explorer_spark.operators.text import _bm25_commits

    assert {"base", "adds-1", "adds-2"} <= set(_bm25_commits(path))
    assert {r.defect for r in bm25_index_verify(spark, path).collect()} == {
        "ok"
    }

    # phase 2: increment ∥ delete (disjoint ids)
    add3 = docs.filter(F.col("doc_id") % 4 == 3)
    _race(
        lambda: bm25_index_increment(add3, path, batch_id="adds-3"),
        lambda: bm25_index_delete(spark, path, doomed, batch_id="del-1"),
    )
    commits = _bm25_commits(path)
    assert {"adds-3", "del-1"} <= set(commits)
    assert {r.defect for r in bm25_index_verify(spark, path).collect()} == {
        "ok"
    }
    # the probe folds all five segments: equals a fresh single-writer
    # rebuild on the same final corpus
    final = docs.join(doomed, "doc_id", "left_anti")
    twin = str(tmp_path / "twin")
    write_bm25_index(final, twin)
    got = sorted(
        map(tuple, bm25_probe_topk(spark, path, qs, k=10).collect())
    )
    want = sorted(
        map(tuple, bm25_probe_topk(spark, twin, qs, k=10).collect())
    )
    assert got == want


def test_ivfpq_concurrent_increments(spark, tmp_path):
    from parquet_metadata_explorer_spark.operators.fsck import (
        ivfpq_index_verify,
    )
    from parquet_metadata_explorer_spark.operators.segments import (
        segment_commits,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_index_increment,
        ivfpq_probe_topk,
        write_ivfpq_index,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = e.filter(F.col("vec_id") % 3 == 0)
    add1 = e.filter(F.col("vec_id") % 3 == 1)
    add2 = e.filter(F.col("vec_id") % 3 == 2)
    path = str(tmp_path / "ann")
    write_ivfpq_index(base, path, k_cells=8, m=8, n_centroids=16,
                      iters=2, coarse_iters=2)
    _race(
        lambda: ivfpq_index_increment(add1, path, batch_id="adds-1"),
        lambda: ivfpq_index_increment(add2, path, batch_id="adds-2"),
    )
    commits = segment_commits(path, "IVF-PQ index")
    assert {"base", "adds-1", "adds-2"} <= set(commits)
    # corpus constants fold both writers' counts exactly
    assert sum(s["n_vectors"] for s in commits.values()) == e.count()
    assert {r.defect for r in ivfpq_index_verify(spark, path).collect()} == {
        "ok"
    }
    # every vector is servable
    queries = e.filter(F.col("vec_id").isin([0, 1, 2]))
    nn = ivfpq_probe_topk(spark, path, queries, k=5, n_probe=8)
    assert nn.count() == 15
