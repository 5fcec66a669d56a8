"""Object-store portability of the index maintenance plane (r12):

- the POINTER layout (live index at ``path/gen-*`` named by an atomic
  ``CURRENT`` pointer) serves BIT-identically to the flat layout
  through the whole lifecycle — build, increment, delete, probe,
  MoreLikeThis-from-index, verified compaction, fsck;
- the pointer lifecycle never needs a filesystem rename (proven by
  running it end-to-end on a rename-INCAPABLE lakefs — the S3
  semantic), while the flat layout's rename swap refuses loudly there;
- ``vacuum=False`` retains the superseded generation so a scan already
  in flight keeps its files across a compaction (the snapshot
  grace-period contract), and ``vacuum_generations`` reclaims retained
  and orphaned generations afterwards.
"""

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _gen_dirs(path):
    return sorted(
        e for e in os.listdir(path)
        if e.startswith("gen-") and os.path.isdir(f"{path}/{e}")
    )


def test_bm25_pointer_lifecycle_equals_flat(spark, tmp_path):
    from parquet_metadata_explorer_spark.operators.fsck import (
        bm25_index_verify,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_compact,
        bm25_index_delete,
        bm25_index_increment,
        bm25_more_like_this_from_index,
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    flat, ptr = str(tmp_path / "flat"), str(tmp_path / "ptr")
    qs = [(1, "fast hash join"), (2, "window merge sort")]

    write_bm25_index(b1, flat)
    write_bm25_index(b1, ptr, layout="pointer")
    assert os.path.exists(f"{ptr}/CURRENT") and len(_gen_dirs(ptr)) == 1
    assert _rows(bm25_probe_topk(spark, ptr, qs, k=10)) == _rows(
        bm25_probe_topk(spark, flat, qs, k=10)
    )

    # increment + delete are layout-agnostic (they open through
    # resolve_index_root and write inside the live generation)
    for path in (flat, ptr):
        bm25_index_increment(b2, path, batch_id="adds-1")
        bm25_index_delete(
            spark, path, docs.filter(F.col("doc_id") % 7 == 3)
            .select("doc_id"), batch_id="del-1",
        )
    assert _rows(bm25_probe_topk(spark, ptr, qs, k=10)) == _rows(
        bm25_probe_topk(spark, flat, qs, k=10)
    )
    assert _rows(
        bm25_more_like_this_from_index(spark, ptr, k=5, m_terms=4)
    ) == _rows(bm25_more_like_this_from_index(spark, flat, k=5, m_terms=4))

    # verified compaction publishes by CURRENT flip; the superseded
    # generation is vacuumed delete-after-commit
    before = _rows(bm25_probe_topk(spark, ptr, qs, k=10))
    assert bm25_index_compact(spark, ptr, verify=True) == 3
    assert len(_gen_dirs(ptr)) == 1  # old generation reclaimed
    assert _rows(bm25_probe_topk(spark, ptr, qs, k=10)) == before
    rep = {r.defect for r in bm25_index_verify(spark, ptr).collect()}
    assert rep == {"ok"}
    # a rebuild over the pointer path keeps the pointer layout (auto)
    write_bm25_index(docs, ptr)
    assert len(_gen_dirs(ptr)) == 1 and os.path.exists(f"{ptr}/CURRENT")


def test_ivfpq_pointer_lifecycle_equals_flat(spark, tmp_path):
    from parquet_metadata_explorer_spark.operators.fsck import (
        ivfpq_index_verify,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_index_compact,
        ivfpq_index_delete,
        ivfpq_index_increment,
        ivfpq_probe_topk,
        write_ivfpq_index,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    b1 = e.filter(F.col("vec_id") % 2 == 0)
    b2 = e.filter(F.col("vec_id") % 2 == 1)
    queries = e.filter(F.col("vec_id").isin([0, 2, 4]))
    flat, ptr = str(tmp_path / "flat"), str(tmp_path / "ptr")
    kw = dict(k_cells=8, m=8, n_centroids=16, iters=2, coarse_iters=2)

    write_ivfpq_index(b1, flat, **kw)
    write_ivfpq_index(b1, ptr, layout="pointer", **kw)
    assert os.path.exists(f"{ptr}/CURRENT") and len(_gen_dirs(ptr)) == 1

    for path in (flat, ptr):
        ivfpq_index_increment(b2, path, batch_id="adds-1")
        ivfpq_index_delete(
            spark, path,
            e.filter(F.col("vec_id") % 9 == 5).select("vec_id"),
            batch_id="del-1",
        )
    probe = lambda p: _rows(  # noqa: E731
        ivfpq_probe_topk(spark, p, queries, k=10, n_probe=4)
    )
    assert probe(ptr) == probe(flat)

    before = probe(ptr)
    assert ivfpq_index_compact(spark, ptr, verify=True) == 3
    assert len(_gen_dirs(ptr)) == 1
    assert probe(ptr) == before
    rep = {r.defect for r in ivfpq_index_verify(spark, ptr).collect()}
    assert rep == {"ok"}


def test_pointer_lifecycle_never_renames(spark, tmp_path, monkeypatch):
    """THE object-store proof: run the full BM25 lifecycle with lakefs
    forced rename-INCAPABLE (every maintenance write is a direct
    atomic-PUT-style create; ``move`` raises) — pointer layout
    completes end-to-end, flat compaction refuses loudly."""
    from pyarrow import fs as pafs

    from parquet_metadata_explorer_spark.operators import lakefs
    from parquet_metadata_explorer_spark.operators.fsck import (
        bm25_index_verify,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_compact,
        bm25_index_delete,
        bm25_index_increment,
        bm25_probe_topk,
        write_bm25_index,
    )

    monkeypatch.setattr(
        lakefs,
        "_TEST_FS_FACTORY",
        lambda path: (
            lakefs.Lake(pafs.LocalFileSystem(), rename_capable=False),
            path,
        ),
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    qs = [(1, "fast hash join")]
    ptr = str(tmp_path / "ptr")

    write_bm25_index(b1, ptr, layout="pointer")
    bm25_index_increment(b2, ptr, batch_id="adds-1")
    bm25_index_delete(
        spark, ptr,
        docs.filter(F.col("doc_id") % 7 == 3).select("doc_id"),
        batch_id="del-1",
    )
    assert bm25_index_compact(spark, ptr, verify=True) == 3
    assert bm25_probe_topk(spark, ptr, qs, k=10).count() == 10
    assert {r.defect for r in bm25_index_verify(spark, ptr).collect()} == {
        "ok"
    }

    # the flat layout's swap is impossible here and says so
    flat = str(tmp_path / "flat")
    write_bm25_index(b1, flat, layout="flat")
    bm25_index_increment(b2, flat, batch_id="adds-1")
    with pytest.raises(lakefs.UnsupportedOperation, match="no atomic rename"):
        bm25_index_compact(spark, flat)

    # the dense twin's full lifecycle also completes rename-free
    from parquet_metadata_explorer_spark.operators.fsck import (
        ivfpq_index_verify,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_index_compact,
        ivfpq_index_delete,
        ivfpq_index_increment,
        ivfpq_probe_topk,
        write_ivfpq_index,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    ap = str(tmp_path / "ann")
    write_ivfpq_index(
        e.filter(F.col("vec_id") % 2 == 0), ap, layout="pointer",
        k_cells=8, m=8, n_centroids=16, iters=2, coarse_iters=2,
    )
    ivfpq_index_increment(e.filter(F.col("vec_id") % 2 == 1), ap,
                          batch_id="adds-1")
    ivfpq_index_delete(
        spark, ap, e.filter(F.col("vec_id") % 9 == 5).select("vec_id"),
        batch_id="del-1",
    )
    assert ivfpq_index_compact(spark, ap, verify=True) == 3
    nn = ivfpq_probe_topk(
        spark, ap, e.filter(F.col("vec_id").isin([0, 2])), k=5, n_probe=4
    )
    assert nn.count() == 10
    assert {r.defect for r in ivfpq_index_verify(spark, ap).collect()} == {
        "ok"
    }


def test_retained_generation_serves_inflight_scans(spark, tmp_path):
    """The snapshot grace period (r11 verdict #8): compact with
    vacuum=False keeps the superseded generation on disk, so a scan
    whose plan was built BEFORE the flip still collects — while new
    opens resolve the new generation and stale pins fail loudly.
    vacuum_generations then reclaims the retained dir."""
    from parquet_metadata_explorer_spark.operators.segments import (
        vacuum_generations,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_compact,
        bm25_index_increment,
        bm25_index_snapshot,
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ptr = str(tmp_path / "ptr")
    qs = [(1, "fast hash join")]
    write_bm25_index(
        docs.filter(F.col("doc_id") % 2 == 0), ptr, layout="pointer"
    )
    bm25_index_increment(
        docs.filter(F.col("doc_id") % 2 == 1), ptr, batch_id="adds-1"
    )

    pin = bm25_index_snapshot(ptr)
    # an in-flight reader: plan resolved against the pre-compact
    # generation, not yet executed
    inflight = bm25_probe_topk(spark, ptr, qs, k=10, snapshot=pin)
    expected = _rows(bm25_probe_topk(spark, ptr, qs, k=10))

    assert bm25_index_compact(spark, ptr, vacuum=False) == 2
    assert len(_gen_dirs(ptr)) == 2  # superseded generation retained
    # the in-flight scan still reads its (retained) files
    assert _rows(inflight) == expected
    # a NEW open with the stale pin fails loudly on the generation
    with pytest.raises(ValueError, match="generation"):
        bm25_probe_topk(spark, ptr, qs, k=10, snapshot=pin).collect()
    # live reads resolve the compacted generation
    assert _rows(bm25_probe_topk(spark, ptr, qs, k=10)) == expected

    # drain complete -> reclaim; also covers crash-orphaned builds
    from parquet_metadata_explorer_spark.operators.segments import (
        begin_generation_build,
    )

    orphan = begin_generation_build(ptr)  # a crashed build: never flipped
    assert len(_gen_dirs(ptr)) == 3
    assert vacuum_generations(ptr) == 2
    assert len(_gen_dirs(ptr)) == 1
    assert not os.path.exists(orphan)
    assert _rows(bm25_probe_topk(spark, ptr, qs, k=10)) == expected


def test_hybrid_serving_and_takedown_on_pointer_indexes(spark, tmp_path):
    """Composition: the fused serving path (hybrid_rrf_probe) and the
    one-call takedown run unchanged over POINTER-layout indexes — the
    object-store layout is a drop-in for every consumer because the
    probes resolve through resolve_index_root, not the raw path."""
    from parquet_metadata_explorer_spark.operators.fsck import (
        bm25_index_verify,
        ivfpq_index_verify,
    )
    from parquet_metadata_explorer_spark.operators.pipelines import takedown
    from parquet_metadata_explorer_spark.operators.similarity import (
        hybrid_rrf_probe,
        write_ivfpq_index,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    bp, ip = str(tmp_path / "bm25"), str(tmp_path / "ann")
    bf, if_ = str(tmp_path / "bm25f"), str(tmp_path / "annf")
    kw = dict(k_cells=8, m=8, n_centroids=16, iters=2, coarse_iters=2)
    write_bm25_index(docs, bp, layout="pointer")
    write_ivfpq_index(e, ip, layout="pointer", **kw)
    write_bm25_index(docs, bf)
    write_ivfpq_index(e, if_, **kw)

    queries = (
        docs.filter(F.col("doc_id").isin([0, 2]))
        .join(e.withColumnRenamed("vec_id", "doc_id"), "doc_id")
        .select("doc_id", "text", "embedding")
    )
    got = _rows(hybrid_rrf_probe(spark, bp, ip, queries, k=6, k_each=12))
    want = _rows(hybrid_rrf_probe(spark, bf, if_, queries, k=6, k_each=12))
    assert got == want and got

    doomed = docs.filter(F.col("doc_id") % 5 == 1).select("doc_id")
    res = takedown(
        spark, doomed, bm25_path=bp, ivfpq_path=ip,
        batch_id="td-p", compact=True,
    )
    assert res["bm25"] > 0 and res["ivfpq"] > 0
    # compact=True resolved the tombstones physically INSIDE the new
    # generation (pointer publish), and both indexes stay fsck-clean
    bad = {r.doc_id for r in doomed.collect()}
    after = _rows(hybrid_rrf_probe(spark, bp, ip, queries, k=6, k_each=12))
    assert not bad & {r[1] for r in after}
    for rep in (bm25_index_verify(spark, bp), ivfpq_index_verify(spark, ip)):
        assert {r.defect for r in rep.collect()} == {"ok"}
    assert len(_gen_dirs(bp)) == 1 and len(_gen_dirs(ip)) == 1


def test_pointer_edge_guards(spark, tmp_path):
    """Edge contracts of the pointer machinery: a corrupted CURRENT
    pointer fails loudly with the expected-shape message (never a
    path traversal or a silent flat fallback), and vacuum_generations
    on a FLAT index is a 0 no-op."""
    from parquet_metadata_explorer_spark.operators.segments import (
        vacuum_generations,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ptr = str(tmp_path / "ptr")
    write_bm25_index(docs, ptr, layout="pointer")
    with open(f"{ptr}/CURRENT", "w") as f:
        f.write("../../etc")  # tampered pointer
    with pytest.raises(ValueError, match="invalid generation"):
        bm25_probe_topk(spark, ptr, [(1, "fast hash join")], k=5)

    flat = str(tmp_path / "flat")
    write_bm25_index(docs, flat)  # flat layout
    assert vacuum_generations(flat) == 0
    assert bm25_probe_topk(spark, flat, [(1, "fast hash join")], k=5).count() == 5


def test_flat_rebuild_on_pointer_layout_refuses(spark, tmp_path):
    """layout='flat' on a path that is already pointer-layout must
    RAISE (r12 ADVICE): the flat build would land next to CURRENT and
    leave it aimed at the old generation, so every subsequent open
    would silently serve the stale generation. Both index writers
    share the guard; the pre-existing index stays serveable after the
    refused call, and layout='auto' still rebuilds correctly."""
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_probe_topk,
        write_ivfpq_index,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    bp = str(tmp_path / "bm25")
    write_bm25_index(docs, bp, layout="pointer")
    with pytest.raises(ValueError, match="pointer-layout"):
        write_bm25_index(docs, bp, layout="flat")
    # the refused call must not have disturbed the live generation
    assert bm25_probe_topk(spark, bp, [(1, "fast hash join")], k=5).count() == 5
    write_bm25_index(docs, bp, layout="auto")  # rebuild = new generation
    assert bm25_probe_topk(spark, bp, [(1, "fast hash join")], k=5).count() == 5

    ip = str(tmp_path / "ann")
    write_ivfpq_index(emb, ip, k_cells=8, m=8, n_centroids=16, iters=2,
                      coarse_iters=2, layout="pointer")
    with pytest.raises(ValueError, match="pointer-layout"):
        write_ivfpq_index(emb, ip, k_cells=8, m=8, n_centroids=16, iters=2,
                          coarse_iters=2, layout="flat")
    q = emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding")
    assert ivfpq_probe_topk(spark, ip, q, k=5, n_probe=4).count() == 15
