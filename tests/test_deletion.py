"""Tombstone deletes for the materialized indexes — the takedown /
right-to-be-forgotten half of the log-structured lifecycle.

The contracts under test:
- BM25: a probe after ``bm25_index_delete`` is BIT-identical to the
  same probe against an index rebuilt on the filtered corpus (negative
  df-delta segments + negative commit-row corpus constants fold through
  the probe's existing sums; the tombstone anti-join removes the
  postings).
- IVF-PQ: a probe after ``ivfpq_index_delete`` is BIT-identical to the
  same probe against a sibling index whose deleted vectors were never
  added (models frozen on the same base batch, so the equivalence is
  constructable through the public API).
- Both: deletes ride the shared segment-commit protocol (torn deletes
  invisible, committed-batch_id replays idempotent, compaction resolves
  deletes physically and clears the tombstones), and re-adding a
  tombstoned id before compaction fails loudly instead of being
  silently suppressed by the probes' anti-join.
"""

import os

import pytest
from pyspark.sql import functions as F

from parquet_metadata_explorer_spark.operators.segments import (
    segment_commits,
    write_tombstones,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_bm25_delete_equals_filtered_rebuild(spark, tmp_path):
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_compact,
        bm25_index_delete,
        bm25_index_increment,
        bm25_more_like_this,
        bm25_more_like_this_from_index,
        bm25_probe_topk,
        bm25_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "bm25")
    write_bm25_index(docs, path)

    doomed = docs.filter(F.col("doc_id") % 7 == 3).select("doc_id")
    survivors = docs.join(doomed, "doc_id", "left_anti")
    expected_n = doomed.count()
    qs = [(1, "fast hash join"), (2, "slow stream filter")]

    n = bm25_index_delete(spark, path, doomed, batch_id="del-1")
    assert n == expected_n

    # the probe equals BOTH the in-memory scorer over the filtered
    # corpus and a fresh index built on it — exact df / n_docs /
    # total_len via the negative-delta folds, postings via the
    # anti-join
    after = _rows(bm25_probe_topk(spark, path, qs, k=10))
    assert after == _rows(bm25_topk(survivors, qs, k=10))
    fresh = str(tmp_path / "fresh")
    write_bm25_index(survivors, fresh)
    assert after == _rows(bm25_probe_topk(spark, fresh, qs, k=10))
    # no deleted doc can appear in any result
    deleted_ids = {r.doc_id for r in doomed.collect()}
    assert not deleted_ids & {t[1] for t in after}

    # the corpus-sized batch job inherits the same equivalence
    assert _rows(
        bm25_more_like_this_from_index(spark, path, k=5, m_terms=4)
    ) == _rows(bm25_more_like_this(survivors, k=5, m_terms=4))

    # deleting ids that are absent (or already tombstoned) writes
    # nothing — no new commit row, no empty segments
    before_commits = set(segment_commits(path, "BM25 index"))
    assert bm25_index_delete(spark, path, [999999, 888888]) == 0
    assert bm25_index_delete(spark, path, doomed) == 0
    assert set(segment_commits(path, "BM25 index")) == before_commits

    # compaction resolves the delete physically: probe unchanged,
    # tombstones gone, no deleted doc's postings survive
    assert bm25_index_compact(spark, path) >= 1
    assert _rows(bm25_probe_topk(spark, path, qs, k=10)) == after
    assert not os.path.isdir(f"{path}/tombstones")
    left = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("doc_id").isin(sorted(deleted_ids)[:50]))
        .count()
    )
    assert left == 0

    # after compaction the doc_ids are free again: re-adding them makes
    # the index equal a full rebuild over the original corpus
    bm25_index_increment(docs.join(doomed, "doc_id", "left_semi"), path)
    full = str(tmp_path / "full")
    write_bm25_index(docs, full)
    assert _rows(bm25_probe_topk(spark, path, qs, k=10)) == _rows(
        bm25_probe_topk(spark, full, qs, k=10)
    )


def test_bm25_delete_commit_protocol(spark, tmp_path):
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_compact,
        bm25_index_delete,
        bm25_index_increment,
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "bm25")
    write_bm25_index(docs, path)
    qs = [(1, "fast hash join")]
    before = _rows(bm25_probe_topk(spark, path, qs, k=10))

    # a TORN delete (tombstone data written, no commit row) is
    # invisible to the probe — never half-applied
    torn_ids = docs.filter(F.col("doc_id") % 11 == 0).select("doc_id")
    write_tombstones(torn_ids, path, "torn-del")
    assert _rows(bm25_probe_topk(spark, path, qs, k=10)) == before
    # compaction (here: nothing to fold) still vacuums the torn segment
    assert bm25_index_compact(spark, path) == 0
    assert not os.path.isdir(f"{path}/tombstones/batch=torn-del")

    # a committed delete replayed under the same batch_id reports its
    # recorded count and writes nothing new
    doomed = docs.filter(F.col("doc_id") % 13 == 1).select("doc_id")
    n = bm25_index_delete(spark, path, doomed, batch_id="del-a")
    assert n == doomed.count()
    commits_after = segment_commits(path, "BM25 index")
    assert bm25_index_delete(spark, path, doomed, batch_id="del-a") == n
    assert segment_commits(path, "BM25 index") == commits_after

    # re-adding a tombstoned doc_id before compaction fails loudly
    readd = docs.join(doomed, "doc_id", "left_semi").limit(3)
    with pytest.raises(Exception, match="tombstoned"):
        bm25_index_increment(readd, path, batch_id="readd-1")
    # ...and the failed attempt committed nothing
    assert set(segment_commits(path, "BM25 index")) == set(commits_after)

    # reserved / unsafe batch ids are rejected before any work
    with pytest.raises(ValueError, match="Invalid batch_id"):
        bm25_index_delete(spark, path, doomed, batch_id="base")
    with pytest.raises(ValueError, match="Invalid batch_id"):
        bm25_index_delete(spark, path, doomed, batch_id="bad id!")


def test_ivfpq_delete_equals_never_added_sibling(spark, tmp_path):
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
    doomed = b2.filter(F.col("vec_id") % 4 == 1).select("vec_id")
    params = dict(k_cells=8, m=8, n_centroids=16, iters=2, coarse_iters=2)
    queries = e.filter(F.col("vec_id").isin([0, 2, 4]))

    # index under test: base(b1) + increment(b2) + delete(doomed ⊂ b2)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(b1, path, **params)
    ivfpq_index_increment(b2, path, batch_id="adds-1")
    n = ivfpq_index_delete(spark, path, doomed, batch_id="del-1")
    assert n == doomed.count()

    # sibling: SAME base batch (deterministic training → identical
    # frozen models) whose deleted vectors were never added
    sibling = str(tmp_path / "sibling")
    write_ivfpq_index(b1, sibling, **params)
    ivfpq_index_increment(
        b2.join(doomed, "vec_id", "left_anti"), sibling, batch_id="adds-1"
    )

    after = _rows(ivfpq_probe_topk(spark, path, queries, k=10, n_probe=3))
    assert after == _rows(
        ivfpq_probe_topk(spark, sibling, queries, k=10, n_probe=3)
    )
    deleted_ids = {r.vec_id for r in doomed.collect()}
    assert not deleted_ids & {t[1] for t in after}

    # the IVFADC-R exact-rerank serve path inherits the exclusion
    rr = _rows(
        ivfpq_probe_topk(
            spark, path, queries, k=5, n_probe=3, rerank=20, embeddings=e
        )
    )
    assert rr == _rows(
        ivfpq_probe_topk(
            spark, sibling, queries, k=5, n_probe=3, rerank=20, embeddings=e
        )
    )

    # absent / already-tombstoned ids: nothing written
    before_commits = set(segment_commits(path, "IVF-PQ index"))
    assert ivfpq_index_delete(spark, path, [999999]) == 0
    assert ivfpq_index_delete(spark, path, doomed) == 0
    assert set(segment_commits(path, "IVF-PQ index")) == before_commits
    # committed replay reports the recorded count, writes nothing
    assert ivfpq_index_delete(spark, path, doomed, batch_id="del-1") == n

    # re-add before compaction is rejected loudly
    with pytest.raises(Exception, match="tombstoned"):
        ivfpq_index_increment(
            e.join(doomed, "vec_id", "left_semi").limit(2),
            path,
            batch_id="readd-1",
        )

    # compaction resolves the delete physically and frees the ids
    assert ivfpq_index_compact(spark, path) >= 1
    assert (
        _rows(ivfpq_probe_topk(spark, path, queries, k=10, n_probe=3))
        == after
    )
    assert not os.path.isdir(f"{path}/tombstones")
    assert (
        spark.read.parquet(f"{path}/codes")
        .filter(F.col("vec_id").isin(sorted(deleted_ids)[:50]))
        .count()
        == 0
    )
    ivfpq_index_increment(
        e.join(doomed, "vec_id", "left_semi"), path, batch_id="readd-2"
    )
    # the re-added index serves the same rows as the never-deleted one
    full = str(tmp_path / "ivfpq-full")
    write_ivfpq_index(b1, full, **params)
    ivfpq_index_increment(b2, full, batch_id="adds-1")
    assert _rows(
        ivfpq_probe_topk(spark, path, queries, k=10, n_probe=3)
    ) == _rows(ivfpq_probe_topk(spark, full, queries, k=10, n_probe=3))


def test_rebuild_clears_stale_tombstones(spark, tmp_path):
    """A full rebuild over a path that previously saw deletes must not
    inherit the old incarnation's tombstones — they describe a corpus
    that no longer exists."""
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_delete,
        bm25_probe_topk,
        bm25_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "bm25")
    write_bm25_index(docs, path)
    doomed = docs.filter(F.col("doc_id") % 5 == 2).select("doc_id")
    assert bm25_index_delete(spark, path, doomed, batch_id="del-1") > 0

    write_bm25_index(docs, path)  # rebuild over the same path
    qs = [(1, "fast hash join"), (2, "window merge sort")]
    assert not os.path.isdir(f"{path}/tombstones")
    assert _rows(bm25_probe_topk(spark, path, qs, k=10)) == _rows(
        bm25_topk(docs, qs, k=10)
    )


def test_forget_documents_erases_only_affected_partitions(spark, tmp_path):
    """Pipeline-level physical erasure: only partitions holding doomed
    docs are rewritten (untouched partitions keep their exact files),
    the source-count catalog is decremented in a NEW version that
    carries the stream's BATCH/LINEAGE replay markers forward, the
    fingerprint catalogs are kept by contract, and the erase is
    idempotent and crash-healing."""
    from parquet_metadata_explorer_spark.operators.pipelines import (
        committed_batch_id,
        committed_lineage,
        forget_documents,
        initial_prepare_state,
        load_prepare_state,
        save_prepare_state,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    out = str(tmp_path / "corpus")
    for b in range(3):
        docs.filter(F.col("doc_id") % 3 == b).write.mode("overwrite").parquet(
            f"{out}/batch={b}"
        )
    state_dir = str(tmp_path / "state")
    state = initial_prepare_state(spark)
    state["source_counts"] = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    state["exact_fps"] = spark.createDataFrame([("aa",), ("bb",)], ["fp"])
    save_prepare_state(state, state_dir, 1, batch_id=2, lineage="lin-1")

    # doom a set confined to batches 0 and 1 (doc_id % 3 in {0, 1})
    doomed = docs.filter(F.col("doc_id") % 6 < 2).select("doc_id")
    expected = doomed.count()
    survivors = docs.join(doomed, "doc_id", "left_anti")

    def files(b):
        d = f"{out}/batch={b}"
        return sorted(
            (f, os.path.getmtime(f"{d}/{f}"))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    untouched_before = files(2)
    n = forget_documents(spark, out, doomed, state_dir=state_dir)
    assert n == expected
    # corpus at rest == survivors, untouched partition's files identical
    got = sorted(
        map(tuple, spark.read.parquet(out).select("doc_id", "source").collect())
    )
    assert got == sorted(
        map(tuple, survivors.select("doc_id", "source").collect())
    )
    assert files(2) == untouched_before

    # catalog version bumped, counts decremented, markers carried,
    # fingerprints kept by contract
    new_state, v = load_prepare_state(spark, state_dir)
    assert v == 2
    assert committed_batch_id(state_dir, v) == 2
    assert committed_lineage(state_dir, v) == "lin-1"
    want_counts = sorted(
        map(
            tuple,
            survivors.groupBy("source").agg(F.count("*").alias("n")).collect(),
        )
    )
    assert (
        sorted(map(tuple, new_state["source_counts"].collect())) == want_counts
    )
    assert sorted(r.fp for r in new_state["exact_fps"].collect()) == ["aa", "bb"]

    # idempotent: nothing left to erase, no new catalog version
    assert forget_documents(spark, out, doomed, state_dir=state_dir) == 0
    assert load_prepare_state(spark, state_dir)[1] == 2

    # erasing EVERY doc of one batch removes the partition entirely
    rest_b2 = docs.filter(F.col("doc_id") % 3 == 2).select("doc_id")
    assert forget_documents(spark, out, rest_b2) == rest_b2.count()
    assert not os.path.isdir(f"{out}/batch=2")

    # crash-heal: a stranded .retired partition (live missing) is
    # renamed back on the next run
    os.rename(f"{out}/batch=0", f"{out}/batch=0.retired")
    assert forget_documents(spark, out, [999999]) == 0
    assert os.path.isdir(f"{out}/batch=0")
    assert not os.path.isdir(f"{out}/batch=0.retired")


def test_delete_guards(spark, tmp_path):
    """Review hardening: an empty delete request returns 0 (no crash),
    and a delete batch_id colliding with a committed DATA segment
    raises instead of silently skipping the takedown."""
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_index_delete,
        ivfpq_index_increment,
        write_ivfpq_index,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_delete,
        bm25_index_increment,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "bm25")
    write_bm25_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    bm25_index_increment(
        docs.filter(F.col("doc_id") % 2 == 1), path, batch_id="adds-1"
    )
    assert bm25_index_delete(spark, path, []) == 0
    with pytest.raises(ValueError, match="DATA segment"):
        bm25_index_delete(spark, path, [1, 2], batch_id="adds-1")

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    ip = str(tmp_path / "ann")
    write_ivfpq_index(e.filter(F.col("vec_id") % 2 == 0), ip,
                      k_cells=8, m=8, n_centroids=16, iters=2, coarse_iters=2)
    ivfpq_index_increment(
        e.filter(F.col("vec_id") % 2 == 1), ip, batch_id="adds-1"
    )
    assert ivfpq_index_delete(spark, ip, []) == 0
    with pytest.raises(ValueError, match="DATA segment"):
        ivfpq_index_delete(spark, ip, [1], batch_id="adds-1")


def test_forget_crash_window_reconciles(spark, tmp_path):
    """Review hardening: a forget that dies between its partition
    swaps and its catalog commit leaves the FORGET-PENDING marker; the
    next call — even a no-op retry and even an empty request — first
    reconciles the catalog from the at-rest truth, so the drift can
    never be permanent. A non-default key with state_dir raises BEFORE
    any mutation."""
    from parquet_metadata_explorer_spark.operators.pipelines import (
        forget_documents,
        forget_pending_path,
        initial_prepare_state,
        load_prepare_state,
        save_prepare_state,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    out = str(tmp_path / "corpus")
    for b in range(2):
        docs.filter(F.col("doc_id") % 2 == b).write.parquet(f"{out}/batch={b}")
    state_dir = str(tmp_path / "state")
    state = initial_prepare_state(spark)
    # a DELIBERATELY stale catalog + the in-flight marker = the exact
    # post-swap pre-commit crash state
    state["source_counts"] = spark.createDataFrame(
        [("bogus", 10**6)], "source string, n_docs long"
    )
    save_prepare_state(state, state_dir, 1, batch_id=5, lineage="lin-9")
    open(forget_pending_path(state_dir), "w").write("in-flight")

    import os

    assert forget_documents(spark, out, [], state_dir=state_dir) == 0
    assert not os.path.exists(forget_pending_path(state_dir))
    new_state, v = load_prepare_state(spark, state_dir)
    want = sorted(
        map(
            tuple,
            docs.groupBy("source").agg(F.count("*").alias("n")).collect(),
        )
    )
    assert sorted(map(tuple, new_state["source_counts"].collect())) == want
    # the stream's replay markers survived the reconcile version
    from parquet_metadata_explorer_spark.operators.pipelines import (
        committed_batch_id,
        committed_lineage,
    )

    assert committed_batch_id(state_dir, v) == 5
    assert committed_lineage(state_dir, v) == "lin-9"

    with pytest.raises(ValueError, match="keyed on 'source'"):
        forget_documents(
            spark, out, [1], state_dir=state_dir, key="lang"
        )


def test_takedown_composes_all_surfaces(spark, tmp_path):
    """One call erases a doc set everywhere it is served: corpus at
    rest (+ catalog), BM25 index, IVF-PQ index — and a same-batch_id
    retry is idempotent across all three."""
    from parquet_metadata_explorer_spark.operators.fsck import (
        bm25_index_verify,
        corpus_verify,
        ivfpq_index_verify,
    )
    from parquet_metadata_explorer_spark.operators.pipelines import (
        initial_prepare_state,
        save_prepare_state,
        takedown,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_probe_topk,
        write_ivfpq_index,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = str(tmp_path / "corpus")
    docs.write.parquet(f"{out}/batch=0")
    state_dir = str(tmp_path / "state")
    st = initial_prepare_state(spark)
    st["source_counts"] = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    save_prepare_state(st, state_dir, 1)
    bp, ip = str(tmp_path / "bm25"), str(tmp_path / "ann")
    write_bm25_index(docs, bp)
    write_ivfpq_index(e, ip, k_cells=8, m=8, n_centroids=16, iters=2,
                      coarse_iters=2)

    doomed = docs.filter(F.col("doc_id") % 7 == 2).select("doc_id")
    n = doomed.count()
    res = takedown(
        spark, doomed, corpus_dir=out, state_dir=state_dir,
        bm25_path=bp, ivfpq_path=ip, batch_id="td-1",
    )
    assert res["corpus"] == n and res["ivfpq"] > 0 and res["bm25"] > 0

    bad = {r.doc_id for r in doomed.collect()}
    at_rest = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert not bad & at_rest
    hits = bm25_probe_topk(spark, bp, [(1, "fast hash join")], k=20)
    assert not bad & {r.doc_id for r in hits.collect()}
    nn = ivfpq_probe_topk(
        spark, ip, e.filter(F.col("vec_id").isin([0, 2])), k=20, n_probe=4
    )
    assert not bad & {r.neighbor_id for r in nn.collect()}

    # every surface still fsck-clean after the composed takedown
    for rep in (
        bm25_index_verify(spark, bp),
        ivfpq_index_verify(spark, ip),
        corpus_verify(spark, out, state_dir),
    ):
        assert {r.defect for r in rep.collect()} == {"ok"}

    # idempotent replay: the index halves report their recorded
    # counts, the corpus half finds nothing left
    res2 = takedown(
        spark, doomed, corpus_dir=out, state_dir=state_dir,
        bm25_path=bp, ivfpq_path=ip, batch_id="td-1",
    )
    assert res2["bm25"] == res["bm25"] and res2["ivfpq"] == res["ivfpq"]
    assert res2["corpus"] == 0
    # empty request touches nothing
    assert takedown(spark, [], corpus_dir=out, bm25_path=bp) == {
        "corpus": 0, "bm25": 0,
    }


def test_forget_on_fully_erased_corpus_returns_zero(spark, tmp_path):
    """r12 advice regression: once every partition has been erased the
    out_dir holds no batch=* dirs and has no schema to infer —
    forget_documents must return 0 (nothing left to forget), not fail
    with 'Unable to infer schema', mirroring the guard
    _reconcile_source_counts already applied on the catalog side."""
    from parquet_metadata_explorer_spark.operators.pipelines import (
        forget_documents,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    out = str(tmp_path / "corpus")
    docs.limit(20).write.parquet(f"{out}/batch=0")
    all_ids = docs.limit(20).select("doc_id")
    assert forget_documents(spark, out, all_ids) == 20
    assert not os.path.isdir(f"{out}/batch=0")
    # the corpus is now fully erased: both a real id set and a retry
    # of the same set come back 0 without touching Spark's reader
    assert forget_documents(spark, out, all_ids) == 0
    assert forget_documents(spark, out, [1, 2, 3]) == 0


def test_takedown_compact_makes_index_erasure_physical(spark, tmp_path):
    """r12 advice regression: takedown(compact=True) runs the verified
    compactions after the tombstone deletes, so the deleted documents'
    posting/code bytes leave the disk in the same call (tombstone
    segments resolved and vacuumed) — and the serving results are
    unchanged from the tombstone-only path."""
    from parquet_metadata_explorer_spark.operators.fsck import (
        bm25_index_verify,
        ivfpq_index_verify,
    )
    from parquet_metadata_explorer_spark.operators.pipelines import takedown
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_probe_topk,
        write_ivfpq_index,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    bp, ip = str(tmp_path / "bm25"), str(tmp_path / "ann")
    write_bm25_index(docs, bp)
    write_ivfpq_index(e, ip, k_cells=8, m=8, n_centroids=16, iters=2,
                      coarse_iters=2)

    doomed = docs.filter(F.col("doc_id") % 7 == 2).select("doc_id")
    bad = {r.doc_id for r in doomed.collect()}
    res = takedown(
        spark, doomed, bm25_path=bp, ivfpq_path=ip,
        batch_id="td-c", compact=True,
    )
    assert res["bm25"] > 0 and res["ivfpq"] > 0
    # physical: no tombstone segments remain on either index
    assert not os.path.isdir(f"{bp}/tombstones")
    assert not os.path.isdir(f"{ip}/tombstones")
    # serving correct and fsck-clean on the compacted state
    hits = bm25_probe_topk(spark, bp, [(1, "fast hash join")], k=20)
    assert not bad & {r.doc_id for r in hits.collect()}
    nn = ivfpq_probe_topk(
        spark, ip, e.filter(F.col("vec_id").isin([0, 2])), k=20, n_probe=4
    )
    assert not bad & {r.neighbor_id for r in nn.collect()}
    for rep in (bm25_index_verify(spark, bp), ivfpq_index_verify(spark, ip)):
        assert {r.defect for r in rep.collect()} == {"ok"}
