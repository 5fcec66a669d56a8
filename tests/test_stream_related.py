"""Streaming twin of the arrivals-only related-items refresh (r12
verdict #8): a foreachBatch handler that CDC-increments BOTH serving
indexes per micro-batch and recomputes neighbor lists through the
snapshot-pinned index-served hybrid graph.

Contracts pinned here:
- refresh="all": after 3 micro-batches the accumulated graph IS the
  batch graph on the union — ``read_related_items(out_dir)`` equals
  ``hybrid_knn_graph_from_index`` over the same streamed indexes with
  every committed document querying.
- refresh="arrivals": each micro-batch's stored rows are BIT-equal to
  the full operator run AS OF that batch's committed corpus, replayed
  post-hoc through snapshot pins {generation, batches ≤ i} — the
  as-of exactness the arrivals-priced mode actually promises (earlier
  documents' rows are deliberately not rewritten; refresh="all" or
  the compaction cadence closes that gap).
- replay safety: a second processAllAvailable is a no-op, and a FRESH
  checkpoint pointed at indexes that already hold streamed batches
  raises instead of silently no-op'ing increments.
"""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _arrivals_layout(spark, tmp_path):
    """base (doc_id%5<=1) + three arrival FILES (%5 == 2,3,4), each
    carrying (doc_id, text, embedding) — a hybrid-corpus CDC feed."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    joined = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    base = joined.filter(F.col("doc_id") % 5 <= 1)
    flat = str(tmp_path / "arrivals")
    os.makedirs(flat)
    for i, m in enumerate((2, 3, 4)):
        d = str(tmp_path / f"stage{i}")
        joined.filter(F.col("doc_id") % 5 == m).coalesce(1).write.parquet(d)
        shutil.copy(
            glob.glob(f"{d}/part-*.parquet")[0], f"{flat}/{i:03d}.parquet"
        )
    return base, joined, flat


def _build_indexes(base, tmp_path, tag):
    from parquet_metadata_explorer_spark.operators.similarity import (
        write_ivfpq_index,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        write_bm25_index,
    )

    bp = str(tmp_path / f"bm25_{tag}")
    ip = str(tmp_path / f"ann_{tag}")
    write_bm25_index(base.select("doc_id", "text"), bp)
    write_ivfpq_index(
        base.select(F.col("doc_id").alias("vec_id"), "embedding"),
        ip, k_cells=8, m=8, n_centroids=16, iters=2, coarse_iters=2,
    )
    return bp, ip


KW = dict(k=5, k_each=10, m_terms=6, max_df_ratio=0.25, n_probe=4)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_stream_related_items_all_equals_union_batch_graph(
    spark, tmp_path
):
    from parquet_metadata_explorer_spark.operators.pipelines import (
        read_related_items,
        stream_related_items,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        hybrid_knn_graph_from_index,
    )

    base, joined, flat = _arrivals_layout(spark, tmp_path)
    bp, ip = _build_indexes(base, tmp_path, "all")
    out = str(tmp_path / "out_all")
    base_emb = base.select(F.col("doc_id").alias("vec_id"), "embedding")
    q = stream_related_items(
        spark, flat, bp, ip, out,
        base_embeddings=base_emb, refresh="all", **KW,
    )
    q.processAllAvailable()
    q.stop()

    union_emb = joined.select(F.col("doc_id").alias("vec_id"), "embedding")
    expected = hybrid_knn_graph_from_index(spark, bp, ip, union_emb, **KW)
    assert _rows(read_related_items(spark, out)) == _rows(expected)


def test_related_items_takedown_erases_and_refreshes(spark, tmp_path):
    """Erasure propagated to the derived artifact: after
    related_items_takedown no doomed id or vector survives anywhere
    under out_dir; queries that referenced a doomed neighbor are
    re-retrieved bit-exact against the post-delete indexes; untouched
    queries keep their stored rows; a retry is a no-op."""
    from parquet_metadata_explorer_spark.operators.pipelines import (
        read_related_items,
        related_items_takedown,
        stream_related_items,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        hybrid_knn_graph_from_index,
    )

    base, joined, flat = _arrivals_layout(spark, tmp_path)
    bp, ip = _build_indexes(base, tmp_path, "td")
    out = str(tmp_path / "out_td")
    base_emb = base.select(F.col("doc_id").alias("vec_id"), "embedding")
    q = stream_related_items(
        spark, flat, bp, ip, out,
        base_embeddings=base_emb, refresh="arrivals", **KW,
    )
    q.processAllAvailable()
    q.stop()

    before = {
        (r.query_id, r.doc_id): (r.rrf_score, r.lex_rank, r.dense_rank,
                                 r.rank)
        for r in spark.read.parquet(f"{out}/graph").drop("batch").collect()
    }
    # doom 3 ARRIVAL docs that other queries cite as neighbors — this
    # exercises every path: doomed-query row drop, affected-query
    # refresh, and the embeddings-sidecar scrub
    import collections

    cited = collections.Counter(
        d for (qq, d) in before if qq != d
    )
    arrival_ids = {
        r.doc_id for r in joined.filter(F.col("doc_id") % 5 >= 2)
        .select("doc_id").collect()
    }
    doomed = sorted(
        i for i, _n in cited.most_common() if i in arrival_ids
    )[:3]
    assert len(doomed) == 3
    affected_exp = {
        qq for (qq, d) in before if d in doomed and qq not in doomed
    }

    union_emb = joined.select(F.col("doc_id").alias("vec_id"), "embedding")
    res = related_items_takedown(
        spark, out, bp, ip, doomed, union_emb, batch_id="td1", **KW
    )
    assert res["queries_refreshed"] == len(affected_exp)
    assert res["graph_rows_erased"] > 0
    assert res["sidecar_vectors_erased"] == 3

    # 1. EXACT erasure: no doomed id or vector anywhere at rest
    g = spark.read.parquet(f"{out}/graph")
    assert g.filter(
        F.col("query_id").isin(doomed) | F.col("doc_id").isin(doomed)
    ).count() == 0
    e = spark.read.parquet(f"{out}/embeddings")
    assert e.filter(F.col("vec_id").isin(doomed)).count() == 0

    # 2. refreshed queries bit-equal a full post-delete recompute
    cur = {
        (r.query_id, r.doc_id): (r.rrf_score, r.lex_rank, r.dense_rank,
                                 r.rank)
        for r in read_related_items(spark, out).collect()
    }
    survivors = union_emb.join(
        spark.createDataFrame([(i,) for i in doomed], ["vec_id"]),
        "vec_id", "left_anti",
    )
    full = {
        (r.query_id, r.doc_id): (r.rrf_score, r.lex_rank, r.dense_rank,
                                 r.rank)
        for r in hybrid_knn_graph_from_index(
            spark, bp, ip, survivors, **KW
        ).collect()
    }
    for qq in affected_exp:
        assert {kd: v for kd, v in cur.items() if kd[0] == qq} == {
            kd: v for kd, v in full.items() if kd[0] == qq
        }, f"refreshed query {qq} != post-delete recompute"

    # 3. untouched queries keep their stored rows verbatim
    untouched = {
        kd: v for kd, v in before.items()
        if kd[0] not in affected_exp and kd[0] not in doomed
    }
    assert {kd: v for kd, v in cur.items() if kd[0] in
            {k[0] for k in untouched}} == untouched

    # 4. retry finds nothing left
    res2 = related_items_takedown(
        spark, out, bp, ip, doomed, union_emb, batch_id="td1", **KW
    )
    assert res2["graph_rows_erased"] == 0
    assert res2["queries_refreshed"] == 0
    assert res2["sidecar_vectors_erased"] == 0


def test_related_items_takedown_under_refresh_all(spark, tmp_path):
    """Takedown against a refresh="all" graph — the scrub's other
    shape: every query has rows in EVERY batch partition (each "all"
    batch rewrites the whole graph), so doomed/affected rows span all
    partitions and the fresh replacements must land only in each
    query's LATEST partition to keep latest-wins resolution intact.
    After the call the current graph equals the full post-delete
    recompute for refreshed queries, doomed ids are gone everywhere,
    and untouched queries resolve to their pre-takedown rows."""
    from parquet_metadata_explorer_spark.operators.pipelines import (
        read_related_items,
        related_items_takedown,
        stream_related_items,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        hybrid_knn_graph_from_index,
    )

    base, joined, flat = _arrivals_layout(spark, tmp_path)
    bp, ip = _build_indexes(base, tmp_path, "tda")
    out = str(tmp_path / "out_tda")
    base_emb = base.select(F.col("doc_id").alias("vec_id"), "embedding")
    q = stream_related_items(
        spark, flat, bp, ip, out,
        base_embeddings=base_emb, refresh="all", **KW,
    )
    q.processAllAvailable()
    q.stop()

    before = {
        (r.query_id, r.doc_id): (r.rrf_score, r.lex_rank, r.dense_rank,
                                 r.rank)
        for r in read_related_items(spark, out).collect()
    }
    import collections

    cited = collections.Counter(d for (qq, d) in before if qq != d)
    arrival_ids = {
        r.doc_id for r in joined.filter(F.col("doc_id") % 5 >= 2)
        .select("doc_id").collect()
    }
    doomed = sorted(
        i for i, _n in cited.most_common() if i in arrival_ids
    )[:2]
    affected_exp = {
        qq for (qq, d) in before if d in doomed and qq not in doomed
    }
    union_emb = joined.select(F.col("doc_id").alias("vec_id"), "embedding")
    res = related_items_takedown(
        spark, out, bp, ip, doomed, union_emb, batch_id="tda1", **KW
    )
    assert res["sidecar_vectors_erased"] == 2

    g = spark.read.parquet(f"{out}/graph")
    assert g.filter(
        F.col("query_id").isin(doomed) | F.col("doc_id").isin(doomed)
    ).count() == 0

    cur = {
        (r.query_id, r.doc_id): (r.rrf_score, r.lex_rank, r.dense_rank,
                                 r.rank)
        for r in read_related_items(spark, out).collect()
    }
    survivors = union_emb.join(
        spark.createDataFrame([(i,) for i in doomed], ["vec_id"]),
        "vec_id", "left_anti",
    )
    full = {
        (r.query_id, r.doc_id): (r.rrf_score, r.lex_rank, r.dense_rank,
                                 r.rank)
        for r in hybrid_knn_graph_from_index(
            spark, bp, ip, survivors, **KW
        ).collect()
    }
    for qq in affected_exp:
        assert {kd: v for kd, v in cur.items() if kd[0] == qq} == {
            kd: v for kd, v in full.items() if kd[0] == qq
        }, f"refreshed query {qq} != post-delete recompute"
    untouched_keys = {
        kd for kd in before
        if kd[0] not in affected_exp and kd[0] not in doomed
    }
    assert {kd: cur[kd] for kd in untouched_keys} == {
        kd: before[kd] for kd in untouched_keys
    }


def test_stream_related_items_arrivals_asof_and_replay(spark, tmp_path):
    from parquet_metadata_explorer_spark.operators.pipelines import (
        stream_related_items,
    )
    from parquet_metadata_explorer_spark.operators.segments import (
        read_generation,
        resolve_index_root,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        hybrid_knn_graph_from_index,
    )

    base, joined, flat = _arrivals_layout(spark, tmp_path)
    bp, ip = _build_indexes(base, tmp_path, "arr")
    out = str(tmp_path / "out_arr")
    base_emb = base.select(F.col("doc_id").alias("vec_id"), "embedding")
    q = stream_related_items(
        spark, flat, bp, ip, out,
        base_embeddings=base_emb, refresh="arrivals", **KW,
    )
    q.processAllAvailable()
    # replay safety: nothing new arrives, nothing changes
    before = _rows(spark.read.parquet(f"{out}/graph"))
    q.processAllAvailable()
    q.stop()
    assert _rows(spark.read.parquet(f"{out}/graph")) == before

    # as-of exactness per micro-batch, replayed through snapshot pins
    union_emb = joined.select(F.col("doc_id").alias("vec_id"), "embedding")
    bm25_gen = read_generation(resolve_index_root(bp))
    ivf_gen = read_generation(resolve_index_root(ip))
    for i, m in enumerate((2, 3, 4)):
        stored = spark.read.parquet(f"{out}/graph/batch={i}")
        batches = ["base"] + [f"s{j}" for j in range(i + 1)]
        ids = joined.filter(F.col("doc_id") % 5 == m).select("doc_id")
        asof = hybrid_knn_graph_from_index(
            spark, bp, ip, union_emb,
            query_ids=ids,
            bm25_snapshot={"generation": bm25_gen, "batches": batches},
            ivfpq_snapshot={"generation": ivf_gen, "batches": batches},
            **KW,
        )
        assert _rows(stored) == _rows(asof), f"batch {i} as-of mismatch"

    # crash window: LINEAGE claimed + s<N> batches committed in the
    # indexes but NO COMMITTED marker (a crash between a batch's
    # increments and its marker). Simulated by erasing the marker AND
    # the checkpoint's last commit entry so Spark redelivers batch 2 —
    # the restart must replay idempotently through the lineage-claimed
    # path, never refuse its own s<N> batches as another run's.
    os.remove(f"{out}/_STATE/COMMITTED")
    os.remove(f"{out}/_checkpoint/commits/2")
    # Hadoop's checksum FS shadows every commit file with a .crc — the
    # replayed commit's rename refuses if the stale one survives
    crc = f"{out}/_checkpoint/commits/.2.crc"
    if os.path.exists(crc):
        os.remove(crc)
    q3 = stream_related_items(
        spark, flat, bp, ip, out,
        base_embeddings=base_emb, refresh="arrivals", **KW,
    )
    q3.processAllAvailable()
    exc = q3.exception()
    q3.stop()
    assert exc is None, f"crash-replay refused its own lineage: {exc}"
    assert _rows(spark.read.parquet(f"{out}/graph")) == before
    with open(f"{out}/_STATE/COMMITTED") as f:
        assert f.read().strip() == "2"  # the replayed marker re-landed

    # fresh checkpoint against already-streamed indexes must refuse
    # (the guard raises inside foreachBatch, so it surfaces either from
    # processAllAvailable or as the query's stored exception)
    q2 = stream_related_items(
        spark, flat, bp, ip, str(tmp_path / "out2"),
        base_embeddings=base_emb, refresh="arrivals", **KW,
    )
    try:
        with pytest.raises(Exception, match="already holds streamed batches"):
            q2.processAllAvailable()
            exc = q2.exception()
            assert exc is not None, "fresh-lineage stream did not fail"
            raise exc
    finally:
        q2.stop()

def test_takedown_fresh_rows_land_in_unaffected_latest_batch(
    spark, tmp_path
):
    """The r13 ADVICE medium: a refreshed query's fresh rows target its
    LATEST partition, which need not hold any doomed row (the doomed
    doc was its neighbor only in OLDER batches — the arrivals-cadence +
    periodic-refresh history). The swap set must include those landing
    partitions, or the recomputed rows are built and silently deleted
    with the build dir while the stale latest rows keep serving.

    Constructed directly on the artifact layout (a streamed refresh=
    "all" history cannot isolate this: the doomed doc's own query rows
    put every batch in the affected set): batch 0 = the full hybrid
    graph (cites the doomed doc), batch 1 = one query's later refresh
    that no longer cites it, score-perturbed so serving stale rows is
    detectable."""
    from parquet_metadata_explorer_spark.operators.pipelines import (
        read_related_items,
        related_items_takedown,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        hybrid_knn_graph_from_index,
    )

    base, joined, _flat = _arrivals_layout(spark, tmp_path)
    bp, ip = _build_indexes(joined, tmp_path, "land")
    out = str(tmp_path / "out_land")
    union_emb = joined.select(F.col("doc_id").alias("vec_id"), "embedding")
    g0 = hybrid_knn_graph_from_index(spark, bp, ip, union_emb, **KW)
    g0.write.parquet(f"{out}/graph/batch=0")
    union_emb.write.parquet(f"{out}/embeddings/batch=0")

    rows0 = {
        (r.query_id, r.doc_id): (r.rrf_score, r.lex_rank, r.dense_rank,
                                 r.rank)
        for r in g0.collect()
    }
    # doomed: a cited neighbor; q: a query citing it (and not doomed)
    doomed = next(d for (qq, d) in rows0 if qq != d)
    q_id = next(
        qq for (qq, d) in rows0 if d == doomed and qq != doomed
    )
    # batch 1: q_id's "later refresh" — its batch-0 rows minus the
    # doomed citation, scores shifted +1000 so stale serving is visible
    later = (
        g0.filter((F.col("query_id") == q_id) & (F.col("doc_id") != doomed))
        .withColumn("rrf_score", F.col("rrf_score") + F.lit(1000.0))
    )
    later.write.parquet(f"{out}/graph/batch=1")

    res = related_items_takedown(
        spark, out, bp, ip, [doomed], union_emb, batch_id="land1", **KW
    )
    assert q_id in {
        r.query_id
        for r in spark.read.parquet(f"{out}/graph")
        .select("query_id").distinct().collect()
    }
    assert res["queries_refreshed"] >= 1

    # exact erasure everywhere, including the swapped-in batch 1
    g = spark.read.parquet(f"{out}/graph")
    assert g.filter(
        (F.col("query_id") == doomed) | (F.col("doc_id") == doomed)
    ).count() == 0

    # q_id's SERVED rows are the post-delete recompute — not the stale
    # perturbed batch-1 rows (pre-fix: fresh rows were written to the
    # build dir's batch=1, never swapped, deleted)
    survivors = union_emb.filter(F.col("vec_id") != doomed)
    full = {
        (r.query_id, r.doc_id): (r.rrf_score, r.lex_rank, r.dense_rank,
                                 r.rank)
        for r in hybrid_knn_graph_from_index(
            spark, bp, ip, survivors, **KW
        ).collect()
        if r.query_id == q_id
    }
    cur = {
        (r.query_id, r.doc_id): (r.rrf_score, r.lex_rank, r.dense_rank,
                                 r.rank)
        for r in read_related_items(spark, out).collect()
        if r.query_id == q_id
    }
    assert cur == full, "stale latest-batch rows survived the takedown"
    assert all(v[0] < 999 for v in cur.values()), (
        "the perturbed stale rows are still being served"
    )

def test_stream_related_items_validates_base_embeddings(spark, tmp_path):
    """refresh="all" and rerank>0 require base_embeddings (r13 ADVICE):
    omitting it silently produced a graph missing every base document's
    rows — now as loud as the refresh-value check."""
    from parquet_metadata_explorer_spark.operators.pipelines import (
        stream_related_items,
    )

    base, joined, flat = _arrivals_layout(spark, tmp_path)
    bp, ip = _build_indexes(base, tmp_path, "val")
    with pytest.raises(ValueError, match="require base_embeddings"):
        stream_related_items(
            spark, flat, bp, ip, str(tmp_path / "o1"),
            refresh="all", **KW,
        )
    with pytest.raises(ValueError, match="require base_embeddings"):
        stream_related_items(
            spark, flat, bp, ip, str(tmp_path / "o2"),
            refresh="arrivals", rerank=3, **KW,
        )


def test_checkpoint_lineage_routes_through_lake(tmp_path):
    """The LINEAGE token is minted/read through the Lake shim so a
    checkpoint on an object-store URI resolves to ONE token everywhere
    (r13 ADVICE: the local-os.path version built a bogus local path for
    remote URIs and minted a different token per machine)."""
    from parquet_metadata_explorer_spark.operators.pipelines import (
        _checkpoint_lineage,
    )

    ckpt = str(tmp_path / "ckpt")
    t1 = _checkpoint_lineage(ckpt)
    t2 = _checkpoint_lineage(ckpt)
    assert t1 == t2 and len(t1) == 32
    # the token lives where the Lake shim put it — readable back
    with open(f"{ckpt}/LINEAGE") as f:
        assert f.read().strip() == t1
