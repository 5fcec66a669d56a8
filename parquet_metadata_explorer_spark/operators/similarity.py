"""Approximate-nearest-neighbor search over an embedding column.

Two paths over ``embeddings(vec_id, embedding array<float>, label)``:

- ``cosine_topk`` — brute-force exact top-k. The query set is broadcast
  (it is small by definition); each executor scans only its partitions of
  the corpus and emits k rows per (partition, query); the final top-k per
  query is a tiny shuffle. This is the right plan even at 100 TB *when k
  and |queries| are small* — one corpus scan, no quadratic blowup.
- ``lsh_buckets`` / ``lsh_ann_topk`` — random-hyperplane sign LSH: each
  vector maps to a bucket of sign bits; candidates = corpus vectors in
  the query's bucket, ranked exactly. Trades recall for a corpus-scan →
  bucket-lookup reduction; hyperplanes are generated deterministically
  from md5 so the oracle engine can reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import track_persist
from ..functions import cosine, dlit, dot, ensure_parallelism

LSH_PLANES = 8


def stack_embeddings(values, who: str, ids=None, dim: int = None):
    """``np.stack`` for an embedding column with a DIAGNOSABLE failure
    mode: one ragged or null vector anywhere in a 100 TB corpus (a
    failed encoder batch) otherwise poisons every kernel with numpy's
    context-free "all input arrays must have the same shape" from deep
    inside an executor. This helper names the offending vec_ids (or
    batch positions) and points at ``embedding_health`` — fail fast,
    fail addressable. The green path is one null scan + the same single
    np.stack call.

    ``dim``, when the caller knows the model dimension (the query
    matrix's width, a centroid table), closes the partition hole:
    an Arrow batch that is INTERNALLY consistent but the wrong width
    (every kernel batch sees only its partition's rows) stacks fine and
    would otherwise surface as a shape error in the downstream GEMM."""
    import numpy as np

    def _detail():
        lens = {}
        for i, v in enumerate(values):
            key = "null" if v is None else len(v)
            lens.setdefault(key, []).append(
                ids[i] if ids is not None else i
            )
        return ", ".join(
            f"len={k}: {v[:5]}{'...' if len(v) > 5 else ''} ({len(v)} rows)"
            for k, v in sorted(lens.items(), key=lambda kv: -len(kv[1]))
        )

    def _fail(why):
        raise ValueError(
            f"{who}: {why} — every vector must share one model "
            f"dimension. Offending "
            f"{'vec_ids' if ids is not None else 'batch positions'} by "
            f"length: {_detail()}. Run similarity.embedding_health(df) "
            "to audit the corpus."
        ) from None

    if any(v is None for v in values):
        _fail("embedding column contains NULL vectors")
    try:
        mat = np.stack(values).astype(np.float64)
    except (ValueError, TypeError):
        _fail("embedding column is ragged")
    if mat.ndim != 2:
        _fail("embedding column is ragged")
    if dim is not None and mat.shape[1] != int(dim):
        _fail(
            f"embedding width {mat.shape[1]} != expected model "
            f"dimension {int(dim)}"
        )
    return mat


def embedding_health(embeddings: DataFrame, dim: int = None) -> DataFrame:
    """One-scan corpus audit for the embedding defects that poison or
    silently distort ANN/dedup kernels: null vectors, ragged lengths
    (vs ``dim``, defaulting to the corpus's majority length), non-finite
    components (NaN/Inf), and zero norms. Output: one row per defect
    class — (defect, n_rows, example_ids array, capped at 5) — plus an
    'ok' row, so `WHERE defect <> 'ok' AND n_rows > 0` is the release
    gate. Pure codegen: size/exists/aggregate expressions, one map pass,
    one tiny groupBy."""
    e = F.col("embedding")
    spark = embeddings.sparkSession
    if dim is None:
        mode = (
            embeddings.filter(e.isNotNull())
            .groupBy(F.size(e).alias("d"))
            .count()
            .orderBy(F.desc("count"), F.asc("d"))
            .limit(1)
            .collect()
        )
        dim = int(mode[0]["d"]) if mode else 0
    nonfinite = F.exists(
        e, lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == float("inf"))
    )
    sumsq = F.aggregate(
        e, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    defect = (
        F.when(e.isNull(), F.lit("null"))
        .when(F.size(e) != F.lit(int(dim)), F.lit("wrong_length"))
        .when(nonfinite, F.lit("non_finite"))
        .when(sumsq == 0.0, F.lit("zero_norm"))
        .otherwise(F.lit("ok"))
    )
    tagged = embeddings.select("vec_id", defect.alias("defect"))
    counts = tagged.groupBy("defect").agg(
        F.count("*").cast("long").alias("n_rows")
    )
    # bounded examples: the rank<=5 filter compiles to WindowGroupLimit,
    # which prunes to 5 rows per defect per map partition BEFORE the
    # shuffle — a collect_list over all ids would be corpus-sized state
    w = Window.partitionBy("defect").orderBy("vec_id")
    examples = (
        tagged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("defect")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("example_ids"))
    )
    return counts.join(examples, "defect").orderBy("defect")


def assert_embedding_health(
    embeddings: DataFrame, who: str = "embedding kernel", dim: int = None
) -> None:
    """Release-gate pre-flight over an embedding corpus: run the
    ``embedding_health`` audit and RAISE — with defect classes, counts
    and named example vec_ids — before the consumer launches any
    GEMM/Lloyd job. This replaces the first kernel's mid-job
    ``stack_embeddings`` failure (which names only the poisoned Arrow
    batch it happened to hit) with a whole-corpus verdict up front:
    one map pass + a defect-sized groupBy, then either silence or an
    addressable error. Opt-in via ``health_gate=True`` on the index
    builders / clustered dedup."""
    bad = [
        r
        for r in embedding_health(embeddings, dim=dim).collect()
        if r["defect"] != "ok" and r["n_rows"] > 0
    ]
    if bad:
        detail = "; ".join(
            f"{r['defect']}: {r['n_rows']} rows, e.g. "
            f"vec_ids {sorted(r['example_ids'])}"
            for r in bad
        )
        raise ValueError(
            f"{who}: embedding corpus failed the health gate — {detail}. "
            "Run similarity.embedding_health(df) for the full audit, "
            "repair or drop the named vectors, then rebuild."
        )


def cosine_topk(embeddings: DataFrame, query_ids, k: int = 10) -> DataFrame:
    """Exact top-k neighbors (by cosine) for each query vector, excluding
    self. Deterministic ranking: round to 6 decimals, tie-break on vec_id.

    Scoring runs as numpy GEMM per corpus partition against the broadcast
    query matrix (queries are small by definition); only |corpus|×|queries|
    scored rows reach the final per-query top-k window — one corpus scan,
    one small shuffle.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    spark = embeddings.sparkSession
    embeddings = ensure_parallelism(embeddings)
    qpdf = embeddings.filter(F.col("vec_id").isin(list(query_ids))).select(
        "vec_id", "embedding"
    ).toPandas()
    scored_empty_schema = "query_id long, neighbor_id long, cos double, rank long"
    if qpdf.empty:
        return spark.createDataFrame([], scored_empty_schema)
    q_ids = np.asarray(qpdf["vec_id"], dtype=np.int64)
    q_mat = stack_embeddings(
        qpdf["embedding"].to_numpy(), "cosine_topk queries", ids=list(q_ids)
    )
    # zero-norm contract: a zero-norm query has no defined cosine to
    # anything — it emits NO rows (dropped here); zero-norm corpus
    # vectors are excluded as candidates below. Never NaN in output.
    _qn = np.linalg.norm(q_mat, axis=1)
    # a degenerate query (zero norm, or NaN/Inf components making the
    # norm non-finite) has no defined cosine — it emits NO rows
    q_ok = np.isfinite(_qn) & (_qn > 0.0)
    q_ids, q_mat = q_ids[q_ok], q_mat[q_ok]
    if not len(q_ids):
        return spark.createDataFrame([], scored_empty_schema)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    scored_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def score(batches):
        ids_q, mat_q = bc.value
        for pdf in batches:
            n_ids = np.asarray(pdf["vec_id"], dtype=np.int64)
            n_mat = stack_embeddings(
                pdf["embedding"].to_numpy(), "cosine_topk corpus",
                ids=list(n_ids), dim=mat_q.shape[1],
            )
            _nn = np.linalg.norm(n_mat, axis=1)
            # degenerate corpus vectors (zero/non-finite norm) are
            # never candidates — same contract as the query side
            n_ok = np.isfinite(_nn) & (_nn > 0.0)
            n_ids, n_mat = n_ids[n_ok], n_mat[n_ok]
            if not len(n_ids):
                continue
            n_mat /= np.linalg.norm(n_mat, axis=1, keepdims=True)
            sims = n_mat @ mat_q.T  # (block, n_queries)
            # half-away-from-zero rounding, matching DuckDB/Spark round()
            sims = np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6
            # local top-k per (batch, query): only ≤ k rows per query leave
            # each batch, so the final window's input is bounded by
            # n_partitions × k × |queries| instead of |corpus| × |queries|
            out_q, out_n, out_c = [], [], []
            for qi in range(len(ids_q)):
                col = sims[:, qi]
                idx = np.nonzero(n_ids != ids_q[qi])[0]
                if len(idx) > k:
                    # exact top-k under (cos desc, neighbor_id asc): keep
                    # everything tied with the k-th cos, then lexsort
                    kth = np.partition(col[idx], len(idx) - k)[len(idx) - k]
                    idx = idx[col[idx] >= kth]
                    idx = idx[np.lexsort((n_ids[idx], -col[idx]))[:k]]
                out_q.append(np.full(len(idx), ids_q[qi], dtype=np.int64))
                out_n.append(n_ids[idx])
                out_c.append(col[idx])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cos": np.concatenate(out_c),
                }
            )

    scored = embeddings.select("vec_id", "embedding").mapInPandas(score, scored_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


def hybrid_knn_graph(
    documents: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
    m_terms: int = 8,
    max_df_ratio: float = 0.25,
    n_bands: int = 16,
    planes_per_band="auto",
) -> DataFrame:
    """Corpus-sized hybrid related-items graph: EVERY document's top-k
    related documents by Reciprocal Rank Fusion of the two corpus-scale
    retrievers — ``bm25_more_like_this`` (lexical, df-guarded term
    join) and ``knn_graph`` (dense, LSH-bucketed) — the corpus-as-
    queries twin of ``hybrid_rrf_topk`` exactly as the MoreLikeThis
    operator is the twin of ``bm25_topk``. Requires ``vec_id`` to
    carry the same ids as ``doc_id`` (the repo-wide embedding-table
    convention). Output (query_id, doc_id, rrf_score, lex_rank,
    dense_rank, rank).

    score(d) = Σ_sources 1/(rrf_k + rank_s(d)) — a doc found by one
    retriever contributes that one term; the fusion needs no score
    calibration across modalities (Cormack et al. 2009), which is what
    makes it safe to run blind over a whole corpus.

    Scale shape: both inputs are top-``k_each`` PER DOCUMENT (corpus ×
    k_each rows, linear in the corpus), fused by a union + per-(query,
    doc) max-merge sharing ONE query_id-keyed exchange with the ranking
    window, whose per-query groups are ≤ 2·k_each rows — uniform by
    construction, no skew surface.
    The heavy lifting lives in the two retrievers, each with its own
    documented scale story. RRF arithmetic is 1/(integer+integer) in
    doubles — engine-exact, no rounding discipline needed."""
    from pyspark.sql import Window

    from .text import bm25_more_like_this

    lex = bm25_more_like_this(
        documents, k=k_each, m_terms=m_terms, max_df_ratio=max_df_ratio
    ).select("query_id", "doc_id", F.col("rank").alias("lex_rank"))
    dense = knn_graph(
        embeddings, k=k_each, n_bands=n_bands,
        planes_per_band=planes_per_band,
    ).select(
        F.col("src").alias("query_id"),
        F.col("dst").alias("doc_id"),
        F.col("rank").alias("dense_rank"),
    )
    # union + groupBy instead of a full-outer join (r14): each side is
    # unique on (query_id, doc_id), so max() over the padded columns
    # reproduces the join's row exactly — and keying the one exchange by
    # query_id alone lets the per-(q,d) aggregation AND the per-query
    # ranking window below both reuse it (hashpartitioning(q) clusters
    # (q,d) too). Plan: 2 Exchange + 2 Sort + SortMergeJoin + a window
    # Exchange -> ONE Exchange total; per-query groups are <= 2*k_each
    # rows by construction, so the coarser key adds no skew surface.
    fused = (
        lex.withColumn("dense_rank", F.lit(None).cast("long"))
        .unionByName(
            dense.withColumn("lex_rank", F.lit(None).cast("long"))
        )
        .repartition("query_id")
        .groupBy("query_id", "doc_id")
        .agg(
            F.max("lex_rank").alias("lex_rank"),
            F.max("dense_rank").alias("dense_rank"),
        )
    )
    contrib = lambda c: F.when(  # noqa: E731
        F.col(c).isNotNull(), F.lit(1.0) / (F.lit(int(rrf_k)) + F.col(c))
    ).otherwise(F.lit(0.0))
    scored = fused.select(
        "query_id",
        "doc_id",
        (contrib("lex_rank") + contrib("dense_rank")).alias("rrf_score"),
        "lex_rank",
        "dense_rank",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
        .select(
            "query_id", "doc_id", "rrf_score", "lex_rank", "dense_rank",
            "rank",
        )
    )


def hybrid_knn_graph_from_index(
    spark,
    bm25_index_path: str,
    ivfpq_index_path: str,
    embeddings: DataFrame,
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
    m_terms: int = 8,
    max_df_ratio: float = 0.25,
    n_probe: int = 4,
    rerank: int = 0,
    query_ids=None,
    bm25_snapshot: dict = None,
    ivfpq_snapshot: dict = None,
) -> DataFrame:
    """``hybrid_knn_graph`` served ENTIRELY from the materialized
    indexes — the corpus-scale related-items job as a production
    maintenance task: the lexical side is MoreLikeThis over the
    committed BM25 postings (no tokenize, no corpus scan), the dense
    side probes the IVF-PQ codes with the corpus's embeddings as the
    query set (``table_mode=auto`` flips to the distributed ADC table
    above the driver ceiling — the r9 scale path), both fused through
    the shared ``_rrf_fuse``. ``query_ids`` restricts which documents
    query on BOTH sides — the INCREMENTAL related-items refresh: after
    a CDC increment to both indexes, pass the arrival ids (and their
    embeddings in ``embeddings``) and only the arrivals' neighbor
    lists are recomputed, priced arrivals-sized against the full
    committed corpus; restricted rows equal the full run's rows for
    those ids (pytest-asserted). ``*_snapshot`` pins make the whole
    refresh snapshot-isolated, like ``hybrid_rrf_probe``.

    Differs from the in-memory ``hybrid_knn_graph`` in the dense
    retriever (IVF-PQ ADC vs LSH-bucketed exact cosine — the
    documented recall trade; ``rerank`` buys recall back with exact
    rescoring of the top-C candidates); the fusion itself is the same
    code object, pinned by the recompute-from-components pytest.
    Output (query_id, doc_id, rrf_score, lex_rank, dense_rank, rank),
    self-matches dropped on both sides."""
    from pyspark.sql import Window

    from .text import bm25_more_like_this_from_index

    if query_ids is not None and not isinstance(query_ids, DataFrame):
        # materialize ONCE: both retrievers iterate query_ids, and a
        # one-shot generator would leave the second pass empty —
        # silently dropping the dense side of every arrival
        query_ids = spark.createDataFrame(
            [(int(i),) for i in query_ids], ["doc_id"]
        )

    def _lex():
        return bm25_more_like_this_from_index(
            spark,
            bm25_index_path,
            k=k_each,
            m_terms=m_terms,
            max_df_ratio=max_df_ratio,
            snapshot=bm25_snapshot,
            query_ids=query_ids,
        ).select("query_id", "doc_id", F.col("rank").alias("lex_rank"))

    def _dense_raw():
        qvecs = embeddings.select("vec_id", "embedding")
        if query_ids is not None:
            qvecs = qvecs.join(
                F.broadcast(
                    query_ids.select(
                        F.col("doc_id").alias("vec_id")
                    ).distinct()
                ),
                "vec_id",
                "left_semi",
            )
        return ivfpq_probe_topk(
            spark,
            ivfpq_index_path,
            qvecs,
            k=k_each + 1,  # +1 headroom: the self row drops below
            n_probe=n_probe,
            rerank=rerank,
            embeddings=embeddings,
            snapshot=ivfpq_snapshot,
            # unrestricted = corpus-as-queries, definitionally the batch
            # shape: the distributed ADC table has no driver ceiling and
            # wins even at a few hundred queries (measured 2x at |Q|=500
            # locally — the driver table is a Python pass over every
            # query), so don't let auto's serving-path threshold route a
            # corpus job through the driver. The arrivals-restricted
            # refresh keeps "auto": a 16-arrival set is serving-sized,
            # where the driver table is right.
            table_mode="auto" if query_ids is not None else "distributed",
        )

    # overlap the two retrievers' EAGER prep (guide §2.6 — concurrent
    # driver actions back-fill each other's idle executors): each side
    # pays sequential index opens, sidecar collects and — on the dense
    # side — the distributed-table persist + probed-cell collect before
    # any fused job can run; submitting both from a 2-thread pool runs
    # those waves concurrently. Pure orchestration: the DataFrames
    # produced are the same objects the sequential code built, fused by
    # the same _rrf_fuse.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        lex_f = pool.submit(_lex)
        dense_f = pool.submit(_dense_raw)
        lex = lex_f.result()
        dense_raw = dense_f.result()
    w_d = Window.partitionBy("query_id").orderBy("rank")
    dense = (
        dense_raw.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dense_rank", F.row_number().over(w_d).cast("long"))
        .filter(F.col("dense_rank") <= int(k_each))
        .select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            "dense_rank",
        )
    )
    return _rrf_fuse(lex, dense, k, rrf_k)


def hybrid_rrf_topk(
    documents: DataFrame,
    embeddings: DataFrame,
    query_ids,
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
    bm25_index_path: str = None,
) -> DataFrame:
    """Hybrid more-like-this retrieval: BM25 lexical top-k (the query
    document's own text as the query) fused with dense cosine top-k by
    Reciprocal Rank Fusion — score(d) = Σ_sources 1/(rrf_k + rank_s(d))
    (Cormack et al. 2009), the standard production fusion because it
    needs no score calibration across modalities. A doc found by only
    one retriever contributes that one term. Output (query_id, doc_id,
    rrf_score, lex_rank, dense_rank, rank).

    The lexical side ranks with the query doc itself in the candidate
    pool (it is its own best match), then drops the self row and
    re-ranks by original order — the oracle replays both steps exactly.
    Scale shape: all fusion inputs are top-k_each per query (serving-
    sized), so the fusion join and final window are trivially small —
    the heavy lifting lives in the two retrievers, each with its own
    documented scale story (bm25_topk: broadcast postings probe;
    cosine_topk: per-partition GEMM + local prune). RRF arithmetic is
    1/(integer+integer) in doubles — engine-exact with no rounding.
    """
    from .text import bm25_probe_topk, bm25_topk

    query_ids = [int(q) for q in query_ids]
    qtexts = {
        r.doc_id: r.text
        for r in documents.filter(F.col("doc_id").isin(query_ids))
        .select("doc_id", "text")
        .collect()
    }
    missing = sorted(set(query_ids) - set(qtexts))
    if missing:
        # a typo'd id would otherwise degrade to dense-only fusion with
        # no warning — fail loudly instead
        raise ValueError(
            f"query ids absent from documents: {missing} — more-like-this "
            "needs the query document's own text for the lexical side"
        )
    # NULL text is a real corpus state (failed extraction): that query
    # keeps its dense side and contributes no lexical terms
    queries = [(q, qtexts[q] or "") for q in sorted(qtexts)]

    def _lex():
        if bm25_index_path is not None:
            # serving composition: the lexical side probes the
            # materialized bucketed index (partition-pruned, join-free)
            # instead of re-scanning the corpus — bit-identical by the
            # disk ≡ memory contract, so the fused output is unchanged
            lex_raw = bm25_probe_topk(
                documents.sparkSession, bm25_index_path, queries, k=k_each
            )
        else:
            lex_raw = bm25_topk(documents, queries, k=k_each)
        w_lex = Window.partitionBy("query_id").orderBy("rank")
        return (
            lex_raw.filter(F.col("doc_id") != F.col("query_id"))
            .withColumn("lex_rank", F.row_number().over(w_lex).cast("long"))
            .select("query_id", "doc_id", "lex_rank")
        )

    def _dense():
        return cosine_topk(embeddings, query_ids, k=k_each).select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("dense_rank"),
        )

    # overlap the retrievers' eager prep (guide §2.6, the
    # hybrid_knn_graph_from_index discipline): the dense side's query
    # matrix collect and the lexical side's index/postings setup are
    # independent driver waves
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        lex_f = pool.submit(_lex)
        dense_f = pool.submit(_dense)
        lex = lex_f.result()
        dense = dense_f.result()
    return _rrf_fuse(lex, dense, k, rrf_k)


def _rrf_fuse(lex: DataFrame, dense: DataFrame, k: int, rrf_k: int):
    """Reciprocal Rank Fusion of two serving-sized rank lists — shared
    verbatim by the in-memory and the all-from-disk hybrid paths, so
    the two can only differ if a retriever differs (and each retriever
    carries its own disk ≡ memory contract)."""
    # same union+groupBy fusion as hybrid_knn_graph (r14): one exchange
    # keyed by query_id serves the (q,d) max-merge and the ranking
    # window; the former full-outer SortMergeJoin cost 2 Exchange +
    # 2 Sort + a third Exchange for the window
    merged = (
        lex.withColumn("dense_rank", F.lit(None).cast("long"))
        .unionByName(
            dense.withColumn("lex_rank", F.lit(None).cast("long"))
        )
        .repartition("query_id")
        .groupBy("query_id", "doc_id")
        .agg(
            F.max("lex_rank").alias("lex_rank"),
            F.max("dense_rank").alias("dense_rank"),
        )
    )
    fused = merged.select(
        "query_id",
        "doc_id",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("lex_rank")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("dense_rank")),
                F.lit(0.0),
            )
        ).alias("rrf_score"),
        "lex_rank",
        "dense_rank",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
        .select(
            "query_id", "doc_id", "rrf_score", "lex_rank", "dense_rank", "rank"
        )
    )


def hybrid_rrf_probe(
    spark,
    bm25_index_path: str,
    ivfpq_index_path: str,
    queries: DataFrame,
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
    n_probe: int = 4,
    rerank: int = 0,
    embeddings: DataFrame = None,
    bm25_snapshot: dict = None,
    ivfpq_snapshot: dict = None,
    query_mode: str = "auto",
) -> DataFrame:
    """Hybrid retrieval served ENTIRELY from materialized indexes — the
    production query path: the lexical side probes the bucketed BM25
    index (partition-pruned, join-free), the dense side probes the
    IVF-PQ index (cell-pruned ADC, optional IVFADC-R rerank), and the
    two rank lists fuse through the same ``_rrf_fuse`` the in-memory
    composition uses. ZERO corpus scans at query time; both probes read
    only the partitions their queries touch.

    ``queries`` is the at-query-time knowledge: (doc_id, text,
    embedding) — text feeds BM25, the vector feeds ADC (the index
    stores CODES, not raw vectors, so the query embedding must arrive
    with the query, exactly as a live service receives it). NULL text
    degrades that query to dense-only, matching ``hybrid_rrf_topk``'s
    null contract; self-matches drop on both sides.

    Differs from the in-memory ``hybrid_rrf_topk`` ONLY in the dense
    retriever (exact cosine vs IVF-PQ ADC — the documented
    recall-for-scan-reduction trade); with the same retriever outputs
    the fusion is bit-identical, which is what the composition pytest
    pins. ``bm25_snapshot`` / ``ivfpq_snapshot`` pin each side's index
    state (see ``bm25_index_snapshot``) so the FUSED serving path is
    snapshot-isolated end-to-end.

    ``query_mode`` passes through to ``bm25_probe_topk`` (r13 verdict
    #5): the lexical side no longer collects the query set
    unconditionally — ``auto`` runs the driver shape up to
    BM25_PROBE_DRIVER_MAX queries and the collect-free distributed
    shape above it, so the probe API itself has no driver ceiling
    (the dense side already took a DataFrame and routes through
    ``table_mode=auto``)."""
    from .text import bm25_probe_topk

    lex_raw = bm25_probe_topk(
        spark,
        bm25_index_path,
        queries.select(
            F.col("doc_id").alias("query_id"), "text"
        ),
        k=k_each,
        snapshot=bm25_snapshot,
        query_mode=query_mode,
    )
    w_lex = Window.partitionBy("query_id").orderBy("rank")
    lex = (
        lex_raw.filter(F.col("doc_id") != F.col("query_id"))
        .withColumn("lex_rank", F.row_number().over(w_lex).cast("long"))
        .select("query_id", "doc_id", "lex_rank")
    )
    qvecs = queries.select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    dense_raw = ivfpq_probe_topk(
        spark,
        ivfpq_index_path,
        qvecs,
        k=k_each + 1,  # +1 headroom: the self row drops below
        n_probe=n_probe,
        rerank=rerank,
        embeddings=embeddings,
        snapshot=ivfpq_snapshot,
    )
    w_d = Window.partitionBy("query_id").orderBy("rank")
    dense = (
        dense_raw.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dense_rank", F.row_number().over(w_d).cast("long"))
        .filter(F.col("dense_rank") <= int(k_each))
        .select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            "dense_rank",
        )
    )
    return _rrf_fuse(lex, dense, k, rrf_k)


def _plane_weight(plane: int, dim_col):
    """Deterministic pseudo-random hyperplane weight in [-0.5, 0.5).

    w(p, d) = (hash60(md5('p:d')) % 1000)/1000 - 0.5 — reproducible in
    DuckDB as (('0x'||substr(md5(p||':'||d),1,15))::bigint % 1000)/1000.0 - 0.5.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{plane}:"), dim_col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return (h % 1000) / F.lit(1000.0) - F.lit(0.5)


def lsh_buckets(embeddings: DataFrame, n_planes: int = LSH_PLANES) -> DataFrame:
    """Sign-LSH bucket id per vector: bit p = sign(dot(plane_p, v))."""
    embeddings = ensure_parallelism(embeddings)
    sign_bits = []
    for p in range(n_planes):
        plane_dot = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.sequence(F.lit(0), F.size("embedding") - 1),
                lambda v, i: v.cast("double") * _plane_weight(p, i),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sign_bits.append(
            F.when(plane_dot > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
        )
    bucket = sign_bits[0]
    for b in sign_bits[1:]:
        bucket = bucket + b
    return embeddings.withColumn("bucket", bucket)


def _plane_matrix(n_planes: int, dim: int):
    """numpy twin of ``_plane_weight``: the (n_planes × dim) hyperplane
    matrix with w[p,d] = (int(md5(f"{p}:{d}")[:15], 16) % 1000)/1000 - 0.5.

    The weights themselves are bit-identical to the Spark expression and
    the DuckDB oracle — pure constants of (plane, dim), so every engine
    (and every executor) regenerates them without any data movement. The
    resulting sign *bits* agree up to accumulation order: BLAS GEMM and a
    sequential list_dot_product can round differently, so a plane dot
    within ~1 ulp of 0 could in principle flip a bit between engines. If a
    flaky bucket mismatch ever appears, margin-test |dot| > eps or force
    identical left-to-right accumulation on both sides.
    """
    import hashlib

    import numpy as np

    w = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16)
            w[p, d] = (h % 1000) / 1000.0 - 0.5
    return w


def multiband_lsh_buckets(
    embeddings: DataFrame,
    n_bands: int = 4,
    planes_per_band: int = 8,
    with_embedding: bool = True,
) -> DataFrame:
    """Multi-band sign-LSH: one row per (vector, band) with the band's
    sign-bit bucket value. Two vectors are near-dup *candidates* if they
    share a bucket in ANY band (minhash-style banding for cosine space).

    Recall for a pair at angle θ with p = 1 - θ/π:
    1 - (1 - p^planes_per_band)^n_bands — raise ``planes_per_band`` to
    shrink buckets (precision) and ``n_bands`` to recover recall. The sign
    bits come from one numpy GEMM per Arrow batch against the deterministic
    plane matrix (vs ``lsh_buckets``'s per-plane interpreted HOF fold —
    same math, ~100× cheaper per row), so this is the scale path.

    ``with_embedding=False`` drops the vector from the output — the ids
    branch skips the n_bands× list materialization entirely, which is most
    of the kernel's cost for callers that only need bucket membership
    (e.g. the dedup bucket-size census).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    fields = [
        StructField("vec_id", LongType()),
        StructField("band_id", LongType()),
        StructField("band_value", LongType()),
    ]
    if with_embedding:
        fields.append(StructField("embedding", ArrayType(DoubleType())))
    out_schema = StructType(fields)
    n_planes = n_bands * planes_per_band

    def bucketize(batches):
        w = None
        for pdf in batches:
            if pdf.empty:
                continue
            mat = stack_embeddings(
                pdf["embedding"].to_numpy(), "lsh_buckets",
                ids=list(pdf["vec_id"]) if "vec_id" in pdf else None,
            )
            if w is None:
                w = _plane_matrix(n_planes, mat.shape[1])
            bits = (mat @ w.T) > 0  # (n, n_planes)
            ids = np.asarray(pdf["vec_id"], dtype=np.int64)
            emb = [row.tolist() for row in mat] if with_embedding else None
            weights = 1 << np.arange(planes_per_band, dtype=np.int64)
            for b in range(n_bands):
                band_bits = bits[:, b * planes_per_band : (b + 1) * planes_per_band]
                cols = {
                    "vec_id": ids,
                    "band_id": np.full(len(ids), b, dtype=np.int64),
                    "band_value": band_bits @ weights,
                }
                if with_embedding:
                    cols["embedding"] = emb
                yield pd.DataFrame(cols)

    e = ensure_parallelism(embeddings.select("vec_id", "embedding"))
    return e.mapInPandas(bucketize, out_schema)


def ivf_index(
    embeddings: DataFrame, n_centroids: int = 16, iters: int = 3
) -> tuple:
    """IVF coarse quantizer: deterministic Lloyd iterations.

    Init: the ``n_centroids`` vectors with smallest md5(vec_id) — a
    deterministic pseudo-random sample. Each iteration is ONE map-only
    pass: the per-batch GEMM assigns clusters AND accumulates local
    (cluster, count, Σembedding) partial sums, so only K rows per
    partition (K×dim doubles each) ever reach the driver — the corpus is
    never shuffled, joined, or exploded. (An earlier version re-joined
    assignments to the corpus by vec_id and exploded dims to average —
    one full corpus shuffle per iteration, all of it replaced by the
    in-pass partials.) The final assignment DataFrame is evaluated lazily
    against the pre-final-update centroids, matching the unrolled-CTE
    oracle's layer structure.

    Float caveat (shared with the oracle docstring): partial sums
    accumulate in a different order than SQL AVG, so centroids agree to
    ulps, not bits; an assignment flips only on an exact distance tie —
    measure-zero on real embeddings.

    Returns (centroids ndarray, assignments DataFrame[vec_id, cluster]).
    """
    import numpy as np

    spark = embeddings.sparkSession
    e = track_persist(ensure_parallelism(embeddings.select("vec_id", "embedding")))

    seed_ids = [
        r.vec_id
        for r in e.select("vec_id")
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(n_centroids)
        .collect()
    ]
    # canonical label order: cluster i = i-th seed by ascending vec_id.
    # Without the sort, toPandas() returns repartition order and the
    # label assignment would be nondeterministic (invisible to ann_ivf,
    # whose output is label-free, but cluster_assign exposes labels).
    seeds = (
        e.filter(F.col("vec_id").isin(seed_ids))
        .toPandas()
        .sort_values("vec_id")
    )
    centroids = stack_embeddings(
        seeds["embedding"].to_numpy(), "k-means seeds",
        ids=list(seeds["vec_id"]),
    )

    from pyspark.sql.types import LongType, StructField, StructType

    assign_schema = StructType(
        [StructField("vec_id", LongType()), StructField("cluster", LongType())]
    )

    def make_assign(cents):
        bc = spark.sparkContext.broadcast(cents)

        def assign(batches):
            import pandas as pd

            c = bc.value
            for pdf in batches:
                mat = stack_embeddings(
                    pdf["embedding"].to_numpy(), "k-means assign",
                    ids=list(pdf["vec_id"]) if "vec_id" in pdf else None,
                    dim=c.shape[1],
                )
                # squared euclidean via ||x||^2 - 2xc + ||c||^2
                d = (
                    (mat * mat).sum(1)[:, None]
                    - 2 * (mat @ c.T)
                    + (c * c).sum(1)[None, :]
                )
                yield pd.DataFrame(
                    {
                        "vec_id": np.asarray(pdf["vec_id"], dtype=np.int64),
                        "cluster": d.argmin(1).astype(np.int64),
                    }
                )

        return assign

    dim = centroids.shape[1]

    def make_partial(cents):
        bc = spark.sparkContext.broadcast(cents)

        def part(batches):
            import pandas as pd

            c = bc.value
            k = c.shape[0]
            sums = np.zeros((k, c.shape[1]))
            cnt = np.zeros(k, dtype=np.int64)
            for pdf in batches:
                mat = stack_embeddings(
                    pdf["embedding"].to_numpy(), "k-means fold",
                    ids=list(pdf["vec_id"]) if "vec_id" in pdf else None,
                    dim=c.shape[1],
                )
                d = (
                    (mat * mat).sum(1)[:, None]
                    - 2 * (mat @ c.T)
                    + (c * c).sum(1)[None, :]
                )
                a = d.argmin(1)
                for ci in np.unique(a):
                    sums[ci] += mat[a == ci].sum(0)
                cnt += np.bincount(a, minlength=k)
            yield pd.DataFrame(
                {
                    "cluster": np.arange(k, dtype=np.int64),
                    "cnt": cnt,
                    "sums": list(sums),
                }
            )

        return part

    prev = centroids
    for _ in range(iters):
        prev = centroids.copy()
        partials = e.mapInPandas(
            make_partial(centroids),
            "cluster long, cnt long, sums array<double>",
        ).collect()
        sums = np.zeros((n_centroids, dim))
        cnts = np.zeros(n_centroids, dtype=np.int64)
        for r in partials:
            sums[r.cluster] += np.asarray(r.sums)
            cnts[r.cluster] += r.cnt
        occupied = cnts > 0  # empty clusters keep their previous centroid
        centroids[occupied] = sums[occupied] / cnts[occupied, None]

    # the oracle's a{iters} layer: assignment against the PRE-final-update
    # centroids (the loop's last GEMM saw `prev`, not the updated matrix)
    assignments = e.mapInPandas(make_assign(prev), assign_schema)
    return centroids, assignments


def ivf_ann_topk(
    embeddings: DataFrame,
    query_ids,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """ANN top-k via IVF: exact ranking within the ``n_probe`` clusters
    nearest to each query. Complements the LSH path — IVF adapts to the
    data distribution; LSH needs no training."""
    import numpy as np

    centroids, assignments = ivf_index(embeddings, n_centroids)
    e = embeddings.select("vec_id", "embedding").join(assignments, "vec_id")

    qpdf = (
        embeddings.filter(F.col("vec_id").isin(list(query_ids)))
        .select("vec_id", "embedding")
        .toPandas()
    )
    if qpdf.empty:
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cos double, rank long"
        )
    q_mat = stack_embeddings(
        qpdf["embedding"].to_numpy(), "ann queries", ids=list(qpdf["vec_id"])
    )
    d = (
        (q_mat * q_mat).sum(1)[:, None]
        - 2 * (q_mat @ centroids.T)
        + (centroids * centroids).sum(1)[None, :]
    )
    probe_rows = []
    for qi, qid in enumerate(qpdf["vec_id"]):
        for c in np.argsort(d[qi])[:n_probe]:
            probe_rows.append((int(qid), int(c)))
    probes = embeddings.sparkSession.createDataFrame(
        probe_rows, "query_id long, cluster long"
    )

    queries = embeddings.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cands = (
        F.broadcast(probes.join(queries, "query_id"))
        .join(e.withColumnRenamed("vec_id", "neighbor_id"), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    scored = cands.withColumn("cos", F.round(cosine(F.col("q_emb"), F.col("embedding")).cast("decimal(30,10)"), 6).cast("double"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


def lsh_ann_topk(
    embeddings: DataFrame, query_ids, k: int = 10, n_planes: int = LSH_PLANES
) -> DataFrame:
    """ANN top-k: exact ranking within the query's LSH bucket only."""
    bucketed = lsh_buckets(embeddings, n_planes).select("vec_id", "embedding", "bucket")
    queries = bucketed.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    cands = F.broadcast(queries).join(
        bucketed.withColumnRenamed("vec_id", "neighbor_id"),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("neighbor_id") != F.col("query_id")),
    )
    scored = cands.withColumn("cos", F.round(cosine(F.col("q_emb"), F.col("embedding")).cast("decimal(30,10)"), 6).cast("double"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


def cluster_top_terms(
    documents: DataFrame,
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    top_k: int = 5,
) -> DataFrame:
    """Label each k-means cluster with its most frequent tokens — the
    composition that turns raw cluster ids into a human-readable topic
    map (cluster docs by embedding, describe them by text).

    Scale shape: the assignment pass is map-only (ivf_index); documents
    join assignments on the aligned doc_id/vec_id key (one shuffle, or
    broadcast when assignments are small); token counting is one
    partial-aggregating shuffle on (cluster, token); the final top-k
    window only sees the (clusters × vocab) count table, never the
    corpus. Ties break lexicographically for cross-engine determinism.
    """
    from ..functions import tokens

    _, assignments = ivf_index(embeddings, n_centroids, iters)
    joined = documents.join(
        assignments, documents["doc_id"] == assignments["vec_id"]
    )
    counts = (
        joined.select("cluster", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("cluster", "tok")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("n"), "tok")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            "tok",
            F.col("n").cast("long").alias("n"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("cluster", "rank")
    )


def knn_graph(
    embeddings: DataFrame,
    k: int = 5,
    n_bands: int = 16,
    planes_per_band="auto",
    bucket_cap: int = 4096,
    target_occupancy: int = 128,
) -> DataFrame:
    """Approximate k-nearest-neighbor GRAPH: for every vector, its top-k
    most-cosine-similar neighbors among LSH candidates — the corpus-wide
    structure label propagation, graph clustering, and near-dup audits
    consume (vs ``cosine_topk``'s few-queries-vs-corpus shape).

    Built on the same multi-band sign-LSH + tiled-GEMM machinery as
    ``dedup.embedding_near_duplicates`` with the cosine threshold
    disabled (every in-bucket pair scores), so the oversized-bucket skew
    guard carries over unchanged. The pair list symmetrizes (each
    undirected candidate pair feeds both endpoints' rankings) and a
    per-source window keeps the top-k — window input is the candidate
    list, never the corpus square. Ties break on neighbor id for
    cross-engine determinism.

    ``planes_per_band="auto"`` (the default) sizes the bucket RESOLUTION
    to the corpus: sign-LSH with p planes has only 2^p buckets per band,
    so a FIXED p means bucket occupancy — and the per-band candidate
    count, occupancy×n/2 — grows linearly with n and total work grows
    quadratically (measured in tools/scale_probe.py: fixed 4 planes went
    2.1→12.6 s across a 4× corpus). Auto picks
    p = clamp(ceil(log2(n / target_occupancy)), 4, 20), holding
    occupancy ≈ ``target_occupancy`` so candidates stay O(n·bands·occ) —
    linear in the corpus. The price is recall on FAR pairs (per-band
    match p^planes shrinks), which is the right trade for kNN: nearest
    neighbors have high cosine and survive (cos 0.9 at 16 bands × 6
    planes ≈ 99.9% recall; cos 0.5 ≈ 77%). Pass an integer to pin the
    resolution (the oracle-checked registry query pins 4 so the SQL twin
    stays static).
    """
    import math

    from pyspark.sql import Window

    from .dedup import embedding_near_duplicates

    if planes_per_band == "auto":
        n = embeddings.count()
        planes_per_band = max(
            4, min(20, math.ceil(math.log2(max(n / target_occupancy, 2.0))))
        )

    pairs = embedding_near_duplicates(
        embeddings,
        threshold=-1.0,  # keep every candidate pair; ranking replaces the cut
        n_bands=n_bands,
        planes_per_band=planes_per_band,
        bucket_cap=bucket_cap,
    )
    # symmetrize with ONE explode instead of a self-union (r14): the
    # union's two branches each re-evaluated the entire LSH + tiled-GEMM
    # candidate pipeline (plan-verified: the corpus scan and both Arrow
    # kernels appeared twice under Union) — exploding both orientations
    # out of each undirected pair row keeps a single evaluation, no
    # persist needed. Same rows, so the per-src window is unchanged.
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("vec_a").alias("src"),
                    F.col("vec_b").alias("dst"),
                    F.col("cos"),
                ),
                F.struct(
                    F.col("vec_b").alias("src"),
                    F.col("vec_a").alias("dst"),
                    F.col("cos"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst", "e.cos")
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst"))
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "cos", F.col("rank").cast("long").alias("rank"))
    )


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column —
    ``q_i = floor(x_i * 127 / max|x| + 0.5)`` — entirely in whole-stage
    codegen (``F.transform`` / ``F.array_max``), no Python.

    This is the 100 TB memory lever for similarity search: an
    ``array<tinyint>`` corpus column is 4× smaller than float32 (8×
    smaller than the float64 the GEMM kernel promotes to) on disk, in
    shuffle payloads, and in executor cache — and int8 dot products are
    exact in 64-bit math, so scoring stays deterministic. floor(x+0.5)
    is used instead of round() because numpy/Java/DuckDB disagree on
    half-to-even vs half-away rounding; floor(+0.5) is the same
    function everywhere. Zero vectors (max|x| = 0) cannot be scored by
    cosine and are dropped here, not silently emitted as NaN later.

    Returns (vec_id, q8 array<tinyint>, qnorm double) with qnorm the
    L2 norm of the QUANTIZED vector (exact integer sum under the sqrt).
    """
    m = F.array_max(F.transform("embedding", lambda v: F.abs(v.cast("double"))))
    with_m = embeddings.withColumn("_m", m).filter(F.col("_m") > 0)
    q8 = F.transform(
        "embedding",
        lambda v: F.floor(v.cast("double") * F.lit(127.0) / F.col("_m") + F.lit(0.5))
        .cast("tinyint"),
    )
    qnorm = F.sqrt(
        F.aggregate(
            F.transform("q8", lambda v: v.cast("long") * v.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).cast("double")
    )
    return (
        with_m.withColumn("q8", q8)
        .withColumn("qnorm", qnorm)
        .filter(F.col("qnorm") > 0)
        .select("vec_id", "q8", "qnorm")
    )


def int8_cosine_topk(embeddings: DataFrame, query_ids, k: int = 10) -> DataFrame:
    """Brute-force top-k by cosine over int8-QUANTIZED vectors, with the
    entire scoring pipeline in whole-stage codegen: quantize
    (``quantize_embeddings``), broadcast the (tiny) quantized query set,
    integer dot product via ``F.zip_with``/``F.aggregate`` in long math,
    then a HIERARCHICAL top-k — per (query, neighbor_id mod 32) bucket
    first, global second — so no window partition ever holds more than
    its bucket's share of the corpus. The flat alternative (one window
    partition per query spanning the whole corpus) funnels every scored
    row through |queries| reducers; the bucket pre-pass caps the final
    window's input at 32·k rows per query regardless of corpus size.

    Complements ``cosine_topk``: that one is the Arrow/numpy GEMM
    (float, Python workers, fastest per-row); this one is the
    JVM-only path (no Python worker at all in the plan) over a corpus
    representation that is 4× smaller. Recall vs the float kernel is
    measured in tests/test_ivf.py; tools/ann_scale_probe.py at 32k
    vectors: recall@10 = 0.98, but the element-wise codegen dot is ~2×
    SLOWER than the BLAS GEMM on in-memory corpora — the int8 win is
    scan/shuffle bytes (array<tinyint> is a quarter of the IO at
    100 TB), not local compute; prefer the float kernel when the corpus
    fits memory.
    """
    from ..functions import ensure_parallelism

    spark = embeddings.sparkSession
    q = quantize_embeddings(ensure_parallelism(embeddings))
    queries = q.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"),
        F.col("q8").alias("qa"),
        F.col("qnorm").alias("na"),
    )
    dot_int = F.aggregate(
        F.zip_with("qa", "q8", lambda a, b: a.cast("long") * b.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        q.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round((dot_int.cast("double") / (F.col("na") * F.col("qnorm"))).cast("decimal(30,10)"), 6).cast("double"),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos")
    )
    w_local = Window.partitionBy(
        "query_id", F.pmod(F.col("neighbor_id"), F.lit(32))
    ).orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    w_global = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("lrank", F.row_number().over(w_local))
        .filter(F.col("lrank") <= k)
        .withColumn("rank", F.row_number().over(w_global).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _pq_subvectors(e, m: int, sub_d: int):
    """Explode (vec_id, embedding) to (vec_id, sub, sv) — each vector's
    ``m`` subvectors as double arrays. Shared verbatim by the Lloyd
    trainer and the frozen-model encoder so the slicing arithmetic can
    never drift between them."""
    return e.select(
        "vec_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.struct(
                    s.alias("sub"),
                    F.slice(
                        F.col("embedding").cast("array<double>"),
                        s * sub_d + 1,
                        sub_d,
                    ).alias("sv"),
                ),
            )
        ).alias("u"),
    ).select("vec_id", F.col("u.sub").alias("sub"), F.col("u.sv").alias("sv"))


def _pq_assign(spark, subv, cb):
    """Frozen-codebook subvector assignment — THE determinism-critical
    argmin the Lloyd trainer runs every round and the frozen-model
    encoder (``ivfpq_encode``) replays at serve time, shared verbatim.

    Map-side argmin against a LITERAL candidate table (r15): the
    codebook is a driver-held constant, so it rides the plan as one
    nested array literal — no broadcast exchange, no join node at all
    (r14 still paid a one-row BroadcastNestedLoopJoin per reference,
    which cost a broadcast-materialization job per iteration AND
    ballooned Catalyst's size estimate for every downstream join).
    Values are bit-identical: the per-candidate d² is the same exact
    left-fold expression, and ``array_min`` over ``struct(d2, index)``
    is the same lexicographic (d2, cluster) ordering because cluster
    ids are dense 0..k-1 in list order (asserted by ``_dense_vecs``)."""
    by_sub = {}
    for (s, c), v in sorted(cb.items()):
        by_sub.setdefault(s, []).append((c, v))
    m = max(by_sub) + 1
    allc = dlit(
        [_dense_vecs(by_sub.get(s, []), f"sub {s}") for s in range(m)]
    )
    best = _argmin_idx(
        F.element_at(allc, F.col("sub") + 1), F.col("sv"), "int"
    )
    return subv.select("vec_id", "sub", best.alias("cluster"), "sv")


def _dense_vecs(pairs, who: str):
    """[(id, vec)] sorted by id -> [vec] with the density assertion the
    literal candidate tables rely on: ids must be exactly 0..k-1, so a
    vector's LIST INDEX is its cluster/cell id (the trainer labels
    seeds by enumerate, which guarantees it; assert rather than assume
    for any future caller)."""
    ids = [int(i) for i, _v in pairs]
    assert ids == list(range(len(pairs))), (who, ids)
    return [[float(x) for x in v] for _i, v in pairs]


def _coarse_vecs_lit(cc):
    """Every coarse centroid as ONE literal array<array<double>> column,
    cell ids dense 0..k-1 in list order — the plan-resident constant
    that replaced the r14 one-row broadcast candidate table (no join,
    no broadcast job, no size-estimate distortion)."""
    return dlit(_dense_vecs(sorted(cc.items()), "coarse cells"))


def _pq_vecs_lit(pq_cb, m):
    """The PQ codebook grouped per subspace as ONE literal
    array<array<array<double>>> column: allc[s][cluster] = centroid
    (dense 0..k-1 — same density contract as `_coarse_vecs_lit`)."""
    by_sub = {}
    for (s, c), v in sorted(pq_cb.items()):
        by_sub.setdefault(s, []).append((int(c), v))
    return dlit(
        [_dense_vecs(by_sub.get(s, []), f"sub {s}") for s in range(m)]
    )


def _d2(sv, cvec):
    """The per-candidate squared distance — the exact left-fold
    `_pq_assign` uses, shared so the fused encoder and the ADC probe
    selection can never drift from the trainer."""
    return F.aggregate(
        F.zip_with(sv, cvec, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _argmin_idx(cands, sv, id_type: str = "int"):
    """Map-side argmin over a literal candidate array: array_min over
    struct(d2, index) — the index IS the dense cluster/cell id (the
    `_dense_vecs` contract), so this is the same lexicographic
    (d2, cluster) tie-break the struct-carrying r14 form used."""
    return F.array_min(
        F.transform(
            cands,
            lambda cv, i: F.struct(
                _d2(sv, cv).alias("d2"),
                i.cast(id_type).alias("cluster"),
            ),
        )
    )["cluster"]


def _dim_guarded(embeddings, dim: int):
    """Fail loudly on dimension-mismatched vectors: slice would clip a
    wider vector and zip_with null-pads a narrower one — either would
    encode garbage (and the increment would COMMIT it)."""
    return embeddings.select(
        "vec_id",
        F.when(F.size("embedding") == dim, F.col("embedding"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"embedding dimension mismatch: index expects {dim}, got "
                    ),
                    F.size("embedding").cast("string"),
                    F.lit(" for vec_id "),
                    F.col("vec_id").cast("string"),
                )
            )
        )
        .alias("embedding"),
    )


def ivfpq_encode_packed(embeddings: DataFrame, cc: dict, pq_cb: dict) -> DataFrame:
    """Frozen-model IVF-PQ encode as ONE map-only pipeline (r14): per
    vector, the coarse-cell argmin, the residual subtraction and all m
    per-subspace PQ argmins run in a single pass against the two one-row
    broadcast candidate tables — ZERO shuffles and ZERO corpus joins,
    where the former encoder shuffled the corpus three times (embeddings
    ⋈ cells by vec_id for the residuals, then groupBy(vec_id) + ⋈ cells
    again to pack). Returns DataFrame[vec_id, codes array<int>, cell].

    Values are BIT-identical to the exploded trainer relations: the
    per-candidate d² is `_pq_assign`'s exact left fold, the argmin is the
    same (d2, cluster) array_min, the residual the same zip_with
    subtraction of the same centroid doubles, and the codes array is the
    clusters in subspace order — exactly the sort key the former
    collect_list/array_sort pack produced (oracle-parity and disk≡memory
    pytest-pinned).

    The ``explode(array(..))`` steps are Generate barriers, load-bearing:
    CollapseProject inlines a non-cheap alias referenced once, and inside
    a higher-order-function lambda that single textual reference
    re-evaluates per element — without the barriers the coarse argmin and
    the residual would recompute once per subspace × candidate."""
    dim = len(next(iter(cc.values())))
    m = max(s for s, _c in pq_cb) + 1
    sub_d = dim // m
    # project BEFORE the ensure_parallelism exchange (guide: never ship
    # columns an opaque/heavy stage doesn't need)
    e = _dim_guarded(
        ensure_parallelism(embeddings.select("vec_id", "embedding")), dim
    )
    # literal candidate tables (r15): the frozen models ride the plan as
    # constants — the two one-row broadcast crossJoins are gone
    ccv = _coarse_vecs_lit(cc)
    allc = _pq_vecs_lit(pq_cb, m)
    emb = F.col("embedding").cast("array<double>")
    g1 = e.select(
        "vec_id",
        emb.alias("emb"),
        F.explode(F.array(_argmin_idx(ccv, emb, "int"))).alias("cell"),
    )
    resid = F.zip_with(
        "emb",
        F.element_at(ccv, F.col("cell") + 1),
        lambda a, b: a - b,
    )
    g2 = g1.select(
        "vec_id", "cell", F.explode(F.array(resid)).alias("resid")
    )
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: _argmin_idx(
            F.element_at(allc, s + 1),
            F.slice("resid", s * sub_d + 1, sub_d),
            "int",
        ),
    )
    return g2.select("vec_id", codes.alias("codes"), "cell")


def _coarse_residuals(embeddings: DataFrame, cc: dict) -> DataFrame:
    """(vec_id, cell, embedding=residual) map-only against the FINAL
    coarse codebook — the residual input of the PQ trainer. Replaces the
    former embeddings ⋈ cells (vec_id) ⋈ broadcast(cents) chain: the
    cell is re-derived by the same argmin the trainer's final assign
    uses (bit-identical by the shared `_d2`/`_argmin_idx`
    expressions), so the corpus never shuffles for the residuals."""
    ccv = _coarse_vecs_lit(cc)
    emb = F.col("embedding").cast("array<double>")
    g1 = embeddings.select("vec_id", "embedding").select(
        "vec_id",
        emb.alias("emb"),
        F.explode(F.array(_argmin_idx(ccv, emb, "int"))).alias("cell"),
    )
    resid = F.zip_with(
        "emb",
        F.element_at(ccv, F.col("cell") + 1),
        lambda a, b: a - b,
    )
    return g1.select(
        "vec_id", "cell", F.explode(F.array(resid)).alias("embedding")
    )


def pq_index(
    embeddings: DataFrame,
    m: int = 8,
    n_centroids: int = 16,
    iters: int = 3,
    dim: int | None = None,
    seeds: list | None = None,
):
    """Product-quantization codebooks + codes (the encoding half of
    IVF-PQ, Jégou et al. 2011): split each vector into ``m`` subvectors,
    k-means each subspace independently, and represent every vector as
    ``m`` one-byte centroid ids — with m=8, k=16 a 64-dim float corpus
    compresses 32× (8 codes vs 256 bytes).

    Engine-exact determinism (unlike the numpy-partial ``ivf_index``,
    whose centroids agree with SQL only to ulps): every Lloyd update
    computes per-dimension means as EXACT decimal sums divided by
    counts, so centroids — and therefore codes and every downstream ADC
    score — are bit-identical on any engine and partitioning. Seeds are
    the ``n_centroids`` vectors with smallest md5(vec_id) (the IVF
    convention), subspace ``s`` initialized from their s-th subvectors.

    Scale shape per iteration: the corpus explodes to n·m subvector
    rows, cross-joins the broadcast (m·k)-row codebook for the argmin
    (the standard Lloyd corpus×k cost, partial-aggregating), and the
    mean fold groups on (sub, cluster, dim) — k·dims cells, map-side
    combined. Only the m·k·(dim/m) codebook floats reach the driver.

    ``seeds`` (optional) short-circuits the seed-selection job: a list
    of (vec_id, [float]) pairs that IS the ``n_centroids``-smallest-md5
    selection (callers like ivfpq_index compute both trainers' seeds in
    ONE collect and derive the residual seeds driver-side — fewer jobs,
    same values).

    Returns (codebook dict {(sub, cluster): [float]}, codes
    DataFrame[vec_id, sub, cluster]).
    """
    spark = embeddings.sparkSession
    e = track_persist(ensure_parallelism(embeddings.select("vec_id", "embedding")))
    if dim is None and seeds:
        dim = len(seeds[0][1])
    if dim is None:
        # one schema-probe job; callers that know the width pass it
        # (ivfpq_index: saves materializing the residual pipeline once)
        dim = len(e.select("embedding").first()[0])
    assert dim % m == 0, (dim, m)
    sub_d = dim // m

    subv = track_persist(_pq_subvectors(e, m, sub_d))

    if seeds is None:
        seed_rows = (
            e.select("vec_id", "embedding")
            .orderBy(F.md5(F.col("vec_id").cast("string")))
            .limit(n_centroids)
            .collect()
        )
        seeds = [(int(r.vec_id), [float(x) for x in r.embedding])
                 for r in seed_rows]
    seeds = sorted(seeds, key=lambda t: t[0])  # canonical cluster labels
    codebook = {}
    for ci, (_vid, vec) in enumerate(seeds):
        for s in range(m):
            codebook[(s, ci)] = vec[s * sub_d : (s + 1) * sub_d]

    def assign(cb):
        return _pq_assign(spark, subv, cb)

    for _ in range(iters):
        a = assign(codebook)
        means = (
            a.select(
                "sub",
                "cluster",
                F.posexplode("sv").alias("dim", "v"),
            )
            .groupBy("sub", "cluster", "dim")
            .agg(
                # round the exact-decimal mean at 12 before the double
                # cast: both engines' decimal quotients are correct to
                # >= 15 digits, so the rounded value is bit-identical
                F.round(
                    F.sum(F.col("v").cast("decimal(30,15)")) / F.count("v"),
                    12,
                )
                .cast("double")
                .alias("mval")
            )
            .collect()
        )
        new_cb = {}
        for r in means:
            new_cb.setdefault((r.sub, r.cluster), [0.0] * sub_d)[r.dim] = r.mval
        for key, c in codebook.items():  # empty cluster keeps its centroid
            new_cb.setdefault(key, c)
        codebook = new_cb

    codes = assign(codebook).select("vec_id", "sub", "cluster")
    return codebook, codes


def pq_ann_topk(
    embeddings: DataFrame,
    query_ids,
    k: int = 10,
    m: int = 8,
    n_centroids: int = 16,
    iters: int = 3,
) -> DataFrame:
    """Approximate top-k by ASYMMETRIC DISTANCE COMPUTATION over PQ
    codes: queries stay exact, corpus vectors are m one-byte codes, and
    a query's score against a vector is a sum of m table lookups —
    dot(q) ≈ Σ_sub dot(q_sub, centroid[sub, code]); the code-derived
    norm √(Σ|centroid|²) approximates the corpus norm. The scan reads
    codes (32× smaller than floats), never the vectors — the memory/IO
    shape that makes billion-vector ANN fit a cluster.

    The per-(query, sub, cluster) lookup table is m·k rows per query,
    broadcast; scoring is ONE code-table join + a (vec, query) fold with
    the logprob discipline (per-term round-12 → exact decimal sums) so
    ADC scores are partition-invariant; ranking uses the int8 path's
    hierarchical top-k (bucketed pre-pass caps the final window at 32·k
    rows per query).
    """
    codebook, _codes = pq_index(
        embeddings, m=m, n_centroids=n_centroids, iters=iters
    )
    spark = embeddings.sparkSession

    qrows = (
        embeddings.filter(F.col("vec_id").isin(list(query_ids)))
        .select("vec_id", "embedding")
        .collect()
    )
    import math

    # pair-packed scorer (r14, the _adc_score shape applied to flat PQ):
    # the old path exploded the corpus to m code rows, joined the
    # (query, sub, cluster) lut fan-out and re-grouped |pairs|·m rows in
    # a corpus-scale (query, neighbor) aggregation. Now the corpus
    # encodes packed MAP-ONLY (one codes array per vector — the same
    # _argmin_cluster/_d2/slice expressions as _pq_assign, bit-identical
    # codes), sn2 folds once per VECTOR (it never depended on the
    # query), and each (query, vector) pair pays only the sdot fold —
    # zero joins, zero aggregation shuffle, values exactly the old sums
    # (decimal addition is exact, so fold ≡ sum over the same round-12
    # terms).
    sub_d = len(next(iter(codebook.values())))
    k_cb = max(c for _s, c in codebook) + 1
    qtable = []
    for qr in qrows:
        qv = [float(x) for x in qr.embedding]
        qnorm = math.sqrt(sum(x * x for x in qv))
        dq = [
            [
                sum(
                    a * b
                    for a, b in zip(
                        qv[s * sub_d : (s + 1) * sub_d], codebook[(s, cl)]
                    )
                )
                for cl in range(k_cb)
            ]
            for s in range(m)
        ]
        qtable.append((int(qr.vec_id), dq, qnorm))
    qdf = spark.createDataFrame(
        qtable, "query_id long, dq array<array<double>>, qnorm double"
    )
    cn2_all = [
        [sum(x * x for x in codebook[(s, cl)]) for cl in range(k_cb)]
        for s in range(m)
    ]
    cn2_lit = dlit(cn2_all)

    allc = _pq_vecs_lit(codebook, m)
    emb = F.col("embedding").cast("array<double>")
    codes_expr = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: _argmin_idx(
            F.element_at(allc, s + 1),
            F.slice(emb, s * sub_d + 1, sub_d),
            "int",
        ),
    )
    packed = (
        ensure_parallelism(embeddings.select("vec_id", "embedding"))
        # explode(array(..)) Generate barrier (the ivfpq_encode_packed
        # idiom): the codes array feeds two downstream folds and must
        # not re-evaluate inside their lambdas
        .select("vec_id", F.explode(F.array(codes_expr)).alias("codes"))
    )
    prescored = packed.select(
        "vec_id", "codes", _code_fold(cn2_lit).alias("sn2")
    )
    scored = (
        prescored.crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _code_fold(F.col("dq")).alias("sdot"),
            "sn2",
            "qnorm",
        )
        .withColumn(
            "cos",
            F.round(
                (
                    F.col("sdot").cast("double")
                    / (F.col("qnorm") * F.sqrt(F.col("sn2").cast("double")))
                ).cast("decimal(30,10)"),
                6,
            ).cast("double"),
        )
    )
    return _hier_topk(scored, k)


def ivfpq_index(
    embeddings: DataFrame,
    k_cells: int = 16,
    m: int = 8,
    n_centroids: int = 32,
    iters: int = 3,
    coarse_iters: int = 3,
):
    """The full IVF-PQ index (Jégou et al. 2011 §IV — IVFADC): a coarse
    quantizer partitions the corpus into ``k_cells`` inverted lists, and
    a product quantizer encodes each vector's RESIDUAL (vector − its
    cell centroid) as ``m`` one-byte codes. Residuals carry far less
    energy than raw vectors, so the same PQ budget quantizes them more
    accurately — and the cell structure is what lets a query score only
    ``n_probe`` lists instead of the corpus (the sub-linear
    billion-vector shape; ``pq_index`` alone still scans every code).

    The coarse quantizer IS the exact-decimal Lloyd trainer: ``pq_index``
    with one subspace spanning the whole vector — so coarse centroids,
    cells, residuals (plain double subtraction of bit-identical arrays),
    the residual codebooks and the codes are ALL bit-identical across
    engines; the DuckDB oracle is a CTE composition of the two
    already-oracled halves.

    Scale shape: two bounded Lloyd loops (each: corpus×k partial-agg
    scans, only k·dim floats to the driver), one map-side broadcast join
    for the residuals. At rest the corpus is (cell, m codes) — on a real
    lake the codes table would be written ``partitionBy(cell)`` so a
    probe reads only n_probe/k_cells of the files.

    Returns (coarse_centroids dict {cell: [float]}, cells
    DataFrame[vec_id, cell], pq_codebook dict {(sub, cluster): [float]},
    pq_codes DataFrame[vec_id, sub, cluster]).
    """
    spark = embeddings.sparkSession
    # ONE seed-collect job covers both trainers (the r8-verdict job-count
    # fold): the n-smallest-md5 prefix is shared — top-k_cells for the
    # coarse quantizer, top-n_centroids for the residual PQ — and the
    # residual seed VALUES are derived on the driver by replicating the
    # assign arithmetic exactly (same left-fold d2, same (d2, cell)
    # tie-break), so every downstream value is bit-identical to the
    # per-trainer seed jobs this replaces (oracle-parity-asserted).
    n_seed = max(k_cells, n_centroids)
    seed_rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(n_seed)
        .collect()
    )  # in md5 order: prefix i is the i-smallest-md5 selection
    seedlist = [(int(r.vec_id), [float(x) for x in r.embedding])
                for r in seed_rows]
    dim = len(seedlist[0][1])
    coarse_cb, _coarse_codes = pq_index(
        embeddings, m=1, n_centroids=k_cells, iters=coarse_iters,
        dim=dim, seeds=seedlist[:k_cells],
    )
    cc = {c: v for (_s, c), v in coarse_cb.items()}
    # map-only residuals (r14): re-derive each vector's cell from the
    # FINAL coarse codebook in the same projection that subtracts the
    # centroid — bit-identical to the trainer's final assign (shared
    # argmin expressions) and the vec_id-keyed corpus shuffle join the
    # old embeddings ⋈ cells ⋈ broadcast(cents) chain paid is gone.
    # ensure_parallelism runs BEFORE the heavy argmin map so a
    # single-file local scan doesn't evaluate it on one core (no-op at
    # scale, where inputs exceed defaultParallelism).
    e_par = ensure_parallelism(embeddings.select("vec_id", "embedding"))
    residuals = _coarse_residuals(e_par, cc)
    cells = residuals.select("vec_id", "cell")

    def _cell_of(vec):
        # bit-exact driver twin of assign()'s m=1 argmin: left-fold d2
        # in array order, ties broken by cell id
        best = None
        for c in sorted(cc):
            acc = 0.0
            for a, b in zip(vec, cc[c]):
                acc += (a - b) * (a - b)
            if best is None or (acc, c) < best:
                best = (acc, c)
        return best[1]

    res_seeds = [
        (vid, [a - b for a, b in zip(vec, cc[_cell_of(vec)])])
        for vid, vec in seedlist[:n_centroids]
    ]
    pq_cb, pq_codes = pq_index(
        residuals, m=m, n_centroids=n_centroids, iters=iters, dim=dim,
        seeds=res_seeds,
    )
    return cc, cells, pq_cb, pq_codes


# table_mode="auto" crossover: the driver ADC table is a Python pass
# over every query (~130 ms/query measured at sf0.1 operating points —
# 65 s at |Q|=500, vs ~10 s flat for the distributed table), so auto
# hands anything past serving-sized query sets to the distributed
# build. 128 keeps genuine serving calls (a handful to a few dozen
# queries) on the cheap driver path with wide margin; the old 1024
# threshold was the driver-ceiling rationale, not a cost model, and
# let auto spend minutes in the loop just below the flip.
ADC_AUTO_DRIVER_MAX = 128

# LUT-SPLIT pair-packed shape (r14, second pass): one row per (query,
# probed cell), but the row carries ONLY the query-dependent lut part —
# dq[sub][cluster] = dot(q_sub, cent), computed ONCE per query and shared
# by its n_probe cells. Everything else the old luts carried is
# query-INDEPENDENT (crossd depends on (cell, sub, cluster), cn2 on
# (sub, cluster), cc2 on cell) and lives in the one-row ``_adc_consts``
# table instead — the old shape recomputed those |Q| times in the table
# build and then re-folded them once per (query, neighbor) PAIR in the
# scorer; the split computes them once per INDEX and folds them once per
# code row. Values are bit-identical (same left-fold float dots, same
# round-12 decimal sums — the driver ≡ distributed pytest pins it).
_ADC_SCHEMA = (
    "query_id long, cell int, "
    "dq array<array<double>>, qdotc double, qnorm double"
)

def _code_fold(src, codes=None):
    """Per-row exact-decimal lut fold over a packed code column
    (``codes`` by default — pass the column explicitly when the caller
    names it differently; the r14 ADVICE flagged the implicit name as a
    hidden contract): Σ_s round12(src[s][codes[s]+1]) as decimal sums.
    The (38,15) accumulator re-cast is exact: every term is a round-12
    value (scale 12), so each partial sum is scale-12 and survives the
    add operator's (38,14) result type losslessly — the fold's value
    equals an ``F.sum`` over the same decimals (decimal addition is
    exact, so fold order ≡ sum). Shared by the IVF-PQ scorer and the
    flat-PQ scorer so the discipline can never drift."""
    codes = F.col("codes") if codes is None else codes
    dec = "decimal(30,15)"
    return F.aggregate(
        F.sequence(F.lit(1), F.size(codes)),
        F.lit(0).cast("decimal(38,15)"),
        lambda acc, s: (
            acc
            + F.round(
                F.element_at(
                    F.element_at(src, s),
                    F.element_at(codes, s) + 1,
                ),
                12,
            ).cast(dec)
        ).cast("decimal(38,15)"),
    )


def _adc_consts(cc, pq_cb):
    """The query-independent ADC constants as three LITERAL columns
    (r15 — formerly a one-row broadcastable table whose
    BroadcastNestedLoopJoin cross both cost a broadcast job and
    ballooned Catalyst's size estimate of the code scan, which pushed
    the distributed-mode cell join to a SortMergeJoin; as plan literals
    they distort nothing): crossd_all[cell][sub][cluster] =
    dot(cell_sub, cent), cn2_all[sub][cluster] = |cent|²,
    cc2_all[cell] = |cc|². Computed on the driver from the
    (driver-sized, k_cells·dim + m·k·sub_d floats) centroid dicts with
    the same left-fold float arithmetic as the ``dot`` expression —
    Python ``sum`` is the identical IEEE left fold, the equivalence the
    driver-rows twin has always relied on. Bounded: k_cells·m·k doubles
    (4096 at the board operating point). Requires cell ids dense over
    0..k_cells-1 and codebook keys dense over (0..m-1, 0..k-1) — true
    by trainer construction (the same density `_coarse_vecs_lit`'s
    element_at indexing already assumes)."""
    dim = len(next(iter(cc.values())))
    m = max(s for s, _c in pq_cb) + 1
    k = max(c for _s, c in pq_cb) + 1
    sub_d = dim // m
    cells = sorted(cc)
    crossd_all = [
        [
            [
                sum(
                    a * b
                    for a, b in zip(
                        cc[cell][s * sub_d : (s + 1) * sub_d],
                        pq_cb[(s, cl)],
                    )
                )
                for cl in range(k)
            ]
            for s in range(m)
        ]
        for cell in cells
    ]
    cn2_all = [
        [sum(x * x for x in pq_cb[(s, cl)]) for cl in range(k)]
        for s in range(m)
    ]
    cc2_all = [sum(x * x for x in cc[cell]) for cell in cells]
    return {
        "crossd_all": dlit(crossd_all),
        "cn2_all": dlit(cn2_all),
        "cc2_all": dlit(cc2_all),
    }


def _adc_driver_rows(qrows, cc, pq_cb, n_probe):
    """Query-side ADC rows built in a driver loop — |Q|·n_probe rows,
    each carrying the m·k ``dq`` entries (computed once per query,
    shared across its cells), the right shape for serving-sized |Q|
    (no Spark jobs, one broadcast). Returns (rows, probed_cells). The
    distributed twin is ``ivfpq_adc_table`` (bit-identical values,
    pytest-asserted). Requires the codebook keys dense over
    (0..m-1, 0..k-1) — true by trainer construction — so the scorer
    can index dq[sub][cluster]."""
    import math

    dim = len(next(iter(cc.values())))
    m = max(s for s, _c in pq_cb) + 1
    k = max(c for _s, c in pq_cb) + 1
    sub_d = dim // m
    table = []
    probed_cells = set()
    for qr in qrows:
        qv = [float(x) for x in qr.embedding]
        qnorm = math.sqrt(sum(x * x for x in qv))
        dq = [
            [
                sum(
                    a * b
                    for a, b in zip(
                        qv[s * sub_d : (s + 1) * sub_d], pq_cb[(s, cl)]
                    )
                )
                for cl in range(k)
            ]
            for s in range(m)
        ]
        # probe the n_probe nearest cells (exact L2 to coarse centroids;
        # (d2, cell) tie-break — the oracle's ORDER BY d2, cell)
        d2s = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qv, cv)), cell)
            for cell, cv in cc.items()
        )
        for _d2v, cell in d2s[:n_probe]:
            probed_cells.add(cell)
            qdotc = sum(a * b for a, b in zip(qv, cc[cell]))
            table.append((int(qr.vec_id), cell, dq, qdotc, qnorm))
    return table, probed_cells


def ivfpq_adc_table(
    queries: DataFrame, cc: dict, pq_cb: dict, n_probe: int
) -> DataFrame:
    """The query-side ADC rows built IN SPARK — the corpus-vs-index
    shape where |Q| is 10⁵⁺ and a driver loop would make the driver the
    bottleneck. MAP-ONLY since r14: probe selection is
    ``slice(array_sort(struct(d2, cell)), 1, n_probe)`` against the
    one-row broadcast centroid table — the same (d2 asc, cell asc) order
    the old per-query row_number window produced, with the |Q|-keyed
    window SHUFFLE removed. Since the r14 LUT split the row carries only
    ``dq[sub][cluster] = dot(q_sub, cent)`` — evaluated ONCE per query
    behind its own Generate barrier BEFORE the probed-cell explode, so
    the n_probe cell rows share it — while the query-independent
    crossd/cn2/cc2 live in ``_adc_consts``. All arithmetic is the
    fixed-order left-fold ``dot`` (JVM expression trees, no Python
    stage), so every value is bit-identical to the driver loop
    (pytest-asserted equality). The explode steps are Generate barriers
    (see ``ivfpq_encode_packed``): without them CollapseProject would
    re-evaluate dq per cell row and the cell-centroid lookup per
    downstream reference."""
    dim = len(next(iter(cc.values())))
    m = max(s for s, _c in pq_cb) + 1
    sub_d = dim // m
    ccv_lit = _coarse_vecs_lit(cc)
    allc = _pq_vecs_lit(pq_cb, m)
    q = ensure_parallelism(
        queries.select(
            F.col("vec_id").cast("long").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )

    def qs(s):
        return F.slice("qv", s * sub_d + 1, sub_d)

    dq = F.transform(
        allc,
        lambda subcands, s: F.transform(
            subcands, lambda cv: dot(qs(s), cv)
        ),
    )
    withdq = q.select(
        "query_id", "qv", F.explode(F.array(dq)).alias("dq")
    )
    sel = F.slice(
        F.array_sort(
            F.transform(
                ccv_lit,
                lambda cv, i: F.struct(
                    _d2(F.col("qv"), cv).alias("d2"),
                    i.alias("cell"),
                ),
            )
        ),
        1,
        int(n_probe),
    )
    probed = (
        withdq.select(
            "query_id", "qv", "dq", F.explode(sel).alias("pr")
        )
        .select(
            "query_id", "qv", "dq",
            F.col("pr.cell").alias("cell"),
        )
    )
    withcc = probed.select(
        "query_id",
        "qv",
        "dq",
        "cell",
        F.explode(
            F.array(F.element_at(ccv_lit, F.col("cell") + 1))
        ).alias("ccv"),
    )
    return withcc.select(
        "query_id",
        "cell",
        "dq",
        dot(F.col("qv"), F.col("ccv")).alias("qdotc"),
        F.sqrt(dot(F.col("qv"), F.col("qv"))).alias("qnorm"),
    )


def _adc_score(
    codes: DataFrame,
    tdf: DataFrame,
    consts: dict,
    broadcast_table: bool = True,
):
    """ADC scoring against a PACKED (vec_id, codes array<int>, cell)
    code relation (r14): one join on ``cell`` — map-side when the
    query table broadcasts — then each (query, vector) pair computes
    its m lut lookups as per-row exact-decimal left folds over the
    subspaces. No per-subspace row fan-out and NO (query, neighbor)
    aggregation shuffle: the old shape exploded |pairs|·m rows through a
    corpus-scale groupBy; this one emits each scored pair directly.

    LUT split (r14 second pass): only ``sdot`` (the fold over the query
    row's ``dq``) depends on the query. ``scross``/``sn2``/``cc2``
    depend on (vector, its cell) alone, so they fold ONCE PER CODE ROW
    from the LITERAL ``_adc_consts`` columns BEFORE the cell join —
    the old shape re-folded them once per (query, neighbor) pair, i.e.
    |Q|·n_probe/k_cells times per vector. Since r15 the consts ride the
    plan as literals instead of a one-row BroadcastNestedLoopJoin
    cross, so the code side's size estimate stays the scan's own and
    the cell join's strategy is chosen from honest statistics (the r14
    trade where the ballooned estimate forced a SortMergeJoin in
    distributed mode is structurally gone).

    Values are bit-identical: the folds add the same round-12
    decimal(30,15) terms the old shape did (same values, same order —
    they never depended on the query), and the cos expression is
    unchanged.
    """
    t = F.broadcast(tdf) if broadcast_table else tdf
    fold = _code_fold
    prescored = codes.select(
        "vec_id",
        "cell",
        "codes",
        fold(F.element_at(consts["crossd_all"], F.col("cell") + 1)).alias(
            "scross"
        ),
        fold(consts["cn2_all"]).alias("sn2"),
        F.element_at(consts["cc2_all"], F.col("cell") + 1).alias("cc2"),
    )
    return (
        prescored.join(t, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            fold(F.col("dq")).alias("sdot"),
            "scross",
            "sn2",
            "qdotc",
            "cc2",
            "qnorm",
        )
        .withColumn(
            "cos",
            F.round(
                (
                    (F.col("qdotc") + F.col("sdot").cast("double"))
                    / (
                        F.col("qnorm")
                        * F.sqrt(
                            F.col("cc2")
                            + F.lit(2.0) * F.col("scross").cast("double")
                            + F.col("sn2").cast("double")
                        )
                    )
                ).cast("decimal(30,10)"),
                6,
            ).cast("double"),
        )
    )


def _hier_topk(scored: DataFrame, k: int) -> DataFrame:
    """Hierarchical top-k: bucketed local prune caps the global
    per-query window at 32·k rows (the int8 path's shape); (cos desc,
    neighbor_id) tie-break everywhere."""
    w_local = Window.partitionBy(
        "query_id", F.pmod(F.col("neighbor_id"), F.lit(32))
    ).orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    w_global = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("lr", F.row_number().over(w_local))
        .filter(F.col("lr") <= k)
        .withColumn("rank", F.row_number().over(w_global))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cos",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _exact_rerank(
    candidates: DataFrame, embeddings: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """IVFADC-R re-ranking (Jégou et al. 2011 §V, with the refinement
    data being the ORIGINAL vectors in the lake rather than a stored
    residual code): the top-C ADC candidates per query are re-scored by
    EXACT cosine and re-ranked. Candidate-bounded — the |Q|·C candidate
    list broadcasts into ONE map-side scan of the vector table (no
    corpus shuffle, no corpus-sized window), so the refinement costs a
    corpus scan plus |Q|·C exact dot products regardless of k_cells or
    n_probe. Arithmetic is the fixed-order ``dot`` fold with the
    round-6 decimal snap, so the oracle replays it exactly."""
    qdf = queries.select(
        F.col("vec_id").cast("long").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    ).withColumn("qnorm", F.sqrt(dot(F.col("qv"), F.col("qv"))))
    nv = embeddings.select(
        F.col("vec_id").cast("long").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("nv"),
    )
    exact = (
        nv.join(F.broadcast(candidates.select("query_id", "neighbor_id")),
                "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .withColumn(
            "cos",
            F.round(
                (
                    dot(F.col("nv"), F.col("qv"))
                    / (F.col("qnorm") * F.sqrt(dot(F.col("nv"), F.col("nv"))))
                ).cast("decimal(30,10)"),
                6,
            ).cast("double"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cos",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivfpq_ann_topk(
    embeddings: DataFrame,
    query_ids,
    k: int = 10,
    k_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_centroids: int = 32,
    iters: int = 3,
    coarse_iters: int = 3,
    rerank: int = 0,
    table_mode: str = "auto",
) -> DataFrame:
    """ANN top-k over the IVF-PQ index: each query probes its ``n_probe``
    nearest cells and scores ONLY those cells' codes by asymmetric
    distance — scored rows ∝ n_probe/k_cells of the corpus, never the
    corpus (the probe in tools/ann_scale_probe.py measures exactly
    that).

    ADC over residuals, by linearity of the dot product with
    x̂ = cell_centroid + r(codes):

        dot(q, x̂)  = dot(q, cc)   + Σ_s dot(q_s, cent[s, code_s])
        |x̂|²       = |cc|² + 2·Σ_s dot(cc_s, cent[s, code_s])
                            + Σ_s |cent[s, code_s]|²

    The per-(query, cell, sub, cluster) constants table is built on the
    driver for serving-sized |Q| (broadcast) and IN SPARK via
    ``ivfpq_adc_table`` for corpus-sized query batches
    (``table_mode="auto"`` switches at ADC_AUTO_DRIVER_MAX = 128
    queries — the measured driver/distributed crossover; values are
    bit-identical either way). Scoring is one code-table join +
    exact-decimal round-12 folds (the flat-PQ discipline), so scores
    are partition-invariant and engine-exact; ranking reuses the
    hierarchical top-k. ``rerank=C`` enables IVFADC-R refinement: the
    top-C ADC candidates per query are re-scored by exact cosine
    against the original vectors (candidate-bounded, no corpus scan
    beyond one map-side pass) and the final top-k is exact-ranked —
    the recall lever that costs |Q|·C dot products instead of more
    probes.
    """
    spark = embeddings.sparkSession
    query_ids = list(query_ids)  # materialize once: generators exhaust
    cc, _cells, pq_cb, _pq_codes = ivfpq_index(
        embeddings,
        k_cells=k_cells,
        m=m,
        n_centroids=n_centroids,
        iters=iters,
        coarse_iters=coarse_iters,
    )
    # one fused map-only encode replaces the trainer's exploded code
    # relations + the vec_id-keyed cells join (r14): codes arrive packed
    # (vec_id, codes, cell) for the pair-packed scorer, zero shuffles
    codes = ivfpq_encode_packed(embeddings, cc, pq_cb)
    queries = embeddings.filter(
        F.col("vec_id").isin(query_ids)
    ).select("vec_id", "embedding")

    mode = table_mode
    if mode == "auto":
        mode = (
            "driver"
            if len(query_ids) <= ADC_AUTO_DRIVER_MAX
            else "distributed"
        )
    consts = _adc_consts(cc, pq_cb)
    if mode == "driver":
        table, _probed = _adc_driver_rows(
            queries.collect(), cc, pq_cb, n_probe
        )
        scored = _adc_score(
            codes, spark.createDataFrame(table, _ADC_SCHEMA), consts,
            broadcast_table=True,
        )
    else:
        scored = _adc_score(
            codes, ivfpq_adc_table(queries, cc, pq_cb, n_probe), consts,
            broadcast_table=False,
        )
    if rerank:
        return _exact_rerank(
            _hier_topk(scored, int(rerank)), embeddings, queries, k
        )
    return _hier_topk(scored, k)


def write_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    k_cells: int = 16,
    m: int = 8,
    n_centroids: int = 32,
    iters: int = 3,
    coarse_iters: int = 3,
    health_gate: bool = False,
    layout: str = "auto",
) -> None:
    """Materialize the IVF-PQ index to the lake, codes partitioned BY
    CELL — the layout that turns cell probing into FILE-LEVEL partition
    pruning: a query touching n_probe of k_cells cells opens only those
    cells' parquet files, so the scan itself (not just the join output)
    is n_probe/k_cells of the corpus. Codes pack to one row per vector
    (m one-byte clusters); the coarse centroids and PQ codebooks are
    tiny sidecar tables. Everything stored is integers or exact
    doubles, so a probe from disk reproduces the in-memory scorer's
    output BIT-identically (pytest-asserted).

    The codes are LOG-STRUCTURED like the BM25 index (shared protocol,
    operators/segments.py): this full build is the ``batch=base``
    segment, published by a one-row commit file written LAST — an
    interrupted build has no committed batches and the probe refuses
    it loudly; ``ivfpq_index_increment`` lands arrivals as further
    committed segments against the frozen models (the faiss ``add()``
    shape), and ``ivfpq_index_compact`` folds them back.

    ``layout``: same contract as ``write_bm25_index`` — ``"flat"``
    (default on a fresh path, POSIX rename publishes), ``"pointer"``
    (object-store layout: live index at ``path/gen-*`` named by the
    atomic CURRENT pointer, publishes are one-object flips), or
    ``"auto"`` (keep the path's existing layout)."""
    from .segments import (
        begin_generation_build,
        pointer_layout,
        publish_generation,
    )

    if layout not in ("auto", "flat", "pointer"):
        raise ValueError(
            f"Invalid layout: {layout!r} (one of auto, flat, pointer)"
        )
    if health_gate:
        # pre-flight BEFORE touching the previous incarnation: a
        # poisoned corpus must fail with named vec_ids while the old
        # index is still intact and probe-able, not after the commit
        # log is retired or mid-Lloyd
        assert_embedding_health(embeddings, who="write_ivfpq_index")
    if layout == "pointer" or (layout == "auto" and pointer_layout(path)):
        build = begin_generation_build(path)
        _write_ivfpq_into(
            embeddings, build, k_cells, m, n_centroids, iters, coarse_iters
        )
        publish_generation(path, build)
        return
    if pointer_layout(path):
        # a flat build here would land next to CURRENT and leave it
        # aimed at the old generation — every subsequent open would
        # silently serve stale data; fail loudly instead
        raise ValueError(
            f"layout='flat' requested on a pointer-layout index at "
            f"{path!r}: rebuild with layout='pointer' (publishes a new "
            "generation) or remove CURRENT and the gen-* dirs first"
        )
    _write_ivfpq_into(
        embeddings, path, k_cells, m, n_centroids, iters, coarse_iters
    )


def _write_ivfpq_into(
    embeddings, path, k_cells, m, n_centroids, iters, coarse_iters
) -> None:
    """The flat base build at exactly ``path`` (both layouts share it —
    the pointer wrapper aims it at a fresh generation dir)."""
    import pyarrow as pa

    from .lakefs import for_path
    from .segments import segment_commit

    lake, lp = for_path(path)
    # retire any previous incarnation's commit log BEFORE the data
    # overwrite (same rebuild-crash ordering as the BM25 writer); the
    # old tombstones go with it — a prior incarnation's deletes must
    # never anti-join vectors out of the fresh corpus
    lake.rmtree(f"{lp}/commits")
    lake.rmtree(f"{lp}/tombstones")
    from .segments import mint_generation

    mint_generation(path)  # rebuilds invalidate snapshot pins loudly
    spark = embeddings.sparkSession
    cc, _cells, pq_cb, _pq_codes = ivfpq_index(
        embeddings,
        k_cells=k_cells,
        m=m,
        n_centroids=n_centroids,
        iters=iters,
        coarse_iters=coarse_iters,
    )
    # r14: the base codes come from the fused map-only encoder against
    # the FINAL frozen models — bit-identical to packing the trainer's
    # exploded relations (that identity IS the increment contract,
    # pytest-pinned) with the pack's groupBy(vec_id) shuffle and both
    # vec_id joins removed: the write job is a pure map pass
    codes = ivfpq_encode_packed(embeddings, cc, pq_cb).withColumn(
        "batch", F.lit("base")
    )
    # pin static overwrite per-write (never the session default): a
    # session-wide dynamic mode would turn this truncate into a partial
    # replace that leaves a retired corpus's untouched cells live under
    # the fresh base commit
    codes.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("cell", "batch").parquet(f"{path}/codes")
    # the sidecars are driver-held dicts (k_cells and m·k rows) — write
    # them with pyarrow directly instead of spinning a Spark job per
    # table; Spark reads them back identically (array<double> columns)

    def _sidecar(subdir, table):
        # Replicate Spark's mode("overwrite") truncate: clear any prior
        # sidecar (a stale Spark-written part-<uuid> next to our
        # part-00000 would union into duplicate rows per cell), and do
        # it BEFORE writing so the old _SUCCESS vanishes first — a crash
        # mid-write leaves no _SUCCESS and _ivfpq_index_complete
        # correctly reports the index incomplete.
        d = f"{lp}/{subdir}"
        lake.rmtree(d)
        lake.mkdirs(d)
        lake.write_table(table, f"{d}/part-00000.parquet")
        lake.write_bytes(f"{d}/_SUCCESS", b"")

    cents = sorted(cc.items())
    _sidecar("coarse", pa.table({
        "cell": pa.array([c for c, _v in cents], pa.int32()),
        "centroid": pa.array([v for _c, v in cents],
                             pa.list_(pa.float64())),
    }))
    cbs = sorted(pq_cb.items())
    _sidecar("codebook", pa.table({
        "sub": pa.array([s for (s, _c), _v in cbs], pa.int32()),
        "cluster": pa.array([c for (_s, c), _v in cbs], pa.int32()),
        "centroid": pa.array([v for _k, v in cbs],
                             pa.list_(pa.float64())),
    }))
    # commit LAST: visibility follows data + sidecars. The vector count
    # folds from the just-written codes' parquet FOOTERS on the driver
    # (r15: the Spark metadata-only count() still cost a scan job + its
    # AQE stages; the footers are this process's own writes, so a
    # driver walk reads the identical numbers with zero jobs)
    n_vectors = 0
    codes_root = f"{lp}/codes"
    for cell_dir in lake.listdir(codes_root):
        d = f"{codes_root}/{cell_dir}"
        if not lake.isdir(d):
            continue
        for sub in lake.listdir(d):
            sd = f"{d}/{sub}"
            if lake.isdir(sd):
                for part in lake.listdir(sd):
                    if part.endswith(".parquet"):
                        n_vectors += lake.parquet_num_rows(f"{sd}/{part}")
            elif sub.endswith(".parquet"):
                n_vectors += lake.parquet_num_rows(sd)
    segment_commit(path, "base", {"n_vectors": n_vectors})


def _read_ivfpq_sidecars(spark, path: str):
    """(coarse centroids dict, PQ codebook dict) off the index's
    sidecar tables — driver-sized; shared by the probe and the CDC
    increment so the frozen models are always read one way.

    Read DRIVER-SIDE through the lake filesystem (r15): the sidecars
    are k_cells- and m·k-row single-part tables the writer emits with
    pyarrow, and every serve/verify/increment call was paying two Spark
    read+collect jobs (plus their schema probes) to fetch a few KB.
    pyarrow reads the identical doubles (parquet is the byte contract);
    multi-part sidecars (none are written today) still concatenate."""
    from .lakefs import for_path

    lake, lp = for_path(path)

    def _rows(subdir):
        d = f"{lp}/{subdir}"
        out = []
        for part in sorted(lake.listdir(d)):
            if part.endswith(".parquet"):
                out.extend(lake.read_table(f"{d}/{part}").to_pylist())
        return out

    cc = {
        r["cell"]: [float(x) for x in r["centroid"]]
        for r in _rows("coarse")
    }
    pq_cb = {
        (r["sub"], r["cluster"]): [float(x) for x in r["centroid"]]
        for r in _rows("codebook")
    }
    return cc, pq_cb


def ivfpq_encode(embeddings: DataFrame, cc: dict, pq_cb: dict) -> DataFrame:
    """Encode vectors against FROZEN models — the serve-time half of
    the trainer, replaying its exact arithmetic (the shared
    ``_d2``/``_argmin_idx`` expressions): coarse-assign each vector
    to its cell (one whole-vector subspace), subtract the cell centroid,
    PQ-encode the residual, pack to one row per vector. Returns
    DataFrame[vec_id, codes array<int>, cell]. For any input, the
    output is BIT-identical to the codes ``ivfpq_index`` would emit
    for those vectors under the same final models (pytest-asserted) —
    which is what makes the CDC increment's segments indistinguishable
    from base-build rows. Dimension-mismatched vectors raise instead
    of encoding garbage.

    Scale shape (r14): ONE fused map-only pipeline against the two
    one-row broadcast candidate tables — zero shuffles, zero joins, no
    persist needed (nothing is referenced twice anymore; the old shape
    joined the arrivals back to their own cell assignment by vec_id and
    re-grouped the exploded codes)."""
    return ivfpq_encode_packed(embeddings, cc, pq_cb)


def ivfpq_index_increment(
    new_embeddings: DataFrame,
    path: str,
    batch_id: str = None,
    health_gate: bool = False,
) -> None:
    """faiss-style ``add()`` for the materialized IVF-PQ index: encode
    ONLY the arrivals against the index's FROZEN coarse centroids and
    codebooks (``ivfpq_encode`` — the trainer's exact arithmetic) and
    land them as an immutable ``cell=…/batch=<id>`` segment published
    by a one-row commit file — the SAME log-structured protocol as the
    BM25 index (operators/segments.py): torn batches are INVISIBLE to
    the probe, a pipeline-supplied batch_id makes replays idempotent
    (dynamic partition overwrite replaces exactly the retried batch's
    partitions; an already-committed id is a no-op), concurrent
    increments with distinct ids write disjoint partitions and
    separate commit files. No retraining, no history reprocessing —
    the standard IVF serving trade: arrivals' recall drifts only as
    the data distribution drifts from the training sample; retrain +
    rebuild when it does. Arrivals must carry vec_ids not already in
    the index (the arrivals-only contract)."""
    import uuid

    from .segments import segment_commit, segment_committed, segment_commits
    from .segments import recover_retired, resolve_index_root, validate_batch_id

    spark = new_embeddings.sparkSession
    if health_gate:
        # pre-flight the ARRIVALS before touching the commit log — a
        # poisoned CDC batch fails with named vec_ids, index untouched
        assert_embedding_health(new_embeddings, who="ivfpq_index_increment")
    recover_retired(path)  # heal a crashed compaction swap on open
    path = resolve_index_root(path)  # pointer layout -> live generation
    commits = segment_commits(path, "IVF-PQ index")  # layout gate
    if batch_id is None:
        batch_id = uuid.uuid4().hex
    else:
        validate_batch_id(batch_id)
    if segment_committed(path, batch_id):
        return  # already committed — idempotent replay
    # re-adding a tombstoned vec_id before compaction clears it would
    # be silently suppressed by the probe's anti-join — fail loudly
    # instead (zero cost for indexes that have never seen a delete)
    tomb = _ivfpq_tombstones(spark, path, sorted(commits))
    if tomb is not None:
        clash = (
            new_embeddings.select("vec_id")
            .join(tomb, "vec_id", "left_semi")
            .limit(1)
            .collect()
        )
        if clash:
            raise ValueError(
                f"vec_id {clash[0].vec_id!r} is tombstoned in the IVF-PQ "
                f"index at {path} — run ivfpq_index_compact to resolve "
                "deletes physically before re-adding a deleted vec_id"
            )
    cc, pq_cb = _read_ivfpq_sidecars(spark, path)
    # eager path: hold the persist handle and release before return (a
    # per-micro-batch CDC driver must not accumulate pinned caches); the
    # persist spans the count action and the write so the arrivals are
    # encoded once, not twice
    packed = ivfpq_encode_packed(new_embeddings, cc, pq_cb).persist()
    try:
        n = packed.count()
        if not n:
            return
        (
            packed.withColumn("batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cell", "batch")
            .parquet(f"{path}/codes")
        )
        segment_commit(path, batch_id, {"n_vectors": n})
    finally:
        packed.unpersist()


def _ivfpq_tombstones(spark, path: str, batches):
    """Committed deleted vec_ids (shared protocol — see
    operators/segments.py), or None when the index has never seen a
    delete (probes then skip the anti-join entirely)."""
    from .segments import tombstone_ids

    return tombstone_ids(spark, path, "vec_id", batches)


def ivfpq_index_delete(spark, path: str, vec_ids, batch_id: str = None) -> int:
    """Tombstone delete for the materialized IVF-PQ index — the dense
    twin of ``bm25_index_delete`` (same segment-log protocol): remove
    vectors from a 100 TB index WITHOUT rebuilding or retraining.
    Lands one delete batch as a ``tombstones/batch=<id>`` id segment
    plus a commit row with a NEGATIVE ``n_vectors``; the probe
    anti-joins tombstoned ids off the code scan, and because ADC
    scoring has no corpus-level constants (the frozen models never see
    the deletion), a probe after a delete is BIT-identical to the same
    probe against an index whose deleted vectors were never added
    (pytest-asserted via the frozen-models sibling construction).

    ``vec_ids`` is a DataFrame with a ``vec_id`` column or an iterable
    of ids. Only ids actually present (and not already tombstoned)
    count — finding them scans the committed codes once (one row per
    vector; vec_id does not prune the cell layout — batch takedowns
    amortize it); 0 found means nothing is written. A deleted vec_id
    stays deleted until ``ivfpq_index_compact`` physically drops its
    code row AND its tombstone — re-adding before that is rejected
    loudly by ``ivfpq_index_increment``. Same crash/replay safety as
    the BM25 twin: tombstone data first, commit LAST (torn deletes
    invisible), idempotent committed-batch_id replays, dynamic
    partition overwrite for torn retries; run deletes from the
    maintenance owner with increments quiesced."""
    import uuid

    from .segments import (
        recover_retired,
        segment_commit,
        segment_committed,
        segment_commits,
        validate_batch_id,
        resolve_index_root,
        write_tombstones,
    )

    recover_retired(path)  # heal a crashed compaction swap on open
    path = resolve_index_root(path)  # pointer layout -> live generation
    commits = segment_commits(path, "IVF-PQ index")  # layout gate
    if batch_id is None:
        batch_id = uuid.uuid4().hex
    else:
        validate_batch_id(batch_id)
    if segment_committed(path, batch_id):
        committed_n = commits[batch_id]["n_vectors"]
        if committed_n >= 0:
            # the id belongs to a DATA segment — see the BM25 twin
            raise ValueError(
                f"batch_id {batch_id!r} is already committed as a DATA "
                f"segment of the IVF-PQ index at {path} — delete "
                "batches need their own ids (the increment/delete "
                "namespaces share the commit log)."
            )
        return -committed_n  # idempotent replay: the recorded count
    if isinstance(vec_ids, DataFrame):
        ids = vec_ids.select("vec_id").distinct()
    else:
        rows = [(i,) for i in vec_ids]
        if not rows:
            return 0  # empty request — match the 0-found contract
        ids = spark.createDataFrame(rows, ["vec_id"]).distinct()
    batches = sorted(commits)
    prior = _ivfpq_tombstones(spark, path, batches)
    if prior is not None:
        ids = ids.join(prior, "vec_id", "left_anti")
    found = (
        spark.read.parquet(f"{path}/codes")
        .filter(F.col("batch").isin(batches))
        .select("vec_id")
        .join(ids, "vec_id", "left_semi")
        .persist()
    )
    try:
        n = found.count()
        if not n:
            return 0  # nothing present to delete — no segment, no commit
        write_tombstones(found, path, batch_id)
        segment_commit(path, batch_id, {"n_vectors": -n})
        return n
    finally:
        found.unpersist()


def ivfpq_index_compact(
    spark, path: str, verify: bool = False, vacuum: bool = True
) -> int:
    """Segment merge for the IVF-PQ index — the same Lucene-style
    lifecycle close as ``bm25_index_compact``: fold every COMMITTED
    batch's codes back into one ``base`` segment (codes are already
    final integers — no re-encode, just one pass + one repartition on
    cell so each cell dir lands as a single splittable file), vacuum
    torn segments, swap-publish with the shared crash-recoverable
    protocol. The model sidecars (coarse, codebook) are carried over
    unchanged — compaction never touches the models. Returns how many
    batches were folded (0 = already compact; still vacuums).

    On the POINTER layout the publish is a new-generation build + an
    atomic CURRENT flip instead of the rename swap (see the BM25
    twin); ``vacuum=False`` retains the superseded generation for
    in-flight scans — reclaim with ``segments.vacuum_generations``."""
    import os

    from .lakefs import for_path
    from .segments import (
        begin_generation_build,
        clear_stale_builds,
        pointer_layout,
        publish_generation,
        recover_retired,
        resolve_index_root,
        segment_commit,
        segment_commits,
        swap_publish,
        vacuum_uncommitted,
    )

    recover_retired(path)
    pointer = pointer_layout(path)
    user_path = path
    path = resolve_index_root(path)  # fold FROM the live generation
    if not pointer:
        clear_stale_builds(path, "compact")  # crashed builds, old pids
    commits = segment_commits(path, "IVF-PQ index")
    vacuum_uncommitted(path, ("codes", "tombstones"), set(commits))
    if set(commits) == {"base"}:
        return 0
    batches = sorted(commits)
    # no persist: unlike the BM25 twin (postings + dfreq, two writes),
    # the codes relation feeds exactly ONE write
    rows = (
        spark.read.parquet(f"{path}/codes")
        .filter(F.col("batch").isin(batches))
        .select("vec_id", "codes", "cell")
    )
    # deletes resolve physically here: tombstoned vectors' code rows
    # are dropped from the fold and the tombstone segments are NOT
    # copied into the build — their vec_ids are then free to re-add
    tomb = _ivfpq_tombstones(spark, path, batches)
    if tomb is not None:
        rows = rows.join(tomb, "vec_id", "left_anti")
    if pointer:
        build = begin_generation_build(user_path)
    else:
        build = f"{path}.compact-{os.getpid()}"
        for_path(build)[0].rmtree(for_path(build)[1])
    (
        rows.withColumn("batch", F.lit("base"))
        .repartition("cell")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("cell", "batch")
        .parquet(f"{build}/codes")
    )
    lake, lp = for_path(path)
    for sidecar in ("coarse", "codebook"):
        lake.copy_tree(f"{lp}/{sidecar}", f"{for_path(build)[1]}/{sidecar}")
    from .segments import mint_generation

    # compaction reuses the 'base' batch id, so it must mint a new
    # generation — snapshot pins crossing the swap fail loudly
    mint_generation(build)
    segment_commit(
        build,
        "base",
        {"n_vectors": sum(s["n_vectors"] for s in commits.values())},
    )
    if verify:
        # prove the fold BEFORE publishing (see the BM25 twin)
        from .fsck import assert_index_ok, ivfpq_index_verify

        assert_index_ok(
            ivfpq_index_verify(spark, build), "ivfpq_index_compact"
        )
    if pointer:
        publish_generation(user_path, build, vacuum=vacuum)
    else:
        swap_publish(path, build)
    return len(batches)


def ivfpq_index_snapshot(path: str) -> dict:
    """Pin the index's CURRENT committed batch set for
    snapshot-isolation probes (``ivfpq_probe_topk(snapshot=...)``) —
    the dense twin of ``bm25_index_snapshot``: later increments and
    deletes stay invisible to pinned reads; compaction/rebuild
    invalidates pins loudly."""
    from .segments import (
        read_generation,
        recover_retired,
        resolve_index_root,
        segment_commits,
    )

    recover_retired(path)
    path = resolve_index_root(path)  # pin the LIVE generation's state
    return {
        "generation": read_generation(path),
        "batches": sorted(segment_commits(path, "IVF-PQ index")),
    }


def ivfpq_probe_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 0,
    embeddings: DataFrame = None,
    table_mode: str = "auto",
    snapshot: dict = None,
) -> DataFrame:
    """ADC top-k against a MATERIALIZED IVF-PQ index (no training, no
    embedding scan): load the sidecar centroid tables (driver-sized),
    pick each query's n_probe nearest cells, and scan ONLY those cells'
    code partitions — ``cell IN (...)`` reaches the parquet source as a
    partition filter, so unprobed cells' files are never opened
    (file-pruning asserted in pytest via input_file_name). Scoring is
    the exact arithmetic of ``ivfpq_ann_topk``, so results match the
    in-memory path bit-for-bit. ``queries`` needs (vec_id, embedding).
    ``rerank=C`` adds the IVFADC-R exact refinement and requires
    ``embeddings`` (the original vector table) — the serving shape
    where the lake keeps both the code partitions and the raw vectors.

    ``table_mode`` mirrors ``ivfpq_ann_topk``: "driver" collects the
    query batch and builds the query-side ADC rows in a loop (the right
    call for serving-sized |Q|); "distributed" builds them in Spark via
    ``ivfpq_adc_table`` (bit-identical, no driver ceiling — the
    corpus-vs-materialized-index batch shape, e.g. feeding semantic
    decontamination from a disk index); "auto" switches at
    ADC_AUTO_DRIVER_MAX = 128 queries, the measured crossover (the
    driver loop is ~130 ms/query of Python decimal; the distributed
    build is flat). The probed-cell set for partition pruning comes from the
    distributed table itself (a ≤k_cells collect), so the scan stays
    partition-pruned in every mode.

    Only COMMITTED segments are visible (the shared commit-log
    protocol, operators/segments.py): the code scan filters to the
    commit log's batch ids, so a torn ``ivfpq_index_increment``
    contributes nothing.
    """
    from .segments import (
        read_generation,
        recover_retired,
        resolve_index_root,
        resolve_snapshot,
        segment_commits,
    )

    from .segments import ensure_spark_data_plane

    ensure_spark_data_plane(spark, path, "ivfpq_probe_topk")
    recover_retired(path)  # heal a crashed compaction swap on open
    path = resolve_index_root(path)  # pointer layout -> live generation
    # snapshot pin: the code scan and the tombstone set both flow from
    # this one visibility set (see bm25_probe_topk's twin)
    batches = sorted(
        resolve_snapshot(
            segment_commits(path, "IVF-PQ index"), snapshot,
            "ivfpq_probe_topk", generation=read_generation(path),
        )
    )
    cc, pq_cb = _read_ivfpq_sidecars(spark, path)
    queries = queries.select("vec_id", "embedding")
    mode = table_mode
    head = None
    if mode == "auto":
        # ONE take() both decides the mode and IS the driver-mode query
        # set (at <= MAX queries it returns every row) — the
        # bm25_probe_topk idiom; the old limit().count() + collect()
        # paid two jobs for the same rows. Row order is immaterial: the
        # ADC table joins on cell and ranking is (cos, neighbor_id)-
        # deterministic.
        head = queries.take(ADC_AUTO_DRIVER_MAX + 1)
        mode = (
            "driver" if len(head) <= ADC_AUTO_DRIVER_MAX else "distributed"
        )
    consts = _adc_consts(cc, pq_cb)
    if mode == "driver":
        table, probed_cells = _adc_driver_rows(
            head if head is not None else queries.collect(),
            cc, pq_cb, n_probe,
        )
        tdf = spark.createDataFrame(table, _ADC_SCHEMA)
        broadcast_table = True
    else:
        tdf = ivfpq_adc_table(queries, cc, pq_cb, n_probe)
        tdf = track_persist(tdf)
        probed_cells = {r.cell for r in tdf.select("cell").distinct().collect()}
        broadcast_table = False
    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("cell").isin(sorted(probed_cells)) & F.col("batch").isin(batches)
    )
    # deletes: tombstoned vectors are anti-joined off the (one row per
    # vector) code scan before scoring — the frozen models carry no
    # corpus constants, so exclusion alone makes the probe equal an
    # index that never held the deleted vectors
    tomb = _ivfpq_tombstones(spark, path, batches)
    if tomb is not None:
        codes = codes.join(tomb, "vec_id", "left_anti")
    # r14: the scan's packed rows (vec_id, codes, cell) feed the
    # pair-packed scorer directly — the per-subspace posexplode (×m row
    # fan-out) and the scorer's (query, neighbor) re-aggregation are gone
    scored = _adc_score(
        codes.select("vec_id", "codes", "cell"),
        tdf,
        consts,
        broadcast_table=broadcast_table,
    )
    if rerank:
        if embeddings is None:
            raise ValueError("rerank requires the original embeddings table")
        return _exact_rerank(
            _hier_topk(scored, int(rerank)), embeddings, queries, k
        )
    return _hier_topk(scored, k)
