"""Scaling probe: do the extension operators scale linearly with corpus size?

Builds 1x/2x/4x replicas of the sf0.1 documents/embeddings tables and
times the heavy operators at each size, printing one JSON line. Replicas
are constructed so the WORKLOAD scales honestly instead of degenerating:

- documents: replica i shifts doc_id by i*10^9 and deterministically
  permutes each document's tokens (sort by md5(pos:i)), so per-replica
  token/shingle volume is identical to the original but cross-replica
  shingle sets are disjoint-ish — near-dup pair counts grow ~linearly
  with replication instead of quadratically (naive copy-replication would
  put every doc in an N-sized exact-dup group and explode LSH buckets,
  benchmarking the workload change, not the engine).
- embeddings: replica i shifts vec_id and cyclically rotates the vector
  by i dims — norms and within-replica geometry preserved, cross-replica
  cosines decorrelated.

Usage: python tools/scale_probe.py [sf_dir] [op1,op2,...]
(default /root/testdata/sf0.1, all ops). Writes replicas under
/tmp/pqx_scale_probe (removed and rebuilt each run).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/pqx_scale_probe"
FACTORS = [1, 2, 4]


def build_replicas(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(embs.select("embedding").first()[0])

    def doc_replica(i: int):
        toks = F.split(F.col("text"), " ")
        # deterministic per-replica permutation: order tokens by
        # md5("<pos>:<replica>") — same multiset, different shingles
        keyed = F.transform(
            toks,
            lambda t, p: F.struct(
                F.md5(F.concat(p.cast("string"), F.lit(f":{i}"))).alias("k"),
                t.alias("v"),
            ),
        )
        permuted = F.array_join(
            F.transform(F.array_sort(keyed), lambda s: s["v"]), " "
        )
        return docs.select(
            (F.col("doc_id") + i * 10**9).alias("doc_id"),
            (permuted if i else F.col("text")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    def emb_replica(i: int):
        rot = i % dim
        emb = F.col("embedding")
        rotated = (
            F.concat(F.slice(emb, rot + 1, dim - rot), F.slice(emb, 1, rot))
            if rot
            else emb
        )
        return embs.select(
            (F.col("vec_id") + i * 10**9).alias("vec_id"),
            rotated.alias("embedding"),
            "label",
        )

    shutil.rmtree(BASE, ignore_errors=True)
    for n in FACTORS:
        d = f"{BASE}/x{n}"
        docs_n = doc_replica(0)
        embs_n = emb_replica(0)
        for i in range(1, n):
            docs_n = docs_n.unionByName(doc_replica(i))
            embs_n = embs_n.unionByName(emb_replica(i))
        docs_n.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        embs_n.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("pqx-scale-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_replicas(spark, sf_dir)

    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.operators import dedup, text

    # Forced-oversized-bucket fixture for the embedding tiling: a FIXED
    # 1500-vector identical cluster (identical sign bits ⇒ one bucket in
    # EVERY band) appended to each factor's corpus, probed with
    # bucket_cap=256 so the cluster must tile (ceil(1500/256)=6 chunks,
    # 21 tiles). The cluster — and hence the oversized-bucket work and
    # its ~1.1M output pairs — is CONSTANT across factors, so the x1/x2/x4
    # deltas isolate the background corpus's linear scaling while proving
    # the tiled path is active (not just the no-overflow fast path).
    dim_probe = len(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("embedding")
        .first()[0]
    )
    SKEW_CLUSTER = 1500
    import math

    cluster_vec = [math.sin(k + 1) for k in range(dim_probe)]
    cluster = (
        spark.range(SKEW_CLUSTER)
        .select(
            (F.col("id") + 10**12).alias("vec_id"),
            F.array(*[F.lit(float(v)) for v in cluster_vec])
            .cast("array<float>")
            .alias("embedding"),
            F.lit(999).alias("label"),
        )
    )

    OPS = {
        "dedup_exact": lambda d, e: dedup.exact_duplicates(d),
        "dedup_minhash": lambda d, e: dedup.minhash_lsh_pairs(d, threshold=0.5),
        # default is now the self-tuning auto cap; the fixed-cap row stays
        # as the comparison baseline showing why (superlinear on density)
        "dedup_ngram_jaccard": lambda d, e: dedup.ngram_jaccard_pairs(
            d, threshold=0.3
        ),
        "dedup_ngram_fixed": lambda d, e: dedup.ngram_jaccard_pairs(
            d, threshold=0.3, max_doc_freq=100
        ),
        "dedup_embedding": lambda d, e: dedup.embedding_near_duplicates(
            e, threshold=0.95
        ),
        "dedup_embedding_skew": lambda d, e: dedup.embedding_near_duplicates(
            e.unionByName(cluster), threshold=0.95, bucket_cap=256
        ),
        "text_stats": lambda d, e: text.text_stats(d),
        "ngram_freq": lambda d, e: text.ngram_frequencies(d, n=2, top_k=100),
        "dedup_lines": lambda d, e: dedup.line_dedup(d, chunk_tokens=8),
        "text_logprob": lambda d, e: text.unigram_logprob_score(d),
        "cluster_assign": lambda d, e: _cluster_assign(e),
        "text_quality_filter": lambda d, e: text.quality_filter(d),
        "knn_graph": lambda d, e: _knn(e, "auto"),
        "knn_graph_fixed": lambda d, e: _knn(e, 4),
        "dataset_card": lambda d, e: _dataset_card(d),
        # float GEMM vs pure-codegen int8 top-k over the same corpus:
        # both scale linearly in corpus size (brute force, fixed queries)
        "ann_topk": lambda d, e: _ann_float(e),
        "ann_int8": lambda d, e: _ann_int8(e),
        # fixed benchmark (the x1 corpus's 1-in-20 slice) screened against
        # a growing training corpus: bitmap build constant, probe linear
        "decontam_bloom": lambda d, e: text.decontaminate_bloom(
            d.filter(F.col("doc_id") % 20 != 0),
            d.filter((F.col("doc_id") % 20 == 0) & (F.col("doc_id") < 10**9)),
        ),
        # corpus pass is the only size-dependent stage; the merge loop is
        # vocab-sized (token permutation keeps the word multiset constant,
        # so the vocab — and the loop cost — is flat across factors)
        "text_bpe": lambda d, e: text.bpe_merges(d, n_merges=8),
        # shingle volume linear; per-shingle source sets bounded by the
        # source count (20), pair explosion sources²-bounded
        "source_overlap": lambda d, e: text.source_overlap(d),
        # production encode path at a FIXED merge table (trained once on
        # the x1 corpus — the replica permutation keeps the word multiset,
        # hence the vocabulary, constant across factors): Python work =
        # |vocab| × |merges| = constant; the corpus-sized part is the
        # word explode + broadcast join + one doc_id shuffle → flat-ish
        # per-row cost at 4× is the 100 TB claim
        "bpe_encode_words": lambda d, e: text.bpe_tokenize_words(
            d, _bpe_table(d)
        ),
        # span-level substring dedup: postings linear in corpus tokens,
        # arg-min partial agg, hot-hash join-back (the dedup_lines class)
        "dedup_substring": lambda d, e: _substring(d),
        # bigram LM: position-keyed explode + two count-table joins
        "text_logprob2": lambda d, e: _bigram(d),
    }

    def _substring(d):
        from parquet_metadata_explorer_spark.operators.dedup import substring_dedup

        return substring_dedup(d, window=20)

    def _bigram(d):
        return text.bigram_logprob_score(d)

    _bpe_cache = {}

    def _bpe_table(d):
        if "m" not in _bpe_cache:
            x1 = spark.read.parquet(f"{BASE}/x1/documents.parquet")
            m = text.bpe_merges_fast(x1, n_merges=120, min_count=1)
            m.cache()
            m.count()
            _bpe_cache["m"] = m
        return _bpe_cache["m"]

    def _knn(e, planes):
        from parquet_metadata_explorer_spark.operators import similarity

        return similarity.knn_graph(e, k=5, n_bands=16, planes_per_band=planes)

    def _ann_float(e):
        from parquet_metadata_explorer_spark.operators import similarity

        return similarity.cosine_topk(e, [0, 1, 2, 3, 4], k=10)

    def _ann_int8(e):
        from parquet_metadata_explorer_spark.operators import similarity

        return similarity.int8_cosine_topk(e, [0, 1, 2, 3, 4], k=10)

    def _dataset_card(d):
        from parquet_metadata_explorer_spark.operators.pipelines import dataset_card

        return dataset_card(d)

    def _cluster_assign(e):
        from parquet_metadata_explorer_spark.operators import similarity

        return similarity.ivf_index(e, n_centroids=16, iters=3)[1]

    if len(sys.argv) > 2:  # optional comma-separated op filter
        keep = set(sys.argv[2].split(","))
        unknown = keep - OPS.keys()
        if unknown:
            raise SystemExit(f"unknown ops: {sorted(unknown)}")
        OPS = {k: v for k, v in OPS.items() if k in keep}

    # warm the JVM + Python worker pool once (bench.py rationale)
    spark.range(1000).selectExpr("sum(id)").collect()
    import pandas as pd

    def _warm(bs):
        import numpy  # noqa: F401

        for b in bs:
            yield pd.DataFrame({"id": b["id"]})

    spark.range(0, int(cpus) * 4, 1, int(cpus)).mapInPandas(_warm, "id long").count()

    results: dict[str, dict[str, float]] = {op: {} for op in OPS}
    rows: dict[str, dict[str, int]] = {op: {} for op in OPS}
    for n in FACTORS:
        d = spark.read.parquet(f"{BASE}/x{n}/documents.parquet")
        e = spark.read.parquet(f"{BASE}/x{n}/embeddings.parquet")
        for op, fn in OPS.items():
            # best-of-2 (bench.py protocol): steady-state cost, excluding
            # first-execution codegen/JIT of the plan shape and this
            # container's bursty CPU throttling
            best, cnt = None, 0
            for _ in range(2):
                t0 = time.monotonic()
                cnt = fn(d, e).count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            results[op][f"x{n}"] = round(best, 2)
            rows[op][f"x{n}"] = cnt
            print(f"# x{n} {op}: {results[op][f'x{n}']}s ({cnt} rows)", file=sys.stderr)

    print(json.dumps({"sf_base": sf_dir, "times_sec": results, "out_rows": rows}))
    spark.stop()
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
