"""IVF ANN: determinism and recall against brute force."""

from parquet_metadata_explorer_spark.operators import similarity


def test_ivf_deterministic_and_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = similarity.cosine_topk(emb, [0, 1], k=5)
    ivf1 = similarity.ivf_ann_topk(emb, [0, 1], k=5, n_centroids=8, n_probe=4)
    ivf2 = similarity.ivf_ann_topk(emb, [0, 1], k=5, n_centroids=8, n_probe=4)

    r1 = sorted(tuple(r) for r in ivf1.collect())
    r2 = sorted(tuple(r) for r in ivf2.collect())
    assert r1 == r2  # fully deterministic (no RNG anywhere)

    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ivf_set = {(r.query_id, r.neighbor_id) for r in ivf1.collect()}
    recall = len(exact_set & ivf_set) / len(exact_set)
    # probing half the clusters should recover most true neighbors
    assert recall >= 0.5, f"recall {recall}"


def test_ivf_ranks_are_dense(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = similarity.ivf_ann_topk(emb, [3], k=4, n_centroids=4, n_probe=2).collect()
    ranks = sorted(r.rank for r in out)
    assert ranks == list(range(1, len(ranks) + 1))
