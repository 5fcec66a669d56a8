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


def test_int8_topk_recall_and_no_python_in_plan(spark, sf_dir):
    """The int8-quantized path must (a) recover nearly all of the exact
    float top-k — 64-dim vectors lose little ordering at 1/127
    resolution — and (b) plan with NO Python evaluation at all: the
    quantization, integer dot and hierarchical top-k are whole-stage
    codegen, which is the point of the variant."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = similarity.cosine_topk(emb, [0, 1, 2], k=10)
    q8 = similarity.int8_cosine_topk(emb, [0, 1, 2], k=10)

    plan = q8._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan[:2000]

    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    q8_set = {(r.query_id, r.neighbor_id) for r in q8.collect()}
    recall = len(exact_set & q8_set) / len(exact_set)
    assert recall >= 0.8, f"int8 recall {recall}"


def test_int8_quantization_shape(spark, sf_dir):
    """Quantized values are tinyint in [-127, 127] with max|q| = 127 for
    every surviving vector (symmetric per-vector scale)."""
    import pyspark.sql.functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qz = similarity.quantize_embeddings(emb)
    assert dict(qz.dtypes)["q8"] == "array<tinyint>"
    stats = qz.select(
        F.array_max(F.transform("q8", lambda v: F.abs(v.cast("int")))).alias("mx")
    ).agg(F.min("mx"), F.max("mx")).collect()[0]
    assert stats[0] == 127 and stats[1] == 127, stats
