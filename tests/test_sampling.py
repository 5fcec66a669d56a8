"""Deterministic sampling/splitting: stability under repartition and data
growth — the properties a reproducible training pipeline depends on."""

import pyspark.sql.functions as F

from parquet_metadata_explorer_spark.operators.sampling import (
    hash_split,
    sample_per_group,
)


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
        (F.col("id") % 4).cast("string").alias("grp"),
    )


def test_hash_split_deterministic_and_stable(spark):
    d = _docs(spark)
    s1 = {r.doc_id: r.split for r in hash_split(d, "doc_id", 100).collect()}
    s2 = {r.doc_id: r.split for r in hash_split(d.repartition(13), "doc_id", 100).collect()}
    assert s1 == s2  # partitioning cannot move rows across splits
    # growing the corpus never reassigns existing keys
    s3 = {r.doc_id: r.split for r in hash_split(_docs(spark, 400), "doc_id", 100).collect()}
    assert all(s3[k] == v for k, v in s1.items())
    # permille is approximately honored
    n_val = sum(1 for v in s1.values() if v == "val")
    assert 0 < n_val < 60


def test_hash_split_permille_bounds(spark):
    d = _docs(spark)
    assert {r.split for r in hash_split(d, "doc_id", 0).collect()} == {"train"}
    assert {r.split for r in hash_split(d, "doc_id", 1000).collect()} == {"val"}


def test_sample_per_group_fixed_size_and_deterministic(spark):
    d = _docs(spark)
    s = sample_per_group(d, "grp", "doc_id", 5)
    rows = s.collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r.grp, []).append(r.doc_id)
    assert all(len(v) == 5 for v in by_grp.values())
    rows2 = sample_per_group(d.repartition(7), "grp", "doc_id", 5).collect()
    assert sorted((r.grp, r.doc_id) for r in rows) == sorted(
        (r.grp, r.doc_id) for r in rows2
    )


def test_ngram_frequencies_counts_every_occurrence(spark):
    from parquet_metadata_explorer_spark.operators import text

    d = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")], ["doc_id", "text"]
    )
    out = {r.ngram: r.freq for r in text.ngram_frequencies(d, 2, 10).collect()}
    # 'a b' occurs twice in doc 1 (overlapping window) and once in doc 2
    assert out["a b"] == 3
    assert out["b a"] == 1
    assert out["b c"] == 1
    assert "x" not in out  # single-token doc contributes nothing


def test_pack_sequences_matches_sequential_reference(spark):
    from parquet_metadata_explorer_spark.operators.sampling import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, "tok " * (i % 11 + 1)) for i in range(500)],
        ["doc_id", "text"],
    )
    rows = pack_sequences(docs, budget_tokens=32).orderBy("doc_id").collect()
    acc = 0
    for r in rows:
        n = r["doc_id"] % 11 + 1
        assert r["n_tokens"] == n
        assert r["pack_start"] == acc
        assert r["pack_id"] == acc // 32
        acc += n
    assert len(rows) == 500


def test_pack_sequences_empty(spark):
    from parquet_metadata_explorer_spark.operators.sampling import (
        pack_sequences,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(docs).count() == 0
