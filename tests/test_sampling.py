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


def test_pack_batches_by_length_ranks_and_waste(spark):
    from parquet_metadata_explorer_spark.operators.sampling import (
        pack_batches_by_length,
    )

    # doc i has (i % 17 + 1) words -> known length distribution
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i % 17 + 1))) for i in range(200)],
        ["doc_id", "text"],
    )
    rows = pack_batches_by_length(docs, batch_size=8).collect()
    assert len(rows) == 200
    # replay the rule in python: rank by (n_tokens desc, doc_id)
    order = sorted(((-(i % 17 + 1), i) for i in range(200)))
    expect_batch = {doc: rank // 8 for rank, (_, doc) in enumerate(order)}
    got = {r.doc_id: r.batch_id for r in rows}
    assert got == expect_batch
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r.batch_id, []).append(r)
    for batch in by_batch.values():
        mx = max(r.n_tokens for r in batch)
        assert all(r.batch_max == mx for r in batch)
        assert all(r.pad_waste == mx - r.n_tokens for r in batch)
    # the point of sorting: total waste is far below doc_id-order batching
    sorted_waste = sum(r.pad_waste for r in rows)
    naive = sorted(rows, key=lambda r: r.doc_id)
    naive_waste = sum(
        max(x.n_tokens for x in naive[b : b + 8]) - r.n_tokens
        for b in range(0, 200, 8)
        for r in naive[b : b + 8]
    )
    assert sorted_waste * 5 < naive_waste


def test_pack_batches_partition_invariant(spark):
    from parquet_metadata_explorer_spark.operators.sampling import (
        pack_batches_by_length,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i % 13 + 1))) for i in range(150)],
        ["doc_id", "text"],
    )
    a = {
        r.doc_id: (r.batch_id, r.pad_waste)
        for r in pack_batches_by_length(docs.coalesce(1), 16).collect()
    }
    b = {
        r.doc_id: (r.batch_id, r.pad_waste)
        for r in pack_batches_by_length(docs.repartition(16), 16).collect()
    }
    assert a == b


def test_pack_batches_empty(spark):
    from parquet_metadata_explorer_spark.operators.sampling import (
        pack_batches_by_length,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert pack_batches_by_length(docs).count() == 0


def test_pack_batches_nondeterministic_input_consistent(spark):
    """r10 VERDICT #6: the ranged relation is evaluated three times
    (range-sampling job, counts collect, output job); without the
    persist a nondeterministic upstream can show each job different
    rows and emit wrong batch_ids. Feed an UNSEEDED rand() filter and
    assert the output is internally consistent: batch_id is exactly
    the global (n_tokens DESC, doc_id) rank div batch_size, and
    batch_max matches each batch's true maximum."""
    from parquet_metadata_explorer_spark.operators.sampling import (
        pack_batches_by_length,
    )

    docs = _docs(spark, 400).withColumn(
        "text", F.concat(F.col("text"), F.lit(" pad" * 3))
    )
    flaky = docs.filter(F.rand() < 0.6)  # different rows per evaluation
    rows = pack_batches_by_length(flaky, batch_size=8).collect()
    assert rows, "filter kept nothing (p<1e-80)"
    ranked = sorted(rows, key=lambda r: (-r.n_tokens, r.doc_id))
    for rank, r in enumerate(ranked):
        assert r.batch_id == rank // 8, (rank, r)
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r.batch_id, []).append(r)
    for bid, batch in by_batch.items():
        true_max = max(r.n_tokens for r in batch)
        assert all(r.batch_max == true_max for r in batch), bid
        assert all(
            r.pad_waste == true_max - r.n_tokens for r in batch
        ), bid
    # doc_ids unique — no row duplicated across disagreeing jobs
    assert len({r.doc_id for r in rows}) == len(rows)
