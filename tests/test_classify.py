"""Learned quality classifier: learning, determinism, edges.

The engine-parity check (Spark vs the unrolled-CTE DuckDB replay) runs
in test_oracle_parity.py like every boarded operator; these tests cover
what parity can't — that the model actually LEARNS a separable signal,
that training is partition-invariant (the fixed-point discipline's whole
point), and the degenerate-document edges.
"""

import pytest
from pyspark.sql import functions as F

from parquet_metadata_explorer_spark.operators.classify import (
    classifier_scores,
    quality_classifier,
    train_quality_classifier,
)


def _corpus(spark, n=200, sep=True):
    """Two-pool synthetic corpus: positives draw from vocab A, negatives
    from vocab B (deterministic round-robin words, no RNG)."""
    A = ["alpha", "beta", "gamma", "delta", "epsilon"]
    Bv = ["zeta", "eta", "theta", "iota", "kappa"]
    rows = []
    for i in range(n):
        pos = i % 2 == 0
        pool = A if (pos or not sep) else Bv
        words = [pool[(i * 7 + j) % len(pool)] for j in range(30)]
        rows.append((i, " ".join(words), pos))
    return spark.createDataFrame(rows, "doc_id long, text string, pos boolean")


def test_learns_separable_classes(spark):
    docs = _corpus(spark)
    target = docs.filter("pos").select("doc_id")
    model = train_quality_classifier(docs, target, n_buckets=256, iters=4)
    scores = {
        r.doc_id: r.score
        for r in classifier_scores(docs, model).collect()
    }
    acc = sum((scores[i] > 0.5) == (i % 2 == 0) for i in range(200)) / 200
    assert acc >= 0.99, acc


def test_partition_invariant_model(spark):
    """The model is a function of the data, not the partitioning: integer
    margin sums and decimal gradient folds are order-invariant, so 1
    partition and 16 partitions train to bit-identical weights."""
    docs = _corpus(spark, n=120)
    target = docs.filter("pos").select("doc_id")
    m1 = train_quality_classifier(
        docs.coalesce(1), target, n_buckets=128, iters=3
    )
    m16 = train_quality_classifier(
        docs.repartition(16), target, n_buckets=128, iters=3
    )
    assert m1["w12"] == m16["w12"]
    assert m1["bias12"] == m16["bias12"]


def test_empty_and_degenerate_docs(spark):
    """Docs with no extractable tokens get the bias-only score; they
    never produce nulls or NaN."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "!!! ???"), (4, None)],
        "doc_id long, text string",
    )
    target = docs.filter("doc_id = 1").select("doc_id")
    out = quality_classifier(docs, target, n_buckets=64, iters=2).collect()
    assert len(out) == 4
    assert all(r.score is not None and 0.0 <= r.score <= 1.0 for r in out)
    assert all(r.keep is not None for r in out)
    # the two token-less docs score identically (bias-only margin)
    by_id = {r.doc_id: r.score for r in out}
    assert by_id[2] == by_id[3] == by_id[4]


def test_null_text_engine_parity(spark, tmp_path):
    """A corpus with null-text documents replays bit-for-bit on DuckDB
    through the BOARDED query + oracle pair: the null doc stays in the
    training set, scores bias-only, and carries a non-null keep flag on
    both engines. Guards the exact regression the r9 advice named —
    fixtures without nulls let a filter(keep) drop null-text docs
    silently while parity still passed."""
    import duckdb

    import __spark_entry__ as entrymod

    lex = list(entrymod.QCLS_LEX)
    rows = []
    for i in range(40):
        pool = lex if i % 2 == 0 else ["plain", "words", "only", "here"]
        rows.append((i, " ".join(pool[(i + j) % len(pool)] for j in range(12))))
    rows += [(100, None), (101, ""), (102, None)]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )

    sdf = entrymod.q_quality_classifier(spark, sf_dir)
    s_rows = {r.doc_id: (r.score, r.keep) for r in sdf.collect()}
    assert len(s_rows) == 43
    # null-text docs: present, bias-only score, never null
    assert s_rows[100] == s_rows[102]
    assert s_rows[100][0] is not None and s_rows[100][1] is not None
    assert s_rows[100][0] == s_rows[101][0]  # '' ≡ NULL: empty features

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    o_rows = {
        r[0]: (r[1], r[2])
        for r in con.sql(entrymod._oracle_quality_classifier()).fetchall()
    }
    assert set(o_rows) == set(s_rows)
    for k in s_rows:
        assert s_rows[k] == o_rows[k], (k, s_rows[k], o_rows[k])


def test_pareto_keep_rule_scales_with_score(spark):
    """Pareto(9) keeps high scorers at a far higher rate than low
    scorers — the GPT-3 resampling shape — and the keep flag is a pure
    function of (score, doc_id) so reruns agree exactly."""
    docs = _corpus(spark, n=400)
    target = docs.filter("pos").select("doc_id")
    model = train_quality_classifier(docs, target, n_buckets=256, iters=8, lr=1.0)
    rows = classifier_scores(docs, model).collect()
    # P(keep | score s) = P(Pareto(9) draw > 1-s) = (2-s)^-9: ~0.19 at
    # s=0.8 rising to 1 at s=1, ~0.005 at s=0.2
    hi = [r.keep for r in rows if r.score > 0.8]
    lo = [r.keep for r in rows if r.score < 0.2]
    assert hi and lo
    assert sum(hi) / len(hi) >= 0.08
    assert sum(lo) / len(lo) <= 0.03
    rerun = classifier_scores(docs, model).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rerun))


def test_scoring_plan_is_map_only(spark):
    """The serve path must stay shuffle-free: weights ride a broadcast
    1-row array, margins/sigmoid/keep are row-local expressions — the
    only Exchange in the scoring plan is a BroadcastExchange."""
    docs = _corpus(spark, n=50)
    target = docs.filter("pos").select("doc_id")
    model = {"w12": [0] * 64, "bias12": 0, "n_buckets": 64}
    plan = (
        classifier_scores(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    shuffles = [
        line
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    ]
    assert not shuffles, shuffles


def test_streaming_scores_match_batch(spark, tmp_path):
    """The CDC shape: train once on the seed corpus (frozen model), then
    score ARRIVALS map-side — classifier_scores is stateless map-only, so
    the same function runs unchanged on a streaming DataFrame and the
    replay equals the batch scoring field-for-field."""
    docs = _corpus(spark, n=100)
    target = docs.filter("pos").select("doc_id")
    model = train_quality_classifier(docs, target, n_buckets=128, iters=2)
    batch = sorted(
        tuple(r) for r in classifier_scores(docs, model).collect()
    )
    stage = str(tmp_path / "arrivals")
    docs.write.parquet(stage)
    sdf = spark.readStream.schema(docs.schema).parquet(stage)
    q = (
        classifier_scores(sdf, model)
        .writeStream.format("memory")
        .queryName("qcls_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        tuple(r) for r in spark.table("qcls_stream").collect()
    )
    assert streamed == batch


def test_unseparable_labels_stay_near_base_rate(spark):
    """With labels independent of the text (both classes share one
    vocabulary), the classifier converges to ~the base rate instead of
    hallucinating separation — scores cluster near 0.5."""
    docs = _corpus(spark, n=200, sep=False)
    target = docs.filter("pos").select("doc_id")
    model = train_quality_classifier(docs, target, n_buckets=256, iters=3)
    rows = classifier_scores(docs, model).collect()
    import statistics

    assert 0.3 < statistics.mean(r.score for r in rows) < 0.7


def test_model_round_trips_through_parquet(spark, tmp_path):
    """write_classifier/read_classifier: the at-rest model serves
    bit-identically to the in-memory one (fixed-point longs round-trip
    exactly — no float re-parsing drift)."""
    from parquet_metadata_explorer_spark.operators.classify import (
        read_classifier,
        write_classifier,
    )

    docs = _corpus(spark, n=80)
    target = docs.filter("pos").select("doc_id")
    model = train_quality_classifier(docs, target, n_buckets=128, iters=2)
    path = str(tmp_path / "qcls_model")
    write_classifier(spark, model, path)
    loaded = read_classifier(spark, path)
    assert loaded == model
    a = sorted(map(tuple, classifier_scores(docs, model).collect()))
    b = sorted(map(tuple, classifier_scores(docs, loaded).collect()))
    assert a == b


def test_classifier_eval_exact_auc(spark):
    """The distributed rank-sum AUC must equal the hand-computed
    Mann-Whitney statistic (average ranks on ties), and the confusion
    counts must match a direct replay — on a fixture WITH score ties
    and at two partitionings (the two-phase rank is the point)."""
    from parquet_metadata_explorer_spark.operators.classify import (
        classifier_eval,
    )

    rows = [
        # (doc_id, score, is_positive) — ties at 0.4 and 0.7
        (1, 0.9, 1), (2, 0.7, 1), (3, 0.7, 0), (4, 0.4, 1),
        (5, 0.4, 0), (6, 0.4, 0), (7, 0.2, 0), (8, 0.1, 0),
        (9, 0.95, 1), (10, 0.05, 0),
    ]
    scores = spark.createDataFrame(
        [(d, s) for d, s, _ in rows], "doc_id long, score double"
    )
    target = spark.createDataFrame(
        [(d,) for d, _, y in rows if y], "doc_id long"
    )

    # hand-computed Mann-Whitney with average ranks
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    ranks = {}
    i = 0
    while i < len(ordered):
        j = i
        while j < len(ordered) and ordered[j][1] == ordered[i][1]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[ordered[k][0]] = avg
        i = j
    P = sum(1 for *_, y in rows if y)
    N = len(rows) - P
    expect_auc = (
        sum(ranks[d] for d, _, y in rows if y) - P * (P + 1) / 2
    ) / (P * N)
    tp = sum(1 for _, s, y in rows if y and s > 0.5)
    fp = sum(1 for _, s, y in rows if not y and s > 0.5)
    fn = P - tp

    for df in (scores.coalesce(1), scores.repartition(16)):
        r = classifier_eval(df, target).collect()[0]
        assert r.n == 10 and r.p == P
        assert (r.tp, r.fp, r.fn) == (tp, fp, fn)
        assert r.auc == round(expect_auc, 6), (r.auc, expect_auc)
        assert r.precision == round(tp / (tp + fp), 4)
        assert r.recall == round(tp / (tp + fn), 4)


def test_classifier_eval_on_trained_model(spark):
    """End-to-end: evaluating the trained model on separable classes
    reports near-perfect AUC; on unseparable labels, AUC ~ 0.5."""
    from parquet_metadata_explorer_spark.operators.classify import (
        classifier_eval,
    )

    docs = _corpus(spark, n=200)
    target = docs.filter("pos").select("doc_id")
    model = train_quality_classifier(docs, target, n_buckets=256, iters=4)
    r = classifier_eval(classifier_scores(docs, model), target).collect()[0]
    assert r.auc > 0.99

    docs_u = _corpus(spark, n=200, sep=False)
    target_u = docs_u.filter("pos").select("doc_id")
    model_u = train_quality_classifier(docs_u, target_u, n_buckets=256, iters=3)
    r_u = classifier_eval(
        classifier_scores(docs_u, model_u), target_u
    ).collect()[0]
    assert 0.3 < r_u.auc < 0.7
