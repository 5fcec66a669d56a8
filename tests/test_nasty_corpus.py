"""Adversarial-corpus smoke net: every text/dedup/sampling operator over
one deliberately hostile documents table.

The boarded fixtures are clean ASCII with no nulls, so an operator can
pass every oracle while silently misbehaving on the corpus states a
real 100 TB pipeline contains: NULL text (failed extraction), empty
strings, whitespace/punctuation-only bodies, CJK and emoji (no ASCII
tokens), single-token docs, megabyte-long repetition, and exact
duplicates of the nasty rows themselves. This net asserts the shared
contract the r9 advice established for the classifier: every
per-document operator KEEPS every input row (or documents why not),
and no null/NaN leaks into a score-like output column.
"""

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def nasty(spark):
    rows = [
        (0, "a perfectly normal english sentence with several words"),
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "!!! ??? ... ---"),
        (5, "世界你好世界"),  # CJK, no spaces
        (6, "\U0001f600 \U0001f680 \U0001f984"),  # emoji tokens
        (7, "word"),  # single token
        (8, "spam " * 5000),  # long + maximally repetitive
        (9, "a perfectly normal english sentence with several words"),  # dup of 0
        (10, None),  # second null
        (11, "tab\tseparated\tand\nnewlined\nlines\nhere"),
        (12, "MiXeD CaSe AnD num8er5 0xdeadbeef"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _no_null(rows, field):
    bad = [r.doc_id for r in rows if getattr(r, field) is None]
    assert not bad, f"{field} null for doc_ids {bad}"


def _no_nan(rows, field):
    bad = [
        r.doc_id
        for r in rows
        if getattr(r, field) is not None
        and isinstance(getattr(r, field), float)
        and math.isnan(getattr(r, field))
    ]
    assert not bad, f"{field} NaN for doc_ids {bad}"


def test_text_per_doc_operators_keep_every_row(spark, nasty):
    from parquet_metadata_explorer_spark.operators import text as T

    n = nasty.count()
    for name, fn, score_cols in [
        ("text_stats", T.text_stats, ["quality_score"]),
        ("language_id", T.language_id, []),
        ("token_counts", T.token_counts, []),
        ("repetition_stats", T.repetition_stats, []),
        ("quality_filter", T.quality_filter, []),
    ]:
        out = fn(nasty)
        rows = out.collect()
        assert len(rows) == n, f"{name} dropped rows: {len(rows)} != {n}"
        for c in score_cols:
            _no_nan(rows, c)


def test_fingerprints_and_dedup_families_run(spark, nasty):
    from parquet_metadata_explorer_spark.operators import dedup as D

    # exact dedup groups the two normal twins and the two nulls
    # (null ≡ '' ≡ whitespace-only after normalization is NOT required —
    # only that nothing crashes and the true twins pair)
    groups = {
        tuple(sorted(r.doc_ids))
        for r in D.exact_duplicates(nasty).collect()
    }
    assert any({0, 9} <= set(g) for g in groups)

    # minhash/simhash/ngram candidates: no crash, pairs are subsets of ids
    ids = {r.doc_id for r in nasty.collect()}
    for fn in (D.minhash_lsh_pairs, D.simhash_candidate_pairs):
        for r in fn(nasty).collect():
            assert r.doc_a in ids and r.doc_b in ids

    sur = D.line_dedup(nasty).collect()
    assert {r.doc_id for r in sur} <= ids and sur


def test_chunk_bm25_and_heavyhitters_degenerates(spark, nasty):
    from parquet_metadata_explorer_spark.operators import text as T

    chunks = T.chunk_documents(nasty, chunk_size=4, overlap=1)
    rows = chunks.collect()
    # token-less docs produce no chunks; every produced chunk is
    # non-empty and within budget
    assert all(1 <= r.n_tokens <= 4 for r in rows)
    assert {r.doc_id for r in rows} <= {0, 5, 6, 7, 8, 9, 11, 12}

    hits = T.bm25_topk(nasty, [(99, "normal english sentence")], k=5)
    got = hits.collect()
    assert got and all(r.query_id == 99 for r in got)
    assert got[0].doc_id in (0, 9)  # the twins are the best matches

    # threshold mining over a corpus whose heavy item is 'spam'
    freq = T.frequent_ngrams(nasty, n=1, threshold=1000)
    f = {r.ngram: r.freq for r in freq.collect()}
    assert f.get("spam") == 5000


def test_sampling_and_manifest_degenerates(spark, nasty):
    from parquet_metadata_explorer_spark.operators import sampling as S
    from parquet_metadata_explorer_spark.operators.pipelines import (
        corpus_manifest,
    )

    n = nasty.count()
    split = S.hash_split(nasty, "doc_id", val_permille=300)
    rows = split.collect()
    assert len(rows) == n
    assert {r.split for r in rows} <= {"train", "val"}

    stamp = corpus_manifest(nasty).collect()[0]
    assert stamp.n_docs == n
    assert stamp.n_tokens is not None and stamp.n_tokens > 5000
    assert stamp.content_digest is not None


def test_dsir_and_classifier_keep_null_docs(spark, nasty):
    from parquet_metadata_explorer_spark.operators.classify import (
        quality_classifier,
    )
    from parquet_metadata_explorer_spark.operators.sampling import (
        dsir_resample,
    )

    target = nasty.filter("doc_id in (0, 9)").select("doc_id")
    out = quality_classifier(nasty, target, n_buckets=64, iters=2).collect()
    assert len(out) == nasty.count()
    _no_null(out, "score")
    _no_null(out, "keep")
    _no_nan(out, "score")

    res = dsir_resample(nasty, nasty.filter("doc_id in (0, 9)"), n_out=5)
    kept = res.collect()
    assert 0 < len(kept) <= 5


@pytest.fixture(scope="module")
def nasty_embeddings(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 0.0, 0.0]),           # zero norm
        (3, [float("nan"), 1.0, 0.0]),  # NaN component
        (4, [1.0, 2.0]),                # ragged: wrong model dimension
        (5, None),                      # null vector
        (6, [float("inf"), 0.0, 0.0]),  # Inf component
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_health_classifies_every_defect(spark, nasty_embeddings):
    from parquet_metadata_explorer_spark.operators.similarity import (
        embedding_health,
    )

    rep = {
        r.defect: (r.n_rows, list(r.example_ids))
        for r in embedding_health(nasty_embeddings).collect()
    }
    assert rep["ok"] == (2, [0, 1])
    assert rep["zero_norm"] == (1, [2])
    assert rep["non_finite"] == (2, [3, 6])
    assert rep["wrong_length"] == (1, [4])
    assert rep["null"] == (1, [5])
    # explicit dim overrides the majority vote
    rep2 = {
        r.defect: r.n_rows
        for r in embedding_health(nasty_embeddings, dim=2).collect()
    }
    assert rep2["wrong_length"] == 5  # every 3-dim row is now wrong


def test_ragged_corpus_fails_with_named_ids(spark, nasty_embeddings):
    """A ragged or null vector must fail with the offending vec_ids and
    a pointer to the audit — not numpy's context-free shape error from
    inside an executor."""
    from parquet_metadata_explorer_spark.operators.similarity import (
        cosine_topk,
    )

    with pytest.raises(Exception) as ei:
        cosine_topk(nasty_embeddings, [0], k=3).collect()
    msg = str(ei.value)
    assert "embedding_health" in msg
    assert "ragged" in msg or "NULL vectors" in msg or "expected model" in msg
    assert "vec_ids" in msg  # names the offenders


def test_clean_corpus_contracts_hold(spark, nasty_embeddings):
    """On the fixable subset (ragged/null rows removed): zero-norm and
    non-finite vectors never pair, never rank, never emit NaN."""
    import math

    from parquet_metadata_explorer_spark.operators.similarity import (
        cosine_topk,
    )

    clean = nasty_embeddings.filter("vec_id not in (4, 5)")
    out = cosine_topk(clean, [0, 2, 3], k=5).collect()
    # zero-norm (2) and NaN (3) queries emit nothing; query 0 ranks only
    # well-formed candidates
    assert {r.query_id for r in out} == {0}
    assert all(
        r.cos is not None and not math.isnan(r.cos) for r in out
    )
    assert {r.neighbor_id for r in out} <= {1}  # 2/3/6 never candidates


@pytest.fixture(scope="module")
def nasty_events(spark):
    import datetime as dt

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        (1, ts(0), 100, "view", 1.0, "{}"),
        (2, ts(5), 100, "click", 2.0, "{}"),
        (3, ts(10), 100, "purchase", 30.0, "{}"),
        (4, None, 100, "view", 1.0, "{}"),          # null timestamp
        (5, ts(15), None, "view", 1.0, "{}"),       # null user
        (6, ts(20), 200, None, 1.0, "{}"),          # null type
        (7, ts(25), 200, "view", None, "{}"),       # null value
        (8, ts(30), 200, "view", float("nan"), "{}"),  # NaN value
        (9, ts(30), 200, "view", 5.0, None),        # null props, dup ts
        (9, ts(30), 200, "view", 5.0, None),        # duplicate event_id
        (10, dt.datetime(2099, 1, 1), 300, "view", 1.0, "{}"),  # far future
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_events_family_survives_nulls(spark, nasty_events):
    """The events surface over hostile rows: no crash, no row explosion,
    and null keys behave as SQL groups (null user is a session key like
    any other) — the states a real clickstream contains."""
    from parquet_metadata_explorer_spark.streaming import events as ev

    wc = ev.windowed_counts(nasty_events).collect()
    assert wc and all(r.n_events >= 1 for r in wc)

    sess = ev.sessionize(nasty_events).collect()
    # contract: NO event is lost — a null-ts event quarantines into its
    # own null-boundary singleton session (nulls order first within the
    # user; the gap vs null starts a fresh session for the real events),
    # so real sessions are never polluted and nothing silently drops
    assert sum(r.n_events for r in sess) == nasty_events.count()
    nullsess = [r for r in sess if r.session_start is None]
    assert len(nullsess) == 1 and nullsess[0].n_events == 1
    real = [r for r in sess if r.session_start is not None]
    assert sum(r.n_events for r in real) == nasty_events.filter(
        "ts is not null"
    ).count()

    ints = ev.session_intervals(nasty_events).collect()
    assert all(
        r.start_ts <= r.end_ts
        for r in ints
        if r.start_ts is not None and r.end_ts is not None
    )

    gap = ev.gapfill_hourly(nasty_events, event_type="view").collect()
    assert gap  # the 2024->2099 span is bounded by month-chunked carry

    anom = ev.hourly_anomalies(nasty_events).collect()
    import math

    assert all(
        r.z is None or not math.isnan(r.z) for r in anom if hasattr(r, "z")
    )


def test_classifier_margin_survives_megadoc(spark):
    """r9 ADVICE #3 / r10 VERDICT #2: a multi-million-occurrence document
    must not wrap the margin sum. |w12| reaches ~1.6e13 at the distill
    operating point, so 700k occurrences of one heavy bucket push the
    raw sum to 1.12e19 — past int64's 9.22e18. The decimal(38,0)
    accumulator must keep the score exact (a wrapped long would flip z
    negative and score the doc ~0 instead of ~1)."""
    import math

    from parquet_metadata_explorer_spark.operators.classify import _scored

    w = [16_000_000_000_000, -5]
    X = spark.createDataFrame(
        [(1, [0] * 700_000, 700_000, 0)],
        "doc_id long, fb array<int>, n long, y int",
    )
    out = _scored(X, w, 0).collect()[0]
    z = (700_000 * 16_000_000_000_000) / 1e12 / 700_000
    expected = round(1 / (1 + math.exp(-z)) * 1e12)
    assert out.p12 > 999_000_000_000, "margin wrapped int64"
    assert abs(out.p12 - expected) <= 2


def test_health_gate_blocks_builds_before_any_job(spark, nasty_embeddings, tmp_path):
    """r10 VERDICT #7: the embedding_health audit wired as a RELEASE
    GATE. A poisoned corpus must fail the index build and the clustered
    dedup at the gate — with named vec_ids — before any GEMM/Lloyd job
    runs, and a previously-built index must stay intact and probe-able
    after the rejected rebuild."""
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.operators.dedup import (
        semantic_duplicates,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_probe_topk,
        write_ivfpq_index,
    )

    n, d = 48, 4
    clean = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda i: F.cos(F.col("id") * 0.7 + i * 1.3),
        ).alias("embedding"),
    )
    idx = str(tmp_path / "ivfpq")
    write_ivfpq_index(clean, idx, k_cells=4, m=2, n_centroids=4,
                      health_gate=True)  # clean corpus passes the gate
    q = clean.filter("vec_id < 2")
    before = [tuple(r) for r in ivfpq_probe_topk(
        spark, idx, q, k=3, n_probe=4).collect()]
    assert before

    poisoned = clean.unionByName(
        spark.createDataFrame(
            [(900, [1.0, 2.0]), (901, None)],
            "vec_id long, embedding array<double>",
        )
    )
    with pytest.raises(ValueError) as ei:
        write_ivfpq_index(poisoned, idx, k_cells=4, m=2, n_centroids=4,
                          health_gate=True)
    msg = str(ei.value)
    assert "health gate" in msg and "900" in msg and "901" in msg
    assert "wrong_length" in msg and "null" in msg

    # the old index survived the rejected rebuild bit-for-bit
    after = [tuple(r) for r in ivfpq_probe_topk(
        spark, idx, q, k=3, n_probe=4).collect()]
    assert after == before

    with pytest.raises(ValueError, match="health gate"):
        semantic_duplicates(poisoned, n_centroids=4, health_gate=True)

    # the CDC increment gates its ARRIVALS the same way, index untouched
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_index_increment,
    )

    bad_arrivals = spark.createDataFrame(
        [(902, [float("nan")] * d)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="health gate"):
        ivfpq_index_increment(bad_arrivals, idx, batch_id="b1",
                              health_gate=True)
    assert [tuple(r) for r in ivfpq_probe_topk(
        spark, idx, q, k=3, n_probe=4).collect()] == before
    # ungated call keeps the pre-existing stack_embeddings contract
    # (fails later, but still with named ids) — gate is opt-in
    assert semantic_duplicates(clean, n_centroids=4).count() == n


def test_more_like_this_survives_nasty(spark, nasty):
    """Corpus-as-queries retrieval over the hostile table: no crash on
    null/empty/CJK/emoji docs, self never retrieved, and the exact
    duplicate pair must find each other at rank 1 both ways. Docs with
    no df-eligible terms (stop-term-only bodies) legitimately return
    no rows — the Lucene MoreLikeThis convention, unlike the
    keep-every-row per-document operators."""
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_more_like_this,
    )

    rows = bm25_more_like_this(nasty, k=3, max_df_ratio=0.9).collect()
    assert rows
    assert all(r.query_id != r.doc_id for r in rows)
    best = {r.query_id: r.doc_id for r in rows if r.rank == 1}
    assert best.get(0) == 9 and best.get(9) == 0  # the duplicate pair
