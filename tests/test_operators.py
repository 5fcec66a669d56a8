"""Extension-operator tests on synthetic corpora with known duplicates —
the sf tables contain no near-dups, so positive cases are constructed here."""

import pyspark.sql.functions as F
import pytest

from parquet_metadata_explorer_spark.operators import dedup, multimodal, similarity, text

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away into the woods "
    "to find some food for the long cold winter that is coming soon"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact duplicate of 1
        (3, BASE + " with a tiny extra suffix here"),  # near-dup of 1
        (4, "completely different content about spark engines and parquet files"),
        (5, "Der Hund und die Katze sind nicht mit der Maus in das Haus gegangen"),
        (6, ""),  # empty doc
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicates(spark, docs):
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.n_docs == 2 and g.keep_doc_id == 1 and g.doc_ids == [1, 2]


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in dedup.minhash_lsh_pairs(docs, 0.5).collect()}
    assert pairs[(1, 2)] == 1.0  # exact dup: jaccard 1
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.5  # near-dup caught
    assert (1, 4) not in pairs  # unrelated not caught


def test_simhash_near_dups(spark, docs):
    fps = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(docs).collect()}
    assert fps[1] == fps[2]
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in dedup.simhash_candidate_pairs(docs).collect()}
    assert pairs[(1, 2)] == 0
    if (1, 3) in pairs:
        assert pairs[(1, 3)] <= 16  # near-dup: small hamming distance


def test_ngram_jaccard(spark, docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in dedup.ngram_jaccard_pairs(docs, 0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs
    assert (1, 4) not in pairs


def test_auto_doc_freq_cap_histogram():
    # Zipfian-ish head: generous cap passes untouched
    hist = [(1, 10_000), (2, 1_000), (5, 100), (1000, 1)]
    assert dedup.auto_doc_freq_cap(hist, pair_budget=10_000_000) == 1000
    # dense corpus: df=90 shingles dominate; the cap must exclude them
    dense = [(2, 1_000), (90, 10_000)]  # 90*89/2*10k = 40M pairs
    assert dedup.auto_doc_freq_cap(dense, pair_budget=1_000_000) == 2
    # floor is 2 even when everything is over budget
    assert dedup.auto_doc_freq_cap([(50, 10_000)], pair_budget=10) == 2


def test_ngram_jaccard_auto_cap(spark):
    # dense corpus: 4 groups x 10 identical docs on disjoint vocabularies
    # (every shingle df=10 — the fixed-cap quadratic-fan-out scenario),
    # plus one rare pair of identical docs (every shingle df=2)
    rows = [
        (g * 10 + i, " ".join(f"w{g}{j}" for j in range(8)))
        for g in range(4)
        for i in range(10)
    ]
    rare_text = "unique rare words that appear nowhere else at all"
    rows += [(100, rare_text), (101, rare_text)]
    dense = spark.createDataFrame(rows, ["doc_id", "text"])
    # histogram: df=2 shingles cost 6 pairs, df=10 shingles cost 1080 —
    # budget 50 keeps the rare pair, auto-excludes the dense groups
    auto = dedup.ngram_jaccard_pairs(dense, 0.3, max_doc_freq="auto", pair_budget=50)
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in auto.collect()] == [(100, 101, 1.0)]
    # with room in the budget, auto admits df=10 and finds every dup pair
    wide = dedup.ngram_jaccard_pairs(dense, 0.3, max_doc_freq="auto", pair_budget=10_000)
    assert wide.count() == 4 * 45 + 1  # 4 groups x C(10,2) + the rare pair


@pytest.fixture(scope="module")
def embs(spark):
    # vec 0 and 1 identical, 2 close, 3 orthogonal-ish
    rows = [
        (0, [1.0, 0.0, 0.5, 0.2]),
        (1, [1.0, 0.0, 0.5, 0.2]),
        (2, [0.9, 0.1, 0.5, 0.2]),
        (3, [0.0, 1.0, -0.5, 0.1]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_embedding_near_duplicates(spark, embs):
    pairs = {(r.vec_a, r.vec_b): r.cos for r in dedup.embedding_near_duplicates(embs, 0.95).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs
    assert (0, 3) not in pairs


def test_cosine_topk_ranks_identical_first(spark, embs):
    out = similarity.cosine_topk(embs, [0], k=3).collect()
    assert [r.neighbor_id for r in out] == [1, 2, 3]
    assert out[0].cos == 1.0
    assert [r.rank for r in out] == [1, 2, 3]


def test_lsh_ann_topk_subset_of_bucket(spark, embs):
    out = similarity.lsh_ann_topk(embs, [0], k=3).collect()
    # identical vector must share the bucket and rank first
    assert out and out[0].neighbor_id == 1 and out[0].cos == 1.0


def test_language_id(spark, docs):
    preds = {r.doc_id: r.pred_lang for r in text.language_id(docs).collect()}
    assert preds[1] == "en"
    assert preds[5] == "de"
    assert preds[6] == "unknown"


def test_text_stats_bounds(spark, docs):
    for r in text.text_stats(docs).collect():
        assert 0 <= r.quality_score <= 1
        assert r.n_tokens >= 0
        if r.doc_id == 1:
            assert r.stop_ratio > 0.1  # plenty of English stopwords


def test_token_counts(spark, docs):
    rows = {r.doc_id: r for r in text.token_counts(docs).collect()}
    assert rows[6].ws_tokens == 0
    assert rows[1].ws_tokens == len(BASE.split())
    assert rows[1].bpe_tokens >= rows[1].ws_tokens


def test_fingerprints(spark, docs):
    rows = {r.doc_id: r for r in text.fingerprints(docs).collect()}
    assert rows[1].exact_fp == rows[2].exact_fp
    assert rows[1].n_winnow <= rows[1].n_shingles
    assert rows[6].n_shingles == 0 and rows[6].n_winnow == 0
    assert sorted(rows[1].winnow_fps) == list(rows[1].winnow_fps)


def test_multimodal_decode_plumbing(spark, docs):
    out = {r.doc_id: r for r in multimodal.decode_features(docs).collect()}
    assert len(out) == 6
    r = out[1]
    assert r.n_bytes == len(BASE.encode())
    assert r.width == r.n_bytes % 64 + 1
    assert r.channels == 3
    assert out[6].n_bytes == 0

def test_embedding_dedup_tiled_skewed_bucket(spark):
    """A duplicate cluster far larger than bucket_cap — identical vectors
    collide in the SAME bucket in EVERY band, the worst-case skew the
    tiling exists for. With cap=8 the 40-vector cluster splits into 5
    chunks / 15 tiles per band; the pair set must equal untiled output."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, [1.0, 0.2, -0.3, 0.7, 0.1]) for i in range(40)]  # one giant cluster
    rows += [(100 + i, rng.randn(5).tolist()) for i in range(20)]  # background
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    tiled = {
        (r.vec_a, r.vec_b): r.cos
        for r in dedup.embedding_near_duplicates(
            embs, threshold=0.9, bucket_cap=8
        ).collect()
    }
    untiled = {
        (r.vec_a, r.vec_b): r.cos
        for r in dedup.embedding_near_duplicates(
            embs, threshold=0.9, bucket_cap=10**9
        ).collect()
    }
    assert tiled == untiled
    # every pair within the 40-vector cluster must be present with cos 1.0
    for a in range(40):
        for b in range(a + 1, 40):
            assert tiled[(a, b)] == 1.0


def test_exact_duplicates_doc_ids_cap(spark):
    rows = [(i, "same text") for i in range(10)] + [(100, "other")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    g = dedup.exact_duplicates(docs, doc_ids_cap=3).collect()[0]
    assert g.n_docs == 10  # true group size unaffected by the cap
    assert g.keep_doc_id == 0
    assert g.doc_ids == [0, 1, 2]  # bounded, smallest-first


def test_unpersist_all_releases_operator_caches(spark, docs):
    import parquet_metadata_explorer_spark as pqx

    dedup.minhash_lsh_pairs(docs, 0.5).collect()
    assert pqx.unpersist_all() >= 1
    # idempotent: second call has nothing left to release
    assert pqx.unpersist_all() == 0


def test_multimodal_resize_shapes(spark, docs):
    out = {r.doc_id: r for r in multimodal.resize_payloads(docs, 4, 3).collect()}
    for doc_id, r in out.items():
        assert r.out_width == 4 and r.out_height == 3
        # empty payload -> empty output; else exactly w*h bytes
        assert len(r.resized) in (0, 12)
    assert len(out[6].resized) == 0  # the empty doc


def test_multimodal_frame_sampling_exact_bytes(spark):
    text = "x" * 1000  # 1000 utf-8 bytes -> 10 frames of 100
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = multimodal.sample_frames(docs, frame_size=100, every_n=3).collect()
    assert [r.frame_id for r in sorted(rows, key=lambda r: r.frame_id)] == [0, 3, 6, 9]
    payload = text.encode()
    for r in rows:
        assert bytes(r.frame) == payload[r.frame_id * 100 : (r.frame_id + 1) * 100]


def test_embedding_dedup_quadratic_output_bounded(spark):
    """An all-identical cluster at a low threshold emits O(n²) pairs; the
    streaming tile emitter must chunk them into bounded Arrow batches
    (the single-DataFrame applyInPandas shape overflowed direct memory)."""
    rows = [(i, [1.0, 0.5, -0.5, 0.25]) for i in range(2000)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    n = dedup.embedding_near_duplicates(
        embs, threshold=0.99, bucket_cap=256, n_bands=2, planes_per_band=4
    ).count()
    assert n == 2000 * 1999 // 2


def test_line_dedup_newline_corpus(spark):
    """First occurrence of a repeated line is kept; later instances are
    dropped; unique lines always survive; order inside a doc preserved."""
    rows = [
        (1, "alpha beta\nshared boilerplate line\ngamma"),
        (2, "shared boilerplate line\ndelta epsilon"),
        (3, "zeta\nshared boilerplate line\nshared boilerplate line"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r for r in dedup.line_dedup(docs, delimiter="\n").collect()
    }
    assert out[1].n_lines == 3 and out[1].n_kept == 3
    assert out[1].cleaned_text == "alpha beta\nshared boilerplate line\ngamma"
    assert out[2].n_lines == 2 and out[2].n_kept == 1
    assert out[2].cleaned_text == "delta epsilon"
    assert out[3].n_lines == 3 and out[3].n_kept == 1
    assert out[3].cleaned_text == "zeta"


def test_line_dedup_chunk_tokens(spark):
    """chunk_tokens mode: consecutive k-token windows are the dedup unit;
    a doc repeating another doc's chunk loses it."""
    rows = [
        (1, "a b c d e f"),   # chunks (k=2): "a b", "c d", "e f"
        (2, "c d x y"),       # "c d" seen in doc 1 -> dropped
        (3, "a b"),           # fully duplicate of doc 1's first chunk
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in dedup.line_dedup(docs, chunk_tokens=2).collect()
    }
    assert out[1].n_kept == 3 and out[1].cleaned_text == "a b c d e f"
    assert out[2].n_kept == 1 and out[2].cleaned_text == "x y"
    assert out[3].n_kept == 0 and out[3].cleaned_text == ""


def test_repetition_stats_flags_boilerplate(spark):
    rows = [
        (1, "spam spam spam spam spam spam"),          # one 2-gram repeated
        (2, "one two three four five six seven"),      # all grams unique
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in text.repetition_stats(docs).collect()}
    assert out[1].top_2gram_frac == 1.0 and out[1].dup_3gram_frac == 1.0
    assert out[2].top_2gram_frac < 0.2 and out[2].dup_3gram_frac == 0.0


def test_line_dedup_regex_special_delimiter(spark):
    """Delimiters with regex metacharacters ('|', '.') must split
    literally, not as patterns."""
    rows = [(1, "first|shared part|last"), (2, "shared part|tail")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in dedup.line_dedup(docs, delimiter="|").collect()}
    assert out[1].n_lines == 3 and out[1].n_kept == 3
    assert out[2].n_lines == 2 and out[2].n_kept == 1
    assert out[2].cleaned_text == "tail"


def test_unigram_logprob_orders_quality(spark):
    """Docs made of corpus-common tokens must outscore docs of corpus-rare
    tokens; probabilities sum correctly (ln p <= 0 always)."""
    rows = [(i, "common words repeated here always") for i in range(9)]
    rows.append((99, "zyzzyva qwerty uncommon"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in text.unigram_logprob_score(docs).collect()}
    assert all(r.mean_logprob < 0 for r in out.values())
    assert out[0].mean_logprob > out[99].mean_logprob
    assert out[0].n_tokens == 5 and out[99].n_tokens == 3


def test_hybrid_rrf_fusion_semantics(spark, sf_dir):
    """RRF fusion invariants on real data: every fused score equals
    1/(60+lex_rank) + 1/(60+dense_rank) with missing sides contributing
    zero, the query doc never appears in its own results, a doc found
    by BOTH retrievers at equal ranks beats one found by a single
    retriever at the same rank, and ranks are dense per query."""
    from parquet_metadata_explorer_spark.operators.similarity import (
        hybrid_rrf_topk,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = hybrid_rrf_topk(docs, emb, [0, 1], k=8, k_each=15).collect()
    assert rows and {r.query_id for r in rows} == {0, 1}
    for r in rows:
        assert r.doc_id != r.query_id
        expect = 0.0
        if r.lex_rank is not None:
            expect += 1.0 / (60 + r.lex_rank)
        if r.dense_rank is not None:
            expect += 1.0 / (60 + r.dense_rank)
        assert abs(r.rrf_score - expect) < 1e-12, r
        assert r.lex_rank is not None or r.dense_rank is not None
    for qid in (0, 1):
        q = sorted((r for r in rows if r.query_id == qid), key=lambda r: r.rank)
        assert [r.rank for r in q] == list(range(1, len(q) + 1))
        assert all(
            q[i].rrf_score >= q[i + 1].rrf_score for i in range(len(q) - 1)
        )
    # a doc found by BOTH retrievers must outrank every doc a single
    # retriever found at an equal-or-worse rank (the RRF property the
    # fusion exists for) — check it on the real fused rows
    both = [r for r in rows if r.lex_rank is not None and r.dense_rank is not None]
    for bdoc in both:
        worst = max(bdoc.lex_rank, bdoc.dense_rank)
        for s in rows:
            if s.query_id != bdoc.query_id:
                continue
            if s.lex_rank is None and (s.dense_rank or 0) >= worst:
                assert bdoc.rrf_score > s.rrf_score, (bdoc, s)
            if s.dense_rank is None and (s.lex_rank or 0) >= worst:
                assert bdoc.rrf_score > s.rrf_score, (bdoc, s)


def test_bm25_persisted_probe_matches_memory_and_prunes(spark, tmp_path):
    """The materialized BM25 index (postings bucketed by term hash,
    doc length denormalized Lucene-style) must (a) reproduce the
    in-memory scorer BIT-identically from disk, and (b) open ONLY the
    probed term-buckets' files — partition pruning is the scan-level
    payoff of the bucket layout."""
    from pyspark.sql.functions import input_file_name

    from parquet_metadata_explorer_spark.operators.text import (
        bm25_probe_topk,
        bm25_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "bm25")
    write_bm25_index(docs, path)

    qs = [(1, "fast hash join"), (2, "slow stream filter")]
    disk = bm25_probe_topk(spark, path, qs, k=10)
    mem = bm25_topk(docs, qs, k=10)
    assert sorted(map(tuple, disk.collect())) == sorted(map(tuple, mem.collect()))

    # pruning: the probed scan must touch a strict subset of the files
    all_files = {
        r[0]
        for r in spark.read.parquet(f"{path}/postings")
        .select(input_file_name())
        .distinct()
        .collect()
    }
    probed = spark.read.parquet(f"{path}/postings").filter(
        F.col("bucket").isin([0, 1])
    )
    touched = {
        r[0] for r in probed.select(input_file_name()).distinct().collect()
    }
    assert touched and touched < all_files
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    # the probe plan itself prunes on bucket AND pushes the term filter
    dplan = disk._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in dplan
    assert "PushedFilters" in dplan and "term" in dplan


def test_hybrid_rrf_from_index_equals_memory(spark, tmp_path):
    """The serving composition: hybrid retrieval with its lexical side
    probing the materialized BM25 index must equal the in-memory hybrid
    bit-for-bit (it inherits the probe's disk ≡ memory contract)."""
    from parquet_metadata_explorer_spark.operators.similarity import (
        hybrid_rrf_topk,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        write_bm25_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "bm25")
    write_bm25_index(docs, path)
    mem = hybrid_rrf_topk(docs, emb, [0, 1], k=6, k_each=12)
    idx = hybrid_rrf_topk(
        docs, emb, [0, 1], k=6, k_each=12, bm25_index_path=path
    )
    assert sorted(map(tuple, mem.collect())) == sorted(map(tuple, idx.collect()))


def test_bm25_index_increment_equals_rebuild(spark, tmp_path):
    """Log-structured index maintenance: build on batch 1, append
    batch 2 (and then batch 3), and every probe must be BIT-identical
    to a fresh full rebuild over the union — postings/df-delta appends
    plus the summed stats sidecar reproduce the exact same idf and
    length normalization. Old files are never rewritten (append-only,
    file-set superset asserted)."""
    import os

    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_increment,
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b1 = docs.filter(F.col("doc_id") % 3 == 0)
    b2 = docs.filter(F.col("doc_id") % 3 == 1)
    b3 = docs.filter(F.col("doc_id") % 3 == 2)
    qs = [(1, "fast hash join"), (2, "window merge sort")]

    inc_path = str(tmp_path / "inc")
    write_bm25_index(b1, inc_path)

    def files(sub):
        return {
            os.path.join(r, f)
            for r, _d, fs in os.walk(f"{inc_path}/{sub}")
            for f in fs
            if f.endswith(".parquet")
        }

    before = files("postings")
    bm25_index_increment(b2, inc_path)
    after = files("postings")
    assert before < after  # append-only: old files untouched

    full_path = str(tmp_path / "full")
    write_bm25_index(b1.unionByName(b2), full_path)
    assert sorted(
        map(tuple, bm25_probe_topk(spark, inc_path, qs, k=10).collect())
    ) == sorted(
        map(tuple, bm25_probe_topk(spark, full_path, qs, k=10).collect())
    )

    # a second increment keeps the invariant (stats fold across batches)
    bm25_index_increment(b3, inc_path)
    full3 = str(tmp_path / "full3")
    write_bm25_index(docs, full3)
    expected = sorted(
        map(tuple, bm25_probe_topk(spark, full3, qs, k=10).collect())
    )
    assert (
        sorted(map(tuple, bm25_probe_topk(spark, inc_path, qs, k=10).collect()))
        == expected
    )

    # an all-empty batch is a no-op BEFORE any write — the index
    # (including its only non-append-only file, the stats sidecar)
    # survives untouched
    empty = spark.createDataFrame(
        [(9999, ""), (10000, "...!!!")], "doc_id long, text string"
    )
    bm25_index_increment(empty, inc_path)
    assert (
        sorted(map(tuple, bm25_probe_topk(spark, inc_path, qs, k=10).collect()))
        == expected
    )

    # a non-default bucket modulus lives in the stats sidecar: probe
    # and increment read it from the index, so no caller can mismatch
    nb_path = str(tmp_path / "nb16")
    write_bm25_index(b1, nb_path, n_buckets=16)
    bm25_index_increment(b2.unionByName(b3), nb_path)
    assert (
        sorted(map(tuple, bm25_probe_topk(spark, nb_path, qs, k=10).collect()))
        == expected
    )


def test_bm25_increment_commit_protocol(spark, tmp_path):
    """The log-structured commit protocol: a TORN increment (segment
    data written, no commit row) is invisible to the probe — never
    half-counted; retrying it under the same batch_id lands exactly
    once; replaying an already-committed batch_id is a no-op; the
    reserved/base ids are rejected."""
    import os

    import pytest

    from parquet_metadata_explorer_spark.operators.text import (
        _bm25_segment_write,
        _corpus_postings,
        _read_bm25_stats,
        bm25_index_increment,
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    qs = [(1, "fast hash join"), (2, "window merge sort")]
    path = str(tmp_path / "idx")
    write_bm25_index(b1, path)
    base_only = sorted(
        map(tuple, bm25_probe_topk(spark, path, qs, k=10).collect())
    )

    # simulate a crash AFTER the segment writes but BEFORE the commit:
    # the batch's files exist on disk, the probe must not see them
    from parquet_metadata_explorer_spark.operators.text import _bm25_dfreq

    postings, doclen = _corpus_postings(b2, track=False)
    n_buckets = int(_read_bm25_stats(path)["n_buckets"])
    _bm25_segment_write(
        postings.join(doclen, "doc_id"),
        _bm25_dfreq(postings),
        path,
        n_buckets,
        "cdc-1",
        fresh=False,
    )
    postings.unpersist()
    assert any(
        "batch=cdc-1" in r for r, _d, _f in os.walk(f"{path}/postings")
    )
    assert (
        sorted(map(tuple, bm25_probe_topk(spark, path, qs, k=10).collect()))
        == base_only
    )

    # the retry under the SAME id replaces its own partitions exactly
    # once and commits — equal to a fresh rebuild over the union
    bm25_index_increment(b2, path, batch_id="cdc-1")
    full = str(tmp_path / "full")
    write_bm25_index(docs, full)
    expected = sorted(
        map(tuple, bm25_probe_topk(spark, full, qs, k=10).collect())
    )
    committed = sorted(
        map(tuple, bm25_probe_topk(spark, path, qs, k=10).collect())
    )
    assert committed == expected

    # replaying the committed id writes nothing (idempotent), even
    # with different content — the commit file is the dedup key
    bm25_index_increment(docs, path, batch_id="cdc-1")
    assert (
        sorted(map(tuple, bm25_probe_topk(spark, path, qs, k=10).collect()))
        == expected
    )

    # reserved / unsafe ids are refused before any write
    with pytest.raises(ValueError, match="reserved"):
        bm25_index_increment(b2, path, batch_id="base")
    with pytest.raises(ValueError, match="filesystem-safe"):
        bm25_index_increment(b2, path, batch_id="a/b")

    # rebuilding IN PLACE over an incremented index retires the old
    # commit log with the old data: exactly one base commit remains
    # and the probe serves the new corpus
    from parquet_metadata_explorer_spark.operators.text import _bm25_commits

    write_bm25_index(b1, path)
    assert set(_bm25_commits(path)) == {"base"}
    assert (
        sorted(map(tuple, bm25_probe_topk(spark, path, qs, k=10).collect()))
        == base_only
    )

    # recovery-on-open: a compaction swap crashed mid-rename leaves the
    # index at the deterministic .retired sibling — the PROBE and the
    # INCREMENT heal it themselves instead of erroring until the next
    # maintenance run
    os.rename(path, f"{path}.retired")
    assert (
        sorted(map(tuple, bm25_probe_topk(spark, path, qs, k=10).collect()))
        == base_only
    )
    assert os.path.isdir(path) and not os.path.exists(f"{path}.retired")
    os.rename(path, f"{path}.retired")
    bm25_index_increment(b2, path, batch_id="heal-1")
    assert os.path.isdir(path)
    assert set(_bm25_commits(path)) == {"base", "heal-1"}


def test_bm25_index_compact_folds_segments(spark, tmp_path):
    """Segment merge: after N increments (plus a torn leftover),
    compaction folds everything back into one base segment — probe
    BIT-identical, commit log down to one row, torn files vacuumed,
    per-bucket file count back to the single-segment shape."""
    import os

    from parquet_metadata_explorer_spark.operators.text import (
        _bm25_commits,
        _bm25_segment_write,
        _corpus_postings,
        bm25_index_compact,
        bm25_index_increment,
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    qs = [(1, "fast hash join"), (2, "window merge sort")]
    path = str(tmp_path / "idx")
    write_bm25_index(docs.filter(F.col("doc_id") % 3 == 0), path)
    bm25_index_increment(docs.filter(F.col("doc_id") % 3 == 1), path, batch_id="c1")
    bm25_index_increment(docs.filter(F.col("doc_id") % 3 == 2), path, batch_id="c2")
    # a torn segment on top: data without a commit row
    from parquet_metadata_explorer_spark.operators.text import _bm25_dfreq

    postings, doclen = _corpus_postings(
        docs.filter(F.col("doc_id") % 3 == 2), track=False
    )
    _bm25_segment_write(
        postings.join(doclen, "doc_id"),
        _bm25_dfreq(postings),
        path,
        64,
        "torn",
        fresh=False,
    )
    postings.unpersist()

    before = sorted(map(tuple, bm25_probe_topk(spark, path, qs, k=10).collect()))

    def pfiles():
        return [
            os.path.join(r, f)
            for r, _d, fs in os.walk(f"{path}/postings")
            for f in fs
            if f.endswith(".parquet")
        ]

    n_before = len(pfiles())
    folded = bm25_index_compact(spark, path)
    assert folded == 3
    assert set(_bm25_commits(path)) == {"base"}
    assert not any("batch=torn" in p or "batch=c" in p for p in pfiles())
    assert len(pfiles()) < n_before
    after = sorted(map(tuple, bm25_probe_topk(spark, path, qs, k=10).collect()))
    assert after == before  # bit-identical scores through the merge

    # already-compact index: a no-op that writes nothing — but it
    # still VACUUMS a torn segment (a crashed increment retried under
    # a fresh random id must not strand dead files forever)
    postings, doclen = _corpus_postings(
        docs.filter(F.col("doc_id") % 3 == 2), track=False
    )
    _bm25_segment_write(
        postings.join(doclen, "doc_id"),
        _bm25_dfreq(postings),
        path,
        64,
        "torn2",
        fresh=False,
    )
    postings.unpersist()
    assert any("batch=torn2" in p for p in pfiles())
    mtimes = {p: os.path.getmtime(p) for p in pfiles() if "torn2" not in p}
    assert bm25_index_compact(spark, path) == 0
    assert not any("batch=torn2" in p for p in pfiles())
    assert {p: os.path.getmtime(p) for p in pfiles()} == mtimes

    # crash window between the two swap renames: the live dir is gone
    # but the DETERMINISTIC .retired sibling holds the old complete
    # index — the next compaction run recovers it before proceeding
    os.rename(path, f"{path}.retired")
    assert bm25_index_compact(spark, path) == 0
    assert os.path.isdir(path) and not os.path.exists(f"{path}.retired")
    assert (
        sorted(map(tuple, bm25_probe_topk(spark, path, qs, k=10).collect()))
        == before
    )


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Whole near-dup clusters must land in one split — including a
    transitive chain a-b, b-c where a and c never pair directly — and
    the doc_id-keyed hash_split demonstrably splits at least one of
    these pairs (the leakage this operator exists to prevent).
    Singletons key on their own doc_id, so their assignment matches
    hash_split exactly and adding clustered docs cannot move them."""
    from parquet_metadata_explorer_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    # find two doc ids whose doc-keyed permilles straddle the 100 cut
    import hashlib

    def permille(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16) % 1000

    low = next(i for i in range(1000) if permille(i) < 100)
    high = next(i for i in range(1000) if permille(i) >= 100)
    docs = spark.createDataFrame(
        [(low,), (high,), (500,), (501,), (502,), (777,)], "doc_id long"
    )
    # chain: low-high (the straddling pair) and 500-501, 501-502
    pairs = spark.createDataFrame(
        [(low, high), (500, 501), (501, 502)], "doc_a long, doc_b long"
    )
    out = {
        r.doc_id: r for r in leakage_safe_split(docs, pairs).collect()
    }
    # the straddling near-dup pair stays together...
    assert out[low].split == out[high].split
    assert out[low].cluster_id == out[high].cluster_id == min(low, high)
    # ...whereas hash_split on doc_id would leak it across splits
    naive = {
        r.doc_id: r.split
        for r in hash_split(docs, "doc_id", 100).collect()
    }
    assert naive[low] != naive[high]
    # transitive chain is one cluster, one split
    assert (
        out[500].cluster_id == out[501].cluster_id == out[502].cluster_id == 500
    )
    assert out[500].split == out[501].split == out[502].split
    # singleton: own-id cluster, assignment identical to hash_split
    assert out[777].cluster_id == 777 and out[777].split == naive[777]


def test_bm25_topk_matches_reference_scoring(spark):
    """BM25 against a brute-force Python reference on a hand-built
    corpus: scores match to the operator's round-6 output precision
    (the oracle parity test is the exact check), rare terms outweigh
    common ones (idf), and a term absent from a doc contributes
    nothing."""
    import math

    rows = [
        (1, "apple banana apple"),
        (2, "apple"),
        (3, "cherry banana"),
        (4, "banana banana banana banana"),
        (5, "apple cherry durian"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    k1, b = 1.2, 0.75
    out = {
        (r.query_id, r.doc_id): r
        for r in text.bm25_topk(
            docs, [(1, "apple cherry"), (2, "banana")], k=5, k1=k1, b=b
        ).collect()
    }

    toks = {d: t.split() for d, t in rows}
    N = len(rows)
    avgdl = sum(len(t) for t in toks.values()) / N

    def ref_score(doc, qterms):
        s = 0.0
        for t in set(qterms):
            tf = toks[doc].count(t)
            if not tf:
                continue
            df = sum(1 for v in toks.values() if t in v)
            idf = round(math.log((N - df + 0.5) / (df + 0.5) + 1.0), 12)
            dl = len(toks[doc])
            s += round(
                idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))),
                12,
            )
        return s

    for (qid, qterms) in [(1, ["apple", "cherry"]), (2, ["banana"])]:
        for d in toks:
            expect = ref_score(d, qterms)
            got = out.get((qid, d))
            if expect == 0.0:
                assert got is None  # no query term in doc -> no candidate row
            else:
                # operator rounds the decimal sum to 6 places
                assert got is not None and abs(got.score - expect) < 1e-6

    # rare cherry (df=2) outweighs common apple (df=3) at equal tf/dl
    assert out[(1, 3)].score > out[(1, 2)].score
    # ranks are dense per query, ordered by score desc
    q1 = sorted(
        (r for r in out.values() if r.query_id == 1), key=lambda r: r.rank
    )
    assert [r.rank for r in q1] == list(range(1, len(q1) + 1))
    assert all(
        q1[i].score >= q1[i + 1].score for i in range(len(q1) - 1)
    )


def test_redact_pii_patterns(spark):
    rows = [
        (1, "mail me at a.b-c_1@sub.example.org or root@x.io thanks"),
        (2, "server 192.168.0.1 and 10.255.3.77 up; version 1.2 not an ip"),
        (3, "clean text with no identifiers at all"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in text.redact_pii(docs).collect()}
    assert out[1].n_emails == 2 and out[1].n_ips == 0
    assert "<EMAIL>" in out[1].redacted_text and "@" not in out[1].redacted_text
    assert out[2].n_ips == 2 and out[2].n_emails == 0
    assert out[2].redacted_text.count("<IP>") == 2
    assert "version 1.2" in out[2].redacted_text  # not over-matched
    assert out[3].n_emails == 0 and out[3].n_ips == 0
    assert out[3].redacted_text == rows[2][1]


def test_redact_pii_ip_inside_email_not_double_counted(spark):
    """An IPv4 embedded in an email local-part is consumed by <EMAIL>;
    n_ips must count only the <IP> tokens actually emitted."""
    docs = spark.createDataFrame(
        [(1, "login 1.2.3.4@example.com from 5.6.7.8")], ["doc_id", "text"]
    )
    r = text.redact_pii(docs).collect()[0]
    assert r.n_emails == 1 and r.n_ips == 1
    assert r.redacted_text == "login <EMAIL> from <IP>"


def test_knn_graph_shape_and_symmetric_candidates(spark, embs):
    out = similarity.knn_graph(embs, k=2, n_bands=16, planes_per_band=4)
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r)
    # identical vectors 0 and 1 must be each other's rank-1 neighbor
    assert by_src[0][0].dst == 1 and by_src[0][0].cos == 1.0
    assert by_src[1][0].dst == 0 and by_src[1][0].cos == 1.0
    for src, rs in by_src.items():
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == list(
            range(1, len(rs) + 1)
        )
        assert all(r.dst != src for r in rs)


def test_corpus_diff_statuses(spark):
    from parquet_metadata_explorer_spark.operators.pipelines import corpus_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone"), (5, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh"), (5, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    # unchanged (1) and the null==null pair (5) are dropped by default
    assert out == {2: "changed", 3: "removed", 4: "added"}
    full = {
        r.doc_id: r.status
        for r in corpus_diff(old, new, include_unchanged=True).collect()
    }
    assert full[1] == "unchanged" and full[5] == "unchanged"
    # whitespace/case edits are CHANGED — the diff is byte identity,
    # not the normalized dedup fingerprint
    old2 = spark.createDataFrame([(9, "A  b")], "doc_id long, text string")
    new2 = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    assert corpus_diff(old2, new2).collect()[0].status == "changed"


def test_dataset_card_dominant_lang_tiebreak(spark):
    from parquet_metadata_explorer_spark.operators.pipelines import dataset_card

    rows = [
        (1, "s1", "en", "hello world one"),
        (2, "s1", "de", "hallo welt zwei"),  # tie en/de -> lexicographically LAST
        (3, "s2", "en", "three words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")
    out = {r.source: r for r in dataset_card(docs).collect()}
    assert out["s1"].top_lang == "en"  # max(struct) tie-break: 'en' > 'de'
    assert out["s1"].n_docs == 2 and out["s2"].n_docs == 1
    assert abs(out["s1"].pct_docs - 66.6667) < 1e-3
    assert out["s2"].n_tokens == 3


def test_knn_graph_auto_planes_matches_pinned_at_oracle_scales(spark):
    """The registry query pins planes_per_band=4 (static SQL twin); the
    auto default must RESOLVE to 4 at both driver correctness scales, or
    a testdata regeneration could silently desynchronize query and
    oracle. 500 and 2000 vectors / target 128 -> ceil(log2(n/128))
    clamped at 4 -> 4."""
    import math

    for n in (500, 2000):
        p = max(4, min(20, math.ceil(math.log2(max(n / 128, 2.0)))))
        assert p == 4, (n, p)
    # and the operator's own resolution agrees end-to-end on a tiny corpus
    rows = [(i, [float(i % 7), 1.0, 0.5, -0.25]) for i in range(40)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    auto = similarity.knn_graph(embs, k=3, n_bands=8)
    pinned = similarity.knn_graph(embs, k=3, n_bands=8, planes_per_band=4)
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, pinned.collect()))


def test_bloom_math_matches_reference_reader(spark):
    """The vectorized numpy bloom build/probe must agree bit-for-bit with
    the scalar split-block reader in parquet.bloom on every inserted hash
    (no false negatives by construction) and on membership of probes."""
    import random

    import numpy as np

    from parquet_metadata_explorer_spark.operators.text import (
        _bloom_build_words,
        _bloom_probe_words,
    )
    from parquet_metadata_explorer_spark.parquet.bloom import BloomFilter

    rng = random.Random(11)
    inserted = [rng.getrandbits(64) for _ in range(2000)]
    probes = inserted + [rng.getrandbits(64) for _ in range(2000)]
    nb = 64
    words = _bloom_build_words(np.array(inserted, dtype=np.uint64), nb)
    ref = BloomFilter(words.astype("<u4").tobytes())
    got = _bloom_probe_words(np.array(probes, dtype=np.uint64), words, nb)
    want = [ref.might_contain_hash(h) for h in probes]
    assert got.tolist() == want
    assert all(got[: len(inserted)])


def test_decontaminate_bloom_upper_bounds_exact(spark, sf_dir):
    """Bloom contamination must never miss an exact hit (no false
    negatives) and at 24 bits/item must stay close to exact: an
    over-flagging bloom would quarantine clean documents."""
    from parquet_metadata_explorer_spark.operators import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 20 != 0)
    bench = docs.filter(F.col("doc_id") % 20 == 0)

    exact = {r.doc_id: r for r in t.decontaminate(train, bench).collect()}
    bloom = {r.doc_id: r for r in t.decontaminate_bloom(train, bench).collect()}
    assert exact.keys() == bloom.keys()
    fp_extra = 0
    for did, e in exact.items():
        b = bloom[did]
        assert b.n_sh == e.n_sh
        assert b.n_hit >= e.n_hit, (did, b.n_hit, e.n_hit)
        assert b.contaminated or not e.contaminated
        fp_extra += b.n_hit - e.n_hit
    total_sh = sum(e.n_sh for e in exact.values())
    assert fp_extra / total_sh < 0.005, (fp_extra, total_sh)
    # the deterministic-hash variant (the boarded/oracled path) must
    # honor the same upper-bound and FP-budget contract
    det = {r.doc_id: r for r in t.decontaminate_bloom(
        train, bench, deterministic_hash=True).collect()}
    assert exact.keys() == det.keys()
    det_extra = 0
    for did, e in exact.items():
        d = det[did]
        assert d.n_sh == e.n_sh and d.n_hit >= e.n_hit, (did, d, e)
        assert d.contaminated or not e.contaminated
        det_extra += d.n_hit - e.n_hit
    assert det_extra / total_sh < 0.005, (det_extra, total_sh)


def test_bpe_merges_hand_checked(spark):
    """Hand-checkable corpus: 'low' x5 and 'lower' x2. First merge must
    be (l, o) count 7; after it, (lo, w) at 7 beats everything; then
    w</w> at 5 closes 'low'."""
    docs = spark.createDataFrame(
        [(i, "low") for i in range(5)] + [(9000 + i, "lower") for i in range(2)],
        "doc_id long, text string",
    )
    out = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in text.bpe_merges(docs, n_merges=3, min_count=1).collect()
    ]
    assert out == [
        (1, "l", "o", "lo", 7),
        (2, "lo", "w", "low", 7),
        (3, "low", "</w>", "low</w>", 5),
    ], out


def test_bpe_merges_stops_when_exhausted(spark):
    """min_count prunes the tail: asking for more merges than the corpus
    supports returns only the supported prefix."""
    docs = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    out = text.bpe_merges(docs, n_merges=50, min_count=2).collect()
    # pairs with corpus count >= 2: (a,b) and (ab,</w>) only
    assert [(r.left, r.right) for r in out] == [("a", "b"), ("ab", "</w>")], out


def test_bpe_tokenize_counts(spark):
    """With an empty merge table every char + one </w> per word is a
    token; merges only ever reduce the count."""
    docs = spark.createDataFrame(
        [(1, "ab cd"), (2, "low low lower")], "doc_id long, text string"
    )
    empty = text.bpe_merges(docs.limit(0), n_merges=0)
    base = {r.doc_id: r.n_bpe_tokens for r in text.bpe_tokenize(docs, empty).collect()}
    assert base[1] == 4 + 2  # 4 chars + 2 end-of-word markers
    assert base[2] == 11 + 3
    trained = text.bpe_merges(docs, n_merges=5, min_count=1)
    merged = {
        r.doc_id: r.n_bpe_tokens for r in text.bpe_tokenize(docs, trained).collect()
    }
    assert all(merged[d] <= base[d] for d in base)
    assert merged[2] < base[2]  # 'low' x3 must compress


def test_bpe_tokenize_reconstructs_text(spark, sf_dir):
    """Merges only delete separators, so concatenating the token stream
    (with </w> back to spaces) must reproduce the normalized text of
    EVERY document — the lossless-encode invariant."""
    from parquet_metadata_explorer_spark.functions import normalize_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = text.bpe_merges(docs, n_merges=8)
    out = text.bpe_tokenize(docs, merges, with_tokens=True)
    bad = (
        out.join(docs, "doc_id")
        .select(
            F.trim(
                F.regexp_replace(F.array_join("bpe_tokens", ""), "</w>", " ")
            ).alias("rebuilt"),
            normalize_text(F.col("text")).alias("norm"),
        )
        .filter(F.col("rebuilt") != F.col("norm"))
        .count()
    )
    assert bad == 0


def test_bpe_fast_trainer_matches_spark_loop(spark, sf_dir):
    """bpe_merges_fast (driver-side incremental loop, symbol-exact
    aligned merges) must reproduce bpe_merges' table wherever the Spark
    loop's bare-separator replace never crosses a symbol boundary — true
    on the documents corpus through rank 45 (first boundary-crossing
    divergence is rank 46, documented in _bpe_wrap)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for n in (8, 25):
        a = [tuple(r) for r in text.bpe_merges(docs, n_merges=n).collect()]
        b = [tuple(r) for r in text.bpe_merges_fast(docs, n_merges=n).collect()]
        assert a == b, (n, [x for x, y in zip(a, b) if x != y][:3])


def test_bpe_fast_collect_bounds(spark, sf_dir):
    """The driver-collect guards (min_count word prefilter, max_vocab
    top-N-by-mass cap) must (a) be no-ops when they don't bind — same
    merge table at min_count=1 and 2 on the singleton-free documents
    corpus, with and without a non-binding cap — and (b) when they DO
    bind, restrict training to exactly the surviving words."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # (a) non-binding guards change nothing (documents has no wc==1
    # words, and its vocab is 31 << the cap)
    base = [
        tuple(r)
        for r in text.bpe_merges_fast(
            docs, n_merges=12, min_count=1, max_vocab=None
        ).collect()
    ]
    for mc, mv in ((2, None), (1, 1000), (2, 1000)):
        got = [
            tuple(r)
            for r in text.bpe_merges_fast(
                docs, n_merges=12, min_count=mc, max_vocab=mv
            ).collect()
        ]
        assert got == base, (mc, mv)

    # (b) binding guards: 'zq' is supported only by two singleton words
    toy = spark.createDataFrame(
        [("a", "zq zq"), ("b", "hello hello hello"), ("c", "zqx")],
        "doc_id string, text string",
    )
    # min_count=1: no prefilter; the zq pair (summed support 3) merges
    # once the loop exhausts the pair space
    deep = {
        (r["left"], r["right"])
        for r in text.bpe_merges_fast(toy, 20, min_count=1).collect()
    }
    assert ("z", "q") in deep
    # the documented deviation: a pair whose SUMMED support >= min_count
    # but every supporting word is individually sub-threshold
    toy2 = spark.createDataFrame(
        [("a", "zqa"), ("b", "zqb"), ("c", "hello hello hello")],
        "doc_id string, text string",
    )
    merged2 = {
        (r["left"], r["right"])
        for r in text.bpe_merges_fast(toy2, 20, min_count=2).collect()
    }
    # pair (z,q) has summed support 2 >= min_count, but both 'zqa' and
    # 'zqb' have wc=1 < min_count: the prefilter loses it BY DESIGN
    assert ("z", "q") not in merged2
    unfiltered2 = {
        (r["left"], r["right"])
        for r in text.bpe_merges_fast(toy2, 20, min_count=1).collect()
    }
    assert ("z", "q") in unfiltered2
    # max_vocab=1 keeps only the heaviest word ('hello' wc=3): every
    # merge must be over hello's alphabet
    capped = text.bpe_merges_fast(toy2, 20, min_count=1, max_vocab=1).collect()
    assert capped, "cap must not empty the trainer"
    for r in capped:
        assert set(r["left"]) <= set("hello</w>") and set(r["right"]) <= set(
            "hello</w>"
        ), tuple(r)


def _py_reference_encode(text_value, merges):
    """Independent per-document reference encoder: normalize, then the
    aligned leftmost-non-overlapping merge scan per word, rank order —
    no shared code with the wrapped-string kernel."""
    import re

    norm = re.sub(r"[^a-z0-9]+", " ", text_value.lower()).strip()
    toks = []
    for w in norm.split(" "):
        sym = list(w) + ["</w>"]
        for left, right in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        toks.extend(sym)
    return len(toks), " ".join(toks)


def test_bpe_word_path_matches_reference_encoder(spark, sf_dir):
    """The distinct-word Arrow encode must equal an independent pure-
    Python aligned encoder document-for-document at 60 merges."""
    import hashlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges_df = text.bpe_merges_fast(docs, n_merges=60)
    merges = [
        (r.left, r.right) for r in merges_df.orderBy("rank").collect()
    ]
    got = {
        r.doc_id: (r.n_bpe_tokens, r.fingerprint)
        for r in text.bpe_tokenize_words(docs, merges_df).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        n, stream = _py_reference_encode(row.text, merges)
        fp = hashlib.md5(stream.encode()).hexdigest()
        assert got[row.doc_id] == (n, fp), row.doc_id


def test_bpe_word_path_lossless_at_production_vocab(spark, sf_dir):
    """Thousand-merge table through the word path: the token stream must
    still reconstruct the normalized text exactly (merges only delete
    separators), and the identifier corpus must actually support >= 1000
    merges — the production-vocabulary claim the board row makes."""
    from parquet_metadata_explorer_spark.functions import normalize_text

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("doc_id"), F.col("c_name").alias("text")
    )
    merges = text.bpe_merges_fast(cust, n_merges=1200, min_count=1)
    merges.cache()
    n_merges = merges.count()
    out = text.bpe_tokenize_words(cust, merges, with_tokens=True)
    bad = (
        out.join(cust, "doc_id")
        .select(
            F.trim(
                F.regexp_replace(F.array_join("bpe_tokens", ""), "</w>", " ")
            ).alias("rebuilt"),
            normalize_text(F.col("text")).alias("norm"),
        )
        .filter(F.col("rebuilt") != F.col("norm"))
        .count()
    )
    assert bad == 0
    # sf0.001's 150-name vocabulary exhausts at 189 merges; the full
    # >=1000-merge claim is asserted at the driver scale (sf0.01: 1200
    # merges, verified hash-exact by the boarded recursive-CTE oracle)
    assert n_merges >= 150, n_merges


def test_prepare_corpus_end_to_end(spark, sf_dir):
    """The composed preparation pipeline must be monotone (each stage
    only removes documents), decontaminated (no surviving doc crosses
    the containment threshold), and packed consistently (every final
    doc has a pack assignment and offsets tile the token tape)."""
    from parquet_metadata_explorer_spark.operators.pipelines import prepare_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)

    packs, tokenized, merges, audit = prepare_corpus(train, bench, n_merges=4)
    assert (
        audit["input"]
        >= audit["after_quality"]
        >= audit["after_line_dedup"]
        >= audit["after_exact"]
        >= audit["after_decontamination"]
        > 0
    ), audit
    assert merges.count() == 4
    prow = packs.orderBy("doc_id").collect()
    assert len(prow) == audit["after_decontamination"]
    assert tokenized.count() == audit["after_decontamination"]
    # offsets tile the tape: each doc starts where the previous ended
    off = 0
    for r in prow:
        assert r.pack_start == off, (r.doc_id, r.pack_start, off)
        off += r.n_tokens
        assert r.pack_id == r.pack_start // 2048


def test_substring_dedup_interval_union(spark):
    """A 30-token span copied from doc 1 into doc 2 (window=8) must mark
    exactly 23 duplicate windows merging to exactly 30 duplicated tokens
    in doc 2, zero in the first-occurrence doc; adjacent/overlapping
    duplicated windows never double-count tokens."""
    from parquet_metadata_explorer_spark.operators.dedup import substring_dedup

    words = lambda k, n: " ".join(f"w{k}{i}" for i in range(n))
    a = words("a", 60)
    span = " ".join(a.split()[10:40])
    b = words("b", 20) + " " + span + " " + words("c", 15)
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, words("d", 30)), (4, "short doc here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in substring_dedup(df, window=8).collect()}
    assert out[1].n_dup_windows == 0 and out[1].n_dup_tokens == 0
    assert out[2].n_dup_windows == 30 - 8 + 1
    assert out[2].n_dup_tokens == 30
    assert abs(out[2].dup_token_frac - round(30 / 65, 4)) < 1e-9
    assert out[3].n_dup_tokens == 0
    assert out[4].n_windows == 0  # shorter than the window

    # two separate copied spans in one doc stay separate intervals
    c = words("e", 10) + " " + " ".join(a.split()[0:12]) + " " + words("f", 10) \
        + " " + " ".join(a.split()[40:52])
    df2 = spark.createDataFrame([(1, a), (5, c)], "doc_id long, text string")
    out2 = {r.doc_id: r for r in substring_dedup(df2, window=8).collect()}
    assert out2[5].n_dup_tokens == 24  # 12 + 12, no bridge across f-words


def test_bigram_logprob_prefers_seen_transitions(spark):
    """Two docs over the same token multiset: the one whose transitions
    dominate the corpus must out-score (lower perplexity than) the one
    forcing backoff through unseen bigrams; ppl == exp(-mean)."""
    import math

    from parquet_metadata_explorer_spark.operators.text import (
        bigram_logprob_score,
    )

    common = "the cat sat on the mat"
    rows = [(i, common) for i in range(8)]
    rows.append((100, common))             # canonical transitions
    rows.append((200, "mat the on sat cat the"))  # same words, novel order
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_logprob_score(df).collect()}
    assert out[100].mean_logprob > out[200].mean_logprob
    assert out[100].ppl < out[200].ppl
    for d in (100, 200):
        assert out[d].n_tokens == 6 and out[d].n_scored == 5
        assert abs(out[d].ppl - math.exp(-out[d].mean_logprob)) < 1e-3


def test_dsir_resample_semantics(spark, sf_dir):
    """DSIR importance weights must actually favor target-like text:
    docs from the target sources score a higher mean log-weight than
    the rest; the keep_fraction sketch path keeps ~the asked fraction
    and agrees with the exact top-k on the clearly-above-cut head;
    empty docs get weight 0; the selector demands exactly one mode."""
    import pytest

    from parquet_metadata_explorer_spark.operators.sampling import (
        dsir_resample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = docs.filter(F.col("source").isin("src0", "src1"))
    n = docs.count()

    sel = dsir_resample(docs, target, n_out=n)  # rank everything
    rows = sel.collect()
    assert len(rows) == n and len({r.doc_id for r in rows}) == n
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    tgt_w = [r.log_weight for r in rows if src[r.doc_id] in ("src0", "src1")]
    oth_w = [r.log_weight for r in rows if src[r.doc_id] not in ("src0", "src1")]
    assert sum(tgt_w) / len(tgt_w) > sum(oth_w) / len(oth_w)

    frac = dsir_resample(docs, target, keep_fraction=0.2).collect()
    assert 0.1 * n <= len(frac) <= 0.3 * n  # sketch-cut tolerance
    by_score = sorted(rows, key=lambda r: (-r.score, r.doc_id))
    head = {r.doc_id for r in by_score[: int(0.1 * n)]}
    kept = {r.doc_id for r in frac}
    assert head <= kept  # the clear head is always above the cut

    empty = spark.createDataFrame(
        [(999999, "", "xx", "srcE", 0)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    w = {r.doc_id: r.log_weight
         for r in dsir_resample(docs.unionByName(empty), target,
                                n_out=n + 1).collect()}
    assert w[999999] == 0.0

    with pytest.raises(ValueError):
        dsir_resample(docs, target)
    with pytest.raises(ValueError):
        dsir_resample(docs, target, n_out=5, keep_fraction=0.5)


def test_temperature_mix_rebalances_head(spark):
    """alpha=1 is the natural distribution (everything kept at natural
    budget); lower alpha caps tail sources at rate 1 and pushes the head
    source's rate below 1, monotonically in alpha."""
    from parquet_metadata_explorer_spark.operators.sampling import (
        temperature_mix,
        temperature_rates,
    )

    rows = [(i, "x", "big") for i in range(800)] + [
        (10_000 + i, "x", "small") for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    r1 = {r.source: r.rate for r in temperature_rates(df, alpha=1.0).collect()}
    assert all(abs(v - 1.0) < 1e-9 for v in r1.values()), r1
    assert temperature_mix(df, alpha=1.0).count() == 1000

    r_half = {r.source: r for r in temperature_rates(df, alpha=0.5).collect()}
    r_quart = {r.source: r for r in temperature_rates(df, alpha=0.25).collect()}
    assert r_half["small"].rate == 1.0 and r_quart["small"].rate == 1.0
    assert r_quart["big"].rate < r_half["big"].rate < 1.0
    # temperature-scaled share q still sums to 1
    assert abs(sum(r.q for r in r_half.values()) - 1.0) < 1e-9

    kept = (
        temperature_mix(df, alpha=0.5)
        .groupBy("source")
        .count()
        .collect()
    )
    kept = {r.source: r["count"] for r in kept}
    assert kept["small"] == 200  # rate 1: everything survives
    exp_big = r_half["big"].rate * 800
    assert abs(kept["big"] - exp_big) < 80  # md5-uniform keep near target


def test_pq_adc_equals_reconstructed_cosine(spark):
    """ADC correctness invariant (data-independent, unlike recall): a
    query's ADC score against a vector must equal the exact cosine
    between the query and the vector RECONSTRUCTED from its PQ codes —
    the lookup-table sum is dot(q, reconstruction) by linearity."""
    import math

    from parquet_metadata_explorer_spark.operators.similarity import (
        pq_ann_topk,
        pq_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    m, k = 8, 16
    codebook, codes = pq_index(e, m=m, n_centroids=k, iters=2)
    recon = {}
    for r in codes.collect():
        recon.setdefault(r.vec_id, {})[r.sub] = codebook[(r.sub, r.cluster)]
    qids = [0, 1]
    qvecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in e.filter(e.vec_id.isin(qids)).collect()
    }
    out = pq_ann_topk(e, qids, k=5, m=m, n_centroids=k, iters=2).collect()
    assert len(out) == 10
    for r in out:
        q = qvecs[r.query_id]
        rv = [x for s in range(m) for x in recon[r.neighbor_id][s]]
        dot = sum(a * b for a, b in zip(q, rv))
        qn = math.sqrt(sum(x * x for x in q))
        rn = math.sqrt(sum(x * x for x in rv))
        assert abs(r.cos - dot / (qn * rn)) < 1e-5, (r, dot / (qn * rn))


def test_pq_recall_floor(spark):
    """Approximation quality floor on the synthetic corpus: 32 centroids
    per subspace must recover a meaningful share of the exact top-10
    (measured 0.42 at 64 centroids, 0.32 at 32 — synthetic embeddings
    are noise-heavy; assert a conservative floor so regressions in the
    trainer/scorer still trip)."""
    from parquet_metadata_explorer_spark.operators.similarity import (
        cosine_topk,
        pq_ann_topk,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(e, [0, 1, 2, 3, 4], k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq_ann_topk(e, [0, 1, 2, 3, 4], k=10, n_centroids=32).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.2


def test_ivfpq_adc_equals_reconstruction(spark):
    """IVF-PQ ADC invariant: a query's score against a vector must equal
    the exact cosine between the query and cell_centroid + PQ-decoded
    residual — the two-term lookup sum is dot(q, x̂) by linearity."""
    import math

    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_ann_topk,
        ivfpq_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    m = 8
    cc, cells, pq_cb, pq_codes = ivfpq_index(
        e, k_cells=16, m=m, n_centroids=32, iters=2, coarse_iters=2
    )
    cellof = {r.vec_id: r.cell for r in cells.collect()}
    recon = {}
    for r in pq_codes.collect():
        recon.setdefault(r.vec_id, {})[r.sub] = pq_cb[(r.sub, r.cluster)]
    emb = {
        r.vec_id: [float(x) for x in r.embedding] for r in e.collect()
    }
    out = ivfpq_ann_topk(
        e, [0, 1], k=5, k_cells=16, n_probe=16, m=m, n_centroids=32,
        iters=2, coarse_iters=2,
    ).collect()
    assert len(out) == 10
    for r in out:
        q = emb[r.query_id]
        xh = [
            b + c
            for b, c in zip(
                cc[cellof[r.neighbor_id]],
                [x for s in range(m) for x in recon[r.neighbor_id][s]],
            )
        ]
        dot = sum(a * b for a, b in zip(q, xh))
        qn = math.sqrt(sum(x * x for x in q))
        rn = math.sqrt(sum(x * x for x in xh))
        assert abs(r.cos - dot / (qn * rn)) < 1e-5, (r, dot / (qn * rn))


def test_ivfpq_probes_only_nearest_cells_and_recall_floor(spark):
    """Sub-linearity contract: every returned neighbor must lie in one
    of its query's n_probe nearest cells (candidates outside probed
    cells are never scored — the rerank only re-scores them), and
    recall at the BOARD operating point (n_probe=8 + IVFADC-R exact
    rerank of the top 80) must clear 0.5 (measured 0.74 on the
    noise-heavy synthetic corpus vs 0.22 ADC-only — the rerank is the
    recall lever; the full probe grid is in ARCHITECTURE.md)."""
    from parquet_metadata_explorer_spark.operators.similarity import (
        cosine_topk,
        ivfpq_ann_topk,
        ivfpq_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    cc, cells, _, _ = ivfpq_index(e, k_cells=16, m=8, n_centroids=32)
    cellof = {r.vec_id: r.cell for r in cells.collect()}
    emb = {r.vec_id: [float(x) for x in r.embedding]
           for r in e.filter(e.vec_id.isin(qids)).collect()}
    probed = {}
    for qid in qids:
        d2s = sorted(
            (sum((a - b) * (a - b) for a, b in zip(emb[qid], cv)), cell)
            for cell, cv in cc.items()
        )
        probed[qid] = {cell for _d, cell in d2s[:8]}
    out = ivfpq_ann_topk(e, qids, k=10, k_cells=16, n_probe=8,
                         m=8, n_centroids=32, rerank=80).collect()
    for r in out:
        assert cellof[r.neighbor_id] in probed[r.query_id], r
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(e, qids, k=10).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in out}
    assert len(approx & exact) / len(exact) >= 0.5


def test_ivfpq_adc_table_distributed_equals_driver(spark):
    """The Spark-built ADC constants table must equal the driver loop
    BIT-for-bit (same fixed-order folds) with no Python stage in its
    plan — the corpus-sized-|Q| path of the r7 verdict."""
    from parquet_metadata_explorer_spark.operators.similarity import (
        _ADC_SCHEMA,
        _adc_driver_rows,
        ivfpq_adc_table,
        ivfpq_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1, 2, 3, 4, 5, 6, 7]
    cc, _cells, pq_cb, _codes = ivfpq_index(e, k_cells=16, m=8, n_centroids=32)
    queries = e.filter(e.vec_id.isin(qids)).select("vec_id", "embedding")
    drv, _ = _adc_driver_rows(queries.collect(), cc, pq_cb, 4)
    dist = ivfpq_adc_table(queries, cc, pq_cb, 4)
    a = sorted(map(tuple, spark.createDataFrame(drv, _ADC_SCHEMA).collect()))
    b = sorted(map(tuple, dist.collect()))
    assert a == b
    plan = dist._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "BatchEvalPython" not in plan, plan
    # the big-|Q| scorer accepts the distributed table end-to-end
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_ann_topk,
    )

    via_dist = ivfpq_ann_topk(
        e, qids, k=5, k_cells=16, n_probe=4, m=8, n_centroids=32,
        table_mode="distributed",
    )
    via_drv = ivfpq_ann_topk(
        e, qids, k=5, k_cells=16, n_probe=4, m=8, n_centroids=32,
        table_mode="driver",
    )
    assert sorted(map(tuple, via_dist.collect())) == sorted(
        map(tuple, via_drv.collect())
    )


def test_dedup_semantic_contract(spark, sf_dir):
    """SemDeDup contract: (a) exactly one survivor per semantic
    component and it is the MIN vec_id, (b) a planted exact-duplicate
    vector always lands in its source's component and drops, (c) every
    dropped vector has a same-cluster partner at cosine >= threshold."""
    from parquet_metadata_explorer_spark.operators.dedup import (
        semantic_duplicates,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # plant an exact duplicate of vec 0 with a fresh high id
    dup_id = 10_000_000
    dup = e.filter(F.col("vec_id") == 0).select(
        F.lit(dup_id).cast("long").alias("vec_id"), "embedding",
        *[c for c in e.columns if c not in ("vec_id", "embedding")],
    )
    rows = semantic_duplicates(
        e.unionByName(dup.select(e.columns)), n_centroids=8, iters=2,
        threshold=0.45,
    ).collect()
    by_id = {r.vec_id: r for r in rows}
    comps = {}
    for r in rows:
        comps.setdefault(r.component, []).append(r)
    for cid, members in comps.items():
        kept = [m for m in members if m.kept]
        assert len(kept) == 1 and kept[0].vec_id == min(m.vec_id for m in members)
        assert cid == min(m.vec_id for m in members)
    assert by_id[dup_id].component == by_id[0].component == 0
    assert by_id[0].kept and not by_id[dup_id].kept
    # (c): recompute cosines for dropped vectors within their cluster
    import math

    emb = {r.vec_id: [float(x) for x in r.embedding]
           for r in e.unionByName(dup.select(e.columns)).collect()}
    cluster_of = {r.vec_id: r.cluster for r in rows}
    by_cluster = {}
    for v, c in cluster_of.items():
        by_cluster.setdefault(c, []).append(v)
    for r in rows:
        if r.kept:
            continue
        v = emb[r.vec_id]
        nv = math.sqrt(sum(x * x for x in v))
        found = False
        for other in by_cluster[r.cluster]:
            if other == r.vec_id:
                continue
            w = emb[other]
            c = sum(a * b for a, b in zip(v, w)) / (
                nv * math.sqrt(sum(x * x for x in w))
            )
            if round(c, 6) >= 0.45:
                found = True
                break
        assert found, r


def test_dedup_semantic_tiling_invariant(spark, sf_dir):
    """The oversized-cluster chunk-pair tiling must be output-invariant
    (every unordered pair lands in exactly one tile) down to cap=1, and
    a planted mega-cluster of identical vectors under a tiny cap must
    still resolve to ONE component with the min id kept."""
    from parquet_metadata_explorer_spark.operators.dedup import (
        semantic_duplicates,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = sorted(map(tuple, semantic_duplicates(e, threshold=0.45).collect()))
    b = sorted(map(tuple, semantic_duplicates(
        e, threshold=0.45, cluster_cap=8).collect()))
    c = sorted(map(tuple, semantic_duplicates(
        e, threshold=0.45, cluster_cap=1).collect()))
    assert a == b == c
    one = e.filter(F.col("vec_id") == 3).select("embedding").first()[0]
    mega = spark.range(60).select(
        (F.col("id") + 5_000_000).alias("vec_id"),
        F.lit(one).alias("embedding"),
    )
    out = semantic_duplicates(
        e.select("vec_id", "embedding").unionByName(mega),
        n_centroids=8, iters=2, threshold=0.45, cluster_cap=16,
    ).collect()
    megas = [r for r in out if r.vec_id >= 5_000_000 or r.vec_id == 3]
    kept = [r for r in megas if r.kept]
    assert len({r.component for r in megas}) == 1
    assert len(kept) == 1 and kept[0].vec_id == 3


def test_semdedup_auto_k_bounds_pair_space(spark, sf_dir):
    """n_centroids=None applies k = max(16, ceil(n/32)): at board scale
    (500 vectors) auto-k = 16, so the default path returns EXACTLY the
    boarded explicit-k output; at 16x corpus the per-vector within-
    cluster pair count must stay bounded (the flat-cluster-size claim
    the probe measured)."""
    from parquet_metadata_explorer_spark.operators.dedup import (
        _semantic_base,
        semantic_duplicates,
        semdedup_auto_k,
    )

    assert semdedup_auto_k(500) == 16
    assert semdedup_auto_k(8000) == 250
    assert semdedup_auto_k(1) == 16

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    auto = sorted(map(tuple, semantic_duplicates(
        e, iters=2, threshold=0.45).collect()))
    pinned = sorted(map(tuple, semantic_duplicates(
        e, n_centroids=16, iters=2, threshold=0.45).collect()))
    assert auto == pinned  # boarded values unchanged at board scale

    dim = len(e.select("embedding").first()[0])

    def replica(i):
        rot = F.concat(
            F.slice("embedding", i % dim + 1, dim - i % dim),
            F.slice("embedding", 1, i % dim),
        )
        return e.select(
            (F.col("vec_id") + i * 10**9).alias("vec_id"),
            (rot if i else F.col("embedding")).alias("embedding"),
        )

    def pairs_per_vector(df):
        n = df.count()
        base = _semantic_base(df, semdedup_auto_k(n), 1, None)
        sizes = [r.c for r in base.groupBy("cluster")
                 .agg(F.count("*").alias("c")).collect()]
        return sum(c * (c - 1) // 2 for c in sizes) / n

    one = pairs_per_vector(replica(0))
    big = replica(0)
    for i in range(1, 16):
        big = big.unionByName(replica(i))
    sixteen = pairs_per_vector(big)
    # flat per-vector pair space: 16x corpus must NOT approach the 16x
    # growth a fixed k would give; allow skew slack only
    assert sixteen <= 4 * max(one, 1.0), (one, sixteen)


def test_zero_norm_embedding_contract(spark):
    """An all-zero embedding (failed encoder batch) has no direction, so
    cosine against it is undefined. Contract across the semantic/ANN
    family: zero vectors never match anything, never emit NaN —
    semantic_decontaminate gives max_cos NULL + contaminated FALSE
    (and ignores zero-norm benchmark vectors), semantic_duplicates
    keeps the zero vector as its own singleton component, and
    cosine_topk excludes zero vectors as both query and candidate."""
    from parquet_metadata_explorer_spark.operators.dedup import (
        semantic_decontaminate,
        semantic_duplicates,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        cosine_topk,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.1, 0.0, 0.0]),
        (2, [0.9, 0.05, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # the failed-encoder row
    ]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )

    dec = {r.vec_id: r for r in semantic_decontaminate(e, bench, 0.9).collect()}
    assert dec[3].max_cos is None and dec[3].contaminated is False
    for vid in (0, 1, 2):
        assert dec[vid].max_cos is not None
        assert dec[vid].max_cos == dec[vid].max_cos  # not NaN
    assert dec[0].contaminated is True
    # an all-zero benchmark behaves like an empty one
    zb = spark.createDataFrame(
        [(200, [0.0, 0.0, 0.0, 0.0])], ["vec_id", "embedding"]
    )
    dec0 = {r.vec_id: r for r in semantic_decontaminate(e, zb, 0.9).collect()}
    assert all(r.max_cos is None and r.contaminated is False
               for r in dec0.values())

    dup = {r.vec_id: r for r in semantic_duplicates(
        e, n_centroids=1, iters=1, threshold=0.9).collect()}
    assert dup[3].kept is True and dup[3].component == 3
    assert dup[1].component == dup[0].component  # real pairs unaffected

    top = cosine_topk(e, [0, 3], k=5).collect()
    assert all(r.query_id != 3 for r in top)       # zero query: no rows
    assert all(r.neighbor_id != 3 for r in top)    # zero candidate: never
    assert all(r.cos == r.cos for r in top)        # no NaN anywhere


def test_semantic_dedup_increment_replays_batch(spark, sf_dir):
    """CDC twin over frozen centroids: with planted exact-duplicate
    cliques spread across 3 ascending-id batches, accumulated survivors
    must EQUAL the frozen-centroid batch run; at the natural threshold
    the accumulated set must be a superset (the transitive-chain
    first-arrival caveat)."""
    from parquet_metadata_explorer_spark.operators.dedup import (
        initial_semantic_catalog,
        semantic_dedup_increment,
        semantic_duplicates,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivf_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents_nd, _ = ivf_index(e, n_centroids=8, iters=2)
    cents = {i: [float(x) for x in row] for i, row in enumerate(cents_nd)}
    clones = []
    for gi, src in enumerate((2, 7, 11)):
        v = e.filter(F.col("vec_id") == src).select("embedding").first()[0]
        for j in range(3):
            clones.append((9_000_000 + gi * 10 + j * 3 + (src % 3), v))
    dup = spark.createDataFrame(clones, "vec_id long, embedding array<float>")
    allv = e.select("vec_id", "embedding").unionByName(dup)
    ids = sorted(r.vec_id for r in allv.select("vec_id").collect())
    cut1, cut2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]

    def run_incremental(threshold):
        cat = initial_semantic_catalog(spark)
        surv = set()
        for lo, hi in ((None, cut1), (cut1, cut2), (cut2, None)):
            b = allv
            if lo is not None:
                b = b.filter(F.col("vec_id") >= lo)
            if hi is not None:
                b = b.filter(F.col("vec_id") < hi)
            out, cat = semantic_dedup_increment(b, cents, cat,
                                                threshold=threshold)
            cat = cat.localCheckpoint()
            surv |= {r.vec_id for r in out.collect()}
        return surv

    kept_09 = {r.vec_id for r in
               semantic_duplicates(allv, threshold=0.9,
                                   centroids=cents).collect() if r.kept}
    assert run_incremental(0.9) == kept_09
    kept_045 = {r.vec_id for r in
                semantic_duplicates(allv, threshold=0.45,
                                    centroids=cents).collect() if r.kept}
    assert run_incremental(0.45) >= kept_045


def test_semantic_decontaminate_contract(spark, sf_dir):
    """A corpus vector identical to a benchmark vector must flag at
    max_cos 1.0; every flagged vector must actually have a benchmark
    partner at or above threshold (recomputed exactly); the plan is
    map-only (no aggregate, no window, at most the parallelism
    repartition exchange)."""
    import math

    from parquet_metadata_explorer_spark.operators.dedup import (
        semantic_decontaminate,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench = e.filter(F.col("vec_id") % 20 == 0)
    corpus = e.filter(F.col("vec_id") % 20 != 0)
    # plant an exact copy of a benchmark vector into the corpus
    v0 = bench.select("embedding").first()[0]
    planted = spark.createDataFrame(
        [(7_777_777, v0)], "vec_id long, embedding array<float>"
    )
    out = semantic_decontaminate(
        corpus.select("vec_id", "embedding").unionByName(planted),
        bench, threshold=0.45,
    )
    rows = {r.vec_id: r for r in out.collect()}
    assert rows[7_777_777].max_cos == 1.0 and rows[7_777_777].contaminated
    bvecs = [[float(x) for x in r.embedding]
             for r in bench.select("embedding").collect()]
    bn = [math.sqrt(sum(x * x for x in v)) for v in bvecs]
    emb = {r.vec_id: [float(x) for x in r.embedding]
           for r in corpus.select("vec_id", "embedding").collect()}
    for vid, r in rows.items():
        if vid == 7_777_777 or not r.contaminated:
            continue
        v = emb[vid]
        nv = math.sqrt(sum(x * x for x in v))
        best = max(
            sum(a * b for a, b in zip(v, w)) / (nv * bn[i])
            for i, w in enumerate(bvecs)
        )
        assert round(best, 6) >= 0.45 - 1e-9, (vid, best)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan and "Window" not in plan, plan
    assert plan.count("Exchange") <= 1, plan
    # empty benchmark: nothing can be contaminated, max_cos is NULL
    empty = semantic_decontaminate(
        corpus.limit(5), bench.filter(F.lit(False)), threshold=0.45
    ).collect()
    assert len(empty) == 5
    assert all(r.max_cos is None and not r.contaminated for r in empty)


def test_prepare_corpus_incremental_replays_batch(spark, sf_dir):
    """CDC composition: three doc_id-ordered batches through
    prepare_corpus_increment (persisted line-fp / doc-fp / count
    catalogs) must reproduce the batch pipeline on the full corpus
    EXACTLY — surviving (doc_id, text) pairs, the per-source count
    catalog, and the temperature-mixed view derived from it."""
    from parquet_metadata_explorer_spark.operators.pipelines import (
        initial_prepare_state,
        prepare_corpus_increment,
        preparation_stages,
    )
    from parquet_metadata_explorer_spark.operators.sampling import (
        temperature_mix,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter("doc_id % 17 = 3").select("doc_id", "text")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut1, cut2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]

    state = initial_prepare_state(spark)
    outs = []
    for lo, hi in ((None, cut1), (cut1, cut2), (cut2, None)):
        batch = docs
        if lo is not None:
            batch = batch.filter(F.col("doc_id") >= lo)
        if hi is not None:
            batch = batch.filter(F.col("doc_id") < hi)
        final, state = prepare_corpus_increment(batch, bench, state)
        # persist catalogs like a real run would (and cut lineage)
        state = {k: v.localCheckpoint() for k, v in state.items()}
        outs.append({(r.doc_id, r.text) for r in final.collect()})
    incremental = set().union(*outs)
    assert outs[0] and (outs[0] | outs[1] | outs[2]) == incremental

    batch_final = preparation_stages(docs, bench)["after_decontamination"]
    expected = {(r.doc_id, r.text) for r in batch_final.collect()}
    assert incremental == expected

    # the count catalog equals the batch per-source counts
    got_counts = {(r.source, r.n_docs) for r in state["source_counts"].collect()}
    exp_counts = {
        (r.source, r.n_docs)
        for r in batch_final.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .collect()
    }
    assert got_counts == exp_counts

    # mixing as a policy view over the catalog == batch temperature_mix
    prepared = batch_final.join(docs.select("doc_id", "source"), "doc_id")
    via_catalog = {
        r.doc_id
        for r in temperature_mix(
            prepared, counts=state["source_counts"]
        ).collect()
    }
    direct = {r.doc_id for r in temperature_mix(prepared).collect()}
    assert via_catalog == direct and 0 < len(direct) < len(expected)


def test_ivfpq_persisted_probe_matches_memory_and_prunes(spark, tmp_path):
    """The materialized index (codes partitioned by cell) must (a)
    reproduce the in-memory scorer BIT-identically from disk, and (b)
    open ONLY the probed cells' files — partition pruning is the scan-
    level payoff of the cell layout."""
    from pyspark.sql.functions import input_file_name

    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_ann_topk,
        ivfpq_probe_topk,
        write_ivfpq_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivfpq")
    params = dict(k_cells=8, m=8, n_centroids=16, iters=2, coarse_iters=2)
    write_ivfpq_index(e, path, **params)

    qids = [0, 1, 2]
    queries = e.filter(e.vec_id.isin(qids))
    disk = ivfpq_probe_topk(spark, path, queries, k=10, n_probe=3)
    mem = ivfpq_ann_topk(e, qids, k=10, n_probe=3, **params)
    assert sorted(map(tuple, disk.collect())) == sorted(map(tuple, mem.collect()))
    # IVFADC-R refinement from disk must equal the in-memory rerank too
    disk_r = ivfpq_probe_topk(
        spark, path, queries, k=10, n_probe=3, rerank=30, embeddings=e
    )
    mem_r = ivfpq_ann_topk(e, qids, k=10, n_probe=3, rerank=30, **params)
    assert sorted(map(tuple, disk_r.collect())) == sorted(
        map(tuple, mem_r.collect())
    )

    # pruning: the probed scan must touch fewer files than the index has
    all_files = {
        r[0]
        for r in spark.read.parquet(f"{path}/codes")
        .select(input_file_name())
        .distinct()
        .collect()
    }
    # assert pruning on the codes relation with the same pushed-filter
    # shape the probe uses (cell IN ...)
    probed_cells = spark.read.parquet(f"{path}/codes").filter(
        F.col("cell").isin([0, 1])
    )
    touched = {
        r[0]
        for r in probed_cells.select(input_file_name()).distinct().collect()
    }
    assert len(all_files) >= 8  # one+ file per cell
    assert touched and touched < all_files
    plan = probed_cells._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    # corpus-sized |Q| (>1024): the distributed ADC-constants path must
    # equal the driver loop bit-for-bit from the SAME disk index, auto
    # mode must pick it, and the code scan must stay partition-pruned.
    big_q = None
    for i in range(3):  # 1500 queries, none colliding with corpus ids
        shifted = e.select(
            (F.col("vec_id") + F.lit(1000 * (i + 1))).alias("vec_id"),
            "embedding",
        )
        big_q = shifted if big_q is None else big_q.unionByName(shifted)
    drv = ivfpq_probe_topk(
        spark, path, big_q, k=5, n_probe=2, table_mode="driver"
    )
    dist = ivfpq_probe_topk(
        spark, path, big_q, k=5, n_probe=2, table_mode="distributed"
    )
    auto = ivfpq_probe_topk(spark, path, big_q, k=5, n_probe=2)
    drv_rows = sorted(map(tuple, drv.collect()))
    dist_rows = sorted(map(tuple, dist.collect()))
    assert drv_rows == dist_rows
    assert sorted(map(tuple, auto.collect())) == dist_rows
    dist_plan = dist._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in dist_plan and "cell" in dist_plan


def test_ivfpq_index_rewrite_truncates_stale_sidecars(spark, tmp_path):
    """Rebuilding an index over an existing path must truncate the
    sidecar dirs, not write alongside: a stale part file from a prior
    (e.g. Spark-written) sidecar would union into duplicate rows per
    cell and serve arbitrary centroids. The writer must also drop the
    old _SUCCESS before writing so a crash mid-rewrite reads as
    incomplete, not as the old index."""
    import os

    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_ann_topk,
        ivfpq_probe_topk,
        write_ivfpq_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivfpq")
    params = dict(k_cells=4, m=4, n_centroids=8, iters=1, coarse_iters=1)
    write_ivfpq_index(e, path, **params)

    # simulate a prior writer's leftover: a differently-named part file
    # that spark.read.parquet would union with ours
    stale = f"{path}/coarse/part-00001-deadbeef.parquet"
    import shutil

    shutil.copy(f"{path}/coarse/part-00000.parquet", stale)
    assert len(os.listdir(f"{path}/coarse")) == 3

    params2 = dict(k_cells=8, m=8, n_centroids=16, iters=2, coarse_iters=2)
    write_ivfpq_index(e, path, **params2)
    assert sorted(os.listdir(f"{path}/coarse")) == [
        "_SUCCESS",
        "part-00000.parquet",
    ]

    qids = [0, 1, 2]
    queries = e.filter(e.vec_id.isin(qids))
    disk = ivfpq_probe_topk(spark, path, queries, k=5, n_probe=3)
    mem = ivfpq_ann_topk(e, qids, k=5, n_probe=3, **params2)
    assert sorted(map(tuple, disk.collect())) == sorted(map(tuple, mem.collect()))


def test_ivfpq_encode_matches_trainer_codes(spark):
    """The frozen-model encoder must replay the trainer's assignment
    arithmetic BIT-identically: encoding the training corpus against
    the trained models yields exactly the (vec_id, cell, codes) rows
    the trainer itself emitted — the property that makes a CDC
    segment's rows indistinguishable from base-build rows."""
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cc, cells, pq_cb, pq_codes = ivfpq_index(
        e, k_cells=8, m=8, n_centroids=16, iters=2, coarse_iters=2
    )
    trained = (
        pq_codes.groupBy("vec_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("sub", "cluster"))).alias("s")
        )
        .select(
            "vec_id",
            F.transform(F.col("s"), lambda x: x["cluster"]).alias("codes"),
        )
        .join(cells, "vec_id")
    )
    want = sorted(
        (r.vec_id, r.cell, tuple(r.codes)) for r in trained.collect()
    )
    enc = ivfpq_encode(e, cc, pq_cb)
    got = sorted((r.vec_id, r.cell, tuple(r.codes)) for r in enc.collect())
    assert got == want


def test_ivfpq_index_increment_lifecycle(spark, tmp_path):
    """The IVF-PQ index shares the BM25 index's log-structured
    lifecycle: arrivals land as committed segments encoded with the
    FROZEN models (codes on disk ≡ frozen-encoding the union), torn
    segments are invisible, replays of a committed batch_id are
    no-ops, and compaction folds everything back bit-identically."""
    import os

    from parquet_metadata_explorer_spark.operators.segments import (
        segment_commits,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        _read_ivfpq_sidecars,
        ivfpq_encode,
        ivfpq_index_compact,
        ivfpq_index_increment,
        ivfpq_probe_topk,
        write_ivfpq_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    b1 = e.filter(F.col("vec_id") % 2 == 0)
    b2 = e.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfpq")
    params = dict(k_cells=8, m=8, n_centroids=16, iters=2, coarse_iters=2)
    write_ivfpq_index(b1, path, **params)
    queries = e.filter(F.col("vec_id").isin([0, 2, 4]))
    base_only = sorted(
        map(
            tuple,
            ivfpq_probe_topk(spark, path, queries, k=10, n_probe=3).collect(),
        )
    )

    ivfpq_index_increment(b2, path, batch_id="adds-1")
    # committed codes on disk == frozen-model encode of the UNION —
    # the faiss add() contract, bit-for-bit
    cc, pq_cb = _read_ivfpq_sidecars(spark, path)
    want = sorted(
        (r.vec_id, r.cell, tuple(r.codes))
        for r in ivfpq_encode(e, cc, pq_cb).collect()
    )
    got = sorted(
        (r.vec_id, r.cell, tuple(r.codes))
        for r in spark.read.parquet(f"{path}/codes").collect()
    )
    assert got == want
    incremented = sorted(
        map(
            tuple,
            ivfpq_probe_topk(spark, path, queries, k=10, n_probe=3).collect(),
        )
    )
    assert incremented != base_only  # arrivals actually visible

    # replaying the committed id writes nothing (idempotent)
    ivfpq_index_increment(e, path, batch_id="adds-1")
    assert sorted(
        map(
            tuple,
            ivfpq_probe_topk(spark, path, queries, k=10, n_probe=3).collect(),
        )
    ) == incremented

    # a torn segment (codes written, no commit) is invisible and gets
    # vacuumed by compaction, which folds the committed batches
    torn = ivfpq_encode(b2.limit(5), cc, pq_cb).withColumn(
        "batch", F.lit("torn")
    )
    torn.write.mode("append").partitionBy("cell", "batch").parquet(
        f"{path}/codes"
    )
    assert sorted(
        map(
            tuple,
            ivfpq_probe_topk(spark, path, queries, k=10, n_probe=3).collect(),
        )
    ) == incremented
    folded = ivfpq_index_compact(spark, path)
    assert folded == 2
    assert set(segment_commits(path, "IVF-PQ index")) == {"base"}
    assert not any(
        "batch=torn" in r or "batch=adds-1" in r
        for r, _d, _f in os.walk(f"{path}/codes")
    )
    assert sorted(
        map(
            tuple,
            ivfpq_probe_topk(spark, path, queries, k=10, n_probe=3).collect(),
        )
    ) == incremented

    # crash window between the swap renames: deterministic recovery
    os.rename(path, f"{path}.retired")
    assert ivfpq_index_compact(spark, path) == 0
    assert os.path.isdir(path) and not os.path.exists(f"{path}.retired")
    assert sorted(
        map(
            tuple,
            ivfpq_probe_topk(spark, path, queries, k=10, n_probe=3).collect(),
        )
    ) == incremented

    # dimension-mismatched arrivals FAIL LOUDLY before any commit —
    # slice/zip_with would otherwise encode clipped or null-padded
    # garbage and permanently corrupt the index
    import pytest

    wider = b2.select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.concat(F.col("embedding"), F.col("embedding")).alias("embedding"),
    )
    with pytest.raises(Exception, match="dimension mismatch"):
        ivfpq_index_increment(wider, path, batch_id="bad-dims")
    assert set(segment_commits(path, "IVF-PQ index")) == {"base"}

    # recovery-on-open from the read path too: the probe heals a
    # crashed swap (and a stranded old-pid compact build is cleared by
    # the next compaction)
    os.rename(path, f"{path}.retired")
    assert sorted(
        map(
            tuple,
            ivfpq_probe_topk(spark, path, queries, k=10, n_probe=3).collect(),
        )
    ) == incremented
    assert os.path.isdir(path) and not os.path.exists(f"{path}.retired")
    os.makedirs(f"{path}.compact-99999/codes")  # crashed build, dead pid
    assert ivfpq_index_compact(spark, path) == 0
    assert not os.path.exists(f"{path}.compact-99999")


def test_ccnet_buckets_semantics(spark, sf_dir):
    """Per language: tercile sizes within one doc of n/3, and mean
    perplexity strictly ordered head < middle < tail (the CCNet
    keep/downweight/drop signal)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = text.ccnet_buckets(docs).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    totals = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, buckets in by_lang.items():
        n = totals[lang]
        assert sum(b.n_docs for b in buckets.values()) == n
        if n >= 3:
            assert set(buckets) == {"head", "middle", "tail"}, (lang, buckets)
            for b in buckets.values():
                # quantile_cont terciles with ties can wobble by a doc
                assert abs(b.n_docs - n / 3) <= max(2, 0.2 * n), (lang, b)
            assert (
                buckets["head"].avg_ppl
                < buckets["middle"].avg_ppl
                < buckets["tail"].avg_ppl
            ), (lang, buckets)


def test_ccnet_buckets_sketch_cut_bounds(spark, sf_dir):
    """The default (histogram-sketch) tercile cut must honor the
    sketch's guarantee — each cut within one bucket width of the
    rank-ceil(q*n) order statistic — and the resulting per-bucket sizes
    may drift from the exact-percentile opt-in only by the number of
    docs inside the cut-disagreement windows (the bucket-width flip
    population)."""
    from parquet_metadata_explorer_spark.operators.sketches import (
        histogram_group_quantiles,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bigram_logprob_score,
        ccnet_buckets,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    joined = bigram_logprob_score(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    ppl = {}
    for r in joined.select("lang", "ppl").collect():
        ppl.setdefault(r.lang, []).append(r.ppl)
    import math

    cuts = {
        r.lang: (r.p33, r.p66)
        for r in histogram_group_quantiles(
            joined, "lang", "ppl", [(1.0 / 3, "p33"), (2.0 / 3, "p66")]
        ).collect()
    }
    exacts = {
        r.lang: (r.p33, r.p66)
        for r in joined.groupBy("lang").agg(
            F.percentile("ppl", F.lit(1.0 / 3)).alias("p33"),
            F.percentile("ppl", F.lit(2.0 / 3)).alias("p66"),
        ).collect()
    }
    windows = {}
    for lang, vals in ppl.items():
        vals.sort()
        n = len(vals)
        width = (vals[-1] - vals[0]) / 2048
        for q, cut in zip((1.0 / 3, 2.0 / 3), cuts[lang]):
            rank_stat = vals[max(1, math.ceil(q * n)) - 1]
            assert abs(cut - rank_stat) <= width + 1e-9, (
                lang, q, cut, rank_stat, width,
            )
        # docs that can flip label: ppl between the sketch cut and the
        # exact-percentile cut (inclusive), per cut
        flips = 0
        for cut, ex in zip(cuts[lang], exacts[lang]):
            lo, hi = min(cut, ex), max(cut, ex)
            flips += sum(1 for v in vals if lo <= v <= hi)
        windows[lang] = flips
    sk = {
        (r.lang, r.bucket): r.n_docs for r in ccnet_buckets(docs).collect()
    }
    exact = {
        (r.lang, r.bucket): r.n_docs
        for r in ccnet_buckets(docs, exact_cuts=True).collect()
    }
    for lang in ppl:
        for bucket in ("head", "middle", "tail"):
            d = abs(sk.get((lang, bucket), 0) - exact.get((lang, bucket), 0))
            assert d <= windows[lang], (lang, bucket, d, windows[lang])


def test_temperature_mix_by_tokens_rebalances_mass(spark):
    """Token-mass mixing: a source of few HUGE docs must be downweighted
    by its token share (doc-count mixing would barely touch it), and
    kept token mass per source must land near budget*q."""
    from parquet_metadata_explorer_spark.operators.sampling import (
        temperature_mix_by_tokens,
        temperature_rates,
    )

    rows = [(i, "big", "tok " * 400) for i in range(50)]  # 20k tokens
    rows += [(100 + i, "small", "tok tok tok tok") for i in range(200)]  # 800
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    mass = (
        docs.selectExpr("source", "size(split(trim(text), ' +')) tk")
        .groupBy(F.col("source").alias("source"))
        .agg(F.sum("tk").cast("long").alias("n_docs"))
    )
    rates = {
        r.source: r
        for r in temperature_rates(docs, alpha=0.5, counts=mass).collect()
    }
    # token share of 'big' is ~0.96 -> sqrt scaling drops its rate < 1,
    # 'small' caps at 1
    assert rates["small"].rate == 1.0
    assert rates["big"].rate < 1.0
    kept = temperature_mix_by_tokens(docs, alpha=0.5)
    kept_mass = {
        r.source: r.m
        for r in kept.selectExpr("source", "size(split(trim(text), ' +')) tk")
        .groupBy("source")
        .agg(F.sum("tk").alias("m"))
        .collect()
    }
    total = sum(r.n_docs for r in mass.collect())
    for s in ("big", "small"):
        expected = rates[s].q * total if rates[s].rate < 1.0 else (
            mass.filter(F.col("source") == s).first().n_docs
        )
        assert abs(kept_mass[s] - expected) / expected < 0.25, (s, kept_mass, expected)


def test_hll_distinct_accuracy_and_invariance(spark):
    """The deterministic HLL: (a) within ~3 standard errors (1.04/√4096
    ≈ 1.6%) of the true cardinality in the raw-estimator regime, (b)
    completely insensitive to duplication (a sketch over 3 copies is
    identical), (c) near-exact in the linear-counting regime."""
    from parquet_metadata_explorer_spark.operators.sketches import (
        hll_distinct,
    )

    big = spark.range(50_000).select(
        F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    est = hll_distinct(big, "val").first()
    assert est.m == 4096
    assert abs(est.estimate - 50_000) / 50_000 < 0.05, est
    tripled = big.union(big).union(big)
    est3 = hll_distinct(tripled, "val").first()
    assert (est3.m, est3.n_used, est3.estimate) == (
        est.m, est.n_used, est.estimate,
    )
    small = spark.range(200).select(
        F.concat(F.lit("s"), F.col("id")).alias("val")
    )
    est_s = hll_distinct(small, "val").first()
    assert abs(est_s.estimate - 200) / 200 < 0.05, est_s
    # empty and all-null inputs: V=m linear counting must yield the
    # numeric estimate 0, not NULL (r7 advice)
    empty = spark.createDataFrame([], "val string")
    est_e = hll_distinct(empty, "val").first()
    assert (est_e.n_used, float(est_e.estimate)) == (0, 0.0), est_e
    nulls = spark.createDataFrame([(None,), (None,)], "val string")
    est_n = hll_distinct(nulls, "val").first()
    assert (est_n.n_used, float(est_n.estimate)) == (0, 0.0), est_n


def test_cm_frequent_items_exact_and_bounded(spark):
    """The count-min gate: (a) the result is EXACTLY the frequent set
    with exact counts (no false negatives — CM only over-counts), (b)
    est >= freq for every row (the no-under-count invariant the gate's
    completeness rests on), (c) duplication scales freq and est
    together, (d) the gate actually prunes: with a skewed corpus the
    gated exact count sees far fewer distinct items than the
    vocabulary."""
    from parquet_metadata_explorer_spark.operators.sketches import (
        cm_frequent_items,
    )

    # 5 heavy items (>= 300 each) over a 20k-item once-seen tail
    heavy = spark.range(1500).select(
        F.concat(F.lit("hot"), (F.col("id") % 5)).alias("item")
    )
    tail = spark.range(20_000).select(
        F.concat(F.lit("t"), F.col("id")).alias("item")
    )
    corpus = heavy.union(tail)
    out = cm_frequent_items(corpus, "item", threshold=300, depth=3, width=512)
    rows = out.collect()
    assert sorted(r.item for r in rows) == [f"hot{i}" for i in range(5)]
    assert all(r.freq == 300 for r in rows)
    assert all(r.est >= r.freq for r in rows), rows
    doubled = cm_frequent_items(
        corpus.union(corpus), "item", threshold=600, depth=3, width=512
    ).collect()
    assert {(r.item, r.freq) for r in doubled} == {
        (f"hot{i}", 600) for i in range(5)
    }
    # threshold above every frequency: empty, not an error
    assert (
        cm_frequent_items(corpus, "item", threshold=10_000).count() == 0
    )


def test_frequent_ngrams_matches_exact_filter(spark, sf_dir):
    """The sketch-gated frequent set over real documents equals the
    brute-force exact filter (ngram_frequencies without the limit) —
    the gate is a pure optimization, never a semantics change."""
    from parquet_metadata_explorer_spark.operators import text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r.ngram, r.freq)
        for r in text.frequent_ngrams(
            docs, n=2, threshold=40, depth=3, width=1024
        ).collect()
    }
    exact = {
        (r.ngram, r.freq)
        for r in text.ngram_frequencies(docs, n=2, top_k=10_000)
        .filter(F.col("freq") >= 40)
        .collect()
    }
    assert got == exact and len(got) > 0
    # the gate must stay map-side: since r15 the collected sketch rides
    # the plan as a dense array LITERAL (element_at lookups) — no join
    # of any kind
    plan = (
        text.frequent_ngrams(docs, n=2, threshold=40, depth=3, width=1024)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan


def test_chunk_documents_contract(spark, sf_dir):
    """Chunking invariants: coverage (concatenating a doc's chunks with
    the overlaps removed reproduces its token stream), overlap width,
    short-doc single chunk, zero-token docs dropped — and the plan is
    map-only (zero exchanges), the composability claim."""
    from parquet_metadata_explorer_spark.operators import text
    from parquet_metadata_explorer_spark.functions import tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ch = text.chunk_documents(docs, chunk_size=32, overlap=8)
    plan = ch._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    rows = ch.collect()
    toks = {
        r.doc_id: r.t
        for r in docs.select(
            "doc_id", tokens(F.col("text")).alias("t")
        ).collect()
    }
    from collections import defaultdict

    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r.doc_id].append(r)
    stride = 32 - 8
    for doc_id, chunks in per_doc.items():
        chunks.sort(key=lambda r: r.chunk_index)
        full = toks[doc_id]
        assert chunks[0].chunk_index == 0
        rebuilt = list(chunks[0].chunk_text.split(" "))
        for prev, cur in zip(chunks, chunks[1:]):
            assert cur.chunk_index == prev.chunk_index + 1
            cur_toks = cur.chunk_text.split(" ")
            # consecutive chunks overlap by exactly `overlap` tokens
            # (except a short last chunk, which still starts on-stride)
            assert cur_toks[: min(8, len(cur_toks))] == rebuilt[
                cur.chunk_index * stride : cur.chunk_index * stride
                + min(8, len(cur_toks))
            ]
            rebuilt.extend(cur_toks[len(rebuilt) - cur.chunk_index * stride :])
        assert rebuilt == full, doc_id
        assert all(r.n_tokens == len(r.chunk_text.split(" ")) for r in chunks)
        assert all(r.chunk_id == f"{doc_id}:{r.chunk_index}" for r in chunks)
    # every non-empty doc chunked; a doc with <= 32 tokens gets ONE chunk
    assert set(per_doc) == {d for d, t in toks.items() if len(t) > 0}
    for doc_id, t in toks.items():
        if 0 < len(t) <= 32:
            assert len(per_doc[doc_id]) == 1
    # degenerate inputs
    empty = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two")], "doc_id long, text string"
    )
    out = text.chunk_documents(empty, chunk_size=4, overlap=1).collect()
    assert [(r.doc_id, r.chunk_text) for r in out] == [(3, "one two")]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        text.chunk_documents(empty, chunk_size=4, overlap=4)


def test_bm25_accepts_string_doc_ids(spark, tmp_path):
    """The chunk->index composition feeds BM25 string chunk ids as
    doc_id; the scorer's 32-way local prune must hash them, not cast
    them (regression: pmod(doc_id, 32) crashed on 'doc:idx' ids). Disk
    probe must equal the in-memory scorer on the same string ids."""
    from parquet_metadata_explorer_spark.operators import text

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(50)
    chunks = text.chunk_documents(docs, chunk_size=16, overlap=4).select(
        F.col("chunk_id").alias("doc_id"), F.col("chunk_text").alias("text")
    )
    queries = [(1, "fast hash join"), (2, "slow table scan")]
    mem = text.bm25_topk(chunks, queries, k=5).collect()
    assert len(mem) == 10 and all(":" in r.doc_id for r in mem)
    idx = str(tmp_path / "bm25_chunks")
    text.write_bm25_index(chunks, idx)
    disk = text.bm25_probe_topk(spark, idx, queries, k=5).collect()
    key = lambda rows: [(r.query_id, r.doc_id, r.score, r.rank) for r in rows]
    assert sorted(key(mem)) == sorted(key(disk))


def test_prepare_retrieval_corpus_end_to_end(spark, sf_dir, tmp_path):
    """The RAG pipeline: quality gate -> doc dedup -> chunking -> chunk
    dedup -> BM25 index, then a probe against the written index. The
    audit must be monotone through each filtering stage, chunk dedup
    must actually collapse shared passages when they exist, and probe
    results must be chunk ids that survive the dedup."""
    from parquet_metadata_explorer_spark.operators.pipelines import (
        RETRIEVAL_STAGE_ORDER,
        prepare_retrieval_corpus,
    )
    from parquet_metadata_explorer_spark.operators import text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    base = docs.filter(F.col("doc_id") < 100)
    # pick plant sources from docs that PASS the quality battery, so the
    # planted rows' fate is decided by the dedup stages, not the gate
    kept = sorted(
        r.doc_id
        for r in text.quality_filter(base)
        .filter(F.col("keep"))
        .select("doc_id")
        .collect()
    )
    assert len(kept) >= 2
    # exact doc dup of a surviving doc, and a natural (rule-clean)
    # 20-token boilerplate passage shared by two surviving docs
    prefix = (
        "the acme public license for this document is that it may be "
        "shared in full provided the notice here is kept intact "
    )
    dup = base.filter(F.col("doc_id") == kept[0]).select(
        (F.lit(9001)).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    boiler = base.filter(F.col("doc_id").isin(kept[0], kept[1])).select(
        (F.col("doc_id") + 9100).alias("doc_id"),
        F.concat(F.lit(prefix), F.col("text")).alias("text"),
        "lang", "source", "n_chars",
    )
    b_ids = sorted(r.doc_id for r in boiler.select("doc_id").collect())
    corpus = base.unionByName(dup).unionByName(boiler)
    idx = str(tmp_path / "rag_index")
    chunks, audit = prepare_retrieval_corpus(
        corpus, idx, chunk_size=16, overlap=4
    )
    assert [audit[s] for s in RETRIEVAL_STAGE_ORDER[:3]] == sorted(
        [audit[s] for s in RETRIEVAL_STAGE_ORDER[:3]], reverse=True
    )
    assert audit["after_chunk_dedup"] < audit["chunks"]  # boilerplate collapsed
    surviving = {r.doc_id for r in chunks.select("doc_id").collect()}
    # the planted exact dup contributes no chunks (doc-level dedup
    # keeps the min doc_id — the original)
    assert not any(s.startswith("9001:") for s in surviving)
    # the two boilerplate docs share their leading 16-token passage:
    # exactly one copy of that chunk survives chunk dedup
    lead = {f"{b_ids[0]}:0", f"{b_ids[1]}:0"}
    assert len(lead & surviving) == 1, (lead, surviving & lead)
    hits = text.bm25_probe_topk(
        spark, idx, [(1, "acme public license notice")], k=3
    ).collect()
    assert len(hits) == 3
    assert all(h.doc_id in surviving for h in hits)
    assert hits[0].doc_id in lead


def test_cm_sketch_merge_and_streaming_twin(spark, tmp_path):
    """The sketch's mergeability contract: cm_merge of per-batch
    sketches equals the sketch of the union ROW-FOR-ROW (counters are
    sums), and the identical aggregation runs as a streaming groupBy
    with bounded state — the streaming corpus-frequency monitor. The
    streamed sketch (complete mode over 3 file batches) must equal the
    batch sketch of all files."""
    from parquet_metadata_explorer_spark.operators.sketches import (
        cm_merge,
        cm_sketch,
    )

    batches = []
    for b in range(3):
        rows = [(f"hot{i % 4}",) for i in range(300)] + [
            (f"b{b}t{i}",) for i in range(500)
        ]
        batches.append(spark.createDataFrame(rows, "item string"))
    full = batches[0].union(batches[1]).union(batches[2])
    merged = cm_merge(*[cm_sketch(b, width=256) for b in batches])
    whole = cm_sketch(full, width=256)
    key = lambda df: sorted((r.j, r.bucket, r.cnt) for r in df.collect())
    assert key(merged) == key(whole)
    assert whole.count() <= 3 * 256

    # streaming twin: same bucket projection + groupBy sum, fed from
    # files arriving one batch at a time
    src = tmp_path / "cm_stream_src"
    src.mkdir()
    from pyspark.sql import functions as SF
    from parquet_metadata_explorer_spark.functions import hash60

    stream = (
        spark.readStream.schema("item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    keyed = stream.select(
        SF.posexplode(
            SF.array(
                *[
                    (hash60(SF.concat(SF.lit(f"cm{j}:"), SF.col("item"))) % 256)
                    for j in range(3)
                ]
            )
        ).alias("j", "bucket")
    )
    agg = keyed.groupBy("j", "bucket").agg(
        SF.count("*").cast("long").alias("cnt")
    )
    for df in batches:
        df.coalesce(1).write.mode("append").parquet(str(src))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("cm_stream")
        .option("checkpointLocation", str(tmp_path / "cm_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.sql("select j, bucket, cnt from cm_stream")
    assert key(streamed) == key(whole)


def test_decontaminate_matrix_equals_per_benchmark(spark):
    """The single-scan matrix must agree with N separate decontaminate
    calls, benchmark by benchmark (restricted to hit rows — the matrix
    emits the delta, the single call emits every corpus doc)."""
    from parquet_metadata_explorer_spark.operators.text import (
        decontaminate,
        decontaminate_matrix,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{(i * 3 + j) % 11}" for j in range(12)))
         for i in range(80)],
        ["doc_id", "text"],
    )
    ba = docs.filter("doc_id % 7 = 0").select("doc_id", "text")
    bb = docs.filter("doc_id % 13 = 0").select("doc_id", "text")
    matrix = decontaminate_matrix(docs, {"a": ba, "b": bb})
    got = {
        (r.benchmark, r.doc_id): (r.n_sh, r.n_hit, r.contamination, r.contaminated)
        for r in matrix.collect()
    }
    assert got  # non-degenerate fixture
    for name, bdf in (("a", ba), ("b", bb)):
        single = {
            r.doc_id: (r.n_sh, r.n_hit, r.contamination, r.contaminated)
            for r in decontaminate(docs, bdf).collect()
            if r.n_hit > 0
        }
        mat = {d: v for (bn, d), v in got.items() if bn == name}
        assert mat == single, name


def test_prepare_corpus_learned_filter(spark, sf_dir):
    """The GPT-3-flow option: rules LABEL, the distilled classifier's
    Pareto resample GATES. The learned-kept set must equal the direct
    quality_classifier keep set under the same labels/options, the
    audit stays monotone, and the pipeline still packs end to end."""
    from parquet_metadata_explorer_spark.operators.classify import (
        quality_classifier,
    )
    from parquet_metadata_explorer_spark.operators.pipelines import (
        prepare_corpus,
        preparation_stages,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        quality_filter,
        text_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    opts = {"n_buckets": 256, "iters": 3, "pareto_alpha": 2.0}

    stages = preparation_stages(
        train, bench, learned_filter=True, classifier_opts=opts
    )
    got = {r.doc_id for r in stages["after_quality"].select("doc_id").collect()}
    # independent replay of the gate
    labels = (
        train.join(
            quality_filter(train).filter("keep").select("doc_id"),
            "doc_id",
            "left_semi",
        )
        .join(
            text_stats(train)
            .filter(F.col("quality_score") >= 0.4)
            .select("doc_id"),
            "doc_id",
            "left_semi",
        )
        .select("doc_id")
    )
    expect = {
        r.doc_id
        for r in quality_classifier(train, labels, **opts)
        .filter("keep")
        .collect()
    }
    assert got == expect and got

    packs, tokenized, merges, audit = prepare_corpus(
        train, bench, n_merges=4, learned_filter=True, classifier_opts=opts
    )
    assert (
        audit["input"]
        >= audit["after_quality"]
        >= audit["after_line_dedup"]
        >= audit["after_exact"]
        >= audit["after_decontamination"]
        > 0
    ), audit
    assert packs.count() == audit["after_decontamination"]


def test_prepare_increment_frozen_classifier_gate(spark, sf_dir):
    """The learned gate in CDC: a classifier trained ONCE on the seed
    corpus (frozen — the semantic_dedup_increment convention) gates
    arrivals map-side. Because the keep decision is a pure per-doc
    function of (model, doc), the 2-batch replay must equal the
    single-run pipeline on the union under the SAME frozen model."""
    from parquet_metadata_explorer_spark.operators.classify import (
        train_quality_classifier,
    )
    from parquet_metadata_explorer_spark.operators.pipelines import (
        initial_prepare_state,
        prepare_corpus_increment,
    )
    from parquet_metadata_explorer_spark.operators.text import quality_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter("doc_id % 17 = 3").select("doc_id", "text")
    labels = quality_filter(docs).filter("keep").select("doc_id")
    model = train_quality_classifier(docs, labels, n_buckets=128, iters=2)
    alpha = 2.0

    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut = ids[len(ids) // 2]

    state = initial_prepare_state(spark)
    got = set()
    for batch in (
        docs.filter(F.col("doc_id") < cut),
        docs.filter(F.col("doc_id") >= cut),
    ):
        final, state = prepare_corpus_increment(
            batch, bench, state, classifier_model=model, pareto_alpha=alpha
        )
        state = {k: v.localCheckpoint() for k, v in state.items()}
        got |= {(r.doc_id, r.text) for r in final.collect()}

    single_state = initial_prepare_state(spark)
    single, _ = prepare_corpus_increment(
        docs, bench, single_state, classifier_model=model, pareto_alpha=alpha
    )
    expected = {(r.doc_id, r.text) for r in single.collect()}
    assert got and got == expected


def test_hybrid_rrf_probe_all_from_disk(spark, tmp_path):
    """The full production serving path — BM25 probe + IVF-PQ probe +
    RRF — with ZERO corpus scans at query time. The fusion must equal
    _rrf_fuse over the same two retrievers' in-memory outputs
    bit-for-bit (each side carries its own disk ≡ memory contract),
    and a null-text query degrades to dense-only."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.operators.similarity import (
        _rrf_fuse,
        hybrid_rrf_probe,
        ivfpq_ann_topk,
        write_ivfpq_index,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bm25_path = str(tmp_path / "bm25")
    pq_path = str(tmp_path / "ivfpq")
    write_bm25_index(docs, bm25_path)
    write_ivfpq_index(emb, pq_path)

    qids = [0, 1]
    queries = (
        docs.filter(F.col("doc_id").isin(qids))
        .select("doc_id", "text")
        .join(
            emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
            "doc_id",
        )
    )
    got = hybrid_rrf_probe(
        spark, bm25_path, pq_path, queries, k=6, k_each=12
    ).collect()

    # expected: same fusion over the in-memory twins of both retrievers
    qtexts = sorted(
        (int(r.doc_id), r.text or "") for r in queries.collect()
    )
    w = W.partitionBy("query_id").orderBy("rank")
    lex = (
        bm25_topk(docs, qtexts, k=12)
        .filter(F.col("doc_id") != F.col("query_id"))
        .withColumn("lex_rank", F.row_number().over(w).cast("long"))
        .select("query_id", "doc_id", "lex_rank")
    )
    dense = (
        ivfpq_ann_topk(emb, qids, k=13)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dense_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("dense_rank") <= 12)
        .select(
            "query_id", F.col("neighbor_id").alias("doc_id"), "dense_rank"
        )
    )
    exp = _rrf_fuse(lex, dense, 6, 60).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    assert got  # non-degenerate

    # null-text query: dense-only fusion, no crash, no lex ranks
    nulltext = queries.withColumn(
        "text",
        F.when(F.col("doc_id") == 0, F.lit(None)).otherwise(F.col("text")),
    )
    got2 = hybrid_rrf_probe(
        spark, bm25_path, pq_path, nulltext, k=6, k_each=12
    ).collect()
    q0 = [r for r in got2 if r.query_id == 0]
    assert q0 and all(r.lex_rank is None for r in q0)


def test_bm25_more_like_this_matches_per_doc_probe(spark):
    """Corpus-as-queries lexical retrieval must be BIT-identical to
    probing bm25_topk per document with the same selected term set
    (self row dropped, ranks recomputed) — the equivalence that makes
    the distributed MoreLikeThis an exact composition, not a new
    scoring convention. Also: partition-count invariance, self-match
    exclusion, and the df guard keeping stop-terms out of every query."""
    from parquet_metadata_explorer_spark.operators.text import (
        _mlt_query_terms,
        bm25_more_like_this,
        bm25_topk,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")

    mlt = bm25_more_like_this(docs, k=5, m_terms=6, max_df_ratio=0.25)
    rows = mlt.collect()
    assert rows
    assert all(r.doc_id != r.query_id for r in rows)  # self excluded
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)

    # the same selection the operator used (shared helper)
    qsel, *_ = _mlt_query_terms(docs, 6, 0.25)
    sel = {}
    for r in qsel.collect():
        sel.setdefault(r.query_id, set()).add(r.term)
    # equivalence on 3 sample query docs
    for qid in sorted(by_q)[:3]:
        qtext = " ".join(sorted(sel[qid]))
        probe = bm25_topk(docs, [(int(qid), qtext)], k=6).collect()
        expect = [r for r in probe if r.doc_id != qid]
        expect.sort(key=lambda r: (-r.score, r.doc_id))
        expect = expect[:5]
        got = sorted(by_q[qid], key=lambda r: r.rank)
        assert [(r.doc_id, r.score) for r in got] == [
            (r.doc_id, r.score) for r in expect
        ], qid

    # partition-count invariance (the decimal-snap discipline)
    again = bm25_more_like_this(
        docs.repartition(7), k=5, m_terms=6, max_df_ratio=0.25
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_bm25_more_like_this_from_index_matches_memory(spark, tmp_path):
    """The disk-served MoreLikeThis must reproduce the in-memory
    operator BIT-identically — the disk ≡ memory contract extended to
    the corpus-as-queries job — including across a committed CDC
    increment (in-memory on the union == from-index base+increment)."""
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_increment,
        bm25_more_like_this,
        bm25_more_like_this_from_index,
        write_bm25_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    base = docs.filter("doc_id % 3 != 0")
    arrivals = docs.filter("doc_id % 3 = 0")

    path = str(tmp_path / "bm25_mlt")
    write_bm25_index(base, path)
    mem = sorted(map(tuple, bm25_more_like_this(base, k=5).collect()))
    disk = sorted(
        map(tuple, bm25_more_like_this_from_index(spark, path, k=5).collect())
    )
    assert disk == mem and disk

    bm25_index_increment(arrivals, path, batch_id="b1")
    mem_u = sorted(map(tuple, bm25_more_like_this(docs, k=5).collect()))
    disk_u = sorted(
        map(tuple, bm25_more_like_this_from_index(spark, path, k=5).collect())
    )
    assert disk_u == mem_u

    # r12: the incremental related-items refresh — restricting the
    # QUERYING set to the arrivals returns exactly the full run's rows
    # for those query_ids (df/idf/guard stay corpus-wide), priced at
    # |arrivals|·m term probes instead of a corpus rerun
    arrival_ids = {r.doc_id for r in arrivals.select("doc_id").collect()}
    restricted = sorted(
        map(
            tuple,
            bm25_more_like_this_from_index(
                spark, path, k=5, query_ids=arrivals.select("doc_id")
            ).collect(),
        )
    )
    assert restricted == [r for r in disk_u if r[0] in arrival_ids]
    assert restricted  # the refresh actually produced neighbor lists


def test_hybrid_knn_graph_is_exact_fusion_of_components(spark):
    """The corpus-sized hybrid graph must equal the RRF fusion computed
    in plain Python from its two component rank tables (same params) —
    fusion adds arithmetic, never new candidates or reordering."""
    from parquet_metadata_explorer_spark.operators.similarity import (
        hybrid_knn_graph,
        knn_graph,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_more_like_this,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    params = dict(k_each=10, rrf_k=60, m_terms=6, max_df_ratio=0.25)
    got = {
        (r.query_id, r.doc_id): (r.rrf_score, r.lex_rank, r.dense_rank,
                                 r.rank)
        for r in hybrid_knn_graph(
            docs, emb, k=5, n_bands=16, planes_per_band=4, **params
        ).collect()
    }
    assert got

    lex = {
        (r.query_id, r.doc_id): r.rank
        for r in bm25_more_like_this(
            docs, k=10, m_terms=6, max_df_ratio=0.25
        ).collect()
    }
    dense = {
        (r.src, r.dst): r.rank
        for r in knn_graph(emb, k=10, n_bands=16,
                           planes_per_band=4).collect()
    }
    import collections

    scores = collections.defaultdict(float)
    for (q, d), rk in lex.items():
        scores[(q, d)] += 1.0 / (60 + rk)
    for (q, d), rk in dense.items():
        scores[(q, d)] += 1.0 / (60 + rk)
    by_q = collections.defaultdict(list)
    for (q, d), s in scores.items():
        by_q[q].append((-s, d))
    expected = {}
    for q, lst in by_q.items():
        for rank, (neg_s, d) in enumerate(sorted(lst)[:5], start=1):
            expected[(q, d)] = (-neg_s, lex.get((q, d)),
                                dense.get((q, d)), rank)
    assert got == expected


def test_hybrid_knn_graph_from_index_fusion_and_refresh(spark, tmp_path):
    """The index-served corpus-scale hybrid graph (r12): (a) it IS the
    RRF fusion of its two index-served component rank tables (same
    recompute contract as the in-memory twin), and (b) query_ids
    restricts both sides — the arrivals-only refresh returns exactly
    the full run's rows for those query ids."""
    import collections

    from parquet_metadata_explorer_spark.operators.similarity import (
        hybrid_knn_graph_from_index,
        ivfpq_probe_topk,
        write_ivfpq_index,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_more_like_this_from_index,
        write_bm25_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bp, ip = str(tmp_path / "bm25"), str(tmp_path / "ann")
    write_bm25_index(docs, bp)
    write_ivfpq_index(emb, ip, k_cells=8, m=8, n_centroids=16, iters=2,
                      coarse_iters=2)

    kw = dict(k_each=10, rrf_k=60, m_terms=6, max_df_ratio=0.25, n_probe=4)
    full = hybrid_knn_graph_from_index(spark, bp, ip, emb, k=5, **kw)
    got = {
        (r.query_id, r.doc_id): (r.rrf_score, r.lex_rank, r.dense_rank,
                                 r.rank)
        for r in full.collect()
    }
    assert got

    # (a) recompute the fusion from the two index-served rank tables
    lex = {
        (r.query_id, r.doc_id): r.rank
        for r in bm25_more_like_this_from_index(
            spark, bp, k=10, m_terms=6, max_df_ratio=0.25
        ).collect()
    }
    from pyspark.sql import Window as W  # noqa: F401

    draw = ivfpq_probe_topk(spark, ip, emb, k=11, n_probe=4).collect()
    by_q = collections.defaultdict(list)
    for r in draw:
        if r.neighbor_id != r.query_id:
            by_q[r.query_id].append((r.rank, r.neighbor_id))
    dense = {}
    for q, lst in by_q.items():
        for i, (_rk, d) in enumerate(sorted(lst)[:10], start=1):
            dense[(q, d)] = i
    scores = collections.defaultdict(float)
    for (q, d), rk in lex.items():
        scores[(q, d)] += 1.0 / (60 + rk)
    for (q, d), rk in dense.items():
        scores[(q, d)] += 1.0 / (60 + rk)
    per_q = collections.defaultdict(list)
    for (q, d), sc in scores.items():
        per_q[q].append((-sc, d))
    expected = {}
    for q, lst in per_q.items():
        for rank, (neg_s, d) in enumerate(sorted(lst)[:5], start=1):
            expected[(q, d)] = (-neg_s, lex.get((q, d)),
                                dense.get((q, d)), rank)
    assert got == expected

    # (b) the arrivals-only refresh: restricted == full, filtered.
    # query_ids is passed as a ONE-SHOT iterator on purpose (r12
    # ADVICE): both retrievers consume it, and without the up-front
    # materialization the dense side would see it already exhausted
    # and silently drop every arrival's dense ranks — the equality
    # below (which includes dense_rank) is the regression.
    some_ids = sorted({q for q, _d in got})[:7]
    restricted = {
        (r.query_id, r.doc_id): (r.rrf_score, r.lex_rank, r.dense_rank,
                                 r.rank)
        for r in hybrid_knn_graph_from_index(
            spark, bp, ip, emb, k=5, query_ids=iter(some_ids), **kw
        ).collect()
    }
    assert restricted == {
        kd: v for kd, v in got.items() if kd[0] in set(some_ids)
    }

def test_bm25_probe_dataframe_modes_bit_identical(spark, tmp_path, monkeypatch):
    """r13 verdict #5 — the serving probe's last driver ceiling: a
    DataFrame query set routes through query_mode auto/driver/
    distributed. All three shapes are bit-identical to the list path
    (including a NULL text degrading to no lexical terms), and auto
    above BM25_PROBE_DRIVER_MAX never tokenizes driver-side (the
    distributed shape has no collect)."""
    import parquet_metadata_explorer_spark.operators.text as text_mod
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "bm25_dfq")
    write_bm25_index(docs, path)

    qs = [(1, "fast hash join"), (2, "slow stream filter"), (3, "")]
    qdf = spark.createDataFrame(
        [(1, "fast hash join"), (2, "slow stream filter"), (3, None)],
        "query_id long, text string",
    )
    want = sorted(map(tuple, bm25_probe_topk(spark, path, qs, k=10).collect()))
    got_auto = sorted(map(tuple, bm25_probe_topk(
        spark, path, qdf, k=10).collect()))
    got_dist = sorted(map(tuple, bm25_probe_topk(
        spark, path, qdf, k=10, query_mode="distributed").collect()))
    got_drv = sorted(map(tuple, bm25_probe_topk(
        spark, path, qdf, k=10, query_mode="driver").collect()))
    assert want == got_auto == got_dist == got_drv

    # a doc_id-named column works too (the hybrid probe's shape)
    qdf2 = qdf.withColumnRenamed("query_id", "doc_id")
    assert want == sorted(map(tuple, bm25_probe_topk(
        spark, path, qdf2, k=10).collect()))

    # corpus-sized query set: auto must take the distributed shape —
    # the driver tokenizer must never run
    big = docs.select(F.col("doc_id").alias("query_id"), "text")
    assert big.count() > text_mod.BM25_PROBE_DRIVER_MAX

    def _boom(_qs):
        raise AssertionError("driver tokenizer ran on a corpus-sized query set")

    monkeypatch.setattr(text_mod, "_query_terms", _boom)
    dist_big = bm25_probe_topk(spark, path, big, k=5)
    monkeypatch.undo()
    drv_big = bm25_probe_topk(spark, path, big, k=5, query_mode="driver")
    assert sorted(map(tuple, dist_big.collect())) == sorted(
        map(tuple, drv_big.collect())
    )

    with pytest.raises(ValueError, match="Invalid query_mode"):
        bm25_probe_topk(spark, path, qs, k=5, query_mode="nope")
