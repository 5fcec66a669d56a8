"""Index fsck: a healthy index — any lifecycle history — reports only
the ``ok`` row; every planted corruption class is named with bounded
example keys. The checks are exact-integer invariant replays, so there
is no tolerance to tune and no false-positive class."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as papq
from pyspark.sql import functions as F

from parquet_metadata_explorer_spark.functions import tokens

SF = "/root/testdata/sf0.001"


def _defects(report):
    return {
        r.defect: (r.n_rows, list(r.examples)) for r in report.collect()
    }


def _only_ok(report, n_live):
    d = _defects(report)
    assert set(d) == {"ok"}, d
    assert d["ok"][0] == n_live
    return d


def _n_indexed(docs):
    """Docs the BM25 index actually holds: >=1 token (doclen derives
    from postings, so token-less docs never enter the index)."""
    return docs.filter(F.size(tokens(F.col("text"))) > 0).count()


def _write_file(path, table):
    """Out-of-band rewrite of a Spark-written parquet file: drop the
    Hadoop local-FS .crc sidecar, which would otherwise reject the
    rewritten bytes before Spark ever sees them."""
    papq.write_table(table, path)
    crc = os.path.join(
        os.path.dirname(path), f".{os.path.basename(path)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)


def _tamper_parquet(path, column, mutate):
    """Rewrite one parquet file with ``column`` run through ``mutate``
    on its first row — the manual-corruption stand-in. Type and column
    order are preserved so the file stays schema-compatible with its
    siblings."""
    t = papq.read_table(path)
    col = t.column(column).to_pylist()
    col[0] = mutate(col[0])
    idx = t.schema.get_field_index(column)
    arr = pa.array(col, type=t.schema.field(column).type)
    t = t.set_column(idx, t.schema.field(column), arr)
    _write_file(path, t)


def _first_file(d):
    return next(
        os.path.join(r, f)
        for r, _dd, fs in sorted(os.walk(d))
        for f in sorted(fs)
        if f.endswith(".parquet")
    )


def test_bm25_fsck_healthy_and_corrupted(spark, tmp_path):
    from parquet_metadata_explorer_spark.operators.fsck import (
        bm25_index_verify,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_compact,
        bm25_index_delete,
        bm25_index_increment,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "bm25")

    # healthy at every lifecycle stage: build, increment, delete,
    # compact — only the ok row, counting live docs exactly
    write_bm25_index(b1, path)
    _only_ok(bm25_index_verify(spark, path), _n_indexed(b1))
    bm25_index_increment(b2, path, batch_id="adds-1")
    _only_ok(bm25_index_verify(spark, path), _n_indexed(docs))
    doomed = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    bm25_index_delete(spark, path, doomed, batch_id="del-1")
    n_live = _n_indexed(docs.join(doomed, "doc_id", "left_anti"))
    _only_ok(bm25_index_verify(spark, path), n_live)
    bm25_index_compact(spark, path)
    _only_ok(bm25_index_verify(spark, path), n_live)

    # corruption 1: a lost dfreq partition — df folds short
    victim = sorted(
        d for d in os.listdir(f"{path}/dfreq") if d.startswith("bucket=")
    )[0]
    saved = str(tmp_path / "saved-dfreq")
    shutil.copytree(f"{path}/dfreq/{victim}", saved)
    shutil.rmtree(f"{path}/dfreq/{victim}")
    d = _defects(bm25_index_verify(spark, path))
    assert d["df_mismatch"][0] > 0 and d["df_mismatch"][1]
    shutil.rmtree(f"{path}/dfreq/{victim}", ignore_errors=True)
    shutil.copytree(saved, f"{path}/dfreq/{victim}")

    # corruption 2: a tampered posting (tf bumped) breaks the
    # denormalized-doclen contract
    f0 = _first_file(f"{path}/postings")
    orig = papq.read_table(f0)
    _tamper_parquet(f0, "tf", lambda v: v + 1)
    d = _defects(bm25_index_verify(spark, path))
    assert d["doclen_inconsistent"][0] == 1
    # tf drives neither stored df nor the dl-summed commit constants
    assert "commit_constants_mismatch" not in d
    assert "df_mismatch" not in d
    _write_file(f0, orig)

    # corruption 3: an orphan segment dir (crash debris) is reported
    os.makedirs(f"{path}/postings/bucket=0/batch=zzz", exist_ok=True)
    shutil.copy(
        _first_file(f"{path}/postings"),
        f"{path}/postings/bucket=0/batch=zzz/part-0.parquet",
    )
    d = _defects(bm25_index_verify(spark, path))
    assert d["orphan_segment"][0] == 1
    assert "batch=zzz" in d["orphan_segment"][1][0]
    shutil.rmtree(f"{path}/postings/bucket=0/batch=zzz")

    # corruption 4: a double-added batch (arrivals-only contract
    # violated) — internally consistent, so ONLY the duplicate check
    # can catch it
    from parquet_metadata_explorer_spark.operators.text import (
        _bm25_commit,
        _bm25_dfreq,
        _bm25_segment_write,
        _corpus_postings,
        _read_bm25_stats,
    )

    # draw from the SURVIVORS: a deleted-then-compacted doc_id is
    # legitimately free to re-add and must not count as a duplicate
    postings, doclen = _corpus_postings(
        b2.join(doomed, "doc_id", "left_anti").limit(20), track=False
    )
    try:
        stats = doclen.agg(
            F.count("*").alias("n"), F.sum("dl").alias("t")
        ).collect()[0]
        _bm25_segment_write(
            postings.join(doclen, "doc_id"),
            _bm25_dfreq(postings),
            path,
            int(_read_bm25_stats(path)["n_buckets"]),
            "dup-1",
            fresh=False,
        )
        _bm25_commit(path, "dup-1", stats.n, stats.t)
    finally:
        postings.unpersist()
    d = _defects(bm25_index_verify(spark, path))
    # every doc the duplicate segment actually holds is flagged
    assert d["duplicate_doc"][0] == stats.n > 0
    assert "commit_constants_mismatch" not in d  # each batch self-consistent

    # corruption 5: a tampered commit row
    cf = f"{path}/commits/commit-dup-1.parquet"
    _tamper_parquet(cf, "n_docs", lambda v: v + 1)
    d = _defects(bm25_index_verify(spark, path))
    assert d["commit_constants_mismatch"] == (1, ["dup-1"])


def test_ivfpq_fsck_healthy_and_corrupted(spark, tmp_path):
    from parquet_metadata_explorer_spark.operators.fsck import (
        ivfpq_index_verify,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_index_compact,
        ivfpq_index_delete,
        ivfpq_index_increment,
        write_ivfpq_index,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    b1 = e.filter(F.col("vec_id") % 2 == 0)
    b2 = e.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ann")
    write_ivfpq_index(b1, path, k_cells=8, m=8, n_centroids=16, iters=2,
                      coarse_iters=2)
    _only_ok(ivfpq_index_verify(spark, path), b1.count())
    ivfpq_index_increment(b2, path, batch_id="adds-1")
    doomed = e.filter(F.col("vec_id") % 10 == 1).select("vec_id")
    ivfpq_index_delete(spark, path, doomed, batch_id="del-1")
    n_live = e.count() - doomed.count()
    _only_ok(ivfpq_index_verify(spark, path), n_live)
    ivfpq_index_compact(spark, path)
    _only_ok(ivfpq_index_verify(spark, path), n_live)

    # corruption 1: a truncated code vector
    f0 = _first_file(f"{path}/codes")
    orig = papq.read_table(f0)
    _tamper_parquet(f0, "codes", lambda v: v[:-1])
    d = _defects(ivfpq_index_verify(spark, path))
    assert d["codes_malformed"][0] == 1
    _write_file(f0, orig)

    # corruption 2: an out-of-range cluster id
    _tamper_parquet(f0, "codes", lambda v: [9999] + v[1:])
    d = _defects(ivfpq_index_verify(spark, path))
    assert d["codes_malformed"][0] == 1
    _write_file(f0, orig)

    # corruption 3: a committed row landed in a cell the coarse
    # sidecar does not define (also throws the batch count off)
    alien = f"{path}/codes/cell=999/batch=base"
    os.makedirs(alien, exist_ok=True)
    shutil.copy(f0, f"{alien}/part-0.parquet")
    d = _defects(ivfpq_index_verify(spark, path))
    assert d["cell_unknown"][0] > 0
    assert d["commit_count_mismatch"][0] == 1
    shutil.rmtree(f"{path}/codes/cell=999")

    # corruption 4: a duplicated segment file (double-served vectors)
    dup = f0.replace(".parquet", "-dup.parquet")
    shutil.copy(f0, dup)
    d = _defects(ivfpq_index_verify(spark, path))
    assert d["duplicate_vec"][0] == orig.num_rows
    assert d["commit_count_mismatch"][0] == 1
    os.remove(dup)
    _only_ok(ivfpq_index_verify(spark, path), n_live)


def test_tape_fsck_healthy_and_corrupted(spark, tmp_path):
    from parquet_metadata_explorer_spark.operators.fsck import tape_verify
    from parquet_metadata_explorer_spark.operators.sinks import (
        export_training_windows,
        export_training_windows_increment,
    )
    from parquet_metadata_explorer_spark.operators.text import bpe_merges_fast

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 5 + j) % 7}" for j in range(i % 9 + 1)))
         for i in range(60)],
        ["doc_id", "text"],
    )
    merges = bpe_merges_fast(docs, n_merges=20)
    out = str(tmp_path / "tape")
    s = export_training_windows(docs, merges, out, budget_tokens=32)
    _only_ok(tape_verify(spark, out), s["windows"])

    # an incremented tape (superseded tail resolved) is also healthy
    arrivals = spark.createDataFrame(
        [(100 + i, " ".join(f"w{j % 7}" for j in range(5))) for i in range(8)],
        ["doc_id", "text"],
    )
    export_training_windows_increment(arrivals, out, batch_id="inc-1")
    from parquet_metadata_explorer_spark.operators.sinks import (
        _read_tape_state,
    )

    n_resolved = int(_read_tape_state(spark, out)[0]["n_windows"])
    _only_ok(tape_verify(spark, out), n_resolved)

    # corruption 1: a tampered window payload (one id chopped) — size
    # vs n_tokens breaks, and the recomputed total drifts off the
    # manifest
    f0 = _first_file(f"{out}/windows")
    orig = papq.read_table(f0)
    _tamper_parquet(f0, "token_ids", lambda v: v[:-1])
    d = _defects(tape_verify(spark, out))
    assert d["window_size_mismatch"][0] == 1
    _write_file(f0, orig)

    # corruption 2: an out-of-vocab id (undecodable window)
    _tamper_parquet(f0, "token_ids", lambda v: [10**6] + v[1:])
    d = _defects(tape_verify(spark, out))
    assert d["token_out_of_vocab"][0] == 1
    _write_file(f0, orig)

    # corruption 3: a duplicated shard — every window in it
    # double-trains
    dup = f0.replace(".parquet", "-dup.parquet")
    shutil.copy(f0, dup)
    d = _defects(tape_verify(spark, out))
    # the shard's superseded tail window is dropped from BOTH copies
    # by the resolver, so only its resolved ids duplicate
    os.remove(dup)
    orig_ids = set(orig.column("window_id").to_pylist())
    # the increment superseded one base window: both of ITS copies are
    # dropped by the resolver, so it never duplicates
    stale = {int(_read_tape_state(spark, out)[0]["rewritten_window_id"])}
    assert d["window_id_gap_or_dup"][0] == len(orig_ids - stale) > 0

    # corruption 4: a duplicate vocab token (ambiguous decode)
    vf = _first_file(f"{out}/vocab")
    vorig = papq.read_table(vf)
    _tamper_parquet(vf, "token", lambda v: vorig.column("token").to_pylist()[1])
    d = _defects(tape_verify(spark, out))
    assert d["vocab_not_dense"][0] > 0
    _write_file(vf, vorig)
    _only_ok(tape_verify(spark, out), n_resolved)


def test_corpus_fsck_healthy_and_corrupted(spark, tmp_path):
    from parquet_metadata_explorer_spark.operators.fsck import corpus_verify
    from parquet_metadata_explorer_spark.operators.pipelines import (
        forget_documents,
        initial_prepare_state,
        save_prepare_state,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    out = str(tmp_path / "corpus")
    for b in range(3):
        docs.filter(F.col("doc_id") % 3 == b).write.parquet(f"{out}/batch={b}")
    state_dir = str(tmp_path / "state")
    state = initial_prepare_state(spark)
    state["source_counts"] = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    save_prepare_state(state, state_dir, 1)
    _only_ok(corpus_verify(spark, out, state_dir), docs.count())

    # stays healthy through a forget (counts move together)
    doomed = docs.filter(F.col("doc_id") % 10 == 7).select("doc_id")
    forget_documents(spark, out, doomed, state_dir=state_dir)
    _only_ok(corpus_verify(spark, out, state_dir), docs.count() - doomed.count())

    # corruption 1: a partition restored from the wrong backup —
    # duplicates at rest AND catalog drift
    shutil.copytree(f"{out}/batch=1", f"{out}/batch=9")
    d = _defects(corpus_verify(spark, out, state_dir))
    assert d["duplicate_doc"][0] > 0
    assert d["source_count_mismatch"][0] > 0
    shutil.rmtree(f"{out}/batch=9")

    # corruption 2: crash debris from a torn forget run
    os.makedirs(f"{out}/.forget-123", exist_ok=True)
    d = _defects(corpus_verify(spark, out, state_dir))
    assert d["stranded_maintenance_dir"] == (1, [".forget-123"])
    shutil.rmtree(f"{out}/.forget-123")
    _only_ok(corpus_verify(spark, out, state_dir), docs.count() - doomed.count())


def test_assert_index_ok_and_verified_compaction(spark, tmp_path):
    """The strict gate raises with named defects, and compaction with
    verify=True proves the fold before publishing (values identical to
    an unverified compaction)."""
    import pytest

    from parquet_metadata_explorer_spark.operators.fsck import (
        assert_index_ok,
        bm25_index_verify,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_compact,
        bm25_index_delete,
        bm25_index_increment,
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "bm25")
    write_bm25_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    bm25_index_increment(
        docs.filter(F.col("doc_id") % 2 == 1), path, batch_id="adds-1"
    )
    bm25_index_delete(
        spark, path, docs.filter(F.col("doc_id") % 9 == 4).select("doc_id"),
        batch_id="del-1",
    )
    qs = [(1, "fast hash join")]
    before = sorted(map(tuple, bm25_probe_topk(spark, path, qs, k=10).collect()))

    # healthy gate: silent
    assert_index_ok(bm25_index_verify(spark, path), "pre-compact")
    # verified compaction publishes and serves identically
    assert bm25_index_compact(spark, path, verify=True) >= 1
    assert (
        sorted(map(tuple, bm25_probe_topk(spark, path, qs, k=10).collect()))
        == before
    )

    # a corrupted index makes the gate raise with the defect named
    victim = sorted(
        d for d in os.listdir(f"{path}/dfreq") if d.startswith("bucket=")
    )[0]
    shutil.rmtree(f"{path}/dfreq/{victim}")
    with pytest.raises(ValueError, match="df_mismatch"):
        assert_index_ok(bm25_index_verify(spark, path), "post-corruption")


def test_fsck_reports_lost_tombstones_and_double_manifest_drift(
    spark, tmp_path
):
    """Review hardening: (a) a lost tombstones table on an index with
    committed deletes is REPORTED (count mismatch per delete batch),
    never a crash; (b) when both manifest totals drift, BOTH keys are
    named."""
    import pytest

    from parquet_metadata_explorer_spark.operators.fsck import (
        bm25_index_verify,
        tape_verify,
    )
    from parquet_metadata_explorer_spark.operators.sinks import (
        export_training_windows,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_delete,
        bpe_merges_fast,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "bm25")
    write_bm25_index(docs, path)
    bm25_index_delete(
        spark, path, docs.filter(F.col("doc_id") % 4 == 1).select("doc_id"),
        batch_id="del-1",
    )
    shutil.rmtree(f"{path}/tombstones")
    d = _defects(bm25_index_verify(spark, path))
    assert d["tombstone_count_mismatch"] == (1, ["del-1"])

    small = docs.limit(40).select("doc_id", "text")
    merges = bpe_merges_fast(small, n_merges=10)
    out = str(tmp_path / "tape")
    export_training_windows(small, merges, out, budget_tokens=64)
    mf = _first_file(f"{out}/state/v=1/manifest")
    _tamper_parquet(mf, "total_tokens", lambda v: v + 7)
    _tamper_parquet(mf, "vocab_size", lambda v: v + 3)
    d = _defects(tape_verify(spark, out))
    assert d["manifest_mismatch"][0] == 2
    assert sorted(d["manifest_mismatch"][1]) == ["total_tokens", "vocab_size"]


def test_corpus_fsck_ignores_retired_debris_as_data(spark, tmp_path):
    """r12 advice regression: a stranded batch=N.retired dir from a
    crashed swap must be reported ONCE as stranded_maintenance_dir —
    not parsed as partition value 'N.retired' and ingested as live
    rows, which would double-count every doc as duplicate_doc and
    drift every source count."""
    from parquet_metadata_explorer_spark.operators.fsck import corpus_verify
    from parquet_metadata_explorer_spark.operators.pipelines import (
        initial_prepare_state,
        save_prepare_state,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    out = str(tmp_path / "corpus")
    for b in range(2):
        docs.filter(F.col("doc_id") % 2 == b).write.parquet(f"{out}/batch={b}")
    state_dir = str(tmp_path / "state")
    state = initial_prepare_state(spark)
    state["source_counts"] = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    save_prepare_state(state, state_dir, 1)

    # crashed-swap debris: a .retired copy NEXT TO the still-live dir
    shutil.copytree(f"{out}/batch=1", f"{out}/batch=1.retired")
    d = _defects(corpus_verify(spark, out, state_dir))
    assert d["stranded_maintenance_dir"] == (1, ["batch=1.retired"])
    assert "duplicate_doc" not in d
    assert "source_count_mismatch" not in d
    assert d["ok"][0] == docs.count()
    shutil.rmtree(f"{out}/batch=1.retired")

    # fully-erased corpus: no live batch dirs at all — the verify
    # still runs (an empty report: zero rows to tag, no defects; the
    # assert_index_ok gate reads that as healthy) instead of failing
    # schema inference
    for b in range(2):
        shutil.rmtree(f"{out}/batch={b}")
    d = _defects(corpus_verify(spark, out))
    assert d.get("ok", (0, []))[0] == 0 and not [
        k for k in d if k != "ok"
    ]
