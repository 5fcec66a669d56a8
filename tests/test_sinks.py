"""Write-path sinks: dedup-applying corpus writer + metadata report."""

import pyspark.sql.functions as F

from parquet_metadata_explorer_spark.operators.sinks import (
    write_deduplicated,
    write_metadata_report,
)


def test_write_deduplicated_roundtrip(spark, tmp_path):
    rows = [(1, "aaa", "s1"), (2, "aaa", "s2"), (3, "bbb", "s1"), (4, "aaa", "s3")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = str(tmp_path / "deduped")
    write_deduplicated(docs, out)
    back = spark.read.parquet(out)
    assert sorted(r.doc_id for r in back.collect()) == [1, 3]  # keeps min per group


def test_write_deduplicated_partitioned(spark, tmp_path):
    rows = [(1, "aaa", "s1"), (2, "bbb", "s2"), (3, "aaa", "s2")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = str(tmp_path / "deduped_parts")
    write_deduplicated(docs, out, partition_by="source")
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert sorted(r.source for r in back.collect()) == ["s1", "s2"]


def test_write_metadata_report(spark, sf_dir, tmp_path):
    out = str(tmp_path / "report")
    write_metadata_report(spark, sf_dir, out)
    files = spark.read.parquet(f"{out}/file")
    cols = spark.read.parquet(f"{out}/column")
    assert files.count() == 10  # one row per sf table
    assert cols.count() > 10
    # the report is queryable with plain SQL: total compressed bytes per file
    agg = (
        cols.groupBy("filepath")
        .agg(F.sum("total_compressed_size").alias("bytes"))
        .collect()
    )
    assert all(r.bytes > 0 for r in agg)


def test_clean_corpus_pipeline(spark, tmp_path):
    from parquet_metadata_explorer_spark.operators.pipelines import clean_corpus

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away into "
        "the woods to find some food for the long cold winter that is coming"
    )
    rows = [
        (1, base),
        (2, base),  # exact duplicate -> dropped
        (3, base + " soon now"),  # near-dup of 1 -> dropped
        (4, "a completely different document about spark query engines that "
            "is long enough and has the stopwords to pass the quality filter"),
        (5, "xx"),  # too short -> quality-filtered
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = str(tmp_path / "clean")
    stats = clean_corpus(docs, out, min_quality=0.4, near_dup_threshold=0.5)
    assert stats == {
        "input": 5,
        "after_quality": 4,
        "after_exact": 3,
        "after_near_dup": 2,
    }
    back = spark.read.parquet(out)
    assert sorted(r.doc_id for r in back.collect()) == [1, 4]


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """After z-ordering on (x, y), per-file value ranges shrink on BOTH
    columns; a plain x-sort leaves every file spanning y's full range.
    Measured through our own column-level metadata scan."""
    import pyspark.sql.functions as F

    import parquet_metadata_explorer_spark as pqx
    from parquet_metadata_explorer_spark.operators.sinks import write_zordered
    from parquet_metadata_explorer_spark.parquet.decode import decode_stat_value

    df = (
        spark.range(0, 40_000)
        .select(
            (F.col("id") % 200).alias("x"),
            ((F.col("id") * 48271) % 200).alias("y"),
        )
    )
    z_dir = str(tmp_path / "zorder")
    s_dir = str(tmp_path / "xsort")
    write_zordered(df, z_dir, ["x", "y"], num_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(s_dir)

    def mean_file_range(path, column):
        rows = (
            pqx.read_metadata(spark, path, source="parquet", level="column")
            .filter(F.col("path") == column)
            .select("type", "statistics.min_value", "statistics.max_value")
            .collect()
        )
        spans = [
            decode_stat_value(r.max_value, r.type)
            - decode_stat_value(r.min_value, r.type)
            for r in rows
        ]
        return sum(spans) / len(spans)

    # x-sorted layout: x prunes hard, y spans ~everything in every file
    assert mean_file_range(s_dir, "x") < 40
    assert mean_file_range(s_dir, "y") > 150
    # z-ordered: BOTH dimensions shrink well below the full range of ~200
    assert mean_file_range(z_dir, "x") < 120
    assert mean_file_range(z_dir, "y") < 120


def test_sink_bloom_columns_probe_back(spark, tmp_path):
    """bloom_columns on a sink writes real filters our probe can read."""
    import pyspark.sql.functions as F

    from parquet_metadata_explorer_spark.operators.reports import bloom_probe
    from parquet_metadata_explorer_spark.operators.sinks import write_zordered

    df = spark.range(0, 20_000).select(
        (F.col("id") % 100).alias("x"),
        ((F.col("id") * 7) % 100).alias("y"),
        F.concat(F.lit("doc-"), F.col("id")).alias("name"),
    )
    out = str(tmp_path / "zb")
    write_zordered(df, out, ["x", "y"], num_files=4, bloom_columns=["name"])
    hits = {
        r.value: r.might_contain
        for r in bloom_probe(spark, out, "name", ["doc-5", "doc-xyz"]).collect()
        if r.might_contain
    }
    assert "doc-5" in hits and "doc-xyz" not in hits


def test_compact_dataset(spark, tmp_path):
    """Many tiny files compact into the byte-targeted count, content
    preserved exactly."""
    from parquet_metadata_explorer_spark.operators.sinks import compact_dataset

    src = str(tmp_path / "small")
    spark.range(0, 50_000).repartition(40).write.parquet(src)
    import glob

    n_small = len(glob.glob(src + "/*.parquet"))
    assert n_small == 40
    total = sum(__import__("os").path.getsize(p) for p in glob.glob(src + "/*.parquet"))

    out = str(tmp_path / "big")
    n = compact_dataset(spark, src, out, target_file_bytes=total // 4 + 1)
    assert n == 4
    assert len(glob.glob(out + "/*.parquet")) == 4
    a = spark.read.parquet(src).groupBy().sum("id").first()[0]
    b = spark.read.parquet(out).groupBy().sum("id").first()[0]
    assert a == b and spark.read.parquet(out).count() == 50_000


def test_zorder_bits_clamped_to_long(spark, tmp_path):
    """bits * len(cols) > 63 would wrap JVM shift counts mod 64 and
    silently corrupt the z-value; the writer clamps per-column bits so
    the interleave always fits a signed long (ADVICE r3)."""
    import pyspark.sql.functions as F

    from parquet_metadata_explorer_spark.operators.sinks import write_zordered

    cols = [f"c{i}" for i in range(9)]  # default bits=8 -> 72 bits unclamped
    df = spark.range(0, 1000).select(
        *[((F.col("id") * (i + 3)) % 50).alias(c) for i, c in enumerate(cols)]
    )
    out = str(tmp_path / "z9")
    write_zordered(df, out, cols, bits=8, num_files=2)
    assert spark.read.parquet(out).count() == 1000

    import pytest as _pytest

    too_many = [f"d{i}" for i in range(64)]
    wide = spark.range(0, 10).select(
        *[(F.col("id") % 5).alias(c) for c in too_many]
    )
    with _pytest.raises(ValueError, match="64-bit"):
        write_zordered(wide, str(tmp_path / "z64"), too_many)


def test_export_training_windows_round_trip(spark, tmp_path):
    """The trainer-export contract: reading the shards back and laying
    windows end to end reproduces the exact global token tape (doc_id
    order, documents straddling boundaries), every window is exactly
    budget_tokens long except the final remainder, and the vocab
    sidecar is a bijection that decodes ids back to the BPE tokens."""
    from parquet_metadata_explorer_spark.operators.sinks import (
        export_training_windows,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bpe_merges_fast,
        bpe_tokenize_words,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 5 + j) % 7}" for j in range(i % 9 + 1)))
         for i in range(60)],
        ["doc_id", "text"],
    )
    merges = bpe_merges_fast(docs, n_merges=20)
    out = str(tmp_path / "export")
    summary = export_training_windows(
        docs, merges, out, budget_tokens=32, shard_max_windows=3
    )

    win = (
        spark.read.parquet(out + "/windows").orderBy("window_id").collect()
    )
    assert summary["windows"] == len(win)
    # exact window geometry: contiguous ids, all full except the last
    assert [r.window_id for r in win] == list(range(len(win)))
    assert all(r.n_tokens == 32 for r in win[:-1])
    assert 1 <= win[-1].n_tokens <= 32
    # shard size cap honored
    import glob

    shards = glob.glob(out + "/windows/*.parquet")
    assert len(shards) >= len(win) // 3

    # round-trip: the reassembled id tape == the independently encoded
    # per-doc token streams mapped through the vocab sidecar
    tape = [t for r in win for t in r.token_ids]
    vocab = {
        r.token: r.token_id
        for r in spark.read.parquet(out + "/vocab").collect()
    }
    assert len(set(vocab.values())) == len(vocab) == summary["vocab_size"]
    enc = {
        r.doc_id: r.bpe_tokens
        for r in bpe_tokenize_words(docs, merges, with_tokens=True)
        .select("doc_id", "bpe_tokens")
        .collect()
    }
    expect = [vocab[t] for i in sorted(enc) for t in enc[i]]
    assert tape == expect
    assert summary["tokens"] == len(expect)


def test_prepare_then_export_end_to_end(spark, tmp_path, sf_dir):
    """The COMPLETE corpus-to-tensors path: prepare_corpus filters,
    dedups and decontaminates, export_training_windows materializes the
    survivors as trainer-ready id windows — and the exported token
    count equals the prepared corpus's independently-computed BPE token
    mass (nothing dropped or duplicated between the two halves)."""
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.operators.pipelines import (
        prepare_corpus,
        preparation_stages,
    )
    from parquet_metadata_explorer_spark.operators.sinks import (
        export_training_windows,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bpe_merges_fast,
        bpe_tokenize_words,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)

    packs, tokenized, merges, audit = prepare_corpus(train, bench, n_merges=4)
    final = preparation_stages(train, bench)["after_decontamination"]
    merges_fast = bpe_merges_fast(final, n_merges=16, min_count=1)
    out = str(tmp_path / "train_export")
    summary = export_training_windows(
        final, merges_fast, out, budget_tokens=256
    )
    expect_tokens = (
        bpe_tokenize_words(final, merges_fast)
        .agg(F.sum("n_bpe_tokens"))
        .collect()[0][0]
    )
    assert summary["tokens"] == expect_tokens
    assert summary["windows"] == -(-expect_tokens // 256)  # ceil division
    win = spark.read.parquet(out + "/windows")
    assert win.count() == summary["windows"]
    assert audit["after_decontamination"] == final.count()


def test_shuffle_training_windows_contract(spark, tmp_path):
    """The seeded tape shuffle: a PERMUTATION (same window multiset),
    deterministic — the same seed reproduces the identical global order
    under 1 partition and 16 partitions — and a different seed gives a
    genuinely different order. Written shards carry the permutation at
    rest: streaming the part files in filename order yields the
    shuffle-key order a training loader needs."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.operators.sinks import (
        shuffle_training_windows,
    )

    windows = spark.createDataFrame(
        [(i, [i * 3, i * 3 + 1], 2) for i in range(500)],
        "window_id long, token_ids array<int>, n_tokens int",
    )

    def order(df):
        return [
            r.window_id
            for r in df.collect()  # collect preserves partition+sort order
        ]

    o1 = order(shuffle_training_windows(windows.coalesce(1), "epoch0"))
    o16 = order(shuffle_training_windows(windows.repartition(16), "epoch0"))
    assert o1 == o16  # partition-invariant global order
    assert sorted(o1) == list(range(500))  # a permutation
    assert o1 != list(range(500))  # actually mixed
    o_ep1 = order(shuffle_training_windows(windows, "epoch1"))
    assert o_ep1 != o1  # fresh epoch order per seed

    # at rest: filename-ordered part files stream in shuffle order
    out = str(tmp_path / "tape")
    shuffle_training_windows(windows, "epoch0").drop(
        "shuffle_key"
    ).write.parquet(out)
    got = []
    for f in sorted(glob.glob(out + "/part-*.parquet")):
        got.extend(pq.read_table(f).column("window_id").to_pylist())
    assert got == o1


def test_export_windows_shuffle_seed(spark, tmp_path):
    """export_training_windows(shuffle_seed=...) writes the SAME window
    set as the unshuffled export (ids, payloads, counts identical) —
    only the at-rest order moves."""
    from parquet_metadata_explorer_spark.operators.sinks import (
        export_training_windows,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bpe_merges_fast,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 5 + j) % 7}" for j in range(i % 9 + 1)))
         for i in range(60)],
        ["doc_id", "text"],
    )
    merges = bpe_merges_fast(docs, n_merges=20)
    plain = str(tmp_path / "plain")
    mixed = str(tmp_path / "mixed")
    s1 = export_training_windows(docs, merges, plain, budget_tokens=32)
    s2 = export_training_windows(
        docs, merges, mixed, budget_tokens=32, shuffle_seed="epoch0"
    )
    assert (s1["windows"], s1["tokens"], s1["vocab_size"]) == (
        s2["windows"],
        s2["tokens"],
        s2["vocab_size"],
    )
    a = {
        (r.window_id, tuple(r.token_ids))
        for r in spark.read.parquet(plain + "/windows").collect()
    }
    b = {
        (r.window_id, tuple(r.token_ids))
        for r in spark.read.parquet(mixed + "/windows").collect()
    }
    assert a == b


def test_export_training_epochs(spark, tmp_path):
    """Multi-epoch layout from one finished export: every epoch tree
    holds the identical window set in a different deterministic order,
    and re-running a seed reproduces its epoch bit-for-bit."""
    import glob

    import pyarrow.parquet as pq

    from parquet_metadata_explorer_spark.operators.sinks import (
        export_training_epochs,
        export_training_windows,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bpe_merges_fast,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 5 + j) % 7}" for j in range(i % 9 + 1)))
         for i in range(60)],
        ["doc_id", "text"],
    )
    merges = bpe_merges_fast(docs, n_merges=20)
    export = str(tmp_path / "export")
    export_training_windows(docs, merges, export, budget_tokens=32)

    res = export_training_epochs(spark, export, seeds=["e0", "e1"])
    assert res["epochs"] == ["e0", "e1"]

    def tape(seed, root=res["out_path"]):
        ids = []
        for f in sorted(glob.glob(f"{root}/epoch={seed}/part-*.parquet")):
            ids.extend(pq.read_table(f).column("window_id").to_pylist())
        return ids

    t0, t1 = tape("e0"), tape("e1")
    assert sorted(t0) == sorted(t1) == list(range(res["windows"]))
    assert t0 != t1  # different epoch orders

    # determinism: a second run of the same seed reproduces the order
    res2 = export_training_epochs(
        spark, export, seeds=["e0"], out_path=str(tmp_path / "again")
    )
    assert tape("e0", res2["out_path"]) == t0

    # the single-pass (one read, K-way dynamic-partition write) and the
    # per-seed K-loop paths must write bit-identical at-rest tapes —
    # same (hash60(seed:window_id), window_id) total order per epoch
    res3 = export_training_epochs(
        spark,
        export,
        seeds=["e0", "e1"],
        out_path=str(tmp_path / "loop"),
        single_pass=False,
    )
    assert tape("e0", res3["out_path"]) == t0
    assert tape("e1", res3["out_path"]) == t1


def test_export_training_windows_increment_matches_batch(spark, tmp_path):
    """CDC tape export: base + two increments must equal the batch
    export on the union — same window boundaries, same DECODED symbol
    sequence per window (vocab ids are lineage-specific; each side
    decodes through its own sidecar). Also: the strictly-increasing
    doc_id contract raises, replays are idempotent, and a crash-window
    replay (CURRENT reverted) recommits identically."""
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.operators.sinks import (
        export_training_windows,
        export_training_windows_increment,
        read_training_tape,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bpe_merges_fast,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 5 + j) % 7}" for j in range(i % 9 + 1))
          + (" zzznovel" if i >= 40 else ""))
         for i in range(60)],
        ["doc_id", "text"],
    )
    base = docs.filter("doc_id < 40")
    arr1 = docs.filter("doc_id >= 40 and doc_id < 50")
    arr2 = docs.filter("doc_id >= 50")
    merges = bpe_merges_fast(base, n_merges=20)

    pA = str(tmp_path / "inc")
    export_training_windows(base, merges, pA, budget_tokens=32)
    r1 = export_training_windows_increment(arr1, pA, batch_id="b1")
    r2 = export_training_windows_increment(arr2, pA, batch_id="b2")
    assert r1["committed"] and r2["committed"]

    pB = str(tmp_path / "batch")
    res = export_training_windows(docs, merges, pB, budget_tokens=32)

    def decoded(windows, vocab):
        return {
            (r.window_id, r.idx, r.token)
            for r in windows.select(
                "window_id", F.posexplode("token_ids").alias("idx", "tid")
            )
            .join(vocab.withColumnRenamed("token_id", "tid"), "tid")
            .collect()
        }

    wA, vA = read_training_tape(spark, pA)
    wB = spark.read.parquet(f"{pB}/windows")
    vB = spark.read.parquet(f"{pB}/vocab")
    assert wA.count() == res["windows"] == wB.count()
    expected = decoded(wA, vA)  # materialize once: later steps
    # overwrite v=3's files, so this plan must not re-run afterwards
    assert expected == decoded(wB, vB)
    # novel symbols (the frozen merges never saw 'zzznovel', so it
    # splits into sub-symbols unseen in the base corpus) entered via a
    # vocab delta at appended ids, and both lineages end at the same
    # vocabulary cardinality
    assert vA.count() == vB.count()
    base_vocab_size = spark.read.parquet(f"{pA}/vocab").count()
    delta = vA.filter(F.col("token_id") >= base_vocab_size)
    assert delta.count() >= 1
    assert delta.filter("token like '%z%'").count() >= 1

    # contract: overlapping/old doc_ids must raise
    import pytest as _pytest

    with _pytest.raises(ValueError, match="strictly increasing"):
        export_training_windows_increment(arr1, pA, batch_id="b3")

    # idempotent replay: an already-committed batch_id is a no-op
    again = export_training_windows_increment(arr2, pA, batch_id="b2")
    assert again["committed"] is False
    wA2, vA2 = read_training_tape(spark, pA)
    assert decoded(wA2, vA2) == expected

    # crash-window replay: revert CURRENT to v=2 (as if the b2 commit
    # flip never landed) and re-run — the retry overwrites v=3 and the
    # tape is bit-identical
    import os

    with open(os.path.join(pA, "state", "CURRENT"), "w") as f:
        f.write("2")
    r2b = export_training_windows_increment(arr2, pA, batch_id="b2")
    assert r2b["committed"] and r2b["version"] == 3
    # a real replay is a RESTARTED driver (the crash killed the
    # session); this same-session simulation read the first v=3 before
    # the overwrite, so the shared FileStatusCache holds the old part
    # files — reset it the way Spark's own suites do
    spark._jvm.org.apache.spark.sql.execution.datasources.FileStatusCache.resetForTesting()
    wA3, vA3 = read_training_tape(spark, pA)
    assert decoded(wA3, vA3) == expected


def test_stream_export_training_windows_matches_batch(spark, tmp_path):
    """The streaming tape twin: arrivals folded per micro-batch must
    accumulate to the batch export on the union at the decoded-symbol
    level, and a fresh checkpoint against existing stream-committed
    tape state must raise (lineage guard), leaving the tape unchanged."""
    import glob as _glob
    import os
    import shutil

    import pytest as _pytest

    from parquet_metadata_explorer_spark.operators.sinks import (
        export_training_windows,
        read_training_tape,
        stream_export_training_windows,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bpe_merges_fast,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 5 + j) % 7}" for j in range(i % 9 + 1)))
         for i in range(60)],
        ["doc_id", "text"],
    )
    base = docs.filter("doc_id < 40")
    merges = bpe_merges_fast(base, n_merges=20)

    pA = str(tmp_path / "stream_tape")
    export_training_windows(base, merges, pA, budget_tokens=32)
    pB = str(tmp_path / "batch_tape")
    export_training_windows(docs, merges, pB, budget_tokens=32)

    # two arrival files in doc_id order (filename order = arrival order)
    flat = str(tmp_path / "arrivals")
    os.makedirs(flat)
    for n, (lo, hi) in enumerate([(40, 50), (50, 60)]):
        d = str(tmp_path / f"slice{n}")
        docs.filter(f"doc_id >= {lo} and doc_id < {hi}").coalesce(
            1
        ).write.parquet(d)
        shutil.copy(
            _glob.glob(f"{d}/part-*.parquet")[0], f"{flat}/{n:03d}.parquet"
        )

    q = stream_export_training_windows(spark, flat, pA)
    q.processAllAvailable()
    q.stop()

    def decoded(windows, vocab):
        return {
            (r.window_id, r.idx, r.token)
            for r in windows.select(
                "window_id", F.posexplode("token_ids").alias("idx", "tid")
            )
            .join(vocab.withColumnRenamed("token_id", "tid"), "tid")
            .collect()
        }

    wA, vA = read_training_tape(spark, pA)
    expected = decoded(
        spark.read.parquet(f"{pB}/windows"),
        spark.read.parquet(f"{pB}/vocab"),
    )
    got = decoded(wA, vA)
    assert got == expected and got

    # fresh checkpoint against stream-committed state: raise at setup
    with _pytest.raises(ValueError, match="checkpoint lineage"):
        stream_export_training_windows(
            spark, flat, pA, checkpoint_dir=str(tmp_path / "ckpt_fresh")
        )
    wA2, vA2 = read_training_tape(spark, pA)
    assert decoded(wA2, vA2) == expected


def test_epochs_and_exact_boundary_over_incremented_tape(spark, tmp_path):
    """(1) export_training_epochs over an INCREMENTED export must shuffle
    the full committed tape (supersession resolved), not just the base
    windows. (2) An increment landing on an EXACT window boundary
    (committed total % budget == 0) re-emits nothing — rewritten_window_id
    stays -1 and the decoded tape still equals the batch export."""
    import glob

    import pyarrow.parquet as pq

    from parquet_metadata_explorer_spark.operators.sinks import (
        export_training_epochs,
        export_training_windows,
        export_training_windows_increment,
        read_training_tape,
        _read_tape_state,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bpe_merges_fast,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 5 + j) % 7}" for j in range(i % 9 + 1)))
         for i in range(60)],
        ["doc_id", "text"],
    )
    base = docs.filter("doc_id < 40")
    merges = bpe_merges_fast(base, n_merges=20)

    # learn the base token total, then re-export with budget == total
    # so the committed tape ends EXACTLY on a window boundary
    probe = str(tmp_path / "probe")
    res0 = export_training_windows(base, merges, probe, budget_tokens=32)
    total = res0["tokens"]

    pA = str(tmp_path / "exact")
    export_training_windows(base, merges, pA, budget_tokens=total)
    export_training_windows_increment(
        docs.filter("doc_id >= 40"), pA, batch_id="b1"
    )
    m, v = _read_tape_state(spark, pA)
    assert v == 2 and int(m["rewritten_window_id"]) == -1  # no tail rewrite

    pB = str(tmp_path / "exact_batch")
    export_training_windows(docs, merges, pB, budget_tokens=total)

    def decoded(windows, vocab):
        return {
            (r.window_id, r.idx, r.token)
            for r in windows.select(
                "window_id", F.posexplode("token_ids").alias("idx", "tid")
            )
            .join(vocab.withColumnRenamed("token_id", "tid"), "tid")
            .collect()
        }

    wA, vA = read_training_tape(spark, pA)
    assert decoded(wA, vA) == decoded(
        spark.read.parquet(f"{pB}/windows"),
        spark.read.parquet(f"{pB}/vocab"),
    )

    # epochs over the incremented export cover the FULL tape
    res = export_training_epochs(spark, pA, seeds=["e0"])
    ids = []
    for f in sorted(glob.glob(f"{res['out_path']}/epoch=e0/part-*.parquet")):
        ids.extend(pq.read_table(f).column("window_id").to_pylist())
    assert sorted(ids) == sorted(r.window_id for r in wA.collect())
    assert len(ids) == wA.count() == 2  # base window + the appended one
