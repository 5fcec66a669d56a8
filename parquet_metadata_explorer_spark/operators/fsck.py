"""Integrity verification (fsck) for the at-rest indexes.

After years of increments, deletes and compactions a 100 TB serving
index is trusted on faith unless its internal invariants can be
re-proven from the data itself. Every quantity the lifecycle stores is
an exact integer derived from another stored quantity, so each check
below is an EXACT equality — a healthy index (fresh build, any
increment/delete/compact history) produces only the ``ok`` row, and
any discrepancy (partial file loss, manual tampering, a torn write
that slipped a commit, a contract-violating double-add) is named with
bounded examples. The report shape is ``embedding_health``'s:
one row per defect class — (defect, n_rows, examples array<string>,
capped at 5) — so ``WHERE defect <> 'ok'`` is the gate.

Scale shape: everything is partial-aggregated groupBys and joins over
the index's own relations (never the corpus); the example lists
compile to WindowGroupLimit (map-side prune to 5 rows per defect
before the shuffle); the commit log and sidecars are driver-sized by
construction. Run it like compaction — from the maintenance owner, or
against a quiesced snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hash60


def _index_report(tagged: DataFrame) -> DataFrame:
    """(defect, key) rows -> one row per defect class with an exact
    count and <=5 example keys (WindowGroupLimit prunes map-side, the
    embedding_health discipline). The tagged union is persisted
    (session cache registry) because counts and examples both consume
    it — without the persist every check's scan DAG would run twice."""
    from ..cache import track_persist

    tagged = track_persist(tagged)
    counts = tagged.groupBy("defect").agg(
        F.count("*").cast("long").alias("n_rows")
    )
    w = Window.partitionBy("defect").orderBy("key")
    examples = (
        tagged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("defect")
        .agg(F.sort_array(F.collect_list("key")).alias("examples"))
    )
    # one row per defect class on both sides (~15 rows max), but the
    # post-aggregation stats are unknown so Catalyst planned this as a
    # SortMergeJoin — broadcast the bounded side
    return counts.join(F.broadcast(examples), "defect").orderBy("defect")


def _tag(df: DataFrame, key_col, defect: str) -> DataFrame:
    return df.select(
        F.lit(defect).alias("defect"), key_col.cast("string").alias("key")
    )


def _tombstone_batch_counts(spark, path: str, neg) -> DataFrame:
    """Per delete-batch tombstone-id counts, EMPTY (not a crash) when
    the tombstones table is missing or vacuumed bare — that loss is
    precisely a defect the caller's left join then reports as
    tombstone/commit count mismatches for every delete batch."""
    from .lakefs import for_path

    lake, lp = for_path(path)
    troot = f"{path}/tombstones"
    if any(
        e.startswith("batch=") for e in lake.listdir(f"{lp}/tombstones")
    ):
        return (
            spark.read.parquet(troot)
            .filter(F.col("batch").isin(sorted(neg)))
            .groupBy("batch")
            .agg(F.count("*").cast("long").alias("n_ids"))
        )
    return spark.createDataFrame([], "batch string, n_ids long")


def _orphan_segments(spark, path: str, tables, committed) -> DataFrame:
    """Filesystem-level scan for segment dirs with no commit row —
    vacuumable crash debris, reported so the operator can see it
    accumulating (compaction removes it)."""
    from .lakefs import for_path

    lake, lp = for_path(path)
    orphans = []
    for table in tables:
        root = f"{lp}/{table}"
        for outer in lake.listdir(root):
            if not lake.isdir(f"{root}/{outer}") or "=" not in outer:
                continue
            if outer.startswith("batch="):
                if outer[len("batch=") :] not in committed:
                    orphans.append(f"{table}/{outer}")
                continue
            for seg in lake.listdir(f"{root}/{outer}"):
                if (
                    seg.startswith("batch=")
                    and seg[len("batch=") :] not in committed
                ):
                    orphans.append(f"{table}/{outer}/{seg}")
    return spark.createDataFrame(
        [(o,) for o in sorted(set(orphans))], "key string"
    ).select(F.lit("orphan_segment").alias("defect"), "key")


def bm25_index_verify(spark, path: str) -> DataFrame:
    """fsck for the materialized BM25 index. Exact invariants checked:

    - ``commit_constants_mismatch``: each positive (data) commit row's
      (n_docs, total_len) must equal the fold recomputed from that
      batch's own postings; a commit with no postings at all is the
      degenerate case. Keys are batch ids.
    - ``tombstone_count_mismatch``: each negative (delete) commit
      row's -n_docs must equal its tombstone-segment id count.
    - ``df_mismatch``: per term, the committed ``dfreq`` fold
      (sum of per-batch deltas, deletes included) must equal the live
      posting-row count (tombstones anti-joined) — THE scoring
      invariant: a drifted df silently mis-weights idf. Keys are terms.
    - ``doclen_inconsistent``: within a (batch, doc), the denormalized
      ``dl`` must be constant and equal sum(tf) — the Lucene-norm
      denormalization contract. Keys are batch:doc_id.
    - ``bucket_mismatch``: every postings/dfreq row must sit in the
      partition ``pmod(hash60(term), n_buckets)`` the probe will
      compute for it — a mis-bucketed posting is invisible to every
      probe of its term. Keys are terms.
    - ``duplicate_doc``: a doc_id present in more than one committed
      data batch (the arrivals-only contract violated; scores would
      double-count silently). Keys are doc_ids.
    - ``orphan_segment``: data dirs with no commit row (vacuumable).
    - ``ok``: the live document count (data batches minus tombstones).

    Cites the writer/probe pair these invariants come from:
    write_bm25_index / bm25_index_increment / bm25_index_delete /
    bm25_probe_topk in operators/text.py."""
    from .segments import (
        ensure_spark_data_plane,
        recover_retired,
        resolve_index_root,
    )
    from .text import _bm25_commits, _bm25_tombstones, _read_bm25_stats

    ensure_spark_data_plane(spark, path, "bm25_index_verify")
    recover_retired(path)
    path = resolve_index_root(path)  # pointer layout -> live generation
    n_buckets = int(_read_bm25_stats(path)["n_buckets"])
    commits = _bm25_commits(path)
    batches = sorted(commits)
    pos = [b for b in batches if commits[b][0] >= 0]
    neg = [b for b in batches if commits[b][0] < 0]

    post = spark.read.parquet(f"{path}/postings").filter(
        F.col("batch").isin(batches)
    )
    dfreq = spark.read.parquet(f"{path}/dfreq").filter(
        F.col("batch").isin(batches)
    )
    tomb = _bm25_tombstones(spark, path, batches)

    per_doc = (
        post.filter(F.col("batch").isin(pos))
        .groupBy("batch", "doc_id")
        .agg(
            F.min("dl").alias("dl_min"),
            F.max("dl").alias("dl_max"),
            F.sum("tf").cast("long").alias("tl"),
        )
    )
    per_batch = per_doc.groupBy("batch").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl_min").cast("long").alias("total_len"),
    )
    expected = spark.createDataFrame(
        [(b, commits[b][0], commits[b][1]) for b in pos],
        "batch string, e_docs long, e_len long",
    )
    const_bad = (
        expected.join(per_batch, "batch", "left")
        .filter(
            (F.coalesce(F.col("n_docs"), F.lit(0)) != F.col("e_docs"))
            | (F.coalesce(F.col("total_len"), F.lit(0)) != F.col("e_len"))
        )
        .select("batch")
    )

    dl_bad = per_doc.filter(
        (F.col("dl_min") != F.col("dl_max")) | (F.col("dl_min") != F.col("tl"))
    ).select(F.concat_ws(":", "batch", "doc_id").alias("key"))

    dup_doc = (
        per_doc.groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .select("doc_id")
    )

    live = post if tomb is None else post.join(tomb, "doc_id", "left_anti")
    # actual-vs-stored df reconciliation as ONE term-keyed aggregation
    # over the tagged union (r14): the former groupBy-each-side +
    # full-outer join shuffled the postings twice and sort-merged the
    # results; summing side-tagged counts map-side-combines to one
    # shuffle, and a term absent from a side contributes 0 exactly like
    # the join's coalesce(NULL, 0)
    df_bad = (
        live.select(
            "term",
            F.lit(1).cast("long").alias("adf"),
            F.lit(0).cast("long").alias("sdf"),
        )
        .unionByName(
            dfreq.select(
                "term",
                F.lit(0).cast("long").alias("adf"),
                F.col("df").cast("long").alias("sdf"),
            )
        )
        .groupBy("term")
        .agg(F.sum("adf").alias("adf"), F.sum("sdf").alias("sdf"))
        .filter(
            F.coalesce(F.col("adf"), F.lit(0))
            != F.coalesce(F.col("sdf"), F.lit(0))
        )
        .select("term")
    )

    right_bucket = F.pmod(hash60(F.col("term")), F.lit(n_buckets))
    bucket_bad = (
        post.filter(F.col("bucket") != right_bucket)
        .select("term")
        .unionByName(
            dfreq.filter(F.col("bucket") != right_bucket).select("term")
        )
        .distinct()
    )

    tagged = [
        _tag(const_bad, F.col("batch"), "commit_constants_mismatch"),
        _tag(dl_bad, F.col("key"), "doclen_inconsistent"),
        _tag(dup_doc, F.col("doc_id"), "duplicate_doc"),
        _tag(df_bad, F.col("term"), "df_mismatch"),
        _tag(bucket_bad, F.col("term"), "bucket_mismatch"),
        _orphan_segments(
            spark, path, ("postings", "dfreq", "tombstones"), set(commits)
        ),
    ]
    if neg:
        t_counts = _tombstone_batch_counts(spark, path, neg)
        t_expected = spark.createDataFrame(
            [(b, -commits[b][0]) for b in neg], "batch string, e_ids long"
        )
        t_bad = (
            t_expected.join(t_counts, "batch", "left")
            .filter(
                F.coalesce(F.col("n_ids"), F.lit(0)) != F.col("e_ids")
            )
            .select("batch")
        )
        tagged.append(_tag(t_bad, F.col("batch"), "tombstone_count_mismatch"))
    ok = (
        per_doc
        if tomb is None
        else per_doc.join(tomb, "doc_id", "left_anti")
    ).select("doc_id")
    tagged.append(_tag(ok, F.col("doc_id"), "ok"))

    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return _index_report(out)


def ivfpq_index_verify(spark, path: str) -> DataFrame:
    """fsck for the materialized IVF-PQ index. Exact invariants:

    - ``commit_count_mismatch``: each positive commit row's n_vectors
      must equal its batch's code-row count; negative (delete) rows
      must equal their tombstone id counts.
    - ``codes_malformed``: every code row must pack exactly m
      sub-codes (m from the codebook sidecar), each a valid cluster id
      for its subspace — a short or out-of-range code crashes or
      silently mis-scores ADC. Keys are vec_ids.
    - ``cell_unknown``: a code row assigned to a cell the coarse
      sidecar does not define (the probe would either never scan it or
      fail to score it). Keys are vec_ids.
    - ``duplicate_vec``: a vec_id present more than once across
      committed segments (double-add; it would appear twice in every
      probed ranking). Keys are vec_ids.
    - ``orphan_segment``: code dirs with no commit row (vacuumable).
    - ``ok``: the live vector count (tombstones anti-joined).

    The invariants come from write_ivfpq_index / ivfpq_index_increment
    / ivfpq_index_delete / ivfpq_probe_topk in operators/similarity.py."""
    from .segments import (
        ensure_spark_data_plane,
        recover_retired,
        resolve_index_root,
        segment_commits,
    )
    from .similarity import _ivfpq_tombstones, _read_ivfpq_sidecars

    ensure_spark_data_plane(spark, path, "ivfpq_index_verify")
    recover_retired(path)
    path = resolve_index_root(path)  # pointer layout -> live generation
    commits = segment_commits(path, "IVF-PQ index")
    batches = sorted(commits)
    pos = [b for b in batches if commits[b]["n_vectors"] >= 0]
    neg = [b for b in batches if commits[b]["n_vectors"] < 0]
    cc, pq_cb = _read_ivfpq_sidecars(spark, path)
    m = max(s for s, _c in pq_cb) + 1
    n_clusters = {
        s: max(c for s2, c in pq_cb if s2 == s) + 1
        for s in {s for s, _c in pq_cb}
    }

    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("batch").isin(batches)
    )
    tomb = _ivfpq_tombstones(spark, path, batches)

    per_batch = codes.groupBy("batch").agg(
        F.count("*").cast("long").alias("n")
    )
    expected = spark.createDataFrame(
        [(b, commits[b]["n_vectors"]) for b in pos],
        "batch string, e long",
    )
    count_bad = (
        expected.join(per_batch, "batch", "left")
        .filter(F.coalesce(F.col("n"), F.lit(0)) != F.col("e"))
        .select("batch")
    )

    c = F.col("codes")
    # each sub-code validates against ITS OWN subspace's cluster count
    # (zip_with pairs code i with bound i; a short code null-pads, and
    # the size check flags it regardless)
    bounds = F.array(
        *[F.lit(int(n_clusters.get(s, 0))) for s in range(int(m))]
    )
    malformed = codes.filter(
        c.isNull()
        | (F.size(c) != F.lit(int(m)))
        | F.exists(
            F.zip_with(
                c, bounds, lambda x, b: x.isNull() | (x < 0) | (x >= b)
            ),
            lambda v: v,
        )
    ).select("vec_id")

    cell_bad = codes.filter(
        ~F.col("cell").isin(sorted(cc))
    ).select("vec_id")

    dup_vec = (
        codes.groupBy("vec_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .select("vec_id")
    )

    tagged = [
        _tag(count_bad, F.col("batch"), "commit_count_mismatch"),
        _tag(malformed, F.col("vec_id"), "codes_malformed"),
        _tag(cell_bad, F.col("vec_id"), "cell_unknown"),
        _tag(dup_vec, F.col("vec_id"), "duplicate_vec"),
        _orphan_segments(
            spark, path, ("codes", "tombstones"), set(commits)
        ),
    ]
    if neg:
        t_counts = _tombstone_batch_counts(spark, path, neg)
        t_expected = spark.createDataFrame(
            [(b, -commits[b]["n_vectors"]) for b in neg],
            "batch string, e_ids long",
        )
        t_bad = (
            t_expected.join(t_counts, "batch", "left")
            .filter(F.coalesce(F.col("n_ids"), F.lit(0)) != F.col("e_ids"))
            .select("batch")
        )
        tagged.append(_tag(t_bad, F.col("batch"), "commit_count_mismatch"))
    ok = (codes if tomb is None else codes.join(tomb, "vec_id", "left_anti"))
    tagged.append(_tag(ok, F.col("vec_id"), "ok"))

    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return _index_report(out)


def tape_verify(spark, export_path: str) -> DataFrame:
    """fsck for the training-tape export — the terminal artifact a
    trainer consumes, where silent corruption is costliest (a drifted
    window wastes a training run, not a query). Invariants over the
    RESOLVED tape (base + committed increments, superseded tail
    windows dropped — the same view ``read_training_tape`` serves):

    - ``window_id_gap_or_dup``: resolved window_ids must be exactly
      0..n_windows-1 (the manifest's count) — a gap is lost data, a
      duplicate double-trains.
    - ``window_size_mismatch``: n_tokens must equal size(token_ids).
    - ``window_underfilled``: every window except the last must hold
      exactly budget_tokens ids (pack_sequences semantics: documents
      straddle boundaries so no window is under-filled); the last is
      1..budget.
    - ``token_out_of_vocab``: every id must decode — 0 <= id < the
      committed vocab size (base + deltas).
    - ``vocab_not_dense``: vocab ids must be exactly 0..V-1 with no
      duplicate tokens (a duplicate decodes ambiguously).
    - ``manifest_mismatch``: the committed manifest's total_tokens /
      vocab_size must equal the folds recomputed from the data.
    - ``ok``: the resolved window count.

    Invariants come from export_training_windows /
    export_training_windows_increment / read_training_tape in
    operators/sinks.py."""
    from .sinks import _read_tape_state, read_training_tape

    manifest, _v = _read_tape_state(spark, export_path)
    n_windows = int(manifest["n_windows"])
    budget = int(manifest["budget_tokens"])
    windows, vocab = read_training_tape(spark, export_path)
    windows = windows.select("window_id", "token_ids", "n_tokens")

    per_id = windows.groupBy("window_id").agg(F.count("*").alias("n"))
    dup_or_oob = per_id.filter(
        (F.col("n") > 1)
        | (F.col("window_id") < 0)
        | (F.col("window_id") >= n_windows)
    ).select("window_id")
    missing = spark.range(n_windows).join(
        per_id, F.col("id") == F.col("window_id"), "left_anti"
    ).select(F.col("id").alias("window_id"))
    gap_dup = dup_or_oob.unionByName(missing)

    size_bad = windows.filter(
        F.col("n_tokens") != F.size("token_ids")
    ).select("window_id")
    underfilled = windows.filter(
        (
            (F.col("window_id") < n_windows - 1)
            & (F.col("n_tokens") != budget)
        )
        | (F.col("n_tokens") > budget)
        | (F.col("n_tokens") <= 0)
    ).select("window_id")

    v_size = vocab.count()
    oov = windows.filter(
        F.exists(
            "token_ids",
            lambda t: t.isNull() | (t < 0) | (t >= F.lit(int(v_size))),
        )
    ).select("window_id")

    dup_tok = (
        vocab.groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .select(F.col("token").alias("key"))
    )
    sparse_ids = (
        spark.range(v_size)
        .join(vocab, F.col("id") == F.col("token_id"), "left_anti")
        .select(F.col("id").cast("string").alias("key"))
        .unionByName(
            vocab.filter(
                (F.col("token_id") < 0) | (F.col("token_id") >= v_size)
            ).select(F.col("token_id").cast("string").alias("key"))
        )
    )
    not_dense = dup_tok.unionByName(sparse_ids)

    # independent checks, so BOTH drifts are reported when both exist
    totals = (
        windows.agg(F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t"))
        .filter(F.col("t") != int(manifest["total_tokens"]))
        .select(F.lit("total_tokens").alias("key"))
        .unionByName(
            spark.createDataFrame(
                [("vocab_size",)]
                if int(v_size) != int(manifest["vocab_size"])
                else [],
                "key string",
            )
        )
    )

    tagged = [
        _tag(gap_dup, F.col("window_id"), "window_id_gap_or_dup"),
        _tag(size_bad, F.col("window_id"), "window_size_mismatch"),
        _tag(underfilled, F.col("window_id"), "window_underfilled"),
        _tag(oov, F.col("window_id"), "token_out_of_vocab"),
        _tag(not_dense, F.col("key"), "vocab_not_dense"),
        _tag(totals, F.col("key"), "manifest_mismatch"),
        _tag(windows.select("window_id"), F.col("window_id"), "ok"),
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return _index_report(out)


def corpus_verify(
    spark, out_dir: str, state_dir: str = None, key: str = "source"
) -> DataFrame:
    """fsck for the CDC corpus sink (``out_dir/batch=<id>`` partitions
    + the versioned catalogs):

    - ``duplicate_doc``: a doc_id present more than once at rest (the
      pipeline's exact-dedup guarantee violated — e.g. a partition
      restored from the wrong backup).
    - ``source_count_mismatch``: the source-count catalog (the
      temperature-mix policy input) vs the counts recomputed from the
      data, per source — checked when ``state_dir`` is given;
      ``forget_documents`` keeps this exact, so any drift is real.
    - ``stranded_maintenance_dir``: ``*.retired`` / ``.forget-*``
      debris from a crashed forget run (healable on its next open).
    - ``pending_forget``: a FORGET-PENDING marker in ``state_dir`` — a
      forget run died between its partition swaps and its catalog
      commit; the next ``forget_documents`` call reconciles it (any
      ``source_count_mismatch`` reported alongside is that same
      in-flight state, not independent drift).
    - ``ok``: the at-rest document count."""
    from .lakefs import for_path

    if state_dir is not None and key != "source":
        raise ValueError(
            "corpus_verify: the source-count catalog is keyed on "
            f"'source' (see _STATE_SCHEMAS) — key={key!r} cannot be "
            "checked against it. Pass state_dir=None for a "
            "catalog-less verify."
        )
    # read ONLY the live partitions: a stranded batch=N.retired dir
    # from a crashed swap must be reported ONCE as
    # stranded_maintenance_dir, not parsed as partition value
    # "N.retired" and double-counted as duplicate_doc /
    # source_count_mismatch data defects (it can even flip the
    # inferred batch partition type to string). basePath keeps the
    # batch partition column parsed from the live dirs only.
    lake, od = for_path(out_dir)
    entries = lake.listdir(od)
    live = sorted(
        f"{out_dir}/{e}"
        for e in entries
        if e.startswith("batch=") and not e.endswith(".retired")
    )
    if live:
        corpus = (
            spark.read.option("basePath", out_dir)
            .parquet(*live)
            .select("doc_id", F.col(key))
        )
    else:  # every partition erased — an empty dir has no schema
        corpus = spark.createDataFrame([], f"doc_id long, `{key}` string")

    dup = (
        corpus.groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .select("doc_id")
    )
    stranded = spark.createDataFrame(
        [
            (e,)
            for e in entries
            if (e.startswith("batch=") and e.endswith(".retired"))
            or e.startswith(".forget-")
        ],
        "key string",
    ).select(F.lit("stranded_maintenance_dir").alias("defect"), "key")

    tagged = [
        _tag(dup, F.col("doc_id"), "duplicate_doc"),
        stranded,
        _tag(corpus, F.col("doc_id"), "ok"),
    ]
    if state_dir is not None:
        from .lakefs import for_path as _lake_for_path
        from .pipelines import forget_pending_path, load_prepare_state

        mlake, mpath = _lake_for_path(forget_pending_path(state_dir))
        if mlake.exists(mpath):
            tagged.insert(
                0,
                spark.createDataFrame(
                    [("pending_forget", "FORGET-PENDING")],
                    "defect string, key string",
                ),
            )
        state, _v = load_prepare_state(spark, state_dir)
        # same one-shuffle union-aggregate as the BM25 df check (r14):
        # the former per-side groupBy + full-outer join sort-merged two
        # aggregates for a catalog-vs-corpus count reconciliation
        mismatch = (
            corpus.select(
                F.col(key),
                F.lit(1).cast("long").alias("a"),
                F.lit(0).cast("long").alias("n_docs"),
            )
            .unionByName(
                state["source_counts"].select(
                    F.col(key),
                    F.lit(0).cast("long").alias("a"),
                    F.col("n_docs").cast("long").alias("n_docs"),
                )
            )
            .groupBy(key)
            .agg(F.sum("a").alias("a"), F.sum("n_docs").alias("n_docs"))
            .filter(
                F.coalesce(F.col("n_docs"), F.lit(0))
                != F.coalesce(F.col("a"), F.lit(0))
            )
            .select(F.col(key))
        )
        tagged.insert(1, _tag(mismatch, F.col(key), "source_count_mismatch"))
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return _index_report(out)


def assert_index_ok(report: DataFrame, who: str) -> None:
    """Strict gate over any fsck report: silence when only the ``ok``
    row is present, else a ValueError naming every defect class with
    its count and example keys — the ``assert_embedding_health``
    discipline applied to at-rest artifacts."""
    bad = [r for r in report.collect() if r.defect != "ok"]
    if bad:
        raise ValueError(
            f"{who}: integrity check failed — "
            + "; ".join(
                f"{r.defect} ({r.n_rows} rows, e.g. {list(r.examples)})"
                for r in bad
            )
        )
