"""End-to-end corpus-preparation pipeline: the composition a training-data
run actually executes, built entirely from the operators in this package.

quality filter → exact dedup → near-dup (MinHash → connected
components) removal → write.

Every stage is the already-verified operator; this module only wires
them. Shuffle budget for the whole pipeline: one md5-fingerprint
shuffle (exact), one (band, signature) shuffle + candidate verify
(minhash), O(log n) small-shuffle rounds to contract pair-clusters
(components), one doc_id anti-join apiece — nothing quadratic, nothing
driver-side, so the composition inherits each stage's 100 TB story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import normalize_text
from .dedup import minhash_lsh_pairs
from .graph import connected_components
from .text import text_stats


def clean_corpus(
    documents: DataFrame,
    out_path: str | None = None,
    min_quality: float = 0.4,
    near_dup_threshold: float = 0.8,
    mode: str = "error",
) -> dict:
    """Run the standard cleaning pass and (optionally) write the result.

    Near-dup removal is transitive: MinHash pairs feed connected
    components (large-star/small-star, O(log n) rounds), and exactly
    the minimum doc_id of each duplicate cluster survives — the same
    keep-smallest convention as exact dedup, now applied to whole
    clusters rather than greedily per pair (greedy pair-dropping
    over-keeps: with pairs (A,C),(B,C) it keeps both A and B even
    though all three are one cluster).

    Returns per-stage counts — ``input``, ``after_quality``,
    ``after_exact``, ``after_near_dup`` — each a separate action;
    callers that don't need the audit trail can compose the stages lazily
    themselves.
    """
    kept_q, kept_e, kept_n = corpus_stage_frames(
        documents, min_quality, near_dup_threshold
    )
    n_input = documents.count()
    n_quality = kept_q.count()
    n_exact = kept_e.count()
    n_near = kept_n.count()

    if out_path is not None:
        kept_n.write.mode(mode).parquet(out_path)

    return {
        "input": n_input,
        "after_quality": n_quality,
        "after_exact": n_exact,
        "after_near_dup": n_near,
    }


def corpus_stage_frames(
    documents: DataFrame,
    min_quality: float = 0.4,
    near_dup_threshold: float = 0.8,
) -> tuple:
    """The pipeline's three intermediate corpora as lazy DataFrames:
    (kept_quality, kept_exact, kept_near_dup). Shared by the eager
    ``clean_corpus`` runner and the ``clean_corpus_stats`` audit query.

    Scale shape (r14): the score gate filters the scan in place —
    ``text_stats``' quality_score is a per-row expression, so gating
    via a doc_id semi-join of the corpus against its own stats paid two
    corpus scans and a shuffle for a map-side decision. Exact dedup is
    ONE fingerprint-keyed min-struct aggregation (min on a struct whose
    first field is the unique doc_id ≡ the old min(doc_id) + semi-join,
    row for row) — partial aggregation combines map-side, so a 10^7-copy
    cluster contributes one candidate row per task, and the old plan's
    three exchanges + double evaluation of the gated corpus collapse to
    a single exchange."""
    from ..cache import track_persist
    from ..functions import tokens
    from .text import _stats_cols

    doc_cols = documents.columns
    base = documents.select(*doc_cols, tokens(F.col("text")).alias("t"))
    score = _stats_cols(F.col("text"), F.col("t"))["quality_score"]
    kept_q = base.filter(score >= min_quality).select(*doc_cols)

    # derive keeps from the fingerprint itself, not exact_duplicates'
    # capped doc_ids audit column: a 10^7-copy cluster must drop all but
    # one member, not just the first doc_ids_cap of them
    # doc_id leads the struct so the (unique-key) lexicographic min IS
    # the min-doc_id row, whatever the input column order
    arg_min = F.struct(
        "doc_id", *[c for c in doc_cols if c != "doc_id"]
    )
    kept_e = (
        kept_q.groupBy(F.md5(normalize_text(F.col("text"))).alias("fp"))
        .agg(F.min(arg_min).alias("m"))
        .select(*[F.col(f"m.{c}").alias(c) for c in doc_cols])
    )
    # kept_e feeds its own count, the minhash candidate pass AND the
    # anti-join left side — persist the diamond so the gate + dedup
    # chain evaluates once
    kept_e = track_persist(kept_e)

    pairs = minhash_lsh_pairs(kept_e, threshold=near_dup_threshold)
    clusters = connected_components(pairs, src="doc_a", dst="doc_b")
    near_drops = clusters.filter(
        F.col("node") != F.col("component")
    ).select(F.col("node").alias("doc_id"))
    kept_n = kept_e.join(near_drops, "doc_id", "left_anti")
    return kept_q, kept_e, kept_n


def clean_corpus_stats(
    documents: DataFrame,
    min_quality: float = 0.4,
    near_dup_threshold: float = 0.8,
) -> DataFrame:
    """One-row audit of the whole cleaning pipeline: input size and
    survivor count after each stage — the end-to-end composition
    (quality → exact dedup → MinHash + connected components) verified
    cross-engine as a single query."""
    kept_q, kept_e, kept_n = corpus_stage_frames(
        documents, min_quality, near_dup_threshold
    )

    def n(df, name):
        return df.agg(F.count(F.lit(1)).alias(name))

    return (
        n(documents, "n_input")
        .crossJoin(n(kept_q, "n_after_quality"))
        .crossJoin(n(kept_e, "n_after_exact"))
        .crossJoin(n(kept_n, "n_after_near_dup"))
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    content_col: str = "text",
    include_unchanged: bool = False,
) -> DataFrame:
    """Snapshot diff between two corpus versions — the dataset-versioning
    audit (what changed between release N and N+1): per key, status ∈
    added (key only in ``new``) / removed (only in ``old``) / changed
    (both, content fingerprints differ) / unchanged. Fingerprints are
    md5 of the RAW content (byte-identity, not the normalized dedup
    fingerprint — a version diff must see whitespace and casing edits).

    Output: (key, status, old_fp, new_fp), unchanged rows dropped unless
    ``include_unchanged`` (at 100 TB the interesting set is the delta;
    emitting the full corpus back defeats the point).

    Scale shape: one md5 map pass per side, then ONE hash aggregation of
    the side-tagged union on ``key`` — because keys are unique per side,
    a full-outer join is exactly the per-key max-merge of null-padded
    fingerprint columns, and the aggregation form drops the join's two
    corpus-sized Sorts (each side still shuffles once on ``key``, or not
    at all when both versions are stored bucketed by it — a groupBy on
    the bucket key is as shuffle-free at rest as the join was). No
    window, no skew surface."""
    fp = lambda df, o_fp, n_fp: df.select(  # noqa: E731
        F.col(key),
        F.md5(F.coalesce(F.col(content_col), F.lit(""))).alias("fp"),
    ).select(
        key,
        (F.col("fp") if o_fp else F.lit(None).cast("string")).alias("old_fp"),
        (F.col("fp") if n_fp else F.lit(None).cast("string")).alias("new_fp"),
    )
    joined = (
        fp(old, True, False)
        .unionByName(fp(new, False, True))
        .groupBy(key)
        .agg(
            F.max("old_fp").alias("old_fp"),
            F.max("new_fp").alias("new_fp"),
        )
        .select(
            key,
            F.when(F.col("old_fp").isNull(), F.lit("added"))
            .when(F.col("new_fp").isNull(), F.lit("removed"))
            .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
            "old_fp",
            "new_fp",
        )
    )
    if include_unchanged:
        return joined
    return joined.filter(F.col("status") != "unchanged")


def corpus_manifest(documents: DataFrame) -> DataFrame:
    """One-row reproducibility manifest: (n_docs, n_tokens,
    content_digest) where the digest is the EXACT decimal sum of the
    60-bit raw-content hashes — order-invariant and partition-invariant
    by construction, so two corpora match iff their multisets of
    document bytes match (collision odds govern, not ordering). The
    cheap identity check a release pipeline stamps next to a dataset:
    corpus_diff answers WHAT changed, the manifest answers WHETHER.

    The digest is EMITTED AS DECIMAL TEXT (a string), not as a
    decimal(38,0): the exact sum carries ~21 significant digits —
    beyond float64's 15-17 — and pandas-based clients coerce wide
    decimals to float64 (DuckDB ``fetchdf`` does; Spark ``collect``
    keeps an exact Decimal), so two engines returning the IDENTICAL
    exact value would hash differently client-side. A fixed-format
    string survives every client verbatim (the r10 board red).

    Scale shape: one map pass, one all-partials fold to a single row —
    no shuffle beyond the final 1-row combine.

    Null text counts as an EMPTY document on both sides of the stamp:
    the digest already hashes coalesce(text, '') and the token count
    coalesces the same way (0 tokens), so a null-text doc contributes
    (1, 0, hash60('')) — engines agree instead of diverging on
    size(NULL) semantics."""
    from ..functions import hash60, tokens

    txt = F.coalesce(F.col("text"), F.lit(""))
    return documents.select(
        hash60(txt).alias("h"),
        F.size(tokens(txt)).cast("long").alias("tk"),
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("tk").cast("long").alias("n_tokens"),
        F.sum(F.col("h").cast("decimal(38,0)"))
        .cast("string")
        .alias("content_digest"),
    )


def corpus_manifest_increment(
    prev: DataFrame | None, arrivals: DataFrame
) -> DataFrame:
    """Fold a batch of ARRIVALS into a previous manifest — exact, not
    approximate, because every manifest field is an order-invariant
    sum (count, token longs, the decimal digest of 60-bit content
    hashes — carried as decimal TEXT in the schema, cast back to
    decimal(38,0) for the fold, re-emitted as text). manifest(A ∪ B) ≡ fold(manifest(A), manifest(B)) by
    construction, so a release pipeline stamps 100 TB incrementally:
    each increment touches ONLY the new bytes, never re-reads history.

    ``prev`` is a 1-row manifest DataFrame (or None for the first
    batch); returns the folded 1-row manifest with the same schema."""
    inc = corpus_manifest(arrivals)
    if prev is None:
        return inc
    return (
        prev.unionByName(inc)
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum(F.col("content_digest").cast("decimal(38,0)"))
            .cast("string")
            .alias("content_digest"),
        )
    )


def _checkpoint_lineage(ckpt: str) -> str:
    """Mint (or re-read) the checkpoint's LINEAGE token through the
    Lake shim, so a checkpoint_dir on an object-store URI resolves to
    the SAME token on every machine (r13 ADVICE: the previous local
    os.path version silently built a bogus local path for s3://...
    checkpoints and minted a different token per host, turning the
    lineage guard into spurious refusals)."""
    import uuid

    from .lakefs import Lake

    lake, cp = Lake.for_path(ckpt)
    token_path = f"{cp}/LINEAGE"
    if lake.exists(token_path):
        return lake.read_text(token_path).strip()
    lake.mkdirs(cp)
    token = uuid.uuid4().hex
    lake.write_text(token_path, token)
    return token


def stream_corpus_manifest(
    spark,
    docs_path: str,
    state_dir: str,
    max_files_per_trigger: int = 1,
    checkpoint_dir: str = None,
):
    """Maintain the reproducibility manifest CONTINUOUSLY as document
    files land — the streaming twin of ``corpus_manifest``, same
    crash-safe versioned-state protocol as ``stream_prepare_corpus``:
    each micro-batch folds its arrivals through
    ``corpus_manifest_increment`` and commits manifest version v+1
    (batch_id + lineage recorded BEFORE the CURRENT flip, so a replay
    before the flip recomputes the identical fold — the increment is a
    pure function of (prev manifest, batch rows) — and a replay after
    the flip sees its batch_id committed and skips). The accumulated
    manifest equals the batch ``corpus_manifest`` on the union of all
    arrived files EXACTLY, in any arrival order — the fold is
    order-invariant, so this twin has NO first-arrival caveat.

    Returns the StreamingQuery; read the current stamp with
    ``read_corpus_manifest(spark, state_dir)``."""
    import os

    ckpt = checkpoint_dir or f"{state_dir}/_checkpoint"
    token = _checkpoint_lineage(ckpt)

    schema = spark.read.parquet(docs_path).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(docs_path)
    )

    def handle(batch_df, batch_id):
        prev, v = read_corpus_manifest(spark, state_dir, with_version=True)
        done = committed_batch_id(state_dir, v)
        if done is not None:
            lin = committed_lineage(state_dir, v)
            if lin is not None and lin != token:
                raise ValueError(
                    "stream_corpus_manifest: state_dir has batches "
                    f"committed by a different checkpoint lineage ({lin!r}"
                    f" != {token!r}); reset state_dir and checkpoint "
                    "together."
                )
            if batch_id <= done:
                return
        folded = corpus_manifest_increment(prev, batch_df)
        vdir = os.path.join(state_dir, f"v={v + 1}")
        folded.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(vdir, "manifest")
        )
        from .lakefs import for_path

        lake, sd = for_path(state_dir)
        lake.write_text(f"{sd}/v={v + 1}/BATCH", str(batch_id))
        lake.write_text(f"{sd}/v={v + 1}/LINEAGE", token)
        # atomic publish through the shim (temp+move on POSIX, atomic
        # PUT on object stores)
        lake.write_text(f"{sd}/CURRENT", str(v + 1))

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .start()
    )


def read_corpus_manifest(spark, state_dir: str, with_version: bool = False):
    """Current committed manifest stamp (None before the first batch);
    with ``with_version`` returns (manifest, version) for the streaming
    replay check."""
    import os

    from .lakefs import for_path

    lake, sd = for_path(state_dir)
    if not lake.exists(f"{sd}/CURRENT"):
        return (None, 0) if with_version else None
    v = int(lake.read_text(f"{sd}/CURRENT").strip())
    df = spark.read.parquet(os.path.join(state_dir, f"v={v}", "manifest"))
    return (df, v) if with_version else df


def dataset_card(documents: DataFrame) -> DataFrame:
    """Per-source dataset card: the summary table a training-data release
    publishes — document/token volume, corpus share, mean quality score,
    and dominant language per source.

    Scale shape: one feature pass (text_stats is map-only codegen), one
    partial-aggregating shuffle per grouping (source; source×lang for the
    dominant language, arg-maxed via struct-max — no window over data
    rows), and the corpus total is a one-row broadcast. Output is
    sources-sized. Determinism: token totals are exact longs, the quality
    mean goes through a decimal sum, and the dominant-language tie breaks
    to the lexicographically LAST language via the struct ordering
    (replicated in the oracle's row_number ordering).
    """
    # source/lang ride the map-only stats projection (text_stats _carry)
    # instead of re-joining the corpus to its own stats on doc_id — that
    # join planned as a corpus-vs-corpus SortMergeJoin for columns the
    # scan already had
    base = text_stats(documents, _carry=("source", "lang")).select(
        "doc_id", "source", "lang", "n_tokens", "quality_score"
    )
    # ONE corpus aggregation at (source, lang) grain carries every
    # partial the card needs (r14): the per-source stats and the corpus
    # total fold from the sources×langs table instead of re-scanning the
    # corpus per branch (the old per_source / top_lang / total triple
    # evaluated the scan three times — the crossJoin-re-evaluation
    # pattern). Sums of longs and exact decimals re-associate exactly,
    # so every output value is bit-identical.
    lang_counts = base.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("n_tokens").cast("long").alias("tok"),
        F.sum(F.col("quality_score").cast("decimal(30,10)")).alias("qsum"),
    )
    per_source = lang_counts.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.sum("tok").cast("long").alias("n_tokens"),
        F.round(F.sum("qsum") / F.sum("cnt"), 4)
        .cast("double")
        .alias("mean_quality"),
        F.max(F.struct("cnt", "lang")).getField("lang").alias("top_lang"),
    )
    return (
        per_source.withColumn(
            "total_docs", F.sum("n_docs").over(Window.partitionBy())
        )
        .select(
            "source",
            "n_docs",
            F.round(
                (F.col("n_docs") * 100.0 / F.col("total_docs")).cast("decimal(30,10)"),
                4,
            )
            .cast("double")
            .alias("pct_docs"),
            "n_tokens",
            "mean_quality",
            "top_lang",
        )
        .orderBy("source")
    )


def prepare_corpus(
    documents: DataFrame,
    benchmark: DataFrame,
    min_quality: float = 0.4,
    contamination_threshold: float = 0.5,
    n_merges: int = 8,
    budget_tokens: int = 2048,
    learned_filter: bool = False,
    classifier_opts: dict | None = None,
) -> tuple:
    """The COMPLETE training-data preparation flow, wired end-to-end
    from already-verified operators:

        quality filter → corpus line dedup → exact dedup →
        benchmark decontamination → BPE train + tokenize →
        context-window packing

    Returns ``(packs, tokenized, merges, audit)`` — the packed-sequence
    assignments, the per-doc token digests, the trained merge table,
    and a per-stage row-count audit. Shuffle budget: one per stage,
    each individually documented scale-safe; nothing quadratic and the
    only driver-side rows are the audit counts, the merge arg-maxes
    and the prefix-sum partials, so the composition inherits every
    stage's 100 TB story.
    """
    from .sampling import pack_sequences
    from .text import bpe_merges, bpe_tokenize

    stages = preparation_stages(
        documents,
        benchmark,
        min_quality=min_quality,
        contamination_threshold=contamination_threshold,
        learned_filter=learned_filter,
        classifier_opts=classifier_opts,
    )
    audit = {name: df.count() for name, df in stages.items()}
    final = stages["after_decontamination"]

    merges = bpe_merges(final, n_merges=n_merges)
    tokenized = bpe_tokenize(final, merges)
    packs = pack_sequences(final, budget_tokens=budget_tokens)
    return packs, tokenized, merges, audit


PREPARATION_STAGE_ORDER = (
    "input",
    "after_quality",
    "after_line_dedup",
    "after_exact",
    "after_decontamination",
)


def preparation_stages(
    documents: DataFrame,
    benchmark: DataFrame,
    min_quality: float = 0.4,
    contamination_threshold: float = 0.5,
    learned_filter: bool = False,
    classifier_opts: dict | None = None,
) -> dict:
    """The prepare_corpus document-survival chain as lazy stage frames —
    shared by the pipeline runner and the boarded audit query.

    The quality gate applies BOTH the rule battery (quality_filter) and
    the declared ``min_quality`` threshold on text_stats' quality_score
    (r5 ADVICE: the parameter was declared but unused).

    ``learned_filter=True`` swaps the gate for the GPT-3 flow: the rule
    battery only LABELS the corpus, ``quality_classifier`` distills the
    labels into a cheap bag-feature scorer, and the gate becomes the
    Pareto resample over the learned scores — higher recall than the
    hard rules (borderline docs survive in proportion to their score)
    at one extra bounded-shuffle training pass. ``classifier_opts``
    forwards to quality_classifier (n_buckets/iters/lr/pareto_alpha —
    alpha tunes the keep rate: smaller = heavier-tailed, more kept).
    The boarded audit row pins the default rule gate; the learned gate
    is the pipeline option (pytest e2e)."""
    from ..cache import track_persist
    from .dedup import line_dedup
    from .text import decontaminate, quality_features, quality_reasons

    # the gate is ONE map-only scan (r14): quality_features fuses the
    # rule-battery features with the score in a single projection and
    # carries the document row through, so both keep decisions filter
    # the scan in place — the old shape evaluated the corpus four times
    # (rule features, score stats, and the two semi-join left sides)
    doc_cols = documents.columns
    carry = tuple(c for c in doc_cols if c != "doc_id")
    gated = quality_features(documents, _carry=carry).filter(
        (quality_reasons() == "")
        & (F.col("quality_score") >= min_quality)
    )
    if learned_filter:
        from .classify import quality_classifier

        labels = gated.select("doc_id")
        scored = quality_classifier(
            documents, labels, **(classifier_opts or {})
        )
        kept_q = documents.join(
            scored.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
        )
    else:
        kept_q = gated.select(*doc_cols)
    cleaned = (
        line_dedup(kept_q)
        .select("doc_id", F.col("cleaned_text").alias("text"))
        .filter(F.length(F.trim("text")) > 0)
    )
    # exact dedup as one fp-keyed min-struct aggregation (doc_id leads
    # the struct, so the lexicographic min IS the first-occurrence row):
    # same rows as the old min(doc_id)-then-semi-join, with one exchange
    # instead of two and ONE evaluation of the line-dedup chain
    unique = (
        cleaned.groupBy(F.md5(normalize_text(F.col("text"))).alias("fp"))
        .agg(F.min(F.struct("doc_id", "text")).alias("m"))
        .select(F.col("m.doc_id").alias("doc_id"), F.col("m.text").alias("text"))
    )
    # unique feeds BOTH the decontamination shingle kernel and the
    # anti-join left side — persist the diamond so the whole upstream
    # chain (gate + line dedup + exact dedup) evaluates once
    unique = track_persist(unique)
    contaminated = (
        decontaminate(unique, benchmark, threshold=contamination_threshold)
        .filter(F.col("contaminated"))
        .select("doc_id")
    )
    final = unique.join(contaminated, "doc_id", "left_anti")
    return {
        "input": documents,
        "after_quality": kept_q,
        "after_line_dedup": cleaned,
        "after_exact": unique,
        "after_decontamination": final,
    }


def preparation_audit(
    documents: DataFrame,
    benchmark: DataFrame,
    min_quality: float = 0.4,
    contamination_threshold: float = 0.5,
) -> DataFrame:
    """Per-stage survival counts of the full preparation flow as ONE
    DataFrame (stage_no, stage, n_docs) — the monotone audit table as a
    declarative union of stage counts, so the flagship pipeline itself
    sits on the driver's oracle board (each stage's operator is also
    individually oracled)."""
    from ..cache import track_persist

    stages = preparation_stages(
        documents,
        benchmark,
        min_quality=min_quality,
        contamination_threshold=contamination_threshold,
    )
    # each derived stage is counted AND is the next stage's input — the
    # DuckDB oracle MATERIALIZEs every CTE of this linear chain for the
    # same reason; without the persists stage N's count re-evaluates
    # stages 1..N-1 (O(S²) corpus passes, 34 SortMergeJoins in the r14
    # audit capture of the unpersisted plan)
    stages = {
        name: (df if name == "input" else track_persist(df))
        for name, df in stages.items()
    }
    parts = []
    for i, name in enumerate(PREPARATION_STAGE_ORDER):
        parts.append(
            stages[name]
            .agg(F.count("*").cast("long").alias("n_docs"))
            .select(
                F.lit(i).cast("long").alias("stage_no"),
                F.lit(name).alias("stage"),
                "n_docs",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("stage_no")


def initial_prepare_state(spark) -> dict:
    """Empty catalogs for ``prepare_corpus_increment`` — in production
    each is a metadata-plane table the pipeline appends to per run."""
    return {
        "line_fps": spark.createDataFrame([], "fp string"),
        "exact_fps": spark.createDataFrame([], "fp string"),
        "source_counts": spark.createDataFrame(
            [], "source string, n_docs long"
        ),
    }


def prepare_corpus_increment(
    new_docs: DataFrame,
    benchmark: DataFrame,
    state: dict,
    min_quality: float = 0.4,
    contamination_threshold: float = 0.5,
    key: str = "source",
    classifier_model: dict | None = None,
    pareto_alpha: float = 9.0,
) -> tuple:
    """One CDC run of the preparation pipeline: process TODAY'S arrivals
    only, against persisted catalogs from previous runs — the
    refreshing-corpus shape where history is never reprocessed.

    ``classifier_model`` (a ``train_quality_classifier`` model dict,
    trained ONCE on the seed corpus and frozen — the
    semantic_dedup_increment convention) swaps the rule gate for the
    learned Pareto resample: arrivals are scored map-side against the
    broadcast weights, so the gate stays stateless and the per-batch
    composition property is untouched (the keep decision is a pure
    per-doc function, identical on any batch split).

        quality gate (stateless) → incremental line dedup (line-fp
        catalog) → incremental exact dedup (doc-fp catalog) →
        decontamination (stateless) → per-source count catalog update

    When batches arrive in ascending doc_id order, the composition of
    per-batch runs is EXACTLY the batch pipeline on the union (the
    catalogs carry the cross-batch first-occurrence decisions;
    pytest-replayed set-equal on a 3-batch split). Temperature mixing
    is deliberately NOT baked into the per-batch output: rates depend
    on the full corpus distribution, so the mix is a deterministic
    policy view — ``temperature_mix(prepared, counts=state
    ["source_counts"])`` — re-derived from the count catalog after each
    run, a source-count-sized join over already-prepared docs, never a
    reprocess.

    Returns ``(prepared_batch, new_state)`` — the surviving documents
    of this batch (doc_id, text), and the updated catalogs the caller
    persists for the next run (in production: append-only metadata
    tables; the count merge is a partial-aggregating groupBy over
    source-count-sized frames).
    """
    from .dedup import incremental_exact_dedup, line_dedup_incremental
    from .text import decontaminate

    if classifier_model is not None:
        from .classify import classifier_scores

        keep_ids = (
            classifier_scores(new_docs, classifier_model, pareto_alpha)
            .filter(F.col("keep"))
            .select("doc_id")
        )
        kept_q = new_docs.join(keep_ids, "doc_id", "left_semi")
    else:
        from .text import quality_features, quality_reasons

        # fused map-only gate (r14) — same shape as preparation_stages
        doc_cols = new_docs.columns
        kept_q = (
            quality_features(
                new_docs,
                _carry=tuple(c for c in doc_cols if c != "doc_id"),
            )
            .filter(
                (quality_reasons() == "")
                & (F.col("quality_score") >= min_quality)
            )
            .select(*doc_cols)
        )
    cleaned_full, new_line_fps = line_dedup_incremental(
        kept_q, state["line_fps"]
    )
    cleaned = cleaned_full.select(
        "doc_id", F.col("cleaned_text").alias("text")
    ).filter(F.length(F.trim("text")) > 0)
    survivors = incremental_exact_dedup(cleaned, state["exact_fps"])
    unique = cleaned.join(survivors.select("doc_id"), "doc_id", "left_semi")
    contaminated = (
        decontaminate(unique, benchmark, threshold=contamination_threshold)
        .filter(F.col("contaminated"))
        .select("doc_id")
    )
    final = unique.join(contaminated, "doc_id", "left_anti")
    counts_delta = (
        final.join(new_docs.select("doc_id", key), "doc_id")
        .groupBy(F.col(key).alias("source"))
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    new_state = {
        "line_fps": state["line_fps"].unionByName(new_line_fps).distinct(),
        "exact_fps": state["exact_fps"].unionByName(
            survivors.select("fp")
        ),
        "source_counts": state["source_counts"]
        .unionByName(counts_delta)
        .groupBy("source")
        .agg(F.sum("n_docs").cast("long").alias("n_docs")),
    }
    return final, new_state


_STATE_SCHEMAS = {
    "line_fps": "fp string",
    "exact_fps": "fp string",
    "source_counts": "source string, n_docs long",
}


def load_prepare_state(spark, state_dir: str) -> tuple:
    """Load the newest persisted catalog version under ``state_dir``
    (versioned ``v=N`` subdirectories — each run writes a NEW version
    and flips the pointer file, so a crashed run never corrupts the
    previous catalogs). Returns (state dict, version)."""
    import os

    from .lakefs import for_path

    lake, sd = for_path(state_dir)
    if not lake.exists(f"{sd}/CURRENT"):
        return initial_prepare_state(spark), 0
    v = int(lake.read_text(f"{sd}/CURRENT").strip())
    state = {
        name: spark.read.schema(schema).parquet(
            os.path.join(state_dir, f"v={v}", name)
        )
        for name, schema in _STATE_SCHEMAS.items()
    }
    return state, v


def save_prepare_state(
    state: dict, state_dir: str, version: int, batch_id: int = None,
    lineage: str = None,
) -> None:
    """Write the catalogs as version ``version`` and flip CURRENT.
    ``batch_id`` (streaming use) is recorded inside the version dir
    BEFORE the flip, so a replayed micro-batch can detect that this
    version already absorbed it. ``lineage`` (the checkpoint identity
    token) is recorded next to it: batch_id is only meaningful within
    ONE checkpoint lineage — a fresh checkpoint re-numbers batches from
    0 over possibly different file groupings, so a skip decision must
    never trust a batch_id minted by a different checkpoint."""
    import os

    from .lakefs import for_path

    lake, sd = for_path(state_dir)
    for name in _STATE_SCHEMAS:
        state[name].write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v={version}", name)
        )
    if batch_id is not None:
        lake.write_text(f"{sd}/v={version}/BATCH", str(batch_id))
    if lineage is not None:
        lake.write_text(f"{sd}/v={version}/LINEAGE", lineage)
    # the CURRENT flip is the catalog's atomic publish: temp+move on
    # POSIX, atomic single-object PUT on object stores (lakefs)
    lake.write_text(f"{sd}/CURRENT", str(version))


def committed_batch_id(state_dir: str, version: int):
    """The streaming batch_id absorbed by catalog ``version`` (None for
    batch-mode versions or v=0)."""
    import os

    from .lakefs import for_path

    lake, sd = for_path(state_dir)
    p = f"{sd}/v={version}/BATCH"
    if version <= 0 or not lake.exists(p):
        return None
    return int(lake.read_text(p).strip())


def committed_lineage(state_dir: str, version: int):
    """The checkpoint-lineage token recorded with catalog ``version``
    (None for batch-mode versions, v=0, or pre-lineage state dirs)."""
    import os

    from .lakefs import for_path

    lake, sd = for_path(state_dir)
    p = f"{sd}/v={version}/LINEAGE"
    if version <= 0 or not lake.exists(p):
        return None
    return lake.read_text(p).strip()


def _reconcile_source_counts(spark, out_dir: str, state_dir: str) -> None:
    """Set the source-count catalog to the at-rest truth — the
    invariant ``corpus_verify`` checks (catalog ≡ per-source counts
    recomputed from the data). Recompute-from-truth is what makes the
    forget protocol's crash recovery idempotent: no matter where a
    previous run died (before, during or after the partition swaps),
    one reconcile pass lands the catalog exactly right. The new
    version carries the stream's BATCH/LINEAGE replay markers
    forward."""
    from .lakefs import for_path

    lake, od = for_path(out_dir)
    state, v = load_prepare_state(spark, state_dir)
    if any(e.startswith("batch=") for e in lake.listdir(od)):
        counts = (
            spark.read.parquet(out_dir)
            .groupBy("source")
            .agg(F.count("*").cast("long").alias("n_docs"))
        )
    else:  # every partition erased — an empty dir has no schema
        counts = spark.createDataFrame([], "source string, n_docs long")
    state["source_counts"] = counts
    save_prepare_state(
        state,
        state_dir,
        v + 1,
        batch_id=committed_batch_id(state_dir, v),
        lineage=committed_lineage(state_dir, v),
    )


def forget_pending_path(state_dir: str) -> str:
    """The forget protocol's in-flight marker: present from just
    before the partition swaps until the catalog reconcile commits.
    ``forget_documents`` heals it on open; ``corpus_verify`` reports a
    stranded one as ``pending_forget``."""
    import os

    return os.path.join(state_dir, "FORGET-PENDING")


def forget_documents(
    spark, out_dir: str, doc_ids, state_dir: str = None, key: str = "source"
) -> int:
    """Physical erasure from the prepared corpus at rest — the
    pipeline-level half of the right-to-be-forgotten story (the index
    halves are ``bm25_index_delete`` / ``ivfpq_index_delete``; compose
    all three for a full takedown). Rewrites ONLY the batch partitions
    that actually contain the doomed doc_ids: one partition-pruned
    read + anti-join into a dot-prefixed build dir (invisible to every
    reader), then a per-partition rename swap — untouched partitions'
    files are never rewritten, so a takedown against a 100 TB corpus
    is priced at the affected partitions, not the corpus.

    Returns how many documents were erased (0 = nothing written).
    With ``state_dir`` given, the source-count catalog is brought back
    to the at-rest truth in a NEW catalog version (so the
    temperature-mix policy view stays honest), carrying the current
    version's BATCH/LINEAGE markers forward — a crashed streaming
    micro-batch replay still skips correctly after a forget. The
    catalog update is recompute-from-truth behind a FORGET-PENDING
    marker written BEFORE the swaps: a crash in any window (mid-swap,
    or after the swaps but before the catalog commit) leaves the
    marker, and the next call — even a no-op retry — reconciles the
    catalog from the post-crash data before doing anything else, so
    the catalog can never drift permanently. The one recompute is a
    column-pruned count over the corpus — the price of exactness; the
    marker means it is paid only by forgets and crash recoveries,
    never by reads. The catalog invariant requires the pipeline's
    default ``key="source"`` (the stored schema) — a different key
    with ``state_dir`` raises up front, before any mutation. The
    dedup fingerprint catalogs are kept BY CONTRACT: they are one-way
    hashes, and keeping them means forgotten content is also never
    re-admitted by a later arrival of the same bytes (erase-and-block,
    the conservative reading; rebuild the catalogs if re-admission is
    the policy you want).

    Crash semantics: the swap heals on the next run (a ``.retired``
    sibling with a missing live dir renames back; with a live dir it
    is dropped), stale builds from crashed runs are cleared by pid
    glob, and the erase itself is idempotent — a retry finds only the
    still-present doc_ids. Run from the maintenance owner with the
    stream quiesced (readers racing a swap may transiently miss one
    partition, the compaction caveat). A partition whose every doc is
    erased disappears entirely.

    Filesystem semantics: the per-partition publish is an atomic
    directory-rename swap, so the corpus sink requires a
    RENAME-CAPABLE filesystem (POSIX, HDFS; lakefs refuses loudly on
    an object store instead of degrading to a non-atomic copy). On a
    flat-namespace store (S3), physically erase by rewriting the
    corpus generation behind a CURRENT-pointer catalog (the
    stream_prepare_corpus discipline) or rely on the index-side
    tombstones + full rewrite cadence — see ARCHITECTURE.md §10."""
    import os

    from .lakefs import for_path

    lake, od = for_path(out_dir)

    if state_dir is not None and key != "source":
        raise ValueError(
            "forget_documents: the source-count catalog is keyed on "
            f"'source' (see _STATE_SCHEMAS) — key={key!r} cannot "
            "maintain it. Pass state_dir=None to erase without a "
            "catalog, or use the default key."
        )
    # recovery-on-open: heal crashed swaps, clear crashed builds, and
    # finish a crashed run's catalog reconcile BEFORE anything else
    entries = lake.listdir(od)
    for name in entries:
        if name.startswith("batch=") and name.endswith(".retired"):
            live = name[: -len(".retired")]
            if lake.exists(f"{od}/{live}"):
                lake.rmtree(f"{od}/{name}")
            else:
                lake.move(f"{od}/{name}", f"{od}/{live}")
        elif name.startswith(".forget-"):
            lake.rmtree(f"{od}/{name}")
    marker_lake, mp = (
        for_path(forget_pending_path(state_dir))
        if state_dir is not None
        else (None, None)
    )
    if state_dir is not None and marker_lake.exists(mp):
        _reconcile_source_counts(spark, out_dir, state_dir)
        marker_lake.rmfile(mp)
    if not any(e.startswith("batch=") for e in lake.listdir(od)):
        # every partition already erased — an empty dir has no schema
        # to infer, and there is nothing left to forget (the same
        # guard _reconcile_source_counts applies on the catalog side)
        return 0

    if isinstance(doc_ids, DataFrame):
        ids = doc_ids.select("doc_id").distinct()
    else:
        rows = [(i,) for i in doc_ids]
        if not rows:
            return 0  # nothing requested — match the 0-found contract
        ids = spark.createDataFrame(rows, ["doc_id"]).distinct()

    corpus = spark.read.parquet(out_dir)
    doomed = corpus.join(ids, "doc_id", "left_semi").persist()
    try:
        n_erased = doomed.count()
        if not n_erased:
            return 0
        affected = sorted(
            r.batch for r in doomed.select("batch").distinct().collect()
        )
        build = f"{out_dir}/.forget-{os.getpid()}"
        (
            corpus.filter(F.col("batch").isin(affected))
            .join(ids, "doc_id", "left_anti")
            .write.mode("overwrite")
            .partitionBy("batch")
            .parquet(build)
        )
        # the marker goes down BEFORE the first swap: from here until
        # the catalog commit, any crash leaves it for recovery-on-open
        if state_dir is not None:
            marker_lake.write_text(mp, "in-flight")
        bd = for_path(build)[1]
        for b in affected:
            live = f"{od}/batch={b}"
            fresh = f"{bd}/batch={b}"
            retired = f"{live}.retired"
            lake.move(live, retired)
            if lake.isdir(fresh):
                lake.move(fresh, live)
            lake.rmtree(retired)
        lake.rmtree(bd)
    finally:
        doomed.unpersist()

    if state_dir is not None:
        _reconcile_source_counts(spark, out_dir, state_dir)
        marker_lake.rmfile(mp)
    return int(n_erased)


def takedown(
    spark,
    doc_ids,
    corpus_dir: str = None,
    state_dir: str = None,
    bm25_path: str = None,
    ivfpq_path: str = None,
    batch_id: str = None,
    compact: bool = False,
) -> dict:
    """One-call right-to-be-forgotten across every serving surface a
    document reaches: physical erasure from the prepared corpus
    (``forget_documents``) plus tombstone deletes from the lexical and
    dense indexes (``bm25_index_delete`` / ``ivfpq_index_delete`` —
    the convention ties vec_id to doc_id, the retrieval-corpus
    contract). Pass only the surfaces that exist; ``batch_id`` (with
    ``-bm25`` / ``-ivfpq`` suffixes, so the two commit logs never
    collide with each other) makes the index halves idempotent on
    retry, and the corpus half is idempotent by construction. Returns
    ``{"corpus": n, "bm25": n, "ivfpq": n}`` for the surfaces
    touched.

    Erasure semantics, stated precisely: the CORPUS half is physical
    (the bytes leave the disk in this call), but the INDEX halves are
    LOGICAL until the next compaction — tombstones make the deleted
    documents unservable immediately, while their posting/code bytes
    remain at rest inside earlier segments until
    ``bm25_index_compact`` / ``ivfpq_index_compact`` folds them away.
    ``compact=True`` runs both compactions (verified: the fold is
    fsck'd before the swap) inside this call, making index erasure
    physical too. Snapshot pins minted BEFORE the takedown continue to
    serve the deleted documents until they are released — pins are
    immutable by contract (see resolve_snapshot); a compliance-grade
    erasure must also retire outstanding pins (compaction bumps the
    generation token, so pinned readers fail loudly on next use
    rather than silently serving stale rows).

    The training tape is NOT covered: windows mix documents, so tape
    erasure means re-exporting from the forgotten corpus — regenerate
    it (the tape is a derived artifact) rather than patching it.
    Run from the maintenance owner with writers quiesced, like each
    component."""
    from .similarity import ivfpq_index_compact, ivfpq_index_delete
    from .text import bm25_index_compact, bm25_index_delete

    if isinstance(doc_ids, DataFrame):
        ids = doc_ids.select("doc_id").distinct().persist()
    else:
        rows = [(i,) for i in doc_ids]
        if not rows:
            return {
                k: 0
                for k, p in (
                    ("corpus", corpus_dir),
                    ("bm25", bm25_path),
                    ("ivfpq", ivfpq_path),
                )
                if p is not None
            }
        ids = spark.createDataFrame(rows, ["doc_id"]).distinct().persist()
    try:
        out = {}
        # indexes first: a serving index must never return a doc the
        # corpus no longer holds, so the anti-join side goes dark
        # before the at-rest bytes disappear
        if bm25_path is not None:
            out["bm25"] = bm25_index_delete(
                spark, bm25_path, ids,
                batch_id=batch_id and f"{batch_id}-bm25",
            )
            if compact:
                bm25_index_compact(spark, bm25_path, verify=True)
        if ivfpq_path is not None:
            out["ivfpq"] = ivfpq_index_delete(
                spark, ivfpq_path,
                ids.select(F.col("doc_id").alias("vec_id")),
                batch_id=batch_id and f"{batch_id}-ivfpq",
            )
            if compact:
                ivfpq_index_compact(spark, ivfpq_path, verify=True)
        if corpus_dir is not None:
            out["corpus"] = forget_documents(
                spark, corpus_dir, ids, state_dir=state_dir
            )
        return out
    finally:
        ids.unpersist()


def stream_prepare_corpus(
    spark,
    docs_path: str,
    benchmark: DataFrame,
    state_dir: str,
    out_dir: str,
    min_quality: float = 0.4,
    contamination_threshold: float = 0.5,
    key: str = "source",
    max_files_per_trigger: int = 1,
    checkpoint_dir: str = None,
):
    """The CDC pipeline as an actual Structured Streaming job: documents
    arrive as files land; each micro-batch runs
    ``prepare_corpus_increment`` against the parquet-backed catalogs
    (``foreachBatch`` — the standard pattern for stateful sinks Spark's
    built-in state store doesn't model), overwrites its survivors into
    the batch-keyed partition ``out_dir/batch={batch_id}``, and commits
    a NEW catalog version recording the batch_id (crash-safe AND
    idempotent: the CURRENT pointer flips only after the version is
    fully written, so a replay BEFORE the flip recomputes against the
    same catalogs and overwrites the same partition with identical
    rows, while a replay AFTER the flip sees its batch_id already
    committed and skips — no duplicate output, no extra version bump,
    in either crash window).

    When files land in ascending doc_id order the accumulated output is
    EXACTLY the batch pipeline on the union (the incremental replay
    contract); otherwise first-arrival wins, the streaming-twin caveat
    shared with stream_line_dedup. Returns the StreamingQuery.

    Lineage guard: a LINEAGE token minted once per checkpoint directory
    is committed with every catalog version, and the replay-skip only
    fires when the committed token matches the running checkpoint's.
    Pointing a FRESH checkpoint at a state_dir with committed batches
    raises instead of silently skipping batches 0..done whose contents
    (file-to-batch grouping) may differ — state_dir and checkpoint must
    be reset together.
    """
    ckpt = checkpoint_dir or f"{state_dir}/_checkpoint"
    token = _checkpoint_lineage(ckpt)

    schema = spark.read.parquet(docs_path).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(docs_path)
    )

    def handle(batch_df, batch_id):
        state, v = load_prepare_state(spark, state_dir)
        done = committed_batch_id(state_dir, v)
        if done is not None:
            lin = committed_lineage(state_dir, v)
            if lin is not None and lin != token:
                raise ValueError(
                    "stream_prepare_corpus: state_dir has batches "
                    f"committed by a different checkpoint lineage ({lin!r}"
                    f" != {token!r}). batch_id is only meaningful within "
                    "one checkpoint — reset state_dir and checkpoint_dir "
                    "together."
                )
            if batch_id <= done:
                return  # replay of an already-committed micro-batch
        from ..cache import persist_scope

        # scoped release: the increment's stages persist arrivals-sized
        # intermediates; a 24/7 stream must not pin one per micro-batch.
        # Everything the batch produces is WRITTEN inside the scope, so
        # nothing released is still lazily referenced.
        with persist_scope():
            final, new_state = prepare_corpus_increment(
                batch_df,
                benchmark,
                state,
                min_quality=min_quality,
                contamination_threshold=contamination_threshold,
                key=key,
            )
            final.write.mode("overwrite").parquet(
                f"{out_dir}/batch={batch_id}"
            )
            save_prepare_state(
                new_state, state_dir, v + 1, batch_id=batch_id, lineage=token
            )

    return (
        stream.writeStream.foreachBatch(handle)
        .option(
            "checkpointLocation", checkpoint_dir or f"{state_dir}/_checkpoint"
        )
        .start()
    )


def stream_related_items(
    spark,
    docs_path: str,
    bm25_index_path: str,
    ivfpq_index_path: str,
    out_dir: str,
    base_embeddings: DataFrame = None,
    refresh: str = "arrivals",
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
    m_terms: int = 8,
    max_df_ratio: float = 0.25,
    n_probe: int = 4,
    rerank: int = 0,
    max_files_per_trigger: int = 1,
    checkpoint_dir: str = None,
):
    """The related-items refresh as an actual Structured Streaming job
    (r12 verdict #8 — the streaming twin of the arrivals-only refresh):
    hybrid-corpus arrivals land as files carrying (doc_id, text,
    embedding); each micro-batch CDC-increments BOTH serving indexes,
    snapshot-pins the just-committed state, and recomputes neighbor
    lists through ``hybrid_knn_graph_from_index`` — for exactly the
    arrivals (``refresh="arrivals"``, the arrivals-priced default whose
    cost curve tools/refresh_curve_probe.py measured flat in corpus
    size) or for every committed document (``refresh="all"``, the
    corpus-priced mode whose accumulated output IS the batch graph on
    the union). Results land in ``out_dir/graph/batch=<id>``; read the
    CURRENT graph with ``read_related_items`` (latest batch per
    query_id).

    Semantics of ``"arrivals"`` stated honestly: each arrival's row is
    the full graph AS OF its own micro-batch's committed corpus
    (pytest-asserted bit-exact via the snapshot pins); EARLIER
    documents' rows are not rewritten when later arrivals would enter
    their top-k — the standard production trade (arrivals get fresh
    lists immediately; the backlog refreshes on the compaction cadence
    or with one ``refresh="all"`` pass). ``"all"`` closes that gap at
    corpus-per-batch price.

    Established twin discipline throughout: ``persist_scope`` releases
    the per-batch intermediates (a 24/7 stream must not pin one per
    micro-batch); replays are idempotent (index increments are
    batch-id no-ops once committed, sidecar/graph writes overwrite
    their own partition, the COMMITTED marker flips last); and the
    LINEAGE token guards both the output state AND the indexes — batch
    ids are only meaningful within one checkpoint, so a fresh
    checkpoint pointed at already-streamed state raises instead of
    silently no-op'ing increments whose file-to-batch grouping may
    differ. ``base_embeddings`` supplies the pre-stream corpus's
    vectors (needed by ``refresh="all"`` and by ``rerank>0``, whose
    exact rescoring reads raw vectors); arrival vectors accumulate in
    ``out_dir/embeddings/batch=<id>``."""
    from .segments import resolve_index_root, segment_commits
    from .similarity import (
        hybrid_knn_graph_from_index,
        ivfpq_index_increment,
        ivfpq_index_snapshot,
    )
    from .text import (
        bm25_index_increment,
        bm25_index_snapshot,
    )

    if refresh not in ("arrivals", "all"):
        raise ValueError(
            f"Invalid refresh: {refresh!r} (one of arrivals, all)"
        )
    if base_embeddings is None and (refresh == "all" or rerank > 0):
        # as loud as the refresh-value check above: omitting the
        # pre-stream vectors here silently produces a graph missing
        # every base document's rows (refresh="all") or mis-reranked
        # candidates (rerank reads raw vectors). A genuinely empty
        # pre-stream corpus passes an empty (vec_id, embedding) frame.
        raise ValueError(
            f"stream_related_items: refresh={refresh!r}, rerank={rerank}"
            " require base_embeddings (the pre-stream corpus's vectors);"
            " pass an empty (vec_id, embedding) DataFrame if the stream"
            " starts from an empty corpus."
        )
    ckpt = checkpoint_dir or f"{out_dir}/_checkpoint"
    token = _checkpoint_lineage(ckpt)

    from .lakefs import Lake

    schema = spark.read.parquet(docs_path).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(docs_path)
    )

    def handle(batch_df, batch_id):
        lake, od = Lake.for_path(out_dir)
        committed_f, lineage_f = f"{od}/_STATE/COMMITTED", f"{od}/_STATE/LINEAGE"
        if lake.exists(committed_f):
            lin = (
                lake.read_text(lineage_f).strip()
                if lake.exists(lineage_f)
                else None
            )
            if lin is not None and lin != token:
                raise ValueError(
                    "stream_related_items: out_dir has batches committed "
                    f"by a different checkpoint lineage ({lin!r} != "
                    f"{token!r}). batch_id is only meaningful within one "
                    "checkpoint — reset out_dir, both indexes' streamed "
                    "batches, and checkpoint_dir together."
                )
            if batch_id <= int(lake.read_text(committed_f).strip()):
                return  # replay of an already-committed micro-batch
        elif lake.exists(lineage_f):
            # a crash landed between the first batch's increments and
            # its COMMITTED marker: the lineage token (written BEFORE
            # any increment, below) proves the indexes' s<N> batches
            # are OURS — fall through and replay idempotently
            lin = lake.read_text(lineage_f).strip()
            if lin != token:
                raise ValueError(
                    "stream_related_items: out_dir was initialized by a "
                    f"different checkpoint lineage ({lin!r} != {token!r})"
                    " — reset out_dir, both indexes' streamed batches, "
                    "and checkpoint_dir together."
                )
        else:
            # first commit of THIS lineage: the indexes must not already
            # hold another lineage's streamed batches — their s<N> ids
            # would make this stream's increments silent no-ops over
            # DIFFERENT documents (file-to-batch grouping is lineage-
            # specific)
            for p, what in (
                (bm25_index_path, "BM25 index"),
                (ivfpq_index_path, "IVF-PQ index"),
            ):
                stale = [
                    b
                    for b in segment_commits(resolve_index_root(p), what)
                    if b.startswith("s") and b[1:].isdigit()
                ]
                if stale:
                    raise ValueError(
                        f"stream_related_items: {what} at {p!r} already "
                        f"holds streamed batches {sorted(stale)} from "
                        "another run — compact it (folds them into base) "
                        "or rebuild before starting a fresh checkpoint."
                    )
            # claim the lineage BEFORE the first increment, so a crash
            # anywhere before the COMMITTED marker replays as OUR
            # lineage instead of refusing our own s<N> batches as stale
            lake.mkdirs(f"{od}/_STATE")
            lake.write_text(lineage_f, token)
        from ..cache import persist_scope

        with persist_scope():
            arrivals = batch_df.select("doc_id", "text")
            arr_emb = batch_df.select(
                F.col("doc_id").alias("vec_id"), "embedding"
            )
            bm25_index_increment(
                arrivals, bm25_index_path, batch_id=f"s{batch_id}"
            )
            ivfpq_index_increment(
                arr_emb, ivfpq_index_path, batch_id=f"s{batch_id}"
            )
            arr_emb.write.mode("overwrite").parquet(
                f"{out_dir}/embeddings/batch={batch_id}"
            )
            qvecs = spark.read.parquet(f"{out_dir}/embeddings")
            qvecs = qvecs.select("vec_id", "embedding")
            if base_embeddings is not None:
                qvecs = base_embeddings.select(
                    "vec_id", "embedding"
                ).unionByName(qvecs)
            query_ids = None
            if refresh == "arrivals":
                query_ids = arr_emb.select(
                    F.col("vec_id").alias("doc_id")
                )
            graph = hybrid_knn_graph_from_index(
                spark,
                bm25_index_path,
                ivfpq_index_path,
                qvecs,
                k=k,
                k_each=k_each,
                rrf_k=rrf_k,
                m_terms=m_terms,
                max_df_ratio=max_df_ratio,
                n_probe=n_probe,
                rerank=rerank,
                query_ids=query_ids,
                # pin the refresh to the state THIS batch just committed:
                # a racing maintenance publish cannot shift rows under it
                bm25_snapshot=bm25_index_snapshot(bm25_index_path),
                ivfpq_snapshot=ivfpq_index_snapshot(ivfpq_index_path),
            )
            graph.write.mode("overwrite").parquet(
                f"{out_dir}/graph/batch={batch_id}"
            )
        lake.write_text(committed_f, str(batch_id))  # commit marker LAST

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .start()
    )


def related_items_takedown(
    spark,
    out_dir: str,
    bm25_index_path: str,
    ivfpq_index_path: str,
    doc_ids,
    embeddings: DataFrame,
    batch_id: str = None,
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
    m_terms: int = 8,
    max_df_ratio: float = 0.25,
    n_probe: int = 4,
    rerank: int = 0,
) -> dict:
    """Right-to-be-forgotten for the DERIVED serving artifact: a
    takedown that tombstones both indexes is not finished while the
    materialized related-items graph still stores the doomed documents
    as neighbors (their ids — and, in the embeddings sidecar, their
    vectors — are personal data at rest). This erases them at
    affected-partition price, the ``forget_documents`` discipline
    applied to ``stream_related_items``' output:

    1. tombstone-delete the doomed ids from BOTH indexes (the standing
       index-side takedown);
    2. find the AFFECTED queries — those whose stored top-k references
       a doomed doc (their lists have holes) — straight from the graph
       artifact, one column-pruned scan;
    3. re-retrieve exactly the affected queries against the
       post-delete indexes and rewrite ONLY the partitions holding
       doomed or affected rows: doomed queries' own rows drop, stale
       rows are replaced IN PLACE in each query's latest partition (no
       new partition, so ``read_related_items``' latest-batch
       resolution and a later-resumed stream are undisturbed);
    4. scrub the doomed vectors from the embeddings sidecar the same
       per-partition way.

    Erasure is EXACT: after the call no doomed id or vector exists
    anywhere under ``out_dir`` (pytest scans every surviving row).
    Freshness is exact for every refreshed query; untouched queries
    keep their stored rows, which is exact on the dense side (ADC
    distances are per-vector) and exact on the lexical side up to the
    global BM25 statistics shift every delete causes (df/N/avgdl move
    for EVERYONE, so only a full re-run could chase it; the documented
    convergence point is the next refresh cadence or compaction —
    the same bounded-staleness trade the arrivals-only stream makes).

    Run from the maintenance owner with the stream QUIESCED (the
    single-maintenance-owner discipline); the per-partition publish is
    the rename swap, so the graph sink shares ``forget_documents``'
    rename-capable requirement (on object stores, rewrite the artifact
    generation behind a CURRENT pointer instead). Crash-safe the same
    way: ``.retired`` partitions heal on the next call, stale builds
    are cleared, and a retry finds only what is still present.
    ``embeddings`` supplies the query vectors for the refresh (doomed
    rows in it are never read). Returns per-surface erasure counts."""
    import os

    from .lakefs import for_path
    from .similarity import (
        hybrid_knn_graph_from_index,
        ivfpq_index_delete,
    )
    from .text import bm25_index_delete

    if isinstance(doc_ids, DataFrame):
        ids = doc_ids.select("doc_id").distinct()
    else:
        rows = [(int(i),) for i in doc_ids]
        if not rows:
            return {"bm25": 0, "ivfpq": 0, "graph_rows_erased": 0,
                    "queries_refreshed": 0, "sidecar_vectors_erased": 0}
        ids = spark.createDataFrame(rows, ["doc_id"]).distinct()
    ids = ids.persist()
    lake, od = for_path(out_dir)
    out = {}
    try:
        # heal crashed swaps / clear crashed builds BEFORE anything else
        for sub in ("graph", "embeddings"):
            base = f"{od}/{sub}"
            if not lake.isdir(base):
                continue
            for name in lake.listdir(base):
                if name.startswith("batch=") and name.endswith(".retired"):
                    live = name[: -len(".retired")]
                    if lake.exists(f"{base}/{live}"):
                        lake.rmtree(f"{base}/{name}")
                    else:
                        lake.move(f"{base}/{name}", f"{base}/{live}")
                elif name.startswith(".takedown-"):
                    lake.rmtree(f"{base}/{name}")

        out["bm25"] = bm25_index_delete(
            spark, bm25_index_path, ids,
            batch_id=batch_id and f"{batch_id}-bm25",
        )
        out["ivfpq"] = ivfpq_index_delete(
            spark, ivfpq_index_path,
            ids.select(F.col("doc_id").alias("vec_id")),
            batch_id=batch_id and f"{batch_id}-ivfpq",
        )

        def _scrub(sub, df, doomed_rows, drop_keys, key, fresh=None,
                   extra_batches=()):
            """Rewrite only the partitions holding doomed rows (plus
            ``extra_batches`` — the partitions ``fresh`` replacement
            rows land in): drop rows keyed in ``drop_keys``, union
            ``fresh`` replacements, publish with the per-partition
            rename swap. extra_batches exists because a refreshed
            query's fresh rows target its LATEST partition, which
            under refresh="all" histories need not hold any doomed row
            — without swapping it too, the recomputed rows would be
            built and then silently discarded (r13 ADVICE, medium)."""
            affected_batches = sorted(
                {
                    r.batch
                    for r in doomed_rows.select("batch").distinct().collect()
                }
                | set(extra_batches)
            )
            if not affected_batches:
                return 0
            build = f"{out_dir}/{sub}/.takedown-{os.getpid()}"
            rewritten = df.filter(
                F.col("batch").isin(affected_batches)
            ).join(drop_keys, key, "left_anti")
            if fresh is not None:
                rewritten = rewritten.unionByName(fresh)
            rewritten.write.mode("overwrite").partitionBy("batch").parquet(
                build
            )
            bd = for_path(build)[1]
            base = f"{od}/{sub}"
            for b in affected_batches:
                live = f"{base}/batch={b}"
                freshp = f"{bd}/batch={b}"
                retired = f"{live}.retired"
                lake.move(live, retired)
                if lake.isdir(freshp):
                    lake.move(freshp, live)
                lake.rmtree(retired)
            lake.rmtree(bd)
            return len(affected_batches)

        g = spark.read.parquet(f"{out_dir}/graph")
        # two hash semi-joins + distinct, NOT one OR-condition join:
        # Spark can only run (q==id OR d==id) as a BroadcastNestedLoop
        # over the full artifact — O(|graph|×|ids|) comparisons
        # (r13 ADVICE). Graph rows are unique (query_id, doc_id,
        # batch), so the union-distinct counts each row exactly once.
        doomed_rows = (
            g.join(ids.select(F.col("doc_id").alias("query_id")),
                   "query_id", "left_semi")
            .unionByName(g.join(ids, "doc_id", "left_semi"))
            .distinct()
            .persist()
        )
        out["graph_rows_erased"] = doomed_rows.count()
        affected = (
            doomed_rows.select("query_id")
            .distinct()
            .join(ids.select(F.col("doc_id").alias("query_id")),
                  "query_id", "left_anti")
            .persist()
        )
        out["queries_refreshed"] = affected.count()
        fresh = None
        fresh_batches = ()
        if out["queries_refreshed"]:
            # each refreshed query's rows land back in its LATEST
            # partition, so latest-batch resolution stays untouched
            latest = (
                g.join(affected, "query_id", "left_semi")
                .groupBy("query_id")
                .agg(F.max("batch").alias("batch"))
                .persist()
            )
            # the landing partitions must be in the swap set even when
            # they hold no doomed row themselves (refresh="all"
            # histories: the doomed doc may cite a query only in OLDER
            # batches) — otherwise the fresh rows are built, never
            # swapped in, and deleted with the build dir
            fresh_batches = sorted(
                r.batch
                for r in latest.select("batch").distinct().collect()
            )
            fresh = hybrid_knn_graph_from_index(
                spark,
                bm25_index_path,
                ivfpq_index_path,
                embeddings.select("vec_id", "embedding"),
                k=k,
                k_each=k_each,
                rrf_k=rrf_k,
                m_terms=m_terms,
                max_df_ratio=max_df_ratio,
                n_probe=n_probe,
                rerank=rerank,
                query_ids=affected.select(
                    F.col("query_id").alias("doc_id")
                ),
            ).join(latest, "query_id")
        if out["graph_rows_erased"]:
            drop = affected.unionByName(
                ids.select(F.col("doc_id").alias("query_id"))
            ).distinct()
            _scrub("graph", g, doomed_rows, drop, "query_id", fresh,
                   extra_batches=fresh_batches)
        if fresh is not None:
            latest.unpersist()
        doomed_rows.unpersist()
        affected.unpersist()

        out["sidecar_vectors_erased"] = 0
        if lake.isdir(f"{od}/embeddings"):
            e = spark.read.parquet(f"{out_dir}/embeddings")
            doomed_e = e.join(
                ids.select(F.col("doc_id").alias("vec_id")),
                "vec_id", "left_semi",
            ).persist()
            out["sidecar_vectors_erased"] = doomed_e.count()
            if out["sidecar_vectors_erased"]:
                _scrub(
                    "embeddings", e, doomed_e,
                    ids.select(F.col("doc_id").alias("vec_id")), "vec_id",
                )
            doomed_e.unpersist()
    finally:
        ids.unpersist()
    return out


def read_related_items(spark, out_dir: str) -> DataFrame:
    """The CURRENT related-items graph from a ``stream_related_items``
    output dir: latest batch's row set per query_id (under
    ``refresh="arrivals"`` each query_id appears in exactly one batch —
    CDC adds only — so this is a plain union; under ``refresh="all"``
    every batch rewrites every id and the window keeps the newest)."""
    from pyspark.sql import Window

    g = spark.read.parquet(f"{out_dir}/graph")
    w = Window.partitionBy("query_id")
    return (
        g.withColumn("_mb", F.max("batch").over(w))
        .filter(F.col("batch") == F.col("_mb"))
        .drop("_mb", "batch")
    )


RETRIEVAL_STAGE_ORDER = (
    "input",
    "after_quality",
    "after_exact",
    "chunks",
    "after_chunk_dedup",
)


def retrieval_stages(
    documents: DataFrame,
    min_quality: float = 0.4,
    chunk_size: int = 64,
    overlap: int = 16,
) -> dict:
    """The retrieval-corpus survival chain as lazy stage frames — the
    RAG twin of ``preparation_stages``: documents are quality-gated and
    exact-deduplicated DOC-level, chunked into overlapping token
    windows, then exact-deduplicated CHUNK-level (a boilerplate passage
    shared by many surviving documents collapses to its first chunk —
    the passage-granular dedup an index wants, which doc-level dedup
    cannot see). Every stage is an already-verified operator; the
    chunk-level fp arg-min is the same partial-agg shape as the
    doc-level one, keyed by normalized chunk text."""
    from .text import chunk_documents, quality_features, quality_reasons

    # same r14 shapes as preparation_stages: one fused map-only gate
    # (no corpus self-joins), and each exact dedup as a single
    # fp-keyed min-struct aggregation (unique id leads the struct, so
    # the lexicographic min IS the old min(id) + semi-join, row for row)
    doc_cols = documents.columns
    carry = tuple(c for c in doc_cols if c != "doc_id")
    kept_q = (
        quality_features(documents, _carry=carry)
        .filter(
            (quality_reasons() == "")
            & (F.col("quality_score") >= min_quality)
        )
        .select(*doc_cols)
    )
    unique = (
        kept_q.groupBy(F.md5(normalize_text(F.col("text"))).alias("fp"))
        .agg(
            F.min(
                F.struct("doc_id", *[c for c in doc_cols if c != "doc_id"])
            ).alias("m")
        )
        .select(*[F.col(f"m.{c}").alias(c) for c in doc_cols])
    )
    chunks = chunk_documents(unique, chunk_size=chunk_size, overlap=overlap)
    chunk_cols = chunks.columns
    deduped = (
        chunks.groupBy(F.md5(F.col("chunk_text")).alias("fp"))
        .agg(
            F.min(
                F.struct(
                    "chunk_id", *[c for c in chunk_cols if c != "chunk_id"]
                )
            ).alias("m")
        )
        .select(*[F.col(f"m.{c}").alias(c) for c in chunk_cols])
    )
    return {
        "input": documents,
        "after_quality": kept_q,
        "after_exact": unique,
        "chunks": chunks,
        "after_chunk_dedup": deduped,
    }


def prepare_retrieval_corpus(
    documents: DataFrame,
    index_dir: str,
    min_quality: float = 0.4,
    chunk_size: int = 64,
    overlap: int = 16,
) -> tuple:
    """End-to-end RAG corpus preparation:

        quality filter → exact doc dedup → token-window chunking →
        exact chunk dedup → materialized BM25 index over the chunks

    The written index serves ``bm25_probe_topk`` directly (chunk ids
    become the index's doc ids — the string-id path), so the composed
    lifecycle is chunk → index → bucket-pruned probe with no glue.
    Returns ``(chunks, audit)`` — the surviving chunk relation (as
    written, doc_id/text-renamed) and the per-stage count audit.
    Shuffle budget: one per stage, each stage individually verified;
    the chunker itself adds ZERO shuffles, so the chain's cost is the
    two fp arg-mins plus the index write's bucket partitioning.
    """
    from .text import write_bm25_index

    stages = retrieval_stages(
        documents,
        min_quality=min_quality,
        chunk_size=chunk_size,
        overlap=overlap,
    )
    audit = {name: stages[name].count() for name in RETRIEVAL_STAGE_ORDER}
    corpus = stages["after_chunk_dedup"].select(
        F.col("chunk_id").alias("doc_id"), F.col("chunk_text").alias("text")
    )
    write_bm25_index(corpus, index_dir)
    return corpus, audit
