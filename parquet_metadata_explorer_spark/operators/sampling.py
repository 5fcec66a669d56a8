"""Deterministic sampling & splitting for training-data pipelines.

Random sampling is useless for reproducible corpus work — the same doc
must land in the same split on every run, on every cluster, in every
engine. Everything here keys on ``hash60`` (md5-derived, engine-portable)
so Spark and the DuckDB oracle agree bit-for-bit, and re-runs are stable
under repartitioning.

All map-only or single-shuffle shapes:
- ``hash_split``: zero shuffles — a pure projection; at 100 TB it costs
  one md5 per row.
- ``sample_per_group``: one shuffle on the group key for the row_number
  window; the sort is per-group and spillable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hash60


def hash_split(
    df: DataFrame, key_col: str, val_permille: int = 100
) -> DataFrame:
    """Add a deterministic ``split`` column: 'val' for rows whose
    ``hash60(key) % 1000 < val_permille``, else 'train'.

    The standard reproducible train/val split: membership depends only on
    the key, so adding data never moves an existing document across
    splits. DuckDB twin:
    ``CASE WHEN ('0x'||substr(md5(key),1,15))::bigint % 1000 < p ...``.
    """
    bucket = hash60(F.col(key_col).cast("string")) % 1000
    return df.withColumn(
        "split", F.when(bucket < val_permille, "val").otherwise("train")
    )


def leakage_safe_split(
    documents: DataFrame,
    pairs: DataFrame,
    val_permille: int = 100,
) -> DataFrame:
    """Duplicate-cluster-aware train/val split: whole near-duplicate
    clusters land in ONE split, so a test document can never have a
    near-copy in train (the split-leakage failure mode document-keyed
    hashing cannot prevent — ``hash_split`` on doc_id happily sends two
    near-identical docs to opposite splits, inflating eval). ``pairs``
    is any (doc_a, doc_b) near-dup relation — MinHash LSH, SimHash,
    embedding or semantic pairs all compose. Docs in no pair are
    singleton clusters keyed by their own doc_id. The split rule is
    ``hash_split``'s md5 permille, keyed on cluster_id — adding data
    never moves an existing cluster across splits (components can only
    merge; a merge re-keys to the min id, which is the documented
    instability of ANY transitive-closure split under corpus growth).

    Scale shape: connected components over pairs (large-star/small-star,
    pair-participating docs only — usually ≪ corpus), then one join of
    the corpus keys against the component map (AQE broadcast when the
    dup fraction is small, shuffle otherwise) and a map-side md5.
    Output (doc_id, cluster_id, split).
    """
    from .graph import connected_components

    comp = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("cid")
    )
    bucket = hash60(F.col("cluster_id").cast("string")) % 1000
    return (
        documents.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cid"), F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn(
            "split",
            F.when(bucket < val_permille, "val").otherwise("train"),
        )
    )


def sample_per_group(
    df: DataFrame, group_col: str, key_col: str, n: int
) -> DataFrame:
    """Deterministic stratified sample: the ``n`` rows with smallest
    ``hash60(key)`` per group — a fixed-size per-stratum sample that is
    stable across runs and engines (ties on the hash break by key).

    One shuffle on ``group_col``; skewed strata cost a spillable sort,
    never memory.
    """
    h = hash60(F.col(key_col).cast("string"))
    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    )
    return df.withColumn("sample_rank", rn).filter(
        F.col("sample_rank") <= n
    )


def pack_sequences(
    documents: DataFrame, budget_tokens: int = 2048
) -> DataFrame:
    """Concat-then-chunk sequence packing: lay every document out on one
    global token tape (deterministic ``doc_id`` order), then cut the tape
    into fixed ``budget_tokens`` context windows. Returns ``(doc_id,
    n_tokens, pack_start, pack_id)`` where ``pack_start`` is the doc's
    global token offset and ``pack_id = pack_start // budget_tokens`` —
    the standard packing approximation LLM training pipelines use (a doc
    may straddle two adjacent packs; no pack stays under-filled).

    The global running sum is a two-phase distributed prefix sum, NOT a
    single-partition window: range-partition by doc_id, per-partition
    cumulative sums (window keyed on the partition id), then one
    exclusive-prefix pass over the per-partition totals — the driver only
    ever sees ``n_partitions`` rows, so the shape survives 100 TB.
    """
    from .text import BPE_REGEX

    spark = documents.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    sized = documents.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(BPE_REGEX))
        .cast("long")
        .alias("n_tokens"),
    )
    parted = (
        sized.repartitionByRange(n_parts, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    # range partitions hold contiguous doc_id spans in pid order, so the
    # global prefix sum decomposes exactly; partition bounds themselves
    # (sampled by the range partitioner) cannot change the output
    local = parted.withColumn(
        "local_end",
        F.sum("n_tokens").over(
            Window.partitionBy("pid")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    totals = (
        parted.groupBy("pid").agg(F.sum("n_tokens").alias("t")).collect()
    )
    sums = {r["pid"]: r["t"] for r in totals}
    offsets, acc = [], 0
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc += sums[pid]
    if not offsets:
        offsets = [(0, 0)]
    off_df = spark.createDataFrame(offsets, "pid int, offset long")
    return (
        local.join(F.broadcast(off_df), "pid")
        .withColumn(
            "pack_start", F.col("offset") + F.col("local_end") - F.col("n_tokens")
        )
        .withColumn(
            "pack_id", F.floor(F.col("pack_start") / F.lit(budget_tokens))
        )
        .select("doc_id", "n_tokens", "pack_start", "pack_id")
    )


def pack_batches_by_length(
    documents: DataFrame, batch_size: int = 32
) -> DataFrame:
    """Length-grouped batching (HF ``group_by_length`` / fairseq
    ``--required-batch-size-multiple`` shape): rank documents by token
    count DESCENDING (ties by doc_id), fill fixed ``batch_size``-doc
    batches in rank order, and report each document's padding waste
    against its batch maximum — the pad-efficiency audit of a training
    run (random batching pads every doc to the batch's longest; sorted
    batching makes neighbors similar lengths, so waste collapses).

    Returns (doc_id, n_tokens, batch_id, batch_max, pad_waste).

    The global rank is the pack_sequences two-phase prefix machinery
    re-keyed by length: range-partition on (n_tokens DESC, doc_id),
    per-partition row_number, then one exclusive-prefix pass over the
    n_partitions row COUNTS (driver sees n_partitions rows). batch_max
    rides a window keyed by batch_id — every batch is exactly
    ``batch_size`` rows, so no window partition ever exceeds it.

    ``sized`` is persisted before the range exchange: the ranged
    relation is evaluated THREE times (the range partitioner's sampling
    job, the per-partition counts collect, the output job), so a
    nondeterministic upstream — a ``sample()``, a changing source —
    could otherwise see different rows per job and emit wrong
    batch_ids. Same discipline as classifier_eval's identical
    two-phase rank."""
    from ..cache import track_persist
    from .text import BPE_REGEX

    spark = documents.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    sized = track_persist(
        documents.select(
            "doc_id",
            F.regexp_count(F.col("text"), F.lit(BPE_REGEX))
            .cast("long")
            .alias("n_tokens"),
        )
    )
    parted = (
        sized.repartitionByRange(
            n_parts, F.col("n_tokens").desc(), F.col("doc_id")
        )
        .sortWithinPartitions(F.col("n_tokens").desc(), F.col("doc_id"))
        .withColumn("pid", F.spark_partition_id())
    )
    local = parted.withColumn(
        "lrank",
        F.row_number().over(
            Window.partitionBy("pid").orderBy(
                F.col("n_tokens").desc(), F.col("doc_id")
            )
        ),
    )
    counts = parted.groupBy("pid").agg(F.count("*").alias("c")).collect()
    per = {r["pid"]: r["c"] for r in counts}
    offsets, acc = [], 0
    for pid in sorted(per):
        offsets.append((pid, acc))
        acc += per[pid]
    if not offsets:
        offsets = [(0, 0)]
    off_df = spark.createDataFrame(offsets, "pid int, offset long")
    ranked = local.join(F.broadcast(off_df), "pid").select(
        "doc_id",
        "n_tokens",
        F.floor((F.col("offset") + F.col("lrank") - 1) / F.lit(batch_size))
        .cast("long")
        .alias("batch_id"),
    )
    w = Window.partitionBy("batch_id")
    return ranked.select(
        "doc_id",
        "n_tokens",
        "batch_id",
        F.max("n_tokens").over(w).alias("batch_max"),
        (F.max("n_tokens").over(w) - F.col("n_tokens")).alias("pad_waste"),
    )


def mix_by_source(
    documents: DataFrame,
    fractions: dict,
    key: str = "source",
    default: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic data mixing: keep each document with its source's
    target sampling fraction — the per-domain reweighting step of a
    training-data recipe (downsample web crawl, keep books at 1.0, …).

    Keep decision is ``u01(doc_id) < fraction[source]`` where u01 is the
    md5-derived 60-bit hash scaled to [0, 1) — reproducible across runs,
    engines, and partitionings (no RNG state), and INDEPENDENT of the
    split/sample hashes via the salt. Map-only: the fraction map is a
    literal expression, zero shuffles, fully pushdown-friendly.
    """
    mapping = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )
    u01 = hash60(
        F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))
    ) / F.lit(float(2**60))
    frac = F.coalesce(mapping[F.col(key)], F.lit(float(default)))
    return documents.filter(u01 < frac)


def temperature_rates(
    documents: DataFrame,
    alpha: float = 0.5,
    budget_docs: int | None = None,
    key: str = "source",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Per-source keep rates for temperature-scaled mixing (the
    XLM/mT5 recipe): sample sources proportional to p_s^alpha so
    low-resource sources are up-weighted relative to their share
    (alpha=1 keeps the natural distribution, alpha->0 approaches
    uniform). ``budget_docs`` is the target output size (defaults to the
    corpus size — pure REBALANCING at constant volume); the keep rate is
    ``min(1, budget·q_s / n_s)`` with q_s the temperature-scaled share.

    Scale shape: one tiny per-source aggregation (sources are dozens,
    not corpus-sized). Determinism: ``pow`` is NOT correctly rounded in
    libm, so the raw weight may differ between engines in the last ulp;
    w is therefore snapped to 12 decimals (the logprob discipline —
    ties at the 12th decimal of an irrational power are measure-zero)
    before the exact decimal(30,15) normalization sum, making q and
    rate fixed-order double math over engine-identical inputs.

    Returns (source, n_docs, q, rate) — q the temperature-scaled target
    share, rate the per-document keep probability. Pass ``counts``
    (source, n_docs) to derive rates from a PERSISTED count catalog
    instead of scanning ``documents`` — the incremental-pipeline path,
    where per-source counts are metadata-plane state updated per run.

    The corpus-total and weight-sum folds run as whole-relation windows
    over the sources-sized count table, not as scalar crossJoins back
    onto it: each crossJoin re-evaluated the count subtree (and with it
    the corpus scan) per reference, so a single rates derivation cost
    4 corpus passes where 1 suffices. Sums of longs and of
    decimal(30,15) are exact and order-independent, so the window forms
    are bit-identical to the old aggregate+crossJoin forms.
    """
    if counts is None:
        counts = documents.groupBy(F.col(key).alias("source")).agg(
            F.count("*").cast("long").alias("n_docs")
        )
    else:
        counts = counts.select(
            F.col("source"), F.col("n_docs").cast("long").alias("n_docs")
        )
    whole = Window.partitionBy()
    w = F.round(
        F.pow(F.col("n_docs") / F.col("n_total"), F.lit(float(alpha))), 12
    )
    weighted = counts.withColumn(
        "n_total", F.sum("n_docs").over(whole)
    ).withColumn("w", w)
    budget = F.lit(float(budget_docs)) if budget_docs else F.col("n_total")
    return (
        weighted.withColumn(
            "w_sum", F.sum(F.col("w").cast("decimal(30,15)")).over(whole)
        )
        .withColumn("q", F.col("w") / F.col("w_sum").cast("double"))
        .withColumn(
            "rate",
            F.least(F.lit(1.0), budget * F.col("q") / F.col("n_docs")),
        )
        .select("source", "n_docs", "q", "rate")
    )


def temperature_mix(
    documents: DataFrame,
    alpha: float = 0.5,
    budget_docs: int | None = None,
    key: str = "source",
    salt: str = "tmix",
    counts: DataFrame | None = None,
    rates: DataFrame | None = None,
) -> DataFrame:
    """Apply ``temperature_rates`` deterministically: keep a document
    when its salted md5 u01 falls under its source's rate — the same
    RNG-free keep rule as ``mix_by_source``, with the fractions DERIVED
    from the corpus instead of supplied. The rate table is broadcast
    (source-count-sized); the filter is map-side. ``counts`` routes the
    rate derivation to a persisted count catalog (incremental mode);
    because the keep rule is deterministic and stateless given rates,
    re-applying the mix after a catalog update is a cheap idempotent
    filter — no document reprocessing. Pass ``rates`` (a
    ``temperature_rates`` output) when the caller already derived it —
    referencing one shared plan instead of re-deriving keeps the rate
    subtree (and its corpus scan) single-evaluation."""
    if rates is None:
        rates = temperature_rates(
            documents, alpha, budget_docs, key, counts=counts
        )
    u01 = hash60(
        F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))
    ) / F.lit(float(2**60))
    return (
        documents.join(
            F.broadcast(rates.select(F.col("source").alias(key), "rate")), key
        )
        .filter(u01 < F.col("rate"))
        .drop("rate")
    )


def temperature_mix_by_tokens(
    documents: DataFrame,
    alpha: float = 0.5,
    budget_tokens: int | None = None,
    key: str = "source",
    salt: str = "tmix",
) -> DataFrame:
    """Temperature mixing with shares and budget measured in TOKENS —
    the unit training mixtures are actually specified in (a source of
    few huge documents should not outweigh one of many small ones).
    Derives per-source token mass with the whitespace tokenizer and
    routes it through ``temperature_rates``' count-catalog path; the
    md5 keep rule still decides whole documents, and because u01 is
    independent of document length the EXPECTED kept token mass per
    source is budget·q_s (asserted in pytest). One extra corpus-scan
    aggregation (map-side token counting, partial-agg shuffle on the
    source key)."""
    from ..functions import tokens

    mass = (
        documents.select(key, F.size(tokens(F.col("text"))).alias("tk"))
        .groupBy(F.col(key).alias("source"))
        .agg(F.sum("tk").cast("long").alias("n_docs"))
    )
    return temperature_mix(
        documents, alpha, budget_tokens, key, salt, counts=mass
    )


def dsir_resample(
    documents: DataFrame,
    target: DataFrame,
    n_out: int = None,
    keep_fraction: float = None,
    n_buckets: int = 8192,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-shaped importance resampling (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): estimate
    per-document importance weights w(x) = p_target(x)/p_raw(x) under
    hashed-n-gram bag models, then resample via Gumbel top-k.

    - Features: unigrams + bigrams of the normalized token stream (with
      multiplicity — bag models), hashed into ``n_buckets`` via the
      engine-portable ``hash60``.
    - Models: add-``alpha``-smoothed bucket categoricals for the target
      set and the raw corpus; a document's log-weight is the sum of its
      features' bucket log-ratios (per-term round-12 -> exact
      decimal(30,15) sums — the logprob discipline, so weights are
      partition-invariant and engine-exact).
    - Resampling: score = log_weight + Gumbel noise derived
      DETERMINISTICALLY from md5(doc_id) (round-12 snapped), so the
      Gumbel-top-k sample — the importance-resampling step — is
      reproducible on any engine. Exactly one of ``n_out`` (exact
      top-k) / ``keep_fraction`` (histogram-sketch score cut) selects.

    Scale shape: the corpus is scanned twice (one pass builds BOTH
    bucket count tables — the target flag rides a broadcast join with
    the small target id set, DSIR's defining asymmetry — and one pass
    scores); the only shuffles are the n_buckets-sized count
    aggregation and the doc_id-keyed weight sum. The log-ratio table
    (n_buckets rows) broadcasts. ``n_out`` ranking is hierarchical —
    a 32-way local prune caps the global sort input at 32*n_out rows,
    the serving shape for sample-sized n_out; for corpus-sized
    selections pass ``keep_fraction``, which replaces the global sort
    with the ccnet_buckets histogram-sketch cut (bounded state, two
    tiny shuffles, no global window).

    Output (n_out): (doc_id, log_weight, score, rank) of the selected
    documents. Output (keep_fraction): (doc_id, log_weight, score) of
    documents at or above the sketch cut.
    """
    from ..functions import tokens

    if (n_out is None) == (keep_fraction is None):
        raise ValueError("pass exactly one of n_out / keep_fraction")
    B = int(n_buckets)

    # materialize the token array behind a projection boundary FIRST: an
    # expression captured inside a transform() lambda re-evaluates per
    # element, so slicing `tokens(text)` directly would re-run the
    # regexp+split pipeline once per bigram — quadratic per doc
    # (measured: 15.4s -> ~2s at sf0.1)
    tokdf = documents.select("doc_id", tokens(F.col("text")).alias("t"))
    t = F.col("t")
    n = F.size(t)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(t, i, 2)),
        ),
    ).otherwise(F.array_except(t, t))
    # explode_OUTER so a zero-token document keeps one (doc_id, null)
    # row: the scoring pass can then cover every document without the
    # former documents-vs-perdoc restore join — a corpus-vs-corpus
    # SortMergeJoin whose only purpose was re-adding empty docs.
    # hash60/pmod null-propagate, so the sentinel row carries a null
    # bucket; the model build filters it out below.
    feats_all = tokdf.select(
        "doc_id", F.explode_outer(F.concat(t, bigrams)).alias("feat")
    ).select("doc_id", F.pmod(hash60(F.col("feat")), F.lit(B)).alias("bucket"))
    feats = feats_all.filter(F.col("bucket").isNotNull())

    tgt_ids = target.select("doc_id").distinct().withColumn(
        "is_t", F.lit(1)
    )
    # persist: the n_buckets-sized count table feeds BOTH the totals agg
    # and the log-ratio projection — without it each branch re-runs the
    # corpus explode + count shuffle (measured 15.8s -> 5.5s at sf0.1)
    from ..cache import track_persist

    counts = track_persist(
        feats.join(F.broadcast(tgt_ids), "doc_id", "left")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("cr"),
            F.sum(F.coalesce(F.col("is_t"), F.lit(0)))
            .cast("long")
            .alias("ct"),
        )
    )
    tots = counts.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    a = F.lit(float(alpha))
    aB = F.lit(float(alpha) * B)
    dec = "decimal(30,15)"
    lr = (
        counts.crossJoin(F.broadcast(tots))
        .select(
            "bucket",
            (
                F.round(F.log((F.col("ct") + a) / (F.col("nt") + aB)), 12)
                .cast(dec)
                - F.round(F.log((F.col("cr") + a) / (F.col("nr") + aB)), 12)
                .cast(dec)
            ).alias("w"),
        )
    )
    # LEFT join over the outer-exploded relation: a real bucket always
    # matches lr (lr covers every bucket the corpus produced), and the
    # empty-doc sentinel's null bucket contributes a null w that the
    # sum skips — logw comes out null and the coalesce below snaps it
    # to 0.0, exactly the value the old restore join produced
    perdoc = (
        feats_all.join(F.broadcast(lr), "bucket", "left")
        .groupBy("doc_id")
        .agg(F.sum("w").alias("logw"))
    )
    u = (
        F.pmod(
            hash60(F.concat(F.lit("dsir:"), F.col("doc_id").cast("string"))),
            F.lit(1000000007),
        )
        + 1
    ) / F.lit(1000000008.0)
    g = F.round(-F.log(-F.log(u)), 12)
    scored = (
        perdoc
        .select(
            "doc_id",
            F.round(
                F.coalesce(F.col("logw").cast("double"), F.lit(0.0)).cast(
                    "decimal(30,10)"
                ),
                6,
            )
            .cast("double")
            .alias("log_weight"),
            F.round(
                (
                    F.coalesce(F.col("logw").cast("double"), F.lit(0.0)) + g
                ).cast("decimal(30,10)"),
                6,
            )
            .cast("double")
            .alias("score"),
        )
    )
    if keep_fraction is not None:
        from .sketches import histogram_group_quantiles

        # persist: the scored relation feeds the histogram cut twice
        # (value-range agg + bucketed count join) AND the final filter —
        # without it the tokenize/explode/per-doc-weight pipeline above
        # re-runs three times
        scored = track_persist(scored)
        cut = histogram_group_quantiles(
            scored.withColumn("one", F.lit(1)),
            "one",
            "score",
            [(1.0 - float(keep_fraction), "cut")],
        ).select("cut")
        return scored.crossJoin(F.broadcast(cut)).filter(
            F.col("score") >= F.col("cut")
        ).select("doc_id", "log_weight", "score")
    w_local = Window.partitionBy(F.pmod(F.col("doc_id"), F.lit(32))).orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    w_global = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("lr", F.row_number().over(w_local))
        .filter(F.col("lr") <= int(n_out))
        .withColumn("rank", F.row_number().over(w_global).cast("long"))
        .filter(F.col("rank") <= int(n_out))
        .select("doc_id", "log_weight", "score", "rank")
    )
