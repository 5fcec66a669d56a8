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
    """
    if counts is None:
        counts = documents.groupBy(F.col(key).alias("source")).agg(
            F.count("*").cast("long").alias("n_docs")
        )
    else:
        counts = counts.select(
            F.col("source"), F.col("n_docs").cast("long").alias("n_docs")
        )
    total = counts.agg(F.sum("n_docs").alias("n_total"))
    w = F.round(
        F.pow(F.col("n_docs") / F.col("n_total"), F.lit(float(alpha))), 12
    )
    weighted = counts.crossJoin(F.broadcast(total)).withColumn("w", w)
    wsum = weighted.agg(F.sum(F.col("w").cast("decimal(30,15)")).alias("w_sum"))
    budget = F.lit(float(budget_docs)) if budget_docs else F.col("n_total")
    return (
        weighted.crossJoin(F.broadcast(wsum))
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
) -> DataFrame:
    """Apply ``temperature_rates`` deterministically: keep a document
    when its salted md5 u01 falls under its source's rate — the same
    RNG-free keep rule as ``mix_by_source``, with the fractions DERIVED
    from the corpus instead of supplied. The rate table is broadcast
    (source-count-sized); the filter is map-side. ``counts`` routes the
    rate derivation to a persisted count catalog (incremental mode);
    because the keep rule is deterministic and stateless given rates,
    re-applying the mix after a catalog update is a cheap idempotent
    filter — no document reprocessing."""
    rates = temperature_rates(documents, alpha, budget_docs, key, counts=counts)
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
