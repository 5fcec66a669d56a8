"""Write-path endpoints for the training-data pipeline.

The reference is a read-only source (SURVEY §2.2: no write path in its
tree); these sinks complete the loop the way a 100 TB pipeline actually
ends: a deduplicated corpus written back out, and a metadata report
materialized for fleet-wide scans. Everything is ``df.write`` — Spark's
committer handles atomicity, partitioned layout and parallel output, so
there is nothing hand-rolled to break at scale. See also
``bucketing.write_bucketed`` for the bucketed-table sink used by the
zero-Exchange join demo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.api import read_metadata
from .dedup import exact_duplicates


def _with_blooms(writer, bloom_columns):
    """Enable parquet split-block bloom filters for the given columns —
    readable back via ``operators.reports.bloom_probe`` (point-lookup
    file skipping without data reads)."""
    for c in bloom_columns or ():
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    return writer


def write_deduplicated(
    documents: DataFrame,
    out_path: str,
    partition_by: str | None = None,
    mode: str = "error",
    bloom_columns: list | None = None,
) -> None:
    """Write ``documents`` with exact duplicates removed (keeping the
    smallest doc_id of each group).

    Plan shape: the duplicate set is (n_groups ≤ n_docs) fingerprints —
    usually a small fraction of the corpus — joined back as a LEFT ANTI
    on doc_id. Both sides shuffle on doc_id once; at 100 TB the anti
    join's right side is only the *dropped* ids, which AQE broadcasts
    when small. The writer then streams partitions straight to files —
    no collect, no coalesce bottleneck.
    """
    drops = (
        exact_duplicates(documents)
        .select(F.explode("doc_ids").alias("doc_id"), F.col("keep_doc_id"))
        .filter(F.col("doc_id") != F.col("keep_doc_id"))
        .select("doc_id")
    )
    kept = documents.join(drops, "doc_id", "left_anti")
    writer = _with_blooms(kept.write.mode(mode), bloom_columns)
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(out_path)


def write_zordered(
    df: DataFrame,
    out_path: str,
    cols: list,
    bits: int = 8,
    num_files: int = 16,
    mode: str = "error",
    bloom_columns: list | None = None,
) -> None:
    """Write ``df`` interleaved on a Z-order (Morton) curve over ``cols``
    so range predicates on ANY of the columns prune files/row groups —
    the multi-dimensional answer to single-column sorting (verify with
    ``reports.rowgroup_overlap_report``: after z-ordering, every z column
    shows shrunken per-file min/max ranges instead of one sorted column
    pruning and the rest scanning everything).

    Each column is quantized to ``2^bits`` uniform buckets between its
    min and max (one tiny driver-side agg for the bounds — the only
    non-distributed step, returning 2×len(cols) scalars), the bucket ids'
    bits are interleaved into the z-value with pure codegen shift/or
    expressions, and the rows are range-partitioned + sorted by z —
    ``repartitionByRange`` samples z to build balanced file splits, so
    skew in the original columns becomes at worst bucket-granularity
    imbalance. Uniform (not quantile) buckets keep the transform
    stateless; heavily skewed columns want a rank transform first.
    """
    if not cols or len(cols) < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    # the interleaved z-value must fit a signed long: JVM shift counts wrap
    # mod 64, so bits*len(cols) > 63 would silently fold high bits onto low
    # ones and destroy the clustering. Clamp to the widest per-column width
    # that fits (raise only when even 1 bit/column doesn't).
    max_bits = 63 // len(cols)
    if max_bits < 1:
        raise ValueError(
            f"z-ordering {len(cols)} columns cannot fit a 64-bit z-value; "
            "use at most 63 columns"
        )
    if bits > max_bits:
        import warnings

        warnings.warn(
            f"z-order bits clamped {bits}->{max_bits} so "
            f"{len(cols)} columns fit a 63-bit z-value",
            stacklevel=2,
        )
    bits = min(bits, max_bits)
    bounds = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).first()
    n_buckets = 1 << bits
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        bucket = (
            F.when(F.lit(mx) == F.lit(mn), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor(
                        (F.col(c) - F.lit(mn))
                        / ((F.lit(mx) - F.lit(mn)) / F.lit(n_buckets))
                    ),
                )
            )
            .cast("long")
        )
        for b in range(bits):
            bit = F.shiftright(bucket, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    _with_blooms(
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode),
        bloom_columns,
    ).parquet(out_path)


def compact_dataset(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    mode: str = "error",
    bloom_columns: list | None = None,
) -> int:
    """Rewrite a small-files dataset into ~``target_file_bytes`` outputs.

    The file count comes from the dataset's OWN metadata (one footer-level
    scan sums real on-disk bytes — no data read to size the job), then a
    single ``repartition(n)`` round-robins rows into n uniform files.
    Returns n. The everyday fix for streaming sinks' small-files problem:
    10^5 kilobyte-files → reader-friendly few-hundred-MB files, with
    listing cost and per-file open overhead collapsing accordingly.
    """
    total = (
        read_metadata(spark, in_path, source="file", level="file")
        .agg(F.sum("size"))
        .first()[0]
        or 0
    )
    n = max(1, -(-total // target_file_bytes))  # ceil
    writer = _with_blooms(
        spark.read.parquet(in_path).repartition(n).write.mode(mode), bloom_columns
    )
    writer.parquet(out_path)
    return n


def _tape_offsets(toks: DataFrame) -> DataFrame:
    """Global token offsets for a (doc_id, n_bpe_tokens, bpe_tokens)
    relation — the pack_sequences two-phase distributed prefix sum
    (range-partition by doc_id, per-partition window, one exclusive
    pass over the n_partitions totals). Returns (doc_id, bpe_tokens,
    doc_start). Shared by the base export and the incremental export
    (which adds the committed tape length to every offset)."""
    from pyspark.sql import Window

    spark = toks.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parted = (
        toks.repartitionByRange(n_parts, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    local = parted.withColumn(
        "local_end",
        F.sum("n_bpe_tokens").over(
            Window.partitionBy("pid")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    totals = parted.groupBy("pid").agg(
        F.sum("n_bpe_tokens").alias("t")
    ).collect()
    sums = {r["pid"]: r["t"] for r in totals}
    offsets, acc = [], 0
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc += sums[pid] or 0
    if not offsets:
        offsets = [(0, 0)]
    off_df = spark.createDataFrame(offsets, "pid int, offset long")
    return local.join(F.broadcast(off_df), "pid").select(
        "doc_id",
        "bpe_tokens",
        (F.col("offset") + F.col("local_end") - F.col("n_bpe_tokens")).alias(
            "doc_start"
        ),
    )


def _assemble_windows(stream: DataFrame, budget_tokens: int) -> DataFrame:
    """Cut a (pos, token_id) token stream into exact
    ``budget_tokens``-id windows: (window_id, token_ids, n_tokens).
    The one honest token-granularity regroup — uniform keys (every
    window holds exactly budget_tokens ids), no skew surface."""
    return (
        stream.select(
            F.floor(F.col("pos") / F.lit(budget_tokens)).alias("window_id"),
            "pos",
            "token_id",
        )
        .groupBy("window_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token_id"))),
                lambda x: x["token_id"],
            ).alias("token_ids")
        )
        .select(
            "window_id",
            "token_ids",
            F.size("token_ids").cast("long").alias("n_tokens"),
        )
    )


def export_training_windows(
    documents: DataFrame,
    merges_df: DataFrame,
    out_path: str,
    budget_tokens: int = 2048,
    shard_max_windows: int = 100_000,
    mode: str = "error",
    shuffle_seed: str = None,
) -> dict:
    """The pipeline's LAST step: materialize trainer-ready context
    windows — BPE-encode the corpus, lay every document's token ids on
    the global doc_id-ordered tape (pack_sequences semantics: documents
    straddle window boundaries, no window is under-filled), cut the
    tape into exact ``budget_tokens``-id windows, and write them as
    size-capped parquet shards plus a (token, id) vocab sidecar. The
    output is the tensor-shaped table a training loader consumes:
    ``(window_id, token_ids array<int>, n_tokens)``.

    Scale shape, honestly: this is the one operator that MUST shuffle
    at token granularity — assembling windows that cross document
    boundaries regroups ~|corpus tokens| rows by window_id. The keys
    are perfectly uniform (every window holds exactly budget_tokens
    ids) so there is no skew surface, partial aggregation is
    inapplicable by nature (the payload IS the data), and everything
    before the regroup is the vocab-sized BPE machinery + one
    broadcast id join. The vocab id table is ranked with a global
    window over the DISTINCT token set — vocab-sized by construction
    (bounded by the merge table, not the corpus), stated here because
    a single-reducer sort is only acceptable at that size.

    Returns {"windows", "tokens", "vocab_size", "out_path"}."""
    from pyspark.sql import Window

    from .text import bpe_tokenize_words

    spark = documents.sparkSession
    toks = bpe_tokenize_words(documents, merges_df, with_tokens=True).select(
        "doc_id", "n_bpe_tokens", "bpe_tokens"
    )
    toks.persist()

    # global token offsets: the pack_sequences two-phase prefix sum
    placed = _tape_offsets(toks)

    # deterministic vocab ids: rank over the distinct token set
    # (vocab-sized — see docstring)
    vocab = (
        toks.select(F.explode("bpe_tokens").alias("token"))
        .distinct()
        .select(
            "token",
            (
                F.row_number().over(Window.orderBy("token")) - 1
            ).alias("token_id"),
        )
    )
    vocab.persist()
    vocab_size = vocab.count()

    stream = placed.select(
        F.posexplode("bpe_tokens").alias("idx", "token"),
        (F.col("doc_start") + F.col("idx")).alias("pos"),
    ).join(F.broadcast(vocab), "token")
    windows = _assemble_windows(stream, budget_tokens)
    assembled = None
    if shuffle_seed is not None:
        # pre-shuffle the tape at rest (see shuffle_training_windows);
        # the key column is dropped but the PERMUTATION persists as the
        # written row/shard order a filename-ordered loader streams.
        # Persist first: repartitionByRange runs a range-bound SAMPLING
        # job before the real exchange, and without the persist that
        # sampling pass would recompute the whole BPE/posexplode/groupBy
        # window assembly a second time — doubling the most expensive
        # stage of the export (r10 ADVICE)
        assembled = windows.persist()
        windows = shuffle_training_windows(assembled, shuffle_seed).drop(
            "shuffle_key"
        )
    # write order IS the commit protocol: the merges and vocab sidecars
    # land first, windows next — windows/_SUCCESS is the export's
    # commit marker, so a crash between the writes leaves no
    # readable-but-torn export; the versioned tape STATE (the
    # incremental-export lineage, see export_training_windows_increment)
    # lands last and its CURRENT pointer flips atomically
    merges_df.write.mode(mode).parquet(f"{out_path}/merges")
    vocab.write.mode(mode).parquet(f"{out_path}/vocab")
    (
        windows.write.mode(mode)
        .option("maxRecordsPerFile", int(shard_max_windows))
        .parquet(f"{out_path}/windows")
    )
    out = spark.read.parquet(f"{out_path}/windows")
    n_windows = out.count()
    n_tokens = out.agg(F.sum("n_tokens")).collect()[0][0] or 0
    _write_tape_state(
        documents.agg(F.max("doc_id").alias("max_doc_id")).select(
            F.lit(int(budget_tokens)).cast("long").alias("budget_tokens"),
            F.lit(int(n_tokens)).cast("long").alias("total_tokens"),
            F.lit(int(n_windows)).cast("long").alias("n_windows"),
            "max_doc_id",
            F.lit(int(vocab_size)).cast("long").alias("vocab_size"),
            F.lit(-1).cast("long").alias("rewritten_window_id"),
        ),
        out_path,
        version=1,
        batch_id="base",
    )
    toks.unpersist()
    vocab.unpersist()
    if assembled is not None:
        assembled.unpersist()
    return {
        "windows": int(n_windows),
        "tokens": int(n_tokens),
        "vocab_size": int(vocab_size),
        "out_path": out_path,
    }


def _write_tape_state(
    manifest: DataFrame, export_path: str, version: int, batch_id: str
) -> None:
    """Commit tape-state version v: write manifest + BATCH marker under
    ``state/v=<v>``, then flip ``state/CURRENT`` atomically — the
    stream_corpus_manifest versioned-state protocol. A crash before the
    flip leaves the new version invisible; a retry overwrites it."""
    import os

    vdir = os.path.join(export_path, "state", f"v={version}")
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(vdir, "manifest")
    )
    from .lakefs import for_path

    lake, sd = for_path(os.path.join(export_path, "state"))
    lake.write_text(f"{sd}/v={version}/BATCH", str(batch_id))
    # atomic publish through the shim (temp+move on POSIX, atomic PUT
    # on object stores)
    lake.write_text(f"{sd}/CURRENT", str(version))


def _read_tape_state(spark, export_path: str):
    """(manifest Row, version) of the committed tape state; raises on a
    pre-state export (rebuilt bases always write v=1)."""
    import os

    from .lakefs import for_path

    lake, ep = for_path(export_path)
    cur = f"{ep}/state/CURRENT"
    if not lake.exists(cur):
        raise ValueError(
            "export_training_windows_increment: no tape state under "
            f"{export_path}/state — the base export predates the "
            "incremental protocol; re-run export_training_windows."
        )
    v = int(lake.read_text(cur).strip())
    row = spark.read.parquet(
        os.path.join(export_path, "state", f"v={v}", "manifest")
    ).collect()[0]
    return row, v


def _tape_batch_committed(export_path: str, version: int, batch_id: str):
    """True if ``batch_id`` was committed by any state version ≤
    ``version`` (idempotent-replay check; n_increments file reads)."""
    from .lakefs import for_path

    lake, ep = for_path(export_path)
    for i in range(1, version + 1):
        p = f"{ep}/state/v={i}/BATCH"
        if lake.exists(p) and lake.read_text(p).strip() == str(batch_id):
            return True
    return False


def read_training_vocab(spark, export_path: str, upto: int = None):
    """The committed (token, token_id) table: base vocab plus every
    committed increment's delta. Ids are export-lineage-specific (an
    increment appends NEW tokens at ids ≥ the prior vocab_size); the
    sidecar is the source of truth for decoding either way."""
    import os

    if upto is None:
        _m, upto = _read_tape_state(spark, export_path)
    vocab = spark.read.parquet(f"{export_path}/vocab")
    for i in range(2, upto + 1):
        d = os.path.join(export_path, "state", f"v={i}", "vocab_delta")
        if os.path.exists(d):
            vocab = vocab.unionByName(spark.read.parquet(d))
    return vocab


def read_training_tape(spark, export_path: str):
    """The committed window table across base + increments, with
    superseded tail windows resolved: each increment that extended a
    PARTIAL tail window re-emits that window_id in full, so the reader
    drops the stale copy from every earlier version (driver state is
    one (version, window_id) pair per increment — bounded by increment
    count, never by corpus). Returns (windows_df, vocab_df)."""
    import os

    _m, v = _read_tape_state(spark, export_path)
    # rewritten_window_id per version (tiny manifests, driver-side)
    rewritten = []  # (version, window_id)
    for i in range(2, v + 1):
        row = spark.read.parquet(
            os.path.join(export_path, "state", f"v={i}", "manifest")
        ).collect()[0]
        if row["rewritten_window_id"] is not None and int(
            row["rewritten_window_id"]
        ) >= 0:
            rewritten.append((i, int(row["rewritten_window_id"])))

    def _frame(df, version):
        stale = [wid for (j, wid) in rewritten if j > version]
        if stale:
            df = df.filter(~F.col("window_id").isin(stale))
        return df

    windows = _frame(spark.read.parquet(f"{export_path}/windows"), 1)
    for i in range(2, v + 1):
        windows = windows.unionByName(
            _frame(
                spark.read.parquet(
                    os.path.join(export_path, "state", f"v={i}", "windows")
                ),
                i,
            )
        )
    return windows, read_training_vocab(spark, export_path, upto=v)


def export_training_windows_increment(
    new_documents: DataFrame, export_path: str, batch_id: str = None
) -> dict:
    """CDC for the training-tape export: fold a batch of ARRIVALS into
    an existing export, touching ONLY the new bytes — the
    ``corpus_manifest_increment`` discipline applied to the pipeline's
    terminal sink. Arrivals are BPE-encoded with the export's FROZEN
    merge table (so the symbol stream of any document is identical to
    what the base export would have produced), placed on the tape
    after the committed ``total_tokens``, and cut into windows with
    the shared assembly. If the committed tape ends in a PARTIAL
    window, that one window (a single row) is read back, its ids
    prepended at their original positions, and the window re-emitted
    in full — versioned supersession, resolved by
    ``read_training_tape``; history is never rewritten beyond that row.

    Contracts: arrivals-only with STRICTLY INCREASING doc_ids
    (min(new doc_id) > committed max — the tape is doc_id-ordered, so
    out-of-order arrivals would belong in the middle of history;
    raises otherwise); new tokens get vocab ids appended at
    ``vocab_size + rank(token)`` (a vocab-sized window, the base
    export's own bound), so ids are lineage-specific while the DECODED
    symbol tape equals the batch export on the union EXACTLY
    (pytest-asserted). Replays are idempotent via ``batch_id`` (an
    already-committed id is a no-op); a crash before the CURRENT flip
    leaves the increment invisible and the retry overwrites it.

    Scale shape: one arrivals-sized encode + prefix sum + window
    regroup, one vocab-sized anti-join/rank, ONE history row read.
    A 100 TB tape absorbs a 1 GB day of arrivals for the cost of the
    1 GB, not the 100 TB."""
    import os
    import uuid

    from .text import bpe_tokenize_words

    spark = new_documents.sparkSession
    manifest, v = _read_tape_state(spark, export_path)
    if batch_id is None:
        batch_id = uuid.uuid4().hex
    if _tape_batch_committed(export_path, v, batch_id):
        return {"committed": False, "version": v, "out_path": export_path}
    budget = int(manifest["budget_tokens"])
    total = int(manifest["total_tokens"])
    vocab_size = int(manifest["vocab_size"])

    mn = new_documents.agg(F.min("doc_id").alias("m")).collect()[0]["m"]
    if mn is None:
        return {"committed": False, "version": v, "out_path": export_path}
    if not (mn > manifest["max_doc_id"]):
        raise ValueError(
            "export_training_windows_increment: arrivals must have "
            f"strictly increasing doc_ids (min arrival {mn!r} <= "
            f"committed max {manifest['max_doc_id']!r}) — the tape is "
            "doc_id-ordered and history is immutable."
        )

    merges_df = spark.read.parquet(f"{export_path}/merges")
    toks = bpe_tokenize_words(
        new_documents, merges_df, with_tokens=True
    ).select("doc_id", "n_bpe_tokens", "bpe_tokens")
    toks.persist()

    # vocab delta: new distinct tokens at ids >= vocab_size, token-asc
    from pyspark.sql import Window

    existing = read_training_vocab(spark, export_path, upto=v)
    new_tokens = (
        toks.select(F.explode("bpe_tokens").alias("token"))
        .distinct()
        .join(existing.select("token"), "token", "left_anti")
        .select(
            "token",
            (
                F.row_number().over(Window.orderBy("token"))
                - 1
                + F.lit(vocab_size)
            ).alias("token_id"),
        )
    )
    new_tokens.persist()
    try:
        placed = _tape_offsets(toks).withColumn(
            "doc_start", F.col("doc_start") + F.lit(total)
        )
        n_new_tokens = new_tokens.count()
        vocab_all = existing.unionByName(new_tokens)

        stream = placed.select(
            F.posexplode("bpe_tokens").alias("idx", "token"),
            (F.col("doc_start") + F.col("idx")).alias("pos"),
        ).join(F.broadcast(vocab_all), "token").select("pos", "token_id")

        rewritten_id = -1
        tail_len = total % budget
        if tail_len:
            rewritten_id = total // budget
            committed_windows, _vocab = read_training_tape(
                spark, export_path
            )
            tail = committed_windows.filter(
                F.col("window_id") == rewritten_id
            ).select(
                F.posexplode("token_ids").alias("idx", "token_id"),
                (F.lit(rewritten_id * budget) + F.col("idx")).alias("pos"),
            ).select("pos", "token_id")
            stream = stream.unionByName(tail)

        windows = _assemble_windows(stream, budget)
        vdir = os.path.join(export_path, "state", f"v={v + 1}")
        windows.write.mode("overwrite").parquet(
            os.path.join(vdir, "windows")
        )
        if n_new_tokens:
            new_tokens.write.mode("overwrite").parquet(
                os.path.join(vdir, "vocab_delta")
            )
        new_total = total + int(
            toks.agg(F.sum("n_bpe_tokens")).collect()[0][0] or 0
        )
        new_manifest = new_documents.agg(
            F.max("doc_id").alias("max_doc_id")
        ).select(
            F.lit(budget).cast("long").alias("budget_tokens"),
            F.lit(new_total).cast("long").alias("total_tokens"),
            F.lit((new_total + budget - 1) // budget)
            .cast("long")
            .alias("n_windows"),
            "max_doc_id",
            F.lit(vocab_size + n_new_tokens).cast("long").alias(
                "vocab_size"
            ),
            F.lit(rewritten_id).cast("long").alias("rewritten_window_id"),
        )
        _write_tape_state(new_manifest, export_path, v + 1, batch_id)
    finally:
        toks.unpersist()
        new_tokens.unpersist()
    return {
        "committed": True,
        "version": v + 1,
        "tokens": new_total,
        "vocab_size": vocab_size + n_new_tokens,
        "out_path": export_path,
    }


def shuffle_training_windows(
    windows: DataFrame, seed: str = "shuf", id_col: str = "window_id"
) -> DataFrame:
    """Deterministic seeded GLOBAL shuffle of the exported window tape —
    the step between ``export_training_windows`` and a training loader.
    Loaders stream shards in filename order, so the mixing a training
    run needs must exist AT REST: adjacent windows on the written tape
    must come from far-apart documents, and re-shuffling 100 TB at load
    time is exactly the thing a loader cannot do.

    The shuffle key is ``hash60(seed || ':' || window_id)`` with the
    window_id itself as the tie-break, so the permutation is a pure
    function of (seed, window ids): the same seed reproduces the same
    order on any cluster, any partitioning, any round — the
    reproducibility contract training runs require — and a new seed is
    a fresh epoch-order for multi-epoch training.

    Scale shape: one range-partitioning exchange on the uniform 60-bit
    key (range bounds from Spark's sampling; keys are hashes, so ranges
    balance by construction — no skew surface) + a per-partition sort.
    No window function, no single reducer. Write the result with
    ordered part files (the default writer preserves partition index
    order) and the at-rest tape IS the shuffled stream."""
    from ..functions import hash60

    key = hash60(
        F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string"))
    )
    return (
        windows.withColumn("shuffle_key", key)
        .repartitionByRange("shuffle_key", id_col)
        .sortWithinPartitions("shuffle_key", id_col)
    )


def export_training_epochs(
    spark,
    export_path: str,
    seeds,
    out_path: str = None,
    shard_max_windows: int = 100_000,
    mode: str = "error",
    single_pass: bool = True,
) -> dict:
    """Write one pre-shuffled epoch tree per seed from an EXISTING
    ``export_training_windows`` export — the multi-epoch trainer layout
    (``out/epoch=<seed>/``). The expensive work (BPE encode, the
    token-granularity tape regroup) happened once in the export; each
    epoch costs only a range exchange + write over the finished window
    table. Every epoch holds the SAME window set in a different
    deterministic order (the ``shuffle_training_windows`` contract).

    ``single_pass`` (the default) reads the window table ONCE and emits
    all K epoch trees from one K×-replicated range exchange
    (broadcast-join the seed list, key each copy by the IDENTICAL
    ``hash60(seed || ':' || window_id)`` the per-seed path uses, range
    partition by (epoch, key), dynamic-partition write by epoch): at
    100 TB the source read dominates, so one read + K-way write beats
    K reads + K writes — the shuffled bytes are K× either way. Each
    epoch's at-rest tape is bit-identical to the per-seed path's (same
    total (key, id) order; only shard boundaries may differ), which the
    sinks pytest asserts. ``single_pass=False`` keeps the K-loop (K
    small exchanges instead of one K×-sized one — the shape to prefer
    when executor memory, not source I/O, is the binding constraint).

    Returns {"epochs": [seed...], "windows": n, "out_path": ...}.

    Incremented exports are resolved through ``read_training_tape``
    (supersession included), so every epoch tree reflects the full
    committed tape, not just the base windows."""
    import os

    if os.path.exists(os.path.join(export_path, "state", "CURRENT")):
        windows, _vocab = read_training_tape(spark, export_path)
    else:
        windows = spark.read.parquet(f"{export_path}/windows")
    out = out_path or f"{export_path}/epochs"
    seeds = [str(s) for s in seeds]
    if single_pass and seeds:
        from ..functions import hash60

        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        seeds_df = spark.createDataFrame(
            [(s,) for s in seeds], "epoch string"
        )
        key = hash60(
            F.concat(
                F.col("epoch"), F.lit(":"), F.col("window_id").cast("string")
            )
        )
        (
            windows.crossJoin(F.broadcast(seeds_df))
            .withColumn("shuffle_key", key)
            .repartitionByRange(
                n_parts * len(seeds), "epoch", "shuffle_key", "window_id"
            )
            .sortWithinPartitions("epoch", "shuffle_key", "window_id")
            .drop("shuffle_key")
            .write.mode(mode)
            .partitionBy("epoch")
            .option("maxRecordsPerFile", int(shard_max_windows))
            .parquet(out)
        )
    else:
        for seed in seeds:
            (
                shuffle_training_windows(windows, seed)
                .drop("shuffle_key")
                .write.mode(mode)
                .option("maxRecordsPerFile", int(shard_max_windows))
                .parquet(f"{out}/epoch={seed}")
            )
    return {
        "epochs": seeds,
        "windows": int(windows.count()),
        "out_path": out,
    }


def stream_export_training_windows(
    spark,
    docs_path: str,
    export_path: str,
    max_files_per_trigger: int = 1,
    checkpoint_dir: str = None,
):
    """Maintain the training tape CONTINUOUSLY as document files land —
    the streaming twin of the export sink, completing the pattern the
    manifest/prepare twins set: each micro-batch folds its arrivals
    through ``export_training_windows_increment``, so the accumulated
    tape equals the batch export on the union of all arrived files
    EXACTLY at the decoded-symbol level (the increment's contract).
    Requires an existing BASE export (the merge table must be trained
    and frozen before a stream can encode against it) and arrivals
    with strictly increasing doc_ids in arrival order — the tape is
    doc_id-ordered, so the ingest layout must already deliver files in
    id order (the CDC convention every increment enforces; violations
    raise rather than corrupt).

    Crash safety is the increment's own versioned-state protocol
    (batch ids recorded per version, CURRENT flipped last): a replayed
    micro-batch sees its lineage-scoped batch_id committed and no-ops.
    The LINEAGE token (the twins' shared guard) scopes batch ids to
    ONE checkpoint lineage — a fresh checkpoint pointed at existing
    tape state raises at setup instead of renumbering batches over
    different file groupings. Each handler runs inside a
    ``persist_scope`` so a 24/7 stream pins no per-batch caches."""
    import os
    import uuid

    from ..cache import persist_scope

    ckpt = checkpoint_dir or f"{export_path}/_stream_checkpoint"
    token_path = os.path.join(ckpt, "LINEAGE")
    if os.path.exists(token_path):
        with open(token_path) as f:
            token = f.read().strip()
    else:
        os.makedirs(ckpt, exist_ok=True)
        token = uuid.uuid4().hex
        with open(token_path, "w") as f:
            f.write(token)
    # lineage guard: if the tape already has stream-committed versions,
    # they must carry THIS checkpoint's token
    _m, v = _read_tape_state(spark, export_path)
    for i in range(2, v + 1):
        p = os.path.join(export_path, "state", f"v={i}", "BATCH")
        if not os.path.exists(p):
            continue
        with open(p) as f:
            bid = f.read().strip()
        if ":" in bid and bid.split(":", 1)[0] != token:
            raise ValueError(
                "stream_export_training_windows: tape state has "
                f"batches committed by a different checkpoint lineage "
                f"({bid.split(':', 1)[0]!r} != {token!r}); reset the "
                "stream checkpoint and the increments together."
            )

    schema = spark.read.parquet(docs_path).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(docs_path)
    )

    def handle(batch_df, batch_id):
        with persist_scope():
            export_training_windows_increment(
                batch_df, export_path, batch_id=f"{token}:{batch_id}"
            )

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .start()
    )


def write_metadata_report(
    spark: SparkSession,
    data_path: str,
    out_path: str,
    levels: tuple = ("file", "rowgroup", "column"),
    mode: str = "error",
) -> None:
    """Materialize parquet metadata levels of ``data_path`` as parquet
    datasets under ``out_path/<level>`` — the fleet-scan pattern: run the
    (cheap, footer-only) metadata scan once, then query the report with
    plain SQL instead of re-touching 10^6 files."""
    for level in levels:
        df = read_metadata(spark, data_path, source="parquet", level=level)
        df.write.mode(mode).parquet(f"{out_path}/{level}")
