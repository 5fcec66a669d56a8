"""Learned quality classification: a distributed logistic-regression
filter over hashed n-gram features (the GPT-3-style "quality classifier"
— Brown et al. 2020 §A trained an LR classifier against a high-quality
reference corpus and kept Common Crawl documents by a Pareto-thresholded
score; CCNet (Wenzek et al. 2020) buckets by LM score the same way).

Engine-exact determinism (the repo's Lloyd discipline, taken further):
every quantity that crosses an aggregation boundary is an INTEGER.
Weights live as ``w12`` = round(w * 1e12) scaled longs, per-document
margins are plain long sums over feature-occurrence rows (addition is
exact and order-invariant — no decimal multiplication, no float
accumulation anywhere), and the single libm call per document per round
(``exp`` inside the sigmoid) is snapped to an integer ``p12`` =
round(p * 1e12) immediately. Weight updates are computed IN-ENGINE (a
B-row Spark job) so the round-half-up semantics are Spark SQL's own and
the DuckDB oracle replays them with its identical ``round``. The whole
training run therefore unrolls into CTE layers exactly like the k-means
oracles, bit-identical on any engine and any partitioning.

Scale shape (the reason this is written the way it is): featurization is
MAP-ONLY — tokens, bigrams and bucket hashes are array expressions per
document, never exploded through a shuffle — and the per-doc feature
array ``X`` is persisted once. Each gradient-descent round is then ONE
map pass over ``X`` (margin + sigmoid + residual, all codegen) feeding a
``n_buckets``-key aggregation that partial-aggregates map-side, so the
only shuffled bytes per round are ~B rows regardless of corpus size.
Weights (B longs) ride a broadcast 1-row array. R rounds on 100 TB cost
R corpus scans and R tiny shuffles — no doc-keyed shuffle ever.

Features match ``sampling.dsir_resample``: unigrams + bigrams of the
normalized token stream with multiplicity, hashed into ``n_buckets`` via
the engine-portable ``hash60``; the margin is length-normalized (divided
by the doc's feature count), the fasttext/averaged-bag convention, so
margins stay O(max |w|) for any document length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import track_persist
from ..functions import ensure_parallelism, hash60, llit, tokens

SCALE = 10**12  # the fixed-point: w12 = round(w * 1e12)


def _feature_buckets(t, n_buckets: int):
    """Bucket ids (with multiplicity) for a token-array column: unigrams
    + bigrams hashed via hash60 % B. Pure array expressions — map-only."""
    n = F.size(t)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(t, i, 2)),
        ),
    ).otherwise(F.array_except(t, t))
    return F.transform(
        F.concat(t, bigrams),
        lambda f: F.pmod(hash60(f), F.lit(n_buckets)).cast("int"),
    )


def classifier_features(
    documents: DataFrame, target: DataFrame | None, n_buckets: int = 1024
) -> DataFrame:
    """The design matrix: (doc_id, fb array<int> feature-occurrence
    buckets, n = max(|fb|, 1), y = 1 iff doc_id ∈ target; y = 0
    everywhere when ``target`` is None — the label-free serving shape).
    Map-only except the broadcast label join; callers persist it (one
    corpus materialization reused by every GD round and the scoring
    pass).

    The token array is materialized behind a projection boundary before
    the bigram slices reference it — an expression captured inside a
    ``transform`` lambda re-evaluates per element, so slicing
    ``tokens(text)`` directly would re-run the regexp pipeline once per
    bigram (the quadratic trap dsir_resample measured at 15.4s → 2s).

    Null text coalesces to '' (the corpus_diff/corpus_manifest
    convention): a null-text document gets an EMPTY feature array, so
    it scores bias-only and stays in the training set — matching the
    DuckDB oracle, whose X CTE builds from ALL documents and
    coalesce(ms, 0)s the missing margin. Without the coalesce the doc
    would carry null fb → null score → null keep, and the learned
    gate's filter(keep) would silently drop it."""
    tokdf = documents.select(
        "doc_id", tokens(F.coalesce(F.col("text"), F.lit(""))).alias("t")
    )
    fdf = tokdf.select(
        "doc_id", _feature_buckets(F.col("t"), n_buckets).alias("fb")
    )
    if target is None:
        return fdf.select(
            "doc_id",
            "fb",
            F.greatest(F.size("fb"), F.lit(1)).alias("n"),
            F.lit(0).alias("y"),
        )
    tgt = target.select("doc_id").distinct().withColumn("is_t", F.lit(1))
    return (
        fdf.join(F.broadcast(tgt), "doc_id", "left")
        .select(
            "doc_id",
            "fb",
            F.greatest(F.size("fb"), F.lit(1)).alias("n"),
            F.coalesce(F.col("is_t"), F.lit(0)).alias("y"),
        )
    )


def _scored(X: DataFrame, w12: list, bias12: int):
    """One map pass: margin (exact decimal(38,0) sum of w12 over the
    doc's occurrence buckets via the LITERAL weight array — r15: the
    weights are driver-held state, so they ride the plan as one bigint
    array literal; the former one-row broadcast crossJoin cost a
    broadcast-materialization job per GD round), sigmoid snapped to
    integer p12, residual r12 and length-normalized gradient g12 — all
    in-engine, zero Python.

    The margin accumulator is decimal(38,0), NOT long, for the same
    reason the gradient folds are: |w12| reaches ~1.6e13 at the distill
    operating point, so a multi-million-occurrence document (which a
    100 TB corpus contains) overflows a 64-bit sum silently under
    non-ANSI arithmetic, corrupting both scores and gradients. The
    normalized z is O(max |w|) only AFTER the /n — the raw sum is not.
    decimal(38,0) gives 10^38 of headroom (10^25 occurrences of the
    largest weight) at identical double output for in-range values."""
    w_lit = llit(w12)
    b12 = F.lit(int(bias12)).cast("long")
    ms = F.aggregate(
        "fb",
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, bk: acc + F.get(w_lit, bk),
    )
    sc = X.select(
        "doc_id", "fb", "n", "y", ms.alias("ms"), b12.alias("b12")
    )
    z = (F.col("ms").cast("double") / F.lit(1e12)) / F.col("n") + F.col(
        "b12"
    ).cast("double") / F.lit(1e12)
    p12 = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) * F.lit(1e12)
    ).cast("long")
    out = sc.select("doc_id", "fb", "n", "y", p12.alias("p12"))
    return out.select(
        "doc_id",
        "fb",
        "n",
        "y",
        "p12",
        (F.col("p12") - F.col("y").cast("long") * F.lit(SCALE)).alias("r12"),
    ).select(
        "doc_id",
        "fb",
        "y",
        "p12",
        "r12",
        F.round(F.col("r12").cast("double") / F.col("n")).cast("long").alias(
            "g12"
        ),
        F.round(F.lit(1e12) / F.col("n")).cast("long").alias("m12"),
    )


def train_quality_classifier(
    documents: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    iters: int = 4,
    lr: float = 1.0,
) -> dict:
    """Full-batch gradient descent from zero weights with per-bucket L1
    feature-mass preconditioning: per round, one map pass over the
    persisted design matrix computes integer residuals, one B-key
    aggregation (map-side combined — the shuffle is ~B rows) folds the
    gradient AND the bucket's feature mass, and the update

        w_b -= lr * (Σ_d r_d x_db) / (Σ_d x_db)

    is the lr-scaled x-weighted MEAN residual over the documents that
    contain the bucket — bounded in [-lr, lr] for every bucket, so rare
    discriminative features move as fast as common ones (plain 1/N
    steps starve them by orders of magnitude; measured: 0.61 → 0.99
    training accuracy at the same round count). The update runs
    in-engine so its rounding is Spark SQL's, then B+1 longs reach the
    driver. Exact decimal(38,0) sums (a bigint sum would wrap at ~1e9
    docs × full-scale residuals; decimal is exact at any corpus size).

    Returns {"w12": [long]*B, "bias12": long, "n_buckets": B,
    "iters": iters, "lr": lr} — the model, fixed-point."""
    B = int(n_buckets)
    X = track_persist(
        ensure_parallelism(classifier_features(documents, target, B))
    )
    # no count(): the first GD round materializes the persist — a
    # separate forcing job is pure scheduling overhead
    return _train_on(X, B, iters, lr)


def _train_on(X: DataFrame, B: int, iters: int, lr: float) -> dict:
    """The GD loop over an already-persisted design matrix (callers that
    also score — quality_classifier — reuse the same X for both)."""
    spark = X.sparkSession
    w12 = [0] * B
    bias12 = 0
    for _ in range(int(iters)):
        sc = _scored(X, w12, bias12)
        pairs = F.concat(
            F.transform(
                "fb",
                lambda bk: F.struct(
                    bk.alias("bucket"),
                    F.col("g12").alias("g"),
                    F.col("m12").alias("m"),
                ),
            ),
            F.array(
                F.struct(
                    F.lit(-1).cast("int").alias("bucket"),
                    F.col("r12").alias("g"),
                    F.lit(SCALE).alias("m"),
                )
            ),
        )
        grads = (
            sc.select(F.explode(pairs).alias("pg"))
            .select(
                F.col("pg.bucket").alias("bucket"),
                F.col("pg.g").alias("g"),
                F.col("pg.m").alias("m"),
            )
            .groupBy("bucket")
            .agg(
                F.sum(F.col("g").cast("decimal(38,0)")).alias("gs"),
                F.sum(F.col("m").cast("decimal(38,0)")).alias("mass"),
            )
        )
        # ONE cluster action per round (r15): the step expression rides
        # the gradient aggregation itself, so the round collects <=B+1
        # (bucket, step) rows directly — the former in-engine update
        # joined a B+1-row weight table back onto grads, a whole
        # join + exchange + broadcast chain of jobs per round, to
        # compute w12 - step when the integer subtraction is exact in
        # Python anyway. The step arithmetic is unchanged Spark SQL
        # (same Round/cast on the same doubles; the old coalesce
        # branches only fired for buckets absent from grads, which
        # produce no row — and an absent bucket's weight was unchanged
        # before and stays untouched now).
        step = F.round(
            F.lit(float(lr))
            * F.col("gs").cast("double")
            / F.col("mass").cast("double")
            * F.lit(1e12)
        ).cast("long")
        for r in grads.select("bucket", step.alias("step")).collect():
            if r.bucket == -1:
                bias12 = int(bias12 - r.step)
            else:
                w12[r.bucket] = int(w12[r.bucket] - r.step)
    return {
        "w12": w12,
        "bias12": bias12,
        "n_buckets": B,
        "iters": int(iters),
        "lr": float(lr),
    }


def classifier_scores(
    documents: DataFrame,
    model: dict,
    pareto_alpha: float = 9.0,
    salt: str = "qcls",
) -> DataFrame:
    """Score every document under a trained model and apply the GPT-3
    Pareto keep rule: keep iff a per-doc Pareto(alpha) draw exceeds
    1 − score. The draw is DETERMINISTIC — uniform u from
    md5(salt:doc_id) (the dsir/temperature-mix keep-rule convention),
    inverse-CDF u^(−1/alpha) − 1, snapped to integer draw12 so the
    keep comparison is exact long-vs-long on any engine.

    Output: (doc_id, score double round-6, keep boolean). Map-only,
    label-free (the serving shape needs no target)."""
    X = classifier_features(documents, None, model["n_buckets"])
    return _scores_on(X, model, pareto_alpha, salt)


def _scores_on(
    X: DataFrame, model: dict, pareto_alpha: float = 9.0, salt: str = "qcls"
) -> DataFrame:
    sc = _scored(X, model["w12"], model["bias12"])
    u = (
        F.pmod(
            hash60(F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string"))),
            F.lit(1000000007),
        )
        + F.lit(1)
    ) / F.lit(1000000008.0)
    draw12 = F.round(
        (F.pow(u, F.lit(-1.0 / float(pareto_alpha))) - F.lit(1.0))
        * F.lit(1e12)
    ).cast("long")
    # score rounds through the repo's decimal-snap discipline
    # (relational._round_dec): double → DECIMAL(30,10) → exact round-6 →
    # double, so exact half-way p12 values round identically on Spark
    # and DuckDB (raw double F.round is BigDecimal-HALF_UP on the
    # shortest repr vs DuckDB's floating multiply — they can differ).
    score = (
        F.round(
            (F.col("p12").cast("double") / F.lit(1e12)).cast(
                "decimal(30,10)"
            ),
            6,
        )
        .cast("double")
        .alias("score")
    )
    return sc.select(
        "doc_id",
        score,
        (draw12 > (F.lit(SCALE) - F.col("p12"))).alias("keep"),
    )


def classifier_eval(
    scores: DataFrame, target: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """One-row evaluation report for a scored corpus against truth
    labels: confusion counts at ``threshold``, precision/recall, and
    the exact rank-sum AUC — all distributed.

    AUC = (Σ ranks of positives − P(P+1)/2) / (P·N) with AVERAGE ranks
    on ties (the Mann-Whitney estimator). The global rank is NOT a
    single-reducer window: scores range-partition, per-partition ranks
    fold with an exclusive prefix over the n_partitions COUNTS (the
    pack_sequences two-phase machinery), and tie groups re-average
    through one score-keyed aggregation — every shuffle is either
    range-balanced or keyed by score values. Ratios snap via the
    decimal discipline so the report is partition-invariant."""
    from pyspark.sql import Window

    spark = scores.sparkSession
    tgt = target.select("doc_id").distinct().withColumn("is_t", F.lit(1))
    labeled = track_persist(
        scores.join(F.broadcast(tgt), "doc_id", "left").select(
            "doc_id",
            "score",
            F.coalesce(F.col("is_t"), F.lit(0)).alias("y"),
        )
    )
    n_parts = int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    parted = (
        labeled.repartitionByRange(n_parts, "score", "doc_id")
        .sortWithinPartitions("score", "doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    local = parted.withColumn(
        "lrank",
        F.row_number().over(
            Window.partitionBy("pid").orderBy("score", "doc_id")
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
        "score", "y", (F.col("offset") + F.col("lrank")).alias("rank")
    )
    # average ranks within tie groups: one score-keyed aggregation
    tie_avg = ranked.groupBy("score").agg(
        # exact: decimal sum / count, round-12 like the Lloyd means
        F.round(
            F.sum(F.col("rank").cast("decimal(30,10)")) / F.count("*"), 12
        ).alias("avg_rank")
    )
    agg = (
        ranked.join(tie_avg, "score")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("p"),
            F.sum(
                F.when(F.col("y") == 1, F.col("avg_rank")).otherwise(
                    F.lit(0).cast("decimal(30,10)")
                )
            ).alias("pos_rank_sum"),
            F.sum(
                (
                    (F.col("y") == 1) & (F.col("score") > F.lit(threshold))
                ).cast("long")
            ).alias("tp"),
            F.sum(
                (
                    (F.col("y") == 0) & (F.col("score") > F.lit(threshold))
                ).cast("long")
            ).alias("fp"),
            F.sum(
                (
                    (F.col("y") == 1) & (F.col("score") <= F.lit(threshold))
                ).cast("long")
            ).alias("fn"),
        )
    )
    pr = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rc = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    auc = (
        F.col("pos_rank_sum").cast("double")
        - F.col("p").cast("double") * (F.col("p").cast("double") + 1.0) / 2.0
    ) / F.greatest(
        F.col("p").cast("double")
        * (F.col("n") - F.col("p")).cast("double"),
        F.lit(1.0),
    )
    return agg.select(
        "n",
        "p",
        "tp",
        "fp",
        "fn",
        F.round(pr.cast("decimal(30,10)"), 4).cast("double").alias("precision"),
        F.round(rc.cast("decimal(30,10)"), 4).cast("double").alias("recall"),
        F.round(auc.cast("decimal(30,10)"), 6).cast("double").alias("auc"),
    )


def write_classifier(spark: SparkSession, model: dict, path: str) -> None:
    """Persist a trained model as a (B+1)-row parquet table — bucket -1
    carries the bias, a one-row header carries (n_buckets, iters, lr).
    The at-rest form a serving job loads with ``read_classifier``; the
    fixed-point longs round-trip exactly (no float re-parsing)."""
    B = int(model["n_buckets"])
    rows = [(-1, int(model["bias12"]))] + [
        (b, int(model["w12"][b])) for b in range(B)
    ]
    spark.createDataFrame(rows, "bucket int, w12 long").write.mode(
        "overwrite"
    ).parquet(f"{path}/weights")
    spark.createDataFrame(
        [(B, int(model["iters"]), float(model["lr"]))],
        "n_buckets int, iters int, lr double",
    ).write.mode("overwrite").parquet(f"{path}/meta")


def read_classifier(spark: SparkSession, path: str) -> dict:
    """Load a ``write_classifier`` model; inverse of the writer,
    bit-exact (weights are integers)."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    B = int(meta.n_buckets)
    w12 = [0] * B
    bias12 = 0
    for r in spark.read.parquet(f"{path}/weights").collect():
        if r.bucket == -1:
            bias12 = int(r.w12)
        else:
            w12[r.bucket] = int(r.w12)
    return {
        "w12": w12,
        "bias12": bias12,
        "n_buckets": B,
        "iters": int(meta.iters),
        "lr": float(meta.lr),
    }


def quality_classifier(
    documents: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    iters: int = 4,
    lr: float = 1.0,
    pareto_alpha: float = 9.0,
) -> DataFrame:
    """Train + score in one call (the boarded composition): logistic
    regression against ``target`` as the positive class, then the
    Pareto-thresholded keep flag over the whole corpus. The persisted
    design matrix is built ONCE and shared by the GD rounds and the
    scoring pass — the scoring margin is one more map pass over it."""
    B = int(n_buckets)
    X = track_persist(
        ensure_parallelism(classifier_features(documents, target, B))
    )
    model = _train_on(X, B, iters, lr)
    return _scores_on(X, model, pareto_alpha)
