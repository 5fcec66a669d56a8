"""Deduplication operators for large-scale document corpora.

Five strategies over a ``documents(doc_id, text, ...)`` table, all built
from JVM-side expressions (no Python in the hot path) so they survive a
1000-executor / 100 TB corpus:

- exact: hash-groupBy on a normalized fingerprint. One shuffle on a
  64-bit-ish key; map-side partial aggregation applies.
- MinHash + LSH: shingle → k minhashes → b bands → bucket-join. The only
  shuffle key is (band_id, band_signature), which is near-uniform by
  construction — no skew. Candidate verification joins back on doc pairs.
- SimHash: per-token hashes vote on 60 fingerprint bits; banded buckets
  find near-neighbors without a pairwise join.
- n-gram Jaccard: inverted-index self-join on shingles; the explode keeps
  the join key cardinality ~ vocabulary, and a frequency cap drops
  stop-shingles that would otherwise create quadratic hot keys.
- embedding cosine: see similarity.py (exact pair scan at small n,
  LSH-bucketed at scale).

Each returns a DataFrame with stable, aliased column names so results can
be hash-compared against the DuckDB oracle in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import _round_dec

from ..cache import track_persist
from ..functions import ensure_parallelism, hash60, normalize_text, tokens

MINHASH_K = 32  # signature length
MINHASH_BANDS = 8  # 8 bands x 4 rows: P(candidate) = 1-(1-j^4)^8
SHINGLE_WORDS = 3
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
# sign-LSH bands for embedding near-dup blocking. Defaults target the
# 0.95 near-dup threshold: recall 1-(1-p^planes)^bands with p = 1-θ/π is
# 99.7% at cos=0.95 for 8 bands x 6 planes. Lower thresholds need MORE
# bands of FEWER planes (e.g. 16x4 gives ~96% at cos=0.45) — match the
# config to the threshold you register, the blocking is part of the
# semantics.
EMB_BANDS = 8
EMB_PLANES_PER_BAND = 6
EMB_BUCKET_CAP = 4096  # max vectors one GEMM tile side may hold
# embedding-dedup census: corpora up to this many vectors get an exact
# bucket-size census; larger ones a sampled estimate of this many rows
_CENSUS_SAMPLE_ROWS = 200_000


def exact_duplicates(documents: DataFrame, doc_ids_cap: int = 1000) -> DataFrame:
    """Groups of byte-identical (after normalization) documents.

    Returns one row per duplicate group: fingerprint, group size, kept id
    (min), and up to ``doc_ids_cap`` member ids (smallest first) — the
    classic first-pass dedup at any scale.

    The member list is bounded BEFORE aggregation: a row_number window on
    the same fingerprint key feeds ``collect_list`` only the first
    ``doc_ids_cap`` ids per group, so a pathological 10^7-copy document
    costs a spillable sort, never a 10^7-element aggregation buffer or
    output row. The window exchange already partitions by fingerprint, so
    the groupBy adds no second shuffle.
    """
    from pyspark.sql import Window

    # no repartition: a single md5 per row is cheaper than a shuffle; the
    # window/groupBy provides the parallel stage
    fp = documents.select(
        F.col("doc_id"), F.md5(normalize_text(F.col("text"))).alias("fingerprint")
    )
    rn = F.row_number().over(
        Window.partitionBy("fingerprint").orderBy("doc_id")
    )
    return (
        fp.withColumn("rn", rn)
        .groupBy("fingerprint")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
            F.sort_array(
                F.collect_list(F.when(F.col("rn") <= doc_ids_cap, F.col("doc_id")))
            ).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


MERSENNE31 = 2147483647  # 2^31 - 1; products of two 31-bit values fit in int64


def _mh_params(i: int) -> tuple[int, int]:
    """Deterministic affine-hash coefficients for minhash function i."""
    a = (1103515245 * (i + 1) + 12345) % MERSENNE31
    b = (22695477 * (i + 1) + 1) % MERSENNE31
    return a or 1, b


def shingle_signature_kernel(
    documents: DataFrame, k: int = SHINGLE_WORDS, n_hashes: int = MINHASH_K
) -> DataFrame:
    """Arrow kernel: distinct k-word shingles (and optionally the minhash
    signature) per document, via ``mapInPandas``.

    The round-1 pure-expression versions (``word_shingles`` +
    ``_minhash_signature``'s aggregate/zip_with fold) cost ~ms/doc because
    Catalyst interprets higher-order array lambdas. This kernel computes
    the identical values — Python ``lower``/``re.sub('[^a-z0-9]+')``/
    ``split`` match Spark's ``lower``/``regexp_replace``/``split`` on the
    corpus (ASCII; asserted by tests/test_oracle_parity.py against the
    DuckDB oracle), the base hash is the same md5-prefix ``hash60 %
    (2^31-1)``, and the k affine mixes run as one numpy broadcast per doc
    — at C/BLAS speed, ~10-100× cheaper per document.

    Emits (doc_id, shingles, signature); docs with < k tokens emit an
    empty shingle array (filtered by callers). With ``n_hashes=0`` the
    signature column is an empty array (shingle-only mode for the n-gram
    path). Map-only: no shuffle, scales linearly with corpus size.
    """
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    pat = re.compile(r"[^a-z0-9]+")
    a_co = np.array([_mh_params(i)[0] for i in range(n_hashes)], dtype=np.int64)
    b_co = np.array([_mh_params(i)[1] for i in range(n_hashes)], dtype=np.int64)

    def kern(batches):
        for pdf in batches:
            shingles_out, sigs_out = [], []
            for text in pdf["text"]:
                norm = pat.sub(" ", (text or "").lower()).strip()
                toks = norm.split(" ") if norm else []
                if len(toks) >= k:
                    shs = list(
                        dict.fromkeys(
                            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
                        )
                    )
                else:
                    shs = []
                shingles_out.append(shs)
                if n_hashes and shs:
                    base = np.fromiter(
                        (
                            int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                            % MERSENNE31
                            for s in shs
                        ),
                        dtype=np.int64,
                        count=len(shs),
                    )
                    sigs_out.append(
                        ((base[:, None] * a_co + b_co) % MERSENNE31).min(0).tolist()
                    )
                else:
                    sigs_out.append([])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "shingles": shingles_out,
                    "signature": sigs_out,
                }
            )

    return ensure_parallelism(documents.select("doc_id", "text")).mapInPandas(
        kern, "doc_id long, shingles array<string>, signature array<long>"
    )


def minhash_signatures(documents: DataFrame) -> DataFrame:
    return shingle_signature_kernel(documents).filter(F.size("shingles") > 0)


def band_rows(sigs: DataFrame) -> DataFrame:
    """Explode signatures into (doc_id, band_id, band_sig) LSH band rows
    — shared by the batch self-join and the streaming stateful-bucket
    variants (identical banding ⇒ identical candidate sets)."""
    rows_per_band = MINHASH_K // MINHASH_BANDS
    return sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.transform(
                                F.slice(
                                    F.col("signature"), b * rows_per_band + 1, rows_per_band
                                ),
                                lambda x: x.cast("string"),
                            ),
                        )
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("band_id", "band_sig"),
    )


def minhash_lsh_pairs(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    Scale path: the band explode multiplies rows by MINHASH_BANDS only;
    the bucket groupBy shuffles on (band, signature) — uniform keys. The
    verify join re-joins shingle sets per *candidate pair only*, never all
    pairs. At 100 TB the verify side stays proportional to candidate count.
    """
    # sigs feeds the band explode AND both sides of the verify join: persist
    # so the shingle+signature expressions evaluate once per document, not
    # once per plan reference
    sigs = track_persist(minhash_signatures(documents))

    bands = band_rows(sigs)
    # candidate pairs: docs sharing any band bucket
    left = bands.alias("l")
    right = bands.alias("r")
    cands = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_sig") == F.col("r.band_sig"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact Jaccard verification on the candidate pairs
    sh = sigs.select("doc_id", "shingles")
    verified = (
        cands.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            _round_dec(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def simhash_fingerprints(documents: DataFrame) -> DataFrame:
    """60-bit SimHash per document: each distinct token's hash votes ±1 on
    every bit; the sign of the vote sum sets the fingerprint bit.

    Pure lateral-view SQL: explode tokens → explode bit positions would be
    60× row growth, so instead the bit loop stays inside an array
    expression (JVM-side, no shuffle beyond the final groupBy on doc_id).
    """
    toks = ensure_parallelism(documents).select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    ).withColumn("h", hash60(F.col("tok")))
    votes = toks.select(
        "doc_id",
        *[
            (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
            for j in range(SIMHASH_BITS)
        ],
    )
    sums = votes.groupBy("doc_id").agg(
        *[F.sum(f"b{j}").alias(f"s{j}") for j in range(SIMHASH_BITS)]
    )
    fingerprint = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = bit * F.lit(1 << j).cast("long")
        fingerprint = term if fingerprint is None else fingerprint + term
    return sums.select("doc_id", fingerprint.alias("simhash"))


def simhash_bands(documents: DataFrame) -> DataFrame:
    """Banded SimHash buckets: docs sharing a 15-bit band are near-dup
    candidates (Hamming distance ≤ SIMHASH_BANDS-1 guaranteed caught)."""
    bits_per_band = SIMHASH_BITS // SIMHASH_BANDS
    fp = simhash_fingerprints(documents)
    mask = (1 << bits_per_band) - 1
    bands = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * bits_per_band)
                    .bitwiseAND(F.lit(mask))
                    .cast("long")
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band_id", "band_value"),
    )
    return bands


def simhash_candidate_pairs(documents: DataFrame) -> DataFrame:
    # persist: the banded fingerprints feed both sides of the self-join
    bands = track_persist(simhash_bands(documents))
    l, r = bands.alias("l"), bands.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_value") == F.col("r.band_value"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("simhash_a"),
            F.col("r.simhash").alias("simhash_b"),
        )
        .distinct()
    )
    # Hamming distance via popcount of XOR (bit_count is in both engines)
    return pairs.withColumn(
        "hamming",
        F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))).cast("long"),
    )


def auto_doc_freq_cap(df_histogram, pair_budget: int) -> int:
    """Pick the largest doc-frequency cap whose inverted-index self-join
    stays under ``pair_budget`` candidate rows.

    ``df_histogram`` is [(df, n_shingles), ...] in any order. A shingle
    appearing in ``df`` documents contributes df*(df-1)/2 join rows, so the
    fan-out of a cap ``c`` is the cumulative sum over df <= c. On a Zipfian
    corpus the sum is dominated by the head and any generous cap passes; on
    a dense/low-entropy corpus (the measured 4x scale-probe outlier: most
    shingles just under a fixed cap of 100) the cap auto-shrinks so total
    join work stays ~``pair_budget`` regardless of density. Floor is 2 —
    df=1 shingles generate no pairs, so a cap below 2 returns nothing.
    """
    total = 0
    cap = 2
    for df, n_shingles in sorted(df_histogram):
        total += (df * (df - 1) // 2) * n_shingles
        if total > pair_budget and df > 2:
            break
        cap = max(cap, df)
    return cap


def ngram_jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.3,
    max_doc_freq="auto",
    pair_budget: int = 25_000_000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity via an inverted index: one
    shingle-keyed aggregation groups each shingle's (df-capped) postings
    and expands the i<j candidate pairs map-side.

    ``max_doc_freq`` drops shingles appearing in more than that many docs —
    the skew guard: a stop-shingle shared by 1M docs would otherwise
    produce 10^12 join rows. Dropping ubiquitous shingles only *lowers*
    recall for pairs that share nothing rare, which is the standard
    trade-off at corpus scale.

    ``max_doc_freq="auto"`` (the default) derives the cap from the corpus
    itself: the (tiny) doc-frequency histogram is aggregated, and the
    largest cap whose total join fan-out fits ``pair_budget`` rows is
    chosen via ``auto_doc_freq_cap``. A fixed integer cap is a *rate* knob
    that must shrink as corpus density grows (measured in
    tools/scale_probe.py: a 4x-replicated low-entropy corpus puts most
    shingles just under df=100 and the join goes quadratic — 21.6s fixed
    vs 11.6s auto), which is why the self-tuning mode is the default; pass
    an integer to pin the cap. The histogram is O(distinct df values) — a
    few hundred rows to the driver, same class of tiny driver-side
    decision as IVF's centroid pull.
    """
    sh = (
        shingle_signature_kernel(documents, n_hashes=0)
        .select("doc_id", F.col("shingles").alias("sh"))
        .filter(F.size("sh") > 0)
    )
    # carry n_sh through the explode (no join back to a sizes table) and
    # persist: the inverted index feeds the frequency count AND both sides
    # of the self-join — without persist the shingle expression would be
    # re-evaluated once per plan reference
    inv = track_persist(
        sh.select(
            "doc_id",
            F.size("sh").cast("long").alias("n_sh"),
            F.explode("sh").alias("shingle"),
        )
    )
    freq = inv.groupBy("shingle").agg(F.count("*").alias("df"))
    if max_doc_freq == "auto":
        # persist: freq feeds the histogram action AND the rare filter
        freq = track_persist(freq)
        hist = [
            (r["df"], r["n_shingles"])
            for r in freq.groupBy("df").agg(F.count("*").alias("n_shingles")).collect()
        ]
        max_doc_freq = auto_doc_freq_cap(hist, pair_budget)
    rare = freq.filter(F.col("df") <= F.lit(int(max_doc_freq)))
    # ONE shingle-keyed aggregation instead of the postings self-join
    # (r14): sort_array(collect_list(..)) materializes each shingle's
    # posting group — bounded per group by the df cap, which
    # auto_doc_freq_cap already bounds through pair_budget — and the
    # i<j pair fan-out happens map-side AFTER the single shuffle.
    # Shingles are distinct per document (dict.fromkeys in the kernel),
    # so doc_ids within a group are unique and the sorted i<j expansion
    # is exactly the former join's (l.doc_id < r.doc_id) pair set. The
    # SortMergeJoin this replaces shuffled AND sorted the postings
    # twice (plus a third persisted copy as inv_r); the rare join's
    # shingle partitioning now feeds the groupBy with no new exchange.
    grp = (
        inv.join(rare.select("shingle"), "shingle")
        .groupBy("shingle")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "n_sh"))
            ).alias("ps")
        )
        .filter(F.size("ps") >= 2)
    )
    # two chained Generates, NOT one flattened pair array: a boundary
    # shingle at the cap can own ~pair_budget pairs, and materializing
    # them as one array value in one row would hold cap^2 structs in
    # memory where the old join streamed them — posexplode the left
    # element, then explode its strict suffix, so peak per-row state is
    # one ps array (<= cap structs)
    lefts = grp.select("ps", F.posexplode("ps").alias("i0", "l"))
    pairs = lefts.select(
        "l",
        F.explode(
            F.slice(F.col("ps"), F.col("i0") + F.lit(2), F.size("ps"))
        ).alias("r"),
    )
    common = (
        pairs.groupBy(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.first(F.col("l.n_sh")).alias("n_a"),
            F.first(F.col("r.n_sh")).alias("n_b"),
        )
    )
    out = (
        common.withColumn(
            "jaccard",
            _round_dec(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )
    return out


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_bands: int = EMB_BANDS,
    planes_per_band: int = EMB_PLANES_PER_BAND,
    bucket_cap: int = EMB_BUCKET_CAP,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via multi-band LSH blocking + a
    tiled per-bucket GEMM verify kernel.

    Fully distributed — nothing is ever collected to the driver:

    1. ``similarity.multiband_lsh_buckets`` assigns every vector to
       ``n_bands`` sign-LSH buckets (one numpy GEMM per Arrow batch against
       the deterministic plane matrix — a constant of (plane, dim), so no
       broadcast of data is needed).
    2. Buckets larger than ``bucket_cap`` are split into
       ``ceil(size/cap)`` chunks on ``vec_id % n_chunks`` and every chunk
       *pair* (ci ≤ cj) becomes its own GEMM tile task: a vector in chunk c
       is replicated to the ``n_chunks`` tiles touching c. This bounds one
       task at 2×``bucket_cap`` vectors and spreads an oversized bucket's
       O(size²) pair scan over ~n_chunks²/2 tasks — a 10M-identical-vector
       cluster (which lands in ONE bucket in EVERY band, since identical
       sign bits can never split) no longer pins a single task or its
       memory. Replication cost is √(compute): n_chunks copies for an
       n_chunks²-tile workload.
    3. ``applyInPandas`` per tile runs the cross-chunk (or within-chunk on
       diagonal tiles) cosine GEMM and emits pairs ≥ threshold.
    4. ``dropDuplicates`` merges pairs caught by more than one band (the
       cosine is identical in every band, so any survivor is correct).

    Pair semantics are LSH-blocked: a pair is reported iff the two vectors
    share a bucket in ≥1 band AND exact cosine ≥ threshold — the DuckDB
    oracle replicates the banding bit-for-bit (tiling does not change the
    pair set: every within-bucket pair lands in exactly one tile). Recall
    for a true pair at angle θ (p = 1-θ/π) is 1-(1-p^planes_per_band)^n_bands;
    match the config to the threshold — more bands of fewer planes for low
    thresholds (16×4 ≈ 96% at cos=0.45), fewer bands of more planes for
    high ones (the 8×6 default ≈ 99.7% at cos=0.95).

    The full-corpus bucketize GEMM runs exactly once; the bucket-size
    census that plans the tiling is free for corpora under ``bucket_cap``
    (a metadata-only count proves no bucket can overflow) and
    O(sample) — never a second full GEMM — above it. The corpus shuffles
    once, replicated ``n_bands``× on near-uniform (band, bucket, tile)
    keys (plus the tile fan-out on the rare oversized buckets) — no
    driver collect, no all-pairs scan, no full-corpus broadcast.

    Rounding matches the DuckDB oracle: half-away-from-zero to 4 decimals.
    """
    import numpy as np
    import pandas as pd

    from .similarity import multiband_lsh_buckets

    bands = multiband_lsh_buckets(embeddings, n_bands, planes_per_band)

    # Tile planning needs per-bucket sizes BEFORE the bucket shuffle. The
    # full-GEMM census r3 ran here doubled the kernel cost (the r3 bench
    # regression); n_chunks only bounds task memory — the pair set is
    # identical for ANY n_chunks >= 1 (every within-bucket pair lands in
    # exactly one tile) — so the census only has to be *generous*, not
    # exact, and three regimes cover it:
    #   - corpus <= bucket_cap (a metadata-only count on a parquet scan):
    #     no bucket can overflow; skip the census entirely — the common
    #     interactive case collapses to GEMM -> one shuffle -> verify.
    #   - corpus <= _CENSUS_SAMPLE_ROWS: exact slim-GEMM census (cheap).
    #   - larger: census over a ~_CENSUS_SAMPLE_ROWS sample of the
    #     vectors, scaled by 1/fraction with a 1.25 safety margin —
    #     census cost stays O(sample), not O(corpus), and a misestimated
    #     bucket merely gets a tile slightly over/under cap.
    n_vectors = embeddings.count()
    if n_vectors <= bucket_cap:
        tiles = bands.select(
            "band_id",
            "band_value",
            F.lit(0).alias("tile_i"),
            F.lit(0).alias("tile_j"),
            F.lit(0).alias("chunk"),
            "vec_id",
            "embedding",
        )
    else:
        frac = min(1.0, _CENSUS_SAMPLE_ROWS / n_vectors)
        margin = 1.0 if frac == 1.0 else 1.25
        src = embeddings if frac == 1.0 else embeddings.sample(frac, seed=42)
        census = (
            multiband_lsh_buckets(src, n_bands, planes_per_band, with_embedding=False)
            .groupBy("band_id", "band_value")
            .agg(
                F.ceil(F.count("*") * F.lit(margin / frac) / F.lit(bucket_cap))
                .cast("long")
                .alias("n_chunks")
            )
            .filter(F.col("n_chunks") > 1)  # broadcast only oversized buckets
        )
        assigned = bands.join(
            F.broadcast(census), ["band_id", "band_value"], "left"
        ).withColumn(
            "chunk",
            F.pmod(F.col("vec_id"), F.coalesce(F.col("n_chunks"), F.lit(1))),
        )
        # Tile fan-out: vector in chunk c joins every tile
        # (min(c,k), max(c,k)). n_chunks == 1 (the common case) reduces to
        # one (0, 0) tile per bucket with zero replication.
        tiles = assigned.withColumn(
            "k",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("n_chunks"), F.lit(1)) - 1)
            ),
        ).select(
            "band_id",
            "band_value",
            F.least("chunk", "k").alias("tile_i"),
            F.greatest("chunk", "k").alias("tile_j"),
            "chunk",
            "vec_id",
            "embedding",
        )

    KEY = ["band_id", "band_value", "tile_i", "tile_j"]
    PAIR_CHUNK = 1_000_000  # max pair rows per emitted Arrow batch

    def rnd(s):
        # round half-away-from-zero (DuckDB/Java semantics, not numpy's
        # banker's rounding)
        return np.sign(s) * np.floor(np.abs(s) * 1e4 + 0.5) / 1e4

    def emit_tile(rows):
        """One tile's qualifying pairs, yielded in ≤PAIR_CHUNK slices: a
        degenerate tile (all-identical vectors at a low threshold) emits
        O(cap²) pairs, which must never become one giant Arrow batch."""
        if len(rows) < 2:
            return
        rows.sort(key=lambda r: r[1])
        ti = rows[0][2]
        tj = rows[0][3]
        ids = np.array([r[1] for r in rows], dtype=np.int64)
        from .similarity import stack_embeddings

        mat = stack_embeddings(
            [r[4] for r in rows], "embedding LSH tiles", ids=list(ids)
        )
        # safe divide: a zero-norm row keeps its zeros, so its cosine
        # with everything is 0.0 < threshold — zero vectors never pair
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        # zero-norm AND non-finite rows keep zeros: cosine 0 < threshold,
        # so degenerate vectors never pair (contract tested in the nasty
        # embeddings suite)
        good = np.isfinite(nrm) & (nrm > 0.0)
        mat = np.where(good, mat / np.where(good, nrm, 1.0), 0.0)
        if ti == tj:
            sims = rnd(mat @ mat.T)
            ai, bj = np.nonzero(np.triu(sims >= threshold, k=1))
            a, b, c = ids[ai], ids[bj], sims[ai, bj]
        else:
            left = np.array([r[0] for r in rows], dtype=np.int64) == ti
            la, lb = ids[left], ids[~left]
            if not len(la) or not len(lb):
                return
            sims = rnd(mat[left] @ mat[~left].T)
            ai, bj = np.nonzero(sims >= threshold)
            a0, b0 = la[ai], lb[bj]
            a, b, c = np.minimum(a0, b0), np.maximum(a0, b0), sims[ai, bj]
        for s in range(0, len(a), PAIR_CHUNK):
            e = s + PAIR_CHUNK
            yield pd.DataFrame({"vec_a": a[s:e], "vec_b": b[s:e], "cos": c[s:e]})

    def tile_pairs_stream(batches):
        """Streaming group iterator over key-sorted partitions: buffers at
        most one tile (≤ 2×bucket_cap rows) and never returns more than
        PAIR_CHUNK pairs per Arrow batch — bounded worker AND JVM memory
        regardless of how degenerate the tile is. (applyInPandas would
        return each tile's pairs as a single DataFrame ⇒ a single Arrow
        batch, which overflows direct memory on quadratic outputs.)"""
        cur_key, rows = None, []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                key = (r.band_id, r.band_value, r.tile_i, r.tile_j)
                if key != cur_key:
                    yield from emit_tile(rows)
                    cur_key, rows = key, []
                rows.append((r.chunk, r.vec_id, r.tile_i, r.tile_j, r.embedding))
        yield from emit_tile(rows)

    keyed = tiles.repartition(*KEY).sortWithinPartitions(*KEY, "vec_id")
    pairs = keyed.mapInPandas(tile_pairs_stream, "vec_a long, vec_b long, cos double")
    return pairs.dropDuplicates(["vec_a", "vec_b"]).select("vec_a", "vec_b", "cos")


def line_dedup(
    documents: DataFrame,
    delimiter: str = "\n",
    chunk_tokens: "int | None" = None,
) -> DataFrame:
    """Corpus-level exact line deduplication, first occurrence wins —
    the CCNet/RefinedWeb boilerplate-removal step: a line (or, with
    ``chunk_tokens=k``, each consecutive k-token chunk) that appears
    anywhere earlier in the corpus is dropped from every later document.

    Scale shape: the arg-min over each line's occurrences is a
    ``groupBy(line).agg(min(struct(doc_id, line_no)))`` — partial
    aggregation combines map-side, so a boilerplate line occurring 10⁹
    times contributes ONE row per task to the shuffle, not 10⁹ (a
    ``row_number`` window over the line key would sort the full 10⁹-row
    partition on one reducer). The join back on ``line`` is the one
    place a hot line concentrates; it is row-linear (no blowup) and AQE
    splits skewed partitions. Reassembly sorts each doc's kept lines
    with ``array_sort(collect_list(struct))`` — bounded by one document,
    which by pipeline definition fits in a task.

    Output: one row per input document —
    (doc_id, n_lines, n_kept, cleaned_text).
    """
    sep = " " if chunk_tokens else delimiter
    if chunk_tokens:
        k = int(chunk_tokens)
        # project the split array first: a captured split(text) inside
        # the transform lambda re-splits the text per chunk (the r9
        # lambda-capture fix)
        toks = F.col("t")
        n_lines = F.greatest(
            F.ceil(F.size(toks) / F.lit(k)).cast("int"), F.lit(1)
        )
        lines_arr = F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * k + 1, k)),
        )
        documents = documents.select(
            "doc_id", F.split(F.col("text"), " ").alias("t")
        )
    else:
        # F.split takes a Java REGEX — escape so "." or "|" delimiters
        # split literally
        import re as _re

        lines_arr = F.split(F.col("text"), _re.escape(delimiter), -1)
    lines = documents.select(
        "doc_id", F.posexplode(lines_arr).alias("line_no", "line")
    )
    firsts = lines.groupBy("line").agg(
        F.min(F.struct("doc_id", "line_no")).alias("first")
    )
    joined = lines.join(firsts, "line")
    kept = (F.col("doc_id") == F.col("first.doc_id")) & (
        F.col("line_no") == F.col("first.line_no")
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(kept, F.struct("line_no", "line"))
                        )
                    ),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("cleaned_text"),
        )
        .select("doc_id", "n_lines", "n_kept", "cleaned_text")
    )


def window_hashes(t, n_tokens, window: int) -> F.Column:
    """Array of ``window``-token span hashes from a token-array column:
    position i hashes the space-joined slice with the shared 60-bit md5
    prefix — one vectorized concat + md5 per position, shared by the
    batch operator and the streaming twin.

    Kernel choice is MEASURED, not assumed (ARCHITECTURE.md): the r6
    verdict suggested a polynomial rolling hash over per-token hashes
    to remove the O(window × chars) re-concat; r7 implemented a
    double-lane Rabin-Karp (exact int64 mod arithmetic, bit-identical
    DuckDB twin) and it lost 2× to this form at sf0.1 — per-token
    hashing costs the SAME number of md5 fixed costs as per-window
    hashing (window count ≈ token count), and the O(window) combine
    runs as interpreted higher-order-function lambdas while concat_ws
    + md5 over the materialized slice stays a single vectorized JVM
    call. A true O(1) rolling recurrence would need a sequential scan
    primitive codegen lacks."""
    return F.when(
        n_tokens >= window,
        F.transform(
            F.sequence(F.lit(1), n_tokens - window + 1),
            lambda i: hash60(F.concat_ws(" ", F.slice(t, i, window))),
        ),
    ).otherwise(F.array().cast("array<long>"))


def substring_dedup(documents: DataFrame, window: int = 20) -> DataFrame:
    """Span-level exact substring deduplication across the corpus — the
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better") measurement: any ``window``-token span that appeared
    EARLIER in the corpus (first occurrence by (doc_id, position) wins)
    marks its tokens as duplicated, and overlapping duplicated windows
    merge into spans, so a copied 500-token passage counts 500 duplicated
    tokens, not 481 windows × 20.

    Line dedup catches whole duplicated LINES; this catches arbitrary
    copied spans that cross line structure (quotations, boilerplate
    embedded mid-paragraph, mirrored articles with edited openings).

    Scale shape: one row per rolling window (corpus-token-linear, the
    same cardinality class as the line-dedup postings); the global
    first-occurrence is a partial-aggregating ``min(struct(doc_id,
    pos))`` per window hash — a boilerplate span occurring 10⁹ times
    contributes one row per task to that shuffle; the join back on the
    hash is row-linear with AQE splitting hot hashes. The interval
    union runs per document under a (doc_id) window ordered by
    position — running max of span ends over PRECEDING rows, so each
    row's novel contribution is ``end − max(start, prev_max_end)``
    clamped at 0; per-partition state is one document's duplicated
    windows. Window hashes are the shared 60-bit md5 prefix over the
    space-joined token slice (``window_hashes`` — exactly reproducible
    in the DuckDB oracle; the measured-and-rejected polynomial
    alternative is documented there); a collision can only OVER-mark
    duplication, identically on both engines.

    Output per doc: (doc_id, n_tokens, n_windows, n_dup_windows,
    n_dup_tokens, dup_token_frac).
    """
    from pyspark.sql import Window as W

    toks = tokens(F.col("text"))
    n = F.size(toks)
    base = documents.select("doc_id", toks.alias("t"), n.alias("n_tokens"))
    wins = base.select(
        "doc_id",
        F.posexplode(
            window_hashes(F.col("t"), F.col("n_tokens"), window)
        ).alias("pos", "h"),
    )
    firsts = wins.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("first"),
        F.count("*").alias("occ"),
    )
    dup = (
        wins.join(firsts, "h")
        .filter(
            (F.col("occ") > 1)
            & (
                (F.col("doc_id") != F.col("first.doc_id"))
                | (F.col("pos") != F.col("first.pos"))
            )
        )
        .select("doc_id", "pos")
    )
    w_doc = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    contrib = F.greatest(
        F.lit(0),
        F.col("pos")
        + F.lit(window)
        - F.greatest(F.col("pos"), F.coalesce(F.max(F.col("pos") + window).over(w_doc), F.lit(0))),
    )
    per_doc = (
        dup.withColumn("contrib", contrib)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_dup_windows"),
            F.sum("contrib").cast("long").alias("n_dup_tokens"),
        )
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.greatest(F.col("n_tokens") - window + 1, F.lit(0))
            .cast("long")
            .alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
            _round_dec(
                F.coalesce("n_dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                4,
            ).alias("dup_token_frac"),
        )
        .orderBy("doc_id")
    )


def line_dedup_incremental(
    documents: DataFrame, seen_line_fps: DataFrame, delimiter: str = "\n"
):
    """Incremental twin of ``line_dedup``: dedup TODAY'S arrivals only,
    against a persisted line-fingerprint catalog from previous runs — a
    line is kept iff its md5 is absent from the catalog AND it is the
    batch-local first occurrence (min (doc_id, line_no), the batch must
    self-dedup too). When batches are processed in ascending doc_id
    order this composes EXACTLY to the batch operator's global
    first-occurrence semantics (pytest-replayed on a 3-batch split).

    Scale shape: the catalog join is one shuffle on the uniform md5 key
    (AQE-splittable), the batch arg-min is the same partial-aggregating
    ``min(struct)`` as the batch operator, and nothing reprocesses
    history — the CDC property. ``seen_line_fps`` needs one column
    ``fp``. Returns (cleaned docs DataFrame — the batch operator's
    (doc_id, n_lines, n_kept, cleaned_text) —, new line fps to append
    to the catalog).
    """
    import re as _re

    lines = documents.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), _re.escape(delimiter), -1)).alias(
            "line_no", "line"
        ),
    ).withColumn("fp", F.md5("line"))
    seen = seen_line_fps.select("fp").distinct().withColumn("seen", F.lit(True))
    flagged = lines.join(seen, "fp", "left")
    firsts = lines.groupBy("line").agg(
        F.min(F.struct("doc_id", "line_no")).alias("first")
    )
    joined = flagged.join(firsts, "line")
    kept = (
        F.col("seen").isNull()
        & (F.col("doc_id") == F.col("first.doc_id"))
        & (F.col("line_no") == F.col("first.line_no"))
    )
    cleaned = (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(kept, F.struct("line_no", "line")))
                    ),
                    lambda s: s["line"],
                ),
                delimiter,
            ).alias("cleaned_text"),
        )
        .select("doc_id", "n_lines", "n_kept", "cleaned_text")
    )
    new_fps = flagged.filter(F.col("seen").isNull()).select("fp").distinct()
    return cleaned, new_fps


def incremental_exact_dedup(
    new_docs: DataFrame, seen_fingerprints: DataFrame
) -> DataFrame:
    """Incremental (CDC-shaped) exact dedup: screen TODAY'S arrivals
    against a persisted fingerprint catalog from previous runs, keeping
    only documents whose normalized-text md5 is (a) absent from the
    catalog and (b) the first occurrence within the batch (min doc_id —
    the batch must also self-dedup, or two copies arriving together both
    survive). The production shape of a refreshing corpus: the catalog
    is a metadata-plane table the pipeline appends each run's new
    fingerprints to, and the screen is one broadcast-or-shuffle
    anti-join plus the standard arg-min — no reprocessing of history.

    ``seen_fingerprints`` needs one column ``fp`` (md5 hex). Returns the
    surviving (doc_id, fp) rows.
    """
    fps = new_docs.select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("fp")
    )
    fresh = fps.join(
        seen_fingerprints.select("fp").distinct(), "fp", "left_anti"
    )
    firsts = fresh.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return firsts.select("doc_id", "fp").orderBy("doc_id")


def _semantic_base(embeddings, n_centroids, iters, centroids):
    """(vec_id, cluster, emb, nrm) — trained Lloyd assignment, or the
    deterministic nearest-frozen-centroid assignment ((d2, cluster)
    tie-break, the probe convention) when ``centroids`` is given."""
    from .similarity import ivf_index
    from ..functions import dot

    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    if centroids is None:
        _, assign = ivf_index(
            embeddings, n_centroids=n_centroids, iters=iters
        )
        assigned = assign.join(e, "vec_id").select(
            "vec_id", F.col("cluster").cast("long").alias("cluster"), "emb"
        )
    else:
        from ..functions import dlit
        from .similarity import _dense_vecs

        items = (
            sorted(centroids.items())
            if isinstance(centroids, dict)
            else list(enumerate(centroids))
        )
        # map-side arg-min against a LITERAL candidate table (r15): the
        # frozen centroids are driver-held constants, so they ride the
        # plan as one nested array literal — the r14 one-row broadcast
        # cross (a BroadcastNestedLoopJoin + its broadcast job) is gone
        # and the assignment is a pure projection. Identical values:
        # (d2, index) struct order is the probe (d2, cluster) tie-break
        # because cluster ids are dense 0..k-1 in list order (asserted),
        # and the per-candidate d2 is the same exact left fold.
        cands = dlit(_dense_vecs(items, "semantic centroids"))
        best = F.array_min(
            F.transform(
                cands,
                lambda cv, i: F.struct(
                    F.aggregate(
                        F.zip_with(
                            "emb", cv, lambda a, b: (a - b) * (a - b)
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d2"),
                    i.cast("long").alias("cluster"),
                ),
            )
        )
        assigned = e.select(
            "vec_id", best["cluster"].alias("cluster"), "emb"
        )
    return track_persist(
        assigned.select(
            "vec_id", "cluster", "emb",
            F.sqrt(dot(F.col("emb"), F.col("emb"))).alias("nrm"),
        )
    )


def _semantic_pairs(base, threshold, cluster_cap):
    """Within-cluster pairs at cosine >= threshold, chunk-pair tiled.

    Clusters larger than ``cluster_cap`` split into ceil(size/cap)
    chunks on vec_id % n_chunks, and every chunk pair (ti <= tj)
    becomes its own join tile — one task never sees more than ~2·cap
    vectors, so a degenerate mega-cluster can't pin a single task.
    Replication cost is n_chunks copies per vector for an
    n_chunks²-tile workload (√compute). Each unordered pair lands in
    EXACTLY one tile, so the pair set — and therefore the components
    and the final output — is IDENTICAL to the untiled plan
    (pytest-asserted), and the oracle needs no tiling at all."""
    sizes = base.groupBy("cluster").agg(F.count("*").alias("c_size"))
    tiled = (
        base.join(F.broadcast(sizes), "cluster")
        .withColumn(
            "n_chunks",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("c_size") / F.lit(int(cluster_cap))),
            ).cast("int"),
        )
        .withColumn(
            "chunk", F.pmod(F.col("vec_id"), F.col("n_chunks")).cast("int")
        )
    )
    left = tiled.withColumn(
        "tj", F.explode(F.sequence(F.col("chunk"), F.col("n_chunks") - 1))
    ).select(
        F.col("vec_id").alias("a"), "cluster",
        F.col("chunk").alias("ti"), "tj",
        F.col("emb").alias("ea"), F.col("nrm").alias("na"),
    )
    right = tiled.withColumn(
        "ti", F.explode(F.sequence(F.lit(0), F.col("chunk")))
    ).select(
        F.col("vec_id").alias("b"), "cluster",
        "ti", F.col("chunk").alias("tj"),
        F.col("emb").alias("eb"), F.col("nrm").alias("nb"),
    )
    return (
        left.join(right, ["cluster", "ti", "tj"])
        # diagonal tiles see both orientations — keep one; cross tiles
        # see each unordered pair once, in chunk (not id) orientation
        .filter((F.col("ti") != F.col("tj")) | (F.col("a") < F.col("b")))
        .filter(F.col("a") != F.col("b"))
        .withColumn("cos", _semantic_cos("ea", "eb", "na", "nb"))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("a", "b")
    )


def _semantic_cos(ea, eb, na, nb):
    """Fixed-order cosine with the round-6 decimal snap. Zero-norm edge
    (a failed encoder batch emitting an all-zero embedding): cosine is
    undefined, so the guard returns NULL instead of letting 0/0 produce
    NaN — a null cos fails every ``>= threshold`` filter, so a zero
    vector never pairs with anything and survives as its own singleton
    component (kept=true). Pytest-asserted in
    test_zero_norm_embedding_contract."""
    from ..functions import dot

    return F.when(
        (F.col(na) == 0) | (F.col(nb) == 0), F.lit(None).cast("double")
    ).otherwise(
        F.round(
            (dot(F.col(ea), F.col(eb)) / (F.col(na) * F.col(nb))).cast(
                "decimal(30,10)"
            ),
            6,
        ).cast("double")
    )


def semdedup_auto_k(n: int, target_cluster_size: int = 32) -> int:
    """The k ∝ n SemDeDup recipe with tools/semdedup_probe.py's measured
    constants: k = max(16, ceil(n / target_cluster_size)) keeps the
    expected cluster size — and with it the per-cluster pair count
    Σ|cluster|²/n — FLAT as the corpus grows (measured 251× pair-space
    reduction at 16× corpus with flat wall time)."""
    return max(16, -(-n // target_cluster_size))


def semantic_duplicates(
    embeddings: DataFrame,
    n_centroids: int | None = None,
    iters: int = 3,
    threshold: float = 0.95,
    cluster_cap: int = 4096,
    centroids=None,
    target_cluster_size: int = 32,
    health_gate: bool = False,
) -> DataFrame:
    """SemDeDup-shape semantic dedup (Abbas et al. 2023): k-means-cluster
    the embedding space (the exact-decimal distributed Lloyd trainer —
    or a FROZEN centroid set via ``centroids``, the incremental twin's
    reference), compute pairwise cosine ONLY within each cluster,
    connect pairs ≥ ``threshold`` into semantic groups
    (large-star/small-star connected components — transitive, the
    clean_corpus convention), and keep the minimum vec_id of each
    group. Returns one row per vector: (vec_id, cluster, component,
    kept).

    Scale shape: clustering bounds the pair space at Σ|cluster|²
    instead of n² — SemDeDup's core trick; k is chosen ∝ n (LAION-scale
    runs use tens of thousands of clusters) so per-cluster pair counts
    stay bounded, and clusters above ``cluster_cap`` are additionally
    chunk-pair TILED (vec_id % n_chunks, see _semantic_pairs) so one
    join task never holds more than ~2·cap vectors. Everything is one
    cluster-key self-join + the O(log n) component rounds; the cosine
    is the fixed-order ``dot`` fold with the round-6 decimal snap, so a
    DuckDB twin (Lloyd CTE chain + within-cluster join + reachability
    closure) replays the output hash-exact.

    ``n_centroids=None`` (the default) applies the k ∝ n recipe
    automatically: one count job, then ``semdedup_auto_k(n,
    target_cluster_size)`` — expected cluster size stays at the
    probe-measured constant however big the corpus is. Pass an explicit
    k to pin it (the boarded oracle does, since the CTE twin unrolls a
    fixed cluster count).
    """
    from .graph import connected_components

    if health_gate:
        # whole-corpus pre-flight with named vec_ids BEFORE the Lloyd
        # trainer launches (see similarity.assert_embedding_health)
        from .similarity import assert_embedding_health

        assert_embedding_health(embeddings, who="semantic_duplicates")
    if centroids is None and n_centroids is None:
        n_centroids = semdedup_auto_k(
            embeddings.count(), target_cluster_size
        )
    base = _semantic_base(embeddings, n_centroids or 0, iters, centroids)
    pairs = _semantic_pairs(base, threshold, cluster_cap)
    comp = connected_components(pairs, src="a", dst="b")
    return (
        base.select("vec_id", "cluster")
        .join(
            comp.select(F.col("node").alias("vec_id"), "component"),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            "cluster",
            F.coalesce(F.col("component"), F.col("vec_id"))
            .cast("long")
            .alias("component"),
            (
                F.coalesce(F.col("component"), F.col("vec_id"))
                == F.col("vec_id")
            ).alias("kept"),
        )
    )


def initial_semantic_catalog(spark) -> DataFrame:
    """Empty survivor catalog for semantic_dedup_increment."""
    return spark.createDataFrame(
        [], "vec_id long, cluster long, emb array<double>, nrm double"
    )


def semantic_dedup_increment(
    new_vectors: DataFrame,
    centroids,
    kept_catalog: DataFrame,
    threshold: float = 0.95,
    cluster_cap: int = 4096,
) -> tuple:
    """CDC twin of ``semantic_duplicates`` over FROZEN centroids: screen
    only the ARRIVING vectors — first batch-internally (within-cluster
    pairs → components → min-id survivors), then against the persisted
    per-cluster survivor catalog (any catalog vector at cosine ≥
    threshold drops the arrival). Returns (survivors DataFrame[vec_id,
    cluster], new_catalog) — union the catalog forward like
    dedup_incremental's fingerprint catalog.

    Scale shape: arrivals-only work — the batch assigns map-side
    against broadcast centroids, batch-internal pairs are
    batch-bounded, and the catalog screen BROADCASTS the (small) batch
    survivor set into one map-side scan of the catalog: no catalog
    shuffle, no history reprocessing. Replay contract (pytest): with
    arrivals in ascending vec_id order, accumulated survivors are
    always a SUPERSET of the frozen-centroid batch run's kept set, and
    EXACTLY equal when semantic groups are threshold-cliques (e.g.
    exact duplicates) or arrive within one batch — transitive chains
    that span batches are the first-arrival caveat shared with every
    streaming twin in this repo (a mid-chain survivor already in the
    catalog keeps screening later arrivals, so the gap never compounds).
    """
    from .graph import connected_components

    base = _semantic_base(new_vectors, 0, 0, centroids)
    pairs = _semantic_pairs(base, threshold, cluster_cap)
    comp = connected_components(pairs, src="a", dst="b")
    # persisted diamond (r15): the survivor set feeds the catalog screen
    # (via bs), the anti-join left side AND — through the returned
    # catalog — the NEXT increment's screen; without the persist each
    # consumer re-ran the base⋈components attach. Batch-bounded by the
    # same small-batch premise that broadcasts bs below.
    batch_surv = track_persist(
        base.join(
            comp.select(F.col("node").alias("vec_id"), "component"),
            "vec_id",
            "left",
        )
        .filter(
            F.coalesce(F.col("component"), F.col("vec_id")) == F.col("vec_id")
        )
        .select("vec_id", "cluster", "emb", "nrm")
    )
    bs = batch_surv.select(
        F.col("vec_id").alias("a"), "cluster",
        F.col("emb").alias("ea"), F.col("nrm").alias("na"),
    )
    cat = kept_catalog.select(
        "cluster", F.col("emb").alias("eb"), F.col("nrm").alias("nb")
    )
    dropped = (
        cat.join(F.broadcast(bs), "cluster")
        .withColumn("cos", _semantic_cos("ea", "eb", "na", "nb"))
        .filter(F.col("cos") >= F.lit(threshold))
        .select(F.col("a").alias("vec_id"))
        .distinct()
    )
    # dropped is bounded by the batch survivor count (its ids come from
    # the broadcast bs side) — the same small-batch premise that
    # broadcasts bs makes the anti-join build side broadcastable, and
    # without the hint the post-shuffle distinct has unknown size stats
    # so Catalyst planned a SortMergeJoin of survivors against it
    final = batch_surv.join(F.broadcast(dropped), "vec_id", "left_anti")
    new_catalog = kept_catalog.unionByName(
        final.select("vec_id", "cluster", "emb", "nrm")
    )
    return final.select("vec_id", "cluster"), new_catalog


def semantic_decontaminate(
    embeddings: DataFrame, benchmark: DataFrame, threshold: float = 0.92
) -> DataFrame:
    """Embedding-level benchmark decontamination: per corpus vector, the
    maximum cosine against ANY benchmark vector (+ a threshold flag) —
    the semantic twin of shingle ``decontaminate``, catching eval
    leakage that survives paraphrase (where no shingle matches).

    Scale shape: the benchmark matrix broadcasts (eval suites are small
    by definition — the same asymmetry text decontamination rides), and
    each corpus partition runs ONE normalized GEMM + row-wise max, so
    the whole operator is map-only: zero shuffles, one row out per
    corpus vector, corpus touched exactly once. Rounding is the
    ann_topk kernel's half-away-from-zero snap to 6 decimals, so the
    DuckDB twin (cross join + list_dot_product + max) replays the
    scores and flags exactly.

    Zero-norm contract (pytest-asserted): zero-norm BENCHMARK vectors
    are dropped before the GEMM (no direction ⇒ cannot indicate
    contamination; dropping them all falls back to the empty-benchmark
    path), and a zero-norm CORPUS vector gets max_cos = NULL with
    contaminated = false — never NaN, never a silent flag.
    """
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    qpdf = benchmark.select("vec_id", "embedding").toPandas()
    corpus = ensure_parallelism(embeddings.select("vec_id", "embedding"))
    if not qpdf.empty:
        from .similarity import stack_embeddings

        q_mat = stack_embeddings(
            qpdf["embedding"].to_numpy(), "semantic_decontaminate benchmark",
            ids=list(qpdf["vec_id"]),
        )
        q_norms = np.linalg.norm(q_mat, axis=1, keepdims=True)
        _qok = np.isfinite(q_norms[:, 0]) & (q_norms[:, 0] > 0.0)
        q_mat = q_mat[_qok] / q_norms[_qok]
    if qpdf.empty or not len(q_mat):
        return corpus.select(
            "vec_id",
            F.lit(None).cast("double").alias("max_cos"),
            F.lit(False).alias("contaminated"),
        )
    bc = spark.sparkContext.broadcast(q_mat)

    def kern(batches):
        q = bc.value
        for pdf in batches:
            ids = np.asarray(pdf["vec_id"], dtype=np.int64)
            from .similarity import stack_embeddings as _stk

            m = _stk(
                pdf["embedding"].to_numpy(),
                "semantic_decontaminate corpus", ids=list(ids),
                dim=q.shape[1],
            )
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            ok = np.isfinite(norms[:, 0]) & (norms[:, 0] > 0.0)
            m = np.where(ok[:, None], m / np.where(ok[:, None], norms, 1.0), 0.0)
            sims = m @ q.T
            # half-away-from-zero round to 6, matching DuckDB/Spark round()
            sims = np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6
            # nullable Float64 so zero-norm rows reach Spark as NULL
            # (a raw NaN would survive Arrow as NaN)
            maxes = pd.array(sims.max(axis=1), dtype="Float64")
            maxes[~ok] = pd.NA
            yield pd.DataFrame({"vec_id": ids, "max_cos": maxes})

    out = corpus.mapInPandas(kern, "vec_id long, max_cos double")
    return out.select(
        "vec_id",
        "max_cos",
        F.coalesce(
            F.col("max_cos") >= F.lit(threshold), F.lit(False)
        ).alias("contaminated"),
    )
