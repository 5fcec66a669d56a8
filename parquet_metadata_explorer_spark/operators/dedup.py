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

from ..functions import cosine, hash60, normalize_text, tokens, word_shingles

MINHASH_K = 32  # signature length
MINHASH_BANDS = 8  # 8 bands x 4 rows: P(candidate) = 1-(1-j^4)^8
SHINGLE_WORDS = 3
SIMHASH_BITS = 60
SIMHASH_BANDS = 4


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Groups of byte-identical (after normalization) documents.

    Returns one row per duplicate group: fingerprint, group size, kept id
    (min), and the dropped ids — the classic first-pass dedup at any scale.
    """
    fp = documents.select(
        F.col("doc_id"), F.md5(normalize_text(F.col("text"))).alias("fingerprint")
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _minhash_signature(shingles):
    """k minhash values as md5-hex strings (string-min ≡ uniform-hash min;
    portable to DuckDB's list_min(list_transform(...))."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s, i=i: F.md5(F.concat(s, F.lit(f"#{i}"))))
            )
            for i in range(MINHASH_K)
        ]
    )


def minhash_signatures(documents: DataFrame) -> DataFrame:
    toks = tokens(F.col("text"))
    shingles = word_shingles(toks, SHINGLE_WORDS)
    return documents.select(
        "doc_id",
        shingles.alias("shingles"),
    ).filter(F.size("shingles") > 0).withColumn(
        "signature", _minhash_signature(F.col("shingles"))
    )


def minhash_lsh_pairs(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    Scale path: the band explode multiplies rows by MINHASH_BANDS only;
    the bucket groupBy shuffles on (band, signature) — uniform keys. The
    verify join re-joins shingle sets per *candidate pair only*, never all
    pairs. At 100 TB the verify side stays proportional to candidate count.
    """
    rows_per_band = MINHASH_K // MINHASH_BANDS
    sigs = minhash_signatures(documents)

    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                        )
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("band_id", "band_sig"),
    )
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
            F.round(
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
    toks = documents.select(
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
    bands = simhash_bands(documents)
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


def ngram_jaccard_pairs(
    documents: DataFrame, threshold: float = 0.3, max_doc_freq: int = 100
) -> DataFrame:
    """Exact n-gram Jaccard similarity via inverted-index self-join.

    ``max_doc_freq`` drops shingles appearing in more than that many docs —
    the skew guard: a stop-shingle shared by 1M docs would otherwise
    produce 10^12 join rows. Dropping ubiquitous shingles only *lowers*
    recall for pairs that share nothing rare, which is the standard
    trade-off at corpus scale.
    """
    sh = (
        documents.select("doc_id", word_shingles(tokens(F.col("text")), SHINGLE_WORDS).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    sizes = sh.select("doc_id", F.size("sh").cast("long").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("sh").alias("shingle"))
    rare = inv.groupBy("shingle").agg(F.count("*").alias("df")).filter(
        F.col("df") <= max_doc_freq
    )
    inv = inv.join(rare.select("shingle"), "shingle")
    l, r = inv.alias("l"), inv.alias("r")
    common = (
        l.join(
            r,
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )
    return out


def embedding_near_duplicates(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup pairs.

    Exact pair scan (self-join on id inequality). At 100 TB use
    ``similarity.lsh_buckets`` to restrict the pair space first; this exact
    variant is the verification kernel both paths share.
    """
    e = embeddings.select("vec_id", "embedding")
    l = e.withColumnRenamed("vec_id", "vec_a").withColumnRenamed("embedding", "emb_a")
    r = e.withColumnRenamed("vec_id", "vec_b").withColumnRenamed("embedding", "emb_b")
    pairs = l.join(r, F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.withColumn("cos", F.round(cosine(F.col("emb_a"), F.col("emb_b")), 4))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )
