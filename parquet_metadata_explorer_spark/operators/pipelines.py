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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_duplicates, minhash_lsh_pairs
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
    n_input = documents.count()

    quality = (
        text_stats(documents)
        .filter(F.col("quality_score") >= min_quality)
        .select("doc_id")
    )
    kept_q = documents.join(quality, "doc_id", "left_semi")
    n_quality = kept_q.count()

    exact_drops = (
        exact_duplicates(kept_q)
        .select(F.explode("doc_ids").alias("doc_id"), "keep_doc_id")
        .filter(F.col("doc_id") != F.col("keep_doc_id"))
        .select("doc_id")
    )
    kept_e = kept_q.join(exact_drops, "doc_id", "left_anti")
    n_exact = kept_e.count()

    pairs = minhash_lsh_pairs(kept_e, threshold=near_dup_threshold)
    clusters = connected_components(pairs, src="doc_a", dst="doc_b")
    near_drops = clusters.filter(
        F.col("node") != F.col("component")
    ).select(F.col("node").alias("doc_id"))
    kept_n = kept_e.join(near_drops, "doc_id", "left_anti")
    n_near = kept_n.count()

    if out_path is not None:
        kept_n.write.mode(mode).parquet(out_path)

    return {
        "input": n_input,
        "after_quality": n_quality,
        "after_exact": n_exact,
        "after_near_dup": n_near,
    }
