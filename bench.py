"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE compact JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
The per-run detail ("runs") goes to BENCH_summary.json next to this file
instead of stdout — r5's driver tail-capture truncated the stdout line
mid-JSON because the runs dict made it huge ("parsed": null); the compact
line always fits a bounded tail.

Each query runs three times after a session warm-up and reports the best
run — the steady-state query cost, excluding the first-execution
codegen/JIT of each plan shape and this container's bursty CPU throttling
(back-to-back identical runs have been observed to differ 3-10x under
load, sometimes inflating an entire best-of-2 pair). All raw runs are
recorded in the "runs" key for inspection. Timings include full
action execution (count) but not session startup; the cache is cleared
between runs so persisted intermediates never carry over.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("pqx-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    # headline set: engine core (metadata levels) + one per extension family
    headline = [
        "meta_parquet_file",
        "meta_rowgroup",
        "meta_column",
        "meta_page",
        "page_plain_decode",
        "page_content_scan",
        "dedup_exact",
        "dedup_minhash",
        "dedup_ngram_jaccard",
        "dedup_embedding",
        "ann_topk",
        "ann_int8",
        "ann_ivfpq",
        "ann_ivfpq_probe",
        "semantic_increment",
        "dsir_resample",
        "multimodal_neardup",
        "text_bm25",
        "split_leakage_safe",
        "hybrid_rrf",
        "text_bm25_probe",
        # r12: the corpus-sized retrieval pair + the fsck seat get
        # driver-visible bench rows (r11 verdict #3/#6) so drift on the
        # biggest corpus-scale operators is recorded per-round
        "bm25_more_like_this",
        "bm25_index_fsck",
        "text_heavyhitters",
        "text_chunks",
        "quality_classifier",
        "text_stats",
        "text_langid",
        "text_tokens",
        "text_fingerprint",
        "multimodal_decode",
        "events_windowed",
        "events_sessionize",
        "events_asof",
        "events_range_join",
        "text_decontaminate",
        "dedup_lines",
        "dedup_substring",
        "text_logprob2",
        "cluster_assign",
        "text_quality_filter",
        "events_gapfill_by_type",
        "knn_graph",
        "dataset_card",
        "source_overlap",
        "text_bpe",
        "text_bpe_encode1k",
        "profile_lineitem",
        "events_trending",
        "tpch_q1",
        "tpch_q5",
        "tpch_q10",
        "tpch_q13",
        "tpch_q9",
        "tpch_q21",
        "window_rolling",
        "window_top_orders",
        "rollup_orders",
        "supplier_part_revenue",
    ]

    # warm-up: JVM codegen AND the Python worker pool — a mapInPandas pass
    # forks one worker per core and pays the numpy/pandas import there, so
    # per-query timings measure query cost, not interpreter startup
    spark.range(1000).selectExpr("sum(id)").collect()

    def _warm(batches):
        import numpy  # noqa: F401
        import pandas as pd

        for b in batches:
            yield pd.DataFrame({"id": b["id"]})

    (
        spark.range(0, int(cpus) * 4, 1, int(cpus))
        .mapInPandas(_warm, "id long")
        .count()
    )

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in headline:
        fn = queries[name]
        runs[name] = []
        if name == "ann_ivfpq_probe":
            # serve-latency row: pre-build the per-sf cached index once,
            # untimed, so all three timed runs probe from disk (the
            # separate ann_ivfpq_build row times the build)
            fn(spark, sf_dir).count()
            spark.catalog.clearCache()
        # best-of-3 since r5: the container's throttle bursts were observed
        # inflating BOTH runs of a best-of-2 pair (isolated re-runs settle
        # at the steady-state number on the 2nd-3rd attempt; BASELINE.md)
        for _ in range(3):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            n = df.count()
            runs[name].append(round(time.monotonic() - t0, 3))
            # operators persist reusable intermediates; drop them between
            # runs/queries so measurements are independent
            spark.catalog.clearCache()
        timings[name] = min(runs[name])
        print(f"# {name}: {timings[name]:.3f}s best of {runs[name]} ({n} rows)", file=sys.stderr)

    # IVF-PQ build row: training + code materialization to a fresh path
    # each run — the other half of the build/serve split (the probe row
    # above is pure serve). Uses the board operating-point parameters.
    import shutil
    import tempfile

    from parquet_metadata_explorer_spark.operators import similarity

    emb = entrymod._table(spark, sf_dir, "embeddings")
    runs["ann_ivfpq_build"] = []
    for _ in range(3):
        bpath = tempfile.mkdtemp(prefix="pqx_bench_ivfpq_") + "/ix"
        t0 = time.monotonic()
        similarity.write_ivfpq_index(
            emb,
            bpath,
            k_cells=entrymod.IVFPQ_CELLS,
            m=entrymod.PQ_M,
            n_centroids=entrymod.PQ_K,
            iters=entrymod.PQ_ITERS,
            coarse_iters=entrymod.IVFPQ_CITERS,
        )
        runs["ann_ivfpq_build"].append(round(time.monotonic() - t0, 3))
        shutil.rmtree(os.path.dirname(bpath), ignore_errors=True)
        spark.catalog.clearCache()
    timings["ann_ivfpq_build"] = min(runs["ann_ivfpq_build"])
    print(
        f"# ann_ivfpq_build: {timings['ann_ivfpq_build']:.3f}s best of "
        f"{runs['ann_ivfpq_build']}",
        file=sys.stderr,
    )

    # hybrid_knn_graph row (r12): the corpus-sized hybrid related-items
    # fusion (MoreLikeThis + LSH kNN graph under RRF) — not a queries()
    # entry (its fusion exactness is pytest-recomputed from the two
    # component rank tables), so it gets its own timed block here.
    docs = entrymod._table(spark, sf_dir, "documents")
    runs["hybrid_knn_graph"] = []
    for _ in range(3):
        t0 = time.monotonic()
        n = similarity.hybrid_knn_graph(docs, emb, k=10, k_each=20).count()
        runs["hybrid_knn_graph"].append(round(time.monotonic() - t0, 3))
        spark.catalog.clearCache()
    timings["hybrid_knn_graph"] = min(runs["hybrid_knn_graph"])
    print(
        f"# hybrid_knn_graph: {timings['hybrid_knn_graph']:.3f}s best of "
        f"{runs['hybrid_knn_graph']} ({n} rows)",
        file=sys.stderr,
    )

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    summary = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # full detail (raw runs) to a file the tail capture can't truncate
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_summary.json"), "w") as f:
            json.dump({**summary, "runs": runs}, f, indent=1)
    except OSError:
        pass
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
