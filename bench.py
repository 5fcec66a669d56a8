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

A constant-work no-I/O calibration probe runs before and after the set
and its timings are recorded under "calibration" (r12 verdict #4): the
probe's cost moves only with ambient machine load, so a consumer can
normalize one window's capture against another's, and if the probe
drifts >1.3x across the set the harness runs one bounded retry pass
(min-merged) so a mid-set throttle burst doesn't stand as the record.
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
        # r13: the second index's fsck seat (r12 verdict #3)
        "ivfpq_index_verify",
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

    def _calib_once() -> float:
        t0 = time.monotonic()
        spark.range(0, 800_000_000, 1, int(cpus)).selectExpr(
            "count(if(pmod(id, 9) = 0, id, null)) AS n"
        ).collect()
        return time.monotonic() - t0

    def _calibrate() -> float:
        """Constant-work, no-I/O probe (whole-stage-codegen aggregate
        over an in-memory range): its STEADY-STATE FLOOR moves only
        with ambient machine load, never with this repo's code, so
        before/after samples let any consumer normalize this window's
        numbers against another window's (r12 verdict #4 — two rounds
        of driver captures landed in throttled windows and the quiet
        record then had to explain the gap). MIN of 5 after one
        untimed warm run: the first design (median of 3, no warm-up)
        read the session's own JIT warm-up as 2.9x 'drift' — the
        before sample ran against a cold JVM and the after sample
        against one warmed by thousands of compiled stages; the floor
        is insensitive to warm-up direction AND to single bursts,
        so a ratio above the retry bar means sustained external load,
        the only thing worth retrying for."""
        _calib_once()  # warm this plan's codegen, untimed
        return round(min(_calib_once() for _ in range(5)), 3)

    calib_before = _calibrate()
    print(f"# calibration before: {calib_before:.3f}s", file=sys.stderr)

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}

    def _time_query(name: str) -> int:
        fn = queries[name]
        t0 = time.monotonic()
        n = fn(spark, sf_dir).count()
        runs[name].append(round(time.monotonic() - t0, 3))
        # operators persist reusable intermediates; drop them between
        # runs/queries so measurements are independent
        spark.catalog.clearCache()
        return n

    for name in headline:
        runs[name] = []
        if name == "ann_ivfpq_probe":
            # serve-latency row: pre-build the per-sf cached index once,
            # untimed, so all three timed runs probe from disk (the
            # separate ann_ivfpq_build row times the build)
            queries[name](spark, sf_dir).count()
            spark.catalog.clearCache()
        # best-of-3 since r5: the container's throttle bursts were observed
        # inflating BOTH runs of a best-of-2 pair (isolated re-runs settle
        # at the steady-state number on the 2nd-3rd attempt; BASELINE.md)
        for _ in range(3):
            n = _time_query(name)
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
    # fusion (MoreLikeThis + LSH kNN graph under RRF) at the HEAVY
    # operating point (k=10, k_each=20). Since r13 the operator is also
    # an oracled queries() entry, but at board parameters (k_each=5,
    # chosen so its oracle's dense CTE layer reproduces knn_graph's
    # boarded chain verbatim); this block keeps the r12 row's operating
    # point so the bench series stays comparable round-over-round.
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

    # hybrid_knn_graph_served row (r13): the SAME corpus-sized fusion
    # served entirely from the materialized indexes (MoreLikeThis over
    # committed postings + IVF-PQ ADC probe, RRF-fused) — the
    # production maintenance path. Same operating point as the
    # in-memory row (k=10, k_each=20) so the two are comparable; both
    # per-sf index caches are ensured (untimed) first, so this times
    # SERVE, not build.
    queries["text_bm25_probe"](spark, sf_dir).count()
    queries["ann_ivfpq_probe"](spark, sf_dir).count()
    spark.catalog.clearCache()
    bm25_p = entrymod._bm25_index_path(sf_dir)
    ivfpq_p = entrymod._ivfpq_index_path(sf_dir)
    runs["hybrid_knn_graph_served"] = []
    for _ in range(3):
        t0 = time.monotonic()
        n = similarity.hybrid_knn_graph_from_index(
            spark, bm25_p, ivfpq_p, emb,
            k=10, k_each=20, n_probe=entrymod.IVFPQ_PROBE,
        ).count()
        runs["hybrid_knn_graph_served"].append(
            round(time.monotonic() - t0, 3)
        )
        spark.catalog.clearCache()
    timings["hybrid_knn_graph_served"] = min(runs["hybrid_knn_graph_served"])
    print(
        f"# hybrid_knn_graph_served: "
        f"{timings['hybrid_knn_graph_served']:.3f}s best of "
        f"{runs['hybrid_knn_graph_served']} ({n} rows)",
        file=sys.stderr,
    )

    calib_after = _calibrate()
    print(f"# calibration after: {calib_after:.3f}s", file=sys.stderr)
    # ONE-SIDED trigger: retry only when the window got WORSE
    # (after >> before = load arrived mid-set and the later rows'
    # best-of-3 likely never saw a quiet run). after << before is the
    # session's own JVM warming globally across the set — measured
    # 1.4-2.9x on a quiet machine — and needs no retry; consumers
    # normalizing against another window should use after_sec, the
    # warmed floor.
    drift = round(calib_after / max(calib_before, 1e-9), 3)
    calibration = {
        "probe": "range-800M-pmod-count (constant work, no I/O)",
        "before_sec": calib_before,
        "after_sec": calib_after,
        "drift_ratio": drift,
        "retried": False,
    }
    if drift > 1.3:
        # the window's load shifted mid-set: one bounded retry pass
        # (single run per headline query, min-merged) lets queries that
        # landed in the loaded stretch recover their steady-state best;
        # the custom build rows keep their best-of-3 (a retry would
        # double the most expensive block for the least throttle-prone
        # measurements — training is long enough to average bursts out)
        calibration["retried"] = True
        print(
            f"# calibration drift {drift}x > 1.3 — one retry pass",
            file=sys.stderr,
        )
        for name in headline:
            _time_query(name)
            timings[name] = min(runs[name])
        calibration["final_sec"] = _calibrate()

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    summary = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calibration": calibration,
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
