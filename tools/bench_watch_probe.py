"""Drift-protocol probe for flagged bench rows (r13 verdict #3).

The r13 driver capture flagged three rows vs r12 — events_windowed
(6.4x), multimodal_decode (3.4x), events_sessionize (1.7x) — all in
code untouched that round, with the capture's own calibration stamp
shifting 1.7x mid-run (the ambient-throttle signature). The drift
protocol owes each an ISOLATED best-of-3 next to STABLE CONTROL rows
in one quiet session, normalized by the calibration floor, recorded in
BASELINE.md: a watch row that re-reads at its old number while the
controls hold is cleared as ambient; one that stays high while
controls hold is a real regression to root-cause.

Run: python tools/bench_watch_probe.py [watch1 watch2 ...]
(defaults to the r13 watches + controls; env SPARK_GRAFT_SF_DIR /
SPARK_GRAFT_CPUS as bench.py)
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

WATCHES = ["events_windowed", "multimodal_decode", "events_sessionize",
           "hybrid_knn_graph_served"]
CONTROLS = ["events_asof", "text_chunks", "tpch_q1"]


def main():
    names = sys.argv[1:] or (WATCHES + CONTROLS)
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
        .appName("pqx-bench-watch")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
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

    _calib_once()
    calib_before = round(min(_calib_once() for _ in range(5)), 3)
    out = {"sf": sf_dir, "cpus": cpus, "calibration_before": calib_before,
           "rows": {}}
    def _served_split():
        """hybrid_knn_graph_served warm/cold split (r13 verdict #4):
        the bench row's 3x run-to-run variance mixes the one-time
        cached index BUILD (+ first-open page-cache misses) with the
        steady serve cost. Measure them apart: wipe the per-sf cached
        indexes, time the ensure (build) alone, time the FIRST serve
        (cold file cache), then best-of-3 warm serves."""
        import shutil

        from parquet_metadata_explorer_spark.operators import similarity

        bm25_p = entrymod._bm25_index_path(sf_dir)
        ivfpq_p = entrymod._ivfpq_index_path(sf_dir)
        shutil.rmtree(bm25_p, ignore_errors=True)
        shutil.rmtree(ivfpq_p, ignore_errors=True)
        emb = entrymod._table(spark, sf_dir, "embeddings")
        t0 = time.monotonic()
        queries["text_bm25_probe"](spark, sf_dir).count()
        queries["ann_ivfpq_probe"](spark, sf_dir).count()
        ensure_sec = round(time.monotonic() - t0, 3)
        spark.catalog.clearCache()
        rs = []
        for _ in range(4):
            t0 = time.monotonic()
            similarity.hybrid_knn_graph_from_index(
                spark, bm25_p, ivfpq_p, emb,
                k=10, k_each=20, n_probe=entrymod.IVFPQ_PROBE,
            ).count()
            rs.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
        return {
            "ensure_build_sec": ensure_sec,
            "serve_cold": rs[0],
            "serve_runs": rs,
            "warm_best": min(rs[1:]),
        }

    for name in names:
        if name == "hybrid_knn_graph_served":
            entry = _served_split()
        else:
            rs = []
            n_runs = int(os.environ.get("PQX_WATCH_RUNS", "3"))
            for _ in range(n_runs):
                t0 = time.monotonic()
                queries[name](spark, sf_dir).count()
                rs.append(round(time.monotonic() - t0, 3))
                spark.catalog.clearCache()
            entry = {"runs": rs, "best": min(rs)}
        out["rows"][name] = entry
        print(f"# {name}: {entry}", file=sys.stderr)
    _calib_once()
    out["calibration_after"] = round(
        min(_calib_once() for _ in range(5)), 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
