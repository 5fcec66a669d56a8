"""Measure the hybrid_knn_graph_served bench row in isolation (r14).

The row is bench-only (not a queries() entry), so opt_measure can't
time it. This probe replays bench.py's block exactly — both index
caches ensured untimed, then best-of-N of the fused count — and
additionally captures the plan (the distributed-ADC join shape never
had a plans/r14 capture) and the Spark job count per run.

Usage: python tools/served_graph_probe.py [--tag before] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

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
        .appName("pqx-served-graph-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from parquet_metadata_explorer_spark.operators import similarity

    queries = entrymod.queries()

    # same warm-up as bench.py
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

    # ensure both index caches, untimed (bench.py's exact protocol)
    queries["text_bm25_probe"](spark, sf_dir).count()
    queries["ann_ivfpq_probe"](spark, sf_dir).count()
    spark.catalog.clearCache()

    emb = entrymod._table(spark, sf_dir, "embeddings")
    bm25_p = entrymod._bm25_index_path(sf_dir)
    ivfpq_p = entrymod._ivfpq_index_path(sf_dir)

    def build():
        return similarity.hybrid_knn_graph_from_index(
            spark, bm25_p, ivfpq_p, emb,
            k=10, k_each=20, n_probe=entrymod.IVFPQ_PROBE,
        )

    plan = build()._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pfile = os.path.join(
        HERE, "plans", "r14", f"hybrid_knn_graph_served_{args.tag}.txt"
    )
    with open(pfile, "w") as f:
        f.write(plan)
    spark.catalog.clearCache()

    tracker = spark.sparkContext.statusTracker()
    rec = {"count": [], "jobs": None}
    for i in range(args.runs):
        group = f"served-{i}"
        spark.sparkContext.setJobGroup(group, "hybrid_knn_graph_served")
        t0 = time.monotonic()
        n = build().count()
        rec["count"].append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobGroup(None, None)
        rec["jobs"] = len(tracker.getJobIdsForGroup(group))
        spark.catalog.clearCache()
    rec["rows"] = n
    rec["best"] = min(rec["count"])
    for mark in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
                 "Exchange", "BatchEvalPython"):
        rec[mark] = plan.count(mark)
    print(json.dumps({"query": "hybrid_knn_graph_served",
                      "tag": args.tag, **rec}))
    spark.stop()


if __name__ == "__main__":
    main()
