"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query runs once after a session warm-up; timings include full action
execution (collect/count) but not session startup.
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
        "dedup_exact",
        "dedup_minhash",
        "dedup_ngram_jaccard",
        "dedup_embedding",
        "ann_topk",
        "text_stats",
        "text_langid",
        "text_tokens",
        "text_fingerprint",
        "multimodal_decode",
        "events_windowed",
        "events_sessionize",
        "events_asof",
        "tpch_q1",
        "tpch_q5",
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
    for name in headline:
        fn = queries[name]
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
        # operators persist reusable intermediates; drop them between
        # queries so measurements are independent
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
