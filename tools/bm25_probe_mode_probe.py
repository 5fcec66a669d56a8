"""Measure the bm25_probe_topk driver-vs-distributed crossover (r13
verdict #5 — the ADC-threshold discipline applied to the lexical
probe).

``query_mode="driver"`` tokenizes the query set driver-side and pushes
static bucket/term IN-lists (low fixed latency, but collect + IN-list
planning grow with |Q|); ``"distributed"`` never collects and joins
the scans on (bucket, term) (flat in |Q|, higher fixed job cost).
``"auto"`` flips at BM25_PROBE_DRIVER_MAX. This probe times both modes
best-of-3 at growing |Q| (queries drawn from the corpus itself, the
adversarial shape: long texts -> many terms -> widest IN-lists) and
prints one JSON line; the chosen threshold is recorded next to the
constant in operators/text.py.

Run: python tools/bm25_probe_mode_probe.py [sf_dir]
"""

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SIZES = (32, 128, 512, 2000)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    tmp = tempfile.mkdtemp(prefix="pqx_bm25_mode_probe_")
    path = f"{tmp}/bm25"
    write_bm25_index(docs, path)

    report = {"sf_dir": sf, "corpus": n, "points": []}
    for size in SIZES:
        qdf = docs.orderBy("doc_id").limit(size).select(
            F.col("doc_id").alias("query_id"), "text"
        )
        # replicate ids past the corpus when size > n so |Q| is honest
        point = {"n_queries": min(size, n)}
        for mode in ("driver", "distributed"):
            best = None
            for _ in range(3):
                t0 = time.monotonic()
                bm25_probe_topk(
                    spark, path, qdf, k=10, query_mode=mode
                ).count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            point[mode] = round(best, 3)
        point["ratio_driver_over_dist"] = round(
            point["driver"] / point["distributed"], 3
        )
        report["points"].append(point)
        print(json.dumps(point))
    print(json.dumps(report))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
