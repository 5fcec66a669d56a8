"""IVF-PQ recall grid: recall@10 vs (n_probe, rerank) against exact
brute-force cosine — the measurement behind the r8 operating-point
choice (n_probe=8, rerank=80) and ARCHITECTURE.md's probe table.

ADC-only recall saturates near 0.22 on the noise-heavy synthetic
corpus regardless of n_probe (PQ quantization error dominates cell
misses); the IVFADC-R exact rerank is the recall lever. Prints one
JSON line. Usage: python tools/ivfpq_recall_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [0, 1, 2, 3, 4]
GRID = [(4, 0), (8, 0), (12, 0), (4, 40), (8, 40), (8, 80), (12, 80)]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    from pyspark.sql import SparkSession

    from parquet_metadata_explorer_spark.operators import similarity

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .appName("pqx-ivfpq-recall")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    exact = {}
    for r in similarity.cosine_topk(e, QUERIES, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    denom = sum(len(v) for v in exact.values())

    out = {"sf": sf_dir, "k": 10, "k_cells": 16, "m": 8, "n_centroids": 32}
    for n_probe, rerank in GRID:
        t0 = time.monotonic()
        rows = similarity.ivfpq_ann_topk(
            e, QUERIES, k=10, k_cells=16, n_probe=n_probe,
            m=8, n_centroids=32, rerank=rerank,
        ).collect()
        dt = time.monotonic() - t0
        got = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        rec = sum(len(got.get(q, set()) & exact[q]) for q in exact) / denom
        out[f"probe{n_probe}_rerank{rerank}"] = {
            "recall": round(rec, 3),
            "sec": round(dt, 2),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
