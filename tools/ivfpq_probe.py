"""IVF-PQ sub-linearity probe: scored-candidate rows vs n_probe.

The r6 verdict's requirement for the IVF×PQ composition: show that the
number of candidate rows a query scores is proportional to
n_probe/k_cells of the corpus, NOT the corpus — the property flat PQ
lacks (pq_ann_topk scores every code row per query). Replicates the
sf embeddings 16x (the int8 probe's norm-preserving rotation trick),
builds one IVF-PQ index, and for each n_probe counts the exact
candidate set (sum of probed-cell sizes per query) plus wall time for
the full top-k.

Prints one JSON line. Usage: python tools/ivfpq_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [0, 1, 2, 3, 4]
K_CELLS = 16


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.operators import similarity

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("pqx-ivfpq-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(base.select("embedding").first()[0])

    def replica(i: int):
        rot = F.concat(
            F.slice("embedding", i % dim + 1, dim - i % dim),
            F.slice("embedding", 1, i % dim),
        )
        return base.select(
            (F.col("vec_id") + i * 10**9).alias("vec_id"),
            (rot if i else F.col("embedding")).alias("embedding"),
        )

    e = replica(0)
    for i in range(1, 16):
        e = e.unionByName(replica(i))
    e = e.repartition(int(cpus)).cache()
    n = e.count()

    cc, cells, _pq_cb, _pq_codes = similarity.ivfpq_index(e, k_cells=K_CELLS)
    sizes = {r.cell: r.n for r in cells.groupBy("cell").agg(
        F.count("*").alias("n")).collect()}
    qemb = {r.vec_id: [float(x) for x in r.embedding]
            for r in e.filter(F.col("vec_id").isin(QUERIES)).collect()}

    out = {"sf": sf_dir, "n_vectors": n, "k_cells": K_CELLS}
    for n_probe in (2, 4, 8, 16):
        cand = 0
        for qid, qv in qemb.items():
            d2s = sorted(
                (sum((a - b) * (a - b) for a, b in zip(qv, cv)), cell)
                for cell, cv in cc.items()
            )
            cand += sum(sizes.get(cell, 0) for _d, cell in d2s[:n_probe])
        t0 = time.monotonic()
        similarity.ivfpq_ann_topk(
            e, QUERIES, k=10, k_cells=K_CELLS, n_probe=n_probe
        ).collect()
        dt = time.monotonic() - t0
        out[f"probe{n_probe}"] = {
            "scored_candidates": cand,
            "corpus_rows_x_queries": n * len(QUERIES),
            "frac_of_corpus": round(cand / (n * len(QUERIES)), 4),
            "topk_sec": round(dt, 2),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
