"""Semantic-dedup pair-space probe: measures the SemDeDup reduction —
within-cluster pairs Σ c_i·(c_i−1)/2 vs the all-pairs n·(n−1)/2 a flat
scan would score — plus wall time, at 1× and 16× (rotated-replica)
corpus scale, and the tiling fan-out under a small cluster_cap.

Prints one JSON line. Usage: python tools/semdedup_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.operators import similarity
    from parquet_metadata_explorer_spark.operators.dedup import (
        semantic_duplicates,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("pqx-semdedup-probe")
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

    out = {"sf": sf_dir}
    for label, mult in (("x1", 1), ("x16", 16)):
        e = replica(0)
        for i in range(1, mult):
            e = e.unionByName(replica(i))
        e = e.repartition(int(cpus)).cache()
        n = e.count()
        # k ∝ n (the SemDeDup recipe): cluster count grows with corpus
        k = max(16, n // 32)
        _, cells = similarity.ivf_index(e, n_centroids=k, iters=2)
        sizes = [r.c for r in cells.groupBy("cluster")
                 .agg(F.count("*").alias("c")).collect()]
        within = sum(c * (c - 1) // 2 for c in sizes)
        allpairs = n * (n - 1) // 2
        t0 = time.monotonic()
        semantic_duplicates(
            e, n_centroids=k, iters=2, threshold=0.9, cluster_cap=256
        ).count()
        dt = time.monotonic() - t0
        out[label] = {
            "n_vectors": n,
            "k_clusters": k,
            "max_cluster": max(sizes),
            "within_cluster_pairs": within,
            "all_pairs": allpairs,
            "pair_reduction": round(allpairs / max(1, within), 1),
            "e2e_sec": round(dt, 1),
        }
        e.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
