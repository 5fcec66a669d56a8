"""int8-ANN recall/latency at sf1-scale vector counts.

The r5 verdict noted the 2k-8k-vector probes cannot exercise the
4x-smaller-scan payoff int8 quantization claims. This probe replicates
the sf0.1 embeddings 16x (vec_id shift + cyclic dim rotation — norms
preserved, cross-replica cosines decorrelated) to ~sf1-scale counts,
then times float-GEMM vs pure-codegen int8 brute-force top-10 for the
same queries and reports recall@10 of int8 against the float ranking.

Prints one JSON line. Usage: python tools/ann_scale_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [0, 1, 2, 3, 4]


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
        .appName("pqx-ann-scale-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(base.select("embedding").first()[0])
    n_base = base.count()

    def replica(i: int):
        rot = F.concat(
            F.slice("embedding", i % dim + 1, dim - i % dim),
            F.slice("embedding", 1, i % dim),
        )
        return base.select(
            (F.col("vec_id") + i * 10**9).alias("vec_id"),
            (rot if i else F.col("embedding")).alias("embedding"),
            "label",
        )

    out = {}
    for factor in (1, 16):
        e = replica(0)
        for i in range(1, factor):
            e = e.unionByName(replica(i))
        e = e.repartition(int(cpus)).cache()
        n = e.count()

        def timed(fn):
            best, res = None, None
            for _ in range(2):
                t0 = time.monotonic()
                res = {(r.query_id, r.neighbor_id) for r in fn().collect()}
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            return round(best, 2), res

        t_float, top_float = timed(
            lambda: similarity.cosine_topk(e, QUERIES, k=10)
        )
        t_int8, top_int8 = timed(
            lambda: similarity.int8_cosine_topk(e, QUERIES, k=10)
        )
        recall = len(top_float & top_int8) / max(len(top_float), 1)
        out[f"x{factor}"] = {
            "n_vectors": n,
            "float_sec": t_float,
            "int8_sec": t_int8,
            "recall_at_10": round(recall, 3),
        }
        e.unpersist()

    print(json.dumps({"sf": sf_dir, "dim": dim, "base_vectors": n_base, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
