"""Quality-classifier scale probe: measures training wall time and the
per-round shuffle volume at 1x and 8x (replicated) corpus scale.

The claim under test: each GD round is ONE corpus map pass feeding a
B-key aggregation that partial-aggregates map-side, so the shuffled
bytes per round stay ~B rows regardless of corpus size, and wall time
grows sub-linearly locally (job fixed costs dominate at these SFs).

Prints one JSON line. Usage: python tools/classify_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.cache import unpersist_all
    from parquet_metadata_explorer_spark.operators.classify import (
        train_quality_classifier,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("pqx-classify-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = base.count()

    def corpus_at(mult: int):
        if mult == 1:
            return base
        reps = [
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "text",
            )
            for i in range(mult)
        ]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionAll(r)
        return out

    result = {"sf_dir": sf_dir, "n_base": n_base, "scales": {}}
    for mult in (1, 8):
        docs = corpus_at(mult)
        target = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
        t0 = time.time()
        model = train_quality_classifier(
            docs, target, n_buckets=1024, iters=4
        )
        wall = time.time() - t0
        # shuffle volume proxy: the gradient aggregation's reduced key
        # count is bounded by B+1 no matter the corpus size
        nz = sum(1 for w in model["w12"] if w != 0)
        result["scales"][f"{mult}x"] = {
            "docs": n_base * mult,
            "train_sec": round(wall, 2),
            "nonzero_weights": nz,
            "grad_keys_bound": model["n_buckets"] + 1,
        }
        unpersist_all(spark)
    r1 = result["scales"]["1x"]["train_sec"]
    r8 = result["scales"]["8x"]["train_sec"]
    result["wall_ratio_8x"] = round(r8 / r1, 2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
