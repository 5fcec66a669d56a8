"""DSIR scale probe: measures that importance-weighting wall time grows
~linearly with the corpus (the map/partial-agg shape) while the model
state stays FIXED — the bucket count tables and log-ratio table are
n_buckets rows regardless of corpus size, the property that lets the
target-vs-raw models broadcast at any scale.

Also contrasts the two selection modes at a corpus-sized n_out: the
exact Gumbel top-k (global sort over the 32-way-pruned candidates) vs
the histogram-sketch score cut (keep_fraction — bounded state, no
global window).

Prints one JSON line. Usage: python tools/dsir_probe.py [sf_dir]
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

    from parquet_metadata_explorer_spark.operators.sampling import (
        dsir_resample,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("pqx-dsir-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def replica(i: int):
        return base.select(
            (F.col("doc_id") + i * 10**9).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )

    out = {"sf": sf_dir}
    for label, mult in (("x1", 1), ("x16", 16)):
        docs = replica(0)
        for i in range(1, mult):
            docs = docs.unionByName(replica(i))
        docs = docs.repartition(int(cpus)).cache()
        n = docs.count()
        target = docs.filter(F.col("source").isin("src0", "src1"))

        t0 = time.monotonic()
        topk = dsir_resample(docs, target, n_out=max(50, n // 10))
        n_topk = topk.count()
        dt_topk = time.monotonic() - t0

        t0 = time.monotonic()
        frac = dsir_resample(docs, target, keep_fraction=0.1)
        n_frac = frac.count()
        dt_frac = time.monotonic() - t0

        out[label] = {
            "n_docs": n,
            "topk_sec": round(dt_topk, 1),
            "topk_rows": n_topk,
            "sketch_cut_sec": round(dt_frac, 1),
            "sketch_cut_rows": n_frac,
        }
        docs.unpersist()
    x1, x16 = out["x1"], out["x16"]
    out["topk_time_ratio_vs_16x_data"] = round(
        x16["topk_sec"] / max(x1["topk_sec"], 0.1), 1
    )
    out["sketch_time_ratio_vs_16x_data"] = round(
        x16["sketch_cut_sec"] / max(x1["sketch_cut_sec"], 0.1), 1
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
