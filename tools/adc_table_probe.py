"""Distributed ADC-constants probe at corpus-sized |Q|: build the
per-(query, cell, sub, cluster) table for 10^5 synthetic queries via
ivfpq_adc_table (Spark joins against the broadcast centroid/codebook
tables, no Python stage) and time it — the r7-verdict case where a
driver loop over |Q|·n_probe·m·n_centroids rows would serialize on
the driver. Also times the driver loop at a serving-sized |Q| for the
crossover context. Prints one JSON line.

Usage: python tools/adc_table_probe.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.operators import similarity

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("pqx-adc-table-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cc, _cells, pq_cb, _codes = similarity.ivfpq_index(
        e, k_cells=16, m=8, n_centroids=32
    )
    dim = len(next(iter(cc.values())))

    # synthetic query batch: deterministic pseudo-vectors from the row id
    # (md5-free — the values don't matter, only the table-build shape)
    q = spark.range(n_q).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda j: (
                F.pmod(F.col("id") * j + j * j, F.lit(97)).cast("double")
                / F.lit(97.0)
            ),
        ).alias("embedding"),
    )

    t0 = time.monotonic()
    tbl = similarity.ivfpq_adc_table(q, cc, pq_cb, n_probe=4)
    n_rows = tbl.count()
    dist_sec = time.monotonic() - t0

    plan = tbl._jdf.queryExecution().executedPlan().toString()
    no_python = "EvalPython" not in plan and "BatchEvalPython" not in plan

    # driver-loop context at serving size (the auto-mode default regime)
    small = q.filter(F.col("vec_id") < 64)
    t0 = time.monotonic()
    rows, _cellset = similarity._adc_driver_rows(
        small.collect(), cc, pq_cb, 4
    )
    drv_sec = time.monotonic() - t0

    print(
        json.dumps(
            {
                "sf": sf_dir,
                "n_queries": n_q,
                "n_probe": 4,
                "table_rows": n_rows,
                "distributed_sec": round(dist_sec, 2),
                "no_python_stage": no_python,
                "driver_rows_at_64q": len(rows),
                "driver_sec_at_64q": round(drv_sec, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
