"""Multi-benchmark decontamination probe: one-scan matrix vs N separate
decontaminate calls, at increasing benchmark counts.

The claim under test: decontaminate_matrix's cost is ~flat in the number
of benchmarks (one corpus shingle pass + one broadcast of the UNIONed
tagged shingle sets), while N separate calls re-shingle the corpus N
times — so the gap widens linearly with N.

Prints one JSON line. Usage: python tools/matrix_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.cache import unpersist_all
    from parquet_metadata_explorer_spark.functions import tokens
    from parquet_metadata_explorer_spark.operators.text import (
        decontaminate,
        decontaminate_matrix,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("pqx-matrix-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = tokens(F.col("text"))

    def bench_at(mod: int, k: int):
        return docs.filter(F.col("doc_id") % mod == 0).select(
            "doc_id", F.array_join(F.slice(t, 1, k), " ").alias("text")
        )

    mods = [(29, 15), (31, 12), (37, 9), (41, 14), (43, 10), (47, 11)]
    result = {"sf_dir": sf_dir, "n_docs": docs.count(), "points": {}}
    # warm-up: pay both plan shapes' codegen/JIT before any timed point
    decontaminate_matrix(docs, {"w": bench_at(53, 8)}).count()
    decontaminate(docs, bench_at(53, 8)).count()
    unpersist_all(spark)
    for n in (2, 6):
        benches = {f"eval{i}": bench_at(m, k) for i, (m, k) in enumerate(mods[:n])}
        unpersist_all(spark)
        t0 = time.time()
        rows_m = decontaminate_matrix(docs, benches).count()
        matrix_sec = round(time.time() - t0, 2)
        unpersist_all(spark)
        t0 = time.time()
        rows_s = 0
        for bdf in benches.values():
            rows_s += decontaminate(docs, bdf).filter("n_hit > 0").count()
            unpersist_all(spark)
        separate_sec = round(time.time() - t0, 2)
        assert rows_m == rows_s, (rows_m, rows_s)
        result["points"][f"{n}_benchmarks"] = {
            "matrix_sec": matrix_sec,
            "separate_sec": separate_sec,
            "speedup": round(separate_sec / matrix_sec, 2),
            "hit_pairs": rows_m,
        }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
