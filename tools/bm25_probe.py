"""BM25 index scale probe: measures what the materialized index buys at
serve time — the probe opens only the query terms' hash buckets (file
fraction ~= distinct_buckets/n_buckets, never the whole postings set)
and does zero corpus-sized joins (doc length rides the posting row), so
from-disk serve beats the in-memory path's full tokenize+postings build
by the corpus-scan cost, at x1 and x16 corpus.

Prints one JSON line. Usage: python tools/bm25_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.operators.text import (
        bm25_probe_topk,
        bm25_topk,
        write_bm25_index,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("pqx-bm25-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = [(1, "fast hash join"), (2, "window merge sort order")]

    def replica(i: int):
        return base.select(
            (F.col("doc_id") + i * 10**9).alias("doc_id"), "text"
        )

    out = {"sf": sf_dir}
    work = tempfile.mkdtemp(prefix="pqx_bm25_probe_")
    try:
        for label, mult in (("x1", 1), ("x16", 16)):
            docs = replica(0)
            for i in range(1, mult):
                docs = docs.unionByName(replica(i))
            docs = docs.repartition(int(cpus)).cache()
            n = docs.count()

            t0 = time.monotonic()
            n_mem = bm25_topk(docs, queries, k=10).count()
            dt_mem = time.monotonic() - t0

            path = f"{work}/{label}"
            t0 = time.monotonic()
            write_bm25_index(docs, path)
            dt_build = time.monotonic() - t0

            t0 = time.monotonic()
            n_disk = bm25_probe_topk(spark, path, queries, k=10).count()
            dt_serve = time.monotonic() - t0

            total_files = sum(
                1
                for _root, _d, fs in os.walk(f"{path}/postings")
                for f in fs
                if f.endswith(".parquet")
            )
            # the probe's own driver-side bucket arithmetic (md5 mod n,
            # identical tokenizer), against the modulus stored IN the
            # index — no extra postings scans, no hardcoded bucket count
            from parquet_metadata_explorer_spark.operators.text import (
                _read_bm25_stats,
                bm25_query_buckets,
            )

            n_buckets = int(_read_bm25_stats(path)["n_buckets"])
            probed = spark.read.parquet(f"{path}/postings").filter(
                F.col("bucket").isin(bm25_query_buckets(queries, n_buckets))
            )
            touched = probed.select(F.input_file_name()).distinct().count()

            out[label] = {
                "n_docs": n,
                "mem_sec": round(dt_mem, 1),
                "build_sec": round(dt_build, 1),
                "serve_sec": round(dt_serve, 1),
                "rows_equal": n_mem == n_disk,
                "files_total": total_files,
                "files_touched": touched,
                "file_fraction": round(touched / max(total_files, 1), 3),
            }
            docs.unpersist()
        x1, x16 = out["x1"], out["x16"]
        out["serve_ratio_vs_16x_data"] = round(
            x16["serve_sec"] / max(x1["serve_sec"], 0.1), 1
        )
        out["serve_vs_mem_x16"] = round(
            x16["mem_sec"] / max(x16["serve_sec"], 0.1), 1
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
