"""Commit-log segment-accumulation probe: measures what compaction buys
after a long CDC run — N per-batch segments multiply the probed file
count (one dir per (bucket, batch)) and the df-delta rows the probe
must fold, while a compacted index restores the single-segment shape
with BIT-identical scores.

Prints one JSON line. Usage: python tools/bm25_segments_probe.py [sf_dir] [n_batches]
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
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.operators.text import (
        _read_bm25_stats,
        bm25_index_compact,
        bm25_index_increment,
        bm25_probe_topk,
        bm25_query_buckets,
        write_bm25_index,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("pqx-bm25-segments-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    docs.count()
    queries = [(1, "fast hash join"), (2, "window merge sort order")]
    def probed_files(path):
        # modulus from the index's own sidecar — never a hardcoded twin
        qbuckets = bm25_query_buckets(
            queries, int(_read_bm25_stats(path)["n_buckets"])
        )
        return (
            spark.read.parquet(f"{path}/postings")
            .filter(F.col("bucket").isin(qbuckets))
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    def serve(path):
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            bm25_probe_topk(spark, path, queries, k=10).count()
            best = min(best, time.monotonic() - t0)
        return best

    work = tempfile.mkdtemp(prefix="pqx_bm25_seg_")
    out = {"sf": sf_dir, "n_batches": n_batches}
    try:
        path = f"{work}/idx"
        write_bm25_index(docs.filter(F.col("doc_id") % n_batches == 0), path)
        for i in range(1, n_batches):
            bm25_index_increment(
                docs.filter(F.col("doc_id") % n_batches == i),
                path,
                batch_id=f"b{i}",
            )
        frag_rows = sorted(
            map(tuple, bm25_probe_topk(spark, path, queries, k=10).collect())
        )
        out["fragmented"] = {
            "files_probed": probed_files(path),
            "serve_sec": round(serve(path), 2),
        }
        t0 = time.monotonic()
        folded = bm25_index_compact(spark, path)
        out["compact_sec"] = round(time.monotonic() - t0, 2)
        out["batches_folded"] = folded
        out["compacted"] = {
            "files_probed": probed_files(path),
            "serve_sec": round(serve(path), 2),
        }
        out["bit_identical"] = (
            sorted(
                map(tuple, bm25_probe_topk(spark, path, queries, k=10).collect())
            )
            == frag_rows
        )
        out["files_ratio"] = round(
            out["fragmented"]["files_probed"]
            / max(out["compacted"]["files_probed"], 1),
            1,
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
