"""IVF-PQ segment-lifecycle probe — the symmetric measurement to
tools/bm25_segments_probe.py: N faiss-style add() increments multiply
the probed file count (one dir per (cell, batch)); compaction folds
them back with BIT-identical probe results. Also measures the frozen-
model encode cost per increment (the map-side shape with no training).

Prints one JSON line. Usage: python tools/ivfpq_segments_probe.py [sf_dir] [n_batches]
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_index_compact,
        ivfpq_index_increment,
        ivfpq_probe_topk,
        write_ivfpq_index,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("pqx-ivfpq-segments-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_vec = e.count()
    queries = e.filter(F.col("vec_id").isin([0, 1, 2, 3, 4]))

    def files(path):
        return sum(
            1
            for _r, _d, fs in os.walk(f"{path}/codes")
            for f in fs
            if f.endswith(".parquet")
        )

    def serve(path):
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            ivfpq_probe_topk(spark, path, queries, k=10, n_probe=4).count()
            best = min(best, time.monotonic() - t0)
        return best

    work = tempfile.mkdtemp(prefix="pqx_ivfpq_seg_")
    out = {"sf": sf_dir, "n_batches": n_batches, "n_vectors": n_vec}
    try:
        path = f"{work}/idx"
        t0 = time.monotonic()
        write_ivfpq_index(
            e.filter(F.col("vec_id") % n_batches == 0),
            path,
            k_cells=16,
            m=8,
            n_centroids=32,
            iters=3,
            coarse_iters=3,
        )
        out["build_sec"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        for i in range(1, n_batches):
            ivfpq_index_increment(
                e.filter(F.col("vec_id") % n_batches == i),
                path,
                batch_id=f"b{i}",
            )
        out["increment_sec_each"] = (
            round((time.monotonic() - t0) / (n_batches - 1), 2)
            if n_batches > 1
            else None
        )
        frag = sorted(
            map(
                tuple,
                ivfpq_probe_topk(spark, path, queries, k=10, n_probe=4).collect(),
            )
        )
        out["fragmented"] = {"files": files(path), "serve_sec": round(serve(path), 2)}
        t0 = time.monotonic()
        out["batches_folded"] = ivfpq_index_compact(spark, path)
        out["compact_sec"] = round(time.monotonic() - t0, 2)
        out["compacted"] = {"files": files(path), "serve_sec": round(serve(path), 2)}
        out["bit_identical"] = (
            sorted(
                map(
                    tuple,
                    ivfpq_probe_topk(
                        spark, path, queries, k=10, n_probe=4
                    ).collect(),
                )
            )
            == frag
        )
        out["files_ratio"] = round(
            out["fragmented"]["files"] / max(out["compacted"]["files"], 1), 1
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
