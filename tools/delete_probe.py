"""Tombstone-delete cost probe: what a takedown costs against each
materialized index versus the full rebuild it replaces, and what the
delete costs the probe afterwards.

The at-scale claim under test: a delete batch is priced at ONE
filter-scan of the committed index (delta derivation) plus
delete-sized writes — independent of corpus tokenization cost — while
the rebuild it replaces re-tokenizes/re-encodes the whole surviving
corpus. Probe overhead after a delete is one anti-join against a
delete-sized relation.

Prints one JSON line. Usage: python tools/delete_probe.py [sf_dir] [frac]
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
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_index_delete,
        ivfpq_probe_topk,
        write_ivfpq_index,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_delete,
        bm25_probe_topk,
        write_bm25_index,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("pqx-delete-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    n_docs = docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_vecs = emb.count()
    mod = max(2, int(round(1.0 / frac)))
    doomed_docs = docs.filter(F.col("doc_id") % mod == 1).select("doc_id")
    doomed_vecs = emb.filter(F.col("vec_id") % mod == 1).select("vec_id")
    queries = [(1, "fast hash join"), (2, "window merge sort order")]
    qvecs = emb.limit(8).select("vec_id", "embedding")

    def timed(fn):
        t0 = time.time()
        out = fn()
        return time.time() - t0, out

    work = tempfile.mkdtemp(prefix="delete-probe-")
    out = {
        "metric": "delete_probe",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_vectors": n_vecs,
        "delete_frac": frac,
    }
    try:
        bp = f"{work}/bm25"
        out["bm25_build_sec"], _ = timed(lambda: write_bm25_index(docs, bp))
        t, _ = timed(
            lambda: bm25_probe_topk(spark, bp, queries, k=10).collect()
        )
        out["bm25_probe_clean_sec"] = t
        out["bm25_delete_sec"], out["bm25_deleted"] = timed(
            lambda: bm25_index_delete(spark, bp, doomed_docs, batch_id="del")
        )
        t, _ = timed(
            lambda: bm25_probe_topk(spark, bp, queries, k=10).collect()
        )
        out["bm25_probe_tombstoned_sec"] = t
        # the alternative the delete replaces: rebuild on the survivors
        rb = f"{work}/bm25-rebuilt"
        out["bm25_rebuild_filtered_sec"], _ = timed(
            lambda: write_bm25_index(
                docs.join(doomed_docs, "doc_id", "left_anti"), rb
            )
        )

        ip = f"{work}/ann"
        out["ivfpq_build_sec"], _ = timed(
            lambda: write_ivfpq_index(emb, ip, k_cells=16, m=8)
        )
        t, _ = timed(
            lambda: ivfpq_probe_topk(spark, ip, qvecs, k=10, n_probe=4).collect()
        )
        out["ivfpq_probe_clean_sec"] = t
        out["ivfpq_delete_sec"], out["ivfpq_deleted"] = timed(
            lambda: ivfpq_index_delete(spark, ip, doomed_vecs, batch_id="del")
        )
        t, _ = timed(
            lambda: ivfpq_probe_topk(spark, ip, qvecs, k=10, n_probe=4).collect()
        )
        out["ivfpq_probe_tombstoned_sec"] = t
        rb = f"{work}/ann-rebuilt"
        out["ivfpq_rebuild_filtered_sec"], _ = timed(
            lambda: write_ivfpq_index(
                emb.join(doomed_vecs, "vec_id", "left_anti"), rb, k_cells=16, m=8
            )
        )
        out["bm25_delete_vs_rebuild"] = round(
            out["bm25_rebuild_filtered_sec"] / out["bm25_delete_sec"], 2
        )
        out["ivfpq_delete_vs_rebuild"] = round(
            out["ivfpq_rebuild_filtered_sec"] / out["ivfpq_delete_sec"], 2
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
