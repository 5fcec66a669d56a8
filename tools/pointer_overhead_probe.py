"""Measure the pointer layout's serving overhead vs the flat layout.

resolve_index_root adds exactly one small-file existence check plus
(in pointer mode) one small-file read per index OPEN — driver-side,
before any Spark job. This probe times the same bm25_probe_topk /
ivfpq_probe_topk calls against a flat and a pointer index built from
identical data and reports per-open deltas, so "the pointer layout is
serving-neutral" is a measured claim, not an assertion
(ARCHITECTURE.md §10).

Run: python tools/pointer_overhead_probe.py [sf_dir]
"""

import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_probe_topk,
        write_ivfpq_index,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    tmp = tempfile.mkdtemp(prefix="pqx_ptr_probe_")
    paths = {}
    for layout in ("flat", "pointer"):
        bp, ip = f"{tmp}/bm25_{layout}", f"{tmp}/ann_{layout}"
        write_bm25_index(docs, bp, layout=layout)
        write_ivfpq_index(emb, ip, layout=layout, k_cells=8, m=8,
                          n_centroids=16, iters=2, coarse_iters=2)
        paths[layout] = (bp, ip)

    qs = [(1, "fast hash join"), (2, "window merge sort")]
    qv = emb.limit(8)
    out = {}
    for layout, (bp, ip) in paths.items():
        # warm both plans once, then time N full probe calls (open +
        # plan + execute — the serving unit of work)
        bm25_probe_topk(spark, bp, qs, k=10).count()
        ivfpq_probe_topk(spark, ip, qv, k=10, n_probe=4).count()
        t_b, t_i = [], []
        for _ in range(7):
            t0 = time.monotonic()
            bm25_probe_topk(spark, bp, qs, k=10).count()
            t_b.append(time.monotonic() - t0)
            t0 = time.monotonic()
            ivfpq_probe_topk(spark, ip, qv, k=10, n_probe=4).count()
            t_i.append(time.monotonic() - t0)
        out[layout] = (statistics.median(t_b), statistics.median(t_i))
    fb, fi = out["flat"]
    pb, pi = out["pointer"]
    print(f"bm25_probe  flat {fb*1000:.0f} ms  pointer {pb*1000:.0f} ms "
          f"(delta {(pb-fb)*1000:+.0f} ms)")
    print(f"ivfpq_probe flat {fi*1000:.0f} ms  pointer {pi*1000:.0f} ms "
          f"(delta {(pi-fi)*1000:+.0f} ms)")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
