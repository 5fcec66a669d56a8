"""Break hybrid_knn_graph_served into its sequential waves (r14 opt).

The served fusion's wall time is three parts: (1) the EAGER distributed
ADC-table build inside ivfpq_probe_topk (persist + probed-cell collect,
runs at DataFrame-construction time), (2) the lexical MLT subtree, and
(3) the fused count (which executes the dense join + fusion and, being
one Spark job, already overlaps lex/dense stages). This probe times each
part in isolation so an optimization of the LUT arithmetic can be judged
against the wave it actually lives in.

Usage: python tools/adc_wave_probe.py [--runs 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("pqx-adc-wave-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from parquet_metadata_explorer_spark.operators import similarity
    from parquet_metadata_explorer_spark.operators.similarity import (
        _read_ivfpq_sidecars,
        ivfpq_adc_table,
    )
    from parquet_metadata_explorer_spark.cache import track_persist

    queries = entrymod.queries()
    # ensure both index caches exactly like bench.py (untimed)
    queries["text_bm25_probe"](spark, sf_dir).count()
    queries["ann_ivfpq_probe"](spark, sf_dir).count()
    spark.catalog.clearCache()
    bm25_p = entrymod._bm25_index_path(sf_dir)
    ivfpq_p = entrymod._ivfpq_index_path(sf_dir)
    emb = entrymod._table(spark, sf_dir, "embeddings")

    # warm-up (bench parity)
    spark.range(1000).selectExpr("sum(id)").collect()

    for r in range(args.runs):
        # wave 1: eager distributed ADC table build (persist + collect)
        cc, pq_cb = _read_ivfpq_sidecars(spark, ivfpq_p)
        qv = emb.select("vec_id", "embedding")
        t0 = time.monotonic()
        tdf = track_persist(
            ivfpq_adc_table(qv, cc, pq_cb, entrymod.IVFPQ_PROBE)
        )
        ncells = tdf.select("cell").distinct().count()
        t1 = time.monotonic()
        print(
            f"run {r}: adc_table build+collect {t1 - t0:.3f}s "
            f"({ncells} cells)",
            flush=True,
        )
        spark.catalog.clearCache()

        # wave 2: lexical MLT side alone
        from parquet_metadata_explorer_spark.operators.text import (
            bm25_more_like_this_from_index,
        )

        t0 = time.monotonic()
        nlex = bm25_more_like_this_from_index(
            spark, bm25_p, k=20, m_terms=8, max_df_ratio=0.25
        ).count()
        t1 = time.monotonic()
        print(f"run {r}: lex count {t1 - t0:.3f}s ({nlex} rows)", flush=True)
        spark.catalog.clearCache()

        # full fused row, bench-identical
        t0 = time.monotonic()
        n = similarity.hybrid_knn_graph_from_index(
            spark, bm25_p, ivfpq_p, emb,
            k=10, k_each=20, n_probe=entrymod.IVFPQ_PROBE,
        ).count()
        t1 = time.monotonic()
        print(f"run {r}: fused count {t1 - t0:.3f}s ({n} rows)", flush=True)
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
