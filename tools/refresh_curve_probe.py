"""Measure the arrivals-only refresh cost curve (r12 verdict #7).

``hybrid_knn_graph_from_index(query_ids=...)`` claims ARRIVALS-sized
pricing: after a CDC increment lands in both indexes, refreshing just
the arrivals' neighbor lists should cost roughly the same whether the
committed corpus behind the indexes is 1x, 2x or 4x — while the full
corpus-as-queries graph job grows with the corpus. This probe proves
it the way tools/tape_increment_probe.py proved the tape increment:
replicate the corpus 1x/2x/4x (ids offset per replica), build BOTH
indexes per scale, then time (a) the refresh of a FIXED 16-arrival id
set and (b) the full graph job, best-of-3 each.

Expected shape (recorded in ARCHITECTURE.md §10): the refresh curve is
~flat (locally fixed-overhead-dominated; at scale it is
|arrivals|·m_terms guarded term probes + |arrivals| ADC probes of
n_probe/k_cells of the codes — sub-corpus by construction), while the
full job's curve grows with the corpus. The REFRESH/FULL ratio
shrinking as the corpus grows is the measured claim.

Run: python tools/refresh_curve_probe.py [sf_dir]
"""

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from parquet_metadata_explorer_spark.operators.similarity import (
        hybrid_knn_graph_from_index,
        write_ivfpq_index,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = docs.count()
    tmp = tempfile.mkdtemp(prefix="pqx_refresh_probe_")
    arrivals = list(range(16))  # present at every scale (replica 0)
    report = {"sf_dir": sf, "base_corpus": n, "arrivals": len(arrivals),
              "scales": []}

    def replicate(df, id_col, factor):
        parts = [
            df.select(
                (F.col(id_col) + F.lit(i * n)).alias(id_col),
                *[c for c in df.columns if c != id_col],
            )
            for i in range(factor)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def best_of(k, fn):
        times = []
        for _ in range(k):
            t0 = time.monotonic()
            fn()
            times.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
        return min(times), times

    for factor in (1, 2, 4):
        d, e = replicate(docs, "doc_id", factor), replicate(
            emb, "vec_id", factor
        )
        bp, ip = f"{tmp}/bm25_x{factor}", f"{tmp}/ann_x{factor}"
        write_bm25_index(d, bp)
        write_ivfpq_index(e, ip)
        kw = dict(k=5, k_each=10, m_terms=6, n_probe=4)
        refresh_best, refresh_runs = best_of(
            3,
            lambda: hybrid_knn_graph_from_index(
                spark, bp, ip, e, query_ids=list(arrivals), **kw
            ).count(),
        )
        full_best, full_runs = best_of(
            3,
            lambda: hybrid_knn_graph_from_index(
                spark, bp, ip, e, **kw
            ).count(),
        )
        row = {
            "factor": factor,
            "corpus": n * factor,
            "refresh_sec": refresh_best,
            "refresh_runs": refresh_runs,
            "full_sec": full_best,
            "full_runs": full_runs,
            "refresh_over_full": round(refresh_best / full_best, 3),
        }
        report["scales"].append(row)
        print(f"# x{factor}: {json.dumps(row)}", file=sys.stderr)

    r1 = report["scales"][0]["refresh_sec"]
    r4 = report["scales"][-1]["refresh_sec"]
    report["refresh_growth_1x_to_4x"] = round(r4 / r1, 3)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
