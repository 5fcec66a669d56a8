"""Bound the lexical staleness `related_items_takedown` leaves behind
(r13 verdict #7).

After a takedown, UNTOUCHED queries (no doomed doc in their stored
top-k) keep their rows. That is exact on the dense side (ADC distances
are per-vector) but bounded-stale on the lexical side: every delete
shifts the global BM25 statistics (df, N, avgdl) for EVERYONE, so the
stored lex ranks differ from what a full post-delete recompute would
produce. The docstring promises next-cadence convergence; this probe
MEASURES how far the stored rows can drift in the meantime.

Method: build both indexes + the corpus graph at the given SF, then run
successive takedowns (cumulative 1 -> 5 -> 25 -> 100 doomed docs,
picked as the most-cited neighbors so the stats shift is adversarial,
not average-case). After each wave, compare every untouched query's
stored row set against the full recompute over the survivors:

- ``changed_frac``: fraction of untouched queries whose top-k SET
  differs at all,
- ``jaccard_p50/p95/min``: top-k set overlap distribution,
- ``rank_moves_p95/max``: |stored rank - recomputed rank| over docs
  present in both lists.

Output: one JSON line per wave + a summary bound. The recorded numbers
live in ARCHITECTURE.md 7 (takedown section).

Run: python tools/takedown_staleness_probe.py [sf_dir]
"""

import collections
import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

WAVES = (1, 5, 25, 100)
K = 10


def _rows_by_query(rows):
    by = collections.defaultdict(dict)
    for r in rows:
        by[r.query_id][r.doc_id] = r.rank
    return by


def _drift(stored, recomputed, untouched):
    import statistics

    jac, moves, changed = [], [], 0
    for q in untouched:
        s, f = stored.get(q, {}), recomputed.get(q, {})
        inter = set(s) & set(f)
        union = set(s) | set(f)
        jac.append(len(inter) / len(union) if union else 1.0)
        if set(s) != set(f):
            changed += 1
        moves.extend(abs(s[d] - f[d]) for d in inter)
    jac.sort()
    moves.sort()

    def pct(xs, p):
        return xs[min(len(xs) - 1, int(p * len(xs)))] if xs else None

    return {
        "n_untouched": len(untouched),
        "changed_frac": round(changed / max(1, len(untouched)), 4),
        "jaccard_p50": pct(jac, 0.50),
        "jaccard_p05": pct(jac, 0.05),
        "jaccard_min": jac[0] if jac else None,
        "rank_moves_p95": pct(moves, 0.95),
        "rank_moves_max": moves[-1] if moves else None,
    }


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from parquet_metadata_explorer_spark.operators.pipelines import (
        read_related_items,
        related_items_takedown,
    )
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
    # the hybrid corpus: docs that have a vector (the graph's id space)
    docs = docs.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
    )
    tmp = tempfile.mkdtemp(prefix="pqx_staleness_probe_")
    bp, ip, out = f"{tmp}/bm25", f"{tmp}/ivfpq", f"{tmp}/graph_out"
    write_bm25_index(docs, bp)
    write_ivfpq_index(emb, ip, k_cells=16, m=8, n_centroids=32,
                      iters=2, coarse_iters=2)
    g0 = hybrid_knn_graph_from_index(spark, bp, ip, emb, k=K)
    g0.write.parquet(f"{out}/graph/batch=0")
    emb.write.parquet(f"{out}/embeddings/batch=0")

    stored0 = _rows_by_query(g0.collect())
    cited = collections.Counter(
        d for q, rows in stored0.items() for d in rows if d != q
    )
    doom_order = [d for d, _ in cited.most_common()]
    report = {"sf_dir": sf, "k": K,
              "n_queries": len(stored0), "waves": []}
    doomed_so_far: set = set()
    ever_refreshed: set = set()
    stored = stored0
    for target in WAVES:
        wave = [d for d in doom_order if d not in doomed_so_far][
            : target - len(doomed_so_far)
        ]
        if not wave:
            break
        wave_set = set(wave)
        # the takedown will refresh exactly the queries whose CURRENT
        # stored rows cite a doomed doc — record them so "untouched"
        # means NEVER re-retrieved across the whole history
        ever_refreshed |= {
            q for q, rows in stored.items()
            if (set(rows) & wave_set) and q not in wave_set
        }
        res = related_items_takedown(
            spark, out, bp, ip, wave, emb, batch_id=f"w{target}", k=K
        )
        doomed_so_far.update(wave)
        stored = _rows_by_query(read_related_items(spark, out).collect())
        survivors = emb.join(
            spark.createDataFrame(
                [(int(i),) for i in sorted(doomed_so_far)], ["vec_id"]
            ),
            "vec_id", "left_anti",
        )
        recomputed = _rows_by_query(
            hybrid_knn_graph_from_index(spark, bp, ip, survivors, k=K)
            .collect()
        )
        untouched = sorted(
            set(stored) - ever_refreshed - doomed_so_far
        )
        d = _drift(stored, recomputed, untouched)
        d["cum_doomed"] = len(doomed_so_far)
        d["doomed_frac"] = round(len(doomed_so_far) / len(stored0), 4)
        d["queries_refreshed_this_wave"] = res["queries_refreshed"]
        report["waves"].append(d)
        print(json.dumps(d))

    print(json.dumps(report))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
