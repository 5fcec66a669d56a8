"""Core-scaling capture at a larger-than-sf0.1 workload (r15, the r14
verdict's #3: "scale evidence is plan-shape only — produce one larger-SF
capture, 32 vs 8 cores").

Builds an x8 HONEST replica of the sf0.1 corpus tables under
/tmp/pqx_scale_sf (the scale_probe construction: doc_ids shift by
i*10^9 with per-replica deterministic token permutations so near-dup /
shingle workloads grow linearly instead of exploding into N-sized
exact-dup groups; vec_ids shift with cyclic dim rotations so norms and
within-replica geometry are preserved while cross-replica cosines
decorrelate), copies the TPC-H/events tables alongside, and times the
top bench rows through the very same ``queries()`` entries the bench
runs — best-of-N .count(), cache cleared between runs, calibration
stamped.

Run it twice and divide:
    SPARK_GRAFT_CPUS=32 python tools/core_scaling_capture.py
    SPARK_GRAFT_CPUS=8  python tools/core_scaling_capture.py
Prints one JSON line per run; sec@8 / sec@32 is the per-row core
elasticity the verdict asked for. This is a measurement artifact only —
the bench contract (bench.py) is untouched.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/pqx_scale_sf"
FACTOR = 8
ROWS = [
    "ann_ivfpq",
    "ann_ivfpq_probe",
    "quality_classifier",
    "semantic_increment",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "text_bm25",
    "dsir_resample",
    "text_heavyhitters",
    "hybrid_rrf",
    "knn_graph",
    "text_quality_filter",
]


def build_replicas(spark, sf_dir: str, out: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(embs.select("embedding").first()[0])

    def doc_replica(i: int):
        toks = F.split(F.col("text"), " ")
        keyed = F.transform(
            toks,
            lambda t, p: F.struct(
                F.md5(F.concat(p.cast("string"), F.lit(f":{i}"))).alias("k"),
                t.alias("v"),
            ),
        )
        permuted = F.array_join(
            F.transform(F.array_sort(keyed), lambda s: s["v"]), " "
        )
        return docs.select(
            (F.col("doc_id") + i * 10**9).alias("doc_id"),
            (permuted if i else F.col("text")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    def emb_replica(i: int):
        rot = i % dim
        emb = F.col("embedding")
        rotated = (
            F.concat(F.slice(emb, rot + 1, dim - rot), F.slice(emb, 1, rot))
            if rot
            else emb
        )
        return embs.select(
            (F.col("vec_id") + i * 10**9).alias("vec_id"),
            rotated.alias("embedding"),
            "label",
        )

    docs_n, embs_n = doc_replica(0), emb_replica(0)
    for i in range(1, FACTOR):
        docs_n = docs_n.unionByName(doc_replica(i))
        embs_n = embs_n.unionByName(emb_replica(i))
    docs_n.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    embs_n.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    for t in (
        "lineitem", "orders", "customer", "supplier", "part",
        "nation", "region", "events",
    ):
        src = f"{sf_dir}/{t}.parquet"
        if os.path.exists(src):
            dst = f"{out}/{t}.parquet"
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy2(src, dst)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("PQX_SCALE_RUNS", "2"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("pqx-core-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = f"{BASE}/x{FACTOR}"
    if not os.path.exists(f"{out}/documents.parquet"):
        build_replicas(spark, sf_dir, out)

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()

    def _calib() -> float:
        t0 = time.monotonic()
        spark.range(0, 800_000_000, 1, int(cpus)).selectExpr(
            "count(if(pmod(id, 9) = 0, id, null)) AS n"
        ).collect()
        return time.monotonic() - t0

    _calib()
    calib_before = round(min(_calib() for _ in range(3)), 3)

    timings, counts = {}, {}
    for name in ROWS:
        fn = queries[name]
        if name == "ann_ivfpq_probe":
            fn(spark, out).count()  # untimed index ensure, like bench
            spark.catalog.clearCache()
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            n = fn(spark, out).count()
            d = time.monotonic() - t0
            best = d if best is None else min(best, d)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        counts[name] = n
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    calib_after = round(min(_calib() for _ in range(3)), 3)
    print(json.dumps({
        "metric": "core_scaling_capture",
        "factor": FACTOR,
        "cpus": int(cpus),
        "queries": timings,
        "rows": counts,
        "calibration": {"before": calib_before, "after": calib_after},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
