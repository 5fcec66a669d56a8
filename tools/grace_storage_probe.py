"""Quantify the snapshot grace period's storage cost (r12 verdict #6).

``compact(vacuum=False)`` on a pointer-layout index retains the
superseded generation so in-flight scans keep their files across the
compaction. That safety has a storage price: until
``vacuum_generations`` runs, the index occupies live + retained bytes.
This probe measures it for BOTH indexes at a given sf: build a
pointer-layout index (base = half the corpus, one CDC increment = the
other half), compact with ``vacuum=False``, and report retained bytes
vs live bytes — then vacuum and confirm the reclaim.

Measured shape (recorded in ARCHITECTURE.md §10): the retained
generation is the PRE-compaction state — per-batch segment dirs,
df-delta rows, per-segment small files — so it is LARGER than the
folded live generation, not equal to it: retained/live 1.9x (BM25)
and 2.9x (IVF-PQ) at sf0.1, i.e. a grace period costs ~3-4x the live
index footprint until vacuum, linear in how many compactions run
before one. That is what makes "vacuum on the NEXT maintenance run"
(retain exactly one generation) the right default policy, vs
time-based retention whose cost is unbounded in compaction
frequency. The ratio falls toward ~2x as segments grow (the
per-batch overhead amortizes against real postings/codes bytes).

Run: python tools/grace_storage_probe.py [sf_dir]
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def gen_dirs(path: str):
    return sorted(
        e for e in os.listdir(path)
        if e.startswith("gen-") and os.path.isdir(f"{path}/{e}")
    )


def live_gen(path: str) -> str:
    with open(f"{path}/CURRENT") as f:
        return f.read().strip()


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
    from parquet_metadata_explorer_spark.operators.segments import (
        vacuum_generations,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_index_compact,
        ivfpq_index_increment,
        write_ivfpq_index,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_compact,
        bm25_index_increment,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    tmp = tempfile.mkdtemp(prefix="pqx_grace_probe_")
    report = {"sf_dir": sf, "indexes": {}}

    def run(name, base_build, increment, compact):
        path = f"{tmp}/{name}"
        base_build(path)
        increment(path)
        pre_bytes = du(path)
        folded = compact(path)
        live = live_gen(path)
        gens = gen_dirs(path)
        live_bytes = du(f"{path}/{live}")
        retained = [g for g in gens if g != live]
        retained_bytes = sum(du(f"{path}/{g}") for g in retained)
        reclaimed = vacuum_generations(path)
        post_bytes = du(path)
        row = {
            "batches_folded": folded,
            "pre_compact_bytes": pre_bytes,
            "live_bytes": live_bytes,
            "retained_generations": len(retained),
            "retained_bytes": retained_bytes,
            "retained_over_live": round(retained_bytes / live_bytes, 3),
            "grace_total_over_live": round(
                (retained_bytes + live_bytes) / live_bytes, 3
            ),
            "vacuum_reclaimed_generations": reclaimed,
            "post_vacuum_bytes": post_bytes,
        }
        report["indexes"][name] = row
        print(f"# {name}: {json.dumps(row)}", file=sys.stderr)

    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    run(
        "bm25",
        lambda p: write_bm25_index(half_a, p, layout="pointer"),
        lambda p: bm25_index_increment(half_b, p, batch_id="b1"),
        lambda p: bm25_index_compact(spark, p, vacuum=False),
    )
    emb_a = emb.filter(F.col("vec_id") % 2 == 0)
    emb_b = emb.filter(F.col("vec_id") % 2 == 1)
    run(
        "ivfpq",
        lambda p: write_ivfpq_index(emb_a, p, layout="pointer"),
        lambda p: ivfpq_index_increment(emb_b, p, batch_id="b1"),
        lambda p: ivfpq_index_compact(spark, p, vacuum=False),
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
