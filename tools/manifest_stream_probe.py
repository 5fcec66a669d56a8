"""Probe: the streaming manifest's arrivals-only claim, measured.

stream_corpus_manifest's 100 TB story is that batch k's cost depends on
batch k's bytes, NOT on the accumulated corpus — the fold reads one
1-row parquet version + the arrivals, never history. This probe lands
N equal-sized batches and times each handler call directly (no
streaming harness noise): a flat per-batch curve while the cumulative
corpus grows N× is the evidence; a naive re-stamp (batch corpus_manifest
over everything seen so far) shows the contrasting linear curve.

Run: python tools/manifest_stream_probe.py [n_batches] [rows_per_batch]
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    import shutil
    import tempfile

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    from parquet_metadata_explorer_spark.operators.pipelines import (
        corpus_manifest,
        corpus_manifest_increment,
    )

    work = tempfile.mkdtemp(prefix="manifest_probe_")

    def batch_df(k):
        # ~40 words/doc so tokenize+hash dominates over job overhead —
        # the probe must measure the data-dependent cost, not scheduling
        body = " ".join(f"tok{j} word body" for j in range(13))
        return spark.range(k * rows, (k + 1) * rows).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit(body + " "), F.col("id").cast("string")
            ).alias("text"),
        )

    # land all batches as parquet first (I/O out of the timed region)
    for k in range(n_batches):
        batch_df(k).write.parquet(f"{work}/arrivals/b{k}")

    inc_times, naive_times = [], []
    prev = None
    for k in range(n_batches):
        arrivals = spark.read.parquet(f"{work}/arrivals/b{k}")
        t0 = time.time()
        folded = corpus_manifest_increment(prev, arrivals)
        folded.coalesce(1).write.mode("overwrite").parquet(
            f"{work}/state/v{k + 1}"
        )
        inc_times.append(time.time() - t0)
        prev = spark.read.parquet(f"{work}/state/v{k + 1}")

        # the contrast: naive full re-stamp over everything seen so far
        seen = spark.read.parquet(
            *[f"{work}/arrivals/b{j}" for j in range(k + 1)]
        )
        t0 = time.time()
        corpus_manifest(seen).collect()
        naive_times.append(time.time() - t0)

    stamp = prev.collect()[0]
    whole = corpus_manifest(
        spark.read.parquet(*[f"{work}/arrivals/b{j}" for j in range(n_batches)])
    ).collect()[0]
    assert tuple(stamp) == tuple(whole), (stamp, whole)

    print(f"batches={n_batches} rows/batch={rows} (corpus grows {n_batches}x)")
    print("incremental s/batch:", [round(t, 2) for t in inc_times])
    print("naive re-stamp    s:", [round(t, 2) for t in naive_times])
    ratio_inc = inc_times[-1] / max(inc_times[0], 1e-9)
    ratio_naive = naive_times[-1] / max(naive_times[0], 1e-9)
    print(
        f"last/first cost ratio: incremental {ratio_inc:.2f}x "
        f"vs naive {ratio_naive:.2f}x at {n_batches}x corpus"
    )
    print("fold == batch stamp on the union: OK")
    shutil.rmtree(work)
    spark.stop()


if __name__ == "__main__":
    main()
