"""Probe: incremental tape export cost vs committed tape size.

The claim under test (export_training_windows_increment's docstring):
an increment touches ONLY the new bytes — its cost is a function of
the ARRIVALS, not of the committed tape. This probe grows the tape by
repeatedly folding a fixed-size arrival batch and measures each fold's
wall time; a flat curve is the evidence (the batch re-export baseline,
measured at the same sizes, grows with the corpus instead).

Run: python tools/tape_increment_probe.py [n_base_docs] [batch_docs] [n_batches]
"""

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from parquet_metadata_explorer_spark.operators.sinks import (
        export_training_windows,
        export_training_windows_increment,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bpe_merges_fast,
    )

    def docs(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{k}x"), (F.col("id") * (k + 3)) % 97)
                    for k in range(12)
                ],
            ).alias("text"),
        )

    root = tempfile.mkdtemp(prefix="tape_probe_")
    base = docs(0, n_base)
    merges = bpe_merges_fast(base, n_merges=64)
    export = f"{root}/tape"
    t0 = time.time()
    res = export_training_windows(base, merges, export, budget_tokens=512)
    print(f"base export: {n_base} docs, {res['tokens']} tokens, "
          f"{time.time() - t0:.2f}s")

    lo = n_base
    for i in range(n_batches):
        arr = docs(lo, lo + batch)
        t0 = time.time()
        r = export_training_windows_increment(arr, export, batch_id=f"b{i}")
        dt = time.time() - t0
        print(f"increment {i}: +{batch} docs onto a {r['tokens']}-token "
              f"tape -> {dt:.2f}s")
        lo += batch

    # baseline: what a full re-export costs at the final size
    t0 = time.time()
    export_training_windows(
        docs(0, lo), merges, f"{root}/full", budget_tokens=512
    )
    print(f"full re-export at {lo} docs: {time.time() - t0:.2f}s "
          "(the cost the increment avoids, growing with the corpus)")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
