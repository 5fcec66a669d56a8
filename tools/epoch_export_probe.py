"""Probe: multi-epoch export — K per-seed shuffles vs one single-pass.

r10 VERDICT #9: ``export_training_epochs`` re-read the finished window
table once PER SEED (K range exchanges, K source reads). The single-pass
variant reads once, replicates K× through a broadcast seed join, and
writes all epoch trees from one (epoch, key)-ranged exchange — the
shuffled bytes are K× either way, but source reads drop from K to 1,
which is the term that dominates at 100 TB (the local disk read is
page-cached, so the local delta UNDERSTATES the at-scale win).

This probe materializes a synthetic window table on disk (the export
shape: window_id, token_ids array<int>, n_tokens), then times both
paths at K=4 and checks the tapes are identical per epoch.

Run: python tools/epoch_export_probe.py [n_windows] [tokens_per_window]
"""

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    seeds = ["e0", "e1", "e2", "e3"]

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from parquet_metadata_explorer_spark.operators.sinks import (
        export_training_epochs,
    )

    root = tempfile.mkdtemp(prefix="epoch_probe_")
    export = f"{root}/export"
    (
        spark.range(n)
        .select(
            F.col("id").alias("window_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(w - 1)),
                lambda i: (F.col("id") * w + i).cast("int") % 50_000,
            ).alias("token_ids"),
            F.lit(w).cast("long").alias("n_tokens"),
        )
        .write.parquet(f"{export}/windows")
    )

    results = {}
    for label, single in (("per-seed-loop", False), ("single-pass", True)):
        best = None
        for trial in range(3):
            out = f"{root}/{label}-{trial}"
            t0 = time.time()
            export_training_epochs(
                spark, export, seeds, out_path=out, single_pass=single
            )
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[label] = best
        print(f"{label:>14}: best-of-3 {best:.2f}s "
              f"({n} windows x {w} ids, K={len(seeds)})")

    # equality spot-check on the last trees written
    import glob

    import pyarrow.parquet as pq

    def tape(root_dir, seed):
        ids = []
        for f in sorted(glob.glob(f"{root_dir}/epoch={seed}/part-*.parquet")):
            ids.extend(pq.read_table(f).column("window_id").to_pylist())
        return ids

    for s in seeds:
        a = tape(f"{root}/per-seed-loop-2", s)
        b = tape(f"{root}/single-pass-2", s)
        assert a == b, f"tape mismatch for {s}"
    print("tapes identical per epoch; "
          f"single-pass/loop = {results['single-pass']/results['per-seed-loop']:.2f}x")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
