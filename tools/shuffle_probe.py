"""Probe: mixing quality of the deterministic training-tape shuffle.

A training loader streams shards in filename order, so the statistic
that matters is the ADJACENCY of the written tape: consecutive windows
should come from far-apart positions of the original (document-ordered)
tape. For a uniform random permutation of n items the expected absolute
gap between consecutive values is (n+1)/3; the unshuffled tape's is 1.
This probe measures the realized mean adjacent gap of
``shuffle_training_windows`` at several sizes and checks it sits near
the random-permutation expectation — evidence the hash order actually
mixes, not just reorders.

Run: python tools/shuffle_probe.py [n_windows ...]
"""

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 100_000]

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from parquet_metadata_explorer_spark.operators.sinks import (
        shuffle_training_windows,
    )

    for n in sizes:
        w = spark.range(n).select(
            F.col("id").alias("window_id"),
            F.array(F.col("id").cast("int")).alias("token_ids"),
            F.lit(1).alias("n_tokens"),
        )
        order = [
            r.window_id
            for r in shuffle_training_windows(w, "epoch0").collect()
        ]
        gaps = [abs(b - a) for a, b in zip(order, order[1:])]
        mean_gap = sum(gaps) / len(gaps)
        expected = (n + 1) / 3
        print(
            f"n={n}: mean adjacent gap {mean_gap:,.0f} vs uniform-"
            f"permutation expectation {expected:,.0f} "
            f"(ratio {mean_gap / expected:.3f}; unshuffled tape = 1)"
        )
        assert 0.9 <= mean_gap / expected <= 1.1, "hash order failed to mix"
    print("mixing OK at every size")
    spark.stop()


if __name__ == "__main__":
    main()
