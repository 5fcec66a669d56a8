"""Listing-path probe at the reference's claimed operational scale.

The reference lists on the driver and claims "hundreds of thousands of
files" (README.md:49, maxparts up to 2000). This probe synthesizes a
100k-file Hive-partitioned tree on tmpfs and times the three listing
strategies `listing.list_files` can take:

  serial       one recursive pyarrow walk (narrow-root default)
  threads      per-directory fan-out over a driver thread pool
               (wide-root default without a SparkSession)
  distributed  per-directory fan-out as a Spark job
               (wide-root default with a SparkSession)

Local filesystems answer directory reads in microseconds, so the probe
also times each strategy under an injected per-directory round-trip
latency (the object-store regime the fan-out exists for) by wrapping the
per-directory lister with a sleep.

Prints one JSON line with every (strategy, latency) timing plus the
file-count sanity check. Usage:

    python tools/listing_probe.py [n_dirs] [files_per_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/dev/shm/pqx_listing_probe"


def build_tree(n_dirs: int, files_per_dir: int) -> str:
    root = os.path.join(BASE, "lake")
    shutil.rmtree(BASE, ignore_errors=True)
    for d in range(n_dirs):
        sub = os.path.join(root, f"ds={d:04d}")
        os.makedirs(sub)
        for f in range(files_per_dir):
            # tiny files: listing cost is metadata ops, not bytes
            with open(os.path.join(sub, f"part-{f:05d}.bin"), "wb") as fh:
                fh.write(b"x")
    return root


def main() -> None:
    n_dirs = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    files_per_dir = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    root = build_tree(n_dirs, files_per_dir)
    expect = n_dirs * files_per_dir

    from pyspark.sql import SparkSession

    from parquet_metadata_explorer_spark import listing

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .appName("pqx-listing-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()  # warm

    def timed(fn):
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            n = len(fn())
            best = min(best, time.monotonic() - t0) if best else time.monotonic() - t0
            assert n == expect, (n, expect)
        return round(best, 3)

    results: dict[str, float] = {}
    # threshold 10^9 forces the serial recursive walk regardless of width
    results["serial"] = timed(lambda: listing.list_files(root, None, 10**9))
    results["threads"] = timed(lambda: listing.list_files(root, None, 64))
    results["distributed"] = timed(lambda: listing.list_files(root, spark, 64))

    # object-store regime: make each per-directory listing pay an RTT.
    # Wrap the per-directory lister the fan-out paths call; the serial
    # walk pays one RTT per directory too (its recursive walk visits
    # each directory), simulated as n_dirs sequential sleeps.
    rtt_s = 0.002
    orig_make = listing._make_list_dir

    def slow_make(uri_prefix, fs_snapshot=None):
        inner = orig_make(uri_prefix, fs_snapshot)

        def slow(d):
            time.sleep(rtt_s)
            return inner(d)

        return slow

    listing._make_list_dir = slow_make
    try:
        results["threads_rtt2ms"] = timed(lambda: listing.list_files(root, None, 64))
        results["distributed_rtt2ms"] = timed(
            lambda: listing.list_files(root, spark, 64)
        )
    finally:
        listing._make_list_dir = orig_make
    # serial under RTT: one sequential round-trip per directory on top of
    # the measured local walk — analytic, the walk itself is one C++ call
    results["serial_rtt2ms_analytic"] = round(
        results["serial"] + n_dirs * rtt_s, 3
    )

    print(
        json.dumps(
            {
                "n_dirs": n_dirs,
                "files_per_dir": files_per_dir,
                "n_files": expect,
                "times_sec": results,
            }
        )
    )
    spark.stop()
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
