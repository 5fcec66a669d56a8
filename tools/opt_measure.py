"""Optimization-round measurement harness (guide §1).

For each named headline query: capture .explain("formatted") to
plans/r14/<name>_<tag>.txt, time best-of-N with BOTH the bench action
(.count()) and the noop sink (guide §1.4), and record how many Spark
jobs each execution fires (job-group counting) — at sf0.1 local the
rows are orchestration-bound, so job/stage counts are the first-order
cost model. Prints one JSON line per query and a summary.

Usage:
    python tools/opt_measure.py [--tag before|after] [--runs 3] \
        [--no-plans] [query ...]
Defaults to the full bench headline list. Honors SPARK_GRAFT_SF_DIR /
SPARK_GRAFT_CPUS exactly like bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--noop", action="store_true",
                    help="also time the noop-sink action")
    ap.add_argument("queries", nargs="*")
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
        .appName("pqx-opt-measure")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    names = args.queries or [
        n for n in _bench_headline() if n in queries
    ]

    # same warm-up as bench.py: JVM codegen + the Python worker pool
    spark.range(1000).selectExpr("sum(id)").collect()

    def _warm(batches):
        import numpy  # noqa: F401
        import pandas as pd

        for b in batches:
            yield pd.DataFrame({"id": b["id"]})

    (
        spark.range(0, int(cpus) * 4, 1, int(cpus))
        .mapInPandas(_warm, "id long")
        .count()
    )

    plans_dir = os.path.join(
        HERE, "plans", os.environ.get("PQX_PLANS_ROUND", "r15")
    )
    os.makedirs(plans_dir, exist_ok=True)
    tracker = spark.sparkContext.statusTracker()

    out = {}
    for name in names:
        fn = queries[name]
        if name == "ann_ivfpq_probe":
            fn(spark, sf_dir).count()  # untimed index ensure, like bench
            spark.catalog.clearCache()
        if not args.no_plans:
            try:
                plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            except Exception:
                import io
                from contextlib import redirect_stdout

                buf = io.StringIO()
                with redirect_stdout(buf):
                    fn(spark, sf_dir).explain("formatted")
                plan = buf.getvalue()
            with open(
                os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan)
        rec = {"count": [], "jobs": None}
        for i in range(args.runs):
            group = f"opt-{name}-{i}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            rec["count"].append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobGroup(None, None)
            rec["jobs"] = len(tracker.getJobIdsForGroup(group))
            spark.catalog.clearCache()
        if args.noop:
            rec["noop"] = []
            for i in range(args.runs):
                t0 = time.monotonic()
                (
                    fn(spark, sf_dir)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                rec["noop"].append(round(time.monotonic() - t0, 3))
                spark.catalog.clearCache()
        rec["rows"] = n
        rec["best"] = min(rec["count"])
        out[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)

    total = round(sum(r["best"] for r in out.values()), 3)
    print(json.dumps({"tag": args.tag, "total_best_sec": total,
                      "n": len(out)}))
    spark.stop()


def _bench_headline() -> list:
    import re

    src = open(os.path.join(HERE, "bench.py")).read()
    m = re.search(r"headline = \[(.*?)\]", src, re.S)
    return re.findall(r'"([a-z0-9_]+)"', m.group(1))


if __name__ == "__main__":
    main()
