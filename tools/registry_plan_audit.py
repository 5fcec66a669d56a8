"""Full-registry plan audit (r14 optimization round, guide §7.2).

The bench headline rows all have captured plans under plans/r14/; this
tool sweeps EVERY queries() entry, captures .explain("formatted") for
each, and counts the anti-pattern nodes the guide tells us to hunt:
SortMergeJoin, BatchEvalPython (row-at-a-time Python), CartesianProduct,
and BroadcastNestedLoopJoin (fine only when one side is a literal
one-row scalar relation — flagged for eyeball confirmation).

Building a query's DataFrame runs whatever driver-side work its
operator does (trainer collects, index ensures), so the sweep is run
once, quiet, after the tests — it is an audit, not a timing harness.

Usage: python tools/registry_plan_audit.py [--out FILE] [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(HERE, "plans", "r14",
                                                  "registry_audit.json"))
    ap.add_argument("--sf", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    sf_dir = args.sf or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("pqx-registry-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    names = args.names or list(queries)

    marks = (
        "SortMergeJoin",
        "BatchEvalPython",
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
    )
    out = {}
    for name in names:
        t0 = time.monotonic()
        rec: dict = {}
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            rec = {m: plan.count(m) for m in marks}
            rec["Exchange"] = plan.count("Exchange")
            rec["build_sec"] = round(time.monotonic() - t0, 2)
            # keep the plan only for flagged rows — the sweep's artifact
            # is the summary, the headline rows keep their full plans
            if any(rec[m] for m in marks[:3]):
                pdir = os.path.join(HERE, "plans", "r14", "audit_flagged")
                os.makedirs(pdir, exist_ok=True)
                with open(os.path.join(pdir, f"{name}.txt"), "w") as f:
                    f.write(plan)
        except Exception as exc:  # noqa: BLE001 — audit must finish the sweep
            rec = {"error": f"{type(exc).__name__}: {exc}"}
            traceback.print_exc()
        finally:
            spark.catalog.clearCache()
        out[name] = rec
        flags = {
            k: v for k, v in rec.items()
            if k in marks and isinstance(v, int) and v
        }
        print(json.dumps({"query": name, **({"FLAG": flags} if flags else {}),
                          "sec": rec.get("build_sec")}), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    smj = [n for n, r in out.items() if r.get("SortMergeJoin")]
    py = [n for n, r in out.items() if r.get("BatchEvalPython")]
    cart = [n for n, r in out.items() if r.get("CartesianProduct")]
    errs = [n for n, r in out.items() if "error" in r]
    print(json.dumps({
        "n": len(out), "smj": smj, "row_python": py,
        "cartesian": cart, "errors": errs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
