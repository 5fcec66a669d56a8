"""Per-job breakdown for one query: run it once under a job group, then
dump each Spark job's stages (name + task counts) from the status
tracker — the map from "N jobs" to WHICH actions fired them (guide §1:
find where the time goes before touching anything).

Usage: python tools/job_profile.py <query> [<query> ...]
Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
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
        .appName("pqx-job-profile")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    tracker = spark.sparkContext.statusTracker()

    for name in sys.argv[1:]:
        fn = queries[name]
        if name in ("ann_ivfpq_probe", "ivfpq_index_verify"):
            fn(spark, sf_dir).count()  # untimed index ensure
            spark.catalog.clearCache()
        # warm run so the profiled run is steady-state
        fn(spark, sf_dir).count()
        spark.catalog.clearCache()
        group = f"prof-{name}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        wall = time.monotonic() - t0
        spark.sparkContext.setJobGroup(None, None)
        spark.catalog.clearCache()
        jids = sorted(tracker.getJobIdsForGroup(group))
        print(f"\n=== {name}: {wall:.3f}s, {len(jids)} jobs ===")
        for j in jids:
            ji = tracker.getJobInfo(j)
            if ji is None:
                print(f"job {j}: <gone>")
                continue
            parts = []
            for sid in sorted(ji.stageIds):
                si = tracker.getStageInfo(sid)
                if si is None:
                    continue
                parts.append(f"{si.name}[{si.numTasks}]")
            print(f"job {j}: " + " | ".join(parts))
    spark.stop()


if __name__ == "__main__":
    main()
