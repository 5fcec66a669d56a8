"""Driver-visible remote-I/O metrics for page scans.

The reference exposes ``numRemoteReads`` / ``numRemoteSeeks`` counters on
its buffered stream (``RemoteInputStream.scala:130-136``) — but they live
and die inside one executor task. Here the per-stream counters flow into
Spark **accumulators**, so a driver can observe the aggregate I/O cost of
a whole distributed page scan — the number every buffer-size tuning
decision on S3/ABFS actually needs:

    m = ScanMetrics(spark)
    df = read_metadata(spark, path, level="page", io_metrics=m)
    df.count()
    print(m.remote_reads, m.remote_seeks)

Accumulator semantics: counts accumulate across every action that runs
the scan (two ``count()`` calls double them) and include re-tried tasks —
standard Spark accumulator caveats, fine for an I/O gauge.
"""

from __future__ import annotations


class ScanMetrics:
    """Aggregated remote read/seek counters for one or more page scans.

    Holds only accumulators, so instances are picklable into task
    closures; ``add`` is called executor-side once per file stream as it
    closes."""

    def __init__(self, spark):
        sc = spark.sparkContext
        self._reads = sc.accumulator(0)
        self._seeks = sc.accumulator(0)

    def add(self, reads: int, seeks: int) -> None:
        self._reads.add(reads)
        self._seeks.add(seeks)

    @property
    def remote_reads(self) -> int:
        return self._reads.value

    @property
    def remote_seeks(self) -> int:
        return self._seeks.value
