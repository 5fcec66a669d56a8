"""Binned range join: point-in-interval joins as equi-joins.

Spark has no native range-join strategy: a join whose only condition is
``p.ts BETWEEN i.start AND i.end`` plans as BroadcastNestedLoopJoin (or a
cartesian product when neither side is broadcastable) — O(|points| x
|intervals|) comparisons, a non-starter at 100 TB. (The reference engine
has no join surface at all — SURVEY §2.2 delegates joins to Spark — so
this operator is part of the extension surface, like the as-of join in
``streaming/events.py``.)

The standard scale rewrite is *binning*: quantize time into fixed-width
bins, replicate each interval to every bin it overlaps, tag each point
with its single containing bin, equi-join on (keys..., bin), then apply
the exact BETWEEN as a post-filter. The equi-join shuffles on uniform
(key, bin) hashes — sort-merge or broadcast-hash, partial pruning, AQE
skew handling, everything Catalyst knows how to do with an equi-join —
and the nested-loop comparison survives only *within* a bin's matches.

Fan-out cost: an interval produces ``duration/bin + 1`` rows, so pick the
bin width near the typical interval length (Databricks' range-join hint
does exactly this quantization under the hood; here it is explicit and
engine-independent). A point lands in exactly one bin and a user's
intervals are replicated per covered bin, so each qualifying (point,
interval) pair meets in exactly one bin: the join emits no duplicates
and needs no dropDuplicates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    keys: Sequence[str] = ("user_id",),
    bin_seconds: int = 3600,
) -> DataFrame:
    """Join each point row to every interval row (same ``keys``) whose
    ``[start_col, end_col]`` contains ``point_ts`` — inclusive on both
    ends, matching SQL BETWEEN. Returns the joined rows with both sides'
    columns (join keys unified, bin column dropped)."""
    if bin_seconds <= 0:
        raise ValueError(f"bin_seconds must be positive, got {bin_seconds}")
    # cast("double") on a timestamp yields fractional epoch seconds;
    # floor-divide quantizes to the bin grid
    point_bin = F.floor(F.col(point_ts).cast("double") / bin_seconds).cast("long")
    start_bin = F.floor(F.col(start_col).cast("double") / bin_seconds).cast("long")
    end_bin = F.floor(F.col(end_col).cast("double") / bin_seconds).cast("long")

    binned_intervals = intervals.withColumn(
        "__bin", F.explode(F.sequence(start_bin, end_bin))
    )
    binned_points = points.withColumn("__bin", point_bin)
    return (
        binned_points.join(binned_intervals, [*keys, "__bin"])
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__bin")
    )
