"""Randomized equivalence: the binned interval join must produce exactly
the rows of the naive theta join (point BETWEEN start AND end per key)
for any interval layout — overlapping, nested, zero-length, bin-boundary
aligned — at any bin width."""

import datetime as dt
import random

import pyspark.sql.functions as F
import pytest

from parquet_metadata_explorer_spark.operators.rangejoin import binned_interval_join

BASE = dt.datetime(2024, 1, 1)


def _ts(seconds):
    return BASE + dt.timedelta(seconds=seconds)


@pytest.mark.parametrize("seed,bin_seconds", [(1, 3600), (2, 60), (3, 7)])
def test_matches_naive_theta_join(spark, seed, bin_seconds):
    rng = random.Random(seed)
    intervals = []
    for i in range(60):
        # mix of short, long, zero-length, and exactly-bin-aligned intervals
        start = rng.randrange(0, 50_000)
        if i % 7 == 0:
            start = (start // bin_seconds) * bin_seconds  # on the bin edge
        length = rng.choice([0, 1, rng.randrange(0, 20_000), bin_seconds])
        intervals.append((i % 5, i, _ts(start), _ts(start + length)))
    points = [
        (rng.randrange(0, 5), j, _ts(rng.randrange(0, 70_000))) for j in range(300)
    ]
    # include points exactly on interval bounds
    for j, (key, iid, s, e) in enumerate(intervals[:20]):
        points.append((key, 1000 + 2 * j, s))
        points.append((key, 1001 + 2 * j, e))

    idf = spark.createDataFrame(
        intervals, "user_id long, interval_id long, start_ts timestamp, end_ts timestamp"
    )
    pdf = spark.createDataFrame(points, "user_id long, point_id long, ts timestamp")

    got = binned_interval_join(
        pdf, idf, keys=("user_id",), bin_seconds=bin_seconds
    ).select("point_id", "interval_id")
    naive = pdf.join(
        idf,
        (pdf.user_id == idf.user_id)
        & (pdf.ts >= idf.start_ts)
        & (pdf.ts <= idf.end_ts),
    ).select("point_id", "interval_id")

    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    assert naive.count() > 0  # the fixture actually exercises matches


def test_rejects_bad_bin(spark):
    df = spark.createDataFrame([(1,)], "user_id long")
    with pytest.raises(ValueError, match="bin_seconds"):
        binned_interval_join(df, df, bin_seconds=0)
