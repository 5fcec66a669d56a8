"""Salted two-stage aggregation for pathologically hot keys.

AQE's skew handling only splits *join* partitions; a skewed
``groupBy("key")`` aggregation still routes every row of a hot key
through one reducer. The classic fix is salting: shard each key into
``n_salts`` sub-keys, partially aggregate on (key, salt) — spreading the
hot key over ``n_salts`` reducers — then merge the shards with a second,
tiny aggregation whose input is at most ``n_salts`` rows per key.

The salt must be deterministic for reproducibility but uncorrelated with
the grouping key; a hash of a high-cardinality carrier column (row
identity) does both — no ``rand()``, so re-runs and retried tasks agree.

Only algebraic aggregates decompose this way (sum/count/min/max, and
avg as sum+count merged at stage 2). That is the same partial/final
split Catalyst itself applies inside HashAggregate — salting extends it
across the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_group_stats"]


def salted_group_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    salt_col: str,
    n_salts: int = 32,
) -> DataFrame:
    """sum/count/min/max/avg of ``value_col`` per ``key_col``, computed
    skew-proof: stage 1 aggregates on (key, xxhash64(salt_col) % n_salts),
    stage 2 merges the ≤ ``n_salts`` shards per key.

    Equivalent to the direct groupBy for any input; the difference is
    purely physical — a 10^9-row hot key occupies ``n_salts`` tasks
    instead of one.
    """
    salt = F.abs(F.xxhash64(F.col(salt_col))) % n_salts
    sharded = (
        df.groupBy(F.col(key_col), salt.alias("_salt"))
        .agg(
            F.sum(F.col(value_col).cast("decimal(30,10)")).alias("_sum"),
            F.count(F.col(value_col)).alias("_cnt"),
            F.min(F.col(value_col)).alias("_min"),
            F.max(F.col(value_col)).alias("_max"),
        )
    )
    return (
        sharded.groupBy(key_col)
        .agg(
            F.sum("_sum").cast("double").alias("sum_value"),
            F.sum("_cnt").cast("long").alias("n_values"),
            F.min("_min").alias("min_value"),
            F.max("_max").alias("max_value"),
        )
        .withColumn(
            # snap the double quotient to decimal(30,10) before rounding:
            # round() on the raw double is engine-dependent at half-way
            # boundaries (the r5 tpch_q11 board red)
            "avg_value",
            F.round(
                (F.col("sum_value") / F.col("n_values")).cast("decimal(30,10)"), 6
            ).cast("double"),
        )
    )
