"""Bucketed co-located joins: the zero-shuffle path for repeated big joins.

At 100 TB, the fact-to-fact join (e.g. lineitem ⋈ orders) shuffles both
sides on every query unless the tables are bucketed on the join key at
write time. Bucketing pre-partitions and pre-sorts data into a fixed
number of buckets; Spark then plans a SortMergeJoin with NO Exchange on
either side — the one-time write cost amortizes over every subsequent
join, which is exactly the trade a training-data pipeline wants for its
hot join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 16
) -> None:
    """Persist ``df`` as a bucketed+sorted table on ``key``."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_revenue_join(spark: SparkSession) -> DataFrame:
    """Join the bucketed lineitem/orders tables — plans with no Exchange
    on either input (verified in tests/test_bucketing.py)."""
    li = spark.table("lineitem_bucketed")
    od = spark.table("orders_bucketed")
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").cast("long").alias("n"),
        )
        .orderBy("o_orderpriority")
    )
