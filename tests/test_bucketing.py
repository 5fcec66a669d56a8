"""Bucketed co-located join: no shuffle on either join input."""

import pytest

from parquet_metadata_explorer_spark.operators.bucketing import (
    bucketed_revenue_join,
    write_bucketed,
)
from parquet_metadata_explorer_spark.plans import simple_plan


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li, "lineitem_bucketed", "l_orderkey", 8)
    write_bucketed(od, "orders_bucketed", "o_orderkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_input_shuffle(spark, sf_dir, bucketed_tables):
    # disable AQE (stable plan string) and auto-broadcast (the tiny test
    # tables would broadcast, hiding the bucketing effect we assert)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_revenue_join(spark)
        plan = simple_plan(df)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    join_section = plan.split("HashAggregate")[-1]  # below the final agg
    assert "SortMergeJoin" in plan
    # no hashpartitioning exchange feeds the join — buckets align
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan

    # and the result matches the plain (shuffling) join
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    import pyspark.sql.functions as F

    plain = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").cast("long").alias("n"),
        )
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, plain.collect()))
