"""applyInPandasWithState operator: final state matches a batch groupBy."""

import shutil
import tempfile

import pyspark.sql.functions as F

from parquet_metadata_explorer_spark.streaming import events as ev
from parquet_metadata_explorer_spark.streaming.stateful import streaming_user_profiles


def test_user_profiles_match_batch(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    stage = tempfile.mkdtemp()
    shutil.copy(f"{sf_dir}/events.parquet", stage + "/events.parquet")

    schema = spark.read.parquet(stage).schema
    stream = spark.readStream.format("parquet").schema(schema).load(stage)
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

    out = streaming_user_profiles(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp() + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last update per user is the final profile
    streamed = {
        r.user_id: (r.n_events, r.sum_value)
        for r in spark.table("profiles").collect()
    }

    batch = ev.load_events(spark, sf_dir).groupBy("user_id").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s")
    )
    expected = {r.user_id: (r.n, r.s) for r in batch.collect()}

    assert len(streamed) == len(expected)
    mismatches = {
        u: (streamed[u], expected[u]) for u in expected if streamed[u] != expected[u]
    }
    assert not mismatches, f"first mismatches: {list(mismatches.items())[:3]}"


def test_streaming_funnel_matches_batch(spark, sf_dir):
    """Replayed in one availableNow pass, the per-user sticky converted
    flags must reproduce the batch funnel's n_converted exactly (single
    batch ⇒ event-time sort inside the state body sees the full
    history, so the cross-batch arrival caveat does not bite)."""
    from parquet_metadata_explorer_spark.streaming.stateful import (
        streaming_funnel,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    stage = tempfile.mkdtemp()
    shutil.copy(f"{sf_dir}/events.parquet", stage + "/events.parquet")
    schema = spark.read.parquet(stage).schema
    stream = spark.readStream.format("parquet").schema(schema).load(stage)
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

    out = streaming_funnel(stream, window_minutes=60)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_state")
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp() + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed_converted = {
        r.user_id
        for r in spark.table("funnel_state").collect()
        if r.converted == 1
    }

    batch = ev.funnel_conversion(
        ev.load_events(spark, sf_dir), window_minutes=60
    ).collect()[0]
    assert len(streamed_converted) == batch.n_converted


def test_ts_micros_handles_tz_aware_and_units():
    import pandas as pd

    from parquet_metadata_explorer_spark.streaming.stateful import _ts_micros

    naive_ns = pd.Series(pd.to_datetime(["2024-01-01 00:00:01"]))
    aware_ns = pd.Series(pd.to_datetime(["2024-01-01 00:00:01"])).dt.tz_localize(
        "UTC"
    )
    want = 1_704_067_201_000_000
    assert int(_ts_micros(naive_ns).iloc[0]) == want
    assert int(_ts_micros(aware_ns).iloc[0]) == want
    us = naive_ns.astype("datetime64[us]")
    assert int(_ts_micros(us).iloc[0]) == want
