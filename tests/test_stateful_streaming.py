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


def test_streaming_funnel_adversarial_batch_order(spark, tmp_path):
    """A purchase arriving one micro-batch BEFORE its qualifying view
    (event time: view < purchase, within window) must still convert —
    events buffer in state until the watermark passes, then replay in
    event-time order. Control user 2's purchase has no view in window and
    must NOT convert. Result equals the batch operator on the union."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_metadata_explorer_spark.streaming.stateful import (
        streaming_funnel,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = dt.datetime(2024, 6, 1, 12, 0, 0)

    def tbl(rows):
        return pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array(
                    [r[3] for r in rows], pa.timestamp("us")
                ),
                "value": pa.array([1.0] * len(rows), pa.float64()),
            }
        )

    stage = str(tmp_path / "events")
    import os

    os.makedirs(stage)
    # file 0 (FIRST micro-batch): user 1's PURCHASE, user 2's purchase
    pq.write_table(
        tbl(
            [
                (10, 1, "purchase", base + dt.timedelta(minutes=30)),
                (20, 2, "purchase", base + dt.timedelta(minutes=45)),
            ]
        ),
        f"{stage}/00-first.parquet",
    )
    # file 1 (SECOND micro-batch): user 1's qualifying VIEW (earlier in
    # event time), user 2's view OUTSIDE the window (after the purchase
    # by > window? no — views must precede; this one is 2h later, so it
    # cannot qualify), plus a late tick to advance the watermark
    pq.write_table(
        tbl(
            [
                (11, 1, "view", base + dt.timedelta(minutes=10)),
                (21, 2, "view", base + dt.timedelta(minutes=170)),
                (99, 3, "view", base + dt.timedelta(minutes=200)),
            ]
        ),
        f"{stage}/01-second.parquet",
    )

    schema = spark.read.parquet(stage).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(stage)
    )
    out = streaming_funnel(stream, window_minutes=60, watermark_delay="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_adversarial")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # latest emission per user wins (update mode)
    pdf = spark.table("funnel_adversarial").toPandas()
    final = {}
    for _, r in pdf.iterrows():
        final[int(r.user_id)] = max(final.get(int(r.user_id), 0), int(r.converted))
    assert final[1] == 1, f"cross-batch view->purchase must convert: {final}"
    assert final[2] == 0
    assert final[3] == 0

    batch_df = spark.read.parquet(stage).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch = ev.funnel_conversion(batch_df, window_minutes=60).collect()[0]
    assert sum(final.values()) == batch.n_converted == 1
