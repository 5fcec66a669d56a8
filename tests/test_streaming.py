"""Structured Streaming twin of the windowed aggregation, replayed with an
availableNow trigger and checked against the batch result."""

import tempfile

import pyspark.sql.functions as F

from parquet_metadata_explorer_spark.streaming import events as ev


def test_stream_matches_batch(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch = ev.windowed_counts(ev.load_events(spark, sf_dir)).select(
        "window_start", "event_type", "n_events", "sum_value"
    )

    # the file stream source requires a directory: stage the events file
    import shutil

    stage = tempfile.mkdtemp()
    shutil.copy(f"{sf_dir}/events.parquet", stage + "/events.parquet")
    stream_df = ev.stream_windowed_counts(spark, stage)
    out_dir = tempfile.mkdtemp()
    q = (
        stream_df.writeStream.format("memory")
        .queryName("ev_counts")
        .outputMode("complete")
        .option("checkpointLocation", out_dir + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.table("ev_counts")

    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in streamed.collect()}
    assert b == s
    assert len(b) > 0


def test_stream_exact_dedup_matches_batch(spark, sf_dir):
    """The streamed first-seen set must cover exactly the batch-side
    distinct fingerprints (one representative per group)."""
    import shutil
    import tempfile

    from parquet_metadata_explorer_spark.functions import normalize_text

    stage = tempfile.mkdtemp()
    shutil.copy(f"{sf_dir}/documents.parquet", stage + "/documents.parquet")
    out = ev.stream_exact_dedup(spark, stage)
    ck = tempfile.mkdtemp()
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", ck + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.table("dedup_stream").collect()

    batch = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.md5(normalize_text(F.col("text"))).alias("fingerprint"))
        .distinct()
        .collect()
    )
    assert len(streamed) == len(batch)  # one survivor per distinct doc
    assert {r.fingerprint for r in streamed} == {r.fingerprint for r in batch}
