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


def test_stream_near_dedup_candidates_match_batch(spark, sf_dir):
    """Streaming stateful-bucket LSH must surface exactly the batch
    banding's candidate pair set, independent of micro-batch arrival
    order (pairs may repeat across bands; compare as sets)."""
    import shutil
    import tempfile

    from parquet_metadata_explorer_spark.operators.dedup import (
        band_rows,
        minhash_signatures,
    )

    # stage the corpus as several files so availableNow replays multiple
    # micro-batches (maxFilesPerTrigger=2 -> at least 2 triggers)
    stage = tempfile.mkdtemp()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(4).write.mode("overwrite").parquet(stage)

    out = ev.stream_near_dedup_candidates(
        spark, stage, max_files_per_trigger=2
    )
    ck = tempfile.mkdtemp()
    q = (
        out.writeStream.format("memory")
        .queryName("neardup_stream")
        .outputMode("append")
        .option("checkpointLocation", ck + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r.doc_a, r.doc_b) for r in spark.table("neardup_stream").collect()
    }

    bands = band_rows(minhash_signatures(docs))
    l, r = bands.alias("l"), bands.alias("r")
    batch = {
        (row.doc_a, row.doc_b)
        for row in l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_sig") == F.col("r.band_sig"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
        .collect()
    }
    assert batch, "expected at least one candidate pair in the corpus"
    assert streamed == batch
    shutil.rmtree(stage)


def test_stream_range_join_matches_batch(spark, sf_dir):
    """Streamed point-in-interval assignments must equal the batch range
    join row-for-row (no state: purchases join static intervals per
    micro-batch)."""
    import shutil
    import tempfile

    from parquet_metadata_explorer_spark.operators.rangejoin import (
        binned_interval_join,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = ev.load_events(spark, sf_dir)
    intervals = ev.session_intervals(events).cache()
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    batch = binned_interval_join(purchases, intervals, keys=("user_id",)).select(
        "purchase_id", "session_seq"
    )

    stage = tempfile.mkdtemp()
    shutil.copy(f"{sf_dir}/events.parquet", stage + "/events.parquet")
    out = ev.stream_range_join(spark, stage, intervals).select(
        "purchase_id", "session_seq"
    )
    ck = tempfile.mkdtemp()
    q = (
        out.writeStream.format("memory")
        .queryName("range_join_stream")
        .outputMode("append")
        .option("checkpointLocation", ck + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.table("range_join_stream")

    b = sorted(map(tuple, batch.collect()))
    s = sorted(map(tuple, streamed.collect()))
    assert b == s and len(b) > 0
    intervals.unpersist()


def test_load_events_pins_utc_session(spark, sf_dir):
    """load_events must pin the session timezone to UTC so the NTZ->LTZ
    normalization never shifts wall-clock values in a non-UTC session
    (ADVICE r3)."""
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = ev.load_events(spark, sf_dir)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert df.limit(1).count() == 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_approx_percentiles_within_rank_error(spark, sf_dir):
    """The approx_percentile scale twin must return values whose RANK is
    within 1/accuracy of the requested quantile — checked against the
    per-group sorted values the exact operator sees."""
    import bisect

    acc = 1000
    events = ev.load_events(spark, sf_dir)
    approx = {r.event_type: r for r in ev.value_percentiles_approx(
        events, accuracy=acc).collect()}
    vals = {}
    for r in events.select("event_type", "value").collect():
        if r.value is not None:
            vals.setdefault(r.event_type, []).append(r.value)
    assert set(approx) == set(vals)
    for et, xs in vals.items():
        xs.sort()
        n = len(xs)
        assert approx[et].n_values == n
        for q, field in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            v = getattr(approx[et], field)
            # rank window of the returned value (rounding-tolerant)
            lo = bisect.bisect_left(xs, v - 1e-6) / n
            hi = bisect.bisect_right(xs, v + 1e-6) / n
            eps = 1.0 / acc + 1.0 / n  # sketch bound + discretization
            assert lo - eps <= q <= hi + eps, (et, field, q, lo, hi)


def test_stream_line_dedup_matches_batch_set(spark, sf_dir):
    """The streamed first-seen line set equals the batch line_dedup
    survivor set (set equality — instance ownership within one
    micro-batch is arbitrary, as documented)."""
    import shutil
    import tempfile

    from parquet_metadata_explorer_spark.operators.dedup import line_dedup

    stage = tempfile.mkdtemp()
    shutil.copy(f"{sf_dir}/documents.parquet", stage + "/documents.parquet")
    out = ev.stream_line_dedup(spark, stage, chunk_tokens=8)
    ck = tempfile.mkdtemp()
    q = (
        out.writeStream.format("memory")
        .queryName("line_dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", ck + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.table("line_dedup_stream").collect()

    batch = line_dedup(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), chunk_tokens=8
    )
    n_kept_batch = batch.agg(F.sum("n_kept")).collect()[0][0]
    batch_lines = {
        ln
        for r in batch.collect()
        if r.cleaned_text
        for ln in _chunks(r.cleaned_text, 8)
    }
    assert len(streamed) == n_kept_batch  # one survivor per distinct line
    assert {r.line for r in streamed} == batch_lines


def _chunks(text, k):
    toks = text.split(" ")
    return [" ".join(toks[i : i + k]) for i in range(0, len(toks), k)]


def test_gapfill_by_type_carries_across_empty_months(spark):
    """A series with observations in Jan and Mar but a fully-empty Feb:
    every Feb hour must carry Jan's last value (the cross-chunk carry runs
    over a dense month spine, not just observed months)."""
    import datetime as dt

    rows = [
        ("a", dt.datetime(2024, 1, 31, 22, 30), 10.0),
        ("a", dt.datetime(2024, 3, 1, 1, 30), 99.0),
        ("b", dt.datetime(2024, 1, 31, 23, 15), 7.0),
        ("b", dt.datetime(2024, 1, 31, 23, 45), 9.0),
    ]
    events = spark.createDataFrame(
        [(t, ts, v, 1) for (t, ts, v) in rows],
        "event_type string, ts timestamp, value double, user_id long",
    )
    out = ev.gapfill_hourly_by_type(events).collect()
    a = {r.hour: r for r in out if r.event_type == "a"}
    # spine spans Jan 31 22:00 .. Mar 1 01:00 inclusive
    assert "2024-02-14 12:00:00" in a
    feb = a["2024-02-14 12:00:00"]
    assert feb.was_gap and feb.filled_value == 10.0
    assert a["2024-03-01 01:00:00"].filled_value == 99.0
    # series b: single-hour span, no gaps; mean of the two events
    b = [r for r in out if r.event_type == "b"]
    assert len(b) == 1 and b[0].filled_value == 8.0 and not b[0].was_gap


def test_stream_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """Native session_window twin: replayed with availableNow plus a
    far-future sentinel file (which advances the watermark so every real
    session closes and flushes in append mode), the emitted sessions
    must equal the batch operator field-for-field."""
    import shutil
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stage = str(tmp_path / "sess_events")
    import os

    os.makedirs(stage)
    shutil.copy(f"{sf_dir}/events.parquet", stage + "/00-events.parquet")
    # sentinel: one event far past every real timestamp; second file =
    # later mtime so it forms the LAST micro-batch and pushes the watermark
    _time.sleep(0.05)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([10**12], pa.int64()),
                "ts": pa.array([pa.scalar(4102444800000000, pa.timestamp("us"))]),
                "user_id": pa.array([10**9], pa.int64()),
                "event_type": pa.array(["view"], pa.string()),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array(["{}"], pa.string()),
            }
        ),
        stage + "/zz-sentinel.parquet",
    )
    out = ev.stream_sessionize(spark, stage, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in spark.table("sessions_stream").collect()
        if r.user_id != 10**9
    }
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in ev.sessionize(ev.load_events(spark, sf_dir), 30).collect()
    }
    assert streamed == batch


def test_stream_stream_attribution_matches_batch(spark, sf_dir):
    """The watermarked stream-stream interval join must equal the batch
    self-join when the replay is split into time-ordered micro-batches:
    boundary-crossing pairs (purchase in a later batch than its views)
    force BOTH sides' state to carry rows across batches, and the
    time-ordered split keeps every row ahead of the watermark so nothing
    is legitimately droppable."""
    import shutil

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = ev.load_events(spark, sf_dir)
    batch = {
        tuple(r)
        for r in ev.view_purchase_attribution(events)
        .select("purchase_id", "view_id", "delay_sec")
        .collect()
    }
    assert batch, "expected at least one attributed pair"

    # stage as three time-ordered files, replayed one per micro-batch
    stage = tempfile.mkdtemp()
    ordered = events.orderBy("ts").withColumn(
        "third", F.ntile(3).over(__import__("pyspark").sql.Window.orderBy("ts"))
    )
    for i in (1, 2, 3):
        (
            ordered.filter(F.col("third") == i)
            .drop("third")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage + f"/tmp_{i}")
        )
    import glob as _glob
    import os

    files = []
    for i in (1, 2, 3):
        part = _glob.glob(stage + f"/tmp_{i}/part-*.parquet")[0]
        dst = stage + f"/{i:02d}.parquet"
        os.rename(part, dst)
        shutil.rmtree(stage + f"/tmp_{i}")
        files.append(dst)

    out = ev.stream_stream_attribution(spark, stage, max_files_per_trigger=1)
    ck = tempfile.mkdtemp()
    q = (
        out.writeStream.format("memory")
        .queryName("attr_stream")
        .outputMode("append")
        .option("checkpointLocation", ck + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        tuple(r)
        for r in spark.table("attr_stream")
        .select("purchase_id", "view_id", "delay_sec")
        .collect()
    }
    assert streamed == batch
    shutil.rmtree(stage)


def test_stream_trending_matches_batch(spark, sf_dir):
    """The sliding-window streamed counts, ranked after the sink, must
    equal the batch trending report."""
    import shutil

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch = {
        tuple(r)
        for r in ev.trending_event_types(ev.load_events(spark, sf_dir)).collect()
    }
    assert batch

    stage = tempfile.mkdtemp()
    shutil.copy(f"{sf_dir}/events.parquet", stage + "/events.parquet")
    out = ev.stream_trending(spark, stage)
    ck = tempfile.mkdtemp()
    q = (
        out.writeStream.format("memory")
        .queryName("trend_stream")
        .outputMode("complete")
        .option("checkpointLocation", ck + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    from pyspark.sql import Window as W

    counts = spark.table("trend_stream")
    w_rank = W.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    streamed = {
        tuple(r)
        for r in counts.withColumn(
            "rank", F.row_number().over(w_rank).cast("long")
        )
        .filter(F.col("rank") <= 3)
        .collect()
    }
    assert streamed == batch
    shutil.rmtree(stage)


def test_stream_substring_novelty_matches_batch(spark, sf_dir):
    """The streamed first-seen span-hash set equals the batch
    substring_dedup firsts, and the dropped-occurrence count equals the
    batch's total duplicate-window count."""
    import shutil
    import tempfile

    from parquet_metadata_explorer_spark.operators.dedup import substring_dedup

    stage = tempfile.mkdtemp()
    shutil.copy(f"{sf_dir}/documents.parquet", stage + "/documents.parquet")
    out = ev.stream_substring_novelty(spark, stage, window=20)
    ck = tempfile.mkdtemp()
    q = (
        out.writeStream.format("memory")
        .queryName("substr_novelty_stream")
        .outputMode("append")
        .option("checkpointLocation", ck + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.table("substr_novelty_stream").collect()

    batch = substring_dedup(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), window=20
    ).collect()
    total_windows = sum(r.n_windows for r in batch)
    dup_windows = sum(r.n_dup_windows for r in batch)
    # survivors = distinct hashes = total occurrences − duplicates
    assert len(streamed) == total_windows - dup_windows
    assert len({r.h for r in streamed}) == len(streamed)


def test_histogram_percentiles_within_value_error(spark, sf_dir):
    """The histogram sketch's actual guarantee: the estimate for
    quantile q lives in the bucket CONTAINING the ceil(q·n)-th order
    statistic, so it is within one bucket width of that order statistic
    (NOT of the interpolated percentile_cont value — in a sparse tail
    the two rank conventions straddle different values). Verified per
    event type against exactly sorted values."""
    import math

    from parquet_metadata_explorer_spark.streaming.events import (
        load_events,
        value_percentiles,
        value_percentiles_histogram,
    )

    ev = load_events(spark, sf_dir)
    hist = {r.event_type: r for r in
            value_percentiles_histogram(ev, n_buckets=2048).collect()}
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    assert set(vals) == set(hist)
    for et, vs in vals.items():
        vs.sort()
        n = len(vs)
        width = (vs[-1] - vs[0]) / 2048
        for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            v_t = vs[max(1, math.ceil(p * n)) - 1]
            est = getattr(hist[et], col)
            assert abs(est - v_t) <= width + 1e-9, (et, col, est, v_t, width)
        assert hist[et].n_values == n
    # and the sketch is close to the exact interpolated percentiles in
    # dense regions (p50 of every group here)
    exact = {r.event_type: r.p50 for r in value_percentiles(ev).collect()}
    for et in exact:
        width = (vals[et][-1] - vals[et][0]) / 2048
        assert abs(hist[et].p50 - exact[et]) <= 3 * width + 1e-9


def test_stream_prepare_corpus_replays_batch(spark, sf_dir, tmp_path):
    """The foreachBatch CDC pipeline over files landing in doc_id order
    must accumulate EXACTLY the batch pipeline's output, with the
    catalog state surviving across micro-batches via the versioned
    parquet store."""
    from parquet_metadata_explorer_spark.operators.pipelines import (
        load_prepare_state,
        preparation_stages,
        stream_prepare_corpus,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter("doc_id % 17 = 3").select("doc_id", "text")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut1, cut2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    src = str(tmp_path / "arrivals")
    for i, (lo, hi) in enumerate(((None, cut1), (cut1, cut2), (cut2, None))):
        b = docs
        if lo is not None:
            b = b.filter(F.col("doc_id") >= lo)
        if hi is not None:
            b = b.filter(F.col("doc_id") < hi)
        b.coalesce(1).write.parquet(f"{src}/batch={i}")
    # one flat dir of files named in arrival order
    import glob as _glob
    import os
    import shutil

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i in range(3):
        part = _glob.glob(f"{src}/batch={i}/part-*.parquet")[0]
        shutil.copy(part, f"{flat}/{i:03d}.parquet")

    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "prepared")
    q = stream_prepare_corpus(spark, flat, bench, state_dir, out_dir)
    q.processAllAvailable()
    q.stop()

    got = {
        (r.doc_id, r.text) for r in spark.read.parquet(out_dir).collect()
    }
    expected = {
        (r.doc_id, r.text)
        for r in preparation_stages(docs, bench)["after_decontamination"].collect()
    }
    assert got == expected
    # three committed catalog versions, counts catalog = batch counts
    state, v = load_prepare_state(spark, state_dir)
    assert v == 3
    got_counts = {(r.source, r.n_docs) for r in state["source_counts"].collect()}
    exp_counts = {
        (r.source, r.n_docs)
        for r in preparation_stages(docs, bench)["after_decontamination"]
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .collect()
    }
    assert got_counts == exp_counts
    # idempotency, crash-window replay (SAME checkpoint lineage):
    # deleting the checkpoint's last commit marker replays batch 2 with
    # the same batch_id and file set; handle sees it already committed
    # (matching LINEAGE token) and skips — output, counts and version
    # unchanged (the r7-advice crash-window contract)
    from parquet_metadata_explorer_spark.operators.pipelines import (
        committed_batch_id,
        committed_lineage,
        stream_prepare_corpus as _spc,
    )

    assert committed_batch_id(state_dir, v) == 2
    assert committed_lineage(state_dir, v) is not None
    os.remove(f"{state_dir}/_checkpoint/commits/2")
    crc = f"{state_dir}/_checkpoint/commits/.2.crc"
    if os.path.exists(crc):  # hadoop local-fs checksum sidecar
        os.remove(crc)
    q2 = _spc(spark, flat, bench, state_dir, out_dir)
    q2.processAllAvailable()
    q2.stop()
    got2 = {
        (r.doc_id, r.text) for r in spark.read.parquet(out_dir).collect()
    }
    assert got2 == expected
    _, v2 = load_prepare_state(spark, state_dir)
    assert v2 == 3

    # lineage guard (the r8-advice fix): a FRESH checkpoint pointed at
    # committed state must RAISE, not silently skip batches 0..done
    # whose file-to-batch grouping may differ
    import pytest as _pytest

    q3 = _spc(
        spark, flat, bench, state_dir, out_dir,
        checkpoint_dir=str(tmp_path / "ckpt_fresh"),
    )
    with _pytest.raises(Exception, match="checkpoint lineage"):
        q3.processAllAvailable()
    q3.stop()
    _, v3 = load_prepare_state(spark, state_dir)
    assert v3 == 3  # nothing committed by the rejected lineage


def test_stream_to_bm25_index_composition(spark, sf_dir, tmp_path):
    """The advertised CDC composition end-to-end: the batch-keyed
    streaming sink's output feeds batch-keyed BM25 index increments
    (ids shared across both layers, one commit per micro-batch over a
    day-0 EMPTY index), and the probe over the incrementally-maintained
    index is BIT-identical to a fresh index built over the stream's
    accumulated output; replaying every increment is a no-op."""
    import glob as _glob
    import os
    import shutil

    from parquet_metadata_explorer_spark.operators.pipelines import (
        stream_prepare_corpus,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_index_increment,
        bm25_probe_topk,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter("doc_id % 17 = 3").select("doc_id", "text")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut1, cut2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    src = str(tmp_path / "arrivals")
    for i, (lo, hi) in enumerate(((None, cut1), (cut1, cut2), (cut2, None))):
        b = docs
        if lo is not None:
            b = b.filter(F.col("doc_id") >= lo)
        if hi is not None:
            b = b.filter(F.col("doc_id") < hi)
        b.coalesce(1).write.parquet(f"{src}/batch={i}")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i in range(3):
        part = _glob.glob(f"{src}/batch={i}/part-*.parquet")[0]
        shutil.copy(part, f"{flat}/{i:03d}.parquet")

    q = stream_prepare_corpus(
        spark, flat, bench, str(tmp_path / "state"), str(tmp_path / "prep")
    )
    q.processAllAvailable()
    q.stop()
    out_dir = str(tmp_path / "prep")
    prepared = spark.read.parquet(out_dir).select("doc_id", "text")

    # day-0 init: an EMPTY index (base commit n_docs=0), then one
    # increment per committed stream batch under the SAME batch key
    idx = str(tmp_path / "bm25")
    write_bm25_index(prepared.limit(0), idx)
    batch_ids = sorted(
        int(d.split("=")[1])
        for d in os.listdir(out_dir)
        if d.startswith("batch=")
    )
    assert batch_ids == [0, 1, 2]
    for b in batch_ids:
        bm25_index_increment(
            spark.read.parquet(f"{out_dir}/batch={b}").select("doc_id", "text"),
            idx,
            batch_id=f"stream-{b}",
        )
    qs = [(1, "fast hash join"), (2, "window merge sort")]
    got = sorted(map(tuple, bm25_probe_topk(spark, idx, qs, k=10).collect()))
    full = str(tmp_path / "full")
    write_bm25_index(prepared, full)
    assert got == sorted(
        map(tuple, bm25_probe_topk(spark, full, qs, k=10).collect())
    )
    # full replay of every increment (the crash-retry shape): no-ops
    for b in batch_ids:
        bm25_index_increment(
            spark.read.parquet(f"{out_dir}/batch={b}").select("doc_id", "text"),
            idx,
            batch_id=f"stream-{b}",
        )
    assert got == sorted(
        map(tuple, bm25_probe_topk(spark, idx, qs, k=10).collect())
    )


def test_stream_corpus_manifest_matches_batch(spark, sf_dir, tmp_path):
    """The streaming manifest accumulates to EXACTLY the batch stamp on
    the union of arrivals — in ANY arrival order (the fold is a sum of
    order-invariant terms, so this twin has no first-arrival caveat) —
    and replaying a crash window leaves the stamp and version
    unchanged. A null-text document folds as an empty doc (0 tokens,
    hash60('')) on the way through."""
    import glob as _glob
    import os
    import shutil

    from parquet_metadata_explorer_spark.operators.pipelines import (
        corpus_manifest,
        read_corpus_manifest,
        stream_corpus_manifest,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    extra = spark.createDataFrame(
        [(90001, None), (90002, "")], "doc_id long, text string"
    )
    docs = docs.unionByName(extra)
    src = str(tmp_path / "arrivals")
    # deliberately NOT doc_id-ordered: batch by doc_id % 3
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            f"{src}/batch={i}"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i in range(3):
        part = _glob.glob(f"{src}/batch={i}/part-*.parquet")[0]
        shutil.copy(part, f"{flat}/{i:03d}.parquet")

    state_dir = str(tmp_path / "state")
    q = stream_corpus_manifest(spark, flat, state_dir)
    q.processAllAvailable()
    q.stop()

    got = read_corpus_manifest(spark, state_dir).collect()[0]
    exp = corpus_manifest(docs).collect()[0]
    assert (got.n_docs, got.n_tokens, got.content_digest) == (
        exp.n_docs,
        exp.n_tokens,
        exp.content_digest,
    )
    _, v = read_corpus_manifest(spark, state_dir, with_version=True)
    assert v == 3

    # crash-window replay, same checkpoint lineage: drop the last
    # streaming commit marker and restart — batch 2 replays, handle
    # sees its batch_id committed and skips; stamp and version hold
    ckpt = f"{state_dir}/_checkpoint"
    os.remove(f"{ckpt}/commits/2")
    crc = f"{ckpt}/commits/.2.crc"
    if os.path.exists(crc):  # hadoop local-fs checksum sidecar
        os.remove(crc)
    q = stream_corpus_manifest(spark, flat, state_dir)
    q.processAllAvailable()
    q.stop()
    again = read_corpus_manifest(spark, state_dir).collect()[0]
    assert (again.n_docs, again.n_tokens, again.content_digest) == (
        exp.n_docs,
        exp.n_tokens,
        exp.content_digest,
    )
    _, v2 = read_corpus_manifest(spark, state_dir, with_version=True)
    assert v2 == 3

    # a FRESH checkpoint against committed state must raise, not skip
    import pytest as _pytest

    q = stream_corpus_manifest(
        spark, flat, state_dir, checkpoint_dir=str(tmp_path / "ckpt_fresh")
    )
    with _pytest.raises(Exception, match="lineage"):
        q.processAllAvailable()
    q.stop()
    _, v3 = read_corpus_manifest(spark, state_dir, with_version=True)
    assert v3 == 3  # nothing committed by the rejected lineage


def test_corpus_manifest_increment_is_exact_fold(spark, sf_dir):
    """manifest(A ∪ B) ≡ fold(manifest(A), manifest(B)) — the algebraic
    property the streaming twin rides; exact on every field including
    the decimal digest."""
    from parquet_metadata_explorer_spark.operators.pipelines import (
        corpus_manifest,
        corpus_manifest_increment,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")
    folded = corpus_manifest_increment(corpus_manifest(a), b).collect()[0]
    whole = corpus_manifest(docs).collect()[0]
    assert tuple(folded) == tuple(whole)

    # an EMPTY micro-batch is the fold's identity (its stamp is
    # (0, NULL, NULL) and sums skip nulls), in either position
    empty = docs.filter("doc_id < 0")
    lead = corpus_manifest_increment(corpus_manifest(empty), docs)
    mid = corpus_manifest_increment(corpus_manifest(docs), empty)
    assert tuple(lead.collect()[0]) == tuple(whole)
    assert tuple(mid.collect()[0]) == tuple(whole)


def test_stream_decontaminate_matrix_matches_batch(spark, sf_dir, tmp_path):
    """The streaming multi-benchmark screen accumulates to EXACTLY the
    batch screen on the union of arrivals (per-document operator, no
    state), and a crash-window replay overwrites its batch partition
    with identical rows."""
    import glob as _glob
    import os
    import shutil

    from parquet_metadata_explorer_spark.operators.text import (
        decontaminate_matrix,
        stream_decontaminate_matrix,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    benchmarks = {
        "suite_a": docs.filter("doc_id % 13 = 1").select("doc_id", "text"),
        "suite_b": docs.filter("doc_id % 17 = 2").select("doc_id", "text"),
    }
    src = str(tmp_path / "arrivals")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            f"{src}/batch={i}"
        )
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i in range(3):
        part = _glob.glob(f"{src}/batch={i}/part-*.parquet")[0]
        shutil.copy(part, f"{flat}/{i:03d}.parquet")

    out_dir = str(tmp_path / "screened")
    from parquet_metadata_explorer_spark.cache import _TRACKED

    tracked_before = len(_TRACKED)
    q = stream_decontaminate_matrix(spark, flat, benchmarks, out_dir)
    q.processAllAvailable()
    q.stop()
    # the 24/7 discipline: no per-micro-batch cache entry survives the
    # batch (persist_scope releases what each handler tracked)
    assert len(_TRACKED) == tracked_before

    got = {
        tuple(r)
        for r in spark.read.parquet(f"{out_dir}/batch=*").select(
            "doc_id", "benchmark", "n_sh", "n_hit", "contamination",
            "contaminated",
        ).collect()
    }
    exp = {tuple(r) for r in decontaminate_matrix(docs, benchmarks).collect()}
    assert got == exp and got  # non-empty: the suites overlap the corpus

    # crash-window replay: drop the last commit marker and restart —
    # batch 2 re-screens and overwrites its partition with equal rows
    ckpt = f"{out_dir}/_checkpoint"
    os.remove(f"{ckpt}/commits/2")
    crc = f"{ckpt}/commits/.2.crc"
    if os.path.exists(crc):
        os.remove(crc)
    q = stream_decontaminate_matrix(spark, flat, benchmarks, out_dir)
    q.processAllAvailable()
    q.stop()
    again = {
        tuple(r)
        for r in spark.read.parquet(f"{out_dir}/batch=*").select(
            "doc_id", "benchmark", "n_sh", "n_hit", "contamination",
            "contaminated",
        ).collect()
    }
    assert again == exp

    # lineage guard (r10 ADVICE): a FRESH checkpoint pointed at the
    # populated out_dir would renumber batches over different file
    # groupings and leave stale batch={id} partitions — must raise at
    # setup, before anything is written
    import pytest as _pytest

    with _pytest.raises(ValueError, match="checkpoint lineage"):
        stream_decontaminate_matrix(
            spark,
            flat,
            benchmarks,
            out_dir,
            checkpoint_dir=str(tmp_path / "ckpt_fresh"),
        )
    assert again == {
        tuple(r)
        for r in spark.read.parquet(f"{out_dir}/batch=*").select(
            "doc_id", "benchmark", "n_sh", "n_hit", "contamination",
            "contaminated",
        ).collect()
    }  # nothing written by the rejected lineage
