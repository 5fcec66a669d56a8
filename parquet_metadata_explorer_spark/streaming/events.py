"""Event-stream operators: windowed aggregation, sessionization, as-of join.

Batch and streaming share the same transformation bodies — the batch
variants are what the DuckDB oracle verifies; the streaming variants wrap
them in Structured Streaming (readStream + watermark) and are exercised
with an availableNow trigger in tests.

Scale notes: tumbling-window aggregation is partial-aggregatable (one
shuffle on (window, event_type)); sessionization shuffles once on user_id
then runs an ordered window per user; the as-of join is expressed as a
union + last_value window — one shuffle on user_id, no range-explosion,
which is the composition Spark lacks as a native operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_metadata_explorer_spark.operators.relational import (
    _round_dec,
    _round_sum,
    _stable_sum,
)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table, normalizing ``ts`` to TIMESTAMP (LTZ).

    Handles both testdata vintages: TIMESTAMP(NANOS) parquet is read as
    raw int64 nanos (``nanosAsLong``) and truncated to microseconds —
    exact integer math, no double-precision loss at 10^18-scale epochs —
    while plain ``timestamp[us]`` with no timezone (Spark 4 reads it as
    TIMESTAMP_NTZ, which rejects numeric casts) is cast to TIMESTAMP.
    Sessions here run with ``spark.sql.session.timeZone=UTC``, so the
    NTZ→LTZ cast is the identity on wall-clock values and matches how
    DuckDB reads the same column.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the NTZ→LTZ cast in _normalize_ts is only the identity under UTC;
    # pin the session zone here so a non-UTC caller doesn't silently
    # shift every wall-clock value away from the DuckDB twin
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return _normalize_ts(df)


def _normalize_ts(df: DataFrame) -> DataFrame:
    dt = dict(df.dtypes)["ts"]
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def windowed_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + value stats."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            _round_sum(F.col("value"), 2).alias("sum_value"),
            # divide by count(value), not count(*): preserves SQL avg()
            # semantics when value is NULL (excluded from both sides)
            _round_dec(_stable_sum(F.col("value")) / F.count(F.col("value")), 4).alias(
                "avg_value"
            ),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
        .orderBy("window_start", "event_type")
    )


def multi_resolution_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style continuous aggregate: daily stats computed FROM
    the hourly aggregate, never re-touching raw events.

    The pattern that makes time-series rollups affordable at 100 TB: the
    raw table is aggregated once into the finest resolution (hour);
    every coarser resolution (day here, week/month identically) folds
    the next-finer one — 24 rows per day-group instead of millions.
    Count and decimal-sum partials are exactly associative, so
    daily-from-hourly is bit-equal to daily-from-raw — which is exactly
    what the oracle checks (the DuckDB twin aggregates raw events
    directly).
    """
    from parquet_metadata_explorer_spark.operators.relational import DEC

    hourly = events.groupBy(
        F.window("ts", "1 hour").alias("w"), F.col("event_type")
    ).agg(
        F.count("*").alias("n"),
        # keep the exact decimal partial — cast to double only at the end
        F.sum(F.col("value").cast(DEC)).alias("s"),
    )
    return (
        hourly.groupBy(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.round(F.sum("s"), 2).cast("double").alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact p50/p90/p99 of ``value`` per event_type (linear
    interpolation — the ANSI ``percentile_cont`` definition both Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` implement).

    Exact percentiles buffer each group's values; at 100 TB the same
    query shape runs with ``F.approx_percentile`` (t-digest, bounded
    memory, mergeable partials) — exact here because the oracle gate
    needs a deterministic cross-engine answer.
    """
    return events.groupBy("event_type").agg(
        F.count(F.col("value")).alias("n_values"),
        _round_dec(F.percentile(F.col("value"), F.lit(0.5)), 6).alias("p50"),
        _round_dec(F.percentile(F.col("value"), F.lit(0.9)), 6).alias("p90"),
        _round_dec(F.percentile(F.col("value"), F.lit(0.99)), 6).alias("p99"),
    )


def value_percentiles_approx(
    events: DataFrame, accuracy: int = 10_000
) -> DataFrame:
    """The 100 TB twin of ``value_percentiles``: ``approx_percentile``
    (Greenwald-Khanna-style sketch — bounded memory, mergeable partials,
    one partial-aggregatable shuffle) instead of exact ``percentile``
    (which buffers each group's values). Guarantee: the returned value's
    *rank* is within ``1/accuracy`` of the requested quantile, which is
    what the pytest tolerance check asserts against the exact operator.
    Registered rows-only (a sketch has no bit-identical DuckDB twin).
    """
    return events.groupBy("event_type").agg(
        F.count(F.col("value")).alias("n_values"),
        F.round(
            F.approx_percentile(F.col("value"), F.lit(0.5), F.lit(accuracy)), 6
        ).alias("p50"),
        F.round(
            F.approx_percentile(F.col("value"), F.lit(0.9), F.lit(accuracy)), 6
        ).alias("p90"),
        F.round(
            F.approx_percentile(F.col("value"), F.lit(0.99), F.lit(accuracy)), 6
        ).alias("p99"),
    )


def value_percentiles_histogram(
    events: DataFrame, n_buckets: int = 2048
) -> DataFrame:
    """Approximate per-type percentiles via a fixed-width HISTOGRAM
    sketch — the deterministic, engine-exact alternative to
    ``value_percentiles_approx``'s Greenwald-Khanna sketch (whose
    internals no second engine can replay bit-for-bit). The sketch core
    lives in ``operators.sketches.histogram_group_quantiles`` (same
    arithmetic, generic over group/value/fractions); this is the
    events-shaped entry point with the p50/p90/p99 monitoring columns.

    Two partial-aggregating shuffles: (1) per-group (min, max, n) —
    tiny, broadcast back; (2) per-(group, bucket) counts — state
    bounded by ``n_buckets`` per group, mergeable, the classic
    monitoring-system quantile shape. The estimate for quantile q is
    linear interpolation inside the first bucket whose cumulative
    count reaches rank ceil(q·n): value error ≤ (max−min)/n_buckets
    (asserted vs the exact operator in pytest). Every step is integer
    counts plus fixed-order double arithmetic, so the DuckDB oracle
    reproduces the output EXACTLY — unlike approx_percentile, this
    sketch can sit on the hash-compare board.
    """
    from parquet_metadata_explorer_spark.operators.sketches import (
        histogram_group_quantiles,
    )

    return histogram_group_quantiles(
        events,
        "event_type",
        "value",
        [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")],
        n_buckets=n_buckets,
    )


def _session_ids(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Events with a per-user ``session_seq`` column: lag to detect gaps,
    cumulative sum over the per-user timeline to number sessions. One
    shuffle on user_id; both windows share the same partitioning/order so
    Catalyst plans a single exchange + sort."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lag("ts").over(w)
    # fractional-second epochs (cast to double), matching DuckDB's epoch()
    new_session = (
        F.when(gap.isNull(), 1)
        .when(
            F.col("ts").cast("double") - gap.cast("double") > gap_minutes * 60, 1
        )
        .otherwise(0)
    )
    w_acc = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn("session_seq", F.sum(new_session).over(w_acc))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    longer than the gap. Classic lag + cumulative-sum-over-window — one
    shuffle on user_id, then ordered scans within each user partition."""
    return (
        _session_ids(events, gap_minutes).groupBy("user_id", "session_seq")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            _round_sum(F.col("value"), 2).alias("sum_value"),
        )
        .withColumn("session_seq", F.col("session_seq").cast("long"))
        .orderBy("user_id", "session_seq")
    )


def session_intervals(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session time intervals ``(user_id, session_seq, start_ts,
    end_ts)`` with raw timestamp bounds — the interval side of a range
    join (see ``operators.rangejoin.binned_interval_join``)."""
    return (
        _session_ids(events, gap_minutes)
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
        .withColumn("session_seq", F.col("session_seq").cast("long"))
    )


def json_props_stats(events: DataFrame) -> DataFrame:
    """Per-event-type stats over the JSON ``props`` payload column.

    ``get_json_object`` is a JVM-side expression (Jackson inside codegen,
    no Python), so JSON extraction over 100 TB of event payloads is a
    map-only pass feeding one partial-aggregated shuffle on event_type.
    Exact integer aggregates only, so the DuckDB ``json_extract`` twin is
    a bit-exact oracle.
    """
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return events.withColumn("k", k).groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.count("k").cast("long").alias("n_with_k"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.countDistinct("k").cast("long").alias("n_distinct_k"),
    )


def asof_join_purchases(events: DataFrame) -> DataFrame:
    """As-of join: for every 'purchase' event, the most recent prior
    'click' event of the same user (event-time ordered).

    Spark has no native ASOF JOIN; the scalable composition is
    union-tag → window last_value over the per-user timeline — a single
    shuffle on user_id, no O(n·m) range join. Verified against DuckDB's
    native ``ASOF JOIN``.
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("purchase_id")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("click_id")
    )
    tagged = purchases.select(
        "user_id",
        F.col("p_ts").alias("ts"),
        F.lit("p").alias("side"),
        F.col("purchase_id").alias("eid"),
    ).unionByName(
        clicks.select(
            "user_id",
            F.col("c_ts").alias("ts"),
            F.lit("c").alias("side"),
            F.col("click_id").alias("eid"),
        )
    )
    # order clicks strictly before same-timestamp purchases so "most recent
    # prior click" includes ties (matches ASOF JOIN's <= semantics)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.when(F.col("side") == "c", 0).otherwise(1), F.col("eid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.last(
        F.when(F.col("side") == "c", F.col("eid")), ignorenulls=True
    ).over(w)
    last_click_ts = F.last(
        F.when(F.col("side") == "c", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        tagged.withColumn("click_id", last_click)
        .withColumn("click_ts", last_click_ts)
        .filter(F.col("side") == "p")
        .select(
            "user_id",
            F.col("eid").alias("purchase_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            "click_id",
            F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        )
        .orderBy("user_id", "purchase_id")
    )


def funnel_conversion(
    events: DataFrame, window_minutes: int = 60
) -> DataFrame:
    """Two-step funnel: per event type pair (view → purchase), how many
    users converted — performed a purchase within ``window_minutes`` of
    some earlier (or simultaneous) view.

    Scale shape: the same union-tag + per-user-timeline window as the
    as-of join — ONE shuffle on user_id, never a view×purchase range
    join. Per purchase, the most recent prior view's timestamp comes
    from ``last(..., ignorenulls)`` over the ordered timeline; a user
    converts if any purchase's lag is within the window. Output is one
    summary row: (n_viewers, n_purchasers, n_converted, conversion_pct).
    """
    viewers = F.countDistinct(
        F.when(F.col("side") == "v", F.col("user_id"))
    )
    purchasers = F.countDistinct(
        F.when(F.col("side") == "p", F.col("user_id"))
    )
    tagged = (
        events.filter(F.col("event_type") == "view")
        .select("user_id", "ts", F.lit("v").alias("side"), "event_id")
        .unionByName(
            events.filter(F.col("event_type") == "purchase").select(
                "user_id", "ts", F.lit("p").alias("side"), "event_id"
            )
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            "ts",
            F.when(F.col("side") == "v", 0).otherwise(1),
            "event_id",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_view_ts = F.last(
        F.when(F.col("side") == "v", F.col("ts")), ignorenulls=True
    ).over(w)
    converted_purchase = (
        (F.col("side") == "p")
        & last_view_ts.isNotNull()
        & (
            F.col("ts").cast("long") - last_view_ts.cast("long")
            <= window_minutes * 60
        )
    )
    per_user = tagged.withColumn(
        "conv", converted_purchase.cast("int")
    )
    return per_user.agg(
        viewers.cast("long").alias("n_viewers"),
        purchasers.cast("long").alias("n_purchasers"),
        F.countDistinct(F.when(F.col("conv") == 1, F.col("user_id")))
        .cast("long")
        .alias("n_converted"),
    ).select(
        "n_viewers",
        "n_purchasers",
        "n_converted",
        _round_dec(
            F.col("n_converted") * 100.0 / F.col("n_purchasers"), 4
        ).alias("conversion_pct"),
    )


def gapfill_hourly(events: DataFrame, event_type: str = "purchase") -> DataFrame:
    """Timescale-style gap-fill: a dense hourly spine between the
    event type's first and last hour, left-joined to the hourly mean
    value, missing hours filled by last-observation-carried-forward.

    Scale shape: hourly partials partial-aggregate map-side (one shuffle
    on the hour key); the spine is generated from a single broadcast
    min/max row (``sequence()`` of hours — spine size = time span, not
    data size); the LOCF window orders the spine only (rows = hours).
    For multi-year × many-series gap-fill the window key becomes
    (series, month-chunk) so no single sort exceeds one partition — at
    one series and hourly grain the plain window is exact and bounded.

    Output: (hour, mean_value, filled_value, was_gap).
    """
    sub = events.filter(F.col("event_type") == event_type)
    hourly = sub.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(30,10)"))
            / F.count(F.col("value")),
            6,
        )
        .cast("double")
        .alias("mean_value")
    )
    span = sub.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = span.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    w = Window.orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = spine.join(hourly, "hour", "left")
    return (
        joined.select(
            "hour",
            "mean_value",
            F.last("mean_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("mean_value").isNull().alias("was_gap"),
        )
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "mean_value",
            "filled_value",
            "was_gap",
        )
        .orderBy("hour")
    )


def gapfill_hourly_by_type(events: DataFrame) -> DataFrame:
    """Multi-series gap-fill: every event_type gets its own dense hourly
    spine (first..last hour of THAT series) with LOCF — the documented
    (series, month-chunk) scale strategy as code, not prose.

    Scale shape — no window ever sorts a whole series in one partition:

    1. hourly means partial-aggregate into one shuffle on
       (event_type, hour); spans are one tiny row per series.
    2. within-chunk LOCF runs under a window keyed
       (event_type, month(hour)) — partition size is bounded by the
       calendar (≤744 rows) regardless of how many years the data spans.
    3. cross-chunk carry: each (series, month)'s last observed value is a
       one-row-per-chunk aggregate (``max_by(value, hour)``); a window
       over THOSE rows (rows = months per series, data-size-independent)
       carries the latest prior-month value forward, and a broadcast-sized
       join hands each chunk its carry-in.
    4. filled = coalesce(within-chunk LOCF, chunk carry-in) — together
       exactly equal to a per-series unbounded LOCF (the DuckDB twin runs
       the plain per-series window; hash-equality of the board row is the
       proof the chunked decomposition is exact).

    Output: (event_type, hour, mean_value, filled_value, was_gap).
    """
    hourly = events.groupBy(
        F.col("event_type"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(30,10)"))
            / F.count(F.col("value")),
            6,
        )
        .cast("double")
        .alias("mean_value")
    )
    spans = events.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = spans.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    joined = spine.join(hourly, ["event_type", "hour"], "left")
    chunk = F.date_trunc("month", F.col("hour")).alias("chunk")
    in_chunk = Window.partitionBy("event_type", chunk).orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # last observed value per (series, month) — one row per observed chunk
    chunk_last = hourly.groupBy(
        "event_type", F.date_trunc("month", F.col("hour")).alias("chunk")
    ).agg(F.max_by("mean_value", "hour").alias("chunk_last"))
    # the carry must cover EVERY spine month (a fully-empty month still
    # needs its predecessor's value), so it runs over a dense month spine,
    # not just observed months
    month_spine = spans.select(
        "event_type",
        F.explode(
            F.sequence(
                F.date_trunc("month", "h0"),
                F.date_trunc("month", "h1"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("chunk"),
    )
    months = Window.partitionBy("event_type").orderBy("chunk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = month_spine.join(chunk_last, ["event_type", "chunk"], "left").select(
        "event_type",
        "chunk",
        F.last("chunk_last", ignorenulls=True).over(months).alias("carry_in"),
    )
    return (
        joined.withColumn("chunk", F.date_trunc("month", F.col("hour")))
        .join(carry, ["event_type", "chunk"], "left")
        .select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "mean_value",
            F.coalesce(
                F.last("mean_value", ignorenulls=True).over(in_chunk),
                F.col("carry_in"),
            ).alias("filled_value"),
            F.col("mean_value").isNull().alias("was_gap"),
        )
        .orderBy("event_type", "hour")
    )


# ---------------------------------------------------------------------------
# structured-streaming variants
# ---------------------------------------------------------------------------


def stream_windowed_counts(spark: SparkSession, events_path: str) -> DataFrame:
    """Streaming twin of ``windowed_counts``: parquet file stream +
    10-minute watermark for late data; aggregation state is bounded by the
    watermark. Run with ``trigger(availableNow=True)`` for batch-replay."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(events_path).schema)
        .option("maxFilesPerTrigger", "4")
        .load(events_path)
    )
    stream = _normalize_ts(stream)
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            _round_sum(F.col("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_sessionize(
    spark: SparkSession,
    events_path: str,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``sessionize`` on Spark's NATIVE gap-based
    ``session_window`` — the built-in exists precisely for this, so no
    custom state is needed: state is bounded by the watermark, sessions
    merge automatically as late-but-in-horizon events arrive, and a
    session emits (append mode) once the watermark passes its close.

    ``session_window.end`` is last-event-time + gap by definition, so the
    batch operator's ``session_end = max(ts)`` is recovered by
    subtracting the gap — the replay test compares the two operators
    field-for-field (minus the per-user sequence number, which streaming
    sessions don't carry)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(events_path).schema)
        .option("maxFilesPerTrigger", "4")
        .load(events_path)
    )
    stream = _normalize_ts(stream).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    sw = F.session_window(F.col("ts"), f"{gap_minutes} minutes")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), sw.alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            _round_sum(F.col("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(
                F.col("w.end") - F.expr(f"INTERVAL {gap_minutes} MINUTES"),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_range_join(
    spark: SparkSession,
    events_path: str,
    intervals: DataFrame,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Stream-static range join: point events arriving on a stream land in
    their containing (static) interval — the same binned equi-join rewrite
    as the batch operator (``operators.rangejoin``), which is what makes
    it streamable at all: Structured Streaming supports stream-static
    *equi*-joins per micro-batch, while a raw BETWEEN theta join would
    plan a per-batch nested loop over the whole interval table. The
    static side (with its bin explode) is planned once and reused every
    micro-batch; no streaming state is kept — each point joins within the
    batch it arrives in.
    """
    from ..operators.rangejoin import binned_interval_join

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(events_path).schema)
        .option("maxFilesPerTrigger", "4")
        .load(events_path)
    )
    stream = _normalize_ts(stream).filter(
        F.col("event_type") == "purchase"
    ).select("user_id", F.col("event_id").alias("purchase_id"), "ts")
    return binned_interval_join(
        stream, intervals, keys=("user_id",), bin_seconds=bin_seconds
    )


def stream_exact_dedup(spark: SparkSession, docs_path: str) -> DataFrame:
    """Streaming exact dedup: emit each distinct document fingerprint the
    first time it arrives, drop every later copy.

    ``dropDuplicates`` on a stream keeps per-key state; here the key is
    the md5 fingerprint so state is one row per *distinct* document —
    bounded by corpus diversity, not stream length. (With an event-time
    column a ``withWatermark`` before the dropDuplicates would expire
    state for time-bounded dedup windows; the documents table has no
    timestamp, so this variant keeps full history.)
    """
    from ..functions import normalize_text

    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(docs_path).schema)
        .option("maxFilesPerTrigger", "4")
        .load(docs_path)
    )
    return (
        stream.select(
            F.col("doc_id"),
            F.md5(normalize_text(F.col("text"))).alias("fingerprint"),
        )
        .dropDuplicates(["fingerprint"])
    )


def stream_near_dedup_candidates(
    spark: SparkSession,
    docs_path: str,
    bucket_cap: int = 64,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming MinHash near-duplicate *candidate* pairs: as documents
    arrive, each is signed (same Arrow kernel as the batch operator),
    banded (same ``band_rows`` banding), and checked against the running
    membership of its LSH buckets via ``applyInPandasWithState``.

    Emits ``(doc_a, doc_b)`` with ``doc_a < doc_b`` the first micro-batch
    in which both endpoints have been seen; a pair sharing several bands
    can be emitted once per band (consumers ``distinct()`` or feed
    ``connected_components``, which deduplicates by construction).
    Candidates-only by design: exact-Jaccard verification needs both
    documents' shingle sets — a batch join against the corpus — so the
    streaming stage emits the (tiny) candidate stream and verification
    runs downstream, exactly like the batch operator's verify stage.

    State is one array of doc_ids per *occupied* (band, bucket), capped
    at ``bucket_cap`` entries — beyond the cap new members still pair
    against the stored prefix but are not stored, bounding both state
    size and per-bucket output at the cost of missing
    cap-th-order duplicates (a 10M-copy document cluster stores 64 ids,
    not 10M). Shuffle shape matches batch LSH: one exchange on the
    uniform (band_id, band_sig) key per micro-batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.dedup import band_rows, minhash_signatures

    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(docs_path).schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(docs_path)
    )
    bands = band_rows(minhash_signatures(stream))

    def update(key, pdf_iter, state: GroupState):
        # GroupState.get is a property returning the state tuple
        (stored,) = state.get if state.exists else ([],)
        seen = list(stored)
        out_a, out_b = [], []
        for pdf in pdf_iter:
            for doc_id in sorted(int(d) for d in pdf["doc_id"]):
                for other in seen:
                    if other != doc_id:
                        a, b = sorted((other, doc_id))
                        out_a.append(a)
                        out_b.append(b)
                if len(seen) < bucket_cap and doc_id not in seen:
                    seen.append(doc_id)
        state.update((seen,))
        yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    return bands.groupBy("band_id", "band_sig").applyInPandasWithState(
        update,
        outputStructType=StructType(
            [StructField("doc_a", LongType()), StructField("doc_b", LongType())]
        ),
        stateStructType=StructType(
            [StructField("doc_ids", ArrayType(LongType()))]
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_line_dedup(
    spark: SparkSession,
    docs_path: str,
    chunk_tokens: int = 8,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming twin of ``dedup.line_dedup``: documents arrive as files
    land; each is split into lines (k-token chunks here — the corpus has
    no newlines) and a line is emitted the first time it is seen, every
    later copy dropped. State is one row per *distinct* line (bounded by
    corpus line diversity, not stream length), shuffled on the uniform
    line key per micro-batch.

    Semantics note vs the batch operator: the batch arg-min keeps the
    globally smallest (doc_id, line_no) instance; the stream keeps the
    first *arrival*, and within one micro-batch ``dropDuplicates`` picks
    an arbitrary instance — the SET of surviving lines is identical, the
    owning doc of a line first seen twice in one batch may differ (the
    replay test asserts set equality, not instance identity).
    """
    k = int(chunk_tokens)
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(docs_path).schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(docs_path)
    )
    # project the split array first — a captured split(text) inside the
    # transform lambda re-splits per chunk (the r9 lambda-capture fix)
    toks = F.col("t")
    n_lines = F.greatest(F.ceil(F.size(toks) / F.lit(k)).cast("int"), F.lit(1))
    lines_arr = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * k + 1, k)),
    )
    return (
        stream.select("doc_id", F.split(F.col("text"), " ").alias("t"))
        .select("doc_id", F.posexplode(lines_arr).alias("line_no", "line"))
        .dropDuplicates(["line"])
    )


def stream_substring_novelty(
    spark: SparkSession,
    docs_path: str,
    window: int = 20,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming twin of ``dedup.substring_dedup``'s discovery side:
    documents arrive as files land, each emits its rolling
    ``window``-token span hashes, and a span survives the first time it
    is seen — every later copy (the duplicated spans the batch operator
    counts) is dropped. State is one row per DISTINCT span hash
    (bounded by corpus span diversity, not stream length), shuffled on
    the uniform hash key per micro-batch.

    Same semantics note as ``stream_line_dedup``: the batch arg-min
    keeps the globally smallest (doc_id, pos) instance; the stream
    keeps the first arrival — the replay test asserts SET equality of
    surviving span hashes plus the duplicated-window count.
    """
    from ..functions import tokens
    from ..operators.dedup import window_hashes

    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(docs_path).schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(docs_path)
    )
    toks = tokens(F.col("text"))
    tokenized = stream.select(
        "doc_id", toks.alias("t"), F.size(toks).alias("n_tokens")
    )
    wins = window_hashes(F.col("t"), F.col("n_tokens"), window)
    return (
        tokenized.select("doc_id", F.posexplode(wins).alias("pos", "h"))
        .dropDuplicates(["h"])
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort-retention matrix: users grouped by the week of
    their first event; for each (cohort week, week offset), how many of
    the cohort were active, and the retention percentage.

    Scale shape: three partial-aggregating shuffles — per-user first
    week (groupBy user), distinct (user, week) activity, then the
    matrix groupBy — all on near-uniform keys; the matrix itself is
    weeks × offsets, tiny. ``date_trunc('week')`` is Monday-start on
    both engines.
    """
    firsts = events.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohort_sizes = firsts.groupBy("cohort_week").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    matrix = (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("week"), F.col("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return (
        matrix.join(F.broadcast(cohort_sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            _round_dec(F.col("n_active") * 100.0 / F.col("cohort_size"), 4).alias(
                "retention_pct"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


def view_purchase_attribution(
    events: DataFrame, window_minutes: int = 30
) -> DataFrame:
    """Interval self-join (view→purchase attribution): every (view,
    purchase) pair of the SAME user where the view happened within
    ``window_minutes`` before the purchase.

    Scale shape: the equality key (user_id) carries the join — Catalyst
    plans a single hash/sort-merge equi-join on user_id with the time
    interval as a residual filter, so the shuffle is one pass per side
    on a near-uniform key and the residual only scans each user's own
    pairs (per-user event counts are bounded in practice; a pathological
    single-user firehose is the same hot-key problem every per-user
    operator here documents). This is deliberately NOT a bin-explode
    rewrite: with an equality key already present, binning would only
    multiply rows. The streaming twin (``stream_stream_attribution``)
    runs the identical predicate as a watermarked stream-stream join.
    """
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return (
        purchases.join(
            views,
            (F.col("v_user") == F.col("user_id"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (
                F.col("v_ts")
                >= F.col("p_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES")
            ),
        )
        .select(
            "user_id",
            "purchase_id",
            "view_id",
            # whole-second floor of the EXACT microsecond delta —
            # unix_timestamp() floors each side independently, which is
            # off by one whenever the sub-second parts straddle
            F.expr("(unix_micros(p_ts) - unix_micros(v_ts)) div 1000000")
            .cast("long")
            .alias("delay_sec"),
        )
        .orderBy("user_id", "purchase_id", "view_id")
    )


def stream_stream_attribution(
    spark: SparkSession,
    events_path: str,
    window_minutes: int = 30,
    watermark_minutes: int = 60,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Stream-STREAM interval join: the streaming twin of
    ``view_purchase_attribution``, and the one join shape that keeps
    state on BOTH sides. Each side declares an event-time watermark;
    the interval condition relates the two event-time columns, so the
    engine can expire buffered rows — a view older than
    (purchase watermark − window) can never match a future purchase,
    and a purchase older than the view watermark can never gain new
    views — bounding state by watermark + window, never stream length.
    Without the time-interval condition (or watermarks) Spark would
    rightly refuse to plan an append-mode stream-stream inner join,
    because state would grow forever.

    State partitions by the equality key (user_id), the same
    near-uniform key as the batch join's shuffle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_path).schema
    base = _normalize_ts(
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(events_path)
    )
    views = (
        base.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", f"{watermark_minutes} minutes")
    )
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", f"{watermark_minutes} minutes")
    )
    return purchases.join(
        views,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (
            F.col("v_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES")
        ),
    ).select(
        "user_id",
        "purchase_id",
        "view_id",
        F.expr("(unix_micros(p_ts) - unix_micros(v_ts)) div 1000000")
        .cast("long")
        .alias("delay_sec"),
    )


def trending_event_types(
    events: DataFrame,
    window_hours: int = 6,
    slide_hours: int = 1,
    k: int = 3,
) -> DataFrame:
    """Sliding-window trending report: top-k event types by count in
    every ``window_hours``-hour window sliding by ``slide_hours``.

    ``F.window(ts, w, s)`` assigns each event to its w/s overlapping
    windows (explode at the source, epoch-aligned starts) and the count
    is partial-aggregatable per (window, type) — one shuffle whose key
    count is time-span × types, not event count. The top-k window
    partitions by window_start: calendar-sized input (types per
    window), so the rank never sees raw events. Ties break
    lexicographically on event_type for a deterministic board.
    """
    win = F.window("ts", f"{window_hours} hours", f"{slide_hours} hours")
    counts = (
        events.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    w_rank = Window.partitionBy("w").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "rank",
        )
        .orderBy("window_start", "rank")
    )


def stream_trending(
    spark: SparkSession,
    events_path: str,
    window_hours: int = 6,
    slide_hours: int = 1,
) -> DataFrame:
    """Streaming twin of the sliding-window count (the top-k rank runs
    downstream of the sink — ranking inside the stream would need
    complete-mode re-emission of whole windows). Watermark bounds the
    per-window state; each event updates its w/s overlapping windows."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = _normalize_ts(
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(events_path).schema)
        .option("maxFilesPerTrigger", "4")
        .load(events_path)
    )
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(
            F.window("ts", f"{window_hours} hours", f"{slide_hours} hours").alias(
                "w"
            ),
            "event_type",
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )


def hourly_anomalies(
    events: DataFrame, trail_hours: int = 24, z_threshold: float = 3.0
) -> DataFrame:
    """Hourly volume anomaly detection: flag (event_type, hour) buckets
    whose count deviates from the TRAILING ``trail_hours``-hour
    mean by more than ``z_threshold`` sample standard deviations.

    The raw stream collapses to (type, hour) counts first — one
    partial-aggregatable shuffle — and the trailing statistics run as a
    RANGE window over the hourly series EXCLUDING the current row
    (−trail_hours .. −1 hour), so a spike never masks itself by
    inflating its own baseline. Window partitions are per event_type
    and calendar-sized. Variance is computed from exact decimal
    Σx/Σx² partials (sample stddev, n−1), so the z-scores are
    partition-count invariant; hours with fewer than 2 trailing points
    or zero variance report NULL z and never flag.
    """
    from parquet_metadata_explorer_spark.operators.relational import DEC

    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").cast("long").alias("n_events"))
    hrs = F.unix_timestamp("hour") / 3600
    w = (
        Window.partitionBy("event_type")
        .orderBy(hrs.cast("long"))
        .rangeBetween(-trail_hours, -1)
    )
    n = F.count("n_events").over(w)
    sx = F.sum(F.col("n_events").cast(DEC)).over(w)
    sxx = F.sum((F.col("n_events") * F.col("n_events")).cast(DEC)).over(w)
    mean = sx.cast("double") / n
    # sample variance from exact partials: (Σx² − (Σx)²/n) / (n−1)
    var = (sxx.cast("double") - sx.cast("double") * sx.cast("double") / n) / (n - 1)
    z = F.when(
        (n >= 2) & (var > 0),
        (F.col("n_events") - mean) / F.sqrt(var),
    )
    return (
        hourly.select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "n_events",
            _round_dec(mean, 4).alias("trail_mean"),
            _round_dec(z, 4).alias("z_score"),
            F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("anomaly"),
        )
        .orderBy("event_type", "hour")
    )


def gapfill_hourly_interpolate(events: DataFrame) -> DataFrame:
    """Linear-interpolation gap-fill: every missing hour gets the value
    linearly interpolated between its nearest observed neighbors (LOCF
    at the trailing edge, backfill at the leading edge) — the fill
    strategy for continuous metrics where carrying a stale value flat
    distorts trends.

    Same chunked scale shape as the LOCF variant, run in BOTH
    directions: (value, hour) pairs carry forward AND backward under
    (series, month-chunk) windows (≤744 rows each), with per-chunk
    boundary pairs folded month-spine-wise so a fully-empty month still
    inherits both neighbors. Interpolation arithmetic is fixed-order
    double math over exact decimal hourly means and integer hour
    distances, so the result is partition-invariant; the DuckDB twin
    runs the plain per-series unbounded windows — hash equality proves
    the bidirectional chunk decomposition exact.
    """
    hourly = events.groupBy(
        F.col("event_type"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(30,10)"))
            / F.count(F.col("value")),
            6,
        )
        .cast("double")
        .alias("mean_value")
    )
    spans = events.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = spans.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    joined = spine.join(hourly, ["event_type", "hour"], "left")

    pair = F.when(
        F.col("mean_value").isNotNull(),
        F.struct(F.col("hour").alias("h"), F.col("mean_value").alias("v")),
    )
    chunk = F.date_trunc("month", F.col("hour"))
    w_back = (
        Window.partitionBy("event_type", chunk)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("event_type", chunk)
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    # per observed (series, month): the last and first observed pairs
    chunk_edges = hourly.groupBy(
        "event_type", F.date_trunc("month", F.col("hour")).alias("chunk")
    ).agg(
        F.max_by(
            F.struct(F.col("hour").alias("h"), F.col("mean_value").alias("v")), "hour"
        ).alias("chunk_last"),
        F.min_by(
            F.struct(F.col("hour").alias("h"), F.col("mean_value").alias("v")), "hour"
        ).alias("chunk_first"),
    )
    month_spine = spans.select(
        "event_type",
        F.explode(
            F.sequence(
                F.date_trunc("month", "h0"),
                F.date_trunc("month", "h1"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("chunk"),
    )
    months_prev = Window.partitionBy("event_type").orderBy("chunk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    months_next = Window.partitionBy("event_type").orderBy("chunk").rowsBetween(
        1, Window.unboundedFollowing
    )
    carry = month_spine.join(chunk_edges, ["event_type", "chunk"], "left").select(
        "event_type",
        "chunk",
        F.last("chunk_last", ignorenulls=True).over(months_prev).alias("carry_in"),
        F.first("chunk_first", ignorenulls=True).over(months_next).alias("carry_out"),
    )

    prev_p = F.coalesce(F.last(pair, ignorenulls=True).over(w_back), F.col("carry_in"))
    next_p = F.coalesce(F.first(pair, ignorenulls=True).over(w_fwd), F.col("carry_out"))
    dh = (F.unix_timestamp(next_p["h"]) - F.unix_timestamp(prev_p["h"])) / 3600
    dx = (F.unix_timestamp(F.col("hour")) - F.unix_timestamp(prev_p["h"])) / 3600
    interp = (
        F.when(F.col("mean_value").isNotNull(), F.col("mean_value"))
        .when(
            prev_p.isNotNull() & next_p.isNotNull(),
            prev_p["v"] + (next_p["v"] - prev_p["v"]) * dx / dh,
        )
        .when(prev_p.isNotNull(), prev_p["v"])
        .when(next_p.isNotNull(), next_p["v"])
    )
    return (
        joined.withColumn("chunk", chunk)
        .join(carry, ["event_type", "chunk"], "left")
        .select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "mean_value",
            _round_dec(interp, 6).alias("filled_value"),
            F.col("mean_value").isNull().alias("was_gap"),
        )
        .orderBy("event_type", "hour")
    )
