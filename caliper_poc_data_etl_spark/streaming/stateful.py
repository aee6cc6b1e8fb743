"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windowed aggregations (events.py) cover time-bucketed
state; this is the escape hatch for arbitrary per-key state machines —
here, a per-user running profile (event count, value sum, min/max
timestamp) maintained across micro-batches and emitted incrementally.

State semantics: GroupState holds one tuple per user; each batch folds
its rows into the state and emits the updated profile row (update-style
output). A processing-time timeout (here: none — profiles are permanent)
would bound state for abandoned keys; at 100 TB the state store shards
by the grouping key across executors, so per-key state must stay small
and bounded — a fixed-width tuple here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("first_seen", T.TimestampType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)

_STATE_SCHEMA = "n LONG, total DOUBLE, first_seen TIMESTAMP, last_seen TIMESTAMP"


def _update_profile(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, first_seen, last_seen = state.get
    else:
        n, total, first_seen, last_seen = 0, 0.0, None, None
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        first_seen = lo if first_seen is None else min(first_seen, lo)
        last_seen = hi if last_seen is None else max(last_seen, hi)
    state.update((n, total, first_seen, last_seen))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "n_events": n,
                "total_value": total,
                "first_seen": first_seen,
                "last_seen": last_seen,
            }
        ]
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Per-user running profile as a custom stateful operator.

    Works on a streaming frame (incremental state across batches) and
    equally on a batch frame via the same groupBy fold — the test
    replays the stream and checks the final per-user profile equals the
    batch aggregation."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


THROTTLE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
    ]
)

THROTTLE_GAP_US = 300_000_000  # 5 minutes, matches dedup_events_throttle

_THROTTLE_STATE = "last_us LONG"


def _throttle_group(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id, event_type = key
    last_us = state.get[0] if state.exists else None
    rows = pd.concat(list(batches), ignore_index=True)
    # Event-time order within the batch — the batch twin's lag window
    # orders by (ts, event_id); state carries the last RAW event's ts
    # (throttle is vs previous event, kept or not).
    rows = rows.sort_values(["ts", "event_id"])
    kept = []
    for r in rows.itertuples(index=False):
        ts_us = int(r.ts.value // 1000)  # pandas ns -> us
        if last_us is None or ts_us - last_us > THROTTLE_GAP_US:
            kept.append(r.event_id)
        last_us = ts_us
    state.update((last_us,))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(kept),
            "event_type": [event_type] * len(kept),
            "event_id": kept,
        }
    )


def throttled_events(events: DataFrame) -> DataFrame:
    """Streaming event throttle (custom state machine): emit an event
    only if the previous event of the same (user, type) — kept or not —
    is more than THROTTLE_GAP_US older. The per-key state is ONE long
    (last raw event-time), folded across micro-batches; the batch twin
    is ``queries.timeseries.dedup_events_throttle`` and a single-batch
    replay must reproduce it exactly (the driver oracle checks that)."""
    return (
        events.select("user_id", "event_type", "ts", "event_id")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _throttle_group,
            outputStructType=THROTTLE_SCHEMA,
            stateStructType=_THROTTLE_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
