"""Structured Streaming surface (SURVEY.md §7.1 P5).

The reference is batch-only (SURVEY.md §2A — no streams), so this
module is pure capability-closure: the engine's event-time operators
(`queries/timeseries.py` batch twins) re-expressed as streaming
transformations, plus replay helpers that run a stream to completion
with ``availableNow`` so the driver's batch oracle can grade streaming
semantics end-to-end.
"""

from caliper_poc_data_etl_spark.streaming.caliper import (  # noqa: F401
    attempt_events_stream,
    read_assessments_stream,
    run_attempts_stream,
)
from caliper_poc_data_etl_spark.streaming.stateful import (  # noqa: F401
    throttled_events,
    user_profiles,
)
from caliper_poc_data_etl_spark.streaming.events import (  # noqa: F401
    FLUSH_SENTINEL_CUTOFF,
    click_purchase_join,
    read_event_stream,
    replay_to_df,
    sessionized_values,
    sliding_totals,
    stage_watermark_flush_source,
    stateful_dedup,
    stream_events_to_json,
    tumbling_counts,
)
