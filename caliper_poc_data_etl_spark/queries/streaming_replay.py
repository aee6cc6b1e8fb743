"""Streaming operators graded through the batch oracle.

Each entry builds the REAL Structured Streaming pipeline
(`readStream` → watermarked event-time op → availableNow replay) and
returns the finished result as a batch DataFrame, so the driver's
DuckDB comparison checks streaming semantics end-to-end, not a batch
stand-in. The oracles are the same SQL as the batch twins in
``timeseries.py`` — a replay over static input must agree exactly.

``stream_dedup_within_watermark`` injects exact duplicate rows (a
two-source union of the same file stream) before
``dropDuplicatesWithinWatermark``; because the duplicates are
bit-identical, the surviving SET is deterministic regardless of which
physical copy the state store keeps — so the dedup result is fully
oracle-checkable even though survivor *arrival order* is
engine-timing specific.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from caliper_poc_data_etl_spark.queries.registry import query
from caliper_poc_data_etl_spark.streaming import (
    click_purchase_join,
    read_event_stream,
    replay_to_df,
    sessionized_values,
    sliding_totals,
    stateful_dedup,
    tumbling_counts,
)

_TUMBLING_ORACLE = """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
"""

# Strict ``>`` matches Spark session_window's closed merge: an event
# at exactly last_ts + 30 min EXTENDS the session (boundary pinned by
# tests/test_streaming.py::test_session_window_exact_boundary_convention).
_SESSION_ORACLE = """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS session_value
    FROM sessions
    GROUP BY user_id, session_seq
"""


@query("stream_tumbling_replay", oracle=_TUMBLING_ORACLE)
def stream_tumbling_replay(spark, sf_dir):
    """readStream → watermark → tumbling windows → availableNow replay."""
    events = read_event_stream(spark, sf_dir)
    return replay_to_df(tumbling_counts(events), mode="complete")


_SLIDING_ORACLE = """
    WITH expanded AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS w0, * FROM events
    ), windows AS (
      SELECT w0 AS window_start, * FROM expanded
      UNION ALL
      SELECT w0 - INTERVAL '30 minutes' AS window_start, * FROM expanded
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM windows
    GROUP BY 1
"""


@query("stream_sliding_replay", oracle=_SLIDING_ORACLE)
def stream_sliding_replay(spark, sf_dir):
    """readStream → watermark → sliding 1h/30min windows → availableNow
    replay (streaming twin of ``ts_sliding_window``, same oracle)."""
    events = read_event_stream(spark, sf_dir)
    return replay_to_df(sliding_totals(events), mode="complete")


@query("stream_session_replay", oracle=_SESSION_ORACLE)
def stream_session_replay(spark, sf_dir):
    """readStream → watermark → session windows → availableNow replay."""
    events = read_event_stream(spark, sf_dir)
    return replay_to_df(sessionized_values(events), mode="complete")


_JOIN_ORACLE = """
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           c.event_id AS click_event_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
    FROM events p
    JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.user_id = p.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL '30 minutes'
"""


@query("stream_join_replay", oracle=_JOIN_ORACLE)
def stream_join_replay(spark, sf_dir):
    """Stream-stream join replay: two independent readStreams over the
    same event source (clicks / purchases), watermarked both sides,
    joined with a two-sided time bound so join state is evictable —
    the missing operator family from round 1's streaming surface.
    Append mode: joined pairs emit as matches occur."""
    clicks = read_event_stream(spark, sf_dir).filter(F.col("event_type") == "click")
    purchases = read_event_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    return replay_to_df(click_purchase_join(clicks, purchases), mode="append")


_PROFILE_ORACLE = """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_seen,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_seen
    FROM events GROUP BY user_id
"""


@query("stream_stateful_profile_replay", oracle=_PROFILE_ORACLE)
def stream_stateful_profile_replay(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState) replay: the
    per-user running profile folded across micro-batches. Replaying
    the single-file source is one batch, so the update-mode emission
    is exactly the final profile per user — which must equal the batch
    aggregation, and that equality is what the oracle checks. The
    multi-batch incremental path is pytest-covered
    (tests/test_streaming.py)."""
    from caliper_poc_data_etl_spark.streaming.stateful import user_profiles

    events = read_event_stream(spark, sf_dir)
    out = replay_to_df(user_profiles(events), mode="update")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
        F.date_format("first_seen", fmt).alias("first_seen"),
        F.date_format("last_seen", fmt).alias("last_seen"),
    )


_DEDUP_ORACLE = """
    SELECT event_id, user_id, event_type, ROUND(value, 2) AS value
    FROM events
"""


@query("stream_dedup_within_watermark", oracle=_DEDUP_ORACLE)
def stream_dedup_within_watermark(spark, sf_dir):
    """Two readStreams over the same source, unioned (every event
    arrives twice, bit-identical) → dropDuplicatesWithinWatermark on
    event_id → exactly one copy per event survives.

    Deterministic by construction: the injected duplicates are
    identical rows, so whichever physical copy the state store keeps,
    the output SET equals the distinct input — which the DuckDB oracle
    states directly. Without the dedup the replay would return 2×
    rows, so a hash-green row here is hard evidence the operator
    actually removed the duplicates."""
    doubled = read_event_stream(spark, sf_dir).union(read_event_stream(spark, sf_dir))
    out = replay_to_df(stateful_dedup(doubled), mode="append")
    return out.select(
        "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
    )


_THROTTLE_ORACLE = """
    SELECT user_id, event_type, event_id FROM (
      SELECT user_id, event_type, event_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id, event_type
                                                   ORDER BY ts, event_id)) AS gap_us
      FROM events
    ) WHERE gap_us IS NULL OR gap_us > 300000000
"""


@query("stream_throttle_replay", oracle=_THROTTLE_ORACLE)
def stream_throttle_replay(spark, sf_dir):
    """Streaming event throttle (custom applyInPandasWithState machine,
    one long of state per key) replayed over the static source — must
    reproduce the batch lag-window formulation exactly, which is the
    same SQL that grades ``dedup_events_throttle``. The multi-batch
    state fold (last raw ts carrying across batches) is pytest-covered
    (tests/test_streaming.py)."""
    from caliper_poc_data_etl_spark.streaming import (
        read_event_stream,
        replay_to_df,
        throttled_events,
    )

    events = read_event_stream(spark, sf_dir)
    return replay_to_df(throttled_events(events), mode="append")


_TOPK_ORACLE = """
    WITH counts AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS w0, event_type,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT w0, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY w0
                                ORDER BY n DESC, event_type) AS rk
      FROM counts
    )
    SELECT strftime(w0, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, CAST(n AS BIGINT) AS n, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
"""


@query("stream_topk_per_window_replay", oracle=_TOPK_ORACLE)
def stream_topk_per_window_replay(spark, sf_dir):
    """Streaming top-K: the 3 most frequent event types per tumbling
    hour, over a live ``readStream``. Rank functions are unsupported
    inside a streaming aggregation (no window functions on update
    state), so this uses THE production shape: the stream maintains
    the windowed counts (incremental, watermark-bounded state) and the
    rank is a batch window over the replayed aggregate — exactly what
    a foreachBatch sink does per micro-batch at scale. Deterministic
    tiebreak (count desc, type asc) keeps the top-3 stable under
    re-ordering of arrivals."""
    from pyspark.sql.window import Window as W

    from caliper_poc_data_etl_spark.streaming import (
        read_event_stream,
        replay_to_df,
        tumbling_counts,
    )

    events = read_event_stream(spark, sf_dir)
    counts = replay_to_df(tumbling_counts(events), mode="complete")
    rk = F.row_number().over(
        W.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
    )
    return (
        counts.select("window_start", "event_type", "n", rk.alias("rk"))
        .filter(F.col("rk") <= 3)
    )


_UPSERT_ORACLE = """
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
           event_type AS last_event_type,
           ROUND(value, 2) AS last_value
    FROM (
      SELECT user_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1 AND event_type <> 'error'
"""


def _foreachbatch_upsert(
    spark, sf_dir, max_files_per_trigger=None, glob="events.parquet"
):
    """Core of stream_foreachbatch_upsert, parameterized so tests can
    force a REAL multi-batch fold (maxFilesPerTrigger=1 over a source
    staged as several top-level files).

    Streaming CDC sink via ``foreachBatch``: the event stream
    drives per-micro-batch MERGE logic into a keyed state table
    (latest row per key wins, terminal ``error`` tombstones delete) —
    THE production sink shape when the target is a keyed store
    (Delta/JDBC/KV) rather than an append log. Each batch reduces to
    its per-key latest, merges against the accumulated state with a
    full-outer resolve, and rewrites the state table; the final state
    after an availableNow replay must equal the batch
    ``upsert_latest_state`` — which is exactly what the oracle
    grades.

    State lives in a parquet table at a per-session path (the
    app-keyed staging convention); at scale the rewrite becomes a
    MERGE INTO against a transactional table, with identical batch
    logic. Batch boundaries don't affect the result: latest-wins
    merge is associative across any arrival slicing, which is what
    makes this sink exactly-once-equivalent under retries."""
    import tempfile

    from pyspark.sql.window import Window as W

    from caliper_poc_data_etl_spark.streaming import read_event_stream

    app = spark.sparkContext.applicationId.replace("-", "_")
    base_dir = f"{tempfile.gettempdir()}/graft_upsert_{app}"
    state_dir = f"{base_dir}/state"
    import shutil

    # Clear state AND checkpoint together: a surviving checkpoint with
    # a cleared state table would mark the source files already
    # processed and the replay would produce nothing.
    shutil.rmtree(base_dir, ignore_errors=True)

    def merge_batch(batch_df, batch_id):
        w = W.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        latest = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "ts", "event_id", "event_type", "value")
        )
        try:
            state = batch_df.sparkSession.read.parquet(state_dir)
        except Exception:
            state = None
        if state is not None:
            s = state.select(
                F.col("user_id"),
                F.col("ts").alias("s_ts"),
                F.col("event_id").alias("s_event_id"),
                F.col("event_type").alias("s_event_type"),
                F.col("value").alias("s_value"),
            )
            merged = latest.join(s, "user_id", "full_outer")
            newer = F.col("ts").isNotNull() & (
                F.col("s_ts").isNull()
                | (F.col("ts") > F.col("s_ts"))
                | ((F.col("ts") == F.col("s_ts")) & (F.col("event_id") > F.col("s_event_id")))
            )
            resolved = merged.select(
                "user_id",
                F.when(newer, F.col("ts")).otherwise(F.col("s_ts")).alias("ts"),
                F.when(newer, F.col("event_id")).otherwise(F.col("s_event_id")).alias("event_id"),
                F.when(newer, F.col("event_type")).otherwise(F.col("s_event_type")).alias("event_type"),
                F.when(newer, F.col("value")).otherwise(F.col("s_value")).alias("value"),
            )
        else:
            resolved = latest
        # rewrite to a temp dir then swap — the parquet source cannot
        # overwrite a table it is reading in the same job
        tmp = f"{state_dir}_next"
        resolved.write.mode("overwrite").parquet(tmp)
        final = batch_df.sparkSession.read.parquet(tmp)
        final.write.mode("overwrite").parquet(state_dir)

    events = read_event_stream(
        spark, sf_dir, max_files_per_trigger=max_files_per_trigger, glob=glob
    )
    q = (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", f"{base_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    # availableNow is guaranteed to terminate once the staged files
    # drain; a bare awaitTermination(N) that ignores its boolean would
    # silently grade a partially-merged state table under host
    # throttling — wait without a timeout instead.
    q.awaitTermination()
    from caliper_poc_data_etl_spark.streaming.events import (
        record_stream_progress,
    )

    record_stream_progress("stream_foreachbatch_upsert", q)
    state = spark.read.parquet(state_dir)
    return state.filter(F.col("event_type") != "error").select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
        F.col("event_type").alias("last_event_type"),
        F.round("value", 2).alias("last_value"),
    )


@query("stream_foreachbatch_upsert", oracle=_UPSERT_ORACLE)
def stream_foreachbatch_upsert(spark, sf_dir):
    """Streaming CDC sink via ``foreachBatch`` — see
    :func:`_foreachbatch_upsert` for the merge machinery (latest-wins
    per key, ``error`` tombstones, state table rewritten per batch at
    an app-keyed path). The availableNow replay's final state must
    equal the batch ``upsert_latest_state``, which is what the oracle
    grades; the multi-batch fold (maxFilesPerTrigger=1 over a split
    source) is pinned in tests/test_round5_ops.py."""
    return _foreachbatch_upsert(spark, sf_dir)
