"""Event-time windowing over ``events`` — batch twins of the streaming
operators (SURVEY.md §2B "Streaming" rows).

The same logical windows run as Structured Streaming in
``caliper_poc_data_etl_spark.streaming``; here they run in batch so the
DuckDB oracle can check the window semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from caliper_poc_data_etl_spark.queries.registry import query, t

FMT_S = "yyyy-MM-dd HH:mm:ss"
FMT_D = "%Y-%m-%d %H:%M:%S"


@query(
    "ts_tumbling_window",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{FMT_D}') AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour event-time windows per event type."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", FMT_S).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "ts_sliding_window",
    oracle=f"""
    WITH expanded AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS w0, * FROM events
    ), windows AS (
      SELECT w0 AS window_start, * FROM expanded
      UNION ALL
      SELECT w0 - INTERVAL '30 minutes' AS window_start, * FROM expanded
    )
    SELECT strftime(window_start, '{FMT_D}') AS window_start,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM windows
    GROUP BY 1
    """,
)
def ts_sliding_window(spark, sf_dir):
    """Sliding windows (1 h size, 30 min slide): each event lands in 2
    windows; Spark's window() emits them directly."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", FMT_S).alias("window_start"),
            "n",
            "total_value",
        )
    )


@query(
    "ts_session_window",
    oracle="""
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
    """,
)
def ts_session_window(spark, sf_dir):
    """Session windows (30-min gap) via F.session_window — the native
    batch form of the streaming session operator.

    Boundary convention: Spark session_window MERGES sessions whose
    intervals touch — an event at EXACTLY last_ts + 30 min EXTENDS the
    session (closed merge, pinned by
    tests/test_streaming.py::test_session_window_exact_boundary_convention
    against a hand-built exact-gap fixture; the sf data has no exact
    boundaries, so only the fixture exercises it). The oracle's LAG
    flag therefore uses strict ``>`` — a new session only when the gap
    EXCEEDS 30 min. Every sessionization op in the engine
    (window_sessionize, ts_user_trajectory, streaming
    sessionized_values) pins this same convention.
    """
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
            "session_value",
        )
    )


@query(
    "ts_first_last_by_time",
    oracle="""
    SELECT user_id,
           arg_min(value, ts) AS first_value,
           arg_max(value, ts) AS last_value,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
           COUNT(*) AS n
    FROM events GROUP BY user_id
    """,
)
def ts_first_last_by_time(spark, sf_dir):
    """Time-ordered first/last per key (min_by/max_by)."""
    e = t(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return e.groupBy("user_id").agg(
        F.min_by("value", "ts").alias("first_value"),
        F.max_by("value", "ts").alias("last_value"),
        F.date_format(F.min("ts"), fmt).alias("first_ts"),
        F.date_format(F.max("ts"), fmt).alias("last_ts"),
        F.count("*").alias("n"),
    )


@query(
    "ts_rate_per_day",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
    FROM events GROUP BY 1, 2
    """,
)
def ts_rate_per_day(spark, sf_dir):
    """Daily event counts + distinct users (DAU) — the rollup shape."""
    e = t(spark, sf_dir, "events")
    return e.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("dau"))


@query(
    "ts_gap_fill_daily",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ), days AS (
      SELECT user_id,
             unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM span
    )
    SELECT days.user_id,
           strftime(days.day, '%Y-%m-%d') AS day,
           CAST(COALESCE(daily.n, 0) AS BIGINT) AS n
    FROM days LEFT JOIN daily USING (user_id, day)
    """,
)
def ts_gap_fill_daily(spark, sf_dir):
    """Gap-filled daily counts per user: every calendar day between a
    user's first and last event appears, missing days as 0 — the
    resample/densify step before any per-day trend or rate model.

    Scale shape: the calendar is GENERATED per user with
    ``sequence()`` + ``explode`` (rows ≈ users × span-days, built
    executor-side — never a driver-side date loop) and left-joined to
    the observed dailies; both sides hash-partition on user_id, so the
    fill is one co-partitioned shuffle, no crossJoin against a global
    calendar dimension."""
    e = t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    daily = e.groupBy("user_id", "day").agg(F.count("*").alias("n"))
    days = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    return days.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n", F.lit(0)).alias("n"),
    )


@query(
    "ts_ohlc_daily",
    oracle="""
    SELECT user_id,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           ROUND(arg_min(value, ts), 4) AS open,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low,
           ROUND(arg_max(value, ts), 4) AS close,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_ohlc_daily(spark, sf_dir):
    """Daily OHLC downsampling per user (open = value at first event
    of the day, close = at last): the classic time-series compaction —
    one hash aggregation, no window, no sort. ``min_by``/``max_by``
    are single-pass algebraic aggregates, so this keeps map-side
    partial aggregation even at 100 TB. (user_id, ts) is unique in
    the fixtures; at scale an event_id tiebreak would be folded into
    the ordering key."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.round(F.min_by("value", "ts"), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", "ts"), 4).alias("close"),
            F.count("*").alias("n"),
        )
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )


@query(
    "ts_month_over_month",
    oracle="""
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT month,
           CAST(rev AS DOUBLE) AS revenue,
           ROUND((CAST(rev AS DOUBLE)
                  - CAST(LAG(rev) OVER (ORDER BY month) AS DOUBLE))
                 / CAST(LAG(rev) OVER (ORDER BY month) AS DOUBLE), 6) AS mom_pct
    FROM m
    """,
)
def ts_month_over_month(spark, sf_dir):
    """Monthly revenue + month-over-month percent change — the trend
    report shape. Revenue sums in DECIMAL (exact, order-independent
    across partitions/engines); the lag window runs AFTER aggregation
    over one row per month, so the unpartitioned ORDER BY window is
    driver-scale by construction, not a single-reducer pass over the
    fact table."""
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        )
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = W.orderBy("month")
    rev = F.col("rev").cast("double")
    prev = F.lag(F.col("rev")).over(w).cast("double")
    return m.select(
        "month",
        rev.alias("revenue"),
        F.round((rev - prev) / prev, 6).alias("mom_pct"),
    )


@query(
    "dedup_events_throttle",
    oracle="""
    SELECT user_id, event_type, event_id FROM (
      SELECT user_id, event_type, event_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id, event_type
                                                   ORDER BY ts, event_id)) AS gap_us
      FROM events
    ) WHERE gap_us IS NULL OR gap_us > 300000000
    """,
)
def dedup_events_throttle(spark, sf_dir):
    """Time-windowed event dedup (throttle): keep an event only if the
    previous event of the same (user, type) is more than 5 minutes
    older — the batch twin of ``stream_dedup_within_watermark`` and the
    standard duplicate-burst suppressor for at-least-once event
    streams. One lag window keyed on (user_id, event_type): a single
    shuffle, no self-join.

    SEMANTICS (deliberate): the gate compares against the previous RAW
    event, not the last KEPT one — a steady sub-5-minute stream is
    suppressed INDEFINITELY after its first event (every event sees a
    recent predecessor). That is the right shape for "collapse retry
    bursts"; for rate-limiting semantics (emit at most one event per 5
    minutes while activity continues) see
    :func:`dedup_events_throttle_lastkept`, which gates on the last
    kept event and is inherently a stateful scan."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    return (
        e.withColumn("gap_us", gap)
        .filter(F.col("gap_us").isNull() | (F.col("gap_us") > 300_000_000))
        .select("user_id", "event_type", "event_id")
    )


@query(
    "dedup_events_throttle_lastkept",
    oracle="""
    WITH RECURSIVE ev AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS tus,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), walk AS (
      SELECT user_id, event_type, event_id, tus, rn,
             tus AS last_kept, TRUE AS kept
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.event_type, e.event_id, e.tus, e.rn,
             CASE WHEN e.tus - w.last_kept > 300000000
                  THEN e.tus ELSE w.last_kept END,
             e.tus - w.last_kept > 300000000
      FROM ev e JOIN walk w
        ON e.user_id = w.user_id AND e.event_type = w.event_type
       AND e.rn = w.rn + 1
    )
    SELECT user_id, event_type, event_id FROM walk WHERE kept
    """,
)
def dedup_events_throttle_lastkept(spark, sf_dir):
    """Rate-limit throttle gating on the last KEPT event: emit an
    event iff it is >5 minutes after the previously EMITTED event of
    its (user, type) — at most ~one event per window while activity
    continues, the conventional rate-limiter semantics (contrast
    :func:`dedup_events_throttle`, which gates on the raw predecessor
    and suppresses steady streams indefinitely).

    The kept-set is a GREEDY sequential scan — each decision depends
    on the previous decision, so no finite window/lag composition
    expresses it. This is the documented Pandas-UDF escape hatch
    (SURVEY §2B "UDF escape hatch"): ``applyInPandas`` per (user,
    type) group, Arrow-batched, linear in group size; groups are
    bounded (one user-type's events), so no skew pathology. The
    streaming twin (`streaming/stateful.py::throttled_events`) holds
    the same one-long state per key. Oracle: recursive CTE walking
    rn+1 per group — engine-exact, integer-microsecond arithmetic."""
    import pandas as pd

    e = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("tus")
    )

    def _walk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values(["tus", "event_id"])
        tus_arr = pdf["tus"].to_numpy()
        # Linear boolean mask, not .isin(kept): isin re-scans the kept
        # list per row (O(n*k) per group; measured as most of this
        # entry's 18 s at sf0.1).
        mask = np.zeros(len(tus_arr), dtype=bool)
        last = None
        for i, tus in enumerate(tus_arr):
            if last is None or tus - last > 300_000_000:
                mask[i] = True
                last = tus
        out = pdf[mask]
        return out[["user_id", "event_type", "event_id"]]

    return e.groupBy("user_id", "event_type").applyInPandas(
        _walk, schema="user_id long, event_type string, event_id long"
    )


@query(
    "window_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), rn AS (
      SELECT user_id, d,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn
      FROM days
    ), isl AS (
      SELECT user_id, d - CAST(rn AS INT) AS anchor, COUNT(*) AS len
      FROM rn GROUP BY user_id, d - CAST(rn AS INT)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS max_streak,
           CAST(SUM(len) AS BIGINT) AS active_days
    FROM isl GROUP BY user_id
    """,
)
def window_gaps_islands(spark, sf_dir):
    """Gaps-and-islands: consecutive-active-day streaks per user via
    the rn-difference trick (a run of consecutive days maps to one
    shared anchor ``day - row_number``), then two hash aggs. The whole
    chain — distinct, window, both aggs — keys on user_id, so one
    shuffle's partitioning serves every stage. The canonical
    sessionize-without-timestamps pattern (billing periods, streak
    badges, SLA windows)."""
    e = t(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    isl = (
        days.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id", F.date_sub(F.col("d"), F.col("rn")).alias("anchor"))
        .agg(F.count("*").alias("len"))
    )
    return isl.groupBy("user_id").agg(
        F.count("*").alias("n_streaks"),
        F.max("len").alias("max_streak"),
        F.sum("len").alias("active_days"),
    )


@query(
    "ts_retention_cohorts",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id,
             date_trunc('week', CAST(ts AS DATE)) AS wk
      FROM events
    ), cohort AS (
      SELECT user_id, MIN(wk) AS wk0 FROM activity GROUP BY user_id
    )
    SELECT strftime(c.wk0, '%Y-%m-%d') AS cohort_week,
           CAST(FLOOR(datediff('day', c.wk0, a.wk) / 7.0) AS INT)
             AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def ts_retention_cohorts(spark, sf_dir):
    """Weekly retention cohorts: each user joins the cohort of their
    first active ISO week; cell (cohort_week, offset) counts users
    still active offset weeks later — the standard retention triangle.
    activity/cohort/join/agg all key on user_id or the tiny
    (cohort, offset) space; offsets are exact multiples of 7 days so
    the division is exact integer-valued arithmetic on both engines.
    Monday-start date_trunc('week') agrees between Spark and DuckDB."""
    e = t(spark, sf_dir, "events")
    activity = e.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("wk")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("wk").alias("wk0"))
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            F.date_format("wk0", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff("wk", "wk0") / 7.0).cast("int").alias("week_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


@query(
    "ts_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    )
    SELECT prev AS from_type, event_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    """,
)
def ts_event_transitions(spark, sf_dir):
    """First-order event-transition counts (the Markov matrix of user
    behavior): lag the per-user ordered event stream, count (from, to)
    pairs. One window shuffle on user_id, then a hash agg into the
    |types|² matrix — the input to next-action models and funnel
    anomaly detection."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    )
    return (
        seq.filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "ts_inter_event_gap_stats",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             CAST(epoch_us(ts) - epoch_us(
               LAG(ts) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id)) AS DOUBLE) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           FLOOR(quantile_cont(gap_us, 0.5) / 1e6 * 1e3 + 0.5) / 1e3
             AS p50_sec,
           FLOOR(quantile_cont(gap_us, 0.9) / 1e6 * 1e3 + 0.5) / 1e3
             AS p90_sec,
           FLOOR(quantile_cont(gap_us, 0.99) / 1e6 * 1e3 + 0.5) / 1e3
             AS p99_sec
    FROM gaps WHERE gap_us IS NOT NULL GROUP BY event_type
    """,
)
def ts_inter_event_gap_stats(spark, sf_dir):
    """Inter-arrival-time quantiles per event type (p50/p90/p99 of the
    gap between consecutive same-user same-type events) — the arrival-
    process profile behind rate limiting and session-gap tuning. Gaps
    are exact integer microseconds; Spark's percentile() and DuckDB's
    quantile_cont interpolate identically on them (the
    doc_length_pctl_filter precedent)."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
        .cast("double")
        .alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    r3 = lambda c: F.floor(c / 1e6 * 1e3 + F.lit(0.5)) / 1e3  # noqa: E731
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        r3(F.expr("percentile(gap_us, 0.5)")).alias("p50_sec"),
        r3(F.expr("percentile(gap_us, 0.9)")).alias("p90_sec"),
        r3(F.expr("percentile(gap_us, 0.99)")).alias("p99_sec"),
    )


@query(
    "anomaly_mad_events",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             ABS(e.value - m.med) AS adev
      FROM events e JOIN med m ON e.event_type = m.event_type
    ), mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, ROUND(d.value, 4) AS value,
           FLOOR((d.med + 3 * 1.4826 * m2.mad) * 1e4 + 0.5) / 1e4
             AS hi_fence
    FROM dev d JOIN mad m2 ON d.event_type = m2.event_type
    WHERE d.value > d.med + 3 * 1.4826 * m2.mad
       OR d.value < d.med - 3 * 1.4826 * m2.mad
    """,
)
def anomaly_mad_events(spark, sf_dir):
    """Median-absolute-deviation outliers per event type (median ±
    3·1.4826·MAD) — the third robustness tier next to z-score (moment-
    based) and IQR (quartile-based): MAD's 50% breakdown point
    survives even half the data being garbage. Two percentile passes
    (median, then median of absolute deviations) with the per-type
    fences broadcast back over the scan; exact interpolated
    percentiles match quantile_cont cross-engine."""
    e = t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    fence = 3 * 1.4826 * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(
            (F.col("value") > F.col("med") + fence)
            | (F.col("value") < F.col("med") - fence)
        )
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            (F.floor((F.col("med") + fence) * 1e4 + F.lit(0.5)) / 1e4).alias(
                "hi_fence"
            ),
        )
    )


@query(
    "ts_resample_linear_interp",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*) * 1e4 + 0.5) / 1e4 AS v
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ), grid AS (
      SELECT span.user_id,
             unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM span
    ), joined AS (
      SELECT grid.user_id, grid.day, daily.v
      FROM grid LEFT JOIN daily USING (user_id, day)
    ), bounded AS (
      SELECT user_id, day, v,
        last_value(v IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        first_value(v IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM joined
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           (v IS NOT NULL) AS observed,
           FLOOR((CASE
             WHEN v IS NOT NULL THEN v
             ELSE pv + (nv - pv) * (day - pd) * 1.0 / (nd - pd)
           END) * 1e4 + 0.5) / 1e4 AS value_interp
    FROM bounded
    """,
)
def ts_resample_linear_interp(spark, sf_dir):
    """Daily resample with LINEAR interpolation: densify each user's
    series to a full calendar grid, then fill missing days on the
    straight line between the surrounding observations (the step up
    from LOCF, ``window_locf_fill``) — the standard irregular→regular
    conditioning pass before any fixed-step sequence model.

    Scale shape: grid generation is ``sequence()``+``explode`` per
    user (no global calendar dim, no crossJoin); the prev/next anchors
    are two ignore-nulls running windows over the SAME user-partitioned
    sort, so the whole fill costs one shuffle on user_id. Interior
    days always have both anchors (the grid is bounded by each user's
    first/last observation), so no edge NULLs survive.

    Cross-engine determinism: the daily mean accumulates in
    DECIMAL(18,4) on both sides; the interpolation itself is a single
    IEEE multiply-divide chain on identical inputs, bit-identical
    across engines."""
    e = t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "value"
    )
    # The daily mean divides a DECIMAL sum by a count: decimal
    # division scale/rounding rules differ across engines (caught by
    # the sf0.1 sweep on an observed row), so cast the exact sum to
    # double FIRST and floor-round the identical IEEE quotient.
    daily = e.groupBy("user_id", "day").agg(
        (
            F.floor(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
                / F.count("*")
                * F.lit(1e4)
                + F.lit(0.5)
            )
            / F.lit(1e4)
        ).alias("v")
    )
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    j = grid.join(daily, ["user_id", "day"], "left")
    asc = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    desc = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    vday = F.when(F.col("v").isNotNull(), F.col("day"))
    b = j.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(asc).alias("pv"),
        F.last(vday, ignorenulls=True).over(asc).alias("pd"),
        F.first("v", ignorenulls=True).over(desc).alias("nv"),
        F.first(vday, ignorenulls=True).over(desc).alias("nd"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * F.datediff(
        F.col("day"), F.col("pd")
    ) / F.datediff(F.col("nd"), F.col("pd"))
    # Floor-rounding convention (anomaly_mad_events precedent): the
    # interpolated value lands EXACTLY on .xxxx5 whenever the gap
    # divides the 4-dp delta evenly (a 2-day gap ties every time), and
    # ROUND's tie rule differs across engines; floor(x·1e4 + 0.5) is
    # the same IEEE op chain on both sides.
    val = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp)
    return b.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("v").isNotNull().alias("observed"),
        (F.floor(val * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).alias(
            "value_interp"
        ),
    )


EWMA_LOOKBACK = 32  # a=1/2 EWMA: 0.5^32 ≈ 2e-10 — earlier terms are noise


@query(
    "ts_ewma_smoothing",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rfrom_end
      FROM events
    ), kept AS (
      SELECT user_id, value, rfrom_end,
             COUNT(*) OVER (PARTITION BY user_id) AS m
      FROM ordered WHERE rfrom_end <= {EWMA_LOOKBACK}
    ), terms AS (
      SELECT user_id, m,
        CAST(FLOOR(value * (CASE WHEN rfrom_end = m
                 THEN 1.0 / CAST(1::BIGINT << (m - 1) AS DOUBLE)
                 ELSE 1.0 / CAST(1::BIGINT << rfrom_end AS DOUBLE) END)
                 * 1e12 + 0.5)
             AS DECIMAL(38,0)) AS term
      FROM kept
    )
    SELECT user_id, CAST(MAX(m) AS BIGINT) AS n_terms,
           FLOOR(CAST(SUM(term) AS DOUBLE) / 1e12 * 1e6 + 0.5) / 1e6 AS ewma
    FROM terms GROUP BY user_id
    """,
)
def ts_ewma_smoothing(spark, sf_dir):
    """Per-user exponentially-weighted moving average (α=1/2) of event
    values — the classic smoother behind rate limiting, trend
    detection, and metric dashboards. Recursive form
    ``s_i = α·x_i + (1-α)·s_{i-1}`` is re-expressed CLOSED-FORM as a
    weighted sum (weight ``0.5^k`` for the k-th most recent event,
    ``0.5^(m-1)`` for the oldest kept), so the whole thing is one hash
    aggregation — no sequential fold, no UDF, no per-user iteration.
    The lookback truncates at 32 events: with α=1/2 the
    dropped tail weighs < 2⁻³². 

    Cross-engine determinism: α=1/2 makes every weight an exact dyadic
    (computed as ``1 / (1 << k)`` — no ``pow()``, whose last-ulp
    behavior differs between libm and the JVM); each term is
    floor-quantized to integer PICO-units (floor(x·1e12 + 0.5) — the
    repo's floor convention; ROUND on doubles diverges on
    shortest-repr ties) and the sum accumulates exactly in
    DECIMAL(38,0). term·1e12 < 2.8e14 ≪ 2⁵³, so every step is
    IEEE-identical across engines."""
    e = t(spark, sf_dir, "events")
    wdesc = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    kept = (
        e.select("user_id", "value", F.row_number().over(wdesc).alias("rfrom_end"))
        .filter(F.col("rfrom_end") <= EWMA_LOOKBACK)
        .withColumn("m", F.count("*").over(W.partitionBy("user_id")))
    )
    kept = kept.withColumn(
        "k",
        F.when(F.col("rfrom_end") == F.col("m"), F.col("m") - 1).otherwise(
            F.col("rfrom_end")
        ),
    )
    weight = F.expr("1.0 / cast(shiftleft(cast(1 as bigint), k) as double)")
    term = F.floor(F.col("value") * weight * F.lit(1e12) + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    return (
        kept.select("user_id", "m", term.alias("term"))
        .groupBy("user_id")
        .agg(
            F.max("m").cast("long").alias("n_terms"),
            (
                F.floor(
                    F.sum("term").cast("double")
                    / F.lit(1e12)
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("ewma"),
        )
    )


@query(
    "ts_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS v
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, day, v,
             ROW_NUMBER() OVER w AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(v) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS c,
             SUM(v) OVER (PARTITION BY event_type) AS total
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), scored AS (
      SELECT event_type, day,
             ABS(CAST(n * c - i * total AS DOUBLE)) AS dev,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY ABS(CAST(n * c - i * total AS DOUBLE)) DESC, day)
               AS rk
      FROM cum
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS change_day,
           ROUND(dev, 2) AS max_abs_dev
    FROM scored WHERE rk = 1
    """,
)
def ts_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point detection per event type: the day where the
    cumulative daily total deviates most from the constant-rate line —
    argmax |n·C_i − i·T| (the CUSUM statistic cross-multiplied so
    everything left of the final ABS is exact integer×DECIMAL
    arithmetic; the naive form C_i − i·(T/n) would put an
    order-sensitive double inside the running scan). Level shifts in
    event volume — deploy regressions, traffic breaks, data-feed
    outages — land exactly at the argmax.

    One daily aggregation + three windows over the same
    event_type-partitioned sort; linear, single shuffle, no O(n²)
    split-scan."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round("value", 2).cast("decimal(18,2)")).alias("v"))
    wt = W.partitionBy("event_type")
    word = wt.orderBy("day")
    cum = daily.select(
        "event_type",
        "day",
        F.row_number().over(word).alias("i"),
        F.count("*").over(wt).alias("n"),
        F.sum("v")
        .over(word.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("c"),
        F.sum("v").over(wt).alias("total"),
    )
    dev = F.abs(
        (F.col("n") * F.col("c") - F.col("i") * F.col("total")).cast("double")
    )
    rk = F.row_number().over(wt.orderBy(F.desc("dev"), "day"))
    return (
        cum.withColumn("dev", dev)
        .withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("change_day"),
            F.round("dev", 2).alias("max_abs_dev"),
        )
    )


@query(
    "window_longest_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), grouped AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                        AS INT) AS grp
      FROM days
    ), streaks AS (
      SELECT user_id, COUNT(*) AS len, MIN(day) AS streak_start
      FROM grouped GROUP BY user_id, grp
    )
    SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak,
           strftime(MIN(streak_start) FILTER (
             WHERE len = (SELECT MAX(s2.len) FROM streaks s2
                          WHERE s2.user_id = streaks.user_id)), '%Y-%m-%d')
             AS streak_start
    FROM streaks GROUP BY user_id
    """,
)
def window_longest_streak(spark, sf_dir):
    """Longest run of CONSECUTIVE active days per user (and when it
    began) — the engagement-streak metric. Classic gaps-and-islands:
    day − row_number collapses each consecutive run to a constant
    group key, so the whole computation is two hash aggregations and
    one window over the same user-partitioned sort; earliest streak
    wins ties."""
    e = t(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    grp = F.date_sub(
        F.col("day"),
        F.row_number().over(W.partitionBy("user_id").orderBy("day")),
    )
    streaks = (
        days.withColumn("grp", grp)
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("len"), F.min("day").alias("streak_start"))
    )
    best = F.max("len").over(W.partitionBy("user_id"))
    return (
        streaks.withColumn("best", best)
        .filter(F.col("len") == F.col("best"))
        .groupBy("user_id")
        .agg(
            F.max("len").cast("long").alias("longest_streak"),
            F.date_format(F.min("streak_start"), "yyyy-MM-dd").alias(
                "streak_start"
            ),
        )
    )


@query(
    "ts_event_sequence_pattern",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_type,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3,
             LEAD(ts, 2) OVER w AS ts3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_patterns,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_match_start
    FROM seq
    WHERE event_type = 'view' AND e2 = 'click' AND e3 = 'purchase'
      AND epoch_us(ts3) - epoch_us(ts) <= 86400000000
    GROUP BY user_id
    """,
)
def ts_event_sequence_pattern(spark, sf_dir):
    """Sequence-pattern matching (the MATCH_RECOGNIZE / CEP shape):
    count, per user, the strictly CONSECUTIVE view→click→purchase
    triples completing within 24 hours — no other event may interleave
    (that's what distinguishes pattern matching from the funnel ops,
    which only need ordered existence). Expressed as a lead-chain over
    the per-user timeline: one window, three comparisons, no joins —
    the pattern automaton flattened into the frame. At 100 TB this is
    one shuffle on user_id; an n-step pattern costs n-1 leads over the
    SAME sort, not n scans."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
        F.lead("ts", 2).over(w).alias("ts3"),
    )
    hit = (
        (F.col("event_type") == "view")
        & (F.col("e2") == "click")
        & (F.col("e3") == "purchase")
        & (F.unix_micros("ts3") - F.unix_micros("ts") <= 86_400_000_000)
    )
    return (
        seq.filter(hit)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_patterns"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "first_match_start"
            ),
        )
    )


@query(
    "ts_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1
    ), trended AS (
      SELECT day, v,
             CAST(dayofweek(day) + 1 AS INT) AS dow,  -- Spark: 1=Sunday
             CASE WHEN COUNT(*) OVER w = 7 THEN
               FLOOR(CAST(SUM(CAST(ROUND(v, 2) AS DECIMAL(18,2))) OVER w
                     AS DOUBLE) / 7 * 1e4 + 0.5) / 1e4
             END AS trend
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), detrended AS (
      SELECT *, FLOOR((v - trend) * 1e4 + 0.5) / 1e4 AS detr
      FROM trended WHERE trend IS NOT NULL
    ), seasonal AS (
      SELECT dow,
             FLOOR(CAST(SUM(CAST(detr AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*) * 1e4 + 0.5) / 1e4 AS s
      FROM detrended GROUP BY dow
    )
    SELECT d.day AS day_str, d.dow, ROUND(d.v, 2) AS observed,
           d.trend, se.s AS seasonal,
           FLOOR((d.detr - se.s) * 1e4 + 0.5) / 1e4 AS residual
    FROM detrended d JOIN seasonal se USING (dow)
    """,
)
def ts_seasonal_decompose(spark, sf_dir):
    """Classical additive seasonal decomposition of the daily total
    (weekly period): trend = centered 7-day moving average, seasonal =
    per-day-of-week mean of the detrended series, residual = the rest
    — observed ≡ trend + seasonal + residual by construction (pinned
    in pytest). The conditioning step behind anomaly detection on
    seasonal metrics (is Monday low, or is the METRIC low?).

    Scale shape: one daily rollup, one 7-row window, one 7-group
    aggregate, one broadcast join back — each stage bounded by days,
    not events. Determinism: every mean divides a DECIMAL-exact sum
    cast to double, floor-rounded (the r4 sweep convention); edge days
    without a full 7-day window are excluded (COUNT(*) OVER = 7), the
    textbook centered-MA boundary rule."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round("value", 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("v")
    )
    w = W.orderBy("day").rowsBetween(-3, 3)

    def fround(x):
        return F.floor(x * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)

    trended = daily.select(
        "day",
        "v",
        F.dayofweek("day").cast("int").alias("dow"),
        F.when(
            F.count("*").over(w) == 7,
            fround(
                F.sum(F.round("v", 2).cast("decimal(18,2)")).over(w)
                .cast("double")
                / 7
            ),
        ).alias("trend"),
    )
    detrended = trended.filter(F.col("trend").isNotNull()).withColumn(
        "detr", fround(F.col("v") - F.col("trend"))
    )
    seasonal = detrended.groupBy("dow").agg(
        fround(
            F.sum(F.col("detr").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("s")
    )
    return (
        detrended.join(F.broadcast(seasonal), "dow")
        .select(
            F.col("day").alias("day_str"),
            "dow",
            F.round("v", 2).alias("observed"),
            "trend",
            F.col("s").alias("seasonal"),
            fround(F.col("detr") - F.col("s")).alias("residual"),
        )
    )


_ACF_MAX_LAG = 7


def _acf_oracle() -> str:
    lags = []
    for k in range(1, _ACF_MAX_LAG + 1):
        lags.append(f"""
    SELECT {k} AS lag,
           FLOOR((sxy{k} - xbar * (s_head{k} + s_tail{k}) + (n - {k}) * xbar * xbar)
                 / (sxx - 2 * xbar * sx + n * xbar * xbar) * 1e4 + 0.5) / 1e4
             AS acf
    FROM m""")
    head = f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS DOUBLE) AS v,
             ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) AS i
      FROM events GROUP BY 1
    ), lagged AS (
      SELECT d.i, d.v{"".join(
        f", LEAD(d.v, {k}) OVER (ORDER BY d.i) AS v{k}" for k in range(1, _ACF_MAX_LAG + 1)
      )}
      FROM daily d
    ), m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(v, 2) AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ROUND(v * v, 4) AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ROUND(v, 2) AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS xbar{"".join(
        f''',
             CAST(SUM(CAST(ROUND(v * v{k}, 4) AS DECIMAL(28,4))) AS DOUBLE)
               AS sxy{k},
             CAST(SUM(CASE WHEN v{k} IS NOT NULL
                  THEN CAST(ROUND(v, 2) AS DECIMAL(18,2)) END) AS DOUBLE)
               AS s_head{k},
             CAST(SUM(CAST(ROUND(v{k}, 2) AS DECIMAL(18,2))) AS DOUBLE)
               AS s_tail{k}''' for k in range(1, _ACF_MAX_LAG + 1)
      )}
      FROM lagged
    )"""
    return head + "\n    UNION ALL".join(lags)


@query("ts_acf_autocorrelation", oracle=_acf_oracle())
def ts_acf_autocorrelation(spark, sf_dir):
    """Autocorrelation function of the daily total at lags 1–7 — the
    diagnostic that detects weekly seasonality (a lag-7 spike) and
    persistence before any forecasting model is chosen; the companion
    readout to ``ts_seasonal_decompose``'s fixed weekly assumption.

    The centered products expand by the moment identity
    Σ(x−x̄)(y−x̄) = Σxy − x̄(Σx_head+Σx_tail) + m·x̄², so every sum is a
    DECIMAL-exact aggregate of per-row 2–4-dp-rounded terms and the
    closing algebra is one identical IEEE chain per lag — no
    order-dependent centered accumulation. One daily rollup + one
    7-lead window + one aggregation; output is 7 rows regardless of
    history length."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.round("value", 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("v")
        )
    )
    w = W.orderBy("day")
    lagged = daily.select(
        "v",
        *[
            F.lead("v", k).over(w).alias(f"v{k}")
            for k in range(1, _ACF_MAX_LAG + 1)
        ],
    )

    # Parsed-expression aggregates (the r12 similarity.py recipe): one
    # py4j round-trip per column instead of ~10 per dsum Column chain.
    # Same operators after parsing (round → CAST(DECIMAL) → sum →
    # CAST(DOUBLE)), so the decimal-exact sums and the per-lag IEEE
    # closing algebra are bit-identical.
    def dsum_sql(e, prec, scale):
        return (
            f"CAST(sum(CAST(round({e}, {scale}) "
            f"AS DECIMAL({prec},{scale}))) AS DOUBLE)"
        )

    aggs = [
        F.count("*").alias("n"),
        F.expr(dsum_sql("v", 18, 2)).alias("sx"),
        F.expr(dsum_sql("v * v", 28, 4)).alias("sxx"),
    ]
    for k in range(1, _ACF_MAX_LAG + 1):
        aggs += [
            F.expr(dsum_sql(f"v * v{k}", 28, 4)).alias(f"sxy{k}"),
            F.expr(
                f"CAST(sum(CASE WHEN v{k} IS NOT NULL THEN "
                "CAST(round(v, 2) AS DECIMAL(18,2)) END) AS DOUBLE)"
            ).alias(f"s_head{k}"),
            F.expr(dsum_sql(f"v{k}", 18, 2)).alias(f"s_tail{k}"),
        ]
    m = lagged.agg(*aggs).withColumn("xbar", F.col("sx") / F.col("n"))
    rows = None
    for k in range(1, _ACF_MAX_LAG + 1):
        r = m.select(
            F.lit(k).alias("lag"),
            F.expr(
                f"floor((sxy{k} - xbar * (s_head{k} + s_tail{k}) "
                f"+ (n - {k}) * xbar * xbar) "
                f"/ (sxx - 2 * xbar * sx + n * xbar * xbar) "
                "* 1e4 + 0.5D) / 1e4"
            ).alias("acf"),
        )
        rows = r if rows is None else rows.unionAll(r)
    return rows


_FC_HORIZON = 7


@query(
    "ts_seasonal_naive_forecast",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS DOUBLE) AS v,
             ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE)) AS i
      FROM events GROUP BY 1
    ), anchor AS (
      SELECT MAX(day) AS last_day, MAX(i) AS n FROM daily
    ), drift AS (
      SELECT FLOOR((lastv - firstv) / (n - 1) * 1e4 + 0.5) / 1e4 AS d
      FROM (SELECT
              (SELECT v FROM daily WHERE i = (SELECT n FROM anchor)) AS lastv,
              (SELECT v FROM daily WHERE i = 1) AS firstv,
              (SELECT n FROM anchor) AS n)
    ), horizon AS (
      SELECT CAST(h.k AS INT) AS k,
             (SELECT last_day FROM anchor) + CAST(h.k AS INT) AS day
      FROM unnest(range(1, {_FC_HORIZON} + 1)) AS h(k)
    )
    SELECT h.k AS horizon_day,
           strftime(h.day, '%Y-%m-%d') AS forecast_date,
           FLOOR((s.v + h.k * (SELECT d FROM drift)) * 1e4 + 0.5) / 1e4
             AS forecast
    FROM horizon h
    JOIN daily s
      ON s.day = (SELECT last_day FROM anchor) + CAST(h.k AS INT) - 7
    """,
)
def ts_seasonal_naive_forecast(spark, sf_dir):
    """Seasonal-naive-with-drift forecast for the next 7 days: predict
    day t+k as the value one week before (same weekday — the seasonal
    naive that every forecasting benchmark uses as its floor) plus
    k·drift, where drift is the series' average daily change
    ((last−first)/(n−1)). A real forecast operator with zero fitted
    parameters — the baseline any learned model must beat, and the
    placeholder a pipeline ships while the real model trains.

    Scale shape: the anchor (last day, n) and drift are broadcast
    1-row aggregates; the seasonal lookup is a 7-row join against the
    daily table. Determinism: daily totals are DECIMAL-exact; drift
    and forecasts floor-round through identical IEEE chains."""
    e = t(spark, sf_dir, "events")
    w = W.orderBy("day")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.round("value", 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("v")
        )
        .withColumn("i", F.row_number().over(w))
    )

    def fround(x):
        return F.floor(x * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)

    anchor = daily.agg(
        F.max("day").alias("last_day"), F.max("i").alias("n")
    )
    firstlast = (
        daily.crossJoin(F.broadcast(anchor))
        .agg(
            F.max(F.when(F.col("i") == 1, F.col("v"))).alias("firstv"),
            F.max(F.when(F.col("i") == F.col("n"), F.col("v"))).alias("lastv"),
            F.max("n").alias("n"),
            F.max("last_day").alias("last_day"),
        )
        .select(
            "last_day",
            fround(
                (F.col("lastv") - F.col("firstv")) / (F.col("n") - 1)
            ).alias("d"),
        )
    )
    horizon = spark.range(1, _FC_HORIZON + 1).select(
        F.col("id").cast("int").alias("k")
    )
    hz = horizon.crossJoin(F.broadcast(firstlast)).select(
        "k",
        "d",
        F.date_add("last_day", F.col("k")).alias("day"),
        F.date_add("last_day", F.col("k") - 7).alias("season_day"),
    )
    return (
        hz.join(
            daily.select(F.col("day").alias("season_day"), "v"), "season_day"
        )
        .select(
            F.col("k").alias("horizon_day"),
            F.date_format("day", "yyyy-MM-dd").alias("forecast_date"),
            fround(F.col("v") + F.col("k") * F.col("d")).alias("forecast"),
        )
    )
