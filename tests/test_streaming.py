"""Structured Streaming semantics (SURVEY.md §7.1 P5).

Replay equivalence: an availableNow replay over static input must
produce exactly the batch twin's result. Watermark behavior is tested
with a hand-built multi-file input processed one file per micro-batch,
so the watermark genuinely advances between batches.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import Row, functions as F

from caliper_poc_data_etl_spark.queries.timeseries import (
    ts_session_window,
    ts_sliding_window,
    ts_tumbling_window,
)
from caliper_poc_data_etl_spark.streaming import (
    read_event_stream,
    replay_to_df,
    sessionized_values,
    sliding_totals,
    stateful_dedup,
    stream_events_to_json,
    tumbling_counts,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "stream_op, batch_q, mode",
    [
        (tumbling_counts, ts_tumbling_window, "complete"),
        (sliding_totals, ts_sliding_window, "complete"),
        (sessionized_values, ts_session_window, "complete"),
    ],
)
def test_replay_matches_batch_twin(spark, sf_dir, stream_op, batch_q, mode):
    streamed = replay_to_df(stream_op(read_event_stream(spark, sf_dir)), mode=mode)
    batch = batch_q(spark, sf_dir)
    assert streamed.columns == batch.columns
    assert _rows(streamed) == _rows(batch)


def test_stateful_dedup_preserves_distinct_ids(spark, sf_dir):
    out = replay_to_df(stateful_dedup(read_event_stream(spark, sf_dir)), mode="append")
    n_distinct = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id")
        .distinct()
        .count()
    )
    assert out.count() == n_distinct
    assert out.select("event_id").distinct().count() == n_distinct


def _write_event_file(spark, path, rows):
    df = spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=u, event_type=et, value=v, props="{}")
         for (i, ts, u, et, v) in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    """One file per micro-batch so the watermark genuinely advances.

    Spark filters late events with the PREVIOUS batch's watermark
    (eventTimeWatermarkForLateEvents) and evicts/emits with the
    current one, so the late row must arrive two batches after the
    watermark-advancing row to be dropped."""
    base = str(tmp_path / "stream_in")
    # Batch 1: two events in the 10:00 window.
    _write_event_file(spark, f"{base}/f1.parquet",
                      [(1, "2026-01-01 10:10:00", 1, "a", 1.0),
                       (2, "2026-01-01 10:20:00", 1, "a", 1.0)])
    time.sleep(1.1)  # file source orders batches by modification time
    # Batch 2: far-ahead event — watermark will advance to 14:00,
    # finalizing and emitting the 10:00 window (n=2).
    _write_event_file(spark, f"{base}/f2.parquet",
                      [(3, "2026-01-01 15:00:00", 1, "a", 1.0)])
    time.sleep(1.1)
    # Batch 3: further ahead — late-event filter for batch 4 becomes 14:00.
    _write_event_file(spark, f"{base}/f3.parquet",
                      [(4, "2026-01-01 20:00:00", 1, "a", 1.0)])
    time.sleep(1.1)
    # Batch 4: late event for the long-finalized 10:00 window → dropped.
    _write_event_file(spark, f"{base}/f4.parquet",
                      [(5, "2026-01-01 10:30:00", 1, "a", 1.0)])

    schema = spark.read.parquet(f"{base}/f1.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(base)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("ws"), "n")
    )
    name = f"wm_test_{int(time.time())}"
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["ws"]: r["n"] for r in spark.table(name).collect()}
    # 10:00 window emitted with only the on-time events (late row 5
    # dropped); 15:00 emitted once the watermark passed 16:00; the
    # 20:00 window is beyond the final watermark and (correctly) never
    # appears in append mode.
    assert got == {"2026-01-01 10:00": 2, "2026-01-01 15:00": 1}


def test_streaming_attempt_pipeline_matches_batch(spark, tmp_path):
    """The streaming Caliper fan-out over CSV drops produces exactly
    the batch pipeline's events (stateless op, shared builder); a
    second CSV drop is picked up incrementally by the checkpoint."""
    import json

    from caliper_poc_data_etl_spark.streaming import run_attempts_stream

    watch = tmp_path / "drops"
    watch.mkdir()
    header = (
        "identity_id,login_identity_id,school_id,assessment_id,"
        "assessment_version,date_submitted,assessment_type_id,"
        "assessment_type,attempt_id,attemptnumber,is_mastered,"
        "score_earned,score_posible"
    )
    row1 = "stu-1,l,sch-9,asmt-01,1.0,2016-01-15,5,QUIZ,att-100,1,true,70,100"
    (watch / "a.csv").write_text(f"{header}\n{row1}\n")
    target, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    q = run_attempts_stream(spark, str(watch), target, ckpt)
    q.awaitTermination(120)
    got1 = [json.loads(r["value"]) for r in spark.read.json(target).collect()]
    assert len(got1) == 3
    assert {e["type"] for e in got1} == {"AssessmentEvent", "AssessmentOutcomeEvent"}
    graded = next(e for e in got1 if e["type"] == "AssessmentOutcomeEvent")
    # F3 swap preserved through the streaming path too.
    assert graded["values"]["generated"] == {
        "totalScore": "70", "normalScore": "100"
    }

    # Incremental drop: only the new file's rows are appended.
    row2 = "stu-2,l,sch-9,asmt-01,1.0,2016-01-16,5,QUIZ,att-200,2,false,55,100"
    (watch / "b.csv").write_text(f"{header}\n{row2}\n")
    q2 = run_attempts_stream(spark, str(watch), target, ckpt)
    q2.awaitTermination(120)
    out = spark.read.json(target)
    assert out.count() == 6
    assert out.filter("attempt_id = 'att-200'").count() == 3


def test_custom_stateful_operator_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState per-user profiles: replay the stream in
    FOUR micro-batches (4 files × maxFilesPerTrigger=1) so state must
    genuinely fold across batches; the LAST update emitted per user
    must equal the batch aggregation."""
    from caliper_poc_data_etl_spark.streaming.stateful import user_profiles

    src = str(tmp_path / "events4")
    batch_df = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch_df.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    out = replay_to_df(user_profiles(stream), mode="update")
    # Memory sink in update mode appends each emission; keep the last
    # (largest n_events) per user = final state.
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        out.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in final.collect()}
    exp = {r["user_id"]: (r["n_events"], r["total_value"]) for r in batch.collect()}
    assert set(got) == set(exp)
    for uid, (n, total) in exp.items():
        gn, gt = got[uid]
        assert gn == n
        assert gt == pytest.approx(total)


def test_json_sink_exactly_once(spark, sf_dir, tmp_path):
    target = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events = read_event_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    q = stream_events_to_json(events, target, ckpt)
    q.awaitTermination(120)
    n_rows = spark.read.json(target).count()
    assert n_rows == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # Re-running against the same checkpoint must be a no-op (no new
    # input) — the file-commit log guarantees exactly-once.
    q2 = stream_events_to_json(
        read_event_stream(spark, sf_dir).select(
            "event_id", "user_id", "event_type", "value"
        ),
        target,
        ckpt,
    )
    q2.awaitTermination(120)
    assert spark.read.json(target).count() == n_rows


def test_session_window_exact_boundary_convention(spark):
    """Pin Spark session_window's exact-boundary behavior (the
    engine-wide convention every sessionization oracle must match —
    queries/timeseries.py ts_session_window docstring): an event at
    EXACTLY last_ts + 30 min MERGES into the session (touching
    intervals merge — closed boundary); only a gap strictly greater
    than 30 min splits. The sf fixtures contain no exact-boundary
    gaps, so the driver oracle never exercises this edge — this
    fixture does. (Writing this test with the opposite, half-open
    assumption is what exposed the latent `>=` bug in the r2
    session oracles.)"""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [
            ("u1", base, 1.0),
            # exactly +30:00 → touching intervals MERGE
            ("u1", base + dt.timedelta(minutes=30), 1.0),
            # 29:59 after the previous → same session
            ("u1", base + dt.timedelta(minutes=59, seconds=59), 1.0),
            # 30:01 after the previous → gap EXCEEDS 30 min → NEW session
            ("u1", base + dt.timedelta(minutes=90), 1.0),
        ],
        "user_id string, ts timestamp, value double",
    )
    out = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", "HH:mm:ss").alias("start"), "n")
        .collect()
    )
    assert sorted((r.start, r.n) for r in out) == [("00:00:00", 3), ("01:30:00", 1)]


def test_stream_dedup_removes_injected_duplicates(spark, sf_dir):
    """The oracle-graded formulation: two readStreams over the same
    source unioned (every event arrives twice) must collapse back to
    exactly the distinct input under dropDuplicatesWithinWatermark."""
    doubled = read_event_stream(spark, sf_dir).union(read_event_stream(spark, sf_dir))
    out = replay_to_df(stateful_dedup(doubled), mode="append")
    n_distinct = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id")
        .distinct()
        .count()
    )
    assert out.count() == n_distinct


def test_throttle_state_folds_across_batches(spark, tmp_path):
    """Streaming throttle: 3 micro-batches in event-time order (file
    mod-time order = time slices); the state (last raw ts per
    user+type) must carry across batch boundaries — row 4 arrives in a
    LATER batch only 60 s after row 3, so dropping it proves the fold.

    (File-source batches replay in mod-time order; an out-of-order
    split would be a different operator — late-data throttling needs
    watermark reordering, documented out of scope for this machine.)"""
    import time as _time

    from caliper_poc_data_etl_spark.streaming import replay_to_df
    from caliper_poc_data_etl_spark.streaming.stateful import throttled_events

    rows = [
        # (event_id, ts, user, type) — batches sliced at 00:06 / 00:20
        (1, "2024-01-01 00:00:00", 1, "click"),   # b0 keep (first)
        (2, "2024-01-01 00:00:30", 1, "click"),   # b0 drop (30s)
        (3, "2024-01-01 00:05:00", 1, "click"),   # b0 drop (4m30s after 2)
        (4, "2024-01-01 00:06:00", 1, "click"),   # b1 drop (60s after 3 — STATE)
        (5, "2024-01-01 00:15:00", 1, "click"),   # b1 keep (9m after 4)
        (6, "2024-01-01 00:16:00", 2, "view"),    # b1 keep (own key, first)
        (7, "2024-01-01 00:30:00", 1, "click"),   # b2 keep (15m after 5)
        (8, "2024-01-01 00:31:00", 2, "view"),    # b2 drop (15m? no: 15m>5m -> keep)
    ]
    slices = [rows[:3], rows[3:6], rows[6:]]
    src = str(tmp_path / "throttle_src")
    schema = (
        "event_id long, ts_s string, user_id long, event_type string"
    )
    for i, chunk in enumerate(slices):
        df = spark.createDataFrame(chunk, schema).select(
            "event_id",
            F.to_timestamp("ts_s").alias("ts"),
            "user_id",
            "event_type",
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        df.coalesce(1).write.parquet(f"{src}/b{i}")
        _time.sleep(1.1)  # distinct mod-times -> deterministic batch order
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = replay_to_df(throttled_events(stream), mode="append")
    kept = {r["event_id"] for r in out.collect()}
    # 8: 15m after 6 -> kept; expected set mirrors the batch lag rule.
    assert kept == {1, 5, 6, 7, 8}
