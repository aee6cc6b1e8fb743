"""Streaming-surface audit — grades the stream_* queries' PLANS, not
just their answers (VERDICT r5 #5; plan_audit.py skips streaming
because an unstarted streaming plan has no executed form).

For every ``stream_*`` entry in ``queries()``, runs the real replay
(readStream → availableNow → sink) and asserts on the recorded
StreamingQueryProgress history (``streaming.events.record_stream_progress``):

- **state operators**: exactly the declared stateful shape — e.g.
  ``dedupeWithinWatermark`` for the watermark dedup,
  ``symmetricHashJoin`` for the stream-stream join,
  ``applyInPandasWithState`` for the custom-state ops, and NO state
  operator for the foreachBatch CDC sinks (their state lives in the
  sink table, not the stream);
- **watermark**: present on event-time-bounded ops, and actually
  ADVANCED past epoch on the multi-batch replays (watermark moves
  between micro-batches; single-batch complete-mode replays
  legitimately finish at the epoch placeholder);
- **no-data-loss**: total ``numInputRows`` across every micro-batch
  equals the staged input row count × the query's declared source
  multiplicity (the union-doubled dedup and two-source join read the
  events table twice) — availableNow drained EVERYTHING it promised.

Usage: python tools/stream_audit.py [name-substring ...]
Exit code = number of flagged queries.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# query -> (expected state operator names, watermark expectation,
#           input multiplicity vs the events table
#           [, extra staged rows per source — flush sentinels])
# watermark expectation: "advanced" (must move past epoch),
# "present" (column exists; epoch ok on a single-batch complete
# replay), None (no event-time watermark in the plan).
EXPECT: dict[str, tuple] = {
    "stream_tumbling_replay": (["stateStoreSave"], "present", 1),
    # Windowed HLL: one stateful windowed agg (64 conditional-max
    # register columns in state), deliberately no chained stateful op.
    "stream_hll_distinct_replay": (["stateStoreSave"], "present", 1),
    # Windowed quantile histogram: one stateful windowed agg (48
    # conditional-sum bucket columns in state); the p50/p90 rank pick
    # is a batch post-pass over the replayed aggregate.
    "stream_quantile_hist_replay": (["stateStoreSave"], "present", 1),
    "stream_sliding_replay": (["stateStoreSave"], "present", 1),
    # Stream-static broadcast enrichment: the static dimension join is
    # stateless (re-read per micro-batch, broadcast); the only state
    # is the windowed agg after it.
    "stream_static_enrich_replay": (["stateStoreSave"], "present", 1),
    "stream_session_replay": (["sessionWindowStateStoreSaveExec"], "present", 1),
    "stream_topk_per_window_replay": (["stateStoreSave"], "present", 1),
    "stream_join_replay": (["symmetricHashJoin"], "advanced", 2),
    # Left-outer stream-stream join over the sentinel-staged source:
    # each of the two sources reads events + the 2-row flush sentinel,
    # so expected input = (base + 2) × 2 (the 4th tuple slot).
    "stream_outer_join_replay": (["symmetricHashJoin"], "advanced", 2, 2),
    "stream_full_outer_join_replay": (["symmetricHashJoin"], "advanced", 2, 2),
    "stream_dedup_within_watermark": (["dedupeWithinWatermark"], "advanced", 2),
    "stream_distinct_users_replay": (["dedupe"], "advanced", 1),
    "stream_stateful_profile_replay": (["applyInPandasWithState"], None, 1),
    "stream_throttle_replay": (["applyInPandasWithState"], None, 1),
    # foreachBatch CDC sinks: state is the sink table, stream is stateless
    "stream_foreachbatch_upsert": ([], None, 1),
    "stream_scd2_replay": ([], None, 1),
}

_EPOCH = "1970-01-01T00:00:00.000Z"

# Spark caps q.recentProgress at spark.sql.streaming.numRecentProgressUpdates
# (default 100) micro-batches; a throttled availableNow replay exceeding
# that would silently undercount the no-data-loss sum (ADVICE r6). The
# audit session raises the retention far above any replay's batch count
# and audit_one flags any replay that still hits the cap.
_PROGRESS_RETENTION = 10_000


def _norm(v):
    return json.loads(v) if isinstance(v, str) else (v or {})


def audit_one(
    name: str, replays: dict[str, list[dict]], base_rows: int
) -> list[str]:
    """Grade one query's recorded replays. Audits per recorded replay
    name (ADVICE r6): every current stream_* query performs exactly ONE
    internal replay (source multiplicity is a union INSIDE that replay),
    so a second recorded replay means the query's shape changed and the
    EXPECT entry needs a revisit — flag it rather than silently summing
    across replays against a single multiplicity."""
    notes: list[str] = []
    exp = EXPECT[name]
    # Optional 4th slot: extra staged rows PER SOURCE beyond the events
    # table (the watermark-flush sentinel file).
    exp_ops, exp_wm, mult = exp[0], exp[1], exp[2]
    extra = exp[3] if len(exp) > 3 else 0
    if not replays:
        return ["no progress recorded (replay did not run?)"]
    if len(replays) != 1:
        notes.append(
            f"{len(replays)} replays recorded, expected 1 "
            f"({sorted(replays)}) — declare the new shape in EXPECT"
        )
    # Latest replay (insertion order follows replay start order).
    progs = list(replays.values())[-1]
    if not progs:
        return notes + ["latest replay recorded no progress"]
    last = progs[-1]
    ops = [
        _norm(s).get("operatorName")
        for s in (last.get("stateOperators") or [])
    ]
    if ops != exp_ops:
        notes.append(f"state operators {ops} != expected {exp_ops}")
    wm = _norm(last.get("eventTime")).get("watermark")
    if exp_wm == "advanced" and (wm is None or wm == _EPOCH):
        notes.append(f"watermark did not advance (last={wm})")
    elif exp_wm == "present" and wm is None:
        notes.append("watermark absent from a watermarked plan")
    elif exp_wm is None and wm not in (None, _EPOCH):
        notes.append(f"unexpected watermark {wm}")
    n_in = sum(int(p.get("numInputRows", 0)) for p in progs)
    if n_in != (base_rows + extra) * mult:
        notes.append(
            f"input rows {n_in} != staged ({base_rows}+{extra}) x {mult} "
            "(availableNow did not drain everything)"
        )
    if len(progs) >= _PROGRESS_RETENTION:
        notes.append(
            f"{len(progs)} batches hits the progress-retention cap "
            f"({_PROGRESS_RETENTION}) — input-row sum may undercount; "
            "raise numRecentProgressUpdates further"
        )
    return notes


def main() -> int:
    filters = sys.argv[1:]
    import __spark_entry__ as entrymod
    from caliper_poc_data_etl_spark.session import get_spark
    from caliper_poc_data_etl_spark.sources.readers import sf_table
    from caliper_poc_data_etl_spark.streaming import events as sev

    qs = {
        k: v for k, v in entrymod.queries().items() if k.startswith("stream_")
    }
    if filters:
        qs = {k: v for k, v in qs.items() if any(f in k for f in filters)}
    unknown = sorted(set(qs) - set(EXPECT))
    spark = get_spark("stream-audit")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(_PROGRESS_RETENTION),
    )
    base_rows = sf_table(spark, SF_DIR, "events").count()
    bad = 0
    for name, fn in sorted(qs.items()):
        if name in unknown:
            print(f"{name}: !! no EXPECT entry — declare its stateful shape")
            bad += 1
            continue
        sev.RECENT_STREAM_PROGRESS.clear()
        try:
            fn(spark, SF_DIR).count()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {exc}")
            bad += 1
            continue
        replays = {k: list(v) for k, v in sev.RECENT_STREAM_PROGRESS.items()}
        notes = audit_one(name, replays, base_rows)
        progs = list(replays.values())[-1] if replays else []
        last = progs[-1] if progs else {}
        ops = [
            _norm(s).get("operatorName")
            for s in (last.get("stateOperators") or [])
        ]
        wm = _norm(last.get("eventTime")).get("watermark")
        n_in = sum(int(p.get("numInputRows", 0)) for p in progs)
        print(
            f"{name}: replays={len(replays)} batches={len(progs)} "
            f"state_ops={ops} watermark={wm} input_rows={n_in}"
        )
        for n in notes:
            print(f"  !! {n}")
        if notes:
            bad += 1
    print(f"\n{bad} streaming queries flagged")
    return bad


if __name__ == "__main__":
    raise SystemExit(main())
