"""Regression tests for the ADVICE r6 findings (all low severity):

1. streaming/events.py — RECENT_STREAM_PROGRESS grew without bound in
   normal (non-audit) sessions: each replay records under a unique
   'replay_N' key and only stream_audit ever cleared the dict. Now
   record_stream_progress evicts oldest entries beyond
   _MAX_RECORDED_REPLAYS.
2. tools/stream_audit.py — audit_one now audits per recorded replay
   (flags an unexpected replay count instead of flattening all replays'
   batches against a single multiplicity), and the audit session raises
   numRecentProgressUpdates so the no-data-loss sum covers replays
   longer than Spark's default 100-batch retention (plus an explicit
   flag if a replay still hits the raised cap).
3. bench.py — the volume-proportional shuffle-partition override
   tolerates a non-numeric spark.sql.shuffle.partitions ('auto' on
   AQE-managed distributions) by skipping the override.

All pure-Python — no SparkSession needed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from caliper_poc_data_etl_spark.streaming import events as sev


class _FakeQuery:
    def __init__(self, progress):
        self.recentProgress = progress


class TestProgressDictBounded:
    def test_eviction_cap(self):
        sev.RECENT_STREAM_PROGRESS.clear()
        for i in range(sev._MAX_RECORDED_REPLAYS + 25):
            sev.record_stream_progress(
                f"replay_{i}", _FakeQuery([{"numInputRows": 1}])
            )
        assert len(sev.RECENT_STREAM_PROGRESS) == sev._MAX_RECORDED_REPLAYS
        # Oldest evicted, newest kept (dict preserves insertion order).
        kept = list(sev.RECENT_STREAM_PROGRESS)
        assert kept[0] == "replay_25"
        assert kept[-1] == f"replay_{sev._MAX_RECORDED_REPLAYS + 24}"
        sev.RECENT_STREAM_PROGRESS.clear()

    def test_failed_capture_still_bounded(self):
        sev.RECENT_STREAM_PROGRESS.clear()

        class _Broken:
            @property
            def recentProgress(self):
                raise RuntimeError("gone")

        for i in range(sev._MAX_RECORDED_REPLAYS + 5):
            sev.record_stream_progress(f"replay_{i}", _Broken())
        assert len(sev.RECENT_STREAM_PROGRESS) == sev._MAX_RECORDED_REPLAYS
        assert all(v == [] for v in sev.RECENT_STREAM_PROGRESS.values())
        sev.RECENT_STREAM_PROGRESS.clear()


def _progress(rows: int, ops=None, wm=None):
    p = {"numInputRows": rows, "stateOperators": []}
    if ops:
        p["stateOperators"] = [{"operatorName": o} for o in ops]
    if wm is not None:
        p["eventTime"] = {"watermark": wm}
    return p


class TestAuditPerReplay:
    def _audit(self):
        sys.path.insert(
            0,
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tools",
            ),
        )
        import stream_audit

        return stream_audit

    def test_single_replay_clean(self):
        sa = self._audit()
        replays = {"replay_0": [_progress(100), _progress(0)]}
        notes = sa.audit_one("stream_scd2_replay", replays, 100)
        assert notes == []

    def test_two_replays_flagged(self):
        sa = self._audit()
        # Two recorded replays for a query declared as one replay: the
        # old flattening would sum 100+100 against multiplicity 1 and
        # flag data loss confusingly; now the replay COUNT is the flag.
        replays = {
            "replay_0": [_progress(100)],
            "replay_1": [_progress(100)],
        }
        notes = sa.audit_one("stream_scd2_replay", replays, 100)
        assert any("2 replays recorded" in n for n in notes)
        # And the data-loss check grades the LATEST replay alone (100
        # rows = staged 100 x 1), not the flattened 200.
        assert not any("did not drain" in n for n in notes)

    def test_retention_cap_flagged(self):
        sa = self._audit()
        cap = sa._PROGRESS_RETENTION
        replays = {"replay_0": [_progress(1) for _ in range(cap)]}
        notes = sa.audit_one("stream_scd2_replay", replays, cap)
        assert any("progress-retention cap" in n for n in notes)

    def test_no_replays(self):
        sa = self._audit()
        notes = sa.audit_one("stream_scd2_replay", {}, 100)
        assert notes == ["no progress recorded (replay did not run?)"]

    def test_empty_latest_replay(self):
        sa = self._audit()
        notes = sa.audit_one("stream_scd2_replay", {"replay_0": []}, 100)
        assert any("no progress" in n for n in notes)


class TestBenchShufflePartitionParse:
    def test_non_numeric_conf_skips_override(self):
        # Exercises bench.py's ACTUAL helper (not a re-implementation,
        # ADVICE r7): 'auto' must not raise, numeric confs scale to
        # volume with the 8-partition floor.
        import bench

        assert bench._volume_shuffle_partitions("32", 100_000) == 16
        assert bench._volume_shuffle_partitions("auto", 100_000) is None
        assert bench._volume_shuffle_partitions("32", 1_000_000) == 32
        assert bench._volume_shuffle_partitions("32", 10_000) == 8
