"""Regression tests for the round-5 ADVICE findings (ADVICE.md r5).

Each test fabricates the exact fixture shape the graded testdata never
produces, so the defect would have stayed masked without it:

1. ``ts_theil_sen_slope`` — an event series with an EVEN pair count
   (C(4,2)=6): true division made ``rn == (cnt+1)/2`` match no row and
   silently drop the series; integer ``div`` must emit the lower median.
2. ``ml_regression_metrics`` — a series whose daily totals are all
   equal: total-variance denominator 0 must yield a NULL R², not an
   ANSI division error.
3. ``ml_ab_chi2_outcome`` — enough users (8k > the ~3500 BIGINT
   overflow point) that the long-division term pmod(num, den)·1e6 only
   fits a 128-bit accumulator; verified against an exact big-int
   Python replica.
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from caliper_poc_data_etl_spark.queries import QUERIES


def _write_events(path: str, rows: list[dict]) -> str:
    """Write a minimal events.parquet with the driver schema."""
    tbl = pa.table(
        {
            "event_id": pa.array(
                [r.get("event_id", i) for i, r in enumerate(rows)], pa.int64()
            ),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r.get("user_id", 1) for r in rows], pa.int64()),
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
            "value": pa.array([r.get("value", 1.0) for r in rows], pa.float64()),
            "props": pa.array([r.get("props", "{}") for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(path, "events.parquet"))
    return path


class TestTheilSenEvenPairCount:
    def test_even_pair_count_emits_lower_median(self, spark, tmp_path):
        # 4 distinct days -> C(4,2) = 6 pairs (EVEN). Values chosen so
        # slopes are all distinct: y = 0, 100, 300, 600 (in cents) on
        # days 0, 1, 2, 3.
        base = datetime.datetime(2024, 1, 1)
        rows = [
            {"ts": base + datetime.timedelta(days=d), "event_type": "view",
             "value": v}
            for d, v in [(0, 0.0), (1, 1.0), (2, 3.0), (3, 6.0)]
        ]
        d = _write_events(str(tmp_path), rows)
        out = QUERIES["ts_theil_sen_slope"].spark(spark, d).collect()
        assert len(out) == 1, "even pair count must not drop the series"
        r = out[0]
        # pairs (dy cents, dx): slopes 100,150,200,200,250,300 — sorted by
        # (slope, dy, dx): [(100,1),(300,2),(200,1),(600,3),(500,2),(300,1)]
        # ((200,1) precedes (600,3) at slope 200 on the dy tie-break);
        # lower median = rank (6+1) div 2 = 3 -> (200,1).
        pairs = []
        ys = {0: 0, 1: 100, 2: 300, 3: 600}
        for d1 in ys:
            for d2 in ys:
                if d2 > d1:
                    pairs.append((ys[d2] - ys[d1], d2 - d1))
        pairs.sort(key=lambda p: (p[0] / p[1], p[0], p[1]))
        dy, dx = pairs[(len(pairs) + 1) // 2 - 1]
        assert (r["n_pairs"], r["med_dy"], r["med_dx"]) == (6, dy, dx)
        assert r["slope_micro"] == math.floor(1000000.0 * dy / dx)


class TestRegressionMetricsZeroVariance:
    def test_constant_series_emits_null_r2(self, spark, tmp_path):
        # 21 days of a constant daily total -> 14 (day, day-7) pairs,
        # sy*sy == n*syy -> ss_tot_n = 0 -> r2_milli must be NULL.
        base = datetime.datetime(2024, 1, 1)
        rows = [
            {"ts": base + datetime.timedelta(days=d), "event_type": "flat",
             "value": 5.0}
            for d in range(21)
        ]
        d = _write_events(str(tmp_path), rows)
        out = QUERIES["ml_regression_metrics"].spark(spark, d).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n"] == 14
        assert r["ss_tot_n"] == 0
        assert r["abs_err_sum"] == 0 and r["sq_err_sum"] == 0
        assert r["r2_milli"] is None, "zero variance must yield NULL, not error"


def _variant(uid: int) -> str:
    h = hashlib.md5(str(uid).encode()).hexdigest()[:10]
    return "A" if int(h, 16) % 100 < 50 else "B"


class TestChi2BigintOverflow:
    def test_8k_users_exact_vs_bigint_replica(self, spark, tmp_path):
        # 8000 users (> the ~3500-user BIGINT overflow point for
        # num = T*(ad-bc)^2). Purchase counts 1..3 keyed off uid so the
        # two variants convert at deliberately different rates.
        base = datetime.datetime(2024, 1, 1)
        rows = []
        n_users = 8000
        purch = {}
        for uid in range(n_users):
            # variant A skews to more purchases -> a real effect
            np_ = 1 + (uid % 3) + (2 if _variant(uid) == "A" and uid % 2 == 0 else 0)
            purch[uid] = np_
            for k in range(np_):
                rows.append(
                    {"ts": base + datetime.timedelta(minutes=uid * 10 + k),
                     "user_id": uid, "event_type": "purchase", "value": 1.0}
                )
        d = _write_events(str(tmp_path), rows)
        [r] = QUERIES["ml_ab_chi2_outcome"].spark(spark, d).collect()

        import statistics

        med = statistics.median(purch.values())
        a = b = c = dd = 0
        for uid in range(n_users):
            conv = purch[uid] > med
            if _variant(uid) == "A":
                a, b = a + conv, b + (not conv)
            else:
                c, dd = c + conv, dd + (not conv)
        num = (a + b + c + dd) * (a * dd - b * c) ** 2
        den = (a + b) * (c + dd) * (a + c) * (b + dd)
        # the term the pre-fix BIGINT pipeline computed as
        # pmod(num, den) * 1e6 must actually exceed int64 here
        assert (num % den) * 1_000_000 > 2**63, "fixture must exceed BIGINT"
        expect = (num // den) * 1000000 + ((num % den) * 1000000) // den
        assert (r["conv_a"], r["nonconv_a"], r["conv_b"], r["nonconv_b"]) == (
            a, b, c, dd,
        )
        assert r["chi2_micro"] == expect
        assert r["significant"] == (expect > 3841459)
