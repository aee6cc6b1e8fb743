"""Per-op trigger/latency decomposition of the streaming replay family.

The 17 stream_* ops are graded by oracle/rows but never benched, so
their latency floor has been a claim, not a number (VERDICT r12 #4).
For each op this runs the real replay and decomposes, from the
recorded StreamingQueryProgress history
(``streaming.events.RECENT_STREAM_PROGRESS``):

- wall seconds of the whole builder (readStream → availableNow →
  memory sink → batch DataFrame),
- number of micro-batches (triggers) the availableNow replay used,
- per-batch durationMs components summed across batches
  (addBatch = plan execution, the rest is trigger scheduling:
  latestOffset/getBatch/queryPlanning/walCommit/commitOffsets),
- total input rows.

The gap between wall and Σ addBatch is the fixed per-trigger +
query-start/stop machinery — the part no plan change can remove.

Usage:
    python tools/stream_profile.py [name-substring ...] [--json=PATH]
    SPARK_GRAFT_SF_DIR=... python tools/stream_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DURATION_KEYS = (
    "addBatch",
    "getBatch",
    "latestOffset",
    "queryPlanning",
    "walCommit",
    "commitOffsets",
    "triggerExecution",
)


def main() -> int:
    filters = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = next(
        (a.split("=", 1)[1] for a in sys.argv if a.startswith("--json=")), None
    )

    import __spark_entry__ as entrymod
    from caliper_poc_data_etl_spark.session import get_spark
    from caliper_poc_data_etl_spark.streaming.events import (
        RECENT_STREAM_PROGRESS,
    )

    qs = entrymod.queries()
    names = sorted(n for n in qs if n.startswith("stream_"))
    if filters:
        names = [n for n in names if any(f in n for f in filters)]

    spark = get_spark("stream_profile")
    spark.range(1).count()
    spark.range(1024).repartition(32).foreachPartition(lambda it: None)

    out: dict[str, dict] = {}
    for name in names:
        RECENT_STREAM_PROGRESS.clear()
        spark.sparkContext.setJobDescription(f"stream_profile:{name}")
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        n_rows = df.count()
        wall = round(time.perf_counter() - t0, 3)
        batches = 0
        rows_in = 0
        durations = {k: 0 for k in DURATION_KEYS}
        for prog in RECENT_STREAM_PROGRESS.values():
            batches += len(prog)
            for p in prog:
                rows_in += int(p.get("numInputRows", 0))
                for k, v in (p.get("durationMs") or {}).items():
                    if k in durations:
                        durations[k] += int(v)
        rec = {
            "query": name,
            "wall_sec": wall,
            "result_rows": n_rows,
            "micro_batches": batches,
            "input_rows": rows_in,
            "duration_ms": durations,
            "addbatch_sec": round(durations["addBatch"] / 1000, 3),
            "overhead_sec": round(
                wall - durations["addBatch"] / 1000, 3
            ),
        }
        out[name] = rec
        print(json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)
    if json_out:
        with open(json_out, "w") as fh:
            json.dump({"sf_dir": SF_DIR, "ops": out}, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
