"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs a representative subset of the declared query surface (one per
operator family, heaviest variant) on ``local[$SPARK_GRAFT_CPUS]`` and
prints exactly ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the wall-clock sum over the headline queries (excluding
Spark session startup), which is the driver's headline number. Each
query is materialized with a count-style action (``collect`` on small
outputs) so the full plan executes; nothing is cached between queries
so each timing includes its own scan.

Usage:
    python bench.py                      # sf0.1, local[32]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py
    python bench.py --queries q1,q3      # substring filter
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# One headline per operator family; heaviest representative of each.
HEADLINE = [
    "q1_pricing_summary",        # full-scan hash agg (TPC-H Q1 analog)
    "q3_top_revenue",            # 3-way join + agg + top-k (TPC-H Q3 analog)
    "caliper_group_events",      # flagship: nested structs + ordered collect_list
    "caliper_fanout",            # 1→3 explode fan-out
    "join_broadcast_dims",       # star-schema broadcast joins
    "join_asof",                 # as-of join (window over union)
    "agg_rollup",                # hierarchical rollup
    "window_rank_topk_per_group",  # partitioned window rank
    "window_running_sum",        # running frame
    "sort_topk_global",          # global order + limit
    "dedup_exact_normalized",    # exact dedup w/ normalization
    "dedup_minhash_lsh",         # MinHash LSH near-dup (band join)
    "dedup_ngram_jaccard",       # n-gram Jaccard pair dedup
    "sim_cosine_topk",           # brute-force cosine top-k
    "sim_ann_lsh",               # LSH-bucketed ANN
    "text_quality_score",        # text-analysis pack
    "ts_sliding_window",         # sliding time window agg
    "ts_session_window",         # session windows
]


def _sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


CALIPER_ROWS = 100_000
CALIPER_ATTEMPTS = 500


def _caliper_throughput(spark) -> tuple[float, float]:
    """Reference-comparable number: the item pipeline end-to-end
    (CSV scan → events → grouped → JSON sink) on the same shape as
    BASELINE.md's measured run (100k rows, 500 attempt groups).
    Returns (wall_sec, rows_per_sec)."""
    import tempfile

    from caliper_poc_data_etl_spark.pipelines.items import (
        item_outcome_events,
        items_grouped_by_attempt,
    )
    from caliper_poc_data_etl_spark.schemas import ASSESSMENT_ITEMS_FIDELITY
    from caliper_poc_data_etl_spark.sinks import write_grouped_json
    from caliper_poc_data_etl_spark.sources import read_csv

    workdir = tempfile.mkdtemp(prefix="caliper_bench_")
    csv_path = f"{workdir}/items.csv"
    with open(csv_path, "w") as f:
        f.write(
            "identity_id,login_identity_id,school_id,assessment_id,"
            "assessment_version,attempt_id,assmtitem_id,assmtitem_version,"
            "assessment_type_id,response_type,question_time,score_posible,"
            "score_earned,masterobjectives,masterobjectivesid,objectivenumber\n"
        )
        for i in range(CALIPER_ROWS):
            att = i % CALIPER_ATTEMPTS
            f.write(
                f"stu-{att},login-{att},sch-1,asmt-1,1.0,att-{att},item-{i},1,"
                f"5,TYPE,30,10,{i % 10},obj text,{100 + i % 7},1.1\n"
            )
    t0 = time.perf_counter()
    items = read_csv(spark, csv_path, ASSESSMENT_ITEMS_FIDELITY)
    grouped = items_grouped_by_attempt(item_outcome_events(items))
    write_grouped_json(grouped, f"{workdir}/out", layout="reference")
    wall = time.perf_counter() - t0
    return round(wall, 3), round(CALIPER_ROWS / wall, 1)


def main() -> int:
    only = None
    if "--queries" in sys.argv:
        only = sys.argv[sys.argv.index("--queries") + 1].split(",")

    import __spark_entry__ as entrymod
    from caliper_poc_data_etl_spark.session import get_spark

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]
    if only:
        names = [n for n in names if any(f in n for f in only)]

    spark = get_spark("bench")
    # Warm the JVM + parquet footers once so per-query timings measure
    # the plan, not first-touch session costs.
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]:.2f}s", file=sys.stderr)

    caliper_wall, caliper_rps = _caliper_throughput(spark)
    timings["caliper_items_100k_e2e"] = caliper_wall
    print(
        f"# caliper_items_100k_e2e: {caliper_wall:.2f}s = {caliper_rps} rows/s "
        f"(reference single-core baseline: 154k rows/s, BASELINE.md)",
        file=sys.stderr,
    )
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
                "caliper_items_rows_per_sec": caliper_rps,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
