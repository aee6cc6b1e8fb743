"""Per-query performance profile for the optimization rounds.

For each headline query (or an explicit list): time the DataFrame
BUILD (driver-side plan construction), the FIRST action, and N warm
actions; capture ``explain('formatted')``; count plan features
(Exchange / Sort / BatchEvalPython / ArrowEvalPython / join strategy
nodes).  Writes one JSON line per query to stdout and the formatted
plan to ``plans/<tag>/<query>_<suffix>.txt`` when ``--plans`` is given.

The timed action matches bench.py (``df.count()``) so numbers are
comparable with the committed BENCH artifacts; pass ``--noop`` to ALSO
time a noop-sink run (guide §1.4) which materializes every column.

Usage:
    python tools/perf_profile.py                       # bench headline set
    python tools/perf_profile.py --queries a,b,c
    python tools/perf_profile.py --plans r12 --suffix before
    SPARK_GRAFT_SF_DIR=... python tools/perf_profile.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PLAN_NODES = (
    "Exchange",
    "Sort ",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Window",
)


def _plan_counts(plan: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for node in PLAN_NODES:
        n = len(re.findall(r"\b" + node.strip() + r"\b", plan))
        if n:
            counts[node.strip()] = n
    return counts


def main() -> int:
    only = None
    if "--queries" in sys.argv:
        only = sys.argv[sys.argv.index("--queries") + 1].split(",")
    plans_tag = None
    if "--plans" in sys.argv:
        plans_tag = sys.argv[sys.argv.index("--plans") + 1]
    suffix = "before"
    if "--suffix" in sys.argv:
        suffix = sys.argv[sys.argv.index("--suffix") + 1]
    trials = int(os.environ.get("SPARK_GRAFT_PROFILE_TRIALS", "3"))
    do_noop = "--noop" in sys.argv

    import bench
    import __spark_entry__ as entrymod
    from caliper_poc_data_etl_spark.session import get_spark

    qs = entrymod.queries()
    names = [n for n in bench.HEADLINE if n in qs]
    if only:
        names = [n for n in names if any(f in n for f in only)]
        # ADVICE r12: an explicitly requested non-headline query must
        # profile too, not silently skip — fall back to registry keys.
        extra = [
            n
            for n in sorted(qs)
            if n not in names and any(f in n for f in only)
        ]
        names += extra

    spark = get_spark("perf_profile")
    spark.range(1).count()
    spark.range(1024).repartition(32).foreachPartition(lambda it: None)

    plan_dir = None
    if plans_tag:
        plan_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            plans_tag,
        )
        os.makedirs(plan_dir, exist_ok=True)

    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        t_plan = time.perf_counter() - t0
        if plan_dir:
            with open(f"{plan_dir}/{name}_{suffix}.txt", "w") as f:
                f.write(plan)

        t0 = time.perf_counter()
        n = df.count()
        t_first = time.perf_counter() - t0

        warm = []
        for _ in range(trials):
            t0 = time.perf_counter()
            df2 = qs[name](spark, SF_DIR)
            df2.count()
            warm.append(round(time.perf_counter() - t0, 3))

        noop_t = None
        if do_noop:
            df3 = qs[name](spark, SF_DIR)
            t0 = time.perf_counter()
            df3.write.format("noop").mode("overwrite").save()
            noop_t = round(time.perf_counter() - t0, 3)

        rec = {
            "query": name,
            "rows": n,
            "build_sec": round(t_build, 3),
            "explain_sec": round(t_plan, 3),
            "first_sec": round(t_first, 3),
            "warm_sec": warm,
            # ADVICE r12: SPARK_GRAFT_PROFILE_TRIALS=0 must not crash
            "warm_min": min(warm) if warm else None,
            "noop_sec": noop_t,
            "plan": _plan_counts(plan),
        }
        print(json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
