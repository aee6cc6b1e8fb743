"""Interleaved A/B: q3_top_revenue with an explicit broadcast of the
filtered customer⋈orders side vs the committed planner-chosen build.

The committed plan broadcasts LINEITEM (BuildRight) into the
customer⋈orders side — backwards at any scale: the fact table becomes
the hash relation. Guide §3.1: pick the build side deliberately —
broadcast the side a selective filter made small (BUILDING customers
⋈ orders ≈ n_orders/5 keys), probe the fact table unshuffled.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_q3.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from caliper_poc_data_etl_spark.queries.registry import t
from caliper_poc_data_etl_spark.queries.relational import q3_top_revenue
from caliper_poc_data_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def new_q3(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    co = F.broadcast(
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey).select(
            "o_orderkey", "o_orderdate"
        )
    )
    return (
        li.join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark("ab_q3")
    spark.range(1).count()
    spark.range(1024).repartition(32).foreachPartition(lambda it: None)

    old_rows = sorted(tuple(r) for r in q3_top_revenue(spark, SF_DIR).collect())
    new_rows = sorted(tuple(r) for r in new_q3(spark, SF_DIR).collect())
    assert old_rows == new_rows, f"VALUE MISMATCH {old_rows[:2]} {new_rows[:2]}"
    print(f"value-identical: {len(old_rows)} rows", flush=True)

    variants = {
        "old": lambda: q3_top_revenue(spark, SF_DIR),
        "new": lambda: new_q3(spark, SF_DIR),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for i in range(reps):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn().count()
            dt = round(time.perf_counter() - t0, 3)
            times[name].append(dt)
            print(f"rep {i} {name}: {dt}s", flush=True)
    for name, ts in times.items():
        print(
            f"{name}: median {statistics.median(ts):.3f}s min {min(ts):.3f}s {ts}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
