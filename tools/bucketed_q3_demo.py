"""Bucketed-layout demonstration on the TPC-H Q3 shape at scale.

The K=100 soak's only linear-cost query is q3 (a 60M-row 3-way shuffle
join is O(n)). This demo shows what the 100 TB deployment does about
it: pay the shuffle ONCE at write time (bucketBy on the order key),
then every subsequent join on that key consumes buckets with no
Exchange. It tiles sf0.1 K× (scale_smoke's tiler), then measures:

1. plain q3 (shuffle join) wall-time + shuffle-Exchange count;
2. one-time bucketing cost for orders+lineitem;
3. q3 on the bucketed tables (join-only, layout already paid)
   wall-time + shuffle-Exchange count.

Usage:
    SPARK_GRAFT_SCALE_K=100 python tools/bucketed_q3_demo.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = int(os.environ.get("SPARK_GRAFT_SCALE_K", "100"))
BUCKETS = int(os.environ.get("SPARK_GRAFT_Q3_BUCKETS", "32"))


def _n_shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        plan.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )


def _q3(c, o, li):
    return (
        li.join(o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
                li.l_orderkey == o.o_orderkey)
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
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def main() -> int:
    from caliper_poc_data_etl_spark.session import get_spark
    from caliper_poc_data_etl_spark.sinks import write_bucketed
    from tools.scale_smoke import tile_tables

    spark = get_spark("bucketed-q3-demo")
    spark.range(1).count()
    out = tempfile.mkdtemp(prefix=f"q3_demo_{K}x_")
    t0 = time.perf_counter()
    tile_tables(spark, BASE_SF_DIR, out, K)
    print(f"# tiling wall: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    c = spark.read.parquet(f"{out}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = spark.read.parquet(f"{out}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = spark.read.parquet(f"{out}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )

    plain = _q3(c, o, li)
    t0 = time.perf_counter()
    rows_plain = plain.collect()
    w_plain = time.perf_counter() - t0
    print(
        f"plain q3 @ {K}x: {w_plain:.1f}s, "
        f"shuffle exchanges = {_n_shuffles(plain)}"
    )

    app = spark.sparkContext.applicationId.replace("-", "_")
    t0 = time.perf_counter()
    write_bucketed(
        o, f"demo_q3_orders_{app}", buckets=BUCKETS,
        bucket_cols=["o_orderkey"], sort_cols=["o_orderkey"],
        path=f"{out}/b_orders",
    )
    write_bucketed(
        li, f"demo_q3_lineitem_{app}", buckets=BUCKETS,
        bucket_cols=["l_orderkey"], sort_cols=["l_orderkey"],
        path=f"{out}/b_lineitem",
    )
    w_bucket = time.perf_counter() - t0
    print(f"one-time bucketing (orders+lineitem, {BUCKETS} buckets): "
          f"{w_bucket:.1f}s")

    ob = spark.table(f"demo_q3_orders_{app}")
    lib = spark.table(f"demo_q3_lineitem_{app}")
    bucketed = _q3(c, ob, lib)
    t0 = time.perf_counter()
    rows_bucketed = bucketed.collect()
    w_bkt = time.perf_counter() - t0
    print(
        f"bucketed q3 @ {K}x: {w_bkt:.1f}s, "
        f"shuffle exchanges = {_n_shuffles(bucketed)}"
    )
    assert [tuple(r) for r in rows_plain] == [tuple(r) for r in rows_bucketed]
    print(f"# results identical; speedup {w_plain / w_bkt:.2f}x on the "
          f"join (layout paid once: {w_bucket:.1f}s)")
    shutil.rmtree(out, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
