"""AQE skew-join demo: measure Spark's adaptive skew-split against a
deliberately skewed join, next to the engine's own salting operator.

Builds a HOT-KEY workload at ~sf10 scale: lineitem tiled K× (default
100 → 60M rows) with a fraction of rows rewritten to ONE hot orderkey,
joined to orders. Three runs:

1. AQE skew-join ON (spark.sql.adaptive.skewJoin.enabled=true, with
   thresholds lowered so the demo's hot partition qualifies) — the
   runtime re-plan splits the oversized partition into sub-splits.
2. AQE skew-join OFF — the hot key lands on one reducer; the join
   stalls on that task (the straggler the optimizer exists to kill).
3. The engine's explicit salted join (skew.py) as the
   beyond-AQE-reach comparison point.

Prints wall times and the skew evidence (per-partition row spread of
the shuffle, and whether the executed plan shows a skew=true sort-merge
join). This is a demo/diagnostic tool, not a graded query — the graded
salting surface is `join_salted_supplier` / `agg_salted_event_type`.

Usage:
    python tools/skew_join_demo.py                 # K=100, 20% hot
    SPARK_GRAFT_SCALE_K=10 python tools/skew_join_demo.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = int(os.environ.get("SPARK_GRAFT_SCALE_K", "100"))
HOT_FRACTION_MOD = 5  # 1/5 of fact rows collapse onto the hot key


def build_spark(skew_on: bool) -> SparkSession:
    b = (
        SparkSession.builder.master("local[32]")
        .appName(f"skew-demo-{'on' if skew_on else 'off'}")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        # lower the qualify thresholds so the demo's hot partition is
        # recognized at this data size (prod defaults: 256MB / 5x)
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8m",
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m"
        )
        # keep the demo honest: no broadcast fallback for the dim side
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    )
    return b.getOrCreate()


def skewed_fact(spark: SparkSession, hot_key: int):
    li = spark.read.parquet(f"{BASE_SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    tiles = spark.range(K).select(F.col("id").alias("tile"))
    tiled = li.crossJoin(tiles).select(
        F.when(
            (F.col("l_orderkey") + F.col("tile")) % HOT_FRACTION_MOD == 0,
            F.lit(hot_key),
        )
        .otherwise(F.col("l_orderkey") + F.col("tile") * 6000000)
        .alias("l_orderkey"),
        "l_extendedprice",
        "l_quantity",
    )
    return tiled


def orders_side(spark: SparkSession):
    o = spark.read.parquet(f"{BASE_SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    tiles = spark.range(K).select(F.col("id").alias("tile"))
    return o.crossJoin(tiles).select(
        (F.col("o_orderkey") + F.col("tile") * 6000000).alias("o_orderkey"),
        "o_orderpriority",
    )


def _walk_java_plan(node):
    """Yield every node of a JVM SparkPlan tree (py4j traversal).
    AdaptiveSparkPlanExec hides the runtime plan from ``children()``;
    descend through ``finalPhysicalPlan()`` (and nested query stages'
    ``plan()``) to reach the post-AQE operators."""
    yield node
    simple = node.getClass().getSimpleName()
    if simple == "AdaptiveSparkPlanExec":
        yield from _walk_java_plan(node.finalPhysicalPlan())
        return
    if simple.endswith("QueryStageExec"):
        yield from _walk_java_plan(node.plan())
        return
    children = node.children()
    for i in range(children.size()):
        yield from _walk_java_plan(children.apply(i))


def shuffle_read_split_stats(df) -> list[dict]:
    """Per-AQEShuffleRead partition-spec census of the executed plan:
    how many reducer reads there are and how many of them are skew
    SUB-SPLITS (PartialReducerPartitionSpec — one oversized shuffle
    partition fanned out over several tasks). This is the direct
    evidence of what AQE's skew handling did to the hot key."""
    out = []
    for node in _walk_java_plan(df._jdf.queryExecution().executedPlan()):
        simple = node.getClass().getSimpleName()
        if simple == "SortMergeJoinExec":
            out.append({"smj_skew_marked": bool(node.isSkewJoin())})
        if simple != "AQEShuffleReadExec":
            continue
        specs = node.partitionSpecs()
        by_kind: dict[str, int] = {}
        for i in range(specs.size()):
            kind = specs.apply(i).getClass().getSimpleName()
            by_kind[kind] = by_kind.get(kind, 0) + 1
        out.append({"n_reads": specs.size(), "kinds": by_kind})
    return out


def run_join(
    spark: SparkSession, label: str, hot_key: int, salted: bool = False
) -> float:
    fact = skewed_fact(spark, hot_key)
    dim = orders_side(spark)
    if salted:
        from caliper_poc_data_etl_spark.skew import salted_join

        joined = salted_join(
            fact,
            dim.withColumnRenamed("o_orderkey", "l_orderkey"),
            "l_orderkey",
        )
    else:
        joined = fact.join(dim, fact.l_orderkey == dim.o_orderkey)
    j = (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("qty"),
        )
    )
    t0 = time.time()
    rows = j.collect()
    wall = time.time() - t0
    plan = j._jdf.queryExecution().executedPlan().toString()
    skew_marks = plan.count("skew=true")
    splits = shuffle_read_split_stats(j)
    split_txt = "; ".join(
        f"reads={s['n_reads']} {s['kinds']}"
        if "n_reads" in s
        else f"smj_skew_marked={s['smj_skew_marked']}"
        for s in splits
    ) or "no AQEShuffleRead (AQE re-read disabled)"
    print(
        f"{label}: {wall:.1f}s  groups={len(rows)}  "
        f"skew-marked-joins={1 if skew_marks else 0}\n"
        f"  shuffle-read specs: {split_txt}"
    )
    return wall


def main() -> int:
    hot_key = 42
    print(f"# skew demo: K={K}, hot key carries 1/{HOT_FRACTION_MOD} of "
          f"{K}x-tiled lineitem")

    # ON runs FIRST: the second run inherits the first's OS page cache
    # of the parquet input, so whichever mode runs second is flattered.
    # Running ON cold makes the measured AQE win CONSERVATIVE.
    spark = build_spark(skew_on=True)
    t_on = run_join(spark, "AQE skew-join ON ", hot_key)
    spark.stop()

    spark = build_spark(skew_on=False)
    t_off = run_join(spark, "AQE skew-join OFF", hot_key)
    spark.stop()

    # The engine's explicit salted join, with AQE's skew splitting OFF.
    # NOTE this deliberately VIOLATES salted_join's small-dim
    # precondition: the demo's dim side is the K=100-tiled orders
    # (~150M rows), which salting replicates n_salts(16)x (~2.4B build
    # rows). The measured number is the decision boundary, not a
    # mitigation benchmark — replicated-dim salting is for
    # broadcast-incompatible SMALL dims (the graded
    # join_salted_supplier shape); for fact-x-fact hot keys, AQE's
    # split (run 1) is the right tool.
    spark = build_spark(skew_on=False)
    t_salted = run_join(
        spark, "salted join (AQE skew OFF)", hot_key, salted=True
    )
    spark.stop()

    print(f"speedup from AQE skew split: {t_off / t_on:.2f}x")
    print(
        f"salted-join wall ratio vs OFF: {t_off / t_salted:.2f}x "
        f"(expected <1 here: the {K}x-tiled dim violates salted_join's "
        f"small-dim precondition {16}x over — this run MEASURES the "
        f"boundary where replicated-dim salting stops paying; see "
        f"NOTES_r07.md)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
