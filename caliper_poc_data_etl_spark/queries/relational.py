"""Relational operator closure: filters, joins, aggregates, set ops.

SURVEY.md §2B rows "Projection/Filter/Join/Agg/Set ops/Sort". Each
query is a native-Column plan (no UDFs); Catalyst handles pushdown,
join selection and AQE. Oracle twins are ANSI SQL for DuckDB.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from caliper_poc_data_etl_spark.queries.registry import query, t

# --------------------------------------------------------------------- scans


@query(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS net_price
    FROM lineitem
    """,
)
def scan_project(spark, sf_dir):
    """Projection + arithmetic; column pruning reaches the parquet scan.

    Money math in DECIMAL: double rounding differs across engines at
    half-boundaries (Spark rounds the shortest decimal repr, others
    the binary value) — 2-dp prices × 2-dp discounts hit .xx5 cases
    constantly. Decimal arithmetic is exact and order-independent.
    """
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        F.round(dec("l_extendedprice") * (1 - dec("l_discount")), 2)
        .cast("double")
        .alias("net_price"),
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_type, p_size, p_retailprice
    FROM part
    WHERE p_size IN (5, 10, 15)
      AND p_retailprice BETWEEN 500 AND 1500
      AND p_name LIKE '%a%'
      AND regexp_matches(p_type, '^(STANDARD|SMALL)')
    """,
)
def filter_predicates(spark, sf_dir):
    """IN / BETWEEN / LIKE / regexp predicates, pushed to the scan."""
    p = t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").isin(5, 10, 15)
        & F.col("p_retailprice").between(500, 1500)
        & F.col("p_name").like("%a%")
        & F.col("p_type").rlike("^(STANDARD|SMALL)")
    ).select("p_partkey", "p_name", "p_type", "p_size", "p_retailprice")


@query(
    "filter_null_semantics",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE o_orderstatus IS NOT NULL AND NOT (o_orderstatus = 'O')
    """,
)
def filter_null_semantics(spark, sf_dir):
    """Three-valued logic: NOT(x='O') excludes NULLs in both engines."""
    o = t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isNotNull() & ~(F.col("o_orderstatus") == "O")
    ).select("o_orderkey", "o_orderstatus")


# --------------------------------------------------------------------- joins


@query(
    "join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_inner(spark, sf_dir):
    """Equi inner join; Catalyst picks broadcast vs sort-merge (AQE)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, ROUND(o.o_totalprice, 2) AS price
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey % 10 = 0
    """,
)
def join_right_outer(spark, sf_dir):
    """Right outer join preserving the customer side (NULL orders for
    order-less customers)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    o = t(spark, sf_dir, "orders")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cs AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
                FROM customer GROUP BY 1),
         ss AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
                FROM supplier GROUP BY 1)
    SELECT COALESCE(cs.nationkey, ss.nationkey) AS nationkey,
           COALESCE(cs.n_cust, 0) AS n_cust,
           COALESCE(ss.n_supp, 0) AS n_supp
    FROM cs FULL OUTER JOIN ss ON cs.nationkey = ss.nationkey
    """,
)
def join_full_outer(spark, sf_dir):
    """Full outer join: per-nation customer vs supplier counts, keeping
    nations present on either side only. Pre-aggregating both sides
    before the join keeps the shuffled rows to one per key."""
    cs = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_cust"))
    )
    ss = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        cs.join(ss, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    """Left outer join preserving customers with zero orders."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 2).alias(
                "total_spend"
            ),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark, sf_dir):
    """Left-semi join = EXISTS; no row multiplication."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark, sf_dir):
    """Left-anti join = NOT EXISTS (customers who never ordered)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation, COUNT(*) AS n_suppliers,
           ROUND(SUM(s.s_acctbal), 2) AS total_bal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast_dims(spark, sf_dir):
    """Star-schema dims joined with explicit broadcast (no shuffle of
    the fact side for the join — the 100 TB-correct shape)."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "join_range_predicate",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_partkey, p.p_size
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
               AND l.l_quantity BETWEEN p.p_size - 2 AND p.p_size + 2
    """,
)
def join_range_predicate(spark, sf_dir):
    """Equi key + range band condition (range-predicate join)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return li.join(
        p,
        (li.l_partkey == p.p_partkey)
        & li.l_quantity.between(p.p_size - 2, p.p_size + 2),
    ).select("l_orderkey", "l_linenumber", "p_partkey", "p_size")


@query(
    "join_theta",
    oracle="""
    SELECT a.n_nationkey AS nation_a, b.n_nationkey AS nation_b
    FROM nation a JOIN nation b
      ON a.n_nationkey < b.n_nationkey AND a.n_regionkey = b.n_regionkey
    """,
)
def join_theta(spark, sf_dir):
    """Pure inequality self-join (BNLJ on the non-equi part)."""
    a = t(spark, sf_dir, "nation").alias("a")
    b = t(spark, sf_dir, "nation").alias("b")
    return a.join(
        b,
        (F.col("a.n_nationkey") < F.col("b.n_nationkey"))
        & (F.col("a.n_regionkey") == F.col("b.n_regionkey")),
    ).select(
        F.col("a.n_nationkey").alias("nation_a"),
        F.col("b.n_nationkey").alias("nation_b"),
    )


@query(
    "join_asof",
    oracle="""
    WITH purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
         clicks    AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS prior_click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: each purchase matched to the user's nearest prior
    click. Spark lacks a native ASOF; the scalable composition is a
    single sort within user partitions + a last-non-null running
    window over the unioned stream (one shuffle, no quadratic join).

    Why not ``DataFrame._joinAsOf`` (the merge_asof backend): Spark
    rewrites AsOfJoin into an equi-join on the partition key plus a
    ``min_by`` aggregate, which materializes every (purchase, prior
    click) pair per user before aggregating — quadratic in a hot
    user's activity. The window form shuffles each row once, ever.
    Only the 4 consumed columns are projected BEFORE the exchange, so
    wide event payloads never enter the shuffle.
    """
    e = t(spark, sf_dir, "events")
    stream = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    # Order clicks before purchases on equal ts (ASOF uses <=).
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        stream.withColumn(
            "prior_click_ts_raw",
            F.last(
                F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", fmt).alias("purchase_ts"),
            F.date_format("prior_click_ts_raw", fmt).alias("prior_click_ts"),
        )
    )


# ---------------------------------------------------------------- aggregates


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 2) AS avg_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: multi-aggregate hash agg with partial (map-side)
    aggregation for free; the headline bench query."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_top_revenue",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-k.

    Join strategy is picked deliberately (guide §3.1): broadcast the
    side the selective c_mktsegment filter made small (BUILDING
    customers ⋈ orders — keys only), probe the LINEITEM fact table
    unshuffled. Left to its size estimates the planner built the hash
    relation from lineitem itself (BuildRight over the fact table —
    measured 1.27 → 0.93 s at sf0.1, and an anti-scale shape: the
    broadcast side grows with the fact table instead of the filtered
    dimension)."""
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
        # DECIMAL money math: the double sum hit a .xx5 rounding tie
        # at sf0.1 (summation order differs across engines); the
        # decimal product is exact, so the sum and round are too.
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


@query(
    "q5_local_supplier_revenue",
    oracle="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_revenue(spark, sf_dir):
    """TPC-H Q5 analog: revenue from orders where customer and
    supplier share a nation, by nation.

    Plan posture: the fact chain (orders⋈lineitem) shuffles on its
    keys; nation/region (and at real scale supplier) are broadcast so
    the 5-way join adds no extra fact shuffles; the date filter pushes
    into the orders scan."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            # Decimal accumulation: double SUM order differs between
            # engines/partitionings and can flip a .xx5 rounding case;
            # exact decimal sums are identical everywhere.
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark, sf_dir):
    """COUNT(DISTINCT) — expand+two-phase agg under the hood."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
           ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`). The 100 TB substitute is `approx_percentile`
    (t-digest, one pass) — same call shape, tested separately."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5), 4).alias("p50_qty"),
        F.round(F.percentile("l_quantity", 0.9), 4).alias("p90_qty"),
        F.round(F.percentile("l_extendedprice", 0.25), 4).alias("p25_price"),
    )


@query(
    "agg_corr_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           ROUND(stddev_samp(l_quantity), 4) AS qty_stddev,
           ROUND(var_samp(l_quantity), 4) AS qty_var
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_corr_stats(spark, sf_dir):
    """Statistical aggregates: correlation, covariance, stddev,
    variance — single-pass co-moment aggregation."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
    )


@query("agg_approx_distinct", oracle=None)  # HLL estimate is engine-specific
def agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) — the 100 TB substitute
    for exact COUNT(DISTINCT): one pass, fixed-size sketch, no expand.
    Rows-only for the driver; tests assert ≤5% relative error vs the
    exact count (default rsd 0.05)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        )
    )


@query(
    "agg_stats",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_stats(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT l_orderkey,
           string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber)
             AS linenumbers,
           COUNT(*) AS n_lines
    FROM lineitem GROUP BY l_orderkey
    """,
)
def agg_collect_sorted(spark, sf_dir):
    """collect_list with deterministic order (S14 generalized): sort
    the collected array, then join — Spark gives no intra-group order."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("l_linenumber")),
                    lambda x: x.cast("string"),
                ),
            ).alias("linenumbers"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           ROUND(SUM(o_totalprice), 2) AS total, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"), F.count("*").alias("n"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """GROUPING SETS via the SQL surface (same Catalyst plan)."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ------------------------------------------------------------------- set ops


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark, sf_dir):
    """Pivot (long→wide): order counts per status column. Pinning the
    pivot values keeps the plan one-pass — an unpinned pivot first runs
    a distinct-values job, which is a full extra scan at 100 TB."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("f_cnt"),
            F.coalesce("O", F.lit(0)).alias("o_cnt"),
            F.coalesce("P", F.lit(0)).alias("p_cnt"),
        )
    )


@query(
    "unpivot_measures",
    oracle="""
    SELECT o_orderkey, measure, FLOOR(value * 100 + 0.5) / 100 AS value
    FROM (
      SELECT o_orderkey,
             UNPIVOT_ROW.measure, UNPIVOT_ROW.value
      FROM orders,
           LATERAL (VALUES ('totalprice', o_totalprice),
                           ('price_k', o_totalprice / 1000.0))
             AS UNPIVOT_ROW(measure, value)
    )
    WHERE o_orderkey % 100 = 0
    """,
)
def unpivot_measures(spark, sf_dir):
    """Unpivot/melt (wide→long): each order row becomes one row per
    measure — a narrow transformation (no shuffle)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return (
        o.select(
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            (F.col("o_totalprice") / 1000.0).alias("price_k"),
        )
        .unpivot("o_orderkey", ["totalprice", "price_k"], "measure", "value_raw")
        # floor-rounding, not ROUND: price_k = totalprice/1000 lands
        # exactly on .xx5 and Spark rounds the SHORTEST decimal repr
        # of the double (77.195 -> 77.2) while DuckDB rounds the
        # binary value (77.19499... -> 77.19); floor(x*100+0.5) is the
        # same IEEE chain on both sides.
        .select(
            "o_orderkey",
            "measure",
            (F.floor(F.col("value_raw") * 100 + F.lit(0.5)) / 100).alias("value"),
        )
    )


@query(
    "setop_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def setop_union_all(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "setop_except",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_except(spark, sf_dir):
    """Set EXCEPT: distinct left minus right. ``subtract`` after a
    ``distinct`` gives true set-difference semantics — the earlier
    ``exceptAll().distinct()`` kept a value whenever the left side had
    MORE duplicates than the right (bag difference), which only
    coincided with set EXCEPT here because n_nationkey is unique."""
    n = t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return n.distinct().subtract(s.distinct())


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def distinct_rows(spark, sf_dir):
    return t(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


# ---------------------------------------------------------------- sort/top-k


@query(
    "sort_topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def sort_topk_global(spark, sf_dir):
    """Global top-k: Catalyst plans TakeOrderedAndProject — no full sort."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "limit_rows",
    oracle="""
    SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 50
    """,
)
def limit_rows(spark, sf_dir):
    """LIMIT pushdown (S7 generalized) — made deterministic via sort."""
    return t(spark, sf_dir, "orders").select("o_orderkey").orderBy("o_orderkey").limit(50)


@query(
    "join_null_safe",
    oracle="""
    WITH keyed AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS k
      FROM orders
    ), dim AS (
      SELECT DISTINCT o_orderstatus AS k FROM orders
      UNION ALL SELECT NULL
    )
    SELECT d.k AS join_key, COUNT(*) AS n_rows
    FROM keyed l JOIN dim d ON l.k IS NOT DISTINCT FROM d.k
    GROUP BY d.k
    """,
)
def join_null_safe(spark, sf_dir):
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping out — the semantics dedup and
    CDC merges rely on when the business key is nullable. Spark plans
    ``eqNullSafe`` as a hash join (the null bucket is just another
    key), so the scale shape is identical to a plain equi-join."""
    o = t(spark, sf_dir, "orders")
    keyed = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("k"),
    )
    dim = (
        o.select(F.col("o_orderstatus").alias("k"))
        .distinct()
        .unionAll(spark.range(1).select(F.lit(None).cast("string").alias("k")))
        .withColumnRenamed("k", "dk")
    )
    return (
        keyed.join(F.broadcast(dim), keyed.k.eqNullSafe(dim.dk))
        .groupBy(F.col("dk").alias("join_key"))
        .agg(F.count("*").alias("n_rows"))
    )


@query(
    "agg_heavy_hitter_per_user",
    oracle="""
    SELECT user_id, event_type AS top_event_type, cnt FROM (
      SELECT user_id, event_type, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY user_id, event_type
    ) WHERE rn = 1
    """,
)
def agg_heavy_hitter_per_user(spark, sf_dir):
    """Deterministic per-group mode (most frequent event_type per
    user): count + window-rank with an explicit (count DESC, value)
    tiebreak instead of ``mode()``, whose tie choice is
    engine-arbitrary. Two shuffles, both keyed on user_id, and the
    window input is already the aggregated (user, type) table — tiny
    relative to the raw events."""
    e = t(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    w = W.partitionBy("user_id").orderBy(F.desc("cnt"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_event_type"), "cnt")
    )


_PROFILE_COLS = [
    # (name, spark min/max projection needs a cast that stringifies the
    #  same in both engines — DECIMAL for doubles, date_format for ts)
    ("o_orderstatus", "CAST(MIN(o_orderstatus) AS VARCHAR)", "CAST(MAX(o_orderstatus) AS VARCHAR)"),
    ("o_orderpriority", "CAST(MIN(o_orderpriority) AS VARCHAR)", "CAST(MAX(o_orderpriority) AS VARCHAR)"),
    ("o_custkey", "CAST(MIN(o_custkey) AS VARCHAR)", "CAST(MAX(o_custkey) AS VARCHAR)"),
    ("o_totalprice", "CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)",
     "CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)"),
    ("o_orderdate", "strftime(MIN(o_orderdate), '%Y-%m-%d')", "strftime(MAX(o_orderdate), '%Y-%m-%d')"),
]


@query(
    "profile_orders_columns",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {mn} AS min_s, {mx} AS max_s
    FROM orders"""
        for c, mn, mx in _PROFILE_COLS
    ),
)
def profile_orders_columns(spark, sf_dir):
    """Single-pass column profiling (null count / distinct / min / max
    per column, long format) — the data-quality summary every ingest
    job runs first. Spark computes ALL columns' statistics in ONE
    aggregation over one scan (the oracle's UNION-ALL-of-aggregates is
    the naive N-scan formulation), then pivots to long form with
    ``inline`` — constant-size output, no second pass.

    Scale note: N exact countDistincts in one agg trigger Catalyst's
    Expand rewrite (N+1× the shuffled rows — the price of exact
    multi-distinct in one pass; measured 2.5 s at sf0.1 vs ~0.3 s for
    the sibling aggregates). At 100 TB swap in
    ``approx_count_distinct``: the Expand disappears and the profile
    becomes a single map-side-partial aggregate."""
    o = t(spark, sf_dir, "orders")

    def _minmax(c):
        if c == "o_totalprice":
            col = F.col(c).cast("decimal(18,2)")
            return F.min(col).cast("string"), F.max(col).cast("string")
        if c == "o_orderdate":
            return (
                F.date_format(F.min(c), "yyyy-MM-dd"),
                F.date_format(F.max(c), "yyyy-MM-dd"),
            )
        return F.min(c).cast("string"), F.max(c).cast("string")

    aggs = []
    for c, _, _ in _PROFILE_COLS:
        mn, mx = _minmax(c)
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            mn.alias(f"{c}__min"),
            mx.alias(f"{c}__max"),
        ]
    one = o.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_s"),
                F.col(f"{c}__max").alias("max_s"),
            )
            for c, _, _ in _PROFILE_COLS
        ]
    )
    return one.select(F.inline(rows))


# ------------------------------------------------------- SQL-text surface


@query(
    "sql_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1995-03-15'
      AND l.l_shipdate > DATE '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
)
def sql_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 (shipping-priority shape) run as SQL TEXT through
    ``spark.sql`` — the join-bearing proof of the SQL surface (SURVEY
    §3.5) beyond the single grouping-sets entry: a 3-way join + filter
    + aggregate authored as ANSI SQL compiles through the same
    Catalyst path as the DataFrame twin (``q3_top_revenue``), with
    identical pushdown/broadcast planning. Views are registered
    per-call with private names so the entry works on any session."""
    for name in ("customer", "orders", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"_sqlq3_{name}")
    return spark.sql(
        """
        SELECT l.l_orderkey,
               CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
                    AS DOUBLE) AS revenue,
               date_format(o.o_orderdate, 'yyyy-MM-dd') AS orderdate,
               o.o_orderpriority AS orderpriority
        FROM _sqlq3_customer c
        JOIN _sqlq3_orders o ON c.c_custkey = o.o_custkey
        JOIN _sqlq3_lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < DATE '1995-03-15'
          AND l.l_shipdate > DATE '1995-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        """
    )


@query(
    "sql_exists_scalar_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_name, ROUND(c.c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
      AND EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
    """,
)
def sql_exists_scalar_subquery(spark, sf_dir):
    """Correlated EXISTS + uncorrelated scalar subquery as SQL TEXT —
    the subquery surface of the SQL front-end. Catalyst rewrites the
    EXISTS to a left-semi join and the scalar subquery to a broadcast
    1-row aggregate (the same shapes the DataFrame API queries build
    explicitly), so this also pins that the declarative form gets the
    scale-correct plan."""
    for name in ("customer", "orders"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"_sqlex_{name}")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, ROUND(c.c_acctbal, 2) AS acctbal
        FROM _sqlex_customer c
        WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM _sqlex_customer)
          AND EXISTS (SELECT 1 FROM _sqlex_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
        """
    )


@query(
    "agg_filtered_pack",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                      FILTER (WHERE l_linestatus = 'F'), 2) AS DOUBLE)
             AS rev_finished,
           ROUND(AVG(l_quantity) FILTER (WHERE l_tax > 0.03), 4) AS avg_qty_taxed,
           COUNT(DISTINCT l_suppkey) FILTER (WHERE l_quantity >= 30)
             AS n_bulk_suppliers
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_filtered_pack(spark, sf_dir):
    """Conditional aggregation (SQL FILTER clause) four ways:
    count_if, filtered DECIMAL sum, filtered avg, filtered distinct
    count — all in ONE hash aggregate pass over the fact table (the
    naive formulation is four scans). Spark expresses FILTER as
    when()-guarded inputs; every variant keeps map-side partial
    aggregation."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.round(
            F.sum(
                F.when(
                    F.col("l_linestatus") == "F",
                    F.col("l_extendedprice").cast("decimal(18,2)"),
                )
            ),
            2,
        )
        .cast("double")
        .alias("rev_finished"),
        F.round(
            F.avg(F.when(F.col("l_tax") > 0.03, F.col("l_quantity"))), 4
        ).alias("avg_qty_taxed"),
        F.count_distinct(
            F.when(F.col("l_quantity") >= 30, F.col("l_suppkey"))
        ).alias("n_bulk_suppliers"),
    )


# ------------------------------------------------ TPC-H analog closure
# q1/q3/q5 analogs live above; these six close out the TPC-H shapes the
# driver tables support (no partsupp table → q2/q9/q11/q16/q20 family
# is out of scope; shipdate stands in for commit/receipt dates).


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 analog: pure filtered aggregate — every predicate
    reaches the parquet scan (PushedFilters), the agg is a map-side
    partial + 1-row exchange. DECIMAL money math (house convention)."""
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(dec("l_extendedprice") * dec("l_discount")), 2)
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-07-01' AND o.o_orderdate < DATE '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 analog: priority counts of orders with a late shipment
    (≥60 days after order date; shipdate stands in for the missing
    commit/receipt dates). The EXISTS is a left-semi join — lineitem
    never multiplies the order rows, and the date predicate rides the
    join condition."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate >= F.date_add(o.o_orderdate, 60)
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, ship_year,
           CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS ship_year,
             CAST(l.l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
          OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
        AND l.l_shipdate >= DATE '1996-01-01'
        AND l.l_shipdate < DATE '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, ship_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 analog: bilateral trade volume between two nations by
    ship year. Five joins: the two nation dims broadcast (pushing
    their name filters to partition the supplier/customer sides
    early); lineitem↔orders is the only big shuffle pair."""
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    ns = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
            (dec("l_extendedprice") * (1 - dec("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(F.round(F.sum("volume"), 2).cast("double").alias("revenue"))
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= DATE '1996-10-01' AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 analog: top-20 customers by returned-item revenue in
    a quarter. Global top-k after the aggregate plans as
    TakeOrderedAndProject (no full sort); c_custkey breaks revenue
    ties deterministically."""
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))), 2
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(ROUND(
             100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                      THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                           * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                      ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE),
             4) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1996-09-01' AND l.l_shipdate < DATE '1996-10-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 analog: promo revenue share for one month. Part is
    the broadcast side; both sums accumulate in DECIMAL (exact) and
    only the final ratio drops to double."""
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01")
        & (F.col("l_shipdate") < "1996-10-01")
    )
    p = t(spark, sf_dir, "part")
    vol = dec("l_extendedprice") * (1 - dec("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(o.o_totalprice, 2) AS totalprice,
           big.sum_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 analog: customers behind the largest-volume orders
    (HAVING sum(qty) > threshold). The heavy groupBy runs FIRST and
    its survivors (a tiny keyset) drive semi-sized joins into orders
    and customer — never the other way around."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_lines,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
             AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_bucketed_colocated(spark, sf_dir):
    """Join through BUCKETED tables: both sides are written
    ``bucketBy(8, orderkey)`` + ``sortBy`` and re-read from the
    catalog, so the sort-merge join consumes buckets directly — the
    write-once-shuffle-never co-location play for repeated joins on
    one key (zero Exchange nodes, pinned by
    tests/test_formats_and_bucketing.py::test_bucketed_join_has_no_shuffle).
    The graded check here proves the full bucketed write → catalog
    read → join path is value-exact vs the plain join oracle on a
    vanilla session.

    Staging discipline: the bucketed copies land at a STABLE
    per-session path (keyed by applicationId) and are overwritten in
    place on re-invocation — a fresh mkdtemp per call would leak a
    full orders+lineitem copy every run, and unsuffixed catalog names
    would race across concurrent sessions sharing a metastore."""
    import tempfile

    from caliper_poc_data_etl_spark.sinks import write_bucketed

    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    app = spark.sparkContext.applicationId.replace("-", "_")
    base = f"{tempfile.gettempdir()}/graft_bucketed_{app}"
    tbl_orders = f"graft_b_orders_{app}"
    tbl_lineitem = f"graft_b_lineitem_{app}"
    write_bucketed(
        t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus"),
        tbl_orders,
        buckets=8,
        bucket_cols=["o_orderkey"],
        sort_cols=["o_orderkey"],
        path=f"{base}/orders",
    )
    write_bucketed(
        t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        tbl_lineitem,
        buckets=8,
        bucket_cols=["l_orderkey"],
        sort_cols=["l_orderkey"],
        path=f"{base}/lineitem",
    )
    o = spark.table(tbl_orders)
    li = spark.table(tbl_lineitem)
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


_REGR_X0_US = 1704067200000000  # 2024-01-01T00:00:00Z in epoch microseconds


@query(
    "agg_regr_slope",
    oracle=f"""
    WITH m AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(xd) AS sx, SUM(yd) AS sy,
             SUM(xd * xd) AS sxx, SUM(xd * yd) AS sxy, SUM(yd * yd) AS syy
      FROM (
        SELECT user_id,
               -- DECIMAL(19): DuckDB stores p<=18 in int64, and the
               -- xd*xd product overflows int64; 19 forces int128.
               CAST(epoch_us(ts) - {_REGR_X0_US} AS DECIMAL(19,0)) AS xd,
               CAST(value AS DECIMAL(18,6)) AS yd
        FROM events
      )
      GROUP BY user_id
      HAVING COUNT(*) >= 2
    ), d AS (
      SELECT user_id, n, CAST(n AS DOUBLE) AS nd,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
             CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd,
             CAST(syy AS DOUBLE) AS syyd
      FROM m
    ), k AS (
      SELECT user_id, n, nd, sxd, syd,
             (nd * sxyd - sxd * syd) AS num,
             (nd * sxxd - sxd * sxd) AS denx,
             (nd * syyd - syd * syd) AS deny
      FROM d
    )
    SELECT user_id, n,
           FLOOR(((num / denx) * 1e6) * 1e6 + 0.5) / 1e6 AS slope,
           FLOOR(((syd - (num / denx) * sxd) / nd) * 1e4 + 0.5) / 1e4
             AS intercept,
           FLOOR((num * num / (denx * deny)) * 1e6 + 0.5) / 1e6 AS r2
    FROM k
    """,
)
def agg_regr_slope(spark, sf_dir):
    """Per-user linear trend: least-squares slope/intercept/R² of
    event value over time — one hash aggregation with map-side
    partials, the scalable substitute for fitting per-key models
    driver-side.

    Cross-engine determinism: the regression MOMENTS (Σx, Σy, Σx²,
    Σxy, Σy²) accumulate in exact DECIMAL — x as integer microseconds
    centered at 2024-01-01T00:00Z (so x² fits DECIMAL(38,0)), y
    quantized to DECIMAL(18,6). Built-in regr_* aggregates sum
    doubles, which is accumulation-order-dependent and can flip the
    rounded output between engines/partitionings. Slope is per
    SECOND; intercept is the fitted value at 2024-01-01T00:00Z (the
    centering origin), not at epoch 0. The final arithmetic runs in
    IEEE doubles derived from the exact sums, written identically on
    both sides, with floor-based half-up rounding."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_micros("ts") - F.lit(_REGR_X0_US))
        .cast("decimal(18,0)")
        .alias("xd"),
        F.col("value").cast("decimal(18,6)").alias("yd"),
    )
    m = (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("xd").alias("sx"),
            F.sum("yd").alias("sy"),
            F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
            F.sum(F.col("xd") * F.col("yd")).alias("sxy"),
            F.sum(F.col("yd") * F.col("yd")).alias("syy"),
        )
        .filter(F.col("n") >= 2)
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    sxyd = F.col("sxy").cast("double")
    syyd = F.col("syy").cast("double")
    num = nd * sxyd - sxd * syd
    denx = nd * sxxd - sxd * sxd
    deny = nd * syyd - syd * syd
    slope = (num / denx) * 1e6  # per-µs slope → per-second
    intercept = (syd - (num / denx) * sxd) / nd
    r2 = num * num / (denx * deny)
    return m.select(
        "user_id",
        "n",
        (F.floor(slope * 1e6 + F.lit(0.5)) / 1e6).alias("slope"),
        (F.floor(intercept * 1e4 + F.lit(0.5)) / 1e4).alias("intercept"),
        (F.floor(r2 * 1e6 + F.lit(0.5)) / 1e6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Round-4 TPC-H analog closure: q8/q13/q15/q17/q19/q22 adapted to the
# testdata's slim schemas (no l_shipmode/l_commitdate/p_container/
# c_phone/o_comment — predicates substitute available columns; the
# JOIN/AGG SHAPE of each query is preserved, which is what the analog
# exercises). With these, every TPC-H query not requiring partsupp
# (q2/q9/q11/q16/q20) has an analog.
# ---------------------------------------------------------------------------


@query(
    "q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= DATE '1996-01-01'
        AND o.o_orderdate < DATE '1998-01-01'
    )
    SELECT o_year,
           FLOOR((COALESCE(CAST(SUM(CASE WHEN supp_nation = 'NATION_7'
                                         THEN volume END) AS DOUBLE), 0.0)
                  / CAST(SUM(volume) AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 analog (national market share): NATION_7 suppliers'
    revenue share among AMERICA-region customers for STANDARD parts,
    by order year. Seven-table star: part/region/nation filters cut
    the fact stream early (broadcast dims), then one hash agg on year
    with the share as a conditional-over-total ratio of exact DECIMAL
    sums (numerator NULL-skips non-matching rows; both engines divide
    the same exact sums in doubles — order-independent)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    dec = lambda col: F.col(col).cast("decimal(18,4)")  # noqa: E731
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            (dec("l_extendedprice") * (1 - dec("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    g = vol.groupBy("o_year").agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume"))).alias(
            "num"
        ),
        F.sum("volume").alias("den"),
    )
    share = F.coalesce(F.col("num").cast("double"), F.lit(0.0)) / F.col(
        "den"
    ).cast("double")
    return g.select(
        "o_year", (F.floor(share * 1e6 + F.lit(0.5)) / 1e6).alias("mkt_share")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 analog (customer order-count distribution): LEFT join
    keeps zero-order customers (the filter lives in the JOIN CONDITION
    — a WHERE would silently turn the outer join inner, the classic
    Q13 trap), count per customer, then histogram the counts. Two hash
    aggs; the second runs over one row per customer."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    ), mx AS (SELECT MAX(total_rev) AS m FROM rev)
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(r.total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    JOIN mx ON r.total_rev = mx.m
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 analog (top supplier by quarterly revenue): per-
    supplier DECIMAL revenue over one quarter, then an equality join
    against the broadcast 1-row MAX — exact decimal equality, so ties
    all surface (the Q15 view semantics). No window, no second scan:
    the max derives from the same aggregate frame."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    dec = lambda col: F.col(col).cast("decimal(18,4)")  # noqa: E731
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("m"))
    s = t(spark, sf_dir, "supplier")
    return (
        s.join(rev, s.s_suppkey == rev.l_suppkey)
        .join(F.broadcast(mx), F.col("total_rev") == F.col("m"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH lim AS (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS qlim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT FLOOR((CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)))
                       AS DOUBLE) / 7.0) * 100 + 0.5) / 100 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN lim a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12' AND p.p_type = 'SMALL'
      AND l.l_quantity < a.qlim
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 analog (small-quantity-order revenue): lineitems of
    one brand's SMALL parts whose quantity is below 20% of that part's
    average. The per-part threshold is a self-aggregation joined back
    on partkey — co-partitioned with the probe side, so the join
    reuses the aggregation's hash partitioning. AVG(l_quantity) is
    deterministic cross-engine because quantities are integer-valued
    doubles (exact sums at any accumulation order); revenue sums in
    DECIMAL."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#12") & (F.col("p_type") == "SMALL")
    )
    lim = li.groupBy(F.col("l_partkey").alias("lim_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qlim")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(lim, li.l_partkey == F.col("lim_partkey"))
        .filter(F.col("l_quantity") < F.col("qlim"))
    )
    total = j.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("s")
    )
    return total.select(
        (F.floor((F.col("s").cast("double") / 7.0) * 100 + F.lit(0.5)) / 100).alias(
            "avg_yearly"
        )
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 analog (disjunctive predicate revenue): three OR'd
    brand/size/quantity conjunctions across the join. Catalyst
    extracts the part-only disjunction (brand+size) below the join
    via constraint propagation, so the broadcast build side prunes
    before probing — the classic test that disjunctions don't defeat
    pushdown. Revenue in DECIMAL."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    dec = lambda col: F.col(col).cast("decimal(18,4)")  # noqa: E731
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH pool AS (
      SELECT c_custkey, c_nationkey,
             CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9) AND c_acctbal > 0.0
    ), thr AS (
      SELECT CAST(SUM(bal) AS DOUBLE) / COUNT(*) AS avg_bal FROM pool
    ), sel AS (
      SELECT p.c_custkey, p.c_nationkey, p.bal
      FROM pool p, thr
      WHERE CAST(p.bal AS DOUBLE) > thr.avg_bal
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = p.c_custkey
                          AND o.o_orderdate >= DATE '2000-01-01')
    )
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(bal), 2) AS DOUBLE) AS totacctbal
    FROM sel GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 analog (dormant high-balance customers): in a nation
    subset, customers with above-average positive balance and no
    orders SINCE 2000 (classic Q22 tests no-orders-ever, but this
    corpus gives every customer an order — the recent-window variant
    keeps the anti join doing real work). The average is a broadcast
    1-row scalar derived from an exact DECIMAL sum (order-
    independent); the dormancy test is a LEFT ANTI join (never a
    NOT IN — null-safe and shuffle-partitionable)."""
    pool = (
        t(spark, sf_dir, "customer")
        .filter(
            F.col("c_nationkey").isin(1, 3, 5, 7, 9) & (F.col("c_acctbal") > 0.0)
        )
        .select(
            "c_custkey",
            "c_nationkey",
            F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        )
    )
    thr = pool.agg(
        (F.sum("bal").cast("double") / F.count("*")).alias("avg_bal")
    )
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    sel = (
        pool.crossJoin(F.broadcast(thr))
        .filter(F.col("bal").cast("double") > F.col("avg_bal"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
    )
    return sel.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum("bal"), 2).cast("double").alias("totacctbal"),
    )


@query(
    "agg_grouping_id_rollup",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id_rollup(spark, sf_dir):
    """ROLLUP with explicit GROUPING() level identification — the
    missing piece next to agg_rollup: consumers of a rollup cube need
    to tell a real NULL key from a subtotal row, and grouping bits are
    the standard discriminator. COALESCE placeholders keep the graded
    output NULL-free (level is carried by gid)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (
                F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")
            ).cast("long").alias("gid"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n",
        )
    )


@query(
    "setop_all_variants",
    oracle="""
    SELECT 'intersect_all' AS op, o_orderstatus, o_orderpriority FROM (
      SELECT o_orderstatus, o_orderpriority FROM orders
      WHERE o_orderkey % 2 = 0
      INTERSECT ALL
      SELECT o_orderstatus, o_orderpriority FROM orders
      WHERE o_orderkey % 3 = 0
    )
    UNION ALL
    SELECT 'except_all' AS op, o_orderstatus, o_orderpriority FROM (
      SELECT o_orderstatus, o_orderpriority FROM orders
      WHERE o_orderkey % 2 = 0
      EXCEPT ALL
      SELECT o_orderstatus, o_orderpriority FROM orders
      WHERE o_orderkey % 3 = 0
    )
    """,
)
def setop_all_variants(spark, sf_dir):
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) —
    multiplicity-preserving variants completing the set-op family
    (plain INTERSECT/EXCEPT are already covered). Spark plans both as
    aggregate count-min arithmetic over a single shuffle per side, not
    a join per duplicate — the same way the SQL standard defines the
    bag semantics."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderstatus", "o_orderpriority"
    )
    b = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderstatus", "o_orderpriority"
    )
    inter = a.intersectAll(b).select(
        F.lit("intersect_all").alias("op"), "o_orderstatus", "o_orderpriority"
    )
    exc = a.exceptAll(b).select(
        F.lit("except_all").alias("op"), "o_orderstatus", "o_orderpriority"
    )
    return inter.unionByName(exc)


@query(
    "join_asof_tolerance",
    oracle="""
    WITH stream AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ), matched AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts, event_type, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prior_click_ts
      FROM stream
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           CASE WHEN prior_click_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(prior_click_ts) <= 3600000000
                THEN strftime(prior_click_ts, '%Y-%m-%d %H:%M:%S.%f')
           END AS prior_click_ts,
           (prior_click_ts IS NOT NULL
            AND epoch_us(ts) - epoch_us(prior_click_ts) <= 3600000000)
             AS within_tolerance
    FROM matched WHERE event_type = 'purchase'
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join WITH TOLERANCE (the pandas ``merge_asof(...,
    tolerance=...)`` contract): each purchase matches the user's
    nearest prior click ONLY if it happened within the last hour —
    stale matches are rejected, not silently joined. Attribution
    windows, sensor alignment, and trade/quote matching all need the
    bound; without it an as-of join happily pairs a purchase with a
    click from last month.

    Same single-shuffle window formulation as ``join_asof``
    (relational.py::join_asof — one user-partitioned sort, running
    IGNORE NULLS last; never the quadratic per-pair form); the
    tolerance is one integer timestamp comparison applied AFTER the
    window, so the plan cost is identical to the unbounded form."""
    e = t(spark, sf_dir, "events")
    stream = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    within = F.col("prior_click_ts_raw").isNotNull() & (
        F.unix_micros("ts") - F.unix_micros("prior_click_ts_raw")
        <= 3_600_000_000
    )
    return (
        stream.withColumn(
            "prior_click_ts_raw",
            F.last(
                F.when(F.col("event_type") == "click", F.col("ts")),
                ignorenulls=True,
            ).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", fmt).alias("purchase_ts"),
            F.when(
                within, F.date_format("prior_click_ts_raw", fmt)
            ).alias("prior_click_ts"),
            within.alias("within_tolerance"),
        )
    )


@query(
    "join_point_in_time_scd2",
    oracle="""
    WITH stream AS (
      SELECT event_id, user_id, ts, event_type,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(FLOOR(value / 25) AS BIGINT) END AS tier_raw
      FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           last_value(tier_raw IGNORE NULLS)
             OVER (PARTITION BY user_id
                   ORDER BY ts, event_type, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS tier_at_click
    FROM stream QUALIFY event_type = 'click'
    """,
)
def join_point_in_time_scd2(spark, sf_dir):
    """Point-in-time dimension join: each click is enriched with the
    user's tier AS OF the click instant, where the tier history is an
    SCD2-style versioned attribute (every purchase opens a new version
    valid until the next purchase; tier = value/25 bucket). The
    data-warehouse temporal join — "which version of the dimension row
    was current when this fact happened" — and the consumer of the
    interval tables ``scd2_event_intervals`` builds.

    Plan: NOT an interval range-join (which re-pairs every fact with
    every candidate version before filtering). The version stream and
    the fact stream UNION into one per-user timeline and a running
    IGNORE NULLS last() carries the current version forward — one
    shuffle on user_id, linear in facts+versions, the same
    engineering as ``join_asof``. Clicks before any purchase surface
    NULL (no version yet), exactly like a fact predating its
    dimension row."""
    e = t(spark, sf_dir, "events")
    stream = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") / 25).cast("long"),
        ).alias("tier_raw"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        stream.withColumn(
            "tier_at_click", F.last("tier_raw", ignorenulls=True).over(w)
        )
        .filter(F.col("event_type") == "click")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", fmt).alias("click_ts"),
            "tier_at_click",
        )
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH stream AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ), anchored AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts, event_type, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prior_ts,
             first_value(CASE WHEN event_type = 'click' THEN ts END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts, event_type, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_ts
      FROM stream
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           strftime(CASE
             WHEN prior_ts IS NULL THEN next_ts
             WHEN next_ts IS NULL THEN prior_ts
             WHEN epoch_us(ts) - epoch_us(prior_ts)
                  <= epoch_us(next_ts) - epoch_us(ts) THEN prior_ts
             ELSE next_ts
           END, '%Y-%m-%d %H:%M:%S.%f') AS nearest_click_ts,
           (prior_ts IS NOT NULL AND (next_ts IS NULL
             OR epoch_us(ts) - epoch_us(prior_ts)
                <= epoch_us(next_ts) - epoch_us(ts))) AS matched_backward
    FROM anchored WHERE event_type = 'purchase'
    """,
)
def join_asof_nearest(spark, sf_dir):
    """As-of join, direction='nearest' (the third pandas merge_asof
    mode): each purchase matches its temporally CLOSEST click — before
    or after — with ties to the earlier one. Completes the as-of
    family (backward ``join_asof``, bounded ``join_asof_tolerance``,
    nearest here); 'nearest' is the alignment rule for sensor fusion
    and quote matching where causality doesn't privilege the past.

    Same single-shuffle engineering as its siblings: one
    user-partitioned sort feeds BOTH anchors (running IGNORE NULLS
    last for the prior click, reversed-frame first for the next), and
    the nearest pick is one integer timestamp comparison — never the
    quadratic candidate-pair form. Purchases at exactly equal
    distance choose the backward anchor (documented, deterministic)."""
    e = t(spark, sf_dir, "events")
    stream = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    back = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    anchored = stream.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(click_ts, ignorenulls=True).over(back).alias("prior_ts"),
        F.first(click_ts, ignorenulls=True).over(fwd).alias("next_ts"),
    )
    d_prior = F.unix_micros("ts") - F.unix_micros("prior_ts")
    d_next = F.unix_micros("next_ts") - F.unix_micros("ts")
    backward = F.col("prior_ts").isNotNull() & (
        F.col("next_ts").isNull() | (d_prior <= d_next)
    )
    nearest = (
        F.when(F.col("prior_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prior_ts"))
        .when(d_prior <= d_next, F.col("prior_ts"))
        .otherwise(F.col("next_ts"))
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return anchored.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.date_format("ts", fmt).alias("purchase_ts"),
        F.date_format(nearest, fmt).alias("nearest_click_ts"),
        backward.alias("matched_backward"),
    )
