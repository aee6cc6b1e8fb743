"""Round-5 late additions (the r6 grading queue): distinct-count
sketching, weighted sampling, NB trainer statistics, rolling medians,
referential-integrity auditing, snapshot diffing, audio silence
segmentation, label propagation, streaming SCD2, and embedding
prefix-dimension fidelity.

Everything follows the registry conventions (__init__ docstring):
identical aliases both sides, exact integer/DECIMAL accumulation,
floor-rounding where doubles must be compared cross-engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from caliper_poc_data_etl_spark.queries.registry import query, t

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"

# ---------------------------------------------------------------------------
# KMV (K-minimum-values) distinct-count sketch
# ---------------------------------------------------------------------------

KMV_K = 32
_KMV_SPACE = 1 << 40  # 40-bit hash space: (K-1)*2^40 fits in int64


@query(
    "agg_kmv_distinct_sketch",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 10))::BIGINT
               AS hv
      FROM events
    ), ranked AS (
      SELECT event_type, hv,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS nd
      FROM h
    )
    SELECT event_type,
           CAST(nd AS BIGINT) AS n_exact,
           CAST(hv AS BIGINT) AS kth_hash,
           CAST(CASE WHEN nd <= {KMV_K} THEN nd
                ELSE ({KMV_K - 1} * {_KMV_SPACE}) // hv END AS BIGINT)
             AS est_distinct
    FROM ranked
    WHERE rn = CASE WHEN nd < {KMV_K} THEN nd ELSE {KMV_K} END
    """,
)
def agg_kmv_distinct_sketch(spark, sf_dir):
    """K-minimum-values distinct-count sketch (Bar-Yossef et al.):
    keep the K smallest hash values per group; the Kth smallest
    estimates distinct count as (K-1)/kth_normalized. Unlike
    HyperLogLog (``agg_approx_distinct``, engine-specific and
    rows-only), KMV is engine-portable: both sides hash through the
    same md5 prefix and apply the same integer estimator, so the
    sketch itself is hash-graded — AND the exact distinct count rides
    alongside so the estimate's error is visible in the output.

    Integer-exact estimator: hashes live in a 40-bit space so
    (K-1)*2^40 fits int64 and the estimate is one integer floor
    division — no floating point. Scale shape: the dedupe is a
    map-side-combining groupBy on (group, hash); ranking then touches
    only DISTINCT hashes. A production sketch bounds state at K per
    partition (partial-agg top-K heaps, the ``text_tokenize_vocab_ids``
    recipe); the exact dedupe here is what keeps the oracle twin
    bit-exact while demonstrating the estimator math."""
    e = t(spark, sf_dir, "events")
    hv = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 10), 16, 10).cast(
        "long"
    )
    h = e.select("event_type", hv.alias("hv")).distinct()
    wn = W.partitionBy("event_type").orderBy("hv")
    wall = W.partitionBy("event_type")
    ranked = h.select(
        "event_type",
        "hv",
        F.row_number().over(wn).alias("rn"),
        F.count("*").over(wall).alias("nd"),
    )
    kth = F.when(F.col("nd") < KMV_K, F.col("nd")).otherwise(F.lit(KMV_K))
    est = F.when(F.col("nd") <= KMV_K, F.col("nd")).otherwise(
        F.expr(f"({KMV_K - 1} * CAST({_KMV_SPACE} AS BIGINT)) div hv")
    )
    return ranked.filter(F.col("rn") == kth).select(
        "event_type",
        F.col("nd").cast("long").alias("n_exact"),
        F.col("hv").cast("long").alias("kth_hash"),
        est.cast("long").alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Sequential Poisson (weighted priority) sampling
# ---------------------------------------------------------------------------

SPS_N = 200


@query(
    "sample_sequential_poisson",
    oracle=f"""
    WITH keyed AS (
      SELECT l_orderkey,
             CAST(l_linenumber AS INT) AS l_linenumber,
             CAST(l_quantity AS BIGINT) AS weight,
             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                                 CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT
               AS hv
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, weight,
           CAST(hv // weight AS BIGINT) AS priority
    FROM keyed
    ORDER BY priority, l_orderkey, l_linenumber
    LIMIT {SPS_N}
    """,
)
def sample_sequential_poisson(spark, sf_dir):
    """Weighted (probability-proportional-to-size) sampling by
    sequential Poisson priorities (Ohlsson): each row draws a
    deterministic uniform from its key hash and competes on
    priority = uniform/weight; the N smallest priorities are the
    sample, so heavier rows win proportionally more often. The
    repo-standard deterministic variant: the uniform is a 60-bit md5
    prefix and the priority is one integer floor division — exact on
    both engines, no floating point, reproducible run-to-run.

    Scale shape: priorities are a narrow map-only projection; the
    selection is a global top-N = TakeOrderedAndProject (per-partition
    heaps of N, then one N-row merge on the driver) — no full sort, no
    shuffle of the data. This is the sampling scheme that replaces
    ``ORDER BY rand() LIMIT N`` (non-reproducible, full sort) in
    production pipelines."""
    li = t(spark, sf_dir, "lineitem")
    hv = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "-",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    keyed = li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        F.col("l_quantity").cast("long").alias("weight"),
        hv.alias("hv"),
    )
    return (
        keyed.select(
            "l_orderkey",
            "l_linenumber",
            "weight",
            F.expr("hv div weight").cast("long").alias("priority"),
        )
        .orderBy("priority", "l_orderkey", "l_linenumber")
        .limit(SPS_N)
    )


# ---------------------------------------------------------------------------
# Naive-Bayes trainer statistics
# ---------------------------------------------------------------------------

NB_TOP = 15


@query(
    "ml_naive_bayes_train",
    oracle=f"""
    WITH toks AS (
      SELECT d.lang, tok.t AS token
      FROM documents d,
           unnest(list_filter(
             regexp_split_to_array(lower(d.text), '[^a-z]+'),
             x -> x <> '')) AS tok(t)
    ), vocab AS (
      SELECT COUNT(DISTINCT token) AS v FROM toks
    ), lang_tot AS (
      SELECT lang, COUNT(*) AS tok_total FROM toks GROUP BY lang
    ), docs_tot AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ), n_all AS (
      SELECT COUNT(*) AS n FROM documents
    ), cnts AS (
      SELECT lang, token, COUNT(*) AS cnt FROM toks GROUP BY lang, token
    ), ranked AS (
      SELECT lang, token, cnt,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY cnt DESC, token) AS rn
      FROM cnts
    )
    SELECT r.lang, r.token,
           CAST(r.cnt AS BIGINT) AS cnt,
           CAST(r.cnt + 1 AS BIGINT) AS lik_num,
           CAST(lt.tok_total + vocab.v AS BIGINT) AS lik_den,
           CAST(dt.n_docs AS BIGINT) AS prior_num,
           CAST(n_all.n AS BIGINT) AS prior_den
    FROM ranked r
    JOIN lang_tot lt USING (lang)
    JOIN docs_tot dt USING (lang)
    CROSS JOIN vocab CROSS JOIN n_all
    WHERE r.rn <= {NB_TOP}
    """,
)
def ml_naive_bayes_train(spark, sf_dir):
    """Multinomial naive-Bayes trainer over the document corpus:
    class = ``lang``, features = lowercase word tokens. Emits the
    model's sufficient statistics for the top tokens per class —
    Laplace-smoothed likelihood as an exact integer ratio
    (lik_num/lik_den = (count+1)/(class_tokens+V)) and the class prior
    as doc-count ratios — integers only, so the trained model is
    bit-identical cross-engine (emitting log-probabilities would
    compare libm outputs; the ratio form doesn't).

    Scale shape: token counts are one partial-aggregated explode →
    groupBy; per-class totals and the vocabulary size V are scalar/
    per-class aggregates that ride broadcast joins; the top-N per
    class is a window over already-aggregated (lang, token) counts.
    Nothing holds unaggregated tokens past the first combine."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda x: x != "")
        ).alias("token"),
    )
    cnts = toks.groupBy("lang", "token").agg(F.count("*").alias("cnt"))
    vocab = toks.agg(F.countDistinct("token").alias("v"))
    lang_tot = toks.groupBy("lang").agg(F.count("*").alias("tok_total"))
    docs_tot = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    n_all = d.agg(F.count("*").alias("n"))
    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(F.desc("cnt"), "token")
    )
    return (
        cnts.withColumn("rn", rn)
        .filter(F.col("rn") <= NB_TOP)
        .join(F.broadcast(lang_tot), "lang")
        .join(F.broadcast(docs_tot), "lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_all))
        .select(
            "lang",
            "token",
            F.col("cnt").cast("long").alias("cnt"),
            (F.col("cnt") + 1).cast("long").alias("lik_num"),
            (F.col("tok_total") + F.col("v")).cast("long").alias("lik_den"),
            F.col("n_docs").cast("long").alias("prior_num"),
            F.col("n").cast("long").alias("prior_den"),
        )
    )


# ---------------------------------------------------------------------------
# Exact rolling median over a row frame
# ---------------------------------------------------------------------------

RM_FRAME = 6  # preceding rows; frame = 6 PRECEDING .. CURRENT ROW


@query(
    "window_rolling_median",
    oracle=f"""
    WITH q AS (
      SELECT user_id, event_id, ts,
             CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS vq
      FROM events
    ), fr AS (
      SELECT user_id, event_id, ts,
             list_sort(list(vq) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {RM_FRAME} PRECEDING AND CURRENT ROW)) AS lst
      FROM q
    )
    SELECT user_id, event_id,
           strftime(ts, '{_TS_FMT_DUCK}') AS ts_s,
           CAST(len(lst) AS INT) AS n_frame,
           CAST(CASE WHEN len(lst) % 2 = 1
                THEN 2 * lst[(len(lst) + 1) // 2]
                ELSE lst[len(lst) // 2] + lst[len(lst) // 2 + 1]
           END AS BIGINT) AS med2_micro
    FROM fr
    """,
)
def window_rolling_median(spark, sf_dir):
    """Exact moving median of the event value over a trailing 7-row
    frame per user — the robust-smoothing primitive (a moving average
    distorts under spikes; the median doesn't). Spark has no exact
    percentile over a moving frame, so the frame materializes as a
    collected array, sorts, and indexes — correct because the frame is
    CONSTANT-BOUNDED (7 rows), so per-row state is O(frame), not
    O(partition).

    Cross-engine exactness: values floor-quantize to integer
    micro-units first, and the even-frame median is emitted as the
    SUM of the two middle elements (med2 = 2×median) — integer
    arithmetic end to end, no .5-tie or division divergence. One
    shuffle (hash by user), per-user sort; scales across users."""
    e = t(spark, sf_dir, "events")
    vq = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-RM_FRAME, 0)
    )
    lst = F.sort_array(F.collect_list(vq).over(w))
    n = F.size(F.col("lst"))
    mid_hi = F.floor((n + 1) / 2).cast("int")
    mid_lo = F.floor(n / 2).cast("int")
    med2 = F.when(
        n % 2 == 1, 2 * F.element_at("lst", mid_hi)
    ).otherwise(
        F.element_at("lst", mid_lo) + F.element_at("lst", mid_lo + 1)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.date_format("ts", _TS_FMT_SPARK).alias("ts_s"),
            lst.alias("lst"),
        )
        .select(
            "user_id",
            "event_id",
            "ts_s",
            n.cast("int").alias("n_frame"),
            med2.cast("long").alias("med2_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit
# ---------------------------------------------------------------------------

_FK_EDGES: list[tuple[str, str, str, str, str]] = [
    # (edge label, child table, child key, parent table, parent key)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]


def _ref_edge_sql(label: str, child: str, ck: str, parent: str, pk: str) -> str:
    return f"""
    SELECT '{label}' AS fk_edge,
           CAST(COUNT(*) AS BIGINT) AS n_child,
           CAST(SUM(CASE WHEN c.{ck} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(SUM(CASE WHEN c.{ck} IS NOT NULL AND p.{pk} IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan,
           CAST(COUNT(DISTINCT CASE WHEN c.{ck} IS NOT NULL AND p.{pk} IS NULL
                               THEN c.{ck} END) AS BIGINT) AS n_orphan_keys
    FROM {child} c LEFT JOIN {parent} p ON c.{ck} = p.{pk}"""


def ref_integrity_frame(child_df, ck: str, parent_df, pk: str, label: str):
    """One FK edge's audit row: child rows, NULL keys, orphan rows,
    distinct orphan keys — via a single left join + conditional
    aggregate (exposed for tests to drive with constructed frames)."""
    parent = parent_df.select(F.col(pk).alias("__pk")).distinct()
    joined = child_df.select(F.col(ck).alias("__ck")).join(
        parent, F.col("__ck") == F.col("__pk"), "left"
    )
    orphan = F.col("__ck").isNotNull() & F.col("__pk").isNull()
    return joined.agg(
        F.lit(label).alias("fk_edge"),
        F.count("*").alias("n_child"),
        F.sum(F.when(F.col("__ck").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null"),
        F.sum(F.when(orphan, 1).otherwise(0)).cast("long").alias("n_orphan"),
        F.countDistinct(F.when(orphan, F.col("__ck")))
        .cast("long")
        .alias("n_orphan_keys"),
    ).select("fk_edge", "n_child", "n_null", "n_orphan", "n_orphan_keys")


@query(
    "dq_referential_integrity",
    oracle="\n    UNION ALL\n".join(
        _ref_edge_sql(*edge) for edge in _FK_EDGES
    ),
)
def dq_referential_integrity(spark, sf_dir):
    """Referential-integrity audit across the star schema's FK edges:
    for each child→parent edge, count child rows, NULL keys, orphan
    rows (non-NULL key with no parent), and distinct orphan keys —
    the post-load validation gate every warehouse runs before
    publishing a batch (clean data legitimately reports zeros; the
    query is the gate, not the anomaly).

    Plan: each edge is one left join + conditional aggregate to a
    single row. Dimension parents (nation/customer/supplier/part)
    broadcast under AQE; the fact-fact edge (lineitem→orders) is the
    only real shuffle and co-partitions on the join key. The six
    single-row results union for one output."""
    dfs = {
        name: t(spark, sf_dir, name)
        for name in {"lineitem", "orders", "part", "supplier", "customer", "nation"}
    }
    frames = [
        ref_integrity_frame(dfs[child], ck, dfs[parent], pk, label)
        for label, child, ck, parent, pk in _FK_EDGES
    ]
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out
