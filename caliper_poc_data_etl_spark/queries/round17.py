"""Round-11 ops — the VERDICT r10 residual demands:

- ``stream_outer_join_replay`` — stream-stream LEFT-OUTER join with
  watermark-expiry null-padding: the one production streaming join
  shape missing next to the inner ``stream_join_replay``. Unmatched
  purchases emit with null click columns only when the watermark
  passes the point where a matching click could still arrive (state
  eviction) — a finite replay flushes that trailing state with a
  far-future sentinel (``stage_watermark_flush_source``), so the
  replay equals the batch left join exactly.
- ``curation_repeated_span_dedup`` — suffix-style repeated-substring
  detection (Lee et al. 2021, "Deduplicating Training Data Makes
  Language Models Better"): exact longest-repeated-span flagging via
  sorted k-gram anchors extended and merged in window code — the
  exact big brother of ``curation_span_dedup_rewrite``.

Registry conventions as everywhere (queries/__init__.py docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from caliper_poc_data_etl_spark.queries.registry import query, t

# ---------------------------------------------------------------------------
# Stream-stream LEFT OUTER join with watermark-expiry null padding
# ---------------------------------------------------------------------------

_OUTER_JOIN_ORACLE = """
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           c.event_id AS click_event_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL '30 minutes'
"""


@query("stream_outer_join_replay", oracle=_OUTER_JOIN_ORACLE)
def stream_outer_join_replay(spark, sf_dir):
    """Stream-stream LEFT-OUTER join replay — the conversion-funnel
    shape where the UNMATCHED side is the signal (purchases with no
    preceding click = unattributed conversions): two watermarked
    streams, two-sided time bound (the state-eviction contract, as in
    the inner ``stream_join_replay``), ``leftOuter`` — matched pairs
    emit as they join; an unmatched purchase emits null-padded ONLY
    when the watermark passes purchase_ts, i.e. when no in-bound
    click can still arrive. That emission is literally state
    eviction, which a finite replay's final watermark never reaches
    for the trailing rows — so the replay reads the sentinel-staged
    source (``stage_watermark_flush_source``): one far-future
    click+purchase pair pushes the final watermark past every real
    event, Spark's trailing no-data micro-batches apply it, and the
    output (sentinel rows filtered by timestamp) equals the batch
    LEFT JOIN oracle exactly. The with/without-sentinel contrast — an
    unmatched row appears ONLY after its watermark expires — is
    pinned in tests/test_round17_ops.py.

    Scale shape: identical to the inner join — symmetricHashJoin
    state bounded by the watermark on both sides, partitioned by
    user_id; the sentinel is the Kafka idle-partition heartbeat
    pattern, 2 rows regardless of volume."""
    from caliper_poc_data_etl_spark.streaming import (
        FLUSH_SENTINEL_CUTOFF,
        click_purchase_join,
        read_event_stream,
        replay_to_df,
        stage_watermark_flush_source,
    )

    staged = stage_watermark_flush_source(spark, sf_dir)
    clicks = read_event_stream(spark, staged, glob="*.parquet").filter(
        F.col("event_type") == "click"
    )
    purchases = read_event_stream(spark, staged, glob="*.parquet").filter(
        F.col("event_type") == "purchase"
    )
    joined = click_purchase_join(clicks, purchases, how="leftOuter")
    out = replay_to_df(joined, mode="append")
    # Drop the sentinel-derived rows: formatted purchase_ts compares
    # chronologically as text; real data is ~76 years before the cutoff.
    return out.filter(F.col("purchase_ts") < FLUSH_SENTINEL_CUTOFF)


_FULL_OUTER_JOIN_ORACLE = """
    SELECT p.event_id,
           p.user_id AS p_user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           c.event_id AS click_event_id,
           c.user_id AS c_user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL '30 minutes'
"""


@query("stream_full_outer_join_replay", oracle=_FULL_OUTER_JOIN_ORACLE)
def stream_full_outer_join_replay(spark, sf_dir):
    """Stream-stream FULL-OUTER join replay — completes the streaming
    join family (inner ``stream_join_replay``, left
    ``stream_outer_join_replay``): BOTH unmatched sides null-pad on
    state eviction — unmatched purchases when the watermark passes
    purchase_ts (no in-bound click can still arrive), unmatched
    clicks when it passes click_ts + 30 min (no purchase can still
    reach back). The audit/reconciliation shape: every event accounted
    for exactly once, matched or not. Same sentinel-staged source as
    the left join (the per-side watermarks both advance; trailing
    no-data batches flush both state sides); sentinel rows filter by
    timestamp on WHICHEVER side is non-null. Oracle = batch FULL
    JOIN. Scale shape identical to the inner join: symmetricHashJoin
    state watermark-bounded on both sides."""
    from caliper_poc_data_etl_spark.streaming import (
        FLUSH_SENTINEL_CUTOFF,
        read_event_stream,
        replay_to_df,
        stage_watermark_flush_source,
    )

    staged = stage_watermark_flush_source(spark, sf_dir)
    clicks = (
        read_event_stream(spark, staged, glob="*.parquet")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        read_event_stream(spark, staged, glob="*.parquet")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    cond = (
        (purchases["p_user_id"] == clicks["c_user_id"])
        & (clicks["click_ts"] <= purchases["purchase_ts"])
        & (
            clicks["click_ts"]
            >= purchases["purchase_ts"] - F.expr("INTERVAL 30 minutes")
        )
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    joined = purchases.join(clicks, cond, "fullOuter").select(
        "event_id",
        "p_user_id",
        F.date_format("purchase_ts", fmt).alias("purchase_ts"),
        "click_event_id",
        "c_user_id",
        F.date_format("click_ts", fmt).alias("click_ts"),
    )
    out = replay_to_df(joined, mode="append")
    return out.filter(
        F.coalesce("purchase_ts", "click_ts") < FLUSH_SENTINEL_CUTOFF
    )


# ---------------------------------------------------------------------------
# Suffix-style repeated-span detection (maximal duplicated spans)
# ---------------------------------------------------------------------------

# Anchor gram width shared with the removal stage
# (curation_span_dedup_rewrite) so detect and rewrite agree on what
# counts as a duplicated span.
from caliper_poc_data_etl_spark.queries.round11 import SPAN_K  # noqa: E402


@query(
    "curation_repeated_span_dedup",
    oracle=f"""
    WITH docs AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n_words
      FROM documents
    ),
    ch AS MATERIALIZED (
      SELECT doc_id, u.i AS pos,
             array_to_string(
               list_slice(toks, CAST(u.i + 1 AS INT),
                          CAST(u.i + {SPAN_K} AS INT)), ' ') AS gram
      FROM docs,
           unnest(range(0, CAST(greatest(n_words - {SPAN_K - 1}, 0)
                                AS BIGINT))) AS u(i)
    ),
    dup AS (
      SELECT gram FROM ch GROUP BY gram HAVING COUNT(*) > 1
    ),
    cov AS (
      SELECT DISTINCT c.doc_id, u.j
      FROM ch c JOIN dup USING (gram),
           unnest(range(c.pos, c.pos + {SPAN_K})) AS u(j)
    ),
    flagged AS (
      SELECT doc_id, j,
             CASE WHEN LAG(j) OVER w IS NULL OR j - LAG(j) OVER w > 1
                  THEN 1 ELSE 0 END AS new_run
      FROM cov
      WINDOW w AS (PARTITION BY doc_id ORDER BY j)
    ),
    runs AS (
      SELECT doc_id, j,
             SUM(new_run) OVER (PARTITION BY doc_id ORDER BY j
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS span_seq
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, span_seq, MIN(j) AS start_pos, MAX(j) AS end_pos,
             COUNT(*) AS span_words
      FROM runs GROUP BY doc_id, span_seq
    )
    SELECT s.doc_id,
           CAST(s.span_seq AS BIGINT) AS span_seq,
           CAST(s.start_pos AS BIGINT) AS start_pos,
           CAST(s.end_pos AS BIGINT) AS end_pos,
           CAST(s.span_words AS BIGINT) AS span_words,
           array_to_string(
             list_slice(d.toks, CAST(s.start_pos + 1 AS INT),
                        CAST(s.end_pos + 1 AS INT)), ' ') AS span_text
    FROM spans s JOIN docs d USING (doc_id)
    """,
)
def curation_repeated_span_dedup(spark, sf_dir):
    """Suffix-style repeated-span DETECTION (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" —
    ExactSubstr's find stage): report every MAXIMAL duplicated span
    per document, via sorted k-gram anchors with extend-and-merge.
    A span repeated anywhere in the corpus (length ≥ k = {SPAN_K}
    words) contains a duplicated k-gram at every offset, so flagging
    each duplicated gram's k-word coverage and merging overlapping/
    adjacent coverage into maximal runs reconstructs the maximal
    repeated spans exactly — the fixed-k anchor equivalent of the
    paper's suffix-array longest-match walk, expressible as pure
    dataflow (group-by + window) where a suffix array is not.

    The exact big brother of ``curation_span_dedup_rewrite``: the
    rewrite op removes non-FIRST occurrences (survivorship); this one
    flags ALL occurrences of duplicated material — maximal intervals
    with their text — which is what a curation pipeline reviews or
    strips when the goal is "no k-gram appears twice anywhere",
    memorization-hardening rather than storage dedup. The property
    that removal of the flagged spans leaves NO duplicated k-gram in
    the corpus (grams re-formed within surviving contiguous segments)
    is pinned in tests/test_round17_ops.py.

    Scale shape: same skeleton as the rewrite op — sliding-window
    gram explode (narrow), one map-side-combined groupBy on gram text
    for the >1 count, join back on the same key, coverage explode
    bounded by k× duplicated-anchor count, and per-doc windows for
    the run merge (lag gap flag + running sum = interval merge in two
    scalar window passes over the SAME doc_id partitioning — one
    shuffle serves both plus the final span groupBy)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    toks = F.col("toks")
    docs = d.select("doc_id", "toks", F.size(toks).alias("n_words"))
    grams_arr = F.when(
        F.col("n_words") >= SPAN_K,
        F.transform(
            F.sequence(F.lit(0), F.col("n_words") - SPAN_K),
            lambda i: F.array_join(F.slice(toks, i + 1, SPAN_K), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ch = docs.select(
        "doc_id", F.posexplode(grams_arr).alias("pos", "gram")
    )
    dup = (
        ch.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .select("gram")
    )
    cov = (
        ch.join(dup, "gram")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + SPAN_K - 1)
            ).alias("j"),
        )
        .distinct()
    )
    worder = W.partitionBy("doc_id").orderBy("j")
    wrun = worder.rowsBetween(W.unboundedPreceding, W.currentRow)
    new_run = F.when(
        F.lag("j").over(worder).isNull()
        | (F.col("j") - F.lag("j").over(worder) > 1),
        1,
    ).otherwise(0)
    runs = cov.select(
        "doc_id", "j", F.sum(new_run).over(wrun).alias("span_seq")
    )
    spans = runs.groupBy("doc_id", "span_seq").agg(
        F.min("j").alias("start_pos"),
        F.max("j").alias("end_pos"),
        F.count(F.lit(1)).alias("span_words"),
    )
    return spans.join(docs.select("doc_id", "toks"), "doc_id").select(
        "doc_id",
        F.col("span_seq").cast("long").alias("span_seq"),
        F.col("start_pos").cast("long").alias("start_pos"),
        F.col("end_pos").cast("long").alias("end_pos"),
        F.col("span_words").cast("long").alias("span_words"),
        F.array_join(
            F.slice(
                toks,
                F.col("start_pos").cast("int") + F.lit(1),
                F.col("span_words").cast("int"),
            ),
            " ",
        ).alias("span_text"),
    )
