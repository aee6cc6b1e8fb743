"""Round-8 additions: corpus-internal duplicated-span exact dedup
(the production stage between winnowing-detect and chunk-rewrite),
the two drift statistics over the ``dq_drift_bins`` partials (exact
two-sample KS, floor-micro PSI), and the Hilbert curve key companion
to ``fn_zorder_key``.

Everything follows the registry conventions (__init__ docstring):
identical aliases on both sides, exact integer arithmetic wherever a
quotient crosses the engine boundary, ln/division doubles computed in
the identical IEEE expression shape on identical exact-integer inputs
and micro-rounded once (the ``text_zipf_slope`` recipe).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from caliper_poc_data_etl_spark.queries.registry import query, t
from caliper_poc_data_etl_spark.queries.round6 import _DRIFT_CUTOFF

# ---------------------------------------------------------------------------
# Corpus-internal duplicated-span exact dedup with document rewrite
# ---------------------------------------------------------------------------

SPAN_K = 8  # span unit: k-word exact grams (Lee et al. use 50 BPE
# tokens on web text; 8 words matches this corpus' ~54-word documents
# and the LD_CHUNK_WORDS granularity of the chunk-rewrite stage)
# Survivorship key = doc_id * _SPAN_IDX_BASE + pos encodes lexicographic
# (doc_id, pos) min as a single BIGINT min. The base bounds the gram
# position, NOT just "by construction": a document with >= base words
# would mis-rank first-occurrence survivorship identically on both
# engines (hash-green yet wrong — ADVICE r8). 1e9 leaves headroom for
# any realistic document (1e9 words ≈ 6 GB of text in one row) while
# doc_id stays < 9.2e9 before BIGINT overflow; a fixture pin in
# tests/test_advice_r9_fixes.py asserts max(n_words) < base at both
# fixture SFs, the nonnegative-id pins' sibling.
_SPAN_IDX_BASE = 1_000_000_000


@query(
    "curation_span_dedup_rewrite",
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
    surv AS (
      SELECT gram, MIN(doc_id * {_SPAN_IDX_BASE} + pos) AS mink
      FROM ch GROUP BY gram
    ),
    rem AS (
      SELECT ch.doc_id, ch.pos
      FROM ch JOIN surv ON ch.gram = surv.gram
      WHERE ch.doc_id * {_SPAN_IDX_BASE} + ch.pos <> surv.mink
    ),
    cov AS (
      SELECT DISTINCT doc_id, u.j
      FROM rem, unnest(range(pos, pos + {SPAN_K})) AS u(j)
    ),
    runs AS (
      SELECT doc_id, COUNT(*) AS n_removed,
             SUM(CASE WHEN prev IS NULL OR j - prev > 1 THEN 1 ELSE 0 END)
               AS n_dup_runs
      FROM (SELECT doc_id, j,
                   LAG(j) OVER (PARTITION BY doc_id ORDER BY j) AS prev
            FROM cov)
      GROUP BY doc_id
    ),
    pos_tbl AS (
      SELECT doc_id, u.j, toks[CAST(u.j + 1 AS INT)] AS w
      FROM docs, unnest(range(0, n_words)) AS u(j)
    ),
    kept AS (
      SELECT p.doc_id, p.j, p.w
      FROM pos_tbl p
      WHERE NOT EXISTS (SELECT 1 FROM cov c
                        WHERE c.doc_id = p.doc_id AND c.j = p.j)
    ),
    ka AS (
      SELECT doc_id, array_to_string(list(w ORDER BY j), ' ') AS new_text
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(d.n_words AS BIGINT) AS n_words,
           CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
           CAST(COALESCE(r.n_dup_runs, 0) AS BIGINT) AS n_dup_runs,
           COALESCE(k.new_text, '') AS new_text
    FROM docs d
    LEFT JOIN runs r ON r.doc_id = d.doc_id
    LEFT JOIN ka k ON k.doc_id = d.doc_id
    """,
)
def curation_span_dedup_rewrite(spark, sf_dir):
    """Corpus-internal duplicated-SPAN exact dedup with document
    rewrite (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better" — the ExactSubstr stage): every {SPAN_K}-
    word gram that occurs more than once corpus-wide keeps only its
    first occurrence (min (doc_id, pos) survivorship); every word
    position covered by a non-surviving duplicated gram is removed and
    each document is reassembled from its surviving words in order.
    This is the production stage between span DETECTION
    (``text_winnowing_fingerprint``) and fixed-boundary chunk rewrite
    (``curation_chunk_dedup_rewrite``): unlike the chunk stage it
    catches duplicated spans at ANY alignment (a doc that is a pure
    concatenation of two earlier docs empties completely — pinned in
    tests), and overlapping removed grams merge into maximal runs
    (``n_dup_runs`` counts them via a per-doc LAG gap scan). Pure
    integer/string ops — exact on both engines. Scale shape: sliding-
    window gram explode (narrow; ``toks`` materialized once per row so
    the regex split is not re-run per element), one hash-partitioned
    groupBy on the gram text for MIN survivorship (map-side combined),
    join back on the same key, position-coverage explode bounded by
    {SPAN_K}× the removed-gram count, distinct + left-anti join on
    (doc_id, position), and per-doc bounded windows/aggregates — never
    all-pairs, no driver collects; a hot gram (stopword run) salts
    like any skewed equi-key."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    toks = F.col("toks")
    n = F.size(toks)
    docs = d.select("doc_id", "toks", n.alias("n_words"))
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
    key = F.col("doc_id") * _SPAN_IDX_BASE + F.col("pos")
    surv = ch.groupBy("gram").agg(F.min(key).alias("mink"))
    rem = ch.join(surv, "gram").filter(key != F.col("mink"))
    cov = rem.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + SPAN_K - 1)
        ).alias("j"),
    ).distinct()
    prev = F.lag("j").over(W.partitionBy("doc_id").orderBy("j"))
    runs = (
        cov.select("doc_id", "j", prev.alias("prev"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_removed"),
            F.sum(
                F.when(
                    F.col("prev").isNull()
                    | (F.col("j") - F.col("prev") > 1),
                    1,
                ).otherwise(0)
            ).alias("n_dup_runs"),
        )
    )
    pos_tbl = docs.select("doc_id", F.posexplode(toks).alias("j", "w"))
    kept = pos_tbl.join(cov, ["doc_id", "j"], "left_anti")
    ka = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("new_text")
    )
    return (
        docs.select("doc_id", "n_words")
        .join(runs, "doc_id", "left")
        .join(ka, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            F.coalesce(F.col("n_removed"), F.lit(0))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("n_dup_runs"), F.lit(0))
            .cast("long")
            .alias("n_dup_runs"),
            F.coalesce(F.col("new_text"), F.lit("")).alias("new_text"),
        )
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov — exact D from cumulative integer counts
# ---------------------------------------------------------------------------


@query(
    "ml_ks_two_sample",
    oracle="""
    WITH vals AS (
      SELECT CAST(ROUND(l_quantity * 100) AS BIGINT) AS v_centi,
             SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_b
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
      GROUP BY 1
    ),
    cum AS (
      SELECT v_centi, n_a, n_b,
             SUM(n_a) OVER (ORDER BY v_centi) AS cum_a,
             SUM(n_b) OVER (ORDER BY v_centi) AS cum_b,
             SUM(n_a) OVER () AS tot_a,
             SUM(n_b) OVER () AS tot_b
      FROM vals
    ),
    dd AS (
      SELECT *, ABS(cum_a * tot_b - cum_b * tot_a) AS diff_scaled
      FROM cum
    )
    SELECT v_centi,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(cum_a AS BIGINT) AS cum_a,
           CAST(cum_b AS BIGINT) AS cum_b,
           CAST(tot_a AS BIGINT) AS tot_a,
           CAST(tot_b AS BIGINT) AS tot_b,
           CAST(diff_scaled AS BIGINT) AS diff_scaled,
           CASE WHEN tot_a = 0 OR tot_b = 0 THEN NULL
                ELSE CAST(ROUND(CAST(MAX(diff_scaled) OVER () AS DOUBLE)
                                * 1000000
                                / (CAST(tot_a AS DOUBLE)
                                   * CAST(tot_b AS DOUBLE)))
                     AS BIGINT)
           END AS ks_d_micro
    FROM dd
    """,
)
def ml_ks_two_sample(spark, sf_dir):
    """Exact two-sample Kolmogorov–Smirnov statistic — the
    distribution-drift gate over the ``dq_drift_bins`` family:
    D = max_v |F_A(v) − F_B(v)| between the l_quantity distributions
    of returnflag populations A and B(='R'). D is computed from
    cumulative INTEGER counts: at every distinct value,
    |cum_a·tot_b − cum_b·tot_a| is an exact BIGINT (D's numerator over
    the common denominator tot_a·tot_b), the max is an exact integer
    max, and the single micro-rounded double division happens once in
    the identical shape on both engines — NULL when either population
    is empty (0/0 would otherwise produce NaN, which Spark casts to a
    value while DuckDB errors — the kappa/PSI NULL-guard class). Overflow bound: cum·tot ≤
    (6e7)² at the K=100 soak — well under 2^63. Output keeps the full
    per-value ECDF table (the drift-report surface) with the global D
    repeated per row. Scale shape: one map-side-combined groupBy on
    the fact collapses to ≤|distinct values| rows (50 here — bounded
    by the measurement's value cardinality, like the ``ml_cramers_v``
    grid); the cumulative windows run over that bounded table only, so
    the unpartitioned ORDER BY window never sees fact-sized data; at
    unbounded-cardinality measures, pre-bin (``dq_drift_bins``) first."""
    li = t(spark, sf_dir, "lineitem")
    vals = (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy(
            F.round(F.col("l_quantity") * 100)
            .cast("long")
            .alias("v_centi")
        )
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "A", 1).otherwise(0)
            ).alias("n_a"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("n_b"),
        )
    )
    w_cum = W.orderBy("v_centi").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.orderBy("v_centi").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = vals.select(
        "v_centi",
        "n_a",
        "n_b",
        F.sum("n_a").over(w_cum).alias("cum_a"),
        F.sum("n_b").over(w_cum).alias("cum_b"),
        F.sum("n_a").over(w_all).alias("tot_a"),
        F.sum("n_b").over(w_all).alias("tot_b"),
    )
    diff = F.abs(
        F.col("cum_a") * F.col("tot_b") - F.col("cum_b") * F.col("tot_a")
    )
    dd = cum.select("*", diff.alias("diff_scaled"))
    return dd.select(
        "v_centi",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("cum_a").cast("long").alias("cum_a"),
        F.col("cum_b").cast("long").alias("cum_b"),
        F.col("tot_a").cast("long").alias("tot_a"),
        F.col("tot_b").cast("long").alias("tot_b"),
        F.col("diff_scaled").cast("long").alias("diff_scaled"),
        F.when(
            (F.col("tot_a") == 0) | (F.col("tot_b") == 0),
            F.lit(None).cast("long"),
        )
        .otherwise(
            F.round(
                F.max("diff_scaled").over(w_all).cast("double")
                * 1000000
                / (
                    F.col("tot_a").cast("double")
                    * F.col("tot_b").cast("double")
                )
            ).cast("long")
        )
        .alias("ks_d_micro"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index — floor-micro PSI with zero-bin guards
# ---------------------------------------------------------------------------


@query(
    "ml_psi_drift",
    oracle=f"""
    WITH q AS (
      SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS centi,
             o_orderdate < TIMESTAMP '{_DRIFT_CUTOFF}' AS early
      FROM orders WHERE o_totalprice > 0 AND o_orderdate IS NOT NULL
    ),
    bins AS (
      SELECT CAST(length(bin(centi)) - 1 AS INT) AS bucket_log2,
             SUM(CASE WHEN early THEN 1 ELSE 0 END) AS n_early,
             SUM(CASE WHEN early THEN 0 ELSE 1 END) AS n_late
      FROM q GROUP BY 1
    ),
    tots AS (
      SELECT *, SUM(n_early) OVER () AS tot_early,
             SUM(n_late) OVER () AS tot_late
      FROM bins
    ),
    terms AS (
      SELECT *,
             CASE WHEN n_early = 0 OR n_late = 0 THEN NULL
                  ELSE CAST(ROUND(ln(CAST(n_early * tot_late AS DOUBLE)
                                     / CAST(n_late * tot_early AS DOUBLE))
                                  * 1000000) AS BIGINT)
             END AS lr_micro
      FROM tots
    ),
    contrib AS (
      SELECT *,
             CASE WHEN lr_micro IS NULL THEN NULL
                  ELSE CAST(ROUND(
                    (CAST(n_early * tot_late - n_late * tot_early AS DOUBLE)
                     / (CAST(tot_early AS DOUBLE) * CAST(tot_late AS DOUBLE)))
                    * lr_micro / 1000000 * 1000000) AS BIGINT)
             END AS term_micro
      FROM terms
    )
    SELECT bucket_log2,
           CAST(n_early AS BIGINT) AS n_early,
           CAST(n_late AS BIGINT) AS n_late,
           CAST(tot_early AS BIGINT) AS tot_early,
           CAST(tot_late AS BIGINT) AS tot_late,
           (n_early = 0 OR n_late = 0) AS zero_bin,
           lr_micro,
           term_micro,
           CAST(SUM(term_micro) OVER () AS BIGINT) AS psi_micro,
           CAST(SUM(CASE WHEN n_early = 0 OR n_late = 0 THEN 1 ELSE 0 END)
                OVER () AS BIGINT) AS n_zero_bins
    FROM contrib
    """,
)
def ml_psi_drift(spark, sf_dir):
    """Population Stability Index over the ``dq_drift_bins`` partials
    — the model-monitoring drift score PSI = Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ)
    between the early/late order-value histograms on shared log2
    buckets. Zero-bin guard applied from day one (the ADVICE-r5/r7
    NULL-guard class): a bin empty on EITHER side has an undefined ln
    ratio — its term is NULL, it is flagged (``zero_bin``) and counted
    (``n_zero_bins``), and ``psi_micro`` sums the defined terms only
    (production practice either drops such bins or re-bins; dropping
    keeps the statistic exact instead of epsilon-dependent). Exactness
    recipe (the ``text_zipf_slope`` one): the ln ratio's argument is a
    single division of EXACT BIGINT cross products, the ln is
    micro-rounded once, the proportion difference
    (n_early·tot_late − n_late·tot_early)/(tot_early·tot_late) is an
    exact-integer-numerator double division, and both engines multiply
    the same two deterministic doubles before one final micro-round;
    psi_micro is then an exact integer sum. Scale shape: identical to
    ``dq_drift_bins`` — one fact scan into a map-side-combined groupBy
    on the derived bucket (≤64 log2 buckets); every window runs over
    that bounded bin table."""
    o = t(spark, sf_dir, "orders")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    early = F.col("o_orderdate") < F.lit(_DRIFT_CUTOFF).cast("timestamp")
    # NULL o_orderdate is excluded EXPLICITLY on both engines (ADVICE
    # r8: the oracle's CASE classified a NULL date as late while
    # Spark's sum skipped the NULL boolean — a row counted on neither
    # side there, on one side here; filtering aligns the semantics).
    q = o.filter(
        (F.col("o_totalprice") > 0) & F.col("o_orderdate").isNotNull()
    ).select(centi.alias("centi"), early.alias("early"))
    bins = q.groupBy(
        (F.length(F.bin("centi")) - 1).cast("int").alias("bucket_log2")
    ).agg(
        F.sum(F.col("early").cast("int")).alias("n_early"),
        F.sum((~F.col("early")).cast("int")).alias("n_late"),
    )
    w_all = W.orderBy("bucket_log2").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    tots = bins.select(
        "*",
        F.sum("n_early").over(w_all).alias("tot_early"),
        F.sum("n_late").over(w_all).alias("tot_late"),
    )
    zero = (F.col("n_early") == 0) | (F.col("n_late") == 0)
    lr_micro = F.when(zero, F.lit(None).cast("long")).otherwise(
        F.round(
            F.log(
                (F.col("n_early") * F.col("tot_late")).cast("double")
                / (F.col("n_late") * F.col("tot_early")).cast("double")
            )
            * 1000000
        ).cast("long")
    )
    terms = tots.select("*", lr_micro.alias("lr_micro"))
    pdiff = (
        F.col("n_early") * F.col("tot_late")
        - F.col("n_late") * F.col("tot_early")
    ).cast("double") / (
        F.col("tot_early").cast("double") * F.col("tot_late").cast("double")
    )
    term_micro = F.when(
        F.col("lr_micro").isNull(), F.lit(None).cast("long")
    ).otherwise(
        F.round(pdiff * F.col("lr_micro") / 1000000 * 1000000).cast("long")
    )
    contrib = terms.select("*", term_micro.alias("term_micro"))
    return contrib.select(
        "bucket_log2",
        F.col("n_early").cast("long").alias("n_early"),
        F.col("n_late").cast("long").alias("n_late"),
        F.col("tot_early").cast("long").alias("tot_early"),
        F.col("tot_late").cast("long").alias("tot_late"),
        zero.alias("zero_bin"),
        "lr_micro",
        "term_micro",
        F.sum("term_micro").over(w_all).cast("long").alias("psi_micro"),
        F.sum(zero.cast("int")).over(w_all).cast("long").alias("n_zero_bins"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection — division-free reflected-walk form
# ---------------------------------------------------------------------------


@query(
    "ts_cusum_page_reflected",
    oracle="""
    WITH daily AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             COUNT(*) AS n_events
      FROM events GROUP BY 1
    ),
    dev AS (
      SELECT day, n_events,
             COUNT(*) OVER () * n_events - SUM(n_events) OVER () AS dev_scaled
      FROM daily
    ),
    walk AS (
      SELECT *,
             SUM(dev_scaled) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_scaled
      FROM dev
    ),
    refl AS (
      SELECT *,
             MIN(cum_scaled) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin,
             MAX(cum_scaled) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
      FROM walk
    ),
    cus AS (
      SELECT day, n_events,
             CAST(dev_scaled AS BIGINT) AS dev_scaled,
             CAST(cum_scaled AS BIGINT) AS cum_scaled,
             CAST(cum_scaled - LEAST(runmin, 0) AS BIGINT)
               AS cusum_pos_scaled,
             CAST(GREATEST(runmax, 0) - cum_scaled AS BIGINT)
               AS cusum_neg_scaled
      FROM refl
    )
    SELECT day,
           CAST(n_events AS BIGINT) AS n_events,
           dev_scaled, cum_scaled, cusum_pos_scaled, cusum_neg_scaled,
           CAST(MAX(cusum_pos_scaled) OVER () AS BIGINT)
             AS cusum_peak_scaled,
           cusum_pos_scaled = MAX(cusum_pos_scaled) OVER () AS is_pos_peak
    FROM cus
    """,
)
def ts_cusum_page_reflected(spark, sf_dir):
    """Page's one-sided CUSUM series (reset-at-zero) over the daily
    event rate — the sequential drift detector that completes this
    round's pack (``ml_ks_two_sample`` / ``ml_psi_drift`` answer "did
    the distribution move between two periods?"; this answers "WHEN
    did the level shift, and is it still elevated?"). Unlike the
    existing ``ts_cusum_changepoint`` (the single argmax of the
    unreset deviation walk), this emits the full RESET statistic
    Sᵢ = max(0, Sᵢ₋₁ + dᵢ) both sides per day — the quantity real
    monitoring alarms threshold on, because the reset forgets history
    before the shift. The textbook recursion
    Sᵢ = max(0, Sᵢ₋₁ + dᵢ) is not a window aggregate, but its Lindley
    reflection identity IS: Sᵢ = Cᵢ − min(0, min_{j≤i} Cⱼ) for the
    running sum Cᵢ (and the downward side mirrors with the running
    max) — so the whole statistic is two cumulative windows over the
    daily table, no recursion, no UDF. Entirely DIVISION-FREE exact
    integer arithmetic: deviations are mean-centered by cross-scaling
    (dev = n_days·nᵢ − Σn, so Σdev = 0 exactly) instead of dividing by
    the day count, and every output is a BIGINT in those scaled units
    — zero doubles anywhere, the strongest cross-engine exactness
    class in the registry. The reflection identity itself is pinned in
    pytest against the direct max(0, S+d) recursion. Scale shape: one
    map-side-combined groupBy collapses the fact table to ≤|calendar
    days| rows; every window (incl. the unpartitioned cumulative ones)
    runs over that bounded table only — the ``ml_ks_two_sample``
    posture; overflow bound n_days·n ≤ 3.7e3·6e7 at the K=100 soak,
    far under 2^63."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w_all = W.orderBy("day").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    w_cum = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    dev = daily.select(
        "day",
        "n_events",
        (
            F.count(F.lit(1)).over(w_all) * F.col("n_events")
            - F.sum("n_events").over(w_all)
        ).alias("dev_scaled"),
    )
    walk = dev.select(
        "*", F.sum("dev_scaled").over(w_cum).alias("cum_scaled")
    )
    refl = walk.select(
        "*",
        F.min("cum_scaled").over(w_cum).alias("runmin"),
        F.max("cum_scaled").over(w_cum).alias("runmax"),
    )
    cus = refl.select(
        "day",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("dev_scaled").cast("long").alias("dev_scaled"),
        F.col("cum_scaled").cast("long").alias("cum_scaled"),
        (F.col("cum_scaled") - F.least(F.col("runmin"), F.lit(0)))
        .cast("long")
        .alias("cusum_pos_scaled"),
        (F.greatest(F.col("runmax"), F.lit(0)) - F.col("cum_scaled"))
        .cast("long")
        .alias("cusum_neg_scaled"),
    )
    peak = F.max("cusum_pos_scaled").over(w_all)
    return cus.select(
        "*",
        peak.cast("long").alias("cusum_peak_scaled"),
        (F.col("cusum_pos_scaled") == peak).alias("is_pos_peak"),
    )


# ---------------------------------------------------------------------------
# Hilbert curve key — the jump-free companion to fn_zorder_key
# ---------------------------------------------------------------------------

HILBERT_BITS = 16


def _hilbert_stage_exprs(s: int, div: str) -> list[str]:
    """One Hilbert xy2d iteration (the classic Wikipedia recurrence)
    at scale ``s``, as pure integer div/mod SQL over the running state
    columns (cx, cy, hd). ``div`` is the engine's integer-division
    token ('//' DuckDB, 'div' Spark). rx/ry are the s-bits of the
    rotated coordinates; the quadrant digit is (3·rx) XOR ry; the
    rotation/reflection updates the running frame.

    The new coordinates are built from the MASKED low parts
    (``cx % s`` / ``cy % s``): the already-consumed high bits are never
    re-read, and masking keeps the ``s-1 − coord`` reflection
    nonnegative (the invariant cx,cy < s holds after each stage, so
    the next stage's ``div s/2 % 2`` reads the true top remaining
    bit). Skipping the mask leaves stale high bits that silently
    corrupt LOWER levels identically on both engines — a class the
    cross-engine hash cannot catch; the pytest replica and the
    adjacency property test pin it instead."""
    rx = f"((cx {div} {s}) % 2)"
    ry = f"((cy {div} {s}) % 2)"
    lx = f"(cx % {s})"
    ly = f"(cy % {s})"
    digit = f"CASE WHEN {rx} = 1 THEN 3 - {ry} ELSE {ry} END"
    new_d = f"hd + {s * s} * ({digit}) AS hd"
    new_x = (
        f"CASE WHEN {ry} = 1 THEN {lx} "
        f"WHEN {rx} = 1 THEN {s - 1} - {ly} ELSE {ly} END AS cx"
    )
    new_y = (
        f"CASE WHEN {ry} = 1 THEN {ly} "
        f"WHEN {rx} = 1 THEN {s - 1} - {lx} ELSE {lx} END AS cy"
    )
    return [new_d, new_x, new_y]


def _hilbert_oracle() -> str:
    stages = []
    prev = "xy"
    for lvl in range(HILBERT_BITS):
        s = 1 << (HILBERT_BITS - 1 - lvl)
        exprs = ", ".join(_hilbert_stage_exprs(s, "//"))
        stages.append(
            f"s{lvl} AS (SELECT o_orderkey, x, y, {exprs} FROM {prev})"
        )
        prev = f"s{lvl}"
    return f"""
    WITH xy AS (
      SELECT o_orderkey,
             o_orderkey % {1 << HILBERT_BITS} AS x,
             CAST(FLOOR(o_totalprice) AS BIGINT) % {1 << HILBERT_BITS} AS y,
             o_orderkey % {1 << HILBERT_BITS} AS cx,
             CAST(FLOOR(o_totalprice) AS BIGINT) % {1 << HILBERT_BITS} AS cy,
             CAST(0 AS BIGINT) AS hd
      FROM orders
    ),
    {', '.join(stages)}
    SELECT o_orderkey, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
           CAST(hd AS BIGINT) AS hkey
    FROM {prev}
    """


@query("fn_hilbert_key", oracle=_hilbert_oracle())
def fn_hilbert_key(spark, sf_dir):
    """Hilbert curve key — map two 16-bit dimensions onto the
    65536×65536 Hilbert curve's position, the locality-clustering
    companion to ``fn_zorder_key`` on the same (o_orderkey,
    o_totalprice) inputs. Unlike Z-order, the Hilbert curve has NO
    jump discontinuities: consecutive curve positions are always
    4-adjacent cells, so range scans over the sorted layout touch
    tighter spatial neighborhoods (the comparative locality metric —
    total Manhattan travel along the curve — is pinned Hilbert <
    Z-order in tests/test_round11_ops.py). The classic xy2d recurrence
    (rotate/reflect per bit level) is unrolled into {HILBERT_BITS}
    chained projections of pure integer div/mod CASE arithmetic,
    GENERATED once and rendered per engine ('div' vs '//'), so the
    cross-engine hash is exact and everything stays inside whole-stage
    codegen; the chain stays 16 separate narrow projections (each
    state column is referenced multiple times by non-cheap CASEs, so
    CollapseProject keeps them — no exponential expression blowup).
    Assumes nonnegative inputs like ``fn_zorder_key`` — pinned against
    both fixture dirs in tests/test_round11_ops.py (the geohash pin's
    sibling: DuckDB // floors, Spark div truncates on negatives). Scale shape: map-only; the clustering
    write is ``repartitionByRange(hkey) + sortWithinPartitions``
    exactly as the Z-order docstring describes."""
    o = t(spark, sf_dir, "orders")
    df = o.selectExpr(
        "o_orderkey",
        f"o_orderkey % {1 << HILBERT_BITS} AS x",
        f"CAST(FLOOR(o_totalprice) AS BIGINT) % {1 << HILBERT_BITS} AS y",
        f"o_orderkey % {1 << HILBERT_BITS} AS cx",
        f"CAST(FLOOR(o_totalprice) AS BIGINT) % {1 << HILBERT_BITS} AS cy",
        "CAST(0 AS BIGINT) AS hd",
    )
    for lvl in range(HILBERT_BITS):
        s = 1 << (HILBERT_BITS - 1 - lvl)
        df = df.selectExpr(
            "o_orderkey", "x", "y", *_hilbert_stage_exprs(s, "div")
        )
    return df.selectExpr(
        "o_orderkey",
        "CAST(x AS BIGINT) AS x",
        "CAST(y AS BIGINT) AS y",
        "CAST(hd AS BIGINT) AS hkey",
    )
