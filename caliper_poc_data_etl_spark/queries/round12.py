"""Round-9 additions: mergeable-summary quantile drift (the unbinned
companion to ``ml_ks_two_sample`` / ``ml_psi_drift``), weighted
priority sampling global and per-source (the corpus downsampler the
mixing pack lacked), the MinHash-LSH recall-vs-exact curve (the dedup
family's graded recall evidence, ``sim_ivfpq_recall_vs_exact``'s
sibling), MinHash cross-corpus decontamination (the paraphrase-leak
detector), DSIR-style importance selection (hashed-feature domain
weighting for corpus mixing), and Neyman-optimal stratified sample
allocation (the minimum-variance budget splitter).

Everything follows the registry conventions (__init__ docstring):
identical aliases on both sides, exact integer arithmetic wherever a
quotient crosses the engine boundary, doubles only in identical IEEE
expression shapes (+,-,*,/ are correctly rounded, so identical exact
inputs give bit-identical results on both engines — no transcendental
enters a comparison), md5 as the only cross-engine hash primitive.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from caliper_poc_data_etl_spark.queries.registry import query, t
from caliper_poc_data_etl_spark.queries.round6 import _DRIFT_CUTOFF
from caliper_poc_data_etl_spark.queries.dedup import (
    MERSENNE_P,
    MINHASH_BANDS,
    MINHASH_K,
    _doc_shingle_sets,
    _minhash_coeffs,
)

# ---------------------------------------------------------------------------
# Quantile drift from the mergeable value-count summary
# ---------------------------------------------------------------------------

_QD_MICRO = 1_000_000


@query(
    "ml_quantile_drift",
    oracle=f"""
    WITH q AS (
      SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS centi,
             o_orderdate < TIMESTAMP '{_DRIFT_CUTOFF}' AS early
      FROM orders WHERE o_totalprice > 0 AND o_orderdate IS NOT NULL
    ),
    vals AS (
      SELECT centi,
             SUM(CASE WHEN early THEN 1 ELSE 0 END) AS n_early,
             SUM(CASE WHEN early THEN 0 ELSE 1 END) AS n_late
      FROM q GROUP BY 1
    ),
    cum AS (
      SELECT centi, n_early, n_late,
             SUM(n_early) OVER (ORDER BY centi) AS ce,
             SUM(n_late) OVER (ORDER BY centi) AS cl,
             SUM(n_early) OVER () AS te,
             SUM(n_late) OVER () AS tl
      FROM vals
    ),
    eq AS (
      SELECT u.q AS decile, centi AS q_early_centi
      FROM (SELECT centi,
                   CAST((10 * (ce - n_early)) // te + 1 AS BIGINT) AS q_lo,
                   CAST(LEAST((10 * ce) // te, 9) AS BIGINT) AS q_hi
            FROM cum),
           unnest(CASE WHEN q_lo <= q_hi
                       THEN range(q_lo, q_hi + 1)
                       ELSE CAST([] AS BIGINT[]) END) AS u(q)
    ),
    lq AS (
      SELECT u.q AS decile, centi AS q_late_centi
      FROM (SELECT centi,
                   CAST((10 * (cl - n_late)) // tl + 1 AS BIGINT) AS q_lo,
                   CAST(LEAST((10 * cl) // tl, 9) AS BIGINT) AS q_hi
            FROM cum),
           unnest(CASE WHEN q_lo <= q_hi
                       THEN range(q_lo, q_hi + 1)
                       ELSE CAST([] AS BIGINT[]) END) AS u(q)
    )
    SELECT CAST(eq.decile AS BIGINT) AS decile,
           CAST(q_early_centi AS BIGINT) AS q_early_centi,
           CAST(q_late_centi AS BIGINT) AS q_late_centi,
           CAST(q_late_centi - q_early_centi AS BIGINT) AS shift_centi,
           CAST(((q_late_centi - q_early_centi) * {_QD_MICRO}
                 - ((((q_late_centi - q_early_centi) * {_QD_MICRO})
                     % q_early_centi + q_early_centi) % q_early_centi))
                // q_early_centi AS BIGINT) AS shift_pct_micro
    FROM eq JOIN lq ON eq.decile = lq.decile
    """,
)
def ml_quantile_drift(spark, sf_dir):
    """Quantile drift between the early/late order-value
    distributions — the UNBINNED companion to ``ml_ks_two_sample``
    (one max statistic) and ``ml_psi_drift`` (log2-binned): all nine
    deciles of both distributions plus the per-decile shift, the
    report a model-monitoring dashboard draws as a Q-Q drift strip.
    The sketch is the centi-quantized (value → count) summary — the
    exact-rank equivalent of a KLL/t-digest mergeable sketch on this
    grid (map-side-combined groupBy partials merge associatively;
    unlike KLL's randomized compaction it is deterministic, which the
    cross-engine hash requires, and the quantization bounds its size
    at any corpus scale). Quantiles are integer rank queries
    (inverted CDF: smallest v with cum ≥ ceil(q·n/10)) computed
    WITHOUT a decile cross join: value v answers exactly the deciles
    q with 10·cum_prev < q·n ≤ 10·cum, so each summary row explodes
    its own (possibly empty) decile range — ceil never materializes
    (the inequality is pre-multiplied through). The relative shift
    uses the floor-division identity (s − pmod(s, d)) div d on both
    engines (shifts go negative; DuckDB // floors, Spark div
    truncates — the ``ts_period_over_period`` recipe). Scale shape:
    one fact scan into a map-side-combined groupBy on the quantized
    value; every window and explode runs over that bounded summary,
    never the corpus."""
    o = t(spark, sf_dir, "orders")
    centi = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    early = F.col("o_orderdate") < F.lit(_DRIFT_CUTOFF).cast("timestamp")
    vals = (
        o.filter((F.col("o_totalprice") > 0) & F.col("o_orderdate").isNotNull())
        .select(centi.alias("centi"), early.alias("early"))
        .groupBy("centi")
        .agg(
            F.sum(F.col("early").cast("int")).alias("n_early"),
            F.sum((~F.col("early")).cast("int")).alias("n_late"),
        )
    )
    w_cum = W.orderBy("centi")
    w_all = W.orderBy("centi").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = vals.select(
        "centi",
        "n_early",
        "n_late",
        F.sum("n_early").over(w_cum).alias("ce"),
        F.sum("n_late").over(w_cum).alias("cl"),
        F.sum("n_early").over(w_all).alias("te"),
        F.sum("n_late").over(w_all).alias("tl"),
    )

    # Both sides' decile claims are emitted from ONE pass over the
    # summary (each row explodes a concat of its early- and late-side
    # decile ranges, tagged by side) and met in a single 9-group
    # aggregate — the first form joined two branches that each
    # re-scanned the fact table (plan_audit showed scans=2; at 100 TB
    # that is a doubled fact scan for a 9-row answer).
    def side_structs(cum_col, n_col, tot_col, side_tag):
        q_lo = F.expr(f"(10 * ({cum_col} - {n_col})) div {tot_col}") + 1
        q_hi = F.least(F.expr(f"(10 * {cum_col}) div {tot_col}"), F.lit(9))
        empty = F.array().cast("array<struct<decile:bigint,side:string>>")
        # Outer guard: a side with zero rows (degenerate all-early /
        # all-late input) must yield no claims WITHOUT evaluating the
        # rank division — ANSI mode turns div-by-zero into a runtime
        # error, and CaseWhen only evaluates the matched branch.
        return F.when(
            F.col(tot_col) > 0,
            F.when(
                q_lo <= q_hi,
                F.transform(
                    F.sequence(q_lo, q_hi),
                    lambda q: F.struct(
                        q.cast("long").alias("decile"),
                        F.lit(side_tag).alias("side"),
                    ),
                ),
            ).otherwise(empty),
        ).otherwise(empty)

    claims = cum.select(
        "centi",
        F.explode(
            F.concat(
                side_structs("ce", "n_early", "te", "e"),
                side_structs("cl", "n_late", "tl", "l"),
            )
        ).alias("claim"),
    )
    both = claims.groupBy(F.col("claim.decile").alias("decile")).agg(
        F.max(F.when(F.col("claim.side") == "e", F.col("centi"))).alias(
            "q_early_centi"
        ),
        F.max(F.when(F.col("claim.side") == "l", F.col("centi"))).alias(
            "q_late_centi"
        ),
    )
    # Inner-join parity with the oracle: a decile claimed by only one
    # side (degenerate all-early / all-late inputs) must vanish, not
    # surface as a NULL-sided row — max() over zero matching claims
    # would otherwise emit 9 NULL rows where both engines' join forms
    # emit 0.
    both = both.where(
        F.col("q_early_centi").isNotNull() & F.col("q_late_centi").isNotNull()
    )
    shift = F.col("q_late_centi") - F.col("q_early_centi")
    return both.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("q_early_centi").cast("long").alias("q_early_centi"),
        F.col("q_late_centi").cast("long").alias("q_late_centi"),
        shift.cast("long").alias("shift_centi"),
        F.expr(
            f"((q_late_centi - q_early_centi) * {_QD_MICRO} "
            f"- pmod((q_late_centi - q_early_centi) * {_QD_MICRO}, "
            f"q_early_centi)) div q_early_centi"
        )
        .cast("long")
        .alias("shift_pct_micro"),
    )


# ---------------------------------------------------------------------------
# Weighted priority sampling (Duffield–Lund–Thorup) — deterministic
# ---------------------------------------------------------------------------

PRIORITY_SAMPLE_K = 100
_U52 = 1 << 52  # md5 13-hex-char prefix → 52 bits, exact in a DOUBLE


@query(
    "sample_weighted_reservoir",
    oracle=f"""
    WITH wdocs AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS weight,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
               + 1 AS u52
      FROM documents
    ),
    pr AS (
      SELECT doc_id, weight, u52,
             (CAST(weight AS DOUBLE) / CAST(u52 AS DOUBLE)) * {_U52}.0
               AS prio
      FROM wdocs
    ),
    top AS (
      SELECT * FROM pr
      ORDER BY prio DESC, doc_id
      LIMIT {PRIORITY_SAMPLE_K + 1}
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY prio DESC, doc_id) AS rn,
             COALESCE(MAX(CASE WHEN rn0 = {PRIORITY_SAMPLE_K + 1}
                                THEN prio END) OVER (), 0.0) AS tau
      FROM (SELECT *,
                   ROW_NUMBER() OVER (ORDER BY prio DESC, doc_id) AS rn0
            FROM top)
    ),
    sampled AS (
      SELECT doc_id, weight, u52, rn,
             CAST(ROUND(GREATEST(CAST(weight AS DOUBLE), tau) * 1000000)
                  AS BIGINT) AS est_micro
      FROM ranked WHERE rn <= {PRIORITY_SAMPLE_K}
    ),
    tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS total_weight FROM wdocs)
    SELECT s.doc_id,
           s.weight,
           CAST(s.u52 AS BIGINT) AS u52,
           CAST(s.rn AS BIGINT) AS prio_rank,
           s.est_micro,
           CAST(SUM(s.est_micro) OVER () AS BIGINT) AS est_total_micro,
           t.total_weight,
           CAST(SUM(s.est_micro) OVER () // t.total_weight AS BIGINT)
             AS est_over_true_micro
    FROM sampled s, tot t
    """,
)
def sample_weighted_reservoir(spark, sf_dir):
    """Weighted reservoir via PRIORITY SAMPLING (Duffield, Lund &
    Thorup 2007) — the standard corpus downsampler the mixing pack
    lacked: sample k documents with probability increasing in weight
    (words per doc), carrying the UNBIASED per-item total-weight
    estimator max(wᵢ, τ) where τ is the (k+1)-th largest priority.
    Deterministic and cross-engine exact: each doc's uniform draw is
    an md5-derived 52-bit integer u (exactly representable in a
    DOUBLE), its priority is w/(u/2^52) computed as (w/u)·2^52 —
    one correctly-rounded IEEE division then an exact power-of-two
    scaling, so both engines produce BIT-IDENTICAL priorities and the
    top-k boundary can never flip (this is why priority sampling is
    chosen over A-ExpJ/A-Res here: their u^(1/w) / ln(u)/w keys go
    through pow/ln, whose last-ulp behavior differs between JVM and
    C libm — a rank-k boundary flip the hash gate would catch but a
    production run would silently suffer). est_over_true_micro grades
    the estimator: Σ max(w, τ) over the sample vs the true Σ w, ≈1e6
    when the sketch is honest (pinned in tests). τ ~ W/k in
    expectation, so est_micro stays far inside BIGINT. Scale shape:
    the top-(k+1) is orderBy+limit → TakeOrderedAndProject
    (per-partition top-k, merged on the driver — the corpus never
    globally sorts and never shuffles); the windows run over the
    bounded (k+1)-row frame; the true total is one map-side-combined
    1-row aggregate broadcast back (whitelisted scalar shape)."""
    d = t(spark, sf_dir, "documents")
    wdocs = d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), "\\s+"))
        .cast("long")
        .alias("weight"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13),
                16,
                10,
            ).cast("long")
            + 1
        ).alias("u52"),
    )
    pr = wdocs.select(
        "*",
        (
            (F.col("weight").cast("double") / F.col("u52").cast("double"))
            * float(_U52)
        ).alias("prio"),
    )
    top = pr.orderBy(F.desc("prio"), "doc_id").limit(PRIORITY_SAMPLE_K + 1)
    w_rank = W.orderBy(F.desc("prio"), "doc_id")
    w_all = W.orderBy(F.desc("prio"), "doc_id").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    ranked = top.select("*", F.row_number().over(w_rank).alias("rn")).select(
        "*",
        F.coalesce(
            F.max(
                F.when(F.col("rn") == PRIORITY_SAMPLE_K + 1, F.col("prio"))
            ).over(w_all),
            F.lit(0.0),
        ).alias("tau"),
    )
    sampled = ranked.filter(F.col("rn") <= PRIORITY_SAMPLE_K).select(
        "doc_id",
        "weight",
        "u52",
        F.col("rn").cast("long").alias("prio_rank"),
        F.round(
            F.greatest(F.col("weight").cast("double"), F.col("tau")) * 1000000
        )
        .cast("long")
        .alias("est_micro"),
    )
    tot = wdocs.agg(F.sum("weight").cast("long").alias("total_weight"))
    w_s = W.orderBy("prio_rank").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return sampled.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "weight",
        "u52",
        "prio_rank",
        "est_micro",
        F.sum("est_micro").over(w_s).cast("long").alias("est_total_micro"),
        "total_weight",
        F.expr("sum(est_micro) over () div total_weight")
        .cast("long")
        .alias("est_over_true_micro"),
    )


# ---------------------------------------------------------------------------
# MinHash-LSH recall vs exact Jaccard — the dedup family's graded curve
# ---------------------------------------------------------------------------

# Mean recall floor for HIGH-SIMILARITY pairs (exact Jaccard >= 0.8,
# the dedup design threshold): with b=16 bands of r=2 rows the
# analytic candidate probability at j=0.8 is 1-(1-0.64)^16 ≈ 1-9e-8,
# so the md5-signature pipeline must catch essentially every
# >=0.8 pair; measured 1000 milli at sf0.001/0.01/0.1.
LSH_RECALL_FLOOR_MILLI = 950


def _band_key_sql() -> str:
    """Band bucket key rendered from the SAME r = K/bands constants
    the Spark side derives — never hardcode the slice width (if
    MINHASH_K changes, a literal `sig[2*b+…]` would silently band
    wrongly on the oracle side only)."""
    r = MINHASH_K // MINHASH_BANDS
    return " || ',' || ".join(
        f"CAST(sig[{r} * u.b + {j + 1}] AS VARCHAR)" for j in range(r)
    )


def _minhash_recall_oracle() -> str:
    perms = ",\n               ".join(
        f"list_min(list_transform(harr, x -> ({a} * x + {b}) % {MERSENNE_P}))"
        for a, b in _minhash_coeffs()
    )
    return f"""
    WITH reps AS MATERIALIZED (
      SELECT MIN(doc_id) AS rep, text, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents
      WHERE len(string_split_regex(trim(text), '\\s+')) >= 3
      GROUP BY text
    ),
    sh AS MATERIALIZED (
      SELECT rep, c,
             list_distinct(list_transform(range(1, len(tk) - 1),
               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shset
      FROM (SELECT rep, c,
                   string_split_regex(trim(text), '\\s+') AS tk
            FROM reps)
    ),
    sigs AS MATERIALIZED (
      SELECT rep, [{perms}] AS sig
      FROM (SELECT rep,
                   list_transform(shset,
                     s -> ('0x' || substr(md5(s), 1, 15))::BIGINT
                          % {MERSENNE_P}) AS harr
            FROM sh)
    ),
    bands AS (
      SELECT rep, u.b AS band,
             {_band_key_sql()} AS bkey
      FROM sigs, unnest(range(0, {MINHASH_BANDS})) AS u(b)
    ),
    cand AS (
      SELECT DISTINCT a.rep AS rep_a, b.rep AS rep_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.rep < b.rep
    ),
    ex AS (SELECT rep, unnest(shset) AS shingle FROM sh),
    sizes AS (SELECT rep, c, len(shset) AS n FROM sh),
    cross_pairs AS (
      SELECT rep_a, rep_b, (i * 10) // u AS decile, w FROM (
        SELECT a.rep AS rep_a, b.rep AS rep_b, COUNT(*) AS i,
               sa.n + sb.n - COUNT(*) AS u, sa.c * sb.c AS w
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.rep < b.rep
        JOIN sizes sa ON sa.rep = a.rep
        JOIN sizes sb ON sb.rep = b.rep
        GROUP BY 1, 2, sa.n, sb.n, sa.c, sb.c
      ) WHERE (i * 10) // u >= 5
    ),
    hits AS (
      SELECT t.decile, t.w AS n_true,
             CASE WHEN cd.rep_a IS NULL THEN 0 ELSE t.w END AS n_caught
      FROM cross_pairs t LEFT JOIN cand cd
        ON cd.rep_a = t.rep_a AND cd.rep_b = t.rep_b
      UNION ALL
      SELECT 10 AS decile, c * (c - 1) // 2 AS n_true,
             c * (c - 1) // 2 AS n_caught
      FROM sizes WHERE c >= 2
    ),
    curve AS (
      SELECT decile, SUM(n_true) AS n_true, SUM(n_caught) AS n_caught
      FROM hits GROUP BY decile
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_true AS BIGINT) AS n_true,
           CAST(n_caught AS BIGINT) AS n_caught,
           CAST((n_caught * 1000) // n_true AS BIGINT) AS recall_milli,
           CAST(SUM(CASE WHEN decile >= 8 THEN n_caught ELSE 0 END) OVER ()
                * 1000
                // SUM(CASE WHEN decile >= 8 THEN n_true ELSE 0 END) OVER ()
                AS BIGINT) AS hi_recall_milli,
           SUM(CASE WHEN decile >= 8 THEN n_caught ELSE 0 END) OVER () * 1000
             // SUM(CASE WHEN decile >= 8 THEN n_true ELSE 0 END) OVER ()
             >= {LSH_RECALL_FLOOR_MILLI} AS meets_floor
    FROM curve
    """


@query("dedup_minhash_recall_vs_exact", oracle=_minhash_recall_oracle())
def dedup_minhash_recall_vs_exact(spark, sf_dir):
    """MinHash-LSH recall-vs-exact CURVE — the dedup family's graded
    quality evidence (``sim_ivfpq_recall_vs_exact``'s sibling; until
    now the LSH recall claim lived only in pytest). Ground truth is
    every pair with exact shingle Jaccard ≥ 0.5, bucketed by integer
    decile (i·10) div (union size) — exact on both engines, no double
    ever compared. Candidates come from the md5-parity MinHash
    signatures (the ``dedup_minhash_md5_parity`` math: same shingles,
    same fixed-seed universal-hash family) banded into
    {MINHASH_BANDS} bands of r={MINHASH_K}//{MINHASH_BANDS}; a band's
    bucket key is the raw signature slice itself (the production path
    xxhash64-compresses the slice to a 64-bit key — identical
    semantics minus a negligible collision probability, and xxhash64
    is not reproducible cross-engine). The output is the LSH S-curve:
    per-decile recall plus the high-similarity (≥0.8, the design
    threshold) aggregate pinned against LSH_RECALL_FLOOR_MILLI —
    analytically 1-(1-j^r)^b ≈ 1-9e-8 at j=0.8. Scale shape: EXACT
    DUPLICATES ARE COLLAPSED FIRST — documents group by text into
    (representative, multiplicity c) and every downstream stage runs
    on distinct texts only, with pair counts expanded algebraically
    (cross-text pairs weigh cₐ·c_b; within-text pairs are C(c,2) at
    decile 10, always caught since identical texts have identical
    signatures) — the curve is EXACTLY the naive all-documents curve
    (pinned against the naive pure-Python replica in pytest) but a
    corpus that is 100 copies of itself costs the same as its
    distinct core instead of 10,000× (the first K=100 soak of the
    naive form filled the host disk on the 24.75M-identical-pair
    truth join; production exact-hash dedup before MinHash is this
    same move). Signatures are map-only per distinct text; candidates
    come from the banded groupBy (Σ bucket², never n²); the exact-
    truth side over distinct texts is the GRADING query, run on a
    monitoring sample in production exactly like
    ``er_blocking_quality_report``'s all-pairs truth. At 100 TB the
    text groupBy would key on md5(text) rather than the raw string —
    identical semantics, 32-byte shuffle keys."""
    d = t(spark, sf_dir, "documents")
    reps = (
        d.filter(F.size(F.split(F.trim(F.col("text")), "\\s+")) >= 3)
        .groupBy("text")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
    )
    # Materialize the distinct-text core: the shingle branch and the
    # multiplicity join both consume `reps`, and the signature, truth-
    # explode, and sizes branches all consume `sets` — without
    # persistence each branch re-ran the full corpus scan + collapse
    # (plan showed scans=3; that recomputation was the whole 100×-data
    # soak growth, since everything downstream is distinct-core-sized).
    # Persisting is the staged-materialization a production dedup
    # pipeline does after exact-hash collapse; the footprint is the
    # distinct core (~5 MB here), never the corpus.
    reps = reps.persist()
    sets = _doc_shingle_sets(reps.select("doc_id", "text")).join(
        reps.select("doc_id", "c"), "doc_id"
    ).persist()
    h = sets.select(
        "doc_id",
        F.transform(
            "shset",
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast(
                "long"
            )
            % MERSENNE_P,
        ).alias("harr"),
    )
    harr = F.col("harr")
    mins = [
        F.array_min(F.transform(harr, lambda x: (a * x + b) % MERSENNE_P))
        for a, b in _minhash_coeffs()
    ]
    sigs = h.select("doc_id", F.array(*mins).alias("sig"))
    r = MINHASH_K // MINHASH_BANDS
    band_keys = F.array(
        *[
            F.concat_ws(
                ",",
                *[
                    F.col("sig").getItem(i * r + j).cast("string")
                    for j in range(r)
                ],
            )
            for i in range(MINHASH_BANDS)
        ]
    )
    bands = sigs.select(
        "doc_id", F.posexplode(band_keys).alias("band", "bkey")
    )
    buckets = (
        bands.groupBy("band", "bkey")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    docs = F.col("docs")
    pair_arrays = F.transform(
        docs,
        lambda x, i: F.transform(
            F.slice(docs, i + 2, F.size(docs)),
            lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
        ),
    )
    cand = (
        buckets.select(F.explode(F.flatten(pair_arrays)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ex = sets.select("doc_id", F.explode("shset").alias("shingle"))
    sizes = sets.select("doc_id", F.size("shset").alias("n"), "c")
    inter = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    cross_pairs = (
        inter.join(
            sizes.select(
                F.col("doc_id").alias("doc_a"),
                F.col("n").alias("na"),
                F.col("c").alias("ca"),
            ),
            "doc_a",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_b"),
                F.col("n").alias("nb"),
                F.col("c").alias("cb"),
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr("(i * 10) div (na + nb - i)").alias("decile"),
            (F.col("ca") * F.col("cb")).alias("w"),
        )
        .filter(F.col("decile") >= 5)
    )
    hits = cross_pairs.join(cand, ["doc_a", "doc_b"], "left").select(
        "decile",
        F.col("w").alias("n_true"),
        F.when(F.col("hit").isNotNull(), F.col("w"))
        .otherwise(F.lit(0))
        .alias("n_caught"),
    ).unionByName(
        sizes.filter(F.col("c") >= 2).select(
            F.lit(10).alias("decile"),
            F.expr("c * (c - 1) div 2").alias("n_true"),
            F.expr("c * (c - 1) div 2").alias("n_caught"),
        )
    )
    curve = hits.groupBy("decile").agg(
        F.sum("n_true").alias("n_true"), F.sum("n_caught").alias("n_caught")
    )
    hi_recall = F.expr(
        "sum(case when decile >= 8 then n_caught else 0 end) over () * 1000 "
        "div sum(case when decile >= 8 then n_true else 0 end) over ()"
    )
    return curve.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("n_true").cast("long").alias("n_true"),
        F.col("n_caught").cast("long").alias("n_caught"),
        F.expr("(n_caught * 1000) div n_true").cast("long").alias(
            "recall_milli"
        ),
        hi_recall.cast("long").alias("hi_recall_milli"),
        (hi_recall >= LSH_RECALL_FLOOR_MILLI).alias("meets_floor"),
    )


# ---------------------------------------------------------------------------
# Per-source weighted priority sampling — the group-wise variant
# ---------------------------------------------------------------------------

PRIORITY_SAMPLE_K_SRC = 10


@query(
    "sample_weighted_reservoir_per_source",
    oracle=f"""
    WITH wdocs AS (
      SELECT source, doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS weight,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
               + 1 AS u52
      FROM documents
    ),
    pr AS (
      SELECT *, (CAST(weight AS DOUBLE) / CAST(u52 AS DOUBLE)) * {_U52}.0
               AS prio
      FROM wdocs
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY prio DESC, doc_id) AS rn
      FROM pr
    ),
    tq AS (
      SELECT *,
             COALESCE(MAX(CASE WHEN rn = {PRIORITY_SAMPLE_K_SRC + 1}
                               THEN prio END)
                      OVER (PARTITION BY source), 0.0) AS tau
      FROM ranked WHERE rn <= {PRIORITY_SAMPLE_K_SRC + 1}
    ),
    sampled AS (
      SELECT source, doc_id, weight, CAST(u52 AS BIGINT) AS u52,
             CAST(rn AS BIGINT) AS prio_rank,
             CAST(ROUND(GREATEST(CAST(weight AS DOUBLE), tau) * 1000000)
                  AS BIGINT) AS est_micro
      FROM tq WHERE rn <= {PRIORITY_SAMPLE_K_SRC}
    ),
    tot AS (
      SELECT source, CAST(SUM(weight) AS BIGINT) AS src_total_weight
      FROM wdocs GROUP BY source
    )
    SELECT s.source, s.doc_id, s.weight, s.u52, s.prio_rank, s.est_micro,
           CAST(SUM(s.est_micro) OVER (PARTITION BY s.source) AS BIGINT)
             AS src_est_total_micro,
           t.src_total_weight,
           CAST(SUM(s.est_micro) OVER (PARTITION BY s.source)
                // t.src_total_weight AS BIGINT) AS est_over_true_micro
    FROM sampled s JOIN tot t ON t.source = s.source
    """,
)
def sample_weighted_reservoir_per_source(spark, sf_dir):
    """Per-SOURCE weighted priority sampling — the group-wise variant
    of ``sample_weighted_reservoir`` (k={PRIORITY_SAMPLE_K_SRC} docs
    per source, weight-proportional within each): the corpus-mixing
    downsampler that keeps every domain represented while still
    favoring heavy documents inside each domain. Same exactness
    recipe as the global variant (md5-derived 52-bit uniforms, one
    correctly-rounded IEEE division, exact power-of-two scale →
    bit-identical cross-engine priorities; per-source τ = the
    (k+1)-th priority; unbiased max(w, τ) per-source total
    estimator). Scale shape: ONE hash exchange on source, then
    per-partition rank-filter (the ``window_rank_topk_per_group``
    pattern — Spark's WindowGroupLimit pushes the rn ≤ k+1 filter
    below the full sort at execution); per-source totals are a
    map-side-combined groupBy joined back on the 20-key dimension —
    plain equi-joins, no NLJ. A pathologically hot source skews the
    rank exchange like any hot group key — salt-and-merge two-phase
    top-k is the documented mitigation, not needed at fixture
    cardinalities."""
    d = t(spark, sf_dir, "documents")
    wdocs = d.select(
        "source",
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), "\\s+"))
        .cast("long")
        .alias("weight"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13),
                16,
                10,
            ).cast("long")
            + 1
        ).alias("u52"),
    )
    pr = wdocs.select(
        "*",
        (
            (F.col("weight").cast("double") / F.col("u52").cast("double"))
            * float(_U52)
        ).alias("prio"),
    )
    w_rank = W.partitionBy("source").orderBy(F.desc("prio"), "doc_id")
    w_src = (
        W.partitionBy("source")
        .orderBy(F.desc("prio"), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    ranked = pr.select("*", F.row_number().over(w_rank).alias("rn")).filter(
        F.col("rn") <= PRIORITY_SAMPLE_K_SRC + 1
    )
    tq = ranked.select(
        "*",
        F.coalesce(
            F.max(
                F.when(
                    F.col("rn") == PRIORITY_SAMPLE_K_SRC + 1, F.col("prio")
                )
            ).over(w_src),
            F.lit(0.0),
        ).alias("tau"),
    )
    sampled = tq.filter(F.col("rn") <= PRIORITY_SAMPLE_K_SRC).select(
        "source",
        "doc_id",
        "weight",
        "u52",
        F.col("rn").cast("long").alias("prio_rank"),
        F.round(
            F.greatest(F.col("weight").cast("double"), F.col("tau")) * 1000000
        )
        .cast("long")
        .alias("est_micro"),
    )
    tot = wdocs.groupBy("source").agg(
        F.sum("weight").cast("long").alias("src_total_weight")
    )
    w_est = W.partitionBy("source").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return sampled.join(tot, "source").select(
        "source",
        "doc_id",
        "weight",
        "u52",
        "prio_rank",
        "est_micro",
        F.sum("est_micro").over(w_est).cast("long").alias(
            "src_est_total_micro"
        ),
        "src_total_weight",
        F.expr(
            "sum(est_micro) over (partition by source) div src_total_weight"
        )
        .cast("long")
        .alias("est_over_true_micro"),
    )


# ---------------------------------------------------------------------------
# Cross-corpus fuzzy decontamination via MinHash-LSH
# ---------------------------------------------------------------------------

DECONTAM_EVAL_MOD = 31  # ~3% deterministic held-out eval sample
DECONTAM_JACC_MILLI = 500  # recall-oriented: looser than dedup's 0.8


def _decontam_minhash_oracle() -> str:
    perms = ",\n               ".join(
        f"list_min(list_transform(harr, x -> ({a} * x + {b}) % {MERSENNE_P}))"
        for a, b in _minhash_coeffs()
    )
    return f"""
    WITH sh AS MATERIALIZED (
      SELECT doc_id, doc_id % {DECONTAM_EVAL_MOD} = 0 AS is_eval,
             list_distinct(list_transform(range(1, len(tk) - 1),
               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shset
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
            FROM documents)
      WHERE len(tk) >= 3
    ),
    sigs AS MATERIALIZED (
      SELECT doc_id, is_eval, [{perms}] AS sig
      FROM (SELECT doc_id, is_eval,
                   list_transform(shset,
                     s -> ('0x' || substr(md5(s), 1, 15))::BIGINT
                          % {MERSENNE_P}) AS harr
            FROM sh)
    ),
    bands AS (
      SELECT doc_id, is_eval, u.b AS band,
             {_band_key_sql()} AS bkey
      FROM sigs, unnest(range(0, {MINHASH_BANDS})) AS u(b)
    ),
    cand AS (
      SELECT DISTINCT tr.doc_id AS train_id, ev.doc_id AS eval_id
      FROM bands tr JOIN bands ev
        ON tr.band = ev.band AND tr.bkey = ev.bkey
       AND NOT tr.is_eval AND ev.is_eval
    ),
    verified AS (
      SELECT c.train_id, c.eval_id,
             (len(list_intersect(a.shset, b.shset)) * 1000)
               // (len(a.shset) + len(b.shset)
                   - len(list_intersect(a.shset, b.shset))) AS jacc_milli
      FROM cand c
      JOIN sh a ON a.doc_id = c.train_id
      JOIN sh b ON b.doc_id = c.eval_id
    ),
    flagged AS (
      SELECT train_id, eval_id, jacc_milli,
             ROW_NUMBER() OVER (PARTITION BY train_id
                                ORDER BY jacc_milli DESC, eval_id) AS rk,
             COUNT(*) OVER (PARTITION BY train_id) AS n_eval_matches
      FROM verified WHERE jacc_milli >= {DECONTAM_JACC_MILLI}
    )
    SELECT train_id AS doc_id,
           CAST(n_eval_matches AS BIGINT) AS n_eval_matches,
           eval_id AS best_eval_id,
           CAST(jacc_milli AS BIGINT) AS best_jacc_milli
    FROM flagged WHERE rk = 1
    """


@query("decontam_minhash_crosscorpus", oracle=_decontam_minhash_oracle())
def decontam_minhash_crosscorpus(spark, sf_dir):
    """Cross-corpus FUZZY decontamination — the near-dup variant the
    decontamination pack lacked (``decontam_ngram_overlap`` /
    ``decontam_exact_substring`` / ``decontam_bloom_ngram`` all catch
    verbatim or n-gram-exact leakage; paraphrased eval contamination
    needs MinHash): flag every training document whose md5-parity
    MinHash signature shares a band with any held-out eval document
    (doc_id % {DECONTAM_EVAL_MOD} = 0, a deterministic ~3% sample
    standing in for the eval suite) AND whose verified exact shingle
    Jaccard against that eval doc is ≥ {DECONTAM_JACC_MILLI}/1000 —
    the looser, recall-oriented threshold decontamination wants (a
    half-overlapping doc leaks; dedup's 0.8 would miss it). Output
    per flagged train doc: match count, best-matching eval doc
    (highest Jaccard, ties to the smallest id), and its exact
    integer-milli Jaccard. Scale shape: signatures map-only per doc;
    the candidate step is a band-key EQUI-join where the eval side is
    eval-suite-sized (broadcastable at any corpus scale); exact
    verification runs on candidates only (array_intersect on the two
    bounded shingle sets), never all train × eval pairs."""
    d = t(spark, sf_dir, "documents")
    flagged_side = F.col("doc_id") % DECONTAM_EVAL_MOD == 0
    sets = _doc_shingle_sets(d).withColumn("is_eval", flagged_side)
    h = sets.select(
        "doc_id",
        "is_eval",
        F.transform(
            "shset",
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast(
                "long"
            )
            % MERSENNE_P,
        ).alias("harr"),
    )
    harr = F.col("harr")
    mins = [
        F.array_min(F.transform(harr, lambda x: (a * x + b) % MERSENNE_P))
        for a, b in _minhash_coeffs()
    ]
    sigs = h.select("doc_id", "is_eval", F.array(*mins).alias("sig"))
    r = MINHASH_K // MINHASH_BANDS
    band_keys = F.array(
        *[
            F.concat_ws(
                ",",
                *[
                    F.col("sig").getItem(i * r + j).cast("string")
                    for j in range(r)
                ],
            )
            for i in range(MINHASH_BANDS)
        ]
    )
    bands = sigs.select(
        "doc_id", "is_eval", F.posexplode(band_keys).alias("band", "bkey")
    )
    ev = bands.filter(F.col("is_eval")).select(
        F.col("doc_id").alias("eval_id"), "band", "bkey"
    )
    tr = bands.filter(~F.col("is_eval")).select(
        F.col("doc_id").alias("train_id"), "band", "bkey"
    )
    cand = (
        tr.join(F.broadcast(ev), ["band", "bkey"])
        .select("train_id", "eval_id")
        .distinct()
    )
    sh_train = sets.select(
        F.col("doc_id").alias("train_id"), F.col("shset").alias("sh_a")
    )
    sh_eval = sets.select(
        F.col("doc_id").alias("eval_id"), F.col("shset").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    verified = (
        cand.join(sh_train, "train_id")
        .join(F.broadcast(sh_eval), "eval_id")
        .select(
            "train_id",
            "eval_id",
            F.expr(
                "(size(array_intersect(sh_a, sh_b)) * 1000) div "
                "(size(sh_a) + size(sh_b) "
                "- size(array_intersect(sh_a, sh_b)))"
            ).alias("jacc_milli"),
        )
        .filter(F.col("jacc_milli") >= DECONTAM_JACC_MILLI)
    )
    w_rk = W.partitionBy("train_id").orderBy(
        F.desc("jacc_milli"), "eval_id"
    )
    w_cnt = W.partitionBy("train_id").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return (
        verified.select(
            "train_id",
            "eval_id",
            "jacc_milli",
            F.row_number().over(w_rk).alias("rk"),
            F.count(F.lit(1)).over(w_cnt).alias("n_eval_matches"),
        )
        .filter(F.col("rk") == 1)
        .select(
            F.col("train_id").alias("doc_id"),
            F.col("n_eval_matches").cast("long").alias("n_eval_matches"),
            F.col("eval_id").alias("best_eval_id"),
            F.col("jacc_milli").cast("long").alias("best_jacc_milli"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR-style importance selection (hashed n-gram importance weights)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 8192  # hashed feature vocabulary (bounded, broadcastable)
DSIR_TOP = 50
_IR_MICRO = 1_000_000
_DSIR_TARGET_LANG = "en"


@query(
    "mix_importance_select",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(u.tok), 1, 13))::BIGINT % {DSIR_BUCKETS}
               AS fid
      FROM documents,
           unnest(string_split_regex(trim(text), '\\s+')) AS u(tok)
    ),
    ratio AS (
      SELECT fid,
             CAST(((SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}'
                             THEN 1 ELSE 0 END) + 1) * {_IR_MICRO})
                  // (COUNT(*) + 1) AS BIGINT) AS r_micro
      FROM toks GROUP BY fid
    ),
    scored AS (
      SELECT t.doc_id,
             CAST(SUM(r.r_micro) AS BIGINT) AS score_micro,
             CAST(COUNT(*) AS BIGINT) AS n_toks
      FROM toks t JOIN ratio r ON t.fid = r.fid
      GROUP BY t.doc_id
    ),
    ranked AS (
      SELECT doc_id, n_toks, score_micro,
             CAST(score_micro // n_toks AS BIGINT) AS mean_ratio_micro,
             ROW_NUMBER() OVER (ORDER BY score_micro // n_toks DESC,
                                         doc_id) AS rk
      FROM scored
    )
    SELECT CAST(rk AS BIGINT) AS rank, doc_id, n_toks, score_micro,
           mean_ratio_micro
    FROM ranked WHERE rk <= {DSIR_TOP}
    """,
)
def mix_importance_select(spark, sf_dir):
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023), linearized for deterministic cross-engine grading: score
    documents by how much their hashed-feature distribution resembles
    a target domain (here ``lang='en'``) relative to the raw pool,
    then keep the top-``DSIR_TOP``. Features are word tokens hashed to
    a ``DSIR_BUCKETS``-ary vocabulary (md5, the house cross-engine
    hash); each feature's importance ratio is the Laplace-smoothed
    occurrence ratio ``(cnt_target+1)·1e6 div (cnt_pool+1)`` — an
    exact positive-integer quotient, so no log-likelihood (ln is
    banned from the engine boundary) and no float ever enters the
    ranking. A document's score is the occurrence-weighted sum of its
    features' ratios; ranking is by per-token MEAN ratio (sum is
    length-biased), ties by doc_id. The published DSIR resamples from
    the weight distribution; this variant selects the head
    deterministically, which is the hash-gradeable equivalent (the
    sampling step is ``sample_weighted_reservoir`` composed on these
    weights). Empty text tokenizes to [''] (weight 1), the
    engine-faithful convention. Scale shape: two scans of the pruned
    (doc_id, lang, text) projection — one builds the ≤8192-row ratio
    dimension (map-side-combined groupBy on fid), which then
    BROADCASTS onto the token stream (no shuffle of the corpus by
    feature — hot stopword features would skew any fid-partitioned
    exchange); the per-doc score is one map-side-combined groupBy and
    the top-50 is TakeOrderedAndProject (never a global sort).
    Max ratio is 1e6 and scores are Σ n_toks·1e6, far inside BIGINT
    at any corpus scale."""
    d = t(spark, sf_dir, "documents")
    fid = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 13), 16, 10).cast("long")
        % DSIR_BUCKETS
    )
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim(F.col("text")), "\\s+")).alias("tok"),
    ).select("doc_id", "lang", fid.alias("fid"))
    # CASE WHEN (not a bare boolean cast): a feature occurring only in
    # NULL-lang documents must count 0 like the oracle's CASE — Spark's
    # sum over all-NULL would be NULL and silently poison r_micro.
    ratio = toks.groupBy("fid").agg(
        F.expr(
            f"((sum(case when lang = '{_DSIR_TARGET_LANG}' "
            f"then 1 else 0 end) + 1) "
            f"* {_IR_MICRO}) div (count(1) + 1)"
        ).alias("r_micro")
    )
    scored = (
        toks.join(F.broadcast(ratio), "fid")
        .groupBy("doc_id")
        .agg(
            F.sum("r_micro").cast("long").alias("score_micro"),
            F.count(F.lit(1)).cast("long").alias("n_toks"),
        )
    )
    mean = F.expr("score_micro div n_toks")
    ranked = scored.select(
        "doc_id",
        "n_toks",
        "score_micro",
        mean.cast("long").alias("mean_ratio_micro"),
    )
    top = ranked.orderBy(
        F.desc("mean_ratio_micro"), "doc_id"
    ).limit(DSIR_TOP)
    w_rk = W.orderBy(F.desc("mean_ratio_micro"), "doc_id")
    return top.select(
        F.row_number().over(w_rk).cast("long").alias("rank"),
        "doc_id",
        "n_toks",
        "score_micro",
        "mean_ratio_micro",
    )


# ---------------------------------------------------------------------------
# Neyman-allocation stratified sampling design
# ---------------------------------------------------------------------------

NEYMAN_K = 1000


@query(
    "sample_neyman_allocation",
    oracle=f"""
    WITH s AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_v,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS sum_v2
      FROM documents GROUP BY lang
    ),
    w AS (
      SELECT lang, n_docs,
             CAST(FLOOR(SQRT(CAST(n_docs * sum_v2 - sum_v * sum_v
                                  AS DOUBLE))) AS BIGINT) AS sigma_n
      FROM s
    ),
    wt AS (
      SELECT lang, n_docs, sigma_n, SUM(sigma_n) OVER () AS w_total
      FROM w
    ),
    alloc AS (
      -- Degenerate guard mirroring the Spark side: all-constant
      -- strata (w_total = 0) emit 0 rows; DuckDB's x // 0 is NULL,
      -- which would otherwise yield NULL-alloc rows the Spark form
      -- never produces.
      SELECT lang, n_docs, sigma_n,
             CAST(({NEYMAN_K} * sigma_n) // w_total AS BIGINT) AS base,
             CAST(({NEYMAN_K} * sigma_n) % w_total AS BIGINT) AS rem
      FROM wt WHERE w_total > 0
    ),
    fill AS (
      SELECT lang, n_docs, sigma_n, base, rem,
             {NEYMAN_K} - SUM(base) OVER () AS leftover,
             ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk
      FROM alloc
    )
    SELECT lang, n_docs, sigma_n,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM fill
    """,
)
def sample_neyman_allocation(spark, sf_dir):
    """Neyman-optimal stratified sample allocation: given a total
    budget of ``NEYMAN_K`` documents and strata = language, allocate
    n_h ∝ N_h·σ_h (minimum-variance allocation for estimating the
    mean of ``n_chars``). Cross-engine exact by two identities:
    N_h·σ_h = √(N_h·Σv² − (Σv)²) exactly (population σ), and IEEE-754
    REQUIRES sqrt to be correctly rounded — unlike ln/pow it is safe
    at the engine boundary, so FLOOR(SQRT(ss)) is bit-identical on
    JVM and C for the same BIGINT ss (both engines first round ss to
    the same DOUBLE). Rounding allocations to integers that sum to
    EXACTLY K uses the largest-remainder (Hamilton) method: floor
    quotas plus one for the strata with the largest remainders, ties
    by lang — deterministic on both engines with truncating division
    on positive operands. Degenerate all-constant strata (Σσ_n = 0)
    emit 0 rows rather than divide by zero (ANSI guard, the
    ``ml_quantile_drift`` precedent). Range pin: ss < 2^63 requires
    N_h·max(v) < 2^31.5 — ~3e8 char-weighted docs per stratum here
    (tested as a fixture pin); bigger corpora quantize v down by a
    power of two first, which scales σ exactly. Scale shape: one
    fact scan into a map-side-combined 5-row groupBy; every window
    runs over the 5-row stratum frame."""
    d = t(spark, sf_dir, "documents")
    s = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_v"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("sum_v2"),
    )
    ss = F.col("n_docs") * F.col("sum_v2") - F.col("sum_v") * F.col("sum_v")
    w = s.select(
        "lang",
        "n_docs",
        F.floor(F.sqrt(ss.cast("double"))).cast("long").alias("sigma_n"),
    )
    w_all = W.orderBy("lang").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    alloc = w.select(
        "lang",
        "n_docs",
        "sigma_n",
        F.sum("sigma_n").over(w_all).alias("w_total"),
    ).where(F.col("w_total") > 0)
    alloc = alloc.select(
        "lang",
        "n_docs",
        "sigma_n",
        F.expr(f"({NEYMAN_K} * sigma_n) div w_total").alias("base"),
        F.expr(f"({NEYMAN_K} * sigma_n) % w_total").alias("rem"),
    )
    w_rk = W.orderBy(F.desc("rem"), "lang")
    fill = alloc.select(
        "*",
        (F.lit(NEYMAN_K) - F.sum("base").over(w_all)).alias("leftover"),
        F.row_number().over(w_rk).alias("rk"),
    )
    return fill.select(
        "lang",
        "n_docs",
        "sigma_n",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )
