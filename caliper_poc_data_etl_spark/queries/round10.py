"""Round-7 additions: categorical-association statistics (Cramér's V,
Cohen's kappa), Allen interval algebra, geohash cell encoding, and a
Zipf rank-frequency fit.

Everything follows the registry conventions (__init__ docstring):
identical aliases on both sides and exact integer arithmetic wherever
a quotient crosses the engine boundary. Where a double is unavoidable
(sqrt/ln), BOTH sides compute the identical IEEE expression shape on
identical inputs and round once at the end — deterministic because
IEEE +,-,*,/,sqrt are correctly rounded (ln differs by <=1 ulp between
libms; every ln here is micro-quantized, putting the rounding boundary
~1e9 ulps away).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from caliper_poc_data_etl_spark.queries.registry import query, t

# ---------------------------------------------------------------------------
# Cramér's V — chi²-based association between two categorical columns
# ---------------------------------------------------------------------------

_CRAMER_CELL_MICRO = """
CAST(ROUND(((CAST(dev AS DOUBLE) / n_x) * (CAST(dev AS DOUBLE) / n_y))
           / n_tot * 1000000) AS BIGINT)
"""


_CRAMER_V_MICRO = """
CASE WHEN least(r_dim, c_dim) <= 1 THEN NULL
     ELSE CAST(ROUND(SQRT((CAST(SUM(cell_chi2_micro) OVER () AS DOUBLE)
                           / 1000000)
                          / (n_tot * (least(r_dim, c_dim) - 1)))
                     * 1000000) AS BIGINT)
END
"""


@query(
    "ml_cramers_v",
    oracle=f"""
    WITH cells AS (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n_obs
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    ),
    margx AS (
      SELECT l_returnflag, SUM(n_obs) AS n_x FROM cells GROUP BY l_returnflag
    ),
    margy AS (
      SELECT l_linestatus, SUM(n_obs) AS n_y FROM cells GROUP BY l_linestatus
    ),
    grid AS (
      SELECT x.l_returnflag, y.l_linestatus, x.n_x, y.n_y,
             COALESCE(c.n_obs, 0) AS n_xy
      FROM margx x CROSS JOIN margy y
      LEFT JOIN cells c ON c.l_returnflag = x.l_returnflag
                       AND c.l_linestatus = y.l_linestatus
    ),
    marg AS (
      SELECT *,
             SUM(n_xy) OVER () AS n_tot,
             COUNT(DISTINCT l_returnflag) OVER () AS r_dim,
             COUNT(DISTINCT l_linestatus) OVER () AS c_dim
      FROM grid
    ),
    dev AS (
      SELECT *, n_xy * n_tot - n_x * n_y AS dev FROM marg
    ),
    cellchi AS (
      SELECT *, {_CRAMER_CELL_MICRO} AS cell_chi2_micro FROM dev
    )
    SELECT l_returnflag, l_linestatus,
           CAST(n_xy AS BIGINT) AS n_xy,
           CAST(n_x AS BIGINT) AS n_x,
           CAST(n_y AS BIGINT) AS n_y,
           CAST(n_tot AS BIGINT) AS n_tot,
           cell_chi2_micro,
           CAST(SUM(cell_chi2_micro) OVER () AS BIGINT) AS chi2_micro,
           {_CRAMER_V_MICRO} AS cramers_v_micro
    FROM cellchi
    """,
)
def ml_cramers_v(spark, sf_dir):
    """Cramér's V association between two categorical columns
    (l_returnflag × l_linestatus) — the curation-time check for
    redundant / leaking categorical features. chi² sums over the FULL
    r×c label grid (marginal cross join + left join of observed
    counts), so structural-zero cells contribute their (0−E)²/E term
    — dropping them understates V on exactly the strongly-associated
    tables this query exists to flag. Per-cell contributions come from
    EXACT integer counts; the single unavoidable double expression
    ``((dev/n_x)·(dev/n_y))/N`` is micro-rounded per cell
    (IEEE-deterministic on both engines) and the total is an exact
    BIGINT sum of those micro integers, so the cross-engine hash is
    stable. V is NULL when min(r,c) = 1 (association undefined for a
    single-category column). Scale shape: the fact table reaches one
    map-side-combined cell group-by; the grid cross join multiplies
    two per-label aggregates bounded by CATEGORY cardinalities (r×c
    rows, broadcast — whitelisted in tools/plan_audit.py), and every
    window runs over that grid. The cell aggregate is branched
    (marginals ×2 + the left join), which Spark may plan as a replayed
    fact scan at this size (2 scans in the audited plan — still
    linear); at 100 TB, stage the r×c cell table once and the rest is
    label-cardinality work."""
    cells = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    margx = cells.groupBy("l_returnflag").agg(F.sum("n_obs").alias("n_x"))
    margy = cells.groupBy("l_linestatus").agg(F.sum("n_obs").alias("n_y"))
    grid = (
        margx.crossJoin(margy)
        .join(cells, ["l_returnflag", "l_linestatus"], "left")
        .select(
            "l_returnflag",
            "l_linestatus",
            "n_x",
            "n_y",
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_xy"),
        )
    )
    wall = W.partitionBy()
    marg = grid.select(
        "*",
        F.sum("n_xy").over(wall).alias("n_tot"),
        F.size(F.collect_set("l_returnflag").over(wall)).alias("r_dim"),
        F.size(F.collect_set("l_linestatus").over(wall)).alias("c_dim"),
    )
    dev = marg.withColumn(
        "dev", F.col("n_xy") * F.col("n_tot") - F.col("n_x") * F.col("n_y")
    )
    cellchi = dev.withColumn(
        "cell_chi2_micro", F.expr(_CRAMER_CELL_MICRO)
    )
    return cellchi.select(
        "l_returnflag",
        "l_linestatus",
        F.col("n_xy").cast("long").alias("n_xy"),
        F.col("n_x").cast("long").alias("n_x"),
        F.col("n_y").cast("long").alias("n_y"),
        F.col("n_tot").cast("long").alias("n_tot"),
        "cell_chi2_micro",
        F.sum("cell_chi2_micro").over(wall).cast("long").alias("chi2_micro"),
        F.expr(_CRAMER_V_MICRO).alias("cramers_v_micro"),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa — inter-rater agreement, exact rational arithmetic
# ---------------------------------------------------------------------------

_KAPPA_BASE = """
  SELECT CASE WHEN l_quantity >= 25 THEN 'H' ELSE 'L' END AS pred,
         CASE WHEN l_extendedprice >= 25000 THEN 'H' ELSE 'L' END AS actual
  FROM lineitem
"""


@query(
    "ml_cohens_kappa",
    oracle=f"""
    WITH base AS ({_KAPPA_BASE}),
    cells AS (
      SELECT pred, actual, COUNT(*) AS n FROM base GROUP BY pred, actual
    ),
    rm_tbl AS (
      SELECT pred AS label, SUM(n) AS rm FROM cells GROUP BY pred
    ),
    cm_tbl AS (
      SELECT actual AS label, SUM(n) AS cm FROM cells GROUP BY actual
    ),
    pe AS (
      SELECT SUM(COALESCE(r.rm, 0) * COALESCE(c.cm, 0)) AS pe_num
      FROM rm_tbl r FULL OUTER JOIN cm_tbl c ON r.label = c.label
    ),
    agg AS (
      SELECT (SELECT SUM(n) FROM cells) AS n_tot,
             (SELECT SUM(CASE WHEN pred = actual THEN n ELSE 0 END)
              FROM cells) AS agree,
             (SELECT pe_num FROM pe) AS pe_num
    )
    SELECT CAST(n_tot AS BIGINT) AS n_tot,
           CAST(agree AS BIGINT) AS agree,
           CAST(pe_num AS BIGINT) AS pe_num,
           CAST(n_tot * agree - pe_num AS BIGINT) AS kappa_num,
           CAST(n_tot * n_tot - pe_num AS BIGINT) AS kappa_den,
           CASE WHEN n_tot * n_tot - pe_num = 0 THEN NULL
                ELSE CAST(ROUND(CAST(n_tot * agree - pe_num AS DOUBLE)
                                * 1000000
                                / CAST(n_tot * n_tot - pe_num AS DOUBLE))
                          AS BIGINT)
           END AS kappa_micro
    FROM agg
    """,
)
def ml_cohens_kappa(spark, sf_dir):
    """Cohen's kappa — chance-corrected agreement between two
    labelers (threshold classifiers over l_quantity and
    l_extendedprice standing in for rater columns) — the standard
    annotation-quality gate for labeled training data. Exact rational
    form: kappa = (N·Σnᵢᵢ − Σ rmₖ·cmₖ) / (N² − Σ rmₖ·cmₖ); numerator
    and denominator are EXACT BIGINTs in the output, the micro-rounded
    quotient is one deterministic double division — NULL when the
    denominator is 0 (both raters constant on one identical label;
    kappa is undefined there, and 0/0 would otherwise diverge across
    engines as NaN). The Σ rmₖ·cmₖ term is built from the row/column
    MARGINAL tables full-outer-joined on label — NOT from diagonal
    cells — so a label with nonzero marginals but an empty (k,k) cell
    still contributes its rmₖ·cmₖ chance term (summing over diagonal
    cells silently drops it and overstates kappa on BOTH engines,
    where the cross-engine hash cannot catch it — ADVICE r7). Scale
    shape: one map-side-combined group-by to the k² cell table
    (4 rows), then label-cardinality marginal aggregates + a 1-row
    cross join of three scalars (whitelisted in plan_audit)."""
    base = t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_quantity") >= 25, "H").otherwise("L").alias("pred"),
        F.when(F.col("l_extendedprice") >= 25000, "H")
        .otherwise("L")
        .alias("actual"),
    )
    cells = base.groupBy("pred", "actual").agg(F.count(F.lit(1)).alias("n"))
    rm_tbl = cells.groupBy(F.col("pred").alias("label")).agg(
        F.sum("n").alias("rm")
    )
    cm_tbl = cells.groupBy(F.col("actual").alias("label")).agg(
        F.sum("n").alias("cm")
    )
    pe = rm_tbl.join(cm_tbl, "label", "full_outer").agg(
        F.sum(
            F.coalesce(F.col("rm"), F.lit(0))
            * F.coalesce(F.col("cm"), F.lit(0))
        ).alias("pe_num")
    )
    diag = F.col("pred") == F.col("actual")
    totals = cells.agg(
        F.sum("n").alias("n_tot"),
        F.sum(F.when(diag, F.col("n")).otherwise(F.lit(0))).alias("agree"),
    )
    agg = totals.crossJoin(pe)
    kappa_num = F.col("n_tot") * F.col("agree") - F.col("pe_num")
    kappa_den = F.col("n_tot") * F.col("n_tot") - F.col("pe_num")
    return agg.select(
        F.col("n_tot").cast("long").alias("n_tot"),
        F.col("agree").cast("long").alias("agree"),
        F.col("pe_num").cast("long").alias("pe_num"),
        kappa_num.cast("long").alias("kappa_num"),
        kappa_den.cast("long").alias("kappa_den"),
        F.when(
            kappa_den == 0, F.lit(None).cast("long")
        )
        .otherwise(
            F.round(
                kappa_num.cast("double") * 1000000 / kappa_den.cast("double")
            ).cast("long")
        )
        .alias("kappa_micro"),
    )


# ---------------------------------------------------------------------------
# Allen interval relations — temporal interval algebra per user
# ---------------------------------------------------------------------------

# The 13 Allen relations, classified with one CASE tree evaluated
# identically on both engines. Order matters: equality cases first
# (equals, meets/met_by, starts/started_by, finishes/finished_by),
# then the strict containment/overlap cases.
_ALLEN_CASE = """
CASE
  WHEN a_s = b_s AND a_e = b_e THEN 'equals'
  WHEN a_e < b_s THEN 'precedes'
  WHEN b_e < a_s THEN 'preceded_by'
  WHEN a_e = b_s THEN 'meets'
  WHEN b_e = a_s THEN 'met_by'
  WHEN a_s = b_s AND a_e < b_e THEN 'starts'
  WHEN a_s = b_s AND a_e > b_e THEN 'started_by'
  WHEN a_e = b_e AND a_s > b_s THEN 'finishes'
  WHEN a_e = b_e AND a_s < b_s THEN 'finished_by'
  WHEN a_s > b_s AND a_e < b_e THEN 'during'
  WHEN a_s < b_s AND a_e > b_e THEN 'contains'
  WHEN a_s < b_s AND a_e < b_e THEN 'overlaps'
  ELSE 'overlapped_by'
END
"""


@query(
    "ts_allen_interval_relations",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_type,
             MIN(ts) AS i_start, MAX(ts) AS i_end
      FROM events GROUP BY user_id, event_type
    ),
    pairs AS (
      SELECT a.user_id, a.event_type AS et_a, b.event_type AS et_b,
             a.i_start AS a_s, a.i_end AS a_e,
             b.i_start AS b_s, b.i_end AS b_e
      FROM iv a JOIN iv b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, et_a, et_b,
           {_ALLEN_CASE} AS relation
    FROM pairs
    """,
)
def ts_allen_interval_relations(spark, sf_dir):
    """Allen's interval algebra — classify every ordered pair of
    per-(user, event_type) activity intervals into one of the 13
    Allen relations (precedes/meets/overlaps/starts/during/finishes/
    equals + inverses), the temporal-reasoning primitive behind
    temporal joins and overlap constraints. Intervals are
    [min(ts), max(ts)] per user × event_type; classification is pure
    timestamp comparison — exact on both engines. Scale shape: one
    map-side-combined group-by builds the interval table, then a
    SELF equi-join on user_id whose per-user fan-out is bounded by
    the event-type cardinality (≤ C(|types|,2) pairs per user, |types|
    = 5 here) — Σ per-user products, never |iv|²; a hot user salts
    like any skewed equi-key."""
    iv = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("i_start"), F.max("ts").alias("i_end"))
    )
    a = iv.select(
        "user_id",
        F.col("event_type").alias("et_a"),
        F.col("i_start").alias("a_s"),
        F.col("i_end").alias("a_e"),
    )
    b = iv.select(
        F.col("user_id").alias("user_id_b"),
        F.col("event_type").alias("et_b"),
        F.col("i_start").alias("b_s"),
        F.col("i_end").alias("b_e"),
    )
    pairs = a.join(
        b,
        (F.col("user_id") == F.col("user_id_b"))
        & (F.col("et_a") < F.col("et_b")),
    )
    return pairs.select(
        F.col("user_id").cast("long").alias("user_id"),
        "et_a",
        "et_b",
        F.expr(_ALLEN_CASE).alias("relation"),
    )


# ---------------------------------------------------------------------------
# Geohash cell encoding — bit-interleaved base32 spatial index key
# ---------------------------------------------------------------------------

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_PRECISION = 5  # 25 bits: 13 longitude + 12 latitude


def _geohash_int_expr(div: str) -> str:
    """The 25-bit interleaved geohash integer from ilon (13 bits) and
    ilat (12 bits), as pure integer div/mod arithmetic. ``div`` is the
    engine's integer-division token ('//' DuckDB, 'div' Spark)."""
    terms = []
    for p in range(25):
        if p % 2 == 0:
            src, k = "ilon", 12 - p // 2
        else:
            src, k = "ilat", 11 - (p - 1) // 2
        terms.append(f"(({src} {div} {2 ** k}) % 2) * {2 ** (24 - p)}")
    return " + ".join(terms)


def _geohash_char_expr(div: str) -> str:
    """Base32 string from the 25-bit integer ``g`` — five substr
    lookups into the geohash alphabet."""
    chars = [
        f"substr('{GEOHASH_ALPHABET}', "
        f"CAST((g {div} {32 ** (4 - j)}) % 32 AS INT) + 1, 1)"
        for j in range(GEOHASH_PRECISION)
    ]
    return "concat(" + ", ".join(chars) + ")"


@query(
    "geo_geohash_encode",
    oracle=f"""
    WITH pts AS (
      SELECT event_id,
             (user_id * 7919) % 18000 - 9000 AS lat_c,
             (event_id * 104729) % 36000 - 18000 AS lon_c
      FROM events
    ),
    cells AS (
      SELECT event_id,
             (lon_c + 18000) * 8192 // 36000 AS ilon,
             (lat_c + 9000) * 4096 // 18000 AS ilat
      FROM pts
    ),
    g AS (
      SELECT event_id, {_geohash_int_expr('//')} AS g FROM cells
    )
    SELECT {_geohash_char_expr('//')} AS geohash,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(MIN(event_id) AS BIGINT) AS min_event_id,
           CAST(MIN(g) AS BIGINT) AS cell_code
    FROM g GROUP BY geohash
    """,
)
def geo_geohash_encode(spark, sf_dir):
    """Geohash encoding — the standard bit-interleaved base32 spatial
    index key (precision 5 = 25 bits, longitude first), over the same
    synthetic centi-degree geography as ``geo_grid_point_in_box``.
    The whole encode is integer div/mod arithmetic GENERATED once and
    rendered for each engine's integer-division token, so the
    cross-engine hash is exact; no UDF, fully inside whole-stage
    codegen. Assumes nonnegative user_id/event_id (sign-preserving %
    would push lat_c/lon_c out of range, and DuckDB // floors while
    Spark div truncates on negative operands) — pinned against the
    fixtures in tests/test_advice_r8_fixes.py (ADVICE r7). Geohash prefixes are the production spatial-join /
    dedup-bucketing key: equal prefixes ⇒ nearby (the Z-order curve
    ``fn_zorder_key`` generalizes). Scale shape: map-only encode +
    one map-side-combined group-by on the cell key."""
    pts = t(spark, sf_dir, "events").select(
        "event_id",
        ((F.col("user_id") * 7919) % 18000 - 9000).alias("lat_c"),
        ((F.col("event_id") * 104729) % 36000 - 18000).alias("lon_c"),
    )
    cells = pts.select(
        "event_id",
        F.expr("(lon_c + 18000) * 8192 div 36000").alias("ilon"),
        F.expr("(lat_c + 9000) * 4096 div 18000").alias("ilat"),
    )
    g = cells.select(
        "event_id", F.expr(_geohash_int_expr("div")).alias("g")
    )
    return (
        g.select(F.expr(_geohash_char_expr("div")).alias("geohash"), "event_id", "g")
        .groupBy("geohash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.min("event_id").cast("long").alias("min_event_id"),
            F.min("g").cast("long").alias("cell_code"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit — OLS slope in log-log space
# ---------------------------------------------------------------------------

ZIPF_TOP_N = 200


@query(
    "text_zipf_slope",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    freq AS (
      SELECT tok, COUNT(*) AS f FROM tok WHERE tok <> '' GROUP BY tok
    ),
    ranked AS (
      SELECT tok, f,
             ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS rnk
      FROM freq
    ),
    pts AS (
      SELECT CAST(ROUND(ln(CAST(rnk AS DOUBLE)) * 1000000) AS BIGINT) AS x,
             CAST(ROUND(ln(CAST(f AS DOUBLE)) * 1000000) AS BIGINT) AS y
      FROM ranked WHERE rnk <= {ZIPF_TOP_N}
    ),
    s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           CAST(sx AS BIGINT) AS sum_lnrank_micro,
           CAST(sy AS BIGINT) AS sum_lnfreq_micro,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE) * 1000000
                                / CAST(n * sxx - sx * sx AS DOUBLE))
                          AS BIGINT)
           END AS slope_micro,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(ROUND((CAST(sy AS DOUBLE)
                                 - (CAST(n * sxy - sx * sy AS DOUBLE)
                                    / CAST(n * sxx - sx * sx AS DOUBLE))
                                   * CAST(sx AS DOUBLE)) / n)
                          AS BIGINT)
           END AS intercept_micro
    FROM s
    """,
)
def text_zipf_slope(spark, sf_dir):
    """Zipf's-law fit over the corpus token frequencies — OLS slope
    and intercept in log-log (rank, frequency) space, the classic
    corpus-health diagnostic (natural text slopes ≈ −1; synthetic or
    template-heavy corpora flatten). Tokens are whitespace-split
    (the text-family convention); ln(rank) / ln(freq) are
    micro-quantized BIGINTs so every sum is exact integer arithmetic
    — the two closed-form OLS divisions are the only doubles, computed
    with the identical expression shape on both engines (NULL when the
    x-variance denominator is 0, i.e. a single-token vocabulary).
    Bounds: with the top-{ZIPF_TOP_N} cap, n·Σxy ≤ 200·(200·5.3e6·2e7)
    < 2^63 — no overflow. Scale shape: one shuffle for token counts
    (map-side combined), then orderBy().limit({ZIPF_TOP_N}) — Spark's
    TakeOrdered, a parallel per-partition top-k + tiny merge, NOT a
    single-task global-window sort of the whole vocabulary (which
    grows with the corpus) — and the rank window runs over only the
    {ZIPF_TOP_N} surviving rows before a single-row aggregate; the
    corpus scan is map-only."""
    toks = (
        t(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), "\\s+")
            ).alias("tok")
        )
        .filter(F.col("tok") != "")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    top = freq.orderBy(F.col("f").desc(), F.col("tok")).limit(ZIPF_TOP_N)
    ranked = top.select(
        "f",
        F.row_number()
        .over(W.orderBy(F.col("f").desc(), F.col("tok")))
        .alias("rnk"),
    )
    pts = ranked.select(
        F.round(F.log(F.col("rnk").cast("double")) * 1000000)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("f").cast("double")) * 1000000)
        .cast("long")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den_int = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = den_int.cast("double")
    null_long = F.lit(None).cast("long")
    return s.select(
        F.col("n").cast("long").alias("n_points"),
        F.col("sx").cast("long").alias("sum_lnrank_micro"),
        F.col("sy").cast("long").alias("sum_lnfreq_micro"),
        F.when(den_int == 0, null_long)
        .otherwise(F.round(num * 1000000 / den).cast("long"))
        .alias("slope_micro"),
        F.when(den_int == 0, null_long)
        .otherwise(
            F.round(
                (
                    F.col("sy").cast("double")
                    - (num / den) * F.col("sx").cast("double")
                )
                / F.col("n")
            ).cast("long")
        )
        .alias("intercept_micro"),
    )
