"""Corpus-curation operators for LLM training-data pipelines.

The north star's "operations a large-scale training-data pipeline
would need" beyond dedup/similarity/text-analysis: PII redaction,
repetition-based quality filtering (Gopher-style), deterministic
train/val/test splitting, stratified sampling, weighted source
mixing, and global fuzzy-dedup clustering (connected components over
near-dup pairs).

All batch paths are pure Column expressions (whole-stage codegen; no
Python) except the clustering loop, which is the standard iterative
join/agg idiom (see graph.py). Determinism is load-bearing: splits
and mixes hash stable keys (md5 agrees across engines and runs), so
re-running the pipeline on 100 TB assigns every document the same
split — a requirement for incremental corpus builds.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from caliper_poc_data_etl_spark.queries.dedup import _NGRAM_ORACLE, dedup_ngram_jaccard
from caliper_poc_data_etl_spark.queries.registry import query, t

# Parenthesized (group 1) so regexp_extract_all's default group works
# on both engines. Java regex and RE2 agree on this subset (\d, \b,
# bounded quantifiers, character classes).
EMAIL_RE = r"([A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,})"
PHONE_RE = r"(\b\d{3}-\d{2,6}\b)"
IP_RE = r"(\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b)"


def redact_pii(col):
    """Redacted text Column: emails → <EMAIL>, IPv4 → <IP>, dashed
    phone numbers → <PHONE>. Email first (may contain digits/dots),
    then IP (dotted digit runs), then phone."""
    return F.regexp_replace(
        F.regexp_replace(F.regexp_replace(col, EMAIL_RE, "<EMAIL>"), IP_RE, "<IP>"),
        PHONE_RE,
        "<PHONE>",
    )


@query(
    "text_pii_redact",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com ph 555-01'
                  || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                  || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
               AS raw
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(raw, '{EMAIL_RE}', 1)) AS n_emails,
           len(regexp_extract_all(raw, '{PHONE_RE}', 1)) AS n_phones,
           len(regexp_extract_all(raw, '{IP_RE}', 1))    AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(raw, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{IP_RE}', '<IP>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM synth
    """,
)
def text_pii_redact(spark, sf_dir):
    """PII redaction: emails / phone numbers / IPv4 addresses replaced
    with typed placeholders, plus per-kind match counts (the audit
    columns a compliance pass needs).

    The synthetic corpus contains no PII, so a deterministic PII
    suffix derived from ``doc_id`` is appended first — the redaction
    regexes then do real work and the oracle checks engine parity on
    the full redacted text. Redaction order is email → IP → phone
    (emails can contain digits/dots; IPs must be consumed before the
    phone pattern sees digit runs)."""
    d = t(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ph 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit(" ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    s = d.select("doc_id", raw.alias("raw"))
    redacted = redact_pii(F.col("raw"))
    return s.select(
        "doc_id",
        F.size(F.regexp_extract_all("raw", F.lit(EMAIL_RE))).alias("n_emails"),
        F.size(F.regexp_extract_all("raw", F.lit(PHONE_RE))).alias("n_phones"),
        F.size(F.regexp_extract_all("raw", F.lit(IP_RE))).alias("n_ips"),
        redacted.alias("redacted"),
    )


@query(
    "text_repetition_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
      FROM documents
      WHERE len(string_split_regex(trim(text), '\\s+')) >= 2
    ),
    feats AS (
      SELECT doc_id,
             len(tk) AS n_tokens,
             list_max(list_transform(list_distinct(tk),
                      x -> len(list_filter(tk, y -> y = x)))) AS top_tok_cnt,
             len(list_distinct(tk)) AS n_distinct,
             list_transform(range(1, len(tk)),
                            i -> tk[i] || ' ' || tk[i+1]) AS bg
      FROM toks
    )
    SELECT doc_id,
           ROUND(top_tok_cnt * 1.0 / n_tokens, 4) AS top_token_frac,
           ROUND(1.0 - n_distinct * 1.0 / n_tokens, 4) AS dup_token_ratio,
           ROUND(list_max(list_transform(list_distinct(bg),
                          x -> len(list_filter(bg, y -> y = x))))
                 * 1.0 / len(bg), 4) AS top_bigram_frac,
           (top_tok_cnt * 1.0 / n_tokens) <= 0.2
             AND (1.0 - n_distinct * 1.0 / n_tokens) <= 0.6 AS keep
    FROM feats
    """,
)
def text_repetition_stats(spark, sf_dir):
    """Repetition-based quality signals (Gopher/RefinedWeb-style):
    most-frequent-token fraction, duplicate-token ratio, most-frequent-
    bigram fraction, and a keep gate. All per-row array algebra —
    O(distinct×tokens) per document, zero shuffle, codegen-compiled."""
    d = t(spark, sf_dir, "documents")
    tk = F.col("tk")
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(tk),
            lambda x: F.size(F.filter(tk, lambda y: y == x)),
        )
    )
    bg = F.transform(
        F.sequence(F.lit(1), F.size(tk) - 1),
        lambda i: F.concat_ws(" ", F.element_at(tk, i), F.element_at(tk, i + 1)),
    )
    bgc = F.col("bg")
    top_bg_cnt = F.array_max(
        F.transform(
            F.array_distinct(bgc),
            lambda x: F.size(F.filter(bgc, lambda y: y == x)),
        )
    )
    top_frac = F.col("top_tok_cnt") / F.col("n_tokens")
    dup_ratio = 1.0 - F.col("n_distinct") / F.col("n_tokens")
    return (
        d.select("doc_id", F.split(F.trim(F.col("text")), "\\s+").alias("tk"))
        .filter(F.size(tk) >= 2)
        .select(
            "doc_id",
            F.size(tk).alias("n_tokens"),
            top_cnt.alias("top_tok_cnt"),
            F.size(F.array_distinct(tk)).alias("n_distinct"),
            bg.alias("bg"),
        )
        .select(
            "doc_id",
            F.round(top_frac, 4).alias("top_token_frac"),
            F.round(dup_ratio, 4).alias("dup_token_ratio"),
            F.round(top_bg_cnt / F.size(bgc), 4).alias("top_bigram_frac"),
            ((top_frac <= 0.2) & (dup_ratio <= 0.6)).alias("keep"),
        )
    )


# Hex-prefix thresholds on md5: 'cc' = 204/256 ≈ 0.797 (train),
# 'e6' = 230/256 ≈ 0.898 (val), rest test — the standard
# hash-a-stable-key split that stays identical across runs, engines,
# and incremental corpus additions.
@query(
    "sample_hash_split",
    oracle="""
    SELECT doc_id,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def sample_hash_split(spark, sf_dir):
    """Deterministic train/val/test split (~80/10/10) by hashing the
    stable document key — no RNG, no seed plumbing; a document's split
    never changes as the corpus grows. Pure map stage at 100 TB."""
    d = t(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < "cc", "train")
        .when(bucket < "e6", "val")
        .otherwise("test")
        .alias("split"),
    )


STRATUM_SAMPLE_N = 10


@query(
    "sample_stratified_lang",
    oracle=f"""
    SELECT doc_id, lang, sample_rank FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    ) WHERE sample_rank <= {STRATUM_SAMPLE_N}
    """,
)
def sample_stratified_lang(spark, sf_dir):
    """Stratified sample: exactly N documents per language, chosen by
    hash order (deterministic reservoir). One hash-partitioned window
    per stratum — the skew risk is a giant stratum, which AQE handles;
    for top-N-per-huge-group a partial `rank <= N` pre-filter per
    partition is the known refinement."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= STRATUM_SAMPLE_N)
    )


# Source-mixing tiers: rate by src_num % 4 → 1.0 / 0.5 / 0.25 / 0.1.
# Keep-decision hashes (source, doc_id) so each source's subsample is
# independent and deterministic. '80'=128/256, '40'=64/256,
# '1a'=26/256≈0.102.
@query(
    "mix_weighted_sources",
    oracle="""
    WITH tagged AS (
      SELECT source,
             CAST(regexp_extract(source, 'src(\\d+)', 1) AS INTEGER) % 4 AS tier,
             substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 2) AS b
      FROM documents
    )
    SELECT source,
           CAST(CASE tier WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
                          WHEN 2 THEN 0.25 ELSE 0.1 END AS DOUBLE) AS target_rate,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN tier = 0 OR (tier = 1 AND b < '80')
                          OR (tier = 2 AND b < '40')
                          OR (tier = 3 AND b < '1a')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM tagged
    GROUP BY source, tier
    """,
)
def mix_weighted_sources(spark, sf_dir):
    """Weighted dataset mixing: each source gets a target sampling
    rate; membership is decided by hashing (source, doc_id), so the
    mix is reproducible and incremental. This is the corpus-recipe
    operator (e.g. upweight curated sources, downsample crawl)."""
    d = t(spark, sf_dir, "documents")
    tier = (F.regexp_extract("source", r"src(\d+)", 1).cast("int") % 4).alias("tier")
    b = F.substring(
        F.md5(F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))),
        1,
        2,
    )
    tagged = d.select("source", tier, b.alias("b"))
    keep = (
        (F.col("tier") == 0)
        | ((F.col("tier") == 1) & (F.col("b") < "80"))
        | ((F.col("tier") == 2) & (F.col("b") < "40"))
        | ((F.col("tier") == 3) & (F.col("b") < "1a"))
    )
    rate = (
        F.when(F.col("tier") == 0, 1.0)
        .when(F.col("tier") == 1, 0.5)
        .when(F.col("tier") == 2, 0.25)
        .otherwise(0.1)
    )
    return tagged.groupBy("source", rate.alias("target_rate")).agg(
        F.count("*").alias("n_docs"),
        F.sum(keep.cast("long")).alias("n_kept"),
    )


@query(
    "dedup_cluster_cc",
    oracle=f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({_NGRAM_ORACLE}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach AS (
      SELECT doc_id AS node, doc_id AS comp FROM documents
      UNION
      SELECT e.dst AS node, r.comp
      FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id,
           CAST(MIN(comp) AS BIGINT) AS cluster_rep,
           MIN(comp) = node AS is_keeper
    FROM reach
    GROUP BY node
    """,
)
def dedup_cluster_cc(spark, sf_dir):
    """Global fuzzy-dedup clustering: near-dup pairs (3-gram Jaccard ≥
    0.8, the oracle-parity exact path) → connected components → one
    keeper per transitive duplicate group. This is the stage a
    pairwise dedup is incomplete without: A~B and B~C collapse to one
    keeper even though A~C was never emitted.

    Components via iterative min-label propagation (graph.py) — per
    round one equi-join + one group-by, lineage truncated per round;
    rounds bounded by cluster diameter (near-dup groups are
    near-cliques). Oracle: recursive-CTE reachability closure."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    nodes = t(spark, sf_dir, "documents").select("doc_id")
    from caliper_poc_data_etl_spark.graph import connected_components

    labels = connected_components(
        nodes, pairs, node_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_rep"),
        (F.col("comp") == F.col("node")).alias("is_keeper"),
    )


@query(
    "doc_length_pctl_filter",
    oracle="""
    SELECT d.doc_id, d.n_chars, ROUND(q.p90, 4) AS p90
    FROM documents d
    CROSS JOIN (SELECT quantile_cont(n_chars, 0.9) AS p90 FROM documents) q
    WHERE d.n_chars >= q.p90
    """,
)
def doc_length_pctl_filter(spark, sf_dir):
    """Corpus-relative length filter: keep documents at or above the
    corpus P90 of n_chars — thresholds in curation pipelines are
    usually distribution-relative, not absolute.

    The threshold is a broadcast 1-row aggregate crossJoined into the
    scan (module convention — no driver-side collect). Exact
    ``percentile`` here because the oracle needs bit-parity
    (linear-interpolation semantics match DuckDB's quantile_cont); the
    100 TB substitution is ``approx_percentile`` with the same plan
    shape."""
    d = t(spark, sf_dir, "documents")
    q = d.agg(F.expr("percentile(n_chars, 0.9)").alias("p90"))
    return (
        d.crossJoin(F.broadcast(q))
        .filter(F.col("n_chars") >= F.col("p90"))
        .select("doc_id", "n_chars", F.round("p90", 4).alias("p90"))
    )


@query(
    "curriculum_quality_order",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct,
             length(regexp_replace(text, '[a-zA-Z ]', '', 'g')) * 1.0
               / length(text) AS symbol_ratio
      FROM documents
    ), scored AS (
      SELECT doc_id,
             ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.4
                   + (n_distinct * 1.0 / n_tokens) * 0.4
                   + (1.0 - symbol_ratio) * 0.2, 4) AS quality
      FROM feats
    )
    SELECT doc_id,
           CAST(LEAST(FLOOR(quality * 10), 9) AS INT) AS phase,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY CAST(LEAST(FLOOR(quality * 10), 9) AS INT)
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS seq
    FROM scored
    """,
)
def curriculum_quality_order(spark, sf_dir):
    """Curriculum ordering: bucket documents into quality phases (the
    ``text_quality_score`` composite, value-bucketed into deciles) and
    assign a deterministic shuffled sequence within each phase
    (md5-keyed, so the order is engine- and run-stable) — the
    quality-ascending data ordering used in curriculum training.

    Value-based bucketing (``floor(quality*10)``) instead of
    ``ntile``/``percent_rank`` keeps the phase assignment embarrassingly
    parallel — no global sort anywhere; the only window partitions by
    phase (10 groups — at 100 TB the within-phase sequence would
    instead come from the distributed global-rank construction in
    ``window_ntile``)."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), "\\s+")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    symbol_ratio = F.length(
        F.regexp_replace("text", "[a-zA-Z ]", "")
    ) / F.length("text")
    quality = F.round(
        F.least(n_tokens / 100.0, F.lit(1.0)) * 0.4
        + (n_distinct / n_tokens) * 0.4
        + (1.0 - symbol_ratio) * 0.2,
        4,
    )
    phase = F.least(F.floor(quality * 10), F.lit(9)).cast("int")
    scored = d.select("doc_id", phase.alias("phase"))
    w = W.partitionBy("phase").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return scored.select(
        "doc_id", "phase", F.row_number().over(w).alias("seq")
    )


@query(
    "sample_bernoulli_hash",
    oracle="""
    SELECT doc_id, source FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          % 100 < 10
    """,
)
def sample_bernoulli_hash(spark, sf_dir):
    """Deterministic Bernoulli sampling (p=0.10) by content-free key
    hash: a row is in the sample iff an md5-derived integer of its id
    falls under the rate — reproducible across engines, runs, and
    partitionings (df.sample() is none of those), composable with the
    hash-split operator (same keyed-hash family, disjoint salts), and
    a pure pushdown-friendly filter: no shuffle, no state, no RNG
    seed to ship. The standard down-sampling primitive for corpus
    recipes and eval carve-outs."""
    d = t(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
    return d.filter(h.cast("long") % 100 < 10).select("doc_id", "source")


@query(
    "sample_time_holdout",
    oracle="""
    WITH ranked AS (
      SELECT event_id, user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS r_end,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
    )
    SELECT event_id, user_id,
           CASE WHEN r_end <= CAST(CEIL(n / 5.0) AS BIGINT)
                THEN 'eval' ELSE 'train' END AS split
    FROM ranked
    """,
)
def sample_time_holdout(spark, sf_dir):
    """Temporal train/eval split: each user's most recent ⌈20%⌉ of
    events become the held-out evaluation slice, the rest train — the
    leakage-safe split for anything sequential (a random split lets
    the model train on the future it will be evaluated on). Per-user,
    so every user appears in both slices; deterministic (ts,
    event_id) ordering makes the split reproducible run over run —
    the property that matters when the 100 TB corpus is re-split
    after every ingest.

    One window pass over the user-partitioned sort; compare
    ``sample_hash_split`` (the i.i.d. hash split) — the engine
    declares both split disciplines."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = e.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("r_end"),
        F.count("*").over(W.partitionBy("user_id")).alias("n"),
    )
    split = F.when(
        F.col("r_end") <= F.ceil(F.col("n") / 5.0).cast("long"), "eval"
    ).otherwise("train")
    return ranked.select("event_id", "user_id", split.alias("split"))


_KANON_K = 5


@query(
    "dq_k_anonymity",
    oracle=f"""
    WITH quasi AS (
      SELECT user_id % 10 AS user_bucket, event_type,
             CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(COUNT(*) FILTER (WHERE n < {_KANON_K}) AS BIGINT)
             AS n_violating_classes,
           CAST(SUM(n) FILTER (WHERE n < {_KANON_K}) AS BIGINT)
             AS n_rows_to_suppress,
           CAST(MIN(n) AS BIGINT) AS min_class_size,
           ROUND(COALESCE(SUM(n) FILTER (WHERE n < {_KANON_K}), 0) * 1.0
                 / SUM(n), 6) AS suppression_rate
    FROM quasi
    """,
)
def dq_k_anonymity(spark, sf_dir):
    """k-anonymity audit over a quasi-identifier tuple (user bucket ×
    event type × day): how many equivalence classes fall below k=5,
    how many rows would need suppression before release, and the
    resulting suppression rate — the privacy-governance gate that runs
    before any dataset leaves the boundary, next to
    ``text_pii_redact``'s content-level scrubbing. One hash
    aggregation over the quasi-identifier, one fixed-size rollup —
    privacy auditing at 100 TB costs a groupBy."""
    e = t(spark, sf_dir, "events")
    quasi = e.groupBy(
        (F.col("user_id") % 10).alias("user_bucket"),
        "event_type",
        F.to_date("ts").alias("day"),
    ).agg(F.count("*").alias("n"))
    below = F.col("n") < _KANON_K
    return quasi.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum(below.cast("long")).alias("n_violating_classes"),
        F.sum(F.when(below, F.col("n"))).cast("long").alias("n_rows_to_suppress"),
        F.min("n").cast("long").alias("min_class_size"),
        F.round(
            F.coalesce(F.sum(F.when(below, F.col("n"))), F.lit(0))
            / F.sum("n"),
            6,
        ).alias("suppression_rate"),
    )


_ER_MOD = 7        # every 7th customer spawns a dirty variant record
_ER_BAND = 500     # acctbal blocking band width
_ER_MAXDIST = 3    # levenshtein acceptance threshold


@query(
    "er_blocked_name_match",
    oracle=f"""
    WITH dirty AS (
      SELECT c_custkey AS dirty_id,
             'cust ' || CAST(c_custkey AS VARCHAR) || 'x' AS dirty_name,
             c_nationkey,
             CAST(FLOOR(c_acctbal / {_ER_BAND}) AS BIGINT) AS bal_band
      FROM customer WHERE c_custkey % {_ER_MOD} = 0
    ),
    canon AS (
      SELECT c_custkey,
             'cust ' || CAST(c_custkey AS VARCHAR) AS norm_name,
             c_nationkey,
             CAST(FLOOR(c_acctbal / {_ER_BAND}) AS BIGINT) AS bal_band
      FROM customer
    ),
    scored AS (
      SELECT d.dirty_id, c.c_custkey AS matched_key,
             levenshtein(d.dirty_name, c.norm_name) AS dist
      FROM dirty d JOIN canon c
        ON c.c_nationkey = d.c_nationkey AND c.bal_band = d.bal_band
      WHERE levenshtein(d.dirty_name, c.norm_name) <= {_ER_MAXDIST}
    )
    SELECT dirty_id, matched_key, CAST(dist AS INT) AS dist,
           CAST(rk AS INT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY dirty_id
                                   ORDER BY dist, matched_key) AS rk
      FROM scored
    ) WHERE rk = 1
    """,
)
def er_blocked_name_match(spark, sf_dir):
    """Record linkage (entity resolution): dirty variant records —
    derived deterministically from every 7th customer, name corrupted
    by one trailing character — are matched back to the canonical registry WITHOUT
    any shared key, by the classic three-stage pipeline: NORMALIZE
    (lowercase canonical name form), BLOCK (nation × account-balance
    band — candidate pairs shrink from |dirty|×|canon| to the block
    products), VERIFY (levenshtein ≤ 3, best match per dirty record
    with deterministic tie-break). The missing-workload category this
    closes is data integration: dedupe-across-sources, customer-360
    joins, registry reconciliation.

    Scale shape: blocking is an equi-join on (nation, band) — the ER
    equivalent of LSH banding; the quadratic edit-distance only runs
    inside blocks. Skewed blocks (one giant band) are the hazard —
    AQE skew-join splits them; at 100 TB you'd add a second blocking
    pass on a different key (the multi-pass blocking the LSH ops
    already demonstrate). Levenshtein itself is integer-exact
    cross-engine (proven by fn_string_distance_pack)."""
    c = t(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / _ER_BAND).cast("long")
    dirty = c.filter(F.col("c_custkey") % _ER_MOD == 0).select(
        F.col("c_custkey").alias("dirty_id"),
        F.concat(
            F.lit("cust "), F.col("c_custkey").cast("string"), F.lit("x")
        ).alias("dirty_name"),
        "c_nationkey",
        band.alias("bal_band"),
    )
    canon = c.select(
        "c_custkey",
        F.concat(F.lit("cust "), F.col("c_custkey").cast("string")).alias(
            "norm_name"
        ),
        "c_nationkey",
        band.alias("bal_band"),
    )
    dist = F.levenshtein("dirty_name", "norm_name")
    scored = (
        dirty.join(canon, ["c_nationkey", "bal_band"])
        .withColumn("dist", dist)
        .filter(F.col("dist") <= _ER_MAXDIST)
    )
    rk = F.row_number().over(
        W.partitionBy("dirty_id").orderBy("dist", "c_custkey")
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "dirty_id",
            F.col("c_custkey").alias("matched_key"),
            F.col("dist").cast("int").alias("dist"),
            F.col("rk").cast("int").alias("rk"),
        )
    )
