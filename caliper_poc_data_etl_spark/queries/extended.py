"""Extended operator surface (round-4 queue): scalar/agg/window
families rounding out the SQL closure, plus LLM-pipeline additions.

Everything here follows the registry conventions (__init__ docstring):
identical aliases both sides, DECIMAL money math, BIGINT casts on
DuckDB integer aggregates, string-formatted timestamps.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from caliper_poc_data_etl_spark.queries.registry import query, t


@query(
    "fn_bitwise_pack",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 1365) AS xored,
           o_orderkey << 2 AS shl2,
           o_orderkey >> 3 AS shr3,
           CAST(bit_count(o_orderkey) AS INT) AS popcount
    FROM orders WHERE o_orderkey % 97 = 0
    """,
)
def fn_bitwise_pack(spark, sf_dir):
    """Bitwise scalar pack (& | xor << >> popcount) — the flag-field
    and hash-manipulation toolkit (the SimHash/LSH operators use these
    internally; this declares them as public surface)."""
    k = F.col("o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .filter(k % 97 == 0)
        .select(
            "o_orderkey",
            k.bitwiseAND(F.lit(255)).alias("low_byte"),
            k.bitwiseOR(F.lit(4096)).alias("with_flag"),
            k.bitwiseXOR(F.lit(1365)).alias("xored"),
            F.shiftleft(k, 2).alias("shl2"),
            F.shiftright(k, 3).alias("shr3"),
            F.bit_count(k).alias("popcount"),
        )
    )


@query(
    "agg_bool_pack",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_finished,
           bool_and(o_custkey IS NOT NULL) AS all_have_cust,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_bool_pack(spark, sf_dir):
    """Boolean aggregates (every/any): data-quality assertions as
    single-pass algebraic aggregates — the cheap way to validate an
    invariant over 100 TB without a second filtered count."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.bool_and(F.col("o_custkey").isNotNull()).alias("all_have_cust"),
        F.count("*").alias("n"),
    )


@query(
    "agg_string_agg_ordered",
    oracle="""
    SELECT o_custkey,
           string_agg(o_orderstatus, ',' ORDER BY o_orderkey) AS status_seq,
           COUNT(*) AS n
    FROM orders
    WHERE o_custkey % 50 = 0
    GROUP BY o_custkey
    """,
)
def agg_string_agg_ordered(spark, sf_dir):
    """Ordered string aggregation (LISTAGG/string_agg): the
    order-sensitive concat built from collect_list of (key, value)
    structs + array_sort — deterministic across partitions because the
    sort happens AFTER collection on the struct key, the same
    technique as ``agg_collect_sorted``."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    pair = F.struct(F.col("o_orderkey"), F.col("o_orderstatus"))
    seq = F.concat_ws(
        ",",
        F.transform(
            F.array_sort(F.collect_list(pair)), lambda p: p["o_orderstatus"]
        ),
    )
    return o.groupBy("o_custkey").agg(
        seq.alias("status_seq"), F.count("*").alias("n")
    )


@query(
    "window_locf_fill",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events
    """,
)
def window_locf_fill(spark, sf_dir):
    """Last-observation-carried-forward (IGNORE NULLS running
    last_value): each event carries the most recent purchase value of
    its user — the standard sparse-signal fill before feature joins.
    One window, one shuffle on user_id."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    signal = F.when(F.col("event_type") == "purchase", F.col("value"))
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.last(signal, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@query(
    "ts_dow_hour_profile",
    oracle="""
    SELECT event_type,
           CAST(isodow(ts) - 1 AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hr,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def ts_dow_hour_profile(spark, sf_dir):
    """Day-of-week × hour activity profile (Monday=0) — the seasonality
    heatmap behind anomaly baselines and traffic models. Pure hash
    aggregation on derived keys.

    The value sum runs in DECIMAL(18,4) on both sides (the
    ts_month_over_month convention): a double SUM is accumulation-
    order-dependent across partitions/engines, and a 2-dp round of an
    order-dependent double can flip at the boundary. Decimal addition
    is exact, so the sum is order-independent."""
    e = t(spark, sf_dir, "events")
    return e.groupBy(
        "event_type",
        F.weekday("ts").alias("dow"),
        F.hour("ts").alias("hr"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total_value"),
    )


@query(
    "text_readability_score",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             GREATEST(len(string_split_regex(trim(text), '\\s+')), 1) AS words,
             GREATEST(len(regexp_extract_all(text, '([.!?]+)', 1)), 1) AS sentences,
             GREATEST(len(regexp_extract_all(lower(text), '([aeiouy]+)', 1)), 1)
               AS syllables
      FROM documents
    )
    SELECT doc_id, words, sentences,
           FLOOR((206.835 - 1.015 * (words * 1.0 / sentences)
                          - 84.6 * (syllables * 1.0 / words)) * 100 + 0.5) / 100
             AS flesch
    FROM feats
    """,
)
def text_readability_score(spark, sf_dir):
    """Flesch-style readability: words/sentence and vowel-group
    syllable proxy — the classic document-complexity feature for
    quality filtering and curriculum staging. Regex counts in
    whole-stage codegen; zero shuffle."""
    d = t(spark, sf_dir, "documents")
    words = F.greatest(
        F.size(F.split(F.trim(F.col("text")), "\\s+")), F.lit(1)
    )
    sentences = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("([.!?]+)"))), F.lit(1)
    )
    syllables = F.greatest(
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit("([aeiouy]+)"))),
        F.lit(1),
    )
    raw = (
        F.lit(206.835)
        - 1.015 * (words.cast("double") / sentences)
        - 84.6 * (syllables.cast("double") / words)
    )
    # floor(x*100 + 0.5)/100 instead of round(x, 2): both engines
    # compute bit-identical doubles for `raw`, and floor of the same
    # double is deterministic — engine round() implementations disagree
    # exactly at .xx5 boundaries (one corpus doc hits one).
    flesch = F.floor(raw * 100 + 0.5) / 100
    return d.select(
        "doc_id",
        words.alias("words"),
        sentences.alias("sentences"),
        flesch.alias("flesch"),
    )


@query(
    "mix_temperature_sampling",
    oracle="""
    WITH counts AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ), weights AS (
      SELECT source, n, sqrt(n) AS w FROM counts
    ), quotas AS (
      SELECT source,
             CAST(FLOOR(0.5 * (SELECT SUM(n) FROM counts)
                        * w / (SELECT SUM(w) FROM weights)) AS BIGINT) AS quota
      FROM weights
    ), ranked AS (
      SELECT d.doc_id, d.source,
             ROW_NUMBER() OVER (PARTITION BY d.source
                                ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
               AS rn
      FROM documents d
    )
    SELECT r.doc_id, r.source
    FROM ranked r JOIN quotas q USING (source)
    WHERE r.rn <= q.quota
    """,
)
def mix_temperature_sampling(spark, sf_dir):
    """Temperature-flattened source mixing (T=2 → weight ∝ sqrt(n)):
    per-source quotas that up-weight small sources relative to
    proportional sampling — the corpus-recipe balancing step of every
    multi-source pretraining mix. sqrt is IEEE-correctly-rounded on
    both engines, so quotas match exactly (a general pow(n, 1/T) is
    only ~1-ulp and could flip a FLOOR at integer boundaries —
    documented limitation, not an accident).

    Scale shape: quotas are a broadcast few-row table; the per-source
    ranking is a partitioned window on the source key (md5-ordered, so
    the selection is deterministic and engine-stable)."""
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n"))
    weights = counts.select("source", "n", F.sqrt("n").alias("w"))
    totals = weights.agg(
        F.sum("n").alias("n_total"), F.sum("w").alias("w_total")
    )
    quotas = weights.crossJoin(F.broadcast(totals)).select(
        "source",
        F.floor(0.5 * F.col("n_total") * F.col("w") / F.col("w_total")).alias(
            "quota"
        ),
    )
    wr = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select("doc_id", "source", F.row_number().over(wr).alias("rn"))
    return (
        ranked.join(F.broadcast(quotas), "source")
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", "source")
    )


@query(
    "anomaly_iqr_events",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, ROUND(e.value, 4) AS value,
           ROUND(q.q3 + 1.5 * (q.q3 - q.q1), 4) AS hi_fence
    FROM events e JOIN q USING (event_type)
    WHERE e.value > q.q3 + 1.5 * (q.q3 - q.q1)
       OR e.value < q.q1 - 1.5 * (q.q3 - q.q1)
    """,
)
def anomaly_iqr_events(spark, sf_dir):
    """Tukey-fence (IQR) outlier detection per event type — the
    robust-statistics companion to ``anomaly_zscore_events`` (fences
    don't move when the outliers themselves inflate the variance).
    Exact interpolated percentiles match DuckDB's quantile_cont (the
    ``doc_length_pctl_filter`` precedent); per-type fences broadcast
    back over the scan."""
    e = t(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        e.join(F.broadcast(q), "event_type")
        .filter(
            (F.col("value") > F.col("q3") + 1.5 * iqr)
            | (F.col("value") < F.col("q1") - 1.5 * iqr)
        )
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(F.col("q3") + 1.5 * iqr, 4).alias("hi_fence"),
        )
    )


@query(
    "ts_cumulative_dau",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ), daily_new AS (
      SELECT d0 AS day, COUNT(*) AS new_users FROM first_seen GROUP BY d0
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM daily_new
    """,
)
def ts_cumulative_dau(spark, sf_dir):
    """Cumulative distinct users by day WITHOUT a running
    distinct-count: each user reduces to a first-seen day (one hash
    agg), days aggregate to new-user counts, and the cumulative sum
    runs over one row per DAY — the set-cardinality-over-time trick
    that replaces an O(days × users) rescan with two linear passes
    plus a driver-scale window."""
    e = t(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    daily_new = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily_new.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


@query(
    "join_shuffle_hash_hint",
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_shuffle_hash_hint(spark, sf_dir):
    """Join-strategy hint surface: the same star join as
    ``join_broadcast_dims`` but forced through SHUFFLE_HASH — the
    escape hatch when the small side exceeds the broadcast threshold
    but still fits an executor's hash map (skips the sort-merge sort
    on the big side). Results must be strategy-invariant; that is
    exactly what the oracle row proves."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation").hint("shuffle_hash")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_bal"),
        )
    )


@query(
    "scan_partitioned_pruning",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS totalprice
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def scan_partitioned_pruning(spark, sf_dir):
    """Partition-pruned scan, graded end-to-end: orders is written out
    partitioned by o_orderstatus (hive-style directories), re-read,
    and filtered to one partition — the scan touches only that
    directory (PartitionFilters, pinned by
    tests/test_formats_and_bucketing.py) and values must match the
    unpartitioned oracle. At 100 TB partition-on-predicate-column is
    the first IO lever, before any plan tuning.

    The partitioned copy lands at a STABLE per-session path
    (applicationId-keyed, overwritten in place) — a fresh mkdtemp per
    invocation would leak a full orders copy every run."""
    import tempfile

    app = spark.sparkContext.applicationId.replace("-", "_")
    target = f"{tempfile.gettempdir()}/graft_part_{app}/orders"
    t(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(target)
    return (
        spark.read.parquet(target)
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


@query(
    "embed_dim_variance",
    oracle="""
    WITH comp AS (
      SELECT u.i AS pos,
             CAST(CAST(embedding[u.i] AS DOUBLE) AS DECIMAL(18,9)) AS vd
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    ), m AS (
      SELECT CAST(pos AS INT) AS pos, COUNT(*) AS n,
             SUM(vd) AS sx, SUM(vd * vd) AS sxx
      FROM comp GROUP BY pos
    )
    SELECT pos, n,
           FLOOR((CAST(sx AS DOUBLE) / n) * 1e6 + 0.5) / 1e6 AS mean_val,
           FLOOR(sqrt((CAST(sxx AS DOUBLE)
                       - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / n)
                      / (n - 1)) * 1e6 + 0.5) / 1e6 AS std_val
    FROM m
    """,
)
def embed_dim_variance(spark, sf_dir):
    """Per-dimension mean/std across the embedding corpus — the
    collapsed-dimension / normalization health check run before any
    ANN indexing (a dimension with ~0 variance carries no signal and
    distorts cosine). posexplode → one hash aggregate keyed on
    position: the 64× row blowup collapses immediately into 64
    partial-agg rows per task — linear, map-side combined.

    Cross-engine determinism: components quantize to DECIMAL(18,9)
    and the Σx / Σx² moments accumulate in exact decimal (order-
    independent — a double SUM varies by accumulation order across
    partitions/engines and can flip a 6-dp round). Mean and sample
    std derive from the exact moments in IEEE doubles, identically
    on both sides, with the floor-based half-up round."""
    e = t(spark, sf_dir, "embeddings")
    comp = e.select(
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos0", "val"
        )
    ).select(
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.col("val").cast("decimal(18,9)").alias("vd"),
    )
    m = comp.groupBy("pos").agg(
        F.count("*").alias("n"),
        F.sum("vd").alias("sx"),
        F.sum(F.col("vd") * F.col("vd")).alias("sxx"),
    )
    n = F.col("n")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    mean = (sxd / n) * 1e6
    std = F.sqrt((sxxd - (sxd * sxd) / n) / (n - 1)) * 1e6
    return m.select(
        "pos",
        "n",
        (F.floor(mean + F.lit(0.5)) / 1e6).alias("mean_val"),
        (F.floor(std + F.lit(0.5)) / 1e6).alias("std_val"),
    )


@query(
    "text_bigram_lm",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
      FROM documents
    ), bigrams AS (
      SELECT u.i AS pos, tk[u.i] AS w1, tk[u.i + 1] AS w2
      FROM toks, unnest(range(1, len(tk))) AS u(i)
      WHERE len(tk) >= 2
    ), big_counts AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY w1, w2
    ), uni_counts AS (
      SELECT w1, SUM(c12) AS c1 FROM big_counts GROUP BY w1
    )
    SELECT b.w1, b.w2, b.c12,
           ROUND(b.c12 * 1.0 / u.c1, 6) AS p_w2_given_w1
    FROM big_counts b JOIN uni_counts u USING (w1)
    WHERE b.c12 >= 20
    """,
)
def text_bigram_lm(spark, sf_dir):
    """Bigram conditional probabilities P(w2|w1) over the corpus — the
    classic count-based LM statistic (and the building block of PMI /
    collocation mining). Two hash aggregations; the unigram
    denominator derives from the bigram counts themselves (no second
    corpus pass) and joins back on w1 — skew on stop-words is the
    AQE-skew-join case, and the c12 floor keeps the output to the
    statistically meaningful tail."""
    d = t(spark, sf_dir, "documents")
    tk = F.split(F.lower(F.trim(F.col("text"))), "\\s+")
    toks = d.select(tk.alias("tk")).filter(F.size("tk") >= 2)
    tkc = F.col("tk")
    bigrams = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(tkc) - 1),
                lambda i: F.struct(
                    F.element_at(tkc, i).alias("w1"),
                    F.element_at(tkc, i + 1).alias("w2"),
                ),
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    big_counts = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni_counts = big_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return (
        big_counts.join(uni_counts, "w1")
        .filter(F.col("c12") >= 20)
        .select(
            "w1",
            "w2",
            "c12",
            F.round(F.col("c12") / F.col("c1"), 6).alias("p_w2_given_w1"),
        )
    )


VOCAB_SIZE = 200


@query(
    "text_tokenize_vocab_ids",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
      FROM documents
    ), exploded AS (
      SELECT doc_id, u.i AS pos, tk[u.i] AS tok
      FROM toks, unnest(range(1, len(tk) + 1)) AS u(i)
    ), vocab AS (
      SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS tok_id
      FROM exploded GROUP BY tok
      ORDER BY COUNT(*) DESC, tok LIMIT {VOCAB_SIZE}
    )
    SELECT e.doc_id,
           array_to_string(list(COALESCE(v.tok_id, 0) ORDER BY e.pos), ',')
             AS token_ids,
           CAST(COUNT(*) FILTER (WHERE v.tok_id IS NULL) AS BIGINT) AS n_unk
    FROM exploded e LEFT JOIN vocab v USING (tok)
    GROUP BY e.doc_id
    """,
)
def text_tokenize_vocab_ids(spark, sf_dir):
    """Distributed tokenization against a learned vocabulary: build
    the top-{VOCAB_SIZE} token vocab (frequency-ranked, lexical
    tiebreak → deterministic ids), then map every document to its id
    sequence with 0 = UNK — the id-ification step between raw text
    and sequence packing.

    Scale shape: the vocab is tiny and BROADCAST into the token
    stream (documents never shuffle for the lookup); the id sequence
    reassembles per doc with the ordered-collect technique
    (collect_list of (pos, id) structs + array_sort), the engine's
    standard S14 pattern. The id sequence is emitted comma-joined
    (STRING, not array<int>) — the grading driver's pandas
    canonicalizer cannot hash list cells (r3 lesson)."""
    d = t(spark, sf_dir, "documents")
    tk = F.split(F.lower(F.trim(F.col("text"))), "\\s+")
    exploded = d.select(
        "doc_id", F.posexplode(tk).alias("pos", "tok")
    )
    # Top-K FIRST via orderBy+limit (TakeOrderedAndProject — per-
    # partition heaps, no global sort), THEN the id-assigning window
    # over the K-row survivor set. A bare row_number over the full
    # distinct-token table would single-reduce the whole vocabulary.
    wv = W.orderBy(F.desc("c"), "tok")
    vocab = (
        exploded.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(VOCAB_SIZE)
        .withColumn("tok_id", F.row_number().over(wv))
        .select("tok", "tok_id")
    )
    pair = F.struct(F.col("pos"), F.coalesce("tok_id", F.lit(0)).alias("tid"))
    return (
        exploded.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(pair)),
                    lambda p: p["tid"].cast("string"),
                ),
                ",",
            ).alias("token_ids"),
            F.sum(F.col("tok_id").isNull().cast("long")).alias("n_unk"),
        )
    )


@query(
    "agg_moments_pack",
    oracle="""
    WITH sums AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5)
                  AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS s1,
             CAST(SUM(CAST(FLOOR(value * value * 1e6 + 0.5)
                  AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS s2,
             CAST(SUM(CAST(FLOOR(value * value * value * 1e6 + 0.5)
                  AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS s3,
             CAST(SUM(CAST(FLOOR(value * value * value * value * 1e6 + 0.5)
                  AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS s4
      FROM events GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           FLOOR(s1 / n * 1e6 + 0.5) / 1e6 AS mean,
           FLOOR(sqrt(s2 / n - (s1 / n) * (s1 / n)) * 1e6 + 0.5) / 1e6
             AS std_pop,
           FLOOR((s3 / n - 3 * (s1 / n) * (s2 / n)
                  + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / pow(sqrt(s2 / n - (s1 / n) * (s1 / n)), 3)
                 * 1e6 + 0.5) / 1e6 AS skew_pop,
           FLOOR(((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * (s2 / n - (s1 / n) * (s1 / n))) - 3)
                 * 1e6 + 0.5) / 1e6 AS kurt_excess
    FROM sums
    """,
)
def agg_moments_pack(spark, sf_dir):
    """Higher statistical moments per group — mean, population std,
    skewness, excess kurtosis — computed from raw POWER SUMS (Σx, Σx²,
    Σx³, Σx⁴), the single-pass algebraic form that distributes with
    map-side partials. The engines' built-in skewness/kurtosis
    disagree on bias correction (Spark emits population g₁/g₂, DuckDB
    sample-corrected G₁/g₂-style), so the pack derives the moments
    explicitly — which is also the only shape that lets the
    accumulation run in exact DECIMAL: each per-row power is
    floor-quantized to integer MICRO-UNITS (floor(x·1e6 + 0.5) — the
    repo's floor-rounding convention; ROUND on doubles diverges on
    shortest-repr ties, the unpivot_measures class) before an exact
    DECIMAL(38,0) sum, so no summation-order or tie divergence
    survives; the closing moment algebra is one identical IEEE
    expression chain per side. Micro-unit bound: v⁴·1e6 must stay
    below 2⁶³ (v < ~55 000) — holds for this domain's value range."""
    e = t(spark, sf_dir, "events")
    v = F.col("value")

    def psum(expr):
        return (
            F.sum(
                F.floor(expr * F.lit(1e6) + F.lit(0.5)).cast("decimal(38,0)")
            ).cast("double")
            / F.lit(1e6)
        )

    sums = e.groupBy("event_type").agg(
        F.count("*").alias("n_raw"),
        psum(v).alias("s1"),
        psum(v * v).alias("s2"),
        psum(v * v * v).alias("s3"),
        psum(v * v * v * v).alias("s4"),
    )
    n = F.col("n_raw").cast("double")
    m = F.col("s1") / n
    m2 = F.col("s2") / n - m * m
    m3 = F.col("s3") / n - 3 * m * (F.col("s2") / n) + 2 * m * m * m
    m4 = (
        F.col("s4") / n
        - 4 * m * (F.col("s3") / n)
        + 6 * m * m * (F.col("s2") / n)
        - 3 * m * m * m * m
    )
    r6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return sums.select(
        "event_type",
        F.col("n_raw").cast("long").alias("n"),
        r6(m).alias("mean"),
        r6(F.sqrt(m2)).alias("std_pop"),
        r6(m3 / F.pow(F.sqrt(m2), 3)).alias("skew_pop"),
        r6(m4 / (m2 * m2) - 3).alias("kurt_excess"),
    )


@query(
    "agg_gini_concentration",
    oracle="""
    WITH totals AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS x
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT segment, x,
             ROW_NUMBER() OVER (PARTITION BY segment
                                ORDER BY x, o_custkey) AS i,
             COUNT(*) OVER (PARTITION BY segment) AS n,
             SUM(x) OVER (PARTITION BY segment) AS sx
      FROM totals
    )
    SELECT segment, CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(ROUND(MAX(sx), 2) AS DOUBLE) AS total_value,
           ROUND(CAST(SUM((2 * i - n - 1) * x) AS DOUBLE)
                 / CAST(MAX(n) * MAX(sx) AS DOUBLE), 6) AS gini
    FROM ranked GROUP BY segment
    """,
)
def agg_gini_concentration(spark, sf_dir):
    """Revenue-concentration Gini coefficient per market segment: how
    unequally order value distributes across customers (0 = uniform,
    →1 = one whale). Computed with the exact sorted-rank identity
    G = Σ(2i−n−1)·x₍ᵢ₎ / (n·Σx) — one window rank + one aggregation,
    no pairwise |xᵢ−xⱼ| cross product (the textbook definition is
    O(n²); the rank identity is the distributed form).

    Everything left of the final division is exact: per-customer
    totals accumulate in DECIMAL, ranks and counts are integers, and
    the (2i−n−1)·x products sum in decimal — the single double
    division at the end is engine-identical."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    totals = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
    )
    wseg = W.partitionBy("segment")
    ranked = totals.select(
        "segment",
        "x",
        F.row_number().over(wseg.orderBy("x", "o_custkey")).alias("i"),
        F.count("*").over(wseg).alias("n"),
        F.sum("x").over(wseg).alias("sx"),
    )
    return ranked.groupBy("segment").agg(
        F.max("n").cast("long").alias("n_customers"),
        F.round(F.max("sx"), 2).cast("double").alias("total_value"),
        F.round(
            F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("x")).cast("double")
            / (F.max("n") * F.max("sx")).cast("double"),
            6,
        ).alias("gini"),
    )


@query(
    "agg_percentile_disc_pack",
    oracle="""
    SELECT event_type,
           ROUND(quantile_disc(value, 0.25), 2) AS p25_disc,
           ROUND(quantile_disc(value, 0.5), 2) AS p50_disc,
           ROUND(quantile_disc(value, 0.9), 2) AS p90_disc,
           ROUND(quantile_cont(value, 0.5), 4) AS p50_cont,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_percentile_disc_pack(spark, sf_dir):
    """DISCRETE vs CONTINUOUS percentile semantics, declared side by
    side: percentile_disc returns an ACTUAL data value (the smallest
    value at-or-above the rank — exact across engines by
    construction, no interpolation to diverge), percentile_cont
    interpolates between the two straddling values (one IEEE
    midpoint). The distinction matters downstream: disc for
    categorical-ish thresholds (a real latency that occurred), cont
    for smooth fences. Both engines implement the ANSI WITHIN GROUP
    semantics; the pack pins that they agree on every group."""
    e = t(spark, sf_dir, "events")
    e.createOrReplaceTempView("_pctl_events")
    return spark.sql(
        """
        SELECT event_type,
               ROUND(percentile_disc(0.25) WITHIN GROUP (ORDER BY value), 2)
                 AS p25_disc,
               ROUND(percentile_disc(0.5) WITHIN GROUP (ORDER BY value), 2)
                 AS p50_disc,
               ROUND(percentile_disc(0.9) WITHIN GROUP (ORDER BY value), 2)
                 AS p90_disc,
               ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 4)
                 AS p50_cont,
               COUNT(*) AS n
        FROM _pctl_events GROUP BY event_type
        """
    )


@query(
    "fn_regex_all_pack",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]*a[a-z]*')) AS INT)
             AS n_a_words,
           array_to_string(regexp_extract_all(text, '[a-z]*a[a-z]*')[1:5], ',')
             AS first_a_words,
           regexp_replace(text, '[aeiou]', '_', 'g') LIKE '%sp_rk%'
             AS mentions_spark_devoweled,
           regexp_matches(text, '\\b(scan|hash)\\b') AS has_scan_or_hash
    FROM documents
    """,
)
def fn_regex_all_pack(spark, sf_dir):
    """Global-regex scalar pack: regexp_extract_all (every match, not
    just the first — the tokenizer/NER-gazetteer workhorse),
    global regexp_replace, and boolean rlike — the remaining regex
    surface beyond ``text_regex_extract``'s first-match form. All
    JVM-side codegen; the match list is emitted count + first-5
    joined (scalar columns, driver-canonicalizer rule)."""
    d = t(spark, sf_dir, "documents")
    allm = F.expr("regexp_extract_all(text, '[a-z]*a[a-z]*', 0)")
    return d.select(
        "doc_id",
        F.size(allm).alias("n_a_words"),
        F.array_join(F.slice(allm, 1, 5), ",").alias("first_a_words"),
        F.regexp_replace("text", "[aeiou]", "_")
        .like("%sp_rk%")
        .alias("mentions_spark_devoweled"),
        F.col("text").rlike("\\b(scan|hash)\\b").alias("has_scan_or_hash"),
    )


@query(
    "agg_incremental_merge",
    oracle="""
    WITH partials AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS s,
             COUNT(*) AS c,
             MIN(value) AS lo, MAX(value) AS hi
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(SUM(c) AS BIGINT) AS n,
           CAST(ROUND(SUM(s), 2) AS DOUBLE) AS total,
           FLOOR(CAST(SUM(s) AS DOUBLE) / SUM(c) * 1e4 + 0.5) / 1e4 AS mean,
           ROUND(MIN(lo), 2) AS min_value,
           ROUND(MAX(hi), 2) AS max_value,
           CAST(COUNT(*) AS BIGINT) AS n_partials
    FROM partials GROUP BY event_type
    """,
)
def agg_incremental_merge(spark, sf_dir):
    """Incremental re-aggregation: per-day PARTIAL aggregates (the
    materialized state an incremental pipeline persists per ingested
    partition) merged into corpus totals WITHOUT rescanning raw rows —
    sum-of-sums, sum-of-counts, min-of-mins, and mean recomputed as
    merged-sum/merged-count (NEVER avg-of-avgs, the classic
    non-algebraic merge bug; the pytest twin pins that the wrong
    formula actually differs on this data). This declares Spark's own
    partial-aggregation algebra as user-visible surface: what the
    engine does inside every Exchange, a pipeline can do across DAYS,
    folding one new partition into yesterday's state in O(partials)
    instead of O(history)."""
    e = t(spark, sf_dir, "events")
    partials = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.sum(F.round("value", 2).cast("decimal(18,2)")).alias("s"),
        F.count("*").alias("c"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    return partials.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        F.round(F.sum("s"), 2).cast("double").alias("total"),
        # DECIMAL/COUNT division scale rules differ across engines
        # (the ts_resample_linear_interp class): double-cast the exact
        # sum first, then floor-round the identical IEEE quotient.
        (
            F.floor(
                F.sum("s").cast("double") / F.sum("c") * F.lit(1e4)
                + F.lit(0.5)
            )
            / F.lit(1e4)
        ).alias("mean"),
        F.round(F.min("lo"), 2).alias("min_value"),
        F.round(F.max("hi"), 2).alias("max_value"),
        F.count("*").cast("long").alias("n_partials"),
    )


@query(
    "ml_ols_two_feature",
    oracle="""
    WITH m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx1,
             CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sx2,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx1x1,
             CAST(SUM(CAST(l_discount AS DECIMAL(8,2))
                      * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sx2x2,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sx1x2,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx1y,
             CAST(SUM(CAST(l_discount AS DECIMAL(8,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx2y
      FROM lineitem
    )
    SELECT CAST(n AS BIGINT) AS n,
           FLOOR(((sx1x1 - sx1 * sx1 / n) * (sx2y - sx2 * sy / n)
                  - (sx1x2 - sx1 * sx2 / n) * (sx1y - sx1 * sy / n))
                 / ((sx1x1 - sx1 * sx1 / n) * (sx2x2 - sx2 * sx2 / n)
                    - (sx1x2 - sx1 * sx2 / n) * (sx1x2 - sx1 * sx2 / n))
                 * 1e4 + 0.5) / 1e4 AS beta_discount,
           FLOOR(((sx2x2 - sx2 * sx2 / n) * (sx1y - sx1 * sy / n)
                  - (sx1x2 - sx1 * sx2 / n) * (sx2y - sx2 * sy / n))
                 / ((sx1x1 - sx1 * sx1 / n) * (sx2x2 - sx2 * sx2 / n)
                    - (sx1x2 - sx1 * sx2 / n) * (sx1x2 - sx1 * sx2 / n))
                 * 1e4 + 0.5) / 1e4 AS beta_quantity
    FROM m
    """,
)
def ml_ols_two_feature(spark, sf_dir):
    """Two-feature OLS (l_extendedprice ~ l_quantity + l_discount) by
    the NORMAL EQUATIONS: one aggregation collects the 9 power/cross
    moments, Cramer's rule solves the 2×2 centered system in closed
    form — the single-pass distributed regression that needs no
    gradient loop, no feature matrix materialization, no driver-side
    data (generalizing ``agg_regr_slope`` from one regressor to the
    multi-feature shape). ML-prep's workhorse for quick fits and
    leverage diagnostics at 100 TB: moments are algebraic aggregates,
    so the whole fit is map-side partials + one reduce.

    Determinism: every moment is a DECIMAL-exact sum of 2-dp inputs
    cast to double once; the closing Cramer arithmetic is one
    identical IEEE chain per side, floor-rounded."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(8,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")

    def dsum(expr):
        return F.sum(expr).cast("double")

    m = li.agg(
        F.count("*").alias("n_raw"),
        dsum(q).alias("sx1"),
        dsum(d).alias("sx2"),
        dsum(y).alias("sy"),
        dsum(q * q).alias("sx1x1"),
        dsum(d * d).alias("sx2x2"),
        dsum(q * d).alias("sx1x2"),
        dsum(q * y).alias("sx1y"),
        dsum(d * y).alias("sx2y"),
    )
    n = F.col("n_raw").cast("double")
    s11 = F.col("sx1x1") - F.col("sx1") * F.col("sx1") / n
    s22 = F.col("sx2x2") - F.col("sx2") * F.col("sx2") / n
    s12 = F.col("sx1x2") - F.col("sx1") * F.col("sx2") / n
    c1 = F.col("sx1y") - F.col("sx1") * F.col("sy") / n
    c2 = F.col("sx2y") - F.col("sx2") * F.col("sy") / n
    det = s11 * s22 - s12 * s12

    def fround(x):
        return F.floor(x * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)

    return m.select(
        F.col("n_raw").cast("long").alias("n"),
        fround((s11 * c2 - s12 * c1) / det).alias("beta_discount"),
        fround((s22 * c1 - s12 * c2) / det).alias("beta_quantity"),
    )
