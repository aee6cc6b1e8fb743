"""Text-analysis operators over ``documents.text`` (north-star §2B).

Language-ID, quality scoring, token counting, fingerprinting — all as
native Column expressions (regex/split/aggregate), so they run inside
whole-stage codegen at 100 TB; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from caliper_poc_data_etl_spark.queries.registry import query, t

# A compact multi-language stopword table for the n-gram/stopword
# language heuristic (public common-word lists).
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "et", "des"],
}

# BPE-ish token pattern: word pieces or single non-space symbols.
# Parenthesized: Spark's regexp_extract_all extracts group 1.
TOKEN_PATTERN = "([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s])"


def _tokens(col):
    return F.split(F.trim(col), "\\s+")


@query(
    "text_stats",
    oracle="""
    SELECT doc_id,
           length(text)                                         AS n_chars_calc,
           len(string_split_regex(trim(text), '\\s+'))          AS n_tokens,
           len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct_tokens,
           ROUND(length(replace(text, ' ', '')) * 1.0
                 / len(string_split_regex(trim(text), '\\s+')), 4) AS avg_token_len
    FROM documents
    """,
)
def text_stats(spark, sf_dir):
    """Length/token statistics — the quality-score building blocks."""
    d = t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.length(F.regexp_replace("text", " ", "")) / F.size(toks), 4
        ).alias("avg_token_len"),
    )


@query(
    "text_quality_score",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct,
             length(regexp_replace(text, '[a-zA-Z ]', '', 'g')) * 1.0
               / length(text) AS symbol_ratio
      FROM documents
    )
    SELECT doc_id,
           ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.4
                 + (n_distinct * 1.0 / n_tokens) * 0.4
                 + (1.0 - symbol_ratio) * 0.2, 4) AS quality,
           CASE WHEN n_tokens >= 20 AND n_distinct * 1.0 / n_tokens >= 0.3
                THEN TRUE ELSE FALSE END AS keep
    FROM feats
    """,
)
def text_quality_score(spark, sf_dir):
    """Composite quality score (length / lexical diversity / symbol
    ratio) + a keep/drop gate — the standard pretraining-data filter."""
    d = t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    symbol_ratio = F.length(
        F.regexp_replace("text", "[a-zA-Z ]", "")
    ) / F.length("text")
    quality = (
        F.least(n_tokens / 100.0, F.lit(1.0)) * 0.4
        + (n_distinct / n_tokens) * 0.4
        + (1.0 - symbol_ratio) * 0.2
    )
    keep = (n_tokens >= 20) & ((n_distinct / n_tokens) >= 0.3)
    return d.select(
        "doc_id",
        F.round(quality, 4).alias("quality"),
        keep.alias("keep"),
    )


def _stopword_hits(tokens_col, words: list[str]):
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens_col, lambda x: F.array_contains(arr, x)))


@query(
    "text_langid",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                 x -> list_contains({LANG_STOPWORDS["en"]!r}, x))) AS hits_en,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                 x -> list_contains({LANG_STOPWORDS["de"]!r}, x))) AS hits_de,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                 x -> list_contains({LANG_STOPWORDS["es"]!r}, x))) AS hits_es,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                 x -> list_contains({LANG_STOPWORDS["fr"]!r}, x))) AS hits_fr,
             regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') AS has_cjk
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN has_cjk THEN 'zh'
                WHEN hits_de > hits_en AND hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
                WHEN hits_es > hits_en AND hits_es >= hits_fr THEN 'es'
                WHEN hits_fr > hits_en THEN 'fr'
                ELSE 'en' END AS lang_guess
    FROM scored
    """,
)
def text_langid(spark, sf_dir):
    """Heuristic language ID: CJK codepoint detection + per-language
    stopword scoring (n-gram-free variant; the synthetic corpus shares
    one vocabulary so real discrimination is exercised by tests)."""
    d = t(spark, sf_dir, "documents")
    toks = _tokens(F.lower(F.col("text")))
    hits = {k: _stopword_hits(toks, v) for k, v in LANG_STOPWORDS.items()}
    has_cjk = F.col("text").rlike("[\\x{4e00}-\\x{9fff}]")
    guess = (
        F.when(has_cjk, "zh")
        .when(
            (hits["de"] > hits["en"])
            & (hits["de"] >= hits["es"])
            & (hits["de"] >= hits["fr"]),
            "de",
        )
        .when((hits["es"] > hits["en"]) & (hits["es"] >= hits["fr"]), "es")
        .when(hits["fr"] > hits["en"], "fr")
        .otherwise("en")
    )
    return d.select("doc_id", "lang", guess.alias("lang_guess"))


@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '{TOKEN_PATTERN}', 1)) AS bpe_ish_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS byte_est_tokens
    FROM documents
    """,
)
def text_token_count(spark, sf_dir):
    """Token counting three ways: whitespace, BPE-ish regex pieces,
    bytes/4 estimate — the standard LLM-pipeline accounting columns."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_PATTERN))).alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.length("text") / 4.0).alias("byte_est_tokens"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))) AS fingerprint,
           md5(text) AS exact_hash
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprinting: exact hash + normalized (case/punct/
    whitespace-insensitive) content hash — md5 agrees across engines."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.regexp_replace("text", "[^a-zA-Z0-9]", ""))).alias(
            "fingerprint"
        ),
        F.md5(F.col("text")).alias("exact_hash"),
    )


@query(
    "text_char_entropy",
    oracle="""
    WITH normed AS (
      SELECT doc_id, regexp_replace(text, '\\s', ' ', 'g') AS norm
      FROM documents WHERE length(text) > 0
    ), counted AS (
      SELECT doc_id, norm,
             list_sort(list_distinct(regexp_extract_all(norm, '.'))) AS dchars
      FROM normed
    )
    SELECT doc_id,
           length(norm) AS n_chars_norm,
           len(dchars) AS n_distinct_chars,
           ROUND(-list_sum(list_transform(dchars, c ->
               ((length(norm) - length(replace(norm, c, ''))) * 1.0 / length(norm))
               * log2((length(norm) - length(replace(norm, c, ''))) * 1.0
                      / length(norm)))), 4) AS entropy
    FROM counted
    """,
)
def text_char_entropy(spark, sf_dir):
    """Per-document character-level Shannon entropy — the cheap
    gibberish/boilerplate detector (natural text sits ~4 bits/char;
    base64 blobs and repeated padding land far off).

    Stays entirely in array algebra: distinct chars (sorted, so both
    engines sum the entropy terms in the same order) and a
    count-via-replace length trick per char — O(len·|alphabet|) inside
    whole-stage codegen, zero shuffle, no explode of one row per
    character (which would 5000× the row count before aggregating
    right back)."""
    d = t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    normed = d.select(
        "doc_id", F.regexp_replace("text", "\\s", " ").alias("norm")
    )
    counted = normed.select(
        "doc_id",
        "norm",
        F.array_sort(
            F.array_distinct(F.regexp_extract_all("norm", F.lit("(.)")))
        ).alias("dchars"),
    )
    n = F.length("norm")
    cnt = lambda c: n - F.length(F.replace(F.col("norm"), c))  # noqa: E731
    term = lambda c: (cnt(c).cast("double") / n) * F.log2(  # noqa: E731
        cnt(c).cast("double") / n
    )
    return counted.select(
        "doc_id",
        n.alias("n_chars_norm"),
        F.size("dchars").alias("n_distinct_chars"),
        F.round(
            -F.aggregate(
                "dchars", F.lit(0.0), lambda acc, c: acc + term(c)
            ),
            4,
        ).alias("entropy"),
    )


@query(
    "text_regex_extract",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '([0-9]+)', 1)) AS n_numbers,
           COALESCE(NULLIF(regexp_extract(text, '([0-9]+)', 1), ''), 'NA')
             AS first_number,
           len(regexp_extract_all(text, '([A-Z][a-z]+)', 1)) AS n_capitalized,
           len(regexp_extract_all(text, '(https?://[^ ]+)', 1)) AS n_urls
    FROM documents
    """,
)
def text_regex_extract(spark, sf_dir):
    """Regex extraction pack: occurrence counts + first-match capture
    (numbers, Capitalized words, URLs) — the structured-signal pass of
    a scrape-cleaning pipeline. Patterns stick to constructs with
    identical semantics in Java regex (Spark) and RE2 (DuckDB); empty
    no-match extracts are normalized to 'NA' on both engines."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("([0-9]+)"))).alias("n_numbers"),
        F.coalesce(
            F.nullif(F.regexp_extract("text", "([0-9]+)", 1), F.lit("")),
            F.lit("NA"),
        ).alias("first_number"),
        F.size(F.regexp_extract_all("text", F.lit("([A-Z][a-z]+)"))).alias(
            "n_capitalized"
        ),
        F.size(F.regexp_extract_all("text", F.lit("(https?://[^ ]+)"))).alias(
            "n_urls"
        ),
    )


@query(
    "text_ngram_shingles",
    oracle="""
    WITH tk AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
      FROM documents
    )
    SELECT doc_id,
           len(list_distinct(
             list_transform(range(1, len(tk) - 1),
                            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
           )) AS n_distinct_shingles
    FROM tk
    WHERE len(tk) >= 3
    """,
)
def text_ngram_shingles(spark, sf_dir):
    """Distinct 3-gram word shingles per document — the MinHash input."""
    d = t(spark, sf_dir, "documents")
    # Materialize toks before the transform — an inlined split() would
    # re-run the regex per element_at (see dedup._doc_shingles).
    toks = F.col("toks")
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )
    return (
        d.select("doc_id", _tokens(F.col("text")).alias("toks"))
        .filter(F.size(toks) >= 3)
        .select("doc_id", F.size(F.array_distinct(shingles)).alias("n_distinct_shingles"))
    )


_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that with "
    "as for on at by from not"
).split()


@query(
    "text_stopword_density",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) FILTER (WHERE tok IN
             ({", ".join("'" + w + "'" for w in _STOPWORDS)})) AS BIGINT)
             AS n_stop,
           FLOOR(COUNT(*) FILTER (WHERE tok IN
             ({", ".join("'" + w + "'" for w in _STOPWORDS)})) * 1.0
             / COUNT(*) * 1e6 + 0.5) / 1e6 AS stop_ratio
    FROM toks GROUP BY doc_id
    """,
)
def text_stopword_density(spark, sf_dir):
    """Stopword density per document — one of the classic quality
    signals (near-zero density ⇒ keyword spam / boilerplate lists;
    near-one ⇒ degenerate text). The stopword set is a tiny literal
    IN-list compiled into the row predicate (at vocab scale it would
    broadcast) — tokenize → conditional count, one hash agg on
    doc_id."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    )
    is_stop = F.col("tok").isin(_STOPWORDS)
    g = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(is_stop.cast("long")).alias("n_stop"),
    )
    return g.select(
        "doc_id",
        "n_tokens",
        "n_stop",
        (
            F.floor(F.col("n_stop") * 1.0 / F.col("n_tokens") * 1e6 + F.lit(0.5))
            / 1e6
        ).alias("stop_ratio"),
    )


HASH_VEC_BUCKETS = 256


@query(
    "text_hashing_vectorizer",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), b AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT % {HASH_VEC_BUCKETS}
               AS bucket,
             COUNT(*) AS c
      FROM toks GROUP BY doc_id, bucket
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS nnz,
           CAST(SUM(c * c) AS BIGINT) AS sq_norm,
           FLOOR(sqrt(CAST(SUM(c * c) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS l2
    FROM b GROUP BY doc_id
    """,
)
def text_hashing_vectorizer(spark, sf_dir):
    """Feature hashing (the hashing-trick vectorizer): tokens hash
    into {HASH_VEC_BUCKETS} buckets via an ENGINE-AGNOSTIC md5-prefix
    hash, per-document bucket counts form the sparse vector; graded
    outputs are the vector's nnz, exact integer squared norm, and l2
    norm — scalar projections of the full vector (the driver contract
    is scalar-only), with the bucket assignment itself proven by the
    hash match. Two hash aggs, both keyed on doc_id — the second
    reuses the first's partitioning. At 100 TB this replaces a vocab
    build entirely: no dictionary state, memory O(buckets)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        % HASH_VEC_BUCKETS
    )
    b = toks.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count("*").alias("c")
    )
    return b.groupBy("doc_id").agg(
        F.count("*").alias("nnz"),
        F.sum(F.col("c") * F.col("c")).alias("sq_norm"),
        (
            F.floor(
                F.sqrt(F.sum(F.col("c") * F.col("c")).cast("double")) * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("l2"),
    )


_PPL_FLOOR_LOGP = -13.815511  # ROUND(LN(1e-6), 6) — unseen-bigram backoff


@query(
    "text_perplexity_proxy",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
      FROM documents
    ), bigrams AS (
      SELECT doc_id, tk[u.i] AS w1, tk[u.i + 1] AS w2
      FROM toks, unnest(range(1, len(tk))) AS u(i)
      WHERE len(tk) >= 2
    ), big_counts AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY w1, w2
    ), uni_counts AS (
      SELECT w1, SUM(c12) AS c1 FROM big_counts GROUP BY w1
    ), scored AS (
      SELECT b.doc_id,
             CAST(ROUND(LN(bc.c12 * 1.0 / uc.c1), 6) AS DECIMAL(18,6)) AS logp
      FROM bigrams b
      JOIN big_counts bc USING (w1, w2)
      JOIN uni_counts uc USING (w1)
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           FLOOR(CAST(SUM(logp) AS DOUBLE) / COUNT(*) * 1e4 + 0.5) / 1e4
             AS avg_logp
    FROM scored GROUP BY doc_id
    """,
)
def text_perplexity_proxy(spark, sf_dir):
    """Per-document LM quality score: mean log-probability of the
    document's bigrams under the corpus's own bigram model — the
    CCNet/Gopher-style "perplexity filter" signal that separates
    fluent text from gibberish, computed without any external model.
    (Every bigram here appears in the corpus model by construction, so
    the 1e-6 backoff floor never fires on this data; the constant
    documents the convention for scoring NEW text against a frozen
    model.)

    Scale shape: the bigram LM is ONE aggregation over the corpus
    (c12), its denominator derives from c12 itself (no second corpus
    pass), and scoring re-joins the doc bigram stream on (w1,w2) —
    stop-word-headed bigrams are the skew case AQE's skew join splits.
    Cross-engine determinism: each bigram's log-prob is a pure
    function of two integer counts, rounded to 6 dp BEFORE the
    per-doc mean accumulates in DECIMAL(18,6)."""
    d = t(spark, sf_dir, "documents")
    tk = F.split(F.lower(F.trim(F.col("text"))), "\\s+")
    toks = d.select("doc_id", tk.alias("tk")).filter(F.size("tk") >= 2)
    tkc = F.col("tk")
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(tkc) - 1),
                lambda i: F.struct(
                    F.element_at(tkc, i).alias("w1"),
                    F.element_at(tkc, i + 1).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    big_counts = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni_counts = big_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    logp = F.round(F.log(F.col("c12") / F.col("c1")), 6).cast("decimal(18,6)")
    return (
        bigrams.join(big_counts, ["w1", "w2"])
        .join(uni_counts, "w1")
        .select("doc_id", logp.alias("logp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            # DECIMAL-sum / COUNT division scale rules differ across
            # engines (the ts_resample_linear_interp divergence class):
            # cast the exact sum to double FIRST, then floor-round the
            # identical IEEE quotient on both sides.
            (
                F.floor(
                    F.sum("logp").cast("double")
                    / F.count("*")
                    * F.lit(1e4)
                    + F.lit(0.5)
                )
                / F.lit(1e4)
            ).alias("avg_logp"),
        )
    )


_BOILER_NGRAM = 8
_BOILER_DF = 5


@query(
    "text_boilerplate_shingle_ratio",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
      FROM documents
    ), shingles AS (
      SELECT DISTINCT doc_id,
             array_to_string(tk[u.i : u.i + {_BOILER_NGRAM} - 1], ' ') AS sh
      FROM toks, unnest(range(1, len(tk) - {_BOILER_NGRAM} + 2)) AS u(i)
      WHERE len(tk) >= {_BOILER_NGRAM}
    ), df AS (
      SELECT sh, COUNT(*) AS n_docs FROM shingles GROUP BY sh
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (WHERE df.n_docs >= {_BOILER_DF}) AS BIGINT)
             AS n_boiler,
           CAST(ROUND(COUNT(*) FILTER (WHERE df.n_docs >= {_BOILER_DF})
                 * 1.0 / COUNT(*), 4) AS DOUBLE) AS boiler_ratio
    FROM shingles s JOIN df USING (sh)
    GROUP BY s.doc_id
    """,
)
def text_boilerplate_shingle_ratio(spark, sf_dir):
    """Boilerplate contamination score: the fraction of each doc's
    distinct 8-gram shingles that recur in ≥5 documents — the
    RefinedWeb/C4-style repeated-passage signal (headers, footers,
    licence blocks) that line-level dedup catches in web corpora,
    expressed over shingles since this corpus has no line structure.
    Docs with high ratios are boilerplate-dominated and get dropped or
    trimmed before training.

    Scale shape: per-doc shingling is map-side; ONE aggregation
    builds the shingle document-frequency table; the scoring re-join
    shuffles on the shingle hash. The DISTINCT inside the shingle CTE
    bounds a doc's contribution to any shingle at 1, so a single
    pathological doc cannot inflate df."""
    d = t(spark, sf_dir, "documents")
    tk = F.split(F.lower(F.trim(F.col("text"))), "\\s+")
    tkc = F.col("tk")
    shingles = (
        d.select("doc_id", tk.alias("tk"))
        .filter(F.size("tk") >= _BOILER_NGRAM)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(tkc) - _BOILER_NGRAM + 1),
                    lambda i: F.array_join(
                        F.slice(tkc, i, _BOILER_NGRAM), " "
                    ),
                )
            ).alias("sh"),
        )
        .distinct()
    )
    df = shingles.groupBy("sh").agg(F.count("*").alias("n_docs"))
    boiler = (F.col("n_docs") >= _BOILER_DF).cast("long")
    return (
        shingles.join(df, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(boiler).alias("n_boiler"),
            F.round(F.sum(boiler) / F.count("*"), 4)
            .cast("double")
            .alias("boiler_ratio"),
        )
    )


_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QUERY = ("spark", "hash", "window")
_BM25_TOPK = 20


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_QUERY)
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
      FROM documents
    ), lens AS (
      SELECT doc_id, len(tk) AS dl FROM toks
    ), stats AS (
      SELECT COUNT(*) AS n_docs,
             FLOOR(AVG(dl) * 100 + 0.5) / 100 AS avgdl_q FROM lens
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS f
      FROM (SELECT doc_id, unnest(tk) AS tok FROM toks)
      WHERE tok IN ({terms})
      GROUP BY doc_id, tok
    ), df AS (
      SELECT tok, COUNT(*) AS n_t FROM tf GROUP BY tok
    ), scored AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               ROUND(LN((stats.n_docs - df.n_t + 0.5) / (df.n_t + 0.5) + 1), 6)
               * (tf.f * ({_BM25_K1} + 1))
               / (tf.f + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * lens.dl
                  / stats.avgdl_q)),
             6) AS DECIMAL(18,6)) AS term_score
      FROM tf
      JOIN df USING (tok)
      JOIN lens USING (doc_id)
      CROSS JOIN stats
    )
    SELECT doc_id, CAST(SUM(term_score) AS DOUBLE) AS bm25,
           CAST(COUNT(*) AS INT) AS n_query_terms_hit
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT {_BM25_TOPK}
    """


@query("text_bm25_topk", oracle=_bm25_oracle())
def text_bm25_topk(spark, sf_dir):
    """BM25 retrieval scoring — the standard lexical ranker (tf
    saturation via k1, doc-length normalization via b) a step above
    raw TF-IDF (``tfidf_top_terms``): top-20 documents for a fixed
    3-term query. This is the retrieval half of RAG data prep: score,
    rank, keep the head.

    Scale shape: TWO corpus scans — the tf pass (only tokens MATCHING
    the query survive the explode, and each doc's length rides along
    as max(dl) so no separate per-doc length join is needed) and the
    corpus-stats pass (N and avgdl must see ALL docs, matching or
    not). The tf match set is persisted — term df derives from it by
    a 3-row groupBy instead of re-running the scan+explode, and its
    footprint is |query terms| × matching docs, the retrieval
    candidate set (the first form re-scanned the corpus for df, the
    length join, and stats: plan_audit showed scans=4). Cross-engine
    determinism: idf rounds to 6 dp before use (the perplexity
    convention), avgdl floor-quantizes to 2 dp, per-term scores round
    to 6 dp and sum in DECIMAL."""
    d = t(spark, sf_dir, "documents")
    tk = F.split(F.lower(F.trim(F.col("text"))), "\\s+")
    stats = d.select(F.size(tk).alias("dl")).agg(
        F.count("*").alias("n_docs"),
        (F.floor(F.avg("dl") * 100 + F.lit(0.5)) / 100).alias("avgdl_q"),
    )
    tf = (
        d.select("doc_id", F.size(tk).alias("dl"), F.explode(tk).alias("tok"))
        .filter(F.col("tok").isin(*_BM25_QUERY))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("f"), F.max("dl").alias("dl"))
        .persist()
    )
    df = tf.groupBy("tok").agg(F.count("*").alias("n_t"))
    idf = F.round(
        F.log(
            (F.col("n_docs") - F.col("n_t") + 0.5) / (F.col("n_t") + 0.5) + 1
        ),
        6,
    )
    norm = F.col("f") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl_q")
    )
    term_score = F.round(
        idf * (F.col("f") * (_BM25_K1 + 1)) / norm, 6
    ).cast("decimal(18,6)")
    return (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_score.alias("term_score"))
        .groupBy("doc_id")
        .agg(
            F.sum("term_score").cast("double").alias("bm25"),
            F.count("*").cast("int").alias("n_query_terms_hit"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_BM25_TOPK)
    )
