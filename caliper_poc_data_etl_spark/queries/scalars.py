"""Scalar function packs: string / date / math / array / map / JSON.

SURVEY.md §2B "Scalar fns" row — generalizes the reference's handful
of scalar ops (S10-S13) into the full built-in function surface. All
JVM-side ``pyspark.sql.functions``; zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from caliper_poc_data_etl_spark.queries.registry import query, t


@query(
    "fn_string_pack",
    oracle="""
    SELECT c_custkey,
           length(c_name)                       AS name_len,
           upper(c_mktsegment)                  AS seg_upper,
           lower(c_mktsegment)                  AS seg_lower,
           substr(c_name, 10, 4)                AS name_mid,
           concat(c_mktsegment, '-', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           trim('  ' || c_mktsegment || ' ')    AS trimmed,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           replace(c_name, 'Customer', 'C')     AS short_name,
           split_part(c_name, '#', 2)           AS name_number,
           starts_with(c_name, 'Customer')      AS is_customer,
           contains(c_mktsegment, 'MACH')       AS has_mach
    FROM customer
    """,
)
def fn_string_pack(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.length("c_name").alias("name_len"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 10, 4).alias("name_mid"),
        F.concat_ws("-", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "trimmed"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.regexp_replace("c_name", "Customer", "C").alias("short_name"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_number"),
        F.startswith(F.col("c_name"), F.lit("Customer")).alias("is_customer"),
        F.contains(F.col("c_mktsegment"), F.lit("MACH")).alias("has_mach"),
    )


@query(
    "fn_date_pack",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)     AS yr,
           CAST(month(o_orderdate) AS INT)    AS mth,
           CAST(day(o_orderdate) AS INT)      AS dy,
           CAST(quarter(o_orderdate) AS INT)  AS qtr,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT)
             AS days_since_1995,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders
    """,
)
def fn_date_pack(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mth"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_1995"
        ),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias(
            "month_end"
        ),
    )


@query(
    "fn_math_pack",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(abs(l_discount - 0.05), 4)        AS abs_disc,
           CAST(ceil(l_extendedprice) AS BIGINT)   AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT)  AS price_floor,
           ROUND(sqrt(l_quantity), 6)              AS qty_sqrt,
           ROUND(ln(l_extendedprice), 6)           AS price_ln,
           ROUND(log10(l_extendedprice), 6)        AS price_log10,
           ROUND(pow(l_quantity, 2), 2)            AS qty_sq,
           l_linenumber % 3                        AS line_mod,
           CAST(sign(l_discount - 0.05) AS INT)    AS disc_sign,
           ROUND(greatest(l_tax, l_discount), 4)   AS max_rate,
           ROUND(least(l_tax, l_discount), 4)      AS min_rate
    FROM lineitem
    WHERE l_orderkey % 101 = 0
    """,
)
def fn_math_pack(spark, sf_dir):
    """Scalar math-function pack, graded on a keyed deterministic
    sample (l_orderkey % 101 — the same rows on both engines, VERDICT
    r11 #7): the check is per-row function parity, so its power is
    unchanged while the full-corpus row echo that dominated the sweep
    entry (~30 s of result comparison at sf0.1) disappears. The
    expressions still run corpus-wide in any real plan; the filter is
    a pushed-down scan predicate here."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("abs_disc"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.round(F.greatest("l_tax", "l_discount"), 4).alias("max_rate"),
        F.round(F.least("l_tax", "l_discount"), 4).alias("min_rate"),
    )


@query(
    "fn_array_pack",
    oracle="""
    SELECT vec_id,
           len(embedding)                                          AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6)                  AS first_elem,
           ROUND(CAST(list_sum(embedding) AS DOUBLE), 4)           AS vec_sum,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6)           AS vec_max,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 6)           AS vec_min,
           len(list_filter(embedding, x -> x > 0))                 AS n_positive,
           ROUND(CAST(list_sum(list_transform(embedding, x -> x * x)) AS DOUBLE), 4)
             AS sq_norm
    FROM embeddings
    """,
)
def fn_array_pack(spark, sf_dir):
    """Array transform/filter/aggregate over the embedding column —
    the native-Column path for vector math (no UDF)."""
    e = t(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    as_double = F.transform(vec, lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(vec).alias("dim"),
        F.round(F.element_at(vec, 1).cast("double"), 6).alias("first_elem"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
        F.round(F.array_max(vec).cast("double"), 6).alias("vec_max"),
        F.round(F.array_min(vec).cast("double"), 6).alias("vec_min"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("sq_norm"),
    )


@query(
    "fn_json_pack",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_value,
           CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
           json_extract_string(props, '$.missing') AS missing_field
    FROM events
    """,
)
def fn_json_pack(spark, sf_dir):
    """JSON extraction over the events.props payload column."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("k_value"),
        (k % 10).alias("k_mod"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
    )


@query(
    "fn_map_pack",
    oracle="""
    SELECT o_custkey, o_orderstatus AS status, COUNT(*) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def fn_map_pack(spark, sf_dir):
    """Map construction + explosion round-trip: per-customer
    status→count map built with map_from_entries, then exploded back
    to rows — the oracle checks the scalars that survive the
    round-trip, so a broken map op can't hide."""
    o = t(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey", "o_orderstatus").agg(F.count("*").alias("n"))
    mapped = per.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("o_orderstatus"), F.col("n")))
        ).alias("status_counts")
    )
    return mapped.select(
        "o_custkey", F.explode("status_counts").alias("status", "n")
    )


@query(
    "fn_conditional_pack",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
           CASE o_orderpriority WHEN '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def fn_conditional_pack(spark, sf_dir):
    """CASE/WHEN, NULLIF, COALESCE — the S13 type-dispatch generalized."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
        ).alias("status_label"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias(
            "is_urgent"
        ),
    )


@query(
    "agg_bit_aggregate_pack",
    oracle="""
    SELECT event_type,
           CAST(bit_or(event_id) AS BIGINT) AS id_bits_or,
           CAST(bit_and(event_id) AS BIGINT) AS id_bits_and,
           CAST(bit_xor(event_id) AS BIGINT) AS id_bits_xor,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_bit_aggregate_pack(spark, sf_dir):
    """Bitwise aggregates (OR/AND/XOR fold over a key column) — the
    primitives behind bitmap presence masks and parity checksums.
    Commutative + associative, so map-side partials combine exactly
    regardless of partitioning (the same order-independence argument
    as integer SUM, but for bit algebra)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.bit_or("event_id").alias("id_bits_or"),
            F.bit_and("event_id").alias("id_bits_and"),
            F.bit_xor("event_id").alias("id_bits_xor"),
            F.count("*").alias("n"),
        )
    )


@query(
    "fn_hash_pack",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           md5(CAST(doc_id AS VARCHAR) || ':' || lang) AS keyed_md5
    FROM documents
    """,
)
def fn_hash_pack(spark, sf_dir):
    """Cryptographic hash surface (md5 / sha256 / keyed concat) — the
    engine-agnostic fingerprint functions every dedup and shard-split
    operator builds on (xxhash64 is faster but engine-specific; these
    are the portable tier, proven byte-identical cross-engine here).
    Row-local, codegen'd, zero shuffle."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.col("lang"))).alias(
            "keyed_md5"
        ),
    )


@query(
    "fn_format_pack",
    oracle="""
    SELECT o_orderkey,
           printf('%05d|%s', o_orderkey % 100000, o_orderstatus) AS tagged,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded,
           translate(o_orderpriority, '-', ' ') AS spaced,
           repeat(o_orderstatus, 3) AS tripled,
           reverse(o_orderpriority) AS reversed
    FROM orders WHERE o_orderkey % 97 = 0
    """,
)
def fn_format_pack(spark, sf_dir):
    """String formatting pack (printf-style format, pad, translate,
    repeat, reverse) — report/key-building scalar surface. Integer and
    string operands only: float printf formatting is locale/rounding
    territory and stays out of the parity contract."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    return o.select(
        "o_orderkey",
        F.format_string(
            "%05d|%s", F.col("o_orderkey") % 100000, F.col("o_orderstatus")
        ).alias("tagged"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("padded"),
        F.translate("o_orderpriority", "-", " ").alias("spaced"),
        F.repeat("o_orderstatus", 3).alias("tripled"),
        F.reverse("o_orderpriority").alias("reversed"),
    )


@query(
    "fn_datetime_extra_pack",
    oracle="""
    SELECT o_orderkey,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d')
             AS quarter_start
    FROM orders WHERE o_orderkey % 97 = 0
    """,
)
def fn_datetime_extra_pack(spark, sf_dir):
    """Calendar scalar pack (month-end, quarter, day-of-year, ISO
    week, month arithmetic with end-of-month clamping, quarter
    truncation) — the date dimension surface beyond fn_date_pack.
    add_months and DuckDB's +INTERVAL MONTH share the same clamp
    convention (Jan 31 + 1 month = Feb 29), proven by the hash
    match."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).alias("qtr"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("iso_week"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3mo"),
        F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias(
            "quarter_start"
        ),
    )


@query(
    "fn_string_distance_pack",
    oracle="""
    SELECT doc_id,
           CAST(levenshtein(substr(lower(trim(text)), 1, 16),
                            substr(lower(trim(text)), 17, 16)) AS INT)
             AS lev_halves,
           CAST(levenshtein(lang, 'en') AS INT) AS lev_lang,
           CAST(length(text) AS BIGINT) AS len
    FROM documents
    """,
)
def fn_string_distance_pack(spark, sf_dir):
    """Edit-distance scalar surface (levenshtein) — the verification
    primitive fuzzy-matching pipelines apply AFTER a blocking stage
    (never as an n² scan; see text_dedup_prefix_key for the blocking
    side). Exercised row-locally here: distance between a document's
    first two 16-char windows plus a constant-target distance —
    integer-exact cross-engine."""
    d = t(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    return d.select(
        "doc_id",
        F.levenshtein(F.substring(norm, 1, 16), F.substring(norm, 17, 16)).alias(
            "lev_halves"
        ),
        F.levenshtein(F.col("lang"), F.lit("en")).alias("lev_lang"),
        F.length("text").alias("len"),
    )


@query(
    "fn_url_pack",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://ex-' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&n=' || n_chars AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
           CAST(regexp_extract(url, '[?&]n=([^&]*)', 1) AS BIGINT) AS n_param
    FROM u
    """,
)
def fn_url_pack(spark, sf_dir):
    """URL parsing pack over synthesized per-document URLs: host,
    path, and query-parameter extraction — the web-corpus metadata
    columns (domain for source mixing, path for crawl dedup, params
    for tracker-param removal) every web-scale pipeline derives first.
    The Spark side uses the NATIVE ``parse_url`` expression (JVM
    codegen, java.net.URI semantics); the oracle mirrors with
    regexes, pinned equivalent for this URL shape."""
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://ex-"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url("url", F.lit("QUERY"), F.lit("n"))
        .cast("long")
        .alias("n_param"),
    )


@query(
    "fn_higher_order_pack",
    oracle="""
    WITH base AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)
               * 1000) AS BIGINT)) AS q
      FROM embeddings
    )
    SELECT vec_id,
           CAST(len(list_filter(q, x -> x > 0)) AS INT) AS n_positive,
           list_sum(list_transform(q, x -> abs(x)))::BIGINT AS l1_q,
           CAST(len(q) > 0 AND list_bool_and(list_transform(q,
             x -> abs(x) <= 1000)) AS BOOLEAN) AS all_small,
           CAST(list_bool_or(list_transform(q, x -> abs(x) > 500))
             AS BOOLEAN) AS any_large,
           list_sum(list_transform(list_zip(q[1:8], q[2:9]),
             p -> CASE WHEN (p[1] > 0) <> (p[2] > 0)
                  THEN 1 ELSE 0 END))::BIGINT AS head_sign_flips
    FROM base
    """,
)
def fn_higher_order_pack(spark, sf_dir):
    """Higher-order array functions as declared surface — transform,
    filter, exists, forall, aggregate (fold), zip_with — the lambda
    toolkit every array-valued column (embeddings, token lists,
    shingle sets) is processed with, all JVM-side codegen (the whole
    point: lambdas compile into the plan, they are NOT Python UDFs).
    Computed over integer-quantized embeddings so every result is
    engine-exact; the zip_with term counts sign flips between adjacent
    head components — the paired-lambda shape."""
    e = t(spark, sf_dir, "embeddings")
    q = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
    )
    base = e.select("vec_id", q.alias("q"))
    qc = F.col("q")
    head, tail = F.slice(qc, 1, 8), F.slice(qc, 2, 8)
    flips = F.aggregate(
        F.zip_with(
            head,
            tail,
            lambda a, b: ((a > 0) != (b > 0)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return base.select(
        "vec_id",
        F.size(F.filter(qc, lambda x: x > 0)).alias("n_positive"),
        F.aggregate(
            F.transform(qc, lambda x: F.abs(x)),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("l1_q"),
        ((F.size(qc) > 0) & F.forall(qc, lambda x: F.abs(x) <= 1000)).alias(
            "all_small"
        ),
        F.exists(qc, lambda x: F.abs(x) > 500).alias("any_large"),
        flips.alias("head_sign_flips"),
    )
