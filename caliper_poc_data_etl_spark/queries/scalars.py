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
    """,
)
def fn_math_pack(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
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
