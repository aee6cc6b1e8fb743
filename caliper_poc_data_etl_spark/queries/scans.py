"""Source-format scan operators, oracle-checked (§2B Source rows).

Each query materializes one driver table into the target format under
/tmp once per process, then reads it back through the engine's reader
with its policy surface — the oracle is plain SQL over the original
parquet, so a lossy or misparsing format round-trip cannot pass.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from caliper_poc_data_etl_spark.queries.registry import query, t
from caliper_poc_data_etl_spark.sources import read_csv, read_json, read_orc

_CACHE: dict[str, str] = {}


def _materialized(spark, sf_dir: str, fmt: str) -> str:
    """Write `nation` (+ a decimal column) as `fmt` once per (sf, fmt)."""
    cache_key = f"{sf_dir}:{fmt}"
    if cache_key not in _CACHE:
        out = tempfile.mkdtemp(prefix=f"scan_{fmt}_")
        path = os.path.join(out, f"nation.{fmt}")
        n = t(spark, sf_dir, "nation")
        w = n.coalesce(1).write.mode("overwrite").format(fmt)
        if fmt == "csv":
            w = w.option("header", True)
        w.save(path)
        _CACHE[cache_key] = path
    return _CACHE[cache_key]


_NATION_ORACLE = """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
"""


@query("scan_csv_policy", oracle=_NATION_ORACLE)
def scan_csv_policy(spark, sf_dir):
    """CSV scan with explicit schema + PERMISSIVE corrupt-row policy
    (S1/S4-S6 generalized) — round-trips the nation table through CSV
    and must reproduce the parquet original exactly."""
    path = _materialized(spark, sf_dir, "csv")
    schema = t(spark, sf_dir, "nation").schema
    return read_csv(spark, path, schema).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query("scan_json_source", oracle=_NATION_ORACLE)
def scan_json_source(spark, sf_dir):
    """JSON scan with explicit schema — same round-trip contract."""
    path = _materialized(spark, sf_dir, "json")
    schema = t(spark, sf_dir, "nation").schema
    return read_json(spark, path, schema).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query("scan_orc_source", oracle=_NATION_ORACLE)
def scan_orc_source(spark, sf_dir):
    """ORC scan — columnar round-trip."""
    path = _materialized(spark, sf_dir, "orc")
    return read_orc(spark, path).select("n_nationkey", "n_name", "n_regionkey")


@query(
    "scan_csv_malformed_policy",
    oracle="SELECT CAST(2 AS BIGINT) AS good_rows, CAST(1 AS BIGINT) AS bad_rows",
)
def scan_csv_malformed_policy(spark, sf_dir):
    """The malformed-row policy itself: a fixture with one corrupt row
    (wrong arity) read PERMISSIVE — good rows survive, the corrupt row
    is counted, nothing is silent (vs the reference's silent drops,
    SURVEY.md S6/F5)."""
    cache_key = f"{sf_dir}:malformed"
    if cache_key not in _CACHE:
        out = tempfile.mkdtemp(prefix="scan_bad_")
        p = os.path.join(out, "bad.csv")
        with open(p, "w") as f:
            f.write("a,b,c\n1,x,2\nonly-one-field-without-delims-extra\n3,y,4\n")
        _CACHE[cache_key] = p
    from pyspark.sql import types as T

    st = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.IntegerType()),
        ]
    )
    df = read_csv(spark, _CACHE[cache_key], st, keep_corrupt=True)
    # Count via a data column too — Spark rejects queries whose only
    # referenced column is the internal corrupt-record column.
    return df.agg(
        F.count("a").alias("good_rows"),
        F.count("_corrupt_record").alias("bad_rows"),
    )


@query(
    "scan_schema_evolution",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 2) AS totalprice,
           CAST(NULL AS BIGINT) AS priority_len
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey,
           CAST(NULL AS DOUBLE),
           CAST(length(o_orderpriority) AS BIGINT)
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def scan_schema_evolution(spark, sf_dir):
    """Schema-evolution scan: two parquet batches written with
    DIFFERENT schemas (an early batch with ``totalprice``, a later
    batch that dropped it and added ``priority_len``) read back as ONE
    dataset with ``mergeSchema`` — each row surfaces the union schema
    with NULLs for the columns its batch lacks. This is the
    long-lived-dataset reality (columns appear and retire over years
    of a 100 TB table's life); the oracle mirrors the union-by-name
    semantics directly over the source table.

    The staged batches land at a STABLE per-session path
    (applicationId-keyed, overwritten in place — the
    join_bucketed_colocated convention, no temp-dir leak). Footer
    merging is a metadata operation; the data files are scanned once,
    in parallel, with pruning intact."""
    import tempfile

    app = spark.sparkContext.applicationId.replace("-", "_")
    base = f"{tempfile.gettempdir()}/graft_evo_{app}"
    o = t(spark, sf_dir, "orders")
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("totalprice")
    ).write.mode("overwrite").parquet(f"{base}/batch=1")
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        F.length("o_orderpriority").cast("long").alias("priority_len"),
    ).write.mode("overwrite").parquet(f"{base}/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/batch=1", f"{base}/batch=2"
    )
    return merged.select("o_orderkey", "totalprice", "priority_len")


@query(
    "scan_text_source",
    oracle="""
    SELECT doc_id, length(text) AS line_len,
           string_split_regex(text, '\\s+')[1] AS first_token
    FROM documents
    """,
)
def scan_text_source(spark, sf_dir):
    """Raw-text-file ingestion (``spark.read.text``): documents staged
    as tab-framed text lines (one record per line — the log-file /
    WET-extract shape), read back as unparsed ``value`` strings and
    re-framed with a split. This is S2 record framing against the
    TEXT source, completing the format matrix (CSV, JSON, ORC,
    parquet, text, XML). Line-oriented text splits by newline at any
    scale; the frame parse is one projection, no shuffle."""
    import tempfile

    app = spark.sparkContext.applicationId.replace("-", "_")
    base = f"{tempfile.gettempdir()}/graft_text_{app}"
    d = t(spark, sf_dir, "documents")
    d.select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), "text").alias("value")
    ).write.mode("overwrite").text(base)
    lines = spark.read.text(base)
    parts = F.split(F.col("value"), "\t", 2)
    return lines.select(
        parts.getItem(0).cast("long").alias("doc_id"),
        F.length(parts.getItem(1)).alias("line_len"),
        F.split(parts.getItem(1), "\\s+").getItem(0).alias("first_token"),
    )


@query(
    "scan_xml_source",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS totalprice
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def scan_xml_source(spark, sf_dir):
    """XML ingestion via Spark 4's NATIVE xml data source: an orders
    subset staged as ``<order>`` row elements, read back with
    ``rowTag`` framing and a typed schema. XML is the format of
    record for the enterprise feeds (SEC filings, PubMed, legacy ERP
    exports) that still seed many corpora; rowTag framing splits
    records without parsing the whole document, so the read
    parallelizes like any line-oriented source."""
    import tempfile

    app = spark.sparkContext.applicationId.replace("-", "_")
    base = f"{tempfile.gettempdir()}/graft_xml_{app}"
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    o.select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("totalprice")
    ).write.mode("overwrite").format("xml").option("rootTag", "orders").option(
        "rowTag", "order"
    ).save(base)
    return (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema("o_orderkey long, o_orderstatus string, totalprice double")
        .load(base)
        .select("o_orderkey", "o_orderstatus", "totalprice")
    )
