"""Readers: parquet / CSV / JSON with explicit schemas and row policies.

Reference parity notes:

- The reference reads whole files into heap and validates rows with a
  regex, silently dropping non-matching rows (``etl.js:22,73-74``).
  Spark's CSV datasource replaces that with splittable scans plus a
  *named* policy: ``dropmalformed`` (reference-faithful silent drop) or
  ``permissive`` (corrupt rows observable in ``_corrupt_record`` — the
  engine default, because silent loss is how the reference lost 80% of
  its output at 100k rows, SURVEY.md F5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

CORRUPT_COL = "_corrupt_record"


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan; Catalyst pushes predicates/projection into it."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    mode: str = "permissive",
    keep_corrupt: bool = False,
) -> DataFrame:
    """CSV scan with an explicit schema and malformed-row policy.

    ``mode='dropmalformed'`` reproduces the reference's
    validate-by-regex-and-drop semantics (``etl.js:73-74``) without the
    silence being mandatory; ``mode='permissive'`` (default) keeps bad
    rows visible. With ``keep_corrupt=False`` corrupt rows are filtered
    out but the filter is an explicit, observable plan node.

    Spark restriction to know: on the permissive path, a query that
    prunes every DATA column (e.g. a bare ``df.count()``) is rejected
    by Spark ("queries from raw CSV files are disallowed when the
    referenced columns only include the internal corrupt record
    column") — reference a data column or use ``dropmalformed`` for
    pure row counting.
    """
    mode = mode.lower()
    if mode not in {"permissive", "dropmalformed", "failfast"}:
        raise ValueError(f"unknown CSV mode: {mode}")
    read_schema = schema
    if mode == "permissive":
        read_schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    df = (
        spark.read.schema(read_schema)
        .option("header", header)
        .option("mode", mode.upper())
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    if mode == "permissive" and not keep_corrupt:
        df = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return df


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same pushdown/pruning properties as parquet."""
    return spark.read.orc(path)


def read_text(
    spark: SparkSession, path: str, *, whole_text: bool = False
) -> DataFrame:
    """Raw line scan (``value: string``) — the substrate for the
    regex-fidelity parser (sources/fidelity.py) and for any custom
    record format. ``whole_text=True`` reads one row per file (the
    reference's whole-file read, etl.js:22 — anti-pattern at scale,
    provided for parity experiments only). NB: must be the reader
    keyword — a generic .option("wholetext", ...) is silently ignored
    by the text source."""
    return spark.read.text(path, wholetext=whole_text)


def sf_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-provided parquet table from a scale-factor dir.

    ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark reads as a
    nanos long (``nanosAsLong``); convert to a microsecond timestamp
    with exact integer division (nanos exceed 2^53 — float division
    would corrupt them). Micro truncation matches engines whose native
    precision is micros (DuckDB).

    ``nanosAsLong`` is set here, on the *caller's* session, not only in
    :func:`session.get_spark` — the reader must work from any vanilla
    SparkSession (a grading driver, a notebook), where the plain
    ``spark.read.parquet`` would otherwise throw ``PARQUET_TYPE_ILLEGAL``
    on TIMESTAMP(NANOS) columns. It is a runtime-settable SQL conf.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # non-fatal: older/newer Spark without the conf
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, T.TimestampNTZType):
            # TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as NTZ;
            # normalize to TIMESTAMP (LTZ) so event-time watermarks and
            # epoch functions (unix_micros) accept it. The cast
            # interprets the naive value in the session timezone —
            # wall-clock (and every formatted output) is unchanged.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def sf_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all driver tables and register them as temp views."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = sf_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
