"""Byte-parity ("fidelity") scans: raw lines + the reference regexes.

Spark's CSV datasource null-pads wrong-arity rows instead of treating
them as malformed, so DROPMALFORMED alone cannot reproduce the
reference's validate-by-regex-and-drop scan (SURVEY.md S4-S6: short
rows dropped; greedy group 14 absorbing commas/extra columns; empty
fields dropping whole rows in the assessments pipeline). These readers
reproduce it exactly, as anticipated in SURVEY.md §4.2.4: a
distributed raw-line scan + ``regexp_extract`` per capture group —
still pure Column expressions, no Python UDFs.

Patterns mirror reference ``etl.js:11`` and
``etl-assessment-level.js:18`` (semantics, not code: 13×``([^,]*)`` +
greedy ``(.*)`` + 2×``([0-9.]*)`` anchored at start only; and
13×``(.+)`` unanchored). Java and JS regex agree on all the measured
edge behaviors here (greedy backtracking, ``find()``-style matching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from caliper_poc_data_etl_spark.schemas import (
    ASSESSMENT_ITEMS_COLUMNS,
    ASSESSMENTS_COLUMNS,
)

# 16 groups: cols 1-13 comma-free, col 14 greedy free-text, cols 15-16
# digits-and-dots (what makes multi-valued `101;102` unreachable — F2).
ITEMS_LINE_PATTERN = (
    "^" + ",".join(["([^,]*)"] * 13) + "," + ",".join(["(.*)", "([0-9.]*)", "([0-9.]*)"])
)

# 13 non-empty groups, unanchored: any empty field kills the row; >13
# fields silently misalign (leading group absorbs extras) — S5.
ASSESSMENTS_LINE_PATTERN = ",".join(["(.+)"] * 13)


def raw_lines(spark: SparkSession, path: str, *, skip_header: bool = True) -> DataFrame:
    """Distributed raw-line read with per-file first-line skip.

    Implemented as a CSV read with a delimiter that cannot occur in
    the data (``\\x01``) and quoting disabled: each physical line
    arrives as one string column, and ``header=True`` drops the first
    line of every file — the reference's ``.slice(1)`` generalized to
    a multi-file distributed scan.
    """
    return (
        spark.read.schema("value string")
        .option("header", skip_header)
        .option("sep", "\x01")
        .option("quote", "")
        .csv(path)
    )


def _extract(lines: DataFrame, pattern: str, columns: list[str]) -> DataFrame:
    matched = lines.filter(F.col("value").rlike(pattern))
    return matched.select(
        *[
            F.regexp_extract(F.col("value"), pattern, i + 1).alias(name)
            for i, name in enumerate(columns)
        ]
    )


def read_items_fidelity(spark: SparkSession, path: str) -> DataFrame:
    """assessment_items scan with exact reference parse semantics."""
    return _extract(
        raw_lines(spark, path), ITEMS_LINE_PATTERN, ASSESSMENT_ITEMS_COLUMNS
    )


def read_assessments_fidelity(spark: SparkSession, path: str) -> DataFrame:
    """assessments scan with exact reference parse semantics."""
    return _extract(
        raw_lines(spark, path), ASSESSMENTS_LINE_PATTERN, ASSESSMENTS_COLUMNS
    )
