"""Sinks: partitioned, overwrite-atomic file writes.

Replaces the reference's rimraf + unbounded concurrent ``fs.writeFile``
sink (``etl.js:39-45,115-125``), which silently lost 80% of writes at
100k rows (SURVEY.md F5), with Spark's job-commit protocol: atomic
overwrite, retries, and backpressure for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_grouped_json(
    df: DataFrame,
    target: str,
    *,
    key: str = "attempt_id",
    layout: str = "spark",
) -> None:
    """Write one JSON document stream per group key.

    - ``layout='spark'`` (default): ``partitionBy(key)`` JSON-lines —
      the idiomatic equivalent of the reference's file-per-group;
      directory per key, null fields pruned.
    - ``layout='reference'``: byte-parity content — each row's
      ``events`` array serialized as ONE JSON-array text line per
      group, matching the reference's ``JSON.stringify(events)`` files
      (file *naming* is declared non-semantic, SURVEY.md §7.3).

    The ``repartition(key)`` before ``partitionBy`` yields one file per
    key directory instead of one-per-input-partition; at 100 TB this is
    also what bounds the file count (files ≈ distinct keys, not
    keys × tasks).
    """
    if layout == "reference":
        (
            df.select(F.col(key), F.to_json(F.col("events")).alias("value"))
            .repartition(F.col(key))
            .write.mode("overwrite")
            .partitionBy(key)
            .text(target)
        )
    elif layout == "spark":
        (
            df.repartition(F.col(key))
            .write.mode("overwrite")
            .option("ignoreNullFields", True)
            .partitionBy(key)
            .json(target)
        )
    else:
        raise ValueError(f"layout must be 'spark' or 'reference', got {layout!r}")


def write_parquet(
    df: DataFrame,
    target: str,
    *,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink with overwrite (generalized S18)."""
    writer = df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(target)
