"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship nested eventization query;
``queries()`` / ``oracle_sql()`` expose the engine's declared operator
surface from ``caliper_poc_data_etl_spark.queries`` (each operator =
Spark builder + DuckDB oracle twin; rows-only ops have no oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The item-pipeline plan shape (SURVEY.md §7.1 P1) over lineitem:
    scan → project → nested OutcomeEvent structs → shuffle → ordered
    collect_list per order.
    """
    from caliper_poc_data_etl_spark.queries.caliper import outcome_events_nested

    return outcome_events_nested(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from caliper_poc_data_etl_spark.queries import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins (omitted for non-SQL-expressible ops)."""
    from caliper_poc_data_etl_spark.queries import oracle_queries

    return oracle_queries()
