"""caliper_poc_data_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL (``facundoj/caliper-poc-data-etl``): CSV → validated,
typed DataFrames → nested Caliper-style event documents → partitioned
JSON sinks — generalized into a reusable operator library (relational
closure, window/agg/join surface, dedup, similarity search, text
analysis, streaming) designed for 100 TB scale.

Everything here is built on the public Apache Spark DataFrame/SQL API;
logical plans are declared declaratively and physical strategy is left
to Catalyst/Tungsten (AQE on). No Python UDFs on any hot path.
"""

__version__ = "0.1.0"

from caliper_poc_data_etl_spark.session import get_spark  # noqa: F401
