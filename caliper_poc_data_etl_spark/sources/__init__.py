"""Source connectors: schema-explicit, policy-driven scans.

Generalizes the reference's scan surface (whole-file read + regex
validation, reference ``etl.js:22-37``) into declarative Spark reads:
splittable, predicate-pushdown-capable, and with an explicit
malformed-row policy instead of silent drops.
"""

from caliper_poc_data_etl_spark.sources.readers import (  # noqa: F401
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    sf_table,
    sf_tables,
)
