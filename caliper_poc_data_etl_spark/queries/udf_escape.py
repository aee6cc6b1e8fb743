"""The documented UDF escape hatch (SURVEY.md §2B last row).

Engine policy: **no Python on the hot path** — every shipped operator
is native Column/SQL (tools/plan_audit.py enforces no BatchEvalPython
anywhere). When user logic genuinely cannot be expressed in Columns,
the sanctioned escape hatch is an Arrow-batched ``pandas_udf`` (or
``mapInPandas`` for many-to-many shapes — see ``multimodal.py``):
vectorized over record batches, ~10-100× faster than row-at-a-time
``F.udf``, and visible in plans as ArrowEvalPython.

The example below is intentionally one we ALSO have natively
(`similarity._dot`): the pandas_udf twin is oracle-checked against
DuckDB, and the pytest suite asserts it agrees with the native path —
demonstrating the hatch without ever needing it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F, types as T

from caliper_poc_data_etl_spark.queries.registry import query, t


@F.pandas_udf(T.DoubleType())
def vector_norm_udf(emb: pd.Series) -> pd.Series:
    """Vectorized L2 norm over array<float> — one numpy call per Arrow
    batch, not one Python call per row."""
    import numpy as np

    return emb.map(lambda v: float(np.sqrt(np.dot(v, v))))


@query(
    "udf_vector_norm",
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(CAST(list_dot_product(embedding, embedding) AS DOUBLE)), 4)
             AS norm
    FROM embeddings
    """,
)
def udf_vector_norm(spark, sf_dir):
    """The escape hatch in action: ArrowEvalPython (pandas_udf) norm,
    oracle-checked; the native-Column twin lives in similarity.py."""
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.round(vector_norm_udf("embedding"), 4).alias("norm")
    )
