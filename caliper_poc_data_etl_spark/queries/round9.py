"""Round-6 additions: graded ANN recall evidence and the round's new
operators.

Everything follows the registry conventions (__init__ docstring):
identical aliases on both sides, exact integer arithmetic wherever a
quotient or product crosses the engine boundary, and md5 as the only
cross-engine hash primitive.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from caliper_poc_data_etl_spark.queries.registry import query, t

# ---------------------------------------------------------------------------
# IVF+PQ recall@k vs exact — the ANN pipeline's graded quality evidence
# ---------------------------------------------------------------------------

# Declared recall floor for the composed IVF+PQ pipeline at its tuned
# knobs (16 cells / 4 probes / 32-deep shortlist / k=5): MEAN recall@5
# over the query sample — the standard ANN quality metric (per-query
# recall is 5-quantized and noisy) — measures 860/720/660 milli at
# sf0.001/0.01/0.1; every graded fixture >= this floor, pinned by
# tests/test_round9_ops.py and by the `meets_floor` output column.
IVFPQ_RECALL_FLOOR_MILLI = 600


def _ivfpq_recall_oracle() -> str:
    from caliper_poc_data_etl_spark.queries.round6 import (
        _ivfpq_oracle,
        IVFPQ_NQ,
        IVFPQ_TOPK,
    )

    return f"""
    WITH approx AS (
      SELECT query_id, neighbor_id FROM ({_ivfpq_oracle()}) a
    ),
    xr AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      FROM embeddings
    ),
    exact AS (
      SELECT query_id, cid FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY list_sum(list_transform(range(1, 65),
                   j -> (q.qv[j] - c.qv[j]) * (q.qv[j] - c.qv[j]))),
                 c.vec_id) AS rn
        FROM xr q JOIN xr c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {IVFPQ_NQ}
      ) WHERE rn <= {IVFPQ_TOPK}
    ),
    hits AS (
      SELECT e.query_id, COUNT(a.neighbor_id) AS n_hit
      FROM exact e LEFT JOIN approx a
        ON a.query_id = e.query_id AND a.neighbor_id = e.cid
      GROUP BY e.query_id
    )
    SELECT query_id,
           CAST(n_hit AS BIGINT) AS n_hit,
           CAST({IVFPQ_TOPK} AS BIGINT) AS k,
           CAST((n_hit * 1000) // {IVFPQ_TOPK} AS BIGINT) AS recall_milli,
           CAST((SUM(n_hit) OVER ()) * 1000
                // (COUNT(*) OVER () * {IVFPQ_TOPK}) AS BIGINT)
             AS mean_recall_milli,
           (SUM(n_hit) OVER ()) * 1000
             // (COUNT(*) OVER () * {IVFPQ_TOPK})
             >= {IVFPQ_RECALL_FLOOR_MILLI} AS meets_floor
    FROM hits
    """


@query("sim_ivfpq_recall_vs_exact", oracle=_ivfpq_recall_oracle())
def sim_ivfpq_recall_vs_exact(spark, sf_dir):
    """Recall@k of the composed IVF+PQ ANN pipeline against the exact
    integer-L2 top-k — the graded quality evidence for
    ``sim_ivfpq_topk`` (its hash row proves the pipeline computes what
    it declares; THIS row proves what it declares is a good
    approximation). Per query: hits = |approx top-k ∩ exact top-k|,
    floor-milli recall, and the declared-floor flag
    (>= {IVFPQ_RECALL_FLOOR_MILLI}/1000 at the tuned 16-cell /
    4-probe / 32-shortlist knobs).

    Recall is computed DISTRIBUTED: the exact side is the broadcast-
    query brute-force scan (the ``sim_cosine_topk`` plan shape on the
    same quantized integer L2 metric the IVF+PQ pipeline ranks by),
    the approx side is the production pipeline itself, and the
    intersection is a per-(query, neighbor) left join + count — no
    driver-side set math. 100 TB: the exact side is the expensive
    ground-truth pass you run on a SAMPLE of queries (NQ here) to
    monitor index quality; everything downstream of the two top-k's
    joins on the tiny NQ·k result sets."""
    from caliper_poc_data_etl_spark.queries.round6 import (
        sim_ivfpq_topk,
        IVFPQ_NQ,
        IVFPQ_TOPK,
    )

    approx = sim_ivfpq_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    e = t(spark, sf_dir, "embeddings")
    xe = e.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
        ).alias("qv"),
    )
    q = xe.filter(F.col("vec_id") < IVFPQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
    )
    d2 = F.aggregate(
        F.zip_with("qqv", "qv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    wexact = W.partitionBy("query_id").orderBy("d2", "cid")
    exact = (
        xe.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cid"), d2.alias("d2"))
        .withColumn("rn", F.row_number().over(wexact))
        .filter(F.col("rn") <= IVFPQ_TOPK)
        .select("query_id", "cid")
    )
    hits = (
        exact.join(
            approx,
            (approx.query_id == exact.query_id)
            & (approx.neighbor_id == exact.cid),
            "left",
        )
        .groupBy(exact.query_id)
        .agg(F.count(approx.neighbor_id).alias("n_hit"))
    )
    recall = F.expr(f"(n_hit * 1000) div {IVFPQ_TOPK}")
    # mean over the NQ-row query sample — a window over a tiny frame
    # (one row per sampled query), not a corpus-wide global window
    mean_recall = F.expr(
        f"(sum(n_hit) OVER ()) * 1000 div (count(*) OVER () * {IVFPQ_TOPK})"
    )
    return hits.select(
        "query_id",
        F.col("n_hit").cast("long").alias("n_hit"),
        F.lit(IVFPQ_TOPK).cast("long").alias("k"),
        recall.cast("long").alias("recall_milli"),
        mean_recall.cast("long").alias("mean_recall_milli"),
        (mean_recall >= IVFPQ_RECALL_FLOOR_MILLI).alias("meets_floor"),
    )
