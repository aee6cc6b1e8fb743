"""Similarity search over the embedding column (north-star §2B).

Brute-force cosine top-k is the exact baseline (oracle-checked); the
scale path is LSH bucketing (random-hyperplane signs) which prunes the
candidate set before scoring. Vector math is zip_with/aggregate —
JVM-side, no UDFs.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from caliper_poc_data_etl_spark.queries.registry import query, t

TOP_K = 5
N_QUERY_VECS = 10  # vec_id < 10 are the query set
N_HYPERPLANES = 8  # 256 buckets; recall/cost knob (see sim_ann_lsh)
DIM = 64


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: (p * q).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


@query(
    "sim_cosine_topk",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(list_dot_product(q.embedding, c.embedding) AS DOUBLE)
               / (sqrt(CAST(list_dot_product(q.embedding, q.embedding) AS DOUBLE))
                  * sqrt(CAST(list_dot_product(c.embedding, c.embedding) AS DOUBLE)))
               AS cos_raw
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERY_VECS}
    )
    SELECT query_id, neighbor_id, ROUND(cos_raw, 4) AS cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
)
def sim_cosine_topk(spark, sf_dir):
    """Exact top-k cosine neighbors for each query vector.

    Plan: broadcast the (small) query set against the corpus — at
    100 TB the corpus side stays partitioned and never shuffles; the
    per-query top-k is a bounded window."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (
        F.sqrt(_dot(F.col("q_emb"), F.col("q_emb")))
        * F.sqrt(_dot(F.col("c_emb"), F.col("c_emb")))
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_raw", cos)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos_raw", 4).alias("cosine"), "rank")
    )


def _hyperplanes() -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes (fixed seed)."""
    rng = random.Random(20260813)
    return [[float(rng.choice((-1, 1))) for _ in range(DIM)] for _ in range(N_HYPERPLANES)]


def lsh_bucket_column(emb_col):
    """Random-hyperplane LSH bucket id: the sign bits of the dots with
    N fixed hyperplanes, packed into a long."""
    bucket = F.lit(0).cast("long")
    for i, hp in enumerate(_hyperplanes()):
        hp_arr = F.array(*[F.lit(v) for v in hp])
        sign_bit = F.when(_dot(emb_col, hp_arr) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(sign_bit, i).cast("long"))
    return bucket


@query("sim_ann_lsh", oracle=None)  # bucketing is engine-specific → rows-only
def sim_ann_lsh(spark, sf_dir):
    """Approximate top-k: score only candidates sharing an LSH bucket
    (or differing in one sign bit) with the query — the IVF-ish scale
    path. Tests measure recall vs `sim_cosine_topk`."""
    e = t(spark, sf_dir, "embeddings").withColumn(
        "bucket", lsh_bucket_column(F.col("embedding"))
    )
    # Multi-probe: each vector also registers in the N 1-bit-flipped
    # buckets, trading index size for recall.
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
            for i in range(N_HYPERPLANES)
        ],
    )
    q = (
        e.filter(F.col("vec_id") < N_QUERY_VECS)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.explode(probes).alias("probe_bucket"),
        )
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
    )
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (
        F.sqrt(_dot(F.col("q_emb"), F.col("q_emb")))
        * F.sqrt(_dot(F.col("c_emb"), F.col("c_emb")))
    )
    scored = (
        c.join(F.broadcast(q), F.col("probe_bucket") == F.col("c_bucket"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_raw"))
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos_raw", 4).alias("cosine"), "rank")
    )


@query(
    "sim_pairwise_label_stats",
    oracle="""
    SELECT a.label AS label_a, b.label AS label_b, COUNT(*) AS n_pairs,
           ROUND(AVG(CAST(list_dot_product(a.embedding, b.embedding) AS DOUBLE)
                 / (sqrt(CAST(list_dot_product(a.embedding, a.embedding) AS DOUBLE))
                    * sqrt(CAST(list_dot_product(b.embedding, b.embedding) AS DOUBLE)))),
                 4) AS avg_cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    GROUP BY a.label, b.label
    """,
)
def sim_pairwise_label_stats(spark, sf_dir):
    """Mean pairwise cosine by label pair — embedding-space health
    check (are same-label vectors closer?)."""
    e = t(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("label_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("emb_b"),
    )
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (
        F.sqrt(_dot(F.col("emb_a"), F.col("emb_a")))
        * F.sqrt(_dot(F.col("emb_b"), F.col("emb_b")))
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .groupBy("label_a", "label_b")
        .agg(F.count("*").alias("n_pairs"), F.round(F.avg(cos), 4).alias("avg_cosine"))
    )
