"""Round-12 ops — the VERDICT r11 frontier demands:

- ``dedup_semantic_cluster`` — SemDeDup (Abbas et al. 2023,
  "SemDeDup: Data-efficient learning at web-scale through semantic
  deduplication", public arXiv 2303.09540): k-means cluster the
  embedding space, then prune within-cluster pairs above a cosine
  threshold keeping the lowest-id representative. The embedding
  analog of ``dedup_minhash_lsh``'s Σ bucket² candidate bound, and
  the one widely-deployed public LLM-dedup family the registry
  lacked (VERDICT r11 #1).
- ``text_quality_classifier_score`` — linear quality-classifier
  inference as native columns (the DCLM / FineWeb-edu shape:
  hashed bag-of-words features × a fixed public-style weight
  vector + sigmoid), VERDICT r11 #4.
- ``sim_rrf_fusion`` — reciprocal-rank fusion (Cormack, Clarke &
  Büttcher, SIGIR 2009) of the existing BM25 lexical ranking and
  the dense cosine ranking — hybrid retrieval's standard merge,
  VERDICT r11 #5.

Registry conventions as everywhere (queries/__init__.py docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from caliper_poc_data_etl_spark.queries.registry import query, t

# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup over embeddings
# ---------------------------------------------------------------------------

# Same threshold as the exact quadratic baseline (dedup_embedding_cosine)
# so the recall-vs-exact test compares like with like.
SEM_COS_THRESHOLD = 0.4
_SEM_SALTS = 16


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: (p * q).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _semantic_oracle() -> str:
    from caliper_poc_data_etl_spark.queries.round5 import _kmeans_oracle

    tail = f"""
    , mem AS (
      SELECT af.vec_id, af.k, e.embedding,
             sqrt(CAST(list_dot_product(e.embedding, e.embedding) AS DOUBLE))
               AS nrm
      FROM af JOIN embeddings e ON e.vec_id = af.vec_id
    ), close AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM mem a JOIN mem b ON a.k = b.k AND a.vec_id < b.vec_id
      WHERE CAST(list_dot_product(a.embedding, b.embedding) AS DOUBLE)
            / (a.nrm * b.nrm) >= {SEM_COS_THRESHOLD}
    ), nc AS (
      SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_close FROM (
        SELECT va AS vec_id FROM close
        UNION ALL SELECT vb AS vec_id FROM close
      ) GROUP BY vec_id
    ), pruned AS (
      SELECT DISTINCT vb AS vec_id FROM close
    )
    SELECT af.vec_id, af.k AS cluster,
           p.vec_id IS NULL AS kept,
           COALESCE(nc.n_close, 0) AS n_close
    FROM af
    LEFT JOIN pruned p ON p.vec_id = af.vec_id
    LEFT JOIN nc ON nc.vec_id = af.vec_id
    """
    return _kmeans_oracle(tail=tail)


@query("dedup_semantic_cluster", oracle=_semantic_oracle())
def dedup_semantic_cluster(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): semantic dedup over embeddings —
    k-means clusters the embedding space (the shared exact-integer
    Lloyd machinery, round5.py), then ONLY within-cluster pairs are
    cosine-scored; a vector is pruned when a lower-id vector in the
    SAME cluster has cosine >= the threshold, so each semantic
    duplicate group keeps exactly its lowest-id representative.
    Output per vector: its cluster, the kept/pruned verdict, and its
    within-cluster close-neighbor count.

    This is the embedding analog of ``dedup_minhash_lsh``: the
    cluster plays the LSH bucket's role and bounds pair generation at
    Σ cluster_size² instead of |corpus|² (the exact quadratic twin is
    ``dedup_embedding_cosine``; recall vs it is asserted in tests —
    cross-cluster near-dup pairs are the misses, the documented
    SemDeDup trade-off, §3 of the paper).

    Scale shape: pair generation is an equi-join on (cluster, salt) —
    the b-side's salt is ``pmod(vec_id, 16)`` and the a-side
    replicates 16x, so each pair is produced exactly once while the
    join parallelism is clusters x 16 tasks rather than one task per
    cluster (k-means K is small here; at 100 TB K grows with the
    corpus and the salt keeps per-task pair counts bounded either
    way). Norms are materialized per SIDE before the join — one
    interpreted dot per pair, not three (the sim_cosine_topk lesson).
    Cosine thresholding is on raw doubles, bit-identical cross-engine
    (the dedup_embedding_cosine convention)."""
    from caliper_poc_data_etl_spark.queries.round5 import (
        _kmeans_final_assignment,
    )

    af = _kmeans_final_assignment(spark, sf_dir).select("vec_id", "k")
    e = t(spark, sf_dir, "embeddings")
    base = af.join(e.select("vec_id", "embedding"), "vec_id").select(
        "vec_id",
        "k",
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    a = base.select(
        F.col("vec_id").alias("vec_a"),
        "k",
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
        F.explode(
            F.array(*[F.lit(s) for s in range(_SEM_SALTS)])
        ).alias("salt"),
    ).repartition(_SEM_SALTS, F.col("k"), F.col("salt"))
    b = base.select(
        F.col("vec_id").alias("vec_b"),
        "k",
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
        F.pmod(F.col("vec_id"), F.lit(_SEM_SALTS)).cast("int").alias("salt"),
    )
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (
        F.col("nrm_a") * F.col("nrm_b")
    )
    close = (
        a.join(F.broadcast(b), ["k", "salt"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(cos >= SEM_COS_THRESHOLD)
        .select("vec_a", "vec_b")
    )
    nc = (
        close.select(F.col("vec_a").alias("vec_id"))
        .unionAll(close.select(F.col("vec_b").alias("vec_id")))
        .groupBy("vec_id")
        .agg(F.count("*").alias("n_close"))
    )
    pruned = close.select(F.col("vec_b").alias("vec_id")).distinct().withColumn(
        "_pruned", F.lit(True)
    )
    return (
        af.join(pruned, "vec_id", "left")
        .join(nc, "vec_id", "left")
        .select(
            "vec_id",
            F.col("k").alias("cluster"),
            F.col("_pruned").isNull().alias("kept"),
            F.coalesce("n_close", F.lit(0).cast("long")).alias("n_close"),
        )
    )


# ---------------------------------------------------------------------------
# Quality-classifier inference as native columns (DCLM / FineWeb-edu shape)
# ---------------------------------------------------------------------------

_QC_BUCKETS = 256  # same feature space as text_hashing_vectorizer
# Fixed "trained" weights, one per hash bucket, published as a closed
# integer form both engines derive identically (stands in for loading a
# real classifier's weight table): w_b = ((b*1103515245 + 12345) % 2001)
# - 1000, an integer in [-1000, 1000] interpreted at 1e-3 scale.
_QC_LCG_A = 1103515245
_QC_LCG_C = 12345
_QC_MOD = 2001


def _qc_oracle() -> str:
    return f"""
    WITH weights AS (
      SELECT CAST(u.b AS BIGINT) AS bucket,
             CAST((u.b * {_QC_LCG_A} + {_QC_LCG_C}) % {_QC_MOD} - 1000
                  AS BIGINT) AS w
      FROM unnest(range(0, {_QC_BUCKETS})) AS u(b)
    ), toks AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT % {_QC_BUCKETS}
               AS bucket
      FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM documents
      )
    ), agg AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(w.w) AS BIGINT) AS w_sum
      FROM toks t JOIN weights w ON w.bucket = t.bucket
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens, w_sum,
           FLOOR(1.0 / (1.0 + EXP(
               -(FLOOR(w_sum / (n_tokens * 1000.0) * 1e6 + 0.5) / 1e6)
             )) * 1e6 + 0.5) / 1e6 AS score
    FROM agg
    """


@query("text_quality_classifier_score", oracle=_qc_oracle())
def text_quality_classifier_score(spark, sf_dir):
    """Model-based quality-classifier inference as native columns —
    the DCLM / FineWeb-edu curation shape (a linear classifier over
    hashed bag-of-words features scores every document; the score
    gates what enters the training mix). Features are the
    ``text_hashing_vectorizer`` bucket space (256 buckets, md5-prefix
    hash); the "model" is a fixed weight vector derived from a public
    closed form (LCG over the bucket id — stands in for a trained
    model's broadcast weight table); score = sigmoid(w·x / n_tokens).

    Plan shape (VERDICT r11 #4 contract): per-token bucket → ONE
    broadcast join against the 256-row weight table (how a real
    model's weights load: a table, not an expression) → ONE hash
    aggregate on doc_id. No other shuffle anywhere; the weight join
    is map-side. At 100 TB this is a scan-shaped pipeline — inference
    cost rides the tokenizer explode, state is O(buckets).

    Cross-engine determinism: w_sum and n_tokens are exact integers;
    the logit floor-quantizes to 6 dp BEFORE the sigmoid (the
    bm25/perplexity transcendental convention, here with EXP) and the
    score floor-quantizes to 6 dp — FLOOR(x*1e6+0.5), never ROUND,
    whose decimal-half handling diverges between engines for exact
    halves like 1001/16000."""
    d = t(spark, sf_dir, "documents")
    weights = (
        spark.range(_QC_BUCKETS)
        .select(
            F.col("id").alias("bucket"),
            ((F.col("id") * _QC_LCG_A + _QC_LCG_C) % _QC_MOD - 1000).alias(
                "w"
            ),
        )
    )
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "tok"
        ),
    ).select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
            % _QC_BUCKETS
        ).alias("bucket"),
    )
    agg = (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("w").alias("w_sum"),
        )
    )
    # FLOOR(x*1e6 + 0.5) quantization, NOT ROUND: both engines then run
    # the identical IEEE mult/add/floor sequence on the identical
    # double, where ROUND's decimal-boundary handling diverges between
    # Spark (BigDecimal HALF_UP on the binary expansion) and DuckDB for
    # exact-half logits like 1001/16000 (caught at sf0.1).
    logit6 = (
        F.floor(
            F.col("w_sum") / (F.col("n_tokens") * 1000.0) * 1e6 + F.lit(0.5)
        )
        / 1e6
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "w_sum",
        (
            F.floor(1.0 / (1.0 + F.exp(-logit6)) * 1e6 + F.lit(0.5)) / 1e6
        ).alias("score"),
    )


# ---------------------------------------------------------------------------
# Hybrid-retrieval rank fusion (RRF)
# ---------------------------------------------------------------------------

_RRF_K = 60  # the constant from Cormack et al. 2009; public default
_RRF_TOPN = 20  # depth of each input ranking
_RRF_QUERY_VEC = 0  # the dense query: embedding of vec_id 0


def _rrf_oracle() -> str:
    from caliper_poc_data_etl_spark.queries.text import _bm25_oracle

    return f"""
    WITH lex AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
               AS rank_lex
      FROM ({_bm25_oracle()})
    ), q AS (
      SELECT embedding AS q_emb,
             sqrt(CAST(list_dot_product(embedding, embedding) AS DOUBLE))
               AS q_nrm
      FROM embeddings WHERE vec_id = {_RRF_QUERY_VEC}
    ), dense AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cos_raw DESC, doc_id)
               AS INT) AS rank_dense
      FROM (
        SELECT e.vec_id AS doc_id,
               CAST(list_dot_product(e.embedding, q.q_emb) AS DOUBLE)
                 / (sqrt(CAST(list_dot_product(e.embedding, e.embedding)
                              AS DOUBLE)) * q.q_nrm) AS cos_raw
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> {_RRF_QUERY_VEC}
      )
      QUALIFY rank_dense <= {_RRF_TOPN}
    )
    SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
           l.rank_lex, d.rank_dense,
           FLOOR((COALESCE(1.0 / ({_RRF_K} + l.rank_lex), 0.0)
                  + COALESCE(1.0 / ({_RRF_K} + d.rank_dense), 0.0))
                 * 1e6 + 0.5) / 1e6 AS rrf_score,
           CAST(ROW_NUMBER() OVER (ORDER BY
               FLOOR((COALESCE(1.0 / ({_RRF_K} + l.rank_lex), 0.0)
                      + COALESCE(1.0 / ({_RRF_K} + d.rank_dense), 0.0))
                     * 1e6 + 0.5) / 1e6
               DESC, COALESCE(l.doc_id, d.doc_id)) AS INT) AS fused_rank
    FROM lex l FULL OUTER JOIN dense d ON d.doc_id = l.doc_id
    """


@query("sim_rrf_fusion", oracle=_rrf_oracle())
def sim_rrf_fusion(spark, sf_dir):
    """Hybrid-retrieval rank fusion: reciprocal-rank fusion (RRF,
    Cormack, Clarke & Büttcher SIGIR 2009 — score(d) = Σ_r 1/(k +
    rank_r(d)), k = 60) of the two rankings the registry already
    grades — the ``text_bm25_topk`` lexical top-20 and the dense
    cosine top-20 for a fixed query vector (vec_id 0; embeddings
    share the documents' id space). A document missing from one
    ranking contributes 0 from that ranker — the full-outer-join
    semantics that make RRF robust to rankers with disjoint
    coverage.

    Plan shape: two bounded top-N inputs (each already a graded
    operator's plan: BM25 is two corpus scans with a broadcast df
    join; dense is a broadcast-1-row query against the corpus scan),
    a full outer join of two <= 20-row sets, and one global window
    over <= 40 rows — every unbounded stage is rank-limited before
    the join, so fusion cost is O(N log N) in the ranking depth, not
    the corpus. Cross-engine determinism: ranks are integers; each
    1/(k+rank) is one IEEE division; the fused score floor-quantizes
    to 6 dp (FLOOR(x*1e6+0.5), the classifier-score lesson) and the
    fused rank orders by the QUANTIZED score (ties on doc_id)."""
    from caliper_poc_data_etl_spark.queries.text import text_bm25_topk

    lex = text_bm25_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("bm25"), "doc_id"))
        .cast("int")
        .alias("rank_lex"),
    )
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == _RRF_QUERY_VEC).select(
        F.col("embedding").alias("q_emb"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("q_nrm"),
    )
    cos = _dot(F.col("embedding"), F.col("q_emb")) / (
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))) * F.col("q_nrm")
    )
    dense = (
        e.filter(F.col("vec_id") != _RRF_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("cos_raw"))
        .withColumn(
            "rank_dense",
            F.row_number()
            .over(W.orderBy(F.desc("cos_raw"), "doc_id"))
            .cast("int"),
        )
        .filter(F.col("rank_dense") <= _RRF_TOPN)
        .select("doc_id", "rank_dense")
    )
    fused = lex.join(dense, "doc_id", "full_outer")
    # FLOOR(x*1e6+0.5) quantization, not ROUND — the
    # text_quality_classifier_score boundary lesson applied here too.
    rrf = (
        F.floor(
            (
                F.coalesce(1.0 / (_RRF_K + F.col("rank_lex")), F.lit(0.0))
                + F.coalesce(
                    1.0 / (_RRF_K + F.col("rank_dense")), F.lit(0.0)
                )
            )
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    return (
        fused.withColumn("rrf_score", rrf)
        .withColumn(
            "fused_rank",
            F.row_number()
            .over(W.orderBy(F.desc("rrf_score"), "doc_id"))
            .cast("int"),
        )
        .select(
            "doc_id", "rank_lex", "rank_dense", "rrf_score", "fused_rank"
        )
    )
