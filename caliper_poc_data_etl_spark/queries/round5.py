"""Round-5 additions: subword BPE tokenization, k-means (Lloyd)
semantic-dedup clustering, and the bucketed-layout TPC-H Q3.

Everything follows the registry conventions (__init__ docstring):
identical aliases both sides, exact integer/DECIMAL accumulation,
floor-rounding where doubles must be compared cross-engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from caliper_poc_data_etl_spark.queries.registry import query, t

# ---------------------------------------------------------------------------
# Subword BPE tokenization
# ---------------------------------------------------------------------------

# Frozen merge table — the tokenizer-model artifact a production
# pipeline ships next to its checkpoints (learning it is an offline
# job; ENCODING against a fixed table is the hot path this operator
# declares). Priority order matters: merges apply rank 1 first.
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("r", "e"),
    ("o", "n"),
    ("e", "r"),
    ("a", "t"),
    ("e", "n"),
    ("o", "r"),
    ("e", "s"),
    ("a", "l"),
    ("o", "u"),
    ("s", "t"),
    ("in", "g"),
    ("an", "d"),
    ("t", "o"),
    ("i", "s"),
    ("o", "f"),
    ("er", "s"),
    ("the", "r"),
    ("i", "t"),
    ("a", "s"),
    ("e", "d"),
]

# Within one rank, `replace` is left-to-right non-overlapping and the
# pattern's trailing space is CONSUMED, so a run of k same-rank pairs
# needs ~log2(k) sweeps ("ababab" merges 1st and 3rd pair on sweep 1).
# Three sweeps cover runs of up to 15 repeated pairs; anything longer
# degrades identically on both engines (same replace semantics), so
# cross-engine agreement is unconditional.
BPE_SWEEPS = 3

# ids: base chars a-z = 1..26, merge products 27.. in rank order; the
# word-boundary marker '|' never merges and never emits an id.
BPE_VOCAB: dict[str, int] = {chr(ord("a") + i): i + 1 for i in range(26)}
for _a, _b in BPE_MERGES:
    BPE_VOCAB[_a + _b] = len(BPE_VOCAB) + 1


def bpe_symbols_expr(col):
    """Encode a lowercase-text column into BPE symbols.

    The whole document is one spaced symbol string (' t h e | c a t ')
    with '|' as the un-mergeable word boundary, so encoding is a pure
    per-row expression chain — no explode, no regroup shuffle. Merges
    apply as rank-ordered single-pass literal replaces (BPE_SWEEPS
    sweeps each); this is the standard single-pass approximation of
    the iterative lowest-rank-first encoder, exact whenever later
    merges don't recreate earlier pairs (true for this table by
    construction) and deterministic regardless.
    """
    w = F.regexp_replace(F.regexp_replace(col, "[^a-z]+", "|"), "^\\||\\|$", "")
    s = F.concat(F.lit(" "), F.regexp_replace(w, "(.)", "$1 "))
    for a, b in BPE_MERGES:
        for _ in range(BPE_SWEEPS):
            s = F.replace(s, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    return F.split(F.trim(s), " ")


def _bpe_oracle() -> str:
    rep = "' ' || regexp_replace(w, '(.)', '\\1 ', 'g')"
    for a, b in BPE_MERGES:
        for _ in range(BPE_SWEEPS):
            rep = f"replace({rep}, ' {a} {b} ', ' {a}{b} ')"
    case = " ".join(
        f"WHEN '{sym}' THEN {sid}" for sym, sid in BPE_VOCAB.items()
    )
    return f"""
    WITH base AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(lower(text), '[^a-z]+', '|', 'g'),
                            '^\\||\\|$', '', 'g') AS w
      FROM documents
    ), enc AS (
      SELECT doc_id, string_split(trim({rep}), ' ') AS sy
      FROM base WHERE w <> ''
    ), subs AS (
      SELECT doc_id,
             list_filter(sy, x -> x <> '|') AS sub,
             len(list_filter(sy, x -> x = '|')) + 1 AS n_words
      FROM enc
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(len(sub) AS BIGINT) AS n_subwords,
           array_to_string(
             list_transform(sub,
               x -> CAST(COALESCE(CASE x {case} END, 0) AS VARCHAR)),
             ',') AS token_ids
    FROM subs
    """


@query("text_bpe_tokenize", oracle=_bpe_oracle())
def text_bpe_tokenize(spark, sf_dir):
    """Subword tokenization by a frozen BPE merge table — how training
    corpora are actually tokenized (whitespace vocab-ids,
    ``text_tokenize_vocab_ids``, is the baseline this closes the gap
    on). The merge table is the shipped model artifact; encoding
    applies it rank-ordered over a spaced symbol string with '|' as
    the un-mergeable word boundary, then maps symbols to vocabulary
    ids (a-z = 1..26, merge products 27+ in rank order).

    Scale shape: the entire encode is ONE narrow projection — no
    explode, no join, no shuffle; per-row cost is linear in document
    length and the plan is a single WholeStageCodegen map over the
    scan. The vocab lookup is a literal map expression, not a join.
    Cross-engine determinism: literal-string replaces with identical
    left-to-right non-overlapping semantics in both engines, so even
    the documented >15-repeated-pair degradation case agrees
    byte-for-byte."""
    d = t(spark, sf_dir, "documents")
    vmap = F.create_map(
        *[x for sym, sid in BPE_VOCAB.items() for x in (F.lit(sym), F.lit(sid))]
    )
    syms = bpe_symbols_expr(F.lower(F.col("text")))
    # oracle's WHERE w <> '' parity: a letterless doc yields sy = ['']
    # after split(trim(' ')) — exclude exactly those rows.
    base = d.select("doc_id", syms.alias("sy")).filter(
        ~((F.size("sy") == 1) & (F.element_at("sy", 1) == ""))
    )
    sub = F.filter(F.col("sy"), lambda x: x != "|")
    return base.select(
        "doc_id",
        (
            F.size(F.filter(F.col("sy"), lambda x: x == "|")) + 1
        ).cast("long").alias("n_words"),
        F.size(sub).cast("long").alias("n_subwords"),
        F.array_join(
            F.transform(
                sub,
                lambda x: F.coalesce(
                    F.element_at(vmap, x), F.lit(0)
                ).cast("string"),
            ),
            ",",
        ).alias("token_ids"),
    )


# ---------------------------------------------------------------------------
# k-means (Lloyd) semantic-dedup clustering
# ---------------------------------------------------------------------------

KM_K = 8
KM_ITERS = 4


def _kmeans_oracle() -> str:
    """Chained-CTE Lloyd iterations on the integer-quantized embedding
    matrix — assignment distances and centroid updates are pure
    integer arithmetic (half-away integer division for the mean), so
    every iteration is exact cross-engine; no floating point anywhere.
    """
    head = f"""
    WITH xe AS MATERIALIZED (
      SELECT vec_id, u.i AS j,
             CAST(ROUND(CAST(embedding[u.i] AS DOUBLE) * 1000) AS BIGINT) AS x
      FROM embeddings, unnest(range(1, 65)) AS u(i)
    ),
    seeds AS (
      SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS k
      FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT {KM_K})
    ),
    c0 AS MATERIALIZED (
      SELECT s.k, xe.j, xe.x AS c FROM seeds s JOIN xe ON xe.vec_id = s.vec_id
    )"""
    steps = []
    for i in range(1, KM_ITERS + 1):
        steps.append(f"""d{i} AS (
      SELECT xe.vec_id, c.k,
             SUM((xe.x - c.c) * (xe.x - c.c)) AS d2
      FROM xe JOIN c{i-1} c ON c.j = xe.j GROUP BY xe.vec_id, c.k
    ),
    a{i} AS MATERIALIZED (
      SELECT vec_id, k FROM (
        SELECT vec_id, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, k) AS rn
        FROM d{i}
      ) WHERE rn = 1
    ),
    m{i} AS (
      SELECT a.k, xe.j, SUM(xe.x) AS s, COUNT(*) AS cnt
      FROM a{i} a JOIN xe ON xe.vec_id = a.vec_id GROUP BY a.k, xe.j
    ),
    c{i} AS MATERIALIZED (
      SELECT p.k, p.j,
             COALESCE(CAST((CASE WHEN m.s < 0 THEN -1 ELSE 1 END)
                 * ((2 * abs(m.s) + m.cnt) // (2 * m.cnt)) AS BIGINT),
                 p.c) AS c
      FROM c{i-1} p LEFT JOIN m{i} m ON m.k = p.k AND m.j = p.j
    )""")
    n = KM_ITERS
    return (
        head
        + ",\n    "
        + ",\n    ".join(steps)
        + f""",
    df AS (
      SELECT xe.vec_id, c.k, SUM((xe.x - c.c) * (xe.x - c.c)) AS d2
      FROM xe JOIN c{n} c ON c.j = xe.j GROUP BY xe.vec_id, c.k
    )
    SELECT vec_id, k AS cluster, CAST(d2 AS BIGINT) AS dist_sq FROM (
      SELECT vec_id, k, d2,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, k) AS rn
      FROM df
    ) WHERE rn = 1
    """
    )


@query("embed_kmeans_assign", oracle=_kmeans_oracle())
def embed_kmeans_assign(spark, sf_dir):
    """k-means (Lloyd) over the embedding corpus — the standard final
    stage of semantic dedup (cluster, then keep one representative
    per semantic neighborhood) and the 4th iterative operator next to
    PageRank / connected components / power iteration. K=8 fixed
    centroids, 4 fixed assign→update rounds, then a final assignment;
    seeds are the K lowest vec_ids (deterministic, no RNG).

    Engine-exact by construction (the power-iteration recipe,
    similarity.py:771): embeddings quantize to integers (×1000);
    distances are integer sums of squares; the centroid mean
    re-quantizes with the half-away integer-division identity
    round(s/n) = sign·((2|s|+n) div 2n) — NO floating point in any
    iteration, so every round is bit-exact cross-engine. Ties in the
    argmin break on lowest cluster id; empty clusters keep their
    previous centroid.

    Scale shape: per round, one broadcast of the K·64-row centroid
    table into the exploded matrix (map-side), one
    groupBy(vec_id, k) bounded by n·K, one argmin window partitioned
    by vec_id, one groupBy(k, j) bounded by K·64 — shuffles scale
    with |vectors|, never |vectors|²; lineage truncates per round
    (localCheckpoint, the graph.pagerank discipline, zero driver
    scalars)."""
    e = t(spark, sf_dir, "embeddings")
    xe = (
        e.select(
            "vec_id",
            F.posexplode(
                F.transform(
                    "embedding",
                    lambda x: F.round(x.cast("double") * 1000).cast("long"),
                )
            ).alias("j0", "x"),
        )
        .select("vec_id", (F.col("j0") + 1).alias("j"), "x")
        .localCheckpoint(eager=True)
    )
    seeds = (
        e.select("vec_id")
        .distinct()
        .orderBy("vec_id")
        .limit(KM_K)
        .withColumn(
            "k",
            # unpartitioned window over a bounded-by-construction set:
            # exactly KM_K rows survive the limit above.
            F.row_number().over(W.orderBy("vec_id")) - 1,
        )
    )
    c = (
        seeds.join(xe, "vec_id")
        .select("k", "j", F.col("x").alias("c"))
        .localCheckpoint(eager=True)
    )

    def assign(cent):
        d = (
            xe.join(F.broadcast(cent), "j")
            .groupBy("vec_id", "k")
            .agg(
                F.sum(
                    (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
                ).alias("d2")
            )
        )
        wv = W.partitionBy("vec_id").orderBy("d2", "k")
        return (
            d.withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") == 1)
            .select("vec_id", "k", "d2")
        )

    for _ in range(KM_ITERS):
        a = assign(c).select("vec_id", "k")
        m = (
            a.join(xe, "vec_id")
            .groupBy("k", "j")
            .agg(F.sum("x").alias("s"), F.count("*").alias("cnt"))
        )
        c = (
            c.join(m, ["k", "j"], "left")
            .select(
                "k",
                "j",
                F.coalesce(
                    (
                        F.when(F.col("s") < 0, -1).otherwise(1)
                        * F.expr("div(2 * abs(s) + cnt, 2 * cnt)")
                    ).cast("long"),
                    F.col("c"),
                ).alias("c"),
            )
            .localCheckpoint(eager=True)
        )
    return assign(c).select(
        "vec_id", F.col("k").alias("cluster"), F.col("d2").cast("long").alias("dist_sq")
    )


# ---------------------------------------------------------------------------
# Bucketed-layout TPC-H Q3
# ---------------------------------------------------------------------------


@query(
    "q3_bucketed_top_revenue",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_bucketed_top_revenue(spark, sf_dir):
    """TPC-H Q3 on the PRE-BUCKETED physical layout — the K=100
    soak's only linear-cost query (71 s at ~sf10) re-run the way a
    100 TB deployment would lay it out: orders and lineitem bucketed
    on the order key at write time, so the fact⋈fact join consumes
    buckets with NO Exchange on either side, and the downstream
    groupBy(l_orderkey, o_orderdate) reuses the same partitioning
    (HashPartitioning(l_orderkey) satisfies the agg's clustered
    distribution). Customer is the broadcast dimension. Exactly one
    shuffle remains in the whole plan: the final top-10 ordering.
    Same oracle as q3_top_revenue — the layout must not change a
    single output value.

    Staging discipline follows join_bucketed_colocated
    (relational.py:1394): stable per-session path + catalog names
    keyed by applicationId, overwritten in place on re-invocation."""
    import tempfile

    from caliper_poc_data_etl_spark.sinks import write_bucketed

    app = spark.sparkContext.applicationId.replace("-", "_")
    base = f"{tempfile.gettempdir()}/graft_q3bkt_{app}"
    tbl_orders = f"graft_q3_orders_{app}"
    tbl_lineitem = f"graft_q3_lineitem_{app}"
    write_bucketed(
        t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderdate"
        ),
        tbl_orders,
        buckets=8,
        bucket_cols=["o_orderkey"],
        sort_cols=["o_orderkey"],
        path=f"{base}/orders",
    )
    write_bucketed(
        t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        tbl_lineitem,
        buckets=8,
        bucket_cols=["l_orderkey"],
        sort_cols=["l_orderkey"],
        path=f"{base}/lineitem",
    )
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = spark.table(tbl_orders).join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
    )
    li = spark.table(tbl_lineitem)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )
