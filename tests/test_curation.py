"""Curation operators: PII redaction, repetition stats, deterministic
splits/sampling/mixing, and connected-components fuzzy-dedup
clustering (plus the graph.py primitive itself)."""

from __future__ import annotations

from pyspark.sql import functions as F

from caliper_poc_data_etl_spark.graph import connected_components
from caliper_poc_data_etl_spark.queries.curation import (
    STRATUM_SAMPLE_N,
    dedup_cluster_cc,
    mix_weighted_sources,
    redact_pii,
    sample_hash_split,
    sample_stratified_lang,
    text_repetition_stats,
)
from caliper_poc_data_etl_spark.queries.dedup import dedup_ngram_jaccard


def test_connected_components_chain_pair_singleton(spark):
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 20]], ["node"])
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], ["src", "dst"]
    )  # chain 1-2-3 (via 2), pair 10-11, singleton 20
    got = {
        r["node"]: r["comp"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_long_chain_and_no_edges(spark):
    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    chain = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    got = connected_components(nodes, chain).collect()
    assert all(r["comp"] == 0 for r in got)
    # Edgeless graph: everything stays a singleton, loop exits round 1.
    empty = spark.createDataFrame([], "src long, dst long")
    got2 = connected_components(nodes, empty).collect()
    assert all(r["comp"] == r["node"] for r in got2)


def test_redact_pii_semantics(spark):
    rows = [
        ("mail me at alice.smith+x@sub.example.org today", "<EMAIL>"),
        ("server at 192.168.0.17 responded", "<IP>"),
        ("call 555-0123 now", "<PHONE>"),
        ("no pii here", "no pii here"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], ["text"])
    out = [r[0] for r in df.select(redact_pii(F.col("text"))).collect()]
    for (src, marker), red in zip(rows, out):
        assert marker in red or red == src
        # nothing that looks like the original PII survives
        assert "@" not in red
        assert "192.168" not in red
        assert "555-0123" not in red


def test_repetition_stats_flags_degenerate_doc(spark, oracle_sf_dir, tmp_path):
    # Build a tiny documents table: one healthy doc, one word-spam doc.
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 8),
            (2, "spam spam spam spam spam spam spam ham", "en", "s", 8),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in text_repetition_stats(spark, str(tmp_path)).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False
    assert out[2]["top_token_frac"] == round(7 / 8, 4)
    assert out[1]["dup_token_ratio"] == 0.0
    assert out[2]["top_bigram_frac"] == round(6 / 7, 4)  # "spam spam" x6 of 7


def test_hash_split_deterministic_and_proportional(spark, oracle_sf_dir):
    a = {r["doc_id"]: r["split"] for r in sample_hash_split(spark, oracle_sf_dir).collect()}
    b = {r["doc_id"]: r["split"] for r in sample_hash_split(spark, oracle_sf_dir).collect()}
    assert a == b  # no RNG anywhere
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    val = sum(1 for s in a.values() if s == "val")
    test = sum(1 for s in a.values() if s == "test")
    assert train + val + test == n
    # 500 docs, p_train≈0.797: allow ±5 sd of binomial noise.
    assert abs(train - 0.797 * n) < 5 * (n * 0.797 * 0.203) ** 0.5
    assert abs(val - 0.102 * n) < 5 * (n * 0.102 * 0.898) ** 0.5


def test_stratified_sample_exact_per_stratum(spark, oracle_sf_dir):
    out = sample_stratified_lang(spark, oracle_sf_dir).collect()
    per_lang: dict[str, int] = {}
    for r in out:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
        assert 1 <= r["sample_rank"] <= STRATUM_SAMPLE_N
    # every stratum in the sf0.01 corpus has ≥ N docs → exactly N each
    assert set(per_lang.values()) == {STRATUM_SAMPLE_N}


def test_mix_weighted_sources_rates(spark, oracle_sf_dir):
    rows = mix_weighted_sources(spark, oracle_sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        if r["target_rate"] == 1.0:
            assert r["n_kept"] == r["n_docs"]  # tier 0 keeps everything
    # aggregate keep-rate should track the mean target rate loosely
    kept = sum(r["n_kept"] for r in rows)
    total = sum(r["n_docs"] for r in rows)
    mean_rate = sum(r["target_rate"] * r["n_docs"] for r in rows) / total
    assert abs(kept / total - mean_rate) < 0.1


def test_cluster_cc_is_transitive_closure_of_pairs(spark, oracle_sf_dir):
    labels = {
        r["doc_id"]: r["cluster_rep"]
        for r in dedup_cluster_cc(spark, oracle_sf_dir).collect()
    }
    pairs = dedup_ngram_jaccard(spark, oracle_sf_dir).collect()
    assert pairs, "sf0.01 corpus is expected to contain near-dup pairs"
    for p in pairs:
        assert labels[p["doc_a"]] == labels[p["doc_b"]]
    # keeper of each cluster is its minimum member
    by_rep: dict[int, list[int]] = {}
    for doc, rep in labels.items():
        by_rep.setdefault(rep, []).append(doc)
    for rep, members in by_rep.items():
        assert rep == min(members)


def test_pagerank_matches_python_reference(spark):
    from caliper_poc_data_etl_spark.graph import pagerank

    # Small directed graph incl. a dangling node (3) and a hub (0).
    edge_list = [(0, 1), (0, 2), (1, 0), (2, 0), (1, 3), (4, 0)]
    n = 5
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank(nodes, edges, n_iter=15).collect()
    }

    ranks = {i: 1.0 / n for i in range(n)}
    out = {}
    for s, d in edge_list:
        out.setdefault(s, []).append(d)
    for _ in range(15):
        nxt = {i: 0.0 for i in range(n)}
        dangling = sum(r for i, r in ranks.items() if i not in out)
        for s, targets in out.items():
            for d in targets:
                nxt[d] += ranks[s] / len(targets)
        ranks = {
            i: 0.15 / n + 0.85 * (nxt[i] + dangling / n) for i in range(n)
        }
    for i in range(n):
        assert abs(got[i] - ranks[i]) < 1e-9, (i, got[i], ranks[i])
    assert abs(sum(got.values()) - 1.0) < 1e-9
