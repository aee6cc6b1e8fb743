"""Training-data prep operators: chunking, sequence packing,
decontamination, TF-IDF, inverted index, funnel, histogram, and the
stream-stream join (replay vs batch parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from caliper_poc_data_etl_spark.queries.training import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    PACK_BUDGET,
    chunk_documents,
    decontam_ngram_overlap,
    funnel_conversion,
    hist_order_totals,
    inverted_index_postings,
    pack_sequences,
    tfidf_top_terms,
)
from caliper_poc_data_etl_spark.queries.registry import t
from caliper_poc_data_etl_spark.streaming import (
    click_purchase_join,
    read_event_stream,
    replay_to_df,
)


def test_chunks_cover_text_with_overlap(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id", F.length("text").alias("n"))
    chunks = chunk_documents(spark, sf_dir)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
            F.min("chunk_len").alias("min_len"),
            F.max("chunk_len").alias("max_len"),
        )
        .join(docs, "doc_id")
        .collect()
    )
    assert per_doc
    for r in per_doc:
        # chunk count = ceil(n / stride); indices dense from 0
        want = -(-r["n"] // CHUNK_STRIDE)
        assert r["n_chunks"] == want
        assert r["max_idx"] == want - 1
        assert r["max_len"] <= CHUNK_SIZE
        # last chunk covers the tail: stride * (want-1) + last_len == n
        assert r["min_len"] >= 1


def test_chunk_reconstruction_roundtrip(spark, sf_dir):
    # Non-overlapping prefix of each chunk (stride chars) concatenated
    # in index order reproduces the document.
    docs = dict(
        t(spark, sf_dir, "documents").select("doc_id", "text").limit(20).collect()
    )
    chunks = (
        chunk_documents(spark, sf_dir)
        .filter(F.col("doc_id").isin(*docs.keys()))
        .select("doc_id", "chunk_idx", "chunk")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk"]))
    for doc_id, parts in by_doc.items():
        parts.sort()
        rebuilt = "".join(
            c[:CHUNK_STRIDE] for _, c in parts[:-1]
        ) + parts[-1][1]
        assert rebuilt == docs[doc_id]


def test_pack_sequences_invariants(spark, sf_dir):
    out = pack_sequences(spark, sf_dir).collect()
    assert out
    # Offsets stay inside the budget; doc lands in the sequence its
    # start offset falls in; shards pack independently and
    # deterministically (re-run agrees).
    for r in out:
        assert 0 <= r["seq_offset"] < PACK_BUDGET
        assert r["seq_id"] >= 0
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["seq_id"] == cum // PACK_BUDGET
            assert r["seq_offset"] == cum % PACK_BUDGET
            cum += r["n_tokens"]


def test_decontam_flags_exact_copies(spark, sf_dir):
    # Every benchmark doc's full text also exists in the corpus iff
    # some corpus doc shares a 3-gram; sanity: flagged docs really
    # share a shingle with the benchmark set.
    out = decontam_ngram_overlap(spark, sf_dir)
    flagged = out.filter(F.col("contaminated")).count()
    total = out.count()
    assert total > 0
    # With a tiny synthetic vocabulary nearly everything shares a
    # 3-gram — the operator must not report zero or all-clean.
    assert flagged > 0
    assert out.filter(F.col("n_overlap_shingles") < 0).count() == 0


def test_tfidf_top3_and_ordering(spark, sf_dir):
    out = tfidf_top_terms(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        assert 1 <= len(rows) <= 3
        assert all(r["tfidf"] is not None for r in rows)


def test_inverted_index_postings_sorted_and_bounded(spark, sf_dir):
    out = inverted_index_postings(spark, sf_dir).collect()
    assert out
    for r in out:
        # top_postings is comma-joined (string, not array — graded
        # outputs stay scalar-typed for the driver's canonicalizer).
        p = [int(x) for x in r["top_postings"].split(",")]
        assert len(p) <= 10
        assert p == sorted(p)
        assert r["n_docs"] >= len(p) or r["n_docs"] <= 10


def test_funnel_is_monotone(spark, sf_dir):
    row = funnel_conversion(spark, sf_dir).collect()[0]
    assert row["n_viewed"] >= row["n_clicked_after_view"] >= row[
        "n_purchased_after_click"
    ] >= 0


def test_histogram_buckets_partition_orders(spark, sf_dir):
    rows = hist_order_totals(spark, sf_dir).collect()
    n_orders = t(spark, sf_dir, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    for r in rows:
        assert r["bucket_lo"] == r["bucket"] * 50_000
        assert r["bucket_lo"] <= r["avg_price"] <= r["bucket_lo"] + 50_000


def test_upsert_latest_state_tombstones(spark, sf_dir):
    from caliper_poc_data_etl_spark.queries.training import upsert_latest_state

    e = t(spark, sf_dir, "events")
    out = upsert_latest_state(spark, sf_dir)
    assert out.filter(F.col("last_event_type") == "error").count() == 0
    # ≤ one state row per user; users whose LAST event errored are absent
    n_users = e.select("user_id").distinct().count()
    assert out.count() <= n_users
    assert out.groupBy("user_id").count().filter(F.col("count") > 1).count() == 0


def test_sample_cap_per_source(spark, sf_dir):
    from caliper_poc_data_etl_spark.queries.training import (
        _CAP_PER_SOURCE,
        sample_cap_per_source,
    )

    out = sample_cap_per_source(spark, sf_dir)
    per_src = out.groupBy("source").count().collect()
    for r in per_src:
        assert r["count"] <= _CAP_PER_SOURCE
    # Deterministic: re-running yields the identical sample.
    again = {tuple(r) for r in sample_cap_per_source(spark, sf_dir).collect()}
    assert {tuple(r) for r in out.collect()} == again


def test_stream_join_matches_batch(spark, sf_dir):
    clicks_s = read_event_stream(spark, sf_dir).filter(F.col("event_type") == "click")
    purch_s = read_event_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    streamed = replay_to_df(click_purchase_join(clicks_s, purch_s), mode="append")
    e = t(spark, sf_dir, "events")
    batch = click_purchase_join(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
    )
    got = {tuple(r) for r in streamed.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want
    assert want  # non-degenerate at sf0.001
