"""Semantic tests for round-4 operators — properties the oracle
hash-match cannot express (cross-query invariants, contrasting
semantics, determinism), on the sf0.001 fixtures.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from caliper_poc_data_etl_spark.queries import QUERIES


class TestThrottleSemantics:
    def test_lastkept_rate_limits_where_rawgap_suppresses(self, spark):
        """A steady 1-minute burst for 30 minutes: the raw-gap
        throttle (dedup_events_throttle semantics) keeps ONLY the
        first event; the last-kept throttle re-emits one event per
        5-minute window (the rate-limiter contract)."""
        base = dt.datetime(2024, 1, 1)
        rows = [
            (i, base + dt.timedelta(minutes=i), 1, "click", 1.0, "{}")
            for i in range(31)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        import tempfile

        d = tempfile.mkdtemp(prefix="throttle_fix_")
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        raw = QUERIES["dedup_events_throttle"].spark(spark, d).collect()
        lastkept = (
            QUERIES["dedup_events_throttle_lastkept"].spark(spark, d).collect()
        )
        assert len(raw) == 1  # indefinite suppression (documented)
        # last-kept: t=0 kept, then first event >5min after each kept
        # → t=0,6,12,18,24,30 = 6 events
        kept_ids = sorted(r["event_id"] for r in lastkept)
        assert kept_ids == [0, 6, 12, 18, 24, 30]

    def test_lastkept_subset_of_events_and_first_always_kept(
        self, spark, sf_dir
    ):
        out = QUERIES["dedup_events_throttle_lastkept"].spark(spark, sf_dir)
        raw = QUERIES["dedup_events_throttle"].spark(spark, sf_dir)
        # Raw-gap keeps an event only when its predecessor is old —
        # those events are also >5min after any kept predecessor, so
        # raw-kept ⊆ lastkept-kept.
        assert raw.join(out, ["user_id", "event_type", "event_id"]).count() == (
            raw.count()
        )


class TestGraphOps:
    def test_triangle_count_matches_bruteforce(self, spark, sf_dir):
        deg = QUERIES["graph_degree_stats"].spark(spark, sf_dir)
        n_docs = deg.count()
        # Rebuild the affine edge list in plain Python and brute-force
        # count triangles.
        edges = set()
        for node in range(n_docs):
            for mult, add in ((7, 1), (13, 2), (29, 3)):
                dst = (node * mult + add) % n_docs
                if dst != node:
                    edges.add((min(node, dst), max(node, dst)))
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
        expected = sum(
            1
            for a, nbrs in adj.items()
            for b in nbrs
            for c in adj.get(b, ())
            if c in nbrs
        )
        got = QUERIES["graph_triangle_count"].spark(spark, sf_dir).collect()
        assert got[0]["n_triangles"] == expected

    def test_degree_totals_match_edge_count(self, spark, sf_dir):
        deg = QUERIES["graph_degree_stats"].spark(spark, sf_dir)
        sums = deg.agg(
            F.sum("out_deg").alias("o"), F.sum("in_deg").alias("i")
        ).collect()[0]
        assert sums["o"] == sums["i"]  # every directed edge counted once each


class TestSamplingAndHashing:
    def test_bernoulli_sample_rate_and_determinism(self, spark, sf_dir):
        q = QUERIES["sample_bernoulli_hash"].spark
        a = {r["doc_id"] for r in q(spark, sf_dir).collect()}
        b = {r["doc_id"] for r in q(spark, sf_dir).collect()}
        assert a == b  # deterministic across runs
        total = QUERIES["dedup_exact"].spark(spark, sf_dir).count()
        # p=0.10 with md5 uniformity; loose 3-sigma-ish band.
        assert 0.02 <= len(a) / max(total, 1) <= 0.25

    def test_hashing_vectorizer_invariants(self, spark, sf_dir):
        vec = QUERIES["text_hashing_vectorizer"].spark(spark, sf_dir)
        toks = QUERIES["text_stopword_density"].spark(spark, sf_dir).select(
            "doc_id", "n_tokens"
        )
        joined = vec.join(toks, "doc_id").collect()
        assert joined
        for r in joined:
            assert 1 <= r["nnz"] <= 256
            assert r["nnz"] <= r["n_tokens"]
            # Σc² ≥ Σc (every bucket count ≥1) and l2² == sq_norm.
            assert r["sq_norm"] >= r["n_tokens"]
            assert abs(r["l2"] ** 2 - r["sq_norm"]) < 1e-3 * r["sq_norm"] + 1


class TestCohortsAndStreaks:
    def test_retention_offset_zero_covers_every_user(self, spark, sf_dir):
        ret = QUERIES["ts_retention_cohorts"].spark(spark, sf_dir)
        rows = ret.collect()
        n_users = (
            QUERIES["window_gaps_islands"].spark(spark, sf_dir).count()
        )  # one row per user
        offset0 = sum(r["active_users"] for r in rows if r["week_offset"] == 0)
        assert offset0 == n_users  # everyone is active in their cohort week
        assert all(r["week_offset"] >= 0 for r in rows)

    def test_gaps_islands_consistency(self, spark, sf_dir):
        gi = QUERIES["window_gaps_islands"].spark(spark, sf_dir).collect()
        assert gi
        for r in gi:
            assert 1 <= r["max_streak"] <= r["active_days"]
            assert r["n_streaks"] <= r["active_days"]


class TestTpchAnalogs:
    def test_q13_histogram_mass_balance(self, spark, sf_dir):
        rows = QUERIES["q13_customer_distribution"].spark(spark, sf_dir).collect()
        n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
        n_orders = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
            .count()
        )
        assert sum(r["custdist"] for r in rows) == n_cust
        assert sum(r["c_count"] * r["custdist"] for r in rows) == n_orders

    def test_q15_returns_the_actual_max(self, spark, sf_dir):
        rows = QUERIES["q15_top_supplier"].spark(spark, sf_dir).collect()
        assert rows
        revs = [r["total_revenue"] for r in rows]
        assert len(set(revs)) == 1  # ties only

    def test_q8_share_bounded(self, spark, sf_dir):
        rows = QUERIES["q8_market_share"].spark(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0.0 <= r["mkt_share"] <= 1.0


class TestParityTwinConsistency:
    def test_ivf_assignment_only_uses_real_cells(self, spark, sf_dir):
        rows = QUERIES["sim_ivf_assign_parity"].spark(spark, sf_dir).collect()
        assert rows
        from caliper_poc_data_etl_spark.queries.similarity import N_CELLS

        assert {r["assigned_cell"] for r in rows} <= set(range(N_CELLS))
        # Every centroid assigns to itself (cosine with itself = 1).
        for r in rows:
            if r["vec_id"] < N_CELLS:
                assert r["assigned_cell"] == r["vec_id"]

    def test_lsh_candidate_pairs_symmetric_and_ordered(self, spark, sf_dir):
        rows = QUERIES["dedup_embedding_lsh_candidate_parity"].spark(
            spark, sf_dir
        ).collect()
        assert rows
        pairs = {(r["vec_a"], r["vec_b"]) for r in rows}
        assert all(a < b for a, b in pairs)
        assert len(pairs) == len(rows)  # distinct
