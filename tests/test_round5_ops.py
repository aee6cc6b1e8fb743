"""Semantic tests for the round-5 queued operators — properties the
oracle hash-match cannot express (estimator bounds, monotonicity,
cross-query consistency, UDF-vs-local recomputation), on the sf0.001
fixtures.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from caliper_poc_data_etl_spark.queries import QUERIES


def _rows(name, spark, sf_dir):
    return QUERIES[name].spark(spark, sf_dir).collect()


class TestResampleInterp:
    def test_interpolated_between_anchors_and_grid_complete(self, spark, sf_dir):
        out = _rows("ts_resample_linear_interp", spark, sf_dir)
        e = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("user_id", F.to_date("ts").alias("day"), "value")
            .collect()
        )
        # observed daily means (exact enough at 4dp for bound checks)
        from collections import defaultdict

        vals = defaultdict(list)
        for r in e:
            vals[(r["user_id"], r["day"])].append(r["value"])
        daily = {k: sum(v) / len(v) for k, v in vals.items()}
        days_by_user = defaultdict(list)
        for u, d in daily:
            days_by_user[u].append(d)
        # grid completeness: every user emits exactly (span+1) rows
        per_user = defaultdict(int)
        for r in out:
            per_user[r["user_id"]] += 1
        for u, ds in days_by_user.items():
            span = (max(ds) - min(ds)).days + 1
            assert per_user[u] == span
        # every interpolated value lies between SOME two observed
        # values of that user (linear interp can't escape the range)
        obs_range = {
            u: (min(daily[(u, d)] for d in ds), max(daily[(u, d)] for d in ds))
            for u, ds in days_by_user.items()
        }
        for r in out:
            lo, hi = obs_range[r["user_id"]]
            assert lo - 1e-3 <= r["value_interp"] <= hi + 1e-3
            if r["observed"]:
                import datetime as dt

                d = dt.date.fromisoformat(r["day"])
                assert r["value_interp"] == pytest.approx(
                    daily[(r["user_id"], d)], abs=1e-4
                )


class TestEwma:
    def test_ewma_bounded_and_single_event_identity(self, spark, sf_dir):
        out = {r["user_id"]: r for r in _rows("ts_ewma_smoothing", spark, sf_dir)}
        e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        from collections import defaultdict

        series = defaultdict(list)
        for r in sorted(e, key=lambda r: (r["ts"], r["event_id"])):
            series[r["user_id"]].append(r["value"])
        for u, xs in series.items():
            kept = xs[-32:]
            r = out[u]
            assert r["n_terms"] == len(kept)
            # weights sum to 1 → EWMA is a convex combination
            assert min(kept) - 1e-6 <= r["ewma"] <= max(kept) + 1e-6
            # reference fold
            s = kept[0]
            for x in kept[1:]:
                s = 0.5 * x + 0.5 * s
            assert r["ewma"] == pytest.approx(s, abs=1e-4)


class TestRunningDistinct:
    def test_monotone_and_final_equals_count_distinct(self, spark, sf_dir):
        out = _rows("window_running_distinct", spark, sf_dir)
        from collections import defaultdict

        by_user = defaultdict(list)
        for r in out:
            by_user[r["user_id"]].append(r)
        truth = {
            r["user_id"]: r["n"]
            for r in spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("user_id")
            .agg(F.countDistinct("event_type").alias("n"))
            .collect()
        }
        for u, rows in by_user.items():
            rows.sort(key=lambda r: (r["ts"], r["event_id"]))
            seq = [r["n_types_so_far"] for r in rows]
            assert all(a <= b for a, b in zip(seq, seq[1:]))
            assert seq[0] == 1
            assert seq[-1] == truth[u]


class TestCountMin:
    def test_estimate_never_undercounts(self, spark, sf_dir):
        out = _rows("agg_countmin_heavy_hitters", spark, sf_dir)
        assert out
        for r in out:
            assert r["est_count"] >= r["true_count"]
            assert r["overcount"] == r["est_count"] - r["true_count"]

    def test_top_estimates_cover_true_heavy_hitters(self, spark, sf_dir):
        """CMS can only overcount, so the top-25 BY ESTIMATE must
        contain every key whose TRUE count beats the 25th estimate."""
        out = _rows("agg_countmin_heavy_hitters", spark, sf_dir)
        floor = min(r["est_count"] for r in out)
        kept = {r["user_id"] for r in out}
        truth = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("user_id")
            .count()
            .collect()
        )
        for r in truth:
            if r["count"] > floor:
                assert r["user_id"] in kept


class TestRecursiveBfs:
    def test_bfs_levels_consistent(self, spark, sf_dir):
        out = {r["dist"]: r for r in _rows("sql_recursive_cte_bfs", spark, sf_dir)}
        assert out[0]["n_nodes"] == 1 and out[0]["min_node"] == 7
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        total = 0
        for d, r in out.items():
            assert r["n_nodes"] <= 3**d
            assert 0 <= r["min_node"] <= r["max_node"] < n_docs
            total += r["n_nodes"]
        assert total <= n_docs


class TestPerplexityProxy:
    def test_scores_are_log_probs(self, spark, sf_dir):
        out = _rows("text_perplexity_proxy", spark, sf_dir)
        docs = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        }
        for r in out:
            assert r["avg_logp"] <= 0.0
            n_toks = len(docs[r["doc_id"]].strip().lower().split())
            assert r["n_bigrams"] == n_toks - 1


class TestBoilerplate:
    def test_ratio_bounds_and_duplicated_docs_score_one(self, spark, sf_dir):
        out = _rows("text_boilerplate_shingle_ratio", spark, sf_dir)
        for r in out:
            assert 0.0 <= r["boiler_ratio"] <= 1.0
            assert 0 <= r["n_boiler"] <= r["n_shingles"]
        # a shingle shared by >= 5 docs IS boilerplate: recompute df
        # locally for one doc and cross-check its n_boiler
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        from collections import defaultdict

        df = defaultdict(set)
        per_doc = {}
        for d in docs:
            toks = d["text"].strip().lower().split()
            shs = {
                " ".join(toks[i : i + 8]) for i in range(len(toks) - 7)
            }
            per_doc[d["doc_id"]] = shs
            for sh in shs:
                df[sh].add(d["doc_id"])
        got = {r["doc_id"]: r for r in out}
        for doc_id, shs in list(per_doc.items())[:25]:
            if not shs:
                continue
            n_boiler = sum(1 for sh in shs if len(df[sh]) >= 5)
            assert got[doc_id]["n_shingles"] == len(shs)
            assert got[doc_id]["n_boiler"] == n_boiler


class TestMinhashEstimate:
    def test_estimator_within_binomial_bound(self, spark, sf_dir):
        out = _rows("dedup_minhash_jaccard_estimate", spark, sf_dir)
        assert out, "sf0.001 must contain at least one near-dup pair"
        for r in out:
            assert 0.0 <= r["est_j"] <= 1.0
            # K=32 → σ = sqrt(p(1-p)/32) ≤ 0.0884; allow 4σ
            assert abs(r["est_j"] - r["exact_j"]) <= 4 * math.sqrt(
                0.25 / 32
            ) + 1e-9


class TestCommonNeighbors:
    def test_matches_bruteforce(self, spark, sf_dir):
        out = {
            (r["node_a"], r["node_b"]): r
            for r in _rows("graph_common_neighbors", spark, sf_dir)
        }
        n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        from collections import defaultdict

        nbrs = defaultdict(set)
        for s in range(n):
            for m, a in ((7, 1), (13, 2), (29, 3)):
                d = (s * m + a) % n
                if d != s:
                    nbrs[s].add(d)
        expect = {}
        nodes = sorted(nbrs)
        for i, x in enumerate(nodes):
            for y in nodes[i + 1 :]:
                cn = len(nbrs[x] & nbrs[y])
                if cn >= 2:
                    expect[(x, y)] = (
                        cn,
                        round(cn / len(nbrs[x] | nbrs[y]), 4),
                    )
        assert set(out) == set(expect)
        for k, (cn, jc) in expect.items():
            assert out[k]["n_common"] == cn
            assert out[k]["jaccard"] == pytest.approx(jc, abs=1e-4)


class TestUrlPack:
    def test_parse_matches_construction(self, spark, sf_dir):
        out = _rows("fn_url_pack", spark, sf_dir)
        docs = {
            r["doc_id"]: r
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        }
        for r in out:
            d = docs[r["doc_id"]]
            assert r["host"] == f"ex-{d['source']}.example.com"
            assert r["path"] == f"/docs/{d['doc_id']}"
            assert r["lang_param"] == d["lang"]
            assert r["n_param"] == d["n_chars"]


class TestStreamTopk:
    def test_topk_agrees_with_batch_counts(self, spark, sf_dir):
        out = _rows("stream_topk_per_window_replay", spark, sf_dir)
        batch = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy(
                F.date_format(
                    F.window("ts", "1 hour").getField("start"),
                    "yyyy-MM-dd HH:mm:ss",
                ).alias("window_start"),
                "event_type",
            )
            .agg(F.count("*").alias("n"))
            .collect()
        )
        truth = {(r["window_start"], r["event_type"]): r["n"] for r in batch}
        from collections import defaultdict

        per_win = defaultdict(list)
        for r in out:
            assert 1 <= r["rk"] <= 3
            assert truth[(r["window_start"], r["event_type"])] == r["n"]
            per_win[r["window_start"]].append(r)
        for w, rows in per_win.items():
            rows.sort(key=lambda r: r["rk"])
            # the ranked counts are the top counts for the window
            win_counts = sorted(
                (n for (ws, _), n in truth.items() if ws == w), reverse=True
            )
            assert [r["n"] for r in rows] == win_counts[: len(rows)]


class TestAhash:
    def test_hash_matches_local_numpy_and_partner_mass_even(
        self, spark, sf_dir
    ):
        import numpy as np

        out = _rows("mm_ahash_hamming_neardup", spark, sf_dir)
        docs = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        }
        got = {r["media_id"]: r for r in out}
        checked = 0
        for doc_id, text in docs.items():
            b = text.encode("utf-8")
            if len(b) < 60:
                assert doc_id not in got
                continue
            px = np.frombuffer(b[:60], dtype=np.uint8).astype(np.int64)
            bits = px * 60 > int(px.sum())
            h = 0
            for bit in bits:
                h = (h << 1) | int(bit)
            assert got[doc_id]["ahash"] == h
            checked += 1
        assert checked
        assert sum(r["n_near"] for r in out) % 2 == 0

    def test_banding_recall_on_planted_neardup(self, spark):
        """Two payloads differing in one byte — close enough that the
        fingerprints land within the Hamming budget — must be reported
        as near-dup partners of each other."""
        import tempfile

        base = bytes(range(60, 120))  # strictly increasing bytes
        twin = bytes([base[0] + 1]) + base[1:]
        rows = [
            (0, base.decode("latin-1"), "en", "src0", 60),
            (1, twin.decode("latin-1"), "en", "src0", 60),
        ]
        d = tempfile.mkdtemp(prefix="ahash_fix_")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {
            r["media_id"]: r
            for r in _rows("mm_ahash_hamming_neardup", spark, d)
        }
        assert out[0]["n_near"] >= 1 and out[1]["n_near"] >= 1


class TestPqCodes:
    def test_centroids_self_encode_and_nibbles_in_range(self, spark, sf_dir):
        out = {r["vec_id"]: r for r in _rows("sim_pq_code_parity", spark, sf_dir)}
        n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        assert len(out) == n_vecs
        for vid, r in out.items():
            assert r["recon_err_sq"] >= 0
            code = r["pq_code"]
            for s in range(8):
                assert 0 <= (code >> (s * 4)) & 0xF < 16
        # a codebook vector reconstructs itself exactly
        for vid in range(16):
            assert out[vid]["recon_err_sq"] == 0
            code = out[vid]["pq_code"]
            assert all(((code >> (s * 4)) & 0xF) == vid for s in range(8))


class TestSchemaEvolution:
    def test_union_schema_with_batch_nulls(self, spark, sf_dir):
        out = _rows("scan_schema_evolution", spark, sf_dir)
        n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
        assert len(out) == n_orders
        for r in out:
            if r["o_orderkey"] % 2 == 0:
                assert r["totalprice"] is not None
                assert r["priority_len"] is None
            else:
                assert r["totalprice"] is None
                assert r["priority_len"] is not None


class TestAsofTolerance:
    def test_tolerance_restricts_unbounded_asof(self, spark, sf_dir):
        tol = {r["event_id"]: r for r in _rows("join_asof_tolerance", spark, sf_dir)}
        import datetime as dt

        unbounded = {
            r["event_id"]: r for r in _rows("join_asof", spark, sf_dir)
        }
        assert set(tol) == set(unbounded)
        fmt = "%Y-%m-%d %H:%M:%S.%f"
        for eid, r in tol.items():
            u = unbounded[eid]
            if r["within_tolerance"]:
                assert r["prior_click_ts"] == u["prior_click_ts"]
                gap = dt.datetime.strptime(
                    r["purchase_ts"], fmt
                ) - dt.datetime.strptime(r["prior_click_ts"], fmt)
                assert gap <= dt.timedelta(hours=1)
            else:
                assert r["prior_click_ts"] is None
                if u["prior_click_ts"] is not None:
                    gap = dt.datetime.strptime(
                        u["purchase_ts"], fmt
                    ) - dt.datetime.strptime(u["prior_click_ts"], fmt)
                    assert gap > dt.timedelta(hours=1)


class TestMomentsPack:
    def test_matches_numpy_population_moments(self, spark, sf_dir):
        import numpy as np

        out = {r["event_type"]: r for r in _rows("agg_moments_pack", spark, sf_dir)}
        e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        from collections import defaultdict

        vals = defaultdict(list)
        for r in e:
            vals[r["event_type"]].append(r["value"])
        for et, xs in vals.items():
            a = np.asarray(xs)
            r = out[et]
            assert r["n"] == len(xs)
            assert r["mean"] == pytest.approx(a.mean(), abs=1e-4)
            assert r["std_pop"] == pytest.approx(a.std(), abs=1e-4)
            m2 = ((a - a.mean()) ** 2).mean()
            m3 = ((a - a.mean()) ** 3).mean()
            m4 = ((a - a.mean()) ** 4).mean()
            assert r["skew_pop"] == pytest.approx(m3 / m2**1.5, abs=1e-3)
            assert r["kurt_excess"] == pytest.approx(m4 / m2**2 - 3, abs=1e-3)


class TestKeepLongest:
    def test_domination_consistency(self, spark, sf_dir):
        out = {r["doc_id"]: r for r in _rows("dedup_keep_longest", spark, sf_dir)}
        pairs = _rows("dedup_ngram_jaccard", spark, sf_dir)
        lens = {
            r["doc_id"]: r["n_chars"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        }
        assert len(out) == len(lens)
        dropped = set()
        for p in pairs:
            a, b = p["doc_a"], p["doc_b"]
            if lens[a] < lens[b] or (lens[a] == lens[b] and a > b):
                dropped.add(a)
            else:
                dropped.add(b)
        for doc_id, r in out.items():
            assert r["kept"] == (doc_id not in dropped)
            if r["n_dup_partners"] == 0:
                assert r["kept"]


class TestPointInTime:
    def test_tier_matches_last_purchase_before_click(self, spark, sf_dir):
        out = {r["event_id"]: r for r in _rows("join_point_in_time_scd2", spark, sf_dir)}
        e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        from collections import defaultdict

        stream = defaultdict(list)
        for r in e:
            if r["event_type"] in ("click", "purchase"):
                stream[r["user_id"]].append(r)
        for u, rows in stream.items():
            rows.sort(key=lambda r: (r["ts"], r["event_type"], r["event_id"]))
            tier = None
            for r in rows:
                if r["event_type"] == "purchase":
                    tier = int(r["value"] // 25)
                else:
                    assert out[r["event_id"]]["tier_at_click"] == tier


class TestGini:
    def test_bounds_and_whale_sensitivity(self, spark, sf_dir):
        out = _rows("agg_gini_concentration", spark, sf_dir)
        assert out
        for r in out:
            assert 0.0 <= r["gini"] < 1.0
            assert r["n_customers"] > 0
        # local recomputation for one segment
        rows = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .join(
                spark.read.parquet(f"{sf_dir}/customer.parquet"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment", "o_custkey")
            .agg(F.sum("o_totalprice").alias("x"))
            .collect()
        )
        from collections import defaultdict

        seg = defaultdict(list)
        for r in rows:
            seg[r["c_mktsegment"]].append(r["x"])
        got = {r["segment"]: r["gini"] for r in out}
        for s, xs in seg.items():
            xs.sort()
            n = len(xs)
            tot = sum(xs)
            g = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs)) / (
                n * tot
            )
            assert got[s] == pytest.approx(g, abs=1e-4)


class TestCusum:
    def test_changepoint_is_argmax_of_reference_cusum(self, spark, sf_dir):
        out = {r["event_type"]: r for r in _rows("ts_cusum_changepoint", spark, sf_dir)}
        e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        from collections import defaultdict

        daily = defaultdict(lambda: defaultdict(float))
        for r in e:
            daily[r["event_type"]][r["ts"].date()] += round(r["value"], 2)
        for et, dd in daily.items():
            days = sorted(dd)
            n = len(days)
            total = sum(dd.values())
            best, best_day = -1.0, None
            c = 0.0
            for i, d in enumerate(days, start=1):
                c += dd[d]
                dev = abs(n * c - i * total)
                if dev > best + 1e-6:
                    best, best_day = dev, d
            assert out[et]["change_day"] == best_day.isoformat()
            assert out[et]["max_abs_dev"] == pytest.approx(best, rel=1e-6)


class TestLongestStreak:
    def test_streaks_match_reference_scan(self, spark, sf_dir):
        out = {r["user_id"]: r for r in _rows("window_longest_streak", spark, sf_dir)}
        e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        from collections import defaultdict

        days = defaultdict(set)
        for r in e:
            days[r["user_id"]].add(r["ts"].date())
        import datetime as dt

        for u, ds in days.items():
            sd = sorted(ds)
            best, best_start = 1, sd[0]
            run, run_start = 1, sd[0]
            for prev, cur in zip(sd, sd[1:]):
                if cur - prev == dt.timedelta(days=1):
                    run += 1
                else:
                    run, run_start = 1, cur
                if run > best:
                    best, best_start = run, run_start
            assert out[u]["longest_streak"] == best
            assert out[u]["streak_start"] == best_start.isoformat()


class TestTimeHoldout:
    def test_split_sizes_and_ordering(self, spark, sf_dir):
        out = _rows("sample_time_holdout", spark, sf_dir)
        e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        split = {r["event_id"]: r["split"] for r in out}
        from collections import defaultdict

        by_user = defaultdict(list)
        for r in e:
            by_user[r["user_id"]].append(r)
        import math as _math

        for u, rows in by_user.items():
            rows.sort(key=lambda r: (r["ts"], r["event_id"]))
            n = len(rows)
            n_eval = _math.ceil(n / 5)
            tail = rows[-n_eval:]
            head = rows[:-n_eval]
            assert all(split[r["event_id"]] == "eval" for r in tail)
            assert all(split[r["event_id"]] == "train" for r in head)


class TestFormatScans:
    def test_text_roundtrip_preserves_every_doc(self, spark, sf_dir):
        out = {r["doc_id"]: r for r in _rows("scan_text_source", spark, sf_dir)}
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        assert len(out) == len(docs)
        for d in docs:
            r = out[d["doc_id"]]
            assert r["line_len"] == len(d["text"])
            assert r["first_token"] == d["text"].split()[0]

    def test_xml_roundtrip_typed_values(self, spark, sf_dir):
        out = {r["o_orderkey"]: r for r in _rows("scan_xml_source", spark, sf_dir)}
        orders = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter(F.col("o_orderkey") % 10 == 0)
            .collect()
        )
        assert len(out) == len(orders)
        for o in orders:
            r = out[o["o_orderkey"]]
            assert r["o_orderstatus"] == o["o_orderstatus"]
            assert r["totalprice"] == pytest.approx(
                round(o["o_totalprice"], 2), abs=1e-9
            )


class TestBloomFilter:
    def test_no_false_negatives_and_fp_rate_sane(self, spark, sf_dir):
        out = _rows("agg_bloom_filter_membership", spark, sf_dir)
        assert out
        n_fp = 0
        n_neg = 0
        for r in out:
            if r["actually_present"]:
                # THE bloom guarantee: members always pass
                assert r["bloom_positive"]
                assert not r["false_positive"]
            else:
                n_neg += 1
                if r["bloom_positive"]:
                    assert r["false_positive"]
                    n_fp += 1
        # m=65536, k=7, n ≤ a few hundred keys → theoretical FP rate
        # ~(1-exp(-kn/m))^k ≪ 1%; allow a loose 5% ceiling
        if n_neg:
            assert n_fp / n_neg < 0.05


class TestForeachBatchUpsert:
    def test_final_state_equals_batch_upsert(self, spark, sf_dir):
        stream_state = {
            r["user_id"]: r
            for r in _rows("stream_foreachbatch_upsert", spark, sf_dir)
        }
        batch_state = {
            r["user_id"]: r for r in _rows("upsert_latest_state", spark, sf_dir)
        }
        assert stream_state.keys() == batch_state.keys()
        for u, r in stream_state.items():
            b = batch_state[u]
            assert (r["last_ts"], r["last_event_type"], r["last_value"]) == (
                b["last_ts"],
                b["last_event_type"],
                b["last_value"],
            )


class TestSequencePattern:
    def test_matches_are_strictly_consecutive_and_bounded(self, spark, sf_dir):
        out = {r["user_id"]: r for r in _rows("ts_event_sequence_pattern", spark, sf_dir)}
        e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        from collections import defaultdict
        import datetime as dt

        timeline = defaultdict(list)
        for r in e:
            timeline[r["user_id"]].append(r)
        expect = {}
        for u, rows in timeline.items():
            rows.sort(key=lambda r: (r["ts"], r["event_id"]))
            hits = [
                rows[i]["ts"]
                for i in range(len(rows) - 2)
                if rows[i]["event_type"] == "view"
                and rows[i + 1]["event_type"] == "click"
                and rows[i + 2]["event_type"] == "purchase"
                and rows[i + 2]["ts"] - rows[i]["ts"] <= dt.timedelta(hours=24)
            ]
            if hits:
                expect[u] = (len(hits), min(hits))
        assert set(out) == set(expect)
        for u, (n, first) in expect.items():
            assert out[u]["n_patterns"] == n
            assert out[u]["first_match_start"] == first.strftime(
                "%Y-%m-%d %H:%M:%S.%f"
            )


class TestPercentileDisc:
    def test_disc_values_occur_in_data(self, spark, sf_dir):
        out = _rows("agg_percentile_disc_pack", spark, sf_dir)
        e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        from collections import defaultdict

        vals = defaultdict(set)
        for r in e:
            vals[r["event_type"]].add(round(r["value"], 2))
        for r in out:
            vs = vals[r["event_type"]]
            # THE disc property: results are actual data values
            for c in ("p25_disc", "p50_disc", "p90_disc"):
                assert r[c] in vs
            assert r["p25_disc"] <= r["p50_disc"] <= r["p90_disc"]


class TestRegexAll:
    def test_counts_match_python_re(self, spark, sf_dir):
        import re as _re

        out = {r["doc_id"]: r for r in _rows("fn_regex_all_pack", spark, sf_dir)}
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        for d in docs:
            r = out[d["doc_id"]]
            matches = _re.findall(r"[a-z]*a[a-z]*", d["text"])
            assert r["n_a_words"] == len(matches)
            assert r["first_a_words"] == ",".join(matches[:5])
            assert r["has_scan_or_hash"] == bool(
                _re.search(r"\b(scan|hash)\b", d["text"])
            )


class TestDqConstraints:
    def test_all_constraints_pass_on_clean_fixture(self, spark, sf_dir):
        out = {r["constraint"]: r for r in _rows("dq_constraint_check", spark, sf_dir)}
        assert set(out) == {
            "completeness_custkey",
            "uniqueness_orderkey",
            "range_totalprice_positive",
            "referential_custkey",
            "domain_orderstatus",
        }
        for name, r in out.items():
            assert r["passed"], name
            assert r["violations"] == 0
            assert r["metric"] == pytest.approx(1.0)

    def test_violations_detected_on_dirty_fixture(self, spark):
        """Planted violations — a null custkey, a duplicate orderkey, a
        negative price, an orphan custkey, a bad status — must each
        trip exactly their own constraint."""
        import tempfile

        d = tempfile.mkdtemp(prefix="dq_fix_")
        spark.createDataFrame(
            [(1, 10, "F", 100.0), (2, 10, "O", 50.0)],
            "c_custkey long, c_nationkey long, c_mktsegment string, c_acctbal double",
        ).selectExpr(
            "c_custkey", "c_nationkey", "'BUILDING' AS c_mktsegment", "c_acctbal"
        ).write.mode("overwrite").parquet(f"{d}/customer.parquet")
        rows = [
            (1, 1, "F", 10.0),     # clean
            (2, None, "O", 10.0),  # null custkey
            (2, 1, "P", 10.0),     # duplicate orderkey
            (3, 1, "F", -5.0),     # negative price
            (4, 99, "O", 10.0),    # orphan custkey
            (5, 2, "X", 10.0),     # bad status
        ]
        spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double"
        ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
        out = {r["constraint"]: r for r in _rows("dq_constraint_check", spark, d)}
        assert out["completeness_custkey"]["violations"] == 1
        assert out["uniqueness_orderkey"]["violations"] == 1
        assert out["range_totalprice_positive"]["violations"] == 1
        assert out["referential_custkey"]["violations"] == 1
        assert out["domain_orderstatus"]["violations"] == 1
        assert not any(r["passed"] for r in out.values())


class TestIncrementalMerge:
    def test_merge_equals_direct_and_avg_of_avgs_differs(self, spark, sf_dir):
        out = {r["event_type"]: r for r in _rows("agg_incremental_merge", spark, sf_dir)}
        direct = {
            r["event_type"]: r
            for r in spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum(F.round("value", 2).cast("decimal(18,2)")), 2)
                .cast("double")
                .alias("total"),
                F.round(F.min("value"), 2).alias("min_value"),
                F.round(F.max("value"), 2).alias("max_value"),
            )
            .collect()
        }
        e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        from collections import defaultdict

        day_means = defaultdict(list)
        for r in e:
            day_means[(r["event_type"], r["ts"].date())].append(r["value"])
        avg_of_avgs = defaultdict(list)
        for (et, _), xs in day_means.items():
            avg_of_avgs[et].append(sum(xs) / len(xs))
        any_diff = False
        for et, r in out.items():
            d = direct[et]
            assert r["n"] == d["n"]
            assert r["total"] == pytest.approx(d["total"])
            assert r["min_value"] == d["min_value"]
            assert r["max_value"] == d["max_value"]
            assert r["mean"] == pytest.approx(r["total"] / r["n"], abs=1e-3)
            wrong = sum(avg_of_avgs[et]) / len(avg_of_avgs[et])
            if abs(wrong - r["mean"]) > 1e-4:
                any_diff = True
        # the non-algebraic merge must actually be wrong somewhere,
        # otherwise this test proves nothing
        assert any_diff


class TestBm25:
    def test_matches_reference_bm25(self, spark, sf_dir):
        import math as _math
        from collections import Counter

        out = _rows("text_bm25_topk", spark, sf_dir)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        toks = {d["doc_id"]: d["text"].strip().lower().split() for d in docs}
        n_docs = len(toks)
        avgdl = _math.floor(
            sum(len(v) for v in toks.values()) / n_docs * 100 + 0.5
        ) / 100
        query = ("spark", "hash", "window")
        df = Counter()
        for tk in toks.values():
            for q in set(tk) & set(query):
                df[q] += 1
        scores = {}
        for doc_id, tk in toks.items():
            c = Counter(tk)
            s = 0.0
            hits = 0
            for q in query:
                f = c.get(q, 0)
                if not f:
                    continue
                hits += 1
                idf = round(
                    _math.log((n_docs - df[q] + 0.5) / (df[q] + 0.5) + 1), 6
                )
                s += round(
                    idf * f * 2.2 / (f + 1.2 * (1 - 0.75 + 0.75 * len(tk) / avgdl)),
                    6,
                )
            if hits:
                scores[doc_id] = (round(s, 6), hits)
        expect = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
        assert [r["doc_id"] for r in out] == [doc_id for doc_id, _ in expect]
        for r, (doc_id, (s, hits)) in zip(out, expect):
            assert r["bm25"] == pytest.approx(s, abs=1e-5)
            assert r["n_query_terms_hit"] == hits


class TestKAnonymity:
    def test_accounting_identity(self, spark, sf_dir):
        r = _rows("dq_k_anonymity", spark, sf_dir)[0]
        quasi = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy(
                (F.col("user_id") % 10).alias("b"),
                "event_type",
                F.to_date("ts").alias("day"),
            )
            .count()
            .collect()
        )
        sizes = [x["count"] for x in quasi]
        assert r["n_classes"] == len(sizes)
        assert r["min_class_size"] == min(sizes)
        viol = [s for s in sizes if s < 5]
        assert r["n_violating_classes"] == len(viol)
        assert (r["n_rows_to_suppress"] or 0) == sum(viol)
        assert r["suppression_rate"] == pytest.approx(
            sum(viol) / sum(sizes), abs=1e-6
        )


class TestSeasonalDecompose:
    def test_additive_identity_and_trend_is_centered_ma(self, spark, sf_dir):
        out = _rows("ts_seasonal_decompose", spark, sf_dir)
        assert out
        for r in out:
            # observed == trend + seasonal + residual (up to the two
            # 4-dp floor-rounds applied along the way)
            assert abs(
                r["observed"] - (r["trend"] + r["seasonal"] + r["residual"])
            ) < 2e-4
        # seasonal component must be constant per day-of-week
        from collections import defaultdict

        per_dow = defaultdict(set)
        for r in out:
            per_dow[r["dow"]].add(r["seasonal"])
        assert all(len(v) == 1 for v in per_dow.values())


class TestOls:
    def test_matches_numpy_lstsq(self, spark, sf_dir):
        import numpy as np

        r = _rows("ml_ols_two_feature", spark, sf_dir)[0]
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_quantity", "l_discount", "l_extendedprice"
        ).collect()
        X = np.array([[1.0, x["l_quantity"], x["l_discount"]] for x in li])
        y = np.array([x["l_extendedprice"] for x in li])
        beta = np.linalg.lstsq(X, y, rcond=None)[0]
        assert r["n"] == len(li)
        assert r["beta_quantity"] == pytest.approx(beta[1], abs=1e-2)
        assert r["beta_discount"] == pytest.approx(beta[2], rel=1e-3, abs=1e-2)


class TestPowerIteration:
    def test_process_parity_and_rayleigh_growth(self, spark, sf_dir):
        """The engine's 6 quantized iterations must match a numpy
        replica of the same integer pipeline (process parity), and the
        Rayleigh quotient must grow from the uniform start and beat a
        random direction by a wide margin (the power-iteration
        guarantee that holds regardless of spectral gap)."""
        import numpy as np

        out = {r["j"]: r["m"] for r in _rows("embed_top_pc_power_iter", spark, sf_dir)}
        v_eng = np.array([out[j] for j in range(1, 65)], dtype=float)
        v_eng /= np.linalg.norm(v_eng)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
        X = np.array(
            [[round(float(x) * 1000) for x in r["embedding"]] for r in emb]
        )
        g = X.T @ X
        # numpy replica of the quantized pipeline (norm reduction is a
        # no-op at these magnitudes)
        v = np.full(64, 1000.0)
        for _ in range(6):
            w = X.T @ (X @ v)
            v = np.floor(1000 * w / np.linalg.norm(w) + 0.5)
        v_ref = v / np.linalg.norm(v)
        if v_ref[np.argmax(np.abs(v_ref))] < 0:
            v_ref = -v_ref
        assert abs(float(v_eng @ v_ref)) > 0.999
        # Rayleigh quotient: grows from the start, beats trace/64
        v0 = np.full(64, 1.0 / 8.0)
        rq0 = float(v0 @ g @ v0)
        rq = float(v_eng @ g @ v_eng)
        assert rq > rq0
        assert rq > 1.5 * float(np.trace(g)) / 64


class TestEntityResolution:
    def test_every_dirty_record_resolves_to_its_source(self, spark, sf_dir):
        out = _rows("er_blocked_name_match", spark, sf_dir)
        n_dirty = (
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .filter(F.col("c_custkey") % 7 == 0)
            .count()
        )
        # the true source is always in the dirty record's own block at
        # distance 1, and the (dist, key) tie-break prefers it — 100%
        # precision and recall on this construction
        assert len(out) == n_dirty
        for r in out:
            assert r["matched_key"] == r["dirty_id"]
            assert r["dist"] == 1


class TestAcf:
    def test_matches_numpy_acf(self, spark, sf_dir):
        import numpy as np

        out = {r["lag"]: r["acf"] for r in _rows("ts_acf_autocorrelation", spark, sf_dir)}
        e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        from collections import defaultdict

        daily = defaultdict(float)
        for r in e:
            daily[r["ts"].date()] += round(r["value"], 2)
        x = np.array([daily[d] for d in sorted(daily)])
        xbar = x.mean()
        den = float(((x - xbar) ** 2).sum())
        for k in range(1, 8):
            num = float(((x[:-k] - xbar) * (x[k:] - xbar)).sum())
            assert out[k] == pytest.approx(num / den, abs=2e-3)
            assert -1.0 <= out[k] <= 1.0


class TestForeachBatchMultiBatch:
    def test_two_batch_replay_equals_batch_upsert(self, spark, sf_dir):
        """Replay a two-file copy of events with maxFilesPerTrigger=1
        so the MERGE truly folds across two micro-batches — the
        single-file fixture only exercises the bootstrap path."""
        import glob
        import tempfile

        from pyspark.sql.window import Window as W2

        from caliper_poc_data_etl_spark.queries.streaming_replay import (
            _foreachbatch_upsert,
        )

        src = spark.read.parquet(f"{sf_dir}/events.parquet")
        d = tempfile.mkdtemp(prefix="fb_upsert_multi_")
        # events.parquet (single file) feeds the schema read; the two
        # halves are separate top-level files the widened glob streams
        # one per trigger.
        import shutil

        src.coalesce(1).write.mode("overwrite").parquet(f"{d}/_stage")
        part = glob.glob(f"{d}/_stage/part-*")[0]
        shutil.copy(part, f"{d}/events.parquet")
        for i, half in enumerate(
            (
                src.filter(F.col("event_id") % 2 == 0),
                src.filter(F.col("event_id") % 2 == 1),
            )
        ):
            half.coalesce(1).write.mode("overwrite").parquet(f"{d}/_h{i}")
            shutil.copy(
                glob.glob(f"{d}/_h{i}/part-*")[0], f"{d}/half{i}.ev.parquet"
            )
        out = {
            r["user_id"]: r
            for r in _foreachbatch_upsert(
                spark, d, max_files_per_trigger=1, glob="half*.ev.parquet"
            ).collect()
        }
        w = W2.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        expect = {
            r["user_id"]: r
            for r in src.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
            .select(
                "user_id",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                    "last_ts"
                ),
                F.col("event_type").alias("last_event_type"),
                F.round("value", 2).alias("last_value"),
            )
            .collect()
        }
        assert out.keys() == expect.keys()
        for u, r in out.items():
            e = expect[u]
            assert (r["last_ts"], r["last_event_type"], r["last_value"]) == (
                e["last_ts"],
                e["last_event_type"],
                e["last_value"],
            )


class TestSceneCuts:
    def test_cuts_match_numpy_reference(self, spark, sf_dir):
        import numpy as np

        out = {r["media_id"]: r for r in _rows("mm_video_scene_cuts", spark, sf_dir)}
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        for d in docs:
            b = d["text"].encode("utf-8")
            if not b:
                continue
            frames = [b[i : i + 64] for i in range(0, len(b), 64)]
            cuts = []
            for i in range(1, len(frames)):
                s, n = sum(frames[i]), len(frames[i])
                ps, pn = sum(frames[i - 1]), len(frames[i - 1])
                if abs(s * pn - ps * n) > 4 * n * pn:
                    cuts.append(i)
            r = out[d["doc_id"]]
            assert r["n_frames"] == len(frames)
            assert r["n_cuts"] == len(cuts)
            assert r["first_cut_idx"] == (cuts[0] if cuts else None)


class TestForecast:
    def test_seasonal_naive_construction(self, spark, sf_dir):
        out = {r["horizon_day"]: r for r in _rows("ts_seasonal_naive_forecast", spark, sf_dir)}
        assert set(out) == set(range(1, 8))
        e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        from collections import defaultdict
        import datetime as dt

        daily = defaultdict(float)
        for r in e:
            daily[r["ts"].date()] += round(r["value"], 2)
        days = sorted(daily)
        import math as _math

        drift = _math.floor(
            (daily[days[-1]] - daily[days[0]]) / (len(days) - 1) * 1e4 + 0.5
        ) / 1e4
        for k in range(1, 8):
            season_day = days[-1] + dt.timedelta(days=k - 7)
            want = _math.floor((daily[season_day] + k * drift) * 1e4 + 0.5) / 1e4
            r = out[k]
            assert r["forecast_date"] == (
                days[-1] + dt.timedelta(days=k)
            ).isoformat()
            assert r["forecast"] == pytest.approx(want, abs=1e-6)


class TestDrawdown:
    def test_matches_reference_scan_and_is_nonvacuous(self, spark, sf_dir):
        out = {r["user_id"]: r for r in _rows("window_max_drawdown", spark, sf_dir)}
        e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        from collections import defaultdict

        flows = defaultdict(list)
        for r in sorted(e, key=lambda r: (r["ts"], r["event_id"])):
            v = round(r["value"], 2)
            flows[r["user_id"]].append(
                v if r["event_type"] in ("purchase", "signup") else -v
            )
        any_positive = False
        for u, fs in flows.items():
            c = peak = dd = 0.0
            peak = float("-inf")
            for f in fs:
                c = round(c + f, 2)
                peak = max(peak, c)
                dd = max(dd, round(peak - c, 2))
            r = out[u]
            assert r["max_drawdown"] == pytest.approx(dd, abs=1e-6)
            assert r["peak_value"] == pytest.approx(peak, abs=1e-6)
            if dd > 0:
                any_positive = True
        assert any_positive


class TestAsofNearest:
    def test_nearest_is_truly_nearest(self, spark, sf_dir):
        import datetime as dt

        out = {r["event_id"]: r for r in _rows("join_asof_nearest", spark, sf_dir)}
        e = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        from collections import defaultdict

        clicks = defaultdict(list)
        purchases = []
        for r in e:
            if r["event_type"] == "click":
                clicks[r["user_id"]].append(r["ts"])
            elif r["event_type"] == "purchase":
                purchases.append(r)
        fmt = "%Y-%m-%d %H:%M:%S.%f"
        for p in purchases:
            r = out[p["event_id"]]
            cs = clicks.get(p["user_id"], [])
            if not cs:
                assert r["nearest_click_ts"] is None
                continue
            best = min(cs, key=lambda c: (abs(c - p["ts"]), c > p["ts"]))
            assert r["nearest_click_ts"] == best.strftime(fmt)
            assert r["matched_backward"] == (best <= p["ts"])
