"""Differential oracle tests — the engine's primary test strategy
(SURVEY.md §5.2.1): every declared query vs its DuckDB twin.

Runs the full registry at sf0.001 (fast); the driver runs the same
comparison at sf0.01. `tools/check_oracle.py` is the shared harness.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from caliper_poc_data_etl_spark.queries import QUERIES
from caliper_poc_data_etl_spark.sources.readers import TABLE_NAMES
from tools.check_oracle import _canon


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def test_registry_shape():
    assert len(QUERIES) >= 50
    with_oracle = [q for q in QUERIES.values() if q.oracle is not None]
    # Non-SQL-expressible ops (engine-specific hashing / estimates /
    # timing-dependent survivors) are the only rows-only entries;
    # everything else must carry an oracle.
    rows_only = {q.name for q in QUERIES.values() if q.oracle is None}
    assert rows_only <= {
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding_lsh",
        "sim_ann_lsh",
        "sim_ivf_topk",
        "agg_approx_distinct",
        "stream_dedup_within_watermark",
        "mm_pixel_features",
    }
    assert len(with_oracle) >= 50


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = QUERIES[name]
    sdf = q.spark(spark, sf_dir)
    # The grading driver canonicalizes via pandas sort_values, which
    # cannot hash list/dict cells — graded outputs must be scalar-only
    # (r3: dedup_minhash_md5_parity and inverted_index_postings erred
    # on array columns). Serialize arrays with array_join/concat_ws.
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: non-scalar output columns {complex_cols} would crash "
        "the grading driver's canonicalizer"
    )
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        assert srows is not None  # executes without error
        return
    res = duck.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    assert _canon(srows, sdf.columns) == _canon(drows, dcols), f"{name}: values differ"


class TestApproximateOperators:
    """Rows-only ops get quantitative checks against their exact twins."""

    def test_minhash_lsh_recall(self, spark, oracle_sf_dir):
        exact = {
            (r["doc_a"], r["doc_b"])
            for r in QUERIES["dedup_ngram_jaccard"].spark(spark, oracle_sf_dir).collect()
        }
        approx = {
            (r["doc_a"], r["doc_b"])
            for r in QUERIES["dedup_minhash_lsh"].spark(spark, oracle_sf_dir).collect()
        }
        assert exact, "expected planted near-duplicates in testdata"
        recall = len(exact & approx) / len(exact)
        # At Jaccard>=0.8 with 32 bands of r=2, P(miss) < 1e-8 per pair.
        assert recall == 1.0, f"minhash recall {recall}"
        # No false positives: LSH output verifies candidates exactly.
        assert approx <= exact

    def test_simhash_finds_near_duplicates(self, spark, oracle_sf_dir):
        exact = {
            (r["doc_a"], r["doc_b"])
            for r in QUERIES["dedup_ngram_jaccard"].spark(spark, oracle_sf_dir).collect()
        }
        sim = {
            (r["doc_a"], r["doc_b"])
            for r in QUERIES["dedup_simhash"].spark(spark, oracle_sf_dir).collect()
        }
        # SimHash (hamming<=3 of 64) is a different similarity notion;
        # it must still recover a majority of ~0.99-Jaccard clones.
        recall = len(exact & sim) / len(exact)
        assert recall >= 0.5, f"simhash recall {recall} over {len(exact)} pairs"

    def test_ann_lsh_agrees_with_exact_scores(self, spark, oracle_sf_dir):
        exact_rows = QUERIES["sim_cosine_topk"].spark(spark, oracle_sf_dir).collect()
        exact_top = {}
        exact_cos = {}
        for r in exact_rows:
            exact_top.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            exact_cos[(r["query_id"], r["neighbor_id"])] = r["cosine"]
        ann_rows = QUERIES["sim_ann_lsh"].spark(spark, oracle_sf_dir).collect()
        assert ann_rows, "ANN returned nothing"
        # Scoring path must agree exactly where pairs overlap.
        for r in ann_rows:
            key = (r["query_id"], r["neighbor_id"])
            if key in exact_cos:
                assert abs(r["cosine"] - exact_cos[key]) < 1e-9
        hits = sum(
            1
            for r in ann_rows
            if r["neighbor_id"] in exact_top.get(r["query_id"], set())
        )
        recall = hits / sum(len(v) for v in exact_top.values())
        # Bucketed ANN on near-orthogonal synthetic vectors: modest
        # recall expected; this guards the plumbing, not the ceiling.
        assert recall >= 0.1, f"ANN recall {recall}"

    def test_embedding_lsh_subset_of_exact(self, spark, oracle_sf_dir):
        exact = {
            (r["vec_a"], r["vec_b"]): r["cosine"]
            for r in QUERIES["dedup_embedding_cosine"].spark(spark, oracle_sf_dir).collect()
        }
        lsh = {
            (r["vec_a"], r["vec_b"]): r["cosine"]
            for r in QUERIES["dedup_embedding_lsh"].spark(spark, oracle_sf_dir).collect()
        }
        # Candidates are verified with exact cosine → no false positives,
        # and scores must agree exactly on the overlap.
        assert set(lsh) <= set(exact)
        for k, v in lsh.items():
            assert abs(v - exact[k]) < 1e-9
        if exact:
            recall = len(lsh) / len(exact)
            # 8-hyperplane buckets + 1-bit multi-probe on synthetic
            # vectors: plumbing guard, not a ceiling claim.
            assert recall >= 0.1, f"embedding LSH recall {recall}"

    def test_ivf_topk_agrees_with_exact_scores(self, spark, oracle_sf_dir):
        exact_rows = QUERIES["sim_cosine_topk"].spark(spark, oracle_sf_dir).collect()
        exact_top = {}
        exact_cos = {}
        for r in exact_rows:
            exact_top.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            exact_cos[(r["query_id"], r["neighbor_id"])] = r["cosine"]
        ivf_rows = QUERIES["sim_ivf_topk"].spark(spark, oracle_sf_dir).collect()
        assert ivf_rows, "IVF returned nothing"
        for r in ivf_rows:
            key = (r["query_id"], r["neighbor_id"])
            if key in exact_cos:
                assert abs(r["cosine"] - exact_cos[key]) < 1e-9
        hits = sum(
            1
            for r in ivf_rows
            if r["neighbor_id"] in exact_top.get(r["query_id"], set())
        )
        recall = hits / sum(len(v) for v in exact_top.values())
        # probing 4/16 cells of near-orthogonal vectors — plumbing guard.
        assert recall >= 0.1, f"IVF recall {recall}"

    def test_approx_percentile_error(self, spark, oracle_sf_dir):
        """approx_percentile (t-digest, the 100 TB path) stays within
        1% relative error of the exact interpolated percentile."""
        li = spark.read.parquet(f"{oracle_sf_dir}/lineitem.parquet")
        rows = li.groupBy("l_returnflag").agg(
            F.percentile("l_extendedprice", 0.5).alias("exact"),
            F.approx_percentile("l_extendedprice", 0.5, 10000).alias("approx"),
        ).collect()
        assert rows
        for r in rows:
            assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.01

    def test_approx_count_distinct_error(self, spark, oracle_sf_dir):
        approx = {
            r["l_returnflag"]: (r["approx_parts"], r["approx_orders"])
            for r in QUERIES["agg_approx_distinct"].spark(spark, oracle_sf_dir).collect()
        }
        exact_df = (
            spark.read.parquet(f"{oracle_sf_dir}/lineitem.parquet")
            .groupBy("l_returnflag")
            .agg(
                F.countDistinct("l_partkey").alias("parts"),
                F.countDistinct("l_orderkey").alias("orders"),
            )
        )
        for r in exact_df.collect():
            ap, ao = approx[r["l_returnflag"]]
            # Default HLL++ rsd is 5%; allow 3 sigma.
            assert abs(ap - r["parts"]) / r["parts"] < 0.15
            assert abs(ao - r["orders"]) / r["orders"] < 0.15
