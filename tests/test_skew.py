"""Salted aggregation / join equivalence on a skewed key distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from caliper_poc_data_etl_spark.skew import salted_agg, salted_join, with_salt


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows land on key 0 — the hot-key shape AQE sees at scale.
    return (
        spark.range(20_000)
        .select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
    )


def test_salt_is_bounded(spark, skewed):
    n = 8
    salts = with_salt(skewed, n).select("_salt").distinct().collect()
    got = {r["_salt"] for r in salts}
    assert got <= set(range(n))
    assert len(got) > 1  # actually spreads


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in skewed.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in salted_agg(
            skewed,
            "k",
            {
                "n": F.count("*"),
                "total": F.sum("v"),
                "lo": F.min("v"),
                "hi": F.max("v"),
            },
        ).collect()
    }
    assert set(plain) == set(salted)
    for k, (n, total, lo, hi) in plain.items():
        sn, st, sl, sh = salted[k]
        assert sn == n and sl == lo and sh == hi
        assert st == pytest.approx(total)


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [(0, "hot"), (10, "a"), (20, "b")], "k long, name string"
    )
    plain = (
        skewed.join(dim, "k")
        .groupBy("k", "name")
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("tv"))
    )
    salted = (
        salted_join(skewed, dim, "k")
        .groupBy("k", "name")
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("tv"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_agg_rejects_unmergeable_aggregates(spark, skewed):
    # avg partials cannot merge by sum/min/max — must error, not return
    # silently wrong results (ADVICE r1).
    with pytest.raises(ValueError, match="no .*partial-merge"):
        salted_agg(skewed, "k", {"m": F.avg("v")})
    with pytest.raises(ValueError, match="no .*partial-merge"):
        salted_agg(skewed, "k", {"f": F.first("v")})


def test_salted_agg_explicit_merges_override(spark, skewed):
    # min aliased through an expression the name-sniffer can't parse
    # still works when the caller supplies the merge builder.
    plain = {
        r["k"]: r["lo2"]
        for r in skewed.groupBy("k").agg((F.min("v") * 2).alias("lo2")).collect()
    }
    salted = {
        r["k"]: r["lo2"]
        for r in salted_agg(
            skewed, "k", {"lo2": (F.min("v") * 2)}, merges={"lo2": F.min}
        ).collect()
    }
    assert plain == salted
