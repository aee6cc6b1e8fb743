"""Skew-mitigation operators: salted aggregation and salted joins.

AQE's skew-join splitting (on by default in the session factory)
handles most runtime skew; these explicit operators cover the cases
AQE cannot: a single hot GROUP BY key whose partial aggregate still
overwhelms one reducer, and broadcast-incompatible joins against a
skewed fact side where the dimension can be replicated instead.

Both are pure plan constructions (no UDFs, no extra actions):

- ``salted_agg``: two-stage aggregation. Stage 1 groups on
  (key, salt) — the hot key's rows spread over S reducers; stage 2
  merges the S partials per key. Works for any algebraic aggregate
  (sum/count/min/max and combinations like avg = sum/count).
- ``salted_join``: explode the build side S× (one copy per salt),
  salt the probe side randomly, equi-join on (key, salt). Each hot
  key's probe rows spread over S tasks at the cost of an S× build
  replication — the classic replicated/fragment join.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_SALTS = 16


def with_salt(df: DataFrame, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Add a uniform `_salt` column in [0, n_salts). Deterministic per
    row content is NOT required — salting only affects placement."""
    return df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    n_salts: int = DEFAULT_SALTS,
    merges: dict[str, Callable[[str], Column]] | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column name → a SUM/COUNT/MIN/MAX aggregate
    over input columns — the decomposable aggregates whose partials
    merge with a known function (count/sum partials merge by SUM,
    min by MIN, max by MAX):

        salted_agg(df, "k", {"n": F.count("*"), "total": F.sum("v")})

    Any other aggregate (avg, first, countDistinct, ...) does NOT
    merge correctly from per-salt partials and is rejected with
    ``ValueError`` — compose them from supported pieces instead
    (avg = sum/count) or pass ``merges`` mapping output name →
    explicit merge builder (e.g. ``{"total": F.sum}``).
    """
    partial = with_salt(df, n_salts).groupBy(key, "_salt").agg(
        *[a.alias(name) for name, a in aggs.items()]
    )
    merged = []
    for name, a in aggs.items():
        if merges is not None and name in merges:
            merged.append(merges[name](name).alias(name))
            continue
        # Column<'min(v) AS alias'> → leading function name
        expr = str(a).split("'", 1)[-1].lower()
        fn_name = expr.split("(", 1)[0].strip()
        if fn_name in {"min"}:
            merged.append(F.min(name).alias(name))
        elif fn_name in {"max"}:
            merged.append(F.max(name).alias(name))
        elif fn_name in {"sum", "count"}:
            merged.append(F.sum(name).alias(name))
        else:
            raise ValueError(
                f"salted_agg: aggregate {str(a)!r} for output {name!r} has no "
                "known partial-merge function (supported: sum, count, min, "
                "max). Compose it from supported aggregates (avg = sum/count) "
                "or pass merges={name: merge_builder}."
            )
    return partial.groupBy(key).agg(*merged)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Replicated-dimension skew join on ``key``.

    The (small) ``dim`` side is exploded n_salts×; the (skewed)
    ``fact`` side gets a random salt; the join key becomes
    (key, _salt) so one hot key spreads across n_salts reducers.
    Row multiplicity is unchanged: every fact row matches exactly the
    one dim replica carrying its salt."""
    salted_fact = with_salt(fact, n_salts)
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_fact.join(replicated_dim, on=[key, "_salt"], how=how)
    return out.drop("_salt")
