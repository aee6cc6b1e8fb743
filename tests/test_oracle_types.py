"""Registry-wide oracle TYPE audit — kills the r08 HUGEINT class.

The grading driver's value hash is TYPE-sensitive: a DuckDB oracle whose
result schema leaks INT128 (HUGEINT/UHUGEINT, DuckDB's automatic SUM
widening) or DECIMAL diverges from the Spark answer even when every
value matches numerically. r08 shipped two red rows exactly this way
(`ts_period_over_period`, `ts_anomaly_seasonal_adjusted`): both oracles
returned `SUM(CAST(... AS BIGINT))`-derived columns without re-casting
the outer SELECT, DuckDB widened to HUGEINT, and all three committed
sweeps stayed green because `tools/check_oracle._norm` compared
numerically (VERDICT r8 §What's-wrong). This test makes the class
structurally dead: it BINDS every registered oracle (no execution —
``duckdb.sql(q).types`` resolves the output schema only) and asserts no
banned type family appears anywhere in the result, nested types
included. A regression fixture re-creates the exact r08 bug shape (the
pre-fix `cur AS cur_centi` outer select) and asserts the detector
flags it.
"""

from __future__ import annotations

import duckdb
import pytest

from caliper_poc_data_etl_spark.queries import QUERIES
from caliper_poc_data_etl_spark.sources.readers import TABLE_NAMES
from tools.check_oracle import _banned_oracle_types


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


ORACLES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLES)
def test_oracle_emits_no_int128_or_decimal(name, duck):
    rel = duck.sql(QUERIES[name].oracle)
    bad = _banned_oracle_types(rel.types, rel.columns)
    assert not bad, (
        f"oracle for {name} leaks driver-hash-incompatible DuckDB types "
        f"{bad}; re-cast with CAST(... AS BIGINT) / ROUND(...)::DOUBLE "
        f"in the outer SELECT (registry header rule, queries/__init__.py)"
    )


def test_detector_catches_the_r08_bug_shape(duck):
    # The exact pre-fix ts_period_over_period shape: SUM(BIGINT) widens
    # to HUGEINT and the un-recast outer select leaks it. Reverting the
    # r9 fix reproduces this; the detector must flag all three columns.
    buggy = """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cur
      FROM orders GROUP BY 1
    )
    SELECT cur AS cur_centi, cur - cur AS delta_centi FROM daily
    """
    rel = duck.sql(buggy)
    bad = _banned_oracle_types(rel.types, rel.columns)
    assert [c for c, _ in bad] == ["cur_centi", "delta_centi"]
    assert all("HUGEINT" in t.upper() for _, t in bad)

    fixed = """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cur
      FROM orders GROUP BY 1
    )
    SELECT CAST(cur AS BIGINT) AS cur_centi,
           CAST(cur - cur AS BIGINT) AS delta_centi FROM daily
    """
    assert _banned_oracle_types(duck.sql(fixed).types, duck.sql(fixed).columns) == []


def test_detector_sees_nested_leaks():
    con = duckdb.connect()
    rel = con.sql("SELECT [SUM(x)] AS xs FROM (VALUES (1::BIGINT)) t(x)")
    bad = _banned_oracle_types(rel.types, rel.columns)
    assert bad and bad[0][0] == "xs"
