"""Property-based invariants (SURVEY.md §5.2.4).

Random rows per the FIXTURES schemas drive the pipeline invariants the
reference provably violates at scale (F5: silent write loss) or
enforces implicitly (fan-out arity, group-size conservation, S5
empty-field drop). Hypothesis generates the row sets; Spark jobs are
kept small by bounding example counts.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from caliper_poc_data_etl_spark.pipelines.assessments import (
    assessment_attempt_events,
)
from caliper_poc_data_etl_spark.pipelines.items import (
    item_outcome_events,
    items_grouped_by_attempt,
    reference_conformance_filter,
)
from caliper_poc_data_etl_spark.schemas import (
    ASSESSMENT_ITEMS_FIDELITY,
    ASSESSMENTS_FIDELITY,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_ident = st.text(alphabet="abcdefghij-", min_size=1, max_size=8)
_num = st.integers(min_value=0, max_value=100).map(str)
_lo_cell = st.lists(
    st.integers(min_value=100, max_value=109).map(str), min_size=1, max_size=3
).map(";".join)


def _item_row(ident, attempt, lo):
    return (
        ident, "login", "sch", "asmt", "1.0", attempt, "item", "1", "5",
        "TYPE", "30", "10", "8", "objectives text", lo, "1.1",
    )


_item_rows = st.lists(
    st.builds(_item_row, _ident, st.sampled_from(["a1", "a2", "a3"]), _lo_cell),
    min_size=1,
    max_size=25,
)


@given(rows=_item_rows)
@settings(**_SETTINGS)
def test_item_group_sizes_conserve_rows(spark, rows):
    """Σ group sizes == surviving rows; every attempt_id keeps exactly
    its rows (the reference's Map grouping, etl.js:107-112, minus its
    fd-exhaustion loss F5)."""
    df = spark.createDataFrame(rows, ASSESSMENT_ITEMS_FIDELITY)
    events = item_outcome_events(df, multi_lo="intent")
    grouped = items_grouped_by_attempt(events).collect()
    sizes = {r["attempt_id"]: len(r["events"]) for r in grouped}
    expected: dict[str, int] = {}
    for row in rows:
        expected[row[5]] = expected.get(row[5], 0) + 1
    assert sizes == expected


@given(rows=_item_rows)
@settings(**_SETTINGS)
def test_reference_mode_drops_exactly_multivalue_rows(spark, rows):
    """F2: reference regex semantics drop precisely the rows whose
    masterobjectivesid contains ';' (group 15 is [0-9.]* — etl.js:11)."""
    df = spark.createDataFrame(rows, ASSESSMENT_ITEMS_FIDELITY)
    surviving = reference_conformance_filter(df).count()
    expected = sum(1 for row in rows if ";" not in row[14])
    assert surviving == expected


@given(rows=_item_rows)
@settings(**_SETTINGS)
def test_learning_objectives_honor_multivalue_intent(spark, rows):
    """Engine default: N-element learningObjectives for ';'-lists
    (the documented intent at etl.js:76-78 the reference can't reach)."""
    df = spark.createDataFrame(rows, ASSESSMENT_ITEMS_FIDELITY)
    got = item_outcome_events(df, multi_lo="intent").select("event").collect()
    los = sorted(
        tuple(lo["id"] for lo in r["event"]["values"]["target"]["learningObjectives"])
        for r in got
    )
    expected = sorted(tuple(row[14].split(";")) for row in rows)
    assert los == expected


_maybe_empty = st.one_of(st.just(""), _ident)


def _assessment_row(ident, attempt, maybe_empty_school):
    return (
        ident, "login", maybe_empty_school, "asmt", "1.0", "2016-01-15",
        "5", "QUIZ", attempt, "2", "true", "70", "100",
    )


_assessment_rows = st.lists(
    st.builds(_assessment_row, _ident, _ident, _maybe_empty),
    min_size=1,
    max_size=25,
)


@given(rows=_assessment_rows)
@settings(**_SETTINGS)
def test_fanout_is_exactly_three_per_surviving_row(spark, rows):
    """S16: events == 3 × surviving rows; S5: any empty field drops the
    whole row (the (.+)×13 regex, etl-assessment-level.js:18)."""
    df = spark.createDataFrame(rows, ASSESSMENTS_FIDELITY)
    # CSV empty fields arrive as NULL; emulate by nulling empties.
    from pyspark.sql import functions as F

    df = df.select(
        *[F.when(F.col(c) == "", None).otherwise(F.col(c)).alias(c) for c in df.columns]
    )
    surviving = sum(1 for row in rows if all(v != "" for v in row))
    fanned = assessment_attempt_events(df, exploded=True)
    assert fanned.count() == 3 * surviving
    per_row = assessment_attempt_events(df)
    assert per_row.count() == surviving
    assert per_row.filter(F.size("events") != 3).count() == 0


@given(rows=_assessment_rows, limit=st.integers(min_value=0, max_value=30))
@settings(**_SETTINGS)
def test_limit_applies_before_validation_like_reference(spark, rows, limit):
    """S7: the limit caps RAW rows first; validation drops happen
    inside the limited prefix (etl-assessment-level.js:42-52) — so the
    result is the surviving subset of the first `limit` rows."""
    df = spark.createDataFrame(rows, ASSESSMENTS_FIDELITY).coalesce(1)
    from pyspark.sql import functions as F

    df = df.select(
        *[F.when(F.col(c) == "", None).otherwise(F.col(c)).alias(c) for c in df.columns]
    )
    expected = sum(1 for row in rows[:limit] if all(v != "" for v in row))
    got = assessment_attempt_events(df, limit=limit).count()
    assert got == expected


# ---------------------------------------------------------------- training ops


def _py_pack(docs, shards, budget):
    """Straight-Python reference for pack_sequences semantics."""
    out = {}
    by_shard = {}
    for doc_id, n_tokens in sorted(docs):
        by_shard.setdefault(doc_id % shards, []).append((doc_id, n_tokens))
    for shard, rows in by_shard.items():
        cum = 0
        for doc_id, n_tokens in rows:
            out[doc_id] = (shard, cum // budget, cum % budget)
            cum += n_tokens
    return out


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.text(alphabet="ab ", min_size=1, max_size=40),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
@settings(**_SETTINGS)
def test_pack_sequences_matches_python_reference(spark, rows):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from caliper_poc_data_etl_spark.queries.training import (
        PACK_BUDGET,
        PACK_SHARDS,
    )

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sized = df.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    got = {
        r["doc_id"]: (r["shard"], r["seq_id"], r["seq_offset"])
        for r in sized.withColumn(
            "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .select(
            "doc_id",
            "shard",
            F.floor(F.col("cum_before") / PACK_BUDGET).alias("seq_id"),
            (F.col("cum_before") % PACK_BUDGET).alias("seq_offset"),
        )
        .collect()
    }
    toks = {
        r["doc_id"]: r["n_tokens"] for r in sized.select("doc_id", "n_tokens").collect()
    }
    want = _py_pack(
        [(d, toks[d]) for d, _ in rows], PACK_SHARDS, PACK_BUDGET
    )
    assert got == want


@given(st.text(alphabet="xyz .", min_size=1, max_size=600))
@settings(**_SETTINGS)
def test_chunking_matches_python_reference(spark, text):
    from pyspark.sql import functions as F

    from caliper_poc_data_etl_spark.queries.training import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )

    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    n_chunks = F.ceil(F.length("text") / F.lit(float(CHUNK_STRIDE))).cast("long")
    chunk = F.expr(f"substring(text, chunk_idx * {CHUNK_STRIDE} + 1, {CHUNK_SIZE})")
    got = [
        (r["chunk_idx"], r["chunk"])
        for r in df.filter(F.length("text") > 0)
        .select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_idx"
            ),
        )
        .select("chunk_idx", chunk.alias("chunk"))
        .collect()
    ]
    want = [
        (i, text[i * CHUNK_STRIDE : i * CHUNK_STRIDE + CHUNK_SIZE])
        for i in range((len(text) + CHUNK_STRIDE - 1) // CHUNK_STRIDE)
    ]
    assert sorted(got) == want


# --------------------------------------------------------------- round-5 ops


@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False).map(
            lambda x: round(x, 2)
        ),
        min_size=1,
        max_size=80,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_ewma_closed_form_matches_sequential_fold(spark, vals):
    """The closed-form weighted-sum EWMA (ts_ewma_smoothing) must equal
    the recursive fold s_i = x_i/2 + s_{i-1}/2 over the kept tail for
    ANY value sequence."""
    import datetime as dt
    import tempfile

    from caliper_poc_data_etl_spark.queries import QUERIES

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    d = tempfile.mkdtemp(prefix="ewma_prop_")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = QUERIES["ts_ewma_smoothing"].spark(spark, d).collect()
    assert len(out) == 1
    kept = vals[-32:]
    s = kept[0]
    for x in kept[1:]:
        s = 0.5 * x + 0.5 * s
    assert out[0]["n_terms"] == len(kept)
    assert abs(out[0]["ewma"] - s) < 1e-4


@given(
    keys=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=300)
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_countmin_never_undercounts_any_distribution(spark, keys):
    """CMS est ≥ true must hold for EVERY key under arbitrary key
    skew (the one-sided error guarantee is distribution-free)."""
    import datetime as dt
    import tempfile
    from collections import Counter

    from caliper_poc_data_etl_spark.queries import QUERIES

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i), k, "click", 1.0, "{}")
        for i, k in enumerate(keys)
    ]
    d = tempfile.mkdtemp(prefix="cms_prop_")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = QUERIES["agg_countmin_heavy_hitters"].spark(spark, d).collect()
    truth = Counter(keys)
    for r in out:
        assert r["est_count"] >= truth[r["user_id"]]


@given(
    vals=st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False).map(
            lambda x: round(x, 2)
        ),
        min_size=5,
        max_size=60,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_moments_pack_matches_numpy_any_distribution(spark, vals):
    import datetime as dt
    import tempfile

    import numpy as np

    from caliper_poc_data_etl_spark.queries import QUERIES

    a = np.asarray(vals)
    if a.std() < 1e-3:
        return  # degenerate: skew/kurt undefined-ish; bounds tested elsewhere
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    d = tempfile.mkdtemp(prefix="mom_prop_")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = QUERIES["agg_moments_pack"].spark(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    m2 = ((a - a.mean()) ** 2).mean()
    m3 = ((a - a.mean()) ** 3).mean()
    m4 = ((a - a.mean()) ** 4).mean()
    assert abs(r["mean"] - a.mean()) < 1e-4
    assert abs(r["std_pop"] - a.std()) < 1e-4
    assert abs(r["skew_pop"] - m3 / m2**1.5) < 1e-3
    assert abs(r["kurt_excess"] - (m4 / m2**2 - 3)) < 1e-3
