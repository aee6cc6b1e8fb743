"""Caliper pipeline analogs over the driver tables (SURVEY.md §2A).

The reference's two pipelines map onto the TPC-H-ish tables per
FIXTURES.md §6: ``lineitem`` ↔ assessment_items (l_orderkey = attempt
group key), ``orders`` ↔ assessments. These queries exercise the exact
plan shapes of the parity surface — projection/rename (S8), nested
structs (S9), literals (S10), split-to-array (S11), cast (S12),
group-by + ordered collect_list (S14), 1→N fan-out (S16) — against a
SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from caliper_poc_data_etl_spark.pipelines.events import id_entity, make_event
from caliper_poc_data_etl_spark.queries.registry import query, t


@query(
    "caliper_eventize_flat",
    oracle="""
    SELECT 'OutcomeEvent'                  AS type,
           'GRADED'                        AS action,
           CAST(l_suppkey AS VARCHAR)      AS actor_id,
           CAST(l_partkey AS VARCHAR)      AS target_id,
           CAST(l_orderkey AS VARCHAR)     AS object_id,
           1                               AS object_count,
           CAST(l_quantity AS VARCHAR)     AS normal_score,
           CAST(l_extendedprice AS VARCHAR) AS total_score,
           CAST(l_linenumber AS INT)       AS item_seq
    FROM lineitem
    WHERE l_orderkey % 101 = 0
    """,
)
def caliper_eventize_flat(spark, sf_dir):
    """S8-S13 flattened: project/rename/literal/cast into event fields.

    Graded on a keyed deterministic sample (l_orderkey % 101, both
    engines — VERDICT r11 #7): per-row projection parity has the same
    power on the sample, without the 600k-row echo whose comparison
    dominated the sweep entry. The projection itself is scan-shaped at
    any corpus size; the filter is a pushed-down predicate."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    return li.select(
        F.lit("OutcomeEvent").alias("type"),
        F.lit("GRADED").alias("action"),
        F.col("l_suppkey").cast("string").alias("actor_id"),
        F.col("l_partkey").cast("string").alias("target_id"),
        F.col("l_orderkey").cast("string").alias("object_id"),
        F.lit(1).alias("object_count"),
        F.col("l_quantity").cast("string").alias("normal_score"),
        F.col("l_extendedprice").cast("string").alias("total_score"),
        F.col("l_linenumber").cast("int").alias("item_seq"),
    )


@query(
    "caliper_group_events",
    oracle="""
    SELECT CAST(l_orderkey AS VARCHAR) AS attempt_id,
           COUNT(*) AS n_events,
           string_agg(CAST(l_partkey AS VARCHAR), ','
                      ORDER BY l_linenumber, l_partkey) AS item_ids,
           ROUND(SUM(l_quantity), 2) AS score_total
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def caliper_group_events(spark, sf_dir):
    """S14: group-by attempt + ordered list collection (the item
    pipeline's only shuffle), ordered by explicit sequence not input
    luck."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_orderkey").cast("string").alias("attempt_id")).agg(
        F.count("*").alias("n_events"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("l_linenumber", "l_partkey"))
                ),
                lambda s: s["l_partkey"].cast("string"),
            ),
        ).alias("item_ids"),
        F.round(F.sum("l_quantity"), 2).alias("score_total"),
    )


@query(
    "caliper_fanout",
    oracle="""
    SELECT CAST(o.o_orderkey AS VARCHAR) AS attempt_id,
           v.seq                         AS seq,
           v.action                      AS action,
           v.event_type                  AS event_type,
           CAST(o.o_custkey AS VARCHAR)  AS actor_id
    FROM orders o
    CROSS JOIN (VALUES (1, 'STARTED',   'AssessmentEvent'),
                       (2, 'SUBMITTED', 'AssessmentEvent'),
                       (3, 'GRADED',    'AssessmentOutcomeEvent'))
         AS v(seq, action, event_type)
    """,
)
def caliper_fanout(spark, sf_dir):
    """S16: 1→3 row fan-out via posexplode of a literal event array —
    narrow (no shuffle), exactly the attempt pipeline's shape."""
    o = t(spark, sf_dir, "orders")
    fan = F.array(
        F.struct(F.lit("STARTED").alias("action"), F.lit("AssessmentEvent").alias("event_type")),
        F.struct(F.lit("SUBMITTED").alias("action"), F.lit("AssessmentEvent").alias("event_type")),
        F.struct(F.lit("GRADED").alias("action"), F.lit("AssessmentOutcomeEvent").alias("event_type")),
    )
    return o.select(
        F.col("o_orderkey").cast("string").alias("attempt_id"),
        F.col("o_custkey").cast("string").alias("actor_id"),
        F.posexplode(fan).alias("pos", "ev"),
    ).select(
        "attempt_id",
        (F.col("pos") + 1).cast("int").alias("seq"),
        F.col("ev.action").alias("action"),
        F.col("ev.event_type").alias("event_type"),
        "actor_id",
    )


@query(
    "caliper_split_multivalue",
    oracle="""
    SELECT p_partkey,
           len(string_split(p_name, ' ')) AS n_objectives,
           string_split(p_name, ' ')[1]   AS first_objective
    FROM part
    """,
)
def caliper_split_multivalue(spark, sf_dir):
    """S11: ;-separated multi-value cell → array (split + element ops)."""
    p = t(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(toks).alias("n_objectives"),
        F.element_at(toks, 1).alias("first_objective"),
    )


def outcome_events_nested(spark, sf_dir):
    """The flagship nested query (driver ``entry()``): lineitem rows →
    real nested OutcomeEvent structs (superset schema) → grouped per
    order with deterministic intra-group order. Exercises the full
    item-pipeline plan: scan → project → nested struct → shuffle →
    ordered list-agg.
    """
    li = t(spark, sf_dir, "lineitem")
    event = make_event(
        "OUTCOME_EVENT",
        values={
            "action": F.lit("GRADED"),
            "actor": id_entity(F.col("l_suppkey")),
            "target": F.struct(
                F.col("l_partkey").cast("string").alias("id"),
                F.array(
                    F.struct(F.col("l_partkey").cast("string").alias("id"))
                ).alias("learningObjectives"),
            ),
            "object": F.struct(
                F.col("l_orderkey").cast("string").alias("id"),
                F.lit(1).alias("count"),
            ),
            "generated": F.struct(
                F.col("l_quantity").cast("string").alias("normalScore"),
                F.col("l_extendedprice").cast("string").alias("totalScore"),
            ),
            "assessment": F.struct(
                F.col("l_orderkey").cast("string").alias("id"),
                F.lit("1.0").alias("version"),
            ),
        },
    )
    return (
        li.select(
            F.col("l_orderkey").alias("attempt_key"),
            F.col("l_linenumber").alias("seq"),
            event.alias("event"),
        )
        .groupBy("attempt_key")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("seq"), F.col("event")))
                ),
                lambda pair: pair["event"],
            ).alias("events")
        )
        .select(
            F.col("attempt_key").cast("string").alias("attempt_id"),
            F.size("events").alias("n_events"),
            "events",
        )
    )
