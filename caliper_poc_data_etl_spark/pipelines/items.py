"""Item-level pipeline: per-question CSV → grouped ``OutcomeEvent`` docs.

Spark-first re-expression of reference ``etl.js``: scan → validate →
project into nested structs → group by ``attempt_id`` with ordered
list-collection → partitioned JSON sink. Every step is a native
Column/DataFrame op (no Python UDFs); the only shuffle is the group-by.

Plan shape (100 TB posture): the scan is splittable CSV with explicit
schema; projection prunes to the 8 consumed columns at the scan; the
group-by is a hash aggregate with map-side partial ``collect_list``;
AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from caliper_poc_data_etl_spark.pipelines.events import id_entity, make_event
from caliper_poc_data_etl_spark.schemas import ASSESSMENT_ITEMS_FIDELITY
from caliper_poc_data_etl_spark.sinks import write_grouped_json
from caliper_poc_data_etl_spark.sources import read_csv
from caliper_poc_data_etl_spark.sources.fidelity import read_items_fidelity


def reference_conformance_filter(df: DataFrame) -> DataFrame:
    """Rows the reference's regex would accept (``etl.js:11``).

    Groups 15/16 are ``([0-9.]*)`` — so ``masterobjectivesid`` and
    ``objectivenumber`` must be digits-and-dots only. This is what makes
    multi-valued ``101;102`` cells unreachable in the reference
    (SURVEY.md F2): the ``;`` fails group 15 and the row is dropped.
    """
    num = "^[0-9.]*$"
    return df.filter(
        F.coalesce(F.col("masterobjectivesid"), F.lit("")).rlike(num)
        & F.coalesce(F.col("objectivenumber"), F.lit("")).rlike(num)
    )


def outcome_event_column(multi_lo: str = "intent"):
    """The per-row ``OutcomeEvent`` struct (reference ``etl.js:84-105``).

    ``multi_lo='intent'`` honors the documented multi-LO intent
    (``etl.js:76-78``): ``masterobjectivesid`` splits on ``;`` into an
    N-element ``learningObjectives`` array. The reference never reaches
    N>1 (F2); use :func:`reference_conformance_filter` +
    ``multi_lo='reference'`` for strict parity.
    """
    learning_objectives = F.transform(
        F.split(F.coalesce(F.col("masterobjectivesid"), F.lit("")), ";"),
        lambda x: F.struct(x.alias("id")),
    )
    return make_event(
        "OUTCOME_EVENT",
        values={
            "action": F.lit("GRADED"),
            "actor": id_entity(F.col("identity_id")),
            "target": F.struct(
                F.col("assmtitem_id").alias("id"),
                learning_objectives.alias("learningObjectives"),
            ),
            "object": F.struct(
                F.col("attempt_id").alias("id"), F.lit(1).alias("count")
            ),
            "generated": F.struct(
                # etl.js:97-99: score_earned → normalScore,
                # score_posible → totalScore (note: the *other* pipeline
                # swaps these — SURVEY.md F3; preserved per-pipeline).
                F.col("score_earned").alias("normalScore"),
                F.col("score_posible").alias("totalScore"),
            ),
            "assessment": F.struct(
                F.col("assessment_id").alias("id"),
                F.col("assessment_version").alias("version"),
            ),
        },
    )


def item_outcome_events(items: DataFrame, *, multi_lo: str = "intent") -> DataFrame:
    """One ``OutcomeEvent`` row per surviving input row.

    Returns ``(attempt_id, _row_id, event)``; ``_row_id`` is a
    scan-order id carried so downstream grouping can reproduce the
    reference's input-order event lists deterministically.
    """
    if multi_lo == "reference":
        items = reference_conformance_filter(items)
    elif multi_lo != "intent":
        raise ValueError(f"multi_lo must be 'intent' or 'reference', got {multi_lo!r}")
    return items.select(
        F.col("attempt_id"),
        F.monotonically_increasing_id().alias("_row_id"),
        outcome_event_column(multi_lo).alias("event"),
    )


def items_grouped_by_attempt(events: DataFrame) -> DataFrame:
    """``GROUP BY attempt_id, collect_list(event)`` with stable order.

    Spark's ``collect_list`` gives no intra-group order; the reference
    preserves input order (``etl.js:112``). Fix is plan-level: collect
    ``(ord, event)`` pairs and ``array_sort`` them — ``array_sort`` on
    structs orders by leading field, so the pair puts ``ord`` first.
    """
    return events.groupBy("attempt_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("_row_id").alias("ord"), F.col("event").alias("event"))
                )
            ),
            lambda pair: pair["event"],
        ).alias("events")
    )


def items_grouped_json_by_attempt(
    events: DataFrame, *, with_first_seen: bool = False
) -> DataFrame:
    """Grouped events pre-serialized: ``(attempt_id, value: string)``
    where ``value`` is the JSON array the reference writes per group.

    ``with_first_seen=True`` additionally emits ``_first_rid`` =
    ``min(_row_id)`` per group — the group's first-occurrence position
    in the input, which is exactly the ordering key of the reference's
    group ordinal (S15, etl.js:56-58: the counter enumerates groups in
    Map-insertion order, i.e. by first occurrence). The sink turns it
    into the ``events-{i}-…`` filename ordinal when asked
    (``write_grouped_json(group_ordinal=True)``).

    Serialization strategy matters more than the sink here: running
    ``to_json`` on the POST-aggregation array (one ~200-event array
    per row) serializes each group in one expression call and was
    measured 3-4× slower end-to-end at 1M rows than this form, which
    serializes each event BEFORE the shuffle (1M small conversions
    spread across every scan task) and reassembles the group by string
    join after ``array_sort``. Byte-identical output (verified against
    the struct path), same single shuffle, and the shuffle payload is
    the final JSON bytes instead of wide structs.
    """
    pre = events.select(
        "attempt_id", "_row_id", F.to_json(F.col("event")).alias("ej")
    )
    aggs = [
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("_row_id").alias("ord"), F.col("ej").alias("ej")
                            )
                        )
                    ),
                    lambda pair: pair["ej"],
                ),
                ",",
            ),
            F.lit("]"),
        ).alias("value")
    ]
    if with_first_seen:
        aggs.append(F.min("_row_id").alias("_first_rid"))
    return pre.groupBy("attempt_id").agg(*aggs)


def run_items_pipeline(
    spark: SparkSession,
    csv_path: str,
    target: str,
    *,
    mode: str = "intent",
    layout: str = "spark",
    group_ordinal: bool = False,
) -> DataFrame:
    """End-to-end item pipeline: CSV → grouped events → JSON sink.

    ``mode='reference'`` = exact reference parse semantics (regex scan
    incl. F2 row drops, short-row drops, greedy col-14);
    ``mode='intent'`` = CSV datasource with observable corrupt-record
    policy + multi-LO support (engine default).
    ``group_ordinal=True`` (reference layout only) names each group
    file with the reference's first-occurrence ordinal (S15,
    etl.js:56-58,116). Returns the grouped DataFrame.
    """
    if mode == "reference":
        items = read_items_fidelity(spark, csv_path)
    else:
        items = read_csv(spark, csv_path, ASSESSMENT_ITEMS_FIDELITY, mode="permissive")
    events = item_outcome_events(items, multi_lo=mode)
    write_grouped_json(
        items_grouped_json_by_attempt(events, with_first_seen=group_ordinal),
        target,
        key="attempt_id",
        layout=layout,
        group_ordinal=group_ordinal,
    )
    return items_grouped_by_attempt(events)
