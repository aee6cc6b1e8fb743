"""Shared event-struct construction against the superset schema.

The reference emits three envelope shapes into one output stream
(SURVEY.md F4); the engine unifies them under one nullable superset
``StructType`` (:data:`caliper_poc_data_etl_spark.schemas.EVENT_SCHEMA`)
so heterogeneous events can live in one column / array / sink. Absent
fields are typed NULLs, pruned at JSON write via ``ignoreNullFields``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from caliper_poc_data_etl_spark.schemas import EVENT_SCHEMA, EVENT_TYPES


def _null(dtype: T.DataType) -> Column:
    return F.lit(None).cast(dtype)


def _fill(struct_type: T.StructType, provided: dict[str, Column]) -> Column:
    """Build ``struct_type`` from ``provided`` columns, NULL-filling the rest.

    Every provided column is cast to the target field type so that all
    events share one exact Spark type (required for ``F.array`` of
    heterogeneous envelopes).
    """
    unknown = set(provided) - {f.name for f in struct_type.fields}
    if unknown:
        raise KeyError(f"fields not in event schema: {sorted(unknown)}")
    cols = []
    for field in struct_type.fields:
        col = provided.get(field.name)
        col = _null(field.dataType) if col is None else col.cast(field.dataType)
        cols.append(col.alias(field.name))
    return F.struct(*cols)


def make_event(
    event_type: str,
    values: dict[str, Column] | None = None,
    top: dict[str, Column] | None = None,
) -> Column:
    """Construct one event struct (superset schema).

    ``event_type`` is a key of the closed ``typeMap`` vocabulary
    (reference ``etl.js:127-141``); unknown types raise here rather
    than producing ``undefined`` silently.

    ``values`` populates the nested ``values`` struct; ``top``
    populates the top-level envelope-variant fields (``actor`` /
    ``object`` / ``generated`` as siblings of ``values`` — the
    ``AssessmentEvent`` shape, SURVEY.md F4).
    """
    if event_type not in EVENT_TYPES:
        raise KeyError(f"unknown event type {event_type!r}; known: {sorted(EVENT_TYPES)}")
    values_type = EVENT_SCHEMA["values"].dataType
    provided: dict[str, Column] = {
        "type": F.lit(EVENT_TYPES[event_type]),
        "values": _fill(values_type, values or {}),
    }
    for name, col in (top or {}).items():
        provided[name] = col
    return _fill(EVENT_SCHEMA, provided)


def id_entity(col: Column) -> Column:
    """``{id: <col>}`` single-field entity struct (reference getActor etc.)."""
    return F.struct(col.cast("string").alias("id"))
