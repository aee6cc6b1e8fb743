"""Input and output schemas for the Caliper event pipelines.

The reference encodes its input schemas only in code comments and
regex arity (reference ``etl.js:5-11``, ``etl-assessment-level.js:17-18``);
here they are explicit ``StructType``s. Two variants per table:

- *fidelity*: every column ``StringType`` — byte-level parity with the
  reference, which never types anything (SURVEY.md F6).
- *analytic*: typed columns for real analytics (ints/doubles/dates).

Output events use one nullable superset ``StructType`` covering all
three envelope variants the reference emits (SURVEY.md F4,
FIXTURES.md §3.3), because the reference itself mixes shapes within
one output stream.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# assessment_items — 16 positional columns (reference etl.js:5-10)
# --------------------------------------------------------------------------

ASSESSMENT_ITEMS_COLUMNS = [
    "identity_id",
    "login_identity_id",
    "school_id",
    "assessment_id",
    "assessment_version",
    "attempt_id",
    "assmtitem_id",
    "assmtitem_version",
    "assessment_type_id",
    "response_type",
    "question_time",
    "score_posible",  # sic — reference spelling
    "score_earned",
    "masterobjectives",
    "masterobjectivesid",
    "objectivenumber",
]

ASSESSMENT_ITEMS_FIDELITY = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in ASSESSMENT_ITEMS_COLUMNS]
)

_ITEMS_ANALYTIC_TYPES = {
    "question_time": T.IntegerType(),
    "score_posible": T.DoubleType(),
    "score_earned": T.DoubleType(),
}

ASSESSMENT_ITEMS_ANALYTIC = T.StructType(
    [
        T.StructField(c, _ITEMS_ANALYTIC_TYPES.get(c, T.StringType()), True)
        for c in ASSESSMENT_ITEMS_COLUMNS
    ]
)

# --------------------------------------------------------------------------
# assessments — 13 positional columns (reference etl-assessment-level.js:17)
# --------------------------------------------------------------------------

ASSESSMENTS_COLUMNS = [
    "identity_id",
    "login_identity_id",
    "school_id",
    "assessment_id",
    "assessment_version",
    "date_submitted",
    "assessment_type_id",
    "assessment_type",
    "attempt_id",
    "attemptnumber",
    "is_mastered",
    "score_earned",
    "score_posible",  # sic
]

ASSESSMENTS_FIDELITY = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in ASSESSMENTS_COLUMNS]
)

_ASSESSMENTS_ANALYTIC_TYPES = {
    "date_submitted": T.DateType(),
    "attemptnumber": T.IntegerType(),
    "is_mastered": T.BooleanType(),
    "score_earned": T.DoubleType(),
    "score_posible": T.DoubleType(),
}

ASSESSMENTS_ANALYTIC = T.StructType(
    [
        T.StructField(c, _ASSESSMENTS_ANALYTIC_TYPES.get(c, T.StringType()), True)
        for c in ASSESSMENTS_COLUMNS
    ]
)

# --------------------------------------------------------------------------
# Output event superset schema (FIXTURES.md §3.3; covers all of the
# reference's three envelope shapes — SURVEY.md F4)
# --------------------------------------------------------------------------


def _entity(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


def _sf(name: str, dtype: T.DataType) -> T.StructField:
    return T.StructField(name, dtype, True)


ID_ENTITY = _entity(_sf("id", T.StringType()))

EVENT_SCHEMA = T.StructType(
    [
        _sf("type", T.StringType()),
        _sf(
            "values",
            _entity(
                _sf("action", T.StringType()),
                _sf("actor", ID_ENTITY),
                _sf("organization", ID_ENTITY),
                _sf(
                    "assessment",
                    _entity(_sf("id", T.StringType()), _sf("version", T.StringType())),
                ),
                _sf(
                    "target",
                    _entity(
                        _sf("id", T.StringType()),
                        _sf("learningObjectives", T.ArrayType(ID_ENTITY)),
                    ),
                ),
                _sf(
                    "object",
                    _entity(_sf("id", T.StringType()), _sf("count", T.IntegerType())),
                ),
                _sf(
                    "generated",
                    _entity(
                        _sf("normalScore", T.StringType()),
                        _sf("totalScore", T.StringType()),
                    ),
                ),
            ),
        ),
        # Top-level envelope variant fields (AssessmentEvent only — F4)
        _sf("actor", ID_ENTITY),
        _sf(
            "object",
            _entity(_sf("id", T.StringType()), _sf("version", T.StringType())),
        ),
        _sf(
            "generated",
            _entity(_sf("id", T.StringType()), _sf("count", T.IntegerType())),
        ),
    ]
)

# Event-type vocabulary — closed enum (reference etl.js:128-132 typeMap).
EVENT_TYPES = {
    "ASSESSMENT_EVENT": "AssessmentEvent",
    "ASSESSMENT_ITEM_EVENT": "AssessmentItemEvent",
    "OUTCOME_EVENT": "OutcomeEvent",
    "ASSESSMENT_OUTCOME_EVENT": "AssessmentOutcomeEvent",
}
