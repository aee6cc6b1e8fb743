"""Caliper event pipelines — the reference-parity surface.

Two batch pipelines, re-expressed Spark-first:

- :mod:`items` — per-question results → ``OutcomeEvent`` docs grouped
  by attempt (reference ``etl.js``).
- :mod:`assessments` — per-attempt results → STARTED/SUBMITTED/GRADED
  event fan-out (reference ``etl-assessment-level.js``).
"""

from caliper_poc_data_etl_spark.pipelines.items import (  # noqa: F401
    item_outcome_events,
    items_grouped_by_attempt,
    run_items_pipeline,
)
from caliper_poc_data_etl_spark.pipelines.assessments import (  # noqa: F401
    assessment_attempt_events,
    run_assessments_pipeline,
)
