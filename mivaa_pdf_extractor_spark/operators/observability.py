"""Pipeline-observability folds: correlation stamping and LLM span
annotation gates.

Re-expresses the deterministic shaping of
``app/utils/pipeline_observability.py`` (the Sentry transport itself is
out of scope — these pin WHICH fields get stamped):

- ``observability_stamp`` — pipeline_observability.py:38-49,118-125,165-189
  (three different presence conventions in one module, pinned side by
  side: log-record correlation uses ``ctx or "-"`` so an EMPTY-string
  job id stamps ``-``; the job-transaction tags use truthy gates so an
  ''-workspace sets NO tag; ``annotate_llm_call`` uses ``is not None``
  gates so a ZERO input_tokens / 0.0 cost IS recorded — and success
  maps to the strings 'true'/'false', absent → no tag)

Pure map-side when-chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def observability_stamp(rows: DataFrame) -> DataFrame:
    """One row per instrumented call → the stamped record/tag fields
    under the module's three presence conventions."""
    blankish = (lambda c: F.col(c).isNull() | (F.col(c) == ""))
    return rows.select(
        "row_id",
        # log record: or-fallback → '-' on NULL and ''
        F.when(blankish("ctx_job_id"), F.lit("-"))
        .otherwise(F.col("ctx_job_id")).alias("rec_job_id"),
        # transaction tags: truthy gate → '' sets no tag
        (~blankish("workspace_id")).alias("ws_tag_set"),
        (~blankish("discovery_model")).alias("model_tag_set"),
        # llm annotation: is-not-None gates → 0 IS recorded
        F.col("input_tokens").isNotNull().alias("input_tokens_set"),
        F.col("cost_usd").isNotNull().alias("cost_set"),
        F.when(F.col("success").isNull(), F.lit(None).cast("string"))
        .when(F.col("success"), F.lit("true")).otherwise(F.lit("false"))
        .alias("success_tag"))


def synth_observed_calls(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("row_id"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("job-"), (e % 7).cast("string")))
        .alias("ctx_job_id"),
        F.when(e % 4 == 0, F.lit(None).cast("string"))
        .when(e % 4 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("ws-"), (e % 3).cast("string")))
        .alias("workspace_id"),
        F.when(e % 3 == 0, F.lit(None).cast("string"))
        .when(e % 3 == 1, F.lit(""))
        .otherwise(F.lit("gpt-oss")).alias("discovery_model"),
        F.when(e % 6 == 0, F.lit(None).cast("int"))
        .when(e % 6 == 1, F.lit(0))
        .otherwise((e % 900).cast("int")).alias("input_tokens"),
        F.when(e % 7 == 0, F.lit(None).cast("double"))
        .when(e % 7 == 1, F.lit(0.0))
        .otherwise((e % 13).cast("double") / 100.0).alias("cost_usd"),
        F.when(e % 8 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 2 == 0).alias("success"))


SYNTH_OBSERVED_CALLS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS row_id,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'job-' || CAST(event_id % 7 AS VARCHAR)
           END AS ctx_job_id,
           CASE WHEN event_id % 4 = 0 THEN NULL
                WHEN event_id % 4 = 1 THEN ''
                ELSE 'ws-' || CAST(event_id % 3 AS VARCHAR)
           END AS workspace_id,
           CASE WHEN event_id % 3 = 0 THEN NULL
                WHEN event_id % 3 = 1 THEN ''
                ELSE 'gpt-oss' END AS discovery_model,
           CAST(CASE WHEN event_id % 6 = 0 THEN NULL
                WHEN event_id % 6 = 1 THEN 0
                ELSE event_id % 900 END AS INT) AS input_tokens,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN 0.0
                ELSE CAST(event_id % 13 AS DOUBLE) / 100.0
           END AS cost_usd,
           CASE WHEN event_id % 8 = 0 THEN NULL
                ELSE event_id % 2 = 0 END AS success
    FROM events
"""


def observability_stamp_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_OBSERVED_CALLS_SQL})
        SELECT row_id,
               CASE WHEN ctx_job_id IS NULL OR ctx_job_id = ''
                    THEN '-' ELSE ctx_job_id END AS rec_job_id,
               NOT (workspace_id IS NULL OR workspace_id = '')
                   AS ws_tag_set,
               NOT (discovery_model IS NULL OR discovery_model = '')
                   AS model_tag_set,
               input_tokens IS NOT NULL AS input_tokens_set,
               cost_usd IS NOT NULL AS cost_set,
               CASE WHEN success IS NULL THEN NULL
                    WHEN success THEN 'true'
                    ELSE 'false' END AS success_tag
        FROM r
    """
