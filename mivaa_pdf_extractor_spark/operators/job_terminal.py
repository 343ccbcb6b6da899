"""Job terminal transitions — complete_job / fail_job
(app/services/tracking/progress_tracker.py:619-995).

The in-flight progress math is covered by ``operators/progress`` /
``operators/product_progress``; this module folds the two TERMINAL
handlers over a batch of ending jobs:

* idempotency asymmetry (pin): ``complete_job`` early-returns when the
  job row already reads status='completed' (audit fix #37 — a second
  completion must not move ``completed_at``), but ``fail_job`` has NO
  such guard — a re-fail overwrites ``failed_at`` every time;
* completed path (:652-712): ``total_ai_cost_usd`` =
  sum(float(billed_cost_usd or 0)) over the job's ai_usage_logs (NULL
  rows count 0; no rows -> 0.0, still written); the vision-coverage
  rollup over document_images — total / truthy
  has_understanding_embedding / truthy vision_analysis_failed /
  ``round(succeeded*100/total, 2)`` — is attached only when the job
  has a document_id AND at least one image row (else NULL); progress
  pinned to 100;
* failed path (:877-903): progress =
  ``int(calculate_progress_percentage())`` — truncation, not
  rounding (modeled floor; the percentage is non-negative); the
  fail-side never reads ai_usage_logs (cost stays NULL — pin);
* orphan sweep (:731-756, :906-921): product_processing_status rows
  still pending/processing at terminal time flip to 'failed' with
  ``orphaned_at_job_completion`` vs ``orphaned_at_job_failure`` —
  and the completed-path IDEMPOTENT NO-OP returns BEFORE the sweep,
  so a re-completed job's orphans are never swept (pin);
* processed_documents mirror (:757-778, :923-937): completed ->
  processing_status='completed'; failed -> 'failed' with the error
  truncated to 2000 chars; skipped when document_id is NULL and on
  the no-op path.

Scale: three independent map-side folds plus two (job)-keyed
pre-aggregations (cost, vision coverage) broadcast-joined onto the
terminating batch — the batch is operator-bounded, the logs/images
aggregate map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _noop(outcome, prior):
    return (outcome == "completed") & (prior == "completed")


def terminal_job_updates(jobs: DataFrame, ai_logs: DataFrame,
                         images: DataFrame) -> DataFrame:
    """jobs: (job_id, document_id nullable, outcome, prior_status,
    progress_pct, error_message)."""
    cost = (ai_logs.groupBy("job_id")
            .agg(F.sum(F.coalesce(F.col("billed_cost_usd"),
                                  F.lit(0.0))).alias("_cost")))
    vis = (images.groupBy("document_id")
           .agg(F.count("*").cast("int").alias("_vt"),
                F.sum(F.col("has_understanding_embedding")
                      .cast("int")).cast("int").alias("_ve"),
                F.sum(F.col("vision_analysis_failed").cast("int"))
                .cast("int").alias("_vf")))
    j = (jobs.join(cost, "job_id", "left")
         .join(vis, "document_id", "left"))
    outcome, prior = F.col("outcome"), F.col("prior_status")
    noop = _noop(outcome, prior)
    completed = (outcome == "completed") & ~noop
    action = (F.when(noop, "noop")
              .when(completed, "complete").otherwise("fail"))
    has_vis = completed & F.col("document_id").isNotNull() \
        & F.col("_vt").isNotNull()
    return j.select(
        "job_id", action.alias("action"),
        F.when(noop, F.lit(None).cast("string"))
        .otherwise(outcome).alias("status_out"),
        F.when(noop, F.lit(None).cast("int"))
        .when(completed, F.lit(100))
        .otherwise(F.floor("progress_pct").cast("int"))
        .alias("progress_out"),
        # cost is a completed-path read only (pin)
        F.when(completed, F.coalesce(F.col("_cost"), F.lit(0.0)))
        .otherwise(F.lit(None).cast("double"))
        .alias("total_ai_cost_usd"),
        F.when(has_vis, F.col("_vt")).alias("vision_total"),
        F.when(has_vis, F.coalesce(F.col("_ve"), F.lit(0)))
        .alias("vision_embedded"),
        F.when(has_vis, F.coalesce(F.col("_vf"), F.lit(0)))
        .alias("vision_failed"),
        F.when(has_vis, F.round(F.col("_ve") * 100.0 / F.col("_vt"),
                                2)).alias("coverage_pct"))


def orphan_sweep(products: DataFrame, jobs: DataFrame) -> DataFrame:
    """pending/processing product rows of terminating (non-noop)
    jobs -> failed, message by outcome."""
    t = jobs.where(~_noop(F.col("outcome"), F.col("prior_status"))) \
        .select("job_id", "outcome")
    return (products
            .where(F.col("status").isin("pending", "processing"))
            .join(F.broadcast(t), "job_id")
            .select("job_id", "product_row_id",
                    F.lit("failed").alias("status_out"),
                    F.when(F.col("outcome") == "completed",
                           "orphaned_at_job_completion")
                    .otherwise("orphaned_at_job_failure")
                    .alias("error_message")))


def processed_docs_mirror(jobs: DataFrame) -> DataFrame:
    """The processed_documents status mirror for non-noop jobs that
    carry a document_id; failed errors truncate to 2000 chars."""
    t = jobs.where(~_noop(F.col("outcome"), F.col("prior_status"))
                   & F.col("document_id").isNotNull())
    failed = F.col("outcome") == "failed"
    return t.select(
        "job_id", "document_id",
        F.when(failed, "failed").otherwise("completed")
        .alias("processing_status"),
        F.when(failed, F.substring(F.coalesce("error_message",
                                              F.lit("")), 1, 2000))
        .otherwise(F.lit(None).cast("string"))
        .alias("processing_error"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------


def synth_terminal_jobs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 10 == 0)
            .select(e.cast("long").alias("job_id"),
                    F.when(e % 30 == 0, F.lit(None).cast("long"))
                    .otherwise((e % 37).cast("long"))
                    .alias("document_id"),
                    F.when(e % 20 == 0, "failed")
                    .otherwise("completed").alias("outcome"),
                    F.when(e % 40 == 0, "completed")
                    .when(e % 40 == 20, "failed")
                    .otherwise("processing").alias("prior_status"),
                    F.round((e % 97) * 0.97, 2).alias("progress_pct"),
                    F.when(e % 50 == 0,
                           F.repeat(F.lit("E"), 2500))
                    .otherwise(F.concat(F.lit("err "),
                                        (e % 13).cast("string")))
                    .alias("error_message")))


SYNTH_TERMINAL_JOBS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS job_id,
           CASE WHEN event_id % 30 = 0 THEN NULL
                ELSE CAST(event_id % 37 AS BIGINT) END
               AS document_id,
           CASE WHEN event_id % 20 = 0 THEN 'failed'
                ELSE 'completed' END AS outcome,
           CASE WHEN event_id % 40 = 0 THEN 'completed'
                WHEN event_id % 40 = 20 THEN 'failed'
                ELSE 'processing' END AS prior_status,
           round((event_id % 97) * 0.97, 2) AS progress_pct,
           CASE WHEN event_id % 50 = 0 THEN repeat('E', 2500)
                ELSE 'err ' || CAST(event_id % 13 AS VARCHAR) END
               AS error_message
    FROM events WHERE event_id % 10 = 0
"""


def synth_ai_logs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 3 == 0)
            .select(((e * 7) % 1000 - (e * 7) % 10).cast("long")
                    .alias("job_id"),
                    F.when(e % 9 == 0, F.lit(None).cast("double"))
                    .otherwise(F.round((e % 21) * 0.013, 3))
                    .alias("billed_cost_usd")))


SYNTH_AI_LOGS_SQL = """
    SELECT CAST((event_id * 7) % 1000 - (event_id * 7) % 10
                AS BIGINT) AS job_id,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE round((event_id % 21) * 0.013, 3) END
               AS billed_cost_usd
    FROM events WHERE event_id % 3 = 0
"""


def synth_vision_images(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 4 == 0)
            .select((e % 37).cast("long").alias("document_id"),
                    (e % 5 != 0).alias("has_understanding_embedding"),
                    (e % 7 == 0).alias("vision_analysis_failed")))


SYNTH_VISION_IMAGES_SQL = """
    SELECT CAST(event_id % 37 AS BIGINT) AS document_id,
           event_id % 5 <> 0 AS has_understanding_embedding,
           event_id % 7 = 0 AS vision_analysis_failed
    FROM events WHERE event_id % 4 = 0
"""


def synth_product_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("product_row_id"),
        (e % 1000 - e % 10).cast("long").alias("job_id"),
        F.when(e % 6 == 0, "pending").when(e % 6 == 1, "processing")
        .when(e % 6 < 4, "completed").otherwise("failed")
        .alias("status"))


SYNTH_PRODUCT_ROWS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS product_row_id,
           CAST(event_id % 1000 - event_id % 10 AS BIGINT) AS job_id,
           CASE WHEN event_id % 6 = 0 THEN 'pending'
                WHEN event_id % 6 = 1 THEN 'processing'
                WHEN event_id % 6 < 4 THEN 'completed'
                ELSE 'failed' END AS status
    FROM events
"""

_NOOP_SQL = "outcome = 'completed' AND prior_status = 'completed'"


def terminal_updates_sql() -> str:
    return f"""
        WITH j AS ({SYNTH_TERMINAL_JOBS_SQL}),
        al AS ({SYNTH_AI_LOGS_SQL}),
        im AS ({SYNTH_VISION_IMAGES_SQL}),
        c AS (SELECT job_id, sum(coalesce(billed_cost_usd, 0))
                         AS cost
              FROM al GROUP BY job_id),
        v AS (SELECT document_id,
                     CAST(count(*) AS INT) AS vt,
                     CAST(sum(CASE WHEN has_understanding_embedding
                              THEN 1 ELSE 0 END) AS INT) AS ve,
                     CAST(sum(CASE WHEN vision_analysis_failed
                              THEN 1 ELSE 0 END) AS INT) AS vf
              FROM im GROUP BY document_id),
        x AS (
          SELECT j.*, c.cost, v.vt, v.ve, v.vf,
                 {_NOOP_SQL} AS noop,
                 outcome = 'completed'
                     AND NOT ({_NOOP_SQL}) AS done
          FROM j LEFT JOIN c ON j.job_id = c.job_id
                 LEFT JOIN v ON j.document_id = v.document_id)
        SELECT job_id,
               CASE WHEN noop THEN 'noop'
                    WHEN done THEN 'complete' ELSE 'fail' END
                   AS action,
               CASE WHEN noop THEN NULL ELSE outcome END
                   AS status_out,
               CAST(CASE WHEN noop THEN NULL
                    WHEN done THEN 100
                    ELSE floor(progress_pct) END AS INT)
                   AS progress_out,
               CASE WHEN done THEN coalesce(cost, 0.0)
                    ELSE NULL END AS total_ai_cost_usd,
               CASE WHEN done AND document_id IS NOT NULL
                    THEN vt END AS vision_total,
               CASE WHEN done AND document_id IS NOT NULL
                         AND vt IS NOT NULL
                    THEN coalesce(ve, 0) END AS vision_embedded,
               CASE WHEN done AND document_id IS NOT NULL
                         AND vt IS NOT NULL
                    THEN coalesce(vf, 0) END AS vision_failed,
               CASE WHEN done AND document_id IS NOT NULL
                         AND vt IS NOT NULL
                    THEN round(ve * 100.0 / vt, 2) END
                   AS coverage_pct
        FROM x
    """


def orphan_sweep_sql() -> str:
    return f"""
        WITH j AS ({SYNTH_TERMINAL_JOBS_SQL}),
        p AS ({SYNTH_PRODUCT_ROWS_SQL}),
        t AS (SELECT job_id, outcome FROM j
              WHERE NOT ({_NOOP_SQL}))
        SELECT p.job_id, p.product_row_id,
               'failed' AS status_out,
               CASE WHEN t.outcome = 'completed'
                    THEN 'orphaned_at_job_completion'
                    ELSE 'orphaned_at_job_failure' END
                   AS error_message
        FROM p JOIN t ON p.job_id = t.job_id
        WHERE p.status IN ('pending', 'processing')
    """


def docs_mirror_sql() -> str:
    return f"""
        WITH j AS ({SYNTH_TERMINAL_JOBS_SQL})
        SELECT job_id, document_id,
               CASE WHEN outcome = 'failed' THEN 'failed'
                    ELSE 'completed' END AS processing_status,
               CASE WHEN outcome = 'failed'
                    THEN substring(coalesce(error_message, ''),
                                   1, 2000)
                    ELSE NULL END AS processing_error
        FROM j
        WHERE NOT ({_NOOP_SQL}) AND document_id IS NOT NULL
    """
