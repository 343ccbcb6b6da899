"""Job-health dashboard fold.

Re-expresses ``app/api/job_health_routes.py:31-133``
(``get_job_health_dashboard``; the per-job stuck ANALYZER is covered by
the X5 tracking battery — this pins the dashboard rollup):

- stuck detection is an ELIF ladder: a processing job WITH a heartbeat
  is judged ONLY on heartbeat age (>2 min) — its stale ``updated_at``
  is never consulted; only heartbeat-LESS jobs use the 5-minute
  ``updated_at`` rule (pin);
- ``success_rate`` = completed/total·100 rounded to 2;
- the health ladder: stuck>0 → warning, then the CRITICAL check
  compares ``len(failed) > len(completed) * 0.1`` — failures against
  COMPLETED, not total, even though the alert message prints
  failed/total (pin);
- avg processing time only over completed jobs carrying both
  timestamps, rounded to 2.

One groupBy over the synthetic 24-hour job window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def job_health_dashboard(jobs: DataFrame) -> DataFrame:
    st = F.col("status")
    processing = st == "processing"
    stuck = processing & (
        (F.col("has_heartbeat") & (F.col("hb_age_min") > 2.0))
        | (~F.col("has_heartbeat") & F.col("upd_age_min").isNotNull()
           & (F.col("upd_age_min") > 5.0)))
    agg = jobs.groupBy("snapshot_id").agg(
        F.count(F.lit(1)).cast("int").alias("total_jobs"),
        F.sum(processing.cast("int")).cast("int").alias("active_jobs"),
        F.sum((st == "completed").cast("int")).cast("int")
        .alias("completed_jobs"),
        F.sum((st == "failed").cast("int")).cast("int")
        .alias("failed_jobs"),
        F.sum((st == "pending").cast("int")).cast("int")
        .alias("pending_jobs"),
        F.sum(stuck.cast("int")).cast("int").alias("stuck_jobs"),
        F.avg(F.when(st == "completed", F.col("proc_secs")))
        .alias("_avg_proc"))
    success_rate = F.round(
        F.when(F.col("total_jobs") > 0,
               F.col("completed_jobs") / F.col("total_jobs") * 100.0)
        .otherwise(F.lit(0.0)), 2)
    critical = (F.col("failed_jobs")
                > F.col("completed_jobs") * F.lit(0.1))
    warning = F.col("stuck_jobs") > 0
    return agg.select(
        "snapshot_id", "total_jobs", "active_jobs", "completed_jobs",
        "failed_jobs", "pending_jobs", "stuck_jobs",
        success_rate.alias("success_rate"),
        F.round(F.coalesce(F.col("_avg_proc"), F.lit(0.0)), 2)
        .alias("avg_processing_time_seconds"),
        F.when(critical, "critical").when(warning, "warning")
        .otherwise("healthy").alias("health_status"),
        (warning.cast("int") + critical.cast("int")).cast("int")
        .alias("n_alerts"))


def synth_health_jobs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        (e % 59).cast("long").alias("snapshot_id"),
        e.cast("long").alias("job_id"),
        F.element_at(F.array(
            F.lit("processing"), F.lit("completed"), F.lit("completed"),
            F.lit("failed"), F.lit("pending"), F.lit("processing"),
            F.lit("completed")), (e % 7 + 1).cast("int"))
        .alias("status"),
        (e % 3 != 0).alias("has_heartbeat"),
        ((e % 13).cast("double") / 2.0).alias("hb_age_min"),
        F.when(e % 9 == 0, F.lit(None).cast("double"))
        .otherwise((e % 17).cast("double")).alias("upd_age_min"),
        F.when(e % 4 == 0, F.lit(None).cast("double"))
        .otherwise((e % 300).cast("double")).alias("proc_secs"))


SYNTH_HEALTH_JOBS_SQL = """
    SELECT CAST(event_id % 59 AS BIGINT) AS snapshot_id,
           CAST(event_id AS BIGINT) AS job_id,
           (['processing', 'completed', 'completed', 'failed',
             'pending', 'processing', 'completed'])
             [CAST(event_id % 7 AS INT) + 1] AS status,
           event_id % 3 <> 0 AS has_heartbeat,
           CAST(event_id % 13 AS DOUBLE) / 2.0 AS hb_age_min,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE CAST(event_id % 17 AS DOUBLE) END AS upd_age_min,
           CASE WHEN event_id % 4 = 0 THEN NULL
                ELSE CAST(event_id % 300 AS DOUBLE) END AS proc_secs
    FROM events
"""


def health_dashboard_sql() -> str:
    return f"""
        WITH j AS ({SYNTH_HEALTH_JOBS_SQL}),
        g AS (
          SELECT *,
                 status = 'processing'
                 AND ((has_heartbeat AND hb_age_min > 2.0)
                      OR (NOT has_heartbeat
                          AND upd_age_min IS NOT NULL
                          AND upd_age_min > 5.0)) AS stuck
          FROM j),
        a AS (
          SELECT snapshot_id,
                 CAST(count(*) AS INT) AS total_jobs,
                 CAST(sum(CASE WHEN status = 'processing'
                          THEN 1 ELSE 0 END) AS INT) AS active_jobs,
                 CAST(sum(CASE WHEN status = 'completed'
                          THEN 1 ELSE 0 END) AS INT)
                     AS completed_jobs,
                 CAST(sum(CASE WHEN status = 'failed'
                          THEN 1 ELSE 0 END) AS INT) AS failed_jobs,
                 CAST(sum(CASE WHEN status = 'pending'
                          THEN 1 ELSE 0 END) AS INT) AS pending_jobs,
                 CAST(sum(CASE WHEN stuck THEN 1 ELSE 0 END) AS INT)
                     AS stuck_jobs,
                 avg(CASE WHEN status = 'completed'
                     THEN proc_secs END) AS avg_proc
          FROM g GROUP BY snapshot_id)
        SELECT snapshot_id, total_jobs, active_jobs, completed_jobs,
               failed_jobs, pending_jobs, stuck_jobs,
               round(CASE WHEN total_jobs > 0
                     THEN completed_jobs * 100.0 / total_jobs
                     ELSE 0.0 END, 2) AS success_rate,
               round(coalesce(avg_proc, 0.0), 2)
                   AS avg_processing_time_seconds,
               CASE WHEN failed_jobs > completed_jobs * 0.1
                    THEN 'critical'
                    WHEN stuck_jobs > 0 THEN 'warning'
                    ELSE 'healthy' END AS health_status,
               CAST((CASE WHEN stuck_jobs > 0 THEN 1 ELSE 0 END)
                    + (CASE WHEN failed_jobs > completed_jobs * 0.1
                            THEN 1 ELSE 0 END) AS INT) AS n_alerts
        FROM a
    """
