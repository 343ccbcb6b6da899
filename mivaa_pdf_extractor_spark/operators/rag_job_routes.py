"""RAG-route job listing + deletion-mode resolution
(app/api/rag_routes.py:2115-2299; status sets from
app/schemas/jobs.py:48-63).

* ``list_jobs`` (:2115-2171): optional status equality, a
  ``field:direction`` sort parameter — split on ':',
  ``direction.lower() == 'asc'`` (any other token, including
  garbage, means DESC — pin), a sort value WITHOUT ':' silently
  falls back to created_at desc (pin) — then the inclusive
  ``.range(offset, offset+limit-1)`` page; ``count`` is the PAGE
  row count, not the filtered total (pin).
* ``delete_job`` mode resolution (:2216-2258): an explicit
  ``preserve_outputs`` query param wins outright; else the job's
  status decides — PRESERVE iff status == 'completed'
  (JOB_STATUS_PRESERVE_OUTPUTS), WIPE for the other terminal
  statuses {failed, cancelled, interrupted}
  (JOB_STATUS_WIPE_OUTPUTS = TERMINAL − PRESERVE), and
  anything else — active, unknown, or a MISSING row (read failure
  folds to 'unknown') — wipes conservatively with the
  ``status={x}_default_wipe`` source label (pin). 'retrying' is
  TERMINAL-adjacent but NOT in the wipe set: it takes the
  default-wipe branch with the default label (pin).

Scale: both are one-scan folds; the mode resolver joins the delete
batch against the jobs table on id (broadcastable batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

PRESERVE_STATUSES = ("completed",)
WIPE_STATUSES = ("failed", "cancelled", "interrupted")


def list_jobs(jobs: DataFrame, *, limit: int = 10, offset: int = 0,
              status_filter: str | None = None,
              sort: str = "created_at:desc") -> DataFrame:
    f = jobs
    if status_filter:
        f = f.where(F.col("status") == status_filter)
    if ":" in sort:
        field, direction = sort.split(":", 1)
        asc = direction.lower() == "asc"
    else:
        field, asc = "created_at", False
    key = F.col(field).asc() if asc else F.col(field).desc()
    w = Window.orderBy(key, F.col("job_id"))
    page = (f.withColumn("rk", F.row_number().over(w))
            .where((F.col("rk") > offset)
                   & (F.col("rk") <= offset + limit)))
    n = page.count()
    return page.select(
        "job_id", "status", "created_at", "progress",
        F.col("rk").cast("int").alias("rk"),
        F.lit(n).cast("int").alias("count"),
        F.lit(limit).cast("int").alias("limit"),
        F.lit(offset).cast("int").alias("offset"))


def delete_mode(reqs: DataFrame, jobs: DataFrame) -> DataFrame:
    """reqs: (req_id, job_id, preserve_override nullable boolean)."""
    j = jobs.select(F.col("job_id").alias("_jid"),
                    F.col("status").alias("_status"))
    x = reqs.join(F.broadcast(j), reqs["job_id"] == F.col("_jid"),
                  "left")
    status = F.coalesce(F.col("_status"), F.lit("unknown"))
    override = F.col("preserve_override").isNotNull()
    preserve = (F.when(override, F.col("preserve_override"))
                .when(status.isin(*PRESERVE_STATUSES), F.lit(True))
                .otherwise(F.lit(False)))
    source = (F.when(override, F.lit("explicit_query_param"))
              .when(status.isin(*PRESERVE_STATUSES)
                    | status.isin(*WIPE_STATUSES),
                    F.concat(F.lit("status="), status))
              .otherwise(F.concat(F.lit("status="), status,
                                  F.lit("_default_wipe"))))
    return x.select("req_id", "job_id",
                    preserve.alias("mode_preserve"),
                    source.alias("mode_source"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------


def synth_jobs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("job_id"),
        F.when(e % 7 == 0, "pending").when(e % 7 == 1, "processing")
        .when(e % 7 == 2, "retrying").when(e % 7 == 3, "completed")
        .when(e % 7 == 4, "failed").when(e % 7 == 5, "cancelled")
        .otherwise("interrupted").alias("status"),
        ((e * 37) % 100000).cast("long").alias("created_at"),
        (e % 101).cast("int").alias("progress"))


SYNTH_RAG_JOBS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS job_id,
           CASE event_id % 7 WHEN 0 THEN 'pending'
                WHEN 1 THEN 'processing' WHEN 2 THEN 'retrying'
                WHEN 3 THEN 'completed' WHEN 4 THEN 'failed'
                WHEN 5 THEN 'cancelled'
                ELSE 'interrupted' END AS status,
           CAST((event_id * 37) % 100000 AS BIGINT) AS created_at,
           CAST(event_id % 101 AS INT) AS progress
    FROM events
"""


def list_jobs_sql(*, limit: int = 10, offset: int = 0,
                  status_filter: str | None = None,
                  sort: str = "created_at:desc") -> str:
    cond = (f"status = '{status_filter}'" if status_filter
            else "TRUE")
    if ":" in sort:
        field, direction = sort.split(":", 1)
        order = "ASC" if direction.lower() == "asc" else "DESC"
    else:
        field, order = "created_at", "DESC"
    return f"""
        WITH j AS ({SYNTH_RAG_JOBS_SQL}),
        f AS (SELECT * FROM j WHERE {cond}),
        r AS (SELECT *, row_number() OVER (
                     ORDER BY {field} {order}, job_id) AS rk
              FROM f),
        p AS (SELECT * FROM r
              WHERE rk > {offset} AND rk <= {offset} + {limit}),
        n AS (SELECT count(*) AS c FROM p)
        SELECT job_id, status, created_at, progress,
               CAST(rk AS INT) AS rk, CAST(n.c AS INT) AS count,
               {limit} AS "limit", {offset} AS "offset"
        FROM p, n
    """


def synth_delete_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 6 == 0)
            .select(e.cast("long").alias("req_id"),
                    # every 5th targets a missing job id
                    F.when(e % 5 == 0, -e).otherwise((e * 3) % 400)
                    .cast("long").alias("job_id"),
                    F.when(e % 9 == 0, F.lit(True))
                    .when(e % 9 == 3, F.lit(False))
                    .otherwise(F.lit(None).cast("boolean"))
                    .alias("preserve_override")))


SYNTH_DELETE_REQS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           CAST(CASE WHEN event_id % 5 = 0 THEN -event_id
                ELSE (event_id * 3) % 400 END AS BIGINT) AS job_id,
           CASE WHEN event_id % 9 = 0 THEN TRUE
                WHEN event_id % 9 = 3 THEN FALSE
                ELSE NULL END AS preserve_override
    FROM events WHERE event_id % 6 = 0
"""


def delete_mode_sql() -> str:
    return f"""
        WITH j AS ({SYNTH_RAG_JOBS_SQL}),
        q AS ({SYNTH_DELETE_REQS_SQL}),
        x AS (
          SELECT q.req_id, q.job_id, q.preserve_override,
                 coalesce(j.status, 'unknown') AS status
          FROM q LEFT JOIN j ON q.job_id = j.job_id)
        SELECT req_id, job_id,
               CASE WHEN preserve_override IS NOT NULL
                    THEN preserve_override
                    WHEN status = 'completed' THEN TRUE
                    ELSE FALSE END AS mode_preserve,
               CASE WHEN preserve_override IS NOT NULL
                    THEN 'explicit_query_param'
                    WHEN status IN ('completed', 'failed',
                                    'cancelled', 'interrupted')
                    THEN 'status=' || status
                    ELSE 'status=' || status || '_default_wipe' END
                   AS mode_source
        FROM x
    """
