"""Admin job-registry folds (app/api/admin.py:287-399,533-655,836-880).

``operators/job_admin`` covers the document-management routes; this
module folds the ADMIN registry routes, whose job store is the
in-memory ``active_jobs`` dict + ``job_history`` list:

* ``list_jobs`` (:287-337): union active+history, optional status /
  job_type equality, created_at-desc sort (Python stable sort;
  canonicalized tiebreak job_id asc), (page-1)*page_size slicing;
  ``total_count`` is the FILTERED count but ``status_counts`` ignores
  the filters entirely — active = len(active_jobs), completed/failed
  count HISTORY ONLY (an active row with status='completed' is
  invisible to them — pin); ``type_counts`` is hardcoded ``{}``.
* ``get_job_statistics`` (:340-399): status/type distributions over
  the union; the scalar completed/failed/cancelled counts AGAIN read
  history only (pin); recent_jobs_24h = created_at STRICTLY after
  now-24h; average_processing_time = mean(updated-created seconds)
  over history-completed, NULL when none.
* ``cancel_job`` (:533-655) ladder: missing row -> 404; non-admin
  cross-workspace -> 404 TOO (pentest #250 D2 anti-enumeration —
  not 403); status in {completed, failed, cancelled} -> 400
  (``interrupted`` IS cancellable — pin); else cancelled, echoing
  previous_status, with the full-wipe cleanup marked performed iff
  the ``cleanup`` flag (default True).
* ``cleanup_old_data`` (:836-880): scope = history rows with
  created_at STRICTLY older than now - days_old; dry_run previews
  the same count it would delete.

Scale: map-side folds + two small aggregations; the cancel batch
joins broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DAY_S = 86400


def _union(active: DataFrame, history: DataFrame) -> DataFrame:
    return (active.withColumn("_src", F.lit("active"))
            .unionByName(history.withColumn("_src", F.lit("history"))))


def admin_list_jobs(active: DataFrame, history: DataFrame, *,
                    status: str | None = None,
                    job_type: str | None = None, page: int = 1,
                    page_size: int = 50) -> DataFrame:
    u = _union(active, history)
    f = u
    if status:
        f = f.where(F.col("status") == status)
    if job_type:
        f = f.where(F.col("job_type") == job_type)
    total = f.count()
    n_active = active.count()
    hist_completed = history.where(F.col("status") == "completed") \
        .count()
    hist_failed = history.where(F.col("status") == "failed").count()
    w = Window.orderBy(F.col("created_at").desc(), "job_id")
    start = (page - 1) * page_size
    return (f.withColumn("rk", F.row_number().over(w))
            .where((F.col("rk") > start)
                   & (F.col("rk") <= start + page_size))
            .select("job_id", "status", "job_type", "created_at",
                    F.col("rk").cast("int").alias("rk"),
                    F.lit(total).cast("long").alias("total_count"),
                    F.lit(n_active).cast("long").alias("count_active"),
                    F.lit(hist_completed).cast("long")
                    .alias("count_completed"),
                    F.lit(hist_failed).cast("long")
                    .alias("count_failed")))


def admin_job_distributions(active: DataFrame,
                            history: DataFrame) -> DataFrame:
    u = _union(active, history)
    by_status = (u.groupBy(F.col("status").alias("key"))
                 .agg(F.count("*").cast("long").alias("n"))
                 .select(F.lit("status").alias("kind"), "key", "n"))
    by_type = (u.groupBy(F.col("job_type").alias("key"))
               .agg(F.count("*").cast("long").alias("n"))
               .select(F.lit("type").alias("kind"), "key", "n"))
    return by_status.unionByName(by_type)


def admin_job_scalars(active: DataFrame, history: DataFrame, *,
                      now: int) -> DataFrame:
    u = _union(active, history)
    hist = F.col("_src") == "history"
    return u.agg(
        F.count("*").cast("long").alias("total_jobs"),
        F.sum((~hist).cast("int")).cast("long").alias("active_jobs"),
        F.sum((hist & (F.col("status") == "completed")).cast("int"))
        .cast("long").alias("completed_jobs"),
        F.sum((hist & (F.col("status") == "failed")).cast("int"))
        .cast("long").alias("failed_jobs"),
        F.sum((hist & (F.col("status") == "cancelled")).cast("int"))
        .cast("long").alias("cancelled_jobs"),
        F.sum((F.col("created_at") > now - 24 * 3600).cast("int"))
        .cast("long").alias("recent_jobs_24h"),
        F.avg(F.when(hist & (F.col("status") == "completed"),
                     F.col("updated_at") - F.col("created_at")))
        .alias("average_processing_time_seconds"))


_TERMINAL_400 = ("completed", "failed", "cancelled")


def cancel_outcomes(reqs: DataFrame, jobs: DataFrame) -> DataFrame:
    """reqs: (req_id, job_id, cleanup, is_admin, req_workspace);
    jobs: (job_id, status, workspace_id)."""
    j = jobs.select(F.col("job_id").alias("_jid"),
                    F.col("status").alias("_st"),
                    F.col("workspace_id").alias("_ws"))
    x = reqs.join(F.broadcast(j), reqs["job_id"] == F.col("_jid"),
                  "left")
    missing = F.col("_jid").isNull()
    cross = ~F.col("is_admin") \
        & (F.col("_ws").cast("string")
           != F.col("req_workspace").cast("string"))
    outcome = (F.when(missing, "not_found_404")
               .when(cross, "not_found_404")   # anti-enumeration
               .when(F.col("_st").isin(*_TERMINAL_400),
                     "already_terminal_400")
               .otherwise("cancelled"))
    done = outcome == "cancelled"
    return x.select(
        "req_id", "job_id", outcome.alias("outcome"),
        F.when(done, F.col("_st")).alias("previous_status"),
        # string-rendered: NULL booleans hash engine-specific
        F.when(done, F.col("cleanup").cast("string"))
        .alias("cleanup_performed"))


def cleanup_scope(history: DataFrame, *, now: int,
                  days_old: int = 30) -> DataFrame:
    cutoff = now - days_old * DAY_S
    return (history.where(F.col("created_at") < cutoff)
            .select("job_id", "created_at"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

NOW = 1_800_000_000
_TYPES = ("document_processing", "bulk_processing", "xml_import")


def _job_cols(e, statuses):
    return [
        e.cast("long").alias("job_id"),
        F.element_at(F.array(*[F.lit(s) for s in statuses]),
                     (e % len(statuses) + 1).cast("int"))
        .alias("status"),
        F.element_at(F.array(*[F.lit(t) for t in _TYPES]),
                     (e % 3 + 1).cast("int")).alias("job_type"),
        (F.lit(NOW) - (e % 80) * 3600).cast("long").alias("created_at"),
        (F.lit(NOW) - (e % 80) * 3600 + (e % 50) * 60).cast("long")
        .alias("updated_at"),
        (e % 6).cast("long").alias("workspace_id")]


def synth_active_jobs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 4 == 0)
            .select(*_job_cols(e, ("pending", "processing",
                                   "retrying", "completed",
                                   "interrupted"))))


def synth_history_jobs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 4 != 0)
            .select(*_job_cols(e + 100000,
                               ("completed", "failed", "cancelled"))))


SYNTH_ACTIVE_JOBS_SQL = f"""
    SELECT CAST(event_id AS BIGINT) AS job_id,
           ['pending', 'processing', 'retrying', 'completed',
            'interrupted'][CAST(event_id % 5 + 1 AS INT)] AS status,
           ['document_processing', 'bulk_processing', 'xml_import']
               [CAST(event_id % 3 + 1 AS INT)] AS job_type,
           CAST({NOW} - (event_id % 80) * 3600 AS BIGINT)
               AS created_at,
           CAST({NOW} - (event_id % 80) * 3600
                + (event_id % 50) * 60 AS BIGINT) AS updated_at,
           CAST(event_id % 6 AS BIGINT) AS workspace_id
    FROM events WHERE event_id % 4 = 0
"""

SYNTH_HISTORY_JOBS_SQL = f"""
    SELECT CAST(event_id + 100000 AS BIGINT) AS job_id,
           ['completed', 'failed', 'cancelled']
               [CAST((event_id + 100000) % 3 + 1 AS INT)] AS status,
           ['document_processing', 'bulk_processing', 'xml_import']
               [CAST((event_id + 100000) % 3 + 1 AS INT)]
               AS job_type,
           CAST({NOW} - ((event_id + 100000) % 80) * 3600 AS BIGINT)
               AS created_at,
           CAST({NOW} - ((event_id + 100000) % 80) * 3600
                + ((event_id + 100000) % 50) * 60 AS BIGINT)
               AS updated_at,
           CAST((event_id + 100000) % 6 AS BIGINT) AS workspace_id
    FROM events WHERE event_id % 4 <> 0
"""

_UNION_SQL = f"""
        a AS ({SYNTH_ACTIVE_JOBS_SQL}),
        h AS ({SYNTH_HISTORY_JOBS_SQL}),
        u AS (SELECT *, 'active' AS _src FROM a
              UNION ALL SELECT *, 'history' AS _src FROM h)
"""


def list_jobs_sql(*, status: str | None = None,
                  job_type: str | None = None, page: int = 1,
                  page_size: int = 50) -> str:
    conds = ["TRUE"]
    if status:
        conds.append(f"status = '{status}'")
    if job_type:
        conds.append(f"job_type = '{job_type}'")
    where = " AND ".join(conds)
    start = (page - 1) * page_size
    return f"""
        WITH {_UNION_SQL},
        f AS (SELECT * FROM u WHERE {where}),
        t AS (SELECT count(*) AS total FROM f),
        ca AS (SELECT count(*) AS n FROM a),
        cc AS (SELECT count(*) AS n FROM h
               WHERE status = 'completed'),
        cf AS (SELECT count(*) AS n FROM h WHERE status = 'failed'),
        r AS (SELECT *, row_number() OVER (
                     ORDER BY created_at DESC, job_id) AS rk
              FROM f)
        SELECT job_id, status, job_type, created_at,
               CAST(rk AS INT) AS rk,
               CAST(t.total AS BIGINT) AS total_count,
               CAST(ca.n AS BIGINT) AS count_active,
               CAST(cc.n AS BIGINT) AS count_completed,
               CAST(cf.n AS BIGINT) AS count_failed
        FROM r, t, ca, cc, cf
        WHERE rk > {start} AND rk <= {start} + {page_size}
    """


def distributions_sql() -> str:
    return f"""
        WITH {_UNION_SQL}
        SELECT 'status' AS kind, status AS key,
               CAST(count(*) AS BIGINT) AS n
        FROM u GROUP BY status
        UNION ALL
        SELECT 'type' AS kind, job_type AS key,
               CAST(count(*) AS BIGINT) AS n
        FROM u GROUP BY job_type
    """


def scalars_sql() -> str:
    return f"""
        WITH {_UNION_SQL}
        SELECT CAST(count(*) AS BIGINT) AS total_jobs,
               CAST(sum(CASE WHEN _src = 'active' THEN 1 ELSE 0 END)
                    AS BIGINT) AS active_jobs,
               CAST(sum(CASE WHEN _src = 'history'
                        AND status = 'completed' THEN 1 ELSE 0 END)
                    AS BIGINT) AS completed_jobs,
               CAST(sum(CASE WHEN _src = 'history'
                        AND status = 'failed' THEN 1 ELSE 0 END)
                    AS BIGINT) AS failed_jobs,
               CAST(sum(CASE WHEN _src = 'history'
                        AND status = 'cancelled' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cancelled_jobs,
               CAST(sum(CASE WHEN created_at > {NOW} - 86400
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS recent_jobs_24h,
               avg(CASE WHEN _src = 'history'
                   AND status = 'completed'
                   THEN updated_at - created_at END)
                   AS average_processing_time_seconds
        FROM u
    """


def synth_cancel_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 11 == 0)
            .select(e.cast("long").alias("req_id"),
                    F.when(e % 7 == 0, -e)
                    .otherwise(((e * 4) % 10000 - (e * 4) % 4)
                               .cast("long")).cast("long")
                    .alias("job_id"),
                    (e % 3 != 0).alias("cleanup"),
                    (e % 5 == 0).alias("is_admin"),
                    (e % 6).cast("long").alias("req_workspace")))


SYNTH_CANCEL_REQS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           CAST(CASE WHEN event_id % 7 = 0 THEN -event_id
                ELSE (event_id * 4) % 10000 - (event_id * 4) % 4 END
                AS BIGINT) AS job_id,
           event_id % 3 <> 0 AS cleanup,
           event_id % 5 = 0 AS is_admin,
           CAST(event_id % 6 AS BIGINT) AS req_workspace
    FROM events WHERE event_id % 11 = 0
"""


def cancel_sql() -> str:
    return f"""
        WITH a AS ({SYNTH_ACTIVE_JOBS_SQL}),
        q AS ({SYNTH_CANCEL_REQS_SQL}),
        x AS (
          SELECT q.req_id, q.job_id, q.cleanup, q.is_admin,
                 q.req_workspace, a.status AS st,
                 a.workspace_id AS ws,
                 a.job_id IS NULL AS missing
          FROM q LEFT JOIN a ON q.job_id = a.job_id),
        o AS (
          SELECT *,
                 CASE WHEN missing THEN 'not_found_404'
                      WHEN NOT is_admin
                           AND CAST(ws AS VARCHAR)
                               <> CAST(req_workspace AS VARCHAR)
                           THEN 'not_found_404'
                      WHEN st IN ('completed', 'failed', 'cancelled')
                           THEN 'already_terminal_400'
                      ELSE 'cancelled' END AS outcome
          FROM x)
        SELECT req_id, job_id, outcome,
               CASE WHEN outcome = 'cancelled' THEN st END
                   AS previous_status,
               CASE WHEN outcome = 'cancelled'
                    THEN CAST(cleanup AS VARCHAR) END
                   AS cleanup_performed
        FROM o
    """


def cleanup_scope_sql(*, days_old: int = 30) -> str:
    return f"""
        WITH h AS ({SYNTH_HISTORY_JOBS_SQL})
        SELECT job_id, created_at FROM h
        WHERE created_at < {NOW} - {days_old} * {DAY_S}
    """
