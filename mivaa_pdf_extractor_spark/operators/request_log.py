"""Request-logging middleware fold
(app/middleware/error_logging.py:61-168).

Deterministic routing of the per-request log record (the ASGI plumbing
is out of scope).  Pinned semantics (file:line):

* Requests whose path contains '/rest/v1/system_logs' are NOT logged
  at all — recursion guard; substring match, not prefix (pin :75).
* Status >= 400 routes by severity: WARNING only for >= 500, 4xx logs
  at INFO (:97-105 — the comment documents why: scanner noise was
  filling retention-exempt rows; "4xx are client errors, not bugs").
  Message "Request failed: {method} {path} - Status: {code} - Time:
  {ms:.2f}ms".
* Status < 400 logs INFO "Request completed: …".
* An unhandled exception logs ERROR and returns the pinned 500
  envelope: code INTERNAL_ERROR, message 'An internal server error
  occurred', retryable TRUE (:146-167).
* The recursion guard does NOT apply to the exception path — a crash
  on a system_logs request IS logged (the try wraps only the two
  info/warning sites — pin).
* X-Correlation-ID is stamped on success AND error responses.

The :.2f time rendering uses integer half-up (floor(x*100+0.5)) on
both engines; Python %.2f half-even ties are measure-zero for
timings (documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _ms2(col):
    """'{x:.2f}' with integer half-up."""
    c = F.floor(col * 100 + F.lit(0.5)).cast("long")
    return F.concat((c / 100).cast("long").cast("string"), F.lit("."),
                    F.lpad((c % 100).cast("string"), 2, "0"))


def route_request_logs(requests: DataFrame) -> DataFrame:
    """requests: (request_id, method, path, status int nullable,
    raised bool, error_type, error_msg, processing_ms double)."""
    sys_logs = F.col("path").contains("/rest/v1/system_logs")
    status = F.col("status")
    ms = _ms2(F.col("processing_ms"))
    raised = F.col("raised")
    level = (F.when(raised, "error")
             .when(sys_logs, F.lit(None).cast("string"))
             .when(status >= 500, "warning")
             .otherwise("info"))
    message = (
        F.when(raised, F.concat(
            F.lit("Unhandled exception: "), F.col("error_type"),
            F.lit(": "), F.col("error_msg"), F.lit(" - Endpoint: "),
            F.col("method"), F.lit(" "), F.col("path"),
            F.lit(" - Time: "), ms, F.lit("ms")))
        .when(sys_logs, F.lit(None).cast("string"))
        .when(status >= 400, F.concat(
            F.lit("Request failed: "), F.col("method"), F.lit(" "),
            F.col("path"), F.lit(" - Status: "),
            status.cast("string"), F.lit(" - Time: "), ms,
            F.lit("ms")))
        .otherwise(F.concat(
            F.lit("Request completed: "), F.col("method"), F.lit(" "),
            F.col("path"), F.lit(" - Status: "),
            status.cast("string"), F.lit(" - Time: "), ms,
            F.lit("ms"))))
    return requests.select(
        "request_id", level.alias("level"), message.alias("message"),
        (~raised & sys_logs).alias("suppressed"),
        F.when(raised, 500).otherwise(status).cast("int")
        .alias("response_status"),
        F.when(raised, F.lit("INTERNAL_ERROR")).alias("error_code"),
        F.when(raised, F.lit(True)).cast("string")
        .alias("retryable"),
        F.lit(True).alias("correlation_header"))


def synth_requests(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("request_id"),
        F.when(e % 3 == 0, "GET").when(e % 3 == 1, "POST")
        .otherwise("DELETE").alias("method"),
        F.when(e % 6 == 0, "/rest/v1/system_logs")
        .when(e % 6 == 1, "/api/x/rest/v1/system_logs/tail")
        .otherwise(F.concat(F.lit("/api/doc/"), (e % 30).cast("string")))
        .alias("path"),
        F.when(e % 9 == 0, 200).when(e % 9 == 1, 404)
        .when(e % 9 == 2, 422).when(e % 9 == 3, 500)
        .when(e % 9 == 4, 503).otherwise(201).cast("int")
        .alias("status"),
        (e % 13 == 0).alias("raised"),
        F.lit("ValueError").alias("error_type"),
        F.concat(F.lit("bad "), (e % 5).cast("string"))
        .alias("error_msg"),
        ((e % 7919).cast("double") * 0.25).alias("processing_ms"))


SYNTH_REQUESTS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS request_id,
           CASE event_id % 3 WHEN 0 THEN 'GET' WHEN 1 THEN 'POST'
                ELSE 'DELETE' END AS method,
           CASE WHEN event_id % 6 = 0 THEN '/rest/v1/system_logs'
                WHEN event_id % 6 = 1
                     THEN '/api/x/rest/v1/system_logs/tail'
                ELSE '/api/doc/' || CAST(event_id % 30 AS VARCHAR)
           END AS path,
           CAST(CASE event_id % 9 WHEN 0 THEN 200 WHEN 1 THEN 404
                WHEN 2 THEN 422 WHEN 3 THEN 500 WHEN 4 THEN 503
                ELSE 201 END AS INT) AS status,
           event_id % 13 = 0 AS raised,
           'ValueError' AS error_type,
           'bad ' || CAST(event_id % 5 AS VARCHAR) AS error_msg,
           CAST(event_id % 7919 AS DOUBLE) * 0.25 AS processing_ms
    FROM events
"""


def route_sql() -> str:
    ms = ("CAST(CAST(floor(processing_ms * 100 + 0.5) AS BIGINT) "
          "// 100 AS VARCHAR) || '.' || "
          "lpad(CAST(CAST(floor(processing_ms * 100 + 0.5) AS BIGINT)"
          " % 100 AS VARCHAR), 2, '0')")
    return f"""
        WITH r AS ({SYNTH_REQUESTS_SQL}),
        g AS (SELECT *, strpos(path, '/rest/v1/system_logs') > 0
                     AS sys_logs, {ms} AS ms
              FROM r)
        SELECT request_id,
               CASE WHEN raised THEN 'error'
                    WHEN sys_logs THEN NULL
                    WHEN status >= 500 THEN 'warning'
                    ELSE 'info' END AS level,
               CASE WHEN raised THEN 'Unhandled exception: '
                      || error_type || ': ' || error_msg
                      || ' - Endpoint: ' || method || ' ' || path
                      || ' - Time: ' || ms || 'ms'
                    WHEN sys_logs THEN NULL
                    WHEN status >= 400 THEN 'Request failed: '
                      || method || ' ' || path || ' - Status: '
                      || CAST(status AS VARCHAR) || ' - Time: '
                      || ms || 'ms'
                    ELSE 'Request completed: ' || method || ' '
                      || path || ' - Status: '
                      || CAST(status AS VARCHAR) || ' - Time: '
                      || ms || 'ms' END AS message,
               NOT raised AND sys_logs AS suppressed,
               CAST(CASE WHEN raised THEN 500 ELSE status END AS INT)
                   AS response_status,
               CASE WHEN raised THEN 'INTERNAL_ERROR' END
                   AS error_code,
               CAST(CASE WHEN raised THEN TRUE END AS VARCHAR)
                   AS retryable,
               TRUE AS correlation_header
        FROM g
    """
