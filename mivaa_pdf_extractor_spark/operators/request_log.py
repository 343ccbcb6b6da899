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


# ---------------------------------------------------------------------------
# Supabase DB log-sink gate (app/utils/supabase_logging_handler.py)
# ---------------------------------------------------------------------------

DENY_PREFIXES = (
    'httpx', 'httpcore', 'urllib3', 'hpack', 'asyncio',
    'openai', 'anthropic', 'botocore',
    'middleware', 'app.middleware.error_logging',
)  # supabase_logging_handler.py:27-31 (default denylist, env-tunable)

WARNING_LEVELNO = 30


def log_sink_gate(records: DataFrame) -> DataFrame:
    """supabase_logging_handler.py:101-178 pins:

    - WARNING+ is NEVER dropped regardless of logger (:110-112);
      below that, ``record.name.startswith(deny_prefixes)`` — a RAW
      prefix tuple, so 'middleware' also denies a logger named
      'middlewares' (un-dotted prefix match — pin);
    - the uuid sentinel guard folds '-' AND '' AND None to NULL for
      job_id/user_id/request_id (:160-164 — Supabase uuid columns
      reject '-' with 22P02);
    - every surviving row is tagged source='backend'."""
    deny = F.lit(False)
    for p in DENY_PREFIXES:
        deny = deny | F.col("logger_name").startswith(p)
    dropped = (F.col("levelno") < WARNING_LEVELNO) & deny

    def uuid_or_null(c):
        return F.when((F.col(c) == "-") | (F.col(c) == ""),
                      F.lit(None).cast("string")) \
            .otherwise(F.col(c))

    return records.select(
        "record_id", dropped.alias("dropped"),
        F.when(~dropped, F.col("level_name")).alias("level"),
        F.when(~dropped, uuid_or_null("job_id")).alias("job_id_out"),
        F.when(~dropped, uuid_or_null("request_id"))
        .alias("request_id_out"),
        F.when(~dropped, F.lit("backend")).alias("source"))


def synth_log_records(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("record_id"),
        F.when(e % 7 == 0, "httpx.client")
        .when(e % 7 == 1, "middlewares.custom")    # un-dotted match
        .when(e % 7 == 2, "app.services.pdf")
        .when(e % 7 == 3, "anthropic")
        .otherwise(F.concat(F.lit("app.mod"), (e % 9).cast("string")))
        .alias("logger_name"),
        F.when(e % 5 == 0, 10).when(e % 5 == 1, 20)
        .when(e % 5 == 2, 30).when(e % 5 == 3, 40).otherwise(50)
        .cast("int").alias("levelno"),
        F.when(e % 5 == 0, "DEBUG").when(e % 5 == 1, "INFO")
        .when(e % 5 == 2, "WARNING").when(e % 5 == 3, "ERROR")
        .otherwise("CRITICAL").alias("level_name"),
        F.when(e % 4 == 0, "-").when(e % 4 == 1, F.lit(""))
        .when(e % 4 == 2, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("00000000-0000-0000-0000-"),
                            F.lpad((e % 999).cast("string"), 12, "0")))
        .alias("job_id"),
        F.when(e % 3 == 0, "-")
        .otherwise(F.concat(F.lit("req-"), (e % 50).cast("string")))
        .alias("request_id"))


SYNTH_LOG_RECORDS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS record_id,
           CASE event_id % 7 WHEN 0 THEN 'httpx.client'
                WHEN 1 THEN 'middlewares.custom'
                WHEN 2 THEN 'app.services.pdf'
                WHEN 3 THEN 'anthropic'
                ELSE 'app.mod' || CAST(event_id % 9 AS VARCHAR) END
               AS logger_name,
           CAST(CASE event_id % 5 WHEN 0 THEN 10 WHEN 1 THEN 20
                WHEN 2 THEN 30 WHEN 3 THEN 40 ELSE 50 END AS INT)
               AS levelno,
           CASE event_id % 5 WHEN 0 THEN 'DEBUG' WHEN 1 THEN 'INFO'
                WHEN 2 THEN 'WARNING' WHEN 3 THEN 'ERROR'
                ELSE 'CRITICAL' END AS level_name,
           CASE event_id % 4 WHEN 0 THEN '-' WHEN 1 THEN ''
                WHEN 2 THEN NULL
                ELSE '00000000-0000-0000-0000-'
                     || lpad(CAST(event_id % 999 AS VARCHAR), 12,
                             '0') END AS job_id,
           CASE WHEN event_id % 3 = 0 THEN '-'
                ELSE 'req-' || CAST(event_id % 50 AS VARCHAR) END
               AS request_id
    FROM events
"""


def log_sink_sql() -> str:
    deny = " OR ".join(
        f"logger_name LIKE '{p}%'" for p in DENY_PREFIXES)
    return f"""
        WITH r AS ({SYNTH_LOG_RECORDS_SQL}),
        g AS (SELECT *, levelno < {WARNING_LEVELNO}
                        AND ({deny}) AS dropped
              FROM r)
        SELECT record_id, dropped,
               CASE WHEN NOT dropped THEN level_name END AS level,
               CASE WHEN NOT dropped THEN
                 CASE WHEN job_id = '-' OR job_id = '' THEN NULL
                      ELSE job_id END END AS job_id_out,
               CASE WHEN NOT dropped THEN
                 CASE WHEN request_id = '-' OR request_id = ''
                      THEN NULL ELSE request_id END END
                   AS request_id_out,
               CASE WHEN NOT dropped THEN 'backend' END AS source
        FROM g
    """
