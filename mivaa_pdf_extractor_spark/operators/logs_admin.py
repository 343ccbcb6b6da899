"""System-logs admin folds (app/api/logs_routes.py).

Deterministic query/stat shaping over the system_logs table
(file:line):

* ``get_logs`` (:105-181): EVERY filter is truthy-gated — ``hours=0``
  disables the time cutoff entirely rather than meaning "now" (pin);
  the level filter UPPERCASES its input (a lowercase 'error' matches
  ERROR — pin); search is a case-insensitive substring (ilike
  %term%); pagination is (page-1)*size range with
  ``has_more = offset + len(page_rows) < total``.
* ``clear_logs`` (:183-214): truthy hours deletes STRICTLY OLDER
  rows; hours=None AND hours=0 both fall to the delete-ALL branch —
  a zero-hours request wipes every log (pin).
* ``get_log_stats`` (:216-259): per-level and per-logger counts with
  ABSENT-key defaults ('UNKNOWN'/'unknown' — a present-NULL level
  lands in the None bucket in Python; modeled here with NULL folds to
  the same labels, documented); top_loggers = top 10 by count
  descending (Python sort is stable — ties keep first-seen order;
  canonicalized by logger name here, documented).
* ``log_frontend_error`` (:56-103): level UPPERCASED; context merge
  stamps source='frontend' OVER any caller-supplied source key (pin);
  user_agent falls back to the request header (falsy or).

Scale: filters + pagination are one windowed scan; stats are two
groupBys (level / logger) — map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def logs_query(logs: DataFrame, *, now: int, hours: int | None,
               level: str | None = None, search: str | None = None,
               source: str | None = None, page: int = 1,
               page_size: int = 100) -> DataFrame:
    """One row per returned log + (total, has_more) stamped on each.
    ``timestamp`` is modeled as epoch seconds."""
    f = logs
    if hours:                                  # truthy gate (pin)
        f = f.where(F.col("ts") >= now - hours * 3600)
    if level:
        f = f.where(F.col("level") == level.upper())
    if search:
        f = f.where(F.lower("message").contains(search.lower()))
    if source:
        f = f.where(F.col("source") == source)
    total = f.count()
    w = Window.orderBy(F.col("ts").desc(), F.col("log_id").asc())
    offset = (page - 1) * page_size
    pg = (f.withColumn("rk", F.row_number().over(w))
          .where((F.col("rk") > offset)
                 & (F.col("rk") <= offset + page_size)))
    n_rows = pg.count()
    return pg.select(
        "log_id", "ts", "level", "logger_name",
        F.lit(total).cast("long").alias("total"),
        F.lit(offset + n_rows < total).alias("has_more"))


def logs_clear_scope(logs: DataFrame, *, now: int,
                     hours: int | None) -> DataFrame:
    """Rows that WOULD be deleted: truthy hours -> strictly older;
    None/0 -> everything (pin)."""
    if hours:
        scoped = logs.where(F.col("ts") < now - hours * 3600)
    else:
        scoped = logs
    return scoped.select("log_id")


def log_stats(logs: DataFrame, *, now: int, hours: int) -> DataFrame:
    """by_level + top-10 loggers as tagged rows."""
    f = logs.where(F.col("ts") >= now - hours * 3600)
    by_level = (f.groupBy(F.coalesce(F.col("level"), F.lit("UNKNOWN"))
                          .alias("key"))
                .agg(F.count("*").cast("long").alias("n"))
                .select(F.lit("level").alias("kind"), "key", "n"))
    by_logger = (f.groupBy(F.coalesce(F.col("logger_name"),
                                      F.lit("unknown")).alias("key"))
                 .agg(F.count("*").cast("long").alias("n")))
    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    top = (by_logger.withColumn("rk", F.row_number().over(w))
           .where(F.col("rk") <= 10)
           .select(F.lit("logger").alias("kind"), "key", "n"))
    return by_level.unionByName(top)


def frontend_log_rows(reqs: DataFrame) -> DataFrame:
    """log_frontend_error row shape."""
    return reqs.select(
        "req_id",
        F.upper("level").alias("level_out"),
        # fixed source key overrides caller context (pin)
        F.lit("frontend").alias("context_source"),
        F.coalesce(
            F.when(F.col("user_agent") != "", F.col("user_agent")),
            F.col("header_user_agent")).alias("user_agent_out"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

NOW = 1_800_000_000


def synth_system_logs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("log_id"),
        (F.lit(NOW) - (e % 200) * 3600).cast("long").alias("ts"),
        F.when(e % 11 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 0, "ERROR").when(e % 5 == 1, "WARNING")
        .when(e % 5 == 2, "INFO").when(e % 5 == 3, "DEBUG")
        .otherwise("CRITICAL").alias("level"),
        F.when(e % 13 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("app.mod"), (e % 12).cast("string")))
        .alias("logger_name"),
        F.concat(F.lit("Request FAILED for doc "),
                 (e % 40).cast("string")).alias("message"),
        F.when(e % 3 == 0, "frontend").otherwise("backend")
        .alias("source"))


SYNTH_SYSTEM_LOGS_SQL = f"""
    SELECT CAST(event_id AS BIGINT) AS log_id,
           CAST({NOW} - (event_id % 200) * 3600 AS BIGINT) AS ts,
           CASE WHEN event_id % 11 = 0 THEN NULL
                WHEN event_id % 5 = 0 THEN 'ERROR'
                WHEN event_id % 5 = 1 THEN 'WARNING'
                WHEN event_id % 5 = 2 THEN 'INFO'
                WHEN event_id % 5 = 3 THEN 'DEBUG'
                ELSE 'CRITICAL' END AS level,
           CASE WHEN event_id % 13 = 0 THEN NULL
                ELSE 'app.mod' || CAST(event_id % 12 AS VARCHAR) END
               AS logger_name,
           'Request FAILED for doc '
               || CAST(event_id % 40 AS VARCHAR) AS message,
           CASE WHEN event_id % 3 = 0 THEN 'frontend'
                ELSE 'backend' END AS source
    FROM events
"""


def logs_query_sql(*, hours: int | None, level: str | None = None,
                   search: str | None = None,
                   source: str | None = None, page: int = 1,
                   page_size: int = 100) -> str:
    conds = ["TRUE"]
    if hours:
        conds.append(f"ts >= {NOW} - {hours} * 3600")
    if level:
        conds.append(f"level = '{level.upper()}'")
    if search:
        conds.append(f"strpos(lower(message), '{search.lower()}') > 0")
    if source:
        conds.append(f"source = '{source}'")
    where = " AND ".join(conds)
    offset = (page - 1) * page_size
    return f"""
        WITH l AS ({SYNTH_SYSTEM_LOGS_SQL}),
        f AS (SELECT * FROM l WHERE {where}),
        t AS (SELECT count(*) AS total FROM f),
        r AS (SELECT *, row_number() OVER (ORDER BY ts DESC, log_id)
                     AS rk
              FROM f),
        pg AS (SELECT * FROM r
               WHERE rk > {offset} AND rk <= {offset} + {page_size}),
        n AS (SELECT count(*) AS n_rows FROM pg)
        SELECT log_id, ts, level, logger_name,
               CAST(t.total AS BIGINT) AS total,
               {offset} + n.n_rows < t.total AS has_more
        FROM pg, t, n
    """


def logs_clear_sql(*, hours: int | None) -> str:
    cond = f"ts < {NOW} - {hours} * 3600" if hours else "TRUE"
    return f"""
        WITH l AS ({SYNTH_SYSTEM_LOGS_SQL})
        SELECT log_id FROM l WHERE {cond}
    """


def log_stats_sql(*, hours: int) -> str:
    return f"""
        WITH l AS ({SYNTH_SYSTEM_LOGS_SQL}),
        f AS (SELECT * FROM l WHERE ts >= {NOW} - {hours} * 3600),
        lv AS (
          SELECT 'level' AS kind, coalesce(level, 'UNKNOWN') AS key,
                 CAST(count(*) AS BIGINT) AS n
          FROM f GROUP BY coalesce(level, 'UNKNOWN')),
        lg AS (
          SELECT coalesce(logger_name, 'unknown') AS key,
                 CAST(count(*) AS BIGINT) AS n
          FROM f GROUP BY coalesce(logger_name, 'unknown')),
        top AS (
          SELECT 'logger' AS kind, key, n,
                 row_number() OVER (ORDER BY n DESC, key) AS rk
          FROM lg)
        SELECT kind, key, n FROM lv
        UNION ALL
        SELECT kind, key, n FROM top WHERE rk <= 10
    """


def synth_frontend_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        F.when(e % 4 == 0, "error").when(e % 4 == 1, "Warning")
        .otherwise("INFO").alias("level"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("Mozilla/"), (e % 9).cast("string")))
        .alias("user_agent"),
        F.concat(F.lit("curl/"), (e % 7).cast("string"))
        .alias("header_user_agent"))


SYNTH_FRONTEND_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           CASE event_id % 4 WHEN 0 THEN 'error' WHEN 1 THEN 'Warning'
                ELSE 'INFO' END AS level,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'Mozilla/' || CAST(event_id % 9 AS VARCHAR) END
               AS user_agent,
           'curl/' || CAST(event_id % 7 AS VARCHAR)
               AS header_user_agent
    FROM events
"""


def frontend_rows_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_FRONTEND_SQL})
        SELECT req_id, upper(level) AS level_out,
               'frontend' AS context_source,
               CASE WHEN user_agent IS NOT NULL AND user_agent <> ''
                    THEN user_agent ELSE header_user_agent END
                   AS user_agent_out
        FROM r
    """
