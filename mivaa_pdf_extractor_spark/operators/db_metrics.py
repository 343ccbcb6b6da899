"""Query-performance metrics folds (app/utils/query_metrics.py).

The reference wraps every Supabase query in a timing decorator and
aggregates into a ``QueryMetrics`` singleton.  The timing itself is
runtime; the classification + rollup over a (table, operation,
execution_time_ms, error) call log is deterministic and folded here.

Pinned semantics (file:line):

* Slow-query detection is a STRICT ``>`` against the threshold
  (:88) — a query at exactly 1000.0 ms is NOT slow (pin).
* The decorator's error path still tracks the timing and stamps
  ``query_details = "ERROR: {str(e)}"`` (:181-187, :200-206) — errors
  are not excluded from any aggregate (pin).
* ``get_metrics`` (:113-143): avg/max/min query times are rounded to
  2 decimals but ``slow_query_percentage`` is NOT rounded (pin);
  ``min_query_time_ms`` is ``float('inf')`` until the first call and
  reported as the 0.0 sentinel when no queries were tracked (:131).
* Per-table metrics carry count / avg (rounded 2) / max (rounded 2) /
  slow_count — no min and no percentage at table grain (pin).
* The slow-query ring buffer keeps the last ``max_slow_queries`` = 10
  (:102-104) but ``get_metrics`` reports only ``[-5:]`` (:142) — the
  10-slot buffer is effectively a 5-slot window; slots 6-10 are
  unobservable through the API (pin).

Rounding: Python ``round(x, 2)`` is banker's (half-even) on doubles;
both engines here use ``floor(x*100 + 0.5)/100`` (half-up) so the
cross-engine hash matches bit-for-bit.  The two disagree only on exact
``.005`` ties, which have measure zero for timing sums — the deviation
is documented rather than silently absorbed.

Plans: classification is a map-side projection inside the scan's
codegen; the global rollup is a single agg (one row, map-side
combinable); per-table is one groupBy on the table key; the ring
buffer is a top-5 by arrival order over the slow subset (window over
a constant key is fine at metrics cardinality — the call log itself is
bounded by the buffer in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SLOW_THRESHOLD_MS = 1000.0
MAX_SLOW_QUERIES = 10
REPORTED_SLOW = 5


def _round2(col):
    """floor(x*100+0.5)/100 — identical bits on Spark and DuckDB."""
    return F.floor(col * 100 + F.lit(0.5)) / 100


def track_queries(calls: DataFrame,
                  threshold_ms: float = SLOW_THRESHOLD_MS) -> DataFrame:
    """Decorator fold (:168-208): per-call classification row."""
    return calls.select(
        "call_ord", "table_name", "operation", "execution_time_ms",
        (F.col("execution_time_ms") > threshold_ms).alias("is_slow"),
        F.when(F.col("error").isNotNull(),
               F.concat(F.lit("ERROR: "), F.col("error")))
        .alias("query_details"))


def query_metrics_global(calls: DataFrame,
                         threshold_ms: float = SLOW_THRESHOLD_MS
                         ) -> DataFrame:
    """get_metrics global block (:113-133)."""
    t = F.col("execution_time_ms")
    slow = (t > threshold_ms).cast("long")
    agg = calls.agg(
        F.count("*").cast("long").alias("total_queries"),
        F.coalesce(F.sum(slow), F.lit(0)).cast("long")
        .alias("slow_queries"),
        F.sum(t).alias("_total_ms"),
        F.max(t).alias("_max_ms"),
        F.min(t).alias("_min_ms"))
    n = F.col("total_queries")
    return agg.select(
        "total_queries", "slow_queries",
        F.when(n > 0, F.col("slow_queries") * 100.0 / n)
        .otherwise(0.0).alias("slow_query_percentage"),   # unrounded
        F.when(n > 0, _round2(F.col("_total_ms") / n))
        .otherwise(0.0).alias("avg_query_time_ms"),
        _round2(F.coalesce(F.col("_max_ms"), F.lit(0.0)))
        .alias("max_query_time_ms"),
        # inf-sentinel: no queries -> 0.0
        _round2(F.coalesce(F.col("_min_ms"), F.lit(0.0)))
        .alias("min_query_time_ms"),
        F.lit(threshold_ms).alias("slow_query_threshold_ms"))


def query_metrics_tables(calls: DataFrame,
                         threshold_ms: float = SLOW_THRESHOLD_MS
                         ) -> DataFrame:
    """get_metrics per-table block (:134-141): count / avg / max /
    slow_count only (no min, no percentage)."""
    t = F.col("execution_time_ms")
    return (calls.groupBy("table_name").agg(
        F.count("*").cast("long").alias("count"),
        _round2(F.sum(t) / F.count("*")).alias("avg_time_ms"),
        _round2(F.max(t)).alias("max_time_ms"),
        F.sum((t > threshold_ms).cast("long")).alias("slow_count")))


def recent_slow_queries(calls: DataFrame,
                        threshold_ms: float = SLOW_THRESHOLD_MS,
                        reported: int = REPORTED_SLOW) -> DataFrame:
    """Ring buffer (:102-104) + report slice (:142): last 5 slow
    queries by arrival order — the 10-slot buffer never surfaces."""
    slow = calls.where(F.col("execution_time_ms") > threshold_ms)
    w = Window.orderBy(F.col("call_ord").desc())
    return (slow.withColumn("recency", F.row_number().over(w))
            .where(F.col("recency") <= reported)
            .select("call_ord", "table_name", "operation",
                    "execution_time_ms",
                    F.when(F.col("error").isNotNull(),
                           F.concat(F.lit("ERROR: "), F.col("error")))
                    .alias("query_details")))


# ---------------------------------------------------------------------------
# synthesizer + DuckDB twins
# ---------------------------------------------------------------------------

def synth_query_calls(events: DataFrame) -> DataFrame:
    """Quarters-only timings (binary-exact doubles); exact-threshold
    rows exist (e % 2311 == 2000 -> exactly 1000.0 ms)."""
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("call_ord"),
        F.concat(F.lit("t"), (e % 7).cast("string")).alias("table_name"),
        F.when(e % 4 == 0, "select").when(e % 4 == 1, "insert")
        .when(e % 4 == 2, "update").otherwise("delete")
        .alias("operation"),
        ((e % 2311).cast("double") * 0.5
         + (e % 13).cast("double") * 0.25).alias("execution_time_ms"),
        F.when(e % 17 == 0, F.concat(F.lit("boom "),
                                     (e % 5).cast("string")))
        .alias("error"))


SYNTH_CALLS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS call_ord,
           't' || CAST(event_id % 7 AS VARCHAR) AS table_name,
           CASE event_id % 4 WHEN 0 THEN 'select' WHEN 1 THEN 'insert'
                WHEN 2 THEN 'update' ELSE 'delete' END AS operation,
           CAST(event_id % 2311 AS DOUBLE) * 0.5
               + CAST(event_id % 13 AS DOUBLE) * 0.25
               AS execution_time_ms,
           CASE WHEN event_id % 17 = 0
                THEN 'boom ' || CAST(event_id % 5 AS VARCHAR) END
               AS error
    FROM events
"""


def track_sql(threshold_ms: float = SLOW_THRESHOLD_MS) -> str:
    return f"""
        SELECT call_ord, table_name, operation, execution_time_ms,
               execution_time_ms > {threshold_ms} AS is_slow,
               CASE WHEN error IS NOT NULL
                    THEN 'ERROR: ' || error END AS query_details
        FROM ({SYNTH_CALLS_SQL})
    """


def global_sql(threshold_ms: float = SLOW_THRESHOLD_MS) -> str:
    return f"""
        SELECT CAST(count(*) AS BIGINT) AS total_queries,
               CAST(sum(CASE WHEN execution_time_ms > {threshold_ms}
                        THEN 1 ELSE 0 END) AS BIGINT) AS slow_queries,
               sum(CASE WHEN execution_time_ms > {threshold_ms}
                   THEN 1 ELSE 0 END) * 100.0 / count(*)
                   AS slow_query_percentage,
               floor(sum(execution_time_ms) / count(*) * 100 + 0.5)
                   / 100 AS avg_query_time_ms,
               floor(max(execution_time_ms) * 100 + 0.5) / 100
                   AS max_query_time_ms,
               floor(min(execution_time_ms) * 100 + 0.5) / 100
                   AS min_query_time_ms,
               {threshold_ms} AS slow_query_threshold_ms
        FROM ({SYNTH_CALLS_SQL})
    """


def tables_sql(threshold_ms: float = SLOW_THRESHOLD_MS) -> str:
    return f"""
        SELECT table_name, CAST(count(*) AS BIGINT) AS count,
               floor(sum(execution_time_ms) / count(*) * 100 + 0.5)
                   / 100 AS avg_time_ms,
               floor(max(execution_time_ms) * 100 + 0.5) / 100
                   AS max_time_ms,
               CAST(sum(CASE WHEN execution_time_ms > {threshold_ms}
                        THEN 1 ELSE 0 END) AS BIGINT) AS slow_count
        FROM ({SYNTH_CALLS_SQL})
        GROUP BY table_name
    """


def recent_slow_sql(threshold_ms: float = SLOW_THRESHOLD_MS,
                    reported: int = REPORTED_SLOW) -> str:
    return f"""
        WITH slow AS (
          SELECT call_ord, table_name, operation, execution_time_ms,
                 CASE WHEN error IS NOT NULL
                      THEN 'ERROR: ' || error END AS query_details,
                 row_number() OVER (ORDER BY call_ord DESC) AS recency
          FROM ({SYNTH_CALLS_SQL})
          WHERE execution_time_ms > {threshold_ms})
        SELECT call_ord, table_name, operation, execution_time_ms,
               query_details
        FROM slow WHERE recency <= {reported}
    """
