"""Module-registry folds: the enabled-flag TTL cache and the discovery
dedup.

Re-expresses ``app/modules/_core/registry.py:96-140``
(``is_module_enabled`` + ``_refresh_enabled_cache``) — the CENTRAL
fail-CLOSED toggle, in deliberate contrast to the per-route
``_module_enabled`` fail-open chokepoints already covered
(mention/job cron gates). Pinned behaviors:

- a FRESH cache answers without touching the DB;
- a refresh maps ``bool(row.get('enabled'))`` — absent and
  present-NULL both fold False, and an UNKNOWN slug is False
  (fail-closed pin);
- a failed refresh keeps the LAST cached value and extends the expiry
  (storm protection) — a never-cached slug then answers False;
- discovery keeps the FIRST module per duplicate slug (pin, mirrored
  in `job_sites_bulk_clean`-style keep-first).

Map-side when-chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def module_enabled_fold(checks: DataFrame) -> DataFrame:
    fresh = F.col("cache_fresh")
    cached = F.coalesce(F.col("cached_value"), F.lit(False))
    has_cached = F.col("cached_value").isNotNull()
    db_row = F.col("db_row_exists")
    db_val = (F.when(~db_row, F.lit(False))
              .otherwise(F.coalesce(F.col("db_enabled"),
                                    F.lit(False))))
    refreshed_ok = ~fresh & ~F.col("db_raised")
    stale = ~fresh & F.col("db_raised")
    result = (F.when(fresh, cached)
              .when(refreshed_ok, db_val)
              .when(stale & has_cached, cached)
              .otherwise(F.lit(False)))
    source = (F.when(fresh, "fresh_cache")
              .when(refreshed_ok, "refreshed")
              .when(stale & has_cached, "stale_fallback")
              .otherwise("never_cached_false"))
    return checks.select(
        "check_id",
        result.alias("enabled"),
        source.alias("source"))


def synth_module_checks(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("check_id"),
        (e % 3 == 0).alias("cache_fresh"),
        F.when(e % 5 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 2 == 0).alias("cached_value"),
        (e % 7 != 0).alias("db_row_exists"),
        F.when(e % 11 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 4 != 0).alias("db_enabled"),
        (e % 13 == 0).alias("db_raised"))


SYNTH_MODULE_CHECKS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS check_id,
           event_id % 3 = 0 AS cache_fresh,
           CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE event_id % 2 = 0 END AS cached_value,
           event_id % 7 <> 0 AS db_row_exists,
           CASE WHEN event_id % 11 = 0 THEN NULL
                ELSE event_id % 4 <> 0 END AS db_enabled,
           event_id % 13 = 0 AS db_raised
    FROM events
"""


def module_enabled_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_MODULE_CHECKS_SQL}),
        g AS (
          SELECT *,
                 coalesce(cached_value, FALSE) AS cached,
                 cached_value IS NOT NULL AS has_cached,
                 CASE WHEN NOT db_row_exists THEN FALSE
                      ELSE coalesce(db_enabled, FALSE) END AS db_val,
                 NOT cache_fresh AND NOT db_raised AS refreshed_ok,
                 NOT cache_fresh AND db_raised AS stale
          FROM r)
        SELECT check_id,
               CASE WHEN cache_fresh THEN cached
                    WHEN refreshed_ok THEN db_val
                    WHEN stale AND has_cached THEN cached
                    ELSE FALSE END AS enabled,
               CASE WHEN cache_fresh THEN 'fresh_cache'
                    WHEN refreshed_ok THEN 'refreshed'
                    WHEN stale AND has_cached THEN 'stale_fallback'
                    ELSE 'never_cached_false' END AS source
        FROM g
    """
