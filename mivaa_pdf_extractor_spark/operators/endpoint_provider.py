"""Endpoint-provider folds: URL resolution, auth-header gate, and the
resume state fold.

Re-expresses ``app/services/pdf/endpoint_providers.py`` (the Modal
lifecycle provider; network probes themselves are stubbed — the fold
pins the DECISIONS):

- ``endpoint_provider_fold`` — endpoint_providers.py:92-104,150-210,225-237
  (factory URL ladder ``modal_url or endpoint_url`` — '' falls
  through — then ``strip().rstrip('/')`` strips ALL trailing slashes;
  the health URL appends ``/health`` UNLESS the base already ENDS
  WITH it (no doubling, pin); an empty token means NO Authorization
  header at all, not an empty Bearer (pin); ``resume_if_needed``:
  warm + healthy skips the probe, warm + UNhealthy flips cold and
  re-warms, cold warms — ready mirrors the warmup probe outcome)

Map-side when-chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEALTH_PATH = "/health"


def endpoint_provider_fold(rows: DataFrame) -> DataFrame:
    raw = F.coalesce(F.nullif(F.col("modal_url"), F.lit("")),
                     F.col("endpoint_url"), F.lit(""))
    base = F.regexp_replace(F.trim(raw), "/+$", "")
    no_base = base == ""
    health_url = F.when(no_base, F.lit(None).cast("string")) \
        .when(base.endswith(HEALTH_PATH), base) \
        .otherwise(F.concat(base, F.lit(HEALTH_PATH)))
    has_auth = (F.col("token").isNotNull() & (F.col("token") != ""))
    warm = F.col("warmup_completed")
    skip_probe = warm & F.col("health_ok")
    # cold path (or warm-but-unhealthy): the warmup probe decides
    probe_ready = ~no_base & F.col("warm_probe_ok")
    ready = F.when(skip_probe, F.lit(True)).otherwise(probe_ready)
    return rows.select(
        "row_id",
        base.alias("base_url"),
        health_url.alias("health_url"),
        has_auth.alias("has_auth_header"),
        ready.alias("ready"),
        (~skip_probe).alias("probed"),
        (warm & ~F.col("health_ok")).alias("flipped_cold"))


def synth_provider_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("row_id"),
        F.when(e % 5 == 0, F.lit(""))
        .when(e % 5 == 1, F.lit(None).cast("string"))
        .when(e % 5 == 2, F.lit(" https://app.modal.run/api/ "))
        .when(e % 5 == 3, F.lit("https://app.modal.run/health"))
        .otherwise(F.lit("https://app.modal.run///"))
        .alias("modal_url"),
        F.when(e % 3 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("https://fallback"),
                            (e % 4).cast("string"),
                            F.lit(".example.run"))).alias("endpoint_url"),
        F.when(e % 4 == 0, F.lit(None).cast("string"))
        .when(e % 4 == 1, F.lit(""))
        .otherwise(F.lit("tok")).alias("token"),
        (e % 2 == 0).alias("warmup_completed"),
        (e % 7 != 0).alias("health_ok"),
        (e % 11 != 0).alias("warm_probe_ok"))


SYNTH_PROVIDER_ROWS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS row_id,
           CASE WHEN event_id % 5 = 0 THEN ''
                WHEN event_id % 5 = 1 THEN NULL
                WHEN event_id % 5 = 2
                THEN ' https://app.modal.run/api/ '
                WHEN event_id % 5 = 3
                THEN 'https://app.modal.run/health'
                ELSE 'https://app.modal.run///' END AS modal_url,
           CASE WHEN event_id % 3 = 0 THEN ''
                ELSE 'https://fallback'
                     || CAST(event_id % 4 AS VARCHAR)
                     || '.example.run' END AS endpoint_url,
           CASE WHEN event_id % 4 = 0 THEN NULL
                WHEN event_id % 4 = 1 THEN ''
                ELSE 'tok' END AS token,
           event_id % 2 = 0 AS warmup_completed,
           event_id % 7 <> 0 AS health_ok,
           event_id % 11 <> 0 AS warm_probe_ok
    FROM events
"""


def provider_fold_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_PROVIDER_ROWS_SQL}),
        g AS (
          SELECT *,
                 regexp_replace(trim(coalesce(nullif(modal_url, ''),
                                              endpoint_url, '')),
                                '/+$', '') AS base
          FROM r),
        h AS (
          SELECT *,
                 base = '' AS no_base,
                 warmup_completed AND health_ok AS skip_probe
          FROM g)
        SELECT row_id,
               base AS base_url,
               CASE WHEN no_base THEN NULL
                    WHEN suffix(base, '{HEALTH_PATH}') THEN base
                    ELSE base || '{HEALTH_PATH}' END AS health_url,
               token IS NOT NULL AND token <> '' AS has_auth_header,
               CASE WHEN skip_probe THEN TRUE
                    ELSE NOT no_base AND warm_probe_ok END AS ready,
               NOT skip_probe AS probed,
               warmup_completed AND NOT health_ok AS flipped_cold
        FROM h
    """
