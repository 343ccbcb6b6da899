"""Runtime-limit folds: the retry backoff schedule and the vision-tier
concurrency derivation.

- ``retry_backoff_plan``     — app/utils/retry_utils.py:21-47,70-113
  (``exponential_backoff_with_jitter`` + the ``retry_async`` loop:
  deterministic no-jitter delay ``min(base * 2^attempt, max_delay)``;
  the jitter band is ±25% (0.75×–1.25×); sleeps happen only BETWEEN
  attempts, so a call that succeeds on attempt ``s`` (0-indexed) sleeps
  ``s`` times and a fully-failed call sleeps ``max_attempts - 1``
  times — the last failure re-raises without sleeping, pin)
- ``vision_concurrency_tier`` — app/config/rate_limits.py:47-137
  (tier table + ``get_vision_concurrency_limit``: an out-of-range tier
  number falls back to tier 1; tier 1 short-circuits to 10 (the Modal
  GPU special case) BEFORE the 60%-RPM formula; other tiers compute
  ``int(rpm * 0.6 / 60 * 2.0)`` truncated then clamp to [2, 20])

The backoff sum is a bounded higher-order fold over ``sequence()`` —
per-row, no shuffle; the tier fold is a pure when-chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (tier, total_spend, llm_rpm, embeddings_rpm, rerank_rpm) —
# app/config/rate_limits.py:47-82
VISION_RATE_TIERS = {
    1: (5.00, 600, 3000, 500_000),
    2: (50.00, 1800, 5000, 1_500_000),
    3: (100.00, 3000, 5000, 2_000_000),
    4: (250.00, 4500, 10_000, 3_000_000),
    5: (1000.00, 6000, 10_000, 10_000_000),
}


# ---------------------------------------------------------------------------
# retry backoff (retry_utils.py:21-47, 70-113)
# ---------------------------------------------------------------------------

def retry_backoff_plan(calls: DataFrame) -> DataFrame:
    """Per call: attempts actually made, success flag, the total
    no-jitter sleep, and the worst-case (+25% jitter) sleep bound.
    ``fail_count`` is how many leading attempts fail; base/max delays
    are exact binary fractions so the capped-doubling sum is
    FP-order-independent."""
    made = F.least(F.col("fail_count") + 1, F.col("max_attempts"))
    succeeded = F.col("fail_count") < F.col("max_attempts")
    sleeps = F.least(F.col("fail_count"), F.col("max_attempts") - 1)
    total = F.when(sleeps <= 0, F.lit(0.0)).otherwise(F.expr(
        "aggregate(transform("
        "  sequence(0, least(fail_count, max_attempts - 1) - 1),"
        "  i -> least(base_delay * power(2.0, i), max_delay)),"
        " cast(0.0 as double), (a, x) -> a + x)"))
    return calls.select(
        "call_id",
        made.cast("int").alias("attempts_made"),
        succeeded.alias("succeeded"),
        sleeps.cast("int").alias("sleep_count"),
        total.alias("total_sleep_nojitter"),
        (total * 1.25).alias("worst_case_sleep"))


def synth_retry_calls(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("call_id"),
        ((e % 4) + 1).cast("int").alias("max_attempts"),
        (e % 6).cast("int").alias("fail_count"),
        F.when(e % 3 == 0, 0.5).when(e % 3 == 1, 1.0).otherwise(2.0)
        .alias("base_delay"),
        F.when(e % 5 == 0, 4.0).otherwise(60.0).alias("max_delay"))


SYNTH_RETRY_CALLS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS call_id,
           CAST(event_id % 4 + 1 AS INT) AS max_attempts,
           CAST(event_id % 6 AS INT) AS fail_count,
           CASE WHEN event_id % 3 = 0 THEN 0.5
                WHEN event_id % 3 = 1 THEN 1.0
                ELSE 2.0 END AS base_delay,
           CASE WHEN event_id % 5 = 0 THEN 4.0
                ELSE 60.0 END AS max_delay
    FROM events
"""


def retry_plan_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_RETRY_CALLS_SQL}),
        g AS (
          SELECT *,
                 least(fail_count, max_attempts - 1) AS sleeps
          FROM r),
        s AS (
          SELECT *,
                 CASE WHEN sleeps <= 0 THEN 0.0
                      ELSE list_sum(list_transform(
                               generate_series(0, sleeps - 1),
                               i -> least(base_delay * power(2.0, i),
                                          max_delay)))
                 END AS total
          FROM g)
        SELECT call_id,
               CAST(least(fail_count + 1, max_attempts) AS INT)
                   AS attempts_made,
               fail_count < max_attempts AS succeeded,
               CAST(sleeps AS INT) AS sleep_count,
               total AS total_sleep_nojitter,
               total * 1.25 AS worst_case_sleep
        FROM s
    """


# ---------------------------------------------------------------------------
# vision tier concurrency (rate_limits.py:47-137)
# ---------------------------------------------------------------------------

def vision_concurrency_tier(envs: DataFrame) -> DataFrame:
    """Tier resolution + concurrency: out-of-range tier → 1; tier 1
    short-circuits to concurrency 10 BEFORE the formula; others
    truncate ``int(rpm*0.6/60*2)`` then clamp [2, 20]."""
    t = F.col("env_tier")
    resolved = F.when(t.isin(*VISION_RATE_TIERS.keys()), t).otherwise(1)
    rpm = F.when(resolved == 1, 600).when(resolved == 2, 1800) \
        .when(resolved == 3, 3000).when(resolved == 4, 4500) \
        .otherwise(6000)
    formula = F.floor(rpm * 0.6 / 60.0 * 2.0).cast("int")
    conc = (F.when(resolved == 1, 10)
            .otherwise(F.greatest(F.lit(2),
                                  F.least(F.lit(20), formula))))
    return envs.select(
        "probe_id",
        resolved.cast("int").alias("resolved_tier"),
        rpm.cast("int").alias("llm_rpm"),
        (rpm / 60.0).alias("llm_rps"),
        conc.cast("int").alias("concurrency"))


def synth_tier_envs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("probe_id"),
        (e % 9).cast("int").alias("env_tier"))


SYNTH_TIER_ENVS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS probe_id,
           CAST(event_id % 9 AS INT) AS env_tier
    FROM events
"""


def tier_concurrency_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_TIER_ENVS_SQL}),
        g AS (
          SELECT *,
                 CASE WHEN env_tier BETWEEN 1 AND 5 THEN env_tier
                      ELSE 1 END AS resolved
          FROM r),
        h AS (
          SELECT *,
                 CASE resolved WHEN 1 THEN 600 WHEN 2 THEN 1800
                      WHEN 3 THEN 3000 WHEN 4 THEN 4500
                      ELSE 6000 END AS rpm
          FROM g)
        SELECT probe_id,
               CAST(resolved AS INT) AS resolved_tier,
               CAST(rpm AS INT) AS llm_rpm,
               rpm / 60.0 AS llm_rps,
               CAST(CASE WHEN resolved = 1 THEN 10
                    ELSE greatest(2, least(20,
                         CAST(floor(rpm * 0.6 / 60.0 * 2.0) AS INT)))
                    END AS INT) AS concurrency
        FROM h
    """
