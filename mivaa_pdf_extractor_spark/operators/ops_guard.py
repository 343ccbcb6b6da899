"""Pipeline-guard utility folds (app/utils/timeout_guard.py +
app/utils/retry_helper.py) as native Spark projections — psutil
sampling and asyncio sleeping are runtime effects; the deterministic
formulas around them are reproduced:

- memory multiplier tiers (timeout_guard.py:16-71): <60% → 1.0,
  <80% → 1.5, <90% → 2.0, else 3.0; a failed psutil probe falls back
  to 1.0 (pin); the adjusted timeout is base × multiplier;
- progressive stage timeouts (:217-359): pdf_extraction = 30·pages
  (+5·(pages−50) beyond 50) + 3·file_mb, cap 3600;
  product_discovery = 60 + pages/10·30 + 30·len(categories), cap 600;
  chunking = 60 + pages/10·15, cap 600; image_processing =
  images·60/concurrency·1.2, cap 1800; unknown stage falls back to
  FULL_PIPELINE=1800 (pin); float op ORDER is kept identical in both
  engines so results are bit-equal;
- retry schedule (retry_helper.py:23-100): attempts run 0..max_retries
  (max_retries+1 calls); a sleep happens after every failed attempt
  with attempt < max_retries; delay_i = min(initial·mult^i, max_delay)
  — the CAPPED value feeds the next multiplication? No: the reference
  multiplies the PREVIOUS (already-capped) delay (delay =
  min(delay·mult, max) each round, seeded with initial and the FIRST
  sleep uses the uncapped initial as-is — pin);
- error classification (:102-178): lowercase substring banks — DNS
  tier first, then connection tier; should_retry = dns OR connection
  OR an httpx network type (modeled as a verdict flag).

Scale: all map-side; the retry schedule folds its ≤(max_retries) sleeps
with an array aggregate, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

FULL_PIPELINE = 1800.0

DNS_INDICATORS = (
    "temporary failure in name resolution", "errno -3", "[errno -3]",
    "name resolution", "dns", "getaddrinfo failed",
)
CONNECTION_INDICATORS = (
    "connection", "timeout", "timed out", "connect", "refused", "reset",
    "broken pipe",
)


def _mem_multiplier() -> Column:
    p = F.col("mem_percent")
    return F.when(F.col("mem_probe_fails"), F.lit(1.0)) \
        .when(p < 60, F.lit(1.0)).when(p < 80, F.lit(1.5)) \
        .when(p < 90, F.lit(2.0)).otherwise(F.lit(3.0))


def stage_timeouts(jobs: DataFrame) -> DataFrame:
    """ProgressiveTimeoutStrategy.calculate_stage_timeout +
    get_memory_aware_timeout."""
    pages = F.col("page_count").cast("double")
    pdf = F.least(
        pages * 30
        + F.when(F.col("page_count") > 50,
                 (pages - 50) * 5).otherwise(F.lit(0.0))
        + F.col("file_size_mb") * 3,
        F.lit(3600.0))
    disc = F.least(F.lit(60.0) + pages / 10 * 30
                   + F.col("categories_n").cast("double") * 30,
                   F.lit(600.0))
    chunk = F.least(F.lit(60.0) + pages / 10 * 15, F.lit(600.0))
    img = F.least(F.col("image_count").cast("double") * 60
                  / F.col("concurrent_limit") * 1.2, F.lit(1800.0))
    raw = (F.when(F.col("stage") == "pdf_extraction", pdf)
           .when(F.col("stage") == "product_discovery", disc)
           .when(F.col("stage") == "chunking", chunk)
           .when(F.col("stage") == "image_processing", img)
           .otherwise(F.lit(FULL_PIPELINE)))
    mult = _mem_multiplier()
    return jobs.select(
        "job_id", "stage", mult.alias("memory_multiplier"),
        raw.alias("stage_timeout"),
        (raw * mult).alias("adjusted_timeout"))


def retry_schedule(calls: DataFrame) -> DataFrame:
    """async_retry_with_backoff's sleep schedule (:23-100). The running
    delay is seeded with initial_delay (first sleep uncapped), then
    delay = min(delay·mult, max_delay) each round."""
    f = F.col("fail_count")
    mr = F.col("max_retries")
    sleeps = F.least(f, mr)
    # delays[0] = initial; delays[i] = min(delays[i-1]*mult, max)
    idx = F.when(sleeps > 0, F.sequence(F.lit(1), sleeps)) \
        .otherwise(F.array().cast("array<int>"))
    total = F.aggregate(
        idx,
        F.struct(F.lit(0.0).alias("sum"),
                 F.col("initial_delay").alias("d")),
        lambda acc, _: F.struct(
            (acc["sum"] + acc["d"]).alias("sum"),
            F.least(acc["d"] * F.col("multiplier"),
                    F.col("max_delay")).alias("d")),
        lambda acc: acc["sum"])
    success = f <= mr
    return calls.select(
        "call_id",
        F.when(success, F.lit("success")).otherwise(F.lit("exhausted"))
        .alias("outcome"),
        F.when(success, f + 1).otherwise(mr + 1).cast("int")
        .alias("attempts_made"),
        sleeps.cast("int").alias("sleeps"),
        total.alias("total_sleep_s"))


def classify_errors(errors: DataFrame) -> DataFrame:
    """is_dns_error / is_connection_error / should_retry_exception
    (:102-178)."""
    low = F.lower(F.col("error_text"))

    def _any(bank) -> Column:
        cond = F.lit(False)
        for s in bank:
            cond = cond | low.contains(F.lit(s))
        return cond

    dns = _any(DNS_INDICATORS)
    conn = _any(CONNECTION_INDICATORS)
    retry = dns | conn | F.col("is_httpx_network_type")
    return errors.select(
        "error_id", dns.cast("int").alias("is_dns"),
        conn.cast("int").alias("is_connection"),
        retry.cast("int").alias("should_retry"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

STAGES = ("pdf_extraction", "product_discovery", "chunking",
          "image_processing", "unknown_stage")

ERROR_BANK = (
    "[Errno -3] Temporary failure in name resolution",
    "Connection refused by host",
    "Read timed out after 30s",
    "Broken pipe during write",
    "ValueError: invalid literal",
    "getaddrinfo failed for host",
    "DNS lookup exploded",
    "pool TIMEOUT exceeded",
    "database is locked",
    "peer RESET the stream",
    "could not CONNECT to upstream",
    "JSONDecodeError: Expecting value",
)


def synth_timeout_jobs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    st = F.lit(STAGES[0])
    for i, s in enumerate(STAGES[1:], 1):
        st = F.when(e % 5 == i, F.lit(s)).otherwise(st)
    return events.select(
        e.alias("job_id"), st.alias("stage"),
        (e % 120).cast("int").alias("page_count"),
        (e % 40).cast("int").alias("image_count"),
        ((e % 80).cast("double")
         + (e % 2).cast("double") / 2).alias("file_size_mb"),
        (1 + e % 4).cast("int").alias("categories_n"),
        (1 + e % 8).cast("int").alias("concurrent_limit"),
        ((e * 7) % 110).cast("double").alias("mem_percent"),
        ((e * 11) % 13 == 0).alias("mem_probe_fails"))


def synth_retry_calls(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    init = (F.when(e % 3 == 0, F.lit(0.5))
            .when(e % 3 == 1, F.lit(1.0)).otherwise(F.lit(2.0)))
    mult = (F.when((e * 3) % 3 == 0, F.lit(1.5))
            .when((e * 3) % 3 == 1, F.lit(2.0)).otherwise(F.lit(3.0)))
    maxd = F.when((e * 5) % 2 == 0, F.lit(4.0)).otherwise(F.lit(10.0))
    return events.select(
        e.alias("call_id"), (e % 6).cast("int").alias("fail_count"),
        (1 + e % 4).cast("int").alias("max_retries"),
        init.alias("initial_delay"), mult.alias("multiplier"),
        maxd.alias("max_delay"))


def synth_errors(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    txt = F.lit(ERROR_BANK[0])
    for i, s in enumerate(ERROR_BANK[1:], 1):
        txt = F.when(e % len(ERROR_BANK) == i, F.lit(s)).otherwise(txt)
    return events.select(
        e.alias("error_id"), txt.alias("error_text"),
        ((e * 7) % 9 == 0).alias("is_httpx_network_type"))


SYNTH_TIMEOUT_JOBS_SQL = """
    SELECT event_id AS job_id,
           CASE event_id % 5 WHEN 1 THEN 'product_discovery'
                WHEN 2 THEN 'chunking' WHEN 3 THEN 'image_processing'
                WHEN 4 THEN 'unknown_stage'
                ELSE 'pdf_extraction' END AS stage,
           CAST(event_id % 120 AS INT) AS page_count,
           CAST(event_id % 40 AS INT) AS image_count,
           CAST(event_id % 80 AS DOUBLE)
               + CAST(event_id % 2 AS DOUBLE) / 2 AS file_size_mb,
           CAST(1 + event_id % 4 AS INT) AS categories_n,
           CAST(1 + event_id % 8 AS INT) AS concurrent_limit,
           CAST((event_id * 7) % 110 AS DOUBLE) AS mem_percent,
           (event_id * 11) % 13 = 0 AS mem_probe_fails
    FROM events
"""

SYNTH_RETRY_CALLS_SQL = """
    SELECT event_id AS call_id,
           CAST(event_id % 6 AS INT) AS fail_count,
           CAST(1 + event_id % 4 AS INT) AS max_retries,
           CAST(CASE event_id % 3 WHEN 0 THEN 0.5 WHEN 1 THEN 1.0
                ELSE 2.0 END AS DOUBLE) AS initial_delay,
           CAST(CASE (event_id * 3) % 3 WHEN 0 THEN 1.5 WHEN 1 THEN 2.0
                ELSE 3.0 END AS DOUBLE) AS multiplier,
           CAST(CASE WHEN (event_id * 5) % 2 = 0 THEN 4.0
                ELSE 10.0 END AS DOUBLE) AS max_delay
    FROM events
"""


def _errors_case() -> str:
    arms = " ".join(
        f"WHEN {i} THEN '{s.replace(chr(39), chr(39) * 2)}'"
        for i, s in enumerate(ERROR_BANK))
    return f"CASE event_id % {len(ERROR_BANK)} {arms} END"


SYNTH_ERRORS_SQL = f"""
    SELECT event_id AS error_id,
           {_errors_case()} AS error_text,
           (event_id * 7) % 9 = 0 AS is_httpx_network_type
    FROM events
"""


def stage_timeouts_sql() -> str:
    return f"""
        WITH j AS ({SYNTH_TIMEOUT_JOBS_SQL}),
        m AS (
          SELECT *,
                 CASE WHEN mem_probe_fails THEN 1.0
                      WHEN mem_percent < 60 THEN 1.0
                      WHEN mem_percent < 80 THEN 1.5
                      WHEN mem_percent < 90 THEN 2.0
                      ELSE 3.0 END AS memory_multiplier,
                 CASE stage
                      WHEN 'pdf_extraction' THEN least(
                          CAST(page_count AS DOUBLE) * 30
                          + CASE WHEN page_count > 50
                                 THEN (CAST(page_count AS DOUBLE) - 50)
                                      * 5 ELSE 0.0 END
                          + file_size_mb * 3, 3600.0)
                      WHEN 'product_discovery' THEN least(
                          60.0 + CAST(page_count AS DOUBLE) / 10 * 30
                          + CAST(categories_n AS DOUBLE) * 30, 600.0)
                      WHEN 'chunking' THEN least(
                          60.0 + CAST(page_count AS DOUBLE) / 10 * 15,
                          600.0)
                      WHEN 'image_processing' THEN least(
                          CAST(image_count AS DOUBLE) * 60
                          / concurrent_limit * 1.2, 1800.0)
                      ELSE {FULL_PIPELINE} END AS stage_timeout
          FROM j)
        SELECT job_id, stage, memory_multiplier, stage_timeout,
               stage_timeout * memory_multiplier AS adjusted_timeout
        FROM m
    """


def retry_schedule_sql() -> str:
    # the running delay is capped AFTER each multiply; the first sleep
    # uses the raw initial_delay. The twin folds the SAME iterative
    # double chain as the Spark aggregate (recursive CTE) — a closed
    # form via power() could diverge by an ulp cross-engine.
    return f"""
        WITH RECURSIVE c AS ({SYNTH_RETRY_CALLS_SQL}),
        s AS (
          SELECT *, least(fail_count, max_retries) AS sleeps FROM c),
        chain AS (
          SELECT call_id, 0 AS i, initial_delay AS d,
                 CAST(0.0 AS DOUBLE) AS acc, sleeps, multiplier,
                 max_delay
          FROM s
          UNION ALL
          SELECT call_id, i + 1, least(d * multiplier, max_delay),
                 acc + d, sleeps, multiplier, max_delay
          FROM chain WHERE i < sleeps)
        SELECT s.call_id,
               CASE WHEN fail_count <= max_retries THEN 'success'
                    ELSE 'exhausted' END AS outcome,
               CAST(CASE WHEN fail_count <= max_retries
                         THEN fail_count + 1
                         ELSE max_retries + 1 END AS INT)
                   AS attempts_made,
               CAST(s.sleeps AS INT) AS sleeps,
               ch.acc AS total_sleep_s
        FROM s JOIN chain ch
          ON ch.call_id = s.call_id AND ch.i = s.sleeps
    """


def classify_errors_sql() -> str:
    def _any(bank):
        return " OR ".join(
            f"contains(lower(error_text), '{s}')" for s in bank)

    return f"""
        WITH e AS ({SYNTH_ERRORS_SQL})
        SELECT error_id,
               CAST({_any(DNS_INDICATORS)} AS INT) AS is_dns,
               CAST({_any(CONNECTION_INDICATORS)} AS INT)
                   AS is_connection,
               CAST({_any(DNS_INDICATORS)} OR
                    {_any(CONNECTION_INDICATORS)}
                    OR is_httpx_network_type AS INT) AS should_retry
        FROM e
    """


# ---------------------------------------------------------------------------
# Platform-secret resolution ladder
# (app/services/integrations/platform_secret_resolver.py:73-94)
# ---------------------------------------------------------------------------

def resolve_secrets(rows: DataFrame) -> DataFrame:
    """Env-first, DB-fallback ladder: each rung requires the value
    BOTH truthy and strip-truthy — a whitespace-only env var falls
    through to the DB value, and a whitespace-only DB value falls to
    the default (pin); all empty -> source 'missing' with NULL value.
    require_secret raises on missing (modeled as the would_raise
    flag)."""
    from pyspark.sql import functions as F

    def live(c):
        return c.isNotNull() & (F.trim(c) != "")

    env, db, dflt = F.col("env_val"), F.col("db_val"), F.col("default_val")
    res = (F.when(live(env), F.struct(env.alias("value"),
                                      F.lit("env").alias("source")))
           .when(live(db), F.struct(db.alias("value"),
                                    F.lit("db").alias("source")))
           .when(live(dflt), F.struct(dflt.alias("value"),
                                      F.lit("default").alias("source")))
           .otherwise(F.struct(F.lit(None).cast("string").alias("value"),
                               F.lit("missing").alias("source"))))
    return rows.select(
        "key", res.getField("value").alias("value"),
        res.getField("source").alias("source"),
        res.getField("value").isNull().alias("would_raise"))


def synth_secret_rows(events: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F
    e = F.col("event_id")

    def v(base, null_mod, ws_mod):
        return (F.when(e % null_mod == 0, F.lit(None).cast("string"))
                .when(e % ws_mod == 1, F.lit("   "))
                .otherwise(F.concat(F.lit(base), (e % 40).cast("string"))))

    return events.select(
        F.concat(F.lit("KEY_"), (e % 60).cast("string")).alias("key"),
        v("env-", 3, 5).alias("env_val"),
        v("db-", 4, 7).alias("db_val"),
        v("def-", 5, 9).alias("default_val"))


SYNTH_SECRET_ROWS_SQL = """
    SELECT 'KEY_' || CAST(event_id % 60 AS VARCHAR) AS key,
           CASE WHEN event_id % 3 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN '   '
                ELSE 'env-' || CAST(event_id % 40 AS VARCHAR) END
               AS env_val,
           CASE WHEN event_id % 4 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN '   '
                ELSE 'db-' || CAST(event_id % 40 AS VARCHAR) END
               AS db_val,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 9 = 1 THEN '   '
                ELSE 'def-' || CAST(event_id % 40 AS VARCHAR) END
               AS default_val
    FROM events
"""


def resolve_secrets_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_SECRET_ROWS_SQL}),
        g AS (
          SELECT *,
                 env_val IS NOT NULL AND trim(env_val) <> ''
                     AS env_live,
                 db_val IS NOT NULL AND trim(db_val) <> '' AS db_live,
                 default_val IS NOT NULL AND trim(default_val) <> ''
                     AS def_live
          FROM r)
        SELECT key,
               CASE WHEN env_live THEN env_val
                    WHEN db_live THEN db_val
                    WHEN def_live THEN default_val END AS value,
               CASE WHEN env_live THEN 'env'
                    WHEN db_live THEN 'db'
                    WHEN def_live THEN 'default'
                    ELSE 'missing' END AS source,
               NOT (env_live OR db_live OR def_live) AS would_raise
        FROM g
    """
