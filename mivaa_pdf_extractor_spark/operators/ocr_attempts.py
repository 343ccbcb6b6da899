"""PaddleOCR structural-pass attempt ladder + GPU-seconds billing.

Reference: ``app/services/pdf/paddleocr_endpoint_manager.py`` —

- ``run_structural_pass`` (:234-395), _MAX_ATTEMPTS = 3 (:128):
  * disabled endpoint / failed resume abort before any attempt
    (:260-263);
  * an HTTP error with status 401/403/404 is a CONFIG error — fail
    fast, no retry (:276-306); other HTTP errors retry with backoff
    and raise after the 3rd;
  * a missing ``regions`` KEY retries (``failed_no_regions``); a
    present-but-parsed-to-zero list retries
    (``failed_all_regions_dropped``); but a literal ``{"regions":
    []}`` — raw key present and EMPTY — falls through to SUCCESS with
    region_count 0 (:312-341, the blank-page-vs-hiccup distinction,
    deliberately NOT retried at this layer);
  * success on attempt 1 is ``success``, later ``success_after_retry``
    (:365-372);
  * every consumed attempt emits one paddleocr_metrics row
    (region_count NULL on HTTP errors, 0 on response errors) and one
    GPU-cost row — failures bill exactly like successes (:42-66).
- ``ai_pricing.calculate_time_based_cost`` (ai_pricing.py:713-768,
  PADDLEOCR_PRICING :240-252): secs = max(latency_ms/1000, 0.001),
  raw = billed = secs * (1.00 / 3600) (no markup for self-hosted GPU
  endpoints), credits = billed * 100.

The ladder is bounded (3 attempts) so the fold unrolls into Column
logic — no recursion, no UDFs; one narrow shuffle per groupBy(call).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAX_ATTEMPTS = 3                     # :128
CONFIG_STATUSES = (401, 403, 404)    # :279
GPU_HOURLY_USD = 1.0                 # ai_pricing.py:245
MIN_BILLED_SECONDS = 0.001           # :76 (max(latency/1000, 0.001))


def _attempt_class():
    """Per-attempt event class from the synth columns."""
    return (
        F.when(F.col("http_status").isNotNull(),
               F.when(F.col("http_status").isin(*CONFIG_STATUSES),
                      F.lit("config")).otherwise(F.lit("http")))
        .when(F.col("raw_region_count").isNull(), F.lit("no_regions"))
        .when((F.col("raw_region_count") > 0)
              & (F.col("parsed_region_count") == 0),
              F.lit("dropped"))
        .otherwise(F.lit("success")))


def _with_ladder(attempts: DataFrame) -> DataFrame:
    """Stamp class + the call's first terminal attempt index."""
    cls = attempts.withColumn("cls", _attempt_class())
    term = (cls.where(F.col("cls").isin("success", "config"))
            .groupBy("call_id")
            .agg(F.min("attempt_idx").alias("term_idx")))
    j = cls.join(term, "call_id", "left")
    first_term = F.least(F.coalesce(F.col("term_idx"),
                                    F.lit(MAX_ATTEMPTS)),
                         F.lit(MAX_ATTEMPTS))
    return j.withColumn("first_term", first_term) \
            .withColumn("consumed",
                        F.col("attempt_idx") <= F.col("first_term"))


def attempt_metrics(attempts: DataFrame) -> DataFrame:
    """``attempts``: one row per (call_id long, attempt_idx 1..3) with
    (enabled boolean, resume_ok boolean, http_status int?,
    raw_region_count int?, parsed_region_count int, chars_count int,
    latency_ms int). Pre-gated calls (disabled / resume failure) emit
    nothing. Returns the paddleocr_metrics rows for every CONSUMED
    attempt with the reference's outcome labels."""
    live = attempts.where(F.col("enabled") & F.col("resume_ok"))
    j = _with_ladder(live).where(F.col("consumed"))
    success = F.col("cls") == "success"
    outcome = (
        F.when(F.col("cls") == "config", F.lit("failed_config_error"))
        .when(F.col("cls") == "http", F.lit("failed_http_error"))
        .when(F.col("cls") == "no_regions",
              F.lit("failed_no_regions"))
        .when(F.col("cls") == "dropped",
              F.lit("failed_all_regions_dropped"))
        .when(success & (F.col("attempt_idx") == 1), F.lit("success"))
        .otherwise(F.lit("success_after_retry")))
    region_count = (
        F.when(F.col("cls").isin("http", "config"),
               F.lit(None).cast("int"))
        .when(F.col("cls").isin("no_regions", "dropped"), F.lit(0))
        .otherwise(F.col("parsed_region_count")))
    chars = (
        F.when(F.col("cls").isin("http", "config"),
               F.lit(None).cast("int"))
        .when(F.col("cls").isin("no_regions", "dropped"), F.lit(0))
        .otherwise(F.col("chars_count")))
    return j.select(
        "call_id",
        F.col("attempt_idx").alias("attempt_number"),
        outcome.alias("outcome"),
        region_count.alias("region_count"),
        chars.alias("chars_count"),
        "latency_ms")


def call_summary(attempts: DataFrame) -> DataFrame:
    """Call-level verdict: disabled / resume_failed pre-gates, else
    the first-terminal class mapped to success / config_error /
    http_error_exhausted / response_error_exhausted, plus
    attempts_made (= the consumed count)."""
    gated = (attempts.where(~(F.col("enabled") & F.col("resume_ok")))
             .groupBy("call_id")
             .agg(F.first("enabled").alias("en"))
             .select("call_id",
                     F.when(~F.col("en"), F.lit("disabled"))
                     .otherwise(F.lit("resume_failed"))
                     .alias("final_status"),
                     F.lit(0).alias("attempts_made")))
    live = attempts.where(F.col("enabled") & F.col("resume_ok"))
    j = _with_ladder(live).where(
        F.col("attempt_idx") == F.col("first_term"))
    status = (
        F.when(F.col("cls") == "success", F.lit("success"))
        .when(F.col("cls") == "config", F.lit("config_error"))
        .when(F.col("cls") == "http", F.lit("http_error_exhausted"))
        .otherwise(F.lit("response_error_exhausted")))
    live_out = j.select("call_id", status.alias("final_status"),
                        F.col("first_term").cast("int")
                        .alias("attempts_made"))
    return live_out.unionByName(gated)


def gpu_cost_rows(attempts: DataFrame) -> DataFrame:
    """One ai_usage_logs row per consumed attempt — failures bill like
    successes (endpoint_manager.py:42-66 + ai_pricing.py:713-768)."""
    m = attempt_metrics(attempts)
    secs = F.greatest(F.col("latency_ms") / F.lit(1000.0),
                      F.lit(MIN_BILLED_SECONDS))
    billed = secs * F.lit(GPU_HOURLY_USD) / F.lit(3600.0)
    return m.select(
        "call_id", "attempt_number",
        F.lit("pdf_structural_pass").alias("operation_type"),
        F.lit("paddleocr-vl").alias("model_name"),
        billed.alias("raw_cost_usd"),
        billed.alias("billed_cost_usd"),
        F.lit(1.0).alias("markup_multiplier"),
        (billed * 100).alias("credits_to_debit"),
        F.col("outcome"),
        "latency_ms",
        F.lit(GPU_HOURLY_USD).alias("gpu_hourly_usd"))


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

def synth_attempts(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = d.select("doc", F.explode(F.sequence(
        F.lit(1), F.lit(MAX_ATTEMPTS))).alias("attempt_idx"))
    g = F.col("doc") * 97 + F.col("attempt_idx")
    http_err = g % 7 == 0
    status = F.element_at(F.array(*[F.lit(s) for s in (
        500, 429, 401, 503, 403, 404)]), (g % 6 + 1).cast("int"))
    raw = (F.when(g % 5 == 0, F.lit(None).cast("int"))
           .when(g % 5 == 1, F.lit(0))
           .otherwise((g % 11 + 1).cast("int")))
    parsed = (F.when(raw.isNull() | (raw == 0), F.lit(0))
              .when(g % 4 == 0, F.lit(0))
              .otherwise((g % 9 + 1).cast("int")))
    return rows.select(
        F.col("doc").alias("call_id"),
        F.col("attempt_idx").cast("int").alias("attempt_idx"),
        (F.col("doc") % 29 != 0).alias("enabled"),
        (F.col("doc") % 31 != 0).alias("resume_ok"),
        F.when(http_err, status).cast("int").alias("http_status"),
        F.when(~http_err, raw).alias("raw_region_count"),
        F.when(~http_err, parsed).otherwise(F.lit(0))
        .alias("parsed_region_count"),
        F.when(~http_err & (raw > 0) & (parsed > 0),
               parsed * 37 + (g % 50).cast("int"))
        .otherwise(F.lit(0)).cast("int").alias("chars_count"),
        ((g % 3000) + 20).cast("int").alias("latency_ms"))


DUCK_ATTEMPTS_SQL = """
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
oatt AS (
  SELECT doc AS call_id, CAST(a AS INT) AS attempt_idx,
         doc % 29 != 0 AS enabled,
         doc % 31 != 0 AS resume_ok,
         CASE WHEN (doc*97 + a) % 7 = 0 THEN
           ([500,429,401,503,403,404])
             [CAST((doc*97 + a) % 6 AS INT) + 1] END AS http_status,
         CASE WHEN (doc*97 + a) % 7 != 0 THEN
           CASE WHEN (doc*97 + a) % 5 = 0 THEN NULL
                WHEN (doc*97 + a) % 5 = 1 THEN 0
                ELSE CAST((doc*97 + a) % 11 + 1 AS INT) END
         END AS raw_region_count,
         CASE WHEN (doc*97 + a) % 7 != 0 THEN
           CASE WHEN (doc*97 + a) % 5 = 0
                     OR (doc*97 + a) % 5 = 1 THEN 0
                WHEN (doc*97 + a) % 4 = 0 THEN 0
                ELSE CAST((doc*97 + a) % 9 + 1 AS INT) END
         ELSE 0 END AS parsed_region_count,
         (doc*97 + a) % 3000 + 20 AS latency_ms,
         doc*97 + a AS g
  FROM docs, (SELECT unnest(generate_series(1, 3)) AS a)),
oatt2 AS (
  SELECT *, CASE WHEN http_status IS NULL
                  AND raw_region_count IS NOT NULL
                  AND raw_region_count > 0
                  AND parsed_region_count > 0
             THEN parsed_region_count * 37
                  + CAST(g % 50 AS INT) ELSE 0 END AS chars_count
  FROM oatt),
oclass AS (
  SELECT *,
         CASE WHEN http_status IS NOT NULL THEN
                CASE WHEN http_status IN (401, 403, 404)
                     THEN 'config' ELSE 'http' END
              WHEN raw_region_count IS NULL THEN 'no_regions'
              WHEN raw_region_count > 0 AND parsed_region_count = 0
                THEN 'dropped'
              ELSE 'success' END AS cls
  FROM oatt2),
oterm AS (
  SELECT c.*, LEAST(COALESCE(t.term_idx, 3), 3) AS first_term
  FROM oclass c LEFT JOIN (
    SELECT call_id, min(attempt_idx) AS term_idx
    FROM oclass WHERE cls IN ('success', 'config')
    GROUP BY call_id) t ON c.call_id = t.call_id),
ometrics AS (
  SELECT call_id, attempt_idx AS attempt_number,
         CASE cls WHEN 'config' THEN 'failed_config_error'
                  WHEN 'http' THEN 'failed_http_error'
                  WHEN 'no_regions' THEN 'failed_no_regions'
                  WHEN 'dropped' THEN 'failed_all_regions_dropped'
                  ELSE CASE WHEN attempt_idx = 1 THEN 'success'
                            ELSE 'success_after_retry' END
         END AS outcome,
         CASE WHEN cls IN ('http', 'config') THEN NULL
              WHEN cls IN ('no_regions', 'dropped') THEN 0
              ELSE parsed_region_count END AS region_count,
         CASE WHEN cls IN ('http', 'config') THEN NULL
              WHEN cls IN ('no_regions', 'dropped') THEN 0
              ELSE chars_count END AS chars_count,
         latency_ms
  FROM oterm
  WHERE enabled AND resume_ok AND attempt_idx <= first_term),
osummary AS (
  SELECT call_id,
         CASE cls WHEN 'success' THEN 'success'
                  WHEN 'config' THEN 'config_error'
                  WHEN 'http' THEN 'http_error_exhausted'
                  ELSE 'response_error_exhausted' END AS final_status,
         CAST(first_term AS INT) AS attempts_made
  FROM oterm
  WHERE enabled AND resume_ok AND attempt_idx = first_term
  UNION ALL
  SELECT call_id,
         CASE WHEN NOT enabled THEN 'disabled'
              ELSE 'resume_failed' END,
         0
  FROM oterm WHERE NOT (enabled AND resume_ok) AND attempt_idx = 1),
ocost AS (
  SELECT call_id, attempt_number,
         'pdf_structural_pass' AS operation_type,
         'paddleocr-vl' AS model_name,
         CAST(GREATEST(latency_ms / 1000.0, CAST(0.001 AS DOUBLE))
              * 1.0 / 3600.0 AS DOUBLE) AS raw_cost_usd,
         CAST(GREATEST(latency_ms / 1000.0, CAST(0.001 AS DOUBLE))
              * 1.0 / 3600.0 AS DOUBLE) AS billed_cost_usd,
         CAST(1.0 AS DOUBLE) AS markup_multiplier,
         CAST(GREATEST(latency_ms / 1000.0, CAST(0.001 AS DOUBLE))
              * 1.0 / 3600.0 * 100 AS DOUBLE) AS credits_to_debit,
         outcome, latency_ms,
         CAST(1.0 AS DOUBLE) AS gpu_hourly_usd
  FROM ometrics)"""
