"""Credit-debit wrapper folds
(app/services/integrations/credits_integration_service.py).

The pricing MATH is pinned elsewhere (billing.py / unit_billing.py /
ocr_attempts.py over ai_pricing.py); this module folds the debit
WRAPPERS — envelope shapes, rounding tiers, and log-row asymmetries
around the Supabase ``debit_credits`` RPC (the RPC itself is
out of scope; its (ok, error_message, new_balance) outcome is an
input column).  Pinned semantics (file:line):

* ``debit_credits_for_ai_operation`` (:62-180):
  - usage-log costs rounded to 8 decimals, credits to 2 (:53-60);
  - the job-level aggregate rounds billed cost to SIX decimals
    (:404 in the time-based twin, :146-152 here) while the log keeps
    eight — the two sinks disagree in the last two digits (pin);
  - failure ladder (:112-119): no response row → 'No response from
    database'; a response row with falsy success →
    ``.get('error_message', 'Unknown error')`` — an ABSENT key folds
    to 'Unknown error' but a present-NULL passes None through into
    the envelope (dead default on present keys — pin);
  - description = ``"{operation_type} using {model_name}"``.
* ``debit_credits_for_firecrawl`` (:180-286):
  - platform credits = ``float(cost_usd * 100)`` UNROUNDED — contrast
    the ai path's round-2 (pin);
  - the RPC debits under ``firecrawl_{operation_type}`` but the usage
    log stores the UNPREFIXED operation_type (asymmetry — pin);
  - ``model_name`` is hardcoded 'firecrawl-scrape' even for crawl /
    extract operations (pin);
  - metadata merge ``{**(metadata or {}), 'firecrawl_credits': …}`` —
    the fixed keys OVERRIDE caller metadata on collision (pin).
* ``debit_credits_for_external_service`` (:430-549):
  - ``credits_to_debit <= 0`` short-circuits to a success envelope of
    ZEROS with NO debit and NO usage row — free services leave no
    audit trail (pin);
  - description pluralizes with ``'s' if units != 1`` — 0 units reads
    "0 units" (plural — pin);
  - ``api_provider = service_name.split('-')[0]``.
* ``debit_credits_for_time_based_ai`` (:286-430): a NON-time-based
  model falls back to the token path with input_tokens=0 AND
  output_tokens=0 — the misrouted call debits zero credits and logs a
  zero-cost row instead of failing (pin).

Money rides as integer picodollars (1e-12 USD) exactly like
billing.py; markup ×1.5 is ``pico * 150 // 100``; the rounding tiers
are integer half-up at 1e4 (8 dp), 1e6 (6 dp) and 1e8-then-/100
(credits, 2 dp) — bit-identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MARKUP_NUM, MARKUP_DEN = 150, 100   # ai_pricing.py:34 (×1.50)


def _usd8(pico):
    """round(pico/1e12, 8) as integer half-up -> double USD."""
    return (F.floor((pico + 5_000) / 10_000) / F.lit(1e8))


def _usd6(pico):
    return (F.floor((pico + 500_000) / 1_000_000) / F.lit(1e6))


def _credits2(pico):
    """round(pico/1e12*100, 2)."""
    return (F.floor((pico + 50_000_000) / 100_000_000) / F.lit(100.0))


def _error_ladder():
    """(:112-119) — absent-key default is live, present-NULL passes."""
    return (F.when(~F.col("has_response"),
                   F.lit("No response from database"))
            .when(F.col("debit_ok"), F.lit(None).cast("string"))
            .when(F.col("has_error_message"), F.col("error_message"))
            .otherwise(F.lit("Unknown error")))


def ai_debit_fold(attempts: DataFrame) -> DataFrame:
    """attempts: (attempt_id, user_id, operation_type, model_name,
    input_tokens, output_tokens, in_pico, out_pico [per-token],
    has_response, debit_ok, has_error_message, error_message,
    has_job)."""
    raw = (F.col("input_tokens") * F.col("in_pico")
           + F.col("output_tokens") * F.col("out_pico"))
    billed = F.floor(raw * MARKUP_NUM / MARKUP_DEN)
    in_cost = F.col("input_tokens") * F.col("in_pico")
    out_cost = F.col("output_tokens") * F.col("out_pico")
    success = F.col("has_response") & F.col("debit_ok")
    return attempts.select(
        "attempt_id", "user_id", "operation_type", "model_name",
        success.alias("success"),
        _error_ladder().alias("error"),
        F.concat(F.col("operation_type"), F.lit(" using "),
                 F.col("model_name")).alias("description"),
        _usd8(in_cost).alias("input_cost_usd"),
        _usd8(out_cost).alias("output_cost_usd"),
        _usd8(raw).alias("raw_cost_usd"),
        _usd8(billed).alias("billed_cost_usd"),
        _credits2(billed).alias("credits_debited"),
        # job-agg sink rounds billed to 6, not 8 (pin)
        F.when(success & F.col("has_job"), _usd6(billed))
        .alias("job_cost_usd"),
        success.alias("log_emitted"))


def firecrawl_debit_fold(attempts: DataFrame) -> DataFrame:
    """attempts: (attempt_id, user_id, operation_type, credits_used,
    url nullable, pages_scraped, has_response, debit_ok,
    has_error_message, error_message, meta_has_url_key)."""
    # cost = credits_used x $0.001 = credits_used x 1e9 pico
    cost_pico = F.col("credits_used").cast("long") * 1_000_000_000
    # platform credits UNROUNDED: cost_usd * 100
    credits = cost_pico.cast("double") / 1e12 * 100.0
    success = F.col("has_response") & F.col("debit_ok")
    return attempts.select(
        "attempt_id", "user_id",
        # debit op is prefixed, the LOG op is not (pin)
        F.concat(F.lit("firecrawl_"), F.col("operation_type"))
        .alias("debit_operation_type"),
        F.col("operation_type").alias("log_operation_type"),
        F.lit("firecrawl-scrape").alias("model_name"),   # hardcoded
        success.alias("success"),
        _error_ladder().alias("error"),
        F.concat(F.lit("Firecrawl "), F.col("operation_type"),
                 F.lit(": "),
                 F.coalesce(F.col("url"), F.lit("N/A")))
        .alias("description"),
        credits.alias("credits_debited"),
        (cost_pico.cast("double") / 1e12).alias("cost_usd"),
        # fixed merge keys override caller metadata (pin): the url
        # key's final value is ALWAYS the argument, even when the
        # caller metadata carried its own 'url'
        F.col("url").alias("metadata_url"),
        success.alias("log_emitted"))


def external_debit_fold(attempts: DataFrame) -> DataFrame:
    """attempts: (attempt_id, user_id, operation_type, service_name,
    unit_type, cost_per_unit_pico, units, has_response, debit_ok,
    has_error_message, error_message)."""
    raw = F.col("cost_per_unit_pico") * F.col("units")
    billed = F.floor(raw * MARKUP_NUM / MARKUP_DEN)
    credits = _credits2(billed)
    free = credits <= 0           # short-circuit (pin)
    success = free | (F.col("has_response") & F.col("debit_ok"))
    plural = F.when(F.col("units") != 1, "s").otherwise("")
    return attempts.select(
        "attempt_id", "user_id", "operation_type", "service_name",
        success.alias("success"),
        F.when(free, F.lit(None).cast("string"))
        .otherwise(_error_ladder()).alias("error"),
        F.when(free, F.lit(None).cast("string"))
        .otherwise(F.concat(
            F.col("service_name"), F.lit(" "),
            F.col("operation_type"), F.lit(" ("),
            F.col("units").cast("string"), F.lit(" "),
            F.col("unit_type"), plural, F.lit(")")))
        .alias("description"),
        F.when(free, 0.0).otherwise(credits).alias("credits_debited"),
        F.when(free, 0.0).otherwise(_usd8(raw)).alias("raw_cost_usd"),
        F.when(free, 0.0).otherwise(_usd8(billed))
        .alias("billed_cost_usd"),
        F.split(F.col("service_name"), "-").getItem(0)
        .alias("api_provider"),
        (~free & F.col("has_response") & F.col("debit_ok"))
        .alias("log_emitted"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_ai_attempts(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("attempt_id"),
        F.concat(F.lit("u"), (e % 50).cast("string")).alias("user_id"),
        F.when(e % 3 == 0, "pdf_vision_discovery")
        .when(e % 3 == 1, "agent_chat").otherwise("enrichment")
        .alias("operation_type"),
        F.concat(F.lit("model-"), (e % 6).cast("string"))
        .alias("model_name"),
        (e % 9000).cast("long").alias("input_tokens"),
        (e % 3000).cast("long").alias("output_tokens"),
        ((e % 40 + 1) * 25).cast("long").alias("in_pico"),
        ((e % 40 + 1) * 75).cast("long").alias("out_pico"),
        (e % 13 != 0).alias("has_response"),
        (e % 7 != 0).alias("debit_ok"),
        (e % 5 != 0).alias("has_error_message"),
        F.when(e % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("insufficient "),
                            (e % 4).cast("string")))
        .alias("error_message"),
        (e % 2 == 0).alias("has_job"))


SYNTH_AI_ATTEMPTS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS attempt_id,
           'u' || CAST(event_id % 50 AS VARCHAR) AS user_id,
           CASE event_id % 3 WHEN 0 THEN 'pdf_vision_discovery'
                WHEN 1 THEN 'agent_chat' ELSE 'enrichment' END
               AS operation_type,
           'model-' || CAST(event_id % 6 AS VARCHAR) AS model_name,
           CAST(event_id % 9000 AS BIGINT) AS input_tokens,
           CAST(event_id % 3000 AS BIGINT) AS output_tokens,
           CAST((event_id % 40 + 1) * 25 AS BIGINT) AS in_pico,
           CAST((event_id % 40 + 1) * 75 AS BIGINT) AS out_pico,
           event_id % 13 <> 0 AS has_response,
           event_id % 7 <> 0 AS debit_ok,
           event_id % 5 <> 0 AS has_error_message,
           CASE WHEN event_id % 11 = 0 THEN NULL
                ELSE 'insufficient ' || CAST(event_id % 4 AS VARCHAR)
           END AS error_message,
           event_id % 2 = 0 AS has_job
    FROM events
"""

_ERROR_LADDER_SQL = """
    CASE WHEN NOT has_response THEN 'No response from database'
         WHEN debit_ok THEN NULL
         WHEN has_error_message THEN error_message
         ELSE 'Unknown error' END
"""


def ai_debit_sql() -> str:
    return f"""
        WITH a AS ({SYNTH_AI_ATTEMPTS_SQL}),
        c AS (
          SELECT *,
                 input_tokens * in_pico + output_tokens * out_pico
                     AS raw_pico,
                 (input_tokens * in_pico + output_tokens * out_pico)
                     * {MARKUP_NUM} // {MARKUP_DEN} AS billed_pico,
                 has_response AND debit_ok AS ok
          FROM a)
        SELECT attempt_id, user_id, operation_type, model_name,
               ok AS success,
               {_ERROR_LADDER_SQL} AS error,
               operation_type || ' using ' || model_name
                   AS description,
               (input_tokens * in_pico + 5000) // 10000 / 1e8
                   AS input_cost_usd,
               (output_tokens * out_pico + 5000) // 10000 / 1e8
                   AS output_cost_usd,
               (raw_pico + 5000) // 10000 / 1e8 AS raw_cost_usd,
               (billed_pico + 5000) // 10000 / 1e8
                   AS billed_cost_usd,
               (billed_pico + 50000000) // 100000000 / 100.0
                   AS credits_debited,
               CASE WHEN ok AND has_job THEN
                 (billed_pico + 500000) // 1000000 / 1e6 END
                   AS job_cost_usd,
               ok AS log_emitted
        FROM c
    """


def synth_firecrawl_attempts(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("attempt_id"),
        F.concat(F.lit("u"), (e % 50).cast("string")).alias("user_id"),
        F.when(e % 3 == 0, "scrape").when(e % 3 == 1, "crawl")
        .otherwise("extract").alias("operation_type"),
        (e % 120).cast("int").alias("credits_used"),
        F.when(e % 6 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("https://ex.com/p"),
                            (e % 90).cast("string"))).alias("url"),
        (e % 9 + 1).cast("int").alias("pages_scraped"),
        (e % 13 != 0).alias("has_response"),
        (e % 7 != 0).alias("debit_ok"),
        (e % 5 != 0).alias("has_error_message"),
        F.when(e % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("err "), (e % 4).cast("string")))
        .alias("error_message"),
        (e % 4 == 0).alias("meta_has_url_key"))


SYNTH_FIRECRAWL_SQL = """
    SELECT CAST(event_id AS BIGINT) AS attempt_id,
           'u' || CAST(event_id % 50 AS VARCHAR) AS user_id,
           CASE event_id % 3 WHEN 0 THEN 'scrape' WHEN 1 THEN 'crawl'
                ELSE 'extract' END AS operation_type,
           CAST(event_id % 120 AS INT) AS credits_used,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE 'https://ex.com/p'
                     || CAST(event_id % 90 AS VARCHAR) END AS url,
           CAST(event_id % 9 + 1 AS INT) AS pages_scraped,
           event_id % 13 <> 0 AS has_response,
           event_id % 7 <> 0 AS debit_ok,
           event_id % 5 <> 0 AS has_error_message,
           CASE WHEN event_id % 11 = 0 THEN NULL
                ELSE 'err ' || CAST(event_id % 4 AS VARCHAR) END
               AS error_message,
           event_id % 4 = 0 AS meta_has_url_key
    FROM events
"""


def firecrawl_debit_sql() -> str:
    return f"""
        WITH a AS ({SYNTH_FIRECRAWL_SQL})
        SELECT attempt_id, user_id,
               'firecrawl_' || operation_type AS debit_operation_type,
               operation_type AS log_operation_type,
               'firecrawl-scrape' AS model_name,
               has_response AND debit_ok AS success,
               {_ERROR_LADDER_SQL} AS error,
               'Firecrawl ' || operation_type || ': '
                   || coalesce(url, 'N/A') AS description,
               CAST(credits_used AS BIGINT) * 1000000000 / 1e12
                   * 100.0 AS credits_debited,
               CAST(credits_used AS BIGINT) * 1000000000 / 1e12
                   AS cost_usd,
               url AS metadata_url,
               has_response AND debit_ok AS log_emitted
        FROM a
    """


def synth_external_attempts(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("attempt_id"),
        F.concat(F.lit("u"), (e % 50).cast("string")).alias("user_id"),
        F.lit("b2b_search").alias("operation_type"),
        F.when(e % 4 == 0, "twilio-sms").when(e % 4 == 1,
                                              "apollo-enrich")
        .when(e % 4 == 2, "free-tier").otherwise("hunter-email-finder")
        .alias("service_name"),
        F.when(e % 4 == 0, "message").when(e % 4 == 1, "enrichment")
        .when(e % 4 == 2, "lookup").otherwise("search")
        .alias("unit_type"),
        # free-tier rows carry zero cost -> short-circuit path
        F.when(e % 4 == 2, F.lit(0))
        .otherwise((e % 5 + 1) * 5_000_000_000).cast("long")
        .alias("cost_per_unit_pico"),
        (e % 4).cast("int").alias("units"),   # 0 exercised (plural)
        (e % 13 != 0).alias("has_response"),
        (e % 7 != 0).alias("debit_ok"),
        (e % 5 != 0).alias("has_error_message"),
        F.when(e % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("err "), (e % 4).cast("string")))
        .alias("error_message"))


SYNTH_EXTERNAL_SQL = """
    SELECT CAST(event_id AS BIGINT) AS attempt_id,
           'u' || CAST(event_id % 50 AS VARCHAR) AS user_id,
           'b2b_search' AS operation_type,
           CASE event_id % 4 WHEN 0 THEN 'twilio-sms'
                WHEN 1 THEN 'apollo-enrich' WHEN 2 THEN 'free-tier'
                ELSE 'hunter-email-finder' END AS service_name,
           CASE event_id % 4 WHEN 0 THEN 'message'
                WHEN 1 THEN 'enrichment' WHEN 2 THEN 'lookup'
                ELSE 'search' END AS unit_type,
           CAST(CASE WHEN event_id % 4 = 2 THEN 0
                ELSE (event_id % 5 + 1) * 5000000000 END AS BIGINT)
               AS cost_per_unit_pico,
           CAST(event_id % 4 AS INT) AS units,
           event_id % 13 <> 0 AS has_response,
           event_id % 7 <> 0 AS debit_ok,
           event_id % 5 <> 0 AS has_error_message,
           CASE WHEN event_id % 11 = 0 THEN NULL
                ELSE 'err ' || CAST(event_id % 4 AS VARCHAR) END
               AS error_message
    FROM events
"""


def external_debit_sql() -> str:
    return f"""
        WITH a AS ({SYNTH_EXTERNAL_SQL}),
        c AS (
          SELECT *, cost_per_unit_pico * units AS raw_pico,
                 cost_per_unit_pico * units * {MARKUP_NUM}
                     // {MARKUP_DEN} AS billed_pico
          FROM a),
        d AS (
          SELECT *,
                 (billed_pico + 50000000) // 100000000 / 100.0
                     AS credits2,
                 has_response AND debit_ok AS rpc_ok
          FROM c)
        SELECT attempt_id, user_id, operation_type, service_name,
               credits2 <= 0 OR rpc_ok AS success,
               CASE WHEN credits2 <= 0 THEN NULL
                    ELSE {_ERROR_LADDER_SQL} END AS error,
               CASE WHEN credits2 <= 0 THEN NULL
                    ELSE service_name || ' ' || operation_type
                         || ' (' || CAST(units AS VARCHAR) || ' '
                         || unit_type
                         || CASE WHEN units != 1 THEN 's' ELSE '' END
                         || ')' END AS description,
               CASE WHEN credits2 <= 0 THEN 0.0 ELSE credits2 END
                   AS credits_debited,
               CASE WHEN credits2 <= 0 THEN 0.0
                    ELSE (raw_pico + 5000) // 10000 / 1e8 END
                   AS raw_cost_usd,
               CASE WHEN credits2 <= 0 THEN 0.0
                    ELSE (billed_pico + 5000) // 10000 / 1e8 END
                   AS billed_cost_usd,
               string_split(service_name, '-')[1] AS api_provider,
               credits2 > 0 AND rpc_ok AS log_emitted
        FROM d
    """
