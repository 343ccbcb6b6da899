"""Job-research cost-logging folds
(app/services/integrations/job_cost_logger.py).

The Supabase insert/RPCs are out of scope; the per-provider cost
formulas and gate ladders are deterministic (file:line):

* Provider rates (:30-44): DataForSEO Jobs flat $0.0006/call;
  Perplexity Sonar base $0.005 vs sonar-pro $0.01 keyed by EXACT
  ``model == "sonar-pro"`` — any other string (``sonar-pro-2``…)
  silently gets the cheap base rate (pin) — plus
  ``(in+out)/1000 * 0.001`` tokens; Firecrawl ``credits * 0.002``;
  Haiku ``in/1000 * 0.001 + out/1000 * 0.005``.
* Metadata truncations: query[:120], location[:80], url[:200]
  (:79, :131).
* ``debit_credits`` (:169-193): ``amount <= 0 or not user_id``
  returns ``amount <= 0`` — a zero/negative debit reports SUCCESS
  even with no user, while a missing user with a positive amount
  fails (pin); an empty RPC result is False; a returned row's
  ``success=false`` is honoured (audit #217 H3 — ``bool(data)``
  would have served paid ops free).
* ``refund_credits`` (:195-208): silent no-op on the same falsy
  gate; operation_type suffixed '.refund' (pin).

All map-side projections; doubles follow the same op order on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DATAFORSEO_JOBS_PER_CALL = 0.0006
SONAR_PER_CALL = 0.005
SONAR_PRO_PER_CALL = 0.01
SONAR_TOKEN_PER_1K = 0.001
FIRECRAWL_PER_CREDIT = 0.002
HAIKU_INPUT_PER_1K = 0.001
HAIKU_OUTPUT_PER_1K = 0.005


def job_cost_calls(calls: DataFrame) -> DataFrame:
    """calls: (call_id, provider in {dataforseo, perplexity,
    firecrawl, haiku}, model, query, location, url, operation,
    input_tokens, output_tokens, credits_used)."""
    p = F.col("provider")
    tok = (F.col("input_tokens") + F.col("output_tokens")) / 1000.0
    raw = (
        F.when(p == "dataforseo", F.lit(DATAFORSEO_JOBS_PER_CALL))
        .when(p == "perplexity",
              F.when(F.col("model") == "sonar-pro",
                     F.lit(SONAR_PRO_PER_CALL))
              .otherwise(F.lit(SONAR_PER_CALL))
              + tok * SONAR_TOKEN_PER_1K)
        .when(p == "firecrawl",
              F.col("credits_used").cast("double")
              * FIRECRAWL_PER_CREDIT)
        .otherwise(F.col("input_tokens") / 1000.0 * HAIKU_INPUT_PER_1K
                   + F.col("output_tokens") / 1000.0
                   * HAIKU_OUTPUT_PER_1K))
    op = (F.when(p == "dataforseo",
                 F.lit("job_research.discovery.dataforseo_jobs"))
          .when(p == "perplexity",
                F.concat(F.lit("job_research.discovery.perplexity_"),
                         F.col("model")))
          .when(p == "firecrawl",
                F.lit("job_research.discovery.firecrawl_careers"))
          .otherwise(F.concat(F.lit("job_research."),
                              F.col("operation"))))
    model = (F.when(p == "dataforseo", "dataforseo-google-jobs")
             .when(p == "perplexity", F.col("model"))
             .when(p == "firecrawl", "firecrawl-v2")
             .otherwise("claude-haiku-4-5-20251001"))
    return calls.select(
        "call_id", op.alias("operation_type"),
        model.alias("model_name"), raw.alias("raw_cost_usd"),
        F.when(p == "dataforseo", F.substring("query", 1, 120))
        .alias("meta_query"),
        F.when(p == "dataforseo", F.substring("location", 1, 80))
        .alias("meta_location"),
        F.when(p == "firecrawl", F.substring("url", 1, 200))
        .alias("meta_url"))


def credit_gate(ops: DataFrame) -> DataFrame:
    """ops: (op_id, kind in {debit, refund}, user_id nullable,
    amount int, operation_type, rpc_has_data bool, rpc_success
    nullable bool)."""
    falsy_gate = (F.col("amount") <= 0) | F.col("user_id").isNull() \
        | (F.col("user_id") == "")
    debit = F.col("kind") == "debit"
    debit_result = (
        F.when(falsy_gate, F.col("amount") <= 0)    # pin
        .when(~F.col("rpc_has_data"), F.lit(False))
        .otherwise(F.coalesce(F.col("rpc_success"), F.lit(False))))
    return ops.select(
        "op_id", "kind",
        F.when(debit, debit_result).cast("string").alias("result"),
        F.when(falsy_gate, F.lit(True)).otherwise(F.lit(False))
        .alias("skipped_rpc"),
        F.when(F.col("kind") == "refund",
               F.concat(F.col("operation_type"), F.lit(".refund")))
        .otherwise(F.col("operation_type")).alias("rpc_operation"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_cost_calls(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    long_q = F.concat(F.lit("senior data engineer remote "),
                      F.repeat(F.lit("kw "), 60),
                      (e % 9).cast("string"))
    return events.select(
        e.cast("long").alias("call_id"),
        F.when(e % 4 == 0, "dataforseo").when(e % 4 == 1, "perplexity")
        .when(e % 4 == 2, "firecrawl").otherwise("haiku")
        .alias("provider"),
        F.when(e % 3 == 0, "sonar-pro").when(e % 3 == 1, "sonar")
        .otherwise("sonar-pro-2024").alias("model"),
        long_q.alias("query"),
        F.concat(F.repeat(F.lit("Lisboa Portugal "), 8),
                 (e % 7).cast("string")).alias("location"),
        F.concat(F.lit("https://careers.example.com/"),
                 F.repeat(F.lit("seg/"), 55), (e % 5).cast("string"))
        .alias("url"),
        F.when(e % 2 == 0, "classify").otherwise("extract")
        .alias("operation"),
        (e % 3000).cast("long").alias("input_tokens"),
        (e % 800).cast("long").alias("output_tokens"),
        (e % 12).cast("int").alias("credits_used"))


SYNTH_COST_CALLS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS call_id,
           CASE event_id % 4 WHEN 0 THEN 'dataforseo'
                WHEN 1 THEN 'perplexity' WHEN 2 THEN 'firecrawl'
                ELSE 'haiku' END AS provider,
           CASE event_id % 3 WHEN 0 THEN 'sonar-pro'
                WHEN 1 THEN 'sonar' ELSE 'sonar-pro-2024' END
               AS model,
           'senior data engineer remote ' || repeat('kw ', 60)
               || CAST(event_id % 9 AS VARCHAR) AS query,
           repeat('Lisboa Portugal ', 8)
               || CAST(event_id % 7 AS VARCHAR) AS location,
           'https://careers.example.com/' || repeat('seg/', 55)
               || CAST(event_id % 5 AS VARCHAR) AS url,
           CASE WHEN event_id % 2 = 0 THEN 'classify'
                ELSE 'extract' END AS operation,
           CAST(event_id % 3000 AS BIGINT) AS input_tokens,
           CAST(event_id % 800 AS BIGINT) AS output_tokens,
           CAST(event_id % 12 AS INT) AS credits_used
    FROM events
"""


def cost_calls_sql() -> str:
    return f"""
        WITH c AS ({SYNTH_COST_CALLS_SQL})
        SELECT call_id,
               CASE provider
                 WHEN 'dataforseo'
                   THEN 'job_research.discovery.dataforseo_jobs'
                 WHEN 'perplexity'
                   THEN 'job_research.discovery.perplexity_' || model
                 WHEN 'firecrawl'
                   THEN 'job_research.discovery.firecrawl_careers'
                 ELSE 'job_research.' || operation END
                   AS operation_type,
               CASE provider
                 WHEN 'dataforseo' THEN 'dataforseo-google-jobs'
                 WHEN 'perplexity' THEN model
                 WHEN 'firecrawl' THEN 'firecrawl-v2'
                 ELSE 'claude-haiku-4-5-20251001' END AS model_name,
               CASE provider
                 WHEN 'dataforseo' THEN {DATAFORSEO_JOBS_PER_CALL}
                 WHEN 'perplexity' THEN
                   (CASE WHEN model = 'sonar-pro'
                         THEN {SONAR_PRO_PER_CALL}
                         ELSE {SONAR_PER_CALL} END)
                   + (input_tokens + output_tokens) / 1000.0
                     * {SONAR_TOKEN_PER_1K}
                 WHEN 'firecrawl' THEN
                   CAST(credits_used AS DOUBLE)
                   * {FIRECRAWL_PER_CREDIT}
                 ELSE input_tokens / 1000.0 * {HAIKU_INPUT_PER_1K}
                   + output_tokens / 1000.0 * {HAIKU_OUTPUT_PER_1K}
               END AS raw_cost_usd,
               CASE WHEN provider = 'dataforseo'
                    THEN substring(query, 1, 120) END AS meta_query,
               CASE WHEN provider = 'dataforseo'
                    THEN substring(location, 1, 80) END
                   AS meta_location,
               CASE WHEN provider = 'firecrawl'
                    THEN substring(url, 1, 200) END AS meta_url
        FROM c
    """


def synth_credit_ops(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("op_id"),
        F.when(e % 2 == 0, "debit").otherwise("refund").alias("kind"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .when(e % 7 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("u"), (e % 40).cast("string")))
        .alias("user_id"),
        ((e % 9) - 2).cast("int").alias("amount"),
        F.lit("jobs.refresh").alias("operation_type"),
        (e % 5 != 0).alias("rpc_has_data"),
        F.when(e % 11 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 3 == 0).alias("rpc_success"))


SYNTH_CREDIT_OPS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS op_id,
           CASE WHEN event_id % 2 = 0 THEN 'debit' ELSE 'refund' END
               AS kind,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN ''
                ELSE 'u' || CAST(event_id % 40 AS VARCHAR) END
               AS user_id,
           CAST(event_id % 9 - 2 AS INT) AS amount,
           'jobs.refresh' AS operation_type,
           event_id % 5 <> 0 AS rpc_has_data,
           CASE WHEN event_id % 11 = 0 THEN NULL
                ELSE event_id % 3 = 0 END AS rpc_success
    FROM events
"""


def credit_gate_sql() -> str:
    return f"""
        WITH o AS ({SYNTH_CREDIT_OPS_SQL}),
        g AS (SELECT *, amount <= 0 OR user_id IS NULL
                        OR user_id = '' AS falsy_gate
              FROM o)
        SELECT op_id, kind,
               CAST(CASE WHEN kind = 'debit' THEN
                 CASE WHEN falsy_gate THEN amount <= 0
                      WHEN NOT rpc_has_data THEN FALSE
                      ELSE coalesce(rpc_success, FALSE) END
               END AS VARCHAR) AS result,
               falsy_gate AS skipped_rpc,
               CASE WHEN kind = 'refund'
                    THEN operation_type || '.refund'
                    ELSE operation_type END AS rpc_operation
        FROM g
    """
