"""Mention-monitoring cost logging + credit metering folds.

Reference: ``app/services/integrations/mention_cost_logger.py`` +
``app/modules/_core/cost_logger.py`` —

- per-call rates (:85-106): DataForSEO news $0.0006/call, labs
  $0.001, SERP priced same as news (pinned); Perplexity per-call
  ($0.005 sonar / $0.01 sonar-pro) PLUS (in+out)/1000 * $0.001;
  Haiku $0.001/$0.005 per 1K; the llm-probe rate ladder
  (claude-haiku* -> Haiku rates, gpt-4o-mini, gemini* -> Flash,
  sonar -> 0.001/0.001, anything else -> 0.0005/0.0015); YouTube $0.
- slug routing (#286, :42-64): ONLY the labs and serp helpers honor
  the caller's ``attribution.module_slug`` (op prefix =
  'mention_monitoring.opportunities' for the default slug, else
  slug with dashes underscored); news / perplexity / haiku / probe /
  youtube hardcode their mention_monitoring operation types and land
  on the default slug even when the attribution carries another —
  pinned asymmetry.
- core row shape (cost_logger.py:80-126): raw rounded to 6,
  billed = round(raw * 1.5, 6), error truncated to 240, the
  query/seed metadata truncated to 120 by the helpers.
- credit metering (:324-377 + MENTION_OP_CREDIT_COST): amount <= 0
  debits succeed WITHOUT any RPC (a zero-priced op is served free);
  a missing user fails; an empty RPC reply fails; a truthy reply row
  with success=false fails (audit #217 H3 — ``bool(data)`` would have
  served paid ops free); exceptions fail.

Scale: map-only Column plans; the lifetime rollup is one
groupBy(tracked_mention_id) sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MODULE_SLUG = "mention-monitoring"
DEFAULT_MARKUP = 1.5

RATE = {
    "news_per_call": 0.0006,
    "labs_per_call": 0.001,
    "sonar_per_call": 0.005,
    "sonar_pro_per_call": 0.01,
    "haiku_in": 0.001, "haiku_out": 0.005,
    "gpt4o_mini_in": 0.00015, "gpt4o_mini_out": 0.0006,
    "gemini_in": 0.00010, "gemini_out": 0.0004,
}

MENTION_OP_CREDIT_COST = {
    "refresh": 5,
    "probe_llm": 15,
    "opportunities": 2,
    "opportunities_with_llm": 5,
    "market_check": 3,
}


def _slug_for():
    return F.coalesce(F.nullif(F.col("attrib_slug"), F.lit("")),
                      F.lit(MODULE_SLUG))


def _op_prefix():
    slug = _slug_for()
    return F.when(slug == MODULE_SLUG,
                  F.lit("mention_monitoring.opportunities")) \
        .otherwise(F.replace(slug, F.lit("-"), F.lit("_")))


def call_cost_rows(events: DataFrame) -> DataFrame:
    """``events``: (event_id long, kind string, attrib_slug string?,
    model string, operation string, input_tokens int,
    output_tokens int, hits int, query string, latency_ms int,
    success boolean, error_message string?,
    tracked_mention_id long)."""
    k = F.col("kind")
    it, ot = F.col("input_tokens"), F.col("output_tokens")
    probe_rates = (
        F.when(F.col("model").startswith("claude-haiku"),
               F.struct(F.lit(RATE["haiku_in"]).alias("i"),
                        F.lit(RATE["haiku_out"]).alias("o")))
        .when(F.col("model") == "gpt-4o-mini",
              F.struct(F.lit(RATE["gpt4o_mini_in"]).alias("i"),
                       F.lit(RATE["gpt4o_mini_out"]).alias("o")))
        .when(F.col("model").startswith("gemini"),
              F.struct(F.lit(RATE["gemini_in"]).alias("i"),
                       F.lit(RATE["gemini_out"]).alias("o")))
        .when(F.col("model") == "sonar",
              F.struct(F.lit(0.001).alias("i"),
                       F.lit(0.001).alias("o")))
        .otherwise(F.struct(F.lit(0.0005).alias("i"),
                            F.lit(0.0015).alias("o"))))
    raw = (
        F.when(k == "news", F.lit(RATE["news_per_call"]))
        .when(k == "labs", F.lit(RATE["labs_per_call"]))
        .when(k == "serp", F.lit(RATE["news_per_call"]))
        .when(k == "perplexity",
              F.when(F.col("model") == "sonar-pro",
                     F.lit(RATE["sonar_pro_per_call"]))
              .otherwise(F.lit(RATE["sonar_per_call"]))
              + (it + ot) / 1000.0 * 0.001)
        .when(k == "haiku",
              it / 1000.0 * RATE["haiku_in"]
              + ot / 1000.0 * RATE["haiku_out"])
        .when(k == "llm_probe",
              it / 1000.0 * probe_rates["i"]
              + ot / 1000.0 * probe_rates["o"])
        .otherwise(F.lit(0.0)))
    op_type = (
        F.when(k == "news",
               F.lit("mention_monitoring.discovery.dataforseo_news"))
        .when(k == "labs",
              F.concat(_op_prefix(), F.lit(".dataforseo_labs")))
        .when(k == "serp",
              F.concat(_op_prefix(), F.lit(".dataforseo_serp."),
                       F.col("operation")))
        .when(k == "perplexity",
              F.concat(F.lit("mention_monitoring.discovery."
                             "perplexity_"), F.col("model")))
        .when(k == "haiku",
              F.concat(F.lit("mention_monitoring."),
                       F.col("operation")))
        .when(k == "llm_probe", F.lit("mention_monitoring.llm_probe"))
        .otherwise(F.lit("mention_monitoring.discovery.youtube")))
    model_name = (
        F.when(k == "news", F.lit("dataforseo-news"))
        .when(k == "labs", F.lit("dataforseo-labs-related-keywords"))
        .when(k == "serp", F.lit("dataforseo-serp-google-organic"))
        .when(k == "haiku", F.lit("claude-haiku-4-5-20251001"))
        .when(k == "youtube", F.lit("youtube-data-api-v3"))
        .otherwise(F.col("model")))
    # only labs/serp honor the attribution slug (#286) — the rest
    # land on the default via log_external_call's setdefault
    slug = F.when(k.isin("labs", "serp"), _slug_for()) \
        .otherwise(F.lit(MODULE_SLUG))
    tokens_logged = k.isin("perplexity", "haiku", "llm_probe")
    return events.select(
        "event_id", "tracked_mention_id", "kind",
        op_type.alias("operation_type"),
        model_name.alias("model_name"),
        slug.alias("module_slug"),
        # Python round() is HALF-EVEN — billed lands on exact
        # half-microdollar midpoints for the 0.0005/0.0015 default
        # probe rates, so bround (banker's), not round (HALF_UP)
        F.bround(raw, 6).alias("raw_cost_usd"),
        F.lit(DEFAULT_MARKUP).alias("markup_multiplier"),
        F.bround(raw * DEFAULT_MARKUP, 6).alias("billed_cost_usd"),
        F.when(tokens_logged, it).otherwise(F.lit(0))
        .alias("input_tokens"),
        F.when(tokens_logged, ot).otherwise(F.lit(0))
        .alias("output_tokens"),
        F.when(k.isin("news", "labs", "serp", "youtube"),
               F.substring(F.col("query"), 1, 120)).alias("meta_query"),
        F.when(k.isin("news", "labs", "serp", "perplexity",
                      "youtube"), F.col("hits")).alias("meta_hits"),
        "latency_ms", "success",
        F.when(~F.col("success"),
               F.substring(F.coalesce(F.col("error_message"),
                                      F.lit("")), 1, 240))
        .alias("error_head"))


def credit_debit_fold(reqs: DataFrame) -> DataFrame:
    """``reqs``: (req_id long, op string, amount int, user_id
    string?, rpc_raises boolean, rpc_rows int, rpc_success
    boolean)."""
    amount = F.col("amount")
    outcome = (
        F.when(amount <= 0, F.lit("free"))
        .when(F.coalesce(F.col("user_id"), F.lit("")) == "",
              F.lit("no_user"))
        .when(F.col("rpc_raises"), F.lit("exception"))
        .when(F.col("rpc_rows") == 0, F.lit("empty_reply"))
        .when(F.col("rpc_success"), F.lit("debited"))
        .otherwise(F.lit("insufficient")))
    return reqs.select(
        "req_id", "op", "amount",
        outcome.alias("outcome"),
        outcome.isin("free", "debited").alias("debited"))


def lifetime_cost(cost_rows: DataFrame) -> DataFrame:
    """recompute_mention_cost semantics: sum billed per mention."""
    return (cost_rows.groupBy("tracked_mention_id")
            .agg(F.bround(F.sum("billed_cost_usd"), 6)
                 .alias("total_billed_usd"),
                 F.count(F.lit(1)).alias("n_calls")))


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

KINDS = ("news", "labs", "serp", "perplexity", "haiku", "llm_probe",
         "youtube")
PROBE_MODELS = ("claude-haiku-4-5", "gpt-4o-mini",
                "gemini-2.0-flash", "sonar", "mystery-llm")


def synth_call_events(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    m = F.col("doc")
    kind = F.element_at(F.array(*[F.lit(x) for x in KINDS]),
                        (m % 7 + 1).cast("int"))
    model = (
        F.when(kind == "perplexity",
               F.when(m % 2 == 0, F.lit("sonar-pro"))
               .otherwise(F.lit("sonar")))
        .when(kind == "llm_probe", F.element_at(
            F.array(*[F.lit(x) for x in PROBE_MODELS]),
            (m % 5 + 1).cast("int")))
        .otherwise(F.lit("")))
    operation = (
        F.when(kind == "serp",
               F.when(m % 2 == 0, F.lit("pao_question"))
               .otherwise(F.lit("serp_organic")))
        .when(kind == "haiku", F.element_at(F.array(
            F.lit("facet_extraction"), F.lit("classifier"),
            F.lit("opportunity_polish")), (m % 3 + 1).cast("int")))
        .otherwise(F.lit("")))
    return d.select(
        m.alias("event_id"),
        (m % 60).alias("tracked_mention_id"),
        kind.alias("kind"),
        F.element_at(F.array(F.lit("seo-toolkit"),
                             F.lit(None).cast("string"), F.lit(""),
                             F.lit(MODULE_SLUG)),
                     (m % 4 + 1).cast("int")).alias("attrib_slug"),
        model.alias("model"), operation.alias("operation"),
        # multiples of 40 keep every cost an exact integer
        # microdollar — round(…, 6) has no midpoints to disagree on
        ((m * 13) % 75 * 40).cast("int").alias("input_tokens"),
        ((m * 7) % 37 * 40).cast("int").alias("output_tokens"),
        (m % 20).cast("int").alias("hits"),
        F.concat(F.lit("q-"), F.repeat(F.lit("x"),
                                       (m % 150).cast("int")))
        .alias("query"),
        ((m % 900) + 5).cast("int").alias("latency_ms"),
        (m % 9 != 0).alias("success"),
        F.when(m % 9 == 0, F.concat(F.lit("err "), F.repeat(
            F.lit("e"), F.lit(300)))).alias("error_message"))


DUCK_CALL_EVENTS_SQL = f"""
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
mev AS (
  SELECT doc AS event_id, doc % 60 AS tracked_mention_id,
         (['news','labs','serp','perplexity','haiku','llm_probe',
           'youtube'])[CAST(doc % 7 AS INT) + 1] AS kind,
         (['seo-toolkit', NULL, '', '{MODULE_SLUG}'])
           [CAST(doc % 4 AS INT) + 1] AS attrib_slug,
         CASE (['news','labs','serp','perplexity','haiku',
                'llm_probe','youtube'])[CAST(doc % 7 AS INT) + 1]
           WHEN 'perplexity' THEN
             CASE WHEN doc % 2 = 0 THEN 'sonar-pro' ELSE 'sonar' END
           WHEN 'llm_probe' THEN
             (['claude-haiku-4-5','gpt-4o-mini','gemini-2.0-flash',
               'sonar','mystery-llm'])[CAST(doc % 5 AS INT) + 1]
           ELSE '' END AS model,
         CASE (['news','labs','serp','perplexity','haiku',
                'llm_probe','youtube'])[CAST(doc % 7 AS INT) + 1]
           WHEN 'serp' THEN CASE WHEN doc % 2 = 0
             THEN 'pao_question' ELSE 'serp_organic' END
           WHEN 'haiku' THEN (['facet_extraction','classifier',
             'opportunity_polish'])[CAST(doc % 3 AS INT) + 1]
           ELSE '' END AS operation,
         CAST((doc*13) % 75 * 40 AS INT) AS input_tokens,
         CAST((doc*7) % 37 * 40 AS INT) AS output_tokens,
         CAST(doc % 20 AS INT) AS hits,
         'q-' || repeat('x', CAST(doc % 150 AS INT)) AS query,
         CAST(doc % 900 + 5 AS INT) AS latency_ms,
         doc % 9 != 0 AS success,
         CASE WHEN doc % 9 = 0
              THEN 'err ' || repeat('e', 300) END AS error_message
  FROM docs)"""

DUCK_CALL_COSTS_SQL = f"""
mslug AS (
  SELECT *, coalesce(nullif(attrib_slug, ''), '{MODULE_SLUG}')
              AS eff_slug
  FROM mev),
mprefix AS (
  SELECT *, CASE WHEN eff_slug = '{MODULE_SLUG}'
                 THEN 'mention_monitoring.opportunities'
                 ELSE replace(eff_slug, '-', '_') END AS op_prefix
  FROM mslug),
mraw AS (
  SELECT *,
    CASE kind
      WHEN 'news' THEN 0.0006
      WHEN 'labs' THEN 0.001
      WHEN 'serp' THEN 0.0006
      WHEN 'perplexity' THEN
        (CASE WHEN model = 'sonar-pro' THEN 0.01 ELSE 0.005 END)
        + (input_tokens + output_tokens) / 1000.0 * 0.001
      WHEN 'haiku' THEN input_tokens / 1000.0 * 0.001
                        + output_tokens / 1000.0 * 0.005
      WHEN 'llm_probe' THEN
        CASE WHEN starts_with(model, 'claude-haiku')
               THEN input_tokens / 1000.0 * 0.001
                    + output_tokens / 1000.0 * 0.005
             WHEN model = 'gpt-4o-mini'
               THEN input_tokens / 1000.0 * 0.00015
                    + output_tokens / 1000.0 * 0.0006
             WHEN starts_with(model, 'gemini')
               THEN input_tokens / 1000.0 * 0.00010
                    + output_tokens / 1000.0 * 0.0004
             WHEN model = 'sonar'
               THEN input_tokens / 1000.0 * 0.001
                    + output_tokens / 1000.0 * 0.001
             ELSE input_tokens / 1000.0 * 0.0005
                  + output_tokens / 1000.0 * 0.0015 END
      ELSE 0.0 END AS raw0
  FROM mprefix),
mcost AS (
  SELECT event_id, tracked_mention_id, kind,
         CASE kind
           WHEN 'news'
             THEN 'mention_monitoring.discovery.dataforseo_news'
           WHEN 'labs' THEN op_prefix || '.dataforseo_labs'
           WHEN 'serp' THEN op_prefix || '.dataforseo_serp.'
                            || operation
           WHEN 'perplexity'
             THEN 'mention_monitoring.discovery.perplexity_' || model
           WHEN 'haiku' THEN 'mention_monitoring.' || operation
           WHEN 'llm_probe' THEN 'mention_monitoring.llm_probe'
           ELSE 'mention_monitoring.discovery.youtube'
         END AS operation_type,
         CASE kind
           WHEN 'news' THEN 'dataforseo-news'
           WHEN 'labs' THEN 'dataforseo-labs-related-keywords'
           WHEN 'serp' THEN 'dataforseo-serp-google-organic'
           WHEN 'haiku' THEN 'claude-haiku-4-5-20251001'
           WHEN 'youtube' THEN 'youtube-data-api-v3'
           ELSE model END AS model_name,
         CASE WHEN kind IN ('labs', 'serp') THEN eff_slug
              ELSE '{MODULE_SLUG}' END AS module_slug,
         round_even(raw0, 6) AS raw_cost_usd,
         CAST(1.5 AS DOUBLE) AS markup_multiplier,
         round_even(raw0 * 1.5, 6) AS billed_cost_usd,
         CASE WHEN kind IN ('perplexity','haiku','llm_probe')
              THEN input_tokens ELSE 0 END AS input_tokens,
         CASE WHEN kind IN ('perplexity','haiku','llm_probe')
              THEN output_tokens ELSE 0 END AS output_tokens,
         CASE WHEN kind IN ('news','labs','serp','youtube')
              THEN substr(query, 1, 120) END AS meta_query,
         CASE WHEN kind IN ('news','labs','serp','perplexity',
                            'youtube') THEN hits END AS meta_hits,
         latency_ms, success,
         CASE WHEN NOT success
              THEN substr(coalesce(error_message, ''), 1, 240) END
           AS error_head
  FROM mraw)"""


def synth_debit_reqs(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    m = F.col("doc")
    ops = tuple(MENTION_OP_CREDIT_COST) + ("custom_free",)
    op = F.element_at(F.array(*[F.lit(o) for o in ops]),
                      (m % len(ops) + 1).cast("int"))
    amt_map = F.create_map(*[
        x for k, v in MENTION_OP_CREDIT_COST.items()
        for x in (F.lit(k), F.lit(v))])
    return d.select(
        m.alias("req_id"), op.alias("op"),
        F.coalesce(F.element_at(amt_map, op), F.lit(0)).cast("int")
        .alias("amount"),
        F.when(m % 11 == 0, F.lit(None).cast("string"))
        .when(m % 11 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("user-"), (m % 9).cast("string")))
        .alias("user_id"),
        (m % 13 == 0).alias("rpc_raises"),
        F.when(m % 7 == 0, F.lit(0)).otherwise(F.lit(1)).cast("int")
        .alias("rpc_rows"),
        (m % 5 != 0).alias("rpc_success"))


DUCK_DEBIT_SQL = f"""
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
dreq AS (
  SELECT doc AS req_id,
         (['refresh','probe_llm','opportunities',
           'opportunities_with_llm','market_check','custom_free'])
           [CAST(doc % 6 AS INT) + 1] AS op,
         CASE (['refresh','probe_llm','opportunities',
                'opportunities_with_llm','market_check',
                'custom_free'])[CAST(doc % 6 AS INT) + 1]
           WHEN 'refresh' THEN 5 WHEN 'probe_llm' THEN 15
           WHEN 'opportunities' THEN 2
           WHEN 'opportunities_with_llm' THEN 5
           WHEN 'market_check' THEN 3 ELSE 0 END AS amount,
         CASE WHEN doc % 11 = 0 THEN NULL
              WHEN doc % 11 = 1 THEN ''
              ELSE 'user-' || CAST(doc % 9 AS VARCHAR) END AS user_id,
         doc % 13 = 0 AS rpc_raises,
         CASE WHEN doc % 7 = 0 THEN 0 ELSE 1 END AS rpc_rows,
         doc % 5 != 0 AS rpc_success
  FROM docs),
dout AS (
  SELECT req_id, op, amount,
         CASE WHEN amount <= 0 THEN 'free'
              WHEN coalesce(user_id, '') = '' THEN 'no_user'
              WHEN rpc_raises THEN 'exception'
              WHEN rpc_rows = 0 THEN 'empty_reply'
              WHEN rpc_success THEN 'debited'
              ELSE 'insufficient' END AS outcome,
         CASE WHEN amount <= 0 THEN 'free'
              WHEN coalesce(user_id, '') = '' THEN 'no_user'
              WHEN rpc_raises THEN 'exception'
              WHEN rpc_rows = 0 THEN 'empty_reply'
              WHEN rpc_success THEN 'debited'
              ELSE 'insufficient' END IN ('free', 'debited')
           AS debited
  FROM dreq)"""

DUCK_LIFETIME_SQL = """
mlife AS (
  SELECT tracked_mention_id,
         round_even(sum(billed_cost_usd), 6) AS total_billed_usd,
         count(*) AS n_calls
  FROM mcost GROUP BY tracked_mention_id)"""
