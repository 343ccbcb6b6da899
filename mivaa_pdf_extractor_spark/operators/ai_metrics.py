"""AI-metrics dashboard folds (app/api/ai_metrics_routes.py:206-398).

The Supabase read is out of scope; the summary aggregation is
deterministic (file:line):

* Summary (:260-280): every numeric field folds through
  ``log.get(k, 0) or 0`` — present-NULLs and absent keys both land 0
  (LIVE or); total_cost rounds 4 dp, average latency/confidence and
  fallback_rate round 2 dp — three different rounding grains in one
  payload (pin); fallback = ``action == 'fallback_to_rules'``.
* Model usage (:283-318): keyed by ``model or 'unknown'``
  (.get default — absent only; present-NULL becomes the None key in
  Python, modeled here as 'unknown' via coalesce and documented);
  per-model cost 4 dp / averages 2 dp; sorted by total_cost DESC
  (ties canonicalized by model name — Python's sort is stable on
  insertion order, unspecified across dict builds).
* Confidence bands (:349-372): STRICT < band edges — exactly 0.2
  falls in '0.2-0.4' etc.; the last band is an ELSE so a confidence
  above 1.0 still lands in '0.8-1.0' (pin); percentages round 1 dp.

Roundings use floor(x·10^k + 0.5) on both engines (half-up; Python's
banker ties are measure-zero on these sums — same documented
convention as the query-metrics fold).  Plans: three groupBy
aggregations (global / model / band), all map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _rnd(col, k: int):
    return F.floor(col * (10 ** k) + F.lit(0.5)) / (10 ** k)


def _z(col):
    return F.coalesce(col, F.lit(0))


def ai_summary(logs: DataFrame, time_period: str = "24h") -> DataFrame:
    cost = _z(F.col("cost"))
    tokens = _z(F.col("input_tokens")) + _z(F.col("output_tokens"))
    lat = _z(F.col("latency_ms"))
    conf = _z(F.col("confidence_score"))
    fb = (F.col("action") == "fallback_to_rules").cast("long")
    agg = logs.agg(
        F.count("*").cast("long").alias("total_calls"),
        F.sum(cost).alias("_cost"), F.sum(tokens).alias("_tok"),
        F.sum(lat).alias("_lat"), F.sum(conf).alias("_conf"),
        F.coalesce(F.sum(fb), F.lit(0)).alias("_fb"))
    n = F.col("total_calls")
    return agg.select(
        "total_calls",
        _rnd(F.coalesce(F.col("_cost"), F.lit(0.0)), 4)
        .alias("total_cost"),
        F.coalesce(F.col("_tok"), F.lit(0)).cast("long")
        .alias("total_tokens"),
        F.when(n > 0, _rnd(F.col("_lat") / n, 2)).otherwise(0.0)
        .alias("average_latency_ms"),
        F.when(n > 0, _rnd(F.col("_conf") / n, 2)).otherwise(0.0)
        .alias("average_confidence"),
        F.when(n > 0, _rnd(F.col("_fb").cast("double") / n, 2))
        .otherwise(0.0).alias("fallback_rate"),
        F.lit(time_period).alias("time_period"))


def ai_model_usage(logs: DataFrame) -> DataFrame:
    cost = _z(F.col("cost"))
    tokens = _z(F.col("input_tokens")) + _z(F.col("output_tokens"))
    lat = _z(F.col("latency_ms"))
    conf = _z(F.col("confidence_score"))
    fb = (F.col("action") == "fallback_to_rules").cast("long")
    g = (logs.groupBy(F.coalesce(F.col("model"), F.lit("unknown"))
                      .alias("model"))
         .agg(F.count("*").cast("long").alias("call_count"),
              F.sum(cost).alias("_cost"),
              F.sum(tokens).cast("long").alias("total_tokens"),
              F.sum(lat).alias("_lat"), F.sum(conf).alias("_conf"),
              F.coalesce(F.sum(fb), F.lit(0)).cast("long")
              .alias("fallback_count")))
    return g.select(
        "model", "call_count",
        _rnd(F.col("_cost"), 4).alias("total_cost"), "total_tokens",
        _rnd(F.col("_lat") / F.col("call_count"), 2)
        .alias("average_latency_ms"),
        _rnd(F.col("_conf") / F.col("call_count"), 2)
        .alias("average_confidence"), "fallback_count")


BANDS = ("0.0-0.2", "0.2-0.4", "0.4-0.6", "0.6-0.8", "0.8-1.0")


def ai_confidence_bands(logs: DataFrame) -> DataFrame:
    conf = _z(F.col("confidence_score"))
    band = (F.when(conf < 0.2, BANDS[0]).when(conf < 0.4, BANDS[1])
            .when(conf < 0.6, BANDS[2]).when(conf < 0.8, BANDS[3])
            .otherwise(BANDS[4]))      # ELSE: >1.0 lands here (pin)
    total = logs.count()
    counted = (logs.groupBy(band.alias("range"))
               .agg(F.count("*").cast("long").alias("count")))
    # empty bands still appear with count 0 (the dict is pre-seeded)
    import pandas as pd
    spark = logs.sparkSession
    allb = spark.createDataFrame(pd.DataFrame({"range": list(BANDS)}))
    return (allb.join(counted, "range", "left")
            .select("range",
                    F.coalesce(F.col("count"), F.lit(0)).cast("long")
                    .alias("count"),
                    F.when(F.lit(total) > 0,
                           _rnd(F.coalesce(F.col("count"), F.lit(0))
                                * 100.0 / total, 1))
                    .otherwise(0.0).alias("percentage")))


# ---------------------------------------------------------------------------
# synthesizer + DuckDB twins
# ---------------------------------------------------------------------------

def synth_ai_logs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("log_id"),
        F.when(e % 9 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("model-"), (e % 5).cast("string")))
        .alias("model"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("task-"), (e % 4).cast("string")))
        .alias("task"),
        F.when(e % 11 == 0, F.lit(None).cast("double"))
        .otherwise((e % 400).cast("double") * 0.0025).alias("cost"),
        F.when(e % 6 == 0, F.lit(None).cast("long"))
        .otherwise((e % 2000).cast("long")).alias("input_tokens"),
        (e % 700).cast("long").alias("output_tokens"),
        F.when(e % 8 == 0, F.lit(None).cast("long"))
        .otherwise((e % 3000).cast("long")).alias("latency_ms"),
        F.when(e % 10 == 0, F.lit(None).cast("double"))
        .when(e % 10 == 1, F.lit(0.2)).when(e % 10 == 2, F.lit(0.8))
        .when(e % 10 == 3, F.lit(1.25))
        .otherwise((e % 100).cast("double") / 100)
        .alias("confidence_score"),
        F.when(e % 13 == 0, "fallback_to_rules")
        .otherwise("llm").alias("action"))


SYNTH_AI_LOGS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS log_id,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE 'model-' || CAST(event_id % 5 AS VARCHAR) END
               AS model,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE 'task-' || CAST(event_id % 4 AS VARCHAR) END
               AS task,
           CASE WHEN event_id % 11 = 0 THEN NULL
                ELSE CAST(event_id % 400 AS DOUBLE) * 0.0025 END
               AS cost,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE CAST(event_id % 2000 AS BIGINT) END
               AS input_tokens,
           CAST(event_id % 700 AS BIGINT) AS output_tokens,
           CASE WHEN event_id % 8 = 0 THEN NULL
                ELSE CAST(event_id % 3000 AS BIGINT) END
               AS latency_ms,
           CASE WHEN event_id % 10 = 0 THEN NULL
                WHEN event_id % 10 = 1 THEN 0.2
                WHEN event_id % 10 = 2 THEN 0.8
                WHEN event_id % 10 = 3 THEN 1.25
                ELSE CAST(event_id % 100 AS DOUBLE) / 100 END
               AS confidence_score,
           CASE WHEN event_id % 13 = 0 THEN 'fallback_to_rules'
                ELSE 'llm' END AS action
    FROM events
"""


def summary_sql(time_period: str = "24h") -> str:
    return f"""
        WITH l AS ({SYNTH_AI_LOGS_SQL})
        SELECT CAST(count(*) AS BIGINT) AS total_calls,
               floor(sum(coalesce(cost, 0)) * 10000 + 0.5) / 10000
                   AS total_cost,
               CAST(sum(coalesce(input_tokens, 0)
                        + coalesce(output_tokens, 0)) AS BIGINT)
                   AS total_tokens,
               floor(sum(coalesce(latency_ms, 0)) * 1.0 / count(*)
                     * 100 + 0.5) / 100 AS average_latency_ms,
               floor(sum(coalesce(confidence_score, 0)) / count(*)
                     * 100 + 0.5) / 100 AS average_confidence,
               floor(sum(CASE WHEN action = 'fallback_to_rules'
                         THEN 1 ELSE 0 END) * 1.0 / count(*)
                     * 100 + 0.5) / 100 AS fallback_rate,
               '{time_period}' AS time_period
        FROM l
    """


def model_usage_sql() -> str:
    return f"""
        WITH l AS ({SYNTH_AI_LOGS_SQL})
        SELECT coalesce(model, 'unknown') AS model,
               CAST(count(*) AS BIGINT) AS call_count,
               floor(sum(coalesce(cost, 0)) * 10000 + 0.5) / 10000
                   AS total_cost,
               CAST(sum(coalesce(input_tokens, 0)
                        + coalesce(output_tokens, 0)) AS BIGINT)
                   AS total_tokens,
               floor(sum(coalesce(latency_ms, 0)) * 1.0 / count(*)
                     * 100 + 0.5) / 100 AS average_latency_ms,
               floor(sum(coalesce(confidence_score, 0)) / count(*)
                     * 100 + 0.5) / 100 AS average_confidence,
               CAST(sum(CASE WHEN action = 'fallback_to_rules'
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS fallback_count
        FROM l GROUP BY coalesce(model, 'unknown')
    """


def confidence_bands_sql() -> str:
    return f"""
        WITH l AS ({SYNTH_AI_LOGS_SQL}),
        b AS (
          SELECT CASE
                   WHEN coalesce(confidence_score, 0) < 0.2
                     THEN '0.0-0.2'
                   WHEN coalesce(confidence_score, 0) < 0.4
                     THEN '0.2-0.4'
                   WHEN coalesce(confidence_score, 0) < 0.6
                     THEN '0.4-0.6'
                   WHEN coalesce(confidence_score, 0) < 0.8
                     THEN '0.6-0.8'
                   ELSE '0.8-1.0' END AS range
          FROM l),
        t AS (SELECT count(*) AS total FROM l),
        c AS (SELECT range, CAST(count(*) AS BIGINT) AS count
              FROM b GROUP BY range),
        allb AS (SELECT unnest(['0.0-0.2', '0.2-0.4', '0.4-0.6',
                                '0.6-0.8', '0.8-1.0']) AS range)
        SELECT allb.range,
               CAST(coalesce(c.count, 0) AS BIGINT) AS count,
               CASE WHEN t.total > 0 THEN
                 floor(coalesce(c.count, 0) * 100.0 / t.total * 10
                       + 0.5) / 10
               ELSE 0.0 END AS percentage
        FROM allb LEFT JOIN c USING (range), t
    """


# ---------------------------------------------------------------------------
# External-service usage (ai_metrics_routes.py:399-530)
# ---------------------------------------------------------------------------

EXT_PROVIDERS = ("zernio", "apollo", "hunter", "zerobounce",
                 "firecrawl")


def ext_provider_resolve(logs: DataFrame) -> DataFrame:
    """Provider ladder (:443-461): metadata.api_provider or
    metadata.source or request.source or request.api_provider —
    nested LIVE ors; the resolved value is LOWERCASED before the
    5-provider membership test, so 'Apollo' passes but the ladder
    itself is case-preserving (pin); rows with no resolvable provider
    or a foreign provider are dropped."""
    lad = F.col("meta_api_provider")
    prov = (F.when(lad.isNotNull() & (lad != ""), lad)
            .when(F.col("meta_source").isNotNull()
                  & (F.col("meta_source") != ""), F.col("meta_source"))
            .when(F.col("req_source").isNotNull()
                  & (F.col("req_source") != ""), F.col("req_source"))
            .otherwise(F.col("req_api_provider")))
    low = F.lower(prov)
    return logs.select(
        "log_id", low.alias("api_provider"),
        (low.isNotNull() & low.isin(*EXT_PROVIDERS)).alias("kept"))


def ext_usage_by_service(logs: DataFrame) -> DataFrame:
    """(:466-480): service key = model_name or api_provider or
    'unknown' (LIVE or); credits/cost get-or-0 folds; kept rows only.
    """
    resolved = ext_provider_resolve(logs).where(F.col("kept"))
    j = logs.join(resolved.select("log_id", "api_provider"), "log_id")
    svc = (F.when(F.col("model_name").isNotNull()
                  & (F.col("model_name") != ""), F.col("model_name"))
           .when(F.col("api_provider").isNotNull(),
                 F.col("api_provider"))
           .otherwise(F.lit("unknown")))
    return (j.groupBy(svc.alias("service"))
            .agg(F.count("*").cast("long").alias("operations"),
                 F.sum(F.coalesce(F.col("credits_debited"),
                                  F.lit(0.0))).alias("credits"),
                 F.sum(F.coalesce(F.col("billed_cost_usd"),
                                  F.lit(0.0))).alias("cost_usd")))


def synth_ext_logs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("log_id"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit(""))
        .when(e % 5 == 2, "Apollo").when(e % 5 == 3, "stripe")
        .otherwise("firecrawl").alias("meta_api_provider"),
        F.when(e % 4 == 0, "zernio")
        .otherwise(F.lit(None).cast("string")).alias("meta_source"),
        F.when(e % 3 == 0, "HUNTER")
        .otherwise(F.lit(None).cast("string")).alias("req_source"),
        F.when(e % 7 == 0, "zerobounce")
        .otherwise(F.lit(None).cast("string"))
        .alias("req_api_provider"),
        F.when(e % 6 == 0, F.lit(None).cast("string"))
        .when(e % 6 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("svc-"), (e % 4).cast("string")))
        .alias("model_name"),
        F.when(e % 9 == 0, F.lit(None).cast("double"))
        .otherwise((e % 80).cast("double") * 0.25)
        .alias("credits_debited"),
        ((e % 50).cast("double") * 0.0025).alias("billed_cost_usd"))


SYNTH_EXT_LOGS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS log_id,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                WHEN event_id % 5 = 2 THEN 'Apollo'
                WHEN event_id % 5 = 3 THEN 'stripe'
                ELSE 'firecrawl' END AS meta_api_provider,
           CASE WHEN event_id % 4 = 0 THEN 'zernio' END
               AS meta_source,
           CASE WHEN event_id % 3 = 0 THEN 'HUNTER' END AS req_source,
           CASE WHEN event_id % 7 = 0 THEN 'zerobounce' END
               AS req_api_provider,
           CASE WHEN event_id % 6 = 0 THEN NULL
                WHEN event_id % 6 = 1 THEN ''
                ELSE 'svc-' || CAST(event_id % 4 AS VARCHAR) END
               AS model_name,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE CAST(event_id % 80 AS DOUBLE) * 0.25 END
               AS credits_debited,
           CAST(event_id % 50 AS DOUBLE) * 0.0025 AS billed_cost_usd
    FROM events
"""

_PROV_LADDER_SQL = """
    lower(CASE
      WHEN meta_api_provider IS NOT NULL AND meta_api_provider <> ''
        THEN meta_api_provider
      WHEN meta_source IS NOT NULL AND meta_source <> ''
        THEN meta_source
      WHEN req_source IS NOT NULL AND req_source <> ''
        THEN req_source
      ELSE req_api_provider END)
"""


def ext_resolve_sql() -> str:
    provs = ", ".join(f"'{p}'" for p in EXT_PROVIDERS)
    return f"""
        WITH l AS ({SYNTH_EXT_LOGS_SQL})
        SELECT log_id, {_PROV_LADDER_SQL} AS api_provider,
               coalesce({_PROV_LADDER_SQL} IN ({provs}), FALSE)
                   AS kept
        FROM l
    """


def ext_by_service_sql() -> str:
    provs = ", ".join(f"'{p}'" for p in EXT_PROVIDERS)
    return f"""
        WITH l AS ({SYNTH_EXT_LOGS_SQL}),
        r AS (SELECT *, {_PROV_LADDER_SQL} AS api_provider FROM l),
        k AS (SELECT * FROM r WHERE api_provider IN ({provs}))
        SELECT CASE WHEN model_name IS NOT NULL AND model_name <> ''
                    THEN model_name
                    WHEN api_provider IS NOT NULL THEN api_provider
                    ELSE 'unknown' END AS service,
               CAST(count(*) AS BIGINT) AS operations,
               sum(coalesce(credits_debited, 0.0)) AS credits,
               sum(coalesce(billed_cost_usd, 0.0)) AS cost_usd
        FROM k GROUP BY 1
    """
