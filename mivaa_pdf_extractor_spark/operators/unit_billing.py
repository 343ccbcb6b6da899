"""Per-unit / per-generation / firecrawl billing calculators.

Reference: ``app/config/ai_pricing.py`` (the non-token billing paths;
token pricing is pinned by ``ai_cost_per_call``) —

- ``EXTERNAL_SERVICE_PRICING`` (:377-487): 14 per-unit services;
  ``calculate_external_service_cost`` (:669-712) raw = cost_per_unit
  × units, billed = raw × 1.50 markup, credits = billed × 100; an
  unknown service raises with the pinned message carrying the Python
  list repr of the available keys in dict order.
- ``FIRECRAWL_PRICING`` + ``calculate_firecrawl_cost`` (:352-360,
  :648-666): cost = credits_used × $0.001; an UNKNOWN operation
  silently falls back to the ``firecrawl-scrape`` rate (pinned).
- ``REPLICATE_PRICING`` + ``calculate_replicate_cost`` (:258-349,
  :770-815): the admin DB overlay wins when its
  ``cost_per_generation`` is TRUTHY — a zero-priced overlay row falls
  through to the static table (pinned); overlay markup ``or`` falls
  back to 1.50; unknown models raise the pinned message.

Scale: every calculator is a broadcast lookup join of a literal
pricing table against the event stream — map-side, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MARKUP = 1.50  # ai_pricing.py:34

# ai_pricing.py:377-487 — (service, cost_per_unit, unit), dict order
EXTERNAL_SERVICES = (
    ("zernio-whatsapp", 0.005, "message"),
    ("apollo-enrich", 0.05, "enrichment"),
    ("apollo-people-match", 0.03, "lookup"),
    ("hunter-email-finder", 0.01, "search"),
    ("hunter-domain-search", 0.01, "search"),
    ("zerobounce-validate", 0.008, "validation"),
    ("sam-segment", 0.013, "segmentation"),
    ("image-inpaint", 0.020, "inpaint"),
    ("inpaint-flux-fill-pro", 0.050, "inpaint"),
    ("inpaint-flux-fill-dev", 0.025, "inpaint"),
    ("inpaint-sd-inpainting", 0.003, "inpaint"),
    ("inpaint-anydoor", 0.020, "inpaint"),
    ("image-analyze", 0.013, "analysis"),
    ("inpaint-prompt", 0.007, "prompt"),
)

FIRECRAWL_COST_PER_CREDIT = 0.001  # :354
FIRECRAWL_TOKENS_PER_CREDIT = 15   # :355

# ai_pricing.py:258-349 — (model, cost_per_generation), dict order
REPLICATE_MODELS = (
    ("flux-2-pro", 0.05),
    ("flux-dev", 0.025),
    ("flux-schnell", 0.003),
    ("sdxl", 0.01),
    ("playground-v2.5", 0.01),
    ("sd3", 0.055),
    ("comfyui-interior-remodel", 0.02),
    ("interiorly-gen1-dev", 0.015),
    ("designer-architecture", 0.018),
    ("interior-v2", 0.02),
    ("adirik-interior-design", 0.015),
    ("interior-design-sdxl", 0.015),
)

_AVAILABLE_MSG = (
    "Service {name} not found in EXTERNAL_SERVICE_PRICING. "
    "Available: " + repr([s for s, _c, _u in EXTERNAL_SERVICES]))


def external_service_cost(events: DataFrame, *,
                          include_markup: bool = True) -> DataFrame:
    """``events``: (event_id long, service_name string, units int)."""
    spark = events.sparkSession
    table = F.broadcast(spark.createDataFrame(
        [(s, c, u) for s, c, u in EXTERNAL_SERVICES],
        "service_name string, cost_per_unit double, "
        "unit_type string"))
    j = events.join(table, "service_name", "left")
    ok = F.col("cost_per_unit").isNotNull()
    raw = F.col("cost_per_unit") * F.col("units")
    billed = raw * MARKUP if include_markup else raw
    return j.select(
        "event_id", "service_name",
        ok.alias("ok"),
        F.when(ok, raw).alias("raw_cost_usd"),
        F.when(ok, billed).alias("billed_cost_usd"),
        F.when(ok, F.lit(MARKUP)).alias("markup_multiplier"),
        F.when(ok, billed * 100).alias("credits_to_debit"),
        F.col("units"),
        "unit_type", "cost_per_unit",
        F.when(~ok, F.concat(
            F.lit("Service "), F.col("service_name"),
            F.lit(_AVAILABLE_MSG.split("{name}")[1])))
        .alias("error"))


def firecrawl_cost(events: DataFrame) -> DataFrame:
    """``events``: (event_id long, operation string, credits_used
    int). Unknown operations fall back to the scrape rate."""
    cost = F.col("credits_used") * F.lit(FIRECRAWL_COST_PER_CREDIT)
    return events.select(
        "event_id", "operation", "credits_used",
        (F.col("operation") != "firecrawl-scrape")
        .alias("used_fallback_rate"),
        cost.alias("cost_usd"),
        (F.col("credits_used") * FIRECRAWL_TOKENS_PER_CREDIT)
        .alias("tokens_equivalent"))


def replicate_cost(events: DataFrame,
                   overlay: DataFrame) -> DataFrame:
    """``events``: (event_id long, model string, num_generations
    int). ``overlay``: admin DB rows (model, cost_per_generation
    double?, markup double?) — wins only when cost_per_generation is
    truthy (a 0.0 row falls through to the static table)."""
    spark = events.sparkSession
    static = F.broadcast(spark.createDataFrame(
        list(REPLICATE_MODELS),
        "model string, s_cost double"))
    ov = F.broadcast(overlay.select(
        "model", F.col("cost_per_generation").alias("o_cost"),
        F.col("markup").alias("o_markup")))
    j = events.join(ov, "model", "left").join(static, "model", "left")
    use_overlay = F.coalesce(F.col("o_cost") != 0.0, F.lit(False))
    cost = F.when(use_overlay, F.col("o_cost")) \
        .otherwise(F.col("s_cost"))
    markup = F.when(use_overlay,
                    F.coalesce(F.col("o_markup"), F.lit(MARKUP))) \
        .otherwise(F.lit(MARKUP))
    ok = cost.isNotNull()
    raw = cost * F.col("num_generations")
    billed = raw * markup
    return j.select(
        "event_id", "model", "num_generations",
        ok.alias("ok"),
        use_overlay.alias("used_overlay"),
        F.when(ok, cost).alias("cost_per_generation"),
        F.when(ok, raw).alias("raw_cost_usd"),
        F.when(ok, billed).alias("billed_cost_usd"),
        F.when(ok, markup).alias("markup_multiplier"),
        F.when(ok, billed * 100).alias("credits_to_debit"),
        F.when(~ok, F.concat(
            F.lit("Model "), F.col("model"),
            F.lit(" is not configured for per-generation billing")))
        .alias("error"))


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

_EXT_NAMES = tuple(s for s, _c, _u in EXTERNAL_SERVICES) + (
    "twilio-sms", "unknown-svc")

REPLICATE_OVERLAY = (
    # (model, cost_per_generation, markup) — 0.0 cost pins the
    # truthiness fall-through; NULL markup pins the `or 1.5` default
    ("flux-dev", 0.04, 2.0),
    ("sdxl", 0.0, 3.0),
    ("interior-v2", 0.03, None),
)

_REP_NAMES = tuple(m for m, _c in REPLICATE_MODELS) + (
    "mystery-model",)


def synth_external_events(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    names = F.array(*[F.lit(s) for s in _EXT_NAMES])
    return d.select(
        F.col("doc").alias("event_id"),
        F.element_at(names, (F.col("doc") % len(_EXT_NAMES) + 1)
                     .cast("int")).alias("service_name"),
        (F.col("doc") % 50 + 1).cast("int").alias("units"))


def synth_firecrawl_events(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    return d.select(
        F.col("doc").alias("event_id"),
        F.when(F.col("doc") % 4 == 0, F.lit("firecrawl-crawl"))
        .otherwise(F.lit("firecrawl-scrape")).alias("operation"),
        (F.col("doc") % 30).cast("int").alias("credits_used"))


def synth_replicate_events(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    names = F.array(*[F.lit(m) for m in _REP_NAMES])
    return d.select(
        F.col("doc").alias("event_id"),
        F.element_at(names, (F.col("doc") % len(_REP_NAMES) + 1)
                     .cast("int")).alias("model"),
        (F.col("doc") % 7 + 1).cast("int").alias("num_generations"))


def synth_replicate_overlay(spark) -> DataFrame:
    return spark.createDataFrame(
        list(REPLICATE_OVERLAY),
        "model string, cost_per_generation double, markup double")


def _sql_lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def duck_external_sql() -> str:
    table = ",\n    ".join(
        f"({_sql_lit(s)}, CAST({c} AS DOUBLE), {_sql_lit(u)})"
        for s, c, u in EXTERNAL_SERVICES)
    names = ", ".join(_sql_lit(s) for s in _EXT_NAMES)
    tail = _sql_lit(_AVAILABLE_MSG.split("{name}")[1])
    return f"""
exttab(service_name, cost_per_unit, unit_type) AS (VALUES
    {table}),
extev AS (
  SELECT doc AS event_id,
         ([{names}])[CAST(doc % {len(_EXT_NAMES)} AS INT) + 1]
           AS service_name,
         CAST(doc % 50 + 1 AS INT) AS units
  FROM docs),
extcost AS (
  SELECT e.event_id, e.service_name,
         t.cost_per_unit IS NOT NULL AS ok,
         t.cost_per_unit * e.units AS raw_cost_usd,
         t.cost_per_unit * e.units * {MARKUP} AS billed_cost_usd,
         CASE WHEN t.cost_per_unit IS NOT NULL
              THEN CAST({MARKUP} AS DOUBLE) END AS markup_multiplier,
         t.cost_per_unit * e.units * {MARKUP} * 100
           AS credits_to_debit,
         e.units, t.unit_type, t.cost_per_unit,
         CASE WHEN t.cost_per_unit IS NULL
              THEN 'Service ' || e.service_name || {tail} END
           AS error
  FROM extev e LEFT JOIN exttab t
    ON e.service_name = t.service_name)"""


DUCK_FIRECRAWL_SQL = f"""
fcev AS (
  SELECT doc AS event_id,
         CASE WHEN doc % 4 = 0 THEN 'firecrawl-crawl'
              ELSE 'firecrawl-scrape' END AS operation,
         CAST(doc % 30 AS INT) AS credits_used
  FROM docs),
fccost AS (
  SELECT event_id, operation, credits_used,
         operation != 'firecrawl-scrape' AS used_fallback_rate,
         credits_used * CAST({FIRECRAWL_COST_PER_CREDIT} AS DOUBLE)
           AS cost_usd,
         credits_used * {FIRECRAWL_TOKENS_PER_CREDIT}
           AS tokens_equivalent
  FROM fcev)"""


def duck_replicate_sql() -> str:
    static = ",\n    ".join(
        f"({_sql_lit(m)}, CAST({c} AS DOUBLE))"
        for m, c in REPLICATE_MODELS)
    overlay = ",\n    ".join(
        f"({_sql_lit(m)}, CAST({c} AS DOUBLE), "
        + (f"CAST({mk} AS DOUBLE)" if mk is not None
           else "CAST(NULL AS DOUBLE)") + ")"
        for m, c, mk in REPLICATE_OVERLAY)
    names = ", ".join(_sql_lit(m) for m in _REP_NAMES)
    return f"""
repstat(model, s_cost) AS (VALUES
    {static}),
repov(model, o_cost, o_markup) AS (VALUES
    {overlay}),
repev AS (
  SELECT doc AS event_id,
         ([{names}])[CAST(doc % {len(_REP_NAMES)} AS INT) + 1]
           AS model,
         CAST(doc % 7 + 1 AS INT) AS num_generations
  FROM docs),
repcost AS (
  SELECT e.event_id, e.model, e.num_generations,
         cost IS NOT NULL AS ok,
         use_overlay AS used_overlay,
         cost AS cost_per_generation,
         cost * e.num_generations AS raw_cost_usd,
         cost * e.num_generations * mk AS billed_cost_usd,
         CASE WHEN cost IS NOT NULL THEN mk END
           AS markup_multiplier,
         cost * e.num_generations * mk * 100 AS credits_to_debit,
         CASE WHEN cost IS NULL
              THEN 'Model ' || e.model
                   || ' is not configured for per-generation billing'
         END AS error
  FROM (
    SELECT ev.*,
           COALESCE(o.o_cost != 0.0, false) AS use_overlay,
           CASE WHEN COALESCE(o.o_cost != 0.0, false) THEN o.o_cost
                ELSE s.s_cost END AS cost,
           CASE WHEN COALESCE(o.o_cost != 0.0, false)
                THEN COALESCE(o.o_markup, CAST({MARKUP} AS DOUBLE))
                ELSE CAST({MARKUP} AS DOUBLE) END AS mk
    FROM repev ev
    LEFT JOIN repov o ON ev.model = o.model
    LEFT JOIN repstat s ON ev.model = s.model) e)"""
