"""AI cost-accounting tier: pricing resolution, per-call billing, the
two-axis multimodal bill, and the idempotent usage rollup.

Re-expresses the reference's centralized AI billing stack as batch
DataFrame plans:

- pricing resolution  — app/config/ai_pricing.py:505-548
  (``get_model_pricing``: DB-overlay rows win over the hardcoded tables;
  the overlay lookup is itself exact-then-substring (``_db_lookup``,
  ai_pricing.py:81-93), so an overlay FUZZY hit beats a static EXACT
  hit; static exact match is case-sensitive dict access while both fuzzy
  tiers lowercase; fuzzy scans the merged dict in insertion order and
  the FIRST match wins; everything else falls to the $3/$15 default)
- markup              — ai_pricing.py:95-101 (``get_model_markup``: the
  overlay row's markup applies whenever the row EXISTS — even a
  zero-price row that could not supply prices — else the platform 1.50)
- per-call cost       — ai_pricing.py:550-595 (``calculate_cost``:
  tokens/1M x price, markup, credits at 1 credit = $0.01)
- multimodal cost     — ai_pricing.py:595-647
  (``calculate_multimodal_embedding_cost``: token term PLUS per-image
  pixel term clamped to [50k, 2M] billable pixels at $0.60/1e9)
- idempotent rollup   — app/services/core/ai_call_logger.py:87-140
  (``log_ai_call``'s retry guard: duplicate inserts keyed by
  (task, model, job_id, input_tokens, output_tokens, latency_ms) are
  dropped, first insert wins) feeding the usage-analytics aggregate.

Money is integer pico-USD throughout (price-per-1M-USD x 1e6 = pico-USD
per token; $0.60/1e9 pixels = 600 pico per pixel) so Spark and DuckDB
agree bit-for-bit — the same integer micro-unit pattern the n-gram LM
uses. Every reference price has <= 2 decimals, so the pico conversion is
exact; billed = raw x markup_pct DIV 100 uses integer floor-division in
lockstep on both engines (all quantities non-negative).

Scale notes: resolution runs on the DISTINCT model vocabulary (bounded —
a deployment bills tens of models, not millions), so the non-equi fuzzy
match is a tiny-x-tiny broadcast nested loop; the per-call table only
ever sees one broadcast hash join on the model string. The rollup is a
single map-side-combinable shuffle on (task, model). No UDFs, no
collects, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

# Static pricing tables, merged in the reference's get_all_pricing()
# insertion order (ai_pricing.py:490-503: CLAUDE, EMBEDDING, VOYAGE,
# VISION, VISUAL_EMBEDDING, PADDLEOCR, REPLICATE) — the order IS the
# fuzzy-match priority. (model_key, input_pico_per_token,
# output_pico_per_token). Time-based / per-generation models carry 0/0
# token prices exactly as the reference dicts do, so a fuzzy hit on them
# resolves to zero token cost rather than falling to the default tier.
STATIC_PRICING = (
    ("claude-opus-4-8", 15_000_000, 75_000_000),       # ai_pricing.py:103-117
    ("claude-haiku-4-5", 1_000_000, 5_000_000),
    ("text-embedding-3-small", 20_000, 0),             # :121-137
    ("text-embedding-3-large", 130_000, 0),
    ("voyage-4", 60_000, 0),                           # :139-168
    ("voyage-multimodal-3.5", 120_000, 0),
    ("voyage-multimodal-3", 120_000, 0),
    ("clip-vit-large-patch14", 0, 0),                  # :185-193 (vision, free)
    ("slig-768d", 0, 0),                               # :209-235 (time-based)
    ("siglip2-base-patch16-512", 0, 0),
    ("paddleocr-vl", 0, 0),                            # :238-252 (time-based)
    ("flux-2-pro", 0, 0),                              # :258-» (per-generation)
    ("flux-dev", 0, 0),
    ("flux-schnell", 0, 0),
)

# get_model_pricing's conservative fallback (ai_pricing.py:544-548).
DEFAULT_INPUT_PICO = 3_000_000
DEFAULT_OUTPUT_PICO = 15_000_000

MARKUP_PCT = 150  # MARKUP_MULTIPLIER = 1.50 (ai_pricing.py:57)

# MULTIMODAL_PIXEL_PRICING (ai_pricing.py:171-183): $0.60 per 1e9 pixels,
# per-image clamp to [50k, 2M] billable pixels.
PIXEL_PICO_PER_PIXEL = 600
MIN_BILLABLE_PIXELS = 50_000
MAX_BILLABLE_PIXELS = 2_000_000

# The admin `ai_model_pricing` overlay table (_get_db_pricing,
# ai_pricing.py:46-79). Fixed admin rows, shared verbatim with the DuckDB
# twin: (model_key lowercased, input_pico, output_pico, markup_pct or
# None). A NULL markup falls back to the platform default exactly like
# the reference's `or cls.MARKUP_MULTIPLIER`; a zero-price row cannot
# supply prices (get_model_pricing skips it) but its markup still rules.
OVERLAY_ROWS = (
    ("claude-haiku-4-5", 800_000, 4_000_000, 120),
    ("text-embedding-3-small", 0, 0, 110),
    ("custom-finetune-7b", 2_500_000, 9_000_000, None),
)


# ---------------------------------------------------------------------------
# DuckDB twins — MUST stay in expression-lockstep with the Column
# derivations below (the contract oracles CTE these).
# ---------------------------------------------------------------------------

SYNTH_AI_CALLS_SQL = """
    SELECT event_id AS call_id,
           CASE WHEN user_id % 4 = 0 THEN 'document_classification'
                WHEN user_id % 4 = 1 THEN 'product_extraction'
                WHEN user_id % 4 = 2 THEN 'query_parsing'
                ELSE 'reranking' END AS task,
           CASE WHEN event_id % 9 = 0 THEN 'claude-opus-4-8'
                WHEN event_id % 9 = 1 THEN 'claude-haiku-4-5'
                WHEN event_id % 9 = 2 THEN 'Claude-Opus-4-8-20260115'
                WHEN event_id % 9 = 3 THEN 'voyage'
                WHEN event_id % 9 = 4 THEN 'text-embedding-3-small'
                WHEN event_id % 9 = 5 THEN 'claude'
                WHEN event_id % 9 = 6 THEN 'experimental-llm-x'
                WHEN event_id % 9 = 7 THEN 'custom-finetune-7b-latest'
                ELSE 'flux-schnell' END AS model,
           (user_id * 31 + event_id) % 50 AS job_id,
           event_id % 2000 + 1 AS input_tokens,
           (event_id * 7) % 500 AS output_tokens,
           event_id % 900 + 20 AS latency_ms,
           CASE WHEN event_id % 11 = 0 THEN 'fallback_to_rules'
                ELSE 'use_ai_result' END AS action,
           user_id % 6 AS workspace_id
    FROM events"""

SYNTH_PAGE_EMBED_SQL = """
    SELECT event_id AS call_id,
           CAST(CASE WHEN event_id % 7 = 0 THEN 0
                     WHEN event_id % 7 = 1 THEN 20000
                     WHEN event_id % 7 = 2 THEN 50000
                     WHEN event_id % 7 = 3 THEN 2000000
                     WHEN event_id % 7 = 4 THEN 2500000
                     ELSE (event_id * 4099) % 2400000 END AS BIGINT)
               AS image_pixels,
           event_id % 300 AS text_tokens
    FROM events"""


def _values_sql() -> tuple[str, str]:
    """(prices, overlay) VALUES-table SQL built from the same constants
    the Spark dims use, so the two engines cannot drift."""
    p = ", ".join(f"('{k}', {i}, {o}, {pri})"
                  for pri, (k, i, o) in enumerate(STATIC_PRICING))
    ov = ", ".join(
        f"('{k}', {i}, {o}, "
        f"{'CAST(NULL AS INTEGER)' if m is None else m}, {pri})"
        for pri, (k, i, o, m) in enumerate(OVERLAY_ROWS))
    return (f"SELECT * FROM (VALUES {p}) AS t"
            f"(model_key, input_pico, output_pico, priority)",
            f"SELECT * FROM (VALUES {ov}) AS t"
            f"(model_key, input_pico, output_pico, markup_pct, priority)")


def resolution_sql_ctes() -> str:
    """The shared resolution CTE chain (everything through `resolved`),
    expecting a `calls(model, ...)` CTE upstream. Tier-for-tier twin of
    resolve_pricing()."""
    prices_sql, overlay_sql = _values_sql()
    tier = """CASE WHEN oe.model IS NOT NULL
                        AND (oe.oe_in > 0 OR oe.oe_out > 0)
                   THEN 'overlay_exact'
                   WHEN oe.model IS NULL AND ofz.model IS NOT NULL
                        AND (ofz.of_in > 0 OR ofz.of_out > 0)
                   THEN 'overlay_fuzzy'
                   WHEN se.model IS NOT NULL THEN 'static_exact'
                   WHEN sfz.model IS NOT NULL THEN 'static_fuzzy'
                   ELSE 'default' END"""
    return f"""
    prices AS ({prices_sql}),
    overlay AS ({overlay_sql}),
    models AS (SELECT DISTINCT model, lower(model) AS ml FROM calls),
    oe AS (SELECT m.model, o.input_pico AS oe_in, o.output_pico AS oe_out,
                  o.markup_pct AS oe_mk
           FROM models m JOIN overlay o ON m.ml = o.model_key),
    ofz AS (SELECT model, of_in, of_out, of_mk FROM (
            SELECT m.model, o.input_pico AS of_in,
                   o.output_pico AS of_out, o.markup_pct AS of_mk,
                   row_number() OVER (PARTITION BY m.model
                                      ORDER BY o.priority) AS rn
            FROM models m JOIN overlay o
              ON strpos(m.ml, o.model_key) > 0
                 OR strpos(o.model_key, m.ml) > 0) WHERE rn = 1),
    se AS (SELECT m.model, p.input_pico AS se_in, p.output_pico AS se_out
           FROM models m JOIN prices p ON m.model = p.model_key),
    sfz AS (SELECT model, sf_in, sf_out FROM (
            SELECT m.model, p.input_pico AS sf_in,
                   p.output_pico AS sf_out,
                   row_number() OVER (PARTITION BY m.model
                                      ORDER BY p.priority) AS rn
            FROM models m JOIN prices p
              ON strpos(m.ml, p.model_key) > 0
                 OR strpos(p.model_key, m.ml) > 0) WHERE rn = 1),
    resolved0 AS (
        SELECT m.model, {tier} AS tier,
               oe.oe_in, oe.oe_out, ofz.of_in, ofz.of_out,
               se.se_in, se.se_out, sfz.sf_in, sfz.sf_out,
               coalesce(CASE WHEN oe.model IS NOT NULL
                                THEN coalesce(oe.oe_mk, {MARKUP_PCT})
                             WHEN ofz.model IS NOT NULL
                                THEN coalesce(ofz.of_mk, {MARKUP_PCT})
                        END, {MARKUP_PCT}) AS markup_pct
        FROM models m
        LEFT JOIN oe ON m.model = oe.model
        LEFT JOIN ofz ON m.model = ofz.model
        LEFT JOIN se ON m.model = se.model
        LEFT JOIN sfz ON m.model = sfz.model),
    resolved AS (
        SELECT model, tier, markup_pct,
               CASE tier WHEN 'overlay_exact' THEN oe_in
                         WHEN 'overlay_fuzzy' THEN of_in
                         WHEN 'static_exact' THEN se_in
                         WHEN 'static_fuzzy' THEN sf_in
                         ELSE {DEFAULT_INPUT_PICO} END AS input_pico,
               CASE tier WHEN 'overlay_exact' THEN oe_out
                         WHEN 'overlay_fuzzy' THEN of_out
                         WHEN 'static_exact' THEN se_out
                         WHEN 'static_fuzzy' THEN sf_out
                         ELSE {DEFAULT_OUTPUT_PICO} END AS output_pico
        FROM resolved0)"""


COSTED_SQL_CTE = """
    costed AS (
        SELECT c.call_id, c.task, c.model, c.job_id, c.workspace_id,
               c.action, c.input_tokens, c.output_tokens, c.latency_ms,
               r.tier, r.input_pico, r.output_pico, r.markup_pct,
               c.input_tokens * r.input_pico AS input_cost_pico,
               c.output_tokens * r.output_pico AS output_cost_pico,
               c.input_tokens * r.input_pico
                   + c.output_tokens * r.output_pico AS raw_cost_pico,
               ((c.input_tokens * r.input_pico
                   + c.output_tokens * r.output_pico)
                 * r.markup_pct) // 100 AS billed_cost_pico,
               (((c.input_tokens * r.input_pico
                   + c.output_tokens * r.output_pico)
                 * r.markup_pct) // 100) // 10000 AS credits_micro
        FROM calls c JOIN resolved r ON c.model = r.model)"""


def pricing_dim(spark: SparkSession) -> DataFrame:
    """Static pricing dimension with fuzzy-match priority = table order."""
    rows = [(k, i, o, p) for p, (k, i, o) in enumerate(STATIC_PRICING)]
    return spark.createDataFrame(
        rows, "model_key string, input_pico long, output_pico long, "
              "priority int")


def overlay_dim(spark: SparkSession) -> DataFrame:
    rows = [(k, i, o, m, p) for p, (k, i, o, m) in enumerate(OVERLAY_ROWS)]
    return spark.createDataFrame(
        rows, "model_key string, input_pico long, output_pico long, "
              "markup_pct int, priority int")


def synth_ai_calls(events: DataFrame) -> DataFrame:
    """Deterministic `ai_call_logs` table derived from the events
    testdata (the reference's ai_call_logs insert, ai_call_logger.py:
    142-198). The model mix deliberately exercises every resolution
    tier: static exact, overlay exact, overlay fuzzy shadowing a static
    fuzzy, case-sensitivity of the static exact tier, the ambiguous
    'claude' prefix (first merged-dict key wins), per-generation 0/0
    models, the overlay-only model, and the default fallback."""
    e = F.col("event_id")
    model = (F.when(e % 9 == 0, F.lit("claude-opus-4-8"))
             .when(e % 9 == 1, F.lit("claude-haiku-4-5"))
             .when(e % 9 == 2, F.lit("Claude-Opus-4-8-20260115"))
             .when(e % 9 == 3, F.lit("voyage"))
             .when(e % 9 == 4, F.lit("text-embedding-3-small"))
             .when(e % 9 == 5, F.lit("claude"))
             .when(e % 9 == 6, F.lit("experimental-llm-x"))
             .when(e % 9 == 7, F.lit("custom-finetune-7b-latest"))
             .otherwise(F.lit("flux-schnell")))
    task = (F.when(F.col("user_id") % 4 == 0, F.lit("document_classification"))
            .when(F.col("user_id") % 4 == 1, F.lit("product_extraction"))
            .when(F.col("user_id") % 4 == 2, F.lit("query_parsing"))
            .otherwise(F.lit("reranking")))
    return events.select(
        e.alias("call_id"),
        task.alias("task"),
        model.alias("model"),
        ((F.col("user_id") * 31 + e) % 50).alias("job_id"),
        (e % 2000 + 1).alias("input_tokens"),
        ((e * 7) % 500).alias("output_tokens"),
        (e % 900 + 20).alias("latency_ms"),
        F.when(e % 11 == 0, F.lit("fallback_to_rules"))
         .otherwise(F.lit("use_ai_result")).alias("action"),
        (F.col("user_id") % 6).alias("workspace_id"))


def synth_page_embed_calls(events: DataFrame) -> DataFrame:
    """Deterministic voyage-multimodal page-embedding call log. The
    pixel mix covers every clamp band: no image (0 → not billed), below
    the 50k floor (billed at 50k), in-band, the exact 2M ceiling, and
    above it (billed at 2M) — ai_pricing.py:171-183,620-631."""
    e = F.col("event_id")
    pixels = (F.when(e % 7 == 0, F.lit(0))
              .when(e % 7 == 1, F.lit(20_000))
              .when(e % 7 == 2, F.lit(50_000))
              .when(e % 7 == 3, F.lit(2_000_000))
              .when(e % 7 == 4, F.lit(2_500_000))
              .otherwise((e * 4_099) % 2_400_000))
    return events.select(
        e.alias("call_id"),
        pixels.cast("long").alias("image_pixels"),
        (e % 300).alias("text_tokens"))


def resolve_pricing(calls: DataFrame, pricing: DataFrame,
                    overlay: DataFrame) -> DataFrame:
    """Per distinct model string: resolution tier, per-token pico prices,
    and markup. Mirrors get_model_pricing (ai_pricing.py:505-548) +
    get_model_markup (:95-101):

      1. overlay exact on lower(model)           — _db_lookup :87
      2. overlay substring, first row by order   — _db_lookup :89-91
         (tiers 1-2 supply prices only when input or output is nonzero,
          but their markup applies whenever the row matched at all)
      3. static exact, CASE-SENSITIVE            — :527 dict access
      4. static substring on lowercase, first
         merged-dict key wins                    — :535-542
      5. conservative default $3/$15             — :544-548

    Runs on the distinct model vocabulary (tiny) so the substring joins
    are broadcast nested loops over dozens of rows; callers broadcast
    the result back onto the call log."""
    models = calls.select("model").distinct() \
        .withColumn("model_lower", F.lower(F.col("model")))

    o_ex = overlay.select(F.col("model_key").alias("oe_key"),
                          F.col("input_pico").alias("oe_in"),
                          F.col("output_pico").alias("oe_out"),
                          F.col("markup_pct").alias("oe_markup"))
    m1 = models.join(F.broadcast(o_ex),
                     models.model_lower == o_ex.oe_key, "left")

    o_fz = overlay.select(F.col("model_key").alias("of_key"),
                          F.col("input_pico").alias("of_in"),
                          F.col("output_pico").alias("of_out"),
                          F.col("markup_pct").alias("of_markup"),
                          F.col("priority").alias("of_pri"))
    fz_cond = (F.col("model_lower").contains(F.col("of_key"))
               | F.col("of_key").contains(F.col("model_lower")))
    m2 = (m1.join(F.broadcast(o_fz), fz_cond, "left")
          .withColumn("of_rn", F.row_number().over(
              Window.partitionBy("model")
              .orderBy(F.col("of_pri").asc_nulls_last())))
          .where(F.col("of_rn") == 1).drop("of_rn", "of_pri"))

    s_ex = pricing.select(F.col("model_key").alias("se_key"),
                          F.col("input_pico").alias("se_in"),
                          F.col("output_pico").alias("se_out"))
    m3 = m2.join(F.broadcast(s_ex), F.col("model") == F.col("se_key"),
                 "left")

    s_fz = pricing.select(F.col("model_key").alias("sf_key"),
                          F.col("input_pico").alias("sf_in"),
                          F.col("output_pico").alias("sf_out"),
                          F.col("priority").alias("sf_pri"))
    sfz_cond = (F.col("model_lower").contains(F.col("sf_key"))
                | F.col("sf_key").contains(F.col("model_lower")))
    m4 = (m3.join(F.broadcast(s_fz), sfz_cond, "left")
          .withColumn("sf_rn", F.row_number().over(
              Window.partitionBy("model")
              .orderBy(F.col("sf_pri").asc_nulls_last())))
          .where(F.col("sf_rn") == 1).drop("sf_rn", "sf_pri"))

    # The overlay row that rules markup: exact hit if any, else fuzzy hit
    # (same row _db_lookup would have returned for get_model_markup).
    o_hit_markup = F.coalesce(
        F.when(F.col("oe_key").isNotNull(),
               F.coalesce(F.col("oe_markup"), F.lit(MARKUP_PCT))),
        F.when(F.col("of_key").isNotNull(),
               F.coalesce(F.col("of_markup"), F.lit(MARKUP_PCT))))

    # _db_lookup returns the EXACT row when one exists — a zero-price
    # exact row therefore blocks the fuzzy tier (prices fall to static),
    # it does not fall through to a priced fuzzy sibling.
    o_priced = F.when(F.col("oe_key").isNotNull()
                      & ((F.col("oe_in") > 0) | (F.col("oe_out") > 0)),
                      F.lit("overlay_exact")) \
        .when(F.col("oe_key").isNull() & F.col("of_key").isNotNull()
              & ((F.col("of_in") > 0) | (F.col("of_out") > 0)),
              F.lit("overlay_fuzzy"))

    tier = F.coalesce(
        o_priced,
        F.when(F.col("se_key").isNotNull(), F.lit("static_exact")),
        F.when(F.col("sf_key").isNotNull(), F.lit("static_fuzzy")),
        F.lit("default"))

    def pick(oe, of, se, sf, dflt):
        return (F.when(tier == "overlay_exact", F.col(oe))
                .when(tier == "overlay_fuzzy", F.col(of))
                .when(tier == "static_exact", F.col(se))
                .when(tier == "static_fuzzy", F.col(sf))
                .otherwise(F.lit(dflt)))

    return m4.select(
        "model",
        tier.alias("tier"),
        pick("oe_in", "of_in", "se_in", "sf_in",
             DEFAULT_INPUT_PICO).alias("input_pico"),
        pick("oe_out", "of_out", "se_out", "sf_out",
             DEFAULT_OUTPUT_PICO).alias("output_pico"),
        F.coalesce(o_hit_markup, F.lit(MARKUP_PCT)).alias("markup_pct"))


def call_costs(calls: DataFrame, resolved: DataFrame) -> DataFrame:
    """Per-call cost in integer pico-USD (calculate_cost,
    ai_pricing.py:550-595): tokens x per-token pico price, markup via
    integer floor-div, micro-credits at 1 credit = $0.01 = 1e10 pico."""
    c = calls.join(F.broadcast(resolved), "model")
    in_cost = F.col("input_tokens") * F.col("input_pico")
    out_cost = F.col("output_tokens") * F.col("output_pico")
    raw = (in_cost + out_cost).alias("raw_cost_pico")
    return c.select(
        "call_id", "task", "model", "job_id", "workspace_id", "action",
        "input_tokens", "output_tokens", "latency_ms",
        "tier", "input_pico", "output_pico", "markup_pct",
        in_cost.alias("input_cost_pico"),
        out_cost.alias("output_cost_pico"),
        raw,
        ((in_cost + out_cost) * F.col("markup_pct"))
        .cast("long").alias("_bx100")) \
        .withColumn("billed_cost_pico",
                    F.expr("_bx100 DIV 100").cast("long")) \
        .withColumn("credits_micro",
                    F.expr("(_bx100 DIV 100) DIV 10000").cast("long")) \
        .drop("_bx100")


def multimodal_costs(page_calls: DataFrame) -> DataFrame:
    """Two-axis voyage-multimodal bill per page-embedding call
    (calculate_multimodal_embedding_cost, ai_pricing.py:595-647): the
    token term at the model's input price PLUS the pixel term with the
    per-image [50k, 2M] clamp; zero pixels bill zero. Token price and
    markup are the voyage-multimodal-3.5 static row (no overlay)."""
    input_pico = dict((k, i) for k, i, _ in STATIC_PRICING)[
        "voyage-multimodal-3.5"]
    billable = F.when(
        F.col("image_pixels") > 0,
        F.least(F.greatest(F.col("image_pixels"),
                           F.lit(MIN_BILLABLE_PIXELS)),
                F.lit(MAX_BILLABLE_PIXELS))).otherwise(F.lit(0))
    text_cost = F.greatest(F.col("text_tokens"), F.lit(0)) * input_pico
    pixel_cost = billable * PIXEL_PICO_PER_PIXEL
    raw = text_cost + pixel_cost
    return page_calls.select(
        "call_id", "image_pixels", "text_tokens",
        billable.cast("long").alias("billable_pixels"),
        text_cost.cast("long").alias("text_cost_pico"),
        pixel_cost.cast("long").alias("pixel_cost_pico"),
        raw.cast("long").alias("raw_cost_pico"),
        (raw * MARKUP_PCT).cast("long").alias("_bx100")) \
        .withColumn("billed_cost_pico",
                    F.expr("_bx100 DIV 100").cast("long")) \
        .drop("_bx100")


def dedup_retry_logs(costed: DataFrame) -> DataFrame:
    """Drop duplicate retry inserts: the reference guards log_ai_call
    with an idempotency key over (task, model, job_id, input_tokens,
    output_tokens, latency_ms, cost) and skips rows whose key was
    already committed (ai_call_logger.py:27-40,131-142) — first insert
    wins. Cost is a pure function of (model, tokens) here, so the key
    reduces to the six natural fields; first-wins = lowest call_id."""
    w = Window.partitionBy("task", "model", "job_id", "input_tokens",
                           "output_tokens", "latency_ms") \
        .orderBy(F.col("call_id").asc())
    return (costed.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


def cost_rollup(costed: DataFrame) -> DataFrame:
    """Usage-analytics aggregate per (task, model) over the deduped log:
    call/fallback counts, token totals, integer cost sums, and latency
    totals — the ai_call_logs dashboard rollup. One map-side-combinable
    shuffle on the group key."""
    deduped = dedup_retry_logs(costed)
    return deduped.groupBy("task", "model").agg(
        F.count(F.lit(1)).alias("calls"),
        F.sum(F.when(F.col("action") == "fallback_to_rules", 1)
              .otherwise(0)).alias("fallback_calls"),
        F.sum("input_tokens").alias("input_tokens"),
        F.sum("output_tokens").alias("output_tokens"),
        F.sum("raw_cost_pico").alias("raw_cost_pico"),
        F.sum("billed_cost_pico").alias("billed_cost_pico"),
        F.sum("credits_micro").alias("credits_micro"),
        F.sum("latency_ms").alias("latency_ms_total"))
