"""Pins for the AI cost-accounting tier (operators/billing).

Reference semantics under test:
- get_model_pricing precedence (ai_pricing.py:505-548): DB-overlay rows
  beat static tables; the overlay lookup is exact-then-substring
  (_db_lookup, :81-93); static exact is case-sensitive dict access;
  fuzzy is case-insensitive, first merged-dict key wins.
- get_model_markup (:95-101): the overlay row's markup rules whenever
  the row exists — even a zero-price row whose prices were skipped.
- calculate_cost (:550-595) and the [50k, 2M] per-image pixel clamp of
  calculate_multimodal_embedding_cost (:595-647).
- log_ai_call's retry-idempotency guard (ai_call_logger.py:87-142):
  duplicate keys collapse, first insert (lowest id) wins.
"""

import pytest
from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import billing


def _resolve(spark, models):
    calls = spark.createDataFrame([(m,) for m in models], "model string")
    out = billing.resolve_pricing(
        calls, billing.pricing_dim(spark), billing.overlay_dim(spark))
    return {r["model"]: r.asDict() for r in out.collect()}


def test_resolution_tiers(spark):
    got = _resolve(spark, [
        "claude-opus-4-8",            # static exact
        "claude-haiku-4-5",           # overlay exact, priced
        "Claude-Opus-4-8-20260115",   # caps break static exact -> fuzzy
        "voyage",                     # model-in-key static fuzzy
        "text-embedding-3-small",     # zero-price overlay: markup only
        "claude",                     # overlay FUZZY beats static fuzzy
        "experimental-llm-x",         # default fallback
        "custom-finetune-7b-latest",  # overlay-only model, NULL markup
        "flux-schnell",               # per-generation model: 0/0 prices
    ])
    assert got["claude-opus-4-8"] == dict(
        model="claude-opus-4-8", tier="static_exact",
        input_pico=15_000_000, output_pico=75_000_000, markup_pct=150)
    assert got["claude-haiku-4-5"] == dict(
        model="claude-haiku-4-5", tier="overlay_exact",
        input_pico=800_000, output_pico=4_000_000, markup_pct=120)
    # static exact is case-sensitive (dict access) but fuzzy lowercases
    assert got["Claude-Opus-4-8-20260115"]["tier"] == "static_fuzzy"
    assert got["Claude-Opus-4-8-20260115"]["input_pico"] == 15_000_000
    # 'voyage' is a substring of several keys; first merged-dict key wins
    assert got["voyage"]["tier"] == "static_fuzzy"
    assert got["voyage"]["input_pico"] == 60_000
    # zero-price overlay row cannot supply prices (get_model_pricing
    # skips it) but its markup still rules (get_model_markup)
    assert got["text-embedding-3-small"] == dict(
        model="text-embedding-3-small", tier="static_exact",
        input_pico=20_000, output_pico=0, markup_pct=110)
    # the overlay fuzzy tier outranks every static tier — 'claude'
    # substring-hits the overlaid haiku row before static is consulted
    assert got["claude"] == dict(
        model="claude", tier="overlay_fuzzy",
        input_pico=800_000, output_pico=4_000_000, markup_pct=120)
    assert got["experimental-llm-x"] == dict(
        model="experimental-llm-x", tier="default",
        input_pico=3_000_000, output_pico=15_000_000, markup_pct=150)
    # overlay-only model via substring; NULL markup -> platform default
    assert got["custom-finetune-7b-latest"] == dict(
        model="custom-finetune-7b-latest", tier="overlay_fuzzy",
        input_pico=2_500_000, output_pico=9_000_000, markup_pct=150)
    # time-based / per-generation models resolve to zero token prices
    # rather than falling through to the $3/$15 default
    assert got["flux-schnell"] == dict(
        model="flux-schnell", tier="static_exact",
        input_pico=0, output_pico=0, markup_pct=150)


def test_zero_price_exact_overlay_blocks_fuzzy(spark):
    # _db_lookup returns the EXACT overlay row when one exists; a
    # zero-price exact row must NOT fall through to a priced fuzzy
    # sibling ('text-embedding-3-small' also substring-matches itself).
    got = _resolve(spark, ["text-embedding-3-small"])
    assert got["text-embedding-3-small"]["tier"] == "static_exact"


def test_cost_math(spark):
    calls = spark.createDataFrame(
        [(1, "t", "claude-opus-4-8", 0, 1000, 100, 50, "use_ai_result",
          0)],
        "call_id long, task string, model string, job_id long, "
        "input_tokens long, output_tokens long, latency_ms long, "
        "action string, workspace_id long")
    resolved = billing.resolve_pricing(
        calls, billing.pricing_dim(spark), billing.overlay_dim(spark))
    row = billing.call_costs(calls, resolved).collect()[0]
    # 1000 * $15/M + 100 * $75/M = $0.0225 = 22.5e9 pico
    assert row["raw_cost_pico"] == 22_500_000_000
    assert row["billed_cost_pico"] == 33_750_000_000  # x1.50
    assert row["credits_micro"] == 3_375_000          # 3.375 credits


@pytest.mark.parametrize("pixels,billable", [
    (0, 0),                    # no image -> not billed at all
    (20_000, 50_000),          # below the floor -> billed at 50k
    (50_000, 50_000),          # exact floor
    (600_000, 600_000),        # in band
    (2_000_000, 2_000_000),    # exact ceiling
    (2_500_000, 2_000_000),    # above -> clamped to 2M
])
def test_multimodal_pixel_clamp(spark, pixels, billable):
    pc = spark.createDataFrame([(1, pixels, 10)],
                               "call_id long, image_pixels long, "
                               "text_tokens long")
    row = billing.multimodal_costs(pc).collect()[0]
    assert row["billable_pixels"] == billable
    assert row["pixel_cost_pico"] == billable * 600
    assert row["text_cost_pico"] == 10 * 120_000
    assert row["raw_cost_pico"] == billable * 600 + 1_200_000
    assert row["billed_cost_pico"] == \
        (billable * 600 + 1_200_000) * 150 // 100


def test_retry_dedup_first_wins(spark):
    # two retry inserts with the same idempotency key, one distinct call
    rows = [
        (7, "t", "claude-opus-4-8", 3, 100, 10, 55, "use_ai_result", 0),
        (9, "t", "claude-opus-4-8", 3, 100, 10, 55, "fallback_to_rules",
         1),
        (8, "t", "claude-opus-4-8", 3, 100, 11, 55, "use_ai_result", 0),
    ]
    calls = spark.createDataFrame(
        rows,
        "call_id long, task string, model string, job_id long, "
        "input_tokens long, output_tokens long, latency_ms long, "
        "action string, workspace_id long")
    resolved = billing.resolve_pricing(
        calls, billing.pricing_dim(spark), billing.overlay_dim(spark))
    costed = billing.call_costs(calls, resolved)
    kept = sorted(r["call_id"]
                  for r in billing.dedup_retry_logs(costed).collect())
    assert kept == [7, 8]  # 9 is the duplicate retry; first insert wins
    roll = billing.cost_rollup(costed).collect()
    assert len(roll) == 1
    assert roll[0]["calls"] == 2
    assert roll[0]["fallback_calls"] == 0  # the dup's fallback row died
