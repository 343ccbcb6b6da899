"""Pins for the credit-debit wrapper folds
(app/services/integrations/credits_integration_service.py)."""

import pandas as pd
import pytest

from mivaa_pdf_extractor_spark.operators import credits_debit as crd

AI_COLS = ["attempt_id", "user_id", "operation_type", "model_name",
           "input_tokens", "output_tokens", "in_pico", "out_pico",
           "has_response", "debit_ok", "has_error_message",
           "error_message", "has_job"]


def _ai(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=AI_COLS))


def test_error_ladder_present_null_passes(spark):
    rows = [
        (0, "u", "op", "m", 0, 0, 1, 1, False, False, True, "x", False),
        (1, "u", "op", "m", 0, 0, 1, 1, True, False, False, None, False),
        (2, "u", "op", "m", 0, 0, 1, 1, True, False, True, None, False),
        (3, "u", "op", "m", 0, 0, 1, 1, True, True, True, "x", False)]
    out = {r.attempt_id: r.error
           for r in crd.ai_debit_fold(_ai(spark, rows)).collect()}
    assert out[0] == "No response from database"
    assert out[1] == "Unknown error"        # absent key -> default
    assert out[2] is None                   # present-NULL passes (pin)
    assert out[3] is None                   # success -> no error


def test_job_sink_rounds_six_log_rounds_eight(spark):
    # raw = 1234567 pico -> billed = 1851850 pico
    # log billed_8 = 0.00000185, job billed_6 = 0.000002 (pin)
    rows = [(0, "u", "op", "m", 1234567, 0, 1, 0, True, True, True,
             None, True)]
    r = crd.ai_debit_fold(_ai(spark, rows)).collect()[0]
    assert r.billed_cost_usd == pytest.approx(0.00000185)
    assert r.job_cost_usd == pytest.approx(0.000002)


def test_firecrawl_credits_unrounded_and_asymmetries(spark):
    cols = ["attempt_id", "user_id", "operation_type", "credits_used",
            "url", "pages_scraped", "has_response", "debit_ok",
            "has_error_message", "error_message", "meta_has_url_key"]
    df = spark.createDataFrame(pd.DataFrame(
        [(0, "u", "crawl", 7, None, 3, True, True, True, None, False)],
        columns=cols))
    r = crd.firecrawl_debit_fold(df).collect()[0]
    assert r.debit_operation_type == "firecrawl_crawl"
    assert r.log_operation_type == "crawl"          # unprefixed (pin)
    assert r.model_name == "firecrawl-scrape"       # hardcoded (pin)
    assert r.description == "Firecrawl crawl: N/A"
    assert r.credits_debited == pytest.approx(0.7)  # unrounded float


def test_external_free_short_circuit_and_plural(spark):
    cols = ["attempt_id", "user_id", "operation_type", "service_name",
            "unit_type", "cost_per_unit_pico", "units",
            "has_response", "debit_ok", "has_error_message",
            "error_message"]
    df = spark.createDataFrame(pd.DataFrame([
        # free: zero cost, failed RPC flags are IGNORED (pin)
        (0, "u", "op", "free-tier", "lookup", 0, 5, False, False,
         False, None),
        # 0 units pluralizes (pin)
        (1, "u", "op", "twilio-sms", "message", 5_000_000_000, 0,
         False, False, False, None),
        (2, "u", "op", "apollo-enrich", "enrichment",
         50_000_000_000, 2, True, True, False, None)],
        columns=cols))
    out = {r.attempt_id: r
           for r in crd.external_debit_fold(df).collect()}
    assert out[0].success is True and out[0].log_emitted is False
    assert out[0].error is None and out[0].credits_debited == 0.0
    # units=0 -> raw 0 -> also free, but description pin via row 2
    assert out[1].success is True          # free path despite RPC fail
    assert out[2].description == "apollo-enrich op (2 enrichments)"
    assert out[2].api_provider == "apollo"
    assert out[2].credits_debited == pytest.approx(15.0)
