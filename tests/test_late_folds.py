"""Pins for the late continuation-16 folds (api-key gate, firecrawl
retry, stage-1 page validation, stage-5 completion gate)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import api_key_gate as akg
from mivaa_pdf_extractor_spark.operators import checkpoints as ckp
from mivaa_pdf_extractor_spark.operators import (
    firecrawl_shapes as fcs)
from mivaa_pdf_extractor_spark.operators import pages as pgs

KEY_COLS = ["req_id", "auth_header", "key_found", "is_active",
            "has_expires", "expires_valid", "expires_past",
            "allowed_patterns", "rate_limit_override"]


def _gate(spark, rows):
    pdf = pd.DataFrame(rows, columns=KEY_COLS)
    pdf["rate_limit_override"] = pdf["rate_limit_override"] \
        .astype("Int32")
    df = spark.createDataFrame(pdf)
    return {r.req_id: r for r in akg.api_key_gate(df).collect()}


def test_bearer_case_insensitive_vs_jwt(spark):
    rows = [
        (0, "BEARER k1", True, True, False, True, False, None, None),
        (1, "Basic k1", True, True, False, True, False, None, None),
        # empty allowlist allows all (pin)
        (2, "Bearer k1", True, True, False, True, False, [], None),
        # whitespace-only token
        (3, "Bearer    ", True, True, False, True, False, None, None)]
    out = _gate(spark, rows)
    assert out[0].status == 200          # lower().startswith passes
    assert out[1].status == 401
    assert out[2].status == 200          # [] -> allow-all
    assert out[3].detail == "Empty API key"


def test_rate_limit_override_zero_falls_to_default(spark):
    rows = [(0, "Bearer k", True, True, False, True, False, None, 0),
            (1, "Bearer k", True, True, False, True, False, None,
             9000)]
    out = _gate(spark, rows)
    assert out[0].rate_limit_per_min == 60     # 0 -> default (pin)
    assert out[1].rate_limit_per_min == 600    # clamped


def test_firecrawl_fail_fast_4xx(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [(0, 404, False, None, "x"), (1, 429, False, None, "x"),
         (2, 200, False, "", "x"), (3, 200, True, None, "x")],
        columns=["attempt_id", "status", "body_success", "body_error",
                 "body_text"]))
    out = {r.attempt_id: r for r in
           fcs.classify_attempts(df).collect()}
    assert out[0].disposition == "raise"       # fail-fast 4xx
    assert out[1].disposition == "retry"       # 429 retryable
    assert out[2].disposition == "retry"       # body-level failure
    assert out[2].error == "Firecrawl error: "  # '' not folded: .get
    assert out[3].disposition == "return"


def test_stage1_dual_drop_buckets(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [(0, 5, [1, 0, -2, 5, 9]), (1, 0, [1, 0, 99]),
         (2, None, [3, -1])],
        columns=["req_id", "upper_bound", "page_range"]))
    out = {r.req_id: r for r in
           pgs.stage1_page_validate(df).collect()}
    # bound 5: 9 is out-of-bounds (loud), 0 and -2 silent, keep [1,5]
    assert out[0].n_physical_pages == 2
    assert out[0].n_dropped_out_of_bounds == 1
    assert out[0].n_dropped_silently == 2
    # falsy bound disables the upper check: 99 is KEPT (pin)
    assert out[1].physical_pages == "1,99"
    assert out[1].n_dropped_out_of_bounds == 0
    assert out[2].physical_pages == "3"


def test_stage5_all_zero_not_completed(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [("j1", False, 4, 6, [1, 2, 4], 0, 0, 0),
         ("j2", True, 4, 6, [1, 2, 4], 1, 0, 0)],
        columns=["job_id", "breaker_open", "validated", "total_pages",
                 "physical_pages", "products_created",
                 "chunks_created", "images_processed"]))
    out = {r.job_id: r for r in ckp.stage5_result_shape(df).collect()}
    assert out["j1"].marked_completed is False   # SPN-7 pin
    assert out["j1"].claude_validations == 4
    assert out["j2"].marked_completed is True
    assert out["j2"].claude_validations == 0     # breaker-open zeros
    assert out["j2"].pages_skipped == 3
