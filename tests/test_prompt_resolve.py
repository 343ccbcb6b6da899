"""Pins for template-prompt resolution + response shaping
(unified_prompt_service.py:207-283,
prompt_template_service.py:86-119)."""

import pandas as pd
import pytest

from mivaa_pdf_extractor_spark.operators import prompt_resolve as prs

P_COLS = ["id", "workspace_id", "stage", "category", "industry",
          "is_default", "is_active", "updated_at"]
R_COLS = ["request_id", "workspace_id", "stage", "category",
          "industry"]


def _resolve(spark, prompts, requests):
    p = spark.createDataFrame(pd.DataFrame(prompts, columns=P_COLS))
    r = spark.createDataFrame(pd.DataFrame(requests, columns=R_COLS))
    return {x.request_id: x for x in
            prs.resolve_template_prompt(r, p).collect()}


def test_tier2_requires_stored_null_category(spark):
    # the docstring says tier 2 is "industry (any category)" but the
    # query pins category IS NULL: a row with a DIFFERENT category
    # must NOT match tier 2
    prompts = [
        ("pA", "w", "s", "certificates", "construction", False, True, 5),
        ("pB", "w", "s", None, "construction", False, True, 1)]
    out = _resolve(spark, prompts,
                   [(0, "w", "s", "products", "construction")])
    assert out[0].prompt_id == "pB" and out[0].tier == 2


def test_tier_priority_and_recency(spark):
    prompts = [
        ("p1", "w", "s", "products", "construction", False, True, 1),
        ("p2", "w", "s", None, "construction", False, True, 99),
        ("p3", "w", "s", "products", None, False, True, 99),
        ("p4", "w", "s", None, None, True, True, 99),
        ("p1b", "w", "s", "products", "construction", False, True, 7)]
    out = _resolve(spark, prompts,
                   [(0, "w", "s", "products", "construction"),
                    (1, "w", "s", "products", None),
                    (2, "w", "s", None, None)])
    assert out[0].prompt_id == "p1b"     # tier 1, newest updated_at
    assert out[1].prompt_id == "p3" and out[1].tier == 3
    assert out[2].prompt_id == "p4" and out[2].tier == 4


def test_inactive_never_matches(spark):
    prompts = [("p1", "w", "s", None, None, True, False, 9)]
    out = _resolve(spark, prompts, [(0, "w", "s", None, None)])
    assert out[0].prompt_id is None and out[0].tier is None


SH_COLS = ["row_id", "id", "name", "prompt_text", "prompt_template",
           "config_is_dict", "cfg_model_pref", "cfg_model",
           "cfg_temperature", "cfg_temperature_is_string",
           "cfg_max_tokens", "cfg_max_tokens_is_string",
           "has_is_default", "is_default", "has_is_active",
           "is_active"]


def _shape(spark, rows):
    pdf = pd.DataFrame(rows, columns=SH_COLS)
    pdf["is_default"] = pdf["is_default"].astype("boolean")
    pdf["is_active"] = pdf["is_active"].astype("boolean")
    df = spark.createDataFrame(pdf)
    return {r.row_id: r for r in
            prs.template_response_shape(df).collect()}


def test_num_int_raises_on_decimal_string(spark):
    rows = [
        (0, "i", "n", "b", None, True, None, None, "0.7", True,
         "100.7", True, True, False, True, True),
        (1, "i", "n", "b", None, True, None, None, "oops", True,
         " 2048 ", True, True, False, True, True)]
    out = _shape(spark, rows)
    assert out[0].max_tokens == 4096      # int('100.7') raises (pin)
    assert out[0].temperature == pytest.approx(0.7)
    assert out[1].max_tokens == 2048      # whitespace tolerated
    assert out[1].temperature == 0.1      # float('oops') -> default


def test_is_active_absent_true_present_null_false(spark):
    rows = [
        (0, "i", "n", "b", None, True, None, None, None, True, None,
         True, True, None, False, None),      # is_active ABSENT
        (1, "i", "n", "b", None, True, None, None, None, True, None,
         True, True, None, True, None)]       # is_active present-NULL
    out = _shape(spark, rows)
    assert out[0].is_active_out is True       # absent -> default True
    assert out[1].is_active_out is False      # bool(None) (pin)


def test_non_dict_config_folds_defaults(spark):
    rows = [(0, "i", "n", "b", None, False, "model-x", "model-y",
             "0.9", True, "512", True, True, True, True, True)]
    out = _shape(spark, rows)
    assert out[0].temperature == 0.1
    assert out[0].max_tokens == 4096
    assert out[0].model_preference is None
