"""Pins for the escalation-engine replay
(operators/escalation.py vs escalation_engine.py +
confidence_thresholds.py)."""

import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators.escalation import (
    fold_escalation, next_model, quality_level)

_S = ("run_id string, task_type string, attempt int, "
      "confidence double, error string, latency_ms long")


def _a(run, task, i, conf=None, err=None, lat=100):
    return Row(run_id=run, task_type=task, attempt=i, confidence=conf,
               error=err, latency_ms=lat)


def _run(spark, rows):
    df = spark.createDataFrame(rows, _S)
    return {r["run_id"]: r.asDict()
            for r in fold_escalation(df).collect()}


def test_next_model_quirks():
    # normalization: underscores and case fold into the chain
    assert next_model("Claude_Haiku_4_5", "product_extraction") == \
        "claude-sonnet-4-6"
    # unknown model restarts at the chain head BEFORE the cost check
    assert next_model("gpt-9", "rag_search") == "claude-haiku-4-5"
    # top of the chain
    assert next_model("claude-opus-4-8", "product_extraction") is None
    # cost-sensitive tasks never escalate from a known model
    assert next_model("claude-haiku-4-5", "image_analysis") is None


def test_quality_levels_per_task():
    assert quality_level("product_extraction", 0.92) == "excellent"
    assert quality_level("product_extraction", 0.85) == "good"
    assert quality_level("product_extraction", 0.75) == "acceptable"
    assert quality_level("product_extraction", 0.74) == "poor"
    # unknown task uses the defaults
    assert quality_level("mystery", 0.90) == "excellent"
    assert quality_level("mystery", 0.70) == "acceptable"


def test_escalation_paths(spark):
    out = _run(spark, [
        # immediate accept
        _a("ok", "material_classification", 0, conf=0.91),
        # escalate once, accept on sonnet
        _a("esc", "product_extraction", 0, conf=0.5),
        _a("esc", "product_extraction", 1, conf=0.86, lat=200),
        # cost-sensitive: no next model -> accepted poor immediately
        _a("cs", "rag_search", 0, conf=0.3),
        # three low attempts -> poor at opus with the warning
        _a("low", "product_extraction", 0, conf=0.4),
        _a("low", "product_extraction", 1, conf=0.5),
        _a("low", "product_extraction", 2, conf=0.6),
        # error then recovery on the next model
        _a("err", "product_extraction", 0, err="boom"),
        _a("err", "product_extraction", 1, conf=0.9, lat=300),
        # errors all the way -> failure
        _a("dead", "product_extraction", 0, err="a"),
        _a("dead", "product_extraction", 1, err="b"),
        _a("dead", "product_extraction", 2, err="c"),
    ])
    ok = out["ok"]
    assert (ok["success"], ok["final_model"],
            ok["quality_level"]) == (
        True, "claude-haiku-4-5", "excellent")
    esc = out["esc"]
    assert (esc["final_model"], esc["escalation_count"]) == (
        "claude-sonnet-4-6", 1)
    assert esc["quality_level"] == "good"
    assert esc["total_latency_ms"] == 300  # both attempts count
    cs = out["cs"]
    assert (cs["final_model"], cs["quality_level"],
            cs["escalation_count"]) == (
        "claude-haiku-4-5", "poor", 0)
    assert cs["warning"].startswith("Low confidence")
    low = out["low"]
    assert (low["final_model"], low["quality_level"],
            low["escalation_count"]) == ("claude-opus-4-8", "poor", 2)
    err = out["err"]
    assert (err["success"], err["final_model"],
            err["confidence_score"]) == (
        True, "claude-sonnet-4-6", 0.9)
    # failed attempt contributes no latency
    assert err["total_latency_ms"] == 300
    dead = out["dead"]
    assert (dead["success"], dead["error"]) == (False, "c")
    assert dead["escalation_count"] == 2
