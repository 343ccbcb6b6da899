"""Pins for the progress-monitor alert fold
(operators/monitor_alerts.py vs job_progress_monitor.py)."""

import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators.monitor_alerts import (
    fold_monitor_alerts)

_S = ("job_id string, event_ord double, kind string, to_stage string,"
      " db_stage string, slow_op_operation string, "
      "slow_op_started double, slow_op_budget double")


def _ev(job, t, kind, to=None, db=None, op=None, started=None,
        budget=None):
    return Row(job_id=job, event_ord=float(t), kind=kind, to_stage=to,
               db_stage=db, slow_op_operation=op,
               slow_op_started=started, slow_op_budget=budget)


def _run(spark, rows):
    df = spark.createDataFrame(rows, _S)
    return sorted((r.asDict() for r in
                   fold_monitor_alerts(df).collect()),
                  key=lambda r: r["fired_at"])


def test_slow_stage_fallback_asymmetry(spark):
    # 'initializing' is not in STAGE_TIMEOUTS: the transition check
    # falls back to 300 (slow alert at 400s) while a tick in an
    # unknown stage falls back to 900
    out = _run(spark, [
        _ev("j", 0, "start"),
        _ev("j", 350, "tick"),                 # 350 < 900: no stuck
        _ev("j", 400, "transition", to="downloading"),
        _ev("j", 530, "transition", to="chunking"),  # 130>120: slow
    ])
    assert [(r["kind"], r["stage"], r["seconds"], r["threshold"])
            for r in out] == [
        ("slow_stage", "initializing", 400.0, 300.0),
        ("slow_stage", "downloading", 130.0, 120.0)]


def test_stuck_refire_gap_and_reset(spark):
    # downloading timeout 120; ticks at +130, +700, +729, +730
    out = _run(spark, [
        _ev("j", 0, "start"),
        _ev("j", 10, "transition", to="downloading"),
        _ev("j", 140, "tick"),     # 130 > 120: fires
        _ev("j", 700, "tick"),     # 560 since fire: suppressed
        _ev("j", 740, "tick"),     # exactly 600 since fire: fires
        _ev("j", 745, "transition", to="extracting_images"),
        # new segment resets the limiter; timeout 1800
        _ev("j", 2600, "tick"),    # 1855 > 1800: fires immediately
    ])
    stuck = [r for r in out if r["kind"] == "stuck"]
    assert [r["fired_at"] for r in stuck] == [140.0, 740.0, 2600.0]


def test_effective_stage_vs_in_memory(spark):
    # in-memory extracting_images (1800) but DB says downloading
    # (120): the timeout uses the effective stage, the alert's stage
    # stays in-memory
    out = _run(spark, [
        _ev("j", 0, "start"),
        _ev("j", 10, "transition", to="extracting_images"),
        _ev("j", 200, "tick", db="downloading"),
    ])
    assert len(out) == 1
    r = out[0]
    assert (r["stage"], r["other_stage"]) == (
        "extracting_images", "downloading")
    assert (r["seconds"], r["threshold"]) == (190.0, 120.0)


def test_slow_op_suppression_ladder(spark):
    base = [_ev("j", 0, "start"),
            _ev("j", 10, "transition", to="downloading")]
    # within 1.5x budget: suppressed (and limiter untouched -> the
    # NEXT crossing still counts as first and fires)
    out = _run(spark, base + [
        _ev("j", 140, "tick", op="x", started=100.0, budget=100.0),
        _ev("j", 150, "tick"),
    ])
    assert [r["fired_at"] for r in out] == [150.0]
    # no started_at: suppress; budget 0: suppress; past 1.5x: fires
    out = _run(spark, base + [
        _ev("j", 140, "tick", op="x", started=None, budget=100.0),
        _ev("j", 141, "tick", op="x", started=100.0, budget=0.0),
        _ev("j", 142, "tick", op="x", started=0.0, budget=90.0),
    ])
    assert [r["fired_at"] for r in out] == [142.0]  # 142 >= 135
