"""Circuit-breaker replay pins (app/utils/circuit_breaker.py:58-217).

Adversarial traces pinning:
- one failure in HALF_OPEN re-opens immediately (failure_count is NOT
  reset entering HALF_OPEN, :186-188 vs :164-176);
- one success in HALF_OPEN closes and zeroes counters (:151-158);
- the OPEN->HALF_OPEN transition is lazy and restamps
  state_changed_time with the CALL time (:180-189);
- the HALF_OPEN max-calls rejection branch is sequentially dead
  (half_open_calls never exceeds 1 in any serial trace);
- rejected calls never advance failure_count, but DO count in the
  success_rate denominator (:115, :203-206);
- success in CLOSED resets failure_count (consecutive semantics,
  :160-162).
"""

import pandas as pd
import pytest

from mivaa_pdf_extractor_spark.operators.breaker_replay import (
    breaker_stats, fold_breaker)


def _replay(spark, trace, **kw):
    df = spark.createDataFrame(
        pd.DataFrame(trace, columns=["breaker", "event_ord", "t",
                                     "outcome"]))
    rows = fold_breaker(df, **kw).collect()
    return sorted(rows, key=lambda r: r.event_ord)


def test_failure_in_half_open_reopens(spark):
    # open at t=2 (3 errs), rejected until timeout, half-open at t=70,
    # the probe FAILS -> straight back to OPEN with fc=4
    trace = [("b", i, t, o) for i, (t, o) in enumerate(
        [(0, "err"), (1, "err"), (2, "err"), (30, "ok"), (70, "err"),
         (75, "ok")])]
    rows = _replay(spark, trace, failure_threshold=3,
                   timeout_seconds=60)
    assert [r.state_before for r in rows] == [
        "closed", "closed", "closed", "open", "half_open", "open"]
    assert rows[3].disposition == "rejected"
    assert rows[4].disposition == "executed"
    assert rows[4].state_after == "open"
    assert rows[4].failure_count == 4          # carried in + 1 (pin)
    assert rows[5].disposition == "rejected"   # re-opened at t=70


def test_success_in_half_open_closes_and_zeroes(spark):
    trace = [("b", i, t, o) for i, (t, o) in enumerate(
        [(0, "err"), (1, "err"), (2, "err"), (70, "ok"), (71, "err")])]
    rows = _replay(spark, trace, failure_threshold=3,
                   timeout_seconds=60)
    assert rows[3].state_before == "half_open"
    assert rows[3].state_after == "closed"
    assert rows[3].failure_count == 0
    # counters zeroed: a single new failure does NOT re-open
    assert rows[4].state_after == "closed"
    assert rows[4].failure_count == 1


def test_lazy_transition_restamps_call_time(spark):
    # open at t=2; next call at t=200 (>> timeout) goes half-open AT
    # THE CALL, succeeds, closes; a later burst re-opens normally —
    # i.e. state_changed was restamped to 200, not 2+60
    trace = [("b", i, t, o) for i, (t, o) in enumerate(
        [(0, "err"), (1, "err"), (2, "err"), (200, "ok"),
         (201, "err"), (202, "err"), (203, "err"), (204, "ok")])]
    rows = _replay(spark, trace, failure_threshold=3,
                   timeout_seconds=60)
    assert rows[3].state_before == "half_open"
    assert rows[3].state_after == "closed"
    assert rows[6].state_after == "open"
    assert rows[7].disposition == "rejected"   # 204 - 203 < 60


def test_half_open_cap_branch_sequentially_dead(spark):
    # worst case: every executed half-open probe fails -> the breaker
    # re-opens before a second half-open call can ever be accepted, so
    # no rejection is ever attributable to the max-calls cap even with
    # half_open_max_calls=1
    trace = []
    t = 0
    for i in range(40):
        trace.append(("b", i, t, "err"))
        t += 61
    rows = _replay(spark, trace, failure_threshold=3,
                   timeout_seconds=60, half_open_max_calls=1)
    half_open_rejects = [r for r in rows
                         if r.state_before == "half_open"
                         and r.disposition == "rejected"]
    assert half_open_rejects == []
    executed_half_open = [r for r in rows
                          if r.state_before == "half_open"
                          and r.disposition == "executed"]
    assert len(executed_half_open) > 5          # branch exercised


def test_rejected_calls_dilute_success_rate(spark):
    trace = [("b", i, t, o) for i, (t, o) in enumerate(
        [(0, "ok"), (1, "err"), (2, "err"), (3, "err"), (4, "ok"),
         (5, "ok")])]
    # opens at t=3; calls 4,5 rejected (timeout 60)
    df = fold_breaker(
        pd.DataFrame(trace, columns=["breaker", "event_ord", "t",
                                     "outcome"]).pipe(
            lambda p: spark.createDataFrame(p)),
        failure_threshold=3, timeout_seconds=60)
    s = breaker_stats(df).collect()[0]
    assert s.total_calls == 6
    assert s.successful_calls == 1
    assert s.failed_calls == 3
    assert s.rejected_calls == 2
    assert s.success_rate == pytest.approx(100.0 / 6)
    assert s.state == "open"
    assert s.failure_count == 3                 # untouched by rejects


def test_success_resets_consecutive_failures(spark):
    trace = [("b", i, i, o) for i, o in enumerate(
        ["err", "err", "ok", "err", "err", "ok"])]
    rows = _replay(spark, trace, failure_threshold=3,
                   timeout_seconds=60)
    assert all(r.state_after == "closed" for r in rows)
    assert [r.failure_count for r in rows] == [1, 2, 0, 1, 2, 0]
