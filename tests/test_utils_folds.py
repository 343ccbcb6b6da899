"""Pins for the utils folds: query metrics, resource lifecycle,
memory pressure (app/utils/{query_metrics,resource_manager,
memory_monitor}.py)."""

import pandas as pd
import pytest

from mivaa_pdf_extractor_spark.operators import db_metrics as dbm
from mivaa_pdf_extractor_spark.operators import mem_pressure as mem
from mivaa_pdf_extractor_spark.operators import (
    resource_lifecycle as rlc)


def _calls(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["call_ord", "table_name",
                                    "operation", "execution_time_ms",
                                    "error"]))


# ── query metrics ────────────────────────────────────────────────────

def test_exact_threshold_not_slow(spark):
    # strict > (query_metrics.py:88): 1000.0 is NOT slow
    df = dbm.track_queries(_calls(spark, [
        (0, "t", "select", 1000.0, None),
        (1, "t", "select", 1000.25, None)]))
    rows = {r.call_ord: r.is_slow for r in df.collect()}
    assert rows == {0: False, 1: True}


def test_error_rows_still_tracked(spark):
    df = dbm.query_metrics_global(_calls(spark, [
        (0, "t", "select", 2000.0, "boom"),
        (1, "t", "select", 500.0, None)]))
    r = df.collect()[0]
    assert r.total_queries == 2          # error row counted
    assert r.slow_queries == 1
    assert r.avg_query_time_ms == 1250.0


def test_empty_input_sentinels(spark):
    empty = spark.createDataFrame(
        [], "call_ord long, table_name string, operation string, "
            "execution_time_ms double, error string")
    df = dbm.query_metrics_global(empty)
    r = df.collect()[0]
    assert r.total_queries == 0
    assert r.min_query_time_ms == 0.0    # inf sentinel (:131)
    assert r.avg_query_time_ms == 0.0
    assert r.slow_query_percentage == 0.0


def test_ring_buffer_reports_five(spark):
    rows = [(i, "t", "select", 1500.0 + i, None) for i in range(12)]
    out = dbm.recent_slow_queries(_calls(spark, rows)).collect()
    assert sorted(r.call_ord for r in out) == [7, 8, 9, 10, 11]


# ── resource lifecycle ───────────────────────────────────────────────

def _replay(spark, trace):
    df = spark.createDataFrame(
        pd.DataFrame(trace, columns=["resource", "event_ord", "kind",
                                     "job"]))
    rows = rlc.fold_resources(df).collect()
    return sorted(rows, key=lambda r: r.event_ord)


def test_reregister_keeps_ready_state(spark):
    # re-register adds the job but does NOT reset state (:79-84): the
    # next sweep deletes the resource out from under the new job
    rows = _replay(spark, [
        ("r", 0, "register", "j1"),
        ("r", 1, "release", "j1"),          # -> READY
        ("r", 2, "register", "j2"),         # state stays READY (pin)
        ("r", 3, "sweep", None)])
    assert rows[1].state == "ready_for_cleanup"
    assert rows[2].state == "ready_for_cleanup"
    assert rows[2].n_users == 1
    assert rows[3].cleaned is True          # j2 loses the resource


def test_jobless_register_orphans(spark):
    rows = _replay(spark, [
        ("r", 0, "register", None),
        ("r", 1, "sweep", None),            # CREATED not swept (pin)
        ("r", 2, "shutdown", None)])
    assert rows[1].cleaned is False and rows[1].alive is True
    assert rows[2].cleaned is True          # only shutdown reaps it


def test_release_never_holder_flips_ready(spark):
    # discard is a no-op but the emptiness check still runs (:124-130)
    rows = _replay(spark, [
        ("r", 0, "register", None),
        ("r", 1, "release", "ghost")])
    assert rows[1].state == "ready_for_cleanup"


def test_mark_in_use_rescues_ready(spark):
    rows = _replay(spark, [
        ("r", 0, "register", "j1"),
        ("r", 1, "release", "j1"),
        ("r", 2, "mark_in_use", "j2"),      # rescue (:104-112)
        ("r", 3, "sweep", None)])
    assert rows[2].state == "in_use"
    assert rows[3].cleaned is False


def test_shutdown_ignores_users(spark):
    rows = _replay(spark, [
        ("r", 0, "register", "j1"),
        ("r", 1, "mark_in_use", "j1"),
        ("r", 2, "shutdown", None)])
    assert rows[2].cleaned is True and rows[2].alive is False


# ── memory pressure ──────────────────────────────────────────────────

def _samples(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame([(i, p, a) for i, (p, a) in enumerate(pairs)],
                     columns=["sample_ord", "percent_used",
                              "available_mb"]))


def test_tier_boundaries(spark):
    out = mem.pressure_tier(_samples(spark, [
        (65.0, 0.0), (65.25, 0.0), (75.0, 0.0), (75.25, 0.0),
        (80.0, 0.0), (90.0, 0.0)])).collect()
    tiers = [r.tier for r in sorted(out, key=lambda r: r.sample_ord)]
    # 65/75 strict; the ctor's 80/90 thresholds are dead: 80 is
    # critical (>75), not "high threshold"
    assert tiers == ["normal", "high", "high", "critical",
                     "critical", "critical"]


def test_batch_size_low_path_skips_min_clamp(spark):
    # default 1 < min 2 passes through on the <50 path (pin)
    out = mem.optimal_batch_size(
        _samples(spark, [(49.75, 1000.0)]), default_batch_size=1,
        min_batch_size=2, max_batch_size=20).collect()
    assert out[0].batch_size == 1


def test_batch_size_cut_fires_at_65_not_80(spark):
    out = mem.optimal_batch_size(
        _samples(spark, [(65.25, 1000.0), (65.0, 100.0)]),
        default_batch_size=8, min_batch_size=2,
        max_batch_size=20).collect()
    by = {r.sample_ord: r.batch_size for r in out}
    assert by[0] == 2                    # >65 -> min (comment says 80)
    assert by[1] == 8                    # ==65 -> computed int(8.0)


def test_wait_satisfying_probe_past_timeout_proceeds(spark):
    probes = spark.createDataFrame(pd.DataFrame(
        [("op", 0, 0.0, 10.0), ("op", 1, 65.0, 150.0)],
        columns=["op", "probe_ord", "elapsed", "available_mb"]))
    r = mem.wait_outcome(probes, required_mb=100.0,
                         max_wait_seconds=60.0).collect()[0]
    assert r.outcome == "proceed" and r.at_probe == 1


def test_wait_exact_max_wait_does_not_raise(spark):
    probes = spark.createDataFrame(pd.DataFrame(
        [("op", 0, 60.0, 10.0), ("op", 1, 65.0, 10.0)],
        columns=["op", "probe_ord", "elapsed", "available_mb"]))
    r = mem.wait_outcome(probes, required_mb=100.0,
                         max_wait_seconds=60.0).collect()[0]
    # elapsed == max_wait is NOT expired (strict >): the op fails at
    # the NEXT probe
    assert r.outcome == "memory_error" and r.at_probe == 1
