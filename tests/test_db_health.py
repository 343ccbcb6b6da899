"""Pins for the database health fold
(operators/db_health.py vs database_health_service.py)."""

import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators.db_health import (
    fold_health_checks)

_S = ("service string, check_ord long, ok boolean, conn_ms double, "
      "query_ms double, error string")


def _c(svc, i, ok, conn=None, q=None, err=None):
    return Row(service=svc, check_ord=i, ok=ok, conn_ms=conn,
               query_ms=q, error=err)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, _S)
    return {r["service"]: r.asDict()
            for r in fold_health_checks(df, **kw).collect()}


def test_recovery_and_threshold(spark):
    out = _run(spark, [
        # a: 3 fails then one success -> recovered, streak 0
        _c("a", 0, False, err="e0"), _c("a", 1, False, err="e1"),
        _c("a", 2, False, err="e2"), _c("a", 3, True, 2.0, 50.0),
        # b: success then 3 fails -> unhealthy
        _c("b", 0, True, 1.0, 20.0), _c("b", 1, False, err="x"),
        _c("b", 2, False, err="y"), _c("b", 3, False, err="z"),
        # c: 2 fails only -> still healthy (threshold not reached)
        _c("c", 0, False, err="p"), _c("c", 1, False, err="q"),
    ])
    a, b, c = out["a"], out["b"], out["c"]
    assert (a["healthy"], a["consecutive_failures"]) == (True, 0)
    assert a["error_count"] == 3
    assert a["query_test_ms"] == 50.0
    assert (b["healthy"], b["status"]) == (False, "unhealthy")
    assert b["consecutive_failures"] == 3
    assert b["last_error"] == "z"
    assert (c["healthy"], c["consecutive_failures"]) == (True, 2)


def test_rolling_window_and_slow_count(spark):
    rows = [_c("s", i, True, 1.0, float(q)) for i, q in
            enumerate([2000.0, 100.0, 200.0, 300.0])]
    out = _run(spark, rows, history=2)
    s = out["s"]
    # window keeps only the LAST 2 successful times: (200, 300)
    assert s["avg_query_time_ms"] == 250.0
    assert s["max_query_time_ms"] == 300.0
    # but the slow counter saw the old 2000ms check
    assert s["slow_query_count"] == 1
    assert s["query_test_ms"] == 300.0


def test_no_success_defaults(spark):
    out = _run(spark, [_c("s", 0, False, err="boom")])
    s = out["s"]
    assert s["avg_query_time_ms"] == 0.0
    assert s["max_query_time_ms"] == 0.0
    assert s["last_check_ord"] == -1
    assert s["connection_test_ms"] is None
