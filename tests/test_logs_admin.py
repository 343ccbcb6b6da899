"""Pins for the system-logs admin folds (app/api/logs_routes.py)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import logs_admin as lga


def _logs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["log_id", "ts", "level", "logger_name",
                       "message", "source"]))


def test_hours_zero_disables_cutoff_in_query(spark):
    rows = [(1, 100, "INFO", "a", "m", "backend"),
            (2, lga.NOW, "INFO", "a", "m", "backend")]
    out = lga.logs_query(_logs(spark, rows), now=lga.NOW, hours=0,
                         page=1, page_size=10).collect()
    assert len(out) == 2           # truthy gate: 0 -> no time filter


def test_clear_hours_zero_wipes_all(spark):
    rows = [(1, lga.NOW, "INFO", "a", "m", "backend"),
            (2, 100, "INFO", "a", "m", "backend")]
    out = lga.logs_clear_scope(_logs(spark, rows), now=lga.NOW,
                               hours=0).collect()
    assert len(out) == 2           # 0 falls to the delete-ALL branch


def test_level_filter_uppercases(spark):
    rows = [(1, lga.NOW, "ERROR", "a", "m", "backend"),
            (2, lga.NOW, "INFO", "a", "m", "backend")]
    out = lga.logs_query(_logs(spark, rows), now=lga.NOW, hours=1,
                         level="error").collect()
    assert [r.log_id for r in out] == [1]


def test_has_more_arithmetic(spark):
    rows = [(i, lga.NOW - i, "INFO", "a", "m", "backend")
            for i in range(7)]
    out = lga.logs_query(_logs(spark, rows), now=lga.NOW, hours=1,
                         page=1, page_size=5).collect()
    assert len(out) == 5 and all(r.has_more for r in out)
    out2 = lga.logs_query(_logs(spark, rows), now=lga.NOW, hours=1,
                          page=2, page_size=5).collect()
    assert len(out2) == 2 and not any(r.has_more for r in out2)
