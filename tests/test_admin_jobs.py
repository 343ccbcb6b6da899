"""Pins for the admin job-registry folds
(admin.py:287-399,533-655,836-880)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import admin_jobs as aj

_COLS = ["job_id", "status", "job_type", "created_at", "updated_at",
         "workspace_id"]


def _df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=_COLS))


def test_status_counts_ignore_filters_and_active(spark):
    active = [(1, "completed", "t", 100, 110, 0)]
    hist = [(2, "completed", "t", 90, 95, 0),
            (3, "failed", "t", 80, 85, 0)]
    out = aj.admin_list_jobs(_df(spark, active), _df(spark, hist),
                             status="failed").collect()
    # filter leaves 1 row, but the counts read unfiltered stores:
    # active completed job is INVISIBLE to count_completed (pin)
    assert len(out) == 1
    r = out[0]
    assert r.total_count == 1
    assert (r.count_active, r.count_completed, r.count_failed) \
        == (1, 1, 1)


def test_scalars_history_only_terminal_counts(spark):
    active = [(1, "completed", "t", aj.NOW - 10, aj.NOW, 0)]
    hist = [(2, "completed", "t", aj.NOW - 100, aj.NOW - 40, 0),
            (3, "cancelled", "t", aj.NOW - 2 * 86400, aj.NOW, 0)]
    s = aj.admin_job_scalars(_df(spark, active), _df(spark, hist),
                             now=aj.NOW).collect()[0]
    assert s.total_jobs == 3 and s.active_jobs == 1
    assert s.completed_jobs == 1          # active completed ignored
    assert s.cancelled_jobs == 1
    assert s.recent_jobs_24h == 2         # strict > now-24h
    assert s.average_processing_time_seconds == 60.0


def test_cancel_ladder(spark):
    jobs = [(1, "processing", "t", 0, 0, 5),
            (2, "completed", "t", 0, 0, 5),
            (3, "interrupted", "t", 0, 0, 5),
            (4, "processing", "t", 0, 0, 9)]
    reqs = spark.createDataFrame(pd.DataFrame(
        [(10, 1, True, False, 5), (11, 2, True, False, 5),
         (12, 3, False, False, 5), (13, 4, True, False, 5),
         (14, 4, True, True, 5), (15, 99, True, True, 5)],
        columns=["req_id", "job_id", "cleanup", "is_admin",
                 "req_workspace"]))
    out = {r.req_id: r for r in aj.cancel_outcomes(
        reqs, _df(spark, jobs)).collect()}
    assert out[10].outcome == "cancelled"
    assert out[10].cleanup_performed == "true"
    assert out[11].outcome == "already_terminal_400"
    # interrupted IS cancellable (pin)
    assert out[12].outcome == "cancelled"
    assert out[12].cleanup_performed == "false"
    # cross-workspace without admin: 404, not 403 (anti-enumeration)
    assert out[13].outcome == "not_found_404"
    assert out[14].outcome == "cancelled"    # admin crosses freely
    assert out[15].outcome == "not_found_404"


def test_cleanup_scope_strictly_older(spark):
    hist = [(1, "completed", "t", aj.NOW - 30 * aj.DAY_S, 0, 0),
            (2, "completed", "t", aj.NOW - 31 * aj.DAY_S, 0, 0)]
    out = aj.cleanup_scope(_df(spark, hist), now=aj.NOW,
                           days_old=30).collect()
    assert [r.job_id for r in out] == [2]   # exact cutoff survives
