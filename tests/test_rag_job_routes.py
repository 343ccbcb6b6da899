"""Pins for the RAG-route job listing + delete-mode folds
(rag_routes.py:2115-2299)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import rag_job_routes as rj


def _jobs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["job_id", "status", "created_at", "progress"]))


def test_sort_token_non_asc_means_desc(spark):
    rows = [(1, "pending", 100, 10), (2, "pending", 200, 20),
            (3, "pending", 300, 30)]
    out = rj.list_jobs(_jobs(spark, rows), sort="progress:garbage",
                       limit=10).collect()
    # only the literal (lowered) 'asc' ascends; everything else DESC
    assert [r.job_id for r in sorted(out, key=lambda r: r.rk)] \
        == [3, 2, 1]


def test_sort_without_colon_falls_back_created_desc(spark):
    rows = [(1, "pending", 100, 99), (2, "pending", 300, 1)]
    out = rj.list_jobs(_jobs(spark, rows), sort="progress",
                       limit=10).collect()
    assert [r.job_id for r in sorted(out, key=lambda r: r.rk)] \
        == [2, 1]


def test_count_is_page_rows_not_total(spark):
    rows = [(i, "pending", i * 10, i) for i in range(1, 8)]
    out = rj.list_jobs(_jobs(spark, rows), limit=3, offset=5).collect()
    assert len(out) == 2 and out[0]["count"] == 2


def _reqs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["req_id", "job_id",
                                    "preserve_override"]),
        schema="req_id long, job_id long, preserve_override boolean")


def test_delete_mode_ladder(spark):
    jobs = [(1, "completed", 0, 0), (2, "failed", 0, 0),
            (3, "retrying", 0, 0), (4, "completed", 0, 0)]
    reqs = [(10, 1, None), (11, 2, None), (12, 3, None),
            (13, 99, None), (14, 4, False)]
    out = {r.req_id: (r.mode_preserve, r.mode_source)
           for r in rj.delete_mode(_reqs(spark, reqs),
                                   _jobs(spark, jobs)).collect()}
    assert out[10] == (True, "status=completed")
    assert out[11] == (False, "status=failed")
    # 'retrying' is active, not in the wipe set: default-wipe label
    assert out[12] == (False, "status=retrying_default_wipe")
    # missing row folds to 'unknown'
    assert out[13] == (False, "status=unknown_default_wipe")
    # explicit override beats a completed status
    assert out[14] == (False, "explicit_query_param")
