"""Pins for the terminal job-transition folds
(progress_tracker.py:619-995)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import job_terminal as jt


def _jobs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["job_id", "document_id", "outcome",
                       "prior_status", "progress_pct",
                       "error_message"]))


def _logs(spark, rows):
    if not rows:
        return spark.createDataFrame(
            pd.DataFrame(columns=["job_id", "billed_cost_usd"]),
            schema="job_id long, billed_cost_usd double")
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["job_id", "billed_cost_usd"]))


def _imgs(spark, rows):
    if not rows:
        return spark.createDataFrame(
            pd.DataFrame(columns=["document_id",
                                  "has_understanding_embedding",
                                  "vision_analysis_failed"]),
            schema="document_id long, has_understanding_embedding "
                   "boolean, vision_analysis_failed boolean")
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["document_id", "has_understanding_embedding",
                       "vision_analysis_failed"]))


def test_idempotency_guard_completed_only(spark):
    jobs = [(1, None, "completed", "completed", 50.0, "e"),
            (2, None, "failed", "failed", 50.0, "e")]
    out = {r.job_id: r for r in jt.terminal_job_updates(
        _jobs(spark, jobs), _logs(spark, []),
        _imgs(spark, [])).collect()}
    assert out[1].action == "noop"       # audit fix #37
    assert out[2].action == "fail"       # fail_job re-runs (no guard)


def test_cost_sum_completed_path_only(spark):
    jobs = [(1, None, "completed", "processing", 50.0, "e"),
            (2, None, "failed", "processing", 50.0, "e")]
    logs = [(1, 0.5), (1, None), (2, 9.9)]
    out = {r.job_id: r for r in jt.terminal_job_updates(
        _jobs(spark, jobs), _logs(spark, logs),
        _imgs(spark, [])).collect()}
    assert out[1].total_ai_cost_usd == 0.5   # NULL rows count 0
    assert out[2].total_ai_cost_usd is None  # fail path never reads


def test_progress_truncates_on_fail(spark):
    jobs = [(1, None, "failed", "processing", 99.9, "e")]
    out = jt.terminal_job_updates(
        _jobs(spark, jobs), _logs(spark, []),
        _imgs(spark, [])).collect()[0]
    assert out.progress_out == 99            # int(), not round()


def test_vision_coverage_rounding_and_gate(spark):
    jobs = [(1, 7, "completed", "processing", 0.0, "e"),
            (2, 8, "completed", "processing", 0.0, "e")]  # no images
    imgs = [(7, True, False), (7, True, True), (7, False, False)]
    out = {r.job_id: r for r in jt.terminal_job_updates(
        _jobs(spark, jobs), _logs(spark, []),
        _imgs(spark, imgs)).collect()}
    assert out[1].vision_total == 3 and out[1].vision_embedded == 2
    assert out[1].coverage_pct == 66.67      # round(…, 2)
    assert out[2].vision_total is None       # zero rows -> no rollup


def test_orphan_sweep_skips_noop_jobs(spark):
    jobs = [(1, None, "completed", "completed", 0.0, "e"),
            (2, None, "completed", "processing", 0.0, "e"),
            (3, None, "failed", "processing", 0.0, "e")]
    prods = spark.createDataFrame(pd.DataFrame(
        [(10, 1, "pending"), (11, 2, "processing"),
         (12, 3, "pending"), (13, 3, "completed")],
        columns=["product_row_id", "job_id", "status"]))
    out = {r.product_row_id: r.error_message for r in
           jt.orphan_sweep(prods, _jobs(spark, jobs)).collect()}
    # noop job 1's orphan stays; finished rows untouched
    assert out == {11: "orphaned_at_job_completion",
                   12: "orphaned_at_job_failure"}


def test_docs_mirror_truncates_error(spark):
    jobs = [(1, 7, "failed", "processing", 0.0, "E" * 2500),
            (2, None, "failed", "processing", 0.0, "e")]
    out = jt.processed_docs_mirror(_jobs(spark, jobs)).collect()
    assert len(out) == 1                     # NULL document_id skipped
    assert len(out[0].processing_error) == 2000
