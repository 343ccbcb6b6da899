"""Pins for job-monitor detection tiers and recovery planning
(operators/job_monitor.py vs job_monitor_service.py)."""

import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators.job_monitor import (
    detect_stuck_jobs_tiers, plan_recovery, recover_import_jobs,
    recovery_stats)

NOW = 10000.0


def _job(jid, status="processing", progress=0, created=9000.0,
         hb=None, updated=9950.0, meta_stage=None, meta_cur=None,
         n_hist=0):
    return Row(job_id=jid, status=status, progress=progress,
               created_at_sec=created, last_heartbeat_sec=hb,
               updated_at_sec=updated, meta_stage=meta_stage,
               meta_current_stage=meta_cur, n_history=n_hist)


_SCHEMA = ("job_id string, status string, progress long, "
           "created_at_sec double, last_heartbeat_sec double, "
           "updated_at_sec double, meta_stage string, "
           "meta_current_stage string, n_history int")


@pytest.fixture(scope="module")
def detected(spark):
    jobs = spark.createDataFrame(
        [
            # crashed beats heartbeat beats stale (all three match)
            _job("all3", hb=8000.0, updated=9000.0),
            # heartbeat-only (stage set blocks startup tier)
            _job("hb", hb=9000.0, meta_stage="parsing", updated=9000.0),
            # NULL heartbeat never matches the heartbeat tier; stale
            # catches it
            _job("nullhb", hb=None, meta_cur="x", updated=9500.0),
            # too-young job with no checkpoints: startup tier needs
            # >180s age
            _job("young", created=9900.0, updated=9990.0),
            # completed jobs never detected
            _job("done", status="completed", hb=8000.0, updated=9000.0),
            # history > 0 blocks startup tier even at progress 0
            _job("hist", n_hist=2, updated=9990.0, hb=9950.0),
        ],
        _SCHEMA)
    return detect_stuck_jobs_tiers(jobs, NOW)


def test_tier_priority_and_exclusions(detected):
    tiers = {r["job_id"]: r["detection_tier"]
             for r in detected.collect()}
    assert tiers == {"all3": "crashed_at_startup",
                     "hb": "heartbeat_timeout",
                     "nullhb": "stale_update"}


def test_recovery_ladder_and_stats(spark, detected):
    resume = spark.createDataFrame(
        [Row(job_id="all3", can_resume=True, checkpoint_valid=True,
             last_stage="chunking"),
         Row(job_id="hb", can_resume=True, checkpoint_valid=False,
             last_stage="parsing")],
        "job_id string, can_resume boolean, checkpoint_valid boolean, "
        "last_stage string")
    plan = {r["job_id"]: r.asDict()
            for r in plan_recovery(detected, resume).collect()}
    assert plan["all3"]["action"] == "restart_from_checkpoint"
    assert plan["all3"]["fail_reason"] is None
    assert plan["all3"]["resume_stage"] == "chunking"
    assert plan["hb"]["action"] == "cleanup_and_fail"
    assert plan["hb"]["fail_reason"] == "Invalid checkpoint data"
    # absent from resume state -> plain fail
    assert plan["nullhb"]["action"] == "fail"
    assert plan["nullhb"]["fail_reason"] == \
        "Stuck without valid checkpoint"
    stats = recovery_stats(
        plan_recovery(detected, resume)).collect()[0]
    assert (stats["stuck_jobs_detected"], stats["jobs_restarted"],
            stats["jobs_failed"]) == (3, 1, 2)
    # auto_restart off: even a valid checkpoint fails
    off = {r["job_id"]: r["action"]
           for r in plan_recovery(detected, resume,
                                  auto_restart=False).collect()}
    assert set(off.values()) == {"fail"}


def test_import_recovery_reason_format(spark):
    imp = spark.createDataFrame(
        [Row(job_id="i1", source_name="s", status="processing",
             updated_at_min=4978.5, background_job_id="b1"),
         Row(job_id="i2", source_name="s", status="processing",
             updated_at_min=4990.0, background_job_id=None)],
        "job_id string, source_name string, status string, "
        "updated_at_min double, background_job_id string")
    out = {r["job_id"]: r.asDict()
           for r in recover_import_jobs(imp, 5000.0).collect()}
    assert list(out) == ["i1"]  # i2 is only 10 min stale
    assert out["i1"]["error_message"] == \
        "XML import job stuck for 21.5 minutes without progress"
    assert out["i1"]["update_background_job"] is True
