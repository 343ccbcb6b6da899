"""Pins for the stuck-job analyzer ladders
(operators/job_diagnosis.py vs stuck_job_analyzer.py)."""

import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators.job_diagnosis import (
    analyze_stuck_jobs, stage_progression, stuck_job_statistics)

_JOBS = ("job_id string, filename string, status string, stage string, "
         "progress_percentage long, updated_at_min double")
_CK = ("job_id string, ckpt_pos int, stage string, "
       "created_at_sec double")


@pytest.fixture(scope="module")
def frames(spark):
    jobs = spark.createDataFrame(
        [Row(job_id="a", filename="a.pdf", status="processing",
             stage="extracting_images", progress_percentage=40,
             updated_at_min=988.0),       # stuck 12 -> image branch
         Row(job_id="b", filename="b.pdf", status="processing",
             stage="parsing", progress_percentage=5,
             updated_at_min=950.0),       # stuck 50 -> silent crash
         Row(job_id="c", filename="c.pdf", status="processing",
             stage="parsing", progress_percentage=0,
             updated_at_min=998.0)],      # no ckpts -> never started
        _JOBS)
    ckpts = spark.createDataFrame(
        [
            # a: repeated 'p' overwrites its duration (0 -> 7) but
            # keeps first insertion position; tie p=7 vs q=7 -> p
            Row(job_id="a", ckpt_pos=0, stage="p",
                created_at_sec=100.0),
            Row(job_id="a", ckpt_pos=1, stage="q",
                created_at_sec=107.0),
            Row(job_id="a", ckpt_pos=2, stage="p",
                created_at_sec=114.0),
            Row(job_id="b", ckpt_pos=0, stage="s",
                created_at_sec=10.0),
        ],
        _CK)
    return jobs, ckpts


def test_progression_overwrite_and_first_pos(spark, frames):
    _, ckpts = frames
    rows = {(r["job_id"], r["stage"]): r.asDict()
            for r in stage_progression(ckpts).collect()}
    assert rows[("a", "p")]["duration_seconds"] == 7.0  # overwritten
    assert rows[("a", "p")]["first_pos"] == 0
    assert rows[("a", "q")]["duration_seconds"] == 7.0
    assert rows[("b", "s")]["duration_seconds"] == 0.0


def test_analysis_ladders(spark, frames):
    jobs, ckpts = frames
    out = {r["job_id"]: r.asDict()
           for r in analyze_stuck_jobs(jobs, ckpts, 1000.0).collect()}
    a = out["a"]
    # tie at 7.0s between p (first_pos 0) and q (first_pos 1) -> p
    assert a["bottleneck_stage"] == "p"
    assert a["root_cause"] == \
        "image_extraction_timeout_or_memory_exhaustion"
    # memory_exhaustion AND timeout blocks, in block order
    assert len(a["recommendations"]) == 6
    assert a["recommendations"][0] == "Reduce batch size from 10 to 5 images"
    assert a["recommendations"][3] == \
        "Reduce stuck job timeout from 30min to 5min"
    assert a["recovery_options"][0] == "Resume from last checkpoint: p"
    b = out["b"]
    assert b["root_cause"] == "silent_crash_no_error_handling"
    assert len(b["recommendations"]) == 3  # silent_crash block only
    c = out["c"]
    assert c["root_cause"] == "job_never_started_background_task_failed"
    assert c["bottleneck_stage"] == "unknown"
    assert c["recommendations"] == []
    assert c["recovery_options"] == [
        "Restart job from beginning",
        "Mark job as failed and notify user"]


def test_statistics_tiebreak_and_empty(spark, frames):
    jobs, _ = frames
    r = stuck_job_statistics(jobs, 1000.0).collect()[0].asDict()
    assert r["total_stuck_jobs"] == 1  # only b is >30 min stale
    assert r["most_common_stuck_stage"] == "parsing"
    fresh = jobs.filter("job_id = 'nope'")
    e = stuck_job_statistics(fresh, 1000.0).collect()[0].asDict()
    assert e["total_stuck_jobs"] == 0
    assert e["most_common_stuck_stage"] == "none"
    assert e["stage_breakdown"] == []
