"""Pins for the job progress-tracker rollup (operators/progress.py).

Reference semantics under test (progress_tracker.py):
- counters are per-EVENT, not per-page — a page completed after a
  failure counts in both tallies and the percentage may exceed 100,
  unclamped (:399, :417, :570-576);
- events for pages outside 1..total are silently ignored (:374-435);
- a zero-page job reports 0.0;
- the LAST manual update_progress/update_stage percentage wins and the
  DB-sync value truncates with int() (:302-347, :175-183);
- per-page: status from the last event; stage set only by complete
  ('completed') / fail (event stage) — a skip leaves it; error_message
  set by fail/skip and NOT cleared by a later complete (:385-435).
"""

import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators.progress import (
    job_page_statuses, job_progress_rollup)


def _ev(job, ord_, kind, page=None, ocr=None, images=None, stage=None,
        pct=None, err=None):
    return Row(job_id=job, event_ord=ord_, kind=kind, page_number=page,
               ocr_applied=ocr, images_extracted=images, stage=stage,
               progress_pct=pct, error_message=err)


@pytest.fixture(scope="module")
def frames(spark):
    jobs = spark.createDataFrame(
        [Row(job_id=1, total_pages=2), Row(job_id=2, total_pages=0),
         Row(job_id=3, total_pages=3)],
        "job_id long, total_pages long")
    events = spark.createDataFrame(
        [
            # job 1: page 1 fails then completes — both counters tick,
            # pct = 3/2*100 = 150, unclamped; page 5 is out of ledger
            _ev(1, 0, "fail", page=1, stage="extract", err="boom"),
            _ev(1, 1, "complete", page=1, ocr=True, images=2),
            _ev(1, 2, "complete", page=2, ocr=False, images=1),
            _ev(1, 3, "complete", page=5, ocr=True, images=9),
            # job 2: zero pages, manual overrides — last one (77.9) wins
            # and int()-truncates to 77
            _ev(2, 0, "progress", pct=45),
            _ev(2, 1, "stage", stage="finalizing", pct=78),
            _ev(2, 2, "progress", pct=77),
            # job 3: skip leaves stage, later complete keeps the error
            _ev(3, 0, "skip", page=1, err="blank"),
            _ev(3, 1, "fail", page=2, stage="ocr", err="bad"),
            _ev(3, 2, "complete", page=2, ocr=False, images=0),
        ],
        "job_id long, event_ord long, kind string, page_number long, "
        "ocr_applied boolean, images_extracted long, stage string, "
        "progress_pct long, error_message string")
    return jobs, events


def test_rollup_per_event_counters_unclamped(frames):
    jobs, events = frames
    rows = {r["job_id"]: r for r in
            job_progress_rollup(events, jobs).collect()}
    j1 = rows[1]
    # the out-of-ledger page-5 complete is ignored everywhere
    assert j1["pages_completed"] == 2
    assert j1["pages_failed"] == 1
    assert j1["progress_percentage"] == pytest.approx(150.0)
    assert j1["effective_progress"] == 150
    assert j1["ocr_pages_processed"] == 1
    assert j1["total_images_extracted"] == 3


def test_rollup_zero_pages_and_override(frames):
    jobs, events = frames
    rows = {r["job_id"]: r for r in
            job_progress_rollup(events, jobs).collect()}
    j2 = rows[2]
    assert j2["progress_percentage"] == 0.0
    assert j2["manual_override"] == 77
    assert j2["effective_progress"] == 77
    assert j2["current_stage"] == "finalizing"
    # no stage event for job 1 -> default
    assert rows[1]["current_stage"] == "initializing"


def test_page_ledger_last_event_semantics(frames):
    jobs, events = frames
    out = {(r["job_id"], r["page_number"]): r
           for r in job_page_statuses(events, jobs).collect()}
    # ledger is exactly 1..total per job (page 5 never appears)
    assert {k for k in out if k[0] == 1} == {(1, 1), (1, 2)}
    assert not [k for k in out if k[0] == 2]
    # job1 page1: fail then complete -> success, stage 'completed',
    # but the fail's error message is never cleared
    p = out[(1, 1)]
    assert (p["status"], p["stage"], p["error_message"]) == \
        ("success", "completed", "boom")
    # job3 page1: skip only -> skipped, stage untouched
    p = out[(3, 1)]
    assert (p["status"], p["stage"], p["error_message"]) == \
        ("skipped", "initializing", "blank")
    # job3 page2: fail(ocr) then complete -> stage flips to completed,
    # error from the fail survives
    p = out[(3, 2)]
    assert (p["status"], p["stage"], p["error_message"]) == \
        ("success", "completed", "bad")
    # job3 page3: no events -> pending defaults
    p = out[(3, 3)]
    assert (p["status"], p["stage"], p["error_message"]) == \
        ("pending", "initializing", None)
