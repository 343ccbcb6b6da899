"""Pins for the product-progress fold (operators/product_progress.py).

Reference semantics under test (product_progress_tracker.py):
- terminal-state guard (:195-233): stage / stage_complete are no-ops
  once status is 'failed' or 'completed';
- mark_product_complete guards only status != 'failed' (:292-333), so
  it CAN overwrite an already-completed row and REPLACES metrics
  wholesale;
- mark_product_failed is unconditional (:335-368) and does not touch
  current_stage;
- initialize_product on an existing row updates to PROCESSING with no
  guard (:96-125) — resurrecting a failed product re-opens the guards;
- stage_complete appends to stages_completed only if absent (:262-265)
  and dict-merges metrics (:268-271);
- stage == 'extraction' stamps started_at (:219-220);
- progress % = min(100, int(len(stages_completed)/5*100))
  (schemas/product_progress.py).
"""

import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators.product_progress import (
    fold_product_progress, job_product_summary)


def _ev(prod, ord_, kind, stage=None, metrics=None, err=None,
        job="j1"):
    return Row(job_id=job, product_id=prod, event_ord=ord_, kind=kind,
               stage=stage, status_param=None,
               metrics=[Row(key=k, value=v)
                        for k, v in metrics] if metrics else None,
               error_message=err)


_SCHEMA = ("job_id string, product_id string, event_ord long, "
           "kind string, stage string, status_param string, "
           "metrics array<struct<key:string,value:bigint>>, "
           "error_message string")


@pytest.fixture(scope="module")
def folded(spark):
    events = spark.createDataFrame(
        [
            # A: failed is terminal for stage/stage_complete; failed
            # keeps current_stage, stamps error fields
            _ev("a", 0, "init_new"),
            _ev("a", 1, "stage", stage="extraction"),
            _ev("a", 2, "failed", stage="extraction", err="boom"),
            _ev("a", 3, "stage_complete", stage="extraction",
                metrics=[("ghost", 9)]),
            _ev("a", 4, "stage", stage="chunking"),
            # B: init_existing resurrects a failed row — later events
            # apply again; complete REPLACES metrics wholesale
            _ev("b", 0, "init_new"),
            _ev("b", 1, "stage", stage="extraction"),
            _ev("b", 2, "failed", stage="extraction", err="timeout"),
            _ev("b", 3, "init_existing"),
            _ev("b", 4, "stage_complete", stage="chunking",
                metrics=[("chunks_created", 7)]),
            _ev("b", 5, "complete", metrics=[("chunks_created", 7),
                                             ("images_processed", 2)]),
            # C: post-complete stage_complete is a no-op, but a second
            # complete overwrites (guard is only != failed)
            _ev("c", 0, "init_new"),
            _ev("c", 1, "stage_complete", stage="extraction",
                metrics=[("a", 1)]),
            _ev("c", 2, "complete", metrics=[("m", 1)]),
            _ev("c", 3, "stage_complete", stage="images",
                metrics=[("late", 5)]),
            _ev("c", 4, "complete", metrics=[("m", 2)]),
            # D: dict-merge + append-if-absent + pct clamp
            _ev("d", 0, "init_new"),
            _ev("d", 1, "stage_complete", stage="extraction",
                metrics=[("a", 1), ("b", 1)]),
            _ev("d", 2, "stage_complete", stage="chunking",
                metrics=[("b", 2), ("c", 3)]),
            _ev("d", 3, "stage_complete", stage="extraction"),
            _ev("d", 4, "stage_complete", stage="images"),
            _ev("d", 5, "stage_complete", stage="creation"),
            _ev("d", 6, "stage_complete", stage="relationships"),
            _ev("d", 7, "stage_complete", stage="cleanup"),
        ],
        _SCHEMA)
    rows = fold_product_progress(events).collect()
    return {r["product_id"]: r.asDict() for r in rows}, events


def test_failed_is_terminal_for_guarded_events(folded):
    rows, _ = folded
    a = rows["a"]
    assert a["status"] == "failed"
    # failed does not touch current_stage; guarded events after are
    # no-ops
    assert a["current_stage"] == "extraction"
    assert a["stages_completed"] == []
    assert a["progress_percentage"] == 0
    assert a["error_message"] == "boom"
    assert a["error_stage"] == "extraction"
    assert a["error_ord"] == 2
    assert a["metrics"] == []


def test_init_existing_resurrects_and_complete_replaces(folded):
    rows, _ = folded
    b = rows["b"]
    assert b["status"] == "completed"
    assert b["current_stage"] == "completed"
    assert b["stages_completed"] == ["chunking"]
    assert b["progress_percentage"] == 20
    # started_at: last of {applied extraction-stage, init_existing}
    assert b["started_at_ord"] == 3
    assert b["completed_at_ord"] == 5
    # complete REPLACED the merged metrics wholesale
    assert [(m["key"], m["value"]) for m in b["metrics"]] == [
        ("chunks_created", 7), ("images_processed", 2)]
    # error fields persist from the (superseded) failure
    assert b["error_message"] == "timeout"


def test_completed_blocks_stage_complete_but_not_complete(folded):
    rows, _ = folded
    c = rows["c"]
    assert c["status"] == "completed"
    # post-complete stage_complete no-op: 'images' absent
    assert c["stages_completed"] == ["extraction"]
    # second complete applied and replaced metrics
    assert c["completed_at_ord"] == 4
    assert [(m["key"], m["value"]) for m in c["metrics"]] == [("m", 2)]


def test_merge_append_if_absent_and_pct_clamp(folded):
    rows, _ = folded
    d = rows["d"]
    # first-occurrence order, duplicate extraction not re-appended
    assert d["stages_completed"] == [
        "extraction", "chunking", "images", "creation",
        "relationships", "cleanup"]
    assert d["progress_percentage"] == 100  # min(100, 6/5*100)
    # dict-merge last-wins per key, sorted output
    assert [(m["key"], m["value"]) for m in d["metrics"]] == [
        ("a", 1), ("b", 2), ("c", 3)]
    assert d["status"] == "pending"  # no stage/complete event


def test_job_summary_counts(folded):
    rows, events = folded
    s = job_product_summary(fold_product_progress(events)).collect()
    assert len(s) == 1
    r = s[0].asDict()
    assert r["total_products"] == 4
    assert r["completed_products"] == 2
    assert r["failed_products"] == 1
    assert r["pending_products"] == 1
    assert r["completion_percentage"] == 50.0
    assert r["failed_product_ids"] == ["a"]
