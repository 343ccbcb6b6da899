"""Pins for the background-job persistence fold
(operators/job_persistence.py vs job_recovery_service.py)."""

import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators.job_persistence import (
    cleanup_old_jobs, fold_job_events, job_statistics)

_SCHEMA = ("event_ord long, kind string, job_id string, "
           "document_id string, filename string, status string, "
           "progress long, error string, "
           "metadata array<struct<key:string,value:string>>, "
           "reason string, doc_exists boolean")


def _p(ord_, job, status, progress=0, error=None, meta=None,
       doc_exists=True):
    return Row(event_ord=ord_, kind="persist", job_id=job,
               document_id=f"d_{job}", filename=f"f_{job}",
               status=status, progress=progress, error=error,
               metadata=[Row(key=k, value=v)
                         for k, v in meta] if meta else None,
               reason=None, doc_exists=doc_exists)


def _sweep(ord_, reason):
    return Row(event_ord=ord_, kind="interrupt", job_id=None,
               document_id=None, filename=None, status=None,
               progress=None, error=None, metadata=None,
               reason=reason, doc_exists=None)


@pytest.fixture(scope="module")
def folded(spark):
    events = spark.createDataFrame(
        [
            # a: dead-parent first insert writes NOTHING; created at
            # the second persist; error set then cleared by a later
            # persist (reference always writes the error field)
            _p(0, "a", "pending", meta=[("x", "1")], doc_exists=False),
            _p(1, "a", "processing", 10, error="boom",
               meta=[("x", "2"), ("y", "1")]),
            _p(2, "a", "processing", 20, error=None),
            # sweep at 5: a is processing -> interrupted
            _sweep(5, "restart"),
            # second sweep immediately after: no-op (already
            # interrupted)
            _sweep(6, "again"),
            # a persist after the sweeps resurrects the status but
            # interrupted_at stays
            _p(7, "a", "completed", 100),
            # b: completed at sweep time -> sweep is a no-op
            _p(0, "b", "completed", 100, meta=[("k", "v")]),
            # c: never gets a live parent -> no row at all
            _p(3, "c", "pending", doc_exists=False),
        ],
        _SCHEMA)
    return {r["job_id"]: r.asDict()
            for r in fold_job_events(events).collect()}, events


def test_dead_parent_and_creation(folded):
    rows, _ = folded
    assert "c" not in rows
    a = rows["a"]
    assert a["created_at_ord"] == 1
    # metadata of the aborted insert at ord 0 never landed
    assert [(m["key"], m["value"]) for m in a["metadata"]] == [
        ("x", "2"), ("y", "1")]


def test_sweep_gating_and_sticky_interrupted_at(folded):
    rows, _ = folded
    a = rows["a"]
    assert a["status"] == "completed"   # persist at 7 overwrote
    assert a["interrupted_at_ord"] == 5  # only the first sweep applied
    assert a["updated_at_ord"] == 7
    # error: sweep set 'restart', final persist cleared it to NULL
    assert a["error"] is None
    b = rows["b"]
    assert b["status"] == "completed"
    assert b["interrupted_at_ord"] == -1


def test_error_overwrite_semantics(spark):
    events = spark.createDataFrame(
        [_p(0, "j", "processing", error="bad"),
         _sweep(1, "swept")],
        _SCHEMA)
    r = fold_job_events(events).collect()[0].asDict()
    assert r["status"] == "interrupted"
    assert r["error"] == "swept"
    assert r["interrupted_at_ord"] == 1


def test_cleanup_and_stats(folded, spark):
    rows_map, events = folded
    rows = fold_job_events(events)
    swept = cleanup_old_jobs(rows, now_ord=30, keep_window=10)
    # both a (updated 7) and b (updated 0) are completed & stale
    flags = {r["job_id"]: r["deleted"] for r in swept.collect()}
    assert flags == {"a": True, "b": True}
    stats = job_statistics(
        swept.filter("NOT deleted")).collect()[0].asDict()
    assert stats == {"total": 0, "pending": 0, "processing": 0,
                     "completed": 0, "failed": 0, "interrupted": 0}
