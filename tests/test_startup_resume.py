"""Pins for the startup auto-resume fold (rag_routes.py:249-403)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import startup_resume as sr

_JOB_COLS = ["job_id", "status", "job_type", "interrupted_at",
             "recovery_attempts", "document_id", "filename",
             "meta_filename", "meta_workspace_id", "meta_categories",
             "chunk_size", "chunk_overlap", "discovery_model",
             "claim_ok", "promote_ok"]


def _job(**kw):
    base = dict(job_id=1, status="interrupted",
                job_type="pdf_processing",
                interrupted_at=sr.NOW - 60, recovery_attempts=0,
                document_id=7, filename="f.pdf", meta_filename="m.pdf",
                meta_workspace_id=3, meta_categories="products",
                chunk_size=800, chunk_overlap=100,
                discovery_model="claude-vision", claim_ok=True,
                promote_ok=True)
    base.update(kw)
    return tuple(base[c] for c in _JOB_COLS)


def _jobs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=_JOB_COLS),
        schema="job_id long, status string, job_type string, "
               "interrupted_at long, recovery_attempts int, "
               "document_id long, filename string, "
               "meta_filename string, meta_workspace_id long, "
               "meta_categories string, chunk_size int, "
               "chunk_overlap int, discovery_model string, "
               "claim_ok boolean, promote_ok boolean")


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["doc_id", "file_path", "file_on_disk",
                       "workspace_id"]),
        schema="doc_id long, file_path string, file_on_disk boolean, "
               "workspace_id long")


_DOC = [(7, "/tmp/d.pdf", True, 5)]


def test_window_is_four_hours_not_thirty_minutes(spark):
    rows = [_job(job_id=1, interrupted_at=sr.NOW - 3 * 3600),
            _job(job_id=2, interrupted_at=sr.NOW - 5 * 3600)]
    out = sr.resume_outcomes(_jobs(spark, rows), _docs(spark, _DOC),
                             now=sr.NOW).collect()
    # the docstring's "30 min" loses to the code's 4h cutoff
    assert [r.job_id for r in out] == [1]


def test_outcome_ladder_order(spark):
    rows = [_job(job_id=1, document_id=None),
            _job(job_id=2, document_id=99),          # no doc row
            _job(job_id=3, claim_ok=False),
            _job(job_id=4, promote_ok=False),
            _job(job_id=5)]
    out = {r.job_id: r.outcome for r in sr.resume_outcomes(
        _jobs(spark, rows), _docs(spark, _DOC), now=sr.NOW).collect()}
    assert out == {1: "skipped_no_doc", 2: "skipped_no_doc",
                   3: "claim_noop", 4: "promote_noop", 5: "resumed"}


def test_missing_file_on_disk_skips(spark):
    docs = [(7, "/tmp/d.pdf", False, 5), (8, "", True, 5)]
    rows = [_job(job_id=1, document_id=7),
            _job(job_id=2, document_id=8)]
    out = {r.job_id: r.outcome for r in sr.resume_outcomes(
        _jobs(spark, rows), _docs(spark, docs), now=sr.NOW).collect()}
    assert out == {1: "skipped_no_file", 2: "skipped_no_file"}


def test_rehydration_falsy_or_defaults(spark):
    rows = [_job(job_id=1, filename="", meta_filename="",
                 chunk_size=0, chunk_overlap=0, discovery_model="",
                 meta_categories="a, b ,c")]
    r = sr.resume_outcomes(_jobs(spark, rows), _docs(spark, _DOC),
                           now=sr.NOW).collect()[0]
    assert r.filename_out == "resumed.pdf"
    assert r.chunk_size_out == 1000 and r.overlap_out == 200  # 0 falls
    assert r.model_out == "claude-vision"
    assert r.categories_out == "a,b,c"       # per-item strip
    assert r.workspace_out == 5              # doc wins over meta
    assert r.attempt_number == 1


def test_summary_ignores_noops(spark):
    rows = [_job(job_id=1), _job(job_id=2, claim_ok=False),
            _job(job_id=3, document_id=None)]
    s = sr.resume_summary(sr.resume_outcomes(
        _jobs(spark, rows), _docs(spark, _DOC),
        now=sr.NOW)).collect()[0]
    assert (s.resumed, s.skipped_no_file, s.skipped_no_doc) == (1, 0, 1)
