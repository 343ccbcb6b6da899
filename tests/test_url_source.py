"""S2 PDF-from-URL source: status taxonomy, warn-only content-type gate,
injectable transport, and the bridge into the S1 from-bytes pipeline
(pdf_processor.py:381-428 semantics)."""

from __future__ import annotations

import pytest

from mivaa_pdf_extractor_spark.sources.url_source import (
    STATUS_DOWNLOAD_FAILED, STATUS_FETCHED, fake_transport,
    fetch_documents_from_urls, fetched_to_spans)


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, url string")


def test_status_taxonomy_and_content_type(spark):
    urls = _urls(spark, [
        ("ok", "https://x/a.pdf"),
        ("okct", "https://x/b#ct=html"),      # html served, non-.pdf url
        ("pdfext", "https://x/c.PDF"),        # case-insensitive extension
        ("err404", "https://x/d.pdf#404"),
        ("boom", "https://x/e.pdf#boom"),
    ])
    got = {r["doc_id"]: r for r in
           fetch_documents_from_urls(urls, fake_transport,
                                     fetch_partitions=2).collect()}
    assert got["ok"]["status"] == STATUS_FETCHED
    assert got["ok"]["content_type_ok"] is True
    assert got["ok"]["content"] == b"https://x/a.pdf"
    # warn-only gate: bytes still flow, flag false
    assert got["okct"]["status"] == STATUS_FETCHED
    assert got["okct"]["content_type_ok"] is False
    assert got["pdfext"]["content_type_ok"] is True
    # HTTP error and transport error both map to download_failed with
    # the reference's error phrasing, payload absent
    for bad in ("err404", "boom"):
        assert got[bad]["status"] == STATUS_DOWNLOAD_FAILED
        assert got[bad]["content"] is None
        assert got[bad]["error"].startswith("Failed to download PDF from")


def test_default_transport_raises_as_status(spark):
    """Without an injected transport every row fails with the
    NotImplementedError recorded — no crash, no silent success."""
    urls = _urls(spark, [("a", "https://x/a.pdf")])
    [r] = fetch_documents_from_urls(urls, fetch_partitions=1).collect()
    assert r["status"] == STATUS_DOWNLOAD_FAILED
    assert "network transport is not available" in r["error"]


def test_fetched_bridges_into_extraction(spark):
    """Successful fetches feed the S1 pipeline unchanged: the bridge
    emits (doc_id, spans) and run_extract processes them."""
    from mivaa_pdf_extractor_spark.operators.extract import run_extract

    urls = _urls(spark, [
        ("good", "https://x/a.pdf"),
        ("bad", "https://x/b.pdf#404"),
    ])
    fetched = fetch_documents_from_urls(urls, fake_transport,
                                        fetch_partitions=2)
    out = {r["doc_id"]: r for r in
           run_extract(fetched_to_spans(fetched)).collect()}
    assert set(out) == {"good"}  # failed fetch never reaches the kernel
    assert out["good"]["status"] == "completed"
    # the kernel applies its normalization passes to the fetched text, so
    # assert on content survival, not byte equality
    joined = "".join(s["text"] for s in out["good"]["spans"])
    assert "pdf" in joined and out["good"]["n_spans"] >= 1
