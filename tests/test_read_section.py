"""Pins for the read-section folds (rag_routes.py:6692-6877)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import read_section as rs

_REQ_COLS = ["req_id", "source_raw", "document_id", "product_id",
             "kb_doc_id", "from_raw", "to_raw", "max_tokens"]


def _req(**kw):
    base = dict(req_id=1, source_raw="pdf", document_id=1,
                product_id=10, kb_doc_id=None, from_raw=0,
                to_raw=None, max_tokens=1000)
    base.update(kw)
    return tuple(base[c] for c in _REQ_COLS)


def _reqs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=_REQ_COLS),
        schema="req_id long, source_raw string, document_id long, "
               "product_id long, kb_doc_id long, from_raw int, "
               "to_raw int, max_tokens long")


def _chunks(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["chunk_id", "document_id",
                                    "product_id", "chunk_index",
                                    "content", "page_number",
                                    "product_name",
                                    "document_title"]),
        schema="chunk_id long, document_id long, product_id long, "
               "chunk_index int, content string, page_number int, "
               "product_name string, document_title string")


def test_request_ladder_and_clamps(spark):
    rows = [_req(req_id=1, source_raw=" PDF ", from_raw=-5),
            _req(req_id=2, source_raw="weird"),
            _req(req_id=3, source_raw="pdf", document_id=None),
            _req(req_id=4, source_raw=None, kb_doc_id=None),
            _req(req_id=5, from_raw=6, to_raw=2)]
    out = {r.req_id: r for r in rs.resolve_requests(
        _reqs(spark, rows)).collect()}
    assert out[1].status == "ok" and out[1].from_idx == 0
    assert out[1].to_idx == 3   # default span = clamped from + 3
    assert out[2].status == "400_bad_source"
    assert out[3].status == "400_missing_document_id"
    # None source folds to 'kb', then missing kb_doc_id
    assert out[4].status == "400_missing_kb_doc_id"
    assert (out[5].from_idx, out[5].to_idx) == (6, 6)  # clamp UP


def test_first_section_always_kept(spark):
    reqs = [_req(req_id=1, from_raw=0, to_raw=2, max_tokens=5)]
    ch = [(1, 1, 10, 0, "x" * 100, 1, "P", "D"),   # 25 tokens > 5
          (2, 1, 10, 1, "y" * 40, 1, "P", "D")]
    r = rs.read_pdf_sections(_reqs(spark, reqs),
                             _chunks(spark, ch)).collect()[0]
    assert r.status == "200"
    assert r.chunks_returned == 1        # oversized opener ships
    assert r.token_total == 25
    assert r.truncated == "true"
    assert r.returned_chunk_indexes == "0"
    assert r.outline_rows == 2           # outline covers the cut row


def test_empty_span_404(spark):
    reqs = [_req(req_id=1, from_raw=50, to_raw=60)]
    ch = [(1, 1, 10, 0, "x", 1, "P", "D")]
    r = rs.read_pdf_sections(_reqs(spark, reqs),
                             _chunks(spark, ch)).collect()[0]
    assert r.status == "404_not_found"
    assert r.token_total is None


def test_namespace_and_heading_and_token_floor(spark):
    reqs = [_req(req_id=1, from_raw=0, to_raw=3, max_tokens=1000)]
    ch = [(1, 1, 10, 0, "ab", None, "P", None),   # floor token = 1
          (2, 1, 10, 1, "c" * 8, 4, "P", "D"),
          (3, 1, 99, 2, "other product", 1, "P", "D")]
    r = rs.read_pdf_sections(_reqs(spark, reqs),
                             _chunks(spark, ch)).collect()[0]
    assert r.chunks_returned == 2        # product 99 excluded
    assert r.token_total == 1 + 2        # max(1, 2//4), 8//4
    assert r.first_heading is None       # NULL page -> no heading
    assert r.document_title == "P"       # title falls back to product
