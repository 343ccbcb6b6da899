"""Pins for document storage-cleanup scoping
(operators/storage_cleanup.py vs cleanup_service.py)."""

import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators.storage_cleanup import (
    resolve_original_object, storage_delete_scope)

_D = ("document_id string, storage_bucket string, "
      "storage_object_path string, file_url string")
_MARKER = "/storage/v1/object/public/"


def test_resolution_ladder(spark):
    docs = spark.createDataFrame(
        [
            # both columns present: columns win over a parseable URL
            Row(document_id="a", storage_bucket="b1",
                storage_object_path="p/x.pdf",
                file_url=f"https://h{_MARKER}other/y.pdf"),
            # bucket present but path missing -> falls to file_url
            Row(document_id="b", storage_bucket="b1",
                storage_object_path=None,
                file_url=f"https://h{_MARKER}bk/u/z.pdf?tok=1&x=2"),
            # no marker
            Row(document_id="c", storage_bucket=None,
                storage_object_path=None,
                file_url="https://h/plain/y.pdf"),
            # marker but no slash in the tail
            Row(document_id="d", storage_bucket=None,
                storage_object_path=None,
                file_url=f"https://h{_MARKER}nosplit"),
            Row(document_id="e", storage_bucket=None,
                storage_object_path=None, file_url=None),
        ],
        _D)
    got = {r["document_id"]: (r["bucket"], r["path"], r["source"])
           for r in resolve_original_object(docs).collect()}
    assert got["a"] == ("b1", "p/x.pdf", "columns")
    # query string stripped, multi-segment path preserved
    assert got["b"] == ("bk", "u/z.pdf", "file_url")
    assert got["c"] == (None, None, "unresolved")
    assert got["d"] == (None, None, "unresolved")
    assert got["e"] == (None, None, "unresolved")


def test_scope_prefix_semantics(spark):
    docs = spark.createDataFrame(
        [Row(document_id="doc1", storage_bucket=None,
             storage_object_path=None, file_url=None)],
        _D)
    listing = spark.createDataFrame(
        [
            # under prefix at two depths: both deleted
            ("pdf-tiles", "extracted/doc1/a.png", False),
            ("pdf-tiles", "extracted/doc1/sub/b.png", False),
            # folder markers never deleted
            ("pdf-tiles", "extracted/doc1", True),
            # a FILE exactly at the prefix is never listed into scope
            ("pdf-tiles", "extracted/doc1", False),
            # prefix of ANOTHER doc id that merely starts the same
            ("pdf-tiles", "extracted/doc12/c.png", False),
            ("documents", "doc1/orig.bin", False),
            ("documents", "doc12/orig.bin", False),
        ],
        "bucket string, path string, is_folder boolean")
    got = sorted((r["tier"], r["path"]) for r in
                 storage_delete_scope(listing, docs).collect())
    assert got == [
        ("legacy", "doc1/orig.bin"),
        ("tiles", "extracted/doc1/a.png"),
        ("tiles", "extracted/doc1/sub/b.png")]
