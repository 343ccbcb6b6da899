"""S7 image/object-storage sink: page-indexed naming, page-number
re-parse, idempotent keyed upsert (pdf_processor.py:1022-1027,1563-1633
semantics)."""

from __future__ import annotations

import pytest

from mivaa_pdf_extractor_spark.operators.media import (
    media_object_rows, media_object_sink)
from mivaa_pdf_extractor_spark.sources.tables_io import Catalog

SPANS_T = ("doc_id string, spans array<struct<kind:string,text:string,"
           "media_ref:string,offset:int,page:int>>")


def _extracted(spark, rows):
    return spark.createDataFrame(rows, SPANS_T)


def test_object_naming_all_layers(spark):
    df = _extracted(spark, [
        ("d1", [("image", "", "d1/p2/img0", 0, 2),
                ("image", "", "d1/p2/img1", 5, 2),
                ("image", "", "d1/p3/region0", 9, 3),
                ("image", "", "d1/p4/full_render", 12, 4),
                ("text", "hello", "", 20, 4)]),
    ])
    got = {r["media_ref"]: r for r in media_object_rows(df).collect()}
    assert set(got) == {"d1/p2/img0", "d1/p2/img1", "d1/p3/region0",
                       "d1/p4/full_render"}
    assert got["d1/p2/img0"]["filename"] == "page_2_image_0.png"
    assert got["d1/p2/img1"]["object_key"] == "d1/page_2_image_1.png"
    assert got["d1/p3/region0"]["filename"] == "page_3_region_0.png"
    assert got["d1/p4/full_render"]["filename"] == "page_4_full.png"
    # the upload path's page-number RE-PARSE from the filename
    assert got["d1/p3/region0"]["page_number"] == 3
    # deterministic 16-byte md5 payload stand-in
    assert len(got["d1/p2/img0"]["content"]) == 16


def test_real_codecs_gate_raises(spark):
    df = _extracted(spark, [("d", [("image", "", "d/p1/img0", 0, 1)])])
    with pytest.raises(NotImplementedError):
        media_object_rows(df, use_real_codecs=True)


def test_sink_idempotent_replace(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = _extracted(spark, [
        ("d1", [("image", "", "d1/p1/img0", 0, 1)]),
        ("d2", [("image", "", "d2/p1/img0", 0, 1)]),
    ])
    media_object_sink(df, cat)
    media_object_sink(df, cat)  # re-run replaces, not duplicates
    rows = cat.read("media_objects").collect()
    assert sorted(r["object_key"] for r in rows) == [
        "d1/page_1_image_0.png", "d2/page_1_image_0.png"]
