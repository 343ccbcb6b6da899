"""Pins for the legacy KB batch-save row shaping
(supabase_client.py:647-832)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import kb_save as ks


def _chunks(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["document_id", "i", "content", "is_string",
                       "workspace_id"]))


def test_chunk_index_keeps_gaps(spark):
    rows = [(1, 0, "a", True, "ws"), (1, 1, "  ", True, "ws"),
            (1, 2, "b", True, "ws"), (1, 3, "c", False, "ws")]
    out = sorted(ks.chunk_rows(_chunks(spark, rows)).collect(),
                 key=lambda r: r.chunk_index)
    # empty and non-string rows skipped, index gaps survive (pin)
    assert [(r.chunk_index, r.chunk_number) for r in out] \
        == [(0, 1), (2, 3)]


_IMG_COLS = ["document_id", "i", "is_dict", "storage_url", "url",
             "path", "public_url", "page", "page_number", "caption",
             "description", "extraction_layer", "storage_uploaded",
             "storage_bucket", "raw_str"]


def _img(**kw):
    base = dict(document_id=1, i=0, is_dict=True, storage_url="s",
                url=None, path="", public_url=None, page=2,
                page_number=5, caption="c", description="d",
                extraction_layer="render", storage_uploaded=True,
                storage_bucket="b", raw_str="")
    base.update(kw)
    return tuple(base[c] for c in _IMG_COLS)


def _imgs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=_IMG_COLS),
        schema="document_id long, i int, is_dict boolean, "
               "storage_url string, url string, path string, "
               "public_url string, page int, page_number int, "
               "caption string, description string, "
               "extraction_layer string, storage_uploaded boolean, "
               "storage_bucket string, raw_str string")


def test_url_ladder_and_placeholder_drop(spark):
    rows = [_img(i=0, storage_url="", url="", path="/p", ),
            _img(i=1, storage_url="", url="", path="",
                 public_url=""),                      # -> placeholder
            _img(i=2, storage_url="placeholder_real.jpg")]  # real url
    out = {r.image_index: r.image_url for r in
           ks.image_rows(_imgs(spark, rows)).collect()}
    assert out == {0: "/p"}   # 1 placeholder, 2 dropped despite real


def test_page_zero_falls_to_one(spark):
    rows = [_img(i=0, page=0, page_number=0),
            _img(i=1, page=0, page_number=7),
            _img(i=2, page=-1, page_number=9)]
    out = {r.image_index: r.page_number for r in
           ks.image_rows(_imgs(spark, rows)).collect()}
    assert out == {0: 1, 1: 7, 2: -1}   # -1 is truthy (pin)


def test_non_dict_image_defaults(spark):
    rows = [_img(i=3, is_dict=False, raw_str="https://s/x",
                 page=9, caption="ignored", extraction_layer="x",
                 storage_uploaded=True, storage_bucket="zzz")]
    r = ks.image_rows(_imgs(spark, rows)).collect()[0]
    assert r.image_url == "https://s/x"
    assert r.page_number == 1 and r.caption == "Image 4"
    assert r.extraction_layer == "embedded"
    assert r.storage_uploaded == "false"
    assert r.storage_bucket == "pdf-tiles"
