"""Pins for the document_images row-shaping fold
(app/services/core/supabase_client.py:393-645)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import image_row as imr

COLS = ["image_index", "storage_url", "public_url", "url", "path",
        "page", "page_number", "caption", "description", "ai_present",
        "ai_cls", "ai_reason", "ai_is_material", "material_category",
        "category", "param_layer", "info_layer", "param_cvg",
        "info_cvg", "extraction_layer"]


def _row(spark, **kw):
    base = dict(image_index=0, storage_url=None, public_url=None,
                url=None, path=None, page=None, page_number=None,
                caption=None, description=None, ai_present=False,
                ai_cls=None, ai_reason=None, ai_is_material=False,
                material_category=None, category=None,
                param_layer=None, info_layer=2, param_cvg=None,
                info_cvg=True, extraction_layer=None)
    base.update(kw)
    pdf = pd.DataFrame([base], columns=COLS)
    pdf["page"] = pdf["page"].astype("Int32")
    pdf["page_number"] = pdf["page_number"].astype("Int32")
    pdf["param_layer"] = pdf["param_layer"].astype("Int32")
    pdf["info_layer"] = pdf["info_layer"].astype("Int32")
    pdf["param_cvg"] = pdf["param_cvg"].astype("boolean")
    df = spark.createDataFrame(pdf)
    return imr.save_image_row(df).collect()[0]


def test_url_ladder_and_placeholder_skip(spark):
    r = _row(spark, storage_url="", public_url=None, url="https://u/1",
             path="/tmp/x")
    assert r.image_url == "https://u/1" and r.skipped is False
    r = _row(spark, storage_url="placeholder_9", url="https://u/1")
    assert r.skipped is True       # placeholder wins the ladder, skips


def test_page_zero_falls_through(spark):
    r = _row(spark, storage_url="s", page=0, page_number=7)
    assert r.page_number_out == 7      # LIVE or: 0 falls (pin)
    r = _row(spark, storage_url="s", page=0, page_number=0)
    assert r.page_number_out == 1      # double-falsy -> default 1


def test_reason_gate_strict_ten_chars(spark):
    r = _row(spark, storage_url="s", ai_present=True,
             ai_cls="material_closeup", ai_reason="exactly10!")
    assert r.caption_out == "Image from page 1"   # len==10 fails (pin)
    r = _row(spark, storage_url="s", ai_present=True,
             ai_cls="material_closeup", ai_reason="eleven chars")
    assert r.caption_out == "Material Closeup: eleven chars"


def test_confidence_hardcoded(spark):
    assert _row(spark, storage_url="s").confidence == 0.95


def test_layer_or_vs_cvg_is_not_none(spark):
    r = _row(spark, storage_url="s", param_layer=0, info_layer=3,
             param_cvg=False, info_cvg=True)
    assert r.layer_out == 3                       # 0 falls through
    assert r.captures_vector_graphics_out is False  # False sticks


def test_bbox_inclusive_bounds(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [(0, [0.0, 1.0, 0.5, 0.25]), (1, [0.0, 1.0001, 0.5, 0.25]),
         (2, [0.1, 0.2, 0.3]), (3, None)],
        columns=["box_id", "bbox"]))
    rows = {r.box_id: r for r in imr.validate_bbox(df).collect()}
    assert rows[0].bbox_kept is True      # 0 and 1 inclusive
    assert rows[1].bbox_kept is False
    assert rows[2].bbox_kept is False     # len 3
    assert rows[3].bbox_kept is False
