"""Pins for the Stage-4 icon-metadata rollup + body-text folds
(stage_4_products.py:893-1035,1096-1238)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import icon_rollup as ir


def _items(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["document_id", "image_id", "item_idx",
                       "field_name", "value", "confidence"]))


def _fields(spark, names):
    return spark.createDataFrame(pd.DataFrame(
        {"field_name": names}))


def test_alias_and_trim_normalize(spark):
    items = [(1, 1, 0, " certification ", "ISO", 0.9)]
    out = ir.icon_rollup(_items(spark, items),
                         _fields(spark, ["certifications"])).collect()
    assert out[0].field == "certifications"  # strip + alias map


def test_tie_keeps_first_scan_order(spark):
    # strict > in the reference: equal confidence keeps the earlier
    # (image_id, item_idx) item
    items = [(1, 1, 0, "slip_rating", "R10", 0.8),
             (1, 2, 0, "slip_rating", "R11", 0.8),
             (1, 1, 1, "slip_rating", "R9", 0.7)]
    out = ir.icon_rollup(_items(spark, items),
                         _fields(spark, ["slip_rating"])).collect()
    assert out[0].value == "R10"


def test_higher_confidence_wins(spark):
    items = [(1, 1, 0, "slip_rating", "R10", 0.3),
             (1, 2, 0, "slip_rating", "R11", 0.9)]
    out = ir.icon_rollup(_items(spark, items),
                         _fields(spark, ["slip_rating"])).collect()
    assert out[0].value == "R11" and out[0].confidence == 0.9


def test_empty_value_skipped_but_not_unknown(spark):
    # known field with empty value: neither rolled up nor counted
    items = [(1, 1, 0, "slip_rating", "", 0.9),
             (1, 1, 1, "invented", "x", 0.9)]
    f = _fields(spark, ["slip_rating"])
    assert ir.icon_rollup(_items(spark, items), f).count() == 0
    unk = ir.icon_unknown_counts(_items(spark, items), f).collect()
    assert [(r.field, r.n) for r in unk] == [("invented", 1)]


def test_falsy_field_name_silently_skipped(spark):
    items = [(1, 1, 0, None, "x", 0.9), (1, 1, 1, "", "y", 0.9)]
    f = _fields(spark, ["slip_rating"])
    assert ir.icon_rollup(_items(spark, items), f).count() == 0
    assert ir.icon_unknown_counts(_items(spark, items), f).count() == 0


def test_null_confidence_folds_to_zero(spark):
    items = [(1, 1, 0, "slip_rating", "R10", None),
             (1, 2, 0, "slip_rating", "R11", 0.1)]
    out = ir.icon_rollup(_items(spark, items),
                         _fields(spark, ["slip_rating"])).collect()
    assert out[0].value == "R11"   # 0.1 beats float(None or 0.0)


def _cache(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["document_id", "page1", "text"]))


def test_body_text_joins_raw_in_page_order(spark):
    rows = [(1, 3, " c "), (1, 1, "a"), (1, 2, "   "), (1, 4, "")]
    out = ir.page_body_text(_cache(spark, rows)).collect()[0]
    # whitespace-only page 2 filtered; raw texts joined; global trim
    assert out.body_text == "a\n\n c"


def test_body_text_truncates_with_rstrip(spark):
    rows = [(1, 1, "x" * 3999 + " y")]
    out = ir.page_body_text(_cache(spark, rows)).collect()[0]
    # 4001 chars > 4000: cut lands on the space before 'y' -> rstripped
    assert out.body_text == "x" * 3999
