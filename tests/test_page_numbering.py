"""Pins for the spread-aware page-number overlay plan
(operators/page_numbering.py vs pdf_page_numbering_service.py).

- spreads get TWO page numbers: left at (margin_x, h-margin_y), right
  at (w-margin_x-50, h-margin_y) (:320-333);
- singles get ONE at the configured position; unknown position falls
  back to bottom_right (:424-456);
- product labels: y=20, fontsize 8; x = margin_x (left half),
  w/2+margin_x (right half), 10 (single) (:346-356, :392-401);
- stats count sheets vs physical pages and flag spread layouts.
"""

import pytest
from pyspark.sql import Row, functions as F

from mivaa_pdf_extractor_spark.operators.layout import (
    analyze_sheet_layout)
from mivaa_pdf_extractor_spark.operators.page_numbering import (
    page_number_overlays, page_numbering_stats)


@pytest.fixture(scope="module")
def sheets(spark):
    # doc 1: spread (1200x600) then single (600x800); doc 2: single only
    src = spark.createDataFrame(
        [Row(doc_id=1, sheet_idx=0, width=1200.0, height=600.0),
         Row(doc_id=1, sheet_idx=1, width=600.0, height=800.0),
         Row(doc_id=2, sheet_idx=0, width=600.0, height=800.0)],
        "doc_id long, sheet_idx long, width double, height double")
    return analyze_sheet_layout(src)


def _by_key(rows):
    return {(r["doc_id"], r["physical_page"], r["kind"]): r.asDict()
            for r in rows}


def test_spread_two_numbers_and_single_positions(sheets, spark):
    out = _by_key(page_number_overlays(sheets).collect())
    left = out[(1, 1, "page_number")]
    assert (left["side"], left["text"]) == ("left", "Page 1")
    assert (left["x"], left["y"]) == (30.0, 580.0)
    right = out[(1, 2, "page_number")]
    assert (right["side"], right["text"]) == ("right", "Page 2")
    assert (right["x"], right["y"]) == (1200.0 - 80.0, 580.0)
    single = out[(1, 3, "page_number")]
    # bottom_right default: w - margin_x - 30
    assert (single["side"], single["x"], single["y"]) == (
        "full", 600.0 - 60.0, 780.0)
    assert single["font_size"] == 10
    assert len(out) == 4  # no labels without product_pages


@pytest.mark.parametrize("pos,x,y", [
    ("bottom_left", 30.0, 780.0),
    ("bottom_center", 285.0, 780.0),
    ("top_right", 540.0, 30.0),
    ("top_left", 30.0, 30.0),
    ("top_center", 285.0, 30.0),
    ("diagonal_nonsense", 540.0, 780.0),  # falls back to bottom_right
])
def test_single_position_ladder(sheets, pos, x, y):
    out = _by_key(page_number_overlays(
        sheets, config={"position": pos}).collect())
    single = out[(2, 1, "page_number")]
    assert (single["x"], single["y"]) == (x, y)
    # spread halves ignore the single-position config
    assert out[(1, 1, "page_number")]["x"] == 30.0


def test_product_labels(sheets, spark):
    pp = spark.createDataFrame(
        [Row(doc_id=1, physical_page=2, product_name="tile"),
         Row(doc_id=1, physical_page=3, product_name="slab")],
        "doc_id long, physical_page int, product_name string")
    out = _by_key(page_number_overlays(sheets, product_pages=pp)
                  .collect())
    lab_r = out[(1, 2, "product_label")]
    assert lab_r["text"] == "[tile]"
    assert (lab_r["x"], lab_r["y"], lab_r["font_size"]) == (
        1200.0 / 2 + 30.0, 20.0, 8)
    lab_s = out[(1, 3, "product_label")]
    assert (lab_s["text"], lab_s["x"], lab_s["y"]) == (
        "[slab]", 10.0, 20.0)
    assert len(out) == 6  # 4 numbers + 2 labels


def test_stats(sheets):
    stats = {r["doc_id"]: r.asDict()
             for r in page_numbering_stats(sheets).collect()}
    assert stats[1] == {"doc_id": 1, "total_pdf_pages": 2,
                        "total_physical_pages": 3, "pages_numbered": 2,
                        "physical_pages_numbered": 3,
                        "has_spread_layout": True}
    assert stats[2]["has_spread_layout"] is False
    assert stats[2]["total_physical_pages"] == 1
