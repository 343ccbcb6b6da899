"""Pins for the stage-0 discovery routing tier (operators/discovery.py).

Hand-computed expectations against the reference semantics in
product_discovery_service.py:1222-1340 (validation + parse),
:2266-2332 (start-page ranges), :2333-2402 (folio consensus shift).
"""

import pytest
from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import discovery


def _items(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id int, item_id int, kind string, name string, "
        "page_range array<int>, start_page int, total_pages int, "
        "confidence double, designer string, studio string, "
        "category string, available_colors array<string>, "
        "page_types map<string,string>, has_meta boolean")


def test_validation_gates(spark):
    rows = [
        (1, 1, "products", None, None, None, 20, None, None, None,
         None, None, None, False),
        (1, 2, "products", "   ", None, None, 20, None, None, None,
         None, None, None, False),
        (1, 3, "certificates", "CE", [1, 21], None, 20, None, None,
         None, None, None, None, False),
        (1, 4, "products", "Alta", [0], None, 20, None, None, None,
         None, None, None, False),
        # no page_range AND no start_page: products are KEPT (vision
        # fills later)
        (1, 5, "products", "Vela", None, None, 20, None, None, None,
         None, None, None, False),
    ]
    out = {r["item_id"]: r for r in
           discovery.validate_and_parse(_items(spark, rows)).collect()}
    assert not out[1]["kept"] and out[1]["reason"] == "missing or empty 'name'"
    assert not out[2]["kept"] and out[2]["reason"] == "missing or empty 'name'"
    assert not out[3]["kept"]
    assert out[3]["reason"] == "page_range out of bounds (1..20): [21]"
    assert not out[4]["kept"]
    assert out[4]["reason"] == "page_range out of bounds (1..20): [0]"
    assert out[5]["kept"] and out[5]["reason"] is None


def test_parse_metadata_fold(spark):
    rows = [
        # built-from-fields: Nones dropped, confidence defaulted
        (1, 1, "products", "Alta", None, None, 20, None, "D", None,
         None, None, None, False),
        # has_meta: no field fold, colors still appended
        (1, 2, "products", "Vela", None, None, 20, 0.5, "D", "S",
         "tile", ["white"], None, True),
        # start_page 0 is FALSY: no _start_page (pinned)
        (1, 3, "products", "Luna", None, 0, 20, None, None, None,
         None, None, None, True),
        (1, 4, "products", "Sole", None, 7, 20, None, None, None,
         None, None, None, True),
        # page_types: non-int keys dropped, render sorted by int key
        (1, 5, "products", "Mare", None, None, 20, None, None, None,
         None, None, {"10": "specs", "x": "cover", "2": "product"},
         True),
        # empty colors list: NOT appended
        (1, 6, "products", "Rena", None, None, 20, None, None, None,
         None, [], None, True),
    ]
    out = {r["item_id"]: r for r in
           discovery.validate_and_parse(_items(spark, rows)).collect()}
    assert out[1]["meta_render"] == "designer=D;confidence=0.80"
    assert out[2]["meta_render"] == "available_colors=white"
    assert out[2]["confidence_out"] == 0.5
    assert out[3]["meta_render"] is None
    assert out[4]["meta_render"] == "_start_page=7"
    assert out[5]["page_types_render"] == "2:product,10:specs"
    assert out[6]["meta_render"] is None


def test_catalog_factory_aliases(spark):
    df = spark.createDataFrame(
        [(1, None, "Mfg", None, "Sup", None, "Grp"),
         (2, "Fab", "Mfg", "Brd", None, "FG", None)],
        "doc_id int, catalog_factory string, "
        "catalog_manufacturer string, catalog_brand string, "
        "catalog_supplier string, catalog_factory_group string, "
        "catalog_group string")
    out = {r["doc_id"]: r for r in
           discovery.catalog_factory_fold(df).collect()}
    assert out[1]["factory_out"] == "Mfg"
    assert out[1]["factory_group_out"] == "Grp"
    assert out[2]["factory_out"] == "Fab"
    assert out[2]["factory_group_out"] == "FG"


def _range_products(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id int, product_idx int, start_page int, "
              "total_pages int")


def test_page_ranges_conservative(spark):
    rows = [
        (1, 0, 5, 40), (1, 1, 12, 40), (1, 2, 30, 40),
        (1, 3, None, 40), (1, 4, 0, 40),
    ]
    out = {r["product_idx"]: r for r in
           discovery.calculate_page_ranges(
               _range_products(spark, rows)).collect()}
    assert (out[0]["page_start"], out[0]["page_end"]) == (5, 11)
    assert (out[1]["page_start"], out[1]["page_end"]) == (12, 29)
    # last product extends min(start+10, total)
    assert (out[2]["page_start"], out[2]["page_end"]) == (30, 40)
    # no truthy start_page: untouched
    assert out[3]["page_start"] is None
    assert out[4]["page_start"] is None


def test_page_ranges_tie_and_clamp(spark):
    # ties: next start == own start -> end = max(start-1, start) = start
    rows = [(1, 0, 8, 30), (1, 1, 8, 30), (1, 2, 28, 30)]
    out = {r["product_idx"]: r for r in
           discovery.calculate_page_ranges(
               _range_products(spark, rows)).collect()}
    assert (out[0]["page_start"], out[0]["page_end"]) == (8, 8)
    assert (out[1]["page_start"], out[1]["page_end"]) == (8, 27)
    # last: min(28+10, 30) = 30
    assert (out[2]["page_start"], out[2]["page_end"]) == (28, 30)


def _folio(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id int, product_idx int, folio_start int, "
              "physical_headline int, page_range array<int>, "
              "total_pages int")


def test_folio_majority_shift_and_clip(spark):
    rows = [
        (1, 0, 5, 8, [5, 6], 10),     # off +3
        (1, 1, 6, 9, [6, 7], 10),     # off +3
        (1, 2, 7, 9, [7, 8, 9], 10),  # off +2 (dissenter)
        (1, 3, None, 4, [1, 2], 10),  # unanchored (no folio)
        (1, 4, 8, None, [8, 9], 10),  # unanchored (no detection)
    ]
    out = {r["product_idx"]: r for r in
           discovery.reconcile_folio_offsets(_folio(spark, rows))
           .collect()}
    # n=3 anchored, majority needs max(2, 3//2+1)=2; +3 has count 2
    assert all(out[i]["applied_offset"] == 3 for i in range(5))
    assert out[0]["pages_csv"] == "8,9"
    # clipping: 9+3=12 > total 10 -> dropped
    assert out[2]["pages_csv"] == "10"
    assert out[3]["pages_csv"] == "4,5"  # unanchored still shifted


def test_folio_gates(spark):
    # consensus offset 0 -> never shifts
    rows0 = [(1, 0, 5, 5, [5], 10), (1, 1, 6, 6, [6], 10)]
    out = {r["product_idx"]: r for r in
           discovery.reconcile_folio_offsets(_folio(spark, rows0))
           .collect()}
    assert out[0]["applied_offset"] == 0 and out[0]["pages_csv"] == "5"

    # single anchor: count 1 < max(2, 1) = 2 -> no shift
    rows1 = [(1, 0, 5, 9, [5], 10), (1, 1, None, None, [6], 10)]
    out = {r["product_idx"]: r for r in
           discovery.reconcile_folio_offsets(_folio(spark, rows1))
           .collect()}
    assert out[0]["applied_offset"] == 0

    # 2-2 split: most_common tie broken by FIRST INSERTION (product
    # order) -> +1 wins over +3; but count 2 < max(2, 4//2+1)=3 -> 0
    rows2 = [(1, 0, 5, 6, [5], 12), (1, 1, 5, 8, [5], 12),
             (1, 2, 6, 7, [6], 12), (1, 3, 6, 9, [6], 12)]
    out = {r["product_idx"]: r for r in
           discovery.reconcile_folio_offsets(_folio(spark, rows2))
           .collect()}
    assert out[0]["applied_offset"] == 0

    # 3-2: majority max(2, 5//2+1)=3 met -> shift by modal
    rows3 = [(1, i, 5, 7, [5], 12) for i in range(3)] + \
            [(1, 3, 5, 9, [5], 12), (1, 4, 5, 9, [5], 12)]
    out = {r["product_idx"]: r for r in
           discovery.reconcile_folio_offsets(_folio(spark, rows3))
           .collect()}
    assert out[0]["applied_offset"] == 2
    assert out[0]["pages_csv"] == "7"


def test_folio_empty_range_stays_empty(spark):
    rows = [(1, 0, 5, 8, [], 10), (1, 1, 5, 8, [5], 10)]
    out = {r["product_idx"]: r for r in
           discovery.reconcile_folio_offsets(_folio(spark, rows))
           .collect()}
    assert out[0]["applied_offset"] == 3
    assert out[0]["pages_csv"] == ""
