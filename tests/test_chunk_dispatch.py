"""Pins for the page-level chunking dispatch ladder
(unified_chunking_service.py:103-366)."""

import pandas as pd
import pytest

from mivaa_pdf_extractor_spark.operators import chunk_dispatch as cd


def _pages(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["doc_id", "page0", "text"]))


def _regions(spark, rows):
    if not rows:
        return spark.createDataFrame(
            pd.DataFrame(columns=["doc_id", "page1", "region_idx",
                                  "region_type", "reading_order",
                                  "text_content"]),
            schema="doc_id long, page1 int, region_idx int, "
                   "region_type string, reading_order int, "
                   "text_content string")
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["doc_id", "page1", "region_idx", "region_type",
                       "reading_order", "text_content"]))


def test_unknown_strategy_raises(spark):
    with pytest.raises(ValueError):
        cd.select_strategy("layout")   # not a _select_ strategy
    assert cd.select_strategy("hybrid") == "hybrid"


def test_empty_page_skips_and_consumes_no_index(spark):
    rows = [(1, 0, "a" * 500), (1, 1, "   "), (1, 2, "b" * 100)]
    out = {r.page1: r for r in cd.page_dispatch(
        _pages(spark, rows), _regions(spark, [])).collect()}
    assert out[2].route == "skipped_empty"
    assert out[2].start_index is None
    # page 3 starts right after page 1's 2 chunks (500/400 -> 2)
    assert out[1].n_chunks == 2 and out[3].start_index == 2


def test_textless_regions_warn_and_fall_back(spark):
    pages = [(1, 0, "x" * 50)]
    regs = [(1, 1, 0, "TEXT", 0, ""), (1, 1, 1, "TEXT", 1, "  ")]
    r = cd.page_dispatch(_pages(spark, pages),
                         _regions(spark, regs)).collect()[0]
    assert r.route == "text" and r.warned and r.fallback_stamp


def test_stamp_overapplies_without_regions(spark):
    # doc 2 has regions somewhere -> document gate open; page 1 of
    # doc 1 never offered a region: stamped but NOT warned (pin)
    pages = [(1, 0, "x" * 50)]
    regs = [(2, 1, 0, "TEXT", 0, "content")]
    r = cd.page_dispatch(_pages(spark, pages),
                         _regions(spark, regs)).collect()[0]
    assert r.route == "text" and not r.warned and r.fallback_stamp


def test_layout_route_boundary_counts(spark):
    # reading order: TEXT, TITLE, TABLE, TEXT ->
    # [TEXT] flushed at TITLE, [TITLE] flushed at TABLE,
    # [TABLE] emitted alone, [TEXT] final flush = 4 chunks
    pages = [(1, 0, "x" * 50)]
    regs = [(1, 1, 0, "TEXT", 0, "a"), (1, 1, 1, "TITLE", 1, "b"),
            (1, 1, 2, "TABLE", 2, "c"), (1, 1, 3, "TEXT", 3, "d")]
    r = cd.page_dispatch(_pages(spark, pages),
                         _regions(spark, regs)).collect()[0]
    assert r.route == "layout" and r.n_chunks == 4


def test_null_reading_order_sorts_last(spark):
    # NULL ro -> 999: the TITLE with NULL ro lands AFTER the TEXTs,
    # so it opens the second chunk rather than leading the first
    pages = [(1, 0, "x" * 50)]
    regs = [(1, 1, 0, "TITLE", None, "t"), (1, 1, 1, "TEXT", 0, "a"),
            (1, 1, 2, "TEXT", 1, "b")]
    r = cd.page_dispatch(_pages(spark, pages),
                         _regions(spark, regs)).collect()[0]
    assert r.n_chunks == 2


def test_region_lookup_is_one_based(spark):
    # regions keyed at page1=1 attach to page0=0, not page0=1
    pages = [(1, 0, "x" * 50), (1, 1, "y" * 50)]
    regs = [(1, 1, 0, "TEXT", 0, "content")]
    out = {r.page1: r for r in cd.page_dispatch(
        _pages(spark, pages), _regions(spark, regs)).collect()}
    assert out[1].route == "layout" and out[2].route == "text"
