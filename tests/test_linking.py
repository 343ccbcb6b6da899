"""Entity-linking relevance semantics (reference:
entity_linking_service.py:259-651), pinned against direct Python mirrors
of the reference formulas."""

import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators import linking as L


def _mirror_chunk_rel(page, content, page_range, name):
    score = 0.0
    if page_range:
        if page in page_range:
            score += 0.5
        else:
            d = min(abs(page - p) for p in page_range)
            if d == 1:
                score += 0.25
            elif d == 2:
                score += 0.1
    if name is not None:
        name_only = name.split(" by ")[0].strip()
        if name in content or name_only in content:
            score += 0.5
    return min(1.0, max(0.0, score))


def _mirror_image_rel(page, page_range, conf):
    s = 0.0
    if page_range and page in page_range:
        s = 0.4
    elif page_range:
        d = min(abs(page - p) for p in page_range)
        if d == 1:
            s = 0.2
        elif d == 2:
            s = 0.1
    total = s + conf * 0.4 + conf * 0.2
    return min(1.0, max(0.0, total))


def test_original_page_mapping(spark):
    rows = [
        Row(chunk_id=1, page_number=2, product_pages=[24, 25, 26]),
        Row(chunk_id=2, page_number=5, product_pages=[24, 25, 26]),  # short
        Row(chunk_id=3, page_number=1, product_pages=[]),            # empty
        Row(chunk_id=4, page_number=3, product_pages=None),          # null
    ]
    df = spark.createDataFrame(
        rows, "chunk_id int, page_number int, product_pages array<int>")
    got = {r["chunk_id"]: r["original_page"]
           for r in L.with_original_page(df).collect()}
    assert got == {1: 25, 2: 5, 3: 1, 4: 3}


def test_chunk_product_relevance_and_threshold(spark):
    chunks = spark.createDataFrame(
        [Row(doc_id=1, chunk_id=10, original_page=5,
             content="all about maison seating"),
         Row(doc_id=1, chunk_id=11, original_page=7,
             content="unrelated prose"),
         Row(doc_id=1, chunk_id=12, original_page=9,
             content="maison by onset appears verbatim")],
        "doc_id int, chunk_id int, original_page int, content string")
    products = spark.createDataFrame(
        [Row(doc_id=1, product_id=100, name="maison by onset",
             page_range=[5, 6]),
         Row(doc_id=1, product_id=101, name="quartz", page_range=[9])],
        "doc_id int, product_id int, name string, page_range array<int>")
    out = {(r["chunk_id"], r["product_id"]): r["relevance_score"]
           for r in L.link_chunks_to_products(chunks, products).collect()}

    cases = {
        (10, 100): (5, "all about maison seating", [5, 6], "maison by onset"),
        (10, 101): (5, "all about maison seating", [9], "quartz"),
        (11, 100): (7, "unrelated prose", [5, 6], "maison by onset"),
        (11, 101): (7, "unrelated prose", [9], "quartz"),
        (12, 100): (9, "maison by onset appears verbatim", [5, 6],
                    "maison by onset"),
        (12, 101): (9, "maison by onset appears verbatim", [9], "quartz"),
    }
    for key, args in cases.items():
        exp = _mirror_chunk_rel(*args)
        if exp >= 0.3:
            assert out[key] == pytest.approx(exp, abs=1e-12), key
        else:
            assert key not in out, key
    # chunk 10 x product 100: on-page (0.5) + " by "-stripped mention
    # ("maison") -> 1.0 capped
    assert out[(10, 100)] == 1.0
    # chunk 11: two pages from [5,6] -> 0.1 + no mention -> filtered
    assert (11, 100) not in out
    # every surviving row carries the reference's relationship type
    rows = L.link_chunks_to_products(chunks, products).collect()
    assert {r["relationship_type"] for r in rows} == {"source"}


def test_image_product_relevance_paths(spark):
    images = spark.createDataFrame(
        [Row(doc_id=1, image_id=1, page_number=5,
             extraction_layer="embedded", detection_confidence=0.8,
             vision_confidence=None),
         Row(doc_id=1, image_id=2, page_number=7,
             extraction_layer="embedded", detection_confidence=0.5,
             vision_confidence=None),
         Row(doc_id=1, image_id=3, page_number=2,
             extraction_layer="vision_guided", detection_confidence=0.8,
             vision_confidence=0.99),
         Row(doc_id=1, image_id=4, page_number=2,
             extraction_layer="vision_guided", detection_confidence=0.8,
             vision_confidence=0.0)],
        "doc_id int, image_id int, page_number int, extraction_layer "
        "string, detection_confidence double, vision_confidence double")
    products = spark.createDataFrame(
        [Row(doc_id=1, product_id=100, name="x", page_range=[5, 6])],
        "doc_id int, product_id int, name string, page_range array<int>")
    out = {r["image_id"]: r["relevance_score"]
           for r in L.link_images_to_products(images, products).collect()}
    assert out[1] == pytest.approx(_mirror_image_rel(5, [5, 6], 0.8),
                                   abs=1e-12)
    assert out[2] == pytest.approx(_mirror_image_rel(7, [5, 6], 0.5),
                                   abs=1e-12)
    # vision-guided: min(0.95, vc); zero/missing confidence -> 0.95 flat
    assert out[3] == 0.95
    assert out[4] == 0.95
    # no threshold: all four pairs present
    assert len(out) == 4
