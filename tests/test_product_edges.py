"""Pins for product relationship edges
(operators/product_edges.py vs product_relationship_service.py)."""

import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators.product_edges import (
    assemble_edge_text, llm_edges_postprocess, merge_related,
    rebuild_rule_edges, resolve_references)

_ID = ("workspace_id string, product_id string, external_sku string, "
       "meta_sku string, name string")
_REF = ("workspace_id string, src_product_id string, ref_pos int, "
        "referenced_identifier string, relationship string, "
        "evidence string, confidence double")


@pytest.fixture(scope="module")
def identity(spark):
    return spark.createDataFrame(
        [Row(workspace_id="w", product_id="p1", external_sku="SK-1",
             meta_sku="M1", name="Avant 60"),
         Row(workspace_id="w", product_id="p2", external_sku=None,
             meta_sku="DUP", name="Skirting 7x60"),
         Row(workspace_id="w", product_id="p3", external_sku=None,
             meta_sku="DUP", name="Other"),
         Row(workspace_id="w2", product_id="p9", external_sku="SK-1",
             meta_sku="M9", name="Elsewhere")],
        _ID)


def _ref(src, pos, ident, rel="pairs_with", ev="stated in text",
         conf=0.9, ws="w"):
    return Row(workspace_id=ws, src_product_id=src, ref_pos=pos,
               referenced_identifier=ident, relationship=rel,
               evidence=ev, confidence=conf)


def test_resolution_ladder(spark, identity):
    refs = spark.createDataFrame(
        [
            _ref("p0", 0, " sk-1 "),       # sku tier, case+pad
            _ref("p0", 1, "DUP"),          # ambiguous meta tier: abort
            _ref("p0", 2, "skirting 7X60"),  # name tier
            _ref("p0", 3, "x"),            # <2 chars
            _ref("p1", 0, "SK-1"),         # self via sku -> excluded
        ],
        _REF)
    got = {(r["src_product_id"], r["ref_pos"]): r["dst_product_id"]
           for r in resolve_references(refs, identity).collect()}
    assert got[("p0", 0)] == "p1"
    assert got[("p0", 1)] is None          # 2 matches: don't guess
    assert got[("p0", 2)] == "p2"
    assert got[("p0", 3)] is None
    assert got[("p1", 0)] is None          # only match is itself


def test_llm_postprocess_gates_and_dedup(spark, identity):
    refs = spark.createDataFrame(
        [
            _ref("p0", 0, "SK-1", rel="pairs_with", conf=0.6),
            _ref("p0", 1, "Avant 60", rel="replaces"),   # same dst ->
            _ref("p0", 2, "Skirting 7x60", rel="nonsense"),
            _ref("p0", 3, "Skirting 7x60", rel="requires", conf=0.59),
            _ref("p0", 4, "Skirting 7x60", rel="completes", ev="  "),
            _ref("p0", 5, "Skirting 7x60", rel="equivalent_alternative",
                 ev="e" * 600),
        ],
        _REF)
    out = {(r["src_product_id"], r["dst_product_id"],
            r["edge_type"]): r.asDict()
           for r in llm_edges_postprocess(refs, identity).collect()}
    # first ref per dst wins: pos0 (0.6 passes the >= gate)
    assert out[("p0", "p1", "complementary")]["weight"] == 0.88
    assert ("p0", "p1", "alternative") not in out
    # nonsense rel, conf<0.6, blank evidence all dropped; pos5 lands
    e = out[("p0", "p2", "alternative")]
    assert e["weight"] == 0.83
    assert len(e["reason"]) == 500          # evidence[:500]
    assert len(out) == 2


def test_rule_edges_shapes(spark):
    products = spark.createDataFrame(
        [Row(workspace_id="w", product_id="a", material_type="wood",
             finish="matte", colors=["red", "blue"], collection=None,
             slip_rating="r9", fire_rating="a1", dimensions="60x60",
             category="tile"),
         Row(workspace_id="w", product_id="b", material_type="wood",
             finish="matte", colors=["blue"], collection=None,
             slip_rating="r9", fire_rating="a1", dimensions="60x60",
             category="grout"),
         Row(workspace_id="w2", product_id="c", material_type="wood",
             finish="matte", colors=["blue"], collection=None,
             slip_rating="r9", fire_rating="a1", dimensions="60x60",
             category="grout")],
        "workspace_id string, product_id string, material_type string,"
        " finish string, colors array<string>, collection string, "
        "slip_rating string, fire_rating string, dimensions string, "
        "category string")
    pairs = spark.createDataFrame([("tile", "grout")],
                                  "category_a string, "
                                  "category_b string")
    edges = rebuild_rule_edges(products, pairs).collect()
    by_type = {}
    for r in edges:
        by_type.setdefault(r["edge_type"], set()).add(
            (r["src_product_id"], r["dst_product_id"]))
    # cross-workspace never joins; NULL collection never matches
    assert by_type["material_family"] == {("a", "b"), ("b", "a")}
    assert by_type["pattern_match"] == {("a", "b"), ("b", "a")}
    assert "collection" not in by_type
    assert by_type["alternative"] == {("a", "b"), ("b", "a")}
    # category map is directional: only tile -> grout supplied
    assert by_type["complementary"] == {("a", "b")}


def test_edge_text_gate(spark):
    products = spark.createDataFrame(
        [Row(workspace_id="w", product_id="p1",
             description="short"),
         Row(workspace_id="w", product_id="p2",
             description="A long enough description of the product.")],
        "workspace_id string, product_id string, description string")
    chunks = spark.createDataFrame(
        [Row(workspace_id="w", product_id="p1", chunk_index=2,
             content=" tail chunk "),
         Row(workspace_id="w", product_id="p1", chunk_index=1,
             content="   "),
         Row(workspace_id="w", product_id="p2", chunk_index=1,
             content="more text")],
        "workspace_id string, product_id string, chunk_index int, "
        "content string")
    out = {r["product_id"]: r["text"]
           for r in assemble_edge_text(products, chunks).collect()}
    # p1: 'short' + 'tail chunk' = 17 chars -> gated out
    assert "p1" not in out
    assert out["p2"] == ("A long enough description of the product."
                         "\n\nmore text")


def test_merge_related(spark):
    cands = spark.createDataFrame(
        [Row(query_id="q", product_id="a", relevance_score=0.7, pos=0),
         Row(query_id="q", product_id="a", relevance_score=0.9, pos=1),
         Row(query_id="q", product_id="b", relevance_score=0.9, pos=2),
         Row(query_id="q", product_id="c", relevance_score=0.5, pos=3)],
        "query_id string, product_id string, relevance_score double, "
        "pos int")
    got = [(r["product_id"], r["rank"])
           for r in merge_related(cands, limit=2)
           .orderBy("rank").collect()]
    # a dedups to 0.9 (pos 1); tie with b broken by pos; c cut by limit
    assert got == [("a", 1), ("b", 2)]
