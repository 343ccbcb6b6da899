"""Pins for the facet-admin views (facet_routes.py:154-280) and the
document-entities route/service folds (document_entities.py,
document_entity_service.py:501-596)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import doc_entities as de
from mivaa_pdf_extractor_spark.operators import facet_admin as fa


def _canon(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["facet_key", "canonical_value", "aliases",
                       "alias_count", "embedding_model", "is_locked"]))


def test_canonicals_coalesce_defaults(spark):
    rows = [("color", "red", None, None, None, None)]
    out = fa.canonicals_view(_canon(spark, rows)).collect()[0]
    assert out.aliases == []           # None -> [] (route list() fold)
    assert out.alias_count == 0        # int(None or 0)
    assert out.is_locked is False      # bool(None)
    assert out.embedding_model is None  # Optional passes through


def test_canonicals_order_and_limit(spark):
    rows = [("color", f"c{i}", [], i, None, False) for i in range(5)]
    out = fa.canonicals_view(_canon(spark, rows), limit=2).collect()
    assert [r.alias_count for r in out] == [4, 3]  # desc top-limit


def test_lock_request_404_vs_echo(spark):
    canon = _canon(spark, [("color", "red", [], 1, None, False)])
    reqs = spark.createDataFrame(pd.DataFrame(
        [(1, "color", "red", True), (2, "color", "blue", True)],
        columns=["req_id", "facet_key", "canonical_value",
                 "want_locked"]))
    out = {r.req_id: r for r in fa.lock_outcomes(reqs, canon).collect()}
    assert out[1].status == "ok"
    assert out[1].is_locked == "true"   # echoes the REQUEST, no read-back
    assert out[2].status == "not_found"  # zero matched rows -> 404
    assert out[2].is_locked is None


def _ents(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["entity_id", "workspace_id", "entity_type",
                       "name", "description", "factory_name",
                       "factory_group", "manufacturer", "page_range"]))


def test_admin_range_inclusive_both_ends(spark):
    rows = [(i, 1, "logo", f"e{i}", None, None, None, None, [i])
            for i in range(10)]
    out = de.entities_admin_query(_ents(spark, rows), workspace_id=1,
                                  limit=4, offset=2).collect()
    # .range(2, 2+4-1) = rows ranked 3..6 inclusive -> exactly limit
    assert [r.entity_id for r in out] == [2, 3, 4, 5]


def test_for_product_phantom_on_filtered_type(spark):
    ents = _ents(spark, [(7, 1, "logo", "L", None, "F", None, None,
                          [1, 2])])
    rels = spark.createDataFrame(pd.DataFrame(
        [(100, 5, 7)], columns=["rel_id", "product_id", "entity_id"]))
    out = de.entities_for_product(
        rels, ents, entity_type="certificate").collect()
    # the embedded filter NULLS the embed but keeps the parent row
    assert len(out) == 1
    r = out[0]
    assert r.name is None and r.entity_type is None
    assert r.page_range == []          # .get("page_range", [])


def test_for_product_dangling_entity_phantom(spark):
    ents = _ents(spark, [(7, 1, "logo", "L", None, None, None, None,
                          [1])])
    rels = spark.createDataFrame(pd.DataFrame(
        [(100, 5, 999)], columns=["rel_id", "product_id",
                                  "entity_id"]))
    out = de.entities_for_product(rels, ents).collect()
    assert len(out) == 1 and out[0].name is None
