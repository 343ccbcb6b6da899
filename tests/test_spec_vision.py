"""Pins for spec-vision page resolution and result shaping
(operators/spec_vision.py) against transcriptions of
product_spec_vision_extractor.py:432-841."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import spec_vision as sv

PROD_SCHEMA = ("product_id long, doc_id long, name string, "
               "page_range array<string>")
PAGE_SCHEMA = ("doc_id long, page_idx int, raw_text string, "
               "cache_text string")


def test_accent_fold_match(spark):
    df = spark.createDataFrame([(1, "piqué"), (2, " Über  ")],
                               "i long, s string")
    out = {r.i: r.n for r in df.select(
        "i", sv.normalize_for_match(F.col("s")).alias("n")).collect()}
    assert out[1] == "PIQUE"
    assert out[2] == "UBER"


def test_resolve_ladder(spark):
    prods = spark.createDataFrame([
        (10, 1, "PIQUÉ", ["2"]),          # text tier wins
        (11, 1, "Hidden", ["2"]),          # cache tier
        (12, 1, "Ghost", ["2", "0", "vii", "3", "2", "99"]),  # numeric
        (13, 1, "", ["3"]),                # empty name -> numeric
        (14, 1, "Nowhere", ["vii"]),       # resolves nowhere
    ], PROD_SCHEMA)
    pages = spark.createDataFrame([
        (1, 0, "intro", ""), (1, 1, "the pique collection", ""),
        (1, 2, "filler", "HIDDEN baked"), (1, 3, "outro", ""),
    ], PAGE_SCHEMA)
    out = {}
    for r in sv.resolve_product_pages(prods, pages).collect():
        out.setdefault(r.product_id, []).append(
            (r.page_rank, r.page_idx, r.source))
    assert sorted(out[10]) == [(1, 1, "text")]
    assert sorted(out[11]) == [(1, 2, "cache")]
    # '2'->1, '0'->-1 dropped, '3'->2, dup '2' deduped, '99' out of
    # range; sorted distinct
    assert sorted(out[12]) == [(1, 1, "numeric"), (2, 2, "numeric")]
    assert sorted(out[13]) == [(1, 2, "numeric")]
    assert 14 not in out


def test_merge_first_nonempty_and_list_union(spark):
    rows = [(1, 0, "finish", "", None), (1, 1, "finish", "Matte", None),
            (1, 2, "finish", "Gloss", None),
            (1, 0, "certifications", None, ["CE", "ISO"]),
            (1, 1, "certifications", None, ["ISO", "LEED", "CE"])]
    df = spark.createDataFrame(
        rows, "product_id long, result_ord int, field string, "
              "value string, list_value array<string>")
    out = {r.field: r for r in sv.select_best_spec(df).collect()}
    assert out["finish"].value == "Matte"   # '' skipped, first real
    assert out["certifications"].merged == ["CE", "ISO", "LEED"]


def test_metadata_gates(spark):
    rows = [(1, "finish", ""),            # truthy gate drops ''
            (1, "thickness_mm", ""),      # is-not-None gate KEEPS ''
            (1, "pei_rating", "0"),       # 0 not in (None,[],'') kept
            (1, "grout_recommendations", "epoxy"),
            (1, "dimensions_cm", "60x60"),
            (1, "unknown_field", "x")]    # not in the registry
    df = spark.createDataFrame(
        rows, "product_id long, field string, value string")
    out = {r.out_field: r for r in
           sv.map_specs_to_metadata(df).collect()}
    assert "finish" not in out
    assert out["thickness_mm"].section == "material_properties"
    assert out["pei_rating"].section == "performance"
    # nesting renames pinned
    assert out["grout_details"].section == "commercial"
    assert out["dimensions_cm_from_vision"].section == ""
    assert "unknown_field" not in out and len(out) == 4
