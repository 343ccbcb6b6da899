"""Pins for cross-product common-field propagation
(operators/propagate), hand-computed against
propagate_common_fields_to_products (stage_4_products.py:1241-1455)
and _is_empty_value (:1583-1597).
"""

from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, MapType, StringType,
                               StructField, StructType)

from mivaa_pdf_extractor_spark.operators import propagate as P

_FSCHEMA = StructType(
    [StructField(f, StringType()) for f in P.FACTORY_FIELDS])
_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("product_id", LongType()),
    StructField("metadata", MapType(StringType(), StringType())),
    StructField("props", MapType(StringType(), StringType())),
    StructField("factory", _FSCHEMA),
    StructField("override", StringType()),
])


def _fac(**kw):
    return tuple(kw.get(f) for f in P.FACTORY_FIELDS)


def _run(spark, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    return {r["product_id"]: r
            for r in P.propagate_common_fields(df).collect()}


def test_first_nonempty_skips_placeholders(spark):
    rows = [
        (1, 1, {"country_of_origin": "N/A"}, {}, None, None),
        (1, 2, {"country_of_origin": "Italy"}, {}, None, None),
        (1, 3, {"country_of_origin": "Spain"}, {}, None, None),
        (1, 4, {"country_of_origin": ""}, {}, None, None),
    ]
    out = _run(spark, rows)
    # first VALID value (product order) propagates into empty slots;
    # non-empty values are never overwritten
    assert out[1]["country_of_origin"] == "Italy"
    assert out[4]["country_of_origin"] == "Italy"
    assert out[3]["country_of_origin"] == "Spain"
    assert out[1]["updated"] is True
    assert out[2]["updated"] is False


def test_override_always_wins_for_material_category(spark):
    rows = [
        (1, 1, {"material_category": "wall_tile"}, {}, None, "quartz"),
        (1, 2, {"material_category": ""}, {}, None, "quartz"),
    ]
    out = _run(spark, rows)
    # override fills EMPTY slots but does not overwrite non-empty ones
    assert out[1]["material_category"] == "wall_tile"
    assert out[2]["material_category"] == "quartz"
    # an empty override ('N/A') is ignored entirely
    rows2 = [(1, 1, {"material_category": ""}, {}, None, "N/A"),
             (1, 2, {"material_category": "stone_slab"}, {}, None,
              "N/A")]
    out2 = _run(spark, rows2)
    assert out2[1]["material_category"] == "stone_slab"


def test_factory_merge_and_mirror(spark):
    best = _fac(factory_name="Harmony", city="Sassuolo",
                country="Italy", email="a@b.c")      # score 4
    poor = _fac(city="Madrid")                        # score 1
    rows = [
        (1, 1, {"factory_name": "OldName"}, {}, best, None),
        (1, 2, {"factory_name": "Keep Me?"}, {}, poor, None),
        (1, 3, {}, {}, None, None),
    ]
    out = _run(spark, rows)
    # product 1 IS the best: untouched (scores equal), keeps OldName...
    # but factory_name also back-propagates as a common field? No —
    # OldName is non-empty so the common fill skips it, and no factory
    # update happens for the best product itself.
    assert out[1]["factory_merged"].startswith("Harmony|Sassuolo|Italy")
    assert out[1]["updated"] is False
    assert out[1]["factory_name"] == "OldName"
    # product 2 merges: existing city wins, gaps fill from best; the
    # merged name mirrors to the top level OVERWRITING 'Keep Me?'
    assert out[2]["factory_merged"].split("|")[:3] == \
        ["Harmony", "Madrid", "Italy"]
    assert out[2]["factory_name"] == "Harmony"
    assert out[2]["updated"] is True
    # product 3 (no factory at all) takes best wholesale; its empty
    # top-level factory_name fills via the mirror
    assert out[3]["factory_merged"].startswith("Harmony|Sassuolo")
    assert out[3]["factory_name"] == "Harmony"


def test_factory_tie_keeps_earlier_product(spark):
    a = _fac(factory_name="A", city="X")   # score 2
    b = _fac(factory_name="B", city="Y")   # score 2 (tie)
    rows = [(1, 1, {}, {}, a, None), (1, 2, {}, {}, b, None),
            (1, 3, {}, {}, None, None)]
    out = _run(spark, rows)
    assert out[3]["factory_merged"].startswith("A|X")


def test_nested_props_fill(spark):
    rows = [
        (1, 1, {}, {"thickness": "not found"}, None, None),
        (1, 2, {}, {"thickness": "9mm"}, None, None),
        (1, 3, {}, {"thickness": None, "body_type": "red body"}, None,
         None),
    ]
    out = _run(spark, rows)
    assert out[1]["thickness"] == "9mm"
    assert out[3]["thickness"] == "9mm"
    assert out[1]["body_type"] == "red body"
    assert out[2]["composition"] is None


def test_no_factory_anywhere_no_propagation(spark):
    rows = [(1, 1, {}, {}, None, None), (1, 2, {}, {}, None, None)]
    out = _run(spark, rows)
    assert out[1]["factory_merged"] == "||||||||"
    assert out[1]["updated"] is False
