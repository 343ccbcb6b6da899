"""Pins for the vision-analysis rollup (operators/vision), hand-computed
against _rollup_vision_analysis / _most_common_pretty / _dedupe_pretty /
_normalize_material_category (reference stage_4_products.py:1937-2154).
"""

from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                               StringType, StructField, StructType)

from mivaa_pdf_extractor_spark.operators import vision

_VA_FIELDS = [
    ("material_type", StringType()), ("category", StringType()),
    ("subcategory", StringType()), ("material_subtype", StringType()),
    ("finish", StringType()), ("surface_pattern", StringType()),
    ("pattern", StringType()),
    ("textures", ArrayType(StringType())), ("texture", StringType()),
    ("style", StringType()), ("design_style", StringType()),
    ("colors", ArrayType(StringType())),
    ("color_palette", ArrayType(StringType())),
    ("applications", ArrayType(StringType())),
    ("description", StringType()),
    ("detected_text", ArrayType(StringType())),
    ("confidence", DoubleType()),
]
_SCHEMA = StructType([
    StructField("product_id", LongType()),
    StructField("image_id", LongType()),
    StructField("va", StructType(
        [StructField(n, t) for n, t in _VA_FIELDS])),
])


def _va(**kw):
    return tuple(kw.get(n) for n, _ in _VA_FIELDS)


def _roll(spark, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    return {r["product_id"]: r
            for r in vision.rollup_vision(df).collect()}


def test_pretty_case_fold_vote(spark):
    # 2x 'matte'-fold (Matte, matte) beats 1x 'glossy'; within the fold
    # the most common original wins; here a 1-1 tie keeps the first
    rows = [
        (1, 1, _va(finish="Matte", confidence=0.5)),
        (1, 2, _va(finish="matte", confidence=0.875)),
        (1, 3, _va(finish="Glossy")),
    ]
    out = _roll(spark, rows)
    assert out[1]["finish"] == "Matte"
    # mean of (0.5, 0.875) = 0.6875 -> 687500 micro
    assert out[1]["vision_confidence_micro"] == 687500


def test_material_category_partial_match_order(spark):
    # 'stoneware' precedes 'stoneware tile' in the map: the first
    # CONTAINED phrase wins -> floor_tile
    rows = [(1, 1, _va(material_type="glazed stoneware tile")),
            (2, 2, _va(material_type="porcelain tile")),   # exact
            (3, 3, _va(material_type="unobtainium"))]      # no match
    out = _roll(spark, rows)
    assert out[1]["material_category"] == "floor_tile"
    assert out[2]["material_category"] == "porcelain_tile"
    assert out[3]["material_category"] is None


def test_legacy_fallbacks(spark):
    rows = [
        # empty subcategory falls back to material_subtype
        (1, 1, _va(subcategory="", material_subtype="Legacy")),
        # whitespace-only subcategory BLOCKS the fallback (truthy) and
        # then fails the strip gate -> nothing appended
        (2, 2, _va(subcategory=" ", material_subtype="Legacy")),
        # empty colors LIST falls back to color_palette
        (3, 3, _va(colors=[], color_palette=["Blue"])),
        (4, 4, _va(colors=["Red"], color_palette=["Blue"])),
    ]
    out = _roll(spark, rows)
    assert out[1]["material_subtype"] == "Legacy"
    assert out[2]["material_subtype"] is None
    assert out[3]["appearance_colors"] == ["Blue"]
    assert out[4]["appearance_colors"] == ["Red"]


def test_dedupe_pretty_order_and_cap(spark):
    # folds ordered by (count desc, first insertion), first original
    # case as representative, cap applied
    rows = [(1, 1, _va(detected_text=["R9", "r9", "V2", "a", "b"])),
            (1, 2, _va(detected_text=["v2", "V2"]))]
    out = _roll(spark, rows)
    # counts: r9-fold 2 (first pos 1), v2-fold 3 (first pos 3), a 1, b 1
    assert out[1]["detected_text"] == ["V2", "R9", "a", "b"]


def test_textures_list_then_legacy_scalar(spark):
    rows = [(1, 1, _va(textures=["Smooth", " ribbed "],
                       texture="Honed"))]
    out = _roll(spark, rows)
    assert out[1]["textures"] == ["Smooth", "ribbed", "Honed"]
    assert out[1]["texture"] == "Smooth"


def test_longest_description_first_on_ties(spark):
    rows = [(1, 1, _va(description="aaaa")),
            (1, 2, _va(description="bbbb")),
            (1, 3, _va(description="cc"))]
    out = _roll(spark, rows)
    assert out[1]["vision_description"] == "aaaa"


def test_null_va_rows_skipped_and_conf_gate(spark):
    rows = [(1, 1, None),
            (1, 2, _va(confidence=1.5)),     # out of [0,1] -> ignored
            (1, 3, _va(confidence=0.25))]
    out = _roll(spark, rows)
    assert out[1]["vision_confidence_micro"] == 250000


def test_image_id_order_pins_insertion(spark):
    # arrival order is canonicalized to image_id order: the tie between
    # 'X' and 'Y' (1 each) goes to the LOWER image_id's value
    rows = [(1, 9, _va(category="Y")),
            (1, 2, _va(category="X"))]
    out = _roll(spark, rows)
    assert out[1]["category"] == "X"
