"""Pins for embedding text / default unit / factory object
(operators/product_text), hand-computed against
stage_4_products.py:93-170 and :908-998."""

from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BooleanType, LongType,
                               MapType, StringType, StructField,
                               StructType)

from mivaa_pdf_extractor_spark.operators import product_text as PT

_SCHEMA = StructType([
    StructField("product_id", LongType()),
    StructField("name", StringType()),
    StructField("description", StringType()),
    StructField("meta", MapType(StringType(), StringType())),
    StructField("colors3", ArrayType(StringType())),
    StructField("spec_strs", MapType(StringType(), StringType())),
    StructField("spec_flags", MapType(StringType(), BooleanType())),
    StructField("spec_lists",
                MapType(StringType(), ArrayType(StringType()))),
    StructField("page_body", StringType()),
])


def _text(spark, **kw):
    row = (1, kw.get("name"), kw.get("description"),
           kw.get("meta", {}), kw.get("colors3", []),
           kw.get("spec_strs", {}), kw.get("spec_flags", {}),
           kw.get("spec_lists", {}), kw.get("page_body"))
    df = spark.createDataFrame([row], _SCHEMA)
    out = df.select(PT.embedding_text_col(
        F.col("name"), F.col("description"), F.col("meta"),
        F.col("colors3"), F.col("spec_strs"), F.col("spec_flags"),
        F.col("spec_lists"), F.col("page_body")).alias("t"))
    return out.collect()[0]["t"]


def test_embedding_text_full_assembly(spark):
    t = _text(
        spark, name="Valenova", description="a glazed collection",
        meta={"factory_name": "Harmony",
              "factory_group_name": "not specified",
              "material_category": "porcelain_tile"},
        colors3=["Beige", "grey", "BEIGE", "Grey "],
        spec_strs={"pei_rating": "PEI IV", "r_rating": "unknown"},
        spec_flags={"frost_resistant": True, "rectified": False},
        spec_lists={"finish_options": ["Matte", "", "Glossy"]},
        page_body="  body text  ")
    assert t == ("Valenova | a glazed collection | Harmony | "
                 "porcelain tile | Beige | grey | "
                 "pei rating: PEI IV | frost resistant | "
                 "finish options: Matte, Glossy | body text")


def test_embedding_text_minimal(spark):
    # missing name still anchors an empty first part (name or '')
    assert _text(spark) == ""
    assert _text(spark, name=None, description="d") == " | d"


def test_default_unit_tiers(spark):
    cases = {
        "porcelain_tile": "sqm",    # fine exact
        "Mosaics ": "sqm",          # admin overlay (lower+strip)
        "outdoor": "pallet",        # admin overlay
        "tiles": "sqm",             # coarse exact
        "paint_wall": "sqm",        # cat-in-key fuzzy
        "xyz_tiles_abc": "sqm",     # key-in-cat fuzzy
        "gadgetry": "pcs",          # fallback
        "": "pcs",                  # falsy short-circuit
        " ": "sqm",                 # whitespace quirk: '' in 'tiles'
    }
    df = spark.createDataFrame([(c,) for c in cases], "cat string")
    got = {r["cat"]: r["u"] for r in df.select(
        "cat", PT.default_unit_col(F.col("cat")).alias("u")).collect()}
    for c, want in cases.items():
        assert got[c] == want, c


def test_factory_object_layering(spark):
    fs = PT.FACTORY_FIELDS14
    sch = StructType([StructField("product_id", LongType())] + [
        StructField(n, StructType(
            [StructField(f, StringType()) for f in fs]))
        for n in ("existing", "meta", "dflt")])

    def layer(**kw):
        return tuple(kw.get(f) for f in fs)

    row = (1,
           layer(factory_name="ExName", city="N/A"),
           layer(factory_name="FlatName", city="FlatCity",
                 country=""),
           layer(factory_name="DefName", city="DefCity",
                 country="DefCountry", phone="123"))
    df = spark.createDataFrame([row], sch)
    out = df.select(*PT.factory_object_cols(
        F.col("existing"), F.col("meta"), F.col("dflt"))).collect()[0]
    assert out["f_factory_name"] == "ExName"   # layer 1 wins
    assert out["f_city"] == "FlatCity"         # N/A is empty -> layer 2
    assert out["f_country"] == "DefCountry"    # '' empty -> layer 3
    assert out["f_phone"] == "123"             # only defaults have it
    assert out["f_email"] is None
