"""Pins metadata normalization (operators/metadata_norm.py) to
metadata_normalizer.py. Every expected value below was produced by
executing the reference module on the same inputs (differential check
done offline); the quirks pinned:

- title-case fallback applies to the ORIGINAL string and yields
  Python str.title() (uppercase after any non-letter: "3d" → "3D");
- composition extraction is case-sensitive on the mapped category, so
  a Title-cased fallback like "Ceramic Tile Deluxe" gets NO
  composition ("tile" not in "...Tile...");
- a present-but-placeholder factory_name with no alias replacement
  keeps its placeholder value;
- the sku strip chain runs fold_ before tri_fold_, so
  sku_tri_fold_blue → "tri_blue" (tri_fold_ is unreachable), and the
  ona_ strip mangles "ona_green_10x10" → "green_10x10";
- "grout_color_code_white_mapei" → color "code" (the "_code" replace
  needs a LEADING underscore, which the key lacks after the prefix
  strip);
- an assembled sku_codes map silently overwrites a kept string-valued
  'sku_codes' field;
- product-name SKU filtering: slash keys need a space in the pre-slash
  segment, underscore keys need a ≥3-char first segment; accents fold
  for the comparison ("Óna" matches "ONA ...").
"""

from pyspark.sql import functions as F, types as T

from mivaa_pdf_extractor_spark.operators import metadata_norm as mnorm


def _cat(spark, raw):
    df = spark.createDataFrame([(raw,)], "c string")
    r = df.select(mnorm.normalize_material_category_col(
        F.col("c")).alias("o")).collect()[0]["o"]
    return (r["category"], r["composition"])


def test_material_category_mapping_and_composition(spark):
    assert _cat(spark, "ceramic tile") == ("ceramic_tile", "ceramic")
    assert _cat(spark, "porcelain") == ("porcelain_tile", "porcelain")
    assert _cat(spark, "tile") == ("floor_tile", None)
    assert _cat(spark, "marble") == ("stone_slab", None)
    assert _cat(spark, "Stoneware Tile") == ("floor_tile", "stoneware")
    assert _cat(spark, " vinyl flooring ") == ("vinyl_flooring", None)
    assert _cat(spark, "QUARTZ") == ("quartz", None)
    assert _cat(spark, "glass") == ("glass_panel", None)
    assert _cat(spark, "shower tile") == ("shower_tile", None)


def test_material_category_passthrough_and_title_fallback(spark):
    assert _cat(spark, "floor_tile") == ("floor_tile", None)
    assert _cat(spark, "custom_thing") == ("custom_thing", None)
    # Python title(): "3d" -> "3D"; composition None because "tile"
    # (lowercase) is not in the Title-cased fallback
    assert _cat(spark, "fancy stone-3d surface") \
        == ("Fancy Stone-3D Surface", None)
    assert _cat(spark, "Ceramic Tile Deluxe") \
        == ("Ceramic Tile Deluxe", None)
    assert _cat(spark, "") == (None, None)


_MAP = T.MapType(T.StringType(), T.StringType())


def _fkeys(spark, m):
    df = spark.createDataFrame([(m,)], T.StructType(
        [T.StructField("metadata", _MAP)]))
    r = mnorm.normalize_factory_keys(df).collect()[0]["metadata"]
    return dict(r)


def test_factory_key_folding(spark):
    assert _fkeys(spark, {"factory_name": "n/a", "manufacturer":
                          "Harmony", "brand": "x"}) \
        == {"factory_name": "Harmony"}
    assert _fkeys(spark, {"factory_name": "Keep Me", "brand": "Drop"}) \
        == {"factory_name": "Keep Me"}
    assert _fkeys(spark, {"manufacturer": "not found", "brand": "",
                          "supplier": "Sup Co", "factory": "Flat"}) \
        == {"factory_name": "Sup Co"}
    assert _fkeys(spark, {"factory": "FlatOnly", "color": "red"}) \
        == {"color": "red", "factory_name": "FlatOnly"}
    assert _fkeys(spark, {"factory_name": "unknown",
                          "factory_group": "Peronda Group"}) \
        == {"factory_name": "unknown",
            "factory_group_name": "Peronda Group"}
    assert _fkeys(spark, {"factory_group_name": "-",
                          "factory_group": "G2", "other": "keep"}) \
        == {"factory_group_name": "G2", "other": "keep"}
    assert _fkeys(spark, {"color": "red"}) == {"color": "red"}
    # placeholder with no replacement keeps its placeholder value
    assert _fkeys(spark, {"factory_name": "n/a"}) \
        == {"factory_name": "n/a"}


def _consol(spark, fields, pname):
    # build the map with EXPLICIT entry order (a Python dict fed to
    # createDataFrame hashes into arbitrary map order; the reference's
    # last-wins/first-seen semantics depend on iteration order)
    df = spark.createDataFrame([(pname,)], "product_name string")
    ents = F.array(*[F.struct(F.lit(k).alias("key"),
                              F.lit(v).alias("value"))
                     for k, v in fields.items()])
    df = df.withColumn("metadata", F.map_from_entries(ents))
    r = mnorm.consolidate_commercial(df).collect()[0]
    return (dict(r["kept"]), dict(r["sku_codes"]),
            dict(r["grout_color_codes"]), list(r["product_codes"]))


def test_consolidate_commercial_quirks(spark):
    kept, sku, grout, pcodes = _consol(spark, {
        "sku_white": "W1", "sku_fold_white": "W2",
        "sku_tri_fold_blue": "B1", "sku_codes": "passthru-string",
        "other": "o", "grout_color_code_white_mapei": "GW",
        "grout_color_light_code": "GL", "product_code": "P1",
        "format_code": "P1", "reference_code": "P2",
        "sku_ona_mint": "M1"}, None)
    assert kept == {"other": "o"}   # string sku_codes overwritten
    # fold_ before tri_fold_ → tri_blue; last-wins: white = W2;
    # ona_ strip: sku_ona_mint → mint
    assert sku == {"white": "W2", "tri_blue": "B1", "mint": "M1"}
    # "_code" replace needs leading underscore → color "code"
    assert grout == {"code": "GW", "light": "GL"}
    assert pcodes == ["P1", "P2"]   # first-seen dedup


def test_sku_product_name_filter_with_accents(spark):
    kept, sku, grout, pcodes = _consol(spark, {
        "sku_white": "W1", "sku_ONA MINT/12X45": "X9",
        "sku_valenova_blue_30x60": "V1", "sku_ona_green_10x10": "OG",
    }, "Óna")
    # plain name kept; slash-prefix "ONA" matches folded "Óna";
    # "valenova" prefix mismatches; ona_ strip turns the last key into
    # "green_10x10" whose prefix "green" mismatches
    assert sku == {"white": "W1", "ONA MINT/12X45": "X9"}
    assert kept == {} and grout == {} and pcodes == []


def test_find_standard_field_tiers(spark):
    rows = [("grout_mapei", "commercial"),
            ("recommended_grout_mapei", "commercial"),
            ("designer_names", "design"),     # fuzzy ≥0.6
            ("designer", "design"),           # known variation
            ("zzqq", "design"),               # below threshold → None
            ("weight", "packaging"),          # fuzzy → weight_kg
            ("colour", "appearance"),         # fuzzy → colors
            ("finish_type", "material_properties"),
            ("x", "nope")]                    # unknown category
    df = spark.createDataFrame(rows, "f string, c string")
    got = [r["s"] for r in df.select(mnorm.find_standard_field_expr(
        F.col("f"), F.col("c")).alias("s")).collect()]
    assert got == ["grout_mapei", "grout_mapei", "designers",
                   "designers", None, "weight_kg", "colors", "finish",
                   None]


def test_unknown_field_provably_sub_threshold():
    # the field_standardize contract query maps 'zzqq9' to NULL; prove
    # no vocabulary entry reaches the 0.6 fuzzy threshold (it shares
    # no characters with any candidate, so every ratio is 0.0)
    from difflib import SequenceMatcher
    for cat, fields in mnorm.STANDARD_SCHEMA.items():
        for std, variations in fields.items():
            for cand in [std] + variations:
                assert SequenceMatcher(
                    None, "zzqq9", cand.lower().strip()).ratio() < 0.6
