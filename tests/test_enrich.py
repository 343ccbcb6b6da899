"""Pins for the chunk-text field miner (operators/enrich), hand-computed
against _extract_fields_from_chunk_text
(reference stage_4_products.py:1701-1930).
"""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import enrich

_T0 = ("VALENOVA by SG NY is the new Signature collaboration from "
       "Harmony. Stacy Garcia, a New York-based designer, draws "
       "inspiration from the city that never sleeps. "
       "39650 VALENOVA WHITE LT/11,8X11,8 100 Mapei "
       "39657 VALENOVA GREY LT/11,8X11,8 43 Kerakoll "
       "Q59 (11,8x11,8 cm - 4.65x4.65”) white body tile "
       "12 pieces 8 patterns MAPEI | ULTRACOLOR PLUS 111* "
       "KERAKOLL | FUGABELLA 50 the new VALENOVA collection")


def _mine_one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return enrich.mine_fields(df).collect()[0]


def test_valenova_catalog_block(spark):
    r = _mine_one(spark, _T0)
    assert r["factory_name"] == "Harmony"
    assert r["designer"] == "Stacy Garcia"
    assert r["sku_entries"] == ["VALENOVA WHITE=39650",
                                "VALENOVA GREY=39657"]
    assert r["grout_suppliers"] == ["KERAKOLL", "MAPEI"]
    # two grout doses zip onto the two SKU codes by order
    assert r["grout_color_codes"] == ["39650:Mapei:100",
                                      "39657:Kerakoll:43"]
    assert r["pieces_per_box"] == 12
    assert r["patterns_count"] == 8
    assert r["body_type"] == "white body tile"
    # one metric dim, imperial zipped by order, Q-label on dims[0]
    assert r["dimensions"] == ["11.8x11.8|4.65x4.65|Q59"]
    # MAPEI product stops at '*'; KERAKOLL's greedy [A-Z0-9\s]{2,30}
    # (IGNORECASE) swallows 30 chars of the following prose — faithful
    assert r["grout_products"] == [
        "grout_mapei_product=ULTRACOLOR PLUS 111",
        "grout_kerakoll_product=FUGABELLA 50 the new VALENOVA c"]
    assert r["collection"] == "Valenova"
    assert r["inspiration"] == "city that never sleeps"


def test_modal_counts_and_dedup(spark):
    r = _mine_one(spark,
                  "Crafted in collaboration with Atlas Concorde. "
                  "produced by Florim ceramics made by Florim. "
                  "150 ISOMAT 9 pieces 250 patterns full body ceramics "
                  "inspired by nature, reimagined 24x48 cm 24x48 cm "
                  "7x7 cm")
    assert r["factory_name"] == "Florim"        # count 2 beats 1
    assert r["grout_suppliers"] == ["ISOMAT"]
    assert r["grout_color_codes"] == []         # no SKUs to zip onto
    assert r["pieces_per_box"] == 9
    assert r["patterns_count"] is None          # 250 > 100 gate
    assert r["body_type"] == "full body ceramics"
    assert r["inspiration"] == "nature"         # cut at the comma
    assert r["dimensions"] == ["24x48||", "7x7||"]  # float-key dedup
    assert r["collection"] is None              # lowercase candidates
    assert r["designer"] is None


def test_modal_tie_breaks_by_first_insertion(spark):
    r = _mine_one(spark, "produced by Alpha made by Beta "
                         "produced by Beta made by Alpha")
    # candidates in pattern-major order: [Alpha, Beta, Beta, Alpha]
    # counts tie 2-2 -> Counter keeps first-inserted (Alpha)
    assert r["factory_name"] == "Alpha"


def test_sku_dict_last_code_wins(spark):
    r = _mine_one(spark, "39650 VALENOVA WHITE LT/ x "
                         "39777 VALENOVA WHITE LT/ x "
                         "39888 OTHER SET GL/")
    # same name twice: entry keeps FIRST position, LAST code
    assert r["sku_entries"] == ["VALENOVA WHITE=39777",
                                "OTHER SET=39888"]


def test_empty_and_null_text(spark):
    df = spark.createDataFrame([(1, ""), (2, None)],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in enrich.mine_fields(df).collect()}
    for i in (1, 2):
        r = rows[i]
        assert r["factory_name"] is None
        assert r["sku_entries"] == []
        assert r["grout_suppliers"] == []
        assert r["dimensions"] == []
        assert r["grout_products"] == []
        assert r["pieces_per_box"] is None


def test_inspiration_fallthrough(spark):
    # pattern 1 MATCHES ('ab  ' — two trailing spaces pad the capture
    # to the 4-char minimum) but the comma-cut trims it to 'ab' which
    # fails the >=3 gate; the reference loop only breaks on SUCCESS, so
    # pattern 2 still gets its chance
    r = _mine_one(spark,
                  "draws inspiration from ab  , whatever. It was "
                  "inspired by the ocean waves.")
    assert r["inspiration"] == "ocean waves"


def test_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, _T0)], "doc_id long, text string")
    plan = enrich.mine_fields(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
