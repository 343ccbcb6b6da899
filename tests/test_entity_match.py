"""Pins for entity-product matching (operators/entity_match.py) vs a
transcription of document_entity_service.py:221-374."""

from mivaa_pdf_extractor_spark.operators import entity_match as em


def ref_match(entity, product):
    score = 0.0
    reasons = []
    eset = set(entity["pr"] or [])
    pset = set(product["pr"] or [])
    if eset and pset:
        ov = eset & pset
        if ov:
            score += 0.6 * (len(ov) / max(len(entity["pr"]),
                                          len(product["pr"])))
            reasons.append(f"Page overlap: {len(ov)} pages")
    ef = (entity.get("factory") or entity.get("manufacturer"))
    ef = ef.lower() if ef else None
    pf = product.get("factory")
    pf = pf.lower() if pf else None
    if ef and pf and ef == pf:
        score += 0.3
        reasons.append(f"Factory match: {ef}")
    el, pl = entity["name"].lower(), product["name"].lower()
    if pl in el or el in pl:
        score += 0.1
        reasons.append("Name similarity")
    return score, reasons


def test_match_pins(spark):
    ents = [
        # dup pages inflate the raw denominator: set {3,4} but len 3
        (1, 10, "cert", "x", [3, 3, 4], None, None),
        # empty name -> always name similarity
        (1, 11, "cert", "", [1, 2, 3], None, None),
        # factory via manufacturer fallback, case-insensitive
        (1, 12, "factory", "Entity", None, None, "fab1"),
    ]
    prods = [
        (1, 100, "Prod0", [3, 4, 5], "FAB1"),
        (1, 101, "zzz", None, "other"),
    ]
    edf = spark.createDataFrame(
        ents, "document_id long, entity_id long, entity_type string, "
              "name string, page_range array<int>, "
              "factory_name string, manufacturer string")
    pdf = spark.createDataFrame(
        prods, "document_id long, product_id long, name string, "
               "page_range array<int>, factory_name string")
    got = {(r.entity_id, r.product_id): r
           for r in em.match_entities(edf, pdf).collect()}
    # entity 10 x prod 100: overlap {3,4} = 2; max(3, 3) = 3
    want, reasons = ref_match(
        {"pr": [3, 3, 4], "name": "x"}, {"pr": [3, 4, 5],
                                         "name": "Prod0",
                                         "factory": "FAB1"})
    assert abs(want - 0.4) < 1e-12          # below threshold...
    assert (10, 100) not in got             # ...so no link
    # entity 11: overlap {1,2,3}&{3,4,5} = 1/3 -> 0.2 + name 0.1 = 0.3
    assert (11, 100) not in got
    # entity 12: factory 0.3 + '' ... name 'Entity' not contained
    # and no overlap -> 0.3 < 0.5 -> no link vs FAB1 either
    assert (12, 100) not in got
    # craft a passing pair
    edf2 = spark.createDataFrame(
        [(2, 20, "cert", "", [3, 4], "FabX", None)],
        "document_id long, entity_id long, entity_type string, "
        "name string, page_range array<int>, factory_name string, "
        "manufacturer string")
    pdf2 = spark.createDataFrame(
        [(2, 200, "AnyName", [3, 4], "fabx")],
        "document_id long, product_id long, name string, "
        "page_range array<int>, factory_name string")
    r = em.match_entities(edf2, pdf2).collect()
    assert len(r) == 1
    # 0.6*1.0 + 0.3 + 0.1 ('' in anything) = 1.0
    assert abs(r[0].match_score - 1.0) < 1e-12
    assert r[0].reasons == ("Page overlap: 2 pages; "
                            "Factory match: fabx; Name similarity")
