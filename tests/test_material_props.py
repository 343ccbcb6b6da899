"""Pins for the rule-based property extraction
(operators/material_props.py) against an independent transcription of
enhanced_material_property_extractor.py:313-400."""

import re

from mivaa_pdf_extractor_spark.operators import material_props as mp


def ref_rule_based(text):
    low = text.lower()
    out = {}
    slip = {}
    r = re.findall(r"\b(R(?:9|10|11|12|13))\b", text, re.IGNORECASE)
    if r:
        slip["rValue"] = sorted({m.upper() for m in r})
    dcof = [float(v) for v in re.findall(
        r"dcof[:\s]*([0-9]+\.?[0-9]*)", low) if 0 <= float(v) <= 1]
    if dcof:
        slip["dcofRange"] = [min(dcof), max(dcof)]
    if slip:
        slip["confidence"] = 0.65
        out["slip"] = slip
    mech = {}
    mohs = [float(v) for v in re.findall(
        r"mohs[:\s]+(?:hardness[:\s]+)?([0-9]+\.?[0-9]*)", low)
        if 1 <= float(v) <= 10]
    if mohs:
        mech["mohsHardnessRange"] = [min(mohs), max(mohs)]
    pei = [int(v) for v in re.findall(
        r"pei[:\s]+(?:rating[:\s]+)?(?:class[:\s]+)?([0-5])", low)]
    if pei:
        mech["peiRating"] = sorted(set(pei))
    if mech:
        mech["confidence"] = 0.6
        out["mech"] = mech
    water = {}
    wa = [float(v) for v in re.findall(
        r"water\s+absorption[:\s]*([0-9]+\.?[0-9]*)\s*%", low)
        if 0 <= float(v) <= 100]
    if wa:
        water["waterAbsorptionRange"] = [min(wa), max(wa)]
    if "frost" in low and ("resist" in low or "proof" in low):
        water["frostResistance"] = True
    if water:
        water["confidence"] = 0.6
        out["water"] = water
    gloss = [g for g in mp.GLOSS_KEYWORDS if g in low]
    if gloss:
        out["gloss"] = {"glossLevel": gloss, "confidence": 0.7}
    aes = {}
    shade = re.findall(r"\b(V[1-4])\b", text)
    if shade:
        aes["shadeVariation"] = shade[0]
    if "rectified" in low:
        aes["rectifiedEdges"] = True
    if aes:
        aes["confidence"] = 0.7
        out["aes"] = aes
    sust = {}
    if "greenguard" in low:
        sust["greenguardLevel"] = "gold" if "gold" in low else "certified"
    rec = [int(v) for v in re.findall(r"(\d+)\s*%\s*recycled", low)
           if 0 <= int(v) <= 100]
    if rec:
        sust["totalRecycledContentRange"] = [min(rec), max(rec)]
    if sust:
        sust["confidence"] = 0.6
        out["sust"] = sust
    return out


def _synth_text(e):
    t = ""
    if e % 3 == 0:
        t += "Slip rating R10 and r11 certified. "
    if e % 3 == 1:
        t += "Rated R9 only. "
    if e % 4 == 0:
        t += "DCOF: 0.42 dcof 0.68 measured. "
    if e % 4 == 1:
        t += "dcof: 1.5 out of spec. "
    if e % 5 == 0:
        t += "Mohs hardness 6.5 scratch test mohs: 12. "
    if e % 5 == 1:
        t += "PEI rating class 4 then pei: 3 again. "
    if e % 6 == 0:
        t += ("Water  absorption: 3.2 % tested twice "
              "water absorption 0.5%. ")
    if e % 6 == 1:
        t += "frost resistant surface. "
    if e % 6 == 2:
        t += "certified frost proof. "
    if e % 6 == 3:
        t += "frost mentioned alone. "
    if e % 7 == 0:
        t += "super-polished finish. "
    if e % 7 == 1:
        t += "matte and velvet options. "
    if e % 8 == 0:
        t += "Shade V3 then V2 variation. "
    if e % 8 == 1:
        t += "shade v2 lowercase ignored. "
    if e % 9 == 0:
        t += "rectified edges throughout. "
    if e % 10 == 0:
        t += "GREENGUARD Gold certified product. "
    if e % 10 == 1:
        t += "greenguard listed. "
    if e % 11 == 0:
        t += ("40 % recycled content with 25% recycled glass and "
              "140% recycled bogus. ")
    return t


def test_props_match_reference(spark):
    docs = [(e, _synth_text(e)) for e in range(400)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in mp.extract_props(df).collect()}
    assert len(got) == 400
    for e, text in docs:
        w = ref_rule_based(text)
        g = got[e]
        slip = w.get("slip", {})
        assert g["slip_rvalues_csv"] == (
            ",".join(slip["rValue"]) if "rValue" in slip else None)
        assert g["dcof_min"] == (slip.get("dcofRange") or [None])[0]
        assert g["slip_conf"] == slip.get("confidence")
        mech = w.get("mech", {})
        assert g["mohs_min"] == (mech.get("mohsHardnessRange")
                                 or [None])[0], e
        assert g["pei_csv"] == (",".join(map(str, mech["peiRating"]))
                                if "peiRating" in mech else None)
        water = w.get("water", {})
        assert g["water_max"] == (water.get("waterAbsorptionRange")
                                  or [None, None])[1]
        assert g["frost_resistance"] == (
            str(water.get("frostResistance", False)).lower()
            if water else None)
        assert g["gloss_csv"] == (
            ",".join(w["gloss"]["glossLevel"]) if "gloss" in w else None)
        aes = w.get("aes", {})
        assert g["shade_variation"] == aes.get("shadeVariation")
        assert g["rectified_edges"] == (
            str(aes.get("rectifiedEdges", False)).lower()
            if aes else None)
        sust = w.get("sust", {})
        assert g["greenguard_level"] == sust.get("greenguardLevel")
        assert g["recycled_min"] == (
            sust.get("totalRecycledContentRange") or [None])[0]
        assert g["sust_conf"] == sust.get("confidence")


def test_props_edge_cases(spark):
    rows = [
        (0, "R9 R13 r10 R14 R8"),          # valid set only, upper+dedup
        (1, "dcof: 0.0 DCOF 1.0 dcof 1.01"),  # inclusive bounds
        (2, "shade v2 only"),               # lowercase V never matches
        (3, "superb R10R11"),               # \b: no boundary -> R10 only?
        (4, None),                          # NULL text
        (5, "greenguard marigold"),         # 'gold' substring anywhere
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    g = {r.doc_id: r.asDict() for r in mp.extract_props(df).collect()}
    assert g[0]["slip_rvalues_csv"] == "R10,R13,R9"
    assert g[1]["dcof_min"] == 0.0 and g[1]["dcof_max"] == 1.0
    assert g[2]["shade_variation"] is None
    # "R10R11": \b(R10)\b fails (1 is word char); \b(R11)\b fails too
    assert g[3]["slip_rvalues_csv"] is None
    assert g[4]["greenguard_level"] is None
    assert g[5]["greenguard_level"] == "gold"
