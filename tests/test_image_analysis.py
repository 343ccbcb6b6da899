"""Transcription pins for image-analysis folds
(operators/image_analysis.py) vs
real_image_analysis_service.py:642-862 re-implementations."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import image_analysis as ia

SF = "/root/testdata/sf0.001/documents.parquet"


def _doc_ids(spark):
    return [r.d for r in spark.read.parquet(SF).select(
        F.col("doc_id").cast("long").alias("d")).distinct().collect()]


def synth_vision(g):
    analysis = {
        "colors": [None, [], [None, "grey"], ["beige"]][g % 4],
        "textures": ["veined"] if g % 3 == 0 else None,
        "finish": ["", "matte", "", None, None][g % 5]
        if g % 5 in (1, 2) else None,
        "properties": {},
    }
    if g % 5 == 1:
        analysis["finish"] = "matte"
    elif g % 5 == 2:
        analysis["finish"] = ""
    else:
        analysis["finish"] = None
    if g % 2 == 0:
        analysis["properties"]["finish"] = "honed"
    analysis["surface_pattern"] = ("herringbone" if g % 6 == 3
                                   else None)
    analysis["pattern"] = "chevron" if g % 4 == 2 else None
    if g % 3 == 1:
        analysis["properties"]["pattern"] = "grid"
    analysis["composition"] = "porcelain" if g % 7 == 0 else None
    if g % 5 == 3:
        analysis["properties"]["composition"] = "ceramic"
    analysis["confidence"] = (None if g % 9 == 0
                              else 0.0 if g % 9 == 1
                              else (g % 10) / 10.0)
    vr = {"success": g % 5 != 0}
    if g % 4 != 1:
        vr["analysis"] = analysis
    if g % 7 == 2:
        vr["error"] = "boom"
    # top-level fields for the vision-only direct-read arm share the
    # same values as the analysis fields (the ladder is the pin)
    vr.update({k: v for k, v in analysis.items()})
    vr["confidence"] = (0.0 if g % 6 == 0 else None if g % 6 == 1
                        else (g % 8) / 8.0)
    return vr, analysis


def synth_claude(g):
    cr = {"success": g % 3 != 2}
    if g % 5 != 4:
        vp = {}
        if g % 4 == 3:
            vp["color_palette"] = ["warm white", "oak"]
        elif g % 4 == 0:
            vp["color_palette"] = []
        if g % 2 == 1:
            vp["surface_finish"] = "satin"
        if g % 5 == 0:
            vp["pattern_type"] = "mosaic"
        cr["validation"] = {
            "visual_properties": vp,
            "confidence": (None if g % 11 == 0 else (g % 12) / 12.0),
            "quality_assessment": {
                "overall_quality": (1.4 if g % 13 == 0
                                    else None if g % 13 == 1
                                    else (g % 6) / 6.0)},
        }
    return cr


def ref_extract(vision_result, claude_result):
    # :642-687 transcription
    properties = {"color": None, "finish": None, "pattern": None,
                  "texture": None, "composition": None,
                  "confidence": 0.0}
    if vision_result.get("success") and vision_result.get("analysis"):
        a = vision_result["analysis"]
        properties["color"] = (a.get("colors", [None])[0]
                               if a.get("colors") else None)
        properties["texture"] = (a.get("textures", [None])[0]
                                 if a.get("textures") else None)
        properties["finish"] = (a.get("finish")
                                or a.get("properties", {})
                                .get("finish"))
        properties["pattern"] = (a.get("surface_pattern")
                                 or a.get("pattern")
                                 or a.get("properties", {})
                                 .get("pattern"))
        properties["composition"] = (a.get("composition")
                                     or a.get("properties", {})
                                     .get("composition"))
        properties["confidence"] = a.get("confidence", 0.0) or 0.0
    if claude_result.get("success") and claude_result.get("validation"):
        v = claude_result["validation"]
        vp = v.get("visual_properties", {})
        if not properties["color"] and vp.get("color_palette"):
            properties["color"] = vp["color_palette"][0]
        if not properties["finish"] and vp.get("surface_finish"):
            properties["finish"] = vp["surface_finish"]
        if not properties["pattern"] and vp.get("pattern_type"):
            properties["pattern"] = vp["pattern_type"]
        cc = v.get("confidence", 0.0) or 0.0
        if cc > properties["confidence"]:
            properties["confidence"] = cc
    return properties


def ref_quality(vision_result, claude_result, material_properties,
                slig_provided, slig_dim, slig_nonzero):
    # :736-806 transcription (slig modeled by counts)
    score = weight = 0.0
    if vision_result.get("success") or "error" not in vision_result:
        analysis = (vision_result.get("analysis")
                    if isinstance(vision_result.get("analysis"),
                                  dict) else {})
        conf = (analysis.get("confidence")
                or vision_result.get("confidence") or 0.0)
        vc = max(0.0, min(1.0, float(conf)))
        if vc > 0.0:
            score += vc * 0.40
            weight += 0.40
    if claude_result and claude_result.get("success"):
        qa = (claude_result.get("validation", {})
              .get("quality_assessment") or {})
        oq = max(0.0, min(1.0, float(qa.get("overall_quality")
                                     or 0.0)))
        if oq > 0.0:
            score += oq * 0.30
            weight += 0.30
    if material_properties:
        keys = ("color", "finish", "pattern", "texture",
                "composition", "confidence")
        filled = sum(1 for k in keys
                     if material_properties.get(k)
                     not in (None, 0, 0.0, "", []))
        score += (filled / 6.0) * 0.20
        weight += 0.20
    if slig_provided and slig_dim > 0:
        if slig_nonzero > slig_dim * 0.10:
            score += 0.10
            weight += 0.10
    return min(1.0, score / weight) if weight > 0 else 0.5


def test_props_extract_matches_reference(spark):
    got = {r.doc: r for r in ia.extract_material_properties(
        ia.synth_analysis_rows(spark.read.parquet(SF))).collect()}
    for g in _doc_ids(spark):
        vr, _ = synth_vision(g)
        want = ref_extract(vr, synth_claude(g))
        r = got[g]
        assert ((r.color or None), (r.finish or None),
                (r.pattern or None), (r.texture or None),
                (r.composition or None)) == \
            (want["color"], want["finish"], want["pattern"],
             want["texture"], want["composition"]), g
        assert abs(r.confidence - want["confidence"]) < 1e-9, g


def test_quality_matches_reference(spark):
    rows = ia.synth_analysis_rows(spark.read.parquet(SF))
    got = {r.doc: r for r in ia.quality_score_unified(
        rows, ia.extract_material_properties(rows)).collect()}
    for g in _doc_ids(spark):
        vr, _ = synth_vision(g)
        cr = synth_claude(g)
        props = ref_extract(vr, cr)
        want = ref_quality(vr, cr, props, g % 4 != 0, 768,
                           50 if g % 3 == 0 else 400)
        assert abs(got[g].quality_score - want) < 1e-8, g
