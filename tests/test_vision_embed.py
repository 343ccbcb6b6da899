"""Transcription pins for the vision-analysis serialization folds
(operators/vision_embed.py) vs app/models/vision_analysis.py:162-346
and real_embeddings_service.py:550-560 re-implementations."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import vision_embed as ve

SF = "/root/testdata/sf0.001/documents.parquet"


# ── reference transcriptions (vision_analysis.py) ──────────────────

def _as_list(v):
    if v is None:
        return []
    if isinstance(v, list):
        return [str(x) for x in v if x]
    if isinstance(v, dict):
        return [f"{k}: {x}" for k, x in v.items() if x]
    return [str(v)]


def ref_coerce(d):
    # vision_analysis_from_legacy_dict:299-346
    if "error" in d and "material_type" not in d:
        return None
    material_type = d.get("material_type") or d.get("type")
    if not material_type:
        return None
    return {
        "material_type": str(material_type),
        "category": d.get("category"),
        "subcategory": d.get("subcategory"),
        "colors": _as_list(d.get("colors") or d.get("color_palette")
                           or d.get("dominant_colors")),
        "textures": _as_list(d.get("textures") or d.get("texture")
                             or d.get("surface_texture")),
        "finish": d.get("finish") or d.get("surface_finish"),
        "surface_pattern": (d.get("pattern") or d.get("pattern_type")
                            or d.get("surface_pattern")),
        "description": (d.get("description")
                        or d.get("visual_description")),
        "applications": _as_list(d.get("applications")
                                 or d.get("suitable_for")
                                 or d.get("usage")),
        "style": d.get("style") or d.get("aesthetic"),
        "confidence": float(d.get("confidence", 0.85)),
        "detected_text": _as_list(d.get("ocr_text")
                                  or d.get("detected_text")
                                  or d.get("text_content")),
    }


def ref_serialize(va):
    # serialize_vision_analysis_to_text:162-208
    parts = [f"Material: {va['material_type']}."]
    if va["category"]:
        cat = f"Category: {va['category']}"
        if va["subcategory"]:
            cat += f", {va['subcategory']}"
        parts.append(cat + ".")
    if va["colors"]:
        parts.append(f"Colors: {', '.join(va['colors'])}.")
    if va["textures"]:
        parts.append(f"Textures: {', '.join(va['textures'])}.")
    if va["finish"]:
        parts.append(f"Finish: {va['finish']}.")
    if va["surface_pattern"]:
        parts.append(f"Pattern: {va['surface_pattern']}.")
    if va["style"]:
        parts.append(f"Style: {va['style']}.")
    if va["applications"]:
        parts.append(f"Applications: {', '.join(va['applications'])}.")
    if va["description"]:
        parts.append(f"Description: {va['description']}.")
    if va["detected_text"]:
        parts.append(f"Text detected: {' '.join(va['detected_text'])}.")
    return " ".join(parts)


def ref_aspects(va):
    # serialize_aspect_{color,texture,style,material}:228-285
    color = [c.strip() for c in va["colors"] if c and c.strip()]
    texture = [t.strip() for t in va["textures"] if t and t.strip()]
    if va["finish"] and va["finish"].strip():
        texture.append(va["finish"].strip())
    style = []
    if va["style"] and va["style"].strip():
        style.append(va["style"].strip())
    if va["surface_pattern"] and va["surface_pattern"].strip():
        style.append(va["surface_pattern"].strip())
    for app in va["applications"]:
        if app and app.strip():
            style.append(app.strip())
    material = [va["material_type"].strip()]
    if va["category"] and va["category"].strip():
        material.append(va["category"].strip())
    if va["subcategory"] and va["subcategory"].strip():
        material.append(va["subcategory"].strip())
    return (", ".join(color) if color else None,
            ", ".join(texture) if texture else None,
            ", ".join(style) if style else None,
            ", ".join(material))


MP_EXCLUDED = ("id", "created_at", "updated_at", "document_id",
               "image_id")


def ref_understanding(va, material_properties):
    # real_embeddings_service.py:550-560
    text = ref_serialize(va)
    if material_properties:
        mp_parts = sorted(
            f"{k}: {v}" for k, v in material_properties.items()
            if v and k not in MP_EXCLUDED)
        if mp_parts:
            text = f"{text} Material properties: {', '.join(mp_parts)}."
    return text


# ── synthesis twin (same formulas as synth_legacy_vision) ──────────

def synth_dict(g):
    d = {}
    if g % 13 == 0:
        d["error"] = "boom"
    if g % 6 == 1:
        d["material_type"] = ""
    elif g % 6 != 0:
        d["material_type"] = f"material {g % 7}"
    if g % 4 != 0:
        d["type"] = f"stone {g % 3}"
    if g % 5 != 0:
        d["category"] = f"cat{g % 4}"
    if g % 7 == 0:
        d["subcategory"] = f"sub{g % 3}"
    d["colors"] = [None, [], ["warm white", "grey veining"],
                   ["", "matte black"], ["beige"]][g % 5]
    if d["colors"] is None:
        del d["colors"]
    if g % 3 == 0:
        d["color_palette"] = {"primary": "red",
                              "accent": "" if g % 2 == 0 else "gold"}
    d["dominant_colors"] = ["navy"] if g % 2 == 0 else []
    tl = [None, [], ["wood grain"], ["ribbed", "fluted"]][g % 4]
    if tl is not None:
        d["textures"] = tl
    if g % 3 == 1:
        d["texture"] = "woven"
    elif g % 3 == 2:
        d["texture"] = ""
    if g % 5 == 2:
        d["surface_texture"] = ""
    elif g % 5 == 3:
        d["surface_texture"] = "honed"
    fin = [None, "", "matte", "polished"][g % 4]
    if fin is not None:
        d["finish"] = fin
    if g % 2 == 0:
        d["surface_finish"] = "satin"
    if g % 6 == 0:
        d["pattern"] = "herringbone"
    if g % 5 == 1:
        d["pattern_type"] = "chevron"
    elif g % 5 == 2:
        d["pattern_type"] = ""
    if g % 3 == 0:
        d["surface_pattern"] = "grid"
    if g % 4 == 0:
        d["description"] = f"desc {g % 9}"
    if g % 3 == 2:
        d["visual_description"] = "a veined slab"
    al = [None, ["kitchen countertop", ""], ["floor", "wall"]][g % 3]
    if al is not None:
        d["applications"] = al
    d["suitable_for"] = ["wet areas"] if g % 4 == 2 else []
    if g % 5 == 4:
        d["usage"] = "outdoor"
    sty = [None, ""][g % 5] if g % 5 < 2 else f"style {g % 3}"
    if sty is not None:
        d["style"] = sty
    if g % 2 == 1:
        d["aesthetic"] = "industrial"
    if g % 9 != 0:
        d["confidence"] = (g % 20) * 0.05
    if g % 6 == 0:
        d["ocr_text"] = ["E27", "IP44"]
    elif g % 6 == 1:
        d["ocr_text"] = [""]
    if g % 4 == 3:
        d["detected_text"] = ["60x120"]
    if g % 7 == 3:
        d["text_content"] = "brandx"
    return d


def synth_mp(g):
    if g % 3 == 0:
        return {"thickness": "9mm", "id": "ignored",
                "document_id": "d1",
                "slip_rating": "" if g % 2 == 0 else "R10"}
    return None


def _doc_ids(spark):
    return [r.d for r in spark.read.parquet(SF).select(
        F.col("doc_id").cast("long").alias("d")).distinct().collect()]


def test_coercion_matches_reference(spark):
    rows = {r.doc: r for r in ve.coerce_legacy_vision(
        ve.synth_legacy_vision(spark.read.parquet(SF))).collect()}
    for g in _doc_ids(spark):
        want = ref_coerce(synth_dict(g))
        got = rows[g]
        if want is None:
            assert got.rejected, g
            continue
        assert not got.rejected, g
        assert got.material_type == want["material_type"], g
        assert (got.category or None) == want["category"], g
        assert list(got.colors) == want["colors"], g
        assert list(got.textures) == want["textures"], g
        assert (got.finish or None) == (want["finish"] or None), g
        assert (got.surface_pattern or None) == \
            (want["surface_pattern"] or None), g
        assert list(got.applications) == want["applications"], g
        assert (got.style or None) == (want["style"] or None), g
        assert abs(got.confidence - want["confidence"]) < 1e-9, g
        assert list(got.detected_text) == want["detected_text"], g


def test_understanding_text_matches_reference(spark):
    d = spark.read.parquet(SF)
    rows = {r.doc: r.understanding_text for r in ve.understanding_text(
        ve.coerce_legacy_vision(ve.synth_legacy_vision(d)),
        ve.synth_material_props(d)).collect()}
    n_quirk = 0
    for g in _doc_ids(spark):
        va = ref_coerce(synth_dict(g))
        if va is None:
            assert g not in rows
            continue
        want = ref_understanding(va, synth_mp(g))
        assert rows[g] == want, (g, rows[g], want)
        if "Textures: ." in want:
            n_quirk += 1  # the _as_list('') == [''] serializer quirk
    assert n_quirk > 0, "synthesis must exercise the [''] quirk"


def test_aspect_texts_match_reference(spark):
    d = spark.read.parquet(SF)
    rows = {r.doc: r for r in ve.aspect_texts(ve.coerce_legacy_vision(
        ve.synth_legacy_vision(d))).collect()}
    for g in _doc_ids(spark):
        va = ref_coerce(synth_dict(g))
        if va is None:
            continue
        want = ref_aspects(va)
        got = rows[g]
        assert (got.color_text, got.texture_text, got.style_text,
                got.material_text) == want, g
