"""Pins for icon routing + vision JSON validation
(operators/icon_split.py) vs transcriptions of
image_processing_service.py:880-1135."""

import json
import re

from mivaa_pdf_extractor_spark.operators import icon_split as ic


def ref_split(material, non_material):
    def shaped(img):
        w, h = img.get("width") or 0, img.get("height") or 0
        if w <= 0 or h <= 0:
            return False
        if w >= 200 or h >= 200:
            return False
        return 0.5 <= w / h <= 2.0

    def deco(img):
        c = (img.get("classification") or "").upper().strip()
        return c == "DECORATIVE"

    ms = [(i, shaped(i)) for i in material]
    ds = [(i, shaped(i) and deco(i)) for i in non_material]
    counts = {}
    for img, s in ms + ds:
        if s and img.get("page_number") is not None:
            counts[img["page_number"]] = \
                counts.get(img["page_number"], 0) + 1
    grid = {p for p, c in counts.items() if c >= 3}
    out = {}
    for img, s in ms:
        out[img["image_id"]] = ("icon_candidate"
                                if s and img.get("page_number") in grid
                                else "regular_material")
    for img, s in ds:
        out[img["image_id"]] = ("icon_candidate"
                                if s and img.get("page_number") in grid
                                else "remaining_non_material")
    return out


def ref_validate(raw):
    if not raw:
        return "empty", None
    cleaned = raw.strip()
    if cleaned.startswith("```"):
        cleaned = re.sub(r"^```(?:json)?\s*", "", cleaned)
        cleaned = re.sub(r"\s*```$", "", cleaned)
    parsed = None
    try:
        parsed = json.loads(cleaned)
    except json.JSONDecodeError:
        m = re.search(r"\{[\s\S]*\}", cleaned)
        if m:
            try:
                parsed = json.loads(m.group(0))
            except json.JSONDecodeError:
                pass
    if parsed is None:
        return "unparseable", None
    if not isinstance(parsed, dict) or not parsed:
        return "not_dict", None
    present = [f for f in ic.EXPECTED_VISION_FIELDS
               if parsed.get(f) not in (None, "", [], {})]
    if len(present) < 4:
        return "too_few_fields", len(present)
    return "valid", len(present)


def test_icon_split_matches_reference(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {r.image_id: r.route for r in ic.split_icon_candidates(
        ic.synth_icon_images(ev)).collect()}
    docs = {}
    for e in range(1000):
        d, i = e % 40, (e // 40) % 8
        if i >= 8 or (d, i) in docs:
            continue
        docs[(d, i)] = {
            "image_id": d * 10 + i,
            "bucket": "material" if i % 2 == 0 else "non_material",
            "width": [80, 150, 400, 60][i % 4],
            "height": [80, 90, 300, 180][i % 4],
            "page_number": None if (d + i) % 9 == 8 else i % 3 + 1,
            "classification": [" decorative ", "DECORATIVE",
                               "TECHNICAL_DIAGRAM", None, None][i % 5],
        }
    for d in range(40):
        imgs = [v for (dd, _i), v in docs.items() if dd == d]
        mat = [v for v in imgs if v["bucket"] == "material"]
        non = [v for v in imgs if v["bucket"] == "non_material"]
        want = ref_split(mat, non)
        for iid, route in want.items():
            assert got[iid] == route, (d, iid, route, got[iid])


def test_vision_validate_pins(spark):
    cases = [
        '{"material_type": "c", "texture": "t", "finish": "f", '
        '"pattern": "p"}',                                 # exactly 4
        '```json\n{"material_type": "c", "texture": "t", '
        '"finish": "f"}\n```',                             # 3 -> too few
        'prose {"material_type": "c", "texture": "t", '
        '"finish": "f", "confidence": 0.9} more',          # block fallback
        "[1, 2]",                                          # not_dict
        "{}",                                              # not_dict (empty)
        "garbage", "", None,
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)],
        "image_id long, raw string")
    got = {r.image_id: (r.outcome, r.present_fields)
           for r in ic.validate_vision_json(df).collect()}
    for i, c in enumerate(cases):
        want = ref_validate(c)
        assert got[i][0] == want[0], (i, c, got[i], want)
        if want[1] is not None:
            assert got[i][1] == want[1], (i, c)
    assert got[0][0] == "valid"
    assert got[1][0] == "too_few_fields"
    assert got[2][0] == "valid"
    assert got[4][0] == "not_dict"
