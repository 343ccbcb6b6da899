"""Pins for the segmentation post-processing
(operators/segmentation.py) vs segmentation_service.py:153-313 —
the parser kernel IS the reference transcription, so these tests pin
the edge cases the synth can't reach plus the magic-byte decode."""

import base64

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import segmentation as sg

SF = "/root/testdata/sf0.001/documents.parquet"


def test_extract_json_array_recovery():
    # fast path
    assert sg._extract_json_array('x [1, 2, {"a": 1}] y') \
        == [1, 2, {"a": 1}]
    # truncation recovery keeps complete top-level objects only
    out = sg._extract_json_array(
        '[{"a": 1}, {"b": {"n": 2}}, {"c": "unterminated')
    assert out == [{"a": 1}, {"b": {"n": 2}}]
    # braces inside strings don't confuse the depth scan
    out = sg._extract_json_array(
        '[{"t": "has } brace"}, {"u": "x\\" } y"}, {"v": "cut')
    assert out == [{"t": "has } brace"}, {"u": 'x" } y'}]
    # no array / nothing complete
    assert sg._extract_json_array("no array here") is None
    assert sg._extract_json_array("[ {never closes") is None
    assert sg._extract_json_array("") is None


def test_parse_zones_edges():
    # non-dict entries skipped but consume the index for labels
    zones = sg._parse_zones_py(
        '[5, {"bbox": {"x": 2, "y": -1, "w": 0, "h": 9}}]')
    assert len(zones) == 1
    z = zones[0]
    assert z["bbox"] == {"x": 1.0, "y": 0.0, "w": 0.01, "h": 1.0}
    assert z["label"] == "zone_1"          # original index
    assert z["confidence"] == 0.5
    assert z["zone_intent"] == "surface"
    # fence stripping + intent whitelist
    zones = sg._parse_zones_py(
        '```json\n[{"bbox": {"x": 0.1, "y": 0.2, "w": 0.3, '
        '"h": 0.4}, "zone_intent": "upholstery", '
        '"confidence": 7}]\n```')
    assert zones[0]["zone_intent"] == "upholstery"
    assert zones[0]["confidence"] == 1.0


def test_media_type_matches_reference(spark):
    got = {r.image_id: r.media_type for r in sg.detect_media_type(
        sg.synth_media_images(spark.read.parquet(SF))).collect()}
    docs = [r.d for r in spark.read.parquet(SF).select(
        F.col("doc_id").cast("long").alias("d")).distinct().collect()]

    def ref_detect(b64):
        try:
            header = base64.b64decode(b64[:24] + "==")[:12]
            if header[:3] == b"\xff\xd8\xff":
                return "image/jpeg"
            if header[:4] == b"\x89PNG":
                return "image/png"
            if header[:4] == b"RIFF" and header[8:12] == b"WEBP":
                return "image/webp"
            if header[:4] in (b"GIF8", b"GIF9"):
                return "image/gif"
        except Exception:
            pass
        return "image/jpeg"

    seen = set()
    for doc in docs:
        k = doc % 7
        name, head = sg.MAGIC[k]
        payload = head + bytes((7 * k + j) % 251
                               for j in range(24 - len(head)))
        b64 = base64.b64encode(payload).decode()
        assert got[doc] == ref_detect(b64), (doc, name)
        seen.add(got[doc])
    assert seen == {"image/jpeg", "image/png", "image/webp",
                    "image/gif"}


def test_zone_parse_spark_matches_python(spark):
    rows = sg.parse_zone_responses(
        sg.synth_zone_responses(spark.read.parquet(SF))).collect()
    contents = {r.req_id: r.content for r in sg.synth_zone_responses(
        spark.read.parquet(SF)).collect()}
    by_req = {}
    for r in rows:
        by_req.setdefault(r.req_id, []).append(r)
    for req, content in contents.items():
        want = sg._parse_zones_py(content)
        got = sorted(by_req.get(req, []), key=lambda r: r.zone_ord)
        assert len(got) == len(want), req
        for g, w in zip(got, want):
            assert g.orig_index == w["_orig_index"]
            assert g.label == w["label"]
            assert (g.x, g.y, g.w, g.h) == (
                w["bbox"]["x"], w["bbox"]["y"], w["bbox"]["w"],
                w["bbox"]["h"])
            assert g.zone_intent == w["zone_intent"]
