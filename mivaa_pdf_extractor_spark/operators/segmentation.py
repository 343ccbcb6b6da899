"""Material-zone segmentation post-processing.

Reference: ``app/services/images/segmentation_service.py`` —

- ``_detect_media_type`` (:153-168): magic bytes of
  ``b64decode(image_base64[:24] + "==")[:12]`` — jpeg ``\\xff\\xd8
  \\xff``, png ``\\x89PNG``, webp ``RIFF....WEBP``, gif ``GIF8``/
  ``GIF9``, anything else (or a decode error) falls back to
  ``image/jpeg``. For inputs of >= 24 chars the appended ``"=="`` is
  dead weight (CPython's decoder ignores the trailing pad on an
  aligned 24-char prefix), so the fold decodes the aligned prefix.
- ``_parse_zones`` (:207-245): markdown-fence strip
  (``re.sub(r"```(?:json)?\\s*", "")`` then strip/rstrip('`')),
  then per-zone validation: dict-only, all of x/y/w/h required
  (skipped zones still consume their index — the ``zone_{i}`` label
  default uses the ORIGINAL enumeration index, pinned), x/y clamped
  to [0, 1], w/h to [0.01, 1], confidence clamped with a 0.5
  default, label/material_type/finish/dominant_color/zone_intent/
  search_query defaults, and a zone_intent whitelist that resets
  unknown values to ``surface``.
- ``_extract_json_array`` (:248-313): fast-path greedy ``\\[.*\\]``
  parse; on failure the truncation-recovery scan walks brace depth
  outside strings and keeps everything up to the last complete
  top-level object, re-wrapped with ``]``.

The parser is genuinely sequential per string, so it runs as the
reference's transcribed Python inside ``mapInPandas`` (Arrow-batched,
one small LLM response per row — embarrassingly parallel); everything
around it is Column logic. The contract twin re-derives the expected
zones from the synthesis parameters instead of re-parsing.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

ZONE_INTENTS = ("surface", "full_object", "upholstery", "sub_element")

ZONE_SCHEMA = (
    "req_id long, zone_ord int, orig_index int, x double, y double, "
    "w double, h double, confidence double, label string, "
    "material_type string, finish string, dominant_color string, "
    "zone_intent string, search_query string")


def detect_media_type(images: DataFrame) -> DataFrame:
    """``images``: (image_id long, image_base64 string)."""
    header = F.unbase64(F.substring(F.col("image_base64"), 1, 24))
    h = lambda a, b: F.substring(header, a, b)  # noqa: E731
    media = (
        F.when(h(1, 3) == F.lit(bytes([0xFF, 0xD8, 0xFF])),
               F.lit("image/jpeg"))
        .when(h(1, 4) == F.lit(b"\x89PNG"), F.lit("image/png"))
        .when((h(1, 4) == F.lit(b"RIFF"))
              & (h(9, 4) == F.lit(b"WEBP")), F.lit("image/webp"))
        .when(h(1, 4).isin(F.lit(b"GIF8"), F.lit(b"GIF9")),
              F.lit("image/gif"))
        .otherwise(F.lit("image/jpeg")))
    return images.select("image_id", media.alias("media_type"))


def _extract_json_array(content):
    """segmentation_service.py:248-313 verbatim."""
    if not content:
        return None
    start = content.find("[")
    if start < 0:
        return None
    match = re.search(r"\[.*\]", content[start:], re.DOTALL)
    if match:
        try:
            parsed = json.loads(match.group())
            if isinstance(parsed, list):
                return parsed
        except json.JSONDecodeError:
            pass
    depth = 0
    in_string = False
    escape = False
    last_complete = -1
    for i in range(start + 1, len(content)):
        ch = content[i]
        if escape:
            escape = False
            continue
        if ch == "\\" and in_string:
            escape = True
            continue
        if ch == '"':
            in_string = not in_string
            continue
        if in_string:
            continue
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                last_complete = i
    if last_complete < 0:
        return None
    recovered = content[start:last_complete + 1] + "]"
    try:
        parsed = json.loads(recovered)
        if isinstance(parsed, list):
            return parsed
    except json.JSONDecodeError:
        pass
    return None


def _parse_zones_py(content):
    """segmentation_service.py:207-245 verbatim."""
    content = re.sub(r"```(?:json)?\s*", "", content or "") \
        .strip().rstrip("```").strip()
    zones = _extract_json_array(content)
    if zones is None:
        return []
    validated = []
    for i, zone in enumerate(zones):
        if not isinstance(zone, dict):
            continue
        bbox = zone.get("bbox", {})
        if not isinstance(bbox, dict) \
                or not all(k in bbox for k in ("x", "y", "w", "h")):
            continue
        out = dict(zone)
        out["bbox"] = {
            "x": max(0.0, min(1.0, float(bbox["x"]))),
            "y": max(0.0, min(1.0, float(bbox["y"]))),
            "w": max(0.01, min(1.0, float(bbox["w"]))),
            "h": max(0.01, min(1.0, float(bbox["h"]))),
        }
        out["confidence"] = max(0.0, min(1.0,
                                         float(zone.get("confidence",
                                                        0.5))))
        out.setdefault("label", f"zone_{i}")
        out.setdefault("material_type", "unknown")
        out.setdefault("finish", "unknown")
        out.setdefault("dominant_color", "#888888")
        out.setdefault("zone_intent", "surface")
        if out["zone_intent"] not in ZONE_INTENTS:
            out["zone_intent"] = "surface"
        out.setdefault("search_query", "")
        out["_orig_index"] = i
        validated.append(out)
    return validated


def parse_zone_responses(responses: DataFrame) -> DataFrame:
    """``responses``: (req_id long, content string). One output row
    per validated zone."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                for ord_, z in enumerate(_parse_zones_py(r.content)):
                    b = z["bbox"]
                    rows.append((
                        int(r.req_id), ord_, z["_orig_index"],
                        b["x"], b["y"], b["w"], b["h"],
                        z["confidence"], str(z["label"]),
                        str(z["material_type"]), str(z["finish"]),
                        str(z["dominant_color"]),
                        str(z["zone_intent"]),
                        str(z["search_query"])))
            yield pd.DataFrame(rows, columns=[
                "req_id", "zone_ord", "orig_index", "x", "y", "w",
                "h", "confidence", "label", "material_type",
                "finish", "dominant_color", "zone_intent",
                "search_query"])

    from mivaa_pdf_extractor_spark.core.fanout import fan_out
    return fan_out(responses).mapInPandas(run, ZONE_SCHEMA)


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

INTENT_CASES = ("surface", "full_object", "upholstery",
                "sub_element", "banana", "", None)


def synth_zone_json(doc, i):
    """Shared zone-object construction, as Columns. Returns the JSON
    object string for zone i of request ``doc``."""
    g = doc + i
    x = ((g % 30).cast("double") - 10) / 10.0       # -1.0 .. 1.9
    y = ((doc * 7 + i) % 14).cast("double") / 10.0  # 0.0 .. 1.3
    w = ((doc * 3 + i * 5) % 25).cast("double") / 10.0  # 0 .. 2.4
    hh = (((doc + i * 11) % 12).cast("double") + 1) / 10.0
    conf = ((g % 20).cast("double")) / 10.0         # 0 .. 1.9
    has_bbox = g % 5 != 0
    has_conf = g % 3 != 0
    has_label = g % 4 != 0
    intent_idx = (g % 7).cast("int")
    intent = F.element_at(F.array(*[
        F.lit(x_) if x_ is not None else F.lit(None).cast("string")
        for x_ in INTENT_CASES]), intent_idx + 1)
    parts = F.concat(
        F.lit('{"note": "z"'),
        F.when(has_bbox, F.concat(
            F.lit(', "bbox": {"x": '), x.cast("string"),
            F.lit(', "y": '), y.cast("string"),
            F.lit(', "w": '), w.cast("string"),
            F.lit(', "h": '), hh.cast("string"), F.lit("}")))
        .otherwise(F.lit(', "bbox": {"x": 0.1, "y": 0.1}')),
        F.when(has_conf, F.concat(F.lit(', "confidence": '),
                                  conf.cast("string")))
        .otherwise(F.lit("")),
        F.when(has_label, F.concat(F.lit(', "label": "L'),
                                   i.cast("string"), F.lit('"')))
        .otherwise(F.lit("")),
        F.when(intent.isNotNull(), F.concat(
            F.lit(', "zone_intent": "'), intent, F.lit('"')))
        .otherwise(F.lit("")),
        F.lit("}"))
    return parts


def synth_zone_responses(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    n = (F.col("doc") % 4).cast("int")  # 0..3 zones
    objs = F.array_join(
        F.transform(F.sequence(F.lit(0), n),
                    lambda i: synth_zone_json(F.col("doc"), i)),
        ", ")
    v = F.col("doc") % 6
    content = (
        F.when(v == 0, F.concat(F.lit("```json\n["), objs,
                                F.lit("]\n```")))
        .when(v == 1, F.concat(F.lit("Here you go: ["), objs,
                               F.lit("]")))
        .when(v == 2, F.concat(F.lit("["), objs,
                               F.lit(', {"label": "cut off, "bbo')))
        .when(v == 3, F.lit("Sorry, I cannot segment this image."))
        .when(v == 4, F.lit(""))
        .otherwise(F.lit("[]")))
    return d.select(F.col("doc").alias("req_id"),
                    content.alias("content"))


def duck_zone_sql() -> str:
    """Twin: expected zones derived from the CONSTRUCTION parameters
    (variants 0/1 parse fully, 2 recovers the complete prefix, 3/4
    parse to nothing, 5 is an empty array)."""
    intents = "[" + ", ".join(
        "NULL" if x is None else f"'{x}'" for x in INTENT_CASES) + "]"
    return f"""
zreq AS (
  SELECT doc, CAST(doc % 4 AS INT) AS nz, CAST(doc % 6 AS INT) AS v
  FROM docs),
zcand AS (
  SELECT doc, v, i
  FROM (SELECT doc, v, nz, unnest(generate_series(0, nz)) AS i
        FROM zreq)
  WHERE v IN (0, 1, 2)),
zvalid AS (
  SELECT doc, CAST(i AS INT) AS orig_index,
         GREATEST(0.0, LEAST(1.0,
           (CAST((doc + i) % 30 AS DOUBLE) - 10) / 10.0)) AS x,
         GREATEST(0.0, LEAST(1.0,
           CAST((doc*7 + i) % 14 AS DOUBLE) / 10.0)) AS y,
         GREATEST(0.01, LEAST(1.0,
           CAST((doc*3 + i*5) % 25 AS DOUBLE) / 10.0)) AS w,
         GREATEST(0.01, LEAST(1.0,
           (CAST((doc + i*11) % 12 AS DOUBLE) + 1) / 10.0)) AS h,
         CASE WHEN (doc + i) % 3 != 0
              THEN GREATEST(0.0, LEAST(1.0,
                CAST((doc + i) % 20 AS DOUBLE) / 10.0))
              ELSE 0.5 END AS confidence,
         CASE WHEN (doc + i) % 4 != 0
              THEN 'L' || CAST(i AS VARCHAR)
              ELSE 'zone_' || CAST(i AS VARCHAR) END AS label,
         'unknown' AS material_type, 'unknown' AS finish,
         '#888888' AS dominant_color,
         CASE WHEN ({intents})[CAST((doc + i) % 7 AS INT) + 1]
                   IN ('surface', 'full_object', 'upholstery',
                       'sub_element')
              THEN ({intents})[CAST((doc + i) % 7 AS INT) + 1]
              ELSE 'surface' END AS zone_intent,
         '' AS search_query
  FROM zcand WHERE (doc + i) % 5 != 0),
zones AS (
  SELECT doc AS req_id,
         CAST(row_number() OVER (PARTITION BY doc ORDER BY orig_index)
              - 1 AS INT) AS zone_ord,
         orig_index, x, y, w, h, confidence, label, material_type,
         finish, dominant_color, zone_intent, search_query
  FROM zvalid)"""


MAGIC = {
    0: ("jpeg", b"\xff\xd8\xff"),
    1: ("png", b"\x89PNG\r\n"),
    2: ("webp", b"RIFF\x10\x00\x00\x00WEBP"),
    3: ("gif8", b"GIF89a"),
    4: ("gif9", b"GIF9xx"),
    5: ("riff_not_webp", b"RIFF\x10\x00\x00\x00WAVE"),
    6: ("garbage", b"NOTANIMAGEATALL!"),
}


def synth_media_images(docs) -> DataFrame:
    import base64
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    cases = []
    for k in range(7):
        _name, head = MAGIC[k]
        payload = head + bytes((7 * k + j) % 251 for j in
                               range(24 - len(head)))
        cases.append(base64.b64encode(payload).decode())
    arr = F.array(*[F.lit(c) for c in cases])
    return d.select(F.col("doc").alias("image_id"),
                    F.element_at(arr, (F.col("doc") % 7 + 1)
                                 .cast("int")).alias("image_base64"))


def duck_media_sql() -> str:
    import base64
    rows = []
    for k in range(7):
        name, head = MAGIC[k]
        payload = head + bytes((7 * k + j) % 251 for j in
                               range(24 - len(head)))
        b64 = base64.b64encode(payload).decode()
        if head[:3] == b"\xff\xd8\xff":
            mt = "image/jpeg"
        elif head[:4] == b"\x89PNG":
            mt = "image/png"
        elif head[:4] == b"RIFF" and head[8:12] == b"WEBP":
            mt = "image/webp"
        elif head[:4] in (b"GIF8", b"GIF9"):
            mt = "image/gif"
        else:
            mt = "image/jpeg"
        rows.append((k, b64, mt))
    vals = ",\n    ".join(f"({k}, '{b}', '{m}')" for k, b, m in rows)
    return f"""
mcase(k, b64, media_type) AS (VALUES
    {vals}),
mimg AS (
  SELECT doc AS image_id, c.media_type
  FROM docs JOIN mcase c ON CAST(docs.doc % 7 AS INT) = c.k)"""


# ---------------------------------------------------------------------------
# SAM-2 bbox pixelization (app/api/sam_routes.py:73-99)
# ---------------------------------------------------------------------------

def sam_bbox_pixels(boxes: "DataFrame") -> "DataFrame":
    """Pin: x2/y2 truncate the SUM int((x + w) * img_w) — the OPPOSITE
    convention from the Paddle block pixelizer (ocr_service.py:283-296
    truncates the width from the DIFFERENCE product); the two
    pixelizers can disagree by a pixel on the same box.  Output
    ladder (:131-133): `output[0] if isinstance(output, list) else
    output` — a list-wrapped URL unwraps, a bare string passes, an
    empty output fails the mask."""
    from pyspark.sql import functions as F
    return boxes.select(
        "box_id",
        F.floor(F.col("x") * F.col("img_w")).cast("int")
        .alias("box_x1"),
        F.floor(F.col("y") * F.col("img_h")).cast("int")
        .alias("box_y1"),
        F.floor((F.col("x") + F.col("w")) * F.col("img_w"))
        .cast("int").alias("box_x2"),
        F.floor((F.col("y") + F.col("h")) * F.col("img_h"))
        .cast("int").alias("box_y2"))


def synth_sam_boxes(events: "DataFrame") -> "DataFrame":
    from pyspark.sql import functions as F
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("box_id"),
        ((e % 50).cast("double") / 100).alias("x"),
        ((e % 40).cast("double") / 100).alias("y"),
        ((e % 30 + 1).cast("double") / 100).alias("w"),
        ((e % 25 + 1).cast("double") / 100).alias("h"),
        (e % 900 + 300).cast("int").alias("img_w"),
        (e % 700 + 200).cast("int").alias("img_h"))


SYNTH_SAM_BOXES_SQL = """
    SELECT CAST(event_id AS BIGINT) AS box_id,
           CAST(event_id % 50 AS DOUBLE) / 100 AS x,
           CAST(event_id % 40 AS DOUBLE) / 100 AS y,
           CAST(event_id % 30 + 1 AS DOUBLE) / 100 AS w,
           CAST(event_id % 25 + 1 AS DOUBLE) / 100 AS h,
           CAST(event_id % 900 + 300 AS INT) AS img_w,
           CAST(event_id % 700 + 200 AS INT) AS img_h
    FROM events
"""


def sam_pixels_sql() -> str:
    return f"""
        WITH b AS ({SYNTH_SAM_BOXES_SQL})
        SELECT box_id,
               CAST(floor(x * img_w) AS INT) AS box_x1,
               CAST(floor(y * img_h) AS INT) AS box_y1,
               CAST(floor((x + w) * img_w) AS INT) AS box_x2,
               CAST(floor((y + h) * img_h) AS INT) AS box_y2
        FROM b
    """
