"""Image icon-routing split + vision-analysis JSON validation.

Re-expresses two deterministic gates of the reference's image
processing service (reference ``app/services/images/
image_processing_service.py``):

- ``_split_material_and_icon_candidates`` (:880-1032): an image is
  icon-SHAPED when 0 < width,height < 200 and 0.5 <= w/h <= 2.0;
  non-material images additionally need the vision classification
  'DECORATIVE' (upper+strip) to enter the pool; the per-page grid
  gate counts shaped images from BOTH pools (NULL pages never count)
  and only pages with >= 3 qualify; material images route
  regular_material vs icon_candidate, non-material route
  remaining_non_material vs icon_candidate.
- ``_parse_vision_analysis_json`` + ``_validate_vision_analysis``
  (:1060-1135): fence strip (^```json? + trailing ```), plain parse,
  else the GREEDY first-{ to last-} block; the parsed value must be
  a non-empty dict; at least 4 of the 12 expected fields must be
  populated (None/''/[]/{} count as empty).  JSON edge semantics
  note: Python's json accepts NaN/Infinity, the engines' JSON
  parsers do not — the synthetic corpus stays inside strict JSON.

Scale: the split is one (doc, page) grid-count groupBy broadcast
back; validation is a map-only JSON-path projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ICON_MAX_DIM = 200
ICON_MIN_ASPECT = 0.5
ICON_MAX_ASPECT = 2.0
ICON_MIN_PER_PAGE = 3
EXPECTED_VISION_FIELDS = [
    "material_type", "material_subtype", "color_palette",
    "primary_color_hex", "texture", "pattern", "finish",
    "design_style", "applications", "physical_properties",
    "quality_assessment", "confidence",
]
MIN_REQUIRED_VISION_FIELDS = 4
_WS = "[ \\t\\r\\n\\x0b\\f]"


def split_icon_candidates(images: DataFrame) -> DataFrame:
    """images: (doc_id, image_id, bucket 'material'/'non_material',
    width, height, page_number, classification).  Emits the routing
    bucket per image."""
    w = F.coalesce("width", F.lit(0))
    h = F.coalesce("height", F.lit(0))
    shaped = ((w > 0) & (h > 0) & (w < ICON_MAX_DIM)
              & (h < ICON_MAX_DIM)
              & (w / h >= ICON_MIN_ASPECT)
              & (w / h <= ICON_MAX_ASPECT))
    deco = (F.upper(F.trim(F.coalesce("classification", F.lit(""))))
            == "DECORATIVE")
    pool = F.when(F.col("bucket") == "material", shaped).otherwise(
        shaped & deco)
    tagged = images.withColumn("in_pool", pool)
    grid = (tagged.where(F.col("in_pool")
                         & F.col("page_number").isNotNull())
            .groupBy("doc_id", "page_number")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") >= ICON_MIN_PER_PAGE)
            .select("doc_id", "page_number",
                    F.lit(True).alias("grid")))
    j = tagged.join(grid, ["doc_id", "page_number"], "left")
    is_icon = F.col("in_pool") & F.coalesce("grid", F.lit(False))
    route = (F.when(is_icon, "icon_candidate")
             .when(F.col("bucket") == "material", "regular_material")
             .otherwise("remaining_non_material"))
    return j.select("doc_id", "image_id", "bucket",
                    route.alias("route"))


def icon_split_sql() -> str:
    """DuckDB twin over a CTE images_in."""
    return f"""
    t AS (SELECT *,
        (coalesce(width, 0) > 0 AND coalesce(height, 0) > 0
         AND coalesce(width, 0) < {ICON_MAX_DIM}
         AND coalesce(height, 0) < {ICON_MAX_DIM}
         AND coalesce(width, 0) / CAST(coalesce(height, 0) AS DOUBLE)
             >= {ICON_MIN_ASPECT}
         AND coalesce(width, 0) / CAST(coalesce(height, 0) AS DOUBLE)
             <= {ICON_MAX_ASPECT})
        AND (bucket = 'material'
             OR upper(trim(coalesce(classification, '')))
                 = 'DECORATIVE') AS in_pool
        FROM images_in),
    grid AS (SELECT doc_id, page_number, count(*) AS n
             FROM t WHERE in_pool AND page_number IS NOT NULL
             GROUP BY 1, 2
             HAVING count(*) >= {ICON_MIN_PER_PAGE})
    SELECT t.doc_id, t.image_id, t.bucket,
           CASE WHEN t.in_pool AND g.n IS NOT NULL
                THEN 'icon_candidate'
                WHEN t.bucket = 'material' THEN 'regular_material'
                ELSE 'remaining_non_material' END AS route
    FROM t LEFT JOIN grid g ON g.doc_id = t.doc_id
         AND g.page_number = t.page_number"""


def validate_vision_json(rows: DataFrame) -> DataFrame:
    """rows: (image_id, raw).  Emits the parse/validation outcome."""
    raw = F.coalesce("raw", F.lit(""))
    cleaned = F.regexp_replace(
        F.regexp_replace(
            F.trim(raw),
            "^```(?:json)?" + _WS + "*", ""),
        _WS + "*```$", "")
    valid1 = F.get_json_object(cleaned, "$").isNotNull()
    block = F.regexp_extract(cleaned, "(\\{[\\s\\S]*\\})", 1)
    valid2 = (block != "") & F.get_json_object(block, "$").isNotNull()
    cand = (F.when(valid1, cleaned)
            .when(valid2, block))
    keys = F.json_object_keys(cand)
    is_dict = keys.isNotNull() & (F.size(keys) > 0)
    present = F.lit(0)
    for f in EXPECTED_VISION_FIELDS:
        v = F.get_json_object(cand, "$." + f)
        ok = v.isNotNull() & ~v.isin("", "[]", "{}")
        present = present + F.when(ok, 1).otherwise(0)
    outcome = (F.when(raw == "", "empty")
               .when(cand.isNull(), "unparseable")
               .when(~is_dict, "not_dict")
               .when(present < MIN_REQUIRED_VISION_FIELDS,
                     "too_few_fields")
               .otherwise("valid"))
    return rows.select(
        "image_id", outcome.alias("outcome"),
        F.when(cand.isNotNull() & is_dict, present)
        .alias("present_fields"))


def vision_validate_sql() -> str:
    """DuckDB twin over a CTE rows_in (image_id, raw)."""
    fields = " + ".join(
        "CASE WHEN json_extract(cand, '$." + f + "') IS NOT NULL "
        "AND CAST(json_extract(cand, '$." + f + "') AS VARCHAR) "
        "NOT IN ('null', '\"\"', '[]', '{}') THEN 1 ELSE 0 END"
        for f in EXPECTED_VISION_FIELDS)
    return f"""
    b AS (SELECT image_id, coalesce(raw, '') AS raw,
                 regexp_replace(regexp_replace(trim(coalesce(raw,
                     '')), '^```(?:json)?{_WS}*', ''),
                     '{_WS}*```$', '') AS cleaned
          FROM rows_in),
    c AS (SELECT *, coalesce(regexp_extract(cleaned,
                 '(\\{{[\\s\\S]*\\}})', 1), '') AS block
          FROM b),
    d AS (SELECT *, CASE WHEN json_valid(cleaned) THEN cleaned
                         WHEN block <> '' AND json_valid(block)
                             THEN block END AS cand
          FROM c),
    e AS (SELECT *, CASE WHEN cand IS NOT NULL
                         AND json_valid(cand)
                         AND json_type(cand) = 'OBJECT'
                         AND len(json_keys(cand)) > 0
                         THEN true ELSE false END AS is_dict
          FROM d),
    g AS (SELECT *, CASE WHEN cand IS NOT NULL THEN {fields}
                    END AS present
          FROM e)
    SELECT image_id,
           CASE WHEN raw = '' THEN 'empty'
                WHEN cand IS NULL THEN 'unparseable'
                WHEN NOT is_dict THEN 'not_dict'
                WHEN present < {MIN_REQUIRED_VISION_FIELDS}
                    THEN 'too_few_fields'
                ELSE 'valid' END AS outcome,
           CASE WHEN cand IS NOT NULL AND is_dict THEN present END
               AS present_fields
    FROM g"""


# ---------------------------------------------------------------------------
# synthesized inputs


def synth_icon_images(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = (events.select((e % 40).alias("d"),
                          F.expr("(event_id div 40) % 8").cast("int")
                          .alias("i")).distinct())
    d, i = F.col("d"), F.col("i")
    w = (F.when(i % 4 == 0, 80).when(i % 4 == 1, 150)
         .when(i % 4 == 2, 400).otherwise(60)).cast("int")
    h = (F.when(i % 4 == 0, 80).when(i % 4 == 1, 90)
         .when(i % 4 == 2, 300).otherwise(180)).cast("int")
    page = F.when((d + i) % 9 == 8, F.lit(None).cast("int")) \
        .otherwise(((i % 3) + 1).cast("int"))
    cls_ = (F.when(i % 5 == 0, " decorative ")
            .when(i % 5 == 1, "DECORATIVE")
            .when(i % 5 == 2, "TECHNICAL_DIAGRAM")
            .otherwise(F.lit(None).cast("string")))
    return base.select(
        d.alias("doc_id"), (d * 10 + i).alias("image_id"),
        F.when(i % 2 == 0, "material").otherwise("non_material")
        .alias("bucket"),
        w.alias("width"), h.alias("height"),
        page.alias("page_number"), cls_.alias("classification"))


SYNTH_ICON_IMAGES_SQL = """
SELECT d AS doc_id, d * 10 + i AS image_id,
       CASE WHEN i % 2 = 0 THEN 'material'
            ELSE 'non_material' END AS bucket,
       CAST(CASE WHEN i % 4 = 0 THEN 80 WHEN i % 4 = 1 THEN 150
                 WHEN i % 4 = 2 THEN 400 ELSE 60 END AS INT) AS width,
       CAST(CASE WHEN i % 4 = 0 THEN 80 WHEN i % 4 = 1 THEN 90
                 WHEN i % 4 = 2 THEN 300 ELSE 180 END AS INT)
           AS height,
       CAST(CASE WHEN (d + i) % 9 = 8 THEN NULL
            ELSE (i % 3) + 1 END AS INT) AS page_number,
       CASE WHEN i % 5 = 0 THEN ' decorative '
            WHEN i % 5 = 1 THEN 'DECORATIVE'
            WHEN i % 5 = 2 THEN 'TECHNICAL_DIAGRAM' END
           AS classification
FROM (SELECT DISTINCT event_id % 40 AS d,
             CAST((event_id // 40) % 8 AS INT) AS i FROM events)"""


def synth_vision_raws(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    n = (e % 7).cast("string")
    full = F.concat(
        F.lit('{"material_type": "ceramic", "texture": "rough", '
              '"finish": "matte", "confidence": 0.'), n,
        F.lit(', "pattern": ", veined"}'))
    raw = (F.when(e % 8 == 0, full)
           .when(e % 8 == 1, F.concat(F.lit("```json\n"), full,
                                      F.lit("\n```")))
           .when(e % 8 == 2, F.concat(
               F.lit("Here is the analysis: "), full,
               F.lit(" hope that helps")))
           .when(e % 8 == 3, '{"material_type": "", "texture": null, '
                             '"color_palette": [], '
                             '"physical_properties": {}, '
                             '"finish": "gloss"}')
           .when(e % 8 == 4, "[1, 2, 3]")
           .when(e % 8 == 5, "no json at all")
           .when(e % 8 == 6, F.lit(None).cast("string"))
           .otherwise("```\n{not valid json}\n```"))
    return events.select(e.alias("image_id"), raw.alias("raw"))


SYNTH_VISION_RAWS_SQL = """
SELECT event_id AS image_id,
       CASE WHEN event_id % 8 = 0
                THEN '{"material_type": "ceramic", "texture": "rough", "finish": "matte", "confidence": 0.'
                     || (event_id % 7) || ', "pattern": ", veined"}'
            WHEN event_id % 8 = 1
                THEN '```json' || chr(10)
                     || '{"material_type": "ceramic", "texture": "rough", "finish": "matte", "confidence": 0.'
                     || (event_id % 7) || ', "pattern": ", veined"}'
                     || chr(10) || '```'
            WHEN event_id % 8 = 2
                THEN 'Here is the analysis: '
                     || '{"material_type": "ceramic", "texture": "rough", "finish": "matte", "confidence": 0.'
                     || (event_id % 7) || ', "pattern": ", veined"}'
                     || ' hope that helps'
            WHEN event_id % 8 = 3
                THEN '{"material_type": "", "texture": null, "color_palette": [], "physical_properties": {}, "finish": "gloss"}'
            WHEN event_id % 8 = 4 THEN '[1, 2, 3]'
            WHEN event_id % 8 = 5 THEN 'no json at all'
            WHEN event_id % 8 = 6 THEN NULL
            ELSE '```' || chr(10) || '{not valid json}' || chr(10)
                 || '```'
       END AS raw
FROM events"""
