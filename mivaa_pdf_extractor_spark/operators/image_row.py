"""document_images row-shaping fold
(app/services/core/supabase_client.py:393-645 ``save_single_image``).

The insert itself is out of scope; the row SHAPING is deterministic
and pinned here.  Semantics (file:line):

* URL ladder (:437-443): ``storage_url or public_url or url or
  path`` — LIVE falsy ladder ('' falls through); the row is SKIPPED
  when the resolved URL is falsy OR starts with 'placeholder_' (pin).
* Page (:459-466): ``get('page') or get('page_number')`` — a present
  page of 0 falls through to page_number (LIVE or — pin), and a falsy
  result defaults to 1.
* Caption ladder (:472-485): ``caption or description``; else the AI
  reason IF reason != 'Unknown' AND len(reason) > 10 (STRICT — a
  10-char reason fails the gate, pin), rendered
  ``"{classification.replace('_',' ').title()}: {reason}"`` with
  classification defaulting 'material'; else ``"Image from page
  {n}"``.
* Category ladder (:489-497): material_category > category >
  (is_material -> 'product') > 'general'; is_material comes from
  ``ai_classification.get('is_material', False)``.
* image_type (:501): AI classification ``or`` 'material_sample'
  (live or — '' falls through).
* ``confidence`` is HARDCODED 0.95 on every row (:538) regardless of
  the AI confidence (pin).
* Param-vs-image_info fallbacks are ASYMMETRIC (:553-560):
  ``layer or image_info.get('layer')`` is a falsy or (an explicit
  layer=0 falls through to image_info — pin) while
  ``captures_vector_graphics if ... is not None else ...`` and
  ``is_duplicate`` use is-not-None gates (an explicit False STICKS —
  pin); duplicate_of / perceptual_hash / vision_provider /
  vision_model are falsy ors.
* ``metadata.ai_classification`` is None when the dict is EMPTY
  (``if ai_classification else None`` — present-but-{} folds to
  None, pin); ``vision_guided`` sub-dict only when extraction_layer
  == 'vision_guided'; extraction_layer ``or 'embedded'``.
* bbox validation (:505-523): None stays None; a 4-element list with
  every value in [0, 1] INCLUSIVE passes; anything else (wrong
  length, out of range) folds to None rather than failing the insert
  (non-numeric values are likewise dropped — documented, not
  column-modelable).

Map-side projection — one when-chain per column, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HARDCODED_CONFIDENCE = 0.95


def _falsy_or(*cols):
    """LIVE `or` ladder over string columns ('' and NULL fall)."""
    out = F.lit(None).cast("string")
    acc = None
    for c in cols:
        cond = c.isNotNull() & (c != "")
        acc = F.when(cond, c) if acc is None else acc.when(cond, c)
    return acc.otherwise(out) if acc is not None else out


def save_image_row(infos: DataFrame) -> DataFrame:
    """infos columns: storage_url, public_url, url, path (nullable
    strings), page int nullable, page_number int nullable, caption,
    description, ai_present bool, ai_cls nullable, ai_reason nullable,
    ai_is_material bool, material_category, category (nullable),
    param_layer int nullable, info_layer int nullable, param_cvg bool
    nullable, info_cvg bool nullable, extraction_layer nullable."""
    image_url = _falsy_or(F.col("storage_url"), F.col("public_url"),
                          F.col("url"), F.col("path"))
    skipped = (image_url.isNull()
               | image_url.startswith("placeholder_"))
    page = F.col("page")
    page_number = F.col("page_number")
    pg = (F.when(page.isNotNull() & (page != 0), page)
          .when(page_number.isNotNull() & (page_number != 0),
                page_number)
          .otherwise(F.lit(1)))
    reason_ok = (F.col("ai_present") & F.col("ai_reason").isNotNull()
                 & (F.col("ai_reason") != "Unknown")
                 & (F.length("ai_reason") > 10))
    cls_for_caption = F.coalesce(F.col("ai_cls"), F.lit("material"))
    caption = (F.when(F.col("caption").isNotNull()
                      & (F.col("caption") != ""), F.col("caption"))
               .when(F.col("description").isNotNull()
                     & (F.col("description") != ""),
                     F.col("description"))
               .when(reason_ok,
                     F.concat(F.initcap(F.regexp_replace(
                         cls_for_caption, "_", " ")),
                         F.lit(": "), F.col("ai_reason")))
               .otherwise(F.concat(F.lit("Image from page "),
                                   pg.cast("string"))))
    is_material = F.col("ai_present") & F.col("ai_is_material")
    final_category = (
        F.when(F.col("material_category").isNotNull()
               & (F.col("material_category") != ""),
               F.col("material_category"))
        .when(F.col("category").isNotNull() & (F.col("category") != ""),
              F.col("category"))
        .when(is_material, "product").otherwise("general"))
    image_type = (F.when(F.col("ai_present")
                         & F.col("ai_cls").isNotNull()
                         & (F.col("ai_cls") != ""), F.col("ai_cls"))
                  .otherwise(F.lit("material_sample")))
    # falsy-or: param 0 falls through (pin)
    layer = (F.when(F.col("param_layer").isNotNull()
                    & (F.col("param_layer") != 0), F.col("param_layer"))
             .otherwise(F.col("info_layer")))
    # is-not-None: param False sticks (pin)
    cvg = F.when(F.col("param_cvg").isNotNull(), F.col("param_cvg")) \
        .otherwise(F.col("info_cvg"))
    ext_layer = (F.when(F.col("extraction_layer").isNotNull()
                        & (F.col("extraction_layer") != ""),
                        F.col("extraction_layer"))
                 .otherwise(F.lit("embedded")))
    return infos.select(
        "image_index",
        skipped.alias("skipped"),
        F.when(~skipped, image_url).alias("image_url"),
        pg.cast("int").alias("page_number_out"),
        caption.alias("caption_out"),
        final_category.alias("category_out"),
        image_type.alias("image_type"),
        F.lit(HARDCODED_CONFIDENCE).alias("confidence"),
        layer.cast("int").alias("layer_out"),
        cvg.alias("captures_vector_graphics_out"),
        ext_layer.alias("extraction_layer_out"),
        # empty ai dict -> NULL metadata block (pin)
        F.col("ai_present").alias("ai_metadata_emitted"),
        (ext_layer == "vision_guided").alias("vision_guided_emitted"))


def validate_bbox(boxes: DataFrame) -> DataFrame:
    """bbox gate (:505-523): exactly 4 elements, all in [0,1]
    inclusive; else NULL."""
    b = F.col("bbox")
    ok = (b.isNotNull() & (F.size(b) == 4)
          & (F.size(F.filter(b, lambda v: (v >= 0) & (v <= 1))) == 4))
    # contract boundary: arrays stringify asymmetrically through
    # pandas, so the kept bbox rides as an exact x2000 integer CSV
    csv = F.concat_ws(
        ",", F.transform(b, lambda v: F.round(v * 2000)
                         .cast("long").cast("string")))
    return boxes.select(
        "box_id", F.when(ok, csv).alias("validated_bbox"),
        ok.alias("bbox_kept"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_image_infos(events: DataFrame) -> DataFrame:
    e = F.col("event_id")

    def s(mod, base, empty_mod=None):
        c = F.concat(F.lit(base), (e % 97).cast("string"))
        expr = F.when(e % mod == 0, F.lit(None).cast("string"))
        if empty_mod is not None:
            expr = expr.when(e % empty_mod == 1, F.lit(""))
        return expr.otherwise(c)

    return events.select(
        e.cast("long").alias("image_index"),
        F.when(e % 4 == 0, F.lit(None).cast("string"))
        .when(e % 4 == 1, F.lit(""))
        .when(e % 17 == 2, F.concat(F.lit("placeholder_"),
                                    e.cast("string")))
        .otherwise(F.concat(F.lit("https://st/"), e.cast("string")))
        .alias("storage_url"),
        s(3, "https://pub/", empty_mod=5).alias("public_url"),
        s(5, "https://u/").alias("url"),
        s(7, "/tmp/p").alias("path"),
        F.when(e % 6 == 0, F.lit(None).cast("int"))
        .when(e % 6 == 1, F.lit(0)).otherwise((e % 40).cast("int"))
        .alias("page"),
        F.when(e % 8 == 0, F.lit(None).cast("int"))
        .otherwise((e % 30).cast("int")).alias("page_number"),
        s(9, "cap ", empty_mod=11).alias("caption"),
        s(10, "desc ").alias("description"),
        (e % 5 != 0).alias("ai_present"),
        F.when(e % 12 == 0, F.lit(None).cast("string"))
        .when(e % 12 == 1, F.lit(""))
        .when(e % 3 == 0, "material_closeup")
        .when(e % 3 == 1, "material_in_situ")
        .otherwise("non_material").alias("ai_cls"),
        F.when(e % 13 == 0, F.lit(None).cast("string"))
        .when(e % 13 == 1, "Unknown")
        .when(e % 13 == 2, F.lit("tenchars!!"))      # len == 10 fails
        .otherwise(F.concat(F.lit("a clear product shot "),
                            e.cast("string"))).alias("ai_reason"),
        (e % 2 == 0).alias("ai_is_material"),
        s(14, "tiles-", empty_mod=15).alias("material_category"),
        s(6, "certificate").alias("category"),
        F.when(e % 7 == 0, F.lit(None).cast("int"))
        .when(e % 7 == 1, F.lit(0)).otherwise((e % 4 + 1).cast("int"))
        .alias("param_layer"),
        ((e % 4) + 1).cast("int").alias("info_layer"),
        F.when(e % 9 == 0, F.lit(None).cast("boolean"))
        .when(e % 9 == 1, F.lit(False)).otherwise(F.lit(True))
        .alias("param_cvg"),
        (e % 2 == 1).alias("info_cvg"),
        F.when(e % 16 == 0, F.lit(None).cast("string"))
        .when(e % 16 == 1, F.lit(""))
        .when(e % 16 == 2, "vision_guided").otherwise("region_crop")
        .alias("extraction_layer"))


SYNTH_IMAGE_INFOS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS image_index,
           CASE WHEN event_id % 4 = 0 THEN NULL
                WHEN event_id % 4 = 1 THEN ''
                WHEN event_id % 17 = 2 THEN 'placeholder_'
                     || CAST(event_id AS VARCHAR)
                ELSE 'https://st/' || CAST(event_id AS VARCHAR) END
               AS storage_url,
           CASE WHEN event_id % 3 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'https://pub/' || CAST(event_id % 97 AS VARCHAR)
           END AS public_url,
           CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE 'https://u/' || CAST(event_id % 97 AS VARCHAR)
           END AS url,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE '/tmp/p' || CAST(event_id % 97 AS VARCHAR) END
               AS path,
           CASE WHEN event_id % 6 = 0 THEN NULL
                WHEN event_id % 6 = 1 THEN 0
                ELSE CAST(event_id % 40 AS INT) END AS page,
           CASE WHEN event_id % 8 = 0 THEN NULL
                ELSE CAST(event_id % 30 AS INT) END AS page_number,
           CASE WHEN event_id % 9 = 0 THEN NULL
                WHEN event_id % 11 = 1 THEN ''
                ELSE 'cap ' || CAST(event_id % 97 AS VARCHAR) END
               AS caption,
           CASE WHEN event_id % 10 = 0 THEN NULL
                ELSE 'desc ' || CAST(event_id % 97 AS VARCHAR) END
               AS description,
           event_id % 5 <> 0 AS ai_present,
           CASE WHEN event_id % 12 = 0 THEN NULL
                WHEN event_id % 12 = 1 THEN ''
                WHEN event_id % 3 = 0 THEN 'material_closeup'
                WHEN event_id % 3 = 1 THEN 'material_in_situ'
                ELSE 'non_material' END AS ai_cls,
           CASE WHEN event_id % 13 = 0 THEN NULL
                WHEN event_id % 13 = 1 THEN 'Unknown'
                WHEN event_id % 13 = 2 THEN 'tenchars!!'
                ELSE 'a clear product shot '
                     || CAST(event_id AS VARCHAR) END AS ai_reason,
           event_id % 2 = 0 AS ai_is_material,
           CASE WHEN event_id % 14 = 0 THEN NULL
                WHEN event_id % 15 = 1 THEN ''
                ELSE 'tiles-' || CAST(event_id % 97 AS VARCHAR) END
               AS material_category,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE 'certificate' || CAST(event_id % 97 AS VARCHAR)
           END AS category,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN 0
                ELSE CAST(event_id % 4 + 1 AS INT) END AS param_layer,
           CAST(event_id % 4 + 1 AS INT) AS info_layer,
           CASE WHEN event_id % 9 = 0 THEN NULL
                WHEN event_id % 9 = 1 THEN FALSE ELSE TRUE END
               AS param_cvg,
           event_id % 2 = 1 AS info_cvg,
           CASE WHEN event_id % 16 = 0 THEN NULL
                WHEN event_id % 16 = 1 THEN ''
                WHEN event_id % 16 = 2 THEN 'vision_guided'
                ELSE 'region_crop' END AS extraction_layer
    FROM events
"""


def save_image_row_sql() -> str:
    return f"""
        WITH i AS ({SYNTH_IMAGE_INFOS_SQL}),
        u AS (
          SELECT *,
                 CASE WHEN storage_url IS NOT NULL
                           AND storage_url <> '' THEN storage_url
                      WHEN public_url IS NOT NULL
                           AND public_url <> '' THEN public_url
                      WHEN url IS NOT NULL AND url <> '' THEN url
                      WHEN path IS NOT NULL AND path <> '' THEN path
                 END AS image_url_r,
                 CASE WHEN page IS NOT NULL AND page <> 0 THEN page
                      WHEN page_number IS NOT NULL
                           AND page_number <> 0 THEN page_number
                      ELSE 1 END AS pg,
                 ai_present AND ai_reason IS NOT NULL
                     AND ai_reason <> 'Unknown'
                     AND length(ai_reason) > 10 AS reason_ok,
                 CASE WHEN extraction_layer IS NOT NULL
                           AND extraction_layer <> ''
                      THEN extraction_layer ELSE 'embedded' END
                     AS ext_layer
          FROM i),
        v AS (
          SELECT *, image_url_r IS NULL
                    OR image_url_r LIKE 'placeholder\\_%' ESCAPE '\\'
                    AS skipped
          FROM u)
        SELECT image_index, skipped,
               CASE WHEN NOT skipped THEN image_url_r END
                   AS image_url,
               CAST(pg AS INT) AS page_number_out,
               CASE WHEN caption IS NOT NULL AND caption <> ''
                    THEN caption
                    WHEN description IS NOT NULL AND description <> ''
                    THEN description
                    WHEN reason_ok THEN
                      -- Python str.title() == initcap for alpha words
                      list_aggregate(list_transform(
                        string_split(replace(
                          coalesce(ai_cls, 'material'), '_', ' '),
                          ' '),
                        w -> upper(w[1]) || lower(w[2:])),
                        'string_agg', ' ')
                      || ': ' || ai_reason
                    ELSE 'Image from page ' || CAST(pg AS VARCHAR)
               END AS caption_out,
               CASE WHEN material_category IS NOT NULL
                         AND material_category <> ''
                    THEN material_category
                    WHEN category IS NOT NULL AND category <> ''
                    THEN category
                    WHEN ai_present AND ai_is_material THEN 'product'
                    ELSE 'general' END AS category_out,
               CASE WHEN ai_present AND ai_cls IS NOT NULL
                         AND ai_cls <> '' THEN ai_cls
                    ELSE 'material_sample' END AS image_type,
               {HARDCODED_CONFIDENCE} AS confidence,
               CAST(CASE WHEN param_layer IS NOT NULL
                         AND param_layer <> 0 THEN param_layer
                    ELSE info_layer END AS INT) AS layer_out,
               CASE WHEN param_cvg IS NOT NULL THEN param_cvg
                    ELSE info_cvg END AS captures_vector_graphics_out,
               ext_layer AS extraction_layer_out,
               ai_present AS ai_metadata_emitted,
               ext_layer = 'vision_guided' AS vision_guided_emitted
        FROM v
    """


def synth_bboxes(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    x = (e % 100).cast("double") / 100
    return events.select(
        e.cast("long").alias("box_id"),
        F.when(e % 7 == 0, F.lit(None).cast("array<double>"))
        .when(e % 7 == 1, F.array(x))                       # len 1
        .when(e % 7 == 2, F.array(x, x, x, x, x))           # len 5
        .when(e % 7 == 3, F.array(x, x, x, F.lit(1.5)))     # >1
        .when(e % 7 == 4, F.array(F.lit(-0.25), x, x, x))   # <0
        .when(e % 7 == 5, F.array(F.lit(0.0), F.lit(1.0), x, x))
        .otherwise(F.array(x, x / 2, x / 4, x / 5))
        .alias("bbox"))


SYNTH_BBOX_SQL = """
    SELECT CAST(event_id AS BIGINT) AS box_id,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN [x]
                WHEN event_id % 7 = 2 THEN [x, x, x, x, x]
                WHEN event_id % 7 = 3 THEN [x, x, x, 1.5]
                WHEN event_id % 7 = 4 THEN [-0.25, x, x, x]
                WHEN event_id % 7 = 5 THEN [0.0, 1.0, x, x]
                ELSE [x, x / 2, x / 4, x / 5] END AS bbox
    FROM (SELECT event_id,
                 CAST(event_id % 100 AS DOUBLE) / 100 AS x
          FROM events)
"""


def validate_bbox_sql() -> str:
    return f"""
        WITH b AS ({SYNTH_BBOX_SQL}),
        g AS (
          SELECT *, bbox IS NOT NULL AND len(bbox) = 4
                    AND len(list_filter(bbox,
                        v -> v >= 0 AND v <= 1)) = 4 AS ok
          FROM b)
        SELECT box_id,
               CASE WHEN ok THEN array_to_string(list_transform(
                    bbox, v -> CAST(CAST(round(v * 2000) AS BIGINT)
                                    AS VARCHAR)), ',') END
                   AS validated_bbox,
               ok AS bbox_kept
        FROM g
    """
