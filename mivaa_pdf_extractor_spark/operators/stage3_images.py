"""Stage 3 image post-processing folds: spread-aware physical-page
assignment, the Phase-3 OCR gate ladder, and the catalog-wide icon
stats rollup.

Reference: ``app/api/pdf_processing/stage_3_images.py`` —

- ``_get_pdf_index_for_physical_page`` (:49-71): spread docs resolve
  a physical page through ``catalog.physical_to_pdf_map``; everything
  else is the plain 1-based -> 0-based conversion.
- ``process_product_images`` (:152-343) assigns every extracted image
  to a PHYSICAL page:
  * a bbox is *valid* only when it is a sequence of >=3 with
    ``bbox[2] > 0 or bbox[0] > 0`` (:243-249) — an all-zero x/w bbox
    is treated as missing even when y is set;
  * audit fix #28 (:251-263): x and w are INDEPENDENTLY interpreted —
    a component already in [0, 1] is taken as normalized, anything
    else is divided by ``max(sheet_width, 1)``; a mixed bbox
    (normalized x, point w) therefore normalizes only one side;
  * scene detection (:266-276): an image whose point-space span
    straddles ``mid = sheet_width/2`` AND whose width exceeds
    ``0.45 * sheet_width`` is a spread-wide scene — assigned to the
    LEFT physical page with ``physical_side='spread'``;
  * otherwise left/right by ``center_x < mid_x`` (center exactly on
    the gutter goes RIGHT);
  * no-bbox fallback (:289-343): images whose filename carries
    ``_region_(\\d+)`` consult the layout regions — the LEFT page's
    regions must have a truthy bbox AND ``coalesce(x + width/2, 0) <
    mid`` (a bbox without an x attribute scores center 0 and wins the
    left page — pinned), while the RIGHT page's regions only need a
    truthy bbox (no center check — pinned asymmetry; the region index
    captured from the filename is discarded, :306);
  * images still unassigned alternate left/right by their 0-based
    position among the sheet's no-bbox images (region-assisted images
    CONSUME a parity slot, :337-341);
  * non-spread sheets (or a spread sheet carrying a single requested
    physical page) send every image to ``sheet_physical_pages[0]``
    with no side/flags (:344-348).
- ``_run_phase_3_ocr_for_product`` (:685-880): the text-bearing OCR
  gate — ``extraction_layer`` defaults to 'embedded' when falsy
  (:750); ``full_render`` skips as 'full_render_dup_of_stage_1_5';
  ``region_crop`` of upper-cased region_type in {IMAGE, FIGURE,
  PHOTO} skips as 'photo_not_text_bearing' (unknown/absent region
  types OCR conservatively); ``embedded`` skips ONLY on an explicit
  ``text_detected is False`` ('embedded_no_text_detected' — None /
  missing OCRs conservatively); unknown layers OCR. Surviving rows
  without a local path skip as 'local_path_unavailable' (:795-810).
  OCR outcomes: an exception marks ocr_failed with attempts=1
  (:829-836); a None result bills attempts=0, a 'paddleocr_failed'
  method keeps the result's attempts (:845-852); success stores
  ``text or None`` (empty -> NULL) and ``blocks or []`` (:861-866).
- ``process_catalog_wide_icons`` (:889-1139): supplementary-page icon
  pre-pass — ``_physical_for`` (:978-982) maps a supplementary PDF
  sheet to ``min(physical pages)`` via the inverted spread map, else
  ``pdf_idx + 1``; stats fold: a raised icon increments ONLY
  icon_extraction_failed; a processed icon with a truthy error
  increments failed (its metadata count is ignored — elif, :1124);
  metadata_extracted needs no error AND >=1 spec item.

Everything is bounded per sheet / per image, so the folds are native
Column logic: one co-keyed images<->sheets join, two broadcastable
per-page region aggregates, and one window for the fallback parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SCENE_WIDTH_FRAC = 0.45          # :275
PHOTO_REGIONS = ("IMAGE", "FIGURE", "PHOTO")   # :770


# ──────────────────────────────────────────────────────────────────
# A. Spread-aware physical-page assignment
# ──────────────────────────────────────────────────────────────────

def assign_image_pages(images: DataFrame, sheets: DataFrame,
                       regions: DataFrame) -> DataFrame:
    """``images``: one row per extracted image (doc long, pdf_idx int,
    img_idx int, bbox_x/bbox_y/bbox_w double?, filename string?).
    A NULL bbox_x models a missing bbox. ``sheets``: per (doc,
    pdf_idx) sheet meta (sheet_width double, spread_pair boolean,
    left_phys int, right_phys int, single_phys int). ``regions``:
    layout regions (doc, phys_page, has_bbox boolean, x double?,
    width double). Returns the page assignment with the reference's
    side / scene / fallback markers."""
    # per-physical-page region aggregates: the left-page check needs
    # EXISTS(region with bbox AND coalesce(x + w/2, 0) < mid); since
    # mid is a sheet constant, min(center) is sufficient.
    reg = (regions.where(F.col("has_bbox"))
           .groupBy("doc", "phys_page")
           .agg(F.min(F.coalesce(F.col("x") + F.col("width") / 2,
                                 F.lit(0.0))).alias("min_center"),
                F.lit(True).alias("has_region")))

    j = images.join(sheets, ["doc", "pdf_idx"])
    sw = F.col("sheet_width")
    mid = sw / 2

    valid = (F.col("bbox_x").isNotNull()
             & ((F.col("bbox_w") > 0) | (F.col("bbox_x") > 0)))
    # audit fix #28: per-component normalized-vs-points heuristic
    norm_x = F.when((F.col("bbox_x") >= 0.0) & (F.col("bbox_x") <= 1.0),
                    F.col("bbox_x")) \
        .otherwise(F.col("bbox_x") / F.greatest(sw, F.lit(1.0)))
    norm_w = F.when((F.col("bbox_w") >= 0.0) & (F.col("bbox_w") <= 1.0),
                    F.col("bbox_w")) \
        .otherwise(F.col("bbox_w") / F.greatest(sw, F.lit(1.0)))
    x_pts = norm_x * sw
    w_pts = norm_w * sw
    center = x_pts + w_pts / 2
    spans = (x_pts < mid) & (x_pts + w_pts > mid)
    is_scene = spans & (w_pts > sw * SCENE_WIDTH_FRAC)

    # 0-based position among the sheet's no-bbox images (parity slots
    # are consumed by region-assisted images too)
    w_sheet = (Window.partitionBy("doc", "pdf_idx").orderBy("img_idx")
               .rowsBetween(Window.unboundedPreceding, 0))
    fb_idx = (F.sum(F.when(~valid, 1).otherwise(0)).over(w_sheet) - 1)

    fname = F.coalesce(F.col("filename"), F.lit(""))
    is_region_file = fname.rlike("_region_[0-9]")

    j = (j.join(reg.select(F.col("doc"),
                           F.col("phys_page").alias("left_phys"),
                           F.col("min_center").alias("l_min_center"),
                           F.col("has_region").alias("l_has")),
                ["doc", "left_phys"], "left")
         .join(reg.select(F.col("doc"),
                          F.col("phys_page").alias("right_phys"),
                          F.col("has_region").alias("r_has")),
               ["doc", "right_phys"], "left")
         .withColumn("fb_idx", fb_idx))

    assigned_left = (F.coalesce(F.col("l_has"), F.lit(False))
                     & (F.col("l_min_center") < mid))
    assigned_right = F.coalesce(F.col("r_has"), F.lit(False))
    parity_left = F.col("fb_idx") % 2 == 0

    pair = F.col("spread_pair")
    page = (
        F.when(~pair, F.col("single_phys"))
        .when(valid & is_scene, F.col("left_phys"))
        .when(valid, F.when(center < mid, F.col("left_phys"))
              .otherwise(F.col("right_phys")))
        .when(is_region_file & assigned_left, F.col("left_phys"))
        .when(is_region_file & assigned_right, F.col("right_phys"))
        .when(parity_left, F.col("left_phys"))
        .otherwise(F.col("right_phys")))
    side = (
        F.when(~pair, F.lit(None).cast("string"))
        .when(valid & is_scene, F.lit("spread"))
        .when(valid, F.when(center < mid, F.lit("left"))
              .otherwise(F.lit("right")))
        .when(is_region_file & assigned_left, F.lit("left"))
        .when(is_region_file & assigned_right, F.lit("right"))
        .when(parity_left, F.lit("left"))
        .otherwise(F.lit("right")))
    region_assisted = (pair & ~valid & is_region_file
                       & (assigned_left | assigned_right))
    return j.select(
        "doc", "pdf_idx", "img_idx",
        page.cast("int").alias("page_number"),
        side.alias("physical_side"),
        (pair & valid & is_scene).alias("is_scene"),
        region_assisted.alias("region_assisted"),
        (pair & ~valid & ~region_assisted).alias("bbox_fallback"))


# ──────────────────────────────────────────────────────────────────
# B. Phase-3 OCR gate ladder
# ──────────────────────────────────────────────────────────────────

def _gate_cols(rows: DataFrame) -> DataFrame:
    layer = F.when(F.col("extraction_layer").isNull()
                   | (F.col("extraction_layer") == ""),
                   F.lit("embedded")).otherwise(F.col("extraction_layer"))
    rtype = F.upper(F.coalesce(F.col("region_type"), F.lit("")))
    reason = (
        F.when(layer == "full_render",
               F.lit("full_render_dup_of_stage_1_5"))
        .when((layer == "region_crop") & rtype.isin(*PHOTO_REGIONS),
              F.lit("photo_not_text_bearing"))
        .when((layer == "embedded")
              & F.col("text_detected").isNotNull()
              & ~F.col("text_detected"),
              F.lit("embedded_no_text_detected")))
    reason = F.when(reason.isNotNull(), reason) \
        .when(~F.col("has_local_path"), F.lit("local_path_unavailable"))
    return rows.withColumn("skipped_reason", reason)


def phase3_ocr_gate(rows: DataFrame) -> DataFrame:
    """``rows``: one row per saved product image (doc long, image_id
    long, extraction_layer string?, region_type string?,
    text_detected boolean? TRI-STATE, has_local_path boolean,
    ocr_exception boolean, ocr_result_null boolean, ocr_method
    string, attempts_made int, text string?, blocks_count int?).
    Returns the per-image OCR outcome with the reference's skip
    reasons and attempt accounting."""
    g = _gate_cols(rows)
    skipped = F.col("skipped_reason").isNotNull()
    failed = (F.col("ocr_exception") | F.col("ocr_result_null")
              | (F.col("ocr_method") == "paddleocr_failed"))
    status = (F.when(skipped, F.lit("skipped"))
              .when(failed, F.lit("failed"))
              .otherwise(F.lit("succeeded")))
    attempts = (
        F.when(skipped, F.lit(None).cast("int"))
        .when(F.col("ocr_exception"), F.lit(1))
        .when(F.col("ocr_result_null"), F.lit(0))
        .otherwise(F.col("attempts_made")))
    text = F.when(~skipped & ~failed,
                  F.nullif(F.col("text"), F.lit("")))
    blocks = F.when(~skipped & ~failed,
                    F.coalesce(F.col("blocks_count"), F.lit(0)))
    return g.select(
        "doc", "image_id", status.alias("status"),
        "skipped_reason",
        attempts.alias("ocr_attempts"),
        text.alias("ocr_text"),
        blocks.cast("int").alias("ocr_blocks_count"))


def phase3_ocr_summary(rows: DataFrame) -> DataFrame:
    """Per-product summary counts (:868-878)."""
    o = phase3_ocr_gate(rows)
    return o.groupBy("doc").agg(
        F.sum(F.when(F.col("status") != "skipped", 1).otherwise(0))
        .cast("int").alias("ocr_attempted"),
        F.sum(F.when(F.col("status") == "succeeded", 1).otherwise(0))
        .cast("int").alias("ocr_succeeded"),
        F.sum(F.when(F.col("status") == "failed", 1).otherwise(0))
        .cast("int").alias("ocr_failed"),
        F.sum(F.when(F.col("status") == "skipped", 1).otherwise(0))
        .cast("int").alias("ocr_skipped"),
        F.count(F.lit(1)).cast("int").alias("total_rows"))


# ──────────────────────────────────────────────────────────────────
# C. Catalog-wide icon stats rollup
# ──────────────────────────────────────────────────────────────────

def catalog_icon_stats(pages: DataFrame, icons: DataFrame) -> DataFrame:
    """``pages``: one row per (doc, supplementary pdf_idx) with
    (has_spread boolean, in_spread_map boolean, extract_failed
    boolean, n_images int). ``icons``: one row per icon candidate
    (doc, raised boolean, err boolean, metadata_count int) — already
    gated on classification success upstream. Returns the per-doc
    stats dict of ``process_catalog_wide_icons`` plus the min/max
    physical page stamped on extracted images (pins _physical_for's
    inverted-map-min vs pdf_idx+1 branches)."""
    phys = F.when(F.col("has_spread") & F.col("in_spread_map"),
                  F.col("pdf_idx") * 2 + 1) \
        .otherwise(F.col("pdf_idx") + 1)
    live = F.when(~F.col("extract_failed"), F.col("n_images")) \
        .otherwise(F.lit(0))
    p = pages.groupBy("doc").agg(
        F.count(F.lit(1)).cast("int")
        .alias("supplementary_pages_scanned"),
        F.sum(live).cast("int").alias("images_extracted"),
        F.min(F.when(live > 0, phys)).cast("int")
        .alias("min_image_phys"),
        F.max(F.when(live > 0, phys)).cast("int")
        .alias("max_image_phys"))
    i = icons.groupBy("doc").agg(
        F.count(F.lit(1)).cast("int").alias("icon_candidates_found"),
        F.sum(F.when(~F.col("raised"), 1).otherwise(0)).cast("int")
        .alias("icons_processed"),
        F.sum(F.when(~F.col("raised") & ~F.col("err")
                     & (F.col("metadata_count") > 0), 1).otherwise(0))
        .cast("int").alias("icon_metadata_extracted"),
        F.sum(F.when(F.col("raised") | F.col("err"), 1).otherwise(0))
        .cast("int").alias("icon_extraction_failed"))
    out = p.join(i, "doc", "left")
    return out.select(
        "doc", "supplementary_pages_scanned", "images_extracted",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in (
            "icon_candidates_found", "icons_processed",
            "icon_metadata_extracted", "icon_extraction_failed")],
        "min_image_phys", "max_image_phys")


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

def synth_sheets(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = d.select("doc", F.explode(F.array(
        F.lit(0), F.lit(1))).alias("pdf_idx"))
    spread = F.col("doc") % 3 == 0
    pair = spread & (F.col("pdf_idx") == 0)
    return rows.select(
        "doc", F.col("pdf_idx").cast("int").alias("pdf_idx"),
        (F.lit(400.0) + (F.col("doc") % 5) * 100)
        .alias("sheet_width"),
        pair.alias("spread_pair"),
        F.lit(1).alias("left_phys"), F.lit(2).alias("right_phys"),
        F.when(spread & (F.col("pdf_idx") == 1), F.lit(3))
        .otherwise(F.col("pdf_idx") + 1).cast("int")
        .alias("single_phys"))


def synth_images(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = d.select(
        "doc",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("pdf_idx")) \
        .select("doc", "pdf_idx", F.explode(F.sequence(
            F.lit(0), F.lit(5))).alias("img_idx"))
    g = F.col("doc") * 131 + F.col("pdf_idx") * 17 + F.col("img_idx")
    c = g % 6
    x = (F.when(c == 0, F.lit(None).cast("double"))
         .when(c == 1, F.lit(0.0))
         .when(c == 2, 30.0 + (g % 350))
         .when(c == 3, (g % 10) / 10.0)
         .when(c == 4, 20.0 + (g % 300))
         .otherwise((g % 10) / 10.0))
    w = (F.when(c == 0, F.lit(None).cast("double"))
         .when((c == 1) | (c == 2), F.lit(0.0))
         .when(c == 3, ((g % 5) + 1) / 10.0)
         .when(c == 4, 15.0 + (g % 240))
         .otherwise(10.0 + (g % 200)))
    m = g % 4
    fname = (
        F.when(c > 1, F.concat(F.lit("img_"), g.cast("string")))
        .when(m == 0, F.concat(F.lit("page_"),
                               (F.col("pdf_idx") + 1).cast("string"),
                               F.lit("_region_"),
                               (g % 9).cast("string")))
        .when(m == 1, F.lit("scan_region_x"))
        .when(m == 2, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("img_"), g.cast("string"))))
    return rows.select(
        "doc", F.col("pdf_idx").cast("int").alias("pdf_idx"),
        F.col("img_idx").cast("int").alias("img_idx"),
        x.alias("bbox_x"),
        F.when(c == 0, F.lit(None).cast("double"))
        .otherwise(F.lit(0.25)).alias("bbox_y"),
        w.alias("bbox_w"), fname.alias("filename"))


def synth_regions(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = d.select("doc", F.explode(F.array(
        F.lit(1), F.lit(2), F.lit(3))).alias("phys_page")) \
        .select("doc", "phys_page", F.explode(F.sequence(
            F.lit(0), F.lit(2))).alias("region_idx"))
    r = (F.col("doc") * 53 + F.col("phys_page") * 7
         + F.col("region_idx"))
    return rows.where(r % 4 != 0).select(
        "doc", F.col("phys_page").cast("int").alias("phys_page"),
        (r % 5 != 0).alias("has_bbox"),
        F.when(r % 3 == 0, F.lit(None).cast("double"))
        .otherwise((r % 16) * 30.0).alias("x"),
        F.lit(40.0).alias("width"))


def synth_ocr_rows(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = d.select("doc", F.explode(F.sequence(
        F.lit(1), F.lit(6))).alias("i"))
    g = F.col("doc") * 71 + F.col("i")
    layer = F.element_at(F.array(
        F.lit("embedded"), F.lit("region_crop"), F.lit("full_render"),
        F.lit("vision_guided"), F.lit(None).cast("string"),
        F.lit("")), (g % 6 + 1).cast("int"))
    rtype = F.element_at(F.array(
        F.lit("TABLE"), F.lit("TEXT"), F.lit("Title"), F.lit("image"),
        F.lit("FIGURE"), F.lit("PHOTO"), F.lit("CHART"),
        F.lit(None).cast("string")), (g % 8 + 1).cast("int"))
    td = (F.when(g % 3 == 0, F.lit(True))
          .when(g % 3 == 1, F.lit(False))
          .otherwise(F.lit(None).cast("boolean")))
    return rows.select(
        "doc", (F.col("doc") * 100 + F.col("i")).alias("image_id"),
        layer.alias("extraction_layer"), rtype.alias("region_type"),
        td.alias("text_detected"),
        (g % 7 != 0).alias("has_local_path"),
        (g % 11 == 0).alias("ocr_exception"),
        (g % 11 == 1).alias("ocr_result_null"),
        F.when(g % 11 == 2, F.lit("paddleocr_failed"))
        .otherwise(F.lit("paddleocr")).alias("ocr_method"),
        (g % 3 + 1).cast("int").alias("attempts_made"),
        F.when(g % 13 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("txt"), g.cast("string")))
        .alias("text"),
        F.when(g % 9 == 0, F.lit(None).cast("int"))
        .otherwise((g % 4).cast("int")).alias("blocks_count"))


def synth_icon_pages(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    n = F.when(F.col("doc") % 5 == 0, F.lit(0)) \
        .otherwise(F.col("doc") % 4 + 1)
    rows = (d.withColumn("n", n).where(F.col("n") > 0)
            .select("doc", F.explode(F.sequence(
                F.lit(0), F.col("n") - 1)).alias("j")))
    h = F.col("doc") * 61 + F.col("j")
    return rows.select(
        "doc", (F.col("j") + 10).cast("int").alias("pdf_idx"),
        (F.col("doc") % 3 == 0).alias("has_spread"),
        (F.col("j") + 10 <= 11).alias("in_spread_map"),
        (h % 6 == 0).alias("extract_failed"),
        (h % 3 + 1).cast("int").alias("n_images"))


def synth_icon_candidates(docs) -> DataFrame:
    pages = synth_icon_pages(docs).where(
        ~F.col("extract_failed") & (F.col("doc") % 7 != 0))
    imgs = pages.select(
        "doc", (F.col("pdf_idx") - 10).alias("j"),
        F.explode(F.sequence(F.lit(0), F.col("n_images") - 1))
        .alias("k"))
    h2 = F.col("doc") * 89 + F.col("j") * 13 + F.col("k")
    return imgs.where(h2 % 3 == 0).select(
        "doc",
        (h2 % 5 == 0).alias("raised"),
        (h2 % 5 == 1).alias("err"),
        (h2 % 4).cast("int").alias("metadata_count"))


_DUCK_COMMON = """
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents)"""

DUCK_ASSIGN_SQL = _DUCK_COMMON + """,
s3sheet AS (
  SELECT doc, CAST(p AS INT) AS pdf_idx,
         400.0 + (doc % 5) * 100 AS sheet_width,
         doc % 3 = 0 AND p = 0 AS spread_pair,
         1 AS left_phys, 2 AS right_phys,
         CAST(CASE WHEN doc % 3 = 0 AND p = 1 THEN 3
                   ELSE p + 1 END AS INT) AS single_phys
  FROM docs, (SELECT unnest([0, 1]) AS p)),
s3img AS (
  SELECT doc, CAST(p AS INT) AS pdf_idx, CAST(i AS INT) AS img_idx,
         doc*131 + p*17 + i AS g
  FROM docs, (SELECT unnest([0, 1]) AS p),
       (SELECT unnest(generate_series(0, 5)) AS i)),
s3img2 AS (
  SELECT doc, pdf_idx, img_idx,
         CASE g % 6 WHEN 0 THEN NULL WHEN 1 THEN 0.0
                    WHEN 2 THEN 30.0 + (g % 350)
                    WHEN 3 THEN (g % 10) / 10.0
                    WHEN 4 THEN 20.0 + (g % 300)
                    ELSE (g % 10) / 10.0 END AS bbox_x,
         CASE WHEN g % 6 = 0 THEN NULL
              WHEN g % 6 IN (1, 2) THEN 0.0
              WHEN g % 6 = 3 THEN ((g % 5) + 1) / 10.0
              WHEN g % 6 = 4 THEN 15.0 + (g % 240)
              ELSE 10.0 + (g % 200) END AS bbox_w,
         CASE WHEN g % 6 > 1 THEN 'img_' || g
              WHEN g % 4 = 0 THEN 'page_' || (pdf_idx + 1)
                                 || '_region_' || (g % 9)
              WHEN g % 4 = 1 THEN 'scan_region_x'
              WHEN g % 4 = 2 THEN NULL
              ELSE 'img_' || g END AS filename
  FROM s3img),
s3reg AS (
  SELECT doc, CAST(ph AS INT) AS phys_page,
         (doc*53 + ph*7 + ri) % 5 != 0 AS has_bbox,
         CASE WHEN (doc*53 + ph*7 + ri) % 3 = 0 THEN NULL
              ELSE ((doc*53 + ph*7 + ri) % 16) * 30.0 END AS x,
         40.0 AS width
  FROM docs, (SELECT unnest([1, 2, 3]) AS ph),
       (SELECT unnest([0, 1, 2]) AS ri)
  WHERE (doc*53 + ph*7 + ri) % 4 != 0),
s3rega AS (
  SELECT doc, phys_page,
         min(COALESCE(x + width/2, 0.0)) AS min_center,
         TRUE AS has_region
  FROM s3reg WHERE has_bbox GROUP BY doc, phys_page),
s3j AS (
  SELECT i.*, s.sheet_width, s.spread_pair, s.left_phys,
         s.right_phys, s.single_phys,
         i.bbox_x IS NOT NULL
           AND (i.bbox_w > 0 OR i.bbox_x > 0) AS valid,
         CASE WHEN i.bbox_x BETWEEN 0.0 AND 1.0 THEN i.bbox_x
              ELSE i.bbox_x / GREATEST(s.sheet_width, 1.0)
         END * s.sheet_width AS x_pts,
         CASE WHEN i.bbox_w BETWEEN 0.0 AND 1.0 THEN i.bbox_w
              ELSE i.bbox_w / GREATEST(s.sheet_width, 1.0)
         END * s.sheet_width AS w_pts,
         s.sheet_width / 2 AS mid,
         regexp_matches(COALESCE(i.filename, ''),
                        '_region_[0-9]') AS is_region_file,
         SUM(CASE WHEN i.bbox_x IS NOT NULL
                   AND (i.bbox_w > 0 OR i.bbox_x > 0)
              THEN 0 ELSE 1 END) OVER (
           PARTITION BY i.doc, i.pdf_idx ORDER BY i.img_idx
           ROWS UNBOUNDED PRECEDING) - 1 AS fb_idx
  FROM s3img2 i JOIN s3sheet s USING (doc, pdf_idx)),
s3k AS (
  SELECT j.*,
         j.x_pts + j.w_pts/2 AS center,
         j.x_pts < j.mid AND j.x_pts + j.w_pts > j.mid
           AND j.w_pts > j.sheet_width * 0.45 AS is_scene,
         COALESCE(l.has_region, FALSE)
           AND l.min_center < j.mid AS a_left,
         COALESCE(r.has_region, FALSE) AS a_right
  FROM s3j j
  LEFT JOIN s3rega l ON l.doc = j.doc AND l.phys_page = j.left_phys
  LEFT JOIN s3rega r ON r.doc = j.doc
                     AND r.phys_page = j.right_phys),
s3assign AS (
  SELECT doc, pdf_idx, img_idx,
         CAST(CASE
           WHEN NOT spread_pair THEN single_phys
           WHEN valid AND is_scene THEN left_phys
           WHEN valid THEN CASE WHEN center < mid THEN left_phys
                                ELSE right_phys END
           WHEN is_region_file AND a_left THEN left_phys
           WHEN is_region_file AND a_right THEN right_phys
           WHEN fb_idx % 2 = 0 THEN left_phys
           ELSE right_phys END AS INT) AS page_number,
         CASE
           WHEN NOT spread_pair THEN NULL
           WHEN valid AND is_scene THEN 'spread'
           WHEN valid THEN CASE WHEN center < mid THEN 'left'
                                ELSE 'right' END
           WHEN is_region_file AND a_left THEN 'left'
           WHEN is_region_file AND a_right THEN 'right'
           WHEN fb_idx % 2 = 0 THEN 'left'
           ELSE 'right' END AS physical_side,
         spread_pair AND valid AND is_scene AS is_scene,
         spread_pair AND NOT valid AND is_region_file
           AND (a_left OR a_right) AS region_assisted,
         spread_pair AND NOT valid
           AND NOT (is_region_file AND (a_left OR a_right))
           AS bbox_fallback
  FROM s3k)"""

DUCK_OCR_GATE_SQL = _DUCK_COMMON + """,
s3ocr AS (
  SELECT doc, doc*100 + i AS image_id, doc*71 + i AS g,
         (['embedded', 'region_crop', 'full_render', 'vision_guided',
           NULL, ''])[CAST((doc*71 + i) % 6 AS INT) + 1]
           AS extraction_layer,
         (['TABLE', 'TEXT', 'Title', 'image', 'FIGURE', 'PHOTO',
           'CHART', NULL])[CAST((doc*71 + i) % 8 AS INT) + 1]
           AS region_type,
         CASE (doc*71 + i) % 3 WHEN 0 THEN TRUE WHEN 1 THEN FALSE
           END AS text_detected,
         (doc*71 + i) % 7 != 0 AS has_local_path,
         (doc*71 + i) % 11 = 0 AS ocr_exception,
         (doc*71 + i) % 11 = 1 AS ocr_result_null,
         CASE WHEN (doc*71 + i) % 11 = 2 THEN 'paddleocr_failed'
              ELSE 'paddleocr' END AS ocr_method,
         CAST((doc*71 + i) % 3 + 1 AS INT) AS attempts_made,
         CASE WHEN (doc*71 + i) % 13 = 0 THEN ''
              ELSE 'txt' || (doc*71 + i) END AS txt,
         CASE WHEN (doc*71 + i) % 9 = 0 THEN NULL
              ELSE CAST((doc*71 + i) % 4 AS INT) END AS blocks_count
  FROM docs, (SELECT unnest(generate_series(1, 6)) AS i)),
s3gate AS (
  SELECT *,
    COALESCE(
      CASE
        WHEN COALESCE(NULLIF(extraction_layer, ''), 'embedded')
             = 'full_render' THEN 'full_render_dup_of_stage_1_5'
        WHEN COALESCE(NULLIF(extraction_layer, ''), 'embedded')
             = 'region_crop'
             AND UPPER(COALESCE(region_type, ''))
                 IN ('IMAGE', 'FIGURE', 'PHOTO')
          THEN 'photo_not_text_bearing'
        WHEN COALESCE(NULLIF(extraction_layer, ''), 'embedded')
             = 'embedded' AND text_detected = FALSE
          THEN 'embedded_no_text_detected' END,
      CASE WHEN NOT has_local_path
           THEN 'local_path_unavailable' END) AS skipped_reason
  FROM s3ocr),
s3out AS (
  SELECT doc, image_id,
         CASE WHEN skipped_reason IS NOT NULL THEN 'skipped'
              WHEN ocr_exception OR ocr_result_null
                   OR ocr_method = 'paddleocr_failed' THEN 'failed'
              ELSE 'succeeded' END AS status,
         skipped_reason,
         CAST(CASE WHEN skipped_reason IS NOT NULL THEN NULL
                   WHEN ocr_exception THEN 1
                   WHEN ocr_result_null THEN 0
                   ELSE attempts_made END AS INT) AS ocr_attempts,
         CASE WHEN skipped_reason IS NULL AND NOT (
                ocr_exception OR ocr_result_null
                OR ocr_method = 'paddleocr_failed')
              THEN NULLIF(txt, '') END AS ocr_text,
         CAST(CASE WHEN skipped_reason IS NULL AND NOT (
                ocr_exception OR ocr_result_null
                OR ocr_method = 'paddleocr_failed')
              THEN COALESCE(blocks_count, 0) END AS INT)
           AS ocr_blocks_count
  FROM s3gate),
s3sum AS (
  SELECT doc,
    CAST(SUM(CASE WHEN status != 'skipped' THEN 1 ELSE 0 END)
         AS INT) AS ocr_attempted,
    CAST(SUM(CASE WHEN status = 'succeeded' THEN 1 ELSE 0 END)
         AS INT) AS ocr_succeeded,
    CAST(SUM(CASE WHEN status = 'failed' THEN 1 ELSE 0 END)
         AS INT) AS ocr_failed,
    CAST(SUM(CASE WHEN status = 'skipped' THEN 1 ELSE 0 END)
         AS INT) AS ocr_skipped,
    CAST(COUNT(*) AS INT) AS total_rows
  FROM s3out GROUP BY doc)"""

DUCK_ICON_STATS_SQL = _DUCK_COMMON + """,
s3ipage AS (
  SELECT doc, CAST(j + 10 AS INT) AS pdf_idx, j,
         doc % 3 = 0 AS has_spread,
         j + 10 <= 11 AS in_spread_map,
         (doc*61 + j) % 6 = 0 AS extract_failed,
         CAST((doc*61 + j) % 3 + 1 AS INT) AS n_images
  FROM (SELECT doc, CASE WHEN doc % 5 = 0 THEN 0
                         ELSE doc % 4 + 1 END AS n FROM docs),
       LATERAL (SELECT unnest(generate_series(0, CAST(n AS INT) - 1))
                AS j)
  WHERE n > 0),
s3icand AS (
  SELECT p.doc,
         (p.doc*89 + p.j*13 + k) % 5 = 0 AS raised,
         (p.doc*89 + p.j*13 + k) % 5 = 1 AS err,
         CAST((p.doc*89 + p.j*13 + k) % 4 AS INT) AS metadata_count
  FROM s3ipage p,
       LATERAL (SELECT unnest(generate_series(0, p.n_images - 1))
                AS k)
  WHERE NOT p.extract_failed AND p.doc % 7 != 0
    AND (p.doc*89 + p.j*13 + k) % 3 = 0),
s3pagg AS (
  SELECT doc, CAST(COUNT(*) AS INT) AS supplementary_pages_scanned,
         CAST(SUM(CASE WHEN extract_failed THEN 0
                       ELSE n_images END) AS INT)
           AS images_extracted,
         CAST(MIN(CASE WHEN NOT extract_failed AND n_images > 0
               THEN CASE WHEN has_spread AND in_spread_map
                         THEN pdf_idx*2 + 1 ELSE pdf_idx + 1 END
               END) AS INT) AS min_image_phys,
         CAST(MAX(CASE WHEN NOT extract_failed AND n_images > 0
               THEN CASE WHEN has_spread AND in_spread_map
                         THEN pdf_idx*2 + 1 ELSE pdf_idx + 1 END
               END) AS INT) AS max_image_phys
  FROM s3ipage GROUP BY doc),
s3iagg AS (
  SELECT doc, CAST(COUNT(*) AS INT) AS icon_candidates_found,
         CAST(SUM(CASE WHEN NOT raised THEN 1 ELSE 0 END) AS INT)
           AS icons_processed,
         CAST(SUM(CASE WHEN NOT raised AND NOT err
                        AND metadata_count > 0
                  THEN 1 ELSE 0 END) AS INT)
           AS icon_metadata_extracted,
         CAST(SUM(CASE WHEN raised OR err THEN 1 ELSE 0 END) AS INT)
           AS icon_extraction_failed
  FROM s3icand GROUP BY doc),
s3istats AS (
  SELECT p.doc, p.supplementary_pages_scanned, p.images_extracted,
         COALESCE(i.icon_candidates_found, 0)
           AS icon_candidates_found,
         COALESCE(i.icons_processed, 0) AS icons_processed,
         COALESCE(i.icon_metadata_extracted, 0)
           AS icon_metadata_extracted,
         COALESCE(i.icon_extraction_failed, 0)
           AS icon_extraction_failed,
         p.min_image_phys, p.max_image_phys
  FROM s3pagg p LEFT JOIN s3iagg i USING (doc))"""
