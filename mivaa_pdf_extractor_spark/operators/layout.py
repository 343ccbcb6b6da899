"""Sheet-layout operators (SURVEY.md §2.2 L1/L2) — pure native columns.

L1 spread detection models the reference's ``analyze_pdf_layout``
(app/utils/pdf_to_images.py:163-279): per PDF sheet, aspect = width/height;
aspect > 1.4 -> SPREAD (two physical pages), aspect < 1.2 -> SINGLE,
1.2..1.4 ambiguous -> SINGLE (the reference logs a warning and keeps
SINGLE); a running physical-page counter assigns each sheet its first
physical page number.

L2 full-spread-image detection models ``detect_full_spread_image``
(pdf_to_images.py:103-158): an image covering >=75% of sheet width AND
>=50% of sheet height means the spread must NOT be split; vector drawings
>=75% width with <200 chars of text on the sheet count too.

Both are whole-stage-codegen column expressions — the per-sheet layout is a
projection and the page counter one window cumsum, so the operator scales
linearly and shuffles only on doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..core.constants import (FULL_SPREAD_HEIGHT_FRAC,
                              FULL_SPREAD_WIDTH_FRAC,
                              PDF_POINTS_TO_PIXEL_ZOOM, SINGLE_ASPECT,
                              SPREAD_ASPECT)

VECTOR_TEXT_CHARS_MAX = 200


def sheet_layout_type(width: Column, height: Column) -> Column:
    """L1 per-sheet classification. Ambiguous aspects (1.2..1.4) resolve to
    'single' exactly like the reference's conservative default."""
    aspect = width / height
    return (F.when(aspect > SPREAD_ASPECT, F.lit("spread"))
            .otherwise(F.lit("single")))


def analyze_sheet_layout(sheets: DataFrame,
                         doc_col: str = "doc_id",
                         sheet_col: str = "sheet_idx",
                         width_col: str = "width",
                         height_col: str = "height") -> DataFrame:
    """L1: per-sheet layout type + 1-based first physical page number.

    Input: one row per PDF sheet ``(doc_id, sheet_idx, width, height)``.
    Output adds ``layout_type``, ``n_physical`` (1 or 2) and
    ``first_physical_page`` (running counter in sheet order, 1-based) —
    the Spark form of the reference's ``physical_to_pdf_map``.
    """
    lt = sheet_layout_type(F.col(width_col), F.col(height_col))
    n_phys = F.when(lt == "spread", F.lit(2)).otherwise(F.lit(1))
    w = (Window.partitionBy(doc_col).orderBy(sheet_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (sheets
            .withColumn("layout_type", lt)
            .withColumn("n_physical", n_phys)
            .withColumn(
                "first_physical_page",
                (F.coalesce(F.sum("n_physical").over(w), F.lit(0)) + 1)
                .cast("int")))


def clip_bounds(position: Column, width: Column) -> tuple[Column, Column]:
    """L3 half-page clip x-range for a physical page ``position``
    (stage_1_layout_precompute.py:124-141 ``_clip_rect_for_position``):
    left -> [0, width/2], right -> [width/2, width], full -> [0, width]."""
    mid = width / 2.0
    x0 = F.when(position == "right", mid).otherwise(F.lit(0.0))
    x1 = F.when(position == "left", mid).otherwise(width)
    return x0, x1


def spans_in_clip(spans: DataFrame, sheets: DataFrame,
                  doc_col: str = "doc_id",
                  sheet_col: str = "sheet_idx") -> DataFrame:
    """L5 span extraction in clip (stage_1_layout_precompute.py:198-234
    ``_pymupdf_spans_in_clip``), fully native:

    - ``sheets`` is `analyze_sheet_layout` output (layout_type,
      first_physical_page, width, height); broadcast — per-doc sheet counts
      are tiny next to span counts.
    - each spread sheet becomes two physical pages (left/right); single
      sheets pass through unclipped ('full'), exactly like the reference's
      clip=None path (no bounds test at all).
    - a span is kept for a half unless ENTIRELY outside its clip — so spans
      straddling the gutter appear on BOTH physical pages, as in the
      reference.
    - output coordinates are clip-local 250-DPI pixels: x = int((x0 -
      clip.x0) * zoom), w = int(max(1, x1 - x0) * zoom) — int() truncation
      via cast.

    Input spans: (doc_col, sheet_col, x0, y0, x1, y1, text).
    Output: (doc_col, physical_page, position, x, y, w, h, text).
    """
    z = F.lit(PDF_POINTS_TO_PIXEL_ZOOM)
    sh = F.broadcast(sheets.select(
        doc_col, sheet_col, "width", "height", "layout_type",
        "first_physical_page"))
    j = spans.join(sh, [doc_col, sheet_col])
    halves = (F.when(F.col("layout_type") == "spread",
                     F.array(F.lit("left"), F.lit("right")))
              .otherwise(F.array(F.lit("full"))))
    e = j.select("*", F.explode(halves).alias("position"))
    cx0, cx1 = clip_bounds(F.col("position"), F.col("width"))
    outside = ((F.col("x1") < cx0) | (F.col("x0") > cx1)
               | (F.col("y1") < F.lit(0.0)) | (F.col("y0") > F.col("height")))
    kept = e.filter((F.trim(F.col("text")) != "")
                    & ((F.col("position") == "full") | ~outside))
    return kept.select(
        F.col(doc_col),
        (F.col("first_physical_page")
         + F.when(F.col("position") == "right", 1).otherwise(0))
        .cast("int").alias("physical_page"),
        "position",
        ((F.col("x0") - cx0) * z).cast("int").alias("x"),
        ((F.col("y0") - F.lit(0.0)) * z).cast("int").alias("y"),
        (F.greatest(F.col("x1") - F.col("x0"), F.lit(1.0)) * z)
        .cast("int").alias("w"),
        (F.greatest(F.col("y1") - F.col("y0"), F.lit(1.0)) * z)
        .cast("int").alias("h"),
        F.trim(F.col("text")).alias("text"))


def normalize_regions(regions: DataFrame,
                      doc_col: str = "doc_id",
                      page_col: str = "page") -> DataFrame:
    """L7 region normalize (paddleocr_pipeline.py:140-176
    ``parse_parse_response``), fully native:

    - pixel bbox -> 0..1 via the page's width/height, with the reference's
      ``or 1.0`` fallback (NULL or 0 divides by 1.0 instead);
    - clamp each coordinate to [0, 1], THEN order-correct inverted boxes
      (x0<x1, y0<y1 via least/greatest of the clamped pair);
    - regions with a missing or non-4-element bbox are skipped, never
      guessed;
    - NULL/empty labels become 'text'; NULL content becomes '';
    - ``region_rank`` is the reading order: sort by ``order`` (stable on
      the input position ``pos``), with NULL order defaulting to the
      region's index among KEPT regions, like the reference's
      ``len(out)`` default.

    Input: (doc_col, page_col, pos, width, height, bbox array<double>,
    label, content, order). Output adds nx0..ny1 + region_rank.
    """
    kept = regions.filter(F.col("bbox").isNotNull()
                          & (F.size("bbox") == 4))
    w_in = (Window.partitionBy(doc_col, page_col)
            .orderBy("pos"))
    kept = kept.withColumn(
        "order",
        F.coalesce(F.col("order"),
                   F.row_number().over(w_in) - F.lit(1)))
    wdiv = F.when(F.col("width").isNull() | (F.col("width") == 0),
                  F.lit(1.0)).otherwise(F.col("width"))
    hdiv = F.when(F.col("height").isNull() | (F.col("height") == 0),
                  F.lit(1.0)).otherwise(F.col("height"))

    def clamp(c):
        return F.least(F.greatest(c, F.lit(0.0)), F.lit(1.0))

    cx0 = clamp(F.col("bbox").getItem(0) / wdiv)
    cy0 = clamp(F.col("bbox").getItem(1) / hdiv)
    cx1 = clamp(F.col("bbox").getItem(2) / wdiv)
    cy1 = clamp(F.col("bbox").getItem(3) / hdiv)
    w_rank = (Window.partitionBy(doc_col, page_col)
              .orderBy("order", "pos"))
    return kept.select(
        F.col(doc_col), F.col(page_col),
        F.when(F.col("label").isNull() | (F.col("label") == ""),
               F.lit("text")).otherwise(F.col("label")).alias("label"),
        F.least(cx0, cx1).alias("nx0"), F.least(cy0, cy1).alias("ny0"),
        F.greatest(cx0, cx1).alias("nx1"), F.greatest(cy0, cy1).alias("ny1"),
        F.coalesce(F.col("content"), F.lit("")).alias("content"),
        F.row_number().over(w_rank).alias("region_rank"))


def is_full_spread_image(img_w: Column, img_h: Column,
                         sheet_w: Column, sheet_h: Column,
                         sheet_text_chars: Column,
                         is_vector: Column) -> Column:
    """L2: True when a spread sheet must not be split in half."""
    wide = img_w >= sheet_w * FULL_SPREAD_WIDTH_FRAC
    tall = img_h >= sheet_h * FULL_SPREAD_HEIGHT_FRAC
    vector_full = (is_vector & wide
                   & (sheet_text_chars < VECTOR_TEXT_CHARS_MAX))
    return (wide & tall) | vector_full
