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

SPREAD_ASPECT = 1.4
SINGLE_ASPECT = 1.2
FULL_SPREAD_WIDTH_FRAC = 0.75
FULL_SPREAD_HEIGHT_FRAC = 0.50
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
