"""XML-import stage progress mapping
(app/services/tracking/xml_import_stages.py).

The reference defines a fixed stage order and computes progress as
``int(index / (len(order) - 1) * 100)`` (:52-68); FAILED and unknown
stages report 0. Stage descriptions are a pinned display table
(:71-82). Pure projection — a when-chain over the stage column.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

XML_IMPORT_STAGE_ORDER = (
    "initialized", "products_parsed", "images_downloaded",
    "images_classified", "clips_generated", "chunks_created",
    "embeddings_queued", "completed")

XML_IMPORT_STAGE_DESCRIPTIONS = {
    "initialized": "Job initialized",
    "products_parsed": "Parsing XML and extracting products",
    "images_downloaded": "Downloading product images",
    "images_classified":
        "Classifying images (material vs non-material)",
    "clips_generated": "Generating SLIG embeddings for images",
    "chunks_created": "Creating text chunks with quality scoring",
    "embeddings_queued": "Queueing text embeddings for generation",
    "completed": "Import completed successfully",
    "failed": "Import failed",
}


def xml_import_progress(stage: Column) -> Column:
    """Progress %% for a stage column; failed/unknown → 0."""
    n = len(XML_IMPORT_STAGE_ORDER) - 1
    expr = F.lit(0)
    for i, s in enumerate(XML_IMPORT_STAGE_ORDER):
        pct = int(i / n * 100)
        expr = F.when(stage == s, F.lit(pct)).otherwise(expr)
    return expr.cast("int")


def xml_import_description(stage: Column) -> Column:
    expr = F.lit(None).cast("string")
    for s, d in XML_IMPORT_STAGE_DESCRIPTIONS.items():
        expr = F.when(stage == s, F.lit(d)).otherwise(expr)
    return expr
