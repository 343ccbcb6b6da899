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


# ---------------------------------------------------------------------------
# Import-job status shaping (app/api/data_import_routes.py:131-196)
# ---------------------------------------------------------------------------

def import_job_status(jobs) -> "DataFrame":
    """data_import_routes.py pins:

    - progress = int(processed/total*100) TRUNCATED, 0 when total is
      0 (pin);
    - estimated_time_remaining = (total - processed) * 2 seconds ONLY
      while status == 'processing' AND total > 0 — completed/failed
      jobs carry NULL even mid-count (pin);
    - failed_products absent-key default 0.
    """
    from pyspark.sql import functions as F
    total = F.col("total_products")
    proc = F.col("processed_products")
    progress = F.when(total > 0,
                      F.floor(proc * 100 / total)).otherwise(0)
    est = F.when((F.col("status") == "processing") & (total > 0),
                 (total - proc) * 2)
    return jobs.select(
        "job_id", "status",
        progress.cast("int").alias("progress_percentage"),
        est.cast("int").alias("estimated_time_remaining"),
        F.coalesce(F.col("failed_products"), F.lit(0)).cast("int")
        .alias("failed_products_out"))


def synth_import_jobs(events) -> "DataFrame":
    from pyspark.sql import functions as F
    e = F.col("event_id")
    return events.select(
        F.concat(F.lit("ij"), e.cast("string")).alias("job_id"),
        F.when(e % 4 == 0, "processing").when(e % 4 == 1, "completed")
        .when(e % 4 == 2, "failed").otherwise("pending")
        .alias("status"),
        F.when(e % 7 == 0, F.lit(0)).otherwise((e % 900).cast("int"))
        .alias("total_products"),
        (e % 500).cast("int").alias("processed_products"),
        F.when(e % 9 == 0, F.lit(None).cast("int"))
        .otherwise((e % 30).cast("int")).alias("failed_products"))


SYNTH_IMPORT_JOBS_SQL = """
    SELECT 'ij' || CAST(event_id AS VARCHAR) AS job_id,
           CASE event_id % 4 WHEN 0 THEN 'processing'
                WHEN 1 THEN 'completed' WHEN 2 THEN 'failed'
                ELSE 'pending' END AS status,
           CAST(CASE WHEN event_id % 7 = 0 THEN 0
                ELSE event_id % 900 END AS INT) AS total_products,
           CAST(event_id % 500 AS INT) AS processed_products,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE CAST(event_id % 30 AS INT) END
               AS failed_products
    FROM events
"""


def import_status_sql() -> str:
    return f"""
        WITH j AS ({SYNTH_IMPORT_JOBS_SQL})
        SELECT job_id, status,
               CAST(CASE WHEN total_products > 0
                    THEN (processed_products * 100)
                         // total_products
                    ELSE 0 END AS INT) AS progress_percentage,
               CAST(CASE WHEN status = 'processing'
                         AND total_products > 0
                    THEN (total_products - processed_products) * 2
               END AS INT) AS estimated_time_remaining,
               CAST(coalesce(failed_products, 0) AS INT)
                   AS failed_products_out
        FROM j
    """
