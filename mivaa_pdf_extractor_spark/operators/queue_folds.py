"""Async-queue and Claude-validation-queue folds
(app/services/core/async_queue_service.py,
app/services/ai_validation/claude_validation_service.py).

Deterministic row/rollup shaping of the reference's Supabase-backed job
queues (the DB round-trips and the vision call are out of scope):

* ``queue_job_plan`` — async_queue_service.py:23-106: queued job rows.
  IMAGE jobs (:42-52) carry ``max_retries: 3``; AI-ANALYSIS jobs
  (:88-97) DO NOT — the two insert shapes are asymmetric (pin). AI jobs
  carry ``analysis_type`` (default 'classification'); image jobs don't.
  ``image.get('id')`` / ``chunk.get('id')`` pass NULLs through.

* ``queue_retry_fold`` — :146-185 ``mark_job_failed``: target table is
  'image_processing_queue' iff queue_type == 'image', ANY other string
  routes to 'ai_analysis_queue' (pin); retry_count < 3 → status
  'pending', retry_count+1, error_message verbatim; else → 'failed',
  message prefixed 'Max retries exceeded: ', and the update dict does
  NOT touch retry_count — it stays at the old value (pin). The 3 is
  hardcoded, independent of any max_retries column.

* ``queue_metrics`` — :108-144: active_documents = COUNT(DISTINCT
  truthy document_id) over background_jobs in status 'processing'
  ('' and NULL both excluded — truthy gate, pin) + per-(queue, status)
  counts.

* ``validation_queue_stats`` — claude_validation_service.py:96-183:
  pending rows for a document ordered by priority (ties canonicalized
  by job id — the REST order is unspecified), batched by 10; progress
  logged after batch k = int((rows_done)/total*100) — int() truncation
  (pin). Per-doc rollup: total_images, n_batches, last progress value.

* ``validation_retry_fold`` — :259-287: retry_count+1 >= max_retries →
  'failed' else 'pending' (re-queue); both sides come through ABSENT-
  key .get defaults (0 / 3) — a present-NULL retry_count would raise
  TypeError in the reference and surface as a gather exception, so the
  fold models presence with has_* flags.

Scale: plan/retry/validation folds are map-side projections; metrics
and the per-doc stats are one groupBy each on natural keys (document /
queue+status) — map-side combinable counts, no wide rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

VALIDATION_BATCH = 10


def queue_job_plan(images: DataFrame, chunks: DataFrame,
                   analysis_type: str = "classification",
                   priority: int = 0) -> DataFrame:
    """async_queue_service.py:23-106 — one row per queued job."""
    img = images.select(
        F.col("document_id"), F.col("image_id").alias("item_id"),
        F.lit("image").alias("queue_type"),
        F.lit(None).cast("string").alias("analysis_type"),
        F.lit("pending").alias("status"),
        F.lit(priority).cast("int").alias("priority"),
        F.lit(0).alias("retry_count"),
        F.lit(3).cast("int").alias("max_retries"))
    ai = chunks.select(
        F.col("document_id"), F.col("chunk_id").alias("item_id"),
        F.lit("ai").alias("queue_type"),
        F.lit(analysis_type).alias("analysis_type"),
        F.lit("pending").alias("status"),
        F.lit(priority).cast("int").alias("priority"),
        F.lit(0).alias("retry_count"),
        F.lit(None).cast("int").alias("max_retries"))   # absent (pin)
    return img.unionByName(ai)


def queue_retry_fold(failures: DataFrame) -> DataFrame:
    """async_queue_service.py:146-185."""
    is_img = F.col("queue_type") == "image"
    retryable = F.col("retry_count") < 3
    return failures.select(
        "job_id",
        F.when(is_img, "image_processing_queue")
        .otherwise("ai_analysis_queue").alias("target_table"),
        F.when(retryable, "pending").otherwise("failed").alias("status"),
        F.when(retryable, F.col("retry_count") + 1)
        .otherwise(F.col("retry_count")).cast("int")
        .alias("new_retry_count"),
        F.when(retryable, F.col("error_message"))
        .otherwise(F.concat(F.lit("Max retries exceeded: "),
                            F.col("error_message")))
        .alias("error_message_out"))


def queue_metrics(queue_rows: DataFrame, jobs: DataFrame) -> DataFrame:
    """async_queue_service.py:108-144 — per-(queue,status) counts plus
    one 'active_documents' row (distinct truthy document_id of
    'processing' background jobs)."""
    counts = (queue_rows.groupBy("queue_type", "status")
              .agg(F.count("*").cast("long").alias("n")))
    active = (jobs.where((F.col("status") == "processing")
                         & F.col("document_id").isNotNull()
                         & (F.col("document_id") != ""))
              .agg(F.countDistinct("document_id").alias("n"))
              .select(F.lit("jobs").alias("queue_type"),
                      F.lit("active_documents").alias("status"),
                      F.col("n").cast("long")))
    return counts.unionByName(active)


def validation_queue_stats(queue: DataFrame,
                           batch_size: int = VALIDATION_BATCH
                           ) -> DataFrame:
    """claude_validation_service.py:96-183 — per-document batch plan +
    rollup over 'pending' rows."""
    pending = queue.where(F.col("status") == "pending")
    w = (Window.partitionBy("document_id")
         .orderBy(F.col("priority").asc(), F.col("job_id").asc()))
    ranked = pending.withColumn("rk", F.row_number().over(w) - 1)
    per_doc = (ranked.groupBy("document_id")
               .agg(F.count("*").cast("int").alias("total_images")))
    batches = (ranked
               .withColumn("batch_idx",
                           F.floor(F.col("rk") / batch_size)
                           .cast("int"))
               .groupBy("document_id", "batch_idx")
               .agg(F.count("*").alias("bn"),
                    F.max("rk").alias("last_rk")))
    # progress after each batch = int(rows_done / total * 100)
    prog = (batches.join(per_doc, "document_id")
            .withColumn("rows_done", F.col("last_rk") + 1)
            .withColumn("progress",
                        F.floor(F.col("rows_done") * 100
                                / F.col("total_images")).cast("int")))
    return (prog.groupBy("document_id")
            .agg(F.max("total_images").alias("total_images"),
                 (F.max("batch_idx") + 1).cast("int").alias("n_batches"),
                 F.max_by("progress", "batch_idx").alias("last_progress")))


def validation_retry_fold(jobs: DataFrame) -> DataFrame:
    """claude_validation_service.py:259-287 — ABSENT-key defaults."""
    rc = F.when(F.col("has_retry_count"), F.col("retry_count")) \
        .otherwise(F.lit(0))
    mr = F.when(F.col("has_max_retries"), F.col("max_retries")) \
        .otherwise(F.lit(3))
    nxt = rc + 1
    return jobs.select(
        "job_id", nxt.cast("int").alias("new_retry_count"),
        F.when(nxt >= mr, "failed").otherwise("pending").alias("status"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_queue_items(events: DataFrame):
    """(images, chunks) pair derived from events."""
    e = F.col("event_id")
    images = (events.where(e % 3 != 0)
              .select(F.concat(F.lit("doc-"), (e % 40)).alias(
                  "document_id"),
                  F.when(e % 7 == 0, F.lit(None).cast("string"))
                  .otherwise(F.concat(F.lit("img-"), e))
                  .alias("image_id")))
    chunks = (events.where(e % 3 == 0)
              .select(F.concat(F.lit("doc-"), (e % 40)).alias(
                  "document_id"),
                  F.when(e % 11 == 0, F.lit(None).cast("string"))
                  .otherwise(F.concat(F.lit("chk-"), e))
                  .alias("chunk_id")))
    return images, chunks


def synth_failures(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        F.concat(F.lit("job-"), e).alias("job_id"),
        F.when(e % 4 == 0, F.lit("image"))
        .when(e % 4 == 1, F.lit("ai"))
        .when(e % 4 == 2, F.lit("IMAGE"))      # ≠ 'image' → ai (pin)
        .otherwise(F.lit("other")).alias("queue_type"),
        (e % 6).cast("int").alias("retry_count"),
        F.concat(F.lit("err "), e % 9).alias("error_message"))


def synth_queue_state(events: DataFrame) -> DataFrame:
    """Rows standing in for both queue tables + background jobs."""
    e = F.col("event_id")
    return events.select(
        F.when(e % 2 == 0, "image").otherwise("ai").alias("queue_type"),
        F.when(e % 5 < 2, "pending").when(e % 5 == 2, "processing")
        .when(e % 5 == 3, "completed").otherwise("failed")
        .alias("status"))


def synth_bg_jobs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        F.when(e % 3 == 0, "processing").when(e % 3 == 1, "pending")
        .otherwise("completed").alias("status"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .when(e % 7 == 1, F.lit(""))             # falsy → excluded
        .otherwise(F.concat(F.lit("doc-"), e % 25))
        .alias("document_id"))


def synth_validation_queue(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        F.concat(F.lit("vjob-"), e).alias("job_id"),
        F.concat(F.lit("doc-"), (e % 12)).alias("document_id"),
        F.when(e % 9 == 0, "processing").otherwise("pending")
        .alias("status"),
        (e % 10 + 1).cast("int").alias("priority"))


def synth_validation_jobs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        F.concat(F.lit("vjob-"), e).alias("job_id"),
        (e % 3 != 0).alias("has_retry_count"),
        (e % 5).cast("int").alias("retry_count"),
        (e % 4 != 1).alias("has_max_retries"),
        (e % 6 + 1).cast("int").alias("max_retries"))


_SYNTH_IMAGES_SQL = """
    SELECT 'doc-' || CAST(event_id % 40 AS VARCHAR) AS document_id,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE 'img-' || CAST(event_id AS VARCHAR) END AS item_id
    FROM events WHERE event_id % 3 <> 0
"""

_SYNTH_CHUNKS_SQL = """
    SELECT 'doc-' || CAST(event_id % 40 AS VARCHAR) AS document_id,
           CASE WHEN event_id % 11 = 0 THEN NULL
                ELSE 'chk-' || CAST(event_id AS VARCHAR) END AS item_id
    FROM events WHERE event_id % 3 = 0
"""


def queue_plan_sql(analysis_type: str = "classification",
                   priority: int = 0) -> str:
    return f"""
        SELECT document_id, item_id, 'image' AS queue_type,
               CAST(NULL AS VARCHAR) AS analysis_type,
               'pending' AS status, {priority} AS priority,
               0 AS retry_count, CAST(3 AS INT) AS max_retries
        FROM ({_SYNTH_IMAGES_SQL})
        UNION ALL
        SELECT document_id, item_id, 'ai',
               '{analysis_type}', 'pending', {priority}, 0,
               CAST(NULL AS INT)
        FROM ({_SYNTH_CHUNKS_SQL})
    """


def queue_retry_sql() -> str:
    return """
        WITH f AS (
          SELECT 'job-' || CAST(event_id AS VARCHAR) AS job_id,
                 CASE event_id % 4 WHEN 0 THEN 'image'
                      WHEN 1 THEN 'ai' WHEN 2 THEN 'IMAGE'
                      ELSE 'other' END AS queue_type,
                 CAST(event_id % 6 AS INT) AS retry_count,
                 'err ' || CAST(event_id % 9 AS VARCHAR)
                     AS error_message
          FROM events
        )
        SELECT job_id,
               CASE WHEN queue_type = 'image'
                    THEN 'image_processing_queue'
                    ELSE 'ai_analysis_queue' END AS target_table,
               CASE WHEN retry_count < 3 THEN 'pending'
                    ELSE 'failed' END AS status,
               CAST(CASE WHEN retry_count < 3 THEN retry_count + 1
                    ELSE retry_count END AS INT) AS new_retry_count,
               CASE WHEN retry_count < 3 THEN error_message
                    ELSE 'Max retries exceeded: ' || error_message
               END AS error_message_out
        FROM f
    """


def queue_metrics_sql() -> str:
    return """
        WITH q AS (
          SELECT CASE WHEN event_id % 2 = 0 THEN 'image' ELSE 'ai' END
                     AS queue_type,
                 CASE WHEN event_id % 5 < 2 THEN 'pending'
                      WHEN event_id % 5 = 2 THEN 'processing'
                      WHEN event_id % 5 = 3 THEN 'completed'
                      ELSE 'failed' END AS status
          FROM events
        ), j AS (
          SELECT CASE event_id % 3 WHEN 0 THEN 'processing'
                      WHEN 1 THEN 'pending' ELSE 'completed' END
                     AS status,
                 CASE WHEN event_id % 7 = 0 THEN NULL
                      WHEN event_id % 7 = 1 THEN ''
                      ELSE 'doc-' || CAST(event_id % 25 AS VARCHAR)
                 END AS document_id
          FROM events
        )
        SELECT queue_type, status, CAST(count(*) AS BIGINT) AS n
        FROM q GROUP BY queue_type, status
        UNION ALL
        SELECT 'jobs', 'active_documents',
               CAST(count(DISTINCT document_id) AS BIGINT)
        FROM j
        WHERE status = 'processing' AND document_id IS NOT NULL
          AND document_id <> ''
    """


def validation_stats_sql(batch_size: int = VALIDATION_BATCH) -> str:
    return f"""
        WITH vq AS (
          SELECT 'vjob-' || CAST(event_id AS VARCHAR) AS job_id,
                 'doc-' || CAST(event_id % 12 AS VARCHAR)
                     AS document_id,
                 CASE WHEN event_id % 9 = 0 THEN 'processing'
                      ELSE 'pending' END AS status,
                 CAST(event_id % 10 + 1 AS INT) AS priority
          FROM events
        ), ranked AS (
          SELECT document_id,
                 row_number() OVER (PARTITION BY document_id
                     ORDER BY priority, job_id) - 1 AS rk
          FROM vq WHERE status = 'pending'
        ), per_doc AS (
          SELECT document_id, CAST(count(*) AS INT) AS total_images
          FROM ranked GROUP BY document_id
        ), batches AS (
          SELECT document_id, CAST(rk // {batch_size} AS INT)
                     AS batch_idx,
                 max(rk) + 1 AS rows_done
          FROM ranked GROUP BY document_id, CAST(rk // {batch_size}
                                                 AS INT)
        )
        SELECT b.document_id, max(p.total_images) AS total_images,
               CAST(max(b.batch_idx) + 1 AS INT) AS n_batches,
               CAST(max_by(CAST(floor(b.rows_done * 100
                        / p.total_images) AS INT), b.batch_idx)
                    AS INT) AS last_progress
        FROM batches b JOIN per_doc p USING (document_id)
        GROUP BY b.document_id
    """


def validation_retry_sql() -> str:
    return """
        WITH j AS (
          SELECT 'vjob-' || CAST(event_id AS VARCHAR) AS job_id,
                 event_id % 3 <> 0 AS has_retry_count,
                 CAST(event_id % 5 AS INT) AS retry_count,
                 event_id % 4 <> 1 AS has_max_retries,
                 CAST(event_id % 6 + 1 AS INT) AS max_retries
          FROM events
        )
        SELECT job_id,
               CAST((CASE WHEN has_retry_count THEN retry_count
                     ELSE 0 END) + 1 AS INT) AS new_retry_count,
               CASE WHEN (CASE WHEN has_retry_count THEN retry_count
                          ELSE 0 END) + 1
                         >= (CASE WHEN has_max_retries THEN max_retries
                             ELSE 3 END)
                    THEN 'failed' ELSE 'pending' END AS status
        FROM j
    """
