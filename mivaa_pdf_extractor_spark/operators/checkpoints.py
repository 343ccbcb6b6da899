"""Checkpoint recovery audit — stage-history validation as batch joins.

`app/services/tracking/checkpoint_recovery_service.py` resumes jobs from
their last stage_history entry, but only after verifying the checkpoint
still matches the catalog (`verify_checkpoint_data`, :415-572) — a
checkpoint claiming chunks that were since deleted must not be resumed
from. The reference verifies one job at a time with per-id REST reads;
at fleet scale this is one batch plan: explode the claimed id arrays,
join the catalog once, aggregate per job.

Reproduced rules:

- **Last checkpoint** (`get_last_checkpoint`, :266-291): the most recent
  stage_history entry per job (highest sequence number).
- **Resume eligibility** (`can_resume_from_checkpoint`, :315-338): a
  created_at must exist, be at most 24 h old, and the stage must be a
  known ProcessingStage — an unknown stage cannot be resumed.
- **Per-stage audit** (`verify_checkpoint_data`):
  - ``warmup_started``: the endpoint list must be non-empty (:436-442);
  - ``warmup_complete``: invalid only when 0 endpoints are ready AND
    failures exist (:444-461);
  - ``chunks_created``: zero-chunk checkpoints are valid (focused
    extraction); id-less checkpoints fall back to a by-document
    existence check; id-carrying checkpoints need EVERY id present
    (:463-505);
  - ``text_embeddings_generated``: like chunks, but against the
    embedding-carrying rows and with the reference's explicit **10%
    missing tolerance** (``found >= 0.9 * expected``, :540-543);
  - ``images_extracted``: an empty image list is valid; otherwise the
    count must match exactly (:546-560);
  - every other stage carries no data contract and audits valid
    (the reference falls through to ``return True``).

Timestamps are modeled as epoch seconds (the reference parses ISO
strings; the age arithmetic is identical and epoch avoids cross-engine
timestamp-parsing drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: checkpoint_recovery_service.py:27-44
PROCESSING_STAGES = (
    "initialized", "warmup_started", "warmup_complete",
    "pdf_pages_numbered", "pdf_extracted", "chunks_created",
    "text_embeddings_generated", "images_extracted",
    "image_embeddings_generated", "products_detected", "products_created",
    "relationships_created", "document_entities_created",
    "metadata_extracted", "completed")

#: :543 — the explicit embeddings tolerance.
EMBEDDING_MISSING_TOLERANCE = 0.9

#: :325 — resume window.
MAX_RESUME_AGE_HOURS = 24


def last_checkpoints(history: DataFrame) -> DataFrame:
    """Most recent stage_history entry per job (highest seq)."""
    w = Window.partitionBy("job_id").orderBy(F.col("seq").desc())
    return (history.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def resume_eligibility(last: DataFrame,
                       now_epoch: float) -> DataFrame:
    """can_resume_from_checkpoint (:315-338) over the last checkpoints."""
    age_ok = (F.col("created_at").isNotNull()
              & ((F.lit(now_epoch) - F.col("created_at"))
                 <= F.lit(MAX_RESUME_AGE_HOURS * 3600.0)))
    known = F.col("stage").isin(*PROCESSING_STAGES)
    can = age_ok & known
    return last.select(
        "job_id", "stage", "created_at",
        can.alias("can_resume"),
        F.when(can, F.col("stage")).alias("resume_stage"),
        F.when(F.col("created_at").isNull(), F.lit("no_checkpoint"))
         .when(~age_ok, F.lit("too_old"))
         .when(~known, F.lit("unknown_stage"))
         .alias("refusal_reason"))


def _claimed_counts(last: DataFrame, ids_col: str, catalog: DataFrame,
                    cat_key: str, out: str,
                    cat_filter=None) -> DataFrame:
    """Per job: how many claimed ids exist in the catalog."""
    claimed = (last.select("job_id", F.explode(ids_col).alias("__id")))
    cat = catalog if cat_filter is None else catalog.filter(cat_filter)
    found = (claimed.join(cat.select(F.col(cat_key).alias("__id"))
                          .distinct(), "__id")
             .groupBy("job_id").agg(F.count("*").alias(out)))
    return found


def audit_checkpoints(last: DataFrame, chunks: DataFrame,
                      images: DataFrame) -> DataFrame:
    """verify_checkpoint_data (:415-572) as one batch plan.

    Args:
        last: last checkpoints with columns (job_id, stage, chunk_ids
            array, image_ids array, chunks_created, document_id,
            endpoints_to_warmup array, total_ready, endpoints_failed
            array).
        chunks: (chunk_id, document_id, has_embedding boolean).
        images: (image_id,).

    Returns (job_id, stage, valid, reason).
    """
    # persist the per-job last checkpoints: the three claimed-count
    # probes and the final join each re-ran the dedup window over the
    # full history otherwise (job-count-bounded rows — scale-safe pin)
    from ..core.cache import track
    last = track(last)
    chunk_found = _claimed_counts(last, "chunk_ids", chunks, "chunk_id",
                                  "n_chunks_found")
    emb_found = _claimed_counts(last, "chunk_ids", chunks, "chunk_id",
                                "n_emb_found",
                                cat_filter=F.col("has_embedding"))
    img_found = _claimed_counts(last, "image_ids", images, "image_id",
                                "n_img_found")
    by_doc = (chunks.groupBy("document_id")
              .agg(F.count("*").alias("n_doc_chunks"),
                   F.sum(F.when(F.col("has_embedding"), 1).otherwise(0))
                    .alias("n_doc_embs")))

    j = (last
         .join(chunk_found, "job_id", "left")
         .join(emb_found, "job_id", "left")
         .join(img_found, "job_id", "left")
         .join(by_doc.withColumnRenamed("document_id", "__doc"),
               F.col("document_id") == F.col("__doc"), "left"))

    n_chunk_ids = F.size(F.coalesce(F.col("chunk_ids"),
                                    F.array().cast("array<string>")))
    n_image_ids = F.size(F.coalesce(F.col("image_ids"),
                                    F.array().cast("array<string>")))
    chunks_found = F.coalesce(F.col("n_chunks_found"), F.lit(0))
    embs_found = F.coalesce(F.col("n_emb_found"), F.lit(0))
    imgs_found = F.coalesce(F.col("n_img_found"), F.lit(0))
    doc_chunks = F.coalesce(F.col("n_doc_chunks"), F.lit(0))
    doc_embs = F.coalesce(F.col("n_doc_embs"), F.lit(0))
    has_doc = F.col("document_id").isNotNull()

    chunks_valid = (
        F.when((F.col("chunks_created") == 0) & (n_chunk_ids == 0),
               F.lit("valid_no_chunks"))
        .when((n_chunk_ids == 0) & has_doc,
              F.when(doc_chunks > 0, F.lit("valid_by_document"))
               .otherwise(F.lit("invalid_no_doc_chunks")))
        .when(n_chunk_ids == 0, F.lit("invalid_no_ids"))
        .when(chunks_found == n_chunk_ids, F.lit("valid_ids"))
        .otherwise(F.lit("invalid_count_mismatch")))

    emb_valid = (
        F.when((n_chunk_ids == 0) & has_doc,
               F.when((doc_embs > 0) | (F.col("chunks_created") == 0),
                      F.lit("valid_by_document"))
                .otherwise(F.lit("invalid_no_doc_embeddings")))
        .when(n_chunk_ids == 0, F.lit("invalid_no_ids"))
        .when(embs_found.cast("double")
              >= n_chunk_ids.cast("double")
              * F.lit(EMBEDDING_MISSING_TOLERANCE),
              F.lit("valid_ids"))
        .otherwise(F.lit("invalid_too_many_missing")))

    images_valid = (
        F.when(n_image_ids == 0, F.lit("valid_no_images"))
        .when(imgs_found == n_image_ids, F.lit("valid_ids"))
        .otherwise(F.lit("invalid_count_mismatch")))

    warmup_started_valid = F.when(
        F.size(F.coalesce(F.col("endpoints_to_warmup"),
                          F.array().cast("array<string>"))) > 0,
        F.lit("valid")).otherwise(F.lit("invalid_no_endpoints"))
    warmup_complete_valid = F.when(
        (F.coalesce(F.col("total_ready"), F.lit(0)) == 0)
        & (F.size(F.coalesce(F.col("endpoints_failed"),
                             F.array().cast("array<string>"))) > 0),
        F.lit("invalid_nothing_ready")).otherwise(F.lit("valid"))

    reason = (
        F.when(F.col("stage") == "warmup_started", warmup_started_valid)
        .when(F.col("stage") == "warmup_complete", warmup_complete_valid)
        .when(F.col("stage") == "chunks_created", chunks_valid)
        .when(F.col("stage") == "text_embeddings_generated", emb_valid)
        .when(F.col("stage") == "images_extracted", images_valid)
        .otherwise(F.lit("valid_no_data_contract")))

    return j.select("job_id", "stage", reason.alias("reason"),
                    reason.startswith("valid").alias("valid"))


# ---------------------------------------------------------------------------
# Stage-5 completion shaping (app/api/pdf_processing/stage_5_quality.py)
# ---------------------------------------------------------------------------

def stage5_result_shape(runs: "DataFrame") -> "DataFrame":
    """stage_5_quality.py pins:

    - a Claude circuit-breaker-open validation folds to
      {validated: 0, avg_improvement: 0} instead of failing the stage
      (:78-81);
    - pages_skipped = |[1..total_pages] \\ physical_pages| (:104);
    - SPN-7 ordering (:108-137): the COMPLETED checkpoint is created
      FIRST; the job is marked completed ONLY when products OR chunks
      OR images > 0 — an all-zero run leaves the checkpoint
      validation owning the terminal FAILED status (completed would
      have flip-flopped it — pin).
    """
    from pyspark.sql import functions as F
    validated = F.when(F.col("breaker_open"), F.lit(0)) \
        .otherwise(F.col("validated"))
    skipped = F.size(F.array_except(
        F.sequence(F.lit(1), F.col("total_pages")),
        F.col("physical_pages")))
    nonzero = ((F.col("products_created") > 0)
               | (F.col("chunks_created") > 0)
               | (F.col("images_processed") > 0))
    return runs.select(
        "job_id", validated.cast("int").alias("claude_validations"),
        F.size("physical_pages").alias("pages_processed"),
        skipped.cast("int").alias("pages_skipped"),
        F.lit(True).alias("checkpoint_created_first"),
        nonzero.alias("marked_completed"))


def synth_stage5_runs(events: "DataFrame") -> "DataFrame":
    from pyspark.sql import functions as F
    e = F.col("event_id")
    total = (e % 12 + 2).cast("int")
    return (events.where(e % 7 == 0).select(
        F.concat(F.lit("job"), e.cast("string")).alias("job_id"),
        (e % 5 == 0).alias("breaker_open"),
        (e % 9).cast("int").alias("validated"),
        total.alias("total_pages"),
        F.filter(F.sequence(F.lit(1), total),
                 lambda p: (p + e) % 3 != 0).alias("physical_pages"),
        F.when(e % 4 == 0, 0).otherwise((e % 6).cast("int"))
        .alias("products_created"),
        F.when(e % 4 == 0, 0).otherwise((e % 11).cast("int"))
        .alias("chunks_created"),
        F.when(e % 4 == 0, 0).otherwise((e % 3).cast("int"))
        .alias("images_processed")))


SYNTH_STAGE5_SQL = """
    SELECT 'job' || CAST(event_id AS VARCHAR) AS job_id,
           event_id % 5 = 0 AS breaker_open,
           CAST(event_id % 9 AS INT) AS validated,
           CAST(event_id % 12 + 2 AS INT) AS total_pages,
           list_filter(generate_series(1, event_id % 12 + 2),
                       p -> (p + event_id) % 3 <> 0)
               AS physical_pages,
           CAST(CASE WHEN event_id % 4 = 0 THEN 0
                ELSE event_id % 6 END AS INT) AS products_created,
           CAST(CASE WHEN event_id % 4 = 0 THEN 0
                ELSE event_id % 11 END AS INT) AS chunks_created,
           CAST(CASE WHEN event_id % 4 = 0 THEN 0
                ELSE event_id % 3 END AS INT) AS images_processed
    FROM events WHERE event_id % 7 = 0
"""


def stage5_shape_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_STAGE5_SQL})
        SELECT job_id,
               CAST(CASE WHEN breaker_open THEN 0 ELSE validated END
                    AS INT) AS claude_validations,
               CAST(len(physical_pages) AS INT) AS pages_processed,
               CAST(len(list_filter(generate_series(1, total_pages),
                    p -> NOT list_contains(physical_pages, p)))
                    AS INT) AS pages_skipped,
               TRUE AS checkpoint_created_first,
               products_created > 0 OR chunks_created > 0
                   OR images_processed > 0 AS marked_completed
        FROM r
    """
