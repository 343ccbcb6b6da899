"""Startup auto-resume of interrupted jobs
(app/api/rag_routes.py:249-403, ``_resume_recently_interrupted_jobs``).

The checkpoint/stage resume itself is covered by the pipeline and
checkpoint operators; this folds the startup SELECTION + outcome
ladder:

* selection (:259-268): status='interrupted', job_type in
  {product_discovery_upload, pdf_processing},
  ``interrupted_at >= now - 4h`` (the docstring says "last 30 min" —
  the code says FOUR HOURS; faithful-to-code pin),
  ``recovery_attempts < 3``;
* outcome ladder per candidate (:297-399), first hit wins:
  - ``skipped_no_doc``: falsy document_id OR no documents row;
  - ``skipped_no_file``: falsy file_path OR the temp PDF is gone from
    disk (disk presence arrives as an input column — host I/O is not
    a fold);
  - ``claim_noop``: the mark_pdf_job_for_recovery RPC returned
    nothing (already recovered / attempts exhausted);
  - ``promote_noop``: the pending->processing conditional UPDATE
    matched nothing — a parallel cron tick already dispatched (the
    audit-pinned double-dispatch guard);
  - ``resumed`` with the rehydrated orchestrator parameters:
    filename = job.filename or meta.filename or 'resumed.pdf' (falsy
    ladder), workspace = doc.workspace_id or meta.workspace_id,
    categories = meta list, or a comma-split of a meta STRING with
    per-item strip, or ['products'] when absent,
    chunk_size ``or 1000`` / chunk_overlap ``or 200`` (an explicit 0
    falls through — pin), model ``or 'claude-vision'``,
    attempt_number = (recovery_attempts or 0) + 1;
* summary (:399-403): resumed / skipped_no_file / skipped_no_doc
  counts (claim/promote no-ops are logged but NOT counted — pin).

Scale: one filter + a broadcastable documents join + a map-side
when-chain; the startup batch is bounded by the 4-hour window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RESUME_WINDOW_S = 4 * 3600
MAX_ATTEMPTS = 3
_TYPES = ("product_discovery_upload", "pdf_processing")


def resume_candidates(jobs: DataFrame, *, now: int) -> DataFrame:
    return jobs.where(
        (F.col("status") == "interrupted")
        & F.col("job_type").isin(*_TYPES)
        & (F.col("interrupted_at") >= now - RESUME_WINDOW_S)
        & (F.col("recovery_attempts") < MAX_ATTEMPTS))


def resume_outcomes(jobs: DataFrame, docs: DataFrame, *,
                    now: int) -> DataFrame:
    """One row per candidate with the ladder outcome + rehydrated
    params on the resumed rows."""
    c = resume_candidates(jobs, now=now)
    d = docs.select(F.col("doc_id").alias("_did"),
                    F.col("file_path").alias("_fp"),
                    F.col("file_on_disk").alias("_disk"),
                    F.col("workspace_id").alias("_ws"))
    j = c.join(F.broadcast(d), c["document_id"] == F.col("_did"),
               "left")
    no_doc = F.col("document_id").isNull() | F.col("_did").isNull()
    no_file = (F.coalesce(F.col("_fp"), F.lit("")) == "") \
        | ~F.coalesce(F.col("_disk"), F.lit(False))
    outcome = (F.when(no_doc, "skipped_no_doc")
               .when(no_file, "skipped_no_file")
               .when(~F.col("claim_ok"), "claim_noop")
               .when(~F.col("promote_ok"), "promote_noop")
               .otherwise("resumed"))
    resumed = outcome == "resumed"
    blank = F.lit(None).cast("string")
    categories = F.when(
        F.coalesce(F.col("meta_categories"), F.lit("")) == "",
        F.array(F.lit("products"))).otherwise(
        F.transform(F.split(F.col("meta_categories"), ","),
                    lambda x: F.trim(x)))
    return j.select(
        "job_id", outcome.alias("outcome"),
        F.when(resumed,
               F.coalesce(
                   F.when(F.col("filename") != "", F.col("filename")),
                   F.when(F.col("meta_filename") != "",
                          F.col("meta_filename")),
                   F.lit("resumed.pdf"))).otherwise(blank)
        .alias("filename_out"),
        F.when(resumed, F.coalesce(F.col("_ws"),
                                   F.col("meta_workspace_id")))
        .otherwise(F.lit(None).cast("long")).alias("workspace_out"),
        # comma-rendered (a NULL array column hashes engine-specific)
        F.when(resumed, F.array_join(categories, ","))
        .otherwise(blank).alias("categories_out"),
        F.when(resumed,
               F.when(F.coalesce(F.col("chunk_size"), F.lit(0)) != 0,
                      F.col("chunk_size")).otherwise(1000))
        .otherwise(F.lit(None).cast("int")).alias("chunk_size_out"),
        F.when(resumed,
               F.when(F.coalesce(F.col("chunk_overlap"),
                                 F.lit(0)) != 0,
                      F.col("chunk_overlap")).otherwise(200))
        .otherwise(F.lit(None).cast("int")).alias("overlap_out"),
        F.when(resumed,
               F.coalesce(F.when(F.col("discovery_model") != "",
                                 F.col("discovery_model")),
                          F.lit("claude-vision"))).otherwise(blank)
        .alias("model_out"),
        F.when(resumed, F.coalesce(F.col("recovery_attempts"),
                                   F.lit(0)) + 1)
        .otherwise(F.lit(None).cast("long")).alias("attempt_number"))


def resume_summary(outcomes: DataFrame) -> DataFrame:
    """resumed / skipped_no_file / skipped_no_doc — the no-ops are
    NOT counted (pin)."""
    return outcomes.agg(
        F.sum((F.col("outcome") == "resumed").cast("int"))
        .cast("long").alias("resumed"),
        F.sum((F.col("outcome") == "skipped_no_file").cast("int"))
        .cast("long").alias("skipped_no_file"),
        F.sum((F.col("outcome") == "skipped_no_doc").cast("int"))
        .cast("long").alias("skipped_no_doc"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

NOW = 1_800_000_000


def synth_resume_jobs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("job_id"),
        F.when(e % 3 == 0, "interrupted")
        .when(e % 3 == 1, "processing").otherwise("failed")
        .alias("status"),
        F.when(e % 4 == 0, "product_discovery_upload")
        .when(e % 4 == 1, "pdf_processing")
        .when(e % 4 == 2, "mention_refresh").otherwise("xml_import")
        .alias("job_type"),
        (F.lit(NOW) - (e % 9) * 3600).cast("long")
        .alias("interrupted_at"),
        (e % 5).cast("int").alias("recovery_attempts"),
        F.when(e % 7 == 0, F.lit(None).cast("long"))
        .otherwise((e % 41).cast("long")).alias("document_id"),
        F.when(e % 6 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("file"), (e % 11).cast("string"),
                            F.lit(".pdf"))).alias("filename"),
        F.when(e % 5 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("meta"), (e % 13).cast("string"),
                            F.lit(".pdf"))).alias("meta_filename"),
        F.when(e % 8 == 0, F.lit(None).cast("long"))
        .otherwise((e % 3).cast("long")).alias("meta_workspace_id"),
        F.when(e % 9 == 0, F.lit(None).cast("string"))
        .when(e % 9 == 1, F.lit("products, certificates , logos"))
        .otherwise(F.lit("products")).alias("meta_categories"),
        F.when(e % 10 == 0, F.lit(0)).when(e % 10 == 1,
                                           F.lit(None).cast("int"))
        .otherwise((500 + e % 1500).cast("int")).alias("chunk_size"),
        F.when(e % 12 == 0, F.lit(0))
        .otherwise((e % 300).cast("int")).alias("chunk_overlap"),
        F.when(e % 11 == 0, F.lit(""))
        .otherwise(F.lit("claude-vision")).alias("discovery_model"),
        (e % 13 != 0).alias("claim_ok"),
        (e % 17 != 0).alias("promote_ok"))


SYNTH_RESUME_JOBS_SQL = f"""
    SELECT CAST(event_id AS BIGINT) AS job_id,
           CASE event_id % 3 WHEN 0 THEN 'interrupted'
                WHEN 1 THEN 'processing' ELSE 'failed' END AS status,
           CASE event_id % 4 WHEN 0 THEN 'product_discovery_upload'
                WHEN 1 THEN 'pdf_processing'
                WHEN 2 THEN 'mention_refresh'
                ELSE 'xml_import' END AS job_type,
           CAST({NOW} - (event_id % 9) * 3600 AS BIGINT)
               AS interrupted_at,
           CAST(event_id % 5 AS INT) AS recovery_attempts,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE CAST(event_id % 41 AS BIGINT) END
               AS document_id,
           CASE WHEN event_id % 6 = 0 THEN ''
                ELSE 'file' || CAST(event_id % 11 AS VARCHAR)
                     || '.pdf' END AS filename,
           CASE WHEN event_id % 5 = 0 THEN ''
                ELSE 'meta' || CAST(event_id % 13 AS VARCHAR)
                     || '.pdf' END AS meta_filename,
           CASE WHEN event_id % 8 = 0 THEN NULL
                ELSE CAST(event_id % 3 AS BIGINT) END
               AS meta_workspace_id,
           CASE WHEN event_id % 9 = 0 THEN NULL
                WHEN event_id % 9 = 1
                THEN 'products, certificates , logos'
                ELSE 'products' END AS meta_categories,
           CASE WHEN event_id % 10 = 0 THEN 0
                WHEN event_id % 10 = 1 THEN NULL
                ELSE CAST(500 + event_id % 1500 AS INT) END
               AS chunk_size,
           CASE WHEN event_id % 12 = 0 THEN 0
                ELSE CAST(event_id % 300 AS INT) END
               AS chunk_overlap,
           CASE WHEN event_id % 11 = 0 THEN ''
                ELSE 'claude-vision' END AS discovery_model,
           event_id % 13 <> 0 AS claim_ok,
           event_id % 17 <> 0 AS promote_ok
    FROM events
"""


def synth_resume_docs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where((e % 41 < 35) & (e < 41))
            .select((e % 41).cast("long").alias("doc_id"),
                    F.when(e % 5 == 0, F.lit(""))
                    .otherwise(F.concat(F.lit("/tmp/doc"),
                                        e.cast("string"),
                                        F.lit(".pdf")))
                    .alias("file_path"),
                    (e % 4 != 0).alias("file_on_disk"),
                    F.when(e % 6 == 0, F.lit(None).cast("long"))
                    .otherwise((e % 7).cast("long"))
                    .alias("workspace_id")))


SYNTH_RESUME_DOCS_SQL = """
    SELECT CAST(event_id % 41 AS BIGINT) AS doc_id,
           CASE WHEN event_id % 5 = 0 THEN ''
                ELSE '/tmp/doc' || CAST(event_id AS VARCHAR)
                     || '.pdf' END AS file_path,
           event_id % 4 <> 0 AS file_on_disk,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE CAST(event_id % 7 AS BIGINT) END
               AS workspace_id
    FROM events WHERE event_id % 41 < 35 AND event_id < 41
"""

_OUTCOMES_CORE = f"""
        j AS ({SYNTH_RESUME_JOBS_SQL}),
        d AS ({SYNTH_RESUME_DOCS_SQL}),
        c AS (
          SELECT * FROM j
          WHERE status = 'interrupted'
            AND job_type IN ('product_discovery_upload',
                             'pdf_processing')
            AND interrupted_at >= {NOW} - {RESUME_WINDOW_S}
            AND recovery_attempts < {MAX_ATTEMPTS}),
        x AS (
          SELECT c.*, d.doc_id AS _did, d.file_path AS _fp,
                 d.file_on_disk AS _disk, d.workspace_id AS _ws
          FROM c LEFT JOIN d ON c.document_id = d.doc_id),
        o AS (
          SELECT *,
                 CASE
                   WHEN document_id IS NULL OR _did IS NULL
                        THEN 'skipped_no_doc'
                   WHEN coalesce(_fp, '') = ''
                        OR NOT coalesce(_disk, FALSE)
                        THEN 'skipped_no_file'
                   WHEN NOT claim_ok THEN 'claim_noop'
                   WHEN NOT promote_ok THEN 'promote_noop'
                   ELSE 'resumed' END AS outcome
          FROM x),
        fin AS (
          SELECT job_id, outcome,
                 CASE WHEN outcome = 'resumed' THEN
                   CASE WHEN filename <> '' THEN filename
                        WHEN meta_filename <> '' THEN meta_filename
                        ELSE 'resumed.pdf' END END AS filename_out,
                 CASE WHEN outcome = 'resumed'
                      THEN coalesce(_ws, meta_workspace_id) END
                     AS workspace_out,
                 CASE WHEN outcome = 'resumed' THEN
                   array_to_string(
                     CASE WHEN coalesce(meta_categories, '') = ''
                          THEN ['products']
                          ELSE [trim(u) FOR u IN
                                string_split(meta_categories, ',')]
                          END, ',') END AS categories_out,
                 CAST(CASE WHEN outcome = 'resumed' THEN
                   CASE WHEN coalesce(chunk_size, 0) <> 0
                        THEN chunk_size ELSE 1000 END END AS INT)
                     AS chunk_size_out,
                 CAST(CASE WHEN outcome = 'resumed' THEN
                   CASE WHEN coalesce(chunk_overlap, 0) <> 0
                        THEN chunk_overlap ELSE 200 END END AS INT)
                     AS overlap_out,
                 CASE WHEN outcome = 'resumed' THEN
                   CASE WHEN discovery_model <> ''
                        THEN discovery_model
                        ELSE 'claude-vision' END END AS model_out,
                 CASE WHEN outcome = 'resumed'
                      THEN CAST(coalesce(recovery_attempts, 0) + 1
                                AS BIGINT) END AS attempt_number
          FROM o)
"""


def resume_outcomes_sql() -> str:
    return f"WITH {_OUTCOMES_CORE} SELECT * FROM fin"


def resume_summary_sql() -> str:
    return f"""
        WITH {_OUTCOMES_CORE}
        SELECT CAST(sum(CASE WHEN outcome = 'resumed' THEN 1
                        ELSE 0 END) AS BIGINT) AS resumed,
               CAST(sum(CASE WHEN outcome = 'skipped_no_file'
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS skipped_no_file,
               CAST(sum(CASE WHEN outcome = 'skipped_no_doc'
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS skipped_no_doc
        FROM fin
    """
