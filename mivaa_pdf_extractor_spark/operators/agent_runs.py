"""Agent-run lifecycle row folds
(app/services/integrations/job_agent_runs.py:97-226).

Deterministic row shapes around the Supabase writes (file:line):

* ``start_run`` (:97-130): status 'processing' — NOT 'running'; the
  reference documents audit #217 M7: 'running' made runs invisible to
  the edge runner / admin UI / auto-recovery (pin); model hardcoded
  'claude-haiku-4-5-20251001'; a falsy agent id skips the insert.
* ``append_log`` (:133-154): message truncated [:480]; every log
  bumps last_heartbeat (pin); falsy run_id no-ops.
* ``complete_run`` (:156-189): token/credit fields fold through
  ``int(x or 0)`` — present-None and 0 both land 0 (LIVE or);
  ``run_count`` is read-add-one (best-effort, not atomic — the
  reference says so) and is bumped ONLY on completion; ``fail_run``
  (:191-216) updates last_run_status but does NOT bump run_count —
  asymmetric (pin); fail truncates ``(error_message or '')[:480]``.
* ``_bump_run_count`` (:218-226): ``(current or 0) + 1`` — a NULL
  stored count restarts at 1; a read failure returns 1 (pin).

Map-side projection over a lifecycle event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MODEL = "claude-haiku-4-5-20251001"


def fold_run_events(events: DataFrame) -> DataFrame:
    """events: (event_id, kind in {start, log, complete, fail},
    agent_id nullable, run_id nullable, message, error_message
    nullable, input_tokens int nullable, output_tokens int nullable,
    credits int nullable, stored_run_count int nullable,
    count_read_ok bool)."""
    k = F.col("kind")
    skipped = (F.when(k == "start",
                      F.col("agent_id").isNull()
                      | (F.col("agent_id") == ""))
               .otherwise(F.col("run_id").isNull()
                          | (F.col("run_id") == "")))
    status = (F.when(k == "start", "processing")   # NOT 'running'
              .when(k == "complete", "completed")
              .when(k == "fail", "failed"))
    bump = (F.when(~F.col("count_read_ok"), F.lit(1))
            .otherwise(F.coalesce(F.col("stored_run_count"),
                                  F.lit(0)) + 1))
    return events.select(
        "event_id", "kind", skipped.alias("skipped"),
        F.when(~skipped, status).alias("status"),
        F.when(~skipped & (k == "start"), F.lit(MODEL))
        .alias("model_used"),
        F.when(~skipped & (k == "log"),
               F.substring("message", 1, 480)).alias("log_message"),
        F.when(~skipped & (k == "fail"),
               F.substring(F.coalesce(F.col("error_message"),
                                      F.lit("")), 1, 480))
        .alias("error_out"),
        F.when(~skipped & (k == "complete"),
               F.coalesce(F.col("input_tokens"), F.lit(0)))
        .cast("int").alias("input_tokens_out"),
        F.when(~skipped & (k == "complete"),
               F.coalesce(F.col("credits"), F.lit(0)))
        .cast("int").alias("credits_out"),
        # run_count bumped ONLY on complete (pin)
        F.when(~skipped & (k == "complete"), bump).cast("int")
        .alias("new_run_count"),
        (~skipped & k.isin("log")).alias("heartbeat_bumped"),
        (~skipped & k.isin("complete", "fail"))
        .alias("last_run_status_written"))


def synth_run_events(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("event_id"),
        F.when(e % 4 == 0, "start").when(e % 4 == 1, "log")
        .when(e % 4 == 2, "complete").otherwise("fail").alias("kind"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .when(e % 7 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("ag"), (e % 30).cast("string")))
        .alias("agent_id"),
        F.when(e % 9 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("run"), (e % 50).cast("string")))
        .alias("run_id"),
        F.concat(F.lit("step "), F.repeat(F.lit("x"), 600),
                 (e % 6).cast("string")).alias("message"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("boom "), F.repeat(F.lit("e"), 500)))
        .alias("error_message"),
        F.when(e % 6 == 0, F.lit(None).cast("int"))
        .otherwise((e % 900).cast("int")).alias("input_tokens"),
        (e % 300).cast("int").alias("output_tokens"),
        F.when(e % 8 == 0, F.lit(None).cast("int"))
        .otherwise((e % 40).cast("int")).alias("credits"),
        F.when(e % 10 == 0, F.lit(None).cast("int"))
        .otherwise((e % 25).cast("int")).alias("stored_run_count"),
        (e % 11 != 0).alias("count_read_ok"))


SYNTH_RUN_EVENTS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CASE event_id % 4 WHEN 0 THEN 'start' WHEN 1 THEN 'log'
                WHEN 2 THEN 'complete' ELSE 'fail' END AS kind,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN ''
                ELSE 'ag' || CAST(event_id % 30 AS VARCHAR) END
               AS agent_id,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE 'run' || CAST(event_id % 50 AS VARCHAR) END
               AS run_id,
           'step ' || repeat('x', 600)
               || CAST(event_id % 6 AS VARCHAR) AS message,
           CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE 'boom ' || repeat('e', 500) END
               AS error_message,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE CAST(event_id % 900 AS INT) END AS input_tokens,
           CAST(event_id % 300 AS INT) AS output_tokens,
           CASE WHEN event_id % 8 = 0 THEN NULL
                ELSE CAST(event_id % 40 AS INT) END AS credits,
           CASE WHEN event_id % 10 = 0 THEN NULL
                ELSE CAST(event_id % 25 AS INT) END
               AS stored_run_count,
           event_id % 11 <> 0 AS count_read_ok
    FROM events
"""


def run_events_sql() -> str:
    return f"""
        WITH e AS ({SYNTH_RUN_EVENTS_SQL}),
        g AS (
          SELECT *, CASE WHEN kind = 'start'
                         THEN agent_id IS NULL OR agent_id = ''
                         ELSE run_id IS NULL OR run_id = '' END
                        AS skipped
          FROM e)
        SELECT event_id, kind, skipped,
               CASE WHEN skipped THEN NULL
                    WHEN kind = 'start' THEN 'processing'
                    WHEN kind = 'complete' THEN 'completed'
                    WHEN kind = 'fail' THEN 'failed' END AS status,
               CASE WHEN NOT skipped AND kind = 'start'
                    THEN '{MODEL}' END AS model_used,
               CASE WHEN NOT skipped AND kind = 'log'
                    THEN substring(message, 1, 480) END
                   AS log_message,
               CASE WHEN NOT skipped AND kind = 'fail'
                    THEN substring(coalesce(error_message, ''), 1,
                                   480) END AS error_out,
               CAST(CASE WHEN NOT skipped AND kind = 'complete'
                    THEN coalesce(input_tokens, 0) END AS INT)
                   AS input_tokens_out,
               CAST(CASE WHEN NOT skipped AND kind = 'complete'
                    THEN coalesce(credits, 0) END AS INT)
                   AS credits_out,
               CAST(CASE WHEN NOT skipped AND kind = 'complete' THEN
                      CASE WHEN NOT count_read_ok THEN 1
                           ELSE coalesce(stored_run_count, 0) + 1 END
                    END AS INT) AS new_run_count,
               NOT skipped AND kind = 'log' AS heartbeat_bumped,
               NOT skipped AND kind IN ('complete', 'fail')
                   AS last_run_status_written
        FROM g
    """


# ---------------------------------------------------------------------------
# Job-notification shaping (app/services/utilities/notification_service.py)
# ---------------------------------------------------------------------------

JOB_LABELS = (
    ("pdf_processing", "PDF Processing"),
    ("web_scraping", "Web Scraping"),
    ("product_discovery_upload", "Product Discovery"),
    ("image_embedding_regeneration", "Image Embedding Regeneration"),
    ("xml_import", "XML Import"),
)  # notification_service.py:147-153


def notify_rows(jobs: DataFrame) -> DataFrame:
    """notification_service.py pins:

    - unknown job types fall back to replace('_',' ').title()
      (:145-154);
    - completed message ladder (:100-107): 'Completed successfully'
      + ' in {duration}' under a TRUTHY duration gate + the stats
      block appended with a blank line only when non-empty;
    - _format_stats (:156-167) is key-PRESENCE gated in a FIXED order
      (images, embeddings, chunks, products) — a present 0 still
      renders '0 images' (pin);
    - failed message = `error or` the pinned default (LIVE or — ''
      falls to the default).
    """
    from pyspark.sql import functions as F
    label = F.col("job_type")
    lab = None
    for k, v in JOB_LABELS:
        cond = (F.col("job_type") == k)
        lab = F.when(cond, v) if lab is None else lab.when(cond, v)
    lab = lab.otherwise(F.initcap(F.regexp_replace("job_type", "_",
                                                   " ")))
    stats_parts = F.array_join(F.filter(F.array(
        F.when(F.col("has_images"),
               F.concat(F.col("images_processed").cast("string"),
                        F.lit(" images"))),
        F.when(F.col("has_embeddings"),
               F.concat(F.col("embeddings_generated").cast("string"),
                        F.lit(" embeddings"))),
        F.when(F.col("has_chunks"),
               F.concat(F.col("chunks_created").cast("string"),
                        F.lit(" chunks"))),
        F.when(F.col("has_products"),
               F.concat(F.col("products_created").cast("string"),
                        F.lit(" products")))),
        lambda x: x.isNotNull()), ", ")
    msg = F.lit("Completed successfully")
    msg = F.when(F.col("duration").isNotNull()
                 & (F.col("duration") != ""),
                 F.concat(msg, F.lit(" in "), F.col("duration"))) \
        .otherwise(msg)
    msg = F.when(F.col("has_stats") & (stats_parts != ""),
                 F.concat(msg, F.lit("\n\n"), stats_parts)) \
        .otherwise(msg)
    fail_msg = F.when(F.col("error").isNotNull()
                      & (F.col("error") != ""), F.col("error")) \
        .otherwise(F.lit("The job encountered an error and could "
                         "not complete."))
    return jobs.select(
        "job_id",
        F.concat(F.lit("✅ "), lab, F.lit(" Completed"))
        .alias("completed_title"),
        msg.alias("completed_message"),
        F.concat(F.lit("❌ "), lab, F.lit(" Failed"))
        .alias("failed_title"),
        fail_msg.alias("failed_message"),
        F.concat(F.lit("/admin/async-jobs?job="), F.col("job_id"))
        .alias("action_url"))


def synth_notify_jobs(events: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F
    e = F.col("event_id")
    return events.select(
        F.concat(F.lit("nj"), e.cast("string")).alias("job_id"),
        F.when(e % 6 == 0, "pdf_processing")
        .when(e % 6 == 1, "xml_import")
        .when(e % 6 == 2, "web_scraping")
        .otherwise("custom_batch_sync").alias("job_type"),
        F.when(e % 4 == 0, F.lit(None).cast("string"))
        .when(e % 4 == 1, F.lit(""))
        .otherwise(F.concat((e % 50).cast("string"), F.lit("s")))
        .alias("duration"),
        (e % 3 != 0).alias("has_stats"),
        (e % 5 != 0).alias("has_images"),
        (e % 7).cast("int").alias("images_processed"),
        (e % 4 == 2).alias("has_embeddings"),
        (e % 9).cast("int").alias("embeddings_generated"),
        (e % 2 == 0).alias("has_chunks"),
        (e % 13).cast("int").alias("chunks_created"),
        (e % 11 == 0).alias("has_products"),
        (e % 5).cast("int").alias("products_created"),
        F.when(e % 8 == 0, F.lit(None).cast("string"))
        .when(e % 8 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("timeout after "),
                            (e % 30).cast("string"), F.lit("s")))
        .alias("error"))


SYNTH_NOTIFY_SQL = """
    SELECT 'nj' || CAST(event_id AS VARCHAR) AS job_id,
           CASE event_id % 6 WHEN 0 THEN 'pdf_processing'
                WHEN 1 THEN 'xml_import' WHEN 2 THEN 'web_scraping'
                ELSE 'custom_batch_sync' END AS job_type,
           CASE WHEN event_id % 4 = 0 THEN NULL
                WHEN event_id % 4 = 1 THEN ''
                ELSE CAST(event_id % 50 AS VARCHAR) || 's' END
               AS duration,
           event_id % 3 <> 0 AS has_stats,
           event_id % 5 <> 0 AS has_images,
           CAST(event_id % 7 AS INT) AS images_processed,
           event_id % 4 = 2 AS has_embeddings,
           CAST(event_id % 9 AS INT) AS embeddings_generated,
           event_id % 2 = 0 AS has_chunks,
           CAST(event_id % 13 AS INT) AS chunks_created,
           event_id % 11 = 0 AS has_products,
           CAST(event_id % 5 AS INT) AS products_created,
           CASE WHEN event_id % 8 = 0 THEN NULL
                WHEN event_id % 8 = 1 THEN ''
                ELSE 'timeout after ' || CAST(event_id % 30 AS VARCHAR)
                     || 's' END AS error
    FROM events
"""


def notify_rows_sql() -> str:
    label = """
        CASE job_type
          WHEN 'pdf_processing' THEN 'PDF Processing'
          WHEN 'web_scraping' THEN 'Web Scraping'
          WHEN 'product_discovery_upload' THEN 'Product Discovery'
          WHEN 'image_embedding_regeneration'
            THEN 'Image Embedding Regeneration'
          WHEN 'xml_import' THEN 'XML Import'
          ELSE list_aggregate(list_transform(
                 string_split(replace(job_type, '_', ' '), ' '),
                 w -> upper(w[1]) || lower(w[2:])),
               'string_agg', ' ')
        END
    """
    stats = """
        array_to_string(list_filter([
          CASE WHEN has_images
               THEN CAST(images_processed AS VARCHAR)
                    || ' images' END,
          CASE WHEN has_embeddings
               THEN CAST(embeddings_generated AS VARCHAR)
                    || ' embeddings' END,
          CASE WHEN has_chunks
               THEN CAST(chunks_created AS VARCHAR) || ' chunks' END,
          CASE WHEN has_products
               THEN CAST(products_created AS VARCHAR)
                    || ' products' END], x -> x IS NOT NULL), ', ')
    """
    return f"""
        WITH j AS ({SYNTH_NOTIFY_SQL}),
        g AS (SELECT *, {label} AS lab,
                     coalesce({stats}, '') AS stats_parts
              FROM j),
        m AS (SELECT *,
                     'Completed successfully'
                     || CASE WHEN duration IS NOT NULL
                             AND duration <> ''
                        THEN ' in ' || duration ELSE '' END AS base
              FROM g)
        SELECT job_id,
               chr(9989) || ' ' || lab || ' Completed'
                   AS completed_title,
               base || CASE WHEN has_stats AND stats_parts <> ''
                       THEN chr(10) || chr(10) || stats_parts
                       ELSE '' END AS completed_message,
               chr(10060) || ' ' || lab || ' Failed' AS failed_title,
               CASE WHEN error IS NOT NULL AND error <> '' THEN error
                    ELSE 'The job encountered an error and could '
                         || 'not complete.' END AS failed_message,
               '/admin/async-jobs?job=' || job_id AS action_url
        FROM m
    """
