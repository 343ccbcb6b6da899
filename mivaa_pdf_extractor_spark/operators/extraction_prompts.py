"""Extraction-prompt DB resolver fold.

Re-expresses ``app/services/utilities/prompt_templates.py:18-79``
(``get_prompt_template_from_db`` — distinct from the 4-tier
unified_prompt_service resolver covered in ``operators/prompt_resolve``).
Pinned behaviors:

- two tiers only: exact (workspace, stage, category) then the
  (stage, 'default') fallback — both restricted to
  ``prompt_type='extraction'`` AND ``is_active`` with the HIGHEST
  version winning (an inactive higher version is invisible, pin);
- a miss on both tiers RAISES (no silent None) — surfaced as
  ``source='error'``;
- the reference's ``LIMIT 1`` after ``ORDER BY version DESC`` has no
  tiebreak; this engine canonicalizes equal versions by prompt_id
  DESC (newest row id wins), documented.

Two broadcast-joined ranked lookups — the prompts dimension is tiny
next to a request stream, so both tiers broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_extraction_prompts(requests: DataFrame,
                               prompts: DataFrame) -> DataFrame:
    active = (prompts
              .where(F.col("is_active")
                     & (F.col("prompt_type") == "extraction")))
    w = (Window.partitionBy("p_ws", "p_stage", "p_category")
         .orderBy(F.col("version").desc(), F.col("prompt_id").desc()))
    best = (active
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("p_ws", "p_stage", "p_category",
                    "prompt_text", "version"))
    exact = best.select(
        F.col("p_ws").alias("e_ws"), F.col("p_stage").alias("e_stage"),
        F.col("p_category").alias("e_cat"),
        F.col("prompt_text").alias("e_text"),
        F.col("version").alias("e_version"))
    dflt = (best.where(F.col("p_category") == "default")
            .select(F.col("p_ws").alias("d_ws"),
                    F.col("p_stage").alias("d_stage"),
                    F.col("prompt_text").alias("d_text"),
                    F.col("version").alias("d_version")))
    out = (requests
           .join(F.broadcast(exact),
                 (F.col("workspace_id") == F.col("e_ws"))
                 & (F.col("stage") == F.col("e_stage"))
                 & (F.col("category") == F.col("e_cat")), "left")
           .join(F.broadcast(dflt),
                 (F.col("workspace_id") == F.col("d_ws"))
                 & (F.col("stage") == F.col("d_stage")), "left"))
    hit_exact = F.col("e_text").isNotNull()
    hit_dflt = ~hit_exact & F.col("d_text").isNotNull()
    return out.select(
        "req_id",
        F.when(hit_exact, "exact").when(hit_dflt, "default")
        .otherwise("error").alias("source"),
        F.when(hit_exact, F.col("e_text"))
        .when(hit_dflt, F.col("d_text"))
        .otherwise(F.lit(None).cast("string")).alias("prompt_text"),
        F.when(hit_exact, F.col("e_version"))
        .when(hit_dflt, F.col("d_version"))
        .otherwise(F.lit(None).cast("int")).cast("int")
        .alias("version"))


def synth_prompt_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.where(e % 3 == 0).select(
        e.cast("long").alias("prompt_id"),
        F.concat(F.lit("ws-"), (e % 3).cast("string")).alias("p_ws"),
        F.element_at(F.array(
            F.lit("discovery"), F.lit("chunking"),
            F.lit("image_analysis"), F.lit("entity_creation")),
            (e % 4 + 1).cast("int")).alias("p_stage"),
        F.element_at(F.array(
            F.lit("products"), F.lit("certificates"), F.lit("logos"),
            F.lit("default"), F.lit("default")),
            (e % 5 + 1).cast("int")).alias("p_category"),
        F.when(e % 7 == 0, F.lit("classification"))
        .otherwise(F.lit("extraction")).alias("prompt_type"),
        (e % 4 != 1).alias("is_active"),
        ((e * 13) % 9).cast("int").alias("version"),
        F.concat(F.lit("PROMPT "), e.cast("string"))
        .alias("prompt_text"))


def synth_prompt_requests(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        F.concat(F.lit("ws-"), (e % 4).cast("string"))
        .alias("workspace_id"),
        F.element_at(F.array(
            F.lit("discovery"), F.lit("chunking"),
            F.lit("image_analysis"), F.lit("entity_creation"),
            F.lit("nonexistent_stage")),
            (e % 5 + 1).cast("int")).alias("stage"),
        F.element_at(F.array(
            F.lit("products"), F.lit("certificates"), F.lit("logos"),
            F.lit("specifications"), F.lit("default")),
            (e % 5 + 1).cast("int")).alias("category"))


SYNTH_PROMPT_ROWS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS prompt_id,
           'ws-' || CAST(event_id % 3 AS VARCHAR) AS p_ws,
           (['discovery', 'chunking', 'image_analysis',
             'entity_creation'])[CAST(event_id % 4 AS INT) + 1]
               AS p_stage,
           (['products', 'certificates', 'logos', 'default',
             'default'])[CAST(event_id % 5 AS INT) + 1] AS p_category,
           CASE WHEN event_id % 7 = 0 THEN 'classification'
                ELSE 'extraction' END AS prompt_type,
           event_id % 4 <> 1 AS is_active,
           CAST((event_id * 13) % 9 AS INT) AS version,
           'PROMPT ' || CAST(event_id AS VARCHAR) AS prompt_text
    FROM events WHERE event_id % 3 = 0
"""

SYNTH_PROMPT_REQUESTS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           'ws-' || CAST(event_id % 4 AS VARCHAR) AS workspace_id,
           (['discovery', 'chunking', 'image_analysis',
             'entity_creation', 'nonexistent_stage'])
             [CAST(event_id % 5 AS INT) + 1] AS stage,
           (['products', 'certificates', 'logos', 'specifications',
             'default'])[CAST(event_id % 5 AS INT) + 1] AS category
    FROM events
"""


def resolve_prompts_sql() -> str:
    return f"""
        WITH p AS ({SYNTH_PROMPT_ROWS_SQL}),
        rq AS ({SYNTH_PROMPT_REQUESTS_SQL}),
        act AS (
          SELECT * FROM p
          WHERE is_active AND prompt_type = 'extraction'),
        best AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY p_ws, p_stage, p_category
                ORDER BY version DESC, prompt_id DESC) AS rn
            FROM act) WHERE rn = 1)
        SELECT rq.req_id,
               CASE WHEN e.prompt_text IS NOT NULL THEN 'exact'
                    WHEN d.prompt_text IS NOT NULL THEN 'default'
                    ELSE 'error' END AS source,
               coalesce(e.prompt_text, d.prompt_text) AS prompt_text,
               CAST(CASE WHEN e.prompt_text IS NOT NULL
                    THEN e.version ELSE d.version END AS INT)
                   AS version
        FROM rq
        LEFT JOIN best e
          ON e.p_ws = rq.workspace_id AND e.p_stage = rq.stage
         AND e.p_category = rq.category
        LEFT JOIN best d
          ON d.p_ws = rq.workspace_id AND d.p_stage = rq.stage
         AND d.p_category = 'default'
    """
