"""Extraction-config resolution fold.

Re-expresses ``app/services/utilities/admin_prompt_service.py:267-330``
(``get_extraction_config`` / ``update_extraction_config``). Pinned
behaviors:

- a missing row returns the 7-field DEFAULT config (products-only
  categories, 'claude' discovery model, 1000/200 chunking, enhancement
  on, 0.7 quality threshold) — while a READ ERROR returns ``{}``
  (three distinct shapes, pin);
- the update-vs-insert branch tests ``existing and 'id' in existing``:
  the defaults dict is truthy but carries NO id, so default-backed
  workspaces INSERT; the error-path ``{}`` is falsy and also inserts
  (pin — an update never fires unless a real row was read).

Map-side when-chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULTS = {
    "discovery_model": "claude",
    "chunk_size": 1000,
    "chunk_overlap": 200,
    "enable_prompt_enhancement": True,
    "quality_threshold": 0.7,
}


def extraction_config_resolve(rows: DataFrame) -> DataFrame:
    exists = F.col("row_exists") & ~F.col("read_raised")
    errored = F.col("read_raised")
    source = (F.when(errored, "error_empty")
              .when(exists, "stored").otherwise("defaults"))
    return rows.select(
        "ws_id",
        source.alias("source"),
        F.when(exists, F.col("stored_model"))
        .when(errored, F.lit(None).cast("string"))
        .otherwise(F.lit(DEFAULTS["discovery_model"]))
        .alias("discovery_model"),
        F.when(exists, F.col("stored_chunk_size"))
        .when(errored, F.lit(None))
        .otherwise(F.lit(DEFAULTS["chunk_size"])).cast("int")
        .alias("chunk_size"),
        F.when(exists, F.col("stored_threshold"))
        .when(errored, F.lit(None))
        .otherwise(F.lit(DEFAULTS["quality_threshold"]))
        .cast("double").alias("quality_threshold"),
        # update only when a REAL row (with id) was read
        F.when(exists & F.col("stored_has_id"), "update")
        .otherwise(F.lit("insert")).alias("write_branch"))


def synth_config_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("ws_id"),
        (e % 3 == 0).alias("row_exists"),
        (e % 11 == 0).alias("read_raised"),
        (e % 5 != 0).alias("stored_has_id"),
        F.when(e % 2 == 0, F.lit("claude")).otherwise(F.lit("gpt"))
        .alias("stored_model"),
        ((e % 4) * 500 + 500).cast("int").alias("stored_chunk_size"),
        ((e % 3).cast("double") / 4.0 + 0.25).alias("stored_threshold"))


SYNTH_CONFIG_ROWS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS ws_id,
           event_id % 3 = 0 AS row_exists,
           event_id % 11 = 0 AS read_raised,
           event_id % 5 <> 0 AS stored_has_id,
           CASE WHEN event_id % 2 = 0 THEN 'claude'
                ELSE 'gpt' END AS stored_model,
           CAST((event_id % 4) * 500 + 500 AS INT)
               AS stored_chunk_size,
           CAST(event_id % 3 AS DOUBLE) / 4.0 + 0.25
               AS stored_threshold
    FROM events
"""


def config_resolve_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_CONFIG_ROWS_SQL}),
        g AS (
          SELECT *,
                 row_exists AND NOT read_raised AS ex
          FROM r)
        SELECT ws_id,
               CASE WHEN read_raised THEN 'error_empty'
                    WHEN ex THEN 'stored'
                    ELSE 'defaults' END AS source,
               CASE WHEN ex THEN stored_model
                    WHEN read_raised THEN NULL
                    ELSE 'claude' END AS discovery_model,
               CAST(CASE WHEN ex THEN stored_chunk_size
                    WHEN read_raised THEN NULL
                    ELSE 1000 END AS INT) AS chunk_size,
               CAST(CASE WHEN ex THEN stored_threshold
                    WHEN read_raised THEN NULL
                    ELSE 0.7 END AS DOUBLE) AS quality_threshold,
               CASE WHEN ex AND stored_has_id THEN 'update'
                    ELSE 'insert' END AS write_branch
        FROM g
    """
