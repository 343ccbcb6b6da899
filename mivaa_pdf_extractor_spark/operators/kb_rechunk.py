"""KB rechunk-service fold: the chunk-row insert shape.

Re-expresses ``app/services/kb/kb_chunk_service.py:24-113``
(``rechunk_doc``'s per-chunk row assembly — the chunker itself is the
C1-C10 battery; this pins the SERVICE's row shaping):

- ``heading or None`` — an empty-string heading stores NULL;
- ``token_count = len(content) // 4`` — integer truncation;
- the pgvector literal gate is ``if not emb`` — an EMPTY embedding
  list folds to NULL exactly like a failed (None) embedding, and then
  ``embedding_model`` is NULLed too (model stamped only WITH a vector,
  pin);
- the summary counts ``failed`` as falsy embeddings, so the empty-list
  case counts as failed even though the chunk row is still stored.

Map-side projection + one groupBy for the summary twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kb_rechunk_rows(chunks: DataFrame) -> DataFrame:
    has_vec = (F.col("embedding_len").isNotNull()
               & (F.col("embedding_len") > 0))
    return chunks.select(
        "doc_id", "chunk_index",
        F.nullif(F.coalesce(F.col("heading"), F.lit("")), F.lit(""))
        .alias("heading_out"),
        F.floor(F.length(F.col("content")) / 4).cast("int")
        .alias("token_count"),
        has_vec.alias("has_vector"),
        F.when(has_vec, F.col("model")).otherwise(
            F.lit(None).cast("string")).alias("embedding_model"),
        (~has_vec).alias("counts_failed"))


def synth_kb_chunks(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        (e % 37).cast("long").alias("doc_id"),
        F.floor(e / 37).cast("int").alias("chunk_index"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("Section "), (e % 9).cast("string")))
        .alias("heading"),
        F.repeat(F.lit("word "), (e % 40 + 1).cast("int"))
        .alias("content"),
        F.when(e % 6 == 0, F.lit(None).cast("int"))
        .when(e % 6 == 1, F.lit(0))
        .otherwise(F.lit(1024)).alias("embedding_len"),
        F.lit("voyage-4").alias("model"))


SYNTH_KB_CHUNKS_SQL = """
    SELECT CAST(event_id % 37 AS BIGINT) AS doc_id,
           CAST(event_id // 37 AS INT) AS chunk_index,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'Section ' || CAST(event_id % 9 AS VARCHAR)
           END AS heading,
           repeat('word ', CAST(event_id % 40 + 1 AS INT)) AS content,
           CAST(CASE WHEN event_id % 6 = 0 THEN NULL
                WHEN event_id % 6 = 1 THEN 0
                ELSE 1024 END AS INT) AS embedding_len,
           'voyage-4' AS model
    FROM events
"""


def kb_rechunk_sql() -> str:
    return f"""
        WITH c AS ({SYNTH_KB_CHUNKS_SQL})
        SELECT doc_id, chunk_index,
               nullif(coalesce(heading, ''), '') AS heading_out,
               CAST(length(content) // 4 AS INT) AS token_count,
               embedding_len IS NOT NULL AND embedding_len > 0
                   AS has_vector,
               CASE WHEN embedding_len IS NOT NULL
                         AND embedding_len > 0
                    THEN model END AS embedding_model,
               NOT (embedding_len IS NOT NULL AND embedding_len > 0)
                   AS counts_failed
        FROM c
    """
