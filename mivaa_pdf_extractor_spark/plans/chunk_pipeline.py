"""Stage-2 chunk indexing plan (SURVEY.md §3.1 step 7, §3.3).

The reference's indexing entry (`rag_service.index_pdf_content`,
rag_service.py:141-255) chunks the extracted pages, stamps ids and
positional metadata, classifies each chunk, and writes the namespace
idempotently — delete-then-insert per document (rag_service.py:271-309) so
a re-chunk never leaves stale rows. The Spark restatement:

    read extracted (latest state — the sink upserts, so a plain read)
      -> chunk_documents (layout-aware kernel, in-kernel C6 dedup,
         quality C5, positional metadata)
      -> classify_chunk_types (C11 pattern tier)
      -> chunk_id stamp ("{doc_id}_{chunk_index}", the reference's
         sub-chunk id shape unified_chunking_service.py:568-576)
      -> catalog.replace_namespace('chunks', key=doc_id)

The embedding + vector-store steps of the reference are network services
(out of scope per SURVEY §0); their data contract — a chunks table with
stable ids and per-chunk metadata addressed by (doc_id, chunk_index) — is
what this plan produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.chunking import (chunk_documents, classify_chunk_types,
                                  with_embedding_text)
from ..sources.tables_io import Catalog
from .pipeline import read_extracted_latest

CHUNKS_TABLE = "chunks"


def build_chunks(extracted: DataFrame, strategy: str = "layout",
                 max_size: int = 1000,
                 quality_threshold: float | None = None) -> DataFrame:
    """The chunk table plan: chunker -> classifier -> heading-context
    embedding text (C10 — the reference builds it right before the
    embedding call, kb_chunker.py:231-235) -> id stamp."""
    chunks = chunk_documents(extracted, strategy=strategy,
                             max_size=max_size,
                             quality_threshold=quality_threshold,
                             dedup=True)
    chunks = classify_chunk_types(chunks)
    chunks = with_embedding_text(chunks)
    return chunks.withColumn(
        "chunk_id",
        F.concat_ws("_", F.col("doc_id"),
                    F.col("chunk_index").cast("string")))


def run_chunk_indexing(spark: SparkSession, catalog: Catalog,
                       doc_ids: list[str] | None = None,
                       strategy: str = "layout",
                       max_size: int = 1000,
                       count_written: bool = False) -> int | None:
    """Chunk the current extracted state (optionally scoped to ``doc_ids``
    — partition pruning pushes the filter into the scan) and replace those
    documents' chunk namespaces. The namespace delete-set is the EXTRACTED
    doc ids, not the produced chunks' ids: a doc re-extracted as
    failed/empty yields zero chunks but must still shed its stale rows
    (ADVICE r3; the reference deletes the document namespace
    unconditionally, rag_service.py:271-309).

    Returns the number of chunks written when ``count_written`` — a
    post-write read of the touched namespaces, off by default so the
    default path does zero post-write reads (round-3 verdict item 8, same
    class as ``run_pipeline``'s opt-in ``count_input``)."""
    extracted = read_extracted_latest(catalog)
    if doc_ids is not None:
        extracted = extracted.filter(F.col("doc_id").isin(*doc_ids))
    chunks = build_chunks(extracted, strategy=strategy, max_size=max_size)
    written = extracted.select("doc_id").distinct()
    catalog.replace_namespace(chunks, CHUNKS_TABLE, key="doc_id",
                              delete_keys=written)
    if not count_written:
        return None
    # count only the namespaces THIS call wrote: a whole-table count would
    # include stale namespaces of docs no longer in the extracted state
    return (catalog.read(CHUNKS_TABLE)
            .join(written, "doc_id", "left_semi").count())
