"""Parallel product-processor folds
(app/api/pdf_processing/parallel_product_processor.py) — the
orchestration shell's deterministic decisions as batch plans. The
per-product work itself (Claude/HF calls) is network and out of scope;
what IS pinned:

- mode gate (:120-121): sequential iff ``not enable_parallel or
  total_products <= 2`` — the small-catalog cutoff is INCLUSIVE at 2;
- per-product timeout (:162-163): env override else 600 s, and the
  timeout-failure message ``"Per-product timeout ({t}s) exceeded"``
  (:263-264);
- failure-path product-id synthesis (:262, :301):
  ``product_{index}_{name.replace(' ', '_')}`` — 1-based index, only
  SPACES are replaced (tabs/punctuation survive);
- metrics accounting (:212-231, :296-320, :338-365):
  * completed/chunks/images/relationships/clip_embeddings accumulate
    ONLY on success rows; failed results touch only the failed counter;
  * a gather-level exception appends an error row carrying just the
    POSITIONAL index (i+1) and str(e) — and does NOT increment
    products_failed (the metrics dict is only mutated inside the
    per-product handlers, which a gather exception bypassed) — pin;
  * a failed result appends an error row only when its error string is
    TRUTHY (``if not res.success and res.error`` — '' appends nothing,
    yet still counts as failed) — pin;
  * the post-pass chunk-image linking adds its count to
    total_relationships_created; a linking failure adds 0 (:366-373);
- progress ladder (:229-233): after the k-th completion-or-failure,
  ``progress = int((k / total) * 70) + 15`` — int() truncation toward
  zero (non-negative here, so floor), the 15..85 band.

Scale: the rollup is one map-side-combinable groupBy(doc); the ladder
is posexplode over a bounded sequence; everything else is map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_TIMEOUT_S = 600  # PRODUCT_PROCESSING_TIMEOUT_SECONDS default (:163)
SEQUENTIAL_CUTOFF = 2    # total_products <= 2 (:120)


def fanout_plan(docs: DataFrame) -> DataFrame:
    """Mode pick + effective per-product timeout per catalog."""
    seq = (~F.col("enable_parallel")) \
        | (F.col("n_products") <= SEQUENTIAL_CUTOFF)
    return docs.select(
        "doc_id",
        F.when(seq, F.lit("sequential")).otherwise(F.lit("parallel"))
        .alias("mode"),
        F.coalesce(F.col("timeout_env"), F.lit(DEFAULT_TIMEOUT_S))
        .cast("long").alias("per_product_timeout"),
        F.when(seq, F.lit(None).cast("long"))
        .otherwise(F.col("max_concurrent").cast("long"))
        .alias("effective_concurrency"),
        F.col("n_products").cast("long").alias("n_tasks"))


def fanout_rollup(results: DataFrame, links: DataFrame) -> DataFrame:
    """Per-document ParallelProcessingResult accounting (:338-373)."""
    ok = F.col("success") & ~F.col("gather_exception")
    failed = ~F.col("success") & ~F.col("gather_exception")
    agg = results.groupBy("doc_id").agg(
        F.sum(ok.cast("long")).alias("products_completed"),
        # gather-level exceptions bypass the metrics dict entirely
        F.sum(failed.cast("long")).alias("products_failed"),
        F.sum(F.when(ok, F.col("chunks")).otherwise(0))
        .cast("long").alias("total_chunks_created"),
        F.sum(F.when(ok, F.col("images")).otherwise(0))
        .cast("long").alias("total_images_processed"),
        F.sum(F.when(ok, F.col("relationships")).otherwise(0))
        .cast("long").alias("rel_from_products"),
        F.sum(F.when(ok, F.col("clip_embeddings")).otherwise(0))
        .cast("long").alias("total_clip_embeddings"),
        # error rows: every gather exception + failed results whose
        # error string is truthy ('' failed rows count in
        # products_failed but emit NO error row)
        F.sum((F.col("gather_exception")
               | (failed & F.col("error").isNotNull()
                  & (F.col("error") != ""))).cast("long"))
        .alias("n_error_rows"))
    return (agg.join(links, "doc_id", "left")
            .select(agg["*"],
                    (F.col("rel_from_products")
                     + F.when(F.col("link_failed"), F.lit(0))
                     .otherwise(F.coalesce(F.col("link_count"), F.lit(0))))
                    .cast("long").alias("total_relationships_created")))


def failure_rows(results: DataFrame) -> DataFrame:
    """The failure-path rows the handlers write: synthesized
    product_id + error message (timeout vs exception) (:255-327)."""
    fail = ~F.col("success") & ~F.col("gather_exception")
    return results.filter(fail).select(
        "doc_id", "product_index",
        F.concat(F.lit("product_"), F.col("product_index"), F.lit("_"),
                 F.regexp_replace(F.col("product_name"), " ", "_"))
        .alias("product_id"),
        F.when(F.col("timed_out"),
               F.concat(F.lit("Per-product timeout ("),
                        F.col("timeout_s"), F.lit("s) exceeded")))
        .otherwise(F.col("error")).alias("error_message"))


def progress_ladder(docs: DataFrame) -> DataFrame:
    """progress = int((k/total)*70) + 15 for k = 1..total (:229-233)."""
    d = docs.filter(F.col("n_products") > 0)
    return d.select(
        "doc_id", F.col("n_products").cast("long").alias("n_products"),
        F.posexplode(F.sequence(F.lit(1), F.col("n_products")))
    ).select(
        "doc_id", "n_products",
        F.col("col").cast("long").alias("k"),
        (F.floor(F.col("col").cast("double") / F.col("n_products") * 70)
         + 15).cast("long").alias("progress"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

_DOCS = 80
_PER_DOC = 15


def synth_fanout_docs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.filter(e < 150).select(
        e.alias("doc_id"),
        (e % 8).cast("long").alias("n_products"),
        (e % 5 != 0).alias("enable_parallel"),
        F.when(e % 4 == 0, F.lit(None).cast("long"))
        .otherwise((120 + (e % 6) * 60).cast("long")).alias("timeout_env"),
        (2 + e % 4).cast("long").alias("max_concurrent"))


SYNTH_FANOUT_DOCS_SQL = """
    SELECT event_id AS doc_id,
           CAST(event_id % 8 AS BIGINT) AS n_products,
           event_id % 5 <> 0 AS enable_parallel,
           CASE WHEN event_id % 4 = 0 THEN NULL
                ELSE CAST(120 + (event_id % 6) * 60 AS BIGINT) END
               AS timeout_env,
           CAST(2 + event_id % 4 AS BIGINT) AS max_concurrent
    FROM events WHERE event_id < 150
"""


def synth_fanout_results(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.filter(e < _DOCS * _PER_DOC).select(
        (e % _DOCS).cast("long").alias("doc_id"),
        (F.floor(e / _DOCS) + 1).cast("long").alias("product_index"),
        F.concat(F.lit("Prod "), e % 13, F.lit(" v"), e % 3)
        .alias("product_name"),
        ((e * 7) % 5 != 0).alias("success"),
        (e % 31 == 0).alias("gather_exception"),
        ((e * 3) % 11 == 0).alias("timed_out"),
        F.when((e * 3) % 7 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("err-"), e)).alias("error"),
        F.lit(600).cast("long").alias("timeout_s"),
        (e % 12).cast("long").alias("chunks"),
        (e % 5).cast("long").alias("images"),
        (e % 4).cast("long").alias("relationships"),
        (e % 3).cast("long").alias("clip_embeddings"))


SYNTH_FANOUT_RESULTS_SQL = f"""
    SELECT CAST(event_id % {_DOCS} AS BIGINT) AS doc_id,
           CAST(event_id // {_DOCS} + 1 AS BIGINT) AS product_index,
           'Prod ' || CAST(event_id % 13 AS VARCHAR) || ' v' ||
               CAST(event_id % 3 AS VARCHAR) AS product_name,
           (event_id * 7) % 5 <> 0 AS success,
           event_id % 31 = 0 AS gather_exception,
           (event_id * 3) % 11 = 0 AS timed_out,
           CASE WHEN (event_id * 3) % 7 = 0 THEN ''
                ELSE 'err-' || CAST(event_id AS VARCHAR) END AS error,
           CAST(600 AS BIGINT) AS timeout_s,
           CAST(event_id % 12 AS BIGINT) AS chunks,
           CAST(event_id % 5 AS BIGINT) AS images,
           CAST(event_id % 4 AS BIGINT) AS relationships,
           CAST(event_id % 3 AS BIGINT) AS clip_embeddings
    FROM events WHERE event_id < {_DOCS * _PER_DOC}
"""


def synth_links(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.filter(e < _DOCS - 10).select(  # some docs have no row
        e.alias("doc_id"),
        F.when(e % 6 == 0, F.lit(None).cast("long"))
        .otherwise((e % 9).cast("long")).alias("link_count"),
        (e % 7 == 0).alias("link_failed"))


SYNTH_LINKS_SQL = f"""
    SELECT event_id AS doc_id,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE CAST(event_id % 9 AS BIGINT) END AS link_count,
           event_id % 7 = 0 AS link_failed
    FROM events WHERE event_id < {_DOCS - 10}
"""


def fanout_plan_sql() -> str:
    return f"""
        WITH docs AS ({SYNTH_FANOUT_DOCS_SQL})
        SELECT doc_id,
               CASE WHEN NOT enable_parallel
                      OR n_products <= {SEQUENTIAL_CUTOFF}
                    THEN 'sequential' ELSE 'parallel' END AS mode,
               CAST(coalesce(timeout_env, {DEFAULT_TIMEOUT_S}) AS BIGINT)
                   AS per_product_timeout,
               CASE WHEN NOT enable_parallel
                      OR n_products <= {SEQUENTIAL_CUTOFF}
                    THEN NULL ELSE max_concurrent END
                   AS effective_concurrency,
               n_products AS n_tasks
        FROM docs
    """


def fanout_rollup_sql() -> str:
    return f"""
        WITH results AS ({SYNTH_FANOUT_RESULTS_SQL}),
        links AS ({SYNTH_LINKS_SQL}),
        agg AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN success AND NOT gather_exception
                               THEN 1 ELSE 0 END) AS BIGINT)
                     AS products_completed,
                 CAST(sum(CASE WHEN NOT success AND NOT gather_exception
                               THEN 1 ELSE 0 END) AS BIGINT)
                     AS products_failed,
                 CAST(sum(CASE WHEN success AND NOT gather_exception
                               THEN chunks ELSE 0 END) AS BIGINT)
                     AS total_chunks_created,
                 CAST(sum(CASE WHEN success AND NOT gather_exception
                               THEN images ELSE 0 END) AS BIGINT)
                     AS total_images_processed,
                 CAST(sum(CASE WHEN success AND NOT gather_exception
                               THEN relationships ELSE 0 END) AS BIGINT)
                     AS rel_from_products,
                 CAST(sum(CASE WHEN success AND NOT gather_exception
                               THEN clip_embeddings ELSE 0 END) AS BIGINT)
                     AS total_clip_embeddings,
                 CAST(sum(CASE WHEN gather_exception
                            OR (NOT success AND NOT gather_exception
                                AND error IS NOT NULL AND error <> '')
                               THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_error_rows
          FROM results GROUP BY doc_id)
        SELECT agg.*,
               CAST(rel_from_products +
                    CASE WHEN l.link_failed THEN 0
                         ELSE coalesce(l.link_count, 0) END AS BIGINT)
                   AS total_relationships_created
        FROM agg LEFT JOIN links l USING (doc_id)
    """


def failure_rows_sql() -> str:
    return f"""
        WITH results AS ({SYNTH_FANOUT_RESULTS_SQL})
        SELECT doc_id, product_index,
               'product_' || CAST(product_index AS VARCHAR) || '_' ||
                   replace(product_name, ' ', '_') AS product_id,
               CASE WHEN timed_out
                    THEN 'Per-product timeout (' ||
                         CAST(timeout_s AS VARCHAR) || 's) exceeded'
                    ELSE error END AS error_message
        FROM results WHERE NOT success AND NOT gather_exception
    """


def progress_ladder_sql() -> str:
    return f"""
        WITH docs AS ({SYNTH_FANOUT_DOCS_SQL})
        SELECT doc_id, n_products,
               CAST(k AS BIGINT) AS k,
               CAST(floor(CAST(k AS DOUBLE) / n_products * 70) + 15
                    AS BIGINT) AS progress
        FROM docs, unnest(generate_series(1, CAST(n_products AS INT))) t(k)
        WHERE n_products > 0
    """
