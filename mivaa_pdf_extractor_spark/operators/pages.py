"""Page-embedding ledger semantics (the reference's 8th fusion vector).

The reference embeds one multimodal vector per physical page and keeps a
per-page ledger row for EVERY outcome, because three invariants are
load-bearing (`app/services/embeddings/page_embedding_service.py`, pinned
by `tests/unit/test_page_embeddings.py`):

- **Tenant fail-closed** (`_load_document`, page_embedding_service.py:244-281):
  a caller workspace that does not match the document row's owner is
  refused, and a document row with NO workspace_id is refused too — an
  unattributable vector in a tenant collection cannot be filtered out of
  another tenant's search.
- **No silent caps** (`_resolve_target_pages`, :302-325): the requested
  page list is de-duplicated, bounded to [1, total_pages] and capped at
  ``max_pages`` — and the capped tail is REPORTED (decision rows, not a
  quiet truncation), because "a document quietly embedding its first 500
  pages and reporting success" is the exact failure the rule names.
- **A page is only `embedded` if a vector actually landed**
  (`_embed_one_page`, :404-496): render failure -> failed; a blank AND
  textless render (PNG under ``MIN_RENDER_BYTES`` — a uniform page
  compresses to almost nothing) -> `skipped`, a decided outcome that is
  never retried; an empty provider response or a refused vector upsert
  -> failed, in that precedence; only the full ladder passing writes
  `embedded`.

Already-decided pages (`_already_embedded`, :327-348) are those whose
ledger row has status `embedded` OR `skipped` AND carries the current
payload ``schema_version`` — a row written under an older schema is
stale by definition and gets re-embedded.

Everything here is native Column logic over (doc, page) rows: the page
fan-out is a bounded ``posexplode(sequence(...))``, the already-filter is
an equi-join on (doc_id, page_number), the cap is a per-doc window
row_number — at 10^12 documents this is one shuffle on doc_id for the
window plus one equi-join, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: page_embedding_service.py:63 — PNG byte size as a blankness proxy.
MIN_RENDER_BYTES = 3_000

#: page_embedding_service.py:69 — cap page text so a text-dense page
#: cannot push the image out of the embedding payload.
MAX_PAGE_TEXT_CHARS = 8_000

#: page_embedding_service.py:74 — one definition of the render path.
PAGE_STORAGE_PATTERN = "extracted/%s/pages/page-%04d.png"

#: page_embedding_service.py:336 — ledger states that count as decided.
DECIDED_STATUSES = ("embedded", "skipped")


def page_storage_path(doc_id: F.Column, page_number: F.Column) -> F.Column:
    """page_embedding_service.py:71-73 — storage path for a page render."""
    return F.format_string(PAGE_STORAGE_PATTERN, doc_id.cast("string"),
                           page_number.cast("int"))


def cap_page_text(text: F.Column) -> F.Column:
    """Truncate page text to the payload budget (:66-69). The cap keeps
    the IMAGE in the payload; blankness is judged on the capped text,
    which agrees with the original on emptiness."""
    return F.substring(text, 1, MAX_PAGE_TEXT_CHARS)


def plan_page_targets(docs: DataFrame, ledger: DataFrame,
                      caller_workspace: str,
                      max_pages: int = 500,
                      schema_version: int = 2) -> DataFrame:
    """Per-page embedding plan with every exclusion reported.

    Args:
        docs: (doc_id, workspace_id, total_pages) document rows.
        ledger: (doc_id, page_number, cache_status, schema_version)
            prior ledger rows.
        caller_workspace: the caller's tenant (checked AGAINST the row).
        max_pages: per-document page cap (PAGE_EMBEDDING_MAX_PAGES).
        schema_version: current payload schema; older ledger rows are
            stale and re-embedded (:343-346).

    Returns one row per (doc_id, page_number) candidate — plus one
    page_number-NULL row per refused document — with ``decision`` in:

    - ``refused_no_workspace`` / ``refused_tenant``: doc-level fail-closed
      gate; no pages are planned at all.
    - ``over_cap``: page rank in the full per-doc page list exceeds
      ``max_pages``. The cap applies to the page LIST, before the
      already-filter, exactly as ``_resolve_target_pages`` does.
    - ``already``: a current-schema decided ledger row exists.
    - ``pending``: embed this page.
    """
    doc_gate = (
        F.when(F.col("workspace_id").isNull()
               | (F.trim(F.col("workspace_id")) == ""),
               F.lit("refused_no_workspace"))
        .when(F.col("workspace_id") != F.lit(caller_workspace),
              F.lit("refused_tenant")))
    gated = docs.select("doc_id", "total_pages", doc_gate.alias("refusal"))

    refused = (gated.filter(F.col("refusal").isNotNull())
               .select("doc_id", F.lit(None).cast("int").alias("page_number"),
                       F.col("refusal").alias("decision")))

    # guard: Spark sequence(1, 0) is DESCENDING, not empty — a zero-page
    # document must plan zero pages
    fanout = F.when(
        F.col("total_pages") >= 1,
        F.sequence(F.lit(1), F.col("total_pages").cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    pages = (gated.filter(F.col("refusal").isNull())
             .select("doc_id", F.explode(fanout).alias("page_number")))
    rank = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("page_number"))
    pages = pages.withColumn("page_rank", rank)

    decided = (ledger
               .filter(F.col("cache_status").isin(*DECIDED_STATUSES)
                       & (F.coalesce(F.col("schema_version"), F.lit(0))
                          >= F.lit(schema_version)))
               .select("doc_id", "page_number")
               .distinct()
               .withColumn("is_decided", F.lit(True)))

    planned = (pages.join(decided, ["doc_id", "page_number"], "left")
               .select(
                   "doc_id", "page_number",
                   F.when(F.col("page_rank") > F.lit(max_pages),
                          F.lit("over_cap"))
                    .when(F.col("is_decided"), F.lit("already"))
                    .otherwise(F.lit("pending")).alias("decision")))
    return planned.unionByName(refused)


def page_embed_outcomes(pages: DataFrame) -> DataFrame:
    """The `_embed_one_page` outcome ladder (:404-496) as one native
    when-chain. Input rows carry the (deterministically synthesized or
    real) side-effect results:

    - ``render_ok`` (bool): the render call did not raise.
    - ``render_bytes`` (int, nullable): PNG size; NULL = render returned
      nothing.
    - ``page_text`` (string, nullable): silver-layer page text (capped
      here to ``MAX_PAGE_TEXT_CHARS``).
    - ``provider_empty`` (bool): the embedding provider returned nothing.
    - ``upsert_refused`` (bool): the vector store refused the upsert.

    Output stamps ``cache_status`` + ``error`` in the reference's exact
    precedence, plus ``storage_path`` and the payload's ``has_text`` flag.
    A failed ladder NEVER writes `embedded` — the row is what the
    backfill reads, and a row claiming success over a refused upsert
    makes the page invisible forever (:479-489).
    """
    text = cap_page_text(F.coalesce(F.col("page_text"), F.lit("")))
    textless = F.trim(text) == ""
    blank = (F.col("render_bytes") < F.lit(MIN_RENDER_BYTES)) & textless
    status = (
        F.when(~F.col("render_ok"), F.lit("failed"))
        .when(F.col("render_bytes").isNull(), F.lit("failed"))
        .when(blank, F.lit("skipped"))
        .when(F.col("provider_empty"), F.lit("failed"))
        .when(F.col("upsert_refused"), F.lit("failed"))
        .otherwise(F.lit("embedded")))
    error = (
        F.when(~F.col("render_ok"), F.lit("render raised"))
        .when(F.col("render_bytes").isNull(),
              F.lit("render returned nothing"))
        .when(blank, F.lit(None).cast("string"))
        .when(F.col("provider_empty"),
              F.lit("embedding provider returned nothing"))
        .when(F.col("upsert_refused"), F.lit("vecs upsert refused"))
        .otherwise(F.lit(None).cast("string")))
    # the render is cached for embedded pages and for failures past the
    # blank gate (the upload happens before embed, :443-445); blank pages
    # are recorded without a path (nothing uploaded, :436-441)
    path_written = status.isin("embedded") | (
        (status == "failed") & F.col("render_ok")
        & F.col("render_bytes").isNotNull() & ~blank)
    return pages.select(
        "doc_id", "page_number",
        status.alias("cache_status"),
        error.alias("error"),
        F.when(path_written,
               page_storage_path(F.col("doc_id"), F.col("page_number")))
         .alias("storage_path"),
        (~textless).alias("has_text"))


def page_embed_summary(decisions: DataFrame,
                       outcomes: DataFrame) -> DataFrame:
    """Per-document run summary (embed_document_pages :131-242): executed
    outcomes counted by status, plus the reported exclusions. One
    partial-aggregating groupBy; refusals carry their reason through.
    """
    executed = outcomes.select(
        "doc_id",
        F.when(F.col("cache_status") == "embedded", 1).otherwise(0)
         .alias("embedded"),
        F.when(F.col("cache_status") == "skipped", 1).otherwise(0)
         .alias("skipped_blank"),
        F.when(F.col("cache_status") == "failed", 1).otherwise(0)
         .alias("failed"),
        F.lit(0).alias("already"), F.lit(0).alias("over_cap"),
        F.lit(None).cast("string").alias("refusal"))
    planned = decisions.filter(F.col("decision") != "pending").select(
        "doc_id", F.lit(0).alias("embedded"), F.lit(0).alias("skipped_blank"),
        F.lit(0).alias("failed"),
        F.when(F.col("decision") == "already", 1).otherwise(0)
         .alias("already"),
        F.when(F.col("decision") == "over_cap", 1).otherwise(0)
         .alias("over_cap"),
        F.when(F.col("decision").startswith("refused"), F.col("decision"))
         .alias("refusal"))
    return (executed.unionByName(planned)
            .groupBy("doc_id")
            .agg(F.sum("embedded").alias("n_embedded"),
                 F.sum("skipped_blank").alias("n_skipped_blank"),
                 F.sum("failed").alias("n_failed"),
                 F.sum("already").alias("n_already"),
                 F.sum("over_cap").alias("n_over_cap"),
                 F.max("refusal").alias("refusal")))


# ---------------------------------------------------------------------------
# Stage-1 physical-page validation
# (app/api/pdf_processing/stage_1_focused_extraction.py:87-121)
# ---------------------------------------------------------------------------

def stage1_page_validate(reqs: "DataFrame") -> "DataFrame":
    """Pins:

    - the bound gate is `if physical_page_upper_bound and page >
      bound` — a FALSY bound (0/None) disables the upper check
      entirely (pin); the comparison is STRICT so page == bound is
      kept;
    - pages land in TWO different drop buckets: out-of-bounds pages
      are counted + logged loud (the 2026-05-01 sheets-vs-physical
      regression), while non-positive pages are dropped SILENTLY by
      the `> 0` keep (pin);
    - order: bound check first — with a falsy bound a non-positive
      page still silently drops.
    """
    from pyspark.sql import functions as F
    bound = F.col("upper_bound")
    has_bound = bound.isNotNull() & (bound != 0)
    pages = F.coalesce(F.col("page_range"),
                       F.array().cast("array<int>"))
    oob = F.when(has_bound,
                 F.filter(pages, lambda p: p > bound)) \
        .otherwise(F.array().cast("array<int>"))
    kept = F.filter(pages,
                    lambda p: (~has_bound | (p <= bound)) & (p > 0))
    return reqs.select(
        "req_id",
        F.size(kept).alias("n_physical_pages"),
        F.array_join(F.transform(kept,
                                 lambda p: p.cast("string")), ",")
        .alias("physical_pages"),
        F.size(oob).alias("n_dropped_out_of_bounds"),
        (F.size(pages) - F.size(kept) - F.size(oob)).cast("int")
        .alias("n_dropped_silently"))


def synth_stage1_reqs(events: "DataFrame") -> "DataFrame":
    from pyspark.sql import functions as F
    e = F.col("event_id")
    return (events.where(e % 11 == 0).select(
        e.cast("long").alias("req_id"),
        F.when(e % 5 == 0, F.lit(None).cast("int"))
        .when(e % 5 == 1, F.lit(0))
        .otherwise((e % 20 + 4).cast("int")).alias("upper_bound"),
        F.when(e % 7 == 0, F.lit(None).cast("array<int>"))
        .otherwise(F.transform(
            F.sequence(F.lit(0), (e % 6 + 2).cast("int")),
            lambda k: ((e + k * 7) % 30 - 3).cast("int")))
        .alias("page_range")))


SYNTH_STAGE1_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           CAST(CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN 0
                ELSE event_id % 20 + 4 END AS INT) AS upper_bound,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE list_transform(
                  generate_series(0, event_id % 6 + 2),
                  k -> CAST((event_id + k * 7) % 30 - 3 AS INT)) END
               AS page_range
    FROM events WHERE event_id % 11 = 0
"""


def stage1_validate_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_STAGE1_SQL}),
        g AS (
          SELECT *,
                 upper_bound IS NOT NULL AND upper_bound <> 0
                     AS has_bound,
                 coalesce(page_range, CAST([] AS INT[])) AS pages
          FROM r),
        k AS (
          SELECT *,
                 CASE WHEN has_bound THEN list_filter(pages,
                      p -> p > upper_bound)
                      ELSE CAST([] AS INT[]) END AS oob,
                 list_filter(pages, p -> (NOT has_bound
                      OR p <= upper_bound) AND p > 0) AS kept
          FROM g)
        SELECT req_id,
               CAST(len(kept) AS INT) AS n_physical_pages,
               coalesce(array_to_string(list_transform(kept,
                   p -> CAST(p AS VARCHAR)), ','), '')
                   AS physical_pages,
               CAST(len(oob) AS INT) AS n_dropped_out_of_bounds,
               CAST(len(pages) - len(kept) - len(oob) AS INT)
                   AS n_dropped_silently
        FROM k
    """
