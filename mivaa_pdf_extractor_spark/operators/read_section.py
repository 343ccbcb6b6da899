"""Read-section endpoint folds
(app/api/rag_routes.py:6692-6877, ``read_document_section``).

The kb-side access-scope resolution and RPC argument shaping are
covered by the kb_docs / kb_rpc_args folds; this module folds the
endpoint's own deterministic core over the PDF corpus:

* request ladder (:6723-6745): ``source = (raw or 'kb').strip().
  lower()`` — anything outside {kb, pdf} is a 400;
  ``from = max(0, from_raw)`` (negative clamps to 0);
  ``to = to_raw if provided else from + 3``, and ``to < from``
  clamps UP to ``from`` (a backwards span reads exactly one section
  — pin); pdf without document_id is a 400;
* span read: the ``(document, product)`` index namespace again —
  ``chunk_index`` restarts per product (same invariant as the
  expansion fold); an EMPTY span answers 404, indistinguishable from
  an inaccessible doc (anti-probing pin);
* PDF row normalization (:6754-6771): heading = ``page {n}`` only
  when page_number is present (else NULL); token_count =
  ``max(1, len(content) // 4)`` (the PDF corpus has no token column);
  document_title falls back to product_name;
* token budget (:6816-6837): sections are returned WHOLE and the
  FIRST section is ALWAYS kept — the guard is ``if kept and spent +
  tokens > budget``, so a single oversized opening section ships
  (pin); subsequent sections stop at the boundary and set
  ``truncated``;
* the outline (:6842-6850) covers the FULL requested span including
  everything the budget cut, and ``doc_chunk_count`` int-folds NULL
  to 0.

Scale: requests broadcast against the span-bounded chunk join
(<= to-from+1 rows per request), then a per-request sorted-array
aggregate HOF replays the budget — no shuffle beyond the join and the
per-request collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def resolve_requests(reqs: DataFrame) -> DataFrame:
    """Validation + span resolution. Emits (req_id, status, source,
    from_idx, to_idx)."""
    source = F.lower(F.trim(F.coalesce("source_raw", F.lit("kb"))))
    bad_source = ~source.isin("kb", "pdf")
    missing_pdf_id = (source == "pdf") & F.col("document_id").isNull()
    missing_kb_id = (source == "kb") & F.col("kb_doc_id").isNull()
    from_idx = F.greatest(F.lit(0), F.col("from_raw"))
    # the default span builds on the CLAMPED from (reference computes
    # from_idx first): max(0, from) + 3
    to_idx = F.coalesce(F.col("to_raw"), from_idx + 3)
    to_idx = F.greatest(to_idx, from_idx)     # backwards span clamp
    status = (F.when(bad_source, "400_bad_source")
              .when(missing_pdf_id, "400_missing_document_id")
              .when(missing_kb_id, "400_missing_kb_doc_id")
              .otherwise("ok"))
    return reqs.select(
        "req_id", status.alias("status"), source.alias("source"),
        F.when(status == "ok", from_idx).cast("int")
        .alias("from_idx"),
        F.when(status == "ok", to_idx).cast("int").alias("to_idx"),
        "document_id", "product_id", "max_tokens")


def read_pdf_sections(reqs: DataFrame, chunks: DataFrame) -> DataFrame:
    """The pdf-source read for the valid pdf requests: per request,
    the budget-folded section run + outline stats; empty span -> 404
    row."""
    r = resolve_requests(reqs).where(
        (F.col("status") == "ok") & (F.col("source") == "pdf"))
    c = chunks.select(
        F.col("document_id").alias("_cd"),
        F.col("product_id").alias("_cp"),
        F.col("chunk_id").alias("_cid"),
        F.col("chunk_index").alias("_cix"),
        F.coalesce("content", F.lit("")).alias("_ct"),
        F.col("page_number").alias("_pg"),
        F.col("product_name").alias("_pn"),
        F.col("document_title").alias("_dt"))
    j = r.join(
        c,
        (r["document_id"] == F.col("_cd"))
        & (r["product_id"] == F.col("_cp"))
        & (F.col("_cix") >= r["from_idx"])
        & (F.col("_cix") <= r["to_idx"]), "left")
    tok = F.greatest(F.lit(1), F.floor(F.length("_ct") / 4))
    row = F.struct(
        F.col("_cix").cast("long").alias("ix"),
        F.col("_cid").cast("long").alias("cid"),
        tok.cast("long").alias("tok"),
        F.when(F.col("_pg").isNotNull(),
               F.concat(F.lit("page "), F.col("_pg").cast("string")))
        .alias("heading"),
        F.coalesce(F.col("_dt"), F.col("_pn")).alias("title"))
    g = (j.groupBy("req_id", "max_tokens")
         .agg(F.array_sort(F.collect_list(
             F.when(F.col("_cid").isNotNull(), row))).alias("_rows")))
    # budget replay: first row always kept (the `if kept and ...`
    # guard skips the first iteration)
    init = F.struct(F.lit(0).cast("long").alias("spent"),
                    F.lit(0).cast("long").alias("kept"),
                    F.lit(False).alias("stop"))
    folded = F.aggregate(
        F.col("_rows"), init,
        lambda acc, x: F.when(
            acc["stop"]
            | ((acc["kept"] > 0)
               & (acc["spent"] + x["tok"] > F.col("max_tokens"))),
            F.struct(acc["spent"].alias("spent"),
                     acc["kept"].alias("kept"),
                     F.lit(True).alias("stop")))
        .otherwise(F.struct(
            (acc["spent"] + x["tok"]).alias("spent"),
            (acc["kept"] + 1).alias("kept"),
            F.lit(False).alias("stop"))))
    n_rows = F.size("_rows")
    found = n_rows > 0
    kept_n = folded["kept"]
    return g.select(
        "req_id",
        F.when(found, "200").otherwise("404_not_found")
        .alias("status"),
        F.when(found, folded["spent"]).alias("token_total"),
        F.when(found, kept_n.cast("int")).alias("chunks_returned"),
        F.when(found, folded["stop"]).cast("string")
        .alias("truncated"),
        F.when(found, F.array_join(
            F.transform(F.slice(F.col("_rows"), 1,
                                kept_n.cast("int")),
                        lambda x: x["ix"].cast("string")), ","))
        .alias("returned_chunk_indexes"),
        F.when(found, F.element_at(F.col("_rows"), 1)["title"])
        .alias("document_title"),
        F.when(found, F.element_at(F.col("_rows"), 1)["heading"])
        .alias("first_heading"),
        F.when(found, n_rows.cast("int")).alias("outline_rows"),
        F.when(found, F.aggregate(
            F.col("_rows"), F.lit(0).cast("long"),
            lambda a, x: a + x["tok"])).alias("outline_tokens"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------


def synth_section_chunks(events: DataFrame) -> DataFrame:
    """Unique chunk_index per (document, product): the pair has
    period 185, the index increments every 185 events."""
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("chunk_id"),
        (e % 37).cast("long").alias("document_id"),
        ((e % 37) * 5 + e % 5).cast("long").alias("product_id"),
        F.floor(e / 185).cast("int").alias("chunk_index"),
        F.when(e % 11 == 0, F.lit(""))
        .otherwise(F.repeat(F.concat(F.lit("s"),
                                     (e % 7).cast("string")),
                            ((e % 25) * 11 + 1).cast("int")))
        .alias("content"),
        F.when(e % 6 == 0, F.lit(None).cast("int"))
        .otherwise((F.floor(e / 185) / 2).cast("int") + 1)
        .alias("page_number"),
        F.concat(F.lit("Prod "),
                 ((e % 37) * 5 + e % 5).cast("string"))
        .alias("product_name"),
        F.when(e % 9 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("Doc "), (e % 37).cast("string")))
        .alias("document_title"))


SYNTH_SECTION_CHUNKS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS chunk_id,
           CAST(event_id % 37 AS BIGINT) AS document_id,
           CAST((event_id % 37) * 5 + event_id % 5 AS BIGINT)
               AS product_id,
           CAST(event_id // 185 AS INT) AS chunk_index,
           CASE WHEN event_id % 11 = 0 THEN ''
                ELSE repeat('s' || CAST(event_id % 7 AS VARCHAR),
                            CAST((event_id % 25) * 11 + 1 AS INT))
                END AS content,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE CAST((event_id // 185) // 2 AS INT) + 1 END
               AS page_number,
           'Prod ' || CAST((event_id % 37) * 5 + event_id % 5
                           AS VARCHAR) AS product_name,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE 'Doc ' || CAST(event_id % 37 AS VARCHAR) END
               AS document_title
    FROM events
"""


def synth_read_requests(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 13 == 0)
            .select(e.cast("long").alias("req_id"),
                    F.when(e % 7 == 0, F.lit(None).cast("string"))
                    .when(e % 7 == 1, F.lit(" PDF "))
                    .when(e % 7 == 2, F.lit("weird"))
                    .when(e % 7 < 5, F.lit("pdf"))
                    .otherwise(F.lit("kb")).alias("source_raw"),
                    F.when(e % 11 == 0, F.lit(None).cast("long"))
                    .otherwise((e % 37).cast("long"))
                    .alias("document_id"),
                    ((e % 37) * 5 + e % 5).cast("long")
                    .alias("product_id"),
                    F.when(e % 17 == 0, F.lit(None).cast("long"))
                    .otherwise((e % 23).cast("long"))
                    .alias("kb_doc_id"),
                    (F.when(e % 5 == 0, -2).otherwise(e % 9) )
                    .cast("int").alias("from_raw"),
                    F.when(e % 3 == 0, F.lit(None).cast("int"))
                    .when(e % 3 == 1, (e % 9 - 3).cast("int"))
                    .otherwise((e % 9 + 4).cast("int"))
                    .alias("to_raw"),
                    (20 + (e % 6) * 40).cast("long")
                    .alias("max_tokens")))


SYNTH_READ_REQUESTS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN ' PDF '
                WHEN event_id % 7 = 2 THEN 'weird'
                WHEN event_id % 7 < 5 THEN 'pdf'
                ELSE 'kb' END AS source_raw,
           CASE WHEN event_id % 11 = 0 THEN NULL
                ELSE CAST(event_id % 37 AS BIGINT) END
               AS document_id,
           CAST((event_id % 37) * 5 + event_id % 5 AS BIGINT)
               AS product_id,
           CASE WHEN event_id % 17 = 0 THEN NULL
                ELSE CAST(event_id % 23 AS BIGINT) END AS kb_doc_id,
           CAST(CASE WHEN event_id % 5 = 0 THEN -2
                ELSE event_id % 9 END AS INT) AS from_raw,
           CAST(CASE WHEN event_id % 3 = 0 THEN NULL
                WHEN event_id % 3 = 1 THEN event_id % 9 - 3
                ELSE event_id % 9 + 4 END AS INT) AS to_raw,
           CAST(20 + (event_id % 6) * 40 AS BIGINT) AS max_tokens
    FROM events WHERE event_id % 13 = 0
"""

_RESOLVE_SQL = f"""
        q AS ({SYNTH_READ_REQUESTS_SQL}),
        rr AS (
          SELECT *,
                 lower(trim(coalesce(source_raw, 'kb'))) AS source,
                 greatest(0, from_raw) AS f0,
                 greatest(coalesce(to_raw, greatest(0, from_raw) + 3),
                          greatest(0, from_raw)) AS t0
          FROM q),
        rv AS (
          SELECT req_id,
                 CASE WHEN source NOT IN ('kb', 'pdf')
                      THEN '400_bad_source'
                      WHEN source = 'pdf' AND document_id IS NULL
                      THEN '400_missing_document_id'
                      WHEN source = 'kb' AND kb_doc_id IS NULL
                      THEN '400_missing_kb_doc_id'
                      ELSE 'ok' END AS status,
                 source,
                 document_id, product_id, max_tokens,
                 CAST(f0 AS INT) AS from_idx0,
                 CAST(t0 AS INT) AS to_idx0
          FROM rr)
"""


def resolve_sql() -> str:
    return f"""
        WITH {_RESOLVE_SQL}
        SELECT req_id, status, source,
               CASE WHEN status = 'ok' THEN from_idx0 END
                   AS from_idx,
               CASE WHEN status = 'ok' THEN to_idx0 END AS to_idx,
               document_id, product_id, max_tokens
        FROM rv
    """


def read_pdf_sql() -> str:
    return f"""
        WITH {_RESOLVE_SQL},
        pr AS (SELECT * FROM rv
               WHERE status = 'ok' AND source = 'pdf'),
        c AS ({SYNTH_SECTION_CHUNKS_SQL}),
        sp AS (
          SELECT pr.req_id, pr.max_tokens, c.chunk_index AS ix,
                 c.chunk_id AS cid,
                 greatest(1, length(coalesce(c.content, '')) // 4)
                     AS tok,
                 CASE WHEN c.page_number IS NOT NULL
                      THEN 'page ' || CAST(c.page_number AS VARCHAR)
                      END AS heading,
                 coalesce(c.document_title, c.product_name)
                     AS title,
                 row_number() OVER (
                     PARTITION BY pr.req_id
                     ORDER BY c.chunk_index, c.chunk_id) AS pos
          FROM pr JOIN c
            ON pr.document_id = c.document_id
           AND pr.product_id = c.product_id
           AND c.chunk_index BETWEEN pr.from_idx0 AND pr.to_idx0),
        mx AS (SELECT req_id, max(pos) AS npos,
                      CAST(sum(tok) AS BIGINT) AS outline_tokens,
                      CAST(count(*) AS INT) AS outline_rows
               FROM sp GROUP BY req_id),
        rec AS (
          WITH RECURSIVE b(req_id, pos, spent, kept, stop) AS (
            SELECT req_id, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                   FALSE
            FROM pr
            UNION ALL
            SELECT b.req_id, b.pos + 1,
                   CASE WHEN b.stop OR (b.kept > 0
                             AND b.spent + sp.tok > sp.max_tokens)
                        THEN b.spent ELSE b.spent + sp.tok END,
                   CASE WHEN b.stop OR (b.kept > 0
                             AND b.spent + sp.tok > sp.max_tokens)
                        THEN b.kept ELSE b.kept + 1 END,
                   b.stop OR (b.kept > 0
                              AND b.spent + sp.tok > sp.max_tokens)
            FROM b JOIN sp ON sp.req_id = b.req_id
                          AND sp.pos = b.pos + 1)
          SELECT b.req_id, b.spent, b.kept, b.stop FROM b
          LEFT JOIN mx ON mx.req_id = b.req_id
          WHERE b.pos = coalesce(mx.npos, 0)),
        kept_ix AS (
          SELECT sp.req_id,
                 string_agg(CAST(sp.ix AS VARCHAR), ','
                            ORDER BY sp.pos) AS kept_idx
          FROM sp JOIN rec ON rec.req_id = sp.req_id
          WHERE sp.pos <= rec.kept
          GROUP BY sp.req_id),
        first_row AS (
          SELECT req_id, title, heading FROM sp WHERE pos = 1)
        SELECT pr.req_id,
               CASE WHEN mx.req_id IS NOT NULL THEN '200'
                    ELSE '404_not_found' END AS status,
               CASE WHEN mx.req_id IS NOT NULL THEN rec.spent END
                   AS token_total,
               CASE WHEN mx.req_id IS NOT NULL
                    THEN CAST(rec.kept AS INT) END
                   AS chunks_returned,
               CASE WHEN mx.req_id IS NOT NULL
                    THEN CAST(rec.stop AS VARCHAR) END AS truncated,
               CASE WHEN mx.req_id IS NOT NULL
                    THEN coalesce(k.kept_idx, '') END
                   AS returned_chunk_indexes,
               CASE WHEN mx.req_id IS NOT NULL THEN fr.title END
                   AS document_title,
               CASE WHEN mx.req_id IS NOT NULL THEN fr.heading END
                   AS first_heading,
               CASE WHEN mx.req_id IS NOT NULL
                    THEN mx.outline_rows END AS outline_rows,
               CASE WHEN mx.req_id IS NOT NULL
                    THEN mx.outline_tokens END AS outline_tokens
        FROM pr
        LEFT JOIN mx ON mx.req_id = pr.req_id
        LEFT JOIN rec ON rec.req_id = pr.req_id
        LEFT JOIN kept_ix k ON k.req_id = pr.req_id
        LEFT JOIN first_row fr ON fr.req_id = pr.req_id
    """
