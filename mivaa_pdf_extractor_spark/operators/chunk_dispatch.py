"""Page-level chunking dispatch (unified_chunking_service.py:103-366).

The strategy kernels themselves (semantic/fixed/hybrid C1-C3, the
layout-region fold C4, quality C5, dedup/quality filters C6/C7, xrefs
C8) are covered by ``operators/chunking.py``; this module folds the
per-page DISPATCH ladder of ``chunk_pages`` / ``_chunk_page_text`` /
``_select_chunking_strategy`` that routes every page into one of them:

* document-level gate (:183): ``use_layout_aware`` is true iff the
  layout_regions_by_page dict is non-empty — ONE region anywhere in
  the document makes EVERY page attempt the layout lookup;
* 0->1-based lookup (:204): pages are 0-based (PyMuPDF4LLM), region
  keys 1-based — ``layout_regions_by_page.get(page_number + 1, [])``;
* empty-page skip (:198-200): whitespace-only pages are skipped BEFORE
  chunking and consume no global chunk indices;
* route gate (:313-316): the layout path fires only when some region
  of the page carries truthy *stripped* ``text_content``
  (``regions_have_text``); regions with only bboxes fall back to
  text-based chunking — Bug-D pin;
* fallback WARNING (:330-339) fires only when regions were provided
  but all textless; BUT the per-chunk
  ``chunking_strategy_fallback = text_based_after_empty_layout`` stamp
  (:349-351) sits outside that guard — every text-routed page gets it,
  including pages never offered a region at all, so the stamp
  over-counts fallbacks relative to the warning (faithful-to-code pin;
  the S2-3 comment fixed the shared-dict smear, not this);
* the defensive 0-chunk retry (:357-364) is structurally DEAD: the
  region fold always emits >=1 chunk once ``regions_have_text`` holds
  (the final flush), and every text strategy emits >=1 chunk on
  non-empty text — pinned here by the route model having no retry
  state;
* global re-index (:367-369): chunk_index = start_chunk_index + i,
  with start indices accumulated across non-skipped pages in page
  order; ``total_chunks`` is stamped per document AFTER the page loop;
* ``_select_chunking_strategy`` (:248-276): semantic / fixed_size /
  hybrid, unknown -> ValueError.

Chunk-count model: the text route counts 400-char fixed windows (the
FIXED_SIZE instance of the strategy selector); the layout route counts
the region fold's boundary rule — a new chunk at the first text
region, at every TABLE or TITLE (flush-before), and after every TABLE
(tables are emitted alone, :922-941) — regions ordered by
``r.get('reading_order', 999)`` (absent/NULL -> 999, Python stable
sort => ties keep list order, modeled as (ro, region_idx)). The
max_chunk_size overflow split is the C4 kernel's territory and is
orthogonal to every dispatch pin above.

Scale: the route is one (doc, page)-keyed join + a lag window over
regions; global indexing is one cumsum window per doc. No Python, no
content shuffle — only keys and counts move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

CHUNK_CHARS = 400
STRATEGIES = ("semantic", "fixed_size", "hybrid")


def select_strategy(name: str) -> str:
    """_select_chunking_strategy's dispatch tag — unknown raises
    (unified_chunking_service.py:274-276)."""
    if name not in STRATEGIES:
        raise ValueError(f"Unknown chunking strategy: {name}")
    return name


def _page_region_stats(regions: DataFrame) -> DataFrame:
    """Per (doc_id, page1): region count, text-bearing count, and the
    layout boundary-rule chunk count."""
    r = regions.withColumn(
        "_ro", F.coalesce(F.col("reading_order"), F.lit(999)))
    has_text = F.trim(F.coalesce("text_content", F.lit(""))) != ""
    txt = r.where(has_text)
    w = (Window.partitionBy("doc_id", "page1")
         .orderBy("_ro", "region_idx"))
    txt = txt.withColumn("_prev_type", F.lag("region_type").over(w))
    boundary = (F.col("_prev_type").isNull()
                | F.col("region_type").isin("TABLE", "TITLE")
                | (F.col("_prev_type") == "TABLE"))
    per_txt = (txt.groupBy("doc_id", "page1")
               .agg(F.count("*").alias("n_regions_with_text"),
                    F.sum(boundary.cast("int"))
                    .alias("n_chunks_layout")))
    per_all = (r.groupBy("doc_id", "page1")
               .agg(F.count("*").alias("n_regions")))
    return per_all.join(per_txt, ["doc_id", "page1"], "left").select(
        "doc_id", "page1", "n_regions",
        F.coalesce("n_regions_with_text", F.lit(0))
        .alias("n_regions_with_text"),
        F.coalesce("n_chunks_layout", F.lit(0))
        .alias("n_chunks_layout"))


def page_dispatch(pages: DataFrame, regions: DataFrame) -> DataFrame:
    """One row per input page: route + stamps + chunk-count + global
    start index. Routes: 'skipped_empty' | 'layout' | 'text'."""
    doc_layout = (regions.select("doc_id").distinct()
                  .withColumn("use_layout", F.lit(True)))
    stats = _page_region_stats(regions)
    p = (pages
         .join(F.broadcast(doc_layout), "doc_id", "left")
         .join(stats,
               (pages["doc_id"] == stats["doc_id"])
               & (stats["page1"] == pages["page0"] + 1), "left")
         .drop(stats["doc_id"]).drop("page1"))
    p = p.select(
        pages["doc_id"].alias("doc_id"), "page0", "text",
        F.coalesce("use_layout", F.lit(False)).alias("use_layout"),
        F.coalesce("n_regions", F.lit(0)).alias("n_regions"),
        F.coalesce("n_regions_with_text", F.lit(0))
        .alias("n_regions_with_text"),
        F.coalesce("n_chunks_layout", F.lit(0))
        .alias("n_chunks_layout"))
    empty = F.trim(F.coalesce("text", F.lit(""))) == ""
    # the page-level lookup only happens under the document gate
    offered = F.col("use_layout") & (F.col("n_regions") > 0)
    regions_have_text = offered & (F.col("n_regions_with_text") > 0)
    route = (F.when(empty, "skipped_empty")
             .when(regions_have_text, "layout")
             .otherwise("text"))
    n_chunks = (F.when(empty, F.lit(0))
                .when(regions_have_text, F.col("n_chunks_layout"))
                .otherwise(F.ceil(F.length(F.col("text"))
                                  / F.lit(CHUNK_CHARS)).cast("int")))
    out = p.select(
        "doc_id", (F.col("page0") + 1).cast("int").alias("page1"),
        route.alias("route"),
        # warning: regions offered but ALL textless
        (offered & ~regions_have_text & ~empty).alias("warned"),
        # stamp: EVERY text-routed page, regions or not (pin)
        ((route == "text")).alias("fallback_stamp"),
        "n_regions", "n_regions_with_text",
        n_chunks.alias("n_chunks"))
    wcum = (Window.partitionBy("doc_id").orderBy("page1")
            .rowsBetween(Window.unboundedPreceding, -1))
    return out.withColumn(
        "start_index",
        F.when(F.col("route") == "skipped_empty",
               F.lit(None).cast("long"))
        .otherwise(F.coalesce(F.sum("n_chunks").over(wcum),
                              F.lit(0)).cast("long")))


def dispatch_doc_rollup(dispatch: DataFrame) -> DataFrame:
    """Per-document totals: the chunk_pages summary + total_chunks."""
    return (dispatch.groupBy("doc_id")
            .agg(F.count("*").cast("int").alias("pages"),
                 F.sum((F.col("route") == "skipped_empty").cast("int"))
                 .cast("int").alias("pages_skipped"),
                 F.sum((F.col("route") == "layout").cast("int"))
                 .cast("int").alias("pages_layout"),
                 F.sum((F.col("route") == "text").cast("int"))
                 .cast("int").alias("pages_text"),
                 F.sum(F.col("warned").cast("int")).cast("int")
                 .alias("pages_warned"),
                 F.sum(F.col("fallback_stamp").cast("int")).cast("int")
                 .alias("pages_stamped"),
                 F.sum("n_chunks").cast("long").alias("total_chunks")))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------


def synth_pages(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        (e % 211).cast("long").alias("doc_id"),
        F.floor(e / 211).cast("int").alias("page0"),
        F.when(e % 7 == 0, F.lit(""))
        .when(e % 13 == 0, F.lit("   "))
        .otherwise(F.repeat(F.lit("w"), ((e % 35 + 1) * 37).cast("int")))
        .alias("text"))


SYNTH_DISPATCH_PAGES_SQL = """
    SELECT CAST(event_id % 211 AS BIGINT) AS doc_id,
           CAST(event_id // 211 AS INT) AS page0,
           CASE WHEN event_id % 7 = 0 THEN ''
                WHEN event_id % 13 = 0 THEN '   '
                ELSE repeat('w', CAST((event_id % 35 + 1) * 37
                                      AS INT)) END AS text
    FROM events
"""


def synth_regions(events: DataFrame) -> DataFrame:
    """Regions for ~1/3 of pages (1-based page key); per page 1-4
    regions cycling types, some textless, some NULL reading_order."""
    e = F.col("event_id")
    base = (events.where(e % 3 == 0)
            .select((e % 211).cast("long").alias("doc_id"),
                    (F.floor(e / 211) + 1).cast("int").alias("page1"),
                    e.alias("_e"),
                    F.explode(F.sequence(
                        F.lit(0), (e % 4).cast("int"))).alias("region_idx")))
    k = F.col("_e") + F.col("region_idx") * 11
    return base.select(
        "doc_id", "page1", F.col("region_idx").cast("int")
        .alias("region_idx"),
        F.element_at(F.array(F.lit("TEXT"), F.lit("TITLE"),
                             F.lit("TABLE"), F.lit("CAPTION")),
                     (k % 4 + 1).cast("int")).alias("region_type"),
        F.when(k % 5 == 0, F.lit(None).cast("int"))
        .otherwise((k % 9).cast("int")).alias("reading_order"),
        F.when(F.col("_e") % 6 == 0, F.lit(""))       # whole page textless
        .when(k % 7 == 0, F.lit("  "))
        .otherwise(F.concat(F.lit("region text "),
                            (k % 17).cast("string")))
        .alias("text_content"))


SYNTH_DISPATCH_REGIONS_SQL = """
    SELECT CAST(event_id % 211 AS BIGINT) AS doc_id,
           CAST(event_id // 211 + 1 AS INT) AS page1,
           CAST(region_idx AS INT) AS region_idx,
           ['TEXT', 'TITLE', 'TABLE', 'CAPTION']
               [CAST((event_id + region_idx * 11) % 4 + 1 AS INT)]
               AS region_type,
           CASE WHEN (event_id + region_idx * 11) % 5 = 0 THEN NULL
                ELSE CAST((event_id + region_idx * 11) % 9 AS INT) END
               AS reading_order,
           CASE WHEN event_id % 6 = 0 THEN ''
                WHEN (event_id + region_idx * 11) % 7 = 0 THEN '  '
                ELSE 'region text '
                     || CAST((event_id + region_idx * 11) % 17
                             AS VARCHAR) END AS text_content
    FROM events, LATERAL unnest(range(0, CAST(event_id % 4 AS INT)
                                         + 1)) AS u(region_idx)
    WHERE event_id % 3 = 0
"""


_DISPATCH_CORE_SQL = f"""
        pg AS ({SYNTH_DISPATCH_PAGES_SQL}),
        rg AS ({SYNTH_DISPATCH_REGIONS_SQL}),
        dl AS (SELECT DISTINCT doc_id, TRUE AS use_layout FROM rg),
        rt AS (
          SELECT *, coalesce(reading_order, 999) AS _ro,
                 trim(coalesce(text_content, '')) <> '' AS has_text
          FROM rg),
        tx AS (
          SELECT *, lag(region_type) OVER (
                     PARTITION BY doc_id, page1
                     ORDER BY _ro, region_idx) AS prev_type
          FROM rt WHERE has_text),
        st AS (
          SELECT a.doc_id, a.page1, a.n_regions,
                 coalesce(t.n_regions_with_text, 0)
                     AS n_regions_with_text,
                 coalesce(t.n_chunks_layout, 0) AS n_chunks_layout
          FROM (SELECT doc_id, page1, count(*) AS n_regions
                FROM rt GROUP BY doc_id, page1) a
          LEFT JOIN (
            SELECT doc_id, page1,
                   count(*) AS n_regions_with_text,
                   sum(CASE WHEN prev_type IS NULL
                            OR region_type IN ('TABLE', 'TITLE')
                            OR prev_type = 'TABLE'
                            THEN 1 ELSE 0 END) AS n_chunks_layout
            FROM tx GROUP BY doc_id, page1) t
          ON a.doc_id = t.doc_id AND a.page1 = t.page1),
        j AS (
          SELECT p.doc_id, p.page0, p.text,
                 coalesce(d.use_layout, FALSE) AS use_layout,
                 coalesce(s.n_regions, 0) AS n_regions,
                 coalesce(s.n_regions_with_text, 0)
                     AS n_regions_with_text,
                 coalesce(s.n_chunks_layout, 0) AS n_chunks_layout
          FROM pg p
          LEFT JOIN dl d ON p.doc_id = d.doc_id
          LEFT JOIN st s ON p.doc_id = s.doc_id
                        AND s.page1 = p.page0 + 1),
        rr AS (
          SELECT *,
                 trim(coalesce(text, '')) = '' AS is_empty,
                 use_layout AND n_regions > 0 AS offered,
                 use_layout AND n_regions > 0
                     AND n_regions_with_text > 0 AS rht
          FROM j),
        rv AS (
          SELECT doc_id, CAST(page0 + 1 AS INT) AS page1,
                 CASE WHEN is_empty THEN 'skipped_empty'
                      WHEN rht THEN 'layout'
                      ELSE 'text' END AS route,
                 offered AND NOT rht AND NOT is_empty AS warned,
                 NOT is_empty AND NOT rht AS fallback_stamp,
                 n_regions, n_regions_with_text,
                 CAST(CASE WHEN is_empty THEN 0
                      WHEN rht THEN n_chunks_layout
                      ELSE CAST(ceil(length(text) / {CHUNK_CHARS}.0)
                                AS INT) END AS INT) AS n_chunks
          FROM rr),
        fin AS (
          SELECT *,
                 CASE WHEN route = 'skipped_empty' THEN NULL
                      ELSE CAST(coalesce(sum(n_chunks) OVER (
                               PARTITION BY doc_id ORDER BY page1
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS BIGINT) END
                     AS start_index
          FROM rv)
"""


def page_dispatch_sql() -> str:
    return f"""
        WITH {_DISPATCH_CORE_SQL}
        SELECT doc_id, page1, route, warned, fallback_stamp,
               n_regions, n_regions_with_text, n_chunks, start_index
        FROM fin
    """


def doc_rollup_sql() -> str:
    return f"""
        WITH {_DISPATCH_CORE_SQL}
        SELECT doc_id, CAST(count(*) AS INT) AS pages,
               CAST(sum(CASE WHEN route = 'skipped_empty'
                        THEN 1 ELSE 0 END) AS INT) AS pages_skipped,
               CAST(sum(CASE WHEN route = 'layout' THEN 1 ELSE 0 END)
                    AS INT) AS pages_layout,
               CAST(sum(CASE WHEN route = 'text' THEN 1 ELSE 0 END)
                    AS INT) AS pages_text,
               CAST(sum(CASE WHEN warned THEN 1 ELSE 0 END) AS INT)
                   AS pages_warned,
               CAST(sum(CASE WHEN fallback_stamp THEN 1 ELSE 0 END)
                    AS INT) AS pages_stamped,
               CAST(sum(n_chunks) AS BIGINT) AS total_chunks
        FROM fin GROUP BY doc_id
    """
