"""Stage-2 per-product chunking plan
(app/api/pdf_processing/stage_2_chunking.py) as native Spark folds —
the RAG indexing itself is covered by the chunk-pipeline operators; this
module reproduces every deterministic decision AROUND it:

- chunkable pages (:52-57): per-product chunking takes EVERY passed
  physical page (the legacy document-wide "metadata-first" filter is
  deliberately absent — pin);
- layout-source priority ladder (:62-147): Priority 1 reads the Stage-1.5
  document cache when ``enable_layout_aware_chunking`` (default True);
  ``cached`` keeps pages whose REGION LIST is truthy regardless of
  cache_status (a failed-status row that still carries regions
  contributes — pin), while ``_failed_pages`` counts status in
  {ocr_failed, page_failed} independently; any cached page flips the
  strategy to 'stage_1_5_cache'. Priority 2 (caller-provided regions)
  fires only when Priority 1 produced NOTHING — including when layout is
  disabled. Otherwise 'no_layout_regions'. Priority 3 was removed
  (audit #217 M4);
- strategy telemetry (:155-183): pages_with_regions = len(winning map),
  total_pages = len(physical_pages); the failed-page count falls back to
  0 via the pinned NameError guard when the cache read never ran
  (layout disabled);
- per-page text fold (:199-262): page text comes from
  ``page_text_from_layout_regions`` over the WINNING source's regions —
  keep regions whose stripped text_content is truthy, sort by
  reading_order with None → 1_000_000 (Python's stable sort ⇒ ties keep
  list order — both engines sort by (key, idx)), join stripped pieces
  with '\\n' (stage_1_layout_precompute.py:728-745). Empty cache text
  falls back to the PDF text layer with PER-PAGE failure isolation (a
  throwing page is skipped and counted, the rest continue — pin);
  empty/whitespace-only final text drops the page; extracted pages stamp
  0-indexed page metadata (phys − 1) and accumulate total_chars;
- doc-open failure (:283-299): ``fitz.open`` throwing loses EVERY page —
  even ones whose cached text needed no PDF at all (the loop lives
  inside the try — pin) — and sets extraction_failed;
- zero-chunk status split (:300-331): 'failed' (retryable, never
  checkpointed complete) vs 'no_text' (legitimately done) — opposite
  handling downstream, pinned apart; the success return stamps
  pages_chunked = len(chunkable_pages) — ALL pages, including dropped
  ones (pin) — and pages_excluded = 0.

Scale: one groupBy per product for the strategy fold, one broadcast-able
join back to pages for the per-page resolution, one groupBy for the plan
rollup; region text assembly is array-native (transform/filter/
array_sort/array_join) — strings never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_STRAT_CACHE = "stage_1_5_cache"
_STRAT_CALLER = "caller_provided_regions"
_STRAT_NONE = "no_layout_regions"


def regions_text(col: Column) -> Column:
    """page_text_from_layout_regions (stage_1_layout_precompute.py:728-745):
    filter stripped-truthy text_content, stable-sort by reading_order
    (None → 1_000_000), join stripped pieces with newline. The trailing
    .strip() is a no-op (every joined piece is already stripped and
    non-empty). Returns '' for no usable region."""
    idx = F.transform(col, lambda r, i: F.struct(
        F.coalesce(r["reading_order"].cast("int"), F.lit(1000000))
        .alias("k"),
        i.alias("i"),
        F.trim(r["text_content"]).alias("t")))
    kept = F.filter(idx, lambda s: s["t"].isNotNull() & (s["t"] != ""))
    return F.array_join(
        F.transform(F.array_sort(kept), lambda s: s["t"]), "\n")


def _flags(p: Column) -> dict:
    return {
        "enable_layout": p % 5 != 4,
        "outer_fail": p % 16 == 15,
    }


def resolve_pages(pages: DataFrame) -> DataFrame:
    """Per-page text resolution under the winning layout source.

    Input: one row per (product_id, phys_page) with ``cache_status``,
    ``regions``, ``caller_regions`` (both array<struct<text_content,
    reading_order>>), ``layer_text``, ``page_throws``, ``enable_layout``,
    ``outer_fail``.
    """
    pg = pages.withColumn("cache_text", regions_text(F.col("regions"))) \
        .withColumn("caller_text", regions_text(F.col("caller_regions")))

    agg = pg.groupBy("product_id").agg(
        F.first("enable_layout").alias("enable_layout"),
        F.first("outer_fail").alias("outer_fail"),
        F.count(F.lit(1)).alias("total_pages"),
        F.count(F.when((F.col("cache_status") != "missing")
                       & (F.size("regions") > 0), 1)).alias("n_cached"),
        F.count(F.when(F.col("cache_status")
                       .isin("ocr_failed", "page_failed"), 1))
        .alias("n_failed_cache"),
        F.count(F.when(F.size("caller_regions") > 0, 1))
        .alias("n_caller_pages"))

    strat = (F.when(F.col("enable_layout") & (F.col("n_cached") > 0),
                    F.lit(_STRAT_CACHE))
             .when(F.col("n_caller_pages") > 0, F.lit(_STRAT_CALLER))
             .otherwise(F.lit(_STRAT_NONE)))
    agg = agg.withColumn("strategy", strat).withColumn(
        "pages_with_regions",
        F.when(F.col("strategy") == _STRAT_CACHE, F.col("n_cached"))
        .when(F.col("strategy") == _STRAT_CALLER, F.col("n_caller_pages"))
        .otherwise(F.lit(0)).cast("long")).withColumn(
        # NameError pin: _failed_pages is only bound when the cache read
        # ran (enable_layout); the metrics writer falls back to 0.
        "stage15_failed_pages",
        F.when(F.col("enable_layout"), F.col("n_failed_cache"))
        .otherwise(F.lit(0)).cast("long"))

    joined = pg.join(agg.select("product_id", "strategy"), "product_id")

    win = (F.when(F.col("strategy") == _STRAT_CACHE, F.col("cache_text"))
           .when(F.col("strategy") == _STRAT_CALLER, F.col("caller_text"))
           .otherwise(F.lit("")))
    joined = joined.withColumn("win_text", win)
    source = (F.when(F.col("outer_fail"), F.lit("doc_open_failed"))
              .when((F.col("win_text") != "")
                    & (F.col("strategy") == _STRAT_CACHE),
                    F.lit("layout_cache"))
              .when((F.col("win_text") != "")
                    & (F.col("strategy") == _STRAT_CALLER),
                    F.lit("caller_regions"))
              .when(F.col("page_throws"), F.lit("failed_skip"))
              .when(F.trim(F.col("layer_text")) == "",
                    F.lit("dropped_empty"))
              .otherwise(F.lit("text_layer")))
    joined = joined.withColumn("source", source)
    extracted = F.col("source").isin(
        "layout_cache", "caller_regions", "text_layer")
    final_text = F.when(F.col("win_text") != "", F.col("win_text")) \
        .otherwise(F.col("layer_text"))
    return (joined
            .withColumn("text", F.when(extracted, final_text))
            .withColumn("page_meta",
                        F.when(extracted, F.col("phys_page") - 1)
                        .cast("int"))
            .withColumn("text_len",
                        F.when(extracted, F.length(final_text))
                        .cast("long")))


def page_texts(pages: DataFrame) -> DataFrame:
    """Contract projection of :func:`resolve_pages`."""
    return resolve_pages(pages).select(
        "product_id", "phys_page", "page_meta", "source", "text_len",
        "text")


def chunk_plan(pages: DataFrame, products: DataFrame) -> DataFrame:
    """Per-product Stage-2 plan rollup (strategy telemetry + extraction
    stats + the failed/no_text status split). ``products`` supplies
    page-less products (they still return a 'no_text' result row)."""
    res = resolve_pages(pages)
    extracted = F.col("source").isin(
        "layout_cache", "caller_regions", "text_layer")
    agg = res.groupBy("product_id").agg(
        F.first("enable_layout").alias("enable_layout"),
        F.first("outer_fail").alias("outer_fail"),
        F.first("strategy").alias("strategy"),
        F.count(F.lit(1)).alias("total_pages"),
        F.count(F.when((F.col("cache_status") != "missing")
                       & (F.size("regions") > 0), 1)).alias("n_cached"),
        F.count(F.when(F.col("cache_status")
                       .isin("ocr_failed", "page_failed"), 1))
        .alias("n_failed_cache"),
        F.count(F.when(F.size("caller_regions") > 0, 1))
        .alias("n_caller_pages"),
        F.count(F.when(extracted, 1)).alias("pages_extracted"),
        F.coalesce(F.sum(F.when(extracted, F.length("text"))),
                   F.lit(0)).alias("total_chars"),
        F.count(F.when(F.col("source") == "failed_skip", 1))
        .alias("fallback_failed_pages"))
    agg = agg.withColumn(
        "pages_with_regions",
        F.when(F.col("strategy") == _STRAT_CACHE, F.col("n_cached"))
        .when(F.col("strategy") == _STRAT_CALLER, F.col("n_caller_pages"))
        .otherwise(F.lit(0)).cast("long")).withColumn(
        "stage15_failed_pages",
        F.when(F.col("enable_layout"), F.col("n_failed_cache"))
        .otherwise(F.lit(0)).cast("long"))

    out = products.join(agg, "product_id", "left")
    zero = F.col("pages_extracted").isNull() | \
        (F.col("pages_extracted") == 0)
    p = F.col("product_id")
    flags = _flags(p)
    return out.select(
        "product_id",
        F.coalesce("strategy", F.lit(_STRAT_NONE)).alias("strategy"),
        F.coalesce("pages_with_regions", F.lit(0)).cast("long")
        .alias("pages_with_regions"),
        F.coalesce("total_pages", F.lit(0)).cast("long")
        .alias("total_pages"),
        F.coalesce("stage15_failed_pages", F.lit(0)).cast("long")
        .alias("stage15_failed_pages"),
        F.coalesce("pages_extracted", F.lit(0)).cast("long")
        .alias("pages_extracted"),
        F.coalesce("total_chars", F.lit(0)).cast("long")
        .alias("total_chars"),
        F.coalesce("fallback_failed_pages", F.lit(0)).cast("long")
        .alias("fallback_failed_pages"),
        F.when(F.coalesce("pages_extracted", F.lit(0)) > 0,
               F.coalesce("total_pages", F.lit(0)))
        .otherwise(F.lit(0)).cast("long").alias("pages_chunked"),
        F.when(F.coalesce(F.col("outer_fail"), flags["outer_fail"]),
               F.lit("failed"))
        .when(zero, F.lit("no_text"))
        .alias("chunking_status"))


# ---------------------------------------------------------------------------
# synthesizer + DuckDB twins
# ---------------------------------------------------------------------------

def synth_pages(events: DataFrame) -> DataFrame:
    """Deterministic per-page synthesis from the events table. One
    candidate slot per event: product = floor(event_id/20), 20 slots per
    product, ~70% present; p%37==21 products have NO pages (empty-set
    path); p%19==7 products force missing cache + empty/whitespace text
    layer (no_text path, unless caller regions rescue them)."""
    e = F.col("event_id")
    p = F.floor(e / 20).cast("long")
    slot = (e % 20).cast("int")
    force_nt = p % 19 == 7
    flags = _flags(p)

    status = (F.when(force_nt | (e % 11 == 0), F.lit("missing"))
              .when(e % 11 == 1, F.lit("ocr_failed"))
              .when(e % 11 == 2, F.lit("page_failed"))
              .otherwise(F.lit("ok")))
    nreg = F.when(status == "missing", F.lit(0)) \
        .otherwise((e * 3) % 4).cast("int")

    def _cache_region(i: Column) -> Column:
        tc_case = (e + i * 5) % 6
        tc = (F.when(tc_case == 0, F.lit(None).cast("string"))
              .when(tc_case == 1, F.lit(""))
              .when(tc_case == 2, F.lit("   "))
              .when(tc_case == 3,
                    F.concat(F.lit("Region "), e, F.lit("_"), i,
                             F.lit("  ")))
              .when(tc_case == 4,
                    F.concat(F.lit("  Κείμενο "), e))
              .otherwise(F.concat(F.lit("Text "), (e * 13 + i) % 97)))
        ro = F.when((e + i) % 5 == 0, F.lit(None).cast("int")) \
            .otherwise(((e * 3 + i * 2) % 4).cast("int"))
        return F.struct(tc.alias("text_content"),
                        ro.alias("reading_order"))

    def _caller_region(i: Column) -> Column:
        tc = F.when((e + i) % 7 == 0, F.lit("")) \
            .otherwise(F.concat(F.lit("Caller "), e, F.lit("_"), i))
        ro = F.when((e + i) % 4 == 0, F.lit(None).cast("int")) \
            .otherwise(((e * 5 + i * 3) % 7).cast("int"))
        return F.struct(tc.alias("text_content"),
                        ro.alias("reading_order"))

    empty = F.array().cast(
        "array<struct<text_content:string,reading_order:int>>")
    regions = F.when(
        nreg > 0,
        F.transform(F.sequence(F.lit(0), nreg - 1), _cache_region)) \
        .otherwise(empty)
    ncall = F.when((p % 3 == 0) & ((e * 11) % 3 != 0), 1 + e % 2) \
        .otherwise(F.lit(0)).cast("int")
    caller = F.when(
        ncall > 0,
        F.transform(F.sequence(F.lit(0), ncall - 1), _caller_region)) \
        .otherwise(empty)

    layer = (F.when(force_nt & (e % 2 == 0), F.lit(""))
             .when(force_nt, F.lit("   "))
             .when(e % 6 == 0, F.lit(""))
             .when(e % 6 == 1, F.lit("   "))
             .otherwise(F.concat(F.lit("Layer text "), (e * 31) % 1009,
                                 F.lit(" body "), slot + 1)))

    return events.filter(((e * 7) % 10 < 7) & (p % 37 != 21)).select(
        p.alias("product_id"), (slot + 1).alias("phys_page"),
        status.alias("cache_status"), regions.alias("regions"),
        caller.alias("caller_regions"), layer.alias("layer_text"),
        (e % 13 == 0).alias("page_throws"),
        flags["enable_layout"].alias("enable_layout"),
        flags["outer_fail"].alias("outer_fail"))


def synth_products(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        F.floor(e / 20).cast("long").alias("product_id")).distinct()


SYNTH_PAGES_SQL = """
    SELECT CAST(floor(event_id / 20) AS BIGINT) AS product_id,
           CAST(event_id % 20 + 1 AS INT) AS phys_page,
           event_id AS e,
           CASE WHEN CAST(floor(event_id / 20) AS BIGINT) % 19 = 7
                     OR event_id % 11 = 0 THEN 'missing'
                WHEN event_id % 11 = 1 THEN 'ocr_failed'
                WHEN event_id % 11 = 2 THEN 'page_failed'
                ELSE 'ok' END AS cache_status,
           CASE WHEN CAST(floor(event_id / 20) AS BIGINT) % 19 = 7
                     AND event_id % 2 = 0 THEN ''
                WHEN CAST(floor(event_id / 20) AS BIGINT) % 19 = 7
                     THEN '   '
                WHEN event_id % 6 = 0 THEN ''
                WHEN event_id % 6 = 1 THEN '   '
                ELSE 'Layer text ' || CAST((event_id * 31) % 1009
                     AS VARCHAR) || ' body '
                     || CAST(event_id % 20 + 1 AS VARCHAR)
           END AS layer_text,
           event_id % 13 = 0 AS page_throws,
           CAST(floor(event_id / 20) AS BIGINT) % 5 <> 4
               AS enable_layout,
           CAST(floor(event_id / 20) AS BIGINT) % 16 = 15 AS outer_fail
    FROM events
    WHERE (event_id * 7) % 10 < 7
      AND CAST(floor(event_id / 20) AS BIGINT) % 37 <> 21
"""

# exploded cache regions (i < nreg) — one row per region
SYNTH_CACHE_REGIONS_SQL = f"""
    SELECT pg.product_id, pg.phys_page, pg.e, i.i AS idx,
           CASE (pg.e + i.i * 5) % 6
                WHEN 0 THEN NULL WHEN 1 THEN '' WHEN 2 THEN '   '
                WHEN 3 THEN 'Region ' || CAST(pg.e AS VARCHAR) || '_'
                     || CAST(i.i AS VARCHAR) || '  '
                WHEN 4 THEN '  Κείμενο ' || CAST(pg.e AS VARCHAR)
                ELSE 'Text ' || CAST((pg.e * 13 + i.i) % 97 AS VARCHAR)
           END AS text_content,
           CASE WHEN (pg.e + i.i) % 5 = 0 THEN NULL
                ELSE (pg.e * 3 + i.i * 2) % 4 END AS reading_order
    FROM ({SYNTH_PAGES_SQL}) pg
    CROSS JOIN (SELECT unnest(range(4)) AS i) i
    WHERE pg.cache_status <> 'missing' AND i.i < (pg.e * 3) % 4
"""

SYNTH_CALLER_REGIONS_SQL = f"""
    SELECT pg.product_id, pg.phys_page, pg.e, i.i AS idx,
           CASE WHEN (pg.e + i.i) % 7 = 0 THEN ''
                ELSE 'Caller ' || CAST(pg.e AS VARCHAR) || '_'
                     || CAST(i.i AS VARCHAR) END AS text_content,
           CASE WHEN (pg.e + i.i) % 4 = 0 THEN NULL
                ELSE (pg.e * 5 + i.i * 3) % 7 END AS reading_order
    FROM ({SYNTH_PAGES_SQL}) pg
    CROSS JOIN (SELECT unnest(range(2)) AS i) i
    WHERE pg.product_id % 3 = 0 AND (pg.e * 11) % 3 <> 0
      AND i.i < 1 + pg.e % 2
"""


def _resolved_sql() -> str:
    """Shared CTE body resolving per-page source/text under the winning
    strategy — the SQL twin of :func:`resolve_pages`."""
    return f"""
        pg AS ({SYNTH_PAGES_SQL}),
        creg AS ({SYNTH_CACHE_REGIONS_SQL}),
        careg AS ({SYNTH_CALLER_REGIONS_SQL}),
        ctext AS (
          SELECT product_id, phys_page,
                 string_agg(trim(text_content), chr(10)
                            ORDER BY coalesce(reading_order, 1000000),
                                     idx) AS cache_text,
                 count(*) AS n_regions
          FROM creg
          WHERE coalesce(trim(text_content), '') <> ''
          GROUP BY product_id, phys_page),
        cnreg AS (
          SELECT product_id, phys_page, count(*) AS n_any
          FROM creg GROUP BY product_id, phys_page),
        catext AS (
          SELECT product_id, phys_page,
                 string_agg(trim(text_content), chr(10)
                            ORDER BY coalesce(reading_order, 1000000),
                                     idx) AS caller_text
          FROM careg
          WHERE coalesce(trim(text_content), '') <> ''
          GROUP BY product_id, phys_page),
        canreg AS (
          SELECT product_id, phys_page, count(*) AS n_any
          FROM careg GROUP BY product_id, phys_page),
        strat AS (
          SELECT pg.product_id,
                 CASE WHEN bool_or(pg.enable_layout)
                           AND count(cnreg.n_any) > 0
                      THEN 'stage_1_5_cache'
                      WHEN count(canreg.n_any) > 0
                      THEN 'caller_provided_regions'
                      ELSE 'no_layout_regions' END AS strategy,
                 count(cnreg.n_any) AS n_cached,
                 count(canreg.n_any) AS n_caller_pages,
                 count(*) FILTER (WHERE pg.cache_status IN
                                  ('ocr_failed', 'page_failed'))
                     AS n_failed_cache,
                 count(*) AS total_pages
          FROM pg
          LEFT JOIN cnreg ON cnreg.product_id = pg.product_id
                         AND cnreg.phys_page = pg.phys_page
          LEFT JOIN canreg ON canreg.product_id = pg.product_id
                          AND canreg.phys_page = pg.phys_page
          GROUP BY pg.product_id),
        rp AS (
          SELECT pg.*, s.strategy, s.n_cached, s.n_caller_pages,
                 s.n_failed_cache, s.total_pages,
                 CASE WHEN s.strategy = 'stage_1_5_cache'
                      THEN coalesce(ct.cache_text, '')
                      WHEN s.strategy = 'caller_provided_regions'
                      THEN coalesce(cat.caller_text, '')
                      ELSE '' END AS win_text
          FROM pg
          JOIN strat s ON s.product_id = pg.product_id
          LEFT JOIN ctext ct ON ct.product_id = pg.product_id
                            AND ct.phys_page = pg.phys_page
          LEFT JOIN catext cat ON cat.product_id = pg.product_id
                              AND cat.phys_page = pg.phys_page),
        res AS (
          SELECT rp.*,
                 CASE WHEN rp.outer_fail THEN 'doc_open_failed'
                      WHEN rp.win_text <> ''
                           AND rp.strategy = 'stage_1_5_cache'
                      THEN 'layout_cache'
                      WHEN rp.win_text <> ''
                           AND rp.strategy = 'caller_provided_regions'
                      THEN 'caller_regions'
                      WHEN rp.page_throws THEN 'failed_skip'
                      WHEN trim(rp.layer_text) = '' THEN 'dropped_empty'
                      ELSE 'text_layer' END AS source,
                 CASE WHEN rp.win_text <> '' THEN rp.win_text
                      ELSE rp.layer_text END AS final_text
          FROM rp)
    """


def page_texts_sql() -> str:
    return f"""
        WITH {_resolved_sql()}
        SELECT product_id, phys_page,
               CAST(CASE WHEN source IN ('layout_cache', 'caller_regions',
                                         'text_layer')
                         THEN phys_page - 1 END AS INT) AS page_meta,
               source,
               CAST(CASE WHEN source IN ('layout_cache', 'caller_regions',
                                         'text_layer')
                         THEN length(final_text) END AS BIGINT)
                   AS text_len,
               CASE WHEN source IN ('layout_cache', 'caller_regions',
                                    'text_layer')
                    THEN final_text END AS text
        FROM res
    """


def chunk_plan_sql() -> str:
    return f"""
        WITH {_resolved_sql()},
        agg AS (
          SELECT product_id,
                 any_value(strategy) AS strategy,
                 any_value(enable_layout) AS enable_layout,
                 any_value(outer_fail) AS outer_fail,
                 any_value(n_cached) AS n_cached,
                 any_value(n_caller_pages) AS n_caller_pages,
                 any_value(n_failed_cache) AS n_failed_cache,
                 any_value(total_pages) AS total_pages,
                 count(*) FILTER (WHERE source IN
                        ('layout_cache', 'caller_regions', 'text_layer'))
                     AS pages_extracted,
                 coalesce(sum(length(final_text)) FILTER (WHERE source IN
                        ('layout_cache', 'caller_regions', 'text_layer')),
                        0) AS total_chars,
                 count(*) FILTER (WHERE source = 'failed_skip')
                     AS fallback_failed_pages
          FROM res GROUP BY product_id),
        prods AS (
          SELECT DISTINCT CAST(floor(event_id / 20) AS BIGINT)
              AS product_id FROM events)
        SELECT p.product_id,
               coalesce(a.strategy, 'no_layout_regions') AS strategy,
               CAST(coalesce(CASE WHEN a.strategy = 'stage_1_5_cache'
                                  THEN a.n_cached
                                  WHEN a.strategy =
                                       'caller_provided_regions'
                                  THEN a.n_caller_pages
                                  ELSE 0 END, 0) AS BIGINT)
                   AS pages_with_regions,
               CAST(coalesce(a.total_pages, 0) AS BIGINT) AS total_pages,
               CAST(coalesce(CASE WHEN a.enable_layout
                                  THEN a.n_failed_cache ELSE 0 END, 0)
                    AS BIGINT) AS stage15_failed_pages,
               CAST(coalesce(a.pages_extracted, 0) AS BIGINT)
                   AS pages_extracted,
               CAST(coalesce(a.total_chars, 0) AS BIGINT) AS total_chars,
               CAST(coalesce(a.fallback_failed_pages, 0) AS BIGINT)
                   AS fallback_failed_pages,
               CAST(CASE WHEN coalesce(a.pages_extracted, 0) > 0
                         THEN a.total_pages ELSE 0 END AS BIGINT)
                   AS pages_chunked,
               CASE WHEN coalesce(a.outer_fail,
                                  p.product_id % 16 = 15) THEN 'failed'
                    WHEN coalesce(a.pages_extracted, 0) = 0
                    THEN 'no_text' END AS chunking_status
        FROM prods p LEFT JOIN agg a ON a.product_id = p.product_id
    """
