"""Stage-0 discovery routing — validation, page ranges, folio offsets.

Re-expresses the deterministic routing tier of the reference's product
discovery service (reference ``app/services/discovery/
product_discovery_service.py``): the validation boundary between model
output and pipeline state, the conservative start-page → page-range
calculator, and the folio→physical consensus offset shift.

Semantics pinned:

- ``_validate_discovery_item`` (:1222-1257): drop when name is NULL /
  empty / whitespace-only ("missing or empty 'name'"), or when a
  present page_range has any entry outside [1, total_pages]
  ("page_range out of bounds (1..N): [bad...]" — the bad list keeps
  page_range order, Python list repr with ', ').  Products with
  neither page_range nor start_page are KEPT (vision fills later).
- ``_parse_discovery_results`` (:1286-1310): when the item carries no
  metadata object, one is built from designer/studio/category fields
  dropping NULLs, with confidence defaulting to 0.8 (the default is
  never None, so built metadata always has confidence);
  available_colors appends only when non-empty; page_types string
  keys int()-cast, non-numeric keys dropped; ``_start_page`` stored
  only when start_page is TRUTHY — a folio start of 0 is discarded
  (pinned).
- catalog-level factory aliases (:1404-1416): catalog_factory folds
  catalog_manufacturer / catalog_brand / catalog_supplier in that
  coalesce order; catalog_factory_group folds catalog_group.
- ``_calculate_page_ranges_from_start_pages`` (:2266-2332): products
  with truthy start_page sorted by start_page (Python stable sort —
  ties keep product order), end_page = next start - 1, last product
  min(start + 10, total_pages), then end = max(end, start); products
  without start_page keep their range untouched.
- ``_reconcile_folio_start_pages_to_physical`` (:2333-2402): per
  anchored product offset = physical_headline - folio_start; the
  consensus offset is Counter.most_common(1) — max count, ties broken
  by FIRST INSERTION (product order); offset 0 → no shift; count <
  max(2, n_anchored DIV 2 + 1) → not confident, no shift; otherwise
  every non-empty page_range shifts by the offset, dropping pages
  that leave [1, total_pages].

Scale: validation/parse is a map-only projection; page ranges are one
window (lead) partitioned by doc_id; the folio consensus is one
map-side-combinable groupBy on (doc_id, offset) + an argmax per doc
broadcast back with a co-partitioned join.  Nothing collects and no
operator shuffles chunk/page content — only ids and small ints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# 1. validation + parse


def _name_missing(name: Column) -> Column:
    return name.isNull() | (F.trim(name) == "")


def validate_and_parse(items: DataFrame) -> DataFrame:
    """Validation boundary + product metadata fold.

    Expects columns: doc_id, item_id, kind, name, page_range
    array<int> (nullable), start_page int (nullable), total_pages,
    confidence double (nullable), designer, studio, category,
    available_colors array<string> (nullable), page_types
    map<string,string> (nullable), has_meta boolean (whether the item
    carried its own metadata object).
    """
    bad = F.filter("page_range",
                   lambda p: p.isNull() | (p < 1)
                   | (p > F.col("total_pages")))
    bad_render = F.concat(
        F.lit("["),
        F.array_join(F.transform(bad, lambda p: p.cast("string")), ", "),
        F.lit("]"))
    reason = (
        F.when(_name_missing(F.col("name")), "missing or empty 'name'")
        .when(F.col("page_range").isNotNull() & (F.size(bad) > 0),
              F.concat(F.lit("page_range out of bounds (1.."),
                       F.col("total_pages").cast("string"),
                       F.lit("): "), bad_render)))

    # metadata fold (products only): built from fields when has_meta
    # is false, Nones dropped, confidence defaulted; colors appended
    # when non-empty; _start_page only when truthy.
    parts = F.array_compact(F.array(
        F.when(~F.col("has_meta") & F.col("designer").isNotNull(),
               F.concat(F.lit("designer="), F.col("designer"))),
        F.when(~F.col("has_meta") & F.col("studio").isNotNull(),
               F.concat(F.lit("studio="), F.col("studio"))),
        F.when(~F.col("has_meta") & F.col("category").isNotNull(),
               F.concat(F.lit("category="), F.col("category"))),
        F.when(~F.col("has_meta"),
               F.concat(F.lit("confidence="),
                        F.format_number(
                            F.coalesce(F.col("confidence"), F.lit(0.8)),
                            2))),
        F.when(F.col("available_colors").isNotNull()
               & (F.size("available_colors") > 0),
               F.concat(F.lit("available_colors="),
                        F.array_join("available_colors", "|"))),
        F.when(F.col("start_page").isNotNull() & (F.col("start_page") != 0),
               F.concat(F.lit("_start_page="),
                        F.col("start_page").cast("string")))))
    meta_render = F.when(
        (F.col("kind") == "products") & (F.size(parts) > 0),
        F.array_join(parts, ";"))

    # page_types: int()-castable keys only, rendered sorted by the
    # parsed int key.
    pt = F.filter(
        F.map_entries(F.coalesce(
            "page_types", F.create_map().cast("map<string,string>"))),
        lambda e: e["key"].try_cast("int").isNotNull())
    pt_sorted = F.array_sort(
        F.transform(pt, lambda e: F.struct(
            e["key"].try_cast("int").alias("k"), e["value"].alias("v"))))
    # `page_types if page_types else None` — zero valid entries is NULL
    pt_render = F.when(
        (F.col("kind") == "products") & (F.size(pt_sorted) > 0),
        F.array_join(
            F.transform(pt_sorted,
                        lambda s: F.concat(s["k"].cast("string"),
                                           F.lit(":"), s["v"])), ","))

    return items.select(
        "doc_id", "item_id", "kind",
        reason.isNull().alias("kept"), reason.alias("reason"),
        F.when(reason.isNull(), F.col("name")).alias("name_out"),
        F.when(reason.isNull(),
               F.coalesce(F.col("confidence"), F.lit(0.8)))
         .alias("confidence_out"),
        F.when(reason.isNull(), meta_render).alias("meta_render"),
        F.when(reason.isNull(), pt_render).alias("page_types_render"))


def catalog_factory_fold(results: DataFrame) -> DataFrame:
    """Doc-level catalog factory alias coalesce (:1404-1416)."""
    return results.select(
        "doc_id",
        F.coalesce("catalog_factory", "catalog_manufacturer",
                   "catalog_brand", "catalog_supplier")
         .alias("factory_out"),
        F.coalesce("catalog_factory_group", "catalog_group")
         .alias("factory_group_out"))


# ---------------------------------------------------------------------------
# 2. page ranges from start pages


def calculate_page_ranges(products: DataFrame) -> DataFrame:
    """Expects doc_id, product_idx, start_page (nullable int),
    total_pages.  Emits page_start/page_end/n_pages (NULL when the
    product has no truthy start_page)."""
    anchored = F.col("start_page").isNotNull() & (F.col("start_page") != 0)
    w = (Window.partitionBy("doc_id")
         .orderBy("start_page", "product_idx"))
    nxt = F.lead("start_page").over(w)
    with_start = (products.where(anchored)
                  .withColumn("_nxt", nxt))
    end0 = F.when(F.col("_nxt").isNotNull(), F.col("_nxt") - 1).otherwise(
        F.least(F.col("start_page") + 10, F.col("total_pages")))
    end = F.greatest(end0, F.col("start_page"))
    ranged = with_start.select(
        "doc_id", "product_idx",
        F.col("start_page").alias("page_start"),
        end.alias("page_end"),
        (end - F.col("start_page") + 1).alias("n_pages"))
    rest = products.where(
        F.col("start_page").isNull() | (F.col("start_page") == 0)).select(
        "doc_id", "product_idx",
        F.lit(None).cast("int").alias("page_start"),
        F.lit(None).cast("int").alias("page_end"),
        F.lit(None).cast("int").alias("n_pages"))
    return ranged.unionByName(rest)


# ---------------------------------------------------------------------------
# 3. folio -> physical offset reconciliation


def reconcile_folio_offsets(products: DataFrame) -> DataFrame:
    """Expects doc_id, product_idx, folio_start (nullable int),
    physical_headline (nullable int — NULL when detection found no
    pages), page_range array<int>, total_pages.  Emits the applied
    per-doc offset and the shifted range."""
    anchored = (F.col("folio_start").isNotNull()
                & (F.col("folio_start") != 0)
                & F.col("physical_headline").isNotNull())
    offs = (products.where(anchored)
            .select("doc_id", "product_idx",
                    (F.col("physical_headline") - F.col("folio_start"))
                    .alias("off")))
    # most_common(1): max count, ties by first insertion (product
    # order).  count DESC then min(product_idx) ASC, realized as one
    # max over a struct — no window over the products table.
    per_off = (offs.groupBy("doc_id", "off")
               .agg(F.count("*").alias("cnt"),
                    F.min("product_idx").alias("first_idx")))
    per_doc = (per_off.groupBy("doc_id")
               .agg(F.max(F.struct(F.col("cnt"),
                                   (-F.col("first_idx")).alias("ni"),
                                   F.col("off"))).alias("best"),
                    F.sum("cnt").alias("n_anchored")))
    majority = F.greatest(
        F.lit(2), (F.col("n_anchored") / 2).cast("int") + 1)
    applied = (per_doc.select(
        "doc_id",
        F.when((F.col("best.off") != 0)
               & (F.col("best.cnt") >= majority), F.col("best.off"))
         .otherwise(F.lit(0)).alias("applied_offset")))
    out = (products.join(applied, "doc_id", "left")
           .withColumn("applied_offset",
                       F.coalesce("applied_offset", F.lit(0))))
    shifted = F.when(
        (F.col("applied_offset") != 0) & (F.size("page_range") > 0),
        F.filter(
            F.transform("page_range",
                        lambda p: p + F.col("applied_offset")),
            lambda p: (p >= 1) & (p <= F.col("total_pages"))))\
        .otherwise(F.col("page_range"))
    return out.select(
        "doc_id", "product_idx", "applied_offset",
        F.array_join(F.transform(shifted, lambda p: p.cast("string")),
                     ",").alias("pages_csv"))


# ---------------------------------------------------------------------------
# synthesized inputs (shared shape with the SQL twins below)


def synth_discovery_items(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    d = e % 125
    total = (F.lit(20) + (d % 3) * 10).cast("int")
    name = (F.when(e % 11 == 0, F.lit(""))
            .when(e % 11 == 1, F.lit("   "))
            .when(e % 11 == 2, F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("Item "), e.cast("string"))))
    pr = (F.when(e % 5 == 1, F.array(F.lit(1), F.lit(2)))
          .when(e % 5 == 2, F.array(total + 1))
          .when(e % 5 == 3, F.array(F.lit(0), F.lit(3), total + 5))
          .when(e % 5 == 4, F.array(F.lit(4))))
    sp = (F.when(e % 7 == 1, F.lit(0))
          .when(e % 7 == 2, F.lit(5))
          .when(e % 7 == 3, F.lit(12))).cast("int")
    kind = (F.when(e % 4 == 0, "products")
            .when(e % 4 == 1, "certificates")
            .when(e % 4 == 2, "logos")
            .otherwise("specifications"))
    colors = (F.when(e % 6 == 0,
                     F.array(F.lit("white"), F.lit("sand")))
              .when(e % 6 == 1, F.array().cast("array<string>")))
    pt = (F.when(e % 8 == 0, F.expr(
        "map('2', 'product', 'x', 'cover', '10', 'specs')"))
          .when(e % 8 == 1, F.expr("map('nope', 'cover')")))
    return events.select(
        d.alias("doc_id"), e.alias("item_id"), kind.alias("kind"),
        name.alias("name"), pr.alias("page_range"),
        sp.alias("start_page"), total.alias("total_pages"),
        F.when(e % 9 == 0, F.lit(0.5)).cast("double").alias("confidence"),
        F.when(e % 3 == 0, F.lit("Studio Due")).alias("designer"),
        F.when(e % 10 == 0, F.lit("Atelier")).alias("studio"),
        F.when(e % 12 == 0, F.lit("tile")).alias("category"),
        colors.alias("available_colors"), pt.alias("page_types"),
        (e % 2 == 0).alias("has_meta"))


SYNTH_ITEMS_SQL = """
SELECT event_id % 125 AS doc_id, event_id AS item_id,
       CASE WHEN event_id % 4 = 0 THEN 'products'
            WHEN event_id % 4 = 1 THEN 'certificates'
            WHEN event_id % 4 = 2 THEN 'logos'
            ELSE 'specifications' END AS kind,
       CASE WHEN event_id % 11 = 0 THEN ''
            WHEN event_id % 11 = 1 THEN '   '
            WHEN event_id % 11 = 2 THEN NULL
            ELSE 'Item ' || event_id END AS name,
       CAST(20 + (event_id % 125) % 3 * 10 AS INT) AS total_pages,
       CASE WHEN event_id % 5 = 1 THEN [1, 2]
            WHEN event_id % 5 = 2
                THEN [CAST(21 + (event_id % 125) % 3 * 10 AS INT)]
            WHEN event_id % 5 = 3
                THEN [0, 3, CAST(25 + (event_id % 125) % 3 * 10 AS INT)]
            WHEN event_id % 5 = 4 THEN [4] END AS page_range,
       CAST(CASE WHEN event_id % 7 = 1 THEN 0
                 WHEN event_id % 7 = 2 THEN 5
                 WHEN event_id % 7 = 3 THEN 12 END AS INT) AS start_page,
       CASE WHEN event_id % 9 = 0 THEN 0.5 END AS confidence,
       CASE WHEN event_id % 3 = 0 THEN 'Studio Due' END AS designer,
       CASE WHEN event_id % 10 = 0 THEN 'Atelier' END AS studio,
       CASE WHEN event_id % 12 = 0 THEN 'tile' END AS category,
       CASE WHEN event_id % 6 = 0 THEN ['white', 'sand']
            WHEN event_id % 6 = 1 THEN CAST([] AS VARCHAR[])
       END AS available_colors,
       CASE WHEN event_id % 8 = 0
                THEN map(['2', 'x', '10'],
                         ['product', 'cover', 'specs'])
            WHEN event_id % 8 = 1 THEN map(['nope'], ['cover'])
       END AS page_types,
       event_id % 2 = 0 AS has_meta
FROM events"""


def validate_parse_sql() -> str:
    """DuckDB twin over a CTE `items` shaped like SYNTH_ITEMS_SQL."""
    empty_name = "(name IS NULL OR trim(name) = '')"
    bad = ("list_filter(page_range, p -> p IS NULL OR p < 1 "
           "OR p > total_pages)")
    reason = f"""CASE
        WHEN {empty_name} THEN 'missing or empty ''name'''
        WHEN page_range IS NOT NULL AND len({bad}) > 0
            THEN 'page_range out of bounds (1..' || total_pages
                 || '): [' || array_to_string({bad}, ', ') || ']'
        END"""
    parts = """list_filter([
        CASE WHEN NOT has_meta AND designer IS NOT NULL
             THEN 'designer=' || designer END,
        CASE WHEN NOT has_meta AND studio IS NOT NULL
             THEN 'studio=' || studio END,
        CASE WHEN NOT has_meta AND category IS NOT NULL
             THEN 'category=' || category END,
        CASE WHEN NOT has_meta
             THEN 'confidence='
                  || format('{:.2f}', coalesce(confidence, 0.8)) END,
        CASE WHEN available_colors IS NOT NULL
                  AND len(available_colors) > 0
             THEN 'available_colors='
                  || array_to_string(available_colors, '|') END,
        CASE WHEN start_page IS NOT NULL AND start_page <> 0
             THEN '_start_page=' || start_page END
        ], x -> x IS NOT NULL)"""
    # DuckDB list_sort has no key function -- sort entries via a
    # projected struct instead (struct comparison leads on field k).
    pt_render = """array_to_string(
        [s.k || ':' || s.v for s in list_sort(
            [struct_pack(k := TRY_CAST(e.key AS INT), v := e.value)
             for e in map_entries(coalesce(page_types,
                 MAP([], [])::MAP(VARCHAR, VARCHAR)))
             if TRY_CAST(e.key AS INT) IS NOT NULL])], ',')"""
    return f"""
    SELECT doc_id, item_id, kind,
           ({reason}) IS NULL AS kept, {reason} AS reason,
           CASE WHEN ({reason}) IS NULL THEN name END AS name_out,
           CASE WHEN ({reason}) IS NULL
                THEN coalesce(confidence, 0.8) END AS confidence_out,
           CASE WHEN ({reason}) IS NULL AND kind = 'products'
                THEN array_to_string({parts}, ';') END AS meta_render,
           CASE WHEN ({reason}) IS NULL AND kind = 'products'
                THEN nullif({pt_render}, '') END AS page_types_render
    FROM items"""


def synth_range_products(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    d = e % 200
    sp = (F.when(e % 6 == 0, F.lit(None).cast("int"))
          .when(e % 6 == 1, F.lit(0))
          .when(e % 6 == 2, ((e % 13) + 3).cast("int"))
          .when(e % 6 == 3, ((e % 13) + 3).cast("int"))  # tie fodder
          .when(e % 6 == 4, ((e % 29) + 1).cast("int"))
          .otherwise(((e % 17) + 40).cast("int")))
    return events.select(
        d.alias("doc_id"), e.alias("product_idx"),
        sp.alias("start_page"),
        (F.lit(30) + (d % 4) * 8).cast("int").alias("total_pages"))


SYNTH_RANGE_SQL = """
SELECT event_id % 200 AS doc_id, event_id AS product_idx,
       CAST(CASE WHEN event_id % 6 = 0 THEN NULL
                 WHEN event_id % 6 = 1 THEN 0
                 WHEN event_id % 6 = 2 THEN event_id % 13 + 3
                 WHEN event_id % 6 = 3 THEN event_id % 13 + 3
                 WHEN event_id % 6 = 4 THEN event_id % 29 + 1
                 ELSE event_id % 17 + 40 END AS INT) AS start_page,
       CAST(30 + (event_id % 200) % 4 * 8 AS INT) AS total_pages
FROM events"""


def page_ranges_sql() -> str:
    """DuckDB twin over a CTE `products` shaped like SYNTH_RANGE_SQL."""
    return """
    anchored AS (
        SELECT *, lead(start_page) OVER (
                   PARTITION BY doc_id
                   ORDER BY start_page, product_idx) AS nxt
        FROM products
        WHERE start_page IS NOT NULL AND start_page <> 0),
    ranged AS (
        SELECT doc_id, product_idx, start_page AS page_start,
               greatest(CASE WHEN nxt IS NOT NULL THEN nxt - 1
                             ELSE least(start_page + 10, total_pages)
                        END, start_page) AS page_end
        FROM anchored)
    SELECT doc_id, product_idx,
           CAST(page_start AS INT) AS page_start,
           CAST(page_end AS INT) AS page_end,
           CAST(page_end - page_start + 1 AS INT) AS n_pages
    FROM ranged
    UNION ALL
    SELECT doc_id, product_idx, NULL, NULL, NULL
    FROM products WHERE start_page IS NULL OR start_page = 0"""


def synth_folio_products(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    d = e % 100
    # per-doc offset regimes: %5==0 consensus +4 (majority), %5==1
    # consensus 0, %5==2 split (no majority), %5==3 no anchors,
    # %5==4 majority -2 with one dissenter.
    folio = (F.when(e % 10 == 9, F.lit(None).cast("int"))
             .otherwise(((e % 7) + 5).cast("int")))
    phys = (
        F.when(e % 10 == 8, F.lit(None).cast("int"))
        .when(d % 5 == 0, ((e % 7) + 9).cast("int"))
        .when(d % 5 == 1, ((e % 7) + 5).cast("int"))
        .when(d % 5 == 2,
              F.when(e % 2 == 0, ((e % 7) + 6))
               .otherwise((e % 7) + 8).cast("int"))
        .when(d % 5 == 3, F.lit(None).cast("int"))
        .otherwise(F.when(e % 9 == 0, ((e % 7) + 11))
                   .otherwise((e % 7) + 3).cast("int")))
    pr = (F.when(e % 11 == 0, F.array().cast("array<int>"))
          .otherwise(F.sequence(
              (e % 7 + 5).cast("int"),
              (e % 7 + 5 + e % 3 + 1).cast("int"))))
    return events.select(
        d.alias("doc_id"), e.alias("product_idx"),
        folio.alias("folio_start"), phys.alias("physical_headline"),
        pr.alias("page_range"),
        (F.lit(14) + (d % 3) * 2).cast("int").alias("total_pages"))


SYNTH_FOLIO_SQL = """
SELECT event_id % 100 AS doc_id, event_id AS product_idx,
       CAST(CASE WHEN event_id % 10 = 9 THEN NULL
                 ELSE event_id % 7 + 5 END AS INT) AS folio_start,
       CAST(CASE WHEN event_id % 10 = 8 THEN NULL
                 WHEN (event_id % 100) % 5 = 0 THEN event_id % 7 + 9
                 WHEN (event_id % 100) % 5 = 1 THEN event_id % 7 + 5
                 WHEN (event_id % 100) % 5 = 2 THEN
                     CASE WHEN event_id % 2 = 0 THEN event_id % 7 + 6
                          ELSE event_id % 7 + 8 END
                 WHEN (event_id % 100) % 5 = 3 THEN NULL
                 ELSE CASE WHEN event_id % 9 = 0 THEN event_id % 7 + 11
                           ELSE event_id % 7 + 3 END
            END AS INT) AS physical_headline,
       CASE WHEN event_id % 11 = 0 THEN CAST([] AS INT[])
            ELSE range(CAST(event_id % 7 + 5 AS INT),
                       CAST(event_id % 7 + 5 + event_id % 3 + 2 AS INT))
       END AS page_range,
       CAST(14 + (event_id % 100) % 3 * 2 AS INT) AS total_pages
FROM events"""


def folio_offsets_sql() -> str:
    """DuckDB twin over a CTE `products` shaped like SYNTH_FOLIO_SQL."""
    return """
    offs AS (
        SELECT doc_id, product_idx,
               physical_headline - folio_start AS off
        FROM products
        WHERE folio_start IS NOT NULL AND folio_start <> 0
              AND physical_headline IS NOT NULL),
    per_off AS (
        SELECT doc_id, off, count(*) AS cnt,
               min(product_idx) AS first_idx
        FROM offs GROUP BY 1, 2),
    per_doc AS (
        SELECT doc_id,
               max(struct_pack(cnt := cnt, ni := -first_idx,
                               off := off)) AS best,
               sum(cnt) AS n_anchored
        FROM per_off GROUP BY 1),
    applied AS (
        SELECT doc_id,
               CASE WHEN (best.off) <> 0 AND (best.cnt) >=
                        greatest(2, CAST(n_anchored // 2 AS INT) + 1)
                    THEN best.off ELSE 0 END AS applied_offset
        FROM per_doc)
    SELECT p.doc_id, p.product_idx,
           CAST(coalesce(a.applied_offset, 0) AS INT)
               AS applied_offset,
           coalesce(array_to_string(
               CASE WHEN coalesce(a.applied_offset, 0) <> 0
                         AND len(p.page_range) > 0
                    THEN list_filter(
                        [x + a.applied_offset for x in p.page_range],
                        x -> x >= 1 AND x <= p.total_pages)
                    ELSE p.page_range END, ','), '') AS pages_csv
    FROM products p LEFT JOIN applied a USING (doc_id)"""
# NB: DuckDB array_to_string(empty list) is NULL (Spark array_join is
# '') — the twin coalesces to '' to match.
