"""Admin-configurable search-prompt folds — the deterministic
fallbacks and the LLM-response post-processing.

Reference: ``app/services/search/search_prompt_service.py`` —

- ``_simple_enhancement`` (:462-487): scan prompt lines in order for
  keyword→expansion mappings ('→' preferred over '->' PER LINE,
  exactly-2-part splits only), keyword stripped of quotes and dashes
  (``.strip().strip('"').strip("'").strip('-').strip()``),
  case-insensitive containment in the query, FIRST matching line wins
  and appends its expansion — an empty keyword matches every query
  (pinned).
- ``_simple_formatting`` (:489-516): a prompt mentioning
  'availability' stable-sorts by (availability == 'in_stock', score)
  DESCENDING; elif 'price' ascending by float(metadata.price,
  999999 default); ties keep the original order.
- ``_simple_filtering`` (:519-546): drops out_of_stock rows when the
  prompt says 'out of stock' / 'out-of-stock', then discontinued rows
  when it says 'discontinued' — both gates can apply.
- ``_apply_llm_formatting`` (:330-369): reorder =
  ``[results[i] for i in order if i < len]`` — a NEGATIVE index wraps
  Python-style and, because the append phase checks membership of the
  raw index values, the wrapped element is emitted TWICE when its
  positive index isn't in the order list (pinned). Unmentioned items
  append in original order.
- ``_apply_llm_filtering`` (:371-408): keep =
  ``[results[i] for i in keep if i < len]`` — same negative wrap.
- ``_apply_llm_enrichment`` (:410-460): batches of 10, the LLM's
  enrichment map is keyed by BATCH-LOCAL index, merged
  ``{**result, **enrichment}`` (enrichment wins on collisions).

Scale: formatting/filtering are window/filter ops over result rows
(partitioned by request); the reorder/keep/enrich folds are per-row
array transforms over the per-request result arrays the LLM sees —
no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _clean_keyword(k):
    k = F.trim(k)
    k = F.regexp_replace(k, '^"+|"+$', "")
    k = F.regexp_replace(k, "^'+|'+$", "")
    k = F.regexp_replace(k, "^-+|-+$", "")
    return F.trim(k)


def simple_enhancement(reqs: DataFrame) -> DataFrame:
    """``reqs``: (req_id long, query string, prompt_text string)."""
    lines = F.split(F.coalesce(F.col("prompt_text"), F.lit("")), "\n")
    q_lower = F.lower(F.coalesce(F.col("query"), F.lit("")))

    def cand(line):
        parts = F.when(line.contains("→"), F.split(line, "→")) \
            .otherwise(F.split(line, "->"))
        k = _clean_keyword(F.try_element_at(parts, F.lit(1)))
        return F.struct(
            ((line.contains("→") | line.contains("->"))
             & (F.size(parts) == 2)
             & q_lower.contains(F.lower(k))).alias("hit"),
            F.trim(F.try_element_at(parts, F.lit(2)))
            .alias("expansion"))

    hits = F.filter(F.transform(lines, cand), lambda c: c["hit"])
    enhanced = F.when(
        F.size(hits) > 0,
        F.concat(F.col("query"), F.lit(" "),
                 F.element_at(hits, 1)["expansion"])
    ).otherwise(F.col("query"))
    return reqs.select("req_id", F.col("query").alias("original"),
                       enhanced.alias("enhanced_query"),
                       (F.size(hits) > 0).alias("expanded"))


def simple_formatting(rows: DataFrame) -> DataFrame:
    """``rows``: (req_id, idx int — original order, score double,
    availability string, price double?, prompt_text). Appends the
    post-sort ``rank`` (0-based)."""
    p = F.lower(F.coalesce(F.col("prompt_text"), F.lit("")))
    mode = (F.when(p.contains("availability"), F.lit("availability"))
            .when(p.contains("price"), F.lit("price"))
            .otherwise(F.lit("none")))
    in_stock = (F.coalesce(F.col("availability"), F.lit(""))
                == "in_stock").cast("int")
    price = F.coalesce(F.col("price"), F.lit(999999.0))
    sort_key = (
        F.when(mode == "availability",
               F.struct((1 - in_stock).cast("double").alias("a"),
                        (-F.coalesce(F.col("score"), F.lit(0.0)))
                        .alias("b"),
                        F.col("idx").cast("double").alias("c")))
        .when(mode == "price",
              F.struct(price.alias("a"), F.lit(0.0).alias("b"),
                       F.col("idx").cast("double").alias("c")))
        .otherwise(F.struct(F.col("idx").cast("double").alias("a"),
                            F.lit(0.0).alias("b"),
                            F.lit(0.0).alias("c"))))
    w = Window.partitionBy("req_id").orderBy(sort_key.asc())
    return (rows.withColumn("mode", mode)
            .withColumn("rank", F.row_number().over(w) - 1))


def simple_filtering(rows: DataFrame) -> DataFrame:
    """Appends (kept boolean, drop_reason)."""
    p = F.lower(F.coalesce(F.col("prompt_text"), F.lit("")))
    oos_gate = p.contains("out of stock") | p.contains("out-of-stock")
    disc_gate = p.contains("discontinued")
    is_oos = (F.lower(F.coalesce(F.col("availability"), F.lit("")))
              == "out_of_stock")
    is_disc = F.coalesce(F.col("discontinued"), F.lit(False))
    reason = (F.when(oos_gate & is_oos, F.lit("out_of_stock"))
              .when(disc_gate & is_disc, F.lit("discontinued")))
    return (rows.withColumn("drop_reason", reason)
            .withColumn("kept", reason.isNull()))


def _wrap(i, n):
    """Python results[i] for -n <= i < n; callers pre-filter i < n."""
    return F.when(i >= 0, i).otherwise(n + i)


def llm_reorder(reqs: DataFrame) -> DataFrame:
    """``reqs``: (req_id, items array<struct<idx:int,name:string>>,
    order array<int> — the parsed LLM reply). One output row per
    emitted item with its position; invalid replies (non-int entries
    are modeled upstream as a null order) mark ``fallback``."""
    n = F.size(F.col("items"))
    # an index below -len raises IndexError in the reference and the
    # whole LLM path falls back (:367-369) — modeled as llm_applied
    # false, like a null (unparseable) order
    valid = (F.col("order").isNotNull()
             & ~F.exists(F.col("order"), lambda i: i < -n))
    in_range = F.filter(F.col("order"),
                        lambda i: (i < n) & (i >= -n))
    picked = F.transform(in_range,
                         lambda i: F.element_at(F.col("items"),
                                                _wrap(i, n) + 1))
    included = F.col("order")
    tail = F.transform(
        F.filter(F.sequence(F.lit(0), n - 1),
                 lambda i: ~F.coalesce(
                     F.array_contains(included, i), F.lit(False))),
        lambda i: F.element_at(F.col("items"), i + 1))
    reordered = F.when(valid, F.concat(picked, tail)) \
        .otherwise(F.col("items"))
    out = reqs.select(
        "req_id", valid.alias("llm_applied"),
        F.posexplode(reordered).alias("position", "item"))
    return out.select("req_id", "llm_applied", "position",
                      F.col("item.idx").alias("idx"),
                      F.col("item.name").alias("name"))


def llm_filter_keep(reqs: DataFrame) -> DataFrame:
    """``reqs``: (req_id, items, keep array<int>). keep-list
    semantics: ``[results[i] for i in keep if i < len]`` — negative
    indices wrap (pinned); order follows the keep list."""
    n = F.size(F.col("items"))
    in_range = F.filter(F.col("keep"),
                        lambda i: (i < n) & (i >= -n))
    picked = F.transform(in_range,
                         lambda i: F.element_at(F.col("items"),
                                                _wrap(i, n) + 1))
    out = reqs.select(
        "req_id", F.posexplode(picked).alias("position", "item"))
    return out.select("req_id", "position",
                      F.col("item.idx").alias("idx"),
                      F.col("item.name").alias("name"))


def llm_enrich(rows: DataFrame, enrichments: DataFrame) -> DataFrame:
    """``rows``: (req_id, idx int — request-wide order, name).
    ``enrichments``: (req_id, batch int, index int — BATCH-LOCAL,
    ai_summary string). Batch b covers idx in [10b, 10b+10); the
    enrichment map is keyed by local index (pinned)."""
    e = enrichments.select(
        "req_id",
        (F.col("batch") * 10 + F.col("index")).alias("idx"),
        "ai_summary")
    return (rows.join(e, ["req_id", "idx"], "left")
            .select("req_id", "idx", "name",
                    F.col("ai_summary").isNotNull().alias("enriched"),
                    "ai_summary"))


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

ENHANCE_PROMPTS = (
    'modern → contemporary design, minimalist aesthetic\n'
    '- "rustic" -> farmhouse style\n'
    'bright → airy, light-filled',
    'no mappings here at all',
    'a → b → c\n\'\'  ->  matches everything\nxyz -> unused',
    '-tile- -> ceramic porcelain\nstone→ natural stone finish',
    "",
)

QUERIES = ("modern kitchen", "rustic BRIGHT bath", "plain query",
           "tile and stone", "Stone wall")

FORMAT_PROMPTS = ("Prioritize availability of items",
                  "Sort results by price ascending",
                  "availability then price", "no ranking hints")

FILTER_PROMPTS = ("Hide out of stock items",
                  "drop discontinued and out-of-stock rows",
                  "remove discontinued products", "keep everything")


def synth_enhance_reqs(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    return d.select(
        F.col("doc").alias("req_id"),
        F.element_at(F.array(*[F.lit(q) for q in QUERIES]),
                     (F.col("doc") % len(QUERIES) + 1).cast("int"))
        .alias("query"),
        F.element_at(F.array(*[F.lit(p) for p in ENHANCE_PROMPTS]),
                     (F.col("doc") % len(ENHANCE_PROMPTS) + 1)
                     .cast("int")).alias("prompt_text"))


def synth_result_rows(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = d.select("doc", F.explode(F.sequence(
        F.lit(0), (F.col("doc") % 6 + 2).cast("int"))).alias("idx"))
    h = F.col("doc") * 53 + F.col("idx") * 11
    return rows.select(
        F.col("doc").alias("req_id"),
        F.col("idx").cast("int").alias("idx"),
        F.concat(F.lit("item-"), F.col("idx").cast("string"))
        .alias("name"),
        ((h % 40) * 0.25).alias("score"),
        F.element_at(F.array(
            F.lit("in_stock"), F.lit("out_of_stock"),
            F.lit("OUT_OF_STOCK"), F.lit(""),
            F.lit(None).cast("string")),
            (h % 5 + 1).cast("int")).alias("availability"),
        F.when(h % 4 == 0, F.lit(None).cast("double"))
        .otherwise((h % 900) * 0.5).alias("price"),
        (h % 7 == 0).alias("discontinued"))


def synth_format_rows(docs) -> DataFrame:
    rows = synth_result_rows(docs)
    pr = F.element_at(
        F.array(*[F.lit(p) for p in FORMAT_PROMPTS]),
        (F.col("req_id") % len(FORMAT_PROMPTS) + 1).cast("int"))
    return rows.withColumn("prompt_text", pr)


def synth_filter_rows(docs) -> DataFrame:
    rows = synth_result_rows(docs)
    pr = F.element_at(
        F.array(*[F.lit(p) for p in FILTER_PROMPTS]),
        (F.col("req_id") % len(FILTER_PROMPTS) + 1).cast("int"))
    return rows.withColumn("prompt_text", pr)


def synth_order_reqs(docs, *, key: str) -> DataFrame:
    """Per-request items array + an LLM order/keep list exercising
    duplicates, negative wrap, out-of-range, and null (fallback)."""
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    n = (F.col("doc") % 4 + 2).cast("int")  # 2..5 items
    items = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.struct(
            i.cast("int").alias("idx"),
            F.concat(F.lit("item-"), i.cast("string")).alias("name")))
    m = F.col("doc") % 5
    arr = (
        F.when(m == 0, F.reverse(F.sequence(F.lit(0), n - 1)))
        .when(m == 1, F.array(F.lit(-1), F.lit(0)))
        .when(m == 2, F.array(F.lit(1), F.lit(99), F.lit(1)))
        .when(m == 3, F.lit(None).cast("array<int>"))
        .otherwise(F.array(F.lit(0))))
    return d.select(F.col("doc").alias("req_id"),
                    items.alias("items"),
                    F.transform(arr, lambda x: x.cast("int"))
                    .alias(key))


def synth_enrichments(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = (d.where(F.col("doc") % 3 != 0)
            .select("doc", F.explode(F.array(
                F.lit(0), F.lit(1))).alias("index")))
    return rows.select(
        F.col("doc").alias("req_id"),
        (F.col("doc") % 2).cast("int").alias("batch"),
        F.col("index").cast("int").alias("index"),
        F.concat(F.lit("summary-"), F.col("index").cast("string"))
        .alias("ai_summary"))


def _sql_lit(s: str) -> str:
    return "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"


def duck_enhance_sql() -> str:
    prompts = ", ".join(_sql_lit(p) for p in ENHANCE_PROMPTS)
    queries = ", ".join(_sql_lit(q) for q in QUERIES)
    clean = ("trim(regexp_replace(regexp_replace(regexp_replace("
             "trim(parts[1]), '^\"+|\"+$', '', 'g'), "
             "'^''+|''+$', '', 'g'), '^-+|-+$', '', 'g'))")
    return f"""
ereq AS (
  SELECT doc AS req_id,
         ([{queries}])[CAST(doc % {len(QUERIES)} AS INT) + 1]
           AS query,
         ([{prompts}])[CAST(doc % {len(ENHANCE_PROMPTS)} AS INT) + 1]
           AS prompt_text
  FROM docs),
elines AS (
  SELECT req_id, query, i, line,
         CASE WHEN contains(line, '→')
              THEN string_split(line, '→')
              ELSE string_split(line, '->') END AS parts
  FROM (SELECT req_id, query, i,
               string_split(coalesce(prompt_text, ''), chr(10))[i]
                 AS line
        FROM (SELECT *, unnest(generate_series(1, len(string_split(
                  coalesce(prompt_text, ''), chr(10))))) AS i
              FROM ereq))),
ecand AS (
  SELECT req_id, query, i,
         trim(parts[2]) AS expansion
  FROM elines
  WHERE (contains(line, '→') OR contains(line, '->'))
    AND len(parts) = 2
    AND contains(lower(coalesce(query, '')), lower({clean}))),
efirst AS (
  SELECT req_id, expansion FROM ecand
  QUALIFY row_number() OVER (PARTITION BY req_id ORDER BY i) = 1),
eout AS (
  SELECT r.req_id, r.query AS original,
         CASE WHEN f.expansion IS NOT NULL
              THEN r.query || ' ' || f.expansion
              ELSE r.query END AS enhanced_query,
         f.expansion IS NOT NULL AS expanded
  FROM ereq r LEFT JOIN efirst f ON r.req_id = f.req_id)"""


_DUCK_RESULT_ROWS = """
srows AS (
  SELECT doc AS req_id, CAST(i AS INT) AS idx,
         'item-' || CAST(i AS VARCHAR) AS name,
         ((doc*53 + i*11) % 40) * 0.25 AS score,
         (['in_stock', 'out_of_stock', 'OUT_OF_STOCK', '', NULL])
           [CAST((doc*53 + i*11) % 5 AS INT) + 1] AS availability,
         CASE WHEN (doc*53 + i*11) % 4 = 0 THEN NULL
              ELSE ((doc*53 + i*11) % 900) * 0.5 END AS price,
         (doc*53 + i*11) % 7 = 0 AS discontinued
  FROM docs, LATERAL (SELECT unnest(generate_series(0, doc % 6 + 2))
                      AS i))"""


def duck_format_sql() -> str:
    prompts = ", ".join(_sql_lit(p) for p in FORMAT_PROMPTS)
    return _DUCK_RESULT_ROWS + f""",
sfrows AS (
  SELECT *, ([{prompts}])[CAST(req_id % {len(FORMAT_PROMPTS)} AS INT)
                          + 1] AS prompt_text
  FROM srows),
sfmt AS (
  SELECT req_id, idx, name, score, availability, price,
         discontinued, prompt_text,
         CASE WHEN contains(lower(coalesce(prompt_text, '')),
                            'availability') THEN 'availability'
              WHEN contains(lower(coalesce(prompt_text, '')),
                            'price') THEN 'price'
              ELSE 'none' END AS mode,
         CAST(row_number() OVER (
           PARTITION BY req_id ORDER BY
             CASE WHEN contains(lower(coalesce(prompt_text, '')),
                                'availability')
               THEN CASE WHEN coalesce(availability, '') = 'in_stock'
                         THEN 0.0 ELSE 1.0 END
               WHEN contains(lower(coalesce(prompt_text, '')),
                             'price')
               THEN coalesce(price, 999999.0)
               ELSE CAST(idx AS DOUBLE) END,
             CASE WHEN contains(lower(coalesce(prompt_text, '')),
                                'availability')
               THEN -coalesce(score, 0.0) ELSE 0.0 END,
             idx) - 1 AS INT) AS rank
  FROM sfrows)"""


def duck_filter_sql() -> str:
    prompts = ", ".join(_sql_lit(p) for p in FILTER_PROMPTS)
    return _DUCK_RESULT_ROWS + f""",
sfirows AS (
  SELECT *, ([{prompts}])[CAST(req_id % {len(FILTER_PROMPTS)} AS INT)
                          + 1] AS prompt_text
  FROM srows),
sfil AS (
  SELECT *,
         CASE WHEN (contains(lower(prompt_text), 'out of stock')
                    OR contains(lower(prompt_text), 'out-of-stock'))
                   AND lower(coalesce(availability, ''))
                       = 'out_of_stock'
                THEN 'out_of_stock'
              WHEN contains(lower(prompt_text), 'discontinued')
                   AND coalesce(discontinued, false)
                THEN 'discontinued' END AS drop_reason
  FROM sfirows),
sfout AS (
  SELECT req_id, idx, name, score, availability, price,
         discontinued, prompt_text, drop_reason,
         drop_reason IS NULL AS kept
  FROM sfil)"""


def _duck_order_items(key: str) -> str:
    return f"""
oreq AS (
  SELECT doc AS req_id,
         CAST(doc % 4 + 2 AS INT) AS n,
         list_transform(generate_series(0, CAST(doc % 4 + 1 AS INT)),
           i -> {{'idx': CAST(i AS INT),
                  'name': 'item-' || CAST(i AS VARCHAR)}}) AS items,
         CASE CAST(doc % 5 AS INT)
           WHEN 0 THEN list_reverse(list_transform(
             generate_series(0, CAST(doc % 4 + 1 AS INT)),
             i -> CAST(i AS INT)))
           WHEN 1 THEN [CAST(-1 AS INT), CAST(0 AS INT)]
           WHEN 2 THEN [CAST(1 AS INT), CAST(99 AS INT),
                        CAST(1 AS INT)]
           WHEN 3 THEN NULL
           ELSE [CAST(0 AS INT)]
         END AS {key}
  FROM docs)"""


def duck_reorder_sql() -> str:
    return _duck_order_items("ord") + """,
opick AS (
  SELECT req_id,
         ord IS NOT NULL
           AND len(list_filter(ord, i -> i < -n)) = 0 AS llm_applied,
         CASE WHEN ord IS NOT NULL
                   AND len(list_filter(ord, i -> i < -n)) = 0
           THEN list_transform(
                  list_filter(ord, i -> i < n AND i >= -n),
                  i -> items[CASE WHEN i >= 0 THEN i ELSE n + i END
                             + 1])
                || list_transform(
                  list_filter(generate_series(0, n - 1),
                    i -> NOT coalesce(list_contains(ord,
                                                    CAST(i AS INT)),
                                      false)),
                  i -> items[i + 1])
           ELSE items END AS reordered
  FROM oreq),
oout AS (
  SELECT req_id, llm_applied, CAST(p - 1 AS INT) AS position,
         reordered[p].idx AS idx, reordered[p].name AS name
  FROM (SELECT *, unnest(generate_series(1, len(reordered))) AS p
        FROM opick))"""


def duck_keep_sql() -> str:
    return _duck_order_items("keep") + """,
kpick AS (
  SELECT req_id,
         list_transform(
           list_filter(coalesce(keep, CAST([] AS INT[])),
                       i -> i < n AND i >= -n),
           i -> items[CASE WHEN i >= 0 THEN i ELSE n + i END + 1])
           AS picked
  FROM oreq),
kout AS (
  SELECT req_id, CAST(p - 1 AS INT) AS position,
         picked[p].idx AS idx, picked[p].name AS name
  FROM (SELECT *, unnest(generate_series(1, len(picked))) AS p
        FROM kpick))"""


DUCK_ENRICH_SQL = """
enrows AS (
  SELECT doc AS req_id, CAST(i AS INT) AS idx,
         'item-' || CAST(i AS VARCHAR) AS name
  FROM docs, LATERAL (SELECT unnest(generate_series(0, doc % 6 + 2))
                      AS i)),
enr AS (
  SELECT doc AS req_id, CAST(doc % 2 AS INT) AS batch,
         CAST(ix AS INT) AS index,
         'summary-' || CAST(ix AS VARCHAR) AS ai_summary
  FROM docs, (SELECT unnest([0, 1]) AS ix)
  WHERE doc % 3 != 0),
enout AS (
  SELECT r.req_id, r.idx, r.name,
         e.ai_summary IS NOT NULL AS enriched, e.ai_summary
  FROM enrows r LEFT JOIN enr e
    ON r.req_id = e.req_id AND e.batch * 10 + e.index = r.idx)"""
