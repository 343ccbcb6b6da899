"""Bestprice.gr adapter folds: the search admission cascade and the
per-shop hit assembly.

Re-expresses ``app/modules/greek_marketplaces/adapters/bestprice.py``
(the skroutz sibling is covered in ``operators/marketplace_facets``;
the shared plausibility/facet gates are reused from there). Pinned
differences from the skroutz adapter:

- the plausibility gate runs BEFORE the facet gate
  (bestprice.py:138-157 — skroutz checks facets first);
- fanout wants a ``bestprice.gr/to/`` OR ``bestprice.gr/item/`` URL
  substring (no merchant_count threshold), and a FAILED fanout (scrape
  exception, page not found, page implausible, page facet mismatch, or
  zero usable shops) falls back to the single legacy hit rather than
  dropping (bestprice.py:162-171 ``if shop_hits: return shop_hits``);
- the page-level facet/plausibility checks reuse the SEARCH url with
  the PAGE product name (bestprice.py:216-231);
- shop rows are emitted UNCAPPED (no ``[:limit]`` slice), skipping rows
  missing url OR name (bestprice.py:233-236);
- the availability ladder has only OUT tokens ('εκτός', 'out',
  'unavail') — default in_stock, no IN-token tier (bestprice.py:238-242);
- the single fallback passes the raw availability string THROUGH
  (skroutz stamps 'in_stock') and defaults the retailer to
  'Bestprice.gr' via a truthy or (bestprice.py:175-185).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators.marketplace_facets import (
    _facet_ok, _plausible, _price_amount, _price_currency,
    _MF_PATH_SQL, _mf_norm_sql)

BP_OUT_TOKENS = ("εκτός", "out", "unavail")


def _wants_fanout(url):
    return (url.isNotNull()
            & (url.contains("bestprice.gr/to/")
               | url.contains("bestprice.gr/item/")))


def _with_flags(search: DataFrame, shops: DataFrame) -> DataFrame:
    valid = (shops
             .where(F.col("merchant_url").isNotNull()
                    & (F.col("merchant_url") != "")
                    & F.col("merchant_name").isNotNull()
                    & (F.col("merchant_name") != ""))
             .groupBy("req_id")
             .agg(F.count(F.lit(1)).alias("_n_valid")))
    s = (search.join(valid, "req_id", "left")
         .withColumn("has_shops",
                     F.coalesce(F.col("_n_valid") > 0, F.lit(False)))
         .drop("_n_valid"))
    url = F.col("product_url")
    search_ok, _ = _facet_ok(url, F.col("sr_name"))
    page_ok_f, _ = _facet_ok(url, F.col("page_product_name"))
    fanout = (_wants_fanout(url) & ~F.col("page_raised")
              & F.coalesce(F.col("page_found"), F.lit(False))
              & _plausible(F.col("query"), url,
                           F.col("page_product_name"))
              & page_ok_f & F.col("has_shops"))
    decision = (
        F.when(~F.col("api_configured"), F.lit("not_configured"))
        .when(~F.col("found"), F.lit("not_found"))
        .when(url.isNull(), F.lit("no_product_url"))
        .when(~_plausible(F.col("query"), url, F.col("sr_name")),
              F.lit("dropped_implausible"))
        .when(~search_ok, F.lit("facet_mismatch"))
        .when(fanout, F.lit("fanout"))
        .otherwise(F.lit("fallback_single")))
    return s.withColumn("decision", decision) \
        .withColumn("wanted_fanout", _wants_fanout(url))


def bestprice_decisions(search: DataFrame,
                        shops: DataFrame) -> DataFrame:
    """Per-request decision (bestprice.py:105-185): not_configured /
    not_found / no_product_url / dropped_implausible (BEFORE facets —
    pin) / facet_mismatch / fanout / fallback_single (incl. every
    failed-fanout path)."""
    return _with_flags(search, shops).select(
        "req_id", "decision", "wanted_fanout")


def bestprice_hits(search: DataFrame, shops: DataFrame) -> DataFrame:
    """PriceHit rows (bestprice.py:175-247): uncapped shop fanout with
    the 3-token OUT ladder, or the single legacy hit with raw
    availability passthrough and 'Bestprice.gr' retailer default."""
    s = _with_flags(search, shops)
    fan_req = s.where(F.col("decision") == "fanout").select(
        "req_id", F.col("currency").alias("s_currency"))
    m = (shops
         .where(F.col("merchant_url").isNotNull()
                & (F.col("merchant_url") != "")
                & F.col("merchant_name").isNotNull()
                & (F.col("merchant_name") != ""))
         .join(F.broadcast(fan_req), "req_id"))
    fallback_cur = F.coalesce(F.col("s_currency"), F.lit("EUR"))
    avail = F.lower(F.coalesce(F.col("availability"), F.lit("")))
    availability = (
        F.when(F.exists(F.array(*[F.lit(t) for t in BP_OUT_TOKENS]),
                        lambda t: avail.contains(t)),
               F.lit("out_of_stock"))
        .otherwise(F.lit("in_stock")))
    fan_hits = m.select(
        "req_id", F.col("sidx").alias("hit_idx"),
        F.col("merchant_name").alias("retailer_name"),
        F.col("merchant_url").alias("product_url"),
        _price_amount(F.col("price")).alias("price"),
        F.lit(None).cast("double").alias("original_price"),
        F.coalesce(_price_currency(F.col("price"), F.lit(None)),
                   fallback_cur).alias("currency"),
        availability.alias("availability"))
    single = s.where(F.col("decision") == "fallback_single")
    hint = F.coalesce(F.col("currency"), F.lit("EUR"))
    single_hits = single.select(
        "req_id", F.lit(0).cast("int").alias("hit_idx"),
        F.coalesce(F.nullif(F.col("sr_name"), F.lit("")),
                   F.lit("Bestprice.gr")).alias("retailer_name"),
        F.col("product_url"),
        _price_amount(F.col("price_str")).alias("price"),
        _price_amount(F.col("original_price_str"))
        .alias("original_price"),
        F.coalesce(_price_currency(F.col("price_str"),
                                   F.lit(None)), hint)
        .alias("currency"),
        F.col("availability").alias("availability"))
    return (fan_hits.unionByName(single_hits)
            .withColumn("source", F.lit("bestprice"))
            .withColumn("verified", F.lit(False))
            .withColumn("notes", F.lit("via Bestprice")))


# ---------------------------------------------------------------------------
# synthetic inputs
# ---------------------------------------------------------------------------

def synth_bp_search(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    m = F.col("doc")
    sku = F.concat(F.lit("10"), (m % 90 + 10).cast("string"))
    url = (F.when(m % 5 == 0, F.lit(None).cast("string"))
           .when(m % 6 == 2, F.concat(
               F.lit("https://www.bestprice.gr/to/"), m.cast("string"),
               F.lit("/alpha-modelx-"), sku, F.lit(".html")))
           .when(m % 6 == 3, F.concat(
               F.lit("https://www.bestprice.gr/item/"),
               m.cast("string"), F.lit("/alpha-modelx-"), sku,
               F.lit(".html")))
           .when(m % 6 == 4, F.concat(
               F.lit("https://www.bestprice.gr/cat/123/alpha-modelx-"),
               sku, F.lit(".html")))
           .otherwise(F.concat(
               F.lit("https://shop"), (m % 7).cast("string"),
               F.lit(".gr/p/alpha-modelx-"), sku)))
    return d.select(
        m.alias("req_id"),
        (m % 19 != 0).alias("api_configured"),
        F.concat(F.lit("alpha modelx premium item "), sku)
        .alias("query"),
        (m % 17 != 0).alias("found"),
        F.when(m % 11 == 3, F.lit("Unrelated Widget Thing"))
        .when(m % 11 == 4, F.lit(""))
        .otherwise(F.concat(F.lit("Alpha ModelX "), sku))
        .alias("sr_name"),
        url.alias("product_url"),
        F.element_at(F.array(
            F.lit("49.5"), F.lit("€123.45"), F.lit(""),
            F.lit("1299"), F.lit(None).cast("string")),
            (m % 5 + 1).cast("int")).alias("price_str"),
        F.element_at(F.array(
            F.lit("59.9"), F.lit(None).cast("string"),
            F.lit("€150"), F.lit("")),
            (m % 4 + 1).cast("int")).alias("original_price_str"),
        F.when(m % 11 != 0, F.lit("EUR")).alias("currency"),
        F.element_at(F.array(
            F.lit("Άμεσα διαθέσιμο"), F.lit(None).cast("string"),
            F.lit("out of stock"), F.lit("")),
            (m % 4 + 1).cast("int")).alias("availability"),
        (m % 23 == 0).alias("page_raised"),
        (m % 13 != 0).alias("page_found"),
        F.when(m % 8 == 0, F.lit("Totally Different Gadget"))
        .otherwise(F.concat(F.lit("Alpha ModelX "), sku))
        .alias("page_product_name"),
        (m % 7 != 1).alias("has_facets"),
        F.when(m % 10 == 0, F.array(F.lit("999111")))
        .otherwise(F.array(sku)).alias("sku_tokens"),
        F.lit("").alias("product_type"))


def synth_bp_shops(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = (d.where(F.col("doc") % 4 > 0)
            .select("doc", F.explode(F.sequence(
                F.lit(0), (F.col("doc") % 4 - 1).cast("int")))
                .alias("sidx")))
    h = F.col("doc") * 29 + F.col("sidx") * 13
    return rows.select(
        F.col("doc").alias("req_id"),
        F.col("sidx").cast("int").alias("sidx"),
        F.when(h % 7 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("Shop "), (h % 9).cast("string")))
        .alias("merchant_name"),
        F.when(h % 6 == 0, F.lit(""))
        .when(h % 6 == 1, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("https://shop"),
                            (h % 9).cast("string"),
                            F.lit(".gr/item/"), h.cast("string")))
        .alias("merchant_url"),
        F.element_at(F.array(
            F.lit("49.5"), F.lit("€19.9"), F.lit(""),
            F.lit(None).cast("string"), F.lit("250")),
            (h % 5 + 1).cast("int")).alias("price"),
        F.element_at(F.array(
            F.lit("Εκτός αποθέματος"), F.lit("Άμεσα διαθέσιμο"),
            F.lit("unavailable"), F.lit("out of stock soon"),
            F.lit("Παράδοση σε 1-3 ημέρες"),
            F.lit(None).cast("string"), F.lit("")),
            (h % 7 + 1).cast("int")).alias("availability"))


# ---------------------------------------------------------------------------
# DuckDB twin
# ---------------------------------------------------------------------------

def duck_bestprice_sql() -> str:
    from mivaa_pdf_extractor_spark.operators.identity import (
        MATCH_STOPWORDS)
    stop = "[" + ", ".join("'" + s + "'" for s in MATCH_STOPWORDS) \
        + "]"

    def mtok(x):
        return ("list_sort(list_distinct(list_filter("
                f"string_split_regex(lower(coalesce({x}, '')), "
                "'[^a-z0-9α-ω]+'), t -> t <> '' AND length(t) >= 3 "
                f"AND NOT list_contains({stop}, t))))")

    def path(u):
        return _MF_PATH_SQL.format(u=u)

    def plaus(q, u, n):
        return f"""CASE
          WHEN len({mtok(q)}) = 0 THEN true
          WHEN len(list_sort(list_distinct({mtok(path(u))}
               || {mtok(n)}))) = 0 THEN false
          ELSE len(list_intersect({mtok(q)},
                   list_sort(list_distinct({mtok(path(u))}
                   || {mtok(n)})))) / len({mtok(q)}) >= 0.30 END"""

    def facet_ok(n):
        return f"""CASE WHEN NOT has_facets THEN true
              ELSE len(list_filter(
                list_transform(
                  list_filter(sku_tokens, t -> coalesce(t,'') != ''),
                  t -> {_mf_norm_sql('t')}),
                t -> contains(
                  {_mf_norm_sql(f"{path('product_url')} || ' ' || coalesce({n}, '')")},
                  t))) > 0 END"""

    amt = ("nullif(regexp_extract(coalesce({p}, ''), "
           "'([0-9]+(?:\\.[0-9]+)?)', 1), '')::DOUBLE")
    cur = ("CASE regexp_extract(coalesce({p}, ''), '([€$£])', 1) "
           "WHEN '€' THEN 'EUR' WHEN '$' THEN 'USD' "
           "WHEN '£' THEN 'GBP' END")
    return f"""
bsearch AS (
  SELECT doc AS req_id,
         doc % 19 != 0 AS api_configured,
         'alpha modelx premium item 10' || CAST(doc % 90 + 10 AS VARCHAR)
           AS query,
         doc % 17 != 0 AS found,
         CASE WHEN doc % 11 = 3 THEN 'Unrelated Widget Thing'
              WHEN doc % 11 = 4 THEN ''
              ELSE 'Alpha ModelX 10'
                   || CAST(doc % 90 + 10 AS VARCHAR) END AS sr_name,
         CASE WHEN doc % 5 = 0 THEN NULL
              WHEN doc % 6 = 2 THEN 'https://www.bestprice.gr/to/'
                   || CAST(doc AS VARCHAR) || '/alpha-modelx-10'
                   || CAST(doc % 90 + 10 AS VARCHAR) || '.html'
              WHEN doc % 6 = 3 THEN 'https://www.bestprice.gr/item/'
                   || CAST(doc AS VARCHAR) || '/alpha-modelx-10'
                   || CAST(doc % 90 + 10 AS VARCHAR) || '.html'
              WHEN doc % 6 = 4
                THEN 'https://www.bestprice.gr/cat/123/alpha-modelx-10'
                   || CAST(doc % 90 + 10 AS VARCHAR) || '.html'
              ELSE 'https://shop' || CAST(doc % 7 AS VARCHAR)
                   || '.gr/p/alpha-modelx-10'
                   || CAST(doc % 90 + 10 AS VARCHAR)
         END AS product_url,
         (['49.5', '€123.45', '', '1299', NULL])
           [CAST(doc % 5 AS INT) + 1] AS price_str,
         (['59.9', NULL, '€150', ''])
           [CAST(doc % 4 AS INT) + 1] AS original_price_str,
         CASE WHEN doc % 11 != 0 THEN 'EUR' END AS currency,
         (['Άμεσα διαθέσιμο', NULL, 'out of stock', ''])
           [CAST(doc % 4 AS INT) + 1] AS availability,
         doc % 23 = 0 AS page_raised,
         doc % 13 != 0 AS page_found,
         CASE WHEN doc % 8 = 0 THEN 'Totally Different Gadget'
              ELSE 'Alpha ModelX 10'
                   || CAST(doc % 90 + 10 AS VARCHAR) END
           AS page_product_name,
         doc % 7 != 1 AS has_facets,
         CASE WHEN doc % 10 = 0 THEN ['999111']
              ELSE ['10' || CAST(doc % 90 + 10 AS VARCHAR)] END
           AS sku_tokens
  FROM docs),
bshops AS (
  SELECT doc AS req_id, CAST(x AS INT) AS sidx,
         CASE WHEN (doc*29 + x*13) % 7 = 1 THEN ''
              ELSE 'Shop ' || CAST((doc*29 + x*13) % 9 AS VARCHAR)
         END AS merchant_name,
         CASE WHEN (doc*29 + x*13) % 6 = 0 THEN ''
              WHEN (doc*29 + x*13) % 6 = 1 THEN NULL
              ELSE 'https://shop'
                   || CAST((doc*29 + x*13) % 9 AS VARCHAR)
                   || '.gr/item/' || CAST(doc*29 + x*13 AS VARCHAR)
         END AS merchant_url,
         (['49.5', '€19.9', '', NULL, '250'])
           [CAST((doc*29 + x*13) % 5 AS INT) + 1] AS price,
         (['Εκτός αποθέματος', 'Άμεσα διαθέσιμο', 'unavailable',
           'out of stock soon', 'Παράδοση σε 1-3 ημέρες', NULL, ''])
           [CAST((doc*29 + x*13) % 7 AS INT) + 1] AS availability
  FROM docs, LATERAL (SELECT unnest(generate_series(0, doc % 4 - 1))
                      AS x)
  WHERE doc % 4 > 0),
bvalid AS (
  SELECT * FROM bshops
  WHERE merchant_url IS NOT NULL AND merchant_url != ''
    AND merchant_name IS NOT NULL AND merchant_name != ''),
bhass AS (SELECT req_id, count(*) > 0 AS has_shops
          FROM bvalid GROUP BY req_id),
bprep AS (
  SELECT s.*, coalesce(h.has_shops, false) AS has_shops
  FROM bsearch s LEFT JOIN bhass h ON s.req_id = h.req_id),
bgate AS (
  SELECT *,
         product_url IS NOT NULL
           AND (contains(product_url, 'bestprice.gr/to/')
                OR contains(product_url, 'bestprice.gr/item/'))
           AS wanted_fanout,
         {plaus('query', 'product_url', 'sr_name')} AS search_plaus,
         {facet_ok('sr_name')} AS search_facet,
         {plaus('query', 'product_url', 'page_product_name')}
           AS page_plaus,
         {facet_ok('page_product_name')} AS page_facet
  FROM bprep),
bdec AS (
  SELECT *,
         CASE WHEN NOT api_configured THEN 'not_configured'
              WHEN NOT found THEN 'not_found'
              WHEN product_url IS NULL THEN 'no_product_url'
              WHEN NOT search_plaus THEN 'dropped_implausible'
              WHEN NOT search_facet THEN 'facet_mismatch'
              WHEN wanted_fanout AND NOT page_raised
                   AND coalesce(page_found, false) AND page_plaus
                   AND page_facet AND has_shops THEN 'fanout'
              ELSE 'fallback_single' END AS decision
  FROM bgate),
bdecision AS (
  SELECT req_id, decision, wanted_fanout FROM bdec),
bhits AS (
  SELECT m.req_id, m.sidx AS hit_idx,
         m.merchant_name AS retailer_name,
         m.merchant_url AS product_url,
         {amt.format(p='m.price')} AS price,
         CAST(NULL AS DOUBLE) AS original_price,
         coalesce({cur.format(p='m.price')},
                  coalesce(s.currency, 'EUR')) AS currency,
         CASE WHEN len(list_filter(['εκτός', 'out', 'unavail'],
                t -> contains(lower(coalesce(m.availability, '')),
                              t))) > 0 THEN 'out_of_stock'
              ELSE 'in_stock' END AS availability,
         'bestprice' AS source, false AS verified,
         'via Bestprice' AS notes
  FROM bvalid m JOIN bdec s ON m.req_id = s.req_id
  WHERE s.decision = 'fanout'
  UNION ALL
  SELECT req_id, 0 AS hit_idx,
         coalesce(nullif(sr_name, ''), 'Bestprice.gr'),
         product_url,
         {amt.format(p='price_str')},
         {amt.format(p='original_price_str')},
         coalesce({cur.format(p='price_str')},
                  coalesce(currency, 'EUR')),
         availability,
         'bestprice', false, 'via Bestprice'
  FROM bdec WHERE decision = 'fallback_single')"""
