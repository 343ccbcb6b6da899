"""Shopflix.gr adapter fold: the retry-once-on-empty-hydration search
outcome and the Spryker double-parameter URL build.

Re-expresses ``app/modules/greek_marketplaces/adapters/shopflix.py``
(plausibility/facet gates shared with the skroutz/bestprice folds).
Pinned behaviors:

- the Spryker search URL carries the encoded query TWICE
  (``prod_GR_spryker[query]`` and ``k``) plus the price-asc sortBy
  (shopflix.py:38-51);
- the hydration retry fires ONLY when the first scrape SUCCEEDED but
  extracted nothing (``result.success and (not data or not found)``) —
  a failed scrape does NOT retry (shopflix.py:104-118, pin);
- after the (possibly retried) result: no url → drop; plausibility
  gate BEFORE the facet gate (same order as bestprice, opposite of
  skroutz); single hit with 'Shopflix.gr' retailer default via
  truthy-or, currency symbol-else-hint-else-'EUR', raw availability
  passthrough (shopflix.py:120-160).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators.marketplace_facets import (
    _facet_ok, _plausible, _price_amount, _price_currency,
    _MF_PATH_SQL, _mf_norm_sql)

SORT_KEY = "prod_GR_spryker_search-result-data.price_asc"


def shopflix_outcome(reqs: DataFrame) -> DataFrame:
    """Per request: the built search URL, whether the hydration retry
    fired, the decision, and the single-hit fields (NULL unless the
    decision is 'hit')."""
    enc = F.regexp_replace(F.col("adaptive_query"), " ", "%20")
    url = F.concat(
        F.lit("https://shopflix.gr/search?prod_GR_spryker%5Bquery%5D="),
        enc, F.lit("&prod_GR_spryker%5BsortBy%5D=" + SORT_KEY
                   + "&k="), enc)
    a1_empty = ~F.col("a1_has_data") | ~F.col("a1_found")
    retried = F.col("a1_success") & a1_empty
    eff_success = (F.when(retried, F.col("a2_success"))
                   .otherwise(F.col("a1_success")))
    eff_found = (F.when(retried,
                        F.col("a2_has_data") & F.col("a2_found"))
                 .otherwise(F.col("a1_has_data") & F.col("a1_found")))
    matched, _ = _facet_ok(F.col("product_url"), F.col("sr_name"))
    plaus = _plausible(F.col("query"), F.col("product_url"),
                       F.col("sr_name"))
    decision = (
        F.when(~F.col("api_configured"), F.lit("not_configured"))
        .when(~eff_success | ~eff_found, F.lit("not_found"))
        .when(F.col("product_url").isNull(), F.lit("no_product_url"))
        .when(~plaus, F.lit("dropped_implausible"))
        .when(~matched, F.lit("facet_mismatch"))
        .otherwise(F.lit("hit")))
    is_hit = decision == "hit"
    hint = F.coalesce(F.col("currency"), F.lit("EUR"))
    return reqs.select(
        "req_id",
        F.when(F.col("api_configured"), url)
        .otherwise(F.lit(None).cast("string")).alias("search_url"),
        (F.col("api_configured") & retried).alias("retried"),
        decision.alias("decision"),
        F.when(is_hit, F.coalesce(F.nullif(F.col("sr_name"),
                                           F.lit("")),
                                  F.lit("Shopflix.gr")))
        .alias("retailer_name"),
        F.when(is_hit, _price_amount(F.col("price_str")))
        .alias("price"),
        F.when(is_hit, _price_amount(F.col("original_price_str")))
        .alias("original_price"),
        F.when(is_hit,
               F.coalesce(_price_currency(F.col("price_str"),
                                          F.lit(None)), hint))
        .alias("currency_out"),
        F.when(is_hit, F.col("availability")).alias("availability"))


def synth_shopflix_reqs(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    m = F.col("doc")
    sku = F.concat(F.lit("10"), (m % 90 + 10).cast("string"))
    return d.select(
        m.alias("req_id"),
        (m % 19 != 0).alias("api_configured"),
        F.concat(F.lit("alpha modelx premium item "), sku)
        .alias("query"),
        F.concat(F.lit("alpha modelx "), sku).alias("adaptive_query"),
        (m % 6 != 0).alias("a1_success"),
        (m % 5 != 0).alias("a1_has_data"),
        (m % 4 != 0).alias("a1_found"),
        (m % 7 != 0).alias("a2_success"),
        (m % 3 != 0).alias("a2_has_data"),
        (m % 8 != 0).alias("a2_found"),
        F.when(m % 11 == 3, F.lit("Unrelated Widget Thing"))
        .when(m % 11 == 4, F.lit(""))
        .otherwise(F.concat(F.lit("Alpha ModelX "), sku))
        .alias("sr_name"),
        F.when(m % 9 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("https://shopflix.gr/p/alpha-modelx-"),
                            sku, F.lit("-"), m.cast("string")))
        .alias("product_url"),
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
        (m % 7 != 1).alias("has_facets"),
        F.when(m % 10 == 0, F.array(F.lit("999111")))
        .otherwise(F.array(sku)).alias("sku_tokens"),
        F.lit("").alias("product_type"))


def duck_shopflix_sql() -> str:
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

    plaus = f"""CASE
          WHEN len({mtok('query')}) = 0 THEN true
          WHEN len(list_sort(list_distinct({mtok(path('product_url'))}
               || {mtok('sr_name')}))) = 0 THEN false
          ELSE len(list_intersect({mtok('query')},
                   list_sort(list_distinct({mtok(path('product_url'))}
                   || {mtok('sr_name')})))) / len({mtok('query')})
               >= 0.30 END"""
    facet = f"""CASE WHEN NOT has_facets THEN true
              ELSE len(list_filter(
                list_transform(
                  list_filter(sku_tokens, t -> coalesce(t,'') != ''),
                  t -> {_mf_norm_sql('t')}),
                t -> contains(
                  {_mf_norm_sql(f"{path('product_url')} || ' ' || coalesce(sr_name, '')")},
                  t))) > 0 END"""
    amt = ("nullif(regexp_extract(coalesce({p}, ''), "
           "'([0-9]+(?:\\.[0-9]+)?)', 1), '')::DOUBLE")
    cur = ("CASE regexp_extract(coalesce({p}, ''), '([€$£])', 1) "
           "WHEN '€' THEN 'EUR' WHEN '$' THEN 'USD' "
           "WHEN '£' THEN 'GBP' END")
    return f"""
freqs AS (
  SELECT doc AS req_id,
         doc % 19 != 0 AS api_configured,
         'alpha modelx premium item 10' || CAST(doc % 90 + 10 AS VARCHAR)
           AS query,
         'alpha modelx 10' || CAST(doc % 90 + 10 AS VARCHAR)
           AS adaptive_query,
         doc % 6 != 0 AS a1_success,
         doc % 5 != 0 AS a1_has_data,
         doc % 4 != 0 AS a1_found,
         doc % 7 != 0 AS a2_success,
         doc % 3 != 0 AS a2_has_data,
         doc % 8 != 0 AS a2_found,
         CASE WHEN doc % 11 = 3 THEN 'Unrelated Widget Thing'
              WHEN doc % 11 = 4 THEN ''
              ELSE 'Alpha ModelX 10'
                   || CAST(doc % 90 + 10 AS VARCHAR) END AS sr_name,
         CASE WHEN doc % 9 = 0 THEN NULL
              ELSE 'https://shopflix.gr/p/alpha-modelx-10'
                   || CAST(doc % 90 + 10 AS VARCHAR) || '-'
                   || CAST(doc AS VARCHAR) END AS product_url,
         (['49.5', '€123.45', '', '1299', NULL])
           [CAST(doc % 5 AS INT) + 1] AS price_str,
         (['59.9', NULL, '€150', ''])
           [CAST(doc % 4 AS INT) + 1] AS original_price_str,
         CASE WHEN doc % 11 != 0 THEN 'EUR' END AS currency,
         (['Άμεσα διαθέσιμο', NULL, 'out of stock', ''])
           [CAST(doc % 4 AS INT) + 1] AS availability,
         doc % 7 != 1 AS has_facets,
         CASE WHEN doc % 10 = 0 THEN ['999111']
              ELSE ['10' || CAST(doc % 90 + 10 AS VARCHAR)] END
           AS sku_tokens
  FROM docs),
fgate AS (
  SELECT *,
         a1_success AND (NOT a1_has_data OR NOT a1_found) AS retried0,
         replace(adaptive_query, ' ', '%20') AS enc
  FROM freqs),
fres AS (
  SELECT *,
         CASE WHEN retried0 THEN a2_success ELSE a1_success END
           AS eff_success,
         CASE WHEN retried0 THEN a2_has_data AND a2_found
              ELSE a1_has_data AND a1_found END AS eff_found,
         {plaus} AS plaus_ok,
         {facet} AS facet_ok2
  FROM fgate),
fdec AS (
  SELECT *,
         CASE WHEN NOT api_configured THEN 'not_configured'
              WHEN NOT eff_success OR NOT eff_found THEN 'not_found'
              WHEN product_url IS NULL THEN 'no_product_url'
              WHEN NOT plaus_ok THEN 'dropped_implausible'
              WHEN NOT facet_ok2 THEN 'facet_mismatch'
              ELSE 'hit' END AS decision
  FROM fres),
fout AS (
  SELECT req_id,
         CASE WHEN api_configured THEN
           'https://shopflix.gr/search?prod_GR_spryker%5Bquery%5D='
           || enc
           || '&prod_GR_spryker%5BsortBy%5D={SORT_KEY}&k=' || enc
         END AS search_url,
         api_configured AND retried0 AS retried,
         decision,
         CASE WHEN decision = 'hit'
              THEN coalesce(nullif(sr_name, ''), 'Shopflix.gr')
         END AS retailer_name,
         CASE WHEN decision = 'hit'
              THEN {amt.format(p='price_str')} END AS price,
         CASE WHEN decision = 'hit'
              THEN {amt.format(p='original_price_str')}
         END AS original_price,
         CASE WHEN decision = 'hit'
              THEN coalesce({cur.format(p='price_str')},
                            coalesce(currency, 'EUR'))
         END AS currency_out,
         CASE WHEN decision = 'hit' THEN availability
         END AS availability
  FROM fdec)"""
