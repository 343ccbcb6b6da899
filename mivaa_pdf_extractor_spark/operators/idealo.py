"""Idealo search-adapter fold: the listing admission filter.

Re-expresses ``app/modules/idealo/adapters/idealo_search.py:93-121``
(``scrape_idealo_search``'s per-listing loop). Pinned behaviors:

- the ``[:limit]`` slice runs BEFORE the per-row filters, so skipped
  rows (zero/invalid price, aggregator retailer) consume limit slots —
  a page with 5 junk rows then a good one yields NOTHING at limit 5
  (same limit-then-filter family as `project_list_filter`);
- price: None, unparsable (float() raises → row skipped by the inner
  try), and <= 0 all skip — an explicit 0 price is dropped;
- retailer: strip() then truthy gate, then a lowercase EXACT-match
  aggregator blocklist of ('idealo', 'idealo.de', 'idealo.it') —
  'idealo.fr' passes (pin: the tuple never grew with the locales);
- product_url falls back to the SEARCH url via truthy-or ('' → search
  url); currency or-'EUR'; notes 'via Idealo ({host})'.

Map-side when-chain + filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AGGREGATOR_NAMES = ("idealo", "idealo.de", "idealo.it")


def idealo_listing_filter(listings: DataFrame) -> DataFrame:
    """Keep rows surviving the slice + filters; emit assembled hit
    fields."""
    retailer = F.trim(F.coalesce(F.col("retailer_name"), F.lit("")))
    sliced = F.col("lidx") < F.col("lim")
    price_ok = (F.col("price_parsable") & F.col("price").isNotNull()
                & (F.col("price") > 0))
    retailer_ok = ((retailer != "")
                   & ~F.lower(retailer).isin(*AGGREGATOR_NAMES))
    search_url = F.concat(
        F.lit("https://"), F.col("host"),
        F.lit("/preisvergleich/MainSearchProductCategory.html?q="),
        F.regexp_replace(F.col("query"), " ", "%20"),
        F.lit("&sortKey=Cheapest"))
    return (listings
            .where(sliced & price_ok & retailer_ok)
            .select(
                "req_id", F.col("lidx").alias("hit_idx"),
                retailer.alias("retailer_name"),
                F.coalesce(F.nullif(F.col("product_url"), F.lit("")),
                           search_url).alias("product_url"),
                F.col("price"),
                F.coalesce(F.nullif(F.col("currency"), F.lit("")),
                           F.lit("EUR")).alias("currency"),
                F.lit("in_stock").alias("availability"),
                F.concat(F.lit("via Idealo ("), F.col("host"),
                         F.lit(")")).alias("notes"),
                F.lit("idealo").alias("source")))


def synth_idealo_listings(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    req = F.floor(e / 8).cast("long")
    lidx = (e % 8).cast("int")
    h = e * 17
    return events.select(
        req.alias("req_id"),
        lidx.alias("lidx"),
        (F.when(req % 3 == 0, 5).otherwise(3)).cast("int").alias("lim"),
        F.when(req % 2 == 0, F.lit("www.idealo.de"))
        .otherwise(F.lit("www.idealo.it")).alias("host"),
        F.lit("alpha modelx 1042").alias("query"),
        (h % 7 != 0).alias("price_parsable"),
        F.when(h % 5 == 0, F.lit(None).cast("double"))
        .when(h % 5 == 1, F.lit(0.0))
        .when(h % 5 == 2, F.lit(-5.0))
        .otherwise((h % 900).cast("double") / 10.0 + 0.1)
        .alias("price"),
        F.element_at(F.array(
            F.lit(" MediaMarkt "), F.lit("idealo"), F.lit("Idealo.DE"),
            F.lit("idealo.fr"), F.lit(""), F.lit("   "),
            F.lit(None).cast("string"), F.lit("Coolblue")),
            (h % 8 + 1).cast("int")).alias("retailer_name"),
        F.when(h % 4 == 0, F.lit(""))
        .when(h % 4 == 1, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("https://shop"),
                            (h % 9).cast("string"),
                            F.lit(".de/item/"), e.cast("string")))
        .alias("product_url"),
        F.when(h % 6 == 0, F.lit("")).when(h % 6 == 1, F.lit("GBP"))
        .when(h % 6 == 2, F.lit(None).cast("string"))
        .otherwise(F.lit("EUR")).alias("currency"))


SYNTH_IDEALO_SQL = """
    SELECT CAST(event_id // 8 AS BIGINT) AS req_id,
           CAST(event_id % 8 AS INT) AS lidx,
           CAST(CASE WHEN (event_id // 8) % 3 = 0 THEN 5 ELSE 3 END
                AS INT) AS lim,
           CASE WHEN (event_id // 8) % 2 = 0 THEN 'www.idealo.de'
                ELSE 'www.idealo.it' END AS host,
           'alpha modelx 1042' AS query,
           (event_id * 17) % 7 <> 0 AS price_parsable,
           CASE WHEN (event_id * 17) % 5 = 0 THEN NULL
                WHEN (event_id * 17) % 5 = 1 THEN 0.0
                WHEN (event_id * 17) % 5 = 2 THEN -5.0
                ELSE CAST((event_id * 17) % 900 AS DOUBLE) / 10.0 + 0.1
           END AS price,
           ([' MediaMarkt ', 'idealo', 'Idealo.DE', 'idealo.fr', '',
             '   ', NULL, 'Coolblue'])
             [CAST((event_id * 17) % 8 AS INT) + 1] AS retailer_name,
           CASE WHEN (event_id * 17) % 4 = 0 THEN ''
                WHEN (event_id * 17) % 4 = 1 THEN NULL
                ELSE 'https://shop'
                     || CAST((event_id * 17) % 9 AS VARCHAR)
                     || '.de/item/' || CAST(event_id AS VARCHAR)
           END AS product_url,
           CASE WHEN (event_id * 17) % 6 = 0 THEN ''
                WHEN (event_id * 17) % 6 = 1 THEN 'GBP'
                WHEN (event_id * 17) % 6 = 2 THEN NULL
                ELSE 'EUR' END AS currency
    FROM events
"""


def idealo_filter_sql() -> str:
    return f"""
        WITH l AS ({SYNTH_IDEALO_SQL}),
        g AS (
          SELECT *,
                 trim(coalesce(retailer_name, '')) AS retailer,
                 'https://' || host
                 || '/preisvergleich/MainSearchProductCategory.html?q='
                 || replace(query, ' ', '%20')
                 || '&sortKey=Cheapest' AS search_url
          FROM l)
        SELECT req_id,
               CAST(lidx AS INT) AS hit_idx,
               retailer AS retailer_name,
               coalesce(nullif(product_url, ''), search_url)
                   AS product_url,
               price,
               coalesce(nullif(currency, ''), 'EUR') AS currency,
               'in_stock' AS availability,
               'via Idealo (' || host || ')' AS notes,
               'idealo' AS source
        FROM g
        WHERE lidx < lim
          AND price_parsable AND price IS NOT NULL AND price > 0
          AND retailer <> ''
          AND lower(retailer) NOT IN ('idealo', 'idealo.de',
                                      'idealo.it')
    """


# ---------------------------------------------------------------------------
# locale routing (app/modules/idealo/service.py:40-80)
# ---------------------------------------------------------------------------

LOCALE_HOST = {
    "DE": "www.idealo.de", "AT": "www.idealo.de",
    "IT": "www.idealo.it", "UK": "www.idealo.co.uk",
    "GB": "www.idealo.co.uk", "ES": "www.idealo.es",
    "FR": "www.idealo.fr",
}


def idealo_locale_route(reqs: DataFrame) -> DataFrame:
    """Gate ladder + locale table (service.py:53-80): empty query →
    skip; module disabled → skip; unknown locale → skip with NO
    fallback to .de (pin — out-of-country stock would surface); AT
    aliases .de, UK and GB both map .co.uk; adapter exceptions fold
    to empty."""
    cc = F.upper(F.coalesce(F.col("country_code"), F.lit("")))
    host = F.lit(None).cast("string")
    for k, v in LOCALE_HOST.items():
        host = F.when(cc == k, v).otherwise(host)
    no_query = (F.col("query").isNull()) | (F.col("query") == "")
    reason = (F.when(no_query, "empty_query")
              .when(~F.col("module_enabled"), "module_disabled")
              .when(host.isNull(), "no_locale")
              .when(F.col("scrape_raised"), "error_empty")
              .otherwise(F.lit(None).cast("string")))
    return reqs.select(
        "req_id",
        F.when(reason.isNull(), host)
        .otherwise(F.lit(None).cast("string")).alias("host"),
        reason.alias("skip_reason"))


def synth_locale_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .when(e % 7 == 1, F.lit(""))
        .otherwise(F.lit("hansgrohe talis e")).alias("query"),
        F.element_at(F.array(
            F.lit("DE"), F.lit("at"), F.lit("IT"), F.lit("uk"),
            F.lit("GB"), F.lit("ES"), F.lit("FR"), F.lit("GR"),
            F.lit(None).cast("string"), F.lit("")),
            (e % 10 + 1).cast("int")).alias("country_code"),
        (e % 5 != 0).alias("module_enabled"),
        (e % 11 == 0).alias("scrape_raised"))


SYNTH_LOCALE_REQS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN ''
                ELSE 'hansgrohe talis e' END AS query,
           (['DE', 'at', 'IT', 'uk', 'GB', 'ES', 'FR', 'GR', NULL,
             ''])[CAST(event_id % 10 AS INT) + 1] AS country_code,
           event_id % 5 <> 0 AS module_enabled,
           event_id % 11 = 0 AS scrape_raised
    FROM events
"""


def locale_route_sql() -> str:
    cases = "\n".join(f"WHEN '{k}' THEN '{v}'"
                      for k, v in LOCALE_HOST.items())
    return f"""
        WITH r AS ({SYNTH_LOCALE_REQS_SQL}),
        g AS (
          SELECT *,
                 CASE upper(coalesce(country_code, ''))
                      {cases} END AS host0,
                 query IS NULL OR query = '' AS no_query
          FROM r),
        h AS (
          SELECT *,
                 CASE WHEN no_query THEN 'empty_query'
                      WHEN NOT module_enabled THEN 'module_disabled'
                      WHEN host0 IS NULL THEN 'no_locale'
                      WHEN scrape_raised THEN 'error_empty'
                 END AS skip_reason
          FROM g)
        SELECT req_id,
               CASE WHEN skip_reason IS NULL THEN host0 END AS host,
               skip_reason
        FROM h
    """
