"""Greek-marketplaces orchestrator fold: the country gate and the
(domain, source) dedup.

Re-expresses ``app/modules/greek_marketplaces/service.py:54-112``
(``search`` + ``_dedupe_by_domain``; the three adapters are covered
individually). Pinned behaviors:

- the country gate is ``(country_code or '').upper() != 'GR'`` — a
  lowercase 'gr' passes, None/'' do not;
- a raised adapter is skipped, the others still contribute (hits keep
  the adapter fan-out order skroutz → bestprice → shopflix);
- the dedup key is (lowercased www-stripped netloc, ``source or ''``)
  keeping the FIRST hit — so Skroutz rows beat scraper fallbacks for
  the same retailer on the same source, while the same merchant from
  two different sources survives twice (the source tie-breaker, pin);
- a hit whose URL yields NO netloc is dropped entirely (pin).

One keep-first window on (req, domain, source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NETLOC_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)"


def greek_dedupe_fold(hits: DataFrame) -> DataFrame:
    gr = (F.upper(F.coalesce(F.col("country_code"), F.lit("")))
          == "GR")
    netloc = F.lower(F.regexp_extract(F.col("product_url"),
                                      _NETLOC_RE, 1))
    domain = F.nullif(
        F.when(netloc.startswith("www."),
               F.substring(netloc, 5, 4000)).otherwise(netloc),
        F.lit(""))
    eligible = (gr & ~F.col("adapter_raised") & domain.isNotNull())
    src = F.coalesce(F.col("source"), F.lit(""))
    w = (Window.partitionBy("req_id", domain, src).orderBy("hidx"))
    first = F.row_number().over(w) == 1
    return (hits
            .withColumn("_domain", domain)
            .withColumn("_eligible", eligible)
            .where(F.col("_eligible"))
            .withColumn("_first", first)
            .where(F.col("_first"))
            .select("req_id", "hidx",
                    F.col("_domain").alias("domain"),
                    src.alias("source_out")))


def synth_greek_hits(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    req = (e % 131).cast("long")
    return events.select(
        req.alias("req_id"),
        e.cast("long").alias("hidx"),
        F.when(req % 5 == 0, F.lit(None).cast("string"))
        .when(req % 5 == 1, F.lit("gr"))
        .when(req % 5 == 2, F.lit("GR"))
        .when(req % 5 == 3, F.lit("DE"))
        .otherwise(F.lit("")).alias("country_code"),
        ((e * 11) % 13 == 0).alias("adapter_raised"),
        F.element_at(F.array(
            F.lit("skroutz"), F.lit("skroutz"), F.lit("bestprice"),
            F.lit("shopflix"), F.lit(None).cast("string")),
            ((e * 7) % 5 + 1).cast("int")).alias("source"),
        F.element_at(F.array(
            F.lit("https://WWW.Shop1.GR/p/1"),
            F.lit("https://shop1.gr/p/2"),
            F.lit("https://shop2.gr/x"),
            F.lit("notaurl"),
            F.lit("https://www.shop3.de/y"),
            F.lit("")), ((e * 3) % 6 + 1).cast("int"))
        .alias("product_url"))


SYNTH_GREEK_HITS_SQL = """
    SELECT CAST(event_id % 131 AS BIGINT) AS req_id,
           CAST(event_id AS BIGINT) AS hidx,
           CASE WHEN (event_id % 131) % 5 = 0 THEN NULL
                WHEN (event_id % 131) % 5 = 1 THEN 'gr'
                WHEN (event_id % 131) % 5 = 2 THEN 'GR'
                WHEN (event_id % 131) % 5 = 3 THEN 'DE'
                ELSE '' END AS country_code,
           (event_id * 11) % 13 = 0 AS adapter_raised,
           (['skroutz', 'skroutz', 'bestprice', 'shopflix', NULL])
             [CAST((event_id * 7) % 5 AS INT) + 1] AS source,
           (['https://WWW.Shop1.GR/p/1', 'https://shop1.gr/p/2',
             'https://shop2.gr/x', 'notaurl',
             'https://www.shop3.de/y', ''])
             [CAST((event_id * 3) % 6 AS INT) + 1] AS product_url
    FROM events
"""


def greek_dedupe_sql() -> str:
    return f"""
        WITH h AS ({SYNTH_GREEK_HITS_SQL}),
        g AS (
          SELECT *,
                 lower(regexp_extract(product_url,
                     '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1))
                     AS netloc
          FROM h),
        i AS (
          SELECT *,
                 nullif(CASE WHEN starts_with(netloc, 'www.')
                        THEN substring(netloc, 5) ELSE netloc END, '')
                     AS dom,
                 coalesce(source, '') AS src
          FROM g),
        j AS (
          SELECT * FROM i
          WHERE upper(coalesce(country_code, '')) = 'GR'
            AND NOT adapter_raised AND dom IS NOT NULL),
        k AS (
          SELECT *,
                 row_number() OVER (PARTITION BY req_id, dom, src
                                    ORDER BY hidx) AS rn
          FROM j)
        SELECT req_id, hidx, dom AS domain, src AS source_out
        FROM k WHERE rn = 1
    """
