"""Tracked-query refresh mode routing + the url-only (Custom
Monitoring) hit shaping.

Re-expresses ``app/services/integrations/tracked_queries_service.py:
533-779`` (``refresh``'s cost-boundary branch and
``_refresh_url_only``) — the issue-#234 fix the reference pins with an
AST guard (tests/unit/test_url_only_is_firecrawl_only.py); here the
ROUTING is the data fold:

- ladder: not_found → inactive → throttle (only when NOT forced and a
  ``last_refreshed_at`` exists; interval ``int(x or 24)`` — an
  explicit 0 falls to 24, pin) → ``(mode or '') == 'url-only'`` →
  the Firecrawl-only path → else full discovery;
- url-only with a BLANK pinned_url errors at 0 credits;
- the pinned hit: retailer = ``_domain_of(url)`` (http(s) host,
  lowercased, 'www.' stripped) or the literal 'pinned URL' fallback;
  ``match_kind='exact'``, ``verified=False``, ``source='firecrawl'``;
- a scrape that yields NO price still persists the hit with a
  ``' | '``-joined note — ``filter(None, ...)`` drops the empty prior
  note so there is no leading separator (pin).

Map-side when-chain + one regexp host extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[hH][tT][tT][pP][sS]?://([^/]+)"


def _domain_of(url):
    host = F.lower(F.regexp_extract(F.trim(url), _HOST_RE, 1))
    host = F.when(host.startswith("www."),
                  F.substring(host, 5, 4000)).otherwise(host)
    return F.nullif(host, F.lit(""))


def tracked_refresh_route(rows: DataFrame) -> DataFrame:
    not_found = ~F.col("tq_found")
    inactive = F.col("tq_found") & ~F.col("is_active")
    interval = F.when(F.col("interval_hours").isNotNull()
                      & (F.col("interval_hours") != 0),
                      F.col("interval_hours")).otherwise(F.lit(24))
    throttled = (F.col("tq_found") & F.col("is_active")
                 & ~F.col("force") & F.col("has_last_refreshed")
                 & (F.col("hours_since") < interval))
    url_only = (F.coalesce(F.col("mode"), F.lit("")) == "url-only")
    pinned = F.trim(F.coalesce(F.col("pinned_url"), F.lit("")))
    no_pin = pinned == ""
    routed = ~not_found & ~inactive & ~throttled
    route = (F.when(not_found, "not_found")
             .when(inactive, "inactive")
             .when(throttled, "throttled")
             .when(url_only & no_pin, "error_no_pinned_url")
             .when(url_only & F.col("scrape_raised"), "error_scrape")
             .when(url_only, "url_only")
             .otherwise("discovery"))
    domain = _domain_of(F.col("pinned_url"))
    is_hit = routed & url_only & ~no_pin & ~F.col("scrape_raised")
    note = (F.when(F.col("price_found"),
                   F.lit(None).cast("string"))
            .otherwise(F.lit("pinned URL returned no readable price")))
    return rows.select(
        "row_id",
        route.alias("route"),
        F.when(is_hit,
               F.coalesce(domain, F.lit("pinned URL")))
        .otherwise(F.lit(None).cast("string")).alias("retailer_name"),
        F.when(is_hit, F.lit("exact"))
        .otherwise(F.lit(None).cast("string")).alias("match_kind"),
        F.when(is_hit, note)
        .otherwise(F.lit(None).cast("string")).alias("price_note"),
        F.when(routed & url_only & (no_pin | F.col("scrape_raised")),
               F.lit(0)).otherwise(F.lit(None)).cast("int")
        .alias("credits_used"))


def synth_refresh_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("row_id"),
        (e % 17 != 0).alias("tq_found"),
        (e % 7 != 0).alias("is_active"),
        (e % 3 == 0).alias("force"),
        (e % 4 != 0).alias("has_last_refreshed"),
        ((e % 50).cast("double")).alias("hours_since"),
        F.when(e % 5 == 0, F.lit(None).cast("int"))
        .when(e % 5 == 1, F.lit(0))
        .otherwise((e % 30).cast("int")).alias("interval_hours"),
        F.when(e % 6 == 0, F.lit("url-only"))
        .when(e % 6 == 1, F.lit(None).cast("string"))
        .when(e % 6 == 2, F.lit(""))
        .otherwise(F.lit("search")).alias("mode"),
        F.element_at(F.array(
            F.lit(None).cast("string"), F.lit("   "),
            F.lit("https://WWW.Shop5.GR/p/1"),
            F.lit("http://retailer.de/item/2 "),
            F.lit("notaurl.example"),
            F.lit("https://plain.gr/x")),
            (e % 6 + 1).cast("int")).alias("pinned_url"),
        (e % 11 == 0).alias("scrape_raised"),
        (e % 2 == 0).alias("price_found"))


SYNTH_REFRESH_ROWS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS row_id,
           event_id % 17 <> 0 AS tq_found,
           event_id % 7 <> 0 AS is_active,
           event_id % 3 = 0 AS force,
           event_id % 4 <> 0 AS has_last_refreshed,
           CAST(event_id % 50 AS DOUBLE) AS hours_since,
           CAST(CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN 0
                ELSE event_id % 30 END AS INT) AS interval_hours,
           CASE WHEN event_id % 6 = 0 THEN 'url-only'
                WHEN event_id % 6 = 1 THEN NULL
                WHEN event_id % 6 = 2 THEN ''
                ELSE 'search' END AS mode,
           ([NULL, '   ', 'https://WWW.Shop5.GR/p/1',
             'http://retailer.de/item/2 ', 'notaurl.example',
             'https://plain.gr/x'])[CAST(event_id % 6 AS INT) + 1]
               AS pinned_url,
           event_id % 11 = 0 AS scrape_raised,
           event_id % 2 = 0 AS price_found
    FROM events
"""


def refresh_route_sql() -> str:
    host = ("lower(regexp_extract(trim(pinned_url), "
            "'^[hH][tT][tT][pP][sS]?://([^/]+)', 1))")
    return f"""
        WITH r AS ({SYNTH_REFRESH_ROWS_SQL}),
        g AS (
          SELECT *,
                 NOT tq_found AS not_found,
                 tq_found AND NOT is_active AS inactive,
                 CASE WHEN interval_hours IS NOT NULL
                           AND interval_hours <> 0
                      THEN interval_hours ELSE 24 END AS interval_eff,
                 coalesce(mode, '') = 'url-only' AS url_only,
                 trim(coalesce(pinned_url, '')) = '' AS no_pin,
                 {host} AS host0
          FROM r),
        h AS (
          SELECT *,
                 tq_found AND is_active AND NOT force
                   AND has_last_refreshed
                   AND hours_since < interval_eff AS throttled,
                 nullif(CASE WHEN starts_with(host0, 'www.')
                        THEN substring(host0, 5) ELSE host0 END, '')
                     AS dom
          FROM g),
        i AS (
          SELECT *,
                 NOT not_found AND NOT inactive AND NOT throttled
                     AS routed
          FROM h)
        SELECT row_id,
               CASE WHEN not_found THEN 'not_found'
                    WHEN inactive THEN 'inactive'
                    WHEN throttled THEN 'throttled'
                    WHEN url_only AND no_pin
                    THEN 'error_no_pinned_url'
                    WHEN url_only AND scrape_raised
                    THEN 'error_scrape'
                    WHEN url_only THEN 'url_only'
                    ELSE 'discovery' END AS route,
               CASE WHEN routed AND url_only AND NOT no_pin
                         AND NOT scrape_raised
                    THEN coalesce(dom, 'pinned URL') END
                   AS retailer_name,
               CASE WHEN routed AND url_only AND NOT no_pin
                         AND NOT scrape_raised
                    THEN 'exact' END AS match_kind,
               CASE WHEN routed AND url_only AND NOT no_pin
                         AND NOT scrape_raised AND NOT price_found
                    THEN 'pinned URL returned no readable price'
               END AS price_note,
               CAST(CASE WHEN routed AND url_only
                              AND (no_pin OR scrape_raised)
                    THEN 0 END AS INT) AS credits_used
        FROM i
    """
