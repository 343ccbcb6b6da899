"""Job-sites admin route folds: per-site normalization and the bulk
clean/dedup pass.

Re-expresses the operator-curated job-board CRUD in
``app/api/job_research_routes.py``:

- ``job_site_normalize``   — job_research_routes.py:429-456
  (``create_job_site``: the URL is ``strip().lower()`` ONLY for
  ``perplexity_domain`` — RSS/careers URLs keep their case (pin);
  ``country_code`` folds ``(x or '').upper() or None`` so '' stores
  NULL and lowercase uppercases; an unknown site_type is a 400; an
  insert exception maps to 409 only when its message contains
  'duplicate' or 'unique' case-insensitively)
- ``job_sites_bulk_clean`` — job_research_routes.py:490-546
  (``create_job_sites_bulk``: per-URL strip (+lower only for
  perplexity), empties dropped, dedup by the LOWERCASED key while the
  STORED value keeps the first occurrence's original case (pin);
  insert outcomes classify duplicate-exception messages by the
  'duplicate'/'unique'/'23505' substrings → skipped, anything else →
  failed)

The bulk fold is a map-side projection + one first-per-key window on
(batch, lowercased url).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SITE_TYPES = ("perplexity_domain", "rss_feed_default",
              "careers_page_default")


def job_site_normalize(reqs: DataFrame) -> DataFrame:
    bad_type = ~F.col("site_type").isin(*SITE_TYPES)
    stripped = F.trim(F.col("url_or_domain"))
    url_out = (F.when(F.col("site_type") == "perplexity_domain",
                      F.lower(stripped)).otherwise(stripped))
    cc = F.upper(F.coalesce(F.col("country_code"), F.lit("")))
    cc_out = F.nullif(cc, F.lit(""))
    err_low = F.lower(F.coalesce(F.col("insert_error"), F.lit("")))
    dup = (err_low.contains("duplicate") | err_low.contains("unique"))
    status = (F.when(bad_type, 400)
              .when(F.col("insert_error").isNull(), 200)
              .when(dup, 409).otherwise(500))
    return reqs.select(
        "req_id",
        status.cast("int").alias("status"),
        F.when(bad_type, F.lit(None).cast("string")).otherwise(url_out)
        .alias("stored_url"),
        F.when(bad_type, F.lit(None).cast("string")).otherwise(cc_out)
        .alias("stored_country"))


def synth_site_creates(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        F.element_at(F.array(
            F.lit("perplexity_domain"), F.lit("rss_feed_default"),
            F.lit("careers_page_default"), F.lit("linkedin_search")),
            (e % 4 + 1).cast("int")).alias("site_type"),
        F.concat(F.lit("  Board"), (e % 9).cast("string"),
                 F.lit(".Example.GR/Feed ")).alias("url_or_domain"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit(""))
        .when(e % 5 == 2, F.lit("gr")).otherwise(F.lit("DE"))
        .alias("country_code"),
        F.when(e % 7 == 0, F.lit("ERROR: duplicate key value"))
        .when(e % 7 == 1, F.lit("violates UNIQUE constraint"))
        .when(e % 7 == 2, F.lit("connection reset"))
        .otherwise(F.lit(None).cast("string")).alias("insert_error"))


SYNTH_SITE_CREATES_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           (['perplexity_domain', 'rss_feed_default',
             'careers_page_default', 'linkedin_search'])
             [CAST(event_id % 4 AS INT) + 1] AS site_type,
           '  Board' || CAST(event_id % 9 AS VARCHAR)
               || '.Example.GR/Feed ' AS url_or_domain,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                WHEN event_id % 5 = 2 THEN 'gr'
                ELSE 'DE' END AS country_code,
           CASE WHEN event_id % 7 = 0 THEN 'ERROR: duplicate key value'
                WHEN event_id % 7 = 1 THEN 'violates UNIQUE constraint'
                WHEN event_id % 7 = 2 THEN 'connection reset'
           END AS insert_error
    FROM events
"""


def site_normalize_sql() -> str:
    types = ", ".join(f"'{t}'" for t in SITE_TYPES)
    return f"""
        WITH r AS ({SYNTH_SITE_CREATES_SQL}),
        g AS (
          SELECT *,
                 site_type NOT IN ({types}) AS bad_type,
                 CASE WHEN site_type = 'perplexity_domain'
                      THEN lower(trim(url_or_domain))
                      ELSE trim(url_or_domain) END AS url_out,
                 nullif(upper(coalesce(country_code, '')), '')
                     AS cc_out,
                 contains(lower(coalesce(insert_error, '')),
                          'duplicate')
                 OR contains(lower(coalesce(insert_error, '')),
                             'unique') AS dup
          FROM r)
        SELECT req_id,
               CAST(CASE WHEN bad_type THEN 400
                    WHEN insert_error IS NULL THEN 200
                    WHEN dup THEN 409 ELSE 500 END AS INT) AS status,
               CASE WHEN NOT bad_type THEN url_out END AS stored_url,
               CASE WHEN NOT bad_type THEN cc_out END
                   AS stored_country
        FROM g
    """


def job_sites_bulk_clean(urls: DataFrame) -> DataFrame:
    """Per input URL: kept flag, the stored value, and the insert
    outcome classification for kept rows."""
    stripped = F.trim(F.coalesce(F.col("raw_url"), F.lit("")))
    val = (F.when(F.col("site_type") == "perplexity_domain",
                  F.lower(stripped)).otherwise(stripped))
    nonempty = val != ""
    key = F.lower(val)
    w = (Window.partitionBy("batch_id", key).orderBy("uidx"))
    first = F.row_number().over(w) == 1
    kept = nonempty & first
    err_low = F.lower(F.coalesce(F.col("insert_error"), F.lit("")))
    dup = (err_low.contains("duplicate") | err_low.contains("unique")
           | err_low.contains("23505"))
    outcome = (F.when(~kept, F.lit(None).cast("string"))
               .when(F.col("insert_error").isNull(), F.lit("created"))
               .when(dup, F.lit("skipped"))
               .otherwise(F.lit("failed")))
    return urls.select(
        "batch_id", "uidx",
        kept.alias("kept"),
        F.when(kept, val).otherwise(F.lit(None).cast("string"))
        .alias("stored_value"),
        outcome.alias("outcome"))


def synth_bulk_urls(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = F.concat(F.lit("Board"), ((e * 7) % 6).cast("string"),
                    F.lit(".Example.GR"))
    return events.select(
        (e % 97).cast("long").alias("batch_id"),
        F.floor(e / 97).cast("int").alias("uidx"),
        F.when((e % 97) % 2 == 0, F.lit("perplexity_domain"))
        .otherwise(F.lit("rss_feed_default")).alias("site_type"),
        F.when(e % 9 == 0, F.lit("   "))
        .when(e % 9 == 1, F.lit(None).cast("string"))
        .when(e % 9 == 2, F.lower(base))
        .otherwise(F.concat(F.lit("  "), base, F.lit(" ")))
        .alias("raw_url"),
        F.when(e % 8 == 0, F.lit("duplicate key"))
        .when(e % 8 == 1, F.lit("SQLSTATE 23505"))
        .when(e % 8 == 2, F.lit("timeout talking to db"))
        .otherwise(F.lit(None).cast("string")).alias("insert_error"))


SYNTH_BULK_URLS_SQL = """
    SELECT CAST(event_id % 97 AS BIGINT) AS batch_id,
           CAST(event_id // 97 AS INT) AS uidx,
           CASE WHEN (event_id % 97) % 2 = 0 THEN 'perplexity_domain'
                ELSE 'rss_feed_default' END AS site_type,
           CASE WHEN event_id % 9 = 0 THEN '   '
                WHEN event_id % 9 = 1 THEN NULL
                WHEN event_id % 9 = 2
                THEN lower('Board' || CAST((event_id * 7) % 6
                     AS VARCHAR) || '.Example.GR')
                ELSE '  Board' || CAST((event_id * 7) % 6 AS VARCHAR)
                     || '.Example.GR '
           END AS raw_url,
           CASE WHEN event_id % 8 = 0 THEN 'duplicate key'
                WHEN event_id % 8 = 1 THEN 'SQLSTATE 23505'
                WHEN event_id % 8 = 2 THEN 'timeout talking to db'
           END AS insert_error
    FROM events
"""


def bulk_clean_sql() -> str:
    return f"""
        WITH u AS ({SYNTH_BULK_URLS_SQL}),
        g AS (
          SELECT *,
                 CASE WHEN site_type = 'perplexity_domain'
                      THEN lower(trim(coalesce(raw_url, '')))
                      ELSE trim(coalesce(raw_url, '')) END AS val
          FROM u),
        h AS (
          SELECT *,
                 val <> '' AS nonempty,
                 row_number() OVER (
                     PARTITION BY batch_id, lower(val)
                     ORDER BY uidx) = 1 AS first_occ
          FROM g),
        i AS (
          SELECT *,
                 nonempty AND first_occ AS kept,
                 contains(lower(coalesce(insert_error, '')),
                          'duplicate')
                 OR contains(lower(coalesce(insert_error, '')),
                             'unique')
                 OR contains(lower(coalesce(insert_error, '')),
                             '23505') AS dup
          FROM h)
        SELECT batch_id, uidx, kept,
               CASE WHEN kept THEN val END AS stored_value,
               CASE WHEN NOT kept THEN NULL
                    WHEN insert_error IS NULL THEN 'created'
                    WHEN dup THEN 'skipped'
                    ELSE 'failed' END AS outcome
        FROM i
    """
