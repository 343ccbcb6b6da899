"""Job-sites KB-sync folds: the consolidated-doc section renderer.

Re-expresses ``app/services/integrations/job_sites_kb_sync.py:40-78``
(``_render_section``'s per-row bullet assembly and ordering) as one
whole-corpus plan. Pinned behaviors:

- only the three SECTION site_types render — a row with any other
  ``site_type`` silently vanishes from the doc (``by_type.get`` on the
  fixed tuple, pin);
- enabled rows sort by ``(country_code or 'ZZ', url_or_domain or '')``
  — a NULL country sorts LAST via the 'ZZ' sentinel, not first;
- the URL is backquoted ONLY in the perplexity_domain section;
- extras join with ' · ' in evaluation order name → [country] →
  _category_, each behind a truthy gate ('' drops);
- disabled rows sort by url alone and render
  ``~~url~~ — display_name`` with a '(no name)' or-default.

One projection + two window ranks on (site_type, is_enabled) keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SECTION_TYPES = ("perplexity_domain", "rss_feed_default",
                 "careers_page_default")


def job_sites_render(sites: DataFrame) -> DataFrame:
    """One output row per rendered bullet: section index, enabled flag,
    position within its (section, enabled/disabled) block, and the
    rendered markdown line."""
    url = F.coalesce(F.col("url_or_domain"), F.lit(""))
    name = F.coalesce(F.col("display_name"), F.lit(""))
    country = F.col("country_code")
    cat = F.col("category")
    section_idx = (F.when(F.col("site_type") == SECTION_TYPES[0], 1)
                   .when(F.col("site_type") == SECTION_TYPES[1], 2)
                   .when(F.col("site_type") == SECTION_TYPES[2], 3))
    kept = sites.withColumn("section_idx", section_idx) \
        .where(F.col("section_idx").isNotNull())
    display = (F.when(F.col("site_type") == SECTION_TYPES[0],
                      F.concat(F.lit("`"), url, F.lit("`")))
               .otherwise(url))
    extras = F.concat_ws(
        " · ",
        F.when(name != "", name),
        F.when(country.isNotNull() & (country != ""),
               F.concat(F.lit("["), country, F.lit("]"))),
        F.when(cat.isNotNull() & (cat != ""),
               F.concat(F.lit("_"), cat, F.lit("_"))))
    enabled_line = F.concat(
        F.lit("- "), display,
        F.when(extras != "", F.concat(F.lit(" — "), extras))
        .otherwise(F.lit("")))
    disabled_line = F.concat(
        F.lit("- ~~"), url, F.lit("~~ — "),
        F.coalesce(F.nullif(name, F.lit("")), F.lit("(no name)")))
    enabled = F.coalesce(F.col("is_enabled"), F.lit(False))
    return kept.select(
        "site_id", "section_idx",
        enabled.alias("enabled"),
        F.when(enabled, F.row_number().over(
            Window.partitionBy("section_idx", "is_enabled")
            .orderBy(F.coalesce(country, F.lit("ZZ")), url, "site_id")))
        .otherwise(F.row_number().over(
            Window.partitionBy("section_idx", "is_enabled")
            .orderBy(url, "site_id"))).cast("int").alias("pos"),
        F.when(enabled, enabled_line).otherwise(disabled_line)
        .alias("line"))


def synth_job_sites(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("site_id"),
        F.when(e % 4 == 0, SECTION_TYPES[0])
        .when(e % 4 == 1, SECTION_TYPES[1])
        .when(e % 4 == 2, SECTION_TYPES[2])
        .otherwise(F.lit("linkedin_search")).alias("site_type"),
        F.when(e % 9 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("board"), (e % 23).cast("string"),
                            F.lit(".example.gr"))).alias("url_or_domain"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("Board "), (e % 7).cast("string")))
        .alias("display_name"),
        F.when(e % 6 == 0, F.lit(None).cast("string"))
        .when(e % 6 == 1, F.lit(""))
        .when(e % 6 == 2, F.lit("GR")).otherwise(F.lit("DE"))
        .alias("country_code"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .when(e % 7 == 1, F.lit(""))
        .otherwise(F.lit("aggregator")).alias("category"),
        (e % 3 != 0).alias("is_enabled"))


SYNTH_JOB_SITES_SQL = """
    SELECT CAST(event_id AS BIGINT) AS site_id,
           CASE WHEN event_id % 4 = 0 THEN 'perplexity_domain'
                WHEN event_id % 4 = 1 THEN 'rss_feed_default'
                WHEN event_id % 4 = 2 THEN 'careers_page_default'
                ELSE 'linkedin_search' END AS site_type,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE 'board' || CAST(event_id % 23 AS VARCHAR)
                     || '.example.gr' END AS url_or_domain,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'Board ' || CAST(event_id % 7 AS VARCHAR)
           END AS display_name,
           CASE WHEN event_id % 6 = 0 THEN NULL
                WHEN event_id % 6 = 1 THEN ''
                WHEN event_id % 6 = 2 THEN 'GR'
                ELSE 'DE' END AS country_code,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN ''
                ELSE 'aggregator' END AS category,
           event_id % 3 <> 0 AS is_enabled
    FROM events
"""


def job_sites_render_sql() -> str:
    return f"""
        WITH s AS ({SYNTH_JOB_SITES_SQL}),
        k AS (
          SELECT *,
                 CASE site_type
                      WHEN 'perplexity_domain' THEN 1
                      WHEN 'rss_feed_default' THEN 2
                      WHEN 'careers_page_default' THEN 3 END
                     AS section_idx,
                 coalesce(url_or_domain, '') AS url,
                 coalesce(display_name, '') AS name,
                 coalesce(is_enabled, FALSE) AS en
          FROM s
          WHERE site_type IN ('perplexity_domain', 'rss_feed_default',
                              'careers_page_default')),
        g AS (
          SELECT *,
                 CASE WHEN section_idx = 1
                      THEN '`' || url || '`' ELSE url END AS display,
                 concat_ws(' · ',
                   CASE WHEN name <> '' THEN name END,
                   CASE WHEN country_code IS NOT NULL
                             AND country_code <> ''
                        THEN '[' || country_code || ']' END,
                   CASE WHEN category IS NOT NULL AND category <> ''
                        THEN '_' || category || '_' END) AS extras
          FROM k)
        SELECT site_id, section_idx, en AS enabled,
               CAST(CASE WHEN en THEN
                 row_number() OVER (
                   PARTITION BY section_idx, is_enabled
                   ORDER BY coalesce(country_code, 'ZZ'), url, site_id)
               ELSE
                 row_number() OVER (
                   PARTITION BY section_idx, is_enabled
                   ORDER BY url, site_id)
               END AS INT) AS pos,
               CASE WHEN en THEN
                 '- ' || display
                 || CASE WHEN extras <> '' THEN ' — ' || extras
                    ELSE '' END
               ELSE
                 '- ~~' || url || '~~ — '
                 || coalesce(nullif(name, ''), '(no name)')
               END AS line
        FROM g
    """
