"""DataForSEO Google-Jobs response parse
(app/services/integrations/job_search_service.py:537-586,
``_parse_google_jobs_items`` + ``_to_int``).

The listing admission gates / dedup / canonical URL machinery are in
``operators/jobs`` (whose canonicalize/domain/content-hash Columns are
reused here); this folds the item-shape mapping itself — input arrives
as the flattened (task, result, item) rows of the tasks→result→items
walk:

* type gate: ``(item.type or '').lower()`` must be one of
  {google_jobs_item, google_jobs_serp, jobs_element};
* URL ladder: ``source_url`` or ``apply_link.link`` (taken only when
  apply_link is a DICT — a scalar apply_link contributes nothing,
  modeled as a nullable column) or ``url``; an empty final URL drops
  the item;
* company = ``employer_name or company_name`` (falsy ladder);
  contract = ``contract_type or schedule_type``;
* ``is_remote = ('remote' in (loc or '').lower()) or None`` — the
  expression can never be False: a non-remote location folds to NULL
  (pin), and the substring check is case-insensitive via lower();
* a non-dict ``salary`` blob folds to {} (all salary fields NULL);
  salary min/max go through ``_to_int`` = int(float(v)) with
  unparseable → NULL ('12.9' → 12, truncation — pin);
* description excerpt = first 600 chars, with an EMPTY result folding
  to NULL (``or None``); posted_at = ``timestamp or date_posted``;
* provenance: thumbnail = ``employer_image_url or thumbnail``,
  via = ``source_name or via``.

Scale: pure map-side projection — one when-chain per column over the
flattened items scan, no exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mivaa_pdf_extractor_spark.operators.jobs import (
    canonicalize_url_col, content_key_col, domain_of_col)

_TYPES = ("google_jobs_item", "google_jobs_serp", "jobs_element")


def _falsy_or(*cols):
    out = None
    for c in cols:
        branch = F.when(F.coalesce(c, F.lit("")) != "", c)
        out = branch if out is None else F.coalesce(out, branch)
    return out


def _to_int(col):
    # try_cast: the reference's except -> None on unparseable input
    # (ANSI cast would throw)
    return F.floor(col.try_cast("double")).cast("long")


def parse_google_jobs(items: DataFrame) -> DataFrame:
    """items: flattened rows (item_id, item_type, source_url,
    apply_link_link, url, title, employer_name, company_name,
    salary_is_dict, salary_min_raw, salary_max_raw, salary_currency,
    salary_period, contract_type, schedule_type, location,
    description, timestamp_str, date_posted, employer_image_url,
    thumbnail, source_name, via)."""
    typed = items.where(
        F.lower(F.coalesce("item_type", F.lit(""))).isin(*_TYPES))
    url = _falsy_or(F.col("source_url"), F.col("apply_link_link"),
                    F.col("url"))
    kept = typed.where(F.coalesce(url, F.lit("")) != "") \
        .withColumn("_url", url)
    canonical = canonicalize_url_col(F.col("_url"))
    loc_lower = F.lower(F.coalesce("location", F.lit("")))
    sal_ok = F.col("salary_is_dict")
    excerpt = F.substring(F.coalesce("description", F.lit("")),
                          1, 600)
    return kept.select(
        "item_id",
        F.col("_url").alias("url"),
        canonical.alias("canonical_url"),
        content_key_col(canonical, F.col("title"),
                        _falsy_or(F.col("employer_name"),
                                  F.col("company_name")))
        .alias("content_hash"),
        "title",
        _falsy_or(F.col("employer_name"), F.col("company_name"))
        .alias("company"),
        domain_of_col(F.col("_url")).alias("company_domain"),
        "location",
        # True or NULL, never False (or-None pin); string-rendered —
        # NULL booleans hash engine-specific
        F.when(loc_lower.contains("remote"), F.lit("true"))
        .otherwise(F.lit(None).cast("string")).alias("is_remote"),
        F.when(sal_ok, _to_int(F.col("salary_min_raw")))
        .alias("salary_min"),
        F.when(sal_ok, _to_int(F.col("salary_max_raw")))
        .alias("salary_max"),
        F.when(sal_ok, F.col("salary_currency"))
        .alias("salary_currency"),
        F.when(sal_ok, F.col("salary_period")).alias("salary_period"),
        _falsy_or(F.col("contract_type"), F.col("schedule_type"))
        .alias("employment_type"),
        F.when(excerpt != "", excerpt).alias("description_excerpt"),
        _falsy_or(F.col("timestamp_str"), F.col("date_posted"))
        .alias("posted_at"),
        F.lit("google_jobs").alias("source"),
        _falsy_or(F.col("employer_image_url"), F.col("thumbnail"))
        .alias("raw_thumbnail"),
        _falsy_or(F.col("source_name"), F.col("via"))
        .alias("raw_via"))


# ---------------------------------------------------------------------------
# synthesizer + DuckDB twin
# ---------------------------------------------------------------------------


def synth_google_items(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("item_id"),
        F.when(e % 5 == 0, "google_jobs_item")
        .when(e % 5 == 1, "Google_Jobs_SERP")
        .when(e % 5 == 2, "jobs_element")
        .when(e % 5 == 3, F.lit(None).cast("string"))
        .otherwise("organic").alias("item_type"),
        F.when(e % 4 == 0,
               F.concat(F.lit("https://WWW.Jobs"),
                        (e % 9).cast("string"),
                        F.lit(".gr/j/"), e.cast("string"),
                        F.lit("/?utm_source=x&id="),
                        (e % 50).cast("string")))
        .otherwise(F.lit("")).alias("source_url"),
        F.when(e % 4 == 1,
               F.concat(F.lit("https://apply.example.com/"),
                        e.cast("string")))
        .otherwise(F.lit(None).cast("string"))
        .alias("apply_link_link"),
        F.when(e % 4 != 3,
               F.concat(F.lit("https://fallback.gr/"),
                        e.cast("string")))
        .otherwise(F.lit("")).alias("url"),
        F.concat(F.lit("Title "), (e % 23).cast("string"))
        .alias("title"),
        F.when(e % 6 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("Employer "),
                            (e % 7).cast("string")))
        .alias("employer_name"),
        F.concat(F.lit("Company "), (e % 11).cast("string"))
        .alias("company_name"),
        (e % 3 != 0).alias("salary_is_dict"),
        F.when(e % 8 == 0, F.lit(None).cast("string"))
        .when(e % 8 == 1, F.lit("not a number"))
        .when(e % 8 == 2, F.lit("1200.9"))
        .otherwise((800 + e % 400).cast("string"))
        .alias("salary_min_raw"),
        F.when(e % 9 == 0, F.lit(None).cast("string"))
        .otherwise((1500 + e % 900).cast("string"))
        .alias("salary_max_raw"),
        F.when(e % 2 == 0, "EUR").otherwise("USD")
        .alias("salary_currency"),
        F.when(e % 2 == 0, "monthly").otherwise("yearly")
        .alias("salary_period"),
        F.when(e % 7 == 0, F.lit(""))
        .otherwise(F.lit("full_time")).alias("contract_type"),
        F.lit("part_time").alias("schedule_type"),
        F.when(e % 10 == 0, F.lit(None).cast("string"))
        .when(e % 10 == 1, F.lit("Athens (Remote)"))
        .when(e % 10 == 2, F.lit("REMOTE - EU"))
        .otherwise(F.concat(F.lit("City "), (e % 13).cast("string")))
        .alias("location"),
        F.when(e % 12 == 0, F.lit(""))
        .otherwise(F.repeat(F.concat(F.lit("desc"),
                                     (e % 5).cast("string")),
                            (e % 30 * 7 + 1).cast("int")))
        .alias("description"),
        F.when(e % 5 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("2026-0"),
                            (e % 9 + 1).cast("string")))
        .alias("timestamp_str"),
        F.lit("2025-12-01").alias("date_posted"),
        F.when(e % 6 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("https://img/"),
                            (e % 17).cast("string")))
        .alias("employer_image_url"),
        F.lit("https://thumb/default").alias("thumbnail"),
        F.when(e % 4 == 0, F.lit(""))
        .otherwise(F.lit("LinkedIn")).alias("source_name"),
        F.lit("via-fallback").alias("via"))


SYNTH_GOOGLE_ITEMS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS item_id,
           CASE event_id % 5 WHEN 0 THEN 'google_jobs_item'
                WHEN 1 THEN 'Google_Jobs_SERP'
                WHEN 2 THEN 'jobs_element'
                WHEN 3 THEN NULL ELSE 'organic' END AS item_type,
           CASE WHEN event_id % 4 = 0
                THEN 'https://WWW.Jobs' || CAST(event_id % 9
                     AS VARCHAR) || '.gr/j/'
                     || CAST(event_id AS VARCHAR)
                     || '/?utm_source=x&id='
                     || CAST(event_id % 50 AS VARCHAR)
                ELSE '' END AS source_url,
           CASE WHEN event_id % 4 = 1
                THEN 'https://apply.example.com/'
                     || CAST(event_id AS VARCHAR)
                ELSE NULL END AS apply_link_link,
           CASE WHEN event_id % 4 <> 3
                THEN 'https://fallback.gr/'
                     || CAST(event_id AS VARCHAR)
                ELSE '' END AS url,
           'Title ' || CAST(event_id % 23 AS VARCHAR) AS title,
           CASE WHEN event_id % 6 = 0 THEN ''
                ELSE 'Employer ' || CAST(event_id % 7 AS VARCHAR) END
               AS employer_name,
           'Company ' || CAST(event_id % 11 AS VARCHAR)
               AS company_name,
           event_id % 3 <> 0 AS salary_is_dict,
           CASE WHEN event_id % 8 = 0 THEN NULL
                WHEN event_id % 8 = 1 THEN 'not a number'
                WHEN event_id % 8 = 2 THEN '1200.9'
                ELSE CAST(800 + event_id % 400 AS VARCHAR) END
               AS salary_min_raw,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE CAST(1500 + event_id % 900 AS VARCHAR) END
               AS salary_max_raw,
           CASE WHEN event_id % 2 = 0 THEN 'EUR' ELSE 'USD' END
               AS salary_currency,
           CASE WHEN event_id % 2 = 0 THEN 'monthly'
                ELSE 'yearly' END AS salary_period,
           CASE WHEN event_id % 7 = 0 THEN ''
                ELSE 'full_time' END AS contract_type,
           'part_time' AS schedule_type,
           CASE WHEN event_id % 10 = 0 THEN NULL
                WHEN event_id % 10 = 1 THEN 'Athens (Remote)'
                WHEN event_id % 10 = 2 THEN 'REMOTE - EU'
                ELSE 'City ' || CAST(event_id % 13 AS VARCHAR) END
               AS location,
           CASE WHEN event_id % 12 = 0 THEN ''
                ELSE repeat('desc' || CAST(event_id % 5 AS VARCHAR),
                            CAST(event_id % 30 * 7 + 1 AS INT)) END
               AS description,
           CASE WHEN event_id % 5 = 0 THEN ''
                ELSE '2026-0' || CAST(event_id % 9 + 1 AS VARCHAR)
                END AS timestamp_str,
           '2025-12-01' AS date_posted,
           CASE WHEN event_id % 6 = 0 THEN ''
                ELSE 'https://img/' || CAST(event_id % 17 AS VARCHAR)
                END AS employer_image_url,
           'https://thumb/default' AS thumbnail,
           CASE WHEN event_id % 4 = 0 THEN ''
                ELSE 'LinkedIn' END AS source_name,
           'via-fallback' AS via
    FROM events
"""


def _duck_netloc(u: str) -> str:
    # expression-lockstep with operators/jobs.gate_sql_exprs
    return ("regexp_replace(lower(regexp_extract(" + u + ", "
            "'^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)), "
            "'^www\\.', '')")


def _duck_canonicalize(u: str) -> str:
    from mivaa_pdf_extractor_spark.operators.jobs import (
        TRACKING_PARAMS)
    scheme = ("lower(regexp_extract(" + u + ", "
              "'^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))")
    path_raw = ("regexp_extract(" + u + ", "
                "'^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1)")
    query = "regexp_extract(trim(" + u + "), '\\?([^#]*)', 1)"
    tracked = ", ".join(f"'{t}'" for t in TRACKING_PARAMS)
    kept = (f"array_to_string(list_filter(string_split({query}, "
            f"'&'), p -> contains(p, '=') AND NOT p LIKE '%=' "
            f"AND NOT list_contains([{tracked}], "
            f"split_part(p, '=', 1))), '&')")
    return (f"{scheme} || '://' || {_duck_netloc(u)} "
            f"|| regexp_replace({path_raw}, '/+$', '') "
            f"|| CASE WHEN {kept} <> '' THEN '?' || {kept} "
            f"ELSE '' END")


def _duck_content_key(canon: str, title: str, company: str) -> str:
    return (f"md5(coalesce({canon}, '') || '|' "
            f"|| substring(lower(coalesce({title}, '')), 1, 200) "
            f"|| '|' "
            f"|| substring(lower(coalesce({company}, '')), 1, 80))")


def parse_sql() -> str:
    url = ("CASE WHEN coalesce(source_url, '') <> '' THEN source_url"
           " WHEN coalesce(apply_link_link, '') <> ''"
           " THEN apply_link_link"
           " WHEN coalesce(url, '') <> '' THEN url END")
    company = ("CASE WHEN coalesce(employer_name, '') <> ''"
               " THEN employer_name"
               " WHEN coalesce(company_name, '') <> ''"
               " THEN company_name END")
    canon = _duck_canonicalize("_url")
    return f"""
        WITH i AS ({SYNTH_GOOGLE_ITEMS_SQL}),
        t AS (SELECT * FROM i
              WHERE lower(coalesce(item_type, '')) IN
                    ('google_jobs_item', 'google_jobs_serp',
                     'jobs_element')),
        u AS (SELECT *, {url} AS _url FROM t
              WHERE coalesce({url}, '') <> ''),
        c AS (SELECT *, {canon} AS _canon FROM u)
        SELECT item_id, _url AS url, _canon AS canonical_url,
               {_duck_content_key("_canon", "title", company)}
                   AS content_hash,
               title, {company} AS company,
               {_duck_netloc("_url")} AS company_domain,
               location,
               CASE WHEN strpos(lower(coalesce(location, '')),
                                'remote') > 0 THEN 'true' END
                   AS is_remote,
               CASE WHEN salary_is_dict
                    THEN CAST(floor(TRY_CAST(salary_min_raw
                                             AS DOUBLE)) AS BIGINT)
                    END AS salary_min,
               CASE WHEN salary_is_dict
                    THEN CAST(floor(TRY_CAST(salary_max_raw
                                             AS DOUBLE)) AS BIGINT)
                    END AS salary_max,
               CASE WHEN salary_is_dict THEN salary_currency END
                   AS salary_currency,
               CASE WHEN salary_is_dict THEN salary_period END
                   AS salary_period,
               CASE WHEN coalesce(contract_type, '') <> ''
                    THEN contract_type
                    WHEN coalesce(schedule_type, '') <> ''
                    THEN schedule_type END AS employment_type,
               CASE WHEN substring(coalesce(description, ''), 1, 600)
                         <> ''
                    THEN substring(coalesce(description, ''), 1, 600)
                    END AS description_excerpt,
               CASE WHEN coalesce(timestamp_str, '') <> ''
                    THEN timestamp_str
                    WHEN coalesce(date_posted, '') <> ''
                    THEN date_posted END AS posted_at,
               'google_jobs' AS source,
               CASE WHEN coalesce(employer_image_url, '') <> ''
                    THEN employer_image_url
                    WHEN coalesce(thumbnail, '') <> ''
                    THEN thumbnail END AS raw_thumbnail,
               CASE WHEN coalesce(source_name, '') <> ''
                    THEN source_name
                    WHEN coalesce(via, '') <> '' THEN via END
                   AS raw_via
        FROM c
    """
