"""Tracked-query results / exclusions / cron-due folds
(app/services/integrations/tracked_queries_service.py:39-47,969-1338).

The refresh routing itself is covered by ``operators/url_only_refresh``
and the price math by ``operators/prices``; this module folds the read
side around them:

* ``_domain_of`` (:39-47): http(s)-scheme host (case-insensitive
  match), lowercased, a single leading ``www.`` stripped; non-URL
  strings -> NULL.
* ``add_exclusion`` domain normalization (:1027-1031): strip + lower,
  then ``removeprefix('www.')`` BEFORE ``removeprefix('http://')`` /
  ``'https://'`` — a domain given WITH a scheme keeps its ``www.``
  (the prefix ladder runs in the wrong order — faithful-to-code pin)
  — then ``split('/')[0]``.
* ``latest_results`` (:969-1000): the newest refresh_run per tracked
  query (picked by ``scraped_at`` desc, canonicalized tiebreak
  (scraped_at, refresh_run_id) desc), that run's rows cheapest-first,
  then the exclusion soft-hide unless ``include_excluded``.
* ``_apply_exclusion_filter`` (:1243-1269): drop rows whose
  ``product_url`` is in the exclusion URL set EXACTLY (no
  normalization on the URL tier — pin) or whose ``_domain_of(url)``
  is in the exclusion domain set.
* ``latest_results_split`` (:1271-1289): family vs primary by
  ``(match_kind or '').lower() == 'family'`` — NULL folds to primary.
* ``due_for_refresh`` (:1313-1338): is_active AND ``api_key_id IS
  NULL`` (external per-call billing is never cron-refreshed — the
  money-leak guard pin) AND (next_check_at NULL OR < now), ordered
  next_check_at asc (Postgres default: NULLS LAST, canonicalized id
  tiebreak), limit clamped to ``max(1, min(limit, 500))``.

Scale: latest-run pick is one (query)-keyed max-struct agg joined
back; exclusion filtering is two broadcastable anti-joins; due_for is
a scan + one global top-k window (the cron batch is <=500 rows by
contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_HOST_RE = r"^[hH][tT][tT][pP][sS]?://([^/]+)"


def domain_of(url):
    h = F.lower(F.regexp_extract(F.trim(url), _HOST_RE, 1))
    h = F.when(h == "", F.lit(None).cast("string")).otherwise(h)
    return F.when(h.startswith("www."),
                  h.substr(F.lit(5), F.length(h))).otherwise(h)


def normalize_exclusion_domain(domain):
    d = F.lower(F.trim(domain))
    # the reference's removeprefix ladder: www. FIRST, then schemes —
    # so 'http://www.x.com' keeps its www (pin)
    d = F.when(d.startswith("www."),
               d.substr(F.lit(5), F.length(d))).otherwise(d)
    for pre in ("http://", "https://"):
        n = len(pre) + 1
        d = F.when(d.startswith(pre),
                   d.substr(F.lit(n), F.length(d))).otherwise(d)
    return F.split(d, "/").getItem(0)


def _filter_exclusions(rows: DataFrame,
                       exclusions: DataFrame) -> DataFrame:
    ex_urls = (exclusions
               .where(F.coalesce("url", F.lit("")) != "")
               .select(F.col("tracked_query_id").alias("_tq"),
                       F.col("url").alias("_xu")).distinct())
    ex_doms = (exclusions
               .where(F.coalesce("domain", F.lit("")) != "")
               .select(F.col("tracked_query_id").alias("_tq"),
                       F.col("domain").alias("_xd")).distinct())
    kept = rows.join(
        F.broadcast(ex_urls),
        (rows["tracked_query_id"] == F.col("_tq"))
        & (rows["product_url"] == F.col("_xu")), "left_anti")
    kept = kept.withColumn("_dom", domain_of(F.col("product_url")))
    return kept.join(
        F.broadcast(ex_doms),
        (kept["tracked_query_id"] == F.col("_tq"))
        & (F.col("_dom") == F.col("_xd")), "left_anti").drop("_dom")


def latest_results(history: DataFrame, exclusions: DataFrame, *,
                   include_excluded: bool = False) -> DataFrame:
    """Newest run's rows per tracked query, cheapest first."""
    pick = (history.groupBy("tracked_query_id")
            .agg(F.max(F.struct("scraped_at", "refresh_run_id"))
                 .alias("_w"))
            .select("tracked_query_id",
                    F.col("_w.refresh_run_id").alias("_run")))
    rows = (history.join(pick, "tracked_query_id")
            .where(F.col("refresh_run_id") == F.col("_run"))
            .drop("_run"))
    if not include_excluded:
        rows = _filter_exclusions(rows, exclusions)
    w = (Window.partitionBy("tracked_query_id")
         .orderBy(F.col("price").asc(), "row_id"))
    return (rows.withColumn("rank", F.row_number().over(w)
                            .cast("int"))
            .select("tracked_query_id", "row_id", "refresh_run_id",
                    "retailer_name", "product_url", "price",
                    "match_kind", "rank"))


def results_split(latest: DataFrame) -> DataFrame:
    """The latest_results rows tagged 'family' vs 'results'."""
    fam = (F.lower(F.coalesce("match_kind", F.lit(""))) == "family")
    return latest.withColumn(
        "section",
        F.when(fam, "family_results").otherwise("results"))


def exclusion_norm(reqs: DataFrame) -> DataFrame:
    """add_exclusion's domain normalization over a request batch."""
    return reqs.select(
        "req_id",
        normalize_exclusion_domain(F.col("domain"))
        .alias("domain_norm"))


def due_for_refresh(queries: DataFrame, *, now: int,
                    limit: int = 50) -> DataFrame:
    lim = max(1, min(limit, 500))
    f = queries.where(
        F.col("is_active")
        & F.col("api_key_id").isNull()
        & (F.col("next_check_at").isNull()
           | (F.col("next_check_at") < now)))
    w = Window.orderBy(F.col("next_check_at").asc_nulls_last(),
                       "query_id")
    return (f.withColumn("rk", F.row_number().over(w).cast("int"))
            .where(F.col("rk") <= lim)
            .select("query_id", "workspace_id", "next_check_at",
                    "rk"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

NOW = 1_800_000_000


def synth_price_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    url = (F.when(e % 9 == 0, F.lit(None).cast("string"))
           .when(e % 9 == 1, F.lit("not a url"))
           .when(e % 9 == 2,
                 F.concat(F.lit("HTTPS://WWW.Shop"),
                          (e % 12).cast("string"),
                          F.lit(".gr/p/"), e.cast("string")))
           .otherwise(F.concat(F.lit("https://shop"),
                               (e % 12).cast("string"),
                               F.lit(".gr/p/"), e.cast("string"))))
    return events.select(
        (e % 31).cast("long").alias("tracked_query_id"),
        e.cast("long").alias("row_id"),
        (e % 4).cast("long").alias("refresh_run_id"),
        (F.lit(NOW) - (e % 4) * 3600 - (e % 7)).cast("long")
        .alias("scraped_at"),
        F.concat(F.lit("Shop "), (e % 12).cast("string"))
        .alias("retailer_name"),
        url.alias("product_url"),
        F.round((e % 89) * 1.5 + 10, 2).alias("price"),
        F.when(e % 11 == 0, F.lit(None).cast("string"))
        .when(e % 11 == 1, "FAMILY").when(e % 11 == 2, "family")
        .when(e % 11 < 7, "exact").otherwise("variant")
        .alias("match_kind"))


SYNTH_PRICE_ROWS_SQL = f"""
    SELECT CAST(event_id % 31 AS BIGINT) AS tracked_query_id,
           CAST(event_id AS BIGINT) AS row_id,
           CAST(event_id % 4 AS BIGINT) AS refresh_run_id,
           CAST({NOW} - (event_id % 4) * 3600 - (event_id % 7)
                AS BIGINT) AS scraped_at,
           'Shop ' || CAST(event_id % 12 AS VARCHAR)
               AS retailer_name,
           CASE WHEN event_id % 9 = 0 THEN NULL
                WHEN event_id % 9 = 1 THEN 'not a url'
                WHEN event_id % 9 = 2
                THEN 'HTTPS://WWW.Shop' || CAST(event_id % 12
                     AS VARCHAR) || '.gr/p/'
                     || CAST(event_id AS VARCHAR)
                ELSE 'https://shop' || CAST(event_id % 12 AS VARCHAR)
                     || '.gr/p/' || CAST(event_id AS VARCHAR) END
               AS product_url,
           round((event_id % 89) * 1.5 + 10, 2) AS price,
           CASE WHEN event_id % 11 = 0 THEN NULL
                WHEN event_id % 11 = 1 THEN 'FAMILY'
                WHEN event_id % 11 = 2 THEN 'family'
                WHEN event_id % 11 < 7 THEN 'exact'
                ELSE 'variant' END AS match_kind
    FROM events
"""


def synth_exclusions(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 17 == 0)
            .select((e % 31).cast("long").alias("tracked_query_id"),
                    F.when(e % 2 == 0,
                           F.concat(F.lit("https://shop"),
                                    (e % 12).cast("string"),
                                    F.lit(".gr/p/"),
                                    (e + 17).cast("string")))
                    .otherwise(F.lit(None).cast("string"))
                    .alias("url"),
                    F.when(e % 2 == 1,
                           F.concat(F.lit("shop"),
                                    (F.floor(e / 17) % 12)
                                    .cast("string"),
                                    F.lit(".gr")))
                    .otherwise(F.lit(None).cast("string"))
                    .alias("domain")))


SYNTH_EXCLUSIONS_SQL = """
    SELECT CAST(event_id % 31 AS BIGINT) AS tracked_query_id,
           CASE WHEN event_id % 2 = 0
                THEN 'https://shop' || CAST(event_id % 12 AS VARCHAR)
                     || '.gr/p/' || CAST(event_id + 17 AS VARCHAR)
                ELSE NULL END AS url,
           CASE WHEN event_id % 2 = 1
                THEN 'shop' || CAST((event_id // 17) % 12 AS VARCHAR)
                     || '.gr'
                ELSE NULL END AS domain
    FROM events WHERE event_id % 17 = 0
"""

_DOMAIN_OF_SQL = """
    CASE WHEN lower(
               coalesce(regexp_extract(trim({u}),
                        '^[hH][tT][tT][pP][sS]?://([^/]+)', 1), ''))
              = '' THEN NULL
         WHEN lower(regexp_extract(trim({u}),
                    '^[hH][tT][tT][pP][sS]?://([^/]+)', 1))
              LIKE 'www.%'
         THEN substring(lower(regexp_extract(trim({u}),
                        '^[hH][tT][tT][pP][sS]?://([^/]+)', 1)), 5)
         ELSE lower(regexp_extract(trim({u}),
                    '^[hH][tT][tT][pP][sS]?://([^/]+)', 1)) END
"""


def _latest_core_sql(include_excluded: bool) -> str:
    dom = _DOMAIN_OF_SQL.format(u="r.product_url")
    excl = "" if include_excluded else f"""
          AND NOT EXISTS (
            SELECT 1 FROM ex
            WHERE ex.tracked_query_id = r.tracked_query_id
              AND coalesce(ex.url, '') <> ''
              AND ex.url = r.product_url)
          AND NOT EXISTS (
            SELECT 1 FROM ex
            WHERE ex.tracked_query_id = r.tracked_query_id
              AND coalesce(ex.domain, '') <> ''
              AND ex.domain = {dom})"""
    return f"""
        h AS ({SYNTH_PRICE_ROWS_SQL}),
        ex AS ({SYNTH_EXCLUSIONS_SQL}),
        run AS (
          SELECT tracked_query_id, refresh_run_id AS run_id
          FROM (SELECT tracked_query_id, refresh_run_id,
                       row_number() OVER (
                           PARTITION BY tracked_query_id
                           ORDER BY scraped_at DESC,
                                    refresh_run_id DESC) AS pk
                FROM h)
          WHERE pk = 1),
        rows_kept AS (
          SELECT r.* FROM h r
          JOIN run ON r.tracked_query_id = run.tracked_query_id
                  AND r.refresh_run_id = run.run_id
          WHERE TRUE {excl}),
        ranked AS (
          SELECT tracked_query_id, row_id, refresh_run_id,
                 retailer_name, product_url, price, match_kind,
                 CAST(row_number() OVER (
                      PARTITION BY tracked_query_id
                      ORDER BY price ASC, row_id) AS INT) AS rank
          FROM rows_kept)"""


def latest_results_sql(include_excluded: bool = False) -> str:
    return f"""
        WITH {_latest_core_sql(include_excluded)}
        SELECT * FROM ranked
    """


def results_split_sql() -> str:
    return f"""
        WITH {_latest_core_sql(False)}
        SELECT *,
               CASE WHEN lower(coalesce(match_kind, '')) = 'family'
                    THEN 'family_results' ELSE 'results' END
                   AS section
        FROM ranked
    """


def synth_tracked_queries(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("query_id"),
        (e % 5).cast("int").alias("workspace_id"),
        (e % 3 != 0).alias("is_active"),
        F.when(e % 4 == 0, e.cast("string"))
        .otherwise(F.lit(None).cast("string")).alias("api_key_id"),
        F.when(e % 6 == 0, F.lit(None).cast("long"))
        .otherwise((F.lit(NOW) + ((e % 13) - 6) * 3600).cast("long"))
        .alias("next_check_at"))


SYNTH_TRACKED_QUERIES_SQL = f"""
    SELECT CAST(event_id AS BIGINT) AS query_id,
           CAST(event_id % 5 AS INT) AS workspace_id,
           event_id % 3 <> 0 AS is_active,
           CASE WHEN event_id % 4 = 0
                THEN CAST(event_id AS VARCHAR) ELSE NULL END
               AS api_key_id,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE CAST({NOW} + ((event_id % 13) - 6) * 3600
                          AS BIGINT) END AS next_check_at
    FROM events
"""


def due_for_refresh_sql(*, limit: int = 50) -> str:
    lim = max(1, min(limit, 500))
    return f"""
        WITH q AS ({SYNTH_TRACKED_QUERIES_SQL}),
        f AS (
          SELECT * FROM q
          WHERE is_active AND api_key_id IS NULL
            AND (next_check_at IS NULL OR next_check_at < {NOW})),
        r AS (
          SELECT query_id, workspace_id, next_check_at,
                 CAST(row_number() OVER (
                      ORDER BY next_check_at ASC NULLS LAST,
                               query_id) AS INT) AS rk
          FROM f)
        SELECT * FROM r WHERE rk <= {lim}
    """


def synth_exclusion_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 23 == 0)
            .select(e.cast("long").alias("req_id"),
                    F.when(e % 4 == 0,
                           F.lit(" HTTP://WWW.Example.com/path "))
                    .when(e % 4 == 1,
                          F.lit("www.Site.gr/category/x"))
                    .when(e % 4 == 2, F.lit("https://www.keep.www.gr"))
                    .otherwise(F.concat(F.lit("Plain"),
                                        (e % 7).cast("string"),
                                        F.lit(".com/deep/path")))
                    .alias("domain")))


SYNTH_EXCLUSION_REQS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           CASE WHEN event_id % 4 = 0
                THEN ' HTTP://WWW.Example.com/path '
                WHEN event_id % 4 = 1 THEN 'www.Site.gr/category/x'
                WHEN event_id % 4 = 2 THEN 'https://www.keep.www.gr'
                ELSE 'Plain' || CAST(event_id % 7 AS VARCHAR)
                     || '.com/deep/path' END AS domain
    FROM events WHERE event_id % 23 = 0
"""


def exclusion_norm_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_EXCLUSION_REQS_SQL}),
        s AS (SELECT req_id, lower(trim(domain)) AS d FROM r),
        w AS (SELECT req_id,
                     CASE WHEN d LIKE 'www.%' THEN substring(d, 5)
                          ELSE d END AS d
              FROM s),
        h AS (SELECT req_id,
                     CASE WHEN d LIKE 'http://%'
                          THEN substring(d, 8)
                          WHEN d LIKE 'https://%'
                          THEN substring(d, 9)
                          ELSE d END AS d
              FROM w)
        SELECT req_id, string_split(d, '/')[1] AS domain_norm
        FROM h
    """
