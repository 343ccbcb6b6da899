"""Job-source self-curation (app/services/integrations/job_source_curator.py)
re-expressed as native Spark folds — the post-refresh loop that tracks which
board domains produced verified matches, auto-learns multi-employer boards,
and self-cleans stale auto-added rows.

Pinned semantics (reference lines):

- ``_host``/``_registrable`` (:57-78): bare-domain fast path (no ``://``,
  ``/`` or space), netloc parse otherwise, www/port strip, registrable
  collapse with the 11 two-part public suffixes
  (job-boards.greenhouse.io → greenhouse.io, foo.co.uk stays foo.co.uk);
- per-run rollup (:190-199): verified matches only, employer =
  lower(strip(company)) OR the domain itself when blank (pin), blank
  domains dropped;
- curated domains (registrable of every ENABLED job_research_sites row)
  get a yield bump of the run's match count (:201-205);
- non-curated domains fold into job_board_index (:113-137): employers =
  prior ∪ new (distinct count UNCAPPED drives promotion; the stored
  sample is sorted()[:25]), verified_matches += matches,
  refresh_runs += 1, status defaults 'candidate';
- promotion (:136-151): status == 'candidate' AND distinct employers >= 3
  AND (incremented) refresh_runs >= 2 — proof of a real multi-employer
  board; the _NEVER_PROMOTE social/content set short-circuits BEFORE the
  index update, so those domains never even get an index row (pin);
- stale auto-disable (:159-180): enabled AND auto_added AND
  coalesce(last_yield_at, created_at) < now-30d — operator-seeded rows
  are never auto-removed;
- audit summary (:216-229): per-domain {matches, employers} map, the
  "{N} board(s) yielded; promoted {P}; auto-disabled {D}" line.

Scale notes: one groupBy on (run, domain) carrying counts + employer sets
(bounded by match volume per run), a broadcast join against the curated
site list, and map-only scans elsewhere. DuckDB twins generated from the
same constants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .job_refresh import NOW_EPOCH

MIN_EMPLOYERS = 3
MIN_RUNS = 2
STALE_AUTO_ADDED_DAYS = 30
MAX_SAMPLE_EMPLOYERS = 25

NEVER_PROMOTE = (
    "reddit.com", "medium.com", "quora.com", "youtube.com", "substack.com",
    "twitter.com", "x.com", "facebook.com", "instagram.com", "wikipedia.org",
    "jooble.org", "google.com", "bing.com",
)

TWO_PART_TLDS = (
    "co.uk", "com.br", "co.jp", "com.au", "co.in", "com.mx", "co.za",
    "com.sg", "com.tr", "gr.com", "co.il",
)


def host_col(v: Column) -> Column:
    """_host (:57-66): bare-domain fast path, else netloc of the (scheme-
    prefixed) URL; www. and :port stripped."""
    s = F.lower(F.trim(F.coalesce(v, F.lit(""))))
    bare = (~s.contains("://")) & (~s.contains("/")) & (~s.contains(" "))
    with_scheme = F.when(s.contains("://"), s) \
        .otherwise(F.concat(F.lit("http://"), s))
    netloc = F.regexp_extract(with_scheme, r"^[^:/?#]+://([^/?#]*)", 1)
    host = F.when(bare, s).otherwise(netloc)
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":.*$", "")


def registrable_col(v: Column) -> Column:
    """_registrable (:69-78): collapse to the registrable domain with the
    two-part public-suffix table."""
    host = host_col(v)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.array_join(F.slice(parts, -2, 2), ".")
    last3 = F.array_join(F.slice(parts, -3, 3), ".")
    return (F.when(~host.contains("."), host)
            .when((n >= 3) & last2.isin(*TWO_PART_TLDS), last3)
            .otherwise(F.when(n >= 2, last2).otherwise(host)))


def host_sql(expr: str) -> str:
    s = f"lower(trim(coalesce({expr}, '')))"
    bare = (f"(NOT contains({s}, '://') AND NOT contains({s}, '/') "
            f"AND NOT contains({s}, ' '))")
    with_scheme = (f"CASE WHEN contains({s}, '://') THEN {s} "
                   f"ELSE 'http://' || {s} END")
    netloc = f"regexp_extract({with_scheme}, '^[^:/?#]+://([^/?#]*)', 1)"
    host = f"CASE WHEN {bare} THEN {s} ELSE {netloc} END"
    host = f"regexp_replace({host}, '^www\\.', '')"
    return f"regexp_replace({host}, ':.*$', '')"


def registrable_sql(expr: str) -> str:
    host = host_sql(expr)
    parts = f"string_split({host}, '.')"
    tlds = ", ".join(f"'{t}'" for t in TWO_PART_TLDS)
    last2 = f"array_to_string(list_slice({parts}, -2, -1), '.')"
    last3 = f"array_to_string(list_slice({parts}, -3, -1), '.')"
    return (f"CASE WHEN NOT contains({host}, '.') THEN {host} "
            f"WHEN len({parts}) >= 3 AND {last2} IN ({tlds}) THEN {last3} "
            f"WHEN len({parts}) >= 2 THEN {last2} ELSE {host} END")


def curation_review(matches: DataFrame, sites: DataFrame,
                    index: DataFrame) -> DataFrame:
    """Per-(run, domain) curation verdict fold.

    ``matches``: verified-match listing rows (run_id, company_domain,
    company). ``sites``: job_research_sites (url_or_domain, is_enabled).
    ``index``: prior job_board_index state (domain, verified_matches,
    refresh_runs, sample_employers array<string>, status).

    Output one row per yielded domain with the action the curator takes:
    'bump_yield' (curated), 'skip_never_promote', 'promote', or 'learn',
    plus the new index state for learned/promoted domains."""
    d = registrable_col(F.col("company_domain"))
    emp = F.lower(F.trim(F.coalesce(F.col("company"), F.lit(""))))
    rolled = (matches
              .select("run_id", d.alias("domain"),
                      F.when(emp != "", emp).alias("_emp"))
              .where(F.col("domain") != "")
              .withColumn("_emp", F.coalesce(F.col("_emp"),
                                             F.col("domain")))
              .groupBy("run_id", "domain")
              .agg(F.count(F.lit(1)).alias("matches"),
                   F.collect_set("_emp").alias("_emps")))
    curated = (sites.where(F.col("is_enabled"))
               .select(registrable_col(F.col("url_or_domain"))
                       .alias("domain"))
               .where(F.col("domain") != "").distinct()
               .withColumn("_curated", F.lit(True)))
    idx = index.select(
        F.col("domain"),
        F.col("verified_matches").alias("_pv"),
        F.col("refresh_runs").alias("_pr"),
        F.col("sample_employers").alias("_pe"),
        F.col("status").alias("_ps"))
    j = (rolled.join(F.broadcast(curated), "domain", "left")
         .join(F.broadcast(idx), "domain", "left"))
    merged = F.array_distinct(F.concat(
        F.coalesce(F.col("_pe"), F.array().cast("array<string>")),
        F.col("_emps")))
    n_merged = F.size(merged)
    new_runs = F.coalesce(F.col("_pr"), F.lit(0)) + 1
    new_verified = F.coalesce(F.col("_pv"), F.lit(0)) + F.col("matches")
    status = F.coalesce(F.col("_ps"), F.lit("candidate"))
    promoted = ((status == "candidate") & (n_merged >= MIN_EMPLOYERS)
                & (new_runs >= MIN_RUNS))
    is_curated = F.coalesce(F.col("_curated"), F.lit(False))
    is_never = F.col("domain").isin(*NEVER_PROMOTE)
    action = (F.when(is_curated, "bump_yield")
              .when(is_never, "skip_never_promote")
              .when(promoted, "promote")
              .otherwise("learn"))
    learned = ~is_curated & ~is_never
    sample = F.array_join(
        F.slice(F.array_sort(merged), 1, MAX_SAMPLE_EMPLOYERS), ",")
    return j.select(
        "run_id", "domain", "matches",
        F.size("_emps").alias("employers"),
        action.alias("action"),
        F.when(learned, new_verified).alias("verified_matches"),
        F.when(learned, new_runs).alias("refresh_runs"),
        F.when(learned, n_merged).alias("distinct_employers"),
        F.when(learned, sample).alias("sample_employers"),
        F.when(learned,
               F.when(promoted, F.lit("promoted")).otherwise(status))
        .alias("new_status"))


def stale_auto_disable(sites: DataFrame,
                       now_epoch: int = NOW_EPOCH) -> DataFrame:
    """_auto_disable_stale_auto_added (:159-180): enabled auto-added rows
    whose last yield (or creation) is older than 30 days. The reference
    compares ISO strings lexicographically — equivalent on this domain."""
    cutoff = F.from_unixtime(
        F.lit(now_epoch - STALE_AUTO_ADDED_DAYS * 86400))
    ref = F.coalesce(F.col("last_yield_at"), F.col("created_at"))
    return (sites.where(F.col("is_enabled") & F.col("auto_added"))
            .where(ref.isNotNull() & (ref < cutoff))
            .select("site_id", "url_or_domain"))


def curation_summary(review: DataFrame, disabled: DataFrame) -> DataFrame:
    """The per-run audit row (:216-229): domains yielded, promoted list
    (canonicalized sorted — the reference iterates dict order), disabled
    count, and the summary line."""
    per_run = review.groupBy("run_id").agg(
        F.count(F.lit(1)).alias("domains"),
        F.array_join(F.array_sort(F.collect_list(
            F.when(F.col("action") == "promote", F.col("domain")))), ",")
        .alias("promoted"),
        F.sum((F.col("action") == "promote").cast("int"))
        .alias("promoted_n"))
    n_dis = disabled.agg(F.count(F.lit(1)).alias("disabled_n"))
    out = per_run.crossJoin(F.broadcast(n_dis))
    summary = F.concat(
        F.col("domains").cast("string"), F.lit(" board(s) yielded; "),
        F.lit("promoted "), F.col("promoted_n").cast("string"),
        F.lit("; auto-disabled "), F.col("disabled_n").cast("string"))
    return out.select("run_id", "domains", "promoted", "promoted_n",
                      "disabled_n", summary.alias("summary"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_match_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    dom = (F.when(e % 9 == 0, F.lit("https://Job-Boards.Greenhouse.io/acme"))
           .when(e % 9 == 1, F.lit("ie.linkedin.com"))
           .when(e % 9 == 2, F.lit("jobs.foo.co.uk"))
           .when(e % 9 == 3, F.lit("reddit.com"))
           .when(e % 9 == 4, F.lit(""))
           .when(e % 9 == 5, F.lit("www.devjobs.gr:443"))
           .when(e % 9 == 6, F.lit("kariera.gr/jobs/123"))
           .when(e % 9 == 7, F.lit("https://remoteok.com/remote-jobs"))
           .otherwise(F.lit("startup.jobs")))
    co = (F.when(e % 5 == 0, F.lit("  Acme GmbH "))
          .when(e % 5 == 1, F.lit("Beta LLC"))
          .when(e % 5 == 2, F.lit(""))
          .when(e % 5 == 3, F.lit(None).cast("string"))
          .otherwise(F.concat(F.lit("Co"), (e % 11).cast("string"))))
    return events.select((e % 4).alias("run_id"),
                         dom.alias("company_domain"), co.alias("company"))


SYNTH_MATCH_ROWS_SQL = """
    SELECT event_id % 4 AS run_id,
           CASE WHEN event_id % 9 = 0
                THEN 'https://Job-Boards.Greenhouse.io/acme'
                WHEN event_id % 9 = 1 THEN 'ie.linkedin.com'
                WHEN event_id % 9 = 2 THEN 'jobs.foo.co.uk'
                WHEN event_id % 9 = 3 THEN 'reddit.com'
                WHEN event_id % 9 = 4 THEN ''
                WHEN event_id % 9 = 5 THEN 'www.devjobs.gr:443'
                WHEN event_id % 9 = 6 THEN 'kariera.gr/jobs/123'
                WHEN event_id % 9 = 7
                THEN 'https://remoteok.com/remote-jobs'
                ELSE 'startup.jobs' END AS company_domain,
           CASE WHEN event_id % 5 = 0 THEN '  Acme GmbH '
                WHEN event_id % 5 = 1 THEN 'Beta LLC'
                WHEN event_id % 5 = 2 THEN ''
                WHEN event_id % 5 = 3 THEN NULL
                ELSE 'Co' || CAST(event_id % 11 AS VARCHAR) END AS company
    FROM events
"""

SITE_ROWS = (
    # (site_id, url_or_domain, is_enabled, auto_added,
    #  last_yield_at, created_at)
    (1, "https://remoteok.com/remote-jobs", True, False, None,
     "2026-05-01 00:00:00"),
    (2, "linkedin.com", True, False, "2026-08-10 00:00:00",
     "2026-04-01 00:00:00"),
    (3, "stale.example", True, True, "2026-06-01 00:00:00",
     "2026-05-01 00:00:00"),
    (4, "fresh.example", True, True, "2026-08-15 00:00:00",
     "2026-05-01 00:00:00"),
    (5, "never-yielded.example", True, True, None, "2026-05-02 00:00:00"),
    (6, "operator-stale.example", True, False, "2026-01-01 00:00:00",
     "2026-01-01 00:00:00"),
    (7, "disabled.example", False, True, None, "2026-01-01 00:00:00"),
)


def synth_site_rows(spark) -> DataFrame:
    return spark.createDataFrame(
        list(SITE_ROWS),
        "site_id long, url_or_domain string, is_enabled boolean, "
        "auto_added boolean, last_yield_at string, created_at string")


SYNTH_SITE_ROWS_SQL = ("SELECT * FROM (VALUES " + ", ".join(
    "({}, '{}', {}, {}, {}, '{}')".format(
        sid, url, en, aa,
        "NULL" if ly is None else f"'{ly}'", ca)
    for sid, url, en, aa, ly, ca in SITE_ROWS)
    + ") AS s(site_id, url_or_domain, is_enabled, auto_added, "
      "last_yield_at, created_at)")

INDEX_ROWS = (
    # (domain, verified_matches, refresh_runs, sample_employers, status)
    ("startup.jobs", 4, 1, ["co1", "co2"], "candidate"),
    ("kariera.gr", 9, 5, ["co1", "co2", "co3"], "promoted"),
    ("foo.co.uk", 0, 0, [], "candidate"),
)


def synth_index_rows(spark) -> DataFrame:
    return spark.createDataFrame(
        list(INDEX_ROWS),
        "domain string, verified_matches long, refresh_runs long, "
        "sample_employers array<string>, status string")


SYNTH_INDEX_ROWS_SQL = ("SELECT * FROM (VALUES " + ", ".join(
    "('{}', {}, {}, [{}], '{}')".format(
        d, v, r, ", ".join(f"'{e}'" for e in emps), st)
    for d, v, r, emps, st in INDEX_ROWS)
    + ") AS i(domain, verified_matches, refresh_runs, "
      "sample_employers, status)")


def curation_review_sql() -> str:
    d = registrable_sql("company_domain")
    curated_d = registrable_sql("url_or_domain")
    never = ", ".join(f"'{x}'" for x in NEVER_PROMOTE)
    return f"""
        WITH m AS ({SYNTH_MATCH_ROWS_SQL}),
        sites AS ({SYNTH_SITE_ROWS_SQL}),
        idx AS ({SYNTH_INDEX_ROWS_SQL}),
        r0 AS (
          SELECT run_id, ({d}) AS domain,
                 CASE WHEN trim(coalesce(company, '')) <> ''
                      THEN lower(trim(company)) END AS emp0
          FROM m),
        r1 AS (SELECT run_id, domain,
                      coalesce(emp0, domain) AS emp
               FROM r0 WHERE domain <> ''),
        rolled AS (
          SELECT run_id, domain, count(*) AS matches,
                 list(DISTINCT emp) AS emps
          FROM r1 GROUP BY run_id, domain),
        curated AS (
          SELECT DISTINCT ({curated_d}) AS domain
          FROM sites WHERE is_enabled AND ({curated_d}) <> ''),
        j AS (
          SELECT rolled.*, (c.domain IS NOT NULL) AS is_curated,
                 i.verified_matches AS pv, i.refresh_runs AS pr,
                 i.sample_employers AS pe, i.status AS ps
          FROM rolled
          LEFT JOIN curated c ON c.domain = rolled.domain
          LEFT JOIN idx i ON i.domain = rolled.domain),
        k AS (
          SELECT j.*,
                 list_distinct(coalesce(pe, []) || emps) AS merged,
                 coalesce(pr, 0) + 1 AS new_runs,
                 coalesce(pv, 0) + matches AS new_verified,
                 coalesce(ps, 'candidate') AS status0,
                 j.domain IN ({never}) AS is_never
          FROM j),
        v AS (
          SELECT k.*,
                 (status0 = 'candidate'
                  AND len(merged) >= {MIN_EMPLOYERS}
                  AND new_runs >= {MIN_RUNS}) AS promoted,
                 (NOT is_curated AND NOT is_never) AS learned
          FROM k)
        SELECT run_id, domain, CAST(matches AS BIGINT) AS matches,
               CAST(len(emps) AS INT) AS employers,
               CASE WHEN is_curated THEN 'bump_yield'
                    WHEN is_never THEN 'skip_never_promote'
                    WHEN promoted THEN 'promote'
                    ELSE 'learn' END AS action,
               CASE WHEN learned THEN CAST(new_verified AS BIGINT) END
                   AS verified_matches,
               CASE WHEN learned THEN CAST(new_runs AS BIGINT) END
                   AS refresh_runs,
               CASE WHEN learned THEN CAST(len(merged) AS INT) END
                   AS distinct_employers,
               CASE WHEN learned THEN array_to_string(
                   list_slice(list_sort(merged), 1,
                              {MAX_SAMPLE_EMPLOYERS}), ',') END
                   AS sample_employers,
               CASE WHEN learned THEN
                   (CASE WHEN promoted THEN 'promoted' ELSE status0 END) END
                   AS new_status
        FROM v
    """


def curation_summary_sql() -> str:
    cutoff_epoch = NOW_EPOCH - STALE_AUTO_ADDED_DAYS * 86400
    return f"""
        WITH review AS ({curation_review_sql()}),
        sites AS ({SYNTH_SITE_ROWS_SQL}),
        dis AS (
          SELECT count(*) AS disabled_n FROM sites
          WHERE is_enabled AND auto_added
            AND coalesce(last_yield_at, created_at) IS NOT NULL
            AND coalesce(last_yield_at, created_at) <
                strftime(make_timestamp(CAST({cutoff_epoch} AS BIGINT)
                                        * 1000000),
                         '%Y-%m-%d %H:%M:%S'))
        SELECT run_id, CAST(count(*) AS BIGINT) AS domains,
               coalesce(array_to_string(list_sort(list(domain)
                   FILTER (WHERE action = 'promote')), ','), '')
                   AS promoted,
               CAST(count(*) FILTER (WHERE action = 'promote') AS BIGINT)
                   AS promoted_n,
               CAST((SELECT disabled_n FROM dis) AS BIGINT) AS disabled_n,
               CAST(count(*) AS VARCHAR) || ' board(s) yielded; promoted '
                   || CAST(count(*) FILTER (WHERE action = 'promote')
                           AS VARCHAR)
                   || '; auto-disabled '
                   || CAST((SELECT disabled_n FROM dis) AS VARCHAR)
                   AS summary
        FROM review GROUP BY run_id
    """
