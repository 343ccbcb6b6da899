"""Job-listing curation gates — the reference's LLM-output filtering
battery (app/services/integrations/job_search_service.py) as map-only
Column plans:

- ``canonicalize_url_col`` — ``canonicalize_url`` (:149-168): scheme
  lowered (https default moot — the ladder only admits http/https),
  netloc lowered + ``www.`` strip, trailing-slash strip on the path,
  tracking params dropped (the verbatim 11-key set, :143-147).
- ``domain_of_col``        — ``domain_of`` (:171-176).
- ``is_serp_url_col``      — ``_is_aggregator_serp_url`` (:214-226):
  the 14 SERP/aggregator URL patterns (:180-205) as one OR chain.
- ``is_category_url_col``  — ``_is_category_page_url`` (:228-271):
  positive job-ID signals first, explicit category indicators, then
  the short-topic-slug last-segment heuristic.
- ``is_category_title_col``— ``_looks_like_category_title``
  (:339-381): the 7-tier title-shape ladder (tier 6 is deliberately
  case-sensitive in the reference — faithfully kept).
- ``is_placeholder_company_col`` / ``is_missing_company_col`` —
  (:286-308): fabricated employers drop the listing; Unknown/
  Undisclosed/Confidential blanks the field and KEEPS it.
- ``is_hallucinated_url_col`` — ``_looks_hallucinated_url``
  (:310-336): 6+-digit runs that are sequential (asc/desc mod 10),
  palindromic, or single-digit; Indeed ``jk=`` values that are not
  exactly 16 hex chars.
- ``gate_listings``        — the perplexity post-filter ladder in its
  exact order (:1404-1433): no_url → category/SERP URL → category
  title → hallucinated URL → aggregator-as-company → placeholder
  company → keep (with missing-company blanking applied on keep).
- ``content_key_col``      — ``content_hash`` (:384-398): canonical
  URL | lower(title)[:200] | lower(company)[:80]. DEVIATION: md5
  instead of sha1 (DuckDB has no sha1); the key composition and
  truncations are identical, and the hash is an opaque dedup key.
- ``dedupe_hits``          — ``dedupe_hits`` (:1808-1818): per
  content key keep the highest source priority (ats_board 5 >
  firecrawl_careers 4 > rss_feed 3 > perplexity_sonar 2 >
  google_jobs 1 > unknown 0); the reference's replace-only-if-
  strictly-greater keeps the earliest arrival on ties, determinized
  here as lowest hit_id.
- ``query_variations``     — ``build_query_variations`` (:960-983):
  the 5 search-phrase templates with the location/remote rules.

DEVIATION (documented): URL parsing is regex-based, not a full
urlparse — no percent-decode/re-encode round-trip of query params
(``parse_qsl``/``urlencode``) and pairs without '=' or with empty
values are dropped exactly as ``parse_qsl`` does. For the http(s)
URLs the ladder admits, the results agree.

Scale: every gate is a pure regexp/when projection inside the scan's
codegen stage — no joins, no shuffles, no UDFs (the reference runs
them per REST page). Dedup is one window shuffle on the content key;
variations are a posexplode. At 10^9 listings the only data movement
is the dedup shuffle carrying (key, id, source) triples.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# _TRACKING_PARAMS (job_search_service.py:143-147)
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "ref", "src", "trk", "trackingId",
)

# _SERP_URL_PATTERNS (:180-205) — pinned behavior-table data; RE2/Java
# compatible (no backrefs), applied with search semantics on the URL.
SERP_URL_PATTERNS = (
    r"indeed\.[a-z.]+/(q-|jobs\?|cmp/|companies/)",
    r"glassdoor\.[a-z.]+/Job/",
    r"glassdoor\.[a-z.]+/Search/",
    r"linkedin\.com/jobs/search",
    r"linkedin\.com/jobs/?$",
    r"weworkremotely\.com/categories/",
    r"weworkremotely\.com/remote-jobs/?$",
    r"ziprecruiter\.com/Jobs/[^/]+/-in-",
    r"ziprecruiter\.com/c/[^/]+/Jobs",
    r"dice\.com/(jobs/q-|jobs/?\?)",
    r"monster\.[a-z.]+/jobs/(search|q-)",
    r"[?&]q=",
    r"/search[?/]",
    r"-SRCH_",
)

# _AGGREGATOR_COMPANY_NAMES (:207-211)
AGGREGATOR_COMPANIES = (
    "indeed", "glassdoor", "linkedin", "monster", "ziprecruiter", "dice",
    "wellfound", "angellist", "stack overflow", "stackoverflow",
    "weworkremotely", "we work remotely", "remoteok", "remote ok",
    "google", "google jobs",
)

PLACEHOLDER_COMPANY_RE = (
    r"^\s*(acme|companyxyz|example|sample|placeholder|fictional|fake|"
    r"company\s*[a-z]?|your\s+company|test\s*co|demo\s*co|"
    r"\[?company\s*name\]?|\[?employer\]?)"
    r"(\s|\.|,|$|inc|llc|co|ltd)")                       # :275-281

MISSING_COMPANY_RE = (
    r"^\s*(n/?a|tbd|tba|unknown|undisclosed|confidential|"
    r"not\s+specified|none)\s*$")                        # :299-302

# dedupe_hits source priorities (:1812)
SOURCE_PRIORITY = (("ats_board", 5), ("firecrawl_careers", 4),
                   ("rss_feed", 3), ("perplexity_sonar", 2),
                   ("google_jobs", 1))

# build_query_variations location words that suppress the where-part
LOCATION_ANY = ("remote", "anywhere", "worldwide", "global", "any")

_NETLOC_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def _netloc(url: Column) -> Column:
    n = F.lower(F.regexp_extract(url, _NETLOC_RE, 1))
    return F.regexp_replace(n, r"^www\.", "")


def domain_of_col(url: Column) -> Column:
    return _netloc(url)


def canonicalize_url_col(url: Column) -> Column:
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), r"/+$", "")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    tracked = F.array(*[F.lit(t) for t in TRACKING_PARAMS])
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p.contains("=") & ~p.endswith("=")
                   & ~F.array_contains(tracked,
                                       F.substring_index(p, "=", 1))))
    kq = F.array_join(kept, "&")
    return F.concat(
        scheme, F.lit("://"), _netloc(u), path,
        F.when(kq != "", F.concat(F.lit("?"), kq)).otherwise(F.lit("")))


def is_serp_url_col(url: Column) -> Column:
    out = F.lit(False)
    for pat in SERP_URL_PATTERNS:
        flags = "" if pat == r"-SRCH_" else "(?i)"
        # the reference compiles every pattern with re.I; -SRCH_ has no
        # letters whose case matters but (?i) is kept off nothing — all
        # patterns get (?i) to match re.I faithfully
        out = out | url.rlike("(?i)" + pat)
    return out


def _path_of(url: Column) -> Column:
    # _is_category_page_url works on the lowercased, '/'-rstripped path
    return F.regexp_replace(
        F.lower(F.regexp_extract(url, _PATH_RE, 1)), r"/+$", "")


def is_category_url_col(url: Column) -> Column:
    path = _path_of(url)
    last_seg = F.element_at(F.split(path, "/"), -1)
    positive = (path.rlike(r"/\d{4,}(/|$|-)")
                | F.lower(url).contains("?jk=")
                | path.contains("viewjob")
                | path.contains("job-listing")
                | path.contains("/jobs/view/")
                | path.contains("/job/view/"))
    negative = (path.rlike(r"/jobs?/(category|categories|search|board)/")
                | path.rlike(r"^/jobs?$")
                | path.rlike(r"/[a-z][a-z0-9-]*-jobs?/?$"))
    slugish = ((last_seg != "") & (F.length(last_seg) < 35)
               & ~last_seg.rlike(r"\d")
               & last_seg.rlike(r"^[a-z][a-z0-9-]*$"))
    return F.when(url.isNull() | (url == ""), F.lit(False)) \
        .when(positive, F.lit(False)) \
        .when(negative, F.lit(True)) \
        .otherwise(slugish)


def is_category_title_col(title: Column) -> Column:
    t = F.trim(title)
    cleaned = F.trim(F.regexp_replace(
        F.trim(F.regexp_replace(t, r"\([^)]*\)", "")), r"\s+", " "))
    nwords = F.when(cleaned == "", F.lit(0)) \
        .otherwise(F.size(F.split(cleaned, " ")))
    tiers = (t.rlike(r"(?i)^\d+\s+.{1,60}\bjobs?\b")
             | t.rlike(r"(?i)\bjobs?\s+board\b")
             | t.rlike(r"(?i)^(best|top)\s+.{1,80}\bjobs?\b")
             | ((nwords <= 6) & (nwords > 0)
                & cleaned.rlike(r"(?i)\bjobs?\b\s*$"))
             | t.rlike(r"(?i)\bapply\s+now\b\s*$")
             # tier 6 is case-SENSITIVE in the reference (no re.I):
             # lowercase 'jobs in <Place>' only — capital 'Jobs in' falls
             # through to tier 7's salary-prefix check
             | t.rlike(r"\bjobs?\s+in\s+[A-Z][a-zA-Z]+(\s*,\s*[A-Z]{2,})?")
             | t.rlike(r"^\s*\$\d"))
    return F.when(title.isNull(), F.lit(False)).otherwise(tiers)


def is_placeholder_company_col(name: Column) -> Column:
    return F.when(name.isNull(), F.lit(False)) \
        .otherwise(F.trim(name).rlike("(?i)" + PLACEHOLDER_COMPANY_RE))


def is_missing_company_col(name: Column) -> Column:
    return F.when(name.isNull(), F.lit(False)) \
        .otherwise(F.trim(name).rlike("(?i)" + MISSING_COMPANY_RE))


# the hallucinated-ID check as a SQL expression (shared shape with the
# DuckDB twin): any 6+-digit run that is ascending mod 10, descending
# mod 10, a palindrome, or a single repeated digit
_RUNS_BAD_SPARK = """
exists(
  regexp_extract_all({u}, '\\\\b(\\\\d{{6,}})\\\\b', 1),
  r -> reverse(r) = r
    OR length(replace(r, substring(r, 1, 1), '')) = 0
    OR transform(sequence(1, length(r)),
                 i -> ascii(substring(r, i, 1)) - 48)
       = transform(sequence(1, length(r)),
                 i -> ((ascii(substring(r, 1, 1)) - 48 + i - 1) % 10
                       + 10) % 10)
    OR transform(sequence(1, length(r)),
                 i -> ascii(substring(r, i, 1)) - 48)
       = transform(sequence(1, length(r)),
                 i -> ((ascii(substring(r, 1, 1)) - 48 - (i - 1)) % 10
                       + 10) % 10))
"""


def is_hallucinated_url_col(url: Column, url_sql_name: str) -> Column:
    runs_bad = F.expr(_RUNS_BAD_SPARK.format(u=url_sql_name))
    jk = F.regexp_extract(url, r"[?&]jk=([^&#]+)", 1)
    jk_bad = (jk != "") & ~jk.rlike(r"^[0-9a-fA-F]{16}$")
    return F.when(url.isNull() | (url == ""), F.lit(False)) \
        .otherwise(runs_bad | jk_bad)


def content_key_col(canonical: Column, title: Column,
                    company: Column) -> Column:
    return F.md5(F.concat(
        F.coalesce(canonical, F.lit("")), F.lit("|"),
        F.substring(F.lower(F.coalesce(title, F.lit(""))), 1, 200),
        F.lit("|"),
        F.substring(F.lower(F.coalesce(company, F.lit(""))), 1, 80)))


def gate_listings(listings: DataFrame) -> DataFrame:
    """The perplexity post-filter ladder (:1404-1433) over columns
    (hit_id, url, title, company, source). Emits every gate flag, the
    first-matching drop verdict in ladder order, the blanked company,
    and the dedup content key for kept rows."""
    url = F.col("url")
    company = F.col("company")
    is_serp = is_serp_url_col(url)
    is_cat_url = is_category_url_col(url)
    is_cat_title = is_category_title_col(F.col("title"))
    is_halluc = is_hallucinated_url_col(url, "url")
    is_agg_co = (company.isNotNull() & (F.trim(company) != "")
                 & F.lower(F.trim(company)).isin(*AGGREGATOR_COMPANIES))
    is_placeholder = is_placeholder_company_col(company)
    is_missing = is_missing_company_col(company)
    verdict = (
        F.when(url.isNull() | (F.trim(url) == "")
               | ~(url.startswith("http://") | url.startswith("https://")),
               F.lit("no_url"))
        .when(is_serp | is_cat_url, F.lit("category_serp_url"))
        .when(is_cat_title, F.lit("category_title"))
        .when(is_halluc, F.lit("hallucinated_url"))
        .when(is_agg_co, F.lit("aggregator_company"))
        .when(is_placeholder, F.lit("placeholder_company"))
        .otherwise(F.lit("keep")))
    company_clean = F.when(is_missing, F.lit(None).cast("string")) \
        .otherwise(company)
    canonical = F.when(verdict == "keep", canonicalize_url_col(url))
    return listings.select(
        "hit_id", "url", "title", "company", "source",
        is_serp.alias("is_serp_url"),
        is_cat_url.alias("is_category_url"),
        is_cat_title.alias("is_category_title"),
        is_halluc.alias("is_hallucinated_url"),
        is_placeholder.alias("is_placeholder_company"),
        is_missing.alias("is_missing_company"),
        verdict.alias("verdict"),
        F.when(verdict == "keep", company_clean).alias("company_clean"),
        canonical.alias("canonical_url"),
        F.when(verdict == "keep", domain_of_col(url))
         .alias("company_domain"),
        F.when(verdict == "keep",
               content_key_col(canonical, F.col("title"), company_clean))
         .alias("content_key"))


def dedupe_hits(hits: DataFrame) -> DataFrame:
    """Per content key keep the highest-priority source; ties keep the
    earliest arrival (lowest hit_id — the reference's replace-only-if-
    strictly-greater loop keeps the first). One window shuffle on the
    key, carrying (key, id, source) only."""
    prio = F.lit(0)
    for name, p in SOURCE_PRIORITY:
        prio = F.when(F.col("source") == name, F.lit(p)).otherwise(prio)
    w = Window.partitionBy("content_key").orderBy(
        F.col("priority").desc(), F.col("hit_id").asc())
    return (hits.withColumn("priority", prio)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


def query_variations(tracked: DataFrame) -> DataFrame:
    """build_query_variations (:960-983) over (keyword, location,
    remote_only): the five search-phrase templates, empty keywords
    yield no rows. posexplode keeps the template order as
    variation_idx."""
    base = F.trim(F.coalesce(F.col("keyword"), F.lit("")))
    where = F.trim(F.coalesce(F.col("location"), F.lit("")))
    where_part = F.when(
        (where != "") & ~F.lower(where).isin(*LOCATION_ANY),
        F.concat(F.lit(" "), where)).otherwise(F.lit(""))
    remote_suffix = F.when(F.col("remote_only"), F.lit(" remote")) \
        .otherwise(F.lit(""))
    variants = F.array(
        F.concat(base, remote_suffix, F.lit(" jobs"), where_part),
        F.concat(base, F.lit(" careers page"), where_part),
        F.concat(base, remote_suffix, F.lit(" hiring"), where_part),
        F.concat(base, remote_suffix, F.lit(" job opening"), where_part),
        F.concat(base, remote_suffix, F.lit(" apply"), where_part))
    return (tracked.where(base != "")
            .select(F.col("*"),
                    F.posexplode(variants).alias("variation_idx",
                                                 "query")))


# ---------------------------------------------------------------------------
# deterministic synthesizers + DuckDB twins (expression-lockstep)
# ---------------------------------------------------------------------------

def synth_job_listings(events: DataFrame) -> DataFrame:
    """Raw LLM-returned listing rows covering every gate branch."""
    e = F.col("event_id")
    hexid = F.substring(F.md5(e.cast("string")), 1, 16)
    url = (F.when(e % 14 == 0,
                  F.concat(F.lit("https://boards.example.com/jobs/view/"),
                           (F.lit(87000000) + e % 40).cast("string")))
           .when(e % 14 == 1, F.lit("https://www.indeed.com/q-python-jobs.html"))
           .when(e % 14 == 2, F.lit("https://glassdoor.com/Job/python-jobs"))
           .when(e % 14 == 3, F.lit("https://linkedin.com/jobs/search?keywords=py"))
           .when(e % 14 == 4, F.lit("https://remoterocketship.com/python"))
           .when(e % 14 == 5, F.lit("https://builtin.com/jobs"))
           .when(e % 14 == 6, F.lit("https://example-board.com/remote-python-jobs"))
           .when(e % 14 == 7, F.lit("https://jobs.example.com/posting/1234567"))
           .when(e % 14 == 8, F.lit("https://jobs.example.com/posting/7654321"))
           .when(e % 14 == 9, F.lit("https://jobs.example.com/posting/1233321"))
           .when(e % 14 == 10, F.lit("https://www.indeed.com/viewjob?jk=xyz789sardine"))
           .when(e % 14 == 11,
                 F.concat(F.lit("https://www.indeed.com/viewjob?jk="), hexid))
           .when(e % 14 == 12,
                 F.concat(F.lit("HTTPS://WWW.Example.COM/Careers/Senior-Engineer-"),
                          (F.lit(10000) + e % 90).cast("string"),
                          F.lit("/?utm_source=x&ref=y&id=77")))
           .otherwise(F.when(e % 28 == 13, F.lit(""))
                      .otherwise(F.lit("ftp://files.example.com/123456.pdf"))))
    title = (F.when(e % 9 == 0, F.lit("25 Python jobs in Developer / Engineer"))
             .when(e % 9 == 1, F.lit("Python Job Board"))
             .when(e % 9 == 2, F.lit("Best Remote Python Jobs in NYC 2026"))
             .when(e % 9 == 3, F.lit("Remote Python Jobs (May 2026)"))
             .when(e % 9 == 4, F.lit("Python Developer Apply Now"))
             .when(e % 9 == 5, F.lit("backend jobs in Athens, GR"))
             .when(e % 9 == 6,
                   F.lit("$120k-$150k Senior Python Developer Jobs in Houston, TX"))
             .when(e % 9 == 7,
                   F.lit("Senior Software Engineer - Backend/Python - USA Only (100% Remote)"))
             .otherwise(F.lit(None).cast("string")))
    company = (F.when(e % 7 == 0, F.lit("Acme Inc."))
               .when(e % 7 == 1, F.lit("Indeed"))
               .when(e % 7 == 2, F.lit("Unknown"))
               .when(e % 7 == 3, F.lit("Confidential"))
               .when(e % 7 == 4, F.lit(None).cast("string"))
               .when(e % 7 == 5, F.lit("Stripe"))
               .otherwise(F.lit("Sardine AI")))
    source = (F.when(e % 6 == 0, F.lit("ats_board"))
              .when(e % 6 == 1, F.lit("firecrawl_careers"))
              .when(e % 6 == 2, F.lit("rss_feed"))
              .when(e % 6 == 3, F.lit("perplexity_sonar"))
              .when(e % 6 == 4, F.lit("google_jobs"))
              .otherwise(F.lit("manual")))
    return events.select(e.alias("hit_id"), url.alias("url"),
                         title.alias("title"), company.alias("company"),
                         source.alias("source"))


def synth_dedup_hits(events: DataFrame) -> DataFrame:
    """Coarse-keyed kept-hit rows so content keys actually collide."""
    e = F.col("event_id")
    canonical = F.concat(F.lit("https://c.example.com/jobs/view/"),
                         (e % 25).cast("string"))
    title = F.concat(F.lit("Role "), (e % 4).cast("string"))
    company = F.concat(F.lit("Co "), (e % 3).cast("string"))
    source = (F.when(e % 6 == 0, F.lit("ats_board"))
              .when(e % 6 == 1, F.lit("firecrawl_careers"))
              .when(e % 6 == 2, F.lit("rss_feed"))
              .when(e % 6 == 3, F.lit("perplexity_sonar"))
              .when(e % 6 == 4, F.lit("google_jobs"))
              .otherwise(F.lit("manual")))
    return events.select(
        e.alias("hit_id"), source.alias("source"),
        content_key_col(canonical, title, company).alias("content_key"))


def synth_tracked_keywords(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    u = F.col("user_id")
    keyword = (F.when(u % 5 == 0, F.lit("python developer"))
               .when(u % 5 == 1, F.lit("data engineer"))
               .when(u % 5 == 2, F.lit(""))
               .when(u % 5 == 3, F.lit("ml engineer"))
               .otherwise(F.lit("devops")))
    location = (F.when(e % 6 == 0, F.lit("Remote"))
                .when(e % 6 == 1, F.lit("Athens"))
                .when(e % 6 == 2, F.lit(""))
                .when(e % 6 == 3, F.lit("Berlin"))
                .when(e % 6 == 4, F.lit("anywhere"))
                .otherwise(F.lit(None).cast("string")))
    return events.select(e.alias("track_id"), keyword.alias("keyword"),
                         location.alias("location"),
                         (e % 2 == 0).alias("remote_only"))


SYNTH_JOB_LISTINGS_SQL = """
    SELECT event_id AS hit_id,
           CASE WHEN event_id % 14 = 0 THEN
                    'https://boards.example.com/jobs/view/'
                    || CAST(87000000 + event_id % 40 AS VARCHAR)
                WHEN event_id % 14 = 1 THEN 'https://www.indeed.com/q-python-jobs.html'
                WHEN event_id % 14 = 2 THEN 'https://glassdoor.com/Job/python-jobs'
                WHEN event_id % 14 = 3 THEN 'https://linkedin.com/jobs/search?keywords=py'
                WHEN event_id % 14 = 4 THEN 'https://remoterocketship.com/python'
                WHEN event_id % 14 = 5 THEN 'https://builtin.com/jobs'
                WHEN event_id % 14 = 6 THEN 'https://example-board.com/remote-python-jobs'
                WHEN event_id % 14 = 7 THEN 'https://jobs.example.com/posting/1234567'
                WHEN event_id % 14 = 8 THEN 'https://jobs.example.com/posting/7654321'
                WHEN event_id % 14 = 9 THEN 'https://jobs.example.com/posting/1233321'
                WHEN event_id % 14 = 10 THEN 'https://www.indeed.com/viewjob?jk=xyz789sardine'
                WHEN event_id % 14 = 11 THEN 'https://www.indeed.com/viewjob?jk='
                    || substring(md5(CAST(event_id AS VARCHAR)), 1, 16)
                WHEN event_id % 14 = 12 THEN
                    'HTTPS://WWW.Example.COM/Careers/Senior-Engineer-'
                    || CAST(10000 + event_id % 90 AS VARCHAR)
                    || '/?utm_source=x&ref=y&id=77'
                WHEN event_id % 28 = 13 THEN ''
                ELSE 'ftp://files.example.com/123456.pdf' END AS url,
           CASE WHEN event_id % 9 = 0 THEN '25 Python jobs in Developer / Engineer'
                WHEN event_id % 9 = 1 THEN 'Python Job Board'
                WHEN event_id % 9 = 2 THEN 'Best Remote Python Jobs in NYC 2026'
                WHEN event_id % 9 = 3 THEN 'Remote Python Jobs (May 2026)'
                WHEN event_id % 9 = 4 THEN 'Python Developer Apply Now'
                WHEN event_id % 9 = 5 THEN 'backend jobs in Athens, GR'
                WHEN event_id % 9 = 6 THEN '$120k-$150k Senior Python Developer Jobs in Houston, TX'
                WHEN event_id % 9 = 7 THEN 'Senior Software Engineer - Backend/Python - USA Only (100% Remote)'
                ELSE NULL END AS title,
           CASE WHEN event_id % 7 = 0 THEN 'Acme Inc.'
                WHEN event_id % 7 = 1 THEN 'Indeed'
                WHEN event_id % 7 = 2 THEN 'Unknown'
                WHEN event_id % 7 = 3 THEN 'Confidential'
                WHEN event_id % 7 = 4 THEN NULL
                WHEN event_id % 7 = 5 THEN 'Stripe'
                ELSE 'Sardine AI' END AS company,
           CASE WHEN event_id % 6 = 0 THEN 'ats_board'
                WHEN event_id % 6 = 1 THEN 'firecrawl_careers'
                WHEN event_id % 6 = 2 THEN 'rss_feed'
                WHEN event_id % 6 = 3 THEN 'perplexity_sonar'
                WHEN event_id % 6 = 4 THEN 'google_jobs'
                ELSE 'manual' END AS source
    FROM events"""

SYNTH_DEDUP_HITS_SQL = """
    SELECT event_id AS hit_id,
           CASE WHEN event_id % 6 = 0 THEN 'ats_board'
                WHEN event_id % 6 = 1 THEN 'firecrawl_careers'
                WHEN event_id % 6 = 2 THEN 'rss_feed'
                WHEN event_id % 6 = 3 THEN 'perplexity_sonar'
                WHEN event_id % 6 = 4 THEN 'google_jobs'
                ELSE 'manual' END AS source,
           md5('https://c.example.com/jobs/view/'
               || CAST(event_id % 25 AS VARCHAR)
               || '|' || substring(lower('Role '
               || CAST(event_id % 4 AS VARCHAR)), 1, 200)
               || '|' || substring(lower('Co '
               || CAST(event_id % 3 AS VARCHAR)), 1, 80)) AS content_key
    FROM events"""

SYNTH_TRACKED_KEYWORDS_SQL = """
    SELECT event_id AS track_id,
           CASE WHEN user_id % 5 = 0 THEN 'python developer'
                WHEN user_id % 5 = 1 THEN 'data engineer'
                WHEN user_id % 5 = 2 THEN ''
                WHEN user_id % 5 = 3 THEN 'ml engineer'
                ELSE 'devops' END AS keyword,
           CASE WHEN event_id % 6 = 0 THEN 'Remote'
                WHEN event_id % 6 = 1 THEN 'Athens'
                WHEN event_id % 6 = 2 THEN ''
                WHEN event_id % 6 = 3 THEN 'Berlin'
                WHEN event_id % 6 = 4 THEN 'anywhere'
                ELSE NULL END AS location,
           event_id % 2 = 0 AS remote_only
    FROM events"""


def gate_sql_exprs() -> dict[str, str]:
    """DuckDB twin expressions for the gate ladder, keyed by column.
    Generated from the same constants the Spark Columns use."""
    netloc = ("regexp_replace(lower(regexp_extract(url, "
              "'^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)), "
              "'^www\\.', '')")
    path_raw = ("regexp_extract(url, "
                "'^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1)")
    path = f"regexp_replace(lower({path_raw}), '/+$', '')"
    last_seg = f"CASE WHEN {path} = '' THEN '' ELSE list_extract(string_split({path}, '/'), len(string_split({path}, '/'))) END"
    serp = " OR ".join(
        f"regexp_matches(url, '(?i){p}')" for p in SERP_URL_PATTERNS)
    positive = (f"regexp_matches({path}, '/\\d{{4,}}(/|$|-)') "
                f"OR contains(lower(url), '?jk=') "
                f"OR contains({path}, 'viewjob') "
                f"OR contains({path}, 'job-listing') "
                f"OR contains({path}, '/jobs/view/') "
                f"OR contains({path}, '/job/view/')")
    negative = (f"regexp_matches({path}, "
                f"'/jobs?/(category|categories|search|board)/') "
                f"OR regexp_matches({path}, '^/jobs?$') "
                f"OR regexp_matches({path}, '/[a-z][a-z0-9-]*-jobs?/?$')")
    slugish = (f"({last_seg} <> '' AND length({last_seg}) < 35 "
               f"AND NOT regexp_matches({last_seg}, '\\d') "
               f"AND regexp_matches({last_seg}, '^[a-z][a-z0-9-]*$'))")
    cat_url = (f"CASE WHEN url IS NULL OR url = '' THEN FALSE "
               f"WHEN {positive} THEN FALSE "
               f"WHEN {negative} THEN TRUE "
               f"ELSE {slugish} END")
    cleaned = ("trim(regexp_replace(trim(regexp_replace(trim(title), "
               "'\\([^)]*\\)', '', 'g')), '\\s+', ' ', 'g'))")
    nwords = (f"CASE WHEN {cleaned} = '' THEN 0 "
              f"ELSE len(string_split({cleaned}, ' ')) END")
    cat_title = f"""CASE WHEN title IS NULL THEN FALSE ELSE
        regexp_matches(trim(title), '(?i)^\\d+\\s+.{{1,60}}\\bjobs?\\b')
        OR regexp_matches(trim(title), '(?i)\\bjobs?\\s+board\\b')
        OR regexp_matches(trim(title),
                          '(?i)^(best|top)\\s+.{{1,80}}\\bjobs?\\b')
        OR ({nwords} <= 6 AND {nwords} > 0
            AND regexp_matches({cleaned}, '(?i)\\bjobs?\\b\\s*$'))
        OR regexp_matches(trim(title), '(?i)\\bapply\\s+now\\b\\s*$')
        OR regexp_matches(trim(title),
            '\\bjobs?\\s+in\\s+[A-Z][a-zA-Z]+(\\s*,\\s*[A-Z]{{2,}})?')
        OR regexp_matches(trim(title), '^\\s*\\$\\d') END"""
    runs_bad = """len(list_filter(
        regexp_extract_all(url, '\\b(\\d{6,})\\b', 1),
        r -> reverse(r) = r
          OR length(replace(r, substring(r, 1, 1), '')) = 0
          OR list_transform(range(1, length(r) + 1),
                 i -> ascii(substring(r, i, 1)) - 48)
             = list_transform(range(1, length(r) + 1),
                 i -> ((ascii(substring(r, 1, 1)) - 48 + i - 1) % 10
                       + 10) % 10)
          OR list_transform(range(1, length(r) + 1),
                 i -> ascii(substring(r, i, 1)) - 48)
             = list_transform(range(1, length(r) + 1),
                 i -> ((ascii(substring(r, 1, 1)) - 48 - (i - 1)) % 10
                       + 10) % 10))) > 0"""
    jk = "regexp_extract(url, '[?&]jk=([^&#]+)', 1)"
    halluc = (f"CASE WHEN url IS NULL OR url = '' THEN FALSE ELSE "
              f"({runs_bad}) OR ({jk} <> '' AND NOT "
              f"regexp_matches({jk}, '^[0-9a-fA-F]{{16}}$')) END")
    agg_list = ", ".join(f"'{c}'" for c in AGGREGATOR_COMPANIES)
    agg_co = (f"(company IS NOT NULL AND trim(company) <> '' AND "
              f"lower(trim(company)) IN ({agg_list}))")
    placeholder = (f"CASE WHEN company IS NULL THEN FALSE ELSE "
                   f"regexp_matches(trim(company), "
                   f"'(?i)^{PLACEHOLDER_COMPANY_RE[1:]}') END")
    missing = (f"CASE WHEN company IS NULL THEN FALSE ELSE "
               f"regexp_matches(trim(company), "
               f"'(?i)^{MISSING_COMPANY_RE[1:]}') END")
    scheme = ("lower(regexp_extract(url, "
              "'^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))")
    query = "regexp_extract(trim(url), '\\?([^#]*)', 1)"
    tracked = ", ".join(f"'{t}'" for t in TRACKING_PARAMS)
    kept = (f"array_to_string(list_filter(string_split({query}, '&'), "
            f"p -> contains(p, '=') "
            f"AND NOT p LIKE '%=' "
            f"AND NOT list_contains([{tracked}], "
            f"split_part(p, '=', 1))), '&')")
    canonical = (f"{scheme} || '://' || {netloc} "
                 f"|| regexp_replace({path_raw}, '/+$', '') "
                 f"|| CASE WHEN {kept} <> '' THEN '?' || {kept} "
                 f"ELSE '' END")
    return {
        "is_serp_url": f"({serp})",
        "is_category_url": cat_url,
        "is_category_title": cat_title,
        "is_hallucinated_url": halluc,
        "is_aggregator_company": agg_co,
        "is_placeholder_company": placeholder,
        "is_missing_company": missing,
        "canonical_url": canonical,
        "company_domain": netloc,
    }
