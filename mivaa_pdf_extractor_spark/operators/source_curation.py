"""Job-source self-curation: registrable-domain collapse, the
board-promotion guardrails, curated-yield bumps, and stale auto-added
disables.

Re-expresses app/services/integrations/job_source_curator.py as batch
plans over one refresh run:

- ``_registrable`` (:58-77): host of a bare domain / URL (lowered,
  ``www.`` and port stripped), collapsed to the registrable domain with
  the 13-entry two-part-TLD table.
- ``review_and_learn_sources`` (:185-234): verified-match listings
  grouped by registrable domain; employers = lowered company names with
  the ``or domain`` empty fallback.
- ``_learn_or_promote`` (:107-156): non-curated domains fold into the
  board index — verified_matches += run matches, refresh_runs += 1,
  employers = prior sample ∪ new (distinct_employers counts THIS union,
  so it is silently bounded by the stored 25-employer sample cap;
  pinned), sample = first 25 of the sorted union; promotion iff prior
  status is candidate ∧ union ≥ 3 employers ∧ runs ≥ 2. Domains in the
  12-entry never-promote set get NO index update at all (the guard
  returns before the upsert; pinned).
- ``_bump_curated_yield`` (:90-104): EVERY enabled curated row whose
  registrable domain matches gets lifetime_verified += run matches.
- ``_auto_disable_stale_auto_added`` (:159-182): enabled ∧ auto_added ∧
  ISO-STRING-compare(coalesce(last_yield_at, created_at)) < cutoff —
  evaluated AFTER bumps and promotions, so a site that yielded this run
  (or was just promoted) is never stale.

Scale notes: listings aggregate per registrable domain (one shuffle on
a low-cardinality key); the curated/board tables are broadcast-sized
dimension joins; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MIN_EMPLOYERS = 3          # :30
MIN_RUNS = 2               # :31
STALE_DAYS = 30            # :32
MAX_SAMPLE_EMPLOYERS = 25  # :33

NEVER_PROMOTE = (
    "reddit.com", "medium.com", "quora.com", "youtube.com", "substack.com",
    "twitter.com", "x.com", "facebook.com", "instagram.com", "wikipedia.org",
    "jooble.org", "google.com", "bing.com",
)  # :38-42

TWO_PART_TLDS = (
    "co.uk", "com.br", "co.jp", "com.au", "co.in", "com.mx", "co.za",
    "com.sg", "com.tr", "gr.com", "co.il",
)  # :46-49


def registrable(value: Column) -> Column:
    """Column transcription of _registrable(_host(value)) (:58-77).

    Round 6: the host (whose derivation includes a parse_url call) and
    the split-parts array are bound ONCE each via nested single-element
    ``transform`` lambdas — a native let-binding. The previous flat
    expression referenced ``host``/``parts``/``last2`` multiple times
    and Catalyst inlined ~7 copies of the parse_url chain per row."""
    v = F.lower(F.trim(value))
    bare = (~v.contains("://")) & (~v.contains("/")) & (~v.contains(" "))
    parsed = F.parse_url(
        F.when(v.contains("://"), v).otherwise(F.concat(F.lit("http://"), v)),
        F.lit("HOST"))
    host0 = F.when(v == "", "").otherwise(
        F.when(bare, v).otherwise(F.coalesce(parsed, F.lit(""))))
    host_expr = F.split(F.regexp_replace(host0, r"^www\.", ""),
                        ":").getItem(0)

    def decide(host: Column) -> Column:
        def from_parts(parts: Column) -> Column:
            last2 = F.array_join(F.slice(parts, -2, 2), ".")
            last3 = F.array_join(F.slice(parts, -3, 3), ".")
            return (F.when((F.size(parts) >= 3)
                           & last2.isin(*TWO_PART_TLDS), last3)
                    .otherwise(last2))

        multi = F.element_at(
            F.transform(F.array(F.split(host, r"\.")), from_parts), 1)
        return F.when(~host.contains("."), host).otherwise(multi)

    return F.element_at(F.transform(F.array(host_expr), decide), 1)


def _run_domains(listings: DataFrame) -> DataFrame:
    """Verified-match listings → per-domain (matches, employer set)."""
    base = (listings
            .filter(F.col("relevance") == "match")
            .withColumn("domain", registrable(F.coalesce(
                F.col("company_domain"), F.lit(""))))
            .filter(F.col("domain") != "")
            .withColumn("emp", F.lower(F.trim(F.coalesce(
                F.col("company"), F.lit("")))))
            .withColumn("emp", F.when(F.col("emp") == "", F.col("domain"))
                        .otherwise(F.col("emp"))))
    return base.groupBy("domain").agg(
        F.count(F.lit(1)).alias("matches"),
        F.collect_set("emp").alias("employers"))


def fold_board_index(listings: DataFrame, curated: DataFrame,
                     board_index: DataFrame) -> DataFrame:
    """→ board-index end state for this run's non-curated domains:
    (domain, verified_matches, refresh_runs, distinct_employers,
    sample_csv, status, promoted, notes)."""
    run = _run_domains(listings)
    curated_doms = (curated.filter(F.col("is_enabled"))
                    .select(registrable(F.col("url_or_domain"))
                            .alias("domain"))
                    .filter(F.col("domain") != "").distinct()
                    .withColumn("is_curated", F.lit(True)))
    learned = (run
               .join(F.broadcast(curated_doms), "domain", "left")
               .filter(F.col("is_curated").isNull())
               .filter(~F.col("domain").isin(*NEVER_PROMOTE))
               .join(F.broadcast(board_index.select(
                   "domain",
                   F.col("verified_matches").alias("vm0"),
                   F.col("refresh_runs").alias("rr0"),
                   F.col("sample_employers").alias("prior_emps"),
                   F.col("status").alias("status0"))), "domain", "left"))
    merged = F.array_sort(F.array_distinct(F.concat(
        F.coalesce(F.col("prior_emps"),
                   F.array().cast("array<string>")),
        F.col("employers"))))
    out = (learned
           .withColumn("merged", merged)
           .withColumn("verified_matches",
                       F.coalesce("vm0", F.lit(0)) + F.col("matches"))
           .withColumn("refresh_runs", F.coalesce("rr0", F.lit(0)) + 1)
           .withColumn("status_pre",
                       F.coalesce("status0", F.lit("candidate")))
           .withColumn("promoted",
                       (F.col("status_pre") == "candidate")
                       & (F.size("merged") >= MIN_EMPLOYERS)
                       & (F.col("refresh_runs") >= MIN_RUNS)))
    return out.select(
        "domain", "verified_matches", "refresh_runs",
        F.size("merged").alias("distinct_employers"),
        F.array_join(F.slice("merged", 1, MAX_SAMPLE_EMPLOYERS), "|")
        .alias("sample_csv"),
        F.when(F.col("promoted"), "promoted").otherwise(F.col("status_pre"))
        .alias("status"),
        "promoted",
        F.when(F.col("promoted"),
               F.concat(F.lit("Auto-added: "),
                        F.size("merged").cast("string"),
                        F.lit(" employers across "),
                        F.col("refresh_runs").cast("string"),
                        F.lit(" refreshes")))
        .alias("notes"))


def site_actions(listings: DataFrame, curated: DataFrame,
                 now_iso: str, cutoff_iso: str) -> DataFrame:
    """→ per curated-site action rows (site_id, domain, action,
    lifetime_verified, last_yield_at): bumped / disabled / kept.
    Disables are evaluated after bumps (a site bumped this run carries
    last_yield_at = now and is never stale)."""
    run = _run_domains(listings).select(
        "domain", F.col("matches").alias("run_matches"))
    sites = (curated
             .withColumn("domain", registrable(F.coalesce(
                 F.col("url_or_domain"), F.lit(""))))
             .join(F.broadcast(run), "domain", "left"))
    bumped = F.col("is_enabled") & F.col("run_matches").isNotNull()
    ref = F.coalesce(F.col("last_yield_at"), F.col("created_at"))
    stale = (F.col("is_enabled") & F.col("auto_added") & ~bumped
             & ref.isNotNull() & (ref < F.lit(cutoff_iso)))
    return sites.select(
        "site_id", "domain",
        F.when(bumped, "bumped").when(stale, "disabled")
         .otherwise(F.lit("kept")).alias("action"),
        (F.coalesce(F.col("lifetime_verified"), F.lit(0))
         + F.when(bumped, F.col("run_matches")).otherwise(F.lit(0)))
        .alias("lifetime_verified"),
        F.when(bumped, F.lit(now_iso)).otherwise(F.col("last_yield_at"))
        .alias("last_yield_at"))


# ---------------------------------------------------------------------
# Deterministic synthesis + DuckDB twins

RUN_NOW_ISO = "2026-08-18T00:00:00+00:00"
RUN_CUTOFF_ISO = "2026-07-19T00:00:00+00:00"  # now - 30d


def synth_job_match_listings(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    dom = (F.when(e % 11 == 0, "reddit.com")
            .when(e % 11 == 1, "https://www.jobs.example.co.uk/listing/1")
            .when(e % 11 == 2, "Boards.Greenhouse.io")
            .when(e % 11 == 3, "")
            .when(e % 11 == 4, None)
            .when(e % 11 == 5, "linkedin.com")
            .when(e % 11 == 6, "ie.linkedin.com")
            .when(e % 11 == 7, F.concat(F.lit("board"), (e % 4).cast("string"),
                                        F.lit(".niche.io")))
            .otherwise(F.concat(F.lit("b"), (e % 6).cast("string"),
                                F.lit(".jobs.example.com"))))
    return events.select(
        e.alias("listing_id"),
        dom.alias("company_domain"),
        (F.when(e % 7 == 0, "")
          .when(e % 7 == 1, None)
          .when(e % 7 == 2, "  ACME Corp ")
          .otherwise(F.concat(F.lit("Employer "), (e % 9).cast("string"))))
        .alias("company"),
        (F.when(e % 5 == 0, "no_match").otherwise("match"))
        .alias("relevance"))


SYNTH_JOB_MATCH_LISTINGS_SQL = """
    SELECT event_id AS listing_id,
           CASE WHEN event_id % 11 = 0 THEN 'reddit.com'
                WHEN event_id % 11 = 1
                    THEN 'https://www.jobs.example.co.uk/listing/1'
                WHEN event_id % 11 = 2 THEN 'Boards.Greenhouse.io'
                WHEN event_id % 11 = 3 THEN ''
                WHEN event_id % 11 = 4 THEN NULL
                WHEN event_id % 11 = 5 THEN 'linkedin.com'
                WHEN event_id % 11 = 6 THEN 'ie.linkedin.com'
                WHEN event_id % 11 = 7
                    THEN 'board' || CAST(event_id % 4 AS VARCHAR) || '.niche.io'
                ELSE 'b' || CAST(event_id % 6 AS VARCHAR) || '.jobs.example.com'
           END AS company_domain,
           CASE WHEN event_id % 7 = 0 THEN ''
                WHEN event_id % 7 = 1 THEN NULL
                WHEN event_id % 7 = 2 THEN '  ACME Corp '
                ELSE 'Employer ' || CAST(event_id % 9 AS VARCHAR)
           END AS company,
           CASE WHEN event_id % 5 = 0 THEN 'no_match' ELSE 'match' END
             AS relevance
    FROM events
"""


def synth_curated_sites(events: DataFrame) -> DataFrame:
    s = F.col("sid")
    base = events.select((F.col("event_id") % 8).alias("sid")).distinct()
    return base.select(
        s.alias("site_id"),
        (F.when(s % 4 == 0, "greenhouse.io")
          .when(s % 4 == 1, "www.linkedin.com")
          .when(s % 4 == 2, "https://stale-board.example.org/jobs")
          .otherwise("quiet-board.example.net")).alias("url_or_domain"),
        (s % 5 != 4).alias("is_enabled"),
        (s % 2 == 0).alias("auto_added"),
        (F.when(s % 3 == 0, "2026-06-01T00:00:00+00:00")
          .when(s % 3 == 1, "2026-08-10T00:00:00+00:00")
          .otherwise(None)).alias("last_yield_at"),
        F.lit("2026-05-20T00:00:00+00:00").alias("created_at"),
        (s * 3).cast("long").alias("lifetime_verified"))


SYNTH_CURATED_SITES_SQL = """
    SELECT sid AS site_id,
           CASE WHEN sid % 4 = 0 THEN 'greenhouse.io'
                WHEN sid % 4 = 1 THEN 'www.linkedin.com'
                WHEN sid % 4 = 2 THEN 'https://stale-board.example.org/jobs'
                ELSE 'quiet-board.example.net' END AS url_or_domain,
           sid % 5 <> 4 AS is_enabled,
           sid % 2 = 0 AS auto_added,
           CASE WHEN sid % 3 = 0 THEN '2026-06-01T00:00:00+00:00'
                WHEN sid % 3 = 1 THEN '2026-08-10T00:00:00+00:00'
           END AS last_yield_at,
           '2026-05-20T00:00:00+00:00' AS created_at,
           CAST(sid * 3 AS BIGINT) AS lifetime_verified
    FROM (SELECT DISTINCT event_id % 8 AS sid FROM events)
"""


def synth_board_index(events: DataFrame) -> DataFrame:
    b = F.col("bid")
    base = events.select((F.col("event_id") % 4).alias("bid")).distinct()
    return base.select(
        (F.when(b % 4 == 0, "b1.jobs.example.com")
          .when(b % 4 == 1, "example.com")
          .when(b % 4 == 2, "niche.io")
          .otherwise("example.co.uk")).alias("domain"),
        (b + 2).cast("long").alias("verified_matches"),
        (b % 3).cast("long").alias("refresh_runs"),
        (b + 1).cast("long").alias("distinct_employers"),
        (F.when(b % 2 == 0, F.array(F.lit("employer 1"), F.lit("acme corp")))
          .otherwise(F.array(F.lit("zeta llc")))).alias("sample_employers"),
        (F.when(b % 4 == 2, "promoted").otherwise("candidate"))
        .alias("status"))


SYNTH_BOARD_INDEX_SQL = """
    SELECT CASE WHEN bid % 4 = 0 THEN 'b1.jobs.example.com'
                WHEN bid % 4 = 1 THEN 'example.com'
                WHEN bid % 4 = 2 THEN 'niche.io'
                ELSE 'example.co.uk' END AS domain,
           CAST(bid + 2 AS BIGINT) AS verified_matches,
           CAST(bid % 3 AS BIGINT) AS refresh_runs,
           CAST(bid + 1 AS BIGINT) AS distinct_employers,
           CASE WHEN bid % 2 = 0 THEN ['employer 1', 'acme corp']
                ELSE ['zeta llc'] END AS sample_employers,
           CASE WHEN bid % 4 = 2 THEN 'promoted' ELSE 'candidate' END
             AS status
    FROM (SELECT DISTINCT event_id % 4 AS bid FROM events)
"""


_DUCK_NEVER = ", ".join(f"'{d}'" for d in NEVER_PROMOTE)
_DUCK_2TLD = ", ".join(f"'{t}'" for t in TWO_PART_TLDS)


def _duck_registrable(expr: str) -> str:
    """DuckDB twin of registrable(). Hosts come from bare domains or
    http(s) URLs (the synth emits only those shapes)."""
    v = f"LOWER(TRIM(COALESCE({expr}, '')))"
    host0 = (f"CASE WHEN {v} = '' THEN '' "
             f"WHEN NOT CONTAINS({v}, '://') AND NOT CONTAINS({v}, '/') "
             f"AND NOT CONTAINS({v}, ' ') THEN {v} "
             f"ELSE COALESCE(REGEXP_EXTRACT(CASE WHEN CONTAINS({v}, '://') "
             f"THEN {v} ELSE 'http://' || {v} END, "
             f"'^[a-z]+://([^/]+)', 1), '') END")
    host = (f"SPLIT_PART(REGEXP_REPLACE({host0}, '^www\\.', ''), ':', 1)")
    return (f"(SELECT CASE WHEN NOT CONTAINS(h, '.') THEN h "
            f"WHEN LEN(parts) >= 3 AND ARRAY_TO_STRING(parts[-2:], '.') "
            f"IN ({_DUCK_2TLD}) THEN ARRAY_TO_STRING(parts[-3:], '.') "
            f"ELSE ARRAY_TO_STRING(parts[-2:], '.') END "
            f"FROM (SELECT {host} AS h, STRING_SPLIT({host}, '.') AS parts))")


def duck_run_domains_sql() -> str:
    return f"""
    listed AS (
        SELECT {_duck_registrable('company_domain')} AS domain,
               CASE WHEN LOWER(TRIM(COALESCE(company, ''))) = ''
                    THEN {_duck_registrable('company_domain')}
                    ELSE LOWER(TRIM(company)) END AS emp
        FROM listings_in WHERE relevance = 'match'
    ), run_domains AS (
        SELECT domain, COUNT(*) AS matches,
               LIST(DISTINCT emp) AS employers
        FROM listed WHERE domain <> '' GROUP BY domain
    )"""


def duck_fold_board_index_sql() -> str:
    return f"""
    {duck_run_domains_sql()},
    curated_doms AS (
        SELECT DISTINCT {_duck_registrable('url_or_domain')} AS domain
        FROM curated_in WHERE is_enabled
    ), learned AS (
        SELECT r.domain, r.matches, r.employers,
               b.verified_matches AS vm0, b.refresh_runs AS rr0,
               b.sample_employers AS prior_emps, b.status AS status0
        FROM run_domains r
        LEFT JOIN curated_doms c USING (domain)
        LEFT JOIN board_in b USING (domain)
        WHERE c.domain IS NULL AND r.domain NOT IN ({_DUCK_NEVER})
          AND r.domain <> ''
    ), folded AS (
        SELECT domain,
               LIST_SORT(LIST_DISTINCT(
                   COALESCE(prior_emps, CAST([] AS VARCHAR[]))
                   || employers)) AS merged,
               COALESCE(vm0, 0) + matches AS verified_matches,
               COALESCE(rr0, 0) + 1 AS refresh_runs,
               COALESCE(status0, 'candidate') AS status_pre
        FROM learned
    )
    SELECT domain,
           CAST(verified_matches AS BIGINT) AS verified_matches,
           CAST(refresh_runs AS BIGINT) AS refresh_runs,
           CAST(LEN(merged) AS INT) AS distinct_employers,
           COALESCE(ARRAY_TO_STRING(merged[1:{MAX_SAMPLE_EMPLOYERS}], '|'),
                    '') AS sample_csv,
           CASE WHEN status_pre = 'candidate'
                     AND LEN(merged) >= {MIN_EMPLOYERS}
                     AND refresh_runs >= {MIN_RUNS}
                THEN 'promoted' ELSE status_pre END AS status,
           status_pre = 'candidate' AND LEN(merged) >= {MIN_EMPLOYERS}
               AND refresh_runs >= {MIN_RUNS} AS promoted,
           CASE WHEN status_pre = 'candidate'
                     AND LEN(merged) >= {MIN_EMPLOYERS}
                     AND refresh_runs >= {MIN_RUNS}
                THEN 'Auto-added: ' || CAST(LEN(merged) AS VARCHAR)
                     || ' employers across ' || CAST(refresh_runs AS VARCHAR)
                     || ' refreshes'
           END AS notes
    FROM folded
"""


def duck_site_actions_sql(now_iso: str, cutoff_iso: str) -> str:
    return f"""
    {duck_run_domains_sql()},
    sites AS (
        SELECT s.*, {_duck_registrable('s.url_or_domain')} AS domain,
               r.matches AS run_matches
        FROM curated_in s
        LEFT JOIN run_domains r
          ON r.domain = {_duck_registrable('s.url_or_domain')}
    ), flagged AS (
        SELECT *,
               is_enabled AND run_matches IS NOT NULL AS bumped,
               COALESCE(last_yield_at, created_at) AS ref
        FROM sites
    )
    SELECT site_id, domain,
           CASE WHEN bumped THEN 'bumped'
                WHEN is_enabled AND auto_added AND NOT bumped
                     AND ref IS NOT NULL AND ref < '{cutoff_iso}'
                THEN 'disabled' ELSE 'kept' END AS action,
           CAST(COALESCE(lifetime_verified, 0)
                + CASE WHEN bumped THEN run_matches ELSE 0 END AS BIGINT)
             AS lifetime_verified,
           CASE WHEN bumped THEN '{now_iso}' ELSE last_yield_at END
             AS last_yield_at
    FROM flagged
"""
