"""Job-research refresh cascade: the deterministic core of the reference's
refresh pipeline (app/services/integrations/job_research_service.py:572-1215),
re-expressed as native Spark column algebra — no UDFs, no collect.

Covered semantics (reference lines cited per operator):

- ``normalize_posted_at`` (:87-148) — source-reported posted dates arrive as
  human text ("New", "2 days ago", "30+ days ago", "Renewed 3 weeks ago");
  the normalizer's rule ORDER is load-bearing and pinned here:
  (1) a parseable ISO date/datetime passes through untouched;
  (2) any of the eight now-ish tokens ("new", "just posted", "just now",
      "today", "hours ago", "hour ago", "minutes ago", "minute ago") maps to
      NOW — except an embedded "N hours ago" which subtracts the hours; the
      token match is a SUBSTRING match, so "Renewed 3 weeks ago" hits "new"
      and returns NOW, not now-3w (pinned);
  (3) "yesterday" → now-1d;
  (4) "N days/weeks/months/years/hours ago" (also "30+ days ago") subtracts
      with month=30d, year=365d;
  (5) anything else → NULL ("undatable = unverifiable = dropped", :1020).

- the within-run dedup cascade (:940-1001): URL-uniqueness on
  lower(canonical_url or url) keeping the FIRST occurrence (deduped is
  already source-priority-ordered; empty keys never collide), then the
  role-identity collapse on (title-sans-trailing-parentheticals, company)
  normalized — both keys must be non-empty, and the seen-set is built only
  from URL-stage SURVIVORS (the reference iterates the url-unique list).

- exclusions ``_is_excluded`` (:1345-1357): excluded URL = SUBSTRING of the
  hit's lowered canonical-or-url; excluded domain = exact match on
  company_domain; excluded company = exact match against the exclusion set
  OR exact-or-substring match against the tracked job's excluded_companies.

- history anti-joins (:1000-1006, :1278-1320): content_hash against
  job_listings ∪ job_research_sent (delivered rows keep their hashes after
  purge — "keep the search, not the data"), then canonical_url (lowered)
  against job_listings.

- the STRICT recency gate ``_is_fresh`` (:1020-1046): kept only with a
  verifiable normalized posted date >= now - max_age_days; undatable drops.

- the outcome fold (:1076-1117, :1180-1186): ``deduped`` is counted AFTER
  the exclusion filter (the reference reassigns the list), candidates after
  the history anti-joins + recency gate, persisted = candidates whose
  classifier verdict isn't 'mismatch' (missing verdict → 'unverifiable'),
  matches = verdict == 'match'.

Scale notes: the cascade is two windows partitioned by (tracked_job, key)
carrying only ids and short keys, plus broadcast-sized per-tracked-job
exclusion arrays (collect_list over UI-entered rows — bounded by humans) and
two equi-anti-joins on (tracked_job, hash/url). Nothing shuffles hit bodies;
at 10^9 hits every exchange carries join keys only. DuckDB twins are
generated from the same constants (expression-lockstep).

The lead-verification step (:1008-1018, network fetches) is out of scope per
SURVEY §2's scoping; the cascade models its position (between the history
anti-joins and nothing — the recency gate runs on verified dates) by running
recency directly on the normalized dates.
"""

from __future__ import annotations

import calendar

from pyspark.sql import Column, DataFrame, Window, functions as F

# Fixed deterministic "now" anchor for contract queries / tests (the
# reference uses wall-clock utcnow; a fixed anchor keeps both engines and
# the pytest transcription bit-identical).
NOW_EPOCH = calendar.timegm((2026, 8, 19, 12, 0, 0))
NOW_STR = "2026-08-19 12:00:00"

# normalize_posted_at step-2 now-ish tokens (:119) — substring-matched.
NOW_TOKENS = ("new", "just posted", "just now", "today", "hours ago",
              "hour ago", "minutes ago", "minute ago")

# _REL_AGO_RE (:84) — valid in both Java regex (Spark) and RE2 (DuckDB).
REL_AGO_RE = r"([0-9]+)\s*\+?\s*(hour|hr|day|week|month|year)s?\s*ago"

_UNIT_SECS = (("day", 86400), ("week", 604800), ("month", 2592000),
              ("year", 31536000), ("hour", 3600), ("hr", 3600))

# ISO forms the synthesized corpus draws from (the reference accepts any
# datetime.fromisoformat input; the engine pins the two shapes job boards
# actually emit — bare date and seconds-precision datetime, optional
# Z/+00:00 suffix — and treats everything else as unparseable).
_ISO_DATE_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
_ISO_DT_RE = (r"^[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}:[0-9]{2}"
              r"(Z|\+00:00)?$")


def posted_at_norm_col(s: Column, now_epoch: int = NOW_EPOCH) -> Column:
    """normalize_posted_at (:87-148) as one native expression; returns the
    normalized timestamp as a 'yyyy-MM-dd HH:mm:ss' string (UTC), NULL when
    undatable."""
    t = F.trim(s)
    low = F.lower(t)
    parsed = (
        F.when(t.rlike(_ISO_DATE_RE), F.concat(t, F.lit(" 00:00:00")))
        .when(t.rlike(_ISO_DT_RE),
              F.regexp_replace(
                  F.regexp_replace(t, r"(Z|\+00:00)$", ""), "T", " ")))
    n = F.nullif(F.regexp_extract(low, REL_AGO_RE, 1), F.lit("")).cast("long")
    unit = F.nullif(F.regexp_extract(low, REL_AGO_RE, 2), F.lit(""))
    tok_hit = None
    for tok in NOW_TOKENS:
        c = low.contains(tok)
        tok_hit = c if tok_hit is None else (tok_hit | c)
    unit_secs = F.lit(None).cast("long")
    for u, secs in _UNIT_SECS:
        unit_secs = F.when(unit == u, F.lit(secs)).otherwise(unit_secs)
    offset = (
        F.when(tok_hit,
               F.when(unit.isin("hour", "hr"), n * 3600).otherwise(F.lit(0)))
        .when(low.contains("yesterday"), F.lit(86400))
        .when(unit_secs.isNotNull(), n * unit_secs))
    return (
        F.when(s.isNull() | (t == ""), F.lit(None).cast("string"))
        .when(parsed.isNotNull(), parsed)
        .when(offset.isNotNull(),
              F.from_unixtime(F.lit(now_epoch) - offset))
        .otherwise(F.lit(None).cast("string")))


def posted_at_norm_sql(expr: str, now_epoch: int = NOW_EPOCH) -> str:
    """DuckDB twin of :func:`posted_at_norm_col`, generated from the same
    token/unit constants."""
    t = f"trim({expr})"
    low = f"lower({t})"
    parsed = (
        f"CASE WHEN regexp_matches({t}, '{_ISO_DATE_RE}') "
        f"THEN {t} || ' 00:00:00' "
        f"WHEN regexp_matches({t}, '{_ISO_DT_RE}') "
        f"THEN replace(regexp_replace({t}, '(Z|\\+00:00)$', ''), 'T', ' ') "
        f"END")
    n = f"CAST(nullif(regexp_extract({low}, '{REL_AGO_RE}', 1), '') AS BIGINT)"
    unit = f"nullif(regexp_extract({low}, '{REL_AGO_RE}', 2), '')"
    toks = " OR ".join(f"contains({low}, '{tok}')" for tok in NOW_TOKENS)
    unit_case = ("CASE " + " ".join(
        f"WHEN {unit} = '{u}' THEN {secs}" for u, secs in _UNIT_SECS)
        + " END")
    offset = (
        f"CASE WHEN {toks} THEN "
        f"(CASE WHEN {unit} IN ('hour', 'hr') THEN {n} * 3600 ELSE 0 END) "
        f"WHEN contains({low}, 'yesterday') THEN 86400 "
        f"WHEN ({unit_case}) IS NOT NULL THEN {n} * ({unit_case}) END")
    fmt = (f"strftime(make_timestamp(CAST({now_epoch} - ({offset}) AS BIGINT) * 1000000), "
           f"'%Y-%m-%d %H:%M:%S')")
    return (f"CASE WHEN {expr} IS NULL OR {t} = '' THEN NULL "
            f"WHEN ({parsed}) IS NOT NULL THEN ({parsed}) "
            f"WHEN ({offset}) IS NOT NULL THEN {fmt} END")


# ---------------------------------------------------------------------------
# role-identity key (:966-985)
# ---------------------------------------------------------------------------

# One-pass equivalent of the reference's peel-repeated-trailing-"(...)" loop.
_TRAIL_PARENS = r"(\s*\([^()]*\)\s*)+$"
_NORM_SEPS = r"[\s\-_/|]+"


def role_title_key_col(title: Column) -> Column:
    core = F.trim(F.regexp_replace(F.trim(title), _TRAIL_PARENS, ""))
    return F.trim(F.regexp_replace(F.lower(core), _NORM_SEPS, " "))


def norm_key_col(s: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(F.trim(s)), _NORM_SEPS, " "))


def role_title_key_sql(expr: str) -> str:
    core = f"trim(regexp_replace(trim({expr}), '{_TRAIL_PARENS}', ''))"
    return f"trim(regexp_replace(lower({core}), '{_NORM_SEPS}', ' ', 'g'))"


def norm_key_sql(expr: str) -> str:
    return (f"trim(regexp_replace(lower(trim({expr})), "
            f"'{_NORM_SEPS}', ' ', 'g'))")


# ---------------------------------------------------------------------------
# the cascade
# ---------------------------------------------------------------------------

def refresh_cascade(hits: DataFrame, exclusions: DataFrame,
                    existing_hashes: DataFrame, existing_urls: DataFrame,
                    tracked: DataFrame,
                    now_epoch: int = NOW_EPOCH) -> DataFrame:
    """Stamp every post-``dedupe_hits`` hit with its refresh disposition.

    ``hits``: (tracked_id, hit_ord, url, canonical_url, title, company,
    company_domain, content_hash, posted_at, source) — hit_ord is the
    source-priority arrival order ``dedupe_hits`` left them in.
    ``exclusions``: (tracked_id, kind∈{url,domain,company,facet_company},
    value) — the UI exclusion rows (:1345-1357) plus the tracked job's
    excluded_companies facet. ``existing_hashes``/``existing_urls``:
    (tracked_id, content_hash)/(tracked_id, canonical_url) — job_listings ∪
    job_research_sent history. ``tracked``: (tracked_id, max_age_days).

    Disposition ladder (first failing stage wins, reference order):
    url_dup → role_dup → excluded → seen_hash → seen_url → stale → kept.
    """
    url_key = F.lower(F.coalesce(F.col("canonical_url"), F.col("url"),
                                 F.lit("")))
    # round 6: both dedup windows cluster by (tracked_id, <key>) —
    # HashPartitioning(tracked_id) satisfies both, so establishing the
    # partitioning once replaces the two per-window exchanges with one
    # (guide §2.4); everything downstream is broadcast-joined.
    h = hits.repartition("tracked_id").withColumn("_ukey", url_key)
    w1 = Window.partitionBy("tracked_id", "_ukey").orderBy("hit_ord")
    h = h.withColumn(
        "_url_dup",
        (F.col("_ukey") != "") & (F.row_number().over(w1) > 1))

    t_key = role_title_key_col(F.coalesce(F.col("title"), F.lit("")))
    c_key = norm_key_col(F.coalesce(F.col("company"), F.lit("")))
    rkey = F.when((t_key != "") & (c_key != ""),
                  F.concat(t_key, F.lit("|"), c_key))
    h = h.withColumn("_rkey", rkey)
    w2 = (Window.partitionBy("tracked_id", "_rkey").orderBy("hit_ord")
          .rowsBetween(Window.unboundedPreceding, 0))
    surv_cum = F.sum(F.when(~F.col("_url_dup"), 1).otherwise(0)).over(w2)
    h = h.withColumn(
        "_role_dup",
        (~F.col("_url_dup")) & F.col("_rkey").isNotNull() & (surv_cum > 1))

    # per-tracked exclusion arrays: UI-entered rows, humans-bounded — the
    # collect_list side is broadcast-sized by construction
    excl = (exclusions
            .groupBy("tracked_id")
            .agg(*[F.collect_list(F.when(F.col("kind") == k,
                                         F.lower(F.trim(F.col("value")))))
                   .alias(f"_x_{k}")
                   for k in ("url", "domain", "company", "facet_company")]))
    h = h.join(F.broadcast(excl), "tracked_id", "left")
    url_low = F.col("_ukey")
    dom_low = F.lower(F.coalesce(F.col("company_domain"), F.lit("")))
    co_low = F.lower(F.coalesce(F.col("company"), F.lit("")))

    def _arr(name: str) -> Column:
        return F.coalesce(F.col(name), F.array().cast("array<string>"))

    excluded = (
        F.exists(_arr("_x_url"),
                 lambda u: (u != "") & url_low.contains(u))
        | ((dom_low != "") & F.array_contains(_arr("_x_domain"), dom_low))
        | ((co_low != "") &
           (F.array_contains(_arr("_x_company"), co_low)
            | F.exists(_arr("_x_facet_company"),
                       lambda ex: (co_low == ex) | co_low.contains(ex)))))
    h = h.withColumn("_excluded", F.coalesce(excluded, F.lit(False)))

    seen_h = (existing_hashes.select("tracked_id",
                                     F.col("content_hash").alias("_sh"))
              .distinct().withColumn("_seen_hash", F.lit(True)))
    h = h.join(F.broadcast(seen_h),
               [h.tracked_id == seen_h.tracked_id,
                h.content_hash == seen_h._sh], "left") \
         .drop(seen_h.tracked_id).drop("_sh")
    seen_u = (existing_urls.select(
        "tracked_id", F.lower(F.col("canonical_url")).alias("_su"))
        .where(F.col("_su") != "").distinct()
        .withColumn("_seen_url", F.lit(True)))
    h = h.join(F.broadcast(seen_u),
               [h.tracked_id == seen_u.tracked_id,
                F.lower(F.coalesce(h.canonical_url, F.lit(""))) == seen_u._su],
               "left").drop(seen_u.tracked_id).drop("_su")

    h = h.join(F.broadcast(tracked.select("tracked_id", "max_age_days")),
               "tracked_id", "left")
    # stage the normalizer's pieces as named columns: each alias is its own
    # codegen expression, keeping every generated method under the JVM's
    # 64 KB limit (one inlined mega-CASE trips the Janino fallback)
    t = F.trim(F.col("posted_at"))
    low = F.lower(t)
    h = h.select(
        "*",
        t.alias("_pt"), low.alias("_plow"),
        F.nullif(F.regexp_extract(low, REL_AGO_RE, 1), F.lit(""))
        .cast("long").alias("_pn"),
        F.nullif(F.regexp_extract(low, REL_AGO_RE, 2), F.lit(""))
        .alias("_pu"))
    parsed = (
        F.when(F.col("_pt").rlike(_ISO_DATE_RE),
               F.concat(F.col("_pt"), F.lit(" 00:00:00")))
        .when(F.col("_pt").rlike(_ISO_DT_RE),
              F.regexp_replace(
                  F.regexp_replace(F.col("_pt"), r"(Z|\+00:00)$", ""),
                  "T", " ")))
    tok_hit = None
    for tok in NOW_TOKENS:
        c = F.col("_plow").contains(tok)
        tok_hit = c if tok_hit is None else (tok_hit | c)
    unit_secs = F.lit(None).cast("long")
    for u, secs in _UNIT_SECS:
        unit_secs = F.when(F.col("_pu") == u, F.lit(secs)) \
            .otherwise(unit_secs)
    offset = (
        F.when(tok_hit,
               F.when(F.col("_pu").isin("hour", "hr"),
                      F.col("_pn") * 3600).otherwise(F.lit(0)))
        .when(F.col("_plow").contains("yesterday"), F.lit(86400))
        .when(unit_secs.isNotNull(), F.col("_pn") * unit_secs))
    posted_norm = (
        F.when(F.col("posted_at").isNull() | (F.col("_pt") == ""),
               F.lit(None).cast("string"))
        .when(parsed.isNotNull(), parsed)
        .when(offset.isNotNull(),
              F.from_unixtime(F.lit(now_epoch) - offset))
        .otherwise(F.lit(None).cast("string")))
    cutoff = F.from_unixtime(
        F.lit(now_epoch) - F.col("max_age_days").cast("long") * 86400)
    h = (h.withColumn("posted_norm", posted_norm)
         .withColumn("_fresh",
                     F.col("posted_norm").isNotNull()
                     & (F.col("posted_norm") >= cutoff)))

    disp = (F.when(F.col("_url_dup"), "url_dup")
            .when(F.col("_role_dup"), "role_dup")
            .when(F.col("_excluded"), "excluded")
            .when(F.coalesce(F.col("_seen_hash"), F.lit(False)), "seen_hash")
            .when(F.coalesce(F.col("_seen_url"), F.lit(False)), "seen_url")
            .when(~F.col("_fresh"), "stale")
            .otherwise("kept"))
    return h.select("tracked_id", "hit_ord", "title", "company", "source",
                    "posted_norm", disp.alias("disposition"))


def refresh_outcome(cascaded: DataFrame, verdicts: DataFrame) -> DataFrame:
    """The refresh outcome counters (:1076-1117, :1180-1186): per tracked
    job, discovered / deduped-after-exclusions / new candidates /
    persisted / matches. ``verdicts``: (tracked_id, hit_ord, relevance) —
    the classifier's output for candidate rows; a missing or NULL verdict
    reads 'unverifiable' (:1080), 'mismatch' rows are skipped (:1082)."""
    c = cascaded.join(verdicts, ["tracked_id", "hit_ord"], "left")
    rel = F.coalesce(F.col("relevance"), F.lit("unverifiable"))
    kept = F.col("disposition") == "kept"
    return c.groupBy("tracked_id").agg(
        F.count(F.lit(1)).alias("discovered"),
        F.sum((~F.col("disposition").isin("url_dup", "role_dup", "excluded"))
              .cast("int")).alias("deduped"),
        F.sum(kept.cast("int")).alias("candidates"),
        F.sum((kept & (rel != "mismatch")).cast("int")).alias("persisted"),
        F.sum((kept & (rel == "match")).cast("int")).alias("matches"))


# ---------------------------------------------------------------------------
# deterministic synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

_TITLES = (
    "Staff Product Engineer (Belo Horizonte)",
    "Staff Product Engineer (Montevideo)",          # role-dup of the above
    "Staff Product Engineer (São Paulo) (Remote)",  # double parens
    "SC Cleared Product-Owner",                      # seps normalize
    "SC Cleared Product Owner",                      # role-dup of the above
    "Senior Backend Engineer",
    "(Urgent)",                                      # peels to empty title
    None,
)

_POSTED = (
    "2026-08-18T09:00:00",      # fresh ISO datetime
    "2026-07-01",               # stale ISO date
    "2 days ago",
    "3 weeks ago",
    "New",
    "Renewed 3 weeks ago",      # 'new' substring pin -> NOW
    "Yesterday",
    "30+ days ago",
    "5 minutes ago",
    "3 hr ago",
    "soon",                     # unparseable -> undatable -> stale
    None,
    "2026-08-17T10:30:00Z",
)


def synth_refresh_hits(events: DataFrame) -> DataFrame:
    """Post-``dedupe_hits`` hit rows covering every cascade branch."""
    e = F.col("event_id")
    canon = (F.when(e % 5 == 0, F.lit(None).cast("string"))
             .otherwise(F.concat(F.lit("https://jobs.example.com/view/"),
                                 (e % 17).cast("string"))))
    url = F.concat(F.lit("https://Jobs.example.com/view/"),
                   (e % 17).cast("string"),
                   F.when(e % 5 == 0, F.lit("?src=raw")).otherwise(F.lit("")))
    title = F.element_at(F.array(*[F.lit(t) for t in _TITLES]),
                         (e % 8 + 1).cast("int"))
    company = (F.when(e % 11 == 0, F.lit(None).cast("string"))
               .when(e % 11 == 1, F.lit("Evil Corp"))
               .when(e % 11 == 2, F.lit("Globex Industries"))
               .otherwise(F.concat(F.lit("Hays-"), (e % 3).cast("string"))))
    domain = (F.when(e % 13 == 0, F.lit("evil.example"))
              .otherwise(F.lit("jobs.example.com")))
    posted = F.element_at(F.array(*[F.lit(p) for p in _POSTED]),
                          (e % 13 + 1).cast("int"))
    return events.select(
        (e % 3).alias("tracked_id"), e.alias("hit_ord"),
        url.alias("url"), canon.alias("canonical_url"),
        title.alias("title"), company.alias("company"),
        domain.alias("company_domain"),
        F.md5((e % 23).cast("string")).alias("content_hash"),
        posted.alias("posted_at"),
        F.when(e % 2 == 0, F.lit("ats_board")).otherwise(F.lit("google_jobs"))
        .alias("source"))


_TITLE_SQL = ", ".join(
    "NULL" if t is None else "'" + t.replace("'", "''") + "'"
    for t in _TITLES)
_POSTED_SQL = ", ".join(
    "NULL" if p is None else f"'{p}'" for p in _POSTED)

SYNTH_REFRESH_HITS_SQL = f"""
    SELECT event_id % 3 AS tracked_id, event_id AS hit_ord,
           'https://Jobs.example.com/view/' || CAST(event_id % 17 AS VARCHAR)
               || (CASE WHEN event_id % 5 = 0 THEN '?src=raw' ELSE '' END)
               AS url,
           CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE 'https://jobs.example.com/view/'
                     || CAST(event_id % 17 AS VARCHAR) END AS canonical_url,
           ([{_TITLE_SQL}])[CAST(event_id % 8 + 1 AS INT)] AS title,
           CASE WHEN event_id % 11 = 0 THEN NULL
                WHEN event_id % 11 = 1 THEN 'Evil Corp'
                WHEN event_id % 11 = 2 THEN 'Globex Industries'
                ELSE 'Hays-' || CAST(event_id % 3 AS VARCHAR) END AS company,
           CASE WHEN event_id % 13 = 0 THEN 'evil.example'
                ELSE 'jobs.example.com' END AS company_domain,
           md5(CAST(event_id % 23 AS VARCHAR)) AS content_hash,
           ([{_POSTED_SQL}])[CAST(event_id % 13 + 1 AS INT)] AS posted_at,
           CASE WHEN event_id % 2 = 0 THEN 'ats_board'
                ELSE 'google_jobs' END AS source
    FROM events
"""

# UI exclusion rows: tracked 0 excludes a URL substring + a domain; tracked
# 1 excludes an exact company and carries an excluded_companies facet whose
# substring match catches 'Globex Industries'; tracked 2 has none.
EXCLUSION_ROWS = (
    (0, "url", "/view/3"),
    (0, "domain", "evil.example"),
    (1, "company", "evil corp"),
    (1, "facet_company", "Globex"),
)

EXCLUSIONS_SQL = ("SELECT * FROM (VALUES "
                  + ", ".join(f"({t}, '{k}', '{v}')"
                              for t, k, v in EXCLUSION_ROWS)
                  + ") AS x(tracked_id, kind, value)")

TRACKED_SQL = ("SELECT * FROM (VALUES (0, 14), (1, 7), (2, 30)) "
               "AS t(tracked_id, max_age_days)")


def synth_exclusions(spark) -> DataFrame:
    return spark.createDataFrame(list(EXCLUSION_ROWS),
                                 "tracked_id long, kind string, value string")


def synth_tracked(spark) -> DataFrame:
    return spark.createDataFrame([(0, 14), (1, 7), (2, 30)],
                                 "tracked_id long, max_age_days long")


def synth_history(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(existing_hashes, existing_urls) — hashes %23 ∈ {2, 9} were already
    persisted/delivered; canonical url stem 14 already exists for tracked 1."""
    e = F.col("event_id")
    hashes = (events.where(e % 23 == 2).select(
        (e % 3).alias("tracked_id"),
        F.md5(F.lit("2")).alias("content_hash"))
        .union(events.where(e % 23 == 9).select(
            (e % 3).alias("tracked_id"), F.md5(F.lit("9")))))
    urls = events.where(e % 50 == 0).select(
        F.lit(1).alias("tracked_id"),
        F.lit("https://jobs.example.com/view/14").alias("canonical_url"))
    return hashes.distinct(), urls.distinct()


HISTORY_HASHES_SQL = """
    SELECT DISTINCT event_id % 3 AS tracked_id, md5('2') AS content_hash
    FROM events WHERE event_id % 23 = 2
    UNION
    SELECT DISTINCT event_id % 3, md5('9') FROM events
    WHERE event_id % 23 = 9
"""

HISTORY_URLS_SQL = """
    SELECT DISTINCT 1 AS tracked_id,
           'https://jobs.example.com/view/14' AS canonical_url
    FROM events WHERE event_id % 50 = 0
"""


def synth_verdicts(events: DataFrame) -> DataFrame:
    """Classifier verdicts for a subset of hits: %4 rotates match /
    mismatch / unverifiable / missing-row (→ 'unverifiable' default)."""
    e = F.col("event_id")
    return events.where(e % 4 != 3).select(
        (e % 3).alias("tracked_id"), e.alias("hit_ord"),
        F.when(e % 4 == 0, F.lit("match"))
        .when(e % 4 == 1, F.lit("mismatch"))
        .otherwise(F.lit(None).cast("string")).alias("relevance"))


SYNTH_VERDICTS_SQL = """
    SELECT event_id % 3 AS tracked_id, event_id AS hit_ord,
           CASE WHEN event_id % 4 = 0 THEN 'match'
                WHEN event_id % 4 = 1 THEN 'mismatch' END AS relevance
    FROM events WHERE event_id % 4 <> 3
"""


def cascade_sql() -> str:
    """DuckDB twin of :func:`refresh_cascade` over the synthesizer tables
    (self-contained: inlines the synth CTEs, reads only ``events``)."""
    ukey = "lower(coalesce(canonical_url, url, ''))"
    tkey = role_title_key_sql("coalesce(title, '')")
    ckey = norm_key_sql("coalesce(company, '')")
    posted = posted_at_norm_sql("posted_at")
    return f"""
        WITH hits AS ({SYNTH_REFRESH_HITS_SQL}),
        excl AS ({EXCLUSIONS_SQL}),
        hist_h AS ({HISTORY_HASHES_SQL}),
        hist_u AS ({HISTORY_URLS_SQL}),
        tracked AS ({TRACKED_SQL}),
        h0 AS (
          SELECT *, {ukey} AS ukey,
                 CASE WHEN {tkey} <> '' AND {ckey} <> ''
                      THEN {tkey} || '|' || {ckey} END AS rkey
          FROM hits),
        h1 AS (
          SELECT *,
                 (ukey <> '' AND row_number() OVER (
                      PARTITION BY tracked_id, ukey ORDER BY hit_ord) > 1)
                     AS url_dup
          FROM h0),
        h2 AS (
          SELECT *,
                 (NOT url_dup AND rkey IS NOT NULL AND
                  sum(CASE WHEN url_dup THEN 0 ELSE 1 END) OVER (
                      PARTITION BY tracked_id, rkey ORDER BY hit_ord
                      ROWS UNBOUNDED PRECEDING) > 1) AS role_dup
          FROM h1),
        ex AS (
          SELECT tracked_id,
                 list(CASE WHEN kind = 'url'
                           THEN lower(trim(value)) END) AS x_url,
                 list(CASE WHEN kind = 'domain'
                           THEN lower(trim(value)) END) AS x_domain,
                 list(CASE WHEN kind = 'company'
                           THEN lower(trim(value)) END) AS x_company,
                 list(CASE WHEN kind = 'facet_company'
                           THEN lower(trim(value)) END) AS x_facet
          FROM excl GROUP BY tracked_id),
        h3 AS (
          SELECT h2.*,
                 coalesce(
                   len(list_filter(coalesce(ex.x_url, []),
                       u -> u IS NOT NULL AND u <> ''
                            AND contains(h2.ukey, u))) > 0
                   OR (lower(coalesce(h2.company_domain, '')) <> ''
                       AND list_contains(coalesce(ex.x_domain, []),
                           lower(coalesce(h2.company_domain, ''))))
                   OR (lower(coalesce(h2.company, '')) <> ''
                       AND (list_contains(coalesce(ex.x_company, []),
                                lower(coalesce(h2.company, '')))
                            OR len(list_filter(coalesce(ex.x_facet, []),
                                x -> x IS NOT NULL AND
                                     (lower(coalesce(h2.company, '')) = x
                                      OR contains(lower(coalesce(
                                             h2.company, '')), x)))) > 0)),
                   FALSE) AS excluded
          FROM h2 LEFT JOIN ex ON ex.tracked_id = h2.tracked_id),
        h4 AS (
          SELECT h3.*,
                 EXISTS (SELECT 1 FROM hist_h s
                         WHERE s.tracked_id = h3.tracked_id
                           AND s.content_hash = h3.content_hash)
                     AS seen_hash,
                 EXISTS (SELECT 1 FROM hist_u s
                         WHERE s.tracked_id = h3.tracked_id
                           AND lower(s.canonical_url) =
                               lower(coalesce(h3.canonical_url, ''))
                           AND lower(s.canonical_url) <> '') AS seen_url
          FROM h3),
        h5 AS (
          SELECT h4.*, ({posted}) AS posted_norm,
                 strftime(make_timestamp(CAST(
                     {NOW_EPOCH} - t.max_age_days * 86400 AS BIGINT) * 1000000),
                     '%Y-%m-%d %H:%M:%S') AS cutoff
          FROM h4 LEFT JOIN tracked t ON t.tracked_id = h4.tracked_id)
        SELECT tracked_id, hit_ord, title, company, source, posted_norm,
               CASE WHEN url_dup THEN 'url_dup'
                    WHEN role_dup THEN 'role_dup'
                    WHEN excluded THEN 'excluded'
                    WHEN seen_hash THEN 'seen_hash'
                    WHEN seen_url THEN 'seen_url'
                    WHEN posted_norm IS NULL OR posted_norm < cutoff
                    THEN 'stale'
                    ELSE 'kept' END AS disposition
        FROM h5
    """


# ---------------------------------------------------------------------------
# refresh task planning (:605-830): term merges, SERP composition,
# Perplexity fan-out, source merges — everything before the first network
# call is deterministic and lives here
# ---------------------------------------------------------------------------

_ATS_PROVIDERS = ("greenhouse", "lever", "ashby")
LOCATION_ANY = ("remote", "anywhere", "worldwide", "global", "any")


def _ci_dedupe_arr(arr: Column) -> Column:
    """Order-preserving case-insensitive dedupe of a string array with strip,
    dropping blanks — the reference's seen-set loop (:607-617, :632-638).
    Pure HOF fold: no explode, no shuffle."""
    stripped = F.filter(
        F.transform(arr, lambda x: F.trim(F.coalesce(x, F.lit("")))),
        lambda x: x != "")
    return F.aggregate(
        stripped,
        F.struct(F.array().cast("array<string>").alias("seen"),
                 F.array().cast("array<string>").alias("out")),
        lambda acc, x: F.when(
            F.array_contains(acc["seen"], F.lower(x)), acc)
        .otherwise(F.struct(
            F.array_append(acc["seen"], F.lower(x)).alias("seen"),
            F.array_append(acc["out"], x).alias("out"))),
        lambda acc: acc["out"])


def _ci_dedupe_sql(expr: str) -> str:
    """DuckDB twin of :func:`_ci_dedupe_arr` (window-based first-occurrence
    over an unnested list — same output order)."""
    return f"""(
        SELECT coalesce(list(v ORDER BY o), [])
        FROM (
          SELECT v, o, row_number() OVER (
                     PARTITION BY lower(v) ORDER BY o) AS rn
          FROM (SELECT trim(u.x) AS v, u.o
                FROM unnest({expr}) WITH ORDINALITY AS u(x, o))
          WHERE v <> '')
        WHERE rn = 1)"""


def _variations_arr(base: Column, location: Column,
                    remote_only: Column) -> Column:
    """build_query_variations (job_search_service.py:960-983) as an array
    column — [] when the primary keyword is blank."""
    b = F.trim(F.coalesce(base, F.lit("")))
    where = F.trim(F.coalesce(location, F.lit("")))
    wp = F.when((where != "") & ~F.lower(where).isin(*LOCATION_ANY),
                F.concat(F.lit(" "), where)).otherwise(F.lit(""))
    rs = F.when(remote_only, F.lit(" remote")).otherwise(F.lit(""))
    return F.when(b == "", F.array().cast("array<string>")).otherwise(
        F.array(F.concat(b, rs, F.lit(" jobs"), wp),
                F.concat(b, F.lit(" careers page"), wp),
                F.concat(b, rs, F.lit(" hiring"), wp),
                F.concat(b, rs, F.lit(" job opening"), wp),
                F.concat(b, rs, F.lit(" apply"), wp)))


def _variations_sql(base: str, location: str, remote: str) -> str:
    b = f"trim(coalesce({base}, ''))"
    where = f"trim(coalesce({location}, ''))"
    anyset = ", ".join(f"'{a}'" for a in LOCATION_ANY)
    wp = (f"CASE WHEN {where} <> '' AND lower({where}) NOT IN ({anyset}) "
          f"THEN ' ' || {where} ELSE '' END")
    rs = f"CASE WHEN {remote} THEN ' remote' ELSE '' END"
    return (f"CASE WHEN {b} = '' THEN CAST([] AS VARCHAR[]) ELSE ["
            f"{b} || {rs} || ' jobs' || {wp}, "
            f"{b} || ' careers page' || {wp}, "
            f"{b} || {rs} || ' hiring' || {wp}, "
            f"{b} || {rs} || ' job opening' || {wp}, "
            f"{b} || {rs} || ' apply' || {wp}] END")


def _site_queries_arr(keywords: Column, location: Column,
                      domains: Column) -> Column:
    """build_site_targeted_queries (job_search_service.py:985-1015):
    per-keyword (first 3 non-blank) LinkedIn `site:` queries plus one
    OR-of-`site:` query over the first 4 discovered boards; the
    remote-ish location names are blanked before templating."""
    where = F.trim(F.coalesce(location, F.lit("")))
    where = F.when(F.lower(where).isin(*LOCATION_ANY), F.lit("")) \
        .otherwise(where)
    kws = F.slice(F.filter(
        F.transform(keywords, lambda k: F.trim(F.coalesce(k, F.lit("")))),
        lambda k: k != ""), 1, 3)
    li = F.transform(
        kws, lambda k: F.regexp_replace(
            F.trim(F.concat(k, F.lit(" "), where,
                            F.lit(" site:linkedin.com/jobs"))),
            r"\s+", " "))
    boards = F.slice(F.filter(F.coalesce(
        domains, F.array().cast("array<string>")),
        lambda d: F.coalesce(d, F.lit("")) != ""), 1, 4)
    site_expr = F.array_join(
        F.transform(boards, lambda b: F.concat(F.lit("site:"), b)),
        " OR ")
    board_q = F.when(
        (F.size(boards) > 0) & (F.size(kws) > 0),
        F.array(F.regexp_replace(
            F.trim(F.concat(F.try_element_at(kws, F.lit(1)),
                            F.lit(" "), where,
                            F.lit(" "), site_expr)),
            r"\s+", " "))).otherwise(F.array().cast("array<string>"))
    return F.when(F.size(kws) == 0, F.array().cast("array<string>")) \
        .otherwise(F.concat(li, board_q))


def _site_queries_sql(keywords: str, location: str, domains: str) -> str:
    anyset = ", ".join(f"'{a}'" for a in LOCATION_ANY)
    where = (f"CASE WHEN lower(trim(coalesce({location}, ''))) IN ({anyset}) "
             f"THEN '' ELSE trim(coalesce({location}, '')) END")
    kws = (f"list_slice(list_filter(list_transform({keywords}, "
           f"k -> trim(coalesce(k, ''))), k -> k <> ''), 1, 3)")
    li = (f"list_transform({kws}, k -> regexp_replace(trim("
          f"k || ' ' || {where} || ' site:linkedin.com/jobs'), "
          f"'\\s+', ' ', 'g'))")
    boards = (f"list_slice(list_filter(coalesce({domains}, []), "
              f"d -> coalesce(d, '') <> ''), 1, 4)")
    site_expr = (f"list_aggr(list_transform({boards}, "
                 f"b -> 'site:' || b), 'string_agg', ' OR ')")
    board_q = (f"CASE WHEN len({boards}) > 0 AND len({kws}) > 0 THEN "
               f"[regexp_replace(trim({kws}[1] || ' ' || {where} || ' ' || "
               f"{site_expr}), '\\s+', ' ', 'g')] "
               f"ELSE CAST([] AS VARCHAR[]) END")
    return (f"CASE WHEN len({kws}) = 0 THEN CAST([] AS VARCHAR[]) "
            f"ELSE list_concat({li}, {board_q}) END")


_TASK_ARR_T = ("array<struct<task_ord:int,source_name:string,"
               "model:string,limit:int,payload:string>>")


def refresh_task_plan(tracked: DataFrame) -> DataFrame:
    """The refresh fan-out plan (:605-830) per tracked job, one row per
    task the pipeline would spawn, in spawn order:

    - google_jobs (flag default TRUE) searches the user's ORIGINAL
      keywords, not the expanded set (:672-680 — Google's own synonym
      engine covers the expansion), limit 30;
    - google_serp (default TRUE, only when queries exist): site-targeted
      queries PREPENDED to the merged Haiku∪default variations minus
      exact-string site-query dups, capped at 8, limit 10/query;
    - perplexity: the ORIGINAL keywords chunked in 3s (fix 2026-07-25 —
      a single call silently searched only keywords[:3]), up to 6 chunks
      named perplexity_primary / perplexity_kw_N, model sonar-pro on a
      first/forced full discovery else sonar, limit 7; then up to 3
      variation calls perplexity_var_N on sonar, limit 5;
    - ats_boards whenever any are configured ("free, structured, earlier
      than any board" :745-747).

    Careers/RSS source merges share the same CI-dedupe (per-tracked URLs
    first so user overrides win ties, :756-789) and are modeled by the
    merged payload on their rows (flags default FALSE).

    Input ``tracked`` carries array columns (keywords, expanded_keywords,
    query_phrasings, discovered_domains, ats_boards, ats_defaults,
    careers_page_urls, careers_defaults, rss_feed_urls, rss_defaults) and
    scalars (location, remote_only, force_full_discovery,
    last_refreshed_at, src_google_jobs/serp/perplexity/ats/careers/rss).
    Entirely HOF folds on broadcast-sized arrays — one map-side pass.
    """
    t = tracked
    terms = _ci_dedupe_arr(F.concat(F.col("keywords"),
                                    F.col("expanded_keywords")))
    primary = F.coalesce(F.try_element_at(F.col("keywords"), F.lit(1)),
                         F.try_element_at(terms, F.lit(1)), F.lit(""))
    variations = _ci_dedupe_arr(F.concat(
        F.col("query_phrasings"),
        _variations_arr(primary, F.col("location"), F.col("remote_only"))))
    # site-targeted queries only for location-scoped searches (:689-692)
    geo = ((F.coalesce(F.col("country_code"), F.lit("")) != "")
           | (F.coalesce(F.col("location"), F.lit("")) != ""))
    site_q = F.when(
        geo, _site_queries_arr(F.col("keywords"), F.col("location"),
                               F.col("discovered_domains"))) \
        .otherwise(F.array().cast("array<string>"))
    serp_q = F.slice(
        F.concat(site_q,
                 F.filter(variations,
                          lambda v: ~F.array_contains(site_q, v))),
        1, 8)
    merged_ats = _ci_dedupe_arr(F.concat(F.col("ats_boards"),
                                         F.col("ats_defaults")))
    merged_careers = _ci_dedupe_arr(F.concat(F.col("careers_page_urls"),
                                             F.col("careers_defaults")))
    merged_rss = _ci_dedupe_arr(F.concat(F.col("rss_feed_urls"),
                                         F.col("rss_defaults")))
    model_primary = F.when(
        F.col("force_full_discovery") | F.col("last_refreshed_at").isNull(),
        F.lit("sonar-pro")).otherwise(F.lit("sonar"))

    kw_chunks = F.transform(
        F.sequence(F.lit(0),
                   F.greatest((F.ceil(F.size("keywords") / 3) - 1).cast("int"),
                              F.lit(0))),
        lambda i: F.slice(F.col("keywords"), i * 3 + 1, 3))
    # empty keywords -> one chunk of all_search_terms[:3] (:717)
    kw_chunks = F.when(F.size("keywords") == 0,
                       F.array(F.slice(terms, 1, 3))).otherwise(kw_chunks)
    kw_chunks = F.slice(kw_chunks, 1, 6)

    base = t.select(
        "tracked_id", "src_google_jobs", "src_google_serp",
        "src_perplexity", "src_ats", "src_careers", "src_rss",
        F.col("keywords").alias("_kw"), terms.alias("_terms"),
        variations.alias("_vars"), serp_q.alias("_serp"),
        merged_ats.alias("_ats"), merged_careers.alias("_careers"),
        merged_rss.alias("_rss"), model_primary.alias("_model"),
        kw_chunks.alias("_chunks"))

    _ = _TASK_ARR_T  # keep the shared task row type close to its uses

    def task(ord_, name, model, limit, payload):
        return F.struct(F.lit(ord_).alias("task_ord"),
                        name.alias("source_name")
                        if isinstance(name, Column)
                        else F.lit(name).alias("source_name"),
                        model if isinstance(model, Column)
                        else F.lit(model).alias("model"),
                        F.lit(limit).alias("limit"),
                        payload.alias("payload"))

    gj = F.when(F.col("src_google_jobs"),
                F.array(task(0, "google_jobs", F.lit(None).cast("string")
                             .alias("model"), 30,
                             F.array_join("_kw", "|")))) \
        .otherwise(F.array().cast(_TASK_ARR_T))
    serp = F.when(F.col("src_google_serp") & (F.size("_serp") > 0),
                  F.array(task(1, "google_serp", F.lit(None).cast("string")
                               .alias("model"), 10,
                               F.array_join("_serp", "|")))) \
        .otherwise(F.array().cast(_TASK_ARR_T))
    chunks = F.when(
        F.col("src_perplexity"),
        F.zip_with(
            F.col("_chunks"),
            F.sequence(F.lit(0), F.size("_chunks") - 1),
            lambda c, i: F.struct(
                (i + 2).cast("int").alias("task_ord"),
                F.when(i == 0, F.lit("perplexity_primary"))
                .otherwise(F.concat(F.lit("perplexity_kw_"),
                                    (i + 1).cast("string")))
                .alias("source_name"),
                F.col("_model").alias("model"),
                F.lit(7).alias("limit"),
                F.array_join(c, "|").alias("payload")))) \
        .otherwise(F.array().cast(_TASK_ARR_T))
    var3 = F.slice("_vars", 1, 3)
    pvars = F.when(
        F.col("src_perplexity"),
        F.zip_with(
            var3, F.sequence(F.lit(0),
                             F.greatest(F.size(var3) - 1, F.lit(0))),
            lambda v, i: F.struct(
                (i + 10).cast("int").alias("task_ord"),
                F.concat(F.lit("perplexity_var_"), (i + 1).cast("string"))
                .alias("source_name"),
                F.lit("sonar").alias("model"),
                F.lit(5).alias("limit"),
                v.alias("payload")))) \
        .otherwise(F.array().cast(_TASK_ARR_T))
    pvars = F.filter(pvars, lambda s: s["payload"].isNotNull())
    ats = F.when(F.col("src_ats") & (F.size("_ats") > 0),
                 F.array(task(20, "ats_boards",
                              F.lit(None).cast("string").alias("model"), 0,
                              F.array_join("_ats", "|")))) \
        .otherwise(F.array().cast(_TASK_ARR_T))
    careers = F.when(F.col("src_careers") & (F.size("_careers") > 0),
                     F.array(task(21, "careers_pages",
                                  F.lit(None).cast("string").alias("model"),
                                  0, F.array_join("_careers", "|")))) \
        .otherwise(F.array().cast(_TASK_ARR_T))
    rss = F.when(F.col("src_rss") & (F.size("_rss") > 0),
                 F.array(task(22, "rss_feeds",
                              F.lit(None).cast("string").alias("model"), 0,
                              F.array_join("_rss", "|")))) \
        .otherwise(F.array().cast(_TASK_ARR_T))
    tasks = F.concat(gj, serp, chunks, pvars, ats, careers, rss)
    out = base.select("tracked_id",
                      F.explode(tasks).alias("t"))
    return out.select("tracked_id", F.col("t.task_ord").alias("task_ord"),
                      F.col("t.source_name").alias("source_name"),
                      F.col("t.model").alias("model"),
                      F.col("t.limit").alias("task_limit"),
                      F.col("t.payload").alias("payload"))


def synth_tracked_plans(events: DataFrame) -> DataFrame:
    """Tracked-job configs covering every task-plan branch: empty/blank/
    ci-duplicated keyword lists, 7-keyword 3-chunk fan-outs, Haiku
    phrasings that exactly duplicate a default variation, remote-ish
    locations, board lists with case-differing per-tracked/global dups."""
    t = F.col("event_id")

    def arr(*xs):
        return F.array(*[F.lit(x) for x in xs])

    empty = F.array().cast("array<string>")
    kw = (F.when(t % 7 == 0, empty)
          .when(t % 7 == 1, arr("Product Manager"))
          .when(t % 7 == 2, arr("Product Manager", "product manager ",
                                "Vibe Coder"))
          .when(t % 7 == 3, arr("PM", "Product Builder", "Vibe Coder",
                                "Growth PM"))
          .when(t % 7 == 4, arr(" ", ""))
          .when(t % 7 == 5, arr("k0", "k1", "k2", "k3", "k4", "k5", "k6"))
          .otherwise(arr("Data Engineer", "ML Engineer")))
    exp = (F.when(t % 5 == 0, empty)
           .when(t % 5 == 1, arr("product manager", "Product Owner"))
           .when(t % 5 == 2, arr("Senior PM"))
           .when(t % 5 == 3, arr("VIBE CODER", "Platform PM"))
           .otherwise(arr("PM Lead", " ")))
    phr = (F.when(t % 4 == 0, empty)
           .when(t % 4 == 1, arr("best product manager openings"))
           .when(t % 4 == 2, arr("Product Manager jobs Athens",
                                 "pm hiring now"))
           .otherwise(arr("find pm roles")))
    loc = (F.when(t % 6 == 0, F.lit("Remote"))
           .when(t % 6 == 1, F.lit("Athens"))
           .when(t % 6 == 2, F.lit(""))
           .when(t % 6 == 3, F.lit(None).cast("string"))
           .when(t % 6 == 4, F.lit("Berlin"))
           .otherwise(F.lit("anywhere")))
    cc = F.when(t % 3 == 1, F.lit("GR")).otherwise(F.lit(None).cast("string"))
    dom = (F.when(t % 5 == 0, arr("jobs.gr", "kariera.gr", "",
                                  "skywalker.gr", "extra.gr"))
           .when(t % 5 == 1, empty)
           .otherwise(arr("boards.example")))
    ats_t = F.when(t % 3 == 0, arr("greenhouse:stripe",
                                   "https://boards.greenhouse.io/acme")) \
        .otherwise(empty)
    ats_d = F.when(t % 2 == 0, arr("GREENHOUSE:STRIPE", "lever:zoom")) \
        .otherwise(empty)
    careers_t = F.when(t % 4 == 1, arr("https://x.com/careers")) \
        .otherwise(empty)
    careers_d = arr("https://remoteok.com/remote-jobs")
    rss_t = F.when(t % 4 == 2, arr("https://remotive.com/feed")) \
        .otherwise(empty)
    rss_d = arr("https://jobspresso.co/?feed=job_feed")
    return events.select(
        t.alias("tracked_id"), kw.alias("keywords"),
        exp.alias("expanded_keywords"), phr.alias("query_phrasings"),
        loc.alias("location"), cc.alias("country_code"),
        (t % 2 == 0).alias("remote_only"),
        (t % 3 == 0).alias("force_full_discovery"),
        F.when(t % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("2026-08-01")).alias("last_refreshed_at"),
        dom.alias("discovered_domains"),
        ats_t.alias("ats_boards"), ats_d.alias("ats_defaults"),
        careers_t.alias("careers_page_urls"),
        careers_d.alias("careers_defaults"),
        rss_t.alias("rss_feed_urls"), rss_d.alias("rss_defaults"),
        (t % 8 != 1).alias("src_google_jobs"),
        (t % 8 != 2).alias("src_google_serp"),
        (t % 8 != 3).alias("src_perplexity"),
        (t % 8 != 4).alias("src_ats"),
        ((t % 4 == 1) | (t % 8 == 5)).alias("src_careers"),
        (t % 4 == 2).alias("src_rss"))


def _sql_arr(*xs: str) -> str:
    return "[" + ", ".join(f"'{x}'" for x in xs) + "]"


SYNTH_TRACKED_PLANS_SQL = f"""
    SELECT event_id AS tracked_id,
           CASE WHEN event_id % 7 = 0 THEN CAST([] AS VARCHAR[])
                WHEN event_id % 7 = 1 THEN {_sql_arr('Product Manager')}
                WHEN event_id % 7 = 2
                THEN {_sql_arr('Product Manager', 'product manager ',
                               'Vibe Coder')}
                WHEN event_id % 7 = 3
                THEN {_sql_arr('PM', 'Product Builder', 'Vibe Coder',
                               'Growth PM')}
                WHEN event_id % 7 = 4 THEN [' ', '']
                WHEN event_id % 7 = 5
                THEN {_sql_arr('k0', 'k1', 'k2', 'k3', 'k4', 'k5', 'k6')}
                ELSE {_sql_arr('Data Engineer', 'ML Engineer')}
           END AS keywords,
           CASE WHEN event_id % 5 = 0 THEN CAST([] AS VARCHAR[])
                WHEN event_id % 5 = 1
                THEN {_sql_arr('product manager', 'Product Owner')}
                WHEN event_id % 5 = 2 THEN {_sql_arr('Senior PM')}
                WHEN event_id % 5 = 3
                THEN {_sql_arr('VIBE CODER', 'Platform PM')}
                ELSE ['PM Lead', ' ']
           END AS expanded_keywords,
           CASE WHEN event_id % 4 = 0 THEN CAST([] AS VARCHAR[])
                WHEN event_id % 4 = 1
                THEN {_sql_arr('best product manager openings')}
                WHEN event_id % 4 = 2
                THEN {_sql_arr('Product Manager jobs Athens',
                               'pm hiring now')}
                ELSE {_sql_arr('find pm roles')}
           END AS query_phrasings,
           CASE WHEN event_id % 6 = 0 THEN 'Remote'
                WHEN event_id % 6 = 1 THEN 'Athens'
                WHEN event_id % 6 = 2 THEN ''
                WHEN event_id % 6 = 3 THEN NULL
                WHEN event_id % 6 = 4 THEN 'Berlin'
                ELSE 'anywhere' END AS location,
           CASE WHEN event_id % 3 = 1 THEN 'GR' END AS country_code,
           event_id % 2 = 0 AS remote_only,
           event_id % 3 = 0 AS force_full_discovery,
           CASE WHEN event_id % 4 = 0 THEN NULL
                ELSE '2026-08-01' END AS last_refreshed_at,
           CASE WHEN event_id % 5 = 0
                THEN {_sql_arr('jobs.gr', 'kariera.gr', '', 'skywalker.gr',
                               'extra.gr')}
                WHEN event_id % 5 = 1 THEN CAST([] AS VARCHAR[])
                ELSE {_sql_arr('boards.example')}
           END AS discovered_domains,
           CASE WHEN event_id % 3 = 0
                THEN {_sql_arr('greenhouse:stripe',
                               'https://boards.greenhouse.io/acme')}
                ELSE CAST([] AS VARCHAR[]) END AS ats_boards,
           CASE WHEN event_id % 2 = 0
                THEN {_sql_arr('GREENHOUSE:STRIPE', 'lever:zoom')}
                ELSE CAST([] AS VARCHAR[]) END AS ats_defaults,
           CASE WHEN event_id % 4 = 1 THEN {_sql_arr('https://x.com/careers')}
                ELSE CAST([] AS VARCHAR[]) END AS careers_page_urls,
           {_sql_arr('https://remoteok.com/remote-jobs')} AS careers_defaults,
           CASE WHEN event_id % 4 = 2
                THEN {_sql_arr('https://remotive.com/feed')}
                ELSE CAST([] AS VARCHAR[]) END AS rss_feed_urls,
           {_sql_arr('https://jobspresso.co/?feed=job_feed')} AS rss_defaults,
           event_id % 8 <> 1 AS src_google_jobs,
           event_id % 8 <> 2 AS src_google_serp,
           event_id % 8 <> 3 AS src_perplexity,
           event_id % 8 <> 4 AS src_ats,
           (event_id % 4 = 1 OR event_id % 8 = 5) AS src_careers,
           event_id % 4 = 2 AS src_rss
    FROM events
"""


def _dedupe_list_sql(expr: str) -> str:
    """CI first-occurrence dedupe of a VARCHAR[] in DuckDB (index-lambda
    list_position trick — O(n²) on human-sized lists)."""
    lt = (f"list_filter(list_transform({expr}, "
          f"x -> trim(coalesce(x, ''))), x -> x <> '')")
    return (f"list_filter({lt}, (x, i) -> list_position("
            f"list_transform({lt}, y -> lower(y)), lower(x)) = i)")


def plan_sql() -> str:
    """DuckDB twin of :func:`refresh_task_plan` over
    ``SYNTH_TRACKED_PLANS_SQL`` (generated from the same constants)."""
    _careers_dd = _dedupe_list_sql(
        "careers_page_urls || careers_defaults")
    terms = _dedupe_list_sql("keywords || expanded_keywords")
    primary = f"coalesce(keywords[1], ({terms})[1], '')"
    variations = _dedupe_list_sql(
        f"query_phrasings || "
        f"({_variations_sql(primary, 'location', 'remote_only')})")
    site_inner = _site_queries_sql("keywords", "location",
                                   "discovered_domains")
    site = (f"CASE WHEN coalesce(country_code, '') <> '' "
            f"OR coalesce(location, '') <> '' THEN ({site_inner}) "
            f"ELSE CAST([] AS VARCHAR[]) END")
    serp = (f"list_slice(s.site_q || list_filter(s.vars_q, "
            f"v -> NOT list_contains(s.site_q, v)), 1, 8)")
    chunks = ("CASE WHEN len(keywords) = 0 "
              "THEN [list_slice(s.terms_q, 1, 3)] "
              "ELSE list_slice(list_transform("
              "generate_series(0, CAST(ceil(len(keywords) / 3.0) "
              "AS INT) - 1), i -> keywords[i * 3 + 1 : i * 3 + 3]), "
              "1, 6) END")
    return f"""
        WITH tr AS ({SYNTH_TRACKED_PLANS_SQL}),
        s AS (
          SELECT tr.*, ({terms}) AS terms_q, ({variations}) AS vars_q,
                 ({site}) AS site_q,
                 ({_dedupe_list_sql('ats_boards || ats_defaults')}) AS ats_q,
                 ({_careers_dd}) AS careers_q,
                 ({_dedupe_list_sql('rss_feed_urls || rss_defaults')})
                     AS rss_q,
                 CASE WHEN force_full_discovery
                           OR last_refreshed_at IS NULL
                      THEN 'sonar-pro' ELSE 'sonar' END AS model_primary
          FROM tr),
        s2 AS (SELECT s.*, ({serp}) AS serp_q, ({chunks}) AS chunks_q
               FROM s),
        tasks AS (
          SELECT tracked_id, 0 AS task_ord, 'google_jobs' AS source_name,
                 CAST(NULL AS VARCHAR) AS model, 30 AS task_limit,
                 list_aggr(keywords, 'string_agg', '|') AS payload
          FROM s2 WHERE src_google_jobs
          UNION ALL
          SELECT tracked_id, 1, 'google_serp', NULL, 10,
                 list_aggr(serp_q, 'string_agg', '|')
          FROM s2 WHERE src_google_serp AND len(serp_q) > 0
          UNION ALL
          SELECT tracked_id, CAST(i + 1 AS INT),
                 CASE WHEN i = 1 THEN 'perplexity_primary'
                      ELSE 'perplexity_kw_' || CAST(i AS VARCHAR) END,
                 model_primary, 7,
                 list_aggr(chunks_q[i], 'string_agg', '|')
          FROM s2, unnest(generate_series(1, len(chunks_q))) u(i)
          WHERE src_perplexity
          UNION ALL
          SELECT tracked_id, CAST(i + 9 AS INT),
                 'perplexity_var_' || CAST(i AS VARCHAR), 'sonar', 5,
                 vars_q[i]
          FROM s2, unnest(generate_series(1, least(len(vars_q), 3))) u(i)
          WHERE src_perplexity
          UNION ALL
          SELECT tracked_id, 20, 'ats_boards', NULL, 0,
                 list_aggr(ats_q, 'string_agg', '|')
          FROM s2 WHERE src_ats AND len(ats_q) > 0
          UNION ALL
          SELECT tracked_id, 21, 'careers_pages', NULL, 0,
                 list_aggr(careers_q, 'string_agg', '|')
          FROM s2 WHERE src_careers AND len(careers_q) > 0
          UNION ALL
          SELECT tracked_id, 22, 'rss_feeds', NULL, 0,
                 list_aggr(rss_q, 'string_agg', '|')
          FROM s2 WHERE src_rss AND len(rss_q) > 0)
        SELECT tracked_id, task_ord, source_name, model, task_limit,
               coalesce(payload, '') AS payload
        FROM tasks
    """


# ---------------------------------------------------------------------------
# RSS->Firecrawl fallback plan (:858-885, _feed_to_page_url :150-166) and
# the per-source transparency report (:888-930)
# ---------------------------------------------------------------------------

def feed_to_page_col(feed: Column) -> Column:
    """_feed_to_page_url (:150-166): best-effort HTML listing page for a
    feed URL — drop query/fragment, strip .rss/.xml/.atom and trailing
    /feed|/rss|/atom segments, rstrip '/'; NULL when nothing remains."""
    u = F.trim(F.coalesce(feed, F.lit("")))
    u = F.regexp_replace(u, r"[?#].*$", "")
    u = F.regexp_replace(u, r"(?i)\.(rss|xml|atom)$", "")
    u = F.regexp_replace(u, r"(?i)/(feed|rss|atom)/?$", "")
    u = F.regexp_replace(u, r"/+$", "")
    return F.nullif(u, F.lit(""))


def feed_to_page_sql(expr: str) -> str:
    u = f"trim(coalesce({expr}, ''))"
    u = f"regexp_replace({u}, '[?#].*$', '')"
    u = f"regexp_replace({u}, '(?i)\\.(rss|xml|atom)$', '')"
    u = f"regexp_replace({u}, '(?i)/(feed|rss|atom)/?$', '')"
    u = f"regexp_replace({u}, '/+$', '')"
    return f"nullif({u}, '')"


def feed_fallback_plan(feeds: DataFrame, careers: DataFrame) -> DataFrame:
    """The cross-method fallback map (:858-872): every configured feed
    that returned nothing is retried via Firecrawl against its derived
    HTML page — unless the page is already a configured careers page
    (case-insensitive) or an EARLIER empty feed already claimed the same
    page (the reference's ``_p not in _page_for.values()`` is
    case-SENSITIVE — pinned). ``feeds``: (tracked_id, feed_ord, feed_url,
    hits); ``careers``: (tracked_id, url)."""
    # round 6: the careers-coverage check is an ANTI-JOIN on
    # (tracked_id, lowered url), not a broadcast collect_list +
    # array_contains — the old shape force-broadcast an unbounded
    # per-tracked aggregate AND scanned the whole careers list per feed
    # row (quadratic in per-tracked fan-out; measured 74.8 s at 10x
    # data vs 2 s at 1x). Identical row gate.
    ckeys = (careers.select(
        "tracked_id", F.lower(F.trim(F.col("url"))).alias("_curl"))
        .distinct())
    fbase = (feeds.where(F.col("hits") == 0)
             .withColumn("page_url", feed_to_page_col(F.col("feed_url")))
             .where(F.col("page_url").isNotNull()))
    f = fbase.join(
        ckeys, (fbase["tracked_id"] == ckeys["tracked_id"])
        & (F.lower(fbase["page_url"]) == ckeys["_curl"]), "left_anti")
    w = Window.partitionBy("tracked_id", "page_url").orderBy("feed_ord")
    return (f.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("tracked_id", "feed_ord", "feed_url", "page_url"))


def parse_ats_key_col(entry: Column) -> Column:
    """parse_ats_entry (job_search_service.py:1837-1857) as a column:
    'provider:slug' (provider whitelisted, slug slash-stripped) else the
    greenhouse/lever/ashby URL forms; NULL when unrecognised."""
    e = F.trim(F.coalesce(entry, F.lit("")))
    prov = F.lower(F.trim(F.substring_index(e, ":", 1)))
    rest = F.regexp_extract(e, r"^[^:]*:(.*)$", 1)
    slug = F.regexp_replace(F.trim(rest), r"^/+|/+$", "")
    colon_ok = (~F.lower(e).startswith("http") & e.contains(":")
                & prov.isin(*_ATS_PROVIDERS) & (slug != ""))
    gh = F.regexp_extract(e, r"(?i)greenhouse\.io/(?:v1/boards/)?([^/?#]+)",
                          1)
    lv = F.regexp_extract(e, r"(?i)lever\.co/(?:v0/postings/)?([^/?#]+)", 1)
    ab = F.regexp_extract(
        e, r"(?i)ashbyhq\.com/(?:posting-api/job-board/)?([^/?#]+)", 1)
    return (F.when(colon_ok, F.concat(prov, F.lit(":"), slug))
            .when(gh != "", F.concat(F.lit("greenhouse:"), gh))
            .when(lv != "", F.concat(F.lit("lever:"), lv))
            .when(ab != "", F.concat(F.lit("ashby:"), ab)))


def parse_ats_key_sql(expr: str) -> str:
    e = f"trim(coalesce({expr}, ''))"
    prov = f"lower(trim(string_split({e}, ':')[1]))"
    rest = f"regexp_extract({e}, '^[^:]*:(.*)$', 1)"
    slug = f"regexp_replace(trim({rest}), '^/+|/+$', '', 'g')"
    provs = ", ".join(f"'{p}'" for p in _ATS_PROVIDERS)
    colon_ok = (f"(NOT lower({e}) LIKE 'http%' AND contains({e}, ':') "
                f"AND {prov} IN ({provs}) AND {slug} <> '')")
    gh = f"regexp_extract({e}, '(?i)greenhouse\\.io/(?:v1/boards/)?([^/?#]+)', 1)"
    lv = f"regexp_extract({e}, '(?i)lever\\.co/(?:v0/postings/)?([^/?#]+)', 1)"
    ab = (f"regexp_extract({e}, "
          f"'(?i)ashbyhq\\.com/(?:posting-api/job-board/)?([^/?#]+)', 1)")
    return (f"CASE WHEN {colon_ok} THEN {prov} || ':' || {slug} "
            f"WHEN {gh} <> '' THEN 'greenhouse:' || {gh} "
            f"WHEN {lv} <> '' THEN 'lever:' || {lv} "
            f"WHEN {ab} <> '' THEN 'ashby:' || {ab} END")


def source_report(careers: DataFrame, rss: DataFrame, ats: DataFrame,
                  api: DataFrame) -> DataFrame:
    """PER-SOURCE TRANSPARENCY (:888-930): one report row per configured
    board/feed/ATS entry/API source — ESPECIALLY the zeros — so a
    silently-dead source is never hidden inside an aggregate total.

    - careers (section 0): key = url; empty when 0 hits;
    - rss (section 1): a dead feed recovered via the Firecrawl fallback
      reports ``url (recovered via firecrawl)`` with the FALLBACK count
      and is NOT empty; otherwise empty feeds carry the
      ``(rss AND firecrawl fallback both empty)`` suffix only when a
      fallback was actually attempted;
    - ats (section 2): key = ``ats:provider:slug`` (parse_ats_entry) or
      ``ats:raw-entry`` when unparseable;
    - api (section 3): 'careers_pages'/'rss_feeds' aggregates are
      SKIPPED (their per-URL rows already reported); -1 means the call
      raised -> ``name (failed)``.

    All four sections are map-only projections unioned by name."""
    c = careers.select(
        "tracked_id", F.lit(0).alias("section_ord"),
        F.col("ord").alias("item_ord"), F.col("url").alias("report_key"),
        F.col("hits").cast("long").alias("reported_count"),
        F.when(F.col("hits") == 0, F.col("url")).alias("empty_label"))
    recovered = (F.col("hits") == 0) & (F.col("fallback_hits") > 0)
    r = rss.select(
        "tracked_id", F.lit(1).alias("section_ord"),
        F.col("ord").alias("item_ord"),
        F.when(recovered,
               F.concat(F.col("url"), F.lit(" (recovered via firecrawl)")))
        .otherwise(F.col("url")).alias("report_key"),
        F.when(recovered, F.col("fallback_hits")).otherwise(F.col("hits"))
        .cast("long").alias("reported_count"),
        F.when((F.col("hits") == 0) & ~recovered,
               F.concat(F.col("url"),
                        F.when(F.col("fallback_attempted"),
                               F.lit(" (rss AND firecrawl fallback"
                                     " both empty)"))
                        .otherwise(F.lit("")))).alias("empty_label"))
    akey = F.concat(F.lit("ats:"),
                    F.coalesce(parse_ats_key_col(F.col("entry")),
                               F.col("entry")))
    a = ats.select(
        "tracked_id", F.lit(2).alias("section_ord"),
        F.col("ord").alias("item_ord"), akey.alias("report_key"),
        F.col("hits").cast("long").alias("reported_count"),
        F.when(F.col("hits") == 0, akey).alias("empty_label"))
    p = (api.where(~F.col("name").isin("careers_pages", "rss_feeds"))
         .select(
             "tracked_id", F.lit(3).alias("section_ord"),
             F.col("ord").alias("item_ord"),
             F.col("name").alias("report_key"),
             F.col("count").cast("long").alias("reported_count"),
             F.when(F.col("count") == 0, F.col("name"))
             .when(F.col("count") == -1,
                   F.concat(F.col("name"), F.lit(" (failed)")))
             .alias("empty_label")))
    return c.unionByName(r).unionByName(a).unionByName(p)


# --- synthesizers + twins for the fallback/report contract ---------------

def synth_feed_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    feed = (F.when(e % 6 == 0,
                   F.lit("https://remoteok.com/remote-jobs.rss"))
            .when(e % 6 == 1, F.lit("https://remotive.com/remote-jobs/feed"))
            .when(e % 6 == 2, F.lit("https://jobspresso.co/?feed=job_feed"))
            .when(e % 6 == 3,
                  F.lit("https://boards.example.com/jobs.XML"))
            .when(e % 6 == 4,
                  F.lit("https://remoteok.com/remote-jobs.rss/"))
            .otherwise(F.lit("https://live.example.com/feed")))
    return events.select(
        (e % 4).alias("tracked_id"), e.alias("feed_ord"),
        feed.alias("feed_url"),
        F.when(e % 5 == 0, F.lit(3)).otherwise(F.lit(0)).alias("hits"),
        F.when(e % 7 == 0, F.lit(2)).otherwise(F.lit(0))
        .alias("fallback_hits"),
        (e % 3 == 0).alias("fallback_attempted"))


SYNTH_FEED_ROWS_SQL = """
    SELECT event_id % 4 AS tracked_id, event_id AS feed_ord,
           CASE WHEN event_id % 6 = 0
                THEN 'https://remoteok.com/remote-jobs.rss'
                WHEN event_id % 6 = 1
                THEN 'https://remotive.com/remote-jobs/feed'
                WHEN event_id % 6 = 2
                THEN 'https://jobspresso.co/?feed=job_feed'
                WHEN event_id % 6 = 3
                THEN 'https://boards.example.com/jobs.XML'
                WHEN event_id % 6 = 4
                THEN 'https://remoteok.com/remote-jobs.rss/'
                ELSE 'https://live.example.com/feed' END AS feed_url,
           CASE WHEN event_id % 5 = 0 THEN 3 ELSE 0 END AS hits,
           CASE WHEN event_id % 7 = 0 THEN 2 ELSE 0 END AS fallback_hits,
           event_id % 3 = 0 AS fallback_attempted
    FROM events
"""


def synth_career_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    url = (F.when(e % 3 == 0, F.lit("https://remoteok.com/remote-jobs"))
           .otherwise(F.concat(F.lit("https://co"), (e % 9).cast("string"),
                               F.lit(".example/careers"))))
    return events.where(e % 2 == 0).select(
        (e % 4).alias("tracked_id"), e.alias("ord"), url.alias("url"),
        F.when(e % 10 == 0, F.lit(5)).otherwise(F.lit(0)).alias("hits"))


SYNTH_CAREER_ROWS_SQL = """
    SELECT event_id % 4 AS tracked_id, event_id AS ord,
           CASE WHEN event_id % 3 = 0
                THEN 'https://remoteok.com/remote-jobs'
                ELSE 'https://co' || CAST(event_id % 9 AS VARCHAR)
                     || '.example/careers' END AS url,
           CASE WHEN event_id % 10 = 0 THEN 5 ELSE 0 END AS hits
    FROM events WHERE event_id % 2 = 0
"""


def synth_ats_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    entry = (F.when(e % 7 == 0, F.lit("greenhouse:stripe"))
             .when(e % 7 == 1, F.lit("LEVER: zoom /"))
             .when(e % 7 == 2,
                   F.lit("https://boards.greenhouse.io/v1/boards/acme?x=1"))
             .when(e % 7 == 3, F.lit("https://jobs.lever.co/netflix/"))
             .when(e % 7 == 4,
                   F.lit("https://jobs.ashbyhq.com/posting-api/"
                         "job-board/Linear"))
             .when(e % 7 == 5, F.lit("workday:corp"))
             .otherwise(F.lit("justaword")))
    return events.where(e % 3 == 0).select(
        (e % 4).alias("tracked_id"), e.alias("ord"), entry.alias("entry"),
        F.when(e % 6 == 0, F.lit(4)).otherwise(F.lit(0)).alias("hits"))


SYNTH_ATS_ROWS_SQL = """
    SELECT event_id % 4 AS tracked_id, event_id AS ord,
           CASE WHEN event_id % 7 = 0 THEN 'greenhouse:stripe'
                WHEN event_id % 7 = 1 THEN 'LEVER: zoom /'
                WHEN event_id % 7 = 2
                THEN 'https://boards.greenhouse.io/v1/boards/acme?x=1'
                WHEN event_id % 7 = 3 THEN 'https://jobs.lever.co/netflix/'
                WHEN event_id % 7 = 4
                THEN 'https://jobs.ashbyhq.com/posting-api/job-board/Linear'
                WHEN event_id % 7 = 5 THEN 'workday:corp'
                ELSE 'justaword' END AS entry,
           CASE WHEN event_id % 6 = 0 THEN 4 ELSE 0 END AS hits
    FROM events WHERE event_id % 3 = 0
"""


def synth_api_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    name = (F.when(e % 5 == 0, F.lit("google_jobs"))
            .when(e % 5 == 1, F.lit("perplexity_primary"))
            .when(e % 5 == 2, F.lit("careers_pages"))
            .when(e % 5 == 3, F.lit("rss_feeds"))
            .otherwise(F.lit("google_serp")))
    cnt = (F.when(e % 4 == 0, F.lit(12))
           .when(e % 4 == 1, F.lit(0))
           .when(e % 4 == 3, F.lit(-1))
           .otherwise(F.lit(3)))
    return events.where(e % 2 == 1).select(
        (e % 4).alias("tracked_id"), e.alias("ord"), name.alias("name"),
        cnt.alias("count"))


SYNTH_API_ROWS_SQL = """
    SELECT event_id % 4 AS tracked_id, event_id AS ord,
           CASE WHEN event_id % 5 = 0 THEN 'google_jobs'
                WHEN event_id % 5 = 1 THEN 'perplexity_primary'
                WHEN event_id % 5 = 2 THEN 'careers_pages'
                WHEN event_id % 5 = 3 THEN 'rss_feeds'
                ELSE 'google_serp' END AS name,
           CASE WHEN event_id % 4 = 0 THEN 12
                WHEN event_id % 4 = 1 THEN 0
                WHEN event_id % 4 = 3 THEN -1
                ELSE 3 END AS count
    FROM events WHERE event_id % 2 = 1
"""


def fallback_plan_sql() -> str:
    page = feed_to_page_sql("feed_url")
    return f"""
        WITH feeds AS ({SYNTH_FEED_ROWS_SQL}),
        careers AS ({SYNTH_CAREER_ROWS_SQL}),
        ca AS (SELECT tracked_id, list(lower(trim(url))) AS cl
               FROM careers GROUP BY tracked_id),
        f AS (SELECT feeds.*, ({page}) AS page_url
              FROM feeds WHERE hits = 0),
        g AS (SELECT f.* FROM f
              LEFT JOIN ca ON ca.tracked_id = f.tracked_id
              WHERE f.page_url IS NOT NULL
                AND NOT coalesce(list_contains(ca.cl, lower(f.page_url)),
                                 FALSE))
        SELECT tracked_id, feed_ord, feed_url, page_url FROM (
          SELECT *, row_number() OVER (
                     PARTITION BY tracked_id, page_url
                     ORDER BY feed_ord) AS rn
          FROM g) WHERE rn = 1
    """


def source_report_sql() -> str:
    akey = f"'ats:' || coalesce({parse_ats_key_sql('entry')}, entry)"
    return f"""
        WITH careers AS ({SYNTH_CAREER_ROWS_SQL}),
        rss AS ({SYNTH_FEED_ROWS_SQL}),
        ats AS ({SYNTH_ATS_ROWS_SQL}),
        api AS ({SYNTH_API_ROWS_SQL})
        SELECT tracked_id, 0 AS section_ord, ord AS item_ord,
               url AS report_key, CAST(hits AS BIGINT) AS reported_count,
               CASE WHEN hits = 0 THEN url END AS empty_label
        FROM careers
        UNION ALL
        SELECT tracked_id, 1, feed_ord,
               CASE WHEN hits = 0 AND fallback_hits > 0
                    THEN feed_url || ' (recovered via firecrawl)'
                    ELSE feed_url END,
               CAST(CASE WHEN hits = 0 AND fallback_hits > 0
                         THEN fallback_hits ELSE hits END AS BIGINT),
               CASE WHEN hits = 0 AND NOT (fallback_hits > 0)
                    THEN feed_url ||
                         (CASE WHEN fallback_attempted
                               THEN ' (rss AND firecrawl fallback'
                                    || ' both empty)'
                               ELSE '' END) END
        FROM rss
        UNION ALL
        SELECT tracked_id, 2, ord, {akey}, CAST(hits AS BIGINT),
               CASE WHEN hits = 0 THEN {akey} END
        FROM ats
        UNION ALL
        SELECT tracked_id, 3, ord, name, CAST(count AS BIGINT),
               CASE WHEN count = 0 THEN name
                    WHEN count = -1 THEN name || ' (failed)' END
        FROM api WHERE name NOT IN ('careers_pages', 'rss_feeds')
    """
