"""Job-hit relevance rule tier — the deterministic verdict ladder that
runs before any LLM spend.

Reference semantics (job_classifier_service.py, file:line for the
judge):

- ``_tokens`` (:71-77): lowercase split on ``[^a-z0-9+#]+``, tokens of
  length >= 2 (the class keeps ``c++`` / ``c#`` whole).
- ``_is_non_posting`` (:110-168), in the reference's check order:
  content/social domain blocklist (path-qualified entries like
  ``linkedin.com/pulse`` substring-match the URL; bare domains match
  the host exactly or as a suffix label), reddit comment permalinks,
  the scraper-farm free-hosting host regex, the scrubbed-employer
  placeholder ("reputed company" in title or company), the jooble
  meta-aggregator rule (non ``/desc``/``/jdp`` paths), generic
  search-results URL shapes, editorial paths guarded by the jobs-path
  exemption, and the listing-page title shapes (leading-count titles
  incl. the Greek θέσεις forms, "<plural> in <place>", and the
  ``εργασία ``-prefix).
- ``rule_shortcut`` (:171-256), ladder order: empty blob →
  ``unverifiable``; non-posting → ``mismatch``; excluded company
  substring over the normalized company (first match's note wins);
  excluded keyword substring in the normalized title; explicit
  ``is_remote = false`` under ``remote_only``; the v0.3.5
  distinctive-token fast-drop (keyword tokens minus the generic
  role-word stoplist must intersect the blob tokens); the fast-promote
  pass — skipped entirely for untrusted SERP sources (:101-106) — per
  keyword in list order: multi-token keywords need the whole phrase in
  the title, single distinctive tokens match on the token, keywords
  made of only stoplist words never fast-promote; anything left is
  ``needs_llm`` (the reference returns None and defers to Haiku).

Pinned note strings are byte-identical to the reference, including the
Python-repr form ``keyword token in title: ['python']`` produced by
its f-string over a sliced sorted list.

DEVIATION (documented): the reference's listing-title patterns use
Python's unicode-aware ``\\b`` after Greek letters; Java and RE2 both
treat ``\\b`` as ASCII there and would silently disagree, so the word
boundary is pinned as an explicit end-or-non-letter class — identical
on both engines and on every fixture the reference's own examples
cover.

Scale design: the facets are a tiny static config, so every rule —
including the per-keyword loops — unrolls into ONE native when-chain
projection at plan-build time: a map-only, shuffle-free,
whole-stage-codegen pass over the hits table. No UDFs, no joins, no
driver loops over data.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from mivaa_pdf_extractor_spark.operators.jobs import _netloc

NON_POSTING_DOMAINS = (
    "reddit.com", "medium.com", "quora.com", "youtube.com", "youtu.be",
    "substack.com", "news.ycombinator.com", "twitter.com", "x.com",
    "facebook.com", "instagram.com", "tiktok.com", "wikipedia.org",
    "pinterest.com", "threads.net", "linkedin.com/pulse",
)

UNTRUSTED_FAST_PROMOTE_SOURCES = ("google_serp",)

# :96-100 — anchored free-hosting suffixes (scraper farms)
SCRAPER_FARM_HOST_RE = (
    r"(^|\.)(up\.railway\.app|amplifyapp\.com|unaux\.com|"
    r"liveblog365\.com|onrender\.com|vercel\.app|netlify\.app|"
    r"herokuapp\.com|glitch\.me)$")

# :243-247 — generic role-words that never count as distinctive
TOKEN_STOPLIST = frozenset({
    "developer", "engineer", "engineering", "manager", "lead", "senior",
    "junior", "staff", "principal", "architect", "specialist",
    "associate", "the", "and", "for", "with", "remote", "full", "part",
    "time", "any",
})

_TOKEN_SPLIT_RE = r"[^a-z0-9+#]+"

# Python \b after Greek letters pinned as explicit end-or-non-letter
_LISTING_COUNT_TITLE_RE = (
    r"^\s*\d[\d.,]*\s+"
    r"(jobs|θέσεις|θεσεις|vacancies|positions|offers|empleos)"
    r"([^a-zά-ώα-ω]|$)")
_LISTING_IN_PLACE_TITLE_RE = \
    r"(^|[^a-z0-9_])(jobs|vacancies|positions)\s+in\s+[a-z0-9]"
_SEARCH_URL_RE = r"/(search|srch|q-|browse)(/|$)"
_JOBS_PATH_RE = r"/(jobs?|careers?|positions?|openings?|vacanc|apply)(/|$)"
_EDITORIAL_PATH_RE = (
    r"/(insights?|our-insights|blog|news|press|newsroom|article|"
    r"articles|resources?|guides?|stories|learn|whitepaper|report|"
    r"webinar|podcast|events?)(/|$)")


def _py_tokens(s: str) -> set:
    import re
    return {t for t in re.split(_TOKEN_SPLIT_RE, (s or "").lower())
            if t and len(t) > 1}


def _tokens_col(s: Column) -> Column:
    """``_tokens`` (:71-77) as a native array: split, len >= 2, dedup."""
    toks = F.split(F.lower(s), _TOKEN_SPLIT_RE)
    return F.array_distinct(F.filter(toks, lambda t: F.length(t) > 1))


def is_non_posting_col(url: Column, company_domain: Column,
                       title: Column, company: Column) -> Column:
    """``_is_non_posting`` (:110-168) as one boolean expression."""
    u = F.lower(F.coalesce(url, F.lit("")))
    host0 = F.when(
        F.coalesce(F.lower(company_domain), F.lit("")) != "",
        F.lower(company_domain)).otherwise(_netloc(u))
    host = F.regexp_replace(host0, r"^www\.", "")
    dom = F.lit(False)
    for d in NON_POSTING_DOMAINS:
        if "/" in d:
            dom = dom | u.contains(d)
        else:
            dom = dom | (host == d) | host.endswith("." + d)
    reddit_comments = u.contains("/comments/") & u.contains("reddit")
    farm = F.regexp_like(host, F.lit(SCRAPER_FARM_HOST_RE))
    title_l0 = F.lower(F.coalesce(title, F.lit("")))
    scrubbed = (title_l0.contains("reputed company")
                | F.lower(F.coalesce(company, F.lit("")))
                  .contains("reputed company"))
    jooble = (host.contains("jooble.") & ~u.contains("/desc")
              & ~u.contains("/jdp"))
    search_shape = (F.regexp_like(u, F.lit(_SEARCH_URL_RE))
                    | u.contains("/jobs/q-") | u.contains("?q=")
                    | u.contains("&q="))
    editorial = (~F.regexp_like(u, F.lit(_JOBS_PATH_RE))
                 & F.regexp_like(u, F.lit(_EDITORIAL_PATH_RE)))
    title_l = F.trim(title_l0)
    listing_title = (
        F.regexp_like(title_l, F.lit(_LISTING_COUNT_TITLE_RE))
        | F.regexp_like(title_l, F.lit(_LISTING_IN_PLACE_TITLE_RE))
        | title_l.startswith("εργασία ") | title_l.startswith("εργασια "))
    return (dom | reddit_comments | farm | scrubbed | jooble
            | search_shape | editorial | listing_title)


def classify_hits(hits: DataFrame, facets: Mapping) -> DataFrame:
    """``rule_shortcut`` (:171-256) unrolled over static facets.

    ``hits``: ``(hit_id, title, description_excerpt, company, location,
    url, canonical_url, company_domain, is_remote:boolean?, source)``.
    ``facets``: mapping with ``keywords``, ``excluded_keywords``,
    ``excluded_companies`` (sequences) and ``remote_only`` (bool).

    Adds ``relevance`` in {unverifiable, mismatch, match, needs_llm}
    and ``note`` (NULL on needs_llm — the reference returns None there).
    """
    keywords: Sequence[str] = list(facets.get("keywords") or [])
    excluded_kw: Sequence[str] = list(facets.get("excluded_keywords")
                                      or [])
    excluded_co: Sequence[str] = list(facets.get("excluded_companies")
                                      or [])
    remote_only = bool(facets.get("remote_only"))

    title_norm = F.lower(F.coalesce(F.col("title"), F.lit("")))
    blob = F.concat_ws(" ", *[
        F.when(F.lower(F.coalesce(c, F.lit(""))) != "",
               F.lower(c))
        for c in (F.col("title"), F.col("description_excerpt"),
                  F.col("company"), F.col("location"))])
    co_norm = F.lower(F.coalesce(F.col("company"), F.lit("")))
    non_posting = is_non_posting_col(
        F.when(F.coalesce(F.col("url"), F.lit("")) != "", F.col("url"))
         .otherwise(F.coalesce(F.col("canonical_url"), F.lit(""))),
        F.col("company_domain"), F.col("title"), F.col("company"))

    blob_tokens = _tokens_col(blob)
    keyword_tokens: set = set()
    for k in keywords:
        keyword_tokens |= _py_tokens(k)
    distinctive = sorted(keyword_tokens - TOKEN_STOPLIST)

    verdict = F.when(F.trim(blob) == "",
                     F.struct(F.lit("unverifiable").alias("relevance"),
                              F.lit("no readable content from source")
                              .alias("note")))
    verdict = verdict.when(
        non_posting,
        F.struct(F.lit("mismatch").alias("relevance"),
                 F.lit("not a job posting (article/forum/social/video)")
                 .alias("note")))
    for ex in excluded_co:
        if not ex:
            continue
        verdict = verdict.when(
            co_norm.contains(ex.lower()),
            F.struct(F.lit("mismatch").alias("relevance"),
                     F.lit(f"excluded company: {ex}").alias("note")))
    for ex in excluded_kw:
        if not ex:
            continue
        verdict = verdict.when(
            title_norm.contains(ex.lower()),
            F.struct(F.lit("mismatch").alias("relevance"),
                     F.lit(f"excluded term: {ex}").alias("note")))
    if remote_only:
        verdict = verdict.when(
            F.col("is_remote") == False,  # noqa: E712 — None must not trip
            F.struct(F.lit("mismatch").alias("relevance"),
                     F.lit("non-remote when remote_only=true")
                     .alias("note")))
    if distinctive:
        overlap = F.size(F.array_intersect(
            blob_tokens, F.array(*[F.lit(t) for t in distinctive])))
        verdict = verdict.when(
            overlap == 0,
            F.struct(F.lit("mismatch").alias("relevance"),
                     F.lit("no distinctive keyword tokens in "
                           "title/description").alias("note")))

    trusted = ~F.coalesce(F.col("source"), F.lit("")) \
        .isin(*UNTRUSTED_FAST_PROMOTE_SOURCES)
    title_tokens = _tokens_col(F.coalesce(F.col("title"), F.lit("")))
    for k in keywords:
        k_tokens = _py_tokens(k)
        k_distinctive = sorted(k_tokens - TOKEN_STOPLIST)
        if not k_distinctive:
            continue  # generic-only keyword never fast-promotes
        if len(k_tokens) >= 2:
            cond = trusted & title_norm.contains(k.lower())
            note = f"keyword phrase in title: {k}"
        else:
            cond = trusted & (F.size(F.array_intersect(
                title_tokens,
                F.array(*[F.lit(t) for t in k_distinctive]))) > 0)
            note = f"keyword token in title: {k_distinctive[:2]}"
        verdict = verdict.when(
            cond, F.struct(F.lit("match").alias("relevance"),
                           F.lit(note).alias("note")))

    verdict = verdict.otherwise(
        F.struct(F.lit("needs_llm").alias("relevance"),
                 F.lit(None).cast("string").alias("note")))
    return (hits.withColumn("_v", verdict)
            .withColumn("relevance", F.col("_v.relevance"))
            .withColumn("note", F.col("_v.note")).drop("_v"))


# --- DuckDB twin + deterministic synth hits -------------------------

TEST_FACETS = {
    "keywords": ["Python Developer", "data", "c++", "Senior Engineer"],
    "excluded_keywords": ["intern"],
    "excluded_companies": ["Acme Corp"],
    "remote_only": True,
}

# (title, description_excerpt, company, location, url, company_domain,
#  is_remote, source) per doc % 12 — one row per ladder branch
_HIT_VARIANTS = [
    ("", "", "", "", "", "", True, "google_jobs"),
    ("Python Developer role", "", "TechCo", "Athens",
     "https://www.reddit.com/r/jobs/comments/abc/post", "", True,
     "google_jobs"),
    ("Python Developer", "", "Acme Corporation", "Athens",
     "https://acme.example.com/careers/role", "", True, "google_jobs"),
    ("Python Developer Intern", "", "TechCo", "Athens",
     "https://techco.example.com/careers/role", "", True,
     "google_jobs"),
    ("Python Developer", "", "TechCo", "Athens",
     "https://techco.example.com/careers/role", "", False,
     "google_jobs"),
    ("Gardener position", "tend garden beds", "GreenCo", "Athens",
     "https://greenco.example.com/careers/role", "", True,
     "google_jobs"),
    ("Senior Python Developer (Remote)", "", "TechCo", "Athens",
     "https://techco.example.com/careers/role", "", None,
     "google_jobs"),
    ("Data Analyst (Remote)", "", "TechCo", "Athens",
     "https://boards.example.com/careers/role", "Boards.Example.com",
     True, "google_jobs"),
    ("C++ Systems Role remote", "", "TechCo", "Athens",
     "https://techco.example.com/careers/role", "", True,
     "google_jobs"),
    ("Senior Python Developer", "", "TechCo", "Athens",
     "https://serp.example.com/careers/role", "", None, "google_serp"),
    ("Senior Backend Engineer", "working with data pipelines",
     "TechCo", "Athens", "https://techco.example.com/careers/role", "",
     None, "google_jobs"),
    ("Marketing roles digest", "", "TechCo", "Athens",
     "https://gr.jooble.org/jobs/q-marketing", "", True, "google_jobs"),
]

# (title, company, url) per doc % 15 — one row per _is_non_posting arm
_NON_POSTING_VARIANTS = [
    ("A role", "Co", "https://medium.com/why-i-quit"),
    ("A role", "Co", "https://www.linkedin.com/pulse/hiring-trends"),
    ("A role", "Co", "https://youtu.be/abc123"),
    ("A role", "Co", "https://myjobs.netlify.app/listing"),
    ("Engineer at reputed company", "Co",
     "https://techco.example.com/careers/role"),
    ("A role", "Reputed Company Pvt",
     "https://techco.example.com/careers/role"),
    ("A role", "Co", "https://gr.jooble.org/desc/12345"),
    ("A role", "Co", "https://gr.jooble.org/away/98765"),
    ("A role", "Co", "https://board.example.com/search/marketing"),
    ("A role", "Co", "https://board.example.com/list?q=marketing"),
    ("A role", "Co", "https://corp.example.com/our-insights/trends"),
    ("A role", "Co", "https://corp.example.com/careers/blog/hiring"),
    ("431 Θέσεις εργασίας Μάρκετινγκ", "Co",
     "https://board.example.com/roles/1"),
    ("Trade Marketing Jobs in Athens", "Co",
     "https://board.example.com/roles/2"),
    ("A plain role", "Co", "https://techco.example.com/careers/role"),
]


def synth_class_hits(docs) -> DataFrame:
    """One hit per document, cycling the 12 ladder-branch variants."""
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    m = F.col("doc") % 12

    def pick(idx):
        col = F.when(m == 0, F.lit(_HIT_VARIANTS[0][idx]))
        for v in range(1, 12):
            col = col.when(m == v, F.lit(_HIT_VARIANTS[v][idx]))
        return col

    is_remote = F.when(m == 0, F.lit(True))
    for v in range(1, 12):
        is_remote = is_remote.when(
            m == v, F.lit(_HIT_VARIANTS[v][6]).cast("boolean"))
    return d.select(
        F.col("doc").alias("hit_id"), pick(0).alias("title"),
        pick(1).alias("description_excerpt"), pick(2).alias("company"),
        pick(3).alias("location"), pick(4).alias("url"),
        F.lit(None).cast("string").alias("canonical_url"),
        pick(5).alias("company_domain"),
        is_remote.alias("is_remote"), pick(7).alias("source"))


def _variant_sql(col_idx: int, mod_expr: str, variants,
                 n: int, quote=True) -> str:
    whens = []
    for v in range(n):
        val = variants[v][col_idx]
        if val is None:
            lit = "NULL"
        elif isinstance(val, bool):
            lit = "TRUE" if val else "FALSE"
        elif quote:
            lit = f"'{_sq(val)}'"
        else:
            lit = str(val)
        whens.append(f"WHEN {v} THEN {lit}")
    return f"CASE {mod_expr} " + " ".join(whens) + " END"


def synth_class_hits_sql() -> str:
    m = "CAST(doc_id AS BIGINT) % 12"
    cols = [
        (_variant_sql(0, m, _HIT_VARIANTS, 12), "title"),
        (_variant_sql(1, m, _HIT_VARIANTS, 12), "description_excerpt"),
        (_variant_sql(2, m, _HIT_VARIANTS, 12), "company"),
        (_variant_sql(3, m, _HIT_VARIANTS, 12), "location"),
        (_variant_sql(4, m, _HIT_VARIANTS, 12), "url"),
        ("CAST(NULL AS VARCHAR)", "canonical_url"),
        (_variant_sql(5, m, _HIT_VARIANTS, 12), "company_domain"),
        (_variant_sql(6, m, _HIT_VARIANTS, 12, quote=False),
         "is_remote"),
        (_variant_sql(7, m, _HIT_VARIANTS, 12), "source"),
    ]
    sel = ",\n           ".join(f"{e} AS {a}" for e, a in cols)
    return (f"SELECT CAST(doc_id AS BIGINT) AS hit_id,\n           "
            f"{sel}\n    FROM documents")


def synth_non_posting(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    m = F.col("doc") % 15

    def pick(idx):
        col = F.when(m == 0, F.lit(_NON_POSTING_VARIANTS[0][idx]))
        for v in range(1, 15):
            col = col.when(m == v, F.lit(_NON_POSTING_VARIANTS[v][idx]))
        return col

    return d.select(
        F.col("doc").alias("hit_id"), pick(0).alias("title"),
        pick(1).alias("company"), pick(2).alias("url"),
        F.lit("").alias("company_domain"))


def synth_non_posting_sql() -> str:
    m = "CAST(doc_id AS BIGINT) % 15"
    cols = [
        (_variant_sql(0, m, _NON_POSTING_VARIANTS, 15), "title"),
        (_variant_sql(1, m, _NON_POSTING_VARIANTS, 15), "company"),
        (_variant_sql(2, m, _NON_POSTING_VARIANTS, 15), "url"),
        ("''", "company_domain"),
    ]
    sel = ",\n           ".join(f"{e} AS {a}" for e, a in cols)
    return (f"SELECT CAST(doc_id AS BIGINT) AS hit_id,\n           "
            f"{sel}\n    FROM documents")


def duck_non_posting_sql() -> str:
    """Twin of :func:`is_non_posting_col` over a ``hits_in`` CTE with
    (hit_id, title, company, url, company_domain)."""
    return f"""
    prepped AS (
        SELECT hit_id, lower(COALESCE(title, '')) AS title_norm,
               trim(lower(COALESCE(title, ''))) AS title_l,
               lower(COALESCE(company, '')) AS co_raw,
               lower(COALESCE(url, '')) AS u,
               regexp_replace(
                   CASE WHEN COALESCE(company_domain, '') <> ''
                        THEN lower(company_domain)
                        ELSE regexp_replace(lower(regexp_extract(
                             lower(COALESCE(url, '')),
                             '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)',
                             1)), '^www\\.', '')
                   END, '^www\\.', '') AS host
        FROM hits_in
    ), flags AS (
        SELECT hit_id,
            ({" OR ".join(
                f"contains(u, '{_sq(d)}')" if "/" in d else
                f"(host = '{_sq(d)}' OR ends_with(host, '.{_sq(d)}'))"
                for d in NON_POSTING_DOMAINS)}
             OR (contains(u, '/comments/') AND contains(u, 'reddit'))
             OR regexp_matches(host, '{SCRAPER_FARM_HOST_RE}')
             OR contains(title_norm, 'reputed company')
             OR contains(co_raw, 'reputed company')
             OR (contains(host, 'jooble.') AND NOT contains(u, '/desc')
                 AND NOT contains(u, '/jdp'))
             OR regexp_matches(u, '{_SEARCH_URL_RE}')
             OR contains(u, '/jobs/q-') OR contains(u, '?q=')
             OR contains(u, '&q=')
             OR (NOT regexp_matches(u, '{_JOBS_PATH_RE}')
                 AND regexp_matches(u, '{_EDITORIAL_PATH_RE}'))
             OR regexp_matches(title_l, '{_LISTING_COUNT_TITLE_RE}')
             OR regexp_matches(title_l, '{_LISTING_IN_PLACE_TITLE_RE}')
             OR starts_with(title_l, 'εργασία ')
             OR starts_with(title_l, 'εργασια ')) AS non_posting
        FROM prepped
    )"""


def _sq(s: str) -> str:
    return s.replace("'", "''")


def duck_classify_sql(facets: Mapping) -> str:
    """Twin of :func:`classify_hits` over a ``hits_in`` CTE. Emits the
    same when-chain as one CASE ladder."""
    keywords = list(facets.get("keywords") or [])
    excluded_kw = list(facets.get("excluded_keywords") or [])
    excluded_co = list(facets.get("excluded_companies") or [])
    remote_only = bool(facets.get("remote_only"))

    keyword_tokens: set = set()
    for k in keywords:
        keyword_tokens |= _py_tokens(k)
    distinctive = sorted(keyword_tokens - TOKEN_STOPLIST)

    doms = []
    for d in NON_POSTING_DOMAINS:
        if "/" in d:
            doms.append(f"contains(u, '{_sq(d)}')")
        else:
            doms.append(f"(host = '{_sq(d)}' "
                        f"OR suffix(host, '.{_sq(d)}'))")
    non_posting = f"""(
        {' OR '.join(doms)}
        OR (contains(u, '/comments/') AND contains(u, 'reddit'))
        OR regexp_matches(host, '{SCRAPER_FARM_HOST_RE}')
        OR contains(lower(COALESCE(title, '')), 'reputed company')
        OR contains(lower(COALESCE(company, '')), 'reputed company')
        OR (contains(host, 'jooble.') AND NOT contains(u, '/desc')
            AND NOT contains(u, '/jdp'))
        OR regexp_matches(u, '{_SEARCH_URL_RE}')
        OR contains(u, '/jobs/q-') OR contains(u, '?q=')
        OR contains(u, '&q=')
        OR (NOT regexp_matches(u, '{_JOBS_PATH_RE}')
            AND regexp_matches(u, '{_EDITORIAL_PATH_RE}'))
        OR regexp_matches(title_l, '{_LISTING_COUNT_TITLE_RE}')
        OR regexp_matches(title_l, '{_LISTING_IN_PLACE_TITLE_RE}')
        OR starts_with(title_l, 'εργασία ')
        OR starts_with(title_l, 'εργασια ')
    )"""

    branches = [
        ("trim(blob) = ''",
         "unverifiable", "no readable content from source"),
        (non_posting, "mismatch",
         "not a job posting (article/forum/social/video)"),
    ]
    for ex in excluded_co:
        if ex:
            branches.append((
                f"contains(co_norm, '{_sq(ex.lower())}')",
                "mismatch", f"excluded company: {ex}"))
    for ex in excluded_kw:
        if ex:
            branches.append((
                f"contains(title_norm, '{_sq(ex.lower())}')",
                "mismatch", f"excluded term: {ex}"))
    if remote_only:
        branches.append(("is_remote = FALSE", "mismatch",
                         "non-remote when remote_only=true"))
    if distinctive:
        arr = "[" + ", ".join(f"'{_sq(t)}'" for t in distinctive) + "]"
        branches.append((
            f"len(list_intersect(blob_tokens, {arr})) = 0",
            "mismatch",
            "no distinctive keyword tokens in title/description"))
    untrusted = ", ".join(f"'{_sq(s)}'"
                          for s in UNTRUSTED_FAST_PROMOTE_SOURCES)
    trusted = f"COALESCE(source, '') NOT IN ({untrusted})"
    for k in keywords:
        k_tokens = _py_tokens(k)
        k_distinctive = sorted(k_tokens - TOKEN_STOPLIST)
        if not k_distinctive:
            continue
        if len(k_tokens) >= 2:
            branches.append((
                f"{trusted} AND contains(title_norm, "
                f"'{_sq(k.lower())}')",
                "match", f"keyword phrase in title: {k}"))
        else:
            arr = "[" + ", ".join(f"'{_sq(t)}'"
                                  for t in k_distinctive) + "]"
            branches.append((
                f"{trusted} AND len(list_intersect(title_tokens, "
                f"{arr})) > 0",
                "match", f"keyword token in title: {k_distinctive[:2]}"))

    whens = "\n            ".join(
        f"WHEN {cond} THEN '{rel}'" for cond, rel, _ in branches)
    notes = "\n            ".join(
        f"WHEN {cond} THEN '{_sq(note)}'" for cond, _, note in branches)
    return f"""
    prepped AS (
        SELECT *,
            lower(COALESCE(title, '')) AS title_norm,
            lower(COALESCE(company, '')) AS co_norm,
            trim(lower(COALESCE(title, ''))) AS title_l,
            lower(CASE WHEN COALESCE(url, '') <> '' THEN url
                       ELSE COALESCE(canonical_url, '') END) AS u,
            concat_ws(' ',
                CASE WHEN lower(COALESCE(title, '')) <> ''
                     THEN lower(title) END,
                CASE WHEN lower(COALESCE(description_excerpt, '')) <> ''
                     THEN lower(description_excerpt) END,
                CASE WHEN lower(COALESCE(company, '')) <> ''
                     THEN lower(company) END,
                CASE WHEN lower(COALESCE(location, '')) <> ''
                     THEN lower(location) END) AS blob
        FROM hits_in
    ), tokened AS (
        SELECT *,
            regexp_replace(
                CASE WHEN COALESCE(company_domain, '') <> ''
                     THEN lower(company_domain)
                     ELSE regexp_replace(lower(regexp_extract(u,
                          '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)),
                          '^www\\.', '')
                END, '^www\\.', '') AS host,
            list_distinct(list_filter(
                regexp_split_to_array(lower(blob),
                                      '{_TOKEN_SPLIT_RE}'),
                t -> len(t) > 1)) AS blob_tokens,
            list_distinct(list_filter(
                regexp_split_to_array(lower(COALESCE(title, '')),
                                      '{_TOKEN_SPLIT_RE}'),
                t -> len(t) > 1)) AS title_tokens
        FROM prepped
    ), verdicts AS (
        SELECT *,
            CASE
            {whens}
            ELSE 'needs_llm' END AS relevance,
            CASE
            {notes}
            END AS note
        FROM tokened
    )"""
