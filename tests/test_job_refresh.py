"""Transcription pins for the job-research refresh cascade
(operators/job_refresh vs an independent Python reading of
job_research_service.py:87-148 normalize_posted_at, :940-1046 the dedup
cascade, :1345-1357 _is_excluded, :1076-1117 the outcome fold)."""

import re
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import job_refresh as jr

NOW = datetime(2026, 8, 19, 12, 0, 0)

_REL = re.compile(r"(\d+)\s*\+?\s*(hour|hr|day|week|month|year)s?\s*ago",
                  re.I)


def _py_norm(v):
    """normalize_posted_at transcription, restricted to the engine's pinned
    ISO shapes, returning 'YYYY-MM-DD HH:MM:SS' or None."""
    if v is None:
        return None
    s = str(v).strip()
    if not s:
        return None
    if re.match(r"^\d{4}-\d{2}-\d{2}$", s):
        return s + " 00:00:00"
    if re.match(r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(Z|\+00:00)?$", s):
        return re.sub(r"(Z|\+00:00)$", "", s).replace("T", " ")
    low = s.lower()
    toks = ("new", "just posted", "just now", "today", "hours ago",
            "hour ago", "minutes ago", "minute ago")
    if any(t in low for t in toks):
        m = _REL.search(low)
        if m and m.group(2).lower() in ("hour", "hr"):
            return (NOW - timedelta(hours=int(m.group(1)))) \
                .strftime("%Y-%m-%d %H:%M:%S")
        return NOW.strftime("%Y-%m-%d %H:%M:%S")
    if "yesterday" in low:
        return (NOW - timedelta(days=1)).strftime("%Y-%m-%d %H:%M:%S")
    m = _REL.search(low)
    if m:
        n, unit = int(m.group(1)), m.group(2).lower()
        delta = {"day": timedelta(days=n), "week": timedelta(weeks=n),
                 "month": timedelta(days=30 * n),
                 "year": timedelta(days=365 * n),
                 "hour": timedelta(hours=n),
                 "hr": timedelta(hours=n)}.get(unit, timedelta(0))
        return (NOW - delta).strftime("%Y-%m-%d %H:%M:%S")
    return None


POSTED_CASES = list(jr._POSTED) + [
    "Renewed 3 weeks ago",   # 'new' substring wins over the 3-week offset
    "3 hr ago",              # no step-2 token -> rel-ago hour branch
    "5 minutes ago",         # step-2 token, no minute unit in the regex
    "Posted TODAY",          # case-insensitive token
    "30+ days ago",
    "activate",              # no token ('ago'-less), unparseable -> None
    "  ",                    # blank -> None
]


def test_posted_at_norm_matches_transcription(spark):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(POSTED_CASES)],
                               "i int, posted_at string")
    got = {r["i"]: r["norm"] for r in df.select(
        "i", jr.posted_at_norm_col(F.col("posted_at")).alias("norm"))
        .collect()}
    for i, v in enumerate(POSTED_CASES):
        assert got[i] == _py_norm(v), repr(v)


def test_renewed_pin(spark):
    # the reference's substring token check fires on 'Renewed ... ago',
    # overriding the week offset with NOW (:119-124)
    df = spark.createDataFrame([("Renewed 3 weeks ago",)], "p string")
    [r] = df.select(jr.posted_at_norm_col(F.col("p")).alias("n")).collect()
    assert r["n"] == "2026-08-19 12:00:00"


def test_role_title_key_peels_repeated_parens(spark):
    cases = {
        "Staff Product Engineer (Belo Horizonte)": "staff product engineer",
        "Staff Product Engineer (São Paulo) (Remote)":
            "staff product engineer",
        "SC Cleared Product-Owner": "sc cleared product owner",
        "SC Cleared Product Owner": "sc cleared product owner",
        "(Urgent)": "",
        "Engineer (x (y))": "engineer (x (y))",  # nested: no trailing match
    }
    df = spark.createDataFrame([(t,) for t in cases], "t string")
    got = {r["t"]: r["k"] for r in df.select(
        "t", jr.role_title_key_col(F.col("t")).alias("k")).collect()}
    for t, want in cases.items():
        assert got[t] == want, t


def _py_cascade(rows, excl, hashes, urls, max_age):
    """Independent transcription of the cascade loops (:940-1046)."""
    def role_key(title, company):
        def norm(s):
            return re.sub(r"[\s\-_/|]+", " ", (s or "").strip().lower()) \
                .strip()
        s = (title or "").strip()
        prev = None
        while s != prev:
            prev = s
            s = re.sub(r"\s*\([^()]*\)\s*$", "", s).strip()
        t, co = norm(s), norm(company)
        return f"{t}|{co}" if t and co else None

    out = {}
    by_tracked = {}
    for r in sorted(rows, key=lambda r: r["hit_ord"]):
        by_tracked.setdefault(r["tracked_id"], []).append(r)
    for tid, hs in by_tracked.items():
        seen_u, seen_r = set(), set()
        ex = excl.get(tid, {})
        cutoff = (NOW - timedelta(days=max_age[tid])) \
            .strftime("%Y-%m-%d %H:%M:%S")
        for r in hs:
            key = (r["canonical_url"] or r["url"] or "").lower()
            if key and key in seen_u:
                out[(tid, r["hit_ord"])] = "url_dup"
                continue
            if key:
                seen_u.add(key)
            rk = role_key(r["title"], r["company"])
            if rk:
                if rk in seen_r:
                    out[(tid, r["hit_ord"])] = "role_dup"
                    continue
                seen_r.add(rk)
            url_low = key
            co_low = (r["company"] or "").lower()
            dom_low = (r["company_domain"] or "").lower()
            if (any(u and u in url_low for u in ex.get("url", []))
                    or (dom_low and dom_low in ex.get("domain", []))
                    or (co_low and (co_low in ex.get("company", [])
                        or any(co_low == f.lower() or f.lower() in co_low
                               for f in ex.get("facet_company", []))))):
                out[(tid, r["hit_ord"])] = "excluded"
                continue
            if r["content_hash"] in hashes.get(tid, set()):
                out[(tid, r["hit_ord"])] = "seen_hash"
                continue
            if (r["canonical_url"] or "").lower() in urls.get(tid, set()):
                out[(tid, r["hit_ord"])] = "seen_url"
                continue
            norm = _py_norm(r["posted_at"])
            if norm is None or norm < cutoff:
                out[(tid, r["hit_ord"])] = "stale"
                continue
            out[(tid, r["hit_ord"])] = "kept"
    return out


def test_cascade_matches_transcription(spark):
    events = spark.range(0, 400).withColumnRenamed("id", "event_id")
    hits = jr.synth_refresh_hits(events)
    out = jr.refresh_cascade(hits, jr.synth_exclusions(spark),
                             *jr.synth_history(events),
                             jr.synth_tracked(spark))
    got = {(r["tracked_id"], r["hit_ord"]): r["disposition"]
           for r in out.collect()}

    rows = [r.asDict() for r in hits.collect()]
    excl = {}
    for tid, kind, val in jr.EXCLUSION_ROWS:
        excl.setdefault(tid, {}).setdefault(kind, []).append(val.lower())
    hh, hu = jr.synth_history(events)
    hashes, urls = {}, {}
    for r in hh.collect():
        hashes.setdefault(r["tracked_id"], set()).add(r["content_hash"])
    for r in hu.collect():
        urls.setdefault(r["tracked_id"], set()) \
            .add(r["canonical_url"].lower())
    want = _py_cascade(rows, excl, hashes, urls, {0: 14, 1: 7, 2: 30})
    assert got == want
    assert set(got.values()) >= {"url_dup", "role_dup", "excluded",
                                 "seen_hash", "stale", "kept"}


def test_outcome_fold(spark):
    events = spark.range(0, 300).withColumnRenamed("id", "event_id")
    hits = jr.synth_refresh_hits(events)
    casc = jr.refresh_cascade(hits, jr.synth_exclusions(spark),
                              *jr.synth_history(events),
                              jr.synth_tracked(spark))
    oc = {r["tracked_id"]: r.asDict() for r in
          jr.refresh_outcome(casc, jr.synth_verdicts(events)).collect()}
    disp = {(r["tracked_id"], r["hit_ord"]): r["disposition"]
            for r in casc.collect()}
    verd = {(r["tracked_id"], r["hit_ord"]): r["relevance"]
            for r in jr.synth_verdicts(events).collect()}
    for tid in (0, 1, 2):
        ks = [k for k in disp if k[0] == tid]
        kept = [k for k in ks if disp[k] == "kept"]
        assert oc[tid]["discovered"] == len(ks)
        assert oc[tid]["deduped"] == sum(
            disp[k] not in ("url_dup", "role_dup", "excluded") for k in ks)
        assert oc[tid]["candidates"] == len(kept)
        # missing verdict row -> 'unverifiable' -> persisted (not mismatch)
        assert oc[tid]["persisted"] == sum(
            verd.get(k) != "mismatch" for k in kept)
        assert oc[tid]["matches"] == sum(
            verd.get(k) == "match" for k in kept)


def _py_plan(row):
    """Independent transcription of the refresh task fan-out (:605-830)."""
    def dedupe(xs):
        seen, out = set(), []
        for x in xs:
            x = (x or "").strip()
            if x and x.lower() not in seen:
                seen.add(x.lower())
                out.append(x)
        return out

    def variations(base, location, remote):
        base = (base or "").strip()
        if not base:
            return []
        where = (location or "").strip()
        wp = (" " + where) if where and where.lower() not in {
            "remote", "anywhere", "worldwide", "global", "any"} else ""
        rs = " remote" if remote else ""
        return [f"{base}{rs} jobs{wp}", f"{base} careers page{wp}",
                f"{base}{rs} hiring{wp}", f"{base}{rs} job opening{wp}",
                f"{base}{rs} apply{wp}"]

    def site_queries(keywords, location, domains):
        where = (location or "").strip()
        if where.lower() in {"remote", "anywhere", "worldwide", "global",
                             "any"}:
            where = ""
        kws = [k.strip() for k in (keywords or []) if k and k.strip()][:3]
        if not kws:
            return []
        out = [re.sub(r"\s+", " ",
                      f"{kw} {where} site:linkedin.com/jobs").strip()
               for kw in kws]
        boards = [d for d in (domains or []) if d][:4]
        if boards:
            expr = " OR ".join(f"site:{b}" for b in boards)
            out.append(re.sub(r"\s+", " ",
                              f"{kws[0]} {where} {expr}").strip())
        return out

    kw = row["keywords"]
    terms = dedupe(list(kw) + list(row["expanded_keywords"]))
    primary = kw[0] if kw else (terms[0] if terms else "")
    vars_ = dedupe(list(row["query_phrasings"])
                   + variations(primary, row["location"],
                                row["remote_only"]))
    site = (site_queries(kw, row["location"], row["discovered_domains"])
            if (row["country_code"] or row["location"]) else [])
    serp = (site + [v for v in vars_ if v not in site])[:8]
    tasks = []
    if row["src_google_jobs"]:
        tasks.append((0, "google_jobs", None, 30, "|".join(kw)))
    if row["src_google_serp"] and serp:
        tasks.append((1, "google_serp", None, 10, "|".join(serp)))
    if row["src_perplexity"]:
        model = ("sonar-pro" if row["force_full_discovery"]
                 or not row["last_refreshed_at"] else "sonar")
        chunks = ([list(kw[i:i + 3]) for i in range(0, len(kw), 3)]
                  or [terms[:3]])[:6]
        for ci, c in enumerate(chunks):
            name = ("perplexity_primary" if ci == 0
                    else f"perplexity_kw_{ci + 1}")
            tasks.append((ci + 2, name, model, 7, "|".join(c)))
        for i, v in enumerate(vars_[:3]):
            tasks.append((i + 10, f"perplexity_var_{i + 1}", "sonar", 5, v))
    ats = dedupe(list(row["ats_boards"]) + list(row["ats_defaults"]))
    if row["src_ats"] and ats:
        tasks.append((20, "ats_boards", None, 0, "|".join(ats)))
    careers = dedupe(list(row["careers_page_urls"])
                     + list(row["careers_defaults"]))
    if row["src_careers"] and careers:
        tasks.append((21, "careers_pages", None, 0, "|".join(careers)))
    rss = dedupe(list(row["rss_feed_urls"]) + list(row["rss_defaults"]))
    if row["src_rss"] and rss:
        tasks.append((22, "rss_feeds", None, 0, "|".join(rss)))
    return tasks


def test_task_plan_matches_transcription(spark):
    events = spark.range(0, 200).withColumnRenamed("id", "event_id")
    tr = jr.synth_tracked_plans(events)
    got = {}
    for r in jr.refresh_task_plan(tr).collect():
        got.setdefault(r["tracked_id"], []).append(
            (r["task_ord"], r["source_name"], r["model"], r["task_limit"],
             r["payload"]))
    for tid, ts in got.items():
        ts.sort()
    rows = {r["tracked_id"]: r.asDict() for r in tr.collect()}
    for tid, row in rows.items():
        want = sorted(_py_plan(row))
        assert got.get(tid, []) == want, (tid, got.get(tid), want)


def test_plan_pins(spark):
    # tracked 16: keywords blank-only (%7==2? no — pick explicit rows)
    events = spark.range(0, 60).withColumnRenamed("id", "event_id")
    tr = jr.synth_tracked_plans(events)
    plan = {(r["tracked_id"], r["source_name"]): r.asDict()
            for r in jr.refresh_task_plan(tr).collect()}
    # t=9: keywords ci-dup list -> ats defaults dup 'GREENHOUSE:STRIPE'
    # t=12: keywords %7==5 (7 kws) -> 3 perplexity chunks
    assert (12, "perplexity_primary") in plan
    assert (12, "perplexity_kw_2") in plan
    assert (12, "perplexity_kw_3") in plan
    assert plan[(12, "perplexity_primary")]["payload"] == "k0|k1|k2"
    assert plan[(12, "perplexity_kw_3")]["payload"] == "k6"
    # t=0: force_full_discovery -> sonar-pro
    assert plan[(0, "perplexity_primary")]["model"] == "sonar-pro"
    # ats per-tracked first wins the CI tie: t=0 has both per-tracked
    # 'greenhouse:stripe' and default 'GREENHOUSE:STRIPE'
    assert plan[(0, "ats_boards")]["payload"].startswith("greenhouse:stripe")
    assert "GREENHOUSE" not in plan[(0, "ats_boards")]["payload"]


def test_feed_to_page_pins(spark):
    cases = {
        "https://remoteok.com/remote-jobs.rss":
            "https://remoteok.com/remote-jobs",
        "https://remotive.com/remote-jobs/feed":
            "https://remotive.com/remote-jobs",
        "https://jobspresso.co/?feed=job_feed": "https://jobspresso.co",
        "https://x.com/jobs.XML": "https://x.com/jobs",
        # rstrip('/') runs LAST, so a trailing slash shields the .rss
        # suffix from the extension strip — reference order pinned
        "https://remoteok.com/remote-jobs.rss/":
            "https://remoteok.com/remote-jobs.rss",
        "": None,
        "?feed=x": None,
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {r["u"]: r["p"] for r in df.select(
        "u", jr.feed_to_page_col(F.col("u")).alias("p")).collect()}
    for u, want in cases.items():
        assert got[u] == want, u


def test_parse_ats_key_pins(spark):
    cases = {
        "greenhouse:stripe": "greenhouse:stripe",
        # slug.strip().strip('/') keeps an INNER trailing space once the
        # slash is peeled — reference behavior pinned
        "LEVER: zoom /": "lever:zoom ",
        "https://boards.greenhouse.io/v1/boards/acme?x=1":
            "greenhouse:acme",
        "https://jobs.lever.co/netflix/": "lever:netflix",
        "https://jobs.ashbyhq.com/posting-api/job-board/Linear":
            "ashby:Linear",      # slug keeps its case (reference group(1))
        "workday:corp": None,    # provider not whitelisted
        "justaword": None,
        "greenhouse:": None,     # empty slug
    }
    df = spark.createDataFrame([(e,) for e in cases], "e string")
    got = {r["e"]: r["k"] for r in df.select(
        "e", jr.parse_ats_key_col(F.col("e")).alias("k")).collect()}
    for e, want in cases.items():
        assert got[e] == want, e


def test_source_report_labels(spark):
    events = spark.range(0, 120).withColumnRenamed("id", "event_id")
    rss = (jr.synth_feed_rows(events)
           .withColumnRenamed("feed_ord", "ord")
           .withColumnRenamed("feed_url", "url"))
    rep = jr.source_report(jr.synth_career_rows(events), rss,
                           jr.synth_ats_rows(events),
                           jr.synth_api_rows(events)).collect()
    keys = {r["report_key"] for r in rep}
    labels = {r["empty_label"] for r in rep if r["empty_label"]}
    # recovered feeds relabel and are NOT empty
    rec = [r for r in rep if "recovered via firecrawl" in r["report_key"]]
    assert rec and all(r["empty_label"] is None and r["reported_count"] > 0
                       for r in rec)
    # both-empty suffix only when a fallback was attempted
    assert any(l.endswith("(rss AND firecrawl fallback both empty)")
               for l in labels)
    # failed API sources carry the (failed) suffix
    assert any(l.endswith(" (failed)") for l in labels)
    # aggregates skipped
    assert "careers_pages" not in keys and "rss_feeds" not in keys
    # unparseable ATS entries fall back to the raw entry
    assert any(k == "ats:justaword" for k in keys)
