"""Pins for the job-listing curation gates (operators/jobs), using the
reference's own docstring examples (job_search_service.py:228-381).
"""

import pytest
from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import jobs


def _flag(spark, col_fn, values, colname="url"):
    df = spark.createDataFrame([(v,) for v in values],
                               f"{colname} string")
    out = df.select(col_fn(F.col(colname)).alias("f"), colname)
    return {r[colname]: r["f"] for r in out.collect()}


def test_category_url_heuristics(spark):
    got = _flag(spark, jobs.is_category_url_col, [
        # strong positives (job IDs) -> NOT category
        "https://x.com/jobs/12345-senior-engineer",
        "https://indeed.com/viewjob?jk=abc",
        "https://linkedin.com/jobs/view/99",
        # explicit category indicators
        "https://x.com/jobs/category/python",
        "https://builtin.com/jobs",
        "https://x.com/remote-python-jobs",
        # short topic slug
        "https://remoterocketship.com/python",
        "https://arc.dev/remote-senior-python-developer",
        # long slug with digits -> not category
        "https://x.com/senior-software-engineer-backend-2026-usa-remote8",
    ])
    assert got["https://x.com/jobs/12345-senior-engineer"] is False
    assert got["https://indeed.com/viewjob?jk=abc"] is False
    assert got["https://linkedin.com/jobs/view/99"] is False
    assert got["https://x.com/jobs/category/python"] is True
    assert got["https://builtin.com/jobs"] is True
    assert got["https://x.com/remote-python-jobs"] is True
    assert got["https://remoterocketship.com/python"] is True
    assert got["https://arc.dev/remote-senior-python-developer"] is True
    assert got[
        "https://x.com/senior-software-engineer-backend-2026-usa-remote8"
    ] is False


def test_category_title_ladder(spark):
    cases = {
        # reference docstring positives (:339-350)
        "25 Python jobs in Developer / Engineer": True,
        "Python Job Board": True,
        "Best Remote Python Jobs in NYC, NY 2026": True,
        "Top Remote Python Jobs in San Francisco Bay Area, CA": True,
        "Remote Python Jobs (May 2026)": True,
        "Python Jobs": True,
        "$116k-$175k Senior Python Developer Jobs in Houston, TX": True,
        # reference docstring negatives — real job titles
        "Senior Software Engineer - Backend/Python - USA Only (100% Remote)":
            False,
        "Principal Backend Engineer AI (Python) in Remote": False,
        "Drupal with Python Developer (Senior)": False,
    }
    got = _flag(spark, jobs.is_category_title_col, list(cases),
                colname="title")
    for title, want in cases.items():
        assert got[title] is want, title


def test_hallucinated_url_ids(spark):
    got = _flag(spark, lambda c: jobs.is_hallucinated_url_col(c, "url"), [
        "https://x.com/job/1234567890",      # ascending
        "https://x.com/job/0987654321",      # descending (mod 10)
        "https://x.com/job/1233321",         # palindrome
        "https://x.com/job/777777",          # all same digit
        "https://x.com/job/4837502916",      # random-looking -> fine
        "https://indeed.com/viewjob?jk=xyz789sardine_ai_pm",  # bad jk
        "https://indeed.com/viewjob?jk=0123456789abcdef",     # 16 hex ok
        "https://x.com/post/12345",          # only 5 digits -> ignored
    ])
    assert got["https://x.com/job/1234567890"] is True
    assert got["https://x.com/job/0987654321"] is True
    assert got["https://x.com/job/1233321"] is True
    assert got["https://x.com/job/777777"] is True
    assert got["https://x.com/job/4837502916"] is False
    assert got["https://indeed.com/viewjob?jk=xyz789sardine_ai_pm"] is True
    assert got["https://indeed.com/viewjob?jk=0123456789abcdef"] is False
    assert got["https://x.com/post/12345"] is False


def test_canonicalize_url(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.Example.COM/Jobs/View/123/?utm_source=a"
          "&ref=b&id=7&trackingId=z",),
         ("https://site.com/a/b/",),
         ("https://site.com/a?gclid=1",)], "url string")
    got = [r["c"] for r in df.select(
        jobs.canonicalize_url_col(F.col("url")).alias("c")).collect()]
    assert got[0] == "https://example.com/Jobs/View/123?id=7"
    assert got[1] == "https://site.com/a/b"
    assert got[2] == "https://site.com/a"


def test_company_gates(spark):
    placeholder = ["Acme Inc.", "CompanyXYZ", "[Company Name]",
                   "Your Company LLC", "Example Co"]
    missing = ["Unknown", "N/A", "na", "Undisclosed", "confidential",
               "Not Specified", "none", "TBD"]
    # reference false-positive pinned faithfully: the 'acme' stem plus
    # a space terminator flags ANY company whose name starts with Acme
    placeholder.append("Acme Brick & Tile Holdings")
    real = ["Stripe", "Sardine AI"]
    gp = _flag(spark, jobs.is_placeholder_company_col,
               placeholder + real, colname="c")
    gm = _flag(spark, jobs.is_missing_company_col,
               missing + real, colname="c")
    for c in placeholder:
        assert gp[c] is True, c
    for c in missing:
        assert gm[c] is True, c
    for c in real:
        assert gp[c] is False and gm[c] is False, c


def test_gate_ladder_order(spark):
    # a row that fails multiple gates reports the FIRST in ladder order;
    # a non-http URL wins over its hallucinated digits
    rows = [
        (1, "ftp://x.com/1234567", "t", "Stripe", "rss_feed"),
        (2, "https://indeed.com/q-x-jobs.html", "25 Python jobs in X",
         "Acme Inc.", "rss_feed"),
        (3, "https://ok.com/post/48375029", "Great Role", "Unknown",
         "rss_feed"),
    ]
    df = spark.createDataFrame(
        rows, "hit_id long, url string, title string, company string, "
              "source string")
    out = {r["hit_id"]: r for r in jobs.gate_listings(df).collect()}
    assert out[1]["verdict"] == "no_url"
    assert out[2]["verdict"] == "category_serp_url"
    assert out[3]["verdict"] == "keep"
    assert out[3]["company_clean"] is None          # blanked, kept
    assert out[3]["canonical_url"] == "https://ok.com/post/48375029"
    assert out[3]["company_domain"] == "ok.com"
    assert out[3]["content_key"] is not None


def test_dedupe_priority_and_ties(spark):
    rows = [(1, "google_jobs", "k1"), (2, "ats_board", "k1"),
            (3, "perplexity_sonar", "k1"),
            (4, "rss_feed", "k2"), (5, "rss_feed", "k2"),
            (6, "manual", "k3")]
    df = spark.createDataFrame(
        rows, "hit_id long, source string, content_key string")
    kept = {r["content_key"]: r for r in jobs.dedupe_hits(df).collect()}
    assert kept["k1"]["hit_id"] == 2      # highest priority wins
    assert kept["k2"]["hit_id"] == 4      # tie -> first arrival
    assert kept["k3"]["priority"] == 0    # unknown source -> 0


def test_query_variations(spark):
    df = spark.createDataFrame(
        [(1, "python developer", "Athens", True),
         (2, "data engineer", "Remote", False),
         (3, "", "Berlin", False)],
        "track_id long, keyword string, location string, "
        "remote_only boolean")
    out = jobs.query_variations(df).collect()
    by_track = {}
    for r in out:
        by_track.setdefault(r["track_id"], []).append(
            (r["variation_idx"], r["query"]))
    assert 3 not in by_track                      # empty keyword: none
    v1 = [q for _, q in sorted(by_track[1])]
    assert v1 == ["python developer remote jobs Athens",
                  "python developer careers page Athens",
                  "python developer remote hiring Athens",
                  "python developer remote job opening Athens",
                  "python developer remote apply Athens"]
    v2 = [q for _, q in sorted(by_track[2])]
    # 'Remote' location suppresses the where-part entirely
    assert v2[0] == "data engineer jobs"
    assert v2[1] == "data engineer careers page"
