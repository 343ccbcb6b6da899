"""Pins for the pre-LLM job-hit verdict ladder
(operators/job_classify.py) against transcriptions of
job_classifier_service.py:71-256."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import job_classify as jc

HIT_SCHEMA = ("hit_id long, title string, description_excerpt string, "
              "company string, location string, url string, "
              "canonical_url string, company_domain string, "
              "is_remote boolean, source string")

FACETS = {
    "keywords": ["Python Developer", "data", "c++", "Senior Engineer"],
    "excluded_keywords": ["intern"],
    "excluded_companies": ["Acme Corp"],
    "remote_only": True,
}


def _hit(hit_id, title="", desc="", company="", location="", url="",
         canonical=None, domain="", is_remote=True,
         source="google_jobs"):
    return (hit_id, title, desc, company, location, url, canonical,
            domain, is_remote, source)


def _classify(spark, rows, facets=FACETS):
    df = spark.createDataFrame(rows, HIT_SCHEMA)
    return {r.hit_id: (r.relevance, r.note)
            for r in jc.classify_hits(df, facets).collect()}


def test_ladder_order_and_notes(spark):
    out = _classify(spark, [
        _hit(1),                                      # empty blob
        _hit(2, title="Python Developer role",
             url="https://www.reddit.com/r/x/comments/ab/p"),
        _hit(3, title="Python Developer",
             company="Acme Corporation",
             url="https://a.example.com/careers/x"),
        _hit(4, title="Python Developer Intern", company="T",
             url="https://t.example.com/careers/x"),
        _hit(5, title="Python Developer", company="T",
             url="https://t.example.com/careers/x", is_remote=False),
        _hit(6, title="Gardener position", desc="tend beds",
             company="GreenCo", url="https://g.example.com/careers/x"),
    ])
    assert out[1] == ("unverifiable", "no readable content from source")
    assert out[2] == ("mismatch",
                      "not a job posting (article/forum/social/video)")
    assert out[3] == ("mismatch", "excluded company: Acme Corp")
    assert out[4] == ("mismatch", "excluded term: intern")
    assert out[5] == ("mismatch", "non-remote when remote_only=true")
    assert out[6] == ("mismatch",
                      "no distinctive keyword tokens in "
                      "title/description")


def test_fast_promote_phrase_token_and_source_gate(spark):
    out = _classify(spark, [
        # multi-word keyword needs the contiguous phrase in the TITLE
        _hit(1, title="Senior Python Developer (Remote)", company="T",
             url="https://t.example.com/careers/x", is_remote=None),
        # phrase absent but distinctive token in DESC only -> needs_llm
        _hit(2, title="Senior Backend Engineer",
             desc="working with data pipelines", company="T",
             url="https://t.example.com/careers/x", is_remote=None),
        # single-token keyword matches on the title token; note is the
        # reference's Python-repr f-string form
        _hit(3, title="Data Analyst (Remote)", company="T",
             url="https://t.example.com/careers/x"),
        # the [^a-z0-9+#] token class keeps c++ whole
        _hit(4, title="C++ Systems Role remote", company="T",
             url="https://t.example.com/careers/x"),
        # untrusted SERP source never fast-promotes
        _hit(5, title="Senior Python Developer", company="T",
             url="https://s.example.com/careers/x", is_remote=None,
             source="google_serp"),
    ])
    assert out[1] == ("match", "keyword phrase in title: "
                               "Python Developer")
    assert out[2] == ("needs_llm", None)
    assert out[3] == ("match", "keyword token in title: ['data']")
    assert out[4] == ("match", "keyword token in title: ['c++']")
    assert out[5] == ("needs_llm", None)


def test_generic_only_keyword_never_promotes(spark):
    # "Senior Engineer" is all stoplist words: a title containing it
    # verbatim still needs the LLM (:252 'continue')
    out = _classify(spark, [
        _hit(1, title="Senior Engineer", desc="data work", company="T",
             url="https://t.example.com/careers/x")])
    assert out[1] == ("needs_llm", None)


def test_remote_none_falls_through(spark):
    # is_remote=None under remote_only does NOT mismatch (:196-198)
    out = _classify(spark, [
        _hit(1, title="Python Developer", company="T",
             url="https://t.example.com/careers/x", is_remote=None)])
    assert out[1][0] == "match"


def _np(spark, rows):
    df = spark.createDataFrame(
        rows, "hit_id long, title string, company string, url string, "
              "company_domain string")
    flagged = df.select("hit_id", jc.is_non_posting_col(
        F.col("url"), F.col("company_domain"), F.col("title"),
        F.col("company")).alias("f"))
    return {r.hit_id: r.f for r in flagged.collect()}


def test_non_posting_battery(spark):
    out = _np(spark, [
        (1, "t", "c", "https://medium.com/post", ""),
        (2, "t", "c", "https://www.linkedin.com/pulse/trends", ""),
        (3, "t", "c", "https://sub.youtube.com/v/1", ""),
        (4, "t", "c", "https://app.netlify.app/x", ""),
        (5, "Engineer at reputed company", "c",
         "https://t.example.com/careers/x", ""),
        (6, "t", "c", "https://gr.jooble.org/desc/123", ""),
        (7, "t", "c", "https://gr.jooble.org/away/99", ""),
        (8, "t", "c", "https://b.example.com/search/mkt", ""),
        (9, "t", "c", "https://b.example.com/list?q=mkt", ""),
        (10, "t", "c", "https://c.example.com/our-insights/trends", ""),
        # editorial path under a jobs path is exempt
        (11, "t", "c", "https://c.example.com/careers/blog/hiring", ""),
        (12, "431 Θέσεις εργασίας Μάρκετινγκ", "c",
         "https://b.example.com/roles/1", ""),
        (13, "Trade Marketing Jobs in Athens", "c",
         "https://b.example.com/roles/2", ""),
        (14, "εργασία Θεσσαλονίκη", "c",
         "https://b.example.com/roles/3", ""),
        (15, "A plain role", "c",
         "https://t.example.com/careers/x", ""),
        # company_domain wins over the url host
        (16, "t", "c", "https://t.example.com/careers/x",
         "www.reddit.com"),
    ])
    expected = {1: True, 2: True, 3: True, 4: True, 5: True, 6: False,
                7: True, 8: True, 9: True, 10: True, 11: False,
                12: True, 13: True, 14: True, 15: False, 16: True}
    assert out == expected
