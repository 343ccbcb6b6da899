"""Pins for the job-source self-curation folds (operators/job_curation vs
job_source_curator.py:57-229)."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import job_curation as jc


def test_registrable_collapse(spark):
    cases = {
        "https://Job-Boards.Greenhouse.io/acme": "greenhouse.io",
        "ie.linkedin.com": "linkedin.com",
        "jobs.foo.co.uk": "foo.co.uk",       # 2-part TLD keeps 3 labels
        "www.devjobs.gr:443": "devjobs.gr",
        "kariera.gr/jobs/123": "kariera.gr",
        "startup.jobs": "startup.jobs",
        "localhost": "localhost",             # no dot -> unchanged
        "": "",
    }
    df = spark.createDataFrame([(v,) for v in cases], "v string")
    got = {r["v"]: r["d"] for r in df.select(
        "v", jc.registrable_col(F.col("v")).alias("d")).collect()}
    for v, want in cases.items():
        assert got[v] == want, v


def test_curation_actions(spark):
    events = spark.range(0, 360).withColumnRenamed("id", "event_id")
    rev = {(r["run_id"], r["domain"]): r.asDict() for r in
           jc.curation_review(jc.synth_match_rows(events),
                              jc.synth_site_rows(spark),
                              jc.synth_index_rows(spark)).collect()}
    by_domain = {}
    for (run, dom), r in rev.items():
        by_domain.setdefault(dom, set()).add(r["action"])
    # curated (registrable of enabled sites) -> bump, never learned
    assert by_domain["remoteok.com"] == {"bump_yield"}
    assert by_domain["linkedin.com"] == {"bump_yield"}
    # social domains short-circuit before the index fold
    assert by_domain["reddit.com"] == {"skip_never_promote"}
    r = next(v for (run, dom), v in rev.items() if dom == "reddit.com")
    assert r["verified_matches"] is None and r["new_status"] is None
    # prior status 'promoted' never re-promotes (stays learn)
    assert by_domain["kariera.gr"] == {"learn"}
    assert all(v["new_status"] == "promoted" for (run, dom), v in rev.items()
               if dom == "kariera.gr")
    # startup.jobs: prior (2 emps, 1 run, candidate) + enough new
    # employers -> promote when merged >= 3
    assert "promote" in by_domain["startup.jobs"]
    # blank company -> the domain itself counts as the employer
    gh = next(v for (run, dom), v in rev.items() if dom == "greenhouse.io")
    assert "greenhouse.io" in (gh["sample_employers"] or "")


def test_stale_auto_disable(spark):
    got = {r["url_or_domain"] for r in
           jc.stale_auto_disable(jc.synth_site_rows(spark)).collect()}
    # stale auto-added (old yield) and never-yielded (old created_at)
    # disable; fresh auto-added, operator-seeded (even ancient), and
    # already-disabled rows do not
    assert got == {"stale.example", "never-yielded.example"}
