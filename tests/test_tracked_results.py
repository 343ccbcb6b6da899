"""Pins for the tracked-query results/exclusions/cron folds
(tracked_queries_service.py:39-47,969-1338)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import tracked_results as tr


def _hist(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["tracked_query_id", "row_id", "refresh_run_id",
                       "scraped_at", "retailer_name", "product_url",
                       "price", "match_kind"]))


def _excl(spark, rows):
    if not rows:
        return spark.createDataFrame(
            pd.DataFrame(columns=["tracked_query_id", "url",
                                  "domain"]),
            schema="tracked_query_id long, url string, domain string")
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["tracked_query_id", "url", "domain"]))


def test_latest_run_only_and_cheapest_first(spark):
    rows = [(1, 1, 10, 100, "A", None, 9.0, "exact"),
            (1, 2, 11, 200, "B", None, 5.0, "exact"),
            (1, 3, 11, 200, "C", None, 3.0, "exact")]
    out = tr.latest_results(_hist(spark, rows),
                            _excl(spark, [])).collect()
    assert [(r.row_id, r.rank) for r in
            sorted(out, key=lambda r: r.rank)] == [(3, 1), (2, 2)]


def test_url_exclusion_is_exact_domain_is_derived(spark):
    rows = [(1, 1, 10, 100, "A",
             "https://www.shop.gr/p/1", 9.0, "exact"),
            (1, 2, 10, 100, "B",
             "https://other.gr/p/2", 5.0, "exact"),
            (1, 3, 10, 100, "C",
             "https://keep.gr/p/3", 7.0, "exact")]
    excl = [(1, "https://other.gr/p/2", None),  # exact URL tier
            (1, None, "shop.gr")]               # domain tier (www-less)
    out = tr.latest_results(_hist(spark, rows),
                            _excl(spark, excl)).collect()
    assert [r.row_id for r in out] == [3]


def test_family_split_null_folds_primary(spark):
    rows = [(1, 1, 10, 100, "A", None, 9.0, "FAMILY"),
            (1, 2, 10, 100, "B", None, 5.0, None),
            (1, 3, 10, 100, "C", None, 7.0, "exact")]
    out = {r.row_id: r.section for r in tr.results_split(
        tr.latest_results(_hist(spark, rows),
                          _excl(spark, []))).collect()}
    assert out == {1: "family_results", 2: "results", 3: "results"}


def test_exclusion_domain_scheme_keeps_www(spark):
    reqs = spark.createDataFrame(pd.DataFrame(
        [(1, "HTTP://WWW.Example.com/path"),
         (2, "www.site.gr/x"),
         (3, "Plain.com/deep")],
        columns=["req_id", "domain"]))
    out = {r.req_id: r.domain_norm
           for r in tr.exclusion_norm(reqs).collect()}
    # www. removeprefix runs BEFORE the scheme strip: the scheme'd
    # domain keeps its www (faithful-to-code pin)
    assert out[1] == "www.example.com"
    assert out[2] == "site.gr"
    assert out[3] == "plain.com"


def _queries(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["query_id", "workspace_id", "is_active",
                       "api_key_id", "next_check_at"]))


def test_due_refresh_skips_external_api_keys(spark):
    rows = [(1, 0, True, None, None),
            (2, 0, True, "key", None),      # external: never cron'd
            (3, 0, False, None, None),      # inactive
            (4, 0, True, None, tr.NOW + 10)]  # future
    out = tr.due_for_refresh(_queries(spark, rows),
                             now=tr.NOW).collect()
    assert [r.query_id for r in out] == [1]


def test_due_refresh_nulls_last_and_clamp(spark):
    rows = [(1, 0, True, None, None),
            (2, 0, True, None, tr.NOW - 50),
            (3, 0, True, None, tr.NOW - 99)]
    out = tr.due_for_refresh(_queries(spark, rows), now=tr.NOW,
                             limit=2).collect()
    # past timestamps first (asc), NULL last -> clamped off
    assert [r.query_id for r in
            sorted(out, key=lambda r: r.rk)] == [3, 2]
