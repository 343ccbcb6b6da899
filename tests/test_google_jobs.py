"""Pins for the Google-Jobs item parse
(job_search_service.py:537-586)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import google_jobs as gj

_COLS = ["item_id", "item_type", "source_url", "apply_link_link",
         "url", "title", "employer_name", "company_name",
         "salary_is_dict", "salary_min_raw", "salary_max_raw",
         "salary_currency", "salary_period", "contract_type",
         "schedule_type", "location", "description", "timestamp_str",
         "date_posted", "employer_image_url", "thumbnail",
         "source_name", "via"]


def _item(**kw):
    base = dict(item_id=1, item_type="google_jobs_item",
                source_url="https://a.gr/j/1", apply_link_link=None,
                url="", title="T", employer_name="E",
                company_name="C", salary_is_dict=True,
                salary_min_raw="100", salary_max_raw="200",
                salary_currency="EUR", salary_period="monthly",
                contract_type="full_time", schedule_type="part_time",
                location="Athens", description="d",
                timestamp_str="ts", date_posted="dp",
                employer_image_url="img", thumbnail="th",
                source_name="sn", via="v")
    base.update(kw)
    return tuple(base[c] for c in _COLS)


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=_COLS),
        schema=("item_id long, item_type string, source_url string, "
                "apply_link_link string, url string, title string, "
                "employer_name string, company_name string, "
                "salary_is_dict boolean, salary_min_raw string, "
                "salary_max_raw string, salary_currency string, "
                "salary_period string, contract_type string, "
                "schedule_type string, location string, "
                "description string, timestamp_str string, "
                "date_posted string, employer_image_url string, "
                "thumbnail string, source_name string, via string"))


def test_type_gate_case_insensitive(spark):
    rows = [_item(item_id=1, item_type="GOOGLE_JOBS_ITEM"),
            _item(item_id=2, item_type="organic"),
            _item(item_id=3, item_type=None)]
    out = gj.parse_google_jobs(_df(spark, rows)).collect()
    assert [r.item_id for r in out] == [1]


def test_url_ladder_and_empty_drop(spark):
    rows = [_item(item_id=1, source_url="",
                  apply_link_link="https://apply/x", url="u"),
            _item(item_id=2, source_url="", apply_link_link=None,
                  url="https://u/2"),
            _item(item_id=3, source_url="", apply_link_link=None,
                  url="")]
    out = {r.item_id: r.url for r in
           gj.parse_google_jobs(_df(spark, rows)).collect()}
    assert out == {1: "https://apply/x", 2: "https://u/2"}


def test_is_remote_never_false(spark):
    rows = [_item(item_id=1, location="Remote - EU"),
            _item(item_id=2, location="Athens"),
            _item(item_id=3, location=None)]
    out = {r.item_id: r.is_remote for r in
           gj.parse_google_jobs(_df(spark, rows)).collect()}
    assert out == {1: "true", 2: None, 3: None}


def test_salary_int_truncation_and_non_dict(spark):
    rows = [_item(item_id=1, salary_min_raw="1200.9"),
            _item(item_id=2, salary_min_raw="junk"),
            _item(item_id=3, salary_is_dict=False,
                  salary_min_raw="500")]
    out = {r.item_id: (r.salary_min, r.salary_currency) for r in
           gj.parse_google_jobs(_df(spark, rows)).collect()}
    assert out[1] == (1200, "EUR")       # int(float('1200.9'))
    assert out[2] == (None, "EUR")       # unparseable -> None
    assert out[3] == (None, None)        # non-dict salary folds to {}


def test_excerpt_600_and_empty_none(spark):
    rows = [_item(item_id=1, description="x" * 700),
            _item(item_id=2, description="")]
    out = {r.item_id: r.description_excerpt for r in
           gj.parse_google_jobs(_df(spark, rows)).collect()}
    assert len(out[1]) == 600
    assert out[2] is None                # '' [:600] or None
