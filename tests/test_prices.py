"""Pins the price-monitoring kernels to the reference's semantics on
handcrafted rows: the trimmed-median market stats branch ladder
(price_monitoring_routes.py:664-706), the rolling-median sanity band
(price_monitoring_notifications/service.py:153-218), volatility
(tracked_queries_service.py:79-122), cheapest-snapshot ordering
(tracked_queries_service.py:22-37), and W/W drop detection
(service.py:330-). Each test's expected values are hand-computed from the
reference's Python, not from our Spark code."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F, types as T

from mivaa_pdf_extractor_spark.operators import prices

SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("product_url", T.StringType()),
    T.StructField("retailer_name", T.StringType()),
    T.StructField("price", T.DoubleType()),
    T.StructField("original_price", T.DoubleType()),
    T.StructField("currency", T.StringType()),
    T.StructField("verified", T.BooleanType()),
    T.StructField("match_kind", T.StringType()),
    T.StructField("availability", T.StringType()),
    T.StructField("brand", T.StringType()),
    T.StructField("country_code", T.StringType()),
    T.StructField("scraped_at", T.TimestampType()),
])

T0 = dt.datetime(2024, 1, 20, 12, 0, 0)


def _hit(q=1, eid=0, url="https://www.r0.example.com/p", name="R0",
         price=None, orig=None, cur="EUR", ver=False, mk="exact",
         avail="in_stock", brand="B1", cc="GR", at=T0):
    return (q, eid, url, name, price, orig, cur, ver, mk, avail, brand,
            cc, at)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


# ---------------------------------------------------------------- market


def test_market_stats_trims_outliers_with_four_plus_values(spark):
    # values [10, 11, 12, 100]: provisional median 11.5, band
    # [3.83, 34.5] drops 100 -> median of [10,11,12] = 11
    rows = [_hit(eid=i, price=p)
            for i, p in enumerate([10.0, 11.0, 12.0, 100.0])]
    out = prices.market_stats(_df(spark, rows)).collect()[0]
    assert out["median_price"] == 11.0
    assert out["min_price"] == 10.0 and out["max_price"] == 12.0
    assert out["hit_count"] == 4 and out["verified_count"] == 0


def test_market_stats_no_trim_below_four_values(spark):
    # reference only trims at >= 4 values (routes.py:682) — the same
    # outlier survives in a 3-value list
    rows = [_hit(eid=i, price=p) for i, p in enumerate([10.0, 12.0, 100.0])]
    out = prices.market_stats(_df(spark, rows)).collect()[0]
    assert out["median_price"] == 12.0 and out["max_price"] == 100.0


def test_market_stats_branch_no_priced_hits(spark):
    # count falls back to ALL hits, verified 0 (routes.py:666-667)
    rows = [_hit(eid=0), _hit(eid=1), _hit(eid=2, ver=True)]
    out = prices.market_stats(_df(spark, rows)).collect()[0]
    assert out["hit_count"] == 3 and out["verified_count"] == 0
    assert out["median_price"] is None and out["currency"] is None


def test_market_stats_branch_no_stat_hits(spark):
    # priced but all out-of-stock/fuzzy: count=priced, verified counted,
    # no stats (routes.py:674-678)
    rows = [_hit(eid=0, price=5.0, avail="out_of_stock", ver=True),
            _hit(eid=1, price=6.0, mk="fuzzy"),
            _hit(eid=2)]
    out = prices.market_stats(_df(spark, rows)).collect()[0]
    assert out["hit_count"] == 2 and out["verified_count"] == 1
    assert out["min_price"] is None


def test_market_stats_null_match_kind_and_availability_pass(spark):
    # Python `None != "out_of_stock"` is True and match_kind None counts
    # as exact (routes.py:670-672)
    rows = [_hit(eid=0, price=7.0, mk=None, avail=None)]
    out = prices.market_stats(_df(spark, rows)).collect()[0]
    assert out["median_price"] == 7.0


def test_market_stats_modal_currency_tie_breaks_lexicographically(spark):
    rows = [_hit(eid=0, price=1.0, cur="USD"),
            _hit(eid=1, price=2.0, cur="EUR"),
            _hit(eid=2, price=3.0, cur=None)]
    out = prices.market_stats(_df(spark, rows)).collect()[0]
    assert out["currency"] == "EUR"  # 1-1 tie -> smallest


# ---------------------------------------------------------------- sanity


def _day(d, h=6):
    return dt.datetime(2024, 1, d, h, 0, 0)


def test_sanity_flags_too_high_and_ladder(spark):
    hist = [_hit(eid=i, price=10.0 + i, at=_day(15 + i)) for i in range(3)]
    cur = [_hit(eid=10, price=100.0, at=_day(20)),   # 100/11 > 3 -> anomaly
           _hit(eid=11, price=12.0, at=_day(20)),    # in band -> clean
           _hit(eid=12, price=1.0, at=_day(20)),     # 1/11 < 0.33 -> too low
           _hit(eid=13, price=None, at=_day(20)),    # unpriced -> clean, 0
           _hit(eid=14, price=5.0, at=_day(20),
                url="https://www.r9.example.com/p")]  # no history
    out = {r["event_id"]: r for r in
           prices.sanity_flags(_df(spark, hist + cur)).collect()}
    assert len(out) == 5  # only latest-run rows verdicted
    assert out[10]["is_anomaly"] and out[10]["reason"] == "too_high"
    assert out[10]["rolling_median"] == 11.0
    assert out[10]["history_samples"] == 3
    assert not out[11]["is_anomaly"] and out[11]["reason"] is None
    assert out[12]["reason"] == "too_low"
    assert out[13]["history_samples"] == 0 and out[13]["reason"] is None
    assert out[14]["reason"] == "insufficient_history"
    assert out[14]["rolling_median"] is None


def test_sanity_history_excludes_family_and_stale(spark):
    # family rows and rows older than the 7d window never enter the
    # sample list (service.py:170,190-192)
    hist = ([_hit(eid=i, price=10.0, at=_day(19)) for i in range(2)]
            + [_hit(eid=5, price=10.0, mk="family", at=_day(19)),
               _hit(eid=6, price=10.0, at=_day(2))])   # stale
    cur = [_hit(eid=10, price=100.0, at=_day(20))]
    out = prices.sanity_flags(_df(spark, hist + cur)).collect()
    row = [r for r in out if r["event_id"] == 10][0]
    assert row["reason"] == "insufficient_history"  # only 2 samples


# ------------------------------------------------------------ volatility


def test_max_pct_change_latest_vs_most_recent_prior(spark):
    rows = [_hit(eid=0, price=100.0, at=_day(10)),   # older prior
            _hit(eid=1, price=80.0, at=_day(15)),    # most recent prior
            _hit(eid=2, price=100.0, at=_day(20))]   # latest run
    out = prices.max_pct_change(_df(spark, rows)).collect()[0]
    assert out["max_pct_change"] == pytest.approx(25.0)  # vs 80, not 100
    assert out["refresh_interval_hours"] == 6


def test_max_pct_change_excludes_family_and_defaults_zero(spark):
    rows = [_hit(eid=0, price=50.0, at=_day(15)),
            _hit(eid=1, price=100.0, mk="family", at=_day(20))]
    out = prices.max_pct_change(_df(spark, rows)).collect()[0]
    assert out["max_pct_change"] == 0.0
    assert out["refresh_interval_hours"] == 48


# -------------------------------------------------------------- snapshot


def test_current_snapshot_prefers_verified_over_cheaper(spark):
    # sort key (not verified, price) — tracked_queries_service.py:36
    rows = [_hit(eid=0, price=5.0, ver=False, at=_day(20)),
            _hit(eid=1, price=9.0, ver=True, at=_day(20)),
            _hit(eid=2, price=1.0, mk="family", ver=True, at=_day(20)),
            _hit(eid=3, price=2.0, ver=True, at=_day(19))]  # prior run
    out = prices.current_snapshot(_df(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["current_price"] == 9.0
    assert out[0]["current_price_verified"] is True


# ----------------------------------------------------------------- drops


def test_price_drops_week_over_week(spark):
    prev = [_hit(eid=i, price=100.0, at=_day(8 + i)) for i in range(3)]
    cur = [_hit(eid=10 + i, price=80.0, at=_day(16 + i)) for i in range(3)]
    noise = [_hit(eid=20, price=100.0, at=_day(8),
                  url="https://www.r9.example.com/p"),
             _hit(eid=21, price=95.0, at=_day(16),
                  url="https://www.r9.example.com/p")]  # only 5% drop
    out = prices.price_drops(_df(spark, prev + cur + noise)).collect()
    assert len(out) == 1
    d = out[0]
    assert d["retailer_domain"] == "r0.example.com"
    assert d["previous_median"] == 100.0 and d["current_median"] == 80.0
    assert d["delta_pct"] == pytest.approx(20.0)


def test_domain_of_normalizes(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.Shop.Example.COM/x",), ("not a url",), (None,)],
        "url string")
    got = [r[0] for r in df.select(
        prices.domain_of(F.col("url"))).collect()]
    assert got == ["shop.example.com", None, None]


def test_brand_retailer_index_counts(spark):
    rows = [_hit(eid=0, price=1.0), _hit(eid=1),
            _hit(eid=2, mk="mismatch"), _hit(eid=3, mk="family"),
            _hit(eid=4, url=None)]
    out = prices.brand_retailer_index(_df(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["hit_count"] == 2  # unpriced counts; excluded kinds don't
    assert out[0]["retailer_domain"] == "r0.example.com"
