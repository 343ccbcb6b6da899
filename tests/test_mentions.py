"""Pins the mention-opportunity kernels (operators/mentions.py) to the
reference's semantics (mention_opportunity_service.py): bigram trend
counting with the subject blocklist and token filters, warm/cold outlet
priorities, generic-byline exclusion, the negative-sentiment queue, and
feed assembly. Expected values hand-computed from the reference code."""

import datetime as dt

import pytest

from mivaa_pdf_extractor_spark.operators import mentions as mo

COLS = ("mention_id long, subject_id long, title string, excerpt string, "
        "outlet_domain string, outlet_name string, outlet_type string, "
        "author string, sentiment string, relevance string, url string, "
        "published_at timestamp")


def _m(mid=0, sid=1, title="", excerpt=None, dom="out.example.com",
       name="Out", otype="news", author="Ann Writer", sent="neutral",
       rel="exact", url="https://out.example.com/a", day=10):
    return (mid, sid, title, excerpt, dom, name, otype, author, sent,
            rel, url, dt.datetime(2024, 1, day, 12, 0, 0))


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _subj(spark, pairs):
    return spark.createDataFrame(pairs,
                                 "subject_id long, subject_label string")


def test_trending_counts_occurrences_and_floor(spark):
    # 'solar panels' twice (trend), 'wind tariffs' once (below floor);
    # stopwords/digits/short tokens dropped before pairing (:374-379)
    rows = [_m(0, 1, "the solar panels for 2024 on top"),
            _m(1, 1, "best solar panels to buy"),
            _m(2, 1, "wind tariffs rise")]
    out = mo.trending_bigrams(_df(spark, rows),
                              _subj(spark, [(1, "Acme")])).collect()
    assert len(out) == 1
    r = out[0]
    assert r["phrase"] == "solar panels" and r["mention_count"] == 2
    assert r["priority_score"] == pytest.approx(0.2)


def test_trending_subject_blocklist_needs_both_tokens(spark):
    # (acme, solar) blocked — both in the subject label; (solar, rises)
    # survives with one blocked token (:380-382)
    rows = [_m(0, 1, "acme solar rises"), _m(1, 1, "acme solar rises")]
    out = mo.trending_bigrams(_df(spark, rows),
                              _subj(spark, [(1, "Acme Solar")])).collect()
    phrases = {r["phrase"] for r in out}
    assert phrases == {"solar rises"}


def test_trending_priority_caps_at_one(spark):
    rows = [_m(i, 1, "mega battery deal") for i in range(12)]
    out = mo.trending_bigrams(_df(spark, rows),
                              _subj(spark, [(1, "X")])).collect()
    top = [r for r in out if r["phrase"] == "mega battery"][0]
    assert top["mention_count"] == 12 and top["priority_score"] == 1.0


def test_outlet_warm_vs_cold_priorities(spark):
    rows = ([_m(i, 1, dom="Warm.example.com", name="Warm") for i in range(3)]
            + [_m(10, 1, dom="cold.example.com", name="Cold")]
            + [_m(11, 1, dom="")])  # empty domain skipped (:421-423)
    out = {r["domain"]: r for r in
           mo.outlet_pitches(_df(spark, rows)).collect()}
    assert set(out) == {"warm.example.com", "cold.example.com"}
    assert out["warm.example.com"]["warm"]
    assert out["warm.example.com"]["priority_score"] == pytest.approx(0.8)
    assert not out["cold.example.com"]["warm"]
    assert out["cold.example.com"]["priority_score"] == pytest.approx(0.4)


def test_outlet_meta_from_most_recent_mention(spark):
    rows = [_m(0, 1, dom="a.example.com", name="Old Name", day=5),
            _m(1, 1, dom="a.example.com", name="New Name", day=20)]
    out = mo.outlet_pitches(_df(spark, rows)).collect()[0]
    assert out["outlet_name"] == "New Name"


def test_authors_exclude_generics_and_singletons(spark):
    rows = ([_m(i, 1, author="Jane Doe") for i in range(2)]
            + [_m(10, 1, author="staff"), _m(11, 1, author="Staff"),
               _m(12, 1, author="admin"), _m(13, 1, author=" "),
               _m(14, 1, author=None), _m(15, 1, author="One Timer")])
    out = mo.author_relationships(_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["author_key"] == "jane doe" and r["mention_count"] == 2
    # min(1, 0.4 + 2/6)
    assert r["priority_score"] == pytest.approx(0.4 + 2 / 6.0)


def test_sentiment_queue_filters_relevance_and_orders_desc(spark):
    rows = [_m(0, 1, title="bad old", sent="negative", rel="exact", day=5),
            _m(1, 1, title="bad new", sent="negative", rel=None, day=20),
            _m(2, 1, title="bad family", sent="negative", rel="mismatch"),
            _m(3, 1, title="fine", sent="positive", rel="exact")]
    out = mo.sentiment_responses(_df(spark, rows)).collect()
    got = [(r["rank"], r["title"], r["priority_score"]) for r in
           sorted(out, key=lambda r: r["rank"])]
    assert got == [(1, "bad new", 0.85), (2, "bad old", 0.85)]


def test_feed_ranks_by_priority_desc(spark):
    # 12x 'mega battery' trend (1.0) outranks the sentiment row (0.85)
    # which outranks the single warm outlet (count 14 -> 1.0? no:
    # min(1, 0.5 + 14/10) = 1.0 ties trend -> type asc places
    # outlet_pitch before trending_topic on ties
    rows = [_m(i, 1, "mega battery deal",
               dom="w.example.com", sent="negative" if i == 0 else "neutral")
            for i in range(12)]
    out = mo.opportunity_feed(_df(spark, rows),
                              _subj(spark, [(1, "X")])).collect()
    ranked = sorted(out, key=lambda r: r["feed_rank"])
    # 1.0 scorers: author (12 mentions), outlet (12), two trend phrases
    # (12 each) — priority ties order by type asc, then per-type rank;
    # the 0.85 sentiment row comes last
    assert [r["type"] for r in ranked] == [
        "author_relationship", "outlet_pitch", "trending_topic",
        "trending_topic", "sentiment_response"]
    assert ranked[0]["priority_score"] == 1.0
    assert ranked[-1]["priority_score"] == pytest.approx(0.85)
