"""Pins for mention discovery curation
(operators/mention_curation.py) against transcriptions of
mention_search_service.py:107-331,747-763 and
tracked_mentions_service.py:623-723."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import mention_curation as mcu


def test_canonicalize_url(spark):
    rows = [(1, "https://WWW.Ex.COM/a/b/?utm_x=1&id=2&REF=z&k#frag"),
            (2, "http://a.com"), (3, "a.com/x?share=1&q=2"), (4, "")]
    df = spark.createDataFrame(rows, "i long, url string")
    out = {r.i: r.c for r in df.select(
        "i", mcu.canonicalize_mention_url(F.col("url")).alias("c"))
        .collect()}
    # tracking keys dropped case-insensitively; '=’-less pair dropped;
    # fragment dropped; path rstrip; empty path -> '/'
    assert out[1] == "https://ex.com/a/b?id=2"
    assert out[2] == "http://a.com/"
    # schemeless: urlparse puts everything in path; scheme defaults
    assert out[3] == "https://a.com/x?q=2"
    assert out[4] == ""


def test_country_and_outlet(spark):
    rows = [(1, "skai.gr"), (2, "bbc.co.uk"), (3, "x.de"),
            (4, "cnn.com"), (5, "youtu.be"), (6, "news.google.com")]
    df = spark.createDataFrame(rows, "i long, host string")
    out = {r.i: (r.cc, r.ot) for r in df.select(
        "i", mcu.matches_country(F.col("host"), ["GR", "GB"])
        .alias("cc"),
        mcu.classify_outlet_type(F.col("host")).alias("ot")).collect()}
    assert out[1] == (True, "news")     # .gr TLD
    assert out[2] == (True, "news")     # GB allowlist (no .gb TLD)
    assert out[3] == (False, "news")    # .de not in list
    assert out[4] == (False, "news")
    assert out[5][1] == "youtube"
    assert out[6][1] == "aggregator"


def test_fanout_raw_dup_blocks_filtered_survivor(spark):
    # all_aliases dedups on the RAW form first: ' ab ' normalizes to
    # the label 'ab' and is consumed there, even though 'ab' itself is
    # then dropped by the len filter — so ' ab ' can never resurface
    subs = spark.createDataFrame(
        [(1, "ab", [" ab ", "Gamma Tile Series", "Beta"])],
        "subject_id long, label string, aliases array<string>")
    out = sorted((r.query_rank, r.query)
                 for r in mcu.fanout_queries(subs, 3).collect())
    assert out == [(1, "Gamma Tile Series"), (2, "Beta")]


def test_fanout_fallback_label(spark):
    subs = spark.createDataFrame(
        [(1, "12._", []), (2, "", ["x"])],
        "subject_id long, label string, aliases array<string>")
    out = {r.subject_id: r.query
           for r in mcu.fanout_queries(subs, 3).collect()}
    # filtered-out label still returned as the raw fallback (:328);
    # falsy label -> no rows at all
    assert out == {1: "12._"}


def test_dedupe_rejected_row_registers_nothing(spark):
    rows = [
        (1, 0, "https://a.com/x?utm_a=1", "T1", "", "Body one"),
        (1, 1, "https://www.a.com/x/", "T9", "", ""),     # dup URL
        (1, 2, "https://b.com/y", "T1", "Body one", ""),  # dup hash
        # same URL as the REJECTED row 2 -> kept (:755-760 registers
        # keys only on accept)
        (1, 3, "https://b.com/y", "Different", "", "Other text"),
        (1, 4, "https://c.com/", "", "", ""),   # blank -> url hash
        (1, 5, "https://c.com/", "", "", ""),   # dup URL
    ]
    df = spark.createDataFrame(
        rows, "subject_id long, ord long, url string, title string, "
              "excerpt string, body_md string")
    out = sorted((r.ord, r.keep_rank)
                 for r in mcu.dedupe_mention_hits(df).collect())
    assert out == [(0, 1), (3, 2), (4, 3)]


def test_summary_semantics(spark):
    rows = [
        (1, 0, "2026-07-10", "2026-08-01", "positive", 0.5, "a.com"),
        (1, 1, "2026-07-11", "2026-08-02", "neutral", None, "a.com"),
        (1, 2, "2026-07-12", "2026-08-03", "negative", -0.25, ""),
        (1, 3, "2026-07-13", "2026-08-01", None, 0.25, "b.com"),
    ]
    df = spark.createDataFrame(
        rows, "subject_id long, hist_id long, published_at string, "
              "discovered_at string, sentiment string, "
              "sentiment_score double, outlet_domain string")
    out = {r.outlet_rank: r
           for r in mcu.mention_summary(df).collect()}
    r = out[1]
    assert (r.n_positive, r.n_neutral, r.n_negative) == (1, 1, 1)
    # None score coerced to 0: (0.5 + 0 - 0.25 + 0.25) / 4
    assert r.sentiment_avg == 0.125
    # latest_at = discovered_at of the most recently PUBLISHED row
    assert r.latest_at == "2026-08-01"
    # a.com(2) first; tie between '' -> unknown and b.com breaks by
    # first appearance in published-DESC order (b.com pub 07-13 first)
    assert (out[1].domain, out[2].domain, out[3].domain) == \
        ("a.com", "b.com", "unknown")


def test_anomaly_flag_and_gate(spark):
    trailing = spark.createDataFrame(
        [(1, s) for s in [0.5, 0.5, 0.25, 0.5, 0.75, 0.5]]
        + [(2, s) for s in [0.5, 0.5, 0.25]],
        "subject_id long, score double")
    rows = spark.createDataFrame(
        [(1, 0, 0.0), (1, 1, 0.25), (1, 2, 1.0), (1, 3, None),
         (2, 0, 0.0)],
        "subject_id long, row_id long, sentiment_score double")
    out = {(r.subject_id, r.row_id): r
           for r in mcu.stamp_anomalies(rows, trailing).collect()}
    flagged = out[(1, 0)]
    assert flagged.is_anomaly
    assert flagged.anomaly_reason == \
        "sentiment 0.00 is 3.2σ below 7d median 0.50"
    assert not out[(1, 1)].is_anomaly   # z = 1.58 < 2.5
    assert not out[(1, 2)].is_anomaly   # above the median
    assert not out[(1, 3)].is_anomaly   # null score
    assert not out[(2, 0)].is_anomaly   # < 5 trailing samples


def test_velocity_edges(spark):
    df = spark.createDataFrame(
        [(1, 3, 0), (2, 0, 0), (3, 14, 14)],
        "subject_id long, current_count long, total_7d long")
    out = {r.subject_id: r.velocity_pct
           for r in mcu.compute_velocity(df).collect()}
    assert out[1] == 100.0   # no history, positive current
    assert out[2] == 0.0     # no history, zero current
    assert out[3] == (14 - 2) / 2 * 100.0  # avg 2/day -> 600%
