"""Pins for the SERP-block parser and opportunity builders
(operators/serp_opps.py) against transcriptions of
mention_opportunity_service.py:1046-1753."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import serp_opps as so

ITEM_SCHEMA = (
    "query_id long, arrival int, pos int, itype string, title string, "
    "description string, url string, domain string, source string, "
    "author string, duration string, event_ts string, seller string, "
    "price double, currency string, rating double, text string, "
    "expanded string, rank long, subtitle string, card_id string, "
    "image_url string")

_N = [None] * 18


def _row(qid, arrival, pos, itype, **f):
    base = dict(title=None, description=None, url=None, domain=None,
                source=None, author=None, duration=None, event_ts=None,
                seller=None, price=None, currency=None, rating=None,
                text=None, expanded=None, rank=None, subtitle=None,
                card_id=None, image_url=None)
    base.update(f)
    return (qid, arrival, pos, itype, base["title"],
            base["description"], base["url"], base["domain"],
            base["source"], base["author"], base["duration"],
            base["event_ts"], base["seller"], base["price"],
            base["currency"], base["rating"], base["text"],
            base["expanded"], base["rank"], base["subtitle"],
            base["card_id"], base["image_url"])


def _parse(spark, rows, limit=2):
    df = spark.createDataFrame(rows, ITEM_SCHEMA)
    return so.parse_serp_blocks(df, limit=limit).collect()


def test_pao_dedup_blank_and_cap(spark):
    rows = [_row(1, 1, i, "people_also_ask", title=t) for i, t in
            enumerate(["How it works", "how  it WORKS", "", "Q2", "Q3",
                       "Q4", "Q5"])]
    out = sorted([r for r in _parse(spark, rows, limit=2)
                  if r.block_type == "pao"], key=lambda r: r.pos)
    # dup (normalized) + blank skipped; cap 2*limit = 4
    assert [r.title for r in out] == ["How it works", "Q2", "Q3", "Q4"]
    assert [r.pos for r in out] == [1, 2, 3, 4]


def test_first_ai_block_claims_slot(spark):
    rows = [
        _row(1, 2, 0, "ai_overview", text="first block text"),
        _row(1, 2, 0, "ai_overview_ref", title="R1", domain="d1.com"),
        _row(1, 5, 0, "ai_overview", text="second block text"),
    ]
    out = _parse(spark, rows)
    ai = [r for r in out if r.block_type == "ai_overview"]
    assert len(ai) == 1 and ai[0].text == "first block text"
    assert [r.title for r in out if r.block_type == "ai_reference"] \
        == ["R1"]


def test_video_cross_block_dedup_and_platforms(spark):
    rows = [
        _row(1, 30, 0, "video", url="https://youtube.com/w?v=1",
             domain="youtube.com", title="a", source="s"),
        _row(1, 30, 1, "video", url="", domain="x.com", title="ghost"),
        _row(1, 31, 0, "short_videos", url="https://youtube.com/w?v=1",
             domain="youtube.com", title="dup"),
        _row(1, 31, 1, "short_videos", url="https://youtu.be/2",
             domain="youtu.be", title="b", author="auth"),
        _row(1, 32, 0, "inline_videos", url="https://fb.watch/3",
             domain="FB.watch", title="c", source=""),
    ]
    out = {r.url: r for r in _parse(spark, rows)
           if r.block_type == "video"}
    assert set(out) == {"https://youtube.com/w?v=1",
                        "https://youtu.be/2", "https://fb.watch/3"}
    v1 = out["https://youtube.com/w?v=1"]
    assert (v1.kind, v1.platform) == ("video", "youtube")
    v2 = out["https://youtu.be/2"]
    # short kind flips youtube -> youtube_shorts; author fallback
    assert (v2.kind, v2.platform, v2.creator) == (
        "short", "youtube_shorts", "auth")
    v3 = out["https://fb.watch/3"]
    assert (v3.kind, v3.platform) == ("inline", "facebook")


def test_paid_unwrap_and_empty_domain_skip(spark):
    rows = [
        _row(1, 60, 0, "paid", domain="Ads.example.com", title="A",
             rank=1),
        _row(1, 61, 0, "paid", domain="", title="ghost"),
        _row(1, 62, 0, "commercial_units", domain="cu.example.com",
             title="B"),
    ]
    out = sorted([r for r in _parse(spark, rows)
                  if r.block_type == "paid"], key=lambda r: r.pos)
    assert [(r.domain, r.pos) for r in out] == [
        ("ads.example.com", 1), ("cu.example.com", 2)]


def _subjects(spark, qid=1, label="BrandX", seed="brandx tiles"):
    return spark.createDataFrame(
        [(qid, label, "BX Works", ["bx works"], seed, False)],
        "query_id long, subject_label string, brand_name string, "
        "aliases array<string>, used_seed string, "
        "seed_was_fallback boolean")


def test_competitor_rank_decay_and_falsy_rank(spark):
    rows = [
        _row(1, 10, 0, "organic", domain="a.com", title="t0",
             description="d0", url="https://a.com", rank=1),
        _row(1, 11, 0, "organic", domain="", title="skip"),
        _row(1, 12, 0, "organic", domain="B.com", title="t2",
             description="d2", url="", rank=0),
        _row(1, 13, 0, "organic", domain="c.com", title="t3",
             description="d3", url="https://c.com", rank=3),
    ]
    parsed = so.parse_serp_blocks(
        spark.createDataFrame(rows, ITEM_SCHEMA), limit=2)
    opps = {r.title: r for r in so.build_serp_opportunities(
        parsed, _subjects(spark), limit=3).collect()
        if r.opp_type == "competitor_ranking"}
    # empty domain skipped; kept-index decay 1.0, 0.9, 0.8; rank 0
    # renders '?' (falsy, :1447); empty url falls back to the domain
    assert set(opps) == {"#1 — a.com", "#? — b.com", "#3 — c.com"}
    assert opps["#1 — a.com"].priority_score == 1.0
    assert opps["#? — b.com"].priority_score == 0.9
    assert opps["#? — b.com"].suggested_action.startswith(
        "Audit the page at b.com:")
    assert opps["#3 — c.com"].priority_score == 0.8


def test_video_card_platform_mix_insertion_tiebreak(spark):
    # one clip per platform (all counts tie): summary and dominant
    # follow first-appearance order, the reference's dict-insertion
    # stability (:1502-1506)
    rows = [
        _row(1, 30, 0, "video", url="u1", domain="vimeo.com",
             title="x", source="s1"),
        _row(1, 30, 1, "video", url="u2", domain="tiktok.com",
             title="y", source="s2"),
        _row(1, 30, 2, "video", url="u3", domain="youtube.com",
             title="z", source="s3"),
    ]
    parsed = so.parse_serp_blocks(
        spark.createDataFrame(rows, ITEM_SCHEMA), limit=2)
    card = [r for r in so.build_serp_opportunities(
        parsed, _subjects(spark), limit=2).collect()
        if r.opp_type == "video_carousel"][0]
    assert "Platform mix: vimeo:1, tiktok:1, youtube:1." \
        in card.rationale
    assert "NOT present" in card.title
    assert "(vimeo)" in card.suggested_action  # dominant = first max
    assert card.priority_score == 0.85


def test_shopping_price_branches(spark):
    rows = [
        _row(1, 70, 0, "popular_products", title="P1", seller="S1",
             domain="d.com", price=12.5, currency="EUR", rating=4.5),
        _row(1, 70, 1, "popular_products", title="P2", seller="",
             source="Src2", domain="d2.com", price=8.25),
        _row(1, 70, 2, "shopping", title="P3", seller="S3",
             domain="d3.com", currency="EUR"),
    ]
    parsed = so.parse_serp_blocks(
        spark.createDataFrame(rows, ITEM_SCHEMA), limit=2)
    opps = {r.title: r.rationale for r in so.build_serp_opportunities(
        parsed, _subjects(spark), limit=3).collect()
        if r.opp_type == "shopping_listing"}
    assert " at 12.5 EUR sold by S1 (rating: 4.5)." in opps["P1"]
    # price without currency -> bare str(price); seller falls to source
    assert " at 8.25 sold by Src2" in opps["P2"]
    # no price -> no price segment at all
    assert " at " not in opps["P3"] and " sold by S3" in opps["P3"]


def test_knowledge_graph_absent_and_present(spark):
    rows = [_row(1, 50, 0, "knowledge_graph", title="BrandX",
                 subtitle="", description="")]
    parsed = so.parse_serp_blocks(
        spark.createDataFrame(rows, ITEM_SCHEMA), limit=2)
    subs = _subjects(spark).union(_subjects(spark, qid=2,
                                            label="BrandY",
                                            seed="brandy tiles"))
    kg = {r.query_id: r for r in so.build_serp_opportunities(
        parsed, subs, limit=2).collect()
        if r.opp_type == "knowledge_graph"}
    assert kg[1].title == "Google Knowledge Panel exists: BrandX"
    assert kg[1].priority_score == 0.6
    # no subtitle/description -> neither optional segment
    assert kg[1].rationale.endswith('Knowledge Panel: "BrandX"')
    assert kg[2].title == so.KG_TITLE_ABSENT
    assert kg[2].priority_score == 0.75


def test_ai_overview_ellipsis_and_brand_check(spark):
    long_text = "BrandX " + "word " * 80  # > 280 chars
    rows = [_row(1, 2, 0, "ai_overview", text=long_text),
            _row(1, 2, 0, "ai_overview_ref", title="R", domain="r.com")]
    parsed = so.parse_serp_blocks(
        spark.createDataFrame(rows, ITEM_SCHEMA), limit=2)
    card = [r for r in so.build_serp_opportunities(
        parsed, _subjects(spark), limit=2).collect()
        if r.opp_type == "ai_overview"][0]
    assert card.title == "Google's AI Overview cites BrandX"
    assert "…" in card.rationale           # >280 truncation marker
    assert "Cited references: r.com" in card.rationale
    assert card.priority_score == 0.95
