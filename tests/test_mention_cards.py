"""Pins for the keyword / LLM-visibility / domain-snapshot cards
(operators/mention_cards.py) against transcriptions of
mention_opportunity_service.py:543-581,640-752,1754-2026."""

from mivaa_pdf_extractor_spark.operators import mention_cards as mc


def test_fallback_seeds_trim_len_dedup_order(spark):
    subs = spark.createDataFrame(
        [(1, "  Brand One  ", "B1", ["brand one", "b1 tiles", "", "x"])],
        "query_id long, subject_label string, brand_name string, "
        "aliases array<string>")
    out = [(r.seed_rank, r.seed)
           for r in mc.fallback_seeds(subs).collect()]
    # label trimmed and kept first; 'B1' dropped (len<3); 'brand one'
    # normalized-dups the label; '' and 'x' dropped
    assert sorted(out) == [(1, "Brand One"), (2, "b1 tiles")]


def _kw(spark, rows):
    items = spark.createDataFrame(
        rows, "query_id long, ord long, keyword string, "
              "search_volume long, difficulty long, intent string")
    subs = spark.createDataFrame(
        [(1, "seed kw", "GR")],
        "query_id long, used_seed string, country_code string")
    return {r.title: r for r in mc.keyword_opportunity_cards(
        items, subs, limit=2).collect()}


def test_keyword_low_volume_consumes_slot(spark):
    # top-2 by volume = [big, tiny]; tiny (<10) is skipped AFTER the
    # slice, so 'mid' never surfaces (:688-693 sort+slice, :705 skip)
    out = _kw(spark, [(1, 0, "big", 5000, None, None),
                      (1, 1, "tiny", 9, None, None),
                      (1, 2, "mid", 8, None, None)])
    assert set(out) == {"big"}
    assert out["big"].priority_score == 1.0  # min(1, 0.3 + 1.0)


def test_keyword_difficulty_zero_and_intents(spark):
    out = _kw(spark, [(1, 0, "a", 500, 0, "Informational"),
                      (1, 1, "b", 400, None, "mystery")])
    # difficulty 0 is NOT falsy-skipped (is not None check, :716)
    assert " SEO difficulty: 0/100. Intent: Informational." \
        in out["a"].rationale
    assert out["a"].suggested_action.endswith(
        "how-to / explainer / FAQ.")
    # unknown intent: segment printed, no action suffix (:722-729)
    assert " Intent: mystery." in out["b"].rationale
    assert out["b"].suggested_action.endswith("expertise on the topic.")
    assert out["a"].priority_score == 0.3 + 500 / 5000.0


def _llm(spark, snap_rows, model_rows=(), comp_rows=()):
    subs = spark.createDataFrame(
        [(1, "BrandX", "tm-1")],
        "query_id long, subject_label string, "
        "tracked_mention_id string")
    snaps = spark.createDataFrame(
        snap_rows, "query_id long, present boolean, "
        "share_of_voice double, avg_position double, "
        "total_probes long")
    models = spark.createDataFrame(
        list(model_rows) or [], "query_id long, model_ord long, "
        "model string, mentioned long, probes long, "
        "positions array<long>")
    comps = spark.createDataFrame(
        list(comp_rows) or [], "query_id long, comp_ord long, "
        "name string, cnt long")
    return mc.llm_visibility_cards(snaps, models, comps,
                                   subs).collect()[0]


def test_llm_tiers_and_segments(spark):
    # sov exactly 0.5 -> strong tier (>=), avg 0.0 falsy-skipped
    r = _llm(spark, [(1, True, 0.5, 0.0, 16)],
             [(1, 0, "m1", 3, 4, [1, 2]), (1, 1, "m2", 0, 4, [])],
             [(1, k, f"C{k}", 9 - k) for k in range(6)])
    assert r.title == "Strong LLM visibility: 50% share-of-voice"
    assert r.priority_score == 0.6
    assert "Avg rank:" not in r.rationale
    assert "\n  • m1: 3/4 probes mentioned (avg rank #1.5)" \
        in r.rationale
    assert "\n  • m2: 0/4 probes mentioned\n" in r.rationale
    # competitors capped at 5
    assert r.rationale.endswith(
        "competitors: C0 (9), C1 (8), C2 (7), C3 (6), C4 (5)")


def test_llm_absent_card(spark):
    r = _llm(spark, [(1, False, 0.9, None, 16)])
    assert r.title == mc.LLM_ABSENT_TITLE
    assert r.priority_score == 0.4
    assert "/api/v1/mentions/track/tm-1/probe-llm" in r.suggested_action


def _domain(spark, metric_rows, domain="Site.Example.com "):
    subs = spark.createDataFrame(
        [(1, domain)], "query_id long, homepage_domain string")
    mets = spark.createDataFrame(
        list(metric_rows) or [], "query_id long, ord long, "
        "organic_count long, etv long, rank long, "
        "referring_domains long, backlinks long")
    return mc.domain_snapshot_cards(subs, mets).collect()[0]


def test_domain_zero_fold_means_unindexed(spark):
    # zeros never survive the `or` fold (:1944-1956) -> not-indexed
    r = _domain(spark, [(1, 0, 0, 0, 0, 0, 0)])
    assert r.title == "DataForSEO has no organic data for " \
        "site.example.com"
    assert r.priority_score == 0.7


def test_domain_last_truthy_and_details(spark):
    r = _domain(spark, [(1, 0, 100, 2500, 0, None, 15300),
                        (1, 1, None, 3400, 62, 890, 0)])
    # etv 3400 overrides 2500 (last truthy); rank 62 from item 2;
    # backlinks keeps item-1's 15,300 (item-2's 0 is falsy)
    assert r.rationale == (
        "Overall organic SEO position for site.example.com: "
        "100 ranking keywords · ~3,400 estimated monthly organic "
        "visits · 890 referring domains · 15,300 total backlinks. "
        "Domain Rank: 62.")
    assert r.priority_score == 0.6


def test_domain_unconfigured(spark):
    r = _domain(spark, [(1, 0, 1, 1, 1, 1, 1)], domain=" ")
    assert r.title == mc.DOMAIN_TITLE_UNCONFIGURED
    assert r.priority_score == 0.3
