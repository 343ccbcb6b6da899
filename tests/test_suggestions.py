"""Pins for the search-suggestions tier (operators/suggestions.py)
against transcriptions of search_suggestions_service.py."""

from difflib import SequenceMatcher

from mivaa_pdf_extractor_spark.operators import suggestions as sg


def test_autocomplete_budget_and_dedup(spark):
    # one query, limit 4: db tier has 3 matches (one inactive
    # excluded), trending 2 daily -> budget 1, later tiers starved
    queries = spark.createDataFrame(
        [(0, "ti", 4, None, None)],
        "qid long, q string, lim int, user_id string, category string")
    sugg = spark.createDataFrame(
        [(1, "tile a", True, "c", 0.5), (2, "Tile b", True, "c", 0.75),
         (3, "tinder", False, "c", 0.9), (4, "tile a", True, "c", 0.25),
         (5, "wood", True, "c", 0.9)],
        "sid long, suggestion_text string, is_active boolean, "
        "category string, popularity_score double")
    trend = spark.createDataFrame(
        [(1, "retile now", 90.0, "daily"), (2, "anti tile", 80.0, "daily"),
         (3, "tile week", 99.0, "weekly")],
        "tid long, query_text string, trend_score double, "
        "time_window string")
    empty_an = spark.createDataFrame(
        [], "aid long, user_id string, query_text string, "
            "created_at int, follow_up_queries array<string>")
    empty_pop = spark.createDataFrame(
        [], "query_text string, search_count int")
    empty_pr = spark.createDataFrame([], "pid long, name string")
    out = sorted(sg.autocomplete(queries, sugg, trend, empty_an,
                                 empty_pop, empty_pr).collect(),
                 key=lambda r: r.position)
    # db candidates by score: Tile b .75, tile a .5, tile a .25
    # (dup consumed budget) -> trending budget 1 -> retile (90 > 80)
    texts = [r.suggestion_text for r in out]
    assert texts == ["retile now", "Tile b", "tile a"]
    # dedup dropped the second 'tile a' AFTER it consumed budget;
    # trending score 0.9 sorts first
    assert out[0].popularity_score == 0.9
    assert out[0].suggestion_type == "trending"


def ref_check_typos(q, corrections, analytics, include_fuzzy=True):
    out = []
    for c in sorted([c for c in corrections
                     if c["original_query"] == q.lower()],
                    key=lambda c: (-c["confidence_score"], c["cid"]))[:3]:
        out.append((c["corrected_query"], c["correction_type"],
                    c["confidence_score"], c["acceptance_rate"]))
    words = q.lower().split()
    for i, w in enumerate(words):
        if w in sg.ABBREVIATIONS:
            ws = words.copy()
            ws[i] = sg.ABBREVIATIONS[w]
            out.append((" ".join(ws), "abbreviation", 0.85, 0.7))
    if include_fuzzy:
        fz = []
        for a in analytics:
            cand = a["query_text"]
            if cand.lower() == q.lower():
                continue
            s1, s2 = q.lower().strip(), cand.lower().strip()
            r = SequenceMatcher(None, s1, s2).ratio()
            if r >= 0.75:
                fz.append((r, a["aid"], cand))
        fz.sort(key=lambda x: (-x[0], x[1]))
        out.extend([(c, "spelling", r, 0.6) for r, _a, c in fz[:3]])
    out.sort(key=lambda x: -x[2])  # stable
    out = out[:3]
    res = []
    for i, (cq, ct, conf, ar) in enumerate(out):
        res.append({"position": i + 1, "corrected_query": cq,
                    "correction_type": ct, "confidence_score": conf,
                    "auto_applied": i == 0 and conf >= 0.9,
                    "acceptance_rate": ar})
    return res


def test_typos_match_reference(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = sg.check_typos(sg.synth_typo_queries(ev),
                         sg.synth_sugg_corrections(ev),
                         sg.synth_sugg_analytics(ev),
                         include_fuzzy=True).collect()
    got = {}
    for r in out:
        got.setdefault(r.qid, []).append(r)
    corrections = [{"cid": c, "original_query":
                    ["ti", "ce", "wood res"][c % 3],
                    "corrected_query": "fix %d" % c,
                    "correction_type": "known",
                    "confidence_score": 0.5 + (c % 5) * 0.125,
                    "acceptance_rate": (c % 4) * 0.25}
                   for c in range(12)]
    analytics = [{"aid": a, "query_text":
                  ["tile adhesive", "firebrick", "wood panel",
                   "ceiling rose"][a % 4] + " q%d" % (a % 7)}
                 for a in range(40)]
    n_fuzzy = n_auto = 0
    for qid, q in enumerate(sg._TYPO_QUERIES):
        want = ref_check_typos(q, corrections, analytics)
        have = sorted(got.get(qid, []), key=lambda r: r.position)
        assert len(have) == len(want), (qid, q)
        for w, h in zip(want, have):
            assert h.corrected_query == w["corrected_query"], (qid, q)
            assert abs(h.confidence_score
                       - w["confidence_score"]) < 1e-12
            assert h.auto_applied == str(w["auto_applied"]).lower()
            if w["correction_type"] == "spelling":
                n_fuzzy += 1
            if w["auto_applied"]:
                n_auto += 1
    assert n_fuzzy > 0 and n_auto > 0  # fuzzy + auto paths exercised
    assert got.get(7) is None           # 'zzz nothing' -> no rows


def test_expand_pins(spark):
    queries = spark.createDataFrame(
        [(0, "Fire resistant tile fire", ),
         (1, "plain words", )],
        "qid long, q string")
    an = spark.createDataFrame(
        [(1, "u0", "big fire sale", 5, ["foo", "bar"]),
         (2, "u1", "fireplace ideas", 4, ["bar"]),
         (3, "u2", "fire resistant tile fireproof", 3, None)],
        "aid long, user_id string, query_text string, created_at int, "
        "follow_up_queries array<string>")
    out = {r.qid: r for r in sg.expand_queries(queries, an).collect()}
    # repeated 'fire' extends terms twice but set-dedups; dict keeps
    # one entry; word order fire < resistant < tile
    assert out[0].synonyms_render == (
        "fire=[flame|heat|thermal];"
        "resistant=[proof|repellent|protective];"
        "tile=[tiles|tiling|ceramic]")
    assert out[0].expanded_terms_csv == (
        "ceramic,flame,heat,proof,protective,repellent,thermal,tiles,"
        "tiling")
    assert out[1].expanded_terms_csv == ""
    # only 'plain words' matches nothing; query 0 substring-matches no
    # analytics query_text (none contains the full phrase)
    assert out[0].related_csv == ""
