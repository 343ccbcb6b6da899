"""Search fusion / re-ranking semantics (reference: weight_profiles.py,
unified_search_service.py:111-388, rag_service.py:1173-1549,
mmr_reranker.py). Each test pins the operator against an independently
written Python mirror of the reference algorithm."""

import math

import pytest
from pyspark.sql import Row, functions as F

from mivaa_pdf_extractor_spark.operators import search as S


# ---------------------------------------------------------------------------
# weight profiles
# ---------------------------------------------------------------------------

def test_profiles_sum_to_one_and_preserve_base_ratios():
    for name, prof in S.WEIGHT_PROFILES.items():
        assert abs(sum(prof.values()) - 1.0) < 1e-12, name
        base = S._BASE_PROFILES[name]
        # proportional carve-out: ratios among the original 7 unchanged
        aspects = list(base)
        for a, b in zip(aspects, aspects[1:]):
            assert prof[a] * base[b] == pytest.approx(prof[b] * base[a])
        assert prof["page"] == S.PAGE_WEIGHTS[name]


def test_priority_chain(spark):
    flags = ["is_product_name", "has_dimensions", "has_colors", "has_finish",
             "has_pattern", "has_material", "has_style", "has_application"]

    def row(**kw):
        return Row(**{f: kw.get(f, False) for f in flags})

    cases = [
        (row(is_product_name=True, has_dimensions=True), "product_name"),
        (row(has_dimensions=True, has_colors=True), "specification"),
        (row(has_finish=True, has_pattern=True), "color_finish"),
        (row(has_colors=True), "color_finish"),
        (row(has_pattern=True, has_material=True), "texture_pattern"),
        (row(has_material=True, has_style=True), "material_search"),
        (row(has_application=True), "style_aesthetic"),
        (row(has_style=True), "style_aesthetic"),
        (row(), "balanced"),
    ]
    df = spark.createDataFrame([c[0] for c in cases])
    got = [r["profile"] for r in S.select_weight_profile(df).collect()]
    assert got == [c[1] for c in cases]


def test_aspect_and_source_weights(spark):
    df = spark.createDataFrame([Row(profile="product_name"),
                                Row(profile="balanced")])
    out = {r["profile"]: r.asDict()
           for r in S.with_source_weights(S.with_aspect_weights(df)).collect()}
    pn = out["product_name"]
    assert pn["w_text"] == pytest.approx(0.40 * 0.85)
    assert pn["w_page"] == 0.15
    # text fan-out: chunk/product/keyword shares of w_text
    assert pn["w_src_chunk"] == pytest.approx(pn["w_text"] * 0.40)
    assert pn["w_src_product"] == pytest.approx(pn["w_text"] * 0.35)
    assert pn["w_src_keyword"] == pytest.approx(pn["w_text"] * 0.25)
    bal = out["balanced"]
    assert bal["w_understanding"] == pytest.approx(0.20 * 0.90)


def test_profile_to_source_weights():
    src = S.profile_to_source_weights(S.WEIGHT_PROFILES["product_name"])
    # text fans out, everything else 1:1, total still 1.0
    text_w = S.WEIGHT_PROFILES["product_name"]["text"]
    assert src["chunk"] == pytest.approx(text_w * 0.40)
    assert src["keyword"] == pytest.approx(text_w * 0.25)
    assert src["page"] == S.WEIGHT_PROFILES["product_name"]["page"]
    assert sum(src.values()) == pytest.approx(1.0)
    # missing aspects fall back to balanced
    src = S.profile_to_source_weights({})
    bal = S.WEIGHT_PROFILES["balanced"]
    assert src["visual"] == bal["visual"]
    assert src["chunk"] == pytest.approx(bal["text"] * 0.40)


def test_image_only_weights_match_pre_page_constants():
    # full fan-out reproduces the pre-refactor constants: 0.30 visual,
    # 0.20 understanding, 0.50 specialized pool split evenly — the page
    # carve-out cancels under normalization (weight_profiles.py:202-237)
    w = S.image_only_weights(True, S.SPECIALIZED_ASPECTS)
    assert w["visual"] == pytest.approx(0.30)
    assert w["understanding"] == pytest.approx(0.20)
    for a in S.SPECIALIZED_ASPECTS:
        assert w[a] == pytest.approx(0.125)
    # subset: the whole pool splits across the queried aspects only
    w = S.image_only_weights(False, ["color"])
    assert set(w) == {"visual", "color"}
    assert sum(w.values()) == pytest.approx(1.0)
    assert w["color"] == pytest.approx(0.45 / 0.72)


def test_aspect_bias_weights():
    w = S.aspect_bias_weights("texture")
    assert sum(w.values()) == pytest.approx(1.0)
    # the chosen aspect dominates: 0.55 of the pre-normalized 1.075
    assert w["texture"] == pytest.approx(0.55 / 1.075)
    assert w["page"] > 0  # never silently zero
    with pytest.raises(ValueError):
        S.aspect_bias_weights("visual")


# ---------------------------------------------------------------------------
# strategy fusion
# ---------------------------------------------------------------------------

def test_fuse_strategy_results(spark):
    rows = [
        # (id, strategy, rank, score, content)
        ("a", "semantic", 1, 0.9, "sem-a"),
        ("a", "keyword", 2, 0.5, "kw-a"),
        ("a", "visual", 3, 0.1, "vis-a"),
        ("b", "keyword", 2, 0.6, "kw-b"),
        ("c", "visual", 3, 0.3, "vis-c"),
        ("c", "semantic", 1, 0.7, "sem-c"),
    ]
    df = spark.createDataFrame(
        rows, "result_id string, strategy string, strategy_rank int, "
              "score double, content string")
    got = {r["result_id"]: r for r in S.fuse_strategy_results(df).collect()}
    assert got["a"]["fused_score"] == pytest.approx((0.9 + 0.5 + 0.1) / 3)
    assert got["a"]["strategies_found"] == 3
    assert got["a"]["first_strategy"] == "semantic"
    assert got["a"]["content"] == "sem-a"
    assert got["b"]["fused_score"] == pytest.approx(0.6)
    assert got["b"]["strategies_found"] == 1
    # dedup keeps the FIRST strategy's payload even when a later strategy
    # scored higher
    assert got["c"]["content"] == "sem-c"


# ---------------------------------------------------------------------------
# keyword text score — mirror of rag_service.py:1452-1549
# ---------------------------------------------------------------------------

def _mirror_text_score(query, fields):
    """Direct transcription of the reference loop (weighted Jaccard +
    substring bonus accumulated +0.1 at a time)."""
    q_words = set(query.lower().split())
    total_score = total_weight = 0.0
    for text, weight in fields:
        if not text:
            continue
        tl = str(text).lower()
        tw = set(tl.split())
        if not tw:
            continue
        inter, union = q_words & tw, q_words | tw
        jacc = len(inter) / len(union) if union else 0.0
        bonus = 0.0
        for w in q_words:
            if len(w) > 3 and w in tl:
                bonus += 0.1
        total_score += min(1.0, jacc + bonus) * weight
        total_weight += weight
    return min(1.0, total_score / total_weight) if total_weight else 0.0


def test_keyword_text_score_matches_mirror(spark):
    query = "modern ceramic tile red collection"
    rows = [
        Row(pid=1, name="Modern Ceramic Tile", description="a red glossy tile",
            manufacturer="Acme Ceramics", colors="red blue"),
        Row(pid=2, name="Oak Plank", description=None,
            manufacturer="", colors="brown"),
        Row(pid=3, name="ceramic ceramic ceramic", description="collection",
            manufacturer="TileWorks", colors=None),
    ]
    df = spark.createDataFrame(rows)
    fields = [("name", 3.0), ("manufacturer", 3.0), ("colors", 1.5),
              ("description", 2.0)]
    got = {r["pid"]: r["keyword_score"]
           for r in S.keyword_text_score(df, query, fields).collect()}
    for r in rows:
        expected = _mirror_text_score(query, [
            (r.name, 3.0), (r.manufacturer, 3.0), (r.colors, 1.5),
            (r.description, 2.0)])
        assert got[r.pid] == pytest.approx(expected, abs=1e-12), r.pid
    # the empty/None fields contributed no weight: pid=2 scored only on
    # name+colors
    assert got[2] == pytest.approx(_mirror_text_score(
        query, [("Oak Plank", 3.0), ("brown", 1.5)]), abs=1e-12)


def test_keyword_score_field_cap(spark):
    # an exact-match field has Jaccard 1.0 AND substring bonuses — the
    # per-field score must cap at 1.0, not reach 1.4
    query = "alpha beta gamma delta"
    df = spark.createDataFrame(
        [Row(pid=1, name="alpha beta gamma delta"),
         Row(pid=2, name="alphabet betamax gammaray deltawing "
                         "alpha beta gamma delta")])
    got = {r["pid"]: r["keyword_score"]
           for r in S.keyword_text_score(df, query, [("name", 3.0)])
           .collect()}
    assert got[1] == 1.0
    # partial-overlap case still tracks the mirror (jaccard 0.5 + 4 * 0.1)
    expected = _mirror_text_score(
        query, [("alphabet betamax gammaray deltawing "
                 "alpha beta gamma delta", 3.0)])
    assert got[2] == pytest.approx(expected, abs=1e-12)
    assert got[2] == pytest.approx(0.9, abs=1e-12)


# ---------------------------------------------------------------------------
# hybrid fusion — mirror of rag_service.py:1182-1255
# ---------------------------------------------------------------------------

def test_hybrid_fuse_active_weight_normalization(spark):
    weights = {"visual": 0.25, "chunk": 0.25, "understanding": 0.1875,
               "product": 0.1875, "keyword": 0.125}
    rows = [
        # p1: two embedding sources active -> full threshold
        ("p1", "visual", 0.8), ("p1", "chunk", 0.6), ("p1", "keyword", 0.4),
        # p2: keyword-only hit — must NOT be diluted by unused weights
        ("p2", "keyword", 0.4),
        ("p2", "visual", 0.0),
        # p3: one embedding source, below even the lowered bar
        ("p3", "chunk", 0.05),
    ]
    df = spark.createDataFrame(rows, "product_id string, source string, "
                                     "score double")
    out = {r["product_id"]: r
           for r in S.hybrid_fuse(df, weights,
                                  similarity_threshold=0.3).collect()}

    # p1: weighted mean over active sources only
    ws = 0.8 * 0.25 + 0.6 * 0.25 + 0.4 * 0.125
    aw = 0.25 + 0.25 + 0.125
    assert out["p1"]["score"] == pytest.approx(ws / aw)
    assert out["p1"]["active_embedding_sources"] == 2
    assert out["p1"]["effective_threshold"] == pytest.approx(0.3)
    assert out["p1"]["visual_score"] == pytest.approx(0.8)
    assert out["p1"]["understanding_score"] == 0.0

    # p2: single-source normalization -> score stays 0.4, adaptive
    # threshold 0.09 lets it through (the reference's dilution bug fix)
    assert out["p2"]["score"] == pytest.approx(0.4)
    assert out["p2"]["effective_threshold"] == pytest.approx(0.09)

    # p3: 0.05 < 0.09 — filtered out
    assert "p3" not in out


def test_similarity_floor_report(spark):
    # mirror of rag_routes.py summarize_similarity_floor on one result set
    scores = [0.9, 0.7, 0.5, 0.3, 0.1]
    rows = [Row(query_id=1, score=s) for s in scores] + \
           [Row(query_id=2, score=0.95)]
    df = spark.createDataFrame(rows)
    out = {r["query_id"]: r
           for r in S.similarity_floor_report(df, floor=0.5).collect()}
    r1 = out[1]
    assert (r1["candidates"], r1["kept"], r1["rejected"]) == (5, 3, 2)
    assert r1["best_score"] == pytest.approx(0.9)
    assert r1["worst_kept"] == pytest.approx(0.5)   # floor is inclusive
    assert r1["top_rejected"] == pytest.approx(0.3)  # best hit thrown away
    # floor did nothing for query 2 -> top_rejected is NULL
    r2 = out[2]
    assert r2["rejected"] == 0 and r2["top_rejected"] is None


# ---------------------------------------------------------------------------
# MMR — mirror of mmr_reranker.py:114-160
# ---------------------------------------------------------------------------

def _mirror_mmr(cands, lam, top_k):
    """cands: list of (cand_id, rel, emb). Direct transcription of the
    greedy loop: scan order = input order, strict >."""
    n = len(cands)
    if lam >= 1.0 or n <= top_k:
        return [(c[0], c[1], c[1], 0.0) for c in cands[:top_k]]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    sim = [[cos(a[2], b[2]) for b in cands] for a in cands]
    rel = [c[1] for c in cands]
    first = max(range(n), key=lambda i: rel[i])  # first max wins ties
    selected = [first]
    out = [(cands[first][0], rel[first], rel[first], 0.0)]
    remaining = [i for i in range(n) if i != first]
    while len(selected) < top_k and remaining:
        best, best_mmr, best_div = -1, -float("inf"), 0.0
        for i in remaining:
            div = 1.0 - max(sim[i][s] for s in selected)
            m = lam * rel[i] + (1.0 - lam) * div
            if m > best_mmr:
                best, best_mmr, best_div = i, m, div
        selected.append(best)
        remaining.remove(best)
        out.append((cands[best][0], rel[best], best_mmr, best_div))
    return out


def _mmr_fixture():
    # two near-identical high-relevance docs + one diverse lower-relevance
    # doc: pure top-k keeps the twins, MMR demotes the second twin
    return [
        (10, 0.9, [1.0, 0.0, 0.0]),
        (11, 0.85, [1.0, 0.05, 0.0]),
        (12, 0.5, [0.0, 1.0, 0.0]),
        (13, 0.4, [0.0, 0.0, 1.0]),
    ]


def _run_mmr(spark, cands, lam, top_k):
    rows = [Row(query_id=1, ord=i, cand_id=c[0], rel=float(c[1]),
                emb=[float(x) for x in c[2]])
            for i, c in enumerate(cands)]
    df = spark.createDataFrame(rows)
    out = (S.mmr_rerank(df, lambda_param=lam, top_k=top_k)
           .orderBy("rank").collect())
    return [(r["cand_id"], r["relevance"], r["mmr_score"],
             r["diversity_gain"]) for r in out]


def test_mmr_matches_mirror_and_diversifies(spark):
    cands = _mmr_fixture()
    got = _run_mmr(spark, cands, lam=0.7, top_k=3)
    exp = _mirror_mmr(cands, 0.7, 3)
    assert [g[0] for g in got] == [e[0] for e in exp]
    for g, e in zip(got, exp):
        for gi, ei in zip(g[1:], e[1:]):
            assert gi == pytest.approx(ei, abs=1e-12)
    # diversification actually happened: the near-twin 11 (rel 0.85) was
    # demoted below the orthogonal doc 12 (rel 0.5) at rank 2; pure top-k
    # would have kept [10, 11, 12]
    assert [g[0] for g in got] == [10, 12, 11]


def test_mmr_tie_break_earliest_wins(spark):
    # equal relevance and orthogonal vectors -> every step ties on mmr;
    # the earliest ord must win each round (reference: strict > scan)
    cands = [(i, 0.5, [1.0 if j == i else 0.0 for j in range(4)])
             for i in range(4)]
    got = _run_mmr(spark, cands, lam=0.5, top_k=4)
    assert [g[0] for g in got] == [0, 1, 2, 3]
    assert got == [(c, r, m, d) for (c, r, m, d) in got]  # shape sanity
    exp = _mirror_mmr(cands, 0.5, 4)
    assert [g[0] for g in got] == [e[0] for e in exp]


def test_mmr_zero_norm_embedding_does_not_poison_group(spark):
    # a zero-norm vector must not NaN-poison the greedy loop (review
    # finding): sims involving it are defined as 0, so it competes on
    # relevance + full diversity credit, and the job completes
    cands = [(10, 0.9, [0.0, 0.0]), (11, 0.5, [1.0, 0.0]),
             (12, 0.4, [0.0, 1.0])]
    got = _run_mmr(spark, cands, lam=0.7, top_k=2)
    assert [g[0] for g in got] == [10, 11]
    # step 2: both remaining have sim 0 to the zero vector -> div 1.0,
    # pure-relevance order decides
    assert got[1][3] == pytest.approx(1.0)


def test_keyword_score_whitespace_only_field_excluded(spark):
    # review finding: a whitespace-only field must contribute neither
    # score nor weight (the reference's empty-word-set skip)
    query = "alpha beta"
    df = spark.createDataFrame([Row(pid=1, name="alpha beta", colors=" ")])
    got = S.keyword_text_score(
        df, query, [("name", 3.0), ("colors", 1.5)]).collect()[0]
    assert got["keyword_score"] == pytest.approx(
        _mirror_text_score(query, [("alpha beta", 3.0), (" ", 1.5)]),
        abs=1e-12)
    assert got["keyword_score"] == 1.0


def test_mmr_short_circuit_paths(spark):
    cands = _mmr_fixture()
    # n <= top_k: input order, mmr == rel, zero gains (reference
    # short-circuit — notably NOT sorted by relevance)
    got = _run_mmr(spark, cands, lam=0.7, top_k=10)
    assert [g[0] for g in got] == [10, 11, 12, 13]
    assert all(g[2] == g[1] and g[3] == 0.0 for g in got)
    # lam >= 1.0: same path
    got = _run_mmr(spark, cands, lam=1.0, top_k=2)
    assert [g[0] for g in got] == [10, 11]
