"""Transcription pins for the marketplace facet filter + Skroutz fold
(operators/marketplace_facets.py) vs re-implementations of
facet_filter.py:30-165 and adapters/skroutz.py:148-351."""

import re
import unicodedata
from urllib.parse import unquote, urlparse

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import (
    marketplace_facets as mf)
from mivaa_pdf_extractor_spark.operators.identity import \
    MATCH_STOPWORDS

SF = "/root/testdata/sf0.001/documents.parquet"

GREEK_TO_LATIN = dict(zip("ΑΒΕΖΗΙΚΜΝΟΡΤΥΧαβεζηικμνορτυχ",
                          "ABEZHIKMNOPTYXabezhikmnoptyx"))


def _doc_ids(spark):
    return [r.d for r in spark.read.parquet(SF).select(
        F.col("doc_id").cast("long").alias("d")).distinct().collect()]


def strip_accents(text):
    nfd = unicodedata.normalize("NFD", text)
    return "".join(c for c in nfd
                   if unicodedata.category(c) != "Mn")


def norm_model_token(token):
    if not token:
        return ""
    mapped = "".join(GREEK_TO_LATIN.get(ch, ch) for ch in token)
    return re.sub(r"[\s\-_./]+", "", strip_accents(mapped).upper())


def norm_text(text):
    if not text:
        return ""
    return " ".join(strip_accents(text).lower().split())


def ref_adaptive(query, has_facets, sku, brand, model):
    """facet_filter.adaptive_marketplace_query:30-72 verbatim."""
    if not has_facets:
        return query
    sku = sku or None
    brand = (brand or "").strip().upper() or None
    model = (model or "").strip().upper() or None
    if sku and brand and model:
        return f"{brand} {model} {sku}"
    if sku and brand:
        return f"{brand} {sku}"
    if sku and model:
        return f"{model} {sku}"
    if sku:
        return sku
    if brand and model:
        return f"{brand} {model}"
    return query


def test_adaptive_matches_reference(spark):
    got = {r.req_id: (r.adapted_query, r.strategy)
           for r in mf.adaptive_query(mf.synth_adaptive_requests(
               spark.read.parquet(SF))).collect()}
    strategies = set()
    for doc in _doc_ids(spark):
        query = f"free text query {doc % 5}"
        has = doc % 7 != 1
        sku = f"10{doc % 90 + 10}" if doc % 2 == 0 else None
        brand = [" alpha ", "", None, "Beta"][doc % 4]
        model = ["modelx", "  ", None][doc % 3]
        want = ref_adaptive(query, has, sku, brand, model)
        assert got[doc][0] == want, doc
        strategies.add(got[doc][1])
    assert strategies == {"no_facets", "brand_model_sku", "brand_sku",
                          "model_sku", "sku", "brand_model",
                          "fallthrough"}


def ref_matches_facets(has_facets, sku_tokens, product_type,
                       candidate_url, candidate_name):
    """facet_filter.matches_facets:75-129 verbatim."""
    if not has_facets:
        return True
    sku_tokens = [norm_model_token(t) for t in (sku_tokens or [])
                  if t]
    product_type = (product_type or "").strip()
    if not sku_tokens and not product_type:
        return True
    parsed = urlparse(candidate_url or "")
    slug = unquote(parsed.path or "")
    hay = f"{slug} {candidate_name or ''}"
    hay_norm = norm_model_token(hay)
    hay_loose = norm_text(hay)
    if sku_tokens:
        return any(t in hay_norm for t in sku_tokens)
    syns = mf.PRODUCT_TYPE_SYNONYMS.get(product_type.lower())
    if not syns:
        return True
    return any(s in hay_loose for s in syns)


def test_facet_match_matches_reference(spark):
    got = {r.cand_id: (r.matched, r.reason)
           for r in mf.facet_match(mf.synth_facet_cands(
               spark.read.parquet(SF))).collect()}
    reasons = set()
    for doc in _doc_ids(spark):
        m = doc % 9
        sku = f"10{doc % 90 + 10}"
        url = (f"https://shop.gr/p/item-{doc}" if doc % 5 == 0
               else f"https://shop.gr/p/alpha-{sku}.html")
        name = [f"Alpha ModelX {sku}", "Πλακακια δαπεδου 60x60",
                "Basin Mixer Premium", None][doc % 4]
        toks = {0: ["999x"], 5: ["-."], 4: None, 6: None, 7: None,
                8: None}.get(m, [sku, "", None])
        ptype = {6: "Tile", 7: "mystery_type",
                 8: "basin_faucet"}.get(m, "")
        want = ref_matches_facets(doc % 7 != 1, toks, ptype, url,
                                  name)
        assert got[doc][0] == want, (doc, got[doc])
        reasons.add(got[doc][1])
    assert {"no_facets", "no_constraints", "sku_hit", "sku_miss",
            "type_unknown_permissive", "type_hit",
            "type_miss"} <= reasons
    # the separator-only-token vacuous pass is exercised (m == 5)
    assert any(got[d] == (True, "sku_hit") for d in _doc_ids(spark)
               if d % 9 == 5 and d % 7 != 1)


def test_facet_match_percent_encoding(spark):
    """unquote parity: percent-encoded Greek in the URL path matches
    the Greek synonym (pins the Spark url_decode path — '+' kept)."""
    df = spark.createDataFrame(
        [(1, "https://s.gr/p/%CF%80%CE%BB%CE%B1%CE%BA%CE%B1%CE%BA"
             "%CE%B9%CE%B1-x", None, True, None, "tile"),
         (2, "https://s.gr/p/a+b-10356", None, True, ["10356"], "")],
        "cand_id long, candidate_url string, candidate_name string, "
        "has_facets boolean, sku_tokens array<string>, "
        "product_type string")
    got = {r.cand_id: (r.matched, r.reason)
           for r in mf.facet_match(df).collect()}
    assert got[1] == (True, "type_hit")      # πλακακια decoded
    assert got[2] == (True, "sku_hit")       # '+' not turned to space


def _tok(text):
    toks = re.split(r"[^a-z0-9α-ω]+", (text or "").lower())
    return {t for t in toks
            if t and len(t) >= 3 and t not in MATCH_STOPWORDS}


def ref_plausible(query, url, name):
    q = _tok(query)
    # match_filter tokenizes the RAW path (no unquote) — matches the
    # hash-pinned plausible_match operator
    cand = _tok(urlparse(url or "").path or "") | _tok(name)
    if not q:
        return True
    if not cand:
        return False
    return len(q & cand) / len(q) >= 0.30


def ref_skroutz(doc):
    sku = f"10{doc % 90 + 10}"
    query = f"alpha modelx premium item {sku}"
    found = doc % 17 != 0
    name = ("Unrelated Widget Thing" if doc % 11 == 3
            else f"Alpha ModelX {sku}")
    pur = (None if doc % 5 == 0 else
           f"https://www.skroutz.gr/s/p-{sku}-{doc}.html"
           if doc % 6 == 2
           else f"https://www.skroutz.gr/s/{doc}/alpha-modelx-{sku}"
                ".html")
    cmu = (f"https://shop{doc % 7}.gr/p/alpha-modelx-{sku}"
           if doc % 3 == 0 else None)
    mc = doc % 6
    page_found = doc % 13 != 0
    page_name = ("Totally Different Gadget" if doc % 8 == 0
                 else f"Alpha ModelX {sku}")
    toks = ["999111"] if doc % 10 == 0 else [sku]
    has_facets = doc % 7 != 1
    if not found:
        return "not_found"
    step1 = cmu or pur
    if not step1:
        return "no_product_url"
    if not ref_matches_facets(has_facets, toks, "", step1, name):
        return "facet_mismatch"
    page_url = pur or step1
    valid_merchants = []
    for midx in range(doc % 5):
        h = doc * 31 + midx * 7
        m_url = ("" if h % 6 == 0 else None if h % 6 == 1
                 else f"https://shop{h % 9}.gr/item/{h}")
        m_name = "" if h % 7 == 1 else f"Shop {h % 9}"
        if m_url and m_name:
            valid_merchants.append(midx)
    wants_fanout = (mc > 1 and bool(page_url)
                    and "skroutz.gr" in page_url)
    if (wants_fanout and page_found
            and ref_plausible(query, page_url, page_name)
            and valid_merchants):
        return "fanout"
    if ref_plausible(query, step1, name):
        return "fallback_single"
    return "dropped_implausible"


def test_skroutz_decisions_match_reference(spark):
    d = spark.read.parquet(SF)
    got = {r.req_id: r.decision for r in mf.skroutz_decisions(
        mf.synth_skroutz_search(d),
        mf.synth_skroutz_merchants(d)).collect()}
    decisions = set()
    for doc in _doc_ids(spark):
        want = ref_skroutz(doc)
        assert got[doc] == want, (doc, got[doc], want)
        decisions.add(want)
    assert decisions == {"not_found", "no_product_url",
                         "facet_mismatch", "fanout",
                         "fallback_single", "dropped_implausible"}


def test_skroutz_hits_shape(spark):
    d = spark.read.parquet(SF)
    hits = mf.skroutz_hits(mf.synth_skroutz_search(d),
                           mf.synth_skroutz_merchants(d)).collect()
    by_req = {}
    for h in hits:
        by_req.setdefault(h.req_id, []).append(h)
    saw_plural = saw_singular = saw_agg = saw_out = False
    for doc in _doc_ids(spark):
        want = ref_skroutz(doc)
        rows = by_req.get(doc, [])
        if want == "fanout":
            limit = doc % 4
            assert 1 <= len(rows) <= max(limit, 1)
            assert all(r.notes == "via Skroutz" for r in rows)
            saw_out |= any(r.availability == "out_of_stock"
                           for r in rows)
        elif want == "fallback_single":
            assert len(rows) == 1
            r = rows[0]
            mc = doc % 6
            if mc == 1:
                assert " · 1 shop" in r.notes \
                    and "shops" not in r.notes
                saw_singular = True
            elif mc > 1:
                assert f"{mc} shops" in r.notes
                saw_plural = True
            if doc % 3 != 0:
                assert "aggregator URL" in r.notes
                saw_agg = True
                assert r.retailer_name == "Skroutz"
        else:
            assert rows == [], (doc, want)
    assert saw_plural and saw_singular and saw_agg and saw_out
