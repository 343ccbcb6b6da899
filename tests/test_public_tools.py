"""Transcription pins for the public-tools folds
(operators/public_tools.py) vs public_lookup_service.py:39-109 and
public_tools_routes.py:308-547 re-implementations."""

import hashlib
import re

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import public_tools as pt

SF = "/root/testdata/sf0.001/documents.parquet"
NOW = 1_700_000_000


def _doc_ids(spark):
    return [r.d for r in spark.read.parquet(SF).select(
        F.col("doc_id").cast("long").alias("d")).distinct().collect()]


# ── reference transcriptions ───────────────────────────────────────

def ref_normalize(text):
    if not text:
        return ""
    return re.sub(r"\s+", " ", text.strip().lower())


def ref_query_hash(scan_type, query, country_code=None):
    parts = [scan_type, ref_normalize(query),
             (country_code or "").upper()]
    return hashlib.sha1("|".join(parts).encode("utf-8")).hexdigest()


def ref_compute_stats(hits):
    # public_tools_routes.py:308-324 (hits: (price, currency,
    # verified) tuples); modal tie canonicalized to smallest.
    priced = [h for h in hits if h[0] is not None]
    if not priced:
        return (0, 0, None, None, None, None)
    values = sorted(float(h[0]) for h in priced)
    n = len(values)
    median = (values[n // 2] if n % 2
              else (values[n // 2 - 1] + values[n // 2]) / 2)
    currencies = [h[1] for h in priced if h[1]]
    currency = (max(sorted(set(currencies)),
                    key=currencies.count) if currencies else None)
    return (n, sum(1 for h in priced if h[2]), values[0],
            values[-1], median, currency)


def synth_hit(g):
    price = None if g % 5 == 0 else ((g * 13) % 400) * 0.5 + 1.0
    currency = ["EUR", "USD", None, "GBP", "", "EUR"][g % 6]
    return (price, currency, g % 3 == 0)


def test_query_hash_sha1_matches_hashlib(spark):
    rows = pt.query_hashes(pt.synth_hash_queries(
        spark.read.parquet(SF))).collect()
    for r in rows:
        g = r.doc
        raw = (None if g % 7 == 0 else "" if g % 7 == 1
               else f"  BLUM\tCabinet  {g % 11}  hinge\n x")
        country = [None, "gr", "DE", "DE"][g % 4]
        stype = ["price", "mention", "product"][g % 3]
        assert r.qhash_sha1 == ref_query_hash(stype, raw, country), g


def test_market_stats_match_reference(spark):
    got = {r.query_id: r for r in pt.market_stats(
        pt.synth_price_hits(spark.read.parquet(SF))).collect()}
    groups = {}
    for g in _doc_ids(spark):
        groups.setdefault(g % 61, []).append(synth_hit(g))
    for qid, hits in groups.items():
        want = ref_compute_stats(hits)
        r = got[qid]
        assert (r["count"], r.verified_count, r.min, r.max, r.median,
                r.currency) == want, qid


def ref_ladder(is_auth, captcha_ok, quota_allowed, balance_before,
               cache_hit, debit_ok, upstream_error, scan_success):
    # price_scan:352-547 outcome/status ladder
    bal = balance_before or 0
    if not captcha_ok:
        return ("captcha_failed", 400, False, False)
    if is_auth and bal < 2:
        return ("rate_limited", 402, False, False)
    if not is_auth and not quota_allowed:
        return ("rate_limited", 429, False, False)
    if cache_hit:
        return ("success", 200, False, False)
    if is_auth and not debit_ok:
        return ("rate_limited", 402, False, False)
    if upstream_error:
        return ("failed", 502, is_auth, is_auth)
    if not scan_success:
        return ("failed", 200, is_auth, is_auth)
    return ("success", 200, is_auth, False)


def test_scan_ladder_matches_reference(spark):
    got = {r.doc: r for r in pt.price_scan_ladder(
        pt.synth_scan_requests(spark.read.parquet(SF))).collect()}
    for g in _doc_ids(spark):
        r = got[g]
        want = ref_ladder(
            g % 2 == 0, g % 11 != 0, g % 5 != 1,
            (g % 7) if g % 2 == 0 else None,
            g % 6 == 2, g % 13 != 3, g % 17 == 4, g % 3 != 1)
        assert (r.outcome, r.http_status, r.debited,
                r.refunded) == want, g
        # balance pins: refund restores, success keeps the debit
        if g % 2 == 0:
            if r.debited and not r.refunded and r.outcome == "success":
                assert r.balance_after == (g % 7) - 2, g
            else:
                assert r.balance_after == g % 7, g
        else:
            assert r.balance_after is None, g


def test_quota_no_identity_is_exhausted(spark):
    d = spark.read.parquet(SF)
    rows = pt.check_quota(pt.synth_quota_log(d, NOW),
                          pt.synth_quota_requests(d), NOW).collect()
    anon = [r for r in rows if r.key is None]
    assert anon, "synthesis must include identity-less requests"
    for r in anon:
        assert (r.used, r.remaining, r.allowed,
                r.reset_at_s) == (2, 0, False, NOW)


def test_top_outlets_match_stable_sort(spark):
    # transcription of :693-713 — dict insertion order + stable sort
    got = {}
    for r in pt.mention_top_outlets(pt.synth_mention_hits(
            spark.read.parquet(SF))).collect():
        got.setdefault(r.scan_id, []).append(
            (r.rank, r.domain, r["count"]))
    hits = {}
    for g in _doc_ids(spark):
        hits.setdefault(g % 17, []).append(
            (g % 97, ["alpha.com", "beta.io", None, "alpha.com", "",
                      "gamma.net", "delta.org"][g % 7]))
    for sid, hs in hits.items():
        counts = {}
        for _, dom in sorted(hs)[:20]:
            if dom:
                counts[dom] = counts.get(dom, 0) + 1
        want = [
            {"domain": d, "count": c}
            for d, c in sorted(counts.items(),
                               key=lambda kv: kv[1],
                               reverse=True)[:5]]
        rows = sorted(got.get(sid, []))
        assert [(r[1], r[2]) for r in rows] == \
            [(w["domain"], w["count"]) for w in want], sid
