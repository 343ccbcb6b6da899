"""Pins for the Perplexity rule shortcut (operators/identity.py)
vs a transcription of perplexity_price_search_service.py:96-156."""

import hashlib
import json
import re

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import identity as idn


def ref_shortcut(facets, candidate):
    if facets is None:
        return None
    name = (candidate.get("product_name") or "").upper()
    slug = " ".join(candidate.get("url_slug_tokens") or []).upper()
    hay = re.sub(r"[\s\-_./]+", "", f"{name} {slug}")
    sku_tokens = [t.upper() for t in (facets.get("sku_tokens") or [])]
    required = [t.upper() for t in (facets.get("required_tokens")
                                    or [])]
    if not name and not (candidate.get("url_slug_tokens") or []):
        return {"match_kind": "unverifiable", "match_score": 40,
                "match_note": None}
    for sku in sku_tokens:
        if sku and sku in hay:
            return {"match_kind": "exact", "match_score": 95,
                    "match_note": None}
    if required:
        nr = [re.sub(r"[\s\-_./]+", "", t) for t in required if t]
        missing = [t for t in nr if t not in hay]
        if missing and len(missing) == len(nr):
            return {"match_kind": "mismatch", "match_score": 15,
                    "match_note":
                    f"Brand/model tokens missing: {missing}"}
    return None


def ref_hash(facets):
    if facets is None:
        return "none", None
    payload = {
        "brand": (facets.get("brand") or "").upper(),
        "model": (facets.get("model") or "").upper(),
        "sku_tokens": sorted(t.upper()
                             for t in (facets.get("sku_tokens")
                                       or [])),
        "product_type": (facets.get("product_type") or "").lower(),
    }
    js = json.dumps(payload, sort_keys=True)
    return js, hashlib.sha1(js.encode()).hexdigest()


def test_shortcut_pins(spark):
    rows = [
        # SKU hit across separators in the HAYSTACK only
        (0, "Blum Hinge 70-T4", ["shop"], True, "Blum", None, None,
         ["70T4"], ["Zeta"]),
        # SKU containing separators can never match (pinned)
        (1, "AB 12 part", ["ab-12"], True, None, None, None,
         ["AB-12"], []),
        # all required missing -> mismatch with Python-repr note
        (2, "Generic", ["shop"], True, None, None, None, [],
         ["Zeta", "Q-9"]),
        # separator-only required token counts as present -> defer
        (3, "Generic", ["shop"], True, None, None, None, [], ["--"]),
        (4, "", [], True, None, None, None, ["X"], []),  # unverifiable
        (5, "x", ["y"], False, None, None, None, [], []),  # no facets
    ]
    df = spark.createDataFrame(
        rows, "cand_id long, product_name string, "
              "url_slug_tokens array<string>, has_facets boolean, "
              "brand string, model string, product_type string, "
              "sku_tokens array<string>, required_tokens array<string>")
    got = {r.cand_id: r for r in idn.price_rule_shortcut(df).collect()}
    for (cid, nm, slug, hf, br, mo, pt, sk, rq) in rows:
        facets = None if not hf else {
            "brand": br, "model": mo, "product_type": pt,
            "sku_tokens": sk, "required_tokens": rq}
        want = ref_shortcut(facets, {"product_name": nm,
                                     "url_slug_tokens": slug})
        g = got[cid]
        if want is None:
            assert g.match_kind == "defer", cid
        else:
            assert g.match_kind == want["match_kind"], cid
            assert g.match_score == want["match_score"], cid
            assert g.match_note == want["match_note"], cid
    assert got[0].match_kind == "exact"      # separators stripped
    assert got[1].match_kind == "defer"      # sep-carrying SKU inert
    assert got[3].match_kind == "defer"      # '' token = present
    # the canonical payload sha1 equals hashlib over the same string
    out = idn.price_rule_shortcut(df).withColumn(
        "h", F.sha1(F.col("facets_payload"))).collect()
    for r in out:
        cid = r.cand_id
        (_c, nm, slug, hf, br, mo, pt, sk, rq) = rows[cid]
        facets = None if not hf else {
            "brand": br, "model": mo, "product_type": pt,
            "sku_tokens": sk}
        js, h = ref_hash(facets)
        if facets is None:
            assert r.facets_payload == "none"
        else:
            assert r.facets_payload == js, (cid, r.facets_payload, js)
            assert r.h == h
