"""Transcription pins: salary normalizer (job_salary_normalizer.py),
sentiment fallback (sentiment_analysis_service.py:128-179), and the
Stage-4 metadata consolidation (metadata_consolidation_service.py:28-151)
vs the Spark operators."""

import re

from mivaa_pdf_extractor_spark.operators import salaries as sal
from mivaa_pdf_extractor_spark.operators import sentiment as senti
from mivaa_pdf_extractor_spark.operators import consolidation as cons

FX = dict(sal.FX_TO_USD)
MULT = dict(sal.PERIOD_MULT)


def ref_normalize(smin, smax, currency, period):
    """Python transcription of normalize_to_annual_usd (:107-166)."""
    if not smin and not smax:
        return None, None, None
    code = (currency or "USD").strip().upper()
    fx = FX.get(code)
    notes = []
    if fx is None:
        notes.append(f"unknown currency '{code}'; treating as USD")
        fx = 1.0
    p = (period or "").strip().lower() or None
    multiplier = MULT.get(p) if p else None
    if multiplier is None:
        sample = max(int(smin or 0), int(smax or 0))
        if sample > 0:
            if sample < 500:
                inferred = "hour"
            elif sample < 12000 and code in {"USD", "EUR", "GBP",
                                             "CAD", "AUD"}:
                inferred = "month"
            else:
                inferred = "year"
            multiplier = MULT[inferred]
            notes.append(f"inferred period={inferred} from magnitude")
        else:
            multiplier = 1

    def conv(v):
        if v is None or v <= 0:
            return None
        return int(round(float(v) * multiplier * fx))

    def sane(v):
        if v is None:
            return None
        if v < 5000 or v > 2_000_000:
            notes.append(f"rejected out-of-band value {v}")
            return None
        return v

    amin, amax = sane(conv(smin)), sane(conv(smax))
    return amin, amax, "; ".join(notes) if notes else None


def test_salary_normalize_matches_reference(spark):
    cases = [
        (None, None, "EUR", "year"),      # both-empty gate
        (0, None, "usd", None),           # zero counts as empty
        (0, 40, None, None),              # min zero, max tiny → hour
        (96000, 104000, "EUR", "year"),
        (4800, 5200, " gbp ", None),      # big-5 month inference
        (4800, None, "XYZ", None),        # unknown ccy → year inference
        (48, 96, "CAD", None),            # hour inference
        (2400, 2800, "AUD", "hour"),      # > 2M rejected
        (48, 52, "usd", "year"),          # < 5000 rejected
        (96000, None, "chf", "Monthly"),  # alias period, case folded
        (120, 160, "EUR", "fortnight"),   # unknown period → inference
        (None, 4800, "USD", None),        # min NULL, max present
    ]
    rows = [(i,) + c for i, c in enumerate(cases)]
    df = spark.createDataFrame(
        rows, "listing_id long, salary_min long, salary_max long, "
              "salary_currency string, salary_period string")
    got = {r.listing_id: r for r in sal.normalize_salaries(df).collect()}
    for i, (smin, smax, ccy, per) in enumerate(cases):
        amin, amax, note = ref_normalize(smin, smax, ccy, per)
        g = got[i]
        assert (g.annual_min_usd, g.annual_max_usd, g.note) == \
            (amin, amax, note), (i, cases[i], g)


POS = senti.POSITIVE_WORDS
NEG = senti.NEGATIVE_WORDS


def ref_sentiment(text, rating):
    """Transcription of _get_fallback_sentiment (:128-179)."""
    if rating is not None:
        if rating >= 4:
            s, c = "positive", 0.7
        elif rating <= 2:
            s, c = "negative", 0.7
        else:
            s, c = "neutral", 0.6
    else:
        tl = text.lower()
        p = sum(1 for w in POS if w in tl)
        n = sum(1 for w in NEG if w in tl)
        if p > n:
            s, c = "positive", min(0.5 + p * 0.1, 0.8)
        elif n > p:
            s, c = "negative", min(0.5 + n * 0.1, 0.8)
        else:
            s, c = "neutral", 0.5
    phrases = [x.strip() for x in re.split(r"[.!?]+", text)
               if len(x.strip()) > 10][:3]
    rec = rating * 2 if rating else 5.0
    return s, c, "|".join(phrases), float(rec)


def test_sentiment_fallback_matches_reference(spark):
    cases = [
        ("The goods look good and the finish is great. Love it!", None),
        ("Bad surface, poor quality and ugly tone", None),
        ("Looks good overall but poor packaging", None),     # tie
        ("A plain unremarkable sample piece", None),
        ("terrible awful worst hate ugly bad poor disappointing", None),
        ("Great product. Meh. One more sentence over ten chars."
         " And another phrase here. Plus a fifth one arrives.", None),
        ("anything at all", 5),
        ("anything at all", 0),    # present-but-falsy rating quirk
        ("anything at all", 2),
        ("anything at all", 3),
    ]
    rows = [(i, t, r) for i, (t, r) in enumerate(cases)]
    df = spark.createDataFrame(
        rows, "feedback_id long, feedback_text string, rating int")
    got = {r.feedback_id: r
           for r in senti.fallback_sentiment(df).collect()}
    for i, (t, r) in enumerate(cases):
        s, c, ph, rec = ref_sentiment(t, r)
        g = got[i]
        assert g.sentiment == s, (i, t, r, g)
        assert abs(g.confidence - c) < 1e-12, (i, g.confidence, c)
        assert g.key_phrases == ph, (i, g.key_phrases, ph)
        assert g.recommendation_score == rec
        assert g.model_used == "fallback-heuristic"


def ref_consolidate(ai, visual, factory):
    """Transcription of consolidate_metadata (:28-151). visual values
    are dicts; returns {field: (value, source, confidence)} plus
    value_kind via tuple len (list marker)."""
    consolidated = {}
    meta = {}
    for k, v in (factory or {}).items():
        if v is not None:
            consolidated[k] = v
            meta[k] = ("factory_default", 0.5)
    for k, vd in (visual or {}).items():
        if isinstance(vd, dict) and "primary" in vd:
            v = vd.get("primary")
            conf = vd.get("confidence", 0.8)
            if v is not None:
                if k == "color":
                    if "colors" not in consolidated:
                        consolidated["visual_color_detected"] = v
                        meta["visual_color_detected"] = \
                            ("visual_embedding", conf)
                else:
                    existing = meta.get(k, (None, 0.0))[1]
                    if conf >= existing:
                        consolidated[k] = v
                        meta[k] = ("visual_embedding", conf)
    for k, v in (ai or {}).items():
        if v is not None and v != "":
            if k in ("color", "colors"):
                consolidated["colors"] = [v] if isinstance(v, str) else v
                meta["colors"] = ("ai_text_extraction", 0.95)
                if visual and "color" in visual:
                    vd = visual["color"]
                    if isinstance(vd, dict) and "primary" in vd:
                        consolidated["visual_color_detected"] = \
                            vd.get("primary")
                        meta["visual_color_detected"] = (
                            "visual_embedding",
                            vd.get("confidence", 0.8))
            else:
                consolidated[k] = v
                meta[k] = ("ai_text_extraction", 0.95)
    return {k: (consolidated[k], meta[k][0], meta[k][1])
            for k in consolidated if k in meta}


def _run_consolidate(spark, factory, visual, ai):
    fac_rows = [(0, k, v) for k, v in factory.items()]
    vis_rows = [(0, k, "primary" in vd, vd.get("primary"),
                 vd.get("confidence"), vd.get("secondary", []))
                for k, vd in visual.items()]
    ai_rows = [(0, k, v) for k, v in ai.items()]
    fac = spark.createDataFrame(
        fac_rows or [(0, "zz", None)],
        "product_id long, key string, value string")
    vis = spark.createDataFrame(
        vis_rows or [(0, "zz", False, None, None, [])],
        "product_id long, key string, has_primary boolean, "
        "primary string, confidence double, secondary array<string>")
    aidf = spark.createDataFrame(
        ai_rows or [(0, "zz", None)],
        "product_id long, key string, value string")
    out = cons.consolidate_metadata(fac, vis, aidf).collect()
    return {r.field: (r.value, r.source, r.confidence, r.value_kind)
            for r in out}


def test_consolidate_matches_reference(spark):
    scenarios = [
        # factory-colors blocks visual color; AI colors re-adds vcd
        (dict(material="a_m"), dict(color=dict(primary="v_c",
                                               confidence=0.9)),
         dict(colors="f_cs", origin="f_o")),
        (dict(color="a_c"), dict(color=dict(primary="v_c")),
         dict(colors="f_cs")),
        # visual 0.5 ties factory and wins; 0.3 loses
        (dict(), dict(origin=dict(primary="v_o", confidence=0.5),
                      material=dict(primary="v_m", confidence=0.3)),
         dict(origin="f_o", material="f_m")),
        # present-but-None primary: vcd NULL only via the AI stage
        (dict(colors="a_cs"), dict(color=dict(primary=None,
                                              confidence=0.6)), dict()),
        (dict(), dict(color=dict(primary=None, confidence=0.6)),
         dict()),
        # empty-string AI skipped; None skipped
        (dict(material="", finish=None, origin="a_or"), dict(), dict()),
        # dict without 'primary' key ignored everywhere
        (dict(colors="a_cs2"), dict(color=dict(confidence=0.9)), dict()),
    ]
    for ai, visual, factory in scenarios:
        want = ref_consolidate(ai, visual, factory)
        got = _run_consolidate(spark, factory, visual, ai)
        want_norm = {}
        for k, (v, src, conf) in want.items():
            if isinstance(v, list):
                want_norm[k] = (v[0], src, conf, "list")
            else:
                want_norm[k] = (v, src, conf, "str")
        got_cmp = {k: t for k, t in got.items()}
        assert got_cmp == want_norm, (ai, visual, factory,
                                      got_cmp, want_norm)
