"""Transcription pins for the LLM mention-probe folds
(operators/llm_probes.py) vs llm_mention_probe_service.py:67-103,
209-285, 506-533 re-implementations."""

import re

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import llm_probes as lp

SF = "/root/testdata/sf0.001/documents.parquet"


def _doc_ids(spark):
    return [r.d for r in spark.read.parquet(SF).select(
        F.col("doc_id").cast("long").alias("d")).distinct().collect()]


def ref_build_probes(label, ptype, brand, competitors):
    ptype = ptype or "products"
    brand = brand or label
    competitor_str = (", ".join(competitors[:3]) if competitors
                      else "leading alternatives")
    return [
        ("generic_recommendation",
         f"What are the best {ptype} brands? "
         "Give a ranked list with one short reason per entry."),
        ("use_case",
         f"Recommend 5 {ptype} for use in a high-traffic commercial "
         "space. Name them and briefly explain each."),
        ("comparison",
         f"Compare {brand} with {competitor_str}. "
         "Cover product range, quality, and typical price tier."),
        ("direct_lookup",
         f"Tell me about {label}. What do they make and what are "
         "they known for?"),
    ]


def test_probe_bank_matches_reference(spark):
    got = {}
    for r in lp.build_probes(lp.synth_probe_subjects(
            spark.read.parquet(SF))).collect():
        got.setdefault(r.subject_id, []).append(
            (r.probe_ord, r.key, r.prompt))
    for doc in _doc_ids(spark):
        label = f"Acme {doc % 9}"
        ptype = ["", "ceramic tiles", None][doc % 3]
        brand = "AcmeBrand" if doc % 5 == 0 else ""
        comp = [None, [], ["BetaCorp", "Gamma"],
                ["BetaCorp", "Gamma", "Delta", "Epsilon"]][doc % 4]
        want = ref_build_probes(label, ptype, brand, comp)
        rows = sorted(got[doc])
        assert [(k, p) for _, k, p in rows] == want, doc


def norm(t):
    return " ".join((t or "").lower().split())


def ref_extract(text, aliases, competitors):
    nt = norm(text)
    mentioned = any(norm(a) in nt for a in aliases)
    position = None
    if mentioned:
        for line in text.splitlines():
            m = re.match(r"\s*(\d+)[.):]\s*(.+)", line)
            if m and any(norm(a) in norm(m.group(2))
                         for a in aliases):
                position = int(m.group(1))
                break
    sentiment = "neutral"
    if mentioned:
        score = (sum(1 for w in lp.POS_WORDS if w in nt)
                 - sum(1 for w in lp.NEG_WORDS if w in nt))
        sentiment = ("positive" if score > 0
                     else "negative" if score < 0 else "neutral")
    return mentioned, position, sentiment, list(competitors)[:5]


def test_extract_matches_reference(spark):
    got = {r.resp_id: (r.mentioned, r.position, r.sentiment,
                       list(r.competitors_mentioned))
           for r in lp.extract_deterministic(lp.synth_probe_responses(
               spark.read.parquet(SF))).collect()}
    sentiments = set()
    for doc in _doc_ids(spark):
        text = lp.RESPONSE_TEXTS[doc % 6]
        comp = (["BetaCorp", "Gamma", "D", "E", "F", "G"]
                if doc % 3 == 0 else ["BetaCorp"])
        want = ref_extract(text, ["Acme", "Acme Tiles"], comp)
        assert got[doc] == want, (doc, got[doc], want)
        sentiments.add(want[2])
        if doc % 6 == 1:
            # 'expensive but premium' → score 0 → neutral (pinned)
            assert want[2] == "neutral" and want[0]
        if doc % 6 == 3:
            assert want[1] == 12   # whitespace-led ' 12)' rank
    assert sentiments == {"positive", "negative", "neutral"}


def test_snapshot_matches_reference(spark):
    docs = _doc_ids(spark)
    rows = []
    for doc in sorted(docs):
        rows.append({
            "mention_id": doc % 40, "row_ord": doc % 997,
            "model": ["haiku", "gpt-4o-mini", "gemini-flash",
                      "sonar"][doc % 4],
            "mentioned": doc % 3 != 0,
            "position": (None if doc % 5 == 0
                         else 0 if doc % 5 == 1 else doc % 9 + 1),
            "competitors": ([" BetaCorp ", "", "Gamma"]
                            if doc % 7 == 0 else None
                            if doc % 7 == 1 else ["Gamma"])})
    per_model = {}
    per_run = {}
    for r in sorted(rows, key=lambda x: x["row_ord"]):
        key = (r["mention_id"], r["model"])
        d = per_model.setdefault(key, {"probes": 0, "mentioned": 0,
                                       "positions": []})
        d["probes"] += 1
        if r["mentioned"]:
            d["mentioned"] += 1
            if r["position"]:
                d["positions"].append(r["position"])
        run = per_run.setdefault(r["mention_id"],
                                 {"total": 0, "m": 0, "pos": [],
                                  "comp": {}})
        run["total"] += 1
        if r["mentioned"]:
            run["m"] += 1
            if r["position"]:
                run["pos"].append(r["position"])
        for c in (r["competitors"] or []):
            cn = (c or "").strip()
            if cn:
                run["comp"][cn] = run["comp"].get(cn, 0) + 1
    got_m = {(r.mention_id, r.model): r for r in lp.snapshot_models(
        lp.synth_probe_rows(spark.read.parquet(SF))).collect()}
    for key, want in per_model.items():
        g = got_m[key]
        assert g.probes == want["probes"]
        assert g.mentioned_count == want["mentioned"]
        assert list(g.positions) == want["positions"], key
        assert g.sample_count == min(4, want["probes"])
    got_r = {r.mention_id: r for r in lp.snapshot_run(
        lp.synth_probe_rows(spark.read.parquet(SF))).collect()}
    for mid, want in per_run.items():
        g = got_r[mid]
        assert g.total_probes == want["total"]
        assert abs(g.share_of_voice
                   - want["m"] / want["total"]) < 1e-12
        if want["pos"]:
            assert abs(g.avg_position
                       - sum(want["pos"]) / len(want["pos"])) < 1e-12
        top = sorted(want["comp"].items(),
                     key=lambda kv: kv[1], reverse=True)[:10]
        assert [t.split(":")[0] for t in g.top_competitors] \
            == [n for n, _c in top], mid
