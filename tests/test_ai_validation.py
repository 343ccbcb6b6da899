"""Pins for the AI-validation tier (operators/ai_validation.py)
against independent transcriptions of boundary_detector.py,
consensus_validator.py, and document_classifier.py."""

import math
from collections import Counter

from mivaa_pdf_extractor_spark.operators import ai_validation as av

# --- Python twins ---------------------------------------------------------


def ref_cos01(a, b):
    if a is None or b is None:
        return 0.5
    dot = sum(x * y for x, y in zip(a, b))
    n1 = math.sqrt(sum(x * x for x in a))
    n2 = math.sqrt(sum(x * x for x in b))
    if n1 == 0 or n2 == 0:
        return 0.0
    return (dot / (n1 * n2) + 1) / 2


def ref_boundaries(chunks):
    out = []
    for i in range(len(chunks) - 1):
        cur, nxt = chunks[i], chunks[i + 1]
        sim = ref_cos01(cur["emb"], nxt["emb"])
        low = (nxt["content"] or "").lower()
        marker = any(m in low for m in av.BOUNDARY_MARKERS)
        pb = (nxt["page"] or 0) > (cur["page"] or 0)
        img = bool(nxt["img"])
        conf = 1 - sim
        if marker:
            conf = min(1.0, conf + 0.3)
        if pb:
            conf = min(1.0, conf + 0.15)
        if img:
            conf = min(1.0, conf + 0.1)
        if conf >= 0.6:
            reasons = []
            if sim < av.SIMILARITY_THRESHOLD:
                reasons.append(f"low similarity ({sim:.2f})")
            if marker:
                reasons.append("structural marker")
            if pb:
                reasons.append("page break")
            if img:
                reasons.append("has image")
            out.append({"index": i + 1, "confidence": conf,
                        "similarity": sim,
                        "reason": ", ".join(reasons) or "unknown"})
    return out


def ref_groups(n_chunks, boundaries):
    bidx = {b["index"] for b in boundaries}
    gid, out = 0, []
    for i in range(n_chunks):
        if i in bidx:
            gid += 1
        out.append(gid)
    return out


def ref_consensus(rows):
    valid = [r for r in rows if r["success"]]
    if len(valid) < 2:
        return None

    def akey(r):
        parts = [str(r[k]).strip().lower()
                 for k in av.KEY_FIELDS if r.get(k)]
        return " | ".join(parts) if parts else (
            str(r["confidence_score"])
            if r.get("confidence_score") is not None else "")

    keys = [akey(r) for r in valid]
    scores = []
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            if keys[i] == keys[j]:
                scores.append(1.0)
            else:
                a, b = set(keys[i].split()), set(keys[j].split())
                scores.append(len(a & b) / max(len(a | b), 1))
    agreement = sum(scores) / max(len(scores), 1)

    def vkey(r):
        return " ".join(str(r.get(k, "")).strip().lower()
                        for k in av.VOTE_FIELDS if r.get(k))

    if agreement >= av.HIGH_AGREEMENT:
        vkeys = [vkey(r) for r in valid]
        best = Counter(vkeys).most_common(1)[0][0]
        winner = valid[vkeys.index(best)]
        method = "majority_vote"
    else:
        scored = [(av.MODEL_WEIGHTS.get(r["model"], 0.5)
                   * (r["confidence_score"]
                      if r.get("confidence_score") is not None else 0.5),
                   r) for r in valid]
        winner = max(scored, key=lambda x: x[0])[1]
        method = ("weighted_vote" if agreement >= av.MEDIUM_AGREEMENT
                  else "weighted_vote_flagged")
    return {"agreement": agreement, "method": method,
            "review": agreement < av.MEDIUM_AGREEMENT,
            "winner": winner, "n": len(valid)}


def ref_classify(response, has_images):
    rt = response.strip()
    parts = rt.split("|")
    if len(parts) >= 2:
        category = parts[0].strip().lower()
        try:
            conf = float(parts[1].strip())
        except ValueError:
            conf = 0.5
    else:
        rl = rt.lower()
        if "product" in rl:
            category = "product"
        elif "supporting" in rl:
            category = "supporting"
        elif "administrative" in rl:
            category = "administrative"
        else:
            category = "transitional"
        conf = 0.6
    if has_images and category == "product":
        conf = min(1.0, conf + 0.1)
    return category, conf


# --- corpora (mirror the synth formulas) ----------------------------------


def _chunk_corpus(max_event=1000):
    docs = {}
    for e in range(max_event):
        d, idx = e % 60, e // 60
        if idx >= 12:
            continue
        if e % 17 == 0:
            emb = None
        elif e % 23 == 0:
            emb = [0.0] * 4
        else:
            emb = [float((e * 5 + j * 13) % 7 - 3) for j in range(4)]
        content = ("Model: X%d intro" % d if (d + idx) % 9 == 0
                   else "chunk text %d %d" % (d, idx))
        page = None if e % 19 == 0 else idx // 3 + 1
        img = None if e % 13 == 0 else (e % 5 == 0)
        docs.setdefault(d, []).append(
            {"idx": idx, "emb": emb, "content": content, "page": page,
             "img": img})
    for d in docs:
        docs[d].sort(key=lambda c: c["idx"])
    return docs


def test_boundaries_match_reference(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {}
    rows = av.detect_boundaries(av.synth_boundary_chunks(ev)).collect()
    for r in rows:
        got.setdefault(r.doc_id, []).append(r)
    docs = _chunk_corpus()
    n_b = 0
    for d, chunks in docs.items():
        want = ref_boundaries(chunks)
        have = sorted(got.get(d, []), key=lambda r: r["index"])
        assert [b["index"] for b in want] == [r["index"] for r in have], d
        for w, h in zip(want, have):
            assert abs(w["confidence"] - h.confidence) < 1e-12
            assert abs(w["similarity"] - h.similarity) < 1e-12
            assert w["reason"] == h.reason, (d, w, h.reason)
        n_b += len(want)
    assert n_b > 50  # the corpus actually exercises detection


def test_groups_match_reference(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = av.group_by_boundaries(av.synth_boundary_chunks(ev)).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, {})[r.idx] = r.group_id
    docs = _chunk_corpus()
    for d, chunks in docs.items():
        want = ref_groups(len(chunks), ref_boundaries(chunks))
        have = [got[d][c["idx"]] for c in chunks]
        assert want == have, d


def test_consensus_ties_and_defaults(spark):
    rows = [
        # task 0: unanimous -> majority, first-insertion tie irrelevant
        (0, 0, "claude-haiku-4-5", True, "Same Tile", "cat", 0.25),
        (0, 1, "claude-opus-4-8", True, "Same Tile", "cat", 0.875),
        # task 1: two distinct keys with equal counts -> the FIRST
        # inserted key wins the majority... but agreement is 0 here,
        # so weighted; craft equal weighted scores -> first ord wins
        (1, 0, "claude-haiku-4-5", True, "aaa", "c1", 0.5),
        (1, 1, "unknown-model", True, "aaa", "c1", 0.85),
        # weight 0.85*0.5 = 0.425 vs 0.5*0.85 = 0.425 -> tie
        # task 2: single success -> failure row
        (2, 0, "claude-opus-4-8", True, "only", "c", 0.9),
        (2, 1, "claude-haiku-4-5", False, "x", "c", 0.9),
        # task 3: missing confidence -> weighted default 0.5
        (3, 0, "claude-haiku-4-5", True, "k one", "c1", None),
        (3, 1, "claude-sonnet-4-6", True, "k two", "c2", None),
    ]
    df = spark.createDataFrame(
        [(t, o, m, s, n, None, c, None, None, cf)
         for t, o, m, s, n, c, cf in rows],
        "task_id long, ord int, model string, success boolean, "
        "name string, product_name string, category string, "
        "material_type string, description string, "
        "confidence_score double")
    out = {r.task_id: r for r in av.consensus_validate(df).collect()}
    assert out[0].decision_method == "majority_vote"
    assert out[0].final_name == "Same Tile"
    # equal-score tie -> first model order (haiku, ord 0)
    assert out[1].final_model == "claude-haiku-4-5"
    assert out[2].success == "false" and out[2].agreement is None
    # both default to 0.5 conf; sonnet weight 0.92 > haiku 0.85
    assert out[3].final_model == "claude-sonnet-4-6"
    assert out[3].decision_method == "weighted_vote_flagged"
    assert out[3].needs_human_review == "true"


def test_classifier_parse_pins(spark):
    cases = [(i, rt, "", hi) for i, (rt, hi) in enumerate([
        ("PRODUCT|0.85", False), ("PRODUCT|0.85", True),
        (" supporting | 0.7 ", False), ("ADMINISTRATIVE|abc", False),
        ("This looks like a Product page", True),
        ("nothing matches here", False), ("PRODUCT|0.9|extra", True),
        ("Banana|0.5", True)])]
    df = spark.createDataFrame(
        cases, "row_id long, response_text string, content string, "
               "has_images boolean")
    got = {r.row_id: r for r in av.classify_parse(df).collect()}
    for i, (_id, rt, _c, hi) in enumerate(cases):
        cat, conf = ref_classify(rt, hi)
        assert got[i].category == cat, rt
        assert abs(got[i].confidence - conf) < 1e-12, rt
    assert got[1].confidence == 0.95          # boost
    assert got[6].confidence == 1.0           # boost cap
    assert got[7].category == "banana"        # unvalidated category
    assert got[4].category == "product" and got[4].confidence == 0.7
