"""Pins for the merge/validate tier (operators/product_merge.py)
against independent transcriptions of product_merge_service.py and
product_validator.py."""

import math

from mivaa_pdf_extractor_spark.operators import product_merge as pm

# --- Python twins ---------------------------------------------------------


def ref_merge(target, sources):
    merged = dict(target)
    descs = [target.get("description", "") or ""]
    for s in sources:
        d = s.get("description", "")
        if d and d not in descs:
            descs.append(d)
    if len(descs) > 1:
        merged["description"] = " | ".join(filter(None, descs))
    lds = [target.get("long_description", "") or ""]
    for s in sources:
        d = s.get("long_description", "")
        if d and d not in lds:
            lds.append(d)
    if len(lds) > 1:
        merged["long_description"] = "\n\n".join(filter(None, lds))
    meta = dict(target.get("metadata", {}))
    for s in sources:
        for k, v in s.get("metadata", {}).items():
            if k not in meta:
                meta[k] = v
            elif isinstance(v, list) and isinstance(meta[k], list):
                meta[k] = list(set(meta[k] + v))
    merged["metadata"] = meta
    chunks = list(target.get("source_chunks") or [])
    for s in sources:
        chunks.extend(s.get("source_chunks") or [])
    merged["source_chunks"] = sorted(set(chunks))
    return merged


def ref_validate(chunks, data_render, image_count):
    n = len(chunks)
    total = sum(len(c["content"]) for c in chunks)
    content_score = (min(1.0, n / 2) + min(1.0, total / 200)) / 2
    sub = sum(len(c["content"]) for c in chunks
              if not any(pat in c["content"].lower()
                         for pat in pm.NON_SUBSTANTIVE_PATTERNS))
    ratio = 0.0 if total == 0 else sub / total
    sub_score = min(1.0, ratio / 0.6)
    alltext = (" ".join(c["content"] for c in chunks)
               + " " + data_render).lower()
    found = [f for f in pm.DISTINGUISHING_FEATURES if f in alltext]
    feat_score = min(1.0, len(found) / 3)
    asset = 0.0
    if image_count > 0:
        asset += 0.5
    if image_count >= 2:
        asset += 0.2
    if any("specification" in c["content"].lower()
           or "spec" in c["content"].lower() for c in chunks):
        asset += 0.3
    asset_score = min(1.0, asset)
    embs = [c["emb"] for c in chunks if c["emb"] is not None]
    if n < 2:
        coh, coh_score = 1.0, 1.0
    elif len(embs) < 2:
        coh, coh_score = 0.5, 0.5
    else:
        sims = []
        for i in range(len(embs) - 1):
            for j in range(i + 1, len(embs)):
                d = sum(x * y for x, y in zip(embs[i], embs[j]))
                n1 = math.sqrt(sum(x * x for x in embs[i]))
                n2 = math.sqrt(sum(x * x for x in embs[j]))
                sims.append(0.0 if n1 == 0 or n2 == 0
                            else (d / (n1 * n2) + 1) / 2)
        coh = sum(sims) / len(sims)
        coh_score = min(1.0, coh / 0.65)
    overall = (content_score * 0.20 + sub_score * 0.20
               + feat_score * 0.25 + asset_score * 0.15
               + coh_score * 0.20)
    return {"content": content_score, "sub": sub_score,
            "found": found, "feat": feat_score, "asset": asset_score,
            "coh": coh, "coh_score": coh_score, "overall": overall,
            "passed": overall >= 0.70}


# --- tests ----------------------------------------------------------------


def test_merge_fields_pins(spark):
    prods = [
        (1, None, "tl", ["c2", "c1"]),          # target, null desc
        (101, "sd", "tl", ["c1"]),              # dup long_desc of tgt
        (102, "sd", "sl2", None),               # dup desc of src 101
        (2, "", "x", []),                       # target '' desc
        (201, "", "y", ["a"]),                  # '' source skipped
    ]
    plan = [(1, 1, 101, 0), (1, 1, 102, 1), (2, 2, 201, 0)]
    meta = [
        (1, "k", "tv", None), (101, "k", "sv", None),   # tgt scalar wins
        (1, "l", None, ["b", "a"]), (101, "l", None, ["c", "a"]),
        (101, "m", "first", None), (102, "m", "second", None),
        (101, "n", None, ["x"]), (102, "n", "scal", None),
        # first-setter list -> later scalar skipped
    ]
    pdf = spark.createDataFrame(
        prods, "product_id long, description string, "
               "long_description string, source_chunks array<string>")
    mdf = spark.createDataFrame(
        meta, "product_id long, key string, sval string, "
              "lval array<string>")
    pl = spark.createDataFrame(
        plan, "merge_id long, target_id long, src_id long, src_ord int")
    out = {r.merge_id: r for r in
           pm.merge_product_data(pdf, mdf, pl).collect()}
    # merge 1: descs [None->'' , 'sd' (102 dup skipped)] -> 'sd'
    assert out[1].description_out == "sd"
    # long: ['tl', (101 dup skipped), 'sl2'] -> 'tl\n\nsl2'
    assert out[1].long_description_out == "tl\n\nsl2"
    assert out[1].chunks_csv == "c1,c2"
    assert out[1].meta_render == (
        "k=tv;l=[a|b|c];m=first;n=[x]")
    # merge 2: source '' desc skipped -> only [''] collected -> keep ''
    assert out[2].description_out == ""
    ref = ref_merge(
        {"description": None, "long_description": "tl",
         "source_chunks": ["c2", "c1"],
         "metadata": {"k": "tv", "l": ["b", "a"]}},
        [{"description": "sd", "long_description": "tl",
          "source_chunks": ["c1"],
          "metadata": {"k": "sv", "l": ["c", "a"], "m": "first",
                       "n": ["x"]}},
         {"description": "sd", "long_description": "sl2",
          "source_chunks": None,
          "metadata": {"m": "second", "n": "scal"}}])
    assert ref["description"] == out[1].description_out
    assert ref["long_description"] == out[1].long_description_out
    assert ",".join(ref["source_chunks"]) == out[1].chunks_csv
    assert sorted(ref["metadata"]["l"]) == ["a", "b", "c"]
    assert ref["metadata"]["m"] == "first"
    assert ref["metadata"]["n"] == ["x"]


def test_transfer_first_wins(spark):
    assocs = [
        (1, 10, 0, 0.5, "keep"),     # target's own
        (101, 10, 0, 0.9, "s0"),     # image already on target -> skip
        (101, 11, 1, None, None),    # new -> defaults
        (102, 11, 0, 0.3, "s1"),     # same image, later source -> skip
        (102, 12, 1, 0.4, "s1b"),
    ]
    adf = spark.createDataFrame(
        [(p, i, r, None, None, None, ov, None, re)
         for p, i, r, ov, re in assocs],
        "product_id long, image_id int, rel_ord int, "
        "spatial_score double, caption_score double, "
        "clip_score double, overall_score double, "
        "confidence double, reasoning string")
    pl = spark.createDataFrame(
        [(1, 1, 101, 0), (1, 1, 102, 1)],
        "merge_id long, target_id long, src_id long, src_ord int")
    rows = {(r.image_id, r.origin): r for r in
            pm.transfer_relationships(adf, pl).collect()}
    assert rows[(10, "existing")].reasoning == "keep"
    assert (10, "transferred") not in rows
    t11 = rows[(11, "transferred")]
    assert t11.overall_score == 0.5 and t11.reasoning == "merged"
    assert t11.spatial_score == 0.0          # defaults
    assert rows[(12, "transferred")].reasoning == "s1b"


def test_validate_matches_reference(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {r.product_id: r for r in pm.validate_products(
        pm.synth_validate_chunks(ev),
        pm.synth_validate_products(ev)).collect()}
    # python twin over the mirrored corpus
    chunks = {}
    seen = {}
    for e in range(1000):
        p, i = e % 50, (e // 50) % 5
        if (p, i) in seen:
            continue
        seen[(p, i)] = e
    for (p, i), e in seen.items():
        if i >= p % 5:
            continue
        if (p + i) % 4 == 0:
            c = "page footer www.example.com index %d" % p
        elif (p + i) % 4 == 1:
            c = ("quality porcelain with dimensions and materials "
                 "noted, price listed, batch %d row %d" % (p, i))
        elif (p + i) % 4 == 2:
            c = ("the specification sheet covers model number and "
                 "sku %d" % p)
        else:
            c = "plain body text for item %d part %d" % (p, i)
        emb = (None if e % 11 == 0 else
               [float((e * 3 + j * 5) % 9 - 4) for j in range(4)])
        chunks.setdefault(p, []).append(
            {"idx": i, "content": c, "emb": emb})
    n_passed = 0
    for p in range(50):
        cl = sorted(chunks.get(p, []), key=lambda c: c["idx"])
        render = ("{'name': 'prod%d', 'sku': 'SK%d'}" % (p, p)
                  if p % 3 == 0 else "{'name': 'prod%d'}" % p)
        want = ref_validate(cl, render, p % 4)
        g = got[p]
        assert abs(g.overall_score - want["overall"]) < 1e-9, p
        assert g.passed == str(want["passed"]).lower(), p
        assert g.features_found == ",".join(want["found"]), p
        assert abs(g.coherence - want["coh"]) < 1e-9, p
        n_passed += want["passed"]
    assert 0 < n_passed < 50  # both outcomes exercised
