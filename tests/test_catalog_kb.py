"""Transcription pins for the catalog knowledge / legend folds
(operators/catalog_kb.py) vs direct Python re-implementations of
catalog_knowledge_extractor.py:140-519 and
catalog_legend_extractor_v2.py:292-607 over the same synthetic
inputs."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import catalog_kb as kb

SF = "/root/testdata/sf0.001/documents.parquet"

PAGE_TYPES = ["iconography", "packing", "regulation", "installation",
              "care", "sustainability", "certification", "legal",
              "brand", "none", None]
TITLES_V1 = ["Tech Legend ", "  ", "", None]
MDS_V1 = [None, "", "   ", "# Packing | a | b |",
          "Standards: EN 14411 text"]
TITLES_V2 = ["Legend Title", "   ", None]
MDS_V2 = [None, "", "  ", "## Icons R10 R11 table",
          "Care with neutral pH"]


def _certs(h):
    return [None, [], ["ISO 9001", "iso-9001", " CE "],
            ["EN 14411", "- -"], ["LEED", "leed", ""],
            ["ISO 14001", "CE"]][h % 6]


def _icons(g):
    return [None, [],
            [{"category": "certification", "code": "CE"},
             {"category": "slip_resistance", "code": "R10"}],
            [{"category": "certification", "code": ""},
             {"category": "certification", "code": None},
             {"category": "certification", "code": "ISO 9001"}],
            [{"category": "pei_rating", "code": "PEI IV"}]][g % 5]


def _doc_ids(spark):
    return [r.d for r in spark.read.parquet(SF).select(
        F.col("doc_id").cast("long").alias("d")).distinct().collect()]


def _norm(s):
    return s.strip().lower().replace(" ", "").replace("-", "")


def _dedupe_norm(items):
    """catalog_legend_extractor_v2.py:292-303 verbatim semantics."""
    seen, out = set(), []
    for s in items:
        if not isinstance(s, str):
            continue
        norm = _norm(s)
        if not norm or norm in seen:
            continue
        seen.add(norm)
        out.append(s.strip())
    return out


# ── v1 reference transcription ─────────────────────────────────────

def ref_knowledge(doc):
    """Per-doc page outcomes + catalog cert list
    (knowledge_extractor.py:281-378 + 328-341)."""
    pc = doc % 53 + 2
    pdf_on_disk = doc % 23 != 0
    n_products = doc % 7
    if not pdf_on_disk:
        return [(-1, "skipped_no_pdf", None, None, None, None, None,
                 0)], []
    if n_products <= 0:
        return [(-1, "skipped_no_products", None, None, None, None,
                 None, 0)], []
    scan_count = min(10, max(1, pc // 4))
    pages, certs, seen = [], [], set()
    for idx in range(max(0, pc - scan_count), pc):
        h = doc * 131 + idx * 17
        if h % 19 == 0:
            pages.append((idx, "render_error", None, None, None, None,
                          None, 0))
            continue
        if h % 11 == 0:
            pages.append((idx, "no_data", None, None, None, None, None,
                          0))
            continue
        ptype = PAGE_TYPES[h % 11] or "none"
        raw_md = MDS_V1[h % 5]
        # certs collected regardless of page_type (:328-341)
        for c in (_certs(h) or []):
            if not isinstance(c, str):
                continue
            cert = c.strip()
            if not cert:
                continue
            norm = cert.lower().replace(" ", "").replace("-", "")
            if norm not in seen:
                seen.add(norm)
                certs.append(cert)
        if ptype == "none" or not raw_md:
            pages.append((idx, "no_content", None, None, None, None,
                          None, 0))
            continue
        title = (TITLES_V1[h % 4] or "").strip() \
            or f"{ptype.title()} (page {idx + 1})"
        content = raw_md.strip()
        kp = ([["kp one", "kp two", "kp three", "kp four"], [],
               None][h % 3]) or []
        summary = (" ".join(kp[:3])[:500] if kp else content[:300])
        rel = kb.PAGE_TYPE_TO_RELATIONSHIP.get(ptype, "related")
        pages.append((idx, "created", ptype, title, content, summary,
                      rel, n_products))
    return pages, certs


def test_knowledge_pages_match_reference(spark):
    docs = kb.synth_knowledge_docs(spark.read.parquet(SF))
    scan = kb.knowledge_scan_pages(docs)
    got = {}
    for r in kb.knowledge_page_outcomes(
            scan, kb.synth_knowledge_vision(scan)).collect():
        got[(r.doc_id, r.page_idx)] = (
            r.status, r.page_type, r.title, r.content, r.summary,
            r.relationship_type, r.attach_count)
    want = {}
    for doc in _doc_ids(spark):
        pages, _ = ref_knowledge(doc)
        for (idx, st, pt, ti, co, su, re_, ac) in pages:
            want[(doc, idx)] = (st, pt, ti, co, su, re_, ac)
    assert got == want


def test_knowledge_certs_match_reference(spark):
    docs = kb.synth_knowledge_docs(spark.read.parquet(SF))
    scan = kb.knowledge_scan_pages(docs)
    got = {r.doc_id: list(r.certifications)
           for r in kb.collect_knowledge_certs(
               scan, kb.synth_knowledge_vision(scan)).collect()}
    for doc in _doc_ids(spark):
        pages, certs = ref_knowledge(doc)
        parsed = [p for p in pages
                  if p[1] not in ("skipped_no_pdf",
                                  "skipped_no_products",
                                  "render_error", "no_data")]
        if parsed:
            assert got[doc] == certs, doc
        else:
            assert doc not in got
    # the empty-norm survivor pin: '- -' must appear somewhere
    assert any("- -" in v for v in got.values())


# ── v2 reference transcription ─────────────────────────────────────

def ref_legend(doc):
    """Per-doc extraction outcomes + catalog cert list
    (legend_extractor_v2.py:377-502)."""
    pc = doc % 53 + 2
    force = doc % 13 == 0
    already = doc % 5 == 0
    if (not force) and already:
        return {(-1, None): ("skipped_idempotent", None, None, None,
                             False)}, []
    m = doc % 6
    lp = [None,
          [("icons", [2, 5]), ("certification", [7])],
          [("packing", [1, 2])],
          [("regulation", []), ("care", None)],
          [("installation", [3]), ("regulation", [3])],
          [("sustainability", [0]), ("bogus", [1])]][m]
    entries = list(lp or [])
    if not any(p for _, p in entries):
        entries = [("unknown",
                    list(range(max(0, pc - 12), pc)))]
    out, certs = {}, []
    for ltype, pages in entries:
        if not pages or not isinstance(pages, list):
            out[(-1, ltype)] = ("skipped_empty", None, None, None,
                                False)
            continue
        if ltype not in kb.PROMPT_ORDER and ltype != "unknown":
            out[(-1, ltype)] = ("skipped_no_prompt", None, None, None,
                                False)
            continue
        for page in pages:
            key = (page, ltype)
            if (doc * 131 + page * 17) % 19 == 0:
                out[key] = ("render_error", None, None, None, False)
                continue

            def vision(pidx):
                g = doc * 977 + page * 31 + pidx * 7
                if g % 9 == 0:
                    return None
                return {"score": g % 7, "title": TITLES_V2[g % 3],
                        "md": MDS_V2[g % 5], "certs": _certs(g),
                        "vglob": g % 4 == 0, "icons": _icons(g)}

            if ltype == "unknown":
                best, best_type, best_score = None, None, 0
                for pidx, t in enumerate(kb.PROMPT_ORDER):
                    r = vision(pidx)
                    if r and r["score"] > best_score:
                        best, best_type, best_score = r, t, r["score"]
                if not (best and best_type and best_score >= 3):
                    out[key] = ("no_data", None, None, None, False)
                    continue
                result, rtype = best, best_type
            else:
                result = vision(kb.PROMPT_ORDER.index(ltype))
                rtype = ltype
                if not result:
                    out[key] = ("no_data", None, None, None, False)
                    continue
            out[key] = ("extracted", rtype, result["title"],
                        result["md"], result["vglob"])
            for c in (result["certs"] or []):
                if isinstance(c, str):
                    certs.append(c)
            if result["vglob"] and rtype == "icons":
                for icon in (result["icons"] or []):
                    if (isinstance(icon, dict)
                            and icon.get("category") == "certification"
                            and icon.get("code")):
                        certs.append(icon["code"])
    return out, _dedupe_norm(certs)


def _legend_extract(spark):
    docs = kb.synth_legend_docs(spark.read.parquet(SF))
    plan = kb.legend_page_plan(docs)
    return kb.extract_legend_pages(plan, kb.synth_legend_vision(plan),
                                   kb.synth_legend_renders(plan))


def test_legend_extract_matches_reference(spark):
    ext = _legend_extract(spark)
    got = {}
    for r in ext.collect():
        key = (r.doc_id,
               r.page_idx if r.page_idx >= 0 else -1,
               r.legend_type)
        got[key] = (r.status, r.resolved_type, r.title,
                    r.content_markdown, r.applies_globally)
    want = {}
    for doc in _doc_ids(spark):
        out, _ = ref_legend(doc)
        for (page, ltype), v in out.items():
            want[(doc, page, ltype)] = v
    assert got == want


def test_legend_certs_match_reference(spark):
    ext = _legend_extract(spark)
    got = {r.doc_id: list(r.certifications)
           for r in kb.collect_legend_certs(ext).collect()}
    extracted_docs = {r.doc_id for r in
                      ext.where(F.col("status") == "extracted")
                      .select("doc_id").distinct().collect()}
    for doc in _doc_ids(spark):
        _, certs = ref_legend(doc)
        if doc in extracted_docs:
            assert got[doc] == certs, doc
        else:
            assert doc not in got


def test_propagate_modes_diverge(spark):
    """The v1-vs-v2 merge asymmetry: existing dups survive v1 and
    collapse under v2; ' LEED ' re-strips only under v2."""
    prods = kb.synth_products(spark.read.parquet(SF))
    certs = kb.collect_legend_certs(_legend_extract(spark))
    v2 = {r.product_id: (list(r.certifications), r.updated)
          for r in kb.propagate_certs(
              prods, certs, source_label="catalog_legend",
              rededupe=True).collect()}
    v1 = {r.product_id: (list(r.certifications), r.updated)
          for r in kb.propagate_certs(
              prods, certs, source_label="catalog_knowledge",
              rededupe=False).collect()}
    existing = {r.product_id: list(r.existing or [])
                for r in prods.collect()}
    saw_dup_collapse = saw_restrip = False
    for pid, (v2c, updated) in v2.items():
        v1c, _ = v1[pid]
        ex = existing[pid]
        if not updated:
            assert v2c == ex and v1c == ex
            continue
        # v1 keeps existing verbatim as a prefix
        assert v1c[:len(ex)] == ex
        if ex == ["CE", "ce", "ISO 9001"]:
            assert v2c.count("CE") == 1 and "ce" not in v2c
            saw_dup_collapse = True
        if ex == [" LEED "]:
            assert v2c[0] == "LEED" and v1c[0] == " LEED "
            saw_restrip = True
    assert saw_dup_collapse and saw_restrip
