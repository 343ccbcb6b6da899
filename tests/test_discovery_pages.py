"""Pins for the discovery text tier (operators/discovery_pages.py)
against an independent Python transcription of the reference
semantics (product_discovery_service.py:2401-2639)."""

import re

import pytest
from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import discovery_pages as dp

# --- Python twin of _parse_pdf_text_into_pages (:2403-2459) ---------------

_MARKER = re.compile(r"-{3,}\s*#?\s*Page\s*(\d+)\s*-*", re.IGNORECASE)


def ref_parse_pages(text, total_pages, lowercase=True):
    out = {}
    if not text:
        return out
    norm = (lambda s: s.lower()) if lowercase else (lambda s: s)
    markers = list(_MARKER.finditer(text))
    if not markers:
        out[1] = norm(text)
        return out
    first = text[: markers[0].start()].strip()
    if first:
        out[1] = norm(first)
    for i, m in enumerate(markers):
        start = m.end()
        end = markers[i + 1].start() if i + 1 < len(markers) else len(text)
        page = int(m.group(1))
        if page <= total_pages:
            content = text[start:end].strip()
            if content:
                out[page] = norm(content)
    return out


# --- Python twin of _detect_product_pages_optimized (:2461-2639) ----------


def _headline_pat(name):
    return re.compile(
        r"(?:^|\n)\s*" + re.escape(name.lower().strip())
        + r"\s*(?:\n|$|by\s|collection|designed)",
        re.IGNORECASE | re.MULTILINE)


def ref_detect(pages, name, total_pages, all_names):
    if not pages or not name:
        return []
    clean = name.lower().strip()
    sorted_pages = sorted(pages)
    toc_cutoff = max(3, int(total_pages * 0.15))
    word = re.compile(r"\b" + re.escape(clean) + r"\b", re.IGNORECASE)
    hpat = _headline_pat(clean)
    others = []
    for o in all_names or []:
        oc = o.lower().strip()
        if oc != clean and len(oc) >= 2:
            others.append((oc, _headline_pat(oc),
                           re.compile(r"\b" + re.escape(oc) + r"\b",
                                      re.IGNORECASE)))
    hl_pages = {clean: []}
    for oc, _, _w in others:
        hl_pages[oc] = []
    for p in sorted_pages:
        if p > total_pages or p <= toc_cutoff:
            continue
        c = pages[p]
        if hpat.search(c):
            hl_pages[clean].append(p)
        for oc, ohp, _w in others:
            if ohp.search(c):
                hl_pages[oc].append(p)
    mine = hl_pages[clean]
    if not mine:
        for p in sorted_pages:
            if p <= toc_cutoff or p > total_pages:
                continue
            c = pages[p]
            if word.findall(c):
                n_other = sum(1 for _oc, _h, w in others if w.search(c))
                if n_other <= 2:
                    mine = [p]
                    break
    if not mine:
        return []
    start = mine[0]
    nxt = [p for oc, _h, _w in others for p in hl_pages[oc] if p > start]
    end = min(nxt) - 1 if nxt else min(start + 10, total_pages)
    end = max(end, start)
    detected = list(range(start, end + 1))
    validated = []
    for p in detected:
        if p not in pages:
            continue
        c = pages[p]
        if any(h.search(c) for _oc, h, _w in others):
            break
        validated.append(p)
    return validated if validated else detected[:6]


# --- corpora (mirror the synth formulas) ----------------------------------


def _marker_corpus():
    docs = []
    for d in range(120):
        ds = str(d)
        t = {
            0: ("intro " + ds + "\n--- Page 2 ---\nalpha " + ds
                + "\n--- page 3 ---\n   \n---# Page 4 ----\nbeta"
                + "\n--- Page 25 ---\nzz"),
            1: "plain text " + ds,
            2: "",
            3: ("--- Page 1 ---\nfirst " + ds
                + "\n--- Page 1 ---\nsecond " + ds),
            4: "head " + ds + "\n--- Page 1 ---\nOver\n--- Page 5 ---\ntail",
            5: ("  \n--- Page 2 ---\n  spaced " + ds
                + "  \n----- PAGE 3 -----\nCase Text"),
        }[d % 6]
        docs.append((d, t, 20))
    return docs


def _section_corpus(max_event=1000):
    pages = {}   # doc -> {page: content}
    for e in range(max_event):
        d, p = e % 40, e // 40 + 1
        total = 20 + d % 3 * 10
        cut = {0: 3, 1: 4, 2: 6}[d % 3]
        r = d % 5
        if p > total or (d * 7 + p) % 11 == 0:
            continue
        n = ["item%dx%d" % (d % 7, k) for k in range(4)]
        if r == 4 and p == 2:
            c = n[3] + "\nby someone early"
        elif p <= cut:
            c = "index %s %s %s %s contents" % tuple(n)
        elif p == cut + 2:
            c = n[0] + "\nby studio alfa\nglaze notes"
        elif p == cut + 7:
            c = n[1] + "\ncollection overview"
        elif p == cut + 12 and r == 3:
            c = n[2] + "\n" + n[3] + "\ndesigned in milano"
        elif p == cut + 12:
            c = n[2] + "\ndesigned in milano"
        elif p == cut + 17 and r == 0:
            c = n[3] + "\nby atelier beta"
        elif p == cut + 18 and r == 1:
            c = "see " + n[3] + " glaze details"
        elif p == cut + 18 and r == 2:
            c = ("see " + n[3] + " with " + n[0] + " and " + n[1]
                 + " plus " + n[2])
        elif p == cut + 18 and r == 4:
            c = "see " + n[3] + " beside " + n[0] + " and " + n[1]
        else:
            c = "filler page %d of doc %d" % (p, d)
        pages.setdefault(d, {})[p] = c
    prods = [(d, d * 10 + k, "  ITEM%dX%d " % (d % 7, k), 20 + d % 3 * 10)
             for d in range(40) for k in range(4)]
    return pages, prods


# --- tests ----------------------------------------------------------------


def test_marker_parse_matches_reference(spark):
    docs = _marker_corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string, "
                                     "total_pages int")
    got = {(r.doc_id, r.page_num): r.content
           for r in dp.parse_page_markers(df).collect()}
    want = {(d, p): c
            for d, t, tp in docs
            for p, c in ref_parse_pages(t, tp).items()}
    assert got == want
    # spot-pin the tricky docs: dup marker last-wins, pre-text
    # overwrite, out-of-bounds drop, unstripped no-marker text
    assert want[(3, 1)] == "second 3"
    assert want[(4, 1)] == "over" and want[(4, 5)] == "tail"
    assert (0, 25) not in want and want[(0, 4)] == "beta"
    assert want[(5, 3)] == "case text" and (5, 1) not in want
    assert want[(1, 1)] == "plain text 1"
    assert all(k[0] != 2 for k in want)


def test_marker_parse_original_case(spark):
    df = spark.createDataFrame(
        [(0, "A\n--- Page 2 ---\nSKU-9 Units", 5)],
        "doc_id long, text string, total_pages int")
    rows = {r.page_num: r.content
            for r in dp.parse_page_markers(df, lowercase=False).collect()}
    assert rows == {1: "A", 2: "SKU-9 Units"}


def test_sections_match_reference(spark):
    pages, prods = _section_corpus()
    pdf = spark.createDataFrame(
        [(d, p, c) for d, m in pages.items() for p, c in m.items()],
        "doc_id long, page_num int, content string")
    sdf = spark.createDataFrame(
        prods, "doc_id long, product_idx long, name string, "
               "total_pages int")
    got = {r.product_idx: (r.section_start, r.pages_csv, r.n_pages)
           for r in dp.detect_sections(pdf, sdf).collect()}
    assert len(got) == len(prods)
    hit_empty = hit_fallback6 = hit_clean_fb = 0
    for d, idx, name, total in prods:
        names = ["  ITEM%dX%d " % (d % 7, k) for k in range(4)]
        want = ref_detect(pages.get(d, {}), name, total, names)
        start, csv, n = got[idx]
        assert csv == ",".join(str(p) for p in want), (d, idx, want, csv)
        assert n == len(want)
        if not want:
            hit_empty += 1
            assert start is None
        else:
            # fallback-to-detected[:6] ranges may include absent pages
            if any(p not in pages.get(d, {}) for p in want):
                hit_fallback6 += 1
        if want and d % 5 in (1, 4) and idx % 10 == 3:
            hit_clean_fb += 1
    # the regimes actually exercised their paths
    assert hit_empty > 0 and hit_clean_fb > 0


def test_sections_empty_name_and_no_pages(spark):
    pdf = spark.createDataFrame([(1, 5, "item0x0\nby x")],
                                "doc_id long, page_num int, content string")
    sdf = spark.createDataFrame(
        [(1, 0, "   ", 20), (1, 1, None, 20), (2, 2, "item0x0", 20)],
        "doc_id long, product_idx long, name string, total_pages int")
    rows = {r.product_idx: (r.section_start, r.pages_csv, r.n_pages)
            for r in dp.detect_sections(pdf, sdf).collect()}
    assert rows[0] == (None, "", 0)
    assert rows[1] == (None, "", 0)
    assert rows[2] == (None, "", 0)  # doc 2 has no pages
