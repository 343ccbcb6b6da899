"""Pins for the catalog page classifier (operators/catalog_layout.py)
against a transcription of catalog_layout_analyzer.py:255-370."""

import re
import unicodedata

from mivaa_pdf_extractor_spark.operators import catalog_layout as cl


def _norm(s):
    if not s:
        return ""
    s = unicodedata.normalize("NFD", s)
    s = "".join(c for c in s if not unicodedata.combining(c))
    return re.sub(r"\s+", " ", s.upper().strip())


def ref_classify(text, page_index, total_pages, known_names):
    norm = _norm(text)
    if not norm:
        return ("other", [])
    matched = [n for n in known_names if _norm(n) and _norm(n) in norm]

    def hits(kws):
        return sum(1 for k in kws if k in norm)

    if hits(cl.SPEC_TABLE_KEYWORDS) >= 1 and matched:
        return ("product_spec", matched)
    if hits(cl.LEGEND_ICONS_KEYWORDS) >= 2 and not matched:
        return ("legend_icons", [])
    if hits(cl.LEGEND_CERTIFICATION_KEYWORDS) >= 2:
        return ("legend_certification", matched)
    if hits(cl.LEGEND_REGULATION_KEYWORDS) >= 2:
        return ("legend_regulation", matched)
    if hits(cl.LEGEND_INSTALLATION_KEYWORDS) >= 2:
        return ("legend_installation", matched)
    if hits(cl.LEGEND_CARE_KEYWORDS) >= 2:
        return ("legend_care", matched)
    if hits(cl.LEGEND_SUSTAINABILITY_KEYWORDS) >= 2:
        return ("legend_sustainability", matched)
    if hits(cl.INDEX_PAGE_KEYWORDS) >= 1:
        return ("index_page", [])
    if hits(cl.BIO_KEYWORDS) >= 1 and not matched:
        return ("bio", [])
    if matched:
        return ("product_photo", matched)
    words = len(norm.split())
    if page_index < 2 and words < 50:
        return ("cover", [])
    if page_index >= total_pages - 2 and words < 50:
        return ("cover", [])
    return ("other", [])


def ref_packing(text):
    norm = _norm(text)
    if "PACKING" not in norm and "BOX" not in norm:
        return False
    return len(re.findall(r"\b\d{1,4}[,.]?\d{0,4}\b", norm)) >= 6


def _corpus():
    pages = {}
    for e in range(1000):
        d, p = e % 30, e // 30
        if p >= 14:
            continue
        i = (d + p) % 14
        if p == 0:
            t = "Colección"
        elif p == 13:
            t = "fin"
        elif i == 13:
            t = "plain prose filler " + " ".join(["w"] * 60)
        else:
            t = cl._PAGE_TEMPLATES[i]
        na, nb = "Val%dA" % (d % 5), "Val%dB" % (d % 5)
        t = t.replace("NA", na).replace("NB", nb)
        pages[(d, p)] = t
    return pages


def test_classify_matches_reference(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = cl.classify_pages(cl.synth_layout_pages(ev),
                             cl.synth_layout_names(ev)).collect()
    got = {(r.doc_id, r.page_index): r for r in rows}
    pages = _corpus()
    seen = set()
    for (d, p), text in pages.items():
        names = ["Val%dA" % (d % 5), "Val%dB" % (d % 5)]
        want_type, want_names = ref_classify(text, p, 14, names)
        g = got[(d, p)]
        assert g.page_type == want_type, (d, p, text)
        assert g.matched_csv == ",".join(sorted(want_names)), (d, p)
        assert g.packing_row == str(ref_packing(text)).lower()
        seen.add(want_type)
    assert len(seen) >= 11  # every branch of the ladder fires


def test_spec_without_name_is_not_legend(spark):
    # faithful-to-code pin: spec keywords w/o a product name fall
    # through the ladder (the reference's comment claims legend_icons)
    pages = spark.createDataFrame(
        [(1, 5, "CARACTERÍSTICAS TÉCNICAS generales", 14)],
        "doc_id long, page_index int, text string, total_pages int")
    names = spark.createDataFrame([(1, "Zeta")],
                                  "doc_id long, name string")
    r = cl.classify_pages(pages, names).collect()[0]
    assert r.page_type == "other"
