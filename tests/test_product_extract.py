"""Pins for product metadata extraction (operators/product_extract.py)
vs a transcription of product_creation_service.py:554-621."""

import re

from mivaa_pdf_extractor_spark.operators import product_extract as pe


def ref_extract(content):
    md = {}
    for pattern in [
        r'(\d+(?:\.\d+)?)\s*[×x]\s*(\d+(?:\.\d+)?)\s*(?:cm|mm)?',
        r'(\d+(?:\.\d+)?)\s*[×x]\s*(\d+(?:\.\d+)?)\s*[×x]\s*'
        r'(\d+(?:\.\d+)?)\s*(?:cm|mm)?',
    ]:
        matches = re.findall(pattern, content)
        if matches:
            if len(matches[0]) == 2:
                md["dimensions"] = f"{matches[0][0]}×{matches[0][1]}"
            elif len(matches[0]) == 3:
                md["dimensions"] = (f"{matches[0][0]}×{matches[0][1]}"
                                    f"×{matches[0][2]}")
            break
    for pattern in [
        r'(?:by|BY|designer|DESIGNER|studio|STUDIO)\s+'
        r'([A-Z][A-Za-z\s{}\-]+)',
        r'(ESTUDI\{H\}AC|DSIGNIO|ALT DESIGN|MUT|YONOH|STACY GARCIA'
        r'|SG NY)',
        r'([A-Z][a-z]+\s+[A-Z][a-z]+(?:\s+[A-Z][a-z]+)?)\s+'
        r'(?:NY|STUDIO|DESIGN)',
    ]:
        matches = re.findall(pattern, content, re.IGNORECASE)
        if matches:
            designer = matches[0].strip()
            if len(designer) > 2 and designer not in ["THE", "AND",
                                                      "FOR"]:
                md["designer"] = designer
                break
    colors = re.findall(
        r'\b(TAUPE|SAND|CLAY|WHITE|BLACK|GREY|GRAY|ANTHRACITE|BEIGE'
        r'|BROWN|BLUE|GREEN|RED)\b', content)
    if colors:
        md["colors"] = sorted(set(colors))
    coll = re.findall(r'(?:collection|COLLECTION)\s+([A-Z][a-z]+)',
                      content)
    if coll:
        md["collection"] = coll[0]
    mat = re.findall(r'\b(ceramic|porcelain|tile|stone|marble'
                     r'|granite)\b', content, re.IGNORECASE)
    if mat:
        md["material_type"] = mat[0].lower()
    return md


def test_meta_matches_reference(spark):
    texts = [
        "VALENOVA tiles 15×38×2 cm in TAUPE and SAND, by Estudi Nou\n"
        "porcelain COLLECTION Alba3",
        "Designed BY MUT studio 20 x 40 mm GREY",
        "Stacy Garcia NY line, WHITE BLACK WHITE",
        "studio THE rest 11.8×11.8",
        "collection Roma marble 2",
        "nothing here at all",
        "designer Ana Luz\nGRANITE slab 1",
    ]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "chunk_id long, content string")
    got = {r.chunk_id: r for r in
           pe.extract_product_metadata(df).collect()}
    for i, t in enumerate(texts):
        want = ref_extract(t)
        g = got[i]
        assert g.dimensions == want.get("dimensions"), (i, t)
        assert g.designer == want.get("designer"), (i, t)
        want_colors = ",".join(want["colors"]) if "colors" in want \
            else None
        assert g.colors_csv == want_colors, (i, t)
        assert g.collection == want.get("collection"), (i, t)
        assert g.material_type == want.get("material_type"), (i, t)
    # the dead 3D branch: '15×38×2' renders as the 2D '15×38'
    assert got[0].dimensions == "15×38"
    # 'studio THE ...': first match 'THE rest' -> len>2, not in stop
    # list (only exact 'THE' is excluded) -> accepted. Pin whatever
    # the reference does:
    assert got[3].designer == ref_extract(texts[3]).get("designer")


def ref_extract_name(content):
    lines = content.split("\n")
    for line in lines[:10]:
        line = line.strip()
        m = re.search(r"^#+\s+([A-Z]{2,}(?:\s+[A-Z]{2,})*)", line)
        if m:
            return m.group(1).strip()
        if re.match(r"^[A-Z]{2,}(?:\s+[A-Z]{2,})*$", line) \
                and len(line) <= 20:
            return line.strip()
        m = re.search(r"\b([A-Z]{3,}(?:\s+[A-Z]{3,})*)\b", line)
        if m:
            cand = m.group(1).strip()
            nxt = "\n".join(lines[lines.index(line):
                                  lines.index(line) + 3])
            if any(p in nxt.lower() for p in [
                    "×", "cm", "mm", "designer", "estudi", "dsignio",
                    "alt design", "mut", "yonoh"]):
                return cand
    words = re.findall(r"\b[A-Z]{3,}\b", content)
    for w in words:
        if w not in set(pe.EXCLUDED_WORDS) and len(w) >= 3:
            f = content.find(w)
            ctx = content[max(0, f - 100):f + 100]
            if any(p in ctx.lower() for p in [
                    "×", "cm", "mm", "designer", "collection"]):
                return w
    return None


def test_names_match_reference(spark):
    texts = [
        "## VALENOVA\nglaze row 3",
        "#### AB CD\nrest 1",
        "intro line\nONA\nmore 2",
        "LONGNAMEREALLYLONG EXTRA over twenty chars\n15×38 next 0",
        "New PIQUE tiles by mut 4",
        ("plain intro\nfiller a\nfiller b\nfiller c\nfiller d\n"
         "filler e\nfiller f\nfiller g\nfiller h\nfiller i\n"
         "COLLECTION HARMONY 20 cm\nZETA near cm 5"),
        "nothing uppercase here",
        "TAUPE shade 30 mm sample 2",
    ]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "chunk_id long, content string")
    got = {r.chunk_id: r.product_name
           for r in pe.extract_product_names(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == ref_extract_name(t), (i, t, got[i])
    assert got[5] == "ZETA"   # excluded words skipped in the fallback
    assert got[6] is None


def ref_sections(pdf_text, max_chars, head, index_start, index_end,
                 around, tail):
    if len(pdf_text) <= max_chars:
        return pdf_text
    out = [("START", pdf_text[:head])]
    ie = min(index_end, len(pdf_text))
    if len(pdf_text) > index_end:
        area = pdf_text[index_start:ie]
        if re.search(r'\d+[.,]?\d*\s*[x×]\s*\d+[.,]?\d*\s*(cm|mm|inch)?',
                     area, re.IGNORECASE):
            out.append(("IDX", area))
    for pat in [p[4:] for p in pe.SECTION_KEYWORD_PATTERNS]:
        for m in re.finditer(pat, pdf_text, re.IGNORECASE):
            s = max(0, m.start() - around)
            e = min(len(pdf_text), m.end() + around)
            out.append(("S", pdf_text[s:e]))
    out.append(("END", pdf_text[-tail:]))
    combined = "\n\n---\n\n".join(t for _n, t in out)
    return combined[:max_chars]


def test_sections_match_reference(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    kw = dict(max_chars=1500, head=300, index_start=300,
              index_end=900, around=150, tail=200)
    got = {r.doc_id: r.extracted
           for r in pe.extract_relevant_sections(
               pe.synth_section_docs(ev), **kw).collect()}
    filler = "lorem body line with steady filler text here. "
    for e in range(0, 200):
        body = filler * (40 + e % 4 * 12)
        if e % 6 == 5:
            text = "tiny doc %d" % (e % 11)
        else:
            text = ("HEAD product intro %d " % (e % 9) + body[:280]
                    + (" sizes 20×40 cm and 15x38 " if e % 2 == 0
                       else " no sizes here ")
                    + body[:500]
                    + (" packaging 12 pieces per box " if e % 3 == 0
                       else " plain segment ")
                    + body[:600]
                    + (" ISO certification dossier " if e % 4 == 0
                       else " more prose ")
                    + body[:700]
                    + (" cleaning and maintenance tips " if e % 5 == 0
                       else " interlude ")
                    + body
                    + " TAIL compliance table %d" % (e % 6))
        assert got[e] == ref_sections(text, **kw), e
