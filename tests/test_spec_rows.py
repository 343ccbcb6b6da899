"""Pins for the Tier-A packing-row parser (operators/spec_rows.py)
against an independent Python transcription of
product_spec_extractor_v2.py:64-537."""

import re
import unicodedata

from mivaa_pdf_extractor_spark.operators import spec_rows as sr

# --- Python twin (reference semantics, re module + unicodedata) -----------


def _normalize(s):
    if not s:
        return ""
    s = unicodedata.normalize("NFD", s)
    s = "".join(c for c in s if not unicodedata.combining(c))
    return re.sub(r"\s+", " ", s.upper().strip())


def _parse_number(raw):
    if not raw:
        return None
    c = raw.strip().replace(" ", "")
    try:
        if "." in c and "," in c:
            if c.rfind(".") > c.rfind(","):
                return float(c.replace(",", ""))
            return float(c.replace(".", "").replace(",", "."))
        if "," in c and "." not in c:
            return float(c.replace(",", "."))
        return float(c)
    except (ValueError, TypeError):
        return None


_MERGED = re.compile(r"^(\d[\d.,]*)\s+(\d+\s*[xX]\s*\d+\s*[xX]\s*\d+)$")


def _split_merged(raw):
    m = _MERGED.match(raw.strip())
    if m:
        return [m.group(1), m.group(2).replace(" ", "")]
    return [raw]


def _is_bullet(t):
    return t.strip() in {"•", "●", "◆", "◼", "■", "▪", "✓", "✔", "x", "X"}


def ref_find_row(spans, name, y_tol=6.0):
    n = _normalize(name)
    if not n:
        return []
    exact = [s for s in spans
             if _normalize(s["text"]) == n
             or (_normalize(s["text"]).startswith(n + " ")
                 and len(_normalize(s["text"])) - len(n) < 30)]
    anchors = exact or [s for s in spans if n in _normalize(s["text"])]
    if not anchors:
        return []

    def ncount(a):
        c = 0
        for s in spans:
            if s is a or abs(s["cy"] - a["cy"]) > y_tol \
                    or s["x0"] <= a["x1"]:
                continue
            for tok in _split_merged(s["text"]):
                if _parse_number(tok) is not None:
                    c += 1
        return c

    best = max(anchors, key=ncount)
    if ncount(best) < 3:
        return []
    row = [s for s in spans if abs(s["cy"] - best["cy"]) <= y_tol]
    row.sort(key=lambda s: s["x0"])
    return row


def ref_positional(row, name):
    n = _normalize(name)
    out = {}
    tokens = []
    for span in row:
        for tok in _split_merged(span["text"].strip()):
            tok = tok.strip()
            if not tok:
                continue
            if _normalize(tok) == n or _normalize(tok).startswith(n + " "):
                tokens.append(("name", tok))
                continue
            if _is_bullet(tok) or re.fullmatch(r"[-—–]+", tok):
                tokens.append(("bullet", tok))
                continue
            if re.fullmatch(r"\d+\s*[xX]\s*\d+\s*[xX]\s*\d+", tok):
                tokens.append(("dim", tok.replace(" ", "")))
                continue
            num = _parse_number(tok)
            if num is not None:
                tokens.append(("number", num))
    saw = False
    nd = []
    for kind, val in tokens:
        if kind == "number" and not saw:
            saw = True
        if not saw and kind == "bullet":
            continue
        if kind in ("number", "dim"):
            nd.append((kind, val))
    order = None
    if len(nd) in sr.KNOWN_COLUMN_ORDERS:
        order = sr.KNOWN_COLUMN_ORDERS[len(nd)]
    else:
        for k in sorted(sr.KNOWN_COLUMN_ORDERS, reverse=True):
            if k <= len(nd):
                order = sr.KNOWN_COLUMN_ORDERS[k]
                break
    if not order:
        return out
    for i, (kind, val) in enumerate(nd):
        if i >= len(order):
            break
        field = order[i]
        if kind == "dim" and field != "pallet_dimensions_cm":
            if "pallet_dimensions_cm" in order[i:]:
                out["pallet_dimensions_cm"] = val
                continue
        out[field] = val
    bi = 0
    for kind, _v in tokens:
        if kind == "bullet" and bi < len(sr.BULLET_FLAGS):
            out[sr.BULLET_FLAGS[bi]] = True
            bi += 1
        elif kind == "number":
            break
    return out


def ref_tier_a(pages, name):
    merged = {}
    for spans in pages:
        row = ref_find_row(spans, name)
        if not row:
            continue
        data = ref_positional(row, name)
        for k, v in data.items():
            if k not in merged and v not in (None, "", []):
                merged[k] = v
    return merged


def ref_nested_cols(flat):
    out = {}
    for f in sr.PACKAGING_FIELDS + ["thickness_mm", "thickness_inch"]:
        v = flat.get(f)
        if v is not None:
            out[f] = str(v) if not isinstance(v, float) else repr(v)
    if flat.get("finish_matt") and not flat.get("finish_gloss"):
        out["finish"] = "matte"
    elif flat.get("finish_gloss") and not flat.get("finish_matt"):
        out["finish"] = "gloss"
    uses = [u for fl, u in [
        ("recommended_use_shower_wall", "shower_wall"),
        ("recommended_use_shower_floor", "shower_floor"),
        ("recommended_use_floor", "floor")] if flat.get(fl)]
    if uses:
        out["recommended_use_csv"] = ",".join(uses)
    return out


# --- corpus (mirror the synth layout) -------------------------------------


def _corpus():
    docs = {}
    for d in range(sr.N_SYNTH_DOCS):
        r = d % 6
        name = "Val%d" % (d % 9)
        lay = sr._layout(r)
        pages = {1: [], 2: []}
        for slot, (pg, x0, x1, cy, tx) in lay.items():
            tx = tx.replace("NL", "vàl%d" % (d % 9))
            tx = tx.replace("NM", "VAL%d" % (d % 9))
            pages[pg].append(
                {"sid": slot, "x0": x0, "x1": x1, "cy": cy, "text": tx})
        docs[d] = (name, [pages[1], pages[2]])
    return docs


def test_spec_rows_match_reference(spark):
    docs = _corpus()
    span_rows = [(d, pg + 1, s["sid"], s["x0"], s["x1"], s["cy"],
                  s["text"])
                 for d, (nm, pages) in docs.items()
                 for pg, spans in enumerate(pages) for s in spans]
    tgt_rows = [(d, d, nm, pg + 1, pg)
                for d, (nm, _p) in docs.items() for pg in (0, 1)]
    sdf = spark.createDataFrame(
        span_rows, "doc_id long, page int, sid int, x0 double, "
                   "x1 double, cy double, text string")
    tdf = spark.createDataFrame(
        tgt_rows, "doc_id long, product_idx long, name string, "
                  "page int, pg_ord int")
    got = {r.product_idx: {k: v for k, v in r.asDict().items()
                           if v is not None
                           and k not in ("doc_id", "product_idx")}
           for r in sr.parse_spec_rows(sdf, tdf).collect()}
    assert len(got) == len(docs)
    for d, (nm, pages) in docs.items():
        want = ref_nested_cols(ref_tier_a(pages, nm))
        assert got[d] == want, (d, got[d], want)


def test_spec_rows_spot_pins(spark):
    docs = _corpus()
    # regime 2 (doc 2): merged-span split, EU decimals, dim shift then
    # dict last-wins on the pallet slot, finish=matte, page-2 fill
    nm, pages = docs[2]
    flat = ref_tier_a(pages, nm)
    assert flat["weight_per_box_kg"] == 1234.56
    assert flat["boxes_per_pallet"] == 2108.42
    assert flat["pallet_dimensions_cm"] == "121X81X92"
    assert flat["m2_per_pallet"] == 9.9          # filled from page 2
    assert flat["finish_matt"] and "finish_gloss" not in flat
    # regime 4 (doc 4): contains-fallback anchor; a NUMBER at the
    # pallet slot overwrites the shifted dim; weight filled from p2
    nm4, pages4 = docs[4]
    flat4 = ref_tier_a(pages4, nm4)
    assert flat4["pallet_dimensions_cm"] == 990.0
    assert flat4["weight_per_box_kg"] == 99.9
    # regime 3 (doc 3): 9 values fall back to the 8-order, 9th dropped
    nm3, pages3 = docs[3]
    flat3 = ref_tier_a(pages3, nm3)
    assert flat3["thickness_inch"] == 0.35
    assert len([k for k in flat3 if not k.startswith(("finish", "rec",
                "shade", "traffic"))]) == 8
    # regime 5 (doc 5): best anchor has 2 numeric neighbors -> nothing
    nm5, pages5 = docs[5]
    assert ref_tier_a(pages5, nm5) == {}


def test_number_parser_conventions():
    cases = {"1,234.56": 1234.56, "1.234,56": 1234.56, "0,50": 0.5,
             "8,30": 8.3, "7.40": 7.4, "120": 120.0, "1 234,5": 1234.5,
             "": None, "BOX": None, "120X80X91": None, "1..2": None}
    for raw, want in cases.items():
        assert _parse_number(raw) == want, raw
