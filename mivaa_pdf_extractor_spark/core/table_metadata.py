"""G7 table-metadata mining: dimensions / packaging / performance specs.

Models the reference's ``TableMetadataExtractor``
(app/services/metadata/table_metadata_extractor.py) — the deterministic
per-table mining core behind its per-product enrichment loop (the Supabase
fetch/merge shell around it is a network service, out of scope per SURVEY
§0). The reference pins three number bugs hard in
tests/unit/test_table_extraction.py:136-195, all of the class "a wrong
number that is still a valid number":

1. **size-column precedence + token matching** — short column keywords
   ('w', 'h', 'l', 'th') match whole TOKENS, never substrings (the height
   keyword 'l' used to hit ``Pz/Scatola`` and record a 60x120 tile as
   60x2), and a parsed size string ("60x120 cm") is never overwritten by a
   same-row axis column (table_metadata_extractor.py:423-443, :220-229);
2. **multilingual packaging abbreviations** — 'Pz', 'Mq' and friends must
   populate pieces-per-box / coverage on Italian/Spanish catalogs
   (:269-279);
3. **spec value = last populated cell** — spec tables are
   Property | Standard | Value, so taking row[1] records 'ISO 10545-3' as
   the water-absorption value (:349-365).

A fourth pinned behavior: dimensions and packaging are mined
INDEPENDENTLY, not as an elif chain — the canonical catalog table carries
both in one grid (:115-143, test :186-195).

Keyword tuples are pinned behavior-table *data* (the golden tests require
the exact sets); the parsing code is an independent restatement.
"""

from __future__ import annotations

import re

# the G5 classifier's dimension/packaging sets double as the
# looks-like-dimensions / looks-like-packaging gates
# (table_metadata_extractor.py:413-421 imports them from table_extraction)
from .tables import TABLE_TYPE_KEYWORDS

_DIMENSION_KEYWORDS = dict(TABLE_TYPE_KEYWORDS)["dimensions"]
_PACKAGING_KEYWORDS = dict(TABLE_TYPE_KEYWORDS)["packaging"]

# column-keyword sets for the dimensions parser
# (table_metadata_extractor.py:195-198)
SIZE_COL_KEYS = ("size", "dimension", "format", "formato")
WIDTH_COL_KEYS = ("width", "w", "ancho", "largo")
HEIGHT_COL_KEYS = ("height", "h", "length", "l", "alto")
THICKNESS_COL_KEYS = ("thickness", "th", "espesor", "spessore")

# packaging field -> column keywords (table_metadata_extractor.py:272-279)
PACKAGING_FIELDS: dict[str, tuple[str, ...]] = {
    "pieces_per_box": ("pieces", "pcs", "pz", "pezzi", "piezas", "pièces",
                       "box", "caja"),
    "boxes_per_pallet": ("boxes", "cartons", "cajas", "scatole", "pallet",
                         "bancale"),
    "weight_per_box_kg": ("weight", "peso", "poids", "kg"),
    "coverage_per_box_m2": ("coverage", "m2", "m²", "mq", "sqm", "area",
                            "superficie"),
    "pallet_weight_kg": ("pallet weight", "peso pallet"),
    "pieces_per_m2": ("pieces/m2", "pcs/m2", "piezas/m2", "pz/mq"),
}

# performance-spec field -> property keywords, matched against the row's
# FIRST cell, which on the catalogs actually ingested is IT/ES/FR/DE
# (table_metadata_extractor.py:322-339)
SPEC_FIELDS: dict[str, tuple[str, ...]] = {
    "slip_resistance": ("slip", "r10", "r11", "r12", "r13", "anti-slip",
                        "dcof", "antideslizante", "deslizamiento",
                        "scivolamento", "scivolosita", "glissance",
                        "rutschhemmung"),
    "water_absorption": ("water absorption", "absorcion", "absorción",
                         "assorbimento", "assorbimento acqua", "absorption"),
    "breaking_strength": ("breaking", "ruptura", "rottura", "flessione",
                          "flexion", "bending"),
    "frost_resistance": ("frost", "helada", "gelo", "gelivita", "gelività"),
    "abrasion_resistance": ("abrasion", "abrasione", "pei", "usura"),
    "chemical_resistance": ("chemical", "quimico", "químico", "chimico",
                            "chimica"),
    "fire_rating": ("fire", "fuego", "fuoco", "reazione al fuoco"),
}

_TOKEN_SPLIT = re.compile(r"[^a-z0-9²]+")
_SIZE_RE = re.compile(
    r"(\d+(?:[.,]\d+)?)\s*[x]\s*(\d+(?:[.,]\d+)?)"
    r"\s*(?:[x]\s*(\d+(?:[.,]\d+)?))?\s*(cm|mm)?", re.IGNORECASE)
_NUMBER_RE = re.compile(r"(\d+(?:\.\d+)?)")


def find_column(headers: list[str], keywords: tuple[str, ...]) -> int | None:
    """First column whose (lowercased) header matches a keyword. Keywords
    longer than 3 chars — or containing a space or slash — match as
    substrings ('size' → 'sizes', 'pallet weight'); short ones match whole
    tokens only, so 'l' can never hit 'Pz/Scatola' (pinned bug 1,
    table_metadata_extractor.py:423-443)."""
    for idx, header in enumerate(headers):
        h = str(header).lower()
        tokens = {t for t in _TOKEN_SPLIT.split(h) if t}
        for kw in keywords:
            if len(kw) > 3 or " " in kw or "/" in kw:
                if kw in h:
                    return idx
            elif kw in tokens:
                return idx
    return None


def parse_size_string(s: str) -> dict | None:
    """'60x120 cm' / '30x60x0.8cm' → width/height[/thickness]/unit/format
    (table_metadata_extractor.py:445-470). Decimal commas accepted; the
    format string renders integral floats without the trailing .0."""
    if not s:
        return None
    m = _SIZE_RE.search(s)
    if not m:
        return None

    def num(g: str) -> float:
        return float(g.replace(",", "."))

    w, h = num(m.group(1)), num(m.group(2))
    unit = m.group(4) or "cm"
    out = {"width": w, "height": h, "unit": unit,
           "format": f"{_fmt(w)}x{_fmt(h)} {unit}"}
    if m.group(3):
        out["thickness"] = num(m.group(3))
    return out


def _fmt(v: float) -> str:
    return str(int(v)) if v == int(v) else str(v)


def extract_number(value) -> float | None:
    """First number in a cell, decimal-comma tolerant
    (table_metadata_extractor.py:472-484)."""
    if value is None:
        return None
    if isinstance(value, (int, float)):
        return float(value)
    m = _NUMBER_RE.search(str(value).replace(",", "."))
    return float(m.group(1)) if m else None


def looks_like_dimensions(headers: list[str]) -> bool:
    text = " ".join(str(h).lower() for h in headers if h)
    return any(k in text for k in _DIMENSION_KEYWORDS)


def looks_like_packaging(headers: list[str]) -> bool:
    text = " ".join(str(h).lower() for h in headers if h)
    return any(k in text for k in _PACKAGING_KEYWORDS)


def parse_dimensions_table(headers: list[str],
                           rows: list[list[str]]) -> list[dict]:
    """One dimension dict per row that yields a width or height. A size
    column ('60x120 cm') is unambiguous and takes precedence; explicit
    width/height/thickness columns only fill values the size string did
    not resolve (pinned bug 1, table_metadata_extractor.py:213-233)."""
    headers_lower = [str(h).lower() if h else "" for h in headers]
    size_col = find_column(headers_lower, SIZE_COL_KEYS)
    width_col = find_column(headers_lower, WIDTH_COL_KEYS)
    height_col = find_column(headers_lower, HEIGHT_COL_KEYS)
    thickness_col = find_column(headers_lower, THICKNESS_COL_KEYS)

    dims: list[dict] = []
    for row in rows:
        if not isinstance(row, list):
            continue
        dim: dict = {}
        if size_col is not None and size_col < len(row):
            parsed = parse_size_string(str(row[size_col]))
            if parsed:
                dim.update(parsed)
        for col, field in ((width_col, "width"), (height_col, "height"),
                           (thickness_col, "thickness")):
            if col is not None and col < len(row) and not dim.get(field):
                n = extract_number(row[col])
                if n is not None:
                    dim[field] = n
        if dim.get("width") or dim.get("height"):
            dim.setdefault("unit", "cm")
            dims.append(dim)
    return dims


def parse_packaging_table(headers: list[str],
                          rows: list[list[str]]) -> dict[str, float]:
    """Column-mapped packaging fields, first data row with a number wins
    (table_metadata_extractor.py:257-303). The keyword sets carry the
    IT/ES abbreviations ('Pz', 'Mq') whose absence was pinned bug 2."""
    headers_lower = [str(h).lower() if h else "" for h in headers]
    out: dict[str, float] = {}
    for field, keywords in PACKAGING_FIELDS.items():
        col = find_column(headers_lower, keywords)
        if col is None:
            continue
        for row in rows:
            if isinstance(row, list) and col < len(row):
                n = extract_number(row[col])
                if n:
                    out[field] = n
                    break
    return out


def parse_specifications_table(rows: list[list[str]]) -> dict[str, str]:
    """Property rows → performance fields. The measurement is the LAST
    populated cell — spec tables are Property | Standard | Value, and
    row[1] is the ISO reference, not the value (pinned bug 3,
    table_metadata_extractor.py:349-365)."""
    perf: dict[str, str] = {}
    for row in rows:
        if not isinstance(row, list) or len(row) < 2:
            continue
        prop = str(row[0]).lower()
        value = next((str(c).strip() for c in reversed(row[1:])
                      if str(c).strip()), "")
        if not value:
            continue
        for field, keywords in SPEC_FIELDS.items():
            if any(kw in prop for kw in keywords):
                perf[field] = value
                break
    return perf


_GENERIC_DIM_RE = re.compile(
    r"(\d+(?:[.,]\d+)?)\s*[x]\s*(\d+(?:[.,]\d+)?)\s*(cm|mm)?", re.IGNORECASE)
_GENERIC_PIECES_RE = re.compile(
    r"(\d+(?:[.,]\d+)?)\s*(?:pcs|pieces|piezas|pezzi)/(?:box|caja)",
    re.IGNORECASE)
_GENERIC_WEIGHT_RE = re.compile(
    r"(\d+(?:[.,]\d+)?)\s*kg/?(?:box|caja)?", re.IGNORECASE)


def parse_generic_table(rows: list[list[str]]) -> dict:
    """Last-resort regex sweep over unclassified tables
    (table_metadata_extractor.py:369-411)."""
    dims: list[dict] = []
    packaging: dict[str, float] = {}
    for row in rows:
        if not isinstance(row, list):
            continue
        text = " ".join(str(c) for c in row if c)
        m = _GENERIC_DIM_RE.search(text)
        if m:
            w = float(m.group(1).replace(",", "."))
            h = float(m.group(2).replace(",", "."))
            unit = m.group(3) or "cm"
            dims.append({"width": w, "height": h, "unit": unit,
                         "format": f"{w}x{h} {unit}"})
        m = _GENERIC_PIECES_RE.search(text)
        if m:
            packaging["pieces_per_box"] = float(m.group(1).replace(",", "."))
        m = _GENERIC_WEIGHT_RE.search(text)
        if m:
            packaging["weight_per_box_kg"] = float(
                m.group(1).replace(",", "."))
    return {"dimensions": dims, "packaging": packaging}


def dimensions_to_sizes(dims: list[dict]) -> list[str]:
    """Sorted unique size strings (table_metadata_extractor.py:486-497)."""
    sizes = set()
    for d in dims:
        if d.get("format"):
            sizes.add(d["format"])
        elif d.get("width") and d.get("height"):
            sizes.add(f"{_fmt(d['width'])}x{_fmt(d['height'])} "
                      f"{d.get('unit', 'cm')}")
    return sorted(sizes)


def modal_thickness(dims: list[dict]) -> float | None:
    """Most common thickness across the mined dimensions (the reference's
    ``max(set(values), key=values.count)`` at
    table_metadata_extractor.py:168-171, whose tie-break is set-iteration
    order — here pinned deterministically to highest count, then smallest
    value)."""
    values = [d["thickness"] for d in dims if d.get("thickness")]
    if not values:
        return None
    return min(sorted(set(values)), key=lambda v: (-values.count(v), v))


def mine_table(table_type: str, headers: list[str],
               rows: list[list[str]]) -> dict:
    """Per-table mining core of ``extract_metadata_from_tables``
    (table_metadata_extractor.py:107-171): dimensions and packaging mined
    INDEPENDENTLY (a single 'dimensions' label must not discard the
    packaging half of a combined catalog grid — pinned behavior 4), specs
    on the 'specifications' label, generic regex sweep when nothing
    matched."""
    dims: list[dict] = []
    packaging: dict[str, float] = {}
    performance: dict[str, str] = {}
    matched = False

    if table_type == "dimensions" or looks_like_dimensions(headers):
        got = parse_dimensions_table(headers, rows)
        if got:
            matched = True
            dims.extend(got)
    if table_type == "packaging" or looks_like_packaging(headers):
        got = parse_packaging_table(headers, rows)
        if got:
            matched = True
            packaging.update(got)
    if table_type == "specifications":
        matched = True
        performance.update(parse_specifications_table(rows))
    if not matched:
        generic = parse_generic_table(rows)
        dims.extend(generic["dimensions"])
        packaging.update(generic["packaging"])

    return {
        "dimensions": dims,
        "available_sizes": dimensions_to_sizes(dims),
        "thickness_mm": modal_thickness(dims),
        "packaging": packaging,
        "performance": performance,
    }
