"""Pure-Python single-document extraction oracle (no Spark).

This module *is* the spec (SURVEY.md §5.2.1): a deliberately simple,
loop-based implementation of the reference's extraction semantics over one
document. The Spark engine (operators/extract.py) implements the same
semantics vectorized; tests/test_span_equality.py pins the two together on
span-sequence equality ``(kind, text, media_ref, order)``.

Semantics reproduced (SURVEY.md §2 citations into /root/reference):

- boilerplate strip       header/footer/page_number dropped (north rule;
                          deliberate deviation from the reference's
                          keep-as-TEXT mapping, paddleocr_pipeline.py:55-59)
- reading-order sort      per page (column, y, x, input-pos); two-column
                          pages detected by x-gap clustering (L6/M2;
                          stage_1_layout_precompute.py:728-745 and the
                          pymupdf4llm (y, x) block sort)
- heading inference       font-size histogram; most frequent = body, ties ->
                          smaller size is body; larger sizes desc -> # levels
                          (M1, pymupdf4llm header identification semantics)
- list/code detection     bullet/enum prefix; mono flag (M4)
- table assembly          aligned table_cell spans -> normalized grid ->
                          GitHub pipe table, one span per page grid (M3,
                          G1-G4; table_extraction.py:120-166)
- media semantics         per-(doc,layer) exact-phash dedup keeping the first
                          occurrence in (page,y,x) order (I5,
                          pdf_processor.py:1156-1255); per-page low-eDPI gate
                          replacing embedded images with one full_render span
                          (I2/I3, pdf_processor.py:1000-1136); deterministic
                          media_refs (pdf_processor.py:1023,1097,
                          region_crop_extractor.py:183)
- glyph + whitespace fix  ordered passes (T1/T2, extractor.py:17-84)
- offsets                 running char offset in reading order (W4)
- statuses                completed / no_text / empty_doc / completed_empty /
                          failed (stage_1_layout_precompute.py:50-56,
                          pdf_processor.py:2221-2270)
"""

from __future__ import annotations

import re
from dataclasses import replace

from ..core import constants as C
from ..core.kinds import SpanAttrs, parse_kind
from ..core.normalize import normalize_text
from ..core.tables import grid_to_pipe_table, normalize_grid

_LIST_RE = re.compile(C.LIST_MARKER_REGEX)


def _column_threshold(xs: list[float]) -> float | None:
    """Return the x threshold splitting two columns, or None if one column.

    Two columns when: spread >= MIN_COLUMN_SPREAD, the largest gap between
    consecutive sorted distinct x values >= MIN_COLUMN_GAP (ties -> leftmost
    gap), and each side holds >= MIN_SPANS_PER_COLUMN spans.
    """
    if not xs:
        return None
    uniq = sorted(set(xs))
    if uniq[-1] - uniq[0] < C.MIN_COLUMN_SPREAD:
        return None
    best_gap, best_mid = 0.0, None
    for a, b in zip(uniq, uniq[1:]):
        gap = b - a
        if gap > best_gap:  # strict '>' -> leftmost wins ties
            best_gap, best_mid = gap, (a + b) / 2.0
    if best_mid is None or best_gap < C.MIN_COLUMN_GAP:
        return None
    left = sum(1 for x in xs if x < best_mid)
    right = len(xs) - left
    if left < C.MIN_SPANS_PER_COLUMN or right < C.MIN_SPANS_PER_COLUMN:
        return None
    return best_mid


def _heading_map(parsed: list[tuple[SpanAttrs, str, str, int]]) -> dict[float, int]:
    """Font-size histogram over text/title spans -> {size: heading level}."""
    counts: dict[float, int] = {}
    for attrs, _text, _ref, _pos in parsed:
        if attrs.base in ("text", "title"):
            counts[attrs.size] = counts.get(attrs.size, 0) + 1
    if not counts:
        return {}
    # body = most frequent; ties -> smaller size is body (fixed tiebreak)
    body = min(
        (s for s in counts), key=lambda s: (-counts[s], s)
    )
    bigger = sorted((s for s in counts if s > body), reverse=True)
    return {
        s: min(i + 1, C.MAX_HEADING_LEVEL) for i, s in enumerate(bigger)
    }


def _dup_positions(parsed: list[tuple[SpanAttrs, str, str, int]]) -> set[int]:
    """Input positions of media spans that are exact-phash duplicates within
    their (doc, layer) bucket; first occurrence in (page, y, x, pos) order
    is kept."""
    buckets: dict[tuple[str, str], list[tuple[float, float, float, int]]] = {}
    for attrs, _text, _ref, pos in parsed:
        if attrs.base in C.MEDIA_KINDS and attrs.phash:
            key = (C.MEDIA_LAYER[attrs.base], attrs.phash)
            buckets.setdefault(key, []).append((attrs.page, attrs.y, attrs.x, pos))
    dups: set[int] = set()
    for occurrences in buckets.values():
        occurrences.sort()
        for _page, _y, _x, pos in occurrences[1:]:
            dups.add(pos)
    return dups


def extract_document(doc_id: str, spans: list[dict] | None) -> dict:
    """Extract one document. ``spans`` items need keys kind/text/media_ref
    (offset on the input side is advisory and ignored; order is re-derived
    from geometry)."""
    if not spans:
        return _result(doc_id, [], C.STATUS_EMPTY)
    if any(s.get("kind") is None for s in spans):
        return _result(doc_id, [], C.STATUS_FAILED)

    parsed: list[tuple[SpanAttrs, str, str, int]] = []
    for pos, s in enumerate(spans):
        attrs = parse_kind(s["kind"])
        if attrs.base in C.BOILERPLATE_KINDS:
            continue
        parsed.append((attrs, s.get("text") or "", s.get("media_ref") or "", pos))

    heading_map = _heading_map(parsed)
    dups = _dup_positions(parsed)
    # media dedup + heading histogram are sheet-level (pre-remap); the
    # L3/L5 spread remap then renumbers pages / duplicates straddlers.
    # Sheet GEOMETRY (dims + L2 gate) comes from the pre-dedup spans — it
    # is a property of the sheet, not of the surviving spans.
    kept = [it for it in parsed if it[3] not in dups]
    parsed = _remap_spreads(kept, parsed)

    pages: dict[int, list[tuple[SpanAttrs, str, str, int]]] = {}
    for item in parsed:
        pages.setdefault(item[0].page, []).append(item)

    out: list[tuple[str, str, str, int]] = []  # (kind, text, media_ref, page)
    for page in sorted(pages):
        out.extend((k, t, r, page) for k, t, r
                   in _extract_page(doc_id, page, pages[page], heading_map))

    if not out:
        status = C.STATUS_COMPLETED_EMPTY
    elif any(t for _k, t, _r, _p in out):
        status = C.STATUS_COMPLETED
    else:
        status = C.STATUS_NO_TEXT
    return _result(doc_id, out, status)


def _remap_spreads(
    parsed: list[tuple[SpanAttrs, str, str, int]],
    dims_source: list[tuple[SpanAttrs, str, str, int]],
) -> list[tuple[SpanAttrs, str, str, int]]:
    """L3/L5 spread remap (stage_1_layout_precompute.py:124-141, :198-234):
    see operators/extract.py remap_spreads — this is the loop-based spec.

    In sheet-addressed docs (any sheet with sw>0 and sh>0) the `page` attr
    is a SHEET index. Sheet dims = max sw/sh over the sheet's spans; aspect
    > SPREAD_ASPECT -> the sheet splits at mid=sw/2 into two physical pages.
    A span joins each half whose clip it intersects (inclusive bounds:
    straddlers land on BOTH, as in the reference); right copies translate
    x -> x - mid. Positions become 2*pos + half."""
    dims: dict[int, list[float]] = {}
    for a, _t, _r, _p in dims_source:
        d = dims.setdefault(a.page, [0.0, 0.0])
        d[0] = max(d[0], a.sw)
        d[1] = max(d[1], a.sh)
    if not any(w > 0 and h > 0 for w, h in dims.values()):
        return parsed
    # L2 full-spread-image gate (pdf_to_images.py:103-158): media covering
    # >= 75% of sheet width and >= 50% of sheet height -> do not split.
    # Both computed from the PRE-dedup spans (sheet geometry).
    full_img: set[int] = set()
    for a, _t, _r, _p in dims_source:
        if a.base in C.MEDIA_KINDS:
            w, h = dims[a.page]
            if (a.w >= C.FULL_SPREAD_WIDTH_FRAC * w
                    and a.h >= C.FULL_SPREAD_HEIGHT_FRAC * h):
                full_img.add(a.page)
    first: dict[int, int] = {}
    is_spread: dict[int, bool] = {}
    counter = 1
    for page in sorted(dims):
        w, h = dims[page]
        is_spread[page] = (h > 0 and w / h > C.SPREAD_ASPECT
                           and page not in full_img)
        first[page] = counter
        counter += 2 if is_spread[page] else 1
    out: list[tuple[SpanAttrs, str, str, int]] = []
    for a, t, r, p in parsed:
        fp = first[a.page]
        if not is_spread[a.page]:
            out.append((replace(a, page=fp), t, r, 2 * p))
            continue
        w, h = dims[a.page]
        mid = w / 2.0
        x1, y1 = a.x + a.w, a.y + a.h
        if not (x1 < 0 or a.x > mid or y1 < 0 or a.y > h):
            out.append((replace(a, page=fp), t, r, 2 * p))
        if not (x1 < mid or a.x > w or y1 < 0 or a.y > h):
            out.append((replace(a, page=fp + 1, x=a.x - mid), t, r, 2 * p + 1))
    return out


def _extract_page(
    doc_id: str,
    page: int,
    items: list[tuple[SpanAttrs, str, str, int]],
    heading_map: dict[float, int],
) -> list[tuple[str, str, str]]:
    cells = [it for it in items if it[0].base == C.TABLE_CELL_KIND]
    others = [it for it in items if it[0].base != C.TABLE_CELL_KIND]

    threshold = _column_threshold(
        [a.x for a, _t, _r, _p in others if a.base in C.TEXT_LIKE_KINDS]
    )

    def col_of(x: float) -> int:
        return 0 if threshold is None or x < threshold else 1

    # sortable records: (col, y, x, pos, payload)
    records: list[tuple[int, float, float, int, SpanAttrs, str, str]] = [
        (col_of(a.x), a.y, a.x, p, a, t, r) for a, t, r, p in others
    ]

    # table assembly: all table_cell spans on a page form one grid (rows by
    # y, columns by the col= x-cluster attribute); non-qualifying grids fall
    # back to plain text spans (G4's "None is not an empty table")
    if cells:
        table_records = _assemble_table(cells, col_of)
        records.extend(table_records)

    records.sort(key=lambda rec: (rec[0], rec[1], rec[2], rec[3]))

    # media pass: low-eDPI gate (embedded layer only) — any surviving
    # embedded image with 0 < edpi < MIN_EFFECTIVE_DPI poisons the page:
    # the first embedded image becomes a single full_render span, the rest
    # are dropped
    embedded = [rec for rec in records if rec[4].base == "image"]
    low_dpi = any(0 < rec[4].edpi < C.MIN_EFFECTIVE_DPI for rec in embedded)

    out: list[tuple[str, str, str]] = []
    img_idx = 0
    region_idx = 0
    emitted_full_render = False
    for col, y, x, pos, attrs, text, ref in records:
        base = attrs.base
        if base == "image":
            if low_dpi:
                if not emitted_full_render:
                    out.append(("image", "", C.media_ref_full_render(doc_id, page)))
                    emitted_full_render = True
                continue
            out.append(("image", "", C.media_ref_embedded(doc_id, page, img_idx)))
            img_idx += 1
        elif base == "figure":
            out.append(("figure", "", C.media_ref_region(doc_id, page, region_idx)))
            region_idx += 1
        elif base == "__table__":
            out.append(("table", text, ""))
        else:
            out.append(_classify_text(base, attrs, text, heading_map))
    return out


def _classify_text(
    base: str, attrs: SpanAttrs, text: str, heading_map: dict[float, int]
) -> tuple[str, str, str]:
    norm = normalize_text(text)
    if base == "code" or attrs.mono == 1:
        return ("code", norm, "")
    if base == "list" or _LIST_RE.match(text):
        return ("list", norm, "")
    if base == "title" or attrs.size in heading_map:
        level = heading_map.get(attrs.size, 1)
        return ("heading", "#" * level + " " + norm, "")
    if base == "caption":
        return ("caption", norm, "")
    return ("text", norm, "")


def _assemble_table(
    cells: list[tuple[SpanAttrs, str, str, int]],
    col_of,
) -> list[tuple[int, float, float, int, SpanAttrs, str, str]]:
    """Build one grid from a page's table_cell spans.

    Rows = distinct y ascending; columns = distinct col= cluster ids
    ascending; missing cells are ''. Returns one pseudo-record (base
    ``__table__`` carrying the serialized pipe table) positioned at the
    grid's (min y, min x), or per-cell text fallbacks when the grid does not
    normalize to >= 2x2.
    """
    ys = sorted({a.y for a, _t, _r, _p in cells})
    cols = sorted({a.col for a, _t, _r, _p in cells})
    row_of = {y: i for i, y in enumerate(ys)}
    col_idx = {c: i for i, c in enumerate(cols)}
    grid = [["" for _ in cols] for _ in ys]
    for a, t, _r, _p in cells:
        grid[row_of[a.y]][col_idx[a.col]] = normalize_text(t)
    norm = normalize_grid(grid)
    min_y = min(a.y for a, _t, _r, _p in cells)
    min_x = min(a.x for a, _t, _r, _p in cells)
    min_pos = min(p for _a, _t, _r, p in cells)
    if norm is None:
        # fallback: each cell is a plain text span in normal reading order
        return [
            (col_of(a.x), a.y, a.x, p, SpanAttrs(base="text", page=a.page,
                                                 y=a.y, x=a.x, size=0.0),
             t, "")
            for a, t, _r, p in cells
        ]
    pseudo = SpanAttrs(base="__table__", page=cells[0][0].page, y=min_y, x=min_x)
    return [(col_of(min_x), min_y, min_x, min_pos, pseudo,
             grid_to_pipe_table(norm), "")]


def _result(doc_id: str, out: list[tuple[str, str, str, int]],
            status: str) -> dict:
    spans = []
    offset = 0
    for kind, text, ref, page in out:
        spans.append({"kind": kind, "text": text, "media_ref": ref,
                      "offset": offset, "page": page})
        offset += len(text)
    return {
        "doc_id": doc_id,
        "spans": spans,
        "n_spans": len(spans),
        "n_chars": offset,
        "status": status,
    }
