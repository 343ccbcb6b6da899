"""Vectorized extraction engine — the batched tokenize → block-classify →
span-assemble pass.

``extract_iter_arrow`` processes Arrow batches of documents (one row per
doc, ``spans`` as a list of structs) entirely with numpy/Arrow column
kernels:

- flatten the batch to one flat span table (doc_idx, pos, kind, text, ...),
- parse the kind grammar with vectorized ``str.extract``,
- doc-global heading histogram + media dedup with groupby,
- per-page column-split and table assembly (loops only over the rare
  candidate groups),
- one ``np.lexsort`` over the whole batch for reading order,
- glyph/whitespace normalization as chained C string kernels,
- arrow-native reassembly of the output span arrays.

The Spark surface is ``run_extract`` — ``mapInArrow`` directly over the
scan splits (hash-repartition only when the source is coarser than the
cluster) — which never runs per-row Python (north rule). The loop-based
spec this must match lives in oracle/extract_one.py.

``_process_flat`` (table assembly → column split → classify → normalize →
sort → media gating → offsets) is shared with the skew path
(operators/skew.py), which feeds it per-(doc, page) groups with doc-global
context computed natively.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F, types as T

from ..core import constants as C
from ..core.kinds import FLOAT_ATTR_PATTERN, INT_ATTR_PATTERN, attr_regex
from ..core.normalize import normalize_series
from ..core.tables import grid_to_pipe_table, normalize_grid

SPAN_OUT_STRUCT = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
    # physical page of the span (the reference's chunks carry page_number,
    # unified_chunking_service.py:51-61 — stamping it on the span lets the
    # chunker derive positional metadata without re-parsing geometry)
    T.StructField("page", T.IntegerType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", T.ArrayType(SPAN_OUT_STRUCT)),
    T.StructField("n_spans", T.IntegerType()),
    T.StructField("n_chars", T.LongType()),
    T.StructField("status", T.StringType()),
])

_HASH_PREFIX = np.array(["", "# ", "## ", "### ", "#### ", "##### ", "###### "],
                        dtype=object)


def _num_attr_arrow(arr: "pa.Array", key: str, fill: float,
                    pattern: str = FLOAT_ATTR_PATTERN) -> np.ndarray:
    """Numeric attr: RE2 extract with the shared anchored grammar (every
    match is guaranteed castable, so no-match -> null -> default, never an
    ArrowInvalid), cast + fill in Arrow — C-level end to end (pandas
    to_numeric on 1M-row object arrays profiled at ~2s/corpus)."""
    import pyarrow.compute as pc

    st = pc.extract_regex(arr, attr_regex(key, pattern, named=True))
    v = pc.cast(pc.struct_field(st, "v"), pa.float64())
    return pc.fill_null(v, fill).to_numpy(zero_copy_only=False)


def _attrs_arrow(k: pd.Series, keys: list[str]) -> dict[str, pd.Series]:
    """All attr extractions in one Arrow pass per key: pyarrow's RE2-based
    ``extract_regex`` runs ~20x faster than pandas' per-row ``re.search``
    (.str.extract), which profiled as 2/3 of the giant-path kernel."""
    import pyarrow.compute as pc

    arr = pa.array(k, type=pa.string())
    out: dict[str, pd.Series] = {
        "__base__": pc.struct_field(
            pc.extract_regex(arr, r"^(?P<v>[^;]*)"), "v").to_pandas()
    }
    for key in keys:
        st = pc.extract_regex(arr, rf"(?:^|;){key}=(?P<v>[^;]*)")
        out[key] = pc.struct_field(st, "v").to_pandas()
    return out


def parse_attrs(flat: pd.DataFrame) -> pd.DataFrame:
    """Vectorized kind-grammar parse (the tokenizer of this domain)."""
    import pyarrow.compute as pc

    k = flat["kind"].astype("object").fillna("")
    arr = pa.array(k, type=pa.string())
    a = _attrs_arrow(k, ["phash"])
    flat["base"] = a["__base__"].astype(object)
    # span w/h + sheet dims feed ONLY the L3/L5 spread remap, so the four
    # extra regex passes are gated on a cheap substring probe for ';sw='
    # (sheet-addressed docs always carry it on at least one span per sheet)
    if len(k) and pc.any(pc.match_substring(arr, ";sw=")).as_py():
        flat["w"] = _num_attr_arrow(arr, "w", 0.0)
        flat["h"] = _num_attr_arrow(arr, "h", 0.0)
        flat["sw"] = _num_attr_arrow(arr, "sw", 0.0)
        flat["sh"] = _num_attr_arrow(arr, "sh", 0.0)
    else:
        flat["w"] = 0.0
        flat["h"] = 0.0
        flat["sw"] = 0.0
        flat["sh"] = 0.0
    flat["page"] = _num_attr_arrow(
        arr, "page", 1.0, INT_ATTR_PATTERN).astype(np.int64)
    flat["y"] = _num_attr_arrow(arr, "y", 0.0)
    flat["x"] = _num_attr_arrow(arr, "x", 0.0)
    flat["size"] = _num_attr_arrow(arr, "size", 10.0)
    flat["mono"] = _num_attr_arrow(
        arr, "mono", 0.0, INT_ATTR_PATTERN).astype(np.int64)
    flat["colattr"] = _num_attr_arrow(
        arr, "col", 0.0, INT_ATTR_PATTERN).astype(np.int64)
    flat["edpi"] = _num_attr_arrow(
        arr, "edpi", 0.0, INT_ATTR_PATTERN).astype(np.int64)
    flat["phash"] = a["phash"].fillna("").astype(object)
    return flat


def heading_levels(flat: pd.DataFrame,
                   valid: np.ndarray | None = None) -> pd.DataFrame:
    """Per (doc_idx, size) heading level for sizes above the doc's body size.

    body = most frequent size among text/title spans (ties -> smaller size);
    sizes > body get levels 1.. descending by size, capped at 6 (M1).
    ``valid`` (optional row mask) lets the caller defer the boilerplate
    filter so the frame is copied once, not per stage.
    Returns columns (doc_idx, size, level).
    """
    mask = flat["base"].isin(("text", "title"))
    if valid is not None:
        mask &= valid
    tt = flat[mask]
    if tt.empty:
        return pd.DataFrame({"doc_idx": pd.Series(dtype=np.int64),
                             "size": pd.Series(dtype=np.float64),
                             "level": pd.Series(dtype=np.int64)})
    counts = tt.groupby(["doc_idx", "size"]).size().rename("cnt").reset_index()
    counts = counts.sort_values(["doc_idx", "cnt", "size"],
                                ascending=[True, False, True])
    body = counts.drop_duplicates("doc_idx")[["doc_idx", "size"]].rename(
        columns={"size": "body"})
    sizes = counts[["doc_idx", "size"]].merge(body, on="doc_idx")
    bigger = sizes[sizes["size"] > sizes["body"]].copy()
    if bigger.empty:
        return pd.DataFrame({"doc_idx": pd.Series(dtype=np.int64),
                             "size": pd.Series(dtype=np.float64),
                             "level": pd.Series(dtype=np.int64)})
    bigger["level"] = (
        bigger.groupby("doc_idx")["size"]
        .rank(ascending=False, method="dense").astype(np.int64)
        .clip(upper=C.MAX_HEADING_LEVEL)
    )
    return bigger[["doc_idx", "size", "level"]]


def mark_media_dups(flat: pd.DataFrame,
                    valid: np.ndarray | None = None) -> pd.Series:
    """Boolean mask: media span is an exact-phash duplicate within its
    (doc, layer) bucket; first occurrence in (page, y, x, pos) order kept
    (I5, per-layer buckets pdf_processor.py:1184-1238)."""
    is_media = flat["base"].isin(C.MEDIA_KINDS) & (flat["phash"] != "")
    if valid is not None:
        is_media &= valid
    dup = pd.Series(False, index=flat.index)
    if not is_media.any():
        return dup
    m = flat.loc[is_media, ["doc_idx", "base", "phash", "page", "y", "x", "pos"]]
    m = m.sort_values(["doc_idx", "base", "phash", "page", "y", "x", "pos"])
    dup.loc[m.index] = m.duplicated(["doc_idx", "base", "phash"], keep="first")
    return dup


_SHEET_CTX_COLS = ["sheet_doc", "is_spread", "first_phys",
                   "sheet_w", "sheet_h"]


def _sheet_ctx(flat: pd.DataFrame,
               valid: np.ndarray | None = None) -> pd.DataFrame | None:
    """Per-(doc, sheet) physical-page mapping for sheet-addressed documents
    (L1 over the fixture encoding): sheet dims = max sw/sh over the sheet's
    spans; aspect > SPREAD_ASPECT -> spread (2 physical pages); 1-based
    running first_physical counter in sheet order. Returns None when the
    batch has no sheet-addressed doc (fast path)."""
    # validity is SHEET-level (a sheet's sw and sh may come from different
    # spans — the dims are per-sheet maxes); this cheap span-level probe is
    # only a necessary condition for the fast path
    if not ((flat["sw"] > 0).any() and (flat["sh"] > 0).any()):
        return None
    if valid is not None:
        flat = flat.loc[valid, ["doc_idx", "page", "sw", "sh", "base",
                                "w", "h"]]
    d = (flat.groupby(["doc_idx", "page"], sort=True)[["sw", "sh"]].max()
         .rename(columns={"sw": "sheet_w", "sh": "sheet_h"}).reset_index())
    valid = (d["sheet_w"] > 0) & (d["sheet_h"] > 0)
    if not valid.any():
        return None
    d["sheet_doc"] = valid.groupby(d["doc_idx"]).transform("max")
    safe_h = np.where(d["sheet_h"] > 0, d["sheet_h"], 1.0)
    d["is_spread"] = ((d["sheet_h"] > 0)
                      & (d["sheet_w"] / safe_h > C.SPREAD_ASPECT))
    # L2 full-spread-image gate (pdf_to_images.py:103-158): a media span
    # covering >= 75% of sheet width and >= 50% of sheet height means the
    # spread must NOT be split — the sheet stays one physical page
    media = flat.loc[flat["base"].isin(C.MEDIA_KINDS),
                     ["doc_idx", "page", "w", "h"]]
    if len(media):
        m = media.merge(d[["doc_idx", "page", "sheet_w", "sheet_h"]],
                        on=["doc_idx", "page"])
        m["full_img"] = ((m["w"] >= C.FULL_SPREAD_WIDTH_FRAC * m["sheet_w"])
                         & (m["h"] >= C.FULL_SPREAD_HEIGHT_FRAC * m["sheet_h"]))
        flag = (m.groupby(["doc_idx", "page"])["full_img"].max()
                .reset_index())
        d = d.merge(flag, on=["doc_idx", "page"], how="left")
        # notna()&eq(True) instead of fillna(False): the object-dtype
        # fillna downcast is deprecated in pandas 2.x
        d["is_spread"] &= ~(d["full_img"].notna() & d["full_img"].eq(True))
    n_phys = np.where(d["is_spread"], 2, 1)
    d["first_phys"] = (pd.Series(n_phys).groupby(d["doc_idx"]).cumsum()
                       - n_phys + 1)
    return d[["doc_idx", "page"] + _SHEET_CTX_COLS]


def remap_spreads(flat: pd.DataFrame,
                  dims: pd.DataFrame | None = None,
                  ctx: pd.DataFrame | None = None) -> pd.DataFrame:
    """L3 half-page clip + L5 span-in-clip remap (reference
    stage_1_layout_precompute.py:124-141 `_clip_rect_for_position`,
    :198-234 `_pymupdf_spans_in_clip`): in sheet-addressed docs the `page`
    attr is a SHEET index; spread sheets (aspect > 1.4) split at mid = sw/2
    into two physical pages. A span lands on each half whose clip rect it
    intersects (inclusive bounds — gutter-straddling spans appear on BOTH
    halves, exactly like the reference); right-half copies translate
    x -> x - mid. Runs AFTER media dedup / heading histogram (content stats
    are sheet-level) and BEFORE classify/sort. `pos` becomes 2*pos + half
    so the duplicated copies stay uniquely ordered.

    Sheet geometry (dims + the L2 gate) is a property of the SHEET, so it
    is computed PRE-media-dedup (reference: page.rect / page images) —
    pass `dims` from `_sheet_ctx` on the pre-dedup frame (None -> no
    sheet-addressed docs, no-op), or `ctx` (the skew path's per-row native
    context, aligned row-for-row with `flat`)."""
    if ctx is None:
        if dims is None:
            return flat
        flat = flat.merge(dims, on=["doc_idx", "page"], how="left")
        # dedup may have removed a sheet's only spans; remaining rows
        # always match a dims row, but guard dtypes anyway
        if flat["sheet_doc"].isna().any():  # pragma: no cover
            flat["sheet_doc"] = flat["sheet_doc"].fillna(False)
            flat["is_spread"] = flat["is_spread"].fillna(False)
            flat["first_phys"] = flat["first_phys"].fillna(1)
            flat["sheet_w"] = flat["sheet_w"].fillna(0.0)
            flat["sheet_h"] = flat["sheet_h"].fillna(0.0)
    else:
        flat = flat.reset_index(drop=True)
        for c in _SHEET_CTX_COLS:
            flat[c] = ctx[c].to_numpy()
        if not flat["sheet_doc"].any():
            return flat.drop(columns=_SHEET_CTX_COLS)

    flat = flat.copy()
    flat["pos"] = 2 * flat["pos"]
    sheet = flat["sheet_doc"].to_numpy(dtype=bool)
    spread = sheet & flat["is_spread"].to_numpy(dtype=bool)
    first = flat["first_phys"].to_numpy(dtype=np.int64)
    x = flat["x"].to_numpy(dtype=np.float64)
    y = flat["y"].to_numpy(dtype=np.float64)
    x1 = x + flat["w"].to_numpy(dtype=np.float64)
    y1 = y + flat["h"].to_numpy(dtype=np.float64)
    sw = flat["sheet_w"].to_numpy(dtype=np.float64)
    shh = flat["sheet_h"].to_numpy(dtype=np.float64)
    mid = sw / 2.0
    in_left = spread & ~((x1 < 0) | (x > mid) | (y1 < 0) | (y > shh))
    in_right = spread & ~((x1 < mid) | (x > sw) | (y1 < 0) | (y > shh))

    pg = flat["page"].to_numpy(dtype=np.int64).copy()
    pg[sheet] = first[sheet]  # single sheets + left halves
    flat["page"] = pg
    left_part = flat[~spread | in_left]
    right = flat[in_right].copy()
    right["page"] = first[in_right] + 1
    right["x"] = x[in_right] - mid[in_right]
    right["pos"] = right["pos"].to_numpy() + 1
    out = pd.concat([left_part, right], ignore_index=True)
    return out.drop(columns=_SHEET_CTX_COLS)


def _assemble_tables(flat: pd.DataFrame) -> pd.DataFrame:
    """Replace each (doc, page)'s table_cell group with one ``__table__``
    pseudo-row (or per-cell text fallbacks when the grid is < 2x2)."""
    cell_mask = flat["base"] == C.TABLE_CELL_KIND
    if not cell_mask.any():
        # common case: no table cells -> no pseudo-row surgery, and the two
        # marker columns are constant (skip the full-frame copy)
        flat["from_cell"] = False
        flat["pre_normalized"] = False
        return flat
    flat = flat.copy()
    flat["from_cell"] = False
    flat["pre_normalized"] = False
    cells = flat[cell_mask].copy()
    cells["norm"] = normalize_series(cells["text"])
    pseudo_rows = []
    fallback_idx: list = []
    for (d, p), grp in cells.groupby(["doc_idx", "page"], sort=False):
        ys = sorted(grp["y"].unique())
        colids = sorted(grp["colattr"].unique())
        row_of = {y: i for i, y in enumerate(ys)}
        col_of = {c: i for i, c in enumerate(colids)}
        grid = [["" for _ in colids] for _ in ys]
        for y, cid, txt in zip(grp["y"], grp["colattr"], grp["norm"]):
            grid[row_of[y]][col_of[cid]] = txt
        norm = normalize_grid(grid)
        if norm is None:
            fallback_idx.extend(grp.index)
            continue
        pseudo_rows.append({
            "doc_idx": d, "doc_id": grp["doc_id"].iloc[0],
            "pos": int(grp["pos"].min()), "kind": "",
            "text": grid_to_pipe_table(norm), "ref": "",
            "base": "__table__", "page": p,
            "y": float(grp["y"].min()), "x": float(grp["x"].min()),
            "size": 0.0, "mono": 0, "colattr": 0, "edpi": 0, "phash": "",
            "from_cell": True, "pre_normalized": True,
        })
    if fallback_idx:
        flat.loc[fallback_idx, "base"] = "text"
        flat.loc[fallback_idx, "size"] = 0.0
        flat.loc[fallback_idx, "from_cell"] = True
    flat = flat.drop(index=flat.index[flat["base"] == C.TABLE_CELL_KIND])
    if pseudo_rows:
        flat = pd.concat([flat, pd.DataFrame(pseudo_rows)], ignore_index=True)
    return flat


def _column_split(flat: pd.DataFrame) -> pd.Series:
    """Column index (0/1) per span from the per-(doc,page) x-gap split over
    text-like spans (excluding table-cell fallbacks, matching the oracle).

    Fully vectorized (round 3): one lexsort of the text-like rows, then
    segment arithmetic — max gap via ``np.maximum.at``, leftmost-tie index
    via ``np.minimum.at``, and the qualifying (doc, page) -> mid mapping
    applied to the whole frame with one ``searchsorted``. The previous
    per-candidate-group loop re-scanned the WHOLE frame per group
    (`flat["doc_idx"] == key[0]`) — O(rows x groups), profiled at 75% of
    the kernel on multi-column corpora. Gap positions over the
    duplicated sorted xs are equivalent to the oracle's unique-xs gaps
    (duplicate-adjacent diffs are 0, never maximal vs MIN_COLUMN_GAP > 0,
    and tie order is preserved)."""
    n = len(flat)
    col = np.zeros(n, dtype=np.int64)
    tl_mask = (flat["base"].isin(C.TEXT_LIKE_KINDS).to_numpy()
               & ~flat["from_cell"].to_numpy(dtype=bool))
    if not tl_mask.any():
        return pd.Series(col, index=flat.index)
    d_all = flat["doc_idx"].to_numpy(dtype=np.int64)
    p_all = flat["page"].to_numpy(dtype=np.int64)
    x_all = flat["x"].to_numpy(dtype=np.float64)
    # composite (doc, page) key; pages are parsed ints (offset keeps any
    # negative attr value collision-free), doc_idx is batch-bounded
    key_all = d_all * (1 << 33) + (p_all + (1 << 31))

    k = key_all[tl_mask]
    x = x_all[tl_mask]
    order = np.lexsort((x, k))
    ks = k[order]
    xs = x[order]
    seg_new = np.r_[True, ks[1:] != ks[:-1]]
    starts = np.flatnonzero(seg_new)
    ends = np.r_[starts[1:], len(ks)]
    counts = ends - starts
    nseg = len(starts)
    seg_id = np.cumsum(seg_new) - 1

    gaps = np.diff(xs)
    gseg = seg_id[:-1]
    valid = seg_id[:-1] == seg_id[1:]
    segmax = np.full(nseg, -1.0)
    np.maximum.at(segmax, gseg[valid], gaps[valid])
    big = np.iinfo(np.int64).max
    gidx = np.full(nseg, big)
    ismax = valid & (gaps == segmax[gseg])
    np.minimum.at(gidx, gseg[ismax], np.flatnonzero(ismax))

    ok = ((xs[ends - 1] - xs[starts] >= C.MIN_COLUMN_SPREAD)
          & (counts >= 2 * C.MIN_SPANS_PER_COLUMN)
          & (segmax >= C.MIN_COLUMN_GAP)
          & (gidx < big))
    gsafe = np.clip(gidx, 0, max(len(xs) - 2, 0))
    left = gsafe - starts + 1
    ok &= ((left >= C.MIN_SPANS_PER_COLUMN)
           & (counts - left >= C.MIN_SPANS_PER_COLUMN))
    if not ok.any():
        return pd.Series(col, index=flat.index)
    mids = (xs[gsafe] + xs[gsafe + 1]) / 2.0
    qual_keys = ks[starts[ok]]  # ascending (lexsort primary key)
    qual_mids = mids[ok]

    pos = np.searchsorted(qual_keys, key_all)
    posc = np.clip(pos, 0, len(qual_keys) - 1)
    hit = qual_keys[posc] == key_all
    col[hit] = (x_all[hit] >= qual_mids[posc][hit]).astype(np.int64)
    return pd.Series(col, index=flat.index)


def process_flat(flat: pd.DataFrame, headings: pd.DataFrame) -> pd.DataFrame:
    """The classify → assemble core over a flat span frame whose boilerplate
    and media duplicates are already removed.

    ``flat`` columns: doc_idx, doc_id, pos, kind, text, ref + parsed attrs.
    ``headings``: (doc_idx, size, level).
    Returns the frame sorted in reading order with out_kind/out_text/out_ref/
    offset/tlen columns (offsets restart at 0 per doc_idx).
    """
    flat = _assemble_tables(flat)
    flat["col"] = _column_split(flat)

    if len(headings):
        # merge only the 2-column key frame: a full-frame merge copies and
        # re-consolidates every column (profiled at ~25% of this kernel)
        flat["level"] = (flat[["doc_idx", "size"]]
                        .merge(headings, on=["doc_idx", "size"], how="left")
                        ["level"].to_numpy())
    else:
        flat["level"] = np.nan

    base = flat["base"]
    raw_text = flat["text"].astype("object").fillna("")
    is_media = base.isin(C.MEDIA_KINDS)
    is_table = base == "__table__"
    is_code = (base == "code") | ((flat["mono"] == 1) & ~is_media & ~is_table)
    import pyarrow.compute as pc
    list_marker = pd.Series(
        pc.match_substring_regex(
            pa.array(raw_text, type=pa.string()),
            "^" + C.LIST_MARKER_REGEX).to_numpy(zero_copy_only=False),
        index=raw_text.index)
    is_list = (~is_code & ~is_media & ~is_table
               & ((base == "list") | list_marker))
    is_heading = (~is_code & ~is_list & ~is_media & ~is_table
                  & ((base == "title") | flat["level"].notna()))
    is_caption = (base == "caption") & ~is_code & ~is_list & ~is_heading

    # vectorized normalization for everything except pre-normalized tables
    norm = raw_text.copy()
    to_norm = ~flat["pre_normalized"].to_numpy(dtype=bool)
    norm[to_norm] = normalize_series(raw_text[to_norm])
    norm[is_media.to_numpy()] = ""

    # heading prefix (normalize-then-prefix, like the oracle)
    lvl = flat["level"].fillna(1).astype(np.int64).clip(1, C.MAX_HEADING_LEVEL)
    h = is_heading.to_numpy()
    norm_arr = norm.to_numpy(dtype=object)
    norm_arr[h] = _HASH_PREFIX[lvl.to_numpy()[h]] + norm_arr[h]

    out_kind = np.where(is_media, base, "text").astype(object)
    out_kind[is_table.to_numpy()] = "table"
    out_kind[is_code.to_numpy()] = "code"
    out_kind[is_list.to_numpy()] = "list"
    out_kind[h] = "heading"
    out_kind[is_caption.to_numpy()] = "caption"

    # From here on the frame is done: one reading-order lexsort, then the
    # media gate + offsets run on SORTED NUMPY ARRAYS with contiguous
    # (doc, page) segments — the previous .assign/.iloc/.merge chain spent
    # >80% of this kernel in pandas block copies and consolidation.
    order = np.lexsort((flat["pos"].to_numpy(), flat["x"].to_numpy(),
                        flat["y"].to_numpy(), flat["col"].to_numpy(),
                        flat["page"].to_numpy(), flat["doc_idx"].to_numpy()))
    n = len(order)
    d_s = flat["doc_idx"].to_numpy()[order]
    pg_s = flat["page"].to_numpy()[order]
    base_s = flat["base"].to_numpy(dtype=object)[order]
    edpi_s = flat["edpi"].to_numpy()[order]
    did_s = flat["doc_id"].to_numpy(dtype=object)[order]
    text_s = norm_arr[order]
    kind_s = out_kind[order]

    out = pd.DataFrame({
        "doc_idx": d_s, "doc_id": did_s, "page": pg_s,
        "out_kind": kind_s, "out_text": text_s,
    })
    if n == 0:
        out["out_ref"] = np.array([], dtype=object)
        out["tlen"] = np.array([], dtype=np.int64)
        out["offset"] = np.array([], dtype=np.int32)
        return out

    # contiguous (doc, page) segments after the sort
    seg_new = np.r_[True, (d_s[1:] != d_s[:-1]) | (pg_s[1:] != pg_s[:-1])]
    seg_starts = np.flatnonzero(seg_new)
    seg_id = np.cumsum(seg_new) - 1

    # media gating (I2/I3 low-eDPI page gate) as segment reductions
    emb_np = base_s == "image"
    fig_np = base_s == "figure"
    low = emb_np & (edpi_s > 0) & (edpi_s < C.MIN_EFFECTIVE_DPI)
    pois_np = np.logical_or.reduceat(low, seg_starts)[seg_id]

    refs = np.empty(n, dtype=object)
    refs[:] = ""
    drop_mask = np.zeros(n, dtype=bool)
    media_np = emb_np | fig_np
    if media_np.any():
        # page-as-string only where media refs need it
        pg = np.empty(n, dtype=object)
        pg[media_np] = pg_s[media_np].astype(str).astype(object)

        def seg_rank(mask):
            # within-segment running count of mask rows, valid at mask rows
            cs = np.cumsum(mask)
            before = (cs - mask)[seg_starts]
            return cs - 1 - before[seg_id]

        if emb_np.any():
            rank_full = seg_rank(emb_np)
            healthy = emb_np & ~pois_np
            refs[healthy] = (did_s[healthy] + "/p" + pg[healthy] + "/img"
                             + rank_full[healthy].astype(str)
                             .astype(object))
            first_poisoned = emb_np & pois_np & (rank_full == 0)
            refs[first_poisoned] = (did_s[first_poisoned] + "/p"
                                    + pg[first_poisoned] + "/full_render")
            drop_mask |= emb_np & pois_np & (rank_full > 0)
        if fig_np.any():
            frank = seg_rank(fig_np)
            refs[fig_np] = (did_s[fig_np] + "/p" + pg[fig_np] + "/region"
                            + frank[fig_np].astype(str).astype(object))

    if drop_mask.any():
        keep = ~drop_mask
        out = out[keep].reset_index(drop=True)
        refs = refs[keep]
        d_s = d_s[keep]
        text_s = text_s[keep]

    # offsets: per-doc running char offset in reading order (W4), as
    # contiguous-segment arithmetic over the (sorted) doc runs
    tlen = pc.utf8_length(
        pa.array(text_s, type=pa.string())
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_new = np.r_[True, d_s[1:] != d_s[:-1]]
    doc_starts = np.flatnonzero(doc_new)
    doc_id_seg = np.cumsum(doc_new) - 1
    cum_excl = np.cumsum(tlen) - tlen
    offset = cum_excl - cum_excl[doc_starts][doc_id_seg]

    out["out_ref"] = refs
    out["tlen"] = tlen
    out["offset"] = offset.astype(np.int32)
    return out


def _flatten_arrow(batch: "pa.RecordBatch") -> tuple[pd.DataFrame, pd.DataFrame]:
    """Arrow-native flatten: the spans ListArray's offsets/values replace
    the per-span Python loop of ``_flatten`` (dict-per-span materialization
    profiled as the normal path's dominant cost)."""
    spans_col = batch.column("spans")
    lengths = spans_col.value_lengths().to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    values = spans_col.flatten()  # StructArray of all spans, doc order

    docs = pd.DataFrame({
        "doc_idx": np.arange(len(batch)),
        "doc_id": batch.column("doc_id").to_pandas().astype(object),
        "n_input": lengths,
    })
    total = int(lengths.sum())
    starts = np.zeros(len(batch), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    flat = pd.DataFrame({
        "doc_idx": np.repeat(np.arange(len(batch)), lengths),
        "doc_id": np.repeat(docs["doc_id"].to_numpy(), lengths),
        "pos": (np.arange(total) - np.repeat(starts, lengths)
                if total else np.array([], dtype=np.int64)),
        "kind": values.field("kind").to_pandas().astype(object),
        "text": values.field("text").to_pandas().astype(object),
        "ref": values.field("media_ref").to_pandas().astype(object),
    })
    return flat, docs


def _reassemble_arrow(flat: pd.DataFrame, docs: pd.DataFrame,
                      failed_docs: set) -> "pa.RecordBatch":
    """Build the output RecordBatch without ever materializing per-span
    Python dicts (no ``to_pylist`` round-trip)."""
    n_docs = len(docs)
    counts = np.zeros(n_docs, dtype=np.int64)
    if len(flat):
        vc = flat["doc_idx"].value_counts()
        counts[vc.index.to_numpy()] = vc.to_numpy()
    offsets = np.zeros(n_docs + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])

    struct = pa.StructArray.from_arrays(
        [pa.array(flat["out_kind"], type=pa.string()),
         pa.array(flat["out_text"], type=pa.string()),
         pa.array(flat["out_ref"], type=pa.string()),
         pa.array(flat["offset"], type=pa.int32()),
         pa.array(flat["page"].to_numpy(dtype=np.int64), type=pa.int32())],
        names=["kind", "text", "media_ref", "offset", "page"],
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets), struct)

    n_chars = np.zeros(n_docs, dtype=np.int64)
    has_text = np.zeros(n_docs, dtype=bool)
    if len(flat):
        per_doc = flat.groupby("doc_idx")["tlen"].agg(["sum", "max"])
        n_chars[per_doc.index.to_numpy()] = per_doc["sum"].to_numpy()
        has_text[per_doc.index.to_numpy()] = per_doc["max"].to_numpy() > 0

    status = np.where(
        docs["n_input"].to_numpy() == 0, C.STATUS_EMPTY,
        np.where(has_text, C.STATUS_COMPLETED,
                 np.where(counts > 0, C.STATUS_NO_TEXT,
                          C.STATUS_COMPLETED_EMPTY)),
    ).astype(object)
    # failed docs carry no flat rows, so their list slot is already empty
    for d in failed_docs:
        status[d] = C.STATUS_FAILED

    failed = status == C.STATUS_FAILED
    return pa.RecordBatch.from_arrays(
        [pa.array(docs["doc_id"], type=pa.string()),
         spans,
         pa.array(np.where(failed, 0, counts).astype(np.int32)),
         pa.array(np.where(failed, 0, n_chars).astype(np.int64)),
         pa.array(status, type=pa.string())],
        names=["doc_id", "spans", "n_spans", "n_chars", "status"],
    )


# docs per processing chunk: the kernel runs ~60 vectorized ops per chunk,
# so Spark's default 256-record Arrow batches pay that fixed cost every
# ~2k spans (measured 2.5x slowdown); accumulate to amortize. Gains plateau
# by ~2k docs; 4k of even large (skew-threshold-sized) docs stays <~1 GB.
_CHUNK_DOCS = 4096


def _coalesce_batches(
        batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
    pending: list[pa.RecordBatch] = []
    n = 0
    for b in batches:
        if b.num_rows == 0:
            continue
        pending.append(b)
        n += b.num_rows
        if n >= _CHUNK_DOCS:
            yield pa.Table.from_batches(pending).combine_chunks().to_batches(
                max_chunksize=n)[0]
            pending, n = [], 0
    if pending:
        yield pa.Table.from_batches(pending).combine_chunks().to_batches(
            max_chunksize=n)[0]


def extract_iter_arrow(
        batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
    """mapInArrow entrypoint: one tokenize->classify->assemble pass per
    Arrow chunk of documents, with zero per-span Python objects at either
    boundary."""
    for batch in _coalesce_batches(batches):
        flat, docs = _flatten_arrow(batch)

        null_kind = flat["kind"].isna()
        failed_docs = set(flat.loc[null_kind, "doc_idx"].unique())
        if failed_docs:
            flat = flat[~flat["doc_idx"].isin(failed_docs)]

        flat = parse_attrs(flat)
        # one combined boilerplate+dedup take (see extract_batch)
        ok = ~flat["base"].isin(C.BOILERPLATE_KINDS).to_numpy()
        headings = heading_levels(flat, ok)
        sheet_dims = _sheet_ctx(flat, ok)  # sheet geometry is pre-dedup
        flat = flat[ok & ~mark_media_dups(flat, ok).to_numpy()]
        flat = remap_spreads(flat, sheet_dims)
        flat = process_flat(flat, headings)
        yield _reassemble_arrow(flat, docs, failed_docs)


def source_partitions(df: DataFrame) -> int:
    """Physical partition count of `df`'s plan. The df->RDD bridge compiles
    a separate physical plan, so call this ONCE per source, not per subplan
    (ADVICE r1) — run_extract_skewed probes the raw source and passes the
    decision down."""
    try:
        return df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive
        return df.sparkSession.sparkContext.defaultParallelism


# Bytes of source per extraction task when spreading a too-coarse source.
# The kernel runs ~135 ms per source MiB, and a mapInArrow task costs
# ~14 ms of Python round-trip (both measured on this box) — 2 MiB/task
# keeps the per-task overhead under ~5% of its compute.
_REPART_BYTES_PER_TASK = 2 * 1024 * 1024


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the plan (file-footprint-derived for
    parquet/Iceberg scans). -1 when unavailable."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:  # pragma: no cover - defensive
        return -1


def auto_partition_target(df: DataFrame) -> int:
    """Decide whether (and how wide) to spread a too-coarse source before
    the Arrow pass. Returns 0 for "leave the scan partitions alone", else
    a pinned repartition count: ~one task per 2 MiB of source, capped at
    3x parallelism, and never narrower than the scan already is. Sources
    at least as wide as the cluster are never reshuffled (their splits
    are size-balanced by maxPartitionBytes already)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    src = source_partitions(df)
    if src >= par:
        return 0
    size = _plan_size_bytes(df)
    target = 3 * par if size < 0 else min(
        3 * par, max(1, -(-size // _REPART_BYTES_PER_TASK)))
    return target if target > src else 0


def run_extract(df: DataFrame, num_partitions: int | None = None,
                auto_repartition: bool = True) -> DataFrame:
    """The physical extraction plan for non-skewed documents:
    hash-repartition by doc_id, then one Arrow-vectorized pass.

    ``num_partitions`` <= 0 is treated as unset (auto)."""
    if num_partitions is not None and num_partitions > 0:
        df = df.repartition(num_partitions, F.col("doc_id"))
    elif auto_repartition:
        # extraction is per-document and every document is ONE row, so no
        # co-location is required — shuffling the full corpus just to
        # rebalance is pure serialize/write/read waste (it was ~20% of job
        # time and, worse, a cost that does not scale with cores). Run the
        # kernel directly on the scan partitions (Iceberg/parquet splits
        # are already size-balanced by maxPartitionBytes); repartition only
        # when the source is too coarse to use the cluster, and size the
        # spread by BYTES, not a fixed 3x-parallelism fan: at small inputs
        # the fixed fan's per-task Python round-trips dominated the wall
        # (96 near-empty Arrow tasks for a 15 KB source measured ~1.3 s).
        # Unknown stats fall back to the 3x fan (Long.Max default ->
        # target caps at 3*par, the prior behavior).
        target = auto_partition_target(df)
        if target > 0:
            # pin the count: a bare repartition(col) is AQE-coalescible
            # by bytes, and span rows are bytes-small but
            # Python-compute-heavy
            df = df.repartition(target, F.col("doc_id"))
    # mapInArrow, not mapInPandas: the spans column is array<struct>, which
    # pandas conversion would materialize as a dict per span on BOTH
    # boundaries — the flatten/reassemble work on the Arrow buffers directly
    return df.mapInArrow(extract_iter_arrow, schema=OUTPUT_SCHEMA)
