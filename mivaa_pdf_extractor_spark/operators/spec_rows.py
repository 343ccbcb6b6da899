"""Tier-A packing-spec row parser over span geometry (HOF plans).

Re-expresses the deterministic tier of the reference's product spec
extractor (reference ``app/services/products/
product_spec_extractor_v2.py``): the PyMuPDF text-dict parser that
finds a product's packing-table row by span geometry and maps its
numeric values to canonical packing fields positionally.

Semantics pinned:

- ``_normalize`` (:64-71): accent strip + upper + collapse
  whitespace (realized as upper + an explicit accent translate table
  + whitespace collapse — identical on both engines; the reference's
  NFD pass agrees on the Latin-1 subset used here).
- ``_parse_number`` (:73-94): strip + drop spaces; both separators →
  the one further right is the decimal point; comma-only → European
  decimal; else plain float; unparseable → None.
- ``_find_product_row`` (:211-278): anchors are spans whose
  normalized text equals the name, or starts with ``name + ' '``
  with < 30 extra chars; fallback to substring containment; the
  anchor maximizing the count of numeric spans to its right within
  ``|cy| <= 6`` wins (Python ``max`` — FIRST max on ties, i.e.
  lowest span ordinal); < 3 numeric neighbors → no row; the row is
  every span within the y tolerance, sorted by x0 (stable).
- ``_split_merged_span`` (:163-180): ``^(\\d[\\d.,]*)\\s+(dim)$``
  splits a merged "2108.42 120X80X91" span; dim strings lose their
  inner spaces.
- ``_extract_values_positional`` (:281-414): tokens classify as
  name / bullet (glyph set or ``[-—–]+``) / dim / number / skipped;
  bullets BEFORE the first number map positionally to the 7
  technical-characteristics flags (matt, gloss, shade variation,
  shower wall, shower floor, floor, traffic); numbers+dims map to
  KNOWN_COLUMN_ORDERS[n] (exact count match, else the largest known
  order <= n, else NOTHING — including the bullets, which the
  reference drops when no order fits); a dim token in a non-dim slot
  assigns to pallet_dimensions_cm when that slot appears later
  (dict-overwrite last-wins — a later dim or even a NUMBER at the
  pallet slot overwrites it), else the dim string lands in the
  positional field.
- ``_tier_a_pymupdf`` (:417-485): per-field merge across the
  product's pages — the FIRST page (in page-list order) that
  produced a value wins.
- ``_flat_to_nested`` (:488-537): the output shape — 11 packaging
  fields (pieces_per_m2 / pieces_per_sqft / shade / traffic flags
  are parsed but NOT rendered), thickness_mm/inch, finish from the
  matt/gloss bullets (note: finish='gloss' is unreachable — the
  gloss bullet positionally implies the matt bullet; pinned), and
  recommended_use in shower_wall/shower_floor/floor order.

Values are emitted as STRINGS (the reference's dict holds the raw
parsed value — a float's repr for numbers, the space-stripped string
for dims; both engines print doubles shortest-round-trip).

Scale: spans aggregate ONCE into per-(doc, page) arrays — the only
content shuffle, keyed (doc_id, page) with map-side combine; the
targets join is co-keyed on doc_id; ALL row-finding / tokenizing /
mapping runs as codegen HOF expressions inside that one projection
(no UDF, no collect); the final per-product merge carries ~20 short
strings per page.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_WS = "[ \\t\\r\\n\\x0b\\f]"
_STRIP_RE = "^" + _WS + "+|" + _WS + "+$"
_ACC_FROM = "ÀÁÂÃÄÅÈÉÊËÌÍÎÏÒÓÔÕÖÙÚÛÜÑÇ"
_ACC_TO = "AAAAAAEEEEIIIIOOOOOUUUUNC"
_DIM_RE = "[0-9]+" + _WS + "*[xX]" + _WS + "*[0-9]+" + _WS + "*[xX]" + \
    _WS + "*[0-9]+"
_MERGED_RE = "^([0-9][0-9.,]*)" + _WS + "+(" + _DIM_RE + ")$"
_BULLETS = ["•", "●", "◆", "◼", "■", "▪", "✓", "✔", "x", "X"]
_DASH_RE = "^[-—–]+$"
Y_TOL = 6.0
MIN_NUMERIC_NEIGHBORS = 3

CANONICAL_PACKING_ORDER = [
    "pieces_per_m2", "pieces_per_sqft", "pieces_per_box", "m2_per_box",
    "sqft_per_box", "weight_per_box_kg", "weight_per_box_lb",
    "boxes_per_pallet", "m2_per_pallet", "sqft_per_pallet",
    "weight_per_pallet_kg", "weight_per_pallet_lb",
    "pallet_dimensions_cm", "thickness_mm", "thickness_inch",
]
KNOWN_COLUMN_ORDERS = {
    15: CANONICAL_PACKING_ORDER,
    14: CANONICAL_PACKING_ORDER[1:],
    13: CANONICAL_PACKING_ORDER[2:],
    12: ["pieces_per_m2", "pieces_per_box", "m2_per_box",
         "weight_per_box_kg", "boxes_per_pallet", "m2_per_pallet",
         "weight_per_pallet_kg", "pallet_dimensions_cm",
         "thickness_mm", "thickness_inch", "sqft_per_box",
         "sqft_per_pallet"],
    10: ["pieces_per_box", "m2_per_box", "weight_per_box_kg",
         "boxes_per_pallet", "m2_per_pallet", "weight_per_pallet_kg",
         "pallet_dimensions_cm", "thickness_mm", "thickness_inch",
         "sqft_per_box"],
    8: ["pieces_per_box", "m2_per_box", "weight_per_box_kg",
        "boxes_per_pallet", "m2_per_pallet", "weight_per_pallet_kg",
        "thickness_mm", "thickness_inch"],
}
BULLET_FLAGS = ["finish_matt", "finish_gloss", "shade_variation_flag",
                "recommended_use_shower_wall",
                "recommended_use_shower_floor",
                "recommended_use_floor", "traffic_flag"]
PACKAGING_FIELDS = [
    "pieces_per_box", "m2_per_box", "sqft_per_box",
    "weight_per_box_kg", "weight_per_box_lb", "boxes_per_pallet",
    "m2_per_pallet", "sqft_per_pallet", "weight_per_pallet_kg",
    "weight_per_pallet_lb", "pallet_dimensions_cm",
]
_ALL_FIELDS = CANONICAL_PACKING_ORDER  # every positional field


def _strip(c: Column) -> Column:
    return F.regexp_replace(c, _STRIP_RE, "")


def _norm(c: Column) -> Column:
    """upper + accent translate + whitespace collapse + strip."""
    up = F.translate(F.upper(c), _ACC_FROM, _ACC_TO)
    return _strip(F.regexp_replace(up, _WS + "+", " "))


def _parse_num(c: Column) -> Column:
    """_parse_number as a Column: returns double or NULL."""
    cl = F.regexp_replace(_strip(c), " ", "")
    lastdot = F.length(cl) - F.instr(F.reverse(cl), ".") + 1
    lastcom = F.length(cl) - F.instr(F.reverse(cl), ",") + 1
    has_d = cl.contains(".")
    has_c = cl.contains(",")
    us = F.regexp_replace(cl, ",", "")
    eu = F.regexp_replace(F.regexp_replace(cl, "\\.", ""), ",", ".")
    cleaned = (F.when(has_d & has_c,
                      F.when(lastdot > lastcom, us).otherwise(eu))
               .when(has_c & ~has_d, F.regexp_replace(cl, ",", "."))
               .otherwise(cl))
    return cleaned.try_cast("double")


def _split_tokens(t: Column) -> Column:
    """array of raw sub-tokens after merged-span splitting."""
    st = _strip(t)
    return F.when(
        st.rlike(_MERGED_RE),
        F.array(F.regexp_extract(st, _MERGED_RE, 1),
                F.regexp_replace(F.regexp_extract(st, _MERGED_RE, 2),
                                 " ", ""))
    ).otherwise(F.array(st))


def _classify(t: Column, nname: Column) -> Column:
    """struct(kind, str) for one stripped token."""
    ts = _strip(t)
    nt = _norm(ts)
    num = _parse_num(ts)
    is_bullet = (ts.isin(*_BULLETS) | ts.rlike(_DASH_RE))
    is_dim = ts.rlike("^" + _DIM_RE + "$")
    kind = (F.when(ts == "", "skip")
            .when((nt == nname)
                  | nt.startswith(F.concat(nname, F.lit(" "))), "name")
            .when(is_bullet, "bullet")
            .when(is_dim, "dim")
            .when(num.isNotNull(), "number")
            .otherwise("skip"))
    sval = (F.when(kind == "dim", F.regexp_replace(ts, " ", ""))
            .when(kind == "number", num.cast("string")))
    return F.struct(kind.alias("kind"), sval.alias("str"))


def parse_spec_rows(spans: DataFrame, targets: DataFrame) -> DataFrame:
    """spans: (doc_id, page, sid, x0, x1, cy, text); targets:
    (doc_id, product_idx, name, page, pg_ord).  Emits per
    (doc_id, product_idx) the nested-shape columns (all strings)."""
    # round 6: the span structs carry the normalized text and the
    # "first token parses as a number" flag, computed ONCE per span at
    # the page-array build — the anchor search evaluated _norm per span
    # per reference and numcount re-tokenized every span pair per
    # anchor (HOF lambdas re-evaluate derived expressions per
    # reference). Appended fields sit after the sort-deciding ones, so
    # the array_sort order is unchanged.
    arr = (spans.groupBy("doc_id", "page")
           .agg(F.array_sort(F.collect_list(F.struct(
               F.col("sid"), F.col("x0"), F.col("x1"), F.col("cy"),
               F.col("text"),
               _norm(F.col("text")).alias("ntext"),
               _parse_num(F.element_at(_split_tokens(F.col("text")), 1))
               .isNotNull().alias("fnum")))).alias("spans")))
    t = (targets
         .withColumn("nname", _norm(F.col("name")))
         .join(arr, ["doc_id", "page"], "left")
         .withColumn("spans", F.coalesce(
             "spans", F.array().cast(
                 "array<struct<sid:int,x0:double,x1:double,"
                 "cy:double,text:string,ntext:string,fnum:boolean>>"))))

    nname = F.col("nname")
    sp = F.col("spans")
    exact = F.filter(sp, lambda s: (
        (s["ntext"] == nname)
        | (s["ntext"].startswith(F.concat(nname, F.lit(" ")))
           & (F.length(s["ntext"]) - F.length(nname) < 30))))
    anchors = F.when(F.size(exact) > 0, exact).otherwise(
        F.filter(sp, lambda s: s["ntext"].contains(nname)))

    def numcount(a):
        return F.size(F.filter(
            sp, lambda s2: (s2["sid"] != a["sid"])
            & (F.abs(s2["cy"] - a["cy"]) <= Y_TOL)
            & (s2["x0"] > a["x1"])
            & s2["fnum"]))

    zero = F.struct(F.lit(-1).alias("cnt"),
                    F.lit(0.0).cast("double").alias("cy"))
    # score each anchor ONCE via transform, then fold — the old fold
    # called numcount twice per step (condition + struct)
    cand = F.transform(anchors, lambda a: F.struct(
        numcount(a).alias("cnt"), a["cy"].alias("cy")))
    best = F.aggregate(
        cand, zero,
        lambda acc, c: F.when(c["cnt"] > acc["cnt"], c).otherwise(acc))
    t = t.withColumn("best", best)
    # empty cleaned name -> no detection (the reference returns []
    # before anchor search; contains('') would otherwise match all)
    row_ok = ((F.col("best")["cnt"] >= MIN_NUMERIC_NEIGHBORS)
              & (nname != ""))

    row = F.array_sort(F.transform(
        F.filter(sp, lambda s:
                 F.abs(s["cy"] - F.col("best")["cy"]) <= Y_TOL),
        lambda s: F.struct(s["x0"].alias("x0"), s["sid"].alias("sid"),
                           s["text"].alias("text"))))
    toks = F.flatten(F.transform(row, lambda s: _split_tokens(s["text"])))
    karr = F.transform(toks, lambda tk: _classify(tk, nname))
    t = t.withColumn("karr", F.when(row_ok, karr))
    karr = F.col("karr")

    num_idx = F.filter(
        F.transform(karr, lambda x, i: F.when(x["kind"] == "number", i)),
        lambda v: v.isNotNull())
    first_num = F.coalesce(
        F.when(F.size(num_idx) > 0, num_idx[0]), F.size(karr))
    nb = F.size(F.filter(
        karr, lambda x, i: (x["kind"] == "bullet") & (i < first_num)))
    nd = F.filter(karr, lambda x: x["kind"].isin("number", "dim"))
    t = (t.withColumn("nb", F.when(row_ok, nb))
         .withColumn("nd", F.when(row_ok, nd)))
    nd, nb = F.col("nd"), F.col("nb")
    n = F.size(nd)

    def order_lit(o):
        return F.array(*[F.lit(f) for f in o])

    to = (F.when(n >= 15, order_lit(KNOWN_COLUMN_ORDERS[15]))
          .when(n == 14, order_lit(KNOWN_COLUMN_ORDERS[14]))
          .when(n == 13, order_lit(KNOWN_COLUMN_ORDERS[13]))
          .when(n == 12, order_lit(KNOWN_COLUMN_ORDERS[12]))
          .when((n == 11) | (n == 10), order_lit(KNOWN_COLUMN_ORDERS[10]))
          .when((n == 9) | (n == 8), order_lit(KNOWN_COLUMN_ORDERS[8])))
    t = t.withColumn("to", to)
    to = F.col("to")
    tolen = F.size(to)

    def pallet_in_rest(i0):
        # 'pallet_dimensions_cm' in target_order[i:]  (0-based i)
        return F.array_position(
            F.slice(to, i0 + 1, tolen), "pallet_dimensions_cm") > 0

    def field_val(f):
        if f == "pallet_dimensions_cm":
            # last-wins fold over every assignment the loop would make
            return F.when(
                to.isNotNull() & (n > 0),
                F.aggregate(
                    F.sequence(F.lit(0), F.least(n, tolen) - 1),
                    F.lit(None).cast("string"),
                    lambda acc, j: F.when(
                        ((F.element_at(nd, j + 1)["kind"] == "dim")
                         & (F.element_at(to, j + 1)
                            != "pallet_dimensions_cm")
                         & pallet_in_rest(j))
                        | (F.element_at(to, j + 1)
                           == "pallet_dimensions_cm"),
                        F.element_at(nd, j + 1)["str"]).otherwise(acc)))
        idx = (F.array_position(to, f) - 1).cast("int")  # 0-based; -1 absent
        # & is not short-circuit: clamp the probe index into [1, n] so
        # element_at never sees 0 / out-of-range when the guard is false
        tok = F.element_at(
            nd, F.greatest(F.least(idx, n - 1), F.lit(0)) + 1)
        return F.when(
            to.isNotNull() & (idx >= 0) & (idx < n)
            & ((tok["kind"] == "number")
               | ((tok["kind"] == "dim") & ~pallet_in_rest(idx))),
            tok["str"])

    page_cols = [field_val(f).alias(f) for f in _ALL_FIELDS]
    flag_cols = [
        (to.isNotNull() & (nb >= k + 1)).alias(fl)
        for k, fl in enumerate(BULLET_FLAGS)]
    per_page = t.select("doc_id", "product_idx", "pg_ord",
                        *page_cols, *flag_cols)

    def first_by_page(c):
        # first-non-null in page order (struct-min; NULLs excluded)
        return F.min(F.when(F.col(c).isNotNull(), F.struct(
            F.col("pg_ord").alias("o"), F.col(c).alias("v"))))["v"]

    merged = per_page.groupBy("doc_id", "product_idx").agg(
        *[first_by_page(f).alias(f) for f in _ALL_FIELDS],
        *[F.coalesce(
            F.min(F.when(F.col(fl), F.struct(
                F.col("pg_ord").alias("o"), F.col(fl).alias("v"))))["v"],
            F.lit(False)).alias(fl) for fl in BULLET_FLAGS])

    matt, gloss = F.col("finish_matt"), F.col("finish_gloss")
    finish = (F.when(matt & ~gloss, "matte")
              .when(gloss & ~matt, "gloss"))
    uses = F.array_join(F.array_compact(F.array(
        F.when(F.col("recommended_use_shower_wall"), "shower_wall"),
        F.when(F.col("recommended_use_shower_floor"), "shower_floor"),
        F.when(F.col("recommended_use_floor"), "floor"))), ",")
    return merged.select(
        "doc_id", "product_idx",
        *[F.col(f).alias(f) for f in PACKAGING_FIELDS],
        "thickness_mm", "thickness_inch",
        finish.alias("finish"),
        F.nullif(uses, F.lit("")).alias("recommended_use_csv"))


# ---------------------------------------------------------------------------
# DuckDB twin


def _sql_strip(x: str) -> str:
    return f"regexp_replace({x}, '^{_WS}+|{_WS}+$', '', 'g')"


def _sql_norm(x: str) -> str:
    up = f"translate(upper({x}), '{_ACC_FROM}', '{_ACC_TO}')"
    return _sql_strip(f"regexp_replace({up}, '{_WS}+', ' ', 'g')")


def _sql_parse(c: str) -> str:
    """_parse_number over an already-stripped expression ``c`` —
    fully inlined (correlated scalar subqueries do not bind inside
    every DuckDB clause this twin uses)."""
    x = f"replace({c}, ' ', '')"
    return f"""CASE
        WHEN contains({x}, '.') AND contains({x}, ',') THEN
            CASE WHEN strpos(reverse({x}), '.')
                      < strpos(reverse({x}), ',')
                 THEN TRY_CAST(replace({x}, ',', '') AS DOUBLE)
                 ELSE TRY_CAST(replace(replace({x}, '.', ''), ',', '.')
                               AS DOUBLE) END
        WHEN contains({x}, ',') THEN
            TRY_CAST(replace({x}, ',', '.') AS DOUBLE)
        ELSE TRY_CAST({x} AS DOUBLE) END"""


def _sql_order_lit(o) -> str:
    return "[" + ", ".join(f"'{f}'" for f in o) + "]"


def spec_rows_sql() -> str:
    """DuckDB twin over CTEs ``spans_in`` (doc_id, page, sid, x0, x1,
    cy, text) and ``targets_in`` (doc_id, product_idx, name, page,
    pg_ord)."""
    merged = ("^([0-9][0-9.,]*)" + _WS + "+([0-9]+" + _WS + "*[xX]"
              + _WS + "*[0-9]+" + _WS + "*[xX]" + _WS + "*[0-9]+)$")
    dim_full = ("[0-9]+" + _WS + "*[xX]" + _WS + "*[0-9]+" + _WS
                + "*[xX]" + _WS + "*[0-9]+")
    bullets = ", ".join(f"'{b}'" for b in _BULLETS)
    splitlist = (f"CASE WHEN regexp_full_match(st, '{merged}') THEN "
                 f"[regexp_extract(st, '{merged}', 1), "
                 f"replace(regexp_extract(st, '{merged}', 2), ' ', '')] "
                 f"ELSE [st] END")
    o = KNOWN_COLUMN_ORDERS
    tord = (f"CASE WHEN n >= 15 THEN {_sql_order_lit(o[15])} "
            f"WHEN n = 14 THEN {_sql_order_lit(o[14])} "
            f"WHEN n = 13 THEN {_sql_order_lit(o[13])} "
            f"WHEN n = 12 THEN {_sql_order_lit(o[12])} "
            f"WHEN n IN (10, 11) THEN {_sql_order_lit(o[10])} "
            f"WHEN n IN (8, 9) THEN {_sql_order_lit(o[8])} END")

    def fval(f):
        if f == "pallet_dimensions_cm":
            return f"pv[len(pv)] AS {f}"
        return f"""CASE WHEN list_position(tord, '{f}') IS NOT NULL
            AND list_position(tord, '{f}') <= n
            AND (nd[list_position(tord, '{f}')].kind = 'number'
                 OR (nd[list_position(tord, '{f}')].kind = 'dim'
                     AND coalesce(list_position(
                         tord[list_position(tord, '{f}'):],
                         'pallet_dimensions_cm'), 0) = 0))
            THEN nd[list_position(tord, '{f}')].s END AS {f}"""

    fvals = ",\n            ".join(fval(f) for f in _ALL_FIELDS)
    flags = ",\n            ".join(
        f"(tord IS NOT NULL AND nb >= {k + 1}) AS {fl}"
        for k, fl in enumerate(BULLET_FLAGS))
    fmerge = ",\n           ".join(
        f"(min(struct_pack(o := pg_ord, v := {f})) "
        f"FILTER (WHERE {f} IS NOT NULL)).v AS {f}"
        for f in _ALL_FIELDS)
    flmerge = ",\n           ".join(
        f"coalesce((min(struct_pack(o := pg_ord, v := {fl})) "
        f"FILTER (WHERE {fl})).v, false) AS {fl}"
        for fl in BULLET_FLAGS)
    pkg_out = ", ".join(PACKAGING_FIELDS)
    return f"""
    tg AS (SELECT *, {_sql_norm('name')} AS nname FROM targets_in),
    acand AS (SELECT doc_id, product_idx, page, pg_ord, nname, sid,
                     x1, cy,
                     nt = nname OR (starts_with(nt, nname || ' ')
                                    AND length(nt) - length(nname) < 30)
                         AS ex,
                     contains(nt, nname) AS ct
              FROM (SELECT t.doc_id, t.product_idx, t.page, t.pg_ord,
                           t.nname, s.sid, s.x1, s.cy,
                           {_sql_norm('s.text')} AS nt
                    FROM tg t JOIN spans_in s
                         ON s.doc_id = t.doc_id AND s.page = t.page
                    WHERE t.nname <> '')),
    anch AS (SELECT * FROM (
                 SELECT *, bool_or(ex) OVER (
                     PARTITION BY doc_id, product_idx, page) AS hx
                 FROM acand WHERE ex OR ct)
             WHERE ex OR NOT hx),
    ncnt AS (SELECT a.doc_id, a.product_idx, a.page, a.pg_ord, a.sid,
                    a.cy,
                    count(*) FILTER (WHERE s.sid <> a.sid
                        AND abs(s.cy - a.cy) <= 6.0 AND s.x0 > a.x1
                        AND {_sql_parse('s.ft')} IS NOT NULL) AS cnt
             FROM anch a JOIN (
                 SELECT doc_id, page, sid, x0, cy,
                        CASE WHEN regexp_full_match(st, '{merged}')
                             THEN regexp_extract(st, '{merged}', 1)
                             ELSE st END AS ft
                 FROM (SELECT *, {_sql_strip('text')} AS st
                       FROM spans_in)) s
                 ON s.doc_id = a.doc_id AND s.page = a.page
             GROUP BY 1, 2, 3, 4, 5, 6),
    best AS (SELECT doc_id, product_idx, page, pg_ord,
                    max(struct_pack(cnt := cnt, nsid := -sid,
                                    cy := cy)) AS b
             FROM ncnt GROUP BY 1, 2, 3, 4),
    rowtok AS (SELECT b.doc_id, b.product_idx, b.page, b.pg_ord,
                      t.nname, s.x0, s.sid, u.si, tl[u.si] AS tok
               FROM best b
               JOIN tg t ON t.doc_id = b.doc_id
                    AND t.product_idx = b.product_idx
                    AND t.page = b.page,
               LATERAL (SELECT x0, sid, {splitlist} AS tl
                        FROM (SELECT *, {_sql_strip('text')} AS st
                              FROM spans_in si0
                              WHERE si0.doc_id = b.doc_id
                                AND si0.page = b.page
                                AND abs(si0.cy - (b.b).cy) <= 6.0)) s,
               unnest(generate_series(1, len(s.tl))) u(si)
               WHERE (b.b).cnt >= 3),
    ktok0 AS (SELECT *, {_sql_strip('tok')} AS ts FROM rowtok),
    ktok1 AS (SELECT *, {_sql_norm('ts')} AS nt,
                     {_sql_parse('ts')} AS num FROM ktok0),
    ktok2 AS (SELECT *, CASE
                  WHEN ts = '' THEN 'skip'
                  WHEN nt = nname OR starts_with(nt, nname || ' ')
                      THEN 'name'
                  WHEN ts IN ({bullets})
                       OR regexp_full_match(ts, '[-—–]+')
                      THEN 'bullet'
                  WHEN regexp_full_match(ts, '{dim_full}') THEN 'dim'
                  WHEN num IS NOT NULL THEN 'number'
                  ELSE 'skip' END AS kind
              FROM ktok1),
    ktok AS (SELECT *, CASE WHEN kind = 'dim'
                            THEN replace(ts, ' ', '')
                            WHEN kind = 'number'
                            THEN CAST(num AS VARCHAR) END AS s
             FROM ktok2),
    karr0 AS (SELECT doc_id, product_idx, page, pg_ord,
                     list(struct_pack(kind := kind, s := s)
                          ORDER BY x0, sid, si) AS karr
              FROM ktok GROUP BY 1, 2, 3, 4),
    k1 AS (SELECT *, coalesce(list_filter(list_transform(karr,
                  (x, i) -> CASE WHEN x.kind = 'number' THEN i END),
                  v -> v IS NOT NULL)[1], len(karr) + 1) AS fn
           FROM karr0),
    k2 AS (SELECT *, len(list_filter(karr,
                  (x, i) -> x.kind = 'bullet' AND i < fn)) AS nb,
                  list_filter(karr,
                      x -> x.kind IN ('number', 'dim')) AS nd
           FROM k1),
    k3 AS (SELECT *, len(nd) AS n FROM k2),
    k4 AS (SELECT *, {tord} AS tord FROM k3),
    k4b AS (SELECT *, list_filter(
                list_transform(generate_series(1, least(n, len(tord))),
                    j -> CASE WHEN (nd[j].kind = 'dim'
                                    AND tord[j] <> 'pallet_dimensions_cm'
                                    AND coalesce(list_position(
                                        tord[j:],
                                        'pallet_dimensions_cm'), 0) > 0)
                               OR tord[j] = 'pallet_dimensions_cm'
                              THEN nd[j].s END),
                v -> v IS NOT NULL) AS pv FROM k4),
    k5 AS (SELECT doc_id, product_idx, pg_ord,
            {fvals},
            {flags}
           FROM k4b),
    pp AS (SELECT t.doc_id, t.product_idx, t.pg_ord, k5.* EXCLUDE
               (doc_id, product_idx, pg_ord)
           FROM tg t LEFT JOIN k5 USING (doc_id, product_idx, pg_ord)),
    mg AS (SELECT doc_id, product_idx,
           {fmerge},
           {flmerge}
           FROM pp GROUP BY 1, 2)
    SELECT doc_id, product_idx, {pkg_out},
           thickness_mm, thickness_inch,
           CASE WHEN finish_matt AND NOT finish_gloss THEN 'matte'
                WHEN finish_gloss AND NOT finish_matt THEN 'gloss'
           END AS finish,
           nullif(concat_ws(',',
               CASE WHEN recommended_use_shower_wall
                    THEN 'shower_wall' END,
               CASE WHEN recommended_use_shower_floor
                    THEN 'shower_floor' END,
               CASE WHEN recommended_use_floor THEN 'floor' END), '')
               AS recommended_use_csv
    FROM mg"""


# ---------------------------------------------------------------------------
# synthesized input (one layout table feeds both engines)

# per regime r = d % 6: {slot: (page, x0, x1, cy, text)}; 'NM' in a
# text is replaced by the doc's product name VAL<d%9>, 'NL' by the
# lowercase accented variant vàl<d%9> (pins upper + accent strip).
_P1_TOKENS = {
    0: ["•", "✓", "15", "0,72", "11.2", "48", "34,56", "537.6",
        "8,5", "0.33", "■", "BOX"],
    1: ["16", "1,08", "12.4", "40", "43.2", "496", "120X80X91",
        "9", "0.35", "2,15"],
    2: ["●", "6", "25", "1.44", "1.234,56", "2108.42 120X80X91",
        "10,5", "121X81X92", "10", "0,39", "2.33", "99,84"],
    3: ["14", "0.65", "10.8", "50", "32.5", "540", "9", "0.35", "77"],
    4: ["20", "1.2", "12.92", "118X78X90", "26,5", "44", "52.8",
        "568.3", "1225", "2700,5", "990", "10.2", "0.4"],
}
_ANCHOR_LABEL = {0: "NM", 1: "NM", 2: "NM", 3: "NM WHITE",
                 4: "SERIE NM GRES"}
_HERO = {3: "NL", 4: "Catalogo NM"}  # default 'nm'
_P2_NUMBERS = ["99", "9.99", "99.9", "9", "9.9", "999", "12", "0,5"]
_P2_BULLET_REGIMES = (0, 1, 3)
_CY1 = [700.0, 702.0, 698.5]
_CY2 = [300.0, 302.0, 298.5]


def _layout(r: int) -> dict:
    out = {0: (1, 10.0, 60.0, 50.0, _HERO.get(r, "nm")),
           1: (1, 100.0, 140.0, 50.0, "Catalogo Tecnico")}
    if r == 5:
        out[2] = (1, 150.0, 180.0, 50.0, "12")
        out[3] = (1, 190.0, 220.0, 50.0, "7,5")
        return out
    out[4] = (1, 10.0, 90.0, 700.0, _ANCHOR_LABEL[r])
    for i, tk in enumerate(_P1_TOKENS[r]):
        out[5 + i] = (1, 100.0 + 40 * i, 130.0 + 40 * i,
                      _CY1[i % 3], tk)
    out[18] = (2, 10.0, 90.0, 300.0, "NM")
    if r in _P2_BULLET_REGIMES:
        for b, g in enumerate(["•", "✓", "■", "▪"]):
            out[19 + b] = (2, 100.0 + 40 * b, 130.0 + 40 * b, 300.0, g)
    for i, tk in enumerate(_P2_NUMBERS):
        out[23 + i] = (2, 300.0 + 40 * i, 330.0 + 40 * i,
                       _CY2[i % 3], tk)
    return out


N_SYNTH_DOCS = 30
MAX_SLOT = 33


def synth_spec_spans(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = (events.select((e % N_SYNTH_DOCS).alias("d"),
                          F.expr(f"event_id div {N_SYNTH_DOCS}")
                          .cast("int").alias("slot"))
            .where(F.col("slot") < MAX_SLOT))
    d = F.col("d")
    # broadcast-join the (reg, slot) -> span lookup instead of a
    # ~200-branch when-chain: the chain's codegen dominated every
    # action (~8 s best-of-2 for 660 rows)
    spark = events.sparkSession
    rows = [(reg, sl, pg, a, b, c, tx)
            for reg in range(6)
            for sl, (pg, a, b, c, tx) in _layout(reg).items()]
    layout = F.broadcast(spark.createDataFrame(
        rows, "reg int, slot int, page int, x0 double, y1 double, "
              "cy double, tpl string").withColumnRenamed("y1", "x1"))
    j = base.join(layout, ((base["d"] % 6).cast("int")
                           == layout["reg"])
                  & (base["slot"] == layout["slot"]))
    nm = F.concat(F.lit("VAL"), (d % 9).cast("string"))
    nl = F.concat(F.lit("vàl"), (d % 9).cast("string"))
    text = F.replace(F.replace(F.col("tpl"), F.lit("NL"), nl),
                     F.lit("NM"), nm)
    return (j.select(d.alias("doc_id"), F.col("page"),
                     base["slot"].alias("sid"), "x0", "x1", "cy",
                     text.alias("text"))
            .where(text.isNotNull()))


def synth_spec_targets(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = (events.select((e % N_SYNTH_DOCS).alias("d"),
                          F.expr(f"(event_id div {N_SYNTH_DOCS}) % 2")
                          .cast("int").alias("pg_ord"))
            .distinct())
    d = F.col("d")
    return base.select(
        d.alias("doc_id"), d.alias("product_idx"),
        F.concat(F.lit("Val"), (d % 9).cast("string")).alias("name"),
        (F.col("pg_ord") + 1).alias("page"), F.col("pg_ord"))


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def synth_spec_spans_sql() -> str:
    branches = []
    for reg in range(6):
        for sl, (pg, a, b, c, tx) in _layout(reg).items():
            branches.append(
                f"WHEN d % 6 = {reg} AND slot = {sl} THEN "
                f"struct_pack(page := {pg}, x0 := {a}, x1 := {b}, "
                f"cy := {c}, t := {_sql_quote(tx)})")
    case = "CASE " + " ".join(branches) + " END"
    return f"""
SELECT d AS doc_id, CAST(v.page AS INT) AS page,
       CAST(slot AS INT) AS sid,
       CAST(v.x0 AS DOUBLE) AS x0, CAST(v.x1 AS DOUBLE) AS x1,
       CAST(v.cy AS DOUBLE) AS cy,
       replace(replace(v.t, 'NL', 'vàl' || (d % 9)),
               'NM', 'VAL' || (d % 9)) AS text
FROM (SELECT event_id % {N_SYNTH_DOCS} AS d,
             event_id // {N_SYNTH_DOCS} AS slot,
             {case} AS v
      FROM events
      WHERE event_id // {N_SYNTH_DOCS} < {MAX_SLOT})
WHERE v IS NOT NULL"""


SYNTH_SPEC_TARGETS_SQL = f"""
SELECT d AS doc_id, d AS product_idx, 'Val' || (d % 9) AS name,
       CAST(pg_ord + 1 AS INT) AS page, CAST(pg_ord AS INT) AS pg_ord
FROM (SELECT DISTINCT event_id % {N_SYNTH_DOCS} AS d,
             (event_id // {N_SYNTH_DOCS}) % 2 AS pg_ord
      FROM events)"""
