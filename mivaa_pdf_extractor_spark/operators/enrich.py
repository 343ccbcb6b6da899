"""Product enrichment — chunk-text field mining as a map-only plan.

Re-expresses the reference's ``_extract_fields_from_chunk_text``
(app/api/pdf_processing/stage_4_products.py:1701-1930) — the pure regex
extractor that mines factory / designer / SKU / grout / dimension /
collection / inspiration candidates out of combined chunk text —
natively:

- modal picks (factory_name, designers, collection) reproduce
  ``Counter.most_common(1)`` exactly: counts desc, ties broken by FIRST
  insertion (Python's Counter is insertion-ordered and sorted() is
  stable). Implemented shuffle-free with an encode-and-min HOF: each
  candidate at 1-based position i encodes ``lpad(9999-count)·lpad(i)·
  value``; ``array_min`` picks highest count, then earliest position.
  Duplicates of the winner encode larger strings, so no first-occurrence
  prefilter is needed.
- ``sku_codes`` is a name→code dict in the reference: entry order is
  the FIRST occurrence of each name, the value is the LAST code seen
  for it (plain dict assignment; the ``name not in sku_codes.values()``
  guard compares names to CODES and is a no-op — faithfully ignored).
- grout entries zip onto SKU codes by order only when the counts match
  (:1797-1806); imperial dimensions zip onto metric dims by order; the
  ``Q<number>(`` format label attaches to dims[0] only.
- per-pattern regex flags are faithful: factory pattern 1 carries
  re.IGNORECASE (so its ``[A-Z]`` matches lowercase), patterns 2-4 are
  case-sensitive; both collection patterns are IGNORECASE with the
  ``isupper()`` filter doing the real work; the inspiration loop only
  breaks on a GATED success, so a matched-but-too-long pattern 1 still
  falls through to pattern 2.

Everything is regexp_extract_all + higher-order array folds inside one
whole-stage-codegen projection — no UDF, no join, no shuffle. At 10^12
documents this tier costs exactly one pass over the text column.

The DuckDB twin SQL is GENERATED from the same pattern constants
(``mine_sql``), so the two engines cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# pattern constants — pinned behavior-table data from
# stage_4_products.py:1715-1724 (factory), :1744-1748 (designer),
# :1762-1764 (sku), :1777-1780 (grout), :1802+ (scalars) etc.
_NAME2 = r"([A-Z][A-Za-z][A-Za-z0-9&'\-]*(?:\s+[A-Z][A-Za-z0-9&'\-]+)?)"
FACTORY_PATTERNS = (
    ("(?i)", r"collaboration\s+(?:from|with|by)\s+" + _NAME2),
    ("", r"\bproduced\s+by\s+" + _NAME2),
    ("", r"\bmade\s+by\s+" + _NAME2),
    ("", r"Signature\s+collaboration\s+from\s+([A-Z][A-Za-z0-9&'\-]+)"),
)
FACTORY_STOPWORDS = ("the", "a", "an", "this", "that", "our", "new",
                     "stacy", "york", "barcelona", "valencia", "milan",
                     "paris")
DESIGNER_PATTERNS = (
    ("", r"([A-Z][a-z]+\s+[A-Z][a-z]+),?\s+(?:a|an)\s+[^,.]*?"
         r"(?:designer|architect|creative)"),
    ("", r"designed\s+by\s+([A-Z][a-z]+\s+[A-Z][a-z]+)"),
    ("", r"by\s+([A-Z][a-z]+\s+[A-Z][a-z]+),?\s+a\s+[^,.]*?"
         r"(?:designer|architect)"),
)
SKU_PATTERN = (r"\b(\d{5,6})\s+([A-Z][A-Z0-9]+(?:\s+[A-Z0-9]+){0,4})"
               r"\s+(?:LT|[A-Z]{2,3})\s*/")
GROUT_PATTERN = r"(?i)(\d{1,4})\s+(Mapei|Kerakoll|Isomat|Technica|Litokol)\b"
GROUT_PRODUCT_PATTERN = (r"(?i)(MAPEI|KERAKOLL|ISOMAT|TECHNICA|LITOKOL)"
                         r"\s*\|\s*([A-Z][A-Z0-9\s]{2,30})")
BODY_TYPE_PATTERN = (r"(?i)\b(white body tile|full body(?:\s+ceramics?)?|"
                     r"porcelain stoneware|red body|"
                     r"color(?:ed)?\s+body)\b")
DIM_PATTERN = (r"(\d{1,3}(?:[,.]\d{1,2})?)\s*[xX×]\s*"
               r"(\d{1,3}(?:[,.]\d{1,2})?)\s*cm")
IMPERIAL_PATTERN = (r"(\d{1,3}(?:[.,]\d{1,3})?)\s*[xX×]\s*"
                    r"(\d{1,3}(?:[.,]\d{1,3})?)\s*[\"”]")
QLABEL_PATTERN = r"(?i)\b(Q\d{1,3})\s*\("
COLLECTION_PATTERNS = (
    ("(?i)", r"\b([A-Z][A-Z0-9]+)\s+by\s+[A-Z]"),
    ("(?i)", r"(?:the\s+new\s+|the\s+)?([A-Z][A-Z0-9]+)\s+collection\b"),
)
INSPIRATION_PATTERNS = (
    r"(?i)draws?\s+inspiration\s+from\s+(?:the\s+)?"
    r"([a-zA-Z][\w\s\-]{3,60})",
    r"(?i)inspired\s+by\s+(?:the\s+)?([a-zA-Z][\w\s\-]{3,60})",
)
PIECES_PATTERN = r"(?i)\b(\d{1,3})\s+pieces?\b"
PATTERNS_PATTERN = r"(?i)\b(\d{1,3})\s+patterns?\b"


def _modal(arr: Column) -> Column:
    """Counter.most_common(1) over an ordered candidate array: count
    desc, first-insertion tie-break. Map-only encode-and-min.

    The argument is let-bound (single-element transform lambda) before
    the count sweep: a HOF argument expression is re-evaluated on EVERY
    reference (Spark has no per-row subexpression cache inside lambda
    bodies), and the sweep below references its array O(n) times per
    row — callers routinely pass derived arrays (transform/filter
    chains), which would otherwise be re-materialized per element."""
    def _body(a: Column) -> Column:
        enc = F.transform(
            F.sequence(F.lit(1), F.size(a)),
            lambda i: F.concat(
                F.lpad((F.lit(9999) - F.size(
                    F.filter(a, lambda x: x == F.element_at(a, i))))
                    .cast("string"), 4, "0"),
                F.lpad(i.cast("string"), 4, "0"),
                F.element_at(a, i)))
        return F.when(F.size(a) > 0,
                      F.substring(F.array_min(enc), 9, 1 << 20))
    return F.element_at(F.transform(F.array(arr), _body), 1)


def _extract_all(text: Column, flags: str, pat: str, group: int) -> Column:
    return F.regexp_extract_all(text, F.lit(flags + pat), group)


def _cap1(s: Column) -> Column:
    # Python str.capitalize(): first char upper, REST LOWER
    return F.concat(F.upper(F.substring(s, 1, 1)),
                    F.lower(F.substring(s, 2, 1 << 20)))


def _first_wins_map(keys: Column, vals: Column, sep: str) -> Column:
    """Dict semantics as an array of 'key<sep>val' strings: entry order
    = first occurrence of each key, value = LAST value seen for it."""
    idx = F.sequence(F.lit(1), F.size(keys))
    entries = F.transform(idx, lambda i: F.when(
        F.array_position(keys, F.element_at(keys, i)) == i,
        F.concat(
            F.element_at(keys, i), F.lit(sep),
            F.element_at(vals, F.array_max(
                F.filter(idx, lambda j:
                         F.element_at(keys, j) == F.element_at(keys, i))
            )))))
    return F.when(F.size(keys) > 0, F.array_compact(entries)) \
        .otherwise(F.array().cast("array<string>"))


def mine_fields(docs: DataFrame) -> DataFrame:
    """One map-only projection emitting every mined field per doc."""
    t = F.col("text")

    # factory: 4 patterns in order, stopword + [2,30] length gates, modal
    fact_all = F.concat(*[
        _extract_all(t, fl, p, 1) for fl, p in FACTORY_PATTERNS])
    stop = F.array(*[F.lit(s) for s in FACTORY_STOPWORDS])
    fact = F.filter(fact_all, lambda x:
                    ~F.array_contains(stop, F.lower(x))
                    & (F.length(x) >= 2) & (F.length(x) <= 30))

    des_all = F.concat(*[
        _extract_all(t, fl, p, 1) for fl, p in DESIGNER_PATTERNS])
    des = F.filter(des_all,
                   lambda x: (F.length(x) >= 5) & (F.length(x) <= 40))

    # sku name→code dict (first-occurrence order, last code wins)
    sku_codes = _extract_all(t, "", SKU_PATTERN, 1)
    sku_names = _extract_all(t, "", SKU_PATTERN, 2)
    sku_entries = _first_wins_map(sku_names, sku_codes, "=")
    # codes in dict-entry order (for the grout zip)
    idx = F.sequence(F.lit(1), F.size(sku_names))
    codes_in_order = F.when(F.size(sku_names) > 0, F.array_compact(
        F.transform(idx, lambda i: F.when(
            F.array_position(sku_names, F.element_at(sku_names, i)) == i,
            F.element_at(sku_codes, F.array_max(
                F.filter(idx, lambda j: F.element_at(sku_names, j)
                         == F.element_at(sku_names, i)))))))) \
        .otherwise(F.array().cast("array<string>"))

    g_dose = _extract_all(t, "", GROUT_PATTERN, 1)
    g_sup = _extract_all(t, "", GROUT_PATTERN, 2)
    grout_suppliers = F.coalesce(
        F.array_sort(F.array_distinct(F.transform(g_sup, F.upper))),
        F.array().cast("array<string>"))
    grout_entries = F.zip_with(
        g_sup, g_dose,
        lambda s, d: F.concat(_cap1(s), F.lit(":"),
                              d.cast("int").cast("string")))
    grout_cc = F.when(
        (F.size(grout_entries) > 0) & (F.size(codes_in_order) > 0)
        & (F.size(codes_in_order) == F.size(grout_entries)),
        F.zip_with(codes_in_order, grout_entries,
                   lambda c, e: F.concat(c, F.lit(":"), e))) \
        .otherwise(F.array().cast("array<string>"))

    pieces = F.regexp_extract(t, PIECES_PATTERN, 1).try_cast("int")
    pieces_n = F.when((pieces >= 1) & (pieces <= 500), pieces)
    pats = F.regexp_extract(t, PATTERNS_PATTERN, 1).try_cast("int")
    pats_n = F.when((pats >= 1) & (pats <= 100), pats)

    body = F.regexp_extract(t, BODY_TYPE_PATTERN, 1)
    body_type = F.when(body != "", F.lower(body))

    # metric dims: range-gate, first-occurrence dedup on the FLOAT pair
    w_raw = F.transform(_extract_all(t, "", DIM_PATTERN, 1),
                        lambda x: F.replace(x, F.lit(","), F.lit(".")))
    h_raw = F.transform(_extract_all(t, "", DIM_PATTERN, 2),
                        lambda x: F.replace(x, F.lit(","), F.lit(".")))
    didx = F.sequence(F.lit(1), F.size(w_raw))
    in_range = lambda i: (  # noqa: E731
        (F.element_at(w_raw, i).cast("double") >= 0.5)
        & (F.element_at(w_raw, i).cast("double") <= 300.0)
        & (F.element_at(h_raw, i).cast("double") >= 0.5)
        & (F.element_at(h_raw, i).cast("double") <= 300.0))
    first_occ = lambda i: F.size(F.filter(didx, lambda j: (  # noqa: E731
        (j < i)
        & (F.element_at(w_raw, j).cast("double")
           == F.element_at(w_raw, i).cast("double"))
        & (F.element_at(h_raw, j).cast("double")
           == F.element_at(h_raw, i).cast("double"))
        & (F.element_at(w_raw, j).cast("double") >= 0.5)
        & (F.element_at(w_raw, j).cast("double") <= 300.0)
        & (F.element_at(h_raw, j).cast("double") >= 0.5)
        & (F.element_at(h_raw, j).cast("double") <= 300.0)))) == 0
    metric = F.when(F.size(w_raw) > 0, F.array_compact(F.transform(
        didx, lambda i: F.when(
            in_range(i) & first_occ(i),
            F.concat(F.element_at(w_raw, i), F.lit("x"),
                     F.element_at(h_raw, i)))))) \
        .otherwise(F.array().cast("array<string>"))

    iw = F.transform(_extract_all(t, "", IMPERIAL_PATTERN, 1),
                     lambda x: F.replace(x, F.lit(","), F.lit(".")))
    ih = F.transform(_extract_all(t, "", IMPERIAL_PATTERN, 2),
                     lambda x: F.replace(x, F.lit(","), F.lit(".")))
    imperials = F.zip_with(iw, ih,
                           lambda a, b: F.concat(a, F.lit("x"), b))
    qlabel = F.upper(F.regexp_extract(t, QLABEL_PATTERN, 1))
    dims = F.when(F.size(metric) > 0, F.transform(
        F.sequence(F.lit(1), F.size(metric)),
        lambda i: F.concat(
            F.element_at(metric, i), F.lit("|"),
            F.coalesce(F.get(imperials, i - 1), F.lit("")), F.lit("|"),
            F.when((i == 1) & (qlabel != ""), qlabel)
             .otherwise(F.lit(""))))) \
        .otherwise(F.array().cast("array<string>"))

    # grout products: per-supplier key, cleaned value, [3,40] gate,
    # dict first-occurrence-of-key order with last value winning
    gp_sup = _extract_all(t, "", GROUT_PRODUCT_PATTERN, 1)
    gp_prod = _extract_all(t, "", GROUT_PRODUCT_PATTERN, 2)
    gp_clean = F.transform(gp_prod, lambda p: F.trim(F.element_at(
        F.split(F.trim(F.regexp_replace(p, r"\s+", " ")),
                r"\*+|\|", 2), 1)))
    gp_ok = F.zip_with(
        gp_sup, gp_clean,
        lambda s, p: F.when((F.length(p) >= 3) & (F.length(p) <= 40),
                            F.concat(F.lit("grout_"), F.lower(s),
                                     F.lit("_product\x01"), p)))
    gp_flat = F.array_compact(gp_ok)
    gp_keys = F.transform(gp_flat,
                          lambda e: F.substring_index(e, "\x01", 1))
    gp_vals = F.transform(gp_flat,
                          lambda e: F.substring_index(e, "\x01", -1))
    grout_products = _first_wins_map(gp_keys, gp_vals, "=")

    coll_all = F.concat(*[
        _extract_all(t, fl, p, 1) for fl, p in COLLECTION_PATTERNS])
    coll = F.filter(coll_all, lambda x:
                    (F.length(x) >= 3) & (F.length(x) <= 20)
                    & (F.upper(x) == x) & (F.lower(x) != x))
    from mivaa_pdf_extractor_spark.operators.metadata_norm import \
        py_title_col
    coll_modal = _modal(coll)

    def _inspiration(pat: str) -> Column:
        raw = F.regexp_extract(t, pat, 1)
        cut = F.trim(F.element_at(F.split(raw, r"[,.;]", 2), 1))
        return F.when((raw != "") & (F.length(cut) >= 3)
                      & (F.length(cut) <= 80), cut)

    inspiration = F.coalesce(*[_inspiration(p)
                               for p in INSPIRATION_PATTERNS])

    return docs.select(
        "doc_id",
        _modal(fact).alias("factory_name"),
        _modal(des).alias("designer"),
        sku_entries.alias("sku_entries"),
        grout_suppliers.alias("grout_suppliers"),
        grout_cc.alias("grout_color_codes"),
        pieces_n.alias("pieces_per_box"),
        pats_n.alias("patterns_count"),
        body_type.alias("body_type"),
        dims.alias("dimensions"),
        grout_products.alias("grout_products"),
        F.when(coll_modal.isNotNull(),
               py_title_col(coll_modal)).alias("collection"),
        inspiration.alias("inspiration"))


# ---------------------------------------------------------------------------
# deterministic catalog-text synthesizer (Spark + DuckDB twins)
# ---------------------------------------------------------------------------

_T0 = ("VALENOVA by SG NY is the new Signature collaboration from "
       "Harmony. Stacy Garcia, a New York-based designer, draws "
       "inspiration from the city that never sleeps. "
       "{SKU0} VALENOVA WHITE LT/11,8X11,8 100 Mapei "
       "39657 VALENOVA GREY LT/11,8X11,8 43 Kerakoll "
       "Q59 (11,8x11,8 cm - 4.65x4.65”) white body tile "
       "12 pieces 8 patterns MAPEI | ULTRACOLOR PLUS 111* "
       "KERAKOLL | FUGABELLA 50 the new VALENOVA collection")
_T1 = ("Crafted in collaboration with Atlas Concorde. produced by "
       "Florim ceramics made by Florim. 150 ISOMAT 9 pieces "
       "250 patterns full body ceramics inspired by nature, reimagined "
       "24x48 cm 24x48 cm 7x7 cm")
_T2 = ("designed by Elena Rossi. 999999 MOODBOARD SET GL/ 1 pieces "
       "satin finish Q7 ( tiles")


def synth_catalog_docs(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    sku0 = F.concat(F.lit("3965"), (d % 10).cast("string"))
    t0 = F.concat(F.lit(_T0.split("{SKU0}")[0]), sku0,
                  F.lit(_T0.split("{SKU0}")[1]))
    text = (F.when(d % 5 == 0, t0)
            .when(d % 5 == 1, F.lit(_T1))
            .when(d % 5 == 2, F.lit(_T2))
            .when(d % 5 == 3, F.substring(F.col("text"), 1, 160))
            .otherwise(F.when(d % 10 == 4, F.lit(None).cast("string"))
                       .otherwise(F.lit(""))))
    return docs.select("doc_id", text.alias("text"))


def _sq(s: str) -> str:
    return s.replace("'", "''")


SYNTH_CATALOG_SQL = f"""
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0 THEN
                    '{_sq(_T0.split('{SKU0}')[0])}' || '3965'
                    || CAST(doc_id % 10 AS VARCHAR)
                    || '{_sq(_T0.split('{SKU0}')[1])}'
                WHEN doc_id % 5 = 1 THEN '{_sq(_T1)}'
                WHEN doc_id % 5 = 2 THEN '{_sq(_T2)}'
                WHEN doc_id % 5 = 3 THEN substring(text, 1, 160)
                WHEN doc_id % 10 = 4 THEN NULL
                ELSE '' END AS text
    FROM documents"""


def mine_sql() -> str:
    """DuckDB twin of mine_fields over a CTE `docs(doc_id, text)` —
    generated from the same pattern constants."""
    def rall(flags, pat, group):
        return (f"regexp_extract_all(text, '{_sq(flags + pat)}', {group})")

    def modal(arr):
        return f"""CASE WHEN len({arr}) > 0 THEN
            substring(list_aggregate(list_transform(
                range(1, len({arr}) + 1), i ->
                lpad(CAST(9999 - len(list_filter({arr},
                     x -> x = {arr}[i])) AS VARCHAR), 4, '0')
                || lpad(CAST(i AS VARCHAR), 4, '0')
                || {arr}[i]), 'min'), 9) END"""

    def first_wins(keys, vals, sep):
        return f"""CASE WHEN len({keys}) > 0 THEN
            list_filter(list_transform(range(1, len({keys}) + 1), i ->
                CASE WHEN list_position({keys}, {keys}[i]) = i THEN
                    {keys}[i] || '{sep}' || {vals}[
                        list_aggregate(list_filter(
                            range(1, len({keys}) + 1),
                            j -> {keys}[j] = {keys}[i]), 'max')]
                END), e -> e IS NOT NULL)
            ELSE [] END"""

    fact_parts = " || ".join(
        rall(fl, p, 1) for fl, p in FACTORY_PATTERNS)
    stop_list = ", ".join(f"'{s}'" for s in FACTORY_STOPWORDS)
    fact = (f"list_filter({fact_parts}, x -> NOT list_contains("
            f"[{stop_list}], lower(x)) AND length(x) >= 2 "
            f"AND length(x) <= 30)")
    des_parts = " || ".join(
        rall(fl, p, 1) for fl, p in DESIGNER_PATTERNS)
    des = (f"list_filter({des_parts}, x -> length(x) >= 5 "
           f"AND length(x) <= 40)")

    sku_codes = rall("", SKU_PATTERN, 1)
    sku_names = rall("", SKU_PATTERN, 2)

    g_dose = rall("", GROUT_PATTERN, 1)
    g_sup = rall("", GROUT_PATTERN, 2)
    grout_entries = (
        f"list_transform(range(1, len({g_sup}) + 1), k -> "
        f"upper(substring({g_sup}[k], 1, 1)) "
        f"|| lower(substring({g_sup}[k], 2)) || ':' "
        f"|| CAST(CAST({g_dose}[k] AS INTEGER) AS VARCHAR))")
    grout_suppliers = (f"list_sort(list_distinct(list_transform("
                       f"{g_sup}, x -> upper(x))))")

    w_raw = (f"list_transform({rall('', DIM_PATTERN, 1)}, "
             f"x -> replace(x, ',', '.'))")
    h_raw = (f"list_transform({rall('', DIM_PATTERN, 2)}, "
             f"x -> replace(x, ',', '.'))")
    rng = (lambda a, i: f"(CAST({a}[{i}] AS DOUBLE) >= 0.5 "
           f"AND CAST({a}[{i}] AS DOUBLE) <= 300.0)")
    metric = f"""CASE WHEN len({w_raw}) > 0 THEN
        list_filter(list_transform(range(1, len({w_raw}) + 1), i ->
            CASE WHEN {rng('{W}', 'i')} AND {rng('{H}', 'i')}
                 AND len(list_filter(range(1, len({w_raw}) + 1), j ->
                     j < i
                     AND CAST({{W}}[j] AS DOUBLE)
                         = CAST({{W}}[i] AS DOUBLE)
                     AND CAST({{H}}[j] AS DOUBLE)
                         = CAST({{H}}[i] AS DOUBLE)
                     AND {rng('{W}', 'j')} AND {rng('{H}', 'j')})) = 0
            THEN {{W}}[i] || 'x' || {{H}}[i] END),
            e -> e IS NOT NULL)
        ELSE [] END"""
    metric = metric.replace("{W}", w_raw).replace("{H}", h_raw)

    iw = (f"list_transform({rall('', IMPERIAL_PATTERN, 1)}, "
          f"x -> replace(x, ',', '.'))")
    ih = (f"list_transform({rall('', IMPERIAL_PATTERN, 2)}, "
          f"x -> replace(x, ',', '.'))")
    imperials = (f"list_transform(range(1, len({iw}) + 1), k -> "
                 f"{iw}[k] || 'x' || {ih}[k])")
    qlabel = f"upper(regexp_extract(text, '{_sq(QLABEL_PATTERN)}', 1))"

    gp_sup = rall("", GROUT_PRODUCT_PATTERN, 1)
    gp_prod = rall("", GROUT_PRODUCT_PATTERN, 2)
    gp_clean = (f"list_transform({gp_prod}, p -> trim("
                f"string_split_regex(trim(regexp_replace(p, '\\s+', ' ',"
                f" 'g')), '\\*+|\\|')[1]))")
    gp_flat = f"""list_filter(
        list_transform(range(1, len({gp_sup}) + 1), k ->
            CASE WHEN length({gp_clean}[k]) >= 3
                      AND length({gp_clean}[k]) <= 40
            THEN 'grout_' || lower({gp_sup}[k]) || '_product' || chr(1)
                 || {gp_clean}[k] END),
        e -> e IS NOT NULL)"""

    coll_parts = " || ".join(
        rall(fl, p, 1) for fl, p in COLLECTION_PATTERNS)
    coll = (f"list_filter({coll_parts}, x -> length(x) >= 3 "
            f"AND length(x) <= 20 AND upper(x) = x "
            f"AND lower(x) <> x)")

    def insp(pat):
        raw = f"regexp_extract(text, '{_sq(pat)}', 1)"
        cut = f"trim(string_split_regex({raw}, '[,.;]')[1])"
        return (f"CASE WHEN {raw} <> '' AND length({cut}) >= 3 "
                f"AND length({cut}) <= 80 THEN {cut} END")

    # py_title over the modal collection (single [A-Z0-9]+ token):
    # uppercase stays, digits break words — for an all-caps token the
    # char-wise title() is: first letter upper, subsequent letters lower
    # unless preceded by a non-letter. Expressed as a per-char fold.
    coll_title = """CASE WHEN {M} IS NOT NULL THEN
        list_aggregate(list_transform(range(1, length({M}) + 1), i ->
            CASE WHEN i = 1 OR NOT regexp_matches(
                     substring({M}, i - 1, 1), '[A-Za-z]')
                 THEN upper(substring({M}, i, 1))
                 ELSE lower(substring({M}, i, 1)) END),
            'string_agg', '') END"""

    return f"""
    SELECT doc_id,
           {modal(fact)} AS factory_name,
           {modal(des)} AS designer,
           {first_wins(sku_names, sku_codes, '=')} AS sku_entries,
           coalesce({grout_suppliers}, []) AS grout_suppliers,
           coalesce(CASE WHEN len({grout_entries}) > 0
                     AND len({first_wins(sku_names, sku_codes, '=')}) > 0
                     AND len(list_filter(list_transform(
                         range(1, len({sku_names}) + 1), i ->
                         CASE WHEN list_position({sku_names},
                             {sku_names}[i]) = i THEN 1 END),
                         e -> e IS NOT NULL))
                         = len({grout_entries})
           THEN list_transform(range(1, len({grout_entries}) + 1), k ->
               list_filter(list_transform(
                   range(1, len({sku_names}) + 1), i ->
                   CASE WHEN list_position({sku_names},
                       {sku_names}[i]) = i THEN {sku_codes}[
                       list_aggregate(list_filter(
                           range(1, len({sku_names}) + 1),
                           j -> {sku_names}[j] = {sku_names}[i]),
                           'max')] END),
                   e -> e IS NOT NULL)[k]
               || ':' || {grout_entries}[k])
           END, []) AS grout_color_codes,
           CASE WHEN regexp_extract(text, '{_sq(PIECES_PATTERN)}', 1)
                     <> ''
                 AND CAST(regexp_extract(text, '{_sq(PIECES_PATTERN)}',
                     1) AS INTEGER) BETWEEN 1 AND 500
           THEN CAST(regexp_extract(text, '{_sq(PIECES_PATTERN)}', 1)
                AS INTEGER) END AS pieces_per_box,
           CASE WHEN regexp_extract(text, '{_sq(PATTERNS_PATTERN)}', 1)
                     <> ''
                 AND CAST(regexp_extract(text,
                     '{_sq(PATTERNS_PATTERN)}', 1) AS INTEGER)
                     BETWEEN 1 AND 100
           THEN CAST(regexp_extract(text, '{_sq(PATTERNS_PATTERN)}', 1)
                AS INTEGER) END AS patterns_count,
           CASE WHEN regexp_extract(text, '{_sq(BODY_TYPE_PATTERN)}', 1)
                     <> ''
           THEN lower(regexp_extract(text, '{_sq(BODY_TYPE_PATTERN)}',
                1)) END AS body_type,
           CASE WHEN len({metric}) > 0 THEN
               list_transform(range(1, len({metric}) + 1), i ->
                   {metric}[i] || '|'
                   || coalesce({imperials}[i], '') || '|'
                   || CASE WHEN i = 1 AND {qlabel} <> ''
                           THEN {qlabel} ELSE '' END)
           ELSE [] END AS dimensions,
           {first_wins(
               f"list_transform({gp_flat}, e -> string_split(e, chr(1))[1])",
               f"list_transform({gp_flat}, e -> string_split(e, chr(1))[2])",
               '=')} AS grout_products,
           {coll_title.replace('{M}', '(' + modal(coll) + ')')}
               AS collection,
           coalesce({insp(INSPIRATION_PATTERNS[0])},
                    {insp(INSPIRATION_PATTERNS[1])}) AS inspiration
    FROM docs"""
