"""Discovery text tier — page-marker parsing + section-based page detection.

Re-expresses the two text-side halves of the reference's product
discovery service (reference ``app/services/discovery/
product_discovery_service.py``): the one-pass page-marker parser that
turns the extracted markdown into a ``{page_num: content}`` map, and
the "smart section" detector that assigns each product a contiguous
page range from headline positions.

Semantics pinned:

- ``_parse_pdf_text_into_pages`` (:2403-2459) with marker pattern
  ``-{3,}\\s*#?\\s*Page\\s*(\\d+)\\s*-*`` (?i) (:2401): empty text ->
  no pages; no markers -> whole text (UNstripped) as page 1; text
  before the first marker, stripped, becomes page 1 when non-empty;
  each marker's content runs to the next marker, stripped, kept when
  non-empty and page_num <= total_pages; duplicate page numbers keep
  the LAST occurrence (dict overwrite — a ``--- Page 1 ---`` marker
  overwrites the pre-marker page-1 text); ``lowercase=True`` lowers
  content for the section-detection search pass.
- ``_detect_product_pages_optimized`` (:2461-2639): toc_cutoff =
  max(3, int(total_pages*0.15)); headline pattern
  ``(?:^|\\n)\\s*NAME\\s*(?:\\n|$|by\\s|collection|designed)``
  (?im) over pages AFTER the cutoff; "other" products are those with
  a different cleaned name of length >= 2; a product with no headline
  falls back to the first post-cutoff page where its word-boundary
  pattern hits and at most 2 other products' word patterns hit;
  section start = first headline (or fallback) page, end = the page
  before the nearest LATER headline of any other product, else
  min(start+10, total_pages), clamped to >= start; validation walks
  the present pages of the range in order and stops at the first page
  carrying another product's headline; an empty validated list falls
  back to the first 6 pages of the raw range (absent pages included).

Scale: the marker parse is a map-only sentinel split (one regex pass
per doc) plus one (doc_id, page_num)-keyed partial aggregation for
last-wins dedup.  Section detection does ONE pages x product-names
join per doc (bounded by names-per-doc, all regex work in that single
projection); everything downstream — first-headline, word-count,
next-boundary, validation — carries only (doc_id, name/page) ints and
is keyed by doc_id, so the joins co-partition and nothing collects.
Patterns are built per NAME (not per row), so the regex cache churns
at name granularity.

Cross-engine notes: ``\\s`` differs between Java regex and RE2 (RE2
omits ``\\x0b``), so every whitespace class is pinned to the explicit
ASCII set ``[ \\t\\r\\n\\x0b\\f]``; Python ``str.strip`` likewise
strips that set (trim() would only strip spaces).  int(total*0.15)
truncates; both engines compute floor over the same IEEE double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# explicit ASCII whitespace (Java \s and RE2 \s disagree on \x0b)
WS = "[ \\t\\r\\n\\x0b\\f]"
MARKER_RE = "(?i)-{3,}" + WS + "*#?" + WS + "*Page" + WS + "*(\\d+)" + WS + "*-*"
_STRIP_RE = "^" + WS + "+|" + WS + "+$"
# regex metacharacters escaped when a product name is folded into a
# pattern (reference uses re.escape; names are matched literally)
_SPECIALS = "([.^$|?*+()\\[\\]{}\\\\])"
_H_PRE = "(?im)(?:^|\\n)" + WS + "*"
_H_POST = WS + "*(?:\\n|$|by" + WS + "|collection|designed)"

_SQL_WS = "[ \\t\\r\\n\\x0b\\f]"  # literal backslashes reach RE2 intact


def _strip(c: Column) -> Column:
    return F.regexp_replace(c, _STRIP_RE, "")


# ---------------------------------------------------------------------------
# 1. page-marker parse


def parse_page_markers(docs: DataFrame, lowercase: bool = True) -> DataFrame:
    """Expects doc_id, text, total_pages.  Emits (doc_id, page_num,
    content) — the reference's pages_content dict as rows.

    Implementation: one regexp_replace rewrites every marker to a
    ``\\x00<num>\\x01`` sentinel, one split on ``\\x00`` yields the
    pre-text plus one part per marker, and posexplode recovers marker
    order for the last-wins overwrite (realized as a map-side-
    combinable max over (pos, content) structs, not a window).  Text
    content must not contain \\x00/\\x01 (true for extracted text).
    """
    replaced = F.regexp_replace(
        F.coalesce(F.col("text"), F.lit("")), MARKER_RE, "\x00$1\x01")
    parts = F.split(replaced, "\x00")
    ex = docs.select(
        "doc_id", "total_pages",
        (F.size(parts) > 1).alias("has_markers"),
        F.posexplode(parts).alias("pos", "part"))
    num = F.split_part(F.col("part"), F.lit("\x01"), F.lit(1))
    body = F.col("part").substr(
        F.instr(F.col("part"), "\x01") + 1, F.length("part"))
    page = (F.when(F.col("pos") == 0, F.lit(1))
            .otherwise(num.try_cast("int")))
    content = (F.when(F.col("pos") == 0,
                      F.when(F.col("has_markers"), _strip(F.col("part")))
                      .otherwise(F.col("part")))  # no markers: unstripped
               .otherwise(_strip(body)))
    rows = (ex.select("doc_id", "pos", page.alias("page_num"),
                      content.alias("content"), "total_pages")
            .where((F.col("content") != "")
                   & (F.col("page_num") <= F.col("total_pages"))))
    last = (rows.groupBy("doc_id", "page_num")
            .agg(F.max(F.struct("pos", "content")).alias("s")))
    out = F.col("s.content")
    return last.select(
        "doc_id", "page_num",
        (F.lower(out) if lowercase else out).alias("content"))


def page_markers_sql(lowercase: bool = True) -> str:
    """DuckDB twin over a CTE ``docs`` (doc_id, text, total_pages)."""
    marker = ("(?i)-{3,}" + _SQL_WS + "*#?" + _SQL_WS + "*Page"
              + _SQL_WS + "*(\\d+)" + _SQL_WS + "*-*")
    strip = ("regexp_replace({}, '^" + _SQL_WS + "+|" + _SQL_WS
             + "+$', '', 'g')")
    lc = "lower(arg_max(content, pos))" if lowercase \
        else "arg_max(content, pos)"
    return f"""
    rep AS (SELECT doc_id, total_pages,
                   regexp_replace(coalesce(text, ''), '{marker}',
                                  chr(0) || '\\1' || chr(1), 'g') AS r
            FROM docs),
    parts AS (SELECT doc_id, total_pages, string_split(r, chr(0)) AS ps
              FROM rep),
    ex AS (SELECT doc_id, total_pages, len(ps) > 1 AS hm,
                  i - 1 AS pos, ps[i] AS part
           FROM parts, unnest(generate_series(1, len(ps))) u(i)),
    rows_ AS (SELECT doc_id, pos, total_pages,
                     CASE WHEN pos = 0 THEN 1
                          ELSE TRY_CAST(split_part(part, chr(1), 1) AS INT)
                     END AS page_num,
                     CASE WHEN pos = 0 THEN
                              CASE WHEN hm
                                   THEN {strip.format('part')}
                                   ELSE part END
                          ELSE {strip.format(
                              "substr(part, strpos(part, chr(1)) + 1)")}
                     END AS content
              FROM ex)
    SELECT doc_id, page_num, {lc} AS content
    FROM rows_
    WHERE content <> '' AND page_num <= total_pages
    GROUP BY doc_id, page_num"""


# ---------------------------------------------------------------------------
# 2. section-based product page detection


def detect_sections(pages: DataFrame, products: DataFrame) -> DataFrame:
    """Expects pages (doc_id, page_num, content — LOWERCASED, i.e. the
    parse_page_markers(lowercase=True) output) and products (doc_id,
    product_idx, name, total_pages).  Emits (doc_id, product_idx,
    section_start, pages_csv, n_pages); products whose detection finds
    nothing (no headline and no clean fallback mention, or an
    empty/NULL name, or no pages) emit '' / 0.
    """
    esc = F.regexp_replace(F.lower(F.trim("name")), _SPECIALS, "\\\\$1")
    prod = products.select(
        "doc_id", "product_idx", "total_pages",
        F.lower(F.trim("name")).alias("clean"),
        F.greatest(F.lit(3), F.floor(F.col("total_pages") * 0.15))
         .cast("int").alias("cutoff"),
        F.concat(F.lit(_H_PRE), esc, F.lit(_H_POST)).alias("hpat"),
        F.concat(F.lit("(?i)\\b"), esc, F.lit("\\b")).alias("wpat"))
    named = (prod.where(F.col("clean") != "")
             .withColumn("len_ok", F.length("clean") >= 2))

    # one regex pass: pages x distinct names per doc
    uniq = named.select("doc_id", "clean", "len_ok", "cutoff",
                        "total_pages", "hpat", "wpat").distinct()
    # round 6: persist the regex pass — hl/wcnt/cand (and hl again via
    # nxt/pflags) all fan out from `hits`, and without the persist the
    # pages × names join with its two PER-ROW-PATTERN regexes (the
    # single most expensive subtree here; dynamic patterns defeat the
    # regex instance cache) re-ran for every consumer. Rows are sorted
    # by name within partitions first so equal patterns are adjacent
    # and the expression's last-used compiled-pattern cache hits.
    from mivaa_pdf_extractor_spark.core.cache import track
    hits = (pages.join(uniq, "doc_id")
            .where((F.col("page_num") > F.col("cutoff"))
                   & (F.col("page_num") <= F.col("total_pages")))
            .sortWithinPartitions("clean")
            .select("doc_id", "clean", "len_ok", "page_num",
                    # contains() prefilter: content and clean are both
                    # lowercased, and both patterns embed the escaped
                    # literal name, so a regex match implies the plain
                    # substring is present — the (cheap, codegen'd)
                    # substring search short-circuits the per-row
                    # pattern compile+match for the misses, which are
                    # the overwhelming majority of (page, name) pairs
                    F.when(F.col("content").contains(F.col("clean")),
                           F.regexp_like(F.col("content"),
                                         F.col("hpat")))
                     .otherwise(F.lit(False)).alias("headline"),
                    F.when(F.col("content").contains(F.col("clean")),
                           F.regexp_like(F.col("content"),
                                         F.col("wpat")))
                     .otherwise(F.lit(False)).alias("word")))
    hits = track(hits.persist())
    hl = hits.where("headline").select("doc_id", "clean", "len_ok",
                                       "page_num")
    firsts = hl.groupBy("doc_id", "clean").agg(
        F.min("page_num").alias("first_hl"))
    wcnt = (hits.where(F.col("word") & F.col("len_ok"))
            .groupBy("doc_id", "page_num")
            .agg(F.countDistinct("clean").alias("nw")))
    # fallback: first clean mention (<= 2 other products on the page)
    cand = (hits.where("word")
            .join(firsts, ["doc_id", "clean"], "left_anti")
            .join(wcnt, ["doc_id", "page_num"], "left")
            .where(F.coalesce("nw", F.lit(0))
                   - F.when(F.col("len_ok"), 1).otherwise(0) <= 2)
            .groupBy("doc_id", "clean").agg(F.min("page_num").alias("fb")))

    starts = (named.join(firsts, ["doc_id", "clean"], "left")
              .join(cand, ["doc_id", "clean"], "left")
              .withColumn("strt", F.coalesce("first_hl", "fb")))
    anch = starts.where(F.col("strt").isNotNull())
    nxt = (anch.select("doc_id", "product_idx", "clean", "strt")
           .join(hl.where("len_ok")
                 .select("doc_id", F.col("clean").alias("oclean"),
                         "page_num"), "doc_id")
           .where((F.col("oclean") != F.col("clean"))
                  & (F.col("page_num") > F.col("strt")))
           .groupBy("doc_id", "product_idx")
           .agg(F.min("page_num").alias("nxt_pg")))
    endp = F.greatest(
        F.when(F.col("nxt_pg").isNotNull(), F.col("nxt_pg") - 1)
         .otherwise(F.least(F.col("strt") + 10, F.col("total_pages"))),
        F.col("strt"))
    ends = (anch.join(nxt, ["doc_id", "product_idx"], "left")
            .select("doc_id", "product_idx", "clean", "strt",
                    endp.alias("endp")))

    # validation: walk present pages, break at a foreign headline
    pflags = (hl.where("len_ok").groupBy("doc_id", "page_num")
              .agg(F.collect_set("clean").alias("hl_names")))
    inrange = (ends.join(pages.select("doc_id", "page_num"), "doc_id")
               .where(F.col("page_num").between(F.col("strt"),
                                                F.col("endp")))
               .join(pflags, ["doc_id", "page_num"], "left")
               .withColumn("other_hl", F.size(F.array_remove(
                   F.coalesce("hl_names",
                              F.array().cast("array<string>")),
                   F.col("clean"))) > 0))
    agg = (inrange.groupBy("doc_id", "product_idx")
           .agg(F.min(F.when(F.col("other_hl"), F.col("page_num")))
                .alias("first_bad"),
                F.sort_array(F.collect_list("page_num")).alias("present")))
    valid = F.filter(
        F.coalesce("present", F.array().cast("array<int>")),
        lambda p: p < F.coalesce(F.col("first_bad"),
                                 F.col("endp") + 1))
    final = F.when(F.size(valid) > 0, valid).otherwise(
        F.sequence(F.col("strt"),
                   F.least(F.col("strt") + 5, F.col("endp"))
                   .cast("int")))
    res = (ends.join(agg, ["doc_id", "product_idx"], "left")
           .select("doc_id", "product_idx",
                   F.col("strt").cast("int").alias("section_start"),
                   F.array_join(F.transform(
                       final, lambda x: x.cast("string")), ",")
                    .alias("pages_csv"),
                   F.size(final).alias("n_pages")))
    miss = F.lit(None).cast("int")
    empties = (starts.where(F.col("strt").isNull())
               .select("doc_id", "product_idx")
               .unionByName(prod.where(F.col("clean").isNull()
                                       | (F.col("clean") == ""))
                            .select("doc_id", "product_idx"))
               .select("doc_id", "product_idx",
                       miss.alias("section_start"),
                       F.lit("").alias("pages_csv"),
                       F.lit(0).alias("n_pages")))
    return res.unionByName(empties)


def sections_sql() -> str:
    """DuckDB twin over CTEs ``pages_in`` (doc_id, page_num, content)
    and ``products_in`` (doc_id, product_idx, name, total_pages)."""
    esc = ("regexp_replace(lower(trim(name)), "
           "'([.^$|?*+()\\[\\]{}\\\\])', '\\\\\\1', 'g')")
    return f"""
    prod AS (SELECT doc_id, product_idx, total_pages,
                    lower(trim(name)) AS clean,
                    greatest(3, CAST(floor(total_pages * 0.15) AS INT))
                        AS cutoff,
                    '(?im)(?:^|\\n){_SQL_WS}*' || {esc}
                        || '{_SQL_WS}*(?:\\n|$|by{_SQL_WS}'
                        || '|collection|designed)' AS hpat,
                    '(?i)\\b' || {esc} || '\\b' AS wpat
             FROM products_in),
    named AS (SELECT *, length(clean) >= 2 AS len_ok
              FROM prod WHERE clean IS NOT NULL AND clean <> ''),
    uniq AS (SELECT DISTINCT doc_id, clean, len_ok, cutoff,
                    total_pages, hpat, wpat FROM named),
    hits AS (SELECT u.doc_id, u.clean, u.len_ok, p.page_num,
                    regexp_matches(p.content, u.hpat) AS headline,
                    regexp_matches(p.content, u.wpat) AS word
             FROM pages_in p JOIN uniq u ON p.doc_id = u.doc_id
             WHERE p.page_num > u.cutoff
               AND p.page_num <= u.total_pages),
    hl AS (SELECT doc_id, clean, len_ok, page_num FROM hits
           WHERE headline),
    firsts AS (SELECT doc_id, clean, min(page_num) AS first_hl
               FROM hl GROUP BY 1, 2),
    wcnt AS (SELECT doc_id, page_num, count(DISTINCT clean) AS nw
             FROM hits WHERE word AND len_ok GROUP BY 1, 2),
    cand AS (SELECT h.doc_id, h.clean, min(h.page_num) AS fb
             FROM hits h LEFT JOIN wcnt w USING (doc_id, page_num)
             WHERE h.word
               AND NOT EXISTS (SELECT 1 FROM firsts f
                               WHERE f.doc_id = h.doc_id
                                 AND f.clean = h.clean)
               AND coalesce(w.nw, 0)
                   - CASE WHEN h.len_ok THEN 1 ELSE 0 END <= 2
             GROUP BY 1, 2),
    starts AS (SELECT n.doc_id, n.product_idx, n.clean, n.total_pages,
                      coalesce(f.first_hl, c.fb) AS strt
               FROM named n
               LEFT JOIN firsts f USING (doc_id, clean)
               LEFT JOIN cand c USING (doc_id, clean)),
    anch AS (SELECT * FROM starts WHERE strt IS NOT NULL),
    nxt AS (SELECT a.doc_id, a.product_idx, min(h.page_num) AS nxt_pg
            FROM anch a JOIN hl h ON h.doc_id = a.doc_id AND h.len_ok
                 AND h.clean <> a.clean AND h.page_num > a.strt
            GROUP BY 1, 2),
    ends AS (SELECT a.doc_id, a.product_idx, a.clean, a.strt,
                    greatest(CASE WHEN n.nxt_pg IS NOT NULL
                                  THEN n.nxt_pg - 1
                                  ELSE least(a.strt + 10, a.total_pages)
                             END, a.strt) AS endp
             FROM anch a LEFT JOIN nxt n USING (doc_id, product_idx)),
    pflags AS (SELECT doc_id, page_num, list(DISTINCT clean) AS hl_names
               FROM hl WHERE len_ok GROUP BY 1, 2),
    inrange AS (SELECT e.doc_id, e.product_idx, p.page_num,
                       len(list_filter(coalesce(f.hl_names, []),
                           x -> x <> e.clean)) > 0 AS other_hl
                FROM ends e
                JOIN pages_in p ON p.doc_id = e.doc_id
                     AND p.page_num BETWEEN e.strt AND e.endp
                LEFT JOIN pflags f ON f.doc_id = p.doc_id
                     AND f.page_num = p.page_num),
    agg AS (SELECT doc_id, product_idx,
                   min(CASE WHEN other_hl THEN page_num END)
                       AS first_bad,
                   list_sort(list(page_num)) AS present
            FROM inrange GROUP BY 1, 2),
    fin AS (SELECT e.doc_id, e.product_idx, e.strt, e.endp,
                   list_filter(coalesce(a.present, []),
                       p -> p < coalesce(a.first_bad, e.endp + 1))
                       AS valid
            FROM ends e LEFT JOIN agg a USING (doc_id, product_idx))
    SELECT doc_id, product_idx, CAST(strt AS INT) AS section_start,
           coalesce(array_to_string(list_transform(
               CASE WHEN len(valid) > 0 THEN valid
                    ELSE generate_series(strt, least(strt + 5, endp))
               END, x -> CAST(x AS VARCHAR)), ','), '') AS pages_csv,
           CAST(len(CASE WHEN len(valid) > 0 THEN valid
                    ELSE generate_series(strt, least(strt + 5, endp))
               END) AS INT) AS n_pages
    FROM fin
    UNION ALL
    SELECT doc_id, product_idx, NULL, '', 0
    FROM starts WHERE strt IS NULL
    UNION ALL
    SELECT doc_id, product_idx, NULL, '', 0
    FROM prod WHERE clean IS NULL OR clean = ''"""


# ---------------------------------------------------------------------------
# synthesized inputs (shared shape with the SQL twins)


def synth_marker_docs(events: DataFrame) -> DataFrame:
    d = F.col("d")
    ds = d.cast("string")

    def c(*parts):
        return F.concat(*[F.lit(p) if isinstance(p, str) else p
                          for p in parts])

    text = (
        F.when(d % 6 == 0, c("intro ", ds, "\n--- Page 2 ---\nalpha ", ds,
                             "\n--- page 3 ---\n   \n---# Page 4 ----\n",
                             "beta\n--- Page 25 ---\nzz"))
        .when(d % 6 == 1, c("plain text ", ds))
        .when(d % 6 == 2, F.lit(""))
        .when(d % 6 == 3, c("--- Page 1 ---\nfirst ", ds,
                            "\n--- Page 1 ---\nsecond ", ds))
        .when(d % 6 == 4, c("head ", ds,
                            "\n--- Page 1 ---\nOver\n--- Page 5 ---\ntail"))
        .otherwise(c("  \n--- Page 2 ---\n  spaced ", ds,
                     "  \n----- PAGE 3 -----\nCase Text")))
    return (events.select((F.col("event_id") % 120).alias("d")).distinct()
            .select(d.alias("doc_id"), text.alias("text"),
                    F.lit(20).cast("int").alias("total_pages")))


SYNTH_MARKER_SQL = """
SELECT d AS doc_id,
       CASE WHEN d % 6 = 0 THEN
                'intro ' || d || chr(10) || '--- Page 2 ---' || chr(10)
                || 'alpha ' || d || chr(10) || '--- page 3 ---'
                || chr(10) || '   ' || chr(10) || '---# Page 4 ----'
                || chr(10) || 'beta' || chr(10) || '--- Page 25 ---'
                || chr(10) || 'zz'
            WHEN d % 6 = 1 THEN 'plain text ' || d
            WHEN d % 6 = 2 THEN ''
            WHEN d % 6 = 3 THEN
                '--- Page 1 ---' || chr(10) || 'first ' || d || chr(10)
                || '--- Page 1 ---' || chr(10) || 'second ' || d
            WHEN d % 6 = 4 THEN
                'head ' || d || chr(10) || '--- Page 1 ---' || chr(10)
                || 'Over' || chr(10) || '--- Page 5 ---' || chr(10)
                || 'tail'
            ELSE '  ' || chr(10) || '--- Page 2 ---' || chr(10)
                || '  spaced ' || d || '  ' || chr(10)
                || '----- PAGE 3 -----' || chr(10) || 'Case Text'
       END AS text,
       CAST(20 AS INT) AS total_pages
FROM (SELECT DISTINCT event_id % 120 AS d FROM events)"""


def synth_section_pages(events: DataFrame) -> DataFrame:
    """Deterministic page corpus for section detection: 40 docs, 4
    products each, five per-doc regimes (r = d %% 5): 0 = all four
    headlined; 1 = product 3 found via the clean-mention fallback;
    2 = product 3's only mention is crowded (> 2 others) -> empty;
    3 = products 2 and 3 share a headline page -> validation breaks on
    page one of the range -> detected[:6] fallback; 4 = product 3's
    headline sits on page 2 (inside the TOC cutoff, skipped) and its
    mention page carries exactly 2 others (boundary accept).  Pages
    where (d*7+p) %% 11 == 0 are absent (gap / `continue` path)."""
    e = F.col("event_id")
    d = (e % 40).alias("d")
    dd, p = F.col("d"), F.col("p")
    base = events.select(d, F.expr("event_id div 40 + 1").cast("int")
                         .alias("p"))
    total = (F.lit(20) + (dd % 3) * 10).cast("int")
    cut = F.when(dd % 3 == 0, 3).when(dd % 3 == 1, 4).otherwise(6)
    r = dd % 5

    def name(k):
        return F.concat(F.lit("item"), (dd % 7).cast("string"),
                        F.lit("x"), F.lit(str(k)))

    n0, n1, n2, n3 = name(0), name(1), name(2), name(3)
    ps = p.cast("string")
    content = (
        F.when((r == 4) & (p == 2),
               F.concat(n3, F.lit("\nby someone early")))
        .when(p <= cut,
              F.concat(F.lit("index "), n0, F.lit(" "), n1, F.lit(" "),
                       n2, F.lit(" "), n3, F.lit(" contents")))
        .when(p == cut + 2,
              F.concat(n0, F.lit("\nby studio alfa\nglaze notes")))
        .when(p == cut + 7, F.concat(n1, F.lit("\ncollection overview")))
        .when((p == cut + 12) & (r == 3),
              F.concat(n2, F.lit("\n"), n3, F.lit("\ndesigned in milano")))
        .when(p == cut + 12, F.concat(n2, F.lit("\ndesigned in milano")))
        .when((p == cut + 17) & (r == 0),
              F.concat(n3, F.lit("\nby atelier beta")))
        .when((p == cut + 18) & (r == 1),
              F.concat(F.lit("see "), n3, F.lit(" glaze details")))
        .when((p == cut + 18) & (r == 2),
              F.concat(F.lit("see "), n3, F.lit(" with "), n0,
                       F.lit(" and "), n1, F.lit(" plus "), n2))
        .when((p == cut + 18) & (r == 4),
              F.concat(F.lit("see "), n3, F.lit(" beside "), n0,
                       F.lit(" and "), n1))
        .otherwise(F.concat(F.lit("filler page "), ps,
                            F.lit(" of doc "), dd.cast("string"))))
    return (base.where((p <= total) & ((dd * 7 + p) % 11 != 0))
            .select(dd.alias("doc_id"), p.alias("page_num"),
                    content.alias("content")))


def _sect_pages_sql_content() -> str:
    n = ["'item' || (d % 7) || 'x" + str(k) + "'" for k in range(4)]
    return f"""
        CASE WHEN d % 5 = 4 AND p = 2
                 THEN {n[3]} || chr(10) || 'by someone early'
             WHEN p <= cut THEN 'index ' || {n[0]} || ' ' || {n[1]}
                 || ' ' || {n[2]} || ' ' || {n[3]} || ' contents'
             WHEN p = cut + 2 THEN {n[0]} || chr(10)
                 || 'by studio alfa' || chr(10) || 'glaze notes'
             WHEN p = cut + 7 THEN {n[1]} || chr(10)
                 || 'collection overview'
             WHEN p = cut + 12 AND d % 5 = 3 THEN {n[2]} || chr(10)
                 || {n[3]} || chr(10) || 'designed in milano'
             WHEN p = cut + 12 THEN {n[2]} || chr(10)
                 || 'designed in milano'
             WHEN p = cut + 17 AND d % 5 = 0 THEN {n[3]} || chr(10)
                 || 'by atelier beta'
             WHEN p = cut + 18 AND d % 5 = 1
                 THEN 'see ' || {n[3]} || ' glaze details'
             WHEN p = cut + 18 AND d % 5 = 2
                 THEN 'see ' || {n[3]} || ' with ' || {n[0]}
                      || ' and ' || {n[1]} || ' plus ' || {n[2]}
             WHEN p = cut + 18 AND d % 5 = 4
                 THEN 'see ' || {n[3]} || ' beside ' || {n[0]}
                      || ' and ' || {n[1]}
             ELSE 'filler page ' || p || ' of doc ' || d
        END"""


SYNTH_SECTION_PAGES_SQL = f"""
SELECT d AS doc_id, p AS page_num, {_sect_pages_sql_content()} AS content
FROM (SELECT event_id % 40 AS d,
             CAST(event_id // 40 + 1 AS INT) AS p,
             CAST(20 + (event_id % 40) % 3 * 10 AS INT) AS total,
             CASE WHEN (event_id % 40) % 3 = 0 THEN 3
                  WHEN (event_id % 40) % 3 = 1 THEN 4 ELSE 6 END AS cut
      FROM events)
WHERE p <= total AND (d * 7 + p) % 11 <> 0"""


def synth_section_products(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = (events.select((e % 40).alias("d"),
                          F.expr("(event_id div 40) % 4").cast("int")
                          .alias("k"))
            .distinct())
    dd, k = F.col("d"), F.col("k")
    name = F.concat(F.lit("  ITEM"), (dd % 7).cast("string"), F.lit("X"),
                    k.cast("string"), F.lit(" "))
    return base.select(
        dd.alias("doc_id"), (dd * 10 + k).alias("product_idx"),
        name.alias("name"),
        (F.lit(20) + (dd % 3) * 10).cast("int").alias("total_pages"))


SYNTH_SECTION_PRODUCTS_SQL = """
SELECT d AS doc_id, d * 10 + k AS product_idx,
       '  ITEM' || (d % 7) || 'X' || k || ' ' AS name,
       CAST(20 + d % 3 * 10 AS INT) AS total_pages
FROM (SELECT DISTINCT event_id % 40 AS d, (event_id // 40) % 4 AS k
      FROM events)"""
