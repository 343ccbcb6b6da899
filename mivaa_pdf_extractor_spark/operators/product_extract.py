"""Chunk-content product metadata extraction (map-only regex plans).

Re-expresses ``_extract_product_metadata`` of the reference's product
creation service (reference ``app/services/products/
product_creation_service.py:554-621``):

- dimensions: the first match of the 2-capture pattern
  ``(\\d+(?:\\.\\d+)?)\\s*[x×]\\s*(\\d+(?:\\.\\d+)?)(?:cm|mm)?``
  rendered ``a×b``.  The 3-capture branch is DEAD CODE — every 3D
  string matches the 2-capture pattern first and the loop breaks, so
  '15×38×2' yields '15×38' (pinned).
- designer: three patterns tried in order, (?i); only the FIRST
  match of each pattern is examined — it must be > 2 chars and not
  in {THE, AND, FOR} or the next pattern is tried.  Pattern 1's
  capture class ``[A-Z][A-Za-z\\s{}\\-]+`` includes whitespace, so a
  greedy capture crosses line breaks (pinned; \\s realized as the
  explicit ASCII class).
- colors: case-SENSITIVE vocabulary findall, set-deduped (the
  contract renders sorted).
- collection: ``(?:collection|COLLECTION)\\s+([A-Z][a-z]+)`` —
  case-sensitive (no flag), first match.
- material_type: first of
  ceramic|porcelain|tile|stone|marble|granite (?i), lowered.

Scale: map-only regexp_extract / regexp_extract_all projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_WS = "[ \\t\\r\\n\\x0b\\f]"
DIM_PAT = ("([0-9]+(?:\\.[0-9]+)?)" + _WS + "*[x×]" + _WS
           + "*([0-9]+(?:\\.[0-9]+)?)" + _WS + "*(?:cm|mm)?")
DESIGNER_PATS = [
    "(?i)(?:by|BY|designer|DESIGNER|studio|STUDIO)" + _WS
    + "+([A-Z][A-Za-z \\t\\r\\n\\x0b\\f{}\\-]+)",
    "(?i)(ESTUDI\\{H\\}AC|DSIGNIO|ALT DESIGN|MUT|YONOH|STACY GARCIA"
    "|SG NY)",
    "(?i)([A-Z][a-z]+" + _WS + "+[A-Z][a-z]+(?:" + _WS
    + "+[A-Z][a-z]+)?)" + _WS + "+(?:NY|STUDIO|DESIGN)",
]
COLOR_PAT = ("\\b(TAUPE|SAND|CLAY|WHITE|BLACK|GREY|GRAY|ANTHRACITE"
             "|BEIGE|BROWN|BLUE|GREEN|RED)\\b")
COLLECTION_PAT = "(?:collection|COLLECTION)" + _WS + "+([A-Z][a-z]+)"
MATERIAL_PAT = "(?i)\\b(ceramic|porcelain|tile|stone|marble|granite)\\b"
_DESIGNER_STOP = ["THE", "AND", "FOR"]


def _strip(c):
    return F.regexp_replace(c, "^" + _WS + "+|" + _WS + "+$", "")


def extract_product_metadata(chunks: DataFrame) -> DataFrame:
    """chunks: (chunk_id, content).  Emits the extracted metadata."""
    t = F.coalesce("content", F.lit(""))
    d1 = F.regexp_extract(t, DIM_PAT, 1)
    d2 = F.regexp_extract(t, DIM_PAT, 2)
    dims = F.when(d1 != "", F.concat(d1, F.lit("×"), d2))

    designer = None
    for pat in DESIGNER_PATS:
        cand = _strip(F.regexp_extract(t, pat, 1))
        ok = (cand != "") & (F.length(cand) > 2) \
            & ~cand.isin(*_DESIGNER_STOP)
        this = F.when(ok, cand)
        designer = this if designer is None else \
            F.coalesce(designer, this)

    colors = F.array_sort(F.array_distinct(
        F.regexp_extract_all(t, F.lit(COLOR_PAT), F.lit(1))))
    collection = F.nullif(
        F.regexp_extract(t, COLLECTION_PAT, 1), F.lit(""))
    material = F.nullif(
        F.lower(F.regexp_extract(t, MATERIAL_PAT, 1)), F.lit(""))
    return chunks.select(
        "chunk_id", dims.alias("dimensions"),
        designer.alias("designer"),
        F.when(F.size(colors) > 0, F.array_join(colors, ","))
        .alias("colors_csv"),
        collection.alias("collection"), material.alias("material_type"))


def extract_meta_sql() -> str:
    """DuckDB twin over a CTE chunks_in (chunk_id, content)."""
    strip = ("regexp_replace({}, '^" + _WS + "+|" + _WS
             + "+$', '', 'g')")
    des = []
    for i, pat in enumerate(DESIGNER_PATS):
        cand = strip.format(
            f"coalesce(regexp_extract(t, '{pat}', 1), '')")
        des.append(f"""CASE WHEN {cand} <> ''
            AND length({cand}) > 2
            AND {cand} NOT IN ('THE', 'AND', 'FOR')
            THEN {cand} END""")
    designer = f"coalesce({', '.join(des)})"
    return f"""
    b AS (SELECT chunk_id, coalesce(content, '') AS t FROM chunks_in),
    x AS (SELECT chunk_id, t,
                 coalesce(regexp_extract(t, '{DIM_PAT}', 1), '')
                     AS d1,
                 coalesce(regexp_extract(t, '{DIM_PAT}', 2), '')
                     AS d2
          FROM b)
    SELECT chunk_id,
           CASE WHEN d1 <> '' THEN d1 || '×' || d2 END AS dimensions,
           {designer} AS designer,
           CASE WHEN len(list_sort(list_distinct(
                    regexp_extract_all(t, '{COLOR_PAT}', 1)))) > 0
                THEN array_to_string(list_sort(list_distinct(
                    regexp_extract_all(t, '{COLOR_PAT}', 1))), ',')
           END AS colors_csv,
           nullif(coalesce(regexp_extract(t, '{COLLECTION_PAT}', 1),
                           ''), '') AS collection,
           nullif(lower(coalesce(regexp_extract(t, '{MATERIAL_PAT}',
                                                1), '')), '')
               AS material_type
    FROM x"""


def synth_meta_chunks(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    content = (
        F.when(e % 7 == 0, F.concat(
            F.lit("VALENOVA tiles 15×38×2 cm in TAUPE and SAND, "
                  "by Estudi Nou\nporcelain COLLECTION Alba"),
            (e % 5).cast("string")))
        .when(e % 7 == 1, "Designed BY MUT studio 20 x 40 mm GREY")
        .when(e % 7 == 2, "Stacy Garcia NY line, WHITE BLACK WHITE")
        .when(e % 7 == 3, "studio THE rest 11.8×11.8")
        .when(e % 7 == 4, F.concat(F.lit("collection Roma marble "),
                                   (e % 3).cast("string")))
        .when(e % 7 == 5, "nothing here at all")
        .otherwise(F.concat(F.lit("designer Ana Luz\nGRANITE slab "),
                            (e % 4).cast("string"))))
    return events.select(e.alias("chunk_id"), content.alias("content"))


SYNTH_META_CHUNKS_SQL = """
SELECT event_id AS chunk_id,
       CASE WHEN event_id % 7 = 0
                THEN 'VALENOVA tiles 15×38×2 cm in TAUPE and SAND, by Estudi Nou' || chr(10)
                     || 'porcelain COLLECTION Alba' || (event_id % 5)
            WHEN event_id % 7 = 1
                THEN 'Designed BY MUT studio 20 x 40 mm GREY'
            WHEN event_id % 7 = 2
                THEN 'Stacy Garcia NY line, WHITE BLACK WHITE'
            WHEN event_id % 7 = 3 THEN 'studio THE rest 11.8×11.8'
            WHEN event_id % 7 = 4
                THEN 'collection Roma marble ' || (event_id % 3)
            WHEN event_id % 7 = 5 THEN 'nothing here at all'
            ELSE 'designer Ana Luz' || chr(10) || 'GRANITE slab '
                 || (event_id % 4)
       END AS content
FROM events"""


# ---------------------------------------------------------------------------
# product name extraction (product_creation_service.py:499-553)

HEADER_PAT = "^#+" + _WS + "+([A-Z]{2,}(?:" + _WS + "+[A-Z]{2,})*)"
STANDALONE_PAT = "^[A-Z]{2,}(?:" + _WS + "+[A-Z]{2,})*$"
UPPER_RUN_PAT = "\\b([A-Z]{3,}(?:" + _WS + "+[A-Z]{3,})*)\\b"
UPPER_WORD_PAT = "\\b[A-Z]{3,}\\b"
LINE_CONTEXT = ["×", "cm", "mm", "designer", "estudi", "dsignio",
                "alt design", "mut", "yonoh"]
FALLBACK_CONTEXT = ["×", "cm", "mm", "designer", "collection"]
EXCLUDED_WORDS = [
    "THE", "AND", "FOR", "WITH", "FROM", "THAT", "THIS", "HAVE",
    "BEEN", "WILL", "THEY", "WERE", "SAID", "EACH", "WHICH", "THEIR",
    "TIME", "HARMONY", "COLLECTION", "DESIGN", "CERAMIC", "PORCELAIN",
    "TILE", "TECHNICAL", "SPECIFICATIONS", "CHARACTERISTICS",
    "QUALITY",
]


def extract_product_names(chunks: DataFrame) -> DataFrame:
    """``_extract_product_name``: first-10-lines ladder (header ->
    standalone uppercase <= 20 chars -> uppercase run whose 3-line
    context window — anchored at the line's FIRST occurrence — shows
    a product marker), then the whole-content uppercase-word fallback
    with the 27-word exclusion list and the ±100-char context around
    the word's FIRST occurrence.  The reference's ``lines.index``
    would raise on an indented duplicate-free line; here an absent
    stripped line yields an empty context instead (documented
    divergence on crash inputs only)."""
    t = F.coalesce("content", F.lit(""))
    lines = F.split(t, "\n", -1)
    first10 = F.slice(lines, 1, 10)

    def ctx_ok(ctx, markers):
        out = None
        low = F.lower(ctx)
        for m in markers:
            c = low.contains(m)
            out = c if out is None else (out | c)
        return out

    def per_line(line):
        ls = _strip(line)
        header = F.nullif(
            _strip(F.regexp_extract(ls, HEADER_PAT, 1)), F.lit(""))
        standalone = F.when(
            ls.rlike(STANDALONE_PAT) & (F.length(ls) <= 20), ls)
        cand = F.nullif(F.regexp_extract(ls, UPPER_RUN_PAT, 1),
                        F.lit(""))
        idx = F.array_position(lines, ls)  # first occurrence, 1-based
        ctx = F.when(idx > 0, F.concat_ws(
            "\n", F.slice(lines, idx.cast("int"), 3))).otherwise("")
        upper = F.when(cand.isNotNull()
                       & ctx_ok(ctx, LINE_CONTEXT), _strip(cand))
        return F.coalesce(header, standalone, upper)

    per = F.filter(F.transform(first10, per_line),
                   lambda v: v.isNotNull())
    name1 = F.when(F.size(per) > 0, F.element_at(per, 1))

    words = F.regexp_extract_all(t, F.lit(UPPER_WORD_PAT), F.lit(0))

    def word_ok(w):
        pos0 = F.instr(t, w) - 1  # 0-based first occurrence
        lo = F.greatest(pos0 - 100, F.lit(0))
        ctx = t.substr(lo + 1, pos0 + 100 - lo)
        return (~w.isin(*EXCLUDED_WORDS)
                & ctx_ok(ctx, FALLBACK_CONTEXT))

    passing = F.filter(words, word_ok)
    fallback = F.when(F.size(passing) > 0, F.element_at(passing, 1))
    return chunks.select(
        "chunk_id", F.coalesce(name1, fallback).alias("product_name"))


def extract_names_sql() -> str:
    """DuckDB twin over a CTE chunks_in (chunk_id, content)."""
    line_ctx = " OR ".join(f"contains(lower(cx), '{m}')"
                           for m in LINE_CONTEXT)
    fb_ctx = " OR ".join(f"contains(lower(cx), '{m}')"
                         for m in FALLBACK_CONTEXT)
    excl = ", ".join(f"'{w}'" for w in EXCLUDED_WORDS)
    strip = ("regexp_replace({}, '^" + _WS + "+|" + _WS
             + "+$', '', 'g')")
    ls = strip.format("line")
    return f"""
    b AS (SELECT chunk_id, coalesce(content, '') AS t,
                 string_split(coalesce(content, ''), chr(10)) AS lines
          FROM chunks_in),
    perline AS (SELECT chunk_id, t, lines, i,
                       {ls} AS lsv
                FROM (SELECT *, lines[i] AS line
                      FROM b, unnest(generate_series(1,
                          least(len(lines), 10))) u(i))),
    cand AS (SELECT chunk_id, i,
        coalesce(nullif({strip.format(
            f"coalesce(regexp_extract(lsv, '{HEADER_PAT}', 1), '')")},
            ''),
          CASE WHEN regexp_matches(lsv, '{STANDALONE_PAT}')
                    AND length(lsv) <= 20 THEN lsv END,
          (SELECT CASE WHEN rc IS NOT NULL AND ({line_ctx})
                       THEN {strip.format('rc')} END
           FROM (SELECT nullif(coalesce(regexp_extract(lsv,
                     '{UPPER_RUN_PAT}', 1), ''), '') AS rc,
                 CASE WHEN coalesce(list_position(lines, lsv), 0) > 0
                      THEN array_to_string(lines[
                          list_position(lines, lsv):
                          list_position(lines, lsv) + 2], chr(10))
                      ELSE '' END AS cx))) AS nm
        FROM perline),
    name1 AS (SELECT chunk_id, nm, row_number() OVER (
                  PARTITION BY chunk_id ORDER BY i) AS rk
              FROM cand WHERE nm IS NOT NULL),
    wordsx AS (SELECT chunk_id, t, ws[wi] AS w, wi
               FROM (SELECT chunk_id, t, regexp_extract_all(t,
                         '{UPPER_WORD_PAT}', 0) AS ws FROM b),
                    unnest(generate_series(1, len(ws))) u(wi)),
    fb AS (SELECT chunk_id, w, row_number() OVER (
               PARTITION BY chunk_id ORDER BY wi) AS rk
           FROM (SELECT chunk_id, w, wi,
                     substring(t, greatest(strpos(t, w) - 1 - 100, 0)
                         + 1,
                         (strpos(t, w) - 1 + 100)
                         - greatest(strpos(t, w) - 1 - 100, 0)) AS cx
                 FROM wordsx WHERE w NOT IN ({excl}))
           WHERE {fb_ctx})
    SELECT b.chunk_id,
           coalesce(n.nm, f.w) AS product_name
    FROM b
    LEFT JOIN (SELECT chunk_id, nm FROM name1 WHERE rk = 1) n
         USING (chunk_id)
    LEFT JOIN (SELECT chunk_id, w FROM fb WHERE rk = 1) f
         USING (chunk_id)"""


def synth_name_chunks(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    n = (e % 6).cast("string")
    content = (
        F.when(e % 8 == 0, F.concat(F.lit("## VALENOVA\nglaze row "), n))
        .when(e % 8 == 1, F.concat(F.lit("#### AB CD\nrest "), n))
        .when(e % 8 == 2, F.concat(F.lit("intro line\nONA\nmore "), n))
        .when(e % 8 == 3, F.concat(
            F.lit("LONGNAMEREALLYLONG EXTRA over twenty chars\n"
                  "15×38 next "), n))
        .when(e % 8 == 4, F.concat(F.lit("New PIQUE tiles by mut "), n))
        .when(e % 8 == 5, F.concat(
            F.lit("plain intro\nfiller a\nfiller b\nfiller c\n"
                  "filler d\nfiller e\nfiller f\nfiller g\nfiller h\n"
                  "filler i\nCOLLECTION HARMONY 20 cm\nZETA near cm "),
            n))
        .when(e % 8 == 6, F.lit("nothing uppercase here"))
        .otherwise(F.concat(F.lit("TAUPE shade 30 mm sample "), n)))
    return events.select(e.alias("chunk_id"), content.alias("content"))


SYNTH_NAME_CHUNKS_SQL = """
SELECT event_id AS chunk_id,
       CASE WHEN event_id % 8 = 0
                THEN '## VALENOVA' || chr(10) || 'glaze row '
                     || (event_id % 6)
            WHEN event_id % 8 = 1
                THEN '#### AB CD' || chr(10) || 'rest '
                     || (event_id % 6)
            WHEN event_id % 8 = 2
                THEN 'intro line' || chr(10) || 'ONA' || chr(10)
                     || 'more ' || (event_id % 6)
            WHEN event_id % 8 = 3
                THEN 'LONGNAMEREALLYLONG EXTRA over twenty chars'
                     || chr(10) || '15×38 next ' || (event_id % 6)
            WHEN event_id % 8 = 4
                THEN 'New PIQUE tiles by mut ' || (event_id % 6)
            WHEN event_id % 8 = 5
                THEN 'plain intro' || chr(10) || 'filler a' || chr(10)
                     || 'filler b' || chr(10) || 'filler c' || chr(10)
                     || 'filler d' || chr(10) || 'filler e' || chr(10)
                     || 'filler f' || chr(10) || 'filler g' || chr(10)
                     || 'filler h' || chr(10) || 'filler i' || chr(10)
                     || 'COLLECTION HARMONY 20 cm' || chr(10)
                     || 'ZETA near cm ' || (event_id % 6)
            WHEN event_id % 8 = 6 THEN 'nothing uppercase here'
            ELSE 'TAUPE shade 30 mm sample ' || (event_id % 6)
       END AS content
FROM events"""


# ---------------------------------------------------------------------------
# metadata scope detection fallback (dynamic_metadata_extractor.py:1033-1104)

EXPLICIT_CATALOG_KEYWORDS = ["all tiles", "all products",
                             "entire catalog", "every product"]
IMPLICIT_PATTERNS = [
    "available in" + _WS + "+[0-9]+",
    "comes in" + _WS + "+[0-9]+",
    "factory:" + _WS + "*[0-9a-z_]",
    "made in" + _WS + "+[0-9a-z_]",
    "dimensions?:" + _WS + "*[0-9]+",
]
_OVERRIDE_PAT = "dimensions?:" + _WS + "*[0-9]+"


def detect_metadata_scope(chunks: DataFrame, names: DataFrame) -> DataFrame:
    """``_fallback_scope_detection``: mentioned products = names whose
    lowercase form is a substring of the lowered chunk (kept in
    product-list order); explicit catalog keywords beat implicit
    regex patterns, which only fire when NO product is mentioned;
    product mentions win outright with is_override =
    'dimensions: N' present.  chunks: (chunk_id, doc_id, content);
    names: (doc_id, name_ord, name).

    NOTE: the reference's ``factory:\\s*\\w+`` / ``made in\\s+\\w+``
    use \\w — realized as the explicit ``[0-9a-z_]`` class (the text
    is lowercased first, so uppercase never appears; both engines
    agree)."""
    low = F.lower(F.coalesce("content", F.lit("")))
    matched = (chunks.join(names, "doc_id")
               .where(F.lower(F.col("content"))
                      .contains(F.lower(F.col("name"))))
               .groupBy("chunk_id")
               .agg(F.array_join(F.transform(F.array_sort(
                   F.collect_list(F.struct("name_ord", "name"))),
                   lambda s: s["name"]), ", ").alias("mentioned"),
                   F.count("*").alias("n_m")))
    j = (chunks.join(matched, "chunk_id", "left")
         .withColumn("low", low))
    expl = None
    for k in EXPLICIT_CATALOG_KEYWORDS:
        c = F.col("low").contains(k)
        expl = c if expl is None else (expl | c)
    impl = None
    for p in IMPLICIT_PATTERNS:
        c = F.col("low").rlike(p)
        impl = c if impl is None else (impl | c)
    has_m = F.col("n_m").isNotNull()
    override = F.col("low").rlike(_OVERRIDE_PAT)
    scope = (F.when(has_m, "product_specific")
             .when(expl, "catalog_general_explicit")
             .when(impl, "catalog_general_implicit")
             .otherwise("unknown"))
    conf = (F.when(has_m, 0.7).when(expl, 0.6).when(impl, 0.5)
            .otherwise(0.3))
    reasoning = (
        F.when(has_m, F.concat(F.lit("Mentions product names: "),
                               F.col("mentioned")))
        .when(expl, "Contains explicit catalog-general keywords")
        .when(impl, "Metadata mentioned without product context "
                    "(implicit catalog-general)")
        .otherwise("Cannot determine scope from patterns"))
    applies = (F.when(has_m, F.col("mentioned"))
               .when(expl | impl, "all").otherwise(""))
    return j.select(
        "chunk_id", scope.alias("scope"), conf.alias("confidence"),
        reasoning.alias("reasoning"), applies.alias("applies_to"),
        F.when(has_m, override).otherwise(F.lit(False))
        .cast("string").alias("is_override"))


def scope_sql() -> str:
    """DuckDB twin over CTEs chunks_in (chunk_id, doc_id, content)
    and names_in (doc_id, name_ord, name)."""
    expl = " OR ".join(f"contains(low, '{k}')"
                       for k in EXPLICIT_CATALOG_KEYWORDS)
    impl = " OR ".join(f"regexp_matches(low, '{p}')"
                       for p in IMPLICIT_PATTERNS)
    return f"""
    m AS (SELECT c.chunk_id,
                 array_to_string(list_transform(list_sort(
                     list(struct_pack(o := n.name_ord,
                          nm := n.name))), s -> s.nm), ', ')
                     AS mentioned,
                 count(*) AS n_m
          FROM chunks_in c JOIN names_in n ON n.doc_id = c.doc_id
               AND contains(lower(c.content), lower(n.name))
          GROUP BY 1),
    j AS (SELECT c.chunk_id, lower(coalesce(c.content, '')) AS low,
                 m.mentioned, m.n_m IS NOT NULL AS has_m
          FROM chunks_in c LEFT JOIN m USING (chunk_id))
    SELECT chunk_id,
           CASE WHEN has_m THEN 'product_specific'
                WHEN {expl} THEN 'catalog_general_explicit'
                WHEN {impl} THEN 'catalog_general_implicit'
                ELSE 'unknown' END AS scope,
           CASE WHEN has_m THEN CAST(0.7 AS DOUBLE)
                WHEN {expl} THEN CAST(0.6 AS DOUBLE)
                WHEN {impl} THEN CAST(0.5 AS DOUBLE)
                ELSE CAST(0.3 AS DOUBLE) END AS confidence,
           CASE WHEN has_m
                THEN 'Mentions product names: ' || mentioned
                WHEN {expl}
                THEN 'Contains explicit catalog-general keywords'
                WHEN {impl}
                THEN 'Metadata mentioned without product context (implicit catalog-general)'
                ELSE 'Cannot determine scope from patterns' END
               AS reasoning,
           CASE WHEN has_m THEN mentioned
                WHEN {expl} OR {impl} THEN 'all' ELSE '' END
               AS applies_to,
           CAST(CASE WHEN has_m
                THEN regexp_matches(low, '{_OVERRIDE_PAT}')
                ELSE false END AS VARCHAR) AS is_override
    FROM j"""


def synth_scope_chunks(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    d = e % 15
    content = (
        F.when(e % 7 == 0, F.concat(
            F.lit("The NIMBUS"), (d % 4).cast("string"),
            F.lit(" series, dimensions: 15 by request")))
        .when(e % 7 == 1, "applies to all tiles in this catalog")
        .when(e % 7 == 2, "Available in 20 formats from stock")
        .when(e % 7 == 3, "made in spain with care")
        .when(e % 7 == 4, F.concat(
            F.lit("nimbus"), (d % 4).cast("string"),
            F.lit(" accent trim available in 12 sizes")))
        .when(e % 7 == 5, "totally unrelated prose")
        .otherwise("Factory: castellon plant notes"))
    return events.select(e.alias("chunk_id"), d.alias("doc_id"),
                         content.alias("content"))


SYNTH_SCOPE_CHUNKS_SQL = """
SELECT event_id AS chunk_id, event_id % 15 AS doc_id,
       CASE WHEN event_id % 7 = 0
                THEN 'The NIMBUS' || (event_id % 15 % 4)
                     || ' series, dimensions: 15 by request'
            WHEN event_id % 7 = 1
                THEN 'applies to all tiles in this catalog'
            WHEN event_id % 7 = 2
                THEN 'Available in 20 formats from stock'
            WHEN event_id % 7 = 3 THEN 'made in spain with care'
            WHEN event_id % 7 = 4
                THEN 'nimbus' || (event_id % 15 % 4)
                     || ' accent trim available in 12 sizes'
            WHEN event_id % 7 = 5 THEN 'totally unrelated prose'
            ELSE 'Factory: castellon plant notes'
       END AS content
FROM events"""


def synth_scope_names(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = (events.select((e % 15).alias("doc_id"),
                          F.expr("(event_id div 15) % 2").cast("int")
                          .alias("name_ord")).distinct())
    return base.select(
        "doc_id", "name_ord",
        F.concat(F.lit("Nimbus"),
                 ((F.col("doc_id") + F.col("name_ord")) % 4)
                 .cast("string")).alias("name"))


SYNTH_SCOPE_NAMES_SQL = """
SELECT doc_id, name_ord,
       'Nimbus' || ((doc_id + name_ord) % 4) AS name
FROM (SELECT DISTINCT event_id % 15 AS doc_id,
             CAST((event_id // 15) % 2 AS INT) AS name_ord
      FROM events)"""


# ---------------------------------------------------------------------------
# smart relevant-section extraction
# (dynamic_metadata_extractor.py:379-452)

SECTION_KEYWORD_PATTERNS = [
    "(?i)\\b(packaging|packing|iconography|box|pallet|pieces per box"
    "|coverage|confezionamento|imballaggio|emballage|conditionnement"
    "|embalaje|empaque|verpackung|συσκευασία)\\b",
    "(?i)\\b(regulation|compliance|certification|standard|safety"
    "|eco.?friendly|sustainability|voc|leed|iso|regolamento"
    "|certificazione|réglementation|certification|regulación"
    "|certificación|zertifizierung|vorschriften|πιστοποίηση)\\b",
    "(?i)\\b(care|maintenance|cleaning|handling|installation"
    "|recommended use|manutenzione|pulizia|entretien|nettoyage"
    "|mantenimiento|limpieza|reinigung|pflege|wartung|καθαρισμός"
    "|συντήρηση)\\b",
    "(?i)\\b(technical|specification|properties|performance"
    "|dimensions|weight|thickness|specifiche tecniche"
    "|spécifications|especificaciones|technische daten|τεχνικά)\\b",
]
INDEX_DIM_PAT = ("(?i)[0-9]+[.,]?[0-9]*" + _WS + "*[x×]" + _WS
                 + "*[0-9]+[.,]?[0-9]*" + _WS + "*(cm|mm|inch)?")


def extract_relevant_sections(docs: DataFrame, max_chars: int = 100000,
                              head: int = 12000, index_start: int = 12000,
                              index_end: int = 35000, around: int = 3000,
                              tail: int = 8000) -> DataFrame:
    """``_extract_relevant_sections``: short texts pass through; long
    texts become head + (index area when the dimension regex hits it)
    + a ±around window for EVERY keyword match, patterns in declared
    order and matches in position order + tail, '\\n\\n---\\n\\n'
    joined and truncated to max_chars.  Constants default to the
    reference's; the contract query scales them down so synthetic
    docs exercise the path.  NOTE: the Greek keyword alternatives are
    unreachable here — Java and RE2 both use ASCII \\b, so a
    boundary next to Greek letters never asserts (Python's unicode
    \\b would match; divergence documented, synth stays Greek-free).

    docs: (doc_id, text).

    Engine note: this was first built as a pure-native plan (split +
    regexp_extract_all + an ``aggregate`` fold deriving match
    positions). Higher-order folds are interpreted, not codegen'd, and
    the interpreter re-inlines the regex split into every fold step —
    measured ~4.5 ms/row (45 s for the 10k-doc contract corpus). The
    Arrow-batched kernel below computes the identical result (regexes
    compiled with ``re.ASCII`` so ``\\b``/``(?i)`` match Java/RE2
    ASCII semantics) at ~µs/row; the DuckDB oracle is unchanged and
    still hash-gates it."""
    import re as _re
    import string as _string

    import pandas as pd

    # Round-6 kernel: ONE combined scan over an ASCII-lowercased copy
    # replaces four (?i) finditer passes. Equivalence argument, pinned
    # by the DuckDB twin + fixtures:
    # - `(?i)` + re.ASCII folds ASCII letters only, so an A-Z→a-z
    #   translate (length-preserving; Greek/accents untouched, exactly
    #   like ASCII case folding) over the haystack with case-sensitive
    #   patterns matches the identical spans at identical offsets;
    # - no keyword literal appears in two families and every match is
    #   \b-bounded, so a match of one family can never start inside a
    #   match of another — the combined alternation finds exactly the
    #   union of the per-family matches;
    # - matches are re-bucketed per family and emitted in (declared
    #   family order, position order) — the original iteration order.
    _ascii_lower = str.maketrans(_string.ascii_uppercase,
                                 _string.ascii_lowercase)
    fam_names = [f"f{i}" for i in range(len(SECTION_KEYWORD_PATTERNS))]
    combined = _re.compile(
        "|".join(f"(?P<{nm}>{p[4:]})"   # strip the leading "(?i)"
                 for nm, p in zip(fam_names, SECTION_KEYWORD_PATTERNS)),
        _re.ASCII)
    # family lookup via lastindex: each family contributes its named
    # group plus exactly one inner group, so the highest matched group
    # number identifies the family (lastgroup would return None here —
    # the inner groups are unnamed)
    fam_by_gnum = {}
    for i, nm in enumerate(fam_names):
        g = combined.groupindex[nm]
        fam_by_gnum[g] = i
        fam_by_gnum[g + 1] = i
    idx_pat = _re.compile(INDEX_DIM_PAT[4:], _re.ASCII)

    def one(t: str) -> str:
        t = t or ""
        n = len(t)
        if n <= max_chars:
            return t
        low = t.translate(_ascii_lower)
        secs = [t[:head]]
        if n > index_end and idx_pat.search(
                low[index_start:index_end]):
            secs.append(t[index_start:min(index_end, n)])
        fams = [[] for _ in fam_names]
        for m in combined.finditer(low):
            fams[fam_by_gnum[m.lastindex]].append(m.span())
        for spans in fams:
            for s, e in spans:
                secs.append(t[max(s - around, 0):min(e + around, n)])
        secs.append(t[max(n - tail, 0):])
        return "\n\n---\n\n".join(secs)[:max_chars]

    def run(batches):
        for pdf in batches:
            out = pdf["text"].map(one)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "extracted": out,
                "out_len": out.str.len().astype("int32")})

    from mivaa_pdf_extractor_spark.core.fanout import fan_out
    id_type = dict(docs.dtypes)["doc_id"]
    return fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, f"doc_id {id_type}, extracted string, out_len int")


def sections_extract_sql(max_chars: int = 100000, head: int = 12000,
                         index_start: int = 12000,
                         index_end: int = 35000, around: int = 3000,
                         tail: int = 8000) -> str:
    """DuckDB twin over a CTE docs_in (doc_id, text)."""
    def windows(pat):
        # prefix-sum positions (list_reduce over nested accumulators
        # is nondeterministic in this DuckDB -- see product_merge)
        pl = f"list_transform(regexp_split_to_array(t, '{pat}'), p -> length(p))"
        ml = f"list_transform(regexp_extract_all(t, '{pat}', 0), m -> length(m))"
        return f"""list_transform(generate_series(1,
            len(regexp_extract_all(t, '{pat}', 0))),
            k -> substring(t,
                greatest(CAST(coalesce(list_sum(({pl})[1:k]), 0)
                    + coalesce(list_sum(({ml})[1:k - 1]), 0) AS INT)
                    - {around}, 0) + 1,
                least(CAST(coalesce(list_sum(({pl})[1:k]), 0)
                    + coalesce(list_sum(({ml})[1:k]), 0) AS INT)
                    + {around}, length(t))
                - greatest(CAST(coalesce(list_sum(({pl})[1:k]), 0)
                    + coalesce(list_sum(({ml})[1:k - 1]), 0) AS INT)
                    - {around}, 0)))"""

    wins = " ||\n        ".join(windows(p)
                                for p in SECTION_KEYWORD_PATTERNS)
    return f"""
    b AS (SELECT doc_id, coalesce(text, '') AS t FROM docs_in),
    s AS (SELECT doc_id, t, length(t) AS n,
                 substring(t, {index_start} + 1,
                     least({index_end}, length(t)) - {index_start})
                     AS idxa
          FROM b),
    parts AS (SELECT doc_id, t, n,
        [substring(t, 1, {head})]
        || CASE WHEN n > {index_end}
                AND regexp_matches(idxa, '{INDEX_DIM_PAT}')
                THEN [idxa] ELSE [] END
        || {wins}
        || [substring(t, greatest(n - {tail} + 1, 1), n)] AS secs
        FROM s)
    SELECT doc_id,
           CASE WHEN n <= {max_chars} THEN t
                ELSE substring(array_to_string(secs,
                    chr(10) || chr(10) || '---' || chr(10) || chr(10)),
                    1, {max_chars}) END AS extracted,
           length(CASE WHEN n <= {max_chars} THEN t
                ELSE substring(array_to_string(secs,
                    chr(10) || chr(10) || '---' || chr(10) || chr(10)),
                    1, {max_chars}) END) AS out_len
    FROM parts"""


def synth_section_docs(events: DataFrame) -> DataFrame:
    """~2-4 KB docs against scaled-down constants (max 1500, head
    300, index (300, 900), around 150, tail 200)."""
    e = F.col("event_id")
    # constant-folded filler (round 6): the repeat count is 40 + (e%4)*12
    # ∈ {40, 52, 64, 76} repeats of a 46-char line, so the substr(1, N)
    # prefixes (N ≤ 700 < 40·46) are row-independent constants and the
    # full filler is one of four literals — the original array_repeat +
    # array_join tree re-built up to ~3.5 KB of string per reference,
    # four references per row. Same bytes out; the DuckDB twin SQL is
    # unchanged.
    _line = "lorem body line with steady filler text here. "
    filler = F.element_at(
        F.array(*[F.lit(_line * c) for c in (40, 52, 64, 76)]),
        (e % 4).cast("int") + 1)
    _prefix = (_line * 40)
    kw1 = F.when(e % 3 == 0, " packaging 12 pieces per box ") \
        .otherwise(F.lit(" plain segment "))
    kw2 = F.when(e % 4 == 0, " ISO certification dossier ") \
        .otherwise(F.lit(" more prose "))
    kw3 = F.when(e % 5 == 0, " cleaning and maintenance tips ") \
        .otherwise(F.lit(" interlude "))
    dims = F.when(e % 2 == 0, " sizes 20×40 cm and 15x38 ") \
        .otherwise(F.lit(" no sizes here "))
    text = F.concat(
        F.lit("HEAD product intro "), (e % 9).cast("string"),
        F.lit(" "), F.lit(_prefix[:280]),
        dims, F.lit(_prefix[:500]), kw1, F.lit(_prefix[:600]),
        kw2, F.lit(_prefix[:700]), kw3, filler,
        F.lit(" TAIL compliance table "), (e % 6).cast("string"))
    short = F.concat(F.lit("tiny doc "), (e % 11).cast("string"))
    return events.select(
        e.alias("doc_id"),
        F.when(e % 6 == 5, short).otherwise(text).alias("text"))


SYNTH_SECTION_DOCS_SQL = """
SELECT event_id AS doc_id,
       CASE WHEN event_id % 6 = 5
            THEN 'tiny doc ' || (event_id % 11)
            ELSE 'HEAD product intro ' || (event_id % 9) || ' '
                 || substring(repeat(
                     'lorem body line with steady filler text here. ',
                     CAST(40 + event_id % 4 * 12 AS INT)), 1, 280)
                 || CASE WHEN event_id % 2 = 0
                         THEN ' sizes 20×40 cm and 15x38 '
                         ELSE ' no sizes here ' END
                 || substring(repeat(
                     'lorem body line with steady filler text here. ',
                     CAST(40 + event_id % 4 * 12 AS INT)), 1, 500)
                 || CASE WHEN event_id % 3 = 0
                         THEN ' packaging 12 pieces per box '
                         ELSE ' plain segment ' END
                 || substring(repeat(
                     'lorem body line with steady filler text here. ',
                     CAST(40 + event_id % 4 * 12 AS INT)), 1, 600)
                 || CASE WHEN event_id % 4 = 0
                         THEN ' ISO certification dossier '
                         ELSE ' more prose ' END
                 || substring(repeat(
                     'lorem body line with steady filler text here. ',
                     CAST(40 + event_id % 4 * 12 AS INT)), 1, 700)
                 || CASE WHEN event_id % 5 = 0
                         THEN ' cleaning and maintenance tips '
                         ELSE ' interlude ' END
                 || repeat(
                     'lorem body line with steady filler text here. ',
                     CAST(40 + event_id % 4 * 12 AS INT))
                 || ' TAIL compliance table ' || (event_id % 6)
       END AS text
FROM events"""
