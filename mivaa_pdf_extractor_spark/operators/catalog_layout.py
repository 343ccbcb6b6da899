"""Catalog page-layout classification (keyword-ladder Column plans).

Re-expresses the pure classifier of the reference's catalog layout
analyzer (reference ``app/services/pdf/catalog_layout_analyzer.py:
255-370``): accent-stripped keyword-set hit counting feeding a fixed
decision ladder.

Semantics pinned (``_classify_page``):

- normalize = NFD accent strip + upper + whitespace collapse (same
  explicit translate realization as operators/spec_rows.py);
- matched product names = known names whose normalized form is a
  SUBSTRING of the normalized page text (the reference iterates a
  Python set, so its list order is unspecified — the contract
  renders the matches sorted);
- ladder: blank -> other; spec keyword >= 1 AND a matched name ->
  product_spec (note: contrary to the reference's own comment, a
  spec page WITHOUT a product name does NOT become legend_icons
  unless it independently clears the icon gate — faithful to the
  code, pinned); icon hits >= 2 AND no names -> legend_icons;
  cert/regulation/installation/care/sustainability each >= 2 in that
  order; index >= 1; bio >= 1 AND no names; any matched name ->
  product_photo; page_index < 2 or >= total-2 with < 50 normalized
  words -> cover; else other.
- ``_detect_packing_row`` (:271-282): PACKING or BOX present AND
  >= 6 ``\\b\\d{1,4}[,.]?\\d{0,4}\\b`` numeric tokens.

Scale: one doc-co-keyed pages x names join for the substring pass
(bounded by names-per-doc), then a map-only projection of ~90
literal contains() ops — all whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mivaa_pdf_extractor_spark.operators.spec_rows import (  # noqa: F401
    _ACC_FROM, _ACC_TO, _WS)

SPEC_TABLE_KEYWORDS = [
    "TECHNICAL CHARACTERISTICS", "TECHNICAL CHARACTERISTIC",
    "CARACTERISTICAS TECNICAS", "CARATTERISTICHE TECNICHE",
    "CARACTERISTIQUES TECHNIQUES", "PACKING", "PACKAGING", "EMBALAJE",
    "PCS / BOX", "PCS/BOX", "PIECES / BOX", "M2 / BOX",
    "BOXES / PALLET", "BOXES/PALLET", "WEIGHT / BOX",
    "WEIGHT / PALLET",
]
LEGEND_ICONS_KEYWORDS = [
    "SLIP RESISTANCE", "RESISTENCIA AL DESLIZAMIENTO", "SCIVOLOSITA",
    "DIN 51097", "DIN 51130", "PENDULUM", "PEI RATING",
    "ABRASION RESISTANCE", "RESISTENCIA A LA ABRASION", "PEI I",
    "PEI II", "PEI III", "PEI IV", "PEI V", "WATER ABSORPTION",
    "ABSORCION DE AGUA", "ASSORBIMENTO", "BIA", "BIB", "BIIA", "BIIB",
    "BIII", "SHADE VARIATION", "VARIAZIONE", "V1", "V2", "V3", "V4",
    "FROST RESISTANCE", "RESISTENCIA AL HIELO", "FIRE RATING",
    "REACTION TO FIRE", "BFL-S1", "TRAFFIC LEVEL", "FOOT TRAFFIC",
    "TRAFICO",
]
LEGEND_REGULATION_KEYWORDS = [
    "EN 14411", "EN-14411", "EN14411", "ISO 10545", "ISO-10545",
    "ANSI A137.1", "ANSI A137", "DIN 51097", "DIN 51130", "UNE-EN",
    "UNE EN", "TECHNICAL STANDARDS", "NORMATIVE", "NORMAS TECNICAS",
    "NORMATIVA", "TEST METHODS", "TEST NORMS", "METODOS DE ENSAYO",
]
LEGEND_CERTIFICATION_KEYWORDS = [
    "CERTIFICATIONS", "CERTIFICATES", "CERTIFICATION", "CERTIFICADO",
    "CERTIFICAZIONI", "ISO 9001", "ISO 14001", "ISO 45001", "CE MARK",
    "CE MARKING", "LEED", "EPD", "EMAS", "ECOLABEL",
    "QUALITY MANAGEMENT", "ENVIRONMENTAL MANAGEMENT",
]
LEGEND_INSTALLATION_KEYWORDS = [
    "INSTALLATION RECOMMENDATIONS", "INSTALLATION GUIDE",
    "RECOMENDACIONES DE INSTALACION", "INSTRUCCIONES DE INSTALACION",
    "INSTALLATION METHOD", "THIN-SET", "THIN SET", "ADHESIVE",
    "JOINT WIDTH", "SUBSTRATE", "CUTTING", "DRILLING",
    "EXPANSION JOINT", "GROUT", "CEMENT BOARD",
]
LEGEND_CARE_KEYWORDS = [
    "CARE INSTRUCTIONS", "CARE AND MAINTENANCE",
    "CLEANING INSTRUCTIONS", "CLEANING GUIDE", "MAINTENANCE",
    "LIMPIEZA", "MANUTENZIONE", "NEUTRAL PH", "STAIN REMOVAL",
    "DAILY CLEANING", "MANTENIMIENTO", "DETERGENT",
]
LEGEND_SUSTAINABILITY_KEYWORDS = [
    "SUSTAINABILITY", "SOSTENIBILIDAD", "SOSTENIBILITA",
    "ENVIRONMENTAL COMMITMENT", "ECO-FRIENDLY", "ECO FRIENDLY",
    "RECYCLED CONTENT", "CARBON FOOTPRINT", "LEED CREDITS",
    "CIRCULAR ECONOMY", "GREEN BUILDING", "ENVIRONMENT",
]
INDEX_PAGE_KEYWORDS = [
    "COLLECTIONS INDEX", "PRODUCT INDEX", "INDICE", "INDEX",
    "CONTENTS", "TABLE OF CONTENTS", "SUMMARY",
]
BIO_KEYWORDS = [
    "DESIGN STUDIO", "DESIGNER PROFILE", "DESIGNED BY",
    "STUDIO PROFILE", "FOUNDED IN", "ABOUT THE DESIGNER",
]
_NUMERIC_TOKEN = "\\b[0-9]{1,4}[,.]?[0-9]{0,4}\\b"


def _norm(c: Column) -> Column:
    up = F.translate(F.upper(c), _ACC_FROM, _ACC_TO)
    collapsed = F.regexp_replace(up, _WS + "+", " ")
    return F.regexp_replace(collapsed, "^ +| +$", "")


def _hits(norm: Column, kws) -> Column:
    out = F.lit(0)
    for kw in kws:
        out = out + F.when(norm.contains(kw), 1).otherwise(0)
    return out


def classify_pages(pages: DataFrame, names: DataFrame) -> DataFrame:
    """pages: (doc_id, page_index, text, total_pages); names:
    (doc_id, name).  Emits (doc_id, page_index, page_type,
    matched_csv, packing_row)."""
    nn = names.select("doc_id", _norm(F.col("name")).alias("nn"),
                      F.col("name"))
    matched = (pages.join(nn, "doc_id")
               .where((F.col("nn") != "")
                      & _norm(F.col("text")).contains(F.col("nn")))
               .groupBy("doc_id", "page_index")
               .agg(F.array_join(F.array_sort(
                   F.collect_list("name")), ",").alias("matched_csv"),
                   F.count("*").alias("n_matched")))
    p = (pages.join(matched, ["doc_id", "page_index"], "left")
         .withColumn("matched_csv", F.coalesce("matched_csv", F.lit("")))
         .withColumn("n_matched", F.coalesce("n_matched", F.lit(0)))
         .withColumn("norm", _norm(F.col("text"))))
    norm = F.col("norm")
    has_name = F.col("n_matched") > 0
    words = F.size(F.filter(F.split(norm, " "), lambda w: w != ""))
    pos_cover = ((F.col("page_index") < 2)
                 | (F.col("page_index") >= F.col("total_pages") - 2))
    page_type = (
        F.when(norm == "", "other")
        .when((_hits(norm, SPEC_TABLE_KEYWORDS) >= 1) & has_name,
              "product_spec")
        .when((_hits(norm, LEGEND_ICONS_KEYWORDS) >= 2) & ~has_name,
              "legend_icons")
        .when(_hits(norm, LEGEND_CERTIFICATION_KEYWORDS) >= 2,
              "legend_certification")
        .when(_hits(norm, LEGEND_REGULATION_KEYWORDS) >= 2,
              "legend_regulation")
        .when(_hits(norm, LEGEND_INSTALLATION_KEYWORDS) >= 2,
              "legend_installation")
        .when(_hits(norm, LEGEND_CARE_KEYWORDS) >= 2, "legend_care")
        .when(_hits(norm, LEGEND_SUSTAINABILITY_KEYWORDS) >= 2,
              "legend_sustainability")
        .when(_hits(norm, INDEX_PAGE_KEYWORDS) >= 1, "index_page")
        .when((_hits(norm, BIO_KEYWORDS) >= 1) & ~has_name, "bio")
        .when(has_name, "product_photo")
        .when(pos_cover & (words < 50), "cover")
        .otherwise("other"))
    # matched names are reported for the types that return them
    reported = F.when(
        page_type.isin("product_spec", "legend_certification",
                       "legend_regulation", "legend_installation",
                       "legend_care", "legend_sustainability",
                       "product_photo"),
        F.col("matched_csv")).otherwise("")
    packing = ((norm.contains("PACKING") | norm.contains("BOX"))
               & (F.regexp_count(norm, F.lit(_NUMERIC_TOKEN)) >= 6))
    return p.select("doc_id", "page_index",
                    page_type.alias("page_type"),
                    reported.alias("matched_csv"),
                    packing.cast("string").alias("packing_row"))


def classify_sql() -> str:
    """DuckDB twin over CTEs pages_in (doc_id, page_index, text,
    total_pages) and names_in (doc_id, name)."""
    def norm(x):
        up = f"translate(upper({x}), '{_ACC_FROM}', '{_ACC_TO}')"
        return (f"regexp_replace(regexp_replace({up}, '{_WS}+', ' ', "
                f"'g'), '^ +| +$', '', 'g')")

    def hits(kws):
        return "(" + " + ".join(
            f"CASE WHEN contains(norm, '{k}') THEN 1 ELSE 0 END"
            for k in kws) + ")"

    return f"""
    nn AS (SELECT doc_id, name, {norm('name')} AS nrm FROM names_in),
    matched AS (SELECT p.doc_id, p.page_index,
                       array_to_string(list_sort(list(n.name)), ',')
                           AS matched_csv,
                       count(*) AS n_matched
                FROM pages_in p JOIN nn n ON n.doc_id = p.doc_id
                     AND n.nrm <> ''
                     AND contains({norm('p.text')}, n.nrm)
                GROUP BY 1, 2),
    base AS (SELECT p.doc_id, p.page_index, p.total_pages,
                    {norm('p.text')} AS norm,
                    coalesce(m.matched_csv, '') AS matched_csv,
                    coalesce(m.n_matched, 0) > 0 AS has_name
             FROM pages_in p
             LEFT JOIN matched m USING (doc_id, page_index)),
    typed AS (SELECT *, CASE
        WHEN norm = '' THEN 'other'
        WHEN {hits(SPEC_TABLE_KEYWORDS)} >= 1 AND has_name
            THEN 'product_spec'
        WHEN {hits(LEGEND_ICONS_KEYWORDS)} >= 2 AND NOT has_name
            THEN 'legend_icons'
        WHEN {hits(LEGEND_CERTIFICATION_KEYWORDS)} >= 2
            THEN 'legend_certification'
        WHEN {hits(LEGEND_REGULATION_KEYWORDS)} >= 2
            THEN 'legend_regulation'
        WHEN {hits(LEGEND_INSTALLATION_KEYWORDS)} >= 2
            THEN 'legend_installation'
        WHEN {hits(LEGEND_CARE_KEYWORDS)} >= 2 THEN 'legend_care'
        WHEN {hits(LEGEND_SUSTAINABILITY_KEYWORDS)} >= 2
            THEN 'legend_sustainability'
        WHEN {hits(INDEX_PAGE_KEYWORDS)} >= 1 THEN 'index_page'
        WHEN {hits(BIO_KEYWORDS)} >= 1 AND NOT has_name THEN 'bio'
        WHEN has_name THEN 'product_photo'
        WHEN (page_index < 2 OR page_index >= total_pages - 2)
             AND len(list_filter(string_split(norm, ' '),
                     w -> w <> '')) < 50 THEN 'cover'
        ELSE 'other' END AS page_type
        FROM base)
    SELECT doc_id, page_index, page_type,
           CASE WHEN page_type IN ('product_spec',
               'legend_certification', 'legend_regulation',
               'legend_installation', 'legend_care',
               'legend_sustainability', 'product_photo')
                THEN matched_csv ELSE '' END AS matched_csv,
           CAST((contains(norm, 'PACKING') OR contains(norm, 'BOX'))
                AND len(regexp_extract_all(norm,
                    '{_NUMERIC_TOKEN}')) >= 6 AS VARCHAR)
               AS packing_row
    FROM typed"""


# ---------------------------------------------------------------------------
# synthesized input


_PAGE_TEMPLATES = [
    # (text template; 'NA'/'NB' replaced by the doc's product names)
    "TECHNICAL CHARACTERISTICS of NA tiles 15 0,72 11.2 48 34,56 "
    "537.6 PACKING data",
    "slip resistance DIN 51130 pendulum legend sheet",
    "Water Absorption V3 grading for NA here",
    "certifications iso 9001 leed gold dossier",
    "EN 14411 and iso 10545 test methods annex",
    "installation guide grout adhesive notes",
    "care and maintenance neutral ph advice",
    "sustainability recycled content pledge",
    "product index contents listing NA NB",
    "designed by atelier nine founded in 1950",
    "NB hero shot full bleed",
    "",
    "Caractéristicas Técnicas generales sin nombre",
    "plain prose filler ",
]


def synth_layout_pages(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = (events.select((e % 30).alias("d"),
                          F.expr("event_id div 30").cast("int")
                          .alias("p"))
            .where(F.col("p") < 14))
    d, p = F.col("d"), F.col("p")
    text = None
    for i, t in enumerate(_PAGE_TEMPLATES):
        body = t
        cond = ((d + p) % 14 == i)
        c = F.when(cond, body)
        text = c if text is None else text.when(cond, body)
    text = text.otherwise("x")
    # long filler for the final template so 'other' (not cover) fires
    text = F.when((d + p) % 14 == 13,
                  F.concat(F.lit("plain prose filler "),
                           F.array_join(F.array_repeat(
                               F.lit("w"), 60), " "))).otherwise(text)
    # first/last pages: short covers
    text = (F.when(p == 0, F.lit("Colección"))
            .when(p == 13, F.lit("fin"))
            .otherwise(text))
    na = F.concat(F.lit("Val"), (d % 5).cast("string"), F.lit("A"))
    nb = F.concat(F.lit("Val"), (d % 5).cast("string"), F.lit("B"))
    text = F.replace(F.replace(text, F.lit("NA"), na),
                     F.lit("NB"), nb)
    return base.select(d.alias("doc_id"), p.alias("page_index"),
                       text.alias("text"),
                       F.lit(14).cast("int").alias("total_pages"))


def _tmpl_sql(i: int, t: str) -> str:
    return f"WHEN (d + p) % 14 = {i} THEN '{t}'"


SYNTH_LAYOUT_PAGES_SQL = f"""
SELECT d AS doc_id, p AS page_index,
       replace(replace(
           CASE WHEN p = 0 THEN 'Colección'
                WHEN p = 13 THEN 'fin'
                WHEN (d + p) % 14 = 13
                    THEN 'plain prose filler ' || repeat('w ', 59)
                         || 'w'
                {' '.join(_tmpl_sql(i, t)
                          for i, t in enumerate(_PAGE_TEMPLATES[:13]))}
                ELSE 'x' END,
           'NA', 'Val' || (d % 5) || 'A'),
           'NB', 'Val' || (d % 5) || 'B') AS text,
       CAST(14 AS INT) AS total_pages
FROM (SELECT event_id % 30 AS d,
             CAST(event_id // 30 AS INT) AS p FROM events)
WHERE p < 14"""


def synth_layout_names(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = (events.select((e % 30).alias("d"),
                          F.expr("(event_id div 30) % 2").cast("int")
                          .alias("k")).distinct())
    d, k = F.col("d"), F.col("k")
    return base.select(
        d.alias("doc_id"),
        F.concat(F.lit("Val"), (d % 5).cast("string"),
                 F.when(k == 0, "A").otherwise("B")).alias("name"))


SYNTH_LAYOUT_NAMES_SQL = """
SELECT d AS doc_id,
       'Val' || (d % 5) || (CASE WHEN k = 0 THEN 'A' ELSE 'B' END)
           AS name
FROM (SELECT DISTINCT event_id % 30 AS d,
             CAST((event_id // 30) % 2 AS INT) AS k FROM events)"""
