"""LLM mention-probe folds: probe bank, deterministic extraction,
visibility snapshot.

Reference: ``app/services/integrations/llm_mention_probe_service.py``

- ``build_probes`` (:67-103): the 4-template bank with facet
  interpolation — product_type defaults to 'products', brand to the
  label, the comparison competitor string joins the first 3
  competitor brands or 'leading alternatives'.
- ``_extract_deterministic`` (:506-533): mentioned = any normalized
  alias substring of the normalized text; position = the FIRST
  numbered-list line (``\\s*(\\d+)[.):]\\s*(.+)`` re.match) whose
  remainder contains an alias; naive sentiment = positive/negative
  keyword SUBSTRING counts over the normalized text ('top' matches
  inside 'laptop' — pinned), only evaluated when mentioned;
  competitors_mentioned is just facets.competitor_brands[:5].
- ``visibility_snapshot`` (:209-285): per-model probes/mentioned
  counts, positions collected only when mentioned AND position truthy
  (a 0 rank is dropped — pinned), samples capped at 4 per model in
  row order, competitor counts over stripped non-empty names,
  share_of_voice = mentioned/total, avg_position over collected
  positions, top-10 competitors by count desc with FIRST-SEEN order
  breaking ties (Python's stable sort over dict insertion order).

Scale: template fan-out and extraction are map-side; the snapshot is
a groupBy per (mention, model) plus one per-mention rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from mivaa_pdf_extractor_spark.operators.mentions import normalize_text

POS_WORDS = ("best", "excellent", "premium", "highly recommended",
             "top", "leader")
NEG_WORDS = ("avoid", "poor", "bad", "issue", "problem", "expensive")

LINE_RE = r"^\s*(\d+)[.):]\s*(.+)"


def build_probes(subjects: DataFrame) -> DataFrame:
    """``subjects``: (subject_id long, label string, product_type
    string?, brand string?, competitor_brands array<string>?)."""
    label = F.col("label")
    ptype = F.coalesce(F.nullif(F.col("product_type"), F.lit("")),
                       F.lit("products"))
    brand = F.coalesce(F.nullif(F.col("brand"), F.lit("")), label)
    comp = F.when(
        F.size(F.coalesce(F.col("competitor_brands"),
                          F.array().cast("array<string>"))) > 0,
        F.array_join(F.slice(F.col("competitor_brands"), 1, 3), ", ")
    ).otherwise(F.lit("leading alternatives"))
    probes = F.array(
        F.struct(F.lit("generic_recommendation").alias("key"),
                 F.concat(F.lit("What are the best "), ptype,
                          F.lit(" brands? Give a ranked list with "
                                "one short reason per entry."))
                 .alias("prompt")),
        F.struct(F.lit("use_case").alias("key"),
                 F.concat(F.lit("Recommend 5 "), ptype,
                          F.lit(" for use in a high-traffic "
                                "commercial space. Name them and "
                                "briefly explain each."))
                 .alias("prompt")),
        F.struct(F.lit("comparison").alias("key"),
                 F.concat(F.lit("Compare "), brand, F.lit(" with "),
                          comp,
                          F.lit(". Cover product range, quality, "
                                "and typical price tier."))
                 .alias("prompt")),
        F.struct(F.lit("direct_lookup").alias("key"),
                 F.concat(F.lit("Tell me about "), label,
                          F.lit(". What do they make and what are "
                                "they known for?"))
                 .alias("prompt")))
    return (subjects.select("subject_id",
                            F.posexplode(probes).alias("pos", "p"))
            .select("subject_id", F.col("pos").cast("int")
                    .alias("probe_ord"),
                    F.col("p.key").alias("key"),
                    F.col("p.prompt").alias("prompt")))


def extract_deterministic(responses: DataFrame) -> DataFrame:
    """``responses``: (resp_id long, text string, aliases
    array<string>, competitor_brands array<string>)."""
    nt = normalize_text(F.coalesce(F.col("text"), F.lit("")))
    aliases_n = F.transform(
        F.coalesce(F.col("aliases"), F.array().cast("array<string>")),
        normalize_text)
    mentioned = F.exists(aliases_n, lambda a: nt.contains(a))
    lines = F.split(F.coalesce(F.col("text"), F.lit("")), "\n")
    line_hits = F.filter(
        F.transform(lines, lambda ln: F.struct(
            F.regexp_extract(ln, LINE_RE, 1).alias("num"),
            normalize_text(F.regexp_extract(ln, LINE_RE, 2))
            .alias("rest"))),
        lambda s: (s["num"] != "")
        & F.exists(aliases_n, lambda a: s["rest"].contains(a)))
    position = F.when(
        mentioned & (F.size(line_hits) > 0),
        F.element_at(line_hits, 1)["num"].cast("int"))
    pos_n = sum((F.when(nt.contains(w), 1).otherwise(0)
                 for w in POS_WORDS), F.lit(0))
    neg_n = sum((F.when(nt.contains(w), 1).otherwise(0)
                 for w in NEG_WORDS), F.lit(0))
    score = pos_n - neg_n
    sentiment = F.when(
        mentioned,
        F.when(score > 0, F.lit("positive"))
        .when(score < 0, F.lit("negative"))
        .otherwise(F.lit("neutral"))).otherwise(F.lit("neutral"))
    return responses.select(
        "resp_id", mentioned.alias("mentioned"),
        position.alias("position"), sentiment.alias("sentiment"),
        F.slice(F.coalesce(F.col("competitor_brands"),
                           F.array().cast("array<string>")), 1, 5)
        .alias("competitors_mentioned"))


def snapshot_models(probes: DataFrame) -> DataFrame:
    """``probes``: (mention_id long, row_ord int, model string,
    mentioned boolean, position int?, competitors array<string>).
    Per-model aggregates."""
    pos_ok = F.col("mentioned") & F.coalesce(F.col("position") != 0,
                                             F.lit(False))
    g = probes.groupBy("mention_id", "model").agg(
        F.count(F.lit(1)).alias("probes"),
        F.sum(F.when(F.col("mentioned"), 1).otherwise(0))
        .alias("mentioned_count"),
        F.sort_array(F.collect_list(F.when(pos_ok, F.struct(
            F.col("row_ord").alias("o"),
            F.col("position").alias("p"))))).alias("_ps"),
        F.least(F.count(F.lit(1)), F.lit(4)).alias("sample_count"))
    positions = F.transform(F.col("_ps"), lambda s: s["p"])
    return g.select(
        "mention_id", "model", "probes", "mentioned_count",
        positions.alias("positions"),
        F.col("sample_count").cast("int").alias("sample_count"))


def snapshot_run(probes: DataFrame) -> DataFrame:
    """Run-level rollup + top-10 competitors (count desc, first-seen
    asc; encoded 'name:count')."""
    comp = (probes.select(
        "mention_id", "row_ord",
        F.posexplode(F.coalesce(F.col("competitors"),
                                F.array().cast("array<string>")))
        .alias("cpos", "cname"))
        .select("mention_id", "row_ord", "cpos",
                F.trim(F.coalesce(F.col("cname"), F.lit("")))
                .alias("cname"))
        .where(F.col("cname") != ""))
    cagg = (comp.groupBy("mention_id", "cname")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.min(F.col("row_ord") * 1000 + F.col("cpos"))
                 .alias("first_seen")))
    top = (cagg.groupBy("mention_id")
           .agg(F.slice(F.transform(
               F.sort_array(F.collect_list(F.struct(
                   (-F.col("cnt")).alias("nc"),
                   F.col("first_seen").alias("fs"),
                   F.col("cname").alias("n"),
                   F.col("cnt").alias("c")))),
               lambda s: F.concat(s["n"], F.lit(":"),
                                  s["c"].cast("string"))), 1, 10)
               .alias("top_competitors")))
    pos_ok = F.col("mentioned") & F.coalesce(F.col("position") != 0,
                                             F.lit(False))
    base = probes.groupBy("mention_id").agg(
        F.count(F.lit(1)).alias("total_probes"),
        F.sum(F.when(F.col("mentioned"), 1).otherwise(0))
        .alias("_m"),
        F.sum(F.when(pos_ok, F.col("position"))).alias("_psum"),
        F.count(F.when(pos_ok, F.lit(1))).alias("_pn"))
    return (base.join(top, "mention_id", "left")
            .select(
                "mention_id", "total_probes",
                (F.col("_m") / F.col("total_probes"))
                .alias("share_of_voice"),
                F.when(F.col("_pn") > 0,
                       F.col("_psum") / F.col("_pn"))
                .alias("avg_position"),
                F.coalesce(F.col("top_competitors"),
                           F.array().cast("array<string>"))
                .alias("top_competitors")))


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

RESPONSE_TEXTS = (
    "1. Acme Tiles — solid choice\n2) BetaCorp: fine\n3: Gamma",
    "We recommend BetaCorp. Acme is expensive but premium.",
    "Top brands:\n1. BetaCorp\n2. Acme Group",
    " 12) acme tiles are the best laptop-adjacent choice",
    "Avoid ACME — poor quality, many issues reported.",
    "",
)


def synth_probe_subjects(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    m = F.col("doc")
    comp = (F.when(m % 4 == 0, F.lit(None).cast("array<string>"))
            .when(m % 4 == 1, F.array().cast("array<string>"))
            .when(m % 4 == 2, F.array(F.lit("BetaCorp"),
                                      F.lit("Gamma")))
            .otherwise(F.array(F.lit("BetaCorp"), F.lit("Gamma"),
                               F.lit("Delta"), F.lit("Epsilon"))))
    return d.select(
        m.alias("subject_id"),
        F.concat(F.lit("Acme "), (m % 9).cast("string"))
        .alias("label"),
        F.when(m % 3 == 0, F.lit("")).when(m % 3 == 1,
                                           F.lit("ceramic tiles"))
        .otherwise(F.lit(None).cast("string")).alias("product_type"),
        F.when(m % 5 == 0, F.lit("AcmeBrand")).otherwise(F.lit(""))
        .alias("brand"),
        comp.alias("competitor_brands"))


def synth_probe_responses(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    m = F.col("doc")
    return d.select(
        m.alias("resp_id"),
        F.element_at(F.array(*[F.lit(t) for t in RESPONSE_TEXTS]),
                     (m % 6 + 1).cast("int")).alias("text"),
        F.array(F.lit("Acme"), F.lit("Acme Tiles")).alias("aliases"),
        F.when(m % 3 == 0, F.array(F.lit("BetaCorp"), F.lit("Gamma"),
                                   F.lit("D"), F.lit("E"), F.lit("F"),
                                   F.lit("G")))
        .otherwise(F.array(F.lit("BetaCorp")))
        .alias("competitor_brands"))


def synth_probe_rows(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    m = F.col("doc")
    return d.select(
        (m % 40).alias("mention_id"),
        (m % 997).cast("int").alias("row_ord"),
        F.element_at(F.array(F.lit("haiku"), F.lit("gpt-4o-mini"),
                             F.lit("gemini-flash"), F.lit("sonar")),
                     (m % 4 + 1).cast("int")).alias("model"),
        (m % 3 != 0).alias("mentioned"),
        F.when(m % 5 == 0, F.lit(None).cast("int"))
        .when(m % 5 == 1, F.lit(0))
        .otherwise((m % 9 + 1).cast("int")).alias("position"),
        F.when(m % 7 == 0, F.array(F.lit(" BetaCorp "), F.lit(""),
                                   F.lit("Gamma")))
        .when(m % 7 == 1, F.lit(None).cast("array<string>"))
        .otherwise(F.array(F.lit("Gamma"))).alias("competitors"))


def _lit_texts_sql() -> str:
    return "[" + ", ".join(
        "'" + t.replace("'", "''").replace("\n", "' || chr(10) || '")
        + "'" for t in RESPONSE_TEXTS) + "]"


DUCK_PROBE_SUBJECTS_SQL = """
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
psubj AS (
  SELECT doc AS subject_id,
         'Acme ' || CAST(doc % 9 AS VARCHAR) AS label,
         CASE WHEN doc % 3 = 0 THEN ''
              WHEN doc % 3 = 1 THEN 'ceramic tiles' END
           AS product_type,
         CASE WHEN doc % 5 = 0 THEN 'AcmeBrand' ELSE '' END AS brand,
         CASE WHEN doc % 4 = 0 THEN NULL
              WHEN doc % 4 = 1 THEN CAST([] AS VARCHAR[])
              WHEN doc % 4 = 2 THEN ['BetaCorp', 'Gamma']
              ELSE ['BetaCorp', 'Gamma', 'Delta', 'Epsilon']
         END AS competitor_brands
  FROM docs)"""

DUCK_PROBE_BUILD_SQL = """
pnorm AS (
  SELECT subject_id, label,
         coalesce(nullif(product_type, ''), 'products') AS ptype,
         coalesce(nullif(brand, ''), label) AS b,
         CASE WHEN len(coalesce(competitor_brands,
                                CAST([] AS VARCHAR[]))) > 0
              THEN array_to_string(list_slice(competitor_brands,
                                              1, 3), ', ')
              ELSE 'leading alternatives' END AS comp
  FROM psubj),
pbank AS (
  SELECT subject_id, 0 AS probe_ord,
         'generic_recommendation' AS key,
         'What are the best ' || ptype || ' brands? Give a ranked '
         || 'list with one short reason per entry.' AS prompt
  FROM pnorm
  UNION ALL
  SELECT subject_id, 1, 'use_case',
         'Recommend 5 ' || ptype || ' for use in a high-traffic '
         || 'commercial space. Name them and briefly explain each.'
  FROM pnorm
  UNION ALL
  SELECT subject_id, 2, 'comparison',
         'Compare ' || b || ' with ' || comp || '. Cover product '
         || 'range, quality, and typical price tier.'
  FROM pnorm
  UNION ALL
  SELECT subject_id, 3, 'direct_lookup',
         'Tell me about ' || label || '. What do they make and what '
         || 'are they known for?'
  FROM pnorm)"""


def duck_probe_extract_sql() -> str:
    norm = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"
    texts = _lit_texts_sql()
    pos_terms = " + ".join(
        f"CASE WHEN contains(nt, '{w}') THEN 1 ELSE 0 END"
        for w in POS_WORDS)
    neg_terms = " + ".join(
        f"CASE WHEN contains(nt, '{w}') THEN 1 ELSE 0 END"
        for w in NEG_WORDS)
    return f"""
presp AS (
  SELECT doc AS resp_id,
         ({texts})[CAST(doc % 6 AS INT) + 1] AS text,
         ['Acme', 'Acme Tiles'] AS aliases,
         CASE WHEN doc % 3 = 0
              THEN ['BetaCorp','Gamma','D','E','F','G']
              ELSE ['BetaCorp'] END AS competitor_brands
  FROM docs),
pnt AS (
  SELECT *, {norm.format(x="coalesce(text, '')")} AS nt,
         list_transform(aliases,
           a -> {norm.format(x='a')}) AS al
  FROM presp),
pment AS (
  SELECT *, len(list_filter(al, a -> contains(nt, a))) > 0
           AS mentioned
  FROM pnt),
plines AS (
  SELECT resp_id, i,
         regexp_extract(ln, '{LINE_RE}', 1) AS num,
         {norm.format(x=f"regexp_extract(ln, '{LINE_RE}', 2)")}
           AS rest
  FROM (SELECT resp_id,
               unnest(generate_series(1, len(string_split(
                   coalesce(text, ''), chr(10))))) AS i,
               string_split(coalesce(text, ''), chr(10)) AS ls
        FROM pment), LATERAL (SELECT ls[i] AS ln)),
phit AS (
  SELECT l.resp_id, l.num
  FROM plines l JOIN pment m ON l.resp_id = m.resp_id
  WHERE l.num != ''
    AND len(list_filter(m.al, a -> contains(l.rest, a))) > 0
  QUALIFY row_number() OVER (PARTITION BY l.resp_id ORDER BY l.i)
          = 1),
pextract AS (
  SELECT m.resp_id, m.mentioned,
         CASE WHEN m.mentioned THEN CAST(h.num AS INT) END
           AS position,
         CASE WHEN m.mentioned THEN
           CASE WHEN ({pos_terms}) - ({neg_terms}) > 0
                  THEN 'positive'
                WHEN ({pos_terms}) - ({neg_terms}) < 0
                  THEN 'negative'
                ELSE 'neutral' END
           ELSE 'neutral' END AS sentiment,
         list_slice(coalesce(m.competitor_brands,
                             CAST([] AS VARCHAR[])), 1, 5)
           AS competitors_mentioned
  FROM pment m LEFT JOIN phit h ON m.resp_id = h.resp_id)"""


DUCK_PROBE_ROWS_SQL = """
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
prow AS (
  SELECT doc % 40 AS mention_id, CAST(doc % 997 AS INT) AS row_ord,
         (['haiku','gpt-4o-mini','gemini-flash','sonar'])
           [CAST(doc % 4 AS INT) + 1] AS model,
         doc % 3 != 0 AS mentioned,
         CASE WHEN doc % 5 = 0 THEN NULL
              WHEN doc % 5 = 1 THEN 0
              ELSE CAST(doc % 9 + 1 AS INT) END AS position,
         CASE WHEN doc % 7 = 0 THEN [' BetaCorp ', '', 'Gamma']
              WHEN doc % 7 = 1 THEN NULL
              ELSE ['Gamma'] END AS competitors
  FROM docs)"""

DUCK_SNAPSHOT_MODELS_SQL = """
pmod AS (
  SELECT mention_id, model,
         count(*) AS probes,
         CAST(sum(CASE WHEN mentioned THEN 1 ELSE 0 END)
              AS BIGINT) AS mentioned_count,
         coalesce(list_filter(array_agg(
             CASE WHEN mentioned AND coalesce(position != 0, false)
                  THEN position END ORDER BY row_ord),
           x -> x IS NOT NULL), CAST([] AS INT[])) AS positions,
         CAST(LEAST(count(*), 4) AS INT) AS sample_count
  FROM prow GROUP BY mention_id, model)"""

DUCK_SNAPSHOT_RUN_SQL = """
pcomp AS (
  SELECT mention_id, row_ord, ci,
         trim(coalesce(competitors[ci], '')) AS cname
  FROM (SELECT *, unnest(generate_series(1,
            len(coalesce(competitors, CAST([] AS VARCHAR[])))))
            AS ci
        FROM prow)),
pcagg AS (
  SELECT mention_id, cname, count(*) AS cnt,
         min(row_ord * 1000 + ci - 1) AS first_seen
  FROM pcomp WHERE cname != ''
  GROUP BY mention_id, cname),
ptop AS (
  SELECT mention_id,
         list_slice(array_agg(cname || ':' || CAST(cnt AS VARCHAR)
                    ORDER BY cnt DESC, first_seen), 1, 10)
           AS top_competitors
  FROM pcagg GROUP BY mention_id),
prun AS (
  SELECT b.mention_id, b.total_probes,
         b.m / CAST(b.total_probes AS DOUBLE) AS share_of_voice,
         CASE WHEN b.pn > 0 THEN b.psum / CAST(b.pn AS DOUBLE) END
           AS avg_position,
         coalesce(t.top_competitors, CAST([] AS VARCHAR[]))
           AS top_competitors
  FROM (SELECT mention_id, count(*) AS total_probes,
               sum(CASE WHEN mentioned THEN 1 ELSE 0 END) AS m,
               sum(CASE WHEN mentioned
                        AND coalesce(position != 0, false)
                   THEN position END) AS psum,
               count(CASE WHEN mentioned
                          AND coalesce(position != 0, false)
                     THEN 1 END) AS pn
        FROM prow GROUP BY mention_id) b
  LEFT JOIN ptop t ON b.mention_id = t.mention_id)"""
