"""Search suggestions tier — autocomplete funnel, typo corrections,
query expansion (reference ``app/services/search/
search_suggestions_service.py``).

Semantics pinned:

- ``get_autocomplete_suggestions`` (:51-138): FIVE source tiers in
  order — database suggestions (active, PREFIX ilike, popularity
  desc), trending (substring ilike, daily window, trend_score desc,
  score min(trend/100, 1)), recent (user's analytics rows, substring,
  created_at desc, score 0.7), popular (substring, search_count desc,
  score min(count/100, 1)), product names (substring, score 0.8) —
  each receiving the REMAINING budget (limit minus raw rows collected
  so far — dedup happens AFTER budgeting, so duplicates still consume
  budget; realized as contributed_t = min(L, S_t) - min(L, S_{t-1})
  over the tier cumsum); then case-insensitive keep-FIRST dedup in
  funnel order, a STABLE sort by popularity desc (ties keep funnel
  order), and the final limit.
- ``check_typos`` (:329-370): known corrections (exact lowercase
  match, confidence desc, top 3) + abbreviation expansions (each
  occurrence of an abbreviation word yields one correction at 0.85 /
  acceptance 0.7) + fuzzy matches against recent analytics queries
  (difflib SequenceMatcher ratio >= 0.75, exact lowercase matches
  skipped, top 3) — concatenated, STABLE-sorted by confidence desc
  (ties keep known < abbreviation < fuzzy order), truncated to 3;
  the top correction auto-applies at confidence >= 0.9.  The fuzzy
  tier is the genuinely non-SQL-expressible part (same as the T5
  seqratio case): ``check_typos(..., include_fuzzy=False)`` is the
  hash-matched contract; the full version reuses the
  sequence_ratio_pairs arrow kernel and is pinned by pytest.
- ``expand_query`` (:466-545, use_ai=False path): per-word synonym
  lookup over the 8-entry map (first 3 per word; repeated words
  re-extend expanded_terms but the dict keeps one entry — pinned by
  rendering distinct words in first-occurrence order); expanded_terms
  is a Python set (rendered SORTED); related concepts = flattened
  follow_up_queries of substring-matching analytics rows, counted,
  most_common(5) with first-insertion ties (count desc, then first
  global ordinal); confidence 0.8.

Scale: every tier is a broadcastable join of the (small) query table
against one source table with per-tier window ranks; the budget fold
is a 5-row-per-query cumsum; dedup and the final sort are
per-query windows over <= 5 x limit rows.  The fuzzy tier is the
only Python kernel (arrow-batched, id pairs only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

SYNONYMS = {
    "fire": ["flame", "heat", "thermal"],
    "water": ["moisture", "liquid", "aqua"],
    "resistant": ["proof", "repellent", "protective"],
    "tile": ["tiles", "tiling", "ceramic"],
    "wood": ["wooden", "timber", "lumber"],
    "stone": ["rock", "marble", "granite"],
    "floor": ["flooring", "ground", "surface"],
    "wall": ["walls", "partition", "surface"],
}
ABBREVIATIONS = {"res": "resistant", "cert": "certificate",
                 "spec": "specification", "dim": "dimension",
                 "mat": "material"}
FUZZY_THRESHOLD = 0.75
AUTO_APPLY = 0.9
MAX_SUGGESTIONS = 3


def autocomplete(queries: DataFrame, suggestions: DataFrame,
                 trending: DataFrame, analytics: DataFrame,
                 popular: DataFrame, products: DataFrame) -> DataFrame:
    """queries: (qid, q, lim, user_id, category).  Emits the final
    ranked suggestions (qid, position, suggestion_text,
    suggestion_type, popularity_score)."""
    # round 6: persist the fan-out frames — the slim query side feeds
    # five tier joins (each otherwise re-running the queries synth),
    # and the tier union feeds both the budget aggregation and the
    # budget-filtered keep (each otherwise re-running all five joins;
    # measured plan: 51 Exchanges / 44 source scans for this query).
    # The two budget/limit joins downstream reuse the cached slim side.
    from ..core.cache import track
    q = track(queries.select("qid", F.lower("q").alias("ql"), "lim",
                             "user_id", "category"))

    def tier(df, n):
        w = Window.partitionBy("qid").orderBy(*df[1])
        return df[0].select(
            "qid", F.lit(n).alias("tier"),
            F.col("text").alias("suggestion_text"),
            F.lit(df[2]).alias("suggestion_type"),
            df[3].alias("popularity_score"),
            F.row_number().over(w).alias("rk"))

    t1 = (q.join(suggestions.where("is_active"),
                 F.lower(suggestions["suggestion_text"])
                 .startswith(F.col("ql"))
                 & (q["category"].isNull()
                    | (q["category"] == suggestions["category"])))
          .select("qid", F.col("suggestion_text").alias("text"),
                  "popularity_score", "sid"))
    t1 = tier((t1, [F.desc("popularity_score"), F.asc("sid")],
               "database", F.col("popularity_score")), 1)
    t2 = (q.join(trending.where(F.col("time_window") == "daily"),
                 F.lower(trending["query_text"]).contains(F.col("ql")))
          .select("qid", F.col("query_text").alias("text"),
                  "trend_score", "tid"))
    t2 = tier((t2, [F.desc("trend_score"), F.asc("tid")], "trending",
               F.least(F.col("trend_score") / 100.0, F.lit(1.0))), 2)
    t3 = (q.where(F.col("user_id").isNotNull())
          .join(analytics,
                (q["user_id"] == analytics["user_id"])
                & F.lower(analytics["query_text"]).contains(F.col("ql")))
          .select("qid", F.col("query_text").alias("text"),
                  "created_at", "aid"))
    t3 = tier((t3, [F.desc("created_at"), F.asc("aid")], "recent",
               F.lit(0.7)), 3)
    t4 = (q.join(popular,
                 F.lower(popular["query_text"]).contains(F.col("ql")))
          .select("qid", F.col("query_text").alias("text"),
                  "search_count"))
    t4 = tier((t4, [F.desc("search_count"), F.asc("text")], "popular",
               F.least(F.col("search_count") / 100.0, F.lit(1.0))), 4)
    t5 = (q.join(products,
                 F.lower(products["name"]).contains(F.col("ql")))
          .select("qid", F.col("name").alias("text"), "pid"))
    t5 = tier((t5, [F.asc("pid")], "product", F.lit(0.8)), 5)

    cands = track(t1.unionByName(t2).unionByName(t3).unionByName(t4)
                  .unionByName(t5))
    avail = cands.groupBy("qid", "tier").agg(F.count("*").alias("a"))
    wt = Window.partitionBy("qid").orderBy("tier")
    cum = avail.withColumn("s_t", F.sum("a").over(wt))
    budgets = (cum.join(q.select("qid", "lim"), "qid")
               .withColumn("c_t", F.least("s_t", F.col("lim")))
               .withColumn("c_prev", F.coalesce(
                   F.lag("c_t").over(wt), F.lit(0)))
               .select("qid", "tier",
                       (F.col("c_t") - F.col("c_prev")).alias("take")))
    kept = (cands.join(budgets, ["qid", "tier"])
            .where(F.col("rk") <= F.col("take")))
    # keep-first dedup by lowercase text, funnel (tier, rk) order
    first = (kept.groupBy("qid", F.lower("suggestion_text").alias("k"))
             .agg(F.min(F.struct("tier", "rk", "suggestion_text",
                                 "suggestion_type",
                                 "popularity_score")).alias("w")))
    wo = Window.partitionBy("qid").orderBy(
        F.desc(F.col("w")["popularity_score"]), F.col("w")["tier"],
        F.col("w")["rk"])
    ranked = first.withColumn("position", F.row_number().over(wo))
    return (ranked.join(q.select("qid", "lim"), "qid")
            .where(F.col("position") <= F.col("lim"))
            .select("qid", "position",
                    F.col("w")["suggestion_text"]
                    .alias("suggestion_text"),
                    F.col("w")["suggestion_type"]
                    .alias("suggestion_type"),
                    F.col("w")["popularity_score"]
                    .alias("popularity_score")))


def autocomplete_sql() -> str:
    """DuckDB twin over CTEs queries_in, suggestions_in, trending_in,
    analytics_in, popular_in, products_in."""
    return """
    qn AS (SELECT qid, lower(q) AS ql, lim, user_id, category
           FROM queries_in),
    t1 AS (SELECT q.qid, 1 AS tier, s.suggestion_text,
                  'database' AS suggestion_type,
                  s.popularity_score,
                  row_number() OVER (PARTITION BY q.qid
                      ORDER BY s.popularity_score DESC, s.sid) AS rk
           FROM qn q JOIN suggestions_in s
                ON s.is_active
                   AND starts_with(lower(s.suggestion_text), q.ql)
                   AND (q.category IS NULL
                        OR q.category = s.category)),
    t2 AS (SELECT q.qid, 2 AS tier, t.query_text AS suggestion_text,
                  'trending' AS suggestion_type,
                  least(t.trend_score / CAST(100.0 AS DOUBLE),
                        CAST(1.0 AS DOUBLE)) AS popularity_score,
                  row_number() OVER (PARTITION BY q.qid
                      ORDER BY t.trend_score DESC, t.tid) AS rk
           FROM qn q JOIN trending_in t
                ON t.time_window = 'daily'
                   AND contains(lower(t.query_text), q.ql)),
    t3 AS (SELECT q.qid, 3 AS tier, a.query_text AS suggestion_text,
                  'recent' AS suggestion_type,
                  CAST(0.7 AS DOUBLE) AS popularity_score,
                  row_number() OVER (PARTITION BY q.qid
                      ORDER BY a.created_at DESC, a.aid) AS rk
           FROM qn q JOIN analytics_in a
                ON q.user_id IS NOT NULL
                   AND a.user_id = q.user_id
                   AND contains(lower(a.query_text), q.ql)),
    t4 AS (SELECT q.qid, 4 AS tier, p.query_text AS suggestion_text,
                  'popular' AS suggestion_type,
                  least(p.search_count / CAST(100.0 AS DOUBLE),
                        CAST(1.0 AS DOUBLE)) AS popularity_score,
                  row_number() OVER (PARTITION BY q.qid
                      ORDER BY p.search_count DESC, p.query_text) AS rk
           FROM qn q JOIN popular_in p
                ON contains(lower(p.query_text), q.ql)),
    t5 AS (SELECT q.qid, 5 AS tier, p.name AS suggestion_text,
                  'product' AS suggestion_type,
                  CAST(0.8 AS DOUBLE) AS popularity_score,
                  row_number() OVER (PARTITION BY q.qid
                      ORDER BY p.pid) AS rk
           FROM qn q JOIN products_in p
                ON contains(lower(p.name), q.ql)),
    cands AS (SELECT * FROM t1 UNION ALL SELECT * FROM t2
              UNION ALL SELECT * FROM t3 UNION ALL SELECT * FROM t4
              UNION ALL SELECT * FROM t5),
    avail AS (SELECT qid, tier, count(*) AS a FROM cands
              GROUP BY 1, 2),
    budgets AS (SELECT qid, tier,
                       least(sum(a) OVER w, lim)
                       - coalesce(least(sum(a) OVER w - a, lim), 0)
                           AS take
                FROM avail JOIN queries_in USING (qid)
                WINDOW w AS (PARTITION BY qid ORDER BY tier)),
    kept AS (SELECT c.* FROM cands c JOIN budgets b
             USING (qid, tier) WHERE c.rk <= b.take),
    first_k AS (SELECT qid, lower(suggestion_text) AS k,
                       min(struct_pack(tier := tier, rk := rk,
                           t := suggestion_text,
                           ty := suggestion_type,
                           ps := popularity_score)) AS w
                FROM kept GROUP BY 1, 2),
    ranked AS (SELECT qid, w,
                      row_number() OVER (PARTITION BY qid
                          ORDER BY (w).ps DESC, (w).tier, (w).rk)
                          AS position
               FROM first_k)
    SELECT r.qid, r.position, (r.w).t AS suggestion_text,
           (r.w).ty AS suggestion_type, (r.w).ps AS popularity_score
    FROM ranked r JOIN queries_in q USING (qid)
    WHERE r.position <= q.lim"""


# ---------------------------------------------------------------------------
# typo corrections


def check_typos(queries: DataFrame, corrections: DataFrame,
                analytics: DataFrame,
                include_fuzzy: bool = True) -> DataFrame:
    """queries: (qid, q).  Emits the final corrections (qid, position,
    corrected_query, correction_type, confidence_score, auto_applied,
    acceptance_rate)."""
    ql = F.lower("q")
    known = (queries.join(
        corrections, F.lower(queries["q"]) == corrections["original_query"])
        .select("qid", F.lit(1).alias("src"),
                F.col("corrected_query"), F.col("correction_type"),
                F.col("confidence_score"),
                F.col("acceptance_rate"),
                F.row_number().over(
                    Window.partitionBy("qid").orderBy(
                        F.desc("confidence_score"), F.asc("cid")))
                .alias("rk"))
        .where(F.col("rk") <= 3))
    words = F.split(ql, " ")
    amap = F.create_map(*[F.lit(x) for kv in ABBREVIATIONS.items()
                          for x in kv])
    expand = queries.select(
        "qid", words.alias("ws"),
        F.posexplode(words).alias("i", "w")).where(
        F.element_at(amap, F.col("w")).isNotNull())
    abbrev = expand.select(
        "qid", F.lit(2).alias("src"),
        F.array_join(F.transform(
            "ws", lambda w, j: F.when(j == F.col("i"),
                                      F.element_at(amap, F.col("w")))
            .otherwise(w)), " ").alias("corrected_query"),
        F.lit("abbreviation").alias("correction_type"),
        F.lit(0.85).alias("confidence_score"),
        F.lit(0.7).alias("acceptance_rate"),
        (F.col("i") + 1).alias("rk"))
    cands = known.unionByName(abbrev)
    if include_fuzzy:
        from mivaa_pdf_extractor_spark.operators.text_analysis import \
            sequence_ratio_pairs
        pairs = (queries.join(
            analytics.select("aid", "query_text"),
            F.lower(queries["q"]) != F.lower(analytics["query_text"]))
            .select("qid", "aid", F.col("q").alias("text_a"),
                    F.col("query_text").alias("text_b"),
                    F.lower("q").alias("la"),
                    F.lower("query_text").alias("lb")))
        # ratio over the lowered+stripped strings (case_sensitive=False)
        scored = sequence_ratio_pairs(
            pairs.select("qid", "aid",
                         F.trim("la").alias("text_a"),
                         F.trim("lb").alias("text_b"),
                         F.col("text_b").alias("orig_b")))
        fz = (scored.where(F.col("seq_ratio") >= FUZZY_THRESHOLD)
              .select("qid", F.lit(3).alias("src"),
                      F.col("orig_b").alias("corrected_query"),
                      F.lit("spelling").alias("correction_type"),
                      F.col("seq_ratio").alias("confidence_score"),
                      F.lit(0.6).alias("acceptance_rate"),
                      F.row_number().over(
                          Window.partitionBy("qid").orderBy(
                              F.desc("seq_ratio"), F.asc("aid")))
                      .alias("rk"))
              .where(F.col("rk") <= 3))
        cands = cands.unionByName(fz)
    wq = Window.partitionBy("qid").orderBy(
        F.desc("confidence_score"), "src", "rk")
    ranked = (cands.withColumn("position", F.row_number().over(wq))
              .where(F.col("position") <= MAX_SUGGESTIONS))
    return ranked.select(
        "qid", "position", "corrected_query", "correction_type",
        "confidence_score",
        ((F.col("position") == 1)
         & (F.col("confidence_score") >= AUTO_APPLY)).cast("string")
        .alias("auto_applied"),
        "acceptance_rate")


def check_typos_sql() -> str:
    """DuckDB twin (include_fuzzy=False path) over CTEs queries_in,
    corrections_in."""
    amap_when = " ".join(f"WHEN w = '{k}' THEN '{v}'"
                         for k, v in ABBREVIATIONS.items())
    akeys = ", ".join(f"'{k}'" for k in ABBREVIATIONS)
    return f"""
    known AS (SELECT q.qid, 1 AS src, c.corrected_query,
                     c.correction_type, c.confidence_score,
                     c.acceptance_rate,
                     row_number() OVER (PARTITION BY q.qid
                         ORDER BY c.confidence_score DESC, c.cid)
                         AS rk
              FROM queries_in q JOIN corrections_in c
                   ON c.original_query = lower(q.q)),
    known3 AS (SELECT * FROM known WHERE rk <= 3),
    ws AS (SELECT qid, string_split(lower(q), ' ') AS ws
           FROM queries_in),
    expanded AS (SELECT qid, ws, i, ws[i] AS w
                 FROM ws, unnest(generate_series(1, len(ws))) u(i)
                 WHERE ws[i] IN ({akeys})),
    abbrev AS (SELECT qid, 2 AS src,
                      array_to_string(list_transform(ws,
                          (x, j) -> CASE WHEN j = i THEN
                              CASE {amap_when} ELSE x END
                          ELSE x END), ' ') AS corrected_query,
                      'abbreviation' AS correction_type,
                      CAST(0.85 AS DOUBLE) AS confidence_score,
                      CAST(0.7 AS DOUBLE) AS acceptance_rate,
                      CAST(i AS BIGINT) AS rk
               FROM (SELECT qid, ws, i, w FROM expanded)),
    cands AS (SELECT * FROM known3 UNION ALL SELECT * FROM abbrev),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY confidence_score DESC, src, rk)
                   AS position
               FROM cands)
    SELECT qid, position, corrected_query, correction_type,
           confidence_score,
           CAST(position = 1 AND confidence_score >=
                CAST({AUTO_APPLY} AS DOUBLE) AS VARCHAR)
               AS auto_applied,
           acceptance_rate
    FROM ranked WHERE position <= {MAX_SUGGESTIONS}"""


# ---------------------------------------------------------------------------
# query expansion


def expand_queries(queries: DataFrame, analytics: DataFrame) -> DataFrame:
    """queries: (qid, q).  use_ai=False path: synonyms + related
    concepts (expanded_terms is a set -> rendered sorted)."""
    syn_map = F.create_map(*[
        x for k, v in SYNONYMS.items()
        for x in (F.lit(k), F.array(*[F.lit(s) for s in v[:3]]))])
    words = F.split(F.lower("q"), " ")
    matched = F.filter(words, lambda w:
                       F.element_at(syn_map, w).isNotNull())
    # dict semantics: distinct words, first-occurrence order
    first_words = F.array_distinct(matched)
    expanded = F.array_sort(F.array_distinct(F.flatten(F.transform(
        matched, lambda w: F.element_at(syn_map, w)))))
    syn_render = F.array_join(F.transform(
        first_words, lambda w: F.concat(
            w, F.lit("=["),
            F.array_join(F.element_at(syn_map, w), "|"), F.lit("]"))),
        ";")

    fu = (queries.join(
        analytics.where(F.col("follow_up_queries").isNotNull()),
        F.lower(analytics["query_text"]).contains(F.lower(queries["q"])))
        .select("qid", "aid",
                F.posexplode("follow_up_queries").alias("pos", "fq")))
    cnt = (fu.groupBy("qid", "fq")
           .agg(F.count("*").alias("n"),
                F.min(F.col("aid") * 1000 + F.col("pos"))
                .alias("first_ord")))
    wr = Window.partitionBy("qid").orderBy(
        F.desc("n"), "first_ord")
    rel = (cnt.withColumn("r", F.row_number().over(wr))
           .where(F.col("r") <= 5)
           .groupBy("qid")
           .agg(F.array_join(F.transform(F.array_sort(
                    F.collect_list(F.struct("r", "fq"))),
                    lambda s: s["fq"]), ",").alias("related_csv")))
    return (queries.select(
        "qid", F.col("q").alias("original_query"),
        F.array_join(expanded, ",").alias("expanded_terms_csv"),
        syn_render.alias("synonyms_render"),
        F.lit(0.8).alias("confidence_score"))
        .join(rel.select("qid", "related_csv"), "qid", "left")
        .withColumn("related_csv", F.coalesce("related_csv", F.lit(""))))


def expand_sql() -> str:
    """DuckDB twin over CTEs queries_in, analytics_in."""
    skeys = ", ".join(f"'{k}'" for k in SYNONYMS)
    syn_case = " ".join(
        "WHEN w = '{}' THEN {}".format(
            k, "[" + ", ".join(f"'{s}'" for s in v[:3]) + "]")
        for k, v in SYNONYMS.items())
    return f"""
    wsx AS (SELECT qid, q,
                   list_filter(string_split(lower(q), ' '),
                               w -> w IN ({skeys})) AS matched
            FROM queries_in),
    syn AS (SELECT qid, q,
                   list_sort(list_distinct(flatten(list_transform(
                       matched, w -> CASE {syn_case} ELSE [] END))))
                       AS expanded,
                   array_to_string(list_transform(
                       list_distinct(matched),
                       w -> w || '=[' || array_to_string(
                           CASE {syn_case} ELSE [] END, '|') || ']'),
                       ';') AS syn_render
            FROM wsx),
    fu AS (SELECT q.qid, a.aid, u.pos, u.fq
           FROM queries_in q
           JOIN analytics_in a
                ON a.follow_up_queries IS NOT NULL
                   AND contains(lower(a.query_text), lower(q.q)),
           LATERAL (SELECT i AS pos, a.follow_up_queries[i] AS fq
                    FROM unnest(generate_series(1,
                        len(a.follow_up_queries))) t(i)) u),
    cnt AS (SELECT qid, fq, count(*) AS n,
                   min(aid * 1000 + pos - 1) AS first_ord
            FROM fu GROUP BY 1, 2),
    rel AS (SELECT qid, array_to_string(list_transform(list_sort(
                list(struct_pack(r := r, fq := fq))),
                s -> s.fq), ',') AS related_csv
            FROM (SELECT qid, fq, row_number() OVER (
                      PARTITION BY qid ORDER BY n DESC, first_ord)
                      AS r
                  FROM cnt) WHERE r <= 5 GROUP BY 1)
    SELECT w.qid, w.q AS original_query,
           coalesce(array_to_string(w.expanded, ','), '')
               AS expanded_terms_csv,
           coalesce(w.syn_render, '') AS synonyms_render,
           CAST(0.8 AS DOUBLE) AS confidence_score,
           coalesce(r.related_csv, '') AS related_csv
    FROM syn w LEFT JOIN rel r USING (qid)"""


# ---------------------------------------------------------------------------
# synthesized inputs (shared shape with the SQL twins)

_QVOCAB = ["ti", "fire", "wood res", "ce", "zzz", "stone",
           "mat dim", "po"]


def synth_sugg_queries(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = events.select((e % 16).alias("qid")).distinct()
    g = F.col("qid")
    qtext = None
    for i, s in enumerate(_QVOCAB):
        c = F.when(g % 8 == i, s)
        qtext = c if qtext is None else qtext.when(g % 8 == i, s)
    qtext = qtext.otherwise("ti")
    return base.select(
        g.alias("qid"), qtext.alias("q"),
        (F.lit(3) + g % 5).cast("int").alias("lim"),
        F.when(g % 2 == 0, F.concat(F.lit("u"), (g % 3).cast("string")))
        .alias("user_id"),
        F.when(g % 5 == 4, F.concat(F.lit("cat"), (g % 2).cast("string")))
        .alias("category"))


_QCASE = " ".join(f"WHEN qid % 8 = {i} THEN '{s}'"
                  for i, s in enumerate(_QVOCAB))
SYNTH_SUGG_QUERIES_SQL = f"""
SELECT qid, CASE {_QCASE} ELSE 'ti' END AS q,
       CAST(3 + qid % 5 AS INT) AS lim,
       CASE WHEN qid % 2 = 0 THEN 'u' || (qid % 3) END AS user_id,
       CASE WHEN qid % 5 = 4 THEN 'cat' || (qid % 2) END AS category
FROM (SELECT DISTINCT event_id % 16 AS qid FROM events)"""


_SUGG_WORDS = ["tile", "fire", "wood", "ceramic", "stone", "Tile",
               "porcelain", "timber"]


def synth_sugg_suggestions(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = events.select((e % 60).alias("sid")).distinct()
    s = F.col("sid")
    w = None
    for i, wd in enumerate(_SUGG_WORDS):
        c = F.when(s % 8 == i, wd)
        w = c if w is None else w.when(s % 8 == i, wd)
    text = F.concat(w.otherwise("tile"), F.lit(" sugg "),
                    s.cast("string"))
    return base.select(
        s.alias("sid"), text.alias("suggestion_text"),
        (s % 3 != 0).alias("is_active"),
        F.concat(F.lit("cat"), (s % 2).cast("string")).alias("category"),
        ((s % 8) * F.lit(0.125)).alias("popularity_score"))


_SWCASE = " ".join(f"WHEN sid % 8 = {i} THEN '{w}'"
                   for i, w in enumerate(_SUGG_WORDS))
SYNTH_SUGG_SUGGESTIONS_SQL = f"""
SELECT sid, (CASE {_SWCASE} ELSE 'tile' END) || ' sugg ' || sid
           AS suggestion_text,
       sid % 3 <> 0 AS is_active,
       'cat' || (sid % 2) AS category,
       (sid % 8) * CAST(0.125 AS DOUBLE) AS popularity_score
FROM (SELECT DISTINCT event_id % 60 AS sid FROM events)"""


def synth_sugg_trending(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = events.select((e % 30).alias("tid")).distinct()
    t = F.col("tid")
    text = F.concat(
        F.when(t % 3 == 0, "hot tile").when(t % 3 == 1, "fireplace")
        .otherwise("stonework"), F.lit(" tr "), t.cast("string"))
    return base.select(
        t.alias("tid"), text.alias("query_text"),
        ((t * 37) % 160).cast("double").alias("trend_score"),
        F.when(t % 4 == 0, "weekly").otherwise("daily")
        .alias("time_window"))


SYNTH_SUGG_TRENDING_SQL = """
SELECT tid, (CASE WHEN tid % 3 = 0 THEN 'hot tile'
                  WHEN tid % 3 = 1 THEN 'fireplace'
                  ELSE 'stonework' END) || ' tr ' || tid AS query_text,
       CAST((tid * 37) % 160 AS DOUBLE) AS trend_score,
       CASE WHEN tid % 4 = 0 THEN 'weekly' ELSE 'daily' END
           AS time_window
FROM (SELECT DISTINCT event_id % 30 AS tid FROM events)"""


def synth_sugg_analytics(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = events.select((e % 40).alias("aid")).distinct()
    a = F.col("aid")
    text = F.concat(
        F.when(a % 4 == 0, "tile adhesive").when(a % 4 == 1, "firebrick")
        .when(a % 4 == 2, "wood panel").otherwise("ceiling rose"),
        F.lit(" q"), (a % 7).cast("string"))
    fuq = (F.when(a % 3 == 0, F.array(
        F.concat(F.lit("grout "), (a % 4).cast("string")),
        F.lit("sealant"),
        F.concat(F.lit("grout "), (a % 4).cast("string"))))
        .when(a % 3 == 1, F.array(F.lit("sealant"))))
    return base.select(
        a.alias("aid"),
        F.concat(F.lit("u"), (a % 4).cast("string")).alias("user_id"),
        text.alias("query_text"),
        (1000 - a).cast("int").alias("created_at"),
        fuq.alias("follow_up_queries"))


SYNTH_SUGG_ANALYTICS_SQL = """
SELECT aid, 'u' || (aid % 4) AS user_id,
       (CASE WHEN aid % 4 = 0 THEN 'tile adhesive'
             WHEN aid % 4 = 1 THEN 'firebrick'
             WHEN aid % 4 = 2 THEN 'wood panel'
             ELSE 'ceiling rose' END) || ' q' || (aid % 7)
           AS query_text,
       CAST(1000 - aid AS INT) AS created_at,
       CASE WHEN aid % 3 = 0
                THEN ['grout ' || (aid % 4), 'sealant',
                      'grout ' || (aid % 4)]
            WHEN aid % 3 = 1 THEN ['sealant']
       END AS follow_up_queries
FROM (SELECT DISTINCT event_id % 40 AS aid FROM events)"""


def synth_sugg_popular(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = events.select((e % 20).alias("pid_")).distinct()
    p = F.col("pid_")
    text = F.concat(
        F.when(p % 2 == 0, "tile trends").otherwise("fired clay"),
        F.lit(" pop "), p.cast("string"))
    return base.select(text.alias("query_text"),
                       ((p * 23) % 170).cast("int").alias("search_count"))


SYNTH_SUGG_POPULAR_SQL = """
SELECT (CASE WHEN p % 2 = 0 THEN 'tile trends' ELSE 'fired clay' END)
           || ' pop ' || p AS query_text,
       CAST((p * 23) % 170 AS INT) AS search_count
FROM (SELECT DISTINCT event_id % 20 AS p FROM events)"""


def synth_sugg_products(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = events.select((e % 25).alias("pid")).distinct()
    p = F.col("pid")
    name = F.concat(
        F.when(p % 3 == 0, "Tivoli Tile").when(p % 3 == 1, "Firestone")
        .otherwise("Cedar Wood"), F.lit(" P"), p.cast("string"))
    return base.select(p.alias("pid"), name.alias("name"))


SYNTH_SUGG_PRODUCTS_SQL = """
SELECT p AS pid, (CASE WHEN p % 3 = 0 THEN 'Tivoli Tile'
                       WHEN p % 3 = 1 THEN 'Firestone'
                       ELSE 'Cedar Wood' END) || ' P' || p AS name
FROM (SELECT DISTINCT event_id % 25 AS p FROM events)"""


def synth_sugg_corrections(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = events.select((e % 12).alias("cid")).distinct()
    c = F.col("cid")
    orig = (F.when(c % 3 == 0, "ti").when(c % 3 == 1, "ce")
            .otherwise("wood res"))
    return base.select(
        c.alias("cid"), orig.alias("original_query"),
        F.concat(F.lit("fix "), c.cast("string"))
        .alias("corrected_query"),
        F.lit("known").alias("correction_type"),
        (F.lit(0.5) + (c % 5) * F.lit(0.125)).alias("confidence_score"),
        ((c % 4) * F.lit(0.25)).alias("acceptance_rate"))


SYNTH_SUGG_CORRECTIONS_SQL = """
SELECT cid,
       CASE WHEN cid % 3 = 0 THEN 'ti' WHEN cid % 3 = 1 THEN 'ce'
            ELSE 'wood res' END AS original_query,
       'fix ' || cid AS corrected_query,
       'known' AS correction_type,
       CAST(0.5 AS DOUBLE) + (cid % 5) * CAST(0.125 AS DOUBLE)
           AS confidence_score,
       (cid % 4) * CAST(0.25 AS DOUBLE) AS acceptance_rate
FROM (SELECT DISTINCT event_id % 12 AS cid FROM events)"""


_TYPO_QUERIES = [
    "ti",               # known correction
    "res mat",          # two abbreviations
    "firebrik q3",      # fuzzy near 'firebrick q3' (>= 0.9, auto)
    "wood panel q2",    # exact analytics match -> fuzzy skips it
    "ceiling rose q9",  # many near variants -> top-3 cap
    "ce",               # known
    "dim spec check",   # two abbreviations
    "zzz nothing",      # no corrections at all
    "wood res",         # known + abbreviation together
    "tile adhesiv q1",  # fuzzy near 'tile adhesive q1'
]


def synth_typo_queries(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = events.select((e % len(_TYPO_QUERIES)).alias("qid")).distinct()
    g = F.col("qid")
    qtext = None
    for i, s in enumerate(_TYPO_QUERIES):
        c = F.when(g == i, s)
        qtext = c if qtext is None else qtext.when(g == i, s)
    return base.select(g.alias("qid"), qtext.alias("q"))


_TQCASE = " ".join(f"WHEN qid = {i} THEN '{s}'"
                   for i, s in enumerate(_TYPO_QUERIES))
SYNTH_TYPO_QUERIES_SQL = f"""
SELECT qid, CASE {_TQCASE} END AS q
FROM (SELECT DISTINCT event_id % {len(_TYPO_QUERIES)} AS qid
      FROM events)"""
