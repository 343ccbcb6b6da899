"""Visual-search analytics rollup (single groupBy plan).

Re-expresses ``_generate_analytics`` of the reference's material
visual search service (reference ``app/services/search/
material_visual_search_service.py:342-396``): per search, the
material-type distribution, the confidence tiers (>= 0.8 high,
>= 0.6 medium, else low), the three average fusion scores rounded to
3 (realized as the deterministic floor(x*1000+0.5)/1000 — see
operators/quality_scores.py), and fusion effectiveness = the mean of
the three UNROUNDED averages, rounded.  A search with no results
emits the zero row (empty distribution, zero tiers).

Scale: one map-side-combinable groupBy per search; the type
distribution is a two-level groupBy carrying (search, type, count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mivaa_pdf_extractor_spark.operators.quality_scores import _round3


def search_analytics(searches: DataFrame, results: DataFrame) -> DataFrame:
    """searches: (search_id); results: (search_id, material_type,
    confidence_score, visual_score, semantic_score,
    property_score)."""
    dist = (results.groupBy("search_id", "material_type")
            .agg(F.count("*").alias("n"))
            .groupBy("search_id")
            .agg(F.array_join(F.array_sort(F.collect_list(
                F.concat("material_type", F.lit(":"),
                         F.col("n").cast("string")))), ",")
                .alias("type_distribution")))
    conf = F.col("confidence_score")
    agg = results.groupBy("search_id").agg(
        F.count("*").alias("total_results"),
        F.sum(F.when(conf >= 0.8, 1).otherwise(0)).alias("high"),
        F.sum(F.when((conf >= 0.6) & (conf < 0.8), 1).otherwise(0))
        .alias("medium"),
        F.sum(F.when(conf < 0.6, 1).otherwise(0)).alias("low"),
        F.avg("visual_score").alias("av"),
        F.avg("semantic_score").alias("as_"),
        F.avg("property_score").alias("ap"))
    out = (searches.join(agg, "search_id", "left")
           .join(dist, "search_id", "left"))
    t = F.coalesce("total_results", F.lit(0))
    return out.select(
        "search_id", t.alias("total_results"),
        F.coalesce("type_distribution", F.lit(""))
        .alias("type_distribution"),
        F.coalesce("high", F.lit(0)).alias("high"),
        F.coalesce("medium", F.lit(0)).alias("medium"),
        F.coalesce("low", F.lit(0)).alias("low"),
        F.when(t > 0, _round3(F.col("av")))
        .alias("avg_visual_similarity"),
        F.when(t > 0, _round3(F.col("as_")))
        .alias("avg_semantic_relevance"),
        F.when(t > 0, _round3(F.col("ap")))
        .alias("avg_property_matching"),
        F.when(t > 0, _round3(
            (F.col("av") + F.col("as_") + F.col("ap")) / 3))
        .alias("fusion_effectiveness"))


def analytics_sql() -> str:
    """DuckDB twin over CTEs searches_in, results_in."""
    r3 = "floor(({}) * 1000 + 0.5e0) / 1000"
    return f"""
    dist AS (SELECT search_id, array_to_string(list_sort(
                 list(material_type || ':' || n)), ',')
                 AS type_distribution
             FROM (SELECT search_id, material_type, count(*) AS n
                   FROM results_in GROUP BY 1, 2)
             GROUP BY 1),
    agg AS (SELECT search_id, count(*) AS total_results,
                   sum(CASE WHEN confidence_score >= 0.8 THEN 1
                       ELSE 0 END) AS high,
                   sum(CASE WHEN confidence_score >= 0.6
                            AND confidence_score < 0.8 THEN 1
                       ELSE 0 END) AS medium,
                   sum(CASE WHEN confidence_score < 0.6 THEN 1
                       ELSE 0 END) AS low,
                   avg(visual_score) AS av,
                   avg(semantic_score) AS asem,
                   avg(property_score) AS ap
            FROM results_in GROUP BY 1)
    SELECT s.search_id,
           coalesce(a.total_results, 0) AS total_results,
           coalesce(d.type_distribution, '') AS type_distribution,
           CAST(coalesce(a.high, 0) AS BIGINT) AS high,
           CAST(coalesce(a.medium, 0) AS BIGINT) AS medium,
           CAST(coalesce(a.low, 0) AS BIGINT) AS low,
           CASE WHEN coalesce(a.total_results, 0) > 0
                THEN {r3.format('a.av')} END AS avg_visual_similarity,
           CASE WHEN coalesce(a.total_results, 0) > 0
                THEN {r3.format('a.asem')} END
               AS avg_semantic_relevance,
           CASE WHEN coalesce(a.total_results, 0) > 0
                THEN {r3.format('a.ap')} END AS avg_property_matching,
           CASE WHEN coalesce(a.total_results, 0) > 0
                THEN {r3.format('(a.av + a.asem + a.ap) / 3')} END
               AS fusion_effectiveness
    FROM searches_in s
    LEFT JOIN agg a USING (search_id)
    LEFT JOIN dist d USING (search_id)"""


# ---------------------------------------------------------------------------
# synthesized inputs (exact-eighth scores -> order-independent sums)


def synth_va_searches(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select((e % 40).alias("search_id")).distinct()


SYNTH_VA_SEARCHES_SQL = """
SELECT DISTINCT event_id % 40 AS search_id FROM events"""


def synth_va_results(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    # search 13 has no results (zero-row pin)
    base = events.where((e % 40 != 13) & (e % 3 != 2))
    mt = (F.when(e % 4 == 0, "ceramic").when(e % 4 == 1, "stone")
          .when(e % 4 == 2, "wood").otherwise("metal"))
    return base.select(
        (e % 40).alias("search_id"), mt.alias("material_type"),
        ((e % 9) * F.lit(0.125)).alias("confidence_score"),
        ((e % 5) * F.lit(0.25)).alias("visual_score"),
        ((e % 7) * F.lit(0.125)).alias("semantic_score"),
        ((e % 3) * F.lit(0.5)).alias("property_score"))


SYNTH_VA_RESULTS_SQL = """
SELECT event_id % 40 AS search_id,
       CASE WHEN event_id % 4 = 0 THEN 'ceramic'
            WHEN event_id % 4 = 1 THEN 'stone'
            WHEN event_id % 4 = 2 THEN 'wood'
            ELSE 'metal' END AS material_type,
       (event_id % 9) * CAST(0.125 AS DOUBLE) AS confidence_score,
       (event_id % 5) * CAST(0.25 AS DOUBLE) AS visual_score,
       (event_id % 7) * CAST(0.125 AS DOUBLE) AS semantic_score,
       (event_id % 3) * CAST(0.5 AS DOUBLE) AS property_score
FROM events WHERE event_id % 40 <> 13 AND event_id % 3 <> 2"""


# ---------------------------------------------------------------------------
# 7-vector enrichment re-rank (search_enrichment_service.py:27-186)

RERANK_WEIGHTS = {
    "visual": 0.22, "understanding": 0.18, "relevance": 0.15,
    "color": 0.1125, "texture": 0.1125, "style": 0.1125,
    "material": 0.1125,
}
_SCORE_KEYS = ["visual", "understanding", "color", "texture", "style",
               "material"]


def rerank_images(images: DataFrame, assocs: DataFrame,
                  min_relevance: float = 0.25) -> DataFrame:
    """``enrich_image_results``: per-key merge prefers direct scores
    over metadata embedding_scores; 'visual' falls back to the
    similarity_score (others to 0.0); relevance = MAX association
    overall_score >= min_relevance; images with NO qualifying
    products take combined = similarity_score with relevance 0.0
    (pinned); final stable sort by combined desc (ties keep input
    order -> rank by (-combined, input ordinal)).

    images: (ord, image_id, similarity_score,
    scores map<string,double>, meta_scores map<string,double>);
    assocs: (image_id, product_id, overall_score)."""
    rel = (assocs.where(F.col("overall_score") >= min_relevance)
           .groupBy("image_id")
           .agg(F.max("overall_score").alias("max_rel"),
                F.count("*").alias("n_prods")))
    j = images.join(rel, "image_id", "left")
    sc = F.coalesce("scores",
                    F.create_map().cast("map<string,double>"))
    ms = F.coalesce("meta_scores",
                    F.create_map().cast("map<string,double>"))

    def merged(k, default):
        return F.coalesce(F.element_at(sc, F.lit(k)),
                          F.element_at(ms, F.lit(k)), default)

    sim = F.coalesce("similarity_score", F.lit(0.0))
    vals = {k: merged(k, sim if k == "visual" else F.lit(0.0))
            for k in _SCORE_KEYS}
    has_p = F.col("n_prods").isNotNull()
    w = RERANK_WEIGHTS
    combined_full = (vals["visual"] * w["visual"]
                     + vals["understanding"] * w["understanding"]
                     + F.col("max_rel") * w["relevance"]
                     + vals["color"] * w["color"]
                     + vals["texture"] * w["texture"]
                     + vals["style"] * w["style"]
                     + vals["material"] * w["material"])
    combined = F.when(has_p, combined_full).otherwise(sim)
    max_rel = F.when(has_p, F.col("max_rel")).otherwise(0.0)
    staged = j.select(
        "image_id", F.col("ord"), combined.alias("combined_score"),
        max_rel.alias("max_product_relevance"),
        *[F.when(has_p, vals[k]).otherwise(
            sim if k == "visual" else F.lit(0.0)).alias(f"s_{k}")
          for k in _SCORE_KEYS])
    from pyspark.sql import Window
    wr = Window.orderBy(F.desc("combined_score"), F.asc("ord"))
    return staged.withColumn("rank", F.row_number().over(wr))


def rerank_sql(min_relevance: float = 0.25) -> str:
    """DuckDB twin over CTEs images_in, assocs_in."""
    w = RERANK_WEIGHTS

    def mg(k, default):
        return (f"coalesce(map_extract(sc, '{k}')[1], "
                f"map_extract(ms, '{k}')[1], {default})")

    vals = {k: mg(k, "sim" if k == "visual"
                  else "CAST(0.0 AS DOUBLE)") for k in _SCORE_KEYS}
    full = " + ".join(
        [f"{vals['visual']} * CAST({w['visual']} AS DOUBLE)",
         f"{vals['understanding']} * CAST({w['understanding']} AS DOUBLE)",
         f"max_rel * CAST({w['relevance']} AS DOUBLE)"]
        + [f"{vals[k]} * CAST({w[k]} AS DOUBLE)"
           for k in ("color", "texture", "style", "material")])
    scols = ",\n           ".join(
        f"CASE WHEN has_p THEN {vals[k]} ELSE "
        + ("sim" if k == "visual" else "CAST(0.0 AS DOUBLE)")
        + f" END AS s_{k}" for k in _SCORE_KEYS)
    return f"""
    rel AS (SELECT image_id, max(overall_score) AS max_rel,
                   count(*) AS n_prods
            FROM assocs_in WHERE overall_score >= {min_relevance}
            GROUP BY 1),
    j AS (SELECT i.image_id, i.ord,
                 coalesce(i.similarity_score, CAST(0.0 AS DOUBLE))
                     AS sim,
                 coalesce(i.scores, MAP([], [])
                     ::MAP(VARCHAR, DOUBLE)) AS sc,
                 coalesce(i.meta_scores, MAP([], [])
                     ::MAP(VARCHAR, DOUBLE)) AS ms,
                 r.max_rel, r.n_prods IS NOT NULL AS has_p
          FROM images_in i LEFT JOIN rel r USING (image_id)),
    staged AS (SELECT image_id, ord,
           CASE WHEN has_p THEN {full} ELSE sim END AS combined_score,
           CASE WHEN has_p THEN max_rel ELSE CAST(0.0 AS DOUBLE) END
               AS max_product_relevance,
           {scols}
           FROM j)
    SELECT *, CAST(row_number() OVER (
               ORDER BY combined_score DESC, ord) AS INT) AS rank
    FROM staged"""


def synth_rr_images(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = events.select((e % 60).alias("i")).distinct()
    i = F.col("i")
    sc = (F.when(i % 4 == 0, F.expr(
        "map('visual', 0.875, 'color', 0.25)"))
        .when(i % 4 == 1, F.expr("map('understanding', 0.5)")))
    ms = (F.when(i % 3 == 0, F.expr(
        "map('visual', 0.125, 'texture', 0.75, 'style', 0.375)"))
        .when(i % 3 == 1, F.expr("map('material', 0.625)")))
    return base.select(
        i.alias("ord"),
        F.concat(F.lit("img"), i.cast("string")).alias("image_id"),
        ((i % 8) * F.lit(0.125)).alias("similarity_score"),
        sc.alias("scores"), ms.alias("meta_scores"))


SYNTH_RR_IMAGES_SQL = """
SELECT i AS ord, 'img' || i AS image_id,
       (i % 8) * CAST(0.125 AS DOUBLE) AS similarity_score,
       CASE WHEN i % 4 = 0
                THEN map(['visual', 'color'],
                         [0.875::DOUBLE, 0.25::DOUBLE])
            WHEN i % 4 = 1
                THEN map(['understanding'], [0.5::DOUBLE])
       END AS scores,
       CASE WHEN i % 3 = 0
                THEN map(['visual', 'texture', 'style'],
                         [0.125::DOUBLE, 0.75::DOUBLE, 0.375::DOUBLE])
            WHEN i % 3 = 1 THEN map(['material'], [0.625::DOUBLE])
       END AS meta_scores
FROM (SELECT DISTINCT event_id % 60 AS i FROM events)"""


def synth_rr_assocs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = (events.select((e % 60).alias("i"),
                          F.expr("(event_id div 60) % 3").cast("int")
                          .alias("k")).distinct())
    i, k = F.col("i"), F.col("k")
    return (base.where((i % 5 != 0) & (k < 1 + i % 2))
            .select(F.concat(F.lit("img"), i.cast("string"))
                    .alias("image_id"),
                    (i * 10 + k).alias("product_id"),
                    (((i + k) % 9) * F.lit(0.125))
                    .alias("overall_score")))


SYNTH_RR_ASSOCS_SQL = """
SELECT 'img' || i AS image_id, i * 10 + k AS product_id,
       ((i + k) % 9) * CAST(0.125 AS DOUBLE) AS overall_score
FROM (SELECT DISTINCT event_id % 60 AS i,
             CAST((event_id // 60) % 3 AS INT) AS k FROM events)
WHERE i % 5 <> 0 AND k < 1 + i % 2"""
