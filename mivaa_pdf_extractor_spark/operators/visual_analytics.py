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
