"""Entity-to-product matching (doc-co-keyed scored join).

Re-expresses ``match_entities_to_products`` of the reference's
document entity service (reference ``app/services/entities/
document_entity_service.py:221-374``): per (entity, product) pair of
a document, score = 0.6 x page-overlap ratio (set intersection over
the MAX of the RAW list lengths — duplicates inflate the
denominator, pinned) + 0.3 on a lowercase factory match (entity
factory = factory_name else manufacturer) + 0.1 on name containment
in EITHER direction (an empty entity name is contained in every
product name, so it always collects the +0.1 — pinned); pairs with
score >= 0.5 link with the reasons list rendered in evaluation
order.

Scale: one doc-co-keyed join (entities x products per doc bounded),
set work via array HOFs, no shuffle beyond the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def match_entities(entities: DataFrame, products: DataFrame) -> DataFrame:
    """entities: (document_id, entity_id, entity_type, name,
    page_range array<int>, factory_name, manufacturer); products:
    (document_id, product_id, name, page_range array<int>,
    factory_name)."""
    e = entities.select(
        "document_id", "entity_id", "entity_type",
        F.coalesce("name", F.lit("")).alias("ename"),
        F.coalesce("page_range", F.array().cast("array<int>"))
        .alias("epr"),
        F.lower(F.coalesce("factory_name", "manufacturer"))
        .alias("efac"))
    p = products.select(
        "document_id", "product_id",
        F.coalesce("name", F.lit("")).alias("pname"),
        F.coalesce("page_range", F.array().cast("array<int>"))
        .alias("ppr"),
        F.lower("factory_name").alias("pfac"))
    j = e.join(p, "document_id")
    overlap = F.size(F.array_intersect(
        F.array_distinct("epr"), F.array_distinct("ppr")))
    has_overlap = (F.size("epr") > 0) & (F.size("ppr") > 0) \
        & (overlap > 0)
    ratio = overlap / F.greatest(F.size("epr"), F.size("ppr"))
    el, pl = F.lower("ename"), F.lower("pname")
    name_sim = el.contains(pl) | pl.contains(el)
    fac = (F.col("efac").isNotNull() & (F.col("efac") != "")
           & F.col("pfac").isNotNull() & (F.col("pfac") != "")
           & (F.col("efac") == F.col("pfac")))
    score = (F.when(has_overlap, 0.6 * ratio).otherwise(0.0)
             + F.when(fac, 0.3).otherwise(0.0)
             + F.when(name_sim, 0.1).otherwise(0.0))
    reasons = F.array_join(F.array_compact(F.array(
        F.when(has_overlap, F.concat(F.lit("Page overlap: "),
                                     overlap.cast("string"),
                                     F.lit(" pages"))),
        F.when(fac, F.concat(F.lit("Factory match: "),
                             F.col("efac"))),
        F.when(name_sim, "Name similarity"))), "; ")
    return (j.where(score >= 0.5)
            .select("document_id", "entity_id", "product_id",
                    "entity_type", score.alias("match_score"),
                    reasons.alias("reasons")))


def match_sql() -> str:
    """DuckDB twin over CTEs entities_in, products_in."""
    return """
    e AS (SELECT document_id, entity_id, entity_type,
                 coalesce(name, '') AS ename,
                 coalesce(page_range, CAST([] AS INT[])) AS epr,
                 lower(coalesce(factory_name, manufacturer)) AS efac
          FROM entities_in),
    p AS (SELECT document_id, product_id,
                 coalesce(name, '') AS pname,
                 coalesce(page_range, CAST([] AS INT[])) AS ppr,
                 lower(factory_name) AS pfac
          FROM products_in),
    j AS (SELECT e.*, p.product_id, p.pname, p.ppr, p.pfac,
                 len(list_intersect(list_distinct(e.epr),
                     list_distinct(p.ppr))) AS ov
          FROM e JOIN p USING (document_id)),
    s AS (SELECT *,
        len(epr) > 0 AND len(ppr) > 0 AND ov > 0 AS has_ov,
        contains(lower(ename), lower(pname))
            OR contains(lower(pname), lower(ename)) AS nsim,
        efac IS NOT NULL AND efac <> '' AND pfac IS NOT NULL
            AND pfac <> '' AND efac = pfac AS fac
        FROM j),
    sc AS (SELECT *,
        CASE WHEN has_ov THEN CAST(0.6 AS DOUBLE)
             * (ov / CAST(greatest(len(epr), len(ppr)) AS DOUBLE))
             ELSE CAST(0.0 AS DOUBLE) END
        + CASE WHEN fac THEN CAST(0.3 AS DOUBLE)
               ELSE CAST(0.0 AS DOUBLE) END
        + CASE WHEN nsim THEN CAST(0.1 AS DOUBLE)
               ELSE CAST(0.0 AS DOUBLE) END AS match_score
        FROM s)
    SELECT document_id, entity_id, product_id, entity_type,
           match_score,
           array_to_string(list_filter([
               CASE WHEN has_ov
                    THEN 'Page overlap: ' || ov || ' pages' END,
               CASE WHEN fac THEN 'Factory match: ' || efac END,
               CASE WHEN nsim THEN 'Name similarity' END],
               v -> v IS NOT NULL), '; ') AS reasons
    FROM sc WHERE match_score >= 0.5"""


# ---------------------------------------------------------------------------
# synthesized inputs


def synth_match_entities(events: DataFrame) -> DataFrame:
    ev = F.col("event_id")
    base = (events.select((ev % 20).alias("d"),
                          F.expr("(event_id div 20) % 4").cast("int")
                          .alias("k")).distinct())
    d, k = F.col("d"), F.col("k")
    pr = (F.when((d + k) % 5 == 0, F.lit(None).cast("array<int>"))
          .when((d + k) % 5 == 1,  # duplicates inflate the denominator
                F.array(F.lit(3), F.lit(3), F.lit(4)))
          .otherwise(F.sequence((d % 4 + 1).cast("int"),
                                (d % 4 + 2 + k).cast("int"))))
    name = (F.when(k == 0, F.lit(""))  # empty -> always name-sim
            .when(k == 1, F.concat(F.lit("Mention of Prod"),
                                   (d % 6).cast("string"),
                                   F.lit(" here")))
            .otherwise(F.concat(F.lit("Entity"), k.cast("string"))))
    return base.select(
        d.alias("document_id"), (d * 10 + k).alias("entity_id"),
        F.when(k % 2 == 0, "certificate").otherwise("factory")
        .alias("entity_type"),
        name.alias("name"), pr.alias("page_range"),
        F.when(k == 2, F.concat(F.lit("Fab"), (d % 3).cast("string")))
        .alias("factory_name"),
        F.when(k == 3, F.concat(F.lit("fab"), (d % 3).cast("string")))
        .alias("manufacturer"))


SYNTH_MATCH_ENTITIES_SQL = """
SELECT d AS document_id, d * 10 + k AS entity_id,
       CASE WHEN k % 2 = 0 THEN 'certificate' ELSE 'factory' END
           AS entity_type,
       CASE WHEN k = 0 THEN ''
            WHEN k = 1 THEN 'Mention of Prod' || (d % 6) || ' here'
            ELSE 'Entity' || k END AS name,
       CASE WHEN (d + k) % 5 = 0 THEN NULL
            WHEN (d + k) % 5 = 1 THEN [3, 3, 4]
            ELSE range(CAST(d % 4 + 1 AS INT),
                       CAST(d % 4 + 3 + k AS INT)) END AS page_range,
       CASE WHEN k = 2 THEN 'Fab' || (d % 3) END AS factory_name,
       CASE WHEN k = 3 THEN 'fab' || (d % 3) END AS manufacturer
FROM (SELECT DISTINCT event_id % 20 AS d,
             CAST((event_id // 20) % 4 AS INT) AS k FROM events)"""


def synth_match_products(events: DataFrame) -> DataFrame:
    ev = F.col("event_id")
    base = (events.select((ev % 20).alias("d"),
                          F.expr("(event_id div 20) % 3").cast("int")
                          .alias("j")).distinct())
    d, j = F.col("d"), F.col("j")
    pr = (F.when(j == 2, F.lit(None).cast("array<int>"))
          .otherwise(F.sequence((d % 4 + 1 + j).cast("int"),
                                (d % 4 + 3 + j).cast("int"))))
    return base.select(
        d.alias("document_id"), (d * 100 + j).alias("product_id"),
        F.concat(F.lit("Prod"), ((d + j) % 6).cast("string"))
        .alias("name"), pr.alias("page_range"),
        F.when(j != 1, F.concat(F.lit("FAB"), (d % 3).cast("string")))
        .alias("factory_name"))


SYNTH_MATCH_PRODUCTS_SQL = """
SELECT d AS document_id, d * 100 + j AS product_id,
       'Prod' || ((d + j) % 6) AS name,
       CASE WHEN j = 2 THEN NULL
            ELSE range(CAST(d % 4 + 1 + j AS INT),
                       CAST(d % 4 + 4 + j AS INT)) END AS page_range,
       CASE WHEN j <> 1 THEN 'FAB' || (d % 3) END AS factory_name
FROM (SELECT DISTINCT event_id % 20 AS d,
             CAST((event_id // 20) % 3 AS INT) AS j FROM events)"""
