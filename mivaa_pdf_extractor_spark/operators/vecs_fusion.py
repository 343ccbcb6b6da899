"""Multi-collection VECS search fusion.

Reference: ``app/services/embeddings/vecs_service.py``
``search_all_collections`` (:1025-1233) —

- six channels: visual (primary), understanding, and the four aspect
  collections; specialized searches run ONLY for aspect types whose
  query embedding was provided (:1105-1111).
- ``_ok()`` maps a failed/exception channel to ``[]`` (:1116-1119).
- ``has_understanding = bool(understanding_query_embedding AND
  understanding_results)`` (:1150) — the understanding WEIGHT exists
  only when that search actually returned rows, while a specialized
  type keeps its weight even when its search failed or returned
  nothing (scores default 0.0) — pinned asymmetry.
- weights come from ``image_only_weights`` (weight_profiles.py:
  193-237): balanced text share folds into visual (0.15+0.15=0.30),
  understanding 0.20 when present, the 0.50 specialized pool splits
  evenly across QUERIED aspects, all renormalized over the channels
  present.
- result union: every image_id seen by ANY channel; per-channel
  scores default 0.0 (no fallback to visual); ``similarity_score``
  in the output is the VISUAL score (0.0 when the image wasn't in
  the visual results); combined = Σ w·s; sorted by combined desc and
  trimmed to ``limit``.  The reference iterates a Python set, so
  combined-score TIES have no defined order — the fold CANONICALIZES
  ties by image_id (documented divergence).
- ``collection_stats``: per-channel result counts (:1206-1213).

Scale: one groupBy (query_id, image_id) pivot over the channel rows
(conditional-max, no explode), a per-query broadcast-sized weight
frame, a window trim.  No cross joins; candidate volume is bounded by
``limit`` per channel upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

CHANNELS = ("visual", "understanding", "color", "texture", "style",
            "material")
ASPECTS = ("color", "texture", "style", "material")
BALANCED_VISUAL = 0.30      # text 0.15 folds into visual 0.15
BALANCED_UNDERSTANDING = 0.20
SPECIALIZED_POOL = 0.50
DEFAULT_LIMIT = 20


def _query_weights(results: DataFrame,
                   channels: DataFrame) -> DataFrame:
    """Per-query normalized channel weights (image_only_weights)."""
    has_und_rows = (results
                    .where(F.col("channel") == "understanding")
                    .select("query_id").distinct()
                    .withColumn("_hur", F.lit(True)))
    c = channels.join(has_und_rows, "query_id", "left")
    hu = F.col("und_queried") & F.coalesce(F.col("_hur"),
                                           F.lit(False))
    k = sum(F.col(f"q_{a}").cast("int") for a in ASPECTS)
    w_und_raw = F.when(hu, F.lit(BALANCED_UNDERSTANDING)) \
        .otherwise(F.lit(0.0))
    pool = F.when(k > 0, F.lit(SPECIALIZED_POOL)).otherwise(F.lit(0.0))
    total = F.lit(BALANCED_VISUAL) + w_und_raw + pool
    per_type = F.when(k > 0, F.lit(SPECIALIZED_POOL) / k) \
        .otherwise(F.lit(0.0))
    sel = [F.col("query_id"),
           (F.lit(BALANCED_VISUAL) / total).alias("w_visual"),
           (w_und_raw / total).alias("w_understanding")]
    for a in ASPECTS:
        sel.append((F.when(F.col(f"q_{a}"), per_type)
                    .otherwise(F.lit(0.0)) / total).alias(f"w_{a}"))
    return c.select(*sel)


def fuse_collections(results: DataFrame, channels: DataFrame,
                     limit: int = DEFAULT_LIMIT) -> DataFrame:
    """``results``: (query_id, channel, image_id, score) — failed
    channels already absent (``_ok`` → []).  ``channels``:
    (query_id, und_queried, q_color, q_texture, q_style,
    q_material)."""
    pivot = results.groupBy("query_id", "image_id").agg(
        *[F.coalesce(
            F.max(F.when(F.col("channel") == ch, F.col("score"))),
            F.lit(0.0)).alias(f"s_{ch}") for ch in CHANNELS])
    j = pivot.join(_query_weights(results, channels), "query_id")
    combined = sum(F.col(f"w_{ch}") * F.col(f"s_{ch}")
                   for ch in CHANNELS)
    scored = j.select(
        "query_id", "image_id",
        F.col("s_visual").alias("similarity_score"),
        combined.alias("combined_score"),
        *[F.col(f"s_{ch}").alias(ch) for ch in CHANNELS])
    w = Window.partitionBy("query_id").orderBy(
        F.col("combined_score").desc(), F.col("image_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= limit))


def collection_stats(results: DataFrame,
                     channels: DataFrame) -> DataFrame:
    """Per-channel result counts (:1206-1213), one row per query."""
    agg = results.groupBy("query_id").agg(
        *[F.count(F.when(F.col("channel") == ch, F.lit(1)))
          .alias(f"{ch}_count") for ch in CHANNELS])
    return (channels.select("query_id").join(agg, "query_id", "left")
            .select("query_id",
                    *[F.coalesce(F.col(f"{ch}_count"), F.lit(0))
                      .alias(f"{ch}_count") for ch in CHANNELS]))


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

def synth_channels(docs: DataFrame) -> DataFrame:
    g = F.col("doc_id").cast("long")
    return (docs.select((g % 13).alias("query_id")).distinct()
            .select("query_id",
                    (F.col("query_id") % 3 != 0).alias("und_queried"),
                    (F.col("query_id") % 2 == 0).alias("q_color"),
                    (F.col("query_id") % 5 != 1).alias("q_texture"),
                    (F.col("query_id") % 4 != 2).alias("q_style"),
                    (F.col("query_id") % 7 != 3).alias("q_material")))


def synth_results(docs: DataFrame) -> DataFrame:
    """Channel rows gated on the queried flags; a deterministic
    'failed channel' mask empties (query 5, understanding) and
    (query 8, color) to exercise the _ok() arms."""
    g = F.col("doc_id").cast("long")
    rows = docs.select(
        (g % 13).alias("query_id"),
        (g % 41).alias("image_id"),
        F.element_at(F.array(*[F.lit(c) for c in CHANNELS]),
                     (g % 6 + 1).cast("int")).alias("channel"),
        ((g * 7) % 100).cast("double").alias("_s"))
    q = F.col("query_id")
    queried = (
        F.when(F.col("channel") == "understanding", q % 3 != 0)
        .when(F.col("channel") == "color", q % 2 == 0)
        .when(F.col("channel") == "texture", q % 5 != 1)
        .when(F.col("channel") == "style", q % 4 != 2)
        .when(F.col("channel") == "material", q % 7 != 3)
        .otherwise(F.lit(True)))
    failed = (((q == 5) & (F.col("channel") == "understanding"))
              | ((q == 8) & (F.col("channel") == "color")))
    return (rows.where(queried & ~failed)
            .select("query_id", "channel", "image_id",
                    (F.col("_s") / 100.0).alias("score"))
            .groupBy("query_id", "channel", "image_id")
            .agg(F.max("score").alias("score")))


DUCK_VECS_SQL = """
vqch AS (
  SELECT DISTINCT doc % 13 AS query_id FROM docs),
vch AS (
  SELECT query_id,
         query_id % 3 != 0 AS und_queried,
         query_id % 2 = 0 AS q_color,
         query_id % 5 != 1 AS q_texture,
         query_id % 4 != 2 AS q_style,
         query_id % 7 != 3 AS q_material
  FROM vqch),
vraw2 AS (
  SELECT doc % 13 AS query_id, doc % 41 AS image_id,
         (['visual', 'understanding', 'color', 'texture', 'style',
           'material'])[CAST(doc % 6 AS INT) + 1] AS channel,
         CAST((doc * 7) % 100 AS DOUBLE) / 100.0 AS score
  FROM docs),
vres AS (
  SELECT query_id, channel, image_id, max(score) AS score
  FROM vraw2
  WHERE (CASE channel
           WHEN 'understanding' THEN query_id % 3 != 0
           WHEN 'color' THEN query_id % 2 = 0
           WHEN 'texture' THEN query_id % 5 != 1
           WHEN 'style' THEN query_id % 4 != 2
           WHEN 'material' THEN query_id % 7 != 3
           ELSE TRUE END)
        AND NOT ((query_id = 5 AND channel = 'understanding')
                 OR (query_id = 8 AND channel = 'color'))
  GROUP BY query_id, channel, image_id),
vwts AS (
  SELECT c.query_id,
         0.30 / total AS w_visual,
         w_und_raw / total AS w_understanding,
         CASE WHEN q_color THEN per_type ELSE 0.0 END / total
           AS w_color,
         CASE WHEN q_texture THEN per_type ELSE 0.0 END / total
           AS w_texture,
         CASE WHEN q_style THEN per_type ELSE 0.0 END / total
           AS w_style,
         CASE WHEN q_material THEN per_type ELSE 0.0 END / total
           AS w_material
  FROM (
    SELECT c.*,
           CASE WHEN und_queried AND EXISTS (
                  SELECT 1 FROM vres r
                  WHERE r.query_id = c.query_id
                        AND r.channel = 'understanding')
                THEN 0.20 ELSE 0.0 END AS w_und_raw,
           CAST(q_color AS INT) + CAST(q_texture AS INT)
           + CAST(q_style AS INT) + CAST(q_material AS INT) AS k
    FROM vch c) c
  CROSS JOIN LATERAL (
    SELECT 0.30 + w_und_raw
           + CASE WHEN k > 0 THEN 0.50 ELSE 0.0 END AS total,
           CASE WHEN k > 0 THEN 0.50 / k ELSE 0.0 END AS per_type) t),
vpivot AS (
  SELECT query_id, image_id,
         coalesce(max(CASE WHEN channel = 'visual'
                      THEN score END), 0.0) AS s_visual,
         coalesce(max(CASE WHEN channel = 'understanding'
                      THEN score END), 0.0) AS s_understanding,
         coalesce(max(CASE WHEN channel = 'color'
                      THEN score END), 0.0) AS s_color,
         coalesce(max(CASE WHEN channel = 'texture'
                      THEN score END), 0.0) AS s_texture,
         coalesce(max(CASE WHEN channel = 'style'
                      THEN score END), 0.0) AS s_style,
         coalesce(max(CASE WHEN channel = 'material'
                      THEN score END), 0.0) AS s_material
  FROM vres GROUP BY query_id, image_id),
vfused AS (
  SELECT * FROM (
    SELECT p.query_id, p.image_id,
           s_visual AS similarity_score,
           w_visual * s_visual + w_understanding * s_understanding
           + w_color * s_color + w_texture * s_texture
           + w_style * s_style + w_material * s_material
             AS combined_score,
           s_visual AS visual, s_understanding AS understanding,
           s_color AS color, s_texture AS texture,
           s_style AS style, s_material AS material,
           row_number() OVER (
             PARTITION BY p.query_id
             ORDER BY w_visual * s_visual
                      + w_understanding * s_understanding
                      + w_color * s_color + w_texture * s_texture
                      + w_style * s_style + w_material * s_material
                      DESC, p.image_id) AS rank
    FROM vpivot p JOIN vwts w USING (query_id))
  WHERE rank <= 20),
vstats AS (
  SELECT c.query_id,
         coalesce(a.visual_count, 0) AS visual_count,
         coalesce(a.understanding_count, 0) AS understanding_count,
         coalesce(a.color_count, 0) AS color_count,
         coalesce(a.texture_count, 0) AS texture_count,
         coalesce(a.style_count, 0) AS style_count,
         coalesce(a.material_count, 0) AS material_count
  FROM vch c LEFT JOIN (
    SELECT query_id,
           count(CASE WHEN channel = 'visual' THEN 1 END)
             AS visual_count,
           count(CASE WHEN channel = 'understanding' THEN 1 END)
             AS understanding_count,
           count(CASE WHEN channel = 'color' THEN 1 END)
             AS color_count,
           count(CASE WHEN channel = 'texture' THEN 1 END)
             AS texture_count,
           count(CASE WHEN channel = 'style' THEN 1 END)
             AS style_count,
           count(CASE WHEN channel = 'material' THEN 1 END)
             AS material_count
    FROM vres GROUP BY query_id) a USING (query_id))"""
