"""Catalog rasterize-route fold: the gate ladder, crop arithmetic, and
storage-path shaping.

Re-expresses ``app/api/catalog_routes.py:45-185``
(``rasterize_pdf_page``; the PyMuPDF render itself is pixels and out of
scope). Pinned behaviors:

- the cron-secret gate fails CLOSED when ``CRON_SECRET`` is
  unconfigured (``if not expected or secret != expected`` → 401);
- missing pdf row → 404; invalid PDF → 422; ``page_no > total``
  → 422 (1-based);
- crop pixel math: ``left = max(0, int(x1*w))`` … ``right =
  min(w, int(x2*w))`` with int() truncation; a DEGENERATE crop
  (right ≤ left or bottom ≤ top) silently falls back to the FULL page
  size (pin);
- the bbox cache key is 'full' without a bbox, else the 4-decimal
  underscore-joined string (hashed in the reference — the RAW key is
  emitted here; synth coords are sixteenths so the 4-decimal format
  is exact in both engines);
- the default storage path zero-pads the page to 4 digits
  (``page-%04d``), only when no target override (truthy gate).

Map-side when-chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rasterize_plan(reqs: DataFrame) -> DataFrame:
    no_secret = ~F.col("secret_configured")
    bad_secret = F.col("secret_configured") & ~F.col("secret_match")
    not_found = ~F.col("pdf_found")
    bad_pdf = ~F.col("pdf_valid")
    bad_page = F.col("page_no") > F.col("total_pages")
    status = (F.when(no_secret | bad_secret, 401)
              .when(not_found, 404)
              .when(bad_pdf, 422)
              .when(bad_page, 422)
              .otherwise(200))
    ok = status == 200
    w, h = F.col("page_w"), F.col("page_h")
    left = F.greatest(F.lit(0), F.floor(F.col("x1") * w))
    top = F.greatest(F.lit(0), F.floor(F.col("y1") * h))
    right = F.least(w.cast("long"), F.floor(F.col("x2") * w))
    bottom = F.least(h.cast("long"), F.floor(F.col("y2") * h))
    crop_valid = (right > left) & (bottom > top)
    out_w = (F.when(~F.col("has_bbox") | ~crop_valid, w)
             .otherwise(right - left))
    out_h = (F.when(~F.col("has_bbox") | ~crop_valid, h)
             .otherwise(bottom - top))
    fmt = (lambda c: F.format_string("%.4f", c))
    bbox_key = (F.when(~F.col("has_bbox"), F.lit("full"))
                .otherwise(F.concat_ws("_", fmt(F.col("x1")),
                                       fmt(F.col("y1")),
                                       fmt(F.col("x2")),
                                       fmt(F.col("y2")))))
    default_target = F.concat(
        F.lit("catalog-extracted/"), F.col("source_pdf_id"),
        F.lit("/"), F.format_string("page-%04d", F.col("page_no")),
        F.lit("-"), bbox_key, F.lit(".png"))
    target = F.coalesce(F.nullif(F.col("target_override"), F.lit("")),
                        default_target)
    return reqs.select(
        "req_id",
        status.cast("int").alias("status"),
        F.when(ok, bbox_key).otherwise(F.lit(None).cast("string"))
        .alias("bbox_key"),
        F.when(ok & F.col("has_bbox"),
               F.when(crop_valid, "valid").otherwise("degenerate"))
        .otherwise(F.lit(None).cast("string")).alias("crop_result"),
        F.when(ok, out_w).otherwise(F.lit(None)).cast("int")
        .alias("out_w"),
        F.when(ok, out_h).otherwise(F.lit(None)).cast("int")
        .alias("out_h"),
        F.when(ok, target).otherwise(F.lit(None).cast("string"))
        .alias("storage_target"))


def synth_rasterize_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    x1 = ((e % 9)).cast("double") / 16.0
    y1 = ((e % 7)).cast("double") / 16.0
    x2 = x1 + ((e % 5)).cast("double") / 16.0
    y2 = y1 + ((e % 4)).cast("double") / 16.0
    return events.select(
        e.cast("long").alias("req_id"),
        F.concat(F.lit("pdf-"), (e % 13).cast("string"))
        .alias("source_pdf_id"),
        (e % 19 != 0).alias("secret_configured"),
        (e % 7 != 0).alias("secret_match"),
        (e % 11 != 0).alias("pdf_found"),
        (e % 17 != 0).alias("pdf_valid"),
        ((e % 40) + 1).cast("int").alias("page_no"),
        F.lit(32).cast("int").alias("total_pages"),
        (e % 3 != 0).alias("has_bbox"),
        x1.alias("x1"), y1.alias("y1"),
        F.least(x2, F.lit(1.0)).alias("x2"),
        F.least(y2, F.lit(1.0)).alias("y2"),
        F.lit(1654).cast("int").alias("page_w"),
        F.lit(2339).cast("int").alias("page_h"),
        F.when(e % 6 == 0,
               F.concat(F.lit("custom/"), e.cast("string"),
                        F.lit(".png")))
        .when(e % 6 == 1, F.lit(""))
        .otherwise(F.lit(None).cast("string")).alias("target_override"))


SYNTH_RASTERIZE_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           'pdf-' || CAST(event_id % 13 AS VARCHAR) AS source_pdf_id,
           event_id % 19 <> 0 AS secret_configured,
           event_id % 7 <> 0 AS secret_match,
           event_id % 11 <> 0 AS pdf_found,
           event_id % 17 <> 0 AS pdf_valid,
           CAST(event_id % 40 + 1 AS INT) AS page_no,
           CAST(32 AS INT) AS total_pages,
           event_id % 3 <> 0 AS has_bbox,
           CAST(event_id % 9 AS DOUBLE) / 16.0 AS x1,
           CAST(event_id % 7 AS DOUBLE) / 16.0 AS y1,
           least(CAST(event_id % 9 AS DOUBLE) / 16.0
                 + CAST(event_id % 5 AS DOUBLE) / 16.0, 1.0) AS x2,
           least(CAST(event_id % 7 AS DOUBLE) / 16.0
                 + CAST(event_id % 4 AS DOUBLE) / 16.0, 1.0) AS y2,
           CAST(1654 AS INT) AS page_w,
           CAST(2339 AS INT) AS page_h,
           CASE WHEN event_id % 6 = 0
                THEN 'custom/' || CAST(event_id AS VARCHAR) || '.png'
                WHEN event_id % 6 = 1 THEN ''
           END AS target_override
    FROM events
"""


def rasterize_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_RASTERIZE_SQL}),
        g AS (
          SELECT *,
                 CASE WHEN NOT secret_configured
                           OR NOT secret_match THEN 401
                      WHEN NOT pdf_found THEN 404
                      WHEN NOT pdf_valid THEN 422
                      WHEN page_no > total_pages THEN 422
                      ELSE 200 END AS status,
                 greatest(0, CAST(floor(x1 * page_w) AS BIGINT))
                     AS l,
                 greatest(0, CAST(floor(y1 * page_h) AS BIGINT))
                     AS t,
                 least(CAST(page_w AS BIGINT),
                       CAST(floor(x2 * page_w) AS BIGINT)) AS rt,
                 least(CAST(page_h AS BIGINT),
                       CAST(floor(y2 * page_h) AS BIGINT)) AS bt,
                 CASE WHEN NOT has_bbox THEN 'full'
                      ELSE printf('%.4f', x1) || '_'
                           || printf('%.4f', y1) || '_'
                           || printf('%.4f', x2) || '_'
                           || printf('%.4f', y2) END AS bbox_key
          FROM r),
        h AS (
          SELECT *,
                 rt > l AND bt > t AS crop_valid,
                 coalesce(nullif(target_override, ''),
                          'catalog-extracted/' || source_pdf_id || '/'
                          || printf('page-%04d', page_no) || '-'
                          || bbox_key || '.png') AS target
          FROM g)
        SELECT req_id,
               CAST(status AS INT) AS status,
               CASE WHEN status = 200 THEN bbox_key END AS bbox_key,
               CASE WHEN status = 200 AND has_bbox THEN
                 CASE WHEN crop_valid THEN 'valid'
                      ELSE 'degenerate' END END AS crop_result,
               CAST(CASE WHEN status = 200 THEN
                 CASE WHEN NOT has_bbox OR NOT crop_valid
                      THEN page_w ELSE rt - l END END AS INT)
                   AS out_w,
               CAST(CASE WHEN status = 200 THEN
                 CASE WHEN NOT has_bbox OR NOT crop_valid
                      THEN page_h ELSE bt - t END END AS INT)
                   AS out_h,
               CASE WHEN status = 200 THEN target END
                   AS storage_target
        FROM h
    """
