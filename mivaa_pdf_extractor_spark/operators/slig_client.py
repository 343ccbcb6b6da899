"""SLIG-client folds: the payload image-resize plan and the AIMD
backpressure classification.

Re-expresses ``app/services/embeddings/slig_client.py`` (the HTTP
transport is out of scope; these pin the client's deterministic
decisions):

- ``slig_resize_plan``  — slig_client.py:142-171 (``_image_to_base64``:
  resize fires only when width OR height exceeds 512; the new size is
  PIL ``Image.thumbnail`` arithmetic — aspect preserved, the bounded
  edge pinned to 512 and the other edge chosen between floor and ceil
  by which lands CLOSER to the true aspect (floor wins ties), floored
  at 1 (the ``round_aspect`` rule, pinned exactly); RGBA/LA/P modes
  convert to RGB for JPEG, other modes pass through)
- ``slig_backpressure_classify`` — slig_client.py:107-141
  (``_call_endpoint``: timeout/connect/remote-protocol failures shrink
  concurrency; an HTTP error records a failure ONLY for 429/500/502/
  503/504 — other 4xx raise WITHOUT a backpressure signal (pin);
  ``mark_used`` fires only on success AND with a manager present)

Both map-side; the resize arithmetic is plain IEEE double math so the
DuckDB twin agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_DIM = 512
_BACKPRESSURE_CODES = (429, 500, 502, 503, 504)


def slig_resize_plan(images: DataFrame) -> DataFrame:
    w = F.col("width").cast("double")
    h = F.col("height").cast("double")
    needs = (F.col("width") > MAX_DIM) | (F.col("height") > MAX_DIM)
    aspect = w / h
    # portrait-ish (512/512 >= aspect): x = round_aspect(512*aspect,
    # key=|aspect - n/512|), y = 512
    nx = F.lit(float(MAX_DIM)) * aspect
    flx, cex = F.floor(nx), F.ceil(nx)
    keyx = (lambda c: F.abs(aspect - c / F.lit(float(MAX_DIM))))
    px = F.when(keyx(flx) <= keyx(cex), flx).otherwise(cex)
    px = F.greatest(px.cast("long"), F.lit(1))
    # landscape (aspect > 1): y = round_aspect(512/aspect,
    # key=0 if n==0 else |aspect - 512/n|), x = 512
    ny = F.lit(float(MAX_DIM)) / aspect
    fly, cey = F.floor(ny), F.ceil(ny)
    keyy = (lambda c: F.when(c == 0, F.lit(0.0))
            .otherwise(F.abs(aspect - F.lit(float(MAX_DIM)) / c)))
    py = F.when(keyy(fly) <= keyy(cey), fly).otherwise(cey)
    py = F.greatest(py.cast("long"), F.lit(1))
    portrait = F.lit(1.0) >= aspect
    out_w = (F.when(~needs, F.col("width").cast("long"))
             .when(portrait, px).otherwise(F.lit(MAX_DIM)))
    out_h = (F.when(~needs, F.col("height").cast("long"))
             .when(portrait, F.lit(MAX_DIM)).otherwise(py))
    return images.select(
        "img_id",
        needs.alias("resized"),
        out_w.cast("int").alias("out_w"),
        out_h.cast("int").alias("out_h"),
        F.col("mode").isin("RGBA", "LA", "P").alias("converted_rgb"))


def synth_slig_images(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("img_id"),
        ((e * 13) % 2000 + 1).cast("int").alias("width"),
        ((e * 7) % 1500 + 1).cast("int").alias("height"),
        F.element_at(F.array(
            F.lit("RGB"), F.lit("RGBA"), F.lit("L"), F.lit("P"),
            F.lit("LA"), F.lit("CMYK")),
            (e % 6 + 1).cast("int")).alias("mode"))


SYNTH_SLIG_IMAGES_SQL = """
    SELECT CAST(event_id AS BIGINT) AS img_id,
           CAST((event_id * 13) % 2000 + 1 AS INT) AS width,
           CAST((event_id * 7) % 1500 + 1 AS INT) AS height,
           (['RGB', 'RGBA', 'L', 'P', 'LA', 'CMYK'])
             [CAST(event_id % 6 AS INT) + 1] AS mode
    FROM events
"""


def slig_resize_sql() -> str:
    m = float(MAX_DIM)
    return f"""
        WITH i AS ({SYNTH_SLIG_IMAGES_SQL}),
        g AS (
          SELECT *,
                 width > {MAX_DIM} OR height > {MAX_DIM} AS needs,
                 CAST(width AS DOUBLE) / CAST(height AS DOUBLE)
                     AS aspect
          FROM i),
        px AS (
          SELECT *,
                 {m} * aspect AS nx, {m} / aspect AS ny
          FROM g),
        ch AS (
          SELECT *,
                 greatest(CAST(CASE WHEN
                     abs(aspect - floor(nx) / {m})
                       <= abs(aspect - ceil(nx) / {m})
                     THEN floor(nx) ELSE ceil(nx) END AS BIGINT), 1)
                     AS rx,
                 greatest(CAST(CASE WHEN
                     (CASE WHEN floor(ny) = 0 THEN 0.0
                           ELSE abs(aspect - {m} / floor(ny)) END)
                       <= (CASE WHEN ceil(ny) = 0 THEN 0.0
                                ELSE abs(aspect - {m} / ceil(ny)) END)
                     THEN floor(ny) ELSE ceil(ny) END AS BIGINT), 1)
                     AS ry
          FROM px)
        SELECT img_id,
               needs AS resized,
               CAST(CASE WHEN NOT needs THEN width
                    WHEN 1.0 >= aspect THEN rx
                    ELSE {MAX_DIM} END AS INT) AS out_w,
               CAST(CASE WHEN NOT needs THEN height
                    WHEN 1.0 >= aspect THEN {MAX_DIM}
                    ELSE ry END AS INT) AS out_h,
               mode IN ('RGBA', 'LA', 'P') AS converted_rgb
        FROM ch
    """


def slig_backpressure_classify(calls: DataFrame) -> DataFrame:
    """outcome ∈ ok | timeout | connect | protocol | http; http carries
    ``status_code``."""
    transport_fail = F.col("outcome").isin("timeout", "connect",
                                           "protocol")
    http_bp = ((F.col("outcome") == "http")
               & F.col("status_code").isin(*_BACKPRESSURE_CODES))
    ok = F.col("outcome") == "ok"
    return calls.select(
        "call_id",
        F.when(ok, "success")
        .when(transport_fail | http_bp, "failure")
        .otherwise("none").alias("recorded"),
        (~ok).alias("raised"),
        (ok & F.col("has_manager")).alias("marked_used"))


def synth_slig_calls(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("call_id"),
        F.element_at(F.array(
            F.lit("ok"), F.lit("timeout"), F.lit("connect"),
            F.lit("protocol"), F.lit("http"), F.lit("ok")),
            (e % 6 + 1).cast("int")).alias("outcome"),
        F.element_at(F.array(
            F.lit(400), F.lit(401), F.lit(404), F.lit(429),
            F.lit(500), F.lit(502), F.lit(503), F.lit(504),
            F.lit(422)), (e % 9 + 1).cast("int")).alias("status_code"),
        (e % 3 != 0).alias("has_manager"))


SYNTH_SLIG_CALLS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS call_id,
           (['ok', 'timeout', 'connect', 'protocol', 'http', 'ok'])
             [CAST(event_id % 6 AS INT) + 1] AS outcome,
           ([400, 401, 404, 429, 500, 502, 503, 504, 422])
             [CAST(event_id % 9 AS INT) + 1] AS status_code,
           event_id % 3 <> 0 AS has_manager
    FROM events
"""


def slig_backpressure_sql() -> str:
    codes = ", ".join(str(c) for c in _BACKPRESSURE_CODES)
    return f"""
        WITH c AS ({SYNTH_SLIG_CALLS_SQL})
        SELECT call_id,
               CASE WHEN outcome = 'ok' THEN 'success'
                    WHEN outcome IN ('timeout', 'connect', 'protocol')
                    THEN 'failure'
                    WHEN outcome = 'http'
                         AND status_code IN ({codes}) THEN 'failure'
                    ELSE 'none' END AS recorded,
               outcome <> 'ok' AS raised,
               outcome = 'ok' AND has_manager AS marked_used
        FROM c
    """
