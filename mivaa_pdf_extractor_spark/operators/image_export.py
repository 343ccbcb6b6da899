"""Image-API folds (app/api/images.py).

The storage/HTTP/vision calls are out of scope; the deterministic
request shaping around them is folded here.  Pinned semantics
(file:line):

* ``check_export_rate_limit`` (:82-106) — 5-per-hour sliding window:
  entries ``<= now - 3600`` are evicted (an export EXACTLY one hour
  old leaves the window — inclusive evict, pin); an allowed attempt
  appends its timestamp, a REJECTED attempt does NOT (rejections never
  extend the lockout — pin).  Sequential per user -> applyInPandas
  replay + recursive-CTE twin (the window list is bounded at 5).

* Export gate ladder (:835-897), in order: rate limit (429) ->
  format ``.upper()`` not in {PNG, JPEG, WEBP} (400, message carries
  the quoted UPPERCASED input) -> zero images (404) -> workspace
  tenancy (#250 D21: 404 with the SAME 'No images found' message to
  defeat id enumeration — pin) -> count > max_images (413) ->
  estimated size > 500 MB (413, MB formatted .1f).  Estimated size
  sums ``img.get("size_bytes", 0)`` — NULLs fold to 0.

* Export manifest (:915-980): filename
  ``{idx:03d}_{Path(original).stem}.{ext}`` where ext =
  ``format.lower()`` EXCEPT JPEG -> 'jpg' (pin); idx enumerates ALL
  images so a URL-less (skipped) image still consumes its index —
  the ZIP numbering has holes (pin); metadata.json lists EVERY image
  under its projected filename even when the download was skipped or
  failed — the manifest can claim entries absent from the archive
  (pin); a missing original filename defaults to ``image_{idx}``.

* ``reclassify_image`` update shape (:1005-1030): classification
  'material'/'non-material' and category 'product'/'general' from
  ``is_material`` (absent -> False); the top-level ``confidence``
  column defaults 0.0 but the nested ``ai_classification.confidence``
  uses ``.get('confidence')`` with NO default — an absent confidence
  writes 0.0 at the top level and NULL in the metadata (asymmetric
  defaults — pin).

* ``segment_image`` source resolution (:1087-1107): the docstring
  says "prefer image_url" but the CODE prefers image_base64 — a
  request carrying both never fetches the URL (comment lies — pin);
  URL path: SSRF-unsafe -> 400 'image_url is not allowed', fetch
  failure -> 400 'Failed to fetch image_url: {e}'; neither source ->
  400 'Provide image_url or image_base64'.

The .1f MB rendering uses integer half-up (floor(x*10+0.5)) on both
engines; Python's %.1f is half-even on exact ties — measure-zero for
byte sums, documented not absorbed.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

EXPORT_RATE_LIMIT = 5
EXPORT_RATE_WINDOW = 3600
VALID_FORMATS = ("PNG", "JPEG", "WEBP")
MAX_ZIP_BYTES = 500 * 1024 * 1024


def rate_limit_replay(attempts: DataFrame) -> DataFrame:
    """attempts: (user_id, event_ord long, t long seconds).  One row
    per attempt: allowed + post-attempt window size."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_ord")
        window: list[int] = []
        out = []
        for r in pdf.itertuples():
            t = int(r.t)
            # inclusive evict (pin): entry <= t - 3600 leaves
            window = [x for x in window if x > t - EXPORT_RATE_WINDOW]
            allowed = len(window) < EXPORT_RATE_LIMIT
            if allowed:
                window.append(t)      # rejects never append (pin)
            out.append((r.user_id, int(r.event_ord), t, allowed,
                        len(window)))
        return pd.DataFrame(out, columns=[
            "user_id", "event_ord", "t", "allowed", "window_size"])

    return (attempts.repartition("user_id")
            .groupBy("user_id").applyInPandas(
                lambda _, g: run(g),
                "user_id string, event_ord long, t long, "
                "allowed boolean, window_size int"))


def export_gate(requests: DataFrame, max_images: int = 500) -> DataFrame:
    """requests: (request_id, document_id, rate_limited, format_raw,
    n_images, ws_scoped, is_member, est_bytes)."""
    fmt = F.upper(F.col("format_raw"))
    mb10 = F.floor(F.col("est_bytes") * 10.0 / 1048576 + 0.5)
    mb_str = F.concat((mb10 / 10).cast("long").cast("string"),
                      F.lit("."), (mb10 % 10).cast("string"))
    gate = (
        F.when(F.col("rate_limited"),
               F.struct(F.lit(429).alias("status"),
                        F.lit("Rate limit exceeded. Maximum 5 exports "
                              "per hour allowed.").alias("detail")))
        .when(~fmt.isin(*VALID_FORMATS),
              F.struct(F.lit(400).alias("status"),
                       F.concat(F.lit("Invalid format '"), fmt,
                                F.lit("'. Valid formats: PNG, JPEG, "
                                      "WEBP")).alias("detail")))
        .when(F.col("n_images") == 0,
              F.struct(F.lit(404).alias("status"),
                       F.concat(F.lit("No images found for document "),
                                F.col("document_id")).alias("detail")))
        # tenancy 404 reuses the no-images message (pin)
        .when(F.col("ws_scoped") & ~F.col("is_member"),
              F.struct(F.lit(404).alias("status"),
                       F.concat(F.lit("No images found for document "),
                                F.col("document_id")).alias("detail")))
        .when(F.col("n_images") > max_images,
              F.struct(F.lit(413).alias("status"),
                       F.concat(F.lit("Too many images ("),
                                F.col("n_images").cast("string"),
                                F.lit("). Maximum allowed: "),
                                F.lit(str(max_images))).alias("detail")))
        .when(F.col("est_bytes") > MAX_ZIP_BYTES,
              F.struct(F.lit(413).alias("status"),
                       F.concat(F.lit("Export too large ("), mb_str,
                                F.lit(" MB). Maximum: 500 MB"))
                       .alias("detail")))
        .otherwise(F.struct(F.lit(200).alias("status"),
                            F.lit(None).cast("string")
                            .alias("detail"))))
    return requests.select(
        "request_id", "document_id",
        gate.getField("status").alias("status"),
        gate.getField("detail").alias("detail"))


def export_manifest(images: DataFrame, fmt: str = "PNG") -> DataFrame:
    """images: (document_id, idx int 1-based, filename nullable,
    image_url nullable).  One metadata row per image — including
    skipped ones (pin)."""
    ext = "jpg" if fmt == "JPEG" else fmt.lower()
    original = F.coalesce(
        F.col("filename"),
        F.concat(F.lit("image_"), F.col("idx").cast("string")))
    base = F.element_at(F.split(original, "/"), -1)
    stem = F.when(base.contains("."),
                  F.regexp_replace(base, r"\.[^.]*$", "")) \
        .otherwise(base)
    return images.select(
        "document_id", "idx",
        F.concat(F.lpad(F.col("idx").cast("string"), 3, "0"),
                 F.lit("_"), stem, F.lit("." + ext)).alias("zip_name"),
        F.col("filename").alias("original_filename"),
        F.col("image_url").isNotNull().alias("in_archive"),
        F.lit(fmt).alias("format"))


def reclassify_update(results: DataFrame) -> DataFrame:
    """results: (image_id, has_is_material, is_material,
    has_confidence, confidence)."""
    mat = F.when(F.col("has_is_material"), F.col("is_material")) \
        .otherwise(F.lit(False))
    conf_top = F.when(F.col("has_confidence"), F.col("confidence")) \
        .otherwise(F.lit(0.0))                       # default 0.0
    conf_meta = F.when(F.col("has_confidence"), F.col("confidence"))
    return results.select(
        "image_id",
        F.when(mat, "material").otherwise("non-material")
        .alias("classification"),
        conf_top.alias("confidence"),
        F.when(mat, "product").otherwise("general").alias("category"),
        conf_meta.alias("meta_confidence"),          # NULL when absent
        F.concat(F.lit("Image re-classified as "),
                 F.when(mat, "product").otherwise("general"))
        .alias("message"))


def segment_source(requests: DataFrame) -> DataFrame:
    """requests: (request_id, has_base64, has_url, url_safe,
    fetch_ok, fetch_error)."""
    return requests.select(
        "request_id",
        (F.when(F.col("has_base64"), F.struct(
            F.lit("base64").alias("source"),         # b64 wins (pin)
            F.lit(200).alias("status"),
            F.lit(None).cast("string").alias("detail")))
         .when(F.col("has_url") & ~F.col("url_safe"), F.struct(
             F.lit(None).cast("string").alias("source"),
             F.lit(400).alias("status"),
             F.lit("image_url is not allowed").alias("detail")))
         .when(F.col("has_url") & ~F.col("fetch_ok"), F.struct(
             F.lit(None).cast("string").alias("source"),
             F.lit(400).alias("status"),
             F.concat(F.lit("Failed to fetch image_url: "),
                      F.col("fetch_error")).alias("detail")))
         .when(F.col("has_url"), F.struct(
             F.lit("url").alias("source"), F.lit(200).alias("status"),
             F.lit(None).cast("string").alias("detail")))
         .otherwise(F.struct(
             F.lit(None).cast("string").alias("source"),
             F.lit(400).alias("status"),
             F.lit("Provide image_url or image_base64")
             .alias("detail")))).alias("r")) \
        .select("request_id", F.col("r.source").alias("source"),
                F.col("r.status").alias("status"),
                F.col("r.detail").alias("detail"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_rate_attempts(events: DataFrame) -> DataFrame:
    """Bursty per-user traces: tight bursts to trip the limit, exact
    3600-gap pairs to pin the inclusive evict."""
    e = events.select((F.col("event_id") % 25).alias("u")).distinct()
    seq = e.select("u", F.explode(F.sequence(F.lit(0), F.lit(19)))
                   .alias("k"))
    u, k = F.col("u"), F.col("k")
    # spacing alternates: bursts of ~7 at 100 s, then a 3600 jump
    t = (F.when(k < 7, k * 100)
         .when(k < 14, F.lit(700) + (k - 7) * 450)
         .otherwise(F.lit(700 + 6 * 450) + (k - 13) * 3600
                    + (u % 3) * 120))
    return seq.select(
        F.concat(F.lit("u"), u.cast("string")).alias("user_id"),
        (u * 100 + k).cast("long").alias("event_ord"),
        t.cast("long").alias("t"))


SYNTH_RATE_SQL = """
    SELECT 'u' || CAST(u AS VARCHAR) AS user_id,
           CAST(u * 100 + k AS BIGINT) AS event_ord,
           CAST(CASE WHEN k < 7 THEN k * 100
                WHEN k < 14 THEN 700 + (k - 7) * 450
                ELSE 700 + 6 * 450 + (k - 13) * 3600 + (u % 3) * 120
           END AS BIGINT) AS t
    FROM (SELECT DISTINCT event_id % 25 AS u FROM events),
         UNNEST(generate_series(0, 19)) AS s(k)
"""


def duck_rate_sql(limit: int = EXPORT_RATE_LIMIT,
                  window: int = EXPORT_RATE_WINDOW) -> str:
    """Recursive twin over CTE ``rl_events``; yields ``rl_state``."""
    return f"""
            rl_numbered AS (
              SELECT *, row_number() OVER (PARTITION BY user_id
                  ORDER BY event_ord) AS rn
              FROM rl_events),
            rl_state AS (
              SELECT user_id, event_ord, t, rn,
                     TRUE AS allowed, [t] AS win
              FROM rl_numbered WHERE rn = 1
              UNION ALL
              SELECT n.user_id, n.event_ord, n.t, n.rn,
                     len(list_filter(s.win,
                         x -> x > n.t - {window})) < {limit}
                         AS allowed,
                     CASE WHEN len(list_filter(s.win,
                              x -> x > n.t - {window})) < {limit}
                          THEN list_append(list_filter(s.win,
                               x -> x > n.t - {window}), n.t)
                          ELSE list_filter(s.win,
                               x -> x > n.t - {window}) END AS win
              FROM rl_state s JOIN rl_numbered n
                ON n.user_id = s.user_id AND n.rn = s.rn + 1)"""


def rate_replay_sql() -> str:
    return f"""
        WITH RECURSIVE rl_events AS ({SYNTH_RATE_SQL}),
        {duck_rate_sql()}
        SELECT user_id, event_ord, t, allowed,
               CAST(len(win) AS INT) AS window_size
        FROM rl_state
    """


def synth_export_requests(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("request_id"),
        F.concat(F.lit("doc"), (e % 40).cast("string"))
        .alias("document_id"),
        (e % 17 == 0).alias("rate_limited"),
        F.when(e % 5 == 0, "png").when(e % 5 == 1, "JPEG")
        .when(e % 5 == 2, "webp").when(e % 5 == 3, "gif")
        .otherwise("Png").alias("format_raw"),
        F.when(e % 11 == 0, 0).otherwise((e % 600) + 1).cast("int")
        .alias("n_images"),
        (e % 3 == 0).alias("ws_scoped"),
        (e % 9 != 0).alias("is_member"),
        ((e % 700).cast("long") * 1_048_576
         + (e % 13) * 104_858).alias("est_bytes"))


SYNTH_EXPORT_REQ_SQL = """
    SELECT CAST(event_id AS BIGINT) AS request_id,
           'doc' || CAST(event_id % 40 AS VARCHAR) AS document_id,
           event_id % 17 = 0 AS rate_limited,
           CASE event_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'JPEG'
                WHEN 2 THEN 'webp' WHEN 3 THEN 'gif' ELSE 'Png' END
               AS format_raw,
           CAST(CASE WHEN event_id % 11 = 0 THEN 0
                ELSE event_id % 600 + 1 END AS INT) AS n_images,
           event_id % 3 = 0 AS ws_scoped,
           event_id % 9 <> 0 AS is_member,
           CAST(event_id % 700 AS BIGINT) * 1048576
               + (event_id % 13) * 104858 AS est_bytes
    FROM events
"""


def export_gate_sql(max_images: int = 500) -> str:
    return f"""
        WITH r AS ({SYNTH_EXPORT_REQ_SQL}),
        g AS (SELECT *, upper(format_raw) AS fmt,
                     CAST(floor(est_bytes * 10.0 / 1048576 + 0.5)
                          AS BIGINT) AS mb10
              FROM r)
        SELECT request_id, document_id,
               CASE WHEN rate_limited THEN 429
                    WHEN fmt NOT IN ('PNG', 'JPEG', 'WEBP') THEN 400
                    WHEN n_images = 0 THEN 404
                    WHEN ws_scoped AND NOT is_member THEN 404
                    WHEN n_images > {max_images} THEN 413
                    WHEN est_bytes > {MAX_ZIP_BYTES} THEN 413
                    ELSE 200 END AS status,
               CASE WHEN rate_limited THEN
                      'Rate limit exceeded. Maximum 5 exports per '
                      || 'hour allowed.'
                    WHEN fmt NOT IN ('PNG', 'JPEG', 'WEBP') THEN
                      'Invalid format ''' || fmt
                      || '''. Valid formats: PNG, JPEG, WEBP'
                    WHEN n_images = 0
                         OR (ws_scoped AND NOT is_member) THEN
                      'No images found for document ' || document_id
                    WHEN n_images > {max_images} THEN
                      'Too many images ('
                      || CAST(n_images AS VARCHAR)
                      || '). Maximum allowed: {max_images}'
                    WHEN est_bytes > {MAX_ZIP_BYTES} THEN
                      'Export too large ('
                      || CAST(mb10 // 10 AS VARCHAR) || '.'
                      || CAST(mb10 % 10 AS VARCHAR)
                      || ' MB). Maximum: 500 MB'
               END AS detail
        FROM g
    """


def synth_export_images(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        F.concat(F.lit("doc"), (e % 40).cast("string"))
        .alias("document_id"),
        ((e % 120) + 1).cast("int").alias("idx"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .when(e % 7 == 1, F.concat(F.lit("scans/p"), e.cast("string"),
                                   F.lit(".tif.png")))
        .when(e % 7 == 2, F.concat(F.lit("noext_"), e.cast("string")))
        .otherwise(F.concat(F.lit("img_"), e.cast("string"),
                            F.lit(".png"))).alias("filename"),
        F.when(e % 6 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("https://s/"), e.cast("string")))
        .alias("image_url"))


SYNTH_EXPORT_IMG_SQL = """
    SELECT 'doc' || CAST(event_id % 40 AS VARCHAR) AS document_id,
           CAST(event_id % 120 + 1 AS INT) AS idx,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN 'scans/p'
                     || CAST(event_id AS VARCHAR) || '.tif.png'
                WHEN event_id % 7 = 2 THEN 'noext_'
                     || CAST(event_id AS VARCHAR)
                ELSE 'img_' || CAST(event_id AS VARCHAR) || '.png'
           END AS filename,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE 'https://s/' || CAST(event_id AS VARCHAR) END
               AS image_url
    FROM events
"""


def export_manifest_sql(fmt: str = "PNG") -> str:
    ext = "jpg" if fmt == "JPEG" else fmt.lower()
    return f"""
        WITH i AS ({SYNTH_EXPORT_IMG_SQL}),
        n AS (SELECT *,
                     coalesce(filename,
                              'image_' || CAST(idx AS VARCHAR))
                         AS original
              FROM i),
        b AS (SELECT *, CASE WHEN strpos(original, '/') > 0
                             THEN string_split(original, '/')[-1]
                             ELSE original END AS base
              FROM n)
        SELECT document_id, idx,
               lpad(CAST(idx AS VARCHAR), 3, '0') || '_'
                   || CASE WHEN strpos(base, '.') > 0
                           THEN regexp_replace(base, '\\.[^.]*$', '')
                           ELSE base END
                   || '.{ext}' AS zip_name,
               filename AS original_filename,
               image_url IS NOT NULL AS in_archive,
               '{fmt}' AS format
        FROM b
    """


def synth_reclassify(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        F.concat(F.lit("img"), e.cast("string")).alias("image_id"),
        (e % 4 != 0).alias("has_is_material"),
        (e % 3 == 0).alias("is_material"),
        (e % 5 != 0).alias("has_confidence"),
        ((e % 100).cast("double") / 100).alias("confidence"))


SYNTH_RECLASSIFY_SQL = """
    SELECT 'img' || CAST(event_id AS VARCHAR) AS image_id,
           event_id % 4 <> 0 AS has_is_material,
           event_id % 3 = 0 AS is_material,
           event_id % 5 <> 0 AS has_confidence,
           CAST(event_id % 100 AS DOUBLE) / 100 AS confidence
    FROM events
"""


def reclassify_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_RECLASSIFY_SQL}),
        m AS (SELECT *, CASE WHEN has_is_material THEN is_material
                             ELSE FALSE END AS mat
              FROM r)
        SELECT image_id,
               CASE WHEN mat THEN 'material'
                    ELSE 'non-material' END AS classification,
               CASE WHEN has_confidence THEN confidence
                    ELSE 0.0 END AS confidence,
               CASE WHEN mat THEN 'product' ELSE 'general' END
                   AS category,
               CASE WHEN has_confidence THEN confidence END
                   AS meta_confidence,
               'Image re-classified as '
                   || CASE WHEN mat THEN 'product' ELSE 'general' END
                   AS message
        FROM m
    """


def synth_segment_requests(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("request_id"),
        (e % 3 == 0).alias("has_base64"),
        (e % 4 != 0).alias("has_url"),
        (e % 5 != 0).alias("url_safe"),
        (e % 7 != 0).alias("fetch_ok"),
        F.concat(F.lit("timeout "), (e % 6).cast("string"))
        .alias("fetch_error"))


SYNTH_SEGMENT_SQL = """
    SELECT CAST(event_id AS BIGINT) AS request_id,
           event_id % 3 = 0 AS has_base64,
           event_id % 4 <> 0 AS has_url,
           event_id % 5 <> 0 AS url_safe,
           event_id % 7 <> 0 AS fetch_ok,
           'timeout ' || CAST(event_id % 6 AS VARCHAR) AS fetch_error
    FROM events
"""


def segment_source_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_SEGMENT_SQL})
        SELECT request_id,
               CASE WHEN has_base64 THEN 'base64'
                    WHEN has_url AND url_safe AND fetch_ok THEN 'url'
               END AS source,
               CASE WHEN has_base64 THEN 200
                    WHEN has_url AND url_safe AND fetch_ok THEN 200
                    ELSE 400 END AS status,
               CASE WHEN has_base64 THEN NULL
                    WHEN has_url AND NOT url_safe
                         THEN 'image_url is not allowed'
                    WHEN has_url AND NOT fetch_ok
                         THEN 'Failed to fetch image_url: '
                              || fetch_error
                    WHEN has_url THEN NULL
                    ELSE 'Provide image_url or image_base64' END
                   AS detail
        FROM r
    """
