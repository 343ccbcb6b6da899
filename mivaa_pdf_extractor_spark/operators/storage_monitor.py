"""Storage/monitoring dashboard folds (app/api/monitoring_routes.py).

Deterministic aggregation around the Supabase storage listing
(file:line):

* ``get_bucket_stats`` (:66-110): '/'-suffixed (folder) and non-dict
  entries are skipped BEFORE counting; a file whose metadata lacks a
  size still counts in ``files`` while adding 0 bytes (pin); size_mb
  rounds 2 dp, size_gb 3 dp (two grains in one row).
* ``get_supabase_status`` (:208-307): warning tiers are STRICT
  (> 90 critical / > 80 warning / > 50 notice) — the endpoint's own
  docstring publishes "<50% healthy, 50-80% notice" but exactly 50%
  is HEALTHY and exactly 80% is NOTICE in code (docstring
  off-by-boundary — pin); health_status mirrors the same ladder;
  ``can_upload = pct < 95`` is a SEPARATE threshold — uploads stay
  allowed while the status is already 'critical' between 90 and 95%
  (pin).
* ``estimate_storage_for_upload`` (:368-417): images estimate at a
  flat 0.2 MB each; ``is_safe = projected < 90`` STRICT;
  recommendation 'safe'/'upgrade_needed' with the pinned messages.

Percent strings render via integer half-up (documented convention).
Plans: per-bucket agg + one global agg; the estimate is a one-row
projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STORAGE_LIMIT_GB = 1.0   # RESOURCE_LIMITS (:44-48)


def _rnd(col, k: int):
    return F.floor(col * (10 ** k) + F.lit(0.5)) / (10 ** k)


def bucket_stats(listing: DataFrame) -> DataFrame:
    """listing: (bucket, name nullable, is_dict bool, meta_size long
    nullable)."""
    keep = (F.col("is_dict")
            & ~F.coalesce(F.col("name"), F.lit("")).endswith("/"))
    kept = listing.where(keep)
    return (kept.groupBy("bucket").agg(
        F.count("*").cast("long").alias("files"),
        F.coalesce(F.sum(F.coalesce(F.col("meta_size"), F.lit(0))),
                   F.lit(0)).cast("long").alias("size_bytes"))
        .select("bucket", "files", "size_bytes",
                _rnd(F.col("size_bytes") / 1048576.0, 2)
                .alias("size_mb"),
                _rnd(F.col("size_bytes") / 1073741824.0, 3)
                .alias("size_gb")))


def storage_status(listing: DataFrame,
                   limit_gb: float = STORAGE_LIMIT_GB) -> DataFrame:
    """One row: the status ladder over total bucket usage."""
    b = bucket_stats(listing)
    tot = b.agg(F.sum("size_bytes").alias("bytes"),
                F.sum("files").cast("long").alias("total_files"))
    gb = F.col("bytes") / 1073741824.0
    pct = gb / limit_gb * 100
    return tot.select(
        "total_files",
        F.col("bytes").cast("long").alias("total_size_bytes"),
        _rnd(gb, 3).alias("total_size_gb"),
        _rnd(pct, 2).alias("storage_percent"),
        _rnd(F.lit(limit_gb) - gb, 3).alias("storage_remaining_gb"),
        (F.when(pct > 90, "critical").when(pct > 80, "warning")
         .when(pct > 50, "notice").otherwise("healthy"))
        .alias("health_status"),
        (F.when(pct > 90, "critical").when(pct > 80, "warning")
         .when(pct > 50, "notice")).alias("warning_type"),
        (pct < 95).alias("can_upload"))


def upload_estimate(requests: DataFrame, current_usage_gb_col: str =
                    "current_usage_gb",
                    limit_gb: float = STORAGE_LIMIT_GB) -> DataFrame:
    """requests: (request_id, file_size_mb double, estimated_images
    int, current_usage_gb double)."""
    est_mb = (F.col("file_size_mb")
              + F.col("estimated_images").cast("double") * 0.2)
    est_gb = est_mb / 1024.0
    projected = F.col(current_usage_gb_col) + est_gb
    pct = projected / limit_gb * 100
    safe = pct < 90
    return requests.select(
        "request_id",
        _rnd(est_gb, 3).alias("estimated_additional_gb"),
        _rnd(projected, 3).alias("projected_usage_gb"),
        _rnd(pct, 2).alias("projected_usage_percent"),
        safe.alias("is_safe"),
        F.when(safe, "safe").otherwise("upgrade_needed")
        .alias("recommendation"),
        F.when(safe, "Upload is safe")
        .otherwise("Storage limit will be exceeded - upgrade "
                   "required").alias("message"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_bucket_listing(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    buckets = ("pdf-documents", "pdf-tiles", "generation-images",
               "quote-templates", "moodboard-sheet-references")
    bexpr = F.when(e % 5 == 0, buckets[0]).when(e % 5 == 1, buckets[1])
    for i, b in enumerate(buckets[2:], start=2):
        bexpr = bexpr.when(e % 5 == i, b)
    return events.select(
        bexpr.alias("bucket"),
        F.when(e % 9 == 0, F.lit(None).cast("string"))
        .when(e % 9 == 1, F.concat(F.lit("dir"), e.cast("string"),
                                   F.lit("/")))
        .otherwise(F.concat(F.lit("f"), e.cast("string"),
                            F.lit(".bin"))).alias("name"),
        (e % 13 != 0).alias("is_dict"),
        F.when(e % 7 == 0, F.lit(None).cast("long"))
        .otherwise((e % 90000).cast("long") * 17).alias("meta_size"))


SYNTH_BUCKET_SQL = """
    SELECT CASE event_id % 5 WHEN 0 THEN 'pdf-documents'
                WHEN 1 THEN 'pdf-tiles'
                WHEN 2 THEN 'generation-images'
                WHEN 3 THEN 'quote-templates'
                ELSE 'moodboard-sheet-references' END AS bucket,
           CASE WHEN event_id % 9 = 0 THEN NULL
                WHEN event_id % 9 = 1
                  THEN 'dir' || CAST(event_id AS VARCHAR) || '/'
                ELSE 'f' || CAST(event_id AS VARCHAR) || '.bin' END
               AS name,
           event_id % 13 <> 0 AS is_dict,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE CAST(event_id % 90000 AS BIGINT) * 17 END
               AS meta_size
    FROM events
"""

_KEPT_SQL = f"""
    SELECT * FROM ({SYNTH_BUCKET_SQL})
    WHERE is_dict AND NOT coalesce(name, '') LIKE '%/'
"""


def bucket_stats_sql() -> str:
    return f"""
        WITH k AS ({_KEPT_SQL}),
        g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS files,
                     CAST(sum(coalesce(meta_size, 0)) AS BIGINT)
                         AS size_bytes
              FROM k GROUP BY bucket)
        SELECT bucket, files, size_bytes,
               floor(size_bytes / 1048576.0 * 100 + 0.5) / 100
                   AS size_mb,
               floor(size_bytes / 1073741824.0 * 1000 + 0.5) / 1000
                   AS size_gb
        FROM g
    """


def storage_status_sql(limit_gb: float = STORAGE_LIMIT_GB) -> str:
    return f"""
        WITH k AS ({_KEPT_SQL}),
        t AS (SELECT CAST(count(*) AS BIGINT) AS total_files,
                     CAST(sum(coalesce(meta_size, 0)) AS BIGINT)
                         AS bytes
              FROM k),
        c AS (SELECT *, bytes / 1073741824.0 AS gb,
                     bytes / 1073741824.0 / {limit_gb} * 100 AS pct
              FROM t)
        SELECT total_files, bytes AS total_size_bytes,
               floor(gb * 1000 + 0.5) / 1000 AS total_size_gb,
               floor(pct * 100 + 0.5) / 100 AS storage_percent,
               floor(({limit_gb} - gb) * 1000 + 0.5) / 1000
                   AS storage_remaining_gb,
               CASE WHEN pct > 90 THEN 'critical'
                    WHEN pct > 80 THEN 'warning'
                    WHEN pct > 50 THEN 'notice'
                    ELSE 'healthy' END AS health_status,
               CASE WHEN pct > 90 THEN 'critical'
                    WHEN pct > 80 THEN 'warning'
                    WHEN pct > 50 THEN 'notice' END AS warning_type,
               pct < 95 AS can_upload
        FROM c
    """


def synth_upload_requests(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("request_id"),
        ((e % 400).cast("double") * 0.25).alias("file_size_mb"),
        (e % 300).cast("int").alias("estimated_images"),
        ((e % 110).cast("double") * 0.0125).alias("current_usage_gb"))


SYNTH_UPLOAD_SQL = """
    SELECT CAST(event_id AS BIGINT) AS request_id,
           CAST(event_id % 400 AS DOUBLE) * 0.25 AS file_size_mb,
           CAST(event_id % 300 AS INT) AS estimated_images,
           CAST(event_id % 110 AS DOUBLE) * 0.0125
               AS current_usage_gb
    FROM events
"""


def upload_estimate_sql(limit_gb: float = STORAGE_LIMIT_GB) -> str:
    return f"""
        WITH r AS ({SYNTH_UPLOAD_SQL}),
        c AS (SELECT *,
                     (file_size_mb + estimated_images * 0.2) / 1024.0
                         AS est_gb
              FROM r),
        p AS (SELECT *, current_usage_gb + est_gb AS projected,
                     (current_usage_gb + est_gb) / {limit_gb} * 100
                         AS pct
              FROM c)
        SELECT request_id,
               floor(est_gb * 1000 + 0.5) / 1000
                   AS estimated_additional_gb,
               floor(projected * 1000 + 0.5) / 1000
                   AS projected_usage_gb,
               floor(pct * 100 + 0.5) / 100
                   AS projected_usage_percent,
               pct < 90 AS is_safe,
               CASE WHEN pct < 90 THEN 'safe'
                    ELSE 'upgrade_needed' END AS recommendation,
               CASE WHEN pct < 90 THEN 'Upload is safe'
                    ELSE 'Storage limit will be exceeded - upgrade '
                         || 'required' END AS message
        FROM p
    """
