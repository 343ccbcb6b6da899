"""Relevancy linking + timestamp normalization (map/join plans).

- Reference ``app/services/search/relevancy_service.py:28-167``
  (``create_product_image_relationships``): per product, when the
  metadata page_range list is empty/missing, EVERY image of the
  document links at overall/confidence 0.7 with reasoning
  'document_association' (fallback mode, spatial 0.0); otherwise
  images whose page_number lies in [min(page_range), max(page_range)]
  (inclusive — the flat list's span, NOT membership) link at 1.0
  with reasoning 'page_proximity' (spatial 1.0).
- Reference ``app/utils/timestamp_utils.py:5-48``
  (``normalize_timestamp``): 'Z' -> '+00:00'; when the result has
  both '.' and '+', the fractional part (split on the FIRST '+',
  rsplit on the LAST '.') is right-padded/truncated to exactly 6
  digits; anything else passes through untouched (including empty
  and NULL).

Scale: the link operator is one doc-co-keyed join with a range
predicate (images per doc x products per doc bounded); the timestamp
fix is a map-only projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def relevancy_links(products: DataFrame, images: DataFrame) -> DataFrame:
    """products: (document_id, product_id, page_range array<int>);
    images: (document_id, image_id, page_number)."""
    has_range = (F.col("page_range").isNotNull()
                 & (F.size("page_range") > 0))
    p = products.select(
        "document_id", "product_id", has_range.alias("ranged"),
        F.when(has_range, F.array_min("page_range")).alias("p0"),
        F.when(has_range, F.array_max("page_range")).alias("p1"))
    j = (p.join(images, "document_id")
         .where(~F.col("ranged")
                | F.col("page_number").between(F.col("p0"),
                                               F.col("p1"))))
    ranged = F.col("ranged")
    return j.select(
        "document_id", "product_id", "image_id",
        F.when(ranged, 1.0).otherwise(0.0).alias("spatial_score"),
        F.lit(0.0).alias("caption_score"),
        F.lit(0.0).alias("clip_score"),
        F.when(ranged, 1.0).otherwise(0.7).alias("overall_score"),
        F.when(ranged, 1.0).otherwise(0.7).alias("confidence"),
        F.when(ranged, "page_proximity").otherwise(
            "document_association").alias("reasoning"))


def relevancy_sql() -> str:
    """DuckDB twin over CTEs products_in, images_in."""
    return """
    p AS (SELECT document_id, product_id,
                 page_range IS NOT NULL AND len(page_range) > 0
                     AS ranged,
                 list_min(page_range) AS p0, list_max(page_range) AS p1
          FROM products_in)
    SELECT p.document_id, p.product_id, i.image_id,
           CASE WHEN p.ranged THEN CAST(1.0 AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END AS spatial_score,
           CAST(0.0 AS DOUBLE) AS caption_score,
           CAST(0.0 AS DOUBLE) AS clip_score,
           CASE WHEN p.ranged THEN CAST(1.0 AS DOUBLE)
                ELSE CAST(0.7 AS DOUBLE) END AS overall_score,
           CASE WHEN p.ranged THEN CAST(1.0 AS DOUBLE)
                ELSE CAST(0.7 AS DOUBLE) END AS confidence,
           CASE WHEN p.ranged THEN 'page_proximity'
                ELSE 'document_association' END AS reasoning
    FROM p JOIN images_in i USING (document_id)
    WHERE NOT p.ranged OR i.page_number BETWEEN p.p0 AND p.p1"""


def normalize_timestamps(rows: DataFrame) -> DataFrame:
    """rows: (row_id, ts).  Emits the normalized string."""
    z = F.regexp_replace(F.col("ts"), "Z", "+00:00")
    staged = rows.select(
        "row_id", "ts", z.alias("z"),
        (z.contains(".") & z.contains("+")).alias("hb"),
        F.split(z, "\\+")[0].alias("dtp"),
        # the reference takes parts[1] only (split on the FIRST '+')
        F.concat(F.lit("+"), F.split(z, "\\+")[1]).alias("tzp"))
    before = F.expr("substring(dtp, 1, length(dtp) "
                    "- instr(reverse(dtp), '.'))")
    micros = F.expr("substring(dtp, length(dtp) "
                    "- instr(reverse(dtp), '.') + 2)")
    fixed = F.concat(before, F.lit("."),
                     F.substring(F.rpad(micros, 6, "0"), 1, 6),
                     F.col("tzp"))
    out = (F.when(F.col("ts").isNull() | (F.col("ts") == ""),
                  F.col("ts"))
           .when(F.col("hb") & F.col("dtp").contains("."), fixed)
           .otherwise(F.col("z")))
    return staged.select("row_id", out.alias("normalized"))


def normalize_ts_sql() -> str:
    """DuckDB twin over a CTE rows_in (row_id, ts)."""
    return """
    st AS (SELECT row_id, ts, replace(ts, 'Z', '+00:00') AS z
           FROM rows_in),
    sp AS (SELECT *, contains(z, '.') AND contains(z, '+') AS hb,
                  split_part(z, '+', 1) AS dtp,
                  '+' || split_part(z, '+', 2) AS tzp
           FROM st)
    SELECT row_id,
           CASE WHEN ts IS NULL OR ts = '' THEN ts
                WHEN hb AND contains(dtp, '.') THEN
                    substring(dtp, 1, length(dtp)
                        - strpos(reverse(dtp), '.'))
                    || '.'
                    || substring(rpad(substring(dtp, length(dtp)
                        - strpos(reverse(dtp), '.') + 2), 6, '0'),
                        1, 6)
                    || tzp
                ELSE z END AS normalized
    FROM sp"""


# ---------------------------------------------------------------------------
# synthesized inputs


def synth_rel_products(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = (events.select((e % 25).alias("d"),
                          F.expr("(event_id div 25) % 3").cast("int")
                          .alias("k")).distinct())
    d, k = F.col("d"), F.col("k")
    pr = (F.when((d + k) % 4 == 0, F.lit(None).cast("array<int>"))
          .when((d + k) % 4 == 1, F.array().cast("array<int>"))
          .otherwise(F.array(((d + k) % 6 + 3).cast("int"),
                             ((d + k) % 6 + 1).cast("int"),
                             ((d + k) % 6 + 5).cast("int"))))
    return base.select(d.alias("document_id"),
                       (d * 10 + k).alias("product_id"),
                       pr.alias("page_range"))


SYNTH_REL_PRODUCTS_SQL = """
SELECT d AS document_id, d * 10 + k AS product_id,
       CASE WHEN (d + k) % 4 = 0 THEN NULL
            WHEN (d + k) % 4 = 1 THEN CAST([] AS INT[])
            ELSE [CAST((d + k) % 6 + 3 AS INT),
                  CAST((d + k) % 6 + 1 AS INT),
                  CAST((d + k) % 6 + 5 AS INT)]
       END AS page_range
FROM (SELECT DISTINCT event_id % 25 AS d,
             CAST((event_id // 25) % 3 AS INT) AS k FROM events)"""


def synth_rel_images(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = (events.select((e % 25).alias("d"),
                          F.expr("(event_id div 25) % 8").cast("int")
                          .alias("i")).distinct())
    d, i = F.col("d"), F.col("i")
    return (base.where(i < 2 + d % 5)
            .select(d.alias("document_id"),
                    (d * 100 + i).alias("image_id"),
                    ((i * 3 + d) % 12 + 1).cast("int")
                    .alias("page_number")))


SYNTH_REL_IMAGES_SQL = """
SELECT d AS document_id, d * 100 + i AS image_id,
       CAST((i * 3 + d) % 12 + 1 AS INT) AS page_number
FROM (SELECT DISTINCT event_id % 25 AS d,
             CAST((event_id // 25) % 8 AS INT) AS i FROM events)
WHERE i < 2 + d % 5"""


def synth_ts_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    ms = (e % 9).cast("string")
    ts = (F.when(e % 8 == 0, F.concat(
        F.lit("2025-11-18T18:36:51.9"), ms, F.lit("+00:00")))
        .when(e % 8 == 1, F.concat(
            F.lit("2025-11-18T18:36:51."), ms, F.lit("Z")))
        .when(e % 8 == 2, F.lit("2025-11-18T18:36:51Z"))
        .when(e % 8 == 3, F.concat(
            F.lit("2025-01-02T03:04:05.1234567"), ms,
            F.lit("+02:00")))  # > 6 digits -> truncate
        .when(e % 8 == 4, F.lit("2025-06-07T08:09:10"))
        .when(e % 8 == 5, F.lit(""))
        .when(e % 8 == 6, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("2025-03-04T05:06:07."),
                            ms, F.lit("+05:30"))))
    return events.select(e.alias("row_id"), ts.alias("ts"))


SYNTH_TS_SQL = """
SELECT event_id AS row_id,
       CASE WHEN event_id % 8 = 0
                THEN '2025-11-18T18:36:51.9' || (event_id % 9)
                     || '+00:00'
            WHEN event_id % 8 = 1
                THEN '2025-11-18T18:36:51.' || (event_id % 9) || 'Z'
            WHEN event_id % 8 = 2 THEN '2025-11-18T18:36:51Z'
            WHEN event_id % 8 = 3
                THEN '2025-01-02T03:04:05.1234567' || (event_id % 9)
                     || '+02:00'
            WHEN event_id % 8 = 4 THEN '2025-06-07T08:09:10'
            WHEN event_id % 8 = 5 THEN ''
            WHEN event_id % 8 = 6 THEN NULL
            ELSE '2025-03-04T05:06:07.' || (event_id % 9) || '+05:30'
       END AS ts
FROM events"""
