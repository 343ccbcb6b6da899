"""PaddleOCR-VL parse-service folds: the region-extraction shaping and
the block-mode text assembly.

Re-expresses ``modal_app/paddleocr_vl.py:183-259`` (``_parse_image`` +
the ``/parse`` route; the VLM itself is GPU territory). Pinned
behaviors:

- blocks are skipped when the bbox is missing or not length-4;
- the order ladder is None-coalescing (``block_order`` → ``block_id``
  → ``len(regions)``) — NOT ``or``-based, so an explicit 0 order is
  kept (the fixed 500-bug, pin), and the ``len(regions)`` fallback is
  the count of blocks KEPT SO FAR, so it shifts with earlier skips
  (pin);
- label and content use truthy-or ladders ('' falls through) with
  'text' / '' defaults;
- the final sort is by order with Python's STABLE tiebreak (input
  position);
- block mode joins only truthy contents with newlines and strips the
  result.

One projection + running-count window; the text assembly is an
order-aware string agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _kept_regions(blocks: DataFrame) -> DataFrame:
    kept = F.col("has_bbox") & (F.col("bbox_len") == 4)
    w = (Window.partitionBy("req_id").orderBy("bidx")
         .rowsBetween(Window.unboundedPreceding, -1))
    prior_kept = F.coalesce(F.sum(kept.cast("int")).over(w), F.lit(0))
    order_final = F.coalesce(F.col("block_order"), F.col("block_id"),
                             prior_kept)
    label = F.coalesce(F.nullif(F.col("block_label"), F.lit("")),
                       F.nullif(F.col("label"), F.lit("")),
                       F.lit("text"))
    content = F.coalesce(F.nullif(F.col("block_content"), F.lit("")),
                         F.nullif(F.col("content"), F.lit("")),
                         F.lit(""))
    return (blocks
            .withColumn("_kept", kept)
            .withColumn("_order", order_final)
            .withColumn("_label", label)
            .withColumn("_content", content)
            .where(F.col("_kept")))


def paddle_region_fold(blocks: DataFrame) -> DataFrame:
    k = _kept_regions(blocks)
    w_sort = Window.partitionBy("req_id").orderBy("_order", "bidx")
    return k.select(
        "req_id", "bidx",
        F.col("_order").cast("int").alias("order_out"),
        F.col("_label").alias("label_out"),
        F.col("_content").alias("content_out"),
        F.row_number().over(w_sort).cast("int").alias("sorted_pos"))


def paddle_block_text(blocks: DataFrame) -> DataFrame:
    k = _kept_regions(blocks)
    w_sort = Window.partitionBy("req_id").orderBy("_order", "bidx")
    k = k.withColumn("_pos", F.row_number().over(w_sort))
    agg = (k.where(F.col("_content") != "")
           .groupBy("req_id")
           .agg(F.concat_ws(
               "\n", F.array_sort(F.collect_list(
                   F.struct("_pos", "_content"))).getField("_content"))
               .alias("_joined")))
    reqs = blocks.select("req_id").distinct()
    return (reqs.join(agg, "req_id", "left")
            .select("req_id",
                    F.trim(F.coalesce(F.col("_joined"), F.lit("")))
                    .alias("text")))


def synth_paddle_blocks(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        (e % 211).cast("long").alias("req_id"),
        F.floor(e / 211).cast("int").alias("bidx"),
        (e % 7 != 0).alias("has_bbox"),
        F.when(e % 11 == 0, F.lit(3)).otherwise(F.lit(4)).cast("int")
        .alias("bbox_len"),
        F.when(e % 4 == 0, F.lit(None).cast("int"))
        .when(e % 4 == 1, F.lit(0))
        .otherwise((e % 30).cast("int")).alias("block_order"),
        F.when(e % 5 == 0, F.lit(None).cast("int"))
        .otherwise((e % 17).cast("int")).alias("block_id"),
        F.when(e % 6 == 0, F.lit(None).cast("string"))
        .when(e % 6 == 1, F.lit(""))
        .otherwise(F.lit("title")).alias("block_label"),
        F.when(e % 3 == 0, F.lit("figure"))
        .otherwise(F.lit(None).cast("string")).alias("label"),
        F.when(e % 8 == 0, F.lit(None).cast("string"))
        .when(e % 8 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("line "), (e % 13).cast("string")))
        .alias("block_content"),
        F.when(e % 9 == 0, F.lit("fallback text"))
        .otherwise(F.lit(None).cast("string")).alias("content"))


SYNTH_PADDLE_BLOCKS_SQL = """
    SELECT CAST(event_id % 211 AS BIGINT) AS req_id,
           CAST(event_id // 211 AS INT) AS bidx,
           event_id % 7 <> 0 AS has_bbox,
           CAST(CASE WHEN event_id % 11 = 0 THEN 3 ELSE 4 END AS INT)
               AS bbox_len,
           CAST(CASE WHEN event_id % 4 = 0 THEN NULL
                WHEN event_id % 4 = 1 THEN 0
                ELSE event_id % 30 END AS INT) AS block_order,
           CAST(CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE event_id % 17 END AS INT) AS block_id,
           CASE WHEN event_id % 6 = 0 THEN NULL
                WHEN event_id % 6 = 1 THEN ''
                ELSE 'title' END AS block_label,
           CASE WHEN event_id % 3 = 0 THEN 'figure' END AS label,
           CASE WHEN event_id % 8 = 0 THEN NULL
                WHEN event_id % 8 = 1 THEN ''
                ELSE 'line ' || CAST(event_id % 13 AS VARCHAR)
           END AS block_content,
           CASE WHEN event_id % 9 = 0 THEN 'fallback text'
           END AS content
    FROM events
"""

_KEPT_SQL = f"""
        b AS ({SYNTH_PADDLE_BLOCKS_SQL}),
        k0 AS (
          SELECT *,
                 has_bbox AND bbox_len = 4 AS kept,
                 coalesce(sum(CASE WHEN has_bbox AND bbox_len = 4
                                   THEN 1 ELSE 0 END)
                          OVER (PARTITION BY req_id ORDER BY bidx
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS prior_kept
          FROM b),
        k AS (
          SELECT req_id, bidx,
                 coalesce(block_order, block_id, prior_kept)
                     AS order_final,
                 coalesce(nullif(block_label, ''), nullif(label, ''),
                          'text') AS label_out,
                 coalesce(nullif(block_content, ''),
                          nullif(content, ''), '') AS content_out
          FROM k0 WHERE kept)
"""


def paddle_region_sql() -> str:
    return f"""
        WITH {_KEPT_SQL}
        SELECT req_id, bidx,
               CAST(order_final AS INT) AS order_out,
               label_out, content_out,
               CAST(row_number() OVER (
                   PARTITION BY req_id
                   ORDER BY order_final, bidx) AS INT) AS sorted_pos
        FROM k
    """


def paddle_block_text_sql() -> str:
    return f"""
        WITH {_KEPT_SQL},
        j AS (
          SELECT req_id,
                 string_agg(content_out, chr(10)
                            ORDER BY order_final, bidx) AS joined
          FROM k WHERE content_out <> ''
          GROUP BY req_id)
        SELECT r.req_id,
               trim(coalesce(j.joined, '')) AS text
        FROM (SELECT DISTINCT req_id FROM b) r
        LEFT JOIN j ON j.req_id = r.req_id
    """
