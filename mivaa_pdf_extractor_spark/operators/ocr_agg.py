"""OCR result-shaping folds (app/services/pdf/ocr_service.py) — the
PaddleOCR call itself is network/GPU (out of scope; the driver-side
manager is stubbed), but everything AROUND the call is deterministic
and pinned:

- result fold (:207-305, ``_call_paddleocr``): no manager -> failed
  with attempts_made=0; parse exhaustion -> failed with
  attempts_made=MAX; HTTP/endpoint error -> failed with attempts_made=0
  (pin: the two failure tiers stamp DIFFERENT attempt counts);
  success confidence is the hardcoded 0.85; ``generated_text`` and
  region contents run LIVE ``or ''`` ladders; the no-text variant
  fires only when ``paddle_text.strip() or blocks`` is falsy — a
  whitespace-only text with one surviving block is still a SUCCESS
  row carrying that whitespace text (pin);
- block pixelization (:283-296): 0..1 bboxes scale by int() TRUNCATION
  applied to x0*w, y0*h and (x1-x0)*w / (y1-y0)*h — the width is
  truncated from the DIFFERENCE, not differenced from truncations
  (pin); regions whose content strips empty are dropped BEFORE
  pixelization;
- confidence aggregation (:357-411, ``get_text_with_confidence``):
  the >= min_confidence filter is INCLUSIVE; no qualifying regions ->
  the zeroed envelope (text '', confidence 0.0, 0 words, 0 regions);
  all_text joins the SURVIVORS' texts in list order WITHOUT the strip
  gate — a confident-but-empty region contributes an empty join slot
  (pin — contrast extract_text_simple below); word_count counts
  whitespace runs of the joined text; methods_used is
  ``list(set(m for m in ... if m))`` — '' methods are dropped by the
  truthy gate and the set order is unspecified, canonicalized here as
  sorted-distinct (documented deviation);
- simple concat (:338-356, ``extract_text_simple``): texts join ' '
  EXCLUDING rows whose text strips empty (pin: whitespace-only rows
  are dropped here but kept in the confidence aggregation).

Float determinism: synthetic confidences are dyadic (k/8) so sums are
exact in any accumulation order; bbox fractions are sixteenths against
integer pixel sizes so every product is exact and truncation is
engine-independent (DuckDB CAST rounds — its twin uses trunc()).

Scale: the fold is map-only; the aggregations are one
map-side-combinable groupBy(crop) each, ordered joins via
sort_array(collect_list(struct)) — no UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SUCCESS_CONFIDENCE = 0.85   # (:293, :301)
DEFAULT_MIN_CONFIDENCE = 0.5


def paddle_result_fold(calls: DataFrame, regions: DataFrame) -> DataFrame:
    """One OCRResult row per call (:207-305)."""
    surviving = regions.filter(
        F.trim(F.coalesce(F.col("content"), F.lit(""))) != "")
    n_blocks = surviving.groupBy("call_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"))
    j = calls.join(n_blocks, "call_id", "left").withColumn(
        "n_blocks", F.coalesce(F.col("n_blocks"), F.lit(0)))
    text = F.coalesce(F.col("generated_text"), F.lit(""))  # `or ''`
    has_text = (F.trim(text) != "") | (F.col("n_blocks") > 0)
    ok = F.col("outcome") == "ok"
    return j.select(
        "call_id",
        F.when(~F.col("manager_present") | ~ok,
               F.lit("paddleocr_failed"))
        .otherwise(F.lit("paddleocr")).alias("method"),
        F.when(~F.col("manager_present") | ~ok, F.lit(0.0))
        .otherwise(F.lit(SUCCESS_CONFIDENCE)).alias("confidence"),
        F.when(F.col("manager_present") & ok, text)
        .otherwise(F.lit("")).alias("text"),
        F.when(F.col("manager_present") & ok, F.col("n_blocks"))
        .otherwise(F.lit(0)).cast("long").alias("n_blocks"),
        # failure tiers stamp different attempt counts (pin)
        F.when(~F.col("manager_present"), F.lit(0))
        .when(F.col("outcome") == "parse_error", F.col("max_attempts"))
        .when(F.col("outcome") == "http_error", F.lit(0))
        .otherwise(F.col("attempts")).cast("long").alias("attempts_made"),
        F.when(F.col("manager_present") & ok & ~has_text,
               F.lit(1)).otherwise(F.lit(0)).cast("int").alias("is_no_text"))


def blocks_pixels(calls: DataFrame, regions: DataFrame) -> DataFrame:
    """Pixelized blocks for bbox-aware consumers (:283-296) — only for
    successful calls with a live manager."""
    ok = calls.filter(F.col("manager_present")
                      & (F.col("outcome") == "ok")) \
        .select("call_id", "img_w", "img_h")
    surviving = regions.filter(
        F.trim(F.coalesce(F.col("content"), F.lit(""))) != "")
    j = surviving.join(F.broadcast(ok), "call_id")
    return j.select(
        "call_id", "region_idx",
        F.col("content").alias("text"),
        # int() truncation toward zero, applied to the products
        (F.col("x0") * F.col("img_w")).cast("int").alias("x"),
        (F.col("y0") * F.col("img_h")).cast("int").alias("y"),
        ((F.col("x1") - F.col("x0")) * F.col("img_w")).cast("int")
        .alias("w"),
        ((F.col("y1") - F.col("y0")) * F.col("img_h")).cast("int")
        .alias("h"))


def confidence_agg(results: DataFrame,
                   min_confidence: float = DEFAULT_MIN_CONFIDENCE
                   ) -> DataFrame:
    """get_text_with_confidence (:357-411) per crop."""
    qual = F.col("confidence") >= min_confidence
    agg = results.groupBy("crop_id").agg(
        F.sum(qual.cast("long")).alias("regions"),
        F.sum(F.when(qual, F.col("confidence")).otherwise(0.0))
        .alias("_conf_sum"),
        # list-order join, NO strip gate on the survivors (pin)
        F.concat_ws(" ", F.transform(
            F.sort_array(F.collect_list(
                F.when(qual, F.struct(F.col("idx").alias("i"),
                                      F.col("text").alias("t"))))),
            lambda s: s["t"])).alias("_all_text"),
        F.sort_array(F.collect_set(
            F.when(qual & F.col("method").isNotNull()
                   & (F.col("method") != ""), F.col("method"))))
        .alias("_methods"))
    empty = F.col("regions") == 0
    methods = F.filter(F.col("_methods"), lambda m: m.isNotNull())
    return agg.select(
        "crop_id",
        F.when(empty, F.lit("")).otherwise(F.col("_all_text"))
        .alias("text"),
        F.when(empty, F.lit(0.0))
        .otherwise(F.col("_conf_sum") / F.col("regions"))
        .alias("confidence"),
        F.when(empty, F.lit(0)).otherwise(
            F.size(F.filter(F.split(F.col("_all_text"), r"\s+"),
                            lambda x: x != "")))
        .cast("long").alias("word_count"),
        F.col("regions").cast("long").alias("regions"),
        F.when(empty, F.lit("")).otherwise(
            F.array_join(methods, ",")).alias("methods_used"))


def simple_text(results: DataFrame) -> DataFrame:
    """extract_text_simple (:338-356): strip-gated ' ' join."""
    return results.groupBy("crop_id").agg(
        F.concat_ws(" ", F.transform(
            F.sort_array(F.collect_list(
                F.when(F.trim(F.col("text")) != "",
                       F.struct(F.col("idx").alias("i"),
                                F.col("text").alias("t"))))),
            lambda s: s["t"])).alias("text_joined"))


def icon_fragments(results: DataFrame, blocks: DataFrame) -> DataFrame:
    """extract_icon_metadata's OCR-fragment build (:524-555):

    - results filter: drop ``paddleocr_failed`` AND anything with
      neither stripping text NOR blocks (``r.text.strip() or
      r.blocks`` — the same falsy gate again);
    - fragments: one per block, carrying the block's text but the
      PARENT RESULT's confidence (pin: block confidence is the
      result-level 0.85, never per-block); results with no blocks but
      stripping text emit ONE fallback fragment with a NULL bbox.
    """
    kept = results.filter(
        (F.col("method") != "paddleocr_failed")
        & ((F.trim(F.col("text")) != "") | (F.col("n_blocks") > 0)))
    from_blocks = blocks.join(
        kept.select("call_id", "confidence"), "call_id").select(
        "call_id", F.col("region_idx").cast("long").alias("frag_idx"),
        F.col("text"), F.col("confidence"),
        F.lit(1).cast("int").alias("has_bbox"),
        F.col("x").cast("long"), F.col("y").cast("long"),
        F.col("w").cast("long"), F.col("h").cast("long"))
    fallback = kept.filter((F.col("n_blocks") == 0)
                           & (F.trim(F.col("text")) != "")).select(
        "call_id", F.lit(0).cast("long").alias("frag_idx"),
        F.col("text"), F.col("confidence"),
        F.lit(0).cast("int").alias("has_bbox"),
        F.lit(None).cast("long").alias("x"),
        F.lit(None).cast("long").alias("y"),
        F.lit(None).cast("long").alias("w"),
        F.lit(None).cast("long").alias("h"))
    return from_blocks.unionByName(fallback)


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------


def synth_paddle_calls(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.filter(e < 250).select(
        e.alias("call_id"),
        (e % 9 != 0).alias("manager_present"),
        F.when(e % 7 == 0, F.lit("parse_error"))
        .when(e % 7 == 1, F.lit("http_error"))
        .otherwise(F.lit("ok")).alias("outcome"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit("   "))  # whitespace-only (gate pin)
        .otherwise(F.concat(F.lit("txt-"), e)).alias("generated_text"),
        (1 + e % 3).cast("long").alias("attempts"),
        F.lit(4).cast("long").alias("max_attempts"),
        F.lit(100).cast("long").alias("img_w"),
        (64 * (1 + e % 3)).cast("long").alias("img_h"))


SYNTH_PADDLE_CALLS_SQL = """
    SELECT event_id AS call_id,
           event_id % 9 <> 0 AS manager_present,
           CASE event_id % 7 WHEN 0 THEN 'parse_error'
                WHEN 1 THEN 'http_error' ELSE 'ok' END AS outcome,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN '   '
                ELSE 'txt-' || CAST(event_id AS VARCHAR) END
               AS generated_text,
           CAST(1 + event_id % 3 AS BIGINT) AS attempts,
           CAST(4 AS BIGINT) AS max_attempts,
           CAST(100 AS BIGINT) AS img_w,
           CAST(64 * (1 + event_id % 3) AS BIGINT) AS img_h
    FROM events WHERE event_id < 250
"""

_N_CALLS = 250


def synth_paddle_regions(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    x0 = (e % 13) / F.lit(16.0)
    y0 = (e % 7) / F.lit(16.0)
    return events.filter(e < _N_CALLS * 3).select(
        (e % _N_CALLS).cast("long").alias("call_id"),
        F.floor(e / _N_CALLS).cast("long").alias("region_idx"),
        F.when(e % 6 == 0, F.lit(None).cast("string"))
        .when(e % 6 == 1, F.lit("  "))
        .otherwise(F.concat(F.lit("blk-"), e)).alias("content"),
        x0.alias("x0"), y0.alias("y0"),
        (x0 + (1 + e % 3) / F.lit(16.0)).alias("x1"),
        (y0 + (1 + e % 5) / F.lit(16.0)).alias("y1"))


SYNTH_PADDLE_REGIONS_SQL = f"""
    SELECT CAST(event_id % {_N_CALLS} AS BIGINT) AS call_id,
           CAST(event_id // {_N_CALLS} AS BIGINT) AS region_idx,
           CASE WHEN event_id % 6 = 0 THEN NULL
                WHEN event_id % 6 = 1 THEN '  '
                ELSE 'blk-' || CAST(event_id AS VARCHAR) END AS content,
           CAST(event_id % 13 AS DOUBLE) / 16.0 AS x0,
           CAST(event_id % 7 AS DOUBLE) / 16.0 AS y0,
           CAST(event_id % 13 AS DOUBLE) / 16.0
             + CAST(1 + event_id % 3 AS DOUBLE) / 16.0 AS x1,
           CAST(event_id % 7 AS DOUBLE) / 16.0
             + CAST(1 + event_id % 5 AS DOUBLE) / 16.0 AS y1
    FROM events WHERE event_id < {_N_CALLS * 3}
"""

_N_CROPS = 120


def synth_ocr_results(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.filter(e < _N_CROPS * 5).select(
        (e % _N_CROPS).cast("long").alias("crop_id"),
        F.floor(e / _N_CROPS).cast("long").alias("idx"),
        F.when(e % 7 == 0, F.lit(""))
        .when(e % 7 == 1, F.lit("  "))
        .otherwise(F.concat(F.lit("w"), e % 11, F.lit(" w"), e % 4))
        .alias("text"),
        ((e % 9) / F.lit(8.0)).alias("confidence"),  # dyadic eighths
        F.when(e % 8 == 0, F.lit(""))
        .when(e % 8 == 1, F.lit("paddleocr_failed"))
        .otherwise(F.lit("paddleocr")).alias("method"))


SYNTH_OCR_RESULTS_SQL = f"""
    SELECT CAST(event_id % {_N_CROPS} AS BIGINT) AS crop_id,
           CAST(event_id // {_N_CROPS} AS BIGINT) AS idx,
           CASE WHEN event_id % 7 = 0 THEN ''
                WHEN event_id % 7 = 1 THEN '  '
                ELSE 'w' || CAST(event_id % 11 AS VARCHAR) || ' w' ||
                     CAST(event_id % 4 AS VARCHAR) END AS text,
           CAST(event_id % 9 AS DOUBLE) / 8.0 AS confidence,
           CASE WHEN event_id % 8 = 0 THEN ''
                WHEN event_id % 8 = 1 THEN 'paddleocr_failed'
                ELSE 'paddleocr' END AS method
    FROM events WHERE event_id < {_N_CROPS * 5}
"""


def paddle_result_fold_sql() -> str:
    return f"""
        WITH calls AS ({SYNTH_PADDLE_CALLS_SQL}),
        regions AS ({SYNTH_PADDLE_REGIONS_SQL}),
        nb AS (SELECT call_id, CAST(count(*) AS BIGINT) AS n_blocks
               FROM regions
               WHERE trim(coalesce(content, '')) <> ''
               GROUP BY call_id),
        j AS (SELECT c.*, coalesce(nb.n_blocks, 0) AS n_blocks
              FROM calls c LEFT JOIN nb USING (call_id))
        SELECT call_id,
               CASE WHEN NOT manager_present OR outcome <> 'ok'
                    THEN 'paddleocr_failed' ELSE 'paddleocr' END AS method,
               CASE WHEN NOT manager_present OR outcome <> 'ok'
                    THEN 0.0 ELSE {SUCCESS_CONFIDENCE} END AS confidence,
               CASE WHEN manager_present AND outcome = 'ok'
                    THEN coalesce(generated_text, '') ELSE '' END AS text,
               CAST(CASE WHEN manager_present AND outcome = 'ok'
                         THEN n_blocks ELSE 0 END AS BIGINT) AS n_blocks,
               CAST(CASE WHEN NOT manager_present THEN 0
                         WHEN outcome = 'parse_error' THEN max_attempts
                         WHEN outcome = 'http_error' THEN 0
                         ELSE attempts END AS BIGINT) AS attempts_made,
               CAST(CASE WHEN manager_present AND outcome = 'ok'
                          AND trim(coalesce(generated_text, '')) = ''
                          AND n_blocks = 0
                         THEN 1 ELSE 0 END AS INT) AS is_no_text
        FROM j
    """


def blocks_pixels_sql() -> str:
    return f"""
        WITH calls AS ({SYNTH_PADDLE_CALLS_SQL}),
        regions AS ({SYNTH_PADDLE_REGIONS_SQL})
        SELECT r.call_id, r.region_idx, r.content AS text,
               CAST(trunc(r.x0 * c.img_w) AS INT) AS x,
               CAST(trunc(r.y0 * c.img_h) AS INT) AS y,
               CAST(trunc((r.x1 - r.x0) * c.img_w) AS INT) AS w,
               CAST(trunc((r.y1 - r.y0) * c.img_h) AS INT) AS h
        FROM regions r JOIN calls c USING (call_id)
        WHERE c.manager_present AND c.outcome = 'ok'
          AND trim(coalesce(r.content, '')) <> ''
    """


def confidence_agg_sql(min_confidence: float = DEFAULT_MIN_CONFIDENCE
                       ) -> str:
    return f"""
        WITH results AS ({SYNTH_OCR_RESULTS_SQL}),
        agg AS (
          SELECT crop_id,
                 CAST(sum(CASE WHEN confidence >= {min_confidence}
                               THEN 1 ELSE 0 END) AS BIGINT) AS regions,
                 sum(CASE WHEN confidence >= {min_confidence}
                          THEN confidence ELSE 0.0 END) AS conf_sum,
                 coalesce(string_agg(
                     CASE WHEN confidence >= {min_confidence}
                          THEN text END, ' ' ORDER BY idx), '')
                     AS all_text,
                 coalesce(string_agg(DISTINCT
                     CASE WHEN confidence >= {min_confidence}
                           AND method IS NOT NULL AND method <> ''
                          THEN method END, ',' ORDER BY
                     CASE WHEN confidence >= {min_confidence}
                           AND method IS NOT NULL AND method <> ''
                          THEN method END), '') AS methods_used
          FROM results GROUP BY crop_id)
        SELECT crop_id,
               CASE WHEN regions = 0 THEN '' ELSE all_text END AS text,
               CASE WHEN regions = 0 THEN 0.0
                    ELSE conf_sum / regions END AS confidence,
               CAST(CASE WHEN regions = 0 THEN 0
                    ELSE length(list_filter(regexp_split_to_array(
                        all_text, '\\s+'), x -> x <> '')) END AS BIGINT)
                   AS word_count,
               regions,
               CASE WHEN regions = 0 THEN '' ELSE methods_used END
                   AS methods_used
        FROM agg
    """


def simple_text_sql() -> str:
    return f"""
        WITH results AS ({SYNTH_OCR_RESULTS_SQL})
        SELECT crop_id,
               coalesce(string_agg(
                   CASE WHEN trim(text) <> '' THEN text END,
                   ' ' ORDER BY idx), '') AS text_joined
        FROM results GROUP BY crop_id
    """


def icon_fragments_sql() -> str:
    return f"""
        WITH calls AS ({SYNTH_PADDLE_CALLS_SQL}),
        regions AS ({SYNTH_PADDLE_REGIONS_SQL}),
        nb AS (SELECT call_id, CAST(count(*) AS BIGINT) AS n_blocks
               FROM regions
               WHERE trim(coalesce(content, '')) <> ''
               GROUP BY call_id),
        res AS (
          SELECT c.call_id,
                 CASE WHEN NOT c.manager_present OR c.outcome <> 'ok'
                      THEN 'paddleocr_failed' ELSE 'paddleocr' END
                     AS method,
                 CASE WHEN NOT c.manager_present OR c.outcome <> 'ok'
                      THEN 0.0 ELSE {SUCCESS_CONFIDENCE} END
                     AS confidence,
                 CASE WHEN c.manager_present AND c.outcome = 'ok'
                      THEN coalesce(c.generated_text, '') ELSE '' END
                     AS text,
                 CASE WHEN c.manager_present AND c.outcome = 'ok'
                      THEN coalesce(nb.n_blocks, 0) ELSE 0 END
                     AS n_blocks
          FROM calls c LEFT JOIN nb USING (call_id)),
        kept AS (SELECT * FROM res
                 WHERE method <> 'paddleocr_failed'
                   AND (trim(text) <> '' OR n_blocks > 0)),
        px AS (
          SELECT r.call_id, r.region_idx, r.content AS text,
                 CAST(trunc(r.x0 * c.img_w) AS BIGINT) AS x,
                 CAST(trunc(r.y0 * c.img_h) AS BIGINT) AS y,
                 CAST(trunc((r.x1 - r.x0) * c.img_w) AS BIGINT) AS w,
                 CAST(trunc((r.y1 - r.y0) * c.img_h) AS BIGINT) AS h
          FROM regions r JOIN calls c USING (call_id)
          WHERE c.manager_present AND c.outcome = 'ok'
            AND trim(coalesce(r.content, '')) <> '')
        SELECT p.call_id, CAST(p.region_idx AS BIGINT) AS frag_idx,
               p.text, k.confidence, CAST(1 AS INT) AS has_bbox,
               p.x, p.y, p.w, p.h
        FROM px p JOIN kept k USING (call_id)
        UNION ALL
        SELECT call_id, CAST(0 AS BIGINT) AS frag_idx, text, confidence,
               CAST(0 AS INT) AS has_bbox,
               NULL AS x, NULL AS y, NULL AS w, NULL AS h
        FROM kept WHERE n_blocks = 0 AND trim(text) <> ''
    """
