"""Icon-metadata spec rollup + product page-body text
(app/api/pdf_processing/stage_4_products.py:893-1035,1096-1238).

Three deterministic Stage-4 folds around the (LLM) icon prompt output:

* ``_fetch_known_spec_fields`` (:1096-1124): the canonical spec
  vocabulary — DISTINCT non-falsy ``field_name`` from
  ``material_metadata_fields``, sorted;
* ``_merge_icon_metadata_into_product`` (:1127-1238): walk ALL
  document_images of the document (deliberately NOT filtered by the
  product's image indices — Stage 3 routes icons past the product
  object, pinned in the reference comment), explode icon_metadata
  items, and fold to one value per spec field:
  - falsy raw field_name → skipped SILENTLY (not counted unknown);
  - normalize = strip + the ICON_FIELD_NAME_NORMALIZATION alias map
    ('certification' → 'certifications');
  - normalized-but-unknown fields are DROPPED and counted — the top-20
    counts (desc) persist under the ``_unknown_field_counts`` sentinel
    (audit fix #42); a known field with an empty value (None/''/[])
    is skipped AFTER the known check, so it is neither rolled up nor
    counted unknown (pin);
  - conflict resolution: highest ``float(confidence or 0.0)`` wins
    with STRICT ``>`` — the first item in scan order keeps the field
    on ties (scan order = DB row order then item order; canonicalized
    here as (image_id, item_idx));
  - empty known_spec_fields short-circuits to {} before any read.
* ``build_product_page_body_text`` (:999-1035): the product's
  reading-order body text — de-dup + sort the cached pages, keep
  pages whose text STRIPS non-empty but join the RAW texts with
  ``\\n\\n`` (pin: the filter strips, the join does not), strip the
  result, then truncate to ``PRODUCT_BODY_TEXT_MAX_CHARS`` with
  ``rstrip`` after the cut.

Scale: the rollup is one explode + (doc, field)-keyed max-struct agg
(map-side combinable); the unknown counts are a second small agg; body
text is one per-doc sorted string_agg — page text crosses the shuffle
once, bounded by the cache's per-page text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ICON_FIELD_ALIASES = {"certification": "certifications"}
PRODUCT_BODY_TEXT_MAX_CHARS = 4000


def known_spec_fields(fields: DataFrame) -> DataFrame:
    """Distinct non-falsy field_name, sorted (sort is presentation —
    the consumer is a membership set)."""
    return (fields.where(F.coalesce("field_name", F.lit("")) != "")
            .select("field_name").distinct())


def _normalized(col):
    t = F.trim(col)
    out = t
    for raw, canon in ICON_FIELD_ALIASES.items():
        out = F.when(t == raw, F.lit(canon)).otherwise(out)
    return out


def icon_rollup(items: DataFrame, fields: DataFrame) -> DataFrame:
    """items: (document_id, image_id, item_idx, field_name, value,
    confidence) — one exploded icon_metadata entry per row. Returns
    one (document_id, field, value, confidence) per winning field."""
    known = known_spec_fields(fields).select(
        F.col("field_name").alias("_kf"))
    it = (items
          .where(F.coalesce("field_name", F.lit("")) != "")
          .withColumn("_field", _normalized(F.col("field_name")))
          .join(F.broadcast(known), F.col("_field") == F.col("_kf"),
                "inner")
          .where(F.coalesce("value", F.lit("")) != "")
          .withColumn("_conf",
                      F.coalesce(F.col("confidence"), F.lit(0.0))))
    # strict > keeps the FIRST scan-order item among equal
    # confidences: max_by on (conf, -image_id, -item_idx)
    pick = F.struct(
        F.col("_conf").alias("c"),
        (-F.col("image_id")).alias("i1"),
        (-F.col("item_idx")).alias("i2"),
        F.col("value").alias("v"))
    return (it.groupBy("document_id", F.col("_field").alias("field"))
            .agg(F.max(pick).alias("_w"))
            .select("document_id", "field",
                    F.col("_w.v").alias("value"),
                    F.col("_w.c").alias("confidence")))


def icon_unknown_counts(items: DataFrame, fields: DataFrame,
                        top: int = 20) -> DataFrame:
    """The _unknown_field_counts sentinel content: per document, the
    top-`top` dropped field names by count desc (ties canonicalized
    by field name; the reference's stable sort keeps first-seen)."""
    from pyspark.sql import Window
    known = known_spec_fields(fields).select(
        F.col("field_name").alias("_kf"))
    unk = (items
           .where(F.coalesce("field_name", F.lit("")) != "")
           .withColumn("_field", _normalized(F.col("field_name")))
           .join(F.broadcast(known), F.col("_field") == F.col("_kf"),
                 "left_anti"))
    counts = (unk.groupBy("document_id",
                          F.col("_field").alias("field"))
              .agg(F.count("*").cast("long").alias("n")))
    w = (Window.partitionBy("document_id")
         .orderBy(F.col("n").desc(), "field"))
    return (counts.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= top)
            .select("document_id", "field", "n",
                    F.col("rk").cast("int").alias("rk")))


def page_body_text(cache: DataFrame,
                   max_chars: int = PRODUCT_BODY_TEXT_MAX_CHARS
                   ) -> DataFrame:
    """cache: (document_id, page1, text) — one cached reading-order
    text per physical page. Returns (document_id, body_text)."""
    kept = (cache.where(F.trim(F.coalesce("text", F.lit(""))) != "")
            .groupBy("document_id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("page1", "text"))),
                    lambda s: s["text"]),
                "\n\n").alias("_joined")))
    body = F.trim(F.col("_joined"))
    truncated = F.when(
        F.length(body) > max_chars,
        F.rtrim(F.substring(body, 1, max_chars))).otherwise(body)
    return kept.select("document_id", truncated.alias("body_text"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

_SYNTH_FIELDS = ("certifications", "slip_rating", "frost_resistant",
                 "pei_rating", "water_absorption", "thickness_mm")


def synth_spec_fields(events: DataFrame) -> DataFrame:
    """A small dimension with dupes and a falsy row."""
    e = F.col("event_id")
    return (events.where(e % 40 == 0)
            .select(F.when(e % 80 == 0, F.lit(""))
                    .otherwise(F.element_at(
                        F.array(*[F.lit(x) for x in _SYNTH_FIELDS]),
                        (e % 6 + 1).cast("int")))
                    .alias("field_name")))


SYNTH_SPEC_FIELDS_SQL = """
    SELECT CASE WHEN event_id % 80 = 0 THEN ''
           ELSE ['certifications', 'slip_rating', 'frost_resistant',
                 'pei_rating', 'water_absorption', 'thickness_mm']
                [CAST(event_id % 6 + 1 AS INT)] END AS field_name
    FROM events WHERE event_id % 40 = 0
"""


def synth_icon_items(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    raw = (F.when(e % 11 == 0, F.lit(None).cast("string"))
           .when(e % 11 == 1, F.lit(""))
           .when(e % 11 == 2, F.lit(" certification "))   # alias + trim
           .when(e % 11 == 3, F.lit("made_up_field"))
           .when(e % 11 == 4, F.lit("another_unknown"))
           .otherwise(F.element_at(
               F.array(*[F.lit(x) for x in _SYNTH_FIELDS]),
               (e % 6 + 1).cast("int"))))
    return events.select(
        (e % 47).cast("long").alias("document_id"),
        (e % 9).cast("long").alias("image_id"),
        F.floor(e / 9).cast("int").alias("item_idx"),
        raw.alias("field_name"),
        F.when(e % 13 == 0, F.lit(None).cast("string"))
        .when(e % 13 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("v"), (e % 23).cast("string")))
        .alias("value"),
        F.when(e % 17 == 0, F.lit(None).cast("double"))
        .otherwise(F.round((e % 10) / 10.0, 1)).alias("confidence"))


SYNTH_ICON_ITEMS_SQL = """
    SELECT CAST(event_id % 47 AS BIGINT) AS document_id,
           CAST(event_id % 9 AS BIGINT) AS image_id,
           CAST(event_id // 9 AS INT) AS item_idx,
           CASE WHEN event_id % 11 = 0 THEN NULL
                WHEN event_id % 11 = 1 THEN ''
                WHEN event_id % 11 = 2 THEN ' certification '
                WHEN event_id % 11 = 3 THEN 'made_up_field'
                WHEN event_id % 11 = 4 THEN 'another_unknown'
                ELSE ['certifications', 'slip_rating',
                      'frost_resistant', 'pei_rating',
                      'water_absorption', 'thickness_mm']
                     [CAST(event_id % 6 + 1 AS INT)] END AS field_name,
           CASE WHEN event_id % 13 = 0 THEN NULL
                WHEN event_id % 13 = 1 THEN ''
                ELSE 'v' || CAST(event_id % 23 AS VARCHAR) END
               AS value,
           CASE WHEN event_id % 17 = 0 THEN NULL
                ELSE round((event_id % 10) / 10.0, 1) END
               AS confidence
    FROM events
"""

_NORM_SQL = """CASE WHEN trim(field_name) = 'certification'
                    THEN 'certifications'
                    ELSE trim(field_name) END"""


def icon_rollup_sql() -> str:
    return f"""
        WITH it AS ({SYNTH_ICON_ITEMS_SQL}),
        kf AS (SELECT DISTINCT field_name FROM
               ({SYNTH_SPEC_FIELDS_SQL})
               WHERE coalesce(field_name, '') <> ''),
        n AS (
          SELECT document_id, image_id, item_idx,
                 {_NORM_SQL} AS field, value,
                 coalesce(confidence, 0.0) AS conf
          FROM it WHERE coalesce(field_name, '') <> ''),
        k AS (
          SELECT n.* FROM n JOIN kf ON n.field = kf.field_name
          WHERE coalesce(n.value, '') <> ''),
        r AS (
          SELECT *, row_number() OVER (
                     PARTITION BY document_id, field
                     ORDER BY conf DESC, image_id, item_idx) AS rk
          FROM k)
        SELECT document_id, field, value, conf AS confidence
        FROM r WHERE rk = 1
    """


def icon_unknown_sql(top: int = 20) -> str:
    return f"""
        WITH it AS ({SYNTH_ICON_ITEMS_SQL}),
        kf AS (SELECT DISTINCT field_name FROM
               ({SYNTH_SPEC_FIELDS_SQL})
               WHERE coalesce(field_name, '') <> ''),
        n AS (
          SELECT document_id, {_NORM_SQL} AS field
          FROM it WHERE coalesce(field_name, '') <> ''),
        u AS (
          SELECT n.* FROM n
          WHERE NOT EXISTS (SELECT 1 FROM kf
                            WHERE kf.field_name = n.field)),
        c AS (
          SELECT document_id, field,
                 CAST(count(*) AS BIGINT) AS n
          FROM u GROUP BY document_id, field),
        r AS (
          SELECT *, row_number() OVER (
                     PARTITION BY document_id
                     ORDER BY n DESC, field) AS rk
          FROM c)
        SELECT document_id, field, n, CAST(rk AS INT) AS rk
        FROM r WHERE rk <= {top}
    """


def synth_page_cache(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        (e % 53).cast("long").alias("document_id"),
        F.floor(e / 53).cast("int").alias("page1"),
        # whitespace cases are SPACE-only: the engines' trim/rtrim
        # strip ASCII spaces, Python's .strip() all whitespace — the
        # synth stays inside the common subset (documented scope)
        F.when(e % 6 == 0, F.lit(""))
        .when(e % 6 == 1, F.lit("    "))
        .otherwise(F.concat(F.lit(" page text "),
                            F.repeat(F.lit("x"),
                                     ((e % 30) * 9).cast("int")),
                            F.lit(" ")))
        .alias("text"))


SYNTH_PAGE_CACHE_SQL = """
    SELECT CAST(event_id % 53 AS BIGINT) AS document_id,
           CAST(event_id // 53 AS INT) AS page1,
           CASE WHEN event_id % 6 = 0 THEN ''
                WHEN event_id % 6 = 1 THEN '    '
                ELSE ' page text '
                     || repeat('x', CAST((event_id % 30) * 9 AS INT))
                     || ' ' END AS text
    FROM events
"""


def page_body_sql(max_chars: int = PRODUCT_BODY_TEXT_MAX_CHARS) -> str:
    return f"""
        WITH c AS ({SYNTH_PAGE_CACHE_SQL}),
        k AS (SELECT * FROM c
              WHERE trim(coalesce(text, '')) <> ''),
        j AS (
          SELECT document_id,
                 trim(string_agg(text, chr(10) || chr(10)
                                 ORDER BY page1)) AS body
          FROM k GROUP BY document_id)
        SELECT document_id,
               CASE WHEN length(body) > {max_chars}
                    THEN rtrim(substring(body, 1, {max_chars}))
                    ELSE body END AS body_text
        FROM j
    """
