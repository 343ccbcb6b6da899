"""Knowledge-base save row shaping
(app/services/core/supabase_client.py:647-832,
``save_knowledge_base_entries``).

The chunk/image pipelines themselves are covered elsewhere; this folds
the legacy batch-save's deterministic row shaping:

* chunk rows: only non-empty (stripped) STRING chunks are saved, but
  ``chunk_index`` keeps the ORIGINAL enumerate position — skipped
  empties leave GAPS in the index sequence (pin);
  ``chunk_number = i + 1``; ``page_number`` hardcodes 1;
  ``chunk_length = len(content)`` (unstripped); workspace_id is
  stamped only when truthy;
* image rows: URL ladder ``storage_url or url or path or public_url``
  with a ``placeholder_image_{i}.jpg`` fallback, and every
  placeholder-PREFIXED url is then dropped — including a genuine url
  that happens to start with ``placeholder_`` (pin); a non-dict image
  stringifies as the url with page 1 / ``Image {i+1}`` caption;
  ``page = page or page_number or 1`` — an explicit page 0 falls
  through BOTH tiers to 1 (falsy-or pin); caption ladder
  ``caption or description or 'Image {i+1}'``;
  ``extraction_layer or 'embedded'``; fixed confidence 0.95;
  storage defaults (uploaded False, bucket 'pdf-tiles') apply only on
  the dict path;
* summary: chunks_saved / images_saved / total_saved.

Scale: two map-side projections + one rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _falsy_or(*cols):
    out = None
    for c in cols:
        b = F.when(F.coalesce(c, F.lit("")) != "", c)
        out = b if out is None else F.coalesce(out, b)
    return out


def chunk_rows(chunks: DataFrame) -> DataFrame:
    """chunks: (document_id, i, content, is_string)."""
    keep = F.col("is_string") \
        & (F.trim(F.coalesce("content", F.lit(""))) != "")
    return (chunks.where(keep)
            .select("document_id",
                    F.col("i").cast("int").alias("chunk_index"),
                    "content",
                    (F.col("i") + 1).cast("int").alias("chunk_number"),
                    F.length("content").cast("int")
                    .alias("chunk_length"),
                    F.lit(1).alias("page_number"),
                    F.when(F.coalesce("workspace_id", F.lit("")) != "",
                           F.col("workspace_id"))
                    .alias("workspace_id_out")))


def image_rows(images: DataFrame) -> DataFrame:
    """images: (document_id, i, is_dict, storage_url, url, path,
    public_url, page, page_number, caption, description,
    extraction_layer, storage_uploaded, raw_str, workspace_id)."""
    placeholder = F.concat(F.lit("placeholder_image_"),
                           F.col("i").cast("string"), F.lit(".jpg"))
    dict_url = F.coalesce(
        _falsy_or(F.col("storage_url"), F.col("url"), F.col("path"),
                  F.col("public_url")), placeholder)
    str_url = F.when(F.coalesce("raw_str", F.lit("")) != "",
                     F.col("raw_str")).otherwise(placeholder)
    u = F.when(F.col("is_dict"), dict_url).otherwise(str_url)
    default_caption = F.concat(F.lit("Image "),
                               (F.col("i") + 1).cast("string"))
    page = F.when(
        F.col("is_dict"),
        F.coalesce(F.when(F.coalesce("page", F.lit(0)) != 0,
                          F.col("page")),
                   F.when(F.coalesce("page_number", F.lit(0)) != 0,
                          F.col("page_number")),
                   F.lit(1))).otherwise(F.lit(1))
    caption = F.when(
        F.col("is_dict"),
        F.coalesce(_falsy_or(F.col("caption"), F.col("description")),
                   default_caption)).otherwise(default_caption)
    layer = F.when(
        F.col("is_dict"),
        F.coalesce(F.when(F.coalesce("extraction_layer",
                                     F.lit("")) != "",
                          F.col("extraction_layer")),
                   F.lit("embedded"))).otherwise(F.lit("embedded"))
    return (images
            .where(~u.startswith("placeholder_"))   # drops real ones too
            .select("document_id",
                    F.col("i").cast("int").alias("image_index"),
                    u.alias("image_url"),
                    F.lit("material_sample").alias("image_type"),
                    caption.alias("caption"),
                    page.cast("int").alias("page_number"),
                    F.lit(0.95).alias("confidence"),
                    layer.alias("extraction_layer"),
                    F.when(F.col("is_dict"),
                           F.coalesce("storage_uploaded",
                                      F.lit(False)))
                    .otherwise(F.lit(False)).cast("string")
                    .alias("storage_uploaded"),
                    F.when(F.col("is_dict")
                           & (F.coalesce("storage_bucket",
                                         F.lit("")) != ""),
                           F.col("storage_bucket"))
                    .otherwise(F.lit("pdf-tiles"))
                    .alias("storage_bucket")))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------


def synth_kb_chunk_inputs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        (e % 29).cast("long").alias("document_id"),
        F.floor(e / 29).cast("int").alias("i"),
        F.when(e % 6 == 0, F.lit(""))
        .when(e % 6 == 1, F.lit("   "))
        .when(e % 6 == 2, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("chunk text "),
                            (e % 17).cast("string")))
        .alias("content"),
        (e % 7 != 0).alias("is_string"),
        F.when(e % 4 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("ws"), (e % 3).cast("string")))
        .alias("workspace_id"))


SYNTH_KB_CHUNK_INPUTS_SQL = """
    SELECT CAST(event_id % 29 AS BIGINT) AS document_id,
           CAST(event_id // 29 AS INT) AS i,
           CASE WHEN event_id % 6 = 0 THEN ''
                WHEN event_id % 6 = 1 THEN '   '
                WHEN event_id % 6 = 2 THEN NULL
                ELSE 'chunk text ' || CAST(event_id % 17 AS VARCHAR)
                END AS content,
           event_id % 7 <> 0 AS is_string,
           CASE WHEN event_id % 4 = 0 THEN ''
                ELSE 'ws' || CAST(event_id % 3 AS VARCHAR) END
               AS workspace_id
    FROM events
"""


def chunk_rows_sql() -> str:
    return f"""
        WITH c AS ({SYNTH_KB_CHUNK_INPUTS_SQL})
        SELECT document_id, CAST(i AS INT) AS chunk_index, content,
               CAST(i + 1 AS INT) AS chunk_number,
               CAST(length(content) AS INT) AS chunk_length,
               1 AS page_number,
               CASE WHEN coalesce(workspace_id, '') <> ''
                    THEN workspace_id END AS workspace_id_out
        FROM c
        WHERE is_string AND trim(coalesce(content, '')) <> ''
    """


def synth_kb_image_inputs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 3 == 0)
            .select((e % 29).cast("long").alias("document_id"),
                    F.floor(e / 29).cast("int").alias("i"),
                    (e % 5 != 0).alias("is_dict"),
                    F.when(e % 4 == 0,
                           F.concat(F.lit("https://st/"),
                                    e.cast("string")))
                    .when(e % 4 == 1,
                          F.lit("placeholder_real_url.jpg"))
                    .otherwise(F.lit("")).alias("storage_url"),
                    F.when(e % 7 == 0,
                           F.concat(F.lit("https://u/"),
                                    e.cast("string")))
                    .otherwise(F.lit(None).cast("string"))
                    .alias("url"),
                    F.when(e % 11 == 0,
                           F.concat(F.lit("/p/"), e.cast("string")))
                    .otherwise(F.lit("")).alias("path"),
                    F.when(e % 13 == 0,
                           F.concat(F.lit("https://pub/"),
                                    e.cast("string")))
                    .otherwise(F.lit(None).cast("string"))
                    .alias("public_url"),
                    (e % 9 - 1).cast("int").alias("page"),
                    F.when(e % 6 == 0, F.lit(0))
                    .otherwise((e % 14).cast("int"))
                    .alias("page_number"),
                    F.when(e % 8 == 0, F.lit(""))
                    .otherwise(F.concat(F.lit("cap "),
                                        (e % 5).cast("string")))
                    .alias("caption"),
                    F.concat(F.lit("desc "), (e % 4).cast("string"))
                    .alias("description"),
                    F.when(e % 10 == 0, F.lit(""))
                    .when(e % 10 < 5, F.lit("render"))
                    .otherwise(F.lit(None).cast("string"))
                    .alias("extraction_layer"),
                    F.when(e % 12 == 0, F.lit(None).cast("boolean"))
                    .otherwise(e % 2 == 0).alias("storage_uploaded"),
                    F.when(e % 16 == 0, F.lit(""))
                    .otherwise(F.lit("custom-bucket"))
                    .alias("storage_bucket"),
                    F.when(e % 17 == 0, F.lit(""))
                    .otherwise(F.concat(F.lit("https://s/"),
                                        e.cast("string")))
                    .alias("raw_str")))


SYNTH_KB_IMAGE_INPUTS_SQL = """
    SELECT CAST(event_id % 29 AS BIGINT) AS document_id,
           CAST(event_id // 29 AS INT) AS i,
           event_id % 5 <> 0 AS is_dict,
           CASE WHEN event_id % 4 = 0
                THEN 'https://st/' || CAST(event_id AS VARCHAR)
                WHEN event_id % 4 = 1 THEN 'placeholder_real_url.jpg'
                ELSE '' END AS storage_url,
           CASE WHEN event_id % 7 = 0
                THEN 'https://u/' || CAST(event_id AS VARCHAR) END
               AS url,
           CASE WHEN event_id % 11 = 0
                THEN '/p/' || CAST(event_id AS VARCHAR)
                ELSE '' END AS path,
           CASE WHEN event_id % 13 = 0
                THEN 'https://pub/' || CAST(event_id AS VARCHAR) END
               AS public_url,
           CAST(event_id % 9 - 1 AS INT) AS page,
           CAST(CASE WHEN event_id % 6 = 0 THEN 0
                ELSE event_id % 14 END AS INT) AS page_number,
           CASE WHEN event_id % 8 = 0 THEN ''
                ELSE 'cap ' || CAST(event_id % 5 AS VARCHAR) END
               AS caption,
           'desc ' || CAST(event_id % 4 AS VARCHAR) AS description,
           CASE WHEN event_id % 10 = 0 THEN ''
                WHEN event_id % 10 < 5 THEN 'render' END
               AS extraction_layer,
           CASE WHEN event_id % 12 = 0 THEN NULL
                ELSE event_id % 2 = 0 END AS storage_uploaded,
           CASE WHEN event_id % 16 = 0 THEN ''
                ELSE 'custom-bucket' END AS storage_bucket,
           CASE WHEN event_id % 17 = 0 THEN ''
                ELSE 'https://s/' || CAST(event_id AS VARCHAR) END
               AS raw_str
    FROM events WHERE event_id % 3 = 0
"""

_IMG_URL_SQL = """
    CASE WHEN is_dict THEN coalesce(
             CASE WHEN coalesce(storage_url, '') <> ''
                  THEN storage_url
                  WHEN coalesce(url, '') <> '' THEN url
                  WHEN coalesce(path, '') <> '' THEN path
                  WHEN coalesce(public_url, '') <> ''
                  THEN public_url END,
             'placeholder_image_' || CAST(i AS VARCHAR) || '.jpg')
         WHEN coalesce(raw_str, '') <> '' THEN raw_str
         ELSE 'placeholder_image_' || CAST(i AS VARCHAR) || '.jpg'
         END
"""


def image_rows_sql() -> str:
    return f"""
        WITH x AS ({SYNTH_KB_IMAGE_INPUTS_SQL}),
        u AS (SELECT *, {_IMG_URL_SQL} AS img_url FROM x)
        SELECT document_id, CAST(i AS INT) AS image_index,
               img_url AS image_url,
               'material_sample' AS image_type,
               CASE WHEN is_dict THEN coalesce(
                      CASE WHEN coalesce(caption, '') <> ''
                           THEN caption
                           WHEN coalesce(description, '') <> ''
                           THEN description END,
                      'Image ' || CAST(i + 1 AS VARCHAR))
                    ELSE 'Image ' || CAST(i + 1 AS VARCHAR) END
                   AS caption,
               CAST(CASE WHEN is_dict THEN coalesce(
                      CASE WHEN coalesce(page, 0) <> 0 THEN page END,
                      CASE WHEN coalesce(page_number, 0) <> 0
                           THEN page_number END, 1)
                    ELSE 1 END AS INT) AS page_number,
               0.95 AS confidence,
               CASE WHEN is_dict THEN coalesce(
                      CASE WHEN coalesce(extraction_layer, '') <> ''
                           THEN extraction_layer END, 'embedded')
                    ELSE 'embedded' END AS extraction_layer,
               CAST(CASE WHEN is_dict
                    THEN coalesce(storage_uploaded, FALSE)
                    ELSE FALSE END AS VARCHAR) AS storage_uploaded,
               CASE WHEN is_dict
                         AND coalesce(storage_bucket, '') <> ''
                    THEN storage_bucket
                    ELSE 'pdf-tiles' END AS storage_bucket
        FROM u
        WHERE NOT starts_with(img_url, 'placeholder_')
    """
