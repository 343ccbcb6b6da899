"""SLIG inference-service folds: the auto-mode detection ladder and the
label/auth shaping.

Re-expresses ``modal_app/slig.py:222-262,300-339`` (the ``_run`` mode
router and the HTTP surface; the model forward pass is GPU territory
and stubbed). Pinned behaviors:

- auto-mode ladder ORDER: dict-with-image(s)-key → similarity BEFORE
  the candidate_labels → zero_shot check (a similarity dict carrying
  labels still routes to similarity); then short-non-URL string/list →
  text_embedding; EVERYTHING else → image_embedding — so a ≥500-char
  text and any string starting with 'http' (even prose like
  'httpx is great') fall to IMAGE embedding (pin);
- the text check is ``startswith(("http", "data:"))`` — bare 'http'
  prefix, not a URL parse;
- a list routes to text_embedding only when ALL members pass the
  string check (one long/URL member flips the whole batch to
  image_embedding);
- an explicit unknown mode raises ValueError → HTTP 400 (not 500);
- zero-shot labels: absent → the default photo/illustration/diagram
  trio; a STRING splits on commas with per-item strip;
- bearer auth is EXACT string equality 'Bearer {key}' — case and
  whitespace sensitive; /health is unauthenticated.

Map-side when-chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LABELS = ("photo", "illustration", "diagram")
_MODES = ("auto", "zero_shot", "image_embedding", "text_embedding",
          "similarity")


def slig_mode_route(reqs: DataFrame) -> DataFrame:
    """Resolve the effective mode + HTTP status for one /infer call.

    Input shape descriptors: ``input_kind`` ∈ dict_images / dict_other
    / str / list_str; ``str_prefix`` + ``str_len`` describe the (first)
    string member; ``all_members_short_nonurl`` covers the list case.
    """
    text_like_str = ((F.col("input_kind") == "str")
                     & ~F.col("str_prefix").isin("http", "data:")
                     & (F.col("str_len") < 500))
    text_like_list = ((F.col("input_kind") == "list_str")
                      & F.col("all_members_short_nonurl"))
    auto = (F.when(F.col("input_kind") == "dict_images", "similarity")
            .when(F.col("has_candidate_labels"), "zero_shot")
            .when(text_like_str | text_like_list, "text_embedding")
            .otherwise("image_embedding"))
    resolved = (F.when(F.col("mode_param") == "auto", auto)
                .when(F.col("mode_param").isin(*_MODES),
                      F.col("mode_param"))
                .otherwise(F.lit(None).cast("string")))
    bad_mode = resolved.isNull()
    auth_ok = (F.col("auth_header")
               == F.concat(F.lit("Bearer "), F.col("api_key")))
    labels_raw = F.col("candidate_labels_str")
    labels = (F.when(~F.col("has_candidate_labels"),
                     F.array(*[F.lit(x) for x in DEFAULT_LABELS]))
              .otherwise(F.transform(F.split(labels_raw, ","),
                                     lambda s: F.trim(s))))
    return reqs.select(
        "req_id",
        F.when(~auth_ok, 401).when(bad_mode, 400).otherwise(200)
        .cast("int").alias("status"),
        F.when(auth_ok & ~bad_mode, resolved)
        .otherwise(F.lit(None).cast("string")).alias("resolved_mode"),
        F.when(auth_ok & (resolved == "zero_shot"), F.size(labels))
        .otherwise(F.lit(None).cast("int")).alias("n_labels"),
        F.when(auth_ok & (resolved == "zero_shot"),
               F.element_at(labels, 1))
        .otherwise(F.lit(None).cast("string")).alias("first_label"))


def synth_slig_infer_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        F.element_at(F.array(
            F.lit("auto"), F.lit("auto"), F.lit("auto"),
            F.lit("zero_shot"), F.lit("image_embedding"),
            F.lit("text_embedding"), F.lit("similarity"),
            F.lit("banana")), (e % 8 + 1).cast("int"))
        .alias("mode_param"),
        F.element_at(F.array(
            F.lit("dict_images"), F.lit("dict_other"), F.lit("str"),
            F.lit("str"), F.lit("str"), F.lit("list_str")),
            (e % 6 + 1).cast("int")).alias("input_kind"),
        F.element_at(F.array(
            F.lit("http"), F.lit("data:"), F.lit("plain"),
            F.lit("plain"), F.lit("plain")),
            (e % 5 + 1).cast("int")).alias("str_prefix"),
        F.when(e % 4 == 0, F.lit(900)).otherwise((e % 400).cast("int"))
        .alias("str_len"),
        (e % 3 != 0).alias("all_members_short_nonurl"),
        (e % 5 == 0).alias("has_candidate_labels"),
        F.when(e % 2 == 0, F.lit(" marble tile , wood floor,ceramic "))
        .otherwise(F.lit("a,b")).alias("candidate_labels_str"),
        F.lit("k123").alias("api_key"),
        F.element_at(F.array(
            F.lit("Bearer k123"), F.lit("bearer k123"),
            F.lit("Bearer  k123"), F.lit("Bearer k123"),
            F.lit("Basic k123"), F.lit("Bearer k123")),
            (e % 6 + 1).cast("int")).alias("auth_header"))


SYNTH_SLIG_INFER_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           (['auto', 'auto', 'auto', 'zero_shot', 'image_embedding',
             'text_embedding', 'similarity', 'banana'])
             [CAST(event_id % 8 AS INT) + 1] AS mode_param,
           (['dict_images', 'dict_other', 'str', 'str', 'str',
             'list_str'])[CAST(event_id % 6 AS INT) + 1] AS input_kind,
           (['http', 'data:', 'plain', 'plain', 'plain'])
             [CAST(event_id % 5 AS INT) + 1] AS str_prefix,
           CAST(CASE WHEN event_id % 4 = 0 THEN 900
                ELSE event_id % 400 END AS INT) AS str_len,
           event_id % 3 <> 0 AS all_members_short_nonurl,
           event_id % 5 = 0 AS has_candidate_labels,
           CASE WHEN event_id % 2 = 0
                THEN ' marble tile , wood floor,ceramic '
                ELSE 'a,b' END AS candidate_labels_str,
           'k123' AS api_key,
           (['Bearer k123', 'bearer k123', 'Bearer  k123',
             'Bearer k123', 'Basic k123', 'Bearer k123'])
             [CAST(event_id % 6 AS INT) + 1] AS auth_header
    FROM events
"""


def slig_mode_sql() -> str:
    modes = ", ".join(f"'{m}'" for m in _MODES)
    labels_default = ", ".join(f"'{x}'" for x in DEFAULT_LABELS)
    return f"""
        WITH r AS ({SYNTH_SLIG_INFER_SQL}),
        g AS (
          SELECT *,
                 input_kind = 'str'
                   AND str_prefix NOT IN ('http', 'data:')
                   AND str_len < 500 AS text_str,
                 input_kind = 'list_str' AND all_members_short_nonurl
                     AS text_list
          FROM r),
        h AS (
          SELECT *,
                 CASE WHEN mode_param = 'auto' THEN
                   CASE WHEN input_kind = 'dict_images'
                        THEN 'similarity'
                        WHEN has_candidate_labels THEN 'zero_shot'
                        WHEN text_str OR text_list
                        THEN 'text_embedding'
                        ELSE 'image_embedding' END
                 WHEN mode_param IN ({modes}) THEN mode_param
                 END AS resolved,
                 auth_header = 'Bearer ' || api_key AS auth_ok
          FROM g),
        i AS (
          SELECT *,
                 CASE WHEN NOT has_candidate_labels
                      THEN [{labels_default}]
                      ELSE list_transform(
                          string_split(candidate_labels_str, ','),
                          s -> trim(s)) END AS labels
          FROM h)
        SELECT req_id,
               CAST(CASE WHEN NOT auth_ok THEN 401
                    WHEN resolved IS NULL THEN 400
                    ELSE 200 END AS INT) AS status,
               CASE WHEN auth_ok AND resolved IS NOT NULL
                    THEN resolved END AS resolved_mode,
               CAST(CASE WHEN auth_ok AND resolved = 'zero_shot'
                    THEN len(labels) END AS INT) AS n_labels,
               CASE WHEN auth_ok AND resolved = 'zero_shot'
                    THEN labels[1] END AS first_label
        FROM i
    """
