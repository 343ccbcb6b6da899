"""Internal-pipeline stage-reporting folds.

Re-expresses ``app/api/internal_routes.py:67-178`` (the post-JobTracker
``report_stage`` + the D19/D20 internal-access gate). The reference pins
these with a source-level lint test (tests/unit/
test_pipeline_stage_reporting.py); here they are data folds:

- ``report_stage_fold``    — internal_routes.py:77-138
  (unknown stage key → logged and NOTHING recorded (pin); the 6-key
  ``_PIPELINE_STAGES`` map supplies (coarse stage, stage_name); a
  LIVE tracker that raises falls through to the append-only history
  event rather than fabricating a fresh tracker (the
  zero-overwrite-protection pin); history status is 'completed' only
  at percent >= 100; ``details or {}``; history-append failure is
  swallowed → recorded 'none')
- ``internal_access_gate`` — internal_routes.py:150-170
  (D19/D20: an UNCONFIGURED cron secret silently falls through to the
  JWT check — fail-open-to-JWT, the opposite of the catalog route's
  fail-closed secret (pin); 'Bearer ' prefix is case-SENSITIVE here;
  invalid JWT → 401)

Map-side when-chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PIPELINE_STAGES = {
    "IMAGE_CLASSIFICATION": ("EXTRACTING_IMAGES",
                             "image_classification"),
    "IMAGE_UPLOAD": ("SAVING_TO_DATABASE", "image_upload"),
    "IMAGE_SAVE_AND_CLIP": ("GENERATING_EMBEDDINGS",
                            "image_save_and_embeddings"),
    "CHUNKING": ("EXTRACTING_TEXT", "chunking"),
    "RELATIONSHIPS": ("FINALIZING", "relationships"),
    "METADATA_EXTRACTION": ("ANALYZING_STRUCTURE",
                            "metadata_extraction"),
}


def report_stage_fold(reports: DataFrame) -> DataFrame:
    mapped_name = F.col("stage_key")
    for k, (_, name) in PIPELINE_STAGES.items():
        mapped_name = F.when(F.col("stage_key") == k, name) \
            .otherwise(mapped_name)
    known = F.col("stage_key").isin(*PIPELINE_STAGES.keys())
    coarse = F.lit(None).cast("string")
    for k, (stage, _) in PIPELINE_STAGES.items():
        coarse = F.when(F.col("stage_key") == k, stage) \
            .otherwise(coarse)
    live = F.col("tracker_found") & ~F.col("tracker_lookup_raised")
    live_ok = live & ~F.col("live_update_raised")
    history = known & ~live_ok
    hist_ok = history & ~F.col("history_append_raised")
    return reports.select(
        "report_id",
        F.when(~known, "dropped_unknown_key")
        .when(live_ok, "live")
        .when(hist_ok, "history")
        .otherwise("none").alias("recorded"),
        F.when(known, coarse).otherwise(F.lit(None).cast("string"))
        .alias("coarse_stage"),
        F.when(known, mapped_name)
        .otherwise(F.lit(None).cast("string")).alias("stage_name"),
        F.when(hist_ok,
               F.when(F.col("percent") >= 100, "completed")
               .otherwise("in_progress"))
        .otherwise(F.lit(None).cast("string")).alias("history_status"))


def synth_stage_reports(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    keys = list(PIPELINE_STAGES.keys()) + ["TYPO_STAGE"]
    return events.select(
        e.cast("long").alias("report_id"),
        F.element_at(F.array(*[F.lit(k) for k in keys]),
                     (e % len(keys) + 1).cast("int")).alias("stage_key"),
        ((e * 7) % 120).cast("int").alias("percent"),
        (e % 3 != 0).alias("tracker_found"),
        (e % 11 == 0).alias("tracker_lookup_raised"),
        (e % 5 == 0).alias("live_update_raised"),
        (e % 13 == 0).alias("history_append_raised"))


def _keys_sql() -> str:
    keys = list(PIPELINE_STAGES.keys()) + ["TYPO_STAGE"]
    return "[" + ", ".join(f"'{k}'" for k in keys) + "]"


SYNTH_STAGE_REPORTS_SQL_TMPL = """
    SELECT CAST(event_id AS BIGINT) AS report_id,
           ({keys})[CAST(event_id % {n} AS INT) + 1] AS stage_key,
           CAST((event_id * 7) % 120 AS INT) AS percent,
           event_id % 3 <> 0 AS tracker_found,
           event_id % 11 = 0 AS tracker_lookup_raised,
           event_id % 5 = 0 AS live_update_raised,
           event_id % 13 = 0 AS history_append_raised
    FROM events
"""


def report_stage_sql() -> str:
    n = len(PIPELINE_STAGES) + 1
    synth = SYNTH_STAGE_REPORTS_SQL_TMPL.format(keys=_keys_sql(), n=n)
    name_cases = "\n".join(
        f"WHEN '{k}' THEN '{v[1]}'" for k, v in PIPELINE_STAGES.items())
    coarse_cases = "\n".join(
        f"WHEN '{k}' THEN '{v[0]}'" for k, v in PIPELINE_STAGES.items())
    known = ", ".join(f"'{k}'" for k in PIPELINE_STAGES)
    return f"""
        WITH r AS ({synth}),
        g AS (
          SELECT *,
                 stage_key IN ({known}) AS known,
                 CASE stage_key {name_cases} END AS stage_name,
                 CASE stage_key {coarse_cases} END AS coarse_stage,
                 tracker_found AND NOT tracker_lookup_raised AS live
          FROM r),
        h AS (
          SELECT *,
                 live AND NOT live_update_raised AS live_ok
          FROM g),
        i AS (
          SELECT *,
                 known AND NOT live_ok AS history,
                 known AND NOT live_ok AND NOT history_append_raised
                     AS hist_ok
          FROM h)
        SELECT report_id,
               CASE WHEN NOT known THEN 'dropped_unknown_key'
                    WHEN live_ok THEN 'live'
                    WHEN hist_ok THEN 'history'
                    ELSE 'none' END AS recorded,
               CASE WHEN known THEN coarse_stage END AS coarse_stage,
               CASE WHEN known THEN stage_name END AS stage_name,
               CASE WHEN hist_ok THEN
                 CASE WHEN percent >= 100 THEN 'completed'
                      ELSE 'in_progress' END END AS history_status
        FROM i
    """


def internal_access_gate(reqs: DataFrame) -> DataFrame:
    """D19/D20 gate: configured-and-matching secret passes; an
    UNCONFIGURED secret falls through to JWT (fail-open-to-JWT pin);
    case-sensitive 'Bearer ' prefix; invalid JWT 401."""
    secret_pass = (F.col("secret_configured")
                   & F.col("secret_header_match"))
    bearer = F.col("auth_hdr").startswith("Bearer ")
    jwt_pass = bearer & F.col("jwt_valid")
    return reqs.select(
        "req_id",
        F.when(secret_pass, 200).when(jwt_pass, 200).otherwise(401)
        .cast("int").alias("status"),
        F.when(secret_pass, "cron_secret")
        .when(jwt_pass, "jwt")
        .otherwise(F.lit(None).cast("string")).alias("via"))


def synth_internal_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        (e % 4 != 0).alias("secret_configured"),
        (e % 3 == 0).alias("secret_header_match"),
        F.element_at(F.array(
            F.lit("Bearer tok"), F.lit("bearer tok"), F.lit(""),
            F.lit("Basic tok"), F.lit("Bearer tok")),
            (e % 5 + 1).cast("int")).alias("auth_hdr"),
        (e % 7 != 0).alias("jwt_valid"))


SYNTH_INTERNAL_REQS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           event_id % 4 <> 0 AS secret_configured,
           event_id % 3 = 0 AS secret_header_match,
           (['Bearer tok', 'bearer tok', '', 'Basic tok',
             'Bearer tok'])[CAST(event_id % 5 AS INT) + 1]
               AS auth_hdr,
           event_id % 7 <> 0 AS jwt_valid
    FROM events
"""


def internal_access_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_INTERNAL_REQS_SQL}),
        g AS (
          SELECT *,
                 secret_configured AND secret_header_match
                     AS secret_pass,
                 starts_with(auth_hdr, 'Bearer ') AND jwt_valid
                     AS jwt_pass
          FROM r)
        SELECT req_id,
               CAST(CASE WHEN secret_pass OR jwt_pass THEN 200
                    ELSE 401 END AS INT) AS status,
               CASE WHEN secret_pass THEN 'cron_secret'
                    WHEN jwt_pass THEN 'jwt' END AS via
        FROM g
    """
