"""User-feedback route folds: the BOPLA-hardened submit shape and the
helpful-count increment envelope.

Re-expresses ``app/api/user_feedback.py``:

- ``feedback_submit_fold``  — user_feedback.py:104-149
  (pentest #250 D25/G1: the STORED row takes workspace_id/user_id from
  the verified JWT — the body's values are ignored entirely — and
  ``is_verified`` is forced FALSE server-side no matter what the body
  claims (pin); ``is_public`` is bool-coerced from the body;
  ``context`` defaults ``{}`` via truthy-or (an explicit empty dict and
  None are indistinguishable); an empty insert result is a 500)
- ``feedback_helpful_fold`` — user_feedback.py:248-277
  (``mark_feedback_helpful``: read-then-increment with
  ``.get('helpful_count', 0)`` — an absent count increments from 0;
  the 404 raised INSIDE the try is swallowed by the blanket except and
  re-emerges as a 500 whose detail is the STRINGIFIED HTTPException
  '404: Feedback not found' — the double-wrap family, pin)

Both map-side when-chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feedback_submit_fold(reqs: DataFrame) -> DataFrame:
    """Stored-row shape for submit_feedback: JWT identity wins, trust
    flag forced false, is_public bool-coerced, context or-{}."""
    insert_fail = ~F.col("insert_ok")
    return reqs.select(
        "req_id",
        F.when(insert_fail, 500).otherwise(200).cast("int")
        .alias("status"),
        F.col("ctx_ws").alias("stored_workspace_id"),
        F.col("jwt_sub").alias("stored_user_id"),
        F.lit(False).alias("stored_is_verified"),
        F.coalesce(F.col("is_public"), F.lit(True))
        .alias("stored_is_public"),
        (~F.col("has_context")).alias("context_defaulted"))


def synth_feedback_submits(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        F.concat(F.lit("jwt-ws-"), (e % 5).cast("string"))
        .alias("ctx_ws"),
        F.concat(F.lit("jwt-user-"), (e % 7).cast("string"))
        .alias("jwt_sub"),
        # body claims — deliberately different; the fold must ignore them
        F.concat(F.lit("body-ws-"), (e % 3).cast("string"))
        .alias("body_ws"),
        (e % 2 == 0).alias("body_is_verified"),
        F.when(e % 6 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 3 != 0).alias("is_public"),
        (e % 4 != 0).alias("has_context"),
        (e % 13 != 0).alias("insert_ok"))


SYNTH_FEEDBACK_SUBMITS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           'jwt-ws-' || CAST(event_id % 5 AS VARCHAR) AS ctx_ws,
           'jwt-user-' || CAST(event_id % 7 AS VARCHAR) AS jwt_sub,
           'body-ws-' || CAST(event_id % 3 AS VARCHAR) AS body_ws,
           event_id % 2 = 0 AS body_is_verified,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE event_id % 3 <> 0 END AS is_public,
           event_id % 4 <> 0 AS has_context,
           event_id % 13 <> 0 AS insert_ok
    FROM events
"""


def feedback_submit_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_FEEDBACK_SUBMITS_SQL})
        SELECT req_id,
               CAST(CASE WHEN NOT insert_ok THEN 500
                    ELSE 200 END AS INT) AS status,
               ctx_ws AS stored_workspace_id,
               jwt_sub AS stored_user_id,
               FALSE AS stored_is_verified,
               coalesce(is_public, TRUE) AS stored_is_public,
               NOT has_context AS context_defaulted
        FROM r
    """


def feedback_helpful_fold(reqs: DataFrame) -> DataFrame:
    """Helpful increment: absent count starts at 0; the inner 404
    double-wraps to a 500 with detail '404: Feedback not found'."""
    missing = ~F.col("row_exists")
    count = F.when(F.col("has_count"),
                   F.coalesce(F.col("helpful_count"), F.lit(0))) \
        .otherwise(F.lit(0))
    return reqs.select(
        "req_id",
        F.when(missing, 500).otherwise(200).cast("int").alias("status"),
        F.when(missing, F.lit("404: Feedback not found"))
        .otherwise(F.lit(None).cast("string")).alias("detail"),
        F.when(missing, F.lit(None).cast("int"))
        .otherwise((count + 1).cast("int")).alias("helpful_count_out"))


def synth_helpful_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        (e % 9 != 0).alias("row_exists"),
        (e % 4 != 0).alias("has_count"),
        F.when(e % 5 == 0, F.lit(None).cast("int"))
        .otherwise((e % 40).cast("int")).alias("helpful_count"))


SYNTH_HELPFUL_REQS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           event_id % 9 <> 0 AS row_exists,
           event_id % 4 <> 0 AS has_count,
           CAST(CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE event_id % 40 END AS INT) AS helpful_count
    FROM events
"""


def feedback_helpful_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_HELPFUL_REQS_SQL})
        SELECT req_id,
               CAST(CASE WHEN NOT row_exists THEN 500
                    ELSE 200 END AS INT) AS status,
               CASE WHEN NOT row_exists
                    THEN '404: Feedback not found' END AS detail,
               CAST(CASE WHEN NOT row_exists THEN NULL
                    ELSE (CASE WHEN has_count
                               THEN coalesce(helpful_count, 0)
                               ELSE 0 END) + 1 END AS INT)
                   AS helpful_count_out
        FROM r
    """
