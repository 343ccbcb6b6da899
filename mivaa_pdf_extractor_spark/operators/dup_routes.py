"""Duplicate-detection route folds: the D38 workspace-reconcile gate and
the merge route's double-wrapped error envelope.

Re-expresses the deterministic gate ladders of
``app/api/duplicate_detection_routes.py`` (the check-duplicates service
envelope itself is covered by the search_merge operators):

- ``ws_reconcile``        — duplicate_detection_routes.py:25-33
  (``_reconcile_ws``, pentest #250 D38: 403 when the session has NO
  workspace, when the body sends NONE, or when the two differ — a
  matching pair of absent ids is still a 403 (fail-closed pin); the
  compare is ``str(a) != str(b)`` so a numeric body id matches its
  string form)
- ``merge_route_envelope`` — duplicate_detection_routes.py:283-327
  (``merge_products``: opaque-flow ladder 404-less here but the
  not-success branch raises HTTPException(500, error) INSIDE the try,
  which the blanket ``except Exception`` catches and re-wraps as
  ``str(e)`` — Starlette renders that as ``"500: {detail}"`` so the
  client sees a DOUBLE-WRAPPED detail (pin); ``.get('error', 'Merge
  failed')`` means an ABSENT error yields '500: Merge failed' while a
  present-None yields '500: None' (pin); a service exception's detail
  is the plain message, single-wrapped)

Both map-side when-chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# _reconcile_ws (duplicate_detection_routes.py:25-33)
# ---------------------------------------------------------------------------

def ws_reconcile(reqs: DataFrame) -> DataFrame:
    """D38 reconcile: fail-closed on ANY missing side — two absent ids
    do NOT match; otherwise exact string equality (int bodies compare
    via str())."""
    ctx_missing = F.col("ctx_ws").isNull() | (F.col("ctx_ws") == "")
    body_missing = F.col("body_ws").isNull() | (F.col("body_ws") == "")
    blocked = (ctx_missing | body_missing
               | (F.col("ctx_ws") != F.col("body_ws")))
    return reqs.select(
        "req_id",
        F.when(blocked, 403).otherwise(200).cast("int").alias("status"))


def synth_ws_pairs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    ws = F.concat(F.lit("ws-"), (e % 6).cast("string"))
    return events.select(
        e.cast("long").alias("req_id"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .when(e % 7 == 1, F.lit(""))
        .otherwise(ws).alias("ctx_ws"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit(""))
        .when(e % 5 == 2, F.concat(F.lit("ws-"), (e % 4).cast("string")))
        .otherwise(ws).alias("body_ws"))


SYNTH_WS_PAIRS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN ''
                ELSE 'ws-' || CAST(event_id % 6 AS VARCHAR)
           END AS ctx_ws,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                WHEN event_id % 5 = 2
                THEN 'ws-' || CAST(event_id % 4 AS VARCHAR)
                ELSE 'ws-' || CAST(event_id % 6 AS VARCHAR)
           END AS body_ws
    FROM events
"""


def ws_reconcile_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_WS_PAIRS_SQL})
        SELECT req_id,
               CAST(CASE WHEN ctx_ws IS NULL OR ctx_ws = ''
                              OR body_ws IS NULL OR body_ws = ''
                              OR ctx_ws <> body_ws
                    THEN 403 ELSE 200 END AS INT) AS status
        FROM r
    """


# ---------------------------------------------------------------------------
# merge_products envelope (duplicate_detection_routes.py:283-327)
# ---------------------------------------------------------------------------

def merge_route_envelope(reqs: DataFrame) -> DataFrame:
    """Merge route outcome: reconcile 403 first; a service exception is
    a single-wrapped 500 with the plain message; a returned
    ``success=False`` raises inside the try and gets re-wrapped →
    detail ``'500: ' + (error if present else 'Merge failed')`` with a
    present-None error rendering '500: None' (pin)."""
    blocked = ~F.col("ws_ok")
    raised = F.col("ws_ok") & F.col("raised")
    failed = F.col("ws_ok") & ~F.col("raised") & ~F.col("svc_success")
    inner = (F.when(~F.col("has_error"), F.lit("Merge failed"))
             .when(F.col("error").isNull(), F.lit("None"))
             .otherwise(F.col("error")))
    return reqs.select(
        "req_id",
        F.when(blocked, 403).when(raised | failed, 500).otherwise(200)
        .cast("int").alias("status"),
        F.when(raised, F.col("exc_msg"))
        .when(failed, F.concat(F.lit("500: "), inner))
        .otherwise(F.lit(None).cast("string")).alias("detail"))


def synth_merge_calls(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        (e % 5 != 0).alias("ws_ok"),
        (e % 11 == 0).alias("raised"),
        F.concat(F.lit("connection reset "), (e % 3).cast("string"))
        .alias("exc_msg"),
        (e % 3 != 0).alias("svc_success"),
        (e % 4 != 0).alias("has_error"),
        F.when(e % 6 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("target not in workspace "),
                            (e % 7).cast("string"))).alias("error"))


SYNTH_MERGE_CALLS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           event_id % 5 <> 0 AS ws_ok,
           event_id % 11 = 0 AS raised,
           'connection reset ' || CAST(event_id % 3 AS VARCHAR)
               AS exc_msg,
           event_id % 3 <> 0 AS svc_success,
           event_id % 4 <> 0 AS has_error,
           CASE WHEN event_id % 6 <> 0
                THEN 'target not in workspace '
                     || CAST(event_id % 7 AS VARCHAR)
           END AS error
    FROM events
"""


def merge_envelope_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_MERGE_CALLS_SQL}),
        g AS (
          SELECT *,
                 NOT ws_ok AS blocked,
                 ws_ok AND raised AS raised2,
                 ws_ok AND NOT raised AND NOT svc_success AS failed,
                 CASE WHEN NOT has_error THEN 'Merge failed'
                      WHEN error IS NULL THEN 'None'
                      ELSE error END AS inner_msg
          FROM r)
        SELECT req_id,
               CAST(CASE WHEN blocked THEN 403
                    WHEN raised2 OR failed THEN 500
                    ELSE 200 END AS INT) AS status,
               CASE WHEN raised2 THEN exc_msg
                    WHEN failed THEN '500: ' || inner_msg END AS detail
        FROM g
    """
