"""Public mention-tracking route folds: the partner-billing envelopes and
the create-time brand fallback.

Re-expresses the deterministic route-level behavior of
``app/api/mention_tracking_routes.py`` (the external `kai_*` flow). The
cost-logger metering itself is covered by ``operators/mention_costs.py``;
these folds pin the route ladders AROUND it — notably where they diverge
from the job-tracking mirror (``operators/job_track_routes.py``):

- ``mention_refresh_credit`` — mention_tracking_routes.py:333-367
  (``refresh_tracking``: EVERYONE is debited — a userless key bills
  against ``user_id=""`` rather than running free, the opposite of the
  job route's pin; refund on exception AND on the five no-work statuses
  ``throttled / inactive / not_found / error / errored``; a successful
  refresh with ZERO hits keeps the credits — the upstream calls ran)
- ``mention_create_brand``   — mention_tracking_routes.py:241-258
  (``create_tracking``: ``brand_name or (subject_label if subject_type
  == 'brand' else None)`` — the or-fallback fires on '' too, and only
  the 'brand' subject_type inherits the label; keyword/product get NULL)
- ``probe_llm_credit``       — mention_tracking_routes.py:427-467
  (``probe_llm``: 15-credit debit; refund on exception and on any
  status other than EXACTLY 'completed' — 'completed_with_errors'
  refunds, pin)
- ``opportunities_credit``   — mention_tracking_routes.py:511-558
  (``get_opportunities``: the cost KEY switches on ``use_llm_summary``
  (2 vs 5 credits); refund on exception and on an empty
  ``opportunities`` list — the no-op mirror of /refresh)

All map-side when-chains over a synthetic request corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REFRESH_COST = 5
PROBE_COST = 15
OPP_COST = 2
OPP_LLM_COST = 5

_REFUND_STATUSES = ("throttled", "inactive", "not_found", "error",
                    "errored")


# ---------------------------------------------------------------------------
# refresh_tracking (mention_tracking_routes.py:333-367)
# ---------------------------------------------------------------------------

def mention_refresh_credit(runs: DataFrame) -> DataFrame:
    """Refresh billing: the debit targets ``ctx.user_id or ''`` — a
    userless key is still billed (pin: opposite of the job route);
    debit-fail 402; exception refunds and re-raises (500); the five
    no-work statuses refund; anything else keeps the credit even with
    zero hits."""
    debit_fail = ~F.col("debit_ok")
    raised = ~debit_fail & F.col("raised")
    no_work = F.col("outcome_status").isin(*_REFUND_STATUSES)
    refund = ~debit_fail & (raised | (~raised & no_work))
    return runs.select(
        "run_id",
        F.when(debit_fail, 402).when(raised, 500).otherwise(200)
        .cast("int").alias("status"),
        refund.alias("refunded"),
        F.when(~debit_fail & ~refund, REFRESH_COST).otherwise(0)
        .cast("int").alias("credits_debited"))


def synth_mention_refreshes(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("run_id"),
        (e % 7 != 0).alias("debit_ok"),
        (e % 13 == 0).alias("raised"),
        F.when(e % 8 == 0, "throttled")
        .when(e % 8 == 1, "inactive")
        .when(e % 8 == 2, "not_found")
        .when(e % 8 == 3, "error")
        .when(e % 8 == 4, "errored")
        .when(e % 8 == 5, "completed")
        .otherwise("ok").alias("outcome_status"))


SYNTH_MENTION_REFRESHES_SQL = """
    SELECT CAST(event_id AS BIGINT) AS run_id,
           event_id % 7 <> 0 AS debit_ok,
           event_id % 13 = 0 AS raised,
           CASE WHEN event_id % 8 = 0 THEN 'throttled'
                WHEN event_id % 8 = 1 THEN 'inactive'
                WHEN event_id % 8 = 2 THEN 'not_found'
                WHEN event_id % 8 = 3 THEN 'error'
                WHEN event_id % 8 = 4 THEN 'errored'
                WHEN event_id % 8 = 5 THEN 'completed'
                ELSE 'ok' END AS outcome_status
    FROM events
"""


def mention_refresh_sql() -> str:
    statuses = ", ".join(f"'{s}'" for s in _REFUND_STATUSES)
    return f"""
        WITH r AS ({SYNTH_MENTION_REFRESHES_SQL}),
        g AS (
          SELECT *,
                 NOT debit_ok AS debit_fail,
                 debit_ok AND raised AS raised2,
                 outcome_status IN ({statuses}) AS no_work
          FROM r),
        h AS (
          SELECT *,
                 NOT debit_fail
                     AND (raised2 OR (NOT raised2 AND no_work))
                     AS refunded
          FROM g)
        SELECT run_id,
               CAST(CASE WHEN debit_fail THEN 402
                    WHEN raised2 THEN 500
                    ELSE 200 END AS INT) AS status,
               refunded,
               CAST(CASE WHEN NOT debit_fail AND NOT refunded
                    THEN {REFRESH_COST} ELSE 0 END AS INT)
                   AS credits_debited
        FROM h
    """


# ---------------------------------------------------------------------------
# create_tracking brand fallback (mention_tracking_routes.py:241-258)
# ---------------------------------------------------------------------------

def mention_create_brand(reqs: DataFrame) -> DataFrame:
    """``brand_name or (subject_label if subject_type == 'brand' else
    None)``: the or-fallback fires on '' as well as NULL, and only a
    'brand' subject inherits its label — keyword/product subjects store
    NULL (pin)."""
    brand_empty = (F.col("brand_name").isNull()
                   | (F.col("brand_name") == ""))
    return reqs.select(
        "req_id",
        F.when(~brand_empty, F.col("brand_name"))
        .when(F.col("subject_type") == "brand", F.col("subject_label"))
        .otherwise(F.lit(None).cast("string")).alias("brand_out"))


def synth_mention_creates(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        F.when(e % 3 == 0, "brand")
        .when(e % 3 == 1, "keyword")
        .otherwise("product").alias("subject_type"),
        F.concat(F.lit("Subject "), (e % 11).cast("string"))
        .alias("subject_label"),
        F.when(e % 4 == 0, F.lit(None).cast("string"))
        .when(e % 4 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("Brand"), (e % 6).cast("string")))
        .alias("brand_name"))


SYNTH_MENTION_CREATES_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           CASE WHEN event_id % 3 = 0 THEN 'brand'
                WHEN event_id % 3 = 1 THEN 'keyword'
                ELSE 'product' END AS subject_type,
           'Subject ' || CAST(event_id % 11 AS VARCHAR)
               AS subject_label,
           CASE WHEN event_id % 4 = 0 THEN NULL
                WHEN event_id % 4 = 1 THEN ''
                ELSE 'Brand' || CAST(event_id % 6 AS VARCHAR)
           END AS brand_name
    FROM events
"""


def mention_brand_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_MENTION_CREATES_SQL})
        SELECT req_id,
               CASE WHEN brand_name IS NOT NULL AND brand_name <> ''
                    THEN brand_name
                    WHEN subject_type = 'brand' THEN subject_label
               END AS brand_out
        FROM r
    """


# ---------------------------------------------------------------------------
# probe_llm (mention_tracking_routes.py:427-467)
# ---------------------------------------------------------------------------

def probe_llm_credit(runs: DataFrame) -> DataFrame:
    """Probe billing: 15-credit debit; exception refunds and re-raises;
    any status other than EXACTLY 'completed' refunds —
    'completed_with_errors' refunds too (equality, not prefix — pin)."""
    debit_fail = ~F.col("debit_ok")
    raised = ~debit_fail & F.col("raised")
    incomplete = F.col("result_status") != "completed"
    refund = ~debit_fail & (raised | (~raised & incomplete))
    return runs.select(
        "run_id",
        F.when(debit_fail, 402).when(raised, 500).otherwise(200)
        .cast("int").alias("status"),
        refund.alias("refunded"),
        F.when(~debit_fail & ~refund, PROBE_COST).otherwise(0)
        .cast("int").alias("credits_debited"))


def synth_probe_runs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("run_id"),
        (e % 7 != 0).alias("debit_ok"),
        (e % 13 == 0).alias("raised"),
        F.when(e % 5 == 0, "completed")
        .when(e % 5 == 1, "completed_with_errors")
        .when(e % 5 == 2, "partial")
        .when(e % 5 == 3, "failed")
        .otherwise("completed").alias("result_status"))


SYNTH_PROBE_RUNS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS run_id,
           event_id % 7 <> 0 AS debit_ok,
           event_id % 13 = 0 AS raised,
           CASE WHEN event_id % 5 = 0 THEN 'completed'
                WHEN event_id % 5 = 1 THEN 'completed_with_errors'
                WHEN event_id % 5 = 2 THEN 'partial'
                WHEN event_id % 5 = 3 THEN 'failed'
                ELSE 'completed' END AS result_status
    FROM events
"""


def probe_credit_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_PROBE_RUNS_SQL}),
        g AS (
          SELECT *,
                 NOT debit_ok AS debit_fail,
                 debit_ok AND raised AS raised2,
                 result_status <> 'completed' AS incomplete
          FROM r),
        h AS (
          SELECT *,
                 NOT debit_fail
                     AND (raised2 OR (NOT raised2 AND incomplete))
                     AS refunded
          FROM g)
        SELECT run_id,
               CAST(CASE WHEN debit_fail THEN 402
                    WHEN raised2 THEN 500
                    ELSE 200 END AS INT) AS status,
               refunded,
               CAST(CASE WHEN NOT debit_fail AND NOT refunded
                    THEN {PROBE_COST} ELSE 0 END AS INT)
                   AS credits_debited
        FROM h
    """


# ---------------------------------------------------------------------------
# get_opportunities (mention_tracking_routes.py:511-558)
# ---------------------------------------------------------------------------

def opportunities_credit(runs: DataFrame) -> DataFrame:
    """Opportunity billing: the cost KEY (and amount) switches on
    ``use_llm_summary`` — 2 credits default, 5 with the Haiku rewrite;
    exception refunds; an empty ``opportunities`` list refunds (the
    route's no-op mirror of /refresh)."""
    cost = (F.when(F.col("use_llm_summary"), OPP_LLM_COST)
            .otherwise(OPP_COST))
    debit_fail = ~F.col("debit_ok")
    raised = ~debit_fail & F.col("raised")
    empty = F.col("n_opportunities") == 0
    refund = ~debit_fail & (raised | (~raised & empty))
    return runs.select(
        "run_id",
        F.when(debit_fail, 402).when(raised, 500).otherwise(200)
        .cast("int").alias("status"),
        refund.alias("refunded"),
        F.when(~debit_fail & ~refund, cost).otherwise(0)
        .cast("int").alias("credits_debited"))


def synth_opportunity_runs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("run_id"),
        (e % 3 == 0).alias("use_llm_summary"),
        (e % 7 != 0).alias("debit_ok"),
        (e % 13 == 0).alias("raised"),
        F.when(e % 4 == 0, F.lit(0)).otherwise((e % 9).cast("int"))
        .alias("n_opportunities"))


SYNTH_OPPORTUNITY_RUNS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS run_id,
           event_id % 3 = 0 AS use_llm_summary,
           event_id % 7 <> 0 AS debit_ok,
           event_id % 13 = 0 AS raised,
           CAST(CASE WHEN event_id % 4 = 0 THEN 0
                ELSE event_id % 9 END AS INT) AS n_opportunities
    FROM events
"""


def opportunities_credit_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_OPPORTUNITY_RUNS_SQL}),
        g AS (
          SELECT *,
                 NOT debit_ok AS debit_fail,
                 debit_ok AND raised AS raised2,
                 n_opportunities = 0 AS empty_out,
                 CASE WHEN use_llm_summary THEN {OPP_LLM_COST}
                      ELSE {OPP_COST} END AS cost
          FROM r),
        h AS (
          SELECT *,
                 NOT debit_fail
                     AND (raised2 OR (NOT raised2 AND empty_out))
                     AS refunded
          FROM g)
        SELECT run_id,
               CAST(CASE WHEN debit_fail THEN 402
                    WHEN raised2 THEN 500
                    ELSE 200 END AS INT) AS status,
               refunded,
               CAST(CASE WHEN NOT debit_fail AND NOT refunded
                    THEN cost ELSE 0 END AS INT) AS credits_debited
        FROM h
    """
