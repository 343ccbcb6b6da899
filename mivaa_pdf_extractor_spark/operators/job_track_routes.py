"""Public job-tracking route folds: the partner-billing credit ladders and
the classifier-correction write shape.

Re-expresses the deterministic route-level behavior of
``app/api/job_tracking_routes.py`` (the external `kai_*` flow) as
whole-corpus DataFrame plans. The refresh/keyword *service* internals are
covered by ``operators/job_refresh.py``; these folds pin the billing
envelope AROUND those services:

- ``job_refresh_credit``   — job_tracking_routes.py:224-262
  (``refresh_tracked``: a key with NO linked user runs FREE — debit and
  refund are both skipped; debit-fail 402; exception 500 refunds; a
  ``skipped`` outcome refunds; a truthy ``error`` refunds but the EMPTY
  STRING is falsy and keeps the credit; the audit-#217-H15 no-op refund
  fires only when ``candidates_after_exclusions`` is PRESENT and > 0 with
  ``persisted`` = 0 — an absent key or an explicit 0 keeps the credit)
- ``job_create_credit``    — job_tracking_routes.py:126-171
  (``create_tracked``: debit 5 only when ``run_first_refresh`` AND a user
  exists; ValueError → 400 refund, other exception → 500 refund; the
  first-refresh no-op refund mirrors H15 with the same empty-string-error
  and absent-key pins)
- ``regen_keywords_credit`` — job_tracking_routes.py:329-355
  (``regenerate_keywords``: debit 2; exception 500 refunds; a silent
  Haiku failure returns empty ``expanded`` AND empty
  ``query_phrasings`` → refund; a non-empty EITHER field keeps)
- ``correct_match_note``   — job_tracking_routes.py:357-394
  (``correct_match``: 404 missing listing → 403 unowned parent;
  ``match_note`` is ``"User corrected: {reason}"`` with an or-fallback —
  an EMPTY-string reason folds to 'no reason given' — truncated to 240
  chars AFTER prefixing, so the reason itself is capped at 224)

Every gate is a map-side when-chain over a synthetic request corpus; no
shuffles beyond the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REFRESH_COST = 5
REGEN_COST = 2


# ---------------------------------------------------------------------------
# refresh_tracked (job_tracking_routes.py:224-262)
# ---------------------------------------------------------------------------

def job_refresh_credit(runs: DataFrame) -> DataFrame:
    """Refresh billing ladder, in route order. Pins: userless keys are
    never billed (and never refunded); ``outcome.get("error")`` is a
    TRUTHINESS test so '' keeps the credit; the H15 no-op refund needs
    candidates_after_exclusions PRESENT and positive with persisted 0."""
    user = F.col("has_user")
    debit_fail = user & ~F.col("debit_ok")
    raised = ~debit_fail & F.col("raised")
    err_truthy = F.col("error_str").isNotNull() & (F.col("error_str") != "")
    noop = (F.col("has_cae") & (F.col("cae") > 0)
            & (F.col("persisted") == 0))
    refund = (user & ~debit_fail
              & (raised | F.col("skipped") | err_truthy | noop))
    return runs.select(
        "run_id",
        F.when(debit_fail, 402).when(raised, 500).otherwise(200)
        .cast("int").alias("status"),
        refund.alias("refunded"),
        F.when(user & ~debit_fail & ~refund, REFRESH_COST)
        .otherwise(0).cast("int").alias("credits_debited"))


def synth_refresh_runs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("run_id"),
        (e % 11 != 0).alias("has_user"),
        (e % 7 != 0).alias("debit_ok"),
        (e % 13 == 0).alias("raised"),
        (e % 9 == 0).alias("skipped"),
        F.when(e % 6 == 0, F.lit("perplexity 502"))
        .when(e % 6 == 1, F.lit(""))
        .otherwise(F.lit(None).cast("string")).alias("error_str"),
        (e % 4 != 0).alias("has_cae"),
        F.when(e % 4 != 0, (e % 5).cast("int")).otherwise(F.lit(0))
        .alias("cae"),
        (e % 3).cast("int").alias("persisted"))


SYNTH_REFRESH_RUNS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS run_id,
           event_id % 11 <> 0 AS has_user,
           event_id % 7 <> 0 AS debit_ok,
           event_id % 13 = 0 AS raised,
           event_id % 9 = 0 AS skipped,
           CASE WHEN event_id % 6 = 0 THEN 'perplexity 502'
                WHEN event_id % 6 = 1 THEN '' END AS error_str,
           event_id % 4 <> 0 AS has_cae,
           CAST(CASE WHEN event_id % 4 <> 0 THEN event_id % 5
                ELSE 0 END AS INT) AS cae,
           CAST(event_id % 3 AS INT) AS persisted
    FROM events
"""


def refresh_credit_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_REFRESH_RUNS_SQL}),
        g AS (
          SELECT *,
                 has_user AND NOT debit_ok AS debit_fail,
                 NOT (has_user AND NOT debit_ok) AND raised AS raised2,
                 error_str IS NOT NULL AND error_str <> '' AS err_truthy,
                 has_cae AND cae > 0 AND persisted = 0 AS noop
          FROM r),
        h AS (
          SELECT *,
                 has_user AND NOT debit_fail
                     AND (raised2 OR skipped OR err_truthy OR noop)
                     AS refunded
          FROM g)
        SELECT run_id,
               CAST(CASE WHEN debit_fail THEN 402
                    WHEN raised2 THEN 500
                    ELSE 200 END AS INT) AS status,
               refunded,
               CAST(CASE WHEN has_user AND NOT debit_fail
                              AND NOT refunded
                    THEN {REFRESH_COST} ELSE 0 END AS INT)
                   AS credits_debited
        FROM h
    """


# ---------------------------------------------------------------------------
# create_tracked (job_tracking_routes.py:126-171)
# ---------------------------------------------------------------------------

def job_create_credit(reqs: DataFrame) -> DataFrame:
    """First-refresh billing on create: debit only when
    ``run_first_refresh`` AND a user exists; ValueError 400 / exception
    500 both refund; then the H15 no-op test (truthy ``first_refresh
    .error`` OR positive candidates with zero persisted) refunds while
    returning 201."""
    billed = F.col("run_first_refresh") & F.col("has_user")
    debit_fail = billed & ~F.col("debit_ok")
    val_err = ~debit_fail & F.col("value_error")
    exc = ~debit_fail & ~val_err & F.col("raised")
    err_truthy = (F.col("fr_error").isNotNull()
                  & (F.col("fr_error") != ""))
    noop = err_truthy | ((F.col("fr_cae") > 0)
                         & (F.col("fr_persisted") == 0))
    created = ~debit_fail & ~val_err & ~exc
    refund = billed & ~debit_fail & (val_err | exc | (created & noop))
    return reqs.select(
        "req_id",
        F.when(debit_fail, 402).when(val_err, 400).when(exc, 500)
        .otherwise(201).cast("int").alias("status"),
        refund.alias("refunded"),
        F.when(billed & ~debit_fail & created & ~noop, REFRESH_COST)
        .otherwise(0).cast("int").alias("credits_debited"))


def synth_create_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        (e % 5 != 0).alias("run_first_refresh"),
        (e % 11 != 0).alias("has_user"),
        (e % 7 != 0).alias("debit_ok"),
        (e % 17 == 0).alias("value_error"),
        (e % 13 == 0).alias("raised"),
        F.when(e % 6 == 0, F.lit("discovery timed out"))
        .when(e % 6 == 1, F.lit(""))
        .otherwise(F.lit(None).cast("string")).alias("fr_error"),
        (e % 4).cast("int").alias("fr_cae"),
        (e % 3).cast("int").alias("fr_persisted"))


SYNTH_CREATE_REQS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           event_id % 5 <> 0 AS run_first_refresh,
           event_id % 11 <> 0 AS has_user,
           event_id % 7 <> 0 AS debit_ok,
           event_id % 17 = 0 AS value_error,
           event_id % 13 = 0 AS raised,
           CASE WHEN event_id % 6 = 0 THEN 'discovery timed out'
                WHEN event_id % 6 = 1 THEN '' END AS fr_error,
           CAST(event_id % 4 AS INT) AS fr_cae,
           CAST(event_id % 3 AS INT) AS fr_persisted
    FROM events
"""


def create_credit_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_CREATE_REQS_SQL}),
        g AS (
          SELECT *,
                 run_first_refresh AND has_user AS billed
          FROM r),
        h AS (
          SELECT *,
                 billed AND NOT debit_ok AS debit_fail
          FROM g),
        i AS (
          SELECT *,
                 NOT debit_fail AND value_error AS val_err,
                 NOT debit_fail AND NOT value_error AND raised AS exc,
                 (fr_error IS NOT NULL AND fr_error <> '')
                 OR (fr_cae > 0 AND fr_persisted = 0) AS noop
          FROM h),
        j AS (
          SELECT *,
                 NOT debit_fail AND NOT val_err AND NOT exc AS created
          FROM i),
        k AS (
          SELECT *,
                 billed AND NOT debit_fail
                     AND (val_err OR exc OR (created AND noop))
                     AS refunded
          FROM j)
        SELECT req_id,
               CAST(CASE WHEN debit_fail THEN 402
                    WHEN val_err THEN 400
                    WHEN exc THEN 500
                    ELSE 201 END AS INT) AS status,
               refunded,
               CAST(CASE WHEN billed AND NOT debit_fail AND created
                              AND NOT noop
                    THEN {REFRESH_COST} ELSE 0 END AS INT)
                   AS credits_debited
        FROM k
    """


# ---------------------------------------------------------------------------
# regenerate_keywords (job_tracking_routes.py:329-355)
# ---------------------------------------------------------------------------

def regen_keywords_credit(runs: DataFrame) -> DataFrame:
    """Keyword-regeneration billing: debit 2; an exception refunds with
    500; the silent-Haiku-failure refund fires when BOTH ``expanded``
    and ``query_phrasings`` come back empty — a non-empty either keeps
    the credit (pin)."""
    user = F.col("has_user")
    debit_fail = user & ~F.col("debit_ok")
    raised = ~debit_fail & F.col("raised")
    silent = (F.col("n_expanded") == 0) & (F.col("n_phrasings") == 0)
    refund = user & ~debit_fail & (raised | (~raised & silent))
    return runs.select(
        "run_id",
        F.when(debit_fail, 402).when(raised, 500).otherwise(200)
        .cast("int").alias("status"),
        refund.alias("refunded"),
        F.when(user & ~debit_fail & ~refund, REGEN_COST)
        .otherwise(0).cast("int").alias("credits_debited"))


def synth_regen_runs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("run_id"),
        (e % 11 != 0).alias("has_user"),
        (e % 7 != 0).alias("debit_ok"),
        (e % 13 == 0).alias("raised"),
        (e % 3).cast("int").alias("n_expanded"),
        F.when(e % 4 == 0, (e % 6).cast("int")).otherwise(F.lit(0))
        .alias("n_phrasings"))


SYNTH_REGEN_RUNS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS run_id,
           event_id % 11 <> 0 AS has_user,
           event_id % 7 <> 0 AS debit_ok,
           event_id % 13 = 0 AS raised,
           CAST(event_id % 3 AS INT) AS n_expanded,
           CAST(CASE WHEN event_id % 4 = 0 THEN event_id % 6
                ELSE 0 END AS INT) AS n_phrasings
    FROM events
"""


def regen_credit_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_REGEN_RUNS_SQL}),
        g AS (
          SELECT *,
                 has_user AND NOT debit_ok AS debit_fail
          FROM r),
        h AS (
          SELECT *,
                 NOT debit_fail AND raised AS raised2,
                 n_expanded = 0 AND n_phrasings = 0 AS silent
          FROM g),
        i AS (
          SELECT *,
                 has_user AND NOT debit_fail
                     AND (raised2 OR (NOT raised2 AND silent))
                     AS refunded
          FROM h)
        SELECT run_id,
               CAST(CASE WHEN debit_fail THEN 402
                    WHEN raised2 THEN 500
                    ELSE 200 END AS INT) AS status,
               refunded,
               CAST(CASE WHEN has_user AND NOT debit_fail
                              AND NOT refunded
                    THEN {REGEN_COST} ELSE 0 END AS INT)
                   AS credits_debited
        FROM i
    """


# ---------------------------------------------------------------------------
# correct_match (job_tracking_routes.py:357-394)
# ---------------------------------------------------------------------------

NOTE_PREFIX = "User corrected: "
NOTE_CAP = 240


def correct_match_note(reqs: DataFrame) -> DataFrame:
    """Classifier-correction write shape: 404 when the listing is
    missing, 403 when the parent tracked_job isn't owned by the key;
    otherwise the listing's relevance flips to the correction and
    ``match_note`` becomes ``"User corrected: {reason or 'no reason
    given'}"[:240]`` — the or-fallback fires on '' as well as NULL, and
    the 240-char cap applies AFTER the 16-char prefix (pin)."""
    missing = ~F.col("listing_exists")
    unowned = F.col("listing_exists") & ~F.col("parent_owned")
    ok = F.col("listing_exists") & F.col("parent_owned")
    reason_eff = (F.when(F.col("reason").isNull()
                         | (F.col("reason") == ""),
                         F.lit("no reason given"))
                  .otherwise(F.col("reason")))
    note = F.substring(F.concat(F.lit(NOTE_PREFIX), reason_eff),
                       1, NOTE_CAP)
    return reqs.select(
        "req_id",
        F.when(missing, 404).when(unowned, 403).otherwise(200)
        .cast("int").alias("status"),
        F.when(ok, F.col("corrected_relevance"))
        .otherwise(F.lit(None).cast("string")).alias("relevance_out"),
        F.when(ok, note).otherwise(F.lit(None).cast("string"))
        .alias("match_note"))


def synth_correct_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        (e % 9 != 0).alias("listing_exists"),
        (e % 7 != 0).alias("parent_owned"),
        F.when(e % 3 == 0, "match")
        .when(e % 3 == 1, "tangential")
        .otherwise("mismatch").alias("corrected_relevance"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit(""))
        .otherwise(F.repeat(F.lit("wrong seniority bucket "),
                            (e % 15).cast("int"))).alias("reason"))


SYNTH_CORRECT_REQS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           event_id % 9 <> 0 AS listing_exists,
           event_id % 7 <> 0 AS parent_owned,
           CASE WHEN event_id % 3 = 0 THEN 'match'
                WHEN event_id % 3 = 1 THEN 'tangential'
                ELSE 'mismatch' END AS corrected_relevance,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE repeat('wrong seniority bucket ',
                            CAST(event_id % 15 AS INT))
           END AS reason
    FROM events
"""


def correct_note_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_CORRECT_REQS_SQL}),
        g AS (
          SELECT *,
                 NOT listing_exists AS missing,
                 listing_exists AND NOT parent_owned AS unowned,
                 listing_exists AND parent_owned AS ok,
                 CASE WHEN reason IS NULL OR reason = ''
                      THEN 'no reason given' ELSE reason END
                     AS reason_eff
          FROM r)
        SELECT req_id,
               CAST(CASE WHEN missing THEN 404
                    WHEN unowned THEN 403
                    ELSE 200 END AS INT) AS status,
               CASE WHEN ok THEN corrected_relevance END
                   AS relevance_out,
               CASE WHEN ok
                    THEN substring('{NOTE_PREFIX}' || reason_eff,
                                   1, {NOTE_CAP}) END AS match_note
        FROM g
    """
