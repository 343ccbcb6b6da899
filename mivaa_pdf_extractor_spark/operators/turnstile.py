"""Turnstile-verifier fold: the fail-closed verdict ladder.

Re-expresses ``app/services/integrations/turnstile_verifier.py:39-85``
(``verify_token``). Pinned behaviors, in ladder order:

- missing secret → fail CLOSED with ['configuration_error'];
- empty or whitespace-only token → ['missing-input-response'];
- siteverify network/parse failure → ['network_error'];
- the action check fires ONLY on a SUCCESSFUL verify with a truthy
  ``expected_action`` and a differing ``action`` — it then flips
  success to False with ['action_mismatch'] while STILL carrying the
  hostname/ts/action through (pin); a failed verify with mismatched
  action keeps its ORIGINAL error codes; a NULL action on a success
  with expected_action set IS a mismatch (``action != expected``);
- otherwise success/error-codes pass through, ``error-codes`` or-[].

Map-side when-chain; error_codes emitted as a comma-joined string for
the cross-engine hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def turnstile_verdict(reqs: DataFrame) -> DataFrame:
    no_secret = ~F.col("secret_configured")
    blank = (F.trim(F.coalesce(F.col("token"), F.lit(""))) == "")
    net = F.col("net_raised")
    cf_success = F.coalesce(F.col("cf_success"), F.lit(False))
    exp = F.col("expected_action")
    mismatch = (cf_success & exp.isNotNull() & (exp != "")
                & (F.col("action").isNull()
                   | (F.col("action") != exp)))
    passthrough_codes = F.coalesce(F.col("cf_error_codes"), F.lit(""))
    ladder = F.when(no_secret, F.lit("configuration_error")) \
        .when(blank, F.lit("missing-input-response")) \
        .when(net, F.lit("network_error")) \
        .when(mismatch, F.lit("action_mismatch")) \
        .otherwise(passthrough_codes)
    reached_cf = ~no_secret & ~blank & ~net
    return reqs.select(
        "req_id",
        F.when(no_secret | blank | net | mismatch, F.lit(False))
        .otherwise(cf_success).alias("success"),
        ladder.alias("error_codes"),
        F.when(reached_cf, F.col("hostname"))
        .otherwise(F.lit(None).cast("string")).alias("hostname"),
        F.when(reached_cf, F.col("action"))
        .otherwise(F.lit(None).cast("string")).alias("action_out"))


def synth_turnstile_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        (e % 17 != 0).alias("secret_configured"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .when(e % 7 == 1, F.lit(""))
        .when(e % 7 == 2, F.lit("   "))
        .otherwise(F.concat(F.lit("tok-"), (e % 9).cast("string")))
        .alias("token"),
        (e % 13 == 0).alias("net_raised"),
        F.when(e % 5 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 3 != 0).alias("cf_success"),
        F.when(e % 6 == 0, F.lit(None).cast("string"))
        .when(e % 6 == 1, F.lit(""))
        .when(e % 6 == 2, F.lit("invalid-input-response"))
        .otherwise(F.lit("timeout-or-duplicate,bad-request"))
        .alias("cf_error_codes"),
        F.when(e % 4 == 0, F.lit(None).cast("string"))
        .when(e % 4 == 1, F.lit(""))
        .otherwise(F.lit("tools_scan")).alias("expected_action"),
        F.when(e % 8 == 0, F.lit(None).cast("string"))
        .when(e % 8 == 1, F.lit("tools_scan"))
        .otherwise(F.lit("other_form")).alias("action"),
        F.when(e % 9 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("tools.example.gr")).alias("hostname"))


SYNTH_TURNSTILE_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           event_id % 17 <> 0 AS secret_configured,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN ''
                WHEN event_id % 7 = 2 THEN '   '
                ELSE 'tok-' || CAST(event_id % 9 AS VARCHAR)
           END AS token,
           event_id % 13 = 0 AS net_raised,
           CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE event_id % 3 <> 0 END AS cf_success,
           CASE WHEN event_id % 6 = 0 THEN NULL
                WHEN event_id % 6 = 1 THEN ''
                WHEN event_id % 6 = 2 THEN 'invalid-input-response'
                ELSE 'timeout-or-duplicate,bad-request'
           END AS cf_error_codes,
           CASE WHEN event_id % 4 = 0 THEN NULL
                WHEN event_id % 4 = 1 THEN ''
                ELSE 'tools_scan' END AS expected_action,
           CASE WHEN event_id % 8 = 0 THEN NULL
                WHEN event_id % 8 = 1 THEN 'tools_scan'
                ELSE 'other_form' END AS action,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE 'tools.example.gr' END AS hostname
    FROM events
"""


def turnstile_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_TURNSTILE_SQL}),
        g AS (
          SELECT *,
                 NOT secret_configured AS no_secret,
                 trim(coalesce(token, '')) = '' AS blank,
                 coalesce(cf_success, FALSE) AS okflag
          FROM r),
        h AS (
          SELECT *,
                 okflag AND expected_action IS NOT NULL
                   AND expected_action <> ''
                   AND (action IS NULL OR action <> expected_action)
                     AS mismatch,
                 NOT no_secret AND NOT blank AND NOT net_raised
                     AS reached_cf
          FROM g)
        SELECT req_id,
               CASE WHEN no_secret OR blank OR net_raised OR mismatch
                    THEN FALSE ELSE okflag END AS success,
               CASE WHEN no_secret THEN 'configuration_error'
                    WHEN blank THEN 'missing-input-response'
                    WHEN net_raised THEN 'network_error'
                    WHEN mismatch THEN 'action_mismatch'
                    ELSE coalesce(cf_error_codes, '') END
                   AS error_codes,
               CASE WHEN reached_cf THEN hostname END AS hostname,
               CASE WHEN reached_cf THEN action END AS action_out
        FROM h
    """
