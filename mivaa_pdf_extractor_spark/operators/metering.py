"""Credit-metering folds: the fail-open external-service meter and the
cron charge gate.

Re-expresses two billing envelopes whose failure DIRECTION is the pin —
one fails open, the other distinguishes 402 from infra noise:

- ``meter_operation_fold`` — app/utils/credit_metering.py:24-60
  (pentest #250 H1: identity is ``user.get('sub') or
  user.get('user_id')`` — an EMPTY-string sub falls through to user_id
  (pin); no uid → free pass 0.0; a 402 fires ONLY when the error
  contains 'insufficient' case-insensitively OR ``credits_required``
  is TRUTHY — an explicit 0 credits_required does NOT 402 (pin); any
  other billing failure or infra exception logs and PROCEEDS at 0.0;
  success debits ``float(credits_debited or 0.0)``)
- ``charge_cron_fold``     — cron_billing.py:22-79
  (workspace payer wins over user payer; NO payer at all is a free
  pass; empty RPC data fails OPEN; ``bool(row.get('allowed', True))``
  — an ABSENT key allows but a present-NULL ``allowed`` SKIPS the
  subject (pin); exceptions fail open)

Both map-side when-chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# meter_operation (credit_metering.py:24-60)
# ---------------------------------------------------------------------------

def meter_operation_fold(calls: DataFrame) -> DataFrame:
    """Outcome of the up-front debit: (status, credits_debited,
    proceeded)."""
    uid = F.coalesce(F.nullif(F.col("sub"), F.lit("")),
                     F.nullif(F.col("user_id_alt"), F.lit("")))
    no_uid = uid.isNull()
    raised = ~no_uid & F.col("rpc_raised")
    ok = ~no_uid & ~raised & F.col("rpc_success")
    err_low = F.lower(F.coalesce(F.col("error"), F.lit("")))
    cr_truthy = (F.col("credits_required").isNotNull()
                 & (F.col("credits_required") != 0))
    insufficient = (~no_uid & ~raised & ~F.col("rpc_success")
                    & (err_low.contains("insufficient") | cr_truthy))
    debited = F.when(ok,
                     F.coalesce(F.nullif(F.col("credits_debited"),
                                         F.lit(0.0)),
                                F.lit(0.0))).otherwise(F.lit(0.0))
    return calls.select(
        "call_id",
        F.when(insufficient, 402).otherwise(200).cast("int")
        .alias("status"),
        debited.alias("credits_debited"),
        (~insufficient).alias("proceeded"),
        uid.alias("payer_uid"))


def synth_meter_calls(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("call_id"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("sub-"), (e % 7).cast("string")))
        .alias("sub"),
        F.when(e % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("alt-"), (e % 3).cast("string")))
        .alias("user_id_alt"),
        (e % 13 == 0).alias("rpc_raised"),
        (e % 3 != 0).alias("rpc_success"),
        F.when(e % 6 == 0, F.lit("Insufficient credits"))
        .when(e % 6 == 1, F.lit("INSUFFICIENT_BALANCE hit"))
        .when(e % 6 == 2, F.lit("rate limited"))
        .otherwise(F.lit(None).cast("string")).alias("error"),
        F.when(e % 7 == 0, F.lit(None).cast("int"))
        .when(e % 7 == 1, F.lit(0))
        .otherwise((e % 9).cast("int")).alias("credits_required"),
        F.when(e % 8 == 0, F.lit(None).cast("double"))
        .when(e % 8 == 1, F.lit(0.0))
        .otherwise((e % 11).cast("double") / 2.0)
        .alias("credits_debited"))


SYNTH_METER_CALLS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS call_id,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'sub-' || CAST(event_id % 7 AS VARCHAR)
           END AS sub,
           CASE WHEN event_id % 4 = 0 THEN NULL
                ELSE 'alt-' || CAST(event_id % 3 AS VARCHAR)
           END AS user_id_alt,
           event_id % 13 = 0 AS rpc_raised,
           event_id % 3 <> 0 AS rpc_success,
           CASE WHEN event_id % 6 = 0 THEN 'Insufficient credits'
                WHEN event_id % 6 = 1 THEN 'INSUFFICIENT_BALANCE hit'
                WHEN event_id % 6 = 2 THEN 'rate limited'
           END AS error,
           CAST(CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN 0
                ELSE event_id % 9 END AS INT) AS credits_required,
           CASE WHEN event_id % 8 = 0 THEN NULL
                WHEN event_id % 8 = 1 THEN 0.0
                ELSE CAST(event_id % 11 AS DOUBLE) / 2.0
           END AS credits_debited
    FROM events
"""


def meter_fold_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_METER_CALLS_SQL}),
        g AS (
          SELECT *,
                 coalesce(nullif(sub, ''), nullif(user_id_alt, ''))
                     AS payer_uid
          FROM r),
        h AS (
          SELECT *,
                 payer_uid IS NULL AS no_uid,
                 payer_uid IS NOT NULL AND rpc_raised AS raised2
          FROM g),
        i AS (
          SELECT *,
                 NOT no_uid AND NOT raised2 AND rpc_success AS ok,
                 NOT no_uid AND NOT raised2 AND NOT rpc_success
                   AND (contains(lower(coalesce(error, '')),
                                 'insufficient')
                        OR (credits_required IS NOT NULL
                            AND credits_required <> 0))
                     AS insufficient
          FROM h)
        SELECT call_id,
               CAST(CASE WHEN insufficient THEN 402
                    ELSE 200 END AS INT) AS status,
               CASE WHEN ok
                    THEN coalesce(nullif(credits_debited, 0.0), 0.0)
                    ELSE 0.0 END AS credits_debited,
               NOT insufficient AS proceeded,
               payer_uid
        FROM i
    """


# ---------------------------------------------------------------------------
# charge_cron (cron_billing.py:22-79)
# ---------------------------------------------------------------------------

def charge_cron_fold(charges: DataFrame) -> DataFrame:
    """Payer routing + the fail-open allowed fold."""
    ws = F.col("workspace_id").isNotNull() & (F.col("workspace_id")
                                              != "")
    user = F.col("user_id").isNotNull() & (F.col("user_id") != "")
    payer = (F.when(ws, "workspace").when(user, "user")
             .otherwise("none"))
    billed = ws | user
    raised = billed & F.col("rpc_raised")
    no_row = billed & ~raised & ~F.col("has_row")
    # bool(row.get('allowed', True)): absent -> True,
    # present-NULL -> False (pin)
    row_allowed = (F.when(~F.col("has_allowed"), F.lit(True))
                   .otherwise(F.coalesce(F.col("allowed_val"),
                                         F.lit(False))))
    allowed = (F.when(~billed | raised | no_row, F.lit(True))
               .otherwise(row_allowed))
    return charges.select(
        "charge_id", payer.alias("payer"), allowed.alias("allowed"))


def synth_cron_charges(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("charge_id"),
        F.when(e % 3 == 0, F.lit(None).cast("string"))
        .when(e % 3 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("ws-"), (e % 5).cast("string")))
        .alias("workspace_id"),
        F.when(e % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("u-"), (e % 7).cast("string")))
        .alias("user_id"),
        (e % 11 == 0).alias("rpc_raised"),
        (e % 5 != 0).alias("has_row"),
        (e % 6 != 0).alias("has_allowed"),
        F.when(e % 7 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 2 == 0).alias("allowed_val"))


SYNTH_CRON_CHARGES_SQL = """
    SELECT CAST(event_id AS BIGINT) AS charge_id,
           CASE WHEN event_id % 3 = 0 THEN NULL
                WHEN event_id % 3 = 1 THEN ''
                ELSE 'ws-' || CAST(event_id % 5 AS VARCHAR)
           END AS workspace_id,
           CASE WHEN event_id % 4 = 0 THEN NULL
                ELSE 'u-' || CAST(event_id % 7 AS VARCHAR)
           END AS user_id,
           event_id % 11 = 0 AS rpc_raised,
           event_id % 5 <> 0 AS has_row,
           event_id % 6 <> 0 AS has_allowed,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE event_id % 2 = 0 END AS allowed_val
    FROM events
"""


def charge_cron_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_CRON_CHARGES_SQL}),
        g AS (
          SELECT *,
                 workspace_id IS NOT NULL AND workspace_id <> ''
                     AS ws,
                 user_id IS NOT NULL AND user_id <> '' AS usr
          FROM r),
        h AS (
          SELECT *,
                 ws OR usr AS billed,
                 (ws OR usr) AND rpc_raised AS raised2
          FROM g),
        i AS (
          SELECT *,
                 billed AND NOT raised2 AND NOT has_row AS no_row,
                 CASE WHEN NOT has_allowed THEN TRUE
                      ELSE coalesce(allowed_val, FALSE) END
                     AS row_allowed
          FROM h)
        SELECT charge_id,
               CASE WHEN ws THEN 'workspace'
                    WHEN usr THEN 'user'
                    ELSE 'none' END AS payer,
               CASE WHEN NOT billed OR raised2 OR no_row THEN TRUE
                    ELSE row_allowed END AS allowed
        FROM i
    """


# ---------------------------------------------------------------------------
# price-flow debit (price_cost_logger.py:33-58, audit #217 H3)
# ---------------------------------------------------------------------------

def price_debit_gate(debits: DataFrame) -> DataFrame:
    """Partner price-flow debit — fail-CLOSED, the opposite direction
    of ``charge_cron_fold``:

    - ``amount <= 0 or not user_id`` returns ``amount <= 0`` — a
      zero/negative amount is a free TRUE even with NO user, while a
      positive amount without a user is False (pin);
    - empty RPC data → False; exception → False;
    - a dict row folds ``bool(row.get('success'))`` — the H3 fix: a
      truthy row with ``success=false`` (insufficient balance) must
      NOT serve the paid op free; absent success → False."""
    free = F.col("amount") <= 0
    no_user = F.col("user_id").isNull() | (F.col("user_id") == "")
    early = free | no_user
    ok = (~early & ~F.col("rpc_raised") & F.col("has_data")
          & F.coalesce(F.col("row_success"), F.lit(False)))
    return debits.select(
        "debit_id",
        F.when(early, free).otherwise(ok).alias("proceed"),
        F.when(free, F.lit("free"))
        .when(no_user, F.lit("no_user"))
        .when(F.col("rpc_raised"), F.lit("rpc_error"))
        .when(~F.col("has_data"), F.lit("no_data"))
        .when(F.coalesce(F.col("row_success"), F.lit(False)),
              F.lit("debited"))
        .otherwise(F.lit("insufficient")).alias("reason"))


def synth_price_debits(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("debit_id"),
        F.when(e % 7 == 0, F.lit(0))
        .when(e % 7 == 1, F.lit(-2))
        .otherwise(((e % 4) + 1).cast("int")).alias("amount"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("u-"), (e % 6).cast("string")))
        .alias("user_id"),
        (e % 11 == 0).alias("rpc_raised"),
        (e % 4 != 0).alias("has_data"),
        F.when(e % 6 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 3 != 0).alias("row_success"))


SYNTH_PRICE_DEBITS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS debit_id,
           CAST(CASE WHEN event_id % 7 = 0 THEN 0
                WHEN event_id % 7 = 1 THEN -2
                ELSE (event_id % 4) + 1 END AS INT) AS amount,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'u-' || CAST(event_id % 6 AS VARCHAR)
           END AS user_id,
           event_id % 11 = 0 AS rpc_raised,
           event_id % 4 <> 0 AS has_data,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE event_id % 3 <> 0 END AS row_success
    FROM events
"""


def price_debit_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_PRICE_DEBITS_SQL}),
        g AS (
          SELECT *,
                 amount <= 0 AS free,
                 user_id IS NULL OR user_id = '' AS no_user
          FROM r)
        SELECT debit_id,
               CASE WHEN free OR no_user THEN free
                    ELSE NOT rpc_raised AND has_data
                         AND coalesce(row_success, FALSE) END
                   AS proceed,
               CASE WHEN free THEN 'free'
                    WHEN no_user THEN 'no_user'
                    WHEN rpc_raised THEN 'rpc_error'
                    WHEN NOT has_data THEN 'no_data'
                    WHEN coalesce(row_success, FALSE) THEN 'debited'
                    ELSE 'insufficient' END AS reason
        FROM g
    """
