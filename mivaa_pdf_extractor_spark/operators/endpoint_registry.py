"""Endpoint-registry folds: singleton creation gates, the readiness
predicate, and the processing-lock (auto-pause) replay.

Re-expresses the deterministic state rules of the reference's
HuggingFace-endpoint singleton registry
(``app/services/embeddings/endpoint_registry.py``) as DataFrame plans:

- ``endpoint_ready_gate``    — endpoint_registry.py:84-200,339-360
  (creation gates: the SLIG manager requires ``enabled`` AND
  ``modal_url``; PaddleOCR checks ``enabled`` FIRST then
  ``endpoint_url`` — both fold an exception to None;
  ``is_ready_for_processing`` = health validated AND at least one
  manager created)
- ``processing_lock_replay`` — endpoint_registry.py:283-337
  (``start_processing``/``end_processing``: a duplicate start for an
  already-active job is IGNORED, as is an end for a job that isn't
  active; the active-job count gates ``can_auto_pause``)

The lock replay is NOT an applyInPandas state machine: because each
job's state is binary, the valid events are exactly the first event of
every run of consecutive same-ops per (registry, job) — minus a leading
'end' run with no prior start — so the whole replay is two window
functions (a lag-based run-collapse and a running ±1 sum), shuffling
only on (registry_id, job_id) / registry_id keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# creation gates + readiness (endpoint_registry.py:84-200, 339-360)
# ---------------------------------------------------------------------------

def endpoint_ready_gate(cfgs: DataFrame) -> DataFrame:
    """Per-process registry snapshot → creation outcomes + readiness.

    SLIG manager: ``cfg.enabled`` AND ``cfg.modal_url`` (one combined
    warning), exception folds to None. PaddleOCR: ``enabled`` gate
    FIRST (its own warning) then ``endpoint_url`` — the distinction is
    observable in which warning fires, emitted here as ``paddle_skip``
    ('disabled' / 'no_url' / NULL). Ready = health validated AND at
    least one manager exists (endpoint_registry.py:339-360)."""
    slig_ok = (F.col("slig_enabled") & F.col("slig_has_url")
               & ~F.col("slig_raised"))
    paddle_ok = (F.col("paddle_enabled") & F.col("paddle_has_url")
                 & ~F.col("paddle_raised"))
    return cfgs.select(
        "registry_id",
        slig_ok.alias("slig_created"),
        paddle_ok.alias("paddle_created"),
        F.when(~F.col("paddle_enabled"), "disabled")
        .when(~F.col("paddle_has_url"), "no_url")
        .when(F.col("paddle_raised"), "error")
        .otherwise(F.lit(None).cast("string")).alias("paddle_skip"),
        (F.col("health_validated") & (slig_ok | paddle_ok))
        .alias("ready_for_processing"))


def synth_registry_cfgs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("registry_id"),
        (e % 3 != 0).alias("slig_enabled"),
        (e % 4 != 0).alias("slig_has_url"),
        (e % 11 == 0).alias("slig_raised"),
        (e % 5 != 0).alias("paddle_enabled"),
        (e % 6 != 0).alias("paddle_has_url"),
        (e % 13 == 0).alias("paddle_raised"),
        (e % 2 == 0).alias("health_validated"))


SYNTH_REGISTRY_CFGS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS registry_id,
           event_id % 3 <> 0 AS slig_enabled,
           event_id % 4 <> 0 AS slig_has_url,
           event_id % 11 = 0 AS slig_raised,
           event_id % 5 <> 0 AS paddle_enabled,
           event_id % 6 <> 0 AS paddle_has_url,
           event_id % 13 = 0 AS paddle_raised,
           event_id % 2 = 0 AS health_validated
    FROM events
"""


def ready_gate_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_REGISTRY_CFGS_SQL}),
        g AS (
          SELECT *,
                 slig_enabled AND slig_has_url AND NOT slig_raised
                     AS slig_created,
                 paddle_enabled AND paddle_has_url
                     AND NOT paddle_raised AS paddle_created
          FROM r)
        SELECT registry_id, slig_created, paddle_created,
               CASE WHEN NOT paddle_enabled THEN 'disabled'
                    WHEN NOT paddle_has_url THEN 'no_url'
                    WHEN paddle_raised THEN 'error' END AS paddle_skip,
               health_validated AND (slig_created OR paddle_created)
                   AS ready_for_processing
        FROM g
    """


# ---------------------------------------------------------------------------
# processing lock replay (endpoint_registry.py:283-337)
# ---------------------------------------------------------------------------

def processing_lock_replay(ops: DataFrame) -> DataFrame:
    """Replay start/end_processing events per registry. Valid events =
    first-of-run per (registry, job) via lag (duplicate starts / ends
    are no-ops), minus a leading 'end' with no prior start; the running
    sum of ±1 over valid events is the active-job count after each
    event, and ``can_auto_pause`` = count == 0."""
    w_job = (Window.partitionBy("registry_id", "job_id").orderBy("seq"))
    prev_op = F.lag("op").over(w_job)
    cand = prev_op.isNull() | (F.col("op") != prev_op)
    with_cand = ops.withColumn("cand", cand)
    # rank among candidate rows via a running conditional count on the
    # SAME (registry, job) sort — no extra (…, cand) exchange
    w_run = w_job.rowsBetween(Window.unboundedPreceding, 0)
    with_rank = with_cand.withColumn(
        "cand_rank",
        F.when(F.col("cand"),
               F.sum(F.col("cand").cast("int")).over(w_run)))
    valid = (F.col("cand")
             & ~((F.col("cand_rank") == 1) & (F.col("op") == "end")))
    delta = (F.when(valid & (F.col("op") == "start"), 1)
             .when(valid & (F.col("op") == "end"), -1).otherwise(0))
    w_reg = (Window.partitionBy("registry_id").orderBy("seq")
             .rowsBetween(Window.unboundedPreceding, 0))
    return (with_rank
            .withColumn("valid", valid)
            .withColumn("active_after",
                        F.sum(delta).over(w_reg).cast("int"))
            .select("registry_id", "seq", "job_id", "op", "valid",
                    "active_after",
                    (F.col("active_after") == 0)
                    .alias("can_auto_pause")))


def synth_lock_ops(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        (e % 4).cast("long").alias("registry_id"),
        e.cast("long").alias("seq"),
        F.concat(F.lit("job-"),
                 (F.floor(e / 4).cast("long") % 5).cast("string"))
        .alias("job_id"),
        F.when((e * 7) % 11 < 6, "start").otherwise("end").alias("op"))


SYNTH_LOCK_OPS_SQL = """
    SELECT CAST(event_id % 4 AS BIGINT) AS registry_id,
           CAST(event_id AS BIGINT) AS seq,
           'job-' || CAST((event_id // 4) % 5 AS VARCHAR) AS job_id,
           CASE WHEN (event_id * 7) % 11 < 6 THEN 'start'
                ELSE 'end' END AS op
    FROM events
"""


def lock_replay_sql() -> str:
    return f"""
        WITH o AS ({SYNTH_LOCK_OPS_SQL}),
        c AS (
          SELECT *,
                 lag(op) OVER (PARTITION BY registry_id, job_id
                               ORDER BY seq) AS prev_op
          FROM o),
        d AS (
          SELECT *,
                 prev_op IS NULL OR op <> prev_op AS cand
          FROM c),
        e2 AS (
          SELECT *,
                 CASE WHEN cand THEN
                     sum(CASE WHEN cand THEN 1 ELSE 0 END) OVER (
                         PARTITION BY registry_id, job_id
                         ORDER BY seq
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) END AS cand_rank
          FROM d),
        v AS (
          SELECT *,
                 cand AND NOT (cand_rank = 1 AND op = 'end') AS valid
          FROM e2)
        SELECT registry_id, seq, job_id, op, valid,
               CAST(sum(CASE WHEN valid AND op = 'start' THEN 1
                             WHEN valid AND op = 'end' THEN -1
                             ELSE 0 END)
                    OVER (PARTITION BY registry_id ORDER BY seq
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS INT) AS active_after,
               sum(CASE WHEN valid AND op = 'start' THEN 1
                        WHEN valid AND op = 'end' THEN -1
                        ELSE 0 END)
                   OVER (PARTITION BY registry_id ORDER BY seq
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) = 0 AS can_auto_pause
        FROM v
    """
