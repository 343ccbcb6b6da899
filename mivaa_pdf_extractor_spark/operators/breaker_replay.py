"""AI-API circuit-breaker replay fold
(app/utils/circuit_breaker.py:58-217).

The reference wraps AI calls in a three-state breaker
(CLOSED / OPEN / HALF_OPEN).  The network call itself is out of scope;
the state machine over a (time, outcome) call trace is fully
deterministic and is folded here.  Pinned semantics (file:line):

* ``recovery_timeout`` is accepted by the constructor (:71) and stored
  (:85) but NEVER read — a dead parameter (pin).  Only
  ``timeout_seconds`` gates OPEN → HALF_OPEN.
* The OPEN → HALF_OPEN transition is LAZY (:180-189): it is evaluated
  only when a call arrives, and the new ``state_changed_time`` is the
  CALL time, not ``opened_at + timeout`` — an OPEN breaker with no
  traffic stays OPEN forever.
* ``failure_count`` is NOT reset entering HALF_OPEN (:186-188 resets
  only ``half_open_calls``), so it still carries the value that opened
  the circuit (>= threshold).  A single failure in HALF_OPEN therefore
  ALWAYS re-opens immediately (:164-176) — pin.
* A single success in HALF_OPEN closes the circuit and zeroes both
  counters (:151-158); a success in CLOSED resets ``failure_count``
  (:160-162) — failures must be CONSECUTIVE to open.
* Rejected calls (OPEN fail-fast :120-125, HALF_OPEN cap :127-135)
  increment ``total_calls`` (:115) and ``rejected_calls`` but never
  touch ``failure_count`` — they dilute ``success_rate`` whose
  denominator is total INCLUDING rejected (:203-206).
* ``half_open_calls`` increments per accepted call and is never
  decremented (:135), so ``half_open_max_calls`` caps TOTAL accepted
  calls while HALF_OPEN, not concurrency.  In a sequential replay the
  cap branch is DEAD: an executed HALF_OPEN call either closes
  (success) or re-opens (failure, see above) the circuit before the
  next call, so ``half_open_calls`` never exceeds 1 — pinned by a
  pytest that replays an adversarial trace.

``fold_breaker`` replays per-breaker traces (tiny per-key streams) in
``applyInPandas``, the same pattern as the AIMD fold; the DuckDB twin
is a recursive CTE carrying (state, failure_count, half_open_calls,
state_changed_time).  ``breaker_stats`` is the ``get_stats`` (:191-209)
rollup over the replay — one groupBy on the breaker key.

Reference defaults replayed by the contract query: the claude breaker
(threshold 3, timeout 120 s, circuit_breaker.py:213) — the registry of
four breakers with per-service thresholds (:211-217) is exercised in
the pytest.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

CLOSED, OPEN, HALF_OPEN = "closed", "open", "half_open"


def fold_breaker(events: DataFrame, failure_threshold: int = 5,
                 timeout_seconds: int = 60,
                 half_open_max_calls: int = 3) -> DataFrame:
    """``events``: (breaker, event_ord long, t long seconds, outcome in
    {ok, err}).  One output row per call with the lazily-transitioned
    ``state_before``, the disposition, and the post-call state."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_ord")
        state, fc, hoc, changed = CLOSED, 0, 0, None
        out = []
        for r in pdf.itertuples():
            t = int(r.t)
            # lazy OPEN -> HALF_OPEN (:180-189); changed := call time
            if state == OPEN and changed is not None \
                    and t - changed >= timeout_seconds:
                state, hoc, changed = HALF_OPEN, 0, t
            before = state
            if state == OPEN:
                disp = "rejected"
            elif state == HALF_OPEN and hoc >= half_open_max_calls:
                disp = "rejected"          # sequentially dead (pin)
            else:
                disp = "executed"
                if state == HALF_OPEN:
                    hoc += 1
                if r.outcome == "ok":
                    if state == HALF_OPEN:
                        state, fc, hoc, changed = CLOSED, 0, 0, t
                    else:                  # CLOSED success
                        fc = 0
                else:
                    fc += 1
                    if fc >= failure_threshold:
                        state, changed = OPEN, t
            out.append((r.breaker, int(r.event_ord), t, r.outcome,
                        before, disp, state, fc))
        return pd.DataFrame(out, columns=[
            "breaker", "event_ord", "t", "outcome", "state_before",
            "disposition", "state_after", "failure_count"])

    return (events.repartition("breaker")
            .groupBy("breaker").applyInPandas(
                lambda _, g: run(g),
                "breaker string, event_ord long, t long, "
                "outcome string, state_before string, "
                "disposition string, state_after string, "
                "failure_count int"))


def breaker_stats(folded: DataFrame) -> DataFrame:
    """``get_stats`` (:191-209): success_rate = successes / total * 100
    with rejected calls IN the denominator (pin); final state +
    failure_count from the last event."""
    ok = (F.col("disposition") == "executed") & (F.col("outcome") == "ok")
    err = (F.col("disposition") == "executed") & (F.col("outcome") == "err")
    rej = F.col("disposition") == "rejected"
    return (folded.groupBy("breaker").agg(
        F.count("*").cast("long").alias("total_calls"),
        F.sum(ok.cast("long")).alias("successful_calls"),
        F.sum(err.cast("long")).alias("failed_calls"),
        F.sum(rej.cast("long")).alias("rejected_calls"),
        F.max_by("state_after", "event_ord").alias("state"),
        F.max_by("failure_count", "event_ord").alias("failure_count"))
        .withColumn("success_rate",
                    F.col("successful_calls") * 100.0
                    / F.col("total_calls")))


def duck_breaker_sql(failure_threshold: int = 5,
                     timeout_seconds: int = 60,
                     half_open_max_calls: int = 3) -> str:
    """Recursive-CTE twin over a CTE ``cb_events`` (breaker, event_ord,
    t, outcome); yields CTE ``cb_state`` with the same columns as
    ``fold_breaker``.  Carries (state, fc, hoc, changed)."""
    th, to, mx = failure_threshold, timeout_seconds, half_open_max_calls
    # step expressions for the recursive member, parameterized on the
    # prior state s.* and the next call n.*
    return f"""
            cb_numbered AS (
              SELECT *, row_number() OVER (PARTITION BY breaker
                  ORDER BY event_ord) AS rn
              FROM cb_events),
            cb_state AS (
              -- rn = 1: prior state is (closed, 0, 0, NULL); a first
              -- call can only execute
              SELECT breaker, event_ord, t, outcome, rn,
                     'closed' AS state_before,
                     'executed' AS disposition,
                     CASE WHEN outcome = 'err' AND 1 >= {th}
                          THEN 'open' ELSE 'closed' END AS state_after,
                     CASE WHEN outcome = 'err' THEN 1 ELSE 0 END AS fc,
                     0 AS hoc,
                     CASE WHEN outcome = 'err' AND 1 >= {th}
                          THEN t END AS changed
              FROM cb_numbered WHERE rn = 1
              UNION ALL
              SELECT n.breaker, n.event_ord, n.t, n.outcome, n.rn,
                     eff.state AS state_before,
                     CASE WHEN eff.state = 'open' THEN 'rejected'
                          WHEN eff.state = 'half_open'
                               AND eff.hoc >= {mx} THEN 'rejected'
                          ELSE 'executed' END AS disposition,
                     CASE
                       WHEN eff.state = 'open'
                            OR (eff.state = 'half_open'
                                AND eff.hoc >= {mx}) THEN eff.state
                       WHEN n.outcome = 'ok' THEN
                         CASE WHEN eff.state = 'half_open'
                              THEN 'closed' ELSE eff.state END
                       WHEN s.fc + 1 >= {th} THEN 'open'
                       ELSE eff.state END AS state_after,
                     CASE
                       WHEN eff.state = 'open'
                            OR (eff.state = 'half_open'
                                AND eff.hoc >= {mx}) THEN s.fc
                       WHEN n.outcome = 'ok' THEN 0
                       ELSE s.fc + 1 END AS fc,
                     CASE
                       WHEN eff.state = 'open'
                            OR (eff.state = 'half_open'
                                AND eff.hoc >= {mx}) THEN eff.hoc
                       WHEN n.outcome = 'ok'
                            AND eff.state = 'half_open' THEN 0
                       WHEN eff.state = 'half_open'
                            THEN eff.hoc + 1
                       ELSE eff.hoc END AS hoc,
                     CASE
                       WHEN eff.state = 'open'
                            OR (eff.state = 'half_open'
                                AND eff.hoc >= {mx}) THEN eff.changed
                       WHEN n.outcome = 'ok' THEN
                         CASE WHEN eff.state = 'half_open' THEN n.t
                              ELSE eff.changed END
                       WHEN s.fc + 1 >= {th} THEN n.t
                       ELSE eff.changed END AS changed
              FROM cb_state s
              JOIN cb_numbered n
                ON n.breaker = s.breaker AND n.rn = s.rn + 1,
              LATERAL (SELECT
                 CASE WHEN s.state_after = 'open'
                           AND s.changed IS NOT NULL
                           AND n.t - s.changed >= {to}
                      THEN 'half_open' ELSE s.state_after END AS state,
                 CASE WHEN s.state_after = 'open'
                           AND s.changed IS NOT NULL
                           AND n.t - s.changed >= {to}
                      THEN 0 ELSE s.hoc END AS hoc,
                 CASE WHEN s.state_after = 'open'
                           AND s.changed IS NOT NULL
                           AND n.t - s.changed >= {to}
                      THEN n.t ELSE s.changed END AS changed) eff)"""


# ---------------------------------------------------------------------------
# synthesizer (shared by the Spark query and the DuckDB twin)
# ---------------------------------------------------------------------------

def synth_breaker_events(events: DataFrame) -> DataFrame:
    """Deterministic call traces: 24 breakers x 40 calls, spacing
    17/40/63 s by breaker class, error bursts long enough to open a
    threshold-3 breaker and gaps long enough to reach HALF_OPEN."""
    e = events.select((F.col("event_id") % 24).alias("b")).distinct()
    k = F.col("k")
    b = F.col("b")
    seq = e.select("b", F.explode(F.sequence(F.lit(0), F.lit(39)))
                   .alias("k"))
    return seq.select(
        F.concat(F.lit("cb"), b.cast("string")).alias("breaker"),
        (b * 100 + k).cast("long").alias("event_ord"),
        (k * (17 + (b % 3) * 23)).cast("long").alias("t"),
        F.when(((k + b) % 11) < 3, "err").otherwise("ok")
        .alias("outcome"))


SYNTH_BREAKER_SQL = """
    SELECT 'cb' || CAST(b AS VARCHAR) AS breaker,
           CAST(b * 100 + k AS BIGINT) AS event_ord,
           CAST(k * (17 + (b % 3) * 23) AS BIGINT) AS t,
           CASE WHEN (k + b) % 11 < 3 THEN 'err' ELSE 'ok' END
               AS outcome
    FROM (SELECT DISTINCT event_id % 24 AS b FROM events),
         UNNEST(generate_series(0, 39)) AS u(k)
"""
