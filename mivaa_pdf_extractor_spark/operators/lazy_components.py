"""Lazy-component lifecycle fold.

Re-expresses ``app/services/utilities/lazy_loader.py:20-160``
(``LazyComponent.load/unload/get`` + ``LazyComponentManager``) as a
window fold. Pinned behaviors:

- ``load`` on an already-loaded component is a cached no-op; a FAILED
  load resets to unloaded (it already was — no state change);
- ``unload`` runs the cleanup INSIDE the try BEFORE clearing state, so
  a raising cleanup leaves the component LOADED (pin — the except
  only logs);
- ``unload`` on an unloaded component returns early;
- ``get`` ≡ load-if-needed;
- re-``register`` replaces the wrapper → state resets to unloaded.

Because the per-component state is binary and every op either sets it
(load_ok/get_ok → loaded, unload_ok/register → unloaded) or leaves it
untouched (load_fail, unload_fail, gets on loaded), the replay is ONE
``last_value(ignorenulls)`` window over the effective transitions — no
per-row state machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SET_OPS = {"load_ok": True, "get_ok": True,
            "unload_ok": False, "register": False}


def lazy_component_replay(ops: DataFrame) -> DataFrame:
    """Per event: loaded_after + whether the op was a state-changing
    transition (vs a cached/no-op/failed call)."""
    transition = (F.when(F.col("op").isin("load_ok", "get_ok"),
                         F.lit(True))
                  .when(F.col("op").isin("unload_ok", "register"),
                        F.lit(False)))
    w = (Window.partitionBy("manager_id", "component")
         .orderBy("seq")
         .rowsBetween(Window.unboundedPreceding, 0))
    w_prev = (Window.partitionBy("manager_id", "component")
              .orderBy("seq")
              .rowsBetween(Window.unboundedPreceding, -1))
    loaded_after = F.coalesce(
        F.last(transition, ignorenulls=True).over(w), F.lit(False))
    loaded_before = F.coalesce(
        F.last(transition, ignorenulls=True).over(w_prev), F.lit(False))
    changed = loaded_after != loaded_before
    return ops.select(
        "manager_id", "component", "seq", "op",
        loaded_after.alias("loaded_after"),
        changed.alias("state_changed"),
        # the unload_fail pin: cleanup raised, component STAYS loaded
        ((F.col("op") == "unload_fail") & loaded_before)
        .alias("stuck_loaded"))


def synth_lazy_ops(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        (e % 3).cast("long").alias("manager_id"),
        F.concat(F.lit("comp-"),
                 (F.floor(e / 3).cast("long") % 4).cast("string"))
        .alias("component"),
        e.cast("long").alias("seq"),
        F.element_at(F.array(
            F.lit("register"), F.lit("load_ok"), F.lit("load_fail"),
            F.lit("get_ok"), F.lit("unload_ok"), F.lit("unload_fail"),
            F.lit("load_ok")), ((e * 11) % 7 + 1).cast("int"))
        .alias("op"))


SYNTH_LAZY_OPS_SQL = """
    SELECT CAST(event_id % 3 AS BIGINT) AS manager_id,
           'comp-' || CAST((event_id // 3) % 4 AS VARCHAR)
               AS component,
           CAST(event_id AS BIGINT) AS seq,
           (['register', 'load_ok', 'load_fail', 'get_ok',
             'unload_ok', 'unload_fail', 'load_ok'])
             [CAST((event_id * 11) % 7 AS INT) + 1] AS op
    FROM events
"""


def lazy_replay_sql() -> str:
    return f"""
        WITH o AS ({SYNTH_LAZY_OPS_SQL}),
        t AS (
          SELECT *,
                 CASE WHEN op IN ('load_ok', 'get_ok') THEN TRUE
                      WHEN op IN ('unload_ok', 'register') THEN FALSE
                 END AS transition
          FROM o),
        s AS (
          SELECT *,
                 coalesce(last_value(transition IGNORE NULLS)
                   OVER (PARTITION BY manager_id, component
                         ORDER BY seq
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW), FALSE) AS loaded_after,
                 coalesce(last_value(transition IGNORE NULLS)
                   OVER (PARTITION BY manager_id, component
                         ORDER BY seq
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), FALSE) AS loaded_before
          FROM t)
        SELECT manager_id, component, seq, op,
               loaded_after,
               loaded_after <> loaded_before AS state_changed,
               op = 'unload_fail' AND loaded_before AS stuck_loaded
        FROM s
    """
