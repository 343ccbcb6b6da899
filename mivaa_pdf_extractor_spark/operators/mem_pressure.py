"""Memory-pressure folds (app/utils/memory_monitor.py).

The psutil sampling is runtime; the tiering and batch-size policy over
a (percent_used, available_mb) sample is deterministic and folded
here.  Pinned semantics (file:line):

* The tier thresholds live on the ``MemoryStats`` DATACLASS as
  hardcoded properties — high is ``percent_used > 65`` (:33-39) and
  critical is ``> 75`` (:41-47), both STRICT.  The monitor
  constructor's ``high_threshold=80`` / ``critical_threshold=90``
  (:58-76) are stored but NEVER read by any pressure check — dead
  parameters (pin); ``check_memory_pressure`` (:100-131) dispatches on
  the dataclass properties only.
* ``calculate_optimal_batch_size`` (:183-231):
  - ``percent_used < 50`` (STRICT) -> ``min(default, max)`` — the
    MINIMUM clamp is skipped on this path, so a default below
    ``min_batch_size`` passes through (pin);
  - ``is_high_pressure`` -> ``min_batch_size`` — i.e. the cut
    actually fires at > 65, not the "> 80%" the comment claims (the
    comment lies; the property wins — pin);
  - else (50 <= pct <= 65): ``int(available * 0.8 / per_item)``
    truncated, clamped to [min, max];
  - exactly 50 and exactly 65 both take the computed branch (both
    comparisons strict — pin).
* ``wait_for_memory_available`` (:133-176): the proceed check is
  ``available >= required`` INCLUSIVE; the give-up check is
  ``elapsed > max_wait`` STRICT, evaluated AFTER the availability
  check — a probe that satisfies the requirement at elapsed >
  max_wait still proceeds (the timeout only fires on unsatisfied
  probes — pin).

All three fold as native projections / window minima — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HIGH_PCT = 65.0       # dataclass property (:39) — NOT the ctor's 80
CRITICAL_PCT = 75.0   # dataclass property (:47) — NOT the ctor's 90


def pressure_tier(samples: DataFrame) -> DataFrame:
    """check_memory_pressure dispatch (:100-131): critical beats high;
    both strict."""
    p = F.col("percent_used")
    return samples.select(
        "sample_ord", "percent_used", "available_mb",
        (F.when(p > CRITICAL_PCT, "critical")
         .when(p > HIGH_PCT, "high")
         .otherwise("normal")).alias("tier"),
        # auto-cleanup triggers on BOTH elevated tiers (:115-127)
        (p > HIGH_PCT).alias("gc_triggered"))


def optimal_batch_size(samples: DataFrame, default_batch_size: int,
                       min_batch_size: int = 1,
                       max_batch_size: int = 20,
                       memory_per_item_mb: float = 10.0) -> DataFrame:
    """calculate_optimal_batch_size (:183-231)."""
    p = F.col("percent_used")
    computed = F.floor(F.col("available_mb") * 0.8
                       / memory_per_item_mb).cast("int")
    clamped = F.greatest(F.lit(min_batch_size),
                         F.least(computed, F.lit(max_batch_size)))
    return samples.select(
        "sample_ord", "percent_used", "available_mb",
        (F.when(p < 50, F.least(F.lit(default_batch_size),
                                F.lit(max_batch_size)))
         .when(p > HIGH_PCT, F.lit(min_batch_size))
         .otherwise(clamped)).cast("int").alias("batch_size"))


def wait_outcome(probes: DataFrame, required_mb: float = 100.0,
                 max_wait_seconds: float = 60.0) -> DataFrame:
    """wait_for_memory_available replay (:133-176) over per-operation
    probe sequences (op, probe_ord, elapsed, available_mb): the first
    satisfying probe proceeds; the first unsatisfied probe past
    max_wait raises.  One row per op: (outcome, at_probe, at_elapsed).
    """
    sat = F.col("available_mb") >= required_mb           # inclusive
    expired = F.col("elapsed") > max_wait_seconds        # strict
    w = Window.partitionBy("op").orderBy("probe_ord")
    # a probe terminates the loop if satisfying OR (unsat AND expired)
    term = sat | expired
    first_term = (probes
                  .withColumn("is_term", term)
                  .where(F.col("is_term"))
                  .withColumn("rk", F.row_number().over(w))
                  .where(F.col("rk") == 1))
    return first_term.select(
        "op",
        F.when(sat, "proceed").otherwise("memory_error")
        .alias("outcome"),
        F.col("probe_ord").alias("at_probe"),
        F.col("elapsed").alias("at_elapsed"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_mem_samples(events: DataFrame) -> DataFrame:
    """percent_used covers 0..100 incl. exact 50 / 65 / 75 boundaries;
    available spans the clamp range (quarters — binary exact)."""
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("sample_ord"),
        ((e % 101).cast("double")).alias("percent_used"),
        ((e % 1200).cast("double") * 0.25).alias("available_mb"))


SYNTH_MEM_SQL = """
    SELECT CAST(event_id AS BIGINT) AS sample_ord,
           CAST(event_id % 101 AS DOUBLE) AS percent_used,
           CAST(event_id % 1200 AS DOUBLE) * 0.25 AS available_mb
    FROM events
"""


def pressure_tier_sql() -> str:
    return f"""
        SELECT sample_ord, percent_used, available_mb,
               CASE WHEN percent_used > {CRITICAL_PCT} THEN 'critical'
                    WHEN percent_used > {HIGH_PCT} THEN 'high'
                    ELSE 'normal' END AS tier,
               percent_used > {HIGH_PCT} AS gc_triggered
        FROM ({SYNTH_MEM_SQL})
    """


def batch_size_sql(default_batch_size: int, min_batch_size: int = 1,
                   max_batch_size: int = 20,
                   memory_per_item_mb: float = 10.0) -> str:
    return f"""
        SELECT sample_ord, percent_used, available_mb,
               CAST(CASE
                 WHEN percent_used < 50 THEN
                   least({default_batch_size}, {max_batch_size})
                 WHEN percent_used > {HIGH_PCT} THEN {min_batch_size}
                 ELSE greatest({min_batch_size},
                        least(CAST(floor(available_mb * 0.8
                                         / {memory_per_item_mb})
                                   AS INT), {max_batch_size}))
               END AS INT) AS batch_size
        FROM ({SYNTH_MEM_SQL})
    """


def synth_wait_probes(events: DataFrame) -> DataFrame:
    """Ops with 14 probes at 5 s spacing (last lands past max_wait); availability ramps by op so
    some satisfy early, some late (past max_wait), some never."""
    e = events.select((F.col("event_id") % 30).alias("o")).distinct()
    seq = e.select("o", F.explode(F.sequence(F.lit(0), F.lit(13)))
                   .alias("k"))
    o, k = F.col("o"), F.col("k")
    return seq.select(
        F.concat(F.lit("op"), o.cast("string")).alias("op"),
        k.cast("long").alias("probe_ord"),
        (k.cast("double") * 5.0).alias("elapsed"),
        (k.cast("double") * (o % 7).cast("double") * 3.25
         + (o % 11).cast("double") * 4.0).alias("available_mb"))


SYNTH_WAIT_SQL = """
    SELECT 'op' || CAST(o AS VARCHAR) AS op,
           CAST(k AS BIGINT) AS probe_ord,
           CAST(k AS DOUBLE) * 5.0 AS elapsed,
           CAST(k AS DOUBLE) * CAST(o % 7 AS DOUBLE) * 3.25
               + CAST(o % 11 AS DOUBLE) * 4.0 AS available_mb
    FROM (SELECT DISTINCT event_id % 30 AS o FROM events),
         UNNEST(generate_series(0, 13)) AS u(k)
"""


def wait_outcome_sql(required_mb: float = 100.0,
                     max_wait_seconds: float = 60.0) -> str:
    return f"""
        WITH probes AS ({SYNTH_WAIT_SQL}),
        term AS (
          SELECT *, available_mb >= {required_mb} AS sat,
                 row_number() OVER (PARTITION BY op
                     ORDER BY probe_ord) AS rk
          FROM probes
          WHERE available_mb >= {required_mb}
             OR elapsed > {max_wait_seconds})
        SELECT op,
               CASE WHEN sat THEN 'proceed'
                    ELSE 'memory_error' END AS outcome,
               probe_ord AS at_probe, elapsed AS at_elapsed
        FROM term WHERE rk = 1
    """
