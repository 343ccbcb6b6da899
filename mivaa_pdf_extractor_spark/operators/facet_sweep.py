"""Facet re-canonicalization sweep planner: version-cursor selection,
degraded-first ordering, and the outcome ledger.

Re-expresses ``recanonicalize_products``
(app/services/facets/facet_recanonicalization.py:74-216) as a batch
plan. The reference loops Postgres pages; the semantics of one sweep
call reduce to a deterministic selection + per-product outcome fold:

- Eligible: ``facet_canonicalization_version < target_version`` (+
  optional workspace scope).
- Selection order: the DEGRADED pass first (rows carrying the
  ``metadata.facet_canonicalization.status`` marker), then the stale
  pass — each ordered by id — capped at ``max_products`` TOTAL (if the
  degraded pass exhausts the cap, the stale pass selects nothing;
  pass-1 rows are excluded from pass 2 via processed_ids, :130).
- Outcomes (:151-208):
  - no replay source (empty attributes_raw AND empty metadata
    fallback) → ``skipped_no_raw``, version bumped — even for a
    degraded row, which therefore permanently exits the sweep while
    keeping its marker (faithful-to-code; the module docstring's
    "degraded rows stay eligible" does not hold for no-raw rows);
  - canonicalizer raised → ``failed``, version kept;
  - result.status != 'ok' → ``degraded``, version kept, marker kept
    (the never-bump-on-degraded rule);
  - ok → ``updated``, version bumped, marker cleared.
- ``remaining`` = eligible rows still below target AFTER the run
  (eligible_before − bumped), the honest not-done count (:210-216).

The canonicalizer itself is the (separately covered) facet_resolve
tier; here its per-product outcome arrives as an input column, exactly
as the driver of the sweep observes it.

Scale notes: selection is two row_number windows over the id order (one
shuffle); the ledger is a map-side projection; the summary is a single
map-side-combinable aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def plan_sweep(products: DataFrame, target_version: int,
               max_products: int, degraded_only: bool = False) -> DataFrame:
    """products: (product_id, version, degraded, has_raw, outcome) →
    selected rows (product_id, sweep_pass, sweep_rank, outcome,
    new_version, marker_cleared). ``outcome`` input is the
    canonicalizer's per-product result ('ok' | 'degraded_result' |
    'raise'); the emitted ``outcome`` is the ledger outcome."""
    eligible = products.filter(F.col("version") < target_version)
    # orderBy+limit compiles to TakeOrderedAndProject (a distributed
    # partial top-k), so the rank window below only ever sees
    # <= max_products rows — no global sort of the eligible set.
    w_d = Window.partitionBy(F.lit(1)).orderBy("product_id")
    deg = (eligible.filter(F.col("degraded"))
           .orderBy("product_id").limit(max_products)
           .withColumn("rn", F.row_number().over(w_d))
           .withColumn("sweep_pass", F.lit("degraded")))
    if degraded_only:
        sel = deg
    else:
        deg_count = deg.groupBy().agg(
            F.count(F.lit(1)).alias("n_deg"))
        stale = (eligible.filter(~F.col("degraded"))
                 .orderBy("product_id").limit(max_products)
                 .crossJoin(F.broadcast(deg_count))
                 .withColumn("rn0", F.row_number().over(w_d))
                 .filter(F.col("rn0") <= max_products - F.col("n_deg"))
                 .withColumn("rn", F.col("rn0") + F.col("n_deg"))
                 .withColumn("sweep_pass", F.lit("stale"))
                 .drop("rn0", "n_deg"))
        sel = deg.unionByName(stale)
    ledger_outcome = (
        F.when(~F.col("has_raw"), "skipped_no_raw")
         .when(F.col("outcome") == "raise", "failed")
         .when(F.col("outcome") == "degraded_result", "degraded")
         .otherwise("updated"))
    bumped = ledger_outcome.isin("skipped_no_raw", "updated")
    return sel.select(
        "product_id", "sweep_pass",
        # cast: the stale branch's rn is rn0 + count() (bigint) while the
        # degraded branch is a bare row_number (int); pin the union to int
        F.col("rn").cast("int").alias("sweep_rank"),
        ledger_outcome.alias("outcome"),
        F.when(bumped, F.lit(target_version)).otherwise(F.col("version"))
         .alias("new_version"),
        (ledger_outcome == "updated").alias("marker_cleared"))


def sweep_summary(products: DataFrame, target_version: int,
                  max_products: int) -> DataFrame:
    """The reference's summary dict as one row: scanned / updated /
    degraded / skipped_no_raw / failed / remaining."""
    plan = plan_sweep(products, target_version, max_products)
    eligible_before = products.filter(
        F.col("version") < target_version).count()
    agg = plan.agg(
        F.count(F.lit(1)).alias("scanned"),
        F.sum(F.when(F.col("outcome") == "updated", 1).otherwise(0))
         .alias("updated"),
        F.sum(F.when(F.col("outcome") == "degraded", 1).otherwise(0))
         .alias("degraded"),
        F.sum(F.when(F.col("outcome") == "skipped_no_raw", 1).otherwise(0))
         .alias("skipped_no_raw"),
        F.sum(F.when(F.col("outcome") == "failed", 1).otherwise(0))
         .alias("failed"),
        F.sum(F.when(F.col("new_version") == target_version, 1)
               .otherwise(0)).alias("bumped"))
    return agg.select(
        "scanned", "updated", "degraded", "skipped_no_raw", "failed",
        (F.lit(eligible_before) - F.col("bumped")).alias("remaining"))


TARGET_VERSION = 2
MAX_PRODUCTS = 40


def synth_sweep_products(events: DataFrame) -> DataFrame:
    """Versions above/at/below target, degraded markers, no-raw rows,
    and all three canonicalizer outcomes."""
    p = F.col("pid")
    base = events.select((F.col("event_id") % 120).alias("pid")).distinct()
    return base.select(
        p.alias("product_id"),
        (p % 4).cast("int").alias("version"),   # 0,1 eligible; 2,3 done
        (p % 5 == 0).alias("degraded"),
        (p % 7 != 1).alias("has_raw"),
        (F.when(p % 6 == 0, "degraded_result")
          .when(p % 6 == 1, "raise").otherwise("ok")).alias("outcome"))


SYNTH_SWEEP_PRODUCTS_SQL = """
    SELECT pid AS product_id,
           CAST(pid % 4 AS INT) AS version,
           pid % 5 = 0 AS degraded,
           pid % 7 <> 1 AS has_raw,
           CASE WHEN pid % 6 = 0 THEN 'degraded_result'
                WHEN pid % 6 = 1 THEN 'raise'
                ELSE 'ok' END AS outcome
    FROM (SELECT DISTINCT event_id % 120 AS pid FROM events)
"""


def _duck_plan_ctes(target_version: int, max_products: int) -> str:
    return f"""
    eligible AS (
        SELECT * FROM products_in WHERE version < {target_version}
    ), deg AS (
        SELECT *, 'degraded' AS sweep_pass,
               ROW_NUMBER() OVER (ORDER BY product_id) AS rn
        FROM eligible WHERE degraded
        QUALIFY rn <= {max_products}
    ), stale AS (
        SELECT e.*, 'stale' AS sweep_pass,
               ROW_NUMBER() OVER (ORDER BY e.product_id)
                 + (SELECT COUNT(*) FROM deg) AS rn
        FROM eligible e WHERE NOT e.degraded
        QUALIFY ROW_NUMBER() OVER (ORDER BY e.product_id)
                <= {max_products} - (SELECT COUNT(*) FROM deg)
    ), sel AS (
        SELECT product_id, version, degraded, has_raw, outcome,
               sweep_pass, rn FROM deg
        UNION ALL
        SELECT product_id, version, degraded, has_raw, outcome,
               sweep_pass, rn FROM stale
    ), ledger AS (
        SELECT *,
               CASE WHEN NOT has_raw THEN 'skipped_no_raw'
                    WHEN outcome = 'raise' THEN 'failed'
                    WHEN outcome = 'degraded_result' THEN 'degraded'
                    ELSE 'updated' END AS ledger_outcome
        FROM sel
    ), plan_out AS (
        SELECT product_id, sweep_pass, CAST(rn AS INT) AS sweep_rank,
               ledger_outcome AS outcome,
               CASE WHEN ledger_outcome IN ('skipped_no_raw', 'updated')
                    THEN {target_version} ELSE version END AS new_version,
               ledger_outcome = 'updated' AS marker_cleared
        FROM ledger
    )"""


def duck_plan_sweep_sql(target_version: int, max_products: int) -> str:
    return (_duck_plan_ctes(target_version, max_products)
            + "\n    SELECT * FROM plan_out\n")


def duck_sweep_summary_sql(target_version: int, max_products: int) -> str:
    return f"""
    {_duck_plan_ctes(target_version, max_products)},
    agg AS (
        SELECT COUNT(*) AS scanned,
               CAST(COALESCE(SUM(CASE WHEN outcome = 'updated' THEN 1 ELSE 0 END), 0) AS BIGINT) AS updated,
               CAST(COALESCE(SUM(CASE WHEN outcome = 'degraded' THEN 1 ELSE 0 END), 0) AS BIGINT) AS degraded,
               CAST(COALESCE(SUM(CASE WHEN outcome = 'skipped_no_raw' THEN 1 ELSE 0 END), 0) AS BIGINT) AS skipped_no_raw,
               CAST(COALESCE(SUM(CASE WHEN outcome = 'failed' THEN 1 ELSE 0 END), 0) AS BIGINT) AS failed,
               CAST(COALESCE(SUM(CASE WHEN new_version = {target_version} THEN 1 ELSE 0 END), 0) AS BIGINT) AS bumped
        FROM plan_out
    )
    SELECT scanned, updated, degraded, skipped_no_raw, failed,
           CAST((SELECT COUNT(*) FROM products_in
                 WHERE version < {target_version}) - bumped AS BIGINT) AS remaining
    FROM agg
"""
