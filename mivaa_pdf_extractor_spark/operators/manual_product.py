"""Dealer manual-product creation folds (app/api/products.py:504-656).

The ingest core itself is pinned elsewhere (import/product folds);
this module folds the route's deterministic shaping (file:line):

* Debit plan (:524-541): 1 base credit + 1 per image
  (CREATE_MANUAL_BASE/IMAGE_CREDITS, :31-32); a ROOT workspace is
  never billed, and the is_root READ ERROR folds to not-root — a
  failed ownership lookup BILLS the platform owner (fail-billed pin);
  no user id -> no debit; a non-zero debit that fails -> 402
  'Insufficient credits'.
* Payload shape (:556-581): ``unit`` injected into metadata when
  truthy; six descriptive facets (color, colors, designer,
  collection, finish, material) promoted to top level when PRESENT in
  metadata (key-presence, not truthiness — a present-empty value
  promotes, pin); ``size`` read from meta; description ``or ''``;
  images enumerate 0-based with success=True stamped.
* Failure refunds (:588-607): exception AND falsy product_id both
  refund the full amount; a quota-counter increase converts the
  generic 500 into the pinned 402 'quota_exceeded: materials limit
  reached on your plan. Upgrade to add more.' (#214).
* Passthrough (:612-632): category / long_description / cost use
  IS-NOT-None gates while specifications / properties use TRUTHY
  gates (an empty dict is SKIPPED — asymmetric, pin); a provided cost
  drags cost_currency ``or 'EUR'`` + cost_source 'manual';
  properties MERGE over the stored base (request keys win).

Map-side projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BASE_CREDITS = 1
IMAGE_CREDITS = 1


def manual_debit_plan(reqs: DataFrame) -> DataFrame:
    """reqs: (req_id, has_user, is_root, root_read_ok, n_images,
    debit_ok)."""
    root = F.col("root_read_ok") & F.col("is_root")   # error -> False
    amount = F.when(~F.col("has_user") | root, F.lit(0)) \
        .otherwise(F.lit(BASE_CREDITS)
                   + F.col("n_images") * IMAGE_CREDITS)
    insufficient = (amount > 0) & ~F.col("debit_ok")
    return reqs.select(
        "req_id", amount.cast("int").alias("debit_amount"),
        F.when(insufficient, 402).otherwise(200).cast("int")
        .alias("status"),
        F.when(insufficient, F.lit("Insufficient credits"))
        .alias("detail"))


def manual_passthrough(reqs: DataFrame) -> DataFrame:
    """reqs: (req_id, category nullable, long_description nullable,
    cost double nullable, cost_currency nullable, has_specs bool,
    specs_empty bool, has_props bool, props_empty bool)."""
    cost_set = F.col("cost").isNotNull()
    return reqs.select(
        "req_id",
        F.col("category").isNotNull().alias("category_written"),
        F.col("long_description").isNotNull()
        .alias("long_description_written"),
        cost_set.alias("cost_written"),
        F.when(cost_set,
               F.coalesce(F.when(F.col("cost_currency") != "",
                                 F.col("cost_currency")),
                          F.lit("EUR"))).alias("cost_currency_out"),
        F.when(cost_set, F.lit("manual")).alias("cost_source"),
        # truthy gates: empty dicts skipped (pin)
        (F.col("has_specs") & ~F.col("specs_empty"))
        .alias("specifications_written"),
        (F.col("has_props") & ~F.col("props_empty"))
        .alias("properties_merged"))


def synth_manual_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        (e % 7 != 0).alias("has_user"),
        (e % 5 == 0).alias("is_root"),
        (e % 9 != 0).alias("root_read_ok"),
        (e % 8).cast("int").alias("n_images"),
        (e % 4 != 0).alias("debit_ok"))


SYNTH_MANUAL_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           event_id % 7 <> 0 AS has_user,
           event_id % 5 = 0 AS is_root,
           event_id % 9 <> 0 AS root_read_ok,
           CAST(event_id % 8 AS INT) AS n_images,
           event_id % 4 <> 0 AS debit_ok
    FROM events
"""


def debit_plan_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_MANUAL_SQL}),
        g AS (
          SELECT *,
                 CAST(CASE WHEN NOT has_user
                           OR (root_read_ok AND is_root) THEN 0
                      ELSE {BASE_CREDITS}
                           + n_images * {IMAGE_CREDITS} END AS INT)
                     AS debit_amount
          FROM r)
        SELECT req_id, debit_amount,
               CAST(CASE WHEN debit_amount > 0 AND NOT debit_ok
                    THEN 402 ELSE 200 END AS INT) AS status,
               CASE WHEN debit_amount > 0 AND NOT debit_ok
                    THEN 'Insufficient credits' END AS detail
        FROM g
    """


def synth_passthrough_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        F.when(e % 3 == 0, F.lit(None).cast("string"))
        .when(e % 3 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("cat"), (e % 5).cast("string")))
        .alias("category"),
        F.when(e % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("long desc "), e.cast("string")))
        .alias("long_description"),
        F.when(e % 5 == 0, F.lit(None).cast("double"))
        .when(e % 5 == 1, F.lit(0.0))
        .otherwise((e % 90).cast("double") * 0.25).alias("cost"),
        F.when(e % 6 == 0, F.lit(None).cast("string"))
        .when(e % 6 == 1, F.lit(""))
        .otherwise(F.lit("USD")).alias("cost_currency"),
        (e % 7 != 0).alias("has_specs"),
        (e % 8 == 0).alias("specs_empty"),
        (e % 9 != 0).alias("has_props"),
        (e % 10 == 0).alias("props_empty"))


SYNTH_PASSTHROUGH_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           CASE WHEN event_id % 3 = 0 THEN NULL
                WHEN event_id % 3 = 1 THEN ''
                ELSE 'cat' || CAST(event_id % 5 AS VARCHAR) END
               AS category,
           CASE WHEN event_id % 4 = 0 THEN NULL
                ELSE 'long desc ' || CAST(event_id AS VARCHAR) END
               AS long_description,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN 0.0
                ELSE CAST(event_id % 90 AS DOUBLE) * 0.25 END
               AS cost,
           CASE WHEN event_id % 6 = 0 THEN NULL
                WHEN event_id % 6 = 1 THEN ''
                ELSE 'USD' END AS cost_currency,
           event_id % 7 <> 0 AS has_specs,
           event_id % 8 = 0 AS specs_empty,
           event_id % 9 <> 0 AS has_props,
           event_id % 10 = 0 AS props_empty
    FROM events
"""


def passthrough_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_PASSTHROUGH_SQL})
        SELECT req_id,
               category IS NOT NULL AS category_written,
               long_description IS NOT NULL
                   AS long_description_written,
               cost IS NOT NULL AS cost_written,
               CASE WHEN cost IS NOT NULL THEN
                 CASE WHEN cost_currency IS NOT NULL
                           AND cost_currency <> '' THEN cost_currency
                      ELSE 'EUR' END END AS cost_currency_out,
               CASE WHEN cost IS NOT NULL THEN 'manual' END
                   AS cost_source,
               has_specs AND NOT specs_empty
                   AS specifications_written,
               has_props AND NOT props_empty AS properties_merged
        FROM r
    """
