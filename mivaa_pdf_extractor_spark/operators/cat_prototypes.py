"""Category-prototype folds (app/api/category_prototypes.py).

The Voyage embedding calls are out of scope; the deterministic shaping
is folded here (file:line):

* ``generate_prototype_text_embedding`` (:85-109): per-description
  embeddings are gathered with an ``if embedding:`` gate — a FALSY
  (empty-list / None) embedding is silently dropped from the average
  rather than failing (pin); the average is ``np.mean(axis=0)``
  element-wise over the survivors; zero survivors raises.
* ``update_category_prototype`` (:113-151): success envelope carries
  descriptions_count + "Successfully updated {k}"; a no-row update
  folds to success=False with "Category {k} not found in database";
  an exception folds to "Error: {msg}".
* ``populate_category_prototypes`` rollup (:154-187): overall
  ``success = success_count > 0`` — ONE success out of ten makes the
  whole run a success (pin); message
  "Processed {n} categories: {s} succeeded, {f} failed".
* ``CATEGORY_PROTOTYPES`` (:22-72) is a pinned 10-category data
  constant (3 descriptions each) — keys replicated here as data.

The element-wise mean is a posexplode + groupBy over (category, dim) —
map-side combinable, no driver collect; dims are bounded (1024 in the
reference, 8 in the synthetic twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CATEGORY_KEYS = (
    "ceramic_tile", "porcelain_tile", "marble", "granite", "wood",
    "glass", "concrete", "terrazzo", "quartz", "vinyl",
)  # category_prototypes.py:22-72, dict order


def prototype_embed_avg(embeds: DataFrame) -> DataFrame:
    """embeds: (category_key, desc_idx, embedding array<double> —
    NULL/empty = falsy, dropped).  One row per (category, dim) with
    the element-wise mean over surviving descriptions."""
    ok = embeds.where(F.col("embedding").isNotNull()
                      & (F.size("embedding") > 0))
    exploded = ok.select(
        "category_key",
        F.posexplode("embedding").alias("dim", "v"))
    return (exploded.groupBy("category_key", "dim")
            .agg((F.sum("v") / F.count("*")).alias("avg_v")))


def populate_rollup(outcomes: DataFrame) -> DataFrame:
    """outcomes: (category_key, outcome in {updated, not_found,
    error}, error_msg nullable, n_descriptions int).  Per-category
    envelope + ONE rollup row (category_key = '__summary__')."""
    o = F.col("outcome")
    per_cat = outcomes.select(
        "category_key",
        (o == "updated").alias("success"),
        (F.when(o == "updated",
                F.concat(F.lit("Successfully updated "),
                         F.col("category_key")))
         .when(o == "not_found",
               F.concat(F.lit("Category "), F.col("category_key"),
                        F.lit(" not found in database")))
         .otherwise(F.concat(F.lit("Error: "),
                             F.col("error_msg")))).alias("message"),
        F.when(o == "updated", F.col("n_descriptions"))
        .cast("int").alias("descriptions_count"))
    summary = outcomes.agg(
        F.sum((o == "updated").cast("long")).alias("s"),
        F.count("*").alias("n")).select(
        F.lit("__summary__").alias("category_key"),
        (F.col("s") > 0).alias("success"),   # one success wins (pin)
        F.concat(F.lit("Processed "), F.col("n").cast("string"),
                 F.lit(" categories: "), F.col("s").cast("string"),
                 F.lit(" succeeded, "),
                 (F.col("n") - F.col("s")).cast("string"),
                 F.lit(" failed")).alias("message"),
        F.lit(None).cast("int").alias("descriptions_count"))
    return per_cat.unionByName(summary)


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

DIMS = 8


def synth_proto_embeds(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    keys = F.array(*[F.lit(k) for k in CATEGORY_KEYS])
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(DIMS - 1)),
        lambda d: ((e % 37).cast("double") * 0.25
                   + d.cast("double") * 0.5))
    return (events.where(e % 17 == 0).select(
        F.element_at(keys, (e % 10 + 1).cast("int"))
        .alias("category_key"),
        e.cast("long").alias("desc_idx"),
        F.when(e % 5 == 0, F.lit(None).cast("array<double>"))
        .when(e % 5 == 1, F.array().cast("array<double>"))
        .otherwise(emb).alias("embedding")))


_KEYS_SQL = ", ".join(f"'{k}'" for k in CATEGORY_KEYS)

SYNTH_PROTO_EMBEDS_SQL = f"""
    SELECT ([{_KEYS_SQL}])[CAST(event_id % 10 + 1 AS INT)]
               AS category_key,
           CAST(event_id AS BIGINT) AS desc_idx,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN CAST([] AS DOUBLE[])
                ELSE list_transform(generate_series(0, {DIMS - 1}),
                     d -> CAST(event_id % 37 AS DOUBLE) * 0.25
                          + CAST(d AS DOUBLE) * 0.5)
           END AS embedding
    FROM events WHERE event_id % 17 = 0
"""


def embed_avg_sql() -> str:
    return f"""
        WITH e AS ({SYNTH_PROTO_EMBEDS_SQL}),
        ok AS (SELECT * FROM e
               WHERE embedding IS NOT NULL AND len(embedding) > 0),
        x AS (
          SELECT category_key, CAST(d AS INT) AS dim,
                 embedding[d + 1] AS v
          FROM ok, UNNEST(generate_series(0, len(embedding) - 1))
               AS u(d))
        SELECT category_key, dim, sum(v) / count(*) AS avg_v
        FROM x GROUP BY category_key, dim
    """


def synth_outcomes(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    keys = F.array(*[F.lit(k) for k in CATEGORY_KEYS])
    return (events.where(e % 1000 == 7).select(
        F.element_at(keys, (e % 10 + 1).cast("int"))
        .alias("category_key"),
        F.when(e % 3 == 0, "updated").when(e % 3 == 1, "not_found")
        .otherwise("error").alias("outcome"),
        F.when(e % 3 == 2, F.concat(F.lit("boom "),
                                    (e % 4).cast("string")))
        .alias("error_msg"),
        F.lit(3).cast("int").alias("n_descriptions")))


SYNTH_OUTCOMES_SQL = f"""
    SELECT ([{_KEYS_SQL}])[CAST(event_id % 10 + 1 AS INT)]
               AS category_key,
           CASE event_id % 3 WHEN 0 THEN 'updated'
                WHEN 1 THEN 'not_found' ELSE 'error' END AS outcome,
           CASE WHEN event_id % 3 = 2
                THEN 'boom ' || CAST(event_id % 4 AS VARCHAR) END
               AS error_msg,
           CAST(3 AS INT) AS n_descriptions
    FROM events WHERE event_id % 1000 = 7
"""


def rollup_sql() -> str:
    return f"""
        WITH o AS ({SYNTH_OUTCOMES_SQL}),
        per AS (
          SELECT category_key, outcome = 'updated' AS success,
                 CASE outcome
                   WHEN 'updated' THEN 'Successfully updated '
                        || category_key
                   WHEN 'not_found' THEN 'Category ' || category_key
                        || ' not found in database'
                   ELSE 'Error: ' || error_msg END AS message,
                 CAST(CASE WHEN outcome = 'updated'
                      THEN n_descriptions END AS INT)
                     AS descriptions_count
          FROM o)
        SELECT * FROM per
        UNION ALL
        SELECT '__summary__',
               sum(CASE WHEN outcome = 'updated' THEN 1 ELSE 0 END)
                   > 0,
               'Processed ' || CAST(count(*) AS VARCHAR)
                   || ' categories: '
                   || CAST(sum(CASE WHEN outcome = 'updated' THEN 1
                               ELSE 0 END) AS VARCHAR)
                   || ' succeeded, '
                   || CAST(count(*) - sum(CASE WHEN outcome = 'updated'
                           THEN 1 ELSE 0 END) AS VARCHAR)
                   || ' failed',
               CAST(NULL AS INT)
        FROM o
    """
