"""Facet-admin observability folds (app/api/facet_routes.py:154-280).

The canonicalizer / recanonicalization sweep themselves are covered by
``operators/facets.py`` and ``operators/facet_sweep.py``; this module
folds the admin read/observability surface:

* ``list_canonicals`` (:166-193): optional facet_key equality, order
  by ``alias_count`` DESC, limit (default 200, le=1000). Row-shaping
  pins: ``aliases`` None → ``[]``, ``alias_count`` None → 0 (the
  ``int(... or 0)`` fold), ``is_locked`` None → False (``bool``),
  while ``embedding_model`` / timestamps pass through as-is
  (Optional). The DESC order's tiebreak is DB-unspecified;
  canonicalized here by (facet_key, canonical_value) ascending.
* ``merge_log`` (:214-257): a three-way optional equality ladder
  (facet_key / action / source), order ``occurred_at`` DESC, limit;
  ``id`` is int-cast, ``similarity``/``source``/``product_id`` stay
  nullable. Tiebreak canonicalized by id DESC (latest insert first).
* ``set_lock`` (:266-280): the update matches on
  (facet_key, canonical_value); zero matched rows → 404, else the
  route echoes the REQUESTED is_locked (not a DB read-back) — folded
  as a per-request outcome ladder over a batch of lock requests.

Scale: both listings are one windowed scan each (top-k under the
limit); the lock fold is an equi-join of a request batch against the
canonical dimension (broadcastable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def canonicals_view(canon: DataFrame, *, facet_key: str | None = None,
                    limit: int = 200) -> DataFrame:
    f = canon
    if facet_key:
        f = f.where(F.col("facet_key") == facet_key)
    shaped = f.select(
        "facet_key", "canonical_value",
        F.coalesce(F.col("aliases"), F.array().cast("array<string>"))
        .alias("aliases"),
        F.coalesce(F.col("alias_count"), F.lit(0)).cast("int")
        .alias("alias_count"),
        "embedding_model",
        F.coalesce(F.col("is_locked"), F.lit(False)).alias("is_locked"))
    w = Window.orderBy(F.col("alias_count").desc(), "facet_key",
                       "canonical_value")
    return (shaped.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= limit).drop("rk"))


def merge_log_view(log: DataFrame, *, facet_key: str | None = None,
                   action: str | None = None,
                   source: str | None = None,
                   limit: int = 200) -> DataFrame:
    f = log
    if facet_key:
        f = f.where(F.col("facet_key") == facet_key)
    if action:
        f = f.where(F.col("action") == action)
    if source:
        f = f.where(F.col("source") == source)
    w = Window.orderBy(F.col("occurred_at").desc(),
                       F.col("log_id").desc())
    return (f.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= limit)
            .select(F.col("log_id").cast("long").alias("log_id"),
                    "facet_key", "raw_value", "resolved_canonical",
                    "action", "similarity", "source", "occurred_at",
                    F.col("rk").cast("int").alias("rk")))


def lock_outcomes(reqs: DataFrame, canon: DataFrame) -> DataFrame:
    """Per lock request: 'ok' + echoed is_locked when the canonical
    exists, else 'not_found' (404) with a NULL echo."""
    c = canon.select(F.col("facet_key").alias("_fk"),
                     F.col("canonical_value").alias("_cv")).distinct()
    j = reqs.join(F.broadcast(c),
                  (reqs["facet_key"] == F.col("_fk"))
                  & (reqs["canonical_value"] == F.col("_cv")), "left")
    found = F.col("_fk").isNotNull()
    return j.select(
        "req_id", "facet_key", "canonical_value",
        F.when(found, "ok").otherwise("not_found").alias("status"),
        # string-rendered so the NULL 404 echo survives the
        # nullable-boolean comparison canonicalization
        F.when(found, F.col("want_locked").cast("string"))
        .otherwise(F.lit(None).cast("string")).alias("is_locked"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

_KEYS = ("color", "material", "finish", "pattern")
_ACTIONS = ("exact_alias", "embedding_merge", "new",
            "rejected_non_english")


def synth_canonicals(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        F.element_at(F.array(*[F.lit(k) for k in _KEYS]),
                     (e % 4 + 1).cast("int")).alias("facet_key"),
        F.concat(F.lit("canon-"), (e % 61).cast("string"))
        .alias("canonical_value"),
        F.when(e % 7 == 0, F.lit(None).cast("array<string>"))
        .otherwise(F.transform(
            F.sequence(F.lit(1), (e % 3 + 1).cast("int")),
            lambda i: F.concat(F.lit("alias"), i.cast("string"))))
        .alias("aliases"),
        F.when(e % 7 == 0, F.lit(None).cast("int"))
        .otherwise((e % 9).cast("int")).alias("alias_count"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("text-embedding-3-small"))
        .alias("embedding_model"),
        F.when(e % 6 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 2 == 0).alias("is_locked"))


SYNTH_CANONICALS_SQL = """
    SELECT ['color', 'material', 'finish', 'pattern']
               [CAST(event_id % 4 + 1 AS INT)] AS facet_key,
           'canon-' || CAST(event_id % 61 AS VARCHAR)
               AS canonical_value,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE [ 'alias' || CAST(i AS VARCHAR)
                       FOR i IN range(1, CAST(event_id % 3 + 1
                                               AS INT) + 1) ] END
               AS aliases,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE CAST(event_id % 9 AS INT) END AS alias_count,
           CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE 'text-embedding-3-small' END AS embedding_model,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE event_id % 2 = 0 END AS is_locked
    FROM events
"""


def synth_merge_log(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("log_id"),
        F.element_at(F.array(*[F.lit(k) for k in _KEYS]),
                     (e % 4 + 1).cast("int")).alias("facet_key"),
        F.concat(F.lit("raw "), (e % 37).cast("string"))
        .alias("raw_value"),
        F.concat(F.lit("canon-"), (e % 61).cast("string"))
        .alias("resolved_canonical"),
        F.element_at(F.array(*[F.lit(a) for a in _ACTIONS]),
                     (e % 4 + 1).cast("int")).alias("action"),
        F.when(e % 4 == 1, F.round(0.8 + (e % 20) / 100.0, 2))
        .otherwise(F.lit(None).cast("double")).alias("similarity"),
        F.when(e % 8 == 0, F.lit(None).cast("string"))
        .when(e % 8 < 4, "pdf_extraction").otherwise("manual")
        .alias("source"),
        (1_700_000_000 + (e % 500) * 60).cast("long")
        .alias("occurred_at"))


SYNTH_MERGE_LOG_SQL = """
    SELECT CAST(event_id AS BIGINT) AS log_id,
           ['color', 'material', 'finish', 'pattern']
               [CAST(event_id % 4 + 1 AS INT)] AS facet_key,
           'raw ' || CAST(event_id % 37 AS VARCHAR) AS raw_value,
           'canon-' || CAST(event_id % 61 AS VARCHAR)
               AS resolved_canonical,
           ['exact_alias', 'embedding_merge', 'new',
            'rejected_non_english'][CAST(event_id % 4 + 1 AS INT)]
               AS action,
           CASE WHEN event_id % 4 = 1
                THEN round(0.8 + (event_id % 20) / 100.0, 2)
                ELSE NULL END AS similarity,
           CASE WHEN event_id % 8 = 0 THEN NULL
                WHEN event_id % 8 < 4 THEN 'pdf_extraction'
                ELSE 'manual' END AS source,
           CAST(1700000000 + (event_id % 500) * 60 AS BIGINT)
               AS occurred_at
    FROM events
"""


def synth_lock_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return (events.where(e % 10 == 0)
            .select(e.cast("long").alias("req_id"),
                    F.element_at(F.array(*[F.lit(k) for k in _KEYS]),
                                 (e % 4 + 1).cast("int"))
                    .alias("facet_key"),
                    # every 3rd request targets a value outside the
                    # canon-0..60 synth range -> 404 branch
                    F.when(e % 3 == 0,
                           F.concat(F.lit("canon-"),
                                    (e % 61 + 100).cast("string")))
                    .otherwise(F.concat(F.lit("canon-"),
                                        (e % 61).cast("string")))
                    .alias("canonical_value"),
                    (e % 2 == 0).alias("want_locked")))


SYNTH_LOCK_REQS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           ['color', 'material', 'finish', 'pattern']
               [CAST(event_id % 4 + 1 AS INT)] AS facet_key,
           CASE WHEN event_id % 3 = 0
                THEN 'canon-' || CAST(event_id % 61 + 100 AS VARCHAR)
                ELSE 'canon-' || CAST(event_id % 61 AS VARCHAR) END
               AS canonical_value,
           event_id % 2 = 0 AS want_locked
    FROM events WHERE event_id % 10 = 0
"""


def canonicals_sql(*, facet_key: str | None = None,
                   limit: int = 200) -> str:
    cond = f"facet_key = '{facet_key}'" if facet_key else "TRUE"
    return f"""
        WITH c AS ({SYNTH_CANONICALS_SQL}),
        s AS (
          SELECT facet_key, canonical_value,
                 coalesce(aliases, CAST([] AS VARCHAR[])) AS aliases,
                 CAST(coalesce(alias_count, 0) AS INT) AS alias_count,
                 embedding_model,
                 coalesce(is_locked, FALSE) AS is_locked
          FROM c WHERE {cond}),
        r AS (
          SELECT *, row_number() OVER (
                     ORDER BY alias_count DESC, facet_key,
                              canonical_value) AS rk
          FROM s)
        SELECT facet_key, canonical_value, aliases, alias_count,
               embedding_model, is_locked
        FROM r WHERE rk <= {limit}
    """


def merge_log_sql(*, facet_key: str | None = None,
                  action: str | None = None,
                  source: str | None = None, limit: int = 200) -> str:
    conds = ["TRUE"]
    if facet_key:
        conds.append(f"facet_key = '{facet_key}'")
    if action:
        conds.append(f"action = '{action}'")
    if source:
        conds.append(f"source = '{source}'")
    where = " AND ".join(conds)
    return f"""
        WITH l AS ({SYNTH_MERGE_LOG_SQL}),
        f AS (SELECT * FROM l WHERE {where}),
        r AS (
          SELECT *, row_number() OVER (
                     ORDER BY occurred_at DESC, log_id DESC) AS rk
          FROM f)
        SELECT log_id, facet_key, raw_value, resolved_canonical,
               action, similarity, source, occurred_at,
               CAST(rk AS INT) AS rk
        FROM r WHERE rk <= {limit}
    """


def lock_outcomes_sql() -> str:
    return f"""
        WITH c AS ({SYNTH_CANONICALS_SQL}),
        d AS (SELECT DISTINCT facet_key, canonical_value FROM c),
        q AS ({SYNTH_LOCK_REQS_SQL})
        SELECT q.req_id, q.facet_key, q.canonical_value,
               CASE WHEN d.facet_key IS NOT NULL THEN 'ok'
                    ELSE 'not_found' END AS status,
               CASE WHEN d.facet_key IS NOT NULL
                    THEN CAST(q.want_locked AS VARCHAR)
                    ELSE NULL END AS is_locked
        FROM q LEFT JOIN d
          ON q.facet_key = d.facet_key
         AND q.canonical_value = d.canonical_value
    """
