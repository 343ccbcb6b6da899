"""RAG query-route folds (app/api/documents/query_routes.py) as Spark
joins — the vector search itself is covered by the similarity/vecs
operators; reproduced here:

- result enhancement (:167-254): per search result, the related-image
  lookup takes the TOP-10 image_product_associations by overall_score
  DESC **before** the document_images gate — an association whose image
  row is missing still consumes a limit slot (Supabase embeds the
  joined resource and limits the OUTER rows — pin), then rows without
  an image are dropped; the emitted relationship_type/relevance_score
  read .get('reasoning', 'related') / .get('overall_score', 0.0) on DB
  rows where the keys are ALWAYS present — the defaults are dead code
  and a stored NULL passes through as None, never 'related'/0.0 (pin);
  a result with a falsy id ('' included) is passed through UNenhanced
  (no related_images key at all — pin). Supabase's tie order is
  unspecified — canonicalized NULLS LAST, then association id
  (documented);
- workspace authorization (:41-92, audit C4): claims.service=='mivaa'
  OR a TRUTHY is_test_user claim trusts the body workspace outright
  (this is the raw claim, not the middleware's _is_test_user ladder —
  pin); identity = sub or user_id (falsy-or: '' falls through — pin),
  missing → 403; a membership-check exception is its own 403 before
  the not-a-member 403; else ACTIVE membership decides.

Scale: the enhancement is one window top-k inside the associations
table (shuffle on product_id) plus a broadcast-able join onto results;
the authz fold is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def enhance_images(results: DataFrame, assocs: DataFrame) -> DataFrame:
    """_enhance_search_results' related-image join (:186-218)."""
    w = Window.partitionBy("product_id").orderBy(
        F.col("overall_score").desc_nulls_last(), F.col("assoc_id"))
    top = assocs.withColumn("rk", F.row_number().over(w)) \
        .filter(F.col("rk") <= 10) \
        .filter(F.col("has_image"))
    no_id = F.col("product_id").isNull() | (F.col("product_id") == "")
    enhanced = results.filter(~no_id).join(
        top.select(F.col("product_id").alias("a_pid"), "assoc_id", "rk",
                   "image_id", "image_url", "reasoning",
                   "overall_score", "caption"),
        F.col("product_id") == F.col("a_pid"), "left").select(
        "result_id", F.lit(1).alias("enhanced"), "rk",
        "image_id", "image_url",
        F.col("reasoning").alias("relationship_type"),
        F.col("overall_score").alias("relevance_score"), "caption")
    passthrough = results.filter(no_id).select(
        "result_id", F.lit(0).alias("enhanced"),
        F.lit(None).cast("int").alias("rk"),
        F.lit(None).cast("string").alias("image_id"),
        F.lit(None).cast("string").alias("image_url"),
        F.lit(None).cast("string").alias("relationship_type"),
        F.lit(None).cast("double").alias("relevance_score"),
        F.lit(None).cast("string").alias("caption"))
    return enhanced.unionByName(passthrough)


def ws_authz(calls: DataFrame) -> DataFrame:
    """authorize_rag_workspace (:41-92)."""
    trusted_svc = F.col("service").eqNullSafe(F.lit("mivaa"))
    trusted_test = F.coalesce(F.col("is_test_user"), F.lit(False))
    ident = F.coalesce(
        F.when(F.col("sub") != "", F.col("sub")),
        F.when(F.col("user_id") != "", F.col("user_id")))
    outcome = (F.when(trusted_svc, F.lit("trusted_service"))
               .when(trusted_test, F.lit("trusted_test"))
               .when(ident.isNull(), F.lit("missing_identity"))
               .when(F.col("check_error"), F.lit("check_failed"))
               .when(~F.col("active_member"), F.lit("not_member"))
               .otherwise(F.lit("ok")))
    return calls.select(
        "call_id", outcome.alias("outcome"),
        F.when(~trusted_svc & ~trusted_test, ident).alias("identity"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_results(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    pid = (F.when(e % 5 == 0, F.lit(None).cast("string"))
           .when(e % 5 == 1, F.lit(""))
           .otherwise(F.concat(F.lit("p-"), e % 37)))
    return events.filter(e % 4 == 0).select(
        e.alias("result_id"), pid.alias("product_id"))


def synth_assocs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.filter(e % 4 != 0).select(
        e.alias("assoc_id"),
        F.concat(F.lit("p-"), e % 37).alias("product_id"),
        (e % 6 != 0).alias("has_image"),
        F.concat(F.lit("img-"), e).alias("image_id"),
        F.concat(F.lit("https://img/"), e).alias("image_url"),
        F.when(e % 8 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("match-"), e % 5)).alias("reasoning"),
        F.when(e % 9 == 0, F.lit(None).cast("double"))
        .otherwise(((e * 7) % 1000).cast("double") / 1000)
        .alias("overall_score"),
        F.when(e % 10 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("cap "), e)).alias("caption"))


def synth_authz_calls(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    svc = (F.when(e % 6 == 0, F.lit("mivaa"))
           .when(e % 6 == 1, F.lit("other"))
           .otherwise(F.lit(None).cast("string")))
    sub = (F.when(e % 5 == 0, F.lit(None).cast("string"))
           .when(e % 5 == 1, F.lit(""))
           .otherwise(F.concat(F.lit("u-"), e % 11)))
    uid = (F.when((e * 3) % 4 == 0, F.lit(None).cast("string"))
           .when((e * 3) % 4 == 1, F.lit(""))
           .otherwise(F.concat(F.lit("alt-"), e % 7)))
    return events.select(
        e.alias("call_id"), svc.alias("service"),
        F.when(e % 7 == 0, F.lit(True)).otherwise(
            F.when(e % 7 == 1, F.lit(False))
            .otherwise(F.lit(None).cast("boolean")))
        .alias("is_test_user"),
        sub.alias("sub"), uid.alias("user_id"),
        ((e * 5) % 3 == 0).alias("active_member"),
        ((e * 11) % 9 == 0).alias("check_error"))


SYNTH_RESULTS_SQL = """
    SELECT event_id AS result_id,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'p-' || CAST(event_id % 37 AS VARCHAR) END
               AS product_id
    FROM events WHERE event_id % 4 = 0
"""

SYNTH_ASSOCS_SQL = """
    SELECT event_id AS assoc_id,
           'p-' || CAST(event_id % 37 AS VARCHAR) AS product_id,
           event_id % 6 <> 0 AS has_image,
           'img-' || CAST(event_id AS VARCHAR) AS image_id,
           'https://img/' || CAST(event_id AS VARCHAR) AS image_url,
           CASE WHEN event_id % 8 = 0 THEN NULL
                ELSE 'match-' || CAST(event_id % 5 AS VARCHAR) END
               AS reasoning,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE CAST((event_id * 7) % 1000 AS DOUBLE) / 1000 END
               AS overall_score,
           CASE WHEN event_id % 10 = 0 THEN NULL
                ELSE 'cap ' || CAST(event_id AS VARCHAR) END AS caption
    FROM events WHERE event_id % 4 <> 0
"""

SYNTH_AUTHZ_SQL = """
    SELECT event_id AS call_id,
           CASE WHEN event_id % 6 = 0 THEN 'mivaa'
                WHEN event_id % 6 = 1 THEN 'other' END AS service,
           CASE WHEN event_id % 7 = 0 THEN TRUE
                WHEN event_id % 7 = 1 THEN FALSE END AS is_test_user,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'u-' || CAST(event_id % 11 AS VARCHAR) END AS sub,
           CASE WHEN (event_id * 3) % 4 = 0 THEN NULL
                WHEN (event_id * 3) % 4 = 1 THEN ''
                ELSE 'alt-' || CAST(event_id % 7 AS VARCHAR) END
               AS user_id,
           (event_id * 5) % 3 = 0 AS active_member,
           (event_id * 11) % 9 = 0 AS check_error
    FROM events
"""


def enhance_images_sql() -> str:
    return f"""
        WITH res AS ({SYNTH_RESULTS_SQL}),
        a AS ({SYNTH_ASSOCS_SQL}),
        ranked AS (
          SELECT *, CAST(row_number() OVER (
                 PARTITION BY product_id
                 ORDER BY overall_score DESC NULLS LAST, assoc_id)
                 AS INT) AS rk
          FROM a),
        top AS (SELECT * FROM ranked WHERE rk <= 10 AND has_image)
        SELECT r.result_id, 1 AS enhanced, t.rk, t.image_id,
               t.image_url, t.reasoning AS relationship_type,
               t.overall_score AS relevance_score, t.caption
        FROM res r LEFT JOIN top t ON t.product_id = r.product_id
        WHERE r.product_id IS NOT NULL AND r.product_id <> ''
        UNION ALL
        SELECT result_id, 0, NULL, NULL, NULL, NULL, NULL, NULL
        FROM res WHERE product_id IS NULL OR product_id = ''
    """


def ws_authz_sql() -> str:
    return f"""
        WITH c AS ({SYNTH_AUTHZ_SQL}),
        f AS (
          SELECT *,
                 service IS NOT DISTINCT FROM 'mivaa' AS trusted_svc,
                 coalesce(is_test_user, FALSE) AS trusted_test,
                 coalesce(nullif(sub, ''), nullif(user_id, ''))
                     AS ident
          FROM c)
        SELECT call_id,
               CASE WHEN trusted_svc THEN 'trusted_service'
                    WHEN trusted_test THEN 'trusted_test'
                    WHEN ident IS NULL THEN 'missing_identity'
                    WHEN check_error THEN 'check_failed'
                    WHEN NOT active_member THEN 'not_member'
                    ELSE 'ok' END AS outcome,
               CASE WHEN NOT trusted_svc AND NOT trusted_test
                    THEN ident END AS identity
        FROM f
    """
