"""Partner API-key gate fold (app/api/price_lookup_routes.py:48-157).

The Supabase lookups are out of scope; the gate LADDER is
deterministic (file:line):

* Header check (:75-84): ``authorization.lower().startswith("bearer ")``
  — case-INSENSITIVE, unlike the JWT middleware's case-sensitive
  'Bearer ' (the two gates disagree on 'BEARER x' — pin); token =
  ``split(" ", 1)[1].strip()`` so 'Bearer  abc ' yields 'abc'; an
  all-space token 401s 'Empty API key'.
* Key row (:95-97): missing OR inactive -> 401 'Invalid API key'
  (same message — no user-visible distinction, pin).
* Expiry (:99-107): a MALFORMED expires_at is treated as EXPIRED
  (401 'API key expired'), never a 500 (pin); the parse outcome rides
  as input flags here (Python fromisoformat semantics documented, not
  re-implemented).
* allowed_endpoints (:109-116): the gate is ``if allowed:`` — None
  AND the EMPTY LIST both mean allow-all (an admin clearing the list
  to [] grants everything — pin); else exact match or trailing-*
  prefix; non-string patterns are skipped.
* Rate limit (:130-131): ``int(override or 60)`` LIVE or (override
  0 -> default 60 — pin) clamped to [1, 600].

Map-side projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ENDPOINT_PATH = "/api/v1/prices/lookup"
DEFAULT_RATE_LIMIT = 60
MAX_RATE_LIMIT = 600


def api_key_gate(reqs: DataFrame) -> DataFrame:
    """reqs: (req_id, auth_header nullable, key_found, is_active,
    has_expires, expires_valid, expires_past, allowed_patterns
    array<string> nullable, rate_limit_override int nullable)."""
    auth = F.coalesce(F.col("auth_header"), F.lit(""))
    bearer = F.lower(auth).startswith("bearer ")
    # F.get is 0-based and NULL-safe out of bounds (ANSI mode)
    token = F.trim(F.coalesce(F.get(F.split(auth, " ", 2), 1),
                              F.lit("")))
    pats = F.filter(F.coalesce(F.col("allowed_patterns"),
                               F.array().cast("array<string>")),
                    lambda p: p.isNotNull())
    pat_hit = F.exists(
        pats, lambda p: (p == ENDPOINT_PATH)
        | (p.endswith("*")
           & F.lit(ENDPOINT_PATH).startswith(
               F.regexp_replace(p, r"\*$", ""))))
    # `if allowed:` — empty list allows all (pin)
    endpoint_ok = (F.size(pats) == 0) | pat_hit
    expired = (F.col("has_expires")
               & (~F.col("expires_valid") | F.col("expires_past")))
    verdict = (
        F.when(~bearer, F.struct(
            F.lit(401).alias("status"),
            F.lit("Missing Authorization: Bearer <api_key> header")
            .alias("detail")))
        .when(token == "", F.struct(
            F.lit(401).alias("status"),
            F.lit("Empty API key").alias("detail")))
        .when(~F.col("key_found") | ~F.col("is_active"), F.struct(
            F.lit(401).alias("status"),
            F.lit("Invalid API key").alias("detail")))
        .when(expired, F.struct(
            F.lit(401).alias("status"),
            F.lit("API key expired").alias("detail")))
        .when(~endpoint_ok, F.struct(
            F.lit(403).alias("status"),
            F.lit("This API key does not permit access to "
                  "/api/v1/prices/lookup").alias("detail")))
        .otherwise(F.struct(F.lit(200).alias("status"),
                            F.lit(None).cast("string")
                            .alias("detail"))))
    rl = F.greatest(
        F.lit(1), F.least(
            F.when(F.col("rate_limit_override").isNotNull()
                   & (F.col("rate_limit_override") != 0),
                   F.col("rate_limit_override"))
            .otherwise(F.lit(DEFAULT_RATE_LIMIT)),
            F.lit(MAX_RATE_LIMIT)))
    return reqs.select(
        "req_id",
        verdict.getField("status").alias("status"),
        verdict.getField("detail").alias("detail"),
        F.when(verdict.getField("status") == 200, rl).cast("int")
        .alias("rate_limit_per_min"))


def synth_key_requests(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    auth = (F.when(e % 8 == 0, F.lit(None).cast("string"))
            .when(e % 8 == 1, F.lit("Basic abc"))
            .when(e % 8 == 2, F.lit("BEARER key-X"))     # lower() pass
            .when(e % 8 == 3, F.lit("Bearer   "))        # empty token
            .when(e % 8 == 4, F.concat(F.lit("bearer key-"),
                                       e.cast("string")))
            .otherwise(F.concat(F.lit("Bearer  key-"),
                                e.cast("string"), F.lit(" "))))
    pats = (F.when(e % 6 == 0, F.lit(None)
                   .cast("array<string>"))
            .when(e % 6 == 1, F.array().cast("array<string>"))
            .when(e % 6 == 2, F.array(F.lit(ENDPOINT_PATH)))
            .when(e % 6 == 3, F.array(F.lit("/api/v1/prices/*"),
                                      F.lit("/api/v2/x")))
            .when(e % 6 == 4, F.array(F.lit("/api/v1/other"),
                                      F.lit(None).cast("string")))
            .otherwise(F.array(F.lit("/api/*"))))
    return events.select(
        e.cast("long").alias("req_id"), auth.alias("auth_header"),
        (e % 9 != 0).alias("key_found"),
        (e % 5 != 0).alias("is_active"),
        (e % 3 == 0).alias("has_expires"),
        (e % 7 != 0).alias("expires_valid"),
        (e % 4 == 0).alias("expires_past"),
        pats.alias("allowed_patterns"),
        F.when(e % 10 == 0, F.lit(None).cast("int"))
        .when(e % 10 == 1, F.lit(0))
        .when(e % 10 == 2, F.lit(9000))
        .otherwise((e % 300).cast("int"))
        .alias("rate_limit_override"))


SYNTH_KEY_REQ_SQL = f"""
    SELECT CAST(event_id AS BIGINT) AS req_id,
           CASE event_id % 8 WHEN 0 THEN NULL
                WHEN 1 THEN 'Basic abc'
                WHEN 2 THEN 'BEARER key-X'
                WHEN 3 THEN 'Bearer   '
                WHEN 4 THEN 'bearer key-'
                     || CAST(event_id AS VARCHAR)
                ELSE 'Bearer  key-' || CAST(event_id AS VARCHAR)
                     || ' ' END AS auth_header,
           event_id % 9 <> 0 AS key_found,
           event_id % 5 <> 0 AS is_active,
           event_id % 3 = 0 AS has_expires,
           event_id % 7 <> 0 AS expires_valid,
           event_id % 4 = 0 AS expires_past,
           CASE event_id % 6 WHEN 0 THEN NULL
                WHEN 1 THEN CAST([] AS VARCHAR[])
                WHEN 2 THEN ['{ENDPOINT_PATH}']
                WHEN 3 THEN ['/api/v1/prices/*', '/api/v2/x']
                WHEN 4 THEN ['/api/v1/other', NULL]
                ELSE ['/api/*'] END AS allowed_patterns,
           CASE event_id % 10 WHEN 0 THEN NULL WHEN 1 THEN 0
                WHEN 2 THEN 9000
                ELSE CAST(event_id % 300 AS INT) END
               AS rate_limit_override
    FROM events
"""


def api_key_gate_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_KEY_REQ_SQL}),
        g AS (
          SELECT *,
                 lower(coalesce(auth_header, ''))
                     LIKE 'bearer %' AS is_bearer,
                 trim(CASE WHEN strpos(coalesce(auth_header, ''),
                                       ' ') > 0
                      THEN substring(coalesce(auth_header, ''),
                           strpos(coalesce(auth_header, ''), ' ')
                           + 1)
                      ELSE '' END) AS token,
                 list_filter(coalesce(allowed_patterns,
                                      CAST([] AS VARCHAR[])),
                             p -> p IS NOT NULL) AS pats,
                 has_expires AND (NOT expires_valid OR expires_past)
                     AS expired
          FROM r),
        h AS (
          SELECT *,
                 (len(pats) = 0 OR len(list_filter(pats,
                   p -> p = '{ENDPOINT_PATH}'
                        OR (p LIKE '%*'
                            AND strpos('{ENDPOINT_PATH}',
                                 substring(p, 1, length(p) - 1))
                                = 1))) > 0) AS endpoint_ok
          FROM g),
        v AS (
          SELECT *,
                 CASE WHEN NOT is_bearer THEN 401
                      WHEN token = '' THEN 401
                      WHEN NOT key_found OR NOT is_active THEN 401
                      WHEN expired THEN 401
                      WHEN NOT endpoint_ok THEN 403
                      ELSE 200 END AS status,
                 CASE WHEN NOT is_bearer
                        THEN 'Missing Authorization: Bearer '
                             || '<api_key> header'
                      WHEN token = '' THEN 'Empty API key'
                      WHEN NOT key_found OR NOT is_active
                        THEN 'Invalid API key'
                      WHEN expired THEN 'API key expired'
                      WHEN NOT endpoint_ok
                        THEN 'This API key does not permit access '
                             || 'to /api/v1/prices/lookup'
                 END AS detail
          FROM h)
        SELECT req_id, status, detail,
               CAST(CASE WHEN status = 200 THEN
                 greatest(1, least(
                   CASE WHEN rate_limit_override IS NOT NULL
                             AND rate_limit_override <> 0
                        THEN rate_limit_override
                        ELSE {DEFAULT_RATE_LIMIT} END,
                   {MAX_RATE_LIMIT})) END AS INT)
                   AS rate_limit_per_min
        FROM v
    """
