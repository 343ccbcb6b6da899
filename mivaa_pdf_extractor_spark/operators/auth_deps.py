"""Auth-dependency folds: the JWT / workspace / permission ladder and
its optional variants.

Re-expresses ``app/dependencies.py:150-336``. Pinned behaviors:

- ``get_current_user``: empty claims → 401 'Invalid authentication
  credentials'; an unexpected exception WRAPS its text into the 401
  detail ('Authentication failed: …' — the user tier LEAKS internals);
- ``get_workspace_context`` (#250 J3): missing context → 403; an
  unexpected exception returns the GENERIC 'Invalid or missing
  workspace context' — internals logged, never leaked (the deliberate
  asymmetry with the 401 tier, pin);
- ``require_permission``: 403 'Insufficient permissions. Required:
  {p}';
- the optional variants swallow EVERY HTTPException into None — an
  expired token on an optional route quietly degrades to anonymous
  (pin) — but only when credentials were sent at all.

Map-side when-chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def auth_dependency_fold(reqs: DataFrame) -> DataFrame:
    no_creds = ~F.col("has_credentials")
    claims_ok = (F.col("has_credentials") & ~F.col("validate_raised")
                 & F.col("claims_valid"))
    user_401 = F.col("has_credentials") & ~claims_ok
    user_detail = (F.when(F.col("validate_raised"),
                          F.concat(F.lit("Authentication failed: "),
                                   F.col("exc_msg")))
                   .otherwise(F.lit("Invalid authentication "
                                    "credentials")))
    ws_ok = claims_ok & ~F.col("ws_raised") & F.col("ws_valid")
    ws_403 = claims_ok & ~ws_ok
    perm_ok = ws_ok & F.col("has_permission")
    required = (F.when(no_creds & ~F.col("optional_route"), 403)
                .when(no_creds, 200)  # optional: anonymous continues
                .when(user_401 & F.col("optional_route"), 200)
                .when(user_401, 401)
                .when(ws_403 & F.col("optional_route"), 200)
                .when(ws_403, 403)
                .when(~perm_ok & ~F.col("optional_route"), 403)
                .otherwise(200))
    detail = (F.when(no_creds | F.col("optional_route"),
                     F.lit(None).cast("string"))
              .when(user_401, user_detail)
              .when(ws_403, F.lit("Invalid or missing workspace "
                                  "context"))
              .when(~perm_ok,
                    F.concat(F.lit("Insufficient permissions. "
                                   "Required: "),
                             F.col("permission")))
              .otherwise(F.lit(None).cast("string")))
    anonymous = F.col("optional_route") & (no_creds | user_401 | ws_403)
    return reqs.select(
        "req_id",
        required.cast("int").alias("status"),
        detail.alias("detail"),
        anonymous.alias("anonymous"))


def synth_auth_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        (e % 5 != 0).alias("has_credentials"),
        (e % 7 == 0).alias("validate_raised"),
        (e % 3 != 0).alias("claims_valid"),
        F.concat(F.lit("jwt parse error "), (e % 4).cast("string"))
        .alias("exc_msg"),
        (e % 11 == 0).alias("ws_raised"),
        (e % 4 != 0).alias("ws_valid"),
        (e % 6 != 0).alias("has_permission"),
        F.when(e % 2 == 0, F.lit("pdf:read"))
        .otherwise(F.lit("admin:all")).alias("permission"),
        (e % 9 == 0).alias("optional_route"))


SYNTH_AUTH_REQS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           event_id % 5 <> 0 AS has_credentials,
           event_id % 7 = 0 AS validate_raised,
           event_id % 3 <> 0 AS claims_valid,
           'jwt parse error ' || CAST(event_id % 4 AS VARCHAR)
               AS exc_msg,
           event_id % 11 = 0 AS ws_raised,
           event_id % 4 <> 0 AS ws_valid,
           event_id % 6 <> 0 AS has_permission,
           CASE WHEN event_id % 2 = 0 THEN 'pdf:read'
                ELSE 'admin:all' END AS permission,
           event_id % 9 = 0 AS optional_route
    FROM events
"""


def auth_fold_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_AUTH_REQS_SQL}),
        g AS (
          SELECT *,
                 NOT has_credentials AS no_creds,
                 has_credentials AND NOT validate_raised
                   AND claims_valid AS claims_ok
          FROM r),
        h AS (
          SELECT *,
                 has_credentials AND NOT claims_ok AS user_401,
                 claims_ok AND NOT ws_raised AND ws_valid AS ws_ok
          FROM g),
        i AS (
          SELECT *,
                 claims_ok AND NOT ws_ok AS ws_403,
                 ws_ok AND has_permission AS perm_ok
          FROM h)
        SELECT req_id,
               CAST(CASE WHEN no_creds AND NOT optional_route THEN 403
                    WHEN no_creds THEN 200
                    WHEN user_401 AND optional_route THEN 200
                    WHEN user_401 THEN 401
                    WHEN ws_403 AND optional_route THEN 200
                    WHEN ws_403 THEN 403
                    WHEN NOT perm_ok AND NOT optional_route THEN 403
                    ELSE 200 END AS INT) AS status,
               CASE WHEN no_creds OR optional_route THEN NULL
                    WHEN user_401 THEN
                      CASE WHEN validate_raised
                           THEN 'Authentication failed: ' || exc_msg
                           ELSE 'Invalid authentication credentials'
                      END
                    WHEN ws_403
                    THEN 'Invalid or missing workspace context'
                    WHEN NOT perm_ok
                    THEN 'Insufficient permissions. Required: '
                         || permission
               END AS detail,
               optional_route AND (no_creds OR user_401 OR ws_403)
                   AS anonymous
        FROM i
    """
