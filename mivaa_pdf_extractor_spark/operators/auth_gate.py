"""JWT-middleware request gating (app/middleware/jwt_auth.py) as native
Spark projections — the crypto itself (HS256/ES256 signature checks,
network get_user) is out of scope per SURVEY scoping and modeled as
per-request verdict flags; reproduced is every deterministic decision
around it:

- path exclusion (:79-163, :268-278): OPTIONS bypasses auth BEFORE the
  path check (CORS preflight, pentest #250 A1 note); the root path is
  matched EXACTLY (the old prefix match excluded the ENTIRE API — pin);
  everything else is startswith() over the pinned 37-prefix exclude
  list, so '/api/healthz' and '/api/admin/pause-for-deploy-now' are
  excluded by prefix while '/api/v1/price' (shorter than the
  '/api/v1/prices' entry) and '/api/v1/mentions' (not reaching
  '/api/v1/mentions/track') stay gated — pins;
- token extraction (:279-299): 'Bearer ' header wins over the cookie —
  including when malformed: 'Bearer  x' (double space) extracts '' via
  split(' ')[1] and the empty token 401s as MISSING even when a valid
  cookie was present (pin); 'Bearer x y' extracts 'x'; a header not
  starting with exactly 'Bearer ' (case-sensitive, space required)
  falls to the access_token cookie;
- simple-key classification (:521-543): test-key allowlist (enabled
  flag AND environment ∈ {development,testing,dev,test} AND token in
  the comma-split/stripped configured list — a NON-empty custom list
  REPLACES the default triple, so 'test-key' is rejected under a custom
  config — pin) OR the mk_ form (prefix + length 18..20 + alnum/
  underscore; Python's isalnum is checked per char — the synthesized
  vocabulary is ASCII so both engines agree);
- validation ladder (:301-372): a token CLASSIFIED simple that matches
  neither the material key nor an allowed test key is rejected WITHOUT
  trying the JWT paths (pin); otherwise Supabase HS256 (decode ∧
  required claims ∧ aud — an aud failure after a good decode still
  falls through to the API path, #250 A5) → Supabase via-API → MIVAA
  JWT (required claims ∧ not expired); the bottom retry-as-simple-key
  branch is unreachable (is_simple was already false) and is not
  modeled; `_is_token_blacklisted` is the constant False (:655-667);
- Supabase claim transform (:372-519): workspace falls
  app_metadata.workspace_id or user_metadata.workspace_id or the
  platform default ('' falls through — falsy or, pin); role defaults
  'authenticated';
- workspace context (:669-717): falsy workspace_id → 403; UserRole()
  ValueError → MEMBER (so the supabase default role 'authenticated'
  lands as member — pin); test-user bypass requires the is_test_user
  claim AND the enabled flag AND a dev/test environment AND
  user_id == the fixed test UUID (checked on the user_id claim while
  membership uses sub — pinned asymmetry); 'material-kai-platform'
  always has access; others need ACTIVE membership;
- X-Workspace-Id override (#194, :219-231): only when the header
  differs from the token workspace AND the sub is a member of the
  REQUESTED workspace (material platform passes automatically).

Scale: all three folds are map-side when-chains over literal arrays —
no shuffles, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# jwt_auth.py:89-163, in list order (order is observable through the
# first-matching-prefix column; any() itself is order-insensitive).
EXCLUDE_PATHS = (
    "/health", "/docs", "/openapi.json", "/redoc", "/metrics",
    "/performance/summary", "/api/health", "/api/v1/health",
    "/api/system/health", "/api/system/metrics", "/api/packages/status",
    "/api/models", "/api/data/export", "/api/data/backup",
    "/api/data/cleanup", "/api/v1/documents", "/api/v1/images",
    "/api/semantic-analysis", "/api/jobs", "/api/bulk/process",
    "/api/interior", "/api/rag", "/api/v1/prices", "/api/v1/modules",
    "/api/v1/public", "/api/v1/mentions/track", "/api/v1/jobs/track",
    "/api/v1/projects", "/api/v1/price-monitoring",
    "/api/v1/mention-monitoring", "/api/v1/job-research",
    "/api/v1/seo-agent", "/api/internal", "/api/embeddings",
    "/api/admin/pause-for-deploy", "/api/admin/resume-from-deploy",
    "/api/admin/restart-service",
)

DEFAULT_TEST_KEYS = ("test-key", "test-api-key", "development-key")
TEST_ENVIRONMENTS = ("development", "testing", "dev", "test")
MATERIAL_KEY = "mk_material_kai_01"
TEST_USER_ID = "00000000-0000-0000-0000-000000000001"
MATERIAL_WS = "ws-material"

# request-path bank exercising the exact-root, prefix-longer-than-path,
# path-longer-than-prefix, and untouched-sibling cases
PATHS = (
    "/", "/health", "/healthz", "/api/healthz", "/api/models/claude",
    "/api/model", "/api/admin/logs", "/api/admin/pause-for-deploy-now",
    "/api/admin/restart-service", "/api/v1/price", "/api/v1/prices/scan",
    "/api/rag/documents/upload", "/api/duplicates/detect",
    "/docs/oauth2-redirect", "/api/internal/catalog", "/metrics",
    "/redocs", "/api/v1/mentions/tracking", "/api/v1/mentions",
    "/api/jobs/123", "/api/embeddings/generate", "/api/search/similarity",
)


def path_gate(requests: DataFrame) -> DataFrame:
    """dispatch's pre-auth gate (:189-196) + _is_excluded_path
    (:268-278)."""
    prefixes = F.array(*[F.lit(p) for p in EXCLUDE_PATHS])
    hit = F.filter(prefixes, lambda p: F.startswith(F.col("path"), p))
    verdict = (F.when(F.col("method") == "OPTIONS",
                      F.lit("options_bypass"))
               .when(F.col("path") == "/", F.lit("excluded_root"))
               .when(F.size(hit) > 0, F.lit("excluded"))
               .otherwise(F.lit("gated")))
    return requests.select(
        "request_id", "method", "path", verdict.alias("verdict"),
        F.when((F.col("method") != "OPTIONS") & (F.col("path") != "/"),
               F.try_element_at(hit, F.lit(1))).alias("matched_prefix"))


def _split_part(col: Column, idx: int) -> Column:
    return F.try_element_at(F.split(col, " ", -1), F.lit(idx))


def token_resolve(requests: DataFrame) -> DataFrame:
    """_extract_token (:279-299) + _is_simple_api_key /
    _is_test_api_key_allowed (:521-543, :595-624) + the _validate_token
    ladder (:301-372) with crypto verdicts as input flags."""
    bearer_ok = F.col("auth_header").isNotNull() & \
        F.startswith(F.col("auth_header"), F.lit("Bearer "))
    token = F.when(bearer_ok, _split_part(F.col("auth_header"), 2)) \
        .otherwise(F.col("cookie_token"))
    token_src = F.when(bearer_ok, F.lit("bearer")) \
        .when(F.col("cookie_token").isNotNull(), F.lit("cookie"))
    df = requests.withColumn("token", token) \
        .withColumn("token_src", token_src)

    # configured keys replace the default triple only when non-empty
    conf = F.col("test_api_keys")
    # NB: the lambda must be single-arg — F.trim itself has an optional
    # second parameter, so passing it bare makes transform() feed the
    # array INDEX in as the trim-character set.
    keys = F.when(
        conf.isNotNull() & (conf != ""),
        F.transform(F.split(conf, ",", -1), lambda x: F.trim(x))) \
        .otherwise(F.array(*[F.lit(k) for k in DEFAULT_TEST_KEYS]))
    test_allowed = (F.col("enable_test_auth")
                    & F.col("environment").isin(*TEST_ENVIRONMENTS)
                    & F.array_contains(keys, F.col("token")))
    mk_form = (F.startswith(F.col("token"), F.lit("mk_"))
               & (F.length("token") >= 18) & (F.length("token") <= 20)
               & F.col("token").rlike("^[A-Za-z0-9_]+$"))
    df = df.withColumn("is_simple",
                       F.coalesce(test_allowed | mk_form, F.lit(False)))

    sup_ws = F.coalesce(
        F.when(F.col("app_ws") != "", F.col("app_ws")),
        F.when(F.col("user_ws") != "", F.col("user_ws")),
        F.lit(MATERIAL_WS))
    sup_role = F.coalesce(F.col("sup_role"), F.lit("authenticated"))
    supabase_ok = (F.col("hs256_valid") & F.col("sup_claims_ok")
                   & F.col("aud_ok"))
    mivaa_ok = (F.col("mivaa_valid") & F.col("mivaa_claims_ok")
                & ~F.col("mivaa_expired"))

    source = (
        F.when(F.col("token").isNull() | (F.col("token") == ""),
               F.lit(None).cast("string"))
        .when(F.col("is_simple") & (F.col("token") == MATERIAL_KEY),
              F.lit("material_key"))
        .when(F.col("is_simple") & test_allowed, F.lit("test_key"))
        .when(F.col("is_simple"), F.lit(None).cast("string"))
        .when(supabase_ok, F.lit("supabase"))
        .when(F.col("api_valid"), F.lit("supabase_api"))
        .when(mivaa_ok, F.lit("mivaa_jwt")))
    outcome = (F.when(F.col("token").isNull() | (F.col("token") == ""),
                      F.lit("missing_token"))
               .when(source.isNull(), F.lit("invalid_token"))
               .otherwise(F.lit("ok")))
    is_sup = source.isin("supabase", "supabase_api")
    return df.select(
        "request_id", "token", "token_src",
        F.col("is_simple").cast("int").alias("is_simple"),
        source.alias("claim_source"), outcome.alias("outcome"),
        F.when(is_sup, sup_ws).alias("sup_workspace"),
        F.when(is_sup, sup_role).alias("sup_role_out"))


def workspace_context(claims: DataFrame) -> DataFrame:
    """_extract_workspace_context + _validate_workspace_access +
    _is_test_user + the X-Workspace-Id override (:219-231, :625-653,
    :669-717)."""
    ws = F.col("workspace_id")
    no_ws = ws.isNull() | (ws == "")
    role_out = F.when(F.col("role_str").isin("member", "admin", "owner"),
                      F.col("role_str")).otherwise(F.lit("member"))
    is_test = (F.coalesce(F.col("is_test_user_claim"), F.lit(False))
               & F.col("enable_test_auth")
               & F.col("environment").isin(*TEST_ENVIRONMENTS)
               & (F.coalesce(F.col("user_id_claim"), F.lit(""))
                  == TEST_USER_ID))
    is_material = F.col("sub") == "material-kai-platform"
    access = is_test | is_material | F.col("active_member")
    denied = no_ws | ~access
    wants_override = F.col("x_workspace_id").isNotNull() & \
        (F.col("x_workspace_id") != ws)
    override_ok = wants_override & ~denied & \
        (is_material | F.col("member_of_requested"))
    return claims.select(
        "claim_id",
        F.when(denied, F.lit("forbidden_workspace")).otherwise(F.lit("ok"))
        .alias("outcome"),
        F.when(~denied,
               F.when(override_ok, F.col("x_workspace_id")).otherwise(ws))
        .alias("final_workspace"),
        F.when(~denied, role_out).alias("role_out"),
        F.when(~denied, is_test).cast("int").alias("is_test_user"),
        override_ok.cast("int").alias("overridden"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

TOKENS = (
    None, MATERIAL_KEY, "test-key", "test-api-key", "development-key",
    "custom-key-1", "mk_unknownkey12345", "mk_toolongkey1234567890123",
    "mk_bad-key12345678", "eyJhbGciOiJIUzI1NiJ9.payload.sig",
    # hit the strip pin: these only match their configs post-trim;
    # 13 entries — coprime with the header(12)/conf(4)/env(7)/enable(3)
    # cycles so every (token, settings) combination occurs
    "spaced-key", "custom-key-2", "mk_UPPER_Key1234567",
)
ENVS = ("development", "testing", "dev", "test", "production",
        "staging", "DEV")
KEY_CONFS = (None, "custom-key-1, custom-key-2", "",
             "test-key,  spaced-key ")


def synth_requests(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    path = F.lit(PATHS[0])
    for i, p in enumerate(PATHS[1:], 1):
        path = F.when(e % len(PATHS) == i, F.lit(p)).otherwise(path)
    tok = F.lit(TOKENS[1])
    for i, t in enumerate(TOKENS):
        if i == 1:
            continue
        tok = F.when(e % len(TOKENS) == i,
                     F.lit(t).cast("string")).otherwise(tok)
    h = e % 12
    header = (F.when(h == 0, F.lit(None).cast("string"))
              .when(h == 1, F.concat(F.lit("Bearer "), tok))
              .when(h == 2, F.concat(F.lit("Bearer  "), tok))
              .when(h == 3, F.lit("Bearer"))
              .when(h == 4, F.concat(F.lit("bearer "), tok))
              .when(h == 5, F.concat(F.lit("Token "), tok))
              .when(h == 6, F.concat(F.lit("Bearer "), tok,
                                     F.lit(" extra")))
              .otherwise(F.concat(F.lit("Bearer "), tok)))
    ck = e % 5
    cookie = (F.when(ck <= 1, F.lit(None).cast("string"))
              .when(ck == 2, F.lit(MATERIAL_KEY))
              .when(ck == 3, F.lit("test-key"))
              .otherwise(F.lit("eyJ.cookie.tok")))
    env = F.lit(ENVS[0])
    for i, v in enumerate(ENVS[1:], 1):
        env = F.when(e % 7 == i, F.lit(v)).otherwise(env)
    conf = (F.when(e % 4 == 0, F.lit(None).cast("string"))
            .when(e % 4 == 1, F.lit(KEY_CONFS[1]))
            .when(e % 4 == 2, F.lit(""))
            .otherwise(F.lit(KEY_CONFS[3])))
    app_ws = (F.when((e * 31) % 4 == 0, F.lit(None).cast("string"))
              .when((e * 31) % 4 == 1, F.lit(""))
              .when((e * 31) % 4 == 2,
                    F.concat(F.lit("ws-app-"), e % 3))
              .otherwise(F.lit("ws-app-x")))
    user_ws = (F.when((e * 37) % 3 == 0, F.lit(None).cast("string"))
               .when((e * 37) % 3 == 1, F.lit(""))
               .otherwise(F.concat(F.lit("ws-user-"), e % 2)))
    sup_role = (F.when((e * 41) % 3 == 0, F.lit(None).cast("string"))
                .when((e * 41) % 3 == 1, F.lit("admin"))
                .otherwise(F.lit("custom_role")))
    return events.select(
        e.alias("request_id"),
        F.when(e % 17 == 0, F.lit("OPTIONS")).otherwise(
            F.when(e % 2 == 0, F.lit("GET")).otherwise(F.lit("POST")))
        .alias("method"),
        path.alias("path"), header.alias("auth_header"),
        cookie.alias("cookie_token"),
        (e % 3 != 0).alias("enable_test_auth"), env.alias("environment"),
        conf.alias("test_api_keys"),
        ((e * 7) % 5 == 0).alias("hs256_valid"),
        ((e * 11) % 4 != 0).alias("sup_claims_ok"),
        ((e * 13) % 5 < 3).alias("aud_ok"),
        ((e * 17) % 3 == 0).alias("api_valid"),
        ((e * 19) % 4 != 3).alias("mivaa_valid"),
        ((e * 23) % 5 != 0).alias("mivaa_claims_ok"),
        ((e * 29) % 6 == 0).alias("mivaa_expired"),
        app_ws.alias("app_ws"), user_ws.alias("user_ws"),
        sup_role.alias("sup_role"))


def synth_claims(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    sub = F.when(e % 11 == 0, F.lit("material-kai-platform")) \
        .otherwise(F.concat(F.lit("user-"), e % 13))
    uid = (F.when(e % 7 <= 1, F.lit(TEST_USER_ID))
           .when(e % 7 == 2, F.lit(None).cast("string"))
           .otherwise(F.concat(F.lit("user-"), e % 13)))
    ws = (F.when(e % 9 == 0, F.lit(None).cast("string"))
          .when(e % 9 == 1, F.lit(""))
          .otherwise(F.concat(F.lit("ws-"), e % 5)))
    role = (F.when(e % 8 == 0, F.lit("member"))
            .when(e % 8 == 1, F.lit("admin"))
            .when(e % 8 == 2, F.lit("owner"))
            .when(e % 8 == 3, F.lit("authenticated"))
            .when(e % 8 == 4, F.lit("badrole"))
            .otherwise(F.lit(None).cast("string")))
    env = F.lit(ENVS[0])
    for i, v in enumerate(ENVS[1:], 1):
        env = F.when(e % 7 == i, F.lit(v)).otherwise(env)
    xws = F.when(e % 5 < 2, F.lit(None).cast("string")) \
        .otherwise(F.concat(F.lit("ws-"), (e * 7) % 6))
    return events.select(
        e.alias("claim_id"), sub.alias("sub"), uid.alias("user_id_claim"),
        ws.alias("workspace_id"), role.alias("role_str"),
        (e % 6 < 3).alias("is_test_user_claim"),
        (e % 3 != 0).alias("enable_test_auth"), env.alias("environment"),
        ((e * 3) % 4 != 0).alias("active_member"),
        xws.alias("x_workspace_id"),
        ((e * 5) % 3 == 0).alias("member_of_requested"))


def _paths_case(col: str = "event_id") -> str:
    arms = " ".join(f"WHEN {i} THEN '{p}'"
                    for i, p in enumerate(PATHS))
    return f"CASE {col} % {len(PATHS)} {arms} END"


def _tok_case() -> str:
    arms = []
    for i, t in enumerate(TOKENS):
        arms.append(f"WHEN {i} THEN " + ("NULL" if t is None
                                         else f"'{t}'"))
    return f"CASE event_id % {len(TOKENS)} " + " ".join(arms) + " END"


def _env_case() -> str:
    arms = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(ENVS))
    return f"CASE event_id % 7 {arms} END"


SYNTH_REQUESTS_SQL = f"""
    SELECT event_id AS request_id,
           CASE WHEN event_id % 17 = 0 THEN 'OPTIONS'
                WHEN event_id % 2 = 0 THEN 'GET' ELSE 'POST' END
               AS method,
           {_paths_case()} AS path,
           CASE event_id % 12
                WHEN 0 THEN NULL
                WHEN 1 THEN 'Bearer ' || tok
                WHEN 2 THEN 'Bearer  ' || tok
                WHEN 3 THEN 'Bearer'
                WHEN 4 THEN 'bearer ' || tok
                WHEN 5 THEN 'Token ' || tok
                WHEN 6 THEN 'Bearer ' || tok || ' extra'
                ELSE 'Bearer ' || tok END AS auth_header,
           CASE event_id % 5 WHEN 2 THEN '{MATERIAL_KEY}'
                WHEN 3 THEN 'test-key' WHEN 4 THEN 'eyJ.cookie.tok'
           END AS cookie_token,
           event_id % 3 <> 0 AS enable_test_auth,
           {_env_case()} AS environment,
           CASE event_id % 4 WHEN 0 THEN NULL
                WHEN 1 THEN 'custom-key-1, custom-key-2'
                WHEN 2 THEN ''
                ELSE 'test-key,  spaced-key ' END AS test_api_keys,
           (event_id * 7) % 5 = 0 AS hs256_valid,
           (event_id * 11) % 4 <> 0 AS sup_claims_ok,
           (event_id * 13) % 5 < 3 AS aud_ok,
           (event_id * 17) % 3 = 0 AS api_valid,
           (event_id * 19) % 4 <> 3 AS mivaa_valid,
           (event_id * 23) % 5 <> 0 AS mivaa_claims_ok,
           (event_id * 29) % 6 = 0 AS mivaa_expired,
           CASE (event_id * 31) % 4 WHEN 0 THEN NULL WHEN 1 THEN ''
                WHEN 2 THEN 'ws-app-' || CAST(event_id % 3 AS VARCHAR)
                ELSE 'ws-app-x' END AS app_ws,
           CASE (event_id * 37) % 3 WHEN 0 THEN NULL WHEN 1 THEN ''
                ELSE 'ws-user-' || CAST(event_id % 2 AS VARCHAR)
           END AS user_ws,
           CASE (event_id * 41) % 3 WHEN 0 THEN NULL WHEN 1 THEN 'admin'
                ELSE 'custom_role' END AS sup_role
    FROM (SELECT event_id,
                 {_tok_case()} AS tok
          FROM events) t
"""

SYNTH_CLAIMS_SQL = f"""
    SELECT event_id AS claim_id,
           CASE WHEN event_id % 11 = 0 THEN 'material-kai-platform'
                ELSE 'user-' || CAST(event_id % 13 AS VARCHAR) END AS sub,
           CASE WHEN event_id % 7 <= 1
                THEN '{TEST_USER_ID}'
                WHEN event_id % 7 = 2 THEN NULL
                ELSE 'user-' || CAST(event_id % 13 AS VARCHAR) END
               AS user_id_claim,
           CASE WHEN event_id % 9 = 0 THEN NULL
                WHEN event_id % 9 = 1 THEN ''
                ELSE 'ws-' || CAST(event_id % 5 AS VARCHAR) END
               AS workspace_id,
           CASE event_id % 8 WHEN 0 THEN 'member' WHEN 1 THEN 'admin'
                WHEN 2 THEN 'owner' WHEN 3 THEN 'authenticated'
                WHEN 4 THEN 'badrole' ELSE NULL END AS role_str,
           event_id % 6 < 3 AS is_test_user_claim,
           event_id % 3 <> 0 AS enable_test_auth,
           {_env_case()} AS environment,
           (event_id * 3) % 4 <> 0 AS active_member,
           CASE WHEN event_id % 5 < 2 THEN NULL
                ELSE 'ws-' || CAST((event_id * 7) % 6 AS VARCHAR) END
               AS x_workspace_id,
           (event_id * 5) % 3 = 0 AS member_of_requested
    FROM events
"""

_PREFIX_LIST = "[" + ", ".join(f"'{p}'" for p in EXCLUDE_PATHS) + "]"


def path_gate_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_REQUESTS_SQL}),
        g AS (
          SELECT request_id, method, path,
                 list_filter({_PREFIX_LIST},
                             p -> starts_with(path, p)) AS hits
          FROM r)
        SELECT request_id, method, path,
               CASE WHEN method = 'OPTIONS' THEN 'options_bypass'
                    WHEN path = '/' THEN 'excluded_root'
                    WHEN len(hits) > 0 THEN 'excluded'
                    ELSE 'gated' END AS verdict,
               CASE WHEN method <> 'OPTIONS' AND path <> '/'
                    THEN hits[1] END AS matched_prefix
        FROM g
    """


_DEFAULT_KEYS_LIST = "[" + ", ".join(f"'{k}'"
                                     for k in DEFAULT_TEST_KEYS) + "]"
_ENV_LIST = "[" + ", ".join(f"'{v}'" for v in TEST_ENVIRONMENTS) + "]"


def token_resolve_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_REQUESTS_SQL}),
        t AS (
          SELECT *,
                 CASE WHEN auth_header IS NOT NULL
                           AND starts_with(auth_header, 'Bearer ')
                      THEN str_split(auth_header, ' ')[2]
                      ELSE cookie_token END AS token,
                 CASE WHEN auth_header IS NOT NULL
                           AND starts_with(auth_header, 'Bearer ')
                      THEN 'bearer'
                      WHEN cookie_token IS NOT NULL THEN 'cookie'
                 END AS token_src
          FROM r),
        k AS (
          SELECT *,
                 CASE WHEN test_api_keys IS NOT NULL
                           AND test_api_keys <> ''
                      THEN list_transform(str_split(test_api_keys, ','),
                                          x -> trim(x))
                      ELSE {_DEFAULT_KEYS_LIST} END AS keys
          FROM t),
        c AS (
          SELECT *,
                 enable_test_auth
                     AND list_contains({_ENV_LIST}, environment)
                     AND list_contains(keys, token) AS test_allowed,
                 coalesce(starts_with(token, 'mk_')
                     AND length(token) BETWEEN 18 AND 20
                     AND regexp_matches(token, '^[A-Za-z0-9_]+$'),
                     FALSE) AS mk_form
          FROM k),
        s AS (
          SELECT *,
                 coalesce(test_allowed OR mk_form, FALSE) AS is_simple,
                 CASE WHEN token IS NULL OR token = '' THEN NULL
                      WHEN coalesce(test_allowed OR mk_form, FALSE)
                           AND token = '{MATERIAL_KEY}'
                      THEN 'material_key'
                      WHEN coalesce(test_allowed OR mk_form, FALSE)
                           AND coalesce(test_allowed, FALSE)
                      THEN 'test_key'
                      WHEN coalesce(test_allowed OR mk_form, FALSE)
                      THEN NULL
                      WHEN hs256_valid AND sup_claims_ok AND aud_ok
                      THEN 'supabase'
                      WHEN api_valid THEN 'supabase_api'
                      WHEN mivaa_valid AND mivaa_claims_ok
                           AND NOT mivaa_expired THEN 'mivaa_jwt'
                 END AS claim_source
          FROM c)
        SELECT request_id, token, token_src,
               CAST(is_simple AS INT) AS is_simple, claim_source,
               CASE WHEN token IS NULL OR token = '' THEN 'missing_token'
                    WHEN claim_source IS NULL THEN 'invalid_token'
                    ELSE 'ok' END AS outcome,
               CASE WHEN claim_source IN ('supabase', 'supabase_api')
                    THEN coalesce(nullif(app_ws, ''),
                                  nullif(user_ws, ''), '{MATERIAL_WS}')
               END AS sup_workspace,
               CASE WHEN claim_source IN ('supabase', 'supabase_api')
                    THEN coalesce(sup_role, 'authenticated')
               END AS sup_role_out
        FROM s
    """


def workspace_context_sql() -> str:
    return f"""
        WITH cl AS ({SYNTH_CLAIMS_SQL}),
        f AS (
          SELECT *,
                 workspace_id IS NULL OR workspace_id = '' AS no_ws,
                 coalesce(is_test_user_claim, FALSE)
                     AND enable_test_auth
                     AND list_contains({_ENV_LIST}, environment)
                     AND coalesce(user_id_claim, '') = '{TEST_USER_ID}'
                     AS is_test,
                 sub = 'material-kai-platform' AS is_material
          FROM cl),
        d AS (
          SELECT *,
                 no_ws OR NOT (is_test OR is_material OR active_member)
                     AS denied,
                 x_workspace_id IS NOT NULL
                     AND x_workspace_id <> workspace_id
                     AS wants_override
          FROM f)
        SELECT claim_id,
               CASE WHEN denied THEN 'forbidden_workspace'
                    ELSE 'ok' END AS outcome,
               CASE WHEN NOT denied THEN
                    CASE WHEN wants_override
                              AND (is_material OR member_of_requested)
                         THEN x_workspace_id ELSE workspace_id END
               END AS final_workspace,
               CASE WHEN NOT denied THEN
                    CASE WHEN role_str IN ('member', 'admin', 'owner')
                         THEN role_str ELSE 'member' END
               END AS role_out,
               CAST(CASE WHEN NOT denied THEN is_test END AS INT)
                   AS is_test_user,
               CAST(coalesce(wants_override AND NOT denied
                             AND (is_material OR member_of_requested),
                             FALSE) AS INT) AS overridden
        FROM d
    """
