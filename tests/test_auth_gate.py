"""Pins for the JWT-middleware gating folds (operators/auth_gate vs
app/middleware/jwt_auth.py)."""

from mivaa_pdf_extractor_spark.operators import auth_gate as ag


def _ev(spark, n=1000):
    return spark.range(0, n).withColumnRenamed("id", "event_id")


def _extract_token(auth_header, cookie_token):
    """_extract_token transcription (:279-299)."""
    if auth_header and auth_header.startswith("Bearer "):
        return auth_header.split(" ")[1]
    return cookie_token


def _test_key_allowed(token, r):
    """_is_test_api_key_allowed transcription (:595-624)."""
    if not r["enable_test_auth"]:
        return False
    if r["environment"] not in ["development", "testing", "dev", "test"]:
        return False
    configured = []
    if r["test_api_keys"]:
        configured = [k.strip() for k in r["test_api_keys"].split(",")]
    if not configured:
        configured = ["test-key", "test-api-key", "development-key"]
    return token in configured


def _is_simple(token, r):
    """_is_simple_api_key transcription (:521-543)."""
    if _test_key_allowed(token, r):
        return True
    return (token.startswith("mk_") and 18 <= len(token) <= 20
            and all(c.isalnum() or c == "_" for c in token))


def _reference_resolve(r):
    """_validate_token ladder transcription (:175-372)."""
    token = _extract_token(r["auth_header"], r["cookie_token"])
    if not token:
        return token, None, "missing_token"
    if _is_simple(token, r):
        if token == ag.MATERIAL_KEY:
            return token, "material_key", "ok"
        if _test_key_allowed(token, r):
            return token, "test_key", "ok"
        return token, None, "invalid_token"
    if r["hs256_valid"] and r["sup_claims_ok"] and r["aud_ok"]:
        return token, "supabase", "ok"
    if r["api_valid"]:
        return token, "supabase_api", "ok"
    if r["mivaa_valid"] and r["mivaa_claims_ok"] \
            and not r["mivaa_expired"]:
        return token, "mivaa_jwt", "ok"
    return token, None, "invalid_token"


def test_path_gate_matches_reference(spark):
    rows = ag.synth_requests(_ev(spark)).collect()
    got = {r["request_id"]: r.asDict()
           for r in ag.path_gate(ag.synth_requests(_ev(spark))).collect()}
    for r in rows:
        g = got[r["request_id"]]
        if r["method"] == "OPTIONS":
            want = "options_bypass"
        elif r["path"] == "/":
            want = "excluded_root"
        elif any(r["path"].startswith(p) for p in ag.EXCLUDE_PATHS):
            want = "excluded"
        else:
            want = "gated"
        assert g["verdict"] == want, (r["path"], g["verdict"], want)
    # prefix pins: longer-path excluded, shorter-path gated
    by_path = {}
    for rid, g in got.items():
        by_path.setdefault(g["path"], set()).add(
            (g["verdict"], g["matched_prefix"]))
    assert ("excluded", "/api/health") in by_path["/api/healthz"]
    assert ("gated", None) in by_path["/api/v1/price"]
    assert ("gated", None) in by_path["/api/v1/mentions"]
    assert ("excluded", "/api/v1/mentions/track") in by_path[
        "/api/v1/mentions/tracking"]
    assert ("excluded", "/api/admin/pause-for-deploy") in by_path[
        "/api/admin/pause-for-deploy-now"]


def test_token_ladder_matches_reference(spark):
    reqs = ag.synth_requests(_ev(spark))
    rows = [r.asDict() for r in reqs.collect()]
    got = {r["request_id"]: r.asDict()
           for r in ag.token_resolve(reqs).collect()}
    seen = set()
    for r in rows:
        token, source, outcome = _reference_resolve(r)
        g = got[r["request_id"]]
        assert g["token"] == token
        assert g["claim_source"] == source, (r["request_id"], token)
        assert g["outcome"] == outcome
        if source in ("supabase", "supabase_api"):
            want_ws = (r["app_ws"] or r["user_ws"] or ag.MATERIAL_WS)
            assert g["sup_workspace"] == want_ws
            assert g["sup_role_out"] == (r["sup_role"] or "authenticated")
        seen.add((outcome, source))
    assert ("ok", "material_key") in seen
    assert ("ok", "test_key") in seen
    assert ("ok", "supabase") in seen
    assert ("ok", "supabase_api") in seen
    assert ("ok", "mivaa_jwt") in seen
    assert ("invalid_token", None) in seen
    assert ("missing_token", None) in seen


def test_double_space_bearer_masks_cookie(spark):
    """'Bearer  x' extracts '' via split(' ')[1] and 401s as MISSING even
    when a valid cookie is present (the bearer branch returns
    unconditionally)."""
    req = spark.createDataFrame(
        [(1, "Bearer  " + ag.MATERIAL_KEY, ag.MATERIAL_KEY, True,
          "development", None, False, False, False, False, False, False,
          False, None, None, None)],
        "request_id long, auth_header string, cookie_token string, "
        "enable_test_auth boolean, environment string, "
        "test_api_keys string, hs256_valid boolean, "
        "sup_claims_ok boolean, aud_ok boolean, api_valid boolean, "
        "mivaa_valid boolean, mivaa_claims_ok boolean, "
        "mivaa_expired boolean, app_ws string, user_ws string, "
        "sup_role string")
    row = ag.token_resolve(req).collect()[0]
    assert row["outcome"] == "missing_token"
    assert row["token_src"] == "bearer"


def test_unknown_simple_key_never_falls_to_jwt(spark):
    """A well-formed mk_ key that matches nothing is rejected even when
    every JWT verdict flag is green (pin: the ladder returns the simple-
    key verdict unconditionally)."""
    req = spark.createDataFrame(
        [(1, "Bearer mk_unknownkey12345", None, True, "production",
          None, True, True, True, True, True, True, False, "ws-a",
          None, None)],
        "request_id long, auth_header string, cookie_token string, "
        "enable_test_auth boolean, environment string, "
        "test_api_keys string, hs256_valid boolean, "
        "sup_claims_ok boolean, aud_ok boolean, api_valid boolean, "
        "mivaa_valid boolean, mivaa_claims_ok boolean, "
        "mivaa_expired boolean, app_ws string, user_ws string, "
        "sup_role string")
    row = ag.token_resolve(req).collect()[0]
    assert row["outcome"] == "invalid_token"
    assert row["is_simple"] == 1
    assert row["claim_source"] is None


def test_custom_key_config_replaces_defaults(spark):
    """With a custom test_api_keys config, the default 'test-key' is NOT
    allowed (the custom list replaces, never extends, the defaults)."""
    base = (True, "development", "custom-key-1, custom-key-2",
            False, False, False, False, False, False, False,
            None, None, None)
    req = spark.createDataFrame(
        [(1, "Bearer test-key", None) + base,
         (2, "Bearer custom-key-2", None) + base],
        "request_id long, auth_header string, cookie_token string, "
        "enable_test_auth boolean, environment string, "
        "test_api_keys string, hs256_valid boolean, "
        "sup_claims_ok boolean, aud_ok boolean, api_valid boolean, "
        "mivaa_valid boolean, mivaa_claims_ok boolean, "
        "mivaa_expired boolean, app_ws string, user_ws string, "
        "sup_role string")
    rows = {r["request_id"]: r for r in ag.token_resolve(req).collect()}
    assert rows[1]["outcome"] == "invalid_token"  # not mk_, not allowed
    assert rows[1]["is_simple"] == 0  # JWT ladder tried, all flags false
    assert rows[2]["claim_source"] == "test_key"


def test_workspace_context_matches_reference(spark):
    claims = ag.synth_claims(_ev(spark))
    rows = [r.asDict() for r in claims.collect()]
    got = {r["claim_id"]: r.asDict()
           for r in ag.workspace_context(claims).collect()}
    for r in rows:
        g = got[r["claim_id"]]
        # transcription of :625-653, :669-717, :219-231
        is_test = (bool(r["is_test_user_claim"])
                   and r["enable_test_auth"]
                   and r["environment"] in ("development", "testing",
                                            "dev", "test")
                   and (r["user_id_claim"] or "") == ag.TEST_USER_ID)
        is_material = r["sub"] == "material-kai-platform"
        if not r["workspace_id"]:
            want = "forbidden_workspace"
        elif not (is_test or is_material or r["active_member"]):
            want = "forbidden_workspace"
        else:
            want = "ok"
        assert g["outcome"] == want, r
        if want == "ok":
            role = (r["role_str"] if r["role_str"] in
                    ("member", "admin", "owner") else "member")
            assert g["role_out"] == role
            assert g["is_test_user"] == int(is_test)
            ws = r["workspace_id"]
            if r["x_workspace_id"] and r["x_workspace_id"] != ws and \
                    (is_material or r["member_of_requested"]):
                ws = r["x_workspace_id"]
            assert g["final_workspace"] == ws
