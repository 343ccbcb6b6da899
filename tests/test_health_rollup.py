"""Pins for the unified health-check folds
(operators/health_rollup vs app/main.py /health + startup checks)."""

from mivaa_pdf_extractor_spark.operators import health_rollup as hr


def _ev(spark, n=1000):
    return spark.range(0, n).withColumnRenamed("id", "event_id")


def _ai_reference(r, p, probe_ok):
    """Transcription of the shared anthropic/openai/voyage block."""
    if r[f"{p}_outer_err"] is not None:
        return "unknown", None  # overall untouched
    if not r[f"{p}_key_set"]:
        return "degraded", "degraded"
    use_cache = (not r["force_refresh"]
                 and r[f"{p}_cache_age"] is not None
                 and r[f"{p}_cache_age"] < hr.CACHE_TTL_S)
    if use_cache:
        # the cached branch never writes overall_status — a cached
        # 'unhealthy' does NOT propagate (pin)
        return r[f"{p}_cache_status"], None
    if probe_ok:
        return "healthy", None
    return "unhealthy", "unhealthy"


def test_rollup_matches_reference(spark):
    snaps = hr.synth_health_snaps(_ev(spark))
    rows = [r.asDict() for r in snaps.collect()]
    got = {r["snapshot_id"]: r.asDict()
           for r in hr.health_status_rollup(snaps).collect()}
    for r in rows:
        g = got[r["snapshot_id"]]
        overall = "healthy"

        def bump(level):
            nonlocal overall
            if level == "unhealthy":
                overall = "unhealthy"
            elif level == "degraded" and overall == "healthy":
                overall = "degraded"

        if not r["db_ok"]:
            bump("unhealthy")
        assert g["db_status"] == ("healthy" if r["db_ok"] else "unhealthy")
        assert g["storage_status"] == "healthy"  # dead except

        for p, col, ok in (
                ("anth", "anthropic_status", r["anth_probe_ok"]),
                ("oai", "openai_status", r["oai_probe_ok"]),
                ("voy", "voyage_status",
                 r["voy_http"] is not None and r["voy_http"] == 200)):
            status, effect = _ai_reference(r, p, ok)
            assert g[col] == status, (p, r)
            if effect:
                bump(effect)

        # rag: exception path sets the SERVICE unhealthy but only
        # degrades the overall (`if overall_status != "unhealthy"`)
        if r["rag_err"] is not None:
            assert g["rag_status"] == "unhealthy"
            bump("degraded")
        elif not r["rag_registered"]:
            assert g["rag_status"] == "degraded"
            bump("degraded")
        else:
            assert g["rag_status"] == "healthy"

        assert g["overall_status"] == overall, r


def _snap(spark, **over):
    """One all-green snapshot row, selectively overridden — avoids
    chasing CRT intersections in the modular synth."""
    base = dict(
        snapshot_id=1, force_refresh=False, db_ok=True, db_err="x")
    for p in ("anth", "oai", "voy"):
        base.update({f"{p}_key_set": True, f"{p}_cache_age": None,
                     f"{p}_cache_status": "healthy",
                     f"{p}_cache_msg": "cm", f"{p}_probe_ok": True,
                     f"{p}_probe_err": "pe", f"{p}_outer_err": None})
    base.update(
        voy_http=200, slig_enabled=True, slig_cache_age=None,
        slig_cache_status="healthy", slig_cache_msg="scm",
        slig_http=200, slig_probe_err="sle", paddle_enabled=True,
        paddle_url="http://p/1", paddle_cache_age=None,
        paddle_cache_status="healthy", paddle_cache_msg="pcm",
        paddle_http=200, paddle_body_paused=False,
        paddle_probe_err="pde", rag_registered=True, rag_err=None)
    base.update(over)
    schema = hr.synth_health_snaps(_ev(spark, 1)).schema
    return spark.createDataFrame([tuple(base[f.name] for f in schema)],
                                 schema)


def test_slig_paddle_never_touch_overall(spark):
    # everything green except the HF endpoints hard-down: overall healthy
    snaps = _snap(spark, force_refresh=True, slig_http=418,
                  paddle_http=500)
    g = hr.health_status_rollup(snaps).collect()[0]
    assert g["slig_status"] == "degraded"
    assert g["paddle_status"] == "degraded"
    assert g["overall_status"] == "healthy"


def test_cached_unhealthy_does_not_propagate(spark):
    snaps = _snap(spark, anth_cache_age=100,
                  anth_cache_status="unhealthy", anth_probe_ok=False)
    g = hr.health_status_rollup(snaps).collect()[0]
    assert g["anthropic_status"] == "unhealthy"
    assert g["anthropic_cached"] == 1
    # a cached failure never sets the overall unhealthy
    assert g["overall_status"] == "healthy"
    # the same probe outcome uncached DOES propagate
    g2 = hr.health_status_rollup(
        _snap(spark, anth_cache_age=None, anth_probe_ok=False)
    ).collect()[0]
    assert g2["anthropic_status"] == "unhealthy"
    assert g2["overall_status"] == "unhealthy"


def test_error_retry_window(spark):
    # live probe failure caches with the 60 s retry stamp; success the
    # full TTL
    snaps = hr.synth_health_snaps(_ev(spark)).filter(
        "force_refresh AND anth_key_set AND anth_outer_err IS NULL")
    for g in hr.health_status_rollup(snaps).collect():
        if g["anthropic_status"] == "healthy":
            assert g["anthropic_retry_in"] == hr.CACHE_TTL_S
        elif g["anthropic_status"] == "unhealthy":
            assert g["anthropic_retry_in"] == hr.ERROR_RETRY_S


def test_paddle_whitespace_url_is_disabled(spark):
    snaps = hr.synth_health_snaps(_ev(spark)).filter(
        "paddle_enabled AND paddle_url = '   '")
    got = hr.health_status_rollup(snaps).collect()
    assert got
    assert all(g["paddle_status"] == "disabled" for g in got)


def test_paddle_paused_tier_beats_status_code(spark):
    # 400 + 'paused' body is HEALTHY (cost-saving mode), plain 400 is
    # not; force_refresh bypasses the cache so these rows all probe
    paused = hr.health_status_rollup(
        _snap(spark, force_refresh=True, paddle_http=400,
              paddle_body_paused=True)).collect()[0]
    plain = hr.health_status_rollup(
        _snap(spark, force_refresh=True, paddle_http=400,
              paddle_body_paused=False)).collect()[0]
    assert paused["paddle_status"] == "healthy"
    assert "paused (cost-saving mode)" in paused["paddle_message"]
    assert plain["paddle_status"] == "degraded"


def test_summary_excludes_list_components(spark):
    comps = hr.synth_components(_ev(spark))
    rows = [r.asDict() for r in comps.collect()]
    got = {r["snapshot_id"]: r.asDict()
           for r in hr.summary_counts(comps).collect()}
    per = {}
    for r in rows:
        per.setdefault(r["snapshot_id"], []).append(r)
    for sid, rs in per.items():
        want = sum(1 for r in rs
                   if not r["is_list"] and r["status"] == "healthy")
        assert got[sid]["total_checks"] == len(rs)
        assert got[sid]["healthy_checks"] == want
    # the list-valued component with healthy members never counts
    listy = [r for r in rows if r["is_list"] and r["status"] == "healthy"]
    assert listy  # the pin is actually exercised


def test_resource_gate_thresholds(spark):
    probes = spark.createDataFrame(
        [(1, 85.0, 90.0, True), (2, 85.1, 12.0, True),
         (3, 50.0, 90.1, True), (4, 99.9, 99.9, True),
         (5, 99.9, 99.9, False)],
        "snapshot_id long, mem_pct double, disk_pct double, "
        "psutil_available boolean")
    got = {r["snapshot_id"]: r.asDict()
           for r in hr.resource_gate(probes).collect()}
    assert got[1]["resource_status"] == "healthy"  # thresholds exclusive
    assert got[1]["warnings_joined"] == ""
    assert got[2]["resource_status"] == "degraded"
    assert got[2]["warnings_joined"] == "High memory usage: 85.1%"
    assert got[3]["warnings_joined"] == "High disk usage: 90.1%"
    assert got[4]["warnings_joined"] == \
        "High memory usage: 99.9%, High disk usage: 99.9%"
    assert got[5]["resource_status"] == "unavailable"
    assert got[5]["warnings_joined"] is None
