"""Unified health-check folds (app/main.py) — the /health endpoint's
per-service status ladders, cache decisions and overall rollup, plus the
startup comprehensive-check summary, as native projections. The probes
themselves are network; every DECISION around them is deterministic and
pinned:

- overall rollup (:1300-1778): only database and the three PROBED AI
  services (anthropic / openai / voyage) can set overall unhealthy; a
  missing API key degrades (only from healthy); the HF endpoints (slig /
  paddleocr) NEVER touch the overall status, whatever they report; the
  rag block's exception path sets the SERVICE unhealthy but the OVERALL
  only degraded (``if overall_status != "unhealthy"`` — pin); a service
  whose outer try fails reports status 'unknown' and leaves the overall
  alone (pin);
- cache fold (:1340-1360 et al.): cached iff NOT force_refresh AND an
  entry exists AND age < 3600 s; a CACHED 'unhealthy' status does NOT
  set the overall unhealthy — only a live probe failure does (the
  cached branch has no overall_status line — pin); healthy probe
  results cache for the full TTL, error results are stamped
  ``now - ttl + 60`` so they re-probe after 60 s;
- storage (:1330-1343): the try body is literal assignment — the
  except is DEAD and storage is unconditionally healthy (pin);
- slig/paddle probe gating (:1563-1745): a NON-forced /health never
  probes the scale-to-zero endpoints — it reports healthy
  "Configured (... not probed)" even with a stale cache; force_refresh
  probes: slig 200 OR 503 are both healthy (cold-start counts),
  anything else degrades, connection errors degrade; paddle adds the
  400-with-'paused'-body healthy tier ahead of the 200/503 tier;
  paddle is configured only when enabled AND (endpoint_url or '')
  .strip() is non-empty — a whitespace-only URL is 'disabled' (pin);
- error messages: probe failures truncate str(e) to 100 chars
  (``[:100]``), voyage embeds the HTTP code, paddle suffixes
  `` · provider=modal``;
- startup summary (:726-730): healthy_checks counts only DICT results
  with status 'healthy' — the external_services entry is a LIST, so it
  can never count as healthy yet still counts in total_checks (pin);
- resource gate (:598-640): degraded when memory > 85.0 OR disk >
  90.0, warnings collected memory-first and joined ', ', each
  formatted ``{pct:.1f}%``; psutil missing -> status 'unavailable'.

Scale: the rollup is a map-only wide projection per snapshot; the
summary is one map-side-combinable groupBy. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

CACHE_TTL_S = 3600   # _ai_health_cache_ttl (:1195)
ERROR_RETRY_S = 60   # error entries re-probe after 60 s
MEM_WARN = 85.0      # (:610)
DISK_WARN = 90.0     # (:611)

_AI_HEALTHY_MSG = {
    "anth": "Claude API operational",
    "oai": "OpenAI Embeddings API operational",
    "voy": "Voyage AI API operational",
}


def _use_cache(p: str) -> Column:
    return (~F.col("force_refresh")
            & F.col(f"{p}_cache_age").isNotNull()
            & (F.col(f"{p}_cache_age") < CACHE_TTL_S))


def _trunc100(c: Column) -> Column:
    return F.substring(c, 1, 100)


def _ai_service(p: str):
    """The shared anthropic/openai/voyage skeleton: key gate -> cache ->
    probe. Returns (status, message, cached_flag, retry_in,
    sets_unhealthy, sets_degraded) columns."""
    outer = F.col(f"{p}_outer_err")
    key = F.col(f"{p}_key_set")
    cached = _use_cache(p)
    ok = F.col(f"{p}_probe_ok")
    if p == "voy":
        probe_msg = F.when(
            F.col("voy_http").isNull(),
            F.concat(F.lit("Connection error: "),
                     _trunc100(F.col("voy_probe_err")))) \
            .otherwise(F.concat(F.lit("API error: HTTP "),
                                F.col("voy_http")))
        ok = F.col("voy_http").isNotNull() & (F.col("voy_http") == 200)
    else:
        probe_msg = F.concat(F.lit("API error: "),
                             _trunc100(F.col(f"{p}_probe_err")))
    status = (F.when(outer.isNotNull(), F.lit("unknown"))
              .when(~key, F.lit("degraded"))
              .when(cached, F.col(f"{p}_cache_status"))
              .when(ok, F.lit("healthy"))
              .otherwise(F.lit("unhealthy")))
    message = (F.when(outer.isNotNull(), outer)
               .when(~key, F.lit("API key not configured"))
               .when(cached, F.col(f"{p}_cache_msg"))
               .when(ok, F.lit(_AI_HEALTHY_MSG[p]))
               .otherwise(probe_msg))
    cached_flag = (F.when(outer.isNotNull() | ~key,
                          F.lit(None).cast("int"))
                   .otherwise(cached.cast("int")))
    retry_in = (F.when(outer.isNotNull() | ~key | cached,
                       F.lit(None).cast("long"))
                .when(ok, F.lit(CACHE_TTL_S).cast("long"))
                .otherwise(F.lit(ERROR_RETRY_S).cast("long")))
    # only a LIVE probe failure reaches overall (cached unhealthy
    # doesn't; outer 'unknown' doesn't)
    sets_unhealthy = outer.isNull() & key & ~cached & ~ok
    sets_degraded = outer.isNull() & ~key
    return status, message, cached_flag, retry_in, sets_unhealthy, \
        sets_degraded


def health_status_rollup(snaps: DataFrame) -> DataFrame:
    """The /health endpoint fold (:1300-1778), one wide row per
    snapshot."""
    db_ok = F.col("db_ok")
    a = _ai_service("anth")
    o = _ai_service("oai")
    v = _ai_service("voy")

    slig_on = F.col("slig_enabled")
    slig_cached = _use_cache("slig")
    slig_http = F.col("slig_http")
    slig_status = (
        F.when(~slig_on, F.lit("disabled"))
        .when(slig_cached, F.col("slig_cache_status"))
        .when(~F.col("force_refresh"), F.lit("healthy"))  # never probed
        .when(slig_http.isin(200, 503), F.lit("healthy"))
        .otherwise(F.lit("degraded")))
    slig_message = (
        F.when(~slig_on, F.lit("SLIG endpoint not configured or disabled"))
        .when(slig_cached, F.col("slig_cache_msg"))
        .when(~F.col("force_refresh"),
              F.lit("Configured (Modal scale-to-zero; not probed)"))
        .when(slig_http.isNull(),
              F.concat(F.lit("Connection error: "),
                       _trunc100(F.col("slig_probe_err"))))
        .when(slig_http.isin(200, 503),
              F.lit("SLIG endpoint operational (Modal)"))
        .otherwise(F.concat(F.lit("HTTP "), slig_http)))

    # enabled AND (endpoint_url or '').strip() != ''
    pad_on = F.col("paddle_enabled") \
        & (F.trim(F.coalesce(F.col("paddle_url"), F.lit(""))) != "")
    pad_cached = _use_cache("paddle")
    pad_http = F.col("paddle_http")
    pad_paused = pad_http.isNotNull() & (pad_http == 400) \
        & F.col("paddle_body_paused")
    pad_status = (
        F.when(~pad_on, F.lit("disabled"))
        .when(pad_cached, F.col("paddle_cache_status"))
        .when(~F.col("force_refresh"), F.lit("healthy"))
        .when(pad_paused | pad_http.isin(200, 503), F.lit("healthy"))
        .otherwise(F.lit("degraded")))
    pad_message = (
        F.when(~pad_on, F.lit("PaddleOCR endpoint not configured or "
                              "disabled (provider=modal)"))
        .when(pad_cached, F.col("paddle_cache_msg"))
        .when(~F.col("force_refresh"),
              F.lit("Configured (Modal scale-to-zero; not probed) "
                    "· provider=modal"))
        .when(pad_paused,
              F.lit("PaddleOCR endpoint paused (cost-saving mode) "
                    "· provider=modal"))
        .when(pad_http.isin(200, 503),
              F.lit("PaddleOCR endpoint operational · provider=modal"))
        .when(pad_http.isNull(),
              F.concat(F.lit("Connection error: "),
                       _trunc100(F.col("paddle_probe_err")),
                       F.lit(" · provider=modal")))
        .otherwise(F.concat(F.lit("HTTP "), pad_http,
                            F.lit(" · provider=modal"))))

    rag_status = (F.when(F.col("rag_err").isNotNull(), F.lit("unhealthy"))
                  .when(F.col("rag_registered"), F.lit("healthy"))
                  .otherwise(F.lit("degraded")))

    any_unhealthy = (~db_ok) | a[4] | o[4] | v[4]
    any_degraded = a[5] | o[5] | v[5] \
        | (F.col("rag_err").isNotNull()) \
        | (F.col("rag_err").isNull() & ~F.col("rag_registered"))
    overall = (F.when(any_unhealthy, F.lit("unhealthy"))
               .when(any_degraded, F.lit("degraded"))
               .otherwise(F.lit("healthy")))

    return snaps.select(
        "snapshot_id",
        F.when(db_ok, F.lit("healthy")).otherwise(F.lit("unhealthy"))
        .alias("db_status"),
        F.when(db_ok, F.lit("Connected"))
        .otherwise(F.concat(F.lit("Connection failed: "), F.col("db_err")))
        .alias("db_message"),
        F.lit("healthy").alias("storage_status"),  # dead except (pin)
        a[0].alias("anthropic_status"), a[1].alias("anthropic_message"),
        a[2].alias("anthropic_cached"), a[3].alias("anthropic_retry_in"),
        o[0].alias("openai_status"), o[1].alias("openai_message"),
        v[0].alias("voyage_status"), v[1].alias("voyage_message"),
        slig_status.alias("slig_status"), slig_message.alias("slig_message"),
        pad_status.alias("paddle_status"), pad_message.alias("paddle_message"),
        rag_status.alias("rag_status"),
        overall.alias("overall_status"))


def resource_gate(probes: DataFrame) -> DataFrame:
    """System-resource tier (:598-640)."""
    mem_hi = F.col("mem_pct") > MEM_WARN
    disk_hi = F.col("disk_pct") > DISK_WARN
    warns = F.concat_ws(
        ", ",
        F.when(mem_hi, F.concat(F.lit("High memory usage: "),
                                F.format_string("%.1f", F.col("mem_pct")),
                                F.lit("%"))),
        F.when(disk_hi, F.concat(F.lit("High disk usage: "),
                                 F.format_string("%.1f", F.col("disk_pct")),
                                 F.lit("%"))))
    return probes.select(
        "snapshot_id",
        F.when(~F.col("psutil_available"), F.lit("unavailable"))
        .when(mem_hi | disk_hi, F.lit("degraded"))
        .otherwise(F.lit("healthy")).alias("resource_status"),
        F.when(~F.col("psutil_available"), F.lit(None).cast("string"))
        .otherwise(warns).alias("warnings_joined"))


def summary_counts(components: DataFrame) -> DataFrame:
    """Startup health summary (:726-730): healthy counts only DICT
    results with status 'healthy'; list-valued entries count in the
    total but can never be healthy."""
    return components.groupBy("snapshot_id").agg(
        F.count(F.lit(1)).cast("long").alias("total_checks"),
        F.sum((~F.col("is_list")
               & (F.col("status") == "healthy")).cast("long"))
        .alias("healthy_checks"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------


def _synth_ai(p: str, e: Column, k: int) -> list:
    long_err = F.rpad(F.concat(F.lit(f"{p}e-"), e), 120, "x")
    return [
        ((e * 3) % k != 0).alias(f"{p}_key_set"),
        F.when((e * 5) % 4 == 0, F.lit(None).cast("long"))
        .otherwise(((e * 37) % 7200).cast("long")).alias(f"{p}_cache_age"),
        F.when(e % 3 == 0, F.lit("unhealthy"))
        .when(e % 3 == 1, F.lit("degraded"))
        .otherwise(F.lit("healthy")).alias(f"{p}_cache_status"),
        F.concat(F.lit(f"{p}cm-"), e).alias(f"{p}_cache_msg"),
        ((e * 7) % 5 != 0).alias(f"{p}_probe_ok"),
        F.when(e % 10 == 0, long_err)
        .otherwise(F.concat(F.lit(f"{p}e-"), e)).alias(f"{p}_probe_err"),
        F.when((e * 11) % 17 == 0, F.concat(F.lit(f"{p}outer-"), e))
        .otherwise(F.lit(None).cast("string")).alias(f"{p}_outer_err"),
    ]


def _synth_ai_sql(p: str, k: int) -> str:
    long_err = (f"rpad('{p}e-' || CAST(event_id AS VARCHAR), 120, 'x')")
    return f"""
           (event_id * 3) % {k} <> 0 AS {p}_key_set,
           CASE WHEN (event_id * 5) % 4 = 0 THEN NULL
                ELSE CAST((event_id * 37) % 7200 AS BIGINT) END
               AS {p}_cache_age,
           CASE event_id % 3 WHEN 0 THEN 'unhealthy'
                WHEN 1 THEN 'degraded' ELSE 'healthy' END
               AS {p}_cache_status,
           '{p}cm-' || CAST(event_id AS VARCHAR) AS {p}_cache_msg,
           (event_id * 7) % 5 <> 0 AS {p}_probe_ok,
           CASE WHEN event_id % 10 = 0 THEN {long_err}
                ELSE '{p}e-' || CAST(event_id AS VARCHAR) END
               AS {p}_probe_err,
           CASE WHEN (event_id * 11) % 17 = 0
                THEN '{p}outer-' || CAST(event_id AS VARCHAR) END
               AS {p}_outer_err"""


def synth_health_snaps(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    cols = [
        e.alias("snapshot_id"),
        (e % 3 == 0).alias("force_refresh"),
        (e % 7 != 0).alias("db_ok"),
        F.concat(F.lit("dbe-"), e).alias("db_err"),
    ]
    cols += _synth_ai("anth", e, 9)
    cols += _synth_ai("oai", e, 11)
    cols += _synth_ai("voy", e, 13)
    cols += [
        F.when((e * 13) % 6 == 0, F.lit(None).cast("long"))
        .when((e * 13) % 6 == 1, F.lit(503).cast("long"))
        .when((e * 13) % 6 == 2, F.lit(404).cast("long"))
        .otherwise(F.lit(200).cast("long")).alias("voy_http"),
        (e % 5 != 0).alias("slig_enabled"),
        F.when((e * 17) % 5 == 0, F.lit(None).cast("long"))
        .otherwise(((e * 37) % 7200).cast("long")).alias("slig_cache_age"),
        F.when(e % 2 == 0, F.lit("healthy")).otherwise(F.lit("degraded"))
        .alias("slig_cache_status"),
        F.concat(F.lit("scm-"), e).alias("slig_cache_msg"),
        F.when(e % 4 == 0, F.lit(None).cast("long"))
        .when(e % 4 == 1, F.lit(503).cast("long"))
        .when(e % 4 == 2, F.lit(418).cast("long"))
        .otherwise(F.lit(200).cast("long")).alias("slig_http"),
        F.concat(F.lit("sle-"), e).alias("slig_probe_err"),
        (e % 6 != 0).alias("paddle_enabled"),
        F.when(e % 8 == 0, F.lit(""))
        .when(e % 8 == 1, F.lit("   "))  # whitespace-only -> disabled
        .when(e % 8 == 2, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("http://p/"), e % 5)).alias("paddle_url"),
        F.when((e * 19) % 5 == 0, F.lit(None).cast("long"))
        .otherwise(((e * 41) % 7200).cast("long")).alias("paddle_cache_age"),
        F.when(e % 2 == 0, F.lit("healthy")).otherwise(F.lit("degraded"))
        .alias("paddle_cache_status"),
        F.concat(F.lit("pcm-"), e).alias("paddle_cache_msg"),
        F.when(e % 5 == 0, F.lit(None).cast("long"))
        .when(e % 5 == 1, F.lit(400).cast("long"))
        .when(e % 5 == 2, F.lit(503).cast("long"))
        .when(e % 5 == 3, F.lit(500).cast("long"))
        .otherwise(F.lit(200).cast("long")).alias("paddle_http"),
        ((e * 3) % 2 == 0).alias("paddle_body_paused"),
        F.concat(F.lit("pde-"), e).alias("paddle_probe_err"),
        (e % 6 != 0).alias("rag_registered"),
        F.when((e * 23) % 19 == 0, F.concat(F.lit("rage-"), e))
        .otherwise(F.lit(None).cast("string")).alias("rag_err"),
    ]
    return events.filter(e < 500).select(*cols)


SYNTH_HEALTH_SNAPS_SQL = f"""
    SELECT event_id AS snapshot_id,
           event_id % 3 = 0 AS force_refresh,
           event_id % 7 <> 0 AS db_ok,
           'dbe-' || CAST(event_id AS VARCHAR) AS db_err,
           {_synth_ai_sql('anth', 9)},
           {_synth_ai_sql('oai', 11)},
           {_synth_ai_sql('voy', 13)},
           CASE (event_id * 13) % 6 WHEN 0 THEN NULL
                WHEN 1 THEN 503 WHEN 2 THEN 404
                ELSE 200 END AS voy_http,
           event_id % 5 <> 0 AS slig_enabled,
           CASE WHEN (event_id * 17) % 5 = 0 THEN NULL
                ELSE CAST((event_id * 37) % 7200 AS BIGINT) END
               AS slig_cache_age,
           CASE WHEN event_id % 2 = 0 THEN 'healthy'
                ELSE 'degraded' END AS slig_cache_status,
           'scm-' || CAST(event_id AS VARCHAR) AS slig_cache_msg,
           CASE event_id % 4 WHEN 0 THEN NULL WHEN 1 THEN 503
                WHEN 2 THEN 418 ELSE 200 END AS slig_http,
           'sle-' || CAST(event_id AS VARCHAR) AS slig_probe_err,
           event_id % 6 <> 0 AS paddle_enabled,
           CASE event_id % 8 WHEN 0 THEN '' WHEN 1 THEN '   '
                WHEN 2 THEN NULL
                ELSE 'http://p/' || CAST(event_id % 5 AS VARCHAR) END
               AS paddle_url,
           CASE WHEN (event_id * 19) % 5 = 0 THEN NULL
                ELSE CAST((event_id * 41) % 7200 AS BIGINT) END
               AS paddle_cache_age,
           CASE WHEN event_id % 2 = 0 THEN 'healthy'
                ELSE 'degraded' END AS paddle_cache_status,
           'pcm-' || CAST(event_id AS VARCHAR) AS paddle_cache_msg,
           CASE event_id % 5 WHEN 0 THEN NULL WHEN 1 THEN 400
                WHEN 2 THEN 503 WHEN 3 THEN 500 ELSE 200 END
               AS paddle_http,
           (event_id * 3) % 2 = 0 AS paddle_body_paused,
           'pde-' || CAST(event_id AS VARCHAR) AS paddle_probe_err,
           event_id % 6 <> 0 AS rag_registered,
           CASE WHEN (event_id * 23) % 19 = 0
                THEN 'rage-' || CAST(event_id AS VARCHAR) END AS rag_err
    FROM events WHERE event_id < 500
"""


def _ai_sql(p: str) -> dict:
    use_cache = (f"(NOT force_refresh AND {p}_cache_age IS NOT NULL "
                 f"AND {p}_cache_age < {CACHE_TTL_S})")
    if p == "voy":
        ok = "(voy_http IS NOT NULL AND voy_http = 200)"
        probe_msg = ("CASE WHEN voy_http IS NULL THEN 'Connection error: '"
                     " || left(voy_probe_err, 100) ELSE 'API error: HTTP '"
                     " || CAST(voy_http AS VARCHAR) END")
    else:
        ok = f"{p}_probe_ok"
        probe_msg = f"'API error: ' || left({p}_probe_err, 100)"
    healthy_msg = _AI_HEALTHY_MSG[p]
    return {
        "status": f"""CASE WHEN {p}_outer_err IS NOT NULL THEN 'unknown'
            WHEN NOT {p}_key_set THEN 'degraded'
            WHEN {use_cache} THEN {p}_cache_status
            WHEN {ok} THEN 'healthy' ELSE 'unhealthy' END""",
        "message": f"""CASE WHEN {p}_outer_err IS NOT NULL
                THEN {p}_outer_err
            WHEN NOT {p}_key_set THEN 'API key not configured'
            WHEN {use_cache} THEN {p}_cache_msg
            WHEN {ok} THEN '{healthy_msg}' ELSE {probe_msg} END""",
        "cached": f"""CASE WHEN {p}_outer_err IS NOT NULL
                OR NOT {p}_key_set THEN NULL
            WHEN {use_cache} THEN 1 ELSE 0 END""",
        "retry": f"""CASE WHEN {p}_outer_err IS NOT NULL
                OR NOT {p}_key_set OR {use_cache} THEN NULL
            WHEN {ok} THEN {CACHE_TTL_S} ELSE {ERROR_RETRY_S} END""",
        "sets_unhealthy": (f"({p}_outer_err IS NULL AND {p}_key_set "
                           f"AND NOT {use_cache} AND NOT {ok})"),
        "sets_degraded": f"({p}_outer_err IS NULL AND NOT {p}_key_set)",
    }


def health_status_rollup_sql() -> str:
    a, o, v = _ai_sql("anth"), _ai_sql("oai"), _ai_sql("voy")
    slig_cache = (f"(NOT force_refresh AND slig_cache_age IS NOT NULL "
                  f"AND slig_cache_age < {CACHE_TTL_S})")
    pad_cache = (f"(NOT force_refresh AND paddle_cache_age IS NOT NULL "
                 f"AND paddle_cache_age < {CACHE_TTL_S})")
    pad_on = ("(paddle_enabled AND "
              "trim(coalesce(paddle_url, '')) <> '')")
    pad_paused = ("(paddle_http IS NOT NULL AND paddle_http = 400 "
                  "AND paddle_body_paused)")
    return f"""
        WITH snaps AS ({SYNTH_HEALTH_SNAPS_SQL})
        SELECT snapshot_id,
               CASE WHEN db_ok THEN 'healthy' ELSE 'unhealthy' END
                   AS db_status,
               CASE WHEN db_ok THEN 'Connected'
                    ELSE 'Connection failed: ' || db_err END AS db_message,
               'healthy' AS storage_status,
               {a['status']} AS anthropic_status,
               {a['message']} AS anthropic_message,
               CAST({a['cached']} AS INT) AS anthropic_cached,
               CAST({a['retry']} AS BIGINT) AS anthropic_retry_in,
               {o['status']} AS openai_status,
               {o['message']} AS openai_message,
               {v['status']} AS voyage_status,
               {v['message']} AS voyage_message,
               CASE WHEN NOT slig_enabled THEN 'disabled'
                    WHEN {slig_cache} THEN slig_cache_status
                    WHEN NOT force_refresh THEN 'healthy'
                    WHEN slig_http IN (200, 503) THEN 'healthy'
                    ELSE 'degraded' END AS slig_status,
               CASE WHEN NOT slig_enabled
                      THEN 'SLIG endpoint not configured or disabled'
                    WHEN {slig_cache} THEN slig_cache_msg
                    WHEN NOT force_refresh
                      THEN 'Configured (Modal scale-to-zero; not probed)'
                    WHEN slig_http IS NULL
                      THEN 'Connection error: ' || left(slig_probe_err, 100)
                    WHEN slig_http IN (200, 503)
                      THEN 'SLIG endpoint operational (Modal)'
                    ELSE 'HTTP ' || CAST(slig_http AS VARCHAR) END
                   AS slig_message,
               CASE WHEN NOT {pad_on} THEN 'disabled'
                    WHEN {pad_cache} THEN paddle_cache_status
                    WHEN NOT force_refresh THEN 'healthy'
                    WHEN {pad_paused} OR paddle_http IN (200, 503)
                      THEN 'healthy'
                    ELSE 'degraded' END AS paddle_status,
               CASE WHEN NOT {pad_on}
                      THEN 'PaddleOCR endpoint not configured or ' ||
                           'disabled (provider=modal)'
                    WHEN {pad_cache} THEN paddle_cache_msg
                    WHEN NOT force_refresh
                      THEN 'Configured (Modal scale-to-zero; not probed) ' ||
                           '· provider=modal'
                    WHEN {pad_paused}
                      THEN 'PaddleOCR endpoint paused (cost-saving mode) ' ||
                           '· provider=modal'
                    WHEN paddle_http IN (200, 503)
                      THEN 'PaddleOCR endpoint operational ' ||
                           '· provider=modal'
                    WHEN paddle_http IS NULL
                      THEN 'Connection error: ' ||
                           left(paddle_probe_err, 100) ||
                           ' · provider=modal'
                    ELSE 'HTTP ' || CAST(paddle_http AS VARCHAR) ||
                         ' · provider=modal' END AS paddle_message,
               CASE WHEN rag_err IS NOT NULL THEN 'unhealthy'
                    WHEN rag_registered THEN 'healthy'
                    ELSE 'degraded' END AS rag_status,
               CASE WHEN NOT db_ok OR {a['sets_unhealthy']}
                      OR {o['sets_unhealthy']} OR {v['sets_unhealthy']}
                    THEN 'unhealthy'
                    WHEN {a['sets_degraded']} OR {o['sets_degraded']}
                      OR {v['sets_degraded']}
                      OR rag_err IS NOT NULL
                      OR (rag_err IS NULL AND NOT rag_registered)
                    THEN 'degraded'
                    ELSE 'healthy' END AS overall_status
        FROM snaps
    """


def synth_resource_probes(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.filter(e < 200).select(
        e.alias("snapshot_id"),
        # exact one-decimal values so %.1f is unambiguous cross-engine
        ((e * 7) % 1000 / F.lit(10.0)).alias("mem_pct"),
        ((e * 13) % 1000 / F.lit(10.0)).alias("disk_pct"),
        (e % 9 != 0).alias("psutil_available"))


SYNTH_RESOURCE_PROBES_SQL = """
    SELECT event_id AS snapshot_id,
           CAST((event_id * 7) % 1000 AS DOUBLE) / 10.0 AS mem_pct,
           CAST((event_id * 13) % 1000 AS DOUBLE) / 10.0 AS disk_pct,
           event_id % 9 <> 0 AS psutil_available
    FROM events WHERE event_id < 200
"""


def resource_gate_sql() -> str:
    warn = (f"concat_ws(', ', "
            f"CASE WHEN mem_pct > {MEM_WARN} THEN 'High memory usage: '"
            f" || printf('%.1f', mem_pct) || '%' END, "
            f"CASE WHEN disk_pct > {DISK_WARN} THEN 'High disk usage: '"
            f" || printf('%.1f', disk_pct) || '%' END)")
    return f"""
        WITH probes AS ({SYNTH_RESOURCE_PROBES_SQL})
        SELECT snapshot_id,
               CASE WHEN NOT psutil_available THEN 'unavailable'
                    WHEN mem_pct > {MEM_WARN} OR disk_pct > {DISK_WARN}
                    THEN 'degraded' ELSE 'healthy' END AS resource_status,
               CASE WHEN NOT psutil_available THEN NULL
                    ELSE {warn} END AS warnings_joined
        FROM probes
    """


_COMPONENTS = ("database", "filesystem", "system_resources",
               "external_services", "application_components")


def synth_components(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    comp = F.lit(_COMPONENTS[0])
    for i, c in enumerate(_COMPONENTS[1:], 1):
        comp = F.when(e % 5 == i, F.lit(c)).otherwise(comp)
    return events.filter(e < 400).select(
        (e / 5).cast("long").alias("snapshot_id"),
        comp.alias("component"),
        F.when((e * 3) % 4 == 0, F.lit("error"))
        .when((e * 3) % 4 == 1, F.lit("degraded"))
        .otherwise(F.lit("healthy")).alias("status"),
        # external_services is a LIST in the reference results dict
        (e % 5 == 3).alias("is_list"))


SYNTH_COMPONENTS_SQL = ("""
    SELECT CAST(event_id // 5 AS BIGINT) AS snapshot_id,
           CASE event_id % 5 """
                        + " ".join(f"WHEN {i} THEN '{c}'"
                                   for i, c in enumerate(_COMPONENTS) if i)
                        + f""" ELSE '{_COMPONENTS[0]}' END AS component,
           CASE (event_id * 3) % 4 WHEN 0 THEN 'error'
                WHEN 1 THEN 'degraded' ELSE 'healthy' END AS status,
           event_id % 5 = 3 AS is_list
    FROM events WHERE event_id < 400
""")


def summary_counts_sql() -> str:
    return f"""
        WITH components AS ({SYNTH_COMPONENTS_SQL})
        SELECT snapshot_id,
               CAST(count(*) AS BIGINT) AS total_checks,
               CAST(sum(CASE WHEN NOT is_list AND status = 'healthy'
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS healthy_checks
        FROM components GROUP BY snapshot_id
    """
