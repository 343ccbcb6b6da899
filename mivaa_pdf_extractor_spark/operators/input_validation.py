"""Input-validation framework folds (security scan, sanitize,
structure limits, schema-registry lookup, profiles, error taxonomy).

Reference: ``app/core/validation/`` —

- ``validators.py:274-327`` SecurityValidator._scan_for_threats /
  _check_string_threats: every blocked pattern findall'd per string
  (IGNORECASE|DOTALL, config.py:75-86), violations carry the pattern,
  the first 5 matches and the total count; the request fails when any
  violation exists with "Security threat detected: N violation(s)
  found" (:248-259).
- ``validators.py:375-403`` _sanitize_string: the non-aggressive
  branch applies the 5-step HTML escape once per blocked pattern
  WITHOUT checking whether the pattern matched, and replaces ``&``
  LAST — so every earlier-introduced entity is re-escaped each pass:
  after the 10-pattern loop an original ``<`` is ``&`` + ``amp;``*10 +
  ``lt;``. Pinned verbatim. Aggressive mode subs each pattern with ''
  sequentially.
- ``validators.py:423-533`` StructureValidator: depth violation uses
  the computed max depth, array-length violations are collected in
  pre-order with the exact f-string, all joined with '; '.
- ``registry.py:22-89,173-260,337-402`` EndpointPattern + lookup:
  wildcard patterns are re.escape'd then ``\\*`` -> ``[^/]*`` and
  anchored both ends; regex patterns are compiled raw and matched with
  ``.match`` (start-anchored ONLY). Lookup ladder: exact
  ``METHOD:endpoint`` dict hit (LAST registration wins the dict slot;
  a disabled hit falls through) -> exact ``*:endpoint`` -> linear
  candidate scan. The scan order is _method_registrations[method] then
  _method_registrations['*'] — and register() appends every
  method-specific registration to the '*' list too (:241-243), so the
  comment "sorted by priority" is false: ``priority`` is only used to
  sort ``self._registrations``, which lookup never reads. First
  matching candidate in REGISTRATION order wins. Pinned.
- ``errors.py:20-365`` taxonomy: error_code =
  ``VALIDATION_<TYPE.upper()>``; per-class (type, severity, status)
  table; handler message rules (pydantic single-field vs N-fields,
  HTTP status->type mapping with internal_error default,
  ``message[:max-3] + '...'`` truncation, errors.py:527-540).
- ``config.py:395-487`` production/development profiles vs field
  defaults, pinned as a constants table.

Scale: pure per-row Column logic (regexes stay in the JVM); the
registry lookup broadcasts the registration table against the request
stream — no shuffle on the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# config.py:40-53 — pinned behavior-table data (order matters: the
# sanitize cascade and candidate scans iterate in this order).
BLOCKED_PATTERNS = (
    r"<script[^>]*>.*?</script>",
    r"javascript:",
    r"data:text/html",
    r"vbscript:",
    r"on\w+\s*=",
    r"expression\s*\(",
    r"@import",
    r"<iframe[^>]*>",
    r"<object[^>]*>",
    r"<embed[^>]*>",
)

# errors.py:134-365 — (error_type, severity, status_code) per class;
# error_code is always VALIDATION_<type.upper()> (errors.py:82).
ERROR_TAXONOMY = {
    "schema_validation": ("medium", 422),
    "security_violation": ("high", 403),
    "rate_limit_exceeded": ("medium", 429),
    "request_too_large": ("medium", 413),
    "invalid_content_type": ("medium", 415),
    "json_structure_invalid": ("medium", 422),
    "timeout": ("high", 408),
    "internal_error": ("medium", 500),
    "configuration_error": ("critical", 500),
}

# errors.py:495-507 — HTTP status -> error type; others internal_error
HTTP_STATUS_TO_TYPE = {
    400: "schema_validation",
    403: "security_violation",
    408: "timeout",
    413: "request_too_large",
    415: "invalid_content_type",
    422: "schema_validation",
    429: "rate_limit_exceeded",
}

# config.py field defaults + create_production_config /
# create_development_config overrides (:395-487). Flags as 0.0/1.0.
PROFILE_SETTINGS = {
    # setting: (default, production, development)
    "rate_limit_requests": (100, 50, 100),
    "rate_limit_window": (60, 60, 60),
    "max_request_size": (52428800, 26214400, 104857600),
    "max_json_depth": (10, 8, 15),
    "max_array_length": (1000, 500, 2000),
    "cache_ttl": (300, 600, 300),
    "max_cache_size": (1000, 5000, 1000),
    "compression_threshold": (1024, 512, 1024),
    "validation_timeout": (5.0, 3.0, 10.0),
    "slow_request_threshold": (1.0, 0.5, 2.0),
    "metrics_retention_hours": (24, 72, 12),
    "max_error_message_length": (500, 200, 1000),
    "enable_rate_limiting": (1.0, 1.0, 0.0),
    "enable_input_sanitization": (1.0, 1.0, 1.0),
    "enable_caching": (1.0, 1.0, 0.0),
    "enable_compression": (1.0, 1.0, 0.0),
    "async_validation": (0.0, 1.0, 0.0),
    "strict_content_type_checking": (0.0, 1.0, 0.0),
    "include_error_details": (0.0, 0.0, 1.0),
    "allow_unknown_endpoints": (1.0, 0.0, 1.0),
}


def scan_string_threats(strings: DataFrame) -> DataFrame:
    """``strings``: (req_id long, path string, text string). One
    violation row per (string, matching pattern): the pattern source,
    total match count, first 5 matches (validators.py:304-327)."""
    per_pat = F.array(*[
        F.struct(
            F.lit(p).alias("pattern"),
            F.regexp_extract_all(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit("(?is)" + p), F.lit(0)).alias("am"))
        for p in BLOCKED_PATTERNS])
    hits = F.filter(per_pat, lambda x: F.size(x["am"]) > 0)
    return (strings
            .select("req_id", "path", F.explode(hits).alias("v"))
            .select("req_id", "path",
                    F.col("v.pattern").alias("pattern"),
                    F.size(F.col("v.am")).alias("match_count"),
                    F.slice(F.col("v.am"), 1, 5).alias("matches")))


def security_verdict(strings: DataFrame) -> DataFrame:
    """Per-request verdict (validators.py:226-272 + errors.py:134-162):
    any violation => SecurityValidationError with the pinned message,
    VALIDATION_SECURITY_VIOLATION / high / 403."""
    counts = (scan_string_threats(strings)
              .groupBy("req_id")
              .agg(F.count(F.lit(1)).alias("violation_count")))
    reqs = strings.select("req_id").distinct()
    j = reqs.join(counts, "req_id", "left")
    n = F.coalesce(F.col("violation_count"), F.lit(0))
    unsafe = n > 0
    return j.select(
        "req_id",
        (~unsafe).alias("safe"),
        n.alias("violation_count"),
        F.when(unsafe, F.concat(
            F.lit("Security threat detected: "), n.cast("string"),
            F.lit(" violation(s) found"))).alias("message"),
        F.when(unsafe, F.lit("security_violation")).alias("error_type"),
        F.when(unsafe, F.lit("VALIDATION_SECURITY_VIOLATION"))
        .alias("error_code"),
        F.when(unsafe, F.lit("high")).alias("severity"),
        F.when(unsafe, F.lit(403)).otherwise(F.lit(0))
        .alias("status_code"))


def sanitize_strings(strings: DataFrame) -> DataFrame:
    """Both sanitize modes (validators.py:375-403). Non-aggressive
    pins the per-pattern re-escape cascade (ampersand replaced LAST,
    loop runs for every pattern regardless of match); aggressive subs
    each pattern with '' in declaration order."""
    esc = F.coalesce(F.col("text"), F.lit(""))
    for _ in BLOCKED_PATTERNS:
        esc = F.replace(esc, F.lit("<"), F.lit("&lt;"))
        esc = F.replace(esc, F.lit(">"), F.lit("&gt;"))
        esc = F.replace(esc, F.lit('"'), F.lit("&quot;"))
        esc = F.replace(esc, F.lit("'"), F.lit("&#x27;"))
        esc = F.replace(esc, F.lit("&"), F.lit("&amp;"))
    agg = F.coalesce(F.col("text"), F.lit(""))
    for p in BLOCKED_PATTERNS:
        agg = F.regexp_replace(agg, "(?is)" + p, "")
    return strings.select(
        "req_id", "path",
        esc.alias("sanitized_escaped"),
        agg.alias("sanitized_aggressive"))


def validate_structure(nodes: DataFrame, max_depth: int,
                       max_array_length: int) -> DataFrame:
    """``nodes``: flattened JSON tree rows (req_id long, ord int —
    pre-order position, path string, is_array boolean, depth int,
    array_len int). Per request (validators.py:423-533): the depth
    violation (computed max depth vs limit) first, then array-length
    violations in traversal order, '; '-joined into the
    JSONStructureError message."""
    arr_msg = F.when(
        F.col("is_array") & (F.col("array_len") > max_array_length),
        F.concat(F.lit("Array at '"), F.col("path"),
                 F.lit("' has length "),
                 F.col("array_len").cast("string"),
                 F.lit(f", exceeds limit of {max_array_length}")))
    per_req = (nodes
               .select("req_id", "ord", "depth", arr_msg.alias("am"))
               .groupBy("req_id")
               .agg(F.max("depth").alias("max_depth"),
                    F.filter(
                        F.array_sort(F.collect_list(
                            F.struct(F.col("ord").alias("o"),
                                     F.col("am").alias("m")))),
                        lambda x: x["m"].isNotNull())
                    .alias("arr_structs")))
    depth_msg = F.when(
        F.col("max_depth") > max_depth,
        F.concat(F.lit("JSON depth "),
                 F.col("max_depth").cast("string"),
                 F.lit(f" exceeds limit of {max_depth}")))
    arr_msgs = F.transform(F.col("arr_structs"), lambda x: x["m"])
    all_msgs = F.filter(
        F.concat(F.array(depth_msg), arr_msgs),
        lambda m: m.isNotNull())
    invalid = F.size(all_msgs) > 0
    reason = F.array_join(all_msgs, "; ")
    return per_req.select(
        "req_id", "max_depth",
        (~invalid).alias("valid"),
        F.when(invalid, reason).alias("violation_reason"),
        F.when(invalid, F.concat(
            F.lit("JSON structure validation failed: "), reason))
        .alias("message"),
        F.when(invalid, F.lit("VALIDATION_JSON_STRUCTURE_INVALID"))
        .alias("error_code"),
        F.when(invalid, F.lit(422)).otherwise(F.lit(0))
        .alias("status_code"))


def registry_lookup(registrations: DataFrame,
                    requests: DataFrame) -> DataFrame:
    """``registrations``: (reg_seq long — registration order, pattern
    string, method string — already upper or '*', is_regex boolean,
    priority int, enabled boolean). ``requests``: (req_id long,
    endpoint string, method string).

    Reproduces ValidationRegistry.lookup (registry.py:337-402)
    including the ignored-priority pin: the pattern scan takes the
    FIRST match in registration order (method-specific list, then the
    '*' list which register() fills with every registration), never
    the priority sort. Disabled exact-dict hits fall through to the
    next tier. Output: (req_id, matched_reg long — -1 when none,
    match_tier exact|wildcard_exact|pattern|none)."""
    regs = F.broadcast(registrations)
    reqm = requests.select(
        "req_id", "endpoint", F.upper(F.col("method")).alias("m"))

    # exact dict: eligible regs keyed METHOD:pattern, last-write wins
    eligible = regs.where(~F.col("is_regex")
                          & ~F.col("pattern").contains("*"))
    wd = Window.partitionBy("method", "pattern").orderBy(
        F.col("reg_seq").desc())
    exact = (eligible.withColumn("_rn", F.row_number().over(wd))
             .where(F.col("_rn") == 1)
             .select(F.col("method").alias("e_method"),
                     F.col("pattern").alias("e_pattern"),
                     F.col("reg_seq").alias("e_seq"),
                     F.col("enabled").alias("e_enabled")))
    t1 = (reqm.join(F.broadcast(exact),
                    (F.col("e_method") == F.col("m"))
                    & (F.col("e_pattern") == F.col("endpoint")),
                    "left")
          .select("req_id", "endpoint", "m",
                  F.when(F.col("e_enabled"), F.col("e_seq"))
                  .alias("t1_seq")))
    t2 = (t1.join(F.broadcast(exact.where(F.col("e_method") == "*")
                              .withColumnRenamed("e_seq", "w_seq")
                              .withColumnRenamed("e_enabled",
                                                 "w_enabled")),
                  F.col("e_pattern") == F.col("endpoint"), "left")
          .select("req_id", "endpoint", "m", "t1_seq",
                  F.when(F.col("w_enabled"), F.col("w_seq"))
                  .alias("t2_seq")))

    # candidate scan: (tier 0 = method-specific list, tier 1 = the '*'
    # list that register() fills with EVERY registration), reg order
    rx = F.when(
        F.col("is_regex"),
        F.concat(F.lit("^(?:"), F.col("pattern"), F.lit(")"))
    ).otherwise(F.concat(
        F.lit("^"),
        F.replace(F.replace(F.col("pattern"), F.lit("."),
                            F.lit(r"\.")),
                  F.lit("*"), F.lit("[^/]*")),
        F.lit("$")))
    cand = regs.where(F.col("enabled")).select(
        "reg_seq", "pattern", "method", rx.alias("rx"))
    scan = (reqm.join(F.broadcast(cand),
                      ((F.col("method") == "*")
                       | (F.col("method") == F.col("m")))
                      & F.regexp_like(F.col("endpoint"),
                                      F.col("rx"))))
    # tier 0 rows exist only for method-specific regs of this method;
    # tier 1 rows for every reg (the '*' list)
    t0 = (scan.where((F.col("method") != "*")
                     & (F.col("method") == F.col("m")))
          .select("req_id", F.lit(0).alias("tier"), "reg_seq"))
    tstar = scan.select("req_id", F.lit(1).alias("tier"), "reg_seq")
    wp = Window.partitionBy("req_id").orderBy("tier", "reg_seq")
    best_pat = (t0.unionByName(tstar)
                .withColumn("_rn", F.row_number().over(wp))
                .where(F.col("_rn") == 1)
                .select("req_id", F.col("reg_seq").alias("p_seq")))
    out = t2.join(best_pat, "req_id", "left")
    return out.select(
        "req_id",
        F.coalesce(F.col("t1_seq"), F.col("t2_seq"), F.col("p_seq"),
                   F.lit(-1)).alias("matched_reg"),
        F.when(F.col("t1_seq").isNotNull(), F.lit("exact"))
        .when(F.col("t2_seq").isNotNull(), F.lit("wildcard_exact"))
        .when(F.col("p_seq").isNotNull(), F.lit("pattern"))
        .otherwise(F.lit("none")).alias("match_tier"))


def validation_profiles(spark) -> DataFrame:
    """Pinned profile constants (config.py:395-487 + field defaults)
    as (profile, setting, value) rows."""
    rows = []
    for setting, (d, p, v) in PROFILE_SETTINGS.items():
        rows += [("default", setting, float(d)),
                 ("production", setting, float(p)),
                 ("development", setting, float(v))]
    return spark.createDataFrame(
        rows, "profile string, setting string, value double")


def error_responses(events: DataFrame, *, include_details: bool =
                    False, max_message_length: int = 500) -> DataFrame:
    """ValidationErrorHandler ladder (errors.py:385-540) over error
    events: (event_id long, kind string in
    pydantic|http|generic|typed, status_code int, detail string,
    field_paths array<string>, field_msgs array<string>,
    exc_message string, error_type string).

    - pydantic: 1 field -> "Validation failed for field 'X': msg",
      else "Validation failed for N fields"; schema_validation / 422.
    - http: status mapped through HTTP_STATUS_TO_TYPE (default
      internal_error), message = detail, status preserved.
    - generic: "Internal validation error: <msg>", internal_error,
      CRITICAL severity, 500.
    - typed: the per-class taxonomy row for ``error_type``.
    Every message is truncated to ``max_message_length`` via
    ``msg[:max-3] + '...'``."""
    tax_rows = [(t, s, c) for t, (s, c) in ERROR_TAXONOMY.items()]
    spark = events.sparkSession
    tax = F.broadcast(spark.createDataFrame(
        tax_rows, "t_type string, t_sev string, t_status int"))
    http_map = F.create_map(*[
        F.lit(x) for kv in HTTP_STATUS_TO_TYPE.items() for x in kv])
    nf = F.size(F.coalesce(F.col("field_paths"),
                           F.array().cast("array<string>")))
    pyd_msg = F.when(nf == 1, F.concat(
        F.lit("Validation failed for field '"),
        F.element_at("field_paths", 1), F.lit("': "),
        F.element_at("field_msgs", 1))).otherwise(
        F.concat(F.lit("Validation failed for "), nf.cast("string"),
                 F.lit(" fields")))
    etype = (
        F.when(F.col("kind") == "pydantic", F.lit("schema_validation"))
        .when(F.col("kind") == "http",
              F.coalesce(F.element_at(http_map, F.col("status_code")),
                         F.lit("internal_error")))
        .when(F.col("kind") == "generic", F.lit("internal_error"))
        .otherwise(F.col("error_type")))
    raw_msg = (
        F.when(F.col("kind") == "pydantic", pyd_msg)
        .when(F.col("kind") == "http", F.col("detail"))
        .when(F.col("kind") == "generic",
              F.concat(F.lit("Internal validation error: "),
                       F.coalesce(F.col("exc_message"), F.lit(""))))
        .otherwise(F.col("detail")))
    msg = F.when(
        F.length(raw_msg) <= max_message_length, raw_msg
    ).otherwise(F.concat(
        F.substring(raw_msg, 1, max_message_length - 3), F.lit("...")))
    base = events.select(
        "event_id", "kind", etype.alias("error_type"),
        msg.alias("message"),
        F.col("status_code").alias("in_status"))
    j = base.join(tax, base["error_type"] == tax["t_type"], "left")
    status = (
        F.when(F.col("kind") == "http", F.col("in_status"))
        .when(F.col("kind") == "generic", F.lit(500))
        .when(F.col("kind") == "pydantic", F.lit(422))
        .otherwise(F.col("t_status")))
    # handle_pydantic_error / handle_http_exception build a BASE
    # ValidationError and never pass severity, so those land on the
    # MEDIUM default even when the mapped type's own class would be
    # high (errors.py:421-461 vs :156) — pinned.
    sev = (F.when(F.col("kind") == "generic", F.lit("critical"))
           .when(F.col("kind").isin("http", "pydantic"),
                 F.lit("medium"))
           .otherwise(F.col("t_sev")))
    return j.select(
        "event_id", "kind", "error_type",
        F.concat(F.lit("VALIDATION_"),
                 F.upper(F.col("error_type"))).alias("error_code"),
        sev.alias("severity"),
        status.cast("int").alias("status_code"),
        "message")


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

SECURITY_TEXTS = (
    "hello & 'world' \"q\" <tag> plain",
    "x <script a=b>\nalert(1)\n</script> y <script>2</script> z",
    "click onclick = go() and onmouseover=x now",
    "style expression ( evil ) with @import url(x)",
    "JaVaScRiPt: data:text/html vbscript: stuff",
    "<iframe src=1> <object data=1> <embed x=2>",
    "",
    "onA= onB = onC= onD= onE= onF= onG=",
)

PATHS = ("body.title", "body.content[0]", "headers.x-meta[key]")


def _sql_lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def synth_security_strings(docs):
    from pyspark.sql import functions as F  # noqa: F811
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = d.select("doc", F.explode(F.sequence(
        F.lit(0), F.lit(2))).alias("i"))
    h = F.col("doc") * 13 + F.col("i") * 7
    return rows.select(
        F.col("doc").alias("req_id"),
        F.element_at(F.array(*[F.lit(p) for p in PATHS]),
                     (F.col("i") + 1).cast("int")).alias("path"),
        F.element_at(F.array(*[F.lit(t) for t in SECURITY_TEXTS]),
                     (h % len(SECURITY_TEXTS) + 1).cast("int"))
        .alias("text"))


DUCK_SECURITY_STRINGS_SQL = f"""
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
vstr AS (
  SELECT doc AS req_id,
         (['body.title','body.content[0]','headers.x-meta[key]'])
           [CAST(i AS INT) + 1] AS path,
         ([{', '.join(_sql_lit(t) for t in SECURITY_TEXTS)}])
           [CAST((doc*13 + i*7) % {len(SECURITY_TEXTS)} AS INT) + 1]
           AS text
  FROM docs, (SELECT unnest(generate_series(0, 2)) AS i))"""


def _duck_scan_sql() -> str:
    pats = ",\n    ".join(
        f"({i}, {_sql_lit(p)}, {_sql_lit('(?is)' + p)})"
        for i, p in enumerate(BLOCKED_PATTERNS))
    return f"""
pats(pidx, pattern, rx) AS (VALUES
    {pats}),
vhits AS (
  SELECT s.req_id, s.path, p.pattern,
         regexp_extract_all(COALESCE(s.text, ''), p.rx, 0) AS am
  FROM vstr s, pats p),
vviol AS (
  SELECT req_id, path, pattern,
         len(am) AS match_count,
         list_slice(am, 1, 5) AS matches
  FROM vhits WHERE len(am) > 0)"""


def _duck_sanitize_sql() -> str:
    esc = "COALESCE(text, '')"
    for _ in BLOCKED_PATTERNS:
        for a, b in (("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"),
                     ("'", "&#x27;"), ("&", "&amp;")):
            esc = f"replace({esc}, {_sql_lit(a)}, {_sql_lit(b)})"
    agg = "COALESCE(text, '')"
    for p in BLOCKED_PATTERNS:
        agg = (f"regexp_replace({agg}, {_sql_lit('(?is)' + p)},"
               f" '', 'g')")
    return f"""
vsan AS (
  SELECT req_id, path,
         {esc} AS sanitized_escaped,
         {agg} AS sanitized_aggressive
  FROM vstr)"""


def synth_structure_nodes(docs):
    from pyspark.sql import functions as F  # noqa: F811
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = d.select("doc", F.explode(F.sequence(
        F.lit(0), (F.col("doc") % 3 + 3).cast("int"))).alias("i"))
    paths = ["root", "a.b", "a.items[2]", "c[0].d", "e", "f.g"]
    return rows.select(
        F.col("doc").alias("req_id"),
        F.col("i").cast("int").alias("ord"),
        F.element_at(F.array(*[F.lit(p) for p in paths]),
                     (F.col("i") + 1).cast("int")).alias("path"),
        ((F.col("doc") + F.col("i")) % 3 == 0).alias("is_array"),
        ((F.col("doc") * 3 + F.col("i") * 5) % 13).cast("int")
        .alias("depth"),
        ((F.col("doc") * 37 + F.col("i") * 211) % 1500).cast("int")
        .alias("array_len"))


DUCK_STRUCTURE_SQL = """
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
vnodes AS (
  SELECT doc AS req_id, CAST(i AS INT) AS ord,
         (['root','a.b','a.items[2]','c[0].d','e','f.g'])
           [CAST(i AS INT) + 1] AS path,
         (doc + i) % 3 = 0 AS is_array,
         CAST((doc*3 + i*5) % 13 AS INT) AS depth,
         CAST((doc*37 + i*211) % 1500 AS INT) AS array_len
  FROM docs, LATERAL (SELECT unnest(generate_series(0, doc % 3 + 3))
                      AS i)),
vmsgs AS (
  SELECT req_id, ord,
         CASE WHEN is_array AND array_len > 1000 THEN
           'Array at ''' || path || ''' has length '
           || CAST(array_len AS VARCHAR) || ', exceeds limit of 1000'
         END AS am, depth
  FROM vnodes),
vagg AS (
  SELECT req_id, max(depth) AS max_depth,
         list_filter(array_agg(am ORDER BY ord), m -> m IS NOT NULL)
           AS arr_msgs
  FROM vmsgs GROUP BY req_id),
vstruct AS (
  SELECT req_id, max_depth,
         len(msgs) = 0 AS valid,
         CASE WHEN len(msgs) > 0
              THEN array_to_string(msgs, '; ') END AS violation_reason,
         CASE WHEN len(msgs) > 0
              THEN 'JSON structure validation failed: '
                   || array_to_string(msgs, '; ') END AS message,
         CASE WHEN len(msgs) > 0
              THEN 'VALIDATION_JSON_STRUCTURE_INVALID' END
           AS error_code,
         CASE WHEN len(msgs) > 0 THEN 422 ELSE 0 END AS status_code
  FROM (SELECT req_id, max_depth,
               CASE WHEN max_depth > 10
                 THEN ['JSON depth ' || CAST(max_depth AS VARCHAR)
                       || ' exceeds limit of 10'] || arr_msgs
                 ELSE arr_msgs END AS msgs
        FROM vagg))"""

# (reg_seq, pattern, method, is_regex, priority, enabled) — covers:
# exact override + disabled fall-through, wildcard-method exact,
# wildcard + regex patterns (regex start-anchored only), and the
# ignored-priority pin (seq 9 prio 100 loses to seq 6 prio 0 because
# lookup scans in registration order).
REGISTRATIONS = (
    (0, "/api/v1/docs", "GET", False, 0, True),
    (1, "/api/v1/docs", "GET", False, 0, False),
    (2, "/api/v1/docs", "*", False, 0, True),
    (3, "/api/*/users", "GET", False, 0, True),
    (4, "/api/v[0-9]+/items", "GET", True, 0, True),
    (5, "/api/*/users", "POST", False, 50, True),
    (6, "/api/*", "*", False, 0, True),
    (7, "/api/v1/special", "GET", False, 100, True),
    (8, "/api/*/special*", "GET", False, 100, True),
    (9, "/api/x*", "*", False, 100, True),
)

REQUEST_CASES = (
    ("/api/v1/docs", "GET"),
    ("/api/v1/docs", "get"),
    ("/api/v9/users", "GET"),
    ("/api/v2/items/extra", "GET"),
    ("/api/v1/special2", "GET"),
    ("/api/xyz", "PUT"),
    ("/nomatch", "GET"),
    ("/api/v9/users", "POST"),
    ("/api/v1/special", "GET"),
)


def synth_registrations(spark):
    return spark.createDataFrame(
        list(REGISTRATIONS),
        "reg_seq long, pattern string, method string, "
        "is_regex boolean, priority int, enabled boolean")


def synth_registry_requests(docs):
    from pyspark.sql import functions as F  # noqa: F811
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    eps = F.array(*[F.lit(e) for e, _ in REQUEST_CASES])
    ms = F.array(*[F.lit(m) for _, m in REQUEST_CASES])
    idx = (F.col("doc") % len(REQUEST_CASES) + 1).cast("int")
    return d.select(F.col("doc").alias("req_id"),
                    F.element_at(eps, idx).alias("endpoint"),
                    F.element_at(ms, idx).alias("method"))


def _duck_registry_sql() -> str:
    regs = ",\n    ".join(
        f"({s}, {_sql_lit(p)}, {_sql_lit(m)}, {str(r).upper()}, "
        f"{pr}, {str(e).upper()})"
        for s, p, m, r, pr, e in REGISTRATIONS)
    eps = ", ".join(_sql_lit(e) for e, _ in REQUEST_CASES)
    ms = ", ".join(_sql_lit(m) for _, m in REQUEST_CASES)
    n = len(REQUEST_CASES)
    return f"""
regs(reg_seq, pattern, method, is_regex, priority, enabled) AS (VALUES
    {regs}),
vreqs AS (
  SELECT doc AS req_id,
         ([{eps}])[CAST(doc % {n} AS INT) + 1] AS endpoint,
         upper(([{ms}])[CAST(doc % {n} AS INT) + 1]) AS m
  FROM docs),
rex AS (
  SELECT method, pattern, reg_seq, enabled FROM (
    SELECT *, row_number() OVER (PARTITION BY method, pattern
                                 ORDER BY reg_seq DESC) AS rn
    FROM regs WHERE NOT is_regex AND NOT contains(pattern, '*'))
  WHERE rn = 1),
rcand AS (
  SELECT reg_seq, method,
         CASE WHEN is_regex THEN '^(?:' || pattern || ')'
              ELSE '^' || replace(replace(pattern, '.', '\\.'),
                                  '*', '[^/]*') || '$' END AS rx
  FROM regs WHERE enabled),
rt1 AS (
  SELECT q.req_id, q.endpoint, q.m,
         CASE WHEN e.enabled THEN e.reg_seq END AS t1_seq
  FROM vreqs q LEFT JOIN rex e
    ON e.method = q.m AND e.pattern = q.endpoint),
rt2 AS (
  SELECT t.*, CASE WHEN w.enabled THEN w.reg_seq END AS t2_seq
  FROM rt1 t LEFT JOIN (SELECT * FROM rex WHERE method = '*') w
    ON w.pattern = t.endpoint),
rscan AS (
  SELECT q.req_id, c.reg_seq, c.method
  FROM vreqs q JOIN rcand c
    ON (c.method = '*' OR c.method = q.m)
       AND regexp_matches(q.endpoint, c.rx)),
rtiers AS (
  SELECT req_id, 0 AS tier, reg_seq FROM rscan
  WHERE method != '*'
  UNION ALL
  SELECT req_id, 1 AS tier, reg_seq FROM rscan),
rbest AS (
  SELECT req_id, reg_seq AS p_seq FROM rtiers
  QUALIFY row_number() OVER (PARTITION BY req_id
                             ORDER BY tier, reg_seq) = 1),
rlookup AS (
  SELECT t.req_id,
         COALESCE(t.t1_seq, t.t2_seq, b.p_seq, -1) AS matched_reg,
         CASE WHEN t.t1_seq IS NOT NULL THEN 'exact'
              WHEN t.t2_seq IS NOT NULL THEN 'wildcard_exact'
              WHEN b.p_seq IS NOT NULL THEN 'pattern'
              ELSE 'none' END AS match_tier
  FROM rt2 t LEFT JOIN rbest b ON t.req_id = b.req_id)"""


ERROR_TYPES = tuple(ERROR_TAXONOMY)


def synth_error_events(docs):
    from pyspark.sql import functions as F  # noqa: F811
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    kind = F.element_at(F.array(
        F.lit("pydantic"), F.lit("http"), F.lit("generic"),
        F.lit("typed")), (F.col("doc") % 4 + 1).cast("int"))
    status = F.element_at(F.array(*[
        F.lit(s) for s in (400, 403, 408, 413, 415, 422, 429, 418,
                           500)]), (F.col("doc") % 9 + 1).cast("int"))
    detail = F.when(F.col("doc") % 5 == 0, F.repeat(F.lit("d"), 600)) \
        .otherwise(F.concat(F.lit("Detail message "),
                            (F.col("doc") % 7).cast("string")))
    m = F.col("doc") % 3
    fp = (F.when(m == 0, F.array(F.lit("body.name")))
          .when(m == 1, F.array(F.lit("a"), F.lit("b")))
          .otherwise(F.array().cast("array<string>")))
    fm = (F.when(m == 0, F.array(F.lit("field required")))
          .when(m == 1, F.array(F.lit("m1"), F.lit("m2")))
          .otherwise(F.array().cast("array<string>")))
    et = F.element_at(F.array(*[F.lit(t) for t in ERROR_TYPES]),
                      (F.col("doc") % len(ERROR_TYPES) + 1)
                      .cast("int"))
    return d.select(
        F.col("doc").alias("event_id"), kind.alias("kind"),
        status.cast("int").alias("status_code"),
        detail.alias("detail"), fp.alias("field_paths"),
        fm.alias("field_msgs"),
        F.concat(F.lit("boom "), (F.col("doc") % 5).cast("string"))
        .alias("exc_message"), et.alias("error_type"))


def _duck_errors_sql() -> str:
    tax = ",\n    ".join(
        f"({_sql_lit(t)}, {_sql_lit(s)}, {c})"
        for t, (s, c) in ERROR_TAXONOMY.items())
    hmap = " ".join(f"WHEN {k} THEN {_sql_lit(v)}"
                    for k, v in HTTP_STATUS_TO_TYPE.items())
    ets = ", ".join(_sql_lit(t) for t in ERROR_TYPES)
    return f"""
vtax(t_type, t_sev, t_status) AS (VALUES
    {tax}),
vevents AS (
  SELECT doc AS event_id,
         (['pydantic','http','generic','typed'])
           [CAST(doc % 4 AS INT) + 1] AS kind,
         ([400,403,408,413,415,422,429,418,500])
           [CAST(doc % 9 AS INT) + 1] AS status_code,
         CASE WHEN doc % 5 = 0 THEN repeat('d', 600)
              ELSE 'Detail message ' || CAST(doc % 7 AS VARCHAR) END
           AS detail,
         CASE CAST(doc % 3 AS INT) WHEN 0 THEN ['body.name']
              WHEN 1 THEN ['a','b']
              ELSE CAST([] AS VARCHAR[]) END AS field_paths,
         CASE CAST(doc % 3 AS INT) WHEN 0 THEN ['field required']
              WHEN 1 THEN ['m1','m2']
              ELSE CAST([] AS VARCHAR[]) END AS field_msgs,
         'boom ' || CAST(doc % 5 AS VARCHAR) AS exc_message,
         ([{ets}])[CAST(doc % {len(ERROR_TYPES)} AS INT) + 1]
           AS error_type
  FROM docs),
vresp AS (
  SELECT e.event_id, e.kind,
         etype AS error_type,
         'VALIDATION_' || upper(etype) AS error_code,
         CASE WHEN e.kind = 'generic' THEN 'critical'
              WHEN e.kind IN ('http', 'pydantic') THEN 'medium'
              ELSE x.t_sev END AS severity,
         CAST(CASE WHEN e.kind = 'http' THEN e.status_code
              WHEN e.kind = 'generic' THEN 500
              WHEN e.kind = 'pydantic' THEN 422
              ELSE x.t_status END AS INT) AS status_code,
         CASE WHEN length(raw_msg) <= 500 THEN raw_msg
              ELSE substr(raw_msg, 1, 497) || '...' END AS message
  FROM (
    SELECT *,
      CASE WHEN kind = 'pydantic' THEN 'schema_validation'
           WHEN kind = 'http' THEN
             COALESCE(CASE status_code {hmap} END, 'internal_error')
           WHEN kind = 'generic' THEN 'internal_error'
           ELSE error_type END AS etype,
      CASE WHEN kind = 'pydantic' THEN
             CASE WHEN len(field_paths) = 1
               THEN 'Validation failed for field ''' || field_paths[1]
                    || ''': ' || field_msgs[1]
               ELSE 'Validation failed for '
                    || CAST(len(field_paths) AS VARCHAR) || ' fields'
             END
           WHEN kind = 'http' THEN detail
           WHEN kind = 'generic'
             THEN 'Internal validation error: '
                  || COALESCE(exc_message, '')
           ELSE detail END AS raw_msg
    FROM vevents) e
  LEFT JOIN vtax x ON x.t_type = e.etype)"""
