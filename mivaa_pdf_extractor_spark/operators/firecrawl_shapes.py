"""Firecrawl client request/retry shaping
(app/services/integrations/firecrawl_client.py:186-268).

The HTTP call is out of scope; the request body and retry
classification are deterministic (file:line):

* ``_build_request`` (:186-230): field hints join only properties
  WITH descriptions ("name: desc" comma-joined); the prompt is
  "Extract the following fields from the page: {hints}." plus the
  caller prompt space-joined when truthy; timeout 60000 ms under JS
  render else 30000; a 3000 ms wait action ONLY under JS render; the
  v2 quirk (structured extraction inside ``formats`` as
  {type: json}, never a top-level ``extract``) is itself documented
  by the reference as load-bearing.
* ``_call_with_retry`` (:232-268): 200 + success returns; 200 +
  success=false is RETRIED (body-level failure treated like a
  retryable transport error — pin) with the error folded from
  ``result.get('error', 'unknown')``; HTTP in {429, 500, 502, 503,
  504} retries with the body truncated [:200]; any OTHER status
  raises immediately — fail-fast 4xx (pin); delays are
  base·2^attempt with NO sleep after the final attempt (3 attempts →
  sleeps of 1 s and 2 s only — pin).

Both are map-side projections over synthesized attempt streams; the
full backoff-schedule arithmetic is pinned elsewhere
(`retry_schedule` over retry_helper.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_TIMEOUT_MS = 30_000
JS_RENDER_TIMEOUT_MS = 60_000
JS_RENDER_WAIT_MS = 3_000
RETRYABLE = (429, 500, 502, 503, 504)


def build_requests(reqs: DataFrame) -> DataFrame:
    """reqs: (req_id, url, field_names array<string>, field_descs
    array<string> [parallel, '' = no description], extraction_prompt
    nullable, use_js bool, only_main bool)."""
    pairs = F.arrays_zip(F.col("field_names").alias("n"),
                         F.col("field_descs").alias("d"))
    hinted = F.filter(pairs, lambda p: (p.getField("d").isNotNull())
                      & (p.getField("d") != ""))
    hints = F.array_join(
        F.transform(hinted, lambda p: F.concat(
            p.getField("n"), F.lit(": "), p.getField("d"))), ", ")
    base_prompt = F.concat(
        F.lit("Extract the following fields from the page: "), hints,
        F.lit("."))
    prompt = F.when(
        F.col("extraction_prompt").isNotNull()
        & (F.col("extraction_prompt") != ""),
        F.concat(base_prompt, F.lit(" "), F.col("extraction_prompt"))
    ).otherwise(base_prompt)
    return reqs.select(
        "req_id", "url", prompt.alias("prompt"),
        F.when(F.col("use_js"), JS_RENDER_TIMEOUT_MS)
        .otherwise(DEFAULT_TIMEOUT_MS).cast("int").alias("timeout_ms"),
        F.when(F.col("use_js"), JS_RENDER_WAIT_MS).cast("int")
        .alias("wait_action_ms"),
        F.col("only_main").alias("only_main_content"))


def classify_attempts(attempts: DataFrame) -> DataFrame:
    """attempts: (attempt_id, status int nullable [NULL = transport
    timeout], body_success bool, body_error nullable, body_text)."""
    s = F.col("status")
    ok = (s == 200) & F.col("body_success")
    disp = (F.when(ok, "return")
            .when(s.isNull(), "retry")              # timeout
            .when((s == 200) & ~F.col("body_success"), "retry")
            .when(s.isin(*RETRYABLE), "retry")
            .otherwise("raise"))                    # fail-fast 4xx
    err = (F.when(ok, F.lit(None).cast("string"))
           .when(s.isNull(), F.lit("timeout"))
           .when((s == 200) & ~F.col("body_success"),
                 F.concat(F.lit("Firecrawl error: "),
                          F.coalesce(F.col("body_error"),
                                     F.lit("unknown"))))
           .otherwise(F.concat(F.lit("HTTP "), s.cast("string"),
                               F.lit(": "),
                               F.substring("body_text", 1, 200))))
    return attempts.select("attempt_id", disp.alias("disposition"),
                           err.alias("error"))


def synth_build_reqs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        F.concat(F.lit("https://shop/"), (e % 50).cast("string"))
        .alias("url"),
        F.array(F.lit("price"), F.lit("currency"), F.lit("name"))
        .alias("field_names"),
        F.array(F.lit("the visible price"),
                F.when(e % 3 == 0, F.lit("")).otherwise(
                    F.lit("ISO currency")),
                F.when(e % 4 == 0, F.lit(""))
                .otherwise(F.lit("product title"))).alias("field_descs"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("Extract price for item "),
                            (e % 9).cast("string")))
        .alias("extraction_prompt"),
        (e % 2 == 0).alias("use_js"),
        (e % 3 != 0).alias("only_main"))


SYNTH_BUILD_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           'https://shop/' || CAST(event_id % 50 AS VARCHAR) AS url,
           ['price', 'currency', 'name'] AS field_names,
           ['the visible price',
            CASE WHEN event_id % 3 = 0 THEN ''
                 ELSE 'ISO currency' END,
            CASE WHEN event_id % 4 = 0 THEN ''
                 ELSE 'product title' END] AS field_descs,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'Extract price for item '
                     || CAST(event_id % 9 AS VARCHAR) END
               AS extraction_prompt,
           event_id % 2 = 0 AS use_js,
           event_id % 3 <> 0 AS only_main
    FROM events
"""


def build_requests_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_BUILD_SQL}),
        h AS (
          SELECT *,
                 array_to_string(list_transform(list_filter(
                   list_zip(field_names, field_descs),
                   p -> p[2] IS NOT NULL AND p[2] <> ''),
                   p -> p[1] || ': ' || p[2]), ', ') AS hints
          FROM r),
        p AS (
          SELECT *, 'Extract the following fields from the page: '
                    || coalesce(hints, '') || '.' AS base_prompt
          FROM h)
        SELECT req_id, url,
               CASE WHEN extraction_prompt IS NOT NULL
                         AND extraction_prompt <> ''
                    THEN base_prompt || ' ' || extraction_prompt
                    ELSE base_prompt END AS prompt,
               CAST(CASE WHEN use_js THEN {JS_RENDER_TIMEOUT_MS}
                    ELSE {DEFAULT_TIMEOUT_MS} END AS INT)
                   AS timeout_ms,
               CAST(CASE WHEN use_js THEN {JS_RENDER_WAIT_MS} END
                    AS INT) AS wait_action_ms,
               only_main AS only_main_content
        FROM p
    """


def synth_attempts(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("attempt_id"),
        F.when(e % 9 == 0, F.lit(None).cast("int"))
        .when(e % 9 == 1, 200).when(e % 9 == 2, 200)
        .when(e % 9 == 3, 429).when(e % 9 == 4, 503)
        .when(e % 9 == 5, 404).when(e % 9 == 6, 401)
        .when(e % 9 == 7, 500).otherwise(502).alias("status"),
        (e % 9 == 1).alias("body_success"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("rate limited "),
                            (e % 4).cast("string")))
        .alias("body_error"),
        F.concat(F.lit("resp body "), F.repeat(F.lit("z"), 230))
        .alias("body_text"))


SYNTH_ATTEMPTS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS attempt_id,
           CAST(CASE event_id % 9 WHEN 0 THEN NULL WHEN 1 THEN 200
                WHEN 2 THEN 200 WHEN 3 THEN 429 WHEN 4 THEN 503
                WHEN 5 THEN 404 WHEN 6 THEN 401 WHEN 7 THEN 500
                ELSE 502 END AS INT) AS status,
           event_id % 9 = 1 AS body_success,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE 'rate limited ' || CAST(event_id % 4 AS VARCHAR)
           END AS body_error,
           'resp body ' || repeat('z', 230) AS body_text
    FROM events
"""


def classify_sql() -> str:
    retry = ", ".join(str(s) for s in RETRYABLE)
    return f"""
        WITH a AS ({SYNTH_ATTEMPTS_SQL})
        SELECT attempt_id,
               CASE WHEN status = 200 AND body_success THEN 'return'
                    WHEN status IS NULL THEN 'retry'
                    WHEN status = 200 THEN 'retry'
                    WHEN status IN ({retry}) THEN 'retry'
                    ELSE 'raise' END AS disposition,
               CASE WHEN status = 200 AND body_success THEN NULL
                    WHEN status IS NULL THEN 'timeout'
                    WHEN status = 200 THEN 'Firecrawl error: '
                         || coalesce(body_error, 'unknown')
                    ELSE 'HTTP ' || CAST(status AS VARCHAR) || ': '
                         || substring(body_text, 1, 200) END AS error
        FROM a
    """
