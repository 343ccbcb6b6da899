"""Anthropic failure-classification and embedding-to-text folds.

Reference semantics reproduced (the Sentry/API calls themselves are out
of scope; the deterministic shaping is what's pinned):

* ``classify_failures`` — app/services/core/anthropic_error_reporter.py
  :58-100 ``_classify_anthropic_error``: lowercase the message, then walk
  the substring banks IN ORDER — credit_balance (4 phrases) →
  rate_limit ('rate_limit', 'rate limit', '429', 'insufficient_quota')
  → auth ('authentication_error', 'permission_error',
  'invalid api key', '401', '403') → 'other'. These are raw SUBSTRING
  checks: "processed 4290 rows" classifies rate_limit (pin). Sentry
  level is 'error' only for credit_balance, 'warning' otherwise
  (:135-139).

* ``embed_context_build`` — app/services/embeddings/
  embedding_to_text_service.py:86-113: per-aspect vectors go through a
  LIVE ``embeddings.get(key) or []`` ladder (present-NULL and
  present-empty both fold to dimension 0 / empty sample — pin);
  context carries dimension + the first 10 values.

* ``embed_response_fold`` — same file :146-171: the AI reply is parsed
  with ``re.search(r'\\{.*\\}', text, re.DOTALL)`` — GREEDY, so the
  extracted candidate runs from the FIRST '{' to the LAST '}' in the
  whole reply (two JSON objects → one span covering both — pin); no
  match → empty result. Cost (:167-171) = in_tokens × $3/1M +
  out_tokens × $15/1M — kept in integer micro-dollars
  (in×3 + out×15) so the fold sums exactly cross-engine.

Scale: all three are map-side projections (when-chains + regexp) — no
shuffle, no UDF; they run inside the scan's codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CREDIT_BANK = ("credit balance is too low", "credit balance too low",
               "plans & billing", "plans and billing")
RATE_BANK = ("rate_limit", "rate limit", "429", "insufficient_quota")
AUTH_BANK = ("authentication_error", "permission_error",
             "invalid api key", "401", "403")

ASPECTS = ("color", "texture", "material", "style")


def _any_contains(col, bank):
    pred = F.lit(False)
    for phrase in bank:
        pred = pred | F.contains(col, F.lit(phrase))
    return pred


def classify_failures(errors: DataFrame) -> DataFrame:
    """anthropic_error_reporter.py:58-100 + the :135-139 level rule."""
    msg = F.lower(F.coalesce(F.col("error_msg"), F.lit("")))
    cls = (F.when(_any_contains(msg, CREDIT_BANK), "credit_balance")
           .when(_any_contains(msg, RATE_BANK), "rate_limit")
           .when(_any_contains(msg, AUTH_BANK), "auth")
           .otherwise("other"))
    return errors.select(
        "err_id", "service", cls.alias("classification"),
        F.when(cls == "credit_balance", "error").otherwise("warning")
        .alias("level"))


def embed_context_build(images: DataFrame) -> DataFrame:
    """embedding_to_text_service.py:86-113. Input columns
    ``{aspect}_vec array<double>`` (nullable); the ``or []`` ladder is
    LIVE — NULL and [] are identical."""
    cols = ["image_id"]
    for a in ASPECTS:
        vec = F.coalesce(F.col(f"{a}_vec"),
                         F.array().cast("array<double>"))
        cols.append(F.size(vec).cast("int").alias(f"{a}_dim"))
        cols.append(F.array_join(
            F.transform(F.slice(vec, 1, 10),
                        lambda x: x.cast("string")), ",")
            .alias(f"{a}_sample"))
    return images.select(*cols)


def embed_response_fold(responses: DataFrame) -> DataFrame:
    """embedding_to_text_service.py:146-171 — greedy first-{ .. last-}
    candidate + integer micro-dollar cost (in×3 + out×15)."""
    text = F.coalesce(F.col("response_text"), F.lit(""))
    pat = r"(?s)\{.*\}"
    candidate = F.when(text.rlike(pat),
                       F.regexp_extract(text, pat, 0))
    return responses.select(
        "resp_id", candidate.alias("json_candidate"),
        candidate.isNotNull().cast("int").alias("has_json"),
        (F.col("in_tokens") * 3 + F.col("out_tokens") * 15)
        .cast("long").alias("cost_microdollars"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

_MSG_BANK = (
    "Your credit balance is too low to access the Anthropic API. "
    "See Plans & Billing.",
    "Error 429: rate limit exceeded, retry later",
    "authentication_error: invalid x-api-key",
    "connection reset by peer",
    "processed 4290 rows before failure",          # '429' decoy → rate
    "upgrade at /plans-and-billing",               # no phrase → other
    "HTTP 403 Forbidden from proxy",
    "insufficient_quota on org",
    "RATE LIMIT and 401 together",                 # rate wins (order)
    "invalid API key provided",
)

_SERVICES = ("catalog_knowledge_extractor", "embedding_to_text_service",
             "product_spec_vision_extractor")


def synth_failures(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    msg = F.lit(_MSG_BANK[0])
    for i, m in enumerate(_MSG_BANK[1:], 1):
        msg = F.when(e % len(_MSG_BANK) == i, F.lit(m)).otherwise(msg)
    msg = F.when(e % 13 == 0, F.lit(None).cast("string")).otherwise(msg)
    svc = F.lit(_SERVICES[0])
    for i, s in enumerate(_SERVICES[1:], 1):
        svc = F.when(e % 3 == i, F.lit(s)).otherwise(svc)
    return events.select(e.alias("err_id"), svc.alias("service"),
                         msg.alias("error_msg"))


def synth_embeddings(events: DataFrame) -> DataFrame:
    """Per-aspect vectors in exact quarters so string renderings agree
    bit-for-bit across engines; NULL / empty / short / long variants."""
    e = F.col("event_id")
    out = [e.alias("image_id")]
    for i, a in enumerate(ASPECTS):
        n = (e + i * 3) % 4  # 0..3 → sizes 0, 4, 12, 16
        size = n * F.lit(4) + F.when(n >= 2, 4).otherwise(0)
        vec = F.when(
            (e + i) % 5 == 0, F.lit(None).cast("array<double>")
        ).otherwise(
            F.when(size > 0,
                   F.transform(F.sequence(F.lit(1), size.cast("int")),
                               lambda j: (j + e % 7).cast("double") / 4))
            .otherwise(F.array().cast("array<double>")))
        out.append(vec.alias(f"{a}_vec"))
    return events.select(*out)


def synth_responses(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    body = (F.when(e % 5 == 0, F.lit("no json here"))
            .when(e % 5 == 1,
                  F.concat(F.lit('prefix {"a": '), e % 9,
                           F.lit("} suffix")))
            .when(e % 5 == 2,
                  F.concat(F.lit('{"a": 1} and {"b": '), e % 9,
                           F.lit("}")))          # greedy spans both
            .when(e % 5 == 3, F.lit("half open { brace"))
            .otherwise(F.concat(F.lit('{"only": '), e % 9,
                                F.lit("}"))))
    return events.select(
        e.alias("resp_id"), body.alias("response_text"),
        (e % 900).cast("long").alias("in_tokens"),
        (e % 300).cast("long").alias("out_tokens"))


def _msg_case() -> str:
    whens = " ".join(
        "WHEN {} THEN '{}'".format(i, m.replace("'", "''"))
        for i, m in enumerate(_MSG_BANK[1:], 1))
    return ("CASE event_id % {n} {whens} ELSE '{e0}' END"
            .format(n=len(_MSG_BANK), whens=whens,
                    e0=_MSG_BANK[0].replace("'", "''")))


def classify_sql() -> str:
    def bank(phrases):
        return " OR ".join(
            "position('{}' IN msg) > 0".format(p.replace("'", "''"))
            for p in phrases)
    return f"""
        WITH src AS (
          SELECT event_id AS err_id,
                 CASE event_id % 3 WHEN 1 THEN '{_SERVICES[1]}'
                      WHEN 2 THEN '{_SERVICES[2]}'
                      ELSE '{_SERVICES[0]}' END AS service,
                 CASE WHEN event_id % 13 = 0 THEN NULL
                      ELSE {_msg_case()} END AS error_msg
          FROM events
        ), low AS (
          SELECT err_id, service,
                 lower(coalesce(error_msg, '')) AS msg FROM src
        )
        SELECT err_id, service,
               CASE WHEN {bank(CREDIT_BANK)} THEN 'credit_balance'
                    WHEN {bank(RATE_BANK)} THEN 'rate_limit'
                    WHEN {bank(AUTH_BANK)} THEN 'auth'
                    ELSE 'other' END AS classification,
               CASE WHEN {bank(CREDIT_BANK)} THEN 'error'
                    ELSE 'warning' END AS level
        FROM low
    """


def embed_context_sql() -> str:
    per_aspect = []
    for i, a in enumerate(ASPECTS):
        per_aspect.append(f"""
            CASE WHEN (event_id + {i}) % 5 = 0 THEN 0
                 ELSE CAST(((event_id + {i * 3}) % 4) * 4
                      + CASE WHEN (event_id + {i * 3}) % 4 >= 2
                             THEN 4 ELSE 0 END AS INT)
            END AS {a}_dim""")
    selects = []
    for i, a in enumerate(ASPECTS):
        selects.append(f"{a}_dim")
        selects.append(f"""
            coalesce(array_to_string(list_transform(
                generate_series(1, least({a}_dim, 10)),
                j -> CAST(CAST(j + event_id % 7 AS DOUBLE) / 4
                          AS VARCHAR)), ','), '') AS {a}_sample""")
    return f"""
        WITH dims AS (
          SELECT event_id, event_id AS image_id,
                 {', '.join(per_aspect)}
          FROM events
        )
        SELECT image_id, {', '.join(selects)}
        FROM dims
    """


def embed_response_sql() -> str:
    return """
        WITH src AS (
          SELECT event_id AS resp_id,
                 CASE event_id % 5
                      WHEN 0 THEN 'no json here'
                      WHEN 1 THEN 'prefix {"a": '
                           || CAST(event_id % 9 AS VARCHAR) || '} suffix'
                      WHEN 2 THEN '{"a": 1} and {"b": '
                           || CAST(event_id % 9 AS VARCHAR) || '}'
                      WHEN 3 THEN 'half open { brace'
                      ELSE '{"only": '
                           || CAST(event_id % 9 AS VARCHAR) || '}'
                 END AS response_text,
                 CAST(event_id % 900 AS BIGINT) AS in_tokens,
                 CAST(event_id % 300 AS BIGINT) AS out_tokens
          FROM events
        )
        SELECT resp_id,
               CASE WHEN regexp_matches(response_text, '(?s)\\{.*\\}')
                    THEN regexp_extract(response_text,
                                        '(?s)(\\{.*\\})', 1)
               END AS json_candidate,
               CAST(regexp_matches(response_text, '(?s)\\{.*\\}')
                    AS INT) AS has_json,
               CAST(in_tokens * 3 + out_tokens * 15 AS BIGINT)
                   AS cost_microdollars
        FROM src
    """
