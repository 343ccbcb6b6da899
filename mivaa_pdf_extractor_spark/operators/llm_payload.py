"""Anthropic-call helper folds (app/services/core/claude_helper.py) as
native Spark projections — the HTTP call itself is out of scope; the
deterministic request/response shaping is reproduced:

- payload build (:60-160): temperature is included only when NOT None
  AND the model supports it — support is a startswith() check against
  the pinned no-temperature list, so a dated alias like
  'claude-opus-4-8-20260115' also drops it (pin); system is
  TRUTHY-gated ('' omitted); ``payload.update(extra)`` lets extra keys
  OVERRIDE the base payload — an extra {'model': X} replaces the model
  (pin);
- response parse (:115-139): block type defaults to 'text' only when
  the key is ABSENT; usage ints go through int(get(k, 0) or 0) — here
  the ``or`` IS live, so a present-NULL token count folds to 0 (unlike
  the dead .get defaults elsewhere — pin); content None → no blocks;
  model/id default '', stop_reason passes through.

Scale: both folds are map-side array/when-chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MODELS_WITHOUT_TEMPERATURE = ("claude-opus-4-8", "claude-opus-4-6")


def payload_build(calls: DataFrame) -> DataFrame:
    """_build_payload + _model_supports_temperature (:60-160)."""
    no_temp = F.lit(False)
    for m in MODELS_WITHOUT_TEMPERATURE:
        no_temp = no_temp | F.startswith(F.col("model"), F.lit(m))
    inc_temp = F.col("temperature").isNotNull() & ~no_temp
    inc_system = F.col("system").isNotNull() & (F.col("system") != "")
    model_out = F.coalesce(F.col("extra_model"), F.col("model"))
    max_out = F.coalesce(F.col("extra_max_tokens"), F.col("max_tokens"))
    return calls.select(
        "call_id", inc_temp.cast("int").alias("includes_temperature"),
        F.when(inc_temp, F.col("temperature")).alias("temperature_out"),
        inc_system.cast("int").alias("includes_system"),
        model_out.alias("model_out"),
        max_out.cast("long").alias("max_tokens_out"),
        F.col("extra_has_tools").cast("int").alias("includes_tools"))


def response_parse(responses: DataFrame) -> DataFrame:
    """_parse_anthropic_response (:115-139). ``blocks`` is
    array<struct<has_type boolean, btype string, text string,
    name string>>."""
    blocks = F.col("blocks")
    typed = F.transform(
        blocks,
        lambda b: F.when(b["has_type"], b["btype"]).otherwise(
            F.lit("text")))
    texts = F.filter(
        F.transform(blocks, lambda b: b["text"]),
        lambda t: t.isNotNull())
    names = F.filter(
        F.transform(blocks, lambda b: b["name"]),
        lambda n: n.isNotNull())
    tok = (lambda flag, col: F.when(
        F.col(flag), F.coalesce(F.col(col), F.lit(0)))
        .otherwise(F.lit(0)))
    return responses.select(
        "resp_id", F.size(blocks).cast("int").alias("n_blocks"),
        F.try_element_at(typed, F.lit(1)).alias("first_type"),
        F.array_join(typed, ",").alias("block_types"),
        F.array_join(texts, "\n").alias("text_joined"),
        F.array_join(names, ",").alias("tool_names"),
        tok("has_in_tokens", "in_tokens").cast("long")
        .alias("input_tokens"),
        tok("has_out_tokens", "out_tokens").cast("long")
        .alias("output_tokens"),
        F.coalesce(F.col("resp_model"), F.lit("")).alias("model"),
        F.col("stop_reason"))


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

MODEL_BANK = ("claude-opus-4-8", "claude-opus-4-8-20260115",
              "claude-opus-4-6", "claude-sonnet-4-5", "claude-haiku-4-5")


def synth_calls(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    model = F.lit(MODEL_BANK[0])
    for i, m in enumerate(MODEL_BANK[1:], 1):
        model = F.when(e % 5 == i, F.lit(m)).otherwise(model)
    temp = (F.when(e % 4 == 0, F.lit(None).cast("double"))
            .when(e % 4 == 1, F.lit(0.0))
            .otherwise((e % 10).cast("double") / 10))
    system = (F.when((e * 3) % 4 == 0, F.lit(None).cast("string"))
              .when((e * 3) % 4 == 1, F.lit(""))
              .otherwise(F.concat(F.lit("sys-"), e % 3)))
    return events.select(
        e.alias("call_id"), model.alias("model"), temp.alias(
            "temperature"),
        system.alias("system"), F.lit(4096).alias("max_tokens"),
        F.when((e * 7) % 5 == 0,
               F.concat(F.lit("override-"), e % 2))
        .alias("extra_model"),
        F.when((e * 11) % 4 == 0, F.lit(99)).cast("long")
        .alias("extra_max_tokens"),
        ((e * 13) % 3 == 0).alias("extra_has_tools"))


def synth_responses(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    n = (e % 4).cast("int")

    def _block(i):
        has_type = (e + i) % 5 != 0
        is_tool = (e + i) % 3 == 0
        btype = F.when(is_tool, F.lit("tool_use")).otherwise(
            F.lit("text"))
        text = F.when(~is_tool & ((e + i) % 7 != 0),
                      F.concat(F.lit("txt "), (e * 3 + i) % 50))
        name = F.when(is_tool, F.concat(F.lit("tool_"), (e + i) % 4))
        return F.struct(has_type.alias("has_type"),
                        btype.alias("btype"), text.alias("text"),
                        name.alias("name"))

    empty = F.array().cast(
        "array<struct<has_type:boolean,btype:string,text:string,"
        "name:string>>")
    blocks = F.when(n > 0, F.transform(F.sequence(F.lit(0), n - 1),
                                       _block)).otherwise(empty)
    return events.select(
        e.alias("resp_id"), blocks.alias("blocks"),
        ((e * 3) % 5 != 0).alias("has_in_tokens"),
        F.when((e * 7) % 6 == 0, F.lit(None).cast("long"))
        .otherwise((e % 900).cast("long")).alias("in_tokens"),
        ((e * 11) % 4 != 0).alias("has_out_tokens"),
        F.when((e * 13) % 5 == 0, F.lit(None).cast("long"))
        .otherwise((e % 300).cast("long")).alias("out_tokens"),
        F.when(e % 8 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit(MODEL_BANK[0])).alias("resp_model"),
        F.when(e % 6 == 0, F.lit(None).cast("string"))
        .when(e % 6 == 1, F.lit("tool_use"))
        .otherwise(F.lit("end_turn")).alias("stop_reason"))


SYNTH_CALLS_SQL = """
    SELECT event_id AS call_id,
           CASE event_id % 5
                WHEN 1 THEN 'claude-opus-4-8-20260115'
                WHEN 2 THEN 'claude-opus-4-6'
                WHEN 3 THEN 'claude-sonnet-4-5'
                WHEN 4 THEN 'claude-haiku-4-5'
                ELSE 'claude-opus-4-8' END AS model,
           CASE WHEN event_id % 4 = 0 THEN NULL
                WHEN event_id % 4 = 1 THEN 0.0
                ELSE CAST(event_id % 10 AS DOUBLE) / 10 END
               AS temperature,
           CASE WHEN (event_id * 3) % 4 = 0 THEN NULL
                WHEN (event_id * 3) % 4 = 1 THEN ''
                ELSE 'sys-' || CAST(event_id % 3 AS VARCHAR) END
               AS system,
           4096 AS max_tokens,
           CASE WHEN (event_id * 7) % 5 = 0
                THEN 'override-' || CAST(event_id % 2 AS VARCHAR) END
               AS extra_model,
           CAST(CASE WHEN (event_id * 11) % 4 = 0 THEN 99 END
                AS BIGINT) AS extra_max_tokens,
           (event_id * 13) % 3 = 0 AS extra_has_tools
    FROM events
"""

SYNTH_BLOCKS_SQL = """
    SELECT event_id AS resp_id, i.i AS idx,
           (event_id + i.i) % 5 <> 0 AS has_type,
           CASE WHEN (event_id + i.i) % 3 = 0 THEN 'tool_use'
                ELSE 'text' END AS btype,
           CASE WHEN (event_id + i.i) % 3 <> 0
                     AND (event_id + i.i) % 7 <> 0
                THEN 'txt ' || CAST((event_id * 3 + i.i) % 50
                                    AS VARCHAR) END AS text,
           CASE WHEN (event_id + i.i) % 3 = 0
                THEN 'tool_' || CAST((event_id + i.i) % 4 AS VARCHAR)
           END AS name
    FROM events CROSS JOIN (SELECT unnest(range(4)) AS i) i
    WHERE i.i < event_id % 4
"""

SYNTH_RESP_SQL = """
    SELECT event_id AS resp_id,
           (event_id * 3) % 5 <> 0 AS has_in_tokens,
           CASE WHEN (event_id * 7) % 6 = 0 THEN NULL
                ELSE CAST(event_id % 900 AS BIGINT) END AS in_tokens,
           (event_id * 11) % 4 <> 0 AS has_out_tokens,
           CASE WHEN (event_id * 13) % 5 = 0 THEN NULL
                ELSE CAST(event_id % 300 AS BIGINT) END AS out_tokens,
           CASE WHEN event_id % 8 = 0 THEN NULL
                ELSE 'claude-opus-4-8' END AS resp_model,
           CASE WHEN event_id % 6 = 0 THEN NULL
                WHEN event_id % 6 = 1 THEN 'tool_use'
                ELSE 'end_turn' END AS stop_reason
    FROM events
"""


def payload_build_sql() -> str:
    no_temp = " OR ".join(f"starts_with(model, '{m}')"
                          for m in MODELS_WITHOUT_TEMPERATURE)
    return f"""
        WITH c AS ({SYNTH_CALLS_SQL})
        SELECT call_id,
               CAST(temperature IS NOT NULL AND NOT ({no_temp})
                    AS INT) AS includes_temperature,
               CASE WHEN temperature IS NOT NULL AND NOT ({no_temp})
                    THEN temperature END AS temperature_out,
               CAST(system IS NOT NULL AND system <> '' AS INT)
                   AS includes_system,
               coalesce(extra_model, model) AS model_out,
               CAST(coalesce(extra_max_tokens, max_tokens) AS BIGINT)
                   AS max_tokens_out,
               CAST(extra_has_tools AS INT) AS includes_tools
        FROM c
    """


def response_parse_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_RESP_SQL}),
        b AS ({SYNTH_BLOCKS_SQL}),
        folded AS (
          SELECT resp_id,
                 CAST(count(*) AS INT) AS n_blocks,
                 string_agg(CASE WHEN has_type THEN btype
                                 ELSE 'text' END, ',' ORDER BY idx)
                     AS block_types,
                 string_agg(text, chr(10) ORDER BY idx)
                     FILTER (WHERE text IS NOT NULL) AS text_joined,
                 string_agg(name, ',' ORDER BY idx)
                     FILTER (WHERE name IS NOT NULL) AS tool_names,
                 min(CASE WHEN idx = 0 THEN
                     CASE WHEN has_type THEN btype ELSE 'text' END END)
                     AS first_type
          FROM b GROUP BY resp_id)
        SELECT r.resp_id, coalesce(f.n_blocks, 0) AS n_blocks,
               f.first_type,
               coalesce(f.block_types, '') AS block_types,
               coalesce(f.text_joined, '') AS text_joined,
               coalesce(f.tool_names, '') AS tool_names,
               CAST(CASE WHEN has_in_tokens
                         THEN coalesce(in_tokens, 0) ELSE 0 END
                    AS BIGINT) AS input_tokens,
               CAST(CASE WHEN has_out_tokens
                         THEN coalesce(out_tokens, 0) ELSE 0 END
                    AS BIGINT) AS output_tokens,
               coalesce(resp_model, '') AS model, stop_reason
        FROM r LEFT JOIN folded f ON f.resp_id = r.resp_id
    """
