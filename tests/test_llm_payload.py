"""Pins for the Anthropic-call helper folds (operators/llm_payload vs
app/services/core/claude_helper.py:60-160)."""

from mivaa_pdf_extractor_spark.operators import llm_payload as lp


def _ev(spark, n=1000):
    return spark.range(0, n).withColumnRenamed("id", "event_id")


def test_payload_build_matches_reference(spark):
    calls = lp.synth_calls(_ev(spark))
    rows = [r.asDict() for r in calls.collect()]
    got = {r["call_id"]: r.asDict()
           for r in lp.payload_build(calls).collect()}
    for r in rows:
        g = got[r["call_id"]]
        supports = not any(r["model"].startswith(m)
                           for m in lp.MODELS_WITHOUT_TEMPERATURE)
        inc = r["temperature"] is not None and supports
        assert g["includes_temperature"] == int(inc)
        if inc:
            assert g["temperature_out"] == r["temperature"]
        assert g["includes_system"] == int(bool(r["system"]))
        # payload.update(extra) overrides base keys
        assert g["model_out"] == (r["extra_model"] or r["model"])
        assert g["max_tokens_out"] == (r["extra_max_tokens"]
                                       or r["max_tokens"])


def test_dated_alias_drops_temperature(spark):
    """'claude-opus-4-8-20260115' startswith 'claude-opus-4-8' →
    temperature dropped even though explicitly passed (pin)."""
    calls = spark.createDataFrame(
        [(1, "claude-opus-4-8-20260115", 0.7, "s", 10, None, None,
          False),
         (2, "claude-sonnet-4-5", 0.7, "s", 10, None, None, False),
         (3, "claude-sonnet-4-5", None, "s", 10, None, None, False)],
        "call_id long, model string, temperature double, system string, "
        "max_tokens int, extra_model string, extra_max_tokens long, "
        "extra_has_tools boolean")
    rows = {r["call_id"]: r for r in lp.payload_build(calls).collect()}
    assert rows[1]["includes_temperature"] == 0
    assert rows[2]["includes_temperature"] == 1
    assert rows[3]["includes_temperature"] == 0  # None → omitted


def test_response_parse_matches_reference(spark):
    resp = lp.synth_responses(_ev(spark))
    rows = [r.asDict(recursive=True) for r in resp.collect()]
    got = {r["resp_id"]: r.asDict()
           for r in lp.response_parse(resp).collect()}
    for r in rows:
        g = got[r["resp_id"]]
        blocks = r["blocks"]
        types = [(b["btype"] if b["has_type"] else "text")
                 for b in blocks]
        assert g["n_blocks"] == len(blocks)
        assert g["block_types"] == ",".join(types)
        assert g["first_type"] == (types[0] if types else None)
        assert g["text_joined"] == "\n".join(
            b["text"] for b in blocks if b["text"] is not None)
        # usage: int(get(k, 0) or 0) — present-NULL folds to 0 (the
        # `or` is LIVE here, unlike the dead .get defaults elsewhere)
        want_in = (r["in_tokens"] or 0) if r["has_in_tokens"] else 0
        assert g["input_tokens"] == want_in
        assert g["model"] == (r["resp_model"] or "")
