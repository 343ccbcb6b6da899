"""Pins for the AI-model tracking rollups (operators/ai_tracker vs
ai_model_tracker.py:105-242)."""

from mivaa_pdf_extractor_spark.operators import ai_tracker as at

_SCHEMA = ("job_id long, call_ord long, model_name string, stage string, "
           "task string, latency_ms long, items_processed long, "
           "input_tokens long, output_tokens long, success boolean, "
           "confidence_score double")


def test_stage_first_seen_model_order(spark):
    calls = spark.createDataFrame(
        [(1, 0, "Voyage", "embedding", "t", 100, 1, None, None, True, 0.5),
         (1, 1, "Anthropic", "embedding", "t", 50, 1, None, None, True, None),
         (1, 2, "Voyage", "embedding", "t", 30, 1, None, None, False, 0.0)],
        _SCHEMA)
    row = at.stage_details(calls).collect()[0]
    # first-seen order, NOT alphabetical
    assert row["models_used"] == "Voyage,Anthropic"
    # avg over [0.5, 0.0] — the 0.0 confidence IS included (is-not-None gate)
    assert row["avg_confidence"] == 0.25
    # round(2/3*100, 2) = 66.67, avg latency 180/3 = 60.0
    assert row["success_rate_percent"] == 66.67
    assert row["avg_latency_ms"] == 60.0


def test_job_summary_matches_python(spark):
    events = spark.range(0, 1600).withColumnRenamed("id", "event_id")
    calls = [r.asDict() for r in at.synth_calls(events).collect()]
    got = {r["job_id"]: r for r in at.job_summary(
        at.synth_calls(events)).collect()}
    for j in range(8):
        grp = [c for c in calls if c["job_id"] == j]
        succ = sum(1 for c in grp if c["success"])
        lat = sum(c["latency_ms"] for c in grp)
        assert got[j]["total_ai_calls"] == len(grp)
        assert got[j]["successful_calls"] == succ
        assert got[j]["success_rate_percent"] == round(
            succ / len(grp) * 100, 2)
        assert got[j]["avg_latency_ms"] == round(lat / len(grp), 2)
        assert got[j]["total_tokens"] == (
            sum(c["input_tokens"] or 0 for c in grp)
            + sum(c["output_tokens"] or 0 for c in grp))
        assert got[j]["models_used"] == ",".join(
            sorted({c["model_name"] for c in grp}))


def test_model_stats_sets(spark):
    events = spark.range(0, 800).withColumnRenamed("id", "event_id")
    rows = at.model_stats(at.synth_calls(events)).collect()
    calls = [r.asDict() for r in at.synth_calls(events).collect()]
    for r in rows:
        grp = [c for c in calls if c["job_id"] == r["job_id"]
               and c["model_name"] == r["model"]]
        assert r["stages_used"] == ",".join(sorted({c["stage"]
                                                    for c in grp}))
        assert r["tasks"] == ",".join(sorted({c["task"] for c in grp}))
        assert r["failed_calls"] == sum(1 for c in grp if not c["success"])
