"""Transcription pins for the PaddleOCR attempt ladder
(operators/ocr_attempts.py) vs a re-implementation of
paddleocr_endpoint_manager.run_structural_pass:234-395 +
ai_pricing.calculate_time_based_cost:713-768."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import ocr_attempts as oa

SF = "/root/testdata/sf0.001/documents.parquet"


def _doc_ids(spark):
    return [r.d for r in spark.read.parquet(SF).select(
        F.col("doc_id").cast("long").alias("d")).distinct().collect()]


def _synth_attempt(doc, a):
    g = doc * 97 + a
    http = g % 7 == 0
    status = (500, 429, 401, 503, 403, 404)[g % 6] if http else None
    raw = None
    parsed = 0
    chars = 0
    if not http:
        if g % 5 == 0:
            raw = None
        elif g % 5 == 1:
            raw = 0
        else:
            raw = g % 11 + 1
            parsed = 0 if g % 4 == 0 else g % 9 + 1
            if parsed > 0:
                chars = parsed * 37 + g % 50
    return status, raw, parsed, chars, g % 3000 + 20


def ref_run(doc):
    """run_structural_pass replay: returns (metric rows, summary)."""
    if doc % 29 == 0:
        return [], ("disabled", 0)
    if doc % 31 == 0:
        return [], ("resume_failed", 0)
    metrics = []
    for a in range(1, 4):
        status, raw, parsed, chars, lat = _synth_attempt(doc, a)
        if status is not None:
            non_retryable = status in (401, 403, 404)
            metrics.append((a, "failed_config_error" if non_retryable
                            else "failed_http_error", None, None, lat))
            if non_retryable:
                return metrics, ("config_error", a)
            if a == 3:
                return metrics, ("http_error_exhausted", a)
            continue
        dropped_every = bool(raw) and parsed == 0
        if raw is None or dropped_every:
            metrics.append((a, "failed_all_regions_dropped"
                            if dropped_every else "failed_no_regions",
                            0, 0, lat))
            if a == 3:
                return metrics, ("response_error_exhausted", a)
            continue
        # success — including the raw == 0 (empty regions list) case
        metrics.append((a, "success" if a == 1
                        else "success_after_retry", parsed, chars,
                        lat))
        return metrics, ("success", a)
    raise AssertionError("unreachable")


def test_ladder_matches_reference(spark):
    docs = spark.read.parquet(SF)
    att = oa.synth_attempts(docs)
    got_m = {}
    for r in oa.attempt_metrics(att).collect():
        got_m.setdefault(r.call_id, []).append(
            (r.attempt_number, r.outcome, r.region_count,
             r.chars_count, r.latency_ms))
    got_s = {r.call_id: (r.final_status, r.attempts_made)
             for r in oa.call_summary(att).collect()}
    outcomes = set()
    for doc in _doc_ids(spark):
        metrics, summary = ref_run(doc)
        assert sorted(got_m.get(doc, [])) == sorted(metrics), doc
        assert got_s[doc] == summary, doc
        outcomes.update(m[1] for m in metrics)
        outcomes.add(summary[0])
    # every branch of the ladder is exercised, including the
    # {"regions": []} -> success-with-0-regions pin
    assert {"failed_config_error", "failed_http_error",
            "failed_no_regions", "failed_all_regions_dropped",
            "success", "success_after_retry", "config_error",
            "http_error_exhausted", "response_error_exhausted",
            "disabled", "resume_failed"} <= outcomes
    empty_success = [
        (doc, m) for doc in _doc_ids(spark)
        for m in ref_run(doc)[0]
        if m[1].startswith("success") and m[2] == 0]
    assert empty_success


def test_gpu_cost_matches_reference(spark):
    rows = oa.gpu_cost_rows(
        oa.synth_attempts(spark.read.parquet(SF))).collect()
    assert rows
    for r in rows:
        secs = max(r.latency_ms / 1000.0, 0.001)
        want = secs * 1.0 / 3600.0
        assert abs(r.raw_cost_usd - want) < 1e-15
        assert r.billed_cost_usd == r.raw_cost_usd
        assert r.markup_multiplier == 1.0
        assert abs(r.credits_to_debit - want * 100) < 1e-13
        assert r.model_name == "paddleocr-vl"
        assert r.operation_type == "pdf_structural_pass"
