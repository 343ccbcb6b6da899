"""Pins for the pipeline-guard utility folds (operators/ops_guard vs
app/utils/timeout_guard.py + app/utils/retry_helper.py)."""

from mivaa_pdf_extractor_spark.operators import ops_guard as og


def _ev(spark, n=1000):
    return spark.range(0, n).withColumnRenamed("id", "event_id")


def _ref_stage_timeout(stage, pages, images, mb, cats_n, conc):
    """ProgressiveTimeoutStrategy transcription (:217-359)."""
    if stage == "pdf_extraction":
        t = pages * 30
        if pages > 50:
            t += (pages - 50) * 5
        t += mb * 3
        return min(t, 3600)
    if stage == "product_discovery":
        return min(60 + (pages / 10) * 30 + cats_n * 30, 600)
    if stage == "chunking":
        return min(60 + (pages / 10) * 15, 600)
    if stage == "image_processing":
        return min(images * 60 / conc * 1.2, 1800)
    return 1800.0


def test_stage_timeouts_match_reference(spark):
    jobs = og.synth_timeout_jobs(_ev(spark))
    rows = [r.asDict() for r in jobs.collect()]
    got = {r["job_id"]: r.asDict()
           for r in og.stage_timeouts(jobs).collect()}
    for r in rows:
        g = got[r["job_id"]]
        want = _ref_stage_timeout(
            r["stage"], r["page_count"], r["image_count"],
            r["file_size_mb"], r["categories_n"], r["concurrent_limit"])
        assert g["stage_timeout"] == want, r
        # memory tiers (:16-48): probe failure → 1.0
        p = r["mem_percent"]
        if r["mem_probe_fails"]:
            mult = 1.0
        elif p < 60:
            mult = 1.0
        elif p < 80:
            mult = 1.5
        elif p < 90:
            mult = 2.0
        else:
            mult = 3.0
        assert g["memory_multiplier"] == mult
        assert g["adjusted_timeout"] == want * mult


def _ref_sleep(fail_count, max_retries, init, mult, maxd):
    """async_retry_with_backoff transcription (:53-92)."""
    delay, total, sleeps = init, 0.0, 0
    for attempt in range(max_retries + 1):
        failed = attempt < fail_count
        if not failed:
            return total, sleeps, "success", attempt + 1
        if attempt < max_retries:
            total += delay
            sleeps += 1
            delay = min(delay * mult, maxd)
    return total, sleeps, "exhausted", max_retries + 1


def test_retry_schedule_matches_reference(spark):
    calls = og.synth_retry_calls(_ev(spark))
    rows = [r.asDict() for r in calls.collect()]
    got = {r["call_id"]: r.asDict()
           for r in og.retry_schedule(calls).collect()}
    for r in rows:
        total, sleeps, outcome, attempts = _ref_sleep(
            r["fail_count"], r["max_retries"], r["initial_delay"],
            r["multiplier"], r["max_delay"])
        g = got[r["call_id"]]
        assert g["outcome"] == outcome
        assert g["attempts_made"] == attempts
        assert g["sleeps"] == sleeps
        assert g["total_sleep_s"] == total, (r, g["total_sleep_s"],
                                             total)


def test_first_sleep_uncapped(spark):
    """The first sleep uses initial_delay as-is even above max_delay;
    the cap applies from the second sleep on (the reference caps AFTER
    each multiply)."""
    calls = spark.createDataFrame(
        [(1, 3, 3, 20.0, 2.0, 5.0)],
        "call_id long, fail_count int, max_retries int, "
        "initial_delay double, multiplier double, max_delay double")
    row = og.retry_schedule(calls).collect()[0]
    # sleeps: 20 (raw initial), then min(40,5)=5, then min(10,5)=5
    assert row["total_sleep_s"] == 30.0
    assert row["sleeps"] == 3


def test_classify_errors_match_reference(spark):
    errors = og.synth_errors(_ev(spark))
    rows = [r.asDict() for r in errors.collect()]
    got = {r["error_id"]: r.asDict()
           for r in og.classify_errors(errors).collect()}
    for r in rows:
        low = r["error_text"].lower()
        dns = any(s in low for s in og.DNS_INDICATORS)
        conn = any(s in low for s in og.CONNECTION_INDICATORS)
        g = got[r["error_id"]]
        assert g["is_dns"] == int(dns)
        assert g["is_connection"] == int(conn)
        assert g["should_retry"] == int(
            dns or conn or r["is_httpx_network_type"])
    # vocabulary sanity: the bank exercises both classes and neither
    texts = {r["error_text"] for r in rows}
    assert "ValueError: invalid literal" in texts
