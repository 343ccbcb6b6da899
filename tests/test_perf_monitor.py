"""Transcription pins for the performance-monitor folds
(operators/perf_monitor.py) vs app/monitoring/performance_monitor.py
re-implementations — the collector trim is validated by literally
replaying the reference's append/truncate loop."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import perf_monitor as pm

SF = "/root/testdata/sf0.001/documents.parquet"


def _doc_ids(spark):
    return [r.d for r in spark.read.parquet(SF).select(
        F.col("doc_id").cast("long").alias("d")).distinct().collect()]


def _streams(docs):
    """The synth metric streams as python dicts {name: [(seq, val)]}"""
    streams = {}
    for doc in docs:
        for j in range(3):
            seq = doc * 3 + j
            streams.setdefault("http.request.duration", []).append(
                (seq, (seq * 7919) % 8000 * 0.25))
        streams.setdefault("system.memory.usage", []).append(
            (doc, (doc * 31) % 101 * 1.0))
        streams.setdefault("system.cpu.usage", []).append(
            (doc, (doc * 17) % 101 * 1.0))
        streams.setdefault("operation.pdf_processing", []).append(
            (doc, (doc * 7901) % 20000 * 0.25))
    return {k: [v for _, v in sorted(rows)]
            for k, rows in streams.items()}


def ref_retained(values):
    """add_metric's trim loop (:63-71), replayed literally."""
    agg = []
    for v in values:
        agg.append(v)
        if len(agg) > 1000:
            agg = agg[-500:]
    return agg


def ref_percentile(values, p):
    if not values:
        return 0.0
    s = sorted(values)
    return s[min(int((p / 100) * len(s)), len(s) - 1)]


def test_window_and_stats_match_reference(spark):
    docs = _doc_ids(spark)
    streams = _streams(docs)
    vals = pm.synth_metric_values(spark.read.parquet(SF))
    win = {r.name: (r.total_appends, r.retained_from,
                    r.retained_count)
           for r in pm.retained_window(vals).collect()}
    stats = {r.name: r.asDict() for r in
             pm.aggregated_stats(vals).collect()}
    trim_fired = False
    for name, stream in streams.items():
        retained = ref_retained(stream)
        n = len(stream)
        assert win[name][0] == n
        assert win[name][2] == len(retained)
        assert stream[win[name][1]:] == retained
        if len(retained) != n:
            trim_fired = True
        s = stats[name]
        assert s["count"] == len(retained)
        assert s["min"] == min(retained)
        assert s["max"] == max(retained)
        assert abs(s["avg"] - sum(retained) / len(retained)) < 1e-12
        for p in (50, 95, 99):
            assert s[f"p{p}"] == ref_percentile(retained, p), (name, p)
    assert trim_fired  # the >1000 trim is actually exercised


def test_quirky_percentile_pin():
    # the reference's int-index percentile: p50 of [1,2,3,4] is 3
    assert ref_percentile([1.0, 2.0, 3.0, 4.0], 50) == 3.0


def ref_alerts(docs):
    names = ("http.request.duration", "system.memory.usage",
             "system.cpu.usage", "operation.pdf_processing",
             "custom.op", "unthresholded.op")
    thr = {n: (w, c) for n, w, c, _u, e in pm.THRESHOLD_DEFAULTS}
    last = {}
    out = []
    rows = []
    for doc in sorted(docs):
        name = names[doc % 6]
        ts = doc * 37 + (doc % 5) * 29
        value = ((doc * 13) % 120 * 1.0 if doc % 6 in (1, 2)
                 else (doc * 13) % 120 * 100.0)
        rows.append((name, ts, value))
    for name, ts, value in rows:
        if name not in thr:
            continue
        w, c = thr[name]
        level = ("critical" if value >= c
                 else "warning" if value >= w else None)
        if not level:
            continue
        key = f"{name}_{level}"
        prev = last.get(key)
        emitted = prev is None or (ts - prev) >= 300
        if emitted:
            last[key] = ts
        out.append((name, level, ts, value, emitted))
    return out


def test_alert_cooldown_matches_reference(spark):
    got = {(r.name, r.level, r.ts): (r.value, r.emitted)
           for r in pm.threshold_alerts(
               pm.synth_alert_metrics(spark.read.parquet(SF)),
               pm.synth_alert_thresholds(spark)).collect()}
    want = {(n, lv, ts): (v, e)
            for n, lv, ts, v, e in ref_alerts(_doc_ids(spark))}
    assert got == want
    assert any(not e for _, e in got.values())  # suppression occurs
    assert any(e for _, e in got.values())


def ref_analysis(doc):
    stats = {}
    if doc % 4 != 0:
        stats["http.request.duration"] = (doc * 11) % 4000 * 1.0
    if doc % 4 != 1:
        stats["system.memory.usage"] = (doc * 7) % 120 * 1.0
    if doc % 4 != 2:
        stats["system.cpu.usage"] = (doc * 3) % 110 * 1.0
    health, recs = 100, []
    for metric, _stat, gate, pen, typ, sev, msg in pm.ANALYSIS_RULES:
        v = stats.get(metric)
        if v is not None and v > gate:
            recs.append((typ, sev, msg, metric, v))
            health -= pen
    return health, recs


def test_analysis_matches_reference(spark):
    got = {r.snapshot_id: (r.health_score, list(zip(
        r.rec_types, r.rec_severities, r.rec_messages,
        r.rec_metrics, r.rec_values)))
        for r in pm.analyze_performance(
            pm.synth_snapshot_stats(spark.read.parquet(SF)))
        .collect()}
    for doc in _doc_ids(spark):
        health, recs = ref_analysis(doc)
        assert got[doc] == (health, recs), doc


def test_slow_operations_matches_reference(spark):
    docs = _doc_ids(spark)
    streams = _streams(docs)
    rows = [r.asDict() for r in pm.slow_operations(
        pm.aggregated_stats(pm.synth_metric_values(
            spark.read.parquet(SF)))).collect()]
    want = []
    for name, stream in streams.items():
        if not name.startswith("operation."):
            continue
        retained = ref_retained(stream)
        p95 = ref_percentile(retained, 95)
        if p95 > 1000:
            want.append({"operation": name, "p95_duration": p95,
                         "avg_duration":
                         sum(retained) / len(retained),
                         "max_duration": max(retained),
                         "count": len(retained)})
    want.sort(key=lambda x: -x["p95_duration"])
    assert len(rows) == len(want)
    for g, w in zip(sorted(rows, key=lambda r: r["rank"]), want):
        assert g["operation"] == w["operation"]
        assert g["p95_duration"] == w["p95_duration"]
        assert abs(g["avg_duration"] - w["avg_duration"]) < 1e-12
        assert g["max_duration"] == w["max_duration"]
        assert g["count"] == w["count"]
