"""Pins for the chunk-quality metrics + recommendation ladder
(operators/chunk_quality_report vs chunk_quality_routes.py:25-321)."""

import statistics

from mivaa_pdf_extractor_spark.operators import chunk_quality_report as cq

_METRICS_SCHEMA = (
    "workspace_id long, total_chunks long, average_quality_score double, "
    "excellent long, good long, fair long, poor long, "
    "total_documents long, flagged_pending long, flagged_reviewed long, "
    "borderline_flagged long, dup_prevented long, low_rejected long, "
    "very_small_chunks long, very_large_chunks long, size_min int, "
    "size_max int, size_avg double, size_stddev double, "
    "size_median double, avg_overlap double, avg_configured_size double, "
    "overlap_ratio double, avg_quality_r3 double")


def _mrow(**kw):
    base = dict(workspace_id=0, total_chunks=100,
                average_quality_score=0.75, excellent=10, good=20,
                fair=30, poor=5, total_documents=1, flagged_pending=0,
                flagged_reviewed=0, borderline_flagged=0, dup_prevented=0,
                low_rejected=0, very_small_chunks=0, very_large_chunks=0,
                size_min=100, size_max=2000, size_avg=800.0,
                size_stddev=400.0, size_median=700.0, avg_overlap=150.0,
                avg_configured_size=1000.0, overlap_ratio=15.0,
                avg_quality_r3=0.75)
    base.update(kw)
    return tuple(base[k.split(" ")[0]] for k in _METRICS_SCHEMA.split(", "))


def _recs(spark, **kw):
    df = spark.createDataFrame([_mrow(**kw)], _METRICS_SCHEMA)
    row = cq.quality_recommendations(df).collect()[0]
    return row["recommendations"].split(" | ") if row["recommendations"] \
        else []


def test_ladder_branches(spark):
    # small: 8/100 = 8% > 5 -> HIGH with Python-format pct
    recs = _recs(spark, very_small_chunks=8)
    assert any(r.startswith("⚠️ HIGH: 8 chunks (8.0%) are very small")
               for r in recs)
    # small: 3% -> MEDIUM tier
    recs = _recs(spark, very_small_chunks=3)
    assert any(r.startswith("⚡ MEDIUM: 3 chunks (3.0%)") for r in recs)
    # large: 12% -> HIGH; 8% -> NO rec (no medium tier for large — pin)
    recs = _recs(spark, very_large_chunks=12)
    assert any("very large (> 2500 chars)" in r for r in recs)
    recs = _recs(spark, very_large_chunks=8)
    assert not any("very large" in r for r in recs)
    # stddev > 800 MEDIUM, formatted :.0f
    recs = _recs(spark, size_stddev=812.4)
    assert any("(stddev: 812)" in r for r in recs)
    # overlap > 25 MEDIUM: suggests avg_configured_size * 0.15
    recs = _recs(spark, overlap_ratio=30.0, avg_overlap=300.0,
                 avg_configured_size=1000.0)
    assert any("from 300 to 150 (15%)" in r for r in recs)
    # overlap < 10 INFO — fires even at ratio 0 (empty overlap set)
    recs = _recs(spark, overlap_ratio=0.0)
    assert any(r.startswith("💡 INFO: Overlap ratio is 0.0%") for r in recs)
    # poor: 20/100 > 15% HIGH
    recs = _recs(spark, poor=20)
    assert any("poor quality scores (< 0.5)" in r for r in recs)
    # avg bands: <0.6 HIGH, <0.7 MEDIUM, [0.7,0.8) silent, >=0.8 EXCELLENT
    assert any("(< 0.6)" in r
               for r in _recs(spark, average_quality_score=0.59))
    assert any("(< 0.7)" in r
               for r in _recs(spark, average_quality_score=0.65))
    assert not any("Average quality score" in r
                   for r in _recs(spark, average_quality_score=0.75))
    assert any("performing well!" in r
               for r in _recs(spark, average_quality_score=0.84))


def test_config_fallback(spark):
    # quiet workspace: no branch fires -> CONFIG line alone
    recs = _recs(spark)
    assert recs == ["💡 CURRENT CONFIG: chunk_size=1000, "
                    "chunk_overlap=150. System is performing optimally "
                    "- maintain current settings."]
    # all-checkmark workspace: EXCELLENT lines PLUS the config line (pin)
    recs = _recs(spark, average_quality_score=0.85, excellent=50, good=40)
    assert len(recs) == 3
    assert recs[0].startswith("✅ EXCELLENT: Average quality score is 0.85")
    assert recs[1].startswith("✅ EXCELLENT: 90.0% of chunks")
    assert recs[2].startswith("💡 CURRENT CONFIG")
    # one warning blocks the fallback even when checkmarks exist
    recs = _recs(spark, average_quality_score=0.85, excellent=50, good=40,
                 size_stddev=900.0)
    assert not any("CURRENT CONFIG" in r for r in recs)


def test_metrics_pins(spark):
    events = spark.range(0, 3000).withColumnRenamed("id", "event_id")
    chunks = cq.synth_chunks(events)
    m = {r["workspace_id"]: r for r in cq.quality_metrics(
        chunks, cq.synth_docs(events), cq.synth_flags(events),
        cq.synth_jobs(events)).collect()}
    rows = [r.asDict() for r in chunks.collect()
            if r["created_day"] < cq.DAYS_WINDOW]
    # truthy filter: 0.0 and NULL scores excluded from avg + distribution
    for w in range(5):
        ws = [r["quality_score"] for r in rows if r["workspace_id"] == w]
        truthy = [s for s in ws if s]
        assert m[w]["total_chunks"] == len(ws)
        assert abs(m[w]["average_quality_score"]
                   - sum(truthy) / len(truthy)) < 1e-12
        assert m[w]["poor"] == sum(1 for s in truthy if s < 0.5)
    # the size sample is GLOBAL (workspace rows all carry the same stats)
    stats = {(m[w]["size_avg"], m[w]["size_stddev"], m[w]["size_median"],
              m[w]["very_small_chunks"]) for w in range(5)}
    assert len(stats) == 1
    # sample stdev matches statistics.stdev on the lowest-1000 sample
    sample = sorted(rows, key=lambda r: r["chunk_id"])[:cq.SAMPLE_LIMIT]
    lens = [r["content_len"] for r in sample]
    want = round(statistics.stdev(lens), 1)
    assert abs(m[0]["size_stddev"] - want) < 1e-9
    assert abs(m[0]["size_median"]
               - round(statistics.median(lens), 1)) < 1e-9
    # overlap truthy gate: 0 overlaps excluded from the mean
    ovs = [r["chunk_overlap"] for r in sample if r["chunk_overlap"]]
    assert abs(m[0]["avg_overlap"]
               - round(statistics.mean(ovs), 1)) < 1e-9
