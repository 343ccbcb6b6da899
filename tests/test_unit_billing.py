"""Pins for the per-unit / firecrawl / replicate billing calculators
(operators/unit_billing.py) vs ai_pricing.py:648-815
re-implementations."""

from decimal import Decimal

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import unit_billing as ub

SF = "/root/testdata/sf0.001/documents.parquet"


def _doc_ids(spark):
    return [r.d for r in spark.read.parquet(SF).select(
        F.col("doc_id").cast("long").alias("d")).distinct().collect()]


def test_external_matches_reference(spark):
    pricing = {s: (Decimal(str(c)), u)
               for s, c, u in ub.EXTERNAL_SERVICES}
    got = {r.event_id: r for r in ub.external_service_cost(
        ub.synth_external_events(spark.read.parquet(SF))).collect()}
    saw_err = False
    for doc in _doc_ids(spark):
        name = ub._EXT_NAMES[doc % len(ub._EXT_NAMES)]
        units = doc % 50 + 1
        r = got[doc]
        if name not in pricing:
            assert not r.ok
            assert r.error == (
                f"Service {name} not found in EXTERNAL_SERVICE_"
                f"PRICING. Available: "
                f"{[s for s, _c, _u in ub.EXTERNAL_SERVICES]}")
            saw_err = True
            continue
        cpu, unit = pricing[name]
        raw = cpu * units
        billed = raw * Decimal("1.50")
        assert abs(r.raw_cost_usd - float(raw)) < 1e-12
        assert abs(r.billed_cost_usd - float(billed)) < 1e-12
        assert abs(r.credits_to_debit - float(billed * 100)) < 1e-10
        assert r.unit_type == unit
    assert saw_err


def test_firecrawl_matches_reference(spark):
    got = {r.event_id: r for r in ub.firecrawl_cost(
        ub.synth_firecrawl_events(spark.read.parquet(SF))).collect()}
    for doc in _doc_ids(spark):
        credits = doc % 30
        r = got[doc]
        # unknown ops fall back to the scrape rate — cost identical
        assert abs(r.cost_usd
                   - float(Decimal(credits) * Decimal("0.001"))) \
            < 1e-15
        assert r.used_fallback_rate == (doc % 4 == 0)
        assert r.tokens_equivalent == credits * 15


def test_replicate_matches_reference(spark):
    static = {m: Decimal(str(c)) for m, c in ub.REPLICATE_MODELS}
    overlay = {m: (Decimal(str(c)), mk)
               for m, c, mk in ub.REPLICATE_OVERLAY}
    got = {r.event_id: r for r in ub.replicate_cost(
        ub.synth_replicate_events(spark.read.parquet(SF)),
        ub.synth_replicate_overlay(spark)).collect()}
    pins = set()
    for doc in _doc_ids(spark):
        model = ub._REP_NAMES[doc % len(ub._REP_NAMES)]
        n = doc % 7 + 1
        r = got[doc]
        db = overlay.get(model)
        if db is not None and db[0]:  # truthy cost wins
            cost, mk = db[0], (Decimal(str(db[1])) if db[1]
                               else Decimal("1.50"))
            assert r.used_overlay
            pins.add("overlay")
            if db[1] is None:
                pins.add("markup_default")
        elif model in static:
            cost, mk = static[model], Decimal("1.50")
            assert not r.used_overlay
            if db is not None:
                pins.add("zero_falls_through")  # sdxl 0.0 overlay
        else:
            assert not r.ok
            assert r.error == (f"Model {model} is not configured "
                               f"for per-generation billing")
            pins.add("unknown")
            continue
        raw = cost * n
        assert abs(r.raw_cost_usd - float(raw)) < 1e-12
        assert abs(r.billed_cost_usd - float(raw * mk)) < 1e-12
        assert r.markup_multiplier == float(mk)
    assert pins == {"overlay", "markup_default", "zero_falls_through",
                    "unknown"}
