"""Transcription pins for the mention cost/credit folds
(operators/mention_costs.py) vs mention_cost_logger.py:42-377 +
cost_logger.py:80-126 re-implementations."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import mention_costs as mc

SF = "/root/testdata/sf0.001/documents.parquet"


def _doc_ids(spark):
    return [r.d for r in spark.read.parquet(SF).select(
        F.col("doc_id").cast("long").alias("d")).distinct().collect()]


def ref_call(doc):
    kind = mc.KINDS[doc % 7]
    attrib_slug = ["seo-toolkit", None, "", mc.MODULE_SLUG][doc % 4]
    model = ""
    operation = ""
    if kind == "perplexity":
        model = "sonar-pro" if doc % 2 == 0 else "sonar"
    elif kind == "llm_probe":
        model = mc.PROBE_MODELS[doc % 5]
    if kind == "serp":
        operation = "pao_question" if doc % 2 == 0 else "serp_organic"
    elif kind == "haiku":
        operation = ["facet_extraction", "classifier",
                     "opportunity_polish"][doc % 3]
    it, ot = (doc * 13) % 75 * 40, (doc * 7) % 37 * 40

    eff_slug = attrib_slug or mc.MODULE_SLUG
    prefix = ("mention_monitoring.opportunities"
              if eff_slug == mc.MODULE_SLUG
              else eff_slug.replace("-", "_"))
    if kind == "news":
        raw = 0.0006
        op_type = "mention_monitoring.discovery.dataforseo_news"
        name, slug = "dataforseo-news", mc.MODULE_SLUG
    elif kind == "labs":
        raw = 0.001
        op_type = f"{prefix}.dataforseo_labs"
        name, slug = "dataforseo-labs-related-keywords", eff_slug
    elif kind == "serp":
        raw = 0.0006
        op_type = f"{prefix}.dataforseo_serp.{operation}"
        name, slug = "dataforseo-serp-google-organic", eff_slug
    elif kind == "perplexity":
        per = 0.01 if model == "sonar-pro" else 0.005
        raw = per + ((it + ot) / 1000.0) * 0.001
        op_type = f"mention_monitoring.discovery.perplexity_{model}"
        name, slug = model, mc.MODULE_SLUG
    elif kind == "haiku":
        raw = (it / 1000.0) * 0.001 + (ot / 1000.0) * 0.005
        op_type = f"mention_monitoring.{operation}"
        name, slug = "claude-haiku-4-5-20251001", mc.MODULE_SLUG
    elif kind == "llm_probe":
        if model.startswith("claude-haiku"):
            rates = (0.001, 0.005)
        elif model == "gpt-4o-mini":
            rates = (0.00015, 0.0006)
        elif model.startswith("gemini"):
            rates = (0.00010, 0.0004)
        elif model == "sonar":
            rates = (0.001, 0.001)
        else:
            rates = (0.0005, 0.0015)
        raw = (it / 1000.0) * rates[0] + (ot / 1000.0) * rates[1]
        op_type = "mention_monitoring.llm_probe"
        name, slug = model, mc.MODULE_SLUG
    else:
        raw = 0.0
        op_type = "mention_monitoring.discovery.youtube"
        name, slug = "youtube-data-api-v3", mc.MODULE_SLUG
    return (op_type, name, slug, round(raw, 6), round(raw * 1.5, 6))


def test_call_costs_match_reference(spark):
    got = {r.event_id: r for r in mc.call_cost_rows(
        mc.synth_call_events(spark.read.parquet(SF))).collect()}
    seo_routed = default_kept = False
    for doc in _doc_ids(spark):
        op_type, name, slug, raw, billed = ref_call(doc)
        r = got[doc]
        assert (r.operation_type, r.model_name, r.module_slug) \
            == (op_type, name, slug), doc
        assert abs(r.raw_cost_usd - raw) < 1e-12
        assert abs(r.billed_cost_usd - billed) < 1e-12
        # truncations
        q = "q-" + "x" * (doc % 150)
        if r.meta_query is not None:
            assert r.meta_query == q[:120]
        if r.error_head is not None:
            assert r.error_head == ("err " + "e" * 300)[:240]
        if slug == "seo-toolkit":
            assert op_type.startswith("seo_toolkit.")
            seo_routed = True
        kind = mc.KINDS[doc % 7]
        if kind not in ("labs", "serp") \
                and ["seo-toolkit", None, "", mc.MODULE_SLUG][
                    doc % 4] == "seo-toolkit":
            # #286 pin: non-labs/serp helpers IGNORE the caller slug
            assert r.module_slug == mc.MODULE_SLUG
            default_kept = True
    assert seo_routed and default_kept


def test_credit_debit_matches_reference(spark):
    got = {r.req_id: (r.outcome, r.debited)
           for r in mc.credit_debit_fold(mc.synth_debit_reqs(
               spark.read.parquet(SF))).collect()}
    outcomes = set()
    ops = tuple(mc.MENTION_OP_CREDIT_COST) + ("custom_free",)
    for doc in _doc_ids(spark):
        op = ops[doc % 6]
        amount = mc.MENTION_OP_CREDIT_COST.get(op, 0)
        user = [None, ""][doc % 11] if doc % 11 in (0, 1) \
            else f"user-{doc % 9}"
        if amount <= 0:
            want = ("free", True)
        elif not user:
            want = ("no_user", False)
        elif doc % 13 == 0:
            want = ("exception", False)
        elif doc % 7 == 0:
            want = ("empty_reply", False)
        elif doc % 5 != 0:
            want = ("debited", True)
        else:
            want = ("insufficient", False)
        assert got[doc] == want, doc
        outcomes.add(want[0])
    assert outcomes == {"free", "no_user", "exception", "empty_reply",
                        "debited", "insufficient"}
