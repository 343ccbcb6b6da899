"""Pins for the small service-fold operators: XML import stage
progress, material quota clamp, keyword-expansion curation, and the
query-understanding cache fold."""

import pytest
from pyspark.sql import Row, functions as F

from mivaa_pdf_extractor_spark.operators.import_stages import (
    xml_import_description, xml_import_progress)
from mivaa_pdf_extractor_spark.operators.keyword_expansion import (
    curate_expansions)
from mivaa_pdf_extractor_spark.operators.query_cache import (
    fold_cache_events)
from mivaa_pdf_extractor_spark.operators.quota import (
    clamp_batch, is_quota_error)


def test_xml_stage_ladder(spark):
    rows = spark.createDataFrame(
        [(s,) for s in ("initialized", "products_parsed",
                        "clips_generated", "completed", "failed",
                        "nope")],
        "stage string")
    got = {r["stage"]: (r["p"], r["d"]) for r in rows.select(
        "stage", xml_import_progress(F.col("stage")).alias("p"),
        xml_import_description(F.col("stage")).alias("d")).collect()}
    assert got["initialized"][0] == 0
    assert got["products_parsed"][0] == 14      # int(1/7*100)
    assert got["clips_generated"][0] == 57      # int(4/7*100)
    assert got["completed"] == (100, "Import completed successfully")
    assert got["failed"] == (0, "Import failed")
    assert got["nope"] == (0, None)


def test_quota_clamp(spark):
    rows = spark.createDataFrame(
        [Row(row_id=i, workspace_id="w", batch_pos=i,
             is_service=(i == 1)) for i in range(5)]
        + [Row(row_id=10, workspace_id=None, batch_pos=0,
               is_service=False),
           Row(row_id=11, workspace_id="unknown", batch_pos=0,
               is_service=False),
           Row(row_id=12, workspace_id="full", batch_pos=0,
               is_service=False),
           Row(row_id=13, workspace_id="full", batch_pos=1,
               is_service=True)],
        "row_id long, workspace_id string, batch_pos long, "
        "is_service boolean")
    limits = spark.createDataFrame(
        [("w", 10), ("full", 3)],
        "workspace_id string, plan_limit long")
    counts = spark.createDataFrame(
        [("w", 8), ("full", 7)],
        "workspace_id string, n_products long")
    out = {r["row_id"]: r.asDict()
           for r in clamp_batch(rows, limits, counts).collect()}
    # w: remaining 2 -> first 2 non-service admitted, service always
    assert [out[i]["admitted"] for i in range(5)] == [
        True, True, True, False, False]
    assert out[3]["refusal"] == "quota_exceeded"
    # null + unknown workspaces fail open (-1)
    assert out[10]["remaining"] == -1 and out[10]["admitted"]
    assert out[11]["remaining"] == -1 and out[11]["admitted"]
    # negative remaining: nothing non-service admitted; service exempt
    assert out[12]["admitted"] is False
    assert out[13]["admitted"] is True
    err = spark.range(1).select(
        is_quota_error(F.lit("ERROR: quota_exceeded for ws"))
        .alias("x")).collect()[0]["x"]
    assert err is True


def test_keyword_curation_order_dedup_exclusion(spark):
    raw = spark.createDataFrame(
        [Row(req_id=1,
             title_variants=["Senior PM", " pm ", "", "SENIOR PM"],
             seniority_variants=["lead pm"],
             abbreviations=["PM"],
             rejected_terms=[" product marketing ", ""],
             query_phrasings=["PM hiring", "pm HIRING", " PM roles "],
             excluded_keywords=["lead"])],
        "req_id long, title_variants array<string>, "
        "seniority_variants array<string>, "
        "abbreviations array<string>, rejected_terms array<string>, "
        "query_phrasings array<string>, "
        "excluded_keywords array<string>")
    r = curate_expansions(raw).collect()[0]
    # 'senior pm' first, 'pm' second; dup SENIOR PM dropped; 'lead pm'
    # excluded by substring; abbreviation 'PM' deduped against ' pm '
    assert r["expanded"] == ["senior pm", "pm"]
    assert r["rejected"] == ["product marketing"]
    assert r["query_phrasings"] == ["PM hiring", "PM roles"]


def test_query_cache_store_resets_hits(spark):
    events = spark.createDataFrame(
        [(0, "lookup", "q one"),        # miss: before any store
         (1, "store", "  Q One "),
         (2, "lookup", "q one"),
         (3, "lookup", "Q ONE"),
         (4, "store", "Q one"),         # upsert resets hit_count
         (5, "lookup", " q one"),
         (6, "lookup", "other q")],     # never stored: no row
        "event_ord long, kind string, query string")
    rows = fold_cache_events(events).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["query_text"] == "Q one"   # raw text of last store
    assert r["hit_count"] == 1          # only the post-re-store lookup
    assert r["created_at_ord"] == 4
    assert r["last_hit_ord"] == 5
