"""Pins for text-embedding backfill planning
(operators/text_backfill.py vs text_embedding_backfill.py)."""

import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators.text_backfill import (
    backfill_summary, chunk_backfill_outcomes,
    product_backfill_outcomes, select_chunk_candidates,
    select_product_candidates)

_P = ("id string, workspace_id string, has_embedding boolean, "
      "embedding_text string, failure_marker string")
_C = ("id string, workspace_id string, has_text_embedding boolean, "
      "content string")


def test_product_ids_override_null_filter(spark):
    products = spark.createDataFrame(
        [Row(id="a", workspace_id="w", has_embedding=True,
             embedding_text="t", failure_marker=None),
         Row(id="b", workspace_id="w", has_embedding=False,
             embedding_text="t", failure_marker=None),
         Row(id="c", workspace_id="x", has_embedding=None,
             embedding_text="t", failure_marker=None)],
        _P)
    # default: missing-embedding only (false or NULL)
    ids = {r["id"] for r in
           select_product_candidates(products).collect()}
    assert ids == {"b", "c"}
    # explicit ids force re-embed of an embedded row
    ids = {r["id"] for r in select_product_candidates(
        products, product_ids=["a"]).collect()}
    assert ids == {"a"}
    # workspace filter applies in both modes
    ids = {r["id"] for r in select_product_candidates(
        products, workspace_id="w").collect()}
    assert ids == {"b"}


def test_blank_chunks_consume_limit_slots(spark):
    chunks = spark.createDataFrame(
        [Row(id=f"c{i}", workspace_id="w", has_text_embedding=None,
             content=("" if i < 2 else f"body {i}"))
         for i in range(5)],
        _C)
    # limit 3 admits c0..c2; the two blanks burn slots -> only c2 left
    got = [r["id"] for r in
           select_chunk_candidates(chunks, max_chunks=3).collect()]
    assert got == ["c2"]


def test_product_outcomes_and_marker(spark):
    cands = spark.createDataFrame(
        [Row(id="a", workspace_id="w", has_embedding=False,
             embedding_text="  ", failure_marker="m"),
         Row(id="b", workspace_id="w", has_embedding=False,
             embedding_text="t", failure_marker="m"),
         Row(id="c", workspace_id="w", has_embedding=False,
             embedding_text="t", failure_marker=None),
         Row(id="d", workspace_id="w", has_embedding=False,
             embedding_text="t", failure_marker=None)],
        _P)
    emb = spark.createDataFrame(
        [("a", True, 1024, "v4"), ("b", True, 1024, "v4"),
         ("c", True, 512, "v4")],  # d absent -> failed
        "id string, success boolean, dim int, model string")
    out = {r["id"]: r.asDict()
           for r in product_backfill_outcomes(cands, emb).collect()}
    assert out["a"]["outcome"] == "failed_empty_text"
    assert out["b"]["outcome"] == "embedded"
    assert out["b"]["marker_resolved"] is True
    assert out["b"]["resolved_by"] == "text_embedding_backfill"
    assert out["c"]["outcome"] == "failed_embedding"  # dim gate
    assert out["d"]["outcome"] == "failed_embedding"
    s = backfill_summary(
        product_backfill_outcomes(cands, emb)).collect()[0]
    assert (s["scanned"], s["embedded"], s["failed"]) == (4, 1, 3)


def test_chunk_batch_ladder(spark):
    cands = spark.createDataFrame(
        [Row(id=f"c{i}", workspace_id="w", has_text_embedding=None,
             content="x") for i in range(5)],
        _C)
    berr = spark.createDataFrame([(1,)], "batch_index int")
    vectors = spark.createDataFrame(
        [("c0", True), ("c1", False)],  # c2 short-listed
        "id string, vector_ok boolean")
    out = {r["id"]: r.asDict() for r in chunk_backfill_outcomes(
        cands, 3, berr, vectors).collect()}
    assert out["c0"]["outcome"] == "embedded"
    assert out["c1"]["outcome"] == "failed_null_vector"
    assert out["c2"]["outcome"] == "failed_short_list"
    # batch 1 = c3, c4: whole-batch failure wins the ladder
    assert out["c3"]["outcome"] == "failed_batch"
    assert out["c4"]["outcome"] == "failed_batch"
    assert out["c4"]["batch_index"] == 1
