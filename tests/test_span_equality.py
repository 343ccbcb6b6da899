"""The correctness gate: span-sequence equality (kind, text, media_ref,
order) between the vectorized engine and the pure-Python oracle, over the
full deterministic fixture corpus (north rule / BASELINE.json:15)."""

import pyarrow as pa
import pytest

from mivaa_pdf_extractor_spark.operators.extract import (extract_iter_arrow,
                                                         run_extract)
from mivaa_pdf_extractor_spark.operators.skew import run_extract_skewed
from mivaa_pdf_extractor_spark.oracle import extract_document
from mivaa_pdf_extractor_spark.sources.synthetic import (corpus_to_spark_df,
                                                          gen_corpus)

from .conftest import spans_tuples


def assert_equal(docs, rows_by_id):
    for d in docs:
        o = extract_document(d["doc_id"], d["spans"])
        r = rows_by_id[d["doc_id"]]
        assert spans_tuples(r["spans"]) == spans_tuples(o["spans"]), d["doc_id"]
        assert r["status"] == o["status"], d["doc_id"]
        assert int(r["n_spans"]) == o["n_spans"], d["doc_id"]
        assert int(r["n_chars"]) == o["n_chars"], d["doc_id"]


def test_engine_batch_equals_oracle_no_spark():
    # drives the production Arrow kernel directly (no Spark session): the
    # legacy pandas batch path was deleted in round 3 (verdict item 8)
    docs = gen_corpus(120, seed=7, giants=1)
    batch = pa.RecordBatch.from_pydict({
        "doc_id": [d["doc_id"] for d in docs],
        "spans": [d["spans"] for d in docs]})
    rows = {}
    for b in extract_iter_arrow(iter([batch])):
        for r in b.to_pylist():
            rows[r["doc_id"]] = r
    assert len(rows) == len(docs)
    assert_equal(docs, rows)


@pytest.mark.spark
def test_spark_normal_path_equals_oracle(spark):
    docs = [d for d in gen_corpus(80, seed=42, giants=0)]
    df = corpus_to_spark_df(spark, docs)
    rows = {r["doc_id"]: r.asDict() for r in run_extract(df, 4).collect()}
    assert len(rows) == len(docs)
    assert_equal(docs, rows)


@pytest.mark.spark
def test_spark_skew_path_equals_oracle(spark):
    docs = gen_corpus(40, seed=11, giants=2)
    df = corpus_to_spark_df(spark, docs)
    out = run_extract_skewed(df, skew_threshold=2000, num_partitions=4)
    rows = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert len(rows) == len(docs)
    assert_equal(docs, rows)


def test_offsets_are_monotonic_and_cover_text():
    """Property (kb_chunker.py:217-228 coverage-invariant analogue):
    offsets are the running sum of text lengths — no gaps, no overlaps."""
    docs = gen_corpus(60, seed=3, giants=1)
    for d in docs:
        o = extract_document(d["doc_id"], d["spans"])
        running = 0
        for s in o["spans"]:
            assert s["offset"] == running
            running += len(s["text"])
        assert running == o["n_chars"]
