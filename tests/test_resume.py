"""Checkpoint/resume semantics (SURVEY.md §5.2.4, J1): a partial run followed
by a resumed run produces exactly the single-run result; retryable statuses
are reprocessed; the circuit breaker trips on an all-failed run."""

import pytest

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.plans.pipeline import (CircuitBreakerTripped,
                                                      read_extracted_latest,
                                                      run_pipeline)
from mivaa_pdf_extractor_spark.sources.synthetic import (INPUT_SCHEMA,
                                                          corpus_to_spark_df,
                                                          gen_corpus)
from mivaa_pdf_extractor_spark.sources.tables_io import Catalog

from .conftest import spans_tuples


@pytest.fixture
def corpus():
    return gen_corpus(50, seed=5, giants=1)


def test_partial_then_resume_equals_single_run(spark, tmp_path, corpus):
    full = corpus_to_spark_df(spark, corpus)

    # single-shot reference run
    cat_once = Catalog(spark, str(tmp_path / "once"))
    run_pipeline(spark, full, cat_once, run_id="single")
    expected = {
        r["doc_id"]: (spans_tuples(r["spans"]), r["status"])
        for r in read_extracted_latest(cat_once).collect()
    }

    # partial run (first 30 docs) then resume over the full input
    cat = Catalog(spark, str(tmp_path / "resumed"))
    part_ids = {d["doc_id"] for d in corpus[:30]}
    part = full.filter(F.col("doc_id").isin(*part_ids))
    r1 = run_pipeline(spark, part, cat, run_id="r1")
    assert r1.docs_processed == 30

    # count_input is opt-in (full-scan metric; safe-at-scale default is off)
    r2 = run_pipeline(spark, full, cat, run_id="r2", count_input=True)
    assert r2.docs_skipped == 30          # anti-join skipped completed docs
    assert r2.docs_processed == len(corpus) - 30

    got = {
        r["doc_id"]: (spans_tuples(r["spans"]), r["status"])
        for r in read_extracted_latest(cat).collect()
    }
    assert got == expected


def test_retryable_status_is_reprocessed(spark, tmp_path):
    # doc with a NULL kind -> 'failed' (retryable) -> reprocessed on resume
    bad = [("doc-x", [(None, "t", "", 0)])]
    good = [("doc-x", [("text;page=1;y=1;x=1;size=10", "hello", "", 0)])]
    cat = Catalog(spark, str(tmp_path / "retry"))

    df_bad = spark.createDataFrame(bad, schema=INPUT_SCHEMA)
    with pytest.raises(CircuitBreakerTripped):
        run_pipeline(spark, df_bad, cat, run_id="r1")
    # the failed checkpoint row was still written before the breaker check
    df_good = spark.createDataFrame(good, schema=INPUT_SCHEMA)
    r2 = run_pipeline(spark, df_good, cat, run_id="r2")
    assert r2.docs_processed == 1 and r2.failures == 0

    latest = read_extracted_latest(cat).filter(F.col("doc_id") == "doc-x")
    row = latest.collect()[0]
    assert row["status"] == "completed"
    assert spans_tuples(row["spans"]) == [("text", "hello", "", 0, 1)]


def test_catalog_upsert(spark, tmp_path):
    """S5/S6/J7 upsert shape: second write with overlapping keys replaces
    matched rows and inserts new ones (parquet fallback mirrors what
    Iceberg MERGE INTO does; the MERGE statement itself is shape-pinned)."""
    from mivaa_pdf_extractor_spark.sources.tables_io import (Catalog,
                                                             merge_into_sql)

    assert merge_into_sql("local.db.extracted", "doc_id") == (
        "MERGE INTO local.db.extracted t USING __updates s "
        "ON t.doc_id = s.doc_id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *")

    cat = Catalog(spark, str(tmp_path / "upsert"))
    df1 = spark.createDataFrame([("a", 1), ("b", 1)], "doc_id string, v int")
    cat.upsert(df1, "t")
    df2 = spark.createDataFrame([("b", 2), ("c", 2)], "doc_id string, v int")
    cat.upsert(df2, "t")
    got = {(r["doc_id"], r["v"]) for r in cat.read("t").collect()}
    assert got == {("a", 1), ("b", 2), ("c", 2)}

    # versioned-swap mechanics: pointer names v2, previous version retained
    # for in-flight readers (atomic os.replace swap — no truncation window)
    import os
    root = str(tmp_path / "upsert" / "t")
    with open(os.path.join(root, "_VERSION")) as f:
        assert f.read().strip() == "v2"
    assert os.path.isdir(os.path.join(root, "v1"))
    df3 = spark.createDataFrame([("d", 3)], "doc_id string, v int")
    cat.upsert(df3, "t")
    assert not os.path.isdir(os.path.join(root, "v1"))  # GC'd (v2+v3 kept)
    assert len({r["doc_id"] for r in cat.read("t").collect()}) == 4


def test_oversize_gate(spark, tmp_path):
    """S1 size gate (pdf_processor.py:223): docs over the byte cap get the
    terminal 'oversize' status, never enter extraction, and are NOT retried
    on resume."""
    docs = [
        ("small", [("text;page=1;y=1;x=1;size=10", "hello", "", 0)]),
        ("big", [("text;page=1;y=1;x=1;size=10", "x" * 500, "", 0)]),
    ]
    cat = Catalog(spark, str(tmp_path / "oversize"))
    df = spark.createDataFrame(docs, schema=INPUT_SCHEMA)
    r1 = run_pipeline(spark, df, cat, run_id="r1", max_doc_bytes=100)
    assert r1.docs_processed == 2 and r1.failures == 0
    rows = {r["doc_id"]: r for r in read_extracted_latest(cat).collect()}
    assert rows["small"]["status"] == "completed"
    assert rows["big"]["status"] == "oversize"
    assert rows["big"]["spans"] == [] and rows["big"]["n_spans"] == 0
    # terminal: resume skips it (no reprocessing of oversize docs)
    r2 = run_pipeline(spark, df, cat, run_id="r2", max_doc_bytes=100,
                      count_input=True)
    assert r2.docs_skipped == 2 and r2.docs_processed == 0


def test_lineage_is_consistent(spark, tmp_path, corpus):
    cat = Catalog(spark, str(tmp_path / "lineage"))
    res = run_pipeline(spark, corpus_to_spark_df(spark, corpus), cat,
                       run_id="lin")
    lineage = cat.read("lineage").filter(F.col("run_id") == "lin")
    agg = lineage.agg(F.sum("docs").alias("docs"),
                      F.sum("spans").alias("spans")).collect()[0]
    assert int(agg["docs"]) == res.docs_processed == len(corpus)
    ext = cat.read("extracted").filter(F.col("run_id") == "lin")
    assert int(agg["spans"]) == ext.agg(F.sum("n_spans")).collect()[0][0]
