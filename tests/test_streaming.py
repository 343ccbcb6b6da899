"""Incremental (Trigger.AvailableNow) extraction — SURVEY.md §2.10 X1-X3.

The stream's checkpointLocation gives ingest-level exactly-once over source
files; results must equal the batch pipeline's on the same documents, and a
second invocation after new files land must process ONLY the new files.
"""

from __future__ import annotations

import pytest

from mivaa_pdf_extractor_spark.operators.extract import run_extract
from mivaa_pdf_extractor_spark.sources.synthetic import (corpus_to_spark_df,
                                                         gen_corpus)
from mivaa_pdf_extractor_spark.sources.tables_io import Catalog
from mivaa_pdf_extractor_spark.streaming.incremental import run_incremental


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return {
        "src": str(src),
        "warehouse": str(tmp_path / "wh"),
        "stream_cp": str(tmp_path / "stream_cp"),
    }


def _write_files(spark, docs, path):
    corpus_to_spark_df(spark, docs).coalesce(1) \
        .write.mode("append").parquet(path)


def test_available_now_matches_batch_and_resumes(spark, dirs):
    docs1 = gen_corpus(40, seed=7)
    _write_files(spark, docs1, dirs["src"])

    catalog = Catalog(spark, dirs["warehouse"])
    run_incremental(spark, dirs["src"], catalog, dirs["stream_cp"])

    got = {r["doc_id"]: r for r in catalog.read("extracted").collect()}
    want = {r["doc_id"]: r
            for r in run_extract(corpus_to_spark_df(spark, docs1)).collect()}
    assert set(got) == set(want)
    for d, row in want.items():
        assert [tuple(s) for s in got[d]["spans"]] == \
            [tuple(s) for s in row["spans"]], d

    # second batch of files: only the delta is processed (no duplicates of
    # batch 1 in the sink; all of batch 2 present)
    docs2 = [{**d, "doc_id": "b2-" + d["doc_id"]}
             for d in gen_corpus(25, seed=8)]
    _write_files(spark, docs2, dirs["src"])
    run_incremental(spark, dirs["src"], catalog, dirs["stream_cp"])

    out = catalog.read("extracted")
    assert out.count() == len(docs1) + len(docs2)
    assert out.select("doc_id").distinct().count() == len(docs1) + len(docs2)

    # idempotence: nothing new -> nothing appended
    run_incremental(spark, dirs["src"], catalog, dirs["stream_cp"])
    assert catalog.read("extracted").count() == len(docs1) + len(docs2)
