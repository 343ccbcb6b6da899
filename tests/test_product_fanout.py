"""Pins for the parallel product-processor folds
(operators/product_fanout vs
app/api/pdf_processing/parallel_product_processor.py)."""

from mivaa_pdf_extractor_spark.operators import product_fanout as pf


def _ev(spark, n=1500):
    return spark.range(0, n).withColumnRenamed("id", "event_id")


def test_mode_gate_inclusive_at_two(spark):
    docs = spark.createDataFrame(
        [(1, 2, True, None, 4), (2, 3, True, None, 4),
         (3, 3, False, None, 4), (4, 0, True, 300, 4)],
        "doc_id long, n_products long, enable_parallel boolean, "
        "timeout_env long, max_concurrent long")
    got = {r["doc_id"]: r.asDict() for r in pf.fanout_plan(docs).collect()}
    # total_products <= 2 is sequential (inclusive); 3 is parallel
    assert got[1]["mode"] == "sequential"
    assert got[2]["mode"] == "parallel"
    # parallel disabled wins regardless of size
    assert got[3]["mode"] == "sequential"
    assert got[4]["mode"] == "sequential"
    # 600 s default; env override honored
    assert got[1]["per_product_timeout"] == 600
    assert got[4]["per_product_timeout"] == 300
    # concurrency only meaningful on the parallel path
    assert got[2]["effective_concurrency"] == 4
    assert got[1]["effective_concurrency"] is None


def test_rollup_matches_reference(spark):
    ev = _ev(spark)
    results = [r.asDict() for r in pf.synth_fanout_results(ev).collect()]
    links = {r["doc_id"]: r.asDict() for r in pf.synth_links(ev).collect()}
    got = {r["doc_id"]: r.asDict()
           for r in pf.fanout_rollup(pf.synth_fanout_results(ev),
                                     pf.synth_links(ev)).collect()}
    docs = {}
    for r in results:
        docs.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in docs.items():
        # transcription of :212-231, :338-365
        m = {"completed": 0, "failed": 0, "chunks": 0, "images": 0,
             "relationships": 0, "clip": 0}
        n_err = 0
        for r in rs:
            if r["gather_exception"]:
                # gather-level exception: error row appended, metrics
                # dict NEVER touched (the handlers were bypassed)
                n_err += 1
                continue
            if r["success"]:
                m["completed"] += 1
                m["chunks"] += r["chunks"]
                m["images"] += r["images"]
                m["relationships"] += r["relationships"]
                m["clip"] += r["clip_embeddings"]
            else:
                m["failed"] += 1
                if r["error"]:  # '' emits no error row (:351)
                    n_err += 1
        link = links.get(doc_id)
        rel = m["relationships"]
        if link is not None and not link["link_failed"]:
            rel += link["link_count"] or 0
        g = got[doc_id]
        assert g["products_completed"] == m["completed"]
        assert g["products_failed"] == m["failed"]
        assert g["total_chunks_created"] == m["chunks"]
        assert g["total_images_processed"] == m["images"]
        assert g["total_relationships_created"] == rel
        assert g["total_clip_embeddings"] == m["clip"]
        assert g["n_error_rows"] == n_err


def test_failure_rows_id_and_timeout_message(spark):
    results = spark.createDataFrame(
        [(1, 3, "Oak Table Set", False, False, True, "x", 600,
          0, 0, 0, 0),
         (1, 4, "Chair", False, False, False, "boom", 600, 0, 0, 0, 0),
         (1, 5, "OK prod", True, False, False, "", 600, 1, 1, 1, 1)],
        "doc_id long, product_index long, product_name string, "
        "success boolean, gather_exception boolean, timed_out boolean, "
        "error string, timeout_s long, chunks long, images long, "
        "relationships long, clip_embeddings long")
    got = {r["product_index"]: r.asDict()
           for r in pf.failure_rows(results).collect()}
    assert set(got) == {3, 4}  # success rows emit nothing
    # spaces -> underscores, 1-based index prefix
    assert got[3]["product_id"] == "product_3_Oak_Table_Set"
    assert got[3]["error_message"] == "Per-product timeout (600s) exceeded"
    assert got[4]["error_message"] == "boom"


def test_progress_ladder_band(spark):
    docs = spark.createDataFrame(
        [(1, 7, True, None, 4)],
        "doc_id long, n_products long, enable_parallel boolean, "
        "timeout_env long, max_concurrent long")
    rows = sorted(pf.progress_ladder(docs).collect(),
                  key=lambda r: r["k"])
    # int((k/total)*70) + 15 — starts above 15, ends exactly 85
    want = [int((k / 7) * 70) + 15 for k in range(1, 8)]
    assert [r["progress"] for r in rows] == want
    assert rows[-1]["progress"] == 85
