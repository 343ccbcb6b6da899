"""Pins for the document-management job-admin folds
(operators/job_admin vs app/api/documents/management_routes.py)."""

from mivaa_pdf_extractor_spark.operators import job_admin as ja


def _ev(spark, n=1000):
    return spark.range(0, n).withColumnRenamed("id", "event_id")


def test_status_fold_matches_reference(spark):
    jobs = ja.synth_status_jobs(_ev(spark))
    rows = [r.asDict() for r in jobs.collect()]
    got = {r["job_id"]: r.asDict()
           for r in ja.status_fold(jobs).collect()}
    for r in rows:
        g = got[r["job_id"]]
        # transcription of :59-193
        if r["exists_db"]:
            want = "ok"
        elif r["in_memory"]:
            want = "sync_failure"
        else:
            want = "not_found"
        assert g["outcome"] == want
        if r["exists_db"] and r["in_memory"]:
            # .get('progress', 0): default only covers ABSENT keys —
            # a present-NULL db progress stays None
            db_p = r["db_progress"]
            mem_p = r["mem_progress"] if r["mem_progress"] is not None \
                else 0
            matches = (r["mem_status"] == r["db_status"]
                       and mem_p == db_p)
            assert g["matches_db"] == int(matches), r
        else:
            assert g["matches_db"] is None
        # delete mode (:551-570)
        status = r["db_status"] if r["exists_db"] else "unknown"
        assert g["preserve_outputs"] == int(status == "completed")


def test_null_db_progress_never_matches_memory_zero(spark):
    jobs = spark.createDataFrame(
        [(1, True, True, "processing", "processing", None, None)],
        "job_id long, exists_db boolean, in_memory boolean, "
        "db_status string, mem_status string, db_progress long, "
        "mem_progress long")
    row = ja.status_fold(jobs).collect()[0]
    # memory defaults to 0, db keeps its stored None → mismatch
    assert row["matches_db"] == 0


def test_restart_plan_matches_reference(spark):
    jobs = ja.synth_restart_jobs(_ev(spark))
    rows = [r.asDict() for r in jobs.collect()]
    got = {r["job_id"]: r.asDict()
           for r in ja.restart_plan(jobs).collect()}
    outcomes = set()
    for r in rows:
        g = got[r["job_id"]]
        # transcription of :221-436
        fp = r["file_path"]
        if fp is not None and fp.startswith("/tmp/"):
            fp = r["file_url"]
            tmp_no_url = not fp
        else:
            tmp_no_url = False
        if r["checkpoint_stage"] is None:
            want = "no_checkpoint"
        elif not r["verify_ok"]:
            want = "verify_failed"
        elif not r["job_exists"]:
            want = "job_not_found"
        elif not r["doc_exists"]:
            want = "doc_not_found"
        elif tmp_no_url:
            want = "temp_no_url"
        elif not fp:
            want = "no_file_path"
        else:
            want = "ok"
        assert g["outcome"] == want, (r["job_id"], g["outcome"], want)
        outcomes.add(want)
        if want == "ok":
            if fp.startswith("http://") or fp.startswith("https://"):
                assert g["source_kind"] == "url"
                assert g["bucket"] is None
            else:
                assert g["source_kind"] == "storage"
                if "/" in fp:
                    assert g["bucket"] == fp.split("/")[0]
                    assert g["storage_path"] == "/".join(
                        fp.split("/")[1:])
                else:
                    assert g["bucket"] == "pdf-documents"
                    assert g["storage_path"] == fp
            # .get semantics: absent → default, present-NULL → None
            want_model = r["discovery_model"] if r["has_model"] \
                else "claude-opus-4-8"
            assert g["resume_model"] == want_model
            want_ws = r["doc_workspace"] or ja.DEFAULT_WORKSPACE
            assert g["resume_workspace"] == want_ws
            assert g["prompt_enhancement"] == int(
                bool(r["prompt_enhancement"]))
    assert outcomes == {"no_checkpoint", "verify_failed",
                        "job_not_found", "doc_not_found", "temp_no_url",
                        "no_file_path", "ok"}


def test_tmp_replacement_flows_through_ladder(spark):
    """A /tmp/ file_path replaced by an http file_url resolves as a URL
    download — the replaced value flows through the rest of the
    ladder."""
    base = ("stage_1", True, True, True, True, None, True,
            ["products"], "ws-1", True)
    jobs = spark.createDataFrame(
        [(1, base[0], base[1], base[2], base[3], "/tmp/x.pdf",
          "https://cdn/y.pdf", True, None, True, ["products"], "ws-1",
          True),
         (2, base[0], base[1], base[2], base[3], "/tmp/x.pdf",
          "mybucket/inner/y.pdf", True, None, True, ["products"],
          "ws-1", True)],
        "job_id long, checkpoint_stage string, verify_ok boolean, "
        "job_exists boolean, doc_exists boolean, file_path string, "
        "file_url string, has_model boolean, discovery_model string, "
        "has_categories boolean, categories array<string>, "
        "doc_workspace string, prompt_enhancement boolean")
    rows = {r["job_id"]: r for r in ja.restart_plan(jobs).collect()}
    assert rows[1]["source_kind"] == "url"
    assert rows[1]["resolved_path"] == "https://cdn/y.pdf"
    # present-NULL discovery_model passes None through (.get pin)
    assert rows[1]["resume_model"] is None
    assert rows[2]["source_kind"] == "storage"
    assert rows[2]["bucket"] == "mybucket"
    assert rows[2]["storage_path"] == "inner/y.pdf"


def test_list_page_matches_reference(spark):
    ev = _ev(spark)
    reqs = [r.asDict() for r in ja.synth_list_requests(ev).collect()]
    jobs = [r.asDict() for r in ja.synth_list_jobs(ev).collect()]
    out = {}
    for r in ja.list_page(ja.synth_list_requests(ev),
                          ja.synth_list_jobs(ev)).collect():
        out.setdefault(r["request_id"], []).append(r.asDict())
    for r in reqs:
        got = out[r["request_id"]]
        sort = r["sort"]
        parts = sort.split(":")
        if len(parts) > 2:
            # ValueError → 500 handler (pin)
            assert len(got) == 1 and got[0]["page_error"] == 1
            continue
        if ":" in sort:
            field, direction = parts
            ascending = direction.lower() == "asc"
        else:
            field, ascending = "created_at", False
        pool = [j for j in jobs
                if r["status_filter"] is None
                or j["db_status"] == r["status_filter"]]
        key = "db_progress" if field == "progress" else "created_ord"
        pool.sort(key=lambda j: (j[key], j["job_id"]),
                  reverse=not ascending)
        want = [j["job_id"] for j in
                pool[r["offset"]:r["offset"] + r["limit"]]]
        got_ids = [g["job_id"] for g in
                   sorted(got, key=lambda g: (g["rk"] is None, g["rk"]))
                   if g["job_id"] is not None]
        assert got_ids == want, (r, got_ids, want)


def test_list_sort_case_pins(spark):
    """'created_at:DESC' is desc (not asc), 'progress:Asc' IS asc (the
    direction compare lowercases)."""
    reqs = spark.createDataFrame(
        [(1, None, "progress:Asc", 3, 0),
         (2, None, "created_at:DESC", 3, 0)],
        "request_id long, status_filter string, sort string, "
        "limit int, offset int")
    jobs = spark.createDataFrame(
        [(10, "pending", 5, 50), (11, "pending", 1, 99),
         (12, "pending", 9, 10)],
        "job_id long, db_status string, created_ord long, "
        "db_progress long")
    rows = ja.list_page(reqs, jobs).collect()
    by_req = {}
    for r in rows:
        by_req.setdefault(r["request_id"], []).append(
            (r["rk"], r["job_id"]))
    assert [j for _, j in sorted(by_req[1])] == [12, 10, 11]  # asc prog
    assert [j for _, j in sorted(by_req[2])] == [12, 10, 11]  # desc ord
