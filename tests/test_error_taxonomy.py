"""Pins for the PDF error-taxonomy folds
(operators/error_taxonomy vs app/utils/exceptions.py)."""

from mivaa_pdf_extractor_spark.operators import error_taxonomy as et


def _ev(spark, n=1000):
    return spark.range(0, n).withColumnRenamed("id", "event_id")


# faithful Python transcription of the reference classes (:46-374)
def _reference_response(r):
    cls = r["exc_class"]
    dm = et.DEFAULT_MESSAGES
    if cls in dm:
        msg = dm[cls] if r["message"] is None else r["message"]
    else:
        msg = r["message"]
    details = {}
    if cls == "PDFValidationError":
        details = {"file_path": r["file_path"]}
        if r["vdetails_mode"] == 1:
            details.update({"source": r["vsource"]})
        elif r["vdetails_mode"] == 2:
            details.update({"file_path": r["override_path"],
                            "source": r["vsource"]})
    elif cls == "PDFExtractionError":
        details = {"extraction_type": r["extraction_type"],
                   "page_number": r["page_number"]}
        if r["original_error"] is not None:
            details["original_error"] = r["original_error"]
            details["original_error_type"] = r["orig_type"]
    elif cls == "PDFDownloadError":
        details = {"url": r["url"], "status_code": r["dl_status"],
                   "timeout": r["timeout_flag"]}
    elif cls == "PDFSizeError":
        details = {"file_size_bytes": r["file_size"],
                   "max_size_bytes": r["max_size"]}
        if r["file_size"] and r["max_size"]:
            details["size_ratio"] = r["file_size"] / r["max_size"]
    elif cls == "PDFTimeoutError":
        details = {"timeout_seconds": r["timeout_seconds"],
                   "operation": r["operation"]}
    elif cls == "PDFConfigurationError":
        details = {"config_key": r["config_key"],
                   "config_value": str(r["config_value"])
                   if r["config_value"] is not None else None}
    elif cls == "PDFStorageError":
        details = {"operation": r["operation"],
                   "file_path": r["file_path"]}
    elif cls == "PDFFormatError":
        details = {"pdf_version": r["pdf_version"],
                   "is_encrypted": r["is_encrypted"]}
    elif cls == "PDFProcessingError":
        details = {}
    if cls in et.ERROR_CODES:
        code = et.ERROR_CODES[cls]
    elif cls == "PDFProcessingError":
        code = r["error_code_param"] or "PDF_PROCESSING_ERROR"
    else:
        # create_error_response non-custom branch (:365-373)
        return 500, "UNKNOWN_ERROR", msg, {"exception_type": cls}
    status = dict(et.STATUS_CODES)[cls]
    return status, code, msg, details


def test_error_responses_match_reference(spark):
    errs = et.synth_errors(_ev(spark))
    rows = [r.asDict() for r in errs.collect()]
    got = {r["event_id"]: r.asDict()
           for r in et.build_error_responses(errs).collect()}
    for r in rows:
        status, code, msg, details = _reference_response(r)
        g = got[r["event_id"]]
        assert g["status_code"] == status, r
        assert g["error_code"] == code, r
        assert g["message_out"] == msg, r
        assert g["detail_keys"] == ",".join(details.keys()), r
        flat = {"file_path": "d_file_path", "source": "d_source",
                "extraction_type": "d_extraction_type",
                "page_number": "d_page_number",
                "original_error": "d_original_error",
                "original_error_type": "d_original_error_type",
                "url": "d_url", "status_code": "d_status_code",
                "file_size_bytes": "d_file_size",
                "max_size_bytes": "d_max_size",
                "size_ratio": "d_size_ratio",
                "timeout_seconds": "d_timeout_seconds",
                "operation": "d_operation", "config_key": "d_config_key",
                "config_value": "d_config_value",
                "pdf_version": "d_pdf_version",
                "exception_type": "d_exception_type"}
        for k, v in details.items():
            if k == "timeout":
                want = None if v is None else int(v)
                assert g["d_timeout"] == want, r
            elif k == "is_encrypted":
                want = None if v is None else int(v)
                assert g["d_is_encrypted"] == want, r
            elif k == "size_ratio":
                assert abs(g["d_size_ratio"] - v) < 1e-12, r
            else:
                assert g[flat[k]] == v, (k, r)


def test_status_chain_base_last():
    # the dict lists every concrete subclass BEFORE the base fallback,
    # so the isinstance walk can never shadow a specific code with 500
    names = [n for n, _ in et.STATUS_CODES]
    assert names[-1] == "PDFProcessingError"
    assert len(set(names)) == len(names)


def test_size_ratio_falsy_gate(spark):
    # file_size=0 with a real max_size omits size_ratio entirely
    errs = et.synth_errors(_ev(spark)).filter(
        "exc_class = 'PDFSizeError' AND file_size = 0 "
        "AND max_size IS NOT NULL")
    rows = et.build_error_responses(errs).collect()
    assert rows
    for r in rows:
        assert r["detail_keys"] == "file_size_bytes,max_size_bytes"
        assert r["d_size_ratio"] is None


def test_config_value_zero_stringifies(spark):
    # str(config_value) fires on is-None, not falsy: 0 -> "0"
    errs = et.synth_errors(_ev(spark)).filter(
        "exc_class = 'PDFConfigurationError' AND config_value = 0")
    rows = et.build_error_responses(errs).collect()
    assert rows and all(r["d_config_value"] == "0" for r in rows)


def test_base_error_code_falsy_ladder(spark):
    # '' error_code folds to the default; a real one passes through
    errs = et.synth_errors(_ev(spark)).filter(
        "exc_class = 'PDFProcessingError'")
    rows = et.build_error_responses(errs).collect()
    by_param = {}
    for src, out in zip(errs.collect(), rows):
        by_param.setdefault(
            "" if not src["error_code_param"] else "set", out["error_code"])
    assert by_param[""] == "PDF_PROCESSING_ERROR"
    assert by_param.get("set", "EC-").startswith("EC-")


def test_wrap_resolve_matches_reference(spark):
    calls = et.synth_wrap_calls(_ev(spark))
    got = {r["call_id"]: r.asDict()
           for r in et.resolve_wraps(calls).collect()}
    saw = set()
    for c in calls.collect():
        g = got[c["call_id"]]
        if not c["reraise"]:
            assert g["outcome"] == "default_return"
            assert g["raised_class"] is None
        elif c["exc_class"] in et.PDF_FAMILY:
            # custom exceptions re-raise UNCHANGED — never re-wrapped
            assert g["outcome"] == "reraise_custom"
            assert g["raised_class"] == c["exc_class"]
            assert g["raised_message"] == c["message"]
            assert g["w_extraction_type"] is None
        else:
            assert g["outcome"] == "wrap_extraction"
            assert g["raised_class"] == "PDFExtractionError"
            assert g["raised_message"] == \
                f"{c['op_name']} failed: {c['message']}"
            assert g["w_original_error_type"] == c["exc_class"]
            assert g["raised_status"] == 422
        saw.add(g["outcome"])
    assert saw == {"default_return", "reraise_custom", "wrap_extraction"}


def test_handler_dispatch_sentry_ladder(spark):
    raised = spark.createDataFrame(
        [(1, "http", 500, "x", False), (2, "http", 502, "x", False),
         (3, "http", 400, "x", False), (4, "http", 401, "x", False),
         (5, "http", 403, "x", False), (6, "http", 404, "x", False),
         (7, "http", 422, "x", False),
         (8, "material_kai", 500, "mk down", False),
         (9, "general", 0, "boom", True),
         (10, "general", 0, "boom", False)],
        "raise_id long, exc_kind string, http_status long, "
        "detail string, debug boolean")
    got = {r["raise_id"]: r.asDict()
           for r in et.handler_dispatch(raised).collect()}
    # 5xx -> capture_exception; 4xx except the noisy three -> message
    assert got[1]["sentry_action"] == "capture_exception"
    assert got[2]["sentry_action"] == "capture_exception"
    assert got[3]["sentry_action"] == "capture_message"
    assert got[7]["sentry_action"] == "capture_message"
    for rid in (4, 5, 6):  # 401/403/404 send nothing
        assert got[rid]["sentry_action"] == "none"
    assert got[1]["error"] == "HTTP_500"
    # material-kai handler: fixed 503 envelope, no sentry
    assert got[8]["response_status"] == 503
    assert got[8]["sentry_action"] == "none"
    assert got[8]["detail_out"] == "mk down"
    # general: debug gate on the detail message
    assert got[9]["detail_out"] == "Internal server error: boom"
    assert got[10]["detail_out"] == "Internal server error"
    assert got[10]["error"] == "INTERNAL_SERVER_ERROR"
