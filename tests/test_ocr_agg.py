"""Pins for the OCR result-shaping folds
(operators/ocr_agg vs app/services/pdf/ocr_service.py)."""

from mivaa_pdf_extractor_spark.operators import ocr_agg as oa


def _ev(spark, n=1000):
    return spark.range(0, n).withColumnRenamed("id", "event_id")


def test_result_fold_matches_reference(spark):
    ev = _ev(spark)
    calls = [r.asDict() for r in oa.synth_paddle_calls(ev).collect()]
    regions = [r.asDict() for r in oa.synth_paddle_regions(ev).collect()]
    blocks_per = {}
    for r in regions:
        if (r["content"] or "").strip():
            blocks_per[r["call_id"]] = blocks_per.get(r["call_id"], 0) + 1
    got = {r["call_id"]: r.asDict()
           for r in oa.paddle_result_fold(
               oa.synth_paddle_calls(ev),
               oa.synth_paddle_regions(ev)).collect()}
    for c in calls:
        g = got[c["call_id"]]
        nb = blocks_per.get(c["call_id"], 0)
        if not c["manager_present"]:
            # disabled manager: failed, attempts 0
            assert (g["method"], g["attempts_made"]) == \
                ("paddleocr_failed", 0)
            assert g["confidence"] == 0.0 and g["text"] == ""
        elif c["outcome"] == "parse_error":
            # retry exhaustion stamps MAX attempts
            assert (g["method"], g["attempts_made"]) == \
                ("paddleocr_failed", c["max_attempts"])
        elif c["outcome"] == "http_error":
            # HTTP tier stamps 0, not MAX (pin)
            assert (g["method"], g["attempts_made"]) == \
                ("paddleocr_failed", 0)
        else:
            assert g["method"] == "paddleocr"
            assert g["confidence"] == oa.SUCCESS_CONFIDENCE
            text = c["generated_text"] or ""
            assert g["text"] == text
            assert g["n_blocks"] == nb
            assert g["attempts_made"] == c["attempts"]
            # no-text only when BOTH text.strip() and blocks are falsy;
            # whitespace text + a surviving block is still a success
            assert g["is_no_text"] == int(not (text.strip() or nb))


def test_blocks_pixels_truncation(spark):
    calls = spark.createDataFrame(
        [(1, True, "ok", "t", 1, 4, 100, 64)],
        "call_id long, manager_present boolean, outcome string, "
        "generated_text string, attempts long, max_attempts long, "
        "img_w long, img_h long")
    regions = spark.createDataFrame(
        [(1, 0, "b", 0.0625, 0.0625, 0.1875, 0.5),   # 6.25 -> 6
         (1, 1, "  ", 0.0, 0.0, 1.0, 1.0),           # blank: dropped
         (1, 2, "c", 0.9375, 0.0, 1.0, 0.0625)],
        "call_id long, region_idx long, content string, x0 double, "
        "y0 double, x1 double, y1 double")
    got = {r["region_idx"]: r.asDict()
           for r in oa.blocks_pixels(calls, regions).collect()}
    assert set(got) == {0, 2}
    # int() truncation on the PRODUCTS; w from the difference
    assert (got[0]["x"], got[0]["y"]) == (6, 4)      # 6.25, 4.0
    assert got[0]["w"] == 12                          # 0.125*100 = 12.5
    assert got[0]["h"] == 28                          # 0.4375*64 = 28.0
    assert (got[2]["x"], got[2]["w"]) == (93, 6)      # 93.75, 6.25


def test_confidence_agg_matches_reference(spark):
    results = [r.asDict()
               for r in oa.synth_ocr_results(_ev(spark)).collect()]
    got = {r["crop_id"]: r.asDict()
           for r in oa.confidence_agg(
               oa.synth_ocr_results(_ev(spark))).collect()}
    per = {}
    for r in results:
        per.setdefault(r["crop_id"], []).append(r)
    for cid, rs in per.items():
        rs.sort(key=lambda r: r["idx"])
        # transcription of :357-411
        filtered = [r for r in rs if r["confidence"] >= 0.5]
        g = got[cid]
        if not filtered:
            assert g["text"] == "" and g["confidence"] == 0.0
            assert g["word_count"] == 0 and g["regions"] == 0
            assert g["methods_used"] == ""
            continue
        all_text = " ".join(r["text"] for r in filtered)  # no strip gate
        assert g["text"] == all_text
        assert abs(g["confidence"]
                   - sum(r["confidence"] for r in filtered)
                   / len(filtered)) < 1e-12
        assert g["word_count"] == len(all_text.split())
        assert g["regions"] == len(filtered)
        want = sorted(set(r["method"] for r in filtered if r["method"]))
        assert g["methods_used"] == ",".join(want)


def test_simple_text_strip_gate(spark):
    results = spark.createDataFrame(
        [(1, 0, "a", 0.9, "m"), (1, 1, "  ", 0.9, "m"),
         (1, 2, "b", 0.1, "m"), (2, 0, " ", 0.9, "m")],
        "crop_id long, idx long, text string, confidence double, "
        "method string")
    got = {r["crop_id"]: r["text_joined"]
           for r in oa.simple_text(results).collect()}
    # whitespace-only rows dropped; confidence plays no role here
    assert got[1] == "a b"
    assert got[2] == ""


def test_icon_fragments(spark):
    results = spark.createDataFrame(
        [(1, "paddleocr", "hello", 0.85, 2, 0),
         (2, "paddleocr", "fallback only", 0.85, 0, 0),
         (3, "paddleocr", "  ", 0.85, 0, 1),        # gated out
         (4, "paddleocr_failed", "x", 0.0, 0, 0)],  # gated out
        "call_id long, method string, text string, confidence double, "
        "n_blocks long, is_no_text int")
    blocks = spark.createDataFrame(
        [(1, 0, "b0", 5, 6, 7, 8), (1, 1, "b1", 1, 2, 3, 4)],
        "call_id long, region_idx long, text string, x long, y long, "
        "w long, h long")
    got = sorted(oa.icon_fragments(results, blocks).collect(),
                 key=lambda r: (r["call_id"], r["frag_idx"]))
    assert [(r["call_id"], r["frag_idx"], r["text"]) for r in got] == \
        [(1, 0, "b0"), (1, 1, "b1"), (2, 0, "fallback only")]
    # block fragments carry the PARENT result confidence
    assert all(r["confidence"] == 0.85 for r in got)
    assert got[0]["has_bbox"] == 1 and got[0]["x"] == 5
    # the no-block fallback has a NULL bbox
    assert got[2]["has_bbox"] == 0 and got[2]["x"] is None
