"""Pins for the continuation-17 service folds: turnstile ladder, SLIG
resize/router, paddle region shaping, metering directions, bulk-site
dedup, rasterize crop."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import turnstile as ts
from mivaa_pdf_extractor_spark.operators import slig_client as slc
from mivaa_pdf_extractor_spark.operators import slig_modes as slm
from mivaa_pdf_extractor_spark.operators import paddle_parse as ppz
from mivaa_pdf_extractor_spark.operators import metering as mtg
from mivaa_pdf_extractor_spark.operators import (
    job_sites_admin as jsa)
from mivaa_pdf_extractor_spark.operators import rasterize as rz


TS_COLS = ["req_id", "secret_configured", "token", "net_raised",
           "cf_success", "cf_error_codes", "expected_action",
           "action", "hostname"]


def test_turnstile_action_mismatch_only_on_success(spark):
    rows = [
        # success + expected + differing action -> mismatch, keeps host
        (0, True, "tok", False, True, "", "tools_scan", "other", "h1"),
        # FAILED verify with mismatched action keeps original codes
        (1, True, "tok", False, False, "invalid-input-response",
         "tools_scan", "other", "h2"),
        # NULL action on success with expected IS a mismatch
        (2, True, "tok", False, True, "", "tools_scan", None, "h3"),
        # '' expected_action skips the check
        (3, True, "tok", False, True, "", "", "other", "h4")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=TS_COLS))
    out = {r.req_id: r for r in ts.turnstile_verdict(df).collect()}
    assert out[0].error_codes == "action_mismatch"
    assert out[0].success is False and out[0].hostname == "h1"
    assert out[1].error_codes == "invalid-input-response"
    assert out[2].error_codes == "action_mismatch"
    assert out[3].success is True and out[3].error_codes == ""


def test_slig_resize_thumbnail_arithmetic(spark):
    rows = [(0, 2000, 1500, "RGB"),   # landscape: x=512, y=round(384)
            (1, 100, 1024, "RGBA"),   # portrait: y=512, x=50
            (2, 512, 512, "P"),       # no resize
            (3, 513, 1, "L")]         # extreme aspect, y floors to 1
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["img_id", "width", "height", "mode"]))
    out = {r.img_id: r for r in slc.slig_resize_plan(df).collect()}
    assert (out[0].out_w, out[0].out_h) == (512, 384)
    assert (out[1].out_w, out[1].out_h) == (50, 512)
    assert out[1].converted_rgb is True
    assert out[2].resized is False and out[2].out_w == 512
    assert (out[3].out_w, out[3].out_h) == (512, 1)   # min-1 floor


def test_slig_auto_mode_http_prose_is_image(spark):
    base = dict(req_id=0, mode_param="auto", input_kind="str",
                str_prefix="plain", str_len=40,
                all_members_short_nonurl=True,
                has_candidate_labels=False,
                candidate_labels_str="a,b", api_key="k",
                auth_header="Bearer k")
    rows = [dict(base, req_id=0, str_prefix="http"),
            dict(base, req_id=1, str_len=900),
            dict(base, req_id=2),
            dict(base, req_id=3, input_kind="dict_images",
                 has_candidate_labels=True)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = {r.req_id: r for r in slm.slig_mode_route(df).collect()}
    assert out[0].resolved_mode == "image_embedding"   # 'http' prefix
    assert out[1].resolved_mode == "image_embedding"   # >=500 chars
    assert out[2].resolved_mode == "text_embedding"
    # dict-with-images beats candidate_labels (ladder order)
    assert out[3].resolved_mode == "similarity"


PB_COLS = ["req_id", "bidx", "has_bbox", "bbox_len", "block_order",
           "block_id", "block_label", "label", "block_content",
           "content"]


def test_paddle_order_ladder_and_shifting_fallback(spark):
    rows = [
        # bidx0: skipped (bad bbox) — must NOT advance the fallback
        (0, 0, False, 4, None, None, "t", None, "a", None),
        # bidx1: explicit 0 order KEPT (None-coalescing, not or)
        (0, 1, True, 4, 0, 7, "t", None, "b", None),
        # bidx2: no order/id -> len(regions)=1 (one kept so far)
        (0, 2, True, 4, None, None, "", "", None, None)]
    pdf = pd.DataFrame(rows, columns=PB_COLS)
    pdf["block_order"] = pdf["block_order"].astype("Int32")
    pdf["block_id"] = pdf["block_id"].astype("Int32")
    df = spark.createDataFrame(pdf)
    out = {r.bidx: r for r in ppz.paddle_region_fold(df).collect()}
    assert set(out) == {1, 2}
    assert out[1].order_out == 0          # explicit 0 survives
    assert out[2].order_out == 1          # shifted by the earlier skip
    assert out[2].label_out == "text"     # '' falls to default
    assert out[2].content_out == ""


def test_meter_zero_credits_required_no_402(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [(0, "s", None, False, False, "quota thing", 0, None),
         (1, "s", None, False, False, "quota thing", 3, None)],
        columns=["call_id", "sub", "user_id_alt", "rpc_raised",
                 "rpc_success", "error", "credits_required",
                 "credits_debited"]))
    out = {r.call_id: r
           for r in mtg.meter_operation_fold(df).collect()}
    assert out[0].status == 200 and out[0].proceeded   # 0 is falsy
    assert out[1].status == 402                        # truthy


def test_price_debit_fail_closed_directions(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [(0, 0, None, False, True, True),     # free even userless
         (1, 3, None, False, True, True),     # positive, no user
         (2, 3, "u", False, True, False)],    # success=false row
        columns=["debit_id", "amount", "user_id", "rpc_raised",
                 "has_data", "row_success"]))
    out = {r.debit_id: r for r in mtg.price_debit_gate(df).collect()}
    assert out[0].proceed is True and out[0].reason == "free"
    assert out[1].proceed is False and out[1].reason == "no_user"
    assert out[2].proceed is False and out[2].reason == "insufficient"


def test_bulk_dedup_keeps_first_case(spark):
    rows = [(0, 0, "rss_feed_default", " Foo.GR ", None),
            (0, 1, "rss_feed_default", "foo.gr", None),
            (0, 2, "rss_feed_default", "   ", None)]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["batch_id", "uidx", "site_type", "raw_url",
                       "insert_error"]))
    out = {r.uidx: r for r in jsa.job_sites_bulk_clean(df).collect()}
    assert out[0].kept and out[0].stored_value == "Foo.GR"
    assert not out[1].kept                     # lowercase-key dup
    assert not out[2].kept                     # empty after strip


def test_rasterize_degenerate_crop_full_page(spark):
    base = dict(req_id=0, source_pdf_id="pdf-1", secret_configured=True,
                secret_match=True, pdf_found=True, pdf_valid=True,
                page_no=7, total_pages=32, has_bbox=True,
                x1=0.5, y1=0.5, x2=0.5, y2=0.75,
                page_w=1000, page_h=800, target_override=None)
    rows = [base, dict(base, req_id=1, x2=0.75)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = {r.req_id: r for r in rz.rasterize_plan(df).collect()}
    assert out[0].crop_result == "degenerate"
    assert (out[0].out_w, out[0].out_h) == (1000, 800)  # full page
    assert out[1].crop_result == "valid"
    assert (out[1].out_w, out[1].out_h) == (250, 200)
    assert "page-0007-" in out[1].storage_target
