"""Pins for the continuation-17 route folds: project workspace, job /
mention tracking billing, endpoint registry, duplicate-detection gates,
feedback shapes, and the marketplace adapters."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import projects as prj
from mivaa_pdf_extractor_spark.operators import (
    job_track_routes as jtr)
from mivaa_pdf_extractor_spark.operators import (
    mention_track_routes as mtr)
from mivaa_pdf_extractor_spark.operators import (
    endpoint_registry as epr)
from mivaa_pdf_extractor_spark.operators import dup_routes as dpr
from mivaa_pdf_extractor_spark.operators import (
    feedback_routes as fbr)
from mivaa_pdf_extractor_spark.operators import bestprice as bp
from mivaa_pdf_extractor_spark.operators import idealo as idl


# ── project workspace ────────────────────────────────────────────────

def test_project_limit_then_filter_loses_eligible_rows(spark):
    # one user, 10 projects: ranks 1..10 by activity; ranks 1-8 fetched.
    # ranks 1-4 archived -> hidden; ranks 9-10 eligible but beyond the
    # limit -> lost_to_limit (an eligible-only ranking would show them)
    rows = [(i, 0, "archived" if i < 4 else "planning",
             100 - i, False) for i in range(10)]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["project_id", "user_id", "status",
                       "activity_rank", "include_archived"]))
    out = prj.project_list_filter(df).collect()[0]
    assert out.fetched_count == 8
    assert out.visible_count == 4
    assert out.lost_to_limit == 2


def test_orphan_subtask_dropped(spark):
    # parent 1 in project 0; sub 2 -> parent 1 (same project, counted);
    # sub 3 -> parent 99 (missing, dropped); sub 4 -> parent 1 but in
    # project 1 (cross-project, dropped)
    rows = [(1, 0, None, "todo", 0, 1),
            (2, 0, 1, "done", 0, 2),
            (3, 0, 99, "done", 0, 3),
            (4, 1, 1, "done", 0, 4)]
    pdf = pd.DataFrame(rows, columns=[
        "task_id", "project_id", "parent_task_id", "status",
        "sort_order", "created_at"])
    pdf["parent_task_id"] = pdf["parent_task_id"].astype("Int64")
    out = {r.task_id: r
           for r in prj.project_task_rollup(
               spark.createDataFrame(pdf)).collect()}
    assert set(out) == {1}              # only the parent row survives
    assert out[1].sub_total == 1        # orphans not counted
    assert out[1].sub_done == 1


def test_subtask_inherits_null_parent_room(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [(0, True, True, True, None, "req-room-x")],
        columns=["req_id", "has_parent", "parent_exists",
                 "parent_in_project", "parent_room_id",
                 "req_room_id"]))
    out = prj.task_room_inherit(df).collect()[0]
    assert out.status == 201
    assert out.effective_room_id is None   # NULL overrides the request


# ── job-tracking billing ─────────────────────────────────────────────

def _refresh(spark, **kw):
    base = dict(run_id=0, has_user=True, debit_ok=True, raised=False,
                skipped=False, error_str=None, has_cae=True, cae=0,
                persisted=0)
    base.update(kw)
    pdf = pd.DataFrame([base])
    pdf["error_str"] = pdf["error_str"].astype(object)
    pdf["cae"] = pdf["cae"].astype("Int32")
    pdf["persisted"] = pdf["persisted"].astype("Int32")
    return jtr.job_refresh_credit(
        spark.createDataFrame(pdf)).collect()[0]


def test_userless_refresh_runs_free(spark):
    out = _refresh(spark, has_user=False, debit_ok=False)
    assert out.status == 200            # debit never attempted
    assert not out.refunded
    assert out.credits_debited == 0


def test_empty_string_error_keeps_credit(spark):
    assert _refresh(spark, error_str="").credits_debited == 5
    assert _refresh(spark, error_str="boom").refunded


def test_h15_noop_needs_present_positive_cae(spark):
    # absent key keeps; explicit 0 keeps; >0 with persisted 0 refunds
    assert _refresh(spark, has_cae=False).credits_debited == 5
    assert _refresh(spark, cae=0).credits_debited == 5
    assert _refresh(spark, cae=3, persisted=0).refunded
    assert _refresh(spark, cae=3, persisted=2).credits_debited == 5


def test_correction_note_empty_reason_and_cap(spark):
    long = "x" * 300
    df = spark.createDataFrame(pd.DataFrame(
        [(0, True, True, "match", ""),
         (1, True, True, "mismatch", long)],
        columns=["req_id", "listing_exists", "parent_owned",
                 "corrected_relevance", "reason"]))
    out = {r.req_id: r
           for r in jtr.correct_match_note(df).collect()}
    assert out[0].match_note == "User corrected: no reason given"
    assert len(out[1].match_note) == 240
    assert out[1].match_note == ("User corrected: " + long)[:240]


# ── mention-tracking billing ─────────────────────────────────────────

def test_mention_userless_still_billed(spark):
    # opposite of the job route: debit always attempted
    df = spark.createDataFrame(pd.DataFrame(
        [(0, False, False, "ok")],
        columns=["run_id", "debit_ok", "raised", "outcome_status"]))
    out = mtr.mention_refresh_credit(df).collect()[0]
    assert out.status == 402            # the '' user's debit failed


def test_probe_completed_with_errors_refunds(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [(0, True, False, "completed_with_errors"),
         (1, True, False, "completed")],
        columns=["run_id", "debit_ok", "raised", "result_status"]))
    out = {r.run_id: r for r in mtr.probe_llm_credit(df).collect()}
    assert out[0].refunded and out[0].credits_debited == 0
    assert out[1].credits_debited == 15


# ── endpoint registry lock replay ────────────────────────────────────

def test_lock_replay_dup_start_unmatched_end(spark):
    # seq: end(inv), start(v), start(inv), end(v), end(inv), start(v)
    ops = [(0, i, "job-a", op) for i, op in enumerate(
        ["end", "start", "start", "end", "end", "start"])]
    df = spark.createDataFrame(pd.DataFrame(
        ops, columns=["registry_id", "seq", "job_id", "op"]))
    out = sorted(epr.processing_lock_replay(df).collect(),
                 key=lambda r: r.seq)
    assert [r.valid for r in out] == [False, True, False, True,
                                      False, True]
    assert [r.active_after for r in out] == [0, 1, 1, 0, 0, 1]
    assert out[-1].can_auto_pause is False


# ── duplicate-detection gates ────────────────────────────────────────

def test_ws_reconcile_two_absent_ids_still_403(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [(0, None, None), (1, "ws-1", "ws-1"), (2, "", "")],
        columns=["req_id", "ctx_ws", "body_ws"]))
    out = {r.req_id: r.status for r in dpr.ws_reconcile(df).collect()}
    assert out == {0: 403, 1: 200, 2: 403}


def test_merge_envelope_double_wrap(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [(0, True, False, "x", False, False, None),
         (1, True, False, "x", False, True, None),
         (2, True, False, "x", False, True, "bad target")],
        columns=["req_id", "ws_ok", "raised", "exc_msg",
                 "svc_success", "has_error", "error"]))
    out = {r.req_id: r
           for r in dpr.merge_route_envelope(df).collect()}
    assert out[0].detail == "500: Merge failed"   # absent error
    assert out[1].detail == "500: None"           # present-None
    assert out[2].detail == "500: bad target"


# ── feedback shapes ──────────────────────────────────────────────────

def test_feedback_is_verified_forced_false(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [(0, "jwt-ws", "jwt-u", "body-ws", True, True, True, True)],
        columns=["req_id", "ctx_ws", "jwt_sub", "body_ws",
                 "body_is_verified", "is_public", "has_context",
                 "insert_ok"]))
    out = fbr.feedback_submit_fold(df).collect()[0]
    assert out.stored_is_verified is False
    assert out.stored_workspace_id == "jwt-ws"
    assert out.stored_user_id == "jwt-u"


# ── marketplace adapters ─────────────────────────────────────────────

def _bp_search_row(**kw):
    base = dict(
        req_id=0, api_configured=True,
        query="alpha modelx premium item 1042",
        found=True, sr_name="Alpha ModelX 1042",
        product_url="https://www.bestprice.gr/to/1/alpha-modelx-1042.html",
        price_str="49.5", original_price_str=None, currency="EUR",
        availability="In stock", page_raised=False, page_found=True,
        page_product_name="Alpha ModelX 1042", has_facets=True,
        sku_tokens=["1042"], product_type="")
    base.update(kw)
    return base


def test_bestprice_failed_fanout_falls_back_single(spark):
    # fanout wanted (/to/ URL) but zero usable shops -> fallback_single
    search = spark.createDataFrame(pd.DataFrame([_bp_search_row()]))
    shops = spark.createDataFrame(
        pd.DataFrame([(0, 0, "", "https://s.gr/x", "10", "ok")],
                     columns=["req_id", "sidx", "merchant_name",
                              "merchant_url", "price",
                              "availability"]))
    out = bp.bestprice_decisions(search, shops).collect()[0]
    assert out.decision == "fallback_single"
    assert out.wanted_fanout is True
    hits = bp.bestprice_hits(search, shops).collect()
    assert len(hits) == 1
    assert hits[0].availability == "In stock"   # raw passthrough


def test_bestprice_plausibility_before_facets(spark):
    # implausible name+url AND facet-missing sku: plausibility wins
    search = spark.createDataFrame(pd.DataFrame([_bp_search_row(
        sr_name="Totally Different Gadget",
        product_url="https://www.bestprice.gr/to/1/other-thing.html",
        sku_tokens=["999111"])]))
    shops = spark.createDataFrame(
        [], "req_id long, sidx int, merchant_name string, "
            "merchant_url string, price string, availability string")
    out = bp.bestprice_decisions(search, shops).collect()[0]
    assert out.decision == "dropped_implausible"


def test_idealo_slice_before_filter(spark):
    # limit 2: rows 0-1 are junk (price 0 / aggregator), row 2 is good
    # but beyond the slice -> nothing survives
    rows = [(0, 0, 2, "www.idealo.de", "q", True, 0.0, "Shop A",
             "https://a.de/1", "EUR"),
            (0, 1, 2, "www.idealo.de", "q", True, 9.9, "idealo",
             "https://a.de/2", "EUR"),
            (0, 2, 2, "www.idealo.de", "q", True, 9.9, "Shop B",
             "https://a.de/3", "EUR")]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["req_id", "lidx", "lim", "host", "query",
                       "price_parsable", "price", "retailer_name",
                       "product_url", "currency"]))
    assert idl.idealo_listing_filter(df).count() == 0


def test_idealo_fr_not_blocklisted(spark):
    rows = [(0, 0, 5, "www.idealo.de", "q", True, 9.9, "idealo.fr",
             "https://a.fr/1", "EUR")]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["req_id", "lidx", "lim", "host", "query",
                       "price_parsable", "price", "retailer_name",
                       "product_url", "currency"]))
    out = idl.idealo_listing_filter(df).collect()
    assert len(out) == 1 and out[0].retailer_name == "idealo.fr"
