"""Pins for the admin prompt-management folds
(operators/prompt_admin vs
app/services/utilities/admin_prompt_service.py)."""

from mivaa_pdf_extractor_spark.operators import prompt_admin as pa


def _ev(spark, n=1000):
    return spark.range(0, n).withColumnRenamed("id", "event_id")


def _no_filter(v):
    # `if p and p != 'all'` — falsy ('' / None) or 'all' skip the filter
    return (not v) or v == "all"


def test_list_prompts_matches_reference(spark):
    prompts = pa.synth_prompts(_ev(spark))
    combos = pa.synth_combos(spark)
    rows = [r.asDict() for r in prompts.collect()]
    got = {(r["combo_id"], r["prompt_id"]): r.asDict()
           for r in pa.list_prompts(prompts, combos).collect()}
    n_expected = 0
    for combo in pa.FILTER_COMBOS:
        cid, f_stage, f_cat, f_ptype = combo
        for p in rows:
            # transcription of get_prompts (:46-56)
            if not p["is_active"]:
                continue
            if not _no_filter(f_stage) and p["stage"] != f_stage:
                continue
            if not _no_filter(f_cat) and p["category"] != f_cat:
                continue
            if not _no_filter(f_ptype) and p["prompt_type"] != f_ptype:
                continue
            n_expected += 1
            g = got[(cid, p["id"])]
            # row transform (:60-76): falsy-`or` ladders
            assert g["workspace_out"] == (p["workspace_id"] or "ws-param")
            assert g["stage_out"] == (p["stage"] or "general")
            assert g["prompt_template"] == (
                p["prompt_text"] or p["system_prompt"] or "")
            # .get('is_custom', False)/.get('version', 1) are ABSENT-key
            # defaults: a present-NULL column value passes through
            want_custom = None if p["is_custom"] is None \
                else int(p["is_custom"])
            assert g["is_custom_out"] == want_custom
            assert g["version_out"] == p["version"]
            assert g["used_in_joined"] == ",".join(p["used_in"] or [])
    assert len(got) == n_expected
    # the NULL-stage ⇒ 'general' fallback must actually fire
    assert any(g["stage_out"] == "general" for g in got.values())
    # present-NULL is_custom survives (the dict default is dead here)
    assert any(g["is_custom_out"] is None for g in got.values())


def test_filter_sentinels_all_equivalent(spark):
    # combos 0 (NULLs), 1 ('all'), and the ''-stage/ptype parts of 5
    # must not filter anything: combo 0 and combo 1 see identical sets
    prompts = pa.synth_prompts(_ev(spark))
    out = pa.list_prompts(prompts, pa.synth_combos(spark))
    by_combo = {r["combo_id"]: r["n"] for r in
                out.groupBy("combo_id").count()
                .withColumnRenamed("count", "n").collect()}
    assert by_combo[0] == by_combo[1]
    assert by_combo[0] > by_combo.get(2, 0)  # stage filter really filters


def test_resolve_updates_matches_reference(spark):
    prompts = pa.synth_prompts(_ev(spark))
    updates = pa.synth_updates(_ev(spark))
    prows = [r.asDict() for r in prompts.collect()]
    # transcription of update_prompt (:130-145): active rows only,
    # keyed by (ws, stage, category), max version wins (id desc pins
    # the reference's unspecified tie order deterministically)
    best = {}
    for p in prows:
        if not p["is_active"]:
            continue
        k = (p["workspace_id"], p["stage"], p["category"])
        cur = best.get(k)
        if cur is None or (p["version"], p["id"]) > (cur["version"],
                                                     cur["id"]):
            best[k] = p
    got = {r["update_id"]: r.asDict()
           for r in pa.resolve_updates(prompts, updates).collect()}
    saw_update = saw_insert = False
    for u in updates.collect():
        u = u.asDict()
        g = got[u["update_id"]]
        cur = best.get((u["u_ws"], u["u_stage"], u["u_category"]))
        if cur is not None:
            saw_update = True
            assert g["branch"] == "update"
            assert g["target_id"] == cur["id"]
            assert g["new_version"] == cur["version"] + 1
            # H9 fix: the row's REAL prompt_type is preserved
            assert g["prompt_type_out"] == cur["prompt_type"]
            # audit trail reads the LEGACY prompt_template column,
            # not the prompt_text the update path writes (:151-156)
            assert g["audit_old_prompt"] == cur["prompt_template"]
            assert g["audit_new_prompt"] == u["new_template"]
        else:
            saw_insert = True
            assert g["branch"] == "insert"
            assert g["target_id"] is None
            assert g["new_version"] == 1
            assert g["prompt_type_out"] == "extraction"
            assert g["audit_old_prompt"] is None
            assert g["audit_new_prompt"] is None
        assert g["is_custom_out"] is True
    assert saw_update and saw_insert


def test_update_lookup_is_type_agnostic(spark):
    # a lone active 'classification' row must take the update branch
    # and keep its type (audit #217 H9 — the pre-fix extraction-only
    # lookup would have inserted an inert 'extraction' duplicate)
    prompts = spark.createDataFrame(
        [(7, "ws-1", "stage-1", "cat-1", "n", "classification",
          "pt", "sp", "legacy", True, 3, ["svc"], True)],
        "id long, workspace_id string, stage string, category string, "
        "name string, prompt_type string, prompt_text string, "
        "system_prompt string, prompt_template string, "
        "is_custom boolean, version long, used_in array<string>, "
        "is_active boolean")
    updates = spark.createDataFrame(
        [(1, "ws-1", "stage-1", "cat-1", "new", None, "u")],
        "update_id long, u_ws string, u_stage string, u_category string, "
        "new_template string, new_system string, changed_by string")
    row = pa.resolve_updates(prompts, updates).collect()[0]
    assert row["branch"] == "update"
    assert row["prompt_type_out"] == "classification"
    assert row["new_version"] == 4
    assert row["audit_old_prompt"] == "legacy"


def test_history_top5(spark):
    hist = pa.synth_history(_ev(spark))
    got = pa.history_top5(hist).collect()
    per = {}
    for r in got:
        per.setdefault(r["prompt_id"], []).append(r)
    hrows = [r.asDict() for r in hist.collect()]
    for pid, rs in per.items():
        mine = sorted((h for h in hrows if h["prompt_id"] == pid),
                      key=lambda h: h["changed_at"], reverse=True)[:5]
        assert len(rs) == len(mine) <= 5
        rs.sort(key=lambda r: r["rn"])
        assert [r["new_prompt_text"] for r in rs] == \
            [h["new_prompt_text"] for h in mine]
