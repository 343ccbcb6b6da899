"""Pins for the background-agent folds
(operators/agent_enrich vs app/api/agent_routes.py)."""

from mivaa_pdf_extractor_spark.operators import agent_enrich as ae


def _ev(spark, n=1500):
    return spark.range(0, n).withColumnRenamed("id", "event_id")


def test_run_gate_pins(spark):
    reqs = spark.createDataFrame(
        [(1, "k", "Bearer k", "product-enrichment"),
         (2, "k", "k", "product-enrichment"),          # missing prefix
         (3, "k", None, "product-enrichment"),          # missing header
         (4, "", None, "product-enrichment"),           # auth disabled
         (5, None, None, "material-tagger"),            # auth disabled
         (6, "", None, "bogus"),
         (7, "k", "Bearer wrong", "bogus")],            # auth beats type
        "request_id long, expected_key string, auth_header string, "
        "agent_type string")
    got = {r["request_id"]: r.asDict()
           for r in ae.run_gate(reqs).collect()}
    assert got[1]["outcome"] == "accepted"
    assert got[2]["outcome"] == "unauthorized"
    assert got[3]["outcome"] == "unauthorized"
    # `if expected_key and ...` — empty/NULL key disables auth (pin)
    assert got[4]["outcome"] == "accepted"
    assert got[5]["outcome"] == "accepted"
    assert got[6]["outcome"] == "unknown_type"
    assert got[6]["detail"] == (
        "Unknown agent_type 'bogus'. Available: "
        "['product-enrichment', 'material-tagger']")
    assert got[7]["outcome"] == "unauthorized"  # auth checked first


def test_batch_plan_matches_reference(spark):
    ev = _ev(spark)
    runs = [r.asDict() for r in ae.synth_agent_runs(ev).collect()]
    products = [r.asDict() for r in ae.synth_agent_products(ev).collect()]
    products.sort(key=lambda p: (p["created_at"], p["product_id"]))
    got = {}
    for r in ae.batch_plan(ae.synth_agent_runs(ev),
                           ae.synth_agent_products(ev)).collect():
        got.setdefault(r["run_id"], []).append(r.asDict())
    for run in runs:
        # transcription: {**config, **input}, min(cap 200)
        batch = run["input_batch_size"] if run["input_batch_size"] \
            is not None else (run["config_batch_size"]
                              if run["config_batch_size"] is not None
                              else 20)
        batch = min(batch, 200)
        if run["agent_type"] == "product-enrichment":
            cand = [p for p in products
                    if (run["force_rewrite"] or p["description"] is None)
                    and (not run["category_filter"]
                         or p["category"] == run["category_filter"])]
        else:
            cand = [p for p in products
                    if p["image_url"] is not None
                    and (p["material_type"] is None or not p["tags"])]
        want = [p["product_id"] for p in cand[:batch]]
        rows = sorted(got.get(run["run_id"], []),
                      key=lambda r: r["item_idx"])
        assert [r["product_id"] for r in rows] == want, run
    # the 200 cap actually binds somewhere
    assert any(r["input_batch_size"] and r["input_batch_size"] > 200
               for r in runs)


def test_fence_strip_charset_bug(spark):
    resp = spark.createDataFrame(
        [(1, "null"), (2, "json stuff"), (3, '```json\n{"a": 1}\n```'),
         (4, "no fences here"), (5, '{"k": 1}```'),
         (6, "  sonja's data  ")],
        "response_id long, raw_text string")
    got = {r["response_id"]: r["stripped"]
           for r in ae.fence_strip(resp).collect()}
    # lstrip is a CHARSET strip: leading {`,j,s,o,n} runs are eaten
    assert got[1] == "ull"
    assert got[2] == "stuff"
    assert got[3] == '{"a": 1}'
    assert got[4] == "fences here"
    assert got[5] == '{"k": 1}'
    # 's','o','n','j' eaten; 'a' is outside the set and stops the strip
    assert got[6] == "a's data"


def test_update_build_truthy_gates(spark):
    parsed = spark.createDataFrame(
        [(1, "product-enrichment", "d", ["k"], "mc",
          None, None, None, None, None),
         (2, "product-enrichment", "", [], None,
          None, None, None, None, None),
         (3, "material-tagger", None, None, None,
          "mt", "", "f", None, [])],
        "item_id long, agent_type string, description string, "
        "keywords array<string>, material_category string, "
        "material_type string, color string, finish string, "
        "application string, tags array<string>")
    got = {r["item_id"]: r.asDict()
           for r in ae.update_build(parsed).collect()}
    assert got[1]["update_keys"] == \
        "description,search_keywords,material_type"
    assert got[1]["counted"] == 1
    # all-falsy -> empty update, not counted
    assert got[2]["update_keys"] == "" and got[2]["counted"] == 0
    # '' color and [] tags gated out; mt + finish survive
    assert got[3]["update_keys"] == "material_type,finish"


def test_run_rollup_cancel_semantics(spark):
    runs = spark.createDataFrame(
        [(1, 23, None, False),    # no cancel
         (2, 23, 7, False),       # discovered at 10
         (3, 23, 20, False),      # discovered at 25 > 23: MISSED
         (4, 23, 0, False),       # discovered at 5
         (5, 23, 3, True)],       # outer failure wins
        "run_id long, n_items long, cancel_point long, "
        "outer_fail boolean")
    items = spark.createDataFrame(
        [(rid, i, True, "description", 10, 5)
         for rid in (1, 2, 3, 4, 5) for i in range(23)],
        "run_id long, item_idx long, parse_ok boolean, "
        "update_keys string, in_tok long, out_tok long")
    got = {r["run_id"]: r.asDict()
           for r in ae.run_rollup(runs, items).collect()}
    assert got[1]["status"] == "completed" and got[1]["processed"] == 23
    assert got[2]["status"] == "cancelled" and got[2]["processed"] == 10
    # cancel past the last heartbeat is missed — run completes (pin)
    assert got[3]["status"] == "completed" and got[3]["processed"] == 23
    assert got[4]["status"] == "cancelled" and got[4]["processed"] == 5
    assert got[5]["status"] == "failed"
    assert got[2]["input_tokens"] == 100  # 10 items x 10
    # heartbeats before items 0,5,... among processed
    assert got[1]["heartbeats"] == 5      # 0,5,10,15,20
    assert got[2]["heartbeats"] == 2      # 0,5


def test_batch_plan_is_not_cartesian(spark):
    """Scale pin for the round-4 verdict's 100x veto: the catalog must
    not shuffle into per-run window partitions. The executed plan ranks
    per distinct CONFIG with a literal rn cap, which lets Spark insert
    WindowGroupLimit (map-side bounded top-k BEFORE the exchange); the
    run side rides broadcast joins."""
    plan = ae.batch_plan(
        ae.synth_agent_runs(_ev(spark)),
        ae.synth_agent_products(_ev(spark)))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan   # tiny config set build side
    assert "CartesianProduct" not in plan
    # the only Window partitions by cfg_id, never run_id
    assert "windowspecdefinition(run_id" not in plan


def test_cfg_id_distinguishes_null_placement(spark):
    """ADVICE r5 #2: xxhash64 skips NULL inputs, so configs differing
    only in WHICH column is NULL used to hash identically and share
    one rank window — interleaving two runs' candidate batches. Two
    such runs must each get a contiguous, path-correct batch."""
    runs = spark.createDataFrame(
        [(1, "product-enrichment", None, 10, None, False),
         (2, None, "product-enrichment", 10, None, False)],
        "run_id long, agent_type string, category_filter string, "
        "config_batch_size long, input_batch_size long, "
        "force_rewrite boolean")
    # p1/p2: enrich-eligible only (no description, no image);
    # p3/p4: tag-eligible only (described + not forced, image + no
    # material_type)
    products = spark.createDataFrame(
        [(1, 100, None, "cat-0", None, "m", ["t"]),
         (2, 200, None, "cat-0", None, "m", ["t"]),
         (3, 300, "d3", "cat-0", "img-3", None, []),
         (4, 400, "d4", "cat-0", "img-4", None, [])],
        "product_id long, created_at long, description string, "
        "category string, image_url string, material_type string, "
        "tags array<string>")
    got = {(r["run_id"], r["product_id"]): r["item_idx"]
           for r in ae.batch_plan(runs, products).collect()}
    assert got == {(1, 1): 0, (1, 2): 1, (2, 3): 0, (2, 4): 1}
