"""Pins for the interior-design generation planning folds
(operators/interior_gen vs interior_design_routes.py:52-303,497-514,
670-700)."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import interior_gen as ig

_REQ_SCHEMA = ("req_id long, prompt string, room_type string, "
               "style string, image_url string, "
               "model_ids array<string>, exclude_ids array<string>, "
               "width int, height int")


def _plan(spark, rows):
    return ig.select_models(spark.createDataFrame(rows, _REQ_SCHEMA),
                            ig.models_df(spark)).collect()


def test_selection_ladder(spark):
    # explicit 'gemini-interior' matches BOTH capability entries (pin)
    rows = _plan(spark, [(1, "p", None, None, None,
                          ["gemini-interior"], None, 1024, 1024)])
    assert len(rows) == 2
    assert {r["capability"] for r in rows} == {"text-to-image",
                                               "image-to-image"}
    # image routes to the i2i list (12 entries, none failing)
    rows = _plan(spark, [(2, "p", None, None, "https://i", None, None,
                          1024, 1024)])
    assert len(rows) == 12
    assert all(r["request_type"] == "image_to_image" for r in rows)
    # no image -> the 4 t2i models; exclusion applies after
    rows = _plan(spark, [(3, "p", None, None, None, None,
                          ["gemini-interior"], 1024, 1024)])
    assert {r["model_id"] for r in rows} == {"flux-2-pro",
                                             "playground-v2.5", "sd3"}


def test_prompt_build(spark):
    df = spark.createDataFrame(
        [(1, "warm oak floors...", "server_room", "brutalist", None,
          None, None, 1024, 1024),
         (2, "cozy nook", "kids_room", "japandi", "https://i", None,
          None, 1024, 1024),
         (3, "x", None, None, None, None, None, 1024, 1024)],
        _REQ_SCHEMA)
    got = {r["req_id"]: r["p"] for r in
           df.select("req_id", ig.build_prompt().alias("p")).collect()}
    # unknown room passes through verbatim; unknown style tags = itself;
    # trailing dots stripped
    assert got[1] == ("Professional interior design photograph of a "
                      "beautifully designed brutalist server_room, "
                      "warm oak floors, brutalist, soft natural and "
                      "ambient lighting, photorealistic render, "
                      "architectural photography, wide-angle lens, "
                      "sharp focus, high detail, 8K resolution")
    # i2i concise shape with vocab expansion
    assert got[2].startswith("japandi style redesign of a children's "
                             "room, cozy nook, Japandi, wabi-sabi")
    assert got[2].endswith("professional interior design, high quality "
                           "rendering")
    # both defaults: contemporary style, 'interior space' room
    assert got[3].startswith("Professional interior design photograph of "
                             "a beautifully designed contemporary "
                             "interior space, x, contemporary,")


def test_model_inputs(spark):
    reqs = spark.createDataFrame(
        [(1, "INTR loft", None, None, "https://i",
          ["colourful-interiors", "erayyavuz-interior-ai",
           "stable-interiors-v2-pb", "interor-2"], None, 1024, 768),
         (2, "plain", None, None, None,
          ["interor-2", "stable-interiors-v2-pb", "playground-v2.5",
           "flux-2-pro", "colourful-interiors"], None, 1024, 768)],
        _REQ_SCHEMA)
    rows = {(r["req_id"], r["model_id"]): r for r in
            ig.model_inputs_plan(reqs, ig.models_df(spark)).collect()}
    # the trigger gate checks the ENHANCED prompt: 'INTR loft' is embedded
    # in it, so the trigger is NOT prepended (substring pin) ...
    r1 = rows[(1, "colourful-interiors")]
    assert not r1["final_prompt"].startswith("INTR ")
    assert "INTR loft" in r1["final_prompt"]
    # ... while a trigger-free prompt gets it prepended
    assert rows[(2, "colourful-interiors")]["final_prompt"].startswith(
        "INTR Professional interior design photograph")
    # interor-2 has no trigger; with image -> prompt_strength, no aspect
    r = rows[(1, "interor-2")]
    assert r["prompt_strength"] == 0.8 and r["aspect_ratio"] is None
    # interior_ai sends the image under 'input' (pin)
    assert rows[(1, "erayyavuz-interior-ai")]["image_param"] == "input"
    # stable_interiors with image ok; without image -> requires_image
    assert rows[(1, "stable-interiors-v2-pb")]["verdict"] == "ok"
    assert rows[(1, "stable-interiors-v2-pb")]["guidance"] == 15.0
    r = rows[(2, "stable-interiors-v2-pb")]
    assert r["verdict"] == "requires_image" and r["steps"] is None
    # flux without image -> aspect_ratio, no strength
    r = rows[(2, "interor-2")]
    assert r["aspect_ratio"] == "16:9" and r["prompt_strength"] is None
    # playground: fixed 3.0 guidance + scheduler + dims
    r = rows[(2, "playground-v2.5")]
    assert (r["guidance"], r["scheduler"], r["width_out"],
            r["num_outputs"]) == (3.0, "DPMSolver++", 1024, 1)
    # generic t2i gets dims; trigger prepended when absent from prompt
    assert rows[(2, "flux-2-pro")]["width_out"] == 1024


def test_result_shape(spark):
    res = spark.createDataFrame(
        [(1, "m", True, "https://u", 0.05, None),   # success + url
         (2, "m", True, None, 0.0, None),           # success, NO url
         (3, "m", False, None, 0.0, "boom"),        # failure + error
         (4, "m", False, None, 0.0, None)],         # failure, NO error
        "res_id long, model_id string, success boolean, "
        "image_url string, cost double, error string")
    got = {r["res_id"]: r for r in ig.model_result_shape(res).collect()}
    assert got[1]["status"] == "completed" \
        and got[1]["image_urls"] == "https://u"
    # success without url: image_urls key ABSENT (pin)
    assert got[2]["image_urls"] is None
    # failure with error: empty list + error
    assert got[3]["image_urls"] == "" and got[3]["error_out"] == "boom"
    # error-less failure: neither key
    assert got[4]["image_urls"] is None and got[4]["error_out"] is None
