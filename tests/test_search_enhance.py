"""Pins for the RAG query-route folds (operators/search_enhance vs
app/api/documents/query_routes.py:41-92,167-254)."""

from mivaa_pdf_extractor_spark.operators import search_enhance as se


def _ev(spark, n=1000):
    return spark.range(0, n).withColumnRenamed("id", "event_id")


def test_enhance_images_matches_reference(spark):
    ev = _ev(spark)
    results = [r.asDict() for r in se.synth_results(ev).collect()]
    assocs = [r.asDict() for r in se.synth_assocs(ev).collect()]
    got = {}
    for r in se.enhance_images(se.synth_results(ev),
                               se.synth_assocs(ev)).collect():
        got.setdefault(r["result_id"], []).append(r.asDict())
    by_pid = {}
    for a in assocs:
        by_pid.setdefault(a["product_id"], []).append(a)
    for r in results:
        rows = got[r["result_id"]]
        if not r["product_id"]:
            # falsy id ('' included) → passthrough, no related_images
            assert len(rows) == 1 and rows[0]["enhanced"] == 0
            continue
        # top-10 by score desc (canonical: NULLS LAST, assoc_id) taken
        # BEFORE the image gate — imageless rows consume limit slots
        pool = sorted(by_pid.get(r["product_id"], []),
                      key=lambda a: (a["overall_score"] is None,
                                     -(a["overall_score"] or 0),
                                     a["assoc_id"]))[:10]
        want = [a for a in pool if a["has_image"]]
        got_imgs = [x for x in rows if x["image_id"] is not None]
        assert len(got_imgs) == len(want), (r, len(got_imgs), len(want))
        for x in got_imgs:
            a = next(a for a in want if a["image_id"] == x["image_id"])
            # dead-default pin: stored NULLs pass through as None —
            # never 'related' / 0.0
            assert x["relationship_type"] == a["reasoning"]
            assert x["relevance_score"] == a["overall_score"]
            assert x["caption"] == a["caption"]


def test_imageless_association_consumes_limit_slot(spark):
    """11 associations where the top-scored one has no image: only 9 of
    the 10 image-bearing ones survive (the imageless row consumed a
    limit slot)."""
    rows = [(100 + i, "p-x", i != 0, f"img-{i}", f"u-{i}", "r",
             1.0 - i * 0.01, None) for i in range(11)]
    assocs = spark.createDataFrame(
        rows, "assoc_id long, product_id string, has_image boolean, "
        "image_id string, image_url string, reasoning string, "
        "overall_score double, caption string")
    results = spark.createDataFrame([(1, "p-x")],
                                    "result_id long, product_id string")
    out = [r for r in se.enhance_images(results, assocs).collect()
           if r["image_id"] is not None]
    assert len(out) == 9
    assert {r["image_id"] for r in out} == {f"img-{i}"
                                            for i in range(1, 10)}


def test_ws_authz_matches_reference(spark):
    calls = se.synth_authz_calls(_ev(spark))
    rows = [r.asDict() for r in calls.collect()]
    got = {r["call_id"]: r.asDict() for r in se.ws_authz(calls).collect()}
    for r in rows:
        g = got[r["call_id"]]
        # transcription of :41-92
        if r["service"] == "mivaa":
            want = "trusted_service"
        elif r["is_test_user"]:  # raw truthy claim, not the ladder
            want = "trusted_test"
        else:
            ident = r["sub"] or r["user_id"]
            if not ident:
                want = "missing_identity"
            elif r["check_error"]:
                want = "check_failed"
            elif not r["active_member"]:
                want = "not_member"
            else:
                want = "ok"
        assert g["outcome"] == want, (r, g["outcome"], want)
        if want in ("trusted_service", "trusted_test"):
            assert g["identity"] is None
        elif want != "missing_identity":
            assert g["identity"] == (r["sub"] or r["user_id"])
