"""Pins for the image-API folds (app/api/images.py)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import image_export as imx


def _replay(spark, trace):
    df = spark.createDataFrame(pd.DataFrame(
        trace, columns=["user_id", "event_ord", "t"]))
    rows = imx.rate_limit_replay(df).collect()
    return sorted(rows, key=lambda r: r.event_ord)


def test_rate_limit_inclusive_evict(spark):
    # 5 exports at t=0..4 fill the window; an attempt at t=3600 sees
    # the t=0 entry evicted (<= boundary, pin) and is ALLOWED
    trace = [("u", i, t) for i, t in enumerate([0, 1, 2, 3, 4, 3600])]
    rows = _replay(spark, trace)
    assert [r.allowed for r in rows] == [True] * 5 + [True]
    # a SECOND attempt at t=3600 sees [1,2,3,4,3600] -> denied
    trace += [("u", 6, 3600)]
    rows = _replay(spark, trace)
    assert rows[6].allowed is False


def test_rejected_attempts_do_not_extend_lockout(spark):
    # hammering while locked out must NOT push the recovery time
    trace = [("u", i, i) for i in range(5)]            # fill at 0..4
    trace += [("u", 5 + i, 100 + i) for i in range(20)]  # 20 rejects
    trace += [("u", 30, 3700)]   # all five originals aged out
    rows = _replay(spark, trace)
    assert all(not r.allowed for r in rows[5:25])
    assert rows[25].allowed is True       # rejects never appended
    assert rows[25].window_size == 1


def test_manifest_jpeg_ext_and_stem(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [("d", 7, "scans/page.tif.png", "https://s/1"),
         ("d", 8, None, None),
         ("d", 9, "noext", "https://s/2")],
        columns=["document_id", "idx", "filename", "image_url"]))
    rows = {r.idx: r for r in
            imx.export_manifest(df, fmt="JPEG").collect()}
    assert rows[7].zip_name == "007_page.tif.jpg"   # last suffix only
    assert rows[8].zip_name == "008_image_8.jpg"    # default name
    assert rows[8].in_archive is False              # still listed
    assert rows[9].zip_name == "009_noext.jpg"


def test_export_gate_tenancy_message_identical(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [(0, "docA", False, "PNG", 0, False, True, 0),
         (1, "docA", False, "PNG", 10, True, False, 10_000)],
        columns=["request_id", "document_id", "rate_limited",
                 "format_raw", "n_images", "ws_scoped", "is_member",
                 "est_bytes"]))
    rows = {r.request_id: r for r in imx.export_gate(df).collect()}
    assert rows[0].status == 404 and rows[1].status == 404
    assert rows[0].detail == rows[1].detail     # id-enum defense (pin)


def test_segment_base64_wins_over_url(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [(0, True, True, False, False, "x")],
        columns=["request_id", "has_base64", "has_url", "url_safe",
                 "fetch_ok", "fetch_error"]))
    r = imx.segment_source(df).collect()[0]
    # both provided + unsafe URL: base64 wins, the URL is never
    # fetched (the docstring claims URL preference — the code wins)
    assert r.source == "base64" and r.status == 200


def test_reclassify_asymmetric_confidence_defaults(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [("i", True, True, False, 0.9)],
        columns=["image_id", "has_is_material", "is_material",
                 "has_confidence", "confidence"]))
    r = imx.reclassify_update(df).collect()[0]
    assert r.confidence == 0.0              # top-level default
    assert r.meta_confidence is None        # nested .get() no default
    assert r.classification == "material" and r.category == "product"
