"""Pins for relevancy links + timestamp normalization
(operators/relevancy.py) vs reference transcriptions."""

from mivaa_pdf_extractor_spark.operators import relevancy as rv


def ref_normalize(ts):
    if not ts:
        return ts
    ts = ts.replace("Z", "+00:00")
    if "." in ts and "+" in ts:
        parts = ts.split("+")
        dtp, tzp = parts[0], "+" + parts[1]
        if "." in dtp:
            dt, micro = dtp.rsplit(".", 1)
            micro = micro.ljust(6, "0")[:6]
            ts = f"{dt}.{micro}{tzp}"
    return ts


def test_timestamp_docstring_examples(spark):
    cases = [
        ("2025-11-18T18:36:51.92242+00:00",
         "2025-11-18T18:36:51.922420+00:00"),
        ("2025-11-18T18:36:51.9Z", "2025-11-18T18:36:51.900000+00:00"),
        ("2025-11-18T18:36:51Z", "2025-11-18T18:36:51+00:00"),
        ("2025-01-02T03:04:05.123456789+02:00",
         "2025-01-02T03:04:05.123456+02:00"),
        ("2025-06-07T08:09:10", "2025-06-07T08:09:10"),
        ("", ""), (None, None),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _w) in enumerate(cases)],
        "row_id long, ts string")
    got = {r.row_id: r.normalized
           for r in rv.normalize_timestamps(df).collect()}
    for i, (t, want) in enumerate(cases):
        assert got[i] == want == ref_normalize(t), t


def test_relevancy_fallback_and_span(spark):
    prods = spark.createDataFrame(
        [(1, 10, [5, 3, 8]), (1, 11, []), (1, 12, None)],
        "document_id long, product_id long, page_range array<int>")
    imgs = spark.createDataFrame(
        [(1, 100, 2), (1, 101, 3), (1, 102, 6), (1, 103, 9)],
        "document_id long, image_id long, page_number int")
    rows = rv.relevancy_links(prods, imgs).collect()
    by = {}
    for r in rows:
        by.setdefault(r.product_id, set()).add(
            (r.image_id, r.reasoning, r.overall_score))
    # span [3, 8] (min/max of flat list, NOT membership)
    assert by[10] == {(101, "page_proximity", 1.0),
                      (102, "page_proximity", 1.0)}
    # empty and null ranges -> all 4 images at 0.7
    for pid in (11, 12):
        assert {i for i, _r, _s in by[pid]} == {100, 101, 102, 103}
        assert all(s == 0.7 for _i, _r, s in by[pid])
