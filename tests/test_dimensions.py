"""Pins the dimension parser (operators/dimensions.py) to the
reference's app/utils/dimension_parser.py. Expected values were
produced by running the reference module on the same strings
(differential check done offline); the quirks pinned here:

- pattern priority 3D → 2D → 1D, with the 1D tier requiring an
  explicit unit;
- the unit alternation ``cm|mm|m|in|inch`` is leftmost-first, so
  "15 inch" yields unit "in" and raw_text "15 in";
- a 3D string ALSO emits a 2D re-match of its prefix in
  extract_all_dimensions (independent per-pattern scans, :122);
- missing unit defaults to "cm"; the greedy ``\\s*`` keeps a trailing
  space in raw_text when the optional unit is absent;
- dedup keeps the first occurrence per (width, height, depth, unit).
"""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import dimensions as dop


def _run(spark, text):
    df = spark.createDataFrame([(text,)], "content string")
    out = dop.extract_dimensions(
        df.withColumn("one", dop.parse_dimension_col(F.col("content"))))
    r = out.collect()[0]
    one = r["one"].asDict() if r["one"] else None
    return one, [d.asDict() for d in r["dims"]]


def _d(w, h=None, dep=None, unit="cm", raw=""):
    return {"width": w, "height": h, "depth": dep, "unit": unit,
            "raw_text": raw}


def test_parse_priority_3d_first(spark):
    one, dims = _run(spark, "15×38×2.5 cm")
    assert one == _d(15.0, 38.0, 2.5, "cm", "15×38×2.5 cm")
    # extract_all also re-matches the 2D prefix — pinned quirk
    assert dims == [_d(15.0, 38.0, 2.5, "cm", "15×38×2.5 cm"),
                    _d(15.0, 38.0, None, "cm", "15×38")]


def test_parse_2d_uppercase_unit_and_bare(spark):
    one, dims = _run(spark, "20x40 MM")
    assert one == _d(20.0, 40.0, None, "mm", "20x40 MM")
    one, _ = _run(spark, "11.8×11.8")
    assert one == _d(11.8, 11.8, None, "cm", "11.8×11.8")


def test_parse_1d_inch_alternation_quirk(spark):
    # 'in' precedes 'inch' in the alternation: leftmost-first match
    one, dims = _run(spark, "15 inch wide")
    assert one == _d(15.0, None, None, "in", "15 in")
    # 1D matches never survive extract_all's >=2-numeric-group filter
    assert dims == []


def test_no_match(spark):
    one, dims = _run(spark, "no dims here")
    assert one is None and dims == []


def test_extract_all_dedup_first_seen(spark):
    one, dims = _run(spark, "tile 15×38 cm and 15×38 cm again and 7 m")
    assert dims == [_d(15.0, 38.0, None, "cm", "15×38 cm")]


def test_extract_all_order_and_trailing_space_raw(spark):
    one, dims = _run(spark, "A 1×2×3 B 4x5x6in C 1×2")
    # 3D tier first (both matches), then 2D re-matches; the unitless 3D
    # raw keeps its trailing space (greedy \\s* before the absent unit)
    assert dims == [_d(1.0, 2.0, 3.0, "cm", "1×2×3 "),
                    _d(4.0, 5.0, 6.0, "in", "4x5x6in"),
                    _d(1.0, 2.0, None, "cm", "1×2"),
                    _d(4.0, 5.0, None, "cm", "4x5")]
