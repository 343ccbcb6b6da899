"""Product-dimension parsing — the reference's dimension parser
(app/utils/dimension_parser.py) as native Column plans:

- ``parse_dimension_col``   — ``DimensionParser.parse_dimension``
  (:59-108): first match by pattern priority (3D → 2D → 1D-with-unit),
  unit defaulting to ``cm``.
- ``extract_dimensions``    — ``extract_all_dimensions`` (:110-144)
  + ``deduplicate_dimensions`` (:146-169): every non-overlapping match
  of the 3D pattern, then every match of the 2D pattern (the 1D pattern
  never survives the ``>= 2 numeric groups`` filter, :134), deduped on
  (width, height, depth, unit) keeping the first occurrence.

Pinned reference quirks (tests + contract query):

- a 3D string like ``15×38×2.5 cm`` yields BOTH the 3D dimension and a
  2D ``15×38`` re-match of its prefix (the per-pattern ``finditer``
  scans are independent, :122);
- the unit alternation ``cm|mm|m|in|inch`` is leftmost-first, so
  ``15 inch`` parses with unit ``in`` — ``inch`` is unreachable;
- a missing unit defaults to ``cm`` (:77, :128).

Scale: both operators are pure projections (regexp + higher-order
array fold) that run inside the scan's codegen stage — no shuffle, no
UDF, no data movement. The per-row dedup fold is O(n²) in the number
of dimension matches in one document, which is tiny by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# dimension_parser.py:49-57 — ordered by specificity, IGNORECASE
P3D = (r"(?i)(\d+(?:\.\d+)?)\s*[×x]\s*(\d+(?:\.\d+)?)\s*"
       r"[×x]\s*(\d+(?:\.\d+)?)\s*(cm|mm|m|in|inch)?")
P2D = (r"(?i)(\d+(?:\.\d+)?)\s*[×x]\s*(\d+(?:\.\d+)?)\s*"
       r"(cm|mm|m|in|inch)?")
P1D = r"(?i)(\d+(?:\.\d+)?)\s*(cm|mm|m|in|inch)"

_DIM_STRUCT = ("struct<width:double,height:double,depth:double,"
               "unit:string,raw_text:string>")


def _unit_or_cm(g: Column) -> Column:
    # Spark's regexp_extract yields '' for a non-participating group
    return F.when((g.isNull()) | (g == ""), "cm").otherwise(F.lower(g))


def parse_dimension_col(text: Column) -> Column:
    """First-match dimension struct, or NULL when no pattern matches —
    ``parse_dimension`` (:59-108). Pattern priority is 3D, then 2D,
    then 1D (which requires an explicit unit)."""
    t = F.coalesce(text, F.lit(""))
    r3 = F.regexp_extract(t, P3D, 0)
    r2 = F.regexp_extract(t, P2D, 0)
    r1 = F.regexp_extract(t, P1D, 0)
    null_d = F.lit(None).cast("double")
    return (
        F.when(r3 != "", F.struct(
            F.regexp_extract(t, P3D, 1).cast("double").alias("width"),
            F.regexp_extract(t, P3D, 2).cast("double").alias("height"),
            F.regexp_extract(t, P3D, 3).cast("double").alias("depth"),
            _unit_or_cm(F.regexp_extract(t, P3D, 4)).alias("unit"),
            r3.alias("raw_text")))
        .when(r2 != "", F.struct(
            F.regexp_extract(t, P2D, 1).cast("double").alias("width"),
            F.regexp_extract(t, P2D, 2).cast("double").alias("height"),
            null_d.alias("depth"),
            _unit_or_cm(F.regexp_extract(t, P2D, 3)).alias("unit"),
            r2.alias("raw_text")))
        .when(r1 != "", F.struct(
            F.regexp_extract(t, P1D, 1).cast("double").alias("width"),
            null_d.alias("height"), null_d.alias("depth"),
            F.lower(F.regexp_extract(t, P1D, 2)).alias("unit"),
            r1.alias("raw_text")))
        .otherwise(F.lit(None).cast(_DIM_STRUCT)))


def _all_matches(t: Column, pattern: str, n_numeric: int) -> Column:
    """Array of dimension structs for every non-overlapping match of
    one pattern (the unit is group ``n_numeric + 1``)."""
    raws = F.regexp_extract_all(t, F.lit(pattern), F.lit(0))
    gs = [F.regexp_extract_all(t, F.lit(pattern), F.lit(i))
          for i in range(1, n_numeric + 2)]
    null_d = F.lit(None).cast("double")
    zipped = F.arrays_zip(raws.alias("raw"),
                          *[g.alias(f"g{i}") for i, g in enumerate(gs)])
    return F.transform(zipped, lambda z: F.struct(
        z["g0"].cast("double").alias("width"),
        z["g1"].cast("double").alias("height"),
        (z["g2"].cast("double") if n_numeric == 3 else null_d)
        .alias("depth"),
        _unit_or_cm(z[f"g{n_numeric}"]).alias("unit"),
        z["raw"].alias("raw_text")))


def extract_dimensions(df: DataFrame, text_col: str = "content",
                       out_col: str = "dims") -> DataFrame:
    """Append ``out_col``: the deduplicated array of all dimensions in
    ``text_col`` — ``extract_all_dimensions`` + ``deduplicate_dimensions``
    (:110-169). 3D matches come first (pattern order), dedup keeps the
    first occurrence of each (width, height, depth, unit) key."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    all_dims = F.concat(_all_matches(t, P3D, 3), _all_matches(t, P2D, 2))
    deduped = F.aggregate(
        all_dims,
        F.expr(f"cast(array() as array<{_DIM_STRUCT}>)"),
        lambda acc, x: F.when(
            F.exists(acc, lambda y:
                     y["width"].eqNullSafe(x["width"])
                     & y["height"].eqNullSafe(x["height"])
                     & y["depth"].eqNullSafe(x["depth"])
                     & y["unit"].eqNullSafe(x["unit"])),
            acc).otherwise(F.array_append(acc, x)))
    return df.withColumn(out_col, deduped)
