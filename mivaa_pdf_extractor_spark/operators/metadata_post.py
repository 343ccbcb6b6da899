"""Deterministic post-processing of LLM metadata responses.

The reference's dynamic metadata extractor sends PDF text to an LLM and
then runs a fully deterministic tail
(`app/services/metadata/dynamic_metadata_extractor.py`), reproduced here
as native Column logic (the LLM call itself is out of scope —
non-deterministic — exactly like C11's LLM escalation tier):

- **Code-fence JSON extraction + parse** (`_parse_ai_response`,
  :716-749): prefer the ```json fenced object, then any ``` fence, then
  the raw string; a parse failure yields the empty skeleton tagged with
  an error (never silently-missing data). The reference embeds the
  json.JSONDecodeError text in the tag; the exception text is
  parser-specific, so this engine tags the fixed string
  ``json_parse_error`` (documented deviation — the *taxonomy* matches).
- **Pattern fallback** (`_fallback_extraction`, :751-768): when the AI is
  unavailable, fields that define ``patterns`` (factory_name,
  factory_group_name — material_category defines keywords, not patterns,
  and is deliberately skipped by the loop) are regex-mined
  first-match-wins, confidence 0.7, source ``pattern_match``.
- **Manual overrides** (`_apply_manual_overrides`, :770-783): admin
  values for schema fields replace the extracted ones at confidence 1.0,
  source ``manual_override``; unknown fields are ignored.
- **Critical-field validation** (`_validate_critical_fields`, :785-801):
  material_category required non-empty; factory_name required with
  len > 2; factory_group_name optional. Error strings are the
  reference's exact messages, in schema order.
- **Property categorization** (`_determine_property_category`,
  :902-914 over `METADATA_CATEGORY_HINTS` :99-132): exact-key membership
  per category in declaration order, then the ``_custom_`` prefix, then
  ``other``.

Everything is a map-only projection (regexp + from_json + when-chains)
inside whole-stage codegen; the overrides join broadcasts the (tiny)
admin-override set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: dynamic_metadata_extractor.py:47-93 — the critical schema's
#: deterministic parts: (field, required, min_len, fallback patterns).
CRITICAL_FIELDS = [
    ("material_category", True, 1, []),
    ("factory_name", True, 3, [
        r"Manufacturer:\s*(.+)", r"Made by:\s*(.+)", r"Producer:\s*(.+)",
        r"Factory:\s*(.+)", r"Company:\s*(.+)"]),
    ("factory_group_name", False, 0, [
        r"Group:\s*(.+)", r"Parent Company:\s*(.+)",
        r"Corporation:\s*(.+)", r"Holdings:\s*(.+)"]),
]

#: dynamic_metadata_extractor.py:99-132 — property-key -> category hints
#: (cited data constants; declaration order is the lookup order).
METADATA_CATEGORY_HINTS = {
    "material_properties": [
        "composition", "type", "blend", "fiber_content", "texture",
        "finish", "pattern", "weight", "density", "durability_rating"],
    "dimensions": [
        "length", "width", "height", "thickness", "diameter", "size",
        "area", "volume"],
    "appearance": [
        "color", "color_code", "gloss_level", "sheen", "transparency",
        "grain", "visual_effect"],
    "performance": [
        "water_resistance", "fire_rating", "slip_resistance",
        "wear_rating", "abrasion_resistance", "tensile_strength"],
    "application": [
        "recommended_use", "installation_method", "room_type",
        "traffic_level", "care_instructions", "maintenance"],
    "compliance": [
        "certifications", "standards", "eco_friendly",
        "sustainability_rating", "voc_rating", "safety_rating"],
    "commercial": [
        "pricing", "availability", "supplier", "manufacturer", "sku",
        "warranty"],
    "design": [
        "designer", "studio", "collection", "series", "aesthetic_style",
        "design_era"],
    "technical": [
        "specifications", "construction", "manufacturing_process",
        "grade", "class", "rating"],
}

_JSON_SCHEMA = (
    "critical struct<"
    "material_category:struct<value:string,confidence:double,source:string>,"
    "factory_name:struct<value:string,confidence:double,source:string>,"
    "factory_group_name:struct<value:string,confidence:double,source:string>"
    ">, _corrupt string")

_FENCE_JSON = r"(?s)```json\s*(\{.*?\})\s*```"
_FENCE_ANY = r"(?s)```\s*(\{.*?\})\s*```"


def extract_fenced_json(col: F.Column) -> F.Column:
    """:726-733 — prefer the ```json fence, then any fence; an unmatched
    fence falls back to the raw string (the reference leaves ``response``
    unchanged when the regex finds nothing)."""
    jf = F.nullif(F.regexp_extract(col, _FENCE_JSON, 1), F.lit(""))
    af = F.nullif(F.regexp_extract(col, _FENCE_ANY, 1), F.lit(""))
    return (F.when(col.contains("```json"), F.coalesce(jf, col))
            .when(col.contains("```"), F.coalesce(af, col))
            .otherwise(col))


def parse_ai_metadata(df: DataFrame, response_col: str = "response",
                      id_col: str = "doc_id") -> DataFrame:
    """Fence-extract + parse; failure yields the empty skeleton tagged
    ``json_parse_error``. Output: flattened per-field (value, confidence,
    source) columns + ``parse_error``."""
    raw = extract_fenced_json(F.col(response_col))
    # PERMISSIVE from_json yields null FIELDS (not a null struct) on
    # malformed input — the corrupt-record column is the reliable signal;
    # a valid object missing `critical` parses clean (missing, not error)
    parsed = F.from_json(raw, _JSON_SCHEMA,
                         {"columnNameOfCorruptRecord": "_corrupt"})
    failed = parsed.isNull() | parsed["_corrupt"].isNotNull()
    cols = [F.col(id_col),
            F.when(failed, F.lit("json_parse_error")).alias("parse_error")]
    for field, _, _, _ in CRITICAL_FIELDS:
        node = parsed["critical"][field]
        cols += [node["value"].alias(f"{field}_value"),
                 node["confidence"].alias(f"{field}_confidence"),
                 node["source"].alias(f"{field}_source")]
    return df.select(*cols)


def fallback_extract(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """:751-768 — pattern-based extraction for fields that define
    patterns (first match wins, confidence 0.7, source pattern_match).
    Case-insensitive, as the reference's ``re.IGNORECASE``."""
    t = F.col(text_col)
    cols = [F.col(id_col)]
    for field, _, _, patterns in CRITICAL_FIELDS:
        if not patterns:
            cols += [F.lit(None).cast("string").alias(f"{field}_value"),
                     F.lit(None).cast("double")
                      .alias(f"{field}_confidence"),
                     F.lit(None).cast("string").alias(f"{field}_source")]
            continue
        value = None
        for pat in patterns:
            hit = F.nullif(
                F.trim(F.regexp_extract(t, "(?i)" + pat, 1)), F.lit(""))
            value = hit if value is None else F.coalesce(value, hit)
        cols += [value.alias(f"{field}_value"),
                 F.when(value.isNotNull(), F.lit(0.7))
                  .alias(f"{field}_confidence"),
                 F.when(value.isNotNull(), F.lit("pattern_match"))
                  .alias(f"{field}_source")]
    return df.select(*cols)


def apply_overrides(parsed: DataFrame, overrides: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    """:770-783 — admin overrides win at confidence 1.0; fields outside
    the critical schema are ignored. ``overrides`` rows:
    (id, field, value); the set is admin-entered and tiny -> broadcast."""
    known = [f for f, _, _, _ in CRITICAL_FIELDS]
    ov = (overrides.filter(F.col("field").isin(*known))
          .groupBy(id_col)
          .pivot("field", known)
          .agg(F.first("value")))
    ov = F.broadcast(ov.select(
        F.col(id_col).alias("__oid"),
        *[F.col(f).alias(f"__ov_{f}") for f in known]))
    out = parsed.join(ov, F.col(id_col) == F.col("__oid"), "left")
    for field in known:
        o = F.col(f"__ov_{field}")
        out = (out
               .withColumn(f"{field}_confidence",
                           F.when(o.isNotNull(), F.lit(1.0))
                            .otherwise(F.col(f"{field}_confidence")))
               .withColumn(f"{field}_source",
                           F.when(o.isNotNull(), F.lit("manual_override"))
                            .otherwise(F.col(f"{field}_source")))
               .withColumn(f"{field}_value",
                           F.coalesce(o, F.col(f"{field}_value"))))
    return out.drop("__oid", *[f"__ov_{f}" for f in known])


def validate_critical(df: DataFrame) -> DataFrame:
    """:785-801 — required-field presence + validation-lambda checks,
    the reference's exact error strings in schema order."""
    errs = []
    for field, required, min_len, _ in CRITICAL_FIELDS:
        if not required:
            continue
        v = F.col(f"{field}_value")
        errs.append(
            F.when(v.isNull() | (v == ""),
                   F.lit(f"Missing required field: {field}"))
             .when(F.length(v) < min_len,
                   F.lit(f"Invalid value for field: {field}")))
    errors = F.filter(F.array(*errs), lambda x: x.isNotNull())
    return df.withColumn("errors", errors) \
             .withColumn("valid", F.size(errors) == 0)


def property_category(col: F.Column) -> F.Column:
    """:902-914 — category by exact hint membership in declaration
    order, then the ``_custom_`` prefix, then ``other``."""
    expr = None
    for category, hints in METADATA_CATEGORY_HINTS.items():
        cond = col.isin(*hints)
        expr = (F.when(cond, F.lit(category)) if expr is None
                else expr.when(cond, F.lit(category)))
    return (expr.when(col.startswith("_custom_"), F.lit("custom"))
            .otherwise(F.lit("other")))
