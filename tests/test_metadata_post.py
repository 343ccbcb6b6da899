"""Pins for LLM-metadata post-processing (operators/metadata_post.py;
reference dynamic_metadata_extractor.py:716-914)."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators.metadata_post import (
    apply_overrides, fallback_extract, parse_ai_metadata,
    property_category, validate_critical)

GOOD = ('{"critical": {"material_category": {"value": "porcelain_tile", '
        '"confidence": 0.9, "source": "auto_detected"}, "factory_name": '
        '{"value": "Acme", "confidence": 0.8, "source": "ai"}}}')


def _parse(spark, response):
    df = spark.createDataFrame([(1, response)],
                               "doc_id bigint, response string")
    return parse_ai_metadata(df).collect()[0]


class TestParse:
    def test_json_fence_preferred(self, spark):
        r = _parse(spark, "prose\n```json\n" + GOOD + "\n```\nmore")
        assert r.material_category_value == "porcelain_tile"
        assert r.parse_error is None

    def test_bare_fence(self, spark):
        r = _parse(spark, "``` " + GOOD + " ```")
        assert r.factory_name_value == "Acme"

    def test_raw_json(self, spark):
        r = _parse(spark, GOOD)
        assert r.material_category_confidence == 0.9

    def test_parse_failure_tags_not_silently_empty(self, spark):
        # :737-749 — never "just missing data"
        r = _parse(spark, "the model apologized instead of answering")
        assert r.parse_error == "json_parse_error"
        assert r.material_category_value is None

    def test_unmatched_fence_falls_back_to_raw(self, spark):
        # :727-733 — regex miss leaves response unchanged
        r = _parse(spark, "```json\nnot an object\n```")
        assert r.parse_error == "json_parse_error"

    def test_valid_object_missing_critical_is_not_an_error(self, spark):
        r = _parse(spark, '{"something": "else"}')
        assert r.parse_error is None
        assert r.factory_name_value is None


class TestOverridesValidate:
    def _pipeline(self, spark, response, overrides):
        df = spark.createDataFrame([(1, response)],
                                   "doc_id bigint, response string")
        ov = spark.createDataFrame(overrides,
                                   "doc_id bigint, field string, "
                                   "value string")
        out = validate_critical(apply_overrides(parse_ai_metadata(df), ov))
        return out.collect()[0]

    def test_manual_override_wins_at_full_confidence(self, spark):
        r = self._pipeline(spark, GOOD, [(1, "factory_name", "Real Co")])
        assert r.factory_name_value == "Real Co"
        assert r.factory_name_confidence == 1.0
        assert r.factory_name_source == "manual_override"

    def test_unknown_override_field_ignored(self, spark):
        r = self._pipeline(spark, GOOD, [(1, "bogus", "X")])
        assert r.factory_name_value == "Acme"

    def test_validation_error_strings(self, spark):
        # :785-801 — the reference's exact messages, schema order
        r = self._pipeline(
            spark, '{"critical": {"factory_name": {"value": "AB", '
                   '"confidence": 0.5, "source": "ai"}}}', [])
        assert list(r.errors) == ["Missing required field: "
                                  "material_category",
                                  "Invalid value for field: factory_name"]
        assert r.valid is False

    def test_valid_document(self, spark):
        r = self._pipeline(spark, GOOD, [])
        assert r.valid is True and list(r.errors) == []


class TestFallback:
    def _fb(self, spark, text):
        df = spark.createDataFrame([(1, text)],
                                   "doc_id bigint, text string")
        return fallback_extract(df).collect()[0]

    def test_first_pattern_wins(self, spark):
        r = self._fb(spark, "Manufacturer: First Co\nCompany: Second Co")
        assert r.factory_name_value == "First Co"
        assert r.factory_name_confidence == 0.7
        assert r.factory_name_source == "pattern_match"

    def test_case_insensitive(self, spark):
        assert self._fb(spark, "made by: low co").factory_name_value \
            == "low co"

    def test_material_category_has_no_patterns(self, spark):
        # :756-757 — the loop guards on "patterns" in config;
        # material_category defines keywords, so fallback never fills it
        r = self._fb(spark, "porcelain tile Manufacturer: X Co")
        assert r.material_category_value is None

    def test_group_patterns(self, spark):
        assert self._fb(spark, "Holdings: Big G").factory_group_name_value \
            == "Big G"


class TestPropertyCategory:
    def test_hint_order_and_defaults(self, spark):
        df = spark.createDataFrame(
            [("thickness",), ("color",), ("sku",), ("_custom_x",),
             ("mystery",), ("rating",)], "k string")
        out = dict(df.select(
            "k", property_category(F.col("k")).alias("c")).collect())
        assert out == {"thickness": "dimensions", "color": "appearance",
                       "sku": "commercial", "_custom_x": "custom",
                       "mystery": "other", "rating": "technical"}
