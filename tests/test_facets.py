"""Pins for facet canonicalization (operators/facets.py; reference
facet_canonicalizer.py / facet_whitelist.py / facet_translator.py)."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators.facets import (
    MERGE_THRESHOLD, collect_raw_attributes, normalize_facet,
    resolve_facets)


def _canon(spark, rows):
    return spark.createDataFrame(
        rows, "facet_key string, canonical_value string, "
              "aliases array<string>, embedding array<double>")


def _values(spark, rows):
    return spark.createDataFrame(
        rows, "product_id bigint, facet_key string, raw_value string, "
              "embedding array<double>")


def _resolve(spark, values, canon):
    out = resolve_facets(_values(spark, values), _canon(spark, canon))
    return {(r.product_id, r.facet_key, r.raw_value): r
            for r in out.collect()}


CANON = [("color", "deep blue", ["navy"], [1.0, 0.0]),
         ("color", "light grey", ["gray"], [0.0, 1.0])]


class TestNormalize:
    def test_l1_rules(self, spark):
        # facet_canonicalizer.py:58-66 — strip, lower, collapse
        # separators (whitespace, -, _, /) to single space
        df = spark.createDataFrame(
            [("  Deep-Blue / NAVY_tone  ",), ("a   b",), ("", )],
            "v string")
        out = [r.n for r in df.select(
            normalize_facet(F.col("v")).alias("n")).collect()]
        assert out == ["deep blue navy tone", "a b", ""]


class TestWhitelist:
    def test_gate_classes(self, spark):
        rows = spark.createDataFrame(
            [(1, "color", " Blue "), (1, "sku", "X1"),
             (1, "_private", "x"), (1, "finish", "  "),
             (1, "material", None), (1, "unknown_key", "v")],
            "product_id bigint, facet_key string, raw_value string")
        out = {(r.facet_key, r.raw_value)
               for r in collect_raw_attributes(rows).collect()}
        # only whitelisted keys with trimmed non-empty values survive
        assert out == {("color", "Blue")}

    def test_dedup_per_product_key(self, spark):
        rows = spark.createDataFrame(
            [(1, "color", "Blue"), (1, "color", " Blue "),
             (2, "color", "Blue")],
            "product_id bigint, facet_key string, raw_value string")
        assert collect_raw_attributes(rows).count() == 2


class TestResolve:
    def test_exact_canonical_match(self, spark):
        out = _resolve(spark, [(1, "color", "Deep-Blue", None)], CANON)
        r = out[(1, "color", "Deep-Blue")]
        assert (r.normalized, r.action, r.canonical) == \
            ("deep blue", "exact_alias", "deep blue")
        assert r.similarity is None

    def test_alias_match_on_normalized_or_raw(self, spark):
        out = _resolve(spark,
                       [(1, "color", "NAVY", None),
                        (2, "color", "gray", None)], CANON)
        assert out[(1, "color", "NAVY")].canonical == "deep blue"
        assert out[(2, "color", "gray")].canonical == "light grey"

    def test_non_ascii_rejected_not_embedded(self, spark):
        # facet_translator.py:43-47 + the RPC's non-ASCII guard: the
        # translate tier is a network call (out of scope), so these take
        # the reference's own no-translate path
        out = _resolve(spark, [(1, "color", "café", [1.0, 0.0])], CANON)
        r = out[(1, "color", "café")]
        assert r.action == "rejected_non_english"
        assert r.canonical is None and r.similarity is None

    def test_embedding_merge_at_threshold(self, spark):
        # cos([0.6,0.8],[1,0]) = 0.6 < 0.92 -> new;
        # cos([1,0],[1,0]) = 1.0 -> merge
        out = _resolve(spark,
                       [(1, "color", "azure", [1.0, 0.0]),
                        (2, "color", "odd", [0.6, 0.8])], CANON)
        assert out[(1, "color", "azure")].action == "embedding_merge"
        assert out[(1, "color", "azure")].canonical == "deep blue"
        assert out[(1, "color", "azure")].similarity == 1.0
        r2 = out[(2, "color", "odd")]
        assert r2.action == "new" and r2.canonical is None
        assert r2.similarity == 0.8

    def test_tier1_beats_embedding(self, spark):
        # a value that is BOTH an alias and embedding-similar resolves
        # tier-1 (the reference skips the embed for tier-1 hits)
        out = _resolve(spark, [(1, "color", "navy", [0.0, 1.0])], CANON)
        r = out[(1, "color", "navy")]
        assert r.action == "exact_alias" and r.canonical == "deep blue"

    def test_no_candidates_is_new(self, spark):
        out = _resolve(spark, [(1, "weave", "twill", [1.0, 0.0])], CANON)
        r = out[(1, "weave", "twill")]
        assert r.action == "new"
        assert r.similarity is None  # no canonical rows to compare

    def test_exact_beats_alias_deterministically(self, spark):
        canon = [("color", "navy", ["deep blue"], [1.0, 0.0]),
                 ("color", "deep blue", ["navy"], [0.0, 1.0])]
        # normalized 'navy' is an exact canonical AND an alias of
        # another row: exact wins
        out = _resolve(spark, [(1, "color", "Navy", None)], canon)
        assert out[(1, "color", "Navy")].canonical == "navy"

    def test_threshold_is_inclusive(self, spark):
        import math
        v = [MERGE_THRESHOLD, math.sqrt(1 - MERGE_THRESHOLD**2)]
        out = _resolve(spark, [(1, "color", "edge", v)], CANON)
        assert out[(1, "color", "edge")].action == "embedding_merge"
