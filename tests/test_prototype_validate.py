"""Pins for metadata prototype validation
(operators/prototype_validate.py vs metadata_prototype_validator.py).

Hand-computable 2-D vectors: cos([1,0],[1,1]) = 0.707107 (6dp),
cos([1,0],[0,1]) = 0.
"""

import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators.prototype_validate import (
    flatten_metadata, resolve_thresholds, validate_fields)

X = [1.0, 0.0]
Y = [0.0, 1.0]
D = [1.0, 1.0]
COS_XD = 0.707107


def _fields(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, field_key string, field_value string, "
              "value_embedding array<double>, threshold double")


@pytest.fixture(scope="module")
def registry(spark):
    protos = spark.createDataFrame(
        [Row(field_key=k, prop_embedding=X)
         for k in ("fk", "fk2", "fk3", "fk4")],
        "field_key string, prop_embedding array<double>")
    pvals = spark.createDataFrame(
        [
            # fk: exact-variation beats higher semantic sim
            ("fk", 0, "matte", ["dull"], Y),
            ("fk", 1, "glossy", ["SHINY"], D),
            ("fk", 2, "satin", [], None),
            # fk2: all semantic sims 0 / embeddings missing -> fallback
            ("fk2", 0, "a", [], Y),
            ("fk2", 1, "b", [], None),
            # fk3: semantic tie -> earliest pos wins (strict > fold)
            ("fk3", 0, "p", [], D),
            ("fk3", 1, "q", [], D),
            # fk4: exact on value at pos0 AND variation at pos1 ->
            # first in insertion order
            ("fk4", 0, "dup", [], Y),
            ("fk4", 1, "dup2", ["dup"], Y),
        ],
        "field_key string, proto_pos int, proto_value string, "
        "variations array<string>, proto_embedding array<double>")
    return protos, pvals


def _run(spark, registry, rows):
    protos, pvals = registry
    res = validate_fields(_fields(spark, rows), protos, pvals)
    return {(r["doc_id"], r["field_key"]): r.asDict()
            for r in res.collect()}


def test_exact_variation_tier_case_insensitive(spark, registry):
    out = _run(spark, registry, [(1, "fk", "shiny", X, 0.8)])
    r = out[(1, "fk")]
    assert r["validated_value"] == "glossy"
    assert r["confidence"] == 1.0
    assert r["prototype_matched"] is True
    assert r["reason"] == "semantic_match"


def test_low_confidence_keeps_original(spark, registry):
    out = _run(spark, registry, [(2, "fk", "unknownword", D, 0.8)])
    r = out[(2, "fk")]
    assert r["validated_value"] == "unknownword"
    assert r["prototype_matched"] is False
    assert r["reason"] == "low_confidence"
    assert round(r["confidence"], 6) == COS_XD


def test_semantic_argmax_skips_null_embeddings(spark, registry):
    out = _run(spark, registry, [(3, "fk", "foo", X, 0.5)])
    r = out[(3, "fk")]
    # matte=0 (not > 0), glossy=0.707107, satin skipped
    assert r["validated_value"] == "glossy"
    assert round(r["confidence"], 6) == COS_XD
    assert r["reason"] == "semantic_match"


def test_semantic_fallback_when_nothing_above_zero(spark, registry):
    out = _run(spark, registry, [(4, "fk2", "zzz", X, 0.8)])
    r = out[(4, "fk2")]
    assert r["validated_value"] == "zzz"
    assert r["confidence"] == 0.0
    assert r["prototype_matched"] is True  # threshold passed


def test_semantic_tie_keeps_earliest(spark, registry):
    out = _run(spark, registry, [(5, "fk3", "w", X, 0.5)])
    assert out[(5, "fk3")]["validated_value"] == "p"


def test_exact_first_in_order(spark, registry):
    out = _run(spark, registry, [(6, "fk4", "dup", X, 0.5)])
    assert out[(6, "fk4")]["validated_value"] == "dup"
    assert out[(6, "fk4")]["confidence"] == 1.0


def test_passthrough_tiers(spark, registry):
    out = _run(spark, registry, [
        (7, "fk", None, X, 0.8),
        (8, "_meta", "x", X, 0.8),
        (9, "nokey", "x", X, 0.8),
        (10, "fk", "x", None, 0.8),
    ])
    assert out[(7, "fk")]["reason"] == "skipped_null"
    assert out[(8, "_meta")]["reason"] == "skipped_private"
    assert out[(9, "nokey")]["reason"] == "no_prototype"
    r = out[(10, "fk")]
    assert r["reason"] == "embedding_generation_failed"
    assert (r["prototype_matched"], r["confidence"]) == (False, 0.0)
    assert all(out[k]["validated_value"] == out[k]["original_value"]
               for k in out)


def test_threshold_resolution(spark):
    f = spark.createDataFrame(
        [(1, " CatX", "v"), (2, "other", "v"), (3, None, "v")],
        "doc_id long, category_key string, field_value string")
    t = spark.createDataFrame([("catx ", 0.5)],
                              "category_key string, threshold double")
    got = {r["doc_id"]: r["threshold"]
           for r in resolve_thresholds(f, t).collect()}
    assert got == {1: 0.5, 2: 0.8, 3: 0.8}


def test_flatten_last_wins_precedence(spark):
    rows = spark.createDataFrame(
        [
            (1, "critical", None, 0, "k1", "crit"),
            (1, "discovered", 0, 0, "k1", "disc"),
            (1, "discovered", 0, 1, "k2", "a"),
            (1, "discovered", 1, 0, "k2", "b"),
            (1, "direct", None, 0, "k2", "direct"),
            (1, "critical", None, 1, "k3", "only"),
        ],
        "doc_id long, section string, cat_pos int, pos int, "
        "field_key string, field_value string")
    got = {r["field_key"]: r["field_value"]
           for r in flatten_metadata(rows).collect()}
    assert got == {"k1": "disc", "k2": "direct", "k3": "only"}
