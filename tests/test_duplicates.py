"""Pins factory-gated duplicate detection (operators/duplicates.py) to
duplicate_detection_service.py semantics. Hand-computed expectations;
SequenceMatcher ratios cross-checked against difflib directly.
"""

import pytest
from difflib import SequenceMatcher

from pyspark.sql import functions as F, types as T

from mivaa_pdf_extractor_spark.operators import duplicates as dup

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("metadata",
                  T.MapType(T.StringType(), T.StringType())),
])


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_factory_priority_and_truthy_skip(spark):
    # 'factory' wins when truthy; an EMPTY 'factory' is skipped and the
    # next priority key used (:264 `if value:`); normalization lowers
    # and strips
    rows = [
        (1, "n", "d", {"factory": "ACME ", "brand": "other"}),
        (2, "n", "d", {"factory": "", "manufacturer": " Beta Co"}),
        (3, "n", "d", {"company": "Gamma"}),
        (4, "n", "d", {"color": "red"}),
    ]
    got = {r["id"]: r["factory"]
           for r in dup.extract_factory(_df(spark, rows)).collect()}
    assert got == {1: "acme", 2: "beta co", 3: "gamma", 4: None}


def test_cross_factory_never_pairs(spark):
    # the critical rule is structural: different factories generate no
    # pair at all, and a null factory never joins
    rows = [
        (1, "same name", "same desc", {"factory": "a"}),
        (2, "same name", "same desc", {"factory": "b"}),
        (3, "same name", "same desc", {"color": "x"}),     # no factory
        (4, "same name", "same desc", {"factory": "a"}),
    ]
    pairs = dup.candidate_pairs(_df(spark, rows)).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 4)]


def test_weighted_score_and_confidence(spark):
    rows = [
        (1, "marble slab grande", "a fine polished surface",
         {"factory": "f", "color": "white", "origin": "it"}),
        (2, "marble slab grande", "a fine polished surface",
         {"factory": "f", "color": "white", "origin": "it"}),
    ]
    r = dup.detect_duplicates(_df(spark, rows)).collect()[0]
    assert r["name_similarity"] == 1.0
    assert r["description_similarity"] == 1.0
    assert r["metadata_similarity"] == 1.0
    assert r["overall_score"] == pytest.approx(1.0)
    assert r["confidence"] == "high"


def test_metadata_similarity_tiers(spark):
    # key in one side only: counts in all_keys but not matching;
    # fuzzy > 0.8 adds 0.8; fuzzy <= 0.8 adds nothing
    rows = [
        (1, "n", "d", {"factory": "f", "color": "colorbase-a",
                       "finish": "fx-a", "origin": "italy"}),
        (2, "n", "d", {"factory": "f", "color": "colorbase-b",
                       "finish": "fx-c"}),
    ]
    assert SequenceMatcher(None, "colorbase-a", "colorbase-b").ratio() \
        == pytest.approx(20 / 22)
    assert SequenceMatcher(None, "fx-a", "fx-c").ratio() == 0.75
    r = dup.detect_duplicates(_df(spark, rows)).collect()[0]
    # keys = {color, finish, origin}; mk = 2 (origin one-sided);
    # mv = 0.8 (color fuzzy) + 0 (finish 0.75 <= 0.8)
    want = ((2 / 3) + (0.8 / 3)) / 2
    assert r["metadata_similarity"] == pytest.approx(want)


def test_metadata_empty_and_factory_only(spark):
    # empty metadata is impossible post-gate (factory is required to
    # pair), but factory-ONLY metadata pins the `no other keys -> 1.0`
    # branch (:398-401)
    rows = [
        (1, "n", "d", {"factory": "f"}),
        (2, "n", "d", {"factory": "f"}),
    ]
    r = dup.detect_duplicates(_df(spark, rows)).collect()[0]
    assert r["metadata_similarity"] == 1.0


def test_seqratio_empty_and_whitespace_quirk(spark):
    # empty name/description -> 0.0 BEFORE lowering/stripping; but
    # whitespace-only strings pass the truthy check, strip to "", and
    # SequenceMatcher("", "").ratio() == 1.0 — the reference quirk
    rows = [
        (1, "", "  ", {"factory": "f"}),
        (2, "x", "   ", {"factory": "f"}),
    ]
    r = dup.detect_duplicates(_df(spark, rows)).collect()[0]
    assert r["name_similarity"] == 0.0        # empty short-circuits
    assert r["description_similarity"] == 1.0  # "  " vs "   " -> ""==""


def test_confidence_ladder_boundaries(spark):
    assert SequenceMatcher(None, "ab", "ba").ratio() == 0.5
    rows = [
        (1, "same", "ab", {"factory": "f", "k": "v"}),
        (2, "same", "ba", {"factory": "f", "k": "v"}),
    ]
    r = dup.detect_duplicates(_df(spark, rows)).collect()[0]
    # 0.5*1.0 + 0.3*0.5 + 0.2*1.0 = 0.85 — inclusive 'high' boundary
    assert r["overall_score"] == pytest.approx(0.85)
    assert r["confidence"] == "high"
