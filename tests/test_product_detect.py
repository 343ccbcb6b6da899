"""Pins the markdown product-detection tier (operators/product_detect.py)
to the reference's chunk→product mining semantics
(app/services/products/product_creation_service.py):

- the 11-tier ``_is_valid_product_chunk`` reject ladder (:363-497),
  including the pinned reference bug: content is lowercased (:368) before
  the ``word.isupper()`` test (:474), so ``has_uppercase_name`` is never
  True and the ``product_score >= 3`` gate (:489) can never pass —
  ``valid_ref`` is False for EVERY chunk, ``valid_fixed`` evaluates the
  evident intent against the original text;
- ``_classify_markdown_content`` (:1009-1066), faithful to the
  bare-``'x'`` dimension substring (:1052);
- ``_extract_markdown_data`` + ``_calculate_markdown_quality_score``
  (:1088-1153) with hand-computed scores.
"""

import pytest
from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import product_detect as pd

PAD = " lorem filler words continue here" * 4  # pushes len past 100


def _gate(spark, content):
    df = spark.createDataFrame([(content,)], "content string")
    return pd.product_chunk_gate(df).collect()[0]


def _classify(spark, content):
    df = spark.createDataFrame([(content,)], "content string")
    return pd.classify_markdown(df).collect()[0]["content_class"]


def _mine(spark, content):
    df = spark.createDataFrame([(content,)], "content string")
    return pd.mine_markdown(df).collect()[0]


PRODUCT_CHUNK = ("## MARMO NERO\n120 × 60 cm\nby Estudi{H}ac designer "
                 "collection ceramic white matt" + PAD)


def test_valid_ref_never_true_lowered_uppercase_bug(spark):
    # product_creation_service.py:368 lowers content, :474 then asks
    # word.isupper() over the lowered text — the score-3 gate (:489) is
    # unreachable: even a perfect product chunk is rejected.
    r = _gate(spark, PRODUCT_CHUNK)
    assert r["valid_fixed"] is True          # evident intent
    assert r["valid_ref"] is False           # faithful reference outcome
    assert r["reject_reason"] is None


def test_reject_ladder_tiers(spark):
    cases = [
        ("tiny", "short"),
        ("Table of Contents ......... page 1 page 2 page 3" + PAD,
         "index_toc"),
        ("Our sustainability and recycled materials policy." + PAD,
         "sustainability"),
        ("iso 9001 quality management system audit report." + PAD,
         "certification"),
        ("Technical characteristics | thickness 10mm and water "
         "absorption table." + PAD, "tech_table"),
        ("Moodboard inspiration for the season." + PAD, "moodboard"),
        ("Cleaning and maintenance guide for floor cleaner usage. "
         "not applicable" + PAD, "cleaning"),
        ("The designer biography: born in 1980, graduated from art "
         "school." + PAD, "designer_bio"),
        ("Our factory location and production capacity details." + PAD,
         "factory"),
        # tech specs, no uppercase word in the ORIGINAL text
        ("water absorption 0.5% and breaking strength are superb, "
         "dimensions 60 cm, a fine ceramic collection." + PAD,
         "tech_no_name"),
        ("Just plain prose with nothing special to say at all." + PAD,
         "insufficient_indicators"),
    ]
    for content, want in cases:
        r = _gate(spark, content)
        assert r["reject_reason"] == want, (content[:40], r["reject_reason"])
        assert r["valid_fixed"] is False
        assert r["valid_ref"] is False


def test_sustainability_bypassed_by_soft_product_keywords(spark):
    # :385-392 area — the sustainability tier is skipped when any soft
    # product keyword (dimensions/designer/collection/×/cm/mm) appears
    r = _gate(spark, "Recycled content in the ACME collection, "
              "120 × 60 cm by a designer." + PAD)
    assert r["reject_reason"] is None
    assert r["valid_fixed"] is True


def test_generic_tier_requires_short_content(spark):
    # 'generic' fires only under 200 chars (:430 area); PAD pushes past
    short = "Artisan clay shade, not specified." + " filler" * 12
    assert len(short) < 200 and len(short) >= 100
    assert _gate(spark, short)["reject_reason"] == "generic"
    assert _gate(spark, "Artisan clay shade, not specified." + PAD * 3
                 )["reject_reason"] == "insufficient_indicators"


def test_classify_priority_and_bare_x_bug(spark):
    assert _classify(spark, "Table of Contents ... page 3" + PAD) \
        == "index"
    assert _classify(spark, "Our sustainability policy on recycled "
                     "content." + PAD) == "sustainability"
    assert _classify(spark, "Technical characteristics | thickness "
                     "10mm." + PAD) == "technical"
    assert _classify(spark, "Moodboard inspiration board." + PAD) \
        == "moodboard"
    # bare 'x' substring counts as a dimension (:1052) — "MARMO" +
    # any text containing the letter x classifies as product
    assert _classify(spark, "MARMO premium surface with exact texture, "
                     "a ceramic collection." + PAD) == "product"
    assert _classify(spark, "no dimensions here at all" + PAD.replace(
        "x", "")) == "unknown"


def test_mine_extraction_and_score(spark):
    r = _mine(spark, PRODUCT_CHUNK)
    assert r["product_name"] == "MARMO NERO"        # header wins
    assert r["dimensions"] == "120 × 60"
    assert r["designer"].startswith("Estudi")
    assert r["colors"] == "white"
    assert r["materials"] == "ceramic"
    # all four flags + all five extraction bonuses:
    # 0.3+0.25+0.2+0.15+0.1+0.1+0.1+0.05+0.05 = 1.3 → capped at 1.0
    assert r["quality_score"] == pytest.approx(1.0)


def test_mine_name_precedence_and_sorted_lists(spark):
    # no markdown header, standalone ALL-CAPS line wins tier 2
    r = _mine(spark, "intro text\nSTONE AGE\n45 x 45 cm in grey, beige "
              "and white porcelain and marble finish" + PAD)
    assert r["product_name"] == "STONE AGE"
    assert r["colors"] == "beige,grey,white"         # sorted, deduped
    # 'stone' matched case-insensitively inside the name "STONE AGE" —
    # the reference's (?i) material regex behaves identically
    assert r["materials"] == "marble,porcelain,stone"
    # "45 x 45 cm": the ×-pair alternative consumes the second 45, so
    # the unit alternative can't re-match it (non-overlapping scan —
    # Python's re.findall in the reference behaves identically)
    assert r["dimensions"] == "45 x 45"


def test_mine_short_and_index_penalties(spark):
    # short (<100): name-any 0.3 + name-extract 0.1 → 0.4 * 0.5 = 0.2
    r = _mine(spark, "TINY CAPS note")
    assert r["quality_score"] == pytest.approx(0.2)
    # index-like: 'page' + >3 numbers → ×0.3
    r2 = _mine(spark, "MARMO page 1 2 3 4 listing with a collection "
               "texture" + PAD)
    # name 0.3 + desc 0.15 + name-extract 0.1 = 0.55; ×0.3 = 0.165
    assert r2["quality_score"] == pytest.approx(0.165)
