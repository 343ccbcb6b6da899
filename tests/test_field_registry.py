"""Pins for the category field registry prompt builders
(operators/field_registry.py vs category_field_registry.py)."""

import pytest

from mivaa_pdf_extractor_spark.operators.field_registry import (
    CONTROLLED_VOCAB, SKIP_FIELDS, build_prompt_sections, registry_df)


@pytest.fixture(scope="module")
def built(spark):
    rows = build_prompt_sections(registry_df(spark)).collect()
    return {r["category"]: r.asDict() for r in rows}


def test_prompt_text_format(built):
    t = built["tiles"]["prompt_text"]
    lines = t.split("\n")
    assert lines[0] == "PRIORITY FIELDS for TILES products:"
    assert lines[1] == ("(Extract these if present — they are the "
                        "most important for this category)")
    assert lines[2] == ""
    assert lines[3] == "**Material Properties:**"
    assert lines[4] == ("- body_type: Body type (e.g. white body, "
                        "full body, red body)")
    # each section separated by a blank line; text ends with newline
    assert "\n\n**Dimensions:**\n" in t
    assert t.endswith("\n")
    # section order follows the reference dict insertion order
    order = [ln for ln in lines if ln.startswith("**")]
    assert order == [
        "**Material Properties:**", "**Dimensions:**",
        "**Appearance:**", "**Performance:**", "**Packaging:**",
        "**Commercial:**", "**Application:**", "**Compliance:**",
        "**Care:**"]


def test_hints_and_lists(built):
    g = built["general_materials"]
    assert g["hints_text"].startswith(
        "CATEGORY-SPECIFIC EXTRACTION TIPS for General Materials:\n- ")
    assert g["hints_text"].count("\n- ") == 4
    assert g["skip_fields"] == SKIP_FIELDS["general_materials"]
    assert g["controlled_vocab"] == \
        CONTROLLED_VOCAB["general_materials"]
    # tiles skip list pins the cross-category exclusions
    assert "janka_hardness" in built["tiles"]["skip_fields"]
    assert "grout_mapei" not in built["tiles"]["skip_fields"]
    assert "grout_mapei" in g["skip_fields"]
