"""The reference's own golden table fixtures, mirrored (SURVEY §5.1:
tests/unit/test_table_extraction.py:61-195 — the canonical Italian catalog
markdown table and the 3-column spec HTML table). G7's metadata mining
(dimensions/packaging number parsing) is out of scope per SURVEY; the
parsing + classification semantics those fixtures pin are G1-G6 and must
hold here verbatim."""

from __future__ import annotations

import pytest

from mivaa_pdf_extractor_spark.core.tables import (classify_table,
                                                   parse_table_content,
                                                   table_to_record)

CATALOG_MARKDOWN = """| Formato | Spessore | Pz/Scatola | Mq/Scatola | Kg/Scatola | Scatole/Pallet |
|---------|:--------:|-----------:|------------|------------|----------------|
| 60x120 cm | 9 mm | 2 | 1,44 | 31,5 | 30 |
| 30x60 cm | 9 mm | 6 | 1,08 | 23,8 | 40 |
"""

SPEC_HTML = (
    "<table>"
    "<tr><th>Caratteristica</th><th>Norma</th><th>Valore</th></tr>"
    "<tr><td>Assorbimento <b>acqua</b></td><td>ISO 10545-3</td>"
    "<td>&lt; 0,5%</td></tr>"
    "<tr><td>Resistenza allo scivolamento</td><td>DIN 51130</td>"
    "<td>R10</td></tr>"
    "<tr><td>Resistenza al gelo</td><td>ISO 10545-12</td>"
    "<td>Conforme</td></tr>"
    "</table>"
)


def test_markdown_table_parses_and_drops_the_alignment_row():
    grid = parse_table_content(CATALOG_MARKDOWN)
    assert grid is not None
    assert grid[0][0] == "Formato"
    # 1 header + 2 data rows — the |---|:--:| row is syntax, not data
    assert len(grid) == 3
    assert grid[1] == ["60x120 cm", "9 mm", "2", "1,44", "31,5", "30"]


def test_html_table_parses_with_nested_tags_and_entities():
    grid = parse_table_content(SPEC_HTML)
    assert grid is not None
    assert len(grid) == 4
    # nested <b> must not split the cell; &lt; must be unescaped
    assert grid[1][0] == "Assorbimento acqua"
    assert grid[1][2] == "< 0,5%"


@pytest.mark.parametrize(
    "content",
    ["", "   ", "just some prose with no table", "| only one row |",
     "| a |\n| b |"],
)
def test_unusable_content_returns_none_not_an_empty_table(content):
    # callers skip the region on None; an empty table would mask the failure
    assert parse_table_content(content) is None


def test_combined_catalog_table_classifies_as_dimensions():
    grid = parse_table_content(CATALOG_MARKDOWN)
    assert classify_table(grid) == "dimensions"
    rec = table_to_record(grid)
    assert rec["num_rows"] == 2 and rec["num_cols"] == 6


def test_italian_spec_table_classifies_as_specifications():
    grid = parse_table_content(SPEC_HTML)
    assert classify_table(grid) == "specifications"
