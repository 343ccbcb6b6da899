"""The reference's own golden table fixtures, mirrored (SURVEY §5.1:
tests/unit/test_table_extraction.py:61-195 — the canonical Italian catalog
markdown table and the 3-column spec HTML table). G1-G6 parse/classify
semantics must hold verbatim; the G7 metadata-mining tests below pin the
reference's three number bugs (size-column precedence over a spuriously
token-matched axis column; IT/ES packaging abbreviations; spec value =
last populated cell) plus the dimensions-AND-packaging independence of a
combined catalog grid (test_table_extraction.py:136-195)."""

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


# ------------------------------------------------------- G7 metadata mining


def _catalog_parts():
    grid = parse_table_content(CATALOG_MARKDOWN)
    rec = table_to_record(grid)
    return rec["headers"], rec["rows"]


def test_size_column_wins_over_a_spuriously_matched_axis_column():
    """Pinned bug 1: the single-letter height keyword 'l' must not
    substring-match 'Pz/Scatola' (60x120 recorded as 60x2)."""
    from mivaa_pdf_extractor_spark.core.table_metadata import (
        dimensions_to_sizes, parse_dimensions_table)

    headers, rows = _catalog_parts()
    dims = parse_dimensions_table(headers, rows)
    assert [(d["width"], d["height"]) for d in dims] == [(60.0, 120.0),
                                                         (30.0, 60.0)]
    assert all(d["thickness"] == 9.0 for d in dims)
    assert dimensions_to_sizes(dims) == ["30x60 cm", "60x120 cm"]


def test_italian_packaging_abbreviations_populate():
    """Pinned bug 2: 'Pz' and 'Mq' column headers must populate
    pieces-per-box and coverage."""
    from mivaa_pdf_extractor_spark.core.table_metadata import (
        parse_packaging_table)

    headers, rows = _catalog_parts()
    assert parse_packaging_table(headers, rows) == {
        "pieces_per_box": 2.0,
        "boxes_per_pallet": 30.0,
        "weight_per_box_kg": 31.5,
        "coverage_per_box_m2": 1.44,
    }


def test_spec_value_is_the_measurement_not_the_standard():
    """Pinned bug 3: Property | Standard | Value — the value is the last
    populated cell, not row[1] (the ISO reference)."""
    from mivaa_pdf_extractor_spark.core.table_metadata import (
        parse_specifications_table)

    grid = parse_table_content(SPEC_HTML)
    perf = parse_specifications_table(table_to_record(grid)["rows"])
    assert perf["water_absorption"] == "< 0,5%"
    assert perf["slip_resistance"] == "R10"
    assert perf["frost_resistance"] == "Conforme"


def test_split_axis_english_table_still_works():
    """The axis-column fallback must survive the size-column precedence
    fix (token matching: 'w'/'h' match whole tokens, long keywords match
    substrings)."""
    from mivaa_pdf_extractor_spark.core.table_metadata import (
        parse_dimensions_table, parse_packaging_table)

    headers = ["Width", "Height", "Thickness", "Pcs/Box"]
    rows = [["30", "60", "8", "10"]]
    assert parse_dimensions_table(headers, rows) == [
        {"width": 30.0, "height": 60.0, "thickness": 8.0, "unit": "cm"}]
    assert parse_packaging_table(headers, rows)["pieces_per_box"] == 10.0


def test_one_table_yields_both_dimensions_and_packaging():
    """Pinned behavior 4: dimensions and packaging are mined
    independently — a 'dimensions' label must not discard the packaging
    half of the combined catalog grid."""
    from mivaa_pdf_extractor_spark.core.table_metadata import (
        looks_like_dimensions, looks_like_packaging, mine_table)

    headers, rows = _catalog_parts()
    assert looks_like_dimensions(headers)
    assert looks_like_packaging(headers)
    mined = mine_table("dimensions", headers, rows)
    assert mined["available_sizes"] == ["30x60 cm", "60x120 cm"]
    assert mined["thickness_mm"] == 9.0
    assert mined["packaging"]["pieces_per_box"] == 2.0
    assert mined["packaging"]["coverage_per_box_m2"] == 1.44


def test_generic_table_regex_sweep():
    """Unclassified tables still yield dimensions/packaging via the regex
    sweep (table_metadata_extractor.py:369-411)."""
    from mivaa_pdf_extractor_spark.core.table_metadata import mine_table

    headers = ["A", "B"]
    rows = [["item one 45x90 cm", "4 pcs/box"], ["item two", "22,5 kg/box"]]
    mined = mine_table("other", headers, rows)
    assert mined["dimensions"][0]["width"] == 45.0
    assert mined["packaging"]["pieces_per_box"] == 4.0
    assert mined["packaging"]["weight_per_box_kg"] == 22.5


def test_mine_table_metadata_spark_operator(spark):
    """The Spark G7 stage: one flat mined row per parseable table, nulls
    where a table doesn't carry a field."""
    from mivaa_pdf_extractor_spark.operators.tables_op import (
        mine_table_metadata)

    df = spark.createDataFrame(
        [("cat", CATALOG_MARKDOWN), ("spec", SPEC_HTML),
         ("prose", "no table here")],
        "doc_id string, text string")
    rows = {r["id"]: r for r in mine_table_metadata(df).collect()}
    assert set(rows) == {"cat", "spec"}  # prose: None is not a table
    cat = rows["cat"]
    assert cat["table_type"] == "dimensions"
    assert cat["sizes"] == "30x60 cm,60x120 cm"
    assert cat["thickness_mm"] == 9.0
    assert cat["pieces_per_box"] == 2.0
    assert cat["boxes_per_pallet"] == 30.0
    assert cat["weight_per_box_kg"] == 31.5
    assert cat["coverage_per_box_m2"] == 1.44
    assert cat["water_absorption"] is None
    spec = rows["spec"]
    assert spec["table_type"] == "specifications"
    assert spec["sizes"] is None
    assert spec["water_absorption"] == "< 0,5%"
    assert spec["slip_resistance"] == "R10"
    assert spec["frost_resistance"] == "Conforme"


def test_aggregate_product_metadata_merge_semantics(spark):
    """The reference's per-product merge (table_metadata_extractor.py:
    96-171): packaging first-non-null in table order, performance
    dict-update (last wins), sizes sorted-distinct union, modal thickness
    with smallest-value tie-break."""
    from mivaa_pdf_extractor_spark.operators.tables_op import (
        MINED_SCHEMA, aggregate_product_metadata)

    cols = [f.name for f in MINED_SCHEMA.fields]

    def row(page, **kw):
        base = {c: None for c in cols}
        base["id"] = str(page)
        base.update(kw)
        return ("p1", page, *[base[c] for c in cols])

    mined = spark.createDataFrame(
        [row(1, table_type="dimensions", sizes="60x120 cm",
             thickness_mm=9.0, pieces_per_box=2.0),
         row(2, table_type="packaging", pieces_per_box=6.0,   # later: loses
             weight_per_box_kg=20.5),                         # first: wins
         row(3, table_type="specifications", water_absorption="< 0,5%",
             slip_resistance="R10"),
         row(4, table_type="specifications",
             water_absorption="< 0,1%"),                      # later: wins
         row(5, table_type="dimensions", sizes="30x60 cm,60x120 cm",
             thickness_mm=8.0),
         row(6, table_type="dimensions", thickness_mm=8.0)],  # mode -> 8
        "product_id string, page int, " + ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in MINED_SCHEMA.fields))
    out = aggregate_product_metadata(mined).collect()
    assert len(out) == 1
    r = out[0]
    assert r["sizes"] == "30x60 cm,60x120 cm"
    assert r["thickness_mm"] == 8.0          # two 8.0 tables beat one 9.0
    assert r["pieces_per_box"] == 2.0        # first non-null wins
    assert r["weight_per_box_kg"] == 20.5
    assert r["water_absorption"] == "< 0,1%" # last non-null wins
    assert r["slip_resistance"] == "R10"
    assert r["boxes_per_pallet"] is None
