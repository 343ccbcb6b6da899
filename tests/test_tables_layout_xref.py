"""Pinned semantics for the G1-G6 table operators, L1/L2 layout, T5
similarity and C8 cross-references (SURVEY.md §2.2/§2.3/§2.5/§2.6)."""

from __future__ import annotations

from mivaa_pdf_extractor_spark.core.tables import (classify_table,
                                                   parse_html_table,
                                                   parse_markdown_table,
                                                   parse_table_content,
                                                   table_to_record)


def test_markdown_parse_drops_alignment_and_unescapes():
    md = "| Articolo | Prezzo \\| EUR |\n|---|:---:|\n| X10 | 12,50 |"
    grid = parse_markdown_table(md)
    assert grid == [["Articolo", "Prezzo | EUR"], ["X10", "12,50"]]


def test_html_parse_tolerates_unclosed_tr_and_collapses_ws():
    html = ("<table><tr><th>Size</th><th> Pack\n  Qty </th>"
            "<tr><td>60x60</td><td>4 Pz</td></table>")
    assert parse_html_table(html) == [["Size", "Pack Qty"],
                                      ["60x60", "4 Pz"]]


def test_dispatch_none_is_not_empty_table():
    assert parse_table_content("plain prose, no grid") is None
    assert parse_table_content("| a | b |\n| c | d |") == [["a", "b"],
                                                           ["c", "d"]]
    assert parse_table_content("<tr><td>a</td><td>b</td></tr>"
                               "<tr><td>c</td><td>d</td></tr>") is not None
    # sub-minimum grids (under 2x2) normalize away
    assert parse_table_content("| only |\n| one |") is None


def test_classify_priority_pricing_beats_dimensions():
    grid = [["Price", "Size"], ["1", "2"]]
    assert classify_table(grid) == "pricing"
    assert classify_table([["Misure", "Confezione"], ["a", "b"]]) == \
        "dimensions"
    assert classify_table([["Scatola", "Pz/Box"], ["a", "b"]]) == "packaging"
    assert classify_table([["Name", "Id"], ["a", "b"]]) == "other"


def test_table_to_record_shape():
    rec = table_to_record([["h1", "h2"], ["a", "b"], ["c", "d"]])
    assert rec == {"headers": ["h1", "h2"], "rows": [["a", "b"], ["c", "d"]],
                   "num_rows": 2, "num_cols": 2}


def test_sheet_layout_spread_thresholds(spark):
    from mivaa_pdf_extractor_spark.operators.layout import \
        analyze_sheet_layout
    rows = [("d1", 0, 595.0, 842.0),    # portrait -> single
            ("d1", 1, 1346.0, 842.0),   # aspect 1.6 -> spread
            ("d1", 2, 1100.0, 842.0),   # aspect 1.31 ambiguous -> single
            ("d2", 0, 1346.0, 842.0)]
    df = spark.createDataFrame(rows, "doc_id string, sheet_idx int, "
                                     "width double, height double")
    got = {(r["doc_id"], r["sheet_idx"]):
           (r["layout_type"], r["n_physical"], r["first_physical_page"])
           for r in analyze_sheet_layout(df).collect()}
    assert got[("d1", 0)] == ("single", 1, 1)
    assert got[("d1", 1)] == ("spread", 2, 2)
    assert got[("d1", 2)] == ("single", 1, 4)  # after a 2-page spread
    assert got[("d2", 0)] == ("spread", 2, 1)


def test_word_overlap_and_seq_ratio(spark):
    from pyspark.sql import functions as F

    from mivaa_pdf_extractor_spark.operators.text_analysis import (
        sequence_ratio_pairs, word_overlap_similarity)
    df = spark.createDataFrame(
        [("the cat sat", "the cat sat on the mat"),
         ("", ""),
         ("abc", "xyz")],
        "text_a string, text_b string")
    out = df.select(
        word_overlap_similarity(F.col("text_a"), F.col("text_b"))
        .alias("ov")).collect()
    # {the,cat,sat} vs {the,cat,sat,on,mat}: 3/5
    assert abs(out[0]["ov"] - 0.6) < 1e-9
    assert out[1]["ov"] == 0.0
    assert out[2]["ov"] == 0.0

    ratios = sequence_ratio_pairs(df).select("seq_ratio").collect()
    from difflib import SequenceMatcher
    assert abs(ratios[0]["seq_ratio"]
               - SequenceMatcher(None, "the cat sat",
                                 "the cat sat on the mat").ratio()) < 1e-9


def test_cross_refs_resolution(spark):
    from mivaa_pdf_extractor_spark.operators.chunking import detect_cross_refs
    chunks = spark.createDataFrame(
        [("d1", 0, 1, "see page 2 and refer to page 9, cf. Table 3-1"),
         ("d1", 1, 2, "See the Figure 2.4 (see 1); refer to Appendix B"),
         ("d1", 2, 2, "described in Section 7")],
        "doc_id string, chunk_index int, page int, content string")
    rows = detect_cross_refs(chunks).collect()
    out = {(r["src_chunk"], r["ref_type"], r["ref_value"]):
           list(r["target_chunks"]) for r in rows}
    assert out[(0, "page", "2")] == [1, 2]
    assert out[(0, "page", "9")] == []  # unresolvable -> empty targets
    assert out[(1, "figure", "2.4")] == []
    assert out[(1, "page", "1")] == [0]  # parenthesized (see 1) resolves
    assert out[(1, "appendix", "B")] == []
    assert out[(2, "section", "7")] == []
    # 'cf. Table 3-1' has no see/refer verb -> table pattern must NOT fire
    assert (0, "table", "3-1") not in out


def test_cross_refs_over_engine_chunks(spark):
    """Round-3 verdict item 1 (last clause): detect_cross_refs consumes the
    engine's OWN page column — chunk_documents output wires in directly,
    no caller-supplied page."""
    from mivaa_pdf_extractor_spark.operators.chunking import (
        chunk_documents, detect_cross_refs)
    from mivaa_pdf_extractor_spark.operators.extract import run_extract
    from mivaa_pdf_extractor_spark.sources.synthetic import (
        corpus_to_spark_df, gen_corpus)
    from pyspark.sql import functions as F

    docs = gen_corpus(20, seed=13)
    extracted = run_extract(corpus_to_spark_df(spark, docs), 4)
    # plant a page reference into one doc's first text span so at least one
    # ref resolves through the engine-derived page index
    planted = extracted.withColumn(
        "spans", F.transform("spans", lambda s, i: F.struct(
            s["kind"].alias("kind"),
            F.when((i == 0) & (s["text"] != ""),
                   F.concat(s["text"], F.lit(" see page 1")))
            .otherwise(s["text"]).alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
            s["page"].alias("page"))))
    chunks = chunk_documents(planted, strategy="layout", dedup=False)
    refs = detect_cross_refs(chunks)  # default page_col='page' = engine col
    rows = refs.filter(F.col("ref_type") == "page").collect()
    assert rows, "planted page refs must be detected"
    resolved = [r for r in rows if list(r["target_chunks"])]
    assert resolved, "page-1 refs must resolve via the engine page column"
