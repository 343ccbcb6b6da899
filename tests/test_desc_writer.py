"""Pins for the product-description-writer folds
(app/services/products/product_description_writer.py)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import desc_writer as dsw


def _clean(spark, rows):
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["product_id", "chunk_ord", "content"]))
    return dsw.clean_chunks(df).collect()


def test_english_ratio_is_015_not_40pct(spark):
    # ~20% function words: fails the docstring's 40% but passes the
    # code's 0.15 (pin)
    text = ("the marmol porcelanico esmaltado brillo acabado "
            "superficie is rectificado")
    rows = _clean(spark, [("p", 0, text)])
    assert rows[0].is_english is True


def test_clean_order_and_collapse(spark):
    rows = _clean(spark, [("p", 0,
                           "--- # Page 3 ---  intro\n12 — body   here")])
    assert rows[0].cleaned == "intro body here"


def test_assembly_english_then_shorter_first(spark):
    eng_long = ("the design is a new collection of the tile and it "
                "is made for all of the interiors with the warm "
                "tones of the clay")
    eng_short = "the tile is a new design of the collection"
    spa = "la coleccion es un diseno nuevo para los interiores"
    df = spark.createDataFrame(pd.DataFrame(
        [("p", 0, spa), ("p", 1, eng_long), ("p", 2, eng_short)],
        columns=["product_id", "chunk_ord", "content"]))
    out = dsw.assemble_chunks_text(df).collect()[0]
    parts = out.chunks_text.split("\n\n")
    assert parts == [eng_short, eng_long, spa]


def test_assembly_boundary_truncation(spark):
    # two chunks of 3500 chars: the second is cut to 2500
    a = "the is a " + "x" * 3491
    b = "the of to " + "y" * 3490
    df = spark.createDataFrame(pd.DataFrame(
        [("p", 0, a), ("p", 1, b)],
        columns=["product_id", "chunk_ord", "content"]))
    out = dsw.assemble_chunks_text(df).collect()[0]
    parts = out.chunks_text.split("\n\n")
    assert len(parts[0]) == 3500
    assert len(parts[1]) == 2500          # 6000 - 3500
    # join separators NOT counted: total exceeds the cap (pin)
    assert len(out.chunks_text) == 6002


def _shape(spark, texts):
    df = spark.createDataFrame(pd.DataFrame(
        [(i, t) for i, t in enumerate(texts)],
        columns=["response_id", "raw_text"]))
    return {r.response_id: r.description
            for r in dsw.shape_response(df).collect()}


def test_fence_branch_dead_after_backtick_strip(spark):
    # strip('`') removes the fence BEFORE the startswith('```') check
    # — the split branch can never fire (pin): the body survives
    body = "A porcelain collection with warm tones and matte finish"
    out = _shape(spark, [f"```{body}```"])
    assert out[0] == body


def test_here_is_without_colon_keeps_text(spark):
    body = "here is a porcelain collection with warm tones and glaze"
    out = _shape(spark, [body])
    assert out[0] == body                # no colon -> whole text (pin)
    out2 = _shape(spark, ["Here is the description: " + body])
    assert out2[0] == body


def test_short_and_long_results(spark):
    out = _shape(spark, ["tiny", "z" * 1600])
    assert out[0] is None                 # < 20 chars
    assert out[1] == "z" * 1500 + "…"
