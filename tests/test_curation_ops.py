"""Pins for the corpus-curation additions: Gopher-style repetition
metrics (map-only, shuffle-free) and CCNet-style block dedup."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from mivaa_pdf_extractor_spark.operators.dedup import block_dedup
from mivaa_pdf_extractor_spark.operators.text_analysis import (
    repetition_metrics)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_repetition_metrics_hand_computed(spark):
    df = _df(spark, [
        ("loop", "a b a b a b"),
        # all words distinct -> every metric 0
        ("flat", "one two three four"),
        # two words only -> below min_words, dropped
        ("tiny", "x y"),
    ])
    got = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert set(got) == {"loop", "flat"}
    r = got["loop"]
    # w = [a b a b a b]: 6 words, 2 distinct -> 4/6
    assert r["n_words"] == 6
    assert r["dup_word_frac"] == round(4 / 6, 6)
    # bigrams: [a b, b a, a b, b a, a b] -> top 'a b' 3 of 5
    assert r["top_bigram_frac"] == round(3 / 5, 6)
    # trigrams: [aba, bab, aba, bab] -> 2 repeats of 4
    assert r["dup_trigram_frac"] == 0.5
    f = got["flat"]
    assert (f["dup_word_frac"], f["top_bigram_frac"],
            f["dup_trigram_frac"]) == (0.0, round(1 / 3, 6), 0.0)


def test_repetition_metrics_plan_is_map_only(spark):
    """The operator's contract: pure projection against the scan — no
    Exchange (shuffle) anywhere in the physical plan."""
    df = _df(spark, [("d", "a b c d e")])
    buf = io.StringIO()
    with redirect_stdout(buf):
        repetition_metrics(df).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_block_dedup_cross_doc_first_wins(spark):
    ten = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    other = "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9"
    df = _df(spark, [
        ("a", f"{ten} {other}"),        # blocks: [ten, other]
        ("b", f"{other} {ten}"),        # both blocks already seen -> gone
        ("c", f"{ten} fresh tail"),     # block2 'fresh tail' survives
    ])
    got = {r["doc_id"]: r for r in block_dedup(df).collect()}
    # doc b lost every block and disappears entirely
    assert set(got) == {"a", "c"}
    assert got["a"]["n_blocks"] == 2 and got["a"]["n_kept"] == 2
    assert got["a"]["cleaned_text"] == f"{ten} {other}"
    assert got["c"]["n_blocks"] == 2 and got["c"]["n_kept"] == 1
    assert got["c"]["cleaned_text"] == "fresh tail"


def test_block_dedup_intra_doc_repeat_collapses(spark):
    ten = "r0 r1 r2 r3 r4 r5 r6 r7 r8 r9"
    df = _df(spark, [("a", f"{ten} {ten} {ten}")])
    [r] = block_dedup(df).collect()
    assert (r["n_blocks"], r["n_kept"], r["cleaned_text"]) == (3, 1, ten)
