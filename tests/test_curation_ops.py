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


def test_ngram_decontaminate_planted_overlap(spark):
    from mivaa_pdf_extractor_spark.operators.dedup import ngram_decontaminate

    bench = spark.createDataFrame(
        [("b1", "alpha beta gamma delta")], "doc_id string, text string")
    docs = _df(spark, [
        # carries the benchmark 3-gram "beta gamma delta" (and "alpha beta
        # gamma") verbatim -> contaminated with 2 distinct hits
        ("hit", "intro alpha beta gamma delta outro"),
        # same words, different order -> no shared 3-gram
        ("scrambled", "delta alpha gamma beta delta alpha"),
        # repeats a contaminated gram twice -> still 1 distinct hit
        ("rep", "alpha beta gamma x alpha beta gamma"),
    ])
    got = {r["id"]: r["n_hits"]
           for r in ngram_decontaminate(docs, bench, n=3).collect()}
    assert got == {"hit": 2, "rep": 1}


def test_ngram_decontaminate_broadcasts_bench_side(spark):
    from mivaa_pdf_extractor_spark.operators.dedup import ngram_decontaminate

    bench = spark.createDataFrame(
        [("b1", "alpha beta gamma delta")], "doc_id string, text string")
    docs = _df(spark, [("d", "alpha beta gamma delta")])
    plan = ngram_decontaminate(
        docs, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pii_redact_counts_and_order(spark):
    from mivaa_pdf_extractor_spark.operators.text_analysis import pii_redact

    df = _df(spark, [
        ("d1", "mail a@b.com and b@c.org ip 10.0.0.1 ssn 123-45-6789 "
               "call +1 (555) 010-0042"),
        ("d2", "clean text with no pii at all"),
    ])
    got = {r["doc_id"]: r for r in pii_redact(df).collect()}
    r = got["d1"]
    assert (r["n_email"], r["n_ip"], r["n_ssn"], r["n_phone"]) == (2, 1, 1, 1)
    # the SSN must NOT also be counted/eaten by the looser phone pattern,
    # and every tier's token must appear in the redacted text
    assert r["redacted_text"] == (
        "mail <EMAIL> and <EMAIL> ip <IP> ssn <SSN> call <PHONE>")
    c = got["d2"]
    assert (c["n_email"], c["n_ip"], c["n_ssn"], c["n_phone"]) == (0, 0, 0, 0)
    assert c["redacted_text"] == "clean text with no pii at all"


def test_pii_redact_plan_is_map_only(spark):
    from mivaa_pdf_extractor_spark.operators.text_analysis import pii_redact

    df = _df(spark, [("d", "a@b.co")])
    buf = io.StringIO()
    with redirect_stdout(buf):
        pii_redact(df).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_pack_sequences_next_fit_semantics(spark):
    from mivaa_pdf_extractor_spark.operators.packing import pack_sequences

    rows = [
        # part 0: 60+60 fit in 128, +60 overflows -> bins 0,0,1; an
        # oversize doc (200 > 128) then gets bin 2 alone; next doc bin 3
        (1, 0, 60), (2, 0, 60), (3, 0, 60), (4, 0, 200), (5, 0, 10),
        # part 1 packs independently from seq 0
        (6, 1, 128), (7, 1, 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, part int, tokens int")
    got = {r["doc_id"]: (r["part"], r["seq_id"])
           for r in pack_sequences(df, budget=128).collect()}
    assert got == {1: (0, 0), 2: (0, 0), 3: (0, 1), 4: (0, 2), 5: (0, 3),
                   6: (1, 0), 7: (1, 1)}


def test_pack_sequences_invariants(spark):
    """Every sequence fill <= budget unless it is a single oversize doc,
    assignments follow doc_id order, and sequences never span parts."""
    from mivaa_pdf_extractor_spark.operators.packing import pack_sequences

    rows = [(i, i % 3, (i * 37) % 90 + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, part int, tokens int")
    out = pack_sequences(df, budget=100).collect()
    by_seq: dict = {}
    for r in out:
        by_seq.setdefault((r["part"], r["seq_id"]), []).append(r)
    for (part, _), members in by_seq.items():
        fill = sum(m["tokens"] for m in members)
        assert fill <= 100 or len(members) == 1
        assert all(m["part"] == part for m in members)
    # order-preserving: seq_id is non-decreasing in doc_id within a part
    for p in (0, 1, 2):
        seqs = [r["seq_id"] for r in sorted(out, key=lambda r: r["doc_id"])
                if r["part"] == p]
        assert seqs == sorted(seqs)
    assert len(out) == 60
