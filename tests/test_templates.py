"""Pins per-domain template-line removal (operators/dedup.py
strip_template_lines / template_line_stats): document-frequency
thresholding, min-domain-size gate, the never-strip-singletons rule, and
order-preserving reassembly. Expected values are hand-computed."""

from mivaa_pdf_extractor_spark.operators import dedup as dd


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_strip_template_lines_by_domain_frequency(spark):
    # domain a: 6 docs, 'NAV' in all (strip), 'PROMO' in 3/6 = 50%
    # (strip at >=50%), body unique (keep)
    rows = [(i, "a", "NAV\n" + ("PROMO\n" if i < 3 else "") + f"body {i}")
            for i in range(6)]
    out = {r["doc_id"]: r for r in
           dd.strip_template_lines(_df(spark, rows)).collect()}
    assert out[0]["cleaned_text"] == "body 0"
    assert out[0]["n_lines"] == 3 and out[0]["n_kept"] == 1
    assert out[5]["cleaned_text"] == "body 5"
    assert out[5]["n_lines"] == 2 and out[5]["n_kept"] == 1


def test_strip_respects_min_domain_docs(spark):
    # domain of 4 docs < min 5: nothing stripped even at 100% frequency
    rows = [(i, "tiny", f"NAV\nbody {i}") for i in range(4)]
    out = dd.strip_template_lines(_df(spark, rows)).collect()
    assert all(r["n_kept"] == r["n_lines"] == 2 for r in out)


def test_strip_never_strips_single_doc_lines(spark):
    # even with ratio_pct=0 a line seen in ONE doc survives (doc_freq>=2)
    rows = [(i, "a", f"unique {i}") for i in range(6)]
    out = dd.strip_template_lines(
        _df(spark, rows), min_domain_docs=1, ratio_pct=0).collect()
    assert all(r["n_kept"] == 1 for r in out)


def test_strip_is_domain_scoped(spark):
    # the same nav line in two domains: stripped only where frequent —
    # domain b has it in 1 of 5 docs (20% < 50%) so b keeps it
    rows = ([(i, "a", f"SHARED NAV\nbody a{i}") for i in range(5)]
            + [(100, "b", "SHARED NAV\nbody b0")]
            + [(101 + i, "b", f"body b{1 + i}") for i in range(4)])
    out = {r["doc_id"]: r for r in
           dd.strip_template_lines(_df(spark, rows)).collect()}
    assert out[0]["cleaned_text"] == "body a0"
    assert out[100]["cleaned_text"] == "SHARED NAV\nbody b0"


def test_strip_all_template_doc_emits_empty_row(spark):
    rows = ([(i, "a", "NAV\n" + f"body {i}") for i in range(5)]
            + [(99, "a", "NAV")])
    out = {r["doc_id"]: r for r in
           dd.strip_template_lines(_df(spark, rows)).collect()}
    assert out[99]["n_lines"] == 1 and out[99]["n_kept"] == 0
    assert out[99]["cleaned_text"] == ""


def test_strip_key_normalizes_case_and_space(spark):
    # ' NAV ' and 'nav' share a key, so both forms strip; reassembly
    # keeps original order of survivors
    rows = [(i, "a", (" NAV \n" if i % 2 else "nav\n") + f"b{i}\nend {i}")
            for i in range(6)]
    out = {r["doc_id"]: r for r in
           dd.strip_template_lines(_df(spark, rows)).collect()}
    assert out[1]["cleaned_text"] == "b1\nend 1"


def test_template_line_stats_rollup(spark):
    rows = [(i, "a", "NAV\n" + ("PROMO\n" if i < 3 else "") + f"body {i}")
            for i in range(6)]
    out = dd.template_line_stats(_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    # distinct lines: NAV, PROMO, 6 bodies = 8; template: NAV + PROMO
    assert r["n_docs"] == 6 and r["n_distinct_lines"] == 8
    assert r["n_template_lines"] == 2
