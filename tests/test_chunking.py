"""Pin the Arrow-native layout chunker (operators/chunking.py
`_layout_chunks_arrow`) to the pure-Python spec `chunk_layout` — the state
machine was rewritten to keep string bytes inside Arrow, so every boundary
rule (atomic tables, heading breaks, size-cap flush, empty-span skip, kinds
set) needs an explicit equality pin. Also covers the text strategies."""

from __future__ import annotations

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators.chunking import (chunk_documents,
                                                          chunk_fixed,
                                                          chunk_hybrid,
                                                          chunk_layout,
                                                          chunk_semantic)
from mivaa_pdf_extractor_spark.sources.synthetic import SPAN_STRUCT
from pyspark.sql import types as T

EXTRACTED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
])


def sp(kind, text):
    return (kind, text, "", 0)


_DOCS = [
    ("d0", [sp("heading", "# Title"), sp("text", "para one."),
            sp("text", "para two."), sp("table", "| a | b |\n| --- | --- |"),
            sp("text", "after table")]),
    # empty texts (media spans) skipped; table first; table last
    ("d1", [sp("table", "| t |"), sp("image", ""), sp("text", "x"),
            sp("table", "| u |")]),
    # size-cap flush: three 40-char texts with max_size=100
    ("d2", [sp("text", "a" * 40), sp("text", "b" * 40), sp("text", "c" * 40),
            sp("list", "- item"), sp("code", "x = 1")]),
    # heading mid-stream starts a new chunk; consecutive headings
    ("d3", [sp("text", "intro"), sp("heading", "# H1"),
            sp("heading", "## H2"), sp("caption", "fig")]),
    # all-empty doc -> zero chunks
    ("d4", [sp("image", ""), sp("figure", "")]),
    # unicode lengths (astral chars count as 1 codepoint)
    ("d5", [sp("text", "😀" * 60), sp("text", "é" * 60)]),
    ("d6", []),
]

MAX = 100


def test_layout_chunker_matches_spec(spark):
    df = spark.createDataFrame(_DOCS, schema=EXTRACTED_SCHEMA)
    got = {}
    for r in chunk_documents(df, strategy="layout", max_size=MAX,
                             dedup=False).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_index"], r["content"], r["is_table"], r["kinds"]))
    for doc_id, spans in _DOCS:
        want = [
            (i, c["content"], c["is_table"], c["kinds"])
            for i, c in enumerate(chunk_layout(
                [{"kind": k, "text": t} for k, t, _r, _o in spans], MAX))
        ]
        assert sorted(got.get(doc_id, [])) == want, doc_id


def test_layout_chunk_boundaries():
    # hand-computed: d2 with max 100 -> aaa..+bbb.. (82) flush before ccc..
    chunks = chunk_layout([{"kind": "text", "text": "a" * 40},
                           {"kind": "text", "text": "b" * 40},
                           {"kind": "text", "text": "c" * 40}], MAX)
    assert [len(c["content"]) for c in chunks] == [82, 40]


def test_layout_positional_metadata(spark):
    """Round-3 verdict item 1: chunks carry page / start_offset /
    end_offset / total_chunks (reference Chunk model,
    unified_chunking_service.py:51-61,856-866) consistent with the span
    offsets, and the layout chunks exactly tile the doc's char range
    [0, n_chars) (kb_chunker.py:217-228 coverage invariant)."""
    from mivaa_pdf_extractor_spark.operators.extract import run_extract
    from mivaa_pdf_extractor_spark.sources.synthetic import (
        corpus_to_spark_df, gen_corpus)

    docs = gen_corpus(60, seed=7)
    extracted = run_extract(corpus_to_spark_df(spark, docs), 8)
    rows = {r["doc_id"]: r for r in extracted.collect()}
    by_doc: dict[str, list] = {}
    for c in chunk_documents(extracted, strategy="layout",
                             dedup=False).collect():
        by_doc.setdefault(c["doc_id"], []).append(c)

    checked_chunks = 0
    for doc_id, cs in by_doc.items():
        cs.sort(key=lambda c: c["chunk_index"])
        r = rows[doc_id]
        want = chunk_layout([
            {"kind": s["kind"], "text": s["text"], "page": s["page"],
             "offset": s["offset"]} for s in r["spans"]])
        assert len(cs) == len(want), doc_id
        for got, w in zip(cs, want):
            assert got["content"] == w["content"]
            assert got["page"] == w["page"]
            assert got["start_offset"] == w["start_offset"]
            assert got["end_offset"] == w["end_offset"]
            assert got["total_chunks"] == len(want)
            checked_chunks += 1
        # coverage tiling in char space: contiguous, starts at 0, ends at
        # n_chars (media spans contribute 0 chars so offsets stay tight)
        assert cs[0]["start_offset"] == 0, doc_id
        for a, b in zip(cs, cs[1:]):
            assert a["end_offset"] == b["start_offset"], doc_id
        assert cs[-1]["end_offset"] == r["n_chars"], doc_id
        pages = [c["page"] for c in cs]
        assert pages == sorted(pages), doc_id
    assert checked_chunks > 50  # the corpus must actually exercise this


def test_chunk_type_classifier_golden(spark):
    """C11 pattern tier: each golden text must classify to its intended
    type (chunk_type_classification_service.py:250-327 precedence), so a
    shared bug in the Spark expression and its DuckDB twin can't hide
    behind cross-engine agreement."""
    from mivaa_pdf_extractor_spark.operators.chunking import \
        classify_chunk_types

    cases = [
        ("ALUMA series design available in matte finish 15×38",
         "product_description", 0.85),
        ("specification: thickness 12 mm, high density • resistance tested",
         "technical_specs", 0.90),
        ("style aesthetic moodboard ![](img.jpg)", "visual_showcase", 0.80),
        ("anna of the studio shares her inspiration and philosophy and"
         " creative process", "designer_story", 0.85),
        ("the collection comprises a range of pieces, featuring many works",
         "collection_overview", 0.80),
        ("table of contents ... 4", "index_content", 0.95),
        ("sustainable and recycled materials, responsibly eco-friendly",
         "sustainability_info", 0.90),
        ("certified to ISO 9001 standard compliance",
         "certification_info", 0.90),
        ("the quiet afternoon sun settled over the warehouse floor while"
         " folks talked about lunch", "supporting_content", 0.60),
        ("ok then", "unclassified", 0.30),
        # precedence: product wins over tech even when both would match
        ("SLABX specification dimensions 20×40 includes material finish",
         "product_description", 0.85),
        # index via the repeated "by DESIGNER" listing pattern
        ("AZUL by ROSSI\nVERDE by BIANCHI\nROSSO by NERI",
         "index_content", 0.95),
    ]
    df = spark.createDataFrame([(i, t) for i, (t, _ty, _c) in
                                enumerate(cases)], ["id", "content"])
    got = {r["id"]: r for r in classify_chunk_types(df).collect()}
    for i, (_t, want_type, want_conf) in enumerate(cases):
        assert got[i]["chunk_type"] == want_type, (i, got[i]["chunk_type"])
        assert abs(got[i]["type_confidence"] - want_conf) < 1e-9


def test_text_strategies_roundtrip(spark):
    text = ("Sentence one. Sentence two! Longer paragraph follows here.\n\n"
            + "word " * 300 + "\n\nfinal para.")
    df = spark.createDataFrame(
        [("t0", [sp("text", text)])], schema=EXTRACTED_SCHEMA)
    for strategy, fn in (("fixed", chunk_fixed), ("semantic", chunk_semantic),
                         ("hybrid", chunk_hybrid)):
        got = [r["content"] for r in
               chunk_documents(df, strategy=strategy, max_size=200,
                               dedup=False)
               .orderBy("chunk_index").collect()]
        assert got == fn(text, 200), strategy


def test_embedding_text_running_heading(spark):
    """C10 (kb_chunker.py:169-177,231-235): running heading state — a
    heading chunk sets the context, later chunks inherit it across page
    boundaries until the next heading; title-only / heading-only /
    combined locations."""
    from mivaa_pdf_extractor_spark.operators.chunking import (
        with_embedding_text)

    rows = [
        # doc A has a title; headings at chunk 1 and 3 (page change at 3)
        ("A", 0, "intro", "Guide"),
        ("A", 1, "# Install\n\nsteps", "Guide"),
        ("A", 2, "more steps", "Guide"),
        ("A", 3, "## Run\n\ngo", "Guide"),
        ("A", 4, "tail", "Guide"),
        # doc B has no title and no leading heading
        ("B", 0, "plain", None),
        ("B", 1, "# Only\n\nbody", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, chunk_index int, content string, title string")
    got = {(r["doc_id"], r["chunk_index"]):
           (r["heading_context"], r["embedding_text"])
           for r in with_embedding_text(df, title_col="title").collect()}
    assert got[("A", 0)] == ("Guide", "Guide\n\nintro")
    assert got[("A", 1)] == ("Guide › Install",
                             "Guide › Install\n\n# Install\n\nsteps")
    assert got[("A", 2)] == ("Guide › Install", "Guide › Install\n\nmore steps")
    assert got[("A", 3)] == ("Guide › Run", "Guide › Run\n\n## Run\n\ngo")
    assert got[("A", 4)] == ("Guide › Run", "Guide › Run\n\ntail")
    assert got[("B", 0)] == (None, "plain")  # no location -> bare content
    assert got[("B", 1)] == ("Only", "Only\n\n# Only\n\nbody")


def test_embedding_text_over_engine_chunks(spark):
    """with_embedding_text composes directly with chunk_documents output:
    the layout chunker's '# ' chunk-leading markers are the heading
    state."""
    from mivaa_pdf_extractor_spark.operators.chunking import (
        with_embedding_text)

    df = spark.createDataFrame(
        [("d", [sp("text", "intro"), sp("heading", "# Alpha"),
                sp("text", "body one"), sp("heading", "# Beta"),
                sp("text", "body two")])], schema=EXTRACTED_SCHEMA)
    chunks = chunk_documents(df, strategy="layout", max_size=20, dedup=False)
    got = [r["heading_context"] for r in
           with_embedding_text(chunks).orderBy("chunk_index").collect()]
    # chunk 0 precedes any heading -> null context
    assert got[0] is None
    assert "Alpha" in got[1] and "Beta" in got[-1]


def test_text_strategy_offsets():
    """Round-3 verdict item 5: start/end offsets on the text strategies.
    Fixed offsets are exact source slices; semantic offsets cover the
    chunk's own (non-carry) paragraphs; hybrid re-splits map through the
    parent chunk's start."""
    from mivaa_pdf_extractor_spark.operators.chunking import (
        chunk_fixed_spans, chunk_hybrid_spans, chunk_semantic_spans)

    text = "First sentence here. Second one follows! " * 10
    for content, s, e in chunk_fixed_spans(text, 100, 30, 20):
        assert text[s:e] == content  # exact, strip-adjusted
        assert e - s == len(content)

    # paragraphs with NON-canonical separators ('\n \n') — offsets must
    # still point at the source paragraphs
    paras = ["alpha one", "beta two three", "gamma", "delta five"]
    src = paras[0] + "\n\n" + paras[1] + "\n \n" + paras[2] + "\n\n" + paras[3]
    spans = chunk_semantic_spans(src, max_size=25, overlap=5)
    assert [c for c, _s, _e in spans] == [
        "alpha one\n\nbeta two three",   # 25 chars == max_size: both fit
        "three\n\ngamma\n\ndelta five"]  # 5-char carry prefix from overlap
    for _c, s, e in spans:
        # every chunk's source range starts at a paragraph start
        assert any(src[s:].startswith(p) for p in paras), (s, src[s:s+10])
        assert e <= len(src)
    # first chunk maps exactly (no carry prefix)
    c0, s0, e0 = spans[0]
    assert src[s0:e0] == c0

    big = "x" * 300  # single oversized paragraph -> hybrid re-split
    hspans = chunk_hybrid_spans(big, max_size=100, min_size=10, overlap=20)
    assert len(hspans) > 1
    for content, s, e in hspans:
        assert big[s:e] == content  # single-para doc: exact mapping


def test_chunk_documents_fixed_offsets(spark):
    """Offsets flow through the Arrow mapInArrow stage into the chunks
    table (previously null on text strategies)."""
    text = "abcdef" * 60  # 360 chars, no backoff boundaries
    df = spark.createDataFrame(
        [("t0", [sp("text", text)])], schema=EXTRACTED_SCHEMA)
    rows = (chunk_documents(df, strategy="fixed", max_size=150, dedup=False)
            .orderBy("chunk_index").collect())
    for r in rows:
        assert text[r["start_offset"]:r["end_offset"]] == r["content"]
    assert rows[0]["start_offset"] == 0
    assert rows[-1]["end_offset"] == len(text)
    assert rows[0]["page"] is None  # no single source page: stays null
