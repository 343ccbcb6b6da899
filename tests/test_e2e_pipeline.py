"""End-to-end training-data pipeline composition (SURVEY §3.1 lifecycle
analogue): documents -> resumable extraction -> layout chunking -> quality
scoring -> dedup -> fingerprints, with structural invariants that hold for
ANY corpus:

- chunk reassembly: joining a doc's chunk contents with the chunk
  separator reproduces exactly the join of its non-empty extracted span
  texts (the chunker may only cut, never alter or drop text);
- size cap: every multi-span chunk is <= max_size (a single oversized
  span is allowed through atomically);
- quality in [0, 1]; dedup idempotent.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators.chunking import chunk_documents
from mivaa_pdf_extractor_spark.operators.dedup import exact_dedup
from mivaa_pdf_extractor_spark.operators.text_analysis import \
    winnowing_fingerprints
from mivaa_pdf_extractor_spark.plans.pipeline import (read_extracted_latest,
                                                      run_pipeline)
from mivaa_pdf_extractor_spark.sources.synthetic import (corpus_to_spark_df,
                                                         gen_corpus)
from mivaa_pdf_extractor_spark.sources.tables_io import Catalog

MAX = 300


@pytest.fixture(scope="module")
def extracted(spark, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("e2e") / "wh"))
    docs = corpus_to_spark_df(spark, gen_corpus(60, seed=11, giants=1))
    run_pipeline(spark, docs, cat, run_id="e2e")
    return read_extracted_latest(cat).cache()


def test_chunks_reassemble_to_span_text(spark, extracted):
    chunks = chunk_documents(extracted, strategy="layout", max_size=MAX,
                             dedup=False)
    got = {r["doc_id"]: r["joined"] for r in
           (chunks.groupBy("doc_id")
            .agg(F.array_join(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("chunk_index", "content"))),
                lambda x: x["content"]), "\n\n").alias("joined"))).collect()}
    want_rows = (extracted
                 .select("doc_id", F.array_join(F.filter(
                     F.transform("spans", lambda s: s["text"]),
                     lambda t: t != ""), "\n\n").alias("joined"))
                 .collect())
    n_checked = 0
    for r in want_rows:
        if r["joined"]:
            assert got[r["doc_id"]] == r["joined"], r["doc_id"]
            n_checked += 1
        else:
            assert r["doc_id"] not in got
    assert n_checked >= 40  # most docs carry text


def test_chunk_size_cap_and_quality_bounds(spark, extracted):
    chunks = chunk_documents(extracted, strategy="layout", max_size=MAX,
                             dedup=False).cache()
    # a chunk longer than MAX must be a single span (atomic table or one
    # oversized span); multi-span chunks respect the cap
    over = chunks.filter(F.length("content") > MAX)
    multi = over.filter(F.col("content").contains("\n\n")
                        & ~F.col("is_table"))
    assert multi.count() == 0
    stats = chunks.agg(F.min("quality"), F.max("quality")).collect()[0]
    assert 0.0 <= stats[0] and stats[1] <= 1.0


def test_dedup_and_fingerprints_compose(spark, extracted):
    raw = chunk_documents(extracted, strategy="layout", max_size=MAX,
                          dedup=False).cache()
    deduped = chunk_documents(extracted, strategy="layout", max_size=MAX,
                              dedup=True)
    # chunk-level dedup == one row per (doc, content_hash); idempotent
    assert deduped.count() == raw.select("doc_id",
                                         "content_hash").distinct().count()
    # cross-doc exact dedup over chunk contents keeps one id per hash
    kept = exact_dedup(
        raw.select(F.monotonically_increasing_id().alias("cid"), "content"),
        text_col="content", id_col="cid")
    assert kept.count() == raw.select(F.md5(F.trim(F.regexp_replace(
        F.lower("content"), r"\s+", " ")))).distinct().count()
    # winnowing fingerprints over distinct chunk texts: every chunk with
    # >= 8 normalized chars yields at least one fingerprint
    fps = winnowing_fingerprints(
        raw.select(F.col("content_hash").alias("doc_id"),
                   F.col("content").alias("text")))
    n_long = (raw.filter(F.length(F.trim(F.regexp_replace(
        F.lower("content"), r"\s+", " "))) >= 8)
        .select("content_hash").distinct().count())
    assert fps.select("doc_id").distinct().count() == n_long


def test_chunk_indexing_namespace_replace(spark, tmp_path):
    """S5/J7 end to end: chunk indexing writes idempotently per document
    namespace (rag_service.py:271-309 delete-then-insert) — re-chunking a
    doc with different parameters replaces ALL its chunks with no stale
    tail, and leaves every other doc's chunks untouched."""
    from pyspark.sql import functions as F

    from mivaa_pdf_extractor_spark.plans.chunk_pipeline import (
        CHUNKS_TABLE, run_chunk_indexing)
    from mivaa_pdf_extractor_spark.plans.pipeline import run_pipeline
    from mivaa_pdf_extractor_spark.sources.synthetic import (
        corpus_to_spark_df, gen_corpus)
    from mivaa_pdf_extractor_spark.sources.tables_io import Catalog

    cat = Catalog(spark, str(tmp_path / "chunkidx"))
    docs = gen_corpus(25, seed=21)
    run_pipeline(spark, corpus_to_spark_df(spark, docs), cat, run_id="c1")

    assert run_chunk_indexing(spark, cat) is None  # default: no post-read
    n1 = run_chunk_indexing(spark, cat, count_written=True)
    assert n1 > 0
    all1 = {(r["doc_id"], r["chunk_index"]): r["content"]
            for r in cat.read(CHUNKS_TABLE).collect()}
    target = docs[0]["doc_id"]
    before_other = {k: v for k, v in all1.items() if k[0] != target}
    n_target_before = sum(1 for k in all1 if k[0] == target)
    assert n_target_before > 0

    # re-chunk ONE doc with a smaller size cap -> different chunk count
    run_chunk_indexing(spark, cat, doc_ids=[target], max_size=120)
    all2 = {(r["doc_id"], r["chunk_index"]): r["content"]
            for r in cat.read(CHUNKS_TABLE).collect()}
    after_other = {k: v for k, v in all2.items() if k[0] != target}
    assert after_other == before_other  # untouched namespaces identical
    n_target_after = sum(1 for k in all2 if k[0] == target)
    assert n_target_after != n_target_before  # genuinely re-chunked
    # no stale rows: indices are a contiguous 0..n-1 range
    idxs = sorted(i for d, i in all2 if d == target)
    assert idxs == list(range(n_target_after))
    # classifier + id stamp present
    row = cat.read(CHUNKS_TABLE).filter(
        (F.col("doc_id") == target) & (F.col("chunk_index") == 0)
    ).collect()[0]
    assert row["chunk_id"] == f"{target}_0"
    assert row["chunk_type"] is not None
    # C10 wired into Stage-2: the chunks table carries embedding_text
    assert row["embedding_text"] is not None
    assert row["embedding_text"].endswith(row["content"])


def test_winnowing_sees_document_tails(spark):
    """Round-3 verdict item 6: fingerprints cover the FULL text by
    default — two docs identical in their first 400 chars but divergent
    after must yield different fingerprint sets; an explicit max_chars
    bound makes them indistinguishable (the documented trade)."""
    head = "common prefix text. " * 25          # 500 chars, identical
    a = head + "alpha tail entirely unlike the other document here."
    b = head + "bravo ending with completely different trailing words."
    df = spark.createDataFrame([("a", a), ("b", b)],
                               "doc_id string, text string")
    full = winnowing_fingerprints(df)
    sets = {k: {r["fp"] for r in g} for k, g in
            __import__("itertools").groupby(
                sorted(full.collect(), key=lambda r: r["doc_id"]),
                key=lambda r: r["doc_id"])}
    assert sets["a"] != sets["b"]

    capped = winnowing_fingerprints(df, max_chars=400)
    csets = {k: {r["fp"] for r in g} for k, g in
             __import__("itertools").groupby(
                 sorted(capped.collect(), key=lambda r: r["doc_id"]),
                 key=lambda r: r["doc_id"])}
    assert csets["a"] == csets["b"]  # the cap's documented blindness


def test_connected_components_vs_union_find(spark):
    """Label propagation must agree with a reference union-find on a
    graph with chains, a cycle, a star, and duplicate/reversed edges."""
    from mivaa_pdf_extractor_spark.operators.dedup import (
        connected_components, dedup_canonical)

    edges = [(1, 2), (2, 3), (3, 4), (4, 1),        # cycle
             (10, 11), (11, 12), (12, 13), (13, 14),  # chain, diam 4
             (20, 21), (20, 22), (20, 23),          # star
             (2, 1), (10, 11)]                      # reversed + dup
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    pairs = spark.createDataFrame(edges, "id_a int, id_b int")
    got = {r["id"]: r["comp"]
           for r in connected_components(pairs).collect()}
    assert got == want

    docs = spark.createDataFrame([(i,) for i in range(25)], "doc_id int")
    kept = {r["doc_id"] for r in dedup_canonical(docs, pairs).collect()}
    graph_nodes = set(want)
    mins = set(want.values())
    assert kept == (set(range(25)) - graph_nodes) | mins
