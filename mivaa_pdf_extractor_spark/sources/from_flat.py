"""Native (no-Python) synthesis of span-structured documents from a flat
``documents(doc_id, text, ...)`` table.

Used by the driver contract and the bench: the engine's input schema is
``(doc_id, spans array<struct<kind,text,media_ref,offset>>)``; this converts
the testdata corpus into that shape deterministically with pure Column
expressions, so the whole plan stays in Tungsten until the extraction UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def documents_to_spans(df: DataFrame, words_per_span: int = 8) -> DataFrame:
    """Split each text into spans of ``words_per_span`` words; spans get
    synthetic geometry (10 spans per page, descending y, first span titled).
    Deterministic: same input -> same spans.

    Span texts are produced by ONE regex pass per row (insert a NUL
    delimiter after every ``words_per_span`` words, split once) instead of
    ``slice(split(text), i*k, k)`` inside the per-element transform lambda:
    Catalyst's CollapseProject freely inlines the whole synthesis expression
    into downstream filter predicates (e.g. the skew router's
    ``size(spans) > t``), where interpreted eval would recompute the O(words)
    split per element — O(words^2) per document, an effective hang on
    repeat-synthesized giant docs. With this shape every per-element lambda
    is O(1), so even a fully-inlined re-evaluation stays linear.
    """
    k = words_per_span
    norm = F.regexp_replace(
        F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+", " ")
    chunked = F.regexp_replace(
        norm, r"((?:\S+ ){%d}\S+) " % (k - 1), "$1\u0000")
    df = df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.split(chunked, "\u0000").alias("__chunks"))
    doc_id_s = F.col("doc_id")

    def kind_of(i):
        is_media = (i % 13 == 5) & (i > 0)
        geo = F.concat(
            F.lit("page="), (F.floor(i / 10) + 1).cast("string"),
            F.lit(";y="), ((i % 10) * 40 + 80).cast("string"),
            F.lit(";x=50"))
        return (
            F.when(i == 0, F.concat(F.lit("title;"), geo, F.lit(";size=18")))
            .when(is_media, F.concat(
                F.lit("image;"), geo, F.lit(";edpi=250;phash="),
                F.substring(F.md5(F.concat(doc_id_s, F.lit("#"),
                                           i.cast("string"))), 1, 16)))
            .otherwise(F.concat(F.lit("text;"), geo, F.lit(";size=10")))
        )

    spans = F.transform(
        F.col("__chunks"),
        lambda x, i: F.struct(
            kind_of(i).alias("kind"),
            F.when((i % 13 == 5) & (i > 0), F.lit("")).otherwise(x)
            .alias("text"),
            F.lit("").alias("media_ref"),
            F.lit(0).alias("offset"),
        ),
    )
    return df.select(doc_id_s.alias("doc_id"), spans.alias("spans"))


def with_synthetic_giants(df: DataFrame, every: int = 1000,
                          repeat: int = 80) -> DataFrame:
    """Skew injection for benchmarks: every ``every``-th doc also yields a
    giant variant (text repeated ``repeat`` times, one word per span) so the
    salted path is exercised at bench scale."""
    giants = (df.filter(F.col("doc_id") % every == 0)
              .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                      F.repeat(F.concat(F.col("text"), F.lit(" ")),
                               repeat).alias("text")))
    return documents_to_spans(df).unionByName(
        documents_to_spans(giants, words_per_span=1))
