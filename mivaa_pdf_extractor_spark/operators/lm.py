"""Distributed n-gram language-model scoring (CCNet-style quality tier).

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM n-gram model; documents far from the reference distribution are
down-weighted or dropped. This module reproduces that pipeline shape
natively in Spark with a **stupid backoff** trigram model (Brants et al.
2007, "Large Language Models in Machine Translation" — the backoff score
designed for distributed count-based LMs: no discounting state, just
counts and a fixed 0.4 backoff factor, which is exactly what a
shuffle-based engine wants).

Two stages:

- ``ngram_counts``: corpus -> (n, gram, cnt) for n = 1..3. One explode +
  one partial-aggregating groupBy per order; n-gram keys are tiny strings
  so the shuffle carries counts, not documents.
- ``lm_doc_scores``: per document, score every trigram position with
  stupid backoff against the count tables (five equi-joins on gram keys —
  broadcast when the model is small, shuffle-hash at corpus scale; AQE
  picks), then roll up per doc.

Hash-stability design (the DuckDB twin must match bit-for-bit): every
per-position score is a pure function of integer counts (single
divisions, never a float accumulation); the per-doc aggregate sums
**micro-units** — ``round(log10(score) * 1e6)`` cast to bigint — so the
cross-engine sum is an integer sum with no float-associativity hazard.
Perplexity is derived from that integer at the end with one pow/round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Brants et al. 2007 §4 — the fixed stupid-backoff factor.
BACKOFF = 0.4


def _words(col: F.Column) -> F.Column:
    # explicit ASCII whitespace class: RE2 (DuckDB twin) and Java regex
    # disagree on `\s`
    return F.filter(F.split(F.lower(col), r"[ \t\r\n]+"),
                    lambda x: x != "")


def ngram_counts(df: DataFrame, text_col: str = "text",
                 n_max: int = 3) -> DataFrame:
    """(n, gram, cnt) counts for n = 1..n_max over the corpus.

    Scale: explode fans each doc into its grams; the groupBy is a
    map-side-combining aggregation on short string keys. No document text
    survives past the explode — the shuffle carries (gram, partial count).
    """
    # round 6: words are staged as a real column (multi-referenced
    # non-cheap alias — CollapseProject keeps it, so the split+filter
    # runs once per row; the old shape embedded the chain in every
    # element_at reference inside the gram lambdas, re-evaluating the
    # full split per gram position), and the three orders ride ONE
    # concatenated (n, gram) struct array through ONE explode instead
    # of a 3-branch union that re-scanned the corpus per order. Same
    # (n, gram, cnt) rows.
    wdf = df.select(_words(F.col(text_col)).alias("w"))
    w = F.col("w")

    def _joiner(n):
        # one-arg lambda for F.transform (a default arg would be seen as
        # a second lambda parameter by PySpark's lambda factory)
        def make(i):
            return F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(
                    " ", *[F.element_at(w, (i + k + 1).cast("int"))
                           for k in range(n)]).alias("gram"))
        return make

    empty = F.array().cast("array<struct<n:int,gram:string>>")
    per_n = []
    for n in range(1, n_max + 1):
        # guard: Spark sequence(0, k) with k < 0 is DESCENDING, not empty
        per_n.append(F.when(
            F.size(w) >= n,
            F.transform(F.sequence(F.lit(0), F.size(w) - n), _joiner(n))
        ).otherwise(empty))
    return (wdf.select(F.explode(F.concat(*per_n)).alias("g"))
            .select(F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
            .groupBy("n", "gram").agg(F.count("*").alias("cnt")))


def lm_doc_scores(df: DataFrame, counts: DataFrame,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Stupid-backoff trigram scores per document.

    Per trigram position (w1 w2 w3):

    - seen trigram:            S = c(w1 w2 w3) / c(w1 w2)
    - else seen bigram:        S = 0.4 * c(w2 w3) / c(w2)
    - else seen unigram:       S = 0.16 * c(w3) / N
    - else (OOV):              S = 0.16 / N

    Returns per doc: position counts per backoff level, the integer
    micro-unit log-prob sum, and the derived perplexity
    ``ppl = 10 ** (-logprob / n_tri)``. Documents with fewer than three
    tokens carry no trigram signal and are dropped.
    """
    # materialize + filter BEFORE building trigram structs: sequence(0, k)
    # with k < 0 is descending and element_at(w, 0) raises
    wcol = F.col("w")
    tris = F.transform(
        F.sequence(F.lit(0), F.size(wcol) - 3),
        lambda i: F.struct(
            F.element_at(wcol, (i + 1).cast("int")).alias("w1"),
            F.element_at(wcol, (i + 2).cast("int")).alias("w2"),
            F.element_at(wcol, (i + 3).cast("int")).alias("w3")))
    base = (df.select(F.col(id_col), _words(F.col(text_col)).alias("w"))
            .filter(F.size("w") >= 3)
            .select(id_col, F.explode(tris).alias("t"))
            .select(id_col, "t.w1", "t.w2", "t.w3"))

    # five backoff lookups + the token total all slice `counts`: persist
    # it once or every slice recomputes the corpus explode + groupBy
    # (6x the aggregation; measured ~2.3 s -> ~1.4 s steady at sf0.1)
    from mivaa_pdf_extractor_spark.core.cache import track
    counts = track(counts.persist())

    def tbl(n, key_cols, out):
        c = counts.filter(F.col("n") == n).select(
            F.col("gram"), F.col("cnt").alias(out))
        return c, F.concat_ws(" ", *key_cols)

    c3, k3 = tbl(3, [F.col("w1"), F.col("w2"), F.col("w3")], "c3")
    c2ctx, k2ctx = tbl(2, [F.col("w1"), F.col("w2")], "c2ctx")
    c2, k2 = tbl(2, [F.col("w2"), F.col("w3")], "c2")
    c1ctx, k1ctx = tbl(1, [F.col("w2")], "c1ctx")
    c1, k1 = tbl(1, [F.col("w3")], "c1")
    total = counts.filter(F.col("n") == 1).agg(
        F.sum("cnt").alias("n_tokens"))

    j = base
    for tab, key in ((c3, k3), (c2ctx, k2ctx), (c2, k2),
                     (c1ctx, k1ctx), (c1, k1)):
        j = j.join(tab.withColumnRenamed("gram", "__g"),
                   key == F.col("__g"), "left").drop("__g")
    j = j.crossJoin(F.broadcast(total))

    n_tok = F.col("n_tokens").cast("double")
    score = (
        F.when(F.col("c3").isNotNull(),
               F.col("c3") / F.col("c2ctx").cast("double"))
        .when(F.col("c2").isNotNull(),
              F.lit(BACKOFF) * (F.col("c2") / F.col("c1ctx").cast("double")))
        .when(F.col("c1").isNotNull(),
              F.lit(BACKOFF * BACKOFF) * (F.col("c1") / n_tok))
        .otherwise(F.lit(BACKOFF * BACKOFF) / n_tok))
    level = (
        F.when(F.col("c3").isNotNull(), F.lit("tri"))
        .when(F.col("c2").isNotNull(), F.lit("bi"))
        .when(F.col("c1").isNotNull(), F.lit("uni"))
        .otherwise(F.lit("oov")))
    micro = F.round(F.log10(score) * F.lit(1e6), 0).cast("bigint")

    scored = j.select(id_col, level.alias("level"), micro.alias("micro"))
    return (scored.groupBy(id_col)
            .agg(F.count("*").alias("n_tri"),
                 F.sum(F.when(F.col("level") == "tri", 1).otherwise(0))
                  .alias("n_tri_hits"),
                 F.sum(F.when(F.col("level") == "bi", 1).otherwise(0))
                  .alias("n_bi_backoff"),
                 F.sum(F.when(F.col("level") == "uni", 1).otherwise(0))
                  .alias("n_uni_backoff"),
                 F.sum(F.when(F.col("level") == "oov", 1).otherwise(0))
                  .alias("n_oov"),
                 F.sum("micro").alias("logprob_micro"))
            .withColumn(
                "ppl",
                F.round(F.pow(F.lit(10.0),
                              -F.col("logprob_micro")
                              / F.lit(1e6) / F.col("n_tri")), 4)))
