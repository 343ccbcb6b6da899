"""Linear text-classifier inference and TF-IDF term extraction — the
broadcast-model scoring patterns of web-corpus curation (the
CCNet/GPT-3-style "quality classifier" pass: score every document against
a fixed linear model, keep/bucket by score).

The container has no training libraries, so the model weights here are an
IDF-derived stand-in computed from the corpus itself (documented, not
hidden): ``weight(token) = 1000 - (df(token) * 1000) DIV N`` — integer
micro-units, so rare (informative) tokens weigh ~1000 and ubiquitous
(stop-word-ish) tokens ~0. What the operators pin is the INFERENCE PLAN,
which is the part that matters at 100 TB: tokenize → explode → equi-join
the weight vector (a model dimension — AQE broadcasts it; a 10M-term
vocabulary shuffles on the token key) → map-side partial integer sums →
one per-doc aggregate. All arithmetic is integer (sums of micro-units,
``DIV`` divisions), so the DuckDB twins hash-match exactly — no float
crosses an aggregation.

Tokenization is lowercase ASCII-alpha runs (``[^a-z]+`` split) — the same
class-pinned-explicitly rule the dedup shinglers use (RE2 and Java agree;
see the ``\\s``-vs-``\\x0B`` gotcha in operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _tokens(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), "[^a-z]+"),
                    lambda t: t != "")


def train_df_weights(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Corpus vocabulary with integer IDF-like weights:
    ``(token, df, weight_micro)`` where ``weight_micro =
    1000 - (df * 1000) DIV n_docs``. One shuffle on the token key after a
    per-doc distinct (map-side combinable); the corpus size rides in as a
    1-row broadcast."""
    tok = (docs.select(F.col(id_col).alias("id"),
                       F.explode(_tokens(text_col)).alias("token"))
           .distinct())
    df_counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.select(F.countDistinct(id_col).alias("n_docs"))
    return (df_counts.crossJoin(F.broadcast(n))
            .select("token", "df",
                    (F.lit(1000)
                     - F.expr("(df * 1000) DIV n_docs"))
                    .alias("weight_micro")))


def classify_quality(docs: DataFrame, weights: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     keep_threshold_micro: int = 700) -> DataFrame:
    """Score every document against the linear model and bucket it:
    ``(doc_id, n_tokens, score_micro, keep)`` where ``score_micro`` is
    the average token weight in micro-units (integer sum DIV count —
    order-independent) and ``keep`` marks docs at or above the
    threshold. Out-of-vocabulary tokens score 0 (the hash-trick
    equivalent of an absent bucket) but still count in the denominator.

    Plan shape: explode → left equi-join on token (broadcast when the
    model fits, shuffle otherwise — AQE decides) → partial sums per doc.
    Token strings cross one shuffle at most; scores are 16 bytes/doc."""
    # explode_outer keeps zero-token docs as one null-token row, so the
    # whole pass is scan -> explode -> join -> aggregate with no
    # anti-join branch for empties (count(token) skips the null)
    tok = docs.select(F.col(id_col).alias("id"),
                      F.explode_outer(_tokens(text_col)).alias("token"))
    scored = (tok.join(weights.select("token", "weight_micro"), "token",
                       "left")
              .groupBy("id")
              .agg(F.count(F.col("token")).alias("n_tokens"),
                   F.sum(F.coalesce(F.col("weight_micro"), F.lit(0)))
                   .alias("w_sum")))
    return (scored
            .select(F.col("id").alias(id_col), "n_tokens",
                    F.when(F.col("n_tokens") > 0,
                           F.expr("w_sum DIV n_tokens"))
                    .otherwise(F.lit(0)).alias("score_micro"))
            .withColumn("keep",
                        F.col("score_micro") >= keep_threshold_micro))


def tfidf_top_terms(docs: DataFrame, weights: DataFrame, k: int = 5,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` characteristic terms per document by integer TF·IDF:
    ``score_micro = tf * weight_micro`` (ties → lexicographically
    smallest token, so the cut is total-ordered and cross-engine
    deterministic). Returns ``(doc_id, rank, token, tf, score_micro)``.

    Plan shape: one (doc, token) count aggregate, the model equi-join,
    then a per-doc top-k window — the standard "characteristic keywords
    for corpus labeling" pass; nothing wider than (id, token, two ints)
    ever shuffles."""
    tf = (docs.select(F.col(id_col).alias("id"),
                      F.explode(_tokens(text_col)).alias("token"))
          .groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf")))
    scored = (tf.join(weights.select("token", "weight_micro"), "token")
              .withColumn("score_micro",
                          F.col("tf") * F.col("weight_micro")))
    w = Window.partitionBy("id").orderBy(
        F.col("score_micro").desc(), F.col("token").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= int(k))
            .select(F.col("id").alias(id_col), "rank", "token", "tf",
                    "score_micro"))
