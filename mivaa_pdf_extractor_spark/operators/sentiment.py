"""Heuristic sentiment fallback: the deterministic tier of the
reference's sentiment service.

Re-expresses ``_get_fallback_sentiment``
(app/services/integrations/sentiment_analysis_service.py:128-179) — the
path every feedback row takes when the LLM tier is unavailable (the LLM
tier itself is out of scope: network/nondeterministic):

- rating present → ladder: ≥ 4 positive 0.7, ≤ 2 negative 0.7 (rating
  0 lands here — it is "present"), else neutral 0.6;
- rating NULL → substring counts over the fixed 8-word positive /
  negative vocabularies on the lowercased text (SUBSTRING containment,
  not word-boundary — 'goods' counts for 'good'; pinned); winner's
  confidence = min(0.5 + count·0.1, 0.8), tie → neutral 0.5;
- key_phrases: split on [.!?]+ runs, strip, keep len > 10, first 3 in
  text order;
- recommendation_score = rating · 2 **if rating is truthy** else 5.0 —
  a present rating of 0 yields 5.0, not 0.0 (the reference's ``if
  rating`` falsy-zero quirk, pinned).

Aspects are the constant 0.5 five-vector (not emitted — carried by the
contract as a literal). Confidence arithmetic is the same IEEE double
expression on both engines (0.5 + n·0.1 — no cross-engine rounding in
play since both evaluate the identical op sequence).

Scale notes: pure map-side projection (regex split + 16 contains + a
filtered slice) inside whole-stage codegen; no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

POSITIVE_WORDS = ("good", "great", "excellent", "love", "beautiful",
                  "perfect", "amazing", "wonderful")   # :144
NEGATIVE_WORDS = ("bad", "poor", "terrible", "hate", "ugly", "awful",
                  "disappointing", "worst")            # :145


def fallback_sentiment(feedback: DataFrame) -> DataFrame:
    """(feedback_id, feedback_text, rating) → (feedback_id, sentiment,
    confidence, key_phrases, recommendation_score, model_used)."""
    rating = F.col("rating").cast("int")
    lower = F.lower(F.col("feedback_text"))

    def hits(words) -> F.Column:
        cnt = F.lit(0)
        for w in words:
            cnt = cnt + F.when(lower.contains(w), 1).otherwise(0)
        return cnt

    pos, neg = hits(POSITIVE_WORDS), hits(NEGATIVE_WORDS)

    kw_sent = (F.when(pos > neg, "positive")
                .when(neg > pos, "negative").otherwise("neutral"))
    kw_conf = (F.when(pos > neg, F.least(F.lit(0.5) + pos * 0.1,
                                         F.lit(0.8)))
                .when(neg > pos, F.least(F.lit(0.5) + neg * 0.1,
                                         F.lit(0.8)))
                .otherwise(F.lit(0.5)))

    sentiment = (F.when(rating.isNotNull(),
                        F.when(rating >= 4, "positive")
                         .when(rating <= 2, "negative")
                         .otherwise("neutral"))
                  .otherwise(kw_sent))
    confidence = (F.when(rating.isNotNull(),
                         F.when(rating >= 4, 0.7).when(rating <= 2, 0.7)
                          .otherwise(0.6))
                   .otherwise(kw_conf))

    sents = F.transform(F.split(F.col("feedback_text"), r"[.!?]+"),
                        lambda s: F.trim(s))
    phrases = F.slice(F.filter(sents, lambda s: F.length(s) > 10), 1, 3)

    rec = (F.when(rating.isNotNull() & (rating != 0),
                  rating.cast("double") * 2).otherwise(F.lit(5.0)))

    return feedback.select(
        F.col("feedback_id"),
        sentiment.alias("sentiment"),
        confidence.cast("double").alias("confidence"),
        F.array_join(phrases, "|").alias("key_phrases"),
        rec.alias("recommendation_score"),
        F.lit("fallback-heuristic").alias("model_used"),
    )


def synth_feedback(events: DataFrame) -> DataFrame:
    """Deterministic feedback rows from ``events``: texts mix the two
    vocabularies (including a substring-containment case and a tie), a
    short filtered sentence, a > 3-phrase tail, and the rating regimes
    NULL / 0 / 2 / 3 / 5. DuckDB twin: SYNTH_FEEDBACK_SQL."""
    e = F.col("event_id")
    body = (F.when(e % 4 == 0,
                   "The goods look good and the finish is great")
             .when(e % 4 == 1, "Bad surface, poor quality and ugly tone")
             .when(e % 4 == 2, "Looks good overall but poor packaging")
             .otherwise("A plain unremarkable sample piece"))
    tail = (F.when(e % 3 == 0, ". Love the look of this material!")
             .when(e % 3 == 1, ". Meh.")
             .otherwise(" with no punctuation tail"))
    extra = F.when(
        e % 7 == 0,
        ". The delivery window was acceptable. Installation needed two "
        "people. Final verdict is still pending") .otherwise("")
    return events.select(
        e.alias("feedback_id"),
        F.concat(body, tail, extra).alias("feedback_text"),
        (F.when(e % 5 == 0, None).when(e % 5 == 1, 0)
          .when(e % 5 == 2, 5).when(e % 5 == 3, 2).otherwise(3))
        .cast("int").alias("rating"),
    )


SYNTH_FEEDBACK_SQL = """
    SELECT event_id AS feedback_id,
           (CASE WHEN event_id % 4 = 0 THEN 'The goods look good and the finish is great'
                 WHEN event_id % 4 = 1 THEN 'Bad surface, poor quality and ugly tone'
                 WHEN event_id % 4 = 2 THEN 'Looks good overall but poor packaging'
                 ELSE 'A plain unremarkable sample piece' END)
           || (CASE WHEN event_id % 3 = 0 THEN '. Love the look of this material!'
                    WHEN event_id % 3 = 1 THEN '. Meh.'
                    ELSE ' with no punctuation tail' END)
           || (CASE WHEN event_id % 7 = 0 THEN '. The delivery window was acceptable. Installation needed two people. Final verdict is still pending'
                    ELSE '' END) AS feedback_text,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN 0
                WHEN event_id % 5 = 2 THEN 5
                WHEN event_id % 5 = 3 THEN 2
                ELSE 3 END AS rating
    FROM events
"""


def duck_sentiment_sql(src: str) -> str:
    """DuckDB oracle for fallback_sentiment over ``src``."""
    pos_hits = " + ".join(
        f"(CASE WHEN CONTAINS(LOWER(feedback_text), '{w}') THEN 1 ELSE 0 END)"
        for w in POSITIVE_WORDS)
    neg_hits = " + ".join(
        f"(CASE WHEN CONTAINS(LOWER(feedback_text), '{w}') THEN 1 ELSE 0 END)"
        for w in NEGATIVE_WORDS)
    return f"""
    counted AS (
        SELECT feedback_id, feedback_text, rating,
               {pos_hits} AS pos, {neg_hits} AS neg
        FROM {src}
    )
    SELECT feedback_id,
           CASE WHEN rating IS NOT NULL THEN
                  CASE WHEN rating >= 4 THEN 'positive'
                       WHEN rating <= 2 THEN 'negative'
                       ELSE 'neutral' END
                WHEN pos > neg THEN 'positive'
                WHEN neg > pos THEN 'negative'
                ELSE 'neutral' END AS sentiment,
           CASE WHEN rating IS NOT NULL THEN
                  CASE WHEN rating >= 4 THEN CAST(0.7 AS DOUBLE)
                       WHEN rating <= 2 THEN CAST(0.7 AS DOUBLE)
                       ELSE CAST(0.6 AS DOUBLE) END
                WHEN pos > neg THEN
                  LEAST(CAST(0.5 AS DOUBLE) + pos * CAST(0.1 AS DOUBLE),
                        CAST(0.8 AS DOUBLE))
                WHEN neg > pos THEN
                  LEAST(CAST(0.5 AS DOUBLE) + neg * CAST(0.1 AS DOUBLE),
                        CAST(0.8 AS DOUBLE))
                ELSE CAST(0.5 AS DOUBLE) END AS confidence,
           ARRAY_TO_STRING(
             LIST_FILTER(LIST_TRANSFORM(
                 REGEXP_SPLIT_TO_ARRAY(feedback_text, '[.!?]+'),
                 s -> TRIM(s)),
               s -> LENGTH(s) > 10)[1:3], '|') AS key_phrases,
           CASE WHEN rating IS NOT NULL AND rating <> 0
                THEN CAST(rating AS DOUBLE) * 2
                ELSE CAST(5.0 AS DOUBLE) END AS recommendation_score,
           'fallback-heuristic' AS model_used
    FROM counted
"""
