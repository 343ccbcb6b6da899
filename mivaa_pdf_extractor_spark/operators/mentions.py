"""Mention-opportunity generation — the reference's press-coverage
analysis service re-expressed as whole-corpus batch plans
(app/services/integrations/mention_opportunity_service.py):

- ``trending_bigrams``     — ``_trending_topics`` (:359-413): bigram
  counts over normalized title+excerpt with stopword/digit/short-token
  filtering and the subject-token blocklist; a bigram needs >= 2
  occurrences to be a trend; priority ``min(1, count/10)``.
- ``outlet_pitches``       — ``_outlet_pitches`` (:415-464): mentions per
  outlet domain; warm contacts (>= 3) score ``min(1, 0.5 + count/10)``,
  cold ones ``0.3 + count*0.1``.
- ``author_relationships`` — ``_author_relationships`` (:466-508):
  recurring non-generic bylines (>= 2), priority
  ``min(1, 0.4 + count/6)``.
- ``sentiment_responses``  — ``_sentiment_responses`` (:510-541):
  negative-sentiment mentions with relevance exact/tangential/NULL,
  fixed priority 0.85.
- ``opportunity_feed``     — ``generate`` (:290): the union, ranked per
  subject by priority desc.

The reference loads <= 500 recent rows per tracked subject over a REST
window and folds Counters in Python; each operator here is one corpus
plan grouped by (subject, key), so every subject's feed computes in a
single pass. All priorities are 1-2 IEEE ops on an integer count
(division/multiply-add — deterministic bit-for-bit across engines; no
float ever crosses an aggregation).

Documented deviations, each pinned in tests:
- ``normalize_text``'s Greek→Latin + accent-strip tier
  (mention_identity_service.py:75-79) is scoped to the ASCII corpus: the
  batch normalize is lower + whitespace-collapse (the same scoping the
  facet canonicalizer documented for its NFKC tier).
- ``most_common()`` tie order is arbitrary in Python; rankings here
  tie-break on the phrase/domain/author key ascending (total order).
- outlet/author display metadata comes from the most recent mention
  (published_at desc, id desc) — the reference's ``setdefault`` keeps
  the first row of a published_at-desc REST page (:344-349), i.e. the
  same row, but only because of result order.
- the REST page cap (limit 500/subject) is dropped; the ``days`` window
  is measured back from the corpus max ``published_at`` (the reference
  uses wall clock, :338).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# mention_opportunity_service.py:63-72 — verbatim data constant (the
# golden behavior requires the exact set)
STOPWORDS = [
    "the", "a", "an", "and", "or", "but", "for", "to", "of", "in", "on",
    "by", "at", "as", "with", "from", "is", "are", "be", "this", "that",
    "these", "those", "it", "its", "if", "than", "then", "so", "not",
    "no", "we", "they", "their", "our", "your", "his", "her", "you",
    "us", "them", "into", "out", "up", "down", "over", "under", "via",
    "new", "best", "top", "all", "more",
]

GENERIC_AUTHORS = ["staff", "editor", "admin", "unknown"]  # :483


def normalize_text(col: Column) -> Column:
    """ASCII scope of mention_identity_service.normalize_text:
    lowercase + whitespace collapse + trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def _content_tokens(title: Column, excerpt: Column) -> Column:
    """Filtered token array of title+excerpt (:374-379): normalized
    words, minus stopwords, pure numerals, and tokens shorter than 3."""
    text = normalize_text(F.concat_ws(" ", title, excerpt))
    toks = F.split(text, " ")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.filter(
        toks,
        lambda w: (w != "") & ~F.array_contains(stop, w)
        & ~w.rlike("^[0-9]+$") & (F.length(w) >= 3))


def trending_bigrams(mentions: DataFrame, subjects: DataFrame,
                     limit: int = 5) -> DataFrame:
    """Per-subject trending bigrams (:359-413). ``subjects`` carries
    (subject_id, subject_label); the label's normalized tokens form the
    blocklist — a bigram with BOTH tokens in it never counts (:380-382).
    Counts are occurrences (a phrase twice in one title counts twice,
    matching the reference's Counter), the >= 2 floor and the
    ``min(1, count/10)`` priority are the reference's, and the top-
    ``limit`` cut orders by (count desc, phrase asc)."""
    subj = subjects.select(
        "subject_id",
        F.split(normalize_text(F.col("subject_label")), " ")
        .alias("subject_tokens"))
    toks = mentions.select(
        "subject_id",
        _content_tokens(F.col("title"), F.col("excerpt")).alias("toks"))
    pairs = (toks.filter(F.size("toks") >= 2)
             .select("subject_id", F.explode(F.expr(
                 "transform(sequence(1, size(toks) - 1), "
                 "i -> struct(element_at(toks, i) AS a, "
                 "element_at(toks, CAST(i + 1 AS INT)) AS b))"))
                 .alias("p"))
             .select("subject_id", F.col("p.a").alias("a"),
                     F.col("p.b").alias("b")))
    pairs = (pairs.join(subj, "subject_id")
             .filter(~(F.array_contains(F.col("subject_tokens"), F.col("a"))
                       & F.array_contains(F.col("subject_tokens"),
                                          F.col("b"))))
             .drop("subject_tokens"))
    counts = (pairs.groupBy("subject_id", "a", "b")
              .agg(F.count(F.lit(1)).alias("mention_count"))
              .filter(F.col("mention_count") >= 2))
    w = Window.partitionBy("subject_id").orderBy(
        F.col("mention_count").desc(), F.col("a").asc(), F.col("b").asc())
    return (counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= int(limit))
            .select("subject_id", "rank",
                    F.concat_ws(" ", "a", "b").alias("phrase"),
                    "mention_count",
                    F.least(F.lit(1.0),
                            F.col("mention_count") / 10.0)
                    .alias("priority_score")))


def _latest_meta(mentions: DataFrame, key_col: Column, keep_cols: list,
                 key_name: str) -> DataFrame:
    """Most-recent mention's metadata per (subject, key) — the
    deterministic twin of the reference's first-row-of-a-desc-page
    ``setdefault`` (:344-349, :424-429)."""
    w = Window.partitionBy("subject_id", key_name).orderBy(
        F.col("published_at").desc(), F.col("mention_id").desc())
    return (mentions.withColumn(key_name, key_col)
            .filter(F.col(key_name).isNotNull() & (F.col(key_name) != ""))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("subject_id", key_name, *keep_cols))


def outlet_pitches(mentions: DataFrame, limit: int = 5) -> DataFrame:
    """Per-subject outlet pitch targets (:415-464): mention counts per
    non-empty lowercased outlet domain; priority
    ``min(1, 0.5 + count/10)`` for warm (>= 3) outlets, else
    ``0.3 + count*0.1``; top-``limit`` by (count desc, domain asc)."""
    dom = F.lower(F.col("outlet_domain"))
    base = (mentions.withColumn("domain", dom)
            .filter(F.col("domain").isNotNull() & (F.col("domain") != "")))
    counts = (base.groupBy("subject_id", "domain")
              .agg(F.count(F.lit(1)).alias("mention_count")))
    meta = _latest_meta(mentions, dom, ["outlet_name", "outlet_type"],
                        "domain")
    w = Window.partitionBy("subject_id").orderBy(
        F.col("mention_count").desc(), F.col("domain").asc())
    warm = F.col("mention_count") >= 3
    return (counts.join(meta, ["subject_id", "domain"])
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= int(limit))
            .select("subject_id", "rank", "domain",
                    F.coalesce(F.col("outlet_name"), F.col("domain"))
                    .alias("outlet_name"),
                    "outlet_type", "mention_count", warm.alias("warm"),
                    F.when(warm, F.least(
                        F.lit(1.0),
                        0.5 + F.col("mention_count") / 10.0))
                    .otherwise(0.3 + F.col("mention_count") * 0.1)
                    .alias("priority_score")))


def author_relationships(mentions: DataFrame,
                         limit: int = 5) -> DataFrame:
    """Per-subject recurring bylines (:466-508): trimmed non-empty
    authors whose lowercase isn't a generic byline, >= 2 mentions;
    priority ``min(1, 0.4 + count/6)``; top-``limit`` by
    (count desc, author asc)."""
    author = F.trim(F.col("author"))
    key = F.lower(author)
    base = (mentions.withColumn("author_key", key)
            .filter(author.isNotNull() & (author != "")
                    & ~key.isin(*GENERIC_AUTHORS)))
    counts = (base.groupBy("subject_id", "author_key")
              .agg(F.count(F.lit(1)).alias("mention_count"))
              .filter(F.col("mention_count") >= 2))
    meta = _latest_meta(
        base, F.col("author_key"),
        [F.trim(F.col("author")).alias("display_name"), "outlet_domain"],
        "author_key")
    w = Window.partitionBy("subject_id").orderBy(
        F.col("mention_count").desc(), F.col("author_key").asc())
    return (counts.join(meta, ["subject_id", "author_key"])
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= int(limit))
            .select("subject_id", "rank", "author_key", "display_name",
                    "outlet_domain", "mention_count",
                    F.least(F.lit(1.0),
                            0.4 + F.col("mention_count") / 6.0)
                    .alias("priority_score")))


def sentiment_responses(mentions: DataFrame,
                        limit: int = 5) -> DataFrame:
    """Per-subject reputation-management queue (:510-541): negative-
    sentiment mentions with relevance exact/tangential/NULL, fixed
    priority 0.85, first ``limit`` per subject in published_at-desc
    order (the reference slices the desc-ordered page, :515-517)."""
    negs = mentions.filter(
        (F.col("sentiment") == "negative")
        & (F.col("relevance").isNull()
           | F.col("relevance").isin("exact", "tangential")))
    w = Window.partitionBy("subject_id").orderBy(
        F.col("published_at").desc(), F.col("mention_id").desc())
    return (negs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= int(limit))
            .select("subject_id", "rank", "mention_id",
                    F.coalesce(F.col("title"), F.lit("Negative mention"))
                    .alias("title"),
                    "outlet_domain", "url",
                    F.lit(0.85).alias("priority_score")))


def opportunity_feed(mentions: DataFrame, subjects: DataFrame,
                     limit_per_type: int = 5) -> DataFrame:
    """The assembled per-subject feed (``generate``, :290): union of the
    four generators ranked by priority desc (ties: type asc, then the
    per-type rank). Returns (subject_id, feed_rank, type, title,
    priority_score)."""
    # round 6: four generators each re-derive the mention stream —
    # persist it once (release via release_cached()/cache_scope())
    from mivaa_pdf_extractor_spark.core.cache import track
    mentions = track(mentions.persist())
    t = trending_bigrams(mentions, subjects, limit_per_type).select(
        "subject_id", F.lit("trending_topic").alias("type"),
        F.col("phrase").alias("title"), "priority_score", "rank")
    o = outlet_pitches(mentions, limit_per_type).select(
        "subject_id", F.lit("outlet_pitch").alias("type"),
        F.col("outlet_name").alias("title"), "priority_score", "rank")
    a = author_relationships(mentions, limit_per_type).select(
        "subject_id", F.lit("author_relationship").alias("type"),
        F.col("display_name").alias("title"), "priority_score", "rank")
    s = sentiment_responses(mentions, limit_per_type).select(
        "subject_id", F.lit("sentiment_response").alias("type"),
        "title", "priority_score", "rank")
    allofthem = t.unionByName(o).unionByName(a).unionByName(s)
    w = Window.partitionBy("subject_id").orderBy(
        F.col("priority_score").desc(), F.col("type").asc(),
        F.col("rank").asc())
    return (allofthem.withColumn("feed_rank", F.row_number().over(w))
            .select("subject_id", "feed_rank", "type", "title",
                    "priority_score"))


# ---------------------------------------------------------------------------
# Mention-monitoring access gates (app/api/mention_monitoring_routes.py:79-146)
# ---------------------------------------------------------------------------

def mention_access_gates(reqs: DataFrame) -> DataFrame:
    """Pins:

    - `_is_admin` (:79-96): role name must be in ('admin',
      'super_admin'); a missing role_id, an unknown role row, or ANY
      exception all fold to False — fails CLOSED;
    - `_module_enabled` (:118-131): fails OPEN — a MISSING modules
      row and a read error both return True, but a PRESENT row with
      enabled=NULL returns bool(None)=False (present-NULL disables
      while absent enables — pin); the reference documents why
      (defense-in-depth behind the edge cron's fail-closed gate);
    - `_check_owner_or_admin` (:134-146): 404 before 403; owner
      compare is str()-normalized; a non-owner admin passes.
    """
    from pyspark.sql import functions as F
    is_admin = (~F.col("role_read_raises")
                & F.col("role_id").isNotNull()
                & (F.col("role_id") != "")
                & F.col("role_name").isin("admin", "super_admin"))
    module_on = (F.when(F.col("module_read_raises"), F.lit(True))
                 .when(~F.col("module_row_exists"), F.lit(True))
                 .otherwise(F.coalesce(F.col("module_enabled"),
                                       F.lit(False))))
    owner_gate = (
        F.when(~F.col("mention_row_exists"),
               F.struct(F.lit(404).alias("status"),
                        F.lit("tracked_mention not found")
                        .alias("detail")))
        .when((F.col("row_user_id") != F.col("caller_user_id"))
              & ~is_admin,
              F.struct(F.lit(403).alias("status"),
                       F.lit("not the owner").alias("detail")))
        .otherwise(F.struct(F.lit(200).alias("status"),
                            F.lit(None).cast("string")
                            .alias("detail"))))
    return reqs.select(
        "req_id", is_admin.alias("is_admin"),
        module_on.alias("module_enabled_out"),
        owner_gate.getField("status").alias("owner_status"),
        owner_gate.getField("detail").alias("owner_detail"))


def synth_access_reqs(events: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        (e % 13 == 0).alias("role_read_raises"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("r"), (e % 9).cast("string")))
        .alias("role_id"),
        F.when(e % 4 == 0, "admin").when(e % 4 == 1, "super_admin")
        .when(e % 4 == 2, "member").otherwise("viewer")
        .alias("role_name"),
        (e % 11 == 0).alias("module_read_raises"),
        (e % 3 != 0).alias("module_row_exists"),
        F.when(e % 7 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 2 == 0).alias("module_enabled"),
        (e % 9 != 0).alias("mention_row_exists"),
        F.concat(F.lit("u"), (e % 6).cast("string"))
        .alias("row_user_id"),
        F.concat(F.lit("u"), (e % 4).cast("string"))
        .alias("caller_user_id"))


SYNTH_ACCESS_REQ_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           event_id % 13 = 0 AS role_read_raises,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'r' || CAST(event_id % 9 AS VARCHAR) END
               AS role_id,
           CASE event_id % 4 WHEN 0 THEN 'admin'
                WHEN 1 THEN 'super_admin' WHEN 2 THEN 'member'
                ELSE 'viewer' END AS role_name,
           event_id % 11 = 0 AS module_read_raises,
           event_id % 3 <> 0 AS module_row_exists,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE event_id % 2 = 0 END AS module_enabled,
           event_id % 9 <> 0 AS mention_row_exists,
           'u' || CAST(event_id % 6 AS VARCHAR) AS row_user_id,
           'u' || CAST(event_id % 4 AS VARCHAR) AS caller_user_id
    FROM events
"""


def mention_access_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_ACCESS_REQ_SQL}),
        g AS (
          SELECT *,
                 NOT role_read_raises AND role_id IS NOT NULL
                     AND role_id <> ''
                     AND role_name IN ('admin', 'super_admin')
                     AS is_admin,
                 CASE WHEN module_read_raises THEN TRUE
                      WHEN NOT module_row_exists THEN TRUE
                      ELSE coalesce(module_enabled, FALSE) END
                     AS module_enabled_out
          FROM r)
        SELECT req_id, is_admin, module_enabled_out,
               CAST(CASE WHEN NOT mention_row_exists THEN 404
                    WHEN row_user_id <> caller_user_id
                         AND NOT is_admin THEN 403
                    ELSE 200 END AS INT) AS owner_status,
               CASE WHEN NOT mention_row_exists
                      THEN 'tracked_mention not found'
                    WHEN row_user_id <> caller_user_id
                         AND NOT is_admin THEN 'not the owner'
               END AS owner_detail
        FROM g
    """
