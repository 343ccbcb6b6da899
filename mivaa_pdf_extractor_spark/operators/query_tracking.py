"""Search-query tracking — term extraction + unmatched-term rollup.

Re-expresses the deterministic halves of the reference's search query
tracker (reference ``app/services/search/search_query_tracker.py``):

- ``_extract_search_terms`` (:188-214): metadata values lowered
  (strings directly, list values str()-lowered), plus query words
  (lower().split()) that are not in the 16-entry stopword set and
  are LONGER than 2 chars — then a Python set (the contract renders
  it sorted).  Note the metadata values bypass the stopword/length
  filters entirely (pinned).
- ``_track_unmatched_term`` manual-upsert fallback (:145-187),
  batch end-state: per (term, property_key) the frequency count and
  the deduplicated workspace set (rendered sorted).
- ``track_query`` row assembly (:30-140): zero_results =
  result_count == 0; total_ms falls back to response_time_ms when
  the stage timing is missing (``or`` semantics — a 0 total also
  falls back, pinned); validation_attempted mirrors whether any
  metadata key had a prototype.

Scale: term extraction is map-only (explode + set-agg per query);
the rollup is one map-side-combinable groupBy carrying (term, key,
workspace) triples only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ["the", "a", "an", "and", "or", "but", "in", "on", "at",
             "to", "for", "with", "show", "find", "search"]


def extract_search_terms(queries: DataFrame) -> DataFrame:
    """queries: (qid, query_text, meta map<string,string>,
    meta_list map<string,array<string>>).  Emits the deduplicated
    term set (sorted csv) plus the tracking-row flags."""
    mvals = F.transform(
        F.map_values(F.coalesce(
            "meta", F.create_map().cast("map<string,string>"))),
        F.lower)
    lvals = F.flatten(F.transform(
        F.map_values(F.coalesce(
            "meta_list",
            F.create_map().cast("map<string,array<string>>"))),
        lambda arr: F.transform(arr, F.lower)))
    words = F.filter(
        F.split(F.lower(F.coalesce("query_text", F.lit(""))), " "),
        lambda w: (w != "") & ~w.isin(*STOPWORDS) & (F.length(w) > 2))
    terms = F.array_sort(F.array_distinct(
        F.concat(mvals, lvals, words)))
    total = F.when(
        F.coalesce("total_ms", F.lit(0)) != 0, F.col("total_ms")
    ).otherwise(F.col("response_time_ms"))
    return queries.select(
        "qid",
        F.array_join(terms, ",").alias("searched_terms_csv"),
        (F.coalesce("result_count", F.lit(0)) == 0).cast("string")
        .alias("zero_results"),
        total.alias("total_ms_out"))


def extract_terms_sql() -> str:
    """DuckDB twin over a CTE queries_in."""
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
    t AS (SELECT qid,
        list_transform(map_values(coalesce(meta, MAP([], [])
            ::MAP(VARCHAR, VARCHAR))), v -> lower(v)) AS mvals,
        flatten(list_transform(map_values(coalesce(meta_list,
            MAP([], [])::MAP(VARCHAR, VARCHAR[]))),
            arr -> list_transform(arr, v -> lower(v)))) AS lvals,
        list_filter(string_split(lower(coalesce(query_text, '')), ' '),
            w -> w <> '' AND w NOT IN ({sw}) AND length(w) > 2)
            AS words,
        result_count, total_ms, response_time_ms
        FROM queries_in)
    SELECT qid,
           coalesce(array_to_string(list_sort(list_distinct(
               mvals || lvals || words)), ','), '')
               AS searched_terms_csv,
           CAST(coalesce(result_count, 0) = 0 AS VARCHAR)
               AS zero_results,
           CASE WHEN coalesce(total_ms, 0) <> 0 THEN total_ms
                ELSE response_time_ms END AS total_ms_out
    FROM t"""


def unmatched_term_freq(events: DataFrame) -> DataFrame:
    """events: (term, property_key, workspace_id).  Batch end-state
    of the manual upsert: count + sorted distinct workspaces."""
    return (events.groupBy("term", "property_key")
            .agg(F.count("*").alias("frequency_count"),
                 F.array_join(F.array_sort(F.collect_set(
                     "workspace_id")), ",").alias("workspaces_csv")))


def unmatched_freq_sql() -> str:
    return """
    SELECT term, property_key, count(*) AS frequency_count,
           array_to_string(list_sort(list(DISTINCT workspace_id)),
                           ',') AS workspaces_csv
    FROM events_in GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# synthesized inputs


def synth_track_queries(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    text = (F.when(e % 5 == 0,
                   "Show me the shiny tiles for a bathroom")
            .when(e % 5 == 1, "find AN oak veneer to go WITH it")
            .when(e % 5 == 2, "at on in or but")
            .when(e % 5 == 3, F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("matte slab batch "),
                                (e % 9).cast("string"))))
    meta = (F.when(e % 4 == 0, F.expr(
        "map('finish', 'Shiny', 'color', 'OFF WHITE')"))
        .when(e % 4 == 1, F.expr("map('size', 'XL')")))
    mlist = F.when(e % 6 == 0, F.expr(
        "map('tags', array('Glam', 'the'))"))
    return events.select(
        e.alias("qid"), text.alias("query_text"), meta.alias("meta"),
        mlist.alias("meta_list"),
        (e % 7).cast("int").alias("result_count"),
        F.when(e % 3 == 0, F.lit(0)).otherwise((e % 50 + 10))
        .cast("int").alias("total_ms"),
        (e % 40 + 5).cast("int").alias("response_time_ms"))


SYNTH_TRACK_QUERIES_SQL = """
SELECT event_id AS qid,
       CASE WHEN event_id % 5 = 0
                THEN 'Show me the shiny tiles for a bathroom'
            WHEN event_id % 5 = 1
                THEN 'find AN oak veneer to go WITH it'
            WHEN event_id % 5 = 2 THEN 'at on in or but'
            WHEN event_id % 5 = 3 THEN NULL
            ELSE 'matte slab batch ' || (event_id % 9) END
           AS query_text,
       CASE WHEN event_id % 4 = 0
                THEN map(['finish', 'color'], ['Shiny', 'OFF WHITE'])
            WHEN event_id % 4 = 1 THEN map(['size'], ['XL'])
       END AS meta,
       CASE WHEN event_id % 6 = 0
            THEN map(['tags'], [['Glam', 'the']]) END AS meta_list,
       CAST(event_id % 7 AS INT) AS result_count,
       CAST(CASE WHEN event_id % 3 = 0 THEN 0
                 ELSE event_id % 50 + 10 END AS INT) AS total_ms,
       CAST(event_id % 40 + 5 AS INT) AS response_time_ms
FROM events"""


def synth_unmatched_events(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        F.concat(F.lit("term"), (e % 15).cast("string")).alias("term"),
        F.concat(F.lit("prop"), (e % 4).cast("string"))
        .alias("property_key"),
        F.concat(F.lit("ws"), (e % 6).cast("string"))
        .alias("workspace_id"))


SYNTH_UNMATCHED_SQL = """
SELECT 'term' || (event_id % 15) AS term,
       'prop' || (event_id % 4) AS property_key,
       'ws' || (event_id % 6) AS workspace_id
FROM events"""
