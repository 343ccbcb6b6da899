"""Trending-searches route fold.

Re-expresses ``app/api/suggestions.py:97-183``
(``get_trending_searches``; the autocomplete funnel itself is covered
by `search_autocomplete`). Pinned behaviors:

- the time-window ladder maps hourly/daily/weekly/monthly to
  1/24/168/720 hours with an UNKNOWN window silently falling to daily;
- the category "filter" is VACUOUS: every row is constructed with
  ``category=<the request's filter value>`` and then compared against
  that same value — it never drops a row, it only labels them (pin);
- ``min_search_count`` filters AFTER the RPC's limit, so low-count
  rows consume limit slots (the limit-then-filter family);
- trend_score/growth_rate pass through as floats.

Map-side when-chain + filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW_HOURS = {"hourly": 1, "daily": 24, "weekly": 168,
                "monthly": 720}


def trending_searches_fold(rows: DataFrame) -> DataFrame:
    wh = (F.when(F.col("time_window") == "hourly", 1)
          .when(F.col("time_window") == "daily", 24)
          .when(F.col("time_window") == "weekly", 168)
          .when(F.col("time_window") == "monthly", 720)
          .otherwise(24))
    in_limit = F.col("ridx") < F.col("lim")
    kept = in_limit & (F.col("search_count")
                       >= F.col("min_search_count"))
    return (rows
            .select(
                "req_id", "ridx",
                wh.cast("int").alias("window_hours"),
                kept.alias("kept"),
                F.when(kept, F.col("query_text"))
                .otherwise(F.lit(None).cast("string"))
                .alias("query_text"),
                # vacuous category filter: the row is LABELED with the
                # request's filter value, never dropped by it
                F.when(kept, F.col("category_param"))
                .otherwise(F.lit(None).cast("string"))
                .alias("category_out"),
                F.when(kept, F.col("trend_score"))
                .otherwise(F.lit(None).cast("double"))
                .alias("trend_score")))


def synth_trending_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    req = (e % 151).cast("long")
    return events.select(
        req.alias("req_id"),
        F.floor(e / 151).cast("int").alias("ridx"),
        F.element_at(F.array(
            F.lit("hourly"), F.lit("daily"), F.lit("weekly"),
            F.lit("monthly"), F.lit("fortnightly")),
            (req % 5 + 1).cast("int")).alias("time_window"),
        ((req % 3) * 10 + 5).cast("int").alias("lim"),
        ((req % 4) + 1).cast("int").alias("min_search_count"),
        F.when(req % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("cat-"), (req % 4).cast("string")))
        .alias("category_param"),
        F.concat(F.lit("query "), (e % 37).cast("string"))
        .alias("query_text"),
        (e % 7).cast("int").alias("search_count"),
        ((e % 19).cast("double") / 2.0).alias("trend_score"))


SYNTH_TRENDING_SQL = """
    SELECT CAST(event_id % 151 AS BIGINT) AS req_id,
           CAST(event_id // 151 AS INT) AS ridx,
           (['hourly', 'daily', 'weekly', 'monthly', 'fortnightly'])
             [CAST((event_id % 151) % 5 AS INT) + 1] AS time_window,
           CAST((event_id % 151) % 3 * 10 + 5 AS INT) AS lim,
           CAST((event_id % 151) % 4 + 1 AS INT) AS min_search_count,
           CASE WHEN (event_id % 151) % 3 = 0 THEN NULL
                ELSE 'cat-' || CAST((event_id % 151) % 4 AS VARCHAR)
           END AS category_param,
           'query ' || CAST(event_id % 37 AS VARCHAR) AS query_text,
           CAST(event_id % 7 AS INT) AS search_count,
           CAST(event_id % 19 AS DOUBLE) / 2.0 AS trend_score
    FROM events
"""


def trending_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_TRENDING_SQL}),
        g AS (
          SELECT *,
                 CASE time_window WHEN 'hourly' THEN 1
                      WHEN 'daily' THEN 24 WHEN 'weekly' THEN 168
                      WHEN 'monthly' THEN 720 ELSE 24 END
                     AS window_hours,
                 ridx < lim AND search_count >= min_search_count
                     AS kept
          FROM r)
        SELECT req_id, ridx,
               CAST(window_hours AS INT) AS window_hours,
               kept,
               CASE WHEN kept THEN query_text END AS query_text,
               CASE WHEN kept THEN category_param END AS category_out,
               CASE WHEN kept THEN trend_score END AS trend_score
        FROM g
    """
