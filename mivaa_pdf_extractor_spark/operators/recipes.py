"""Self-healing scrape-recipe tier: URL-pattern derivation, the
success/failure confidence ledger, and best-recipe selection.

Re-expresses app/services/integrations/extraction_recipes.py:

- ``url_pattern`` (:49-72): host lowercased, ``www.`` stripped; each
  path segment collapses to ``*`` when it is all-digits, a 12+-char
  alphanumeric hash, or longer than 30 chars; result
  ``host|/seg/seg`` (``host|/`` for a bare path).
- ``record_success`` / ``record_failure`` (:120-173) as a batch fold:
  running success/failure counts per recipe, confidence =
  sc / max(sc + fc, 1), and the auto-disable rule — a FAILURE event
  observed at running conf < 0.5 with running fc >= 3 disables the
  recipe (sticky; nothing in the service re-enables). Recipes with no
  events keep their STORED confidence verbatim (the reference only
  recomputes inside the record_* calls — a hand-seeded row's stored
  confidence may disagree with its counts; pinned).
  ``last_failure_reason`` is the final failure's reason[:500].
- ``find_recipe`` (:84-117): per URL, the 5 highest-confidence enabled
  recipes of the url's domain; an exact url-pattern match (scanned in
  confidence order) wins, else the highest-confidence of those 5.
  The reference's SQL leaves confidence ties unordered — canonicalized
  here to (confidence DESC, recipe_id ASC) and documented.

Scale notes: url_pattern is a map-only projection (parse_url +
transform — no UDF). The ledger is one window partitioned by
recipe_id. Selection broadcasts the recipe table (bounded: recipes
per retailer domain, thousands at most) against the URL stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

OPAQUE_SEG = r"^([0-9]+|[a-zA-Z0-9]{12,})$"  # _NUMERIC_PATH_SEG + _LONG_HASH
MAX_SEG_LEN = 30
DISABLE_MIN_FAILURES = 3    # :168
DISABLE_CONF_BELOW = 0.5    # :168
TOP_K_RECIPES = 5           # :100


def url_patterns(urls: DataFrame) -> DataFrame:
    """(url_id, url) → (url_id, domain, pattern)."""
    host = F.regexp_replace(F.lower(F.parse_url(F.col("url"), F.lit("HOST"))),
                            r"^www\.", "")
    path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit(""))
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    starred = F.transform(
        segs, lambda s: F.when(s.rlike(OPAQUE_SEG)
                               | (F.length(s) > MAX_SEG_LEN), "*")
                         .otherwise(s))
    pattern = F.when(host.isNull() | (host == ""), F.lit("")).otherwise(
        F.concat(host, F.lit("|/"), F.array_join(starred, "/")))
    return urls.select(
        "url_id",
        F.coalesce(host, F.lit("")).alias("domain"),
        pattern.alias("pattern"))


def recipe_ledger(recipes: DataFrame, events: DataFrame) -> DataFrame:
    """recipes: (recipe_id, success_count, failure_count, confidence,
    disabled); events: (recipe_id, seq, kind, reason) → end-state rows
    (recipe_id, success_count, failure_count, confidence, disabled,
    last_failure_reason)."""
    w = (Window.partitionBy("recipe_id").orderBy("seq")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ev = (events
          .join(recipes.select("recipe_id",
                               F.col("success_count").alias("sc0"),
                               F.col("failure_count").alias("fc0")),
                "recipe_id")
          .withColumn("sc_run", F.col("sc0") + F.sum(
              F.when(F.col("kind") == "success", 1).otherwise(0)).over(w))
          .withColumn("fc_run", F.col("fc0") + F.sum(
              F.when(F.col("kind") == "failure", 1).otherwise(0)).over(w))
          .withColumn("conf_run",
                      F.col("sc_run").cast("double")
                      / F.greatest(F.col("sc_run") + F.col("fc_run"),
                                   F.lit(1))))
    folded = ev.groupBy("recipe_id").agg(
        F.max_by("sc_run", "seq").alias("sc_end"),
        F.max_by("fc_run", "seq").alias("fc_end"),
        F.max_by("conf_run", "seq").alias("conf_end"),
        F.max(F.when((F.col("kind") == "failure")
                     & (F.col("conf_run") < DISABLE_CONF_BELOW)
                     & (F.col("fc_run") >= DISABLE_MIN_FAILURES), True)
              .otherwise(False)).alias("tripped"),
        F.max_by(F.when(F.col("kind") == "failure",
                        F.substring("reason", 1, 500)),
                 F.when(F.col("kind") == "failure", F.col("seq")))
        .alias("last_failure_reason"))
    return (recipes
            .join(folded, "recipe_id", "left")
            .select(
                "recipe_id",
                F.coalesce("sc_end", "success_count").alias("success_count"),
                F.coalesce("fc_end", "failure_count").alias("failure_count"),
                # no events → stored confidence kept verbatim (pinned)
                F.coalesce("conf_end", "confidence").alias("confidence"),
                (F.col("disabled") | F.coalesce("tripped", F.lit(False)))
                .alias("disabled"),
                F.col("last_failure_reason")))


def select_recipes(urls: DataFrame, recipes: DataFrame) -> DataFrame:
    """urls: (url_id, url); recipes: (recipe_id, domain, url_pattern,
    confidence, disabled) → (url_id, recipe_id, matched) with the
    find_recipe policy. URLs with no enabled domain recipe emit no row
    (the reference returns None)."""
    pats = url_patterns(urls)
    # candidate pattern is the part after 'host|' (find_recipe :110)
    cand = pats.select(
        "url_id", "domain",
        F.when(F.col("pattern") == "", F.lit(""))
         .otherwise(F.substring_index("pattern", "|", -1))
        .alias("cand_pattern"))
    live = recipes.filter(~F.col("disabled"))
    joined = cand.join(F.broadcast(live), "domain")
    w = Window.partitionBy("url_id").orderBy(
        F.desc("confidence"), F.asc("recipe_id"))
    ranked = (joined.withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= TOP_K_RECIPES)
              .withColumn("is_match",
                          F.col("url_pattern") == F.col("cand_pattern")))
    pick = Window.partitionBy("url_id")
    return (ranked
            .withColumn("best_match_rk",
                        F.min(F.when(F.col("is_match"), F.col("rk")))
                        .over(pick))
            .filter(F.when(F.col("best_match_rk").isNotNull(),
                           F.col("rk") == F.col("best_match_rk"))
                    .otherwise(F.col("rk") == 1))
            .select("url_id", "recipe_id",
                    F.col("is_match").alias("matched")))


# ---------------------------------------------------------------------
# Deterministic synthesis + DuckDB twins

def synth_scrape_urls(events: DataFrame) -> DataFrame:
    """URL shapes: plain slugs, numeric ids, 12+-char hashes, > 30-char
    segments, bare roots, and two retailer domains."""
    e = F.col("event_id")
    host = (F.when(e % 3 == 0, "www.flobali.gr")
             .when(e % 3 == 1, "bestprice.gr").otherwise("shop.example.co"))
    path = (F.when(e % 5 == 0, F.concat(F.lit("/en/product/item-"),
                                        (e % 7).cast("string")))
             .when(e % 5 == 1, F.concat(F.lit("/to/"),
                                        (e % 1000 + 100000).cast("string"),
                                        F.lit("/page.html")))
             .when(e % 5 == 2, F.lit("/p/abcdef123456789/view"))
             .when(e % 5 == 3, F.lit(
                 "/category/a-very-long-segment-name-over-thirty-chars/x"))
             .otherwise(F.lit("/")))
    return events.select(e.alias("url_id"),
                         F.concat(F.lit("https://"), host, path)
                         .alias("url"))


SYNTH_SCRAPE_URLS_SQL = """
    SELECT event_id AS url_id,
           'https://' ||
           (CASE WHEN event_id % 3 = 0 THEN 'www.flobali.gr'
                 WHEN event_id % 3 = 1 THEN 'bestprice.gr'
                 ELSE 'shop.example.co' END) ||
           (CASE WHEN event_id % 5 = 0
                     THEN '/en/product/item-' || CAST(event_id % 7 AS VARCHAR)
                 WHEN event_id % 5 = 1
                     THEN '/to/' || CAST(event_id % 1000 + 100000 AS VARCHAR)
                          || '/page.html'
                 WHEN event_id % 5 = 2 THEN '/p/abcdef123456789/view'
                 WHEN event_id % 5 = 3
                     THEN '/category/a-very-long-segment-name-over-thirty-chars/x'
                 ELSE '/' END) AS url
    FROM events
"""


def synth_recipes(events: DataFrame) -> DataFrame:
    """Small recipe table over the three synth domains: patterns that do
    and do not match the synth URLs, confidence ties, disabled rows,
    nonzero initial counts."""
    r = F.col("rid")
    base = (events.select((F.col("event_id") % 12).alias("rid")).distinct())
    return base.select(
        r.alias("recipe_id"),
        (F.when(r % 3 == 0, "flobali.gr").when(r % 3 == 1, "bestprice.gr")
          .otherwise("shop.example.co")).alias("domain"),
        (F.when(r % 4 == 0, "/en/product/*")
          .when(r % 4 == 1, "/to/*/page.html")
          .when(r % 4 == 2, "/p/*/view").otherwise("/")).alias("url_pattern"),
        (F.when(r % 5 == 0, 0.9).when(r % 5 == 1, 0.8)
          .when(r % 5 == 2, 0.8).when(r % 5 == 3, 0.6).otherwise(0.95))
        .cast("double").alias("confidence"),
        (r % 7 == 3).alias("disabled"),
        (r % 4).cast("long").alias("success_count"),
        (r % 3).cast("long").alias("failure_count"))


SYNTH_RECIPES_SQL = """
    SELECT rid AS recipe_id,
           CASE WHEN rid % 3 = 0 THEN 'flobali.gr'
                WHEN rid % 3 = 1 THEN 'bestprice.gr'
                ELSE 'shop.example.co' END AS domain,
           CASE WHEN rid % 4 = 0 THEN '/en/product/*'
                WHEN rid % 4 = 1 THEN '/to/*/page.html'
                WHEN rid % 4 = 2 THEN '/p/*/view'
                ELSE '/' END AS url_pattern,
           CASE WHEN rid % 5 = 0 THEN CAST(0.9 AS DOUBLE)
                WHEN rid % 5 = 1 THEN CAST(0.8 AS DOUBLE)
                WHEN rid % 5 = 2 THEN CAST(0.8 AS DOUBLE)
                WHEN rid % 5 = 3 THEN CAST(0.6 AS DOUBLE)
                ELSE CAST(0.95 AS DOUBLE) END AS confidence,
           rid % 7 = 3 AS disabled,
           CAST(rid % 4 AS BIGINT) AS success_count,
           CAST(rid % 3 AS BIGINT) AS failure_count
    FROM (SELECT DISTINCT event_id % 12 AS rid FROM events)
"""


def synth_recipe_events(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.filter(e % 2 == 0).select(
        (e % 12).alias("recipe_id"),
        e.alias("seq"),
        F.when(e % 5 < 2, "success").otherwise("failure").alias("kind"),
        F.when(e % 5 >= 2,
               F.concat(F.lit("selector miss #"), (e % 9).cast("string")))
         .alias("reason"))


SYNTH_RECIPE_EVENTS_SQL = """
    SELECT event_id % 12 AS recipe_id,
           event_id AS seq,
           CASE WHEN event_id % 5 < 2 THEN 'success' ELSE 'failure' END AS kind,
           CASE WHEN event_id % 5 >= 2
                THEN 'selector miss #' || CAST(event_id % 9 AS VARCHAR)
           END AS reason
    FROM events WHERE event_id % 2 = 0
"""


DUCK_URL_PATTERNS_SQL = """
    SELECT url_id,
           COALESCE(REGEXP_REPLACE(LOWER(REGEXP_EXTRACT(
               url, '^[a-z]+://([^/]+)', 1)), '^www\\.', ''), '') AS domain,
           CASE WHEN COALESCE(REGEXP_EXTRACT(url, '^[a-z]+://([^/]+)', 1), '')
                     = '' THEN ''
                ELSE REGEXP_REPLACE(LOWER(REGEXP_EXTRACT(
                         url, '^[a-z]+://([^/]+)', 1)), '^www\\.', '')
                     || '|/' ||
                     COALESCE(ARRAY_TO_STRING(LIST_TRANSFORM(
                       LIST_FILTER(STRING_SPLIT(COALESCE(REGEXP_EXTRACT(
                           url, '^[a-z]+://[^/]+(/.*)$', 1), ''), '/'),
                         s -> s <> ''),
                       s -> CASE WHEN REGEXP_MATCHES(
                                     s, '^([0-9]+|[a-zA-Z0-9]{12,})$')
                                   OR LENGTH(s) > 30 THEN '*'
                                 ELSE s END), '/'), '')
           END AS pattern
    FROM urls_in
"""


def duck_recipe_ledger_sql() -> str:
    return f"""
    ev AS (
        SELECT e.recipe_id, e.seq, e.kind, e.reason,
               r.success_count + SUM(CASE WHEN e.kind = 'success' THEN 1
                                          ELSE 0 END)
                 OVER (PARTITION BY e.recipe_id ORDER BY e.seq) AS sc_run,
               r.failure_count + SUM(CASE WHEN e.kind = 'failure' THEN 1
                                          ELSE 0 END)
                 OVER (PARTITION BY e.recipe_id ORDER BY e.seq) AS fc_run
        FROM events_in e JOIN recipes_in r USING (recipe_id)
    ), ev2 AS (
        SELECT *, CAST(sc_run AS DOUBLE) / GREATEST(sc_run + fc_run, 1)
                    AS conf_run
        FROM ev
    ), folded AS (
        SELECT recipe_id,
               MAX_BY(sc_run, seq) AS sc_end,
               MAX_BY(fc_run, seq) AS fc_end,
               MAX_BY(conf_run, seq) AS conf_end,
               BOOL_OR(kind = 'failure'
                       AND conf_run < {DISABLE_CONF_BELOW}
                       AND fc_run >= {DISABLE_MIN_FAILURES}) AS tripped,
               MAX_BY(CASE WHEN kind = 'failure' THEN reason[1:500] END,
                      CASE WHEN kind = 'failure' THEN seq END)
                 AS last_failure_reason
        FROM ev2 GROUP BY recipe_id
    )
    SELECT r.recipe_id,
           CAST(COALESCE(f.sc_end, r.success_count) AS BIGINT) AS success_count,
           CAST(COALESCE(f.fc_end, r.failure_count) AS BIGINT) AS failure_count,
           COALESCE(f.conf_end, r.confidence) AS confidence,
           r.disabled OR COALESCE(f.tripped, FALSE) AS disabled,
           f.last_failure_reason
    FROM recipes_in r LEFT JOIN folded f USING (recipe_id)
"""


def duck_select_recipes_sql() -> str:
    return f"""
    pats AS ({DUCK_URL_PATTERNS_SQL}),
    cand AS (
        SELECT url_id, domain,
               CASE WHEN pattern = '' THEN ''
                    ELSE SPLIT_PART(pattern, '|', 2) END AS cand_pattern
        FROM pats
    ), ranked AS (
        SELECT c.url_id, r.recipe_id, r.url_pattern, c.cand_pattern,
               ROW_NUMBER() OVER (PARTITION BY c.url_id
                                  ORDER BY r.confidence DESC,
                                           r.recipe_id ASC) AS rk
        FROM cand c JOIN recipes_in r USING (domain)
        WHERE NOT r.disabled
    ), topk AS (
        SELECT *, url_pattern = cand_pattern AS is_match
        FROM ranked WHERE rk <= {TOP_K_RECIPES}
    ), picked AS (
        SELECT *, MIN(CASE WHEN is_match THEN rk END)
                    OVER (PARTITION BY url_id) AS best_match_rk
        FROM topk
    )
    SELECT url_id, recipe_id, is_match AS matched
    FROM picked
    WHERE CASE WHEN best_match_rk IS NOT NULL THEN rk = best_match_rk
               ELSE rk = 1 END
"""
