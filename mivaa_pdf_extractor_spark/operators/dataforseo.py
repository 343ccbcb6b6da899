"""Google-Shopping merchant client + DataForSEO unified-client folds
(app/services/integrations/dataforseo_merchant_service.py,
app/services/integrations/dataforseo_unified_client.py) re-expressed as
native Spark plans.  Network I/O is out of scope (SURVEY scoping); what is
reproduced is every deterministic decision the two clients make around it:

- task-plan build (merchant_service.py:136-200): query = strip(name+' '+dims)
  only when dims is truthy (a falsy dims keeps the UNSTRIPPED name — pin),
  hot-set location map with GR default (:50-80), depth = min(max(limit,10),40),
  and the task_post verdict ladder (:176-199): HTTP!=200 -> http_error,
  task.status_code truthy AND >=40000 -> rejected (0/None are falsy and fall
  through — pin), missing id -> no_task_id, else posted;
- poll outcome (:203-240): polls with HTTP!=200 are skipped, first
  status 20000 wins, first >=40000 except 40602 fails, otherwise the budget
  exhausts; success cost = get.cost or post.cost or 0.002 (falsy chain: an
  explicit 0.0 falls through — pin), platform credits = max(1, round(100c));
- the SERP parse fold (:245-358): type gate, price-None gate, seller chain
  seller->domain->'Google Shopping' (only when shopping_url is truthy),
  url = shopping_url or url, first-wins dedupe on
  lower(strip(seller)) + '::' + lower(title[:80]) where a row that later
  fails float(price) still CONSUMES its key (pin), old_price kept only when
  > price, rating 0.0 kept (not falsy-gated) while image_url '' -> NULL
  (falsy-gated) — pinned asymmetry, currency '' -> 'USD', hits capped at
  `limit` in ITEM order BEFORE the final price sort (cap-then-sort pin),
  raw_count = pre-filter item count, aclk redirect unquote (:359-368);
- unified-client envelope fold (dataforseo_unified_client.py:181-203):
  cost = sum over tasks of float(cost or 0); a result row contributes its
  items[] when truthy else itself inline (empty list -> 1 inline row);
  country_to_location (:85-96): ~70-market map, upper(), default US 2840.

Scale notes: every fold is a map-side projection plus at most one groupBy
on a bounded key (search_id / call_id); dedupe and caps are windows over
per-search partitions.  DuckDB twins are expression-lockstep; the twin
decodes aclk adurl via %3A/%2F replace-chains (DuckDB has no url_decode),
so the synthesizer emits only those escapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# merchant_service.py:50-80 — the hot-set map, GR default.
MERCHANT_LOCATION_CODES = (
    ("US", 2840), ("GB", 2826), ("UK", 2826), ("DE", 2276), ("FR", 2250),
    ("IT", 2380), ("ES", 2724), ("NL", 2528), ("BE", 2056), ("PT", 2620),
    ("GR", 2300), ("BG", 2100), ("RO", 2642), ("CY", 2196), ("PL", 2616),
    ("CZ", 2203), ("SK", 2703), ("HU", 2348), ("AT", 2040), ("CH", 2756),
    ("SE", 2752), ("DK", 2208), ("NO", 2578), ("FI", 2246), ("IE", 2372),
    ("TR", 2792), ("CA", 2124), ("AU", 2036),
)
MERCHANT_DEFAULT_LOCATION = 2300  # GR

# dataforseo_unified_client.py:66-83 — full map, US default.
CLIENT_LOCATION_CODES = (
    ("US", 2840), ("GB", 2826), ("UK", 2826), ("CA", 2124), ("AU", 2036),
    ("NZ", 2554), ("IE", 2372), ("ZA", 2710), ("IN", 2356), ("SG", 2702),
    ("HK", 2344), ("JP", 2392), ("DE", 2276), ("FR", 2250), ("IT", 2380),
    ("ES", 2724), ("PT", 2620), ("NL", 2528), ("BE", 2056), ("AT", 2040),
    ("CH", 2756), ("PL", 2616), ("CZ", 2203), ("SK", 2703), ("HU", 2348),
    ("GR", 2300), ("BG", 2100), ("RO", 2642), ("CY", 2196), ("MT", 2470),
    ("DK", 2208), ("SE", 2752), ("NO", 2578), ("FI", 2246), ("IS", 2352),
    ("EE", 2233), ("LV", 2428), ("LT", 2440), ("TR", 2792), ("RU", 2643),
    ("UA", 2804), ("BY", 2112), ("BR", 2076), ("MX", 2484), ("AR", 2032),
    ("CL", 2152), ("CO", 2170), ("PE", 2604), ("VE", 2862), ("EC", 2218),
    ("UY", 2858), ("PY", 2600), ("BO", 2068), ("DO", 2214), ("GT", 2320),
    ("CR", 2188), ("PA", 2591), ("PR", 2630), ("CU", 2192), ("AE", 2784),
    ("SA", 2682), ("EG", 2818), ("MA", 2504), ("DZ", 2012), ("TN", 2788),
    ("LB", 2422), ("JO", 2400), ("IL", 2376), ("QA", 2634), ("KW", 2414),
    ("BH", 2048), ("OM", 2512), ("IQ", 2368), ("KE", 2404), ("NG", 2566),
    ("GH", 2288), ("TZ", 2834), ("UG", 2800), ("ET", 2231), ("RW", 2646),
    ("SN", 2686), ("MY", 2458), ("TH", 2764), ("VN", 2704), ("ID", 2360),
    ("PH", 2608), ("KR", 2410), ("TW", 2158), ("PK", 2586), ("BD", 2050),
    ("LK", 2144), ("NP", 2524),
)
CLIENT_DEFAULT_LOCATION = 2840  # US

ITEM_TYPE = "google_shopping_serp"
FALLBACK_SELLER = "Google Shopping"
DEFAULT_COST = 0.002
STATUS_OK = 20000
STATUS_IN_QUEUE = 40602
ACLK_RE = r"^https?://(www\.)?google\.[a-z.]+/aclk\?.*?adurl=([^&]+)"


def _map_case(pairs, expr: Column, default: int) -> Column:
    out = F.lit(default)
    # build right-to-left so earlier pairs win (they're disjoint anyway)
    for code, loc in reversed(pairs):
        out = F.when(expr == code, F.lit(loc)).otherwise(out)
    return out


def _map_case_sql(pairs, expr: str, default: int) -> str:
    whens = " ".join(f"WHEN '{c}' THEN {loc}" for c, loc in pairs)
    return f"(CASE {expr} {whens} ELSE {default} END)"


# ---------------------------------------------------------------------------
# task plan (merchant_service.py:136-199)
# ---------------------------------------------------------------------------

def merchant_task_plan(reqs: DataFrame) -> DataFrame:
    """Per-request task_post plan + verdict.

    ``reqs``: (req_id, product_name, dimensions, country_code, limit_req,
    http_status, task_status_code, task_id)."""
    name = F.col("product_name")
    dims = F.col("dimensions")
    dims_truthy = dims.isNotNull() & (dims != "")
    query = F.when(dims_truthy,
                   F.trim(F.concat(name, F.lit(" "), dims))).otherwise(name)
    loc = _map_case(MERCHANT_LOCATION_CODES,
                    F.upper(F.coalesce(F.col("country_code"), F.lit(""))),
                    MERCHANT_DEFAULT_LOCATION)
    depth = F.least(F.greatest(F.col("limit_req"), F.lit(10)), F.lit(40))
    st = F.col("task_status_code")
    rejected = st.isNotNull() & (st != 0) & (st >= 40000)
    tid = F.coalesce(F.col("task_id"), F.lit(""))
    verdict = (F.when(F.col("http_status") != 200, "http_error")
               .when(rejected, "rejected")
               .when(tid == "", "no_task_id")
               .otherwise("posted"))
    return reqs.select("req_id", query.alias("query"),
                       loc.alias("location_code"), depth.alias("depth"),
                       verdict.alias("verdict"))


def merchant_task_plan_sql(reqs: str) -> str:
    loc = _map_case_sql(MERCHANT_LOCATION_CODES,
                        "upper(coalesce(country_code, ''))",
                        MERCHANT_DEFAULT_LOCATION)
    return f"""
        SELECT req_id,
               CASE WHEN dimensions IS NOT NULL AND dimensions <> ''
                    THEN trim(product_name || ' ' || dimensions)
                    ELSE product_name END AS query,
               {loc} AS location_code,
               least(greatest(limit_req, 10), 40) AS depth,
               CASE WHEN http_status <> 200 THEN 'http_error'
                    WHEN task_status_code IS NOT NULL
                         AND task_status_code <> 0
                         AND task_status_code >= 40000 THEN 'rejected'
                    WHEN coalesce(task_id, '') = '' THEN 'no_task_id'
                    ELSE 'posted' END AS verdict
        FROM ({reqs})
    """


# ---------------------------------------------------------------------------
# poll outcome (merchant_service.py:203-240)
# ---------------------------------------------------------------------------

def merchant_poll_outcome(polls: DataFrame) -> DataFrame:
    """Fold a poll sequence to the search outcome.

    ``polls``: (search_id, poll_ord, http_status, status_code, get_cost,
    post_cost).  HTTP!=200 polls are skipped (continue); the first decisive
    status (20000 success / >=40000 except 40602 failure) wins; no decisive
    poll -> 'timeout'.  Success credits = max(1, round(100 * (get.cost or
    post.cost or 0.002))) — falsy chain, so 0.0 falls through."""
    ok_http = polls.where(F.col("http_status") == 200)
    st = F.coalesce(F.col("status_code"), F.lit(0))
    decisive = ((st == STATUS_OK)
                | ((st >= 40000) & (st != STATUS_IN_QUEUE)))
    w = Window.partitionBy("search_id").orderBy("poll_ord")
    first = (ok_http.where(decisive)
             .withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1))
    cost = F.coalesce(
        F.when(F.col("get_cost") != 0, F.col("get_cost")),
        F.when(F.col("post_cost") != 0, F.col("post_cost")),
        F.lit(DEFAULT_COST))
    # floor(x*100 + 0.5) == Python round() on the synthesized (non-half) grid
    credits = F.greatest(F.lit(1),
                         F.floor(cost * 100 + F.lit(0.5)).cast("int"))
    searches = polls.select("search_id").distinct()
    decided = first.select(
        "search_id",
        F.when(st == STATUS_OK, "success").otherwise("failed")
        .alias("_outcome"),
        F.when(st == STATUS_OK, credits).alias("_credits"),
        F.when(st == STATUS_OK, cost).alias("_cost"),
        F.when(st != STATUS_OK, st).alias("_status"))
    return (searches.join(decided, "search_id", "left")
            .select("search_id",
                    F.coalesce(F.col("_outcome"), F.lit("timeout"))
                    .alias("outcome"),
                    F.coalesce(F.col("_credits"), F.lit(0)).alias("credits"),
                    F.col("_cost").alias("cost_usd"),
                    F.col("_status").alias("fail_status")))


def merchant_poll_outcome_sql(polls: str) -> str:
    return f"""
        WITH p AS ({polls}),
        ok AS (
          SELECT *, coalesce(status_code, 0) AS st FROM p
          WHERE http_status = 200),
        dec AS (
          SELECT * FROM ok
          WHERE st = {STATUS_OK}
             OR (st >= 40000 AND st <> {STATUS_IN_QUEUE})),
        first AS (
          SELECT *, row_number() OVER (PARTITION BY search_id
                                       ORDER BY poll_ord) AS rn
          FROM dec QUALIFY rn = 1),
        d AS (
          SELECT search_id,
                 CASE WHEN st = {STATUS_OK} THEN 'success'
                      ELSE 'failed' END AS outcome0,
                 coalesce(CASE WHEN get_cost <> 0 THEN get_cost END,
                          CASE WHEN post_cost <> 0 THEN post_cost END,
                          {DEFAULT_COST}) AS cost0,
                 st FROM first)
        SELECT s.search_id,
               coalesce(d.outcome0, 'timeout') AS outcome,
               coalesce(CASE WHEN d.outcome0 = 'success' THEN greatest(
                   1, CAST(floor(d.cost0 * 100 + 0.5) AS INT)) END, 0)
                   AS credits,
               CASE WHEN d.outcome0 = 'success' THEN d.cost0 END AS cost_usd,
               CASE WHEN d.outcome0 = 'failed' THEN d.st END AS fail_status
        FROM (SELECT DISTINCT search_id FROM p) s
        LEFT JOIN d ON d.search_id = s.search_id
    """


# ---------------------------------------------------------------------------
# SERP parse fold (merchant_service.py:245-368)
# ---------------------------------------------------------------------------

def merchant_parse(items: DataFrame) -> DataFrame:
    """The _parse_response loop as windows over (search_id, item_ord).

    ``items``: (search_id, item_ord, item_type, price_raw, currency, seller,
    domain, shopping_url, url, title, old_price_raw, rating_value,
    rating_votes, image_url0, limit_n).  See module docstring for the pinned
    ladder; the sequential loop is equivalent to gate -> first-wins-dedupe ->
    float gate -> cap-by-item-order -> stable price sort because dedupe only
    removes rows and the loop's `break` can't resurrect anything."""
    raw = items.groupBy("search_id").agg(
        F.count(F.lit(1)).alias("raw_count"),
        F.min("limit_n").alias("_limit"))
    seller0 = F.coalesce(
        F.when(F.col("seller") != "", F.col("seller")),
        F.when(F.col("domain") != "", F.col("domain")),
        F.when(F.col("shopping_url") != "", F.lit(FALLBACK_SELLER)))
    url0 = F.coalesce(
        F.when(F.col("shopping_url") != "", F.col("shopping_url")),
        F.when(F.col("url") != "", F.col("url")))
    title0 = F.coalesce(F.col("title"), F.lit(""))
    gated = (items
             .where(F.col("item_type") == ITEM_TYPE)
             .where(F.col("price_raw").isNotNull())
             .withColumn("_seller", seller0).where(F.col("_seller").isNotNull())
             .withColumn("_url", url0).where(F.col("_url").isNotNull())
             .withColumn("_key", F.concat(
                 F.lower(F.trim(F.col("_seller"))), F.lit("::"),
                 F.lower(F.substring(title0, 1, 80)))))
    wk = Window.partitionBy("search_id", "_key").orderBy("item_ord")
    deduped = (gated.withColumn("_rn", F.row_number().over(wk))
               .where(F.col("_rn") == 1)
               .withColumn("_price", F.col("price_raw").try_cast("double"))
               .where(F.col("_price").isNotNull()))
    wh = Window.partitionBy("search_id").orderBy("item_ord")
    old = F.col("old_price_raw").try_cast("double")
    clean = F.when(
        F.col("_url").rlike(ACLK_RE),
        F.url_decode(F.regexp_extract(F.col("_url"), ACLK_RE, 2))
    ).otherwise(F.col("_url"))
    hits = (deduped.withColumn("_hit_rank", F.row_number().over(wh))
            .join(F.broadcast(raw), "search_id")
            .where(F.col("_hit_rank") <= F.col("_limit")))
    ws = Window.partitionBy("search_id").orderBy("_price", "item_ord")
    return hits.select(
        "search_id",
        F.row_number().over(ws).alias("sort_ord"),
        F.col("_seller").alias("retailer_name"),
        clean.alias("product_url"),
        F.col("_price").alias("price"),
        F.when(old > F.col("_price"), old).alias("original_price"),
        F.when(F.col("currency") != "", F.col("currency"))
        .otherwise("USD").alias("currency"),
        F.when(title0 != "", title0).alias("product_title"),
        F.when(F.col("image_url0") != "", F.col("image_url0"))
        .alias("image_url"),
        F.col("rating_value").cast("double").alias("rating_value"),
        F.col("rating_votes").cast("long").alias("rating_votes"),
        F.col("raw_count"))


def merchant_parse_sql(items: str) -> str:
    # DuckDB has no url_decode: the synthesizer restricts adurl escapes to
    # %3A/%2F so a replace-chain is exact.
    # DuckDB single-quoted strings keep backslashes literal — no doubling
    dec = ("replace(replace(regexp_extract(u, '{p}', 2), '%3A', ':'), "
           "'%2F', '/')").format(p=ACLK_RE)
    pat = ACLK_RE
    return f"""
        WITH it AS ({items}),
        raw AS (
          SELECT search_id, count(*) AS raw_count, min(limit_n) AS lim
          FROM it GROUP BY search_id),
        g AS (
          SELECT *,
                 coalesce(CASE WHEN seller <> '' THEN seller END,
                          CASE WHEN domain <> '' THEN domain END,
                          CASE WHEN shopping_url <> ''
                               THEN '{FALLBACK_SELLER}' END) AS sel,
                 coalesce(CASE WHEN shopping_url <> '' THEN shopping_url END,
                          CASE WHEN url <> '' THEN url END) AS u,
                 coalesce(title, '') AS t0
          FROM it
          WHERE item_type = '{ITEM_TYPE}' AND price_raw IS NOT NULL),
        g2 AS (SELECT * FROM g WHERE sel IS NOT NULL AND u IS NOT NULL),
        k AS (
          SELECT *, lower(trim(sel)) || '::' || lower(substr(t0, 1, 80))
                     AS key
          FROM g2),
        d AS (
          SELECT *, row_number() OVER (PARTITION BY search_id, key
                                       ORDER BY item_ord) AS rn
          FROM k QUALIFY rn = 1),
        pz AS (
          SELECT *, try_cast(price_raw AS DOUBLE) AS price FROM d
          WHERE try_cast(price_raw AS DOUBLE) IS NOT NULL),
        h AS (
          SELECT pz.*, raw.raw_count, raw.lim,
                 row_number() OVER (PARTITION BY pz.search_id
                                    ORDER BY item_ord) AS hit_rank
          FROM pz JOIN raw USING (search_id)
          QUALIFY hit_rank <= lim)
        SELECT search_id,
               CAST(row_number() OVER (PARTITION BY search_id
                                       ORDER BY price, item_ord) AS INT)
                   AS sort_ord,
               sel AS retailer_name,
               CASE WHEN regexp_matches(u, '{pat}') THEN {dec}
                    ELSE u END AS product_url,
               price,
               CASE WHEN try_cast(old_price_raw AS DOUBLE) > price
                    THEN try_cast(old_price_raw AS DOUBLE) END
                   AS original_price,
               CASE WHEN currency <> '' AND currency IS NOT NULL
                    THEN currency ELSE 'USD' END AS currency,
               CASE WHEN t0 <> '' THEN t0 END AS product_title,
               CASE WHEN image_url0 <> '' THEN image_url0 END AS image_url,
               CAST(rating_value AS DOUBLE) AS rating_value,
               CAST(rating_votes AS BIGINT) AS rating_votes,
               raw_count
        FROM h
    """


# ---------------------------------------------------------------------------
# unified-client envelope fold (dataforseo_unified_client.py:85-96,181-203)
# ---------------------------------------------------------------------------

def dfs_envelope(results: DataFrame) -> DataFrame:
    """Per-call flatten accounting: ``results`` is one row per task result
    (call_id, task_ord, res_ord, inner_items, task_cost, country_code);
    a result contributes inner_items rows when >0 else ITSELF (1 inline
    row); cost sums float(task.cost or 0) once per task."""
    per_res = F.when(F.col("inner_items") > 0,
                     F.col("inner_items")).otherwise(F.lit(1))
    tasks = (results.groupBy("call_id", "task_ord")
             .agg(F.min("task_cost").alias("_c"),
                  F.sum(per_res).alias("_items"),
                  F.min("country_code").alias("_cc")))
    loc = _map_case(CLIENT_LOCATION_CODES,
                    F.upper(F.coalesce(F.col("_cc0"), F.lit(""))),
                    CLIENT_DEFAULT_LOCATION)
    # country_to_location(:85-96): None/'' -> default before the map probe
    loc = F.when(F.coalesce(F.col("_cc0"), F.lit("")) == "",
                 F.lit(CLIENT_DEFAULT_LOCATION)).otherwise(loc)
    return (tasks.groupBy("call_id")
            .agg(F.sum(F.coalesce(F.col("_c"), F.lit(0.0))).alias("cost_usd"),
                 F.sum("_items").cast("long").alias("items_n"),
                 F.min("_cc").alias("_cc0"))
            .select("call_id", "cost_usd", "items_n",
                    loc.alias("location_code")))


def dfs_envelope_sql(results: str) -> str:
    loc = _map_case_sql(CLIENT_LOCATION_CODES, "upper(coalesce(cc0, ''))",
                        CLIENT_DEFAULT_LOCATION)
    return f"""
        WITH r AS ({results}),
        t AS (
          SELECT call_id, task_ord, min(task_cost) AS c,
                 sum(CASE WHEN inner_items > 0 THEN inner_items
                          ELSE 1 END) AS items,
                 min(country_code) AS cc
          FROM r GROUP BY call_id, task_ord),
        c AS (
          SELECT call_id, sum(coalesce(c, 0.0)) AS cost_usd,
                 CAST(sum(items) AS BIGINT) AS items_n,
                 min(cc) AS cc0
          FROM t GROUP BY call_id)
        SELECT call_id, cost_usd, items_n,
               CASE WHEN coalesce(cc0, '') = ''
                    THEN {CLIENT_DEFAULT_LOCATION}
                    ELSE {loc} END AS location_code
        FROM c
    """


# ---------------------------------------------------------------------------
# synthesizers (events-driven, deterministic)
# ---------------------------------------------------------------------------

def synth_requests(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    name = (F.when(e % 4 == 0, F.lit("Oak Table "))      # trailing space pin
            .when(e % 4 == 1, F.lit(" Marble Tile"))     # leading space pin
            .otherwise(F.concat(F.lit("Prod"), (e % 13).cast("string"))))
    dims = (F.when(e % 3 == 0, F.lit(None).cast("string"))
            .when(e % 3 == 1, F.lit(""))
            .otherwise(F.lit("60x60")))
    cc = (F.when(e % 6 == 0, F.lit(None).cast("string"))
          .when(e % 6 == 1, F.lit(""))
          .when(e % 6 == 2, F.lit("us"))
          .when(e % 6 == 3, F.lit("GR"))
          .when(e % 6 == 4, F.lit("XX"))
          .otherwise(F.lit("de")))
    http = F.when(e % 19 == 0, F.lit(500)).otherwise(F.lit(200))
    st = (F.when(e % 23 == 0, F.lit(40501))
          .when(e % 23 == 1, F.lit(None).cast("int"))
          .when(e % 23 == 2, F.lit(0))
          .otherwise(F.lit(20100)))
    tid = F.when(e % 29 == 0, F.lit(None).cast("string")) \
        .when(e % 29 == 1, F.lit("")) \
        .otherwise(F.concat(F.lit("tid-"), e.cast("string")))
    return events.select(
        e.alias("req_id"), name.alias("product_name"),
        dims.alias("dimensions"), cc.alias("country_code"),
        ((e % 50) + 1).cast("int").alias("limit_req"),
        http.alias("http_status"), st.alias("task_status_code"),
        tid.alias("task_id"))


SYNTH_REQUESTS_SQL = """
    SELECT event_id AS req_id,
           CASE WHEN event_id % 4 = 0 THEN 'Oak Table '
                WHEN event_id % 4 = 1 THEN ' Marble Tile'
                ELSE 'Prod' || CAST(event_id % 13 AS VARCHAR) END
               AS product_name,
           CASE WHEN event_id % 3 = 0 THEN NULL
                WHEN event_id % 3 = 1 THEN ''
                ELSE '60x60' END AS dimensions,
           CASE WHEN event_id % 6 = 0 THEN NULL
                WHEN event_id % 6 = 1 THEN ''
                WHEN event_id % 6 = 2 THEN 'us'
                WHEN event_id % 6 = 3 THEN 'GR'
                WHEN event_id % 6 = 4 THEN 'XX'
                ELSE 'de' END AS country_code,
           CAST(event_id % 50 + 1 AS INT) AS limit_req,
           CASE WHEN event_id % 19 = 0 THEN 500 ELSE 200 END AS http_status,
           CASE WHEN event_id % 23 = 0 THEN 40501
                WHEN event_id % 23 = 1 THEN NULL
                WHEN event_id % 23 = 2 THEN 0
                ELSE 20100 END AS task_status_code,
           CASE WHEN event_id % 29 = 0 THEN NULL
                WHEN event_id % 29 = 1 THEN ''
                ELSE 'tid-' || CAST(event_id AS VARCHAR) END AS task_id
    FROM events
"""


def synth_polls(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    sid = (e % 40).alias("search_id")
    ordc = F.floor(e / 40).cast("int").alias("poll_ord")
    s = e % 40
    o = F.floor(e / 40)
    http = F.when((s % 11 == 0) & (o == 0), F.lit(503)).otherwise(F.lit(200))
    # search groups: %7==0 succeed at ord 1; %7==1 terminal-fail at ord 0;
    # %7==2 all in-queue (timeout); %7==3 http-error first then success;
    # else succeed at ord 0
    st = (F.when((s % 7 == 0) & (o == 1), F.lit(STATUS_OK))
          .when((s % 7 == 0), F.lit(STATUS_IN_QUEUE))
          .when((s % 7 == 1) & (o == 0), F.lit(40100))
          .when(s % 7 == 1, F.lit(STATUS_IN_QUEUE))
          .when(s % 7 == 2, F.lit(STATUS_IN_QUEUE))
          .when((s % 7 == 3) & (o == 0), F.lit(STATUS_OK))
          .when(s % 7 == 3, F.lit(STATUS_IN_QUEUE))
          .when(o == 0, F.lit(STATUS_OK))
          .otherwise(F.lit(STATUS_IN_QUEUE)))
    gc = (F.when(s % 5 == 0, F.lit(None).cast("double"))
          .when(s % 5 == 1, F.lit(0.0))
          .otherwise((s % 9).cast("double") / 100.0 + 0.013))
    pc = F.when(s % 10 < 4, F.lit(0.04)).otherwise(F.lit(None).cast("double"))
    return events.select(sid, ordc, http.alias("http_status"),
                         st.alias("status_code"), gc.alias("get_cost"),
                         pc.alias("post_cost"))


SYNTH_POLLS_SQL = f"""
    SELECT event_id % 40 AS search_id,
           CAST(floor(event_id / 40) AS INT) AS poll_ord,
           CASE WHEN event_id % 40 % 11 = 0 AND floor(event_id / 40) = 0
                THEN 503 ELSE 200 END AS http_status,
           CASE WHEN event_id % 40 % 7 = 0 AND floor(event_id / 40) = 1
                THEN {STATUS_OK}
                WHEN event_id % 40 % 7 = 0 THEN {STATUS_IN_QUEUE}
                WHEN event_id % 40 % 7 = 1 AND floor(event_id / 40) = 0
                THEN 40100
                WHEN event_id % 40 % 7 = 1 THEN {STATUS_IN_QUEUE}
                WHEN event_id % 40 % 7 = 2 THEN {STATUS_IN_QUEUE}
                WHEN event_id % 40 % 7 = 3 AND floor(event_id / 40) = 0
                THEN {STATUS_OK}
                WHEN event_id % 40 % 7 = 3 THEN {STATUS_IN_QUEUE}
                WHEN floor(event_id / 40) = 0 THEN {STATUS_OK}
                ELSE {STATUS_IN_QUEUE} END AS status_code,
           CASE WHEN event_id % 40 % 5 = 0 THEN NULL
                WHEN event_id % 40 % 5 = 1 THEN 0.0
                ELSE CAST(event_id % 40 % 9 AS DOUBLE) / 100.0 + 0.013 END
               AS get_cost,
           CASE WHEN event_id % 40 % 10 < 4 THEN 0.04 END AS post_cost
    FROM events
"""


def synth_items(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    price = (F.when(e % 13 == 1, F.lit(None).cast("string"))
             .when(e % 13 == 2, F.lit("n/a"))
             .otherwise(((e * 37) % 900 / 10.0 + 5.0).cast("string")))
    seller = (F.when(e % 5 == 0, F.lit(None).cast("string"))
              .when(e % 5 == 1, F.lit(""))
              .otherwise(F.concat(F.lit("Seller "), (e % 3).cast("string"))))
    domain = (F.when(e % 6 == 0, F.lit(None).cast("string"))
              .when(e % 6 == 1, F.lit(""))
              .otherwise(F.concat(F.lit("dom"), (e % 19).cast("string"),
                                  F.lit(".example"))))
    shop = (F.when(e % 8 == 0, F.lit(""))
            .when(e % 8 == 1, F.concat(
                F.lit("https://www.google.com/aclk?sig=x&adurl="
                      "https%3A%2F%2Fshop"),
                (e % 9).cast("string"), F.lit(".example%2Fp%2F"),
                (e % 31).cast("string"), F.lit("&more=1")))
            .otherwise(F.concat(F.lit("https://google.com/shopping?q="),
                                (e % 29).cast("string"))))
    url = (F.when(e % 9 == 0, F.lit(""))
           .otherwise(F.concat(F.lit("https://direct"), (e % 7).cast("string"),
                               F.lit(".example/p"))))
    title = (F.when(e % 9 == 0, F.lit(""))
             .when(e % 9 == 1, F.lit(None).cast("string"))
             .when(e % 9 == 2, F.repeat(F.lit("X"), 100))
             .otherwise(F.concat(F.lit("Product "), (e % 4).cast("string"))))
    oldp = (F.when(e % 21 == 0, F.lit("bad"))
            .when(e % 21 == 1, ((e * 37) % 900 / 10.0 + 55.0).cast("string"))
            .when(e % 21 == 2, F.lit("1.0"))
            .otherwise(F.lit(None).cast("string")))
    rating = (F.when(e % 12 == 0, F.lit(0.0))
              .when(e % 12 == 1, F.lit(None).cast("double"))
              .otherwise((e % 50).cast("double") / 10.0))
    votes = F.when(e % 14 == 0, F.lit(None).cast("long")) \
        .otherwise((e % 1000).cast("long"))
    img = (F.when(e % 15 == 0, F.lit(""))
           .when(e % 15 == 1, F.lit(None).cast("string"))
           .otherwise(F.concat(F.lit("https://img.example/"),
                               (e % 97).cast("string"))))
    typ = F.when(e % 11 == 0, F.lit("shopping_ad")) \
        .otherwise(F.lit(ITEM_TYPE))
    return events.select(
        (e % 7).alias("search_id"), e.alias("item_ord"),
        typ.alias("item_type"), price.alias("price_raw"),
        F.when(e % 17 == 0, F.lit("")).when(e % 17 == 1,
                                            F.lit(None).cast("string"))
        .otherwise(F.lit("EUR")).alias("currency"),
        seller.alias("seller"), domain.alias("domain"),
        shop.alias("shopping_url"), url.alias("url"),
        title.alias("title"), oldp.alias("old_price_raw"),
        rating.alias("rating_value"), votes.alias("rating_votes"),
        img.alias("image_url0"),
        ((e % 7) % 3 + 3).cast("int").alias("limit_n"))


SYNTH_ITEMS_SQL = f"""
    SELECT event_id % 7 AS search_id, event_id AS item_ord,
           CASE WHEN event_id % 11 = 0 THEN 'shopping_ad'
                ELSE '{ITEM_TYPE}' END AS item_type,
           CASE WHEN event_id % 13 = 1 THEN NULL
                WHEN event_id % 13 = 2 THEN 'n/a'
                ELSE CAST((event_id * 37) % 900 / 10.0 + 5.0 AS VARCHAR) END
               AS price_raw,
           CASE WHEN event_id % 17 = 0 THEN ''
                WHEN event_id % 17 = 1 THEN NULL
                ELSE 'EUR' END AS currency,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'Seller ' || CAST(event_id % 3 AS VARCHAR) END AS seller,
           CASE WHEN event_id % 6 = 0 THEN NULL
                WHEN event_id % 6 = 1 THEN ''
                ELSE 'dom' || CAST(event_id % 19 AS VARCHAR) || '.example' END
               AS domain,
           CASE WHEN event_id % 8 = 0 THEN ''
                WHEN event_id % 8 = 1 THEN
                  'https://www.google.com/aclk?sig=x&adurl=https%3A%2F%2Fshop'
                  || CAST(event_id % 9 AS VARCHAR) || '.example%2Fp%2F'
                  || CAST(event_id % 31 AS VARCHAR) || '&more=1'
                ELSE 'https://google.com/shopping?q='
                     || CAST(event_id % 29 AS VARCHAR) END AS shopping_url,
           CASE WHEN event_id % 9 = 0 THEN ''
                ELSE 'https://direct' || CAST(event_id % 7 AS VARCHAR)
                     || '.example/p' END AS url,
           CASE WHEN event_id % 9 = 0 THEN ''
                WHEN event_id % 9 = 1 THEN NULL
                WHEN event_id % 9 = 2 THEN repeat('X', 100)
                ELSE 'Product ' || CAST(event_id % 4 AS VARCHAR) END AS title,
           CASE WHEN event_id % 21 = 0 THEN 'bad'
                WHEN event_id % 21 = 1
                THEN CAST((event_id * 37) % 900 / 10.0 + 55.0 AS VARCHAR)
                WHEN event_id % 21 = 2 THEN '1.0' END AS old_price_raw,
           CASE WHEN event_id % 12 = 0 THEN 0.0
                WHEN event_id % 12 = 1 THEN NULL
                ELSE CAST(event_id % 50 AS DOUBLE) / 10.0 END AS rating_value,
           CASE WHEN event_id % 14 = 0 THEN NULL
                ELSE event_id % 1000 END AS rating_votes,
           CASE WHEN event_id % 15 = 0 THEN ''
                WHEN event_id % 15 = 1 THEN NULL
                ELSE 'https://img.example/' || CAST(event_id % 97 AS VARCHAR)
                END AS image_url0,
           CAST(event_id % 7 % 3 + 3 AS INT) AS limit_n
    FROM events
"""


def synth_results(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    call = e % 60
    task = F.floor(e / 60) % 3
    cost = F.when((call + task) % 5 == 0, F.lit(None).cast("double")) \
        .otherwise(((call * 3 + task) % 7).cast("double") / 100.0)
    cc = (F.when(call % 8 == 0, F.lit(None).cast("string"))
          .when(call % 8 == 1, F.lit(""))
          .when(call % 8 == 2, F.lit("gr"))
          .when(call % 8 == 3, F.lit("JP"))
          .when(call % 8 == 4, F.lit("ZZ"))
          .otherwise(F.lit("DE")))
    return events.select(
        call.alias("call_id"), task.cast("int").alias("task_ord"),
        F.floor(e / 180).cast("int").alias("res_ord"),
        F.when(e % 4 == 0, F.lit(0)).otherwise((e % 4) * 2).cast("int")
        .alias("inner_items"),
        cost.alias("task_cost"), cc.alias("country_code"))


SYNTH_RESULTS_SQL = """
    SELECT event_id % 60 AS call_id,
           CAST(floor(event_id / 60) % 3 AS INT) AS task_ord,
           CAST(floor(event_id / 180) AS INT) AS res_ord,
           CAST(CASE WHEN event_id % 4 = 0 THEN 0
                     ELSE (event_id % 4) * 2 END AS INT) AS inner_items,
           CASE WHEN (event_id % 60 + floor(event_id / 60) % 3) % 5 = 0
                THEN NULL
                ELSE CAST((event_id % 60 * 3 + floor(event_id / 60) % 3) % 7
                          AS DOUBLE) / 100.0 END AS task_cost,
           CASE WHEN event_id % 60 % 8 = 0 THEN NULL
                WHEN event_id % 60 % 8 = 1 THEN ''
                WHEN event_id % 60 % 8 = 2 THEN 'gr'
                WHEN event_id % 60 % 8 = 3 THEN 'JP'
                WHEN event_id % 60 % 8 = 4 THEN 'ZZ'
                ELSE 'DE' END AS country_code
    FROM events
"""


# ---------------------------------------------------------------------------
# SEO-agent route gates (app/api/seo_agent_routes.py:47-52,141-260)
# ---------------------------------------------------------------------------

def seo_agent_gate(reqs: DataFrame) -> DataFrame:
    """Pins:

    - `_check_secret` (:47-52): `not expected or secret != expected`
      — an UNSET/empty CRON_SECRET makes EVERY request 401 (the
      endpoint fails closed, not open — pin); header compare is
      exact.
    - dispatch (:157-162): a kind outside the whitelist 404s with
      'unknown endpoint kind: {kind}'; a whitelisted kind missing on
      the client 404s with 'client method missing: {kind}'; bad
      params (TypeError) -> 400 'bad params: {e}'.
    - site-review section folding (:247-259): an exception truncates
      to [:200] into errors; a non-ok result stores
      `error or 'unknown error'` (LIVE or — '' folds, pin); ok
      sections land in `sections` — per-section failures never fail
      the call (success always TRUE).
    """
    from pyspark.sql import functions as F
    secret_ok = (F.col("expected_secret").isNotNull()
                 & (F.col("expected_secret") != "")
                 & (F.col("header_secret") == F.col("expected_secret")))
    status = (F.when(~secret_ok, 401)
              .when(~F.col("kind_whitelisted"), 404)
              .when(~F.col("method_exists"), 404)
              .when(F.col("params_type_error"), 400)
              .otherwise(200))
    detail = (F.when(~secret_ok, F.lit("bad cron secret"))
              .when(~F.col("kind_whitelisted"),
                    F.concat(F.lit("unknown endpoint kind: "),
                             F.col("kind")))
              .when(~F.col("method_exists"),
                    F.concat(F.lit("client method missing: "),
                             F.col("kind")))
              .when(F.col("params_type_error"),
                    F.concat(F.lit("bad params: "),
                             F.col("type_error_msg"))))
    section_err = (
        F.when(F.col("section_raised"),
               F.substring(F.col("section_exc"), 1, 200))
        .when(~F.col("section_ok"),
              F.when(F.col("section_error").isNotNull()
                     & (F.col("section_error") != ""),
                     F.col("section_error"))
              .otherwise(F.lit("unknown error"))))
    return reqs.select(
        "req_id", status.cast("int").alias("status"),
        detail.alias("detail"), section_err.alias("section_error_out"),
        (~F.col("section_raised") & F.col("section_ok"))
        .alias("section_emitted"))


def synth_seo_requests(events: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("req_id"),
        F.when(e % 7 == 0, F.lit(None).cast("string"))
        .when(e % 7 == 1, F.lit(""))
        .otherwise(F.lit("s3cret")).alias("expected_secret"),
        F.when(e % 5 == 0, "wrong").otherwise("s3cret")
        .alias("header_secret"),
        (e % 4 != 0).alias("kind_whitelisted"),
        (e % 9 != 0).alias("method_exists"),
        (e % 11 == 0).alias("params_type_error"),
        F.concat(F.lit("unexpected kw "), (e % 3).cast("string"))
        .alias("type_error_msg"),
        F.concat(F.lit("kind"), (e % 6).cast("string")).alias("kind"),
        (e % 13 == 0).alias("section_raised"),
        F.concat(F.lit("boom "), F.repeat(F.lit("x"), 220))
        .alias("section_exc"),
        (e % 3 != 0).alias("section_ok"),
        F.when(e % 8 == 0, F.lit(None).cast("string"))
        .when(e % 8 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("dfs err "), (e % 4).cast("string")))
        .alias("section_error"))


SYNTH_SEO_REQ_SQL = """
    SELECT CAST(event_id AS BIGINT) AS req_id,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 7 = 1 THEN ''
                ELSE 's3cret' END AS expected_secret,
           CASE WHEN event_id % 5 = 0 THEN 'wrong'
                ELSE 's3cret' END AS header_secret,
           event_id % 4 <> 0 AS kind_whitelisted,
           event_id % 9 <> 0 AS method_exists,
           event_id % 11 = 0 AS params_type_error,
           'unexpected kw ' || CAST(event_id % 3 AS VARCHAR)
               AS type_error_msg,
           'kind' || CAST(event_id % 6 AS VARCHAR) AS kind,
           event_id % 13 = 0 AS section_raised,
           'boom ' || repeat('x', 220) AS section_exc,
           event_id % 3 <> 0 AS section_ok,
           CASE WHEN event_id % 8 = 0 THEN NULL
                WHEN event_id % 8 = 1 THEN ''
                ELSE 'dfs err ' || CAST(event_id % 4 AS VARCHAR) END
               AS section_error
    FROM events
"""


def seo_gate_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_SEO_REQ_SQL}),
        g AS (SELECT *,
                     expected_secret IS NOT NULL
                         AND expected_secret <> ''
                         AND header_secret = expected_secret
                         AS secret_ok
              FROM r)
        SELECT req_id,
               CAST(CASE WHEN NOT secret_ok THEN 401
                    WHEN NOT kind_whitelisted THEN 404
                    WHEN NOT method_exists THEN 404
                    WHEN params_type_error THEN 400
                    ELSE 200 END AS INT) AS status,
               CASE WHEN NOT secret_ok THEN 'bad cron secret'
                    WHEN NOT kind_whitelisted
                      THEN 'unknown endpoint kind: ' || kind
                    WHEN NOT method_exists
                      THEN 'client method missing: ' || kind
                    WHEN params_type_error
                      THEN 'bad params: ' || type_error_msg
               END AS detail,
               CASE WHEN section_raised
                      THEN substring(section_exc, 1, 200)
                    WHEN NOT section_ok THEN
                      CASE WHEN section_error IS NOT NULL
                                AND section_error <> ''
                           THEN section_error
                           ELSE 'unknown error' END
               END AS section_error_out,
               NOT section_raised AND section_ok AS section_emitted
        FROM g
    """
