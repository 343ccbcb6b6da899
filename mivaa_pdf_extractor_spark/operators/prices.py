"""Price-monitoring analytics: market stats, anomaly banding, volatility,
snapshots, W/W drop detection, and the brand→retailer index.

Re-expresses the reference's tracked-price stack as batch DataFrame plans:

- ``market_stats``       — app/api/price_monitoring_routes.py:664-706
  (``_compute_market_stats``: trimmed-median market summary per product)
- ``sanity_flags``       — app/modules/price_monitoring_notifications/
  service.py:153-218 (``check_sanity``: trailing-7d rolling-median band,
  min 3 samples, anomaly when price < 0.33× or > 3× the median)
- ``max_pct_change``     — app/services/integrations/
  tracked_queries_service.py:79-122 (``_max_pct_price_change``: volatility
  input for the refresh cadence)
- ``current_snapshot``   — tracked_queries_service.py:22-37
  (``_select_cheapest``: cheapest non-anomaly non-family hit, verified
  first — the denormalized ``current_*`` card)
- ``price_drops``        — service.py:330-… (``_detect_price_drops``:
  trailing-7d vs prior-7d median per retailer, fire at ≥ 10% drop)
- ``brand_retailer_index`` — tracked_queries_service.py:50-76
  (``_upsert_brand_retailer_index``: (brand, domain, country) hit counts)

The reference runs these per tracked query against Postgres, one id at a
time; here each is ONE whole-corpus plan keyed by the tracked-query id, so
a 10^9-row price-history table computes every product's stats in a single
shuffle on the group key. All medians are explicit sorted-array arithmetic
(never an engine ``median()``), so Spark and DuckDB agree bit-for-bit;
nothing sums floats across rows (only sort / pick / single-pair ratio
arithmetic, which is order-independent IEEE).

Documented deviations from the reference (each pinned in tests):
- modal currency ties break by lexicographically-smallest currency — the
  reference's ``max(set(...), key=count)`` is Python-set-iteration-order
  nondeterministic (price_monitoring_routes.py:696);
- ``_max_pct_price_change``'s ``limit(50)`` on prior history is a REST
  pagination artifact, not a semantic bound — the batch plan compares
  against ALL prior runs' latest per-URL price;
- per-(query,url) "latest" picks are tie-broken by event id, where the
  reference inherits Postgres result order;
- the drop alert's retailer display name is ``min(retailer_name)`` per
  domain, where the reference keeps the first row encountered in dict
  order (service.py:363-371).

Scale notes: every operator is groupBy/window on (query_id) or
(query_id, domain) — map-side-combinable aggregates plus one shuffle on
the natural key; the only collect_list gathers one product's price list,
bounded by hits-per-product (the same row-sized bound the reference's
in-memory ``List[PriceHit]`` imposes). No driver-side loops, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

SANITY_WINDOW_DAYS = 7     # service.py:54
SANITY_MIN_SAMPLES = 3     # service.py:55
SANITY_LOW_RATIO = 0.33    # service.py:56
SANITY_HIGH_RATIO = 3.0    # service.py:57
PRICE_DROP_THRESHOLD_PCT = 10.0  # service.py:60

# Volatility → refresh-cadence tiers. The reference delegates to a
# ``update_tracked_query_cadence`` SQL helper that is not in the repo
# (tracked_queries_service.py:929-934 passes max_pct to it); these tiers
# are OUR extension, chosen to mirror its described intent (volatile
# products refresh faster, stable ones back off), and are pinned by tests
# as our own contract.
CADENCE_TIERS = ((10.0, 6), (2.0, 24), (0.0, 48))  # (min_pct, hours)


def synth_price_history(events: DataFrame) -> DataFrame:
    """Deterministic price-history table derived from the ``events``
    testdata (the reference's ``tracked_query_price_history``,
    tracked_queries_service.py:838-879): 30 days of observations → one
    refresh run per (query, day). Every column is a pure expression of
    (event_id, user_id, ts, value), so the DuckDB oracle rebuilds the
    identical table; prices are ``value + 1.0`` (no rounding — exact IEEE
    in both engines). Nulls/zeros are seeded on small moduli so every
    guard branch in the consumers sees traffic."""
    e = F.col("event_id")
    rid = (e % 5).cast("string")
    price = (F.when(e % 11 == 0, None)
             .when(e % 17 == 0, F.lit(0.0))
             .otherwise(F.col("value") + 1.0))
    return events.select(
        (F.col("user_id") % 40).alias("query_id"),
        e.alias("event_id"),
        F.when(e % 13 == 0, None).otherwise(
            F.concat(F.lit("https://www.r"), rid, F.lit(".example.com/p/"),
                     (F.col("user_id") % 40).cast("string")))
        .alias("product_url"),
        F.concat(F.lit("Retailer "), rid).alias("retailer_name"),
        price.alias("price"),
        F.when(e % 6 == 0, price * 1.25).cast("double")
        .alias("original_price"),
        F.when(e % 6 < 3, F.lit("EUR")).when(e % 6 < 5, F.lit("USD"))
        .otherwise(F.lit(None)).alias("currency"),
        (e % 3 == 0).alias("verified"),
        F.when(e % 7 == 0, F.lit("family")).when(e % 7 == 1, F.lit("fuzzy"))
        .when(e % 7 == 2, F.lit(None)).otherwise(F.lit("exact"))
        .alias("match_kind"),
        F.when(e % 4 == 0, F.lit("out_of_stock"))
        .when(e % 4 == 1, F.lit(None)).otherwise(F.lit("in_stock"))
        .alias("availability"),
        F.concat(F.lit("B"), (F.col("user_id") % 8).cast("string"))
        .alias("brand"),
        F.when(F.col("user_id") % 3 == 0, F.lit("GR"))
        .when(F.col("user_id") % 3 == 1, F.lit("DE")).otherwise(F.lit("US"))
        .alias("country_code"),
        F.col("ts").alias("scraped_at"))


# DuckDB twin of synth_price_history — MUST stay in expression-lockstep
# with the Column derivations above (the contract oracles CTE this).
SYNTH_PRICE_HISTORY_SQL = """
    SELECT user_id % 40 AS query_id,
           event_id,
           CASE WHEN event_id % 13 = 0 THEN NULL
                ELSE 'https://www.r' || CAST(event_id % 5 AS VARCHAR)
                     || '.example.com/p/' || CAST(user_id % 40 AS VARCHAR)
           END AS product_url,
           'Retailer ' || CAST(event_id % 5 AS VARCHAR) AS retailer_name,
           CASE WHEN event_id % 11 = 0 THEN NULL
                WHEN event_id % 17 = 0 THEN 0.0
                ELSE value + 1.0 END AS price,
           CASE WHEN event_id % 6 = 0 THEN
                (CASE WHEN event_id % 11 = 0 THEN NULL
                      WHEN event_id % 17 = 0 THEN 0.0
                      ELSE value + 1.0 END) * 1.25
           END AS original_price,
           CASE WHEN event_id % 6 < 3 THEN 'EUR'
                WHEN event_id % 6 < 5 THEN 'USD' END AS currency,
           event_id % 3 = 0 AS verified,
           CASE WHEN event_id % 7 = 0 THEN 'family'
                WHEN event_id % 7 = 1 THEN 'fuzzy'
                WHEN event_id % 7 = 2 THEN NULL
                ELSE 'exact' END AS match_kind,
           CASE WHEN event_id % 4 = 0 THEN 'out_of_stock'
                WHEN event_id % 4 = 1 THEN NULL
                ELSE 'in_stock' END AS availability,
           'B' || CAST(user_id % 8 AS VARCHAR) AS brand,
           CASE WHEN user_id % 3 = 0 THEN 'GR'
                WHEN user_id % 3 = 1 THEN 'DE'
                ELSE 'US' END AS country_code,
           ts AS scraped_at
    FROM events
"""


def domain_of(url: Column) -> Column:
    """``_domain_of`` (tracked_queries_service.py:39-46): hostname of the
    URL, lowercased, leading ``www.`` stripped; NULL when not a URL."""
    host = F.lower(F.regexp_extract(F.trim(url), r"(?i)^https?://([^/]+)", 1))
    host = F.when(host == "", None).otherwise(host)
    return F.regexp_replace(host, r"^www\.", "")


def domain_of_sql(col: str) -> str:
    """DuckDB twin of ``domain_of`` over a column expression."""
    return ("regexp_replace(nullif(lower(regexp_extract(trim(" + col
            + "), '(?i)^https?://([^/]+)', 1)), ''), "
            + "'^www\\.', '')")


def _sorted_median(vals: str) -> str:
    """SQL expr: median of a sorted array<double> named ``vals`` —
    ``values[n//2]`` if odd else mean of the middle two
    (price_monitoring_routes.py:694, service.py:114-120). Explicit
    arithmetic so both engines interpolate identically."""
    mid1 = f"CAST(size({vals}) DIV 2 + 1 AS INT)"
    mid0 = f"CAST(size({vals}) DIV 2 AS INT)"
    return (f"CASE WHEN size({vals}) % 2 = 1 "
            f"THEN element_at({vals}, {mid1}) "
            f"ELSE (element_at({vals}, {mid0}) "
            f"      + element_at({vals}, {mid1})) / 2.0 END")


def _is_stat_hit() -> Column:
    """Stat-eligible hit (price_monitoring_routes.py:669-673): priced,
    match_kind None-or-'exact', and not out of stock. NULL availability
    passes (Python ``None != "out_of_stock"`` is True)."""
    return (F.col("price").isNotNull()
            & (F.col("match_kind").isNull() | (F.col("match_kind") == "exact"))
            & (F.col("availability").isNull()
               | (F.col("availability") != "out_of_stock")))


def market_stats(hits: DataFrame, query_col: str = "query_id") -> DataFrame:
    """Per-product market summary — ``_compute_market_stats``
    (price_monitoring_routes.py:664-706).

    Branches, in the reference's order: no priced hits → (count=all hits,
    verified=0, no stats); no stat-eligible hits → (count=priced,
    verified count, no stats); else trimmed-median stats: with ≥ 4 values
    a provisional median sets the [med/3, med×3] outlier band and the
    trim applies only if it keeps ≥ 1 value (lines 682-690)."""
    q = F.col(query_col)
    base = hits.withColumn("__stat", _is_stat_hit())
    agg = (base.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.count(F.col("price")).alias("n_priced"),
        F.count(F.when(F.col("price").isNotNull()
                       & F.col("verified"), 1)).alias("n_verified"),
        F.sort_array(F.collect_list(
            F.when(F.col("__stat"), F.col("price")))).alias("vals")))
    prov = _sorted_median("vals")
    agg = agg.withColumn("__trimmed", F.expr(
        f"CASE WHEN size(vals) >= 4 THEN "
        f"filter(vals, v -> v >= ({prov}) / 3.0 AND v <= ({prov}) * 3.0) "
        f"ELSE vals END"))
    agg = agg.withColumn("use_vals", F.expr(
        "IF(size(__trimmed) > 0, __trimmed, vals)"))
    med = _sorted_median("use_vals")

    # modal currency over stat hits (line 696); ties → smallest currency
    cur_counts = (base.filter(F.col("__stat") & F.col("currency").isNotNull())
                  .groupBy(query_col, "currency").count())
    w = Window.partitionBy(query_col).orderBy(
        F.col("count").desc(), F.col("currency").asc())
    modal = (cur_counts.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") == 1).select(query_col, "currency"))

    has_stat = F.size("vals") > 0
    out = (agg.join(modal, query_col, "left").select(
        q.alias(query_col),
        F.when(F.col("n_priced") == 0, F.col("n_hits"))
         .otherwise(F.col("n_priced")).alias("hit_count"),
        F.when(F.col("n_priced") == 0, F.lit(0))
         .otherwise(F.col("n_verified")).alias("verified_count"),
        F.when(has_stat, F.expr("element_at(use_vals, 1)"))
         .alias("min_price"),
        F.when(has_stat, F.expr("element_at(use_vals, -1)"))
         .alias("max_price"),
        F.when(has_stat, F.expr(med)).alias("median_price"),
        F.when(has_stat, F.col("currency")).alias("currency")))
    return out


def _with_run_day(history: DataFrame) -> DataFrame:
    """Refresh-run key: the reference groups rows by a uuid
    ``refresh_run_id`` stamped per refresh call
    (tracked_queries_service.py:837); the batch twin derives one run per
    (query, calendar day) of ``scraped_at`` — deterministic and
    monotone, which is all the latest-vs-prior comparisons need."""
    return history.withColumn(
        "__run_day",
        F.datediff(F.to_date("scraped_at"), F.lit("1970-01-01")))


def _anomaly_clean(df: DataFrame) -> Column:
    """``is_anomaly = false`` filter where the column exists; tables that
    predate sanity stamping are all-clean."""
    if "is_anomaly" in df.columns:
        return ~F.coalesce(F.col("is_anomaly"), F.lit(False))
    return F.lit(True)


def sanity_flags(history: DataFrame) -> DataFrame:
    """Rolling-median sanity band over the LATEST refresh run —
    ``check_sanity`` (service.py:153-218), re-shaped from per-row RPC to
    one windowed batch plan.

    For each latest-run row: trailing-``SANITY_WINDOW_DAYS`` history
    (strictly before the latest run, non-anomalous, match_kind != family,
    same retailer domain) yields a per-(query, domain) sample list; the
    verdict ladder is the reference's: unpriced/非positive → clean with
    0 samples; < 3 samples → 'insufficient_history'; median ≤ 0 →
    'zero_median'; ratio < 0.33 → 'too_low'; > 3.0 → 'too_high'; else
    clean. Reason strings become stable codes (the reference formats
    display sentences, service.py:206-213)."""
    # persist the stamped base: the latest-run and now aggregates plus
    # the history/current slices below each re-ran the stamp lineage
    from ..core.cache import track
    h = track(_with_run_day(history).withColumn(
        "__domain", domain_of(F.col("product_url"))))
    latest = h.groupBy("query_id").agg(
        F.max("__run_day").alias("__cur_day"))
    now = h.agg(F.max("scraped_at").alias("__now"))
    # latest is one row per tracked query: small today, unbounded at
    # corpus scale — no broadcast hint, AQE picks the strategy
    h = h.join(latest, "query_id").crossJoin(F.broadcast(now))

    hist = (h.filter(
        (F.col("__run_day") < F.col("__cur_day"))
        & (F.col("scraped_at")
           >= F.col("__now") - F.expr(f"INTERVAL {SANITY_WINDOW_DAYS} DAYS"))
        & _anomaly_clean(h)
        & (F.coalesce(F.lower(F.col("match_kind")), F.lit("")) != "family")
        & F.col("price").isNotNull() & F.col("__domain").isNotNull())
        .groupBy("query_id", "__domain")
        .agg(F.count(F.lit(1)).alias("samples"),
             F.sort_array(F.collect_list("price")).alias("vals")))
    hist = hist.withColumn("rolling_median", F.expr(_sorted_median("vals")))

    cur = h.filter(F.col("__run_day") == F.col("__cur_day"))
    joined = cur.join(hist, ["query_id", "__domain"], "left")
    samples = F.coalesce(F.col("samples"), F.lit(0))
    med = F.col("rolling_median")
    ratio = F.col("price") / med
    unpriced = (F.col("price").isNull() | (F.col("price") <= 0)
                | F.col("__domain").isNull())
    verdict = (F.when(unpriced, F.struct(
                   F.lit(False).alias("a"), F.lit(None).cast("double").alias("m"),
                   F.lit(0).alias("n"), F.lit(None).cast("string").alias("r")))
               .when(samples < SANITY_MIN_SAMPLES, F.struct(
                   F.lit(False).alias("a"), F.lit(None).cast("double").alias("m"),
                   samples.cast("int").alias("n"),
                   F.lit("insufficient_history").alias("r")))
               .when(med <= 0, F.struct(
                   F.lit(False).alias("a"), med.alias("m"),
                   samples.cast("int").alias("n"),
                   F.lit("zero_median").alias("r")))
               .when(ratio < SANITY_LOW_RATIO, F.struct(
                   F.lit(True).alias("a"), med.alias("m"),
                   samples.cast("int").alias("n"), F.lit("too_low").alias("r")))
               .when(ratio > SANITY_HIGH_RATIO, F.struct(
                   F.lit(True).alias("a"), med.alias("m"),
                   samples.cast("int").alias("n"), F.lit("too_high").alias("r")))
               .otherwise(F.struct(
                   F.lit(False).alias("a"), med.alias("m"),
                   samples.cast("int").alias("n"),
                   F.lit(None).cast("string").alias("r"))))
    return (joined.withColumn("__v", verdict).select(
        "query_id", "event_id",
        F.col("__domain").alias("retailer_domain"), "price",
        F.col("__v.a").alias("is_anomaly"),
        F.col("__v.m").alias("rolling_median"),
        F.col("__v.n").alias("history_samples"),
        F.col("__v.r").alias("reason")))


def max_pct_change(history: DataFrame) -> DataFrame:
    """Per-query volatility: largest |Δ%| between the latest run's price
    and the most recent prior price per URL — ``_max_pct_price_change``
    (tracked_queries_service.py:79-122) — plus OUR cadence-tier mapping
    (the reference's SQL helper is not in its repo; see CADENCE_TIERS).

    Latest-run rows drop family matches (and anomalies when stamped) and
    non-positive prices (lines 88-94); prior prices take each URL's most
    recent earlier reading (lines 110-114). Queries with no comparable
    pair volatility 0.0 (line 87/97)."""
    from ..core.cache import track
    h = track(_with_run_day(history))
    latest = h.groupBy("query_id").agg(F.max("__run_day").alias("__cur_day"))
    h = h.join(latest, "query_id")

    recent_w = (Window.partitionBy("query_id", "product_url")
                .orderBy(F.col("scraped_at").desc(), F.col("event_id").desc()))
    new_rows = (h.filter(
        (F.col("__run_day") == F.col("__cur_day")) & _anomaly_clean(h)
        & (F.coalesce(F.lower(F.col("match_kind")), F.lit("")) != "family")
        & F.col("product_url").isNotNull() & (F.col("price") > 0))
        .withColumn("__rn", F.row_number().over(recent_w))
        .filter(F.col("__rn") == 1)
        .select("query_id", "product_url", F.col("price").alias("new_price")))
    prior = (h.filter((F.col("__run_day") < F.col("__cur_day"))
                      & F.col("price").isNotNull())
             .withColumn("__rn", F.row_number().over(recent_w))
             .filter(F.col("__rn") == 1)
             .select("query_id", "product_url",
                     F.col("price").alias("old_price")))

    pct = (new_rows.join(prior, ["query_id", "product_url"])
           .filter(F.col("old_price") > 0)
           .withColumn("__pct", F.abs(F.col("new_price") - F.col("old_price"))
                       / F.col("old_price") * 100.0)
           .groupBy("query_id").agg(F.max("__pct").alias("max_pct_change")))
    out = (h.select("query_id").distinct()
           .join(pct, "query_id", "left")
           .withColumn("max_pct_change",
                       F.coalesce(F.col("max_pct_change"), F.lit(0.0))))
    cadence = F.when(F.col("max_pct_change") >= CADENCE_TIERS[0][0],
                     F.lit(CADENCE_TIERS[0][1]))
    for lo, hours in CADENCE_TIERS[1:]:
        cadence = cadence.when(F.col("max_pct_change") >= lo, F.lit(hours))
    return out.withColumn("refresh_interval_hours", cadence)


def current_snapshot(history: DataFrame) -> DataFrame:
    """Cheapest non-anomaly, non-family, priced hit of the latest run per
    query, verified hits first — ``_select_cheapest``
    (tracked_queries_service.py:22-37; sort key ``(not verified, price)``
    line 36) feeding the denormalized ``current_*`` snapshot
    (lines 901-930). Ties break on (product_url, event_id)."""
    h = _with_run_day(history)
    latest = h.groupBy("query_id").agg(F.max("__run_day").alias("__cur_day"))
    cand = (h.join(latest, "query_id")
            .filter((F.col("__run_day") == F.col("__cur_day"))
                    & F.col("price").isNotNull() & _anomaly_clean(h)
                    & (F.coalesce(F.lower(F.col("match_kind")), F.lit(""))
                       != "family")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("verified").desc(), F.col("price").asc(),
        F.col("product_url").asc(), F.col("event_id").asc())
    return (cand.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("query_id",
                    F.col("price").alias("current_price"),
                    F.col("currency").alias("current_currency"),
                    F.col("availability").alias("current_availability"),
                    F.col("original_price").alias("current_original_price"),
                    F.col("verified").alias("current_price_verified"),
                    "retailer_name", "product_url"))


def price_drops(history: DataFrame,
                threshold_pct: float = PRICE_DROP_THRESHOLD_PCT) -> DataFrame:
    """Week-over-week median drop per (query, retailer domain) —
    ``_detect_price_drops`` (service.py:330-…): trailing-7d median vs the
    prior-7d median over non-anomalous priced rows, alert when
    ``(prev - cur) / prev * 100 ≥ threshold``. 'Now' is the corpus max
    ``scraped_at`` (the reference uses wall clock)."""
    now = history.agg(F.max("scraped_at").alias("__now"))
    h = (history.crossJoin(F.broadcast(now))
         .withColumn("__domain", domain_of(F.col("product_url")))
         .filter(_anomaly_clean(history) & F.col("price").isNotNull()
                 & F.col("__domain").isNotNull()))
    cur_lo = F.col("__now") - F.expr("INTERVAL 7 DAYS")
    prev_lo = F.col("__now") - F.expr("INTERVAL 14 DAYS")
    cur = (h.filter(F.col("scraped_at") >= cur_lo)
           .groupBy("query_id", "__domain")
           .agg(F.sort_array(F.collect_list("price")).alias("vals"),
                F.min("retailer_name").alias("retailer_name"))
           .withColumn("current_median", F.expr(_sorted_median("vals"))))
    prev = (h.filter((F.col("scraped_at") >= prev_lo)
                     & (F.col("scraped_at") < cur_lo))
            .groupBy("query_id", "__domain")
            .agg(F.sort_array(F.collect_list("price")).alias("vals"))
            .withColumn("previous_median", F.expr(_sorted_median("vals"))))
    joined = (cur.join(prev.select("query_id", "__domain", "previous_median"),
                       ["query_id", "__domain"])
              .filter((F.col("previous_median") > 0)
                      & F.col("current_median").isNotNull()))
    return (joined.withColumn(
        "delta_pct",
        (F.col("previous_median") - F.col("current_median"))
        / F.col("previous_median") * 100.0)
        .filter(F.col("delta_pct") >= threshold_pct)
        .select("query_id", F.col("__domain").alias("retailer_domain"),
                F.coalesce(F.col("retailer_name"), F.col("__domain"))
                .alias("retailer_name"),
                "current_median", "previous_median", "delta_pct"))


def brand_retailer_index(history: DataFrame) -> DataFrame:
    """(brand, retailer_domain, country_code) → hit count, excluding
    family/mismatch rows — ``_upsert_brand_retailer_index``
    (tracked_queries_service.py:50-76). The reference upserts per refresh;
    the batch twin is the whole-corpus groupBy the upserts converge to."""
    h = history.withColumn("__domain", domain_of(F.col("product_url")))
    return (h.filter(
        (~F.coalesce(F.lower(F.col("match_kind")), F.lit(""))
         .isin("family", "mismatch"))
        & F.col("__domain").isNotNull())
        .groupBy(F.col("brand"), F.col("__domain").alias("retailer_domain"),
                 F.col("country_code"))
        .agg(F.count(F.lit(1)).alias("hit_count")))


# ---------------------------------------------------------------------------
# cross-source price merges
# (perplexity_price_search_service.py:1259-1406)


def merge_price_sources(phits: DataFrame, dhits: DataFrame) -> DataFrame:
    """``_merge_with_dataforseo``: every Perplexity hit survives
    (source defaults 'perplexity'); DataForSEO merchants dedupe
    first-wins on (lower retailer, lower title[:80]) — recorded
    BEFORE the overlap check, so later duplicates of a skipped
    merchant stay skipped (pinned) — and drop entirely when the
    retailer slug (spaces/dots removed) is a substring of any
    Perplexity domain; survivors take the Shopping-feed constants
    (price_unit 'piece', availability 'in_stock', the DataForSEO
    notes string).  Final order = price ascending, NULL last, stable
    (Perplexity rows before DataForSEO rows, each in input order).

    phits: (qid, ord, retailer_name, product_url, product_title,
    price, source); dhits: (qid, ord, retailer_name, product_title,
    product_url, price)."""
    p = phits.select(
        "qid", "ord", "retailer_name", "product_url", "product_title",
        "price", F.coalesce("source", F.lit("perplexity"))
        .alias("source"), F.lit(None).cast("string").alias("notes"),
        F.lit(1).alias("tier"))
    pdom = (phits.select("qid", domain_of(F.col("product_url"))
                         .alias("d")).where(F.col("d").isNotNull())
            .distinct())
    slug = F.regexp_replace(
        F.lower(F.trim(F.coalesce("retailer_name", F.lit("")))),
        "[ .]", "")
    dk = (dhits
          .withColumn("rk", F.lower(F.trim(F.coalesce(
              "retailer_name", F.lit("")))))
          .withColumn("tk", F.lower(F.trim(
              F.coalesce("product_title", F.lit("")).substr(1, 80))))
          .withColumn("slug", slug))
    first = (dk.groupBy("qid", "rk", "tk")
             .agg(F.min(F.struct("ord", "retailer_name",
                                 "product_title", "product_url",
                                 "price", "slug")).alias("w")))
    overl = (first.join(pdom, "qid")
             .where((F.col("w")["slug"] != "")
                    & F.regexp_replace(F.col("d"), "\\.", "")
                    .contains(F.col("w")["slug"]))
             .select("qid", "rk", "tk").distinct())
    kept = (first.join(overl, ["qid", "rk", "tk"], "left_anti")
            .select("qid", F.col("w")["ord"].alias("ord"),
                    F.col("w")["retailer_name"].alias("retailer_name"),
                    F.col("w")["product_url"].alias("product_url"),
                    F.col("w")["product_title"].alias("product_title"),
                    F.col("w")["price"].alias("price"),
                    F.lit("dataforseo").alias("source"),
                    F.lit("via Google Shopping (DataForSEO)")
                    .alias("notes"), F.lit(2).alias("tier")))
    u = p.unionByName(kept)
    from pyspark.sql import Window
    wr = Window.partitionBy("qid").orderBy(
        F.coalesce("price", F.lit(float("inf"))), "tier", "ord")
    return (u.withColumn("rank", F.row_number().over(wr))
            .select("qid", "rank", "source", "retailer_name",
                    "product_url", "product_title", "price", "notes"))


def merge_sources_sql() -> str:
    """DuckDB twin over CTEs phits_in, dhits_in."""
    dom = domain_of_sql("product_url")
    return f"""
    p AS (SELECT qid, ord, retailer_name, product_url, product_title,
                 price, coalesce(source, 'perplexity') AS source,
                 CAST(NULL AS VARCHAR) AS notes, 1 AS tier
          FROM phits_in),
    pdom AS (SELECT DISTINCT qid, {dom} AS d FROM phits_in
             WHERE {dom} IS NOT NULL),
    dk AS (SELECT *, lower(trim(coalesce(retailer_name, ''))) AS rk,
                  lower(trim(substring(coalesce(product_title, ''),
                                       1, 80))) AS tk,
                  regexp_replace(lower(trim(coalesce(retailer_name,
                      ''))), '[ .]', '', 'g') AS slug
           FROM dhits_in),
    first_d AS (SELECT qid, rk, tk,
                       min(struct_pack(ord := ord,
                           retailer_name := retailer_name,
                           product_title := product_title,
                           product_url := product_url,
                           price := price, slug := slug)) AS w
                FROM dk GROUP BY 1, 2, 3),
    overl AS (SELECT DISTINCT f.qid, f.rk, f.tk
              FROM first_d f JOIN pdom USING (qid)
              WHERE (f.w).slug <> ''
                AND contains(replace(pdom.d, '.', ''), (f.w).slug)),
    kept AS (SELECT f.qid, (f.w).ord AS ord,
                    (f.w).retailer_name AS retailer_name,
                    (f.w).product_url AS product_url,
                    (f.w).product_title AS product_title,
                    (f.w).price AS price, 'dataforseo' AS source,
                    'via Google Shopping (DataForSEO)' AS notes,
                    2 AS tier
             FROM first_d f
             WHERE NOT EXISTS (SELECT 1 FROM overl o
                 WHERE o.qid = f.qid AND o.rk = f.rk
                   AND o.tk = f.tk)),
    u AS (SELECT * FROM p UNION ALL SELECT * FROM kept)
    SELECT qid, CAST(row_number() OVER (PARTITION BY qid
               ORDER BY coalesce(price, CAST('inf' AS DOUBLE)),
                        tier, ord) AS INT) AS rank,
           source, retailer_name, product_url, product_title, price,
           notes
    FROM u"""


def price_discrepancies(phits: DataFrame, dhits: DataFrame,
                        threshold: float = 0.20) -> DataFrame:
    """The cross-source disagreement side-record: for each
    overlap-skipped merchant whose price and the matched Perplexity
    hit's price differ by more than the threshold, emit the
    discrepancy row.  The reference picks the overlap via SET
    iteration; the twin canonicalizes to the smallest matching
    domain, then the first (by ord) Perplexity hit on it."""
    pdom = (phits.select("qid", "ord", "price",
                         domain_of(F.col("product_url")).alias("d"))
            .where(F.col("d").isNotNull()))
    slug = F.regexp_replace(
        F.lower(F.trim(F.coalesce("retailer_name", F.lit("")))),
        "[ .]", "")
    dk = (dhits.withColumn("slug", slug)
          .withColumn("rk", F.lower(F.trim(F.coalesce(
              "retailer_name", F.lit("")))))
          .withColumn("tk", F.lower(F.trim(
              F.coalesce("product_title", F.lit("")).substr(1, 80)))))
    first = (dk.groupBy("qid", "rk", "tk")
             .agg(F.min(F.struct("ord", "retailer_name", "price",
                                 "slug")).alias("w")))
    j = (first.join(pdom, "qid")
         .where((F.col("w")["slug"] != "")
                & F.regexp_replace(F.col("d"), "\\.", "")
                .contains(F.col("w")["slug"])))
    best = (j.groupBy("qid", "rk", "tk")
            .agg(F.min(F.struct("d", "ord", F.col("price")
                                .alias("pprice"),
                                F.col("w").alias("w"))).alias("m")))
    m = F.col("m")
    delta = (F.abs(m["pprice"] - m["w"]["price"]) / m["pprice"])
    return (best
            .where(m["pprice"].isNotNull() & (m["pprice"] != 0)
                   & m["w"]["price"].isNotNull()
                   & (m["w"]["price"] != 0) & (delta > threshold))
            .select("qid", m["w"]["retailer_name"]
                    .alias("retailer_name"),
                    m["d"].alias("retailer_domain"),
                    m["pprice"].alias("perplexity_price"),
                    m["w"]["price"].alias("dataforseo_price"),
                    (F.floor(delta * 100 * 100 + 0.5) / 100)
                    .alias("delta_pct"),
                    F.lit("perplexity").alias("decided_source")))


def discrepancies_sql(threshold: float = 0.20) -> str:
    dom = domain_of_sql("product_url")
    return f"""
    pdom AS (SELECT qid, ord, price, {dom} AS d FROM phits_in
             WHERE {dom} IS NOT NULL),
    dk AS (SELECT *, lower(trim(coalesce(retailer_name, ''))) AS rk,
                  lower(trim(substring(coalesce(product_title, ''),
                                       1, 80))) AS tk,
                  regexp_replace(lower(trim(coalesce(retailer_name,
                      ''))), '[ .]', '', 'g') AS slug
           FROM dhits_in),
    first_d AS (SELECT qid, rk, tk,
                       min(struct_pack(ord := ord,
                           retailer_name := retailer_name,
                           price := price, slug := slug)) AS w
                FROM dk GROUP BY 1, 2, 3),
    j AS (SELECT f.qid, f.rk, f.tk,
                 min(struct_pack(d := p.d, ord := p.ord,
                     pprice := p.price, w := f.w)) AS m
          FROM first_d f JOIN pdom p USING (qid)
          WHERE (f.w).slug <> ''
            AND contains(replace(p.d, '.', ''), (f.w).slug)
          GROUP BY 1, 2, 3)
    SELECT qid, (m).w.retailer_name AS retailer_name,
           (m).d AS retailer_domain,
           (m).pprice AS perplexity_price,
           (m).w.price AS dataforseo_price,
           floor(abs((m).pprice - (m).w.price) / (m).pprice
                 * 100 * 100 + 0.5e0) / 100 AS delta_pct,
           'perplexity' AS decided_source
    FROM j
    WHERE (m).pprice IS NOT NULL AND (m).pprice <> 0
      AND (m).w.price IS NOT NULL AND (m).w.price <> 0
      AND abs((m).pprice - (m).w.price) / (m).pprice
          > CAST({threshold} AS DOUBLE)"""


def synth_phits(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = (events.select((e % 30).alias("qid"),
                          F.expr("(event_id div 30) % 4").cast("int")
                          .alias("ord")).distinct())
    q, o = F.col("qid"), F.col("ord")
    url = (F.when((q + o) % 5 == 0, F.concat(
        F.lit("https://www.youbath"), (q % 3).cast("string"),
        F.lit(".gr/product/a"), o.cast("string")))
        .when((q + o) % 5 == 1, F.concat(
            F.lit("http://casasolutions"), (q % 2).cast("string"),
            F.lit(".com/p/b")))
        .otherwise(F.concat(F.lit("https://shop"), q.cast("string"),
                            F.lit(".gr/item/"), o.cast("string"))))
    return (base.where(o < 1 + q % 3)
            .select("qid", "ord",
                    F.concat(F.lit("Retail "), q.cast("string"),
                             F.lit("-"), o.cast("string"))
                    .alias("retailer_name"), url.alias("product_url"),
                    F.concat(F.lit("Title "), o.cast("string"))
                    .alias("product_title"),
                    F.when((q + o) % 7 == 0,
                           F.lit(None).cast("double"))
                    .otherwise(((q * 3 + o * 5) % 40 + 8)
                               * F.lit(0.25)).alias("price"),
                    F.when(o % 2 == 0, "perplexity").alias("source")))


SYNTH_PHITS_SQL = """
SELECT qid, ord, 'Retail ' || qid || '-' || ord AS retailer_name,
       CASE WHEN (qid + ord) % 5 = 0
                THEN 'https://www.youbath' || (qid % 3)
                     || '.gr/product/a' || ord
            WHEN (qid + ord) % 5 = 1
                THEN 'http://casasolutions' || (qid % 2) || '.com/p/b'
            ELSE 'https://shop' || qid || '.gr/item/' || ord END
           AS product_url,
       'Title ' || ord AS product_title,
       CASE WHEN (qid + ord) % 7 = 0 THEN NULL
            ELSE ((qid * 3 + ord * 5) % 40 + 8) * CAST(0.25 AS DOUBLE)
       END AS price,
       CASE WHEN ord % 2 = 0 THEN 'perplexity' END AS source
FROM (SELECT DISTINCT event_id % 30 AS qid,
             CAST((event_id // 30) % 4 AS INT) AS ord FROM events)
WHERE ord < 1 + qid % 3"""


def synth_dhits(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = (events.select((e % 30).alias("qid"),
                          F.expr("(event_id div 30) % 5").cast("int")
                          .alias("ord")).distinct())
    q, o = F.col("qid"), F.col("ord")
    retailer = (F.when(o == 0, F.concat(
        F.lit("You Bath"), (q % 3).cast("string")))  # slug overlap
        .when(o == 1, F.concat(F.lit("Casa.Solutions"),
                               (q % 2).cast("string")))
        .otherwise(F.concat(F.lit("Merchant "), o.cast("string"))))
    title = (F.when(o == 4, "Title dup")  # dedup fodder with o == 3
             .when(o == 3, "Title dup")
             .otherwise(F.concat(F.lit("Feed title "),
                                 o.cast("string"))))
    return (base.where(o < 2 + q % 3)
            .select("qid", "ord", retailer.alias("retailer_name"),
                    title.alias("product_title"),
                    F.concat(F.lit("https://google.gr/search?q="),
                             q.cast("string")).alias("product_url"),
                    F.when((q + o) % 6 == 5,
                           F.lit(None).cast("double"))
                    .otherwise(((q * 7 + o * 3) % 40 + 6)
                               * F.lit(0.25)).alias("price")))


SYNTH_DHITS_SQL = """
SELECT qid, ord,
       CASE WHEN ord = 0 THEN 'You Bath' || (qid % 3)
            WHEN ord = 1 THEN 'Casa.Solutions' || (qid % 2)
            ELSE 'Merchant ' || ord END AS retailer_name,
       CASE WHEN ord = 4 THEN 'Title dup'
            WHEN ord = 3 THEN 'Title dup'
            ELSE 'Feed title ' || ord END AS product_title,
       'https://google.gr/search?q=' || qid AS product_url,
       CASE WHEN (qid + ord) % 6 = 5 THEN NULL
            ELSE ((qid * 7 + ord * 3) % 40 + 6) * CAST(0.25 AS DOUBLE)
       END AS price
FROM (SELECT DISTINCT event_id % 30 AS qid,
             CAST((event_id // 30) % 5 AS INT) AS ord FROM events)
WHERE ord < 2 + qid % 3"""


def merge_greek_hits(existing: DataFrame, greek: DataFrame) -> DataFrame:
    """``_merge_with_greek_marketplaces``: existing rows key by
    stripped URL with LAST-wins overwrite that KEEPS the first
    occurrence's position (dict semantics — pinned); rows whose
    domain the greek pass covered are dropped; greek rows add
    FIRST-wins per URL after the existing block; final stable
    price-asc order, NULLs last.

    existing: (qid, ord, product_url, price, source); greek:
    (qid, ord, product_url, price, source)."""
    ex = existing.withColumn("k", F.trim(F.coalesce("product_url",
                                                    F.lit(""))))
    exk = ex.where(F.col("k") != "")
    # dict overwrite: LAST value, FIRST position
    byurl = (exk.groupBy("qid", "k")
             .agg(F.max(F.struct("ord", "price", "source",
                                 F.col("product_url").alias("u")))
                  .alias("last"),
                  F.min("ord").alias("pos")))
    gdom = (greek.where(F.col("product_url").isNotNull())
            .select("qid", domain_of(F.col("product_url")).alias("d"))
            .where(F.col("d").isNotNull()).distinct())
    # persist: kept feeds both the greek-append anti-join and the
    # existing-block output — unpersisted, the URL-dict aggregation +
    # domain anti-join ran twice
    from ..core.cache import track
    kept = track(byurl.withColumn("d", domain_of(F.col("last")["u"]))
                 .join(gdom, ["qid", "d"], "left_anti"))
    gk = greek.withColumn("k", F.trim(F.coalesce("product_url",
                                                 F.lit(""))))
    gfirst = (gk.where(F.col("k") != "")
              .groupBy("qid", "k")
              .agg(F.min(F.struct("ord", "price", "source",
                                  F.col("product_url").alias("u")))
                   .alias("g")))
    gnew = (gfirst.join(kept.select("qid", "k"), ["qid", "k"],
                        "left_anti")
            .select("qid", "k", F.col("g")["u"].alias("product_url"),
                    F.col("g")["price"].alias("price"),
                    F.col("g")["source"].alias("source"),
                    (F.col("g")["ord"] + 1000000).alias("pos")))
    exout = kept.select("qid", "k",
                        F.col("last")["u"].alias("product_url"),
                        F.col("last")["price"].alias("price"),
                        F.col("last")["source"].alias("source"),
                        "pos")
    u = exout.unionByName(gnew)
    from pyspark.sql import Window
    wr = Window.partitionBy("qid").orderBy(
        F.coalesce("price", F.lit(float("inf"))), "pos")
    return (u.withColumn("rank", F.row_number().over(wr))
            .select("qid", "rank", "product_url", "price", "source"))


def merge_greek_sql() -> str:
    dom_u = domain_of_sql("(last).u")
    dom_g = domain_of_sql("product_url")
    return f"""
    ex AS (SELECT *, trim(coalesce(product_url, '')) AS k
           FROM existing_in),
    byurl AS (SELECT qid, k,
                     max(struct_pack(ord := ord, price := price,
                         source := source, u := product_url)) AS last,
                     min(ord) AS pos
              FROM ex WHERE k <> '' GROUP BY 1, 2),
    gdom AS (SELECT DISTINCT qid, {dom_g} AS d FROM greek_in
             WHERE product_url IS NOT NULL AND {dom_g} IS NOT NULL),
    kept AS (SELECT b.* FROM byurl b
             WHERE NOT EXISTS (SELECT 1 FROM gdom g
                 WHERE g.qid = b.qid AND g.d = {dom_u})),
    gfirst AS (SELECT qid, trim(coalesce(product_url, '')) AS k,
                      min(struct_pack(ord := ord, price := price,
                          source := source, u := product_url)) AS g
               FROM greek_in WHERE trim(coalesce(product_url, ''))
                   <> ''
               GROUP BY 1, 2),
    gnew AS (SELECT f.qid, f.k, (f.g).u AS product_url,
                    (f.g).price AS price, (f.g).source AS source,
                    (f.g).ord + 1000000 AS pos
             FROM gfirst f
             WHERE NOT EXISTS (SELECT 1 FROM kept x
                 WHERE x.qid = f.qid AND x.k = f.k)),
    u AS (SELECT qid, k, (last).u AS product_url,
                 (last).price AS price, (last).source AS source, pos
          FROM kept
          UNION ALL SELECT * FROM gnew)
    SELECT qid, CAST(row_number() OVER (PARTITION BY qid
               ORDER BY coalesce(price, CAST('inf' AS DOUBLE)), pos)
               AS INT) AS rank,
           product_url, price, source
    FROM u"""


def synth_greek_existing(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = (events.select((e % 25).alias("qid"),
                          F.expr("(event_id div 25) % 4").cast("int")
                          .alias("ord")).distinct())
    q, o = F.col("qid"), F.col("ord")
    url = (F.when(o == 3, F.concat(  # duplicate URL of ord 0
        F.lit("https://alpha"), (q % 3).cast("string"),
        F.lit(".gr/p1")))
        .when(o == 0, F.concat(F.lit("https://alpha"),
                               (q % 3).cast("string"), F.lit(".gr/p1")))
        .when(o == 1, F.concat(F.lit("https://beta"),
                               (q % 2).cast("string"),
                               F.lit(".gr/p2")))
        .otherwise(F.concat(F.lit("https://gamma"), q.cast("string"),
                            F.lit(".com/p3"))))
    return (base.where(o < 2 + q % 3)
            .select("qid", "ord", url.alias("product_url"),
                    F.when((q + o) % 6 == 4, F.lit(None)
                           .cast("double"))
                    .otherwise(((q * 5 + o * 7) % 30 + 4)
                               * F.lit(0.5)).alias("price"),
                    F.lit("perplexity_web_search").alias("source")))


SYNTH_GREEK_EXISTING_SQL = """
SELECT qid, ord,
       CASE WHEN ord = 3 OR ord = 0
                THEN 'https://alpha' || (qid % 3) || '.gr/p1'
            WHEN ord = 1 THEN 'https://beta' || (qid % 2) || '.gr/p2'
            ELSE 'https://gamma' || qid || '.com/p3' END
           AS product_url,
       CASE WHEN (qid + ord) % 6 = 4 THEN NULL
            ELSE ((qid * 5 + ord * 7) % 30 + 4) * CAST(0.5 AS DOUBLE)
       END AS price,
       'perplexity_web_search' AS source
FROM (SELECT DISTINCT event_id % 25 AS qid,
             CAST((event_id // 25) % 4 AS INT) AS ord FROM events)
WHERE ord < 2 + qid % 3"""


def synth_greek_hits(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = (events.select((e % 25).alias("qid"),
                          F.expr("(event_id div 25) % 3").cast("int")
                          .alias("ord")).distinct())
    q, o = F.col("qid"), F.col("ord")
    url = (F.when(o == 0, F.concat(  # same domain as existing beta
        F.lit("https://beta"), (q % 2).cast("string"),
        F.lit(".gr/shop/a")))
        .when(o == 1, F.concat(F.lit("https://beta"),
                               (q % 2).cast("string"),
                               F.lit(".gr/shop/b")))
        .otherwise(F.concat(F.lit("https://delta"), q.cast("string"),
                            F.lit(".gr/x"))))
    return (base.where((q % 4 != 0) & (o < 1 + q % 3))
            .select("qid", "ord", url.alias("product_url"),
                    (((q * 11 + o) % 28 + 3) * F.lit(0.5))
                    .alias("price"),
                    F.when(o % 2 == 0, "skroutz").otherwise("bestprice")
                    .alias("source")))


SYNTH_GREEK_HITS_SQL = """
SELECT qid, ord,
       CASE WHEN ord = 0
                THEN 'https://beta' || (qid % 2) || '.gr/shop/a'
            WHEN ord = 1
                THEN 'https://beta' || (qid % 2) || '.gr/shop/b'
            ELSE 'https://delta' || qid || '.gr/x' END AS product_url,
       ((qid * 11 + ord) % 28 + 3) * CAST(0.5 AS DOUBLE) AS price,
       CASE WHEN ord % 2 = 0 THEN 'skroutz' ELSE 'bestprice' END
           AS source
FROM (SELECT DISTINCT event_id % 25 AS qid,
             CAST((event_id // 25) % 3 AS INT) AS ord FROM events)
WHERE qid % 4 <> 0 AND ord < 1 + qid % 3"""


SOURCE_LABELS = {
    "firecrawl": "firecrawl_url",
    "dataforseo": "dataforseo_shopping",
    "skroutz": "marketplace_skroutz",
    "bestprice": "marketplace_bestprice",
    "shopflix": "marketplace_shopflix",
    "idealo": "idealo",
}


def map_source_labels(hits: DataFrame) -> DataFrame:
    """``_map_source_label`` (tracked_queries_service.py:125-144):
    lowercase exact match into the persisted enum, everything else
    (including NULL/empty) falls back to perplexity_web_search so the
    row never fails the enum constraint.  hits: (hit_id, source)."""
    s = F.lower(F.coalesce("source", F.lit("")))
    lab = F.lit("perplexity_web_search")
    for k, v in reversed(list(SOURCE_LABELS.items())):
        lab = F.when(s == k, v).otherwise(lab)
    return hits.select("hit_id", lab.alias("source_label"))


def source_labels_sql() -> str:
    whens = " ".join(f"WHEN '{k}' THEN '{v}'"
                     for k, v in SOURCE_LABELS.items())
    return f"""
    SELECT hit_id, CASE lower(coalesce(source, '')) {whens}
           ELSE 'perplexity_web_search' END AS source_label
    FROM hits_in"""


def synth_source_hits(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    src = (F.when(e % 9 == 0, "Firecrawl").when(e % 9 == 1, "dataforseo")
           .when(e % 9 == 2, "SKROUTZ").when(e % 9 == 3, "bestprice")
           .when(e % 9 == 4, "shopflix").when(e % 9 == 5, "idealo")
           .when(e % 9 == 6, "unknown-source")
           .when(e % 9 == 7, F.lit(None).cast("string"))
           .otherwise(""))
    return events.select(e.alias("hit_id"), src.alias("source"))


SYNTH_SOURCE_HITS_SQL = """
SELECT event_id AS hit_id,
       CASE WHEN event_id % 9 = 0 THEN 'Firecrawl'
            WHEN event_id % 9 = 1 THEN 'dataforseo'
            WHEN event_id % 9 = 2 THEN 'SKROUTZ'
            WHEN event_id % 9 = 3 THEN 'bestprice'
            WHEN event_id % 9 = 4 THEN 'shopflix'
            WHEN event_id % 9 = 5 THEN 'idealo'
            WHEN event_id % 9 = 6 THEN 'unknown-source'
            WHEN event_id % 9 = 7 THEN NULL
            ELSE '' END AS source
FROM events"""


# ---------------------------------------------------------------------------
# Tracked-query route shaping (app/api/tracked_queries_routes.py:195-300)
# ---------------------------------------------------------------------------

def tracked_query_response(rows: "DataFrame") -> "DataFrame":
    """_to_response defaults (:207-231) mix THREE conventions (pin):

    - LIVE ors: refresh_interval int(x or 24) — an explicit 0 falls
      to 24; total_credits or 0; search_query or '';
    - .get(k, default) ABSENT-key defaults for verify_prices /
      is_active (default True) — but bool() wraps them, so a
      present-NULL folds FALSE (absent True / present-NULL False);
    - `or False` alert booleans — absent, NULL and False collapse.
    """
    from pyspark.sql import functions as F

    def live_or(col, default):
        return F.when(col.isNotNull() & (col != 0), col) \
            .otherwise(F.lit(default))

    return rows.select(
        "row_id",
        F.coalesce(F.when(F.col("search_query") != "",
                          F.col("search_query")), F.lit(""))
        .alias("search_query_out"),
        live_or(F.col("refresh_interval_hours"), 24).cast("int")
        .alias("refresh_interval_out"),
        F.coalesce(F.col("total_credits_used"), F.lit(0))
        .cast("int").alias("total_credits_out"),
        (F.when(F.col("has_verify_prices"),
                F.coalesce(F.col("verify_prices"), F.lit(False)))
         .otherwise(F.lit(True))).alias("verify_prices_out"),
        (F.when(F.col("has_is_active"),
                F.coalesce(F.col("is_active"), F.lit(False)))
         .otherwise(F.lit(True))).alias("is_active_out"),
        F.coalesce(F.col("alert_on_price_drop"), F.lit(False))
        .alias("alert_on_price_drop_out"))


def track_credit_outcome(runs: "DataFrame") -> "DataFrame":
    """Create-route credit ladder (:251-296): failed debit -> 402; a
    create exception refunds; a created row with last_error OR no
    last_refreshed_at refunds (no usable data) — but a SUCCESSFUL
    refresh with zero retailers KEEPS the credit (the upstream calls
    ran — pin)."""
    from pyspark.sql import functions as F
    billed = F.col("has_user")
    debit_fail = billed & ~F.col("debit_ok")
    refunded = (billed & ~debit_fail
                & (F.col("create_raised")
                   | F.col("last_error").isNotNull()
                   | ~F.col("has_last_refreshed")))
    return runs.select(
        "row_id",
        F.when(debit_fail, 402)
        .when(F.col("create_raised"), 500).otherwise(201).cast("int")
        .alias("status"),
        refunded.alias("refunded"),
        # zero retailers with a clean refresh keeps the credit (pin)
        (billed & ~debit_fail & ~refunded).alias("credit_kept"))


def synth_tq_rows(events: "DataFrame") -> "DataFrame":
    from pyspark.sql import functions as F
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("row_id"),
        F.when(e % 5 == 0, F.lit(None).cast("string"))
        .when(e % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("oak flooring "),
                            (e % 9).cast("string")))
        .alias("search_query"),
        F.when(e % 4 == 0, F.lit(None).cast("int"))
        .when(e % 4 == 1, F.lit(0)).otherwise((e % 96).cast("int"))
        .alias("refresh_interval_hours"),
        F.when(e % 6 == 0, F.lit(None).cast("int"))
        .otherwise((e % 40).cast("int")).alias("total_credits_used"),
        (e % 3 != 0).alias("has_verify_prices"),
        F.when(e % 7 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 2 == 0).alias("verify_prices"),
        (e % 4 != 1).alias("has_is_active"),
        F.when(e % 8 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 2 == 1).alias("is_active"),
        F.when(e % 9 == 0, F.lit(None).cast("boolean"))
        .otherwise(e % 3 == 0).alias("alert_on_price_drop"))


SYNTH_TQ_ROWS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS row_id,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'oak flooring ' || CAST(event_id % 9 AS VARCHAR)
           END AS search_query,
           CAST(CASE WHEN event_id % 4 = 0 THEN NULL
                WHEN event_id % 4 = 1 THEN 0
                ELSE event_id % 96 END AS INT)
               AS refresh_interval_hours,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE CAST(event_id % 40 AS INT) END
               AS total_credits_used,
           event_id % 3 <> 0 AS has_verify_prices,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE event_id % 2 = 0 END AS verify_prices,
           event_id % 4 <> 1 AS has_is_active,
           CASE WHEN event_id % 8 = 0 THEN NULL
                ELSE event_id % 2 = 1 END AS is_active,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE event_id % 3 = 0 END AS alert_on_price_drop
    FROM events
"""


def tq_response_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_TQ_ROWS_SQL})
        SELECT row_id,
               CASE WHEN search_query IS NOT NULL
                         AND search_query <> '' THEN search_query
                    ELSE '' END AS search_query_out,
               CAST(CASE WHEN refresh_interval_hours IS NOT NULL
                         AND refresh_interval_hours <> 0
                    THEN refresh_interval_hours ELSE 24 END AS INT)
                   AS refresh_interval_out,
               CAST(coalesce(total_credits_used, 0) AS INT)
                   AS total_credits_out,
               CASE WHEN has_verify_prices
                    THEN coalesce(verify_prices, FALSE)
                    ELSE TRUE END AS verify_prices_out,
               CASE WHEN has_is_active
                    THEN coalesce(is_active, FALSE)
                    ELSE TRUE END AS is_active_out,
               coalesce(alert_on_price_drop, FALSE)
                   AS alert_on_price_drop_out
        FROM r
    """


def synth_track_runs(events: "DataFrame") -> "DataFrame":
    from pyspark.sql import functions as F
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("row_id"),
        (e % 7 != 0).alias("has_user"),
        (e % 4 != 0).alias("debit_ok"),
        (e % 9 == 0).alias("create_raised"),
        F.when(e % 5 == 0, F.concat(F.lit("perplexity timeout "),
                                    (e % 3).cast("string")))
        .otherwise(F.lit(None).cast("string")).alias("last_error"),
        (e % 3 != 0).alias("has_last_refreshed"))


SYNTH_TRACK_RUNS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS row_id,
           event_id % 7 <> 0 AS has_user,
           event_id % 4 <> 0 AS debit_ok,
           event_id % 9 = 0 AS create_raised,
           CASE WHEN event_id % 5 = 0
                THEN 'perplexity timeout '
                     || CAST(event_id % 3 AS VARCHAR) END
               AS last_error,
           event_id % 3 <> 0 AS has_last_refreshed
    FROM events
"""


def track_outcome_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_TRACK_RUNS_SQL}),
        g AS (
          SELECT *, has_user AND NOT debit_ok AS debit_fail
          FROM r),
        h AS (
          SELECT *, has_user AND NOT debit_fail
                    AND (create_raised OR last_error IS NOT NULL
                         OR NOT has_last_refreshed) AS refunded
          FROM g)
        SELECT row_id,
               CAST(CASE WHEN debit_fail THEN 402
                    WHEN create_raised THEN 500
                    ELSE 201 END AS INT) AS status,
               refunded,
               has_user AND NOT debit_fail AND NOT refunded
                   AS credit_kept
        FROM h
    """
