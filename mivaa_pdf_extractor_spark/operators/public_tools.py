"""Public-tools quota / cache / scan-ladder folds.

Reference: ``app/api/public_tools_routes.py`` and
``app/services/integrations/public_lookup_service.py`` —

- ``normalize_query`` (public_lookup_service.py:39-44): lower +
  whitespace-collapse + strip; ``query_hash`` (:47-50) =
  sha1("{scan_type}|{norm}|{COUNTRY}") with country upper'd,
  None → ''.  DuckDB has no sha1, so the contract query carries the
  normalized prehash plus a sha256 stand-in column computed on BOTH
  sides; the true sha1 is pinned by pytest against hashlib.
- ``check_quota`` (:53-109): counts ONLY outcome='success' log rows
  in the last 24 h, keyed on user_id else ip; NO identity → treated
  as exhausted with used=limit and reset_at = (now-24h)+24h = now
  (pinned); reset_at = oldest in-window SUCCESS + 24 h, else
  now + 24 h; remaining = max(0, 2 - used).
- ``_compute_stats`` (public_tools_routes.py:308-324): over PRICED
  hits only — count, verified_count (among priced), min/max, median
  = upper-middle for odd n / mean of middles for even, modal
  currency among truthy currencies.  The reference's
  ``max(set(c), key=c.count)`` tie-break is hash-randomized; the
  fold CANONICALIZES ties to the smallest currency (documented
  divergence — values pinned, tie order not).
- ``price_scan`` outcome ladder (:352-547): captcha_failed(400) →
  auth insufficient-credits 402 / anon quota 429 → cache-hit success
  (no debit, from_cache) → debit-failed 402 (debit runs BEFORE the
  upstream call, pentest H4/H5) → upstream exception 502 refund →
  result-not-success returns HTTP 200 with success=False AND refunds
  AND resets balance_after to balance_before (pinned asymmetry vs
  the 502 arm) → success keeps the up-front debit.  query_text =
  name.strip(), manufacturer prepended only when its lowercase is
  not a SUBSTRING of the stripped name (pinned), dimensions
  appended; computed only on the fresh-scan arms.  credits_per_scan
  in the quota payload = cost when authenticated else 0
  (:288-305); per-type cost price/mention=2, product=1 (:52-62).

Scale: quota is one groupBy over the success rows of a log table
(24 h predicate pushed to the scan); everything else is map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

ANONYMOUS_DAILY_QUOTA = 2
SCAN_CREDIT_COST = 2
PRODUCT_SCAN_CREDIT_COST = 1
SCAN_COST_BY_TYPE = {"price": SCAN_CREDIT_COST,
                     "mention": SCAN_CREDIT_COST,
                     "product": PRODUCT_SCAN_CREDIT_COST}
DAY_S = 24 * 3600


def normalize_query_col(c: F.Column) -> F.Column:
    """lower + collapse whitespace + strip ('' for NULL)."""
    return F.when(
        c.isNull() | (c == ""), F.lit("")).otherwise(
        F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))


def query_hash_cols(scan_type: F.Column, query: F.Column,
                    country: F.Column) -> tuple[F.Column, F.Column]:
    """(prehash string, sha1 hex) for cache keys + log dedupe."""
    pre = F.concat_ws("|", scan_type, normalize_query_col(query),
                      F.upper(F.coalesce(country, F.lit(""))))
    return pre, F.sha1(pre)


def query_hashes(df: DataFrame) -> DataFrame:
    """Columns in: (doc, scan_type, query, country)."""
    pre, h = query_hash_cols(F.col("scan_type"), F.col("query"),
                             F.col("country"))
    return df.select(
        "doc", "scan_type",
        normalize_query_col(F.col("query")).alias("norm_query"),
        pre.alias("prehash"), h.alias("qhash_sha1"),
        F.sha2(pre, 256).alias("qhash_sha256"))


def check_quota(log: DataFrame, requests: DataFrame,
                now_s: int) -> DataFrame:
    """``log``: (key, created_at_s, outcome); ``requests``:
    (doc, key nullable).  One QuotaStatus row per request."""
    since = now_s - DAY_S
    per_key = (log
               .where((F.col("outcome") == "success")
                      & (F.col("created_at_s") >= since))
               .groupBy("key")
               .agg(F.count("*").alias("used"),
                    F.min("created_at_s").alias("oldest_s")))
    j = requests.join(per_key, "key", "left")
    used = F.when(F.col("key").isNull(),
                  F.lit(ANONYMOUS_DAILY_QUOTA)) \
        .otherwise(F.coalesce(F.col("used"), F.lit(0)))
    remaining = F.greatest(F.lit(0),
                           F.lit(ANONYMOUS_DAILY_QUOTA) - used)
    reset_at = (F.when(F.col("key").isNull(), F.lit(now_s))
                .when(F.col("oldest_s").isNotNull(),
                      F.col("oldest_s") + DAY_S)
                .otherwise(F.lit(now_s + DAY_S)))
    return j.select(
        "doc", "key",
        used.cast("int").alias("used"),
        F.lit(ANONYMOUS_DAILY_QUOTA).alias("limit"),
        remaining.cast("int").alias("remaining"),
        (remaining > 0).alias("allowed"),
        reset_at.cast("long").alias("reset_at_s"))


def market_stats(hits: DataFrame) -> DataFrame:
    """``hits``: (query_id, price double?, currency string?,
    verified boolean)."""
    priced = F.col("price").isNotNull()
    by_cur = (hits.where(priced & F.col("currency").isNotNull()
                         & (F.col("currency") != ""))
              .groupBy("query_id", "currency").count())
    w = Window.partitionBy("query_id").orderBy(
        F.col("count").desc(), F.col("currency"))
    modal = (by_cur.withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") == 1)
             .select("query_id", F.col("currency").alias("currency")))
    agg = hits.groupBy("query_id").agg(
        F.sort_array(F.collect_list(F.when(priced, F.col("price"))))
        .alias("_vals"),
        F.count(F.when(priced & F.col("verified"), F.lit(1)))
        .alias("_verified"))
    n = F.size(F.col("_vals"))
    mid = F.element_at(F.col("_vals"), (n / 2 + 1).cast("int"))
    lo_mid = F.element_at(F.col("_vals"), (n / 2).cast("int"))
    median = F.when(n % 2 == 1, mid).otherwise((lo_mid + mid) / 2)
    out = agg.select(
        "query_id",
        n.alias("count"),
        F.when(n > 0, F.col("_verified")).otherwise(F.lit(0))
        .cast("long").alias("verified_count"),
        F.when(n > 0, F.element_at(F.col("_vals"), 1)).alias("min"),
        F.when(n > 0, F.element_at(F.col("_vals"), -1)).alias("max"),
        F.when(n > 0, median).alias("median"))
    return (out.join(modal, "query_id", "left")
            .select("query_id", "count", "verified_count", "min",
                    "max", "median",
                    F.when(F.col("count") > 0, F.col("currency"))
                    .alias("currency")))


def price_scan_ladder(reqs: DataFrame) -> DataFrame:
    """``reqs``: (doc, is_auth, captcha_ok, quota_allowed,
    balance_before int?, cache_hit, debit_ok, upstream_error,
    scan_success, credits_used int?, product_name, manufacturer,
    dimensions, country)."""
    auth = F.col("is_auth")
    bal = F.coalesce(F.col("balance_before"), F.lit(0))
    name_stripped = F.trim(F.col("product_name"))
    has_mfr = F.col("manufacturer").isNotNull() \
        & (F.col("manufacturer") != "")
    mfr_missing = has_mfr & ~F.contains(
        F.lower(name_stripped), F.lower(F.col("manufacturer")))
    qt1 = F.when(mfr_missing,
                 F.trim(F.concat_ws(" ", F.col("manufacturer"),
                                    name_stripped))) \
        .otherwise(name_stripped)
    has_dims = F.col("dimensions").isNotNull() \
        & (F.col("dimensions") != "")
    query_text = F.when(has_dims,
                        F.trim(F.concat_ws(" ", qt1,
                                           F.col("dimensions")))) \
        .otherwise(qt1)

    outcome = (
        F.when(~F.col("captcha_ok"), F.lit("captcha_failed"))
        .when(auth & (bal < SCAN_CREDIT_COST), F.lit("rate_limited"))
        .when(~auth & ~F.col("quota_allowed"), F.lit("rate_limited"))
        .when(F.col("cache_hit"), F.lit("success"))
        .when(auth & ~F.col("debit_ok"), F.lit("rate_limited"))
        .when(F.col("upstream_error"), F.lit("failed"))
        .when(~F.col("scan_success"), F.lit("failed"))
        .otherwise(F.lit("success")))
    http_status = (
        F.when(~F.col("captcha_ok"), F.lit(400))
        .when(auth & (bal < SCAN_CREDIT_COST), F.lit(402))
        .when(~auth & ~F.col("quota_allowed"), F.lit(429))
        .when(F.col("cache_hit"), F.lit(200))
        .when(auth & ~F.col("debit_ok"), F.lit(402))
        .when(F.col("upstream_error"), F.lit(502))
        .otherwise(F.lit(200)))
    # fresh-scan arms are the only ones that compute query_text
    reaches_scan = (F.col("captcha_ok")
                    & ~(auth & (bal < SCAN_CREDIT_COST))
                    & ~(~auth & ~F.col("quota_allowed"))
                    & ~F.col("cache_hit")
                    & ~(auth & ~F.col("debit_ok")))
    debited = auth & reaches_scan
    refunded = debited & (F.col("upstream_error")
                          | ~F.col("scan_success"))
    # the not-success arm resets balance_after to balance_before; the
    # success arm keeps the up-front debit
    balance_after = (
        F.when(~auth, F.lit(None).cast("int"))
        .when(debited & ~refunded
              & F.col("scan_success") & ~F.col("upstream_error"),
              F.col("balance_before") - SCAN_CREDIT_COST)
        .otherwise(F.col("balance_before")))
    cache_served = (F.col("cache_hit") & F.col("captcha_ok")
                    & ~(auth & (bal < SCAN_CREDIT_COST))
                    & ~(~auth & ~F.col("quota_allowed")))
    success_flag = (reaches_scan & ~F.col("upstream_error")
                    & F.col("scan_success")) | cache_served
    upstream_cost = F.when(
        outcome == "success",
        F.when(F.col("cache_hit"), F.lit(0.0))
        .otherwise(F.coalesce(F.col("credits_used"), F.lit(0))
                   .cast("double") / 1000.0)).otherwise(F.lit(0.0))
    return reqs.select(
        "doc", outcome.alias("outcome"),
        http_status.alias("http_status"),
        F.when(reaches_scan & F.col("captcha_ok"), query_text)
        .alias("query_text"),
        (F.col("cache_hit") & (outcome == "success"))
        .alias("from_cache"),
        debited.alias("debited"), refunded.alias("refunded"),
        balance_after.alias("balance_after"),
        success_flag.alias("success"),
        upstream_cost.alias("upstream_cost_usd"),
        F.when(auth, F.lit(SCAN_CREDIT_COST)).otherwise(F.lit(0))
        .alias("credits_per_scan"),
        F.upper(F.coalesce(F.col("country"), F.lit("")))
        .alias("country_norm"))


def mention_facets(subjects: DataFrame) -> DataFrame:
    """Deterministic facets build (public_tools_routes.py:626-637):
    label stripped, aliases strip-filtered, must_have_tokens =
    [label] + aliases, language pinned ['en'].  ``subjects``: (doc,
    subject_label, aliases array<string>, country)."""
    label = F.trim(F.col("subject_label"))
    aliases = F.transform(
        F.filter(F.coalesce(F.col("aliases"),
                            F.array().cast("array<string>")),
                 lambda a: a.isNotNull() & (F.trim(a) != "")),
        lambda a: F.trim(a))
    return subjects.select(
        "doc", label.alias("label"),
        F.array_join(aliases, "|").alias("aliases_joined"),
        F.array_join(F.concat(F.array(label), aliases), "|")
        .alias("must_have_tokens"),
        F.lit("en").alias("language_code"),
        F.when(F.col("country").isNotNull()
               & (F.col("country") != ""),
               F.upper(F.col("country"))).alias("country_norm"))


MENTION_HIT_CAP = 20       # :694 result.hits[:20]
EXCERPT_CAP = 280          # :701
TOP_OUTLET_CAP = 5         # :712


def mention_hit_shape(hits: DataFrame) -> DataFrame:
    """Public hit shaping over the FIRST 20 hits per scan
    (:692-708).  Excerpt: ``(excerpt or "")[:280] if excerpt else
    None`` — an EMPTY-STRING excerpt maps to NULL (pinned).
    ``hits``: (scan_id, hit_ord, url, title, excerpt,
    outlet_domain)."""
    w = Window.partitionBy("scan_id").orderBy("hit_ord")
    capped = (hits.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") <= MENTION_HIT_CAP).drop("_rn"))
    return capped.select(
        "scan_id", "hit_ord", "url", "title",
        F.when(F.col("excerpt").isNotNull()
               & (F.col("excerpt") != ""),
               F.substring(F.col("excerpt"), 1, EXCERPT_CAP))
        .alias("excerpt"),
        "outlet_domain")


def mention_top_outlets(hits: DataFrame) -> DataFrame:
    """Top-5 outlet domains by count over the first-20 hits
    (:693-713).  Python's stable sort keeps FIRST-SEEN order on
    count ties — reproduced via min(hit_ord) tie-break."""
    w = Window.partitionBy("scan_id").orderBy("hit_ord")
    capped = (hits.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") <= MENTION_HIT_CAP))
    counts = (capped
              .where(F.col("outlet_domain").isNotNull()
                     & (F.col("outlet_domain") != ""))
              .groupBy("scan_id", "outlet_domain")
              .agg(F.count("*").alias("count"),
                   F.min("hit_ord").alias("_first")))
    w2 = Window.partitionBy("scan_id").orderBy(
        F.col("count").desc(), F.col("_first"))
    return (counts.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= TOP_OUTLET_CAP)
            .select("scan_id", "rank",
                    F.col("outlet_domain").alias("domain"), "count"))


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

def synth_hash_queries(docs: DataFrame) -> DataFrame:
    g = F.col("doc_id").cast("long")
    return docs.select(
        g.alias("doc"),
        F.element_at(F.array(F.lit("price"), F.lit("mention"),
                             F.lit("product")),
                     (g % 3 + 1).cast("int")).alias("scan_type"),
        F.when(g % 7 == 0, F.lit(None).cast("string"))
        .when(g % 7 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("  BLUM\tCabinet  "),
                            (g % 11).cast("string"),
                            F.lit("  hinge\n x")))
        .alias("query"),
        F.when(g % 4 == 0, F.lit(None).cast("string"))
        .when(g % 4 == 1, F.lit("gr"))
        .otherwise(F.lit("DE")).alias("country"))


DUCK_PT_HASH_SQL = """
pth AS (
  SELECT doc,
         (['price', 'mention', 'product'])
           [CAST(doc % 3 AS INT) + 1] AS scan_type,
         CASE WHEN doc % 7 = 0 THEN NULL
              WHEN doc % 7 = 1 THEN ''
              ELSE '  BLUM\tCabinet  ' || CAST(doc % 11 AS VARCHAR)
                   || '  hinge\n x' END AS query,
         CASE WHEN doc % 4 = 0 THEN NULL
              WHEN doc % 4 = 1 THEN 'gr' ELSE 'DE' END AS country
  FROM docs),
pthash AS (
  SELECT doc, scan_type,
         CASE WHEN query IS NULL OR query = '' THEN ''
              ELSE regexp_replace(trim(lower(query)), '\\s+', ' ',
                                  'g') END AS norm_query,
         scan_type || '|'
         || CASE WHEN query IS NULL OR query = '' THEN ''
                 ELSE regexp_replace(trim(lower(query)), '\\s+',
                                     ' ', 'g') END
         || '|' || upper(coalesce(country, '')) AS prehash
  FROM pth),
pthash2 AS (
  SELECT doc, scan_type, norm_query, prehash,
         sha256(prehash) AS qhash_sha256
  FROM pthash)"""


def synth_quota_log(docs: DataFrame, now_s: int) -> DataFrame:
    """~4 log rows per key with varied age/outcome."""
    g = F.col("doc_id").cast("long")
    rows = docs.select(
        F.concat(F.lit("k"), (g % 37).cast("string")).alias("key"),
        g.alias("g"))
    return rows.select(
        "key",
        (F.lit(now_s) - (F.col("g") * 1009) % (36 * 3600))
        .cast("long").alias("created_at_s"),
        F.element_at(F.array(F.lit("success"), F.lit("failed"),
                             F.lit("success"),
                             F.lit("rate_limited")),
                     (F.col("g") % 4 + 1).cast("int"))
        .alias("outcome"))


def synth_quota_requests(docs: DataFrame) -> DataFrame:
    g = F.col("doc_id").cast("long")
    return docs.select(
        g.alias("doc"),
        F.when(g % 9 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("k"), (g % 37).cast("string")))
        .alias("key"))


def duck_quota_sql(now_s: int) -> str:
    return f"""
ptlog AS (
  SELECT 'k' || CAST(doc % 37 AS VARCHAR) AS key,
         {now_s} - (doc * 1009) % (36 * 3600) AS created_at_s,
         (['success', 'failed', 'success', 'rate_limited'])
           [CAST(doc % 4 AS INT) + 1] AS outcome
  FROM docs),
ptkey AS (
  SELECT key, count(*) AS used, min(created_at_s) AS oldest_s
  FROM ptlog
  WHERE outcome = 'success' AND created_at_s >= {now_s - DAY_S}
  GROUP BY key),
ptreq AS (
  SELECT doc,
         CASE WHEN doc % 9 = 0 THEN NULL
              ELSE 'k' || CAST(doc % 37 AS VARCHAR) END AS key
  FROM docs),
ptquota AS (
  SELECT r.doc, r.key,
         CAST(CASE WHEN r.key IS NULL THEN 2
                   ELSE coalesce(k.used, 0) END AS INT) AS used,
         2 AS "limit",
         CAST(greatest(0, 2 - CASE WHEN r.key IS NULL THEN 2
                       ELSE coalesce(k.used, 0) END) AS INT)
           AS remaining,
         greatest(0, 2 - CASE WHEN r.key IS NULL THEN 2
                  ELSE coalesce(k.used, 0) END) > 0 AS allowed,
         CAST(CASE WHEN r.key IS NULL THEN {now_s}
                   WHEN k.oldest_s IS NOT NULL
                   THEN k.oldest_s + {DAY_S}
                   ELSE {now_s + DAY_S} END AS BIGINT) AS reset_at_s
  FROM ptreq r LEFT JOIN ptkey k USING (key))"""


CURRENCIES = ("EUR", "USD", None, "GBP", "", "EUR")


def synth_price_hits(docs: DataFrame) -> DataFrame:
    g = F.col("doc_id").cast("long")
    return docs.select(
        (g % 61).alias("query_id"),
        F.when(g % 5 == 0, F.lit(None).cast("double"))
        .otherwise(((g * 13) % 400).cast("double") * 0.5 + 1.0)
        .alias("price"),
        F.element_at(F.array(*[F.lit(c) if c is not None
                               else F.lit(None).cast("string")
                               for c in CURRENCIES]),
                     (g % 6 + 1).cast("int")).alias("currency"),
        (g % 3 == 0).alias("verified"))


DUCK_PT_STATS_SQL = """
pthits AS (
  SELECT doc % 61 AS query_id,
         CASE WHEN doc % 5 = 0 THEN NULL
              ELSE CAST((doc * 13) % 400 AS DOUBLE) * 0.5 + 1.0 END
           AS price,
         (['EUR', 'USD', NULL, 'GBP', '', 'EUR'])
           [CAST(doc % 6 AS INT) + 1] AS currency,
         doc % 3 = 0 AS verified
  FROM docs),
ptcur AS (
  SELECT query_id, currency, count(*) AS cnt
  FROM pthits
  WHERE price IS NOT NULL AND currency IS NOT NULL
        AND currency != ''
  GROUP BY query_id, currency),
ptmodal AS (
  SELECT query_id, currency FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cnt DESC, currency) AS rn
    FROM ptcur) WHERE rn = 1),
ptagg AS (
  SELECT query_id,
         list_sort(list_filter(array_agg(price),
                               x -> x IS NOT NULL)) AS vals,
         count(CASE WHEN price IS NOT NULL AND verified
                    THEN 1 END) AS verified_n
  FROM pthits GROUP BY query_id),
ptstats AS (
  SELECT a.query_id,
         len(vals) AS count,
         CAST(CASE WHEN len(vals) > 0 THEN verified_n ELSE 0 END
              AS BIGINT) AS verified_count,
         CASE WHEN len(vals) > 0 THEN vals[1] END AS min,
         CASE WHEN len(vals) > 0 THEN vals[-1] END AS max,
         CASE WHEN len(vals) = 0 THEN NULL
              WHEN len(vals) % 2 = 1
              THEN vals[len(vals) // 2 + 1]
              ELSE (vals[len(vals) // 2]
                    + vals[len(vals) // 2 + 1]) / 2 END AS median,
         CASE WHEN len(vals) > 0 THEN m.currency END AS currency
  FROM ptagg a LEFT JOIN ptmodal m USING (query_id))"""


def synth_mention_subjects(docs: DataFrame) -> DataFrame:
    g = F.col("doc_id").cast("long")
    nul_a = F.lit(None).cast("array<string>")
    return docs.select(
        g.alias("doc"),
        F.concat(F.lit("  Brand "), (g % 9).cast("string"),
                 F.lit(" ")).alias("subject_label"),
        F.when(g % 4 == 0, nul_a)
        .when(g % 4 == 1, F.array().cast("array<string>"))
        .when(g % 4 == 2, F.array(F.lit(" A1 "), F.lit(""),
                                  F.lit("B2")))
        .otherwise(F.array(F.lit("C3"))).alias("aliases"),
        F.when(g % 3 == 0, F.lit(None).cast("string"))
        .when(g % 3 == 1, F.lit("")).otherwise(F.lit("gr"))
        .alias("country"))


DUCK_PT_FACETS_SQL = """
ptsubj AS (
  SELECT doc,
         '  Brand ' || CAST(doc % 9 AS VARCHAR) || ' '
           AS subject_label,
         CASE WHEN doc % 4 = 0 THEN NULL
              WHEN doc % 4 = 1 THEN []::VARCHAR[]
              WHEN doc % 4 = 2 THEN [' A1 ', '', 'B2']
              ELSE ['C3'] END AS aliases,
         CASE WHEN doc % 3 = 0 THEN NULL
              WHEN doc % 3 = 1 THEN '' ELSE 'gr' END AS country
  FROM docs),
ptfacets AS (
  SELECT doc,
         trim(subject_label) AS label,
         coalesce(array_to_string(list_transform(
           list_filter(coalesce(aliases, []::VARCHAR[]),
                       a -> a IS NOT NULL AND trim(a) != ''),
           a -> trim(a)), '|'), '') AS aliases_joined,
         coalesce(array_to_string(
           [trim(subject_label)]
           || list_transform(
                list_filter(coalesce(aliases, []::VARCHAR[]),
                            a -> a IS NOT NULL AND trim(a) != ''),
                a -> trim(a)), '|'), '') AS must_have_tokens,
         'en' AS language_code,
         CASE WHEN country IS NOT NULL AND country != ''
              THEN upper(country) END AS country_norm
  FROM ptsubj)"""


DOMAINS = ("alpha.com", "beta.io", None, "alpha.com", "",
           "gamma.net", "delta.org")


def synth_mention_hits(docs: DataFrame) -> DataFrame:
    g = F.col("doc_id").cast("long")
    return docs.select(
        (g % 17).alias("scan_id"),
        (g % 97).cast("int").alias("hit_ord"),
        F.concat(F.lit("https://x/"), g.cast("string")).alias("url"),
        F.concat(F.lit("T"), (g % 5).cast("string")).alias("title"),
        F.when(g % 6 == 0, F.lit(None).cast("string"))
        .when(g % 6 == 1, F.lit(""))
        .otherwise(F.repeat(F.concat(F.lit("e"),
                                     (g % 3).cast("string")),
                            150)).alias("excerpt"),
        F.element_at(F.array(*[F.lit(x) if x is not None
                               else F.lit(None).cast("string")
                               for x in DOMAINS]),
                     (g % 7 + 1).cast("int")).alias("outlet_domain"))


DUCK_PT_HITS_SQL = """
ptmh AS (
  SELECT doc % 17 AS scan_id,
         CAST(doc % 97 AS INT) AS hit_ord,
         'https://x/' || CAST(doc AS VARCHAR) AS url,
         'T' || CAST(doc % 5 AS VARCHAR) AS title,
         CASE WHEN doc % 6 = 0 THEN NULL
              WHEN doc % 6 = 1 THEN ''
              ELSE repeat('e' || CAST(doc % 3 AS VARCHAR), 150) END
           AS excerpt,
         (['alpha.com', 'beta.io', NULL, 'alpha.com', '',
           'gamma.net', 'delta.org'])[CAST(doc % 7 AS INT) + 1]
           AS outlet_domain
  FROM docs),
ptcapped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY scan_id
                                 ORDER BY hit_ord) AS rn
    FROM ptmh) WHERE rn <= 20),
pthshape AS (
  SELECT scan_id, hit_ord, url, title,
         CASE WHEN excerpt IS NOT NULL AND excerpt != ''
              THEN substring(excerpt, 1, 280) END AS excerpt,
         outlet_domain
  FROM ptcapped),
ptoutlets AS (
  SELECT scan_id, rank, domain, count FROM (
    SELECT scan_id, outlet_domain AS domain, count(*) AS count,
           row_number() OVER (PARTITION BY scan_id
                              ORDER BY count(*) DESC,
                                       min(hit_ord)) AS rank
    FROM ptcapped
    WHERE outlet_domain IS NOT NULL AND outlet_domain != ''
    GROUP BY scan_id, outlet_domain)
  WHERE rank <= 5)"""


def synth_scan_requests(docs: DataFrame) -> DataFrame:
    g = F.col("doc_id").cast("long")
    return docs.select(
        g.alias("doc"),
        (g % 2 == 0).alias("is_auth"),
        (g % 11 != 0).alias("captcha_ok"),
        (g % 5 != 1).alias("quota_allowed"),
        F.when(g % 2 == 0, (g % 7).cast("int"))
        .otherwise(F.lit(None).cast("int")).alias("balance_before"),
        (g % 6 == 2).alias("cache_hit"),
        (g % 13 != 3).alias("debit_ok"),
        (g % 17 == 4).alias("upstream_error"),
        (g % 3 != 1).alias("scan_success"),
        ((g % 9) * 100).cast("int").alias("credits_used"),
        F.concat(F.lit("  Tile Blum X"), (g % 8).cast("string"),
                 F.lit(" ")).alias("product_name"),
        F.when(g % 4 == 0, F.lit(None).cast("string"))
        .when(g % 4 == 1, F.lit(""))
        .when(g % 4 == 2, F.lit("blum"))  # substring of the name
        .otherwise(F.lit("Hafele")).alias("manufacturer"),
        F.when(g % 3 == 0, F.lit("60x120")).otherwise(
            F.lit(None).cast("string")).alias("dimensions"),
        F.when(g % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("de")).alias("country"))


DUCK_PT_LADDER_SQL = """
ptreqs AS (
  SELECT doc,
         doc % 2 = 0 AS is_auth,
         doc % 11 != 0 AS captcha_ok,
         doc % 5 != 1 AS quota_allowed,
         CASE WHEN doc % 2 = 0 THEN CAST(doc % 7 AS INT) END
           AS balance_before,
         doc % 6 = 2 AS cache_hit,
         doc % 13 != 3 AS debit_ok,
         doc % 17 = 4 AS upstream_error,
         doc % 3 != 1 AS scan_success,
         CAST((doc % 9) * 100 AS INT) AS credits_used,
         '  Tile Blum X' || CAST(doc % 8 AS VARCHAR) || ' '
           AS product_name,
         CASE WHEN doc % 4 = 0 THEN NULL
              WHEN doc % 4 = 1 THEN ''
              WHEN doc % 4 = 2 THEN 'blum'
              ELSE 'Hafele' END AS manufacturer,
         CASE WHEN doc % 3 = 0 THEN '60x120' END AS dimensions,
         CASE WHEN doc % 5 = 0 THEN NULL ELSE 'de' END AS country
  FROM docs),
ptl1 AS (
  SELECT *,
         coalesce(balance_before, 0) AS bal,
         trim(product_name) AS name_stripped,
         manufacturer IS NOT NULL AND manufacturer != ''
           AND position(lower(manufacturer)
                        IN lower(trim(product_name))) = 0
           AS mfr_missing
  FROM ptreqs),
ptl2 AS (
  SELECT *,
         CASE WHEN dimensions IS NOT NULL AND dimensions != ''
              THEN trim(concat_ws(' ',
                     CASE WHEN mfr_missing
                          THEN trim(concat_ws(' ', manufacturer,
                                              name_stripped))
                          ELSE name_stripped END, dimensions))
              ELSE CASE WHEN mfr_missing
                        THEN trim(concat_ws(' ', manufacturer,
                                            name_stripped))
                        ELSE name_stripped END END AS query_text,
         captcha_ok
         AND NOT (is_auth AND bal < 2)
         AND NOT (NOT is_auth AND NOT quota_allowed)
         AND NOT cache_hit
         AND NOT (is_auth AND NOT debit_ok) AS reaches_scan
  FROM ptl1),
ptladder AS (
  SELECT doc,
         CASE WHEN NOT captcha_ok THEN 'captcha_failed'
              WHEN is_auth AND bal < 2 THEN 'rate_limited'
              WHEN NOT is_auth AND NOT quota_allowed
                THEN 'rate_limited'
              WHEN cache_hit THEN 'success'
              WHEN is_auth AND NOT debit_ok THEN 'rate_limited'
              WHEN upstream_error THEN 'failed'
              WHEN NOT scan_success THEN 'failed'
              ELSE 'success' END AS outcome,
         CASE WHEN NOT captcha_ok THEN 400
              WHEN is_auth AND bal < 2 THEN 402
              WHEN NOT is_auth AND NOT quota_allowed THEN 429
              WHEN cache_hit THEN 200
              WHEN is_auth AND NOT debit_ok THEN 402
              WHEN upstream_error THEN 502
              ELSE 200 END AS http_status,
         CASE WHEN reaches_scan AND captcha_ok THEN query_text END
           AS query_text,
         cache_hit AND captcha_ok
           AND NOT (is_auth AND bal < 2)
           AND NOT (NOT is_auth AND NOT quota_allowed)
           AS from_cache,
         is_auth AND reaches_scan AS debited,
         is_auth AND reaches_scan
           AND (upstream_error OR NOT scan_success) AS refunded,
         CASE WHEN NOT is_auth THEN NULL
              WHEN is_auth AND reaches_scan
                   AND NOT (upstream_error OR NOT scan_success)
                   AND scan_success AND NOT upstream_error
              THEN balance_before - 2
              ELSE balance_before END AS balance_after,
         (reaches_scan AND NOT upstream_error AND scan_success)
           OR (cache_hit AND captcha_ok
               AND NOT (is_auth AND bal < 2)
               AND NOT (NOT is_auth AND NOT quota_allowed))
           AS success,
         CASE WHEN (CASE WHEN NOT captcha_ok THEN 'captcha_failed'
                    WHEN is_auth AND bal < 2 THEN 'rate_limited'
                    WHEN NOT is_auth AND NOT quota_allowed
                      THEN 'rate_limited'
                    WHEN cache_hit THEN 'success'
                    WHEN is_auth AND NOT debit_ok
                      THEN 'rate_limited'
                    WHEN upstream_error THEN 'failed'
                    WHEN NOT scan_success THEN 'failed'
                    ELSE 'success' END) = 'success'
              THEN CASE WHEN cache_hit THEN 0.0
                   ELSE CAST(coalesce(credits_used, 0) AS DOUBLE)
                        / 1000.0 END
              ELSE 0.0 END AS upstream_cost_usd,
         CASE WHEN is_auth THEN 2 ELSE 0 END AS credits_per_scan,
         upper(coalesce(country, '')) AS country_norm
  FROM ptl2)"""
