"""Greek-marketplace facet filtering + the Skroutz hit-assembly fold.

Reference —

- ``modules/greek_marketplaces/facet_filter.py:30-72``
  ``adaptive_marketplace_query``: 6-branch ladder over (sku = FIRST
  sku_token, brand/model strip().upper() or None):
  brand+model+sku -> "B M S", brand+sku, model+sku, sku alone,
  brand+model, else the raw query.
- ``facet_filter.py:75-165`` ``matches_facets``: no facets / no
  constraints pass; any normalized sku_token must substring-match the
  normalized (decoded URL path + name) haystack; type-only facets
  check the 8-family Greek/English synonym table over the
  accent-stripped loose haystack, UNKNOWN types are permissive.
- ``adapters/skroutz.py:148-351`` ``search``/``_fanout_hits``: the
  step-1 product_url is cheapest_merchant_url or product_url (both
  missing aborts); facet mismatch aborts; fanout requires
  merchant_count > 1 AND a skroutz.gr product-page URL; the product
  page must pass the plausibility gate and merchants need url+name;
  fanout slices merchants[:max(limit, 1)] and classifies availability
  (out-tokens checked FIRST: εκτός/out/unavail/not available, then
  διαθέσιμ/available/in stock/άμεσ, default in_stock); empty fanout
  falls back to the single legacy hit (retailer or 'Skroutz', pinned
  notes joined with ' · ', "N shop{s}" plural only when N != 1, the
  aggregator-URL note when cheapest_merchant_url is missing) gated by
  the same plausibility check.
- ``utils/price_parsing.py:19-70`` ``_normalize_currency``: strip,
  3-letter alpha -> upper, else the 16-symbol table (exact, then
  upcased); the amount itself is parsed by the external
  ``price-parser`` lib — out of scope; the fold parses the plain
  ``N[.NN]`` forms the synth uses and takes the leading symbol for
  currency.

Scale: per-row Column logic plus one broadcast of the merchant rows'
request keys — no wide shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mivaa_pdf_extractor_spark.operators.identity import (
    _match_tokens, _path, normalize_model_token_col)

# facet_filter.py:131-165
PRODUCT_TYPE_SYNONYMS = {
    "basin_faucet": ["basin faucet", "basin mixer", "basin tap",
                     "lavatory faucet", "μπαταρια νιπτηρα",
                     "μπαταρια νιπτηρος", "νιπτηρα"],
    "shower_faucet": ["shower faucet", "shower mixer", "shower tap",
                      "μπαταρια ντουζ", "μπαταρια ντουζιερας",
                      "ντους"],
    "bath_faucet": ["bath faucet", "bath mixer", "bath tap",
                    "tub faucet", "μπαταρια λουτρου",
                    "μπαταρια μπανιερας"],
    "kitchen_faucet": ["kitchen faucet", "kitchen mixer",
                       "sink mixer", "μπαταρια κουζινας",
                       "μπαταρια νεροχυτη"],
    "shower_column": ["shower column", "shower system", "shower set",
                      "στηλη ντους", "συστημα ντους"],
    "shower_outlet": ["shower outlet", "shower spout", "εκροη ντους"],
    "tile": ["tile", "πλακακι", "πλακακια"],
    "range_hood": ["range hood", "extractor hood", "cooker hood",
                   "απορροφητηρας"],
}

# price_parsing.py:19-36
SYMBOL_TO_CODE = {
    "$": "USD", "€": "EUR", "£": "GBP", "¥": "JPY", "₹": "INR",
    "₽": "RUB", "₩": "KRW", "฿": "THB", "₺": "TRY", "R$": "BRL",
    "A$": "AUD", "C$": "CAD", "HK$": "HKD", "S$": "SGD",
    "NZ$": "NZD", "CHF": "CHF",
}

OUT_TOKENS = ("εκτός", "out", "unavail", "not available")
IN_TOKENS = ("διαθέσιμ", "available", "in stock", "άμεσ")

_GREEK_ACCENTS = "άέήίόύώΐΰ"
_GREEK_PLAIN = "αεηιουωιυ"


def _strip_accents(col: Column) -> Column:
    """Accent strip for the lowercase Greek domain the synonym table
    needs (reference uses full NFD Mn-removal; the fold covers the
    accented vowels that actually occur in the vocabulary)."""
    return F.translate(col, _GREEK_ACCENTS, _GREEK_PLAIN)


def _norm_text(col: Column) -> Column:
    """product_identity_service.normalize_text: lower, accent strip,
    collapse whitespace."""
    return F.trim(F.regexp_replace(
        _strip_accents(F.lower(F.coalesce(col, F.lit("")))),
        r"\s+", " "))


def _unquote(col: Column) -> Column:
    """urllib.parse.unquote — '+' survives (pre-escaped so Spark's
    form-style url_decode doesn't turn it into a space)."""
    return F.url_decode(F.replace(col, F.lit("+"), F.lit("%2B")))


def adaptive_query(requests: DataFrame) -> DataFrame:
    """``requests``: (req_id long, query string, has_facets boolean,
    sku string?, brand string?, model string?) — sku is the FIRST
    sku_token (raw, not uppercased); brand/model are uppercased after
    strip and empty collapses to null (facet_filter.py:51-72)."""
    brand = F.nullif(F.upper(F.trim(F.coalesce(F.col("brand"),
                                               F.lit("")))), F.lit(""))
    model = F.nullif(F.upper(F.trim(F.coalesce(F.col("model"),
                                               F.lit("")))), F.lit(""))
    sku = F.nullif(F.coalesce(F.col("sku"), F.lit("")), F.lit(""))
    nf = ~F.col("has_facets")
    has = lambda c: c.isNotNull()  # noqa: E731
    strategy = (
        F.when(nf, F.lit("no_facets"))
        .when(has(sku) & has(brand) & has(model),
              F.lit("brand_model_sku"))
        .when(has(sku) & has(brand), F.lit("brand_sku"))
        .when(has(sku) & has(model), F.lit("model_sku"))
        .when(has(sku), F.lit("sku"))
        .when(has(brand) & has(model), F.lit("brand_model"))
        .otherwise(F.lit("fallthrough")))
    adapted = (
        F.when(nf, F.col("query"))
        .when(has(sku) & has(brand) & has(model),
              F.concat_ws(" ", brand, model, sku))
        .when(has(sku) & has(brand), F.concat_ws(" ", brand, sku))
        .when(has(sku) & has(model), F.concat_ws(" ", model, sku))
        .when(has(sku), sku)
        .when(has(brand) & has(model), F.concat_ws(" ", brand, model))
        .otherwise(F.col("query")))
    return requests.select("req_id", adapted.alias("adapted_query"),
                           strategy.alias("strategy"))


def _facet_ok(url: Column, name: Column):
    """matches_facets as (matched, reason) over columns has_facets,
    sku_tokens (array<string>), product_type."""
    # [normalize(t) for t in sku_tokens if t] — raw-truthiness filter
    # BEFORE normalizing, so a separator-only token normalizes to ''
    # and `'' in haystack` makes the SKU check VACUOUSLY pass
    # (facet_filter.py:104, same bug family as price_rule_shortcut)
    sku_toks = F.transform(
        F.filter(F.coalesce(F.col("sku_tokens"),
                            F.array().cast("array<string>")),
                 lambda t: F.coalesce(t, F.lit("")) != ""),
        normalize_model_token_col)
    ptype = F.trim(F.coalesce(F.col("product_type"), F.lit("")))
    hay = F.concat(_unquote(_path(url)), F.lit(" "),
                   F.coalesce(name, F.lit("")))
    hay_norm = normalize_model_token_col(hay)
    hay_loose = _norm_text(hay)
    syn_map = F.create_map(*[
        x for t, syns in PRODUCT_TYPE_SYNONYMS.items()
        for x in (F.lit(t), F.array(*[F.lit(s) for s in syns]))])
    syns = F.element_at(syn_map, F.lower(ptype))
    sku_hit = F.exists(sku_toks, lambda t: hay_norm.contains(t))
    type_hit = F.exists(syns, lambda s: hay_loose.contains(s))
    reason = (
        F.when(~F.col("has_facets"), F.lit("no_facets"))
        .when((F.size(sku_toks) == 0) & (ptype == ""),
              F.lit("no_constraints"))
        .when(F.size(sku_toks) > 0,
              F.when(sku_hit, F.lit("sku_hit"))
              .otherwise(F.lit("sku_miss")))
        .when(syns.isNull(), F.lit("type_unknown_permissive"))
        .when(type_hit, F.lit("type_hit"))
        .otherwise(F.lit("type_miss")))
    matched = ~reason.isin("sku_miss", "type_miss")
    return matched, reason


def facet_match(cands: DataFrame) -> DataFrame:
    """``cands``: (cand_id long, candidate_url, candidate_name,
    has_facets boolean, sku_tokens array<string>, product_type)."""
    matched, reason = _facet_ok(F.col("candidate_url"),
                                F.col("candidate_name"))
    return cands.select("cand_id", matched.alias("matched"),
                        reason.alias("reason"))


def _plausible(query: Column, url: Column, name: Column) -> Column:
    """match_filter.is_plausible_match as a Column (the repo's
    ``plausible_match`` ratio-0.30 gate)."""
    q = _match_tokens(query)
    cand = F.array_sort(F.array_distinct(F.concat(
        _match_tokens(_path(url)), _match_tokens(name))))
    return (F.when(F.size(q) == 0, F.lit(True))
            .when(F.size(cand) == 0, F.lit(False))
            .otherwise(F.size(F.array_intersect(q, cand)) / F.size(q)
                       >= F.lit(0.30)))


def _price_amount(raw: Column) -> Column:
    amt = F.regexp_extract(F.coalesce(raw, F.lit("")),
                           r"([0-9]+(?:\.[0-9]+)?)", 1)
    return F.when(amt != "", amt.cast("double"))


def _price_currency(raw: Column, hint: Column) -> Column:
    sym = F.regexp_extract(F.coalesce(raw, F.lit("")), r"([€$£])", 1)
    code = (F.when(sym == "€", F.lit("EUR"))
            .when(sym == "$", F.lit("USD"))
            .when(sym == "£", F.lit("GBP")))
    return F.coalesce(code, hint)


def skroutz_decisions(search: DataFrame,
                      merchants: DataFrame) -> DataFrame:
    """Per-request decision of ``search`` (skroutz.py:148-243):
    not_found / no_product_url / facet_mismatch / fanout /
    fallback_single / dropped_implausible. ``search`` columns:
    (req_id, query, found, product_name, product_url_raw,
    cheapest_merchant_name, cheapest_merchant_url, best_price,
    currency, merchant_count, page_found, page_product_name,
    has_facets, sku_tokens, product_type, limit); ``merchants`` as in
    :func:`skroutz_hits` — a request has usable merchants when at
    least one row keeps url+name (skroutz.py:310)."""
    valid = (merchants
             .where(F.col("merchant_url").isNotNull()
                    & (F.col("merchant_url") != "")
                    & F.col("merchant_name").isNotNull()
                    & (F.col("merchant_name") != ""))
             .groupBy("req_id")
             .agg(F.count(F.lit(1)).alias("_n_valid")))
    search = (search.join(valid, "req_id", "left")
              .withColumn("has_merchants",
                          F.coalesce(F.col("_n_valid") > 0,
                                     F.lit(False)))
              .drop("_n_valid"))
    step1 = F.coalesce(F.col("cheapest_merchant_url"),
                       F.col("product_url_raw"))
    matched, _reason = _facet_ok(step1, F.col("product_name"))
    page_url = F.coalesce(F.col("product_url_raw"), step1)
    wants_fanout = (
        (F.coalesce(F.col("merchant_count"), F.lit(0)) > 1)
        & page_url.isNotNull() & (page_url != "")
        & page_url.contains("skroutz.gr"))
    page_ok = (F.coalesce(F.col("page_found"), F.lit(False))
               & _plausible(F.col("query"), page_url,
                            F.col("page_product_name")))
    fanout = wants_fanout & page_ok & F.col("has_merchants")
    single_ok = _plausible(F.col("query"), step1,
                           F.col("product_name"))
    decision = (
        F.when(~F.col("found"), F.lit("not_found"))
        .when(step1.isNull(), F.lit("no_product_url"))
        .when(~matched, F.lit("facet_mismatch"))
        .when(fanout, F.lit("fanout"))
        .when(single_ok, F.lit("fallback_single"))
        .otherwise(F.lit("dropped_implausible")))
    return search.select("req_id", decision.alias("decision"),
                         wants_fanout.alias("wanted_fanout"))


def skroutz_hits(search: DataFrame,
                 merchants: DataFrame) -> DataFrame:
    """PriceHit rows for every request (skroutz.py:200-351).
    ``merchants``: (req_id, midx int — page order, merchant_name,
    merchant_url, price string, availability string)."""
    d = skroutz_decisions(search, merchants)
    s = search.join(d, "req_id")
    # fanout rows
    fan_req = s.where(F.col("decision") == "fanout").select(
        "req_id", F.col("currency").alias("s_currency"),
        F.col("merchant_count"), F.col("limit"))
    m = (merchants
         .where(F.col("merchant_url").isNotNull()
                & (F.col("merchant_url") != "")
                & F.col("merchant_name").isNotNull()
                & (F.col("merchant_name") != ""))
         .join(F.broadcast(fan_req), "req_id"))
    keep = F.col("midx") < F.greatest(F.col("limit"), F.lit(1))
    fallback_cur = F.coalesce(F.col("s_currency"), F.lit("EUR"))
    avail = F.lower(F.coalesce(F.col("availability"), F.lit("")))
    availability = (
        F.when(F.exists(F.array(*[F.lit(t) for t in OUT_TOKENS]),
                        lambda t: avail.contains(t)),
               F.lit("out_of_stock"))
        .when(F.exists(F.array(*[F.lit(t) for t in IN_TOKENS]),
                       lambda t: avail.contains(t)),
              F.lit("in_stock"))
        .otherwise(F.lit("in_stock")))
    fan_hits = m.where(keep).select(
        "req_id", F.col("midx").alias("hit_idx"),
        F.coalesce(F.nullif(F.col("merchant_name"), F.lit("")),
                   F.lit("Skroutz merchant")).alias("retailer_name"),
        F.col("merchant_url").alias("product_url"),
        _price_amount(F.col("price")).alias("price"),
        F.coalesce(_price_currency(F.col("price"), fallback_cur),
                   F.lit("EUR")).alias("currency"),
        availability.alias("availability"),
        F.lit("skroutz").alias("source"),
        F.lit(False).alias("verified"),
        F.lit("via Skroutz").alias("notes"))
    # single-hit fallback
    sg = s.where(F.col("decision") == "fallback_single")
    step1 = F.coalesce(F.col("cheapest_merchant_url"),
                       F.col("product_url_raw"))
    n = F.col("merchant_count")
    notes = F.concat_ws(
        " · ", F.lit("via Skroutz"),
        F.when(F.coalesce(n, F.lit(0)) != 0, F.concat(
            n.cast("string"), F.lit(" shop"),
            F.when(n != 1, F.lit("s")).otherwise(F.lit("")))),
        F.when(F.col("cheapest_merchant_url").isNull(),
               F.lit("aggregator URL (click through for merchants)")))
    single = sg.select(
        "req_id", F.lit(0).alias("hit_idx"),
        F.coalesce(F.nullif(F.col("cheapest_merchant_name"),
                            F.lit("")), F.lit("Skroutz"))
        .alias("retailer_name"),
        step1.alias("product_url"),
        _price_amount(F.col("best_price")).alias("price"),
        F.coalesce(_price_currency(
            F.col("best_price"),
            F.coalesce(F.col("currency"), F.lit("EUR"))), F.lit("EUR"))
        .alias("currency"),
        F.lit("in_stock").alias("availability"),
        F.lit("skroutz").alias("source"),
        F.lit(False).alias("verified"),
        notes.alias("notes"))
    return fan_hits.unionByName(single)


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

def synth_adaptive_requests(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    m = F.col("doc")
    brand = F.element_at(F.array(
        F.lit(" alpha "), F.lit(""), F.lit(None).cast("string"),
        F.lit("Beta")), (m % 4 + 1).cast("int"))
    model = F.element_at(F.array(
        F.lit("modelx"), F.lit("  "), F.lit(None).cast("string")),
        (m % 3 + 1).cast("int"))
    sku = F.when(m % 2 == 0,
                 F.concat(F.lit("10"), (m % 90 + 10).cast("string")))
    return d.select(
        m.alias("req_id"),
        F.concat(F.lit("free text query "), (m % 5).cast("string"))
        .alias("query"),
        (m % 7 != 1).alias("has_facets"),
        sku.alias("sku"), brand.alias("brand"), model.alias("model"))


DUCK_ADAPTIVE_SQL = """
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
areq AS (
  SELECT doc AS req_id,
         'free text query ' || CAST(doc % 5 AS VARCHAR) AS query,
         doc % 7 != 1 AS has_facets,
         CASE WHEN doc % 2 = 0
              THEN '10' || CAST(doc % 90 + 10 AS VARCHAR) END AS sku,
         ([' alpha ', '', NULL, 'Beta'])[CAST(doc % 4 AS INT) + 1]
           AS brand,
         (['modelx', '  ', NULL])[CAST(doc % 3 AS INT) + 1] AS model
  FROM docs),
anorm AS (
  SELECT req_id, query, has_facets,
         nullif(coalesce(sku, ''), '') AS sku,
         nullif(upper(trim(coalesce(brand, ''))), '') AS b,
         nullif(upper(trim(coalesce(model, ''))), '') AS m
  FROM areq),
aout AS (
  SELECT req_id,
         CASE WHEN NOT has_facets THEN query
              WHEN sku IS NOT NULL AND b IS NOT NULL
                   AND m IS NOT NULL THEN b || ' ' || m || ' ' || sku
              WHEN sku IS NOT NULL AND b IS NOT NULL
                THEN b || ' ' || sku
              WHEN sku IS NOT NULL AND m IS NOT NULL
                THEN m || ' ' || sku
              WHEN sku IS NOT NULL THEN sku
              WHEN b IS NOT NULL AND m IS NOT NULL
                THEN b || ' ' || m
              ELSE query END AS adapted_query,
         CASE WHEN NOT has_facets THEN 'no_facets'
              WHEN sku IS NOT NULL AND b IS NOT NULL
                   AND m IS NOT NULL THEN 'brand_model_sku'
              WHEN sku IS NOT NULL AND b IS NOT NULL
                THEN 'brand_sku'
              WHEN sku IS NOT NULL AND m IS NOT NULL
                THEN 'model_sku'
              WHEN sku IS NOT NULL THEN 'sku'
              WHEN b IS NOT NULL AND m IS NOT NULL
                THEN 'brand_model'
              ELSE 'fallthrough' END AS strategy
  FROM anorm)"""


def synth_facet_cands(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    m = F.col("doc") % 9
    sku = F.concat(F.lit("10"), (F.col("doc") % 90 + 10)
                   .cast("string"))
    url = (F.when(F.col("doc") % 5 == 0,
                  F.concat(F.lit("https://shop.gr/p/item-"),
                           F.col("doc").cast("string")))
           .otherwise(F.concat(F.lit("https://shop.gr/p/alpha-"),
                               sku, F.lit(".html"))))
    name = F.element_at(F.array(
        F.concat(F.lit("Alpha ModelX "), sku),
        F.lit("Πλακακια δαπεδου 60x60"),
        F.lit("Basin Mixer Premium"),
        F.lit(None).cast("string")), (F.col("doc") % 4 + 1)
        .cast("int"))
    sku_tokens = (
        F.when(m == 0, F.array(F.lit("999x")))
        .when(m == 5, F.array(F.lit("-.")))
        .when(m.isin(4, 6, 7, 8),
              F.lit(None).cast("array<string>"))
        .otherwise(F.array(sku, F.lit(""),
                           F.lit(None).cast("string"))))
    ptype = (F.when(m == 6, F.lit("Tile"))
             .when(m == 7, F.lit("mystery_type"))
             .when(m == 8, F.lit("basin_faucet"))
             .otherwise(F.lit("")))
    return d.select(
        F.col("doc").alias("cand_id"),
        url.alias("candidate_url"), name.alias("candidate_name"),
        (F.col("doc") % 7 != 1).alias("has_facets"),
        sku_tokens.alias("sku_tokens"), ptype.alias("product_type"))


def _mf_norm_sql(x: str) -> str:
    """normalize_model_token twin: greek→latin, upper, strip
    separators."""
    from mivaa_pdf_extractor_spark.operators.identity import (
        _GREEK, _LATIN)
    return (f"regexp_replace(upper(translate({x}, '{_GREEK}', "
            f"'{_LATIN}')), '[ \\t\\r\\n\\x0b\\f\\-_./]+', '', 'g')")


def _mf_loose_sql(x: str) -> str:
    return (f"trim(regexp_replace(translate(lower(coalesce({x}, "
            f"'')), '{_GREEK_ACCENTS}', '{_GREEK_PLAIN}'), "
            f"'\\s+', ' ', 'g'))")


_MF_PATH_SQL = ("regexp_extract(trim({u}), "
                "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)")


def duck_facet_sql() -> str:
    syn_entries = ", ".join(
        "{'t': '%s', 's': [%s]}" % (
            t, ", ".join("'" + s + "'" for s in syns))
        for t, syns in PRODUCT_TYPE_SYNONYMS.items())
    path = _MF_PATH_SQL.format(u="candidate_url")
    return f"""
fcand AS (
  SELECT doc AS cand_id,
         CASE WHEN doc % 5 = 0
              THEN 'https://shop.gr/p/item-' || CAST(doc AS VARCHAR)
              ELSE 'https://shop.gr/p/alpha-10'
                   || CAST(doc % 90 + 10 AS VARCHAR) || '.html'
         END AS candidate_url,
         (['Alpha ModelX 10' || CAST(doc % 90 + 10 AS VARCHAR),
           'Πλακακια δαπεδου 60x60', 'Basin Mixer Premium',
           NULL])[CAST(doc % 4 AS INT) + 1] AS candidate_name,
         doc % 7 != 1 AS has_facets,
         CASE CAST(doc % 9 AS INT)
           WHEN 0 THEN ['999x']
           WHEN 5 THEN ['-.']
           WHEN 4 THEN NULL
           WHEN 6 THEN NULL WHEN 7 THEN NULL WHEN 8 THEN NULL
           ELSE ['10' || CAST(doc % 90 + 10 AS VARCHAR), '', NULL]
         END AS sku_tokens,
         CASE CAST(doc % 9 AS INT)
           WHEN 6 THEN 'Tile' WHEN 7 THEN 'mystery_type'
           WHEN 8 THEN 'basin_faucet' ELSE '' END AS product_type
  FROM docs),
fhay AS (
  SELECT *,
         {path} || ' ' || coalesce(candidate_name, '') AS hay,
         list_transform(
           list_filter(coalesce(sku_tokens, CAST([] AS VARCHAR[])),
                       t -> coalesce(t, '') != ''),
           t -> {_mf_norm_sql('t')}) AS toks,
         trim(coalesce(product_type, '')) AS ptype
  FROM fcand),
fsyn AS (
  SELECT *,
         {_mf_norm_sql('hay')} AS hay_norm,
         {_mf_loose_sql('hay')} AS hay_loose,
         list_filter([{syn_entries}],
                     e -> e.t = lower(ptype))[1].s AS syns
  FROM fhay),
fmatch AS (
  SELECT cand_id,
         CASE WHEN NOT has_facets THEN 'no_facets'
              WHEN len(toks) = 0 AND ptype = '' THEN 'no_constraints'
              WHEN len(toks) > 0 THEN
                CASE WHEN len(list_filter(toks,
                         t -> contains(hay_norm, t))) > 0
                     THEN 'sku_hit' ELSE 'sku_miss' END
              WHEN syns IS NULL THEN 'type_unknown_permissive'
              WHEN len(list_filter(syns,
                       s -> contains(hay_loose, s))) > 0
                THEN 'type_hit'
              ELSE 'type_miss' END AS reason
  FROM fsyn),
ffinal AS (
  SELECT cand_id, reason NOT IN ('sku_miss', 'type_miss') AS matched,
         reason
  FROM fmatch)"""


def synth_skroutz_search(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    m = F.col("doc")
    sku = F.concat(F.lit("10"), (m % 90 + 10).cast("string"))
    cmu = F.when(m % 3 == 0, F.concat(
        F.lit("https://shop"), (m % 7).cast("string"),
        F.lit(".gr/p/alpha-modelx-"), sku))
    pur = F.when(m % 5 == 0, F.lit(None).cast("string")) \
        .when(m % 6 == 2, F.concat(
            F.lit("https://www.skroutz.gr/s/p-"), sku, F.lit("-"),
            m.cast("string"), F.lit(".html"))) \
        .otherwise(F.concat(
            F.lit("https://www.skroutz.gr/s/"), m.cast("string"),
            F.lit("/alpha-modelx-"), sku, F.lit(".html")))
    return d.select(
        m.alias("req_id"),
        F.concat(F.lit("alpha modelx premium item "), sku)
        .alias("query"),
        (m % 17 != 0).alias("found"),
        F.when(m % 11 == 3, F.lit("Unrelated Widget Thing"))
        .otherwise(F.concat(F.lit("Alpha ModelX "), sku))
        .alias("product_name"),
        pur.alias("product_url_raw"),
        F.when(m % 3 == 0, F.concat(F.lit("Shop "),
                                    (m % 7).cast("string")))
        .alias("cheapest_merchant_name"),
        cmu.alias("cheapest_merchant_url"),
        F.element_at(F.array(
            F.lit("49.5"), F.lit("€123.45"), F.lit(""),
            F.lit("1299"), F.lit(None).cast("string")),
            (m % 5 + 1).cast("int")).alias("best_price"),
        F.when(m % 11 != 0, F.lit("EUR")).alias("currency"),
        (m % 6).cast("int").alias("merchant_count"),
        (m % 13 != 0).alias("page_found"),
        F.when(m % 8 == 0, F.lit("Totally Different Gadget"))
        .otherwise(F.concat(F.lit("Alpha ModelX "), sku))
        .alias("page_product_name"),
        (m % 7 != 1).alias("has_facets"),
        F.when(m % 10 == 0, F.array(F.lit("999111")))
        .otherwise(F.array(sku)).alias("sku_tokens"),
        F.lit("").alias("product_type"),
        (m % 4).cast("int").alias("limit"))


def synth_skroutz_merchants(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = (d.where(F.col("doc") % 5 > 0)
            .select("doc", F.explode(F.sequence(
                F.lit(0), (F.col("doc") % 5 - 1).cast("int")))
                .alias("midx")))
    h = F.col("doc") * 31 + F.col("midx") * 7
    return rows.select(
        F.col("doc").alias("req_id"),
        F.col("midx").cast("int").alias("midx"),
        F.when(h % 7 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("Shop "), (h % 9).cast("string")))
        .alias("merchant_name"),
        F.when(h % 6 == 0, F.lit(""))
        .when(h % 6 == 1, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("https://shop"),
                            (h % 9).cast("string"),
                            F.lit(".gr/item/"), h.cast("string")))
        .alias("merchant_url"),
        F.element_at(F.array(
            F.lit("49.5"), F.lit("€19.9"), F.lit(""),
            F.lit(None).cast("string"), F.lit("250")),
            (h % 5 + 1).cast("int")).alias("price"),
        F.element_at(F.array(
            F.lit("Εκτός αποθέματος"), F.lit("Άμεσα διαθέσιμο"),
            F.lit("In Stock"), F.lit("out of stock soon"),
            F.lit("Παράδοση σε 1-3 ημέρες"),
            F.lit(None).cast("string"), F.lit("Available now")),
            (h % 7 + 1).cast("int")).alias("availability"))


def duck_skroutz_sql() -> str:
    from mivaa_pdf_extractor_spark.operators.identity import (
        MATCH_STOPWORDS)
    stop = "[" + ", ".join("'" + s + "'" for s in MATCH_STOPWORDS) \
        + "]"

    def mtok(x):
        return ("list_sort(list_distinct(list_filter("
                f"string_split_regex(lower(coalesce({x}, '')), "
                "'[^a-z0-9α-ω]+'), t -> t <> '' AND length(t) >= 3 "
                f"AND NOT list_contains({stop}, t))))")

    def path(u):
        return _MF_PATH_SQL.format(u=u)

    def plaus(q, u, n):
        return f"""CASE
          WHEN len({mtok(q)}) = 0 THEN true
          WHEN len(list_sort(list_distinct({mtok(path(u))}
               || {mtok(n)}))) = 0 THEN false
          ELSE len(list_intersect({mtok(q)},
                   list_sort(list_distinct({mtok(path(u))}
                   || {mtok(n)})))) / len({mtok(q)}) >= 0.30 END"""

    amt = ("nullif(regexp_extract(coalesce({p}, ''), "
           "'([0-9]+(?:\\.[0-9]+)?)', 1), '')::DOUBLE")
    cur = ("CASE regexp_extract(coalesce({p}, ''), '([€$£])', 1) "
           "WHEN '€' THEN 'EUR' WHEN '$' THEN 'USD' "
           "WHEN '£' THEN 'GBP' END")
    return f"""
ssearch AS (
  SELECT doc AS req_id,
         'alpha modelx premium item 10' || CAST(doc % 90 + 10 AS VARCHAR)
           AS query,
         doc % 17 != 0 AS found,
         CASE WHEN doc % 11 = 3 THEN 'Unrelated Widget Thing'
              ELSE 'Alpha ModelX 10'
                   || CAST(doc % 90 + 10 AS VARCHAR) END
           AS product_name,
         CASE WHEN doc % 5 = 0 THEN NULL
              WHEN doc % 6 = 2 THEN 'https://www.skroutz.gr/s/p-10'
                   || CAST(doc % 90 + 10 AS VARCHAR) || '-'
                   || CAST(doc AS VARCHAR) || '.html'
              ELSE 'https://www.skroutz.gr/s/' || CAST(doc AS VARCHAR)
                   || '/alpha-modelx-10'
                   || CAST(doc % 90 + 10 AS VARCHAR) || '.html'
         END AS product_url_raw,
         CASE WHEN doc % 3 = 0
              THEN 'Shop ' || CAST(doc % 7 AS VARCHAR) END
           AS cheapest_merchant_name,
         CASE WHEN doc % 3 = 0
              THEN 'https://shop' || CAST(doc % 7 AS VARCHAR)
                   || '.gr/p/alpha-modelx-10'
                   || CAST(doc % 90 + 10 AS VARCHAR) END
           AS cheapest_merchant_url,
         (['49.5', '€123.45', '', '1299', NULL])
           [CAST(doc % 5 AS INT) + 1] AS best_price,
         CASE WHEN doc % 11 != 0 THEN 'EUR' END AS currency,
         CAST(doc % 6 AS INT) AS merchant_count,
         doc % 13 != 0 AS page_found,
         CASE WHEN doc % 8 = 0 THEN 'Totally Different Gadget'
              ELSE 'Alpha ModelX 10'
                   || CAST(doc % 90 + 10 AS VARCHAR) END
           AS page_product_name,
         doc % 7 != 1 AS has_facets,
         CASE WHEN doc % 10 = 0 THEN ['999111']
              ELSE ['10' || CAST(doc % 90 + 10 AS VARCHAR)] END
           AS sku_tokens,
         CAST(doc % 4 AS INT) AS lim
  FROM docs),
smerch AS (
  SELECT doc AS req_id, CAST(x AS INT) AS midx,
         CASE WHEN (doc*31 + x*7) % 7 = 1 THEN ''
              ELSE 'Shop ' || CAST((doc*31 + x*7) % 9 AS VARCHAR)
         END AS merchant_name,
         CASE WHEN (doc*31 + x*7) % 6 = 0 THEN ''
              WHEN (doc*31 + x*7) % 6 = 1 THEN NULL
              ELSE 'https://shop'
                   || CAST((doc*31 + x*7) % 9 AS VARCHAR)
                   || '.gr/item/' || CAST(doc*31 + x*7 AS VARCHAR)
         END AS merchant_url,
         (['49.5', '€19.9', '', NULL, '250'])
           [CAST((doc*31 + x*7) % 5 AS INT) + 1] AS price,
         (['Εκτός αποθέματος', 'Άμεσα διαθέσιμο', 'In Stock',
           'out of stock soon', 'Παράδοση σε 1-3 ημέρες', NULL,
           'Available now'])[CAST((doc*31 + x*7) % 7 AS INT) + 1]
           AS availability
  FROM docs, LATERAL (SELECT unnest(generate_series(0, doc % 5 - 1))
                      AS x)
  WHERE doc % 5 > 0),
svalid AS (
  SELECT * FROM smerch
  WHERE merchant_url IS NOT NULL AND merchant_url != ''
    AND merchant_name IS NOT NULL AND merchant_name != ''),
shasm AS (SELECT req_id, count(*) > 0 AS has_merchants
          FROM svalid GROUP BY req_id),
sprep AS (
  SELECT s.*,
         coalesce(h.has_merchants, false) AS has_merchants,
         coalesce(s.cheapest_merchant_url, s.product_url_raw)
           AS step1,
         coalesce(s.product_url_raw,
                  coalesce(s.cheapest_merchant_url,
                           s.product_url_raw)) AS page_url
  FROM ssearch s LEFT JOIN shasm h ON s.req_id = h.req_id),
sgate AS (
  SELECT *,
         CASE WHEN NOT has_facets THEN true
              ELSE len(list_filter(
                list_transform(
                  list_filter(sku_tokens, t -> coalesce(t,'') != ''),
                  t -> {_mf_norm_sql('t')}),
                t -> contains(
                  {_mf_norm_sql(f"{path('step1')} || ' ' || coalesce(product_name, '')")},
                  t))) > 0 END AS facet_ok,
         coalesce(merchant_count, 0) > 1
           AND page_url IS NOT NULL AND page_url != ''
           AND contains(page_url, 'skroutz.gr') AS wants_fanout,
         coalesce(page_found, false)
           AND ({plaus('query', 'page_url', 'page_product_name')})
           AS page_ok,
         {plaus('query', 'step1', 'product_name')} AS single_ok
  FROM sprep),
sdec AS (
  SELECT *,
         CASE WHEN NOT found THEN 'not_found'
              WHEN step1 IS NULL THEN 'no_product_url'
              WHEN NOT facet_ok THEN 'facet_mismatch'
              WHEN wants_fanout AND page_ok AND has_merchants
                THEN 'fanout'
              WHEN single_ok THEN 'fallback_single'
              ELSE 'dropped_implausible' END AS decision
  FROM sgate),
sdecision AS (
  SELECT req_id, decision, wants_fanout AS wanted_fanout FROM sdec),
shits AS (
  SELECT m.req_id, m.midx AS hit_idx,
         coalesce(nullif(m.merchant_name, ''), 'Skroutz merchant')
           AS retailer_name,
         m.merchant_url AS product_url,
         {amt.format(p='m.price')} AS price,
         coalesce({cur.format(p='m.price')},
                  coalesce(s.currency, 'EUR')) AS currency,
         CASE WHEN len(list_filter(
                ['εκτός', 'out', 'unavail', 'not available'],
                t -> contains(lower(coalesce(m.availability, '')),
                              t))) > 0 THEN 'out_of_stock'
              ELSE 'in_stock' END AS availability,
         'skroutz' AS source, false AS verified,
         'via Skroutz' AS notes
  FROM svalid m JOIN sdec s ON m.req_id = s.req_id
  WHERE s.decision = 'fanout' AND m.midx < GREATEST(s.lim, 1)
  UNION ALL
  SELECT req_id, 0 AS hit_idx,
         coalesce(nullif(cheapest_merchant_name, ''), 'Skroutz'),
         step1,
         {amt.format(p='best_price')},
         coalesce({cur.format(p='best_price')},
                  coalesce(currency, 'EUR')),
         'in_stock', 'skroutz', false,
         concat_ws(' · ', 'via Skroutz',
           CASE WHEN coalesce(merchant_count, 0) != 0
                THEN CAST(merchant_count AS VARCHAR) || ' shop'
                     || CASE WHEN merchant_count != 1
                             THEN 's' ELSE '' END END,
           CASE WHEN cheapest_merchant_url IS NULL
                THEN 'aggregator URL (click through for merchants)'
           END)
  FROM sdec WHERE decision = 'fallback_single')"""
