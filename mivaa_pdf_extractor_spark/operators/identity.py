"""Product-identity matching gates — the reference's rule-based (no-LLM)
match tier re-expressed as map-only Column plans:

- ``normalize_model_token_col`` — product_identity_service.py:77-93:
  Greek→Latin lookalike mapping (the verbatim 26-char table), uppercase,
  separator removal, for SKU/model equality across "7012ΜΤ"/"7012-MT".
- ``url_prefilter``      — product_identity_service.py:126-200: the
  keep/drop verdict ladder (empty/no-host, homepage, listing-path
  markers, Google-Shopping params, aggregator-host masquerade, short
  slug) with the trusted-source bypass.
- ``url_slug_tokens_col`` — product_identity_service.py:202-223:
  identity-bearing tokens from the last path segment.
- ``rule_based_verdict`` — product_identity_service.py:888-965: the
  required/SKU token-containment classification ladder
  (exact 95/90, family 55, mismatch 20, unverifiable 50/40).
- ``plausible_match``    — modules/greek_marketplaces/match_filter.py:
  query-vs-candidate token-overlap gate at the 0.30 ratio.

Every operator is a pure Column expression over the candidate row — no
joins, no shuffles, no UDFs: at 100 TB these run inside the scan's
whole-stage-codegen projection, which is exactly where a per-URL gate
must live (the reference runs them per hit to avoid spending a Firecrawl
call; the batch twin avoids spending a shuffle).

Scoped deviations (pinned in tests): accent-stripping (NFD, both
services) is confined to the ASCII corpus — the Greek→Latin LOOKALIKE
table, which is the part product codes need, is implemented verbatim via
``translate``; percent-decoding of slugs (match_filter.py's ``unquote``)
is an ingestion concern handled by url_ingest, so paths here are assumed
already-decoded; set-iteration reason strings (aggregator hosts) are
checked in sorted order so the emitted reason is total-ordered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# product_identity_service.py:48-54 — verbatim lookalike table
_GREEK = "ΑΒΕΖΗΙΚΜΝΟΡΤΥΧαβεζηικμνορτυχ"
_LATIN = "ABEZHIKMNOPTYXabezhikmnoptyx"

# product_identity_service.py:104-118 — verbatim constants
AGGREGATOR_HOSTS = sorted([
    "bestprice.gr", "skroutz.gr", "prekmobile.gr",
    "google.com", "google.gr", "google.de", "google.co.uk",
    "shopping.google.com", "idealo.de", "idealo.gr", "idealo.it",
    "pricerunner.com", "kelkoo.com",
])
NON_PRODUCT_PATH_MARKERS = (
    "/search", "/catalog", "/category", "/categories",
    "/brand/", "/brands/", "/shop", "/products?",
    "/tag/", "/tags/", "/collection/", "/collections/",
)
TRUSTED_SOURCES = ("dataforseo", "skroutz", "bestprice", "shopflix")

# match_filter.py:27-38 — verbatim stopword set (Greek + units + generics)
MATCH_STOPWORDS = [
    "και", "για", "της", "του", "των", "στη", "στο", "στις", "στους",
    "από", "ένα", "μία", "ενός", "μιας", "οι", "τα", "τη", "τον", "την",
    "cm", "mm", "inch", "x", "kg", "gr", "ml", "lt", "set", "pcs",
    "νέο", "new", "item", "product",
]


def normalize_model_token_col(col: Column) -> Column:
    """Greek-lookalike map → uppercase → strip ``[\\s\\-_./]+``
    separators (product_identity_service.py:77-93)."""
    return F.regexp_replace(
        F.upper(F.translate(col, _GREEK, _LATIN)), r"[\s\-_./]+", "")


def _host(url: Column) -> Column:
    h = F.lower(F.regexp_extract(F.trim(url),
                                 r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)",
                                 1))
    h = F.regexp_replace(h, r"^\.+", "")
    return F.regexp_replace(h, r"^www\.", "")


def _path(url: Column) -> Column:
    return F.regexp_extract(F.trim(url),
                            r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)",
                            1)


def _query(url: Column) -> Column:
    return F.regexp_extract(F.trim(url), r"\?([^#]*)", 1)


def url_prefilter(df: DataFrame, url_col: str = "product_url",
                  retailer_col: str = "retailer_name",
                  source_col: str = "source") -> DataFrame:
    """Append (keep, drop_reason) per row — the
    ``url_prefilter`` ladder (product_identity_service.py:126-200) in
    the reference's check order. Trusted sources bypass the path/SERP/
    aggregator/slug tiers but not the empty/no-host tiers."""
    url, path, qs = F.col(url_col), _path(F.col(url_col)), \
        _query(F.col(url_col))
    host = _host(F.col(url_col))
    trusted = F.col(source_col).isin(*TRUSTED_SOURCES)

    # marker reasons in tuple order (:181-183)
    listing = F.lit(None).cast("string")
    for m in reversed(NON_PRODUCT_PATH_MARKERS):
        listing = F.when(F.contains(F.lower(path), F.lit(m)),
                         F.lit(f"listing/search path ({m})")) \
            .otherwise(listing)

    # aggregator masquerade (:189-194); sorted host order (documented)
    retailer_guess = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(retailer_col)), r"\s+", ""),
        r"\.", "")
    agg = F.lit(None).cast("string")
    for a in reversed(AGGREGATOR_HOSTS):
        key = a.split(".")[0]
        agg = F.when(
            F.col(retailer_col).isNotNull()
            & (F.col(retailer_col) != "")   # reference: `if retailer_name`
            & F.contains(host, F.lit(key))
            & ~F.contains(retailer_guess, F.lit(key)),
            F.concat(F.lit(f"aggregator host {a} claimed as "),
                     F.col(retailer_col))).otherwise(agg)

    segs = F.filter(F.split(path, "/"), lambda p: p != "")
    # guarded: ANSI mode makes element_at(-1) on an empty array throw
    last_seg = F.when(F.size(segs) > 0, F.element_at(segs, -1))

    reason = (
        F.when(url.isNull() | (F.trim(url) == ""), "empty URL")
        .when(host == "", "no host")
        .when(~trusted & ((path == "") | (path == "/")), "homepage URL")
        .when(~trusted & listing.isNotNull(), listing)
        .when(~trusted & (F.contains(qs, F.lit("ibp=oshop"))
                          | F.contains(qs, F.lit("tbm=shop"))),
              "Google Shopping SERP URL")
        .when(~trusted & agg.isNotNull(), agg)
        .when(~trusted & last_seg.isNotNull()
              & (F.length(last_seg) < 4), "URL slug too short")
        .otherwise(F.lit(None)))
    return df.withColumn("drop_reason", reason) \
             .withColumn("keep", reason.isNull())


def url_slug_tokens_col(url: Column) -> Column:
    """Identity tokens of the last path segment
    (product_identity_service.py:202-223): strip ``.html/.php/.aspx``
    suffixes, split on ``[-_.]+``, keep length >= 2, model-normalize."""
    segs = F.filter(F.split(_path(url), "/"), lambda p: p != "")
    seg = F.when(F.size(segs) > 0, F.element_at(segs, -1))
    seg = F.regexp_replace(F.coalesce(seg, F.lit("")),
                           r"(?i)\.(html?|php|aspx?)$", "")
    toks = F.filter(F.split(seg, r"[-_.]+"),
                    lambda t: (t != "") & (F.length(t) >= 2))
    return F.transform(toks, normalize_model_token_col)


def rule_based_verdict(df: DataFrame,
                       required_col: str = "required_tokens",
                       sku_col: str = "sku_tokens",
                       name_col: str = "product_name",
                       url_col: str = "product_url") -> DataFrame:
    """Append (match_kind, match_score, match_basis) — the no-LLM
    classification ladder (product_identity_service.py:888-965):
    SKU containment → exact 95; all required (SKU absent from page,
    anchors present) → family 55; brand/series path: all → exact 90,
    some → family 55, none → mismatch 20; no tokens → unverifiable
    50, no page identity → unverifiable 40. ``match_basis`` carries the
    stable code of the reference's note strings."""
    norm = normalize_model_token_col
    required = F.array_distinct(F.filter(
        F.transform(F.col(required_col), norm), lambda t: t != ""))
    skus = F.array_distinct(F.filter(
        F.transform(F.coalesce(F.col(sku_col),
                               F.array().cast("array<string>")), norm),
        lambda t: t != ""))
    slug = F.array_join(url_slug_tokens_col(F.col(url_col)), " ")
    name = F.coalesce(F.col(name_col), F.lit(""))
    haystack = norm(F.concat_ws(" ", name, slug))
    no_identity = (name == "") & (slug == "")

    sku_hit = F.exists(skus, lambda t: F.contains(haystack, t))
    req_hits = F.size(F.filter(required,
                               lambda t: F.contains(haystack, t)))
    all_req = (F.size(required) > 0) & (req_hits == F.size(required))

    verdict = (
        F.when((F.size(required) == 0) & (F.size(skus) == 0), F.struct(
            F.lit("unverifiable").alias("k"), F.lit(50).alias("s"),
            F.lit("no_required_tokens").alias("b")))
        .when(no_identity, F.struct(
            F.lit("unverifiable").alias("k"), F.lit(40).alias("s"),
            F.lit("no_page_identity").alias("b")))
        .when((F.size(skus) > 0) & sku_hit, F.struct(
            F.lit("exact").alias("k"), F.lit(95).alias("s"),
            F.lit("sku_anchor").alias("b")))
        .when((F.size(skus) > 0) & all_req, F.struct(
            F.lit("family").alias("k"), F.lit(55).alias("s"),
            F.lit("same_series_different_sku").alias("b")))
        .when(F.size(skus) > 0, F.struct(
            F.lit("mismatch").alias("k"), F.lit(20).alias("s"),
            F.lit("sku_not_found").alias("b")))
        .when(all_req, F.struct(
            F.lit("exact").alias("k"), F.lit(90).alias("s"),
            F.lit("all_required_tokens").alias("b")))
        .when(req_hits > 0, F.struct(
            F.lit("family").alias("k"), F.lit(55).alias("s"),
            F.lit("partial_token_match").alias("b")))
        .otherwise(F.struct(
            F.lit("mismatch").alias("k"), F.lit(20).alias("s"),
            F.lit("required_not_found").alias("b"))))
    return (df.withColumn("__v", verdict)
            .withColumn("match_kind", F.col("__v.k"))
            .withColumn("match_score", F.col("__v.s"))
            .withColumn("match_basis", F.col("__v.b"))
            .drop("__v"))


def _match_tokens(col: Column) -> Column:
    """match_filter.py:45-54 ``_tokenize``: lowercase, split on
    ``[^a-z0-9α-ω]+``, drop stopwords and tokens shorter than 3;
    returns the distinct token set as a sorted array."""
    stop = F.array(*[F.lit(s) for s in MATCH_STOPWORDS])
    toks = F.split(F.lower(F.coalesce(col, F.lit(""))),
                   r"[^a-z0-9α-ω]+")
    return F.array_sort(F.array_distinct(F.filter(
        toks,
        lambda t: (t != "") & (F.length(t) >= 3)
        & ~F.array_contains(stop, t))))


def plausible_match(df: DataFrame, query_col: str = "query_text",
                    url_col: str = "product_url",
                    name_col: str = "product_name",
                    min_overlap_ratio: float = 0.30) -> DataFrame:
    """Append (query_token_count, overlap_count, plausible) — the
    token-overlap false-positive gate (match_filter.py:57-91): at least
    ``min_overlap_ratio`` of the distinct query tokens must appear in
    the candidate's slug-or-name token set; empty query sets pass
    (permissive), empty candidate sets fail."""
    q = _match_tokens(F.col(query_col))
    cand = F.array_sort(F.array_distinct(F.concat(
        _match_tokens(_path(F.col(url_col))),
        _match_tokens(F.col(name_col)))))
    overlap = F.size(F.array_intersect(q, cand))
    plausible = (F.when(F.size(q) == 0, F.lit(True))
                 .when(F.size(cand) == 0, F.lit(False))
                 .otherwise(overlap / F.size(q)
                            >= F.lit(float(min_overlap_ratio))))
    return (df.withColumn("query_token_count", F.size(q))
            .withColumn("overlap_count", overlap)
            .withColumn("plausible", plausible))


# ---------------------------------------------------------------------------
# Perplexity price-search pre-classifier
# (perplexity_price_search_service.py:96-156)

_SEP_RE = "[ \\t\\r\\n\\x0b\\f\\-_./]+"


def price_rule_shortcut(cands: DataFrame) -> DataFrame:
    """``_rule_shortcut``: the cheap deterministic verdict that spares
    the LLM call.  Haystack = upper(name) + ' ' + upper(joined slug
    tokens) with every separator run removed; NULL facets defer; empty
    name AND empty slug list -> unverifiable 40; any (non-empty,
    uppercased, NOT separator-stripped) SKU token contained in the
    haystack -> exact 95 (a SKU carrying separators can never match —
    pinned); ALL separator-stripped required tokens missing ->
    mismatch 15 with the Python-list-repr note (a separator-only
    required token normalizes to '' which is a substring of
    everything, so it counts as PRESENT — pinned); else defer.

    Also emits the ``_facets_hash`` canonical payload (sort_keys JSON
    over upper brand/model, sorted upper sku_tokens, lower
    product_type; 'none' for NULL facets) — the sha1 itself is pinned
    in pytest (DuckDB has no sha1).

    cands: (cand_id, product_name, url_slug_tokens array<string>,
    has_facets boolean, brand, model, product_type,
    sku_tokens array<string>, required_tokens array<string>)."""
    name = F.upper(F.coalesce("product_name", F.lit("")))
    slug_arr = F.coalesce("url_slug_tokens",
                          F.array().cast("array<string>"))
    slug = F.upper(F.array_join(slug_arr, " "))
    hay = F.regexp_replace(F.concat(name, F.lit(" "), slug),
                           _SEP_RE, "")
    skus = F.filter(
        F.transform(F.coalesce("sku_tokens",
                               F.array().cast("array<string>")),
                    F.upper), lambda t: t != "")
    sku_hit = F.exists(skus, lambda t: hay.contains(t))
    req = F.transform(
        F.filter(F.coalesce("required_tokens",
                            F.array().cast("array<string>")),
                 lambda t: t.isNotNull() & (t != "")),
        lambda t: F.regexp_replace(F.upper(t), _SEP_RE, ""))
    missing = F.filter(req, lambda t: ~hay.contains(t))
    all_missing = (F.size(missing) > 0) \
        & (F.size(missing) == F.size(req))
    note = F.concat(
        F.lit("Brand/model tokens missing: ["),
        F.array_join(F.transform(
            missing, lambda t: F.concat(F.lit("'"), t, F.lit("'"))),
            ", "), F.lit("]"))
    empty_in = (name == "") & (F.size(slug_arr) == 0)
    kind = (F.when(~F.col("has_facets"), "defer")
            .when(empty_in, "unverifiable")
            .when(sku_hit, "exact")
            .when(all_missing, "mismatch")
            .otherwise("defer"))
    score = (F.when(kind == "unverifiable", 40)
             .when(kind == "exact", 95)
             .when(kind == "mismatch", 15)).cast("int")
    payload = F.when(~F.col("has_facets"), "none").otherwise(F.concat(
        F.lit('{"brand": "'),
        F.upper(F.coalesce("brand", F.lit(""))),
        F.lit('", "model": "'),
        F.upper(F.coalesce("model", F.lit(""))),
        F.lit('", "product_type": "'),
        F.lower(F.coalesce("product_type", F.lit(""))),
        F.lit('", "sku_tokens": ['),
        F.array_join(F.transform(F.array_sort(F.transform(
            F.coalesce("sku_tokens", F.array().cast("array<string>")),
            F.upper)), lambda t: F.concat(F.lit('"'), t, F.lit('"'))),
            ", "),
        F.lit("]}")))
    return cands.select(
        "cand_id", kind.alias("match_kind"),
        score.alias("match_score"),
        F.when(kind == "mismatch", note).alias("match_note"),
        payload.alias("facets_payload"))


def price_shortcut_sql() -> str:
    """DuckDB twin over a CTE cands_in (same shape)."""
    sep = _SEP_RE
    return f"""
    b AS (SELECT cand_id, has_facets, brand, model, product_type,
                 upper(coalesce(product_name, '')) AS name,
                 coalesce(url_slug_tokens, CAST([] AS VARCHAR[]))
                     AS slug_arr,
                 coalesce(sku_tokens, CAST([] AS VARCHAR[])) AS skus0,
                 coalesce(required_tokens, CAST([] AS VARCHAR[]))
                     AS req0
          FROM cands_in),
    h AS (SELECT *, regexp_replace(name || ' '
                 || upper(array_to_string(slug_arr, ' ')),
                 '{sep}', '', 'g') AS hay,
                 list_filter(list_transform(skus0, t -> upper(t)),
                             t -> t <> '') AS skus,
                 list_transform(list_filter(req0,
                     t -> t IS NOT NULL AND t <> ''),
                     t -> regexp_replace(upper(t), '{sep}', '', 'g'))
                     AS req
          FROM b),
    k AS (SELECT *,
        list_filter(req, t -> NOT contains(hay, t)) AS missing,
        len(list_filter(skus, t -> contains(hay, t))) > 0 AS sku_hit,
        name = '' AND len(slug_arr) = 0 AS empty_in
        FROM h),
    v AS (SELECT *, CASE
            WHEN NOT has_facets THEN 'defer'
            WHEN empty_in THEN 'unverifiable'
            WHEN sku_hit THEN 'exact'
            WHEN len(missing) > 0 AND len(missing) = len(req)
                THEN 'mismatch'
            ELSE 'defer' END AS match_kind
          FROM k)
    SELECT cand_id, match_kind,
           CAST(CASE WHEN match_kind = 'unverifiable' THEN 40
                     WHEN match_kind = 'exact' THEN 95
                     WHEN match_kind = 'mismatch' THEN 15 END AS INT)
               AS match_score,
           CASE WHEN match_kind = 'mismatch'
                THEN 'Brand/model tokens missing: ['
                     || array_to_string(list_transform(missing,
                            t -> '''' || t || ''''), ', ') || ']'
           END AS match_note,
           CASE WHEN NOT has_facets THEN 'none'
                ELSE '{{"brand": "' || upper(coalesce(brand, ''))
                     || '", "model": "' || upper(coalesce(model, ''))
                     || '", "product_type": "'
                     || lower(coalesce(product_type, ''))
                     || '", "sku_tokens": ['
                     || coalesce(array_to_string(list_transform(
                            list_sort(list_transform(skus0,
                                t -> upper(t))),
                            t -> '"' || t || '"'), ', '), '')
                     || ']}}' END AS facets_payload
    FROM v"""


def synth_price_cands(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    name = (F.when(e % 6 == 0, F.lit(""))
            .when(e % 6 == 1, F.concat(F.lit("Blum Hinge 70T"),
                                       (e % 9).cast("string")))
            .when(e % 6 == 2, "Generic cabinet part")
            .otherwise(F.concat(F.lit("AlfaModell "),
                                (e % 5).cast("string"))))
    slug = (F.when(e % 6 == 0, F.array().cast("array<string>"))
            .when(e % 4 == 0, F.array(F.lit("blum"), F.concat(
                F.lit("70t"), (e % 9).cast("string"))))
            .otherwise(F.array(F.lit("shop"), F.lit("item"))))
    skus = (F.when(e % 5 == 0, F.array(F.concat(
        F.lit("70T"), (e % 9).cast("string"))))
        .when(e % 5 == 1, F.array(F.lit("AB-12"), F.lit("")))
        .otherwise(F.array().cast("array<string>")))
    req = (F.when(e % 3 == 0, F.array(F.lit("Blum"),
                                      F.lit("Modell")))
           .when(e % 3 == 1, F.array(F.lit("Zeta"), F.lit("Q9")))
           .otherwise(F.array().cast("array<string>")))
    return events.select(
        e.alias("cand_id"), name.alias("product_name"),
        slug.alias("url_slug_tokens"),
        (e % 7 != 6).alias("has_facets"),
        F.when(e % 2 == 0, "Blum").alias("brand"),
        F.when(e % 3 == 0, F.concat(F.lit("Modell"),
                                    (e % 4).cast("string")))
        .alias("model"),
        F.when(e % 4 == 0, "Hinge").alias("product_type"),
        skus.alias("sku_tokens"), req.alias("required_tokens"))


SYNTH_PRICE_CANDS_SQL = """
SELECT event_id AS cand_id,
       CASE WHEN event_id % 6 = 0 THEN ''
            WHEN event_id % 6 = 1
                THEN 'Blum Hinge 70T' || (event_id % 9)
            WHEN event_id % 6 = 2 THEN 'Generic cabinet part'
            ELSE 'Alfa Modell ' || (event_id % 5) END
           AS product_name,
       CASE WHEN event_id % 6 = 0 THEN CAST([] AS VARCHAR[])
            WHEN event_id % 4 = 0
                THEN ['blum', '70t' || (event_id % 9)]
            ELSE ['shop', 'item'] END AS url_slug_tokens,
       event_id % 7 <> 6 AS has_facets,
       CASE WHEN event_id % 2 = 0 THEN 'Blum' END AS brand,
       CASE WHEN event_id % 3 = 0
            THEN 'Modell' || (event_id % 4) END AS model,
       CASE WHEN event_id % 4 = 0 THEN 'Hinge' END AS product_type,
       CASE WHEN event_id % 5 = 0 THEN ['70T' || (event_id % 9)]
            WHEN event_id % 5 = 1 THEN ['AB-12', '']
            ELSE CAST([] AS VARCHAR[]) END AS sku_tokens,
       CASE WHEN event_id % 3 = 0 THEN ['Blum', 'Modell']
            WHEN event_id % 3 = 1 THEN ['Zeta', 'Q9']
            ELSE CAST([] AS VARCHAR[]) END AS required_tokens
FROM events"""
