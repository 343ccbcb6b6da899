"""URL quality gating for web-scale ingestion.

The reference gates every outbound/ingested URL through two deterministic
validators, reproduced here as native Column logic (no UDFs — a 100 TB
URL list classifies map-only inside whole-stage codegen):

- ``assert_safe_url`` (ssrf_guard.py:51-81): scheme must be http/https,
  hostname must exist and not be a metadata alias
  (localhost / metadata.google.internal / metadata / instance-data),
  and an address in a private / loopback / link-local / multicast /
  reserved / unspecified family is blocked. The reference additionally
  RESOLVES hostnames and checks every DNS record — resolution is
  network-bound and out of scope here; this tier checks literal IPv4
  hosts only (including the reference's unparseable-IP -> block rule for
  out-of-range octets). Documentation-only corner prefixes (TEST-NET
  and friends) are not modeled.
- ``validate_image_url`` (image_download_service.py:211-248): reject
  known non-content extensions on the URL-before-``?`` (the reference
  checks the full lowercased URL up to the first ``?``, fragment
  included — reproduced exactly), and require a non-trivial path
  (``len(path) < 2`` with a present netloc is a bare domain).

``classify_urls`` applies the gates in the reference's precedence order
and emits one status per URL; ``registered_domain`` is the curation-side
grouping key (naive last-two-labels — a public-suffix list is a data
file, not an algorithm; documented limitation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: ssrf_guard.py:22-27
BLOCKED_HOSTNAMES = ("localhost", "metadata.google.internal", "metadata",
                     "instance-data")

#: image_download_service.py:235
NON_CONTENT_EXTENSIONS = (".pdf", ".doc", ".docx", ".xls", ".xlsx", ".css",
                          ".js", ".html", ".htm", ".xml", ".json")

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?([^/:?#]+)"
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_IPV4_RE = r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$"


def parse_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach ``scheme``/``host``/``path`` (lowercased scheme+host, raw
    path before ``?``/``#``), '' when absent — urlparse field semantics
    for the slices the gates read."""
    url = F.col(url_col)
    return (df
            .withColumn("scheme",
                        F.lower(F.regexp_extract(url, _SCHEME_RE, 1)))
            .withColumn("host",
                        F.lower(F.regexp_extract(url, _HOST_RE, 1)))
            .withColumn("path", F.regexp_extract(url, _PATH_RE, 1)))


def _ipv4_blocked(host: F.Column) -> F.Column:
    """Literal-IPv4 family check mirroring ssrf_guard._ip_is_blocked for
    in-scope families; octets > 255 are unparseable -> blocked, like the
    reference's ValueError path.

    Round 6: the split/octet intermediates are bound ONCE via nested
    single-element ``transform`` lambdas (native let-binding). The flat
    form referenced the four octets ~16 times, each copy inlining
    split(regexp_extract(<the caller's whole url expression>)) — with
    the 12-branch synthetic-url chain upstream this pushed the
    whole-stage-codegen method past Janino's 64 KB limit and the stage
    silently fell back to interpreted execution."""
    looks_ipv4 = host.rlike(_IPV4_RE)

    def verdict(o: F.Column) -> F.Column:
        o1, o2, o3, o4 = o["o1"], o["o2"], o["o3"], o["o4"]
        out_of_range = (o1.isNull() | o2.isNull() | o3.isNull()
                        | o4.isNull()
                        | (o1 > 255) | (o2 > 255) | (o3 > 255)
                        | (o4 > 255))
        blocked = (
            (o1 == 0) | (o1 == 10) | (o1 == 127)
            | ((o1 == 169) & (o2 == 254))
            | ((o1 == 172) & (o2 >= 16) & (o2 <= 31))
            | ((o1 == 192) & (o2 == 168))
            # NOT 100.64/10: Python's ipaddress (which the reference
            # guard calls) reports CGNAT space as neither private nor
            # global, so _ip_is_blocked admits it
            | (o1 >= 224))
        return out_of_range | blocked

    def check(parts: F.Column) -> F.Column:
        # try_cast, not cast: a digit run past int range must classify
        # as blocked (the reference's unparseable-IP rule), not throw
        # under ANSI mode and kill the whole classification pass
        octets = F.struct(*[
            F.element_at(parts, i + 1).try_cast("int").alias(f"o{i + 1}")
            for i in range(4)])
        return F.element_at(F.transform(F.array(octets), verdict), 1)

    return looks_ipv4 & F.element_at(
        F.transform(F.array(F.split(host, r"\.")), check), 1)


def classify_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """One status per URL, in the reference's gate order:
    ``blocked_scheme`` -> ``blocked_host`` -> ``blocked_ip`` ->
    ``non_content_ext`` -> ``trivial_path`` -> ``ok``."""
    parsed = parse_urls(df, url_col)
    url = F.col(url_col)
    ext_target = F.substring_index(F.lower(url), "?", 1)
    # exists() over the literal extension array: one bounded expression
    # instead of an 11-term OR chain that re-inlined ext_target (and
    # the url expression under it) per term
    bad_ext = F.exists(
        F.array(*[F.lit(e) for e in NON_CONTENT_EXTENSIONS]),
        lambda e: ext_target.endswith(e))
    status = (
        F.when(~F.col("scheme").isin("http", "https"), "blocked_scheme")
        .when((F.col("host") == "")
              | F.col("host").isin(*BLOCKED_HOSTNAMES), "blocked_host")
        .when(_ipv4_blocked(F.col("host")), "blocked_ip")
        .when(bad_ext, "non_content_ext")
        .when(F.length("path") < 2, "trivial_path")
        .otherwise("ok"))
    return parsed.withColumn("url_status", status)


def registered_domain(host_col) -> F.Column:
    """Naive registrable domain: the last two dot-labels (grouping key
    for per-domain curation caps; no public-suffix list in-sandbox, so
    ``shop.example.co.uk`` yields ``co.uk`` — documented limitation)."""
    parts = F.split(host_col, r"\.")
    n = F.size(parts)
    return F.when(n >= 2, F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1))
    ).otherwise(host_col)


def cap_per_domain(df: DataFrame, cap: int, domain_col: str = "domain",
                   id_col: str = "doc_id", exact: bool = True) -> DataFrame:
    """RefinedWeb-style per-domain document cap: keep at most ``cap``
    documents per registered domain, selected by md5(id) order so the
    sample is deterministic and independent of corpus order.

    Two modes, the same trade documented in sampling.py:

    - ``exact=True``: row_number over a domain-partitioned window —
      exact cap, but a mega-domain's rows shuffle to one task (audit /
      contract mode).
    - ``exact=False``: threshold mode — one tiny (domain, n) aggregate
      broadcasts, then a map-only keep when
      ``uniform_frac(id) * n < cap``; hits the cap in expectation with
      no corpus shuffle (the 100 TB mode).
    """
    if exact:
        w = (Window.partitionBy(domain_col)
             .orderBy(F.md5(F.col(id_col).cast("string")), id_col))
        return (df.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= cap).drop("_rk"))
    from .sampling import _uniform_frac
    counts = df.groupBy(domain_col).agg(F.count("*").alias("_n"))
    return (df.join(F.broadcast(counts), domain_col)
            .filter(_uniform_frac(id_col, salt="domcap|") * F.col("_n")
                    < F.lit(float(cap)))
            .drop("_n"))


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registered-domain admission stats over classified URLs — the
    rollup a per-domain cap/blocklist pass reads. One partial-aggregated
    groupBy on the (tiny-cardinality) domain key."""
    classified = classify_urls(df, url_col)
    return (classified
            .withColumn("domain", registered_domain(F.col("host")))
            .groupBy("domain")
            .agg(F.count("*").alias("n_urls"),
                 F.sum(F.when(F.col("url_status") == "ok", 1).otherwise(0))
                  .cast("bigint").alias("n_ok")))
