"""URL gate semantics (reference: ssrf_guard.py:22-81 literal-IP tier,
image_download_service.py:211-248), pinned against a Python mirror built
on urlparse/ipaddress."""

import ipaddress
from urllib.parse import urlparse

import pytest
from pyspark.sql import Row, functions as F

from mivaa_pdf_extractor_spark.operators import urls as U


def _mirror_status(url):
    parsed = urlparse(url.strip())
    scheme = parsed.scheme.lower()
    if scheme not in ("http", "https"):
        return "blocked_scheme"
    host = parsed.hostname or ""
    if not host or host in U.BLOCKED_HOSTNAMES:
        return "blocked_host"
    # literal-IPv4 tier of _ip_is_blocked (families in scope)
    if host.replace(".", "").isdigit() and host.count(".") == 3:
        try:
            ip = ipaddress.ip_address(host)
            if (ip.is_private or ip.is_loopback or ip.is_link_local
                    or ip.is_reserved or ip.is_multicast
                    or ip.is_unspecified):
                return "blocked_ip"
        except ValueError:
            return "blocked_ip"
    url_path = url.lower().split("?")[0]
    if any(url_path.endswith(ext) for ext in U.NON_CONTENT_EXTENSIONS):
        return "non_content_ext"
    if len(parsed.path) < 2:
        return "trivial_path"
    return "ok"


URLS = [
    "https://example.com/media/product/12345",
    "http://cdn.example.org/img/77.png",
    "ftp://example.com/file",
    "file:///etc/passwd",
    "https://localhost/admin",
    "https://metadata.google.internal/computeMetadata/v1/",
    "https://instance-data/latest",
    "https://169.254.169.254/latest/meta-data",
    "https://192.168.3.7/router",
    "https://10.0.0.8/internal",
    "https://127.0.0.1/loop",
    "https://172.20.1.1/private",
    "https://100.80.1.1/cgnat",
    "https://224.0.0.1/mcast",
    "https://240.1.2.3/reserved",
    "https://0.0.0.0/zero",
    "https://999.1.2.3/badoctet",
    "https://3000000000.1.1.1/overflow-octet",  # > int32: must block, not throw
    "https://8.8.8.8/public-ip-ok",
    "https://example.com/report.pdf",
    "https://example.com/app.js?v=3",
    "https://example.com/data.json",
    "https://example.com/page.pdf?download=1",  # ext check is before '?'
    "https://example.com/",
    "https://example.com",
    "https://user:pw@Example.COM:8443/Shop/Item",
    "https://shop.example.co.uk/products/1",
]


def test_classify_matches_mirror(spark):
    df = spark.createDataFrame([Row(url=u) for u in URLS])
    got = {r["url"]: r["url_status"]
           for r in U.classify_urls(df).collect()}
    for u in URLS:
        assert got[u] == _mirror_status(u), u
    # spot-pin the interesting branches explicitly
    assert got["https://999.1.2.3/badoctet"] == "blocked_ip"
    assert got["https://8.8.8.8/public-ip-ok"] == "ok"
    assert got["https://example.com/page.pdf?download=1"] == "non_content_ext"
    assert got["https://example.com"] == "trivial_path"
    assert got["https://user:pw@Example.COM:8443/Shop/Item"] == "ok"


def test_cap_per_domain(spark):
    import hashlib
    rows = [Row(doc_id=i, domain="a.com" if i < 40 else "b.org")
            for i in range(50)]
    df = spark.createDataFrame(rows)
    out = U.cap_per_domain(df, cap=5, exact=True).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r["doc_id"])
    # exact cap per domain (b.org has 10 rows -> capped to 5 too)
    assert len(by_dom["a.com"]) == 5 and len(by_dom["b.org"]) == 5
    # selection = lowest md5(id) ranks, reproducible
    exp = sorted(range(40),
                 key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:5]
    assert sorted(by_dom["a.com"]) == sorted(exp)

    # threshold mode: deterministic, near the cap in expectation, and a
    # per-domain subset independent of corpus order
    t1 = {r["doc_id"] for r in U.cap_per_domain(df, cap=20,
                                                exact=False).collect()}
    t2 = {r["doc_id"] for r in U.cap_per_domain(df, cap=20,
                                                exact=False).collect()}
    assert t1 == t2
    n_a = sum(1 for i in t1 if i < 40)
    assert 10 <= n_a <= 30  # E[n_a] = 20, loose O(sqrt(n)) bound


def test_registered_domain_and_stats(spark):
    df = spark.createDataFrame(
        [Row(url="https://a.shop.example.com/x/1"),
         Row(url="https://example.com/y/2"),
         Row(url="https://example.com/bad.pdf"),
         Row(url="ftp://example.com/z")])
    stats = {r["domain"]: (r["n_urls"], r["n_ok"])
             for r in U.domain_stats(df).collect()}
    assert stats["example.com"] == (4, 2)
