"""Pins for the DataForSEO merchant/unified-client folds
(operators/dataforseo vs dataforseo_merchant_service.py:136-368 and
dataforseo_unified_client.py:85-203).

test_parse_matches_sequential_loop re-implements the reference's
_parse_response control flow (a per-item sequential loop) independently and
checks the windowed Spark plan reproduces it row-for-row — including the
key-consumption-by-float-dropped-rows and cap-then-sort pins.
"""

from urllib.parse import unquote
import re

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import dataforseo as dfs


def _seq_parse(items, limit):
    """Sequential re-implementation of merchant_service._parse_response
    semantics (:245-358) for one search, written from the documented
    ladder (not copied): returns list of hit dicts sorted by price."""
    hits, seen = [], set()
    for it in sorted(items, key=lambda r: r["item_ord"]):
        if it["item_type"] != "google_shopping_serp":
            continue
        if it["price_raw"] is None:
            continue
        seller = it["seller"] or it["domain"]
        if not seller and it["shopping_url"]:
            seller = "Google Shopping"
        if not seller:
            continue
        url = it["shopping_url"] or it["url"]
        if not url:
            continue
        title = it["title"] or ""
        key = f"{seller.strip().lower()}::{title[:80].lower()}"
        if key in seen:
            continue
        seen.add(key)
        try:
            price = float(it["price_raw"])
        except (TypeError, ValueError):
            continue
        try:
            old = float(it["old_price_raw"]) \
                if it["old_price_raw"] is not None else None
        except (TypeError, ValueError):
            old = None
        if old is not None and old <= price:
            old = None
        m = re.match(r"https?://(?:www\.)?google\.[a-z.]+/aclk\?.*?"
                     r"adurl=([^&]+)", url)
        clean = unquote(m.group(1)) if m else url
        hits.append({
            "retailer_name": seller, "product_url": clean, "price": price,
            "original_price": old,
            "currency": it["currency"] or "USD",
            "product_title": title if title else None,
            "image_url": it["image_url0"] if it["image_url0"] else None,
            "rating_value": float(it["rating_value"])
            if it["rating_value"] is not None else None,
            "rating_votes": it["rating_votes"],
            "_ord": it["item_ord"],
        })
        if len(hits) >= limit:
            break
    hits.sort(key=lambda h: (h["price"], h["_ord"]))
    return hits


def test_parse_matches_sequential_loop(spark):
    events = spark.range(0, 2000).withColumnRenamed("id", "event_id")
    items = dfs.synth_items(events)
    rows = [r.asDict() for r in items.collect()]
    got = dfs.merchant_parse(items).collect()
    by_search = {}
    for r in rows:
        by_search.setdefault(r["search_id"], []).append(r)
    for sid, grp in by_search.items():
        want = _seq_parse(grp, grp[0]["limit_n"])
        mine = sorted((r for r in got if r["search_id"] == sid),
                      key=lambda r: r["sort_ord"])
        assert len(mine) == len(want), sid
        for m, w in zip(mine, want):
            for k in ("retailer_name", "product_url", "price",
                      "original_price", "currency", "product_title",
                      "image_url", "rating_value", "rating_votes"):
                assert m[k] == w[k], (sid, k, m[k], w[k])
        assert all(r["raw_count"] == len(grp) for r in mine)


def test_task_plan_pins(spark):
    reqs = spark.createDataFrame(
        [(1, "Oak Table ", None, "us", 5, 200, None, "t1"),     # dims falsy
         (2, "Oak Table ", "60x60", "XX", 99, 200, 0, "t2"),    # status 0
         (3, "n", "d", None, 20, 200, 40501, "t3"),             # rejected
         (4, "n", "d", "gr", 20, 500, 20100, "t4"),             # http first
         (5, "n", "d", "GB", 20, 200, 20100, "")],              # no id
        "req_id long, product_name string, dimensions string, "
        "country_code string, limit_req int, http_status int, "
        "task_status_code int, task_id string")
    got = {r["req_id"]: r for r in dfs.merchant_task_plan(reqs).collect()}
    # falsy dims keeps the UNstripped name; truthy dims strips the concat
    assert got[1]["query"] == "Oak Table "
    assert got[2]["query"] == "Oak Table  60x60".strip()
    # depth clamp and locations (US map hit, unknown->GR default)
    assert got[1]["depth"] == 10 and got[2]["depth"] == 40
    assert got[1]["location_code"] == 2840
    assert got[2]["location_code"] == 2300
    assert got[5]["location_code"] == 2826
    # verdict ladder: status 0 is falsy -> not rejected; http wins first
    assert got[2]["verdict"] == "posted"
    assert got[3]["verdict"] == "rejected"
    assert got[4]["verdict"] == "http_error"
    assert got[5]["verdict"] == "no_task_id"


def test_poll_outcome_pins(spark):
    polls = spark.createDataFrame(
        # s1: http-503 decisive poll skipped, then queue -> timeout
        [(1, 0, 503, 20000, 0.5, None), (1, 1, 200, 40602, 0.5, None),
         # s2: success; get_cost 0.0 falls through to post_cost
         (2, 0, 200, 20000, 0.0, 0.04),
         # s3: success; both falsy -> 0.002 default -> credits floor to 1
         (3, 0, 200, 20000, None, None),
         # s4: terminal failure before a later success
         (4, 0, 200, 40100, 0.9, None), (4, 1, 200, 20000, 0.9, None)],
        "search_id long, poll_ord int, http_status int, status_code int, "
        "get_cost double, post_cost double")
    got = {r["search_id"]: r
           for r in dfs.merchant_poll_outcome(polls).collect()}
    assert got[1]["outcome"] == "timeout" and got[1]["credits"] == 0
    assert got[2]["outcome"] == "success" and got[2]["credits"] == 4
    assert got[2]["cost_usd"] == 0.04
    assert got[3]["credits"] == 1 and got[3]["cost_usd"] == 0.002
    assert got[4]["outcome"] == "failed" and got[4]["fail_status"] == 40100


def test_envelope_inline_rows(spark):
    # a result with empty items[] contributes ITSELF (1 row); task cost
    # None -> 0; country map: lowercase hit, unknown/None -> 2840
    res = spark.createDataFrame(
        [(1, 0, 0, 0, None, "gr"), (1, 0, 1, 3, None, "gr"),
         (1, 1, 0, 0, 0.05, "gr"),
         (2, 0, 0, 2, 0.01, "zz"), (3, 0, 0, 0, 0.0, None)],
        "call_id long, task_ord int, res_ord int, inner_items int, "
        "task_cost double, country_code string")
    got = {r["call_id"]: r for r in dfs.dfs_envelope(res).collect()}
    assert got[1]["items_n"] == 5 and abs(got[1]["cost_usd"] - 0.05) < 1e-12
    assert got[1]["location_code"] == 2300
    assert got[2]["location_code"] == 2840
    assert got[3]["location_code"] == 2840
    assert got[3]["items_n"] == 1


def test_clean_url_cases(spark):
    df = spark.createDataFrame(
        [("https://www.google.com/aclk?sig=1&adurl="
          "https%3A%2F%2Fshop.example%2Fp%2F9&x=2",),
         ("https://google.gr/aclk?adurl=https%3A%2F%2Fa.b%2Fc",),
         ("https://example.com/aclk?adurl=https%3A%2F%2Fno",),  # not google
         ("https://direct.example/p",)],
        "u string")
    clean = F.when(
        F.col("u").rlike(dfs.ACLK_RE),
        F.url_decode(F.regexp_extract(F.col("u"), dfs.ACLK_RE, 2))
    ).otherwise(F.col("u"))
    got = [r["c"] for r in df.select(clean.alias("c")).collect()]
    assert got[0] == "https://shop.example/p/9"
    assert got[1] == "https://a.b/c"
    assert got[2] == "https://example.com/aclk?adurl=https%3A%2F%2Fno"
    assert got[3] == "https://direct.example/p"
