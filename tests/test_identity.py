"""Pins the product-identity gates (operators/identity.py) to the
reference's rule tier: model-token normalization across Greek lookalikes
and separator drift, the URL prefilter ladder with the trusted-source
bypass, slug tokenization, the match-kind classification ladder, and the
token-overlap plausibility gate. Expected values hand-computed from
product_identity_service.py / match_filter.py."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import identity as idp


def _one(spark, df_fn, **cols):
    schema = ", ".join(f"{k} string" for k in cols)
    df = spark.createDataFrame([tuple(cols.values())], schema)
    return df_fn(df).collect()[0]


def test_normalize_model_token_greek_lookalikes_and_separators(spark):
    # "7012ΜΤ" (Greek Μ Τ) == "7012 MT" == "7012-mt" (svc.py:77-93)
    df = spark.createDataFrame(
        [("7012ΜΤ",), ("7012 MT",), ("preciosa-01",)],
        "t string")
    got = [r[0] for r in
           df.select(idp.normalize_model_token_col(F.col("t"))).collect()]
    assert got == ["7012MT", "7012MT", "PRECIOSA01"]


def _prefilter(spark, url, retailer="Shop", source="perplexity"):
    df = spark.createDataFrame(
        [(url, retailer, source)],
        "product_url string, retailer_name string, source string")
    return idp.url_prefilter(df).collect()[0]


def test_prefilter_ladder_reasons(spark):
    assert _prefilter(spark, "")["drop_reason"] == "empty URL"
    assert _prefilter(spark, "nonsense")["drop_reason"] == "no host"
    assert _prefilter(spark, "https://a.gr/")["drop_reason"] \
        == "homepage URL"
    assert _prefilter(spark, "https://a.gr/search?q=x")["drop_reason"] \
        == "listing/search path (/search)"
    assert _prefilter(
        spark, "https://a.gr/p/item?ibp=oshop")["drop_reason"] \
        == "Google Shopping SERP URL"
    r = _prefilter(spark, "https://www.bestprice.gr/to/123", "Other Shop")
    assert r["drop_reason"] \
        == "aggregator host bestprice.gr claimed as Other Shop"
    assert _prefilter(spark, "https://a.gr/p/ab")["drop_reason"] \
        == "URL slug too short"
    assert _prefilter(spark, "https://a.gr/p/full-product")["keep"]


def test_prefilter_trusted_source_bypass(spark):
    # SERP-shaped DataForSEO URLs keep (svc.py:150-176); empty/no-host
    # tiers still apply
    assert _prefilter(spark, "https://a.gr/search?q=x",
                      source="dataforseo")["keep"]
    assert not _prefilter(spark, "", source="dataforseo")["keep"]


def test_prefilter_aggregator_needs_mismatched_retailer(spark):
    # retailer whose normalized name contains the aggregator key passes
    # the aggregator tier (slug long enough to clear the final tier)
    assert _prefilter(spark, "https://bestprice.gr/to/12345",
                      "Best Price")["keep"]
    assert _prefilter(spark, "https://bestprice.gr/to/12345",
                      retailer=None)["keep"]


def test_slug_tokens_example_from_reference(spark):
    # svc.py:205-207 docstring example
    df = spark.createDataFrame(
        [("https://apothema.gr/maidtec-by-pyramis-7012mt-105584p",)],
        "u string")
    got = df.select(F.array_join(
        idp.url_slug_tokens_col(F.col("u")), " ")).collect()[0][0]
    assert got == "MAIDTEC BY PYRAMIS 7012MT 105584P"


def test_slug_tokens_strip_page_suffix_and_short(spark):
    df = spark.createDataFrame(
        [("https://a.gr/x/item-a-b2.HTML",)], "u string")
    got = df.select(F.array_join(
        idp.url_slug_tokens_col(F.col("u")), " ")).collect()[0][0]
    assert got == "ITEM B2"  # 'a' dropped (len<2), .HTML stripped


def _verdict(spark, required, skus, name, url):
    df = spark.createDataFrame(
        [(required, skus, name, url)],
        "required_tokens array<string>, sku_tokens array<string>, "
        "product_name string, product_url string")
    r = idp.rule_based_verdict(df).collect()[0]
    return (r["match_kind"], r["match_score"], r["match_basis"])


def test_verdict_ladder(spark):
    u = "https://a.gr/p/item"
    # svc.py:897-905 no tokens at all
    assert _verdict(spark, [], [], "name", u) \
        == ("unverifiable", 50, "no_required_tokens")
    # :909-916 no page identity
    assert _verdict(spark, ["ACME"], [], None, "https://a.gr/") \
        == ("unverifiable", 40, "no_page_identity")
    # :919-929 SKU found (in slug, separator-normalized)
    assert _verdict(spark, ["ACME"], ["7012-MT"], None,
                    "https://a.gr/p/acme-7012mt") \
        == ("exact", 95, "sku_anchor")
    # :930-938 SKU missing but full series match
    assert _verdict(spark, ["ACME", "PRECIOSA"], ["9999X"],
                    "Acme Preciosa 01", u) \
        == ("family", 55, "same_series_different_sku")
    # :939-946 SKU missing, series mismatch
    assert _verdict(spark, ["ACME"], ["9999X"], "Other Thing", u) \
        == ("mismatch", 20, "sku_not_found")
    # :949-956 all required
    assert _verdict(spark, ["ACME", "01"], [], "acme-01", u) \
        == ("exact", 90, "all_required_tokens")
    # :957-965 partial / none
    assert _verdict(spark, ["ACME", "MISSING"], [], "acme thing", u) \
        == ("family", 55, "partial_token_match")
    assert _verdict(spark, ["ACME"], [], "other", u) \
        == ("mismatch", 20, "required_not_found")


def _plaus(spark, query, url, name=None):
    df = spark.createDataFrame(
        [(query, url, name)],
        "query_text string, product_url string, product_name string")
    return idp.plausible_match(df).collect()[0]


def test_plausible_match_ratio_and_edges(spark):
    # 1/2 query tokens in slug -> 0.5 >= 0.30 (match_filter.py:57-91)
    r = _plaus(spark, "basin faucet",
               "https://shop.gr/p/black-faucet-deal")
    assert r["plausible"] and r["overlap_count"] == 1
    # 0 overlap -> implausible (the Brenthaven-lock class of bug)
    assert not _plaus(spark, "basin faucet",
                      "https://shop.gr/p/notebook-lock")["plausible"]
    # all-stopword query -> permissive True (:72-74)
    r = _plaus(spark, "new set cm", "https://shop.gr/p/whatever")
    assert r["plausible"] and r["query_token_count"] == 0
    # no candidate tokens -> False (:85-86)
    assert not _plaus(spark, "basin faucet", "https://shop.gr/")["plausible"]
    # name tokens count toward the candidate set (:82-84)
    assert _plaus(spark, "basin faucet", "https://shop.gr/p/x9",
                  name="Basin Faucet Pro")["plausible"]
