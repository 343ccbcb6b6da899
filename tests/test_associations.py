"""Pins for the multi-modal image-product association scorer
(operators/associations.py) against transcriptions of
multi_modal_image_product_association_service.py:210-478,581-642."""

import pytest

from mivaa_pdf_extractor_spark.operators import associations as assoc

IMG_SCHEMA = ("doc_id long, image_id long, page_number int, "
              "caption string, alt_text string, embedding array<double>")
PROD_SCHEMA = ("doc_id long, product_id long, name string, "
               "description string, page_number int, "
               "page_range array<int>, embedding array<double>")


def _score(spark, img_rows, prod_rows, threshold=0.0):
    images = spark.createDataFrame(img_rows, IMG_SCHEMA)
    products = spark.createDataFrame(prod_rows, PROD_SCHEMA)
    return {(r.image_id, r.product_id): r
            for r in assoc.score_associations(
                images, products, overall_threshold=threshold).collect()}


def test_spatial_hard_rule(spark):
    # post-audit rule (:210-256): in-set 1.0; ADJACENT page 0.0 (the
    # incident the docstring pins); missing image page 0.0; product
    # without any page info 0.0. Captions/embeddings neutral.
    imgs = [(1, 10, 2, "", "", None), (1, 11, 4, "", "", None),
            (1, 12, 0, "", "", None)]
    prods = [(1, 20, "N", "d", 0, [2, 3], None),
             (1, 21, "N", "d", 2, None, None),
             (1, 22, "N", "d", 0, None, None)]
    out = _score(spark, imgs, prods)
    assert out[(10, 20)].spatial_score == 1.0   # in page_range
    assert out[(10, 21)].spatial_score == 1.0   # in top-level page
    assert out[(11, 20)].spatial_score == 0.0   # adjacent page -> 0
    assert out[(12, 20)].spatial_score == 0.0   # image page missing
    assert out[(10, 22)].spatial_score == 0.0   # product pages missing


def test_caption_generic_and_boosts(spark):
    imgs = [(1, 10, 1, "Image from page 7", "", None),
            (1, 11, 1, "", "document image", None),   # alt_text generic
            (1, 12, 1, "Alpha Series tile photo", "", None),
            (1, 13, 1, "beta finish closeup", "", None),
            (1, 14, 1, "the and for", "", None),      # all stopwords
            (1, 15, 1, "plain matte sample", "", None)]
    prods = [(1, 20, "Alpha Series", "alpha series matte tiles",
              1, None, None),
             (1, 21, "Beta Quartz", "", 1, None, None),
             (1, 22, "X", "plain smooth surface", 1, None, None)]
    out = _score(spark, imgs, prods)
    assert out[(10, 20)].caption_score == 0.5   # generic caption
    assert out[(11, 20)].caption_score == 0.5   # generic alt fallback
    assert out[(14, 20)].caption_score == 0.5   # empty word set
    # full-name boost: j = |{alpha,series}| / |{alpha,series,tile,
    # photo,matte,tiles}| = 1/3; min(1, 1/3 + 0.4)
    assert out[(12, 20)].caption_score == pytest.approx(1 / 3 + 0.4)
    # first-word boost (len('beta') > 3): j = 1/4; 0.25 + 0.25
    assert out[(13, 21)].caption_score == pytest.approx(0.5)
    # len<=2 name never substring-boosts even though 'x' could match:
    # plain scale 0.3 + j*0.7 with j = |{plain}|/|{plain,matte,sample,
    # smooth,surface}| = 1/5
    assert out[(15, 22)].caption_score == pytest.approx(0.3 + 0.7 / 5)


def test_clip_paths(spark):
    imgs = [(1, 10, 1, "", "", [1.0, 0.0, 0.0, 0.0]),
            (1, 11, 1, "", "", [-1.0, 0.0, 0.0, 0.0]),
            (1, 12, 1, "", "", [0.0, 0.0, 0.0, 0.0]),   # zero magnitude
            (1, 13, 1, "", "", [1.0, 2.0, -1.0]),       # dim mismatch
            (1, 14, 1, "", "", None)]                   # missing
    prods = [(1, 20, "N", "d", 1, None, [2.0, 0.0, 0.0, 0.0]),
             (1, 21, "N", "d", 1, None, None)]
    out = _score(spark, imgs, prods)
    assert out[(10, 20)].clip_score == 1.0    # cos 1 -> (1+1)/2
    assert out[(11, 20)].clip_score == 0.0    # cos -1 -> 0
    assert out[(12, 20)].clip_score == 0.5    # zero-mag -> cos 0 -> 0.5
    assert out[(13, 20)].clip_score == 0.5    # mismatch -> cos 0 -> 0.5
    assert out[(14, 20)].clip_score == 0.5    # image emb missing
    assert out[(10, 21)].clip_score == 0.5    # product emb missing


def test_overall_confidence_reasoning_and_threshold(spark):
    imgs = [(1, 10, 2, "", "", None), (1, 11, 9, "", "", None)]
    prods = [(1, 20, "N", "d", 2, None, None)]
    images = spark.createDataFrame(imgs, IMG_SCHEMA)
    products = spark.createDataFrame(prods, PROD_SCHEMA)
    rows = {r.image_id: r for r in assoc.score_associations(
        images, products).collect()}
    r = rows[10]
    # scores (1, .5, .5): overall .7; var = 1/18; conf = .7 + .3 - 1/18
    assert r.overall_score == pytest.approx(0.7)
    assert r.confidence == pytest.approx(0.7 + 0.3 - 1 / 18)
    assert r.reasoning == ("Good association (same/adjacent page, "
                           "moderate text similarity, "
                           "moderate visual relevance)")
    assert r.min_page_diff == 0 and r.same_page_group
    # spatial 0 row: overall exactly 0.3 -> kept by >= threshold
    assert rows[11].overall_score == pytest.approx(0.3)
    assert rows[11].min_page_diff == 7 and not rows[11].same_page_group


def test_greedy_dual_caps(spark):
    # caps (1,1): best pair wins, then both its image and product are
    # exhausted; (B,Q) is the only remaining admissible pair (:456-478)
    rows = [(1, 1, 10, 0.9, 0.9), (1, 1, 11, 0.8, 0.8),
            (1, 2, 10, 0.7, 0.7), (1, 2, 11, 0.6, 0.6)]
    df = spark.createDataFrame(
        rows, "doc_id long, image_id long, product_id long, "
              "overall_score double, confidence double")
    out = {(r.image_id, r.product_id): r
           for r in assoc.apply_association_limits(
               df, max_per_image=1, max_per_product=1).collect()}
    assert set(out) == {(1, 10), (2, 11)}
    assert out[(1, 10)].pick_order == 1
    assert out[(2, 11)].pick_order == 2


def test_greedy_default_caps_and_tiebreak(spark):
    # equal scores break by (image_id, product_id); per-image cap 3
    # stops the 4th product for image 1, per-product cap respected
    rows = [(1, 1, p, 0.5, 0.5) for p in (10, 11, 12, 13)]
    df = spark.createDataFrame(
        rows, "doc_id long, image_id long, product_id long, "
              "overall_score double, confidence double")
    out = assoc.apply_association_limits(df).collect()
    assert sorted(r.product_id for r in out) == [10, 11, 12]
    assert [r.pick_order for r in
            sorted(out, key=lambda r: r.product_id)] == [1, 2, 3]


def test_stats_buckets_and_micro_avg(spark):
    rows = [(1, 1, 10, 0.85, 0.9), (1, 1, 11, 0.65, 0.7),
            (1, 2, 10, 0.45, 0.5), (1, 2, 11, 0.35, 0.3),
            (2, 3, 30, 0.8, 1.0)]
    df = spark.createDataFrame(
        rows, "doc_id long, image_id long, product_id long, "
              "overall_score double, confidence double")
    out = {r.doc_id: r for r in assoc.association_stats(df).collect()}
    d1 = out[1]
    assert d1.total_associations == 4
    assert (d1.n_high, d1.n_good, d1.n_moderate, d1.n_low) == (1, 1, 1, 1)
    assert d1.avg_confidence_micro == 600000
    assert out[2].n_high == 1 and out[2].avg_confidence_micro == 1000000
