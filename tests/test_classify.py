"""Pins the classifier-inference operators (operators/classify.py):
integer IDF weight formula, per-doc integer-mean scoring with OOV and
empty-document handling, and deterministic TF-IDF top-k cuts."""

from mivaa_pdf_extractor_spark.operators import classify as cl


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_df_weights_formula(spark):
    # 'rare' in 1 of 4 docs -> 1000 - 250 = 750; 'common' in all -> 0
    d = _docs(spark, [(i, "common" + (" rare" if i == 0 else ""))
                      for i in range(4)])
    w = {r["token"]: r for r in cl.train_df_weights(d).collect()}
    assert w["rare"]["weight_micro"] == 750 and w["rare"]["df"] == 1
    assert w["common"]["weight_micro"] == 0 and w["common"]["df"] == 4


def test_classify_quality_integer_mean_and_threshold(spark):
    d = _docs(spark, [(0, "aa bb"), (1, "aa aa aa"), (2, "bb")])
    w = spark.createDataFrame(
        [("aa", 900), ("bb", 100)], "token string, weight_micro long")
    out = {r["doc_id"]: r for r in
           cl.classify_quality(d, w, keep_threshold_micro=500).collect()}
    assert out[0]["score_micro"] == 500 and out[0]["keep"]      # (900+100)//2
    assert out[1]["score_micro"] == 900 and out[1]["keep"]
    assert out[2]["score_micro"] == 100 and not out[2]["keep"]


def test_classify_quality_oov_and_empty(spark):
    # OOV tokens score 0 but count in the denominator; a doc with no
    # alpha tokens scores 0 with n_tokens 0
    d = _docs(spark, [(0, "aa zz"), (1, "123 !!")])
    w = spark.createDataFrame([("aa", 800)],
                              "token string, weight_micro long")
    out = {r["doc_id"]: r for r in
           cl.classify_quality(d, w, keep_threshold_micro=500).collect()}
    assert out[0]["n_tokens"] == 2 and out[0]["score_micro"] == 400
    assert out[1]["n_tokens"] == 0 and out[1]["score_micro"] == 0
    assert not out[1]["keep"]


def test_classify_tokenizer_splits_non_alpha(spark):
    d = _docs(spark, [(0, "Foo-bar BAZ2foo")])
    w = spark.createDataFrame([("foo", 10), ("bar", 20), ("baz", 30)],
                              "token string, weight_micro long")
    out = cl.classify_quality(d, w, keep_threshold_micro=0).collect()[0]
    assert out["n_tokens"] == 4  # foo, bar, baz, foo
    assert out["score_micro"] == (10 + 20 + 30 + 10) // 4


def test_tfidf_top_terms_order_and_tiebreak(spark):
    # tf*weight: cc=2*300=600, bb=1*500, aa=3*100=300; zz ties bb at
    # 500 -> tie broken by token asc (bb before zz)
    d = _docs(spark, [(0, "aa aa aa bb cc cc zz")])
    w = spark.createDataFrame(
        [("aa", 100), ("bb", 500), ("cc", 300), ("zz", 500)],
        "token string, weight_micro long")
    out = cl.tfidf_top_terms(d, w, k=3).collect()
    got = [(r["rank"], r["token"], r["score_micro"]) for r in
           sorted(out, key=lambda r: r["rank"])]
    assert got == [(1, "cc", 600), (2, "bb", 500), (3, "zz", 500)]


def test_tfidf_k_cut_per_doc(spark):
    d = _docs(spark, [(0, "a1 b1 c1 d1".replace("1", "x")),
                      (1, "ax bx")])
    w = spark.createDataFrame(
        [("ax", 4), ("bx", 3), ("cx", 2), ("dx", 1)],
        "token string, weight_micro long")
    out = cl.tfidf_top_terms(d, w, k=2).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["token"])
    assert sorted(per_doc[0]) == ["ax", "bx"] and len(per_doc[1]) == 2
