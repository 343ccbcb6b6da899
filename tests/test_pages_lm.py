"""Pins for the page-embedding ledger, the Gopher rule battery, and the
stupid-backoff n-gram LM.

The page tests mirror the reference's own guards
(`tests/unit/test_page_embeddings.py` over
`app/services/embeddings/page_embedding_service.py`): tenant fail-closed,
no silent caps, blank pages skipped not failed, and a page only marked
embedded when a vector actually landed.
"""

import pytest
from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import lm
from mivaa_pdf_extractor_spark.operators.pages import (
    page_embed_outcomes, page_embed_summary, plan_page_targets)
from mivaa_pdf_extractor_spark.operators.text_analysis import gopher_rules


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, workspace_id string, total_pages int")


def _ledger(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, page_number int, cache_status string, "
              "schema_version int")


def _plan(spark, docs, ledger, **kw):
    kw.setdefault("caller_workspace", "ws")
    kw.setdefault("max_pages", 10)
    kw.setdefault("schema_version", 2)
    out = plan_page_targets(_docs(spark, docs), _ledger(spark, ledger), **kw)
    return {(r.doc_id, r.page_number): r.decision for r in out.collect()}


class TestPagePlan:
    def test_tenant_mismatch_fails_closed(self, spark):
        # page_embedding_service.py:265-270 — caller != owner: refuse,
        # plan NO pages at all
        plan = _plan(spark, [(1, "other", 3)], [])
        assert plan == {(1, None): "refused_tenant"}

    def test_missing_workspace_fails_closed(self, spark):
        # :272-276 — an unattributable vector cannot be tenant-filtered
        plan = _plan(spark, [(1, None, 3), (2, "  ", 2)], [])
        assert plan == {(1, None): "refused_no_workspace",
                        (2, None): "refused_no_workspace"}

    def test_cap_is_reported_not_silent(self, spark):
        # :308-325 — the capped tail appears as decision rows
        plan = _plan(spark, [(1, "ws", 5)], [], max_pages=3)
        assert plan == {(1, 1): "pending", (1, 2): "pending",
                        (1, 3): "pending", (1, 4): "over_cap",
                        (1, 5): "over_cap"}

    def test_cap_applies_before_already_filter(self, spark):
        # _resolve_target_pages caps the page LIST, then already-decided
        # pages are removed — a decided page inside the cap window does
        # NOT pull an over-cap page back in
        plan = _plan(spark, [(1, "ws", 4)],
                     [(1, 1, "embedded", 2)], max_pages=2)
        assert plan == {(1, 1): "already", (1, 2): "pending",
                        (1, 3): "over_cap", (1, 4): "over_cap"}

    def test_skipped_counts_as_decided(self, spark):
        # :327-338 — a blank page is a decided outcome, never retried
        plan = _plan(spark, [(1, "ws", 2)], [(1, 1, "skipped", 2)])
        assert plan == {(1, 1): "already", (1, 2): "pending"}

    def test_stale_schema_is_reembedded(self, spark):
        # :343-346 — a row written under an older payload schema is
        # stale by definition
        plan = _plan(spark, [(1, "ws", 2)],
                     [(1, 1, "embedded", 1), (1, 2, "embedded", 2)])
        assert plan == {(1, 1): "pending", (1, 2): "already"}

    def test_failed_is_not_decided(self, spark):
        plan = _plan(spark, [(1, "ws", 1)], [(1, 1, "failed", 2)])
        assert plan == {(1, 1): "pending"}

    def test_zero_page_doc_plans_nothing(self, spark):
        assert _plan(spark, [(1, "ws", 0)], []) == {}


def _outcomes(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id bigint, page_number int, render_ok boolean, "
              "render_bytes int, page_text string, provider_empty boolean, "
              "upsert_refused boolean")
    return {(r.doc_id, r.page_number): r
            for r in page_embed_outcomes(df).collect()}


class TestPageOutcomes:
    def test_blank_and_textless_is_skipped_not_failed(self, spark):
        # :433-441 — nothing to retry; 'failed' would re-render forever
        out = _outcomes(spark, [(1, 1, True, 500, "  ", False, False)])
        r = out[(1, 1)]
        assert r.cache_status == "skipped"
        assert r.error is None
        assert r.storage_path is None  # nothing uploaded for blanks
        assert r.has_text is False

    def test_blank_render_with_text_still_embeds(self, spark):
        out = _outcomes(spark, [(1, 1, True, 500, "real text", False,
                                 False)])
        assert out[(1, 1)].cache_status == "embedded"
        assert out[(1, 1)].has_text is True

    def test_refused_upsert_is_never_recorded_embedded(self, spark):
        # :479-489 — the row must not claim embedded over a refused
        # upsert; the render upload happened, so the path is kept
        out = _outcomes(spark, [(1, 1, True, 9000, "t", False, True)])
        r = out[(1, 1)]
        assert r.cache_status == "failed"
        assert r.error == "vecs upsert refused"
        assert r.storage_path == "extracted/1/pages/page-0001.png"

    def test_provider_empty_precedes_upsert(self, spark):
        out = _outcomes(spark, [(1, 1, True, 9000, "t", True, True)])
        assert out[(1, 1)].error == "embedding provider returned nothing"

    def test_render_failure_precedence(self, spark):
        out = _outcomes(spark, [(1, 1, False, None, "t", True, True),
                                (1, 2, True, None, "t", True, True)])
        assert out[(1, 1)].error == "render raised"
        assert out[(1, 2)].error == "render returned nothing"
        assert out[(1, 1)].cache_status == "failed"

    def test_happy_path_embeds_with_page_indexed_path(self, spark):
        out = _outcomes(spark, [(7, 12, True, 9000, "t", False, False)])
        r = out[(7, 12)]
        assert r.cache_status == "embedded"
        assert r.storage_path == "extracted/7/pages/page-0012.png"


class TestPageSummary:
    def test_rollup_counts_every_outcome_class(self, spark):
        docs = _docs(spark, [(1, "ws", 4), (2, "other", 3)])
        ledger = _ledger(spark, [(1, 1, "embedded", 2)])
        plan = plan_page_targets(docs, ledger, caller_workspace="ws",
                                 max_pages=3, schema_version=2)
        fx = spark.createDataFrame(
            [(1, 2, True, 500, " ", False, False),     # skipped
             (1, 3, True, 9000, "t", False, True)],    # failed
            "doc_id bigint, page_number int, render_ok boolean, "
            "render_bytes int, page_text string, provider_empty boolean, "
            "upsert_refused boolean")
        out = page_embed_summary(plan, page_embed_outcomes(fx))
        rows = {r.doc_id: r for r in out.collect()}
        r1 = rows[1]
        assert (r1.n_embedded, r1.n_skipped_blank, r1.n_failed,
                r1.n_already, r1.n_over_cap) == (0, 1, 1, 1, 1)
        assert r1.refusal is None
        r2 = rows[2]
        assert r2.refusal == "refused_tenant"
        assert (r2.n_embedded + r2.n_failed + r2.n_skipped_blank
                + r2.n_already + r2.n_over_cap) == 0


GOOD = ("The quick brown fox jumps over the lazy dog and that is fine "
        "to have with plenty of normal words to be counted here ") * 4


class TestGopher:
    def _rules(self, spark, text):
        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        return gopher_rules(df).collect()[0]

    def test_good_document_keeps(self, spark):
        assert self._rules(spark, GOOD).gopher_keep is True

    def test_short_doc_fails_word_count(self, spark):
        r = self._rules(spark, "too short")
        assert r.ok_word_count is False and r.gopher_keep is False

    def test_symbol_ratio(self, spark):
        r = self._rules(spark, GOOD + " #tag" * 30)
        assert r.ok_symbols is False

    def test_bullet_lines(self, spark):
        r = self._rules(spark, "\n".join("- item %d here" % i
                                         for i in range(60)))
        assert r.bullet_line_frac == 1.0 and r.ok_bullets is False

    def test_ellipsis_lines(self, spark):
        text = GOOD + "\n" + "\n".join("trailing off..." for _ in range(40))
        r = self._rules(spark, text)
        assert r.ok_ellipsis is False

    def test_alpha_word_fraction(self, spark):
        r = self._rules(spark, "the be to of " + "12345 " * 60)
        assert r.ok_alpha is False

    def test_stopword_floor(self, spark):
        # plenty of words, none from the required-stopword list
        r = self._rules(spark, "lorem ipsum dolor sit amet " * 20)
        assert r.n_stopwords == 0 and r.ok_stopwords is False

    def test_mean_word_length(self, spark):
        r = self._rules(spark, "a b c d e " * 20)
        assert r.mean_word_len == 1.0 and r.ok_word_len is False


class TestNgramLM:
    def test_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "a b d"), (3, "")],
            "doc_id bigint, text string")
        counts = {(r.n, r.gram): r.cnt
                  for r in lm.ngram_counts(df).collect()}
        assert counts[(1, "a")] == 2
        assert counts[(2, "a b")] == 2
        assert counts[(3, "a b c")] == 1
        assert (3, "b c d") not in counts

    def test_backoff_levels(self, spark):
        # model trained on docs 1-2; doc 10 exercises every level:
        # "a b c" = seen trigram, "b c x" has unseen trigram+bigram but
        # seen unigram 'x'?? -> craft precisely
        train = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b e")],
            "doc_id bigint, text string")
        counts = lm.ngram_counts(train)
        score_docs = spark.createDataFrame(
            [(10, "a b c"),      # trigram hit
             (11, "c a b"),      # "c a b": tri miss, bigram "a b" hit
             (12, "d d e"),      # tri miss, "d e" miss, unigram e hit
             (13, "a b zzz")],   # zzz OOV
            "doc_id bigint, text string")
        out = {r.doc_id: r
               for r in lm.lm_doc_scores(score_docs, counts).collect()}
        assert out[10].n_tri_hits == 1
        assert out[11].n_bi_backoff == 1
        assert out[12].n_uni_backoff == 1
        assert out[13].n_oov == 1
        # a seen trigram with deterministic context: S("c"|"a b") = 1/2
        # (c("a b c")=1, c("a b")=2) -> log10(0.5) micro-units
        assert out[10].logprob_micro == -301030
        assert out[10].ppl == pytest.approx(2.0, abs=1e-3)

    def test_short_docs_dropped(self, spark):
        df = spark.createDataFrame([(1, "a b c"), (2, "a b")],
                                   "doc_id bigint, text string")
        out = lm.lm_doc_scores(df, lm.ngram_counts(df))
        assert [r.doc_id for r in out.collect()] == [1]

    def test_higher_ppl_for_out_of_distribution(self, spark):
        train = spark.createDataFrame(
            [(i, "the cat sat on the mat") for i in range(5)],
            "doc_id bigint, text string")
        counts = lm.ngram_counts(train)
        docs = spark.createDataFrame(
            [(100, "the cat sat on the mat"),
             (101, "zebra quartz flux jumble wov")],
            "doc_id bigint, text string")
        out = {r.doc_id: r for r in lm.lm_doc_scores(docs, counts).collect()}
        assert out[100].ppl < out[101].ppl
