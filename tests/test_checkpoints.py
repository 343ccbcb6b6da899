"""Pins for checkpoint recovery audit (operators/checkpoints.py;
reference checkpoint_recovery_service.py)."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators.checkpoints import (
    audit_checkpoints, last_checkpoints, resume_eligibility)

NOW = 1_700_000_000.0

HIST_SCHEMA = ("job_id string, seq int, stage string, "
               "chunk_ids array<string>, image_ids array<string>, "
               "chunks_created int, document_id string, "
               "endpoints_to_warmup array<string>, total_ready int, "
               "endpoints_failed array<string>, created_at double")


def _hist(spark, rows):
    return spark.createDataFrame(rows, HIST_SCHEMA)


def _row(job="j1", seq=2, stage="completed", chunk_ids=None,
         image_ids=None, chunks_created=0, document_id=None,
         warmup=None, total_ready=None, failed=None,
         created_at=NOW - 100.0):
    return (job, seq, stage, chunk_ids, image_ids, chunks_created,
            document_id, warmup, total_ready, failed, created_at)


def _chunks(spark, rows):
    return spark.createDataFrame(
        rows, "chunk_id string, document_id string, has_embedding boolean")


def _images(spark, rows):
    return spark.createDataFrame(rows, "image_id string")


def _audit(spark, hist_rows, chunk_rows=(), image_rows=()):
    last = last_checkpoints(_hist(spark, hist_rows))
    out = audit_checkpoints(last, _chunks(spark, list(chunk_rows)),
                            _images(spark, list(image_rows)))
    return {r.job_id: r for r in out.collect()}


class TestResume:
    def test_last_entry_wins_and_gates(self, spark):
        rows = [
            _row("j1", 1, "initialized"),
            _row("j1", 2, "chunks_created"),            # eligible
            _row("j2", 2, "completed", created_at=None),  # no ts
            _row("j3", 2, "completed",
                 created_at=NOW - 25 * 3600.0),           # too old
            _row("j4", 2, "made_up_stage"),               # unknown
        ]
        out = {r.job_id: r for r in resume_eligibility(
            last_checkpoints(_hist(spark, rows)), NOW).collect()}
        assert out["j1"].can_resume is True
        assert out["j1"].resume_stage == "chunks_created"
        assert out["j2"].refusal_reason == "no_checkpoint"
        assert out["j3"].refusal_reason == "too_old"
        assert out["j4"].refusal_reason == "unknown_stage"
        assert not out["j4"].can_resume

    def test_exactly_24h_is_still_eligible(self, spark):
        rows = [_row("j1", 1, "completed",
                     created_at=NOW - 24 * 3600.0)]
        out = resume_eligibility(
            last_checkpoints(_hist(spark, rows)), NOW).collect()[0]
        assert out.can_resume is True


class TestAudit:
    def test_zero_chunk_checkpoint_is_valid(self, spark):
        # :517-519 — focused extraction may legitimately skip chunking
        out = _audit(spark, [_row(stage="chunks_created",
                                  chunk_ids=[], chunks_created=0)])
        assert out["j1"].reason == "valid_no_chunks"

    def test_chunk_ids_must_all_exist(self, spark):
        hist = [_row(stage="chunks_created",
                     chunk_ids=["c1", "c2"], chunks_created=2)]
        ok = _audit(spark, hist, [("c1", "d", True), ("c2", "d", True)])
        assert ok["j1"].valid is True
        missing = _audit(spark, hist, [("c1", "d", True)])
        assert missing["j1"].reason == "invalid_count_mismatch"

    def test_by_document_fallback(self, spark):
        hist = [_row(stage="chunks_created", chunk_ids=[],
                     chunks_created=5, document_id="d9")]
        ok = _audit(spark, hist, [("cX", "d9", True)])
        assert ok["j1"].reason == "valid_by_document"
        none = _audit(spark, hist, [("cX", "other", True)])
        assert none["j1"].reason == "invalid_no_doc_chunks"

    def test_embedding_ten_percent_tolerance(self, spark):
        # :540-543 — found >= 0.9 * expected passes
        ids = [f"c{i}" for i in range(10)]
        hist = [_row(stage="text_embeddings_generated",
                     chunk_ids=ids, chunks_created=10)]
        nine = [(f"c{i}", "d", True) for i in range(9)] + \
            [("c9", "d", False)]
        assert _audit(spark, hist, nine)["j1"].valid is True
        eight = [(f"c{i}", "d", i < 8) for i in range(10)]
        assert _audit(spark, hist, eight)["j1"].reason == \
            "invalid_too_many_missing"

    def test_images_empty_valid_else_exact(self, spark):
        assert _audit(spark, [_row(stage="images_extracted",
                                   image_ids=[])])["j1"].reason \
            == "valid_no_images"
        hist = [_row(stage="images_extracted", image_ids=["i1", "i2"])]
        assert _audit(spark, hist, (), [("i1",), ("i2",)])["j1"].valid \
            is True
        assert _audit(spark, hist, (), [("i1",)])["j1"].reason == \
            "invalid_count_mismatch"

    def test_warmup_rules(self, spark):
        out = _audit(spark, [
            _row("j1", stage="warmup_started", warmup=[]),
            _row("j2", stage="warmup_started", warmup=["e1"]),
            _row("j3", stage="warmup_complete", total_ready=0,
                 failed=["x"]),
            _row("j4", stage="warmup_complete", total_ready=2,
                 failed=["x"]),  # failures but ready -> still valid
        ])
        assert out["j1"].reason == "invalid_no_endpoints"
        assert out["j2"].valid is True
        assert out["j3"].reason == "invalid_nothing_ready"
        assert out["j4"].valid is True

    def test_stages_without_data_contract_are_valid(self, spark):
        out = _audit(spark, [_row(stage="pdf_extracted")])
        assert out["j1"].reason == "valid_no_data_contract"


class TestTableProfile:
    def test_one_pass_stats(self, spark):
        from mivaa_pdf_extractor_spark.operators.profile import (
            profile_table)
        df = spark.createDataFrame(
            [(1, "ab", None), (2, "cdef", 5.0), (2, None, 7.5)],
            "id bigint, s string, x double")
        out = {r.column: r for r in profile_table(df).collect()}
        assert out["id"].n_rows == 3 and out["id"].n_distinct == 2
        assert out["id"].min_num == 1.0 and out["id"].max_num == 2.0
        assert out["s"].n_nulls == 1
        assert out["s"].null_frac == round(1 / 3, 6)
        assert out["s"].min_str == "ab" and out["s"].max_str == "cdef"
        assert out["s"].avg_len == 3.0  # (2+4)/2 non-null strings
        assert out["x"].n_nulls == 1 and out["x"].max_num == 7.5
        assert out["x"].min_str is None and out["x"].avg_len is None

    def test_approx_mode_is_single_pass(self, spark):
        from mivaa_pdf_extractor_spark.operators.profile import (
            profile_table)
        df = spark.createDataFrame([(i, str(i)) for i in range(100)],
                                   "id bigint, s string")
        out = {r.column: r
               for r in profile_table(df, exact=False).collect()}
        # HLL++ within its error bound on tiny input
        assert abs(out["id"].n_distinct - 100) <= 5
        plan = profile_table(df, exact=False)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Expand" not in plan  # no distinct expansion in approx
