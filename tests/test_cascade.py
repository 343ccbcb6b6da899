"""Pins for the cascading job deletion + orphan sweep
(operators/cascade.py; reference cleanup_service.py:482-1040)."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators.cascade import (
    cascade_delete_plan, cascade_delete_stats, orphan_scan,
    resolve_job_scope)

UUID_A = "aaaaaaaa-bbbb-cccc-dddd-eeeeffff0001"
UUID_B = "aaaaaaaa-bbbb-cccc-dddd-eeeeffff0002"
UUID_IMG = "11111111-2222-3333-4444-555566667777"


def _jobs(spark, rows):
    return spark.createDataFrame(rows, "job_id string, document_id string")


def _products(spark, rows):
    return spark.createDataFrame(
        rows, "product_id string, source_job_id string, "
              "source_document_id string")


def _images(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, product_id string, document_id string")


class TestScope:
    def test_business_key_product_never_poisons_the_id_delete(self, spark):
        # cleanup_service.py:695-733 — pps-style TEXT business keys must
        # never reach the uuid-keyed deletes (22P02)
        scope = resolve_job_scope(
            _jobs(spark, [("j1", "d1")]),
            _products(spark, [(UUID_A, "j1", None),
                              ("product_5_CASTELLO", "j1", None)]),
            _images(spark, []))
        prods = {r.key for r in scope.collect() if r.kind == "product"}
        assert prods == {UUID_A}

    def test_product_reachable_via_job_or_document(self, spark):
        # :690-694 — both reachability edges, deduplicated
        scope = resolve_job_scope(
            _jobs(spark, [("j1", "d1")]),
            _products(spark, [(UUID_A, "j1", None),
                              (UUID_B, None, "d1"),
                              (UUID_A.replace("1", "9"), None, "other")]),
            _images(spark, []))
        prods = {r.key for r in scope.collect() if r.kind == "product"}
        assert prods == {UUID_A, UUID_B}

    def test_images_via_products_or_document(self, spark):
        scope = resolve_job_scope(
            _jobs(spark, [("j1", "d1")]),
            _products(spark, [(UUID_A, "j1", None)]),
            _images(spark, [(UUID_IMG, UUID_A, None),
                            (UUID_IMG.replace("1", "8"), None, "d1"),
                            (UUID_IMG.replace("1", "9"), None, "dX")]))
        imgs = {r.key for r in scope.collect() if r.kind == "image"}
        assert imgs == {UUID_IMG, UUID_IMG.replace("1", "8")}

    def test_document_less_job_contributes_no_document_row(self, spark):
        scope = resolve_job_scope(
            _jobs(spark, [("j1", None)]), _products(spark, []),
            _images(spark, []))
        assert scope.count() == 0


def _full_tables(spark):
    jobs = _jobs(spark, [("j1", "d1"), ("j2", "d2")])
    products = _products(spark, [(UUID_A, "j1", None)])
    images = _images(spark, [(UUID_IMG, UUID_A, None)])
    chunks = spark.createDataFrame(
        [("c1", "d1", None), ("c2", None, UUID_A), ("c3", "dX", None)],
        "chunk_id string, document_id string, product_id string")
    embeddings = spark.createDataFrame(
        [(UUID_IMG, None), ("emb-meta", "d2"), ("emb-meta-d1", "d1")],
        "embedding_id string, meta_document_id string")
    image_children = spark.createDataFrame(
        [("ic1", UUID_IMG, "image_validations")],
        "row_id string, image_id string, kind string")
    product_children = spark.createDataFrame(
        [("pc1", UUID_A, "product_tables")],
        "row_id string, product_id string, kind string")
    pps = spark.createDataFrame([("j1", "product_1_PPS"), ("jX", "nope")],
                                "job_id string, product_key string")
    return jobs, products, images, chunks, embeddings, image_children, \
        product_children, pps


class TestPlan:
    def _plan(self, spark, preserve=False):
        (jobs, products, images, chunks, embeddings, ic, pc,
         pps) = _full_tables(spark)
        scope = resolve_job_scope(jobs, products, images)
        plan = cascade_delete_plan(scope, jobs, chunks, embeddings, ic,
                                   pc, pps, preserve_outputs=preserve)
        return {(r.job_id, r.table_name, r.key) for r in plan.collect()}

    def test_embeddings_by_pk_not_metadata(self, spark):
        # :786-800 — j1 has an image: its embedding goes by image-id PK;
        # the d1-metadata row is NOT deleted via j1 (the metadata field
        # "was never reliably written")
        plan = self._plan(spark)
        assert ("j1", "embeddings", UUID_IMG) in plan
        assert ("j1", "embeddings", "emb-meta-d1") not in plan

    def test_metadata_fallback_only_for_imageless_jobs(self, spark):
        plan = self._plan(spark)
        assert ("j2", "embeddings", "emb-meta") in plan

    def test_chunks_by_document_and_by_product(self, spark):
        plan = self._plan(spark)
        assert ("j1", "document_chunks", "c1") in plan
        assert ("j1", "document_chunks", "c2") in plan
        assert not any(k == "c3" for _, _, k in plan)

    def test_children_and_parents_all_planned(self, spark):
        plan = self._plan(spark)
        for row in [("j1", "image_validations", "ic1"),
                    ("j1", "document_images", UUID_IMG),
                    ("j1", "product_tables", "pc1"),
                    ("j1", "products", UUID_A),
                    ("j1", "documents", "d1"),
                    ("j1", "background_jobs", "j1"),
                    ("j1", "product_processing_status", "product_1_PPS")]:
            assert row in plan, row

    def test_preserve_outputs_keeps_catalog(self, spark):
        # :516-530 — completed-job removal deletes ONLY tracking state
        plan = self._plan(spark, preserve=True)
        tables = {t for _, t, _ in plan}
        assert tables == {"background_jobs", "product_processing_status"}

    def test_stats_mode_tag(self, spark):
        (jobs, products, images, chunks, embeddings, ic, pc,
         pps) = _full_tables(spark)
        scope = resolve_job_scope(jobs, products, images)
        plan = cascade_delete_plan(scope, jobs, chunks, embeddings, ic,
                                   pc, pps)
        stats = cascade_delete_stats(plan).collect()
        assert all(r.mode == "FULL_WIPE" for r in stats)
        by = {(r.job_id, r.table_name): r.n_deleted for r in stats}
        assert by[("j1", "document_chunks")] == 2


class TestOrphans:
    def test_each_reason_class(self, spark):
        documents = spark.createDataFrame([("d1",)], "document_id string")
        products = _products(spark, [(UUID_A, None, None)])
        images = _images(spark, [(UUID_IMG, UUID_A, None),
                                 ("img-ghost", UUID_B, None)])
        chunks = spark.createDataFrame(
            [("c-ok", "d1", None), ("c-orph", "dX", UUID_B),
             ("c-null", None, None)],
            "chunk_id string, document_id string, product_id string")
        embeddings = spark.createDataFrame(
            [(UUID_IMG, None), ("emb-orph", None)],
            "embedding_id string, meta_document_id string")
        ic = spark.createDataFrame(
            [("ic-ok", UUID_IMG, "image_validations"),
             ("ic-orph", "img-gone", "image_validations")],
            "row_id string, image_id string, kind string")
        pc = spark.createDataFrame(
            [("pc-ok", UUID_A, "product_tables"),
             ("pc-orph", UUID_B, "product_tables")],
            "row_id string, product_id string, kind string")
        out = {(r.table_name, r.key): r.reason
               for r in orphan_scan(documents, products, images, chunks,
                                    embeddings, ic, pc).collect()}
        assert out == {
            ("embeddings", "emb-orph"): "no_image_for_pk",
            ("document_chunks", "c-orph"): "no_document_or_product",
            ("image_validations", "ic-orph"): "no_image",
            ("product_tables", "pc-orph"): "no_product",
            ("document_images", "img-ghost"): "no_product_or_document",
        }
