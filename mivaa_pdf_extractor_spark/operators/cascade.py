"""Cascading job deletion + orphan sweep (the reference's cleanup layer).

`app/services/utilities/cleanup_service.py:482-1040`
(`delete_job_completely`) deletes everything tied to a job across a
table graph, with load-bearing rules this module reproduces as native
joins (a 100 TB catalog runs this as a batch anti-join/semi-join plan,
not row-at-a-time REST deletes):

- **Scope resolution** (:690-767): the canonical product set is reachable
  via ``products.source_job_id = job_id`` OR
  ``products.source_document_id = document_id`` — and deliberately NOT
  via ``product_processing_status.product_id``, which is a TEXT business
  key (e.g. ``product_5_CASTELLO``), not the products.id UUID; feeding it
  into the id delete aborted every product delete (22P02). The resolved
  list is UUID-validated as belt-and-braces. Image scope = images owned
  by those products OR by the job's document.
- **Embeddings are deleted by image-id primary key, not metadata**
  (:786-800): the metadata ``document_id`` field was never reliably
  written, so the metadata path "found 0 ids and deleted nothing,
  orphaning every embedding while reporting success". The metadata path
  survives only as the fallback when a job has no image ids at all.
- **Children before parents** (:810+): image child rows (associations,
  relationships, metafield values, validations) go before images;
  product child rows (layout regions, tables, enrichments) before
  products; the document and the job row go last.
- **Two modes** (:491-530): ``FULL_WIPE`` (cancellation/failure) removes
  everything; ``PRESERVE_OUTPUTS`` (completed-job removal from the UI)
  removes ONLY tracking state — the background_jobs row and
  product_processing_status — and keeps every catalog table.

The child-table fan (4 image-side + 3 product-side tables) is modeled
here as two tables with a ``kind`` column; the per-kind delete keys and
counts are identical to seven separate tables (documented simplification).

``orphan_scan`` is the inverse sweep the reference's comments worry about
(:794, :856, :944): rows whose parent is gone — pure anti-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: uuid.UUID accepts several forms; the catalog writes canonical
#: dashed-hex, and the business keys the rule defends against
#: (``product_5_CASTELLO``) match no hex form. Canonical + bare-hex.
_UUID_RE = (r"^([0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
            r"[0-9a-fA-F]{4}-[0-9a-fA-F]{12}|[0-9a-fA-F]{32})$")

IMAGE_CHILD_KINDS = ("image_product_associations", "chunk_image_relationships",
                     "image_metafield_values", "image_validations")
PRODUCT_CHILD_KINDS = ("product_layout_regions", "product_tables",
                      "product_enrichments")


def is_uuid(col: F.Column) -> F.Column:
    """cleanup_service.py:727-733 — a stray non-UUID must never poison
    the id-keyed deletes."""
    return F.regexp_like(col, F.lit(_UUID_RE))


def resolve_job_scope(jobs: DataFrame, products: DataFrame,
                      images: DataFrame) -> DataFrame:
    """Scope rows ``(job_id, kind, key)`` for the jobs to delete.

    Args:
        jobs: (job_id, document_id nullable) — the jobs being deleted.
        products: (product_id, source_job_id, source_document_id).
        images: (image_id, product_id, document_id).

    Kinds: ``document`` (the job's document), ``product`` (UUID-valid
    resolved products), ``image`` (images of those products or of the
    document). Every edge is an equi-join on a key column; the jobs side
    is small (the delete request) and broadcasts.
    """
    jb = F.broadcast(jobs)
    docs = (jobs.filter(F.col("document_id").isNotNull())
            .select("job_id", F.lit("document").alias("kind"),
                    F.col("document_id").cast("string").alias("key")))

    by_job = (products.join(jb.select(F.col("job_id").alias("__j")),
                            F.col("source_job_id") == F.col("__j"))
              .select(F.col("__j").alias("job_id"),
                      F.col("product_id").alias("key")))
    by_doc = (products.join(
        jb.filter(F.col("document_id").isNotNull())
          .select("job_id", F.col("document_id").alias("__d")),
        F.col("source_document_id") == F.col("__d"))
        .select("job_id", F.col("product_id").alias("key")))
    prods = (by_job.unionByName(by_doc).distinct()
             .filter(is_uuid(F.col("key")))
             .select("job_id", F.lit("product").alias("kind"), "key"))

    img_by_prod = (images.join(
        prods.select("job_id", F.col("key").alias("__p")),
        F.col("product_id") == F.col("__p"))
        .select("job_id", F.col("image_id").alias("key")))
    img_by_doc = (images.join(
        jb.filter(F.col("document_id").isNotNull())
          .select("job_id", F.col("document_id").alias("__d")),
        F.col("document_id") == F.col("__d"))
        .select("job_id", F.col("image_id").alias("key")))
    imgs = (img_by_prod.unionByName(img_by_doc).distinct()
            .select("job_id", F.lit("image").alias("kind"), "key"))

    return docs.unionByName(prods).unionByName(imgs)


def cascade_delete_plan(scope: DataFrame, jobs: DataFrame,
                        chunks: DataFrame, embeddings: DataFrame,
                        image_children: DataFrame,
                        product_children: DataFrame,
                        pps: DataFrame,
                        preserve_outputs: bool = False) -> DataFrame:
    """Delete-key rows ``(job_id, table_name, key)`` for the cascade.

    Args:
        scope: output of :func:`resolve_job_scope`.
        jobs: (job_id, document_id) — the jobs being deleted.
        chunks: (chunk_id, document_id, product_id) — deleted by
            document OR product (the XML/scraping path has no document).
        embeddings: (embedding_id, meta_document_id) — deleted by
            image-id PK; metadata fallback only for image-less jobs.
        image_children: (row_id, image_id, kind).
        product_children: (row_id, product_id, kind).
        pps: (job_id, product_key) — TEXT business keys, job-scoped.
        preserve_outputs: PRESERVE_OUTPUTS mode keeps all catalog data.
    """
    jb = F.broadcast(jobs)

    def rows(df, table, key_col):
        return df.select("job_id", F.lit(table).alias("table_name"),
                         F.col(key_col).cast("string").alias("key"))

    # tracking state goes in BOTH modes
    out = rows(jobs, "background_jobs", "job_id")
    out = out.unionByName(
        (pps.join(jb.select(F.col("job_id").alias("__j")),
                  F.col("job_id") == F.col("__j"))
         .select(F.col("__j").alias("job_id"),
                 F.lit("product_processing_status").alias("table_name"),
                 F.col("product_key").cast("string").alias("key"))))
    if preserve_outputs:
        return out

    # persist the per-kind slices, NOT the scope union: the kind filter
    # prunes the union down to one branch per slice (persisting the
    # union would force materializing all branches for every consumer —
    # measured slower in round 6), and the slices below feed 2-4
    # consumers each (sprods x3, simgs x4, and simgs itself re-derives
    # the product branch) — unpersisted, the product-resolution joins
    # re-ran up to 7x
    from ..core.cache import track
    sdocs = scope.filter(F.col("kind") == "document").select(
        "job_id", F.col("key").alias("__d"))
    sprods = track(scope.filter(F.col("kind") == "product").select(
        "job_id", F.col("key").alias("__p")))
    simgs = track(scope.filter(F.col("kind") == "image").select(
        "job_id", F.col("key").alias("__i")))

    ch_doc = (chunks.join(sdocs,
                          F.col("document_id").cast("string") == F.col("__d"))
              .select("job_id", F.col("chunk_id").alias("key")))
    ch_prod = (chunks.join(sprods, F.col("product_id") == F.col("__p"))
               .select("job_id", F.col("chunk_id").alias("key")))
    out = out.unionByName(
        ch_doc.unionByName(ch_prod).distinct()
        .select("job_id", F.lit("document_chunks").alias("table_name"),
                F.col("key").cast("string").alias("key")))

    # embeddings: by image-id PK; metadata-document fallback ONLY for
    # jobs with no image ids (cleanup_service.py:786-800)
    emb_pk = (embeddings.join(simgs,
                              F.col("embedding_id") == F.col("__i"))
              .select("job_id", F.col("embedding_id").alias("key")))
    imageless = (jobs.join(simgs.select(F.col("job_id").alias("__ij"))
                           .distinct(),
                           F.col("job_id") == F.col("__ij"), "left_anti")
                 .filter(F.col("document_id").isNotNull())
                 .select("job_id", F.col("document_id").cast("string")
                         .alias("__d")))
    emb_meta = (embeddings.join(
        F.broadcast(imageless),
        F.col("meta_document_id").cast("string") == F.col("__d"))
        .select("job_id", F.col("embedding_id").alias("key")))
    out = out.unionByName(
        emb_pk.unionByName(emb_meta).distinct()
        .select("job_id", F.lit("embeddings").alias("table_name"),
                F.col("key").cast("string").alias("key")))

    # children before parents: emit child rows, then the parents
    out = out.unionByName(
        image_children.join(simgs, F.col("image_id") == F.col("__i"))
        .select("job_id", F.col("kind").alias("table_name"),
                F.col("row_id").cast("string").alias("key")))
    out = out.unionByName(
        simgs.select("job_id", F.lit("document_images").alias("table_name"),
                     F.col("__i").alias("key")))
    out = out.unionByName(
        product_children.join(sprods, F.col("product_id") == F.col("__p"))
        .select("job_id", F.col("kind").alias("table_name"),
                F.col("row_id").cast("string").alias("key")))
    out = out.unionByName(
        sprods.select("job_id", F.lit("products").alias("table_name"),
                      F.col("__p").alias("key")))
    out = out.unionByName(
        sdocs.select("job_id", F.lit("documents").alias("table_name"),
                     F.col("__d").alias("key")))
    return out


def cascade_delete_stats(plan: DataFrame,
                         preserve_outputs: bool = False) -> DataFrame:
    """Per-job per-table deletion counts + the mode tag — the reference's
    stats dict (:549-560) as one partial aggregation."""
    mode = "PRESERVE_OUTPUTS" if preserve_outputs else "FULL_WIPE"
    return (plan.groupBy("job_id", "table_name")
            .agg(F.count("*").alias("n_deleted"))
            .withColumn("mode", F.lit(mode)))


def orphan_scan(documents: DataFrame, products: DataFrame,
                images: DataFrame, chunks: DataFrame,
                embeddings: DataFrame, image_children: DataFrame,
                product_children: DataFrame) -> DataFrame:
    """Rows whose parent is gone — the states the reference's comments
    name as the cost of a partial cleanup (:794 orphaned embeddings,
    :856/:944 ghost child rows). Pure anti-joins, one output row per
    orphan: ``(table_name, key, reason)``.

    - embeddings whose id matches no image (PK-keyed, like the delete);
    - chunks with neither a live document nor a live product;
    - image child rows without their image;
    - product child rows without their product;
    - images whose product is set but gone AND whose document is gone.
    """
    # persist the slim parent-key tables: each feeds two anti-joins
    # below (ids only — the heavy child tables are never pinned)
    from ..core.cache import track
    doc_keys = track(documents.select(
        F.col("document_id").cast("string").alias("k")).distinct())
    prod_keys = track(products.select(
        F.col("product_id").alias("k")).distinct())
    img_keys = track(images.select(
        F.col("image_id").alias("k")).distinct())

    def anti(df, col, keys):
        return df.join(keys, F.col(col).cast("string") == F.col("k"),
                       "left_anti")

    emb = (anti(embeddings, "embedding_id", img_keys)
           .select(F.lit("embeddings").alias("table_name"),
                   F.col("embedding_id").cast("string").alias("key"),
                   F.lit("no_image_for_pk").alias("reason")))
    ch = (anti(anti(chunks.filter(F.col("document_id").isNotNull()
                                  | F.col("product_id").isNotNull()),
                    "document_id", doc_keys),
               "product_id", prod_keys)
          .select(F.lit("document_chunks").alias("table_name"),
                  F.col("chunk_id").cast("string").alias("key"),
                  F.lit("no_document_or_product").alias("reason")))
    ic = (anti(image_children, "image_id", img_keys)
          .select(F.col("kind").alias("table_name"),
                  F.col("row_id").cast("string").alias("key"),
                  F.lit("no_image").alias("reason")))
    pc = (anti(product_children, "product_id", prod_keys)
          .select(F.col("kind").alias("table_name"),
                  F.col("row_id").cast("string").alias("key"),
                  F.lit("no_product").alias("reason")))
    im = (anti(anti(images.filter(F.col("product_id").isNotNull()),
                    "product_id", prod_keys),
               "document_id", doc_keys)
          .select(F.lit("document_images").alias("table_name"),
                  F.col("image_id").cast("string").alias("key"),
                  F.lit("no_product_or_document").alias("reason")))
    return emb.unionByName(ch).unionByName(ic).unionByName(pc) \
              .unionByName(im)
