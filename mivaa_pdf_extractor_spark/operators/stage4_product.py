"""Per-product pipeline folds from ``process_single_product``.

Reference: ``app/api/pdf_processing/product_processor.py`` —

- Resume decision ladder (:90-270, Fix E + audit #11):
  * tracker stages seed ``prior_stages``; job ``stage_history``
    entries for this product add their stage UNLESS the entry's
    status is 'completed_empty' (an empty completion is the reason to
    RE-run, :134-141) — those entries also contribute nothing to the
    expected totals;
  * ``expected_chunks`` / ``expected_images`` are running maxes over
    the non-empty entries' ``chunks_created`` / ``images_extracted``
    (captured from EVERY entry regardless of its stage name,
    :143-148); a checkpoint read failure leaves both None;
  * DB verification (needs a prior product_db_id and a live DB):
    ``chunk_count >= expected_chunks`` (expected must be non-None)
    marks chunking done; a positive-but-short (or unverifiable) chunk
    count DELETES the partial set and re-chunks (:158-176); images
    are ASYMMETRIC — a partial image set is reused (stage marked
    done) with a ``resume_incomplete`` marker instead of deleted,
    because deleting would orphan VECS vectors and re-bill vision
    (:178-199);
  * whole-product skip on 'relationships_created' / 'completed'
    RETURNS before the per-stage flags and before the
    resume_incomplete stamp — so a partial image set found on a
    fully-completed product is never stamped, while a partial CHUNK
    delete has already executed (pinned orderings, :203-213,
    :246-270);
  * 'products_created' deliberately maps to no skip (:236-239);
  * any failure reading the tracker status aborts the whole resume
    check (outer except) — no skips, no deletes (:241-243).
- Stage-4 chunk structured_metadata rollup (:745-805): dimensions
  accept a stripped STRING or a list whose string elements are added
  RAW (the strip only gates, :753-756 — pinned asymmetry); colors /
  materials / keyFeatures likewise (list raw, scalar stripped);
  studioName keeps the FIRST non-blank (stripped) in chunk order;
  outputs are sorted; studio_name only lands when the per-product
  extractor produced none (:780-781).
- Deep metadata merge (:816-848): sources apply in order (extracted,
  chunk-aggregated); empty values (None/''/[]/{}) are skipped;
  an empty existing slot takes the value; dict-vs-dict shallow-merges
  with the value's keys winning; list-vs-list becomes
  ``sorted(set(a) | set(b))`` for scalar lists (append-dedupe
  fallback otherwise); any other conflict: extracted overwrites,
  chunk-aggregated loses.
- ``update_product_progress`` (:1123-1163): stage map {extraction
  20, chunking 40, images 60, creation 80, relationships 100,
  completed 100, unknown 0}; overall = clamp(int((100*(idx-1) +
  stage_pct) / total), 0, 100) — truncation BEFORE the clamp.

All folds are per-product: one groupBy over the bounded history /
chunk child tables plus co-keyed joins; no windows, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STAGE_PCT = {"extraction": 20, "chunking": 40, "images": 60,
             "creation": 80, "relationships": 100, "completed": 100}


# ──────────────────────────────────────────────────────────────────
# A. Resume decision ladder
# ──────────────────────────────────────────────────────────────────

def resume_decision(tracker: DataFrame, history: DataFrame,
                    db_state: DataFrame) -> DataFrame:
    """``tracker``: per product (product long, tracker_ok,
    prior_db_id_present, t_chunks, t_images, t_rel, t_completed,
    t_products booleans, ckpt_read_ok boolean). ``history``: job
    stage_history entries for the product (product, entry_idx, stage
    string, status string, chunks_created int?, images_extracted
    int?). ``db_state``: (product, db_check_ok boolean, chunk_count
    int, image_count int)."""
    live = F.col("status") != "completed_empty"
    h = history.where(live).groupBy("product").agg(
        F.max(F.col("stage") == "chunks_created").alias("h_chunks"),
        F.max(F.col("stage") == "images_extracted").alias("h_images"),
        F.max(F.col("stage") == "relationships_created")
        .alias("h_rel"),
        F.max(F.col("stage") == "completed").alias("h_completed"),
        F.max("chunks_created").alias("exp_chunks"),
        F.max("images_extracted").alias("exp_images"))

    j = (tracker.join(h, "product", "left")
         .join(db_state, "product", "left"))
    ok = F.col("tracker_ok")
    ck = ok & F.col("ckpt_read_ok")

    def hist(c):
        return ck & F.coalesce(F.col(c), F.lit(False))

    exp_chunks = F.when(ck, F.col("exp_chunks"))
    exp_images = F.when(ck, F.col("exp_images"))

    db = ok & F.col("prior_db_id_present") & F.col("db_check_ok")
    chunks_verified = db & (F.col("chunk_count") > 0) \
        & exp_chunks.isNotNull() & (F.col("chunk_count") >= exp_chunks)
    deleted_partial = db & (F.col("chunk_count") > 0) \
        & ~chunks_verified
    images_verified = db & (F.col("image_count") > 0) \
        & exp_images.isNotNull() & (F.col("image_count") >= exp_images)
    partial_images = db & (F.col("image_count") > 0) \
        & ~images_verified

    s_chunks = (ok & F.col("t_chunks")) | hist("h_chunks") \
        | chunks_verified
    s_images = (ok & F.col("t_images")) | hist("h_images") \
        | images_verified | partial_images
    s_rel = (ok & F.col("t_rel")) | hist("h_rel")
    s_completed = (ok & F.col("t_completed")) | hist("h_completed")

    skip_all = s_rel | s_completed
    return j.select(
        "product",
        skip_all.alias("skip_all"),
        (~skip_all & s_chunks).alias("skip_chunking"),
        (~skip_all & s_images).alias("skip_images"),
        deleted_partial.alias("deleted_partial_chunks"),
        (~skip_all & partial_images).alias("resume_incomplete"),
        exp_chunks.cast("int").alias("expected_chunks"),
        exp_images.cast("int").alias("expected_images"))


# ──────────────────────────────────────────────────────────────────
# B. Chunk structured_metadata rollup
# ──────────────────────────────────────────────────────────────────

def _set_agg(str_col, list_col):
    """list elements are added RAW (strip only gates); scalars are
    added STRIPPED (:753-766)."""
    empty = F.array().cast("array<string>")
    scalar = F.when(str_col.isNotNull()
                    & (F.trim(str_col) != ""),
                    F.array(F.trim(str_col)))
    lst = F.filter(F.coalesce(list_col, empty),
                   lambda v: v.isNotNull() & (F.trim(v) != ""))
    return F.concat(F.coalesce(scalar, empty), lst)


def chunk_metadata_rollup(chunks: DataFrame) -> DataFrame:
    """``chunks``: per-chunk structured_metadata columns (product
    long, chunk_idx int, dim_str string?, dim_list array<string>?,
    col_str string?, col_list array<string>?, mat_str string?,
    mat_list array<string>?, feat_str string?, feat_list
    array<string>?, studio string?). Returns the per-product
    aggregated sets (sorted) + the first non-blank studio."""
    c = chunks.select(
        "product", "chunk_idx",
        _set_agg(F.col("dim_str"), F.col("dim_list")).alias("dims"),
        _set_agg(F.col("col_str"), F.col("col_list")).alias("cols"),
        _set_agg(F.col("mat_str"), F.col("mat_list")).alias("mats"),
        _set_agg(F.col("feat_str"), F.col("feat_list")).alias("feats"),
        F.when(F.col("studio").isNotNull()
               & (F.trim(F.col("studio")) != ""),
               F.trim(F.col("studio"))).alias("studio_clean"))
    agg = c.groupBy("product").agg(
        *[F.sort_array(F.array_distinct(
            F.flatten(F.collect_list(n)))).alias(n)
          for n in ("dims", "cols", "mats", "feats")],
        F.min_by(F.col("studio_clean"),
                 F.when(F.col("studio_clean").isNotNull(),
                        F.col("chunk_idx"))).alias("studio_name"))
    return agg.select(
        "product",
        F.col("dims").alias("dimensions"),
        F.col("cols").alias("available_colors"),
        F.col("mats").alias("materials_mentioned"),
        F.col("feats").alias("key_features"),
        "studio_name")


# ──────────────────────────────────────────────────────────────────
# C. Deep metadata merge
# ──────────────────────────────────────────────────────────────────

def _empty_list(c):
    return c.isNull() | (F.size(c) == 0)


def _merge_list(ex, val):
    return (F.when(_empty_list(val), ex)
            .when(_empty_list(ex), val)
            .otherwise(F.sort_array(F.array_distinct(
                F.concat(ex, val)))))


def _merge_scalar(ex, val, value_wins: bool):
    blank = val.isNull() | (val == "")
    ex_blank = ex.isNull() | (ex == "")
    out = F.when(blank, ex).when(ex_blank, val)
    return out.otherwise(val) if value_wins else out.otherwise(ex)


def merge_product_metadata(existing: DataFrame, extracted: DataFrame,
                           rollup: DataFrame) -> DataFrame:
    """Two-round deep merge: round 1 applies ``extracted`` over
    ``existing`` (conflicting scalars: extracted wins); round 2
    applies the chunk rollup over the result (conflicting scalars:
    rollup loses; lists always set-union; the material_properties
    dict shallow-merges with the incoming keys winning). The rollup's
    studio_name only participates when the EXTRACTED studio is blank
    (:780-781)."""
    j = (existing.join(extracted, "product", "left")
         .join(rollup, "product", "left"))

    # round 1: extracted over existing
    dims1 = _merge_list(F.col("e_dimensions"), F.col("x_dimensions"))
    studio1 = _merge_scalar(F.col("e_studio"), F.col("x_studio"),
                            value_wins=True)
    finish1 = _merge_scalar(F.col("e_finish"), F.col("x_finish"),
                            value_wins=True)

    # round 2: chunk-aggregated over round-1 output
    dims2 = _merge_list(dims1, F.col("dimensions"))
    colors2 = _merge_list(F.col("e_colors"),
                          F.col("available_colors"))
    feats2 = _merge_list(F.col("e_features"), F.col("key_features"))
    # chunk studio participates only when extracted studio is blank
    chunk_studio = F.when(
        (F.col("x_studio").isNull() | (F.col("x_studio") == ""))
        & F.col("studio_name").isNotNull(), F.col("studio_name"))
    studio2 = _merge_scalar(studio1, chunk_studio, value_wins=False)
    # material_properties: {**existing, **{'materials_mentioned': …}}
    mats = F.col("materials_mentioned")
    has_chunk_mats = ~_empty_list(mats)
    grade2 = F.col("e_mat_grade")
    mats2 = (F.when(~has_chunk_mats, F.col("e_mat_mentioned"))
             .when(F.col("e_mat_grade").isNull()
                   & F.col("e_mat_mentioned").isNull(), mats)
             .otherwise(mats))

    def joined(c):
        return F.when(c.isNotNull(), F.array_join(c, "|"))

    return j.select(
        "product",
        joined(dims2).alias("dimensions"),
        joined(colors2).alias("available_colors"),
        joined(feats2).alias("key_features"),
        joined(mats2).alias("materials_mentioned"),
        grade2.alias("material_grade"),
        studio2.alias("studio_name"),
        finish1.alias("finish"))


# ──────────────────────────────────────────────────────────────────
# D. Stage-progress formula
# ──────────────────────────────────────────────────────────────────

def stage_progress(rows: DataFrame) -> DataFrame:
    """``rows``: (product, product_index int, total_products int,
    stage string). overall = clamp(int((100*(idx-1) + pct) / total),
    0, 100) — int() truncation happens BEFORE the clamp."""
    pct = F.lit(0)
    for name, p in STAGE_PCT.items():
        pct = F.when(F.col("stage") == name, F.lit(p)).otherwise(pct)
    raw = ((F.col("product_index") - 1) * 100 + pct) \
        / F.col("total_products")
    return rows.select(
        "product", "product_index", "total_products", "stage",
        F.greatest(F.lit(0), F.least(F.lit(100),
                                     raw.cast("int")))
        .cast("int").alias("overall_progress"))


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

def synth_tracker(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("product"))
    return d.select(
        "product",
        (F.col("product") % 23 != 0).alias("tracker_ok"),
        (F.col("product") % 4 != 0).alias("prior_db_id_present"),
        (F.col("product") % 6 == 0).alias("t_chunks"),
        (F.col("product") % 7 == 0).alias("t_images"),
        (F.col("product") % 17 == 0).alias("t_rel"),
        (F.col("product") % 19 == 0).alias("t_completed"),
        (F.col("product") % 11 == 0).alias("t_products"),
        (F.col("product") % 13 != 0).alias("ckpt_read_ok"))


def synth_history(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("product"))
    rows = d.select("product", F.explode(F.sequence(
        F.lit(0), F.lit(2))).alias("entry_idx"))
    k = F.col("product") * 43 + F.col("entry_idx")
    stage = F.element_at(F.array(
        F.lit("chunks_created"), F.lit("images_extracted"),
        F.lit("products_created"), F.lit("relationships_created"),
        F.lit("completed")), (k % 5 + 1).cast("int"))
    return rows.where(k % 4 != 0).select(
        "product", F.col("entry_idx").cast("int").alias("entry_idx"),
        stage.alias("stage"),
        F.when(k % 6 == 0, F.lit("completed_empty"))
        .otherwise(F.lit("completed")).alias("status"),
        F.when(k % 7 >= 3, (k % 40).cast("int"))
        .alias("chunks_created"),
        F.when(k % 11 >= 6, (k % 30).cast("int"))
        .alias("images_extracted"))


def synth_db_state(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("product"))
    return d.select(
        "product",
        (F.col("product") % 9 != 0).alias("db_check_ok"),
        F.when(F.col("product") % 3 == 0, F.lit(0))
        .otherwise((F.col("product") * 31) % 45).cast("int")
        .alias("chunk_count"),
        F.when(F.col("product") % 5 == 1, F.lit(0))
        .otherwise((F.col("product") * 37) % 40).cast("int")
        .alias("image_count"))


def synth_chunk_sm(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("product"))
    rows = d.select("product", F.explode(F.sequence(
        F.lit(0), F.lit(3))).alias("chunk_idx"))
    h = F.col("product") * 37 + F.col("chunk_idx")

    def pick(mod, s_str, s_list):
        """variant: 0 scalar, 1 list (raw elements), 2 blank scalar,
        3 null, 4 empty list"""
        v = h % mod
        return (F.when(v == 0, s_str).otherwise(F.lit(None))
                .cast("string"),
                F.when(v == 1, s_list)
                .when(v == 4, F.array().cast("array<string>"))
                .otherwise(F.lit(None)).cast("array<string>"))

    dim_s, dim_l = pick(5, F.concat(F.lit(" d"), (h % 9).cast(
        "string"), F.lit("x") , (h % 7).cast("string"), F.lit(" ")),
        F.array(F.concat(F.lit("d"), (h % 6).cast("string")),
                F.concat(F.lit(" d"), (h % 4).cast("string"))))
    col_s, col_l = pick(6, F.concat(F.lit(" c"), (h % 5).cast(
        "string")), F.array(F.concat(F.lit("c"), (h % 3).cast(
            "string")), F.lit(" "), F.concat(F.lit(" c"), (h % 8)
                                             .cast("string"))))
    mat_s, mat_l = pick(7, F.concat(F.lit("m"), (h % 4).cast(
        "string")), F.array(F.concat(F.lit("m"), (h % 5).cast(
            "string"))))
    feat_s, feat_l = pick(4, F.concat(F.lit("f"), (h % 6).cast(
        "string")), F.array(F.concat(F.lit("f"), (h % 7).cast(
            "string")), F.concat(F.lit("f"), (h % 2).cast("string"))))
    studio = (F.when(h % 8 == 0, F.concat(F.lit(" Studio"),
                                          (h % 3).cast("string"),
                                          F.lit(" ")))
              .when(h % 8 == 1, F.lit("  "))
              .otherwise(F.lit(None)).cast("string"))
    return rows.select(
        "product", F.col("chunk_idx").cast("int").alias("chunk_idx"),
        dim_s.alias("dim_str"), dim_l.alias("dim_list"),
        col_s.alias("col_str"), col_l.alias("col_list"),
        mat_s.alias("mat_str"), mat_l.alias("mat_list"),
        feat_s.alias("feat_str"), feat_l.alias("feat_list"),
        studio.alias("studio"))


def synth_existing_meta(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("product"))
    p = F.col("product")
    arr_or = lambda mod, mk: (
        F.when(p % mod == 0, F.lit(None))
        .when(p % mod == 1, F.array())
        .otherwise(mk)).cast("array<string>")
    return d.select(
        "product",
        arr_or(3, F.array(F.concat(F.lit("d"), (p % 6).cast(
            "string")), F.lit("z9x9"))).alias("e_dimensions"),
        arr_or(4, F.array(F.concat(F.lit("c"), (p % 3).cast(
            "string")))).alias("e_colors"),
        arr_or(5, F.array(F.concat(F.lit("f"), (p % 7).cast(
            "string")))).alias("e_features"),
        F.when(p % 6 < 2, F.concat(F.lit("m"), (p % 5).cast(
            "string"))).cast("string").alias("e_mat_mentioned_s"),
        F.when(p % 7 < 3, F.concat(F.lit("grade"), (p % 2).cast(
            "string"))).cast("string").alias("e_mat_grade"),
        F.when(p % 8 == 0, F.lit("")).when(
            p % 8 < 4, F.concat(F.lit("ExStudio"), (p % 3).cast(
                "string"))).cast("string").alias("e_studio"),
        F.when(p % 9 < 4, F.concat(F.lit("matte"), (p % 2).cast(
            "string"))).cast("string").alias("e_finish")) \
        .withColumn("e_mat_mentioned",
                    F.when(F.col("e_mat_mentioned_s").isNotNull(),
                           F.array(F.col("e_mat_mentioned_s")))
                    .cast("array<string>")) \
        .drop("e_mat_mentioned_s")


def synth_extracted_meta(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("product"))
    p = F.col("product")
    return d.select(
        "product",
        (F.when(p % 5 == 0, F.lit(None))
         .when(p % 5 == 1, F.array())
         .otherwise(F.array(F.concat(F.lit("d"), (p % 8).cast(
             "string")), F.concat(F.lit("x"), (p % 4).cast(
                 "string"))))).cast("array<string>")
        .alias("x_dimensions"),
        F.when(p % 4 == 0, F.lit("")).when(
            p % 4 == 1, F.concat(F.lit("XStudio"), (p % 5).cast(
                "string"))).cast("string").alias("x_studio"),
        F.when(p % 3 == 0, F.concat(F.lit("gloss"), (p % 3).cast(
            "string"))).cast("string").alias("x_finish"))


def synth_progress_rows(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("product"))
    p = F.col("product")
    stage = F.element_at(F.array(
        F.lit("extraction"), F.lit("chunking"), F.lit("images"),
        F.lit("creation"), F.lit("relationships"), F.lit("completed"),
        F.lit("mystery")), (p % 7 + 1).cast("int"))
    return d.select(
        "product",
        (p % 7 + 1).cast("int").alias("product_index"),
        (p % 5 + 3).cast("int").alias("total_products"),
        stage.alias("stage"))


_DUCK_DOCS = """
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents)"""

DUCK_RESUME_SQL = _DUCK_DOCS + """,
s4trk AS (
  SELECT doc AS product,
         doc % 23 != 0 AS tracker_ok,
         doc % 4 != 0 AS prior_db_id_present,
         doc % 6 = 0 AS t_chunks, doc % 7 = 0 AS t_images,
         doc % 17 = 0 AS t_rel, doc % 19 = 0 AS t_completed,
         doc % 13 != 0 AS ckpt_read_ok,
         doc % 9 != 0 AS db_check_ok,
         CAST(CASE WHEN doc % 3 = 0 THEN 0
                   ELSE (doc * 31) % 45 END AS INT) AS chunk_count,
         CAST(CASE WHEN doc % 5 = 1 THEN 0
                   ELSE (doc * 37) % 40 END AS INT) AS image_count
  FROM docs),
s4hist AS (
  SELECT doc AS product, e AS entry_idx,
         (['chunks_created', 'images_extracted', 'products_created',
           'relationships_created', 'completed'])
           [CAST((doc*43 + e) % 5 AS INT) + 1] AS stage,
         CASE WHEN (doc*43 + e) % 6 = 0 THEN 'completed_empty'
              ELSE 'completed' END AS status,
         CASE WHEN (doc*43 + e) % 7 >= 3
              THEN CAST((doc*43 + e) % 40 AS INT) END
           AS chunks_created,
         CASE WHEN (doc*43 + e) % 11 >= 6
              THEN CAST((doc*43 + e) % 30 AS INT) END
           AS images_extracted
  FROM docs, (SELECT unnest([0, 1, 2]) AS e)
  WHERE (doc*43 + e) % 4 != 0),
s4hagg AS (
  SELECT product,
         bool_or(stage = 'chunks_created') AS h_chunks,
         bool_or(stage = 'images_extracted') AS h_images,
         bool_or(stage = 'relationships_created') AS h_rel,
         bool_or(stage = 'completed') AS h_completed,
         max(chunks_created) AS exp_chunks,
         max(images_extracted) AS exp_images
  FROM s4hist WHERE status != 'completed_empty' GROUP BY product),
s4j AS (
  SELECT t.*, COALESCE(h.h_chunks, FALSE) AS h_chunks,
         COALESCE(h.h_images, FALSE) AS h_images,
         COALESCE(h.h_rel, FALSE) AS h_rel,
         COALESCE(h.h_completed, FALSE) AS h_completed,
         CASE WHEN t.tracker_ok AND t.ckpt_read_ok
              THEN h.exp_chunks END AS exp_chunks,
         CASE WHEN t.tracker_ok AND t.ckpt_read_ok
              THEN h.exp_images END AS exp_images
  FROM s4trk t LEFT JOIN s4hagg h USING (product)),
s4k AS (
  SELECT *,
    tracker_ok AND prior_db_id_present AND db_check_ok AS db,
    tracker_ok AND prior_db_id_present AND db_check_ok
      AND chunk_count > 0 AND exp_chunks IS NOT NULL
      AND chunk_count >= exp_chunks AS chunks_verified,
    tracker_ok AND prior_db_id_present AND db_check_ok
      AND image_count > 0 AND exp_images IS NOT NULL
      AND image_count >= exp_images AS images_verified
  FROM s4j),
s4m AS (
  SELECT *,
    db AND chunk_count > 0 AND NOT chunks_verified
      AS deleted_partial,
    db AND image_count > 0 AND NOT images_verified
      AS partial_images,
    (tracker_ok AND t_chunks)
      OR (tracker_ok AND ckpt_read_ok AND h_chunks)
      OR chunks_verified AS s_chunks,
    (tracker_ok AND t_images)
      OR (tracker_ok AND ckpt_read_ok AND h_images)
      OR images_verified
      OR (db AND image_count > 0 AND NOT images_verified)
      AS s_images,
    (tracker_ok AND t_rel)
      OR (tracker_ok AND ckpt_read_ok AND h_rel)
      OR (tracker_ok AND t_completed)
      OR (tracker_ok AND ckpt_read_ok AND h_completed) AS skip_all
  FROM s4k),
s4resume AS (
  SELECT product, skip_all,
         NOT skip_all AND s_chunks AS skip_chunking,
         NOT skip_all AND s_images AS skip_images,
         deleted_partial AS deleted_partial_chunks,
         NOT skip_all AND partial_images AS resume_incomplete,
         CAST(exp_chunks AS INT) AS expected_chunks,
         CAST(exp_images AS INT) AS expected_images
  FROM s4m)"""

DUCK_ROLLUP_SQL = _DUCK_DOCS + """,
s4chunk AS (
  SELECT doc AS product, CAST(ci AS INT) AS chunk_idx,
         doc*37 + ci AS h
  FROM docs, (SELECT unnest([0, 1, 2, 3]) AS ci)),
s4sm AS (
  SELECT product, chunk_idx,
    CASE WHEN h % 5 = 0
         THEN ' d' || (h % 9) || 'x' || (h % 7) || ' ' END
      AS dim_str,
    CASE WHEN h % 5 = 1 THEN ['d' || (h % 6), ' d' || (h % 4)]
         WHEN h % 5 = 4 THEN CAST([] AS VARCHAR[]) END AS dim_list,
    CASE WHEN h % 6 = 0 THEN ' c' || (h % 5) END AS col_str,
    CASE WHEN h % 6 = 1 THEN ['c' || (h % 3), ' ', ' c' || (h % 8)]
         WHEN h % 6 = 4 THEN CAST([] AS VARCHAR[]) END AS col_list,
    CASE WHEN h % 7 = 0 THEN 'm' || (h % 4) END AS mat_str,
    CASE WHEN h % 7 = 1 THEN ['m' || (h % 5)]
         WHEN h % 7 = 4 THEN CAST([] AS VARCHAR[]) END AS mat_list,
    CASE WHEN h % 4 = 0 THEN 'f' || (h % 6) END AS feat_str,
    CASE WHEN h % 4 = 1 THEN ['f' || (h % 7), 'f' || (h % 2)] END
      AS feat_list,
    CASE WHEN h % 8 = 0 THEN ' Studio' || (h % 3) || ' '
         WHEN h % 8 = 1 THEN '  ' END AS studio
  FROM s4chunk),
s4vals AS (
  SELECT product, chunk_idx, kind, val FROM (
    SELECT product, chunk_idx, 'dims' AS kind,
           CASE WHEN dim_str IS NOT NULL AND trim(dim_str) != ''
                THEN [trim(dim_str)] ELSE [] END
           || COALESCE(list_filter(dim_list,
                v -> v IS NOT NULL AND trim(v) != ''), []) AS val
    FROM s4sm UNION ALL
    SELECT product, chunk_idx, 'cols',
           CASE WHEN col_str IS NOT NULL AND trim(col_str) != ''
                THEN [trim(col_str)] ELSE [] END
           || COALESCE(list_filter(col_list,
                v -> v IS NOT NULL AND trim(v) != ''), [])
    FROM s4sm UNION ALL
    SELECT product, chunk_idx, 'mats',
           CASE WHEN mat_str IS NOT NULL AND trim(mat_str) != ''
                THEN [trim(mat_str)] ELSE [] END
           || COALESCE(list_filter(mat_list,
                v -> v IS NOT NULL AND trim(v) != ''), [])
    FROM s4sm UNION ALL
    SELECT product, chunk_idx, 'feats',
           CASE WHEN feat_str IS NOT NULL AND trim(feat_str) != ''
                THEN [trim(feat_str)] ELSE [] END
           || COALESCE(list_filter(feat_list,
                v -> v IS NOT NULL AND trim(v) != ''), [])
    FROM s4sm)),
s4kagg AS (
  SELECT product, kind,
         list_sort(list_distinct(flatten(list(val)))) AS agg
  FROM s4vals GROUP BY product, kind),
s4studio AS (
  SELECT product, arg_min(trim(studio), chunk_idx) AS studio_name
  FROM s4sm
  WHERE studio IS NOT NULL AND trim(studio) != ''
  GROUP BY product),
s4rollup AS (
  SELECT c.product,
         any_value(CASE WHEN kind = 'dims' THEN agg END)
           AS dimensions,
         any_value(CASE WHEN kind = 'cols' THEN agg END)
           AS available_colors,
         any_value(CASE WHEN kind = 'mats' THEN agg END)
           AS materials_mentioned,
         any_value(CASE WHEN kind = 'feats' THEN agg END)
           AS key_features,
         any_value(s.studio_name) AS studio_name
  FROM s4kagg c LEFT JOIN s4studio s USING (product)
  GROUP BY c.product)"""

def _sj(expr: str) -> str:
    """NULL-safe list join: NULL array stays NULL, empty array -> ''
    (DuckDB array_to_string([]) is NULL; Spark array_join([]) is '')."""
    return ("COALESCE(array_to_string(" + expr + ", '|'), "
            "CASE WHEN (" + expr + ") IS NOT NULL THEN '' END)")


DUCK_MERGE_SQL = """
s4exist AS (
  SELECT doc AS product,
    CASE WHEN doc % 3 = 0 THEN NULL
         WHEN doc % 3 = 1 THEN CAST([] AS VARCHAR[])
         ELSE ['d' || (doc % 6), 'z9x9'] END AS e_dimensions,
    CASE WHEN doc % 4 = 0 THEN NULL
         WHEN doc % 4 = 1 THEN CAST([] AS VARCHAR[])
         ELSE ['c' || (doc % 3)] END AS e_colors,
    CASE WHEN doc % 5 = 0 THEN NULL
         WHEN doc % 5 = 1 THEN CAST([] AS VARCHAR[])
         ELSE ['f' || (doc % 7)] END AS e_features,
    CASE WHEN doc % 6 < 2 THEN ['m' || (doc % 5)] END
      AS e_mat_mentioned,
    CASE WHEN doc % 7 < 3 THEN 'grade' || (doc % 2) END
      AS e_mat_grade,
    CASE WHEN doc % 8 = 0 THEN ''
         WHEN doc % 8 < 4 THEN 'ExStudio' || (doc % 3) END
      AS e_studio,
    CASE WHEN doc % 9 < 4 THEN 'matte' || (doc % 2) END AS e_finish
  FROM docs),
s4extr AS (
  SELECT doc AS product,
    CASE WHEN doc % 5 = 0 THEN NULL
         WHEN doc % 5 = 1 THEN CAST([] AS VARCHAR[])
         ELSE ['d' || (doc % 8), 'x' || (doc % 4)] END
      AS x_dimensions,
    CASE WHEN doc % 4 = 0 THEN ''
         WHEN doc % 4 = 1 THEN 'XStudio' || (doc % 5) END
      AS x_studio,
    CASE WHEN doc % 3 = 0 THEN 'gloss' || (doc % 3) END AS x_finish
  FROM docs),
s4m1 AS (
  SELECT e.product, e.e_colors, e.e_features, e.e_mat_mentioned,
         e.e_mat_grade, x.x_studio,
    CASE WHEN x.x_dimensions IS NULL OR len(x.x_dimensions) = 0
           THEN e.e_dimensions
         WHEN e.e_dimensions IS NULL OR len(e.e_dimensions) = 0
           THEN x.x_dimensions
         ELSE list_sort(list_distinct(
                e.e_dimensions || x.x_dimensions)) END AS dims1,
    CASE WHEN x.x_studio IS NULL OR x.x_studio = '' THEN e.e_studio
         WHEN e.e_studio IS NULL OR e.e_studio = '' THEN x.x_studio
         ELSE x.x_studio END AS studio1,
    CASE WHEN x.x_finish IS NULL OR x.x_finish = '' THEN e.e_finish
         WHEN e.e_finish IS NULL OR e.e_finish = '' THEN x.x_finish
         ELSE x.x_finish END AS finish1
  FROM s4exist e JOIN s4extr x USING (product)),
s4merge AS (
  SELECT m.product,
    __SJ_DIMS__ AS dimensions,
    __SJ_COLS__ AS available_colors,
    __SJ_FEATS__ AS key_features,
    __SJ_MATS__ AS materials_mentioned,
    m.e_mat_grade AS material_grade,
    CASE WHEN (CASE WHEN (m.x_studio IS NULL OR m.x_studio = '')
                         AND r.studio_name IS NOT NULL
                    THEN r.studio_name END) IS NULL
              OR (CASE WHEN (m.x_studio IS NULL OR m.x_studio = '')
                            AND r.studio_name IS NOT NULL
                       THEN r.studio_name END) = ''
           THEN m.studio1
         WHEN m.studio1 IS NULL OR m.studio1 = ''
           THEN (CASE WHEN (m.x_studio IS NULL OR m.x_studio = '')
                           AND r.studio_name IS NOT NULL
                      THEN r.studio_name END)
         ELSE m.studio1 END AS studio_name,
    m.finish1 AS finish
  FROM s4m1 m LEFT JOIN s4rollup r USING (product))"""

_MERGE_EXPRS = {
    "__SJ_DIMS__": """CASE WHEN r.dimensions IS NULL
             OR len(r.dimensions) = 0 THEN m.dims1
           WHEN m.dims1 IS NULL OR len(m.dims1) = 0
             THEN r.dimensions
           ELSE list_sort(list_distinct(m.dims1 || r.dimensions))
           END""",
    "__SJ_COLS__": """CASE WHEN r.available_colors IS NULL
             OR len(r.available_colors) = 0 THEN m.e_colors
           WHEN m.e_colors IS NULL OR len(m.e_colors) = 0
             THEN r.available_colors
           ELSE list_sort(list_distinct(
                  m.e_colors || r.available_colors)) END""",
    "__SJ_FEATS__": """CASE WHEN r.key_features IS NULL
             OR len(r.key_features) = 0 THEN m.e_features
           WHEN m.e_features IS NULL OR len(m.e_features) = 0
             THEN r.key_features
           ELSE list_sort(list_distinct(
                  m.e_features || r.key_features)) END""",
    "__SJ_MATS__": """CASE WHEN r.materials_mentioned IS NULL
             OR len(r.materials_mentioned) = 0
             THEN m.e_mat_mentioned
           ELSE r.materials_mentioned END""",
}
for _ph, _expr in _MERGE_EXPRS.items():
    DUCK_MERGE_SQL = DUCK_MERGE_SQL.replace(_ph, _sj(_expr))

DUCK_PROGRESS_SQL = _DUCK_DOCS + """,
s4prog AS (
  SELECT doc AS product,
         CAST(doc % 7 + 1 AS INT) AS product_index,
         CAST(doc % 5 + 3 AS INT) AS total_products,
         (['extraction', 'chunking', 'images', 'creation',
           'relationships', 'completed', 'mystery'])
           [CAST(doc % 7 AS INT) + 1] AS stage,
         CAST(GREATEST(0, LEAST(100, CAST(FLOOR(
           ((doc % 7 + 1 - 1) * 100 +
            CASE (['extraction', 'chunking', 'images', 'creation',
                   'relationships', 'completed', 'mystery'])
                 [CAST(doc % 7 AS INT) + 1]
              WHEN 'extraction' THEN 20 WHEN 'chunking' THEN 40
              WHEN 'images' THEN 60 WHEN 'creation' THEN 80
              WHEN 'relationships' THEN 100 WHEN 'completed' THEN 100
              ELSE 0 END) / (doc % 5 + 3)) AS INT))) AS INT)
           AS overall_progress
  FROM docs)"""
