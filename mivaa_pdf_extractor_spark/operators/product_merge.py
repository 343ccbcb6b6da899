"""Product merge + validation tier (order-sensitive fold plans).

Re-expresses the deterministic core of the reference's product merge
service and product validator:

- ``product_merge_service.py:149-210`` (``_merge_product_data``):
  descriptions collect [target, *sources] in source order, appending
  only truthy values not already collected (dedup INCLUDES the
  initial target value, even when it is ''); only when more than one
  was collected does the output become the ' | ' join of the
  non-empty ones (else the ORIGINAL target value survives, nulls
  included); long_description same with '\\n\\n'; metadata union is
  first-wins per key (target first, then source order) EXCEPT when
  both current and incoming values are lists — then a set union; a
  key's type is fixed by its first setter (a scalar first-setter
  blocks later lists and vice versa); source_chunks concat + set.
  Set-valued outputs (chunk list, merged list values) are rendered
  SORTED — the reference materializes Python sets whose order is
  unspecified, so the contract pins the canonical form.
- ``product_merge_service.py:212-258`` (``_transfer_relationships``):
  image associations of each source transfer to the target unless the
  (target, image) pair already exists — including pairs created
  earlier in the SAME transfer, so duplicates resolve first-wins in
  (source order, association order); transferred rows take defaults
  spatial/caption/clip 0.0, overall/confidence 0.5, reasoning
  'merged'; the target's own rows are untouched (nulls preserved).
- ``product_validator.py:23-370``: five checks — minimum content
  (min(1, chunks/2) avg min(1, chars/200)); substantive ratio over 9
  lowercase patterns (score min(1, ratio/0.6), 0.0 on empty);
  distinguishing features over joined content + ' ' + str(product
  data) (score min(1, found/3), passed >= 1, found list in constant
  order); assets ladder (+0.5 any image, +0.2 two, +0.3 specs, cap
  1); semantic coherence (single chunk -> 1.0; < 2 embeddings ->
  0.5; else mean pairwise (cos+1)/2 with zero-norm -> 0.0, score
  min(1, coh/0.65)); overall = 0.20/0.20/0.25/0.15/0.20 weighted sum
  vs 0.70.

Scale: merges fold per merge_id over arrays collected once (sources
per merge are a handful); metadata union is row-level co-keyed joins;
the transfer is one anti-join against existing pairs plus a
first-wins argmin per (merge, image); validation is one groupBy per
product plus a bounded pairwise self-join for coherence.  No UDFs,
no collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MIN_CHUNKS = 2
MIN_CHARACTERS = 200
MIN_SUBSTANTIVE_RATIO = 0.6
MIN_COHERENCE_SCORE = 0.65
MIN_OVERALL_SCORE = 0.70
DISTINGUISHING_FEATURES = [
    "product name", "model number", "specifications", "dimensions",
    "materials", "features", "price", "sku", "part number",
]
NON_SUBSTANTIVE_PATTERNS = [
    "page", "copyright", "all rights reserved", "table of contents",
    "index", "www.", "http", "email", "phone",
]


# ---------------------------------------------------------------------------
# 1. merge product data


def _fold_descs(tgt: Column, srcs: Column, sep: str) -> Column:
    """The reference's collect-then-maybe-join over [target, *sources]."""
    init = F.array(F.coalesce(tgt, F.lit("")))
    collected = F.aggregate(
        srcs, init,
        lambda acc, s: F.when(
            s.isNotNull() & (s != "") & ~F.array_contains(acc, s),
            F.concat(acc, F.array(s))).otherwise(acc))
    joined = F.array_join(
        F.filter(collected, lambda x: x != ""), sep)
    return F.when(F.size(collected) > 1, joined).otherwise(tgt)


def merge_product_data(products: DataFrame, meta: DataFrame,
                       plan: DataFrame) -> DataFrame:
    """products: (product_id, description, long_description,
    source_chunks array<string>); meta: (product_id, key, sval,
    lval array<string>) — exactly one of sval/lval per row; plan:
    (merge_id, target_id, src_id, src_ord).  Emits one row per merge
    with the merged fields (set-valued parts rendered sorted)."""
    # round 6: the merge plan fans into four join branches (targets,
    # sources, and the two metadata sides) and the source-metadata
    # slice into three aggregations — unpersisted, every branch re-ran
    # the upstream lineage (measured plan: 39 Exchanges / 32 source
    # scans). The plan is the merge REQUEST set (decision-sized at any
    # corpus scale), and tm/sm are plan-bounded joins — all safe to
    # pin; products/meta (catalog-sized) are never persisted.
    from ..core.cache import track
    plan = track(plan)
    tgt = (plan.select("merge_id", "target_id").distinct()
           .join(products, F.col("target_id") == F.col("product_id"))
           .select("merge_id", "target_id", "description",
                   "long_description", "source_chunks"))
    srcs = (plan.join(products, F.col("src_id") == F.col("product_id"))
            .groupBy("merge_id")
            .agg(F.array_sort(F.collect_list(F.struct(
                "src_ord",
                F.col("description").alias("d"),
                F.col("long_description").alias("ld"),
                F.col("source_chunks").alias("ch")))).alias("ss")))
    base = tgt.join(srcs, "merge_id", "left").withColumn(
        "ss", F.coalesce("ss", F.array().cast(
            "array<struct<src_ord:int,d:string,ld:string,"
            "ch:array<string>>>")))
    desc = _fold_descs(F.col("description"),
                       F.transform("ss", lambda s: s["d"]), " | ")
    ldesc = _fold_descs(F.col("long_description"),
                        F.transform("ss", lambda s: s["ld"]), "\n\n")
    chunks = F.array_join(F.array_sort(F.array_distinct(F.concat(
        F.coalesce("source_chunks",
                   F.array().cast("array<string>")),
        F.flatten(F.transform("ss", lambda s: F.coalesce(
            s["ch"], F.array().cast("array<string>"))))))), ",")

    # metadata union at row level
    tm = track(plan.select("merge_id", "target_id").distinct()
               .join(meta, F.col("target_id") == F.col("product_id"))
               .select("merge_id", "key", F.col("sval").alias("t_sval"),
                       F.col("lval").alias("t_lval")))
    sm = track(plan.join(meta, F.col("src_id") == F.col("product_id"))
               .select("merge_id", "key", "src_ord", "sval", "lval"))
    first_src = sm.groupBy("merge_id", "key").agg(
        F.min(F.struct("src_ord", "sval", "lval")).alias("fs"))
    list_union = (sm.where(F.col("lval").isNotNull())
                  .groupBy("merge_id", "key")
                  .agg(F.array_sort(F.array_distinct(
                      F.flatten(F.collect_list("lval")))).alias("lu")))
    keys = (tm.select("merge_id", "key")
            .unionByName(sm.select("merge_id", "key")).distinct())
    mrows = (keys.join(tm, ["merge_id", "key"], "left")
             .join(first_src, ["merge_id", "key"], "left")
             .join(list_union, ["merge_id", "key"], "left"))
    val = (
        F.when(F.col("t_sval").isNotNull(), F.col("t_sval"))
        .when(F.col("t_lval").isNotNull(),
              F.concat(F.lit("["), F.array_join(F.array_sort(
                  F.array_distinct(F.concat(
                      F.col("t_lval"),
                      F.coalesce("lu", F.array().cast(
                          "array<string>"))))), "|"), F.lit("]")))
        .when(F.col("fs")["sval"].isNotNull(), F.col("fs")["sval"])
        .otherwise(F.concat(F.lit("["),
                            F.array_join(F.coalesce(
                                "lu", F.array().cast("array<string>")),
                                "|"), F.lit("]"))))
    meta_render = (mrows.select("merge_id", "key", val.alias("v"))
                   .groupBy("merge_id")
                   .agg(F.array_join(F.array_sort(F.collect_list(
                       F.concat("key", F.lit("="), F.col("v")))), ";")
                       .alias("meta_render")))
    return (base.select("merge_id", "target_id",
                        desc.alias("description_out"),
                        ldesc.alias("long_description_out"),
                        chunks.alias("chunks_csv"))
            .join(meta_render, "merge_id", "left")
            .withColumn("meta_render",
                        F.coalesce("meta_render", F.lit(""))))


def merge_data_sql() -> str:
    """DuckDB twin over CTEs ``products_in``, ``meta_in``,
    ``plan_in`` (same shapes)."""
    def seq(field):
        # ordered candidate stream: target first (coalesced to ''),
        # then truthy source values in source order; first-occurrence
        # distinct == the reference's append-if-unseen fold
        return f"""
    dd_{field} AS (SELECT merge_id, 0 AS pos,
                          coalesce({field}, '') AS v
                   FROM tgt
                   UNION ALL
                   SELECT p.merge_id, p.src_ord + 1, pr.{field}
                   FROM plan_in p JOIN products_in pr
                        ON pr.product_id = p.src_id
                   WHERE pr.{field} IS NOT NULL
                     AND pr.{field} <> ''),
    df_{field} AS (SELECT merge_id, v, min(pos) AS fp
                   FROM dd_{field} GROUP BY 1, 2),
    dc_{field} AS (SELECT merge_id, list(v ORDER BY fp) AS coll,
                          count(*) AS n
                   FROM df_{field} GROUP BY 1)"""

    def fold(tgt, field, sep_sql):
        return f"""CASE WHEN c_{field}.n > 1
            THEN array_to_string(list_filter(c_{field}.coll,
                x -> x <> ''), {sep_sql})
            ELSE {tgt} END"""

    return r"""
    tgt AS (SELECT DISTINCT p.merge_id, p.target_id, pr.description,
                   pr.long_description, pr.source_chunks
            FROM plan_in p JOIN products_in pr
                 ON pr.product_id = p.target_id),
    srcs AS (SELECT p.merge_id,
                    list(struct_pack(src_ord := p.src_ord,
                         ch := pr.source_chunks)
                         ORDER BY p.src_ord) AS ss
             FROM plan_in p JOIN products_in pr
                  ON pr.product_id = p.src_id
             GROUP BY 1),""" + seq("description") + "," \
        + seq("long_description") + r""",
    folded AS (SELECT t.merge_id, t.target_id,
                      list_sort(list_distinct(
                          coalesce(t.source_chunks, []) ||
                          flatten(list_transform(coalesce(s.ss, []),
                              x -> coalesce(x.ch, []))))) AS chl,
                      """ + fold("t.description", "description",
                                 "' | '") + r""" AS dout,
                      """ + fold("t.long_description",
                                 "long_description",
                                 "chr(10) || chr(10)") + r""" AS ldout
               FROM tgt t
               LEFT JOIN srcs s USING (merge_id)
               LEFT JOIN dc_description c_description
                    USING (merge_id)
               LEFT JOIN dc_long_description c_long_description
                    USING (merge_id)),
    tm AS (SELECT DISTINCT p.merge_id, m.key, m.sval AS t_sval,
                  m.lval AS t_lval
           FROM plan_in p JOIN meta_in m
                ON m.product_id = p.target_id),
    sm AS (SELECT p.merge_id, m.key, p.src_ord, m.sval, m.lval
           FROM plan_in p JOIN meta_in m ON m.product_id = p.src_id),
    fsrc AS (SELECT merge_id, key,
                    min(struct_pack(src_ord := src_ord, sval := sval,
                                    lval := lval)) AS fs
             FROM sm GROUP BY 1, 2),
    lun AS (SELECT merge_id, key, list_sort(list_distinct(
                flatten(list(lval)))) AS lu
            FROM sm WHERE lval IS NOT NULL GROUP BY 1, 2),
    keys AS (SELECT DISTINCT merge_id, key FROM tm
             UNION SELECT DISTINCT merge_id, key FROM sm),
    mrows AS (SELECT k.merge_id, k.key,
                     CASE WHEN t.t_sval IS NOT NULL THEN t.t_sval
                          WHEN t.t_lval IS NOT NULL THEN
                              '[' || array_to_string(list_sort(
                                  list_distinct(t.t_lval ||
                                      coalesce(l.lu, []))), '|') || ']'
                          WHEN (f.fs).sval IS NOT NULL
                              THEN (f.fs).sval
                          ELSE '[' || array_to_string(
                              coalesce(l.lu, []), '|') || ']'
                     END AS v
              FROM keys k
              LEFT JOIN tm t USING (merge_id, key)
              LEFT JOIN fsrc f USING (merge_id, key)
              LEFT JOIN lun l USING (merge_id, key)),
    mrend AS (SELECT merge_id, array_to_string(list_sort(
                  list(key || '=' || v)), ';') AS meta_render
              FROM mrows GROUP BY 1)
    SELECT f.merge_id, f.target_id, f.dout AS description_out,
           f.ldout AS long_description_out,
           coalesce(array_to_string(f.chl, ','), '') AS chunks_csv,
           coalesce(m.meta_render, '') AS meta_render
    FROM folded f LEFT JOIN mrend m USING (merge_id)"""


# ---------------------------------------------------------------------------
# 2. relationship transfer


def transfer_relationships(assocs: DataFrame, plan: DataFrame) -> DataFrame:
    """assocs: (product_id, image_id, rel_ord, spatial_score,
    caption_score, clip_score, overall_score, confidence, reasoning);
    plan as above.  Emits the post-transfer association rows of every
    merge target."""
    # persist: the plan feeds targets + the source-candidate join, and
    # the existing rows feed both the output union and the freshness
    # anti-join (merge-request-bounded frames)
    from ..core.cache import track
    plan = track(plan)
    targets = plan.select("merge_id", "target_id").distinct()
    existing = (targets.join(
        assocs, F.col("product_id") == F.col("target_id"))
        .select("merge_id", "target_id", "image_id", "spatial_score",
                "caption_score", "clip_score", "overall_score",
                "confidence", "reasoning",
                F.lit("existing").alias("origin")))
    existing = track(existing)
    cand = (plan.join(assocs, F.col("product_id") == F.col("src_id"))
            .select("merge_id", "target_id", "image_id", "src_ord",
                    "rel_ord", "spatial_score", "caption_score",
                    "clip_score", "overall_score", "confidence",
                    "reasoning"))
    fresh = cand.join(existing.select("merge_id", "image_id"),
                      ["merge_id", "image_id"], "left_anti")
    first = (fresh.groupBy("merge_id", "target_id", "image_id")
             .agg(F.min(F.struct(
                 "src_ord", "rel_ord",
                 F.col("spatial_score").alias("sp"),
                 F.col("caption_score").alias("ca"),
                 F.col("clip_score").alias("cl"),
                 F.col("overall_score").alias("ov"),
                 F.col("confidence").alias("co"),
                 F.col("reasoning").alias("re"))).alias("w")))
    transferred = first.select(
        "merge_id", "target_id", "image_id",
        F.coalesce(F.col("w")["sp"], F.lit(0.0)).alias("spatial_score"),
        F.coalesce(F.col("w")["ca"], F.lit(0.0)).alias("caption_score"),
        F.coalesce(F.col("w")["cl"], F.lit(0.0)).alias("clip_score"),
        F.coalesce(F.col("w")["ov"], F.lit(0.5)).alias("overall_score"),
        F.coalesce(F.col("w")["co"], F.lit(0.5)).alias("confidence"),
        F.coalesce(F.col("w")["re"], F.lit("merged")).alias("reasoning"),
        F.lit("transferred").alias("origin"))
    return existing.unionByName(transferred)


def transfer_sql() -> str:
    """DuckDB twin over CTEs ``assocs_in`` and ``plan_in``."""
    return """
    targets AS (SELECT DISTINCT merge_id, target_id FROM plan_in),
    existing AS (SELECT t.merge_id, t.target_id, a.image_id,
                        a.spatial_score, a.caption_score, a.clip_score,
                        a.overall_score, a.confidence, a.reasoning,
                        'existing' AS origin
                 FROM targets t JOIN assocs_in a
                      ON a.product_id = t.target_id),
    cand AS (SELECT p.merge_id, p.target_id, a.image_id, p.src_ord,
                    a.rel_ord, a.spatial_score, a.caption_score,
                    a.clip_score, a.overall_score, a.confidence,
                    a.reasoning
             FROM plan_in p JOIN assocs_in a
                  ON a.product_id = p.src_id),
    fresh AS (SELECT c.* FROM cand c
              WHERE NOT EXISTS (SELECT 1 FROM existing e
                  WHERE e.merge_id = c.merge_id
                    AND e.image_id = c.image_id)),
    first_w AS (SELECT merge_id, target_id, image_id,
                       min(struct_pack(src_ord := src_ord,
                           rel_ord := rel_ord, sp := spatial_score,
                           ca := caption_score, cl := clip_score,
                           ov := overall_score, co := confidence,
                           re := reasoning)) AS w
                FROM fresh GROUP BY 1, 2, 3)
    SELECT merge_id, target_id, image_id, spatial_score,
           caption_score, clip_score, overall_score, confidence,
           reasoning, origin
    FROM existing
    UNION ALL
    SELECT merge_id, target_id, image_id,
           coalesce((w).sp, CAST(0.0 AS DOUBLE)),
           coalesce((w).ca, CAST(0.0 AS DOUBLE)),
           coalesce((w).cl, CAST(0.0 AS DOUBLE)),
           coalesce((w).ov, CAST(0.5 AS DOUBLE)),
           coalesce((w).co, CAST(0.5 AS DOUBLE)),
           coalesce((w).re, 'merged'), 'transferred'
    FROM first_w"""


# ---------------------------------------------------------------------------
# 3. product validation


def validate_products(chunks: DataFrame, products: DataFrame) -> DataFrame:
    """chunks: (product_id, chunk_idx, content, embedding
    array<double> nullable); products: (product_id, data_render,
    image_count).  Emits the five check scores + overall + passed."""
    length = F.length(F.coalesce("content", F.lit("")))
    low = F.lower(F.coalesce("content", F.lit("")))
    nonsub = None
    for pat in NON_SUBSTANTIVE_PATTERNS:
        c = low.contains(pat)
        nonsub = c if nonsub is None else (nonsub | c)
    has_spec = low.contains("specification") | low.contains("spec")
    per_chunk = chunks.select(
        "product_id", "chunk_idx", length.alias("len"),
        nonsub.alias("nonsub"), has_spec.alias("spec"),
        F.coalesce("content", F.lit("")).alias("content"),
        "embedding")
    # persist the slim per-chunk projection: the stats aggregate, the
    # ordered-content fold and both sides of the coherence self-join
    # consume it (4 scans of the chunk lineage otherwise)
    from ..core.cache import track
    per_chunk = track(per_chunk)
    agg = per_chunk.groupBy("product_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("len").alias("total_chars"),
        F.sum(F.when(~F.col("nonsub"), F.col("len")).otherwise(0))
        .alias("sub_chars"),
        F.max(F.col("spec").cast("int")).alias("has_specs"),
        F.count(F.when(F.col("embedding").isNotNull(), 1))
        .alias("n_emb"))
    # joined content in chunk order for the feature scan
    joined = (per_chunk.groupBy("product_id")
              .agg(F.array_sort(F.collect_list(F.struct(
                  "chunk_idx", "content"))).alias("cl"))
              .select("product_id", F.array_join(F.transform(
                  "cl", lambda s: s["content"]), " ").alias("alltext")))
    # pairwise coherence over chunks with embeddings
    emb = per_chunk.where(F.col("embedding").isNotNull()).select(
        "product_id", "chunk_idx", "embedding")
    a = emb.select("product_id", F.col("chunk_idx").alias("i"),
                   F.col("embedding").alias("ea"))
    b = emb.select("product_id", F.col("chunk_idx").alias("j"),
                   F.col("embedding").alias("eb"))
    dot = F.aggregate(F.zip_with("ea", "eb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    n1 = F.sqrt(F.aggregate("ea", F.lit(0.0),
                            lambda acc, v: acc + v * v))
    n2 = F.sqrt(F.aggregate("eb", F.lit(0.0),
                            lambda acc, v: acc + v * v))
    cos01 = F.when((n1 == 0.0) | (n2 == 0.0), 0.0).otherwise(
        (dot / (n1 * n2) + 1) / 2)
    coh = (a.join(b, "product_id").where(F.col("i") < F.col("j"))
           .groupBy("product_id").agg(F.avg(cos01).alias("coh")))

    base = (products
            .join(agg, "product_id", "left")
            .join(joined, "product_id", "left")
            .join(coh, "product_id", "left"))
    n_chunks = F.coalesce("n_chunks", F.lit(0))
    total = F.coalesce("total_chars", F.lit(0))
    content_score = (F.least(F.lit(1.0), n_chunks / MIN_CHUNKS)
                     + F.least(F.lit(1.0), total / MIN_CHARACTERS)) / 2
    ratio = F.when(total == 0, F.lit(0.0)).otherwise(
        F.coalesce("sub_chars", F.lit(0)) / total)
    sub_score = F.least(F.lit(1.0), ratio / MIN_SUBSTANTIVE_RATIO)
    alltext = F.lower(F.concat(F.coalesce("alltext", F.lit("")),
                               F.lit(" "),
                               F.coalesce("data_render", F.lit(""))))
    found = F.filter(
        F.array(*[F.lit(ft) for ft in DISTINGUISHING_FEATURES]),
        lambda ft: alltext.contains(ft))
    feat_score = F.least(F.lit(1.0), F.size(found) / F.lit(3))
    imgs = F.coalesce("image_count", F.lit(0))
    specs = F.coalesce("has_specs", F.lit(0)) == 1
    asset_raw = (F.when(imgs > 0, F.lit(0.5)).otherwise(F.lit(0.0))
                 + F.when(imgs >= 2, F.lit(0.2)).otherwise(F.lit(0.0))
                 + F.when(specs, F.lit(0.3)).otherwise(F.lit(0.0)))
    asset_score = F.least(F.lit(1.0), asset_raw)
    coh_val = (F.when(n_chunks < 2, F.lit(1.0))
               .when(F.coalesce("n_emb", F.lit(0)) < 2, F.lit(0.5))
               .otherwise(F.coalesce("coh", F.lit(0.5))))
    coh_score = (F.when(n_chunks < 2, F.lit(1.0))
                 .when(F.coalesce("n_emb", F.lit(0)) < 2, F.lit(0.5))
                 .otherwise(F.least(F.lit(1.0),
                                    coh_val / MIN_COHERENCE_SCORE)))
    overall = (content_score * 0.20 + sub_score * 0.20
               + feat_score * 0.25 + asset_score * 0.15
               + coh_score * 0.20)
    return base.select(
        "product_id", n_chunks.alias("n_chunks"),
        total.alias("total_chars"),
        content_score.alias("content_score"),
        ratio.alias("substantive_ratio"), sub_score.alias("sub_score"),
        F.array_join(found, ",").alias("features_found"),
        feat_score.alias("feat_score"),
        asset_score.alias("asset_score"),
        coh_val.alias("coherence"), coh_score.alias("coh_score"),
        overall.alias("overall_score"),
        (overall >= MIN_OVERALL_SCORE).cast("string").alias("passed"))


def validate_sql() -> str:
    """DuckDB twin over CTEs ``chunks_in`` and ``products_in``."""
    nonsub = " OR ".join(f"contains(low, '{p}')"
                         for p in NON_SUBSTANTIVE_PATTERNS)
    feats = ", ".join(f"'{f}'" for f in DISTINGUISHING_FEATURES)
    return f"""
    pc AS (SELECT product_id, chunk_idx,
                  length(coalesce(content, '')) AS len,
                  ({nonsub}) AS nonsub,
                  (contains(low, 'specification')
                   OR contains(low, 'spec')) AS spec,
                  coalesce(content, '') AS content, embedding
           FROM (SELECT *, lower(coalesce(content, '')) AS low
                 FROM chunks_in)),
    agg AS (SELECT product_id, count(*) AS n_chunks,
                   sum(len) AS total_chars,
                   sum(CASE WHEN NOT nonsub THEN len ELSE 0 END)
                       AS sub_chars,
                   max(CASE WHEN spec THEN 1 ELSE 0 END) AS has_specs,
                   count(CASE WHEN embedding IS NOT NULL THEN 1 END)
                       AS n_emb,
                   string_agg(content, ' ' ORDER BY chunk_idx)
                       AS alltext
            FROM pc GROUP BY 1),
    emb AS (SELECT product_id, chunk_idx, embedding FROM pc
            WHERE embedding IS NOT NULL),
    coh AS (SELECT a.product_id, avg(CASE
                WHEN sqrt(list_sum(list_transform(a.embedding,
                         v -> v * v))) = 0
                  OR sqrt(list_sum(list_transform(b.embedding,
                         v -> v * v))) = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE (list_sum(list_transform(
                          list_zip(a.embedding, b.embedding),
                          p -> p[1] * p[2]))
                      / (sqrt(list_sum(list_transform(a.embedding,
                             v -> v * v)))
                         * sqrt(list_sum(list_transform(b.embedding,
                             v -> v * v)))) + 1) / 2 END) AS coh
            FROM emb a JOIN emb b ON a.product_id = b.product_id
                 AND a.chunk_idx < b.chunk_idx
            GROUP BY 1),
    base AS (SELECT p.product_id, p.data_render, p.image_count,
                    coalesce(a.n_chunks, 0) AS n_chunks,
                    coalesce(a.total_chars, 0) AS total_chars,
                    coalesce(a.sub_chars, 0) AS sub_chars,
                    coalesce(a.has_specs, 0) AS has_specs,
                    coalesce(a.n_emb, 0) AS n_emb,
                    lower(coalesce(a.alltext, '') || ' '
                          || coalesce(p.data_render, '')) AS alltext,
                    c.coh
             FROM products_in p
             LEFT JOIN agg a USING (product_id)
             LEFT JOIN coh c USING (product_id)),
    sc AS (SELECT *,
        (least(CAST(1.0 AS DOUBLE), n_chunks / CAST({MIN_CHUNKS}
             AS DOUBLE))
         + least(CAST(1.0 AS DOUBLE), total_chars
             / CAST({MIN_CHARACTERS} AS DOUBLE))) / 2 AS content_score,
        CASE WHEN total_chars = 0 THEN CAST(0.0 AS DOUBLE)
             ELSE sub_chars / CAST(total_chars AS DOUBLE) END AS ratio,
        list_filter([{feats}], f -> contains(alltext, f)) AS found,
        CASE WHEN image_count > 0 THEN CAST(0.5 AS DOUBLE)
             ELSE CAST(0.0 AS DOUBLE) END
        + CASE WHEN image_count >= 2 THEN CAST(0.2 AS DOUBLE)
               ELSE CAST(0.0 AS DOUBLE) END
        + CASE WHEN has_specs = 1 THEN CAST(0.3 AS DOUBLE)
               ELSE CAST(0.0 AS DOUBLE) END AS asset_raw,
        CASE WHEN n_chunks < 2 THEN CAST(1.0 AS DOUBLE)
             WHEN n_emb < 2 THEN CAST(0.5 AS DOUBLE)
             ELSE coalesce(coh, CAST(0.5 AS DOUBLE)) END AS coh_val
        FROM base),
    sc2 AS (SELECT *,
        least(CAST(1.0 AS DOUBLE), ratio
              / CAST({MIN_SUBSTANTIVE_RATIO} AS DOUBLE)) AS sub_score,
        least(CAST(1.0 AS DOUBLE), len(found)
              / CAST(3 AS DOUBLE)) AS feat_score,
        least(CAST(1.0 AS DOUBLE), asset_raw) AS asset_score,
        CASE WHEN n_chunks < 2 THEN CAST(1.0 AS DOUBLE)
             WHEN n_emb < 2 THEN CAST(0.5 AS DOUBLE)
             ELSE least(CAST(1.0 AS DOUBLE), coh_val
                 / CAST({MIN_COHERENCE_SCORE} AS DOUBLE)) END
            AS coh_score
        FROM sc)
    SELECT product_id, CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(total_chars AS BIGINT) AS total_chars, content_score,
           ratio AS substantive_ratio, sub_score,
           coalesce(array_to_string(found, ','), '') AS features_found, feat_score,
           asset_score, coh_val AS coherence, coh_score,
           content_score * CAST(0.20 AS DOUBLE)
           + sub_score * CAST(0.20 AS DOUBLE)
           + feat_score * CAST(0.25 AS DOUBLE)
           + asset_score * CAST(0.15 AS DOUBLE)
           + coh_score * CAST(0.20 AS DOUBLE) AS overall_score,
           CAST(content_score * CAST(0.20 AS DOUBLE)
           + sub_score * CAST(0.20 AS DOUBLE)
           + feat_score * CAST(0.25 AS DOUBLE)
           + asset_score * CAST(0.15 AS DOUBLE)
           + coh_score * CAST(0.20 AS DOUBLE)
           >= CAST({MIN_OVERALL_SCORE} AS DOUBLE) AS VARCHAR)
               AS passed
    FROM sc2"""


# ---------------------------------------------------------------------------
# synthesized inputs (shared shape with the SQL twins)

N_MERGES = 40


def synth_merge_plan(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = (events.select((e % N_MERGES).alias("m"),
                          F.expr(f"(event_id div {N_MERGES}) % 3")
                          .cast("int").alias("s"))
            .distinct())
    m, s = F.col("m"), F.col("s")
    return (base.where(s < 1 + m % 3)
            .select(m.alias("merge_id"), m.alias("target_id"),
                    (F.lit(1000) + m * 10 + s).alias("src_id"),
                    s.alias("src_ord")))


SYNTH_PLAN_SQL = f"""
SELECT m AS merge_id, m AS target_id, 1000 + m * 10 + s AS src_id,
       s AS src_ord
FROM (SELECT DISTINCT event_id % {N_MERGES} AS m,
             CAST((event_id // {N_MERGES}) % 3 AS INT) AS s
      FROM events)
WHERE s < 1 + m % 3"""


def _pid_cols():
    """product universe: targets 0..39, sources 1000+m*10+s."""
    return None


def synth_merge_products(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    tgt = (events.select((e % N_MERGES).alias("pid")).distinct()
           .select(F.col("pid").cast("long").alias("pid"),
                   F.lit("t").alias("role"),
                   (F.col("pid") % 1000).alias("m"),
                   F.lit(0).alias("s")))
    src = (events.select((e % N_MERGES).alias("m"),
                         F.expr(f"(event_id div {N_MERGES}) % 3")
                         .cast("int").alias("s")).distinct()
           .where(F.col("s") < 1 + F.col("m") % 3)
           .select((F.lit(1000) + F.col("m") * 10 + F.col("s"))
                   .cast("long").alias("pid"),
                   F.lit("s").alias("role"), "m", "s"))
    u = tgt.unionByName(src)
    pid, m, s, role = (F.col("pid"), F.col("m"), F.col("s"),
                       F.col("role"))
    tdesc = (F.when(m % 5 == 0, F.lit(None).cast("string"))
             .when(m % 5 == 1, F.lit(""))
             .otherwise(F.concat(F.lit("desc "), m.cast("string"))))
    desc = (F.when(role == "t", tdesc)
            .when((s == 0) & (m % 4 == 0), tdesc)   # dup of target
            .when((pid % 7) == 0, F.lit(""))
            .when((pid % 7) == 1, F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("sdesc "), pid.cast("string"))))
    tld = (F.when(m % 6 == 0, F.lit(None).cast("string"))
           .otherwise(F.concat(F.lit("long "), m.cast("string"))))
    ld = (F.when(role == "t", tld)
          .when((s == 1) & (m % 5 == 2), tld)
          .when((pid % 8) == 2, F.lit(""))
          .otherwise(F.concat(F.lit("slong "), pid.cast("string"))))
    chunks = (F.when(pid % 9 == 0, F.lit(None).cast("array<string>"))
              .otherwise(F.array(
                  F.concat(F.lit("c"), (pid % 7).cast("string")),
                  F.concat(F.lit("c"), (pid % 5).cast("string")))))
    return u.select(pid.alias("product_id"), desc.alias("description"),
                    ld.alias("long_description"),
                    chunks.alias("source_chunks"))


SYNTH_MERGE_PRODUCTS_SQL = f"""
WITH u AS (
    SELECT DISTINCT CAST(event_id % {N_MERGES} AS BIGINT) AS pid,
           't' AS role, event_id % {N_MERGES} AS m, 0 AS s
    FROM events
    UNION
    SELECT DISTINCT CAST(1000 + (event_id % {N_MERGES}) * 10
               + (event_id // {N_MERGES}) % 3 AS BIGINT) AS pid,
           's' AS role, event_id % {N_MERGES} AS m,
           CAST((event_id // {N_MERGES}) % 3 AS INT) AS s
    FROM events
    WHERE (event_id // {N_MERGES}) % 3 < 1 + (event_id % {N_MERGES}) % 3)
SELECT pid AS product_id,
       CASE WHEN role = 't' OR (s = 0 AND m % 4 = 0) THEN
                CASE WHEN m % 5 = 0 THEN NULL
                     WHEN m % 5 = 1 THEN ''
                     ELSE 'desc ' || m END
            WHEN pid % 7 = 0 THEN ''
            WHEN pid % 7 = 1 THEN NULL
            ELSE 'sdesc ' || pid END AS description,
       CASE WHEN role = 't' OR (s = 1 AND m % 5 = 2) THEN
                CASE WHEN m % 6 = 0 THEN NULL
                     ELSE 'long ' || m END
            WHEN pid % 8 = 2 THEN ''
            ELSE 'slong ' || pid END AS long_description,
       CASE WHEN pid % 9 = 0 THEN NULL
            ELSE ['c' || (pid % 7), 'c' || (pid % 5)]
       END AS source_chunks
FROM u"""


def synth_merge_meta(events: DataFrame) -> DataFrame:
    """one row per (product, key) drawn from k0..k3 with regime-driven
    scalar/list types (type-conflict and first-source pins)."""
    e = F.col("event_id")
    rows = (events.select((e % N_MERGES).alias("m"),
                          F.expr(f"(event_id div {N_MERGES}) % 4")
                          .cast("int").alias("slot"),
                          F.expr(f"(event_id div {N_MERGES * 4}) % 4")
                          .cast("int").alias("k")).distinct())
    m, slot, k = F.col("m"), F.col("slot"), F.col("k")
    # slot 0 = target, slots 1..3 = sources 0..2 (when in plan)
    in_plan = (slot == 0) | (slot - 1 < 1 + m % 3)
    pid = (F.when(slot == 0, m)
           .otherwise(F.lit(1000) + m * 10 + (slot - 1))).cast("long")
    has = (
        ((slot == 0) & (((k == 0) & (m % 2 == 0))
                        | ((k == 1) & (m % 3 == 0))))
        | ((slot > 0) & (((k == 0) & (m % 2 == 1))
                         | (k == 1)
                         | ((k == 2) & (slot <= 2))
                         | ((k == 3) & (m % 4 == 0)))))
    is_list = (((slot == 0) & (k == 1))
               | ((slot > 0) & ((k == 1) | (k == 3)
                                | ((k == 0) & (m % 8 >= 4)))))
    sval = F.when(~is_list, F.concat(
        F.lit("v"), k.cast("string"), F.lit("_"),
        ((m + slot) % 5).cast("string")))
    lval = F.when(is_list, F.array(
        F.concat(F.lit("L"), ((m + slot) % 4).cast("string")),
        F.concat(F.lit("L"), ((m * slot) % 3).cast("string"))))
    return (rows.where(in_plan & has)
            .select(pid.alias("product_id"),
                    F.concat(F.lit("k"), k.cast("string")).alias("key"),
                    sval.alias("sval"), lval.alias("lval")))


SYNTH_MERGE_META_SQL = f"""
WITH rows_ AS (
    SELECT DISTINCT event_id % {N_MERGES} AS m,
           CAST((event_id // {N_MERGES}) % 4 AS INT) AS slot,
           CAST((event_id // {N_MERGES * 4}) % 4 AS INT) AS k
    FROM events),
typed AS (
    SELECT *,
           (slot = 0 AND ((k = 0 AND m % 2 = 0)
                          OR (k = 1 AND m % 3 = 0)))
           OR (slot > 0 AND ((k = 0 AND m % 2 = 1) OR k = 1
                             OR (k = 2 AND slot <= 2)
                             OR (k = 3 AND m % 4 = 0))) AS has,
           (slot = 0 AND k = 1)
           OR (slot > 0 AND (k = 1 OR k = 3
                             OR (k = 0 AND m % 8 >= 4))) AS is_list
    FROM rows_
    WHERE slot = 0 OR slot - 1 < 1 + m % 3)
SELECT CAST(CASE WHEN slot = 0 THEN m
            ELSE 1000 + m * 10 + (slot - 1) END AS BIGINT)
           AS product_id,
       'k' || k AS key,
       CASE WHEN NOT is_list
            THEN 'v' || k || '_' || ((m + slot) % 5) END AS sval,
       CASE WHEN is_list
            THEN ['L' || ((m + slot) % 4), 'L' || ((m * slot) % 3)]
       END AS lval
FROM typed WHERE has"""


def synth_merge_assocs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    rows = (events.select((e % N_MERGES).alias("m"),
                          F.expr(f"(event_id div {N_MERGES}) % 4")
                          .cast("int").alias("slot"),
                          F.expr(f"(event_id div {N_MERGES * 4}) % 3")
                          .cast("int").alias("r")).distinct())
    m, slot, r = F.col("m"), F.col("slot"), F.col("r")
    in_plan = (slot == 0) | (slot - 1 < 1 + m % 3)
    pid = (F.when(slot == 0, m)
           .otherwise(F.lit(1000) + m * 10 + (slot - 1))).cast("long")
    has = ((slot == 0) & (r < 1 + m % 2)) | ((slot > 0) & (r < 2))
    # image ids overlap target's and across sources
    img = (F.when(slot == 0, m % 6 + r)
           .otherwise((m % 6 + r * 2 + slot - 1) % 8)).cast("int")
    nullscore = (m + slot + r) % 4 == 0
    sc = F.when(~nullscore, ((m + r) % 5) * F.lit(0.125))
    reasoning = F.when((m + slot) % 3 == 0,
                       F.concat(F.lit("why"), r.cast("string")))
    return (rows.where(in_plan & has)
            .select(pid.alias("product_id"), img.alias("image_id"),
                    r.alias("rel_ord"),
                    sc.alias("spatial_score"),
                    sc.alias("caption_score"),
                    F.when(~nullscore, F.lit(0.25)).alias("clip_score"),
                    sc.alias("overall_score"),
                    F.when(r == 0, F.lit(0.75)).alias("confidence"),
                    reasoning.alias("reasoning")))


SYNTH_MERGE_ASSOCS_SQL = f"""
WITH rows_ AS (
    SELECT DISTINCT event_id % {N_MERGES} AS m,
           CAST((event_id // {N_MERGES}) % 4 AS INT) AS slot,
           CAST((event_id // {N_MERGES * 4}) % 3 AS INT) AS r
    FROM events)
SELECT CAST(CASE WHEN slot = 0 THEN m
            ELSE 1000 + m * 10 + (slot - 1) END AS BIGINT)
           AS product_id,
       CAST(CASE WHEN slot = 0 THEN m % 6 + r
            ELSE (m % 6 + r * 2 + slot - 1) % 8 END AS INT)
           AS image_id,
       r AS rel_ord,
       CASE WHEN NOT ((m + slot + r) % 4 = 0)
            THEN ((m + r) % 5) * CAST(0.125 AS DOUBLE) END
           AS spatial_score,
       CASE WHEN NOT ((m + slot + r) % 4 = 0)
            THEN ((m + r) % 5) * CAST(0.125 AS DOUBLE) END
           AS caption_score,
       CASE WHEN NOT ((m + slot + r) % 4 = 0)
            THEN CAST(0.25 AS DOUBLE) END AS clip_score,
       CASE WHEN NOT ((m + slot + r) % 4 = 0)
            THEN ((m + r) % 5) * CAST(0.125 AS DOUBLE) END
           AS overall_score,
       CASE WHEN r = 0 THEN CAST(0.75 AS DOUBLE) END AS confidence,
       CASE WHEN (m + slot) % 3 = 0 THEN 'why' || r END AS reasoning
FROM rows_
WHERE (slot = 0 OR slot - 1 < 1 + m % 3)
  AND ((slot = 0 AND r < 1 + m % 2) OR (slot > 0 AND r < 2))"""


def synth_validate_chunks(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    rows = (events.select((e % 50).alias("p"),
                          F.expr("(event_id div 50) % 5").cast("int")
                          .alias("i"), e.alias("ev"))
            .groupBy("p", "i").agg(F.min("ev").alias("ev")))
    p, i, ev = F.col("p"), F.col("i"), F.col("ev")
    n = p % 5  # chunks per product
    content = (
        F.when((p + i) % 4 == 0,
               F.concat(F.lit("page footer www.example.com index "),
                        p.cast("string")))
        .when((p + i) % 4 == 1,
              F.concat(F.lit("quality porcelain with dimensions and "
                             "materials noted, price listed, batch "),
                       p.cast("string"), F.lit(" row "),
                       i.cast("string")))
        .when((p + i) % 4 == 2,
              F.concat(F.lit("the specification sheet covers model "
                             "number and sku "), p.cast("string")))
        .otherwise(F.concat(F.lit("plain body text for item "),
                            p.cast("string"), F.lit(" part "),
                            i.cast("string"))))
    emb = (F.when(ev % 11 == 0, F.lit(None).cast("array<double>"))
           .otherwise(F.array(*[
               (((ev * 3 + j * 5) % 9) - 4).cast("double")
               for j in range(4)])))
    return (rows.where(i < n)
            .select(p.cast("long").alias("product_id"),
                    i.alias("chunk_idx"), content.alias("content"),
                    emb.alias("embedding")))


SYNTH_VALIDATE_CHUNKS_SQL = """
SELECT CAST(p AS BIGINT) AS product_id, i AS chunk_idx,
       CASE WHEN (p + i) % 4 = 0
                THEN 'page footer www.example.com index ' || p
            WHEN (p + i) % 4 = 1
                THEN 'quality porcelain with dimensions and materials noted, price listed, batch '
                     || p || ' row ' || i
            WHEN (p + i) % 4 = 2
                THEN 'the specification sheet covers model number and sku '
                     || p
            ELSE 'plain body text for item ' || p || ' part ' || i
       END AS content,
       CASE WHEN ev % 11 = 0 THEN NULL
            ELSE [CAST((ev * 3 + 0) % 9 - 4 AS DOUBLE),
                  CAST((ev * 3 + 5) % 9 - 4 AS DOUBLE),
                  CAST((ev * 3 + 10) % 9 - 4 AS DOUBLE),
                  CAST((ev * 3 + 15) % 9 - 4 AS DOUBLE)]
       END AS embedding
FROM (SELECT event_id % 50 AS p,
             CAST((event_id // 50) % 5 AS INT) AS i,
             min(event_id) AS ev
      FROM events GROUP BY 1, 2)
WHERE i < p % 5"""


def synth_validate_products(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    base = events.select((e % 50).alias("p")).distinct()
    p = F.col("p")
    render = (F.when(p % 3 == 0,
                     F.concat(F.lit("{'name': 'prod"), p.cast("string"),
                              F.lit("', 'sku': 'SK"), p.cast("string"),
                              F.lit("'}")))
              .otherwise(F.concat(F.lit("{'name': 'prod"),
                                  p.cast("string"), F.lit("'}"))))
    return base.select(p.cast("long").alias("product_id"),
                       render.alias("data_render"),
                       (p % 4).cast("int").alias("image_count"))


SYNTH_VALIDATE_PRODUCTS_SQL = """
SELECT CAST(p AS BIGINT) AS product_id,
       CASE WHEN p % 3 = 0
            THEN '{''name'': ''prod' || p || ''', ''sku'': ''SK'
                 || p || '''}'
            ELSE '{''name'': ''prod' || p || '''}' END AS data_render,
       CAST(p % 4 AS INT) AS image_count
FROM (SELECT DISTINCT event_id % 50 AS p FROM events)"""
