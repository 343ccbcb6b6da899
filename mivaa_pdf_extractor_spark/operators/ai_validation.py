"""AI-validation tier — boundary detection, consensus voting,
classifier response parsing (all deterministic given model outputs).

Re-expresses the deterministic halves of the reference's
ai_validation package:

- ``boundary_detector.py:56-316`` — consecutive-chunk product
  boundary detection: cosine similarity of adjacent chunk embeddings
  normalized to [0,1] ((sim+1)/2; a ZERO-norm vector short-circuits
  to 0.0 UNnormalized — pinned), 0.5 default when an embedding is
  missing; structural markers (5 lowercase substrings) checked on the
  NEXT chunk; page_break = next_page > page (missing -> 0); conf =
  1 - sim, then sequential min(1, +0.3) marker, min(1, +0.15) page,
  min(1, +0.1) image; boundary when conf >= 0.6 at index i+1 with a
  reason string (sim rendered %.2f, joined ', ', else 'unknown').
  ``group_chunks_by_product``: group id = running count of boundary
  indices <= i (a boundary index is always >= 1, so the
  current-product-nonempty guard never fires; pinned).
- ``consensus_validator.py:26-242`` — agreement = mean pairwise
  key similarity (exact-match 1.0 else word-set Jaccard with
  max(total,1)) over keys built from name/product_name/category/
  material_type/description (present fields, ' | '-joined, else
  str(confidence_score) else ''); >= 0.8 majority vote (Counter
  most_common — count desc, FIRST INSERTION ties — then the first
  result with the best key; the max-confidence fallback is dead code
  since keys always exist), >= 0.5 weighted vote (weight x
  confidence, default conf 0.5, unknown model weight 0.5, Python max
  = first max on ties), else weighted vote flagged + human review;
  < 2 successful results -> consensus failure row.
- ``document_classifier.py:90-250`` — CATEGORY|CONFIDENCE response
  parse (split('|'), strip+lower category UNvalidated, float() else
  0.5), keyword fallback when unsplittable (product / supporting /
  administrative / else transitional at 0.6), has_images boost
  min(1, +0.1) for category=='product' exactly; the exception-path
  keyword heuristic over the content (3 keyword tiers at 0.5, else
  transitional 0.4); ``_deep_enrich`` metadata flags + content
  length + confidence min(0.95, 0.6 + 0.1 * true_flags).

Cross-engine determinism: similarities are computed with the same
operation order in both engines over small-integer synthetic vectors
(exact dots/norm-squares; sqrt/divide are IEEE correctly-rounded), so
threshold compares can't flip; every DuckDB numeric literal that
feeds double arithmetic is cast to DOUBLE (bare decimals are exact
DECIMALs and would change the rounding).

Scale: boundaries are one lead() window per doc (embeddings cross the
shuffle once, already keyed by doc); grouping is a running sum over
the same window; consensus is a bounded per-task self-join (models
per task <= handful) plus struct-argmax aggregations; the classifier
parse is map-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

SIMILARITY_THRESHOLD = 0.65
BOUNDARY_MARKERS = ["new product", "product name:", "model:",
                    "collection:", "series:"]
MODEL_WEIGHTS = {"claude-haiku-4-5": 0.85, "claude-sonnet-4-6": 0.92,
                 "claude-opus-4-8": 1.0}
DEFAULT_WEIGHT = 0.5
HIGH_AGREEMENT = 0.8
MEDIUM_AGREEMENT = 0.5
KEY_FIELDS = ["name", "product_name", "category", "material_type",
              "description"]
VOTE_FIELDS = ["name", "product_name", "category", "material_type"]


# ---------------------------------------------------------------------------
# 1. boundary detection


def _cosine01(a: Column, b: Column) -> Column:
    """(cos+1)/2, 0.0 on zero norms, 0.5 when either side is NULL."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    n1 = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    n2 = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    sim = F.when((n1 == 0.0) | (n2 == 0.0), 0.0).otherwise(
        (dot / (n1 * n2) + 1) / 2)
    return F.when(a.isNull() | b.isNull(), 0.5).otherwise(sim)


def detect_boundaries(chunks: DataFrame) -> DataFrame:
    """chunks: (doc_id, idx, content, page_number, has_images,
    embedding array<double> nullable).  Emits one row per detected
    boundary: (doc_id, index, confidence, similarity, has_marker,
    page_break, has_image, reason)."""
    w = Window.partitionBy("doc_id").orderBy("idx")
    nxt_emb = F.lead("embedding").over(w)
    nxt_content = F.lead("content").over(w)
    nxt_page = F.lead("page_number").over(w)
    nxt_img = F.lead("has_images").over(w)
    has_next = F.lead("idx").over(w).isNotNull()

    sim = _cosine01(F.col("embedding"), nxt_emb)
    low = F.lower(F.coalesce(nxt_content, F.lit("")))
    marker = None
    for m in BOUNDARY_MARKERS:
        c = low.contains(m)
        marker = c if marker is None else (marker | c)
    page_break = (F.coalesce(nxt_page, F.lit(0))
                  > F.coalesce("page_number", F.lit(0)))
    has_img = F.coalesce(nxt_img, F.lit(False))
    c0 = 1 - sim
    c1 = F.when(marker, F.least(F.lit(1.0), c0 + 0.3)).otherwise(c0)
    c2 = F.when(page_break, F.least(F.lit(1.0), c1 + 0.15)).otherwise(c1)
    conf = F.when(has_img, F.least(F.lit(1.0), c2 + 0.1)).otherwise(c2)

    reason_parts = F.array_compact(F.array(
        F.when(sim < SIMILARITY_THRESHOLD,
               F.concat(F.lit("low similarity ("),
                        F.format_number(sim, 2), F.lit(")"))),
        F.when(marker, "structural marker"),
        F.when(page_break, "page break"),
        F.when(has_img, "has image")))
    reason = F.when(F.size(reason_parts) > 0,
                    F.array_join(reason_parts, ", ")).otherwise("unknown")

    staged = chunks.select(
        "doc_id", "idx", has_next.alias("hn"), sim.alias("similarity"),
        marker.alias("has_marker"), page_break.alias("page_break"),
        has_img.alias("has_image"), conf.alias("confidence"),
        reason.alias("reason"))
    return (staged.where(F.col("hn") & (F.col("confidence") >= 0.6))
            .select("doc_id", (F.col("idx") + 1).alias("index"),
                    "confidence", "similarity",
                    F.col("has_marker").cast("string").alias("has_marker"),
                    F.col("page_break").cast("string").alias("page_break"),
                    F.col("has_image").cast("string").alias("has_image"),
                    "reason"))


def group_by_boundaries(chunks: DataFrame) -> DataFrame:
    """chunk -> product-group assignment: group id = running count of
    boundary starts at indices <= idx (boundary indices are >= 1 so
    the reference's nonempty-guard never fires)."""
    w = Window.partitionBy("doc_id").orderBy("idx")
    nxt_emb = F.lead("embedding").over(w)
    nxt_content = F.lead("content").over(w)
    nxt_page = F.lead("page_number").over(w)
    nxt_img = F.lead("has_images").over(w)
    has_next = F.lead("idx").over(w).isNotNull()
    sim = _cosine01(F.col("embedding"), nxt_emb)
    low = F.lower(F.coalesce(nxt_content, F.lit("")))
    marker = None
    for m in BOUNDARY_MARKERS:
        c = low.contains(m)
        marker = c if marker is None else (marker | c)
    page_break = (F.coalesce(nxt_page, F.lit(0))
                  > F.coalesce("page_number", F.lit(0)))
    has_img = F.coalesce(nxt_img, F.lit(False))
    c0 = 1 - sim
    c1 = F.when(marker, F.least(F.lit(1.0), c0 + 0.3)).otherwise(c0)
    c2 = F.when(page_break, F.least(F.lit(1.0), c1 + 0.15)).otherwise(c1)
    conf = F.when(has_img, F.least(F.lit(1.0), c2 + 0.1)).otherwise(c2)
    edge = has_next & (conf >= 0.6)  # boundary BEFORE idx+1
    staged = chunks.select("doc_id", "idx", edge.alias("edge"))
    wl = Window.partitionBy("doc_id").orderBy("idx")
    starts = F.lag("edge", 1, False).over(wl)  # True -> new group here
    grp = F.sum(starts.cast("int")).over(wl)
    out = staged.select("doc_id", "idx", grp.alias("group_id"))
    sizes = out.groupBy("doc_id", "group_id").agg(
        F.count("*").alias("n_chunks"))
    return (out.join(sizes, ["doc_id", "group_id"])
            .select("doc_id", "idx", "group_id", "n_chunks"))


def boundaries_sql(groups: bool = False) -> str:
    """DuckDB twin over a CTE ``chunks_in`` (doc_id, idx, content,
    page_number, has_images, embedding DOUBLE[])."""
    markers = " OR ".join(
        f"contains(low, '{m}')" for m in BOUNDARY_MARKERS)
    body = f"""
    nx AS (SELECT doc_id, idx, page_number, embedding,
                  lead(embedding) OVER w AS ne,
                  lower(coalesce(lead(content) OVER w, '')) AS low,
                  lead(page_number) OVER w AS np,
                  lead(has_images) OVER w AS ni,
                  lead(idx) OVER w IS NOT NULL AS hn
           FROM chunks_in
           WINDOW w AS (PARTITION BY doc_id ORDER BY idx)),
    sims AS (SELECT *,
        list_sum(list_transform(list_zip(embedding, ne),
                 p -> p[1] * p[2])) AS dot,
        sqrt(list_sum(list_transform(embedding, v -> v * v))) AS n1,
        sqrt(list_sum(list_transform(ne, v -> v * v))) AS n2
        FROM nx),
    sim1 AS (SELECT *, CASE
                 WHEN embedding IS NULL OR ne IS NULL
                     THEN CAST(0.5 AS DOUBLE)
                 WHEN n1 = 0 OR n2 = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE (dot / (n1 * n2) + 1) / 2 END AS sim,
                 ({markers}) AS marker,
                 coalesce(np, 0) > coalesce(page_number, 0) AS pb,
                 coalesce(ni, false) AS hi
             FROM sims),
    conf1 AS (SELECT *, CASE WHEN marker
                  THEN least(CAST(1.0 AS DOUBLE),
                             1 - sim + CAST(0.3 AS DOUBLE))
                  ELSE 1 - sim END AS c1 FROM sim1),
    conf2 AS (SELECT *, CASE WHEN pb
                  THEN least(CAST(1.0 AS DOUBLE),
                             c1 + CAST(0.15 AS DOUBLE))
                  ELSE c1 END AS c2 FROM conf1),
    confs AS (SELECT *, CASE WHEN hi
                  THEN least(CAST(1.0 AS DOUBLE),
                             c2 + CAST(0.1 AS DOUBLE))
                  ELSE c2 END AS conf FROM conf2)"""
    if groups:
        return body + """,
    edges AS (SELECT doc_id, idx, hn AND conf >= 0.6 AS edge
              FROM confs),
    starts AS (SELECT doc_id, idx,
                      coalesce(lag(edge) OVER
                          (PARTITION BY doc_id ORDER BY idx),
                          false) AS st
               FROM edges),
    grp AS (SELECT doc_id, idx,
                   sum(CASE WHEN st THEN 1 ELSE 0 END) OVER
                       (PARTITION BY doc_id ORDER BY idx
                        ROWS UNBOUNDED PRECEDING) AS group_id
            FROM starts)
    SELECT doc_id, idx, CAST(group_id AS BIGINT) AS group_id,
           count(*) OVER (PARTITION BY doc_id, group_id) AS n_chunks
    FROM grp"""
    return body + f""",
    res AS (SELECT doc_id, idx + 1 AS index, conf AS confidence,
                   sim AS similarity,
                   CAST(marker AS VARCHAR) AS has_marker,
                   CAST(pb AS VARCHAR) AS page_break,
                   CAST(hi AS VARCHAR) AS has_image,
                   CASE WHEN len(parts) > 0
                        THEN array_to_string(parts, ', ')
                        ELSE 'unknown' END AS reason
            FROM (SELECT *, list_filter([
                      CASE WHEN sim < CAST({SIMILARITY_THRESHOLD}
                               AS DOUBLE)
                           THEN 'low similarity ('
                                || format('{{:.2f}}', sim) || ')' END,
                      CASE WHEN marker THEN 'structural marker' END,
                      CASE WHEN pb THEN 'page break' END,
                      CASE WHEN hi THEN 'has image' END],
                      v -> v IS NOT NULL) AS parts
                  FROM confs)
            WHERE hn AND conf >= 0.6)
    SELECT * FROM res"""


# ---------------------------------------------------------------------------
# 2. consensus validation


def consensus_validate(results: DataFrame) -> DataFrame:
    """results: (task_id, ord, model, success, name, product_name,
    category, material_type, description, confidence_score).  Emits
    per task the consensus decision."""
    weight = F.lit(DEFAULT_WEIGHT)
    for m, wt in MODEL_WEIGHTS.items():
        weight = F.when(F.col("model") == m, F.lit(wt)).otherwise(weight)
    key_parts = F.array_compact(F.array(*[
        F.when(F.col(k).isNotNull() & (F.col(k) != ""),
               F.lower(F.trim(F.col(k)))) for k in KEY_FIELDS]))
    agree_key = F.when(F.size(key_parts) > 0,
                       F.array_join(key_parts, " | ")).otherwise(
        F.coalesce(F.col("confidence_score").cast("string"), F.lit("")))
    vote_key = F.concat_ws(" ", *[
        F.when(F.col(k).isNotNull() & (F.col(k) != ""),
               F.lower(F.trim(F.col(k)))) for k in VOTE_FIELDS])
    # round 6: persist the fan-out frames — `ok` feeds the agreement
    # self-join, both vote winners and the weighted winner, and
    # `counts` is referenced by the ok-join, the final stats join and
    # the failure anti-join; unpersisted, each consumer re-ran the
    # whole synth + projection subtree (measured plan: 56 Exchanges /
    # 52 source scans for this one query)
    from ..core.cache import track
    valid = track(results.where("success")
                  .select("task_id", "ord", "model", "name", "category",
                          "confidence_score", weight.alias("weight"),
                          agree_key.alias("akey"), vote_key.alias("vkey")))
    counts = track(valid.groupBy("task_id").agg(F.count("*").alias("n")))
    ok = track(valid.join(counts.where("n >= 2"), "task_id"))

    # pairwise agreement
    a = ok.select("task_id", F.col("ord").alias("i"),
                  F.col("akey").alias("ka"))
    b = ok.select("task_id", F.col("ord").alias("j"),
                  F.col("akey").alias("kb"))
    words = lambda k: F.array_distinct(F.filter(  # noqa: E731
        F.split(k, "[ \\t\\r\\n\\x0b\\f]+"), lambda w: w != ""))
    pair_score = F.when(F.col("ka") == F.col("kb"), F.lit(1.0)).otherwise(
        F.size(F.array_intersect(words(F.col("ka")), words(F.col("kb"))))
        / F.greatest(F.size(F.array_union(words(F.col("ka")),
                                          words(F.col("kb")))), F.lit(1)))
    agr = (a.join(b, "task_id").where(F.col("i") < F.col("j"))
           .groupBy("task_id")
           .agg(F.avg(pair_score).alias("agreement")))

    # majority winner: best key by (count desc, first insertion),
    # then the first result carrying it
    kcnt = ok.groupBy("task_id", "vkey").agg(
        F.count("*").alias("cnt"), F.min("ord").alias("first_ord"))
    bestk = kcnt.groupBy("task_id").agg(F.max(F.struct(
        F.col("cnt"), (-F.col("first_ord")).alias("ni"),
        F.col("vkey"))).alias("bk"))
    maj = (ok.join(bestk, "task_id")
           .where(F.col("vkey") == F.col("bk")["vkey"])
           .groupBy("task_id")
           .agg(F.min(F.struct("ord", "name", "category", "model",
                               "confidence_score")).alias("mw")))
    # weighted winner: max weight*conf (default 0.5), first on ties
    wscore = F.col("weight") * F.coalesce("confidence_score", F.lit(0.5))
    wgt = ok.groupBy("task_id").agg(F.max(F.struct(
        wscore.alias("s"), (-F.col("ord")).alias("ni"),
        F.col("name").alias("name"), F.col("category").alias("category"),
        F.col("model").alias("model"),
        F.col("confidence_score").alias("confidence_score")))
        .alias("ww"))

    res = (agr.join(maj, "task_id").join(wgt, "task_id")
           .join(counts, "task_id"))
    high = F.col("agreement") >= HIGH_AGREEMENT
    med = F.col("agreement") >= MEDIUM_AGREEMENT
    method = (F.when(high, "majority_vote")
              .when(med, "weighted_vote")
              .otherwise("weighted_vote_flagged"))
    pick = lambda f: F.when(  # noqa: E731
        high, F.col("mw")[f]).otherwise(F.col("ww")[f])
    decided = res.select(
        "task_id", F.lit("true").alias("success"), "agreement",
        method.alias("decision_method"),
        (~med).cast("string").alias("needs_human_review"),
        F.col("n").alias("model_count"),
        pick("name").alias("final_name"),
        pick("category").alias("final_category"),
        pick("model").alias("final_model"),
        pick("confidence_score").alias("final_confidence"))
    failed = (results.select("task_id").distinct()
              .join(counts.where("n >= 2"), "task_id", "left_anti")
              .select("task_id", F.lit("false").alias("success"),
                      F.lit(None).cast("double").alias("agreement"),
                      F.lit(None).cast("string").alias("decision_method"),
                      F.lit(None).cast("string")
                      .alias("needs_human_review"),
                      F.lit(None).cast("long").alias("model_count"),
                      *[F.lit(None).cast("string").alias(c) for c in
                        ("final_name", "final_category", "final_model")],
                      F.lit(None).cast("double")
                      .alias("final_confidence")))
    return decided.unionByName(failed)


def consensus_sql() -> str:
    """DuckDB twin over a CTE ``results_in`` (same shape)."""
    wcase = "CASE " + " ".join(
        f"WHEN model = '{m}' THEN CAST({w} AS DOUBLE)"
        for m, w in MODEL_WEIGHTS.items()) + \
        f" ELSE CAST({DEFAULT_WEIGHT} AS DOUBLE) END"
    kparts = ", ".join(
        f"CASE WHEN {k} IS NOT NULL AND {k} <> '' "
        f"THEN lower(trim({k})) END" for k in KEY_FIELDS)
    vparts = ", ".join(
        f"CASE WHEN {k} IS NOT NULL AND {k} <> '' "
        f"THEN lower(trim({k})) END" for k in VOTE_FIELDS)
    words = ("list_distinct(list_filter(regexp_split_to_array({0}, "
             "'[ \\t\\r\\n\\x0b\\f]+'), w -> w <> ''))")
    wa, wb = words.format("ka"), words.format("kb")
    return f"""
    valid AS (SELECT task_id, ord, model, name, category,
                     confidence_score, {wcase} AS weight,
                     CASE WHEN len(list_filter([{kparts}],
                              v -> v IS NOT NULL)) > 0
                          THEN array_to_string(list_filter([{kparts}],
                              v -> v IS NOT NULL), ' | ')
                          ELSE coalesce(CAST(confidence_score
                              AS VARCHAR), '') END AS akey,
                     concat_ws(' ', {vparts}) AS vkey
              FROM results_in WHERE success),
    counts AS (SELECT task_id, count(*) AS n FROM valid GROUP BY 1),
    ok AS (SELECT v.* FROM valid v JOIN counts USING (task_id)
           WHERE n >= 2),
    pairs AS (SELECT a.task_id,
                     CASE WHEN a.akey = b.akey THEN CAST(1.0 AS DOUBLE)
                          ELSE len(list_intersect({wa.replace('ka', 'a.akey')},
                                   {wb.replace('kb', 'b.akey')}))
                               / greatest(len(list_distinct(
                                   {wa.replace('ka', 'a.akey')}
                                   || {wb.replace('kb', 'b.akey')})), 1)
                     END AS ps
              FROM ok a JOIN ok b ON a.task_id = b.task_id
                   AND a.ord < b.ord),
    agr AS (SELECT task_id, avg(ps) AS agreement FROM pairs
            GROUP BY 1),
    kcnt AS (SELECT task_id, vkey, count(*) AS cnt,
                    min(ord) AS first_ord
             FROM ok GROUP BY 1, 2),
    bestk AS (SELECT task_id, max(struct_pack(cnt := cnt,
                  ni := -first_ord, vkey := vkey)) AS bk
              FROM kcnt GROUP BY 1),
    maj AS (SELECT o.task_id, min(struct_pack(ord := o.ord,
                name := o.name, category := o.category,
                model := o.model,
                confidence_score := o.confidence_score)) AS mw
            FROM ok o JOIN bestk USING (task_id)
            WHERE o.vkey = (bk).vkey GROUP BY 1),
    wgt AS (SELECT task_id, max(struct_pack(
                s := weight * coalesce(confidence_score,
                                       CAST(0.5 AS DOUBLE)),
                ni := -ord, name := name, category := category,
                model := model, confidence_score := confidence_score))
                AS ww
            FROM ok GROUP BY 1),
    res AS (SELECT a.task_id, a.agreement, m.mw, w.ww, c.n
            FROM agr a JOIN maj m USING (task_id)
                 JOIN wgt w USING (task_id)
                 JOIN counts c USING (task_id))
    SELECT task_id, 'true' AS success, agreement,
           CASE WHEN agreement >= CAST({HIGH_AGREEMENT} AS DOUBLE)
                THEN 'majority_vote'
                WHEN agreement >= CAST({MEDIUM_AGREEMENT} AS DOUBLE)
                THEN 'weighted_vote'
                ELSE 'weighted_vote_flagged' END AS decision_method,
           CAST(NOT (agreement >= CAST({MEDIUM_AGREEMENT} AS DOUBLE))
                AS VARCHAR) AS needs_human_review,
           n AS model_count,
           CASE WHEN agreement >= CAST({HIGH_AGREEMENT} AS DOUBLE)
                THEN (mw).name ELSE (ww).name END AS final_name,
           CASE WHEN agreement >= CAST({HIGH_AGREEMENT} AS DOUBLE)
                THEN (mw).category ELSE (ww).category END
               AS final_category,
           CASE WHEN agreement >= CAST({HIGH_AGREEMENT} AS DOUBLE)
                THEN (mw).model ELSE (ww).model END AS final_model,
           CASE WHEN agreement >= CAST({HIGH_AGREEMENT} AS DOUBLE)
                THEN (mw).confidence_score
                ELSE (ww).confidence_score END AS final_confidence
    FROM res
    UNION ALL
    SELECT task_id, 'false', NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL
    FROM (SELECT DISTINCT task_id FROM results_in) t
    WHERE task_id NOT IN (SELECT task_id FROM counts WHERE n >= 2)"""


# ---------------------------------------------------------------------------
# 3. classifier response parse + heuristics + deep enrich


def classify_parse(rows: DataFrame) -> DataFrame:
    """rows: (row_id, response_text, content, has_images).  Emits the
    stage-1 parse, the exception-path heuristic, and the deep-enrich
    metadata."""
    rt = F.coalesce(F.col("response_text"), F.lit(""))
    parts = F.split(F.trim(rt), "\\|")
    two = F.size(parts) >= 2
    cat_p = F.lower(F.trim(parts[0]))
    conf_p = F.coalesce(F.trim(parts[1]).try_cast("double"), F.lit(0.5))
    rl = F.lower(F.trim(rt))
    cat_fb = (F.when(rl.contains("product"), "product")
              .when(rl.contains("supporting"), "supporting")
              .when(rl.contains("administrative"), "administrative")
              .otherwise("transitional"))
    category = F.when(two, cat_p).otherwise(cat_fb)
    conf0 = F.when(two, conf_p).otherwise(F.lit(0.6))
    conf = F.when(F.col("has_images") & (category == "product"),
                  F.least(F.lit(1.0), conf0 + 0.1)).otherwise(conf0)

    low = F.lower(F.coalesce(F.col("content"), F.lit("")))

    def anyof(*ws):
        c = None
        for wd in ws:
            k = low.contains(wd)
            c = k if c is None else (c | k)
        return c

    h_cat = (F.when(anyof("product", "specification", "features",
                          "dimensions"), "product")
             .when(anyof("technical", "installation", "warranty",
                         "certificate"), "supporting")
             .when(anyof("company", "contact", "legal", "copyright"),
                   "administrative")
             .otherwise("transitional"))
    h_conf = F.when(h_cat == "transitional", 0.4).otherwise(0.5)

    flags = [
        (low.contains("specification") | low.contains("spec"))
        .alias("has_specifications"),
        anyof("dimension", "size", "width", "height", "depth")
        .alias("has_dimensions"),
        anyof("material", "composition", "finish").alias("has_materials"),
        anyof("price", "cost", "$", "€", "£").alias("has_pricing"),
    ]
    nflags = sum(F.when(fl, 1).otherwise(0) for fl in
                 [f for f in flags])
    e_conf = F.least(F.lit(0.95), F.lit(0.6) + nflags * F.lit(0.1))
    return rows.select(
        "row_id", category.alias("category"), conf.alias("confidence"),
        h_cat.alias("heuristic_category"),
        h_conf.cast("double").alias("heuristic_confidence"),
        *flags,
        F.length(F.coalesce(F.col("content"), F.lit("")))
        .alias("content_length"),
        e_conf.alias("enrich_confidence"))


def classify_parse_sql() -> str:
    """DuckDB twin over a CTE ``rows_in`` (row_id, response_text,
    content, has_images)."""
    def anyof(col, *ws):
        return " OR ".join(f"contains({col}, '{w}')" for w in ws)

    return f"""
    base AS (SELECT row_id, has_images,
                    coalesce(response_text, '') AS rt,
                    lower(coalesce(content, '')) AS low
             FROM rows_in),
    parsed AS (SELECT *,
        string_split(trim(rt), '|') AS parts,
        lower(trim(rt)) AS rl FROM base),
    st1 AS (SELECT *,
        CASE WHEN len(parts) >= 2 THEN lower(trim(parts[1]))
             WHEN contains(rl, 'product') THEN 'product'
             WHEN contains(rl, 'supporting') THEN 'supporting'
             WHEN contains(rl, 'administrative') THEN 'administrative'
             ELSE 'transitional' END AS category,
        CASE WHEN len(parts) >= 2
             THEN coalesce(TRY_CAST(trim(parts[2]) AS DOUBLE),
                           CAST(0.5 AS DOUBLE))
             ELSE CAST(0.6 AS DOUBLE) END AS conf0
        FROM parsed),
    st2 AS (SELECT *, CASE
        WHEN has_images AND category = 'product'
        THEN least(CAST(1.0 AS DOUBLE), conf0 + CAST(0.1 AS DOUBLE))
        ELSE conf0 END AS confidence FROM st1),
    fl AS (SELECT *,
        (contains(low, 'specification') OR contains(low, 'spec'))
            AS has_specifications,
        ({anyof('low', 'dimension', 'size', 'width', 'height',
                'depth')}) AS has_dimensions,
        ({anyof('low', 'material', 'composition', 'finish')})
            AS has_materials,
        ({anyof('low', 'price', 'cost', '$', '€', '£')})
            AS has_pricing
        FROM st2)
    SELECT row_id, category, confidence,
           CASE WHEN {anyof('low', 'product', 'specification',
                            'features', 'dimensions')} THEN 'product'
                WHEN {anyof('low', 'technical', 'installation',
                            'warranty', 'certificate')}
                    THEN 'supporting'
                WHEN {anyof('low', 'company', 'contact', 'legal',
                            'copyright')} THEN 'administrative'
                ELSE 'transitional' END AS heuristic_category,
           CASE WHEN NOT ({anyof('low', 'product', 'specification',
                                 'features', 'dimensions')})
                     AND NOT ({anyof('low', 'technical',
                                     'installation', 'warranty',
                                     'certificate')})
                     AND NOT ({anyof('low', 'company', 'contact',
                                     'legal', 'copyright')})
                THEN CAST(0.4 AS DOUBLE)
                ELSE CAST(0.5 AS DOUBLE) END AS heuristic_confidence,
           has_specifications, has_dimensions, has_materials,
           has_pricing,
           CAST(length(low) AS INT) AS content_length,
           least(CAST(0.95 AS DOUBLE), CAST(0.6 AS DOUBLE)
                 + (CASE WHEN has_specifications THEN 1 ELSE 0 END
                    + CASE WHEN has_dimensions THEN 1 ELSE 0 END
                    + CASE WHEN has_materials THEN 1 ELSE 0 END
                    + CASE WHEN has_pricing THEN 1 ELSE 0 END)
                   * CAST(0.1 AS DOUBLE)) AS enrich_confidence
    FROM fl"""


# ---------------------------------------------------------------------------
# synthesized inputs (shared shape with the SQL twins)


def synth_boundary_chunks(events: DataFrame) -> DataFrame:
    """60 docs x 12 chunks; 4-dim small-int embeddings (exact dots and
    norm-squares in both engines), NULL embedding every 17th event,
    all-zero vector every 23rd (zero-norm pin), a structural marker
    every 9th (d+idx), page breaks every 3 chunks with NULL
    page_number / has_images sprinkled in."""
    e = F.col("event_id")
    base = (events.select((e % 60).alias("d"),
                          F.expr("event_id div 60").cast("int")
                          .alias("idx"), e.alias("e"))
            .where(F.col("idx") < 12))
    d, idx, ev = F.col("d"), F.col("idx"), F.col("e")
    comps = [(((ev * 5 + j * 13) % 7) - 3).cast("double")
             for j in range(4)]
    vec = (F.when(ev % 17 == 0, F.lit(None)
                  .cast("array<double>"))
           .when(ev % 23 == 0, F.array(*[F.lit(0.0)] * 4))
           .otherwise(F.array(*comps)))
    content = (F.when((d + idx) % 9 == 0,
                      F.concat(F.lit("Model: X"), d.cast("string"),
                               F.lit(" intro")))
               .otherwise(F.concat(F.lit("chunk text "),
                                   d.cast("string"), F.lit(" "),
                                   idx.cast("string"))))
    page = F.when(ev % 19 == 0, F.lit(None).cast("int")).otherwise(
        (F.expr("idx div 3") + 1).cast("int"))
    img = F.when(ev % 13 == 0, F.lit(None).cast("boolean")).otherwise(
        ev % 5 == 0)
    return base.select(d.alias("doc_id"), idx.alias("idx"),
                       content.alias("content"),
                       page.alias("page_number"),
                       img.alias("has_images"),
                       vec.alias("embedding"))


SYNTH_BOUNDARY_SQL = """
SELECT d AS doc_id, idx,
       CASE WHEN (d + idx) % 9 = 0
            THEN 'Model: X' || d || ' intro'
            ELSE 'chunk text ' || d || ' ' || idx END AS content,
       CAST(CASE WHEN e % 19 = 0 THEN NULL
                 ELSE idx // 3 + 1 END AS INT) AS page_number,
       CASE WHEN e % 13 = 0 THEN NULL ELSE e % 5 = 0 END AS has_images,
       CASE WHEN e % 17 = 0 THEN NULL
            WHEN e % 23 = 0
                THEN [0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE,
                      0.0::DOUBLE]
            ELSE [CAST((e * 5 + 0) % 7 - 3 AS DOUBLE),
                  CAST((e * 5 + 13) % 7 - 3 AS DOUBLE),
                  CAST((e * 5 + 26) % 7 - 3 AS DOUBLE),
                  CAST((e * 5 + 39) % 7 - 3 AS DOUBLE)]
       END AS embedding
FROM (SELECT event_id % 60 AS d, CAST(event_id // 60 AS INT) AS idx,
             event_id AS e
      FROM events WHERE event_id // 60 < 12)"""


_CONS_MODELS = ["claude-haiku-4-5", "claude-sonnet-4-6",
                "claude-opus-4-8", "gpt-x"]


def synth_consensus_results(events: DataFrame) -> DataFrame:
    """150 tasks x 4 model slots; regimes t = task %% 6: 0 unanimous
    (majority), 1 partial word overlap (weighted), 2 disjoint keys
    (flagged), 3 only one success (consensus failure), 4 keys from
    confidence_score only, 5 mixed with an unknown-weight model."""
    e = F.col("event_id")
    base = (events.select((e % 150).alias("task_id"),
                          F.expr("(event_id div 150) % 4").cast("int")
                          .alias("ord"))
            .distinct())
    t = F.col("task_id") % 6
    o = F.col("ord")
    model = (F.when(o == 0, _CONS_MODELS[0])
             .when(o == 1, _CONS_MODELS[1])
             .when(o == 2, _CONS_MODELS[2])
             .otherwise(_CONS_MODELS[3]))
    success = ~((t == 3) & (o > 0)) & ~((t == 2) & (o == 3))
    ts = F.col("task_id").cast("string")
    name = (F.when(t == 0, F.concat(F.lit("Alfa Tile "), ts))
            .when(t == 1, F.when(o == 0,
                                 F.concat(F.lit("alfa tile white "), ts))
                  .when(o == 1, F.concat(F.lit("Alfa Tile "), ts))
                  .otherwise(F.concat(F.lit("beta stone "), ts)))
            .when(t == 2, F.concat(F.lit("name"), o.cast("string"),
                                   F.lit("x"), ts))
            .when(t == 5, F.when(o <= 1, F.concat(F.lit("gamma "), ts))
                  .otherwise(F.concat(F.lit("gamma slab "), ts))))
    category = (F.when(t == 0, "ceramic")
                .when((t == 1) & (o <= 1), "ceramic")
                .when(t == 1, "stone")
                .when(t == 5, "slab"))
    conf = F.when(e % 9 == 0, F.lit(None).cast("double")).otherwise(
        ((e % 7) + 1) * F.lit(0.125))
    return base.join(
        events.select((e % 150).alias("task_id"),
                      F.expr("(event_id div 150) % 4").cast("int")
                      .alias("ord"), e.alias("emin")),
        ["task_id", "ord"]).groupBy("task_id", "ord").agg(
        F.min("emin").alias("e")).select(
        "task_id", "ord",
        model.alias("model"), success.alias("success"),
        name.alias("name"),
        F.lit(None).cast("string").alias("product_name"),
        category.alias("category"),
        F.when(t == 5, "porcelain").alias("material_type"),
        F.when(t == 4, F.lit(None).cast("string"))
        .alias("description"),
        F.when(F.col("e") % 9 == 0, F.lit(None).cast("double"))
        .otherwise(((F.col("e") % 7) + 1) * F.lit(0.125))
        .alias("confidence_score"))


SYNTH_CONSENSUS_SQL = """
SELECT task_id, ord,
       CASE WHEN ord = 0 THEN 'claude-haiku-4-5'
            WHEN ord = 1 THEN 'claude-sonnet-4-6'
            WHEN ord = 2 THEN 'claude-opus-4-8'
            ELSE 'gpt-x' END AS model,
       NOT (task_id % 6 = 3 AND ord > 0)
           AND NOT (task_id % 6 = 2 AND ord = 3) AS success,
       CASE WHEN task_id % 6 = 0 THEN 'Alfa Tile ' || task_id
            WHEN task_id % 6 = 1 THEN
                CASE WHEN ord = 0 THEN 'alfa tile white ' || task_id
                     WHEN ord = 1 THEN 'Alfa Tile ' || task_id
                     ELSE 'beta stone ' || task_id END
            WHEN task_id % 6 = 2 THEN 'name' || ord || 'x' || task_id
            WHEN task_id % 6 = 5 THEN
                CASE WHEN ord <= 1 THEN 'gamma ' || task_id
                     ELSE 'gamma slab ' || task_id END
       END AS name,
       NULL AS product_name,
       CASE WHEN task_id % 6 = 0 THEN 'ceramic'
            WHEN task_id % 6 = 1 AND ord <= 1 THEN 'ceramic'
            WHEN task_id % 6 = 1 THEN 'stone'
            WHEN task_id % 6 = 5 THEN 'slab' END AS category,
       CASE WHEN task_id % 6 = 5 THEN 'porcelain' END
           AS material_type,
       CAST(NULL AS VARCHAR) AS description,
       CASE WHEN e % 9 = 0 THEN NULL
            ELSE (e % 7 + 1) * CAST(0.125 AS DOUBLE) END
           AS confidence_score
FROM (SELECT event_id % 150 AS task_id,
             CAST((event_id // 150) % 4 AS INT) AS ord,
             min(event_id) AS e
      FROM events GROUP BY 1, 2)"""


def synth_classifier_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    resp = (F.when(e % 8 == 0, "PRODUCT|0.85")
            .when(e % 8 == 1, " supporting | 0.7 ")
            .when(e % 8 == 2, "ADMINISTRATIVE|abc")
            .when(e % 8 == 3, "This looks like a Product page")
            .when(e % 8 == 4, "nothing matches here")
            .when(e % 8 == 5, "PRODUCT|0.9|extra")
            .when(e % 8 == 6, "TRANSITIONAL|0.95")
            .otherwise("Banana|0.5"))
    content = (F.when(e % 6 == 0,
                      "Product specification with dimensions 10x20")
               .when(e % 6 == 1, "technical installation warranty guide")
               .when(e % 6 == 2, "company contact legal notice")
               .when(e % 6 == 3, "just some prose")
               .when(e % 6 == 4, "price $ 100 material finish spec")
               .otherwise(""))
    return events.select(e.alias("row_id"), resp.alias("response_text"),
                         content.alias("content"),
                         (e % 3 == 0).alias("has_images"))


SYNTH_CLASSIFIER_SQL = """
SELECT event_id AS row_id,
       CASE WHEN event_id % 8 = 0 THEN 'PRODUCT|0.85'
            WHEN event_id % 8 = 1 THEN ' supporting | 0.7 '
            WHEN event_id % 8 = 2 THEN 'ADMINISTRATIVE|abc'
            WHEN event_id % 8 = 3
                THEN 'This looks like a Product page'
            WHEN event_id % 8 = 4 THEN 'nothing matches here'
            WHEN event_id % 8 = 5 THEN 'PRODUCT|0.9|extra'
            WHEN event_id % 8 = 6 THEN 'TRANSITIONAL|0.95'
            ELSE 'Banana|0.5' END AS response_text,
       CASE WHEN event_id % 6 = 0
                THEN 'Product specification with dimensions 10x20'
            WHEN event_id % 6 = 1
                THEN 'technical installation warranty guide'
            WHEN event_id % 6 = 2 THEN 'company contact legal notice'
            WHEN event_id % 6 = 3 THEN 'just some prose'
            WHEN event_id % 6 = 4
                THEN 'price $ 100 material finish spec'
            ELSE '' END AS content,
       event_id % 3 = 0 AS has_images
FROM events"""


# ---------------------------------------------------------------------------
# Claude validation/enrichment status ladders (app/api/anthropic_routes.py)
# ---------------------------------------------------------------------------

def claude_status_ladders(results: DataFrame) -> DataFrame:
    """anthropic_routes.py pins:

    - image validation (:228-234): quality_score >= 0.7 'valid',
      >= 0.5 'needs_review', else 'invalid' — INCLUSIVE boundaries
      (exactly 0.7 is valid, exactly 0.5 needs_review); an ABSENT
      quality_score defaults 0 -> 'invalid' (pin);
    - product enrichment (:339-345): confidence >= 0.7 'enriched',
      >= 0.4 'partial', else 'failed' — the two ladders share the 0.7
      top rung but diverge at the middle one (0.5 vs 0.4 — pin);
    - the vision prompt's product-group context block is emitted only
      for a non-empty list (:161-165) — None and [] both omit it.
    """
    from pyspark.sql import functions as F
    q = F.when(F.col("has_quality"), F.col("quality_score")) \
        .otherwise(F.lit(0.0))
    c = F.when(F.col("has_confidence"), F.col("confidence_score")) \
        .otherwise(F.lit(0.0))
    return results.select(
        "result_id",
        (F.when(q >= 0.7, "valid").when(q >= 0.5, "needs_review")
         .otherwise("invalid")).alias("validation_status"),
        (F.when(c >= 0.7, "enriched").when(c >= 0.4, "partial")
         .otherwise("failed")).alias("enrichment_status"),
        (F.col("n_product_groups") > 0).alias("groups_context_emitted"))


def synth_claude_results(events: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("result_id"),
        (e % 7 != 0).alias("has_quality"),
        F.when(e % 9 == 0, F.lit(0.7)).when(e % 9 == 1, F.lit(0.5))
        .otherwise((e % 100).cast("double") / 100)
        .alias("quality_score"),
        (e % 5 != 0).alias("has_confidence"),
        F.when(e % 8 == 0, F.lit(0.4))
        .otherwise((e % 100).cast("double") / 100)
        .alias("confidence_score"),
        (e % 4).cast("int").alias("n_product_groups"))


SYNTH_CLAUDE_RESULTS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS result_id,
           event_id % 7 <> 0 AS has_quality,
           CASE WHEN event_id % 9 = 0 THEN 0.7
                WHEN event_id % 9 = 1 THEN 0.5
                ELSE CAST(event_id % 100 AS DOUBLE) / 100 END
               AS quality_score,
           event_id % 5 <> 0 AS has_confidence,
           CASE WHEN event_id % 8 = 0 THEN 0.4
                ELSE CAST(event_id % 100 AS DOUBLE) / 100 END
               AS confidence_score,
           CAST(event_id % 4 AS INT) AS n_product_groups
    FROM events
"""


def claude_ladders_sql() -> str:
    return f"""
        WITH r AS ({SYNTH_CLAUDE_RESULTS_SQL}),
        g AS (SELECT *,
                     CASE WHEN has_quality THEN quality_score
                          ELSE 0.0 END AS q,
                     CASE WHEN has_confidence THEN confidence_score
                          ELSE 0.0 END AS c
              FROM r)
        SELECT result_id,
               CASE WHEN q >= 0.7 THEN 'valid'
                    WHEN q >= 0.5 THEN 'needs_review'
                    ELSE 'invalid' END AS validation_status,
               CASE WHEN c >= 0.7 THEN 'enriched'
                    WHEN c >= 0.4 THEN 'partial'
                    ELSE 'failed' END AS enrichment_status,
               n_product_groups > 0 AS groups_context_emitted
        FROM g
    """
