"""Real quality scoring — image / chunk / product (map-only plans).

Re-expresses the reference's quality scoring service (reference
``app/services/metadata/real_quality_scoring_service.py:20-407``):
three weighted score calculators over flat entity facts.

Semantics pinned:

- image (:61-118 + :330-361): analysis completeness 0.33 (vision) +
  0.33 (claude validation) + 0.34 (clip embedding); dimensions
  ladder 800x600 -> 1.0 / 600x400 -> 0.8 / 400x300 -> 0.6 / else
  0.4; material properties min(1, n/5); embedding coverage 0.6
  (slig) + 0.4 (understanding) capped; confidence default 0.0;
  weights .30/.20/.25/.15/.10; round(_, 3).
- chunk (:119-183 + :371-407): content-length ladder (500-1500 ->
  1.0, 300-500 / 1500-2000 -> 0.8, 200-300 / 2000-2500 -> 0.6,
  else 0.4); coherence = the stored score, or WHEN ZERO the derived
  one (7 material keywords /3 capped, x0.6 + sentence-structure
  50 <= len/sentences <= 150 ? 1.0 : 0.7, x0.4 — note a stored 0.0
  triggers the derivation, pinned); boundary = ends-with .!?:; ?
  1.0 : 0.6 x0.6 + starts-with-capital ? 1.0 : 0.7 x0.4 (on the
  STRIPPED content); metadata richness min(1, fields/5); embedding
  1/0; weights .20/.25/.20/.15/.20; round(_, 3).
- product (:184-328): name ladder (>=10 -> .25, >=5 -> .15, else
  .10, 0 when empty), description ladder (200/.25, 100/.20, 50/.15,
  else .10), long-description ladder (500/.25, 300/.20, 150/.15,
  else .10), +.25 when properties non-empty, capped 1; valid
  properties = values truthy and lower not in {unknown, n/a, none,
  ''} with the 8/6/4/2/1 -> 1.0/.85/.70/.50/.30 ladder; embedding
  1/0; related images 5/3/2/1 -> 1.0/.80/.60/.40; related products
  5/3/2/1 -> 1.0/.75/.50/.30; confidence = metadata confidence
  else (when 0.0) the properties confidence; weights
  .25/.20/.20/.15/.10/.10; round(_, 3).

Rounding note: the reference's round(_, 3) is realized as
floor(x * 1000 + 0.5) / 1000 — Spark's BigDecimal HALF_UP and
DuckDB's float rounding disagree in the last ulp near .0005
boundaries, while this floor form is plain IEEE arithmetic and
therefore bitwise identical on both engines (it differs from
Python's banker's round only at exact midpoints, unreachable here).

Scale: all three are shuffle-free map-only projections.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

IMAGE_WEIGHTS = (0.30, 0.20, 0.25, 0.15, 0.10)
CHUNK_WEIGHTS = (0.20, 0.25, 0.20, 0.15, 0.20)
PRODUCT_WEIGHTS = (0.25, 0.20, 0.20, 0.15, 0.10, 0.10)
COHERENCE_KEYWORDS = ["material", "design", "texture", "color",
                      "surface", "finish", "pattern"]
INVALID_PROPS = ["unknown", "n/a", "none", ""]


def _round3(c: Column) -> Column:
    # deterministic cross-engine round-half-up on the double product
    return F.floor(c * 1000 + 0.5) / 1000


def score_images(images: DataFrame) -> DataFrame:
    """images: (image_id, has_vision, has_claude, has_clip, width,
    height, n_props, has_slig, has_understanding, confidence)."""
    comp = (F.when(F.col("has_vision"), 0.33).otherwise(0.0)
            + F.when(F.col("has_claude"), 0.33).otherwise(0.0)
            + F.when(F.col("has_clip"), 0.34).otherwise(0.0))
    w, h = F.coalesce("width", F.lit(0)), F.coalesce("height", F.lit(0))
    dims = (F.when((w >= 800) & (h >= 600), 1.0)
            .when((w >= 600) & (h >= 400), 0.8)
            .when((w >= 400) & (h >= 300), 0.6)
            .otherwise(0.4))
    props = F.least(F.lit(1.0),
                    F.coalesce("n_props", F.lit(0)) / F.lit(5))
    emb = F.least(F.lit(1.0),
                  F.when(F.col("has_slig"), 0.6).otherwise(0.0)
                  + F.when(F.col("has_understanding"), 0.4)
                  .otherwise(0.0))
    conf = F.coalesce("confidence", F.lit(0.0))
    ws = IMAGE_WEIGHTS
    quality = (comp * ws[0] + dims * ws[1] + props * ws[2]
               + emb * ws[3] + conf * ws[4])
    return images.select(
        "image_id", comp.alias("analysis_completeness"),
        dims.alias("dimensions_quality"),
        props.alias("material_properties"),
        emb.alias("embedding_coverage"), conf.alias("confidence_score"),
        _round3(quality).alias("quality_score"))


def score_chunks(chunks: DataFrame) -> DataFrame:
    """chunks: (chunk_id, content, coherence_score, metadata_n,
    has_embedding)."""
    content = F.coalesce("content", F.lit(""))
    n = F.length(content)
    clen = (F.when((n >= 500) & (n <= 1500), 1.0)
            .when(((n >= 300) & (n < 500)) | ((n > 1500) & (n <= 2000)),
                  0.8)
            .when(((n >= 200) & (n < 300)) | ((n > 2000) & (n <= 2500)),
                  0.6)
            .otherwise(0.4))
    low = F.lower(content)
    kw = F.lit(0)
    for k in COHERENCE_KEYWORDS:
        kw = kw + F.when(low.contains(k), 1).otherwise(0)
    sentences = F.size(F.split(content, "\\.", -1))
    avg = n / F.greatest(sentences, F.lit(1))
    derived = (F.least(F.lit(1.0), kw / F.lit(3)) * 0.6
               + F.when((avg >= 50) & (avg <= 150), 1.0)
               .otherwise(0.7) * 0.4)
    coh = F.when(F.coalesce("coherence_score", F.lit(0.0)) != 0.0,
                 F.col("coherence_score")).otherwise(derived)
    st = F.trim(content)
    boundary = (F.when(st.rlike("[.!?:;]$"), 1.0).otherwise(0.6) * 0.6
                + F.when(st.rlike("^[A-Z]"), 1.0).otherwise(0.7) * 0.4)
    meta = F.least(F.lit(1.0),
                   F.coalesce("metadata_n", F.lit(0)) / F.lit(5))
    emb = F.when(F.col("has_embedding"), 1.0).otherwise(0.0)
    ws = CHUNK_WEIGHTS
    quality = (clen * ws[0] + coh * ws[1] + boundary * ws[2]
               + meta * ws[3] + emb * ws[4])
    return chunks.select(
        "chunk_id", clen.alias("content_length_score"),
        coh.alias("coherence"), boundary.alias("boundary_quality"),
        meta.alias("metadata_richness"),
        emb.alias("embedding_coverage"),
        _round3(quality).alias("quality_score"))


def score_products(products: DataFrame) -> DataFrame:
    """products: (product_id, name, description, long_description,
    properties map<string,string>, has_text_embedding,
    n_related_images, n_related_products, conf_meta, conf_props)."""
    name_n = F.length(F.coalesce("name", F.lit("")))
    desc_n = F.length(F.coalesce("description", F.lit("")))
    ld_n = F.length(F.coalesce("long_description", F.lit("")))
    props = F.coalesce(
        "properties", F.create_map().cast("map<string,string>"))
    nprops = F.size(props)
    meta_score = (
        F.when(name_n == 0, 0.0).when(name_n >= 10, 0.25)
        .when(name_n >= 5, 0.15).otherwise(0.10)
        + F.when(desc_n == 0, 0.0).when(desc_n >= 200, 0.25)
        .when(desc_n >= 100, 0.20).when(desc_n >= 50, 0.15)
        .otherwise(0.10)
        + F.when(ld_n == 0, 0.0).when(ld_n >= 500, 0.25)
        .when(ld_n >= 300, 0.20).when(ld_n >= 150, 0.15)
        .otherwise(0.10)
        + F.when(nprops > 0, 0.25).otherwise(0.0))
    meta_score = F.least(F.lit(1.0), meta_score)
    valid = F.size(F.filter(
        F.map_values(props),
        lambda v: v.isNotNull() & (v != "")
        & ~F.lower(v).isin(*INVALID_PROPS)))
    pscore = (F.when(valid >= 8, 1.0).when(valid >= 6, 0.85)
              .when(valid >= 4, 0.70).when(valid >= 2, 0.50)
              .when(valid >= 1, 0.30).otherwise(0.0))
    emb = F.when(F.col("has_text_embedding"), 1.0).otherwise(0.0)
    ni = F.coalesce("n_related_images", F.lit(0))
    iscore = (F.when(ni >= 5, 1.0).when(ni >= 3, 0.80)
              .when(ni >= 2, 0.60).when(ni >= 1, 0.40).otherwise(0.0))
    np_ = F.coalesce("n_related_products", F.lit(0))
    rscore = (F.when(np_ >= 5, 1.0).when(np_ >= 3, 0.75)
              .when(np_ >= 2, 0.50).when(np_ >= 1, 0.30).otherwise(0.0))
    cm = F.coalesce("conf_meta", F.lit(0.0))
    conf = F.when(cm != 0.0, cm).otherwise(
        F.coalesce("conf_props", F.lit(0.0)))
    ws = PRODUCT_WEIGHTS
    quality = (meta_score * ws[0] + pscore * ws[1] + emb * ws[2]
               + iscore * ws[3] + rscore * ws[4] + conf * ws[5])
    return products.select(
        "product_id", meta_score.alias("metadata_completeness"),
        pscore.alias("material_properties"),
        emb.alias("embedding_coverage"),
        iscore.alias("related_images"),
        rscore.alias("related_products"), conf.alias("confidence_score"),
        _round3(quality).alias("quality_score"))


def _d(x: float) -> str:
    return f"CAST({x} AS DOUBLE)"


def score_images_sql() -> str:
    ws = IMAGE_WEIGHTS
    return f"""
    m AS (SELECT image_id,
        CASE WHEN has_vision THEN {_d(0.33)} ELSE {_d(0.0)} END
        + CASE WHEN has_claude THEN {_d(0.33)} ELSE {_d(0.0)} END
        + CASE WHEN has_clip THEN {_d(0.34)} ELSE {_d(0.0)} END
            AS comp,
        CASE WHEN coalesce(width, 0) >= 800
                  AND coalesce(height, 0) >= 600 THEN {_d(1.0)}
             WHEN coalesce(width, 0) >= 600
                  AND coalesce(height, 0) >= 400 THEN {_d(0.8)}
             WHEN coalesce(width, 0) >= 400
                  AND coalesce(height, 0) >= 300 THEN {_d(0.6)}
             ELSE {_d(0.4)} END AS dims,
        least({_d(1.0)}, coalesce(n_props, 0) / {_d(5)}) AS props,
        least({_d(1.0)},
              CASE WHEN has_slig THEN {_d(0.6)} ELSE {_d(0.0)} END
              + CASE WHEN has_understanding THEN {_d(0.4)}
                     ELSE {_d(0.0)} END) AS emb,
        coalesce(confidence, {_d(0.0)}) AS conf
        FROM images_in)
    SELECT image_id, comp AS analysis_completeness,
           dims AS dimensions_quality, props AS material_properties,
           emb AS embedding_coverage, conf AS confidence_score,
           floor((comp * {_d(ws[0])} + dims * {_d(ws[1])}
                 + props * {_d(ws[2])} + emb * {_d(ws[3])}
                 + conf * {_d(ws[4])}) * 1000 + 0.5e0) / 1000
               AS quality_score
    FROM m"""


def score_chunks_sql() -> str:
    ws = CHUNK_WEIGHTS
    kw = " + ".join(
        f"CASE WHEN contains(low, '{k}') THEN 1 ELSE 0 END"
        for k in COHERENCE_KEYWORDS)
    return f"""
    c0 AS (SELECT chunk_id, coalesce(content, '') AS content,
                  lower(coalesce(content, '')) AS low,
                  coherence_score, metadata_n, has_embedding
           FROM chunks_in),
    c1 AS (SELECT *, length(content) AS n,
                  ({kw}) AS kw,
                  len(string_split(content, '.')) AS sentences,
                  trim(content) AS st
           FROM c0),
    c2 AS (SELECT *,
        CASE WHEN n >= 500 AND n <= 1500 THEN {_d(1.0)}
             WHEN (n >= 300 AND n < 500) OR (n > 1500 AND n <= 2000)
                 THEN {_d(0.8)}
             WHEN (n >= 200 AND n < 300) OR (n > 2000 AND n <= 2500)
                 THEN {_d(0.6)}
             ELSE {_d(0.4)} END AS clen,
        CASE WHEN coalesce(coherence_score, {_d(0.0)}) <> 0.0
             THEN coherence_score
             ELSE least({_d(1.0)}, kw / {_d(3)}) * {_d(0.6)}
                  + CASE WHEN n / greatest(sentences, 1) >= 50
                              AND n / greatest(sentences, 1) <= 150
                         THEN {_d(1.0)} ELSE {_d(0.7)} END
                    * {_d(0.4)} END AS coh,
        CASE WHEN regexp_matches(st, '[.!?:;]$') THEN {_d(1.0)}
             ELSE {_d(0.6)} END * {_d(0.6)}
        + CASE WHEN regexp_matches(st, '^[A-Z]') THEN {_d(1.0)}
               ELSE {_d(0.7)} END * {_d(0.4)} AS boundary,
        least({_d(1.0)}, coalesce(metadata_n, 0) / {_d(5)}) AS meta,
        CASE WHEN has_embedding THEN {_d(1.0)} ELSE {_d(0.0)} END
            AS emb
        FROM c1)
    SELECT chunk_id, clen AS content_length_score, coh AS coherence,
           boundary AS boundary_quality, meta AS metadata_richness,
           emb AS embedding_coverage,
           floor((clen * {_d(ws[0])} + coh * {_d(ws[1])}
                 + boundary * {_d(ws[2])} + meta * {_d(ws[3])}
                 + emb * {_d(ws[4])}) * 1000 + 0.5e0) / 1000
               AS quality_score
    FROM c2"""


def score_products_sql() -> str:
    ws = PRODUCT_WEIGHTS
    inval = ", ".join(f"'{v}'" for v in INVALID_PROPS)
    return f"""
    p0 AS (SELECT product_id,
        length(coalesce(name, '')) AS name_n,
        length(coalesce(description, '')) AS desc_n,
        length(coalesce(long_description, '')) AS ld_n,
        coalesce(cardinality(properties), 0) AS nprops,
        CASE WHEN properties IS NULL THEN 0
             ELSE len(list_filter(map_values(properties),
                 v -> v IS NOT NULL AND v <> ''
                      AND lower(v) NOT IN ({inval}))) END AS valid,
        has_text_embedding,
        coalesce(n_related_images, 0) AS ni,
        coalesce(n_related_products, 0) AS np,
        coalesce(conf_meta, {_d(0.0)}) AS cm,
        coalesce(conf_props, {_d(0.0)}) AS cp
        FROM products_in),
    p1 AS (SELECT *,
        least({_d(1.0)},
          CASE WHEN name_n = 0 THEN {_d(0.0)}
               WHEN name_n >= 10 THEN {_d(0.25)}
               WHEN name_n >= 5 THEN {_d(0.15)}
               ELSE {_d(0.10)} END
          + CASE WHEN desc_n = 0 THEN {_d(0.0)}
                 WHEN desc_n >= 200 THEN {_d(0.25)}
                 WHEN desc_n >= 100 THEN {_d(0.20)}
                 WHEN desc_n >= 50 THEN {_d(0.15)}
                 ELSE {_d(0.10)} END
          + CASE WHEN ld_n = 0 THEN {_d(0.0)}
                 WHEN ld_n >= 500 THEN {_d(0.25)}
                 WHEN ld_n >= 300 THEN {_d(0.20)}
                 WHEN ld_n >= 150 THEN {_d(0.15)}
                 ELSE {_d(0.10)} END
          + CASE WHEN nprops > 0 THEN {_d(0.25)}
                 ELSE {_d(0.0)} END) AS meta_score,
        CASE WHEN valid >= 8 THEN {_d(1.0)}
             WHEN valid >= 6 THEN {_d(0.85)}
             WHEN valid >= 4 THEN {_d(0.70)}
             WHEN valid >= 2 THEN {_d(0.50)}
             WHEN valid >= 1 THEN {_d(0.30)}
             ELSE {_d(0.0)} END AS pscore,
        CASE WHEN has_text_embedding THEN {_d(1.0)}
             ELSE {_d(0.0)} END AS emb,
        CASE WHEN ni >= 5 THEN {_d(1.0)} WHEN ni >= 3 THEN {_d(0.80)}
             WHEN ni >= 2 THEN {_d(0.60)} WHEN ni >= 1 THEN {_d(0.40)}
             ELSE {_d(0.0)} END AS iscore,
        CASE WHEN np >= 5 THEN {_d(1.0)} WHEN np >= 3 THEN {_d(0.75)}
             WHEN np >= 2 THEN {_d(0.50)} WHEN np >= 1 THEN {_d(0.30)}
             ELSE {_d(0.0)} END AS rscore,
        CASE WHEN cm <> 0.0 THEN cm ELSE cp END AS conf
        FROM p0)
    SELECT product_id, meta_score AS metadata_completeness,
           pscore AS material_properties, emb AS embedding_coverage,
           iscore AS related_images, rscore AS related_products,
           conf AS confidence_score,
           floor((meta_score * {_d(ws[0])} + pscore * {_d(ws[1])}
                 + emb * {_d(ws[2])} + iscore * {_d(ws[3])}
                 + rscore * {_d(ws[4])} + conf * {_d(ws[5])}) * 1000
                 + 0.5e0) / 1000 AS quality_score
    FROM p1"""


# ---------------------------------------------------------------------------
# synthesized inputs


def synth_q_images(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    return events.select(
        e.alias("image_id"), (e % 2 == 0).alias("has_vision"),
        (e % 3 == 0).alias("has_claude"), (e % 5 != 0).alias("has_clip"),
        ((e % 9) * 120).cast("int").alias("width"),
        ((e % 7) * 110).cast("int").alias("height"),
        (e % 8).cast("int").alias("n_props"),
        (e % 4 != 0).alias("has_slig"),
        (e % 6 == 0).alias("has_understanding"),
        F.when(e % 11 == 0, F.lit(None).cast("double"))
        .otherwise((e % 5) * F.lit(0.1875)).alias("confidence"))


SYNTH_Q_IMAGES_SQL = """
SELECT event_id AS image_id, event_id % 2 = 0 AS has_vision,
       event_id % 3 = 0 AS has_claude, event_id % 5 <> 0 AS has_clip,
       CAST(event_id % 9 * 120 AS INT) AS width,
       CAST(event_id % 7 * 110 AS INT) AS height,
       CAST(event_id % 8 AS INT) AS n_props,
       event_id % 4 <> 0 AS has_slig,
       event_id % 6 = 0 AS has_understanding,
       CASE WHEN event_id % 11 = 0 THEN NULL
            ELSE (event_id % 5) * CAST(0.1875 AS DOUBLE) END
           AS confidence
FROM events"""


def synth_q_chunks(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    body = F.array_join(F.array_repeat(
        F.lit(" the material surface has a fine texture."),
        ((e % 8) * 9).cast("int")), "")
    content = (F.when(e % 6 == 0, F.concat(F.lit("short bit "),
                                           (e % 10).cast("string")))
               .when(e % 6 == 1,
                     F.concat(F.lit("lower case start, design and "
                                    "color notes no ending"), body))
               .otherwise(F.concat(F.lit("Solid intro."), body)))
    return events.select(
        e.alias("chunk_id"), content.alias("content"),
        F.when(e % 7 == 0, (e % 4) * F.lit(0.25))
        .otherwise(F.lit(0.0)).alias("coherence_score"),
        (e % 9).cast("int").alias("metadata_n"),
        (e % 3 != 0).alias("has_embedding"))


SYNTH_Q_CHUNKS_SQL = """
SELECT event_id AS chunk_id,
       CASE WHEN event_id % 6 = 0
                THEN 'short bit ' || (event_id % 10)
            WHEN event_id % 6 = 1
                THEN 'lower case start, design and color notes no ending'
                     || repeat(' the material surface has a fine texture.',
                               CAST(event_id % 8 * 9 AS INT))
            ELSE 'Solid intro.'
                 || repeat(' the material surface has a fine texture.',
                           CAST(event_id % 8 * 9 AS INT))
       END AS content,
       CASE WHEN event_id % 7 = 0
            THEN (event_id % 4) * CAST(0.25 AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END AS coherence_score,
       CAST(event_id % 9 AS INT) AS metadata_n,
       event_id % 3 <> 0 AS has_embedding
FROM events"""


def synth_q_products(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    name = (F.when(e % 5 == 0, F.lit(""))
            .when(e % 5 == 1, F.lit("Tile"))
            .when(e % 5 == 2, F.lit("Valen"))
            .otherwise(F.lit("Valencia Grande")))
    desc = F.when(e % 4 != 0, F.rpad(F.lit("d"), ((e % 4) * 70)
                                     .cast("int"), "x"))
    ld = F.when(e % 3 != 0, F.rpad(F.lit("l"), ((e % 4) * 170)
                                   .cast("int"), "y"))
    props = (F.when(e % 6 == 0, F.lit(None)
                    .cast("map<string,string>"))
             .otherwise(F.map_from_arrays(
                 F.transform(F.sequence(F.lit(1), (e % 9 + 1)
                                        .cast("int")),
                             lambda i: F.concat(F.lit("k"),
                                                i.cast("string"))),
                 F.transform(F.sequence(F.lit(1), (e % 9 + 1)
                                        .cast("int")),
                             lambda i: F.when(i % 4 == 0, "unknown")
                             .when(i % 5 == 0, "")
                             .otherwise(F.concat(F.lit("v"),
                                                 i.cast("string")))))))
    return events.select(
        e.alias("product_id"), name.alias("name"),
        desc.alias("description"), ld.alias("long_description"),
        props.alias("properties"),
        (e % 2 == 0).alias("has_text_embedding"),
        (e % 7).cast("int").alias("n_related_images"),
        (e % 6).cast("int").alias("n_related_products"),
        F.when(e % 3 == 0, F.lit(0.0)).otherwise((e % 4) * F.lit(0.25))
        .alias("conf_meta"),
        ((e % 5) * F.lit(0.1875)).alias("conf_props"))


SYNTH_Q_PRODUCTS_SQL = """
SELECT event_id AS product_id,
       CASE WHEN event_id % 5 = 0 THEN ''
            WHEN event_id % 5 = 1 THEN 'Tile'
            WHEN event_id % 5 = 2 THEN 'Valen'
            ELSE 'Valencia Grande' END AS name,
       CASE WHEN event_id % 4 <> 0
            THEN rpad('d', CAST(event_id % 4 * 70 AS INT), 'x') END
           AS description,
       CASE WHEN event_id % 3 <> 0
            THEN rpad('l', CAST(event_id % 4 * 170 AS INT), 'y') END
           AS long_description,
       CASE WHEN event_id % 6 = 0 THEN NULL
            ELSE map_from_entries(list_transform(
                generate_series(1, CAST(event_id % 9 + 1 AS INT)),
                i -> struct_pack(k := 'k' || i,
                    v := CASE WHEN i % 4 = 0 THEN 'unknown'
                              WHEN i % 5 = 0 THEN ''
                              ELSE 'v' || i END)))
       END AS properties,
       event_id % 2 = 0 AS has_text_embedding,
       CAST(event_id % 7 AS INT) AS n_related_images,
       CAST(event_id % 6 AS INT) AS n_related_products,
       CASE WHEN event_id % 3 = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE (event_id % 4) * CAST(0.25 AS DOUBLE) END
           AS conf_meta,
       (event_id % 5) * CAST(0.1875 AS DOUBLE) AS conf_props
FROM events"""
