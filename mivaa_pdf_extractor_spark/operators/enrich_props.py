"""Product-enrichment material-property combiner.

Reference: ``app/services/products/product_enrichment_service.py`` —

- ``_find_related_images`` (:144-172): document images with ANY of
  vision_analysis / claude_validation, first 5 in query order.
- ``_extract_material_properties_from_images`` (:175-224): per
  selected image, a truthy material_properties dict contributes its
  color/finish/pattern/texture/composition values (composition lands
  in ``materials``) and its confidence (0.0 default — but ONLY
  images with a truthy props dict contribute a confidence at all,
  pinned); each list is deduped via ``list(set(...))`` — Python set
  order is hash-randomized across processes, so the fold
  CANONICALIZES to sorted order (documented divergence: the
  reference's array order is nondeterministic, the VALUES are not);
  confidence = mean over contributing images.
- ``_create_product_embedding`` (:277-303) embedding text:
  ``"{name}. {description}. Materials: {join}. Colors: {join}"``
  with the same canonicalized joins.

Scale: one groupBy(product) over <= 5 rows per product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

RELATED_IMAGE_CAP = 5  # :169


def select_related_images(images: DataFrame) -> DataFrame:
    """``images``: (product_id long, img_ord int, has_vision boolean,
    has_validation boolean, ...props columns). First 5 analyzed
    images per product in query order."""
    w = Window.partitionBy("product_id").orderBy("img_ord")
    return (images
            .where(F.coalesce(F.col("has_vision"), F.lit(False))
                   | F.coalesce(F.col("has_validation"), F.lit(False)))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= RELATED_IMAGE_CAP)
            .drop("_rn"))


def combine_material_properties(images: DataFrame) -> DataFrame:
    """Fold over :func:`select_related_images` output; props columns:
    (has_props boolean, color, finish, pattern, texture, composition
    — nullable strings; confidence double?)."""
    sel = select_related_images(images)
    p = F.col("has_props")

    def vals(col):
        return F.sort_array(F.array_distinct(F.collect_list(
            F.when(p & (F.coalesce(F.col(col), F.lit("")) != ""),
                   F.col(col)))))

    agg = sel.groupBy("product_id").agg(
        vals("color").alias("colors"),
        vals("finish").alias("finishes"),
        vals("pattern").alias("patterns"),
        vals("texture").alias("textures"),
        vals("composition").alias("materials"),
        F.sum(F.when(p, F.coalesce(F.col("confidence"), F.lit(0.0))))
        .alias("_csum"),
        F.count(F.when(p, F.lit(1))).alias("_cn"))
    conf = F.when(F.col("_cn") > 0, F.col("_csum") / F.col("_cn")) \
        .otherwise(F.lit(0.0))
    return agg.select("product_id", "colors", "finishes", "patterns",
                      "textures", "materials",
                      conf.alias("confidence"))


def embedding_text(props: DataFrame, products: DataFrame) -> DataFrame:
    """``products``: (product_id, name, description)."""
    j = products.join(props, "product_id", "left")
    empty = F.array().cast("array<string>")
    text = F.concat(
        F.coalesce(F.col("name"), F.lit("Unknown")), F.lit(". "),
        F.coalesce(F.col("description"), F.lit("")),
        F.lit(". Materials: "),
        F.array_join(F.coalesce(F.col("materials"), empty), ", "),
        F.lit(". Colors: "),
        F.array_join(F.coalesce(F.col("colors"), empty), ", "))
    return j.select("product_id", text.alias("embedding_text"))


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

COLORS = ("beige", "grey", "white", "terracotta", None, "")
FINISHES = ("matte", "glossy", None)
PATTERNS = ("veined", "plain", None, "speckled")
TEXTURES = ("smooth", None, "rough")
COMPS = ("porcelain", "ceramic", None, "stone", "porcelain")


def synth_enrich_images(docs) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = d.select(
        (F.col("doc") % 80).alias("product_id"),
        F.col("doc").alias("g"))
    h = F.col("g") * 17
    pick = lambda t, k: F.element_at(  # noqa: E731
        F.array(*[F.lit(x) if x is not None
                  else F.lit(None).cast("string") for x in t]),
        ((h % k) + 1).cast("int"))
    return rows.select(
        "product_id",
        (F.col("g") % 97).cast("int").alias("img_ord"),
        (F.col("g") % 3 != 0).alias("has_vision"),
        (F.col("g") % 4 == 0).alias("has_validation"),
        (F.col("g") % 5 != 1).alias("has_props"),
        pick(COLORS, 6).alias("color"),
        pick(FINISHES, 3).alias("finish"),
        pick(PATTERNS, 4).alias("pattern"),
        pick(TEXTURES, 3).alias("texture"),
        pick(COMPS, 5).alias("composition"),
        F.when(F.col("g") % 7 == 0, F.lit(None).cast("double"))
        .otherwise((F.col("g") % 21) * 0.05).alias("confidence"))


DUCK_ENRICH_SQL = """
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
eimg AS (
  SELECT doc % 80 AS product_id,
         CAST(doc % 97 AS INT) AS img_ord,
         doc % 3 != 0 AS has_vision,
         doc % 4 = 0 AS has_validation,
         doc % 5 != 1 AS has_props,
         (['beige','grey','white','terracotta',NULL,''])
           [CAST((doc*17) % 6 AS INT) + 1] AS color,
         (['matte','glossy',NULL])[CAST((doc*17) % 3 AS INT) + 1]
           AS finish,
         (['veined','plain',NULL,'speckled'])
           [CAST((doc*17) % 4 AS INT) + 1] AS pattern,
         (['smooth',NULL,'rough'])[CAST((doc*17) % 3 AS INT) + 1]
           AS texture,
         (['porcelain','ceramic',NULL,'stone','porcelain'])
           [CAST((doc*17) % 5 AS INT) + 1] AS composition,
         CASE WHEN doc % 7 = 0 THEN NULL
              ELSE (doc % 21) * 0.05 END AS confidence
  FROM docs),
esel AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY product_id
                                 ORDER BY img_ord) AS rn
    FROM eimg
    WHERE coalesce(has_vision, false) OR coalesce(has_validation,
                                                  false))
  WHERE rn <= 5),
eprops AS (
  SELECT product_id,
         list_sort(list_distinct(list_filter(
           array_agg(CASE WHEN has_props
                          AND coalesce(color, '') != ''
                     THEN color END),
           x -> x IS NOT NULL))) AS colors,
         list_sort(list_distinct(list_filter(
           array_agg(CASE WHEN has_props
                          AND coalesce(finish, '') != ''
                     THEN finish END),
           x -> x IS NOT NULL))) AS finishes,
         list_sort(list_distinct(list_filter(
           array_agg(CASE WHEN has_props
                          AND coalesce(pattern, '') != ''
                     THEN pattern END),
           x -> x IS NOT NULL))) AS patterns,
         list_sort(list_distinct(list_filter(
           array_agg(CASE WHEN has_props
                          AND coalesce(texture, '') != ''
                     THEN texture END),
           x -> x IS NOT NULL))) AS textures,
         list_sort(list_distinct(list_filter(
           array_agg(CASE WHEN has_props
                          AND coalesce(composition, '') != ''
                     THEN composition END),
           x -> x IS NOT NULL))) AS materials,
         CASE WHEN count(CASE WHEN has_props THEN 1 END) > 0
              THEN sum(CASE WHEN has_props
                            THEN coalesce(confidence, 0.0) END)
                   / count(CASE WHEN has_props THEN 1 END)
              ELSE 0.0 END AS confidence
  FROM esel GROUP BY product_id)"""
