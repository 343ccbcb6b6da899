"""Vision-analysis serialization + embedding-slot folds.

Reference: ``app/models/vision_analysis.py`` and
``app/services/embeddings/real_embeddings_service.py`` —

- ``vision_analysis_from_legacy_dict`` (vision_analysis.py:299-346):
  best-effort coercion of legacy free-form dicts. Error-envelope
  rejection (``"error" in d and "material_type" not in d``) runs
  BEFORE the material fallback, so an error row whose material could
  have come from the legacy ``type`` key is still rejected (pinned).
  ``material_type = d.get("material_type") or d.get("type")`` — the
  falsy ``or`` means an EMPTY material_type falls through to ``type``.
  Every multi-key field uses the same falsy ``or`` chain on the RAW
  value (an empty list/dict/string falls to the next key), then
  ``_as_list``: list → ``[str(x) for x in v if x]`` (drops '' and
  None ELEMENTS), dict → ``["k: v" for truthy v]`` in insertion
  order, scalar → ``[str(v)]`` WITHOUT a truthy gate — so a chain
  whose last key holds ``''`` coerces to ``['']``, a single empty
  string element (pinned: the serializer then emits ``"Textures: ."``
  because ``['']`` is truthy but joins to '').  confidence defaults
  0.85 when the key is absent (modeled: NULL → 0.85).
- ``serialize_vision_analysis_to_text`` (:162-208): fixed part order
  Material / Category(+", "+sub) / Colors / Textures / Finish /
  Pattern / Style / Applications / Description / "Text detected:"
  — list fields join ", " EXCEPT detected_text which joins " ";
  parts join " "; every part ends "."; category part is emitted only
  when category itself is truthy (a subcategory without a category is
  silently dropped, pinned).
- understanding text (real_embeddings_service.py:550-560): appends
  ``" Material properties: " + ", ".join(sorted("k: v"))`` for truthy
  values whose key is not in (id, created_at, updated_at,
  document_id, image_id) — sorted on the FORMATTED string.
- aspect serializers (vision_analysis.py:228-296): color = strip-
  filtered colors join ", " else NULL; texture = textures + finish
  appended; style = style + surface_pattern + applications;
  material = material_type + category + subcategory (never NULL for
  a valid VisionAnalysis).
- ``generate_all_embeddings`` slot fold (real_embeddings_service.py:
  192-375 + 1399-1551): input_type = 'query' only for entity_type
  'query'; text_1024 iff the text embed returned; visual_768 iff
  (image present AND SLIG returned); the 4 aspect keys land ALL
  TOGETHER whenever >=1 aspect vector was produced — missing aspects
  are assigned ``aspect_embeddings.get(a)`` = None, and
  ``_produced = len(embeddings)`` COUNTS those None-valued keys
  (pinned quirk); understanding_1024 iff vision analysis is valid and
  Voyage returned; success = produced > 0 else
  error='no_vectors_generated'.

Scale: every fold here is a map-only projection over one row per
entity — no shuffle anywhere; at 100 TB these run inside the scan
stage's whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MP_EXCLUDED_KEYS = ("id", "created_at", "updated_at",
                    "document_id", "image_id")


# ──────────────────────────────────────────────────────────────────
# Legacy coercion
# ──────────────────────────────────────────────────────────────────

def _truthy_list(c):
    return c.isNotNull() & (F.size(c) > 0)


def _truthy_str(c):
    return c.isNotNull() & (c != "")


def _clean_list(c):
    # _as_list over a list value: [str(x) for x in v if x]
    return F.filter(c, lambda x: x.isNotNull() & (x != ""))


def _map_pairs(m):
    # _as_list over a dict value: ["k: v" for truthy v], insertion order
    return F.transform(
        F.filter(F.map_entries(m),
                 lambda e: e["value"].isNotNull() & (e["value"] != "")),
        lambda e: F.concat(e["key"], F.lit(": "), e["value"]))


def coerce_legacy_vision(df: DataFrame) -> DataFrame:
    """Columns in: doc (long), has_error, material_type, mtype_alias,
    category, subcategory, colors_list, palette_map, dominant_list,
    textures_list, texture_scalar, surface_texture, finish,
    surface_finish, pattern, pattern_type, surface_pattern,
    description, visual_description, applications_list,
    suitable_for_list, usage_scalar, style, aesthetic, confidence,
    ocr_list, det_list, text_scalar.

    NULL models an absent key; '' / [] model present-but-falsy values
    (they fall through ``or`` chains exactly like the reference).
    """
    mat = F.when(_truthy_str(F.col("material_type")),
                 F.col("material_type")).otherwise(F.col("mtype_alias"))
    rejected = (
        (F.col("has_error") & F.col("material_type").isNull())
        | ~F.coalesce(_truthy_str(mat), F.lit(False)))

    colors = (F.when(_truthy_list(F.col("colors_list")),
                     _clean_list(F.col("colors_list")))
              .when(F.col("palette_map").isNotNull()
                    & (F.size(F.col("palette_map")) > 0),
                    _map_pairs(F.col("palette_map")))
              .when(_truthy_list(F.col("dominant_list")),
                    _clean_list(F.col("dominant_list")))
              .otherwise(F.array().cast("array<string>")))

    # textures chain ends on scalars: _as_list('') == [''] (pinned)
    textures = (F.when(_truthy_list(F.col("textures_list")),
                       _clean_list(F.col("textures_list")))
                .when(_truthy_str(F.col("texture_scalar")),
                      F.array(F.col("texture_scalar")))
                .when(F.col("surface_texture").isNotNull(),
                      F.array(F.col("surface_texture")))
                .otherwise(F.array().cast("array<string>")))

    apps = (F.when(_truthy_list(F.col("applications_list")),
                   _clean_list(F.col("applications_list")))
            .when(_truthy_list(F.col("suitable_for_list")),
                  _clean_list(F.col("suitable_for_list")))
            .when(_truthy_str(F.col("usage_scalar")),
                  F.array(F.col("usage_scalar")))
            .otherwise(F.array().cast("array<string>")))

    detected = (F.when(_truthy_list(F.col("ocr_list")),
                       _clean_list(F.col("ocr_list")))
                .when(_truthy_list(F.col("det_list")),
                      _clean_list(F.col("det_list")))
                .when(_truthy_str(F.col("text_scalar")),
                      F.array(F.col("text_scalar")))
                .otherwise(F.array().cast("array<string>")))

    def _str_chain(*cols):
        out = None
        for c in cols:
            w = F.when(_truthy_str(F.col(c)), F.col(c))
            out = w if out is None else out.when(
                _truthy_str(F.col(c)), F.col(c))
        return out

    fin = _str_chain("finish", "surface_finish")
    pat = _str_chain("pattern", "pattern_type", "surface_pattern")
    desc = _str_chain("description", "visual_description")
    sty = _str_chain("style", "aesthetic")

    nul_s = F.lit(None).cast("string")
    nul_a = F.lit(None).cast("array<string>")

    def gate(c, typ="s"):
        return F.when(~rejected, c).otherwise(
            nul_s if typ == "s" else nul_a)

    return df.select(
        "doc",
        rejected.alias("rejected"),
        gate(mat).alias("material_type"),
        gate(F.col("category")).alias("category"),
        gate(F.col("subcategory")).alias("subcategory"),
        gate(colors, "a").alias("colors"),
        gate(textures, "a").alias("textures"),
        gate(fin).alias("finish"),
        gate(pat).alias("surface_pattern"),
        gate(desc).alias("description"),
        gate(apps, "a").alias("applications"),
        gate(sty).alias("style"),
        F.when(~rejected,
               F.coalesce(F.col("confidence"), F.lit(0.85)))
        .alias("confidence"),
        gate(detected, "a").alias("detected_text"),
    )


# ──────────────────────────────────────────────────────────────────
# Serializers
# ──────────────────────────────────────────────────────────────────

def _part(cond, expr):
    return F.when(cond, expr).otherwise(F.lit(None).cast("string"))


def serialized_text_col() -> F.Column:
    """serialize_vision_analysis_to_text over coerced columns."""
    cat = F.concat(
        F.lit("Category: "), F.col("category"),
        F.when(_truthy_str(F.col("subcategory")),
               F.concat(F.lit(", "), F.col("subcategory")))
        .otherwise(F.lit("")), F.lit("."))
    parts = F.array(
        F.concat(F.lit("Material: "), F.col("material_type"),
                 F.lit(".")),
        _part(_truthy_str(F.col("category")), cat),
        _part(_truthy_list(F.col("colors")),
              F.concat(F.lit("Colors: "),
                       F.array_join(F.col("colors"), ", "),
                       F.lit("."))),
        _part(_truthy_list(F.col("textures")),
              F.concat(F.lit("Textures: "),
                       F.array_join(F.col("textures"), ", "),
                       F.lit("."))),
        _part(_truthy_str(F.col("finish")),
              F.concat(F.lit("Finish: "), F.col("finish"),
                       F.lit("."))),
        _part(_truthy_str(F.col("surface_pattern")),
              F.concat(F.lit("Pattern: "), F.col("surface_pattern"),
                       F.lit("."))),
        _part(_truthy_str(F.col("style")),
              F.concat(F.lit("Style: "), F.col("style"), F.lit("."))),
        _part(_truthy_list(F.col("applications")),
              F.concat(F.lit("Applications: "),
                       F.array_join(F.col("applications"), ", "),
                       F.lit("."))),
        _part(_truthy_str(F.col("description")),
              F.concat(F.lit("Description: "), F.col("description"),
                       F.lit("."))),
        _part(_truthy_list(F.col("detected_text")),
              F.concat(F.lit("Text detected: "),
                       F.array_join(F.col("detected_text"), " "),
                       F.lit("."))),
    )
    return F.array_join(F.filter(parts, lambda p: p.isNotNull()), " ")


def understanding_text(coerced: DataFrame,
                       props: DataFrame) -> DataFrame:
    """Serialized text + sorted material-properties suffix.

    ``props``: (doc, material_properties map<string,string>).
    """
    j = coerced.where(~F.col("rejected")).join(props, "doc", "left")
    mp = F.sort_array(F.transform(
        F.filter(F.map_entries(F.col("material_properties")),
                 lambda e: e["value"].isNotNull() & (e["value"] != "")
                 & ~e["key"].isin(*MP_EXCLUDED_KEYS)),
        lambda e: F.concat(e["key"], F.lit(": "), e["value"])))
    base = serialized_text_col()
    text = F.when(
        F.col("material_properties").isNotNull() & (F.size(mp) > 0),
        F.concat(base, F.lit(" Material properties: "),
                 F.array_join(mp, ", "), F.lit("."))).otherwise(base)
    return j.select("doc", text.alias("understanding_text"))


def _strip_filter_join(arr) -> F.Column:
    cleaned = F.transform(
        F.filter(arr, lambda x: x.isNotNull() & (F.trim(x) != "")),
        lambda x: F.trim(x))
    return F.when(F.size(cleaned) > 0,
                  F.array_join(cleaned, ", "))


def aspect_texts(coerced: DataFrame) -> DataFrame:
    """The four aspect serializer strings (NULL = skip that aspect)."""
    c = coerced.where(~F.col("rejected"))
    empty = F.array().cast("array<string>")

    def opt(col):
        return F.when(_truthy_str(F.col(col)), F.array(F.col(col))) \
            .otherwise(empty)

    # texture appends finish AFTER the textures list; style order is
    # style, surface_pattern, then applications (reference order).
    texture_src = F.concat(F.coalesce(F.col("textures"), empty),
                           opt("finish"))
    style_src = F.concat(opt("style"), opt("surface_pattern"),
                         F.coalesce(F.col("applications"), empty))
    material_src = F.concat(F.array(F.col("material_type")),
                            opt("category"), opt("subcategory"))
    return c.select(
        "doc",
        _strip_filter_join(F.coalesce(F.col("colors"), empty))
        .alias("color_text"),
        _strip_filter_join(texture_src).alias("texture_text"),
        _strip_filter_join(style_src).alias("style_text"),
        # material_type is required → never NULL on a valid row, but
        # keep the same when-form so a blank material would surface.
        _strip_filter_join(material_src).alias("material_text"),
    )


# ──────────────────────────────────────────────────────────────────
# generate_all_embeddings slot fold
# ──────────────────────────────────────────────────────────────────

ENTITY_TYPES = ("product", "chunk", "image", "query")


def embed_slot_fold(coerced: DataFrame, aspects: DataFrame) -> DataFrame:
    """Which embedding slots land per entity, given provider-success
    flags synthesized onto the row (text_ok, has_image, visual_ok,
    ok_color/ok_texture/ok_style/ok_material, understanding_ok)."""
    g = F.col("doc")
    base = coerced.join(aspects, "doc", "left").select(
        "doc", "rejected", "color_text", "texture_text",
        "style_text", "material_text",
        F.element_at(F.array(*[F.lit(t) for t in ENTITY_TYPES]),
                     (g % 4 + 1).cast("int")).alias("entity_type"),
        (g % 5 != 0).alias("text_ok"),
        (g % 3 != 1).alias("has_image"),
        (g % 7 != 2).alias("visual_ok"),
        (g % 11 != 3).alias("ok_color"),
        (g % 11 != 4).alias("ok_texture"),
        (g % 13 != 5).alias("ok_style"),
        (g % 17 != 6).alias("ok_material"),
        (g % 19 != 7).alias("understanding_ok"),
    )
    va_ok = ~F.col("rejected")

    def aspect_vec(text_col, ok_col):
        return (va_ok & F.col(text_col).isNotNull()
                & F.col(ok_col)).cast("int")

    n_aspects = (aspect_vec("color_text", "ok_color")
                 + aspect_vec("texture_text", "ok_texture")
                 + aspect_vec("style_text", "ok_style")
                 + aspect_vec("material_text", "ok_material"))
    has_text = F.col("text_ok")
    has_visual = F.col("has_image") & F.col("visual_ok")
    any_aspect = n_aspects > 0
    has_underst = va_ok & F.col("understanding_ok")
    # the 4 aspect keys are assigned together via .get() — None-valued
    # keys still count toward _produced (len of the dict), pinned.
    produced = (has_text.cast("int") + has_visual.cast("int")
                + F.when(any_aspect, F.lit(4)).otherwise(F.lit(0))
                + has_underst.cast("int"))
    return base.select(
        "doc", "entity_type",
        F.when(F.col("entity_type") == "query", F.lit("query"))
        .otherwise(F.lit("document")).alias("input_type"),
        has_text.alias("has_text"),
        has_visual.alias("has_visual"),
        any_aspect.alias("has_aspects"),
        n_aspects.alias("aspect_vec_count"),
        has_underst.alias("has_understanding"),
        produced.alias("slots_produced"),
        (produced > 0).alias("success"),
        F.when(produced == 0, F.lit("no_vectors_generated"))
        .cast("string").alias("error"),
    )


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

def synth_legacy_vision(docs: DataFrame) -> DataFrame:
    g = F.col("doc_id").cast("long")
    nul_s = F.lit(None).cast("string")
    nul_a = F.lit(None).cast("array<string>")
    nul_m = F.lit(None).cast("map<string,string>")
    nul_d = F.lit(None).cast("double")
    return docs.select(
        g.alias("doc"),
        (g % 13 == 0).alias("has_error"),
        F.when(g % 6 == 0, nul_s).when(g % 6 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("material "),
                            (g % 7).cast("string")))
        .alias("material_type"),
        F.when(g % 4 != 0, F.concat(F.lit("stone "),
                                    (g % 3).cast("string")))
        .otherwise(nul_s).alias("mtype_alias"),
        F.when(g % 5 == 0, nul_s)
        .otherwise(F.concat(F.lit("cat"), (g % 4).cast("string")))
        .alias("category"),
        F.when(g % 7 == 0, F.concat(F.lit("sub"),
                                    (g % 3).cast("string")))
        .otherwise(nul_s).alias("subcategory"),
        F.when(g % 5 == 0, nul_a)
        .when(g % 5 == 1, F.array().cast("array<string>"))
        .when(g % 5 == 2, F.array(F.lit("warm white"),
                                  F.lit("grey veining")))
        .when(g % 5 == 3, F.array(F.lit(""), F.lit("matte black")))
        .otherwise(F.array(F.lit("beige"))).alias("colors_list"),
        F.when(g % 3 == 0,
               F.create_map(F.lit("primary"), F.lit("red"),
                            F.lit("accent"),
                            F.when(g % 2 == 0, F.lit(""))
                            .otherwise(F.lit("gold"))))
        .otherwise(nul_m).alias("palette_map"),
        F.when(g % 2 == 0, F.array(F.lit("navy")))
        .otherwise(F.array().cast("array<string>"))
        .alias("dominant_list"),
        F.when(g % 4 == 0, nul_a)
        .when(g % 4 == 1, F.array().cast("array<string>"))
        .when(g % 4 == 2, F.array(F.lit("wood grain")))
        .otherwise(F.array(F.lit("ribbed"), F.lit("fluted")))
        .alias("textures_list"),
        F.when(g % 3 == 1, F.lit("woven"))
        .when(g % 3 == 2, F.lit("")).otherwise(nul_s)
        .alias("texture_scalar"),
        F.when(g % 5 == 2, F.lit(""))
        .when(g % 5 == 3, F.lit("honed")).otherwise(nul_s)
        .alias("surface_texture"),
        F.when(g % 4 == 0, nul_s).when(g % 4 == 1, F.lit(""))
        .when(g % 4 == 2, F.lit("matte"))
        .otherwise(F.lit("polished")).alias("finish"),
        F.when(g % 2 == 0, F.lit("satin")).otherwise(nul_s)
        .alias("surface_finish"),
        F.when(g % 6 == 0, F.lit("herringbone")).otherwise(nul_s)
        .alias("pattern"),
        F.when(g % 5 == 1, F.lit("chevron"))
        .when(g % 5 == 2, F.lit("")).otherwise(nul_s)
        .alias("pattern_type"),
        F.when(g % 3 == 0, F.lit("grid")).otherwise(nul_s)
        .alias("surface_pattern"),
        F.when(g % 4 == 0, F.concat(F.lit("desc "),
                                    (g % 9).cast("string")))
        .otherwise(nul_s).alias("description"),
        F.when(g % 3 == 2, F.lit("a veined slab")).otherwise(nul_s)
        .alias("visual_description"),
        F.when(g % 3 == 0, nul_a)
        .when(g % 3 == 1, F.array(F.lit("kitchen countertop"),
                                  F.lit("")))
        .otherwise(F.array(F.lit("floor"), F.lit("wall")))
        .alias("applications_list"),
        F.when(g % 4 == 2, F.array(F.lit("wet areas")))
        .otherwise(F.array().cast("array<string>"))
        .alias("suitable_for_list"),
        F.when(g % 5 == 4, F.lit("outdoor")).otherwise(nul_s)
        .alias("usage_scalar"),
        F.when(g % 5 == 0, nul_s).when(g % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("style "), (g % 3).cast("string")))
        .alias("style"),
        F.when(g % 2 == 1, F.lit("industrial")).otherwise(nul_s)
        .alias("aesthetic"),
        F.when(g % 9 == 0, nul_d)
        .otherwise((g % 20).cast("double") * 0.05)
        .alias("confidence"),
        F.when(g % 6 == 0, F.array(F.lit("E27"), F.lit("IP44")))
        .when(g % 6 == 1, F.array(F.lit("")))
        .otherwise(nul_a).alias("ocr_list"),
        F.when(g % 4 == 3, F.array(F.lit("60x120")))
        .otherwise(nul_a).alias("det_list"),
        F.when(g % 7 == 3, F.lit("brandx")).otherwise(nul_s)
        .alias("text_scalar"),
    )


def synth_material_props(docs: DataFrame) -> DataFrame:
    g = F.col("doc_id").cast("long")
    return docs.select(
        g.alias("doc"),
        F.when(g % 3 == 0,
               F.create_map(
                   F.lit("thickness"), F.lit("9mm"),
                   F.lit("id"), F.lit("ignored"),
                   F.lit("document_id"), F.lit("d1"),
                   F.lit("slip_rating"),
                   F.when(g % 2 == 0, F.lit(""))
                   .otherwise(F.lit("R10"))))
        .otherwise(F.lit(None).cast("map<string,string>"))
        .alias("material_properties"))


# DuckDB twin for the synthesized legacy rows (CTE `vraw` over `docs`).
DUCK_VRAW_SQL = """
vraw AS (
  SELECT doc,
         doc % 13 = 0 AS has_error,
         CASE WHEN doc % 6 = 0 THEN NULL
              WHEN doc % 6 = 1 THEN ''
              ELSE 'material ' || CAST(doc % 7 AS VARCHAR) END
           AS material_type,
         CASE WHEN doc % 4 != 0
              THEN 'stone ' || CAST(doc % 3 AS VARCHAR) END
           AS mtype_alias,
         CASE WHEN doc % 5 = 0 THEN NULL
              ELSE 'cat' || CAST(doc % 4 AS VARCHAR) END AS category,
         CASE WHEN doc % 7 = 0
              THEN 'sub' || CAST(doc % 3 AS VARCHAR) END
           AS subcategory,
         CASE WHEN doc % 5 = 0 THEN NULL
              WHEN doc % 5 = 1 THEN []::VARCHAR[]
              WHEN doc % 5 = 2 THEN ['warm white', 'grey veining']
              WHEN doc % 5 = 3 THEN ['', 'matte black']
              ELSE ['beige'] END AS colors_list,
         CASE WHEN doc % 3 = 0
              THEN MAP(['primary', 'accent'],
                       ['red', CASE WHEN doc % 2 = 0 THEN ''
                               ELSE 'gold' END]) END AS palette_map,
         CASE WHEN doc % 2 = 0 THEN ['navy']
              ELSE []::VARCHAR[] END AS dominant_list,
         CASE WHEN doc % 4 = 0 THEN NULL
              WHEN doc % 4 = 1 THEN []::VARCHAR[]
              WHEN doc % 4 = 2 THEN ['wood grain']
              ELSE ['ribbed', 'fluted'] END AS textures_list,
         CASE WHEN doc % 3 = 1 THEN 'woven'
              WHEN doc % 3 = 2 THEN '' END AS texture_scalar,
         CASE WHEN doc % 5 = 2 THEN ''
              WHEN doc % 5 = 3 THEN 'honed' END AS surface_texture,
         CASE WHEN doc % 4 = 0 THEN NULL
              WHEN doc % 4 = 1 THEN ''
              WHEN doc % 4 = 2 THEN 'matte'
              ELSE 'polished' END AS finish,
         CASE WHEN doc % 2 = 0 THEN 'satin' END AS surface_finish,
         CASE WHEN doc % 6 = 0 THEN 'herringbone' END AS pattern,
         CASE WHEN doc % 5 = 1 THEN 'chevron'
              WHEN doc % 5 = 2 THEN '' END AS pattern_type,
         CASE WHEN doc % 3 = 0 THEN 'grid' END AS surface_pattern,
         CASE WHEN doc % 4 = 0
              THEN 'desc ' || CAST(doc % 9 AS VARCHAR) END
           AS description,
         CASE WHEN doc % 3 = 2 THEN 'a veined slab' END
           AS visual_description,
         CASE WHEN doc % 3 = 0 THEN NULL
              WHEN doc % 3 = 1 THEN ['kitchen countertop', '']
              ELSE ['floor', 'wall'] END AS applications_list,
         CASE WHEN doc % 4 = 2 THEN ['wet areas']
              ELSE []::VARCHAR[] END AS suitable_for_list,
         CASE WHEN doc % 5 = 4 THEN 'outdoor' END AS usage_scalar,
         CASE WHEN doc % 5 = 0 THEN NULL
              WHEN doc % 5 = 1 THEN ''
              ELSE 'style ' || CAST(doc % 3 AS VARCHAR) END AS style,
         CASE WHEN doc % 2 = 1 THEN 'industrial' END AS aesthetic,
         CASE WHEN doc % 9 = 0 THEN NULL
              ELSE CAST((doc % 20) * 0.05 AS DOUBLE) END
           AS confidence,
         CASE WHEN doc % 6 = 0 THEN ['E27', 'IP44']
              WHEN doc % 6 = 1 THEN [''] END AS ocr_list,
         CASE WHEN doc % 4 = 3 THEN ['60x120'] END AS det_list,
         CASE WHEN doc % 7 = 3 THEN 'brandx' END AS text_scalar
  FROM docs)"""

# Coercion twin (CTE `vcoerced` over `vraw`).
DUCK_VCOERCE_SQL = """
vsel AS (
  SELECT *,
         CASE WHEN material_type IS NOT NULL AND material_type != ''
              THEN material_type ELSE mtype_alias END AS mat_sel,
         (has_error AND material_type IS NULL)
         OR coalesce(
              CASE WHEN material_type IS NOT NULL
                        AND material_type != ''
                   THEN material_type ELSE mtype_alias END, '') = ''
           AS rejected,
         CASE
           WHEN colors_list IS NOT NULL AND len(colors_list) > 0
           THEN list_filter(colors_list,
                            x -> x IS NOT NULL AND x != '')
           WHEN palette_map IS NOT NULL
                AND cardinality(palette_map) > 0
           THEN list_transform(
                  list_filter(map_entries(palette_map),
                              e -> e.value IS NOT NULL
                                   AND e.value != ''),
                  e -> e.key || ': ' || e.value)
           WHEN dominant_list IS NOT NULL AND len(dominant_list) > 0
           THEN list_filter(dominant_list,
                            x -> x IS NOT NULL AND x != '')
           ELSE []::VARCHAR[] END AS colors_c,
         CASE
           WHEN textures_list IS NOT NULL AND len(textures_list) > 0
           THEN list_filter(textures_list,
                            x -> x IS NOT NULL AND x != '')
           WHEN texture_scalar IS NOT NULL AND texture_scalar != ''
           THEN [texture_scalar]
           WHEN surface_texture IS NOT NULL
           THEN [surface_texture]
           ELSE []::VARCHAR[] END AS textures_c,
         CASE
           WHEN applications_list IS NOT NULL
                AND len(applications_list) > 0
           THEN list_filter(applications_list,
                            x -> x IS NOT NULL AND x != '')
           WHEN suitable_for_list IS NOT NULL
                AND len(suitable_for_list) > 0
           THEN list_filter(suitable_for_list,
                            x -> x IS NOT NULL AND x != '')
           WHEN usage_scalar IS NOT NULL AND usage_scalar != ''
           THEN [usage_scalar]
           ELSE []::VARCHAR[] END AS apps_c,
         CASE
           WHEN ocr_list IS NOT NULL AND len(ocr_list) > 0
           THEN list_filter(ocr_list,
                            x -> x IS NOT NULL AND x != '')
           WHEN det_list IS NOT NULL AND len(det_list) > 0
           THEN list_filter(det_list,
                            x -> x IS NOT NULL AND x != '')
           WHEN text_scalar IS NOT NULL AND text_scalar != ''
           THEN [text_scalar]
           ELSE []::VARCHAR[] END AS detected_c,
         CASE WHEN finish IS NOT NULL AND finish != '' THEN finish
              WHEN surface_finish IS NOT NULL
                   AND surface_finish != '' THEN surface_finish END
           AS finish_c,
         CASE WHEN pattern IS NOT NULL AND pattern != ''
              THEN pattern
              WHEN pattern_type IS NOT NULL AND pattern_type != ''
              THEN pattern_type
              WHEN surface_pattern IS NOT NULL
                   AND surface_pattern != '' THEN surface_pattern END
           AS pattern_c,
         CASE WHEN description IS NOT NULL AND description != ''
              THEN description
              WHEN visual_description IS NOT NULL
                   AND visual_description != ''
              THEN visual_description END AS desc_c,
         CASE WHEN style IS NOT NULL AND style != '' THEN style
              WHEN aesthetic IS NOT NULL AND aesthetic != ''
              THEN aesthetic END AS style_c
  FROM vraw),
vcoerced AS (
  SELECT doc, rejected,
         CASE WHEN NOT rejected THEN mat_sel END AS material_type,
         CASE WHEN NOT rejected THEN category END AS category,
         CASE WHEN NOT rejected THEN subcategory END AS subcategory,
         CASE WHEN NOT rejected THEN colors_c END AS colors,
         CASE WHEN NOT rejected THEN textures_c END AS textures,
         CASE WHEN NOT rejected THEN finish_c END AS finish,
         CASE WHEN NOT rejected THEN pattern_c END AS surface_pattern,
         CASE WHEN NOT rejected THEN desc_c END AS description,
         CASE WHEN NOT rejected THEN apps_c END AS applications,
         CASE WHEN NOT rejected THEN style_c END AS style,
         CASE WHEN NOT rejected
              THEN coalesce(confidence, CAST(0.85 AS DOUBLE)) END
           AS confidence,
         CASE WHEN NOT rejected THEN detected_c END AS detected_text
  FROM vsel)"""

# Serializer twin (CTE `vtext` over `vcoerced`) — parts join ' '.
DUCK_VTEXT_SQL = """
vparts AS (
  SELECT doc,
         list_filter([
           'Material: ' || material_type || '.',
           CASE WHEN category IS NOT NULL AND category != ''
                THEN 'Category: ' || category
                     || CASE WHEN subcategory IS NOT NULL
                                  AND subcategory != ''
                             THEN ', ' || subcategory ELSE '' END
                     || '.' END,
           CASE WHEN len(colors) > 0
                THEN 'Colors: ' || array_to_string(colors, ', ')
                     || '.' END,
           CASE WHEN len(textures) > 0
                THEN 'Textures: ' || array_to_string(textures, ', ')
                     || '.' END,
           CASE WHEN finish IS NOT NULL AND finish != ''
                THEN 'Finish: ' || finish || '.' END,
           CASE WHEN surface_pattern IS NOT NULL
                     AND surface_pattern != ''
                THEN 'Pattern: ' || surface_pattern || '.' END,
           CASE WHEN style IS NOT NULL AND style != ''
                THEN 'Style: ' || style || '.' END,
           CASE WHEN len(applications) > 0
                THEN 'Applications: '
                     || array_to_string(applications, ', ')
                     || '.' END,
           CASE WHEN description IS NOT NULL AND description != ''
                THEN 'Description: ' || description || '.' END,
           CASE WHEN len(detected_text) > 0
                THEN 'Text detected: '
                     || array_to_string(detected_text, ' ')
                     || '.' END
         ], p -> p IS NOT NULL) AS parts
  FROM vcoerced WHERE NOT rejected),
vtext AS (
  SELECT doc, array_to_string(parts, ' ') AS base_text FROM vparts)"""

# Material-properties synthesis + suffix twin (CTE `vunder`).
DUCK_VUNDER_SQL = """
vmp AS (
  SELECT doc,
         CASE WHEN doc % 3 = 0
              THEN MAP(['thickness', 'id', 'document_id',
                        'slip_rating'],
                       ['9mm', 'ignored', 'd1',
                        CASE WHEN doc % 2 = 0 THEN ''
                        ELSE 'R10' END]) END AS material_properties
  FROM docs),
vmpp AS (
  SELECT doc,
         list_sort(list_transform(
           list_filter(map_entries(material_properties),
                       e -> e.value IS NOT NULL AND e.value != ''
                            AND e.key NOT IN
                              ('id', 'created_at', 'updated_at',
                               'document_id', 'image_id')),
           e -> e.key || ': ' || e.value)) AS mp_parts
  FROM vmp),
vunder AS (
  SELECT t.doc,
         CASE WHEN p.mp_parts IS NOT NULL AND len(p.mp_parts) > 0
              THEN t.base_text || ' Material properties: '
                   || array_to_string(p.mp_parts, ', ') || '.'
              ELSE t.base_text END AS understanding_text
  FROM vtext t LEFT JOIN vmpp p USING (doc))"""

# Aspect-text twin (CTE `vaspect` over `vcoerced`).
DUCK_VASPECT_SQL = """
vaspect AS (
  SELECT doc,
         CASE WHEN len(list_filter(colors,
                x -> x IS NOT NULL AND trim(x) != '')) > 0
              THEN array_to_string(list_transform(
                     list_filter(colors,
                       x -> x IS NOT NULL AND trim(x) != ''),
                     x -> trim(x)), ', ') END AS color_text,
         CASE WHEN len(list_filter(
                textures || CASE WHEN finish IS NOT NULL
                                      AND finish != ''
                            THEN [finish] ELSE []::VARCHAR[] END,
                x -> x IS NOT NULL AND trim(x) != '')) > 0
              THEN array_to_string(list_transform(
                     list_filter(
                       textures
                       || CASE WHEN finish IS NOT NULL
                                    AND finish != ''
                          THEN [finish] ELSE []::VARCHAR[] END,
                       x -> x IS NOT NULL AND trim(x) != ''),
                     x -> trim(x)), ', ') END AS texture_text,
         CASE WHEN len(list_filter(
                CASE WHEN style IS NOT NULL AND style != ''
                     THEN [style] ELSE []::VARCHAR[] END
                || CASE WHEN surface_pattern IS NOT NULL
                             AND surface_pattern != ''
                   THEN [surface_pattern] ELSE []::VARCHAR[] END
                || applications,
                x -> x IS NOT NULL AND trim(x) != '')) > 0
              THEN array_to_string(list_transform(
                     list_filter(
                       CASE WHEN style IS NOT NULL AND style != ''
                            THEN [style] ELSE []::VARCHAR[] END
                       || CASE WHEN surface_pattern IS NOT NULL
                                    AND surface_pattern != ''
                          THEN [surface_pattern]
                          ELSE []::VARCHAR[] END
                       || applications,
                       x -> x IS NOT NULL AND trim(x) != ''),
                     x -> trim(x)), ', ') END AS style_text,
         CASE WHEN len(list_filter(
                [material_type]
                || CASE WHEN category IS NOT NULL AND category != ''
                   THEN [category] ELSE []::VARCHAR[] END
                || CASE WHEN subcategory IS NOT NULL
                             AND subcategory != ''
                   THEN [subcategory] ELSE []::VARCHAR[] END,
                x -> x IS NOT NULL AND trim(x) != '')) > 0
              THEN array_to_string(list_transform(
                     list_filter(
                       [material_type]
                       || CASE WHEN category IS NOT NULL
                                    AND category != ''
                          THEN [category] ELSE []::VARCHAR[] END
                       || CASE WHEN subcategory IS NOT NULL
                                    AND subcategory != ''
                          THEN [subcategory]
                          ELSE []::VARCHAR[] END,
                       x -> x IS NOT NULL AND trim(x) != ''),
                     x -> trim(x)), ', ') END AS material_text
  FROM vcoerced WHERE NOT rejected)"""

# Slot-fold twin (CTE `vslots` over `vcoerced` + `vaspect`).
DUCK_VSLOTS_SQL = """
vflags AS (
  SELECT c.doc, c.rejected,
         a.color_text, a.texture_text, a.style_text, a.material_text,
         (['product', 'chunk', 'image', 'query'])
           [CAST(c.doc % 4 AS INT) + 1] AS entity_type,
         c.doc % 5 != 0 AS text_ok,
         c.doc % 3 != 1 AS has_image,
         c.doc % 7 != 2 AS visual_ok,
         c.doc % 11 != 3 AS ok_color,
         c.doc % 11 != 4 AS ok_texture,
         c.doc % 13 != 5 AS ok_style,
         c.doc % 17 != 6 AS ok_material,
         c.doc % 19 != 7 AS understanding_ok
  FROM vcoerced c LEFT JOIN vaspect a USING (doc)),
vslots AS (
  SELECT doc, entity_type,
         CASE WHEN entity_type = 'query' THEN 'query'
              ELSE 'document' END AS input_type,
         text_ok AS has_text,
         has_image AND visual_ok AS has_visual,
         n_aspects > 0 AS has_aspects,
         n_aspects AS aspect_vec_count,
         NOT rejected AND understanding_ok AS has_understanding,
         produced AS slots_produced,
         produced > 0 AS success,
         CASE WHEN produced = 0 THEN 'no_vectors_generated' END
           AS error
  FROM (
    SELECT *,
           CAST(NOT rejected AND color_text IS NOT NULL
                AND ok_color AS INT)
           + CAST(NOT rejected AND texture_text IS NOT NULL
                  AND ok_texture AS INT)
           + CAST(NOT rejected AND style_text IS NOT NULL
                  AND ok_style AS INT)
           + CAST(NOT rejected AND material_text IS NOT NULL
                  AND ok_material AS INT) AS n_aspects
    FROM vflags) f
  CROSS JOIN LATERAL (
    SELECT CAST(text_ok AS INT)
           + CAST(has_image AND visual_ok AS INT)
           + CASE WHEN n_aspects > 0 THEN 4 ELSE 0 END
           + CAST(NOT rejected AND understanding_ok AS INT)
             AS produced) p)"""
