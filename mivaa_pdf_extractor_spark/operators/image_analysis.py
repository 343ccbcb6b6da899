"""Image-analysis property extraction + unified quality scoring.

Reference: ``app/services/images/real_image_analysis_service.py`` —

- ``_extract_material_properties`` (:642-687): vision fields read
  only when ``success AND analysis``; color/texture take element [0]
  of their lists when the LIST is truthy (a leading NULL element is
  kept — pinned); finish/pattern/composition fall through falsy
  ``or`` chains into the legacy nested ``properties.*`` slots;
  confidence defaults 0.0.  Claude enhancement (success AND
  validation) fills ONLY still-falsy color/finish/pattern from
  ``visual_properties`` and raises confidence to
  ``max(vision, claude)``.
- ``_extract_material_properties_from_vision`` (:689-723): same
  reads, but gate ladder — ``success AND analysis`` reads the
  analysis; ELIF ``"error" not in result`` reads the TOP-LEVEL
  fields (an unsuccessful envelope without an error key is still
  mined — pinned); else all-None with confidence 0.0.
- ``_read_vision_confidence`` (:725-734): ``analysis.confidence or
  result.confidence or 0.0`` — a 0.0 analysis confidence FALLS
  THROUGH to the top-level value (falsy ``or``, pinned); clamped to
  [0, 1]; non-dict analysis treated as {}.
- ``_calculate_quality_score_unified`` (:736-806): weighted average
  where ZERO components leave the DENOMINATOR — vision confidence
  (0.40, counted when ``success OR no error key`` and vc > 0),
  Claude overall_quality (0.30, clamped, only when > 0), property
  completeness (0.20, ALWAYS counted when the props dict exists —
  even at 0/6 filled, pinned; ``confidence`` 0.0 counts as
  UNFILLED), SLIG validity (0.10, counted only when >10% of values
  are non-zero — an invalid embedding is EXCLUDED, not penalized,
  pinned); ``min(1.0, score/weight)``, 0.5 when nothing scored.
- ``_calculate_confidence`` (:837-862): mean of the confidences
  that are present (vision-success, claude-success, props dict),
  0.5 when none.

Scale: map-only projections; at 100 TB these fuse into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EXPECTED_PROP_KEYS = ("color", "finish", "pattern", "texture",
                      "composition", "confidence")


def _truthy(c):
    return c.isNotNull() & (c != "")


def _first_or_null(arr):
    # analysis.get("colors", [None])[0] if analysis.get("colors")
    return F.when(arr.isNotNull() & (F.size(arr) > 0),
                  F.element_at(arr, 1))


def _or_chain(*names):
    out = None
    for n in names:
        c = F.col(n)
        out = F.when(_truthy(c), c) if out is None \
            else out.when(_truthy(c), c)
    return out


def extract_material_properties(df: DataFrame) -> DataFrame:
    """Hybrid vision+Claude extraction.  Columns in: (doc,
    vision_success, has_analysis, colors, textures, finish,
    prop_finish, surface_pattern, pattern, prop_pattern,
    composition, prop_composition, confidence, claude_success,
    has_validation, cv_palette, cv_surface_finish, cv_pattern_type,
    claude_confidence)."""
    vis = F.col("vision_success") & F.col("has_analysis")
    v_color = F.when(vis, _first_or_null(F.col("colors")))
    v_texture = F.when(vis, _first_or_null(F.col("textures")))
    v_finish = F.when(vis, _or_chain("finish", "prop_finish"))
    v_pattern = F.when(vis, _or_chain("surface_pattern", "pattern",
                                      "prop_pattern"))
    v_comp = F.when(vis, _or_chain("composition", "prop_composition"))
    v_conf = F.when(vis, F.coalesce(F.col("confidence"), F.lit(0.0))) \
        .otherwise(F.lit(0.0))

    cla = F.col("claude_success") & F.col("has_validation")
    color = F.when(~_truthy(v_color) & cla
                   & (F.size(F.coalesce(F.col("cv_palette"),
                                        F.array().cast(
                                            "array<string>"))) > 0),
                   F.element_at(F.col("cv_palette"), 1)) \
        .otherwise(v_color)
    finish = F.when(~_truthy(v_finish) & cla
                    & _truthy(F.col("cv_surface_finish")),
                    F.col("cv_surface_finish")).otherwise(v_finish)
    pattern = F.when(~_truthy(v_pattern) & cla
                     & _truthy(F.col("cv_pattern_type")),
                     F.col("cv_pattern_type")).otherwise(v_pattern)
    c_conf = F.coalesce(F.col("claude_confidence"), F.lit(0.0))
    conf = F.when(cla & (c_conf > v_conf), c_conf).otherwise(v_conf)
    return df.select(
        "doc", color.alias("color"), finish.alias("finish"),
        pattern.alias("pattern"), v_texture.alias("texture"),
        v_comp.alias("composition"), conf.alias("confidence"))


def extract_vision_only(df: DataFrame) -> DataFrame:
    """Vision-only gate ladder: analysis when success+analysis, else
    TOP-LEVEL fields when no error key (modeled: has_error false),
    else nothing.  Reads the same field columns for both tiers —
    the ladder is the pin."""
    reads = (F.col("vision_success") & F.col("has_analysis")) | \
        (~(F.col("vision_success") & F.col("has_analysis"))
         & ~F.col("has_error"))
    return df.select(
        "doc",
        F.when(reads, _first_or_null(F.col("colors"))).alias("color"),
        F.when(reads, _or_chain("finish", "prop_finish"))
        .alias("finish"),
        F.when(reads, _or_chain("surface_pattern", "pattern",
                                "prop_pattern")).alias("pattern"),
        F.when(reads, _first_or_null(F.col("textures")))
        .alias("texture"),
        F.when(reads, _or_chain("composition", "prop_composition"))
        .alias("composition"),
        F.when(reads, F.coalesce(F.col("confidence"), F.lit(0.0)))
        .otherwise(F.lit(0.0)).alias("confidence"))


def _clamp01(c):
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), c))


def read_vision_confidence() -> F.Column:
    """analysis.confidence or top.confidence or 0.0 (falsy chain —
    a 0.0 analysis value falls through), clamped."""
    a_conf = F.when(F.col("has_analysis"), F.col("confidence"))
    raw = (F.when(a_conf.isNotNull() & (a_conf != 0.0), a_conf)
           .when(F.col("top_confidence").isNotNull()
                 & (F.col("top_confidence") != 0.0),
                 F.col("top_confidence"))
           .otherwise(F.lit(0.0)))
    return _clamp01(raw)


def quality_score_unified(df: DataFrame,
                          props: DataFrame) -> DataFrame:
    """Columns in ``df``: the vision/claude flags + top_confidence +
    claude_overall_quality + slig_provided/slig_dim/slig_nonzero;
    ``props``: extract_material_properties output."""
    props_p = props.select(
        "doc", *[F.col(c).alias(f"p_{c}") for c in props.columns
                 if c != "doc"])
    j = df.join(props_p, "doc")
    vc = read_vision_confidence()
    vision_counted = (F.col("vision_success") | ~F.col("has_error")) \
        & (vc > 0.0)
    oq = _clamp01(F.coalesce(F.col("claude_overall_quality"),
                             F.lit(0.0)))
    claude_counted = F.col("claude_success") & (oq > 0.0)

    def filled(col):
        c = F.col(f"p_{col}")
        if col == "confidence":
            return (c.isNotNull() & (c != 0.0)).cast("int")
        return _truthy(c).cast("int")

    n_filled = sum(filled(k) for k in EXPECTED_PROP_KEYS)
    props_score = n_filled / F.lit(float(len(EXPECTED_PROP_KEYS)))
    slig_valid = (F.col("slig_provided") & (F.col("slig_dim") > 0)
                  & (F.col("slig_nonzero")
                     > F.col("slig_dim") * 0.10))
    score = (F.when(vision_counted, vc * 0.40).otherwise(F.lit(0.0))
             + F.when(claude_counted, oq * 0.30).otherwise(F.lit(0.0))
             + props_score * 0.20
             + F.when(slig_valid, F.lit(0.10)).otherwise(F.lit(0.0)))
    weight = (F.when(vision_counted, F.lit(0.40)).otherwise(F.lit(0.0))
              + F.when(claude_counted, F.lit(0.30))
              .otherwise(F.lit(0.0))
              + F.lit(0.20)
              + F.when(slig_valid, F.lit(0.10)).otherwise(F.lit(0.0)))
    quality = F.when(weight > 0,
                     F.least(F.lit(1.0), score / weight)) \
        .otherwise(F.lit(0.5))
    # _calculate_confidence (:837-862): mean over present members;
    # the props dict always exists in this fold -> >= 1 member.
    conf_members = F.array(
        F.when(F.col("vision_success"),
               F.when(F.col("has_analysis"),
                      F.coalesce(F.col("confidence"), F.lit(0.0)))
               .otherwise(F.lit(0.0))),
        F.when(F.col("claude_success"),
               F.coalesce(F.col("claude_confidence"), F.lit(0.0))),
        F.col("p_confidence"))
    conf_present = F.filter(conf_members, lambda x: x.isNotNull())
    agreement = F.when(
        F.size(conf_present) > 0,
        F.aggregate(conf_present, F.lit(0.0), lambda a, x: a + x)
        / F.size(conf_present)).otherwise(F.lit(0.5))
    return j.select("doc",
                    n_filled.alias("props_filled"),
                    vision_counted.alias("vision_counted"),
                    claude_counted.alias("claude_counted"),
                    slig_valid.alias("slig_counted"),
                    F.round(quality, 9).alias("quality_score"),
                    F.round(agreement, 9).alias("agreement_confidence"))


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis + DuckDB twins
# ──────────────────────────────────────────────────────────────────

def synth_analysis_rows(docs: DataFrame) -> DataFrame:
    g = F.col("doc_id").cast("long")
    nul_s = F.lit(None).cast("string")
    nul_a = F.lit(None).cast("array<string>")
    return docs.select(
        g.alias("doc"),
        (g % 5 != 0).alias("vision_success"),
        (g % 4 != 1).alias("has_analysis"),
        (g % 7 == 2).alias("has_error"),
        F.when(g % 4 == 0, nul_a)
        .when(g % 4 == 1, F.array().cast("array<string>"))
        .when(g % 4 == 2, F.array(nul_s, F.lit("grey")))
        .otherwise(F.array(F.lit("beige"))).alias("colors"),
        F.when(g % 3 == 0, F.array(F.lit("veined")))
        .otherwise(nul_a).alias("textures"),
        F.when(g % 5 == 1, F.lit("matte"))
        .when(g % 5 == 2, F.lit("")).otherwise(nul_s).alias("finish"),
        F.when(g % 2 == 0, F.lit("honed")).otherwise(nul_s)
        .alias("prop_finish"),
        F.when(g % 6 == 3, F.lit("herringbone")).otherwise(nul_s)
        .alias("surface_pattern"),
        F.when(g % 4 == 2, F.lit("chevron")).otherwise(nul_s)
        .alias("pattern"),
        F.when(g % 3 == 1, F.lit("grid")).otherwise(nul_s)
        .alias("prop_pattern"),
        F.when(g % 7 == 0, F.lit("porcelain")).otherwise(nul_s)
        .alias("composition"),
        F.when(g % 5 == 3, F.lit("ceramic")).otherwise(nul_s)
        .alias("prop_composition"),
        F.when(g % 9 == 0, F.lit(None).cast("double"))
        .when(g % 9 == 1, F.lit(0.0))
        .otherwise((g % 10).cast("double") / 10.0)
        .alias("confidence"),
        F.when(g % 6 == 0, F.lit(0.0))
        .when(g % 6 == 1, F.lit(None).cast("double"))
        .otherwise((g % 8).cast("double") / 8.0)
        .alias("top_confidence"),
        (g % 3 != 2).alias("claude_success"),
        (g % 5 != 4).alias("has_validation"),
        # validation-nested fields flatten to NULL when the
        # validation envelope itself is absent (g % 5 == 4)
        F.when((g % 5 != 4) & (g % 4 == 3),
               F.array(F.lit("warm white"), F.lit("oak")))
        .when((g % 5 != 4) & (g % 4 == 0),
              F.array().cast("array<string>"))
        .otherwise(nul_a).alias("cv_palette"),
        F.when((g % 5 != 4) & (g % 2 == 1), F.lit("satin"))
        .otherwise(nul_s).alias("cv_surface_finish"),
        F.when((g % 5 != 4) & (g % 5 == 0), F.lit("mosaic"))
        .otherwise(nul_s).alias("cv_pattern_type"),
        F.when((g % 5 == 4) | (g % 11 == 0),
               F.lit(None).cast("double"))
        .otherwise((g % 12).cast("double") / 12.0)
        .alias("claude_confidence"),
        F.when((g % 5 == 4) | (g % 13 == 1),
               F.lit(None).cast("double"))
        .when(g % 13 == 0, F.lit(1.4))
        .otherwise((g % 6).cast("double") / 6.0)
        .alias("claude_overall_quality"),
        (g % 4 != 0).alias("slig_provided"),
        F.lit(768).alias("slig_dim"),
        F.when(g % 3 == 0, F.lit(50)).otherwise(F.lit(400))
        .cast("int").alias("slig_nonzero"))


_DUCK_IA_FIELDS = """
  SELECT doc,
         doc % 5 != 0 AS vision_success,
         doc % 4 != 1 AS has_analysis,
         doc % 7 = 2 AS has_error,
         CASE WHEN doc % 4 = 0 THEN NULL
              WHEN doc % 4 = 1 THEN []::VARCHAR[]
              WHEN doc % 4 = 2 THEN [NULL, 'grey']
              ELSE ['beige'] END AS colors,
         CASE WHEN doc % 3 = 0 THEN ['veined'] END AS textures,
         CASE WHEN doc % 5 = 1 THEN 'matte'
              WHEN doc % 5 = 2 THEN '' END AS finish,
         CASE WHEN doc % 2 = 0 THEN 'honed' END AS prop_finish,
         CASE WHEN doc % 6 = 3 THEN 'herringbone' END
           AS surface_pattern,
         CASE WHEN doc % 4 = 2 THEN 'chevron' END AS pattern,
         CASE WHEN doc % 3 = 1 THEN 'grid' END AS prop_pattern,
         CASE WHEN doc % 7 = 0 THEN 'porcelain' END AS composition,
         CASE WHEN doc % 5 = 3 THEN 'ceramic' END
           AS prop_composition,
         CASE WHEN doc % 9 = 0 THEN NULL
              WHEN doc % 9 = 1 THEN 0.0
              ELSE CAST(doc % 10 AS DOUBLE) / 10.0 END AS confidence,
         CASE WHEN doc % 6 = 0 THEN 0.0
              WHEN doc % 6 = 1 THEN NULL
              ELSE CAST(doc % 8 AS DOUBLE) / 8.0 END
           AS top_confidence,
         doc % 3 != 2 AS claude_success,
         doc % 5 != 4 AS has_validation,
         CASE WHEN doc % 5 != 4 AND doc % 4 = 3
              THEN ['warm white', 'oak']
              WHEN doc % 5 != 4 AND doc % 4 = 0
              THEN []::VARCHAR[] END AS cv_palette,
         CASE WHEN doc % 5 != 4 AND doc % 2 = 1 THEN 'satin' END
           AS cv_surface_finish,
         CASE WHEN doc % 5 != 4 AND doc % 5 = 0 THEN 'mosaic' END
           AS cv_pattern_type,
         CASE WHEN doc % 5 = 4 OR doc % 11 = 0 THEN NULL
              ELSE CAST(doc % 12 AS DOUBLE) / 12.0 END
           AS claude_confidence,
         CASE WHEN doc % 5 = 4 OR doc % 13 = 1 THEN NULL
              WHEN doc % 13 = 0 THEN 1.4
              ELSE CAST(doc % 6 AS DOUBLE) / 6.0 END
           AS claude_overall_quality,
         doc % 4 != 0 AS slig_provided,
         768 AS slig_dim,
         CASE WHEN doc % 3 = 0 THEN 50 ELSE 400 END AS slig_nonzero
  FROM docs"""

DUCK_IA_PROPS_SQL = f"""
iaraw AS ({_DUCK_IA_FIELDS}),
iav AS (
  SELECT *,
         vision_success AND has_analysis AS vis,
         CASE WHEN vision_success AND has_analysis
                   AND colors IS NOT NULL AND len(colors) > 0
              THEN colors[1] END AS v_color,
         CASE WHEN vision_success AND has_analysis
                   AND textures IS NOT NULL AND len(textures) > 0
              THEN textures[1] END AS v_texture,
         CASE WHEN vision_success AND has_analysis THEN
           CASE WHEN finish IS NOT NULL AND finish != '' THEN finish
                WHEN prop_finish IS NOT NULL AND prop_finish != ''
                THEN prop_finish END END AS v_finish,
         CASE WHEN vision_success AND has_analysis THEN
           CASE WHEN surface_pattern IS NOT NULL
                     AND surface_pattern != '' THEN surface_pattern
                WHEN pattern IS NOT NULL AND pattern != ''
                THEN pattern
                WHEN prop_pattern IS NOT NULL AND prop_pattern != ''
                THEN prop_pattern END END AS v_pattern,
         CASE WHEN vision_success AND has_analysis THEN
           CASE WHEN composition IS NOT NULL AND composition != ''
                THEN composition
                WHEN prop_composition IS NOT NULL
                     AND prop_composition != ''
                THEN prop_composition END END AS v_comp,
         CASE WHEN vision_success AND has_analysis
              THEN coalesce(confidence, 0.0) ELSE 0.0 END AS v_conf,
         claude_success AND has_validation AS cla
  FROM iaraw),
iaprops AS (
  SELECT doc,
         CASE WHEN (v_color IS NULL OR v_color = '') AND cla
                   AND cv_palette IS NOT NULL AND len(cv_palette) > 0
              THEN cv_palette[1] ELSE v_color END AS color,
         CASE WHEN (v_finish IS NULL OR v_finish = '') AND cla
                   AND cv_surface_finish IS NOT NULL
                   AND cv_surface_finish != ''
              THEN cv_surface_finish ELSE v_finish END AS finish,
         CASE WHEN (v_pattern IS NULL OR v_pattern = '') AND cla
                   AND cv_pattern_type IS NOT NULL
                   AND cv_pattern_type != ''
              THEN cv_pattern_type ELSE v_pattern END AS pattern,
         v_texture AS texture,
         v_comp AS composition,
         CASE WHEN cla AND coalesce(claude_confidence, 0.0) > v_conf
              THEN coalesce(claude_confidence, 0.0)
              ELSE v_conf END AS confidence
  FROM iav)"""

DUCK_IA_VISONLY_SQL = f"""
iaraw AS ({_DUCK_IA_FIELDS}),
iavo AS (
  SELECT doc,
         CASE WHEN reads AND colors IS NOT NULL AND len(colors) > 0
              THEN colors[1] END AS color,
         CASE WHEN reads THEN
           CASE WHEN finish IS NOT NULL AND finish != '' THEN finish
                WHEN prop_finish IS NOT NULL AND prop_finish != ''
                THEN prop_finish END END AS finish,
         CASE WHEN reads THEN
           CASE WHEN surface_pattern IS NOT NULL
                     AND surface_pattern != '' THEN surface_pattern
                WHEN pattern IS NOT NULL AND pattern != ''
                THEN pattern
                WHEN prop_pattern IS NOT NULL AND prop_pattern != ''
                THEN prop_pattern END END AS pattern,
         CASE WHEN reads AND textures IS NOT NULL
                   AND len(textures) > 0
              THEN textures[1] END AS texture,
         CASE WHEN reads THEN
           CASE WHEN composition IS NOT NULL AND composition != ''
                THEN composition
                WHEN prop_composition IS NOT NULL
                     AND prop_composition != ''
                THEN prop_composition END END AS composition,
         CASE WHEN reads THEN coalesce(confidence, 0.0)
              ELSE 0.0 END AS confidence
  FROM (
    SELECT *,
           (vision_success AND has_analysis)
           OR (NOT (vision_success AND has_analysis)
               AND NOT has_error) AS reads
    FROM iaraw) r)"""

DUCK_IA_QUALITY_SQL = f"""
{DUCK_IA_PROPS_SQL},
iaq AS (
  SELECT r.doc,
         CAST(p.color IS NOT NULL AND p.color != '' AS INT)
         + CAST(p.finish IS NOT NULL AND p.finish != '' AS INT)
         + CAST(p.pattern IS NOT NULL AND p.pattern != '' AS INT)
         + CAST(p.texture IS NOT NULL AND p.texture != '' AS INT)
         + CAST(p.composition IS NOT NULL AND p.composition != ''
                AS INT)
         + CAST(p.confidence IS NOT NULL AND p.confidence != 0.0
                AS INT) AS props_filled,
         (r.vision_success OR NOT r.has_error) AND vc > 0.0
           AS vision_counted,
         r.claude_success AND oq > 0.0 AS claude_counted,
         r.slig_provided AND r.slig_dim > 0
           AND r.slig_nonzero > r.slig_dim * 0.10 AS slig_counted,
         vc, oq, p.confidence AS p_confidence
  FROM iaraw r
  JOIN iaprops p USING (doc)
  CROSS JOIN LATERAL (
    SELECT greatest(0.0, least(1.0,
             CASE WHEN r.has_analysis AND r.confidence IS NOT NULL
                       AND r.confidence != 0.0 THEN r.confidence
                  WHEN r.top_confidence IS NOT NULL
                       AND r.top_confidence != 0.0
                  THEN r.top_confidence
                  ELSE 0.0 END)) AS vc,
           greatest(0.0, least(1.0,
             coalesce(r.claude_overall_quality, 0.0))) AS oq) x),
iaquality AS (
  SELECT q.doc, q.props_filled, q.vision_counted, q.claude_counted,
         q.slig_counted,
         round(CASE WHEN wsum > 0
                    THEN least(1.0, ssum / wsum) ELSE 0.5 END, 9)
           AS quality_score,
         round(CASE WHEN n_conf > 0 THEN csum / n_conf
                    ELSE 0.5 END, 9) AS agreement_confidence
  FROM iaq q
  JOIN iaraw r USING (doc)
  CROSS JOIN LATERAL (
    SELECT CASE WHEN q.vision_counted THEN q.vc * 0.40
                ELSE 0.0 END
           + CASE WHEN q.claude_counted THEN q.oq * 0.30
                  ELSE 0.0 END
           + (q.props_filled / 6.0) * 0.20
           + CASE WHEN q.slig_counted THEN 0.10 ELSE 0.0 END AS ssum,
           CASE WHEN q.vision_counted THEN 0.40 ELSE 0.0 END
           + CASE WHEN q.claude_counted THEN 0.30 ELSE 0.0 END
           + 0.20
           + CASE WHEN q.slig_counted THEN 0.10 ELSE 0.0 END AS wsum,
           CASE WHEN r.vision_success THEN
             CASE WHEN r.has_analysis
                  THEN coalesce(r.confidence, 0.0) ELSE 0.0 END
             ELSE NULL END AS m1,
           CASE WHEN r.claude_success
                THEN coalesce(r.claude_confidence, 0.0) END AS m2,
           q.p_confidence AS m3) m
  CROSS JOIN LATERAL (
    SELECT coalesce(m.m1, 0) + coalesce(m.m2, 0)
           + coalesce(m.m3, 0) AS csum,
           CAST(m.m1 IS NOT NULL AS INT)
           + CAST(m.m2 IS NOT NULL AS INT)
           + CAST(m.m3 IS NOT NULL AS INT) AS n_conf) c)"""
