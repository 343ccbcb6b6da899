"""Vision-analysis rollup — per-product majority vote as one groupBy.

Re-expresses ``_rollup_vision_analysis``
(reference stage_4_products.py:1974-2154) with its helpers
``_most_common_pretty`` / ``_dedupe_pretty`` (:1937-1972) and
``_normalize_material_category`` (:1687-1701):

- per-image vision_analysis rows roll up into product-level candidates;
  rows whose blob is NULL are skipped (the ``isinstance(va, dict)``
  gate).
- legacy-key fallbacks use Python ``or`` semantics faithfully: a
  present-but-EMPTY ``subcategory`` falls back to ``material_subtype``,
  but a whitespace-only one is truthy — it BLOCKS the fallback and then
  fails the strip gate, so nothing is appended (pinned). Same for
  ``surface_pattern``/``pattern``, ``style``/``design_style``,
  ``colors``/``color_palette`` (empty LIST falls back).
- ``_most_common_pretty``: winning case-fold by (count desc, first
  insertion), then the most common STRIPPED original within that fold
  (same tie rule). ``_dedupe_pretty(cap)``: all folds in that order,
  capped, represented by their first stripped original.
- material_category: modal of lowercased material_type, then the
  48-entry controlled-vocab map — exact key first, else the FIRST map
  phrase (insertion order) contained in the key.
- vision_description = longest description, first on ties (Python
  ``max`` keeps the first maximum).
- DEVIATION (documented): vision_confidence is emitted as integer
  micro-units (floor of the mean x 1e6) instead of the reference's
  ``round(mean, 3)`` float — cross-engine float rounding at the .0005
  boundary is half-up in Spark and half-even in Python/DuckDB; the
  integer form is exact in both engines. The pytest pin converts.

Insertion order is the reference's DB return order; the batch twin
canonicalizes it to image_id order (sort_array over the collected
structs) — pinned in tests.

Scale: one groupBy shuffle on product_id carrying the per-image field
structs (row-sized — the same bound the reference's in-memory
List[dict] imposes); every vote/fold then runs as HOF expressions
inside the aggregated row. No UDFs, no second shuffle, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mivaa_pdf_extractor_spark.operators.enrich import _modal

# _MATERIAL_TYPE_TO_CATEGORY (stage_4_products.py:1625-1685) — pinned
# behavior-table data; ORDER IS THE PARTIAL-MATCH PRIORITY.
VISION_CATEGORY_MAP = (
    ("ceramic tile", "ceramic_tile"), ("porcelain tile", "porcelain_tile"),
    ("stoneware", "floor_tile"), ("stoneware tile", "floor_tile"),
    ("mosaic", "wall_tile"), ("mosaic tile", "wall_tile"),
    ("outdoor tile", "floor_tile"), ("wall tile", "wall_tile"),
    ("floor tile", "floor_tile"), ("bathroom tile", "bathroom_tile"),
    ("shower tile", "shower_tile"), ("natural stone", "stone_slab"),
    ("marble", "stone_slab"), ("granite", "stone_slab"),
    ("slate", "stone_slab"), ("limestone", "stone_slab"),
    ("travertine", "stone_slab"), ("quartz", "quartz"),
    ("terrazzo", "terrazzo"), ("concrete", "concrete"),
    ("wood", "wood_flooring"), ("wood flooring", "wood_flooring"),
    ("hardwood", "hardwood"), ("engineered wood", "engineered_wood"),
    ("parquet", "parquet"), ("laminate", "laminate"),
    ("vinyl", "vinyl_flooring"), ("bamboo", "wood_flooring"),
    ("sofa", "sofa"), ("chair", "dining_chair"),
    ("table", "dining_table"), ("cabinet", "cabinet"),
    ("toilet", "toilet"), ("basin", "basin"), ("bathtub", "bathtub"),
    ("tap", "tap"), ("faucet", "faucet"), ("radiator", "radiator"),
    ("towel rail", "towel_rail"), ("boiler", "boiler"),
    ("light", "lighting"), ("lamp", "lighting"),
    ("pendant", "pendant_light"), ("chandelier", "chandelier"),
    ("paint", "wall_paint"), ("wallpaper", "wallpaper"),
    ("worktop", "kitchen_worktop"), ("countertop", "countertop"),
)

def _empty() -> Column:
    return F.array().cast("array<string>")


def _clean(arr: Column) -> Column:
    """strip + drop empties, preserving order (the per-field append
    gates `isinstance(x, str) and x.strip()`)."""
    return F.coalesce(
        F.filter(F.transform(arr, lambda x: F.trim(x)), lambda x: x != ""), _empty())


def _pretty(values: Column) -> Column:
    """_most_common_pretty: modal case-fold, then modal stripped
    original within the winning fold."""
    folds = F.transform(values, lambda v: F.lower(F.trim(v)))
    win = _modal(folds)
    return _modal(F.transform(
        F.filter(values, lambda v: F.lower(F.trim(v)) == win), lambda x: F.trim(x)))


def _dedupe_cap(values: Column, cap: int) -> Column:
    """_dedupe_pretty: folds by (count desc, first insertion), capped,
    each represented by its first stripped original.

    ``values`` and the derived fold array are let-bound once (single-
    element transform lambdas): the sweep references the fold array
    O(n) times per row and HOF arguments are re-evaluated per
    reference."""
    def _body(vals: Column) -> Column:
        def _inner(folds: Column) -> Column:
            idx = F.sequence(F.lit(1), F.size(folds))
            encs = F.array_compact(F.transform(idx, lambda i: F.when(
                F.array_position(folds, F.element_at(folds, i)) == i,
                F.concat(
                    F.lpad((F.lit(9999) - F.size(F.filter(
                        folds, lambda f: f == F.element_at(folds, i))))
                        .cast("string"), 4, "0"),
                    F.lpad(i.cast("string"), 4, "0")))))
            picked = F.slice(F.array_sort(encs), 1, cap)
            return F.transform(picked, lambda e: F.trim(F.element_at(
                vals, F.substring(e, 5, 4).cast("int"))))
        out = F.element_at(F.transform(F.array(
            F.transform(vals, lambda v: F.lower(F.trim(v)))), _inner), 1)
        return F.when(F.size(vals) > 0, out).otherwise(_empty())
    return F.element_at(F.transform(F.array(values), _body), 1)


def _longest_first(values: Column) -> Column:
    """max(values, key=len): longest, FIRST on ties. Argument let-bound
    once (same rationale as ``_modal``)."""
    def _body(vals: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(vals))
        encs = F.transform(idx, lambda i: F.concat(
            F.lpad((F.lit(99999) - F.length(F.element_at(vals, i)))
                   .cast("string"), 5, "0"),
            F.lpad(i.cast("string"), 4, "0"),
            F.element_at(vals, i)))
        return F.when(F.size(vals) > 0,
                      F.substring(F.array_min(encs), 10, 1 << 20))
    return F.element_at(F.transform(F.array(values), _body), 1)


def normalize_vision_category_col(key: Column) -> Column:
    """_normalize_material_category: exact vocab key, else first map
    phrase contained in the key (map insertion order)."""
    exact = None
    for phrase, vocab in VISION_CATEGORY_MAP:
        cond = key == phrase
        exact = (F.when(cond, vocab) if exact is None
                 else exact.when(cond, vocab))
    partial = None
    for phrase, vocab in VISION_CATEGORY_MAP:
        cond = key.contains(phrase)
        partial = (F.when(cond, vocab) if partial is None
                   else partial.when(cond, vocab))
    return F.coalesce(exact, partial)


def rollup_vision(rows: DataFrame) -> DataFrame:
    """One shuffle on product_id; every vote runs as HOFs over the
    collected per-image structs (image_id order pins insertion order).

    Expects columns: product_id, image_id, va struct<material_type,
    category, subcategory, material_subtype, finish, surface_pattern,
    pattern, textures array, texture, style, design_style,
    colors array, color_palette array, applications array, description,
    detected_text array, confidence double>."""
    g = (rows.where(F.col("va").isNotNull())
         .groupBy("product_id")
         .agg(F.sort_array(F.collect_list(
             F.struct(F.col("image_id"), F.col("va")))).alias("R")))
    R = F.col("R")

    def field(name):
        return F.transform(R, lambda r: r["va"][name])

    def scalar_cands(name):
        return _clean(F.filter(field(name),
                               lambda x: x.isNotNull()))

    def or_str(name, legacy):
        # va.get(a) or va.get(b) on strings: None/'' fall back,
        # whitespace-only blocks the fallback then fails the strip gate
        merged = F.transform(R, lambda r: F.when(
            r["va"][name].isNotNull() & (r["va"][name] != ""),
            r["va"][name]).otherwise(r["va"][legacy]))
        return _clean(F.filter(merged, lambda x: x.isNotNull()))

    mt = scalar_cands("material_type")
    cats = scalar_cands("category")
    subs = or_str("subcategory", "material_subtype")
    fins = scalar_cands("finish")
    pats = or_str("surface_pattern", "pattern")
    styles = or_str("style", "design_style")

    # textures: per-row list THEN the legacy scalar, flattened in order
    tex = F.coalesce(F.flatten(F.transform(R, lambda r: F.concat(
        F.filter(F.transform(F.coalesce(
            r["va"]["textures"], _empty()), lambda x: F.trim(x)), lambda x: x != ""),
        F.array_compact(F.array(F.when(
            r["va"]["texture"].isNotNull()
            & (F.trim(r["va"]["texture"]) != ""),
            F.trim(r["va"]["texture"]))))))), _empty())

    # colors or color_palette: empty LIST falls back
    cols = F.coalesce(F.flatten(F.transform(R, lambda r: F.filter(
        F.transform(F.when(
            r["va"]["colors"].isNotNull()
            & (F.size(r["va"]["colors"]) > 0), r["va"]["colors"])
            .otherwise(F.coalesce(r["va"]["color_palette"], _empty())),
            lambda x: F.trim(x)),
        lambda x: x != ""))), _empty())

    apps = F.coalesce(F.flatten(F.transform(R, lambda r: F.filter(
        F.transform(F.coalesce(r["va"]["applications"], _empty()),
                    lambda x: F.trim(x)), lambda x: x != ""))), _empty())
    dtexts = F.coalesce(F.flatten(F.transform(R, lambda r: F.filter(
        F.transform(F.coalesce(r["va"]["detected_text"], _empty()),
                    lambda x: F.trim(x)), lambda x: x != ""))), _empty())
    descs = scalar_cands("description")

    confs = F.filter(field("confidence"),
                     lambda c: c.isNotNull() & (c >= 0.0) & (c <= 1.0))
    # integer micro-unit mean: confidences are exact binary eighths in
    # the synthetic corpus; sum in eighths, floor-divide once
    c8 = F.transform(confs, lambda c: (c * 8).cast("long"))
    sum8 = F.aggregate(c8, F.lit(0).cast("long"), lambda a, x: a + x)
    conf_micro = F.when(
        F.size(confs) > 0,
        F.floor((sum8 * 1000000) / (F.lit(8) * F.size(confs)))
        .cast("long"))

    # Two-phase vote with a materialization barrier in between.
    #
    # Why: Spark evaluates a HOF's argument expression on every
    # reference — there is no per-row subexpression cache in either
    # interpreted or codegen mode. _most_common_pretty nests the
    # winning-fold modal (an O(n^2+) expression) inside the candidate
    # filter's per-element lambda, and the outer modal then touches the
    # filtered array O(n) more times: if CollapseProject inlines the
    # win expression, the composed tree's cost multiplies per nesting
    # level — measured as a multi-minute stall at just ~40 candidates.
    # Computing each field's winning FOLD as a real column first and
    # cutting the plan with a persist() barrier (the CacheManager
    # substitutes InMemoryRelation after analysis and BEFORE the
    # optimizer runs, so CollapseProject cannot cross it) keeps every
    # stage's cost bounded. Round 6: this was an eager localCheckpoint;
    # the lazy persist is the same barrier but runs as part of the
    # first action instead of a separate driver-blocking job (and the
    # bench's release_cached() drops it between runs via track). The
    # persisted frame is one row per product with row-sized arrays —
    # at any corpus scale this is the already-aggregated side, so the
    # materialization is a rounding error next to the groupBy shuffle
    # that precedes it.
    def win_fold(col):
        return _modal(F.transform(F.col(col),
                                  lambda v: F.lower(F.trim(v))))

    wins = g.select(
        "product_id", mt.alias("mt"), cats.alias("cats"),
        subs.alias("subs"), fins.alias("fins"), pats.alias("pats"),
        styles.alias("styles"), tex.alias("tex"), cols.alias("cols"),
        apps.alias("apps"), dtexts.alias("dtexts"),
        descs.alias("descs"), conf_micro.alias("conf_micro"))
    wins = wins.select(
        "*",
        _modal(F.transform(F.col("mt"), F.lower)).alias("mt_modal"),
        win_fold("cats").alias("cats_wf"),
        win_fold("subs").alias("subs_wf"),
        win_fold("fins").alias("fins_wf"),
        win_fold("pats").alias("pats_wf"),
        win_fold("styles").alias("styles_wf"),
        win_fold("tex").alias("tex_wf"))
    from mivaa_pdf_extractor_spark.core.cache import track
    wins = track(wins)

    def pretty_of(col, wf):
        # second half of _most_common_pretty: modal stripped original
        # within the (pre-staged) winning fold
        return _modal(F.transform(
            F.filter(F.col(col),
                     lambda v: F.lower(F.trim(v)) == F.col(wf)),
            lambda x: F.trim(x)))

    return wins.select(
        "product_id",
        F.when(F.col("mt_modal").isNotNull(),
               normalize_vision_category_col(F.col("mt_modal")))
         .alias("material_category"),
        pretty_of("cats", "cats_wf").alias("category"),
        pretty_of("subs", "subs_wf").alias("material_subtype"),
        pretty_of("subs", "subs_wf").alias("subcategory"),
        pretty_of("fins", "fins_wf").alias("finish"),
        pretty_of("pats", "pats_wf").alias("pattern"),
        _dedupe_cap(F.col("pats"), 20).alias("patterns"),
        pretty_of("tex", "tex_wf").alias("texture"),
        _dedupe_cap(F.col("tex"), 10).alias("textures"),
        pretty_of("styles", "styles_wf").alias("design_style"),
        pretty_of("styles", "styles_wf").alias("style"),
        _dedupe_cap(F.col("cols"), 20).alias("appearance_colors"),
        _dedupe_cap(F.col("apps"), 10).alias("applications"),
        _longest_first(F.col("descs")).alias("vision_description"),
        _dedupe_cap(F.col("dtexts"), 20).alias("detected_text"),
        F.col("conf_micro").alias("vision_confidence_micro"))


# ---------------------------------------------------------------------------
# deterministic synthesizer + DuckDB twin
# ---------------------------------------------------------------------------

def synth_vision_rows(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    s = lambda c: c.cast("string")  # noqa: E731

    material_type = (
        F.when(e % 6 == 0, F.lit("Porcelain Tile"))
        .when(e % 6 == 1, F.lit("glazed stoneware tile product"))
        .when(e % 6 == 2, F.lit("Marble"))
        .when(e % 6 == 3, F.lit("unknownium"))
        .when(e % 6 == 4, F.lit("")).otherwise(F.lit(None)))
    category = (F.when(e % 5 == 0, F.lit("flooring"))
                .when(e % 5 == 1, F.lit("Flooring"))
                .when(e % 5 == 2, F.lit("FLOORING"))
                .when(e % 5 == 3, F.lit("Wall Covering"))
                .otherwise(F.lit(None)))
    subcategory = (F.when(e % 7 == 0, F.lit("Glazed"))
                   .when(e % 7 == 1, F.lit(""))
                   .when(e % 7 == 2, F.lit(" "))
                   .otherwise(F.lit(None)))
    material_subtype = F.when(e % 3 == 0, F.lit("Legacy Sub")) \
        .otherwise(F.lit(None))
    finish = (F.when(e % 4 == 0, F.lit("Matte"))
              .when(e % 4 == 1, F.lit("matte"))
              .when(e % 4 == 2, F.lit("Glossy")).otherwise(F.lit(None)))
    surface_pattern = (F.when(e % 5 == 0, F.lit("Veined"))
                       .when(e % 5 == 1, F.lit("")).otherwise(F.lit(None)))
    pattern = F.when(e % 2 == 0, F.lit("legacy-marbled")) \
        .otherwise(F.lit(None))
    textures = (F.when(e % 4 == 0, F.array(F.lit("Smooth"),
                                           F.lit("ribbed"), F.lit("")))
                .when(e % 4 == 1, F.array().cast("array<string>"))
                .otherwise(F.lit(None).cast("array<string>")))
    texture = F.when(e % 3 == 1, F.lit("Honed")).otherwise(F.lit(None))
    style = (F.when(e % 6 == 0, F.lit("Modern"))
             .when(e % 6 == 1, F.lit("")).otherwise(F.lit(None)))
    design_style = F.when(e % 2 == 1, F.lit("rustic")) \
        .otherwise(F.lit(None))
    colors = (F.when(e % 4 == 0, F.array(F.lit("Beige"), F.lit("beige"),
                                         F.lit("Grey")))
              .when(e % 4 == 1, F.array().cast("array<string>"))
              .otherwise(F.lit(None).cast("array<string>")))
    color_palette = F.when(e % 3 == 0, F.array(F.lit("Fallback Blue"))) \
        .otherwise(F.lit(None).cast("array<string>"))
    applications = F.when(e % 3 == 0, F.array(
        F.lit("floor"), F.lit("Wall"), F.lit("floor"))) \
        .otherwise(F.lit(None).cast("array<string>"))
    description = (F.when(e % 4 == 0,
                          F.concat(F.lit("short desc "), s(e % 3)))
                   .when(e % 4 == 1,
                         F.concat(F.lit("a considerably longer visual "
                                        "description number "),
                                  s(e % 5)))
                   .otherwise(F.lit(None)))
    detected_text = F.when(e % 5 == 2, F.array(
        F.lit("R9"), F.lit("r9"), F.lit("V2"))) \
        .otherwise(F.lit(None).cast("array<string>"))
    confidence = (F.when(e % 8 == 0, F.lit(0.875))
                  .when(e % 8 == 1, F.lit(0.5))
                  .when(e % 8 == 2, F.lit(0.125))
                  .when(e % 8 == 3, F.lit(1.5))
                  .when(e % 8 == 4, F.lit(0.0))
                  .otherwise(F.lit(None).cast("double")))

    va = F.when(e % 13 != 0, F.struct(
        material_type.alias("material_type"),
        category.alias("category"),
        subcategory.alias("subcategory"),
        material_subtype.alias("material_subtype"),
        finish.alias("finish"),
        surface_pattern.alias("surface_pattern"),
        pattern.alias("pattern"),
        textures.alias("textures"),
        texture.alias("texture"),
        style.alias("style"),
        design_style.alias("design_style"),
        colors.alias("colors"),
        color_palette.alias("color_palette"),
        applications.alias("applications"),
        description.alias("description"),
        detected_text.alias("detected_text"),
        confidence.alias("confidence")))
    # one product per 8 events: per-product image counts stay bounded
    # (real catalogs attach a handful of images per product) and the
    # product count scales with the corpus — the distributed shape the
    # rollup is built for
    return events.select(F.expr("event_id DIV 8").alias("product_id"),
                         e.alias("image_id"), va.alias("va"))


# DuckDB lambda helpers (twin of the Column HOFs above)

def _d_modal(arr: str) -> str:
    return f"""CASE WHEN len({arr}) > 0 THEN
        substring(list_aggregate(list_transform(
            range(1, len({arr}) + 1), i ->
            lpad(CAST(9999 - len(list_filter({arr},
                 x -> x = {arr}[i])) AS VARCHAR), 4, '0')
            || lpad(CAST(i AS VARCHAR), 4, '0')
            || {arr}[i]), 'min'), 9) END"""


def _d_pretty(values: str) -> str:
    win = _d_modal(f"list_transform({values}, v -> lower(trim(v)))")
    return _d_modal(
        f"list_transform(list_filter({values}, "
        f"v -> lower(trim(v)) = ({win})), v -> trim(v))")


def _d_dedupe(values: str, cap: int) -> str:
    folds = f"list_transform({values}, v -> lower(trim(v)))"
    return f"""CASE WHEN len({values}) > 0 THEN
        list_transform(
            list_sort(list_filter(list_transform(
                range(1, len({folds}) + 1), i ->
                CASE WHEN list_position({folds}, ({folds})[i]) = i THEN
                    lpad(CAST(9999 - len(list_filter({folds},
                         f -> f = ({folds})[i])) AS VARCHAR), 4, '0')
                    || lpad(CAST(i AS VARCHAR), 4, '0') END),
                e -> e IS NOT NULL))[1:{cap}],
            e -> trim({values}[CAST(substring(e, 5, 4) AS INTEGER)]))
        ELSE [] END"""


def _d_longest(values: str) -> str:
    return f"""CASE WHEN len({values}) > 0 THEN
        substring(list_aggregate(list_transform(
            range(1, len({values}) + 1), i ->
            lpad(CAST(99999 - length({values}[i]) AS VARCHAR), 5, '0')
            || lpad(CAST(i AS VARCHAR), 4, '0')
            || {values}[i]), 'min'), 10) END"""


SYNTH_VISION_SQL = """
    SELECT event_id // 8 AS product_id, event_id AS image_id,
           CASE WHEN event_id % 13 <> 0 THEN struct_pack(
               material_type := CASE WHEN event_id % 6 = 0 THEN 'Porcelain Tile'
                    WHEN event_id % 6 = 1 THEN 'glazed stoneware tile product'
                    WHEN event_id % 6 = 2 THEN 'Marble'
                    WHEN event_id % 6 = 3 THEN 'unknownium'
                    WHEN event_id % 6 = 4 THEN '' END,
               category := CASE WHEN event_id % 5 = 0 THEN 'flooring'
                    WHEN event_id % 5 = 1 THEN 'Flooring'
                    WHEN event_id % 5 = 2 THEN 'FLOORING'
                    WHEN event_id % 5 = 3 THEN 'Wall Covering' END,
               subcategory := CASE WHEN event_id % 7 = 0 THEN 'Glazed'
                    WHEN event_id % 7 = 1 THEN ''
                    WHEN event_id % 7 = 2 THEN ' ' END,
               material_subtype := CASE WHEN event_id % 3 = 0
                    THEN 'Legacy Sub' END,
               finish := CASE WHEN event_id % 4 = 0 THEN 'Matte'
                    WHEN event_id % 4 = 1 THEN 'matte'
                    WHEN event_id % 4 = 2 THEN 'Glossy' END,
               surface_pattern := CASE WHEN event_id % 5 = 0 THEN 'Veined'
                    WHEN event_id % 5 = 1 THEN '' END,
               pattern := CASE WHEN event_id % 2 = 0
                    THEN 'legacy-marbled' END,
               textures := CASE WHEN event_id % 4 = 0
                    THEN ['Smooth', 'ribbed', '']
                    WHEN event_id % 4 = 1 THEN CAST([] AS VARCHAR[]) END,
               texture := CASE WHEN event_id % 3 = 1 THEN 'Honed' END,
               style := CASE WHEN event_id % 6 = 0 THEN 'Modern'
                    WHEN event_id % 6 = 1 THEN '' END,
               design_style := CASE WHEN event_id % 2 = 1
                    THEN 'rustic' END,
               colors := CASE WHEN event_id % 4 = 0
                    THEN ['Beige', 'beige', 'Grey']
                    WHEN event_id % 4 = 1 THEN CAST([] AS VARCHAR[]) END,
               color_palette := CASE WHEN event_id % 3 = 0
                    THEN ['Fallback Blue'] END,
               applications := CASE WHEN event_id % 3 = 0
                    THEN ['floor', 'Wall', 'floor'] END,
               description := CASE WHEN event_id % 4 = 0
                    THEN 'short desc ' || CAST(event_id % 3 AS VARCHAR)
                    WHEN event_id % 4 = 1
                    THEN 'a considerably longer visual description '
                         || 'number ' || CAST(event_id % 5 AS VARCHAR)
                    END,
               detected_text := CASE WHEN event_id % 5 = 2
                    THEN ['R9', 'r9', 'V2'] END,
               confidence := CASE WHEN event_id % 8 = 0 THEN 0.875
                    WHEN event_id % 8 = 1 THEN 0.5
                    WHEN event_id % 8 = 2 THEN 0.125
                    WHEN event_id % 8 = 3 THEN 1.5
                    WHEN event_id % 8 = 4 THEN 0.0 END)
           END AS va
    FROM events"""


def rollup_sql() -> str:
    """DuckDB twin of rollup_vision over a CTE `vrows(product_id,
    image_id, va)` — staged CTEs keep the lambda expansion bounded."""
    exact = " ".join(f"WHEN k = '{p}' THEN '{v}'"
                     for p, v in VISION_CATEGORY_MAP)
    partial = " ".join(f"WHEN contains(k, '{p}') THEN '{v}'"
                       for p, v in VISION_CATEGORY_MAP)
    clean = (lambda f: f"list_filter(list_transform(list_filter({f}, "
             f"x -> x IS NOT NULL), x -> trim(x)), x -> x <> '')")
    fld = lambda n: f"list_transform(R, rw -> rw.va.{n})"  # noqa: E731
    or_str = (lambda a, b: clean(
        f"list_transform(R, rw -> CASE WHEN rw.va.{a} IS NOT NULL "
        f"AND rw.va.{a} <> '' THEN rw.va.{a} ELSE rw.va.{b} END)"))
    flat_list = (lambda n: f"coalesce(flatten(list_transform(R, rw -> "
                 f"list_filter(list_transform(coalesce(rw.va.{n}, []), "
                 f"x -> trim(x)), x -> x <> ''))), [])")
    # two-phase vote (see rollup_vision): the winning FOLD is staged as
    # a materialized column so the pretty pass never nests the modal
    # expression inside a lambda (the n^6 trap hits DuckDB's inlined
    # CTEs exactly like Catalyst's CollapseProject)
    _wf = (lambda col: _d_modal(
        f"list_transform({col}, v -> lower(trim(v)))"))
    _pf = (lambda col: _d_modal(
        f"list_transform(list_filter({col}, "
        f"v -> lower(trim(v)) = {col}_wf), v -> trim(v))"))
    return f"""
    g AS MATERIALIZED (SELECT product_id,
                 list(struct_pack(image_id := image_id, va := va)
                      ORDER BY image_id) AS R
          FROM vrows WHERE va IS NOT NULL GROUP BY product_id),
    cands AS MATERIALIZED (SELECT product_id,
        {clean(fld('material_type'))} AS mt,
        {clean(fld('category'))} AS cats,
        {or_str('subcategory', 'material_subtype')} AS subs,
        {clean(fld('finish'))} AS fins,
        {or_str('surface_pattern', 'pattern')} AS pats,
        {or_str('style', 'design_style')} AS styles,
        coalesce(flatten(list_transform(R, rw ->
            list_filter(list_transform(coalesce(rw.va.textures, []),
                x -> trim(x)), x -> x <> '')
            || CASE WHEN rw.va.texture IS NOT NULL
                    AND trim(rw.va.texture) <> ''
               THEN [trim(rw.va.texture)] ELSE [] END)), []) AS tex,
        coalesce(flatten(list_transform(R, rw ->
            list_filter(list_transform(
                CASE WHEN rw.va.colors IS NOT NULL
                          AND len(rw.va.colors) > 0 THEN rw.va.colors
                     ELSE coalesce(rw.va.color_palette, []) END,
                x -> trim(x)), x -> x <> ''))), []) AS cols,
        {flat_list('applications')} AS apps,
        {flat_list('detected_text')} AS dtexts,
        {clean(fld('description'))} AS descs,
        list_filter({fld('confidence')},
            c -> c IS NOT NULL AND c >= 0.0 AND c <= 1.0) AS confs
        FROM g),
    winfolds AS MATERIALIZED (SELECT product_id, mt, cats, subs, fins,
        pats, styles, tex, cols, apps, dtexts, descs, confs,
        {_d_modal("list_transform(mt, x -> lower(x))")} AS mt_modal,
        {_wf('cats')} AS cats_wf,
        {_wf('subs')} AS subs_wf,
        {_wf('fins')} AS fins_wf,
        {_wf('pats')} AS pats_wf,
        {_wf('styles')} AS styles_wf,
        {_wf('tex')} AS tex_wf
        FROM cands)
    SELECT product_id,
        CASE WHEN mt_modal IS NOT NULL THEN
            (SELECT CASE {exact} ELSE (
                 CASE {partial} END) END
             FROM (SELECT mt_modal AS k)) END AS material_category,
        {_pf('cats')} AS category,
        {_pf('subs')} AS material_subtype,
        {_pf('subs')} AS subcategory,
        {_pf('fins')} AS finish,
        {_pf('pats')} AS pattern,
        {_d_dedupe('pats', 20)} AS patterns,
        {_pf('tex')} AS texture,
        {_d_dedupe('tex', 10)} AS textures,
        {_pf('styles')} AS design_style,
        {_pf('styles')} AS style,
        {_d_dedupe('cols', 20)} AS appearance_colors,
        {_d_dedupe('apps', 10)} AS applications,
        {_d_longest('descs')} AS vision_description,
        {_d_dedupe('dtexts', 20)} AS detected_text,
        CASE WHEN len(confs) > 0 THEN
            CAST(floor((list_aggregate(list_transform(confs,
                 c -> CAST(c * 8 AS BIGINT)), 'sum') * 1000000)
                 / (8 * len(confs))) AS BIGINT)
        END AS vision_confidence_micro
    FROM winfolds"""
