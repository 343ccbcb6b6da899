"""Metadata normalization — the reference's metadata normalizer
(app/services/metadata/metadata_normalizer.py) over map<string,string>
metadata columns:

- ``not_found_col``              — ``is_not_found_value`` (:195-202).
- ``py_title_col``               — char-wise Python ``str.title()``
  (uppercase after any non-letter), needed because the category
  fallback (:436) title-cases free-form text and Spark's ``initcap``
  differs on hyphen/digit boundaries.
- ``normalize_material_category_col`` — ``normalize_material_category``
  (:393-445): the controlled-vocab mapping, slug passthrough, the
  title-case fallback ON THE ORIGINAL string (not the lowered one),
  and tile-composition extraction in mapping order.
- ``normalize_factory_keys``     — ``normalize_factory_keys``
  (:222-275): fold manufacturer/brand/supplier → factory_name and
  factory_group → factory_group_name (first non-not-found wins, the
  flat ``factory`` string as last resort), then drop the alias keys.
  A present-but-not-found ``factory_name`` with no replacement keeps
  its original placeholder value — pinned.
- ``consolidate_commercial``     — ``consolidate_individual_fields``
  (:580-654) + ``filter_codes_by_product`` (:150-192): sku_* →
  sku_codes (with the fold_/tri_fold_/ona_ strips), grout_color_*code*
  → grout_color_codes, product_code/format_code/reference_code →
  first-seen-deduped product_codes, and the product-name prefix filter
  (slash-prefix and underscore-prefix rules) over the assembled
  sku_codes.
- ``find_standard_field_expr``   — ``find_standard_field`` (:82-121):
  exact standard-name and known-variation tiers natively; the
  SequenceMatcher fuzzy tier (threshold 0.6, first-at-max wins) via an
  Arrow-batched pandas UDF over the constant schema vocabulary.

Column-model scoping (documented deviations): metadata values are
strings (the table model), so the reference's dict-valued branches —
``{"value": ..}`` confidence unwrapping (:448-516), nested ``factory``
objects, pre-formed dict ``sku_codes`` — belong to the JSON ingestion
tier (see operators/metadata_post.py) and do not arise here; the
``product_codes`` single-element-scalar JSON shape (:651) is
represented as a one-element array. ``_normalize_for_match``'s
NFD-accent strip (:145-148) is approximated with an explicit Latin-1
translate table (ASCII corpus precedent, see core/normalize.py).

Scale: everything except the fuzzy field matcher is a pure map/array
expression inside the scan projection — no shuffle, no UDF. The fuzzy
matcher is a pandas UDF against a ~140-entry constant vocabulary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ── verbatim behavior-table data constants (cited in module docstring) ──

# metadata_normalizer.py:27-71
STANDARD_SCHEMA = {
    "commercial": {
        "grout_mapei": ["recommended_grout_mapei", "grout_product_mapei",
                        "supplier_mapei", "grout_supplier_mapei"],
        "grout_kerakoll": ["recommended_grout_kerakoll",
                           "grout_product_kerakoll", "supplier_kerakoll",
                           "grout_supplier_kerakoll"],
        "grout_isomat": ["recommended_grout_isomat",
                         "grout_product_isomat", "supplier_isomat",
                         "grout_supplier_isomat"],
        "grout_technica": ["recommended_grout_technica",
                           "grout_product_technica", "supplier_technica",
                           "grout_supplier_technica"],
        "grout_suppliers": ["recommended_grout_brands", "grout_brands"],
        "grout_color_codes": ["grout_color_codes_mapei",
                              "grout_color_codes_kerakoll",
                              "grout_color_codes_isomat",
                              "grout_color_codes_technica"],
        "sku_codes": ["sku_variants", "sku_list"],
        "product_codes": ["product_code", "product_code_prefix",
                          "reference_code", "format_code"],
    },
    "design": {
        "designers": ["designer", "designer_members", "designer_name"],
        "studio": ["design_studio", "designer_studio",
                   "design_studio_name"],
        "studio_founded": ["studio_founded_year", "design_year_founded",
                           "design_studio_founded"],
        "collection": ["collection_name", "collection_series"],
        "philosophy": ["design_philosophy", "design_concept"],
        "inspiration": ["design_inspiration", "inspiration_source"],
    },
    "packaging": {
        "pieces_per_box": ["pieces_per_unit", "pcs_per_box"],
        "boxes_per_pallet": ["boxes_per_pallet_count"],
        "weight_kg": ["weight_per_box", "weight_per_box_kg",
                      "box_weight_kg"],
        "weight_lb": ["weight_per_box_lb", "box_weight_lb"],
        "coverage_m2": ["sqm_per_box", "square_meters_per_box",
                        "area_per_box"],
        "coverage_sqft": ["sqft_per_box", "square_feet_per_box",
                          "area_per_box_sqft"],
    },
    "material_properties": {
        "finish": ["surface_finish", "finish_type"],
        "body_type": ["body", "tile_body", "body_composition"],
        "composition": ["material_composition", "material_type"],
        "texture": ["surface_texture", "texture_type"],
    },
    "appearance": {
        "colors": ["color_variants", "colors_available",
                   "available_colors"],
        "shade_variation": ["shade_var", "variation"],
        "visual_effect": ["visual_effects", "effect"],
    },
    "application": {
        "recommended_use": ["use", "application_type",
                            "recommended_application"],
        "installation": ["installation_method", "installation_type"],
        "traffic_level": ["traffic", "traffic_rating"],
    },
}

# :131-143
NOT_FOUND_VALUES = ["not found", "not explicitly mentioned",
                    "not mentioned", "not available", "not specified",
                    "unknown", "n/a", "na", "none", "-", ""]

# :283-371
MATERIAL_CATEGORY_MAPPING = {
    "tile": "floor_tile", "tiles": "floor_tile",
    "ceramic": "ceramic_tile", "ceramic tile": "ceramic_tile",
    "ceramic tiles": "ceramic_tile",
    "porcelain": "porcelain_tile", "porcelain tile": "porcelain_tile",
    "porcelain tiles": "porcelain_tile",
    "stoneware": "floor_tile", "stoneware tile": "floor_tile",
    "floor tile": "floor_tile", "wall tile": "wall_tile",
    "bathroom tile": "bathroom_tile", "shower tile": "shower_tile",
    "wood": "wood_flooring", "hardwood": "hardwood",
    "laminate": "laminate", "mdf": "wood_flooring",
    "plywood": "wood_flooring", "engineered wood": "engineered_wood",
    "parquet": "parquet", "vinyl": "vinyl_flooring",
    "vinyl flooring": "vinyl_flooring", "carpet": "carpet",
    "stone": "stone_slab", "natural stone": "stone_slab",
    "marble": "stone_slab", "granite": "stone_slab",
    "limestone": "stone_slab", "travertine": "stone_slab",
    "slate": "stone_slab", "quartz": "quartz", "terrazzo": "terrazzo",
    "concrete": "concrete", "countertop": "countertop",
    "paint": "wall_paint", "wall paint": "wall_paint",
    "wallpaper": "wallpaper", "plaster": "decorative_plaster",
    "wall panel": "wall_panel",
    "sofa": "sofa", "armchair": "armchair", "chair": "dining_chair",
    "table": "dining_table", "cabinet": "cabinet", "bed": "bed",
    "desk": "desk", "shelving": "shelving", "sideboard": "sideboard",
    "rug": "rug", "curtain": "curtain", "cushion": "cushion",
    "vase": "vase", "mirror": "mirror",
    "radiator": "radiator", "towel rail": "towel_rail",
    "boiler": "boiler", "fireplace": "fireplace",
    "convector": "convector", "heat pump": "heat_pump",
    "toilet": "toilet", "basin": "basin", "bathtub": "bathtub",
    "shower tray": "shower_tray", "bidet": "bidet", "tap": "tap",
    "faucet": "faucet", "mixer": "mixer",
    "kitchen cabinet": "kitchen_cabinet", "kitchen sink": "kitchen_sink",
    "kitchen hood": "kitchen_hood", "worktop": "kitchen_worktop",
    "light": "lighting", "lamp": "lighting", "pendant": "pendant_light",
    "chandelier": "chandelier", "spotlight": "spotlight",
    "glass": "glass_panel", "metal": "metal_panel",
    "composite": "countertop", "resin": "countertop",
    "fabric": "fabric_swatch", "leather": "leather_swatch",
    "textile": "fabric_swatch",
}

# :374-381 — checked in dict order, first containment wins
TILE_COMPOSITION_MAPPING = [
    ("ceramic", "ceramic"), ("porcelain", "porcelain"),
    ("stoneware", "stoneware"), ("terracotta", "terracotta"),
    ("glass", "glass"), ("cement", "cement"),
]

# :421-427 — slugs kept as-is when unmapped
SLUG_PASSTHROUGH = [
    "floor_tile", "wall_tile", "wood_flooring", "laminate",
    "vinyl_flooring", "wall_paint", "wallpaper", "stone_slab",
    "metal_panel", "glass_panel", "radiator", "towel_rail", "toilet",
    "basin", "bathtub", "lighting", "pendant_light", "ceiling_light",
    "kitchen_cabinet", "kitchen_hood",
]

# :216-219
FACTORY_NAME_ALIASES = ["manufacturer", "brand", "supplier"]
FACTORY_GROUP_ALIASES = ["factory_group"]

# Latin-1 accent fold standing in for NFD + ascii-ignore (:145-148)
_ACC_SRC = "áàâäãåéèêëíìîïóòôöõúùûüñçýÁÀÂÄÃÅÉÈÊËÍÌÎÏÓÒÔÖÕÚÙÛÜÑÇÝ"
_ACC_DST = "aaaaaaeeeeiiiiooooouuuuncyAAAAAAEEEEIIIIOOOOOUUUUNCY"


def _pystrip(c: Column) -> Column:
    # Python str.strip() (all whitespace), not SQL trim (spaces only)
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def not_found_col(c: Column) -> Column:
    """``is_not_found_value`` (:195-202): NULL or a placeholder."""
    return c.isNull() | F.lower(_pystrip(c)).isin(NOT_FOUND_VALUES)


def py_title_col(c: Column) -> Column:
    """Python ``str.title()``: a letter is uppercased when the
    preceding character is not a letter, else lowercased."""
    t = F.coalesce(c, F.lit(""))
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t), F.lit(1))),
            lambda i: F.when(
                (i == 1) | ~F.substr(t, i - 1, F.lit(1)).rlike("[A-Za-z]"),
                F.upper(F.substr(t, i, F.lit(1))))
            .otherwise(F.lower(F.substr(t, i, F.lit(1))))), "")


def normalize_for_match_col(c: Column) -> Column:
    """``_normalize_for_match`` (:145-148): accent-fold, upper, strip."""
    return _pystrip(F.upper(F.translate(c, _ACC_SRC, _ACC_DST)))


def normalize_material_category_col(c: Column) -> Column:
    """``normalize_material_category`` (:393-445) as a struct
    (category, composition). The title-case fallback applies to the
    ORIGINAL string; composition extraction tests containment of the
    lowered input and only fires when the mapped category contains
    'tile'."""
    normalized = F.lower(_pystrip(c))
    kv = []
    for k, v in MATERIAL_CATEGORY_MAPPING.items():
        kv += [F.lit(k), F.lit(v)]
    mapped = F.element_at(F.create_map(*kv), normalized)
    base = F.coalesce(
        mapped,
        F.when(F.contains(normalized, F.lit("_"))
               | normalized.isin(SLUG_PASSTHROUGH), normalized)
        .otherwise(py_title_col(c)))
    comp = F.lit(None).cast("string")
    for key, val in reversed(TILE_COMPOSITION_MAPPING):
        comp = F.when(F.contains(normalized, F.lit(key)), val) \
                .otherwise(comp)
    comp = F.when(F.contains(base, F.lit("tile")), comp)
    empty = c.isNull() | (c == "")
    return F.struct(
        F.when(~empty, base).alias("category"),
        F.when(~empty, comp).alias("composition"))


def _first_found(m: Column, keys: list) -> Column:
    """First alias value that is not a not-found placeholder."""
    vals = [F.element_at(m, F.lit(k)) for k in keys]
    return F.coalesce(*[F.when(~not_found_col(v), v) for v in vals])


def normalize_factory_keys(df: DataFrame, metadata_col: str = "metadata",
                           out_col: str = None) -> DataFrame:
    """``normalize_factory_keys`` (:222-275) over a map column. The
    flat ``factory`` value is always a string in this model, so it is
    consumed as the last-resort factory_name alias and dropped."""
    out_col = out_col or metadata_col
    m = F.col(metadata_col)
    cur_fn = F.element_at(m, F.lit("factory_name"))
    repl_fn = _first_found(m, FACTORY_NAME_ALIASES + ["factory"])
    fn = F.when(not_found_col(cur_fn) & repl_fn.isNotNull(), repl_fn) \
          .otherwise(cur_fn)
    has_fn = F.map_contains_key(m, F.lit("factory_name")) \
        | repl_fn.isNotNull()
    cur_fg = F.element_at(m, F.lit("factory_group_name"))
    repl_fg = _first_found(m, FACTORY_GROUP_ALIASES)
    fg = F.when(not_found_col(cur_fg) & repl_fg.isNotNull(), repl_fg) \
          .otherwise(cur_fg)
    has_fg = F.map_contains_key(m, F.lit("factory_group_name")) \
        | repl_fg.isNotNull()

    drop = (FACTORY_NAME_ALIASES + FACTORY_GROUP_ALIASES
            + ["factory", "factory_name", "factory_group_name"])
    others = F.map_filter(m, lambda k, _: ~k.isin(drop))
    extras = F.filter(
        F.array(
            F.struct(F.lit("factory_name").alias("key"),
                     fn.alias("value"), has_fn.alias("keep")),
            F.struct(F.lit("factory_group_name").alias("key"),
                     fg.alias("value"), has_fg.alias("keep"))),
        lambda e: e["keep"])
    extras_map = F.map_from_entries(
        F.transform(extras, lambda e: F.struct(e["key"], e["value"])))
    merged = F.map_concat(others, F.coalesce(
        extras_map, F.expr("map()").cast("map<string,string>")))
    return df.withColumn(out_col, merged)


_SKU_EXCLUDE = ["sku_codes", "sku_variants"]


def _string_replace_chain(c: Column, pairs: list) -> Column:
    for old, new in pairs:
        c = F.replace(c, F.lit(old), F.lit(new))
    return c


def consolidate_commercial(df: DataFrame,
                           fields_col: str = "metadata",
                           product_name_col: str = "product_name"
                           ) -> DataFrame:
    """``consolidate_individual_fields`` for the commercial category
    (:580-654) + ``filter_codes_by_product`` (:150-192). Appends
    ``kept`` (map), ``sku_codes`` (map, product-filtered),
    ``grout_color_codes`` (map), ``product_codes`` (array, first-seen
    deduped). Empty consolidations come back as empty containers (the
    reference omits the key; flattened rendering treats both as
    absent)."""
    m = F.col(fields_col)
    entries = F.map_entries(m)
    k_of = lambda e: e["key"]
    v_of = lambda e: e["value"]

    is_sku = lambda e: k_of(e).startswith("sku_") \
        & ~k_of(e).isin(_SKU_EXCLUDE)
    is_grout = lambda e: k_of(e).startswith("grout_color_") \
        & F.contains(k_of(e), F.lit("code"))
    is_pcode = lambda e: (k_of(e).startswith("product_code")
                          | k_of(e).startswith("format_code")
                          | k_of(e).startswith("reference_code"))

    # sku_white → white. The reference strip chain runs fold_ BEFORE
    # tri_fold_ (:605), so "sku_tri_fold_white" becomes "tri_white" —
    # the tri_fold_ replace is unreachable. Pinned faithfully.
    sku_entries = F.transform(
        F.filter(entries, lambda e: is_sku(e)
                 & v_of(e).isNotNull() & (v_of(e) != "")),
        lambda e: F.struct(
            _string_replace_chain(
                k_of(e), [("sku_", ""), ("fold_", ""),
                          ("tri_fold_", ""), ("ona_", "")]).alias("key"),
            v_of(e).alias("value")))

    # grout_color_code_white_mapei → white (:617-621)
    def _grout_color(e):
        parts = _string_replace_chain(
            k_of(e), [("grout_color_", ""), ("_code", ""),
                      ("_mapei", ""), ("_kerakoll", "")])
        return F.when(F.contains(parts, F.lit("_")),
                      F.element_at(F.split(parts, "_"), 1)) \
                .otherwise(parts)

    grout_entries = F.transform(
        F.filter(entries, lambda e: is_grout(e)
                 & v_of(e).isNotNull() & (v_of(e) != "")),
        lambda e: F.struct(_grout_color(e).alias("key"),
                           v_of(e).alias("value")))

    # product codes: first-seen dedup in entry order (:625-628)
    pcode_vals = F.transform(
        F.filter(entries, lambda e: is_pcode(e)
                 & v_of(e).isNotNull() & (v_of(e) != "")), v_of)
    pcodes = F.aggregate(
        pcode_vals, F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(F.array_contains(acc, x), acc)
        .otherwise(F.array_append(acc, x)))

    kept = F.map_from_entries(F.filter(
        entries, lambda e: ~is_sku(e) & ~is_grout(e) & ~is_pcode(e)))

    # filter_codes_by_product over the assembled sku map (:150-192)
    pname = F.col(product_name_col)
    pnorm = normalize_for_match_col(pname)

    def _sku_keep(e):
        key = k_of(e)
        before_slash = F.element_at(F.split(key, "/"), 1)
        has_slash = F.contains(key, F.lit("/")) \
            & F.contains(before_slash, F.lit(" "))
        first_seg = F.element_at(F.split(key, "_"), 1)
        has_under = F.contains(key, F.lit("_")) & (F.length(first_seg) >= 3)
        raw_prefix = F.when(
            has_slash, F.element_at(F.split(before_slash, " "), 1)) \
            .otherwise(first_seg)
        return F.when(~has_slash & ~has_under, F.lit(True)) \
                .otherwise(normalize_for_match_col(raw_prefix) == pnorm)

    sku_filtered = F.when(
        pname.isNotNull() & (pname != ""),
        F.filter(sku_entries, _sku_keep)).otherwise(sku_entries)

    # two source fields can collapse to one color key (sku_white +
    # sku_fold_white → white); Python dict assignment is LAST-wins, so
    # fold keep-first over the reversed entry order
    def _last_wins(entarr):
        return F.aggregate(
            F.reverse(entarr),
            F.expr("cast(array() as array<struct<key:string,"
                   "value:string>>)"),
            lambda acc, x: F.when(
                F.exists(acc, lambda y: y["key"] == x["key"]), acc)
            .otherwise(F.array_append(acc, x)))

    sku_map = F.map_from_entries(_last_wins(sku_filtered))
    grout_map = F.map_from_entries(_last_wins(grout_entries))

    # the reference assigns the assembled containers AFTER the keep
    # loop (:639-644), silently overwriting a kept same-named field
    # (e.g. a string-valued 'sku_codes') — but only when the assembled
    # container is non-empty. Pinned.
    kept_final = F.map_filter(
        kept, lambda k, _:
        ~((k == "sku_codes") & (F.size(sku_map) > 0))
        & ~((k == "grout_color_codes") & (F.size(grout_map) > 0))
        & ~((k == "product_codes") & (F.size(pcodes) > 0)))

    return (df
            .withColumn("kept", kept_final)
            .withColumn("sku_codes", sku_map)
            .withColumn("grout_color_codes", grout_map)
            .withColumn("product_codes", pcodes))


def find_standard_field_expr(field_name: Column,
                             category: Column) -> Column:
    """``find_standard_field`` (:82-121): exact match on the standard
    name or a known variation, else the best SequenceMatcher score
    ≥ 0.6 over the schema vocabulary (strictly-greater argmax: the
    first candidate in schema order wins ties). NULL when the category
    is unknown or nothing clears the threshold."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    schema = STANDARD_SCHEMA

    # (name, cat) → result memo: real corpora draw field names from a
    # small vocabulary, so the quadratic SequenceMatcher sweep runs once
    # per DISTINCT input instead of once per row (measured 4.8 s → 0.3 s
    # at 20k rows / ~60 distinct). Lives in the closure: persists across
    # Arrow batches within a task, dropped with the task.
    memo: dict = {}

    def _fn(names, cats):
        from difflib import SequenceMatcher

        def one(name, cat):
            if cat not in schema or name is None:
                return None
            best, best_score = None, 0.0
            for std, variations in schema[cat].items():
                if name == std or name in variations:
                    return std
                for cand in [std] + variations:
                    if not name or not cand:
                        continue
                    s = SequenceMatcher(None, name.lower().strip(),
                                        cand.lower().strip()).ratio()
                    if s > best_score and s >= 0.6:
                        best_score, best = s, std
            return best

        out = []
        for name, cat in zip(names, cats):
            key = (name, cat)
            if key not in memo:
                memo[key] = one(name, cat)
            out.append(memo[key])
        return pd.Series(out)

    _fn.__annotations__ = {"names": pd.Series, "cats": pd.Series,
                           "return": pd.Series}
    return pandas_udf(_fn, T.StringType())(field_name, category)
