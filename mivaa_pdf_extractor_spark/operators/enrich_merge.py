"""Enrichment merge — provenance-tagged fill-if-empty over metadata.

Re-expresses ``_merge_enriched_fields_into_metadata``
(reference stage_4_products.py:2154-2270), the glue that folds the
chunk-regex candidates (operators/enrich) and the vision rollup
(operators/vision) into a product's metadata:

- fills only where the existing value is ``_is_empty_value``-empty
  (:1583-1597 — NULL/''/placeholder strings); confident AI values are
  never overwritten; a present-but-placeholder value IS overwritten
  while an untouched placeholder survives verbatim.
- the fill LADDER ORDER is the reference's exact call sequence — the
  returned ``filled`` list pins it, including the interleaved drop
  markers.
- provenance: every filled path gets {source, confidence} — 0.90 for
  regular fills, 0.95 for the dimensions special case, 0.85 for
  appearance.colors_from_vision (:2182-2189, :2211-2214, :2259-2264).
- dimensions special case: filling chunk dimensions DROPS a present
  ``available_sizes`` key (even an empty one — the reference tests
  ``"available_sizes" in new_metadata``) and appends the literal
  marker ``(dropped stale available_sizes)`` (:2210-2222).
- designers-plural fill drops a stale scalar ``designer`` key with
  its own marker (:2224-2234). SIMPLIFICATION (documented): the
  reference also type-checks ``isinstance(new_metadata['designers'],
  list)``; this schema types the designers slot as a list-encoded
  string, so the check reduces to non-emptiness.
- vision colors land under ``appearance.colors_from_vision`` so they
  never clobber text-extracted ``colors_from_chunks`` (:2253-2264).

Output per product: the ``filled`` array (ladder order), the
provenance array (``path=source@confidence_pct``, same order), and the
final metadata flattened to a SORTED ``path=value`` array — dropped
keys absent, untouched keys (including untouched placeholders)
verbatim.

Scale: a pure map-only projection over the (product x candidates)
join — candidates arrive keyed by product_id from the mining and
vision tiers, so composing the full enrichment is two co-partitioned
joins and zero extra shuffles. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mivaa_pdf_extractor_spark.operators.propagate import (
    _empty_sql, is_empty_col)

# (path, candidate column, source, confidence_pct)
# container paths are 'container.key'; order IS the reference ladder.
CHUNK_LADDER = (
    ("factory_name", "cc_factory_name", "chunk_regex", 90),
    ("designers", "cc_designers", "chunk_regex", 90),
    ("collection", "cc_collection", "chunk_regex", 90),
    ("design.inspiration", "cc_inspiration", "chunk_regex", 90),
    ("packaging.pieces_per_box", "cc_pieces", "chunk_regex", 90),
    ("packaging.patterns_count", "cc_patterns", "chunk_regex", 90),
    ("material_properties.body_type", "cc_body_type", "chunk_regex", 90),
    ("commercial.sku_codes", "cc_sku_codes", "chunk_regex", 90),
    ("commercial.grout_suppliers", "cc_grout_suppliers",
     "chunk_regex", 90),
    ("commercial.grout_color_codes", "cc_grout_color_codes",
     "chunk_regex", 90),
    ("commercial.grout_mapei", "cc_grout_mapei", "chunk_regex", 90),
    ("commercial.grout_kerakoll", "cc_grout_kerakoll",
     "chunk_regex", 90),
    ("commercial.grout_isomat", "cc_grout_isomat", "chunk_regex", 90),
    ("commercial.grout_technica", "cc_grout_technica",
     "chunk_regex", 90),
)
VISION_LADDER = (
    ("material_category", "vc_material_category", "vision_rollup", 90),
    ("material_properties.finish", "vc_finish", "vision_rollup", 90),
    ("material_properties.material_subtype", "vc_material_subtype",
     "vision_rollup", 90),
    ("appearance.pattern", "vc_pattern", "vision_rollup", 90),
    ("appearance.patterns", "vc_patterns", "vision_rollup", 90),
    ("appearance.texture", "vc_texture", "vision_rollup", 90),
    ("appearance.textures", "vc_textures", "vision_rollup", 90),
    ("design.design_style", "vc_design_style", "vision_rollup", 90),
    ("design.style", "vc_style", "vision_rollup", 90),
    ("applications", "vc_applications", "vision_rollup", 90),
    ("appearance.category", "vc_category", "vision_rollup", 90),
    ("appearance.subcategory", "vc_subcategory", "vision_rollup", 90),
    ("appearance.vision_description", "vc_vision_description",
     "vision_rollup", 90),
    ("appearance.detected_text", "vc_detected_text",
     "vision_rollup", 90),
    ("vision_confidence", "vc_vision_confidence", "vision_rollup", 90),
)

# every metadata path the twin tracks (ladder paths + untouched ones)
SCALAR_KEYS = ("factory_name", "designers", "designer", "collection",
               "dimensions", "available_sizes", "material_category",
               "applications", "vision_confidence", "notes")
CONTAINERS = {
    "design": ("inspiration", "design_style", "style"),
    "packaging": ("pieces_per_box", "patterns_count"),
    "material_properties": ("body_type", "finish", "material_subtype"),
    "commercial": ("sku_codes", "grout_suppliers", "grout_color_codes",
                   "grout_mapei", "grout_kerakoll", "grout_isomat",
                   "grout_technica"),
    "appearance": ("pattern", "patterns", "texture", "textures",
                   "category", "subcategory", "vision_description",
                   "detected_text", "colors_from_vision",
                   "colors_from_chunks"),
}


def _cur(path: str) -> Column:
    if "." in path:
        c, k = path.split(".")
        return F.col(c)[k]
    return F.col("metadata")[path]


def _present(path: str) -> Column:
    if "." in path:
        c, k = path.split(".")
        return F.map_contains_key(F.col(c), k)
    return F.map_contains_key(F.col("metadata"), path)


def merge_enriched(joined: DataFrame) -> DataFrame:
    """Expects per product: product_id, metadata map, container maps
    (design/packaging/material_properties/commercial/appearance), the
    cc_* chunk-candidate columns and vc_* vision-candidate columns
    (all string-encoded; list candidates are ';'-joined)."""
    fills: dict[str, Column] = {}
    markers: list[Column] = []
    prov: list[Column] = []

    def step(path, cand_col, source, conf):
        cand = F.col(cand_col)
        flag = ~is_empty_col(cand) & is_empty_col(_cur(path))
        fills[path] = (flag, cand)
        markers.append(F.when(flag, F.lit(path)))
        prov.append(F.when(flag, F.lit(f"{path}={source}@{conf}")))

    for path, cand, src, conf in CHUNK_LADDER:
        step(path, cand, src, conf)

    # dimensions special case + stale available_sizes drop (:2210-2222)
    dims_flag = (~is_empty_col(F.col("cc_dimensions"))
                 & is_empty_col(_cur("dimensions")))
    fills["dimensions"] = (dims_flag, F.col("cc_dimensions"))
    markers.append(F.when(dims_flag, F.lit("dimensions")))
    prov.append(F.when(dims_flag, F.lit("dimensions=chunk_regex@95")))
    drop_avail = dims_flag & _present("available_sizes")
    markers.append(F.when(drop_avail,
                          F.lit("(dropped stale available_sizes)")))

    # designers-plural drops the stale scalar (:2224-2234)
    designers_final = F.when(fills["designers"][0],
                             fills["designers"][1]) \
        .otherwise(_cur("designers"))
    drop_designer = (~is_empty_col(F.col("cc_designers"))
                     & designers_final.isNotNull()
                     & (designers_final != "")
                     & _present("designer"))
    markers.append(F.when(drop_designer,
                          F.lit("(dropped stale designer scalar)")))

    for path, cand, src, conf in VISION_LADDER:
        step(path, cand, src, conf)

    # appearance.colors_from_vision (:2253-2264)
    cv_flag = (~is_empty_col(F.col("vc_appearance_colors"))
               & is_empty_col(_cur("appearance.colors_from_vision")))
    fills["appearance.colors_from_vision"] = (
        cv_flag, F.col("vc_appearance_colors"))
    markers.append(F.when(cv_flag,
                          F.lit("appearance.colors_from_vision")))
    prov.append(F.when(cv_flag,
                       F.lit("appearance.colors_from_vision="
                             "vision_rollup@85")))

    # final flattened metadata: filled value, else original (verbatim,
    # placeholders included); dropped keys absent; untouched keys kept
    kv: list[Column] = []

    def final_of(path):
        if path in fills:
            flag, cand = fills[path]
            val = F.when(flag, cand).otherwise(_cur(path))
            present = _present(path) | flag
        else:
            val = _cur(path)
            present = _present(path)
        return val, present

    all_paths = list(SCALAR_KEYS) + [
        f"{c}.{k}" for c, ks in CONTAINERS.items() for k in ks]
    for path in all_paths:
        val, present = final_of(path)
        if path == "available_sizes":
            present = present & ~drop_avail
        if path == "designer":
            present = present & ~drop_designer
        kv.append(F.when(present,
                         F.concat(F.lit(path + "="),
                                  F.coalesce(val, F.lit("")))))

    return joined.select(
        "product_id",
        F.array_compact(F.array(*markers)).alias("filled"),
        F.array_compact(F.array(*prov)).alias("provenance"),
        F.array_sort(F.array_compact(F.array(*kv))).alias("final_kv"))


# ---------------------------------------------------------------------------
# deterministic synthesizer + DuckDB twin
# ---------------------------------------------------------------------------

# synth spec shared by the Spark synthesizer and the DuckDB twin:
# map fields cycle over (value list) on event_id % mod; slots beyond the
# list are ABSENT (key missing). Candidate columns cycle with None = NULL.
MAP_SPEC = {
    "metadata": (
        ("factory_name", 4, ("ExistingCo", "N/A", "")),
        ("designers", 5, ("Jane Doe", "not found")),
        ("designer", 3, ("Old Scalar", "")),
        ("collection", 6, ("Valenova", "unknown", "")),
        ("dimensions", 5, ("60x60", "none")),
        ("available_sizes", 3, ("10x10", "")),
        ("material_category", 7, ("wall_tile", "N/A")),
        ("applications", 8, ("floor", "")),
        ("vision_confidence", 9, ("990000",)),
        ("notes", 2, ("keep me",)),
    ),
    "design": (
        ("inspiration", 4, ("the sea", "n/a")),
        ("design_style", 5, ("modern",)),
        ("style", 6, ("",)),
    ),
    "packaging": (
        ("pieces_per_box", 3, ("12", "")),
        ("patterns_count", 4, ("not mentioned",)),
    ),
    "material_properties": (
        ("body_type", 3, ("red body", "")),
        ("finish", 4, ("Matte", "unknown")),
        ("material_subtype", 5, ("",)),
    ),
    "commercial": (
        ("sku_codes", 4, ("OLD=1", "")),
        ("grout_suppliers", 5, ("ISOMAT",)),
        ("grout_color_codes", 6, ("",)),
        ("grout_mapei", 7, ("OLD MAPEI",)),
        ("grout_kerakoll", 8, ("",)),
        ("grout_isomat", 9, ("n/a",)),
        ("grout_technica", 10, ("",)),
    ),
    "appearance": (
        ("pattern", 3, ("veined", "")),
        ("patterns", 4, ("veined;marbled",)),
        ("texture", 5, ("",)),
        ("textures", 6, ("smooth",)),
        ("category", 7, ("",)),
        ("subcategory", 8, ("glazed",)),
        ("vision_description", 9, ("",)),
        ("detected_text", 10, ("R9",)),
        ("colors_from_vision", 11, ("",)),
        ("colors_from_chunks", 4, ("beige;grey",)),
    ),
}
CAND_SPEC = (
    ("cc_factory_name", 3, ("Harmony", None, "")),
    ("cc_designers", 4, ("Stacy Garcia", None)),
    ("cc_collection", 5, ("Naxos", None)),
    ("cc_inspiration", 6, ("city lights", None)),
    ("cc_pieces", 7, ("9", None)),
    ("cc_patterns", 8, ("4", None)),
    ("cc_body_type", 9, ("white body tile", None)),
    ("cc_sku_codes", 4, ("VALENOVA WHITE=39650", None)),
    ("cc_grout_suppliers", 5, ("KERAKOLL;MAPEI", None)),
    ("cc_grout_color_codes", 6, ("39650:Mapei:100", None)),
    ("cc_grout_mapei", 7, ("ULTRACOLOR PLUS 111", None)),
    ("cc_grout_kerakoll", 8, ("FUGABELLA", None)),
    ("cc_grout_isomat", 9, ("MULTIFILL", None)),
    ("cc_grout_technica", 10, (None, "TQ FLEX")),
    ("cc_dimensions", 3, ("11.8x11.8|4.65x4.65|Q59", None, "")),
    ("vc_material_category", 4, ("porcelain_tile", None)),
    ("vc_finish", 5, ("Matte", None)),
    ("vc_material_subtype", 6, ("Glazed", None)),
    ("vc_pattern", 7, ("Veined", None)),
    ("vc_patterns", 8, ("Veined;Marbled", None)),
    ("vc_texture", 9, ("Smooth", None)),
    ("vc_textures", 10, ("Smooth;Honed", None)),
    ("vc_design_style", 3, ("rustic", None)),
    ("vc_style", 4, ("rustic", None)),
    ("vc_applications", 5, ("floor;Wall", None)),
    ("vc_category", 6, ("Flooring", None)),
    ("vc_subcategory", 7, ("Glazed", None)),
    ("vc_vision_description", 8, ("a long visual description", None)),
    ("vc_detected_text", 9, ("R9;V2", None)),
    ("vc_vision_confidence", 10, ("687500", None)),
    ("vc_appearance_colors", 11, ("Beige;Grey", None)),
)


def synth_enrich_inputs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    ABSENT = "\x00"

    def cyc(mod, vals):
        c = None
        for i, v in enumerate(vals):
            cond = e % mod == i
            lit = F.lit(v) if v is not None else F.lit(None)
            c = F.when(cond, lit) if c is None else c.when(cond, lit)
        return c.otherwise(F.lit(None))

    def map_col(entries):
        keys = F.array(*[F.lit(k) for k, _, _ in entries])
        vals = []
        for _, mod, vlist in entries:
            c = None
            for i, v in enumerate(vlist):
                cond = e % mod == i
                c = (F.when(cond, F.lit(v)) if c is None
                     else c.when(cond, F.lit(v)))
            vals.append(c.otherwise(F.lit(ABSENT)))
        m = F.map_from_arrays(keys, F.array(*vals))
        return F.map_filter(m, lambda k, v: v != ABSENT)

    cols = [e.alias("product_id")]
    cols += [map_col(entries).alias(name)
             for name, entries in MAP_SPEC.items()]
    cols += [cyc(mod, vals).alias(name)
             for name, mod, vals in CAND_SPEC]
    return events.select(*cols)


def synth_enrich_sql() -> str:
    def sq(v):
        return "'" + v.replace("'", "''") + "'"

    map_cols = []
    for name, entries in MAP_SPEC.items():
        keys = ", ".join(sq(k) for k, _, _ in entries)
        vals = []
        for _, mod, vlist in entries:
            whens = " ".join(
                f"WHEN event_id % {mod} = {i} THEN {sq(v)}"
                for i, v in enumerate(vlist))
            vals.append(f"CASE {whens} ELSE chr(1) END")
        map_cols.append(
            f"map_from_entries(list_filter(list_zip([{keys}], "
            f"[{', '.join(vals)}]), z -> z[2] <> chr(1))) AS {name}")
    cand_cols = []
    for name, mod, vals in CAND_SPEC:
        whens = " ".join(
            f"WHEN event_id % {mod} = {i} THEN "
            + (sq(v) if v is not None else "NULL")
            for i, v in enumerate(vals))
        cand_cols.append(f"CASE {whens} ELSE NULL END AS {name}")
    return ("SELECT event_id AS product_id,\n           "
            + ",\n           ".join(map_cols + cand_cols)
            + "\n    FROM events")


def merge_sql() -> str:
    """DuckDB twin of merge_enriched over a CTE `inputs` shaped like
    synth_enrich_inputs — generated from the same ladder tables."""
    def cur(path):
        if "." in path:
            c, k = path.split(".")
            return f"{c}['{k}'][1]"
        return f"metadata['{path}'][1]"

    def present(path):
        if "." in path:
            c, k = path.split(".")
            return f"list_contains(map_keys({c}), '{k}')"
        return f"list_contains(map_keys(metadata), '{path}')"

    fills = {}
    markers = []
    prov = []

    def step(path, cand, source, conf):
        flag = (f"(NOT {_empty_sql(cand)} "
                f"AND {_empty_sql(cur(path))})")
        fills[path] = (flag, cand)
        markers.append(f"CASE WHEN {flag} THEN '{path}' END")
        prov.append(f"CASE WHEN {flag} THEN '{path}={source}@{conf}' "
                    f"END")

    for path, cand, src, conf in CHUNK_LADDER:
        step(path, cand, src, conf)

    dims_flag = (f"(NOT {_empty_sql('cc_dimensions')} "
                 f"AND {_empty_sql(cur('dimensions'))})")
    fills["dimensions"] = (dims_flag, "cc_dimensions")
    markers.append(f"CASE WHEN {dims_flag} THEN 'dimensions' END")
    prov.append(f"CASE WHEN {dims_flag} THEN "
                f"'dimensions=chunk_regex@95' END")
    drop_avail = f"({dims_flag} AND {present('available_sizes')})"
    markers.append(f"CASE WHEN {drop_avail} THEN "
                   f"'(dropped stale available_sizes)' END")

    dflag, dcand = fills["designers"]
    designers_final = (f"(CASE WHEN {dflag} THEN {dcand} "
                       f"ELSE {cur('designers')} END)")
    drop_designer = (f"(NOT {_empty_sql('cc_designers')} "
                     f"AND {designers_final} IS NOT NULL "
                     f"AND {designers_final} <> '' "
                     f"AND {present('designer')})")
    markers.append(f"CASE WHEN {drop_designer} THEN "
                   f"'(dropped stale designer scalar)' END")

    for path, cand, src, conf in VISION_LADDER:
        step(path, cand, src, conf)

    cv_flag = (f"(NOT {_empty_sql('vc_appearance_colors')} AND "
               f"{_empty_sql(cur('appearance.colors_from_vision'))})")
    fills["appearance.colors_from_vision"] = (cv_flag,
                                              "vc_appearance_colors")
    markers.append(f"CASE WHEN {cv_flag} THEN "
                   f"'appearance.colors_from_vision' END")
    prov.append(f"CASE WHEN {cv_flag} THEN "
                f"'appearance.colors_from_vision=vision_rollup@85' END")

    kv = []
    all_paths = list(SCALAR_KEYS) + [
        f"{c}.{k}" for c, ks in CONTAINERS.items() for k in ks]
    for path in all_paths:
        if path in fills:
            flag, cand = fills[path]
            val = f"(CASE WHEN {flag} THEN {cand} ELSE {cur(path)} END)"
            pres = f"({present(path)} OR {flag})"
        else:
            val = cur(path)
            pres = present(path)
        if path == "available_sizes":
            pres = f"({pres} AND NOT {drop_avail})"
        if path == "designer":
            pres = f"({pres} AND NOT {drop_designer})"
        kv.append(f"CASE WHEN {pres} THEN '{path}=' "
                  f"|| coalesce({val}, '') END")

    def arr(items):
        return ("list_filter([" + ", ".join(items)
                + "], x -> x IS NOT NULL)")

    return f"""
    SELECT product_id,
           {arr(markers)} AS filled,
           {arr(prov)} AS provenance,
           list_sort({arr(kv)}) AS final_kv
    FROM inputs"""
