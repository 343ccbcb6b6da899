"""Category field registry + prompt-section builders — the Spark form
of app/services/metadata/category_field_registry.py.

The reference keeps a ~900-line nested dict of per-category extraction
fields and four helpers that render prompt sections from it
(:922-981). Here the registry is a ROW TABLE (category, section,
positions, field key/desc) — the natural shape for joining against a
product batch — and the builders are groupBy string aggregations that
reproduce the reference's formatting byte-for-byte:

- ``get_category_config`` falls back to general_materials for unknown
  keys (:922-928);
- ``get_priority_fields_for_prompt`` (:935-954): the two header lines,
  a blank line, then per section ``**Title Cased Label:**`` and
  ``- key: desc`` lines, each section followed by a blank line (so the
  text ends with a newline);
- ``get_extraction_hints_for_prompt`` (:956-969): a header line plus
  ``- hint`` lines; empty hints render as an empty string;
- ``get_skip_fields`` / ``get_controlled_vocab`` (:972-981) pass the
  pinned lists through.

Data scope: the ``tiles`` and ``general_materials`` entries are pinned
VERBATIM (field keys, descriptions, hints, skip lists, vocab) —
general_materials because it is the fallback, tiles because it is the
largest and the golden category. The remaining eight reference
categories (wood, decor, furniture, paint_wall_decor, heating,
sanitary, kitchen, lighting) are rows of exactly the same shape with
no new mechanics; extending the table is data entry.

Scale: the registry is a broadcast dimension (hundreds of rows); the
builders collapse it to one row per category before joining products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

FALLBACK_CATEGORY = "general_materials"

DISPLAY_NAMES = {
    "tiles": "Tiles",
    "general_materials": "General Materials",
}

# (category, section, sec_pos, field_pos, key, desc) — insertion order
# of the reference dicts is the position
_TILES_FIELDS = {
    "material_properties": [
        ("body_type", "Body type (e.g. white body, full body, red body)"),
        ("finish", "Surface finish (matte, gloss, polished, lappato, structured)"),
        ("material_subtype", "Subtype (glazed, unglazed, through-body, double-fired)"),
        ("thickness_mm", "Tile thickness in mm"),
        ("thickness_inch", "Tile thickness in inches"),
        ("rectified", "Whether tile is rectified (yes/no)"),
    ],
    "dimensions": [
        ("available_sizes", "All available tile formats as array, e.g. ['60x60 cm', '30x60 cm']"),
        ("format_code", "Factory format code (e.g. Q59, R10)"),
    ],
    "appearance": [
        ("colors", "Array of available color names"),
        ("primary_color_hex", "Primary hex color code"),
        ("patterns", "Array of patterns (solid, veined, geometric, 3D relief, etc.)"),
        ("texture", "Surface texture description"),
        ("shade_variation", "Shade variation V-rating (V1, V2, V3, V4)"),
        ("visual_effect", "Visual effect description (e.g. marble-look, concrete-look)"),
    ],
    "performance": [
        ("pei_rating", "PEI abrasion rating (I to V)"),
        ("slip_resistance", "Slip resistance R-value (R9, R10, R11, R12, R13) per DIN 51130"),
        ("water_absorption", "Water absorption class (BIa, BIb, BIIa, BIIb, BIII) per ISO 13006"),
        ("water_absorption_pct", "Water absorption percentage"),
        ("frost_resistance", "Frost resistant yes/no per ISO 10545-12"),
        ("breaking_strength", "Breaking strength in N per ISO 10545-4"),
        ("abrasion_resistance", "Deep abrasion resistance in mm³"),
        ("chemical_resistance", "Chemical resistance class (A, B, C)"),
        ("thermal_shock_resistance", "Thermal shock resistance pass/fail"),
        ("mohs_hardness", "Mohs hardness scale rating"),
    ],
    "packaging": [
        ("pieces_per_box", "Number of pieces per box"),
        ("patterns_count", "Number of distinct patterns/faces in box"),
        ("m2_per_box", "Coverage per box in m²"),
        ("sqft_per_box", "Coverage per box in sqft"),
        ("weight_per_box_kg", "Box weight in kg"),
        ("weight_per_box_lb", "Box weight in lb"),
        ("boxes_per_pallet", "Number of boxes per pallet"),
        ("m2_per_pallet", "Coverage per pallet in m²"),
        ("sqft_per_pallet", "Coverage per pallet in sqft"),
        ("weight_per_pallet_kg", "Pallet weight in kg"),
        ("weight_per_pallet_lb", "Pallet weight in lb"),
        ("pallet_dimensions_cm", "Pallet dimensions LxWxH in cm"),
    ],
    "commercial": [
        ("sku_codes", "Object mapping variant names to SKU codes"),
        ("product_codes", "Array of product/article codes"),
        ("grout_mapei", "Mapei grout product recommendation"),
        ("grout_kerakoll", "Kerakoll grout product recommendation"),
        ("grout_isomat", "Isomat grout product recommendation"),
        ("grout_technica", "Technica grout product recommendation"),
        ("grout_color_codes", "Object mapping variant/color to grout dose codes"),
        ("grout_suppliers", "Array of grout supplier names"),
        ("vision_variants", "Array of variant objects [{sku, name, color, format, pattern}]"),
        ("grout_details", "Array of [{supplier, product, code, for_variant}]"),
    ],
    "application": [
        ("recommended_use", "Wall, Floor, or both"),
        ("installation_method", "Installation method (thin-set, mortar bed, adhesive)"),
        ("joint_width_mm", "Recommended joint/grout width in mm"),
        ("suitable_rooms", "Suitable room types (bathroom, kitchen, outdoor, etc.)"),
        ("underfloor_heating", "Compatible with underfloor heating yes/no"),
    ],
    "compliance": [
        ("certifications", "Array of certifications (ISO 9001, CE, EN 14411, LEED, etc.)"),
        ("standards", "Array of compliance standards"),
        ("eco_friendly", "Eco-friendly indicators"),
        ("fire_rating", "Fire classification (A1, A2, B, etc.)"),
    ],
    "care": [
        ("care_instructions", "Cleaning and care instructions"),
        ("maintenance", "Maintenance requirements"),
    ],
}

_GENERAL_FIELDS = {
    "material_properties": [
        ("material_type", "Primary material type (natural stone, quartz, Dekton, Corian, concrete, etc.)"),
        ("composition", "Material composition / formulation"),
        ("finish", "Surface finish (polished, honed, leathered, flamed, bush-hammered)"),
        ("thickness_mm", "Slab/panel thickness in mm"),
        ("edge_profiles", "Available edge profiles (bullnose, ogee, mitre, etc.)"),
        ("density_kg_m3", "Material density in kg/m³"),
    ],
    "dimensions": [
        ("slab_size", "Slab/panel nominal size (e.g. 320x160 cm)"),
        ("available_sizes", "Array of available sizes/formats"),
        ("weight_per_m2_kg", "Weight per m² in kg"),
    ],
    "appearance": [
        ("colors", "Array of available colors/finishes"),
        ("primary_color_hex", "Primary hex color code"),
        ("pattern", "Pattern (veined, speckled, solid, bookmatched)"),
        ("texture", "Surface texture description"),
        ("translucency", "Translucent/backlit capable yes/no"),
    ],
    "performance": [
        ("compressive_strength", "Compressive strength in MPa"),
        ("flexural_strength", "Flexural/bending strength in MPa"),
        ("water_absorption_pct", "Water absorption percentage"),
        ("scratch_resistance", "Scratch resistance (Mohs or specific test)"),
        ("heat_resistance_c", "Max heat resistance in celsius"),
        ("stain_resistance", "Stain resistance rating"),
        ("uv_resistance", "UV stability / fade resistance"),
        ("fire_rating", "Fire classification"),
        ("frost_resistance", "Frost resistant yes/no"),
        ("acoustic_rating_db", "Acoustic insulation in dB"),
        ("thermal_conductivity", "Thermal conductivity W/mK"),
    ],
    "application": [
        ("recommended_use", "Recommended applications (countertop, wall cladding, flooring, facade)"),
        ("indoor_outdoor", "Indoor, Outdoor, or Both"),
        ("installation_method", "Installation method"),
    ],
    "commercial": [
        ("sku_codes", "Object mapping variant names to SKU codes"),
        ("product_codes", "Array of product/article codes"),
    ],
    "compliance": [
        ("certifications", "Array of certifications (CE, NSF, GREENGUARD, etc.)"),
        ("eco_friendly", "Eco-friendly indicators"),
        ("recycled_content_pct", "Recycled content percentage"),
    ],
    "care": [
        ("care_instructions", "Cleaning and care instructions"),
        ("sealing_required", "Sealing required yes/no and frequency"),
    ],
}

HINTS = {
    "tiles": [
        "Packaging info is often in 'Iconography' or 'Packing' sections with small icons.",
        "Compliance/performance ratings may be on shared legend pages (often near the end of the catalog, pages 60+), not on each product page.",
        "Look for icon strips at the bottom of product pages — they encode PEI, slip resistance, frost resistance as small pictograms.",
        "Grout recommendations are often in separate tables matching color variants to dose numbers.",
        "DIN 51130 R-values (R9-R13) may appear in regulation/legend pages rather than product pages.",
        "Shade variation V-ratings (V1-V4) per ANSI A137.1 may be in the icon strip.",
    ],
    "general_materials": [
        "Natural stone and engineered surfaces often have slab sizes and thickness as key specs.",
        "Performance data (flexural strength, water absorption) is critical for architects specifying materials.",
        "Look for technical data sheets linked or embedded in catalog pages.",
        "Translucency/backlit capability is a premium feature worth capturing.",
    ],
}

SKIP_FIELDS = {
    "tiles": [
        "wattage", "lumens", "color_temperature_k", "cri", "beam_angle",
        "btu", "kw_output", "energy_class", "thermostat_type",
        "fuel_type", "flow_rate", "flush_volume", "trap_type",
        "species", "janka_hardness", "grain_direction", "wear_layer",
        "coverage_per_litre", "dry_time", "voc_level", "sheen",
    ],
    "general_materials": [
        "grout_mapei", "grout_kerakoll", "grout_isomat",
        "grout_technica", "grout_color_codes", "grout_suppliers",
        "grout_details", "wattage", "lumens", "color_temperature_k",
        "cri", "beam_angle", "btu", "kw_output", "thermostat_type",
        "fuel_type", "flow_rate", "flush_volume", "trap_type",
        "janka_hardness", "ac_rating", "click_system",
        "coverage_per_litre", "dry_time", "voc_level", "sheen",
        "species", "grain_direction",
    ],
}

CONTROLLED_VOCAB = {
    "tiles": ["floor_tile", "wall_tile", "bathroom_tile", "shower_tile",
              "porcelain_tile", "ceramic_tile"],
    "general_materials": ["stone_slab", "metal_panel", "glass_panel",
                          "countertop", "kitchen_worktop", "cladding",
                          "concrete", "terrazzo", "quartz", "composite"],
}

_ALL_FIELDS = {"tiles": _TILES_FIELDS,
               "general_materials": _GENERAL_FIELDS}


def field_rows() -> list:
    rows = []
    for cat, sections in _ALL_FIELDS.items():
        for sp, (sec, fields) in enumerate(sections.items()):
            for fp, (key, desc) in enumerate(fields):
                rows.append((cat, sec, sp, fp, key, desc))
    return rows


def registry_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        field_rows(),
        "category string, section string, sec_pos int, field_pos int, "
        "field_key string, field_desc string")


def resolve_category(key):  # Column -> Column
    known = F.lit(None)
    for c in _ALL_FIELDS:
        known = F.when(key == c, key).otherwise(known)
    return F.coalesce(known, F.lit(FALLBACK_CATEGORY))


def build_prompt_sections(registry: DataFrame) -> DataFrame:
    """One row per category: (category, prompt_text, hints_text,
    skip_fields, controlled_vocab) — byte-identical to the reference
    builders."""
    display = F.lit(None).cast("string")
    for c, d in DISPLAY_NAMES.items():
        display = F.when(F.col("category") == c, F.lit(d)) \
            .otherwise(display)
    line = F.concat(F.lit("- "), F.col("field_key"), F.lit(": "),
                    F.col("field_desc"))
    secs = registry.groupBy("category", "section", "sec_pos").agg(
        F.array_join(F.transform(F.sort_array(F.collect_list(
            F.struct(F.col("field_pos").alias("p"), line.alias("l")))),
            lambda s: s["l"]), "\n").alias("body"))
    label = F.initcap(F.regexp_replace(F.col("section"), "_", " "))
    secs = secs.select(
        "category", "sec_pos",
        F.concat(F.lit("**"), label, F.lit(":**\n"), F.col("body"))
        .alias("sec_text"))
    per_cat = secs.groupBy("category").agg(
        F.array_join(F.transform(F.sort_array(F.collect_list(
            F.struct(F.col("sec_pos").alias("p"),
                     F.col("sec_text").alias("t")))),
            lambda s: s["t"]), "\n\n").alias("sections_text"))
    prompt = F.concat(
        F.lit("PRIORITY FIELDS for "), F.upper(display),
        F.lit(" products:\n(Extract these if present — they are the "
              "most important for this category)\n\n"),
        F.col("sections_text"), F.lit("\n"))
    hints_arr, skip_arr, vocab_arr = [
        F.lit(None).cast("array<string>")] * 3
    for c in _ALL_FIELDS:
        hints_arr = F.when(F.col("category") == c, F.array(
            *[F.lit(h) for h in HINTS[c]])).otherwise(hints_arr)
        skip_arr = F.when(F.col("category") == c, F.array(
            *[F.lit(x) for x in SKIP_FIELDS[c]])).otherwise(skip_arr)
        vocab_arr = F.when(F.col("category") == c, F.array(
            *[F.lit(v) for v in CONTROLLED_VOCAB[c]])) \
            .otherwise(vocab_arr)
    hints_text = F.when(F.size(hints_arr) > 0, F.concat(
        F.lit("CATEGORY-SPECIFIC EXTRACTION TIPS for "), display,
        F.lit(":\n"),
        F.array_join(F.transform(hints_arr,
                                 lambda h: F.concat(F.lit("- "), h)),
                     "\n"))).otherwise(F.lit(""))
    return per_cat.select(
        "category", prompt.alias("prompt_text"),
        hints_text.alias("hints_text"),
        skip_arr.alias("skip_fields"),
        vocab_arr.alias("controlled_vocab"))


def duck_registry_values() -> str:
    """VALUES list for the DuckDB twin, generated from the SAME
    constants so the two engines cannot drift."""
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"
    rows = ", ".join(
        f"({q(c)}, {q(s)}, {sp}, {fp}, {q(k)}, {q(d)})"
        for c, s, sp, fp, k, d in field_rows())
    return (f"(VALUES {rows}) registry(category, section, sec_pos, "
            "field_pos, field_key, field_desc)")


def duck_lists_values() -> str:
    """(category, display, hints, skips, vocab) VALUES for DuckDB."""
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    def arr(xs) -> str:
        return "[" + ", ".join(q(x) for x in xs) + "]"
    rows = ", ".join(
        f"({q(c)}, {q(DISPLAY_NAMES[c])}, {arr(HINTS[c])}, "
        f"{arr(SKIP_FIELDS[c])}, {arr(CONTROLLED_VOCAB[c])})"
        for c in _ALL_FIELDS)
    return (f"(VALUES {rows}) lists(category, display, hints, skips, "
            "vocab)")
