"""Product embedding text, default-unit resolution, and the canonical
factory object — the deterministic tail of Stage 4.

- ``embedding_text``  — ``build_product_embedding_text``
  (reference stage_4_products.py:908-998): name, description, the five
  searchable keys (underscores spaced, 4-placeholder gate), colors
  gathered from THREE sources case-insensitively deduped preserving
  first original case, every known spec field rendered by type (bool →
  bare field name when true; scalar → ``field: value`` with the
  placeholder gate; list → ``field: a, b``), then the page body text
  LAST; joined with ``' | '``. The reference guarantees byte-identity
  between inline and backfill callers — the same property the contract
  hash checks across engines.
- ``default_unit``    — ``_resolve_default_unit`` (:93-124): fine
  vocab exact → admin coarse overlay (exact) → hardcoded coarse exact
  → coarse substring fuzzy (dict order) → ``'pcs'``.
- ``factory_object``  — ``_build_factory_object`` (:135-170): 3-layer
  precedence per field — existing nested object > flat metadata >
  catalog defaults, each layer contributing only non-empty values.

All three are map-only Column plans (the unit overlay is a dozen-row
broadcast); at 10^12 products they run inside the scan's projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mivaa_pdf_extractor_spark.operators.propagate import (
    _empty_sql, is_empty_col)

# stage_4_products.py:44-62
FINE_UNITS = (
    ("floor_tile", "sqm"), ("wall_tile", "sqm"),
    ("bathroom_tile", "sqm"), ("shower_tile", "sqm"),
    ("porcelain_tile", "sqm"), ("ceramic_tile", "sqm"),
    ("wood_flooring", "sqm"), ("laminate", "sqm"),
    ("vinyl_flooring", "sqm"), ("carpet", "sqm"), ("hardwood", "sqm"),
    ("engineered_wood", "sqm"), ("parquet", "sqm"),
    ("wall_paint", "sqm"), ("wallpaper", "sqm"),
    ("decorative_plaster", "sqm"), ("wall_panel", "pcs"),
    ("wall_coating", "sqm"), ("countertop", "sqm"),
    ("kitchen_worktop", "sqm"), ("stone_slab", "sqm"),
    ("metal_panel", "sqm"), ("glass_panel", "sqm"),
    ("concrete", "sqm"), ("terrazzo", "sqm"), ("quartz", "sqm"),
)
# data_import_service.py:42-46 — ORDER IS THE FUZZY PRIORITY
COARSE_UNITS = (
    ("tiles", "sqm"), ("wood", "sqm"), ("paint_wall_decor", "sqm"),
    ("decor", "pcs"), ("furniture", "pcs"),
    ("general_materials", "pcs"), ("heating", "pcs"),
    ("sanitary", "pcs"), ("kitchen", "pcs"), ("lighting", "pcs"),
)
# the admin material_categories overlay (#227) — fixed admin rows,
# shared verbatim with the DuckDB twin; exact coarse-key match only
ADMIN_UNIT_ROWS = (("mosaics", "sqm"), ("outdoor", "pallet"))

EMBED_PLACEHOLDERS = ("not specified", "not found", "unknown", "n/a")
SEARCHABLE_KEYS = ("factory_name", "factory_group_name", "designer",
                   "material_category", "zone_intent")

# canonical spec taxonomy for the synthetic corpus (the reference loads
# material_metadata_fields rows; the walk order is the taxonomy order)
KNOWN_SPEC_FIELDS = ("factory_name", "material_category", "pei_rating",
                     "r_rating", "frost_resistant", "rectified",
                     "finish_options", "thickness_mm")

FACTORY_FIELDS14 = ("factory_name", "factory_group_name", "address",
                    "city", "country", "postal_code", "phone", "email",
                    "website", "country_of_origin", "founded_year",
                    "company_type", "linkedin_url", "employee_count")


def default_unit_col(cat: Column) -> Column:
    """_resolve_default_unit as one when-chain (the admin overlay rows
    are constants here, matching the cached per-process table)."""
    c = F.lower(F.trim(cat))
    fine = None
    for k, u in FINE_UNITS:
        w = c == k
        fine = F.when(w, u) if fine is None else fine.when(w, u)
    admin = None
    for k, u in ADMIN_UNIT_ROWS:
        w = c == k
        admin = F.when(w, u) if admin is None else admin.when(w, u)
    coarse = None
    for k, u in COARSE_UNITS:
        w = c == k
        coarse = F.when(w, u) if coarse is None else coarse.when(w, u)
    fuzzy = None
    for k, u in COARSE_UNITS:
        w = c.contains(k) | F.lit(k).contains(c)
        fuzzy = F.when(w, u) if fuzzy is None else fuzzy.when(w, u)
    # faithful quirk: only None/'' short-circuit to 'pcs' (Python
    # truthiness); a whitespace-only category strips to '' INSIDE the
    # tiers and the substring fuzzy ('' in 'tiles') then yields the
    # FIRST coarse unit — 'sqm' — not 'pcs'
    return F.when(cat.isNull() | (cat == ""), F.lit("pcs")) \
        .otherwise(F.coalesce(fine, admin, coarse, fuzzy, F.lit("pcs")))


def embedding_text_col(name: Column, description: Column,
                       meta: Column, colors3: Column,
                       spec_strs: Column, spec_flags: Column,
                       spec_lists: Column,
                       page_body: Column) -> Column:
    """build_product_embedding_text over: meta map<string,string> (the
    searchable keys + scalar specs via spec_strs), colors3 = the three
    color sources pre-concatenated IN SOURCE ORDER (available_colors,
    appearance_colors, appearance.colors_from_vision), spec_flags
    map<string,boolean>, spec_lists map<string,array<string>>."""
    parts: list[Column] = [F.coalesce(name, F.lit(""))]
    parts.append(F.when(description.isNotNull() & (description != ""),
                        description))
    for key in SEARCHABLE_KEYS:
        v = meta[key]
        ok = (v.isNotNull() & (v != "")
              & ~F.lower(v).isin(*EMBED_PLACEHOLDERS))
        parts.append(F.when(ok, F.replace(v, F.lit("_"), F.lit(" "))))

    # colors: case-insensitive dedup keeping the first original case,
    # source order preserved; blank entries skipped
    cl = F.filter(F.transform(colors3, lambda x: F.trim(x)),
                  lambda x: x != "")
    lows = F.transform(cl, lambda x: F.lower(x))
    idx = F.sequence(F.lit(1), F.size(cl))
    dedup = F.when(F.size(cl) > 0, F.array_compact(F.transform(
        idx, lambda i: F.when(
            F.array_position(lows, F.element_at(lows, i)) == i,
            F.element_at(cl, i))))) \
        .otherwise(F.array().cast("array<string>"))

    spec_parts: list[Column] = []
    for f in KNOWN_SPEC_FIELDS:
        if f in SEARCHABLE_KEYS:
            continue
        label = f.replace("_", " ")
        s = spec_strs[f]
        s_ok = (s.isNotNull() & (F.trim(s) != "")
                & ~F.lower(F.trim(s)).isin(*EMBED_PLACEHOLDERS))
        b = spec_flags[f]
        li = spec_lists[f]
        li_items = F.when(
            li.isNotNull(),
            F.filter(F.transform(li, lambda x: F.trim(x)),
                     lambda x: x != ""))
        spec_parts.append(F.coalesce(
            F.when(b.isNotNull() & b, F.lit(label)),
            F.when(b.isNotNull() & ~b, F.lit(None)),
            F.when(s_ok, F.concat(F.lit(label + ": "), F.trim(s))),
            F.when(s.isNotNull(), F.lit(None)),
            F.when(li.isNotNull() & (F.size(li_items) > 0),
                   F.concat(F.lit(label + ": "),
                            F.array_join(li_items, ", ")))))

    tail = F.when(page_body.isNotNull() & (F.trim(page_body) != ""),
                  F.trim(page_body))
    all_parts = F.concat(
        F.array_compact(F.array(*parts)), dedup,
        F.array_compact(F.array(*spec_parts)),
        F.array_compact(F.array(tail)))
    return F.array_join(all_parts, " | ")


def factory_object_cols(existing: Column, meta: Column,
                        defaults: Column) -> list[Column]:
    """_build_factory_object: existing nested > flat metadata >
    defaults, non-empty values only, per canonical field."""
    out = []
    for f in FACTORY_FIELDS14:
        layers = [existing[f], meta[f], defaults[f]]
        v = None
        for lay in layers:
            keep = F.when(~is_empty_col(lay), lay)
            v = keep if v is None else F.coalesce(v, keep)
        out.append(v.alias(f"f_{f}"))
    return out


# ---------------------------------------------------------------------------
# synthesizers + DuckDB twins
# ---------------------------------------------------------------------------

def synth_embed_inputs(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    meta = F.map_from_arrays(
        F.array(*[F.lit(k) for k in SEARCHABLE_KEYS]),
        F.array(
            F.when(e % 3 == 0, F.lit("Harmony")).otherwise(F.lit("")),
            F.when(e % 4 == 0, F.lit("SG_Group")).otherwise(
                F.lit("not specified")),
            F.when(e % 5 == 0, F.lit("Stacy Garcia"))
             .otherwise(F.lit(None)),
            F.when(e % 2 == 0, F.lit("porcelain_tile"))
             .otherwise(F.lit("N/A")),
            F.when(e % 7 == 0, F.lit("indoor_floor"))
             .otherwise(F.lit(None))))
    colors3 = F.concat(
        F.when(e % 3 == 0, F.array(F.lit("Beige"), F.lit("grey")))
         .otherwise(F.array().cast("array<string>")),
        F.when(e % 4 == 0, F.array(F.lit("BEIGE"), F.lit("White")))
         .otherwise(F.array().cast("array<string>")),
        F.when(e % 5 == 0, F.array(F.lit("Grey"), F.lit(" ")))
         .otherwise(F.array().cast("array<string>")))
    spec_strs = F.map_from_arrays(
        F.array(F.lit("pei_rating"), F.lit("r_rating"),
                F.lit("thickness_mm")),
        F.array(
            F.when(e % 3 == 0, F.lit("PEI IV"))
             .when(e % 3 == 1, F.lit("unknown")).otherwise(F.lit("")),
            F.when(e % 4 == 0, F.lit("R10")).otherwise(F.lit(None)),
            F.when(e % 5 == 0, F.lit("9")).otherwise(F.lit(None))))
    spec_flags = F.map_from_arrays(
        F.array(F.lit("frost_resistant"), F.lit("rectified")),
        F.array(F.when(e % 2 == 0, F.lit(True))
                .when(e % 4 == 1, F.lit(False)).otherwise(
                    F.lit(None).cast("boolean")),
                F.when(e % 3 == 0, F.lit(True)).otherwise(
                    F.lit(None).cast("boolean"))))
    spec_lists = F.map_from_arrays(
        F.array(F.lit("finish_options")),
        F.array(F.when(e % 3 == 0,
                       F.array(F.lit("Matte"), F.lit(""),
                               F.lit("Glossy")))
                .when(e % 3 == 1, F.array().cast("array<string>"))
                .otherwise(F.lit(None).cast("array<string>"))))
    return events.select(
        e.alias("product_id"),
        F.when(e % 9 != 8, F.concat(F.lit("Product "),
                                    (e % 50).cast("string")))
         .alias("name"),
        F.when(e % 4 == 0, F.lit("a glazed porcelain collection"))
         .when(e % 4 == 1, F.lit("")).otherwise(F.lit(None))
         .alias("description"),
        meta.alias("meta"), colors3.alias("colors3"),
        spec_strs.alias("spec_strs"), spec_flags.alias("spec_flags"),
        spec_lists.alias("spec_lists"),
        F.when(e % 6 == 0, F.concat(F.lit("  page body text "),
                                    (e % 7).cast("string"),
                                    F.lit("  ")))
         .when(e % 6 == 1, F.lit(" ")).otherwise(F.lit(None))
         .alias("page_body"))


SYNTH_EMBED_SQL = """
    SELECT event_id AS product_id,
           CASE WHEN event_id % 9 <> 8
                THEN 'Product ' || CAST(event_id % 50 AS VARCHAR) END
               AS name,
           CASE WHEN event_id % 4 = 0
                THEN 'a glazed porcelain collection'
                WHEN event_id % 4 = 1 THEN '' END AS description,
           CASE WHEN event_id % 3 = 0 THEN 'Harmony' ELSE '' END
               AS m_factory_name,
           CASE WHEN event_id % 4 = 0 THEN 'SG_Group'
                ELSE 'not specified' END AS m_factory_group_name,
           CASE WHEN event_id % 5 = 0 THEN 'Stacy Garcia' END
               AS m_designer,
           CASE WHEN event_id % 2 = 0 THEN 'porcelain_tile'
                ELSE 'N/A' END AS m_material_category,
           CASE WHEN event_id % 7 = 0 THEN 'indoor_floor' END
               AS m_zone_intent,
           (CASE WHEN event_id % 3 = 0 THEN ['Beige', 'grey']
                 ELSE CAST([] AS VARCHAR[]) END)
           || (CASE WHEN event_id % 4 = 0 THEN ['BEIGE', 'White']
                    ELSE CAST([] AS VARCHAR[]) END)
           || (CASE WHEN event_id % 5 = 0 THEN ['Grey', ' ']
                    ELSE CAST([] AS VARCHAR[]) END) AS colors3,
           CASE WHEN event_id % 3 = 0 THEN 'PEI IV'
                WHEN event_id % 3 = 1 THEN 'unknown'
                ELSE '' END AS s_pei_rating,
           CASE WHEN event_id % 4 = 0 THEN 'R10' END AS s_r_rating,
           CASE WHEN event_id % 5 = 0 THEN '9' END AS s_thickness_mm,
           CASE WHEN event_id % 2 = 0 THEN TRUE
                WHEN event_id % 4 = 1 THEN FALSE END
               AS b_frost_resistant,
           CASE WHEN event_id % 3 = 0 THEN TRUE END AS b_rectified,
           CASE WHEN event_id % 3 = 0 THEN ['Matte', '', 'Glossy']
                WHEN event_id % 3 = 1 THEN CAST([] AS VARCHAR[])
           END AS l_finish_options,
           CASE WHEN event_id % 6 = 0 THEN '  page body text '
                    || CAST(event_id % 7 AS VARCHAR) || '  '
                WHEN event_id % 6 = 1 THEN ' ' END AS page_body
    FROM events"""


def embedding_text_sql() -> str:
    """DuckDB twin over a CTE `p` shaped like SYNTH_EMBED_SQL."""
    ph = ", ".join(f"'{x}'" for x in EMBED_PLACEHOLDERS)
    parts = ["coalesce(name, '')",
             "CASE WHEN description IS NOT NULL AND description <> ''"
             " THEN description END"]
    for k in SEARCHABLE_KEYS:
        v = f"m_{k}"
        parts.append(
            f"CASE WHEN {v} IS NOT NULL AND {v} <> '' "
            f"AND lower({v}) NOT IN ({ph}) "
            f"THEN replace({v}, '_', ' ') END")
    head = ("list_filter([" + ", ".join(parts)
            + "], x -> x IS NOT NULL)")
    cl = ("list_filter(list_transform(colors3, x -> trim(x)), "
          "x -> x <> '')")
    dedup = f"""CASE WHEN len({cl}) > 0 THEN
        list_filter(list_transform(range(1, len({cl}) + 1), i ->
            CASE WHEN list_position(
                     list_transform({cl}, x -> lower(x)),
                     lower(({cl})[i])) = i
                 THEN ({cl})[i] END), x -> x IS NOT NULL)
        ELSE [] END"""
    spec_parts = []
    for f in KNOWN_SPEC_FIELDS:
        if f in SEARCHABLE_KEYS:
            continue
        label = f.replace("_", " ")
        if f in ("frost_resistant", "rectified"):
            spec_parts.append(f"CASE WHEN b_{f} THEN '{label}' END")
        elif f == "finish_options":
            items = (f"list_filter(list_transform(l_{f}, "
                     f"x -> trim(x)), x -> x <> '')")
            spec_parts.append(
                f"CASE WHEN l_{f} IS NOT NULL AND len({items}) > 0 "
                f"THEN '{label}: ' || array_to_string({items}, ', ') "
                f"END")
        else:
            v = f"s_{f}"
            spec_parts.append(
                f"CASE WHEN {v} IS NOT NULL AND trim({v}) <> '' "
                f"AND lower(trim({v})) NOT IN ({ph}) "
                f"THEN '{label}: ' || trim({v}) END")
    specs = ("list_filter([" + ", ".join(spec_parts)
             + "], x -> x IS NOT NULL)")
    tail = ("list_filter([CASE WHEN page_body IS NOT NULL "
            "AND trim(page_body) <> '' THEN trim(page_body) END], "
            "x -> x IS NOT NULL)")
    return (f"SELECT product_id, array_to_string({head} || ({dedup}) "
            f"|| {specs} || {tail}, ' | ') AS embedding_text FROM p")


def default_unit_sql(cat: str) -> str:
    fine = " ".join(f"WHEN {cat} = '{k}' THEN '{u}'"
                    for k, u in FINE_UNITS)
    admin = " ".join(f"WHEN {cat} = '{k}' THEN '{u}'"
                     for k, u in ADMIN_UNIT_ROWS)
    coarse = " ".join(f"WHEN {cat} = '{k}' THEN '{u}'"
                      for k, u in COARSE_UNITS)
    fuzzy = " ".join(
        f"WHEN contains({cat}, '{k}') OR contains('{k}', {cat}) "
        f"THEN '{u}'" for k, u in COARSE_UNITS)
    return (f"coalesce(CASE {fine} END, CASE {admin} END, "
            f"CASE {coarse} END, CASE {fuzzy} END, 'pcs')")
