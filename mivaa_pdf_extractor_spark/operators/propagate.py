"""Cross-product common-field propagation — one groupBy + one join.

Re-expresses ``propagate_common_fields_to_products``
(reference stage_4_products.py:1241-1455): products minted from the
same document share factory / manufacturing / sizing facts, so any
product missing one inherits the document's first non-empty value.

Semantics pinned:

- ``_is_empty_value`` (:1583-1597): NULL, '', and the placeholder set
  {n/a, not found, not explicitly mentioned, not mentioned, unknown,
  none} (lower+strip) are all "empty".
- per common field, the document value is the FIRST non-empty one in
  product order (:1352-1363 ``break`` on first hit); the reference
  inherits DB return order, determinized here to product_id order.
- ``material_category_override`` (upload settings) ALWAYS wins when
  non-empty (:1348-1350), shadowing the first-non-empty scan.
- nested one-level propagation for material_properties.{thickness,
  body_type, composition} with the same first-non-empty rule.
- factory object: the most COMPLETE factory dict document-wide wins
  (completeness = count of 9 non-empty fields, strictly-greater
  replaces, ties keep the earlier product, :1321-1334); each product
  whose own score is LOWER gets ``{**best, **nonempty(existing)}`` —
  existing values win per field — and the merged object's name/group
  mirror to the top level UNCONDITIONALLY, overwriting even a
  non-empty top-level factory_name (:1407-1425, pinned).
- fills only happen into empty slots (:1394-1404).

Scale: one groupBy on doc_id computing every per-document "first"
(min over (product_id, value) structs — map-side combinable) plus the
best-factory vote, then ONE co-partitioned join back onto products on
the same key. No windows over the product table, no collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EMPTY_PLACEHOLDERS = ("n/a", "not found", "not explicitly mentioned",
                      "not mentioned", "unknown", "none")

COMMON_FIELDS = ("factory_name", "factory_group_name",
                 "country_of_origin", "origin", "material_category",
                 "manufacturing_location", "manufacturing_process",
                 "manufacturing_country", "available_sizes")

NESTED_FIELDS = ("thickness", "body_type", "composition")

FACTORY_FIELDS = ("factory_name", "city", "country", "address",
                  "phone", "email", "website", "country_of_origin",
                  "employee_count")


def is_empty_col(v: Column) -> Column:
    return (v.isNull() | (F.trim(v) == "")
            | F.lower(F.trim(v)).isin(*EMPTY_PLACEHOLDERS))


def _empty_sql(v: str) -> str:
    ph = ", ".join(f"'{p}'" for p in EMPTY_PLACEHOLDERS)
    return (f"({v} IS NULL OR trim({v}) = '' "
            f"OR lower(trim({v})) IN ({ph}))")


def _factory_score(fobj: Column) -> Column:
    s = F.lit(0)
    for f in FACTORY_FIELDS:
        s = s + F.when(~is_empty_col(fobj[f]), 1).otherwise(0)
    return F.when(fobj.isNotNull(), s).otherwise(F.lit(-1))


def propagate_common_fields(products: DataFrame) -> DataFrame:
    """Expects columns: doc_id, product_id, metadata map<string,string>
    (the COMMON_FIELDS), props map<string,string> (the NESTED_FIELDS),
    factory struct<FACTORY_FIELDS>, override string (the per-document
    upload material_category, may be null)."""
    m = F.col("metadata")
    p = F.col("props")
    # establish the doc_id clustering once: the per-doc aggregation AND
    # the join-back below both require hash(doc_id) — without this each
    # inserts its own exchange of the full product rows (guide §2.4)
    products = products.repartition("doc_id")

    def first_nonempty(val: Column) -> Column:
        return F.min(F.when(~is_empty_col(val),
                            F.struct(F.col("product_id").alias("p"),
                                     val.alias("v"))))["v"]

    agg = [first_nonempty(m[f]).alias(f"c_{f}") for f in COMMON_FIELDS]
    agg += [first_nonempty(p[f]).alias(f"n_{f}") for f in NESTED_FIELDS]
    # best factory: strictly-greater score replaces, ties keep the
    # earlier product -> max over (score, -product_id, payload)
    agg.append(F.max(F.struct(
        _factory_score(F.col("factory")).alias("s"),
        (-F.col("product_id")).alias("np"),
        F.col("factory").alias("f"))).alias("bf"))
    agg.append(F.max(F.when(~is_empty_col(F.col("override")),
                            F.col("override"))).alias("ov"))
    per_doc = products.groupBy("doc_id").agg(*agg)

    j = products.join(per_doc, "doc_id")

    # round 6: stage factory_updated and the merged factory object as
    # real columns — the flat form referenced final_factory 9x in the
    # concat (and factory_updated 3x more), and Catalyst inlined that
    # many copies of the 9-field score/merge trees per row. The
    # multi-referenced non-cheap aliases below block CollapseProject,
    # so each evaluates once (same pattern as normalize_salaries).
    best_score = F.col("bf")["s"]
    best = F.col("bf")["f"]
    own_score = _factory_score(F.col("factory"))
    own_nonneg = F.greatest(own_score, F.lit(0))
    merged0 = F.struct(*[
        F.when(~is_empty_col(F.col("factory")[f]), F.col("factory")[f])
         .otherwise(best[f]).alias(f) for f in FACTORY_FIELDS])
    j = j.select(
        "*",
        ((best_score > 0) & (own_nonneg < best_score)).alias("_fupd"),
        merged0.alias("_merged"))
    j = j.select(
        "*",
        F.when(F.col("_fupd"), F.col("_merged"))
         .otherwise(F.col("factory")).alias("_ffac"))
    factory_updated = F.col("_fupd")
    merged = F.col("_merged")
    final_factory = F.col("_ffac")

    def common_value(f: str) -> Column:
        if f == "material_category":
            return F.coalesce(F.col("ov"), F.col(f"c_{f}"))
        return F.col(f"c_{f}")

    # the merged factory object has no factory_group_name field of its
    # own; the reference mirrors it from the merged dict, which only
    # carries it if a product's factory dict had one — our factory
    # struct doesn't, so only factory_name mirrors (the group-name
    # mirror is a no-op on this schema and the fill path rules)
    # stage the per-field "would fill" flags once: fill() and the
    # `updated` disjunction previously re-evaluated the same
    # is_empty pair per field
    j = j.select(
        "*",
        *[(is_empty_col(m[f]) & ~is_empty_col(common_value(f)))
          .alias(f"_wf_{f}") for f in COMMON_FIELDS],
        *[(is_empty_col(p[f]) & ~is_empty_col(F.col(f"n_{f}")))
          .alias(f"_nwf_{f}") for f in NESTED_FIELDS])

    def fill(f: str) -> Column:
        filled = F.when(F.col(f"_wf_{f}"), common_value(f)) \
            .otherwise(m[f])
        # the factory_name mirror overwrites the top level
        # UNCONDITIONALLY whenever the factory object propagates and
        # the merged object carries a name (:1418-1424)
        if f == "factory_name":
            return F.when(factory_updated
                          & merged["factory_name"].isNotNull()
                          & (merged["factory_name"] != ""),
                          merged["factory_name"]).otherwise(filled)
        return filled

    def nested_fill(f: str) -> Column:
        return F.when(F.col(f"_nwf_{f}"), F.col(f"n_{f}")) \
            .otherwise(p[f])

    updated = factory_updated
    for f in COMMON_FIELDS:
        updated = updated | F.col(f"_wf_{f}")
    for f in NESTED_FIELDS:
        updated = updated | F.col(f"_nwf_{f}")

    out = [F.col("doc_id"), F.col("product_id")]
    out += [fill(f).alias(f) for f in COMMON_FIELDS]
    out += [nested_fill(f).alias(f) for f in NESTED_FIELDS]
    out.append(F.concat_ws(
        "|", *[F.coalesce(final_factory[f], F.lit(""))
               for f in FACTORY_FIELDS]).alias("factory_merged"))
    out.append(updated.alias("updated"))
    return j.select(*out)


# ---------------------------------------------------------------------------
# deterministic synthesizer + DuckDB twin
# ---------------------------------------------------------------------------

def synth_products(events: DataFrame) -> DataFrame:
    e = F.col("event_id")

    def mval(k, mod, real, real2):
        # cycle: real value / placeholder / empty / null / second real
        return (F.when(e % mod == 0, F.lit(real))
                .when(e % mod == 1, F.lit("N/A"))
                .when(e % mod == 2, F.lit(""))
                .when(e % mod == 3, F.lit(None))
                .when(e % mod == 4, F.lit(real2))
                .otherwise(F.lit(None)))

    metadata = F.map_from_arrays(
        F.array(*[F.lit(f) for f in COMMON_FIELDS]),
        F.array(
            mval("factory_name", 5, "Harmony", "Florim"),
            mval("factory_group_name", 6, "Concorde Group", "SG Group"),
            mval("country_of_origin", 7, "Italy", "Spain"),
            mval("origin", 8, "EU", "IT"),
            mval("material_category", 9, "porcelain_tile", "wall_tile"),
            mval("manufacturing_location", 10, "Sassuolo", "Castellon"),
            mval("manufacturing_process", 11, "dry pressed", "extruded"),
            mval("manufacturing_country", 12, "Italy", "Spain"),
            mval("available_sizes", 13, "60x60;30x60", "120x120")))
    props = F.map_from_arrays(
        F.array(*[F.lit(f) for f in NESTED_FIELDS]),
        F.array(
            F.when(e % 5 == 2, F.lit("9mm"))
             .when(e % 5 == 3, F.lit("not found")).otherwise(F.lit(None)),
            F.when(e % 4 == 1, F.lit("white body")).otherwise(F.lit(None)),
            F.when(e % 7 == 3, F.lit("30% recycled")).otherwise(F.lit(None))))
    factory = F.when(e % 4 != 3, F.struct(
        F.when(e % 3 == 0, F.lit("Harmony")).otherwise(F.lit(None))
         .alias("factory_name"),
        F.when(e % 2 == 0, F.lit("Sassuolo")).otherwise(F.lit(None))
         .alias("city"),
        F.when(e % 5 < 2, F.lit("Italy")).otherwise(F.lit("unknown"))
         .alias("country"),
        F.when(e % 6 == 0, F.lit("Via Roma 1")).otherwise(F.lit(None))
         .alias("address"),
        F.lit(None).cast("string").alias("phone"),
        F.when(e % 7 == 0, F.lit("a@b.c")).otherwise(F.lit(None))
         .alias("email"),
        F.when(e % 8 == 0, F.lit("h.example.com")).otherwise(F.lit(None))
         .alias("website"),
        F.when(e % 9 == 0, F.lit("Italy")).otherwise(F.lit(None))
         .alias("country_of_origin"),
        F.when(e % 10 == 0, F.lit("250")).otherwise(F.lit(None))
         .alias("employee_count")))
    return events.select(
        F.expr("event_id DIV 6").alias("doc_id"),
        e.alias("product_id"),
        metadata.alias("metadata"), props.alias("props"),
        factory.alias("factory"),
        F.when(F.expr("event_id DIV 6") % 4 == 0, F.lit("quartz"))
         .when(F.expr("event_id DIV 6") % 4 == 1, F.lit("N/A"))
         .otherwise(F.lit(None)).alias("override"))


def synth_products_sql() -> str:
    ph = lambda mod, real, real2: (  # noqa: E731
        f"CASE WHEN event_id % {mod} = 0 THEN '{real}' "
        f"WHEN event_id % {mod} = 1 THEN 'N/A' "
        f"WHEN event_id % {mod} = 2 THEN '' "
        f"WHEN event_id % {mod} = 4 THEN '{real2}' END")
    fields = ", ".join(f"'{f}'" for f in COMMON_FIELDS)
    vals = ", ".join([
        ph(5, "Harmony", "Florim"), ph(6, "Concorde Group", "SG Group"),
        ph(7, "Italy", "Spain"), ph(8, "EU", "IT"),
        ph(9, "porcelain_tile", "wall_tile"),
        ph(10, "Sassuolo", "Castellon"),
        ph(11, "dry pressed", "extruded"), ph(12, "Italy", "Spain"),
        ph(13, "60x60;30x60", "120x120")])
    nf = ", ".join(f"'{f}'" for f in NESTED_FIELDS)
    nv = """CASE WHEN event_id % 5 = 2 THEN '9mm'
                 WHEN event_id % 5 = 3 THEN 'not found' END,
            CASE WHEN event_id % 4 = 1 THEN 'white body' END,
            CASE WHEN event_id % 7 = 3 THEN '30% recycled' END"""
    return f"""
    SELECT event_id // 6 AS doc_id, event_id AS product_id,
           map([{fields}], [{vals}]) AS metadata,
           map([{nf}], [{nv}]) AS props,
           CASE WHEN event_id % 4 <> 3 THEN struct_pack(
               factory_name := CASE WHEN event_id % 3 = 0
                   THEN 'Harmony' END,
               city := CASE WHEN event_id % 2 = 0 THEN 'Sassuolo' END,
               country := CASE WHEN event_id % 5 < 2 THEN 'Italy'
                   ELSE 'unknown' END,
               address := CASE WHEN event_id % 6 = 0
                   THEN 'Via Roma 1' END,
               phone := CAST(NULL AS VARCHAR),
               email := CASE WHEN event_id % 7 = 0 THEN 'a@b.c' END,
               website := CASE WHEN event_id % 8 = 0
                   THEN 'h.example.com' END,
               country_of_origin := CASE WHEN event_id % 9 = 0
                   THEN 'Italy' END,
               employee_count := CASE WHEN event_id % 10 = 0
                   THEN '250' END)
           END AS factory,
           CASE WHEN (event_id // 6) % 4 = 0 THEN 'quartz'
                WHEN (event_id // 6) % 4 = 1 THEN 'N/A'
           END AS override
    FROM events"""


def propagate_sql() -> str:
    """DuckDB twin over a CTE `products` shaped like synth_products."""
    def fscore(obj):
        terms = " + ".join(
            f"CASE WHEN NOT {_empty_sql(f'{obj}.{f}')} THEN 1 ELSE 0 END"
            for f in FACTORY_FIELDS)
        return f"CASE WHEN {obj} IS NULL THEN -1 ELSE ({terms}) END"

    # DuckDB map extraction returns a one-element LIST; [1] unwraps it
    def mref(f):
        return f"m['{f}'][1]"

    def pref(f):
        return f"pr['{f}'][1]"

    firsts = ",\n        ".join(
        "first(metadata['%s'][1] ORDER BY product_id) FILTER ("
        "WHERE NOT %s) AS c_%s"
        % (f, _empty_sql("metadata['%s'][1]" % f), f)
        for f in COMMON_FIELDS)
    nfirsts = ",\n        ".join(
        "first(props['%s'][1] ORDER BY product_id) FILTER ("
        "WHERE NOT %s) AS n_%s"
        % (f, _empty_sql("props['%s'][1]" % f), f)
        for f in NESTED_FIELDS)
    merged_fields = ", ".join(
        f"{f} := CASE WHEN NOT {_empty_sql(f'fac.{f}')} "
        f"THEN fac.{f} ELSE (bf.f).{f} END" for f in FACTORY_FIELDS)

    fills = []
    for f in COMMON_FIELDS:
        com = (f"coalesce(ov, c_{f})" if f == "material_category"
               else f"c_{f}")
        base = (f"CASE WHEN {_empty_sql(mref(f))} "
                f"AND NOT {_empty_sql(com)} THEN {com} "
                f"ELSE {mref(f)} END")
        if f == "factory_name":
            base = (f"CASE WHEN factory_updated "
                    f"AND merged.factory_name IS NOT NULL "
                    f"AND merged.factory_name <> '' "
                    f"THEN merged.factory_name ELSE {base} END")
        fills.append(f"{base} AS {f}")
    nfills = [
        f"CASE WHEN {_empty_sql(pref(f))} AND NOT {_empty_sql(f'n_{f}')} "
        f"THEN n_{f} ELSE {pref(f)} END AS {f}" for f in NESTED_FIELDS]

    upd_terms = ["factory_updated"]
    for f in COMMON_FIELDS:
        com = (f"coalesce(ov, c_{f})" if f == "material_category"
               else f"c_{f}")
        upd_terms.append(f"({_empty_sql(mref(f))} "
                         f"AND NOT {_empty_sql(com)})")
    for f in NESTED_FIELDS:
        upd_terms.append(f"({_empty_sql(pref(f))} "
                         f"AND NOT {_empty_sql(f'n_{f}')})")

    fm_upd = " || '|' || ".join(
        f"coalesce(merged.{f}, '')" for f in FACTORY_FIELDS)
    fm_own = " || '|' || ".join(
        f"coalesce(fac.{f}, '')" for f in FACTORY_FIELDS)

    return f"""
    per_doc AS (SELECT doc_id,
        {firsts},
        {nfirsts},
        max(struct_pack(s := {fscore('factory')},
                        np := -product_id, f := factory)) AS bf,
        max(CASE WHEN NOT {_empty_sql('override')} THEN override END)
            AS ov
        FROM products GROUP BY doc_id),
    j AS (SELECT p.doc_id, p.product_id, p.metadata AS m,
                 p.props AS pr, p.factory AS fac,
                 d.* EXCLUDE (doc_id)
          FROM products p JOIN per_doc d USING (doc_id)),
    j2 AS (SELECT *,
                  ((bf.s) > 0 AND greatest({fscore('fac')}, 0) < (bf.s))
                      AS factory_updated,
                  struct_pack({merged_fields}) AS merged
           FROM j)
    SELECT doc_id, product_id,
           {', '.join(fills)},
           {', '.join(nfills)},
           CASE WHEN factory_updated THEN {fm_upd}
                ELSE {fm_own} END AS factory_merged,
           ({' OR '.join(upd_terms)}) AS updated
    FROM j2"""
