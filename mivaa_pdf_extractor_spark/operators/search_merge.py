"""Saved-search deduplication — the reference's search dedup service
(app/services/search/search_deduplication_service.py) as join plans:

- ``normalize_query_col``  — ``_normalize_query`` (:156-178):
  lowercase, whitespace-collapse, then the replacement chain in dict
  order. The phrase removals run AFTER the collapse, so "x i need y"
  leaves a double space behind ("x  y") — only the outer strip runs at
  the end. Pinned.
- ``attr_conflict``        — ``_has_conflicting_attributes``
  (:355-390): first same-key value conflict in the existing map's
  entry order (with the reference's reason string), then the fixed
  mutually-exclusive key pairs in declaration order, key1-in-existing
  checked before the reverse.
- ``filters_compatible``   — ``_filters_compatible`` (:392-425):
  colors must overlap when both non-empty; price ranges must overlap,
  with a MISSING priceRange defaulting to [0, 10000] but a
  present-and-EMPTY list skipping the check entirely (Python
  truthiness). Pinned.
- ``should_merge``         — ``_should_merge`` (:308-353) with the
  service defaults REQUIRE_CONTEXT_MATCH=True /
  ALLOW_NULL_CONTEXT_MERGE=True (:51-53): equal contexts or
  both-falsy, then attribute conflicts, then filter compatibility.
- ``choose_better_query``  — ``_choose_better_query`` (:492-498):
  strictly-more whitespace words wins, ties keep the existing query.
- ``merge_filters_cols``   — ``_merge_filters`` (:500-528): array
  union per filter key (returned SORTED — the reference's
  ``list(set | set)`` order is hash-nondeterministic), price range
  expanded to cover both (missing existing range defaults to
  [0, 10000]).
- ``find_or_merge``        — ``find_or_merge_search`` +
  ``_find_similar_searches`` (:180-288): candidates share
  (user_id, core_material) — an equi-join, never a cross join — with
  null-fingerprint candidates skipped, cosine ≥ SEMANTIC_THRESHOLD
  0.85, top-10 by similarity, and the FIRST merge-eligible candidate
  in similarity order deciding the action: auto_merge at ≥ 0.95,
  suggest below, create_new when none qualifies. The reference's
  similarity sort is stable on unspecified DB fetch order; this plan
  breaks ties by candidate id ascending (documented determinism
  addition).

The AI query analysis (:55-141) and CLIP embedding call (:143-154)
are network services (out of scope per SURVEY); this tier starts from
their structured outputs, exactly as the reference code does.

Scale: the candidate space is bounded by (user, core_material) bucket
occupancy via the equi-join; the cosine is a native fold over the
vector arrays (no UDF); ranking and first-eligible selection are two
window functions over the already-gated candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .similarity import cosine

SEMANTIC_THRESHOLD = 0.85   # :51
AUTO_MERGE_THRESHOLD = 0.95  # :52

# :158-173 — applied in dict order
QUERY_REPLACEMENTS = [("gray", "grey"), ("flooring", "floor"),
                      ("tiles", "tile"), ("i need", ""),
                      ("looking for", ""), ("searching for", ""),
                      ("i want", "")]

# :367-372 — mutually exclusive attribute keys, in declaration order
EXCLUSIVE_PAIRS = [("outdoor", "indoor"), ("wall", "floor"),
                   ("matte", "glossy"), ("polished", "honed")]

PRICE_DEFAULT_LO, PRICE_DEFAULT_HI = 0.0, 10000.0


def normalize_query_col(q: Column) -> Column:
    c = F.lower(q)
    c = F.array_join(F.split(c, r"\s+"), " ")  # " ".join(split())
    for old, new in QUERY_REPLACEMENTS:
        c = F.replace(c, F.lit(old), F.lit(new))
    return F.regexp_replace(c, r"^\s+|\s+$", "")  # final strip only


def attr_conflict(attrs_e: Column, attrs_n: Column) -> Column:
    """struct(conflict, reason) — ``_has_conflicting_attributes``.
    Same-key scan follows the EXISTING map's entry order."""
    ents = F.map_entries(attrs_e)
    bad = F.filter(ents, lambda e: F.map_contains_key(attrs_n, e["key"])
                   & (F.element_at(attrs_n, e["key"]) != e["value"]))
    first = F.element_at(bad, 1)
    same_key = F.when(
        F.size(bad) > 0,
        F.concat(F.lit("Conflicting "), first["key"], F.lit(": "),
                 first["value"], F.lit(" vs "),
                 F.element_at(attrs_n, first["key"])))
    excl = F.lit(None).cast("string")
    for k1, k2 in reversed(EXCLUSIVE_PAIRS):
        # key2-in-existing checked after key1-in-existing (:386-389)
        excl = F.when(F.map_contains_key(attrs_e, F.lit(k1))
                      & F.map_contains_key(attrs_n, F.lit(k2)),
                      f"Conflicting attributes: {k1} vs {k2}") \
                .when(F.map_contains_key(attrs_e, F.lit(k2))
                      & F.map_contains_key(attrs_n, F.lit(k1)),
                      f"Conflicting attributes: {k2} vs {k1}") \
                .otherwise(excl)
    reason = F.coalesce(same_key, excl)
    return F.struct(reason.isNotNull().alias("conflict"),
                    F.coalesce(reason, F.lit("")).alias("reason"))


def _price_or_default(p: Column) -> Column:
    # missing (NULL) → [0, 10000]; present-but-empty stays empty
    return F.coalesce(p, F.array(F.lit(PRICE_DEFAULT_LO),
                                 F.lit(PRICE_DEFAULT_HI)))


def filters_compatible(colors_e: Column, colors_n: Column,
                       price_e: Column, price_n: Column) -> Column:
    """``_filters_compatible`` (:392-425). The empty-filters fast path
    is modeled by the color/price columns themselves (an absent
    filters dict has no colors and default prices)."""
    colors_ok = F.when(
        (F.size(F.coalesce(colors_e, F.array())) > 0)
        & (F.size(F.coalesce(colors_n, F.array())) > 0),
        F.arrays_overlap(colors_e, colors_n)).otherwise(F.lit(True))
    pe, pn = _price_or_default(price_e), _price_or_default(price_n)
    price_ok = F.when(
        (F.size(pe) > 0) & (F.size(pn) > 0),
        ~((F.element_at(pe, 2) < F.element_at(pn, 1))
          | (F.element_at(pn, 2) < F.element_at(pe, 1)))) \
        .otherwise(F.lit(True))
    return colors_ok & price_ok


def should_merge(ctx_e: Column, ctx_n: Column,
                 attrs_e: Column, attrs_n: Column,
                 colors_e: Column, colors_n: Column,
                 price_e: Column, price_n: Column) -> Column:
    """struct(can_merge, reason) — ``_should_merge`` (:308-353)."""
    falsy = lambda c: c.isNull() | (c == "")
    ctx_ok = (ctx_e.eqNullSafe(ctx_n)) | (falsy(ctx_e) & falsy(ctx_n))
    conflict = attr_conflict(attrs_e, attrs_n)
    filt_ok = filters_compatible(colors_e, colors_n, price_e, price_n)
    reason = (F.when(~ctx_ok, "Different application context")
              .when(conflict["conflict"], conflict["reason"])
              .when(~filt_ok, "Incompatible filters")
              .otherwise("Compatible search - can merge"))
    can = ctx_ok & ~conflict["conflict"] & filt_ok
    return F.struct(can.alias("can_merge"), reason.alias("reason"))


def choose_better_query(existing: Column, new: Column) -> Column:
    wc = lambda c: F.size(F.split(
        F.regexp_replace(c, r"^\s+|\s+$", ""), r"\s+"))
    return F.when(wc(new) > wc(existing), new).otherwise(existing)


def merge_filters_cols(colors_e: Column, colors_n: Column,
                       price_e: Column, price_n: Column) -> Column:
    """struct(colors, price) — ``_merge_filters`` (:500-528) for the
    color/price keys. Union comes back sorted (the reference's set
    order is hash-nondeterministic); the price expansion uses the
    [0, 10000] default for a missing EXISTING range and keeps the
    existing range when the new filters carry none."""
    colors = F.array_sort(F.array_distinct(F.concat(
        F.coalesce(colors_e, F.array()), F.coalesce(colors_n, F.array()))))
    pe = _price_or_default(price_e)
    merged_price = F.when(
        price_n.isNotNull() & (F.size(price_n) >= 2),
        F.array(F.least(F.element_at(pe, 1), F.element_at(price_n, 1)),
                F.greatest(F.element_at(pe, 2),
                           F.element_at(price_n, 2)))) \
        .otherwise(price_e)
    return F.struct(colors.alias("colors"), merged_price.alias("price"))


def candidate_pairs(new_df: DataFrame, saved_df: DataFrame) -> DataFrame:
    """Gated candidate pairs: (user_id, core_material) equi-join,
    null fingerprints skipped (:255-257), cosine ≥ 0.85 (:270),
    top-10 per new search by similarity (:276-278; ties broken by
    saved id ascending)."""
    n, s = new_df.alias("n"), saved_df.alias("s")
    joined = n.join(
        s, (F.col("n.user_id") == F.col("s.user_id"))
        & (F.col("n.core_material") == F.col("s.core_material"))
        & F.col("s.embedding").isNotNull())
    sim = cosine(F.col("n.embedding"), F.col("s.embedding"))
    pairs = joined.select(
        F.col("n.id").alias("new_id"), F.col("s.id").alias("saved_id"),
        sim.alias("similarity"),
        F.col("n.application_context").alias("ctx_n"),
        F.col("s.application_context").alias("ctx_e"),
        F.col("n.attributes").alias("attrs_n"),
        F.col("s.attributes").alias("attrs_e"),
        F.col("n.filter_colors").alias("colors_n"),
        F.col("s.filter_colors").alias("colors_e"),
        F.col("n.price_range").alias("price_n"),
        F.col("s.price_range").alias("price_e"),
        F.col("n.query").alias("query_n"),
        F.col("s.query").alias("query_e"),
    ).filter(F.col("similarity") >= SEMANTIC_THRESHOLD)
    w = Window.partitionBy("new_id").orderBy(
        F.col("similarity").desc(), F.col("saved_id"))
    return pairs.withColumn("rank", F.row_number().over(w)) \
                .filter(F.col("rank") <= 10)


def find_or_merge(new_df: DataFrame, saved_df: DataFrame) -> DataFrame:
    """Per new search: the first merge-eligible candidate in
    similarity order decides (auto_merge / suggest); none → create_new
    (:214-241). Merged query/filters are computed for auto-merge rows
    the way ``merge_into_existing`` (:427-490) would."""
    pairs = candidate_pairs(new_df, saved_df)
    verdict = should_merge(
        F.col("ctx_e"), F.col("ctx_n"), F.col("attrs_e"),
        F.col("attrs_n"), F.col("colors_e"), F.col("colors_n"),
        F.col("price_e"), F.col("price_n"))
    scored = pairs.withColumn("v", verdict) \
                  .filter(F.col("v.can_merge"))
    w = Window.partitionBy("new_id").orderBy("rank")
    best = scored.withColumn("pick", F.row_number().over(w)) \
                 .filter(F.col("pick") == 1)
    merged = merge_filters_cols(F.col("colors_e"), F.col("colors_n"),
                                F.col("price_e"), F.col("price_n"))
    best = best.select(
        "new_id", F.col("saved_id").alias("existing_id"), "similarity",
        F.when(F.col("similarity") >= AUTO_MERGE_THRESHOLD,
               "auto_merge").otherwise("suggest").alias("action"),
        F.col("v.reason").alias("reason"),
        choose_better_query(F.col("query_e"), F.col("query_n"))
        .alias("updated_query"),
        merged["colors"].alias("merged_colors"),
        merged["price"].alias("merged_price"))
    out = new_df.select(F.col("id").alias("new_id")).join(
        best, "new_id", "left")
    return out.withColumn(
        "action", F.coalesce(F.col("action"), F.lit("create_new")))


# ---------------------------------------------------------------------------
# Check-duplicates response envelope (app/api/saved_searches_routes.py:162-236)
# ---------------------------------------------------------------------------

def dup_check_envelope(checks: "DataFrame") -> "DataFrame":
    """Pins:

    - existing_id NULL -> no-duplicate envelope;
    - should_merge -> auto-merge whose similarity_score is HARDCODED
      0.95 and whose reason is the pinned literal REGARDLESS of the
      service's actual score (pin);
    - a merge_suggestion dict passes its own score/reason through;
    - a FOUND existing_id with neither flag reports
      has_duplicate = FALSE — the found id is discarded (pin).
    """
    from pyspark.sql import functions as F
    found = F.col("existing_id").isNotNull()
    auto = found & F.col("should_merge")
    sugg = found & ~F.col("should_merge") & F.col("has_suggestion")
    return checks.select(
        "check_id",
        (auto | sugg).alias("has_duplicate"),
        auto.alias("should_auto_merge"),
        F.when(auto, F.lit(0.95))
        .when(sugg, F.col("suggestion_score"))
        .alias("similarity_score"),
        F.when(auto, F.lit("Very high similarity - auto-merge "
                           "recommended"))
        .when(sugg, F.col("suggestion_reason")).alias("reason"))


def synth_dup_checks(events: "DataFrame") -> "DataFrame":
    from pyspark.sql import functions as F
    e = F.col("event_id")
    return events.select(
        e.cast("long").alias("check_id"),
        F.when(e % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("ss"), (e % 40).cast("string")))
        .alias("existing_id"),
        (e % 3 == 0).alias("should_merge"),
        (e % 5 != 0).alias("has_suggestion"),
        ((e % 11).cast("double") / 100 + 0.85)
        .alias("suggestion_score"),
        F.concat(F.lit("similar filters "), (e % 6).cast("string"))
        .alias("suggestion_reason"))


SYNTH_DUP_CHECKS_SQL = """
    SELECT CAST(event_id AS BIGINT) AS check_id,
           CASE WHEN event_id % 4 = 0 THEN NULL
                ELSE 'ss' || CAST(event_id % 40 AS VARCHAR) END
               AS existing_id,
           event_id % 3 = 0 AS should_merge,
           event_id % 5 <> 0 AS has_suggestion,
           CAST(event_id % 11 AS DOUBLE) / 100 + 0.85
               AS suggestion_score,
           'similar filters ' || CAST(event_id % 6 AS VARCHAR)
               AS suggestion_reason
    FROM events
"""


def dup_envelope_sql() -> str:
    return f"""
        WITH c AS ({SYNTH_DUP_CHECKS_SQL}),
        g AS (
          SELECT *, existing_id IS NOT NULL AS found
          FROM c),
        h AS (
          SELECT *, found AND should_merge AS auto,
                 found AND NOT should_merge AND has_suggestion
                     AS sugg
          FROM g)
        SELECT check_id,
               auto OR sugg AS has_duplicate,
               auto AS should_auto_merge,
               CASE WHEN auto THEN 0.95
                    WHEN sugg THEN suggestion_score END
                   AS similarity_score,
               CASE WHEN auto
                      THEN 'Very high similarity - auto-merge '
                           || 'recommended'
                    WHEN sugg THEN suggestion_reason END AS reason
        FROM h
    """
