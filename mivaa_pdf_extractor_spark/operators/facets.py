"""Facet canonicalization — the attribute chokepoint, as corpus joins.

Every ingest path in the reference routes raw facet values through ONE
chokepoint before `products.attributes` is written
(`app/services/facets/facet_canonicalizer.py`). The deterministic tiers
are reproduced here over (product, facet_key, raw_value) rows; the two
network tiers (L0.5 Haiku pretranslate, the Voyage embed call itself)
are out of scope — non-ASCII values take the reference's own no-translate
path (`rejected_non_english`), and embeddings arrive as a column:

- **Whitelist gate** (`facet_whitelist.py`): only descriptive
  natural-language attributes canonicalize; identifiers / numerics /
  prose stay verbatim, keys starting with ``_`` never pass.
- **L1 normalize** (`normalize_string`, facet_canonicalizer.py:58-66):
  strip → lowercase → collapse ``[\\s\\-_/]+`` runs to one space. The
  reference also applies NFKC; Spark has no native NFKC, and the values
  this tier admits are ASCII-gated (NFKC is the identity on ASCII) — the
  deviation is confined to values the pipeline rejects anyway.
- **Tier 1 exact/alias** (`_tier1_hit`, :358-370): the normalized form
  equals a canonical value, or the normalized OR raw form appears in a
  canonical row's aliases. The reference scans DB rows in fetch order;
  this engine makes the tie deterministic: an exact canonical match
  wins over an alias hit, then the lexicographically-smallest canonical.
- **Tier 2 embedding merge** (:262-357 + the 0.92 threshold at :47):
  cosine of the value's embedding against the facet's canonical rows;
  best match at or above the threshold merges, else the value is
  ``new``.
- **Lossless raw map** (`collect_raw_attributes`, :489-513): the
  whitelisted, trimmed, de-duplicated raw values — the replay contract
  that keeps a product re-canonicalizable after any failure.

Scale design: the canonical-values table is a dimension (thousands of
rows per facet at most) — it **broadcasts**; the corpus side is scanned
once, tier decisions are per-row expressions plus one broadcast join.
No shuffle except the final dedup/aggregations on tiny key tuples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: facet_whitelist.py — deliberate, conservative sets (cited data).
CANONICALIZABLE_FACETS = (
    "color", "available_colors", "material", "material_type", "finish",
    "style", "application", "room", "zone_intent", "socket",
    "light_color", "mounting_type", "surface_pattern", "slip_resistance",
    "pei_rating", "frost_resistance", "wood_type", "bowl_shape",
    "flush_type", "faucet_type", "weave", "fiber", "upholstery",
    "ip_rating")

NON_CANONICAL_FACETS = (
    "brand", "factory", "factory_name", "factory_group_name", "designer",
    "manufacturer", "supplier", "sku", "external_sku", "model_number",
    "series", "dimensions", "width", "height", "depth", "length",
    "weight", "wattage", "voltage", "flow_rate", "price", "currency",
    "unit", "name", "description", "long_description", "page_range",
    "confidence", "image_indices")

#: facet_canonicalizer.py:47 — locked cross-lingual auto-merge threshold.
MERGE_THRESHOLD = 0.92

_ASCII_RE = r"^[\x00-\x7f]+$"


def is_ascii_english(col: F.Column) -> F.Column:
    """facet_translator.py:43-47 — the pretranslate/reject gate."""
    return F.regexp_like(col, F.lit(_ASCII_RE))


def is_canonicalizable(key: F.Column) -> F.Column:
    """facet_whitelist.py:52-57 — underscore keys and the non-canonical
    set never pass; only the whitelist does."""
    return (~key.startswith("_")
            & ~key.isin(*NON_CANONICAL_FACETS)
            & key.isin(*CANONICALIZABLE_FACETS))


def normalize_facet(col: F.Column) -> F.Column:
    """L1 normalizer (ASCII scope — see module docstring)."""
    s = F.lower(F.trim(col))
    s = F.regexp_replace(s, r"[ \t\r\n\-_/]+", " ")
    return F.trim(s)


def collect_raw_attributes(df: DataFrame, id_col: str = "product_id"
                           ) -> DataFrame:
    """The lossless attributes_raw rows: whitelisted keys, trimmed
    non-empty values, de-duplicated per (product, key)."""
    return (df.filter(is_canonicalizable(F.col("facet_key"))
                      & F.col("raw_value").isNotNull())
            .select(id_col, "facet_key",
                    F.trim(F.col("raw_value")).alias("raw_value"))
            .filter(F.col("raw_value") != "")
            .distinct())


def resolve_facets(values: DataFrame, canon: DataFrame) -> DataFrame:
    """The per-value decision tree.

    Args:
        values: (product_id, facet_key, raw_value, embedding nullable
            array<double>) — embedding present for values that reached
            the embed tier (the caller's embedder; deterministic fakes
            in tests).
        canon: (facet_key, canonical_value, aliases array<string>,
            embedding array<double>) — the existing canonical rows; a
            dimension table, broadcast.

    Returns one row per input with ``normalized``, ``canonical``,
    ``action`` ('rejected_non_english' | 'exact_alias' |
    'embedding_merge' | 'new') and ``similarity`` (embedding tier only,
    rounded to 6).
    """
    v = (values
         .withColumn("normalized", normalize_facet(F.col("raw_value")))
         .withColumn("__vid", F.monotonically_increasing_id()))
    c = F.broadcast(canon.select(
        F.col("facet_key").alias("__cf"),
        F.col("canonical_value").alias("__cv"),
        F.col("aliases").alias("__ca"),
        F.col("embedding").alias("__ce")))

    j = v.join(c, v["facet_key"] == F.col("__cf"), "left")
    exact = F.col("__cv") == F.col("normalized")
    alias_hit = (F.array_contains(F.coalesce(F.col("__ca"),
                                             F.array().cast("array<string>")),
                                  F.col("normalized"))
                 | F.array_contains(F.coalesce(F.col("__ca"),
                                               F.array()
                                               .cast("array<string>")),
                                    F.col("raw_value")))
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("__ce"),
                   lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    norm_v = F.sqrt(F.aggregate(
        F.transform(F.col("embedding"), lambda a: a * a),
        F.lit(0.0), lambda acc, x: acc + x))
    norm_c = F.sqrt(F.aggregate(
        F.transform(F.col("__ce"), lambda a: a * a),
        F.lit(0.0), lambda acc, x: acc + x))
    cos = F.when((norm_v > 0) & (norm_c > 0), dot / (norm_v * norm_c))

    per_cand = j.select(
        "__vid", "product_id", "facet_key", "raw_value", "normalized",
        F.when(exact, F.lit(0)).when(alias_hit, F.lit(1)).alias("t1"),
        F.col("__cv").alias("cand"),
        # sentinel -2.0: comparable in the argmax struct, below any real
        # cosine, and distinguishable from one (cosine >= -1)
        F.coalesce(
            F.when(F.col("embedding").isNotNull()
                   & F.col("__ce").isNotNull(), cos),
            F.lit(-2.0)).alias("cos"))

    # deterministic tier-1 pick: exact beats alias, then smallest
    # canonical; tier-2 pick: highest cosine, largest canonical on ties
    agg = (per_cand.groupBy("__vid", "product_id", "facet_key",
                            "raw_value", "normalized")
           .agg(F.min(F.when(F.col("t1") == 0, F.col("cand")))
                 .alias("t1_exact"),
                F.min(F.when(F.col("t1") == 1, F.col("cand")))
                 .alias("t1_alias"),
                F.max(F.struct(F.col("cos").alias("s"),
                               F.col("cand").alias("c")))
                 .alias("best")))

    had_cos = F.col("best.s") >= F.lit(-1.0)
    t1 = F.coalesce(F.col("t1_exact"), F.col("t1_alias"))
    action = (
        F.when(~is_ascii_english(F.col("normalized")),
               F.lit("rejected_non_english"))
        .when(t1.isNotNull(), F.lit("exact_alias"))
        .when(had_cos & (F.col("best.s") >= MERGE_THRESHOLD),
              F.lit("embedding_merge"))
        .otherwise(F.lit("new")))
    canonical = (
        F.when(~is_ascii_english(F.col("normalized")),
               F.lit(None).cast("string"))
        .when(t1.isNotNull(), t1)
        .when(had_cos & (F.col("best.s") >= MERGE_THRESHOLD),
              F.col("best.c")))
    similarity = F.when(
        is_ascii_english(F.col("normalized")) & t1.isNull() & had_cos,
        F.round(F.col("best.s"), 6))

    return agg.select("product_id", "facet_key", "raw_value",
                      "normalized", canonical.alias("canonical"),
                      action.alias("action"),
                      similarity.alias("similarity"))
