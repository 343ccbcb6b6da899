"""Markdown product detection — the reference's chunk→product mining
tier (app/services/products/product_creation_service.py) as map-only
Column plans:

- ``product_chunk_gate``   — ``_is_valid_product_chunk`` (:363-497):
  the 11-tier keyword reject ladder (short, index/TOC, sustainability,
  certification, tech-table, moodboard, cleaning, generic, designer-bio,
  factory, tech-without-name) ending in the 3-indicator scoring gate.
- ``classify_markdown``    — ``_classify_markdown_content``
  (:1009-1066): index / sustainability / technical / moodboard /
  product / unknown.
- ``mine_markdown``        — ``_detect_markdown_patterns`` (:1068-1086)
  + ``_extract_markdown_data`` (:1088-1125)
  + ``_calculate_markdown_quality_score`` (:1127-1153): the four
  pattern booleans, name/dimensions/designer/colors/materials
  extraction, and the weighted quality score with its short-content and
  index-like penalties.

**Pinned reference bug** (the same class as the G7 number bugs): the
validity gate lowercases ``content`` first (:368) and then asks
``word.isupper()`` over that lowered text (:474), so
``has_uppercase_name`` can never be True and the final
``product_score >= 3`` gate (:489) can never pass — every chunk that
survives the reject tiers is still rejected as
``insufficient_indicators``. ``valid_ref`` reproduces this faithfully;
``valid_fixed`` evaluates the uppercase test against the ORIGINAL text,
which is the evident intent. Both are contract-pinned.

Also faithful: ``_classify_markdown_content``'s dimension test includes
the bare letter ``'x'`` as a substring pattern (:1052), so nearly any
prose "has dimensions" — reproduced, not repaired (tests pin it).

Documented deviations: ``colors``/``materials`` come back sorted (the
reference's ``list(set(...))`` order is Python-hash nondeterministic,
:1117-1123); Python ``str.isupper()`` is approximated ASCII-wise as
"no lowercase letter, at least one uppercase" (the corpus is ASCII).

Scale: every operator is a pure expression over the chunk row — the
whole tier runs inside the scan's codegen projection, no shuffle, no
UDF, exactly where a per-chunk gate belongs at 10^12 chunks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# verbatim keyword tiers (:374-470) — behavior-table data constants
INDEX_KW = ["table of contents", "index", "contents", "page numbers",
            "signature book", "signature index", "collections index"]
SUSTAIN_KW = ["sustainability", "environmental", "eco-friendly",
              "carbon footprint", "recycled", "leed", "greenguard",
              "environmental performance", "iso 14001",
              "environmental management"]
CERT_KW = ["quality certifications", "sustainability certifications",
           "iso 9001", "une-en iso", "certification", "certifies",
           "quality management system"]
TECH_TABLE_KW = ["technical characteristics", "technical data",
                 "specifications", "fire rating", "weight per",
                 "thickness", "water absorption", "breaking strength",
                 "thermal expansion"]
MOOD_KW = ["moodboard", "mood board", "inspiration", "fresh inspiration",
           "signature moodboard"]
CLEAN_KW = ["cleaning", "cleaner", "maintenance", "fila", "faber",
            "remover", "degreaser", "floor cleaner", "tile cleaner",
            "epoxy pro", "post-construction", "application guide",
            "cleaning system"]
GENERIC_KW = ["artisan clay", "mediterranean sand", "deep contrast",
              "not specified", "not applicable"]
BIO_KW = ["biography", "born in", "graduated from", "studied at",
          "career began", "founded in", "established in",
          "renowned designer", "award-winning", "based in",
          "studio was founded", "design philosophy", "creative director",
          "years of experience", "portfolio includes", "education",
          "professional background", "design journey", "trained at"]
FACTORY_KW = ["factory location", "manufacturing facility",
              "production capacity", "plant location", "headquarters",
              "production site", "manufacturing process",
              "quality control", "production line", "factory address",
              "production facility", "manufacturing plant",
              "industrial complex", "production area",
              "manufacturing site"]
TECH_SPEC_KW = ["water absorption", "breaking strength",
                "slip resistance", "frost resistance",
                "chemical resistance", "thermal shock",
                "modulus of rupture", "abrasion resistance",
                "stain resistance"]
PRODUCT_SOFT_KW = ["dimensions", "designer", "collection", "×", "cm",
                   "mm"]
PRODUCT_CONTEXT_KW = ["designer", "collection", "material", "ceramic",
                      "porcelain", "tile", "estudi{h}ac", "dsignio",
                      "alt design", "mut", "yonoh", "stacy garcia"]

COLOR_WORDS = ("white|black|grey|gray|beige|taupe|sand|clay|anthracite"
               "|cream|ivory|brown|blue|green|red|yellow|orange|purple"
               "|pink")
MATERIAL_WORDS = ("ceramic|porcelain|stone|marble|granite|wood|metal"
                  "|glass|concrete|tile|vinyl|laminate")


def _any_kw(col: Column, kws: list) -> Column:
    out = F.lit(False)
    for k in kws:
        out = out | F.contains(col, F.lit(k))
    return out


def _has_upper_word(text: Column, min_len: int) -> Column:
    """ASCII approximation of ``any(w.isupper() and len(w) > min_len
    for w in text.split())``: a whitespace token longer than ``min_len``
    with at least one A-Z and no a-z."""
    return F.exists(
        F.split(text, r"\s+"),
        lambda w: (F.length(w) > min_len) & w.rlike("[A-Z]")
        & ~w.rlike("[a-z]"))


def product_chunk_gate(df: DataFrame,
                       content_col: str = "content") -> DataFrame:
    """Append (reject_reason, valid_ref, valid_fixed) — the
    ``_is_valid_product_chunk`` ladder (:363-497) in tier order.
    ``valid_ref`` keeps the lowered-text uppercase bug (never True);
    ``valid_fixed`` scores the uppercase indicator on the original
    text. ``reject_reason`` reports the FIXED path's tier (the ref path
    differs only in the last tier, pinned separately)."""
    raw = F.coalesce(F.col(content_col), F.lit(""))
    c = F.lower(raw)  # :368 — everything below checks the lowered text
    soft = _any_kw(c, PRODUCT_SOFT_KW)
    has_dims = (F.contains(c, F.lit("×")) | F.contains(c, F.lit("x "))
                | F.contains(c, F.lit("cm")) | F.contains(c, F.lit("mm")))
    has_ctx = _any_kw(c, PRODUCT_CONTEXT_KW)
    has_tech = _any_kw(c, TECH_SPEC_KW)
    up_ref = _has_upper_word(c, 2)       # :474 — lowered text: never True
    up_fixed = _has_upper_word(raw, 2)   # evident intent
    score_ref = (up_ref.cast("int") + has_dims.cast("int")
                 + has_ctx.cast("int"))
    score_fixed = (up_fixed.cast("int") + has_dims.cast("int")
                   + has_ctx.cast("int"))
    many_lines = F.size(F.split(c, "\n")) - 1 > 20

    reason = (
        F.when(F.length(c) < 100, "short")
        .when(_any_kw(c, INDEX_KW), "index_toc")
        .when(_any_kw(c, SUSTAIN_KW) & ~soft, "sustainability")
        .when(_any_kw(c, CERT_KW) & ~soft, "certification")
        .when(_any_kw(c, TECH_TABLE_KW)
              & (F.contains(c, F.lit("|")) | many_lines), "tech_table")
        .when(_any_kw(c, MOOD_KW)
              & ~(F.contains(c, F.lit("×"))
                  | F.contains(c, F.lit("dimensions"))
                  | F.contains(c, F.lit("designer"))
                  | F.contains(c, F.lit("cm"))
                  | F.contains(c, F.lit("mm"))), "moodboard")
        .when(_any_kw(c, CLEAN_KW)
              & (~(F.contains(c, F.lit("×")) | F.contains(c, F.lit("cm"))
                   | F.contains(c, F.lit("mm")))
                 | F.contains(c, F.lit("not applicable"))
                 | F.contains(c, F.lit("guidance documentation"))),
              "cleaning")
        .when(_any_kw(c, GENERIC_KW) & (F.length(c) < 200), "generic")
        .when(_any_kw(c, BIO_KW), "designer_bio")
        .when(_any_kw(c, FACTORY_KW), "factory")
        .when(has_tech & ~up_fixed, "tech_no_name")
        .when(score_fixed < 3, "insufficient_indicators")
        .otherwise(F.lit(None)))
    # the REF path reaches the same tiers but its tech/name + final
    # score use the lowered-text uppercase (:474): always short of 3
    valid_ref = (reason.isNull() | (reason == "insufficient_indicators")) \
        & ~(F.length(c) < 100) & (score_ref >= 3)
    return (df.withColumn("reject_reason", reason)
            .withColumn("valid_fixed", reason.isNull())
            .withColumn("valid_ref", valid_ref))


def classify_markdown(df: DataFrame,
                      content_col: str = "content") -> DataFrame:
    """Append ``content_class`` — ``_classify_markdown_content``
    (:1009-1066), priority order: index → sustainability → technical →
    moodboard → product → unknown. Faithful to the bare-``'x'``
    dimension substring (:1052)."""
    raw = F.coalesce(F.col(content_col), F.lit(""))
    c = F.lower(raw)
    page_count = F.size(F.split(c, "page")) - 1
    up_words = F.exists(F.split(raw, r"\s+"),
                        lambda w: (F.length(w) > 1) & w.rlike("[A-Z]")
                        & ~w.rlike("[a-z]"))
    has_dims = (F.contains(raw, F.lit("×")) | F.contains(raw, F.lit("x"))
                | F.contains(raw, F.lit("cm"))
                | F.contains(raw, F.lit("mm")))
    has_ctx = _any_kw(c, ["designer", "collection", "material",
                          "ceramic", "porcelain", "tile"])
    cls = (
        F.when(F.contains(c, F.lit("table of contents"))
               | (F.contains(c, F.lit("index")) & (page_count > 1))
               | F.contains(c, F.lit("contents"))
               | (page_count > 2)
               | F.contains(raw, F.lit("...")), "index")
        .when(_any_kw(c, ["sustainability", "certification",
                          "environmental", "eco-friendly",
                          "carbon footprint", "recycled", "leed",
                          "greenguard"])
              & ~_any_kw(c, ["dimensions", "designer", "collection"]),
              "sustainability")
        .when(_any_kw(c, ["technical characteristics", "specifications",
                          "technical data", "properties", "fire rating",
                          "weight per"])
              & (F.contains(raw, F.lit("|"))
                 | F.contains(c, F.lit("thickness")))
              & ~_any_kw(c, ["designer", "collection"]), "technical")
        .when(_any_kw(c, ["moodboard", "mood board", "inspiration",
                          "collection overview"])
              & ~_any_kw(c, ["dimensions", "designer"]), "moodboard")
        .when(up_words & has_dims & (has_ctx | (F.length(raw) > 200)),
              "product")
        .otherwise("unknown"))
    return df.withColumn("content_class", cls)


_NAME_HDR = r"##?\s+([A-Z]{2,}(?:\s+[A-Z]{2,})*)"
_NAME_LINE = r"(?m)^([A-Z]{2,}(?:\s+[A-Z]{2,})*)$"
_NAME_ANY = r"\b([A-Z]{2,}(?:\s+[A-Z]{2,})*)\b"
_DIMS = r"\d+\s*[×x]\s*\d+|\d+\s*(?:mm|cm)"
_DESIGNER = (r"(?i)(?:by|BY)\s+([A-Z][a-zA-Z\s{}]+)"
             r"|(?:studio|estudi)\s*([A-Z][a-zA-Z\s{}]*)")


def mine_markdown(df: DataFrame,
                  content_col: str = "content") -> DataFrame:
    """Append the pattern booleans, extracted fields, and quality score
    (:1068-1153). Multi-valued fields come back sorted-joined
    (``dimensions``/``colors``/``materials``) so the output is
    total-ordered. The score reproduces the reference's exact constant
    sequence, including the ×0.5 short-content and ×0.3 index-like
    penalties and the min(1.0) cap."""
    t = F.coalesce(F.col(content_col), F.lit(""))
    has_name = (t.rlike(r"##?\s+[A-Z]{2,}(?:\s+[A-Z]{2,})*")
                | t.rlike(r"(?m)^[A-Z]{2,}(?:\s+[A-Z]{2,})*$")
                | t.rlike(r"\b[A-Z]{2,}(?:\s+[A-Z]{2,})*\b"))
    has_dims = t.rlike(_DIMS)
    has_designer = t.rlike(r"(?i)(?:by|BY)\s+[A-Z][a-zA-Z\s{}]+"
                           r"|(?i)(?:studio|estudi)")
    has_desc = (F.length(t) > 100) \
        & t.rlike(r"(?i)material|texture|finish|color|collection")

    name = F.coalesce(
        F.when(F.regexp_extract(t, _NAME_HDR, 1) != "",
               F.regexp_extract(t, _NAME_HDR, 1)),
        F.when(F.regexp_extract(t, _NAME_LINE, 1) != "",
               F.regexp_extract(t, _NAME_LINE, 1)),
        F.when(F.regexp_extract(t, _NAME_ANY, 1) != "",
               F.regexp_extract(t, _NAME_ANY, 1)))
    dims = F.array_join(F.regexp_extract_all(t, F.lit(_DIMS), 0), "; ")
    g1 = F.regexp_extract(t, _DESIGNER, 1)
    g2 = F.regexp_extract(t, _DESIGNER, 2)
    designer = F.trim(F.when(g1 != "", g1).when(g2 != "", g2))
    colors = F.array_join(F.array_sort(F.array_distinct(F.transform(
        F.regexp_extract_all(t, F.lit(rf"(?i)\b(?:{COLOR_WORDS})\b"), 0),
        F.lower))), ",")
    materials = F.array_join(F.array_sort(F.array_distinct(F.transform(
        F.regexp_extract_all(t, F.lit(rf"(?i)\b(?:{MATERIAL_WORDS})\b"),
                             0), F.lower))), ",")

    score = (F.when(has_name, 0.3).otherwise(0.0)
             + F.when(has_dims, 0.25).otherwise(0.0)
             + F.when(has_designer, 0.2).otherwise(0.0)
             + F.when(has_desc, 0.15).otherwise(0.0)
             + F.when(name.isNotNull() & (F.length(name) > 2), 0.1)
             .otherwise(0.0)
             + F.when(dims != "", 0.1).otherwise(0.0)
             + F.when(designer.isNotNull() & (designer != ""), 0.1)
             .otherwise(0.0)
             + F.when(colors != "", 0.05).otherwise(0.0)
             + F.when(materials != "", 0.05).otherwise(0.0))
    score = F.when(F.length(t) < 100, score * 0.5).otherwise(score)
    score = F.when(
        F.contains(F.lower(t), F.lit("page"))
        & (F.size(F.regexp_extract_all(t, F.lit(r"\d+"), 0)) > 3),
        score * 0.3).otherwise(score)
    score = F.least(F.lit(1.0), score)

    return (df.withColumn("has_product_name", has_name)
            .withColumn("has_dimensions", has_dims)
            .withColumn("has_designer_attribution", has_designer)
            .withColumn("has_product_description", has_desc)
            .withColumn("product_name", name)
            .withColumn("dimensions", dims)
            .withColumn("designer", designer)
            .withColumn("colors", colors)
            .withColumn("materials", materials)
            .withColumn("quality_score", score))
