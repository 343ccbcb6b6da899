"""Catalog-wide knowledge / legend extraction folds.

The reference runs two complementary vision passes over the TAIL pages
of a catalog and persists their deterministic post-processing:

- v1 ``app/services/knowledge/catalog_knowledge_extractor.py`` scans
  the last ``min(10, max(1, total // 4))`` pages (:140-155), classifies
  each page, collects certifications from EVERY parsed page regardless
  of page_type (:328-341, even ``none``/legal pages), creates one
  kb_doc per content page (:343-378) and append-merges the catalog
  certification set into each product (:455-505).
- v2 ``app/services/knowledge/catalog_legend_extractor_v2.py`` consumes
  Layer-1's ``legend_pages`` classification (:377-380), falls back to a
  last-12-page ``unknown`` scan when Layer 1 never ran (:391-407),
  resolves ``unknown`` pages by trying every prompt and keeping the
  best-populated result (:447-474, strictly-greater score with
  dict-order ties, ``best_score >= 3`` gate), collects certifications
  only from extracted legends (:488-497), re-dedupes the ENTIRE merged
  list on propagation (:528-531 via ``_dedupe_norm``) and creates one
  kb_doc per legend entry with non-empty stripped markdown (:583-588).

Deliberately pinned asymmetries between the two passes:

- title fallback: v1 strips FIRST (``(title or "").strip() or
  f"{type.title()} (page {idx+1})"`` :349) so a whitespace-only title
  falls back; v2 applies ``or`` BEFORE strip (``(title or
  f"{type.title()} Legend").strip()`` :585) so a whitespace-only title
  becomes the empty string.
- content gate: v1 gates on the RAW markdown being truthy (:343 — a
  whitespace-only page counts as content and yields an empty-string
  kb_doc); v2 gates on the STRIPPED markdown (:586-588).
- cert dedup: v1's inline collect keeps certs whose normalized form is
  empty (``"- -"`` survives, :334-341 only skips empty pre-norm);
  v2's ``_dedupe_norm`` drops empty norms (:292-303).
- propagation merge: v1 keeps the product's existing list verbatim
  (duplicates included) and appends unseen catalog certs (:486-494);
  v2 re-dedupes existing+catalog together, collapsing pre-existing
  duplicates and re-stripping entries (:528-531).
- provenance: v1 stamps ``certifications_source = "catalog_knowledge"``
  (:497), v2 ``"catalog_legend"`` (:532) with a 0.9-confidence
  ``_extraction_metadata`` tag (:536-541).

The vision calls themselves are network (out of scope); the synthetic
``vision`` tables stand in for their parsed JSON. Scale: everything is
per-document array/scalar Column logic plus (doc, page) equi-joins and
one groupBy(doc) for the ordered cert fold — no UDFs, no windows over
the full corpus, map-side except the final per-doc aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# v2 prompt registry order (catalog_legend_extractor_v2.py:191-198) —
# the unknown-page ladder tries prompts in this order and first-wins
# on score ties.
PROMPT_ORDER = ("icons", "regulation", "certification",
                "installation", "care", "sustainability")

# catalog_legend_extractor_v2.py:70-77
LEGEND_TYPE_TO_RELATIONSHIP = {
    "icons": "related",
    "regulation": "specification",
    "certification": "certification",
    "installation": "specification",
    "care": "supplementary",
    "sustainability": "supplementary",
}

# catalog_knowledge_extractor.py:219-236
PAGE_TYPE_TO_RELATIONSHIP = {
    "iconography": "related",
    "packing": "specification",
    "regulation": "specification",
    "installation": "specification",
    "care": "supplementary",
    "sustainability": "supplementary",
    "certification": "certification",
    "legal": "related",
    "brand": "related",
}

MAX_PAGES_TO_SCAN = 10   # knowledge_extractor.py:59
LEGEND_FALLBACK_PAGES = 12  # legend_extractor_v2.py:398
UNKNOWN_MIN_SCORE = 3    # legend_extractor_v2.py:466

def _empty():
    return F.array().cast("array<string>")


def _norm(c):
    """Certification dedup key — lower + remove every space/hyphen
    (both files; strip is subsumed by removing all spaces)."""
    return F.regexp_replace(F.lower(c), "[ -]", "")


def _rel_map(mapping):
    pairs = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)


def _dedupe_norm(arr):
    """v2 ``_dedupe_norm`` (:292-303): first-occurrence order on the
    normalized key, empty norms dropped, stripped originals kept."""
    return F.aggregate(
        F.coalesce(arr, _empty()),
        F.struct(_empty().alias("norms"), _empty().alias("out")),
        lambda acc, s: F.when(
            s.isNull()
            | (_norm(s) == "")
            | F.array_contains(acc["norms"], _norm(s)),
            acc,
        ).otherwise(F.struct(
            F.concat(acc["norms"], F.array(_norm(s))).alias("norms"),
            F.concat(acc["out"], F.array(F.trim(s))).alias("out"))),
        lambda acc: acc["out"])


# ──────────────────────────────────────────────────────────────────
# v1 — catalog knowledge (tail-page scan)
# ──────────────────────────────────────────────────────────────────

def knowledge_scan_pages(docs: DataFrame) -> DataFrame:
    """``docs``: (doc_id long, page_count int, pdf_on_disk boolean,
    n_products int).

    One row per candidate tail page per scannable doc:
    ``scan_count = min(10, max(1, page_count // 4))`` over the LAST
    pages (knowledge_extractor.py:148-155); docs without a PDF on disk
    or without products emit a single page_idx=-1 row with the skip
    status (:281-288)."""
    scan = F.least(F.lit(MAX_PAGES_TO_SCAN),
                   F.greatest(F.lit(1),
                              F.floor(F.col("page_count") / 4)
                              .cast("int")))
    start = F.greatest(F.lit(0), F.col("page_count") - scan)
    skipped = (
        docs.where(~F.col("pdf_on_disk") | (F.col("n_products") <= 0))
        .select("doc_id", "n_products",
                F.lit(-1).alias("page_idx"),
                F.when(~F.col("pdf_on_disk"), F.lit("skipped_no_pdf"))
                .otherwise(F.lit("skipped_no_products"))
                .alias("status")))
    pages = (
        docs.where(F.col("pdf_on_disk") & (F.col("n_products") > 0))
        .select("doc_id", "n_products",
                F.explode(F.sequence(start, F.col("page_count") - 1))
                .alias("page_idx"),
                F.lit("scanned").alias("status")))
    return pages.unionByName(skipped)


def knowledge_page_outcomes(scan: DataFrame,
                            vision: DataFrame) -> DataFrame:
    """Per-page kb_doc derivation (knowledge_extractor.py:313-378).

    ``vision``: (doc_id, page_idx, render_ok boolean, ok boolean,
    page_type string, title string, content_markdown string,
    key_points array<string>, certifications array<string>) — ``ok``
    false models a failed/unparseable Claude call.

    Status ladder: skipped_* (from the scan plan) → render_error →
    no_data → no_content (``page_type == 'none' or not raw markdown``,
    pre-strip: a whitespace-only page IS content) → created."""
    v = vision.select(
        "doc_id", "page_idx", "render_ok", "ok",
        F.coalesce(F.col("page_type"), F.lit("none")).alias("ptype"),
        F.col("title").alias("v_title"),
        F.col("content_markdown").alias("raw_md"),
        "key_points", "certifications")
    j = scan.join(v, ["doc_id", "page_idx"], "left")
    content = F.trim(F.coalesce(F.col("raw_md"), F.lit("")))
    created = (
        (F.col("status") == "scanned") & F.col("render_ok")
        & F.col("ok") & (F.col("ptype") != "none")
        & F.coalesce(F.col("raw_md") != "", F.lit(False)))
    status = (
        F.when(F.col("status") != "scanned", F.col("status"))
        .when(~F.coalesce(F.col("render_ok"), F.lit(False)),
              F.lit("render_error"))
        .when(~F.coalesce(F.col("ok"), F.lit(False)), F.lit("no_data"))
        .when(~created, F.lit("no_content"))
        .otherwise(F.lit("created")))
    # title: strip FIRST, then fall back (1-based page number) — :349
    title = F.when(
        F.trim(F.coalesce(F.col("v_title"), F.lit(""))) != "",
        F.trim(F.col("v_title"))
    ).otherwise(F.concat(F.initcap(F.col("ptype")), F.lit(" (page "),
                         (F.col("page_idx") + 1).cast("string"),
                         F.lit(")")))
    kp = F.coalesce(F.col("key_points"), _empty())
    summary = F.when(
        F.size(kp) > 0,
        F.substring(F.array_join(F.slice(kp, 1, 3), " "), 1, 500)
    ).otherwise(F.substring(content, 1, 300))
    rel = F.coalesce(
        F.element_at(_rel_map(PAGE_TYPE_TO_RELATIONSHIP),
                     F.col("ptype")),
        F.lit("related"))
    return j.select(
        "doc_id", "page_idx",
        status.alias("status"),
        F.when(created, F.col("ptype")).alias("page_type"),
        F.when(created, title).alias("title"),
        F.when(created, content).alias("content"),
        F.when(created, summary).alias("summary"),
        F.when(created, rel).alias("relationship_type"),
        F.when(created, F.col("n_products")).otherwise(F.lit(0))
        .alias("attach_count"))


def collect_knowledge_certs(scan: DataFrame,
                            vision: DataFrame) -> DataFrame:
    """Catalog-level cert set (knowledge_extractor.py:328-341):
    collected from every parsed page REGARDLESS of page_type, in page
    order; strip → drop empty → first-wins on the normalized key —
    but empty NORMS survive (only the pre-norm empty string is
    dropped). Returns (doc_id, certifications array<string>)."""
    rows = (
        scan.where(F.col("status") == "scanned")
        .join(vision.where(F.col("render_ok") & F.col("ok")),
              ["doc_id", "page_idx"])
        .select("doc_id", "page_idx",
                F.filter(
                    F.transform(
                        F.coalesce(F.col("certifications"), _empty()),
                        lambda c: F.trim(F.coalesce(c, F.lit("")))),
                    lambda c: c != "").alias("certs")))
    per_doc = (
        rows.groupBy("doc_id")
        .agg(F.flatten(F.array_sort(F.collect_list(
            F.struct(F.col("page_idx").alias("p"),
                     F.col("certs").alias("c"))))
            .getField("c")).alias("all_certs")))
    folded = F.aggregate(
        F.col("all_certs"),
        F.struct(_empty().alias("norms"), _empty().alias("out")),
        lambda acc, c: F.when(
            F.array_contains(acc["norms"], _norm(c)), acc,
        ).otherwise(F.struct(
            F.concat(acc["norms"], F.array(_norm(c))).alias("norms"),
            F.concat(acc["out"], F.array(c)).alias("out"))),
        lambda acc: acc["out"])
    return per_doc.select("doc_id",
                          folded.alias("certifications"))


# ──────────────────────────────────────────────────────────────────
# v2 — structured legend extraction
# ──────────────────────────────────────────────────────────────────

def legend_page_plan(docs: DataFrame) -> DataFrame:
    """``docs``: (doc_id long, page_count int, force boolean,
    already_extracted boolean, legend_pages
    array<struct<legend_type string, pages array<int>>>).

    Emits (doc_id, seq, legend_type, page_idx, status):
    - ``skipped_idempotent`` when already extracted and not forced
      (legend_extractor_v2.py:381-389);
    - last-12-page ``unknown`` fallback when NO classified type has
      pages (:391-407, ``not any(values)``);
    - ``skipped_empty`` for null/empty page lists (:421-423);
    - ``skipped_no_prompt`` for types outside the six prompts (:426-431
      — these still suppress the fallback);
    - ``scheduled`` otherwise, seq preserving dict-then-list order."""
    lp = F.coalesce(
        F.col("legend_pages"),
        F.array().cast(
            "array<struct<legend_type:string,pages:array<int>>>"))
    idem = (~F.col("force")) & F.col("already_extracted")
    skipped = (docs.where(idem)
               .select("doc_id", F.lit(-1).alias("seq"),
                       F.lit(None).cast("string").alias("legend_type"),
                       F.lit(-1).alias("page_idx"),
                       F.lit("skipped_idempotent").alias("status")))
    live = docs.where(~idem)
    any_pages = F.exists(
        lp, lambda e: e["pages"].isNotNull() & (F.size(e["pages"]) > 0))
    fallback = live.where(~any_pages).select(
        "doc_id",
        F.posexplode(F.sequence(
            F.greatest(F.lit(0),
                       F.col("page_count") - LEGEND_FALLBACK_PAGES),
            F.col("page_count") - 1)).alias("pos", "page_idx"),
    ).select("doc_id", F.col("pos").alias("seq"),
             F.lit("unknown").alias("legend_type"), "page_idx",
             F.lit("scheduled").alias("status"))
    entries = (live.where(any_pages)
               .select("doc_id",
                       F.posexplode(lp).alias("tpos", "entry")))
    known = F.col("entry.legend_type").isin(*PROMPT_ORDER)
    empty_e = (F.col("entry.pages").isNull()
               | (F.size(F.col("entry.pages")) == 0))
    non_sched = entries.where(empty_e | ~known).select(
        "doc_id", (F.col("tpos") * 100).alias("seq"),
        F.col("entry.legend_type").alias("legend_type"),
        F.lit(-1).alias("page_idx"),
        F.when(empty_e, F.lit("skipped_empty"))
        .otherwise(F.lit("skipped_no_prompt")).alias("status"))
    sched = entries.where(~empty_e & known).select(
        "doc_id", "tpos",
        F.col("entry.legend_type").alias("legend_type"),
        F.posexplode(F.col("entry.pages")).alias("ppos", "page_idx"),
    ).select("doc_id", (F.col("tpos") * 100 + F.col("ppos"))
             .alias("seq"), "legend_type", "page_idx",
             F.lit("scheduled").alias("status"))
    return skipped.unionByName(fallback).unionByName(non_sched) \
                  .unionByName(sched)


def extract_legend_pages(plan: DataFrame, vision: DataFrame,
                         renders: DataFrame) -> DataFrame:
    """Resolve each scheduled page against the per-prompt vision table
    (legend_extractor_v2.py:433-486).

    ``vision``: (doc_id, page_idx, prompt_type, ok boolean, score int,
    title, content_markdown, certifications array<string>,
    applies_globally boolean,
    icons array<struct<category string, code string>>) — ``score`` is
    the populated-field count the reference computes at :455; absent /
    ok=false rows model ``_call_claude`` returning None.
    ``renders``: (doc_id, page_idx, render_ok boolean).

    Known types take their own prompt's result (any truthy dict);
    ``unknown`` pages try every prompt and keep the strictly-best
    score (dict-order first-wins on ties) gated at >= 3 (:447-474).
    Non-scheduled plan rows pass through with their skip status."""
    passthrough = plan.where(F.col("status") != "scheduled")
    sched = (plan.where(F.col("status") == "scheduled")
             .join(renders, ["doc_id", "page_idx"], "left"))
    bad_render = sched.where(
        ~F.coalesce(F.col("render_ok"), F.lit(False))).select(
        "doc_id", "seq", "legend_type", "page_idx",
        F.lit("render_error").alias("status"))
    good = sched.where(F.coalesce(F.col("render_ok"), F.lit(False)))
    vis = vision.select(
        "doc_id", "page_idx", "prompt_type", "ok", "score",
        F.col("title").alias("v_title"),
        F.col("content_markdown").alias("v_md"),
        F.col("certifications").alias("v_certs"),
        F.col("applies_globally").alias("v_glob"),
        F.col("icons").alias("v_icons"))
    known = (
        good.where(F.col("legend_type") != "unknown")
        .join(vis.where(F.col("ok"))
              .withColumn("legend_type", F.col("prompt_type")),
              ["doc_id", "page_idx", "legend_type"], "left"))
    order = F.array(*[F.lit(t) for t in PROMPT_ORDER])
    unk_rows = (
        good.where(F.col("legend_type") == "unknown")
        .join(vis.where(F.col("ok") & (F.col("score") > 0)),
              ["doc_id", "page_idx"], "left"))
    w = Window.partitionBy("doc_id", "page_idx").orderBy(
        F.col("score").desc(),
        F.array_position(order, F.col("prompt_type")).asc())
    unk = (unk_rows
           .withColumn("_rn", F.row_number().over(w))
           .where(F.col("_rn") == 1)
           .withColumn(
               "_win",
               F.col("prompt_type").isNotNull()
               & (F.col("score") >= UNKNOWN_MIN_SCORE)))
    def _out(df, won):
        return df.select(
            "doc_id", "seq", "legend_type", "page_idx",
            F.when(won, F.lit("extracted")).otherwise(F.lit("no_data"))
            .alias("status"),
            F.when(won, F.col("prompt_type")).alias("resolved_type"),
            F.when(won, F.col("v_title")).alias("title"),
            F.when(won, F.col("v_md")).alias("content_markdown"),
            F.when(won, F.col("v_certs")).alias("certifications"),
            F.when(won, F.coalesce(F.col("v_glob"), F.lit(False)))
            .otherwise(F.lit(False)).alias("applies_globally"),
            F.when(won, F.col("v_icons")).alias("icons"))
    known_o = _out(known, F.coalesce(F.col("ok"), F.lit(False)))
    unk_o = _out(unk, F.col("_win"))
    pass_o = passthrough.select(
        "doc_id", "seq", "legend_type", "page_idx", "status",
        F.lit(None).cast("string").alias("resolved_type"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("content_markdown"),
        F.lit(None).cast("array<string>").alias("certifications"),
        F.lit(False).alias("applies_globally"),
        F.lit(None).cast(
            "array<struct<category:string,code:string>>")
        .alias("icons"))
    bad_o = bad_render.select(
        "doc_id", "seq", "legend_type", "page_idx", "status",
        F.lit(None).cast("string").alias("resolved_type"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("content_markdown"),
        F.lit(None).cast("array<string>").alias("certifications"),
        F.lit(False).alias("applies_globally"),
        F.lit(None).cast(
            "array<struct<category:string,code:string>>")
        .alias("icons"))
    return known_o.unionByName(unk_o).unionByName(pass_o) \
                  .unionByName(bad_o)


def collect_legend_certs(extracted: DataFrame) -> DataFrame:
    """Catalog-wide certification set (legend_extractor_v2.py:488-502):
    per extracted legend, its string ``certifications`` entries, plus —
    only for globally-applying ``icons`` legends — icon codes whose
    category is ``certification``; processing order, then
    ``_dedupe_norm``. Returns (doc_id, certifications)."""
    icon_codes = F.when(
        F.col("applies_globally") & (F.col("resolved_type") == "icons"),
        F.transform(
            F.filter(
                F.coalesce(F.col("icons"), F.array().cast(
                    "array<struct<category:string,code:string>>")),
                lambda i: (F.coalesce(i["category"], F.lit(""))
                           == "certification")
                & (F.coalesce(i["code"], F.lit("")) != "")),
            lambda i: i["code"])
    ).otherwise(_empty())
    contrib = F.concat(
        F.filter(F.coalesce(F.col("certifications"), _empty()),
                 lambda c: c.isNotNull()),
        icon_codes)
    per_doc = (
        extracted.where(F.col("status") == "extracted")
        .select("doc_id", "seq", contrib.alias("certs"))
        .groupBy("doc_id")
        .agg(F.flatten(F.array_sort(F.collect_list(
            F.struct(F.col("seq").alias("s"),
                     F.col("certs").alias("c"))))
            .getField("c")).alias("all_certs")))
    return per_doc.select(
        "doc_id", _dedupe_norm(F.col("all_certs"))
        .alias("certifications"))


# ──────────────────────────────────────────────────────────────────
# Shared — propagation + v2 kb docs
# ──────────────────────────────────────────────────────────────────

def propagate_certs(products: DataFrame, doc_certs: DataFrame, *,
                    source_label: str, rededupe: bool) -> DataFrame:
    """Merge the catalog cert set into each product's
    ``compliance.certifications``.

    ``products``: (product_id, doc_id, existing array<string>).
    v1 (``rededupe=False``, knowledge_extractor.py:486-497): existing
    list kept VERBATIM (duplicates survive), unseen catalog certs
    appended in order. v2 (``rededupe=True``,
    legend_extractor_v2.py:528-532): the whole existing+catalog list
    goes through ``_dedupe_norm`` — existing duplicates collapse and
    entries are re-stripped. Docs with an empty catalog set are not
    touched (both files gate on the set being non-empty)."""
    dc = doc_certs.select("doc_id",
                          F.col("certifications").alias("catalog"))
    j = products.join(dc, "doc_id", "left")
    existing = F.coalesce(F.col("existing"), _empty())
    has = F.coalesce(F.size(F.col("catalog")) > 0, F.lit(False))
    if rededupe:
        merged = _dedupe_norm(F.concat(existing, F.col("catalog")))
    else:
        merged = F.aggregate(
            F.col("catalog"),
            F.struct(
                F.transform(existing, _norm).alias("norms"),
                existing.alias("out")),
            lambda acc, c: F.when(
                F.array_contains(acc["norms"], _norm(c)), acc,
            ).otherwise(F.struct(
                F.concat(acc["norms"], F.array(_norm(c)))
                .alias("norms"),
                F.concat(acc["out"], F.array(c)).alias("out"))),
            lambda acc: acc["out"])
    return j.select(
        "product_id", "doc_id",
        F.when(has, merged).otherwise(existing)
        .alias("certifications"),
        F.when(has, F.lit(source_label)).alias("certifications_source"),
        has.alias("updated"),
        F.when(has, F.lit(0.9)).otherwise(F.lit(0.0))
        .alias("provenance_confidence"))


def legend_kb_docs(extracted: DataFrame,
                   product_counts: DataFrame) -> DataFrame:
    """One kb_doc per extracted legend with non-empty STRIPPED markdown
    (legend_extractor_v2.py:583-607): title ``or``-falls-back BEFORE
    strip (whitespace-only titles become ''), summary = content[:300],
    relationship from the six-entry map (default ``related``), one
    attachment per product. ``product_counts``: (doc_id, n_products)."""
    content = F.trim(F.coalesce(F.col("content_markdown"), F.lit("")))
    title = F.trim(F.when(
        F.coalesce(F.col("title"), F.lit("")) == "",
        F.concat(F.initcap(F.col("resolved_type")), F.lit(" Legend"))
    ).otherwise(F.col("title")))
    rel = F.coalesce(
        F.element_at(_rel_map(LEGEND_TYPE_TO_RELATIONSHIP),
                     F.col("resolved_type")),
        F.lit("related"))
    rows = (extracted
            .where((F.col("status") == "extracted") & (content != ""))
            .select("doc_id", "seq",
                    F.col("page_idx").alias("source_page_index"),
                    F.col("resolved_type").alias("legend_type"),
                    title.alias("title"),
                    content.alias("content"),
                    F.substring(content, 1, 300).alias("summary"),
                    rel.alias("relationship_type")))
    pc = product_counts.select(
        "doc_id", F.coalesce(F.col("n_products"), F.lit(0))
        .alias("attach_count"))
    return rows.join(pc, "doc_id", "left").select(
        "doc_id", "seq", "source_page_index", "legend_type", "title",
        "content", "summary", "relationship_type",
        F.coalesce(F.col("attach_count"), F.lit(0))
        .alias("attach_count"))


# ──────────────────────────────────────────────────────────────────
# Deterministic synthesis (contract-query inputs) + DuckDB twins
# ──────────────────────────────────────────────────────────────────

def _synth_certs(h):
    """Shared certification-list variants: case/hyphen duplicates, an
    empty-norm survivor ('- -'), padded and empty entries."""
    return (F.when(h % 6 == 0, F.lit(None).cast("array<string>"))
            .when(h % 6 == 1, _empty())
            .when(h % 6 == 2, F.array(F.lit("ISO 9001"),
                                      F.lit("iso-9001"), F.lit(" CE ")))
            .when(h % 6 == 3, F.array(F.lit("EN 14411"), F.lit("- -")))
            .when(h % 6 == 4, F.array(F.lit("LEED"), F.lit("leed"),
                                      F.lit("")))
            .otherwise(F.array(F.lit("ISO 14001"), F.lit("CE"))))


_CERTS_SQL = """CASE CAST({h} % 6 AS INT)
  WHEN 0 THEN NULL WHEN 1 THEN CAST([] AS VARCHAR[])
  WHEN 2 THEN ['ISO 9001', 'iso-9001', ' CE ']
  WHEN 3 THEN ['EN 14411', '- -']
  WHEN 4 THEN ['LEED', 'leed', '']
  ELSE ['ISO 14001', 'CE'] END"""


def synth_knowledge_docs(docs: DataFrame) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    return d.select(
        F.col("doc").alias("doc_id"),
        (F.col("doc") % 53 + 2).cast("int").alias("page_count"),
        (F.col("doc") % 23 != 0).alias("pdf_on_disk"),
        (F.col("doc") % 7).cast("int").alias("n_products"))


def synth_knowledge_vision(scan: DataFrame) -> DataFrame:
    h = (F.col("doc_id") * 131 + F.col("page_idx") * 17)
    return (scan.where(F.col("status") == "scanned")
            .select("doc_id", "page_idx")
            .select(
                "doc_id", "page_idx",
                (h % 19 != 0).alias("render_ok"),
                (h % 11 != 0).alias("ok"),
                F.element_at(F.array(
                    F.lit("iconography"), F.lit("packing"),
                    F.lit("regulation"), F.lit("installation"),
                    F.lit("care"), F.lit("sustainability"),
                    F.lit("certification"), F.lit("legal"),
                    F.lit("brand"), F.lit("none"),
                    F.lit(None).cast("string")),
                    (h % 11 + 1).cast("int")).alias("page_type"),
                F.element_at(F.array(
                    F.lit("Tech Legend "), F.lit("  "), F.lit(""),
                    F.lit(None).cast("string")),
                    (h % 4 + 1).cast("int")).alias("title"),
                F.element_at(F.array(
                    F.lit(None).cast("string"), F.lit(""),
                    F.lit("   "), F.lit("# Packing | a | b |"),
                    F.lit("Standards: EN 14411 text")),
                    (h % 5 + 1).cast("int")).alias("content_markdown"),
                F.when(h % 3 == 0, F.array(
                    F.lit("kp one"), F.lit("kp two"),
                    F.lit("kp three"), F.lit("kp four")))
                .when(h % 3 == 1, _empty())
                .otherwise(F.lit(None).cast("array<string>"))
                .alias("key_points"),
                _synth_certs(h).alias("certifications")))


def synth_products(docs: DataFrame) -> DataFrame:
    """(product_id, doc_id, existing) — doc % 7 products per doc with
    existing cert lists exercising dup/padding/hyphen collisions."""
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    rows = (d.where(F.col("doc") % 7 > 0)
            .select("doc", F.explode(F.sequence(
                F.lit(1), (F.col("doc") % 7).cast("int"))).alias("i")))
    k = (F.col("doc") * 7 + F.col("i")) % 5
    existing = (
        F.when(k == 0, F.lit(None).cast("array<string>"))
        .when(k == 1, _empty())
        .when(k == 2, F.array(F.lit("CE"), F.lit("ce"),
                              F.lit("ISO 9001")))
        .when(k == 3, F.array(F.lit(" LEED ")))
        .otherwise(F.array(F.lit("EN-14411"))))
    return rows.select(
        (F.col("doc") * 10 + F.col("i")).alias("product_id"),
        F.col("doc").alias("doc_id"),
        existing.alias("existing"))


def synth_legend_docs(docs: DataFrame) -> DataFrame:
    d = docs.select(F.col("doc_id").cast("long").alias("doc"))
    ltype = "array<struct<legend_type:string,pages:array<int>>>"

    def e(t, pages):
        if pages is None:
            parr = F.lit(None).cast("array<int>")
        else:
            parr = F.array(*[F.lit(p).cast("int") for p in pages]) \
                if pages else F.array().cast("array<int>")
        return F.struct(F.lit(t).alias("legend_type"),
                        parr.alias("pages"))

    m = F.col("doc") % 6
    lp = (F.when(m == 0, F.lit(None).cast(ltype))
          .when(m == 1, F.array(e("icons", [2, 5]),
                                e("certification", [7])))
          .when(m == 2, F.array(e("packing", [1, 2])))
          .when(m == 3, F.array(e("regulation", []), e("care", None)))
          .when(m == 4, F.array(e("installation", [3]),
                                e("regulation", [3])))
          .otherwise(F.array(e("sustainability", [0]),
                             e("bogus", [1]))))
    return d.select(
        F.col("doc").alias("doc_id"),
        (F.col("doc") % 53 + 2).cast("int").alias("page_count"),
        (F.col("doc") % 13 == 0).alias("force"),
        (F.col("doc") % 5 == 0).alias("already_extracted"),
        lp.alias("legend_pages"))


def synth_legend_renders(plan: DataFrame) -> DataFrame:
    return (plan.where(F.col("status") == "scheduled")
            .select("doc_id", "page_idx").distinct()
            .select("doc_id", "page_idx",
                    ((F.col("doc_id") * 131 + F.col("page_idx") * 17)
                     % 19 != 0).alias("render_ok")))


def synth_legend_vision(plan: DataFrame) -> DataFrame:
    pages = (plan.where(F.col("status") == "scheduled")
             .select("doc_id", "page_idx").distinct())
    prompts = pages.sparkSession.createDataFrame(
        [(i, t) for i, t in enumerate(PROMPT_ORDER)],
        "pidx int, prompt_type string")
    g = (F.col("doc_id") * 977 + F.col("page_idx") * 31
         + F.col("pidx") * 7)
    icons_t = "array<struct<category:string,code:string>>"

    def ic(cat, code):
        return F.struct(
            (F.lit(cat) if cat is not None
             else F.lit(None).cast("string")).alias("category"),
            (F.lit(code) if code is not None
             else F.lit(None).cast("string")).alias("code"))

    return (pages.crossJoin(F.broadcast(prompts))
            .select(
                "doc_id", "page_idx", "prompt_type",
                (g % 9 != 0).alias("ok"),
                (g % 7).cast("int").alias("score"),
                F.element_at(F.array(
                    F.lit("Legend Title"), F.lit("   "),
                    F.lit(None).cast("string")),
                    (g % 3 + 1).cast("int")).alias("title"),
                F.element_at(F.array(
                    F.lit(None).cast("string"), F.lit(""), F.lit("  "),
                    F.lit("## Icons R10 R11 table"),
                    F.lit("Care with neutral pH")),
                    (g % 5 + 1).cast("int")).alias("content_markdown"),
                _synth_certs(g).alias("certifications"),
                (g % 4 == 0).alias("applies_globally"),
                F.when(g % 5 == 0, F.lit(None).cast(icons_t))
                .when(g % 5 == 1, F.array().cast(icons_t))
                .when(g % 5 == 2, F.array(
                    ic("certification", "CE"),
                    ic("slip_resistance", "R10")))
                .when(g % 5 == 3, F.array(
                    ic("certification", ""),
                    ic("certification", None),
                    ic("certification", "ISO 9001")))
                .otherwise(F.array(ic("pei_rating", "PEI IV")))
                .alias("icons")))


# ──────────────────────────────────────────────────────────────────
# DuckDB twin CTE blocks (kept in expression-lockstep with the synth
# + operators above; composed by __spark_entry__.oracle_sql)
# ──────────────────────────────────────────────────────────────────

_TYPES_IN = ("('icons','regulation','certification','installation',"
             "'care','sustainability')")

DUCK_KNOWLEDGE_BASE_SQL = f"""
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
kd AS (SELECT doc, CAST(doc % 53 + 2 AS INT) AS pc,
              doc % 23 != 0 AS pdf_on_disk,
              CAST(doc % 7 AS INT) AS n_products FROM docs),
kscan AS (
  SELECT doc, n_products,
         unnest(generate_series(
             GREATEST(0, pc - LEAST(10, GREATEST(1, pc // 4))),
             pc - 1)) AS page_idx,
         'scanned' AS status
  FROM kd WHERE pdf_on_disk AND n_products > 0
  UNION ALL
  SELECT doc, n_products, -1 AS page_idx,
         CASE WHEN NOT pdf_on_disk THEN 'skipped_no_pdf'
              ELSE 'skipped_no_products' END AS status
  FROM kd WHERE (NOT pdf_on_disk) OR n_products <= 0),
kvish AS (SELECT doc, page_idx, doc*131 + page_idx*17 AS h
          FROM kscan WHERE status = 'scanned'),
kvis AS (
  SELECT doc, page_idx,
         h % 19 != 0 AS render_ok,
         h % 11 != 0 AS ok,
         (['iconography','packing','regulation','installation','care',
           'sustainability','certification','legal','brand','none',
           NULL])[CAST(h % 11 AS INT) + 1] AS page_type,
         (['Tech Legend ','  ','',NULL])[CAST(h % 4 AS INT) + 1]
           AS title,
         ([NULL,'','   ','# Packing | a | b |',
           'Standards: EN 14411 text'])[CAST(h % 5 AS INT) + 1]
           AS raw_md,
         CASE CAST(h % 3 AS INT)
           WHEN 0 THEN ['kp one','kp two','kp three','kp four']
           WHEN 1 THEN CAST([] AS VARCHAR[]) ELSE NULL END
           AS key_points,
         {_CERTS_SQL.format(h='h')} AS certifications
  FROM kvish)"""

DUCK_KNOWLEDGE_PAGES_SQL = """
kjoin AS (
  SELECT s.doc, s.page_idx, s.n_products, s.status AS sstatus,
         v.render_ok, v.ok,
         COALESCE(v.page_type, 'none') AS ptype,
         v.title AS v_title, v.raw_md, v.key_points
  FROM kscan s LEFT JOIN kvis v
    ON s.doc = v.doc AND s.page_idx = v.page_idx),
kladder AS (
  SELECT doc AS doc_id, page_idx,
         CASE WHEN sstatus != 'scanned' THEN sstatus
              WHEN NOT COALESCE(render_ok, false) THEN 'render_error'
              WHEN NOT COALESCE(ok, false) THEN 'no_data'
              WHEN ptype = 'none' OR raw_md IS NULL OR raw_md = ''
                THEN 'no_content'
              ELSE 'created' END AS status,
         trim(COALESCE(raw_md, '')) AS content_s,
         ptype, v_title, key_points, n_products
  FROM kjoin),
kpages AS (
  SELECT doc_id, page_idx, status,
         CASE WHEN status = 'created' THEN ptype END AS page_type,
         CASE WHEN status = 'created' THEN
           CASE WHEN trim(COALESCE(v_title,'')) != ''
                THEN trim(v_title)
                ELSE upper(substr(ptype,1,1)) || substr(ptype,2)
                     || ' (page ' || CAST(page_idx + 1 AS VARCHAR)
                     || ')' END
         END AS title,
         CASE WHEN status = 'created' THEN content_s END AS content,
         CASE WHEN status = 'created' THEN
           CASE WHEN len(COALESCE(key_points,
                                  CAST([] AS VARCHAR[]))) > 0
             THEN substr(array_to_string(
                      list_slice(key_points, 1, 3), ' '), 1, 500)
             ELSE substr(content_s, 1, 300) END
         END AS summary,
         CASE WHEN status = 'created' THEN
           CASE ptype
             WHEN 'iconography' THEN 'related'
             WHEN 'packing' THEN 'specification'
             WHEN 'regulation' THEN 'specification'
             WHEN 'installation' THEN 'specification'
             WHEN 'care' THEN 'supplementary'
             WHEN 'sustainability' THEN 'supplementary'
             WHEN 'certification' THEN 'certification'
             WHEN 'legal' THEN 'related'
             WHEN 'brand' THEN 'related'
             ELSE 'related' END
         END AS relationship_type,
         CASE WHEN status = 'created' THEN n_products ELSE 0 END
           AS attach_count
  FROM kladder)"""

DUCK_KNOWLEDGE_CERTS_SQL = """
kparsed AS (
  SELECT s.doc, s.page_idx, v.certifications
  FROM kscan s JOIN kvis v
    ON s.doc = v.doc AND s.page_idx = v.page_idx
  WHERE s.status = 'scanned' AND v.render_ok AND v.ok),
kcitems AS (
  SELECT doc, page_idx, i,
         trim(COALESCE(certifications[i], '')) AS cert
  FROM (SELECT doc, page_idx, certifications,
               unnest(generate_series(1, len(certifications))) AS i
        FROM kparsed WHERE certifications IS NOT NULL)),
kckept AS (
  SELECT doc, page_idx, i, cert,
         regexp_replace(lower(cert), '[ -]', '', 'g') AS norm
  FROM kcitems WHERE cert != ''),
kcfirst AS (
  SELECT doc, cert, page_idx, i FROM kckept
  QUALIFY row_number() OVER (PARTITION BY doc, norm
                             ORDER BY page_idx, i) = 1),
kcerts AS (
  SELECT p.doc AS doc_id,
         COALESCE(c.certs, CAST([] AS VARCHAR[])) AS certifications
  FROM (SELECT DISTINCT doc FROM kparsed) p
  LEFT JOIN (SELECT doc, array_agg(cert ORDER BY page_idx, i) AS certs
             FROM kcfirst GROUP BY doc) c ON p.doc = c.doc)"""

DUCK_PRODUCTS_SQL = """
prod AS (
  SELECT doc*10 + i AS product_id, doc,
         CASE CAST((doc*7 + i) % 5 AS INT)
           WHEN 0 THEN NULL WHEN 1 THEN CAST([] AS VARCHAR[])
           WHEN 2 THEN ['CE','ce','ISO 9001']
           WHEN 3 THEN [' LEED ']
           ELSE ['EN-14411'] END AS existing
  FROM (SELECT doc, unnest(generate_series(1, doc % 7)) AS i
        FROM docs WHERE doc % 7 > 0))"""

DUCK_LEGEND_BASE_SQL = f"""
docs AS (SELECT CAST(doc_id AS BIGINT) AS doc FROM documents),
ld AS (
  SELECT doc, CAST(doc % 53 + 2 AS INT) AS pc,
         doc % 13 = 0 AS force_f,
         doc % 5 = 0 AS already_extracted,
         CASE CAST(doc % 6 AS INT)
           WHEN 0 THEN NULL
           WHEN 1 THEN [{{'legend_type': 'icons', 'pages': [2,5]}},
                        {{'legend_type': 'certification',
                          'pages': [7]}}]
           WHEN 2 THEN [{{'legend_type': 'packing', 'pages': [1,2]}}]
           WHEN 3 THEN [{{'legend_type': 'regulation',
                          'pages': CAST([] AS INT[])}},
                        {{'legend_type': 'care',
                          'pages': CAST(NULL AS INT[])}}]
           WHEN 4 THEN [{{'legend_type': 'installation',
                          'pages': [3]}},
                        {{'legend_type': 'regulation', 'pages': [3]}}]
           ELSE [{{'legend_type': 'sustainability', 'pages': [0]}},
                 {{'legend_type': 'bogus', 'pages': [1]}}]
         END AS lp
  FROM docs),
lskip AS (
  SELECT doc, -1 AS seq, CAST(NULL AS VARCHAR) AS legend_type,
         -1 AS page_idx, 'skipped_idempotent' AS status
  FROM ld WHERE (NOT force_f) AND already_extracted),
lany AS (
  SELECT *, len(list_filter(COALESCE(lp, CAST([] AS
             STRUCT(legend_type VARCHAR, pages INT[])[])),
             e -> e.pages IS NOT NULL AND len(e.pages) > 0)) > 0
           AS any_pages
  FROM ld WHERE NOT ((NOT force_f) AND already_extracted)),
lfall AS (
  SELECT doc, CAST(page_idx - GREATEST(0, pc - 12) AS INT) AS seq,
         'unknown' AS legend_type, page_idx, 'scheduled' AS status
  FROM (SELECT doc, pc,
               unnest(generate_series(GREATEST(0, pc - 12), pc - 1))
                 AS page_idx
        FROM lany WHERE NOT any_pages)),
lentries AS (
  SELECT doc, t, lp[t] AS e
  FROM (SELECT doc, lp, unnest(generate_series(1, len(lp))) AS t
        FROM lany WHERE any_pages)),
lnons AS (
  SELECT doc, (t-1)*100 AS seq, e.legend_type AS legend_type,
         -1 AS page_idx,
         CASE WHEN e.pages IS NULL OR len(e.pages) = 0
              THEN 'skipped_empty'
              ELSE 'skipped_no_prompt' END AS status
  FROM lentries
  WHERE e.pages IS NULL OR len(e.pages) = 0
     OR e.legend_type NOT IN {_TYPES_IN}),
lsched AS (
  SELECT doc, (t-1)*100 + (p-1) AS seq, legend_type,
         pages[p] AS page_idx, 'scheduled' AS status
  FROM (SELECT doc, t, e.legend_type AS legend_type,
               e.pages AS pages,
               unnest(generate_series(1, len(e.pages))) AS p
        FROM lentries
        WHERE e.pages IS NOT NULL AND len(e.pages) > 0
          AND e.legend_type IN {_TYPES_IN})),
lplan AS (
  SELECT * FROM lskip UNION ALL SELECT * FROM lfall
  UNION ALL SELECT * FROM lnons UNION ALL SELECT * FROM lsched),
lpp AS (SELECT DISTINCT doc, page_idx FROM lplan
        WHERE status = 'scheduled'),
lrend AS (SELECT doc, page_idx,
                 (doc*131 + page_idx*17) % 19 != 0 AS render_ok
          FROM lpp),
lvisg AS (
  SELECT doc, page_idx, pidx,
         (['icons','regulation','certification','installation','care',
           'sustainability'])[CAST(pidx AS INT) + 1] AS prompt_type,
         doc*977 + page_idx*31 + pidx*7 AS g
  FROM lpp, (SELECT unnest(generate_series(0, 5)) AS pidx)),
lvis AS (
  SELECT doc, page_idx, pidx, prompt_type,
         g % 9 != 0 AS ok,
         CAST(g % 7 AS INT) AS score,
         (['Legend Title', '   ', NULL])[CAST(g % 3 AS INT) + 1]
           AS title,
         ([NULL, '', '  ', '## Icons R10 R11 table',
           'Care with neutral pH'])[CAST(g % 5 AS INT) + 1] AS md,
         {_CERTS_SQL.format(h='g')} AS certs,
         g % 4 = 0 AS vglob,
         CASE CAST(g % 5 AS INT)
           WHEN 0 THEN NULL
           WHEN 1 THEN CAST([] AS
                STRUCT(category VARCHAR, code VARCHAR)[])
           WHEN 2 THEN [{{'category': 'certification', 'code': 'CE'}},
                        {{'category': 'slip_resistance',
                          'code': 'R10'}}]
           WHEN 3 THEN [{{'category': 'certification', 'code': ''}},
                        {{'category': 'certification',
                          'code': NULL}},
                        {{'category': 'certification',
                          'code': 'ISO 9001'}}]
           ELSE [{{'category': 'pei_rating', 'code': 'PEI IV'}}]
         END AS icons
  FROM lvisg),
lgood AS (
  SELECT s.doc, s.seq, s.legend_type, s.page_idx,
         COALESCE(r.render_ok, false) AS render_ok
  FROM (SELECT * FROM lplan WHERE status = 'scheduled') s
  LEFT JOIN lrend r ON s.doc = r.doc AND s.page_idx = r.page_idx),
lkn AS (
  SELECT s.doc, s.seq, s.legend_type, s.page_idx,
         v.ok, v.prompt_type, v.title, v.md, v.certs, v.vglob, v.icons
  FROM lgood s LEFT JOIN (SELECT * FROM lvis WHERE ok) v
    ON s.doc = v.doc AND s.page_idx = v.page_idx
       AND v.prompt_type = s.legend_type
  WHERE s.render_ok AND s.legend_type != 'unknown'),
lunk_c AS (
  SELECT s.doc, s.seq, s.legend_type, s.page_idx,
         v.prompt_type, v.score, v.pidx, v.title, v.md, v.certs,
         v.vglob, v.icons
  FROM lgood s
  LEFT JOIN (SELECT * FROM lvis WHERE ok AND score > 0) v
    ON s.doc = v.doc AND s.page_idx = v.page_idx
  WHERE s.render_ok AND s.legend_type = 'unknown'),
lunk AS (
  SELECT * FROM lunk_c
  QUALIFY row_number() OVER (PARTITION BY doc, page_idx
      ORDER BY score DESC NULLS LAST, pidx ASC NULLS LAST) = 1),
lex AS (
  SELECT doc, seq, legend_type, page_idx,
         CASE WHEN COALESCE(ok, false) THEN 'extracted'
              ELSE 'no_data' END AS status,
         CASE WHEN COALESCE(ok, false) THEN prompt_type END
           AS resolved_type,
         CASE WHEN COALESCE(ok, false) THEN title END AS title,
         CASE WHEN COALESCE(ok, false) THEN md END
           AS content_markdown,
         CASE WHEN COALESCE(ok, false) THEN certs END
           AS certifications,
         CASE WHEN COALESCE(ok, false) THEN COALESCE(vglob, false)
              ELSE false END AS applies_globally,
         CASE WHEN COALESCE(ok, false) THEN icons END AS icons
  FROM lkn
  UNION ALL
  SELECT doc, seq, legend_type, page_idx,
         CASE WHEN won THEN 'extracted' ELSE 'no_data' END,
         CASE WHEN won THEN prompt_type END,
         CASE WHEN won THEN title END,
         CASE WHEN won THEN md END,
         CASE WHEN won THEN certs END,
         CASE WHEN won THEN COALESCE(vglob, false) ELSE false END,
         CASE WHEN won THEN icons END
  FROM (SELECT *, prompt_type IS NOT NULL AND score >= 3 AS won
        FROM lunk)
  UNION ALL
  SELECT doc, seq, legend_type, page_idx, 'render_error',
         NULL, NULL, NULL, CAST(NULL AS VARCHAR[]), false,
         CAST(NULL AS STRUCT(category VARCHAR, code VARCHAR)[])
  FROM lgood WHERE NOT render_ok
  UNION ALL
  SELECT doc, seq, legend_type, page_idx, status,
         NULL, NULL, NULL, CAST(NULL AS VARCHAR[]), false,
         CAST(NULL AS STRUCT(category VARCHAR, code VARCHAR)[])
  FROM lplan WHERE status != 'scheduled')"""

DUCK_LEGEND_CERTS_SQL = """
lexr AS (SELECT * FROM lex WHERE status = 'extracted'),
lcontrib AS (
  SELECT doc, seq,
         list_filter(COALESCE(certifications, CAST([] AS VARCHAR[])),
                     c -> c IS NOT NULL)
         || CASE WHEN applies_globally AND resolved_type = 'icons'
              THEN list_transform(
                     list_filter(COALESCE(icons, CAST([] AS
                         STRUCT(category VARCHAR, code VARCHAR)[])),
                       i -> COALESCE(i.category, '') = 'certification'
                            AND COALESCE(i.code, '') != ''),
                     i -> i.code)
              ELSE CAST([] AS VARCHAR[]) END AS certs
  FROM lexr),
lcit AS (
  SELECT doc, seq, i, certs[i] AS s
  FROM (SELECT doc, seq, certs,
               unnest(generate_series(1, len(certs))) AS i
        FROM lcontrib)),
lckept AS (
  SELECT doc, seq, i, trim(s) AS out,
         regexp_replace(lower(s), '[ -]', '', 'g') AS norm
  FROM lcit WHERE s IS NOT NULL
    AND regexp_replace(lower(s), '[ -]', '', 'g') != ''),
lcfirst AS (
  SELECT doc, out, seq, i FROM lckept
  QUALIFY row_number() OVER (PARTITION BY doc, norm
                             ORDER BY seq, i) = 1),
lcerts AS (
  SELECT p.doc AS doc_id,
         COALESCE(c.certs, CAST([] AS VARCHAR[])) AS certifications
  FROM (SELECT DISTINCT doc FROM lexr) p
  LEFT JOIN (SELECT doc, array_agg(out ORDER BY seq, i) AS certs
             FROM lcfirst GROUP BY doc) c ON p.doc = c.doc)"""

DUCK_LEGEND_PROP_SQL = """
pj AS (
  SELECT p.product_id, p.doc,
         COALESCE(p.existing, CAST([] AS VARCHAR[])) AS existing,
         COALESCE(c.certifications, CAST([] AS VARCHAR[])) AS catalog,
         COALESCE(len(c.certifications) > 0, false) AS has
  FROM prod p LEFT JOIN lcerts c ON p.doc = c.doc_id),
pm AS (SELECT product_id, doc, existing, has,
              existing || catalog AS m FROM pj),
pit AS (SELECT product_id, i, m[i] AS s
        FROM (SELECT product_id, m,
                     unnest(generate_series(1, len(m))) AS i
              FROM pm WHERE has)),
pkept AS (SELECT product_id, i, trim(s) AS out,
                 regexp_replace(lower(s), '[ -]', '', 'g') AS norm
          FROM pit WHERE s IS NOT NULL
            AND regexp_replace(lower(s), '[ -]', '', 'g') != ''),
pfirst AS (SELECT product_id, out, i FROM pkept
           QUALIFY row_number() OVER (PARTITION BY product_id, norm
                                      ORDER BY i) = 1),
pagg AS (SELECT product_id, array_agg(out ORDER BY i) AS merged
         FROM pfirst GROUP BY product_id),
prop AS (
  SELECT pm.product_id, pm.doc AS doc_id,
         CASE WHEN pm.has
              THEN COALESCE(a.merged, CAST([] AS VARCHAR[]))
              ELSE pm.existing END AS certifications,
         CASE WHEN pm.has THEN 'catalog_legend' END
           AS certifications_source,
         pm.has AS updated,
         CASE WHEN pm.has THEN CAST(0.9 AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS provenance_confidence
  FROM pm LEFT JOIN pagg a ON pm.product_id = a.product_id)"""

DUCK_KNOWLEDGE_PROP_SQL = """
pj1 AS (
  SELECT p.product_id, p.doc,
         COALESCE(p.existing, CAST([] AS VARCHAR[])) AS existing,
         COALESCE(c.certifications, CAST([] AS VARCHAR[])) AS catalog,
         COALESCE(len(c.certifications) > 0, false) AS has
  FROM prod p LEFT JOIN kcerts c ON p.doc = c.doc_id),
prop1 AS (
  SELECT product_id, doc AS doc_id,
         CASE WHEN has THEN existing ||
           list_filter(catalog, c -> NOT list_contains(
             list_transform(existing,
               x -> regexp_replace(lower(x), '[ -]', '', 'g')),
             regexp_replace(lower(c), '[ -]', '', 'g')))
         ELSE existing END AS certifications,
         CASE WHEN has THEN 'catalog_knowledge' END
           AS certifications_source,
         has AS updated,
         CASE WHEN has THEN CAST(0.9 AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS provenance_confidence
  FROM pj1)"""

DUCK_LEGEND_KB_SQL = """
lkb AS (
  SELECT doc AS doc_id, seq, page_idx AS source_page_index,
         resolved_type AS legend_type,
         trim(CASE WHEN COALESCE(title, '') = ''
                   THEN upper(substr(resolved_type, 1, 1))
                        || substr(resolved_type, 2) || ' Legend'
                   ELSE title END) AS title,
         trim(COALESCE(content_markdown, '')) AS content,
         substr(trim(COALESCE(content_markdown, '')), 1, 300)
           AS summary,
         CASE resolved_type
           WHEN 'icons' THEN 'related'
           WHEN 'regulation' THEN 'specification'
           WHEN 'certification' THEN 'certification'
           WHEN 'installation' THEN 'specification'
           WHEN 'care' THEN 'supplementary'
           WHEN 'sustainability' THEN 'supplementary'
           ELSE 'related' END AS relationship_type,
         CAST(doc % 7 AS INT) AS attach_count
  FROM lex
  WHERE status = 'extracted'
    AND trim(COALESCE(content_markdown, '')) != '')"""
