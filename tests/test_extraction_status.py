"""Transcription pins for the extraction-status rollup
(operators/extraction_status.py) vs a literal replay of the reference's
document_extraction_status fold (internal_routes.py:2107-2267) over
nested-dict metadata rebuilt from the same synthesized entries."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import extraction_status as es

SF = "/root/testdata/sf0.001/documents.parquet"

CRITICAL_FIELDS = [
    "factory_name", "material_category", "dimensions",
    "material_properties.finish", "material_properties.body_type",
    "material_properties.thickness_mm", "packaging.pieces_per_box",
    "packaging.m2_per_box", "packaging.weight_per_box_kg",
    "packaging.boxes_per_pallet", "appearance.primary_color_hex",
    "performance.slip_resistance", "performance.pei_rating",
    "compliance.certifications", "application.recommended_use",
]


def _doc_ids(spark):
    return [r.d for r in spark.read.parquet(SF).select(
        F.col("doc_id").cast("long").alias("d")).distinct().collect()]


def _synth_metadata(doc, j):
    """Rebuild the product's nested metadata dict from the entry synth."""
    p = (doc * 10 + j) % 4
    crit_n = [3, 8, 12, 15][p]
    fill_n = [1, 8, 12, 30][p]
    md = {}
    crit = [f.split(".") for f in CRITICAL_FIELDS]
    for i in range(crit_n):
        parts = crit[i]
        value = "" if (i == 2 and p == 0) else f"v{i}"
        if len(parts) == 1:
            md[parts[0]] = value
        else:
            md.setdefault(parts[0], {})[parts[1]] = value
    for i in range(15, 15 + fill_n):
        md.setdefault("extra", {})[f"k{i}"] = f"v{i}"
    em = {}
    for i, src in ((45, "chunks"), (46, "vision"), (47, "")):
        em[f"field{i}"] = {"source": src}
    if p in (1, 3):
        em["field48"] = {"source": "chunks"}
    md["_extraction_metadata"] = em
    md.setdefault("catalog_layout", {})["analyzed_at"] = "2026-01-01"
    return md


# --- the reference fold, replayed literally (:2169-2231) ---------------

def _get_nested(md, path):
    cur = md
    for part in path.split("."):
        if not isinstance(cur, dict):
            return None
        cur = cur.get(part)
        if cur in (None, "", [], {}):
            return None
    return cur


def _count_populated(md):
    n = 0
    for section, val in (md or {}).items():
        if section.startswith("_") or section == "catalog_layout":
            continue
        if isinstance(val, dict):
            n += sum(1 for x in val.values() if x not in (None, "", [], {}))
        elif val not in (None, "", [], {}):
            n += 1
    return n


def _source_breakdown(md):
    em = md.get("_extraction_metadata") or {}
    breakdown = {}
    for _field, info in em.items():
        if isinstance(info, dict):
            src = info.get("source") or "unknown"
            breakdown[src] = breakdown.get(src, 0) + 1
    return breakdown


def ref_product_rows(docs):
    rows = {}
    for doc in docs:
        if doc % 7 == 0:
            continue
        for j in range(3):
            md = _synth_metadata(doc, j)
            populated = _count_populated(md)
            missing = [f for f in CRITICAL_FIELDS
                       if _get_nested(md, f) is None]
            pct = min(100, int((populated / 40) * 100))
            name = "" if (doc + j) % 11 == 0 else f"P{doc * 10 + j}"
            bd = _source_breakdown(md)
            rows[(doc, doc * 10 + j)] = {
                "name": name or "?",
                "populated_fields": populated,
                "coverage_pct": pct,
                "missing_critical": "|".join(missing),
                "source_breakdown": "|".join(
                    f"{k}:{v}" for k, v in sorted(bd.items())),
                "bucket": ("0-25%" if pct < 25 else
                           "25-50%" if pct < 50 else
                           "50-75%" if pct < 75 else "75-100%"),
            }
    return rows


def test_product_coverage_matches_reference_fold(spark):
    docs = spark.read.parquet(SF)
    got = {(r.doc_id, r.product_id): r.asDict() for r in
           es.product_coverage(es.synth_status_products(docs),
                               es.synth_status_entries(docs)).collect()}
    want = ref_product_rows(_doc_ids(spark))
    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        for col, val in w.items():
            assert g[col] == val, (key, col, g[col], val)


def test_doc_rollup_matches_reference_fold(spark):
    docs = spark.read.parquet(SF)
    cov = es.product_coverage(es.synth_status_products(docs),
                              es.synth_status_entries(docs))
    got = {r.doc_id: r.asDict() for r in
           es.document_status(es.synth_status_docs(docs), cov).collect()}
    prows = ref_product_rows(_doc_ids(spark))
    for doc in _doc_ids(spark):
        pcts = [v["coverage_pct"] for (d, _), v in prows.items()
                if d == doc]
        total = len(pcts)
        g = got[doc]
        assert g["total_products"] == total
        want_avg = round(sum(pcts) / total, 1) if total else 0.0
        assert abs(g["average_coverage_pct"] - want_avg) < 1e-9
        analyzed = doc % 3 != 1
        extracted = doc % 4 != 2
        legend_pages = (doc % 5) if analyzed else 0
        issues = []
        if not analyzed:
            issues.append("layer1_not_run")
        if not extracted:
            issues.append("layer2_not_run")
        if legend_pages == 0:
            issues.append("no_legend_pages")
        if total == 0:
            issues.append("no_products")
        assert g["issues"] == "|".join(issues), (doc, g["issues"], issues)
        if not extracted:
            assert g["legend_types_found"] == ""
            assert g["global_certifications"] == ""
        buckets = [v["bucket"] for (d, _), v in prows.items() if d == doc]
        assert g["b_0_25"] == buckets.count("0-25%")
        assert g["b_75_100"] == buckets.count("75-100%")


def test_extract_product_text_ignores_page_range():
    """internal_routes.py:179-194 — the page range is deliberately
    ignored ('can be enhanced'); both branches return full_text."""
    def ref_extract_product_text(full_text, page_range):
        if not page_range:
            return full_text
        return full_text

    assert ref_extract_product_text("all pages", []) == "all pages"
    assert ref_extract_product_text("all pages", [3, 4]) == "all pages"


def test_present_but_empty_critical_is_missing():
    """p=0 products carry dimensions='' — populated must NOT count it
    and missing_critical must include it."""
    md = _synth_metadata(1, 1)  # product 11, p=3: everything populated
    assert _count_populated(md) == 45
    md0 = _synth_metadata(1, 3 - 1)  # find a p=0 product: 12 % 4 == 0
    assert (1 * 10 + 2) % 4 == 0
    assert _get_nested(md0, "dimensions") is None
    assert _count_populated(md0) == 3
