"""Pins for the Stage-2 chunking plan (operators/stage2_plan vs
app/api/pdf_processing/stage_2_chunking.py:52-331 and
stage_1_layout_precompute.py:728-745)."""

from mivaa_pdf_extractor_spark.operators import stage2_plan as s2


def _page_text_from_regions(regions):
    """Transcription of page_text_from_layout_regions
    (stage_1_layout_precompute.py:728-745)."""
    if not regions:
        return ""
    ordered = sorted(
        (e for e in regions if (e["text_content"] or "").strip()),
        key=lambda e: (e["reading_order"]
                       if e["reading_order"] is not None else 1_000_000),
    )
    return "\n".join((e["text_content"] or "").strip()
                     for e in ordered).strip()


def _reference_plan(pages_rows):
    """Transcription of process_product_chunking's deterministic core
    (stage_2_chunking.py:52-331) over one product's synth pages."""
    by_page = {r["phys_page"]: r for r in pages_rows}
    any_row = pages_rows[0]
    enable_layout = any_row["enable_layout"]
    outer_fail = any_row["outer_fail"]

    # Priority 1: Stage-1.5 cache — pages whose region LIST is truthy,
    # regardless of cache_status; failed pages counted independently.
    layout_regions_by_page = {}
    failed_pages = []
    strategy = "no_layout_regions"
    if enable_layout:
        cached = {p: list(r["regions"]) for p, r in by_page.items()
                  if r["cache_status"] != "missing" and r["regions"]}
        failed_pages = [p for p, r in by_page.items()
                        if r["cache_status"] in ("ocr_failed",
                                                 "page_failed")]
        if cached:
            layout_regions_by_page = cached
            strategy = "stage_1_5_cache"
    # Priority 2: caller regions, only if Priority 1 produced nothing.
    if not layout_regions_by_page:
        caller = {p: list(r["caller_regions"]) for p, r in by_page.items()
                  if r["caller_regions"]}
        if caller:
            layout_regions_by_page = caller
            strategy = "caller_provided_regions"

    pages_with_regions = len(layout_regions_by_page)
    stage15_failed = len(failed_pages) if enable_layout else 0

    page_rows_out = {}
    page_chunks_data = []
    total_chars = 0
    fallback_failed = 0
    if outer_fail:
        # fitz.open threw: the loop never ran — even cached text is lost.
        for p in by_page:
            page_rows_out[p] = ("doc_open_failed", None, None)
    else:
        for p in sorted(by_page):
            r = by_page[p]
            page_text = _page_text_from_regions(
                layout_regions_by_page.get(p) or [])
            src = ("layout_cache" if strategy == "stage_1_5_cache"
                   else "caller_regions")
            if not page_text:
                if r["page_throws"]:
                    fallback_failed += 1
                    page_rows_out[p] = ("failed_skip", None, None)
                    continue
                page_text = r["layer_text"]
                src = "text_layer"
            if not page_text or not page_text.strip():
                page_rows_out[p] = ("dropped_empty", None, None)
                continue
            page_chunks_data.append((p - 1, page_text))
            total_chars += len(page_text)
            page_rows_out[p] = (src, p - 1, page_text)

    status = None
    if not page_chunks_data:
        status = "failed" if outer_fail else "no_text"
    return {
        "strategy": strategy,
        "pages_with_regions": pages_with_regions,
        "total_pages": len(by_page),
        "stage15_failed_pages": stage15_failed,
        "pages_extracted": len(page_chunks_data),
        "total_chars": total_chars,
        "fallback_failed_pages": fallback_failed,
        "pages_chunked": len(by_page) if page_chunks_data else 0,
        "chunking_status": status,
    }, page_rows_out


def _collect(spark, n=1000):
    ev = spark.range(0, n).withColumnRenamed("id", "event_id")
    pages = s2.synth_pages(ev)
    rows = [r.asDict(recursive=True) for r in pages.collect()]
    by_prod = {}
    for r in rows:
        by_prod.setdefault(r["product_id"], []).append(r)
    return ev, pages, by_prod


def test_chunk_plan_matches_reference_transcription(spark):
    ev, pages, by_prod = _collect(spark)
    got = {r["product_id"]: r.asDict() for r in
           s2.chunk_plan(pages, s2.synth_products(ev)).collect()}
    assert set(got) == set(range(50))
    statuses = set()
    strategies = set()
    for pid, prows in by_prod.items():
        want, _ = _reference_plan(prows)
        g = got[pid]
        for k, v in want.items():
            assert g[k] == v, (pid, k, g[k], v)
        statuses.add(g["chunking_status"])
        strategies.add(g["strategy"])
    # every ladder branch and both zero-chunk statuses exercised
    assert strategies == {"stage_1_5_cache", "caller_provided_regions",
                          "no_layout_regions"}
    assert statuses == {None, "failed", "no_text"}
    # page-less product (p%37==21): no_text with all-zero stats
    empty = got[21]
    assert empty["chunking_status"] == "no_text"
    assert empty["total_pages"] == 0
    assert empty["strategy"] == "no_layout_regions"


def test_page_texts_match_reference_transcription(spark):
    ev, pages, by_prod = _collect(spark)
    got = {}
    for r in s2.page_texts(pages).collect():
        got[(r["product_id"], r["phys_page"])] = r.asDict()
    sources = set()
    for pid, prows in by_prod.items():
        _, want_pages = _reference_plan(prows)
        for p, (src, meta, text) in want_pages.items():
            g = got[(pid, p)]
            assert g["source"] == src, (pid, p, g["source"], src)
            assert g["page_meta"] == meta
            assert g["text"] == text
            assert g["text_len"] == (len(text) if text is not None
                                     else None)
            sources.add(src)
    assert sources == {"layout_cache", "caller_regions", "text_layer",
                       "failed_skip", "dropped_empty", "doc_open_failed"}


def test_region_join_pins(spark):
    """Direct pins on page_text_from_layout_regions semantics: strip
    filter, None reading_order → 1e6, stable ties."""
    df = spark.createDataFrame(
        [(1, [{"text_content": "  b  ", "reading_order": 2},
              {"text_content": None, "reading_order": 0},
              {"text_content": "   ", "reading_order": 0},
              {"text_content": "tie-first", "reading_order": 1},
              {"text_content": "tie-second", "reading_order": 1},
              {"text_content": "late-null", "reading_order": None},
              {"text_content": "a", "reading_order": 0}])],
        "id int, regions array<struct<text_content:string,"
        "reading_order:int>>")
    out = df.select(s2.regions_text("regions").alias("t")).collect()[0]
    assert out["t"] == "a\ntie-first\ntie-second\nb\nlate-null"


def test_failed_status_row_with_regions_still_cached(spark):
    """A cache row marked ocr_failed whose regions carry text still
    contributes to the cache map (the reference filters on regions
    truthiness, not status) AND is counted failed."""
    pages = spark.createDataFrame(
        [(1, 1, "ocr_failed",
          [{"text_content": "kept text", "reading_order": 0}],
          [], "layer", False, True, False)],
        "product_id long, phys_page int, cache_status string, "
        "regions array<struct<text_content:string,reading_order:int>>, "
        "caller_regions array<struct<text_content:string,"
        "reading_order:int>>, layer_text string, page_throws boolean, "
        "enable_layout boolean, outer_fail boolean")
    prods = pages.select("product_id").distinct()
    row = s2.chunk_plan(pages, prods).collect()[0]
    assert row["strategy"] == "stage_1_5_cache"
    assert row["stage15_failed_pages"] == 1
    assert row["pages_with_regions"] == 1
    assert row["total_chars"] == len("kept text")
