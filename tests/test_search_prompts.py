"""Transcription pins for the search-prompt folds
(operators/search_prompts.py) vs search_prompt_service.py:330-546
re-implementations."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import search_prompts as sp

SF = "/root/testdata/sf0.001/documents.parquet"


def _doc_ids(spark):
    return [r.d for r in spark.read.parquet(SF).select(
        F.col("doc_id").cast("long").alias("d")).distinct().collect()]


def ref_enhance(query, prompt_text):
    """_simple_enhancement:462-487 verbatim."""
    enhanced = query
    if "→" in prompt_text or "->" in prompt_text:
        for line in prompt_text.split("\n"):
            if "→" in line or "->" in line:
                parts = line.split("→" if "→" in line else "->")
                if len(parts) == 2:
                    keyword = parts[0].strip().strip('"') \
                        .strip("'").strip('-').strip()
                    expansion = parts[1].strip()
                    if keyword.lower() in query.lower():
                        enhanced = f"{query} {expansion}"
                        break
    return enhanced


def test_enhancement_matches_reference(spark):
    got = {r.req_id: (r.enhanced_query, r.expanded)
           for r in sp.simple_enhancement(sp.synth_enhance_reqs(
               spark.read.parquet(SF))).collect()}
    expanded_seen = plain_seen = empty_kw = False
    for doc in _doc_ids(spark):
        q = sp.QUERIES[doc % len(sp.QUERIES)]
        p = sp.ENHANCE_PROMPTS[doc % len(sp.ENHANCE_PROMPTS)]
        want = ref_enhance(q, p)
        assert got[doc][0] == want, (doc, got[doc][0], want)
        if got[doc][1]:
            expanded_seen = True
        else:
            plain_seen = True
        if p.startswith("a → b") and got[doc][1]:
            # the '' keyword line matched (the a→b→c line is 3-part)
            assert want.endswith("matches everything")
            empty_kw = True
    assert expanded_seen and plain_seen and empty_kw


def _rows_for(doc):
    out = []
    for i in range(doc % 6 + 3):
        h = doc * 53 + i * 11
        out.append({
            "idx": i,
            "score": (h % 40) * 0.25,
            "availability": ["in_stock", "out_of_stock",
                             "OUT_OF_STOCK", "", None][h % 5],
            "price": None if h % 4 == 0 else (h % 900) * 0.5,
            "discontinued": h % 7 == 0})
    return out


def test_formatting_matches_reference(spark):
    got = {}
    for r in sp.simple_formatting(sp.synth_format_rows(
            spark.read.parquet(SF))).collect():
        got[(r.req_id, r.idx)] = r.rank
    for doc in _doc_ids(spark):
        rows = _rows_for(doc)
        prompt = sp.FORMAT_PROMPTS[doc % len(sp.FORMAT_PROMPTS)]
        ordered = list(rows)
        if "availability" in prompt.lower():
            ordered.sort(key=lambda x: (
                (x["availability"] or "") == "in_stock",
                x["score"]), reverse=True)
        elif "price" in prompt.lower():
            ordered.sort(key=lambda x: float(
                x["price"] if x["price"] is not None else 999999))
        for rank, row in enumerate(ordered):
            assert got[(doc, row["idx"])] == rank, (doc, row)


def test_filtering_matches_reference(spark):
    got = {(r.req_id, r.idx): (r.kept, r.drop_reason)
           for r in sp.simple_filtering(sp.synth_filter_rows(
               spark.read.parquet(SF))).collect()}
    for doc in _doc_ids(spark):
        prompt = sp.FILTER_PROMPTS[doc % len(sp.FILTER_PROMPTS)].lower()
        for row in _rows_for(doc):
            kept = True
            if ("out of stock" in prompt or "out-of-stock" in prompt) \
                    and (row["availability"] or "").lower() \
                    == "out_of_stock":
                kept = False
            if kept and "discontinued" in prompt \
                    and row["discontinued"]:
                kept = False
            assert got[(doc, row["idx"])][0] == kept, (doc, row)


def ref_reorder(n, order):
    items = list(range(n))
    if order is None or any(i < -n for i in order):
        return items, False
    reordered = [items[i] for i in order if i < n]
    included = set(order)
    reordered += [items[i] for i in range(n) if i not in included]
    return reordered, True


def test_reorder_matches_reference(spark):
    got = {}
    applied = {}
    for r in sp.llm_reorder(sp.synth_order_reqs(
            spark.read.parquet(SF), key="order")).collect():
        got.setdefault(r.req_id, {})[r.position] = r.idx
        applied[r.req_id] = r.llm_applied
    saw_dup = False
    for doc in _doc_ids(spark):
        n = doc % 4 + 2
        order = [list(reversed(range(n))), [-1, 0], [1, 99, 1],
                 None, [0]][doc % 5]
        want, ok = ref_reorder(n, order)
        seq = [got[doc][p] for p in range(len(got[doc]))]
        assert seq == want, (doc, seq, want)
        assert applied[doc] == ok
        if doc % 5 == 1:
            # [-1, 0] wrap: last item emitted via -1 AND again in the
            # tail (its positive index is not in the order list)
            assert seq.count(n - 1) == 2
            saw_dup = True
    assert saw_dup


def test_filter_keep_matches_reference(spark):
    got = {}
    for r in sp.llm_filter_keep(sp.synth_order_reqs(
            spark.read.parquet(SF), key="keep")).collect():
        got.setdefault(r.req_id, {})[r.position] = r.idx
    for doc in _doc_ids(spark):
        n = doc % 4 + 2
        keep = [list(reversed(range(n))), [-1, 0], [1, 99, 1],
                None, [0]][doc % 5]
        items = list(range(n))
        want = ([items[i] for i in keep if i < n]
                if keep is not None else [])
        seq = [got.get(doc, {})[p]
               for p in range(len(got.get(doc, {})))]
        assert seq == want, (doc, seq, want)
