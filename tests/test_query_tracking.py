"""Pins for query tracking (operators/query_tracking.py) vs a
transcription of search_query_tracker.py:188-214."""

from mivaa_pdf_extractor_spark.operators import query_tracking as qt


def ref_terms(query_text, meta, meta_list):
    terms = []
    md = dict(meta or {})
    for k, v in (meta_list or {}).items():
        md[k] = v
    for value in md.values():
        if isinstance(value, str):
            terms.append(value.lower())
        elif isinstance(value, list):
            terms.extend([str(v).lower() for v in value])
    if query_text:
        sw = set(qt.STOPWORDS)
        terms.extend([w for w in query_text.lower().split()
                      if w not in sw and len(w) > 2])
    return sorted(set(terms))


def test_terms_match_reference(spark):
    cases = [
        (0, "Show me the shiny tiles for a bathroom",
         {"finish": "Shiny", "color": "OFF WHITE"}, None),
        (1, "find AN oak veneer to go WITH it", None,
         {"tags": ["Glam", "the"]}),
        (2, "at on in or but", None, None),
        (3, None, {"size": "XL"}, None),
    ]
    df = spark.createDataFrame(
        [(i, t, m, ml, 3, 0, 7) for i, t, m, ml in cases],
        "qid long, query_text string, meta map<string,string>, "
        "meta_list map<string,array<string>>, result_count int, "
        "total_ms int, response_time_ms int")
    got = {r.qid: r for r in qt.extract_search_terms(df).collect()}
    for i, t, m, ml in cases:
        want = ",".join(ref_terms(t, m, ml))
        assert got[i].searched_terms_csv == want, (i, want)
    # metadata bypasses the stopword filter: 'the' from tags survives
    assert "the" in got[1].searched_terms_csv.split(",")
    # 'XL' (len 2) survives via metadata, would fail the word filter
    assert got[3].searched_terms_csv == "xl"
    # total_ms 0 -> response_time fallback
    assert got[0].total_ms_out == 7
