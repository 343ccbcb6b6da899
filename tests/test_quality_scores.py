"""Pins for the quality scoring tier (operators/quality_scores.py)
vs a transcription of real_quality_scoring_service.py."""

from mivaa_pdf_extractor_spark.operators import quality_scores as qs


def ref_chunk(content, stored_coh, metadata_n, has_emb):
    n = len(content)
    if 500 <= n <= 1500:
        clen = 1.0
    elif 300 <= n < 500 or 1500 < n <= 2000:
        clen = 0.8
    elif 200 <= n < 300 or 2000 < n <= 2500:
        clen = 0.6
    else:
        clen = 0.4
    coh = stored_coh
    if coh == 0:
        kw = sum(1 for k in qs.COHERENCE_KEYWORDS
                 if k in content.lower())
        avg = len(content) / max(len(content.split(".")), 1)
        coh = (min(1.0, kw / 3) * 0.6
               + (1.0 if 50 <= avg <= 150 else 0.7) * 0.4)
    st = content.strip()
    boundary = ((1.0 if st.endswith((".", "!", "?", ":", ";"))
                 else 0.6) * 0.6
                + (1.0 if st and st[0].isupper() else 0.7) * 0.4)
    meta = min(1.0, metadata_n / 5)
    emb = 1.0 if has_emb else 0.0
    q = (clen * 0.20 + coh * 0.25 + boundary * 0.20 + meta * 0.15
         + emb * 0.20)
    return clen, coh, boundary, q


def test_chunk_scores_match_reference(spark):
    rows = [
        (0, "Solid intro." + " the material surface has a fine"
            " texture." * 12, 0.0, 3, True),
        (1, "lower case, no ending", 0.0, 7, False),
        (2, "Stored wins.", 0.5, 0, True),
        (3, "x" * 1600 + ".", 0.0, 5, True),
        (4, "", 0.0, 0, False),
    ]
    df = spark.createDataFrame(
        rows, "chunk_id long, content string, coherence_score double, "
              "metadata_n int, has_embedding boolean")
    got = {r.chunk_id: r for r in qs.score_chunks(df).collect()}
    for cid, content, coh0, mn, he in rows:
        clen, coh, boundary, q = ref_chunk(content, coh0, mn, he)
        g = got[cid]
        assert abs(g.content_length_score - clen) < 1e-12, cid
        assert abs(g.coherence - coh) < 1e-12, cid
        assert abs(g.boundary_quality - boundary) < 1e-12, cid
        # floor-form round == python round away from exact midpoints
        assert abs(g.quality_score - round(q, 3)) <= 0.001, cid
    assert got[2].coherence == 0.5   # stored non-zero wins


def test_product_ladders(spark):
    rows = [
        # 8 valid props, all text rich, everything maxed
        (0, "Valencia Grande XL", "d" * 250, "l" * 600,
         {f"k{i}": f"v{i}" for i in range(8)}, True, 6, 6, 0.9, 0.1),
        # invalid property values filtered
        (1, "Tile", None, None,
         {"a": "unknown", "b": "N/A", "c": "", "d": "real"},
         False, 0, 0, 0.0, 0.75),
    ]
    df = spark.createDataFrame(
        rows, "product_id long, name string, description string, "
              "long_description string, "
              "properties map<string,string>, "
              "has_text_embedding boolean, n_related_images int, "
              "n_related_products int, conf_meta double, "
              "conf_props double")
    got = {r.product_id: r for r in qs.score_products(df).collect()}
    assert got[0].metadata_completeness == 1.0
    assert got[0].material_properties == 1.0
    assert got[0].confidence_score == 0.9
    # 1 valid of 4 -> 0.30; conf falls back to properties
    assert got[1].material_properties == 0.30
    assert got[1].confidence_score == 0.75
    # name 'Tile' (4 chars) -> 0.10; props present -> +0.25
    assert abs(got[1].metadata_completeness - 0.35) < 1e-12


def test_image_dimension_ladder(spark):
    rows = [(0, 800, 600), (1, 799, 600), (2, 600, 400),
            (3, 400, 300), (4, 10, 10)]
    df = spark.createDataFrame(
        [(i, False, False, False, w, h, 0, False, False, None)
         for i, w, h in rows],
        "image_id long, has_vision boolean, has_claude boolean, "
        "has_clip boolean, width int, height int, n_props int, "
        "has_slig boolean, has_understanding boolean, "
        "confidence double")
    got = {r.image_id: r.dimensions_quality
           for r in qs.score_images(df).collect()}
    assert [got[i] for i in range(5)] == [1.0, 0.8, 0.8, 0.6, 0.4]
