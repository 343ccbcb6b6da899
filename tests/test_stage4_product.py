"""Transcription tests for the per-product pipeline folds.

Replays ``app/api/pdf_processing/product_processor.py``'s resume
ladder (:90-270), the Stage-4 metadata merge (:745-848) and
``update_product_progress`` (:1123-1163) literally over the same
synthesized inputs.
"""

import pytest

from mivaa_pdf_extractor_spark.operators import stage4_product as s4

DOCS = list(range(1, 121))


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame([(d,) for d in DOCS], "doc_id long")


def _synth_history(p):
    out = []
    for e in range(3):
        k = p * 43 + e
        if k % 4 == 0:
            continue
        stage = ["chunks_created", "images_extracted",
                 "products_created", "relationships_created",
                 "completed"][k % 5]
        status = "completed_empty" if k % 6 == 0 else "completed"
        ck = k % 40 if k % 7 >= 3 else None
        im = k % 30 if k % 11 >= 6 else None
        out.append((stage, status, ck, im))
    return out


def _ref_resume(p):
    """Literal replay of the resume ladder with the synth inputs."""
    tracker_ok = p % 23 != 0
    prior_db_id = p % 4 != 0
    ckpt_read_ok = p % 13 != 0
    db_check_ok = p % 9 != 0
    chunk_count = 0 if p % 3 == 0 else (p * 31) % 45
    image_count = 0 if p % 5 == 1 else (p * 37) % 40

    skip_chunking = skip_images = False
    deleted_partial = False
    partial_image_resume = None
    expected_chunks = expected_images = None
    prior_stages = set()
    if not tracker_ok:
        # outer except: everything defaults
        return (False, False, False, False, False, None, None)
    if p % 6 == 0:
        prior_stages.add("chunks_created")
    if p % 7 == 0:
        prior_stages.add("images_extracted")
    if p % 17 == 0:
        prior_stages.add("relationships_created")
    if p % 19 == 0:
        prior_stages.add("completed")
    if p % 11 == 0:
        prior_stages.add("products_created")
    if ckpt_read_ok:
        for stage, status, ck, im in _synth_history(p):
            if status == "completed_empty":
                continue
            prior_stages.add(stage)
            if ck is not None:
                expected_chunks = max(expected_chunks or 0, ck)
            if im is not None:
                expected_images = max(expected_images or 0, im)
    if prior_db_id and db_check_ok:
        if chunk_count > 0 and expected_chunks is not None \
                and chunk_count >= expected_chunks:
            prior_stages.add("chunks_created")
        elif chunk_count > 0:
            deleted_partial = True
        if image_count > 0 and expected_images is not None \
                and image_count >= expected_images:
            prior_stages.add("images_extracted")
        elif image_count > 0:
            prior_stages.add("images_extracted")
            partial_image_resume = True
    if "relationships_created" in prior_stages \
            or "completed" in prior_stages:
        # whole-product skip: returns BEFORE flags + stamp
        return (True, False, False, deleted_partial, False,
                expected_chunks, expected_images)
    skip_chunking = "chunks_created" in prior_stages
    skip_images = "images_extracted" in prior_stages
    resume_incomplete = bool(partial_image_resume and prior_db_id)
    return (False, skip_chunking, skip_images, deleted_partial,
            resume_incomplete, expected_chunks, expected_images)


def test_resume_decision_matches_reference_replay(spark, docs_df):
    got = {r.product: (r.skip_all, r.skip_chunking, r.skip_images,
                       r.deleted_partial_chunks, r.resume_incomplete,
                       r.expected_chunks, r.expected_images)
           for r in s4.resume_decision(
               s4.synth_tracker(docs_df), s4.synth_history(docs_df),
               s4.synth_db_state(docs_df)).collect()}
    for p in DOCS:
        assert got[p] == _ref_resume(p), f"product {p}"
    # branch coverage
    assert any(v[0] for v in got.values())          # skip_all
    assert any(v[3] for v in got.values())          # partial delete
    assert any(v[4] for v in got.values())          # resume_incomplete
    # pinned ordering: some product deletes partial chunks AND skips all
    assert any(v[0] and v[3] for v in got.values())


def _ref_merge_dicts(p):
    """Rebuild existing / extracted / chunk-aggregated dicts from the
    synthesis, then run the reference merge loop verbatim."""
    def arr_or(mod, mk):
        if p % mod == 0:
            return None
        if p % mod == 1:
            return []
        return mk
    existing = {
        "dimensions": arr_or(3, [f"d{p % 6}", "z9x9"]),
        "available_colors": arr_or(4, [f"c{p % 3}"]),
        "key_features": arr_or(5, [f"f{p % 7}"]),
        "material_properties": {},
        "studio_name": "" if p % 8 == 0 else (
            f"ExStudio{p % 3}" if p % 8 < 4 else None),
        "finish": f"matte{p % 2}" if p % 9 < 4 else None,
    }
    if p % 6 < 2:
        existing["material_properties"]["materials_mentioned"] = \
            [f"m{p % 5}"]
    if p % 7 < 3:
        existing["material_properties"]["grade"] = f"grade{p % 2}"
    extracted = {
        "dimensions": (None if p % 5 == 0 else
                       [] if p % 5 == 1 else
                       [f"d{p % 8}", f"x{p % 4}"]),
        "studio_name": "" if p % 4 == 0 else (
            f"XStudio{p % 5}" if p % 4 == 1 else None),
        "finish": f"gloss{p % 3}" if p % 3 == 0 else None,
    }

    # chunk rollup replay (:745-805)
    agg = {"dims": set(), "cols": set(), "mats": set(),
           "feats": set()}
    studio_name = None
    for ci in range(4):
        h = p * 37 + ci
        def add(key, mod, s_str, s_list):
            v = h % mod
            if v == 0:
                if s_str.strip():
                    agg[key].add(s_str.strip())
            elif v == 1:
                agg[key].update(x for x in s_list if x.strip())
        add("dims", 5, f" d{h % 9}x{h % 7} ",
            [f"d{h % 6}", f" d{h % 4}"])
        add("cols", 6, f" c{h % 5}", [f"c{h % 3}", " ", f" c{h % 8}"])
        add("mats", 7, f"m{h % 4}", [f"m{h % 5}"])
        add("feats", 4, f"f{h % 6}", [f"f{h % 7}", f"f{h % 2}"])
        if not studio_name:
            sn = (f" Studio{h % 3} " if h % 8 == 0 else
                  "  " if h % 8 == 1 else None)
            if isinstance(sn, str) and sn.strip():
                studio_name = sn.strip()
    chunk_aggregated = {}
    if agg["dims"]:
        chunk_aggregated["dimensions"] = sorted(agg["dims"])
    if agg["cols"]:
        chunk_aggregated["available_colors"] = sorted(agg["cols"])
    if agg["mats"]:
        chunk_aggregated.setdefault("material_properties", {})
        chunk_aggregated["material_properties"][
            "materials_mentioned"] = sorted(agg["mats"])
    if agg["feats"]:
        chunk_aggregated["key_features"] = sorted(agg["feats"])
    if studio_name and not extracted.get("studio_name"):
        chunk_aggregated["studio_name"] = studio_name

    # drop empty keys from existing the way the DB would store them:
    # keep as-is; the merge's emptiness checks handle them.
    merged = {k: v for k, v in existing.items()}
    for source in (extracted, chunk_aggregated):
        for key, value in source.items():
            if value is None or value == "" or value == [] \
                    or value == {}:
                continue
            existing_val = merged.get(key)
            if existing_val in (None, "", [], {}):
                merged[key] = value
            elif isinstance(existing_val, dict) \
                    and isinstance(value, dict):
                merged[key] = {**existing_val, **value}
            elif isinstance(existing_val, list) \
                    and isinstance(value, list):
                merged[key] = sorted(set(existing_val) | set(value))
            elif source is extracted:
                merged[key] = value
    return merged


def test_metadata_merge_matches_reference_replay(spark, docs_df):
    rollup = s4.chunk_metadata_rollup(s4.synth_chunk_sm(docs_df))
    got = {r.product: r.asDict() for r in s4.merge_product_metadata(
        s4.synth_existing_meta(docs_df),
        s4.synth_extracted_meta(docs_df), rollup).collect()}
    for p in DOCS:
        exp = _ref_merge_dicts(p)
        g = got[p]
        def j(v):
            return "|".join(v) if isinstance(v, list) else v
        assert g["dimensions"] == j(exp.get("dimensions")), p
        assert g["available_colors"] == \
            j(exp.get("available_colors")), p
        assert g["key_features"] == j(exp.get("key_features")), p
        mp = exp.get("material_properties") or {}
        assert g["materials_mentioned"] == \
            j(mp.get("materials_mentioned")), p
        assert g["material_grade"] == mp.get("grade"), p
        assert g["studio_name"] == (exp.get("studio_name") or
                                    exp.get("studio_name")), p
        assert g["finish"] == exp.get("finish"), p


def test_stage_progress_formula(spark, docs_df):
    got = {r.product: r.overall_progress
           for r in s4.stage_progress(
               s4.synth_progress_rows(docs_df)).collect()}
    pct = {"extraction": 20, "chunking": 40, "images": 60,
           "creation": 80, "relationships": 100, "completed": 100}
    for p in DOCS:
        idx, total = p % 7 + 1, p % 5 + 3
        stage = ["extraction", "chunking", "images", "creation",
                 "relationships", "completed", "mystery"][p % 7]
        overall = ((idx - 1) * 100 + pct.get(stage, 0)) / total
        assert got[p] == max(0, min(100, int(overall))), p
