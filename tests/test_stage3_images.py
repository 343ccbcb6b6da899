"""Transcription tests for the Stage 3 image folds.

Each test replays the reference's Python loops literally
(``app/api/pdf_processing/stage_3_images.py``) over the same
synthesized inputs and compares row-for-row with the Spark operator.
"""

import re

import pytest

from mivaa_pdf_extractor_spark.operators import stage3_images as s3

DOCS = list(range(1, 61))


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame([(d,) for d in DOCS], "doc_id long")


# ── reference replay: page assignment (:152-348) ──────────────────

def _ref_assign(doc):
    out = {}
    sw = 400.0 + (doc % 5) * 100
    regions = {}   # phys -> list of (has_bbox, x, width)
    for ph in (1, 2, 3):
        for ri in (0, 1, 2):
            r = doc * 53 + ph * 7 + ri
            if r % 4 == 0:
                continue
            has_bbox = r % 5 != 0
            x = None if r % 3 == 0 else (r % 16) * 30.0
            regions.setdefault(ph, []).append((has_bbox, x, 40.0))
    for pdf_idx in (0, 1):
        spread_pair = doc % 3 == 0 and pdf_idx == 0
        single_phys = 3 if (doc % 3 == 0 and pdf_idx == 1) \
            else pdf_idx + 1
        left_phys, right_phys = 1, 2
        mid_x = sw / 2
        images = []
        for i in range(6):
            g = doc * 131 + pdf_idx * 17 + i
            c = g % 6
            if c == 0:
                bbox = None
            elif c == 1:
                bbox = [0.0, 0.5, 0.0]
            elif c == 2:
                bbox = [30.0 + (g % 350), 0.25, 0.0]
            elif c == 3:
                bbox = [(g % 10) / 10.0, 0.25, ((g % 5) + 1) / 10.0]
            elif c == 4:
                bbox = [20.0 + (g % 300), 0.25, 15.0 + (g % 240)]
            else:
                bbox = [(g % 10) / 10.0, 0.25, 10.0 + (g % 200)]
            if c > 1:
                fname = f"img_{g}"
            elif g % 4 == 0:
                fname = f"page_{pdf_idx + 1}_region_{g % 9}"
            elif g % 4 == 1:
                fname = "scan_region_x"
            elif g % 4 == 2:
                fname = None
            else:
                fname = f"img_{g}"
            images.append({"idx": i, "bbox": bbox, "filename": fname})

        if not spread_pair:
            for img in images:
                out[(doc, pdf_idx, img["idx"])] = (
                    single_phys, None, False, False, False)
            continue

        without = []
        for img in images:
            bbox = img["bbox"]
            valid = (bbox is not None and len(bbox) >= 3
                     and (bbox[2] > 0 or bbox[0] > 0))
            if not valid:
                without.append(img)
                continue
            norm_x = bbox[0] if 0.0 <= bbox[0] <= 1.0 \
                else bbox[0] / max(sw, 1)
            norm_w = bbox[2] if 0.0 <= bbox[2] <= 1.0 \
                else bbox[2] / max(sw, 1)
            x_pts, w_pts = norm_x * sw, norm_w * sw
            center = x_pts + w_pts / 2
            spans = x_pts < mid_x and x_pts + w_pts > mid_x
            if spans and w_pts > sw * 0.45:
                out[(doc, pdf_idx, img["idx"])] = (
                    left_phys, "spread", True, False, False)
            else:
                is_left = center < mid_x
                out[(doc, pdf_idx, img["idx"])] = (
                    left_phys if is_left else right_phys,
                    "left" if is_left else "right",
                    False, False, False)
        for fb_idx, img in enumerate(without):
            fname = img["filename"] or ""
            assigned = False
            if "_region_" in fname and re.search(
                    r"_region_(\d+)", fname):
                for (hb, x, wdt) in regions.get(left_phys, []):
                    if hb:
                        center = x + wdt / 2 if x is not None else 0
                        if center < mid_x:
                            out[(doc, pdf_idx, img["idx"])] = (
                                left_phys, "left", False, True, False)
                            assigned = True
                            break
                if not assigned:
                    for (hb, x, wdt) in regions.get(right_phys, []):
                        if hb:
                            out[(doc, pdf_idx, img["idx"])] = (
                                right_phys, "right", False, True,
                                False)
                            assigned = True
                            break
            if not assigned:
                is_left = fb_idx % 2 == 0
                out[(doc, pdf_idx, img["idx"])] = (
                    left_phys if is_left else right_phys,
                    "left" if is_left else "right",
                    False, False, True)
    return out


def test_page_assign_matches_reference_replay(spark, docs_df):
    got = {(r.doc, r.pdf_idx, r.img_idx):
           (r.page_number, r.physical_side, r.is_scene,
            r.region_assisted, r.bbox_fallback)
           for r in s3.assign_image_pages(
               s3.synth_images(docs_df), s3.synth_sheets(docs_df),
               s3.synth_regions(docs_df)).collect()}
    exp = {}
    for d in DOCS:
        exp.update(_ref_assign(d))
    assert got == exp
    # coverage: every branch fires somewhere in the corpus
    sides = {v[1] for v in got.values()}
    assert sides == {None, "left", "right", "spread"}
    assert any(v[3] for v in got.values())       # region_assisted
    assert any(v[4] for v in got.values())       # parity fallback


# ── reference replay: Phase-3 OCR gate (:685-880) ─────────────────

def _ref_ocr(doc):
    rows = {}
    layers = ["embedded", "region_crop", "full_render",
              "vision_guided", None, ""]
    rtypes = ["TABLE", "TEXT", "Title", "image", "FIGURE", "PHOTO",
              "CHART", None]
    photo = {"IMAGE", "FIGURE", "PHOTO"}
    for i in range(1, 7):
        g = doc * 71 + i
        layer = layers[g % 6] or "embedded"
        rtype = (rtypes[g % 8] or "").upper()
        td = True if g % 3 == 0 else (False if g % 3 == 1 else None)
        has_path = g % 7 != 0
        reason = None
        if layer == "full_render":
            reason = "full_render_dup_of_stage_1_5"
        elif layer == "region_crop":
            if rtype in photo:
                reason = "photo_not_text_bearing"
        elif layer == "embedded":
            if td is False:
                reason = "embedded_no_text_detected"
        if reason is None and not has_path:
            reason = "local_path_unavailable"
        if reason is not None:
            rows[doc * 100 + i] = ("skipped", reason, None, None,
                                   None)
            continue
        attempts_made = g % 3 + 1
        if g % 11 == 0:     # exception
            rows[doc * 100 + i] = ("failed", None, 1, None, None)
        elif g % 11 == 1:   # result is None
            rows[doc * 100 + i] = ("failed", None, 0, None, None)
        elif g % 11 == 2:   # method paddleocr_failed
            rows[doc * 100 + i] = ("failed", None, attempts_made,
                                   None, None)
        else:
            text = "" if g % 13 == 0 else f"txt{g}"
            blocks = None if g % 9 == 0 else g % 4
            # ocr_blocks = ocr_result.blocks or []  (None -> empty)
            rows[doc * 100 + i] = (
                "succeeded", None, attempts_made, text or None,
                0 if blocks is None else blocks)
    return rows


def test_ocr_gate_matches_reference_replay(spark, docs_df):
    got = {r.image_id: (r.status, r.skipped_reason, r.ocr_attempts,
                        r.ocr_text, r.ocr_blocks_count)
           for r in s3.phase3_ocr_gate(
               s3.synth_ocr_rows(docs_df)).collect()}
    exp = {}
    for d in DOCS:
        exp.update(_ref_ocr(d))
    assert got == exp
    reasons = {v[1] for v in got.values() if v[1]}
    assert reasons == {"full_render_dup_of_stage_1_5",
                       "photo_not_text_bearing",
                       "embedded_no_text_detected",
                       "local_path_unavailable"}
    # '' -> NULL text pin fires
    assert any(v[0] == "succeeded" and v[3] is None
               for v in got.values())


def test_ocr_summary_counts(spark, docs_df):
    got = {r.doc: (r.ocr_attempted, r.ocr_succeeded, r.ocr_failed,
                   r.ocr_skipped, r.total_rows)
           for r in s3.phase3_ocr_summary(
               s3.synth_ocr_rows(docs_df)).collect()}
    for d in DOCS:
        exp = _ref_ocr(d)
        att = sum(1 for v in exp.values() if v[0] != "skipped")
        suc = sum(1 for v in exp.values() if v[0] == "succeeded")
        fail = sum(1 for v in exp.values() if v[0] == "failed")
        skip = sum(1 for v in exp.values() if v[0] == "skipped")
        assert got[d] == (att, suc, fail, skip, 6)


# ── reference replay: catalog-wide icon stats (:889-1139) ─────────

def _ref_icon_stats(doc):
    n = 0 if doc % 5 == 0 else doc % 4 + 1
    stats = dict(supplementary_pages_scanned=0, images_extracted=0,
                 icon_candidates_found=0, icons_processed=0,
                 icon_metadata_extracted=0, icon_extraction_failed=0,
                 min_phys=None, max_phys=None)
    if n == 0:
        return None   # early return — no pages row at all
    stats["supplementary_pages_scanned"] = n
    has_spread = doc % 3 == 0
    phys_seen = []
    cand = []
    for j in range(n):
        pdf_idx = j + 10
        h = doc * 61 + j
        if h % 6 == 0:
            continue   # extract failed
        n_images = h % 3 + 1
        stats["images_extracted"] += n_images
        phys = pdf_idx * 2 + 1 if (has_spread and pdf_idx <= 11) \
            else pdf_idx + 1
        phys_seen.append(phys)
        if doc % 7 == 0:
            continue   # classification failure: no icon stats
        for k in range(n_images):
            h2 = doc * 89 + j * 13 + k
            if h2 % 3 == 0:
                cand.append(h2)
    if phys_seen:
        stats["min_phys"] = min(phys_seen)
        stats["max_phys"] = max(phys_seen)
    stats["icon_candidates_found"] = len(cand)
    for h3 in cand:
        raised = h3 % 5 == 0
        err = h3 % 5 == 1
        count = h3 % 4
        if raised:
            stats["icon_extraction_failed"] += 1
            continue
        stats["icons_processed"] += 1
        if err:
            stats["icon_extraction_failed"] += 1
        elif count > 0:
            stats["icon_metadata_extracted"] += 1
    return stats


def test_catalog_icon_stats_matches_reference_replay(spark, docs_df):
    got = {r.doc: r.asDict() for r in s3.catalog_icon_stats(
        s3.synth_icon_pages(docs_df),
        s3.synth_icon_candidates(docs_df)).collect()}
    n_expected = 0
    for d in DOCS:
        exp = _ref_icon_stats(d)
        if exp is None:
            assert d not in got
            continue
        n_expected += 1
        g = got[d]
        assert g["supplementary_pages_scanned"] == \
            exp["supplementary_pages_scanned"]
        assert g["images_extracted"] == exp["images_extracted"]
        assert g["icon_candidates_found"] == \
            exp["icon_candidates_found"]
        assert g["icons_processed"] == exp["icons_processed"]
        assert g["icon_metadata_extracted"] == \
            exp["icon_metadata_extracted"]
        assert g["icon_extraction_failed"] == \
            exp["icon_extraction_failed"]
        assert g["min_image_phys"] == exp["min_phys"]
        assert g["max_image_phys"] == exp["max_phys"]
    assert len(got) == n_expected
    # the raised-vs-err asymmetry fires: some doc has processed>found-failed
    assert any(g["icon_extraction_failed"] > 0
               and g["icons_processed"] > 0 for g in got.values())
