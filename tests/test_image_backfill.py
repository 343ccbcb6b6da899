"""Pins for image classification/embedding backfill planning
(operators/image_backfill.py)."""

import pytest
from pyspark.sql import Row

from mivaa_pdf_extractor_spark.operators.image_backfill import (
    aspect_staleness, classification_outcomes, classification_summary,
    select_quarantined, select_stale_understanding)

_IMG = ("id string, workspace_id string, "
        "classification_pending boolean, "
        "has_understanding_embedding boolean, "
        "understanding_schema_version int, "
        "understanding_embedding_model string")


def _img(i, pending=None, has=True, sv=2, model="voyage-4"):
    return Row(id=f"i{i}", workspace_id="w",
               classification_pending=pending,
               has_understanding_embedding=has,
               understanding_schema_version=sv,
               understanding_embedding_model=model)


def test_understanding_staleness_triggers(spark):
    images = spark.createDataFrame(
        [_img(0),                          # fresh
         _img(1, has=False),               # missing flag
         _img(2, sv=None),                 # null schema version
         _img(3, sv=1),                    # old schema
         _img(4, model="openai-clip"),     # non-voyage model
         _img(5, model=None),              # null model
         _img(6, pending=True, has=False)],  # quarantined: skipped
        _IMG)
    got = {r["id"] for r in select_stale_understanding(
        images, limit=100, current_version=2).collect()}
    assert got == {"i1", "i2", "i3", "i4", "i5"}
    # limit applies BEFORE the staleness filter (slot-consuming)
    got2 = {r["id"] for r in select_stale_understanding(
        images, limit=1, current_version=2).collect()}
    assert got2 == set()  # i0 burned the only slot and is fresh


def test_quarantine_selection(spark):
    images = spark.createDataFrame(
        [_img(0, pending=True), _img(1, pending=False),
         _img(2, pending=None)],
        _IMG)
    got = {r["id"]
           for r in select_quarantined(images).collect()}
    assert got == {"i0"}


def _aspect_img(i, **kw):
    base = dict(id=f"a{i}", classification_pending=None)
    for a in ("color", "texture", "style", "material"):
        base[f"has_{a}_slig"] = True
        base[f"{a}_aspect_schema_version"] = 2
        base[f"{a}_aspect_embedding_model"] = "voyage-4"
    base.update(kw)
    return Row(**base)


def test_aspect_staleness(spark):
    schema = ("id string, classification_pending boolean, " + ", ".join(
        f"has_{a}_slig boolean, {a}_aspect_schema_version int, "
        f"{a}_aspect_embedding_model string"
        for a in ("color", "texture", "style", "material")))
    images = spark.createDataFrame(
        [_aspect_img(0),
         _aspect_img(1, color_aspect_embedding_model="slig-legacy"),
         _aspect_img(2, has_style_slig=False,
                     classification_pending=True)],
        schema)
    got = {r["id"]: r.asDict()
           for r in aspect_staleness(images, 2).collect()}
    assert got["a0"]["any_stale"] is False
    assert got["a1"]["color_stale"] is True
    assert got["a1"]["any_stale"] is True
    # quarantined rows are never any_stale even with a stale aspect
    assert got["a2"]["style_stale"] is True
    assert got["a2"]["any_stale"] is False


def test_classification_ladder(spark):
    cands = spark.createDataFrame(
        [Row(id=f"c{i}", workspace_id="w", classification_pending=True,
             has_understanding_embedding=False,
             understanding_schema_version=None,
             understanding_embedding_model=None) for i in range(6)],
        _IMG)
    results = spark.createDataFrame(
        [("c0", False, False, "m", "r", True, 0.9, True, True),
         ("c1", True, False, "opus_failed", "r", True, 0.9, True,
          True),
         ("c2", True, False, "m", "API key missing here", True, 0.9,
          True, True),
         ("c3", True, False, "m", "r", False, None, True, True),
         ("c4", True, False, "m", "r", True, 0.7, True, False),
         ("c5", True, False, "m", "r", True, 0.7, False, True)],
        "id string, bytes_ok boolean, has_error boolean, "
        "cls_model string, reason string, is_material boolean, "
        "confidence double, stamp_ok boolean, embed_ok boolean")
    out = {r["id"]: r.asDict()
           for r in classification_outcomes(cands, results).collect()}
    assert out["c0"]["outcome"] == "skipped"
    assert out["c1"]["outcome"] == "failed"       # _failed model
    assert out["c2"]["outcome"] == "failed"       # API key reason
    assert out["c1"]["quarantine_cleared"] is False
    c3 = out["c3"]
    assert c3["outcome"] == "non_material"
    assert (c3["classification"], c3["category"]) == (
        "non-material", "general")
    assert c3["confidence"] == 0.0                # default
    c4 = out["c4"]
    assert c4["outcome"] == "material_unembedded"
    assert (c4["classification"], c4["category"]) == (
        "material", "product")
    assert out["c5"]["outcome"] == "failed"       # stamp failed
    s = classification_summary(
        classification_outcomes(cands, results)).collect()[0].asDict()
    assert s == {"scanned": 6, "material": 1, "non_material": 1,
                 "embedded": 0, "skipped": 1, "failed": 3}
