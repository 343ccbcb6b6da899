"""Pins for the multi-collection VECS fusion
(operators/vecs_fusion.py) vs vecs_service.py:1025-1233."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import vecs_fusion as vf
from mivaa_pdf_extractor_spark.operators.search import (
    image_only_weights)

SF = "/root/testdata/sf0.001/documents.parquet"


def test_fusion_weights_match_image_only_weights(spark):
    """The per-query weight columns must equal the driver-side
    image_only_weights() used by the reference (:1159-1162), incl.
    the has_understanding-needs-RESULTS pin (query 5's understanding
    search failed -> its weight redistributes) and failed-specialized-
    keeps-weight (query 8's color search failed but color stays
    weighted)."""
    d = spark.read.parquet(SF)
    res = vf.synth_results(d)
    rows = vf.fuse_collections(res, vf.synth_channels(d)).collect()
    und_rows = {r.query_id for r in res.where(
        F.col("channel") == "understanding")
        .select("query_id").distinct().collect()}
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, r)
    for q, r in by_q.items():
        queried = [a for a, m in (("color", q % 2 == 0),
                                  ("texture", q % 5 != 1),
                                  ("style", q % 4 != 2),
                                  ("material", q % 7 != 3)) if m]
        has_und = (q % 3 != 0) and (q in und_rows)
        w = image_only_weights(has_understanding=has_und,
                               specialized_types=queried)
        want = (w.get("visual", 0.0) * r.visual
                + w.get("understanding", 0.0) * r.understanding
                + sum(w.get(a, 0.0) * r[a] for a in queried))
        assert abs(r.combined_score - want) < 1e-9, q
    # query 5: understanding failed -> has_understanding False
    assert 5 not in und_rows
    # query 8: color queried (8 % 2 == 0) but its search failed ->
    # rows absent, yet per-image color score is 0.0 and the weight
    # slot still existed (verified through the combined recompute)
    q8 = [r for r in rows if r.query_id == 8]
    assert q8 and all(r.color == 0.0 for r in q8)


def test_fusion_limit_and_visual_carry(spark):
    d = spark.read.parquet(SF)
    rows = vf.fuse_collections(vf.synth_results(d),
                               vf.synth_channels(d)).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        assert len(rs) <= vf.DEFAULT_LIMIT, q
        for r in rs:
            assert r.similarity_score == r.visual, (q, r.image_id)
        ranked = sorted(rs, key=lambda r: r.rank)
        scores = [r.combined_score for r in ranked]
        assert scores == sorted(scores, reverse=True), q
