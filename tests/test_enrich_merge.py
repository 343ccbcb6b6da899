"""Pins for the enrichment merge (operators/enrich_merge),
hand-computed against _merge_enriched_fields_into_metadata
(stage_4_products.py:2154-2270)."""

from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, MapType, StringType,
                               StructField, StructType)

from mivaa_pdf_extractor_spark.operators import enrich_merge as EM

_MAPS = ("metadata", "design", "packaging", "material_properties",
         "commercial", "appearance")
_CANDS = [c for _, c, _, _ in EM.CHUNK_LADDER] + ["cc_dimensions"] + \
    [c for _, c, _, _ in EM.VISION_LADDER] + ["vc_appearance_colors"]
_SCHEMA = StructType(
    [StructField("product_id", LongType())]
    + [StructField(m, MapType(StringType(), StringType()))
       for m in _MAPS]
    + [StructField(c, StringType()) for c in _CANDS])


def _run(spark, product_id=1, maps=None, **cands):
    maps = maps or {}
    row = tuple([product_id]
                + [maps.get(m, {}) for m in _MAPS]
                + [cands.get(c) for c in _CANDS])
    df = spark.createDataFrame([row], _SCHEMA)
    return EM.merge_enriched(df).collect()[0]


def test_fill_order_and_provenance(spark):
    r = _run(spark, maps={"metadata": {"factory_name": "N/A"}},
             cc_factory_name="Harmony", cc_designers="Stacy Garcia",
             vc_finish="Matte")
    # ladder order: chunk fills first, then vision
    assert r["filled"] == ["factory_name", "designers",
                           "material_properties.finish"]
    assert r["provenance"] == [
        "factory_name=chunk_regex@90", "designers=chunk_regex@90",
        "material_properties.finish=vision_rollup@90"]
    assert "factory_name=Harmony" in r["final_kv"]


def test_placeholder_overwritten_untouched_kept(spark):
    r = _run(spark, maps={"metadata": {"factory_name": "unknown",
                                       "collection": "not found"}},
             cc_factory_name="Harmony")
    # the placeholder slot fills; the untouched placeholder survives
    assert "factory_name=Harmony" in r["final_kv"]
    assert "collection=not found" in r["final_kv"]


def test_confident_value_never_overwritten(spark):
    r = _run(spark, maps={"metadata": {"factory_name": "RealCo"}},
             cc_factory_name="Harmony")
    assert r["filled"] == []
    assert "factory_name=RealCo" in r["final_kv"]


def test_dimensions_drop_available_sizes(spark):
    # even an EMPTY available_sizes key is dropped ('in new_metadata')
    r = _run(spark, maps={"metadata": {"available_sizes": ""}},
             cc_dimensions="11.8x11.8||Q59")
    assert r["filled"] == ["dimensions",
                           "(dropped stale available_sizes)"]
    assert r["provenance"] == ["dimensions=chunk_regex@95"]
    assert not any(kv.startswith("available_sizes=")
                   for kv in r["final_kv"])
    # without the key present, no drop marker
    r2 = _run(spark, cc_dimensions="11.8x11.8||Q59")
    assert r2["filled"] == ["dimensions"]


def test_designer_scalar_drop(spark):
    r = _run(spark, maps={"metadata": {"designer": "Old Scalar"}},
             cc_designers="Stacy Garcia")
    assert r["filled"] == ["designers",
                           "(dropped stale designer scalar)"]
    assert not any(kv.startswith("designer=")
                   and not kv.startswith("designers=")
                   for kv in r["final_kv"])
    # existing confident designers + candidate: no fill, but the stale
    # scalar still drops (candidate truthy + plural non-empty)
    r2 = _run(spark, maps={"metadata": {"designers": "Jane Doe",
                                        "designer": "Old"}},
              cc_designers="Stacy Garcia")
    assert r2["filled"] == ["(dropped stale designer scalar)"]
    assert "designers=Jane Doe" in r2["final_kv"]


def test_vision_colors_never_clobber_chunk_colors(spark):
    r = _run(spark,
             maps={"appearance": {"colors_from_chunks": "beige"}},
             vc_appearance_colors="Beige;Grey")
    assert "appearance.colors_from_vision=Beige;Grey" in r["final_kv"]
    assert "appearance.colors_from_chunks=beige" in r["final_kv"]
    assert r["provenance"] == [
        "appearance.colors_from_vision=vision_rollup@85"]
