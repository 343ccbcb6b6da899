"""Pins for the system temp-sweep classifier
(cleanup_service.py:1042-1250)."""

import pandas as pd

from mivaa_pdf_extractor_spark.operators import temp_sweep as ts


def _entries(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["entry_id", "parent_dir", "name", "is_dir",
                       "age_s", "size_mb"]))


def test_exact_age_boundary_survives(spark):
    rows = [(1, "/tmp", "a.pdf", False, 86400, 1.0),      # == 24h
            (2, "/tmp", "b.pdf", False, 86401, 1.0)]      # > 24h
    out = {r.entry_id: r.tier for r in ts.classify_entries(
        _entries(spark, rows)).collect()}
    assert out == {1: None, 2: "pdf_files"}   # strictly older only


def test_pdf_processor_needs_isdir(spark):
    rows = [(1, "/tmp", "PDF_Processor_x", True, 99999, 1.0),
            (2, "/tmp", "pdf_processor_x", False, 99999, 1.0)]
    out = {r.entry_id: r.tier for r in ts.classify_entries(
        _entries(spark, rows)).collect()}
    assert out[1] == "pdf_processor_folders"  # case-insensitive
    assert out[2] is None                     # file fails the gate


def test_output_and_pycache_are_ageless(spark):
    rows = [(1, ts.OUTPUT_DIR, "fresh.json", False, 1, 2.0),
            (2, ts.BASE_DIR + "/app", "__pycache__", True, 1, 3.0),
            (3, ts.OUTPUT_DIR, "subdir", True, 99999, 1.0)]
    out = {r.entry_id: r.tier for r in ts.classify_entries(
        _entries(spark, rows)).collect()}
    assert out[1] == "output_files"           # no age check (pin)
    assert out[2] == "pycache_folders"        # no age check (pin)
    assert out[3] is None                     # output tier: files only


def test_summary_empty_folders_forever_zero(spark):
    rows = [(1, "/tmp", "a.pdf", False, 99999, 2.5),
            (2, ts.TEMP_DIRS[0], "x", False, 99999, 1.5)]
    s = ts.sweep_summary(ts.classify_entries(
        _entries(spark, rows))).collect()[0]
    assert s.empty_folders_deleted == 0       # advertised, never done
    assert s.pdf_files_deleted == 1
    assert s.temp_processing_files_deleted == 1
    assert s.total_size_freed_mb == 4.0
