"""Pins for smart section extraction (operators/sections.py; reference
dynamic_metadata_extractor.py:379-453)."""

import pytest

from mivaa_pdf_extractor_spark.operators import sections
from mivaa_pdf_extractor_spark.operators.sections import (
    JOINER, section_header_hits, smart_extract_one,
    smart_extract_sections)


class TestSmartExtractOne:
    def test_short_document_passes_through_untouched(self):
        assert smart_extract_one("short doc", 100) == "short doc"
        assert smart_extract_one("x" * 100, 100) == "x" * 100

    def test_small_param_exact(self, monkeypatch):
        # shrink the constants to hand-computable sizes: head=10,
        # index [10,20), window=5, tail=8, budget=60
        monkeypatch.setattr(sections, "HEAD_CHARS", 10)
        monkeypatch.setattr(sections, "INDEX_START", 10)
        monkeypatch.setattr(sections, "INDEX_END", 20)
        monkeypatch.setattr(sections, "WINDOW", 5)
        monkeypatch.setattr(sections, "TAIL_CHARS", 8)
        #       0123456789
        text = "AAAAAAAAAA..2 x 3 cm..######packaging#####ZZZZZZZZ"
        out = smart_extract_one(text, 49)  # len(text)=50 > budget
        parts = out.split(JOINER)
        # head, index (has dims), one window, tail — truncated to 49
        full = JOINER.join([
            "AAAAAAAAAA",          # head [0:10)
            "..2 x 3 cm",          # index [10:20), dimension matched
            "#####packaging#####",  # window [28-5 : 37+5)
            "ZZZZZZZZ"])           # tail
        assert parts[0] == "AAAAAAAAAA"
        assert parts[1] == "..2 x 3 cm"
        assert out == full[:49]
        assert len(out) == 49

    def test_index_area_skipped_without_dimensions(self, monkeypatch):
        monkeypatch.setattr(sections, "HEAD_CHARS", 10)
        monkeypatch.setattr(sections, "INDEX_START", 10)
        monkeypatch.setattr(sections, "INDEX_END", 20)
        monkeypatch.setattr(sections, "WINDOW", 5)
        monkeypatch.setattr(sections, "TAIL_CHARS", 8)
        text = "A" * 10 + "no dims hr" + "B" * 30
        out = smart_extract_one(text, 45)
        parts = out.split(JOINER)
        assert parts[0] == "A" * 10
        assert parts[1] == "B" * 8  # tail — no index, no keyword windows

    def test_every_match_gets_a_window(self, monkeypatch):
        monkeypatch.setattr(sections, "HEAD_CHARS", 4)
        monkeypatch.setattr(sections, "INDEX_START", 4)
        monkeypatch.setattr(sections, "INDEX_END", 5)
        monkeypatch.setattr(sections, "WINDOW", 2)
        monkeypatch.setattr(sections, "TAIL_CHARS", 4)
        text = "head box bb box tail" + "z" * 300
        out = smart_extract_one(text, 250)
        # standalone 'box' matches twice; 'bbox'-style embeddings would
        # not (\b boundary)
        parts = out.split(JOINER)
        windows = [p for p in parts if "box" in p]
        assert len(windows) == 2
        assert smart_extract_one("head bbox tail" + "z" * 300, 250) \
            .count(JOINER) == 1  # no window: only head + tail

    def test_multilingual_and_greek_match_in_python_tier(self):
        assert len(smart_extract_one(
            "x" * 120_000 + " συσκευασία ", 100_000)) <= 100_000
        # the Greek keyword contributes a window (Python \b is unicode)
        import re
        pat = sections.SECTION_PATTERNS["packaging"]
        assert re.search(pat, "η συσκευασία είναι", re.IGNORECASE)

    def test_budget_is_a_hard_cap(self):
        text = ("packaging " * 30_000)  # windows everywhere
        assert len(smart_extract_one(text, 100_000)) == 100_000


class TestSparkTier:
    def test_map_only_plan_and_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "short packaging doc"),
             (2, "y" * 120_000 + " packaging installation thickness ")],
            "doc_id bigint, text string")
        out = {r.doc_id: r
               for r in smart_extract_sections(df).collect()}
        assert out[1].extracted_text == "short packaging doc"
        assert out[1].n_chars_in == out[1].n_chars_out
        assert out[2].n_chars_out <= 100_000
        assert out[2].extracted_text.startswith("y" * 100)
        plan = smart_extract_sections(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan  # map-only, no shuffle

    def test_header_hits_native(self, spark):
        df = spark.createDataFrame(
            [(1, "Packaging and packing, thickness 10 x 20 cm")],
            "doc_id bigint, text string")
        r = section_header_hits(df).collect()[0]
        assert r.n_packaging == 2
        assert r.n_technical == 1  # thickness
        assert r.needs_smart_extraction is False

    def test_index_flag_requires_length_past_index_end(self, spark):
        base = "p" * 13_000 + " 60 x 60 cm "
        df = spark.createDataFrame(
            [(1, base + "q" * 30_000), (2, base)],
            "doc_id bigint, text string")
        out = {r.doc_id: r.index_has_dimensions
               for r in section_header_hits(df).collect()}
        assert out == {1: True, 2: False}
