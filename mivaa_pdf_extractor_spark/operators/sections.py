"""Smart section extraction — LLM context budgeting over long documents.

`dynamic_metadata_extractor.py:379-453` (`_extract_relevant_sections`)
shrinks a long PDF text to an LLM context budget while keeping the parts
metadata extraction needs:

1. documents at or under ``max_chars`` pass through untouched;
2. the first 12,000 chars always ship (product name / description);
3. the index area (chars 12,000-35,000) ships when it contains a
   dimension pattern (``NN x NN cm|mm|inch``);
4. a 6,000-char window (3,000 before + 3,000 after) ships around EVERY
   match of four multilingual section-keyword families (packaging,
   compliance, care, technical — EN/IT/FR/ES/DE/EL);
5. the last 8,000 chars always ship (packaging/compliance tables);
6. sections join with ``\\n\\n---\\n\\n`` and the result truncates to
   ``max_chars``.

The window step needs every match POSITION of a regex — not expressible
in native Spark SQL (or DuckDB, hence no oracle twin: the contract entry
is rows-only and the semantics are pinned by hand-computed pytest
fixtures). It runs as an Arrow-batched pandas iterator over
``mapInPandas`` — per-document sequential string work, the same
sanctioned shape as the C1-C3 chunkers; one string in, one string out,
no shuffle anywhere.

``section_header_hits`` is the natively-expressible companion — per-doc
match counts per keyword family (``regexp_count``) and the
needs-extraction flag — used for corpus-level budgeting stats and
hash-matched against DuckDB.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

#: dynamic_metadata_extractor.py:405-424 — cited pattern data constants.
SECTION_PATTERNS: dict[str, str] = {
    "packaging": (
        r"\b(packaging|packing|iconography|box|pallet|pieces per box|"
        r"coverage|confezionamento|imballaggio|emballage|conditionnement|"
        r"embalaje|empaque|verpackung|συσκευασία)\b"),
    "compliance": (
        r"\b(regulation|compliance|certification|standard|safety|"
        r"eco.?friendly|sustainability|voc|leed|iso|regolamento|"
        r"certificazione|réglementation|certification|regulación|"
        r"certificación|zertifizierung|vorschriften|πιστοποίηση)\b"),
    "care": (
        r"\b(care|maintenance|cleaning|handling|installation|"
        r"recommended use|manutenzione|pulizia|entretien|nettoyage|"
        r"mantenimiento|limpieza|reinigung|pflege|wartung|καθαρισμός|"
        r"συντήρηση)\b"),
    "technical": (
        r"\b(technical|specification|properties|performance|dimensions|"
        r"weight|thickness|specifiche tecniche|spécifications|"
        r"especificaciones|technische daten|τεχνικά)\b"),
}

#: :430 — the dimension pattern that qualifies the index area.
DIMENSION_PATTERN = r"\d+[.,]?\d*\s*[x×]\s*\d+[.,]?\d*\s*(cm|mm|inch)?"

HEAD_CHARS = 12_000
INDEX_START = 12_000
INDEX_END = 35_000
WINDOW = 3_000
TAIL_CHARS = 8_000
JOINER = "\n\n---\n\n"


def smart_extract_one(text: str, max_chars: int = 100_000) -> str:
    """The reference algorithm, one document (deterministic, pure)."""
    import re

    if len(text) <= max_chars:
        return text
    sections = [text[:HEAD_CHARS]]
    index_end = min(INDEX_END, len(text))
    if len(text) > index_end:
        area = text[INDEX_START:index_end]
        if re.search(DIMENSION_PATTERN, area, re.IGNORECASE):
            sections.append(area)
    for pattern in SECTION_PATTERNS.values():
        for match in re.finditer(pattern, text, re.IGNORECASE):
            start = max(0, match.start() - WINDOW)
            end = min(len(text), match.end() + WINDOW)
            sections.append(text[start:end])
    sections.append(text[-TAIL_CHARS:])
    return JOINER.join(sections)[:max_chars]


def smart_extract_sections(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           max_chars: int = 100_000) -> DataFrame:
    """Arrow-batched map-only pass; emits the budgeted text plus the
    retention observability the reference logs (:451-452)."""
    schema = (f"{id_col} long, extracted_text string, n_chars_in long, "
              "n_chars_out long")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = [smart_extract_one(t or "", max_chars)
                    for t in pdf[text_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "extracted_text": outs,
                "n_chars_in": [len(t or "") for t in pdf[text_col]],
                "n_chars_out": [len(o) for o in outs]})

    from mivaa_pdf_extractor_spark.core.fanout import fan_out
    return fan_out(df.select(id_col, text_col)).mapInPandas(run, schema)


def section_header_hits(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        max_chars: int = 100_000) -> DataFrame:
    """Per-doc keyword-family match counts + the budgeting flags —
    native, whole-stage-codegen, hash-matched (Java and RE2 agree on
    these patterns: explicit classes, no shorthand escapes)."""
    t = F.col(text_col)
    cols = [F.col(id_col), F.length(t).alias("n_chars"),
            (F.length(t) > max_chars).alias("needs_smart_extraction")]
    for family, pattern in SECTION_PATTERNS.items():
        cols.append(F.regexp_count(F.lower(t), F.lit(pattern))
                    .alias(f"n_{family}"))
    idx_area = F.substring(t, INDEX_START + 1, INDEX_END - INDEX_START)
    cols.append(
        ((F.length(t) > INDEX_END)
         & F.regexp_like(F.lower(idx_area), F.lit(DIMENSION_PATTERN)))
        .alias("index_has_dimensions"))
    return df.select(*cols)
