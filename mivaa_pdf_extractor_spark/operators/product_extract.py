"""Chunk-content product metadata extraction (map-only regex plans).

Re-expresses ``_extract_product_metadata`` of the reference's product
creation service (reference ``app/services/products/
product_creation_service.py:554-621``):

- dimensions: the first match of the 2-capture pattern
  ``(\\d+(?:\\.\\d+)?)\\s*[x×]\\s*(\\d+(?:\\.\\d+)?)(?:cm|mm)?``
  rendered ``a×b``.  The 3-capture branch is DEAD CODE — every 3D
  string matches the 2-capture pattern first and the loop breaks, so
  '15×38×2' yields '15×38' (pinned).
- designer: three patterns tried in order, (?i); only the FIRST
  match of each pattern is examined — it must be > 2 chars and not
  in {THE, AND, FOR} or the next pattern is tried.  Pattern 1's
  capture class ``[A-Z][A-Za-z\\s{}\\-]+`` includes whitespace, so a
  greedy capture crosses line breaks (pinned; \\s realized as the
  explicit ASCII class).
- colors: case-SENSITIVE vocabulary findall, set-deduped (the
  contract renders sorted).
- collection: ``(?:collection|COLLECTION)\\s+([A-Z][a-z]+)`` —
  case-sensitive (no flag), first match.
- material_type: first of
  ceramic|porcelain|tile|stone|marble|granite (?i), lowered.

Scale: map-only regexp_extract / regexp_extract_all projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_WS = "[ \\t\\r\\n\\x0b\\f]"
DIM_PAT = ("([0-9]+(?:\\.[0-9]+)?)" + _WS + "*[x×]" + _WS
           + "*([0-9]+(?:\\.[0-9]+)?)" + _WS + "*(?:cm|mm)?")
DESIGNER_PATS = [
    "(?i)(?:by|BY|designer|DESIGNER|studio|STUDIO)" + _WS
    + "+([A-Z][A-Za-z \\t\\r\\n\\x0b\\f{}\\-]+)",
    "(?i)(ESTUDI\\{H\\}AC|DSIGNIO|ALT DESIGN|MUT|YONOH|STACY GARCIA"
    "|SG NY)",
    "(?i)([A-Z][a-z]+" + _WS + "+[A-Z][a-z]+(?:" + _WS
    + "+[A-Z][a-z]+)?)" + _WS + "+(?:NY|STUDIO|DESIGN)",
]
COLOR_PAT = ("\\b(TAUPE|SAND|CLAY|WHITE|BLACK|GREY|GRAY|ANTHRACITE"
             "|BEIGE|BROWN|BLUE|GREEN|RED)\\b")
COLLECTION_PAT = "(?:collection|COLLECTION)" + _WS + "+([A-Z][a-z]+)"
MATERIAL_PAT = "(?i)\\b(ceramic|porcelain|tile|stone|marble|granite)\\b"
_DESIGNER_STOP = ["THE", "AND", "FOR"]


def _strip(c):
    return F.regexp_replace(c, "^" + _WS + "+|" + _WS + "+$", "")


def extract_product_metadata(chunks: DataFrame) -> DataFrame:
    """chunks: (chunk_id, content).  Emits the extracted metadata."""
    t = F.coalesce("content", F.lit(""))
    d1 = F.regexp_extract(t, DIM_PAT, 1)
    d2 = F.regexp_extract(t, DIM_PAT, 2)
    dims = F.when(d1 != "", F.concat(d1, F.lit("×"), d2))

    designer = None
    for pat in DESIGNER_PATS:
        cand = _strip(F.regexp_extract(t, pat, 1))
        ok = (cand != "") & (F.length(cand) > 2) \
            & ~cand.isin(*_DESIGNER_STOP)
        this = F.when(ok, cand)
        designer = this if designer is None else \
            F.coalesce(designer, this)

    colors = F.array_sort(F.array_distinct(
        F.regexp_extract_all(t, F.lit(COLOR_PAT), F.lit(1))))
    collection = F.nullif(
        F.regexp_extract(t, COLLECTION_PAT, 1), F.lit(""))
    material = F.nullif(
        F.lower(F.regexp_extract(t, MATERIAL_PAT, 1)), F.lit(""))
    return chunks.select(
        "chunk_id", dims.alias("dimensions"),
        designer.alias("designer"),
        F.when(F.size(colors) > 0, F.array_join(colors, ","))
        .alias("colors_csv"),
        collection.alias("collection"), material.alias("material_type"))


def extract_meta_sql() -> str:
    """DuckDB twin over a CTE chunks_in (chunk_id, content)."""
    strip = ("regexp_replace({}, '^" + _WS + "+|" + _WS
             + "+$', '', 'g')")
    des = []
    for i, pat in enumerate(DESIGNER_PATS):
        cand = strip.format(
            f"coalesce(regexp_extract(t, '{pat}', 1), '')")
        des.append(f"""CASE WHEN {cand} <> ''
            AND length({cand}) > 2
            AND {cand} NOT IN ('THE', 'AND', 'FOR')
            THEN {cand} END""")
    designer = f"coalesce({', '.join(des)})"
    return f"""
    b AS (SELECT chunk_id, coalesce(content, '') AS t FROM chunks_in),
    x AS (SELECT chunk_id, t,
                 coalesce(regexp_extract(t, '{DIM_PAT}', 1), '')
                     AS d1,
                 coalesce(regexp_extract(t, '{DIM_PAT}', 2), '')
                     AS d2
          FROM b)
    SELECT chunk_id,
           CASE WHEN d1 <> '' THEN d1 || '×' || d2 END AS dimensions,
           {designer} AS designer,
           CASE WHEN len(list_sort(list_distinct(
                    regexp_extract_all(t, '{COLOR_PAT}', 1)))) > 0
                THEN array_to_string(list_sort(list_distinct(
                    regexp_extract_all(t, '{COLOR_PAT}', 1))), ',')
           END AS colors_csv,
           nullif(coalesce(regexp_extract(t, '{COLLECTION_PAT}', 1),
                           ''), '') AS collection,
           nullif(lower(coalesce(regexp_extract(t, '{MATERIAL_PAT}',
                                                1), '')), '')
               AS material_type
    FROM x"""


def synth_meta_chunks(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    content = (
        F.when(e % 7 == 0, F.concat(
            F.lit("VALENOVA tiles 15×38×2 cm in TAUPE and SAND, "
                  "by Estudi Nou\nporcelain COLLECTION Alba"),
            (e % 5).cast("string")))
        .when(e % 7 == 1, "Designed BY MUT studio 20 x 40 mm GREY")
        .when(e % 7 == 2, "Stacy Garcia NY line, WHITE BLACK WHITE")
        .when(e % 7 == 3, "studio THE rest 11.8×11.8")
        .when(e % 7 == 4, F.concat(F.lit("collection Roma marble "),
                                   (e % 3).cast("string")))
        .when(e % 7 == 5, "nothing here at all")
        .otherwise(F.concat(F.lit("designer Ana Luz\nGRANITE slab "),
                            (e % 4).cast("string"))))
    return events.select(e.alias("chunk_id"), content.alias("content"))


SYNTH_META_CHUNKS_SQL = """
SELECT event_id AS chunk_id,
       CASE WHEN event_id % 7 = 0
                THEN 'VALENOVA tiles 15×38×2 cm in TAUPE and SAND, by Estudi Nou' || chr(10)
                     || 'porcelain COLLECTION Alba' || (event_id % 5)
            WHEN event_id % 7 = 1
                THEN 'Designed BY MUT studio 20 x 40 mm GREY'
            WHEN event_id % 7 = 2
                THEN 'Stacy Garcia NY line, WHITE BLACK WHITE'
            WHEN event_id % 7 = 3 THEN 'studio THE rest 11.8×11.8'
            WHEN event_id % 7 = 4
                THEN 'collection Roma marble ' || (event_id % 3)
            WHEN event_id % 7 = 5 THEN 'nothing here at all'
            ELSE 'designer Ana Luz' || chr(10) || 'GRANITE slab '
                 || (event_id % 4)
       END AS content
FROM events"""
