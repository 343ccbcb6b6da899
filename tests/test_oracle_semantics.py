"""Hand-computed expectations pinning the oracle's semantics (the oracle is
the spec the vectorized engine must match, so it gets its own direct tests —
otherwise engine==oracle equality could hide a shared misunderstanding)."""

from mivaa_pdf_extractor_spark.core.kinds import make_kind
from mivaa_pdf_extractor_spark.oracle import extract_document


def span(kind, text="", ref=""):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": 0}


def tuples(result):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in result["spans"]]


def test_reading_order_and_offsets():
    r = extract_document("d", [
        span(make_kind("text", page=2, y=10, x=10, size=10), "second page"),
        span(make_kind("text", page=1, y=50, x=10, size=10), "below"),
        span(make_kind("text", page=1, y=10, x=10, size=10), "above"),
    ])
    assert tuples(r) == [
        ("text", "above", "", 0),
        ("text", "below", "", 5),
        ("text", "second page", "", 10),
    ]
    assert r["status"] == "completed"
    assert r["n_chars"] == 21


def test_two_column_order():
    # left column read fully before right column
    r = extract_document("d", [
        span(make_kind("text", page=1, y=10, x=500, size=10), "R1"),
        span(make_kind("text", page=1, y=10, x=50, size=10), "L1"),
        span(make_kind("text", page=1, y=60, x=500, size=10), "R2"),
        span(make_kind("text", page=1, y=60, x=50, size=10), "L2"),
    ])
    assert [t for _, t, _, _ in tuples(r)] == ["L1", "L2", "R1", "R2"]


def test_narrow_spread_stays_one_column():
    r = extract_document("d", [
        span(make_kind("text", page=1, y=10, x=50, size=10), "A"),
        span(make_kind("text", page=1, y=10, x=250, size=10), "B"),
        span(make_kind("text", page=1, y=60, x=50, size=10), "C"),
        span(make_kind("text", page=1, y=60, x=250, size=10), "D"),
    ])
    # spread 200 < 400 -> y-then-x order
    assert [t for _, t, _, _ in tuples(r)] == ["A", "B", "C", "D"]


def test_heading_levels_and_tiebreak():
    # sizes: 10 x3 (body), 14 x1 -> level 2? No: levels assigned desc:
    # 18 -> level 1, 14 -> level 2
    r = extract_document("d", [
        span(make_kind("title", page=1, y=5, x=10, size=18), "Main"),
        span(make_kind("text", page=1, y=10, x=10, size=14), "Sub"),
        span(make_kind("text", page=1, y=20, x=10, size=10), "b1"),
        span(make_kind("text", page=1, y=30, x=10, size=10), "b2"),
        span(make_kind("text", page=1, y=40, x=10, size=10), "b3"),
    ])
    assert tuples(r)[0][1] == "# Main"
    assert tuples(r)[1][1] == "## Sub"
    assert tuples(r)[2][0] == "text"


def test_heading_count_tie_smaller_size_is_body():
    # 2 spans of size 10, 2 of size 12 -> tie -> body=10, 12 is a heading
    r = extract_document("d", [
        span(make_kind("text", page=1, y=10, x=10, size=12), "H"),
        span(make_kind("text", page=1, y=20, x=10, size=12), "H2"),
        span(make_kind("text", page=1, y=30, x=10, size=10), "b"),
        span(make_kind("text", page=1, y=40, x=10, size=10), "b2"),
    ])
    kinds = [k for k, _, _, _ in tuples(r)]
    assert kinds == ["heading", "heading", "text", "text"]
    assert tuples(r)[0][1] == "# H"


def test_boilerplate_stripped():
    r = extract_document("d", [
        span(make_kind("header", page=1, y=1, x=10), "HDR"),
        span(make_kind("text", page=1, y=10, x=10, size=10), "body"),
        span(make_kind("footer", page=1, y=99, x=10), "FTR"),
        span(make_kind("page_number", page=1, y=99, x=50), "1"),
    ])
    assert [t for _, t, _, _ in tuples(r)] == ["body"]


def test_boilerplate_only_doc_is_completed_empty():
    r = extract_document("d", [
        span(make_kind("header", page=1, y=1, x=10), "HDR"),
    ])
    assert r["spans"] == [] and r["status"] == "completed_empty"


def test_list_and_code():
    r = extract_document("d", [
        span(make_kind("text", page=1, y=10, x=10, size=10), "- item one"),
        span(make_kind("code", page=1, y=20, x=10, mono=1), "x = 1"),
        span(make_kind("text", page=1, y=30, x=10, size=10), "1) enum"),
        span(make_kind("text", page=1, y=40, x=10, size=10), "plain"),
    ])
    assert [k for k, _, _, _ in tuples(r)] == ["list", "code", "list", "text"]


def test_table_assembly_pipe_serialization():
    cells = [
        ("Formato", 0, 100), ("Spessore", 1, 100),
        ("20x20", 0, 140), ("9", 1, 140),
        ("30x30", 0, 180), ("10", 1, 180),
    ]
    r = extract_document("d", [
        span(make_kind("table_cell", page=1, y=y, x=50 + 90 * c, col=c), t)
        for t, c, y in cells
    ])
    assert len(r["spans"]) == 1
    assert r["spans"][0]["kind"] == "table"
    assert r["spans"][0]["text"] == (
        "| Formato | Spessore |\n| --- | --- |\n"
        "| 20x20 | 9 |\n| 30x30 | 10 |"
    )


def test_degenerate_table_falls_back_to_text():
    r = extract_document("d", [
        span(make_kind("table_cell", page=1, y=100, x=50, col=0), "only"),
        span(make_kind("table_cell", page=1, y=140, x=50, col=0), "one col"),
    ])
    assert [k for k, _, _, _ in tuples(r)] == ["text", "text"]


def test_media_refs_and_caption():
    r = extract_document("d", [
        span(make_kind("text", page=1, y=10, x=10, size=10), "intro"),
        span(make_kind("image", page=1, y=50, x=10, edpi=200, phash="aa")),
        span(make_kind("image", page=1, y=90, x=10, edpi=200, phash="bb")),
        span(make_kind("caption", page=1, y=130, x=10), "Figure 1"),
        span(make_kind("figure", page=2, y=10, x=10, edpi=200, phash="cc")),
    ])
    assert tuples(r) == [
        ("text", "intro", "", 0),
        ("image", "", "d/p1/img0", 5),
        ("image", "", "d/p1/img1", 5),
        ("caption", "Figure 1", "", 5),
        ("figure", "", "d/p2/region0", 13),
    ]


def test_phash_dedup_per_layer():
    r = extract_document("d", [
        span(make_kind("image", page=1, y=50, x=10, edpi=200, phash="same")),
        span(make_kind("image", page=2, y=50, x=10, edpi=200, phash="same")),
        span(make_kind("figure", page=3, y=50, x=10, edpi=200, phash="same")),
    ])
    refs = [ref for _, _, ref, _ in tuples(r)]
    # second embedded dropped; figure with same phash kept (different layer)
    assert refs == ["d/p1/img0", "d/p3/region0"]
    assert r["status"] == "no_text"


def test_low_dpi_full_render():
    r = extract_document("d", [
        span(make_kind("text", page=1, y=10, x=10, size=10), "t"),
        span(make_kind("image", page=1, y=50, x=10, edpi=72, phash="aa")),
        span(make_kind("image", page=1, y=90, x=10, edpi=300, phash="bb")),
        span(make_kind("image", page=2, y=50, x=10, edpi=300, phash="cc")),
    ])
    refs = [ref for _, _, ref, _ in tuples(r) if ref]
    assert refs == ["d/p1/full_render", "d/p2/img0"]


def test_statuses():
    assert extract_document("d", [])["status"] == "empty_doc"
    assert extract_document("d", None)["status"] == "empty_doc"
    assert extract_document("d", [span(None, "x")])["status"] == "failed"
    only_media = extract_document("d", [
        span(make_kind("image", page=1, y=1, x=1, edpi=200, phash="aa"))])
    assert only_media["status"] == "no_text"
