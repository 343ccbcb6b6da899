"""Property fuzz for the vectorized layout-chunk kernel: the numpy
segment-arithmetic boundary scan (`_layout_chunks_arrow`) must equal the
pure-Python spec (`chunk_layout`) on arbitrary span sequences — hard
boundaries (tables, headings, doc changes), greedy size-cap packing,
empty-span skips, null kinds, and the positional metadata.

Runs the Arrow kernel directly on RecordBatches (no Spark session), so
hypothesis can afford hundreds of examples.
"""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from mivaa_pdf_extractor_spark.operators.chunking import (_layout_chunks_arrow,
                                                          chunk_layout)

# whitespace restricted to ' '/'\n' so the dedup-normalization comparison
# can't trip over \s-class differences between regex engines
_TEXT = st.text(
    alphabet=st.sampled_from(list("ab S.\n!#|-•")), max_size=30)
_KIND = st.sampled_from(
    ["text", "heading", "table", "image", "list", "code", None])


def _mk_spans(items):
    spans, off = [], 0
    for page, (kind, text, meta_mode) in enumerate(items):
        # meta_mode exercises present-but-NULL positional attrs: the
        # kernel must surface them as null chunk metadata exactly like the
        # spec, never as a fabricated 0 (code-review r3 finding)
        spans.append({"kind": kind, "text": text, "media_ref": "",
                      "offset": None if meta_mode >= 1 else off,
                      "page": None if meta_mode == 2 else page // 3 + 1})
        off += len(text)
    return spans


@settings(max_examples=300, deadline=None)
@given(st.lists(st.lists(st.tuples(_KIND, _TEXT,
                                   st.sampled_from([0, 0, 0, 1, 2])),
                         max_size=12), max_size=6),
       st.integers(min_value=8, max_value=120))
def test_layout_kernel_matches_spec(doc_items, max_size):
    docs = [(f"d{i}", _mk_spans(items)) for i, items in enumerate(doc_items)]
    batch = pa.RecordBatch.from_pydict({
        "doc_id": [d for d, _s in docs],
        "spans": pa.array(
            [s for _d, s in docs],
            type=pa.list_(pa.struct([
                ("kind", pa.string()), ("text", pa.string()),
                ("media_ref", pa.string()), ("offset", pa.int32()),
                ("page", pa.int32())]))),
    })
    out = _layout_chunks_arrow(batch, max_size, dedup=False)

    got: dict[str, list] = {d: [] for d, _s in docs}
    if out is not None:
        (doc_id_arr, chunk_index, content, is_table, kinds_out,
         page_arr, start_off, end_off, total) = out
        rows = zip(doc_id_arr.to_pylist(), chunk_index.tolist(),
                   content.to_pylist(), is_table.tolist(), kinds_out,
                   page_arr.to_pylist(), start_off.to_pylist(),
                   end_off.to_pylist(), total.tolist())
        for d, ci, c, t, k, pg, so, eo, tot in rows:
            got[d].append((ci, c, t, k, pg, so, eo, tot))

    for doc_id, spans in docs:
        # the spec treats null kind as '' (kernel fills null pre-encode)
        want_chunks = chunk_layout(
            [{"kind": s["kind"] or "", "text": s["text"],
              "offset": s["offset"], "page": s["page"]} for s in spans],
            max_size)
        want = [(i, c["content"], c["is_table"], c["kinds"], c["page"],
                 c["start_offset"], c["end_offset"], len(want_chunks))
                for i, c in enumerate(want_chunks)]
        assert sorted(got[doc_id]) == want, (doc_id, max_size)
