"""Transcription pins for the Stage-0 product-creation fold
(operators/stage0_products.py) vs a literal replay of the reference's
idempotency + quota + repair loop (stage_0_discovery.py:719-946)."""

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import stage0_products as s0

SF = "/root/testdata/sf0.001/documents.parquet"


def _doc_ids(spark):
    return [r.d for r in spark.read.parquet(SF).select(
        F.col("doc_id").cast("long").alias("d")).distinct().collect()]


def _discovered(doc):
    rows = []
    for i in range(1, 10):
        name = {1: "Alpha Tile", 2: "Beta", 3: "Gamma", 4: "Beta",
                5: "Delta", 6: "", 7: "", 8: "Gamma", 9: "Epsilon"}[i]
        page = {1: "3", 2: "x", 3: "7", 8: "7", 5: "9",
                9: "11"}.get(i, "")
        rows.append({"i": i, "name": name, "page": page,
                     "embed_fails": (doc + i) % 5 == 0})
    return rows


def _existing(doc):
    rows = []
    for r in range(4):
        name = {0: " Alpha Tile ", 1: "alpha tile", 2: "Gamma"} \
            .get(r, "")
        page = {0: "3", 1: " 3 ", 2: "7"}.get(r, "")
        rows.append({
            "row_ord": r, "db_id": f"E{doc}_{r}", "name": name,
            "page": page, "has_embedding": r != 0,
            "embedding_failure": r == 2,
            "reembed_ok": (doc % 2 == 0) if r == 0 else (doc % 3 == 0)})
    return rows


def _quota(doc):
    return {0: 0, 1: -1, 2: 2, 3: 5}[doc % 4]


# --- the reference loop, replayed literally ----------------------------

def _idem_key(name, page_range):
    nm = (name or "").strip().lower()
    try:
        first_page = int(page_range[0]) if page_range else None
    except (TypeError, IndexError, ValueError):
        first_page = None
    return f"{nm}::{first_page}" if first_page is not None else nm


def ref_ledger(doc):
    existing_by_name = {}
    needs_reembed = {}
    for row in _existing(doc):
        pr = [row["page"]] if row["page"] else []
        key = _idem_key(row["name"], pr)
        if key and key not in existing_by_name:
            existing_by_name[key] = row["db_id"]
            if (not row["has_embedding"]) or row["embedding_failure"]:
                needs_reembed[row["db_id"]] = row
    quota_remaining = _quota(doc)
    out = []
    reembed_outcome = {r["db_id"]: r["reembed_ok"]
                       for r in _existing(doc)}
    for p in _discovered(doc):
        i, name = p["i"], p["name"]
        tracker_id = f"product_{i}_{name.replace(' ', '_')}"
        pr = [p["page"]] if p["page"] else []
        lookup_key = _idem_key(name, pr)
        existing_id = existing_by_name.get(lookup_key)
        if existing_id is None and quota_remaining == 0:
            out.append((i, tracker_id, lookup_key, "quota_skipped",
                        None, False, "none"))
            continue
        if existing_id:
            repair = "none"
            broken = needs_reembed.pop(existing_id, None)
            if broken is not None:
                repair = ("reembedded" if reembed_outcome[existing_id]
                          else "reembed_failed")
            # the reference appends reused ids and distinguishes a
            # same-run creation-cache hit only implicitly; the fold
            # labels in-run hits 'reused_same_run' when the id came
            # from the CREATE branch cache (starts with 'N')
            outcome = ("reused" if existing_id.startswith("E")
                       else "reused_same_run")
            out.append((i, tracker_id, lookup_key, outcome,
                        existing_id, False, repair))
        else:
            db_id = f"N{doc}_{i}"
            out.append((i, tracker_id, lookup_key, "created", db_id,
                        p["embed_fails"], "none"))
            existing_by_name[lookup_key] = db_id  # falsy keys cached
            if db_id and quota_remaining > 0:
                quota_remaining -= 1
    return out


def test_ledger_matches_reference_loop(spark):
    docs = spark.read.parquet(SF)
    got = {}
    ledger = s0.fold_stage0_creation(
        s0.synth_discovered(docs), s0.synth_existing(docs),
        s0.synth_quotas(docs))
    for r in ledger.collect():
        got[(r.doc_id, r.i)] = (r.tracker_product_id, r.key, r.outcome,
                                r.db_id, r.flagged, r.repair)
    for doc in _doc_ids(spark):
        for (i, tid, key, outcome, db_id, flagged, repair) \
                in ref_ledger(doc):
            g = got[(doc, i)]
            assert g == (tid, key, outcome, db_id, flagged, repair), \
                (doc, i, g, (tid, key, outcome, db_id, flagged, repair))


def test_reference_loop_pins():
    """Spot pins of the loop's named behaviors on concrete docs."""
    # doc 4: quota 0 — every NEW product skipped, reuses still pass
    rows4 = {i: o for (i, _t, _k, o, _d, _f, _r) in ref_ledger(4)}
    assert rows4[1] == "reused" and rows4[3] == "reused"
    assert rows4[8] == "reused"  # second hit on the same db row
    assert rows4[2] == rows4[5] == rows4[6] == rows4[9] \
        == "quota_skipped"
    # skipped keys are NOT cached: the duplicate Beta (i=4) re-skips
    assert rows4[4] == "quota_skipped"

    # doc 2: quota 2 — beta + delta admitted, '' and epsilon clamped;
    # the same-run duplicate of an admitted key collapses
    rows2 = {i: (o, d) for (i, _t, _k, o, d, _f, _r) in ref_ledger(2)}
    assert rows2[2] == ("created", "N2_2")
    assert rows2[4] == ("reused_same_run", "N2_2")
    assert rows2[5][0] == "created"
    assert rows2[6][0] == rows2[7][0] == rows2[9][0] == "quota_skipped"

    # doc 1: unlimited (-1) — falsy '' key cached by the CREATE branch
    # (asymmetric with the DB map): second empty-name product reuses
    rows1 = {i: (o, d) for (i, _t, _k, o, d, _f, _r) in ref_ledger(1)}
    assert rows1[6] == ("created", "N1_6")
    assert rows1[7] == ("reused_same_run", "N1_6")

    # repair popped once per db row: i=3 repairs E*_2, i=8 finds it
    # popped
    reps = {i: r for (i, _t, _k, _o, _d, _f, r) in ref_ledger(3)}
    assert reps[3] in ("reembedded", "reembed_failed")
    assert reps[8] == "none"

    # DB map first-wins: 'alpha tile::3' maps to E*_0 (row_ord 0),
    # whose missing embedding drives the repair
    led = {i: (d, r) for (i, _t, _k, _o, d, _f, r) in ref_ledger(6)}
    assert led[1][0] == "E6_0"
    assert led[1][1] == "reembedded"  # doc 6 % 2 == 0
