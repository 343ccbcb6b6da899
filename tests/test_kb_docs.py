"""Pins for the knowledge-base document folds (operators/kb_docs vs
app/api/knowledge_base.py:132-248,692-871)."""

from mivaa_pdf_extractor_spark.operators import kb_docs as kb


def _ev(spark, n=1000):
    return spark.range(0, n).withColumnRenamed("id", "event_id")


def test_upsert_plan_matches_reference(spark):
    ev = _ev(spark)
    reqs = [r.asDict() for r in kb.synth_upsert_requests(ev).collect()]
    existing = [r.asDict() for r in kb.synth_existing(ev).collect()]
    got = {r["request_id"]: r.asDict() for r in kb.upsert_plan(
        kb.synth_upsert_requests(ev), kb.synth_existing(ev)).collect()}
    by_key = {}
    for x in existing:
        k = (x["workspace_id"], x["title"], x["category_id"])
        # existing.data[0] canonicalized to lowest doc_id
        if k not in by_key or x["doc_id"] < by_key[k]["doc_id"]:
            by_key[k] = x
    actions = set()
    for r in reqs:
        g = got[r["request_id"]]
        if r["price_doc_type"] is not None and \
                r["price_doc_type"] not in kb.PRICE_DOC_TYPES:
            assert g["action"] == "invalid_price_doc_type"
            actions.add(g["action"])
            continue
        hit = by_key.get((r["workspace_id"], r["title"],
                          r["category_id"]))
        if hit:
            assert g["action"] == "update"
            assert g["target_doc_id"] == hit["doc_id"]
            changed = hit["content"] != r["content"]
            assert g["re_embed"] == int(changed)
            if changed:
                want = "success" if r["embed_ok"] else "failed"
                assert g["embedding_status"] == want
                if not r["embed_ok"]:
                    assert g["embedding_error"] == (
                        r["embed_error"] or "Unknown error")
            else:
                # unchanged content leaves embedding fields untouched
                assert g["embedding_status"] is None
        else:
            assert g["action"] == "insert"
            assert g["re_embed"] == 1
            assert g["stamps_generated_at"] == int(r["embed_ok"])
        actions.add(g["action"])
    assert actions == {"insert", "update", "invalid_price_doc_type"}


def test_null_category_matches_only_null(spark):
    """A NULL request category matches only NULL-category rows
    (.is_('null')), never 'any category'."""
    reqs = spark.createDataFrame(
        [(1, "ws", "T", None, "c1", True, None, None),
         (2, "ws", "T", "cat-a", "c1", True, None, None)],
        "request_id long, workspace_id string, title string, "
        "category_id string, content string, embed_ok boolean, "
        "embed_error string, price_doc_type string")
    existing = spark.createDataFrame(
        [("kb-1", "ws", "T", "cat-a", "c1"),
         ("kb-2", "ws", "T", None, "c2")],
        "doc_id string, workspace_id string, title string, "
        "category_id string, content string")
    rows = {r["request_id"]: r
            for r in kb.upsert_plan(reqs, existing).collect()}
    assert rows[1]["target_doc_id"] == "kb-2"  # NULL → NULL row
    assert rows[1]["re_embed"] == 1  # c1 vs c2 changed
    assert rows[2]["target_doc_id"] == "kb-1"
    assert rows[2]["re_embed"] == 0  # same content → no re-embed


def test_validate_results_defaults(spark):
    ev = _ev(spark)
    raw = [r.asDict() for r in kb.synth_rpc_rows(ev).collect()]
    got = {r["row_id"]: r.asDict()
           for r in kb.validate_results(kb.synth_rpc_rows(ev)).collect()}
    for r in raw:
        g = got[r["row_id"]]
        # live defaults on ABSENT keys; present-NULL passes through
        assert g["title"] == (r["title"] if r["has_title"]
                              else "Untitled")
        assert g["status"] == (r["status"] if r["has_status"]
                               else "draft")
        assert g["view_count"] == (r["view_count"] if r["has_view_count"]
                                   else 0)
        assert g["workspace_id"] == (
            r["workspace_id"] if r["has_workspace"]
            else r["request_workspace"])
        assert g["similarity"] == (r["similarity"] if r["has_similarity"]
                                   else None)


def test_rpc_args_truthy_gating(spark):
    reqs = spark.createDataFrame(
        [(1, "semantic", False, "", "slug-1", None),
         (2, "hybrid", True, "cat-1", None, "faq")],
        "request_id long, search_type string, is_admin_caller boolean, "
        "category_id string, category_slug string, "
        "price_doc_type string")
    rows = {r["request_id"]: r for r in kb.rpc_args(reqs).collect()}
    # empty-string category_id is OMITTED (truthy gate)
    assert rows[1]["sends_category_id"] == 0
    assert rows[1]["sends_category_slug"] == 1
    assert rows[1]["rpc"] == "kb_match_docs"
    assert rows[2]["rpc"] == "kb_search_docs"
    assert rows[2]["include_private"] == 1
    assert rows[2]["sends_price_doc_type"] == 1
